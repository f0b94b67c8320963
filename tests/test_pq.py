"""Product quantization (operators/pq.py) and the vector store's PQ
tier (build_pq / refresh_pq / probe(tier="pq")).

The operator contract is integer determinism: one global lattice
scale, Lloyd with first-min argmin + floor-division updates, int ADC.
Every test here replays some slice of that pipeline independently
(numpy or a second run) and demands bit equality — the same property
q101's DuckDB oracle certifies end to end.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from block_explorer_spark.operators import pq as PQ
from block_explorer_spark.sources import vector_store as vs

from tests.test_vector_store import CENTERS, _founding, _vecs  # noqa: F401


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "vstore")


def _emb_df(spark, n=40, dim=8, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3) for i in range(n)
    ]
    return spark.createDataFrame(rows, vs.VECTORS_SCHEMA)


def test_train_deterministic(spark):
    df = _emb_df(spark)
    m1 = PQ.pq_train(df.repartition(7), "embedding", m=4, k=8, iters=2, sample_max_id=30)
    m2 = PQ.pq_train(df.coalesce(1), "embedding", m=4, k=8, iters=2, sample_max_id=30)
    assert m1 == m2  # partitioning-independent: value-bounded sample, int Lloyd


def test_encode_matches_local_replay(spark):
    df = _emb_df(spark)
    model = PQ.pq_train(df, "embedding", m=4, k=8, iters=2, sample_max_id=30)
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in PQ.pq_encode(df, "embedding", model).collect()
    }
    rows = sorted((r["vec_id"], r["embedding"]) for r in df.collect())
    mat = PQ._quantize_rows(
        np.array([v for _, v in rows], dtype=np.float64), model["scale"]
    )
    want = PQ._encode_mat(mat, model)
    for (vid, _), codes in zip(rows, want):
        assert got[vid] == list(codes)


def test_adc_topk_matches_numpy_brute_force(spark):
    df = _emb_df(spark)
    model = PQ.pq_train(df, "embedding", m=4, k=8, iters=2, sample_max_id=30)
    query = [0.2, -0.4, 0.1, 0.9, -0.3, 0.5, 0.0, -0.8]
    got = [
        (r["vec_id"], r["adc_dist"])
        for r in PQ.pq_topk_adc(df, "embedding", query, model, k=5).collect()
    ]
    rows = sorted((r["vec_id"], r["embedding"]) for r in df.collect())
    mat = PQ._quantize_rows(
        np.array([v for _, v in rows], dtype=np.float64), model["scale"]
    )
    codes = PQ._encode_mat(mat, model)
    lut = PQ.adc_lut(query, model)
    dist = np.zeros(len(codes), dtype=np.int64)
    for j in range(model["m"]):
        dist += lut[j][codes[:, j]]
    want = sorted(zip((vid for vid, _ in rows), dist.tolist()), key=lambda t: (t[1], t[0]))[:5]
    assert got == want


def test_adc_codes_path_equals_encode_path(spark):
    """Scoring persisted codes (adc_topk_codes — the store read path)
    must equal encode-at-query (pq_topk_adc)."""
    df = _emb_df(spark)
    model = PQ.pq_train(df, "embedding", m=4, k=8, iters=2, sample_max_id=30)
    query = [0.7, 0.1, -0.2, 0.4, -0.9, 0.3, 0.6, -0.1]
    codes = PQ.pq_encode(df, "embedding", model)
    via_codes = PQ.adc_topk_codes(codes, "pq_codes", PQ.adc_lut(query, model), k=7).collect()
    via_encode = PQ.pq_topk_adc(df, "embedding", query, model, k=7).collect()
    assert [tuple(r) for r in via_codes] == [tuple(r) for r in via_encode]


def test_dim_not_divisible_raises(spark):
    df = _emb_df(spark, dim=6)
    with pytest.raises(ValueError, match="not divisible"):
        PQ.pq_train(df, "embedding", m=4, k=4, iters=1, sample_max_id=30)


# ---------------------------------------------------------------------------
# store tier
# ---------------------------------------------------------------------------


def test_build_pq_and_probe_all_cells_equals_operator(spark, base):
    rng = random.Random(7)
    _founding(spark, base, rng)
    rec = vs.build_pq(spark, base, m=4, k=8, iters=2)
    assert len(rec["model"]["codebooks"]) == 4
    got = vs.probe(spark, base, CENTERS[1], k=10, n_probe=3, tier="pq").collect()
    want = PQ.pq_topk_adc(
        vs.read_vectors(spark, base), "embedding", CENTERS[1], rec["model"], k=10
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the cluster around center-1 wins the top-k
    assert sum(1 for r in got if 100 <= r["vec_id"] < 200) >= 8


def test_probe_pq_reads_only_probe_cells(spark, base):
    rng = random.Random(7)
    _founding(spark, base, rng)
    vs.build_pq(spark, base, m=4, k=8, iters=2)
    df = vs.probe(spark, base, CENTERS[0], k=5, n_probe=1, tier="pq")
    files = df.inputFiles()
    assert files, "probe read no files"
    assert all("pq_codes" in f and "centroid_id=" in f for f in files)
    cells = {f.split("centroid_id=")[1].split("/")[0] for f in files}
    assert len(cells) == 1  # one probed cell -> one cell directory


def test_probe_pq_without_build_is_loud(spark, base):
    rng = random.Random(7)
    _founding(spark, base, rng)
    with pytest.raises(FileNotFoundError, match="build_pq"):
        vs.probe(spark, base, CENTERS[0], tier="pq")


def test_refresh_pq_encodes_only_the_delta(spark, base):
    rng = random.Random(7)
    _founding(spark, base, rng)
    vs.build_pq(spark, base, m=4, k=8, iters=2)
    new = spark.createDataFrame(
        _vecs(rng, 5, CENTERS[2], start_id=900, label=2), vs.VECTORS_SCHEMA
    )
    vs.add_batch(spark, base, new)
    assert vs.refresh_pq(spark, base) == 5
    assert vs.refresh_pq(spark, base) == 0  # idempotent: watermark advanced
    got = {r["vec_id"] for r in vs.probe(spark, base, CENTERS[2], k=25, n_probe=3, tier="pq").collect()}
    assert {900, 901, 902, 903, 904} <= got


def test_probe_pq_sees_unrefreshed_adds(spark, base):
    """Adds committed after the codes snapshot are encoded on the fly
    from the CDC feed — the probe never serves a stale answer while
    waiting for refresh_pq."""
    rng = random.Random(7)
    _founding(spark, base, rng)
    vs.build_pq(spark, base, m=4, k=8, iters=2)
    new = spark.createDataFrame(
        _vecs(rng, 3, CENTERS[0], start_id=700, label=0), vs.VECTORS_SCHEMA
    )
    vs.add_batch(spark, base, new)
    got = {r["vec_id"] for r in vs.probe(spark, base, CENTERS[0], k=23, n_probe=3, tier="pq").collect()}
    assert {700, 701, 702} <= got


def test_probe_pq_rerank_recovers_exact_order(spark, base):
    """Two-stage PQ (ADC candidates + exact rerank over only the
    candidate rows): with the candidate depth covering the store, the
    result equals the exact tier exactly — the production operating
    point ANN_RECALL measures at recall@1 = 1.0."""
    rng = random.Random(7)
    _founding(spark, base, rng)
    vs.build_pq(spark, base, m=4, k=8, iters=2)
    got = vs.probe(
        spark, base, CENTERS[1], k=5, n_probe=3, tier="pq", rerank=60
    ).collect()
    want = vs.probe(spark, base, CENTERS[1], k=5, n_probe=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
