"""Incremental curated-corpus store: gates, in-batch + cross-batch
dedup, replay idempotency, and the bucket-pruned dedup read
(sources/corpus_store.py). The batch operators it composes are each
oracle-certified (q20/q23/q76/q86); these tests pin the STORE
semantics — what lands on disk across rounds and crashes."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from block_explorer_spark.sources import corpus_store as cs

LONG = " ".join(f"tok{i}" for i in range(30))  # passes both gates


def _doc(doc_id, text, lang="en", source="web"):
    return (doc_id, text, lang, source)


COLS = ["doc_id", "text", "lang", "source"]


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "corpus_base")


def test_gates_and_in_batch_dedup(spark, base):
    rows = [
        _doc(1, LONG),
        _doc(2, "too short"),                      # token floor
        _doc(3, "spam " * 40),                     # repeated-word ceiling
        _doc(4, LONG),                             # same fp as 1 -> in-batch dup
        _doc(5, LONG + " extra"),                  # distinct fp
    ]
    stats = cs.ingest(spark, base, spark.createDataFrame(rows, COLS))
    assert stats == {
        "n_in": 5, "n_gated": 2, "n_batch_dup": 1, "n_known": 0,
        "n_near_dup": 0, "n_added": 2,
    }
    got = {r["doc_id"] for r in cs.read_corpus(spark, base).collect()}
    assert got == {1, 5}  # min doc_id wins the fp group


def test_cross_batch_dedup_and_replay(spark, base):
    b1 = [_doc(1, LONG), _doc(2, LONG + " extra")]
    b2 = [_doc(10, LONG), _doc(11, LONG + " brand new words here")]
    cs.ingest(spark, base, spark.createDataFrame(b1, COLS))
    stats = cs.ingest(spark, base, spark.createDataFrame(b2, COLS))
    # doc 10 duplicates batch-1's doc 1 by content -> known, skipped
    assert stats["n_known"] == 1 and stats["n_added"] == 1
    ids = {r["doc_id"] for r in cs.read_corpus(spark, base).collect()}
    assert ids == {1, 2, 11}

    # full replay of either batch adds nothing (crash-recovery replay)
    again = cs.ingest(spark, base, spark.createDataFrame(b1, COLS))
    assert again["n_added"] == 0 and again["n_known"] == 2
    assert cs.read_corpus(spark, base).count() == 3


def test_ingest_replay_idempotent_after_partial_append(spark, base):
    """Simulated mid-append crash: some rows of a batch are already on
    disk (committed task files), the rest missing. Replaying the whole
    batch converges to exactly-once content."""
    b = [_doc(i, LONG + f" unique{i}") for i in range(6)]
    cs.ingest(spark, base, spark.createDataFrame(b, COLS))
    # "crash": delete some committed bucket files -> partial state
    files = sorted(glob.glob(os.path.join(base, "corpus", "fp_bucket=*", "*.parquet")))
    assert len(files) >= 2
    for f in files[: len(files) // 2]:
        os.remove(f)
    n_after_crash = cs.read_corpus(spark, base).count()
    assert n_after_crash < 6

    stats = cs.ingest(spark, base, spark.createDataFrame(b, COLS))
    assert stats["n_added"] == 6 - n_after_crash
    got = cs.read_corpus(spark, base)
    assert got.count() == 6
    assert got.select("fp").distinct().count() == 6


def test_dedup_read_prunes_buckets(spark, base):
    """The cross-batch dedup must read only the fp_buckets the batch
    hashes into — directory-level PartitionFilters, the contract that
    bounds ingest I/O at corpus scale."""
    cs.ingest(spark, base, spark.createDataFrame(
        [_doc(i, LONG + f" w{i}") for i in range(20)], COLS))
    batch = cs._prepared(spark.createDataFrame([_doc(100, LONG + " w1")], COLS))
    buckets = [r.fp_bucket for r in batch.select("fp_bucket").distinct().collect()]
    from pyspark.sql import types as T

    full = T.StructType(
        list(cs.CORPUS_SCHEMA.fields) + [T.StructField("fp_bucket", T.LongType())]
    )
    pruned = (
        spark.read.schema(full).parquet(os.path.join(base, "corpus"))
        .filter(F.col("fp_bucket").isin(buckets))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "fp_bucket" in part_lines[0]


def test_empty_store_and_empty_batch(spark, base):
    assert cs.read_corpus(spark, base).count() == 0
    stats = cs.ingest(spark, base, spark.createDataFrame([], cs.CORPUS_SCHEMA)
                      .select(*COLS))
    assert stats["n_added"] == 0
    assert cs.read_corpus(spark, base).count() == 0


def test_streaming_ingest_resume_exactly_once(spark, base, tmp_path):
    """Streamed crawl files curate into the store; a second
    availableNow run from the same checkpoint picks up only NEW files,
    and content stays exactly-once across both runs."""
    src = str(tmp_path / "crawl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = [_doc(i, LONG + f" u{i}") for i in range(4)]
    spark.createDataFrame(b1, COLS).coalesce(1).write.mode("append").parquet(src)
    q = cs.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    q.awaitTermination(120)
    assert cs.read_corpus(spark, base).count() == 4

    # second wave: one genuinely new doc + one content-dup of wave 1
    b2 = [_doc(10, LONG + " u1"), _doc(11, LONG + " fresh content")]
    spark.createDataFrame(b2, COLS).coalesce(1).write.mode("append").parquet(src)
    q = cs.start_ingest_stream(spark, src, base, ckpt, max_files_per_trigger=1)
    q.awaitTermination(120)

    got = cs.read_corpus(spark, base)
    assert got.count() == 5  # dup content skipped, nothing re-ingested
    assert got.select("fp").distinct().count() == 5


def _mutate(text, i, word):
    toks = text.split()
    toks[i] = word
    return " ".join(toks)


def test_near_dup_against_store_dropped(spark, base):
    """A second-wave doc that near-duplicates a STORED doc (different
    fingerprint, high 3-gram jaccard) is caught by the band sidecar
    and verified-dropped; an unrelated doc passes."""
    cs.ingest(spark, base, spark.createDataFrame([_doc(1, LONG)], COLS),
              near_dup_threshold=0.7)
    b2 = [
        _doc(10, _mutate(LONG, 5, "changed")),       # near-dup of doc 1
        _doc(11, " ".join(f"other{i}" for i in range(30))),  # unrelated
    ]
    stats = cs.ingest(spark, base, spark.createDataFrame(b2, COLS),
                      near_dup_threshold=0.7)
    assert stats["n_near_dup"] == 1 and stats["n_added"] == 1
    assert {r["doc_id"] for r in cs.read_corpus(spark, base).collect()} == {1, 11}


def test_near_dup_within_batch_lowest_id_wins(spark, base):
    b = [
        _doc(5, LONG),
        _doc(3, _mutate(LONG, 2, "zzz")),  # near-dup pair; 3 < 5
        _doc(9, " ".join(f"w{i}" for i in range(30))),
    ]
    stats = cs.ingest(spark, base, spark.createDataFrame(b, COLS),
                      near_dup_threshold=0.7)
    assert stats["n_near_dup"] == 1
    assert {r["doc_id"] for r in cs.read_corpus(spark, base).collect()} == {3, 9}


def test_near_dup_off_admits_mutations(spark, base):
    cs.ingest(spark, base, spark.createDataFrame([_doc(1, LONG)], COLS))
    stats = cs.ingest(
        spark, base,
        spark.createDataFrame([_doc(10, _mutate(LONG, 5, "changed"))], COLS),
    )
    assert stats["n_added"] == 1  # exact-dedup only: different fp passes


def test_band_sidecar_heals_on_replay(spark, base):
    """Crash between doc append and band append: the stored doc has no
    LSH rows. Replaying its batch regenerates them, after which
    near-dups of it are caught again."""
    import shutil

    b1 = [_doc(1, LONG)]
    cs.ingest(spark, base, spark.createDataFrame(b1, COLS), near_dup_threshold=0.7)
    shutil.rmtree(os.path.join(base, "bands"))  # the simulated crash

    # heal: replay of batch 1 (doc now KNOWN) restores the sidecar
    stats = cs.ingest(spark, base, spark.createDataFrame(b1, COLS),
                      near_dup_threshold=0.7)
    assert stats["n_known"] == 1 and stats["n_added"] == 0
    assert cs.read_bands(spark, base).count() == cs.LSH_BANDS

    stats = cs.ingest(
        spark, base,
        spark.createDataFrame([_doc(10, _mutate(LONG, 5, "changed"))], COLS),
        near_dup_threshold=0.7,
    )
    assert stats["n_near_dup"] == 1 and stats["n_added"] == 0


def test_delete_where_removes_and_counts(spark, base):
    rows = [_doc(1, LONG, source="keepme"), _doc(2, LONG + " extra", source="dropme"),
            _doc(3, LONG + " more words", source="dropme")]
    cs.ingest(spark, base, spark.createDataFrame(rows, COLS))
    n = cs.delete_where(spark, base, F.col("source") == "dropme")
    assert n == 2
    got = {r["doc_id"] for r in cs.read_corpus(spark, base).collect()}
    assert got == {1}
    # idempotent: nothing left to match
    assert cs.delete_where(spark, base, F.col("source") == "dropme") == 0


def test_delete_where_null_predicate_keeps_rows(spark, base):
    """Three-valued logic: rows where the predicate is NULL are kept
    (coalesce(p, False)) — the silent-data-loss pattern from the
    round-3 advisory on parquet.delete_where."""
    rows = [_doc(1, LONG), _doc(2, LONG + " extra")]
    df = spark.createDataFrame(rows, COLS).withColumn(
        "lang", F.when(F.col("doc_id") == 2, F.lit(None)).otherwise(F.col("lang"))
    )
    cs.ingest(spark, base, df)
    # predicate 'lang = de' is NULL for doc 2 -> doc 2 must survive
    n = cs.delete_where(spark, base, F.col("lang") == "de")
    assert n == 0
    assert cs.read_corpus(spark, base).count() == 2


def test_delete_forgets_near_dup_index(spark, base):
    """RTBF correctness: after deleting a doc, a RESUBMITTED near-dup
    of its content must be ADMITTED — the band sidecar must not keep
    ghost rows that silently re-censor future submissions."""
    cs.ingest(spark, base, spark.createDataFrame([_doc(1, LONG)], COLS),
              near_dup_threshold=0.7)
    n = cs.delete_where(spark, base, F.col("doc_id") == 1)
    assert n == 1
    assert cs.read_bands(spark, base).count() == 0  # index forgot too

    stats = cs.ingest(
        spark, base,
        spark.createDataFrame([_doc(10, _mutate(LONG, 5, "changed"))], COLS),
        near_dup_threshold=0.7,
    )
    assert stats["n_near_dup"] == 0 and stats["n_added"] == 1
    assert {r["doc_id"] for r in cs.read_corpus(spark, base).collect()} == {10}


def test_ingest_log_audit_trail(spark, base):
    s1 = cs.ingest(spark, base, spark.createDataFrame([_doc(1, LONG)], COLS))
    cs.log_ingest(spark, base, s1)
    s2 = cs.ingest(spark, base, spark.createDataFrame(
        [_doc(1, LONG), _doc(2, LONG + " extra")], COLS))
    rid = cs.log_ingest(spark, base, s2)
    assert rid == 2
    hist = {r["round_id"]: r for r in cs.ingest_history(spark, base).collect()}
    assert hist[1]["n_added"] == 1
    assert hist[2]["n_known"] == 1 and hist[2]["n_added"] == 1


def test_ingest_converges_under_any_batching(spark, tmp_path):
    """Invariant: HOWEVER a document set is partitioned into ingest
    batches (including replays), the final store content is the same
    canonical set — the property that makes the store safe to feed
    from any mix of backfills, retries, and parallel crawls."""
    import random as _r

    docs = [_doc(i, LONG + f" u{i // 2}") for i in range(12)]  # 6 dup pairs
    canonical = None
    for seed in (0, 1, 2):
        rng = _r.Random(seed)
        shuffled = docs[:]
        rng.shuffle(shuffled)
        base = str(tmp_path / f"b{seed}")
        i = 0
        while i < len(shuffled):
            step = rng.randint(1, 5)
            batch = shuffled[i : i + step]
            i += step
            cs.ingest(spark, base, spark.createDataFrame(batch, COLS))
            if rng.random() < 0.4:  # random replay of the same batch
                cs.ingest(spark, base, spark.createDataFrame(batch, COLS))
        got = {r["fp"] for r in cs.read_corpus(spark, base).collect()}
        assert len(got) == 6  # one survivor per content group
        if canonical is None:
            canonical = got
        assert got == canonical  # same CONTENT set regardless of batching


def test_canonicalize_repairs_racing_ingests(spark, base):
    """Two 'concurrent' ingests of overlapping content (simulated by
    appending past the dedup check) leave duplicate fingerprints; the
    canonicalization sweep restores one-doc-per-fp with min doc_id
    surviving, and removes nothing on a clean store."""
    cs.ingest(spark, base, spark.createDataFrame([_doc(1, LONG)], COLS),
              near_dup_threshold=0.7)
    # simulate the race: a second writer appends the same content with
    # a different doc_id, bypassing ingest's known-fp check
    dup = cs._prepared(spark.createDataFrame([_doc(9, LONG)], COLS))
    dup.write.partitionBy("fp_bucket").mode("append").parquet(
        os.path.join(base, "corpus"))
    cs._doc_bands(dup).write.mode("append").parquet(os.path.join(base, "bands"))
    assert cs.read_corpus(spark, base).count() == 2  # corrupted state

    n = cs.canonicalize(spark, base)
    assert n == 1
    rows = cs.read_corpus(spark, base).collect()
    assert [r["doc_id"] for r in rows] == [1]  # min doc_id survived
    assert {r["doc_id"] for r in cs.read_bands(spark, base).collect()} == {1}
    assert cs.canonicalize(spark, base) == 0  # idempotent / clean no-op
