"""Product quantization (IVF-PQ's PQ half) on an integer lattice —
the memory-side scale path for ANN at 100 TB.

SQ8 (similarity.quantize_int8) cuts an embedding 4x; product
quantization cuts it to M BYTES (M=4 here): split the d-dim vector
into M contiguous subspaces, k-means each subspace to K codewords,
store only the M codeword indices per vector, and answer queries with
ADC (asymmetric distance computation) — a per-query M x K lookup
table of exact subspace distances, one table-lookup sum per candidate
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the FAISS IVFPQ recipe). At 64 float32 dims,
codes are 4 bytes vs 256: a billion-vector cell scan becomes a 4 GB
sequential read instead of 256 GB.

Everything here is INTEGER-EXACT so the result is engine-replicable
with zero float-order slack (the q81/q98 oracle trick, extended to a
trained model):

  - vectors are first quantized onto a shared int lattice with ONE
    global scale s = 127 / max|x| (max is order-independent — the
    only float aggregate in the pipeline);
  - k-means runs in integer arithmetic: L2 distances are int sums,
    the argmin tie-breaks on the lower codeword index, and centroid
    updates are elementwise floor(sum / count) with empty clusters
    keeping their previous codeword — a deterministic Lloyd iteration
    any SQL engine replays exactly (the q101 oracle unrolls it as
    three CTE stages);
  - init is the quantized subvectors of the K smallest sample ids;
  - ADC distances are int sums of int LUT entries.

Training cost is bounded by construction: `sample_max_id` rows times
`iters` passes over M subspaces on the driver (the FAISS practice —
codebooks train on a bounded sample, never the corpus). Encoding and
scoring are one Arrow-batched pass over the table, map-only, no
shuffle; at cluster scale the encode pass runs once at ingest and the
query path scans codes + one broadcast LUT.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "adc_lut",
    "adc_topk_codes",
    "global_scale",
    "pq_train",
    "pq_encode",
    "pq_topk_adc",
    "quantize_query",
]


def global_scale(df: DataFrame, vec_col: str) -> float:
    """ONE symmetric scale for the whole table: 127 / max|x| (0.0 for
    an all-zero table). Global — not per-vector like quantize_int8 —
    because PQ codewords must live on the same lattice as every vector
    they quantize. max is order-independent, so the only float
    aggregate in the PQ pipeline is exactly reproducible."""
    amax_col = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )
    amax = df.agg(F.max(amax_col)).collect()[0][0]
    return 127.0 / float(amax) if amax else 0.0


def _quantize_rows(mat: np.ndarray, scale: float) -> np.ndarray:
    """floor(x * s + 0.5) in float64 — the shared lattice formula
    (identical expression in the oracle SQL)."""
    return np.floor(mat.astype(np.float64) * scale + 0.5).astype(np.int64)


def _prep_rows(mat: np.ndarray, model: dict) -> np.ndarray:
    """Rows → lattice ints under the model's contract: optionally
    L2-normalize first (the cosine-ANN practice — on unit vectors L2
    order IS cosine order, L2² = 2·(1-cos)), then quantize. Normalized
    models pin scale = 127.0 (|x| ≤ 1 on the unit sphere), so no data
    pass is needed for the scale and the lattice never clips."""
    mat = mat.astype(np.float64)
    if model.get("normalized"):
        n = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        n[n == 0.0] = 1.0
        mat = mat / n
    return _quantize_rows(mat, model["scale"])


def quantize_query(query: list[float], scale: float) -> list[int]:
    return [int(math.floor(float(x) * scale + 0.5)) for x in query]


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    sample_max_id: int = 256,
    scale: float | None = None,
    normalize: bool = False,
) -> dict:
    """Train M codebooks of K codewords on the integer lattice.

    The training sample is the rows with `id_col < sample_max_id` — a
    value-based bound, not a LIMIT, so the sample is deterministic
    under any partitioning and the oracle selects the identical rows.
    Returns {"scale", "dim", "m", "k", "iters", "normalized",
    "codebooks"} where codebooks[j] is a K x (dim/m) int list — small
    enough to broadcast (4 x 16 x 16 ints here; 32k floats even at
    FAISS-size M=64,K=256).

    `normalize=True` is the cosine-metric mode (vector_store's
    default): rows are L2-normalized before quantization so ADC's int
    L2 ranks candidates in exact cosine order, and the lattice scale
    is the constant 127.0 (unit sphere ⇒ |x| ≤ 1). The default raw
    mode is L2-metric on the original vectors and keeps the one-float-
    aggregate property the q101 oracle replays."""
    if normalize:
        scale = 127.0
    elif scale is None:
        scale = global_scale(df, vec_col)
    sample = (
        df.filter(F.col(id_col) < sample_max_id)
        .select(id_col, vec_col)
        .collect()
    )
    sample.sort(key=lambda r: r[0])
    mat = _prep_rows(
        np.array([r[1] for r in sample], dtype=np.float64),
        {"normalized": normalize, "scale": scale},
    )
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    k_eff = min(k, n)
    codebooks = []
    for j in range(m):
        sub = mat[:, j * sub_d : (j + 1) * sub_d]  # (n, sub_d) int64
        cw = sub[:k_eff].copy()  # init: k smallest ids, id order
        for _ in range(iters):
            # dists (n, k): exact int L2; argmin takes the FIRST min —
            # the lower codeword index, matching the oracle's
            # row_number() ORDER BY dist, code_idx
            d2 = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            new_cw = cw.copy()  # empty cluster keeps its codeword
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    new_cw[c] = np.floor(
                        members.sum(axis=0).astype(np.float64) / len(members)
                    ).astype(np.int64)
            cw = new_cw
        codebooks.append(cw.tolist())
    return {
        "scale": scale,
        "dim": dim,
        "m": m,
        "k": k_eff,
        "iters": iters,
        "normalized": normalize,
        "codebooks": codebooks,
    }


def _encode_mat(mat: np.ndarray, model: dict) -> np.ndarray:
    """(n, m) int codes for already-quantized rows."""
    m, sub_d = model["m"], model["dim"] // model["m"]
    codes = np.empty((mat.shape[0], m), dtype=np.int64)
    for j in range(m):
        sub = mat[:, j * sub_d : (j + 1) * sub_d]
        cw = np.asarray(model["codebooks"][j], dtype=np.int64)
        d2 = ((sub[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_encode(
    df: DataFrame, vec_col: str, model: dict, out_col: str = "pq_codes"
) -> DataFrame:
    """Append the M-byte PQ code column: quantize onto the shared
    lattice, nearest codeword per subspace (tie -> lower index). One
    Arrow-batched map pass; the codebooks ride the closure (KB-scale
    broadcast). This is the at-ingest half of the PQ recipe — stores
    persist `out_col` beside (or instead of) the raw floats."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _enc(col: pd.Series) -> pd.Series:
        mat = _prep_rows(np.stack(col.to_numpy()), model)
        codes = _encode_mat(mat, model)
        return pd.Series(list(codes.astype(np.int32)))

    return df.withColumn(out_col, _enc(F.col(vec_col)))


def adc_lut(query: list[float], model: dict) -> np.ndarray:
    """(m, k) int64 table: exact L2 between the quantized query's j-th
    subvector and codeword c — the per-query half of ADC."""
    q = _prep_rows(np.asarray([query], dtype=np.float64), model)[0]
    m, sub_d = model["m"], model["dim"] // model["m"]
    lut = np.empty((m, model["k"]), dtype=np.int64)
    for j in range(m):
        qs = q[j * sub_d : (j + 1) * sub_d]
        cw = np.asarray(model["codebooks"][j], dtype=np.int64)
        lut[j] = ((cw - qs[None, :]) ** 2).sum(axis=1)
    return lut


def adc_topk_codes(
    df: DataFrame,
    codes_col: str,
    lut: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k ADC over PERSISTED codes (the vector_store read path):
    no re-encoding — each candidate costs M int lookups against the
    broadcast (m, k) LUT. Map-only + TakeOrdered; at a billion codes
    this is the 4-bytes-per-row sequential scan PQ exists for."""
    from pyspark.sql.functions import pandas_udf

    m = lut.shape[0]

    @pandas_udf("long")
    def _adc(col: pd.Series) -> pd.Series:
        codes = np.stack(col.to_numpy()).astype(np.int64)
        dist = np.zeros(len(codes), dtype=np.int64)
        for j in range(m):
            dist += lut[j][codes[:, j]]
        return pd.Series(dist)

    return (
        df.select(F.col(id_col), _adc(F.col(codes_col)).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk_adc(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    model: dict,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k nearest by ADC: encode each row (at-query here; stores
    score persisted codes) and sum the M LUT entries — integer-exact,
    so (id, adc_dist) is engine-replicable bit for bit. Ascending
    distance, ties on the id. The scan is map-only + TakeOrdered: no
    shuffle wider than k rows."""
    from pyspark.sql.functions import pandas_udf

    lut = adc_lut(query, model)

    @pandas_udf("long")
    def _adc(col: pd.Series) -> pd.Series:
        mat = _prep_rows(np.stack(col.to_numpy()), model)
        codes = _encode_mat(mat, model)
        dist = np.zeros(len(codes), dtype=np.int64)
        for j in range(model["m"]):
            dist += lut[j][codes[:, j]]
        return pd.Series(dist)

    return (
        df.select(F.col(id_col), _adc(F.col(vec_col)).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
