"""Budgeted corpus selection (training-data pipeline surface).

Pre-training runs fix a token budget; curation must pick the best
documents whose weights (token counts) fit it. The greedy ranking
answer — sort by score, take while the running total fits — is a
global ordered cumulative sum, which naively plans as a ONE-partition
window sort (the classic driver-shaped scale killer). budget_select
computes the exact same prefix with a two-level cumulative sum that
never materializes a global order:

  1. coarse score buckets: floor(score * n_buckets) — a map-only
     projection;
  2. per-bucket weight totals (one small aggregate) and a running
     total over the <= n_buckets + 1 bucket rows (a window over a
     handful of rows, broadcast back);
  3. a per-row cumulative sum WITHIN each bucket (window partitioned
     by bucket — distributed across the cluster, each partition
     bounded by a score band, skew bounded by the score histogram).

A row is selected iff (weight of all strictly-better buckets) +
(its within-bucket running total) <= budget — exactly the greedy
prefix, because weights are positive so the cumulative total is
monotone along the (bucket desc, score desc, id asc) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budget_select(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    id_col: str,
    budget: int,
    n_buckets: int = 20,
) -> DataFrame:
    """Exact greedy budget selection: the largest prefix of the
    (score desc, id asc) ranking whose total `weight_col` fits in
    `budget`, without a single-partition global sort.

    Requires score in [0, 1] (quality_score's range) so the bucket id
    floor(score * n_buckets) is order-consistent with score; ties
    across bucket boundaries are impossible (equal scores share a
    bucket) and ties within a bucket break by id.
    """
    bucketed = df.withColumn(
        "__bkt", F.floor(F.col(score_col) * n_buckets).cast("int")
    )
    # Tiny aggregate: one row per bucket, running total over buckets
    # in descending (better-first) order, exclusive of self.
    per_bucket = bucketed.groupBy("__bkt").agg(
        F.sum(weight_col).cast("long").alias("__bkt_w")
    )
    wb = Window.orderBy(F.desc("__bkt"))
    prefixes = per_bucket.withColumn(
        "__prefix",
        F.coalesce(
            F.sum("__bkt_w").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("__bkt", "__prefix")
    # Distributed per-row cumulative sum: window partitioned by
    # bucket, ordered better-first within it.
    wr = (
        Window.partitionBy("__bkt")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.withColumn("__cum", F.sum(weight_col).over(wr).cast("long"))
        .join(F.broadcast(prefixes), "__bkt")
        .filter(F.col("__prefix") + F.col("__cum") <= F.lit(budget))
        .withColumn("cum_weight", (F.col("__prefix") + F.col("__cum")).cast("long"))
        .drop("__bkt", "__cum", "__prefix")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the context-window
    prep step every RAG index and long-document training pipeline
    runs: windows of `chunk_tokens` starting every
    stride = chunk_tokens − overlap positions, the last window
    ragged, an empty document yielding none.

    Map-only: tokenize, explode a `sequence(0, n−1, stride)` of
    start offsets, slice the SAME token array per start — no shuffle,
    no UDF, fully whole-stage-codegen. Deterministic (chunk_id =
    start // stride), so a SQL oracle replays it with generate_series
    + list_slice. Returns (doc_id, chunk_id, n_tokens, chunk)."""
    from block_explorer_spark.functions import text as Tx

    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(Tx.tokens(F.col(text_col)), lambda t: t != "").alias("tk"),
    ).withColumn("n", F.size("tk"))
    starts = tk.filter(F.col("n") > 0).select(
        "doc_id",
        "tk",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("start"))
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(" ", F.slice("tk", F.col("start") + 1, chunk_tokens)).alias(
            "chunk"
        ),
    )
