"""One-pass table profiling (data-quality monitoring).

The ANALYZE-style statistics a pipeline health check reads: per
column — null count, distinct count, min/max — computed in a SINGLE
aggregate pass over the table (every statistic is a map-side-partial
aggregate, so the whole profile costs one scan + one 1-row shuffle,
regardless of column count). The long-format unpivot happens on the
1-row result, not the data.

At 100 TB: one scan is the floor for any profile; the trap to avoid
is one job per column (N scans) or a driver loop. COUNT(DISTINCT x)
for many columns expands to an expand-node plan; for wide tables
swap in approx_count_distinct (same code path, `exact=False`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Long-format profile: (column, n_null, n_distinct, min_repr,
    max_repr) — min/max rendered as strings so heterogeneous column
    types stack into one result."""
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(
            (F.countDistinct(c) if exact else F.approx_count_distinct(c)).alias(
                f"__dist_{c}"
            )
        )
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    row = df.agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_repr"),
                F.col(f"__max_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(stacked).alias("s")).select("s.*")


def segment_drift(
    docs: DataFrame,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    text_col: str = "text",
    topk: int = 15,
) -> DataFrame:
    """Distribution drift between two corpus segments: a chi-squared-
    style per-token statistic computed ENTIRELY in integer arithmetic,
    so the monitoring answer is identical on any partitioning and
    replayable bit-for-bit by a SQL engine (a float chi-squared sums
    in nondeterministic order).

    Per token t with counts a, b and segment totals Na, Nb:

        drift(t) = (a·Nb − b·Na)² // ((a + b) · Na · Nb)

    — the classic two-sample chi-squared numerator/denominator shape,
    floor-divided once per token (integer terms then sum: order-free).
    Zero when the token's rate matches across segments; grows with
    both the rate gap and the evidence. Intermediates are computed in
    decimal(38,0) — the same int128 lattice DuckDB's SUM promotes to —
    so the statistic is exact while (a·Nb − b·Na)² < 10³⁸, i.e. up to
    ~10¹⁹-token segment products; past that Spark's decimal overflow
    raises (ANSI) instead of silently wrapping a signed long.

    Returns the topk (token, a, b, drift) rows, drift descending then
    token ascending — the "what changed between these two corpus
    slices" report a training pipeline runs after every ingest.
    One explode + one token-level shuffle; totals are two broadcast
    scalars.
    """
    from block_explorer_spark.functions import text as Tx

    toks = (
        docs.filter(F.col(seg_col).isin([seg_a, seg_b]))
        .select(
            F.col(seg_col).alias("seg"),
            F.explode(
                F.filter(Tx.tokens(F.col(text_col)), lambda t: t != "")
            ).alias("token"),
        )
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("seg") == seg_a, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("seg") == seg_b, 1).otherwise(0)).alias("b"),
    )
    tot = counts.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "token",
        "a",
        "b",
        F.expr(
            # decimal(38,0) intermediates: a long-lattice (a·nb − b·na)²
            # overflows int64 at ~3e9·3e9 and non-ANSI Spark would wrap
            # silently while the DuckDB oracle (HUGEINT) kept going —
            # the engines would diverge with no error. decimal matches
            # DuckDB's int128 up to 38 digits and overflows LOUDLY.
            "((cast(a as decimal(38,0)) * nb - cast(b as decimal(38,0)) * na)"
            " * (cast(a as decimal(38,0)) * nb - cast(b as decimal(38,0)) * na))"
            " div (cast(a + b as decimal(38,0)) * na * nb)"
        ).cast("long").alias("drift"),
    )
    return scored.orderBy(F.desc("drift"), F.asc("token")).limit(topk)


def cooccurrence(
    docs: DataFrame,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Windowed token co-occurrence counts: (a, b, n) for every
    unordered token pair appearing within `window` positions in a
    document — the corpus statistic under PMI collocation mining and
    word2vec-style context tables. Pairs are counted once per
    occurrence (the right token strictly after the left), tokens
    canonicalized a ≤ b.

    Scale shape: the naive doc_id self-join compares dl² position
    pairs per document — a 100k-token doc costs 10^10 comparisons.
    This uses range-join binning instead: positions bucket by
    ⌊pos/window⌋, the left side duplicates into its own and the next
    bucket, and the join key is (doc_id, bucket) — any pair within
    `window` shares one of the two buckets, so comparisons are
    O(dl · window) and the shuffle key stays per-document bounded.
    One explode + one co-located join + one pair-count shuffle."""
    from block_explorer_spark.operators.retrieval import positional_index

    if window < 1:
        raise ValueError("window must be >= 1")
    post = positional_index(docs, id_col, text_col)
    left = post.select(
        "doc_id",
        F.col("token").alias("ta"),
        F.col("pos").alias("pa"),
        F.explode(
            F.array(
                (F.col("pos") / window).cast("long"),
                (F.col("pos") / window).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = post.select(
        "doc_id",
        F.col("token").alias("tb"),
        F.col("pos").alias("pb"),
        (F.col("pos") / window).cast("long").alias("bucket"),
    )
    pairs = left.join(right, ["doc_id", "bucket"]).filter(
        (F.col("pb") - F.col("pa")).between(1, window)
    )
    return (
        pairs.select(
            F.least("ta", "tb").alias("a"), F.greatest("ta", "tb").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )


def collocations(
    docs: DataFrame,
    window: int = 5,
    min_count: int = 2,
    topk: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: co-occurring token pairs ranked by LIFT —
    n_ab·N / (n_a·n_b), the association ratio whose log is PMI. The
    ranking is identical to PMI's (log is monotone) but the statistic
    stays inside IEEE +,*,/ — no transcendental — so a SQL oracle
    matches it bit for bit (q139), which ln-PMI could never promise.

    All inputs come from the q135-certified co-occurrence table:
    marginals n_a fold the pair counts from both sides (an (a,a)
    pair contributes twice — the convention both engines replay),
    N = Σ n. Every operand is cast to double BEFORE multiplying, so
    nothing can wrap an int64 at any corpus size: the products round
    (identically, in both engines) instead of overflowing silently.
    Two token-keyed joins against the vocabulary-sized marginal
    table; N is one driver scalar. Returns (a, b, n, lift) with
    n ≥ min_count, lift-desc / a / b ordered, optional top-k."""
    pairs = cooccurrence(docs, window, id_col, text_col)
    m = (
        pairs.select(F.col("a").alias("t"), "n")
        .unionAll(pairs.select(F.col("b").alias("t"), "n"))
        .groupBy("t")
        .agg(F.sum("n").alias("nt"))
    )
    total = pairs.agg(F.sum("n").alias("N")).collect()[0]["N"]
    if not total:
        return pairs.select(
            "a", "b", "n", F.lit(None).cast("double").alias("lift")
        ).limit(0)
    scored = (
        pairs.filter(F.col("n") >= min_count)
        .join(m.select(F.col("t").alias("a"), F.col("nt").alias("na")), "a")
        .join(m.select(F.col("t").alias("b"), F.col("nt").alias("nb")), "b")
        .select(
            "a",
            "b",
            "n",
            (
                F.col("n").cast("double") * F.lit(float(total))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("a"), F.asc("b"))
    )
    return scored.limit(topk) if topk else scored


def doc_keywords(
    docs: DataFrame,
    topk_per_doc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the top terms by tf·N/df —
    TF-IDF's ranking without its logarithm (ln is monotone, so the
    order is identical and the statistic stays inside IEEE *,/ —
    bit-exact across engines, the same trick as `collocations`).
    The tagging/labeling pass a corpus browser or weak-supervision
    pipeline runs over every document.

    One explode + one token-keyed df aggregation + one per-doc
    window; N is a driver scalar. Operands cast to double BEFORE
    multiplying — identical rounding at any corpus size, no int64
    wrap. Returns (doc_id, token, score) top-k per doc, ties by
    token."""
    from pyspark.sql import Window as W

    from block_explorer_spark.operators.retrieval import inverted_index

    if topk_per_doc < 1:
        raise ValueError("topk_per_doc must be >= 1")
    post = inverted_index(docs, id_col, text_col)
    n = docs.count()
    dfs = post.groupBy("token").agg(F.count("*").alias("df"))
    scored = post.join(dfs, "token").select(
        "doc_id",
        "token",
        (
            F.col("tf").cast("double") * F.lit(float(n))
            / F.col("df").cast("double")
        ).alias("score"),
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    )
    return (
        scored.withColumn("__rn", rn)
        .filter(F.col("__rn") <= topk_per_doc)
        .drop("__rn")
    )
