"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query (TPC-H Q3 shape) on sf0.001.
queries()         — one entry per implemented operator family from
                    SURVEY.md §2 plus the training-data surface, each
                    expressed through block_explorer_spark operators.
oracle_sql()      — DuckDB-equivalent SQL per query, ALL 67 queries.
                    The approximate-family queries are made exactly
                    checkable: q25 emits the exact-verified pair set
                    (recall 1.0 on the gate corpus, pinned by test);
                    q26's pigeonhole blocking is exact and its simhash
                    is md5-based so the oracle recomputes it; q29/q33
                    embed their seed-deterministic hyperplanes/
                    centroids as SQL literals and replicate the exact
                    pruning algorithm.

Column names and types are aligned pairwise (aggregates aliased the
same on both sides; counts cast to BIGINT; float outputs rounded
identically) so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from block_explorer_spark.functions import text as Tx
from block_explorer_spark.functions import vectors as V
from block_explorer_spark.operators import dedup as D
from block_explorer_spark.operators import filters as Fl
from block_explorer_spark.operators import pagination as Pg
from block_explorer_spark.operators import sessions as Sx
from block_explorer_spark.operators import sketches as SK
from block_explorer_spark.operators import similarity as Sim
from block_explorer_spark.operators import windows as W

SF0001 = "/root/testdata/sf0.001"

#: Shared ANN parameters: the q29/q33 oracle SQL replicates the exact
#: pruning algorithm (hyperplane buckets / centroid cells as literals),
#: so the query and its oracle must agree on these.
EMB_DIM = 64  # driver embeddings tables are 64-d at every SF
RP_BITS = 8
RP_SEED = 42
RP_MULTIPROBE = 2
IVF_CENTROIDS = 8
IVF_SEED = 7
IVF_PROBES = 2


def _money_sum(expr, alias: str):
    """Order-independent money aggregation (round-9 sf1 fix; round-10
    cost fix).

    ROUND(SUM(double), 2) flips a half-cent whenever the fp sum lands
    within accumulated rounding error of a .xx5 boundary — Spark and
    DuckDB then disagree by 0.01 because their addition ORDERS differ
    (first seen as a 1-in-149 flip at sf1: q70; the error scales with
    group size, so it's a certainty at 100 TB). The round-9 fix cast
    each addend to DECIMAL(27,4); exact, but the per-row double ->
    BigDecimal conversion put q16 at 2.6x the double path (measured
    at sf0.1 AND the 6M-row sf1 lineitem, scripts/money_sum_ab.py).

    Round-10 formulation, exact AND 1.8x faster (1.17 s vs 2.13 s at
    sf1; 1.4x over the unsafe double path): per row,
    FLOOR(x*10000 + 0.5) -> ten-thousandths as a LONG (pure FP + one
    compact long->decimal wrap, no BigDecimal); SUM over
    DECIMAL(20,0) (exact integer arithmetic, buffer grows past long
    range without overflow at any scale); then ONE exact decimal
    multiply by 0.0001 per GROUP and a half-away ROUND to cents.
    Every money value/product here carries <=4 decimal digits, so
    x*10000 sits within fp noise of an integer and the floor is
    exact-per-row in both engines (bit-identical IEEE products).
    [Caveat, documented not hit: a 6-decimal product — e.g. a
    price*(1-disc)*(1+tax) charge — CAN sit exactly on a .00005 tie,
    where this rounds by the double's binary magnitude while the
    DECIMAL cast rounds its shortest-decimal rendering; no registry
    gate sums such an expression, verified at sf1.] The SQL twin is
    _money_sum_sql; both sides must use the same shape or the values
    drift back.
    """
    units = F.floor(expr * 10000 + F.lit(0.5)).cast("decimal(20,0)")
    dollars = F.sum(units).cast("decimal(38,4)") * F.lit("0.0001").cast("decimal(8,4)")
    return F.round(dollars, 2).cast("double").alias(alias)


def _money_sum_sql(expr: str) -> str:
    """DuckDB twin of _money_sum (see its docstring). Decimal DIVISION
    yields DOUBLE in DuckDB, so both sides use the exact decimal
    MULTIPLY-by-0.0001 instead; ROUND over decimals is half-away in
    both engines."""
    return (
        f"CAST(ROUND(CAST(SUM(CAST(FLOOR(({expr}) * 10000 + 0.5) AS BIGINT)) "
        f"AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE)"
    )


def _gate_store(name: str, sf_dir: str, build: Callable[[str], None]) -> str:
    """Stable per-(gate, sf) store directory with a completion marker:
    built ONCE, reused by every later invocation. Gates that rewrite a
    table into a manifest store (q111 z-order, q120/q121 postings
    index) used to mkdtemp a fresh full copy per call and never remove
    it — repeated bench/certification passes leaked unbounded /tmp
    disk. Build lands in a unique temp dir and publishes via atomic
    directory rename, so a racing builder loses cleanly."""
    import hashlib
    import shutil
    import uuid

    root = os.environ.get("BES_GATE_CACHE", "/tmp/bes-gate-cache")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(root, f"{name}-{key}")
    if os.path.exists(os.path.join(base, "_GATE_READY")):
        return base
    tmp = f"{base}.tmp-{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, "_GATE_READY"), "w"):
        pass
    try:
        os.rename(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # racer published first
    return base


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older driver testdata stored events.ts as TIMESTAMP(NANOS),
        # which Spark's reader rejects by default; read as long nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to long epoch-nanos whatever the physical type:
        # the current driver testdata stores TIMESTAMP(MICROS) (read as
        # TIMESTAMP_NTZ), older generations stored TIMESTAMP(NANOS)
        # (read as long via nanosAsLong). The NTZ arithmetic below is
        # naive-datetime math — session-timezone independent, exactly
        # DuckDB's epoch_us() on a naive TIMESTAMP.
        dt = df.schema["ts"].dataType.typeName()
        if dt == "timestamp_ntz":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"
                ),
            )
        elif dt == "timestamp":
            df = df.withColumn("ts", F.unix_micros(F.col("ts")) * 1000)
    return df


# ---------------------------------------------------------------------------
# Relational query surface (SURVEY §2 shapes on the driver tables)
# ---------------------------------------------------------------------------


def q01_keyset_page(spark: SparkSession, sf: str) -> DataFrame:
    """F4+F5+W1+limit: lifeline-shaped keyset pagination on lineitem."""
    li = _t(spark, sf, "lineitem")
    df = Fl.apply_filters(
        li,
        Fl.equality(l_returnflag="R"),
        Fl.keyset_cursor("l_orderkey", "l_linenumber", 10000, 3, ascending=True),
    )
    page = Pg.paginate(df, [("l_orderkey", True), ("l_linenumber", True)], limit=50)
    return page.select("l_orderkey", "l_linenumber", "l_quantity")


def q02_range_page(spark: SparkSession, sf: str) -> DataFrame:
    """F2 4-way range + W1 desc + offset pagination (row_number)."""
    o = _t(spark, sf, "orders")
    df = Fl.apply_filters(
        o, Fl.range_4way("o_orderkey", gte=1000, lt=40000), Fl.equality(o_orderstatus="F")
    )
    page = Pg.paginate(df, [("o_orderkey", False)], limit=40, offset=25)
    return page.select("o_orderkey", "o_custkey", "o_totalprice")


def q03_chain_repair(spark: SparkSession, sf: str) -> DataFrame:
    """W2: adjacent-row chain repair with -1 sentinels over a gappy set."""
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "click")
    linked = ev.select(
        "event_id",
        (F.col("event_id") - 1).alias("prev_event_id"),
        (F.col("event_id") + 1).alias("next_event_id"),
    )
    return W.chain_repair(
        linked, key="event_id", prev_link="prev_event_id", next_link="next_event_id"
    )


def q04_prefix_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    """F9: prefix-hierarchy match (ancestors IN-list + LIKE 'p%')."""
    p = _t(spark, sf, "part")
    pred = Fl.jet_hierarchy("PROMO", ["Brand#11", "Brand#22"], col="p_type") | Fl.in_list(
        "p_brand", ["Brand#11", "Brand#22"]
    )
    return p.filter(pred).select("p_partkey", "p_brand", "p_type")


def q05_in_list(spark: SparkSession, sf: str) -> DataFrame:
    """F8 IN-list + A1-style grouped counts."""
    o = _t(spark, sf, "orders")
    return (
        o.filter(Fl.in_list("o_orderpriority", ["1-URGENT", "2-HIGH"]))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "sum_totalprice"),
        )
    )


def q06_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """F6: composite point lookup (jet-drop-records shape)."""
    li = _t(spark, sf, "lineitem")
    return li.filter(Fl.equality(l_orderkey=1)).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


def q07_counters(spark: SparkSession, sf: str) -> DataFrame:
    """A2/A3: derived denormalized counters via groupBy."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_amount"),
        _money_sum(F.col("o_totalprice"), "total_spent"),
    )


def q08_minmax_seek(spark: SparkSession, sf: str) -> DataFrame:
    """A4/A5: filtered MIN/MAX seeks in one pass."""
    li = _t(spark, sf, "lineitem")
    return li.filter(F.col("l_returnflag") == "A").agg(
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_extendedprice").alias("max_price"),
    )


def q09_topk(spark: SparkSession, sf: str) -> DataFrame:
    """§2.6 top-k: ORDER BY ... LIMIT n → TakeOrderedAndProject."""
    o = _t(spark, sf, "orders")
    top = Pg.paginate(o, [("o_totalprice", False), ("o_orderkey", True)], limit=25)
    return top.select("o_orderkey", "o_totalprice")


def q10_union_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7: union of two filtered scans + dropDuplicates."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.unionByName(b).dropDuplicates(["o_custkey"])


def q11_exporter_join(spark: SparkSession, sf: str) -> DataFrame:
    """J1+A6: broadcast equi-join, small dim side, matched-count agg."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    joined = F.broadcast(c.select("c_custkey")).join(
        o, on=F.col("c_custkey") == F.col("o_custkey"), how="inner"
    )
    return joined.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("record_amount"))


def q12_prevnext_link(spark: SparkSession, sf: str) -> DataFrame:
    """J2: link-resolving left self-join with -1 sentinel for absences."""
    o = _t(spark, sf, "orders")
    probe = o.filter(F.col("o_custkey") <= 50).select("o_orderkey", "o_custkey")
    links = o.select((F.col("o_orderkey") - 1).alias("__prev"), F.col("o_orderkey").alias("__next_key"))
    return (
        probe.join(links, on=F.col("o_orderkey") == F.col("__prev"), how="left_outer")
        .withColumn("next_orderkey", F.coalesce(F.col("__next_key"), F.lit(-1)))
        .select("o_orderkey", "o_custkey", "next_orderkey")
    )


def q13_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """D-family streaming analog: session windows via lag + running sum."""
    ev = _t(spark, sf, "events")
    return Sx.session_stats(ev, gap_seconds=1800)


def q14_index_format(spark: SparkSession, sf: str) -> DataFrame:
    """X2/X3: composite id formatting with root sentinel rendering."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        F.concat_ws(
            ":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
        ).alias("record_index"),
        F.when(F.col("l_returnflag") == "N", F.lit("*"))
        .otherwise(F.col("l_returnflag"))
        .alias("flag_display"),
    )


def q15_siblings(spark: SparkSession, sf: str) -> DataFrame:
    """X5/J3: binary-trie sibling IN-list over a derived jet column."""
    p = _t(spark, sf, "part")
    from block_explorer_spark.functions.jets import sibling_exprs

    sib = sibling_exprs("101")  # {101, 1010, 1011, 10}
    return (
        p.withColumn("jet", F.bin("p_size"))
        .filter(F.col("jet").isin(sib))
        .select("p_partkey", "p_size", "jet")
    )


def q16_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 pricing summary: wide agg, map-side partials."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity"), "sum_qty"),
            _money_sum(F.col("l_extendedprice"), "sum_base_price"),
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q17_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + top-k."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    joined = (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)


def q18_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: 6-way join, dims broadcast."""
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


def q19_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure pushed-down filter + single agg."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
# Training-data surface (documents / embeddings)
# ---------------------------------------------------------------------------


def q20_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup on the bag-of-words fingerprint (hash-groupBy)."""
    docs = _t(spark, sf, "documents")
    return D.fingerprint_dedup(docs, "text", "doc_id")


def q21_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting + numeric quality ratios, all JVM-side."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        Tx.token_count("text").cast("long").alias("n_tokens"),
        F.length(F.col("text")).cast("long").alias("n_chars_computed"),
        F.round(Tx.mean_token_len("text"), 4).alias("mean_token_len"),
    )


def q22_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-overlap language ID heuristic."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        Tx.stopword_hits("text", "en").cast("long").alias("en_hits"),
        Tx.stopword_hits("text", "de").cast("long").alias("de_hits"),
        Tx.language_id("text").alias("predicted_lang"),
        "lang",
    )


def q23_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality score (length/digit/punct/token-shape)."""
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", Tx.quality_score("text").alias("quality"))


def q24_word_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram jaccard pairs via inverted shingle index."""
    docs = _t(spark, sf, "documents")
    pairs = D.jaccard_pairs_prefix(docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.8)
    return pairs.select(
        "id_a", "id_b", "inter", "size_a", "size_b", F.round("jaccard", 6).alias("jaccard")
    )


def q25_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, exact-verified against the
    jaccard threshold.

    Oracle-checkable because the output is the EXACT-VERIFIED set: a
    returned pair always has true jaccard >= 0.8, so the output is a
    subset of the exact-jaccard result, and equals it whenever LSH
    recall is 1.0 at the threshold. With 128 hashes / 16 bands
    (r = 8), P(candidate | j=0.8) ≈ 0.95 per pair and the gate
    corpus's near-dup pairs sit well above the S-curve midpoint —
    recall 1.0 on the driver corpus at every SF, pinned by
    test_dedup_similarity::test_minhash_lsh_matches_exact_on_gate_corpus.
    The oracle is q24's exact-jaccard SQL restricted to this
    projection."""
    docs = _t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.8, num_hashes=128, bands=16
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q26_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole-blocked hamming lookup.

    EXACT, not probabilistic: blocks(12) > max_hamming(8) guarantees
    every qualifying pair shares one unspoiled chunk, so the output
    equals the all-pairs hamming filter. Built on the md5-derived
    60-bit shingle hash (D.md5_hash60) so the identical simhash — and
    hence the full result — is computable in the DuckDB oracle."""
    docs = _t(spark, sf, "documents")
    return D.simhash_pairs(
        docs,
        "doc_id",
        Tx.word_ngrams("text", 3),
        max_hamming=8,
        blocks=12,
        bits=60,
        hash_expr=D.md5_hash60(),
    )


def q27_ann_brute(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k against a stored query vector."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = Sim.brute_force_topk(emb, "embedding", qvec, k=10)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q28_embed_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs blocked by label (per-block BLAS gram
    matrix; agrees with the Catalyst fold version — see
    test_dedup_similarity::test_cosine_pairs_blas_matches_fold)."""
    emb = _t(spark, sf, "embeddings")
    pairs = Sim.cosine_pairs_blas(emb, "embedding", "label", threshold=0.3)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q29_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """RP-LSH bucketed ANN top-k (scale path: candidates = buckets
    within hamming RP_MULTIPROBE of the query's bucket, ~37/256 of the
    data at 8 bits). The hyperplanes are seed-deterministic literals,
    so the DuckDB oracle replicates the same bucketing + probe set +
    cosine top-k exactly — deterministic, no probabilistic slack."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = Sim.rp_lsh_topk(
        emb, "embedding", qvec, k=10, bits=RP_BITS, seed=RP_SEED,
        multiprobe_hamming=RP_MULTIPROBE,
    )
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q34_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregate family: COUNT(DISTINCT) per group."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q35_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical aggregate family: ROLLUP with grouping_id."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            _money_sum(F.col("l_quantity"), "sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")
    )


def q36_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (no native Spark operator): each click event joined
    to the same user's latest prior-or-equal purchase, via the
    single-shuffle union+window formulation."""
    from block_explorer_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(clicks, purchases, on="user_id", right_cols=["value"], suffix="_p")
    # nanos -> micros: DuckDB TIMESTAMP carries microsecond precision
    return joined.select(
        "event_id",
        "user_id",
        F.expr("ts_p div 1000").alias("purchase_ts"),
        F.round("value_p", 4).alias("purchase_value"),
    )


def q37_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile family: exact interpolated percentiles per group
    (Spark percentile == DuckDB quantile_cont definitionally)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


def q38_window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic-window family: per-key running sum + rank + lag."""
    o = _t(spark, sf, "orders").filter(F.col("o_custkey") <= 100)
    w_order = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_order), 2).alias("running_total"),
        F.rank().over(w_rank).cast("long").alias("price_rank"),
        F.coalesce(F.lag("o_orderkey").over(w_order), F.lit(-1)).alias("prev_orderkey"),
    )


def q39_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-mitigated join: salted scatter/replicate formulation must
    produce exactly the plain join's result (here aggregated per
    supplier). The skew shape at scale is a hot join key AQE can split
    but not de-collide."""
    from block_explorer_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity", "l_extendedprice"
    )
    s = _t(spark, sf, "supplier").select(F.col("s_suppkey").alias("suppkey"), "s_name")
    joined = salted_join(li, s, on="suppkey", salt=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        _money_sum(F.col("l_quantity"), "sum_qty"),
    )


def q40_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range (point-in-interval) join via bucketized equi-join — the
    scale replacement for the O(N·M) theta join Spark would plan.
    Clicks joined to 1-hour windows opened by purchases; micros on
    both sides so boundary semantics match DuckDB exactly."""
    from block_explorer_spark.operators.ranges import range_join

    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("win_user"),
        F.expr("ts div 1000").alias("lo_us"),
        (F.expr("ts div 1000") + 3_600_000_000).alias("hi_us"),
    )
    joined = range_join(clicks, windows, "ts_us", "lo_us", "hi_us", bucket=600_000_000)
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("win_user").alias("sum_users"),
    )


def q41_correlated_max(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-scalar-subquery shape (each customer's priciest
    order), decorrelated to a per-key window max — the standard Spark
    rewrite that keeps one shuffle instead of a re-scan per row."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("__mx", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("__mx"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q42_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 customer distribution: LEFT OUTER join preserving
    order-less customers, two-level aggregation."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")  # driver tables carry no o_comment column
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q43_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING-filtered aggregate as
    a semi-join feeding the main join."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select(F.col("l_orderkey").alias("__bigkey"))
    )
    joined = (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("__bigkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money_sum(F.col("l_quantity"), "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q44_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Anti-join family (absence check done row-at-a-time in the
    reference — updatePrevPulse — expressed as left_anti here):
    customers who never placed an URGENT order."""
    from block_explorer_spark.operators.joins import anti_missing

    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_missing(c, o, "c_custkey")


def q45_setops(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT/EXCEPT family: customers that bought in both halves
    of 1996 minus the BUILDING segment."""
    o = _t(spark, sf, "orders")
    h1 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_custkey")
    h2 = o.filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    building = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return h1.intersect(h2).exceptAll(building.distinct())


def q46_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE + grouping_id: all 4 grouping sets of (status, priority)
    in one pass (map-side partial aggs expand the sets; one shuffle)."""
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


def q47_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: order counts per priority pivoted by status. Spark's
    relational pivot with an explicit value list (no extra pass to
    discover values; single shuffle, same plan as CASE-WHEN aggs)."""
    o = _t(spark, sf, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


def q48_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series resample with gap fill: daily click counts with
    zero rows for missing days. The day spine is F.sequence over the
    observed [min, max] — generated distributed, no driver loop — then
    a broadcast-able left join back onto the daily aggregate."""
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "click")
    # ts is long nanos (see _t); truncate to days via naive-datetime
    # arithmetic (NTZ epoch + micros), session-timezone independent.
    day = F.to_date(
        F.expr("timestampadd(MICROSECOND, CAST(ts div 1000 AS BIGINT), TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    )
    daily = ev.select(day.alias("day")).groupBy("day").agg(F.count(F.lit(1)).alias("n_clicks"))
    spine = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi")).select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"))
    )


def q49_exists(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders having at least one
    returned line, counted per priority. Decorrelates to a left-semi
    join — never a count-then-filter over the full join product."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    has_return = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi"
    )
    return has_return.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def q50_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery + NOT EXISTS (TPC-H Q22 shape): customers with
    above-average positive balance and no large (>300k) order, per
    nation. The global average is a 1-row aggregate broadcast into the
    filter; the NOT EXISTS is a left-anti join."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__avg"))
    rich = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        _money_sum(F.col("c_acctbal"), "total_bal"),
    )


def q51_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional aggregate over a join (TPC-H Q14 shape): monthly
    share of revenue from PROMO parts. part⋈lineitem broadcasts the
    small side; the CASE-WHEN ratio is two partial aggs in one pass."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == p.p_partkey)
    return (
        j.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                / F.sum(rev) * 100,
            6,
            ).alias("promo_share_pct"),
            _money_sum(rev, "revenue"),
        )
    )


def q52_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group: 3 highest-value orders per priority via
    row_number with a deterministic tiebreak — per-partition window,
    single shuffle on the group key."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


def q53_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-join chain (TPC-H Q10 shape): revenue lost to returns per
    customer, top 20. Dimension joins broadcast (nation); the
    customer⋈orders⋈lineitem chain shuffles on its keys once each."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(_money_sum(rev, "revenue"))
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


def q54_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured column: typed extraction from a JSON string
    column (`events.props`) feeding a relational aggregate. from_json
    with an explicit schema — parsed once, JVM-side, no UDF; the
    projection prunes to (event_type, props) at the scan."""
    from pyspark.sql import types as T

    ev = _t(spark, sf, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", T.StructType([T.StructField("k", T.LongType())])).alias("__p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__p.k").alias("sum_k"),
        F.max("__p.k").alias("max_k"),
    )


def q55_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based train/val/test split — THE reproducible
    corpus-split primitive (no RNG, no state: membership is a pure
    function of the id, stable under reruns, additions, repartitioning).
    md5 is engine-portable, so the oracle proves cross-engine split
    identity; per (split, lang) counts audit stratification."""
    docs = _t(spark, sf, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split")
    )
    return docs.select(split, "lang").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q56_seq_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for LLM training: documents stream into ~4096-
    token packs per language via a running token-count window — pack
    boundaries are a floor-divide over the cumulative sum, so packing
    is deterministic and embarrassingly parallel per partition key
    (one shuffle on lang; no sequential driver loop)."""
    docs = _t(spark, sf, "documents")
    toks = Tx.token_count("text").cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id")
    packed = docs.select(
        "lang",
        "doc_id",
        toks.alias("n_tokens"),
        (F.floor((F.sum(toks).over(w) - toks) / 4096)).alias("pack_id"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


def q57_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations. The disjunctive
    nation-pair predicate is pushed INTO both nation dims (each side
    pre-filtered to the two nations, broadcast), so the fact join never
    sees rows that can't qualify; only the same-nation pairs are
    removed post-join. lineitem⋈orders is the one shuffle."""
    pair = ["NATION_1", "NATION_2"]
    n = _t(spark, sf, "nation").filter(F.col("n_name").isin(pair))
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    supp = F.broadcast(s.join(F.broadcast(n1), "s_nationkey").drop("s_nationkey"))
    cust = F.broadcast(c.join(F.broadcast(n2), "c_nationkey").drop("c_nationkey"))
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


def q58_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_3's share of PROMO-part
    revenue sold into ASIA, per order year. Every dim (part filtered to
    PROMO, region→nation, supplier-nation) broadcasts; the share is a
    conditional partial aggregate — one pass, no second join."""
    p = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    li = _t(spark, sf, "lineitem")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    asia_cust = F.broadcast(
        c.join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey).select("c_custkey")
    )
    supp_nat = F.broadcast(
        s.join(F.broadcast(n.select("n_nationkey", "n_name")), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
    )
    return j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)) / F.sum(vol),
            6,
        ).alias("mkt_share"),
        _money_sum(vol, "total_volume"),
    )


def q59_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the driver schema has no
    l_shipmode/commitdate/receiptdate, so "late" = shipped >90 days
    after order date and l_linestatus stands in for the mode group).
    The CASE-WHEN priority counts are map-side partials over one
    lineitem⋈orders shuffle."""
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


def q60_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue view, then the
    supplier(s) whose revenue equals the global max. The max is a
    1-row aggregate broadcast into the filter (no window over the
    whole view); supplier dim broadcasts. Revenue is rounded before
    the equality so the comparison is engine-stable."""
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = revenue.join(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("__mx"))
    return (
        top.join(F.broadcast(s), top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q61_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: correlated per-part AVG
    subquery decorrelated into a groupBy + broadcast join (never a
    per-row re-aggregation). Threshold rounded to 6dp so the strict
    '<' is identical across engines."""
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_brand").isin("Brand#11", "Brand#23"))
        .select("p_partkey", "p_brand")
    )
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return j.groupBy("p_brand").agg(
        # exact sum first (same long-units formulation as _money_sum),
        # then one double division: the boundary risk of
        # round(sum(double)) is in the SUM's length, not the /7
        F.round(
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast(
                        "decimal(20,0)"
                    )
                ).cast("decimal(38,4)")
                * F.lit("0.0001").cast("decimal(8,4)")
            ).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q62_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 disjunctive join predicate: OR of three conjunctive
    (brand, size, quantity) clauses across part⋈lineitem. The common
    disjunct parts (p_size >= 1) stay pushable; part broadcasts so the
    OR never forces a shuffle strategy change."""
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q63_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no receipt/commit dates — a "failed"
    line is l_returnflag='R'): suppliers who were the ONLY failing
    supplier in a multi-supplier order. The EXISTS / NOT EXISTS pair
    is decorrelated into per-order supplier counts (two-level agg +
    one join) instead of two correlated self-joins over lineitem."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    ordsupp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("failed")
    )
    ords = ordsupp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("failed").alias("n_failed")
    )
    waiting = (
        ordsupp.filter(F.col("failed") == 1)
        .join(ords, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_failed") == 1))
    )
    agg = (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return agg.orderBy(F.col("numwait").desc(), F.col("s_name").asc()).limit(20)


def q64_text_clean(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus normalization pass (training-data prep): lowercase, strip
    non-alphanumerics, collapse whitespace — all JVM-side regexp_replace
    (no UDF), audited per language as chars in/out. One narrow map +
    one small shuffle on lang; at 100 TB this is the canonical
    embarrassingly-parallel scan shape."""
    docs = _t(spark, sf, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", ""), " +", " "
    )
    per_doc = docs.select(
        "lang", F.length("text").alias("n_before"), F.length(norm).alias("n_after")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_before").cast("long").alias("chars_before"),
        F.sum("n_after").cast("long").alias("chars_after"),
    )


def q65_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary building (tokenizer prep): explode whitespace tokens,
    count, top-50 with a deterministic (count desc, token asc) tiebreak
    → TakeOrderedAndProject after a map-side-combined count, never a
    global sort of the full vocabulary."""
    docs = _t(spark, sf, "documents")
    tok = F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    counts = (
        docs.select(tok)
        .filter(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(50)


def q66_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: which held-out (test-bucket) docs
    share an 8-token shingle with any train-bucket doc. Composes the
    deterministic md5 split (q55) with winnowing fingerprints (q31);
    the overlap is one shuffle join on the shingle hash + per-test-doc
    distinct counts. At scale the train side stays deduped (doc, fp)
    pairs — never materialized driver-side."""
    docs = _t(spark, sf, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    fps = docs.select(
        "doc_id",
        bucket.alias("b"),
        F.explode(Tx.rolling_fingerprint("text", window=8, hashf="md5")).alias("fp"),
    )
    train = fps.filter(F.col("b") < 8).select(F.col("doc_id").alias("train_doc"), "fp")
    test = fps.filter(F.col("b") == 9).select(F.col("doc_id").alias("test_doc"), "fp")
    hits = test.join(train, "fp")
    return hits.groupBy("test_doc").agg(
        F.count_distinct(F.col("fp")).alias("n_shared_shingles"),
        F.count_distinct(F.col("train_doc")).alias("n_train_docs"),
    )


def q67_length_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-based quality filter (corpus curation): keep docs
    inside the per-language 5th-95th length percentile. The per-lang
    bounds are a tiny exact-percentile aggregate broadcast back onto
    the scan — never a window over the full corpus; bounds rounded to
    6dp so the boundary comparison is engine-stable."""
    docs = _t(spark, sf, "documents")
    n = F.length("text")
    bounds = docs.groupBy(F.col("lang").alias("b_lang")).agg(
        F.round(F.expr("percentile(length(text), 0.05D)"), 6).alias("lo"),
        F.round(F.expr("percentile(length(text), 0.95D)"), 6).alias("hi"),
    )
    kept = docs.join(F.broadcast(bounds), docs.lang == bounds.b_lang).filter(
        (n >= F.col("lo")) & (n <= F.col("hi"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min(n).cast("long").alias("min_len"),
        F.max(n).cast("long").alias("max_len"),
    )


def q33_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the partition-pruned scale path,
    exercised through the production precomputed-centroid route
    (ivf_topk(centroids=...); at scale the table is written partitioned
    by centroid_id and training happens once at index build). The
    centroids here are the seed-reproducible stand-in for that stored
    artifact (Sim.seeded_centroids, scale matched to the embedding
    spread), which makes assign → probe → top-k fully replicable in
    the DuckDB oracle — deterministic, no probabilistic slack."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = Sim.seeded_centroids(len(qvec), IVF_CENTROIDS, seed=IVF_SEED, scale=0.125)
    top = Sim.ivf_topk(emb, "embedding", qvec, k=10, centroids=cents, n_probe=IVF_PROBES)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q30_hash_chain(spark: SparkSession, sf: str) -> DataFrame:
    """J4 hash-chain join: parent/child edges where a drop's hash equals
    another's first/second_prev_hash (union of two equi-joins + dedup).
    Exercises operators.joins.hash_chain_edges on a drops-shaped frame
    derived from events (hash = event_id, links at -1 and -3)."""
    from block_explorer_spark.operators import joins as J

    ev = _t(spark, sf, "events").filter(F.col("event_type") == "click")
    drops = ev.select(
        F.col("event_id").cast("string").alias("jet_id"),
        F.col("event_id").alias("pulse_number"),
        F.col("event_id").alias("hash"),
        (F.col("event_id") - 1).alias("first_prev_hash"),
        (F.col("event_id") - 3).alias("second_prev_hash"),
    )
    return J.hash_chain_edges(drops)


def q31_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling (winnowing) document fingerprint: distinct window hashes
    per doc; md5 mode so the DuckDB oracle reproduces values exactly."""
    docs = _t(spark, sf, "documents")
    fp = Tx.rolling_fingerprint("text", window=8, hashf="md5")
    return docs.select(
        "doc_id",
        F.size(fp).cast("long").alias("n_fp"),
        F.array_min(fp).alias("min_fp"),
    )


def q32_media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing through the correctness gate: documents cast
    to an opaque binary payload, then Arrow-batched mapInPandas feature
    extraction (sha256 + byte length are oracle-checkable; the decode
    step itself is the stubbed codec)."""
    from block_explorer_spark.operators import multimodal as M

    docs = _t(spark, sf, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = M.extract_features(media)
    return feats.select("media_id", "modality", "payload_sha256", "n_bytes")


def q68_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 min-cost supplier (adapted: the driver schema has no
    partsupp, so the part↔supplier relation and its unit cost come
    from lineitem: cost(part, supp) = min(l_extendedprice /
    l_quantity)). The correlated min-cost subquery is decorrelated
    into a per-part aggregate joined back (never re-aggregated per
    row); the EUROPE supplier dim broadcasts into both sides. Costs
    rounded to 6dp so the min-equality is engine-stable."""
    r = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_name")
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    eu_supp = F.broadcast(
        s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(eu_supp, li.l_suppkey == eu_supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    top = cost.join(
        F.broadcast(best),
        (cost.p_partkey == best.b_partkey) & (cost.unit_cost == best.best_cost),
    )
    return (
        top.select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q69_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: no commit/receipt
    dates — a "late" order has at least one returned line,
    l_returnflag = 'R'). EXISTS becomes a left-semi join: lineitem is
    pre-filtered and deduped map-side, never multiplied into orders."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R").select("l_orderkey")
    flagged = o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
    return (
        flagged.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q70_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no partsupp, so supply
    cost = 0.6 * p_retailprice per unit). Part filter (name contains
    'bolt') prunes the fact scan through a broadcast join; profit is
    a single map-side expression; one shuffle for the final group."""
    p = _t(spark, sf, "part").filter(F.col("p_name").contains("bolt")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf, "lineitem")
    supp_nat = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        "nation", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(_money_sum(amount, "sum_profit"))


def q71_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: revenue lost to returns per
    customer in one quarter, top 20. customer⋈nation broadcasts; the
    orders⋈lineitem shuffle carries only pre-filtered rows; top-k is
    TakeOrderedAndProject, never a global sort."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(cust, o.o_custkey == cust.c_custkey)
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


def q72_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 important inventory (adapted: no partsupp — a part's
    "value" held by NATION_5's suppliers = sum of their lineitem
    extended prices). The global threshold (0.1% of total) is a 1-row
    aggregate broadcast into the filter, the decorrelated form of
    Q11's scalar subquery."""
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    )
    held = li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
    per_part = held.groupBy("l_partkey").agg(
        _money_sum(F.col("l_extendedprice"), "part_value")
    )
    threshold = per_part.agg((F.sum("part_value") * 0.001).alias("__thr"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("__thr"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def q73_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: the relation is
    distinct (l_partkey, l_suppkey) from lineitem; excluded suppliers
    are those in deficit, s_acctbal < 0, standing in for the
    'complaints' NOT IN). The exclusion is a broadcast anti-join;
    supplier counts are COUNT(DISTINCT) over one shuffle keyed on the
    (brand, type, size) group."""
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    ok = rel.join(F.broadcast(bad), rel.l_suppkey == bad.s_suppkey, "left_anti")
    j = ok.join(F.broadcast(p), ok.l_partkey == p.p_partkey)
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q74_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: 'excess stock'
    becomes share of 1996 shipped quantity — a NATION_2 supplier
    qualifies if for some red part it shipped more than half that
    part's 1996 total). The nested agg is two groupBys sharing the
    (part) key; the per-part total joins back broadcast. EXISTS is a
    left-semi join onto the supplier dim."""
    p = _t(spark, sf, "part").filter(F.col("p_name").startswith("red")).select("p_partkey")
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_2")
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    red = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per_ps = red.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("supp_qty"))
    per_part = red.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    heavy = (
        per_ps.join(F.broadcast(per_part), per_ps.l_partkey == per_part.t_partkey)
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
    )
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return (
        nat.join(heavy, nat.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q75_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: no phone column —
    'country code' = c_nationkey % 10, and every customer has some
    order in this data, so 'never ordered' becomes 'lapsed: no order
    since 1999'). Rich lapsed customers: balance above the
    positive-balance average (1-row broadcast scalar), no recent
    orders (anti-join against the pre-filtered distinct custkey
    set — the date filter prunes the orders scan first)."""
    c = _t(spark, sf, "customer").filter((F.col("c_nationkey") % 10).isin(1, 3, 5, 7))
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
        .distinct()
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("__avg")
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__avg"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy((F.col("c_nationkey") % 10).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q76_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality signals: per-doc duplicate
    fractions of words / 2-grams / 3-grams — a map-only projection
    (no explode, no shuffle), exactly what a 100 TB quality-filter
    pass must be. Runs the Arrow-vectorized path (the HOF column
    formulation is semantically identical — pinned by test — but
    Catalyst evaluates HOFs interpreted, ~12x slower here)."""
    docs = _t(spark, sf, "documents")
    rep = Tx.repetition_signals_arrow()(F.col("text"))
    return docs.select("doc_id", rep.alias("__r")).select(
        "doc_id",
        F.round("__r.dup_word_frac", 6).alias("dup_word_frac"),
        F.round("__r.dup_2gram_frac", 6).alias("dup_2gram_frac"),
        F.round("__r.dup_3gram_frac", 6).alias("dup_3gram_frac"),
    )


def q77_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language downsampling (corpus mixing): keep
    rates as an md5-bucket scan predicate — map-only, pushable, no
    RNG state, reproducible in any engine (operators.sampling)."""
    from block_explorer_spark.operators import sampling as Smp

    docs = _t(spark, sf, "documents")
    kept = Smp.stratified_sample(
        docs, "lang", "doc_id", rates={"en": 10, "de": 50, "es": 25, "fr": 100, "zh": 4}
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
    )


def q78_uniform_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global k-sample: smallest-k md5(doc_id) — planned
    as TakeOrderedAndProject (per-partition heaps, k-row driver
    merge), the reservoir-sampling equivalent that never sorts or
    materializes the corpus."""
    from block_explorer_spark.operators import sampling as Smp

    docs = _t(spark, sf, "documents")
    return Smp.uniform_sample(docs, "doc_id", 50).select("doc_id", "lang", "n_chars")


def q79_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub pass over the semi-structured props payload: redact
    email/phone/digit-run spans (map-only regexp chain, functions.text
    PII_PATTERNS — RE2-safe so any engine reproduces it) and account
    per event type: matches found, bytes before/after."""
    ev = _t(spark, sf, "events")
    red = Tx.pii_redact("props")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(Tx.pii_hits("props", "digits")).alias("digit_hits"),
        F.sum(F.length("props")).cast("long").alias("bytes_before"),
        F.sum(F.length(red)).cast("long").alias("bytes_after"),
    )


def q80_domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain corpus accounting: normalize a URL-ish source to its
    registrable host (functions.text.domain_of — scheme/www/port/path
    stripped) and aggregate doc count + volume. The URL is derived
    from the source tag so the parse is exercised end-to-end."""
    docs = _t(spark, sf, "documents")
    url = F.concat(F.lit("https://www."), F.col("source"), F.lit(".example.com:443/d/"),
                   F.col("doc_id").cast("string"))
    return (
        docs.select(Tx.domain_of(url).alias("domain"), "n_chars")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q81_quantized_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Int8-quantized ANN top-k (SQ8 candidate generation): symmetric
    per-vector quantization, exact integer dot, rescale, top-k. The
    integer arithmetic makes the result engine-replicable with no
    float-order slack (similarity.quantize_int8 / quantized_topk)."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = Sim.quantized_topk(emb, "embedding", qvec, k=10)
    return top.select("vec_id", F.round("qcosine", 6).alias("qcosine"))


def q83_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup cluster resolution: near-dup pairs (q24's exact jaccard
    at 0.8) → connected components (hash-min propagation, one shuffle
    per round, O(clique-diameter) rounds) → canonical-survivor
    labeling. The step every dedup pipeline needs after pair
    generation; oracle replicates the closure with DuckDB's recursive
    CTE (operators/graph.py)."""
    from block_explorer_spark.operators import graph as G

    docs = _t(spark, sf, "documents")
    pairs = D.jaccard_pairs_prefix(docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.8)
    cl = G.dedup_clusters(pairs)
    sizes = cl.groupBy(F.col("cluster_id").alias("__c")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        cl.join(F.broadcast(sizes), cl.cluster_id == F.col("__c"))
        .select("doc_id", "cluster_id", "is_canonical", "n_members")
    )


def q84_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit window frames: 3-row moving average, running sum
    (ROWS UNBOUNDED PRECEDING), and a value-RANGE frame (orders
    within $1000 below the current price). One shuffle on the
    partition key serves all three frames — Spark evaluates sibling
    windows over the same (partition, order) spec in a single
    WindowExec pass."""
    o = _t(spark, sf, "orders").filter(F.col("o_custkey") < 50)
    w = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    wp = "PARTITION BY o_custkey ORDER BY o_totalprice"
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.expr(f"avg(o_totalprice) OVER ({w} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"),
            6,
        ).alias("mov_avg_3"),
        F.round(
            F.expr(f"sum(o_totalprice) OVER ({w} ROWS UNBOUNDED PRECEDING)"), 6
        ).alias("run_sum"),
        F.expr(
            f"count(*) OVER ({wp} RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_similar_price"),
    )


def q86_corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship curation chain — the full pre-training corpus
    pipeline as ONE composed Spark plan (C4/Gopher/RefinedWeb shape):

      quality gates (length + repetition, map-only)
      → exact near-dup removal (bag-of-words fingerprint, one
        hash shuffle, min-id survivor)
      → deterministic per-language downsampling (md5-bucket scan
        predicate)
      → deterministic train/val/test split (md5-bucket)
      → per (split, lang) accounting.

    Every stage is an operator certified on its own gate query
    (q23/q76, q20, q77, q55); this one certifies their COMPOSITION —
    the oracle runs the same chain as SQL CTEs, so stage ordering
    and filter interactions are pinned cross-engine too. Plan shape:
    two shuffles total (dedup groupBy, final aggregate) — everything
    else stays on the scan."""
    docs = _t(spark, sf, "documents")
    ntok = Tx.token_count("text")
    kept = docs.filter((ntok >= 20) & (Tx.duplicate_ngram_fraction("text", 1) <= 0.3))
    with_fp = kept.select(
        "doc_id", "lang", ntok.alias("ntok"), Tx.word_set_fingerprint("text").alias("fp")
    )
    winners = with_fp.groupBy(F.col("fp").alias("w_fp")).agg(
        F.min("doc_id").alias("keep_id")
    )
    canon = with_fp.join(
        winners,
        (with_fp.fp == winners.w_fp) & (with_fp.doc_id == winners.keep_id),
        "left_semi",
    )
    from block_explorer_spark.operators import sampling as Smp

    sampled = Smp.stratified_sample(
        canon, "lang", "doc_id", rates={"en": 50, "de": 100, "es": 100, "fr": 100, "zh": 50}
    )
    bucket = Smp.hash_bucket("doc_id", 10)
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    ).alias("split")
    return (
        sampled.select(split, "lang", "ntok", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


def q87_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style one-pass table profile (operators/profile.py):
    per-column null/distinct/min/max for the documents table in a
    single scan + 1-row aggregate — the pipeline-health primitive run
    before/after every curation stage."""
    from block_explorer_spark.operators import profile as Pr

    docs = _t(spark, sf, "documents")
    return Pr.profile(docs, ["doc_id", "lang", "source", "n_chars"])


def q85_approx_contract(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate aggregates under an accuracy contract: HLL++
    distinct counts and t-digest-style percentile sketches vs their
    exact counterparts, emitted as within-tolerance booleans. The
    oracle pins the booleans (and the exact values), so a sketch
    drifting past its error bound FAILS the gate — the way to make
    approximate operators gate-checkable without pretending the
    sketch value itself is portable. At 100 TB the approx forms are
    the only viable interactive path (no exact distinct shuffle; one
    pass, mergeable partials)."""
    ev = _t(spark, sf, "events")
    exact_d = F.countDistinct("user_id")
    approx_d = F.approx_count_distinct("user_id", 0.02)
    exact_p50 = F.expr("percentile(value, 0.5D)")
    approx_p50 = F.expr("approx_percentile(value, 0.5D, 10000)")
    # Relative-error booleans guard their denominators: a group with
    # zero distinct users or exact_p50 == 0 would otherwise divide by
    # zero -> NULL, spuriously mismatching the oracle's pinned TRUE.
    hll_ok = F.when(exact_d == 0, approx_d == 0).otherwise(
        F.abs(approx_d - exact_d) / exact_d <= 0.05
    )
    p50_ok = F.when(exact_p50 == 0, F.abs(approx_p50) <= F.lit(1e-9)).otherwise(
        F.abs(approx_p50 - exact_p50) / F.abs(exact_p50) <= 0.05
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_d.alias("exact_users"),
        hll_ok.alias("hll_within_5pct"),
        F.round(exact_p50, 6).alias("exact_p50"),
        p50_ok.alias("p50_within_5pct"),
    )


def q82_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment-similar pairs (Broder): |a∩b| / min(|a|,|b|) over
    3-token shingles — catches short-doc-inside-long-doc duplication
    that jaccard scores low. Same single-lineage inverted-index plan
    as q24 (dedup.containment_pairs)."""
    docs = _t(spark, sf, "documents")
    pairs = D.containment_pairs_prefix(docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.62)
    return pairs.select(
        "id_a", "id_b", "inter", "size_a", "size_b",
        F.round("containment", 6).alias("containment"),
    )


#: SemDeDup within-cluster cosine threshold: the driver embeddings'
#: max pairwise cosine is ~0.513, so 0.4 exercises real drops while
#: staying deterministic (no boundary pair within rounding distance).
SEMDEDUP_TAU = 0.4
#: q90's token budget (~37% of the sf0.01 corpus's 27k tokens).
TOKEN_BUDGET = 10_000


def q88_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup (SemDeDup, arXiv:2303.09540): coarse-cluster the
    embeddings with the SAME seeded centroids the IVF index uses
    (q33), then drop any vector with a lower-id within-cluster
    neighbor above cosine SEMDEDUP_TAU. Survivors + their cluster.
    Deterministic end-to-end, so the DuckDB oracle replicates
    assignment (centroid literals), the pairwise threshold join, and
    the greedy lowest-id-wins keep rule exactly."""
    emb = _t(spark, sf, "embeddings")
    cents = Sim.seeded_centroids(EMB_DIM, IVF_CENTROIDS, seed=IVF_SEED, scale=0.125)
    kept = Sim.semantic_dedup(emb, "embedding", cents, threshold=SEMDEDUP_TAU)
    return kept.select("vec_id", "centroid_id")


def q89_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-flattened language mixture (the mT5/XLM-R
    multilingual sampling recipe at alpha = 0.5): every language is
    md5-downsampled toward the rarest one at rate
    floor(10000 * sqrt(n_min / n_lang)). Rates use only correctly-
    rounded IEEE ops (divide, sqrt), so the oracle reproduces the
    exact member set from the same counts."""
    from block_explorer_spark.operators import sampling as Smp

    docs = _t(spark, sf, "documents")
    kept = Smp.temperature_sample(docs, "lang", "doc_id", alpha=0.5)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
    )


def q90_token_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """Budgeted corpus selection: the greedy quality-ranked prefix
    whose token total fits TOKEN_BUDGET, computed by the two-level
    cumulative sum of operators/selection.py (coarse score buckets +
    per-bucket windows — never a one-partition global sort). The
    oracle computes the same prefix with a plain global window, so the
    distributed formulation is pinned against the naive one."""
    from block_explorer_spark.operators import selection as Sel

    docs = _t(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        Tx.quality_score("text").alias("quality"),
        Tx.token_count("text").cast("long").alias("ntok"),
    )
    sel = Sel.budget_select(
        scored, "quality", "ntok", "doc_id", budget=TOKEN_BUDGET, n_buckets=20
    )
    return sel.select("doc_id", "quality", "ntok", "cum_weight")


def q91_crossdoc_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document duplicated-5-gram audit (the C4/RefinedWeb
    global-boilerplate signal): per document, how much of it is
    shared verbatim with ANY other document — two shuffles total,
    never pairwise (dedup.shared_shingle_stats).

    r11 opt: shingles enter as 64-bit xxhash64 values
    (Tx.word_ngram_hashes) instead of space-joined strings — the
    operator only ever tests shingle EQUALITY (df>1), so the
    equivalence classes (and hence n_shingles/n_shared/shared_frac)
    are identical up to a 64-bit collision, while the explode, the
    df-count window shuffle and the per-doc aggregate all move 8-byte
    longs instead of ~5-word strings (guide §2.3). Re-certified vs
    the string-shingle DuckDB oracle at sf0.01 + sf0.1."""
    docs = _t(spark, sf, "documents")
    return D.shared_shingle_stats(docs, "doc_id", Tx.word_ngram_hashes("text", 5))


LM_K = 0.5  # add-k smoothing for the q92 bigram model


def q92_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """LM-based quality scoring (the CCNet/Wikipedia-LM filter
    recipe): train a bigram language model on the corpus itself
    (unigram + bigram occurrence counts, add-k smoothing), then score
    every document by its mean negative log-likelihood — high avg_nll
    = surprising/low-quality text, the standard perplexity-bucket
    input. Model "training" is two count aggregates; scoring is two
    shuffle joins against the model tables (the model side would be
    frequency-pruned at 100 TB — top-K bigrams + unigram backoff).
    V (vocabulary size) is collected as a scalar at model-build time
    (same pattern as q33's query vector)."""
    docs = _t(spark, sf, "documents")
    # the tokenize+explode stage amplifies per-row work; spread an
    # under-partitioned scan across cores first (no-op at scale)
    with_toks = D._spread(docs).select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    bg = (
        with_toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    uni = (
        with_toks.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    v_size = uni.count()  # scalar model constant
    nll = -F.log(
        (F.col("cb") + F.lit(LM_K)) / (F.col("cu") + F.lit(LM_K) * F.lit(float(v_size)))
    )
    return (
        bg.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .withColumn("nll", nll)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )


def q94_quality_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware dedup survivor selection (the RefinedWeb rule:
    keep the BEST member of each near-dup cluster, not an arbitrary
    one): q83's exact-jaccard clusters join per-doc quality (q23's
    score) and a (quality desc, doc_id asc) window marks the
    survivor. Same shuffle budget as q83 plus one window on
    cluster_id — the drop set is then a single anti-join away."""
    from block_explorer_spark.operators import graph as G

    docs = _t(spark, sf, "documents")
    pairs = D.jaccard_pairs_prefix(
        docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.8
    )
    cl = G.dedup_clusters(pairs).select("doc_id", "cluster_id")
    q = docs.select("doc_id", Tx.quality_score("text").alias("quality"))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        cl.join(q, "doc_id")
        .withColumn("is_survivor", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "quality", "is_survivor")
    )


SUBSTR_W = 20  # q95 gate window: the gate docs average ~54 tokens, so the
# operator's Lee-et-al default of 50 would barely fit; 20 exercises the
# same plan with ~750 duplicated windows in the sf0.01 corpus.


def q95_exact_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 ExactSubstr, the
    windowed-hash distributed form — operators/substrings.py): find
    every W-token run duplicated anywhere in the corpus, keep its
    globally-first occurrence, strip all other occurrences as merged
    spans. One row per document that lost a span; cleaned text is
    reported as an md5 prefix so the oracle compares it exactly."""
    from block_explorer_spark.operators import substrings as Sub

    docs = _t(spark, sf, "documents")
    # r11 opt: xxhash64 over the token-slice array for the INTERNAL
    # window grouping key (guide §2.3 narrower types / §1.2 per-task
    # work) — the md5 hex prefix it replaces was already a 64-bit
    # truncation, so the collision-equivalence classes are the same
    # strength and the output columns (which hash cleaned_text with
    # md5, unchanged) are bit-identical; re-certified vs the DuckDB
    # oracle (which keeps its md5 formulation) at sf0.01 + sf0.1.
    out = Sub.exact_substring_dedup(
        docs, "doc_id", "text", window=SUBSTR_W, hash_fn=Sub.xxh64_window_hash
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "n_removed",
        F.substring(F.md5("cleaned_text"), 1, 16).alias("cleaned_hash"),
    )


BPE_MERGES = 40  # q96/q97 merge-table size
BPE_MAX_TYPES = 10_000  # frequency prune for the training type table
BPE_BUDGET = 20_000  # q97 token budget, in BPE tokens


def q96_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """BPE token accounting (functions/bpe.py — the public Sennrich/
    GPT-2 merge algorithm, deterministic): learn the merge table from
    the corpus word-type frequencies, then count BPE tokens per
    document via per-TYPE application (distinct words -> Arrow apply
    -> join back). The oracle learns the same merge table from the
    same parquet via DuckDB word counts and replays application
    entirely in SQL (recursive CTE over space-separated symbol
    strings) — independent application paths, shared deterministic
    trainer."""
    from block_explorer_spark.functions import bpe as B

    docs = _t(spark, sf, "documents")
    merges = B.learn_bpe(docs, "doc_id", "text", BPE_MERGES, BPE_MAX_TYPES)
    return B.bpe_token_counts(docs, "doc_id", "text", merges)


def q97_bpe_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """q90's greedy budget selection re-keyed on BPE tokens (what a
    real pre-training budget counts) — two-level cumulative sum,
    weights from q96's per-doc BPE counts."""
    from block_explorer_spark.functions import bpe as B
    from block_explorer_spark.operators import selection as Sel

    docs = _t(spark, sf, "documents")
    merges = B.learn_bpe(docs, "doc_id", "text", BPE_MERGES, BPE_MAX_TYPES)
    counts = B.bpe_token_counts(docs, "doc_id", "text", merges)
    scored = docs.select(
        "doc_id", Tx.quality_score("text").alias("quality")
    ).join(counts.select("doc_id", "n_bpe_tokens"), "doc_id")
    sel = Sel.budget_select(
        scored, "quality", "n_bpe_tokens", "doc_id", budget=BPE_BUDGET, n_buckets=20
    )
    return sel.select("doc_id", "quality", "n_bpe_tokens", "cum_weight")


PHASH_MAX_HAMMING = 6

#: q98 fixture pixels, shared with the oracle: 8x9 grayscale per doc,
#: base image keyed by the doc's group (doc_id DIV 10) so groups form
#: perceptual near-dup families, one doc-specific pixel perturbed.
_Q98_PX = """transform(sequence(0, 71), i -> CAST((
    CAST(conv(substr(md5(concat(CAST(doc_id DIV 10 AS STRING), ':',
                                CAST(i AS STRING))), 1, 2), 16, 10) AS INT)
    + IF(i = CAST(doc_id % 72 AS INT), CAST(doc_id % 97 AS INT), 0)
  ) % 256 AS INT))"""


def q98_perceptual_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup joining the multimodal and dedup
    families: deterministic 8x9 grayscale fixtures (md5-derived
    pixels, near-dup by construction within doc_id-groups) are
    ENCODED to real PNGs, decoded back through the stdlib codec,
    dHashed (codecs.dhash64), and paired via exact pigeonhole hamming
    blocking (dedup.hamming_pairs — never all-pairs). The oracle
    recomputes the dHash bits directly from the same pixel definition
    and brute-forces pairs, so the whole encode->decode->hash->block
    path is certified against an independent formulation."""
    import numpy as _np
    import pandas as _pd

    from block_explorer_spark.functions import codecs as C
    from block_explorer_spark.operators import multimodal as M

    docs = _t(spark, sf, "documents").select("doc_id")
    media = D._spread(docs).select("doc_id", F.expr(_Q98_PX).alias("px"))

    def _encode(batches):
        for pdf in batches:
            payloads = [
                C.png_encode(_np.array(p, dtype=_np.uint8).reshape(8, 9))
                for p in pdf["px"]
            ]
            yield _pd.DataFrame({"media_id": pdf["doc_id"].values, "payload": payloads})

    fixtures = media.mapInPandas(_encode, schema="media_id long, payload binary")
    return M.perceptual_dedup_pairs(
        fixtures, "media_id", "payload", max_hamming=PHASH_MAX_HAMMING
    )


AFP_MAX_HAMMING = 6

#: q99 fixture samples, shared with the oracle: 128 bytes per doc,
#: base signal keyed by the doc's group (doc_id DIV 10) so groups form
#: perceptual near-dup families, one doc-specific sample perturbed.
_Q99_SMP = """transform(sequence(0, 127), i -> CAST((
    CAST(conv(substr(md5(concat(CAST(doc_id DIV 10 AS STRING), ':',
                                CAST(i AS STRING))), 1, 2), 16, 10) AS INT)
    + IF(i = CAST(doc_id % 128 AS INT), CAST(doc_id % 97 AS INT), 0)
  ) % 256 AS INT))"""


def q99_audio_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual AUDIO dedup (round-6 item 8) — q98's twin through
    the WAV codec: deterministic md5-derived sample bytes (near-dup
    by construction within doc_id-groups) are quantized to float PCM,
    ENCODED as real 16-bit WAV, decoded back through the stdlib
    codec, fingerprinted (codecs.audio_fingerprint64 — windowed
    band-energy delta signs, chromaprint-shaped, integer end-to-end),
    and paired via exact pigeonhole hamming blocking
    (dedup.hamming_pairs). The oracle replays the ENTIRE chain —
    float32 PCM quantization (exact in integer form), difference-band
    energies, delta-sign bits — and brute-forces pairs, certifying
    encode->decode->fingerprint->block against an independent
    formulation."""
    import numpy as _np
    import pandas as _pd

    from block_explorer_spark.functions import codecs as C
    from block_explorer_spark.operators import multimodal as M

    docs = _t(spark, sf, "documents").select("doc_id")
    media = D._spread(docs).select("doc_id", F.expr(_Q99_SMP).alias("smp"))

    def _encode(batches):
        for pdf in batches:
            payloads = [
                C.wav_encode(
                    (_np.array(s, dtype=_np.float64) - 128.0) / 128.0
                )
                for s in pdf["smp"]
            ]
            yield _pd.DataFrame({"media_id": pdf["doc_id"].values, "payload": payloads})

    fixtures = media.mapInPandas(_encode, schema="media_id long, payload binary")
    return M.audio_dedup_pairs(
        fixtures, "media_id", "payload", max_hamming=AFP_MAX_HAMMING
    )


VHASH_MAX_HAMMING = 6

#: q100 fixture frames: 2 luma frames of 8x9 per doc, base keyed by
#: (group, frame, pixel) md5, one doc-specific pixel perturbed per
#: frame — groups are near-dup video families by construction.
_Q100_PX = """transform(sequence(0, 1), k -> transform(sequence(0, 71), i -> CAST((
    CAST(conv(substr(md5(concat(CAST(doc_id DIV 10 AS STRING), ':',
                                CAST(k AS STRING), ':',
                                CAST(i AS STRING))), 1, 2), 16, 10) AS INT)
    + IF(i = CAST(doc_id % 72 AS INT), CAST((doc_id + k) % 97 AS INT), 0)
  ) % 256 AS INT)))"""


def q100_video_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Keyframe-dHash video dedup (round-6 item 8, video half):
    deterministic 2-frame 8x9 luma fixtures are ENCODED as real Y4M
    (Cmono) streams, parsed back through the stdlib codec, keyframe-
    sampled, per-frame dHashed (codecs.dhash64), candidate-paired per
    slot via exact pigeonhole hamming blocking, and joined under the
    ALL-slots rule (a pair must match on every sampled keyframe;
    hamming = the worst slot). The oracle recomputes every frame's
    dHash bits from the shared pixel definition and brute-forces the
    per-slot + all-slots logic independently."""
    import numpy as _np
    import pandas as _pd

    from block_explorer_spark.functions import codecs as C
    from block_explorer_spark.operators import multimodal as M

    docs = _t(spark, sf, "documents").select("doc_id")
    media = D._spread(docs).select("doc_id", F.expr(_Q100_PX).alias("fr"))

    def _encode(batches):
        for pdf in batches:
            payloads = [
                C.y4m_encode(
                    [
                        _np.array(f, dtype=_np.uint8).reshape(8, 9)
                        for f in fr
                    ],
                    "Cmono",
                )
                for fr in pdf["fr"]
            ]
            yield _pd.DataFrame({"media_id": pdf["doc_id"].values, "payload": payloads})

    fixtures = media.mapInPandas(_encode, schema="media_id long, payload binary")
    return M.video_dedup_pairs(
        fixtures, "media_id", "payload",
        n_frames=2, max_hamming=VHASH_MAX_HAMMING,
    )


def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _learn_bpe_for_oracle() -> list[tuple[str, str]]:
    """The oracle's own merge-table derivation: word-type counts via
    DuckDB over the certification parquet, then the shared
    deterministic trainer. Application in the SQL below is fully
    independent of the engine's Arrow path."""
    import duckdb

    from block_explorer_spark.functions import bpe as B

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w, count(*) AS c FROM (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
          FROM '{_oracle_sf_dir()}/documents.parquet' WHERE trim(text) <> ''
        ) GROUP BY w ORDER BY c DESC, w ASC LIMIT {BPE_MAX_TYPES}
        """
    ).fetchall()
    con.close()
    return B.train_merges(rows, BPE_MERGES)


def _bpe_oracle_ctes() -> str:
    """Shared recursive-CTE block: tok/types -> per-type BPE length
    via replay of the merge table (space-separated symbol strings;
    symbols never contain whitespace). Returns the WITH body up to a
    `lens(w, n_bpe)` CTE."""
    merges = _learn_bpe_for_oracle()
    assert merges, "gate corpus must yield at least one BPE merge"

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    m_lit = ", ".join(f"{q(a + ' ' + b)}: {r}" for r, (a, b) in enumerate(merges))
    r_lit = ", ".join(f"{r}: [{q(a)}, {q(b)}]" for r, (a, b) in enumerate(merges))
    best = """list_aggregate(list_filter(list_transform(
             range(1, len(string_split(substr(s, 2, length(s) - 2), '  '))),
             i -> m[string_split(substr(s, 2, length(s) - 2), '  ')[i] || ' ' ||
                  string_split(substr(s, 2, length(s) - 2), '  ')[i+1]][1]),
             x -> x IS NOT NULL), 'min')"""
    return f"""
            mm AS (SELECT MAP {{{m_lit}}} AS m),
            rm AS (SELECT MAP {{{r_lit}}} AS r),
            tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ),
            types AS (SELECT DISTINCT w FROM tok),
            seq0 AS (
              SELECT w, ' ' || array_to_string(
                       list_transform(range(1, length(w) + 1), i -> w[i:i]),
                       '  ') || ' ' AS s
              FROM types
            ),
            bpe AS (
              SELECT w, s FROM seq0
              UNION ALL
              SELECT w, replace(s, ' ' || r[best][1][1] || '  ' || r[best][1][2] || ' ',
                                   ' ' || r[best][1][1] || r[best][1][2] || ' ') AS s
              FROM (SELECT w, s, {best} AS best FROM bpe, mm), rm
              WHERE best IS NOT NULL
            ),
            fin AS (
              SELECT w, s FROM (SELECT w, s, {best} AS best FROM bpe, mm)
              WHERE best IS NULL
            ),
            lens AS (
              SELECT w, len(string_split(substr(s, 2, length(s) - 2), '  ')) AS n_bpe
              FROM fin
            )"""


def _q96_oracle() -> str:
    return f"""
        WITH RECURSIVE {_bpe_oracle_ctes()}
        SELECT t.doc_id, count(*) AS n_words,
               CAST(sum(l.n_bpe) AS BIGINT) AS n_bpe_tokens
        FROM tok t JOIN lens l USING (w)
        GROUP BY t.doc_id
    """


def _q97_oracle() -> str:
    return f"""
        WITH RECURSIVE {_bpe_oracle_ctes()},
        counts AS (
          SELECT t.doc_id, CAST(sum(l.n_bpe) AS BIGINT) AS n_bpe_tokens
          FROM tok t JOIN lens l USING (w) GROUP BY t.doc_id
        ),
        m2 AS (
          SELECT doc_id,
            CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n,
            CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
                 ELSE 0.0 END AS digit_r,
            CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) / length(text)
                 ELSE 0.0 END AS punct_r,
            list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                    t -> CAST(length(t) AS DOUBLE)))
              / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mtl
          FROM documents
        ),
        scored AS (
          SELECT doc_id, round(
              (CASE WHEN n >= 20 THEN 1.0 ELSE n / 20.0 END) * 0.4
            + (1.0 - least(1.0, digit_r * 4)) * 0.2
            + (1.0 - least(1.0, punct_r * 4)) * 0.2
            + (CASE WHEN mtl >= 3 AND mtl <= 12 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
          FROM m2
        ),
        o AS (
          SELECT s.doc_id, s.quality, c.n_bpe_tokens,
                 sum(c.n_bpe_tokens) OVER (ORDER BY s.quality DESC, s.doc_id ASC
                                           ROWS UNBOUNDED PRECEDING) AS cum
          FROM scored s JOIN counts c USING (doc_id)
        )
        SELECT doc_id, quality, n_bpe_tokens, CAST(cum AS BIGINT) AS cum_weight
        FROM o WHERE cum <= {BPE_BUDGET}
    """


VOCAB_TOP = 20  # q93 vocabulary size (the gate corpus has ~45 tokens)


def q93_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-coverage audit: learn a top-V vocabulary from the
    corpus (count desc, token asc tiebreak — q65's rule), then score
    every document's out-of-vocabulary occurrence rate. The vocab is
    a broadcast join onto the exploded token stream — at any corpus
    size the model side is V rows."""
    docs = _t(spark, sf, "documents")
    tok = D._spread(docs).select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(VOCAB_TOP)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_frac", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
    )


#: q101 PQ parameters — the oracle unrolls the deterministic Lloyd
#: iteration at exactly these sizes, so query and oracle must agree.
PQ_M = 4
PQ_K = 16
PQ_ITERS = 3
PQ_SAMPLE_MAX_ID = 256
PQ_TOPK = 10


def q101_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantized ANN (IVF-PQ's memory half): train M=4
    codebooks of K=16 codewords on an integer lattice (one global
    scale 127/max|x|, deterministic Lloyd: int L2, first-min argmin,
    floor-division centroid updates, empty cells keep their codeword),
    encode every vector to 4 codes, and answer the query by ADC — an
    int M x K lookup table summed per candidate. Integer-exact end to
    end, so the DuckDB oracle replays training + encode + ADC bit for
    bit (operators/pq.py; Jégou/Douze/Schmid TPAMI 2011)."""
    from block_explorer_spark.operators import pq as PQ

    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    model = PQ.pq_train(
        emb, "embedding", id_col="vec_id", m=PQ_M, k=PQ_K,
        iters=PQ_ITERS, sample_max_id=PQ_SAMPLE_MAX_ID,
    )
    return PQ.pq_topk_adc(emb, "embedding", qvec, model, k=PQ_TOPK, id_col="vec_id")


#: Sketch gate parameters — each oracle replays the identical sketch
#: construction (portable md5 hash, integer accumulators), so query
#: and oracle must agree on these.
HLL_P = 12
CMS_DEPTH, CMS_WIDTH, CMS_TOPK = 4, 8192, 15
BLOOM_K, BLOOM_M = 3, 1 << 20
KMV_K, KMV_QS = 256, [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def q102_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog distinct 3-gram shingles per language, WITH the
    exact count and relative error beside it. The estimate itself
    hash-matches the oracle because the register harmonic mean is an
    integer sum of powers of two (operators/sketches.py) — the
    certification covers the approximation, not just the exact
    column. Extended surface: the reference has no approximate
    aggregates (SURVEY §2.4)."""
    docs = _t(spark, sf, "documents")
    toks = docs.select("lang", F.explode(Tx.word_ngrams("text", 3)).alias("sh"))
    est = SK.hll_distinct(toks, "sh", ["lang"], p=HLL_P)
    exact = toks.groupBy("lang").agg(F.count_distinct("sh").alias("exact_distinct"))
    return est.join(exact, "lang").select(
        "lang",
        "hll_estimate",
        "exact_distinct",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


def q103_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min heavy hitters: top-15 3-gram shingles by CMS
    estimate (d=4, w=8192), exact count beside the estimate. The
    est >= exact guarantee is test-pinned; deterministic tiebreak
    (estimate desc, shingle asc) makes the cut stable."""
    docs = _t(spark, sf, "documents").filter(F.size(Tx.tokens("text")) >= 3)
    occ = docs.select(F.explode(Tx._all_ngrams("text", 3)).alias("sh"))
    counters = SK.cms_counters(occ, "sh", depth=CMS_DEPTH, width=CMS_WIDTH)
    est = SK.cms_estimate(counters, occ, "sh", depth=CMS_DEPTH, width=CMS_WIDTH)
    exact = occ.groupBy("sh").agg(F.count("*").alias("exact_count"))
    return (
        est.join(exact, "sh")
        .select("sh", F.col("cms_estimate").cast("long").alias("cms_estimate"),
                "exact_count")
        .orderBy(F.col("cms_estimate").desc(), F.col("sh"))
        .limit(CMS_TOPK)
    )


def q104_bloom_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter benchmark decontamination: build a k=3 / 2^20-bit
    filter over the held-out bucket's 8-token fingerprints (q66's
    md5 split), probe every train-bucket fingerprint map-side against
    the broadcast position set, flag train docs with any full-k hit.
    False negatives impossible (test-pinned vs the exact q66 overlap
    reversed); false positives are part of bloom semantics and the
    oracle replays them exactly."""
    docs = _t(spark, sf, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    fps = docs.select(
        "doc_id",
        bucket.alias("b"),
        F.explode(Tx.rolling_fingerprint("text", window=8, hashf="md5")).alias("fp"),
    )
    bench = fps.filter(F.col("b") == 9)
    train = fps.filter(F.col("b") < 8).select(F.col("doc_id").alias("train_doc"), "fp")
    positions = SK.bloom_positions(bench, "fp", k=BLOOM_K, m_bits=BLOOM_M)
    return SK.bloom_probe(train, "train_doc", "fp", positions, k=BLOOM_K, m_bits=BLOOM_M)


def q106_bloom_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefilter join (explicit runtime filtering): lineitem ⋈
    urgent orders with a bloom of the order keys dropping non-matching
    lineitem rows BEFORE the join shuffle. Result-identical to the
    plain join (no false negatives; false positives die in the join),
    so the oracle is simply the plain join — what's certified is that
    the optimization preserves semantics. sum_qty is a sum of
    integral doubles (exact at any addition order) cast to long, so
    the aggregate is engine-stable without rounding games."""
    orders = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    keys = orders.select(F.col("o_orderkey").alias("l_orderkey"))
    li = _t(spark, sf, "lineitem")
    joined = SK.bloom_prefilter_join(li, keys, "l_orderkey", k=BLOOM_K, m_bits=BLOOM_M)
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
    )


def q107_window_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed approximate distinct: HLL distinct users per UTC day
    over the events table — the streaming-analytics shape (distinct
    per time bucket) where the register table IS the checkpointable
    state and closed windows merge by max. Exact count beside the
    estimate; both hash-matched."""
    ev = _t(spark, sf, "events")  # ts normalized to long epoch-nanos
    keyed = ev.select(
        F.expr(f"ts div {86_400 * 1_000_000_000}").alias("day"), F.col("user_id")
    )
    est = SK.hll_distinct(keyed, "user_id", ["day"], p=HLL_P)
    exact = keyed.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "day")


def q105_kmv_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Document-length quantiles from a deterministic bottom-k
    (KMV) sample: the 256 docs with smallest hashed doc_id — a
    TakeOrderedAndProject, no RNG, no global sort — then exact order
    statistics of the bounded sample. Sample-vs-exact error is
    test-pinned; at 100 TB this replaces a full-column sort with a
    per-partition top-k."""
    docs = _t(spark, sf, "documents")
    sample = SK.bottomk_sample(docs.select("doc_id", "n_chars"), "doc_id", k=KMV_K)
    return SK.sample_quantiles(sample, "n_chars", KMV_QS)


def q108_rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical rollup (GROUPING SETS) over orders: subtotals per
    (status, priority), per status, and grand total in ONE pass —
    Catalyst's Expand operator emits the three grouping sets map-side,
    so the plan is one scan + one shuffle regardless of how many
    levels roll up (the money aggregate is integer cents, so every
    level is addition-order exact). The reference's API has no
    multi-level aggregates (SURVEY §2.4 is flat groupBy); this is the
    OLAP-cube surface a warehouse user expects."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .select("gid", "o_orderstatus", "o_orderpriority", "n_orders", "cents")
    )


def q109_moving_peak(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 1-hour RANGE-frame window per user over the events
    stream: peak hourly event count and peak hourly value sum. The
    window partitions by user_id (parallelism scales with users, the
    per-user sort is the semantic), the frame is time-based
    [ts-1h, ts] — RANGE, not ROWS, so tied timestamps are frame
    peers on both engines — and value is integer-ized (×1000) so the
    running sum is addition-order exact."""
    ev = _t(spark, sf, "events")  # ts normalized to long epoch-nanos
    base = ev.select(
        "user_id", "ts", F.round(F.col("value") * 1000).cast("long").alias("mv")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-3_600_000_000_000, 0)
    )
    roll = base.select(
        "user_id",
        F.count("*").over(w).alias("c1h"),
        F.sum("mv").over(w).alias("s1h"),
    )
    return roll.groupBy("user_id").agg(
        F.max("c1h").cast("long").alias("peak_1h_events"),
        F.max("s1h").cast("long").alias("peak_1h_mvalue"),
    )


def q110_cms_watchlist(spark: SparkSession, sf: str) -> DataFrame:
    """The at-scale count-min pattern q103's certification shape can't
    show: sketch the FACT stream (lineitem part keys), probe only a
    bounded dimension-driven watchlist (small parts, p_size <= 5).
    Nothing in the plan is proportional to the key space — the
    counter matrix is ≤ d·w rows, the probe is ≤ |watchlist| rows,
    and the exact side (kept for the est ≥ exact certification) is
    semi-joined against the broadcast watchlist BEFORE its shuffle,
    so shuffle volume ∝ watchlist hits, never the full stream."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    watch = part.filter(F.col("p_size") <= 5).select(
        F.col("p_partkey").alias("l_partkey")
    )
    occ = li.select("l_partkey")
    counters = SK.cms_counters(occ, "l_partkey", depth=CMS_DEPTH, width=CMS_WIDTH)
    est = SK.cms_estimate(counters, watch, "l_partkey", depth=CMS_DEPTH, width=CMS_WIDTH)
    exact = (
        occ.join(F.broadcast(watch), "l_partkey")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        est.join(F.broadcast(exact), "l_partkey", "left")
        .select(
            "l_partkey",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
        )
    )


def q111_zorder_box(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustered store + multi-column data skipping
    (operators/zorder.py): rewrite the events table Morton-ordered by
    (user_id, mv), publish per-file zone maps through the manifest,
    then answer a 2-D box predicate by opening only the files whose
    (user_id, mv) hyper-rectangle intersects the box — the public
    Delta/Iceberg OPTIMIZE ZORDER BY recipe. Correctness is
    layout-independent (the row-level filter is always re-applied),
    which is exactly what the oracle certifies; the skipping power is
    pinned in test_zorder (a 1/8-wide predicate on EITHER clustered
    column keeps ≤ half the files, where a linear sort skips nothing
    on its second column). No reference analog: the reference reads
    through Postgres indexes (etl/storage/storage.go); at parquet
    scale the index IS the layout."""
    from block_explorer_spark.operators import zorder as Z

    ev = _t(spark, sf, "events")
    tbl = ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 1000).cast("long").alias("mv"),
    )
    base = _gate_store(
        "zorder-gate",
        sf,
        lambda b: Z.cluster_write(
            tbl, b, "events_z", ["user_id", "mv"], bits=10, num_files=16
        ),
    )
    out = Z.read_clustered(
        spark, base, "events_z", {"user_id": (10, 80), "mv": (5000, 200000)}
    )
    return out.select("event_id", "user_id", "mv")


def q112_kmv_set_algebra(spark: SparkSession, sf: str) -> DataFrame:
    """Set-cardinality algebra WITHOUT a join: KMV signatures (bottom-k
    distinct hashes, Beyer et al. SIGMOD 2007) of two customer key
    sets — URGENT-order customers vs HIGH-order customers — combined
    into union / intersection / Jaccard estimates in pure integer
    arithmetic (operators/sketches.py::kmv_signature/kmv_set_stats).
    At 100 TB the exact |A ∩ B| is a shuffle of both key sets; the
    KMV answer moves ≤ 2k signature rows. The exact counts ride along
    for certification (the estimates themselves hash-match because
    the estimator is integer-exact end to end)."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    st = SK.kmv_set_stats(
        SK.kmv_signature(a, "o_custkey", k=KMV_K),
        SK.kmv_signature(b, "o_custkey", k=KMV_K),
        k=KMV_K,
    )
    ua, ub = a.distinct(), b.distinct()
    exact_union = ua.union(ub).distinct().count()
    exact_inter = ua.intersect(ub).count()
    return spark.createDataFrame(
        [(st["union_est"], st["inter_est"], st["jacc_bp"],
          exact_union, exact_inter)],
        "union_est long, inter_est long, jacc_bp long, "
        "exact_union long, exact_inter long",
    )


#: BM25 gate parameters. The oracle injects the SAME Python-computed
#: idf/avgdl literals, so both engines run only IEEE + * / in a fixed
#: order — bit-exact without rounding.
BM25_TERMS = ["dup", "spark", "merge"]
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 25


def q113_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword retrieval over the corpus: BM25 top-k (Robertson/Okapi,
    TREC-3) through an inverted index whose postings are filtered to
    the query terms BEFORE their shuffle — cost ∝ matching postings,
    not corpus size (operators/retrieval.py). idf and avgdl are
    |terms|+2 bounded driver scalars; per-term scores pivot to columns
    and sum in fixed order; top-k is a TakeOrderedAndProject. The
    decontamination/audit query shape a training pipeline runs against
    100 TB ("which docs mention this benchmark phrase")."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return R.bm25_topk(
        docs, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


def q114_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel over the event stream: users who viewed, then
    clicked strictly after their FIRST view, then purchased strictly
    after that first qualifying click. Each stage is a min-aggregate
    on user_id joined to the next stage's filtered events — after the
    first shuffle every stage reuses the user_id partitioning, and
    each stage's input shrinks to the surviving cohort. The standard
    product-analytics query shape (match_recognize-lite) the
    reference's API has no analog for."""
    ev = _t(spark, sf, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.lit(1).cast("long").alias("step"),
               F.count("*").alias("users"))
        .union(s2.agg(F.lit(2).cast("long").alias("step"),
                      F.count("*").alias("users")))
        .union(s3.agg(F.lit(3).cast("long").alias("step"),
                      F.count("*").alias("users")))
    )


def q115_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users grouped by the DAY of their
    first event, distinct-active counts per whole-week offset. Two
    user_id shuffles (first-seen aggregate, then the distinct) and one
    (cohort, offset) rollup — integer day arithmetic only, no
    timezone/week-start semantics to disagree on."""
    ev = _t(spark, sf, "events")
    # ts is epoch-nanos long (see _t); `div` keeps the conversion in
    # exact integer arithmetic (a double division would lose precision
    # above 2^53), and the session tz is pinned UTC so the date is the
    # same naive date DuckDB's CAST(ts AS DATE) produces.
    day = F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    act = (
        ev.select("user_id", day.alias("day"))
        .join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.datediff("day", "cohort_day") / 7).cast("long").alias("week_offset"),
        )
    )
    return (
        act.groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("users"))
    )


#: Integer PageRank gate parameters — the oracle unrolls the same
#: fixed iteration count with the same floor divisions.
PR_ITERS, PR_SCALE, PR_TOPK = 5, 1_000_000, 20
PR_SUPP_OFFSET = 10_000_000  # namespace suppliers away from customers


def q116_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank on the integer lattice (operators/graph.py::
    pagerank_int) over the bipartite customer→supplier graph induced
    by orders⋈lineitem: who supplies the customers who buy the most
    broadly. Every rank is a long and every update a floor division,
    so the fixed 5-iteration result is partitioning- and
    addition-order-independent — which is what lets a SQL oracle
    replay an ITERATIVE graph algorithm bit for bit (float PageRank
    could never hash-match). Each iteration is one shuffle; lineage is
    localCheckpoint-cut."""
    from block_explorer_spark.operators.graph import pagerank_int

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + PR_SUPP_OFFSET).alias("dst"),
    )
    ranks = pagerank_int(edges, iters=PR_ITERS, scale=PR_SCALE)
    return (
        ranks.orderBy(F.desc("rank"), F.asc("id"))
        .limit(PR_TOPK)
        .select(F.col("id").cast("long").alias("id"), F.col("rank"))
    )


def q117_segment_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution drift between two corpus segments (en vs de
    documents): integer chi-squared per token, summed/ranked with zero
    float arithmetic (operators/profile.py::segment_drift) — the
    post-ingest "what changed between these slices" monitor a training
    pipeline runs to catch contamination or drift. One explode + one
    token shuffle; segment totals are two broadcast scalars."""
    from block_explorer_spark.operators.profile import segment_drift

    docs = _t(spark, sf, "documents")
    return segment_drift(docs, "lang", "en", "de", topk=15)


def q118_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-phrase search through positional postings
    (operators/retrieval.py::phrase_match): each phrase word's
    postings are filtered BEFORE their shuffle, then chained on
    (doc_id, pos == p0 + offset) — all joins share the doc_id key, so
    they co-locate after the first shuffle and cost tracks the
    rarest word's posting volume. Occurrences count OVERLAPPING
    matches ("batch batch batch" contains "batch batch" twice) — the
    semantics a decontamination audit needs."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return R.phrase_match(docs, ["batch", "batch"])


def q119_proximity_search(spark: SparkSession, sf: str) -> DataFrame:
    """Proximity retrieval: docs where two terms co-occur within 5
    token positions, with the qualifying pair count
    (operators/retrieval.py::proximity_match) — the relaxed decontam
    sweep ("benchmark name near answer string") between exact-phrase
    (q118) and bag-of-words (q113). Postings filtered per term before
    the one doc_id-keyed shuffle."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return R.proximity_match(docs, "spark", "join", window=5)


def q120_bm25_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """q113's query served FROM the persisted postings index
    (operators/retrieval.py::write_postings_index/bm25_search_indexed):
    token-sorted postings behind the manifest, per-file token zones
    prune each term to its covering files, doc lengths broadcast-join
    the matched docs. Same oracle as q113 — the certification IS the
    claim that the index serves bit-identical scores without scanning
    the corpus. Measured near-flat across four decades in
    SCALE_CURVE `bm25_indexed` (2.4→9.1 s at 1000×, vs 72 s batch)."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    base = _gate_store(
        "bm25-idx",
        sf,
        lambda b: R.write_postings_index(docs, b, num_files=8),
    )
    return R.bm25_search_indexed(
        spark, base, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


def q121_bm25_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """q113's query served from an index built INCREMENTALLY
    (operators/retrieval.py::index_append/index_maintain): the bulk
    run covers ~60% of the corpus, two LSM-style tail appends fold in
    the rest (n/Σdl updated exactly, no bulk file rewritten), and a
    maintenance pass merges the tail into one token-sorted run. The
    oracle is the SAME full-corpus BM25 SQL as q113/q120 — the
    certification IS the claim that a daily-crawl refresh path serves
    scores bit-identical to a from-scratch rebuild."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")

    def _build(b: str) -> None:
        R.write_postings_index(
            docs.filter(F.col("doc_id") % 5 < 3), b, num_files=8
        )
        R.index_append(docs.filter(F.col("doc_id") % 5 == 3), b, num_files=2)
        R.index_append(docs.filter(F.col("doc_id") % 5 == 4), b, num_files=2)
        R.index_maintain(spark, b, min_tail_files=2)

    base = _gate_store("bm25-inc", sf, _build)
    return R.bm25_search_indexed(
        spark, base, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


#: q122: the lifeline-store gate reads events mapped into the records
#: schema. Derivations are integer-exact so the oracle replays them.
LIFELINE_USER = 42


def q122_lifeline_store(spark: SparkSession, sf: str) -> DataFrame:
    """The round-8 lifeline path END TO END, hash-certified: events
    mapped into the records schema (reference = event_id bytes,
    object_reference = user_id bytes, pulse = 4M + event_id div 100,
    order = event_id mod 100), ingested through the transactional
    upsert in four batches (each staging the (pulse_bucket, obj_key)
    layout + the object-index sidecar in one CAS swap,
    sources/parquet.py), compacted into obj_key slices, then ONE
    user's no-pulse-bound lifeline served via
    read_records_for_object — sidecar bucket lookup + obj_key zone
    pruning + row-level equality — and decoded back to integers the
    DuckDB oracle reproduces from the raw events table. The reference
    behavior this certifies: the records(object_reference, ...)
    composite-index read (migrations/migrations.go:54-80,
    storage.go:258-283)."""
    from block_explorer_spark import schemas as Sc
    from block_explorer_spark.sources import parquet as PQ

    ev = _t(spark, sf, "events")

    def _build(b: str) -> None:
        recs = ev.select(
            F.expr("unhex(lpad(hex(event_id), 16, '0'))").alias("reference"),
            F.lit("state").alias("type"),
            F.expr("unhex(lpad(hex(user_id), 16, '0'))").alias(
                "object_reference"
            ),
            F.lit(b"p").alias("prototype_reference"),
            F.lit(b"x").alias("payload"),
            F.lit(None).cast("binary").alias("prev_record_reference"),
            F.lit(b"h").alias("hash"),
            F.lit(b"r").alias("raw_data"),
            F.lit("0").alias("jet_id"),
            (F.lit(4_000_000) + F.expr("event_id div 100")).cast("long").alias(
                "pulse_number"
            ),
            (F.col("event_id") % 100).cast("int").alias("order"),
            F.lit(1_600_000_000).cast("long").alias("timestamp"),
        ).select(*[f.name for f in Sc.RECORDS.fields])
        for q in range(4):
            PQ.upsert(spark, b, "records",
                      recs.filter(F.col("pulse_number") % 4 == q))
        PQ.compact_table(spark, b, "records", max_files_per_bucket=2)

    base = _gate_store("lifeline-store", sf, _build)
    obj = LIFELINE_USER.to_bytes(8, "big")
    out = PQ.read_records_for_object(spark, base, obj)
    return out.select(
        F.conv(F.hex(F.col("reference")), 16, 10).cast("long").alias("event_id"),
        "pulse_number",
        F.col("order").cast("long").alias("ord"),
    )


#: q123 probes these event_ids as record references on q122's store.
POINT_EVENT_IDS = [3, 257, 4099, 9001]


def q123_record_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's PK point lookup (get_record,
    storage.go:382-407) at warehouse scale: each probe reference
    embeds its pulse (the Record.ID.Pulse() layout the reference's
    own tests rely on), so read_record_by_reference prunes to ONE
    bucket's covering file per probe — constant cost at any table
    size. Served from q122's committed store; absent ids certify the
    provably-empty path. Oracle: DuckDB point queries on the raw
    events table."""
    from functools import reduce as _reduce

    from block_explorer_spark.sources import parquet as PQ

    q122_lifeline_store(spark, sf)  # ensure the cached store exists
    import hashlib as _h

    base = os.path.join(
        os.environ.get("BES_GATE_CACHE", "/tmp/bes-gate-cache"),
        f"lifeline-store-{_h.md5(sf.encode()).hexdigest()[:10]}",
    )
    outs = []
    for eid in POINT_EVENT_IDS:
        ref = eid.to_bytes(8, "big")
        pulse = 4_000_000 + eid // 100
        hit = PQ.read_record_by_reference(spark, base, ref, pulse=pulse)
        outs.append(
            hit.select(
                F.conv(F.hex(F.col("reference")), 16, 10)
                .cast("long")
                .alias("event_id"),
                "pulse_number",
                F.col("order").cast("long").alias("ord"),
            )
        )
    return _reduce(lambda a, b: a.unionByName(b), outs)


#: q124: one rare term (df 25 at sf0.01) + two Zipf-head terms
#: (df ≈ 400 of 500) — the shape where MaxScore's essential split
#: engages and the head terms' postings never enter the pivot.
MAXSCORE_TERMS = ["dup", "batch", "scan"]
MAXSCORE_TOPK = 15


def q124_bm25_maxscore(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT top-k BM25 with MaxScore pruning (Turtle & Flood 1995;
    operators/retrieval.py::bm25_search_maxscore) over the same
    persisted index as q120: a θ threshold seeded from the RAREST
    term's fully-scored docs makes the two Zipf-head query terms
    non-essential, so their postings meet only a broadcast semi-join
    against the rare term's candidate docs instead of being
    pivot-aggregated wholesale — the early-exit SCALE.md's indexed
    curve said "no layout removes", WITHOUT the exactness price
    block-max WAND pays. The oracle is the same FULL-evaluation BM25
    SQL as q113/q120 — certification IS the claim that pruning
    changed nothing."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    base = _gate_store(
        "bm25-idx",
        sf,
        lambda b: R.write_postings_index(docs, b, num_files=8),
    )
    return R.bm25_search_maxscore(
        spark, base, MAXSCORE_TERMS, k1=BM25_K1, b=BM25_B, topk=MAXSCORE_TOPK
    )


#: q125: quantile probes and the sub-bucket resolution (2^-6 ≈ 1.6%
#: relative bucket width).
QHIST_PROBS = [0.5, 0.9, 0.99]

#: q126: hybrid-search inputs — keyword side + vector side fused on
#: ranks (RRF k=60, the SIGIR'09 default), 50 candidates per side.
HYBRID_TERMS = ["dup", "merge"]
HYBRID_CAND, HYBRID_TOPK, HYBRID_RRF_K = 50, 20, 60


def q125_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile histogram (DDSketch re-derived on the
    integer lattice — operators/sketches.py::qhist_*): per-returnflag
    p50/p90/p99 of lineitem price in cents. The sketch state is
    (flag, bucket, cnt) with ≤ (64−B)·2^B rows per flag regardless of
    table size — map-side combine collapses each partition before the
    shuffle, states from different days/splits merge by SUM, and
    deletes decrement EXACTLY (counter lattice, like the CMS mirror).
    The estimate itself — bucket of the ceil(p·n)-th value, midpoint
    on the 2^-6 geometric lattice — is integer-reproducible, so the
    DuckDB oracle replays the ESTIMATOR (bucket assignment via the
    base-2 digit string, HUGEINT midpoint), not just the data.
    Prices are strictly positive, so the oracle replays only the
    positive lattice; the zero bucket and the mirrored negative
    lattice are pinned by test_sketches TestQhist."""
    from block_explorer_spark.operators import sketches as S

    li = _t(spark, sf, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    st = S.qhist_state(cents, "v", group_by=["flag"])
    return S.qhist_quantiles(st, QHIST_PROBS, group_by=["flag"]).select(
        "flag", "prob", F.col("est").alias("cents_est")
    )


def q126_hybrid_search(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword top-50 over `documents` and
    brute cosine top-50 over `embeddings` (aligned ids), fused by
    Reciprocal Rank Fusion (retrieval.py::rrf_fuse — SIGIR'09). Ranks
    are integers with ties pre-broken by id, so the fusion — the
    modern RAG-stack serving shape — is exactly SQL-replayable: the
    oracle reruns both full rankings, row_numbers them identically,
    and adds the two 1/(60+rank) terms in the same order."""
    from block_explorer_spark.operators import retrieval as R
    from block_explorer_spark.operators import similarity as Sim
    from pyspark.sql import Window as W

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    rank_w = lambda score, idc: F.row_number().over(
        W.partitionBy().orderBy(F.desc(score), F.asc(idc))
    )
    bm = R.bm25_topk(
        docs, HYBRID_TERMS, k1=BM25_K1, b=BM25_B, topk=HYBRID_CAND
    ).select(F.col("doc_id").alias("id"), rank_w("score", "doc_id").alias("rank"))
    ann = Sim.brute_force_topk(
        emb, "embedding", qvec, k=HYBRID_CAND
    ).select(F.col("vec_id").alias("id"), rank_w("cosine", "vec_id").alias("rank"))
    return R.rrf_fuse(
        [bm, ann], id_col="id", rrf_k=HYBRID_RRF_K, topk=HYBRID_TOPK
    ).select("id", F.round("rrf_score", 9).alias("rrf_score"))


#: q127: filtered-ANN inputs — predicate label, store geometry.
FANN_LABEL, FANN_CELLS, FANN_K = 7, 8, 10


def q127_filtered_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered vector search over the PERSISTED store: top-k cosine
    among vectors with label == 7 (vector_store.probe(where=...)) —
    the predicate applies inside the probe cells BEFORE the distance
    math (pre-filter; pushed to the parquet scan), never the
    under-filling post-filter shape. Probing every cell makes it
    exact, so the oracle is the plain filtered brute-force SQL: the
    certification IS the claim that the store's cell layout +
    predicate pushdown changed nothing."""
    from block_explorer_spark.operators import similarity as Sim  # noqa: F401
    from block_explorer_spark.sources import vector_store as VS

    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    base = _gate_store(
        "fann",
        sf,
        lambda b: VS.create(spark, b, emb, n_centroids=FANN_CELLS),
    )
    top = VS.probe(
        spark, base, qvec, k=FANN_K, n_probe=FANN_CELLS,
        where=F.col("label") == FANN_LABEL,
    )
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


#: q128: the decontamination-sweep shape — many BM25 queries, one
#: pass. Term lists deliberately overlap and mix rare/head tokens.
MANYQ_QUERIES = {
    "qa": ["dup", "spark"],
    "qb": ["batch", "merge"],
    "qc": ["dup"],
}
MANYQ_TOPK = 10


def q128_bm25_many(spark: SparkSession, sf: str) -> DataFrame:
    """Batch multi-query BM25 (retrieval.py::bm25_topk_many): all
    queries' postings come from ONE pre-shuffle-filtered build over
    the union of terms; idf stays a Python-computed literal per
    (query, term); per-(query, doc) scores fold token-ascending with
    F.aggregate (the fixed evaluation order heterogeneous term sets
    need, since they can't share a pivot layout); top-k per query is
    one partitioned row_number. The oracle evaluates each query
    independently with the q113 replay (terms sorted ascending — the
    same fold order) and unions — one pass must equal N passes bit
    for bit."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return R.bm25_topk_many(
        docs, MANYQ_QUERIES, k1=BM25_K1, b=BM25_B, topk=MANYQ_TOPK
    )


def q129_bm25_many_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """q128's sweep served FROM the persisted postings index
    (retrieval.py::bm25_search_many): one pruned read over the union
    of terms' covering files, same broadcast fan-out and
    token-ascending fold. Same oracle as q128 — the index must
    reproduce the batch sweep's scores without touching the corpus."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    base = _gate_store(
        "bm25-idx",
        sf,
        lambda b: R.write_postings_index(docs, b, num_files=8),
    )
    return R.bm25_search_many(
        spark, base, MANYQ_QUERIES, k1=BM25_K1, b=BM25_B, topk=MANYQ_TOPK
    )


def _pos_store(spark: SparkSession, sf: str) -> str:
    """Per-sf postings index WITH the positional family — the store
    behind the indexed phrase/proximity/vocab gates (q130–q132)."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return _gate_store(
        "bm25-pos",
        sf,
        lambda b: R.write_postings_index(docs, b, num_files=8, positions=True),
    )


def q130_phrase_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """q118's exact-phrase query served FROM the persisted positional
    family (retrieval.py::write_postings_index(positions=True) /
    phrase_search_indexed): per-word token-zone pruning replaces the
    corpus scan, then the identical doc_id-co-located adjacency chain
    runs over the bounded postings — the Lucene .pos structure stored
    relationally. Same oracle as q118: the certification IS the claim
    that the index serves phrase hits identical to a full positional
    scan."""
    from block_explorer_spark.operators import retrieval as R

    return R.phrase_search_indexed(spark, _pos_store(spark, sf), ["batch", "batch"])


def q131_proximity_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """q119's proximity query served from the persisted positional
    family (retrieval.py::proximity_search_indexed) — zone-pruned
    per-term reads, same pair-count join, same oracle as q119."""
    from block_explorer_spark.operators import retrieval as R

    return R.proximity_search_indexed(
        spark, _pos_store(spark, sf), "spark", "join", window=5
    )


def q132_prefix_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary range scan over the token-sorted postings index
    (retrieval.py::vocab_prefix): every term starting with a prefix,
    with document frequency and collection frequency — wildcard
    expansion (`s*`) as a B-tree-style range probe. Zone pruning
    keeps only files whose token range intersects [prefix, prefix+∞);
    df/cf are exact integers, so the oracle recomputes them from the
    corpus directly."""
    from block_explorer_spark.operators import retrieval as R

    return R.vocab_prefix(spark, _pos_store(spark, sf), "s")


#: q133 seed customer + hop bound for the reachability gate.
BFS_SRC, BFS_HOPS = 7, 3


def q133_bfs_reachability(spark: SparkSession, sf: str) -> DataFrame:
    """Hop-bounded BFS reachability (operators/graph.py::bfs_hops)
    over the undirected customer–supplier co-purchase graph (same
    edge set as q116's PageRank, symmetrized): every vertex within 3
    hops of one seed customer, labeled with its MINIMAL hop count —
    the blast-radius / k-hop-neighborhood query. One shuffle per hop,
    frontier anti-joined against the visited set, early exit on an
    empty frontier. Hop counts are exact integers and BFS admits no
    order dependence, so the oracle replays this ITERATIVE algorithm
    with a recursive CTE + GROUP BY MIN — like q116, certification of
    a loop, not a single plan."""
    from block_explorer_spark.operators.graph import bfs_hops

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    e = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + PR_SUPP_OFFSET).alias("dst"),
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    srcs = spark.createDataFrame([(BFS_SRC,)], "id long")
    return bfs_hops(sym, srcs, BFS_HOPS)


#: q134 sparsifier: keep every 50th part when building the
#: co-supplier graph, so the projection stays O(|parts|·deg²)-bounded
#: at every sf instead of going hub-quadratic.
TRI_PART_MOD = 50


def q134_triangle_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vertex triangle counts (operators/graph.py::
    triangle_counts) on the co-supplier graph — suppliers connected
    when they ship the same part (a sampled part slice keeps the
    projection sparse). Degree-ordered orientation bounds the wedge
    join at O(m^1.5); counts are exact integers, so the oracle
    replays them with the id-canonical 3-way self-join — orientation
    changes the plan, never the counts."""
    from block_explorer_spark.operators.graph import triangle_counts

    li = _t(spark, sf, "lineitem")
    ps = (
        li.filter(F.col("l_partkey") % TRI_PART_MOD == 0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    pairs = (
        ps.select("p", F.col("s").alias("u"))
        .join(ps.select("p", F.col("s").alias("v")), "p")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
    )
    return triangle_counts(pairs, "u", "v")


#: q135 co-occurrence window (positions apart, strictly after).
COOC_WINDOW = 3


def q135_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed token co-occurrence counts (operators/profile.py::
    cooccurrence): every unordered token pair within 3 positions,
    counted once per occurrence — the integer table under PMI
    collocation mining and word2vec context sampling. Range-join
    binning keeps the position self-join O(dl·window) per document
    (never dl²); counts are exact, so the oracle replays the pair
    join over the same tokenization."""
    from block_explorer_spark.operators.profile import cooccurrence

    docs = _t(spark, sf, "documents")
    return cooccurrence(docs, window=COOC_WINDOW)


#: q136 KWIC term (rare — the duplicated-doc marker token) + context.
KWIC_TERM, KWIC_WIDTH = "dup", 3


def q136_kwic(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword-in-context snippets served through the persisted
    positional family (retrieval.py::kwic_snippets_indexed): the
    term's zone-pruned positions (bounded by its df) broadcast onto
    the corpus, so only matching documents are tokenized; ±3 tokens
    sliced from the SAME token array (no second scan). The reviewer's
    "show me the hits" view after a decontamination sweep. Oracle
    replays the slice over the shared tokenization; snippets are
    plain strings, so the match is exact."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")
    return R.kwic_snippets_indexed(
        spark, _pos_store(spark, sf), docs, KWIC_TERM, width=KWIC_WIDTH
    )


#: q137 chunk geometry: 32-token windows, 8-token overlap (stride 24).
CHUNK_TOKENS, CHUNK_OVERLAP = 32, 8


def q137_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-size token chunking with overlap (operators/selection.py
    ::chunk_documents) — the context-window prep step for RAG
    indexing and long-document training. Map-only plan: tokenize,
    explode the stride sequence, slice the same token array — no
    shuffle, no UDF. The oracle replays it with generate_series +
    list_slice over the shared tokenization."""
    from block_explorer_spark.operators.selection import chunk_documents

    docs = _t(spark, sf, "documents")
    return chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


#: q138: seed supplier, relaxation rounds, and the part sparsifier
#: for the weighted co-supplier graph (weight = 10 − shared-part
#: count, floored at 1 — more co-supply, cheaper edge).
SP_SRC, SP_ROUNDS, SP_PART_MOD = 1, 3, 100


def q138_shortest_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded Bellman-Ford (operators/graph.py::shortest_paths_int)
    on the weighted co-supplier graph: minimal total edge weight from
    one seed supplier over paths of ≤ 3 edges — weighted blast
    radius with integer arithmetic. One shuffle per round, workset-
    pruned relaxation. Like q116/q133, the oracle certifies the
    ITERATIVE loop: a hop-bounded recursive CTE + GROUP BY MIN."""
    from block_explorer_spark.operators.graph import shortest_paths_int

    li = _t(spark, sf, "lineitem")
    ps = (
        li.filter(F.col("l_partkey") % SP_PART_MOD == 0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    pairs = (
        ps.select("p", F.col("s").alias("u"))
        .join(ps.select("p", F.col("s").alias("v")), "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
    )
    e = pairs.select(
        "u", "v", F.greatest(F.lit(1), F.lit(10) - F.col("c")).alias("w")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    srcs = spark.createDataFrame([(SP_SRC,)], "id long")
    return shortest_paths_int(
        sym, srcs, rounds=SP_ROUNDS, src="u", dst="v", weight="w"
    )


#: q139 collocation parameters: pair-count floor and result size.
COLL_MIN, COLL_TOPK = 5, 30


def q139_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining (operators/profile.py::collocations): token
    pairs ranked by LIFT — n_ab·N/(n_a·n_b), PMI's monotone twin that
    stays inside IEEE +,*,/ so both engines compute bit-identical
    doubles (every operand cast to double BEFORE multiplying: nothing
    can wrap an int64 at any corpus size, products round identically
    instead). Marginals and N fold from the q135-certified pair
    table; two token-keyed joins; top-30 by lift with full
    tiebreak."""
    from block_explorer_spark.operators.profile import collocations

    docs = _t(spark, sf, "documents")
    return collocations(
        docs, window=COOC_WINDOW, min_count=COLL_MIN, topk=COLL_TOPK
    )


#: q140: the deleted slice (RTBF request) — every 7th doc, offset 3.
DEL_MOD, DEL_REM = 7, 3


def q140_bm25_deleted(spark: SparkSession, sf: str) -> DataFrame:
    """q113's query served from an index that DELETED a slice of its
    corpus via tombstones (retrieval.py::index_delete): doc_ids land
    as a tombstone family (the Lucene live-docs idea, stored
    relationally — the token-partitioned layout scatters a doc
    across every token range, so rewrite-on-delete would cost the
    whole index), n/Σdl decrement EXACTLY from the doclen rows at
    delete time, and every serving path anti-joins tombstones away
    BEFORE df counting. The oracle is the full BM25 replay over the
    SURVIVING corpus — certification that delete-then-serve equals
    rebuild-from-survivors bit for bit. The RTBF path a 100 TB search
    deployment cannot ship without."""
    from block_explorer_spark.operators import retrieval as R

    docs = _t(spark, sf, "documents")

    def _build(b: str) -> None:
        R.write_postings_index(docs, b, num_files=8)
        R.index_delete(
            spark, b,
            docs.filter(F.col("doc_id") % DEL_MOD == DEL_REM).select("doc_id"),
        )

    base = _gate_store("bm25-del", sf, _build)
    return R.bm25_search_indexed(
        spark, base, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


def q141_index_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl→curate→search loop closed end to end
    (sources/cdc_consumer.py::index_sync): documents flow through the
    corpus store's curation ingest (two id-ordered batches, exact
    bag-of-words dedup), a RTBF sweep deletes the 'de' slice
    (corpus_store.delete_where), and the postings index follows the
    CHANGE FEED — inserts via index_append (cost ∝ delta), deletes
    via index_delete tombstones, the consumer watermark riding in the
    same CAS swap as the write it covers (exactly-once under crash
    replay). The oracle replays the curation pipeline in SQL (token
    floor + min-id-per-fingerprint winners + lang filter) and runs
    the full BM25 over the SURVIVORS: certification that the synced
    index serves exactly what a from-scratch build over the live
    corpus would."""
    import os as _os

    from block_explorer_spark.operators import retrieval as R
    from block_explorer_spark.sources import cdc_consumer as CC
    from block_explorer_spark.sources import corpus_store as cs

    docs = _t(spark, sf, "documents")

    def _build(b: str) -> None:
        cb, ib = _os.path.join(b, "corpus"), _os.path.join(b, "idx")
        R.write_postings_index(
            spark.createDataFrame([], "doc_id long, text string"), ib,
            num_files=1,
        )
        src = docs.select("doc_id", "text", "lang", "source")
        thr = docs.agg(F.max("doc_id")).collect()[0][0] // 2
        cs.ingest(
            spark, cb, src.filter(F.col("doc_id") <= thr),
            min_tokens=1, max_dup_word_frac=1.0,
        )
        CC.index_sync(spark, cb, ib)
        cs.ingest(
            spark, cb, src.filter(F.col("doc_id") > thr),
            min_tokens=1, max_dup_word_frac=1.0,
        )
        cs.delete_where(spark, cb, F.col("lang") == "de")
        CC.index_sync(spark, cb, ib)

    base = _os.path.join(_gate_store("bm25-cdc", sf, _build), "idx")
    return R.bm25_search_indexed(
        spark, base, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


def q142_hybrid_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """q126's hybrid RAG-stack query served ENTIRELY from persisted
    indexes: the BM25 ranking from the committed postings store
    (q120's layout, zero-join pruned probe) and the vector ranking
    from the IVF vector store probing every cell (exact — q127's
    contract), fused by the same Reciprocal Rank Fusion. No corpus
    scan, no embedding-table scan: the serving stack a RAG deployment
    actually runs. Same oracle as q126 — both full rankings replayed
    and fused in SQL; the indexes must reproduce the batch fusion bit
    for bit."""
    from block_explorer_spark.operators import retrieval as R
    from block_explorer_spark.sources import vector_store as VS
    from pyspark.sql import Window as W

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    bmbase = _gate_store(
        "bm25-idx",
        sf,
        lambda b: R.write_postings_index(docs, b, num_files=8),
    )
    vbase = _gate_store(
        "fann",
        sf,
        lambda b: VS.create(spark, b, emb, n_centroids=FANN_CELLS),
    )
    rank_w = lambda score, idc: F.row_number().over(
        W.partitionBy().orderBy(F.desc(score), F.asc(idc))
    )
    bm = R.bm25_search_indexed(
        spark, bmbase, HYBRID_TERMS, k1=BM25_K1, b=BM25_B, topk=HYBRID_CAND
    ).select(F.col("doc_id").alias("id"), rank_w("score", "doc_id").alias("rank"))
    ann = VS.probe(
        spark, vbase, qvec, k=HYBRID_CAND, n_probe=FANN_CELLS
    ).select(F.col("vec_id").alias("id"), rank_w("cosine", "vec_id").alias("rank"))
    return R.rrf_fuse(
        [bm, ann], id_col="id", rrf_k=HYBRID_RRF_K, topk=HYBRID_TOPK
    ).select("id", F.round("rrf_score", 9).alias("rrf_score"))


#: q143 terms: three mid-frequency tokens for the covering window.
MINWIN_TERMS = ["spark", "join", "merge"]


def q143_min_window(spark: SparkSession, sf: str) -> DataFrame:
    """Minimal covering window (retrieval.py::min_window_indexed):
    for every document containing all three terms, the smallest token
    span covering one occurrence of each — the passage-retrieval /
    cover-density primitive (Clarke et al.), served from the
    zone-pruned positional family. Integer spans over doc_id-
    co-located joins; the oracle replays the 3-way position join."""
    from block_explorer_spark.operators import retrieval as R

    return R.min_window_indexed(spark, _pos_store(spark, sf), MINWIN_TERMS)


#: q144: the phrase decontamination sweep — bigrams ride the
#: vectorized adjacency path, the trigram exercises the chain path.
MANYP_PHRASES = {
    "pa": ["batch", "batch"],
    "pb": ["spark", "join"],
    "pc": ["query", "window", "scan"],
}


def q144_phrase_many(spark: SparkSession, sf: str) -> DataFrame:
    """Batch multi-phrase search from the positional index
    (retrieval.py::phrase_search_many): all phrases answered in ONE
    zone-pruned read — bigram phrases share a single adjacency
    self-join turned into per-query hits by a broadcast phrase table
    (10k bigrams = one join), longer phrases chain over the same
    materialized positions. The exact-string decontamination sweep at
    serving time. Oracle: per-phrase positional replays, unioned."""
    from block_explorer_spark.operators import retrieval as R

    return R.phrase_search_many(spark, _pos_store(spark, sf), MANYP_PHRASES)


#: q145: PPR seed (same customer as the BFS gate), iterations, top-k.
PPR_ITERS, PPR_TOPK = 4, 20


def q145_ppr(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank on the integer lattice
    (operators/graph.py::ppr_int, Haveliwala WWW'02): teleport mass
    returns only to one seed customer on the symmetrized
    customer–supplier graph — rank becomes proximity to the seed, the
    graph-similarity/recommendation primitive. Floor-division exact
    like q116, so the oracle unrolls the fixed iterations as chained
    CTEs with the source-conditional teleport term."""
    from block_explorer_spark.operators.graph import ppr_int

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    e = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + PR_SUPP_OFFSET).alias("dst"),
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    srcs = spark.createDataFrame([(BFS_SRC,)], "id long")
    ranks = ppr_int(sym, srcs, iters=PPR_ITERS, scale=PR_SCALE)
    return (
        ranks.filter(F.col("rank") > 0)
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(PPR_TOPK)
        .select(F.col("id").cast("long").alias("id"), F.col("rank"))
    )


#: q146: the RTBF slice deleted from the vector store.
VDEL_MOD, VDEL_REM = 9, 2


def q146_ann_deleted(spark: SparkSession, sf: str) -> DataFrame:
    """Vector search after an RTBF delete
    (sources/vector_store.py::delete_ids): a slice of vec_ids is
    PHYSICALLY removed — only the files whose vec_id zone covers a
    requested id are rewritten, survivors + rewritten PQ codes + the
    delete log publish in one CAS swap — then the store is probed
    across every cell (exact by q127's contract). The oracle is the
    plain brute-force cosine SQL over the SURVIVING vectors:
    certification that delete-then-serve equals a store rebuilt
    without the deleted rows."""
    from block_explorer_spark.sources import vector_store as VS

    emb = _t(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]

    def _build(b: str) -> None:
        VS.create(spark, b, emb, n_centroids=FANN_CELLS)
        VS.delete_ids(
            spark, b,
            emb.filter(F.col("vec_id") % VDEL_MOD == VDEL_REM).select("vec_id"),
        )

    base = _gate_store("fann-del", sf, _build)
    top = VS.probe(spark, base, qvec, k=FANN_K, n_probe=FANN_CELLS)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


#: q147: the vector-sweep query ids (seed vectors from the table).
VMANY_IDS = [0, 1, 2]


def q147_ann_many(spark: SparkSession, sf: str) -> DataFrame:
    """Batch multi-query vector search (vector_store.py::probe_many):
    N query vectors answered in ONE pass over the union of their
    probe cells — a broadcast (query_id, qvec, cells) fan-out scores
    each query against exactly its own cells' rows, so every result
    is bit-identical to its single probe (pinned), while the
    store-side scan is paid once. Probing all cells makes it exact,
    so the oracle is N brute-force cosine rankings, tagged and
    unioned — the re-ranking/eval-sweep shape for the vector side."""
    from block_explorer_spark.sources import vector_store as VS

    emb = _t(spark, sf, "embeddings")
    qvecs = {
        f"v{r['vec_id']}": [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(VMANY_IDS)).collect()
    }
    base = _gate_store(
        "fann",
        sf,
        lambda b: VS.create(spark, b, emb, n_centroids=FANN_CELLS),
    )
    out = VS.probe_many(spark, base, qvecs, k=FANN_K, n_probe=FANN_CELLS)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine")
    )


#: q149: keywords per document (top-k by tf·N/df).
KW_TOPK = 3


def q149_doc_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document keyword extraction (operators/profile.py::
    doc_keywords): top-3 terms by tf·N/df — TF-IDF's ranking with the
    monotone logarithm dropped, so the score is pure IEEE *,/ over
    exact integers and both engines agree bit for bit (the
    `collocations` trick). One explode, one df aggregation, one
    per-doc window."""
    from block_explorer_spark.operators.profile import doc_keywords

    docs = _t(spark, sf, "documents")
    return doc_keywords(docs, topk_per_doc=KW_TOPK)


#: q148: the hybrid sweep — (keyword terms, seed vec_id) per query.
HMANY_QUERIES = {"h0": (["dup", "merge"], 0), "h1": (["batch", "scan"], 1)}


def q148_hybrid_many(spark: SparkSession, sf: str) -> DataFrame:
    """The RAG EVAL SWEEP: N hybrid queries, every side served from a
    persisted index in ONE pass each — bm25_search_many over the
    postings store (token-ascending fold), probe_many over the vector
    store (all cells = exact), per-query RRF fusion via a two-term
    commutative sum (IEEE addition of two doubles is order-safe, so
    the grouped sum matches the oracle's fixed COALESCE order
    exactly). Oracle: each query's q126-style fusion replay, tagged
    and unioned."""
    from pyspark.sql import Window as W

    from block_explorer_spark.operators import retrieval as R
    from block_explorer_spark.sources import vector_store as VS

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    bmbase = _gate_store(
        "bm25-idx", sf, lambda b: R.write_postings_index(docs, b, num_files=8)
    )
    vbase = _gate_store(
        "fann", sf, lambda b: VS.create(spark, b, emb, n_centroids=FANN_CELLS)
    )
    vids = sorted({v for _, v in HMANY_QUERIES.values()})
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(vids)).collect()
    }
    bm = R.bm25_search_many(
        spark, bmbase,
        {qid: ts for qid, (ts, _) in HMANY_QUERIES.items()},
        k1=BM25_K1, b=BM25_B, topk=HYBRID_CAND,
    )
    ann = VS.probe_many(
        spark, vbase,
        {qid: vecs[v] for qid, (_, v) in HMANY_QUERIES.items()},
        k=HYBRID_CAND, n_probe=FANN_CELLS,
    )
    kf = float(HYBRID_RRF_K)
    wq = lambda s, i: W.partitionBy("query_id").orderBy(F.desc(s), F.asc(i))
    bmr = bm.select(
        "query_id", F.col("doc_id").alias("id"),
        (F.lit(1.0) / (F.lit(kf) + F.row_number().over(wq("score", "doc_id"))
                       .cast("double"))).alias("c"),
    )
    annr = ann.select(
        "query_id", F.col("vec_id").alias("id"),
        (F.lit(1.0) / (F.lit(kf) + F.row_number().over(wq("cosine", "vec_id"))
                       .cast("double"))).alias("c"),
    )
    fused = (
        bmr.unionByName(annr)
        .groupBy("query_id", "id")
        .agg(F.sum("c").alias("s"))
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("id"))
    )
    return (
        fused.withColumn("__rn", rn)
        .filter(F.col("__rn") <= HYBRID_TOPK)
        .select(
            "query_id", "id", F.round("s", 9).alias("rrf_score")
        )
        .orderBy("query_id", F.desc("rrf_score"), F.asc("id"))
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3 (join + agg + top-k) on sf0.001."""
    return q17_tpch_q3(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_keyset_page": q01_keyset_page,
        "q02_range_page": q02_range_page,
        "q03_chain_repair": q03_chain_repair,
        "q04_prefix_hierarchy": q04_prefix_hierarchy,
        "q05_in_list": q05_in_list,
        "q06_point_lookup": q06_point_lookup,
        "q07_counters": q07_counters,
        "q08_minmax_seek": q08_minmax_seek,
        "q09_topk": q09_topk,
        "q10_union_dedup": q10_union_dedup,
        "q11_exporter_join": q11_exporter_join,
        "q12_prevnext_link": q12_prevnext_link,
        "q13_sessionize": q13_sessionize,
        "q14_index_format": q14_index_format,
        "q15_siblings": q15_siblings,
        "q16_tpch_q1": q16_tpch_q1,
        "q17_tpch_q3": q17_tpch_q3,
        "q18_tpch_q5": q18_tpch_q5,
        "q19_tpch_q6": q19_tpch_q6,
        "q20_dedup_exact": q20_dedup_exact,
        "q21_token_stats": q21_token_stats,
        "q22_langid": q22_langid,
        "q23_quality": q23_quality,
        "q24_word_jaccard": q24_word_jaccard,
        "q25_minhash_lsh": q25_minhash_lsh,
        "q26_simhash": q26_simhash,
        "q27_ann_brute": q27_ann_brute,
        "q28_embed_neardup": q28_embed_neardup,
        "q29_ann_lsh": q29_ann_lsh,
        "q30_hash_chain": q30_hash_chain,
        "q31_winnow_fingerprint": q31_winnow_fingerprint,
        "q32_media_features": q32_media_features,
        "q33_ann_ivf": q33_ann_ivf,
        "q34_count_distinct": q34_count_distinct,
        "q35_rollup": q35_rollup,
        "q36_asof_join": q36_asof_join,
        "q37_percentiles": q37_percentiles,
        "q38_window_analytics": q38_window_analytics,
        "q39_salted_join": q39_salted_join,
        "q40_range_join": q40_range_join,
        "q41_correlated_max": q41_correlated_max,
        "q42_tpch_q13": q42_tpch_q13,
        "q43_tpch_q18": q43_tpch_q18,
        "q44_anti_join": q44_anti_join,
        "q45_setops": q45_setops,
        "q46_cube": q46_cube,
        "q47_pivot": q47_pivot,
        "q48_gapfill": q48_gapfill,
        "q49_exists": q49_exists,
        "q50_scalar_subquery": q50_scalar_subquery,
        "q51_promo_share": q51_promo_share,
        "q52_topk_per_group": q52_topk_per_group,
        "q53_returned_revenue": q53_returned_revenue,
        "q54_json_extract": q54_json_extract,
        "q55_train_split": q55_train_split,
        "q56_seq_packing": q56_seq_packing,
        "q57_tpch_q7": q57_tpch_q7,
        "q58_tpch_q8": q58_tpch_q8,
        "q59_tpch_q12": q59_tpch_q12,
        "q60_tpch_q15": q60_tpch_q15,
        "q61_tpch_q17": q61_tpch_q17,
        "q62_tpch_q19": q62_tpch_q19,
        "q63_tpch_q21": q63_tpch_q21,
        "q64_text_clean": q64_text_clean,
        "q65_vocab_topk": q65_vocab_topk,
        "q66_decontaminate": q66_decontaminate,
        "q67_length_filter": q67_length_filter,
        "q68_tpch_q2": q68_tpch_q2,
        "q69_tpch_q4": q69_tpch_q4,
        "q70_tpch_q9": q70_tpch_q9,
        "q71_tpch_q10": q71_tpch_q10,
        "q72_tpch_q11": q72_tpch_q11,
        "q73_tpch_q16": q73_tpch_q16,
        "q74_tpch_q20": q74_tpch_q20,
        "q75_tpch_q22": q75_tpch_q22,
        "q76_repetition": q76_repetition,
        "q77_stratified_sample": q77_stratified_sample,
        "q78_uniform_sample": q78_uniform_sample,
        "q79_pii_scrub": q79_pii_scrub,
        "q80_domain_stats": q80_domain_stats,
        "q81_quantized_ann": q81_quantized_ann,
        "q82_containment": q82_containment,
        "q83_dedup_clusters": q83_dedup_clusters,
        "q84_window_frames": q84_window_frames,
        "q85_approx_contract": q85_approx_contract,
        "q86_corpus_pipeline": q86_corpus_pipeline,
        "q87_table_profile": q87_table_profile,
        "q88_semantic_dedup": q88_semantic_dedup,
        "q89_temperature_mixture": q89_temperature_mixture,
        "q90_token_budget_select": q90_token_budget_select,
        "q91_crossdoc_ngrams": q91_crossdoc_ngrams,
        "q92_lm_perplexity": q92_lm_perplexity,
        "q93_oov_rate": q93_oov_rate,
        "q94_quality_survivors": q94_quality_survivors,
        "q95_exact_substring_dedup": q95_exact_substring_dedup,
        "q96_bpe_tokenize": q96_bpe_tokenize,
        "q97_bpe_budget_select": q97_bpe_budget_select,
        "q98_perceptual_dedup": q98_perceptual_dedup,
        "q99_audio_dedup": q99_audio_dedup,
        "q100_video_dedup": q100_video_dedup,
        "q101_pq_adc": q101_pq_adc,
        "q102_hll_distinct": q102_hll_distinct,
        "q103_cms_heavy_hitters": q103_cms_heavy_hitters,
        "q104_bloom_decontam": q104_bloom_decontam,
        "q105_kmv_quantiles": q105_kmv_quantiles,
        "q106_bloom_join": q106_bloom_join,
        "q107_window_distinct": q107_window_distinct,
        "q108_rollup_agg": q108_rollup_agg,
        "q109_moving_peak": q109_moving_peak,
        "q110_cms_watchlist": q110_cms_watchlist,
        "q111_zorder_box": q111_zorder_box,
        "q112_kmv_set_algebra": q112_kmv_set_algebra,
        "q113_bm25_search": q113_bm25_search,
        "q114_funnel": q114_funnel,
        "q115_cohort_retention": q115_cohort_retention,
        "q116_pagerank": q116_pagerank,
        "q117_segment_drift": q117_segment_drift,
        "q118_phrase_search": q118_phrase_search,
        "q119_proximity_search": q119_proximity_search,
        "q120_bm25_indexed": q120_bm25_indexed,
        "q121_bm25_incremental": q121_bm25_incremental,
        "q122_lifeline_store": q122_lifeline_store,
        "q123_record_point_lookup": q123_record_point_lookup,
        "q124_bm25_maxscore": q124_bm25_maxscore,
        "q125_quantile_sketch": q125_quantile_sketch,
        "q126_hybrid_search": q126_hybrid_search,
        "q127_filtered_ann": q127_filtered_ann,
        "q128_bm25_many": q128_bm25_many,
        "q129_bm25_many_indexed": q129_bm25_many_indexed,
        "q130_phrase_indexed": q130_phrase_indexed,
        "q131_proximity_indexed": q131_proximity_indexed,
        "q132_prefix_vocab": q132_prefix_vocab,
        "q133_bfs_reachability": q133_bfs_reachability,
        "q134_triangle_counts": q134_triangle_counts,
        "q135_cooccurrence": q135_cooccurrence,
        "q136_kwic": q136_kwic,
        "q137_chunking": q137_chunking,
        "q138_shortest_paths": q138_shortest_paths,
        "q139_collocations": q139_collocations,
        "q140_bm25_deleted": q140_bm25_deleted,
        "q141_index_cdc": q141_index_cdc,
        "q142_hybrid_indexed": q142_hybrid_indexed,
        "q143_min_window": q143_min_window,
        "q144_phrase_many": q144_phrase_many,
        "q145_ppr": q145_ppr,
        "q146_ann_deleted": q146_ann_deleted,
        "q147_ann_many": q147_ann_many,
        "q148_hybrid_many": q148_hybrid_many,
        "q149_doc_keywords": q149_doc_keywords,
    }


_WORDSET = "list_sort(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))"

_TOK = """SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 2, 1)),
        i -> array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[i:i+2], ' ')))) AS sh
    FROM documents"""

#: Shingle CTE with lang, word-3gram, distinct per doc (the _TOK
#: construction carrying lang for the sketch gates).
_SKETCH_TOK = """SELECT lang, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 2, 1)),
        i -> array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[i:i+2], ' ')))) AS sh
    FROM documents"""


def _hll_cte(src_cte: str, group: str, key: str, p: int = HLL_P) -> str:
    """Shared HLL replay (sketches.hll_registers/hll_estimate in SQL):
    portable md5 60-bit hash, bit-length rho via bin(), INTEGER
    harmonic-mean accumulator, linear-counting branch — so the
    ESTIMATE hash-matches, not just the exact column. Produces CTEs
    `est(g, hll_estimate)` and `ex(g, exact_distinct)` over
    `src_cte`'s ({group}, {key}) rows."""
    m = 1 << p
    maxrho = 60 - p + 1
    num = SK.hll_alpha(m) * m * m * float(1 << maxrho)
    return f"""
        WITH src AS ({src_cte}),
        h AS (SELECT {group} AS g,
                     CAST(('0x' || substr(md5('0:' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM src),
        regs AS (SELECT g, h % {m} AS register,
                 CASE WHEN h // {m} = 0 THEN {maxrho}
                      ELSE {maxrho} - length(bin(h // {m})) END AS rho FROM h),
        mx AS (SELECT g, register, MAX(rho) AS max_rho FROM regs GROUP BY 1, 2),
        agg AS (SELECT g, SUM(CAST(pow(2.0, {maxrho} - max_rho) AS BIGINT)) AS s,
                       COUNT(*) AS present FROM mx GROUP BY 1),
        fin AS (SELECT g, ({m} - present) AS z,
                       {num!r} / CAST(s + ({m} - present) * {1 << maxrho} AS DOUBLE) AS e_raw
                FROM agg),
        est AS (SELECT g,
                       ROUND(CASE WHEN z > 0 AND e_raw <= {2.5 * m!r}
                                  THEN {float(m)!r} * ln({float(m)!r} / z)
                                  ELSE e_raw END, 3) AS hll_estimate FROM fin),
        ex AS (SELECT {group} AS g, COUNT(DISTINCT {key}) AS exact_distinct
               FROM src GROUP BY 1)
    """


def _hll_oracle(p: int = HLL_P) -> str:
    """q102: per-lang distinct shingles with exact + rel_err."""
    return f"""
        {_hll_cte(_SKETCH_TOK, "lang", "sh", p)}
        SELECT est.g AS lang, hll_estimate,
               CAST(exact_distinct AS BIGINT) AS exact_distinct,
               ROUND(abs(hll_estimate - exact_distinct) / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
        FROM est JOIN ex USING (g)
    """


def _window_distinct_oracle(p: int = HLL_P) -> str:
    """q107: per-UTC-day distinct users (epoch_us // µs-per-day ==
    Spark's epoch-nanos div ns-per-day)."""
    src = f"SELECT epoch_us(ts) // {86_400 * 1_000_000} AS day, user_id FROM events"
    return f"""
        {_hll_cte(src, "day", "user_id", p)}
        SELECT est.g AS day, hll_estimate,
               CAST(exact_distinct AS BIGINT) AS exact_distinct
        FROM est JOIN ex USING (g)
    """


def _cms_oracle(d: int = CMS_DEPTH, w: int = CMS_WIDTH, topk: int = CMS_TOPK) -> str:
    """q103 oracle: full CMS replay — seeded portable hash per depth,
    integer counter matrix, min-over-depth probe, deterministic
    top-k cut (estimate desc, shingle asc)."""
    h = f"CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || sh), 1, 15)) AS BIGINT) % {w}"
    return f"""
        WITH t AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
        occ AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))) AS sh
                FROM t WHERE len(toks) >= 3),
        seeds AS (SELECT unnest(generate_series(0, {d - 1})) AS d),
        counters AS (SELECT d, {h} AS bucket, COUNT(*) AS cnt
                     FROM occ, seeds GROUP BY 1, 2),
        probes AS (SELECT sh, d, {h} AS bucket
                   FROM (SELECT DISTINCT sh FROM occ), seeds),
        est AS (SELECT sh, MIN(cnt) AS cms_estimate
                FROM probes JOIN counters USING (d, bucket) GROUP BY sh),
        ex AS (SELECT sh, COUNT(*) AS exact_count FROM occ GROUP BY sh)
        SELECT est.sh, CAST(cms_estimate AS BIGINT) AS cms_estimate,
               CAST(exact_count AS BIGINT) AS exact_count
        FROM est JOIN ex USING (sh)
        ORDER BY cms_estimate DESC, sh LIMIT {topk}
    """


def _cms_watchlist_oracle(d: int = CMS_DEPTH, w: int = CMS_WIDTH) -> str:
    """q110 oracle: CMS replay over lineitem part keys, probed only at
    the p_size <= 5 watchlist; exact counts joined per watched key."""
    h = (
        f"CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || "
        f"CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) % {w}"
    )
    return f"""
        WITH occ AS (SELECT l_partkey FROM lineitem),
        watch AS (SELECT p_partkey AS l_partkey FROM part WHERE p_size <= 5),
        seeds AS (SELECT unnest(generate_series(0, {d - 1})) AS d),
        counters AS (SELECT d, {h} AS bucket, COUNT(*) AS cnt
                     FROM occ, seeds GROUP BY 1, 2),
        probes AS (SELECT l_partkey, d, {h} AS bucket
                   FROM (SELECT DISTINCT l_partkey FROM watch), seeds),
        est AS (SELECT l_partkey,
                       MIN(COALESCE(cnt, 0)) AS cms_estimate
                FROM probes LEFT JOIN counters USING (d, bucket) GROUP BY l_partkey),
        ex AS (SELECT occ.l_partkey, COUNT(*) AS exact_count
               FROM occ JOIN watch USING (l_partkey) GROUP BY 1)
        SELECT est.l_partkey,
               CAST(cms_estimate AS BIGINT) AS cms_estimate,
               CAST(COALESCE(exact_count, 0) AS BIGINT) AS exact_count
        FROM est LEFT JOIN ex USING (l_partkey)
    """


def _bm25_oracle(
    terms: list[str] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    where: str = "TRUE",
) -> str:
    """q113 oracle: recompute N / avgdl / per-term df from the
    certification parquet with DuckDB, derive idf in the SAME Python
    math.log the engine used, inject all floats as repr() literals,
    and replay the scoring with the identical operation order — every
    remaining op is IEEE + * /, so scores match bit for bit."""
    import duckdb

    from block_explorer_spark.operators.retrieval import idf_weights

    sf_dir = _oracle_sf_dir()
    con = duckdb.connect()
    tok = (
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        "t -> t <> '')"
    )
    df_cols = ", ".join(
        f"count_if(list_contains({tok}, '{t}')) AS df_{i}"
        for i, t in enumerate(terms)
    )
    row = con.sql(
        f"SELECT count(*) AS n, sum(len({tok})) AS sum_dl, {df_cols} "
        f"FROM '{sf_dir}/documents.parquet' WHERE {where}"
    ).fetchone()
    n, sum_dl = int(row[0]), int(row[1])
    dfs = {t: int(row[2 + i]) for i, t in enumerate(terms)}
    idf = idf_weights(n, dfs)
    avgdl = sum_dl / n if n else 0.0
    k1p1 = k1 + 1.0
    omb = 1.0 - b
    tfs = ", ".join(
        f"CAST(len(list_filter(tk, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    norm = f"({k1!r} * ({omb!r} + {b!r} * dl / {avgdl!r}))"
    score = "0.0"
    for i, t in enumerate(terms):
        score = f"{score} + {idf[t]!r} * (tf_{i} * {k1p1!r} / (tf_{i} + {norm}))"
    any_match = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
        WITH toks AS (SELECT doc_id, {tok} AS tk FROM documents
                      WHERE {where}),
        per AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, {tfs} FROM toks)
        SELECT doc_id, {score} AS score
        FROM per
        WHERE {any_match} > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT {topk}
    """


def _hybrid_oracle(
    terms: list[str] = None, qvec_id: int = 0, tag: str | None = None
) -> str:
    """q126 oracle: rerun BOTH full rankings (the q113-style bit-exact
    BM25 replay at 50 candidates; the q27-style exact-double cosine),
    row_number them with the identical tie-break, and add the two
    1/(k+rank) terms in the same left-to-right order. `tag` prepends a
    query_id column (the q148 sweep unions tagged instances)."""
    bm_sql = _bm25_oracle(terms=sorted(terms or HYBRID_TERMS), topk=HYBRID_CAND)
    dot = (
        "list_sum(list_transform(list_zip(embedding, qe), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    nrm = (
        "sqrt(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(qe, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    kf = float(HYBRID_RRF_K)
    tag_col = f"'{tag}' AS query_id, " if tag else ""
    return f"""
        WITH bm AS ({bm_sql}),
        bmr AS (
          SELECT doc_id AS id,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC) AS ra
          FROM bm
        ),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {qvec_id}),
        ann AS (
          SELECT vec_id AS id, {dot} / ({nrm}) AS c
          FROM embeddings, q
          ORDER BY c DESC, vec_id ASC
          LIMIT {HYBRID_CAND}
        ),
        annr AS (
          SELECT id, row_number() OVER (ORDER BY c DESC, id ASC) AS rb
          FROM ann
        ),
        fused AS (
          SELECT COALESCE(bmr.id, annr.id) AS id,
                 COALESCE(1.0 / ({kf!r} + CAST(ra AS DOUBLE)), 0.0)
                 + COALESCE(1.0 / ({kf!r} + CAST(rb AS DOUBLE)), 0.0) AS s
          FROM bmr FULL OUTER JOIN annr ON bmr.id = annr.id
        )
        SELECT {tag_col}id, round(s, 9) AS rrf_score
        FROM fused
        ORDER BY s DESC, id ASC
        LIMIT {HYBRID_TOPK}
    """


def _bm25_many_oracle() -> str:
    """q128 oracle: each query evaluated independently with the q113
    bit-exact replay (terms token-ascending — the engine's fold
    order), tagged and unioned."""
    parts = []
    for qid in sorted(MANYQ_QUERIES):
        sub = _bm25_oracle(
            terms=sorted(set(MANYQ_QUERIES[qid])), topk=MANYQ_TOPK
        )
        parts.append(f"SELECT '{qid}' AS query_id, * FROM ({sub})")
    u = " UNION ALL ".join(parts)
    return f"""
        SELECT query_id, doc_id, score FROM ({u})
        ORDER BY query_id, score DESC, doc_id ASC
    """


def _bm25_live_corpus_oracle() -> str:
    """q141 oracle: replay the curation pipeline's survivor set in
    SQL — token floor (min_tokens=1, the q21-certified count), exact
    bag-of-words dedup (min doc_id per word-set fingerprint, the
    q20-certified key; the id-ordered batch split makes the store's
    cross-batch winner the global min id), RTBF lang sweep — then run
    the full BM25 replay over exactly those documents. The synced
    index must serve what a from-scratch build over the live corpus
    would."""
    sf_dir = _oracle_sf_dir()
    path = f"'{sf_dir}/documents.parquet'"
    ntok = "len(regexp_split_to_array(lower(trim(text)), '\\s+'))"
    where = (
        f"{ntok} >= 1 AND lang <> 'de' AND doc_id IN ("
        f"SELECT min(doc_id) FROM {path} WHERE {ntok} >= 1 "
        f"GROUP BY md5(array_to_string({_WORDSET}, ' ')))"
    )
    return _bm25_oracle(where=where)


def _positional_sql(select: str) -> str:
    """Shared positional-postings replay (q118/q119 and their indexed
    twins q130/q131): tokenize exactly like the engine, then run the
    given SELECT over p(doc_id, pos, token)."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(trim(text)),
                             '\\s+'), t -> t <> '') AS tk
          FROM documents
        ),
        idx AS (SELECT doc_id,
                       unnest(generate_series(1, len(tk))) AS i, tk
                FROM toks),
        p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                     tk[i] AS token
              FROM idx)
        {select}
    """


def _phrase_oracle() -> str:
    return _positional_sql("""
        SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM p a JOIN p b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.token = 'batch' AND b.token = 'batch'
        GROUP BY a.doc_id
    """)


def _phrase_many_oracle(phrases: dict[str, list[str]]) -> str:
    """q144 oracle: each phrase replayed independently over the shared
    positional CTE (the q118 adjacency pattern), tagged and unioned."""
    parts = []
    for qid in sorted(phrases):
        ws = phrases[qid]
        joins = " ".join(
            f"JOIN p a{i} ON a{i}.doc_id = a0.doc_id "
            f"AND a{i}.pos = a0.pos + {i}"
            for i in range(1, len(ws))
        )
        conds = " AND ".join(
            f"a{i}.token = '{w}'" for i, w in enumerate(ws)
        )
        parts.append(
            f"SELECT '{qid}' AS query_id, a0.doc_id, "
            f"CAST(COUNT(*) AS BIGINT) AS n_occurrences "
            f"FROM p a0 {joins} WHERE {conds} GROUP BY a0.doc_id"
        )
    return _positional_sql(" UNION ALL ".join(parts))


def _proximity_oracle() -> str:
    return _positional_sql("""
        SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM p a JOIN p b
          ON a.doc_id = b.doc_id
         AND abs(a.pos - b.pos) <= 5 AND a.pos <> b.pos
        WHERE a.token = 'spark' AND b.token = 'join'
        GROUP BY a.doc_id
    """)


def _pagerank_oracle(
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    topk: int = PR_TOPK,
    off: int = PR_SUPP_OFFSET,
    num: int = 85,
    den: int = 100,
) -> str:
    """q116 oracle: unroll the fixed iteration count as chained CTEs,
    same integer floor divisions (`//` == `div` for the non-negative
    values here)."""
    base = ((den - num) * scale) // den
    parts = [
        f"""WITH e AS (SELECT DISTINCT o_custkey AS src,
                              l_suppkey + {off} AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        r0 AS (SELECT id, CAST({scale} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
              SELECT n.id,
                     CAST({base} + ({num} * COALESCE(s.in_sum, 0)) // {den}
                          AS BIGINT) AS rank
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, SUM(r.rank // d.deg) AS in_sum
                FROM e JOIN r{i} r ON e.src = r.id
                       JOIN deg d ON e.src = d.src
                GROUP BY e.dst) s USING (id))"""
        )
    return (
        ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, rank FROM r{iters}
        ORDER BY rank DESC, id ASC LIMIT {topk}"""
    )


def _ppr_oracle(
    src_id: int = BFS_SRC,
    iters: int = PPR_ITERS,
    scale: int = PR_SCALE,
    topk: int = PPR_TOPK,
    off: int = PR_SUPP_OFFSET,
    num: int = 85,
    den: int = 100,
) -> str:
    """q145 oracle: unroll the personalized iterations as chained
    CTEs — identical to _pagerank_oracle except the teleport term is
    source-conditional and rank_0 concentrates on the seed."""
    base = ((den - num) * scale) // den
    parts = [
        f"""WITH e0 AS (SELECT DISTINCT o_custkey AS u,
                               l_suppkey + {off} AS v
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        sym AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        deg AS (SELECT u AS src, COUNT(*) AS deg FROM sym GROUP BY u),
        nodes AS (SELECT DISTINCT id FROM (
            SELECT u AS id FROM sym UNION SELECT v FROM sym
            UNION SELECT {src_id})),
        r0 AS (SELECT id,
                      CAST(CASE WHEN id = {src_id} THEN {scale} ELSE 0 END
                           AS BIGINT) AS rank
               FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
              SELECT n.id,
                     CAST(CASE WHEN n.id = {src_id} THEN {base} ELSE 0 END
                          + ({num} * COALESCE(s.in_sum, 0)) // {den}
                          AS BIGINT) AS rank
              FROM nodes n LEFT JOIN (
                SELECT sym.v AS id, SUM(r.rank // d.deg) AS in_sum
                FROM sym JOIN r{i} r ON sym.u = r.id
                         JOIN deg d ON sym.u = d.src
                GROUP BY sym.v) s USING (id))"""
        )
    return (
        ",\n".join(parts)
        + f"""
        SELECT CAST(id AS BIGINT) AS id, rank FROM r{iters}
        WHERE rank > 0
        ORDER BY rank DESC, id ASC LIMIT {topk}"""
    )


def _kmv_set_oracle(k: int = KMV_K) -> str:
    """q112 oracle: replay the bottom-k signatures (same md5-derived
    60-bit hash as sketches.hash60, seed 0), the combined bottom-k,
    and the integer estimators with HUGEINT division — bit-exact."""
    h = "CAST(('0x' || substr(md5('0:' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
        WITH sa AS (SELECT DISTINCT {h} AS h FROM orders
                    WHERE o_orderpriority = '1-URGENT' ORDER BY h LIMIT {k}),
        sb AS (SELECT DISTINCT {h} AS h FROM orders
               WHERE o_orderpriority = '2-HIGH' ORDER BY h LIMIT {k}),
        u AS (SELECT DISTINCT h
              FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
              ORDER BY h LIMIT {k}),
        st AS (SELECT COUNT(*) AS n_u, MAX(h) AS u_k,
                      COUNT(*) FILTER (WHERE h IN (SELECT h FROM sa)
                                       AND h IN (SELECT h FROM sb)) AS x
               FROM u),
        est AS (SELECT n_u, x,
                       CASE WHEN n_u < {k} THEN CAST(n_u AS HUGEINT)
                            ELSE (CAST({k - 1} AS HUGEINT)
                                  * CAST(1152921504606846976 AS HUGEINT)) // u_k
                       END AS union_est
                FROM st),
        ex AS (SELECT COUNT(DISTINCT o_custkey) AS exact_union FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        ei AS (SELECT COUNT(*) AS exact_inter FROM (
                 SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderpriority = '1-URGENT'
                 INTERSECT
                 SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderpriority = '2-HIGH'))
        SELECT CAST(union_est AS BIGINT) AS union_est,
               CAST((CAST(x AS HUGEINT) * union_est) // n_u AS BIGINT)
                   AS inter_est,
               CAST((x * 10000) // n_u AS BIGINT) AS jacc_bp,
               CAST(exact_union AS BIGINT) AS exact_union,
               CAST(exact_inter AS BIGINT) AS exact_inter
        FROM est, ex, ei
    """


def _bloom_oracle(k: int = BLOOM_K, mb: int = BLOOM_M) -> str:
    """q104 oracle: bloom build over the held-out bucket's
    fingerprints + full-k membership probe of the train bucket —
    false positives replayed exactly."""
    h = f"CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || fp), 1, 15)) AS BIGINT) % {mb}"
    return f"""
        WITH t AS (SELECT doc_id,
                          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b,
                          regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                   FROM documents),
        fps AS (SELECT doc_id, b, unnest(list_distinct(list_transform(
                    generate_series(1, greatest(len(toks) - 7, 1)),
                    i -> md5(array_to_string(toks[i:i+7], ' '))))) AS fp FROM t),
        seeds AS (SELECT unnest(generate_series(0, {k - 1})) AS d),
        pos AS (SELECT DISTINCT {h} AS pos FROM fps, seeds WHERE b = 9),
        probe AS (SELECT doc_id, fp, d, {h} AS pos FROM fps, seeds WHERE b < 8),
        hits AS (SELECT doc_id, fp FROM probe JOIN pos USING (pos)
                 GROUP BY doc_id, fp HAVING COUNT(*) = {k})
        SELECT doc_id AS train_doc, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM hits GROUP BY 1
    """


def _kmv_oracle(k: int = KMV_K, qs: list[float] = KMV_QS) -> str:
    """q105 oracle: deterministic bottom-k by hashed doc_id, then the
    value at 1-based rank floor(q*(n-1))+1 of the value-sorted
    sample."""
    qlist = ", ".join(repr(float(q)) for q in qs)
    return f"""
        WITH s AS (SELECT n_chars, doc_id,
                          CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                   FROM documents ORDER BY h, doc_id LIMIT {k}),
        r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
                     (SELECT COUNT(*) FROM s) AS n FROM s),
        qv AS (SELECT CAST(unnest([{qlist}]) AS DOUBLE) AS q)
        SELECT q, n_chars FROM r JOIN qv ON rn = CAST(floor(q * (n - 1)) AS INT) + 1
    """


def _pq_oracle_sql(
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    sample_max_id: int = PQ_SAMPLE_MAX_ID,
    topk: int = PQ_TOPK,
    dim: int = EMB_DIM,
) -> str:
    """Unrolled q101 oracle: replays operators/pq.py's deterministic
    integer pipeline exactly — shared lattice floor(x*s+0.5) with ONE
    global scale, then `iters` Lloyd steps per subspace (assign =
    row_number over (int L2, codeword idx); update = elementwise
    floor(sum/count); empty cluster keeps its codeword via the LEFT
    JOIN coalesce), then encode-all + per-query LUT + ADC sum. Every
    quantity is an int or an exactly-representable double, so the
    hash-match has zero float-order slack."""
    sub_d = dim // m
    d2 = "list_sum(list_transform(list_zip(t.sv, w.cwv), p -> (p[1]-p[2])*(p[1]-p[2])))"
    parts = [
        f"""
        WITH s AS (
          SELECT 127.0 / max(list_aggregate(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE))), 'max')) AS scale
          FROM embeddings
        ),
        js AS (SELECT unnest(range({m})) AS j),
        dims AS (SELECT unnest(range(1, {sub_d + 1})) AS d),
        allq AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(floor(
                   CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS q
          FROM embeddings, s
        ),
        allsub AS (
          SELECT vec_id, j, list_slice(q, j*{sub_d} + 1, j*{sub_d} + {sub_d}) AS sv
          FROM allq, js
        ),
        samp AS (SELECT * FROM allsub WHERE vec_id < {sample_max_id}),
        cw0 AS (
          SELECT j, c, sv AS cwv FROM (
            SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS c
            FROM samp
          ) WHERE c < {k}
        )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
        d{i} AS (
          SELECT t.vec_id, t.j, t.sv, w.c, {d2} AS d2
          FROM samp t JOIN cw{i - 1} w USING (j)
        ),
        asg{i} AS (
          SELECT vec_id, j, sv, c FROM (
            SELECT vec_id, j, sv, c,
                   row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
            FROM d{i}
          ) WHERE rn = 1
        ),
        up{i} AS (
          SELECT j, c, list(v ORDER BY d) AS newv FROM (
            SELECT j, c, d,
                   CAST(floor(CAST(sum(sv[d]) AS DOUBLE) / count(*)) AS BIGINT) AS v
            FROM asg{i}, dims
            GROUP BY j, c, d
          ) GROUP BY j, c
        ),
        cw{i} AS (
          SELECT w.j, w.c, coalesce(u.newv, w.cwv) AS cwv
          FROM cw{i - 1} w LEFT JOIN up{i} u ON w.j = u.j AND w.c = u.c
        )""")
    parts.append(f""",
        de AS (
          SELECT t.vec_id, t.j, w.c, {d2} AS d2
          FROM allsub t JOIN cw{iters} w USING (j)
        ),
        enc AS (
          SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
            FROM de
          ) WHERE rn = 1
        ),
        lut AS (
          SELECT t.j, w.c, {d2} AS ld
          FROM (SELECT j, sv FROM allsub WHERE vec_id = 0) t
          JOIN cw{iters} w USING (j)
        ),
        scored AS (
          SELECT e.vec_id, sum(l.ld) AS adc_dist
          FROM enc e JOIN lut l ON e.j = l.j AND e.c = l.c
          GROUP BY e.vec_id
        )
        SELECT vec_id, CAST(adc_dist AS BIGINT) AS adc_dist
        FROM scored ORDER BY adc_dist ASC, vec_id ASC LIMIT {topk}""")
    return "".join(parts)


#: Cosine between a row's `embedding` and the query vector `qe` —
#: identical shape to q27's oracle so ordering/rounding parity carries.
_DUCK_COS = """list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""


def _duck_dot(vec_expr: str, lits: list[float]) -> str:
    """DuckDB dot(vec, literal array) with repr-round-trip doubles —
    the same literal text Spark parses in rp_lsh_buckets, so both
    engines multiply identical doubles."""
    arr = ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in lits)
    return (
        f"list_sum(list_transform(list_zip({vec_expr}, [{arr}]), "
        f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
    )


def _duck_sqdist(vec_expr: str, lits: list[float]) -> str:
    """DuckDB squared euclidean distance to a literal centroid
    (mirrors similarity.ivf_assign's aggregate fold)."""
    arr = ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in lits)
    return (
        f"list_sum(list_transform(list_zip({vec_expr}, [{arr}]), "
        f"p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"
    )


def _q26_oracle(bits: int = 60, max_hamming: int = 8) -> str:
    """Exact simhash replication: same md5-derived 60-bit shingle hash
    (dedup.md5_hash60), same per-bit ±1 sums, same bit recombination —
    then an all-pairs hamming filter (the oracle may brute-force what
    the engine pigeonhole-blocks; q26's blocking is exact, see
    dedup.simhash_pairs)."""
    bitsums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    sim = " + ".join(
        f"CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END" for i in range(bits)
    )
    return f"""
        WITH tok AS ({_TOK}),
        h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM tok),
        bsum AS (SELECT doc_id, {bitsums} FROM h GROUP BY doc_id),
        sims AS (SELECT doc_id, {sim} AS s FROM bsum)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sim_a, b.s AS sim_b,
               bit_count(xor(a.s, b.s)) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
    """


def _q29_oracle() -> str:
    """Exact RP-LSH replication: the hyperplanes are seed-deterministic
    (similarity._hyperplanes(EMB_DIM, RP_BITS, RP_SEED)) and embedded
    as literals; the probe set 'buckets within hamming RP_MULTIPROBE of
    the query bucket' is exactly rp_lsh_topk's multiprobe expansion."""
    from block_explorer_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(EMB_DIM, RP_BITS, RP_SEED)
    bucket = " + ".join(
        f"(CASE WHEN {_duck_dot('embedding', p)} > 0 THEN {2**i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
        WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
        q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, round({_DUCK_COS}, 6) AS cosine
        FROM b, q
        WHERE bit_count(xor(bucket::BIGINT, qb::BIGINT)) <= {RP_MULTIPROBE}
        ORDER BY {_DUCK_COS} DESC, vec_id ASC
        LIMIT 10
    """


def _q33_oracle() -> str:
    """Exact IVF replication: the seeded centroids are literals; cell
    assignment is first-position argmin (same tie rule as
    similarity.ivf_assign); the probe set is the 2 centroids nearest
    the query vector (continuous data — tie probability 0)."""
    assert IVF_PROBES == 2, "oracle SQL hardcodes two probe cells"
    cents = Sim.seeded_centroids(EMB_DIM, IVF_CENTROIDS, seed=IVF_SEED, scale=0.125)
    dists = ",".join(_duck_sqdist("embedding", c) for c in cents)
    return f"""
        WITH d AS (SELECT vec_id, embedding, [{dists}] AS dists FROM embeddings),
        a AS (SELECT vec_id, embedding,
                     list_position(dists, list_min(dists)) - 1 AS cid FROM d),
        q AS (SELECT embedding AS qe, dists AS qd FROM d WHERE vec_id = 0),
        p AS (SELECT qe,
                     list_position(qd, list_sort(qd)[1]) - 1 AS p1,
                     list_position(qd, list_sort(qd)[2]) - 1 AS p2 FROM q)
        SELECT vec_id, round({_DUCK_COS}, 6) AS cosine
        FROM a, p
        WHERE a.cid = p.p1 OR a.cid = p.p2
        ORDER BY {_DUCK_COS} DESC, vec_id ASC
        LIMIT 10
    """


def _q88_oracle() -> str:
    """SemDeDup replication: q33's literal-centroid assignment, then
    the within-cluster cosine threshold join and the greedy
    lowest-id-wins keep rule (drop v iff some u < v in v's cluster has
    cos >= SEMDEDUP_TAU)."""
    cents = Sim.seeded_centroids(EMB_DIM, IVF_CENTROIDS, seed=IVF_SEED, scale=0.125)
    dists = ",".join(_duck_sqdist("embedding", c) for c in cents)
    cos_xy = """list_sum(list_transform(list_zip(x.embedding, y.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(x.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
               * sqrt(list_sum(list_transform(y.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))"""
    return f"""
        WITH d AS (SELECT vec_id, embedding, [{dists}] AS dists FROM embeddings),
        a AS (SELECT vec_id, embedding,
                     CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER) AS centroid_id
              FROM d),
        drp AS (SELECT DISTINCT x.vec_id AS v
                FROM a x JOIN a y
                  ON x.centroid_id = y.centroid_id AND y.vec_id < x.vec_id
                WHERE {cos_xy} >= {SEMDEDUP_TAU})
        SELECT vec_id, centroid_id FROM a
        WHERE vec_id NOT IN (SELECT v FROM drp)
    """


def oracle_sql() -> dict[str, str]:
    return {
        "q01_keyset_page": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_returnflag = 'R'
              AND (l_orderkey > 10000 OR (l_orderkey = 10000 AND l_linenumber >= 3))
            ORDER BY l_orderkey, l_linenumber LIMIT 50
        """,
        "q02_range_page": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM (
              SELECT o_orderkey, o_custkey, o_totalprice,
                     row_number() OVER (ORDER BY o_orderkey DESC) AS rn
              FROM orders
              WHERE o_orderkey >= 1000 AND o_orderkey < 40000 AND o_orderstatus = 'F'
            ) WHERE rn > 25 AND rn <= 65
        """,
        "q03_chain_repair": """
            SELECT event_id,
              CASE WHEN lag(event_id) OVER w IS NULL
                     OR lag(event_id) OVER w != event_id - 1
                   THEN -1 ELSE event_id - 1 END AS prev_event_id,
              CASE WHEN lead(event_id) OVER w IS NULL
                     OR lead(event_id) OVER w != event_id + 1
                   THEN -1 ELSE event_id + 1 END AS next_event_id
            FROM events WHERE event_type = 'click'
            WINDOW w AS (ORDER BY event_id)
        """,
        "q04_prefix_hierarchy": """
            SELECT p_partkey, p_brand, p_type FROM part
            WHERE p_type IN ('Brand#11', 'Brand#22') OR p_type LIKE 'PROMO%'
               OR p_brand IN ('Brand#11', 'Brand#22')
        """,
        "q05_in_list": """
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((o_totalprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_totalprice
            FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
            GROUP BY o_orderstatus
        """,
        "q06_point_lookup": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
            FROM lineitem WHERE l_orderkey = 1
        """,
        "q07_counters": """
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_amount,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((o_totalprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS total_spent
            FROM orders GROUP BY o_custkey
        """,
        "q08_minmax_seek": """
            SELECT max(l_shipdate) AS max_shipdate, min(l_orderkey) AS min_orderkey,
                   max(l_extendedprice) AS max_price
            FROM lineitem WHERE l_returnflag = 'A'
        """,
        "q09_topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
        """,
        "q10_union_dedup": """
            SELECT DISTINCT o_custkey FROM (
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
              UNION ALL
              SELECT o_custkey FROM orders WHERE o_totalprice > 300000
            )
        """,
        "q11_exporter_join": """
            SELECT c_custkey, CAST(count(*) AS BIGINT) AS record_amount
            FROM customer JOIN orders ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
            GROUP BY c_custkey
        """,
        "q12_prevnext_link": """
            SELECT o.o_orderkey, o.o_custkey,
                   coalesce(n.o_orderkey, -1) AS next_orderkey
            FROM orders o LEFT JOIN orders n ON n.o_orderkey = o.o_orderkey + 1
            WHERE o.o_custkey <= 50
        """,
        "q13_sessionize": """
            WITH s AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), t AS (
              SELECT user_id,
                sum(is_start) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
              FROM s
            ), ps AS (
              SELECT user_id, session_id, count(*) AS session_events
              FROM t GROUP BY user_id, session_id
            )
            SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
                   CAST(sum(session_events) AS BIGINT) AS n_events,
                   CAST(max(session_events) AS BIGINT) AS max_session_events
            FROM ps GROUP BY user_id
        """,
        "q14_index_format": """
            SELECT concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))
                     AS record_index,
                   CASE WHEN l_returnflag = 'N' THEN '*' ELSE l_returnflag END AS flag_display
            FROM lineitem WHERE l_orderkey <= 200
        """,
        "q15_siblings": """
            SELECT p_partkey, p_size, bin(p_size) AS jet FROM part
            WHERE bin(p_size) IN ('101', '1010', '1011', '10')
        """,
        "q16_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_qty,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_base_price,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q17_tpch_q3": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-03-15'
              AND l_shipdate > TIMESTAMP '1996-03-15'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "q18_tpch_q5": """
            SELECT n_name,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q19_tpch_q6": """
            SELECT CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "q20_dedup_exact": f"""
            SELECT md5(array_to_string({_WORDSET}, ' ')) AS dedup_key,
                   min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count
            FROM documents
            GROUP BY md5(array_to_string({_WORDSET}, ' '))
        """,
        "q21_token_stats": """
            SELECT doc_id,
              CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_computed,
              round(
                list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                        t -> CAST(length(t) AS DOUBLE)))
                / len(regexp_split_to_array(lower(trim(text)), '\\s+')), 4) AS mean_token_len
            FROM documents
        """,
        "q22_langid": f"""
            WITH h AS (
              SELECT doc_id, lang,
                CAST(len(list_intersect({_WORDSET},
                  ['the','and','of','to','is','in','that','with'])) AS BIGINT) AS en_hits,
                CAST(len(list_intersect({_WORDSET},
                  ['der','die','das','und','ist','nicht','ein','mit'])) AS BIGINT) AS de_hits,
                CAST(len(list_intersect({_WORDSET},
                  ['el','la','los','que','es','una','por','como'])) AS BIGINT) AS es_hits,
                CAST(len(list_intersect({_WORDSET},
                  ['le','les','des','est','dans','pour','une','sur'])) AS BIGINT) AS fr_hits,
                CAST(len(list_intersect({_WORDSET},
                  ['de5','shi4','zai4','you3','wo3','ta1','le5','bu4'])) AS BIGINT) AS zh_hits
              FROM documents
            )
            SELECT doc_id, en_hits, de_hits,
              CASE
                WHEN zh_hits > greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'zh'
                WHEN fr_hits > greatest(en_hits, de_hits, es_hits) THEN 'fr'
                WHEN es_hits > greatest(en_hits, de_hits) THEN 'es'
                WHEN de_hits > en_hits THEN 'de'
                WHEN en_hits > 0 THEN 'en'
                ELSE 'und' END AS predicted_lang,
              lang
            FROM h
        """,
        "q23_quality": """
            WITH m AS (
              SELECT doc_id,
                CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS digit_r,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS punct_r,
                list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                        t -> CAST(length(t) AS DOUBLE)))
                  / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mtl
              FROM documents
            )
            SELECT doc_id, round(
                (CASE WHEN n >= 20 THEN 1.0 ELSE n / 20.0 END) * 0.4
              + (1.0 - least(1.0, digit_r * 4)) * 0.2
              + (1.0 - least(1.0, punct_r * 4)) * 0.2
              + (CASE WHEN mtl >= 3 AND mtl <= 12 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
            FROM m
        """,
        "q24_word_jaccard": f"""
            WITH tok AS ({_TOK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
                   CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
                   round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        """,
        # q25's output is the exact-verified pair set (true jaccard >=
        # threshold always holds); LSH recall is 1.0 on the gate corpus
        # (pinned by test), so it equals q24's exact result projected
        # to (id_a, id_b, jaccard).
        "q25_minhash_lsh": f"""
            WITH tok AS ({_TOK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        """,
        "q26_simhash": _q26_oracle(),
        "q29_ann_lsh": _q29_oracle(),
        "q33_ann_ivf": _q33_oracle(),
        "q27_ann_brute": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, round(
              list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
              6) AS cosine
            FROM embeddings, q
            ORDER BY list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
              vec_id ASC
            LIMIT 10
        """,
        "q28_embed_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, round(
              list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
              6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE
              list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              >= 0.3
        """,
        "q30_hash_chain": """
            WITH d AS (
              SELECT CAST(event_id AS VARCHAR) AS jet_id, event_id AS pn,
                     event_id AS h, event_id - 1 AS fp, event_id - 3 AS sp
              FROM events WHERE event_type = 'click'
            )
            SELECT DISTINCT parent_jet_id, parent_pulse_number,
                            child_jet_id, child_pulse_number FROM (
              SELECT p.jet_id AS parent_jet_id, p.pn AS parent_pulse_number,
                     c.jet_id AS child_jet_id, c.pn AS child_pulse_number
              FROM d p JOIN d c ON p.h = c.fp
              UNION ALL
              SELECT p.jet_id, p.pn, c.jet_id, c.pn
              FROM d p JOIN d c ON p.h = c.sp
            )
        """,
        "q31_winnow_fingerprint": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ), w AS (
              SELECT doc_id, list_distinct(list_transform(
                generate_series(1, greatest(len(toks) - 7, 1)),
                i -> md5(array_to_string(toks[i:i+7], ' ')))) AS fps
              FROM t
            )
            SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
                   list_min(fps) AS min_fp
            FROM w
        """,
        "q32_media_features": """
            SELECT doc_id AS media_id, 'text' AS modality,
                   sha256(text) AS payload_sha256,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "q34_count_distinct": """
            SELECT o_orderstatus,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_orderstatus
        """,
        "q35_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "q36_asof_join": """
            SELECT l.event_id, l.user_id,
                   CAST(epoch_us(r.ts) AS BIGINT) AS purchase_ts,
                   round(r.value, 4) AS purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "q37_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
                   round(avg(l_extendedprice), 4) AS avg_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "q38_window_analytics": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS running_total,
                   CAST(rank() OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_rank,
                   coalesce(lag(o_orderkey) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderkey), -1) AS prev_orderkey
            FROM orders WHERE o_custkey <= 100
        """,
        "q39_salted_join": """
            SELECT s_name, CAST(count(*) AS BIGINT) AS n_items,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name
        """,
        "q40_range_join": """
            WITH c AS (
              SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
              FROM events WHERE event_type = 'click'
            ), w AS (
              SELECT user_id AS win_user,
                     CAST(epoch_us(ts) AS BIGINT) AS lo_us,
                     CAST(epoch_us(ts) AS BIGINT) + 3600000000 AS hi_us
              FROM events WHERE event_type = 'purchase'
            )
            SELECT c.event_id, CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(w.win_user) AS BIGINT) AS sum_users
            FROM c JOIN w ON c.ts_us >= w.lo_us AND c.ts_us <= w.hi_us
            GROUP BY c.event_id
        """,
        "q41_correlated_max": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
            WHERE o_totalprice = (
              SELECT max(o2.o_totalprice) FROM orders o2
              WHERE o2.o_custkey = o.o_custkey)
        """,
        "q42_tpch_q13": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey
            ) GROUP BY c_count
        """,
        "q43_tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_quantity) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS sum_qty
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "q44_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        """,
        "q45_setops": """
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
            INTERSECT
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "q46_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                   COUNT(*) AS n_orders,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((o_totalprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS total_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "q47_pivot": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
                   COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
                   COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "q48_gapfill": """
            WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_clicks
                FROM events WHERE event_type = 'click' GROUP BY 1
            ), spine AS (
                SELECT CAST(UNNEST(generate_series(
                    (SELECT MIN(day) FROM daily),
                    (SELECT MAX(day) FROM daily),
                    INTERVAL 1 DAY)) AS DATE) AS day
            )
            SELECT spine.day AS day, COALESCE(daily.n_clicks, 0) AS n_clicks
            FROM spine LEFT JOIN daily ON spine.day = daily.day
        """,
        "q49_exists": """
            SELECT o_orderpriority, COUNT(*) AS n_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "q50_scalar_subquery": """
            SELECT c_nationkey, COUNT(*) AS n_cust,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((c_acctbal) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS total_bal
            FROM customer c
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
            GROUP BY c_nationkey
        """,
        "q51_promo_share": """
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   ROUND(100 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END)
                         / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "q52_topk_per_group": """
            SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
                FROM orders) WHERE rk <= 3
        """,
        "q53_returned_revenue": """
            SELECT c_custkey, c_name, n_name,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q54_json_extract": """
            SELECT event_type, COUNT(*) AS n_events,
                   SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
                   MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "q55_train_split": """
            SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, COUNT(*) AS n_docs
            FROM (SELECT lang,
                         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b
                  FROM documents)
            GROUP BY 1, 2
        """,
        "q56_seq_packing": """
            WITH toks AS (
                SELECT lang, doc_id,
                       CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
                FROM documents
            ), running AS (
                SELECT lang, doc_id, n_tokens,
                       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                             - n_tokens) / 4096.0) AS BIGINT) AS pack_id
                FROM toks
            )
            SELECT lang, pack_id, COUNT(*) AS n_docs, SUM(n_tokens) AS pack_tokens
            FROM running GROUP BY lang, pack_id
        """,
        "q57_tpch_q7": """
            SELECT supp_nation, cust_nation, l_year, CAST(ROUND(CAST(SUM(CAST(FLOOR((volume) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
                       l_extendedprice * (1 - l_discount) AS volume
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
            )
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "q58_tpch_q8": """
            SELECT o_year,
                   ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                         / SUM(volume), 6) AS mkt_share,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((volume) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS total_volume
            FROM (
                SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
            )
            GROUP BY o_year
        """,
        "q59_tpch_q12": """
            SELECT l_linestatus,
                   SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS high_line_count,
                   SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY l_linestatus
        """,
        "q60_tpch_q15": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """,
        "q61_tpch_q17": """
            WITH thresholds AS (
                SELECT l_partkey AS t_partkey,
                       ROUND(0.2 * AVG(l_quantity), 6) AS qty_threshold
                FROM lineitem GROUP BY l_partkey
            )
            SELECT p_brand,
                   ROUND(CAST(CAST(SUM(CAST(FLOOR((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)) AS DOUBLE) / 7.0, 2) AS avg_yearly,
                   COUNT(*) AS n_lines
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN thresholds ON l_partkey = t_partkey
            WHERE p_brand IN ('Brand#11', 'Brand#23')
              AND l_quantity < qty_threshold
            GROUP BY p_brand
        """,
        "q62_tpch_q19": """
            SELECT CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q63_tpch_q21": """
            WITH ordsupp AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
                FROM lineitem GROUP BY l_orderkey, l_suppkey
            ), ords AS (
                SELECT l_orderkey, COUNT(*) AS n_supp, SUM(failed) AS n_failed
                FROM ordsupp GROUP BY l_orderkey
            )
            SELECT s_name, COUNT(*) AS numwait
            FROM ordsupp
            JOIN ords USING (l_orderkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE failed = 1 AND n_supp > 1 AND n_failed = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 20
        """,
        "q64_text_clean": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS chars_before,
                   CAST(SUM(length(regexp_replace(regexp_replace(
                        lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
                        ' +', ' ', 'g'))) AS BIGINT) AS chars_after
            FROM documents
            GROUP BY lang
        """,
        "q65_vocab_topk": """
            SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
                  FROM documents)
            WHERE length(token) >= 2
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 50
        """,
        "q66_decontaminate": """
            WITH t AS (
                SELECT doc_id,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ), fps AS (
                SELECT doc_id, b, unnest(list_distinct(list_transform(
                         generate_series(1, greatest(len(toks) - 7, 1)),
                         i -> md5(array_to_string(toks[i:i+7], ' '))))) AS fp
                FROM t
            )
            SELECT te.doc_id AS test_doc,
                   CAST(COUNT(DISTINCT te.fp) AS BIGINT) AS n_shared_shingles,
                   CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs
            FROM fps te JOIN fps tr ON te.fp = tr.fp AND tr.b < 8
            WHERE te.b = 9
            GROUP BY te.doc_id
        """,
        "q67_length_filter": """
            WITH bounds AS (
                SELECT lang AS b_lang,
                       ROUND(quantile_cont(length(text), 0.05), 6) AS lo,
                       ROUND(quantile_cont(length(text), 0.95), 6) AS hi
                FROM documents GROUP BY lang
            )
            SELECT lang, COUNT(*) AS n_kept,
                   CAST(MIN(length(text)) AS BIGINT) AS min_len,
                   CAST(MAX(length(text)) AS BIGINT) AS max_len
            FROM documents JOIN bounds ON lang = b_lang
            WHERE length(text) BETWEEN lo AND hi
            GROUP BY lang
        """,
        "q68_tpch_q2": """
            WITH eu_supp AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'
            ), cost AS (
                SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                       ROUND(MIN(l_extendedprice / l_quantity), 6) AS unit_cost
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN eu_supp ON l_suppkey = s_suppkey
                WHERE p_type = 'LARGE' AND p_size <= 10
                GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
            FROM cost
            WHERE unit_cost = (SELECT MIN(unit_cost) FROM cost c2
                               WHERE c2.p_partkey = cost.p_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "q69_tpch_q4": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q70_tpch_q9": f"""
            SELECT nation, o_year, {_money_sum_sql('amount')} AS sum_profit
            FROM (
                SELECT n_name AS nation,
                       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
                       l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity AS amount
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN orders   ON l_orderkey = o_orderkey
                WHERE p_name LIKE '%bolt%'
            )
            GROUP BY nation, o_year
        """,
        "q71_tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q72_tpch_q11": """
            WITH per_part AS (
                SELECT l_partkey, CAST(ROUND(CAST(SUM(CAST(FLOOR((l_extendedprice) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS part_value
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_5'
                GROUP BY l_partkey
            )
            SELECT l_partkey, part_value
            FROM per_part
            WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM per_part)
            ORDER BY part_value DESC, l_partkey ASC
        """,
        "q73_tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_type NOT LIKE 'PROMO%'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q74_tpch_q20": """
            WITH red AS (
                SELECT l_partkey, l_suppkey, l_quantity
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'red%'
                  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
            ), per_ps AS (
                SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
                FROM red GROUP BY l_partkey, l_suppkey
            ), per_part AS (
                SELECT l_partkey, SUM(l_quantity) AS part_qty
                FROM red GROUP BY l_partkey
            )
            SELECT s_suppkey, s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_2'
              AND EXISTS (SELECT 1 FROM per_ps JOIN per_part USING (l_partkey)
                          WHERE per_ps.l_suppkey = s_suppkey
                            AND supp_qty > 0.5 * part_qty)
            ORDER BY s_suppkey
        """,
        "q75_tpch_q22": """
            WITH sel AS (
                SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
                FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7)
            )
            SELECT CAST(cntrycode AS BIGINT) AS cntrycode,
                   COUNT(*) AS numcust,
                   CAST(ROUND(CAST(SUM(CAST(FLOOR((c_acctbal) * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4)) * CAST(0.0001 AS DECIMAL(8,4)), 2) AS DOUBLE) AS totacctbal
            FROM sel
            WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 6) FROM sel WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderdate >= DATE '1999-01-01')
            GROUP BY cntrycode
            ORDER BY cntrycode
        """,
        "q76_repetition": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id,
                       toks AS g1,
                       list_transform(generate_series(1, greatest(len(toks) - 1, 1)),
                                      i -> array_to_string(toks[i:i+1], ' ')) AS g2,
                       list_transform(generate_series(1, greatest(len(toks) - 2, 1)),
                                      i -> array_to_string(toks[i:i+2], ' ')) AS g3
                FROM t
            )
            SELECT doc_id,
                   round(1.0 - len(list_distinct(g1)) / CAST(len(g1) AS DOUBLE), 6) AS dup_word_frac,
                   round(1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 6) AS dup_2gram_frac,
                   round(1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 6) AS dup_3gram_frac
            FROM g
        """,
        "q77_stratified_sample": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                  < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 WHEN 'es' THEN 25
                              WHEN 'fr' THEN 100 WHEN 'zh' THEN 4 ELSE 0 END
            GROUP BY lang
        """,
        "q78_uniform_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 50
        """,
        "q79_pii_scrub": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(len(regexp_extract_all(props, '[0-9]{2,}'))) AS BIGINT) AS digit_hits,
                   CAST(SUM(length(props)) AS BIGINT) AS bytes_before,
                   CAST(SUM(length(
                       regexp_replace(regexp_replace(regexp_replace(props,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                           '\\+?[0-9][0-9() .-]{7,}[0-9]', '[PHONE]', 'g'),
                           '[0-9]{2,}', '[DIGITS]', 'g')
                   )) AS BIGINT) AS bytes_after
            FROM events
            GROUP BY event_type
        """,
        "q80_domain_stats": """
            SELECT regexp_extract(
                     lower(trim('https://www.' || source || '.example.com:443/d/'
                                || CAST(doc_id AS VARCHAR))),
                     '^(?:[a-z][a-z0-9+.-]*://)?(?:www\\.)?([^/:?#]+)', 1) AS domain,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY domain
        """,
        "q81_quantized_ann": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            qq AS (
                SELECT list_transform(qe, x -> CAST(floor(
                         CAST(x AS DOUBLE) * (127.0 / qmax) + 0.5) AS BIGINT)) AS qcodes
                FROM (SELECT qe, list_aggregate(list_transform(qe,
                        x -> abs(CAST(x AS DOUBLE))), 'max') AS qmax FROM q)
            ),
            rowq AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(floor(
                         CAST(x AS DOUBLE) * (127.0 / amax) + 0.5) AS BIGINT)) AS codes
                FROM (SELECT vec_id, embedding, list_aggregate(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE))), 'max') AS amax FROM embeddings)
            ),
            scored AS (
                SELECT vec_id,
                       list_sum(list_transform(list_zip(codes, qcodes), p -> p[1] * p[2])) AS dot,
                       list_sum(list_transform(codes, x -> x * x)) AS n1,
                       list_sum(list_transform(qcodes, x -> x * x)) AS n2
                FROM rowq, qq
            )
            SELECT vec_id,
                   round(CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))), 6) AS qcosine
            FROM scored
            ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) DESC,
                     vec_id ASC
            LIMIT 10
        """,
        "q82_containment": f"""
            WITH tok AS ({_TOK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
                   CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
                   round(CAST(i AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / least(sa.sz, sb.sz) >= 0.62
        """,
        # MATERIALIZED on tok/pairs is capacity, not semantics: DuckDB
        # inlines plain CTEs per reference, so `e`'s two selects from
        # `pairs` ran the whole tok-self-join pipeline TWICE
        # concurrently — at sf1 that doubled ~70 GB of temp and filled
        # the disk (r9 and the first r10 sf1 run both died there).
        # Materialized, the pair stage runs once (q24's identical
        # stage: 270 s at sf1) and the recursion sees ~2.5k rows.
        "q83_dedup_clusters": f"""
            WITH RECURSIVE tok AS MATERIALIZED ({_TOK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS MATERIALIZED (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
            ),
            e AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION
              SELECT id_b AS u, id_a AS v FROM pairs
            ),
            r AS (
              SELECT DISTINCT u AS vx, u AS reach FROM e
              UNION
              SELECT r.vx, e.v AS reach FROM r JOIN e ON r.reach = e.u
            ),
            comp AS (SELECT vx AS doc_id, MIN(reach) AS cluster_id FROM r GROUP BY vx),
            cnt AS (SELECT cluster_id AS c2, COUNT(*) AS n_members FROM comp GROUP BY cluster_id)
            SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical,
                   CAST(n_members AS BIGINT) AS n_members
            FROM comp JOIN cnt ON cluster_id = c2
        """,
        "q84_window_frames": """
            SELECT o_custkey, o_orderkey,
                   ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_3,
                   ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING), 6) AS run_sum,
                   COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar_price
            FROM orders
            WHERE o_custkey < 50
        """,
        # The sketch VALUES aren't engine-portable; the CONTRACT is:
        # exact aggregates + within-tolerance booleans. A sketch
        # drifting past its bound flips a boolean and fails the hash.
        "q85_approx_contract": """
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS hll_within_5pct,
                   ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
                   TRUE AS p50_within_5pct
            FROM events
            GROUP BY event_type
        """,
        "q86_corpus_pipeline": f"""
            WITH toks AS (
                SELECT doc_id, lang, text,
                       len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ntok,
                       1.0 - len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))
                           / CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS dupfrac
                FROM documents
            ),
            kept AS (SELECT * FROM toks WHERE ntok >= 20 AND dupfrac <= 0.3),
            fpd AS (
                SELECT doc_id, lang, ntok,
                       md5(array_to_string({_WORDSET}, ' ')) AS fp
                FROM kept
            ),
            winners AS (SELECT fp, MIN(doc_id) AS keep_id FROM fpd GROUP BY fp),
            canon AS (
                SELECT fpd.* FROM fpd JOIN winners
                ON fpd.fp = winners.fp AND fpd.doc_id = winners.keep_id
            ),
            sampled AS (
                SELECT * FROM canon
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                      < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 100 WHEN 'es' THEN 100
                                  WHEN 'fr' THEN 100 WHEN 'zh' THEN 50 ELSE 0 END
            )
            SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
                   lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS total_tokens,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum
            FROM (
                SELECT lang, ntok, doc_id,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10 AS b
                FROM sampled
            )
            GROUP BY split, lang
        """,
        "q87_table_profile": """
            SELECT 'doc_id' AS "column",
                   CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                   CAST(MIN(doc_id) AS VARCHAR) AS min_repr,
                   CAST(MAX(doc_id) AS VARCHAR) AS max_repr
            FROM documents
            UNION ALL
            SELECT 'lang', CAST(COUNT(*) - COUNT(lang) AS BIGINT),
                   CAST(COUNT(DISTINCT lang) AS BIGINT),
                   MIN(lang), MAX(lang) FROM documents
            UNION ALL
            SELECT 'source', CAST(COUNT(*) - COUNT(source) AS BIGINT),
                   CAST(COUNT(DISTINCT source) AS BIGINT),
                   MIN(source), MAX(source) FROM documents
            UNION ALL
            SELECT 'n_chars', CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
                   CAST(COUNT(DISTINCT n_chars) AS BIGINT),
                   CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
            FROM documents
        """,
        "q88_semantic_dedup": _q88_oracle(),
        "q89_temperature_mixture": f"""
            WITH c AS (SELECT lang AS s, count(*) AS n_s FROM documents GROUP BY lang),
            m AS (SELECT min(n_s) AS n_min FROM c),
            r AS (SELECT s, floor(10000 * sqrt(CAST(n_min AS DOUBLE) / n_s)) AS rate
                  FROM c, m)
            SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum
            FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.s
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 < rate
            GROUP BY lang
        """,
        # The oracle computes the SAME greedy budget prefix with the
        # naive global window the distributed two-level form replaces.
        "q90_token_budget_select": f"""
            WITH m AS (
              SELECT doc_id,
                CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS digit_r,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS punct_r,
                list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                        t -> CAST(length(t) AS DOUBLE)))
                  / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mtl
              FROM documents
            ),
            scored AS (
              SELECT doc_id, round(
                  (CASE WHEN n >= 20 THEN 1.0 ELSE n / 20.0 END) * 0.4
                + (1.0 - least(1.0, digit_r * 4)) * 0.2
                + (1.0 - least(1.0, punct_r * 4)) * 0.2
                + (CASE WHEN mtl >= 3 AND mtl <= 12 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
                CAST(n AS BIGINT) AS ntok
              FROM m
            ),
            o AS (
              SELECT doc_id, quality, ntok,
                     sum(ntok) OVER (ORDER BY quality DESC, doc_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS cum
              FROM scored
            )
            SELECT doc_id, quality, ntok, CAST(cum AS BIGINT) AS cum_weight
            FROM o WHERE cum <= {TOKEN_BUDGET}
        """,
        "q91_crossdoc_ngrams": """
            WITH tok AS (SELECT doc_id, unnest(list_distinct(list_transform(
                generate_series(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 4, 1)),
                i -> array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[i:i+4], ' ')))) AS sh
              FROM documents),
            dfc AS (SELECT sh, count(*) AS c FROM tok GROUP BY sh)
            SELECT t.doc_id, count(*) AS n_shingles,
                   CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                   round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS shared_frac
            FROM tok t JOIN dfc USING (sh) GROUP BY t.doc_id
        """,
        # Bigram pairs use 1-based DuckDB indexing (toks[i], toks[i+1],
        # i in 1..len-1) = Spark's 0-based (toks[i-1], toks[i]); V is
        # the same scalar the Spark side collects at model build.
        "q92_lm_perplexity": f"""
            WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                       FROM documents),
            bg AS (
              SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
                SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                                        i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
                FROM t WHERE len(toks) >= 2
              )
            ),
            uni AS (
              SELECT w1, count(*) AS cu
              FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY w1
            ),
            big AS (
              SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2
            ),
            v AS (SELECT count(*) AS V FROM uni)
            SELECT bg.doc_id, count(*) AS n_bigrams,
                   round(avg(-ln((cb + {LM_K}) / (cu + {LM_K} * V))), 6) AS avg_nll
            FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1), v
            GROUP BY bg.doc_id
        """,
        "q93_oov_rate": f"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
              FROM documents
            ),
            vocab AS (
              SELECT w FROM (SELECT w, count(*) AS n FROM tok GROUP BY w
                             ORDER BY n DESC, w ASC LIMIT {VOCAB_TOP})
            )
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   round(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS oov_frac
            FROM tok LEFT JOIN vocab v USING (w)
            GROUP BY doc_id
        """,
        # q83's recursive-CTE closure + q23's quality formula; the
        # survivor is row 1 of the (quality desc, doc_id asc) window.
        "q94_quality_survivors": f"""
            WITH RECURSIVE tok AS ({_TOK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
            ),
            e AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION
              SELECT id_b AS u, id_a AS v FROM pairs
            ),
            r AS (
              SELECT DISTINCT u AS vx, u AS reach FROM e
              UNION
              SELECT r.vx, e.v AS reach FROM r JOIN e ON r.reach = e.u
            ),
            comp AS (SELECT vx AS doc_id, MIN(reach) AS cluster_id FROM r GROUP BY vx),
            m AS (
              SELECT doc_id,
                CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS digit_r,
                CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END AS punct_r,
                list_sum(list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                        t -> CAST(length(t) AS DOUBLE)))
                  / len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS mtl
              FROM documents
            ),
            qual AS (
              SELECT doc_id, round(
                  (CASE WHEN n >= 20 THEN 1.0 ELSE n / 20.0 END) * 0.4
                + (1.0 - least(1.0, digit_r * 4)) * 0.2
                + (1.0 - least(1.0, punct_r * 4)) * 0.2
                + (CASE WHEN mtl >= 3 AND mtl <= 12 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
              FROM m
            )
            SELECT c.doc_id, c.cluster_id, q.quality,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY q.quality DESC, c.doc_id ASC) = 1
                     AS is_survivor
            FROM comp c JOIN qual q USING (doc_id)
        """,
        # The oracle replays the full windowed-hash ExactSubstr pass:
        # same tokenizer, same md5-prefix window key, same first-
        # occurrence survivor rule, same gaps-and-islands span merge.
        "q95_exact_substring_dedup": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
              FROM documents
            ),
            w AS (
              SELECT doc_id, i AS pos,
                     substr(md5(array_to_string(toks[i+1:i+{SUBSTR_W}], ' ')), 1, 16) AS whash
              FROM t, UNNEST(range(len(toks) - {SUBSTR_W - 1})) AS u(i)
              WHERE len(toks) >= {SUBSTR_W}
            ),
            ranked AS (
              SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY whash ORDER BY doc_id, pos) AS rn,
                     count(*) OVER (PARTITION BY whash) AS occ
              FROM w
            ),
            marked AS (SELECT doc_id, pos FROM ranked WHERE occ >= 2 AND rn > 1),
            isl AS (
              SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(max(pos + {SUBSTR_W}) OVER (
                              PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                          THEN 1 ELSE 0 END AS new_isl
              FROM marked
            ),
            isl2 AS (
              SELECT doc_id, pos,
                     sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
              FROM isl
            ),
            spans AS (
              SELECT doc_id, span_id, min(pos) AS s, max(pos) + {SUBSTR_W} AS e
              FROM isl2 GROUP BY doc_id, span_id
            ),
            per_doc AS (
              SELECT doc_id, count(*) AS n_spans,
                     CAST(sum(e - s) AS BIGINT) AS n_removed
              FROM spans GROUP BY doc_id
            ),
            keep AS (
              SELECT t.doc_id, u.i AS pos, t.toks[u.i + 1] AS tok
              FROM t, UNNEST(range(len(t.toks))) AS u(i)
              WHERE t.doc_id IN (SELECT doc_id FROM per_doc)
                AND NOT EXISTS (SELECT 1 FROM spans s
                                WHERE s.doc_id = t.doc_id
                                  AND u.i >= s.s AND u.i < s.e)
            ),
            cleaned AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ctext
              FROM keep GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(len(t.toks) AS INTEGER) AS n_tokens,
                   p.n_spans, p.n_removed,
                   substr(md5(coalesce(c.ctext, '')), 1, 16) AS cleaned_hash
            FROM per_doc p
            JOIN t USING (doc_id)
            LEFT JOIN cleaned c USING (doc_id)
        """,
        "q96_bpe_tokenize": _q96_oracle(),
        "q97_bpe_budget_select": _q97_oracle(),
        # dHash bits recomputed straight from the shared pixel
        # definition; brute-force pair join (the engine's blocking is
        # exact, so the sets must agree).
        "q98_perceptual_dedup": f"""
            WITH px AS (
              SELECT doc_id, list_transform(range(0, 72), i ->
                (('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR) || ':' ||
                                     CAST(i AS VARCHAR)), 1, 2))::INT
                 + CASE WHEN i = doc_id % 72
                        THEN CAST(doc_id % 97 AS INT) ELSE 0 END) % 256) AS p
              FROM documents
            ),
            bits AS (
              SELECT doc_id, list_transform(range(0, 64), k ->
                CASE WHEN p[(k // 8) * 9 + (k % 8) + 1] >
                          p[(k // 8) * 9 + (k % 8) + 2]
                     THEN 1 ELSE 0 END) AS b
              FROM px
            )
            SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                   CAST(len(list_filter(range(1, 65),
                        k -> a.b[k] <> c.b[k])) AS INTEGER) AS hamming
            FROM bits a JOIN bits c ON a.doc_id < c.doc_id
            WHERE len(list_filter(range(1, 65), k -> a.b[k] <> c.b[k]))
                  <= {PHASH_MAX_HAMMING}
        """,
        # q99: full replay of the audio chain. The PCM quantization is
        # exact in integer form: v = (byte-128)/128 is exact in
        # float32, and v*32767 has significand (byte-128)*32767 <
        # 2^23, so the float32 product is exact and the int16 cast is
        # trunc((byte-128)*32767/128); wav_decode's /32768 and the
        # fingerprint's round(s*32768) round-trip it. Band energies
        # and delta-sign bits are pure int64 — no float summation
        # order to disagree about.
        "q99_audio_dedup": f"""
            WITH raw AS (
              SELECT doc_id, list_transform(range(0, 128), i ->
                (('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR) || ':' ||
                                     CAST(i AS VARCHAR)), 1, 2))::INT
                 + CASE WHEN i = doc_id % 128
                        THEN CAST(doc_id % 97 AS INT) ELSE 0 END) % 256) AS b
              FROM documents
            ),
            pcm AS (
              SELECT doc_id, list_transform(b, v ->
                CAST(trunc(((v - 128) * 32767.0) / 128.0) AS BIGINT)) AS p
              FROM raw
            ),
            en AS (
              SELECT doc_id, list_transform(range(0, 64), k ->
                list_aggregate(list_transform(
                  range((k // 4) * 8, (k // 4) * 8 + 8), i ->
                    CASE k % 4
                      WHEN 0 THEN p[i + 1] * p[i + 1]
                      WHEN 1 THEN CASE WHEN i >= 1
                        THEN (p[i + 1] - p[i]) * (p[i + 1] - p[i])
                        ELSE 0 END
                      WHEN 2 THEN CASE WHEN i >= 2
                        THEN (p[i + 1] - 2 * p[i] + p[i - 1])
                           * (p[i + 1] - 2 * p[i] + p[i - 1])
                        ELSE 0 END
                      ELSE CASE WHEN i >= 3
                        THEN (p[i + 1] - 3 * p[i] + 3 * p[i - 1] - p[i - 2])
                           * (p[i + 1] - 3 * p[i] + 3 * p[i - 1] - p[i - 2])
                        ELSE 0 END
                    END), 'sum')) AS e
              FROM pcm
            ),
            bits AS (
              SELECT doc_id, list_transform(range(0, 64), k ->
                CASE WHEN e[k + 1] >
                          e[(((k // 4) + 15) % 16) * 4 + (k % 4) + 1]
                     THEN 1 ELSE 0 END) AS b
              FROM en
            ),
            -- fold the bit list into two 32-bit halves ONCE per doc so
            -- the brute-force O(n^2) pairing evaluates one vectorized
            -- bit_count(xor(..)) per pair instead of a 64-step list
            -- lambda (the lambda form was ~1000x slower per pair and
            -- made the 1.25e9-pair sf1 oracle run infeasible)
            fp AS (
              SELECT doc_id,
                     list_aggregate(list_transform(range(0, 32), k ->
                       b[k + 1] * (1::BIGINT << k)), 'sum') AS lo,
                     list_aggregate(list_transform(range(0, 32), k ->
                       b[k + 33] * (1::BIGINT << k)), 'sum') AS hi
              FROM bits
            )
            SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                   CAST(bit_count(xor(a.lo, c.lo))
                      + bit_count(xor(a.hi, c.hi)) AS INTEGER) AS hamming
            FROM fp a JOIN fp c ON a.doc_id < c.doc_id
            WHERE bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi))
                  <= {AFP_MAX_HAMMING}
        """,
        # q100: per-frame replay of the q98 dHash bit recipe keyed by
        # (group, frame, pixel), then the all-slots pairing rule.
        "q100_video_dedup": f"""
            WITH px AS (
              SELECT doc_id, k, list_transform(range(0, 72), i ->
                (('0x' || substr(md5(CAST(doc_id // 10 AS VARCHAR) || ':' ||
                                     CAST(k AS VARCHAR) || ':' ||
                                     CAST(i AS VARCHAR)), 1, 2))::INT
                 + CASE WHEN i = doc_id % 72
                        THEN CAST((doc_id + k) % 97 AS INT) ELSE 0 END) % 256) AS p
              FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS k)
            ),
            bits AS (
              SELECT doc_id, k, list_transform(range(0, 64), j ->
                CASE WHEN p[(j // 8) * 9 + (j % 8) + 1] >
                          p[(j // 8) * 9 + (j % 8) + 2]
                     THEN 1 ELSE 0 END) AS b
              FROM px
            ),
            -- same per-doc bit fold as q99's oracle: two 32-bit halves,
            -- one vectorized bit_count(xor(..)) per pair per slot
            fp AS (
              SELECT doc_id, k,
                     list_aggregate(list_transform(range(0, 32), j ->
                       b[j + 1] * (1::BIGINT << j)), 'sum') AS lo,
                     list_aggregate(list_transform(range(0, 32), j ->
                       b[j + 33] * (1::BIGINT << j)), 'sum') AS hi
              FROM bits
            ),
            slot AS (
              SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                     bit_count(xor(a.lo, c.lo))
                   + bit_count(xor(a.hi, c.hi)) AS h
              FROM fp a JOIN fp c ON a.doc_id < c.doc_id AND a.k = c.k
            )
            SELECT id_a, id_b, CAST(max(h) AS INTEGER) AS hamming
            FROM slot GROUP BY id_a, id_b
            HAVING max(h) <= {VHASH_MAX_HAMMING}
        """,
        "q101_pq_adc": _pq_oracle_sql(),
        "q102_hll_distinct": _hll_oracle(),
        "q103_cms_heavy_hitters": _cms_oracle(),
        "q104_bloom_decontam": _bloom_oracle(),
        "q105_kmv_quantiles": _kmv_oracle(),
        # q106's oracle is the PLAIN join: the bloom prefilter is
        # certified result-preserving, not re-implemented in SQL.
        "q106_bloom_join": """
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem
            JOIN (SELECT o_orderkey FROM orders
                  WHERE o_orderpriority = '1-URGENT') o
              ON l_orderkey = o_orderkey
            GROUP BY l_returnflag
        """,
        "q107_window_distinct": _window_distinct_oracle(),
        "q108_rollup_agg": """
            SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                   o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "q109_moving_peak": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) * 1000 AS tsn,
                     CAST(ROUND(value * 1000) AS BIGINT) AS mv
              FROM events
            ),
            r AS (
              SELECT user_id,
                     COUNT(*) OVER (PARTITION BY user_id ORDER BY tsn
                       RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) AS c1h,
                     SUM(mv) OVER (PARTITION BY user_id ORDER BY tsn
                       RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) AS s1h
              FROM e
            )
            SELECT user_id, CAST(MAX(c1h) AS BIGINT) AS peak_1h_events,
                   CAST(MAX(s1h) AS BIGINT) AS peak_1h_mvalue
            FROM r GROUP BY user_id
        """,
        "q110_cms_watchlist": _cms_watchlist_oracle(),
        "q111_zorder_box": """
            SELECT event_id, user_id,
                   CAST(ROUND(value * 1000) AS BIGINT) AS mv
            FROM events
            WHERE user_id BETWEEN 10 AND 80
              AND CAST(ROUND(value * 1000) AS BIGINT) BETWEEN 5000 AND 200000
        """,
        "q112_kmv_set_algebra": _kmv_set_oracle(),
        "q113_bm25_search": _bm25_oracle(),
        "q114_funnel": """
            WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY e.user_id)
            SELECT CAST(1 AS BIGINT) AS step, COUNT(*) AS users FROM s1
            UNION ALL
            SELECT CAST(2 AS BIGINT), COUNT(*) FROM s2
            UNION ALL
            SELECT CAST(3 AS BIGINT), COUNT(*) FROM s3
        """,
        "q115_cohort_retention": """
            WITH first AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
                           FROM events GROUP BY user_id)
            SELECT cohort_day,
                   CAST(datediff('day', cohort_day, CAST(ts AS DATE)) // 7
                        AS BIGINT) AS week_offset,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
            FROM events e JOIN first USING (user_id)
            GROUP BY 1, 2
        """,
        "q116_pagerank": _pagerank_oracle(),
        "q117_segment_drift": """
            WITH toks AS (
              SELECT lang AS seg,
                     unnest(list_filter(
                       regexp_split_to_array(lower(trim(text)), '\\s+'),
                       t -> t <> '')) AS token
              FROM documents WHERE lang IN ('en', 'de')
            ),
            counts AS (
              SELECT token,
                     SUM(CASE WHEN seg = 'en' THEN 1 ELSE 0 END) AS a,
                     SUM(CASE WHEN seg = 'de' THEN 1 ELSE 0 END) AS b
              FROM toks GROUP BY token
            ),
            tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM counts)
            SELECT token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                   CAST(((a * nb - b * na) * (a * nb - b * na))
                        // ((a + b) * na * nb) AS BIGINT) AS drift
            FROM counts, tot
            ORDER BY drift DESC, token ASC
            LIMIT 15
        """,
        "q118_phrase_search": _phrase_oracle(),
        "q130_phrase_indexed": _phrase_oracle(),
        "q144_phrase_many": _phrase_many_oracle(MANYP_PHRASES),
        "q145_ppr": _ppr_oracle(),
        "q131_proximity_indexed": _proximity_oracle(),
        "q132_prefix_vocab": _positional_sql("""
            SELECT token,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                   CAST(COUNT(*) AS BIGINT) AS cf
            FROM p
            WHERE token LIKE 's%'
            GROUP BY token
        """),
        "q120_bm25_indexed": _bm25_oracle(),
        "q121_bm25_incremental": _bm25_oracle(),
        "q140_bm25_deleted": _bm25_oracle(
            where=f"doc_id % {DEL_MOD} <> {DEL_REM}"
        ),
        "q141_index_cdc": _bm25_live_corpus_oracle(),
        "q142_hybrid_indexed": _hybrid_oracle(),
        "q143_min_window": _positional_sql(f"""
            SELECT a.doc_id,
                   CAST(MIN(greatest(a.pos, b.pos, c.pos)
                            - least(a.pos, b.pos, c.pos) + 1) AS BIGINT)
                     AS min_window
            FROM p a
            JOIN p b ON a.doc_id = b.doc_id
            JOIN p c ON a.doc_id = c.doc_id
            WHERE a.token = '{MINWIN_TERMS[0]}'
              AND b.token = '{MINWIN_TERMS[1]}'
              AND c.token = '{MINWIN_TERMS[2]}'
            GROUP BY a.doc_id
        """),
        "q124_bm25_maxscore": _bm25_oracle(
            terms=MAXSCORE_TERMS, topk=MAXSCORE_TOPK
        ),
        "q126_hybrid_search": _hybrid_oracle(),
        "q128_bm25_many": _bm25_many_oracle(),
        "q129_bm25_many_indexed": _bm25_many_oracle(),
        "q149_doc_keywords": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)),
                                 '\\s+'), t -> t <> '') AS tk
              FROM documents
            ),
            post AS (
              SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(tk) AS token FROM toks)
              GROUP BY doc_id, token
            ),
            dfs AS (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM post GROUP BY token
            ),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM documents),
            scored AS (
              SELECT post.doc_id, post.token,
                     CAST(tf AS DOUBLE) * (SELECT nn FROM n)
                       / CAST(df AS DOUBLE) AS score
              FROM post JOIN dfs ON post.token = dfs.token
            ),
            r AS (
              SELECT doc_id, token, score,
                     row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, token ASC) AS rn
              FROM scored
            )
            SELECT doc_id, token, score FROM r WHERE rn <= {KW_TOPK}
        """,
        "q148_hybrid_many": " UNION ALL ".join(
            f"({_hybrid_oracle(terms=ts, qvec_id=v, tag=qid)})"
            for qid, (ts, v) in sorted(HMANY_QUERIES.items())
        ),
        "q147_ann_many": " UNION ALL ".join(
            f"""(
            WITH q AS (SELECT embedding AS qe FROM embeddings
                       WHERE vec_id = {i})
            SELECT 'v{i}' AS query_id, vec_id, round(
              list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
              6) AS cosine
            FROM embeddings, q
            ORDER BY list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
              vec_id ASC
            LIMIT {FANN_K})"""
            for i in VMANY_IDS
        ),
        "q146_ann_deleted": f"""
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, round(
              list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
              6) AS cosine
            FROM embeddings, q
            WHERE vec_id % {VDEL_MOD} <> {VDEL_REM}
            ORDER BY list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
              vec_id ASC
            LIMIT {FANN_K}
        """,
        "q127_filtered_ann": f"""
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, round(
              list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
              6) AS cosine
            FROM embeddings, q
            WHERE label = {FANN_LABEL}
            ORDER BY list_sum(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
              vec_id ASC
            LIMIT {FANN_K}
        """,
        "q125_quantile_sketch": f"""
            WITH cents AS (
              SELECT l_returnflag AS flag,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem
            ),
            bucketed AS (
              SELECT flag,
                     CASE WHEN v <= 0 THEN -1 ELSE
                       (length(bin(v)) - 1) * 64
                       + CAST((v::HUGEINT * 64)
                              // ((1::BIGINT << (length(bin(v)) - 1))::HUGEINT)
                              AS BIGINT) - 64
                     END AS bucket
              FROM cents
            ),
            state AS (
              SELECT flag, bucket, COUNT(*) AS cnt
              FROM bucketed GROUP BY flag, bucket
            ),
            cdf AS (
              SELECT flag, bucket,
                     SUM(cnt) OVER (PARTITION BY flag ORDER BY bucket) AS cum,
                     SUM(cnt) OVER (PARTITION BY flag) AS n
              FROM state
            ),
            probs AS (
              SELECT CAST(prob AS DOUBLE) AS prob
              FROM (VALUES {", ".join(f"({p!r})" for p in QHIST_PROBS)})
              AS t(prob)
            ),
            hit AS (
              SELECT flag, prob, MIN(bucket) AS bucket
              FROM cdf JOIN probs ON cum >= ceil(prob * n)
              GROUP BY flag, prob
            )
            SELECT flag, prob,
                   CASE WHEN bucket < 0 THEN 0 ELSE
                     CAST(((1::BIGINT << (bucket // 64))::HUGEINT
                           * (2 * (64 + bucket % 64) + 1)) // 128 AS BIGINT)
                   END AS cents_est
            FROM hit
        """,
        "q122_lifeline_store": f"""
            SELECT event_id,
                   CAST(4000000 + event_id // 100 AS BIGINT) AS pulse_number,
                   CAST(event_id % 100 AS BIGINT) AS ord
            FROM events
            WHERE user_id = {LIFELINE_USER}
        """,
        "q123_record_point_lookup": f"""
            SELECT event_id,
                   CAST(4000000 + event_id // 100 AS BIGINT) AS pulse_number,
                   CAST(event_id % 100 AS BIGINT) AS ord
            FROM events
            WHERE event_id IN ({", ".join(str(i) for i in POINT_EVENT_IDS)})
        """,
        "q119_proximity_search": _proximity_oracle(),
        "q133_bfs_reachability": f"""
            WITH RECURSIVE e AS (
              SELECT DISTINCT o_custkey AS u,
                              l_suppkey + {PR_SUPP_OFFSET} AS v
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ),
            sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
            r(id, hops) AS (
              SELECT CAST({BFS_SRC} AS BIGINT), CAST(0 AS BIGINT)
              UNION
              SELECT sym.v, r.hops + 1
              FROM r JOIN sym ON sym.u = r.id
              WHERE r.hops < {BFS_HOPS}
            )
            SELECT id, MIN(hops) AS hops FROM r GROUP BY id
        """,
        "q134_triangle_counts": f"""
            WITH ps AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS s
              FROM lineitem WHERE l_partkey % {TRI_PART_MOD} = 0
            ),
            pairs AS (
              SELECT DISTINCT a.s AS u, b.s AS v
              FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            ),
            tri AS (
              SELECT e1.u AS x, e1.v AS y, e2.v AS z
              FROM pairs e1
              JOIN pairs e2 ON e2.u = e1.v
              JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
            )
            SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
            FROM (
              SELECT x AS id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            )
            GROUP BY id
        """,
        "q135_cooccurrence": _positional_sql(f"""
            SELECT least(a.token, b.token) AS a,
                   greatest(a.token, b.token) AS b,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM p a JOIN p b
              ON a.doc_id = b.doc_id
             AND b.pos - a.pos BETWEEN 1 AND {COOC_WINDOW}
            GROUP BY 1, 2
        """),
        "q136_kwic": _positional_sql(f"""
            SELECT p.doc_id, p.pos,
                   array_to_string(
                     list_slice(t.tk,
                                greatest(p.pos + 1 - {KWIC_WIDTH}, 1),
                                p.pos + 1 + {KWIC_WIDTH}),
                     ' ') AS snippet
            FROM p JOIN toks t ON p.doc_id = t.doc_id
            WHERE p.token = '{KWIC_TERM}'
        """),
        "q137_chunking": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)),
                                 '\\s+'), t -> t <> '') AS tk
              FROM documents
            ),
            d AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
            s AS (SELECT doc_id, tk, n,
                         unnest(generate_series(0, n - 1,
                                {CHUNK_TOKENS - CHUNK_OVERLAP})) AS start
                  FROM d)
            SELECT doc_id,
                   CAST(start // {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT)
                     AS chunk_id,
                   CAST(least({CHUNK_TOKENS}, n - start) AS BIGINT)
                     AS n_tokens,
                   array_to_string(
                     list_slice(tk, start + 1, start + {CHUNK_TOKENS}),
                     ' ') AS chunk
            FROM s
        """,
        "q138_shortest_paths": f"""
            WITH RECURSIVE ps AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS s
              FROM lineitem WHERE l_partkey % {SP_PART_MOD} = 0
            ),
            pr AS (
              SELECT a.s AS u, b.s AS v, COUNT(*) AS c
              FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
              GROUP BY a.s, b.s
            ),
            e AS (
              SELECT u, v, GREATEST(1, 10 - c) AS w FROM pr
              UNION ALL
              SELECT v, u, GREATEST(1, 10 - c) FROM pr
            ),
            r(id, dist, hops) AS (
              SELECT CAST({SP_SRC} AS BIGINT), CAST(0 AS BIGINT), 0
              UNION
              SELECT e.v, r.dist + e.w, r.hops + 1
              FROM r JOIN e ON e.u = r.id
              WHERE r.hops < {SP_ROUNDS}
            )
            SELECT id, MIN(dist) AS dist FROM r GROUP BY id
        """,
        "q139_collocations": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)),
                                 '\\s+'), t -> t <> '') AS tk
              FROM documents
            ),
            idx AS (SELECT doc_id,
                           unnest(generate_series(1, len(tk))) AS i, tk
                    FROM toks),
            p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                         tk[i] AS token
                  FROM idx),
            cnt AS (
              SELECT least(a.token, b.token) AS a,
                     greatest(a.token, b.token) AS b,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM p a JOIN p b
                ON a.doc_id = b.doc_id
               AND b.pos - a.pos BETWEEN 1 AND {COOC_WINDOW}
              GROUP BY 1, 2
            ),
            m AS (
              SELECT t, SUM(n) AS nt
              FROM (SELECT a AS t, n FROM cnt
                    UNION ALL SELECT b, n FROM cnt)
              GROUP BY t
            ),
            tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM cnt)
            SELECT c.a, c.b, c.n,
                   CAST(c.n AS DOUBLE) * (SELECT nn FROM tot)
                     / (CAST(ma.nt AS DOUBLE) * CAST(mb.nt AS DOUBLE))
                     AS lift
            FROM cnt c
            JOIN m ma ON ma.t = c.a
            JOIN m mb ON mb.t = c.b
            WHERE c.n >= {COLL_MIN}
            ORDER BY lift DESC, c.a ASC, c.b ASC
            LIMIT {COLL_TOPK}
        """,
    }
