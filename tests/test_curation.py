"""Unit tests for the corpus-curation operators added for the
training-data pipeline surface: repetition signals, PII scrub,
domain parsing, deterministic sampling, int8 quantization,
containment pairs. The gate queries (q76-q82) pin these cross-engine;
here we pin the edge cases the gate data can't hit (the synthetic
corpus has no emails/phones, no newlines, no zero vectors)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from block_explorer_spark.functions import text as Tx
from block_explorer_spark.operators import dedup as D
from block_explorer_spark.operators import sampling as Smp
from block_explorer_spark.operators import similarity as Sim


# ---------------------------------------------------------------------------
# Repetition signals
# ---------------------------------------------------------------------------


def test_duplicate_word_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a b a b")], ["id", "text"]
    )
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", F.round(Tx.duplicate_ngram_fraction("text", 1), 6).alias("v")
        ).collect()
    }
    assert got[1] == 0.75  # 4 words, 1 distinct
    assert got[2] == 0.0
    assert got[3] == 0.5


def test_duplicate_2gram_fraction(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["id", "text"])
    # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
    v = df.select(F.round(Tx.duplicate_ngram_fraction("text", 2), 6).alias("v")).head()["v"]
    assert v == 0.6


def test_repetition_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    plan = df.select(
        Tx.duplicate_ngram_fraction("text", 2).alias("v")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # quality filters must not shuffle


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_redact_email_phone_digits(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.com today"),
            (2, "call +1 (555) 123-4567 now"),
            (3, "id 12345 and pin 9876"),
            (4, "clean text only"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["v"] for r in df.select("id", Tx.pii_redact("text").alias("v")).collect()}
    assert got[1] == "contact [EMAIL] today"
    assert got[2] == "call [PHONE] now"
    assert got[3] == "id [DIGITS] and pin [DIGITS]"
    assert got[4] == "clean text only"


def test_pii_hits_counts(spark):
    df = spark.createDataFrame([(1, "a@b.co and c@d.org, plus 123456789")], ["id", "text"])
    row = df.select(
        Tx.pii_hits("text", "email").alias("e"), Tx.pii_hits("text", "digits").alias("d")
    ).head()
    assert row["e"] == 2
    assert row["d"] == 1


# ---------------------------------------------------------------------------
# Domain parsing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "url,expect",
    [
        ("https://www.Example.COM/path?q=1", "example.com"),
        ("http://sub.host.org:8080/x", "sub.host.org"),
        ("ftp://files.example.net", "files.example.net"),
        ("example.com/bare/path", "example.com"),
        ("plain-tag", "plain-tag"),
    ],
)
def test_domain_of(spark, url, expect):
    df = spark.createDataFrame([(url,)], ["u"])
    assert df.select(Tx.domain_of("u").alias("d")).head()["d"] == expect


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], f"doc {i}") for i in range(300)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_stratified_sample_deterministic_and_rated(corpus):
    kept = Smp.stratified_sample(
        corpus, "lang", "doc_id", rates={"en": 100, "de": 50, "fr": 0}
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 100  # rate 100/100 keeps every en doc
    assert "fr" not in counts  # rate 0 keeps none
    assert 25 <= counts.get("de", 0) <= 75  # ~50% of 100
    # deterministic: second run identical membership
    again = Smp.stratified_sample(
        corpus, "lang", "doc_id", rates={"en": 100, "de": 50, "fr": 0}
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_uniform_sample_topk_plan_and_size(corpus):
    s = Smp.uniform_sample(corpus, "doc_id", 10)
    assert s.count() == 10
    assert sorted(s.columns) == ["doc_id", "lang", "text"]
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_per_group_sample_cap(corpus):
    s = Smp.per_group_sample(corpus, ["lang"], "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 7 for n in counts.values())
    # deterministic membership
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(r["doc_id"] for r in Smp.per_group_sample(corpus, ["lang"], "doc_id", 7).collect())
    assert a == b


# ---------------------------------------------------------------------------
# Int8 quantization
# ---------------------------------------------------------------------------


def test_quantize_int8_codes_and_scale(spark):
    df = spark.createDataFrame([(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])], ["vec_id", "v"])
    q = Sim.quantize_int8(df, "v")
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["q_scale"] == 127.0  # max|x| = 1.0
    assert rows[1]["q_vec"] == [127, -63, 32]  # floor(x*127+0.5)
    assert rows[2]["q_scale"] == 0.0  # zero vector guarded
    assert rows[2]["q_vec"] == [0, 0, 0]


def test_quantized_topk_matches_brute_force_on_separated_data(spark):
    # Vectors far apart in angle: int8 rounding can't reorder them.
    import random

    rng = random.Random(11)
    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = []
    for i in range(60):
        b = base[i % 3]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in b]))
    df = spark.createDataFrame(rows, ["vec_id", "v"])
    query = [1.0, 0.02, -0.01]
    got = [r["vec_id"] for r in Sim.quantized_topk(df, "v", query, k=5).collect()]
    exact = [r["vec_id"] for r in Sim.brute_force_topk(df, "v", query, k=5).collect()]
    assert set(got) == set(exact)


# ---------------------------------------------------------------------------
# Containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, short), (2, long), (3, "unrelated words here")], ["doc_id", "text"])
    sh = Tx.word_ngrams("text", 3)
    cont = D.containment_pairs(df, "doc_id", sh, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0  # short fully inside long
    jac = D.jaccard_pairs(df, "doc_id", sh, threshold=0.5).collect()
    assert jac == []  # jaccard misses the same pair at any usable threshold


def test_arrow_matches_hof_signals(spark):
    """The Arrow fast path and the SQL-expressible HOF formulation
    compute identical fractions (incl. short/empty-text edges)."""
    rows = [
        (1, "a a a a"),
        (2, "a b c d e f g"),
        (3, "a b a b a b"),
        (4, "x"),
        (5, "  "),
        (6, "one two"),
        # SQL trim strips SPACES only; tab/newline padding survives it
        # and split('\s+') then yields a leading empty token — the
        # Arrow path must reproduce that, not Python strip() semantics.
        (7, "\ta a"),
        (8, "\na b a\n"),
        (9, " \t x y x y \n "),
        (10, "\t"),
        (11, "a\t\tb\nc  c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rep = Tx.repetition_signals_arrow()(F.col("text"))
    arrow = {
        r["doc_id"]: (r["d1"], r["d2"], r["d3"])
        for r in df.select(
            "doc_id",
            F.round(rep["dup_word_frac"], 9).alias("d1"),
            F.round(rep["dup_2gram_frac"], 9).alias("d2"),
            F.round(rep["dup_3gram_frac"], 9).alias("d3"),
        ).collect()
    }
    hof = {
        r["doc_id"]: (r["d1"], r["d2"], r["d3"])
        for r in df.select(
            "doc_id",
            F.round(Tx.duplicate_ngram_fraction("text", 1), 9).alias("d1"),
            F.round(Tx.duplicate_ngram_fraction("text", 2), 9).alias("d2"),
            F.round(Tx.duplicate_ngram_fraction("text", 3), 9).alias("d3"),
        ).collect()
    }
    assert arrow == hof


# ---------------------------------------------------------------------------
# Connected components / dedup clusters
# ---------------------------------------------------------------------------


def test_connected_components_merges_chains(spark):
    from block_explorer_spark.operators import graph as G

    # path 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["a", "b"]
    )
    got = {r["id"]: r["component"] for r in G.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    from block_explorer_spark.operators import graph as G

    n = 12  # diameter 11: exercises the iteration loop hard
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["a", "b"])
    got = {r["id"]: r["component"] for r in G.connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_connected_components_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iter must fail loudly,
    not return plausible-but-unconverged labels (ADVICE r3)."""
    import pytest

    from block_explorer_spark.operators import graph as G

    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        G.connected_components(edges, max_iter=3)
    # the same graph converges with enough rounds
    got = {r["id"]: r["component"] for r in G.connected_components(edges).collect()}
    assert set(got.values()) == {0}


def test_dedup_clusters_canonical_policy(spark):
    from block_explorer_spark.operators import graph as G

    pairs = spark.createDataFrame([(5, 9), (9, 7), (20, 30)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in G.dedup_clusters(pairs).collect()}
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_canonical"]
    assert rows[9]["cluster_id"] == 5 and not rows[9]["is_canonical"]
    assert rows[7]["cluster_id"] == 5
    assert rows[20]["cluster_id"] == 20 and rows[20]["is_canonical"]
    assert rows[30]["cluster_id"] == 20 and not rows[30]["is_canonical"]


def test_quantized_topk_arrow_matches_column_form(spark):
    """The numpy scoring path and the column-expression form produce
    identical (id, qcosine) — exact integer dot products leave no
    float-order slack."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "v"])
    query = rows[0][1]
    a = [(r["vec_id"], r["qcosine"]) for r in
         Sim.quantized_topk(df, "v", query, k=20, use_arrow=True).collect()]
    b = [(r["vec_id"], r["qcosine"]) for r in
         Sim.quantized_topk(df, "v", query, k=20, use_arrow=False).collect()]
    assert a == b


def test_profile_single_pass_and_values(spark):
    """The profile is ONE aggregate job (no per-column scans) and the
    stats are right, incl. null counting."""
    from block_explorer_spark.operators import profile as Pr

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 7.0), (4, "b", None)],
        ["id", "s", "v"],
    )
    rows = {r["column"]: r for r in Pr.profile(df).collect()}
    assert rows["id"]["n_null"] == 0 and rows["id"]["n_distinct"] == 4
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_null"] == 2 and rows["v"]["min_repr"] == "5.0"
    assert rows["s"]["min_repr"] == "a" and rows["s"]["max_repr"] == "b"
    # single scan: exactly one parquet/scan-free aggregate — the plan
    # contains one HashAggregate pair chain, no unions of scans
    plan = Pr.profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The persisted IVF index turns n_probe into directory-level
    PartitionFilters, and probing all cells reproduces brute force."""
    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = Sim.seeded_centroids(8, 4, seed=9, scale=0.5)
    path = str(tmp_path / "ivf")
    Sim.write_ivf_index(df, "embedding", cents, path)

    query = rows[0][1]
    probed = Sim.ivf_probe_topk(spark, path, query, cents, k=5, n_probe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan

    # n_probe = all cells == exact brute force over the whole table
    full = Sim.ivf_probe_topk(spark, path, query, cents, k=5, n_probe=4)
    exact = Sim.brute_force_topk(df, "embedding", query, k=5)
    assert [r["vec_id"] for r in full.collect()] == [r["vec_id"] for r in exact.collect()]


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup) — round 4
# ---------------------------------------------------------------------------


def test_semantic_dedup_greedy_lowest_id_wins(spark):
    # One cluster around (1,0): vecs 1,2,3 mutually near-identical;
    # another around (0,1): vecs 10,11 orthogonal to the first group.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),
        (3, [0.998, 0.02]),
        (10, [0.0, 1.0]),
        (11, [0.01, 0.999]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.0], [0.0, 1.0]]
    kept = Sim.semantic_dedup(df, "embedding", cents, threshold=0.95)
    got = sorted(r["vec_id"] for r in kept.collect())
    # greedy: 2 and 3 drop against 1; 11 drops against 10
    assert got == [1, 10]


def test_semantic_dedup_below_threshold_keeps_all(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.7, 0.7]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # single cluster -> all candidates compared, none above 0.999
    kept = Sim.semantic_dedup(df, "embedding", [[0.5, 0.5]], threshold=0.999)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 2, 3]


def test_semantic_dedup_cross_cluster_pairs_never_compared(spark):
    # identical vectors land in DIFFERENT clusters (adversarial
    # centroids): coarse blocking must not compare them — the
    # documented recall trade of cluster-bounded dedup.
    rows = [(1, [1.0, 0.05]), (2, [1.0, -0.05])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0.1], [1.0, -0.1]]
    kept = Sim.semantic_dedup(df, "embedding", cents, threshold=0.5)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 2]


# ---------------------------------------------------------------------------
# Temperature mixture sampling — round 4
# ---------------------------------------------------------------------------


def test_temperature_sample_alpha1_keeps_everything(corpus):
    kept = Smp.temperature_sample(corpus, "lang", "doc_id", alpha=1.0)
    assert kept.count() == corpus.count()


def test_temperature_sample_rates_match_formula(corpus):
    import math as _m

    counts = {r["lang"]: r["n"] for r in corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_min = min(counts.values())
    kept = Smp.temperature_sample(corpus, "lang", "doc_id", alpha=0.5)
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # brute-force replication of the md5-bucket predicate per stratum
    import hashlib

    for lang, n_s in counts.items():
        rate = _m.floor(10_000 * _m.sqrt(n_min / n_s))
        ids = [r["doc_id"] for r in corpus.filter(F.col("lang") == lang).collect()]
        exp = sum(
            1 for i in ids
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10_000 < rate
        )
        assert got.get(lang, 0) == exp
    # the rarest stratum is kept whole (rate = denom)
    rare = min(counts, key=counts.get)
    assert got[rare] == counts[rare]


# ---------------------------------------------------------------------------
# Budgeted selection — round 4
# ---------------------------------------------------------------------------


def _naive_budget_prefix(rows, budget):
    """(id, score, weight) -> ids of the greedy prefix."""
    cum, out = 0, []
    for i, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum > budget:
            break
        out.append(i)
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_budget_select_matches_naive_prefix(spark, seed):
    import random as _r

    rng = _r.Random(seed)
    rows = [
        (i, round(rng.random(), 6), rng.randint(1, 50)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "score", "w"])
    from block_explorer_spark.operators import selection as Sel

    budget = 1500
    got = sorted(
        r["id"] for r in Sel.budget_select(df, "score", "w", "id", budget).collect()
    )
    assert got == _naive_budget_prefix(rows, budget)


def test_budget_select_boundary_exact_fit(spark):
    from block_explorer_spark.operators import selection as Sel

    # weights 10 each, budget 30 -> exactly the 3 best kept, the
    # 4th (which would hit 40) dropped even though cum == budget + 10
    rows = [(i, 1.0 - i * 0.05, 10) for i in range(6)]
    df = spark.createDataFrame(rows, ["id", "score", "w"])
    got = Sel.budget_select(df, "score", "w", "id", budget=30).collect()
    assert sorted(r["id"] for r in got) == [0, 1, 2]
    assert {r["id"]: r["cum_weight"] for r in got} == {0: 10, 1: 20, 2: 30}


def test_budget_select_no_global_single_partition_sort(spark):
    from block_explorer_spark.operators import selection as Sel

    rows = [(i, (i % 7) / 7.0, 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "score", "w"])
    plan = (
        Sel.budget_select(df, "score", "w", "id", budget=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # per-row windows must partition by the score bucket, not run as
    # one global ORDER BY window over the data
    assert "partitionBy=[__bkt" in plan.replace(" ", "") or "__bkt" in plan.split(
        "Window"
    )[1]


# ---------------------------------------------------------------------------
# Cross-document shared shingles — round 4
# ---------------------------------------------------------------------------


def test_shared_shingle_stats_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown cat sits"),
            (3, "totally unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"])
        for r in D.shared_shingle_stats(df, "doc_id", Tx.word_ngrams("text", 3)).collect()
    }
    # doc1: shingles {the-quick-brown, quick-brown-fox, brown-fox-jumps};
    # only "the quick brown" recurs (in doc2)
    assert got[1] == (3, 1)
    assert got[2] == (3, 1)
    assert got[3] == (3, 0)


def test_shared_shingle_stats_contract_nulls_and_repeats(spark):
    """ADVICE r4 contract pins: a NULL/empty shingle array still yields
    a row (n_shingles=0, frac NULL), and a shingle repeated WITHIN one
    doc does not count as cross-corpus shared."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("sh", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(
        [
            (1, ["a", "a", "b"]),   # "a" repeats in-doc only
            (2, ["c", "d"]),
            (3, []),                 # empty
            (4, None),               # NULL
            (5, ["b", "e"]),        # shares "b" with doc 1
        ],
        schema,
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["shared_frac"])
        for r in D.shared_shingle_stats(df, "doc_id", F.col("sh")).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] == (2, 1, 0.5)       # distinct {a,b}; only b shared
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (0, 0, None)
    assert got[4] == (0, 0, None)
    assert got[5] == (2, 1, 0.5)


def test_ivf_assign_arrow_matches_catalyst(spark):
    """The Arrow (numpy GEMM) assignment must agree with the literal-
    fold Catalyst form on every row, including the first-argmin tie
    rule — it is the production path when n_centroids scales with N."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = Sim.seeded_centroids(64, 8, seed=7, scale=0.125)
    a = {
        r["vec_id"]: r["centroid_id"]
        for r in Sim.ivf_assign(emb, "embedding", cents).select(
            "vec_id", "centroid_id").collect()
    }
    b = {
        r["vec_id"]: r["centroid_id"]
        for r in Sim.ivf_assign_arrow(emb, "embedding", cents).select(
            "vec_id", "centroid_id").collect()
    }
    assert a == b and len(a) > 0
    # exact-tie rule: two equidistant centroids -> the FIRST wins
    tie = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"])
    got = Sim.ivf_assign_arrow(tie, "embedding", [[1.0, 0.0], [-1.0, 0.0]]).head()
    assert got["centroid_id"] == 0


# ---------------------------------------------------------------------------
# LM perplexity + OOV rate (q92/q93 shapes) — round 4
# ---------------------------------------------------------------------------


def test_bigram_nll_formula(spark):
    """Hand-checked add-k bigram NLL on a 2-doc corpus: P(b|a) =
    (C(ab)+k) / (C(a)+k·V)."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    from pyspark.sql import functions as F

    toks = df.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks"))
    bg = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
        )).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    uni = toks.select(F.explode("toks").alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).alias("cu"))
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    V = uni.count()  # {a, b, c} -> 3
    assert V == 3
    k = 0.5
    nll = -F.log((F.col("cb") + F.lit(k)) / (F.col("cu") + F.lit(k) * F.lit(float(V))))
    got = {
        r["doc_id"]: r["avg"]
        for r in bg.join(big, ["w1", "w2"]).join(uni, "w1")
        .withColumn("nll", nll).groupBy("doc_id")
        .agg(F.round(F.avg("nll"), 6).alias("avg")).collect()
    }
    # corpus: C(a)=3, C(b)=3, C(c)=1; C(ab)=3, C(ba)=1, C(bc)=1
    p_ab = (3 + k) / (3 + k * 3)
    p_ba = (1 + k) / (3 + k * 3)
    p_bc = (1 + k) / (3 + k * 3)
    exp1 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    exp2 = round(-(math.log(p_ab) + math.log(p_bc)) / 2, 6)
    assert got[1] == pytest.approx(exp1, abs=1e-6)
    assert got[2] == pytest.approx(exp2, abs=1e-6)


def test_oov_rate_tiebreak_and_fraction(spark):
    """Top-V vocab uses (count desc, token asc); OOV counts token
    OCCURRENCES, not types."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "x x y z"), (2, "y z w w")], ["doc_id", "text"]
    )
    tok = df.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
    vocab = (
        tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc()).limit(2)
    )
    # counts: x=2, w=2, y=2, z=2 -> all tie at 2; token asc keeps {w, x}
    assert {r["w"] for r in vocab.collect()} == {"w", "x"}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in tok.join(
            F.broadcast(vocab.select("w", F.lit(1).alias("__v"))), "w", "left"
        ).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        ).collect()
    }
    assert got[1] == (4, 2)  # y z OOV
    assert got[2] == (4, 2)  # y z OOV, w w in vocab


def test_temperature_sample_null_stratum_is_a_stratum(spark):
    """NULL-language rows form their own stratum: they are rated and
    sampled like any other group, never silently dropped by the join
    (eqNullSafe — the three-valued-logic loss pattern)."""
    import hashlib
    import math

    rows = [(f"n{i}", None) for i in range(40)] + [(f"e{i}", "en") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = Smp.temperature_sample(df, "lang", "doc_id", alpha=0.5)
    got = {r["lang"]: 0 for r in kept.collect()}
    for r in kept.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    # en is the rarest (10) -> kept whole; NULL group downsampled at
    # floor(10000*sqrt(10/40)) = 5000 per-10k
    assert got.get("en", 0) == 10
    rate = math.floor(10_000 * math.sqrt(10 / 40))
    exp_null = sum(
        1 for i in range(40)
        if int(hashlib.md5(f"n{i}".encode()).hexdigest()[:8], 16) % 10_000 < rate
    )
    assert got.get(None, 0) == exp_null > 0


def test_ivf_assign_arrow_two_level_blocks_near_dups_together(spark):
    """The coarse_probes path is a deterministic blocking function:
    near-identical vectors land in the same cell (same run-to-run),
    which is the property semantic dedup blocking needs."""
    import random as _r

    rng = _r.Random(3)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(50)]
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, v))
        rows.append((2 * i + 1, [x + 1e-6 for x in v]))  # near-identical twin
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = Sim.seeded_centroids(16, 64, seed=5, scale=0.5)
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in Sim.ivf_assign_arrow(
            df, "embedding", cents, coarse_probes=3
        ).collect()
    }
    twins_together = sum(1 for i in range(50) if got[2 * i] == got[2 * i + 1])
    assert twins_together == 50  # continuity: every twin pair co-locates
    again = {
        r["vec_id"]: r["centroid_id"]
        for r in Sim.ivf_assign_arrow(
            df, "embedding", cents, coarse_probes=3
        ).collect()
    }
    assert again == got  # determinism across runs


class TestChunkDocuments:
    def test_geometry_and_ragged_tail(self, spark):
        from block_explorer_spark.operators.selection import chunk_documents

        docs = spark.createDataFrame(
            [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "a b"), (3, "  "), (4, "solo")],
            "doc_id long, text string",
        )
        got = sorted(
            tuple(r)
            for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
        )
        # doc1 (7 tokens, stride 3): starts 0,3,6
        assert got == [
            (1, 0, 4, "t0 t1 t2 t3"),
            (1, 1, 4, "t3 t4 t5 t6"),
            (1, 2, 1, "t6"),
            (2, 0, 2, "a b"),
            (4, 0, 1, "solo"),
        ]

    def test_zero_overlap_partitions_exactly(self, spark):
        from block_explorer_spark.operators.selection import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        rows = chunk_documents(docs, chunk_tokens=5, overlap=0).collect()
        assert sorted((r["chunk_id"], r["n_tokens"]) for r in rows) == [
            (0, 5), (1, 5)
        ]
        # concatenation of zero-overlap chunks reconstructs the doc
        joined = " ".join(
            r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_id"])
        )
        assert joined == " ".join(f"w{i}" for i in range(10))

    def test_bad_geometry_rejected(self, spark):
        import pytest as _pt

        from block_explorer_spark.operators.selection import chunk_documents

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pt.raises(ValueError):
            chunk_documents(docs, chunk_tokens=0)
        with _pt.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, overlap=4)
        with _pt.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, overlap=-1)


@pytest.mark.slow
def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured on the context, iterative ops
    cut lineage with RELIABLE checkpoints (survive executor loss; the
    100 TB cluster posture) instead of localCheckpoint. The result
    must be identical, checkpoint RDD files must exist under the dir,
    and the returned plan must have no lineage back to the source
    scan — recovery state lives in the checkpoint files, not in a
    replayable-from-source lineage that was deliberately cut."""
    import os

    from block_explorer_spark.operators import graph as G

    src_dir = str(tmp_path / "edges")
    spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101)], ["a", "b"]
    ).write.parquet(src_dir)
    edges = spark.read.parquet(src_dir)

    ckpt_dir = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(ckpt_dir)
    try:
        out = G.connected_components(edges)
        got = {r["id"]: r["component"] for r in out.collect()}
    finally:
        sc.setCheckpointDir(None)  # restore the local/test posture
    assert sc.getCheckpointDir() is None

    assert got == {**{i: 0 for i in range(13)}, 100: 100, 101: 100}
    # reliable checkpoint files were written under the dir
    rdd_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckpt_dir)
        for f in fs
        if f.startswith("part-")
    ]
    assert rdd_files, "no reliable-checkpoint RDD files written"
    # lineage cut: final plan reads the checkpointed RDD, never the
    # parquet source
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" not in plan.lower()
    assert "LogicalRDD" in plan
