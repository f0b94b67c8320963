"""Deduplication operators for 100 TB training-data pipelines.

Five tiers, cheapest first; all shuffle-aware:

  exact_dedup        — hash-groupBy on a normalized key (one shuffle)
  fingerprint_dedup  — bag-of-words md5 key (order/dup-insensitive)
  jaccard_pairs      — EXACT n-gram/token jaccard via an inverted
                       shingle index: explode → self-join on shingle →
                       count intersections → filter. Never a cross
                       join: cost ~ sum over shingles of df(s)^2, the
                       standard scalable exact method.
  minhash_lsh_pairs  — MinHash signatures + banded LSH bucketing:
                       candidates = pairs sharing a band bucket; then
                       exact-verify. Cost ~ candidates, not pairs.
  simhash_pairs      — 64-bit SimHash + banded hamming lookup.

Embedding near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from block_explorer_spark.functions import text as Tx


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Group rows by `key`; keep the min-id canonical row id + dup count.

    One hash-shuffle on the key; map-side partial agg makes duplicate-
    heavy inputs cheap. Output: (dedup_key, keep_id, dup_count).
    """
    return (
        df.select(key.alias("dedup_key"), F.col(id_col))
        .groupBy("dedup_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """exact_dedup on the bag-of-words md5 fingerprint."""
    return exact_dedup(df, Tx.word_set_fingerprint(text_col), id_col)


def _shingle_index(df: DataFrame, id_col: str, shingles: Column) -> DataFrame:
    """(id, shingle) inverted index, distinct per doc."""
    return df.select(F.col(id_col).alias("__id"), F.explode(shingles).alias("__sh")).dropDuplicates(
        ["__id", "__sh"]
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles: Column,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact jaccard-similar pairs via inverted-index self-join.

    Pairs that share zero shingles never meet (they can't pass any
    threshold > 0), so the plan is: explode shingles → join on shingle
    (one shuffle each side, hash join) → groupBy pair counting shared
    shingles → join per-doc set sizes (broadcast-eligible agg) →
    jaccard = inter / (|a| + |b| - inter).

    `max_shingle_freq` drops super-common shingles (stop-shingles)
    before the join — the standard guard against quadratic blowup on
    skewed shingle frequencies at scale. Dropping a shingle can only
    lower the computed intersection, so with it set the result is a
    high-precision subset; leave None for exact semantics.

    Output: (id_a, id_b, inter, size_a, size_b, jaccard), id_a < id_b.
    """
    idx = _shingle_index(df, id_col, shingles)
    if max_shingle_freq is not None:
        freq = idx.groupBy("__sh").agg(F.count(F.lit(1)).alias("__f"))
        idx = idx.join(
            F.broadcast(freq.filter(F.col("__f") <= max_shingle_freq).select("__sh")), "__sh"
        )
    sizes = idx.groupBy("__id").agg(F.count(F.lit(1)).alias("__size"))
    a = idx.select(F.col("__id").alias("id_a"), "__sh")
    b = idx.select(F.col("__id").alias("id_b"), "__sh")
    inter = (
        a.join(b, "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnsRenamed({"__id": "id_a", "__size": "size_a"})), "id_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"__id": "id_b", "__size": "size_b"})), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")


def minhash_signatures(
    df: DataFrame, id_col: str, shingles: Column, num_hashes: int = 128
) -> DataFrame:
    """MinHash signature per id: for seed i, min over shingles of
    xxhash64(shingle, i). One explode + one groupBy; the signature is
    an array<long> column ordered by seed."""
    idx = _shingle_index(df, id_col, shingles)
    mins = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = idx.groupBy("__id").agg(*mins)
    return sig.select(
        F.col("__id").alias(id_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    shingles: Column,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH.

    Signatures are cut into `bands` bands of num_hashes/bands rows;
    docs agreeing on all rows of any band become candidates (join on
    (band_idx, band_hash) — a key-partitioned equi-join, never a cross
    join). With r rows/band, P(candidate) = 1-(1-j^r)^bands, the usual
    S-curve centered near (1/bands)^(1/r). Candidates are then
    exact-verified against `threshold` when verify=True.

    Output: (id_a, id_b [, jaccard]).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, shingles, num_hashes)
    banded = sig.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bhash")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bhash"])
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cand
    # Verify candidates only: join each side to its shingle set and
    # compute jaccard per pair via array_intersect — O(candidates),
    # never touching the full pair space like an exact join would.
    sets = df.select(F.col(id_col).alias("__sid"), shingles.alias("__set"))
    verified = (
        cand.join(sets.withColumnsRenamed({"__sid": "id_a", "__set": "__set_a"}), "id_a")
        .join(sets.withColumnsRenamed({"__sid": "id_b", "__set": "__set_b"}), "id_b")
        .withColumn("inter", F.size(F.array_intersect("__set_a", "__set_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("__set_a") + F.size("__set_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash_table(df: DataFrame, id_col: str, shingles: Column, bits: int = 64) -> DataFrame:
    """(id, simhash) via the relational formulation.

    Explode shingles → xxhash64 once per shingle → 64 map-side-partial
    SUM(±1) aggregates per id → recombine bits. One shuffle on id; the
    per-bit work is flat column expressions (whole-stage codegen),
    not nested array folds whose generated code explodes at 64 bits.
    """
    idx = _shingle_index(df, id_col, shingles)
    hashed = idx.select("__id", F.xxhash64("__sh").alias("__h"))
    sums = hashed.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = F.lit(2**i).cast("long") if i < 63 else F.lit(-(2**63)).cast("long")
        sim = sim + F.when(F.col(f"__b{i}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return sums.select("__id", sim.alias("__sim"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    shingles: Column,
    max_hamming: int = 3,
    blocks: int = 8,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split the 64-bit hash into `blocks` chunks;
    any pair within hamming distance < blocks shares at least one
    exact chunk → join per chunk (equi-join on (chunk_idx, chunk)),
    then verify true hamming distance via bit_count(xor).
    Requires blocks > max_hamming for completeness.
    """
    assert blocks > max_hamming, "need blocks > max_hamming for exactness"
    chunk_bits = 64 // blocks
    sh = simhash_table(df, id_col, shingles)
    chunks = sh.select(
        "__id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("chunk_idx"),
                        F.shiftright(F.col("__sim"), b * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("cc"),
    ).select("__id", "__sim", "cc.chunk_idx", "cc.chunk")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["chunk_idx", "chunk"])
        .filter(F.col("x.__id") < F.col("y.__id"))
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__sim").alias("sim_a"),
            F.col("y.__sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming)
