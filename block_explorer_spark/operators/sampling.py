"""Deterministic sampling operators (training-data pipeline surface).

Corpus curation needs samples that are (a) reproducible across runs
and engines — no RNG state, no partition-order dependence — and
(b) cheap at 100 TB — no global sort, no driver collect. Every
operator here keys on a content hash (md5 of the row id), which makes
the sample a pure filter/top-k over the scan:

  stratified_sample   — per-stratum keep-rates as a hash-bucket filter
                        (map-only: a predicate on the scan, fully
                        pushable, zero shuffle)
  uniform_sample      — global k-sample as top-k by hash order
                        (TakeOrderedAndProject: per-partition heaps +
                        a k-row driver merge, never a full sort)
  per_group_sample    — k per group via one hash-ordered window
                        (single shuffle on the group key; the
                        reservoir-sampling equivalent for bounded k)

md5 rather than xxhash64 so any engine (DuckDB, Trino, ...) can
reproduce the exact member set — the same portability argument as the
train/val/test split (see __spark_entry__.q55).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, denom: int = 100) -> Column:
    """Stable [0, denom) bucket from md5 of the id's string form.

    Top 8 hex chars → int → mod. Identical in DuckDB:
      ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::UBIGINT % denom
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % denom
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    denom: int = 100,
) -> DataFrame:
    """Keep rows where hash_bucket(id) < rates[stratum] (per-mille /
    percent depending on denom). The rate table becomes a CASE chain,
    so the whole sample is one pushable scan predicate — the plan
    shape you want when downsampling a 100 TB corpus per source/lang:
    no join, no shuffle, and column pruning still applies.
    """
    bucket = hash_bucket(id_col, denom)
    rate = F.lit(default_rate)
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(r)).otherwise(rate)
    return df.filter(bucket < rate)


def uniform_sample(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """Deterministic k-row uniform sample: the k smallest md5(id)
    values. Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition k-heaps, one k-row merge on the driver — so this
    never materializes or sorts the full table.
    """
    h = F.md5(F.col(id_col).cast("string").cast("binary")).alias("__h")
    return df.withColumn("__h", h).orderBy("__h").limit(k).drop("__h")


def per_group_sample(df: DataFrame, group_cols: list[str], id_col: str, k: int) -> DataFrame:
    """Deterministic k rows per group: hash-ordered row_number <= k.

    One shuffle on the group key (the window partition); within each
    partition the rank is a streaming pass. This is the deterministic
    stand-in for per-stratum reservoir sampling when k is small and
    group count is large (the common 'n docs per domain' cap).
    """
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    denom: int = 10_000,
) -> DataFrame:
    """Temperature-flattened mixture sampling — the multilingual
    pre-training recipe (mT5 / XLM-R: sample stratum s with
    probability ~ p_s^alpha): keep each stratum at rate
    floor(denom * (n_min / n_s)^(1 - alpha)) / denom, which downsamples
    every stratum toward the rarest one. alpha = 1 keeps everything;
    alpha -> 0 flattens to uniform (rarest-stratum size everywhere).

    Membership stays the md5-bucket predicate (deterministic,
    engine-portable); the rates derive from per-stratum counts with
    only correctly-rounded IEEE operations (divide, sqrt at
    alpha = 0.5), so an oracle engine reproduces the exact member
    set. Plan shape: one tiny groupBy on the stratum + a broadcast
    join of the per-stratum rate back onto the scan — the scan itself
    stays map-only.
    """
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n_s")
    )
    n_min = counts.agg(F.min("__n_s").alias("__n_min"))
    frac = F.col("__n_min") / F.col("__n_s")  # double divide (exact IEEE)
    keep = F.sqrt(frac) if alpha == 0.5 else F.pow(frac, F.lit(1.0 - alpha))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "__s", F.floor(F.lit(denom) * keep).alias("__rate")
    )
    # eqNullSafe: groupBy puts NULL-stratum rows in their own group, so
    # a plain == join would compute their rate and then silently drop
    # every one of them (NULL-unequal) — the three-valued-logic data
    # loss pattern. NULL is a stratum like any other here.
    return (
        df.join(F.broadcast(rates), df[strata_col].eqNullSafe(rates["__s"]))
        .filter(hash_bucket(id_col, denom) < F.col("__rate"))
        .drop("__s", "__rate")
    )
