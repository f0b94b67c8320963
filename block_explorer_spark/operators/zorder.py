"""Z-order (Morton) clustering + multi-column data skipping.

Why: the manifest's zone maps (sources/manifest.py:264,314) skip files
only as well as the LAYOUT allows. A linear sort by column A gives
tight per-file [min, max] on A but leaves every file's zone for
column B spanning the whole domain — a predicate on B prunes nothing.
Interleaving the bits of the clustered columns (Morton order, 1966)
bounds every range-partitioned file to a small hyper-rectangle of the
key space, so range predicates on ANY clustered column skip files.
This is the public Delta/Iceberg `OPTIMIZE ZORDER BY` recipe, built
here from pure Column arithmetic — shiftleft / shiftright / bitwiseOR
terms that stay inside whole-stage codegen; no UDF, no Python in the
hot path.

No reference analog: the reference reads its tables through Postgres
indexes (`etl/storage/storage.go`); at 100 TB of parquet the
equivalent of "the index" is file-level skipping, and z-order is what
makes it multi-column.

Scale shape: one bounded min/max aggregate (2·|cols| scalars to the
driver), one range-partitioning shuffle (the rewrite IS the point of
an OPTIMIZE pass), footer-only stats lift, one manifest CAS commit.
Reads list files from the manifest and intersect zones per predicate
column — Spark never opens, or even LISTs, a pruned file.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from block_explorer_spark.sources import manifest as M

#: Largest exactly-representable integer span in the double math used
#: by the unit scaling; bounds wider than this would quantize wrongly.
_MAX_EXACT = 2**52


def _unit(col: str, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column linearly into [0, 2**bits) as a long.
    NULLs map to 0 (they cluster into the low corner and are never
    dropped — pruning keeps any file whose zone touches the box, and
    the row-level filter is always re-applied). Out-of-bounds values
    (data drift after bounds were computed) clamp to the edges, which
    widens zones but never loses rows."""
    top = (1 << bits) - 1
    span = float(hi) - float(lo)
    if not (span > 0):  # constant column (or inverted bounds): one bucket
        return F.lit(0).cast("long")
    u = F.floor((F.col(col).cast("double") - F.lit(float(lo))) * top / span)
    u = F.least(F.greatest(u, F.lit(0)), F.lit(top))
    return F.coalesce(u, F.lit(0)).cast("long")


def zvalue(
    cols: list[str], bounds: dict[str, tuple[float, float]], bits: int = 12
) -> Column:
    """The Morton key: per-column unit scale, then bit interleave —
    bit b of column i lands at position b·|cols| + i. bits·|cols| must
    fit a signed long. Pure Column expressions (2·bits·|cols| shift/
    mask/or terms), evaluated JVM-side under codegen."""
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*cols = {bits * len(cols)} exceeds 62")
    units = [_unit(c, *bounds[c], bits) for c in cols]
    terms = [
        F.shiftleft(F.shiftright(u, b).bitwiseAND(F.lit(1)), b * len(units) + i)
        for b in range(bits)
        for i, u in enumerate(units)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global [min, max] per clustered column — one aggregate, 2·|cols|
    scalars collected (bounded by construction)."""
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    out: dict[str, tuple[float, float]] = {}
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        lo = 0.0 if lo is None else float(lo)
        hi = 0.0 if hi is None else float(hi)
        if max(abs(lo), abs(hi), abs(hi - lo)) > _MAX_EXACT:
            raise ValueError(f"bounds for {c} exceed exact double range")
        out[c] = (lo, hi)
    return out


def zorder_meta(cur: dict, family: str) -> dict | None:
    """The family's zorder layout entry from a manifest snapshot.
    Meta shape is per-family — `meta["zorder"][family] = {cols, bits,
    bounds, tail}` — so several clustered families (e.g. a records
    table and an events table) coexist under one store base without
    the writers clobbering each other. Reads the pre-round-8 single-
    family shape transparently."""
    z = cur.get("meta", {}).get("zorder") or {}
    if "cols" in z:  # legacy single-family shape
        return z if z.get("family") == family else None
    return z.get(family)


def _merge_zorder(cur: dict, family: str, entry: dict) -> dict:
    """A full meta dict for commit: the snapshot's meta with ONLY this
    family's zorder entry replaced. Never drops other features' meta
    (bm25 stats, another family's layout) — writers that passed a
    fresh dict here used to silently destroy them."""
    meta = dict(cur.get("meta", {}))
    z = dict(meta.get("zorder") or {})
    if "cols" in z:  # migrate legacy single-family shape in place
        z = {z["family"]: {k: v for k, v in z.items() if k != "family"}}
    z[family] = entry
    meta["zorder"] = z
    return meta


def cluster_write(
    df: DataFrame,
    base: str,
    family: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 32,
) -> int:
    """Rewrite `family` z-ordered by `cols` (an OPTIMIZE-style full
    layout pass): range-partition on the Morton key so each output
    file owns a contiguous z-range (a hyper-rectangle of the key
    space), sort within files for row-group-level stats, lift per-file
    [min, max] for every clustered column from the parquet footers,
    and publish data + zone maps in ONE manifest CAS swap. Returns the
    committed version. Retries once on a racing writer."""
    bounds = column_bounds(df, cols)
    z = zvalue(cols, bounds, bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    with M.write_intent(base):
        rels = M.stage_df(clustered, base, family)
        stats = M.file_stats(base, rels, cols)
        entry = {"cols": cols, "bits": bits,
                 "bounds": {c: list(bounds[c]) for c in cols}, "tail": []}
        for _ in range(2):
            cur = M.read(base)
            fams = dict(cur.get("families", {}))
            fams[family] = rels
            meta = _merge_zorder(cur, family, entry)
            try:
                return M.commit(
                    base, fams, cur.get("version", 0), meta=meta, stats=stats
                )
            except M.CommitConflict:
                continue
        raise M.CommitConflict(f"cluster_write({family}) lost the CAS twice")


def pruned_files(
    base: str,
    family: str,
    predicates: dict[str, tuple[float | None, float | None]],
    manifest: dict | None = None,
) -> tuple[list[str], int]:
    """(surviving relpaths, total live files): intersect the family's
    per-file zones with every predicate column's [lo, hi]. Files with
    no recorded stats for a column are KEPT (conservative — see
    manifest.prune_by_stats)."""
    m = manifest if manifest is not None else M.read(base)
    rels = list(m.get("families", {}).get(family, []))
    total = len(rels)
    for col, (lo, hi) in predicates.items():
        rels = M.prune_by_stats(m, family, col, lo=lo, hi=hi, rels=rels)
    return rels, total


def read_clustered(
    spark: SparkSession,
    base: str,
    family: str,
    predicates: dict[str, tuple[float | None, float | None]],
) -> DataFrame:
    """Read the family with manifest-side file skipping, then re-apply
    the predicates row-level (zones admit whole files; rows inside a
    kept file can still miss the box). Correctness never depends on
    the layout — z-order only changes how many files survive."""
    m = M.read(base)
    keep, _total = pruned_files(base, family, predicates, manifest=m)
    all_rels = m.get("families", {}).get(family, [])
    if not all_rels:
        raise FileNotFoundError(f"family {family!r} has no committed files")
    paths = [os.path.join(base, r) for r in (keep or all_rels)]
    df = spark.read.parquet(*paths)
    if not keep:  # every file pruned: correct empty result, same schema
        df = df.limit(0)
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df


def cluster_append(
    df: DataFrame, base: str, family: str, num_files: int | None = None
) -> int:
    """Append a micro-batch WITHOUT re-laying-out the family (the
    ingest path: full re-clustering per batch would be quadratic over
    a table's life). Appended files still get per-file zone maps for
    the family's clustered columns, so pruning stays CORRECT — just
    looser on the unclustered tail, whose zones span whatever the
    batch happened to contain. `cluster_maintain` periodically folds
    the tail back into z-order. Returns the committed version."""
    with M.write_intent(base):
        cur = M.read(base)
        zmeta = zorder_meta(cur, family)
        if not zmeta:
            raise ValueError(
                f"family {family!r} has no zorder layout to append to; "
                "run cluster_write first"
            )
        cols = zmeta["cols"]
        towrite = df.repartition(num_files) if num_files else df
        rels = M.stage_df(towrite, base, family)
        stats = M.file_stats(base, rels, cols)
        for _ in range(2):
            cur = M.read(base)
            fams = dict(cur.get("families", {}))
            fams[family] = list(fams.get(family, [])) + rels
            snap = zorder_meta(cur, family) or zmeta
            entry = {**snap, "tail": list(snap.get("tail", [])) + rels}
            meta = _merge_zorder(cur, family, entry)
            try:
                return M.commit(
                    base, fams, cur.get("version", 0), meta=meta, stats=stats
                )
            except M.CommitConflict:
                continue
        raise M.CommitConflict(f"cluster_append({family}) lost the CAS twice")


def cluster_maintain(
    spark: SparkSession,
    base: str,
    family: str,
    min_tail_files: int = 8,
    num_files: int | None = None,
) -> int | None:
    """Fold the unclustered append tail back into z-order — the
    OPTIMIZE cadence: reads ONLY the tail files (cost ∝ appended data,
    never the already-clustered bulk), z-orders them with the layout's
    recorded bounds (values outside clamp to edge buckets — correct,
    just wider zones), and swaps tail → clustered files in one commit.
    No-op (returns None) while the tail is below `min_tail_files`.
    Readers are snapshot-isolated throughout; a racing append simply
    lands in the next tail."""
    import os as _os

    cur = M.read(base)
    zmeta = zorder_meta(cur, family)
    if not zmeta:
        raise ValueError(f"family {family!r} has no zorder layout")
    tail = list(zmeta.get("tail", []))
    if len(tail) < min_tail_files:
        return None
    cols, bits = zmeta["cols"], zmeta["bits"]
    bounds = {c: tuple(v) for c, v in zmeta["bounds"].items()}
    with M.write_intent(base):
        df = spark.read.parquet(*[_os.path.join(base, r) for r in tail])
        z = zvalue(cols, bounds, bits)
        nf = num_files or max(1, len(tail) // 2)
        clustered = (
            df.withColumn("__z", z)
            .repartitionByRange(nf, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        rels = M.stage_df(clustered, base, family)
        stats = M.file_stats(base, rels, cols)
        for _ in range(2):
            cur = M.read(base)
            fams = dict(cur.get("families", {}))
            kept = [r for r in fams.get(family, []) if r not in set(tail)]
            fams[family] = kept + rels
            snap = zorder_meta(cur, family) or zmeta
            new_tail = [r for r in snap.get("tail", []) if r not in set(tail)]
            entry = {**snap, "tail": new_tail}
            meta = _merge_zorder(cur, family, entry)
            try:
                return M.commit(
                    base, fams, cur.get("version", 0), meta=meta, stats=stats
                )
            except M.CommitConflict:
                continue
        raise M.CommitConflict(f"cluster_maintain({family}) lost the CAS twice")
