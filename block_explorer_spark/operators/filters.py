"""Conjunctive predicate builders (SURVEY §2.2, F1-F11).

The reference composes optional filter params onto a base scan via a
GORM clause list (etl/storage/storage.go:165-218). Here each builder
returns a Column predicate (or None when no param is set) so callers
AND them onto a DataFrame; expressing them as plain Column comparisons
keeps every one eligible for Catalyst predicate pushdown and parquet
row-group / partition pruning.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def and_all(*preds: Column | None) -> Column | None:
    """AND together the non-None predicates; None if all are None."""
    acc: Column | None = None
    for p in preds:
        if p is None:
            continue
        acc = p if acc is None else (acc & p)
    return acc


def apply_filters(df: DataFrame, *preds: Column | None) -> DataFrame:
    pred = and_all(*preds)
    return df if pred is None else df.filter(pred)


def range_exclusive(col: str, gt=None, lt=None) -> Column | None:
    """F1: open interval — `col > gt AND col < lt`.

    reference: etl/storage/storage.go:165-173
    """
    return range_4way(col, gt=gt, lt=lt)


def range_4way(col: str, gt=None, gte=None, lt=None, lte=None) -> Column | None:
    """F2: any subset of >, >=, <, <= on one column.

    reference: etl/storage/storage.go:175-193
    """
    c = F.col(col)
    return and_all(
        c > gt if gt is not None else None,
        c >= gte if gte is not None else None,
        c < lt if lt is not None else None,
        c <= lte if lte is not None else None,
    )


def timestamp_range(gte=None, lte=None, col: str = "timestamp") -> Column | None:
    """F3: closed timestamp interval. reference: etl/storage/storage.go:210-218"""
    return range_4way(col, gte=gte, lte=lte)


def keyset_cursor(
    major: str,
    minor: str,
    major_val,
    minor_val,
    ascending: bool = True,
) -> Column:
    """F4: composite tuple-compare cursor for keyset pagination.

    asc:  (major > M) OR (major = M AND minor >= m)
    desc: (major < M) OR (major = M AND minor <= m)

    The major term is a plain range predicate, so parquet scans prune
    on it even though the full tuple compare is a disjunction.
    reference: etl/storage/storage.go:195-208
    """
    ma, mi = F.col(major), F.col(minor)
    if ascending:
        return (ma > major_val) | ((ma == major_val) & (mi >= minor_val))
    return (ma < major_val) | ((ma == major_val) & (mi <= minor_val))


def equality(**kv) -> Column | None:
    """F5/F6: conjunction of equality predicates (col=value)."""
    return and_all(*[F.col(k) == v for k, v in kv.items()])


def in_list(col: str, values: Sequence) -> Column:
    """F8: `col IN (values)`. reference: etl/storage/storage.go:518,525,568"""
    return F.col(col).isin(*list(values))


def jet_hierarchy(jet_id: str, parents: Iterable[str], col: str = "jet_id") -> Column:
    """F9: match a jet, its ancestors, and all descendants.

    `col IN (parents) OR col LIKE 'jet_id%'` — parents are computed
    driver-side (pure function, functions.jets.jet_parents); descendants
    via prefix match which Catalyst compiles to a StartsWith pushdown.
    reference: etl/storage/storage.go:540, etl/storage/helper.go:5-14
    """
    parent_list = list(parents)
    pred = F.col(col).startswith(jet_id)
    if parent_list:
        pred = F.col(col).isin(*parent_list) | pred
    return pred
