"""Vector math over array<float|double> columns — JVM-side only.

Dot products / norms via F.zip_with + F.aggregate: sequential
left-to-right folds in double precision, so results are bit-identical
to any engine doing an ordered double summation (the DuckDB oracle).
No UDF, no Arrow transfer, stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(vec: list[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(x)) for x in vec])
