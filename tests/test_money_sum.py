"""_money_sum's exactness contract (ADVICE r10).

The gate helper sums money as exact integer ten-thousandths:
FLOOR(x*10000 + 0.5). That is EXACT — order-independent and equal to
the DuckDB DECIMAL(27,4)-cast oracle — only while every summed
expression carries at most 4 decimal digits (then x*10000 sits within
fp noise of an integer and the floor never lands on a genuine tie).
A 6-decimal product (price*(1-disc)*(1+tax)) can sit exactly on a
.00005 tie where the two engines round differently. Three pins:

  1. exactness on <=4-decimal data, including tie-adjacent values;
  2. the 6-decimal divergence is REAL (the boundary is where the
     docstring says it is — if _money_sum ever learns 6 decimals,
     this pin goes stale loudly);
  3. a census of every _money_sum/_money_sum_sql call site in the
     gate registry against an allowlist of expressions whose factor
     decimal budget is written down — a NEW gate summing an
     unvetted expression fails here, not by a 1-cent oracle flip.
"""

from __future__ import annotations

import ast
import math

import duckdb
import pytest


def _entry_source() -> str:
    with open("/root/repo/__spark_entry__.py") as fh:
        return fh.read()


def test_money_sum_exact_on_4_decimal_data(spark):
    """Spark _money_sum == DuckDB DECIMAL-cast sum on adversarial
    4-decimal inputs (tie-adjacent .xxx5 values, sign mix, magnitude
    spread), under any row order."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    vals = [0.0001, 0.0005, 123.4565, -7.0005, 98765.4321, 0.9995, -0.0005]
    vals += [v * 10 for v in vals] + [v * 1000 for v in vals]
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(ROUND(SUM(CAST(v AS DECIMAL(27,4))), 2) AS DOUBLE) "
        "FROM (SELECT UNNEST(?) AS v)",
        [vals],
    ).fetchone()[0]
    for order in (vals, list(reversed(vals)), sorted(vals)):
        df = spark.createDataFrame([(v,) for v in order], ["v"]).repartition(4)
        got = df.agg(e._money_sum(F.col("v"), "s")).collect()[0]["s"]
        assert got == pytest.approx(want, abs=1e-9)


def test_money_sum_5_decimal_divergence_is_real():
    """The documented caveat, demonstrated: a >4-decimal value on a
    .00005 tie rounds UP in the units formulation while DuckDB's
    DECIMAL(27,4) cast rounds by the double's shortest-decimal
    rendering — the invariant is a boundary, not paranoia.
    8885.99105's double sits just below the tie, so DECIMAL rounds
    down (88859910 units) while floor(x*10000+0.5) rounds up
    (88859911)."""
    x = 8885.99105
    units = math.floor(x * 10000 + 0.5)  # the _money_sum core
    con = duckdb.connect()
    dec = con.execute(
        "SELECT CAST(CAST(? AS DECIMAL(27,4)) * 10000 AS BIGINT)", [x]
    ).fetchone()[0]
    assert units == 88859911 and dec == 88859910, (
        "expected the >4-decimal tie to diverge; if this stopped "
        "diverging, the _money_sum docstring caveat is stale"
    )


#: Every expression a gate may pass to _money_sum/_money_sum_sql, with
#: its decimal budget. Factors: *price/acctbal/totalprice columns have
#: 2 decimals (TPC-H money), l_discount/l_tax 2 decimals, l_quantity
#: integral -> products below stay within 4 decimal digits.
_ALLOWED = {
    # bare 2-decimal money columns
    "F.col('o_totalprice')",
    "F.col('l_extendedprice')",
    "F.col('c_acctbal')",
    # integral quantity
    "F.col('l_quantity')",
    # price(2dec) * (1 - disc(2dec)) = 4 decimals
    "F.col('l_extendedprice') * (1 - F.col('l_discount'))",
    # price(2dec) * disc(2dec) = 4 decimals
    "F.col('l_extendedprice') * F.col('l_discount')",
    # q68/q51 amount: price*(1-disc) [4 dec] - 0.6(1dec)*price(2dec)*qty(int) [3 dec]
    "F.col('l_extendedprice') * (1 - F.col('l_discount')) - 0.6 * F.col('p_retailprice') * F.col('l_quantity')",
    # oracle-SQL twins (string exprs fed to _money_sum_sql)
    "'o_totalprice'",
    "'l_extendedprice'",
    "'c_acctbal'",
    "'l_quantity'",
    "'l_extendedprice * (1 - l_discount)'",
    "'l_extendedprice * l_discount'",
    "'amount'",
}


def _resolve(node: ast.expr, assigns: dict[str, ast.expr]) -> ast.expr:
    """Chase simple Name -> assignment chains (rev/vol/amount)."""
    seen = 0
    while isinstance(node, ast.Name) and node.id in assigns and seen < 5:
        node = assigns[node.id]
        seen += 1
    return node


def test_money_sum_call_site_census():
    tree = ast.parse(_entry_source())
    exprs: dict[str, str] = {}
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        assigns = {
            t.id: a.value
            for a in ast.walk(fn)
            if isinstance(a, ast.Assign)
            for t in a.targets
            if isinstance(t, ast.Name)
        }
        for call in ast.walk(fn):
            if (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Name)
                and call.func.id in ("_money_sum", "_money_sum_sql")
                and call.args
            ):
                arg = _resolve(call.args[0], assigns)
                exprs[ast.unparse(arg).replace('"', "'")] = (
                    f"{fn.name}:{call.lineno}"
                )
    unknown = {e: w for e, w in exprs.items() if e not in _ALLOWED}
    assert not unknown, (
        f"unvetted _money_sum expressions: {unknown} — _money_sum is "
        "exact only for <=4-decimal inputs (see its docstring); verify "
        "the new expression's factor decimal budget and add it to "
        "_ALLOWED with the budget written down, or it will diverge "
        "from the DECIMAL oracle at .00005 ties"
    )
    # the census saw the registry at all (guards against refactors
    # that silently rename the helper out of this test's sight)
    assert len(exprs) >= 6
