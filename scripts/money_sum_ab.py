"""Round-10 brief item 4: measure and minimize the money-sum decimal
cost (q16_tpch_q1 regressed 0.51 -> 1.27 s at sf0.1 when round 9's sf1
hash run proved double sums order-flip and _money_sum moved to
DECIMAL(27,4)).

Variants, all ORDER-INDEPENDENT (the property the decimal move bought):

  dec27   sum(cast(x as decimal(27,4)))            -- shipped r9
  dec18   sum(cast(x as decimal(18,4)))            -- same rounding
          semantics for |x| < 10^14 (every per-row money value);
          compact-long Decimal per row instead of BigDecimal
  units   sum(floor(x*10000 + 0.5) :: long :: decimal(20,0)) / 10000
          -- per-row work is pure double FP + a compact long->decimal
          wrap; the decimal SUM buffer still grows past long range
          exactly (no 100 TB overflow); per-row HALF-UP at 4 decimals
          like the casts except at true .00005 ties, where it rounds
          by the double's BINARY magnitude rather than its shortest
          decimal rendering (both are deterministic per row)
  double  sum(x)                                    -- r8 baseline,
          order-DEPENDENT: for the speed floor only

Checks: value equality of dec27/dec18 (must be exact), units vs dec27
(diffs counted; any diff is a tie-rounding case, not an error), and
median-of-N wall time for the full TPC-H Q1 agg per variant.

Usage: python scripts/money_sum_ab.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from block_explorer_spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def money_exprs(kind: str):
    def mk(expr, alias):
        if kind == "dec27":
            return F.round(F.sum(expr.cast("decimal(27,4)")), 2).cast("double").alias(alias)
        if kind == "dec18":
            return F.round(F.sum(expr.cast("decimal(18,4)")), 2).cast("double").alias(alias)
        if kind == "units":
            units = F.floor(expr * 10000 + F.lit(0.5)).cast("decimal(20,0)")
            return (
                F.round(F.sum(units).cast("decimal(38,4)") / 10000, 2)
                .cast("double")
                .alias(alias)
            )
        if kind == "double":
            return F.round(F.sum(expr), 2).alias(alias)
        raise ValueError(kind)

    return mk


def q1(li, kind: str):
    mk = money_exprs(kind)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            mk(F.col("l_quantity"), "sum_qty"),
            mk(F.col("l_extendedprice"), "sum_base_price"),
            mk(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            mk(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main() -> None:
    spark = get_spark("money-sum-ab")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))

    results = {}
    rows = {}
    for kind in ("double", "dec27", "dec18", "units"):
        df = q1(li, kind)
        df.count()  # warm
        times = []
        for _ in range(PASSES):
            t0 = time.time()
            rows[kind] = df.collect()
            times.append(time.time() - t0)
        times.sort()
        results[kind] = round(times[len(times) // 2], 4)

    def vals(kind):
        return [
            tuple(r[c] for c in ("l_returnflag", "l_linestatus", "sum_qty",
                                 "sum_base_price", "sum_disc_price", "sum_charge"))
            for r in rows[kind]
        ]

    exact_18_27 = vals("dec18") == vals("dec27")
    diffs_units = sum(
        1
        for a, b in zip(vals("units"), vals("dec27"))
        for x, y in zip(a[2:], b[2:])
        if x != y
    )
    diffs_double = sum(
        1
        for a, b in zip(vals("double"), vals("dec27"))
        for x, y in zip(a[2:], b[2:])
        if x != y
    )
    out = {
        "sf_dir": SF_DIR,
        "passes": PASSES,
        "median_sec": results,
        "dec18_equals_dec27": exact_18_27,
        "units_vs_dec27_cell_diffs": diffs_units,
        "double_vs_dec27_cell_diffs": diffs_double,
        "n_groups": len(rows["dec27"]),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
