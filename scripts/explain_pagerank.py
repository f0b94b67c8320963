"""Capture the REAL per-materialization plans of q116's pagerank for
the plans/r11 before/after evidence.

With use_checkpoint=True each localCheckpoint cut collapses the
downstream plan to `Scan ExistingRDD`, so a single explain of the
final frame cannot show what the loop recomputes. Instead this harness
wraps graph._cut with a recorder: every DataFrame handed to _cut is
explained AT CUT TIME — exactly the plan that materialization
executes. The interesting diff is the FIRST ranks cut (one loop
iteration): before the change it re-derives the distinct edge set,
out-degree aggregate and vertex set from the raw orders⋈lineitem
lineage; after, it reads two checkpointed RDDs.

Usage: python scripts/explain_pagerank.py <graph_module.py> <out.txt> [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

from block_explorer_spark import get_spark  # noqa: E402

mod_path, out_path = sys.argv[1], sys.argv[2]
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

spec = importlib.util.spec_from_file_location("graph_variant", mod_path)
G = importlib.util.module_from_spec(spec)
spec.loader.exec_module(G)

spark = get_spark("explain-pagerank")

plans: list[str] = []
real_cut = G._cut


def recording_cut(df, eager=True):
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    plans.append(
        f"## _cut #{len(plans) + 1} (eager={eager}) — plan executed at this "
        f"materialization\n"
        f"## parquet scans: orders={txt.count('orders.parquet')} "
        f"lineitem={txt.count('lineitem.parquet')}; "
        f"Exchange nodes: {txt.count('Exchange')}\n\n{txt}"
    )
    return real_cut(df, eager=eager)


G._cut = recording_cut

o = entrymod._t(spark, sf_dir, "orders")
li = entrymod._t(spark, sf_dir, "lineitem")
edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
    F.col("o_custkey").alias("src"),
    (F.col("l_suppkey") + entrymod.PR_SUPP_OFFSET).alias("dst"),
)
ranks = G.pagerank_int(edges, iters=entrymod.PR_ITERS, scale=entrymod.PR_SCALE)
df = (
    ranks.orderBy(F.desc("rank"), F.asc("id"))
    .limit(entrymod.PR_TOPK)
    .select(F.col("id").cast("long").alias("id"), F.col("rank"))
)
df.write.format("noop").mode("overwrite").save()  # execute the real path

hdr = (
    "# q116_pagerank with use_checkpoint=True (the shipped path):\n"
    "# plan of EVERY _cut materialization, captured at cut time.\n"
    f"# graph module: {os.path.basename(mod_path)}; cuts: {len(plans)}\n\n"
)
with open(out_path, "w") as fh:
    fh.write(hdr + "\n\n".join(plans))
print(f"wrote {out_path} ({len(plans)} cut plans)", file=sys.stderr)
