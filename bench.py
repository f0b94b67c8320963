"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Each query is forced to execute fully (count + a cheap collect of a
bounded head) so lazy plans can't cheat; timings include plan +
execution, excluding session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from block_explorer_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: one per operator family, weighted toward the shapes
#: that matter at scale (agg, join, window, dedup, similarity).
HEADLINE = [
    "q01_keyset_page",
    "q03_chain_repair",
    "q07_counters",
    "q11_exporter_join",
    "q13_sessionize",
    "q16_tpch_q1",
    "q17_tpch_q3",
    "q18_tpch_q5",
    "q19_tpch_q6",
    "q20_dedup_exact",
    "q25_minhash_lsh",
    "q27_ann_brute",
    "q28_embed_neardup",
]


def main() -> None:
    spark = get_spark("bench")
    queries = entrymod.queries()
    # JMH-style warmup: one untimed pass over the full headline set so
    # the timed pass measures steady-state execution, not one-time JVM
    # JIT + whole-stage-codegen (janino) compilation. The reference
    # baseline is a warm long-running service under sustained load
    # (load/run_configs/all_sequence.yaml: 10 s attacks at 5 rps), so
    # steady-state is the comparable regime.
    for name in HEADLINE:
        queries[name](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        df.limit(100).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
