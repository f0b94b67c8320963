"""Round-9 brief item 2 evidence: per-round shuffle volumes for the
large-star/small-star connected-components loop (q83's closure step).

The gate-level SCALE_CURVE row shows the total; this script re-runs
the SAME alternation round-by-round on the scale corpus's near-dup
pairs and logs, per round: edge count in/out, wall seconds, shuffle
read/write, and spill — demonstrating the property the star rework
bought: the working edge set CONTRACTS toward the star forest, so
per-round shuffle volume FALLS monotonically, where the old hash-min
loop re-shuffled the full symmetric edge set against labels every
round (O(diameter) rounds of constant volume).

Attribution caveat: per-round deltas snapshot completed stages around
each count(); stages that finish asynchronously after the action (e.g.
localCheckpoint follow-up stages) are attributed to the NEXT round, so
single-round shuffle numbers can skew slightly — the monotone-decrease
TREND across rounds is the signal, not any one row.

Usage: python scripts/profile_q83.py [x100|x1000|<dir>] [--out FILE]
Writes/merges Q83_PROFILE.json keyed by scale tag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from block_explorer_spark import get_spark
from block_explorer_spark.functions import text as Tx
from block_explorer_spark.metrics import StageMetrics
from block_explorer_spark.operators import dedup as D
from block_explorer_spark.operators.graph import _large_star, _small_star


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scale", nargs="?", default="x100")
    ap.add_argument("--out", default="Q83_PROFILE.json")
    args = ap.parse_args()
    sf_dir = (
        args.scale
        if os.path.isdir(args.scale)
        else f"/root/repo/.scale/{args.scale}"
    )
    tag = os.path.basename(sf_dir.rstrip("/"))

    os.environ.setdefault("SPARK_GRAFT_WIDE_SHUFFLE", "256")
    # Heap: measured BOTH ways at the x1000 corpus this round — the
    # 8 GB default beat a 48 GB heap on the heavy legs (q83 716 s vs
    # 1003 s): with 48 GB the corpus-wide SMJ sorts stay in-heap and
    # go GC-bound, while at 8 GB they spill to fast local NVMe and the
    # JVM stays responsive. (Round-4 curves recorded "48 GB heap" —
    # that config does not transfer to this box.) So: no override here;
    # export SPARK_GRAFT_DRIVER_MEM to experiment (read lazily by
    # session.builder, so setting it before get_spark works).
    spark = get_spark(
        "profile-q83",
        **{
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum":
                os.environ["SPARK_GRAFT_WIDE_SHUFFLE"],
        },
    )
    mets = StageMetrics(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = D.jaccard_pairs_prefix(
        docs, "doc_id", Tx.word_ngrams("text", 3), threshold=0.8
    )

    # Materialize the pair set once so round timings measure ONLY the
    # alternation (pair generation has its own q24/q25 profiles).
    t0 = time.time()
    e = pairs.select(
        F.greatest("id_a", "id_b").alias("u"),
        F.least("id_a", "id_b").alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    cur = e.localCheckpoint(eager=True)
    n_cur = cur.count()
    prep_sec = round(time.time() - t0, 2)

    rounds = []
    for rnd in range(1, 26):
        before = mets.totals()
        t0 = time.time()
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        fixed = n_nxt == n_cur and nxt.exceptAll(cur).limit(1).count() == 0
        dt = mets.delta(before, mets.totals())
        row = {
            "round": rnd,
            "edges_in": n_cur,
            "edges_out": n_nxt,
            "sec": round(time.time() - t0, 2),
            "shuffle_write_mb": round(dt["shuffleWriteBytes"] / 1e6, 1),
            "shuffle_read_mb": round(dt["shuffleReadBytes"] / 1e6, 1),
            "spill_mb": round(
                (dt["memoryBytesSpilled"] + dt["diskBytesSpilled"]) / 1e6, 1
            ),
            "fixed_point": fixed,
        }
        rounds.append(row)
        print(f"# round {rnd}: {row}", flush=True)
        cur, n_cur = nxt, n_nxt
        if fixed:
            break

    rec = {
        "sf_dir": sf_dir,
        "pair_prep_sec": prep_sec,
        "rounds": rounds,
        "n_rounds": len(rounds),
        "converged": bool(rounds and rounds[-1]["fixed_point"]),
    }
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    out[tag] = rec
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({tag: {"n_rounds": rec["n_rounds"], "prep_sec": prep_sec}}))
    spark.stop()


if __name__ == "__main__":
    main()
