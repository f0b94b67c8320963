"""Round-9 brief item 3: split q25 (MinHash+LSH near-dup pairs) into
its pipeline stages and time each at a given scale, so the x1000 tail
(435.7 s, 212 GB memory spill in SCALE_CURVE r8) gets attributed to a
stage instead of guessed at.

Stages (cumulative — each includes its predecessors, the deltas are
the per-stage costs):
  sig     shingle-hash -> grouped hashes -> Arrow minhash+band fold
  cand    + band-bucket grouping + in-bucket pair expansion + dedup
  full    + exact set verification (the gate's output)

Usage: python scripts/profile_q25.py [x100|x1000|<dir>] [--out FILE]
Writes/merges a JSON record (same shape as SCALE_CURVE rows) with the
per-stage wall + shuffle/spill from StageMetrics.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scale", nargs="?", default="x100")
    ap.add_argument("--out", default="Q25_PROFILE.json")
    args = ap.parse_args()
    sf_dir = (
        args.scale
        if os.path.isdir(args.scale)
        else f"/root/repo/.scale/{args.scale}"
    )

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
        "profile-q25",
        **{
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum":
                os.environ["SPARK_GRAFT_WIDE_SHUFFLE"],
        },
    )
    mets = StageMetrics(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    shingles = Tx.word_ngrams("text", 3)
    MB = 1024 * 1024

    def timed(label, df):
        t0 = time.perf_counter()
        n, delta = mets.measure(lambda: df.count())
        sec = round(time.perf_counter() - t0, 2)
        rec = {
            "rows_out": n,
            "sec": sec,
            "shuffle_read_mb": round(delta.get("shuffleReadBytes", 0) / MB, 1),
            "shuffle_write_mb": round(delta.get("shuffleWriteBytes", 0) / MB, 1),
            "spill_mb": round(delta.get("memoryBytesSpilled", 0) / MB, 1),
            "spill_disk_mb": round(delta.get("diskBytesSpilled", 0) / MB, 1),
        }
        print(f"# {label}: {json.dumps(rec)}", file=sys.stderr)
        return rec

    banded = D._banded_signatures(docs, "doc_id", shingles, 128, 16)
    # untimed warmup: codegen + Arrow python worker spin-up + parquet
    # footer cache would otherwise all land in the first stage's time
    D._banded_signatures(docs.limit(2000), "doc_id", shingles, 128, 16).count()
    sig = timed("sig", banded)
    cand_df = D.minhash_lsh_pairs(
        docs, "doc_id", shingles, threshold=0.8, num_hashes=128, bands=16,
        verify=False,
    )
    cand = timed("cand", cand_df)
    full_df = D.minhash_lsh_pairs(
        docs, "doc_id", shingles, threshold=0.8, num_hashes=128, bands=16,
    )
    full = timed("full", full_df)

    out = {}
    if os.path.exists(args.out):
        out = json.load(open(args.out))
    out[args.scale] = {
        "n_docs": n_docs,
        "stage_cumulative": {"sig": sig, "cand": cand, "full": full},
        "stage_delta_sec": {
            "sig": sig["sec"],
            "band_bucket_pairs": round(cand["sec"] - sig["sec"], 2),
            "verify": round(full["sec"] - cand["sec"], 2),
        },
    }
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({"metric": "q25_profile", "scale": args.scale, **out[args.scale]}))


if __name__ == "__main__":
    main()
