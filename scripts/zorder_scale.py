"""Measure z-order data skipping as the store grows (SCALE.md
evidence). For each scale: cluster-write a synthetic 2-D table
(uniform independent dims), then time a fixed-selectivity 2-D box
read (a) through the manifest zone pruning and (b) brute-force over
every file, and count files opened. The claim to verify: kept/total
stays ~(box area fraction + boundary overhang) as files grow 16× —
i.e. the read cost of a selective box scales with the BOX, not the
table.

Usage: python scripts/zorder_scale.py [out_json]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from block_explorer_spark import get_spark  # noqa: E402
from block_explorer_spark.operators import zorder as Z  # noqa: E402


def synth(spark, n: int):
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).alias("b"),
    )


def main() -> None:
    spark = get_spark("zorder-scale")
    out = []
    # 1/8-wide box on each dim → 1/64 of the area
    box = {"a": (0, 125_000), "b": (500_000, 625_000)}
    for rows, files in [(100_000, 16), (1_000_000, 64), (10_000_000, 256)]:
        base = tempfile.mkdtemp(prefix=f"zscale-{files}-")
        df = synth(spark, rows)
        t0 = time.time()
        Z.cluster_write(df, base, "t", ["a", "b"], bits=12, num_files=files)
        t_write = time.time() - t0

        kept, total = Z.pruned_files(base, "t", box)
        t0 = time.time()
        n_pruned = Z.read_clustered(spark, base, "t", box).count()
        t_pruned = time.time() - t0
        # brute force: read every file, same row-level filter
        import os

        from block_explorer_spark.sources import manifest as M

        t0 = time.time()
        m_all = [
            os.path.join(base, r) for r in M.read(base)["families"]["t"]
        ]
        full = spark.read.parquet(*m_all)
        for c, (lo, hi) in box.items():
            full = full.filter((F.col(c) >= lo) & (F.col(c) <= hi))
        n_full = full.count()
        t_full = time.time() - t0

        rec = {
            "rows": rows,
            "files": files,
            "files_kept": len(kept),
            "kept_frac": round(len(kept) / total, 3),
            "write_s": round(t_write, 2),
            "read_pruned_s": round(t_pruned, 2),
            "read_full_s": round(t_full, 2),
            "rows_match": n_pruned == n_full,
            "box_rows": n_pruned,
        }
        print(json.dumps(rec))
        assert rec["rows_match"], rec
        out.append(rec)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
