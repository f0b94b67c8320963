"""Capture `.explain("formatted")` output per gate query into
plans/<round>/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge reads these files; it cannot run Spark).

Usage:
  python scripts/capture_plans.py <tag> [sf_dir] [query ...]

  tag      "before" | "after" (file suffix)
  sf_dir   defaults to /root/testdata/sf0.1 (the bench SF)
  query    subset of __spark_entry__.queries() names; default: the
           bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402

from block_explorer_spark import get_spark  # noqa: E402

OUT_DIR = os.path.join(REPO, "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = entrymod.queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover
            txt = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
