"""Phase-level profile of the ingest path (guide §1: measure first).

Runs the bench's ingest shapes with (a) wall timers monkey-patched
around the write-path phases (stage_df / commit / file_stats /
collect-driven planning steps) and (b) the monitoring REST jobs
timeline, so each ~2 s ingest decomposes into its constituent Spark
jobs + driver-side gaps. Output: one JSON report on stdout.

Usage: python scripts/profile_ingest.py [shape ...]
  shape: NxJ (e.g. 500x1). Default: 500x1 2000x1 500x20 + 4x500 group.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from block_explorer_spark import get_spark  # noqa: E402

PHASES: list[tuple[str, float, float]] = []  # (name, t0, dt)


def _wrap(mod, name: str, label: str | None = None):
    fn = getattr(mod, name)
    lbl = label or name

    @functools.wraps(fn)
    def inner(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            PHASES.append((lbl, t0, time.perf_counter() - t0))

    setattr(mod, name, inner)
    return fn


def main() -> None:
    spark = get_spark("profile_ingest", **{"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    t_origin = time.perf_counter()

    import bench as B
    from block_explorer_spark import schemas
    from block_explorer_spark.sources import manifest as Mf
    from block_explorer_spark.sources import parquet as pq
    from block_explorer_spark.streaming import pipeline as P

    _wrap(Mf, "stage_df")
    _wrap(Mf, "commit")
    _wrap(Mf, "file_stats")
    _wrap(Mf, "read", "manifest_read")
    _wrap(pq, "_plan_and_stage")
    _wrap(pq, "upsert_many")
    _wrap(P, "ingest_batch")

    import shutil
    import tempfile

    # warmup (as the bench does) so codegen/write one-timers are absorbed
    warm = tempfile.mkdtemp(prefix="bes_prof_warm_")
    P.ingest_batch(
        spark, warm,
        spark.createDataFrame(B._ingest_raw_rows(4_000_000, 100, 1), schemas.RAW_RECORDS),
    )
    shutil.rmtree(warm)
    PHASES.clear()

    shapes = []
    for a in sys.argv[1:]:
        n, j = a.split("x")
        shapes.append((int(n), int(j)))
    if not shapes:
        shapes = [(500, 1), (2000, 1), (500, 20)]

    report: dict = {}
    for n, j in shapes:
        base = tempfile.mkdtemp(prefix="bes_prof_")
        raw = spark.createDataFrame(B._ingest_raw_rows(4_000_010, n, j), schemas.RAW_RECORDS)
        mark = len(PHASES)
        sc.setJobDescription(f"ingest_{n}x{j}")
        t0 = time.perf_counter()
        P.ingest_batch(spark, base, raw)
        landed = pq.read_table(spark, base, "records").count()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        assert landed == n
        report[f"ingest_{n}x{j}"] = {
            "wall_s": round(wall, 3),
            "phases": [
                {"phase": p, "at_s": round(t0_ - t_origin, 3), "dt_s": round(dt, 3)}
                for p, t0_, dt in PHASES[mark:]
            ],
        }
        shutil.rmtree(base)

    # the 4x500 per-commit loop (the heaviest bench entry)
    base = tempfile.mkdtemp(prefix="bes_prof_seq_")
    mark = len(PHASES)
    sc.setJobDescription("ingest_4x500_per_commit")
    t0 = time.perf_counter()
    for i in range(4):
        raw = spark.createDataFrame(
            B._ingest_raw_rows(4_000_010 + 10 * i, 500, 1), schemas.RAW_RECORDS
        )
        P.ingest_batch(spark, base, raw)
    landed = pq.read_table(spark, base, "records").count()
    wall = time.perf_counter() - t0
    sc.setJobDescription(None)
    assert landed == 2000, landed
    report["ingest_4x500_per_commit"] = {
        "wall_s": round(wall, 3),
        "phases": [
            {"phase": p, "at_s": round(t0_ - t_origin, 3), "dt_s": round(dt, 3)}
            for p, t0_, dt in PHASES[mark:]
        ],
    }
    shutil.rmtree(base)

    # Spark jobs timeline (public monitoring REST)
    ui = sc.uiWebUrl
    app = sc.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/jobs", timeout=10
    ) as resp:
        jobs = json.loads(resp.read())
    report["jobs"] = [
        {
            "id": jb["jobId"],
            "desc": (jb.get("description") or jb.get("name", ""))[:90],
            "ms": _dur_ms(jb),
            "stages": jb.get("numCompletedStages"),
            "tasks": jb.get("numCompletedTasks"),
        }
        for jb in sorted(jobs, key=lambda x: x["jobId"])
    ]
    print(json.dumps(report, indent=1))


def _dur_ms(jb: dict) -> float | None:
    from datetime import datetime

    try:
        fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
        a = datetime.strptime(jb["submissionTime"], fmt)
        b = datetime.strptime(jb["completionTime"], fmt)
        return round((b - a).total_seconds() * 1000, 1)
    except Exception:
        return None


if __name__ == "__main__":
    main()
