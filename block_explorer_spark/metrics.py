"""Per-query execution metrics via Spark's public monitoring REST API.

The reference instruments every storage operation with Prometheus
timers and gauges (etl/storage/storage_metrics.go:1-125,
etl/extractor/metrics.go). Spark already measures the equivalent —
task time, input volume, shuffle read/write, spill — per stage; this
module snapshots the completed-stage totals around a unit of work and
reports the delta, giving each benchmark query a task/shuffle/spill
profile without any listener plumbing (the REST monitoring API is the
stable public surface; a py4j SparkListener would need the callback
server).

Requires a session built with spark.ui.enabled=true (the engine's
default session disables the UI; bench.py opts in).
"""

from __future__ import annotations

import json
import urllib.request

#: Stage fields summed into a profile — the same quantities
#: storage_metrics.go exports as timers/counters, plus shuffle/spill
#: which have no reference analog but dominate at 100 TB.
FIELDS = (
    "executorRunTime",
    "executorCpuTime",
    "inputBytes",
    "inputRecords",
    "outputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "numTasks",
)


class StageMetrics:
    """Snapshot/delta collector over completed stages."""

    def __init__(self, spark):
        self._spark = spark
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            raise RuntimeError("Spark UI disabled; build the session with spark.ui.enabled=true")
        app_id = spark.sparkContext.applicationId
        self._url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"

    def totals(self) -> dict[str, int]:
        with urllib.request.urlopen(self._url, timeout=10) as resp:
            stages = json.loads(resp.read())
        out = dict.fromkeys(FIELDS, 0)
        for st in stages:
            for f in FIELDS:
                out[f] += int(st.get(f, 0))
        return out

    @staticmethod
    def delta(before: dict[str, int], after: dict[str, int]) -> dict[str, int]:
        return {f: after[f] - before[f] for f in FIELDS}

    def measure(self, fn):
        """Run fn(); return (fn_result, stage-metrics delta)."""
        before = self.totals()
        result = fn()
        return result, self.delta(before, self.totals())
