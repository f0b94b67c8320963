"""API load parity: the reference's 8-endpoint query mix over its
loadtest dataset shape.

The reference seeds 100 pulses / 1000 jet drops / 1000 records
(migrations/generate.go:27-141, configuration/configuration.go:55-61)
and attacks 8 endpoints at 5 rps for 10 s each with a zero-error
threshold and 40 s do-timeout (load/run_configs/all_sequence.yaml).
This script mirrors that locally: same dataset shape, each endpoint
executed `--iters` times back-to-back, reporting p50/p95/max wall
latency per endpoint — one JSON line, errors fatal.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from block_explorer_spark import get_spark, schemas
from block_explorer_spark.functions.refs import base58_encode
from block_explorer_spark.plans import queries as Q
from block_explorer_spark.sources import generators as gen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("loadtest")
    pulses_rows, drops_rows, records_rows = gen.make_flat_seed(
        seed=11, n_pulses=100, n_drops=1000, n_records=1000
    )
    pulses = spark.createDataFrame(pulses_rows, schemas.PULSES).cache()
    drops = spark.createDataFrame(drops_rows, schemas.JET_DROPS).cache()
    records = spark.createDataFrame(records_rows, schemas.RECORDS).cache()
    pulses.count(), drops.count(), records.count()

    pn = pulses_rows[40]["pulse_number"]
    d0 = drops_rows[0]
    state_recs = [r for r in records_rows if r["type"] == "state"]
    obj = state_recs[0]["object_reference"]

    endpoints = {
        "get_pulse": lambda: Q.get_pulse(pulses, pn).collect(),
        "get_pulses": lambda: Q.get_pulses(pulses, limit=20)[0].collect(),
        "get_jet_drop_by_id": lambda: [
            df.collect() for df in Q.get_jet_drop_by_id(drops, d0["jet_id"], d0["pulse_number"])
        ],
        "get_jet_drops_by_jet_id": lambda: Q.get_jet_drops_by_jet_id(drops, d0["jet_id"])[0].collect(),
        "get_jet_drops_by_pulse_number": lambda: Q.get_jet_drops_by_pulse(
            drops, d0["pulse_number"], limit=20
        )[0].collect(),
        "get_records": lambda: Q.get_records_by_jet_drop(
            records, d0["jet_id"], d0["pulse_number"], limit=20
        )[0].collect(),
        "get_lifeline": lambda: Q.get_lifeline(records, obj, limit=20)[0].collect(),
        "search": lambda: Q.search(pulses, drops, records, base58_encode(bytes(obj)))[1].collect(),
    }

    # warmup: one untimed round (codegen/JIT)
    for fn in endpoints.values():
        fn()

    out = {}
    for name, fn in endpoints.items():
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        out[name] = {
            "p50_ms": round(statistics.median(lat) * 1000, 1),
            "p95_ms": round(lat[int(len(lat) * 0.95) - 1] * 1000, 1),
            "max_ms": round(lat[-1] * 1000, 1),
        }
        print(f"# {name}: p50={out[name]['p50_ms']}ms p95={out[name]['p95_ms']}ms", file=sys.stderr)

    print(json.dumps({"metric": "api_load_latency", "dataset": "100p/1000jd/1000r",
                      "iters": args.iters, "endpoints": out}))


if __name__ == "__main__":
    main()
