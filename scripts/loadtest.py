"""API load parity: the reference's 8-endpoint query mix over its
loadtest dataset shape.

The reference seeds 100 pulses / 1000 jet drops / 1000 records
(migrations/generate.go:27-141, configuration/configuration.go:55-61)
and attacks 8 endpoints at 5 rps for 10 s each with a zero-error
threshold and 40 s do-timeout (load/run_configs/all_sequence.yaml).
This script mirrors that locally: same dataset shape, each endpoint
executed `--iters` times back-to-back, reporting p50/p95/max wall
latency per endpoint — one JSON line, errors fatal.

Modes:
  default       in-process plan execution (plans/queries.py collects)
  --http        the same mix over the wire against the stdlib REST
                facade (block_explorer_spark/rest.py), start-to-parse
                latency per request — the reference's actual surface
                (load/run_configs/*.yaml attack HTTP endpoints too)
  --wire        the gRPC re-export surface: GetNextPulse over the
                framed protobuf TCP stream (streaming/exporter_wire),
                connect -> request -> drain-the-head latency per
                client, against an ingested warehouse
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from block_explorer_spark import get_spark, schemas
from block_explorer_spark.functions.refs import base58_encode
from block_explorer_spark.plans import queries as Q
from block_explorer_spark.sources import generators as gen


def _wire_mode(spark, args) -> None:
    """GetNextPulse over the framed protobuf stream: 20 complete
    pulses ingested through the real write path, then each iteration
    is a fresh client connect -> framed request -> drain all 20
    responses. Latency covers the q11 tail poll (one Spark job per
    poll batch), wire encode, and the socket round-trip — the same
    path a gRPC consumer of pulse_exporter_server.go exercises,
    minus HTTP/2."""
    import random
    import tempfile

    from block_explorer_spark.streaming import exporter_wire as W
    from block_explorer_spark.streaming import pipeline as P

    n_pulses = 20
    rng = random.Random(23)
    rows = []
    for k in range(n_pulses):
        pn = 4_000_000 + 10 * (k + 1)
        for jet in ("0", "1"):
            prev = None
            obj = bytes(rng.getrandbits(8) for _ in range(8))
            for i in range(5):
                ref = bytes(rng.getrandbits(8) for _ in range(8))
                rows.append(
                    {
                        "reference": ref,
                        "kind": "activate" if i == 0 else "amend",
                        "object_reference": obj,
                        "prototype_reference": b"proto",
                        "payload": b"",
                        "prev_record_reference": prev,
                        "hash": b"h",
                        "raw_data": b"r",
                        "jet_id": jet,
                        "pulse_number": pn,
                        "timestamp": 1_600_000_000 + pn,
                        "position": i,
                    }
                )
                prev = ref
    base = tempfile.mkdtemp(prefix="loadtest-wire")
    P.ingest_batch(spark, base, spark.createDataFrame(rows, schemas.RAW_RECORDS))
    P.run_control_pass(spark, base)

    with W.PulseWireServer(spark, base, pulse_period=0.2) as srv:
        host, port = srv.address

        def drain():
            got = W.stream_pulses(host, port, 0, [b"proto"], max_messages=n_pulses)
            assert len(got) == n_pulses, f"streamed {len(got)}/{n_pulses}"
            assert got[-1].record_amount == 10

        drain()  # warmup (codegen/JIT on the tail-poll plan)
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            drain()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        out = {
            "stream_20_pulses": {
                "p50_ms": round(statistics.median(lat) * 1000, 1),
                "p95_ms": round(lat[int(len(lat) * 0.95) - 1] * 1000, 1),
                "max_ms": round(lat[-1] * 1000, 1),
            }
        }
    print(
        json.dumps(
            {
                "metric": "api_load_latency",
                "mode": "wire",
                "dataset": f"{n_pulses}p/2jets/10rec-per-pulse",
                "iters": args.iters,
                "endpoints": out,
            }
        )
    )


def _wire_ingest_mode(spark, args) -> None:
    """The ingest edge over the wire: a heavymock-analog record
    exporter serves N pulses of raw records; each iteration pulls ONE
    pulse through the portion/resume client (GetRecords batch 100,
    platform_impl.go:225-326) and ingests it through the real write
    path. Reported per-pulse: wire-pull latency and pull+ingest
    latency — the end-to-end cost a heavy-node-fed deployment pays per
    consensus pulse."""
    import random
    import tempfile

    from block_explorer_spark.streaming import extractor_wire as XW
    from block_explorer_spark.streaming import pipeline as P

    n_pulses = max(4, args.iters)
    rng = random.Random(29)
    tape = {}
    for k in range(n_pulses):
        pn = 4_000_000 + 10 * (k + 1)
        rows = []
        for jet in ("0", "1"):
            prev = None
            obj = bytes(rng.getrandbits(8) for _ in range(8))
            for i in range(125):  # 250/pulse: exercises 3 portions at 100
                ref = bytes(rng.getrandbits(8) for _ in range(8))
                rows.append(
                    {
                        "reference": ref,
                        "kind": "activate" if i == 0 else "amend",
                        "object_reference": obj,
                        "prototype_reference": b"proto",
                        "payload": b"",
                        "prev_record_reference": prev,
                        "hash": b"h",
                        "raw_data": b"r",
                        "jet_id": jet,
                        "pulse_number": pn,
                        "timestamp": 1_600_000_000 + pn,
                        "position": i,
                    }
                )
                prev = ref
        tape[pn] = rows

    base = tempfile.mkdtemp(prefix="loadtest-wire-ingest")
    pull_lat, e2e_lat = [], []
    with XW.HeavyRecordServer(tape) as srv:
        for pn in sorted(tape):
            t0 = time.perf_counter()
            rows, _ = XW.retrieve_pulse_records(srv.address, pn, batch_size=100)
            t1 = time.perf_counter()
            assert len(rows) == 250, f"pulled {len(rows)}/250 for {pn}"
            P.ingest_batch(spark, base, spark.createDataFrame(rows, schemas.RAW_RECORDS))
            e2e_lat.append(time.perf_counter() - t0)
            pull_lat.append(t1 - t0)
    P.run_control_pass(spark, base)
    from block_explorer_spark.sources import parquet as pq

    assert pq.read_table(spark, base, "records").count() == 250 * n_pulses

    def stats(lat):
        lat = sorted(lat)
        return {
            "p50_ms": round(statistics.median(lat) * 1000, 1),
            "p95_ms": round(lat[int(len(lat) * 0.95) - 1] * 1000, 1),
            "max_ms": round(lat[-1] * 1000, 1),
        }

    print(
        json.dumps(
            {
                "metric": "wire_ingest_latency",
                "mode": "wire-ingest",
                "dataset": f"{n_pulses}p/2jets/250rec-per-pulse/batch100",
                "pulses": n_pulses,
                "endpoints": {
                    "pull_pulse_250rec": stats(pull_lat),
                    "pull_plus_ingest": stats(e2e_lat),
                },
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--http", action="store_true", help="drive over the REST facade")
    ap.add_argument(
        "--wire",
        action="store_true",
        help="attack the GetNextPulse framed-protobuf stream instead",
    )
    ap.add_argument(
        "--wire-ingest",
        action="store_true",
        help="pull pulses through the GetRecords framed-protobuf "
        "client and ingest them (the extractor edge)",
    )
    ap.add_argument(
        "--artifact",
        default="METRICS_LOADTEST.json",
        help="where --http mode writes the server's /metrics.json scrape",
    )
    args = ap.parse_args()

    spark = get_spark("loadtest")

    if args.wire:
        _wire_mode(spark, args)
        return
    if args.wire_ingest:
        _wire_ingest_mode(spark, args)
        return
    pulses_rows, drops_rows, records_rows = gen.make_flat_seed(
        seed=11, n_pulses=100, n_drops=1000, n_records=1000
    )
    from block_explorer_spark import api as api_mod

    pulses, drops, records = api_mod.serving_tables(
        spark.createDataFrame(pulses_rows, schemas.PULSES),
        spark.createDataFrame(drops_rows, schemas.JET_DROPS),
        spark.createDataFrame(records_rows, schemas.RECORDS),
    )

    pn = pulses_rows[40]["pulse_number"]
    d0 = drops_rows[0]
    state_recs = [r for r in records_rows if r["type"] == "state"]
    obj = state_recs[0]["object_reference"]

    if args.http:
        import tempfile

        from pyspark.sql import functions as F

        from block_explorer_spark.functions import jets
        from block_explorer_spark.operators import retrieval as R
        from block_explorer_spark.rest import BlockExplorerApi, serve

        # search extension: a 5k-doc corpus + positional index so the
        # /api/v1/search/* endpoints join the attacked mix
        docs = spark.range(5000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha w"), (F.col("id") % 97).cast("string"),
                F.lit(" beta w"), (F.col("id") % 53).cast("string"),
                F.lit(" "),
                F.when(F.col("id") % 11 == 0, F.lit("needle point")).otherwise(
                    F.lit("hay stack")
                ),
            ).alias("text"),
        ).cache()
        idx = tempfile.mkdtemp(prefix="loadtest-idx")
        R.write_postings_index(docs, idx, num_files=4, positions=True)
        api_impl = BlockExplorerApi(pulses, drops, records)
        api_impl.attach_search(docs, idx)
        server = serve(api_impl)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        d0_id = f"{jets.storage_to_display(d0['jet_id'])}:{d0['pulse_number']}"
        urls = {
            "get_pulse": f"/api/v1/pulses/{pn}",
            "get_pulses": "/api/v1/pulses?limit=20",
            "get_jet_drop_by_id": f"/api/v1/jet-drops/{d0_id}",
            "get_jet_drops_by_jet_id": f"/api/v1/jets/{d0['jet_id']}/jet-drops",
            "get_jet_drops_by_pulse_number": f"/api/v1/pulses/{d0['pulse_number']}/jet-drops?limit=20",
            "get_records": f"/api/v1/jet-drops/{d0_id}/records?limit=20",
            "get_lifeline": f"/api/v1/lifeline/{base58_encode(bytes(obj))}/records?limit=20",
            "search": f"/api/v1/search?value={base58_encode(bytes(obj))}",
            "search_documents": "/api/v1/search/documents?query=needle+alpha&limit=20",
            "search_phrase": "/api/v1/search/phrase?phrase=needle+point&limit=20",
            "search_context": "/api/v1/search/context?term=needle&limit=20",
        }

        def make_fn(path: str):
            def fn():
                with urllib.request.urlopen(base + path, timeout=60) as resp:
                    assert resp.status == 200, f"{path} -> {resp.status}"
                    json.loads(resp.read())

            return fn

        endpoints = {name: make_fn(path) for name, path in urls.items()}
        mode = "http"
    else:
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
        mode = "in-process"

    # warmup: one untimed round (codegen/JIT). serve() already
    # pre-warmed every endpoint plan (round-6 item 5); this round pays
    # whatever one-time HTTP/render cost remains. In http mode, record
    # those firsts from the server's own timers, then RESET its window
    # so the artifact reports the steady-state percentiles a long-
    # lived server exhibits (p95 over 11 samples where one is process
    # warmup degenerates to that sample) — the firsts are reported,
    # not hidden.
    for fn in endpoints.values():
        fn()
    first_request_ms = None
    if args.http:
        with urllib.request.urlopen(base + "/metrics.json", timeout=30) as resp:
            warm_scrape = json.loads(resp.read())
        first_request_ms = {
            name: st["max_ms"]
            for name, st in warm_scrape.get("endpoints", warm_scrape).items()
            if isinstance(st, dict) and "max_ms" in st
        }
        req = urllib.request.Request(base + "/metrics/reset", method="POST", data=b"")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200

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

    print(json.dumps({"metric": "api_load_latency", "mode": mode,
                      "dataset": "100p/1000jd/1000r",
                      "iters": args.iters, "endpoints": out}))

    if args.http:
        # The server's own continuous metrics (per-endpoint timers +
        # Spark stage totals) — the reference's Prometheus scrape,
        # persisted as an artifact per run.
        with urllib.request.urlopen(base + "/metrics.json", timeout=30) as resp:
            server_metrics = json.loads(resp.read())
        server_metrics["first_request_ms"] = first_request_ms
        with open(args.artifact, "w") as f:
            json.dump(server_metrics, f, indent=1, sort_keys=True)
        print(f"# server metrics -> {args.artifact}", file=sys.stderr)


if __name__ == "__main__":
    main()
