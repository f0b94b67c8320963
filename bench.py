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
#: Timed passes per entry; the reported number is the MEDIAN (min/max
#: are kept in "spread"). 3 is the floor that makes one noisy sample
#: harmless (r6 measured ±16-28% single-sample drift on this machine).
N_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

#: The reference's ingest benchmark shapes (records, jet_drops) —
#: test/integration/integration_bench_test.go:17-185. Each timing is
#: the full pipeline: D2 decode + J6 chain sort + order assignment +
#: idempotent MERGE of pulses/jet_drops/records + a readback count
#: (the reference's "wait until record count reached").
INGEST_SHAPES = [(500, 1), (1000, 1), (2000, 1), (500, 5), (500, 10), (500, 20)]


def _ingest_raw_rows(pn: int, n_records: int, n_jets: int) -> list[dict]:
    """One pulse of raw platform-shaped records: per jet, one object
    with an activate→amend chain (the shape the reference's heavymock
    generates)."""
    width = max(1, (n_jets - 1).bit_length())
    jets = [format(i, f"0{width}b") for i in range(n_jets)]
    per_jet = n_records // n_jets
    rows: list[dict] = []
    for j_idx, jet in enumerate(jets):
        prev = None
        # references/objects are namespaced by pulse: the group-commit
        # bench MERGEs four pulses into one table, and pulse-agnostic
        # PKs would collapse them to one batch's rows
        obj = (pn * 1_000 + j_idx).to_bytes(8, "big")
        for i in range(per_jet):
            ref = (pn * 100_000 + j_idx * per_jet + i).to_bytes(8, "big")
            rows.append(
                {
                    "reference": ref,
                    "kind": "activate" if i == 0 else "amend",
                    "object_reference": obj,
                    "prototype_reference": b"proto",
                    "payload": b"p" * 16,
                    "prev_record_reference": prev,
                    "hash": ref,
                    "raw_data": b"r" * 16,
                    "jet_id": jet,
                    "pulse_number": pn,
                    "timestamp": 1_600_000_000,
                    "position": i,
                }
            )
            prev = ref
    return rows


def bench_ingest(spark) -> dict[str, float]:
    import shutil
    import tempfile

    from block_explorer_spark import schemas
    from block_explorer_spark.sources import parquet as pq
    from block_explorer_spark.streaming import pipeline as P

    # warmup: one small ingest to absorb codegen/write-path one-timers
    warm = tempfile.mkdtemp(prefix="bes_ingest_warm_")
    P.ingest_batch(spark, warm, spark.createDataFrame(_ingest_raw_rows(4_000_000, 100, 1), schemas.RAW_RECORDS))
    shutil.rmtree(warm)

    timings: dict[str, float] = {}
    for n, j in INGEST_SHAPES:
        base = tempfile.mkdtemp(prefix="bes_ingest_")
        raw = spark.createDataFrame(_ingest_raw_rows(4_000_010, n, j), schemas.RAW_RECORDS)
        t0 = time.perf_counter()
        P.ingest_batch(spark, base, raw)
        landed = pq.read_table(spark, base, "records").count()
        timings[f"ingest_{n}x{j}"] = round(time.perf_counter() - t0, 3)
        assert landed == n, f"ingest_{n}x{j}: {landed} != {n}"
        print(f"# ingest_{n}x{j}: {landed} records in {timings[f'ingest_{n}x{j}']}s", file=sys.stderr)
        shutil.rmtree(base)
    return timings

def bench_ingest_group(spark) -> dict[str, float]:
    """Round-7 item 4: the SAME 4x500-record load, two commit
    disciplines — 4 per-batch manifest swaps (the reference's
    per-jet-drop-batch shape) vs the streaming group-commit spool
    (4 plain parquet appends + ONE MERGE + ONE swap, including its
    control pass). The delta is the amortizable CAS cost."""
    import shutil
    import tempfile

    from block_explorer_spark import schemas
    from block_explorer_spark.sources import parquet as pqs
    from block_explorer_spark.streaming import pipeline as P

    timings: dict[str, float] = {}

    base = tempfile.mkdtemp(prefix="bes_ingest_solo_")
    t0 = time.perf_counter()
    for i in range(4):
        raw = spark.createDataFrame(
            _ingest_raw_rows(4_000_010 + 10 * i, 500, 1), schemas.RAW_RECORDS
        )
        P.ingest_batch(spark, base, raw)
    landed = pqs.read_table(spark, base, "records").count()
    timings["ingest_4x500_per_commit"] = round(time.perf_counter() - t0, 3)
    assert landed == 2000, landed
    shutil.rmtree(base)

    base = tempfile.mkdtemp(prefix="bes_ingest_grp_")
    ckpt = tempfile.mkdtemp(prefix="bes_ingest_grpck_")
    t0 = time.perf_counter()
    for i in range(4):
        raw = spark.createDataFrame(
            _ingest_raw_rows(4_000_010 + 10 * i, 500, 1), schemas.RAW_RECORDS
        )
        raw.write.mode("append").parquet(P._spool_dir(ckpt))
    P.flush_pending(spark, base, ckpt)
    landed = pqs.read_table(spark, base, "records").count()
    timings["ingest_4x500_group_commit"] = round(time.perf_counter() - t0, 3)
    assert landed == 2000, landed
    shutil.rmtree(base)
    shutil.rmtree(ckpt)
    return timings


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
    "q70_tpch_q9",
    "q76_repetition",
    "q81_quantized_ann",
    "q86_corpus_pipeline",
    # round 4: semantic dedup + cross-doc n-gram audit join the
    # headline set (the other two new ops, q89/q90, are trivial
    # aggregate shapes already represented by q77/q84)
    "q88_semantic_dedup",
    "q91_crossdoc_ngrams",
    # round 5: exact substring dedup (window-hash + span merge) and
    # BPE tokenization (type-table train + Arrow apply) join; q97 is
    # q90's shape and q98 is fixture-sized — already represented
    "q95_exact_substring_dedup",
    "q96_bpe_tokenize",
    # round 7: the two heaviest new extended-surface shapes join —
    # BM25 retrieval (explode + query-scoped postings + pivot) and
    # integer PageRank (5 iterative shuffles). The sketch gates
    # (q102-q105, q110, q112) are sub-second counter collapses and
    # the analytics gates (q108/q109/q114/q115/q117) are single
    # agg/window shapes already represented.
    "q113_bm25_search",
    "q116_pagerank",
    # round 8 (cont.): the two heaviest new shapes — degree-ordered
    # triangle counting (wedge + closing joins over the co-supplier
    # graph) and windowed co-occurrence (position self-join under
    # range-join binning). BFS/Bellman-Ford are pagerank's
    # join-per-round shape, chunking/KWIC are map-only, and the
    # store-backed gates (q130/q136/q140) would time their one-time
    # gate-store build on a fresh machine — excluded by design.
    "q134_triangle_counts",
    "q135_cooccurrence",
]


def calibration(spark) -> dict:
    """Fixed-work instance-speed probe, reported beside the timings.

    Each bench round runs on a freshly provisioned VM; r6→r7 showed a
    UNIFORM ~10-15% drift on queries whose code did not change, which
    is inter-instance hardware variance, not regression. These three
    fixed workloads (pure-Python spin, BLAS GEMM, Spark codegen
    aggregate) fingerprint the instance so cross-round comparisons
    can be normalized: divide query seconds by the calibration ratio
    before calling a delta a regression.
    """
    import numpy as _np

    def _med(f, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[1], 4)

    a = _np.random.default_rng(7).standard_normal((1024, 1024))
    spin = _med(lambda: sum(range(5_000_000)))
    gemm = _med(lambda: a @ a)
    spark_agg = _med(
        lambda: spark.range(0, 50_000_000, numPartitions=32)
        .selectExpr("sum(xxhash64(id) % 1000000) s")  # bounded: no ANSI overflow
        .collect()
    )
    return {"python_spin_s": spin, "gemm_1024_s": gemm, "spark_codegen_agg_s": spark_agg}


def main() -> None:
    # UI on: the public monitoring REST API is how per-query
    # task/shuffle/spill profiles are captured (metrics.StageMetrics).
    spark = get_spark("bench", **{"spark.ui.enabled": "true"})
    try:
        from block_explorer_spark.metrics import StageMetrics

        collector = StageMetrics(spark)
    except Exception:
        collector = None  # UI couldn't bind; timings still produced
    queries = entrymod.queries()
    # JMH-style warmup: one untimed pass over the full headline set so
    # the timed pass measures steady-state execution, not one-time JVM
    # JIT + whole-stage-codegen (janino) compilation. The reference
    # baseline is a warm long-running service under sustained load
    # (load/run_configs/all_sequence.yaml: 10 s attacks at 5 rps), so
    # steady-state is the comparable regime.
    for name in HEADLINE:
        queries[name](spark, SF_DIR).count()

    # Three timed passes, MEDIAN per query (round-7 VERDICT item 3:
    # the r6 single-sample bench drifted ±16-28% on untouched queries,
    # making regressions indistinguishable from noise; the median of 3
    # rejects one bad sample per query, and min/max ride along in
    # "spread" so the noise band is itself an artifact, not a guess).
    # persist → count → head-collect → unpersist: the count fully
    # materializes every column into the cache (so lazy plans can't
    # cheat and value computation is forced), and the head collect
    # reads from that cache — ONE execution of the plan per timing,
    # not two (count + collect on an uncached DF would re-run the
    # whole lineage; Spark has no automatic exchange/plan reuse
    # across separate actions).
    samples: dict[str, list[tuple[float, dict | None]]] = {n: [] for n in HEADLINE}
    for _pass in range(N_PASSES):
        for name in HEADLINE:
            fn = queries[name]
            before = collector.totals() if collector else None
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR).persist()
            n = df.count()
            df.limit(100).collect()
            elapsed = round(time.perf_counter() - t0, 3)
            df.unpersist()
            prof = collector.delta(before, collector.totals()) if collector else None
            samples[name].append((elapsed, prof))
            print(f"# pass{_pass} {name}: {n} rows in {elapsed}s", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    profiles: dict[str, dict] = {}
    for name, ss in samples.items():
        ss.sort(key=lambda t: t[0])
        med, prof = ss[len(ss) // 2]
        timings[name] = med
        spread[name] = {"min": ss[0][0], "max": ss[-1][0], "n": len(ss)}
        if prof is not None:
            profiles[name] = prof

    # Reset JVM state between the analytic and ingest sections: cached
    # blocks and accumulated shuffle files from the query passes
    # otherwise bleed GC pressure into the ingest timings (observed
    # 2-3x inflation vs running bench_ingest standalone).
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    ingest_runs = [
        {**bench_ingest(spark), **bench_ingest_group(spark)}
        for _ in range(N_PASSES)
    ]
    for k in ingest_runs[0]:
        vals = sorted(run[k] for run in ingest_runs)
        timings[k] = vals[len(vals) // 2]
        spread[k] = {"min": vals[0], "max": vals[-1], "n": len(vals)}

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
        "spread": spread,
        "aggregation": f"median_of_{N_PASSES}",
        "calibration": calibration(spark),
        "sf": sf_val,
    }
    if profiles:
        # Per-query task/shuffle/spill counters (parity with the
        # reference's storage_metrics.go Prometheus surface) — written
        # as a separate artifact so stdout stays one JSON line.
        artifact = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_METRICS.json")
        with open(artifact, "w") as fh:
            json.dump({"sf": sf_val, "stage_profiles": profiles}, fh, indent=1, sort_keys=True)
        print(f"# stage profiles -> {artifact}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
