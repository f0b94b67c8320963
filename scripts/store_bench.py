"""Incremental-store ingest throughput under the manifest commit log.

Round 5 moved corpus_store/vector_store from optimistic parquet
appends to staged-files + CAS manifest commits. This measures what
that costs: N sequential ingest rounds of fresh synthetic documents
(with the LSH near-dup sidecar on — the full production path), and
the read-side snapshot cost, printed as one JSON line.

Usage: python scripts/store_bench.py [--rounds 8] [--docs 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from block_explorer_spark import get_spark
from block_explorer_spark.sources import corpus_store as cs
from block_explorer_spark.sources import manifest as Mf


def _batch(spark, start_id: int, n: int):
    import random

    rng = random.Random(start_id)
    rows = []
    for i in range(n):
        doc_id = start_id + i
        words = [f"tok{rng.randrange(30000):05d}" for _ in range(50)]
        words.append(f"uniq{doc_id}")  # guarantees a fresh fingerprint
        rows.append((doc_id, " ".join(words), "en", "web"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument(
        "--compact-every", type=int, default=None,
        help="run corpus_store.compact() every N rounds (the standing "
        "mitigation for file-count growth) and record its cost — "
        "measures whether periodic compaction holds round time flat",
    )
    ap.add_argument(
        "--cdc-mirror", action="store_true",
        help="run the canonical CDC consumer (cdc_consumer.sync) after "
        "every round and record its per-round cost — flat when the "
        "feed's cost tracks the delta, not the corpus (round 7)",
    )
    ap.add_argument(
        "--cdc-hll", action="store_true",
        help="run the persisted-sketch consumer (cdc_consumer.hll_sync) "
        "after every round and record its per-round cost — flat when "
        "merging the delta's registers tracks the delta, not the "
        "corpus (round 8)",
    )
    ap.add_argument(
        "--cdc-qhist", action="store_true",
        help="run the quantile-histogram consumer (cdc_consumer."
        "qhist_sync) after every round and record its per-round cost "
        "— flat when folding the delta's length counters tracks the "
        "delta, not the corpus (round 8)",
    )
    ap.add_argument(
        "--substr-window", type=int, default=None,
        help="enable the incremental ExactSubstr tier (round 6): each "
        "round probes the persisted whash sidecar and appends the "
        "batch's windows — measures the tier's per-round cost",
    )
    args = ap.parse_args()
    extra = (
        {"substr_window": args.substr_window}
        if args.substr_window is not None
        else {}
    )

    spark = get_spark("store-bench")
    base = tempfile.mkdtemp(prefix="store_bench_")
    try:
        # warmup round (codegen, Arrow worker spin-up) — not timed
        cs.ingest(spark, base + "_warm", _batch(spark, 0, 200),
                  near_dup_threshold=0.8, **extra)
        shutil.rmtree(base + "_warm", ignore_errors=True)

        per_round = []
        mirror_round = []
        hll_round = []
        qhist_round = []
        compact_sec = []
        mirror_state = base + "_mirror"
        hll_state = base + "_hll"
        qhist_state = base + "_qhist"
        for r in range(args.rounds):
            b = _batch(spark, 1 + r * args.docs, args.docs)
            t0 = time.perf_counter()
            stats = cs.ingest(spark, base, b, near_dup_threshold=0.8, **extra)
            per_round.append(round(time.perf_counter() - t0, 2))
            assert stats["n_added"] == args.docs, stats
            print(f"# round {r}: {per_round[-1]}s", file=sys.stderr)
            if args.cdc_mirror:
                from block_explorer_spark.sources import cdc_consumer as cdc

                t0 = time.perf_counter()
                s = cdc.sync(spark, base, mirror_state)
                mirror_round.append(round(time.perf_counter() - t0, 2))
                assert s["n_changes"] == args.docs, s
                print(f"# mirror sync {r}: {mirror_round[-1]}s", file=sys.stderr)
            if args.cdc_hll:
                from block_explorer_spark.sources import cdc_consumer as cdc

                t0 = time.perf_counter()
                s = cdc.hll_sync(spark, base, hll_state)
                hll_round.append(round(time.perf_counter() - t0, 2))
                assert s["n_changes"] == args.docs, s
                print(f"# hll sync {r}: {hll_round[-1]}s", file=sys.stderr)
            if args.cdc_qhist:
                from block_explorer_spark.sources import cdc_consumer as cdc

                t0 = time.perf_counter()
                s = cdc.qhist_sync(spark, base, qhist_state)
                qhist_round.append(round(time.perf_counter() - t0, 2))
                assert s["n_changes"] == args.docs, s
                print(f"# qhist sync {r}: {qhist_round[-1]}s", file=sys.stderr)
            if args.compact_every and (r + 1) % args.compact_every == 0:
                t0 = time.perf_counter()
                n_files = cs.compact(spark, base)
                compact_sec.append(round(time.perf_counter() - t0, 2))
                print(f"# compact after round {r}: {n_files} files retired "
                      f"in {compact_sec[-1]}s", file=sys.stderr)

        t0 = time.perf_counter()
        n = cs.read_corpus(spark, base).count()
        read_s = round(time.perf_counter() - t0, 2)
        assert n == args.rounds * args.docs

        # replay: the whole last batch is known — the no-commit path
        t0 = time.perf_counter()
        again = cs.ingest(
            spark, base,
            _batch(spark, 1 + (args.rounds - 1) * args.docs, args.docs),
            near_dup_threshold=0.8, **extra,
        )
        replay_s = round(time.perf_counter() - t0, 2)
        assert again["n_added"] == 0 and again["n_known"] == args.docs

        out_extra = (
            {"mirror_sync_sec_per_round": mirror_round}
            if args.cdc_mirror
            else {}
        )
        if args.cdc_hll:
            out_extra["hll_sync_sec_per_round"] = hll_round
        if args.cdc_qhist:
            out_extra["qhist_sync_sec_per_round"] = qhist_round
        if args.compact_every:
            out_extra["compact_every"] = args.compact_every
            out_extra["compact_sec"] = compact_sec
        print(json.dumps({
            "metric": "corpus_store_ingest",
            "substr_window": args.substr_window,
            **out_extra,
            "rounds": args.rounds,
            "docs_per_round": args.docs,
            "sec_per_round": per_round,
            "docs_per_sec_steady": round(
                args.docs / (sum(per_round[2:]) / max(1, len(per_round) - 2)), 1
            ),
            "snapshot_read_sec": read_s,
            "replay_known_batch_sec": replay_s,
            "manifest_version": Mf.read(base)["version"],
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(base + "_mirror", ignore_errors=True)


if __name__ == "__main__":
    main()
