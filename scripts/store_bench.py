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


def multi_writer(spark, args) -> None:
    """Round-9 brief item 7: nothing had measured the manifest's CAS
    serialization under a REALISTIC concurrent mix. Three writers race
    on one store:

      A  ingest stream (rounds of fresh docs, id range A)
      B  ingest stream (id range B, fully concurrent with A)
      C  maintenance — waits for A's first commit, then interleaves
         delete_where (a slice of A's first batch), compact(), and
         the CDC mirror sync while A/B keep committing

    Every CommitConflict is counted per writer (instrumented around
    manifest.commit). Afterward the SAME operations replay serially
    into a fresh store and the two corpora must match row-for-row —
    the no-lost-update proof: CAS losers re-merge against the winner's
    snapshot, so no interleaving can drop a batch or resurrect a
    deleted row. Batches use disjoint id/token ranges so near-dup
    decisions are interleaving-independent (the determinism the
    equality check needs)."""
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from block_explorer_spark.sources import cdc_consumer as cdc

    retries: dict[str, int] = {}
    rlock = threading.Lock()
    orig_commit = Mf.commit

    def counted_commit(*a, **k):
        try:
            return orig_commit(*a, **k)
        except Mf.CommitConflict:
            name = threading.current_thread().name
            with rlock:
                retries[name] = retries.get(name, 0) + 1
            raise

    Mf.commit = counted_commit
    base = tempfile.mkdtemp(prefix="store_mw_")
    replay = tempfile.mkdtemp(prefix="store_mw_replay_")
    mirror = base + "_mirror"
    rounds, docs = args.rounds, args.docs
    a_first_done = threading.Event()
    errors: list[BaseException] = []
    wall: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
        except BaseException as e:  # surface thread failures loudly
            errors.append(e)
        finally:
            wall[name] = round(time.perf_counter() - t0, 2)

    A0 = 1
    B0 = 10_000_000
    delete_ids = list(range(A0, A0 + docs, 10))  # a slice of A's batch 0

    def writer_a():
        for r in range(rounds):
            s = cs.ingest(spark, base, _batch(spark, A0 + r * docs, docs),
                          near_dup_threshold=0.8)
            assert s["n_added"] == docs, s
            if r == 0:
                a_first_done.set()

    def writer_b():
        for r in range(rounds):
            s = cs.ingest(spark, base, _batch(spark, B0 + r * docs, docs),
                          near_dup_threshold=0.8)
            assert s["n_added"] == docs, s

    def writer_c():
        a_first_done.wait(timeout=600)
        n = cs.delete_where(spark, base, F.col("doc_id").isin(delete_ids))
        assert n == len(delete_ids), n
        for _ in range(3):
            cs.compact(spark, base)
            cdc.sync(spark, base, mirror)

    threads = [
        threading.Thread(target=run, args=(n, f), name=n)
        for n, f in [("ingest_a", writer_a), ("ingest_b", writer_b),
                     ("maintenance", writer_c)]
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    converge = round(time.perf_counter() - t0, 2)
    if errors:
        raise errors[0]

    # final CDC catch-up, then the mirror must equal the corpus
    cdc.sync(spark, base, mirror)
    final = cs.read_corpus(spark, base).select("doc_id", "text")
    n_final = final.count()
    n_mirror = cdc.read_mirror(spark, mirror).count()

    # serialized replay of the same operations
    for r in range(rounds):
        cs.ingest(spark, replay, _batch(spark, A0 + r * docs, docs),
                  near_dup_threshold=0.8)
        cs.ingest(spark, replay, _batch(spark, B0 + r * docs, docs),
                  near_dup_threshold=0.8)
    cs.delete_where(spark, replay, F.col("doc_id").isin(delete_ids))
    cs.compact(spark, replay)
    want = cs.read_corpus(spark, replay).select("doc_id", "text")
    n_want = want.count()
    diff = final.exceptAll(want).count() + want.exceptAll(final).count()
    Mf.commit = orig_commit

    print(json.dumps({
        "metric": "store_multiwriter",
        "writers": 3,
        "rounds": rounds,
        "docs_per_round": docs,
        "converge_sec": converge,
        "wall_per_writer_sec": wall,
        "cas_retries": retries,
        "manifest_version": Mf.read(base)["version"],
        "rows_final": n_final,
        "rows_serialized_replay": n_want,
        "rows_mirror": n_mirror,
        "lost_updates": diff,
        "ok": diff == 0 and n_final == n_want == n_mirror,
    }))
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(replay, ignore_errors=True)
    shutil.rmtree(mirror, ignore_errors=True)
    assert diff == 0 and n_final == n_want == n_mirror


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
    ap.add_argument(
        "--multi-writer", action="store_true",
        help="round-9 contention scenario: two concurrent ingest "
        "streams + a maintenance writer (delete_where, compact, CDC "
        "mirror sync) race on ONE store; logs per-writer CAS retry "
        "counts and convergence wall, then asserts the final corpus "
        "is byte-identical to a serialized replay of the same "
        "operations (no lost update)",
    )
    args = ap.parse_args()
    extra = (
        {"substr_window": args.substr_window}
        if args.substr_window is not None
        else {}
    )

    spark = get_spark("store-bench")
    if args.multi_writer:
        multi_writer(spark, args)
        return
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
