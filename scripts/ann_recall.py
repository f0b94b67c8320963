"""Measured ANN recall@k vs brute-force ground truth (round-5 VERDICT
ask #3: "an ANN index without a recall number is half-specified").

For each scale (default x100 = 200k vectors, x1000 = 2M vectors, the
scale_curve corpora):

  ivf_flat        trained centroids (k = 8*scale, bounded-sample
                  k-means — the FAISS recipe), TRUE argmin assignment,
                  recall@10 by n_probe in {1, 2, 4, 8}
  ivf_two_level   the same centroids but the sqrt(k) super-centroid
                  two-level assignment (coarse_probes=4) used at
                  k ∝ N scale — quantifies the 'LSH-like' caveat
                  SCALE.md carried unmeasured since round 4
  sq8             int8-quantized full-scan ranking (q81's candidate
                  stage): recall of the quantized order itself
  sq8_rerank      the production two-stage form: SQ8 top-50
                  candidates, exact float re-rank, top-10
  pq_m{4,8}_adc   product-quantized ADC ranking (operators/pq.py,
                  round 7): 4- or 8-byte codes, int LUT scan — the
                  64x/32x memory tier — plus its top-50 exact-rerank
                  form. `--only pq` measures just these and merges
                  into an existing artifact.

Ground truth: exact brute-force cosine top-10 per query on the float
column. Queries are stored vectors perturbed with seeded gaussian
noise (sigma=0.05) so true neighbors exist but no query is a stored
row. Everything is deterministic (numpy seed + deterministic corpus).

Latency columns time the PROBE only (index assignment is prebuilt and
cached), averaged over queries — the interactive-path number.

Usage: python scripts/ann_recall.py [--scales 100,1000] [--out ANN_RECALL.json]
Results merge into SCALE_CURVE.json-style artifact ANN_RECALL.json
and are summarized in SCALE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from block_explorer_spark import get_spark
from block_explorer_spark.operators import similarity as Sim

from scale_curve import build_corpus  # noqa: E402 (sibling script)

K = 10
N_QUERIES = 16
CAND = 50  # sq8_rerank candidate depth


def _queries_for(emb_df, n_vecs: int, seed: int = 23) -> list[list[float]]:
    ids = [int(i * (n_vecs / N_QUERIES)) + 7 for i in range(N_QUERIES)]
    rows = (
        emb_df.filter(F.col("vec_id").isin(ids))
        .select("vec_id", "embedding")
        .collect()
    )
    rng = np.random.default_rng(seed)
    out = []
    for r in sorted(rows, key=lambda r: r.vec_id):
        v = np.array(r.embedding, dtype=np.float64)
        v = v + rng.normal(0.0, 0.05, size=v.shape)
        out.append([float(x) for x in v])
    return out


def _recall(got_ids: list[int], truth_ids: list[int]) -> float:
    return len(set(got_ids) & set(truth_ids)) / len(truth_ids)




def operating_points(scales: dict, targets=(0.8, 0.9, 0.95)) -> dict:
    """Mark, per scale cell, the chosen operating point for each
    recall target: the smallest measured ivf_flat n_probe reaching
    the target, else the sq8(+rerank) exact tier — the selection rule
    vector_store.select_n_probe applies at probe time (round-6
    item 4)."""
    out: dict = {}
    for key, cell in scales.items():
        cfgs = cell["configs"]
        flats = sorted(
            (int(name.rsplit("nprobe", 1)[1]), name)
            for name in cfgs
            if name.startswith("ivf_flat_nprobe")
        )
        cell_ops = {}
        for t in targets:
            chosen = next(
                (
                    {"config": name, "n_probe": p,
                     "recall": cfgs[name]["recall_at_10"]}
                    for p, name in flats
                    if cfgs[name]["recall_at_10"] >= t
                ),
                None,
            )
            if chosen is None:
                name = (
                    "sq8" if cfgs.get("sq8", {}).get("recall_at_10", 0) >= t
                    else "sq8_rerank_top50"
                )
                chosen = {"config": name,
                          "recall": cfgs[name]["recall_at_10"]}
            cell_ops[f"target_{t}"] = chosen
        out[key] = cell_ops
    return out


def _measure_pq(emb, queries, truth, cell: dict) -> None:
    """PQ ADC recall (operators/pq.py): cosine-metric mode (L2-
    normalized rows — ADC order is exact cosine order on the lattice),
    FAISS-sized codebooks (k=256 codewords per subspace, trained on
    the 4096 smallest vec_ids), encode once (cached — the at-ingest
    pass), then per-query LUT + int ADC scan. Timed like the other
    configs: probe only, encode prebuilt."""
    from block_explorer_spark.operators import pq as PQb

    for stale in [n for n in cell["configs"] if n.startswith("pq_")]:
        del cell["configs"][stale]
    for m in (8, 16):
        t0 = time.perf_counter()
        model = PQb.pq_train(emb, "embedding", m=m, k=256, iters=3,
                             sample_max_id=4096, normalize=True)
        pq_train_sec = time.perf_counter() - t0
        codes = PQb.pq_encode(emb, "embedding", model).select(
            "vec_id", "pq_codes").cache()
        t0 = time.perf_counter()
        codes.count()
        encode_sec = time.perf_counter() - t0
        recalls, rrecalls, r1s, secs = [], [], [], []
        for q, t in zip(queries, truth):
            lut = PQb.adc_lut(q, model)
            t0 = time.perf_counter()
            cand = [r.vec_id for r in
                    PQb.adc_topk_codes(codes, "pq_codes", lut, k=CAND).collect()]
            secs.append(time.perf_counter() - t0)
            recalls.append(_recall(cand[:K], t))
            rerank = [
                r.vec_id
                for r in Sim.brute_force_topk(
                    emb.filter(F.col("vec_id").isin(cand)), "embedding", q, K
                ).collect()
            ]
            rrecalls.append(_recall(rerank, t))
            r1s.append(1.0 if rerank and rerank[0] == t[0] else 0.0)
        codes.unpersist()
        cell["configs"][f"pq_m{m}_adc"] = {
            "recall_at_10": round(float(np.mean(recalls)), 4),
            "sec_per_query": round(float(np.mean(secs)), 2),
            "train_sec": round(pq_train_sec, 1),
            "encode_sec": round(encode_sec, 1),
            "bytes_per_vector": m,
        }
        cell["configs"][f"pq_m{m}_rerank_top{CAND}"] = {
            "recall_at_10": round(float(np.mean(rrecalls)), 4),
            # recall@1 separates "finds the true match" (PQ's
            # candidate-generation job — 1.0 here) from "orders the
            # statistical near-ties at ranks 2-10", which this
            # corpus's random tail cannot support at few-byte codes
            # (float-kmeans ceiling measured the same: 0.375 @ m=8).
            "recall_at_1": round(float(np.mean(r1s)), 4),
        }
        print(f"# pq m={m}: adc={np.mean(recalls):.3f} "
              f"rerank={np.mean(rrecalls):.3f} r@1={np.mean(r1s):.3f}",
              file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="100,1000")
    ap.add_argument("--out", default="ANN_RECALL.json")
    ap.add_argument("--root", default="/root/repo/.scale")
    ap.add_argument(
        "--only", default="all", choices=("all", "pq"),
        help="pq: skip ivf/sq8 (reuse an existing cell) and add only "
        "the PQ configs — ground truth is recomputed (deterministic)",
    )
    ap.add_argument(
        "--k", type=int, default=None,
        help="override n_centroids (default 8*scale, the k-proportional-"
        "to-N sizing); results key as x<scale>_k<k>",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark("ann-recall")
    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("scales", {})

    for scale in scales:
        sf_dir = build_corpus(spark, scale, args.root)
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
        n_vecs = emb.count()
        queries = _queries_for(emb, n_vecs)
        k_cents = args.k if args.k is not None else 8 * scale
        key = f"x{scale}" if args.k is None else f"x{scale}_k{args.k}"

        # ground truth (always recomputed: deterministic, never stored)
        truth = []
        t0 = time.perf_counter()
        for q in queries:
            truth.append([r.vec_id for r in
                          Sim.brute_force_topk(emb, "embedding", q, K).collect()])
        brute_sec = (time.perf_counter() - t0) / len(queries)

        if args.only == "pq":
            if key not in results:
                raise SystemExit(f"--only pq: no existing cell {key} in {args.out}")
            cell = results[key]
            _measure_pq(emb, queries, truth, cell)
            results[key] = cell
            with open(args.out, "w") as f:
                json.dump({"metric": "ann_recall", "k": K,
                           "n_queries": N_QUERIES, "scales": results,
                           "operating_points": operating_points(results)}, f,
                          indent=1, sort_keys=True)
            emb.unpersist()
            continue

        print(f"# x{scale}: training k={k_cents} centroids", file=sys.stderr)
        t0 = time.perf_counter()
        cents = Sim.train_centroids(emb, "embedding", k_cents, seed=7,
                                    max_train_rows=50_000)
        train_sec = time.perf_counter() - t0

        cell = {
            "n_vecs": n_vecs,
            "k_centroids": k_cents,
            "train_sec": round(train_sec, 1),
            "brute_force_sec_per_query": round(brute_sec, 2),
            "configs": {},
        }

        # the two assignment paths, each cached once (probe-only timing)
        flat = Sim.ivf_assign_arrow(emb, "embedding", cents).cache()
        flat.count()
        two = Sim.ivf_assign_arrow(emb, "embedding", cents, coarse_probes=4).cache()
        two.count()

        # the two-level caveat measured directly: how often does the
        # sqrt(k) super-centroid route land in the true argmin cell?
        agree = (
            flat.alias("a")
            .join(two.alias("b"), "vec_id")
            .filter(F.col("a.centroid_id") == F.col("b.centroid_id"))
            .count()
        )
        cell["two_level_assignment_agreement"] = round(agree / n_vecs, 4)
        print(f"# x{scale} two-level agreement: {agree / n_vecs:.4f}",
              file=sys.stderr)

        for name, assigned in (("ivf_flat", flat), ("ivf_two_level", two)):
            for n_probe in (1, 2, 4, 8, 16, 32, 64):
                recalls, secs = [], []
                for q, t in zip(queries, truth):
                    probes = Sim._probe_cells(q, cents, n_probe)
                    t0 = time.perf_counter()
                    got = [
                        r.vec_id
                        for r in Sim.brute_force_topk(
                            assigned.filter(F.col("centroid_id").isin(probes)),
                            "embedding", q, K,
                        ).collect()
                    ]
                    secs.append(time.perf_counter() - t0)
                    recalls.append(_recall(got, t))
                cell["configs"][f"{name}_nprobe{n_probe}"] = {
                    "recall_at_10": round(float(np.mean(recalls)), 4),
                    "sec_per_query": round(float(np.mean(secs)), 2),
                }
                print(f"# x{scale} {name} n_probe={n_probe}: "
                      f"recall={np.mean(recalls):.3f}", file=sys.stderr)

        # SQ8 full-scan ranking, and the two-stage rerank form
        recalls, rrecalls, secs = [], [], []
        for q, t in zip(queries, truth):
            t0 = time.perf_counter()
            cand = [r.vec_id for r in
                    Sim.quantized_topk(emb, "embedding", q, CAND).collect()]
            secs.append(time.perf_counter() - t0)
            recalls.append(_recall(cand[:K], t))
            rerank = [
                r.vec_id
                for r in Sim.brute_force_topk(
                    emb.filter(F.col("vec_id").isin(cand)), "embedding", q, K
                ).collect()
            ]
            rrecalls.append(_recall(rerank, t))
        cell["configs"]["sq8"] = {
            "recall_at_10": round(float(np.mean(recalls)), 4),
            "sec_per_query": round(float(np.mean(secs)), 2),
        }
        cell["configs"]["sq8_rerank_top50"] = {
            "recall_at_10": round(float(np.mean(rrecalls)), 4),
        }
        print(f"# x{scale} sq8: {np.mean(recalls):.3f} "
              f"rerank: {np.mean(rrecalls):.3f}", file=sys.stderr)

        _measure_pq(emb, queries, truth, cell)

        flat.unpersist()
        two.unpersist()
        emb.unpersist()
        results[key] = cell
        with open(args.out, "w") as f:
            json.dump({"metric": "ann_recall", "k": K,
                       "n_queries": N_QUERIES, "scales": results,
                       "operating_points": operating_points(results)}, f,
                      indent=1, sort_keys=True)

    print(json.dumps({"metric": "ann_recall", "out": args.out}))


if __name__ == "__main__":
    main()
