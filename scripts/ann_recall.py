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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="100,1000")
    ap.add_argument("--out", default="ANN_RECALL.json")
    ap.add_argument("--root", default="/root/repo/.scale")
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

        print(f"# x{scale}: training k={k_cents} centroids", file=sys.stderr)
        t0 = time.perf_counter()
        cents = Sim.train_centroids(emb, "embedding", k_cents, seed=7,
                                    max_train_rows=50_000)
        train_sec = time.perf_counter() - t0

        # ground truth
        truth = []
        t0 = time.perf_counter()
        for q in queries:
            truth.append([r.vec_id for r in
                          Sim.brute_force_topk(emb, "embedding", q, K).collect()])
        brute_sec = (time.perf_counter() - t0) / len(queries)

        cell: dict = {
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

        flat.unpersist()
        two.unpersist()
        emb.unpersist()
        key = f"x{scale}" if args.k is None else f"x{scale}_k{args.k}"
        results[key] = cell
        with open(args.out, "w") as f:
            json.dump({"metric": "ann_recall", "k": K,
                       "n_queries": N_QUERIES, "scales": results,
                       "operating_points": operating_points(results)}, f,
                      indent=1, sort_keys=True)

    print(json.dumps({"metric": "ann_recall", "out": args.out}))


if __name__ == "__main__":
    main()
