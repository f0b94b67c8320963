"""End-to-end training-data pipeline: raw crawl batches → curated
corpus store (gates + exact + near dedup) → deterministic embedding →
vector store (founding train + adds + probes) → token-budget selection
→ train/val/test split. One test drives the whole loop the way a
pipeline owner would, across two ingest rounds, asserting the
invariants that matter end to end: exactly-once content, dedup across
rounds, budget arithmetic, and split determinism."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from pyspark.sql import functions as F

from block_explorer_spark.operators import sampling as Smp
from block_explorer_spark.operators import selection as Sel
from block_explorer_spark.functions import text as Tx
from block_explorer_spark.sources import corpus_store as cs
from block_explorer_spark.sources import vector_store as vs

VOCAB = [f"word{i}" for i in range(40)]


def _doc(rng, doc_id, lang="en"):
    # 30 DISTINCT words per doc: repetition gate passes cleanly, and
    # random orderings keep cross-doc 3-gram jaccard far below 0.8
    return (doc_id, " ".join(rng.sample(VOCAB, 30)), lang, "web")


def _embed(df):
    """Deterministic stand-in embedder: 8-dim token-hash histogram,
    unit-normalized — pure Spark, no model dependency."""
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    buckets = F.expr(
        "transform(sequence(0, 7), b -> "
        "size(filter(transform(split(lower(trim(text)), '\\\\s+'),"
        " t -> pmod(xxhash64(t), 8)), h -> h = b)))"
    )
    vec = F.expr(
        "transform(slots, s -> cast(s / sqrt(aggregate(slots, 0L, (a, x) -> a + x * x)) as float))"
    )
    return (
        df.withColumn("slots", buckets)
        .withColumn("embedding", vec)
        .select(F.col("doc_id").alias("vec_id"), "embedding", F.lit(0).alias("label"))
    )


def test_full_pipeline_two_rounds(spark, tmp_path):
    corpus_base = str(tmp_path / "corpus")
    vec_base = str(tmp_path / "vectors")
    rng = random.Random(11)

    # --- round 1: founding crawl -------------------------------------
    b1 = [_doc(rng, i) for i in range(40)]
    b1.append((100, b1[0][1], "en", "web"))  # exact content dup in-batch
    stats1 = cs.ingest(spark, corpus_base, spark.createDataFrame(
        b1, ["doc_id", "text", "lang", "source"]), near_dup_threshold=0.8)
    assert stats1["n_added"] == 40 and stats1["n_batch_dup"] == 1

    corpus = cs.read_corpus(spark, corpus_base)
    emb1 = _embed(corpus)
    vstats1 = vs.create(spark, vec_base, emb1, n_centroids=4, seed=3)
    assert vstats1["n_added"] == 40

    # --- round 2: incremental crawl (replays + new) ------------------
    b2 = [b1[5], b1[6]] + [_doc(rng, 200 + i) for i in range(10)]
    stats2 = cs.ingest(spark, corpus_base, spark.createDataFrame(
        b2, ["doc_id", "text", "lang", "source"]), near_dup_threshold=0.8)
    assert stats2["n_known"] == 2 and stats2["n_added"] == 10

    corpus = cs.read_corpus(spark, corpus_base)
    assert corpus.count() == 50
    # embed only the new docs — the incremental add
    new_docs = corpus.filter(F.col("doc_id") >= 200)
    vstats2 = vs.add_batch(spark, vec_base, _embed(new_docs))
    assert vstats2["n_added"] == 10
    assert vs.read_vectors(spark, vec_base).count() == 50

    # probes answer from the grown store
    qvec = [float(x) for x in
            vs.read_vectors(spark, vec_base).filter("vec_id = 201").head()["embedding"]]
    top = vs.probe(spark, vec_base, qvec, k=3, n_probe=2).collect()
    assert top and top[0]["vec_id"] == 201  # self is its own nearest

    # --- selection + split over the curated corpus -------------------
    scored = corpus.select(
        "doc_id",
        Tx.quality_score("text").alias("quality"),
        F.col("ntok").cast("long").alias("ntok"),
    )
    budget = 600  # 50 docs x 30 tokens = 1500 total; take ~40%
    sel = Sel.budget_select(scored, "quality", "ntok", "doc_id", budget)
    rows = sel.collect()
    assert rows and sum(r["ntok"] for r in rows) <= budget
    # greedy prefix: equals the Python reference
    naive, cum = [], 0
    for r in sorted(scored.collect(), key=lambda r: (-r["quality"], r["doc_id"])):
        cum += r["ntok"]
        if cum > budget:
            break
        naive.append(r["doc_id"])
    assert sorted(r["doc_id"] for r in rows) == sorted(naive)

    # deterministic split of the selected set matches the md5 rule
    split = (
        sel.withColumn("bucket", Smp.hash_bucket("doc_id", 10))
        .withColumn(
            "split",
            F.when(F.col("bucket") < 8, "train")
            .when(F.col("bucket") == 8, "val")
            .otherwise("test"),
        )
    )
    got = {r["doc_id"]: r["split"] for r in split.collect()}
    for doc_id, s in got.items():
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10
        assert s == ("train" if b < 8 else "val" if b == 8 else "test")
