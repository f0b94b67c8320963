"""Incremental curated-corpus store — the production crawl-ingest shape.

A pre-training corpus is not built in one batch: crawls arrive daily
and must flow through quality gates and deduplication AGAINST
EVERYTHING ALREADY ACCEPTED, with replay safety. This module is that
loop, composed from the certified operators (quality gates = q23/q76
shapes, fingerprint dedup = q20, md5 identity = q55's portability
argument) over a bucketed parquet layout:

  - Row identity is the content fingerprint (functions.text.
    word_set_fingerprint — md5 of the sorted distinct token set), so
    the store IS its own dedup index: there is no separate index table
    that could desync from the data on a crash.
  - Files partition by fp_bucket = pmod(xxhash64(fp), N_BUCKETS), so
    the cross-batch dedup join reads ONLY the buckets the batch's
    fingerprints hash into — at 100 TB a daily batch touches a bounded
    byte volume, not the corpus (the same directory-pruning contract
    as the GBE store's pulse buckets, parquet.read_table).
  - Ingest appends only fingerprints PROVEN absent, so replaying a
    batch after any crash converges: rows that were committed are
    skipped as known, rows that were not are appended — idempotent-
    but-not-atomic, the same recovery contract as parquet.upsert
    (pinned by test_corpus_store::test_ingest_replay_idempotent).

Scale shape per ingest: quality gates are map-only; in-batch dedup is
one small groupBy; cross-batch dedup is one join against a
partition-pruned slice of the store; the append writes only new rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors.exceptions.captured import AnalysisException

from block_explorer_spark.functions import text as Tx

N_BUCKETS = 64

#: Stored schema: the driver documents columns + fingerprint + token
#: count (the two things every later pipeline stage re-derives).
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("fp", T.StringType()),
        T.StructField("ntok", T.LongType()),
    ]
)


def _docs_path(base: str) -> str:
    return os.path.join(base, "corpus")


def _prepared(batch: DataFrame) -> DataFrame:
    """Map-only projection: fingerprint + token count + bucket."""
    return batch.select(
        "doc_id",
        "text",
        "lang",
        "source",
        Tx.word_set_fingerprint("text").alias("fp"),
        Tx.token_count("text").cast("long").alias("ntok"),
    ).withColumn("fp_bucket", F.pmod(F.xxhash64("fp"), F.lit(N_BUCKETS)))


def read_corpus(spark: SparkSession, base: str) -> DataFrame:
    """Schema-pinned read of the curated corpus (absent store = empty,
    same convention as parquet.read_table)."""
    full = T.StructType(
        list(CORPUS_SCHEMA.fields) + [T.StructField("fp_bucket", T.LongType())]
    )
    try:
        df = spark.read.schema(full).parquet(_docs_path(base))
    except AnalysisException:
        return spark.createDataFrame([], CORPUS_SCHEMA)
    return df.select(*[f.name for f in CORPUS_SCHEMA.fields])


def ingest(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    min_tokens: int = 20,
    max_dup_word_frac: float = 0.3,
) -> dict:
    """One curation ingest round. Returns the audit counts
    {n_in, n_gated, n_batch_dup, n_known, n_added}.

    Stages (one composed plan up to the final append):
      1. quality gates — token floor + repeated-word ceiling, map-only;
      2. in-batch dedup — min doc_id per fingerprint (q86's rule);
      3. cross-batch dedup — left-anti against the store slice whose
         fp_buckets the batch touches (directory-pruned read);
      4. append the survivors.
    """
    prepared = _prepared(batch).cache()
    n_in = prepared.count()

    gated = prepared.filter(
        (F.col("ntok") >= min_tokens)
        & (Tx.duplicate_ngram_fraction("text", 1) <= max_dup_word_frac)
    )
    n_gated_out = n_in - gated.count()

    winners = gated.groupBy(F.col("fp").alias("w_fp")).agg(
        F.min("doc_id").alias("keep_id")
    )
    canon = gated.join(
        winners,
        (gated.fp == winners.w_fp) & (gated.doc_id == winners.keep_id),
        "left_semi",
    ).cache()
    n_canon = canon.count()
    n_batch_dup = (n_in - n_gated_out) - n_canon

    path = _docs_path(base)
    if os.path.exists(path):
        buckets = [r.fp_bucket for r in canon.select("fp_bucket").distinct().collect()]
        full = T.StructType(
            list(CORPUS_SCHEMA.fields) + [T.StructField("fp_bucket", T.LongType())]
        )
        known_fps = (
            spark.read.schema(full)
            .parquet(path)
            .filter(F.col("fp_bucket").isin(buckets))
            .select("fp")
        )
        fresh = canon.join(known_fps, "fp", "left_anti")
    else:
        fresh = canon
    n_added = fresh.count()
    n_known = n_canon - n_added

    if n_added:
        fresh.write.partitionBy("fp_bucket").mode("append").parquet(path)
    prepared.unpersist()
    canon.unpersist()
    return {
        "n_in": n_in,
        "n_gated": n_gated_out,
        "n_batch_dup": n_batch_dup,
        "n_known": n_known,
        "n_added": n_added,
    }


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    min_tokens: int = 20,
    max_dup_word_frac: float = 0.3,
):
    """Continuous crawl ingest: readStream over a documents parquet
    directory → foreachBatch(ingest). Source offsets checkpoint, so a
    restart resumes at the first unprocessed file; a micro-batch
    replayed after a crash re-runs the SAME idempotent ingest (its
    fingerprints are already stored → n_added 0) — the identical
    exactly-once recipe as the GBE ingest stream
    (streaming/pipeline.py::start_ingest_stream)."""
    raw = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ingest(spark, base, batch, min_tokens=min_tokens,
               max_dup_word_frac=max_dup_word_frac)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
