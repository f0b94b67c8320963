"""Incremental vector store — the embedding-side twin of corpus_store.

Embedding tables grow the same way document corpora do (daily batches
of freshly embedded content), and the two things a pipeline asks of
them — "is this vector new or a semantic duplicate?" on the way in,
and "nearest neighbors of q" on the way out — both want the SAME
layout: rows partitioned by their IVF coarse cell. This module keeps
that layout incrementally:

  - `create` trains centroids ONCE from the founding batch
    (similarity.train_centroids — bounded-sample k-means, the FAISS
    recipe), persists them as JSON beside the data, and ingests the
    batch. Centroids are a store-lifetime constant: cells stay
    comparable forever, and every later batch assigns against them
    (Catalyst fold for small k, the Arrow two-level path for large).
  - `add_batch` assigns the batch, exact-dedups by vec_id against
    ONLY the touched cells (directory-pruned read), optionally
    semantic-dedups against the stored members of those same cells
    (cosine >= threshold drops the newcomer; in-batch, lowest id
    wins — corpus_store's near-dup contract), and appends partitioned
    by centroid_id. Replay after a crash converges: committed ids are
    skipped, missing ones land.
  - `probe` answers top-k reading only n_probe cell directories
    (PartitionFilters, pinned by test) — the persisted-index promise
    of similarity.ivf_probe_topk, kept true under continuous adds.

Cost per batch: one assignment map + one cell-pruned read + one
bounded pairwise pass + an append of only-new rows — never a scan of
the store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors.exceptions.captured import AnalysisException

from block_explorer_spark.operators import similarity as Sim

#: Past this centroid count the Catalyst literal-fold assignment stops
#: scaling; switch to the Arrow two-level path (see ivf_assign_arrow).
ARROW_ASSIGN_AT = 64

VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _data_path(base: str) -> str:
    return os.path.join(base, "vectors")


def _centroids_path(base: str) -> str:
    return os.path.join(base, "centroids.json")


def load_centroids(base: str) -> list[list[float]]:
    with open(_centroids_path(base)) as f:
        return json.load(f)


def _assign(batch: DataFrame, centroids: list[list[float]]) -> DataFrame:
    if len(centroids) > ARROW_ASSIGN_AT:
        return Sim.ivf_assign_arrow(
            batch, "embedding", centroids, coarse_probes=4
        )
    return Sim.ivf_assign(batch, "embedding", centroids)


def read_vectors(spark: SparkSession, base: str) -> DataFrame:
    full = T.StructType(
        list(VECTORS_SCHEMA.fields) + [T.StructField("centroid_id", T.IntegerType())]
    )
    try:
        return spark.read.schema(full).parquet(_data_path(base))
    except AnalysisException:
        return spark.createDataFrame([], full)


def create(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    dedup_threshold: float | None = None,
) -> dict:
    """Found the store: train centroids on the batch, persist them,
    ingest the batch through the same path every later add uses.

    Refuses to re-found an existing store: centroids are a
    store-lifetime constant (cell pruning and probe correctness depend
    on it), so retraining over data partitioned by the OLD cells would
    silently corrupt the layout (ADVICE r4)."""
    if os.path.exists(_centroids_path(base)):
        raise FileExistsError(
            f"vector store at {base} is already founded; use add_batch"
        )
    os.makedirs(base, exist_ok=True)
    cents = Sim.train_centroids(batch, "embedding", n_centroids, seed)
    with open(_centroids_path(base), "w") as f:
        json.dump(cents, f)
    return add_batch(spark, base, batch, dedup_threshold=dedup_threshold)


def add_batch(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    dedup_threshold: float | None = None,
) -> dict:
    """One incremental add. Returns {n_in, n_known, n_near_dup,
    n_added}."""
    cents = load_centroids(base)
    assigned = _assign(batch.select(*[f.name for f in VECTORS_SCHEMA.fields]), cents)
    assigned = assigned.cache()
    n_in = assigned.count()

    path = _data_path(base)
    cells = [r.centroid_id for r in assigned.select("centroid_id").distinct().collect()]
    stored_cells = None
    if os.path.exists(path):
        stored_cells = read_vectors(spark, base).filter(
            F.col("centroid_id").isin(cells)
        )
        fresh = assigned.join(stored_cells.select("vec_id"), "vec_id", "left_anti")
    else:
        fresh = assigned
    fresh = fresh.cache()
    n_fresh = fresh.count()
    n_known = n_in - n_fresh

    n_near_dup = 0
    if dedup_threshold is not None and n_fresh:
        # One verified pairwise pass per cell over stored members +
        # fresh rows: stored wins, else lowest vec_id (re-keyed
        # uid = 2*id / 2*id+1 — corpus_store's rule).
        from block_explorer_spark.sources.corpus_store import _rekey

        stored_side = (
            stored_cells.select(
                _rekey("vec_id", 0).alias("uid"), "embedding", "centroid_id"
            )
            if stored_cells is not None
            else spark.createDataFrame(
                [], "uid long, embedding array<float>, centroid_id int"
            )
        )
        u = stored_side.unionByName(
            fresh.select(
                _rekey("vec_id", 1).alias("uid"), "embedding", "centroid_id"
            )
        )
        pairs = Sim.cosine_pairs_blas(
            u, "embedding", "centroid_id", threshold=dedup_threshold, id_col="uid"
        )
        even_a = (F.col("id_a") % 2) == 0
        even_b = (F.col("id_b") % 2) == 0
        drops = (
            pairs.filter(even_a & ~even_b).select(F.col("id_b").alias("uid"))
            .unionByName(pairs.filter(~even_a & even_b).select(F.col("id_a").alias("uid")))
            .unionByName(pairs.filter(~even_a & ~even_b).select(F.col("id_b").alias("uid")))
            .distinct()
            # integer DIV, not float division: for vec_id >= 2^53 the
            # double quotient rounds and the anti-join below would drop
            # the WRONG row (ADVICE r4)
            .select(F.expr("(uid - 1) DIV 2").alias("vec_id"))
        )
        kept = fresh.join(drops, "vec_id", "left_anti").cache()
        n_near_dup = n_fresh - kept.count()
        fresh.unpersist()
        fresh = kept
    n_added = n_fresh - n_near_dup

    if n_added:
        # checkpoint before the append: the write's lineage reads the
        # same store path it mutates (corpus_store's lesson)
        fresh = fresh.localCheckpoint()
        (
            fresh.repartition("centroid_id")
            .write.partitionBy("centroid_id")
            .mode("append")
            .parquet(path)
        )
    assigned.unpersist()
    fresh.unpersist()
    return {
        "n_in": n_in,
        "n_known": n_known,
        "n_near_dup": n_near_dup,
        "n_added": n_added,
    }


def probe(
    spark: SparkSession,
    base: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k over the probe cells only (directory-pruned read)."""
    cents = load_centroids(base)
    return Sim.ivf_probe_topk(
        spark, _data_path(base), query, cents, k=k, n_probe=n_probe
    )


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    dedup_threshold: float | None = None,
):
    """Continuous embedding ingest: readStream over a vectors parquet
    directory → foreachBatch(add_batch). The store must already be
    founded (create) so centroids exist. Checkpointed offsets resume
    at the first unprocessed file; replayed micro-batches re-run the
    idempotent add (known ids skipped) — the corpus_store streaming
    contract on the embedding side."""
    stream = (
        spark.readStream.schema(VECTORS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        add_batch(spark, base, batch, dedup_threshold=dedup_threshold)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def canonicalize(spark: SparkSession, base: str) -> int:
    """Enforce one-row-per-vec_id across the store (the repair for
    racing concurrent adds — add_batch is optimistic and plain parquet
    has no transaction log; same-store adds are single-writer by
    contract, this sweep is the periodic invariant enforcement —
    corpus_store.canonicalize's twin). The survivor is deterministic:
    min centroid_id, then min embedding hash (the tiebreak only
    matters for genuinely divergent re-adds); only cells holding
    duplicates are rewritten, and cells whose rows were ALL duplicate
    losers are rmtree'd afterwards — dynamic partition overwrite never
    deletes a cell absent from the staged output (ADVICE r4)."""
    import shutil
    import uuid

    from pyspark.sql.window import Window

    path = _data_path(base)
    if not os.path.exists(path):
        return 0
    table = read_vectors(spark, base)
    dup_ids = (
        table.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("vec_id")
    )
    hit_cells = [
        r.centroid_id
        for r in table.join(dup_ids, "vec_id", "left_semi")
        .select("centroid_id").distinct().collect()
    ]
    if not hit_cells:
        return 0
    touched = table.filter(F.col("centroid_id").isin(hit_cells))
    n_before = touched.count()
    w = Window.partitionBy("vec_id").orderBy("centroid_id", F.hash("embedding"))
    kept = (
        touched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint()
    )
    n_removed = n_before - kept.count()
    if not n_removed:
        return 0
    kept_cells = {
        r.centroid_id for r in kept.select("centroid_id").distinct().collect()
    }
    staging = os.path.join(base, f".staging-canon-{uuid.uuid4().hex}")
    try:
        kept.write.partitionBy("centroid_id").mode("overwrite").parquet(staging)
        full = T.StructType(
            list(VECTORS_SCHEMA.fields)
            + [T.StructField("centroid_id", T.IntegerType())]
        )
        (
            spark.read.schema(full).parquet(staging)
            .write.partitionBy("centroid_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )
        # a cell whose every row was a duplicate loser is absent from
        # the staged output, so dynamic overwrite left its old files
        # intact — remove those directories explicitly
        for cell in set(hit_cells) - kept_cells:
            shutil.rmtree(
                os.path.join(path, f"centroid_id={cell}"), ignore_errors=True
            )
        spark.catalog.refreshByPath(path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return n_removed
