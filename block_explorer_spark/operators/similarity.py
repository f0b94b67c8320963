"""Similarity search over embedding columns (array<float>).

  brute_force_topk — exact cosine top-k against a query vector: one
    scan, TakeOrderedAndProject (per-partition heap + driver merge);
    the right baseline and already cluster-shaped (no shuffle).
  rp_lsh_buckets / rp_lsh_topk — random-hyperplane LSH: sign bits of
    dot(v, r_i) form a bucket key; candidates = query's bucket (and
    neighbors via multi-probe). Scale path: the bucket join prunes the
    scan to ~N/2^bits rows.
  ivf_assign / ivf_topk — inverted-file (IVF) ANN: k-means centroids
    partition the space; a query probes its n_probe nearest centroid
    cells only. At scale the assignment is computed once at write time
    and the table is partitioned/clustered by centroid_id, so a probe
    is a partition-pruned scan of ~n_probe/n_centroids of the data.
  cosine_pairs — embedding near-duplicate pairs within blocking keys
    (label/source/bucket), an equi-join then exact cosine filter.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from block_explorer_spark.functions import vectors as V


def brute_force_topk(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine; ties broken by id for determinism.

    The query norm is a constant — computed driver-side (same
    left-to-right double summation as V.norm, so the result is
    bit-identical) instead of re-folding the literal array per row.
    """
    q = V.lit_vector(query)
    acc = 0.0
    for x in query:
        acc += float(x) * float(x)
    qnorm = acc**0.5
    scored = df.select(
        F.col(id_col),
        (V.dot(F.col(vec_col), q) / (V.norm(F.col(vec_col)) * F.lit(qnorm))).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def rp_lsh_buckets(
    df: DataFrame, vec_col: str, dim: int, bits: int = 8, seed: int = 42
) -> DataFrame:
    """Add a `bucket` long column: sign-bit signature over `bits`
    random hyperplanes. Deterministic given seed. One parsed SQL
    string — bits×dim literal Columns via py4j cost ~0.5 s of driver
    time per plan build (see minhash_signatures)."""
    planes = _hyperplanes(dim, bits, seed)
    term = (
        "(case when aggregate(zip_with(cast(`%s` as array<double>), array(%s),"
        " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) > 0.0D then %dL else 0L end)"
    )
    bucket = " + ".join(
        term % (vec_col, ",".join(f"cast('{x!r}' as double)" for x in p), 2**i)
        for i, p in enumerate(planes)
    )
    return df.withColumn("bucket", F.expr(bucket))


def rp_lsh_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: scan only buckets within `multiprobe_hamming` of the
    query's bucket, then exact cosine + top-k on the candidates.

    At scale the bucketed table is written partitioned/clustered by
    `bucket`, so this is a partition-pruned scan of ~(probes/2^bits)
    of the data instead of a full pass.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            qbucket |= 1 << i
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(bits)]
    if multiprobe_hamming >= 2:
        probes += [
            qbucket ^ (1 << i) ^ (1 << j) for i in range(bits) for j in range(i + 1, bits)
        ]
    bucketed = rp_lsh_buckets(df, vec_col, dim, bits, seed)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, vec_col, query, k, id_col)


def seeded_centroids(
    dim: int, n_centroids: int, seed: int = 7, scale: float = 1.0
) -> list[list[float]]:
    """Deterministic pseudo-random centroids for the precomputed-
    centroid IVF path (``ivf_topk(centroids=...)``).

    Production trains with train_centroids once at index-build time
    and stores the result; this helper stands in for that stored
    artifact with a seed-reproducible set, which makes the whole IVF
    pipeline (assign → probe → top-k) replicable in an external SQL
    oracle — the centroids are plain literals. `scale` should match
    the data's per-coordinate spread so cells partition the space
    non-degenerately.
    """
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, scale) for _ in range(dim)] for _ in range(n_centroids)
    ]


def train_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """K-means centroids for an IVF index (seeded, deterministic).

    Training runs on a bounded sample (`max_train_rows`) — centroid
    quality needs only a representative sample, never the full 100 TB
    table; the expensive full pass is the assignment, which is a
    single map (ivf_assign). The sample is collected and clustered
    driver-side with a numpy Lloyd's loop: at ≤100k×d doubles that is
    a few MB and milliseconds, vs ~20 iterative Spark jobs for a
    distributed k-means whose per-job overhead dwarfs the math at any
    sample size (this is the standard IVF recipe — FAISS trains on a
    sample too).
    """
    import numpy as np

    n = df.count()
    sample = df
    if n > max_train_rows:
        sample = df.sample(fraction=max_train_rows / n, seed=seed)
    X = np.array(
        [r[0] for r in sample.select(F.col(vec_col).cast("array<double>")).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(X))
    # k-means++ seeding with a RUNNING min-distance vector: only the
    # newest center's distances are computed per step (O(k·n·d)).
    # The original formulation recomputed every center's distances
    # each step — O(k²·n·d), which at k = 2048 on a 100k sample is
    # ~1300 GFLOP of pure waste and stalled large-k index builds.
    centers = [X[rng.integers(len(X))]]
    d2 = np.sum((X - centers[0]) ** 2, axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total == 0:
            nxt = X[rng.integers(len(X))]
        else:
            nxt = X[np.searchsorted(np.cumsum(d2 / total), rng.random())]
        centers.append(nxt)
        np.minimum(d2, np.sum((X - nxt) ** 2, axis=1), out=d2)
    C = np.stack(centers)
    x2 = (X**2).sum(axis=1)
    for _ in range(15):  # Lloyd iterations
        # ||x-c||² = x² + c² - 2x·c as an n×k gram — never an n×k×d
        # broadcast (which would be ~800 MB at the 100k sample cap)
        d2 = x2[:, None] + (C**2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = d2.argmin(axis=1)
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(axis=0)
            else:  # empty cluster -> reseed to the farthest point
                newC[j] = X[d2.min(axis=1).argmax()]
        if np.allclose(newC, C):
            break
        C = newC
    return [[float(x) for x in c] for c in C]


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add `centroid_id`: argmin squared-euclidean over the centroid
    list (no UDF, no MLlib transform — the literal centroids fold into
    codegen). At scale, write the result partitioned by centroid_id so
    probes prune partitions.

    Built as ONE SQL string: a distance array + array_position of its
    min (ties -> lowest id). The previous formulation — a running
    when(closer, d).otherwise(best_d) chain of Column objects — embeds
    the prior best twice per step, so the expression tree grows 2^k
    and plan construction alone took seconds at k=8 (the py4j
    wide-tree lesson; see minhash_signatures)."""
    dist = (
        "aggregate(zip_with(cast(`%s` as array<double>), array(%s), (x, y) -> x - y),"
        " 0.0D, (acc, x) -> acc + x * x)"
    )
    dists = ",".join(
        dist % (vec_col, ",".join(f"cast('{x!r}' as double)" for x in c)) for c in centroids
    )
    return (
        df.withColumn("__dists", F.expr(f"array({dists})"))
        .withColumn(
            "centroid_id",
            F.expr("cast(array_position(__dists, array_min(__dists)) as int) - 1"),
        )
        .drop("__dists")
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: probe the n_probe centroid cells nearest to the
    query, exact cosine + top-k over those cells only.

    Pass precomputed `centroids` (and pre-assigned data) in production;
    the one-shot path here trains + assigns inline for convenience.
    """
    if centroids is None:
        centroids = train_centroids(df, vec_col, n_centroids, seed)
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(query, centroids[i])),
    )
    probes = ranked[:n_probe]
    assigned = df if "centroid_id" in df.columns else ivf_assign(df, vec_col, centroids)
    cand = assigned.filter(F.col("centroid_id").isin(probes))
    return brute_force_topk(cand, vec_col, query, k, id_col)


def cosine_pairs(
    df: DataFrame,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs within a blocking key.

    Equi-join on the block (never a cross join); callers choose the
    block: a metadata key (label, source) or an LSH bucket from
    rp_lsh_buckets for unlabeled data. Norms are computed once per ROW
    before the join (O(N·d)) rather than once per PAIR after it
    (O(P·d), P ≈ N²/blocks) — per-pair cost drops to a single dot
    fold, with bit-identical results (identical fold order). Output:
    (id_a, id_b, cosine) with id_a < id_b.
    """
    base = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        V.norm(F.col(vec_col)).alias("__n"),
    )
    a = base.withColumnsRenamed({"__id": "id_a", "__v": "__va", "__n": "__na"})
    b = base.withColumnsRenamed({"__id": "id_b", "__v": "__vb", "__n": "__nb"})
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", V.dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_blas(
    df: DataFrame,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    row_chunk: int = 2048,
) -> DataFrame:
    """`cosine_pairs`, but the in-block pair space is a numpy gram
    matrix instead of per-pair Catalyst array folds.

    One shuffle (groupBy block), then per block: normalize the B×d
    matrix once and emit the upper triangle of (V̂ · V̂ᵀ) ≥ threshold —
    BLAS dgemm, ~d fused multiply-adds per pair at memory bandwidth,
    vs an interpreted HigherOrderFunction fold per pair (measured ~20×
    at sf0.1: 2000×64 vectors, 10 blocks, ~199k pairs). float64
    throughout, so it agrees with the fold version to ~1e-15 relative;
    ties at a rounding boundary are the only observable difference.

    The gram matrix is computed in `row_chunk`-row stripes so peak
    memory is O(row_chunk × block), not O(block²). Blocks must fit one
    executor (same contract as cosine_pairs — at 100 TB the block is
    an LSH bucket or metadata key sized by construction; re-bucket
    with more bits if a block outgrows memory).
    """
    import pandas as pd  # noqa: F401  (applyInPandas dependency)

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def _block(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        out_a, out_b, out_c = [], [], []
        for lo in range(0, len(unit), row_chunk):
            hi = min(lo + row_chunk, len(unit))
            gram = unit[lo:hi] @ unit.T  # stripe × all
            for r in range(lo, hi):
                cols = np.nonzero(gram[r - lo, r + 1 :] >= threshold)[0] + r + 1
                if len(cols):
                    out_a.append(np.full(len(cols), ids[r]))
                    out_b.append(ids[cols])
                    out_c.append(gram[r - lo, cols])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return df.select(block_col, id_col, vec_col).groupBy(block_col).applyInPandas(_block, out_schema)


def quantize_int8(df: DataFrame, vec_col: str, out_prefix: str = "q") -> DataFrame:
    """Symmetric int8 quantization of a float-vector column.

    Adds `{p}_scale` = 127 / max|x| (0.0 for an all-zero vector) and
    `{p}_vec` = round-half-up(x * scale) as array<int> in [-127, 127].
    Pure array HOFs — map-only, stays in codegen, no UDF. The rounding
    is floor(x*scale + 0.5) written out explicitly so any engine
    reproduces the identical codes (half-even vs half-up round()
    differences can't leak in).

    Why: at 100 TB the embedding column dominates storage and shuffle
    width; int8 codes cut both 4x, and candidate generation on codes +
    exact re-rank on floats is the standard two-stage ANN recipe
    (FAISS SQ8 / product-quantization family).
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )
    scale = F.when(amax > 0.0, 127.0 / amax).otherwise(F.lit(0.0))
    df = df.withColumn(f"{out_prefix}_scale", scale)
    codes = F.transform(
        v,
        lambda x: F.floor(x.cast("double") * F.col(f"{out_prefix}_scale") + 0.5).cast("int"),
    )
    return df.withColumn(f"{out_prefix}_vec", codes)


def quantized_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    use_arrow: bool = True,
) -> DataFrame:
    """Top-k by int8-quantized cosine: codes via quantize_int8 on both
    sides, integer dot product (exact — no float-order ambiguity),
    then rescale by the two quantization scales and the code norms.

    Output (id, qcosine) is fully deterministic and engine-replicable:
    the integer dot and integer norms are exact, and the final
    division is one double op. This is the candidate-generation stage
    of the SQ8 two-stage recipe; callers re-rank candidates with
    brute_force_topk on the float column when recall@k must be exact.

    use_arrow (default): score through a numpy pandas UDF instead of
    the column-expression form. Bit-identical results — quantization
    is floor(x*scale+0.5) in float64 either way, the dot/norms are
    exact int64, and the final division happens in the same order —
    but the column form pays Catalyst's interpreted HOF evaluation
    (CodegenFallback), measured ~5x slower per row. The float
    brute-force path deliberately has NO arrow variant: numpy's
    pairwise/SIMD float summation order differs from the fold, which
    could flip near-tie orderings vs the oracle.
    """
    # Quantize the query driver-side with the same formula.
    import math

    amax = max((abs(float(x)) for x in query), default=0.0)
    qscale = 127.0 / amax if amax > 0 else 0.0
    qcodes = [int(math.floor(float(x) * qscale + 0.5)) for x in query]
    qnorm = math.sqrt(sum(c * c for c in qcodes))

    if use_arrow:
        from pyspark.sql.functions import pandas_udf

        qc = np.asarray(qcodes, dtype=np.int64)

        @pandas_udf("double")
        def _score(col: pd.Series) -> pd.Series:
            mat = np.stack(col.to_numpy()).astype(np.float64)
            row_amax = np.abs(mat).max(axis=1)
            scale = np.where(row_amax > 0.0, 127.0 / row_amax, 0.0)
            codes = np.floor(mat * scale[:, None] + 0.5).astype(np.int64)
            dot = codes @ qc
            n1 = np.sqrt((codes * codes).sum(axis=1).astype(np.float64))
            denom = n1 * qnorm
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(denom > 0.0, dot.astype(np.float64) / denom, 0.0)
            return pd.Series(out)

        scored = df.select(F.col(id_col), _score(F.col(vec_col)).alias("qcosine"))
        return scored.orderBy(F.col("qcosine").desc(), F.col(id_col).asc()).limit(k)

    quant = quantize_int8(df, vec_col)
    qlit = F.array(*[F.lit(c) for c in qcodes])
    dot_i = F.aggregate(
        F.zip_with(F.col("q_vec"), qlit, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm_i = F.sqrt(
        F.aggregate(
            F.col("q_vec"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (x * x).cast("long"),
        ).cast("double")
    )
    scored = quant.select(
        F.col(id_col),
        F.when(
            (norm_i > 0) & (F.lit(qnorm) > 0),
            dot_i.cast("double") / (norm_i * F.lit(qnorm)),
        )
        .otherwise(F.lit(0.0))
        .alias("qcosine"),
    )
    return scored.orderBy(F.col("qcosine").desc(), F.col(id_col).asc()).limit(k)


def _probe_cells(query: list[float], centroids: list[list[float]], n_probe: int) -> list[int]:
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(query, centroids[i])),
    )
    return ranked[:n_probe]


def write_ivf_index(
    df: DataFrame, vec_col: str, centroids: list[list[float]], path: str
) -> None:
    """Materialize the IVF index: assign centroid cells and write the
    table PARTITIONED BY centroid_id. This is what turns n_probe into
    directory-level partition pruning — a probe lists n_probe cell
    directories out of n_centroids and never touches the rest (the
    FAISS inverted-list layout, expressed as parquet partitioning).
    One-time build cost: the assignment map + one shuffle-free write
    (repartition on the cell keeps one file per cell per task wave)."""
    assigned = ivf_assign(df, vec_col, centroids)
    (
        assigned.repartition("centroid_id")
        .write.partitionBy("centroid_id")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_probe_topk(
    spark,
    path: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    files: list[str] | None = None,
    where=None,
) -> DataFrame:
    """Query the persisted IVF index: read ONLY the probe cells'
    partitions, exact cosine + top-k over those cells.

    The probe addresses its cell DIRECTORIES directly (basePath keeps
    the partition column) instead of scanning the table root with a
    partition filter: root-scan pruning still lists every cell
    directory first, and at k ∝ N that listing dominates — measured
    15.5s of a probe against an 8000-cell / 2M-row index, vs sub-
    second with direct cell paths. Cells that are empty on disk
    (no directory) are simply skipped. Root-scan fallback remains for
    indexes written without directory partitioning.

    `files`: optional explicit live-file list (a manifest snapshot —
    vector_store's transactional layout); the probe then reads only
    the listed files of the probe cells, so no filesystem listing
    happens at all and concurrent store mutations can't tear the
    read."""
    import os

    probes = _probe_cells(query, centroids, n_probe)
    if files is not None:
        tags = [f"centroid_id={c}{os.sep}" for c in probes]
        sel = [f for f in files if any(t in f for t in tags)]
        if not sel:
            return spark.createDataFrame([], f"{id_col} long, cosine double")
        cells = spark.read.option("basePath", path).parquet(*sorted(sel))
        if where is not None:
            # PRE-filter (exact w.r.t. the probed cells): the predicate
            # lands before the distance math, pushed into the parquet
            # scan of the metadata columns — never the post-filtered
            # "fetch k then hope" shape, which under-fills k.
            cells = cells.filter(where)
        return brute_force_topk(cells, vec_col, query, k, id_col)
    cell_dirs = [
        os.path.join(path, f"centroid_id={c}")
        for c in probes
        if os.path.exists(os.path.join(path, f"centroid_id={c}"))
    ]
    if cell_dirs:
        cells = spark.read.option("basePath", path).parquet(*cell_dirs)
    else:
        cells = spark.read.parquet(path).filter(F.col("centroid_id").isin(probes))
    if where is not None:
        cells = cells.filter(where)
    return brute_force_topk(cells, vec_col, query, k, id_col)


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540 — public paper): coarse clustering bounds the
    candidate space, then within-cluster cosine pairs above
    `threshold` mark redundant members; survivors are returned with
    their `centroid_id`.

    Keep policy (deterministic, single pass): drop v iff SOME u < v
    in the same cluster has cos(u, v) >= threshold — greedy
    lowest-id-wins, the same rule the paper's "keep one example per
    semantic duplicate group" reduces to under a fixed ordering. No
    iteration, no driver state.

    Scale shape: the pairwise work is the per-cluster equi-join of
    cosine_pairs (never all-pairs); cluster population is bounded by
    choosing n_centroids ~ N/target_cluster_size at index build (the
    FAISS coarse-quantizer sizing rule), and the same persisted
    centroid assignment written for IVF probes (write_ivf_index) is
    reused here, so the dedup pass adds zero new index cost.
    """
    assigned = df if "centroid_id" in df.columns else ivf_assign(df, vec_col, centroids)
    # Per-cluster BLAS gram matrices instead of a self-join: a join on
    # the low-cardinality centroid key plans as an 8-partition SMJ
    # (parallelism = n_clusters); the applyInPandas block pass keeps
    # the same results (pinned blas == fold by test) with one shuffle
    # and striped O(chunk x cluster) memory — the q28 lesson.
    pairs = cosine_pairs_blas(assigned, vec_col, "centroid_id", threshold, id_col)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(dropped, id_col, "left_anti")


def ivf_assign_arrow(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    coarse_probes: int | None = None,
    chunk: int = 1024,
) -> DataFrame:
    """ivf_assign for LARGE centroid counts: numpy argmin per Arrow
    batch (mapInPandas), instead of k literal fold expressions in the
    plan. The Catalyst form is ideal up to a few dozen centroids
    (codegen, no Python); past that the expression tree and per-row
    k-fold cost dominate, while the distance computation here is BLAS.
    Same first-argmin tie rule, so results are identical (pinned by
    test). The centroid GEMM runs in `chunk`-sized stripes with a
    running min, so per-batch memory is O(batch x chunk) no matter how
    large k grows (the flat batch x k matrix at k = 8000 was 640 MB —
    measured memory-bandwidth-bound, not compute-bound).

    coarse_probes — the FAISS two-level (IMI-style) recipe for
    k ~ N / target_cluster_size, where flat assignment is N*k =
    quadratic in N: ~sqrt(k) super-centroids are k-means-trained ON
    the centroid set (driver-side, trivial), each row first picks its
    `coarse_probes` nearest super-cells, then runs the exact argmin
    over only THOSE cells' member centroids — N*sqrt(k)*(1+probes)
    work (measured 37x at N=2M, k=8000). Approximate: a row whose
    true nearest centroid lives in an unprobed super-cell gets its
    best probed one. How often that happens depends on the centroid
    structure — k-means-TRAINED centroids have wide cell margins and
    probe misses are rare; random stand-in centroids have razor-thin
    margins and the result is better read as a deterministic LSH-like
    partitioner than as argmin. For dedup BLOCKING either is sound:
    the mapping is deterministic and continuous, so near-identical
    vectors co-locate except at cell boundaries (pinned by test) —
    the same boundary trade every coarse blocking makes. None
    (default) = exact flat path.
    """
    import pyspark.sql.types as T

    cent = np.asarray(centroids, dtype=np.float64)  # (k, d)
    cent_sq = (cent * cent).sum(axis=1)  # ||c||^2 per centroid
    k = len(cent)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("centroid_id", T.IntegerType())]
    )

    sup = sup_sq = members = None
    if coarse_probes is not None and k > coarse_probes:
        n_sup = max(coarse_probes, int(k**0.5))
        rng = np.random.default_rng(0xC0A25E)
        sup = cent[rng.choice(k, size=n_sup, replace=False)].copy()
        for _ in range(10):  # Lloyd's on the centroids themselves
            d2 = (sup * sup).sum(1)[None, :] - 2.0 * (cent @ sup.T)
            a = d2.argmin(1)
            for j in range(n_sup):
                m = cent[a == j]
                if len(m):
                    sup[j] = m.mean(axis=0)
        d2 = (sup * sup).sum(1)[None, :] - 2.0 * (cent @ sup.T)
        owner = d2.argmin(1)
        members = [np.nonzero(owner == j)[0] for j in range(n_sup)]
        sup_sq = (sup * sup).sum(axis=1)

    def _flat(x):
        n = len(x)
        best = np.full(n, np.inf)
        best_id = np.zeros(n, dtype=np.int64)
        for lo in range(0, k, chunk):
            c = cent[lo : lo + chunk]
            d2 = (c * c).sum(1)[None, :] - 2.0 * (x @ c.T)
            j = d2.argmin(axis=1)
            v = d2[np.arange(n), j]
            upd = v < best  # strict: ascending chunks keep first-argmin
            best[upd] = v[upd]
            best_id[upd] = lo + j[upd]
        return best_id

    def _two_level(x):
        n = len(x)
        sd2 = sup_sq[None, :] - 2.0 * (x @ sup.T)
        p = min(coarse_probes, sd2.shape[1])
        top = np.argpartition(sd2, p - 1, axis=1)[:, :p]
        best = np.full(n, np.inf)
        best_id = np.full(n, -1, dtype=np.int64)
        for s in range(len(members)):
            mem = members[s]
            if not len(mem):
                continue
            rows = np.nonzero((top == s).any(axis=1))[0]
            if not len(rows):
                continue
            d2 = cent_sq[mem][None, :] - 2.0 * (x[rows] @ cent[mem].T)
            j = d2.argmin(axis=1)
            v = d2[np.arange(len(rows)), j]
            cand = mem[j]
            upd = (v < best[rows]) | ((v == best[rows]) & (cand < best_id[rows]))
            rr = rows[upd]
            best[rr] = v[upd]
            best_id[rr] = cand[upd]
        miss = best_id < 0  # every probed super-cell was empty (rare)
        if miss.any():
            best_id[miss] = _flat(x[miss])
        return best_id

    def assign(batches):
        for pdf in batches:
            if not len(pdf):  # empty Arrow batch: (0,) @ (k,d) raises
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # (n, d)
            pdf = pdf.copy()
            ids = _two_level(x) if members is not None else _flat(x)
            pdf["centroid_id"] = ids.astype("int32")
            yield pdf

    return df.mapInPandas(assign, out_schema)
