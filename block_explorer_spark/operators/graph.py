"""Connected components over pair edges — dedup cluster resolution.

Near-dup detection (jaccard/LSH/simhash/containment pairs) emits
EDGES; deduplication needs CLUSTERS: every document labeled with its
component so one canonical survivor per cluster can be kept.

Implementation: LARGE-STAR / SMALL-STAR alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14, Alg. 1) —
round-9 replacement for plain hash-min propagation, whose x1000
scale-curve tail (O(diameter) rounds, each shuffling the FULL
symmetric edge set joined against labels) was the repo's worst curve:

  large-star(u): attach every neighbor v > u to
                 m = min(Γ(u) ∪ {u})
  small-star(u): orient edges (big, small); attach every neighbor
                 and u itself to m = min(Γ(u) ∪ {u})

Both operations preserve connectivity and never increase edge count;
alternation converges in O(log² n) rounds (empirically ~log n), and —
the property hash-min lacks — the WORKING EDGE SET CONTRACTS toward
the final star forest as it converges, so late rounds shuffle a small
fraction of m. At the fixed point the edges are exactly
(vertex, component-min) stars, which is the output labeling.

Each round is two self-contained shuffles on the vertex id (a
groupBy-min reusing the join exchange); lineage is cut per round
(localCheckpoint) — the classic Spark iterative-algorithm trap.
Driver involvement is one scalar count per round (the convergence
check), never the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage between iterations — the iterative-plan trap fix.

    Two modes, picked by whether the SparkContext has a checkpoint
    directory configured:

    - no dir (local runs, tests, gates): localCheckpoint — blocks
      cached on executors, zero I/O, fastest.
    - dir set (cluster posture): RELIABLE checkpoint — RDD files
      under the checkpoint dir. localCheckpoint blocks live only on
      their executor, so on a real cluster ONE lost executor kills an
      hour-long CC/PageRank mid-iteration with no recovery (the
      lineage it would replay from was just cut). Reliable
      checkpoints survive executor loss at the cost of one write+read
      of the per-iteration state, which for these operators is the
      CONTRACTED working set (star edges / rank table / frontier),
      not the input graph.

    100 TB posture: set a job-scoped HDFS/S3 checkpoint dir
    (session.get_spark honors SPARK_GRAFT_CHECKPOINT_DIR); leave it
    unset for local mode, where executor loss means JVM death anyway
    and localCheckpoint's zero-I/O cut is strictly better.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _large_star(oriented: DataFrame) -> DataFrame:
    """One large-star round. Input/output: oriented (u > v) star
    edges. Symmetrizes internally because large-star needs the FULL
    neighborhood of every node."""
    sym = oriented.unionByName(
        oriented.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    # m = min(Γ(u) ∪ {u}); emit (v, m) for strictly-larger neighbors.
    # v > u ≥ m, so the output stays (big, small)-oriented and
    # self-loop free by construction.
    return (
        sym.join(mins, "u")
        .select(F.col("v").alias("u"), F.least("__mn", F.col("u")).alias("v"))
        .filter(F.col("u") > F.col("v"))
        .distinct()
    )


def _small_star(oriented: DataFrame) -> DataFrame:
    """One small-star round. Input: oriented (u > v) edges, so Γ(u)
    here is exactly the smaller neighborhood and m = min(Γ(u))."""
    mins = oriented.groupBy("u").agg(F.min("v").alias("__mn"))
    attach_nbrs = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("__mn"))
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
    )
    attach_self = mins.select("u", F.col("__mn").alias("v"))
    return attach_nbrs.unionByName(attach_self).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    use_checkpoint: bool = True,
) -> DataFrame:
    """Label every vertex of the pair graph with min-id of its
    component. Returns (id, component).

    edges: two-column DataFrame of undirected pairs (any orientation;
    oriented internally, self-loops dropped). Vertices are the ids
    appearing in at least one edge — callers union in singletons if
    they need every input row labeled (dedup doesn't: a doc with no
    near-dup pair is its own cluster by definition).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    cur = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    if use_checkpoint:
        cur = _cut(cur)
    n_cur = cur.count()

    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur))
        if use_checkpoint:
            nxt = _cut(nxt)
        # Fixed point ⇔ edge set unchanged. Both sides are distinct
        # (big, small) sets, so |new| == |old| plus new \ old == ∅ is
        # full set equality; the subtract runs on the CONTRACTED sets.
        n_nxt = nxt.count()
        if n_nxt == n_cur and nxt.exceptAll(cur).limit(1).count() == 0:
            cur = nxt
            break
        cur, n_cur = nxt, n_nxt
    else:
        # Exiting via exhaustion with edges still moving means the
        # result is NOT a fixed point — silently returning it would be
        # wrong-but-plausible. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (edge set still changing); raise max_iter for "
            "adversarially deep graphs"
        )
    # Fixed point = star forest: (v, root) for every non-root vertex;
    # roots appear only on the right. Label both sides.
    return cur.select(F.col("u").alias("id"), F.col("v").alias("component")).unionByName(
        cur.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs and mark canonical survivors.

    Output: (doc_id, cluster_id, is_canonical) for every doc that
    appears in at least one pair; cluster_id = min doc id of the
    component (deterministic, engine-replicable); the canonical doc
    is the cluster id holder — the "keep smallest id" policy every
    dedup pipeline needs some deterministic version of.
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: tuple[int, int] = (85, 100),
    scale: int = 1_000_000,
    use_checkpoint: bool = True,
) -> DataFrame:
    """PageRank on an INTEGER lattice — every rank is a long, every
    update is floor division, so the result is independent of
    partitioning and addition order (integer sums commute; float
    PageRank would differ run to run under Spark's nondeterministic
    reduce order) and a SQL engine can replay the fixed iteration
    count bit for bit.

    Per node, rank in units of 1/scale:

      rank_0(v)   = scale
      contrib(v)  = rank_i(v) // out_degree(v)         (per out-edge)
      rank_i+1(v) = ((den-num)*scale) // den
                    + (num * Σ incoming contrib) // den

    with damping = (num, den) = 0.85 as an exact rational. Dangling
    nodes keep contributing nothing (their mass leaks — the simple
    variant; the teleport term keeps ranks bounded). Each iteration is
    ONE shuffle (contrib groupBy dst) plus the rank join against the
    degree-carrying edge table — Spark picks broadcast vs shuffle via
    AQE. Lineage is cut per iteration (the iterative-plan trap, same
    as connected_components).

    The STATIC frames — the distinct edge set pre-joined with its
    out-degrees, and the vertex set — are materialized ONCE before
    the loop and lineage-cut. Without that cut each iteration's plan
    re-derives them from the raw edge lineage (edge-building join +
    distinct + degree agg + vertex union, ×iters — the r11 profile
    showed q116 reading its base tables ~15×: 11.1M input records for
    a 750k-row graph).

    The loop carries the compact IN-SUM table, not the full rank
    table: because rank_i(v) for i ≥ 1 is the pure function
    base + (num·in_sum_i(v))//den with in_sum defaulting to 0, the
    per-iteration plan is ONE join (edges LEFT JOIN in_sum, computing
    the sender's rank inline via coalesce) + ONE aggregation — the
    nodes⋈rank materialization the previous form paid per iteration
    happens exactly once, at the end. Iteration 1 needs no join at
    all (rank_0 is the constant `scale`). Bit-identical output:
    absent in_sum ⇔ rank = base, the same value the left-join +
    coalesce produced.

    Returns (id, rank) — rank is the scaled long. Standard reference:
    Page/Brin/Motwani/Winograd 1999.
    """
    num, den = damping
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # Pre-join the (static) degree onto the edge set once — the loop
    # then joins the iteration state against ONE table instead of
    # re-joining out_deg every iteration. Within this one
    # materialization the e.distinct exchange is shared by the join
    # side and the degree agg (ReusedExchange), so the raw edge
    # lineage executes once.
    ec = e.join(out_deg, "src")
    if use_checkpoint:
        # r12: LAZY cut — the loop and final join all execute inside
        # ONE action (the in_sum cuts below are lazy too), so ec's
        # blocks materialize on first use within that action instead
        # of paying a serial standalone job before it. Interleaved
        # sf0.1 A/B: 4.22 -> 3.94 s median (-7%), all 4 passes lazy-
        # faster; identical frame either way, only scheduling moves.
        ec = _cut(ec, eager=False)
    # NOT lineage-cut: since the in_sum hoist, `nodes` is consumed
    # exactly once (the final join / the iters==0 return), so an eager
    # cut is a pure extra materialization job run SERIALLY before the
    # loop — uncut, its shallow lineage (one distinct over ec's
    # already-cut blocks) executes inside the final action, where the
    # scheduler overlaps its stages with the iteration chain. Cost of
    # the trade (ADVICE r11): the union's two branches each scan the
    # checkpointed ec blocks, so the final action reads the edge table
    # TWICE — in reliable-checkpoint (cluster) mode that is two
    # filesystem reads of the edge set; revisit if the final-join
    # stage shows 2x edge-read bytes at x1000.
    nodes = (
        ec.select(F.col("src").alias("id"))
        .union(ec.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = ((den - num) * scale) // den
    if iters == 0:
        return nodes.select("id", F.lit(scale).cast("long").alias("rank"))
    # rank of a sender under the current in_sum state (i ≥ 1); absent
    # in_sum rows mean "no in-edges" → rank = base exactly.
    rank_expr = (
        f"CAST({base} AS BIGINT)"
        f" + (CAST({num} AS BIGINT) * coalesce(in_sum, 0L)) div {den}"
    )
    in_sum = None
    for i in range(iters):
        if i == 0:
            # rank_0 is the constant `scale`: no join needed.
            contrib = ec.select(
                "dst", F.expr(f"CAST({scale} AS BIGINT) div deg").alias("c")
            )
        else:
            contrib = ec.join(
                in_sum.withColumnRenamed("dst", "src"), "src", "left"
            ).select("dst", F.expr(f"({rank_expr}) div deg").alias("c"))
        in_sum = contrib.groupBy("dst").agg(F.sum("c").alias("in_sum"))
        if use_checkpoint:
            in_sum = _cut(in_sum, eager=False)
    return nodes.join(
        in_sum.withColumnRenamed("dst", "id"), "id", "left"
    ).select("id", F.expr(rank_expr).cast("long").alias("rank"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    use_checkpoint: bool = True,
) -> DataFrame:
    """Hop-bounded breadth-first reachability: (id, hops) with the
    MINIMAL hop count from any source vertex, for every vertex within
    `max_hops` directed hops — "which documents/accounts/objects sit
    within k links of this seed set", the blast-radius query every
    graph-shaped audit starts with (and the relational core of k-hop
    GNN neighborhood sampling).

    Frontier expansion, Spark-relationally: each hop is ONE shuffle
    (frontier⋈edges, distinct, anti-join against the visited set);
    lineage is localCheckpoint-cut per hop like the other iterative
    operators here. The frontier SHRINKS as the reachable set
    saturates — an early exit fires when it empties, so cost is
    bounded by min(max_hops, eccentricity) rounds. Driver sees one
    scalar per round (the empty check), never the data.

    Hop counts are exact integers and the expansion order cannot
    affect the minimal hop count (BFS invariant: a vertex enters at
    its true distance), so a SQL oracle replays this bit for bit with
    a recursive CTE + GROUP BY min — certified in q133.

    edges: directed (src, dst) pairs (symmetrize upstream for an
    undirected walk). sources: one column `id`; hops start at 0
    there. Self-loops are harmless (a vertex already visited is
    anti-joined away)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    if use_checkpoint:
        e = _cut(e)  # edges reused every round
    visited = (
        sources.select(F.col("id").cast("long").alias("id"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )
    if use_checkpoint:
        visited = _cut(visited)
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["u"])
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        )
        if use_checkpoint:
            nxt = _cut(nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt)
        if use_checkpoint:
            visited = _cut(visited)
        frontier = nxt
    return visited


#: Target wedge rows per task for the triangle wedge join — the unit
#: of work is a GENERATED row (two longs joined + hash-probed against
#: the closing set + partially counted), not an input byte, so the
#: stage is CPU-bound at ~5-10M rows/s/core; 2M rows ≈ a fraction of a
#: second per task at any scale. The width formula clamps to
#: [defaultParallelism, 128·defaultParallelism], so a cluster gets at
#: least full fan-out and never more than ~100 waves.
WEDGE_ROWS_PER_TASK = 2_000_000

#: Max out-edges of one pivot handled as a single wedge-join group.
#: The wedge join hash-partitions by pivot, so every wedge one pivot
#: generates lands in ONE task; degree-ordered orientation bounds
#: oriented out-degree near O(sqrt m), but an adversarial degree
#: sequence can still put ~m/2 generated rows on one unsplittable key
#: (and a user-numbered repartition is exempt from AQE skew
#: splitting). Pivots above this threshold therefore take a BLOCKED
#: self-join: out-edges are numbered rank-order within the pivot,
#: chunked into blocks of this size, and the pair space is covered by
#: (s, p, q) block-pair join groups — max task input ~2 blocks and
#: max task expansion ~BLOCK^2 pairs, independent of pivot degree.
#: The gate rides the wedge-volume aggregate (max out-degree comes
#: from the same O(m) pass), so graphs with no hot pivot — every
#: tested real shape — keep the plain one-exchange wedge join.
WEDGE_BLOCK = int(os.environ.get("SPARK_GRAFT_WEDGE_BLOCK", "4096"))


def triangle_counts(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    use_checkpoint: bool = True,
) -> DataFrame:
    """Per-vertex triangle counts over an undirected graph — the
    local clustering signal behind community/cohesion analysis (and
    the classic test of whether a graph engine can avoid the naive
    O(Σdeg²) wedge explosion).

    Degree-ordered orientation (Cohen, "Graph Twiddling in a
    MapReduce World", CiSE 2009): orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one — a total
    order, so each triangle closes exactly once — then join wedges
    (two out-edges of the pivot) against the oriented edge set. The
    pivot of every wedge is its LOWEST-degree vertex, which bounds
    out-degree by O(√m) on any graph, so the wedge volume is O(m^1.5)
    instead of the hub-quadratic count a plain neighbor self-join
    pays. Three shuffles total: degree agg, wedge join, closing join.

    Returns (id, triangles) for vertices in ≥1 triangle — exact
    integers, so a SQL oracle replays it with the id-canonical 3-way
    join (orientation changes the plan, never the counts; q134).

    EAGER: constructing the plan runs one O(m) scalar aggregate over
    the oriented edges (wedge volume + max pivot out-degree) to size
    the wedge stage and gate the hot-pivot blocked join — the returned
    frame is lazy, but that sizing job runs even if it is never
    executed."""
    e0 = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e0.select(F.col("a").alias("id"))
        .unionAll(e0.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ranked = (
        e0.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a", "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("i")).alias("ra"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("i")).alias("rb"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("ra") < F.col("rb"), F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(F.col("ra") < F.col("rb"), F.col("b")).otherwise(F.col("a")).alias("d"),
        F.when(F.col("ra") < F.col("rb"), F.col("rb")).otherwise(F.col("ra")).alias("rd"),
    )
    if use_checkpoint:
        # `oriented` feeds THREE consumers (both wedge sides and the
        # closing probe); without a cut each re-computes the whole
        # degree-join subtree — the audit showed the uncut plan at 24
        # SMJs / 229 exchanges vs 2 joins of the materialized frame
        oriented = _cut(oriented)
    # Wedge-stage width (r11): the wedge self-join's OUTPUT is
    # quadratic in pivot out-degree (Σ c·(c−1)/2 rows) while its
    # INPUT is the m-row edge list, so AQE's byte-based coalescing —
    # which only sees a few MB of oriented edges — packs the whole
    # O(m^1.5) expansion (join + closing probe + partial count, one
    # fused stage) into 1-3 tasks (r11 profile at sf0.1: ONE stage,
    # 3 tasks, 10.8 s of the query's 15.4 s executor time). Compute
    # the exact wedge volume with one cheap O(m) aggregate over the
    # materialized frame and size an explicit repartition by it —
    # user-numbered repartitions are exempt from AQE coalescing, and
    # both wedge sides canonicalize to the SAME exchange, so the
    # widening costs one shuffle that was already being paid.
    # NOTE: this aggregate EXECUTES at plan-construction time (one
    # O(m) scalar job over the already-materialized oriented frame) —
    # the price of sizing the wedge stage and detecting hot pivots
    # from the actual wedge volume rather than a guess. Callers that
    # never run the returned frame still pay it.
    wstats = (
        oriented.groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1)")).alias("w"),
            F.max("c").alias("mx"),
        )
        .collect()[0]
    )
    wedge_rows = (wstats["w"] or 0) // 2
    max_out = wstats["mx"] or 0
    dp = edges.sparkSession.sparkContext.defaultParallelism
    width = int(min(max(dp, wedge_rows // WEDGE_ROWS_PER_TASK + 1), 128 * dp))
    if max_out <= WEDGE_BLOCK:
        wide = oriented.repartition(width, "s")
        x = wide.select(
            F.col("s"), F.col("d").alias("d1"), F.col("rd").alias("r1")
        )
        y = wide.select(
            F.col("s"), F.col("d").alias("d2"), F.col("rd").alias("r2")
        )
        # wedge endpoints ordered by RANK so the closing edge — oriented
        # lower-rank → higher-rank by construction — matches exactly once
        wedges = x.join(y, "s").filter(F.col("r1") < F.col("r2")).select(
            "s", "d1", "d2"
        )
    else:
        # Hot-pivot path (see WEDGE_BLOCK): number each pivot's
        # out-edges in rank order, chunk into blocks of B, and join
        # block-pairs on (s, p, q). A pair (i, j) with r_i < r_j has
        # block(i) <= block(j) (row_number follows the rank order), so
        # it is generated exactly once: the left side replicates row i
        # to every q >= block(i), the right side replicates row j to
        # every p <= block(j). Pivots at or under B emit one row per
        # side (sequence of length 1) — replication only where needed.
        from pyspark.sql import Window

        B = WEDGE_BLOCK
        wo = Window.partitionBy("s").orderBy("rd")
        wp = Window.partitionBy("s")
        wb = oriented.repartition(width, "s").select(
            "s",
            "d",
            "rd",
            F.floor((F.row_number().over(wo) - F.lit(1)) / B)
            .cast("int")
            .alias("b"),
            F.ceil(F.count(F.lit(1)).over(wp) / B).cast("int").alias("nb"),
        )
        x = wb.select(
            "s",
            F.col("b").alias("p"),
            F.explode(F.sequence(F.col("b"), F.col("nb") - 1)).alias("q"),
            F.col("d").alias("d1"),
            F.col("rd").alias("r1"),
        )
        y = wb.select(
            "s",
            F.explode(F.sequence(F.lit(0).cast("int"), F.col("b"))).alias("p"),
            F.col("b").alias("q"),
            F.col("d").alias("d2"),
            F.col("rd").alias("r2"),
        )
        wedges = (
            x.repartition(width, "s", "p", "q")
            .join(y.repartition(width, "s", "p", "q"), ["s", "p", "q"])
            .filter(F.col("r1") < F.col("r2"))
            .select("s", "d1", "d2")
        )
    closing = oriented.select(F.col("s").alias("d1"), F.col("d").alias("d2"))
    tri = wedges.join(closing, ["d1", "d2"])
    # one row per (triangle, corner) via explode — NOT a union of three
    # projections of `tri`: a union re-executes the un-materialized
    # wedge-join subtree once per branch (the r11 profile showed the
    # whole expansion stage 3×: 96 tasks / 3 identical subtrees), while
    # explode generates the three corners from ONE execution.
    roles = tri.select(
        F.explode(F.array("s", "d1", "d2")).alias("id")
    )
    return roles.groupBy("id").agg(F.count("*").alias("triangles"))


def shortest_paths_int(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    use_checkpoint: bool = True,
) -> DataFrame:
    """Bounded Bellman-Ford: (id, dist) with the minimal total
    INTEGER edge weight from any source, over paths of at most
    `rounds` edges — weighted blast radius / cheapest-route within a
    hop budget. With rounds ≥ |V|−1 and non-negative weights this is
    the exact single-source shortest path.

    Each round is ONE shuffle: frontier-relax candidates
    (dist ⋈ edges), union with the standing distances, groupBy min.
    Lineage localCheckpoint-cut per round; the relaxation joins only
    vertices whose distance IMPROVED last round (the classic
    workset optimization), so saturated graphs stop paying the join
    long before the round budget. Distances are exact integers and
    min() is order-free, so the q138 oracle replays the loop with a
    hop-bounded recursive CTE + GROUP BY MIN.

    edges: (src, dst, weight) directed rows, weight a non-negative
    integer column (symmetrize upstream for undirected graphs).
    sources: one column `id`, distance 0."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    if use_checkpoint:
        e = _cut(e)
    dist = (
        sources.select(F.col("id").cast("long").alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    if use_checkpoint:
        dist = _cut(dist)
    frontier = dist  # vertices improved last round
    for _ in range(rounds):
        cand = (
            frontier.join(e, frontier["id"] == e["u"])
            .select(F.col("v").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if use_checkpoint:
            merged = _cut(merged)
        improved = merged.alias("m").join(
            dist.alias("d"), "id", "left"
        ).filter(
            F.col("d.dist").isNull() | (F.col("m.dist") < F.col("d.dist"))
        ).select("id", F.col("m.dist").alias("dist"))
        if use_checkpoint:
            improved = _cut(improved)
        if improved.limit(1).count() == 0:
            return merged
        dist, frontier = merged, improved
    return dist


def ppr_int(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: tuple[int, int] = (85, 100),
    scale: int = 1_000_000,
    use_checkpoint: bool = True,
) -> DataFrame:
    """Personalized PageRank on the integer lattice: identical update
    rule to `pagerank_int`, except the teleport term returns mass
    ONLY to the source set — rank becomes proximity TO the seeds, the
    similarity/recommendation primitive ("accounts most related to
    this one", "docs in this doc's neighborhood"). Haveliwala
    (WWW'02) topic-sensitive PageRank, floor-division exact:

      rank_0(v)   = scale·[v ∈ S]
      rank_i+1(v) = [v ∈ S]·((den−num)·scale)//den
                    + (num · Σ incoming rank_i(u)//deg(u)) // den

    Integer sums commute, so the fixed iteration count is
    partitioning-independent and SQL-replayable (q145 unrolls it as
    chained CTEs, like q116). One join + one aggregation per
    iteration, carrying the compact in_sum state exactly as
    pagerank_int does (rank_i for i ≥ 1 is the pure function
    is_src·base + (num·in_sum_i)//den of the state, so the nodes⋈rank
    materialization happens once, after the loop; the sender's is_src
    bit rides on the pre-joined edge table); lineage cut per round."""
    num, den = damping
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    srcs = sources.select(F.col("id").cast("long").alias("id")).distinct()
    # Degree AND the sender's teleport bit pre-joined onto the edge
    # set ONCE and lineage-cut (see pagerank_int): without this the
    # loop re-runs the degree agg and a second join every iteration.
    ec = (
        e.join(out_deg, "src")
        .join(
            srcs.select(F.col("id").alias("src"), F.lit(1).alias("__s")),
            "src",
            "left",
        )
        .select("src", "dst", "deg", F.coalesce("__s", F.lit(0)).alias("s"))
    )
    if use_checkpoint:
        # r12: lazy for the same reason as pagerank_int's ec —
        # everything downstream is one action; see the note there.
        ec = _cut(ec, eager=False)
    nodes = (
        ec.select(F.col("src").alias("id"))
        .union(ec.select(F.col("dst").alias("id")))
        .union(srcs)
        .distinct()
        .join(srcs.withColumn("__s", F.lit(1)), "id", "left")
        .select("id", F.coalesce(F.col("__s"), F.lit(0)).alias("is_src"))
    )
    # not cut — single consumer since the in_sum hoist (see pagerank_int)
    base = ((den - num) * scale) // den
    if iters == 0:
        return nodes.select(
            "id", (F.col("is_src") * F.lit(scale)).cast("long").alias("rank")
        )
    # sender rank under the current in_sum state (i ≥ 1); absent
    # in_sum ⇔ no in-edges ⇔ the teleport term alone.
    sender_rank = (
        f"CAST(s AS BIGINT) * {base}"
        f" + (CAST({num} AS BIGINT) * coalesce(in_sum, 0L)) div {den}"
    )
    in_sum = None
    for i in range(iters):
        if i == 0:
            # rank_0 = is_src·scale: no join needed.
            contrib = ec.select(
                "dst",
                F.expr(f"(CAST(s AS BIGINT) * {scale}) div deg").alias("c"),
            )
        else:
            contrib = ec.join(
                in_sum.withColumnRenamed("dst", "src"), "src", "left"
            ).select("dst", F.expr(f"({sender_rank}) div deg").alias("c"))
        in_sum = contrib.groupBy("dst").agg(F.sum("c").alias("in_sum"))
        if use_checkpoint:
            in_sum = _cut(in_sum, eager=False)
    return nodes.join(
        in_sum.withColumnRenamed("dst", "id"), "id", "left"
    ).select(
        "id",
        (
            F.col("is_src") * F.lit(base)
            + F.expr(f"(CAST({num} AS BIGINT) * coalesce(in_sum, 0)) div {den}")
        ).cast("long").alias("rank"),
    )
