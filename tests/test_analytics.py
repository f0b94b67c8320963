"""Funnel / cohort / integer-PageRank: hand-computed fixtures,
strictness edges, and the partitioning-invariance that justifies the
integer lattice."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_explorer_spark.operators.graph import pagerank_int


class TestPageRankInt:
    def _ranks(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["id"]: r["rank"] for r in pagerank_int(df, **kw).collect()
        }

    def test_matches_hand_iteration(self, spark):
        # 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 (the classic 3-node example)
        edges = [(1, 2), (1, 3), (2, 3), (3, 1)]
        got = self._ranks(spark, edges, iters=3, scale=1000)
        # hand-run the same integer recurrence
        ranks = {1: 1000, 2: 1000, 3: 1000}
        deg = {1: 2, 2: 1, 3: 1}
        base = (15 * 1000) // 100
        for _ in range(3):
            inc = {1: 0, 2: 0, 3: 0}
            for s, d in edges:
                inc[d] += ranks[s] // deg[s]
            ranks = {v: base + (85 * inc[v]) // 100 for v in ranks}
        assert got == ranks

    def test_partitioning_invariance(self, spark):
        edges = [(i, (i * 7) % 50) for i in range(200) if i != (i * 7) % 50]
        df1 = spark.createDataFrame(edges, "src long, dst long")
        df2 = df1.repartition(13)
        r1 = {r["id"]: r["rank"] for r in pagerank_int(df1, iters=4).collect()}
        r2 = {r["id"]: r["rank"] for r in pagerank_int(df2, iters=4).collect()}
        assert r1 == r2

    def test_star_center_dominates(self, spark):
        edges = [(i, 0) for i in range(1, 20)]
        got = self._ranks(spark, edges, iters=5)
        assert got[0] > max(v for k, v in got.items() if k != 0) * 5

    def test_dangling_nodes_keep_teleport_floor(self, spark):
        got = self._ranks(spark, [(1, 2)], iters=5, scale=1_000_000)
        # node 1 has no in-edges: exactly the teleport base after iter 1
        assert got[1] == (15 * 1_000_000) // 100
        assert got[2] > got[1]


class TestFunnelCohortGates:
    def _events(self, spark, rows):
        # (user_id, ts_nanos, event_type) shaped like _t's events
        return spark.createDataFrame(
            [(u, t, et) for u, t, et in rows],
            "user_id long, ts long, event_type string",
        )

    def test_funnel_strictness_on_equal_timestamps(self, spark):
        import __spark_entry__ as entry

        # user 1 completes; user 2's click ties the view ts (strict >
        # rejects); user 3 clicks before viewing
        rows = [
            (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
            (2, 100, "view"), (2, 100, "click"),
            (3, 200, "view"), (3, 100, "click"),
        ]
        df = self._events(spark, rows)

        s1 = df.filter(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("ts").alias("t1"))
        s2 = (df.filter(F.col("event_type") == "click")
              .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
              .groupBy("user_id").agg(F.min("ts").alias("t2")))
        s3 = (df.filter(F.col("event_type") == "purchase")
              .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
              .groupBy("user_id").agg(F.min("ts").alias("t3")))
        assert s1.count() == 3 and s2.count() == 1 and s3.count() == 1
        assert [r["user_id"] for r in s3.collect()] == [1]
        assert entry  # gate wiring imported ok

    def test_cohort_week_offsets_floor(self, spark):
        day_ns = 86_400_000_000_000
        rows = [
            (1, 0 * day_ns, "view"),          # cohort day 0
            (1, 6 * day_ns, "view"),          # offset 0 (day 6 // 7)
            (1, 7 * day_ns, "view"),          # offset 1
            (2, 3 * day_ns, "view"),          # cohort day 3
            (2, 9 * day_ns, "view"),          # offset 0 (6 days later)
            (2, 10 * day_ns, "view"),         # offset 1
        ]
        df = self._events(spark, rows)
        day = F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
        first = df.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
        act = (
            df.select("user_id", day.alias("day"))
            .join(first, "user_id")
            .select(
                "user_id", "cohort_day",
                (F.datediff("day", "cohort_day") / 7).cast("long")
                .alias("week_offset"),
            )
        )
        got = {
            (str(r["cohort_day"]), r["week_offset"]): r["users"]
            for r in act.groupBy("cohort_day", "week_offset")
            .agg(F.count_distinct("user_id").alias("users")).collect()
        }
        assert got == {
            ("1970-01-01", 0): 1, ("1970-01-01", 1): 1,
            ("1970-01-04", 0): 1, ("1970-01-04", 1): 1,
        }


class TestSegmentDrift:
    def test_drift_zero_for_identical_rates_and_flags_gap(self, spark):
        from block_explorer_spark.operators.profile import segment_drift

        rows = [
            # 'common' appears at the same rate in both segments;
            # 'only_a' is exclusive to A — maximal drift signal
            ("A", "common common only_a only_a only_a"),
            ("B", "common common filler filler filler"),
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        got = {
            r["token"]: (r["a"], r["b"], r["drift"])
            for r in segment_drift(df, "lang", "A", "B", topk=10).collect()
        }
        na = nb = 5
        for tok, (a, b, drift) in got.items():
            want = ((a * nb - b * na) ** 2) // ((a + b) * na * nb)
            assert drift == want, tok
        assert got["common"][2] == 0
        assert got["only_a"][2] > 0 and got["filler"][2] > 0

    def test_partitioning_invariance(self, spark):
        from block_explorer_spark.operators.profile import segment_drift

        rows = [("A" if i % 3 else "B", f"tok{i % 17} tok{i % 5} x")
                for i in range(300)]
        df = spark.createDataFrame(rows, "lang string, text string")
        r1 = segment_drift(df, "lang", "A", "B", topk=25).collect()
        r2 = segment_drift(df.repartition(11), "lang", "A", "B", topk=25).collect()
        assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


class TestBfsHops:
    """Hop-bounded reachability (graph.py::bfs_hops): minimal hop
    counts, directedness, early exit, and the hop-0 edge."""

    def _edges(self, spark):
        return spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (9, 10)],
            "src long, dst long",
        )

    def test_min_hops_on_chain(self, spark):
        from block_explorer_spark.operators.graph import bfs_hops

        srcs = spark.createDataFrame([(1,)], "id long")
        got = sorted(
            (r["id"], r["hops"])
            for r in bfs_hops(self._edges(spark), srcs, 3).collect()
        )
        assert got == [(1, 0), (2, 1), (3, 2), (4, 3), (6, 2), (7, 3)]

    def test_early_exit_beyond_eccentricity(self, spark):
        from block_explorer_spark.operators.graph import bfs_hops

        srcs = spark.createDataFrame([(1,)], "id long")
        got = sorted(
            (r["id"], r["hops"])
            for r in bfs_hops(self._edges(spark), srcs, 50).collect()
        )
        # component of 1 exhausted at hop 4; 9/10 unreachable
        assert got == [(1, 0), (2, 1), (3, 2), (4, 3), (5, 4), (6, 2), (7, 3)]

    def test_directed_and_multi_source(self, spark):
        from block_explorer_spark.operators.graph import bfs_hops

        # edges are directed: nothing reaches back to 1
        srcs = spark.createDataFrame([(5,), (9,)], "id long")
        got = sorted(
            (r["id"], r["hops"])
            for r in bfs_hops(self._edges(spark), srcs, 2).collect()
        )
        assert got == [(5, 0), (9, 0), (10, 1)]

    def test_zero_hops_and_bad_bound(self, spark):
        import pytest as _pt

        from block_explorer_spark.operators.graph import bfs_hops

        srcs = spark.createDataFrame([(1,)], "id long")
        got = bfs_hops(self._edges(spark), srcs, 0).collect()
        assert [(r["id"], r["hops"]) for r in got] == [(1, 0)]
        with _pt.raises(ValueError):
            bfs_hops(self._edges(spark), srcs, -1)

    def test_cycle_terminates_with_min_hops(self, spark):
        from block_explorer_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        srcs = spark.createDataFrame([(1,)], "id long")
        got = sorted(
            (r["id"], r["hops"]) for r in bfs_hops(edges, srcs, 10).collect()
        )
        assert got == [(1, 0), (2, 1), (3, 2)]


class TestTriangleCounts:
    def test_k4_plus_pendant(self, spark):
        from block_explorer_spark.operators.graph import triangle_counts

        # K4 on {1..4} (each vertex in 3 triangles) + pendant 5 +
        # duplicate/reversed edges that must not double-count
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1)],
            "u long, v long",
        )
        got = sorted(
            (r["id"], r["triangles"]) for r in triangle_counts(edges).collect()
        )
        assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]

    def test_triangle_free_and_self_loops(self, spark):
        from block_explorer_spark.operators.graph import triangle_counts

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (2, 2)], "u long, v long"
        )
        assert triangle_counts(edges).count() == 0

    def test_two_shared_triangles(self, spark):
        from block_explorer_spark.operators.graph import triangle_counts

        # bowtie: triangles (1,2,3) and (3,4,5) share vertex 3
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)],
            "u long, v long",
        )
        got = dict(
            (r["id"], r["triangles"]) for r in triangle_counts(edges).collect()
        )
        assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


class TestShortestPathsInt:
    def _wedges(self, spark):
        # 1->2 (w1), 2->3 (w1), 1->3 (w5): two-hop path beats direct
        return spark.createDataFrame(
            [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 2)],
            "src long, dst long, w long",
        )

    def test_relaxation_beats_direct_edge(self, spark):
        from block_explorer_spark.operators.graph import shortest_paths_int

        srcs = spark.createDataFrame([(1,)], "id long")
        got = sorted(
            (r["id"], r["dist"])
            for r in shortest_paths_int(self._wedges(spark), srcs, 3).collect()
        )
        assert got == [(1, 0), (2, 1), (3, 2), (4, 4)]

    def test_round_bound_is_path_length_bound(self, spark):
        from block_explorer_spark.operators.graph import shortest_paths_int

        srcs = spark.createDataFrame([(1,)], "id long")
        got = dict(
            (r["id"], r["dist"])
            for r in shortest_paths_int(self._wedges(spark), srcs, 1).collect()
        )
        # one round: only direct edges relaxed — 3 keeps weight 5
        assert got == {1: 0, 2: 1, 3: 5}

    def test_early_exit_and_zero_rounds(self, spark):
        import pytest as _pt

        from block_explorer_spark.operators.graph import shortest_paths_int

        srcs = spark.createDataFrame([(1,)], "id long")
        got = sorted(
            (r["id"], r["dist"])
            for r in shortest_paths_int(self._wedges(spark), srcs, 99).collect()
        )
        assert got == [(1, 0), (2, 1), (3, 2), (4, 4)]
        only_src = shortest_paths_int(self._wedges(spark), srcs, 0).collect()
        assert [(r["id"], r["dist"]) for r in only_src] == [(1, 0)]
        with _pt.raises(ValueError):
            shortest_paths_int(self._wedges(spark), srcs, -1)

    def test_multi_source_takes_best(self, spark):
        from block_explorer_spark.operators.graph import shortest_paths_int

        srcs = spark.createDataFrame([(1,), (3,)], "id long")
        got = dict(
            (r["id"], r["dist"])
            for r in shortest_paths_int(self._wedges(spark), srcs, 3).collect()
        )
        assert got == {1: 0, 2: 1, 3: 0, 4: 2}


class TestPersonalizedPageRank:
    def test_hand_iteration_on_cycle(self, spark):
        from block_explorer_spark.operators.graph import ppr_int

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        srcs = spark.createDataFrame([(1,)], "id long")
        one = dict(
            (r["id"], r["rank"])
            for r in ppr_int(edges, srcs, iters=1, scale=1_000_000).collect()
        )
        # r0 = 1e6 at the seed; iter1: seed keeps base 150000, its
        # out-neighbor gets 850000, the far node 0
        assert one == {1: 150000, 2: 850000, 3: 0}
        two = dict(
            (r["id"], r["rank"]) for r in ppr_int(edges, srcs, iters=2).collect()
        )
        assert two == {1: 150000, 2: 127500, 3: 722500}

    def test_mass_concentrates_near_seed(self, spark):
        from block_explorer_spark.operators.graph import ppr_int

        # star: seed 1 <-> hub 2 <-> {3,4,5}; distant chain 5->6
        rows = [(1, 2), (2, 1), (2, 3), (3, 2), (2, 4), (4, 2), (5, 6)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        srcs = spark.createDataFrame([(1,)], "id long")
        got = dict(
            (r["id"], r["rank"]) for r in ppr_int(edges, srcs, iters=6).collect()
        )
        assert got[1] > got[2] > got[3] == got[4] > got.get(6, 0)
        # disconnected 5 never gains mass
        assert got[5] == 0

    def test_multi_seed_union(self, spark):
        from block_explorer_spark.operators.graph import ppr_int

        edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
        srcs = spark.createDataFrame([(1,), (3,)], "id long")
        got = dict(
            (r["id"], r["rank"]) for r in ppr_int(edges, srcs, iters=2).collect()
        )
        # symmetric components get identical ranks
        assert got[1] == got[3] and got[2] == got[4] and got[2] > 0
