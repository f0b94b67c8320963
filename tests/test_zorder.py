"""Z-order clustering: Morton key parity vs a pure-Python reference,
round-trip completeness, and the capability claim itself — a 2-D box
predicate prunes strictly more files on a z-ordered layout than on a
1-D linear sort, while returning the identical rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_explorer_spark.operators import zorder as Z
from block_explorer_spark.sources import manifest as M


def _py_unit(v, lo, hi, bits):
    top = (1 << bits) - 1
    span = float(hi) - float(lo)
    if not (span > 0):
        return 0
    u = int(((float(v) - float(lo)) * top) / span // 1)
    return max(0, min(top, u))


def _py_z(vals, bounds, bits):
    units = [_py_unit(v, *b, bits) for v, b in zip(vals, bounds)]
    z = 0
    for b in range(bits):
        for i, u in enumerate(units):
            z |= ((u >> b) & 1) << (b * len(units) + i)
    return z


def _grid(spark, n=4096, seed=13):
    """Deterministic 2-D dataframe: a ~independent of b (the layout
    test needs both dimensions to carry information)."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).cast("long").alias("a"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(64))
        .cast("long")
        .alias("b"),
    )


class TestMortonKey:
    def test_parity_with_python_reference(self, spark):
        df = _grid(spark, n=512)
        bounds = {"a": (0.0, 63.0), "b": (0.0, 63.0)}
        got = {
            r["id"]: r["z"]
            for r in df.select(
                "id", Z.zvalue(["a", "b"], bounds, bits=6).alias("z")
            ).collect()
        }
        for r in df.collect():
            want = _py_z([r["a"], r["b"]], [bounds["a"], bounds["b"]], 6)
            assert got[r["id"]] == want, (r["a"], r["b"])

    def test_null_maps_low_and_bits_cap(self, spark):
        df = spark.createDataFrame([(None, 5)], "a long, b long")
        z = df.select(
            Z.zvalue(["a", "b"], {"a": (0.0, 7.0), "b": (0.0, 7.0)}, 3).alias("z")
        ).collect()[0]["z"]
        assert z == _py_z([0, 5], [(0.0, 7.0), (0.0, 7.0)], 3)
        try:
            Z.zvalue(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)
            raise AssertionError("expected bits*cols cap")
        except ValueError:
            pass

    def test_constant_column_degrades_gracefully(self, spark):
        df = spark.createDataFrame([(3, 9)], "a long, b long")
        z = df.select(
            Z.zvalue(["a", "b"], {"a": (3.0, 3.0), "b": (0.0, 15.0)}, 4).alias("z")
        ).collect()[0]["z"]
        assert z == _py_z([0, 9], [(0.0, 0.0), (0.0, 15.0)], 4)


class TestClusterReadWrite:
    def test_round_trip_box_equals_plain_filter(self, spark, tmp_path):
        base = str(tmp_path / "zstore")
        df = _grid(spark)
        Z.cluster_write(df, base, "grid", ["a", "b"], bits=6, num_files=16)
        got = sorted(
            r["id"]
            for r in Z.read_clustered(
                spark, base, "grid", {"a": (10, 20), "b": (30, 40)}
            ).collect()
        )
        want = sorted(
            r["id"]
            for r in df.filter(
                (F.col("a") >= 10) & (F.col("a") <= 20)
                & (F.col("b") >= 30) & (F.col("b") <= 40)
            ).collect()
        )
        assert got == want and len(want) > 0

    def test_nulls_survive_pruned_reads(self, spark, tmp_path):
        base = str(tmp_path / "znull")
        df = spark.createDataFrame(
            [(1, None, 5), (2, 10, None), (3, 10, 5)], "id long, a long, b long"
        )
        Z.cluster_write(df, base, "t", ["a", "b"], bits=4, num_files=2)
        full = Z.read_clustered(spark, base, "t", {}).collect()
        assert len(full) == 3  # no predicate: nothing dropped, nulls intact
        hit = Z.read_clustered(spark, base, "t", {"a": (10, 10), "b": (5, 5)})
        assert [r["id"] for r in hit.collect()] == [3]

    def test_empty_box_returns_empty_with_schema(self, spark, tmp_path):
        base = str(tmp_path / "zempty")
        Z.cluster_write(_grid(spark, n=256), base, "g", ["a", "b"], bits=6,
                        num_files=4)
        out = Z.read_clustered(spark, base, "g", {"a": (1000, 2000)})
        assert out.columns == ["id", "a", "b"]
        assert out.count() == 0

    def test_commit_is_full_family_replace_with_stats(self, spark, tmp_path):
        base = str(tmp_path / "zswap")
        Z.cluster_write(_grid(spark, n=256), base, "g", ["a", "b"], bits=6,
                        num_files=4)
        v1 = M.read(base)
        Z.cluster_write(_grid(spark, n=256, seed=99), base, "g", ["a", "b"],
                        bits=6, num_files=4)
        v2 = M.read(base)
        assert v2["version"] == v1["version"] + 1
        assert set(v2["families"]["g"]).isdisjoint(v1["families"]["g"])
        for rel in v2["families"]["g"]:
            assert "a" in v2["stats"][rel] and "b" in v2["stats"][rel]
        assert v2["meta"]["zorder"]["g"]["cols"] == ["a", "b"]


class TestSkippingPower:
    def test_zorder_prunes_every_dim_linear_prunes_one(self, spark, tmp_path):
        """The claim itself (and its honest shape): same data, same 16
        files. A linear sort by `a` prunes deepest on `a` but gives
        ZERO skipping on `b` — every file's b-zone spans the domain.
        The z-ordered layout prunes on BOTH dims (≤ half the files for
        a 1/8-wide predicate on either column), which is the trade: a
        little single-column depth for skipping on every clustered
        column. Answers are layout-independent."""
        df = _grid(spark)

        zb = str(tmp_path / "z")
        Z.cluster_write(df, zb, "g", ["a", "b"], bits=6, num_files=16)

        lb = str(tmp_path / "lin")
        with M.write_intent(lb):
            rels = M.stage_df(
                df.repartitionByRange(16, "a").sortWithinPartitions("a"), lb, "g"
            )
            M.commit(lb, {"g": rels}, 0, stats=M.file_stats(lb, rels, ["a", "b"]))

        b_only = {"b": (48, 55)}
        zb_keep, z_total = Z.pruned_files(zb, "g", b_only)
        lb_keep, l_total = Z.pruned_files(lb, "g", b_only)
        assert z_total == l_total == 16
        assert len(lb_keep) == 16  # linear layout: b prunes nothing
        assert len(zb_keep) <= 8, len(zb_keep)

        a_only = {"a": (8, 15)}
        za_keep, _ = Z.pruned_files(zb, "g", a_only)
        assert len(za_keep) <= 8, len(za_keep)  # z still prunes on a too

        box = {"a": (8, 15), "b": (48, 55)}
        zbox_keep, _ = Z.pruned_files(zb, "g", box)
        assert len(zbox_keep) <= len(zb_keep) and len(zbox_keep) <= len(za_keep)
        # and pruning changed nothing about the answer
        zr = sorted(r["id"] for r in
                    Z.read_clustered(spark, zb, "g", box).collect())
        lr = sorted(r["id"] for r in
                    Z.read_clustered(spark, lb, "g", box).collect())
        assert zr == lr and zr


class TestIncrementalMaintenance:
    def _store(self, spark, tmp_path):
        base = str(tmp_path / "zinc")
        Z.cluster_write(_grid(spark), base, "g", ["a", "b"], bits=6,
                        num_files=16)
        return base

    def test_append_keeps_answers_correct_and_tracks_tail(
        self, spark, tmp_path
    ):
        base = self._store(spark, tmp_path)
        extra = _grid(spark, n=512, seed=77).withColumn(
            "id", F.col("id") + 1_000_000
        )
        Z.cluster_append(extra, base, "g", num_files=2)
        m = M.read(base)
        assert len(m["meta"]["zorder"]["g"]["tail"]) == 2
        box = {"a": (8, 15), "b": (48, 55)}
        got = sorted(
            r["id"] for r in Z.read_clustered(spark, base, "g", box).collect()
        )
        want = sorted(
            r["id"]
            for r in _grid(spark).union(extra)
            .filter((F.col("a") >= 8) & (F.col("a") <= 15)
                    & (F.col("b") >= 48) & (F.col("b") <= 55))
            .collect()
        )
        assert got == want and want

    def test_append_requires_layout(self, spark, tmp_path):
        base = str(tmp_path / "zempty2")
        try:
            Z.cluster_append(_grid(spark, 64), base, "g")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_maintain_noop_below_threshold_then_folds_tail(
        self, spark, tmp_path
    ):
        base = self._store(spark, tmp_path)
        for s in range(4):
            Z.cluster_append(
                _grid(spark, n=256, seed=100 + s).withColumn(
                    "id", F.col("id") + (s + 1) * 1_000_000
                ),
                base, "g", num_files=2,
            )
        assert Z.cluster_maintain(spark, base, "g", min_tail_files=9) is None
        m0 = M.read(base)
        assert len(m0["meta"]["zorder"]["g"]["tail"]) == 8

        box = {"a": (8, 15), "b": (48, 55)}
        keep_before, total_before = Z.pruned_files(base, "g", box)
        want = sorted(
            r["id"] for r in Z.read_clustered(spark, base, "g", box).collect()
        )

        v = Z.cluster_maintain(spark, base, "g", min_tail_files=8)
        assert v is not None
        m1 = M.read(base)
        assert m1["meta"]["zorder"]["g"]["tail"] == []
        # tail folded: fewer live files, all with zone stats
        assert len(m1["families"]["g"]) < len(m0["families"]["g"])
        for rel in m1["families"]["g"]:
            assert "a" in m1["stats"][rel], rel
        # answers unchanged, pruning at least as tight
        got = sorted(
            r["id"] for r in Z.read_clustered(spark, base, "g", box).collect()
        )
        assert got == want
        keep_after, total_after = Z.pruned_files(base, "g", box)
        assert len(keep_after) <= len(keep_before)
        # old tail files are no longer listed (snapshot isolation:
        # still on disk until vacuum)
        assert not set(m0["meta"]["zorder"]["g"]["tail"]) & set(m1["families"]["g"])


class TestStreamingIngest:
    def test_readstream_foreachbatch_append_then_maintain(
        self, spark, tmp_path
    ):
        """The ingest story end-to-end: micro-batches arrive through
        Structured Streaming, foreachBatch lands each with
        cluster_append (zones recorded, no re-layout), and one
        OPTIMIZE pass folds the tail — the final clustered read
        equals the union of everything streamed."""
        src = str(tmp_path / "src")
        base = str(tmp_path / "zstream")
        Z.cluster_write(_grid(spark, n=512), base, "g", ["a", "b"],
                        bits=6, num_files=4)

        batches = [
            _grid(spark, n=128, seed=200 + i).withColumn(
                "id", F.col("id") + (i + 1) * 10_000
            )
            for i in range(3)
        ]
        for i, bdf in enumerate(batches):
            bdf.coalesce(1).write.parquet(f"{src}/b{i}")

        stream = (
            spark.readStream.schema(batches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, _id: Z.cluster_append(bdf, base, "g", num_files=1)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        m = M.read(base)
        assert len(m["meta"]["zorder"]["g"]["tail"]) == 3
        assert Z.cluster_maintain(spark, base, "g", min_tail_files=3) is not None
        assert M.read(base)["meta"]["zorder"]["g"]["tail"] == []

        want = _grid(spark, n=512)
        for bdf in batches:
            want = want.union(bdf)
        got = sorted(r["id"] for r in Z.read_clustered(spark, base, "g", {}).collect())
        assert got == sorted(r["id"] for r in want.collect())
