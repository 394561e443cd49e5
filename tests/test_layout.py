"""Unit tests for operators/layout.py — Z-order layout + footer-prune model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.layout import (
    file_minmax,
    files_touched,
    layout_files,
    z_value,
    zorder_key,
    zorder_layout,
)


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestZValue:
    def test_matches_python_reference(self, spark):
        pts = [(x, y) for x in range(9) for y in range(9)] + [(255, 255), (200, 13)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = df.withColumn(
            "z", z_value([F.col("x"), F.col("y")], 8)
        ).collect()
        for r in got:
            assert r["z"] == _morton(r["x"], r["y"], 8), (r["x"], r["y"])

    def test_clamps_out_of_range(self, spark):
        df = spark.createDataFrame([(-5, 300)], "x long, y long")
        z = df.select(z_value([F.col("x"), F.col("y")], 8).alias("z")).collect()[0]["z"]
        assert z == _morton(0, 255, 8)

    def test_rejects_bit_overflow(self):
        with pytest.raises(ValueError):
            z_value([F.lit(1), F.lit(1)], 32)


class TestZorderKey:
    def test_minmax_scaling_hits_bounds(self, spark):
        df = spark.createDataFrame(
            [(1000, 7), (2000, 7), (3000, 7)], "x long, y long"
        )
        rows = {r["x"]: r["z"] for r in zorder_key(df, ["x", "y"], bits=8).collect()}
        # y is constant -> scales to 0, drops out; x spans [0,255]
        assert rows[1000] == _morton(0, 0, 8)
        assert rows[2000] == _morton(127, 0, 8)  # (1000*255) div 2000
        assert rows[3000] == _morton(255, 0, 8)

    def test_equalizes_unequal_entropy(self, spark):
        # x spans 0..4095 (12 bits), y spans 0..3 (2 bits): raw interleave
        # would order by x's unpaired high bits; normalized z must still
        # split on y at the top level (y's high bit lands at position 15)
        pts = [(x * 512, y) for x in range(8) for y in range(4)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r["x"], r["y"]): r["z"] for r in zorder_key(df, ["x", "y"]).collect()}
        # y=3 scales to 255: its top bit outranks any x high bit alone
        assert got[(0, 3)] > got[(7 * 512, 0)]


class TestLayoutFiles:
    def test_partitions_are_disjoint_z_ranges(self, spark):
        pts = [(i % 97, (i * 31) % 89) for i in range(2000)]
        df = spark.createDataFrame(pts, "x long, y long")
        laid = zorder_layout(df, ["x", "y"], n_files=8)
        ranges = (
            laid.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(ranges) >= 2  # range partitioner actually split
        for a, b in zip(ranges, ranges[1:]):
            assert a["hi"] <= b["lo"]

    def test_ntile_files_equal_count(self, spark):
        df = spark.createDataFrame([(i,) for i in range(64)], "x long")
        files = layout_files(df, [F.col("x")], 8)
        counts = files.groupBy("file_id").count().collect()
        assert sorted(r["count"] for r in counts) == [8] * 8


class TestPruneModel:
    def test_zorder_touches_fewer_files_than_row_order(self, spark):
        # uniform 64x64 grid in hash-scrambled arrival order
        pts = sorted(
            ((x, y) for x in range(64) for y in range(64)),
            key=lambda p: hash(p),
        )
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
        )
        zdf = zorder_key(df, ["x", "y"], bits=8)
        box = {
            "x": (F.lit(16), F.lit(31)),
            "y": (F.lit(16), F.lit(31)),
        }

        def touched(order):
            mm = file_minmax(layout_files(zdf, order, 64), "file_id", ["x", "y"])
            return mm.where(files_touched(mm, box)).count()

        t_z = touched([F.col("z"), F.col("id")])
        t_nat = touched([F.col("id")])
        assert t_z < t_nat
        assert t_z <= 8  # box is 1/16 of the area; curve overhead bounded


def _xy2d(n: int, x: int, y: int) -> int:
    """Canonical per-bit Hilbert walk (full-grid reflection)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbert:
    def test_matches_python_reference(self, spark):
        from qdrant_datafusion_spark.operators.layout import hilbert_value

        pts = [(x, y) for x in range(9) for y in range(9)]
        pts += [(255, 255), (200, 13), (0, 255), (255, 0)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = df.withColumn(
            "h", hilbert_value(F.col("x"), F.col("y"), 8)
        ).collect()
        for r in got:
            assert r["h"] == _xy2d(256, r["x"], r["y"]), (r["x"], r["y"])

    def test_bijection_and_unit_steps(self, spark):
        from qdrant_datafusion_spark.operators.layout import hilbert_value

        n = 16
        df = spark.createDataFrame(
            [(x, y) for x in range(n) for y in range(n)], "x long, y long"
        )
        inv = {
            r["h"]: (r["x"], r["y"])
            for r in df.withColumn(
                "h", hilbert_value(F.col("x"), F.col("y"), 4)
            ).collect()
        }
        assert sorted(inv) == list(range(n * n))
        for i in range(n * n - 1):
            (x0, y0), (x1, y1) = inv[i], inv[i + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1  # Hilbert: no jumps

    def test_rejects_bit_overflow_and_wrong_arity(self, spark):
        from qdrant_datafusion_spark.operators.layout import (
            hilbert_key,
            hilbert_value,
        )

        with pytest.raises(ValueError):
            hilbert_value(F.lit(1), F.lit(1), 32)
        df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
        with pytest.raises(ValueError):
            hilbert_key(df, ["a", "b", "c"])

    def test_prunes_at_least_as_well_as_zorder_on_uniform_grid(self, spark):
        from qdrant_datafusion_spark.operators.layout import hilbert_key

        pts = sorted(
            ((x, y) for x in range(64) for y in range(64)),
            key=lambda p: hash(p),
        )
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
        )
        both = hilbert_key(zorder_key(df, ["x", "y"], bits=8), ["x", "y"], bits=8)
        box = {"x": (F.lit(16), F.lit(31)), "y": (F.lit(16), F.lit(31))}

        def touched(order):
            mm = file_minmax(layout_files(both, order, 64), "file_id", ["x", "y"])
            return mm.where(files_touched(mm, box)).count()

        t_h = touched([F.col("h"), F.col("id")])
        t_z = touched([F.col("z"), F.col("id")])
        assert t_h <= t_z


class TestCompactionPlan:
    def _plan(self, spark, rows, target):
        from qdrant_datafusion_spark.operators.layout import compaction_plan

        df = spark.createDataFrame(rows, "k string, payload string")
        return {
            r.k: (r.n_rows, r.bytes, r.bin)
            for r in compaction_plan(
                df, "k", F.octet_length("payload"), target
            ).collect()
        }

    def test_first_fit_bins(self, spark):
        # sizes in key order: a=4, b=4, c=4, d=4; target 8 -> bins 0,0,1,1
        rows = [(k, "xxxx") for k in "abcd"]
        got = self._plan(spark, rows, 8)
        assert got == {
            "a": (1, 4, 0), "b": (1, 4, 0), "c": (1, 4, 1), "d": (1, 4, 1),
        }

    def test_oversized_unit_gets_own_bins(self, spark):
        # a single unit larger than target still lands in one bin (units
        # are atomic); the NEXT unit starts past it
        rows = [("a", "x" * 20), ("b", "yy"), ("c", "zz")]
        got = self._plan(spark, rows, 8)
        assert got["a"] == (1, 20, 0)
        assert got["b"] == (1, 2, 2)   # cum 20 -> bin 2
        assert got["c"] == (1, 2, 2)   # cum 22 -> bin 2

    def test_multirow_units_aggregate(self, spark):
        rows = [("a", "xx"), ("a", "yyy"), ("b", "z")]
        got = self._plan(spark, rows, 100)
        assert got == {"a": (2, 5, 0), "b": (1, 1, 0)}

    def test_rejects_bad_target(self, spark):
        from qdrant_datafusion_spark.operators.layout import compaction_plan

        df = spark.createDataFrame([("a", "x")], "k string, payload string")
        with pytest.raises(ValueError):
            compaction_plan(df, "k", F.octet_length("payload"), 0)
