"""Schema/projection/null parity with the reference's e2e tests
(reference tests/e2e.rs — the three collections and their assertions;
FIXTURES.md maps them to our fixtures)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from qdrant_datafusion_spark import fixtures


class TestSimple:
    """Reference tests/e2e.rs:48-107 (coverage smoke, 1 point, dim 2)."""

    def test_select_star(self, spark):
        df = fixtures.simple_df(spark)
        rows = df.collect()
        assert [f.name for f in df.schema.fields] == ["id", "payload", "vector"]
        assert len(rows) == 1
        assert rows[0].id == "1"
        assert json.loads(rows[0].payload) == {"title": "Test Point"}
        assert [round(x, 6) for x in rows[0].vector] == [0.1, 0.2]


class TestHeterogeneous:
    """Reference tests/e2e.rs:111-332: schema union, projection combos,
    NULL placement for absent vector fields."""

    def test_select_star_schema_union(self, spark):
        df = fixtures.hetero_df(spark)
        assert [f.name for f in df.schema.fields] == [
            "id", "payload", "test_embedding", "text_embedding",
            "image_embedding", "audio_embedding", "multi_embeddings",
            "keywords_indices", "keywords_values",
        ]
        assert df.count() == 3

    def test_projection_combinations(self, spark):
        df = fixtures.hetero_df(spark)
        # single column (e2e.rs:252-258)
        assert df.select("test_embedding").columns == ["test_embedding"]
        # sparse-only pair (e2e.rs: sparse projection combo)
        pair = df.select("keywords_indices", "keywords_values")
        assert pair.columns == ["keywords_indices", "keywords_values"]
        assert pair.count() == 3
        # metadata-only
        meta = df.select("id", "payload")
        assert meta.columns == ["id", "payload"]
        # mixed + reordered (e2e.rs:437-447 pattern)
        mixed = df.select("payload", "multi_embeddings", "id")
        assert mixed.columns == ["payload", "multi_embeddings", "id"]

    def test_null_placement(self, spark):
        """audio_embedding non-null only for id 3 (e2e.rs:311-320);
        each point carries its declared subset."""
        df = fixtures.hetero_df(spark)
        by_id = {r.id: r for r in df.collect()}
        assert by_id["1"].audio_embedding is None
        assert by_id["2"].audio_embedding is None
        assert [round(x, 6) for x in by_id["3"].audio_embedding] == [0.14, 0.15]
        assert by_id["1"].test_embedding is not None
        assert by_id["2"].test_embedding is None
        assert by_id["3"].test_embedding is None
        assert by_id["1"].multi_embeddings is not None
        assert by_id["2"].multi_embeddings is None

    def test_multi_vector_shape(self, spark):
        """2x2 multi-vector for point 1 (e2e.rs:172-175)."""
        df = fixtures.hetero_df(spark)
        row = df.filter(F.col("id") == "1").collect()[0]
        mv = [[round(x, 6) for x in sub] for sub in row.multi_embeddings]
        assert mv == [[0.7, 0.8], [0.9, 0.1]]

    def test_sparse_pair_convention(self, spark):
        """Sparse = two sibling columns; indices widened to long
        (reference src/arrow/schema.rs:93-106)."""
        df = fixtures.hetero_df(spark)
        schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert schema["keywords_indices"] == "array<bigint>"
        assert schema["keywords_values"] == "array<float>"


class TestUnnamed:
    """Reference tests/e2e.rs:335-479 (unnamed homogeneous, dim 3)."""

    def test_select_star(self, spark):
        df = fixtures.unnamed_df(spark)
        assert df.columns == ["id", "payload", "vector"]
        assert df.count() == 3

    def test_projection_reordered(self, spark):
        df = fixtures.unnamed_df(spark)
        assert df.select("payload", "vector", "id").columns == [
            "payload", "vector", "id",
        ]

    def test_limit(self, spark):
        """LIMIT pushdown shape (e2e.rs:460-467)."""
        assert fixtures.unnamed_df(spark).limit(2).count() == 2


class TestCollectionRoundtrip:
    """Write path (the reference left insert_into as todo!() at
    src/table.rs:186-193 — ours must actually work) + descriptor
    round-trip + metric lookup."""

    def test_write_load_register(self, spark, tmp_path):
        from qdrant_datafusion_spark.collections import CollectionCatalog

        cat = CollectionCatalog(spark, str(tmp_path))
        df = fixtures.hetero_df(spark)
        cat.write(fixtures.HETERO, df)
        back = cat.load("hetero")
        assert sorted(back.columns) == sorted(df.columns)
        assert back.count() == 3
        cat.register("hetero")
        assert spark.sql("SELECT count(*) AS n FROM hetero").collect()[0].n == 3
        # append (INSERT INTO)
        cat.insert_into("hetero", df)
        assert cat.load("hetero").count() == 6

    def test_descriptor_roundtrip_and_metric(self):
        from qdrant_datafusion_spark.collections import CollectionDescriptor

        d = CollectionDescriptor.from_json(fixtures.HETERO.to_json())
        assert d == fixtures.HETERO
        assert d.metric_for("image_embedding") == "dot"
        assert d.metric_for("audio_embedding") == "euclid"
        assert d.metric_for("keywords_values") == "dot"

    def test_schema_derivation_matches_reference_convention(self):
        schema = fixtures.HETERO.schema()
        assert schema.fields[0].name == "id" and not schema.fields[0].nullable
        assert schema.fields[1].name == "payload" and schema.fields[1].nullable
        assert all(f.nullable for f in schema.fields[2:])


class TestCompaction:
    def test_compact_merges_fragments_preserving_rows(self, spark, tmp_path):
        import glob
        import os

        from qdrant_datafusion_spark import fixtures
        from qdrant_datafusion_spark.collections import CollectionCatalog

        cat = CollectionCatalog(spark, str(tmp_path))
        cat.write(fixtures.UNNAMED, fixtures.unnamed_df(spark), partitions=4)
        cat.insert_into("unnamed", fixtures.unnamed_df(spark))  # more fragments
        path = str(tmp_path / "unnamed")
        before_frags = len(glob.glob(os.path.join(path, "*.parquet")))
        before = sorted(
            (r.id, tuple(round(x, 6) for x in r.vector))
            for r in cat.load("unnamed").collect()
        )
        assert before_frags > 2
        n = cat.compact("unnamed", target_fragments=2)
        assert n == 2
        assert len(glob.glob(os.path.join(path, "*.parquet"))) == 2
        after = sorted(
            (r.id, tuple(round(x, 6) for x in r.vector))
            for r in cat.load("unnamed").collect()
        )
        assert after == before  # lossless rewrite
        assert cat.descriptor("unnamed").name == "unnamed"  # descriptor kept

    def test_compact_default_sizes_from_bytes(self, spark, tmp_path):
        from qdrant_datafusion_spark import fixtures
        from qdrant_datafusion_spark.collections import CollectionCatalog

        cat = CollectionCatalog(spark, str(tmp_path))
        cat.write(fixtures.UNNAMED, fixtures.unnamed_df(spark), partitions=3)
        # tiny collection -> one 128MB-target fragment
        assert cat.compact("unnamed") == 1


class TestCollectionMutations:
    """delete_where / update_payload — the table-side analogues of the
    point-delete and set-payload APIs the reference's read-only table
    can't express (its write path is todo!(), src/table.rs:186-193)."""

    def _cat(self, spark, tmp_path):
        from qdrant_datafusion_spark import fixtures
        from qdrant_datafusion_spark.collections import CollectionCatalog

        cat = CollectionCatalog(spark, str(tmp_path))
        cat.write(fixtures.UNNAMED, fixtures.unnamed_df(spark), partitions=2)
        return cat

    def test_delete_where_removes_only_matches(self, spark, tmp_path):
        cat = self._cat(spark, tmp_path)
        before = {r.id for r in cat.load("unnamed").collect()}
        victim = sorted(before)[0]
        n = cat.delete_where("unnamed", f"id = '{victim}'")
        assert n == 1
        after = {r.id for r in cat.load("unnamed").collect()}
        assert after == before - {victim}
        assert cat.descriptor("unnamed").name == "unnamed"  # descriptor kept

    def test_delete_where_null_predicate_rows_survive(self, spark, tmp_path):
        # SQL DELETE semantics: only predicate=TRUE rows go; NULL stays
        cat = self._cat(spark, tmp_path)
        total = cat.load("unnamed").count()
        n = cat.delete_where("unnamed", "get_json_object(payload, '$.nope') = 'x'")
        assert n == 0 and cat.load("unnamed").count() == total

    def test_update_payload_merges_typed_values(self, spark, tmp_path):
        import json

        cat = self._cat(spark, tmp_path)
        ids = sorted(r.id for r in cat.load("unnamed").collect())
        target = ids[0]
        n = cat.update_payload(
            "unnamed", f"id = '{target}'", {"boosted": True, "rank": 3}
        )
        assert n == 1
        rows = {r.id: r.payload for r in cat.load("unnamed").collect()}
        patched = json.loads(rows[target])
        assert patched["boosted"] is True and patched["rank"] == 3  # typed
        for other in ids[1:]:
            other_payload = rows[other]
            assert other_payload is None or "boosted" not in json.loads(other_payload)
