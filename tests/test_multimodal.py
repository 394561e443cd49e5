"""Multimodal plumbing tests: schema, determinism, batch shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from qdrant_datafusion_spark.operators.multimodal import (
    attach_media,
    decode_image_features,
    media_stats,
    sample_video_frames,
)


def _media_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    with_bytes = docs.select(
        F.col("doc_id").alias("id"), F.encode("text", "UTF-8").alias("blob")
    )
    return attach_media(with_bytes, "blob", "image/fake")


class TestMultimodal:
    def test_attach_and_stats(self, spark, sf_dir):
        df = _media_df(spark, sf_dir)
        assert df.schema["media"].dataType.simpleString().startswith("struct<bytes:binary")
        stats = media_stats(df).collect()[0]
        assert stats.n == 20 and stats.total_bytes > 0 and stats.n_mime_types == 1

    def test_decode_features_deterministic(self, spark, sf_dir):
        df = _media_df(spark, sf_dir)
        a = {r.id: r.features for r in decode_image_features(df, dim=16).collect()}
        b = {r.id: r.features for r in decode_image_features(df, dim=16).collect()}
        assert a == b  # stub decode is content-deterministic
        assert all(len(v) == 16 for v in a.values())

    def test_video_frame_sampling(self, spark, sf_dir):
        df = _media_df(spark, sf_dir)
        frames = sample_video_frames(df, n_frames=3).collect()
        assert len(frames) == 60  # 20 docs x 3 frames
        per_doc = {}
        for r in frames:
            per_doc.setdefault(r.id, []).append(r.frame_idx)
        assert all(sorted(v) == [0, 1, 2] for v in per_doc.values())


class TestResize:
    def test_resize_rewrites_metadata_and_composes(self, spark, sf_dir):
        from qdrant_datafusion_spark.operators.multimodal import resize_images

        df = _media_df(spark, sf_dir)
        resized = resize_images(df, width=64, height=32)
        rows = resized.collect()
        assert len(rows) == 20
        assert all(r.media.width == 64 and r.media.height == 32 for r in rows)
        assert all(len(r.media.bytes) == 64 * 32 // 64 for r in rows)
        # deterministic: same input -> same stub bytes
        again = {r.id: bytes(r.media.bytes) for r in resize_images(df, width=64, height=32).collect()}
        assert all(bytes(r.media.bytes) == again[r.id] for r in rows)
        # composes with downstream media operators (same struct schema)
        stats = media_stats(resized).collect()[0]
        assert stats.n == 20
