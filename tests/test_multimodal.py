"""Multimodal binary-column plumbing: schemas, batch shapes, stub decode
determinism, resize geometry, frame sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from lachesis_spark.llm import multimodal as MM
from tests.conftest import SF_SMOKE


def test_media_schema(spark):
    media = MM.media_from_documents(spark, SF_SMOKE)
    # names/types must match the declared schema (nullability may differ
    # for expression-built columns)
    assert media.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_deterministic_shape():
    a1 = MM._decode_stub(b"hello world", 8, 4)
    a2 = MM._decode_stub(b"hello world", 8, 4)
    assert a1.shape == (4, 8, 3)
    assert (a1 == a2).all()
    assert MM._decode_stub(b"", 2, 2).shape == (2, 2, 3)


def test_extract_features(spark):
    media = MM.media_from_documents(spark, SF_SMOKE)
    feats = MM.extract_features(media)
    assert feats.schema == MM.FEATURES_SCHEMA
    rows = feats.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    for r in rows[:10]:
        assert 0.0 <= r["mean_px"] <= 255.0
        assert r["aspect"] > 0


def test_resize_payload_geometry(spark):
    media = MM.media_from_documents(spark, SF_SMOKE).limit(30)
    out = MM.resize_images(media, 16, 8)
    rows = out.collect()
    assert rows, "expected at least one image in the first 30 docs"
    for r in rows:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 8
        assert len(bytes(r["payload"])) == 16 * 8 * 3


def test_sample_frames_stride(spark):
    media = MM.media_from_documents(spark, SF_SMOKE)
    frames = MM.sample_frames(media, every=2)
    per = (
        frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"),
                                       F.max("frame_idx").alias("mx"))
        .join(media.select("media_id", F.col("meta.n_frames").alias("nf")), "media_id")
        .collect()
    )
    assert per
    for r in per:
        assert r["n"] == (r["nf"] + 1) // 2  # ceil(n_frames / 2)
        assert r["mx"] < r["nf"]


def test_binary_files_feed_the_media_pipeline(spark, tmp_path):
    """End-to-end: files on disk → binaryFile source → typed media schema →
    Arrow-batched feature extraction (stub decode)."""
    from lachesis_spark.llm import multimodal as M

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.img").write_bytes(bytes(range(200)))
    (d / "b.img").write_bytes(bytes([7] * 300))
    (d / "skip.wav").write_bytes(b"RIFF....")

    media = M.media_from_binary_files(spark, str(d))
    kinds = {r.kind for r in media.select("kind").collect()}
    assert kinds == {"image", "audio"}

    feats = M.extract_features(media).collect()
    assert len(feats) == 2  # only images decode
    flat = {round(f.std_px, 3) for f in feats}
    assert 0.0 in flat  # constant-byte payload has zero variance
    assert any(s > 0 for s in flat)
