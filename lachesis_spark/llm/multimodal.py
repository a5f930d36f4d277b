"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Beyond-reference surface for a pretraining-data pipeline: media payloads
travel as ``binary`` columns with a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages.  The real codec libraries (PIL/ffmpeg/librosa) are
not in this container, so the byte→pixels step is STUBBED behind
``_decode_stub`` (clearly marked, deterministic); everything Spark-side —
schema, partitioning, UDF signatures, batch iteration — is real and tested,
and swapping the stub for a real decoder changes no plan shape.

Scale: payloads never leave the executors and never pass through the driver;
mapInPandas streams Arrow batches, so a 100 TB media corpus is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload size per
task, not by row count.  Metadata-only queries (mm_meta_stats) prune the
payload column out of the parquet scan entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_SCHEMA),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (text bytes as
    payload, metadata from the doc id) — engine-side only, no Python."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.lit(64) + (F.col("doc_id") % 3) * 32).cast("int").alias("width"),
        (F.lit(48) + (F.col("doc_id") % 5) * 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.lit(8) + (F.col("doc_id") % 7)).cast("int").alias("n_frames"),
        F.lit("raw").alias("format"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode stub — the ONLY fake piece.  Replace with PIL/ffmpeg when available.
def _decode_stub(payload: bytes, width: int, height: int):
    """STUB decoder: deterministic fake pixel array from the payload bytes
    (tiled), shaped (height, width, 3) uint8.  NOT a real image decode —
    the container has no codec libraries; a real implementation would be
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``."""
    import numpy as np

    need = width * height * 3
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-need // buf.size)  # ceil
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("aspect", T.DoubleType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction over Arrow batches."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                m = r.meta
                arr = _decode_stub(bytes(r.payload), int(m["width"]), int(m["height"]))
                out.append(
                    (
                        r.media_id,
                        float(arr.mean()),
                        float(arr.std()),
                        float(m["width"]) / float(m["height"]),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "mean_px", "std_px", "aspect"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on the (stub-)decoded array; emits a new
    payload + updated meta.  Plan shape identical to a real resize."""

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                m = r.meta
                w, h = int(m["width"]), int(m["height"])
                arr = _decode_stub(bytes(r.payload), w, h)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = arr[yi][:, xi]
                rows.append(
                    (
                        r.media_id,
                        r.kind,
                        resized.tobytes(),
                        {
                            "width": out_w,
                            "height": out_h,
                            "sample_rate": int(m["sample_rate"]),
                            "n_frames": int(m["n_frames"]),
                            "format": "raw",
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame index.  The frame
    index fan-out is pure Catalyst (explode of a sequence — no Python); only
    a real frame *decode* would touch the payload."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
        F.octet_length("payload").alias("payload_bytes"),
    )


# ---------------------------------------------------------------------------
# Registry queries
def mm_meta_stats(spark, sf_dir):
    """Metadata-only audit: per kind, payload volume + shape stats.  Never
    touches payload *contents* — the scan prunes to lengths + meta."""
    media = media_from_documents(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.height").alias("avg_height"),
        F.sum("meta.n_frames").alias("total_frames"),
    )


MM_META_STATS_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       count(*) AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       avg(64 + (doc_id % 3) * 32) AS avg_width,
       avg(48 + (doc_id % 5) * 16) AS avg_height,
       CAST(sum(8 + (doc_id % 7)) AS BIGINT) AS total_frames
FROM documents GROUP BY 1
"""


def mm_frame_index(spark, sf_dir):
    """Frame-sampling fan-out (every 2nd frame) — SQL-expressible because
    the fan-out itself is engine-side."""
    return sample_frames(media_from_documents(spark, sf_dir), every=2)


MM_FRAME_INDEX_SQL = """
SELECT doc_id AS media_id,
       CAST(unnest(range(0, 8 + (doc_id % 7), 2)) AS INTEGER) AS frame_idx,
       CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes
FROM documents WHERE doc_id % 3 = 2
"""


def mm_features(spark, sf_dir):
    """Stub-decoded image features (Python path — rows-only driver check;
    the decode is a deterministic fake, see _decode_stub)."""
    return extract_features(media_from_documents(spark, sf_dir))


QUERIES = {
    "mm_meta_stats": mm_meta_stats,
    "mm_frame_index": mm_frame_index,
    "mm_features": mm_features,
}

# mm_features intentionally has no oracle: its values come from the Python
# decode stub (not SQL-expressible); the driver records a rows-only check.
ORACLE = {
    "mm_meta_stats": MM_META_STATS_SQL,
    "mm_frame_index": MM_FRAME_INDEX_SQL,
}


def media_from_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files (sources.readers.read_binary_files) into the
    typed media schema: payload = file bytes, kind from the extension, meta
    defaulted for the stub decoder (a real pipeline fills meta by probing
    headers in the same mapInPandas pass as the decode)."""
    from lachesis_spark.sources.readers import read_binary_files

    raw = read_binary_files(spark, path, glob=glob)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind = (
        F.when(ext.isin("png", "jpg", "jpeg", "img"), "image")
        .when(ext.isin("wav", "mp3", "flac"), "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.lit(64).cast("int").alias("width"),
        F.lit(48).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        F.lit(8).cast("int").alias("n_frames"),
        ext.alias("format"),
    )
    return raw.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        meta.alias("meta"),
    )
