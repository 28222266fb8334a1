"""Driver-checkable multimodal queries: the opaque-binary column pipeline
exercised end to end on real fixture data.

The container has no image/audio codecs, so the fixture media table is
synthesized from ``documents`` — payload = UTF-8 bytes of the text, typed
metadata derived from it — which makes the *plumbing* (binary parquet
columns, metadata-only pruning, Arrow-batched mapInPandas decode, frame
explosion) fully real and, for the digest/metadata/fake-feature paths,
exactly recomputable by the DuckDB oracle (md5/sha256 agree byte-for-byte
on the same payload bytes).

Scale note: the metadata query never touches payload bytes beyond the
digest column — with payloads in their own parquet column, filters on
``meta.*``/size prune entire blob pages (column pruning is the whole game
for multi-MB media rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.multimodal.binary_ops import (
    attach_media_metadata,
    decode_image_features,
    sample_video_frames,
)
from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.sources.catalog import load_table

__all__ = [
    "media_from_documents",
    "multimodal_metadata",
    "multimodal_image_features",
    "multimodal_frame_sample",
]


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media rows: payload = encode(text, UTF-8), typed meta
    struct. Every 3rd doc plays a "video" (duration from n_chars) so the
    frame-sampling explosion path sees real work."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    is_video = F.col("doc_id") % 3 == 0
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(is_video, F.lit("video/mp4")).otherwise(F.lit("image/png")).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.when(is_video, (F.col("n_chars") % 5 + 1) * 1000)
            .otherwise(F.lit(None).cast("long"))
            .alias("duration_ms"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free metadata pass: size + sha256 digest + mime, pure
    expressions over the binary column."""
    media = media_from_documents(spark, sf_dir)
    return attach_media_metadata(media).select(
        "media_id", F.col("meta.mime").alias("mime"), "payload_bytes", "payload_sha256"
    )


MULTIMODAL_METADATA_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'video/mp4' ELSE 'image/png' END AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       sha256(text) AS payload_sha256
FROM documents
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas "decode": deterministic md5-derived fake
    features (the stubbed codec kernel), real distributed plumbing. The
    8-dim feature vector is indexed into scalar f1..f8 columns at the
    contract boundary (array-typed outputs crash the driver's pandas
    canonicalizer; the array form stays available via decode_image_features)."""
    media = media_from_documents(spark, sf_dir)
    feats = decode_image_features(media)
    return feats.select(
        "media_id",
        *[F.round(F.col("feature")[i], 6).alias(f"f{i + 1}") for i in range(8)],
    )


# byte i of md5(payload), via hex-pair parsing, scaled to [0, 1] — matches
# _fake_image_features (md5 of the same UTF-8 bytes) exactly.
_FEATURE_BYTE_SQL = """ROUND(
    (CAST(strpos('0123456789abcdef', substr(md5(text), {hi}, 1)) - 1 AS DOUBLE) * 16
     + CAST(strpos('0123456789abcdef', substr(md5(text), {lo}, 1)) - 1 AS DOUBLE))
    / 255.0, 6) AS f{i}"""

MULTIMODAL_IMAGE_FEATURES_ORACLE = (
    "SELECT doc_id AS media_id,\n"
    + ",\n".join(
        _FEATURE_BYTE_SQL.format(i=i, hi=2 * i - 1, lo=2 * i) for i in range(1, 9)
    )
    + "\nFROM documents"
)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the "video" subset: one row per sampled timestamp
    (row-explosion inside mapInPandas). Frame count per video is
    duration-derived and oracle-checkable; the digest is rows-only territory
    (binary ts concatenation), so the query exposes counts."""
    media = media_from_documents(spark, sf_dir).filter(F.col("meta.mime") == "video/mp4")
    frames = sample_video_frames(media, every_ms=1000)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("frame_digest").alias("n_distinct_frames"),
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
SELECT doc_id AS media_id,
       CAST(n_chars % 5 + 1 AS BIGINT) AS n_frames,
       CAST(n_chars % 5 + 1 AS BIGINT) AS n_distinct_frames
FROM documents WHERE doc_id % 3 = 0
"""
