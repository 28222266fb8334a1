"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched pandas functions via ``mapInPandas``.

The Spark-side design is real and tested — schema, batch iteration,
partition sizing, UDF signatures; the COMPRESSED-format codec kernels
(PNG/JPEG/MP4) are stubs, because image/audio libraries are not in this
container. Each stub is either a clearly-marked ``NotImplementedError``
(``strict=True``) or a deterministic fake (default) so the pipeline shape
is exercisable end to end. The self-describing UNCOMPRESSED formats are
NOT stubbed: ``multimodal/codecs.py`` carries real, dependency-free
BMP (24-bit) and WAV (PCM16) encode/decode kernels, proven sample-exact
against closed-form DuckDB oracles by ``multimodal_bmp_pixel_stats`` and
``multimodal_wav_pcm_energy``.

Scale notes:
- Binary payloads ride in parquet BYTE_ARRAY columns; metadata lives in a
  sibling struct so filters (mime, width, duration) prune **without touching
  bytes** — select metadata columns only and parquet never reads the blob
  pages.
- ``mapInPandas`` streams Arrow record batches; ``maxRecordsPerBatch`` bounds
  peak memory when payloads are large (set well below the default 10k for
  multi-MB blobs).
- Decode → feature-extract is a narrow map: no shuffle, scales linearly with
  executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image_features",
    "sample_video_frames",
    "chunk_audio",
    "AUDIO_CHUNK_SCHEMA",
]

# Canonical multimodal column group: payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 8

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata that does not require decoding: size + content digest.
    Pure expressions — stays JVM-side even for binary columns. sha256 (not
    xxhash) so external engines can recompute the digest for oracle checks."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_image_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-derived pseudo-features.

    STUB — replace with (e.g.) PIL decode + pooled pixels when an imaging
    library is available. Deterministic so tests are stable.
    """
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:_FEATURE_DIM]]


def decode_image_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    ``strict=True`` raises NotImplementedError at execution time (the honest
    no-codec-in-container behavior); default uses the deterministic fake so
    the distributed plumbing is testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decoding requires an imaging library not present in "
                    "this container; plug a real decoder into _fake_image_features"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [_fake_image_features(p) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp per video.

    The row-explosion shape (input row → N frame rows) is the part that
    matters for partition sizing; frame decode itself is the stubbed kernel.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_digest", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decoding not available in container")
            out: dict[str, list] = {"media_id": [], "frame_ts_ms": [], "frame_digest": []}
            for _, row in pdf.iterrows():
                # nullable long arrives as NaN through Arrow→pandas
                duration = 0 if pd.isna(row["duration_ms"]) else row["duration_ms"]
                for ts in range(0, int(duration), every_ms):
                    out["media_id"].append(row["media_id"])
                    out["frame_ts_ms"].append(ts)
                    digest = hashlib.md5(
                        (row["payload"] or b"") + ts.to_bytes(8, "little")
                    ).hexdigest()
                    out["frame_digest"].append(digest)
            yield pd.DataFrame(out)

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(run, out_schema)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def chunk_audio(df: DataFrame, chunk_ms: int = 10_000, strict: bool = False) -> DataFrame:
    """Audio chunking: one output row per fixed-length window per clip —
    the segmentation pass an ASR / audio-embedding pipeline runs before
    per-chunk inference. The row-explosion shape and Arrow batch flow are
    the real artifact; the per-chunk RMS-loudness kernel is the stub
    (md5-derived from payload bytes + window start so external engines can
    recompute it), marked for replacement by a real PCM decode.

    The digest key is ``payload ++ b":" ++ ascii(start_ms)`` — for UTF-8
    text payloads this equals md5(text || ':' || start_ms), which is what
    the DuckDB oracle computes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decoding requires an audio library not present in "
                    "this container; plug a real PCM decoder into chunk_audio"
                )
            out: dict[str, list] = {
                "media_id": [],
                "start_ms": [],
                "end_ms": [],
                "rms": [],
            }
            for _, row in pdf.iterrows():
                duration = 0 if pd.isna(row["duration_ms"]) else int(row["duration_ms"])
                payload = row["payload"] or b""
                for start in range(0, duration, chunk_ms):
                    digest = hashlib.md5(
                        payload + b":" + str(start).encode()
                    ).digest()
                    out["media_id"].append(row["media_id"])
                    out["start_ms"].append(start)
                    out["end_ms"].append(min(start + chunk_ms, duration))
                    out["rms"].append(digest[0] / 255.0)
            yield pd.DataFrame(out)

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(run, AUDIO_CHUNK_SCHEMA)
