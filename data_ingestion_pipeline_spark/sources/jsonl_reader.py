"""Schema'd JSONL (newline-delimited JSON) source + sink.

The de-facto interchange format of training-data pipelines. Same
design rules as the CSV reader: explicit schema (no inference scan —
``spark.read.json`` without one reads EVERYTHING twice at 100 TB),
PERMISSIVE mode with a corrupt-record column so malformed lines go to a
dead-letter route instead of killing a multi-hour ingest.

Writer notes for scale: JSONL compresses poorly relative to parquet and
loses types (timestamps stringify) — it's an interchange/export format, not
a table format; ``write_jsonl`` exists for pipeline egress, ManagedTable
(parquet) remains the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_jsonl", "write_jsonl"]


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, timestamp_format: str | None = None
) -> DataFrame:
    # DROPMALFORMED, not PERMISSIVE + a _corrupt_record filter: filtering
    # on the corrupt column poisons any downstream query that references
    # no data column (df.count() raises QUERY_ONLY_CORRUPT_RECORD_COLUMN
    # because the pruned schema contains only the corrupt column)
    reader = spark.read.schema(schema).option("mode", "DROPMALFORMED")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, timestamp_format: str | None = None) -> None:
    writer = df.write.mode("overwrite")
    if timestamp_format:
        writer = writer.option("timestampFormat", timestamp_format)
    writer.json(path)
