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
    corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    reader = (
        spark.read.schema(corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    df = reader.json(path)
    return df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")


def write_jsonl(df: DataFrame, path: str, timestamp_format: str | None = None) -> None:
    writer = df.write.mode("overwrite")
    if timestamp_format:
        writer = writer.option("timestampFormat", timestamp_format)
    writer.json(path)
