"""Streaming ingestion: file source → normalize → foreachBatch MERGE.

The north-star composition (SURVEY.md §7 M4): the batch ingestion pipeline's
normalize + MERGE become the per-micro-batch function of a Structured
Streaming job. ``foreachBatch`` is the escape hatch that lets an
append-oriented streaming writer drive an upsert sink (SURVEY.md §4.3);
checkpointing makes delivery effectively exactly-once into the versioned
table (each epoch's MERGE is idempotent, so replays converge).

At scale the file source is a drop-in for Kafka/queue sources — the
transformation graph is identical; only ``readStream.format(...)`` changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_ingestion_pipeline_spark import schemas
from data_ingestion_pipeline_spark.functions.normalize import normalize_orders
from data_ingestion_pipeline_spark.plans.merge import merge_upsert
from data_ingestion_pipeline_spark.plans.table import ManagedTable

__all__ = [
    "stream_orders_csv",
    "run_stream_to_completion",
    "merge_additive_aggregates",
]


def stream_orders_csv(
    spark: SparkSession,
    input_dir: str,
    table: ManagedTable,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    repartition_keys: bool = False,
    n_buckets: int = 64,
    bucket_sql: str | None = None,
) -> StreamingQuery:
    """Ingest order CSVs dropped into ``input_dir``.

    Each micro-batch runs the same deterministic MERGE as the batch pipeline
    (dedup last-wins → anti-join → atomic version swap), so stream-then-batch
    and batch-then-stream converge to the same table state.

    ``available_now=True`` (the test/driver default) drains the files
    present at start and stops; pass ``available_now=False`` for the
    continuous deployment that keeps watching the directory.

    ``repartition_keys=True`` switches the sink to keyed PARTIAL rewrites
    (plans/merge.py): the table lays out in ``n_buckets`` key partitions
    and each micro-batch rewrites only the buckets it touches — the lever
    that keeps per-batch latency flat as the table grows (pass a
    locality-matched ``bucket_sql``; see ManagedTable.default_bucket_sql).
    """
    reader = (
        spark.readStream.schema(schemas.ORDERS_CSV_RAW)
        .option("header", "true")
        .option("nullValue", "")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.csv(input_dir)
    normalized = normalize_orders(raw)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        merge_upsert(
            table,
            batch_df,
            keys=schemas.ORDERS_KEY,
            order_col="date_time",
            repartition_keys=repartition_keys,
            n_buckets=n_buckets,
            bucket_sql=bucket_sql,
        )

    writer = normalized.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return (
        writer
        .start()
    )


def run_stream_to_completion(query: StreamingQuery, timeout_s: float = 120.0) -> None:
    """Drain an availableNow query synchronously (test/driver helper)."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()


def merge_additive_aggregates(
    table: ManagedTable,
    batch_agg: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Fold a micro-batch's partial aggregates into a persistent summary
    table — incremental materialized-view maintenance. Unlike the
    state-store form (streaming/stateful.py) the running state lives in the
    versioned TABLE: restart-safe without a state store, readable by any
    batch consumer mid-stream, and the merge is a plain keyed aggregation
    (sum of longs — exact, associative, so batch arrival order and
    partitioning cannot change the result).

    At scale the union+groupBy shuffles current-summary + batch partials on
    the key — bound it by partitioning the summary on the key so only
    touched partitions rewrite (same lever as plans/merge.py).
    """
    from pyspark.sql import functions as F

    # read-modify-write: declare the base (and its sidecar listing, which
    # read() folds) so a concurrent commit aborts with ConcurrentWriteError
    # instead of this fold silently discarding it — two micro-batch drivers
    # racing here would otherwise undercount with no error
    base = table.current_version()
    if base is None:
        table.overwrite(batch_agg, expected_base=None)
        return
    sidecars = table.sidecar_listing(base)
    current = table.read(version=base)
    merged = (
        current.unionByName(batch_agg)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    table.overwrite(merged, expected_base=base, expected_sidecars=sidecars)
