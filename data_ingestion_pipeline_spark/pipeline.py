"""End-to-end ingestion pipeline — the analog of the reference's ``main_flow``.

Reference flow (``main.py:9-26``): schema sync → read CSVs → existence lookup
→ update/insert split → row-at-a-time upsert. Here the same composition is
four declarative steps, and parameters actually flow through (the reference
hardcodes its paths over its own parameters — known bug, SURVEY.md §2.9):

    read CSV (schema'd) → normalize → schema-sync → MERGE (set-based, atomic)

Run-twice is a no-op on identical input (idempotent), unlike the reference
(SURVEY.md §2.6). Retries: source reads are wrapped in a bounded retry loop —
the driver-side analog of Prefect task retries (reference
``flows/data_ingestion.py:68,80``); executor-level failure is already covered
by Spark's own task retry (``spark.task.maxFailures``).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_pipeline_spark import schemas
from data_ingestion_pipeline_spark.plans.merge import merge_upsert
from data_ingestion_pipeline_spark.plans.schema_evolution import conform_to_schema
from data_ingestion_pipeline_spark.plans.table import ManagedTable
from data_ingestion_pipeline_spark.sources.csv_reader import (
    read_inventory_csv,
    read_orders_csv,
)

__all__ = ["ingest_orders", "ingest_inventory", "run_pipeline", "with_retries"]


def with_retries(fn, retries: int = 2, delay_seconds: float = 5.0):
    """Bounded retry for driver-side source reads (reference's Prefect
    ``retries=2, retry_delay_seconds=5``, ``flows/data_ingestion.py:68,80``)."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — retry any source failure
            last = exc
            if attempt < retries:
                time.sleep(delay_seconds)
    raise last  # type: ignore[misc]


def ingest_orders(spark: SparkSession, csv_path: str, warehouse: str) -> DataFrame:
    batch = with_retries(lambda: read_orders_csv(spark, csv_path))
    batch = conform_to_schema(batch, schemas.ORDERS, protected=schemas.ORDERS_KEY)
    table = ManagedTable(spark, os.path.join(warehouse, "orders"))
    merge_upsert(table, batch, keys=schemas.ORDERS_KEY, order_col="date_time")
    return table.read()


def ingest_inventory(spark: SparkSession, csv_path: str, warehouse: str) -> DataFrame:
    batch = with_retries(lambda: read_inventory_csv(spark, csv_path))
    batch = conform_to_schema(batch, schemas.INVENTORIES, protected=schemas.INVENTORIES_KEY)
    table = ManagedTable(spark, os.path.join(warehouse, "inventories"))
    # Inventory has no event-time column; "last wins" falls back to the
    # deterministic struct tiebreak inside dedupe_last_wins.
    merge_upsert(table, batch, keys=schemas.INVENTORIES_KEY, order_col="product_id")
    return table.read()


def run_pipeline(
    spark: SparkSession, orders_csv: str, inventory_csv: str, warehouse: str
) -> dict[str, DataFrame]:
    """Compose the full ingest (reference ``main.py:9-26``) and register the
    resulting tables as temp views for the dual DataFrame/SQL query surface."""
    orders = ingest_orders(spark, orders_csv, warehouse)
    inventories = ingest_inventory(spark, inventory_csv, warehouse)
    orders.createOrReplaceTempView("ref_orders")
    inventories.createOrReplaceTempView("ref_inventories")
    return {"orders": orders, "inventories": inventories}
