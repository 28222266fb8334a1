"""Driver-checkable schema-evolution and partition-pruning queries.

Schema evolution (SURVEY.md §2.1 S9-S11) mirrors the reference's
schema-sync flow (/root/reference/flows/schema_sync.py:102-155): diff the
stored table against a declared schema, ADD missing columns as typed
NULLs, DROP undeclared ones (never protected keys), CAST drifted types.
On parquet that's a projecting rewrite through ManagedTable's atomic
version swap — here exercised end to end on real fixture data and checked
against a DuckDB oracle that recomputes the declared projection directly.

Partitioned writes are the 100 TB table layout story: data written
partitioned by a low-cardinality derived key means queries filtering on
that key read only matching directories (partition pruning — the scan
lists 1 of N partitions before any row IO). The check writes `orders`
partitioned by order-year, queries one year back, and pytest asserts the
scan's partition count; the oracle recomputes from the raw table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark.plans.schema_evolution import sync_table_schema
from data_ingestion_pipeline_spark.plans.table import ManagedTable
from data_ingestion_pipeline_spark.sources.catalog import load_table

__all__ = [
    "schema_evolution_sync",
    "partitioned_orders_yearly",
    "partitioned_orders_path",
]

_SCRATCH = "/tmp/spark_graft_scratch"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_SCRATCH, tag, name)


# Declared target: p_container is NEW (appears as typed NULL), p_size is
# CAST int→long, and the stored extra column legacy_note must be DROPPED
# while the protected key p_partkey survives.
_DECLARED = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_size", T.LongType(), True),
        T.StructField("p_container", T.StringType(), True),
    ]
)


def schema_evolution_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S10/S11 end to end: seed a managed table from ``part`` with an
    extra legacy column, sync it to the declared schema (add+drop+cast via
    projecting rewrite, atomic version swap), return the evolved table."""
    root = _scratch(sf_dir, "evolution_part")
    shutil.rmtree(root, ignore_errors=True)
    table = ManagedTable(spark, root)
    seed = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.concat(F.lit("legacy:"), F.col("p_brand")).alias("legacy_note"),
    )
    table.overwrite(seed)
    version = sync_table_schema(table, _DECLARED, protected=["p_partkey"])
    assert version is not None, "schema drift must trigger a rewrite"
    return table.read()


SCHEMA_EVOLUTION_SYNC_ORACLE = """
SELECT p_partkey, p_name, CAST(p_size AS BIGINT) AS p_size,
       CAST(NULL AS VARCHAR) AS p_container
FROM part
"""


def partitioned_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Write ``orders`` partitioned by order-year (idempotent per sf_dir);
    returns the dataset path. Separate so tests can inspect the layout."""
    path = _scratch(sf_dir, "orders_by_year")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        orders.write.partitionBy("o_year").mode("overwrite").parquet(path)
    return path


def partitioned_orders_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query one year from the partitioned layout: the o_year predicate is
    a partition filter — the scan lists exactly one year directory
    (asserted in pytest via the InMemoryFileIndex partition count)."""
    path = partitioned_orders_path(spark, sf_dir)
    df = spark.read.parquet(path)
    return (
        df.filter(F.col("o_year") == 1995)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


PARTITIONED_ORDERS_YEARLY_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_value
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
GROUP BY o_orderpriority
"""
