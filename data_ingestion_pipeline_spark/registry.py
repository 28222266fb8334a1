"""Query + oracle registry — the contract surface for ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a DuckDB oracle
SQL string over the same parquet tables. Column names AND types are aligned
between the Spark plan and the oracle (aliases identical on both sides;
month/year cast to int; float aggregates rounded identically on both sides
so the order-insensitive value hash is deterministic across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_pipeline_spark.operators import reports

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (query fn, oracle SQL or None for rows-only checks)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# --------------------------------------------------------------------------
# §2.5 report queries (reference README.md:36-149 → star schema, FIXTURES.md §2)
# --------------------------------------------------------------------------

register(
    "revenue_per_product",
    reports.revenue_per_product,
    """
    SELECT p_partkey, p_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    """,
)

register(
    "low_stock",
    reports.low_stock,
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part WHERE p_size < 10
    """,
)

register(
    "orders_per_product_month",
    reports.orders_per_product_month,
    """
    SELECT p_partkey, p_name,
           CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS ship_month,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
           SUM(l_quantity) AS total_quantity
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2, 3, 4
    """,
)

register(
    "revenue_per_category",
    reports.revenue_per_category,
    """
    SELECT p_brand, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)

register(
    "inventory_status",
    reports.inventory_status,
    """
    SELECT p_partkey, p_name,
           CAST(p_size AS DOUBLE) AS current_stock,
           SUM(l_quantity) AS total_sold,
           CAST(p_size AS DOUBLE) - SUM(l_quantity) AS remaining_stock
    FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
    WHERE p_partkey = 1
    GROUP BY p_partkey, p_name, p_size
    """,
)

register(
    "most_sold_per_category",
    reports.most_sold_per_category,
    """
    SELECT p_brand, p_partkey, p_name, SUM(l_quantity) AS total_sold
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_partkey, p_name
    """,
)
