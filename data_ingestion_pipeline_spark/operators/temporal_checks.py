"""Driver-checkable temporal-join queries over the events table.

As-of and range joins are the feature-pipeline primitives the reference's
relational surface lacks (SURVEY.md §2.4 lists them as absent) — added
here as first-class operators (functions/temporal.py) with exact DuckDB
oracles: DuckDB has native ``ASOF JOIN`` and runs inequality joins
directly, so both checks are hash-compared, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.partitioning import fan_out
from data_ingestion_pipeline_spark.functions.temporal import (
    asof_join_prev,
    range_join_binned,
)
from data_ingestion_pipeline_spark.sources.catalog import load_table

__all__ = ["asof_prev_view_per_purchase", "views_within_hour_of_purchase"]


def asof_prev_view_per_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the same user's most recent 'view' strictly
    before it (timestamp + gap; NULL when the purchase precedes all views).
    Value column is the right side's ts itself, so equal-instant right rows
    cannot make the result ambiguous."""
    events = fan_out(load_table(spark, sf_dir, "events"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join_prev(purchases, views, key="user_id", ts="ts", value_cols=["ts"])
    return out.select(
        "event_id",
        "user_id",
        F.col("prev_ts").alias("prev_view_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts")))
        .cast("bigint")
        .alias("gap_us"),
    )


ASOF_PREV_VIEW_PER_PURCHASE_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       v.ts AS prev_view_ts,
       CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts < p.ts
"""


def views_within_hour_of_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: count each purchase's same-user views within the
    following hour, bounds [1 s, 3600 s] after the purchase instant."""
    events = fan_out(load_table(spark, sf_dir, "events"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    pairs = range_join_binned(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        lower_s=1, upper_s=3600,
    )
    return (
        pairs.groupBy(F.col("l_event_id").alias("event_id"))
        .agg(F.count("*").cast("bigint").alias("n_views_next_hour"))
    )


VIEWS_WITHIN_HOUR_OF_PURCHASE_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_views_next_hour
FROM p JOIN v ON p.user_id = v.user_id
 AND v.ts >= p.ts + INTERVAL 1 SECOND
 AND v.ts <= p.ts + INTERVAL 3600 SECOND
GROUP BY p.event_id
"""
