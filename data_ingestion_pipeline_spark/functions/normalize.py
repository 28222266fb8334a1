"""Normalization functions (SURVEY.md §2.2 P1-P4), all plan-only/JVM-side.

The reference normalizes with pandas + row loops (camel_to_snake at
``flows/utils.py:4-5``, casts at ``flows/data_ingestion.py:74-76,86-94``,
NaN→None at ``:109-112``); here each is a zero-or-one-expression DataFrame
transform — renames are pure metadata (no task runs at all), casts and
timestamp parsing are codegen'd expressions, and null normalization is free
because Spark's CSV reader produces real NULLs for empty fields.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "camel_to_snake",
    "rename_columns_snake_case",
    "parse_iso8601",
    "empty_string_to_null",
    "normalize_orders",
    "normalize_inventory",
]

_CAMEL_RE = re.compile(r"([a-z0-9])([A-Z])")


def camel_to_snake(name: str) -> str:
    """``camelCase`` → ``snake_case`` (reference ``flows/utils.py:4-5``)."""
    return _CAMEL_RE.sub(r"\1_\2", name).lower()


def rename_columns_snake_case(df: DataFrame) -> DataFrame:
    """P1 — rename every column. Metadata-only: no shuffle, no compute."""
    return df.toDF(*[camel_to_snake(c) for c in df.columns])


def parse_iso8601(col: Column) -> Column:
    """P3 — robust ISO8601 timestamp parse.

    Handles both second-precision (``2023-02-01T17:12:52Z``) and the
    reference data's minute-precision rows (``2023-02-01T06:16Z``,
    SURVEY.md §1.4.2) without rejecting either: try the full format first,
    fall back to minute precision, then to a bare cast. ``coalesce`` keeps
    this a single JVM expression — no Python in the loop. ``try_to_timestamp``
    (not ``to_timestamp``) because under ANSI mode (Spark 4 default) a
    non-matching format throws instead of yielding NULL, which would make the
    fallback chain unreachable.
    """
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        col.try_cast("timestamp"),
    )


def empty_string_to_null(col: Column) -> Column:
    """P4 — quoted empty strings (``""`` campaigns in the reference CSV,
    SURVEY.md §1.4.5) become NULL, matching the reference's NaN→None pass."""
    return F.when(F.trim(col) == "", F.lit(None)).otherwise(col)


def normalize_orders(raw: DataFrame) -> DataFrame:
    """Full order normalization: rename → cast ids → parse timestamps →
    null-normalize optional strings. Produces schemas.ORDERS column-for-column."""
    df = rename_columns_snake_case(raw)
    return df.select(
        df.order_id.cast("string").alias("order_id"),
        df.product_id.cast("string").alias("product_id"),
        empty_string_to_null(df.currency).alias("currency"),
        df.quantity.cast("long").alias("quantity"),
        df.shipping_cost.cast("double").alias("shipping_cost"),
        df.amount.cast("double").alias("amount"),
        empty_string_to_null(df.channel).alias("channel"),
        empty_string_to_null(df.channel_group).alias("channel_group"),
        empty_string_to_null(df.campaign).alias("campaign"),
        parse_iso8601(df.date_time).alias("date_time"),
    )


def normalize_inventory(raw: DataFrame) -> DataFrame:
    df = rename_columns_snake_case(raw)
    return df.select(
        df.product_id.cast("string").alias("product_id"),
        df.name.cast("string").alias("name"),
        df.quantity.cast("long").alias("quantity"),
        empty_string_to_null(df.category).alias("category"),
        empty_string_to_null(df.sub_category).alias("sub_category"),
    )
