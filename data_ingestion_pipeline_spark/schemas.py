"""Canonical schemas — the Spark analog of the reference's declarative model.

The reference declares its tables once in SQLAlchemy (``models/tables.py:13-35``)
and reconciles the live store to that declaration. Here the declaration is a
``StructType`` per table; readers take the RAW schema (CSV, everything that
needs parsing arrives as string), the normalizer produces the NORMALIZED
schema, and the schema-evolution plan (plans/schema_evolution.py) reconciles
stored tables to it.

Type mapping (SURVEY.md §1.5): Integer→LongType, String→StringType,
Float→DoubleType (monetary stays double for reference parity — the reference
uses Float, ``models/tables.py:20-21``), DateTime→TimestampType (UTC session).
The DB surrogate autoincrement ``id`` is dropped: natural keys
``(order_id, product_id)`` / ``product_id`` are the identity — sequence-style
surrogates don't distribute (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "ORDERS_CSV_RAW",
    "INVENTORY_CSV_RAW",
    "ORDERS",
    "INVENTORIES",
    "ORDERS_KEY",
    "INVENTORIES_KEY",
]

# Raw CSV shape: exact headers from the reference data files
# (reference data/orders.csv:1, data/inventory.csv:1). dateTime arrives as a
# string because the data mixes second- and minute-precision ISO8601
# (SURVEY.md §1.4.2) and we parse it explicitly in the normalizer.
ORDERS_CSV_RAW = T.StructType(
    [
        T.StructField("orderId", T.StringType(), False),
        T.StructField("productId", T.StringType(), False),
        T.StructField("currency", T.StringType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("shippingCost", T.DoubleType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("channel", T.StringType(), True),
        T.StructField("channelGroup", T.StringType(), True),
        T.StructField("campaign", T.StringType(), True),
        T.StructField("dateTime", T.StringType(), True),
    ]
)

INVENTORY_CSV_RAW = T.StructType(
    [
        T.StructField("productId", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("subCategory", T.StringType(), True),
    ]
)

# Normalized table schemas (FIXTURES.md §1.3; mirrors models/tables.py:13-35
# minus the surrogate id).
ORDERS = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("product_id", T.StringType(), False),
        T.StructField("currency", T.StringType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("shipping_cost", T.DoubleType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("channel", T.StringType(), True),
        T.StructField("channel_group", T.StringType(), True),
        T.StructField("campaign", T.StringType(), True),
        T.StructField("date_time", T.TimestampType(), True),
    ]
)

INVENTORIES = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("sub_category", T.StringType(), True),
    ]
)

# Logical keys, enforced by the MERGE plan (reference enforces them
# procedurally: flows/data_ingestion.py:19, :41-44).
ORDERS_KEY = ("order_id", "product_id")
INVENTORIES_KEY = ("product_id",)
