"""M3 — MERGE upsert + ManagedTable + schema evolution (SURVEY.md §2.6, §4.3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestion_pipeline_spark import schemas
from data_ingestion_pipeline_spark.pipeline import run_pipeline
from data_ingestion_pipeline_spark.plans.merge import (
    dedupe_last_wins,
    merge_upsert,
    split_updates_inserts,
)
from data_ingestion_pipeline_spark.plans.schema_evolution import (
    conform_to_schema,
    diff_schema,
    sync_table_schema,
)
from data_ingestion_pipeline_spark.plans.table import ManagedTable
from tests.fixtures import write_fixture_csvs


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, ts timestamp")


def test_dedupe_last_wins(spark):
    import datetime as dt

    b = _batch(
        spark,
        [
            ("a", 1, dt.datetime(2023, 1, 1)),
            ("a", 2, dt.datetime(2023, 1, 3)),
            ("a", 3, dt.datetime(2023, 1, 2)),
            ("b", 9, dt.datetime(2023, 1, 1)),
        ],
    )
    out = {r.k: r.v for r in dedupe_last_wins(b, ["k"], "ts").collect()}
    assert out == {"a": 2, "b": 9}


def test_split_updates_inserts(spark):
    import datetime as dt

    stored = _batch(spark, [("a", 1, dt.datetime(2023, 1, 1))])
    batch = _batch(
        spark, [("a", 5, dt.datetime(2023, 2, 1)), ("c", 7, dt.datetime(2023, 2, 1))]
    )
    upd, ins = split_updates_inserts(batch, stored, ["k"])
    assert [r.k for r in upd.collect()] == ["a"]
    assert [r.k for r in ins.collect()] == ["c"]


def test_merge_idempotent_and_last_wins(spark, tmp_path):
    import datetime as dt

    t = ManagedTable(spark, str(tmp_path / "t"))
    b1 = _batch(
        spark,
        [
            ("a", 1, dt.datetime(2023, 1, 1)),
            ("a", 2, dt.datetime(2023, 1, 5)),  # same key, later ts → wins
            ("b", 3, dt.datetime(2023, 1, 1)),
        ],
    )
    merge_upsert(t, b1, ["k"], "ts")
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {"a": 2, "b": 3}

    # run-twice == run-once (idempotency; deviation from reference documented
    # in SURVEY.md §2.6)
    merge_upsert(t, b1, ["k"], "ts")
    assert {r.k: r.v for r in t.read().collect()} == {"a": 2, "b": 3}

    # update existing + insert new
    b2 = _batch(
        spark, [("a", 10, dt.datetime(2023, 2, 1)), ("c", 4, dt.datetime(2023, 1, 1))]
    )
    merge_upsert(t, b2, ["k"], "ts")
    assert {r.k: r.v for r in t.read().collect()} == {"a": 10, "b": 3, "c": 4}


def test_managed_table_versions_and_vacuum(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"), keep_versions=2)
    for i in range(4):
        t.overwrite(spark.range(i + 1).withColumnRenamed("id", "x"))
    assert t.read().count() == 4
    versions = [d for d in os.listdir(t.root) if d.startswith("v")]
    assert len(versions) <= 2  # vacuumed
    assert t.current_version() == "v00000004"


def test_schema_evolution_add_drop_cast(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([("p1", 1, "junk")], "product_id string, quantity int, legacy string")
    )
    declared = T.StructType(
        [
            T.StructField("product_id", T.StringType()),
            T.StructField("quantity", T.LongType()),  # cast int→long
            T.StructField("name", T.StringType()),  # add
            # 'legacy' dropped
        ]
    )
    d = diff_schema(t.read().schema, declared, protected=["product_id"])
    assert d == {"add": ["name"], "drop": ["legacy"], "cast": ["quantity"]}
    v = sync_table_schema(t, declared, protected=["product_id"])
    assert v is not None
    out = t.read()
    assert [f.name for f in out.schema.fields] == ["product_id", "quantity", "name"]
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)["quantity"] == "bigint"
    assert out.collect()[0].name is None
    # already in sync → no-op
    assert sync_table_schema(t, declared, protected=["product_id"]) is None


def test_protected_key_never_dropped(spark):
    df = spark.createDataFrame([("k1", 1)], "product_id string, quantity long")
    declared = T.StructType([T.StructField("quantity", T.LongType())])
    out = conform_to_schema(df, declared, protected=["product_id"])
    assert "product_id" in out.columns  # reference never drops PKs (schema_sync.py:141-150)


def test_full_pipeline_reference_shape(spark, tmp_path):
    """End-to-end: reference-quirk CSVs → normalize → merge → query surface."""
    orders_csv, inv_csv = write_fixture_csvs(str(tmp_path / "csv"))
    tables = run_pipeline(spark, orders_csv, inv_csv, str(tmp_path / "wh"))
    orders, inv = tables["orders"], tables["inventories"]

    # merged orders: one row per (order_id, product_id) natural key
    assert orders.count() == orders.select("order_id", "product_id").distinct().count()
    # all product ids resolve in inventory (FK shape preserved by fixture)
    unresolved = orders.join(inv, "product_id", "left_anti").count()
    assert unresolved == 0
    # idempotency at the pipeline level
    n1 = orders.count()
    tables2 = run_pipeline(spark, orders_csv, inv_csv, str(tmp_path / "wh"))
    assert tables2["orders"].count() == n1

    # the six report queries run against the ingested pair via SQL views
    spark.sql(
        """
        SELECT i.product_id, i.name, SUM(o.quantity * o.amount) AS total_revenue
        FROM ref_orders o JOIN ref_inventories i ON o.product_id = i.product_id
        GROUP BY i.product_id, i.name ORDER BY total_revenue DESC
        """
    ).collect()
    low = spark.sql("SELECT * FROM ref_inventories WHERE quantity < 10").count()
    assert low > 0


def test_merge_upsert_evolves_schema(spark, tmp_path):
    """evolve_schema=True: a batch with a NEW column widens the table (old
    rows get typed NULLs); without the flag the widening batch is rejected
    (silent drift stays opt-in)."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.plans.merge import merge_upsert
    from data_ingestion_pipeline_spark.plans.table import ManagedTable

    table = ManagedTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, ord long"
    )
    merge_upsert(table, base, keys=["k"], order_col="ord")

    widened = spark.createDataFrame(
        [(2, "b2", 21, 0.5), (3, "c", 30, 0.7)],
        "k long, s string, ord long, score double",
    )
    with pytest.raises(Exception):
        merge_upsert(table, widened, keys=["k"], order_col="ord")
    merge_upsert(table, widened, keys=["k"], order_col="ord", evolve_schema=True)
    got = {r.k: (r.s, r.score) for r in table.read().collect()}
    assert got == {1: ("a", None), 2: ("b2", 0.5), 3: ("c", 0.7)}

    # and the inverse: a NARROW batch merges into the widened table, its
    # rows carrying NULL for the column it lacks
    narrow = spark.createDataFrame([(4, "d", 40)], "k long, s string, ord long")
    merge_upsert(table, narrow, keys=["k"], order_col="ord", evolve_schema=True)
    assert table.read().filter(F.col("k") == 4).collect()[0].score is None
