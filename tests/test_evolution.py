"""Schema evolution + partitioned-layout checks (SURVEY.md §2.1 S9-S11, §7 M6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.evolution_checks import (
    partitioned_orders_path,
    schema_evolution_sync,
)
from tests.conftest import SF_SMOKE


def test_partitioned_scan_prunes_to_one_year(spark):
    path = partitioned_orders_path(spark, SF_SMOKE)
    pruned = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan
    # the filtered scan must read exactly the 1995 partition's rows
    raw = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    want = raw.filter(F.year("o_orderdate") == 1995).count()
    assert pruned.count() == want > 0


def test_schema_evolution_add_drop_cast(spark):
    evolved = schema_evolution_sync(spark, SF_SMOKE)
    fields = {f.name: f.dataType.simpleString() for f in evolved.schema.fields}
    assert fields == {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_size": "bigint",       # cast int -> bigint
        "p_container": "string",  # added as typed NULL
    }
    assert "legacy_note" not in fields  # dropped (not protected)
    assert evolved.filter(F.col("p_container").isNotNull()).count() == 0
    raw = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    assert evolved.count() == raw.count()
