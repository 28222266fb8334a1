"""Round-11 degenerate-fixture pins (round-10 verdict ask #7): the
eb_shrunk moment-fit variance guard and the ann_pq_sample_adc dense-id
precondition must fail/NULL identically in BOTH engines, proven on
fixtures that actually hit the degenerate branch (the sf corpora never
do)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_eb_shrinkage_degenerate_variance_nulls_in_both_engines(spark):
    """All-equal per-user rates make the moment fit's v = 0: the guarded
    prior must yield NULL shrunk rates in Spark AND in the DuckDB oracle
    (unguarded, Spark division gives NULL where DuckDB gives Infinity —
    the engine divergence the round-9 advice flagged)."""
    import duckdb

    from data_ingestion_pipeline_spark.operators.inference_stats import (
        EB_SHRUNK_PURCHASE_RATE_USERS_ORACLE,
        eb_shrunk_purchase_rate_users,
    )

    # every user: exactly 1 purchase + 1 view -> raw rate 0.5 for all
    rows = []
    eid = 0
    for uid in range(6):
        for et in ("purchase", "view"):
            rows.append((eid, f"2024-01-0{uid + 1} 00:00:00", uid, et, 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        (
            spark.createDataFrame(
                rows, "event_id bigint, ts string, user_id bigint, "
                "event_type string, value double, props string"
            )
            .withColumn("ts", F.to_timestamp("ts"))
            .write.parquet(os.path.join(d, "events.parquet"))
        )
        got = eb_shrunk_purchase_rate_users(spark, d).collect()
        assert len(got) == 6
        for r in got:
            assert r["raw_rate"] == pytest.approx(0.5)
            assert r["shrunk_rate"] is None, (
                "v=0 corpus must report 'prior unfittable' (NULL), got "
                f"{r['shrunk_rate']}"
            )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(d, 'events.parquet', '*.parquet')}'"
        )
        for _, _, _, raw, shrunk in con.execute(
            EB_SHRUNK_PURCHASE_RATE_USERS_ORACLE
        ).fetchall():
            assert raw == pytest.approx(0.5)
            assert shrunk is None


def test_eb_shrinkage_overdispersed_corpus_nulls_in_both_engines(spark):
    """Overdispersion (v >= m(1-m), concentration <= 0): the guard must
    refuse the fit with NULLs rather than silently shrinking AWAY from
    the prior interval. Fixture: half the users at rate 0, half at 1,
    single-event users -> m=0.5, v=0.25 = m(1-m), conc_raw = 0."""
    import duckdb

    from data_ingestion_pipeline_spark.operators.inference_stats import (
        EB_SHRUNK_PURCHASE_RATE_USERS_ORACLE,
        eb_shrunk_purchase_rate_users,
    )

    rows = [
        (i, f"2024-01-01 0{i}:00:00", i, "purchase" if i % 2 == 0 else "view", 1.0, "{}")
        for i in range(8)
    ]
    with tempfile.TemporaryDirectory() as d:
        (
            spark.createDataFrame(
                rows, "event_id bigint, ts string, user_id bigint, "
                "event_type string, value double, props string"
            )
            .withColumn("ts", F.to_timestamp("ts"))
            .write.parquet(os.path.join(d, "events.parquet"))
        )
        got = eb_shrunk_purchase_rate_users(spark, d).collect()
        assert len(got) == 8 and all(r["shrunk_rate"] is None for r in got)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(d, 'events.parquet', '*.parquet')}'"
        )
        assert all(
            row[4] is None
            for row in con.execute(
                EB_SHRUNK_PURCHASE_RATE_USERS_ORACLE
            ).fetchall()
        )


def test_pq_sample_adc_rejects_sparse_ids(spark):
    """The flat sample-ADC replay has the same stride-CTE precondition as
    the IVF-PQ composition (dense 0-based vec_ids, >=16 rows): the
    operator must fail loudly on sparse ids instead of silently
    diverging from the oracle."""
    from data_ingestion_pipeline_spark.operators.llm_data import (
        ann_pq_sample_adc_topk_embeddings,
    )

    with tempfile.TemporaryDirectory() as d:
        (
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .withColumn("vec_id", F.col("vec_id") * 2)
            .write.parquet(os.path.join(d, "embeddings.parquet"))
        )
        with pytest.raises(AssertionError, match="dense 0-based"):
            ann_pq_sample_adc_topk_embeddings(spark, d)


def test_pq_sample_adc_rejects_short_corpus(spark):
    """Fewer than n_codes=16 vectors would make train_codebooks TILE the
    sample (which the SQL replay does not) — the precondition must trip
    before the tiling path can diverge."""
    from data_ingestion_pipeline_spark.operators.llm_data import (
        ann_pq_sample_adc_topk_embeddings,
    )

    with tempfile.TemporaryDirectory() as d:
        (
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .filter(F.col("vec_id") < 10)
            .write.parquet(os.path.join(d, "embeddings.parquet"))
        )
        with pytest.raises(AssertionError, match="dense 0-based"):
            ann_pq_sample_adc_topk_embeddings(spark, d)


def test_shapley_channel_bound_survives_python_O():
    """The 2^C coalition-lattice bound is a ValueError, not an assert —
    `python -O` strips asserts, and a stripped bound would let a wide
    channel taxonomy trigger an exponential lattice enumeration."""
    import ast
    import inspect

    from data_ingestion_pipeline_spark.operators import analytics_checks

    src = inspect.getsource(analytics_checks.shapley_attribution_events)
    tree = ast.parse(src)
    raises = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Raise)
        and isinstance(n.exc, ast.Call)
        and getattr(n.exc.func, "id", "") == "ValueError"
    ]
    assert raises, "shapley lattice bound must raise ValueError"
    asserts = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Assert) and "n_ch" in ast.dump(n)
    ]
    assert not asserts, "lattice bound still uses a strippable assert"
