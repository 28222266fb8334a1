"""Round-10 operator pins: the IVF-PQ sample-model composition replay and
the round's other additions. The hash gate is the DuckDB oracle
(tools/check_oracle.py / the driver); these tests pin structure the value
hash cannot see — self-query identity, rank contiguity, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_ivfpq_sample_adc_self_query_and_rank_shape(spark):
    from data_ingestion_pipeline_spark.operators.llm_data import (
        ann_ivfpq_sample_adc_topk_embeddings,
    )

    rows = (
        ann_ivfpq_sample_adc_topk_embeddings(spark, SF_SMOKE)
        .orderBy("rank")
        .collect()
    )
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # the query vector (vec 0) is its own nearest neighbor at cosine 1.0 —
    # it sits in a probed cell by construction (its own cell has the
    # maximal q-dot) and survives the shortlist
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == pytest.approx(1.0)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["query_id"] == 0 for r in rows)


def test_ivfpq_sample_adc_rejects_sparse_ids(spark):
    """The oracle's stride CTEs assume dense 0-based vec_ids; the operator
    must fail loudly on data that violates it instead of silently
    diverging from the replay."""
    import os
    import tempfile

    from data_ingestion_pipeline_spark.operators.llm_data import (
        ann_ivfpq_sample_adc_topk_embeddings,
    )

    with tempfile.TemporaryDirectory() as d:
        (
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .withColumn("vec_id", F.col("vec_id") * 2)
            .write.parquet(os.path.join(d, "embeddings.parquet"))
        )
        with pytest.raises(AssertionError, match="dense 0-based"):
            ann_ivfpq_sample_adc_topk_embeddings(spark, d)
