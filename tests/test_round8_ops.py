"""Round-8 operators: the applyInPandasWithState twin of the protobuf-gated
MapState counter, the IVF top-k oracle promotion, and the TPC-H broadcast
fallback plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_stateful_counts_pandas_twin_matches_closed_form(spark):
    """The applyInPandasWithState twin (round-7 verdict ask #3) must fold the
    planted two-batch replay into exactly 2x the base per-(user,type) counts
    — same contract the transformWithStateInPandas original carries where
    protobuf exists."""
    from data_ingestion_pipeline_spark.operators.streaming_checks import (
        stateful_event_type_counts_pandas_events,
    )

    out = stateful_event_type_counts_pandas_events(spark, SF_SMOKE)
    direct = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type")
        .agg((2 * F.count("*")).cast("bigint").alias("n_events"))
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in direct.collect()}


def test_stateful_counts_twin_state_roundtrip_is_exact():
    """The parallel-array map emulation must round-trip counts through the
    state tuple without loss or reorder nondeterminism."""
    import pandas as pd

    from data_ingestion_pipeline_spark.streaming.stateful import (
        _update_type_counts,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    st = FakeState()
    b1 = pd.DataFrame({"event_type": ["view", "view", "purchase", None]})
    out1 = list(_update_type_counts((7,), [b1], st))[0]
    # null event_type dropped (value_counts policy, same as the MapState twin)
    assert list(out1["event_type"]) == ["purchase", "view"]
    assert list(out1["n_events"]) == [1, 2]
    b2 = pd.DataFrame({"event_type": ["view", "click"]})
    out2 = list(_update_type_counts((7,), [b2], st))[0]
    assert list(out2["event_type"]) == ["click", "purchase", "view"]
    assert list(out2["n_events"]) == [1, 1, 3]
