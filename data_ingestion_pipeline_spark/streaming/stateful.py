"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dropDuplicates``/windowed aggs cover the declarative stateful cases;
anything with bespoke per-key state (running profiles, decayed counters,
cross-batch accumulators) needs the arbitrary-state API. The shape:

- state is keyed by the groupBy key and lives in the state store
  (checkpointed, partitioned with the shuffle — scales horizontally with
  key cardinality, not event volume);
- each micro-batch delivers that key's new rows as pandas batches; the
  handler folds them into state and emits whatever the operator defines;
- a GroupStateTimeout policy bounds state lifetime (here: no timeout —
  the profile is meant to live as long as the user does; production would
  expire on event-time watermark).

``user_profile_stream`` keeps a per-user running profile (event count,
value sum, latest timestamp) and emits the UPDATED profile each batch —
the downstream table is an upsert target keyed by user (foreachBatch MERGE
composes with it, streaming/ingest.py).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = [
    "user_profile_stream",
    "user_event_type_counts_stream",
    "user_event_type_counts_pandas_stream",
    "transform_with_state_available",
    "PROFILE_SCHEMA",
    "STATE_SCHEMA",
]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_micros", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_micros", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total_micros, last_us = state.get
    else:
        n, total_micros, last_us = 0, 0, None
    for pdf in batches:
        n += len(pdf)
        # Accumulate value in integer micro-units: a float running sum folded
        # batch-by-batch is accumulation-order-dependent and can't be matched
        # by a SQL oracle. Rounding each value to 6 decimals (half away from
        # zero — DECIMAL(18,6) cast semantics) then summing int64 is exact
        # and associative, so the cross-batch fold is order-independent.
        v = pdf["value"].fillna(0.0).to_numpy()
        micros = (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype("int64")
        total_micros += int(micros.sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # datetime64[ns] → µs
        batch_max = int(ts_us.max()) if len(ts_us) else None
        if batch_max is not None:
            last_us = batch_max if last_us is None else max(last_us, batch_max)
    state.update((n, total_micros, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum_micros": [total_micros],
            "last_ts_us": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events (streaming, cols user_id/ts/value) → updated per-user profile
    rows per micro-batch. One shuffle on user_id; state size O(users)."""
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COUNTS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_types", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)

COUNTS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _update_type_counts(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        types, counts = state.get
        acc = dict(zip(types, counts))
    else:
        acc = {}
    for pdf in batches:
        # value_counts drops nulls — same null policy as the MapState twin
        for et, c in pdf["event_type"].value_counts().items():
            acc[et] = acc.get(et, 0) + int(c)
    items = sorted(acc.items())  # deterministic state/emit order
    state.update(
        ([et for et, _ in items], [int(n) for _, n in items])
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(items),
            "event_type": [et for et, _ in items],
            "n_events": [int(n) for _, n in items],
        }
    )


def user_event_type_counts_pandas_stream(events: DataFrame) -> DataFrame:
    """Per-user event-type counters on ``applyInPandasWithState`` — the
    semantic twin of ``user_event_type_counts_stream`` (whose
    ``transformWithStateInPandas`` MapState API needs python-protobuf,
    absent in this sandbox). The map is emulated as two parallel arrays in
    the state tuple: one serialized blob per user instead of one state-store
    entry per (user, type), so single-type updates rewrite the whole map —
    the exact trade the typed-MapState API exists to remove — but the
    emitted rows and cross-batch fold are identical, which makes this the
    driver-checkable surface for the same semantics. State size
    O(users · types); one shuffle on user_id."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_type_counts,
            outputStructType=COUNTS_OUT_SCHEMA,
            stateStructType=COUNTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` speaks protobuf between the JVM state
    server and the Python worker; without the ``protobuf`` package the
    driver worker crashes at init. Gate (no install allowed in this
    sandbox): the operator registers as a driver-checkable query only where
    the dependency exists."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def user_event_type_counts_stream(events: DataFrame) -> DataFrame:
    """Per-user event-type counters on the ``transformWithStateInPandas``
    API (Spark 4's arbitrary-state processor, successor to
    ``applyInPandasWithState``): state is a typed MapState keyed by
    event_type — the state store holds one map entry per (user, type)
    instead of one serialized blob per user, so single-type updates touch
    one entry and the state model composes (value/list/map states, timers)
    where the old API offered a single tuple.

    Emits the UPDATED per-type counts each micro-batch (update semantics;
    the final emission per key is the cross-batch total — exactly how the
    profile stream is checked). Requires python-protobuf at runtime — see
    ``transform_with_state_available``."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    class EventTypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            for pdf in rows:
                for et, c in pdf["event_type"].value_counts().items():
                    prev = self._counts.getValue((et,))
                    n = (prev[0] if prev else 0) + int(c)
                    self._counts.updateValue((et,), (n,))
            out = [
                (user_id, et_key[0], n_val[0])
                for et_key, n_val in self._counts.iterator()
            ]
            yield pd.DataFrame(out, columns=["user_id", "event_type", "n_events"])

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=EventTypeCounts(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
