"""Event-time windowed aggregation — works on both streaming and batch frames.

The reference has no streaming surface; "real-time stock alerts" is an
aspiration (reference ``README.md:161-197``) that BASELINE.json directs us to
realize idiomatically. All builders here take a DataFrame that may be a
streaming frame (``readStream``) or a batch frame — ``window()``/
``session_window()`` and the aggregates behave identically, which is what
makes the batch SQL oracle a valid check for the streaming plan.

Watermarks bound state: a tumbling/sliding aggregation keeps one state row
per (window, key) until the watermark passes the window end; at 100 TB-rate
streams the watermark delay × key cardinality is the state budget, so it is
a required argument rather than a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_event_stats",
    "sliding_event_stats",
    "sessionize_gaps_and_islands",
    "session_window_stats",
    "dedup_events_stream",
    "dedup_events_stream_within_watermark",
    "chained_daily_rollup_stream",
]


def _with_optional_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def tumbling_event_stats(
    events: DataFrame, duration: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Tumbling window × event_type: count + sum(value). Streaming state is
    bounded by the watermark; batch mode computes the same relation."""
    df = _with_optional_watermark(events, "ts", watermark)
    return (
        df.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # Decimal sum: exact, accumulation-order-independent → the batch
            # SQL oracle's cents match bitwise (functions/numeric.py).
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_stats(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding window: each event lands in duration/slide windows — the
    fan-out happens at aggregation time (no row duplication in the scan)."""
    df = _with_optional_watermark(events, "ts", watermark)
    return (
        df.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # Decimal sum: exact, accumulation-order-independent → the batch
            # SQL oracle's cents match bitwise (functions/numeric.py).
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize_gaps_and_islands(events: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Batch sessionization via gaps-and-islands window functions: a new
    session starts when the gap to the previous event exceeds the threshold.

    This is the *batch* formulation (lag + conditional cumsum), chosen over
    ``session_window`` here because it is expressible in ANSI SQL — the
    oracle recomputes it verbatim. The streaming formulation is
    session_window_stats below; on the same batch input they agree.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = float(gap_minutes * 60)
    # cast("double") keeps sub-second precision (cast("long") truncates, so
    # a 300.5 s gap would read as 300 and merge two sessions the streaming
    # twin — and the oracle's fractional epoch() — would split)
    new_session = (
        F.when(
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
    )
    with_session = events.select(
        "user_id", "event_id", "ts", "value",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "5 minutes", watermark: str | None = "30 minutes"
) -> DataFrame:
    """Streaming-native sessionization: ``session_window`` merges events into
    dynamic-length windows per key; state closes when the watermark passes
    session end + gap."""
    df = _with_optional_watermark(events, "ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event_id — dedup-FOREVER semantics: a
    replay is dropped no matter how late it arrives (even with a different
    event time, the at-least-once-redelivery case). The cost is UNBOUNDED
    state: dropDuplicates only evicts state when the event-time column is
    part of the dedup key, so this keeps one state row per id for the
    stream's lifetime — fine for bounded id spaces or bounded runs (the
    driver's availableNow replays), NOT for unbounded key cardinality at
    100 TB/day. For that, use ``dedup_events_stream_within_watermark``
    (state provably evicted after the delay) — the production-bounded
    sibling registered alongside."""
    df = _with_optional_watermark(events, "ts", watermark)
    return df.dropDuplicates(["event_id"])


def dedup_events_stream_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """State-BOUNDED streaming dedup (``dropDuplicatesWithinWatermark``,
    Spark 3.5+): a key's state row is guaranteed evicted once the watermark
    passes its event time + delay, trading "dedup forever" for provably
    bounded state — the variant that survives unbounded key cardinality at
    100 TB/day. Duplicates must arrive within the watermark delay to be
    caught (true for replay/at-least-once-delivery dedup, the dominant
    production case)."""
    df = _with_optional_watermark(events, "ts", watermark)
    return df.dropDuplicatesWithinWatermark(["event_id"])


def chained_daily_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly tumbling aggregation chained into a daily window-of-window
    aggregation INSIDE one streaming query — the multiple-stateful-operators
    pipeline (Spark 3.4+, append mode only). The second groupBy windows over
    the first's window column (``F.window(w, '1 day')``), so the watermark
    propagates through both operators and each day finalizes exactly when
    the watermark passes its end.

    Why it matters at scale: the alternative is two queries with an
    intermediate sink — double the checkpoint I/O and an extra end-to-end
    latency hop. Chaining keeps the hourly state and the daily state in one
    state store lifecycle. The hourly partials are decimal sums (exact,
    mergeable), so the day total is bitwise equal to a direct daily sum —
    which is precisely what the batch oracle computes.

    Batch semantics differ at the tail: a streaming append run only emits
    days the final watermark has sealed (day_end <= max event time −
    watermark delay); the oracle applies the same cutoff.
    """
    df = _with_optional_watermark(events, "ts", watermark)
    hourly = df.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n_hourly"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("vd"),
    )
    return (
        hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"))
        .agg(
            F.sum("n_hourly").cast("bigint").alias("n_events"),
            F.round(F.sum("vd"), 2).cast("double").alias("total_value"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            F.col("d.end").alias("day_end"),
            "n_events",
            "total_value",
        )
    )
