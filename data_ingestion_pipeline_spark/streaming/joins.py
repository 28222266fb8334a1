"""Streaming joins — stream⋈stream (interval) and stream⋈static.

The reference's "real-time" items are aspirations (README.md:161-197); this
realizes the two join shapes Structured Streaming supports in production:

- **Stream-stream interval join**: both sides buffered in state, joined on
  an equi-key plus an event-time band. The watermarks + time bounds are not
  decoration — they are what lets Spark EVICT state: a view older than
  (purchase watermark - band) can never match a future purchase and is
  dropped, so state stays bounded at any input rate. Without the band the
  state grows forever.
- **Stream-static join**: each micro-batch hash/broadcast-joins against the
  static relation; no state at all. The static side is re-planned per
  batch, so a dimension table swapped via atomic pointer (ManagedTable) is
  picked up between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "purchases_with_recent_views",
    "purchases_with_recent_views_outer",
    "enrich_events_with_dim",
]


def purchases_with_recent_views(
    purchases: DataFrame,
    views: DataFrame,
    band: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner interval join: for each purchase, the same user's views within
    ``band`` before it. Works identically on batch frames (no watermark
    needed) and streaming frames (bounded state via watermark + band)."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    return p.join(v, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        # micros-diff then floor-divide: unix_timestamp() floors EACH side to
        # seconds first, which disagrees with an epoch-difference by ±1 when
        # the two fractional parts straddle a second boundary
        ((F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1_000_000)
        .cast("bigint")
        .alias("secs_before"),
    )


def purchases_with_recent_views_outer(
    purchases: DataFrame,
    views: DataFrame,
    band: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER interval join: every purchase, with NULL view columns when
    no same-user view landed in the band before it.

    The streaming-specific semantics ride on the watermark: an unmatched
    purchase is held in state until the watermark proves no in-band view
    can still arrive, THEN emits with nulls — so null rows are correct
    statements, not timing accidents. Purchases younger than
    watermark + band at end-of-input stay pending (a finite availableNow
    run never finalizes them); callers comparing against a batch oracle
    must restrict both sides to the finalized region (see
    ``streaming_interval_left_join_events``)."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    return p.join(v, cond, "left_outer").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        F.col("p_ts"),
        "view_id",
        ((F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1_000_000)
        .cast("bigint")
        .alias("secs_before"),
    )


def enrich_events_with_dim(events: DataFrame, dim: DataFrame, on) -> DataFrame:
    """Stream-static enrichment: broadcast the dimension into every
    micro-batch — a map-side join with zero streaming state."""
    return events.join(F.broadcast(dim), on, "inner")


def purchases_views_interval_full_outer(
    purchases: DataFrame,
    views: DataFrame,
    band: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER interval join: matched purchase–view pairs, plus every
    unmatched purchase (NULL view) AND every unmatched view (NULL
    purchase) — the complete reconciliation view of the two streams
    (Spark supports full-outer stream-stream joins with watermarks +
    a time-bound condition since 3.1).

    Both null directions ride the watermark: an unmatched purchase
    emits once no in-band view can still arrive, an unmatched view once
    no purchase inside [v_ts, v_ts + band] can. A finite availableNow
    run never finalizes EITHER side younger than watermark + band at
    end-of-input; callers comparing against a batch oracle must
    restrict the OUTPUT (never the join inputs — pre-filtering would
    re-label late matches as unmatched) to the finalized region, on the
    side each row actually carries (see
    ``streaming_interval_full_outer_events``)."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    return p.join(v, cond, "full_outer").select(
        F.coalesce(F.col("p_user"), F.col("v_user")).alias("user_id"),
        "purchase_id",
        "view_id",
        F.col("p_ts"),
        F.col("v_ts"),
        ((F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 1_000_000)
        .cast("bigint")
        .alias("secs_before"),
    )
