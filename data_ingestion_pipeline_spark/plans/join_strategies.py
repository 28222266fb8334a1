"""Size-gated join-strategy helpers.

An unconditional ``F.broadcast(dim)`` is correct only while the build side
stays under the executor/driver broadcast ceiling. For a FILTERED dimension
(e.g. one region's customers) that holds at benchmark shapes but not at a
100x scale-up — the filtered side grows with the table, and a hinted
broadcast bypasses Spark's own size check, OOMing the driver instead of
degrading to a shuffle join. ``broadcast_if_small`` keeps the hint a
statistics-backed decision: hint only when Catalyst's own estimate of the
OPTIMIZED sub-plan (post filter/projection pruning) fits the configured
``spark.sql.autoBroadcastJoinThreshold``; otherwise return the frame
unhinted and let the planner pick sort-merge / shuffled-hash (and AQE
re-plan at runtime). Estimation is driver-side plan analysis only — no job
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_THRESHOLD = 10 * 1024 * 1024  # Spark's autoBroadcastJoinThreshold default


def auto_broadcast_threshold(spark) -> int:
    """The session's broadcast ceiling in bytes (-1 = user disabled
    auto-broadcast; we honor that by never hinting)."""
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", str(_DEFAULT_THRESHOLD))
    try:
        return int(raw)
    except ValueError:
        # "10MB"-style byte strings: delegate to Spark's own parser
        return int(
            spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        )


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized plan of ``df`` —
    the same statistic the planner itself consults, so the gate and the
    planner cannot disagree on what "small" means."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """``F.broadcast(df)`` when the optimized-plan estimate fits the
    threshold (session ceiling by default), else ``df`` unchanged — the
    join then plans as sort-merge/shuffled-hash on the join key, which is
    the correct strategy for a dimension that outgrew the ceiling."""
    if threshold_bytes is None:
        threshold_bytes = auto_broadcast_threshold(df.sparkSession)
    if threshold_bytes < 0:
        return df
    if plan_size_estimate(df) <= threshold_bytes:
        return F.broadcast(df)
    return df
