"""Compute-vs-IO partition sizing.

Parquet scan partitioning is sized by *bytes* (``maxPartitionBytes``), which
is right when cost ∝ bytes read. CPU-dense per-row operators (shingling,
MinHash, per-pair vector math, Arrow-batched decode) have cost ∝ rows ×
expression weight — a few hundred KB of compressed text can be minutes of
compute, and a single-file fixture then runs on one core while 31 idle.

``fan_out`` is the explicit boundary between the two regimes: repartition
up to the session's parallelism *only when the scan produced fewer
partitions*. On a real cluster where inputs already split into thousands of
tasks it's a no-op; the check costs a plan analysis, not a job. The shuffle
it may introduce moves the *narrow* pre-explosion rows (cheapest point in
the pipeline), never the exploded/widened intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out"]


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the default parallelism if it currently has
    fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
