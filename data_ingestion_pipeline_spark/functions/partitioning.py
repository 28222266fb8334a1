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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fan_out", "salted_join", "block_grid_sides"]


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the default parallelism if it currently has
    fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: scatter the big side's hot keys over ``salt``
    sub-keys and replicate the small side to match.

    A plain shuffle join sends every row of a hot key to ONE reducer; one
    straggler task then bounds the stage. Salting appends a pseudo-random
    salt to the big side's key and explodes the small side ``salt``× (one
    row per salt value), so a hot key's rows spread over ``salt`` reducers.
    Join output is identical to the unsalted join — the salt column is an
    equi-key on both sides and dropped afterward.

    Complements AQE's skew-join splitting (which only handles *sort-merge*
    joins post-shuffle): salting also works for shuffled-hash joins,
    streaming joins, and cases where one key alone exceeds a task's memory.
    Use for big⋈medium where broadcast is off the table; ``how`` supports
    the big-side-preserving joins (inner / left).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join preserves the big side: inner/left only")
    salt_col = F.pmod(F.xxhash64(F.rand(seed=41)), F.lit(salt)).cast("int")
    big_s = big.withColumn("_salt", salt_col)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [*keys, "_salt"], how)
    return out.drop("_salt")


def block_grid_sides(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_blocks: int,
    triangular: bool,
) -> tuple[DataFrame, DataFrame]:
    """The shared replication step of the blocked cogrouped-BLAS kernels
    (``dedup/embedding.cosine_pairs_blas`` — triangular grid, undirected
    pairs — and ``similarity/knn.knn_graph`` — full grid, directed
    per-row top-k): rows get a crc32 block id, and each side replicates
    against a broadcast block grid so every grid cell cogroups one (left
    block, right block) pair for a single matmul.

    Returns (left, right) frames with columns (bx, by, _id, _v) — the
    caller's kernel owns scoring. Distinct aliases per side because both
    frames share one lineage and an unqualified self-cogroup trips the
    ambiguity check."""
    from data_ingestion_pipeline_spark.functions.vector import as_double_array

    spark = df.sparkSession
    sides = df.select(
        F.col(id_col).alias("_id"),
        as_double_array(F.col(vec_col)).alias("_v"),
    ).withColumn(
        "_blk", (F.crc32(F.col("_id").cast("string")) % n_blocks).cast("int")
    )
    grid = spark.createDataFrame(
        [
            (x, y)
            for x in range(n_blocks)
            for y in range(n_blocks)
            if x <= y or not triangular
        ],
        "bx int, by int",
    )

    def replicated(side: str, key: str) -> DataFrame:
        return (
            sides.alias(side)
            .join(
                F.broadcast(grid.alias(f"g_{side}")),
                F.col(f"{side}._blk") == F.col(f"g_{side}.{key}"),
            )
            .select(
                F.col(f"g_{side}.bx").alias("bx"),
                F.col(f"g_{side}.by").alias("by"),
                F.col(f"{side}._id").alias("_id"),
                F.col(f"{side}._v").alias("_v"),
            )
        )

    return replicated("sa", "bx"), replicated("sb", "by")
