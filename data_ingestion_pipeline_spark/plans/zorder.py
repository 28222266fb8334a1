"""Z-order (Morton) multi-dimensional clustering for file skipping.

``ManagedTable.sorted_overwrite`` range-clusters on ONE sort key: parquet
footers get disjoint min/max on that column, and predicates on anything
else skip nothing. Z-ordering interleaves the bits of several columns'
bucket ranks into one Morton key and range-clusters on THAT — each file
then covers a small hyper-rectangle of the combined space, so selective
predicates on ANY of the z-ordered columns (or several at once) prune
files from footer stats alone.

Construction is all expressions:
1. per column, a bounded rank in [0, 2^bits) via ``width_bucket`` over the
   column's observed min/max (two-row driver-side bounds query — O(1)
   state, same policy as IVF centroids; quantile bounds are the upgrade
   for skewed columns);
2. bit interleave as a sum of shifted bit-tests — 2·bits codegen terms,
   constant-folded literals;
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the Morton key —
   the exact mechanics of the single-key path, on the interleaved key.

The key is dropped before write; clustering is pure layout, invisible to
readers except through footer statistics. At 100 TB this is the OPTIMIZE
ZORDER BY story: one distributed rewrite, after which multi-dimensional
point/range queries read a small fraction of files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_key", "zorder_frame"]


def morton_key(df: DataFrame, cols: Sequence[str], bits: int = 10) -> Column:
    """Interleaved-bit Morton key over ``cols`` as a single long column.

    Each column is bucketed to ``bits`` bits with ``width_bucket`` over its
    observed [min, max] (uniform grid — adequate for roughly uniform keys;
    substitute approxQuantile edges for heavy skew). Bit j of column c
    lands at interleaved position ``j * len(cols) + c``. Total key width
    ``bits * len(cols)`` must stay < 63.
    """
    n = len(cols)
    if bits * n >= 63:
        raise ValueError("interleaved key must fit a signed long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    key = F.lit(0).cast("long")
    n_buckets = 1 << bits
    for i, c in enumerate(cols):
        lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
        if hi <= lo:
            hi = lo + 1.0
        # width_bucket: [lo,hi) → 1..n_buckets (clamped), shift to 0-based
        rank = (
            F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
            .cast("long")
            - 1
        )
        rank = F.least(F.greatest(rank, F.lit(0)), F.lit(n_buckets - 1))
        for j in range(bits):
            bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * n + i)
    return key


def zorder_frame(df: DataFrame, cols: Sequence[str], num_files: int, bits: int = 10) -> DataFrame:
    """``df`` re-laid-out as ``num_files`` range-partitions of the Morton
    key, rows sorted by it within each — ready to write. The key column is
    internal and dropped."""
    z = df.withColumn("_z", morton_key(df, cols, bits))
    return (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
