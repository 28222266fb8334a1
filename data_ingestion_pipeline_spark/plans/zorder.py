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


_MAX_QUANTILE_EDGES = 256  # plan-literal bound, same policy as IVF centroids


def morton_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 10,
    quantile_skew: bool = True,
) -> Column:
    """Interleaved-bit Morton key over ``cols`` as a single long column.

    Each column is bucketed to ``bits`` bits. The grid adapts to the data:
    a roughly-uniform column uses ``width_bucket`` over its observed
    [min, max] (two literals in the plan); a SKEWED column — detected when
    the approximate median sits in the outer quarters of the range, i.e.
    a uniform grid would dump most rows into a few buckets and footer
    min/max would stop pruning on that dimension — uses approxQuantile
    edges instead, so every bucket holds ~equal mass regardless of the
    distribution. Edge count is capped at 256 plan literals (bounded
    driver state; the per-row rank is one array-filter loop over the
    sorted edges, runtime O(edges), not codegen terms).

    Bit j of column c lands at interleaved position ``j * len(cols) + c``.
    Total key width ``bits * len(cols)`` must stay < 63.
    """
    n = len(cols)
    if bits * n >= 63:
        raise ValueError("interleaved key must fit a signed long")
    # medians only when the skew escape hatch is on — percentile state is
    # the expensive accumulator in this stats pass
    med_aggs = (
        [
            F.percentile_approx(F.col(c).cast("double"), 0.5, 1000).alias(f"med_{i}")
            for i, c in enumerate(cols)
        ]
        if quantile_skew
        else []
    )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
        *med_aggs,
    ).collect()[0]
    key = F.lit(0).cast("long")
    n_buckets = 1 << bits
    for i, c in enumerate(cols):
        lo, hi = stats[f"lo_{i}"], stats[f"hi_{i}"]
        if lo is None:  # empty frame or all-NULL column: trivial layout,
            lo, hi = 0.0, 1.0  # every row keys to bucket 0 instead of crashing
        if hi <= lo:
            hi = lo + 1.0
        med = stats[f"med_{i}"] if quantile_skew else None
        med_frac = (med - lo) / (hi - lo) if med is not None else 0.5
        if quantile_skew and not 0.25 <= med_frac <= 0.75:
            m = min(n_buckets, _MAX_QUANTILE_EDGES)
            # scale the m-granular rank onto the full 2^bits range so the
            # HIGH interleave bits still split this dimension — a rank
            # stuck in [0, m) with m < 2^bits would zero the top bits and
            # hand the coarse file split entirely to the other columns
            rank = _quantile_rank(df, c, m) * (n_buckets // m)
        else:
            # width_bucket: [lo,hi) → 1..n_buckets (clamped), shift 0-based
            rank = (
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
                ).cast("long")
                - 1
            )
        rank = F.least(F.greatest(rank, F.lit(0)), F.lit(n_buckets - 1))
        for j in range(bits):
            bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * n + i)
    return key


def _quantile_rank(df: DataFrame, col: str, n_edges: int) -> Column:
    """Equal-mass bucket rank: position of the value among approxQuantile
    edges (sorted literal array; rank = #edges ≤ value, one runtime loop
    per row). Duplicate edges from point masses collapse, which is
    correct — identical values must share a bucket."""
    probs = [k / n_edges for k in range(1, n_edges)]
    edges = sorted(
        set(
            df.select(F.col(col).cast("double").alias("_q"))
            .stat.approxQuantile("_q", probs, 0.001)
        )
    )
    lit_edges = F.array(*[F.lit(float(e)) for e in edges])
    value = F.col(col).cast("double")
    return F.size(F.filter(lit_edges, lambda e: e <= value)).cast("long")


def zorder_frame(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits: int = 10,
    quantile_skew: bool = True,
) -> DataFrame:
    """``df`` re-laid-out as ``num_files`` range-partitions of the Morton
    key, rows sorted by it within each — ready to write. The key column is
    internal and dropped."""
    z = df.withColumn("_z", morton_key(df, cols, bits, quantile_skew))
    return (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
