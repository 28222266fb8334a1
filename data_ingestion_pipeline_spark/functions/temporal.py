"""Temporal joins Spark lacks natively: as-of and bounded range joins.

Both are reformulated as shuffle-friendly equi-joins — never a
nested-loop/theta join, which is what a naive inequality condition degrades
to in open-source Spark:

- **As-of join** (``asof_join_prev``): for each left row, the latest right
  row with ``right.ts < left.ts`` per key — the feature-lookup primitive
  ("most recent signal before this event"). Implemented with the
  union-then-window trick: tag both sides, union, and run
  ``last_value(ignorenulls)`` over a per-key time-ordered window. ONE
  shuffle (the window's partitionBy), no join at all, and state per row is
  O(1) — this shape survives any scale the window shuffle survives.
- **Range join** (``range_join_binned``): pairs with ``right.ts`` in
  ``[left.ts + lower, left.ts + upper]`` per key. Time is binned at the
  window width; the left side explodes the (few) bins its window overlaps,
  the right side lands in exactly one bin, and an equi-join on
  (key, bin) + an exact bounds filter does the rest. Each qualifying pair
  meets in exactly one bin — no post-join dedup. Candidate volume scales
  with bin occupancy, not |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_prev", "range_join_binned"]


def asof_join_prev(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + ``prev_<col>`` columns carrying the latest strictly
    earlier right row's values per key (NULL when no earlier right row).

    Tie discipline: right rows at the exact left timestamp do NOT match
    (strict ``<``); the union sorts rights after lefts at equal ts to get
    that for free. Multiple right rows at the same earlier instant resolve
    to the last in (ts, tag) order — deterministic for value columns that
    are functions of ts; add a tiebreak column to ``value_cols`` callers
    who need row-level determinism beyond that.
    """
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    # Left rows (_tag 0) sort BEFORE right rows (_tag 1) at the same
    # instant, so the preceding-rows window at a left row excludes
    # equal-timestamp right rows — that is what makes the join strict.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last-over-STRUCT, not last-over-value: ignorenulls on the bare value
    # would (a) skip a right row whose value is genuinely NULL — returning
    # a stale older value where as-of semantics (and DuckDB's ASOF JOIN)
    # say NULL — and (b) let a null-timestamp right row sort first and
    # match. The struct is non-null exactly when a VALID right row exists,
    # and carries its value whatever that value is.
    filled = u.select(
        "_tag",
        "_lrow",
        *[
            F.last(
                F.when(
                    (F.col("_tag") == 1) & F.col("_ts").isNotNull(),
                    F.struct(F.col(f"_rv_{c}").alias("v")),
                ),
                ignorenulls=True,
            )
            .over(w)
            .getField("v")
            .alias(f"prev_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_tag") == 0)
    return filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"prev_{c}") for c in value_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    bin_s: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right_ts − left_ts`` in
    ``[lower_s, upper_s]`` seconds, same key. Columns are prefixed l_/r_.

    ``bin_s`` defaults to the window span, so the left side explodes at
    most two bins; shrink it when right-side density per bin is the
    bottleneck (more, smaller bins → fewer false candidates per bin).
    """
    span = upper_s - lower_s
    if span < 0:
        raise ValueError("upper_s must be >= lower_s")
    bin_s = bin_s or max(span, 1)
    # Microsecond epoch arithmetic: second-truncating unix_timestamp would
    # shift sub-second timestamps across the bounds (and diverge from any
    # exact-interval external engine).
    lower_us, upper_us, bin_us = (
        lower_s * 1_000_000,
        upper_s * 1_000_000,
        bin_s * 1_000_000,
    )
    l_epoch = F.unix_micros(F.col(left_ts))
    r_epoch = F.unix_micros(F.col(right_ts))
    l = left.select(
        F.col(key).alias("_k"),
        l_epoch.alias("_lt"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((F.col("_lt") + lower_us) / bin_us),
                F.floor((F.col("_lt") + upper_us) / bin_us),
            )
        ),
    )
    r = right.select(
        F.col(key).alias("_k"),
        r_epoch.alias("_rt"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_rrow"),
    ).withColumn("_bin", F.floor(F.col("_rt") / bin_us))

    joined = l.join(r, ["_k", "_bin"]).filter(
        (F.col("_rt") >= F.col("_lt") + lower_us)
        & (F.col("_rt") <= F.col("_lt") + upper_us)
    )
    return joined.select(
        *[F.col(f"_lrow.{c}").alias(f"l_{c}") for c in left.columns],
        *[F.col(f"_rrow.{c}").alias(f"r_{c}") for c in right.columns],
    )
