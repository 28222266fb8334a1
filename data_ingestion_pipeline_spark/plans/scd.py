"""Slowly-changing-dimension (Type 2) maintenance and change-data-capture
MERGE — the lakehouse-side generalizations of the reference's upsert.

The reference's update path overwrites attribute values in place
(``flows/data_ingestion.py:166-175``) — history is lost. SCD2 keeps it: an
update closes the current version row (``valid_to`` = effective time,
``is_current`` = false) and appends a new current row. CDC-MERGE is the
same split logic emitting the *change feed* (insert / update pre+post
images) instead of the merged table — the feed downstream systems subscribe
to in a medallion pipeline.

Both are pure DataFrame plans: one hash join batch-vs-dimension on the key,
attribute comparison as an expression, union of the row classes. Shuffle
volume ∝ batch + matched-key rows, never table-scan-squared. At 100 TB the
dimension side is key-partitioned so the join prunes to matching partitions
(same lever as plans/merge.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "merge_changes"]


def _attrs_differ(attrs: Sequence[str]) -> F.Column:
    """NULL-safe any-attribute-changed predicate between ``b.`` and ``d.``."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"b.{a}").eqNullSafe(F.col(f"d.{a}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_ts: str,
) -> DataFrame:
    """Apply one change batch to an SCD2 dimension.

    ``dim``: (key, *attrs, valid_from, valid_to, is_current) — history rows.
    ``batch``: (key, *attrs) — the new attribute image per key (pre-deduped,
    one row per key; compose with plans/merge.py::dedupe_last_wins when the
    source has replays).
    ``effective_ts``: ISO timestamp literal stamping this batch.

    Row classes in the result:
    - history rows (is_current = false): untouched;
    - current rows whose key is absent from the batch or whose attributes
      are unchanged: untouched;
    - current rows superseded by a changed image: closed out
      (valid_to = effective_ts, is_current = false);
    - changed/new images: appended as the new current row
      (valid_from = effective_ts, valid_to = NULL, is_current = true).
    """
    eff = F.lit(effective_ts).cast("timestamp")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    b = batch.alias("b")
    d = current.alias("d")
    changed_keys = (
        b.join(d, F.col(f"b.{key}") == F.col(f"d.{key}"), "left")
        .filter(F.col(f"d.{key}").isNull() | _attrs_differ(attrs))
        .select(F.col(f"b.{key}").alias(key), *[F.col(f"b.{a}").alias(a) for a in attrs])
    )

    closed = (
        current.join(changed_keys.select(key), key, "left_semi")
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(changed_keys.select(key), key, "left_anti")
    opened = changed_keys.select(
        key,
        *attrs,
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened)
    )


def merge_changes(
    stored: DataFrame,
    batch: DataFrame,
    key: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Change feed of MERGEing ``batch`` into ``stored``: one row per change
    with ``op`` ∈ {insert, update_preimage, update_postimage}. Unchanged
    matches emit nothing. The merged table itself is ``stored ▷ batch ∪
    batch`` (plans/merge.py); this operator returns what a Delta change
    data feed would publish for the same commit."""
    b = batch.alias("b")
    d = stored.alias("d")
    joined = b.join(d, F.col(f"b.{key}") == F.col(f"d.{key}"), "left")
    inserts = joined.filter(F.col(f"d.{key}").isNull()).select(
        F.lit("insert").alias("op"),
        F.col(f"b.{key}").alias(key),
        *[F.col(f"b.{a}").alias(a) for a in attrs],
    )
    updated = joined.filter(F.col(f"d.{key}").isNotNull() & _attrs_differ(attrs))
    pre = updated.select(
        F.lit("update_preimage").alias("op"),
        F.col(f"d.{key}").alias(key),
        *[F.col(f"d.{a}").alias(a) for a in attrs],
    )
    post = updated.select(
        F.lit("update_postimage").alias("op"),
        F.col(f"b.{key}").alias(key),
        *[F.col(f"b.{a}").alias(a) for a in attrs],
    )
    return inserts.unionByName(pre).unionByName(post)
