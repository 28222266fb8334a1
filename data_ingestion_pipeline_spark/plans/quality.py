"""Declarative data-quality checks — the reference's "Implement data
quality checks" future-work item (/root/reference/README.md:167-169),
realized Spark-style.

A check suite is a list of named boolean expressions ("rule holds for this
row"). Evaluation is ONE pass: every rule becomes a conditional count in a
single aggregate — no per-rule jobs, no driver-side row loops, cost
independent of rule count. Referential rules (FK existence) are expressed
as anti-join counts — set-based, like everything else in this engine.

Severity is a caller policy: the suite returns violation counts; gating
(fail the pipeline / quarantine rows / log) composes on top. ``violations``
returns the offending rows for quarantine routing.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_rules", "violations", "fk_violations"]


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate) per rule — one aggregate
    pass over ``df``. A NULL rule result counts as a violation (unknown is
    not compliant)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("_n")]
    for name, expr in rules.items():
        aggs.append(
            F.sum(F.when(expr.isNull() | ~expr, 1).otherwise(0)).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("_n").cast("bigint").alias("n_rows"),
                        # backtick-quote: a rule name with a dot would
                        # otherwise parse as struct-field access
                        F.col(f"`_v_{name}`").cast("bigint").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        "r.rule",
        "r.n_rows",
        "r.n_violations",
        F.round(F.col("r.n_violations") / F.col("r.n_rows"), 6).alias("violation_rate"),
    )


def violations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Rows breaking ANY rule, tagged with the list of broken rule names —
    the quarantine route."""
    broken = F.filter(
        F.array(
            *[
                F.when(expr.isNull() | ~expr, F.lit(name)).otherwise(F.lit(None))
                for name, expr in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("broken_rules", broken).filter(F.size("broken_rules") > 0)


def fk_violations(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent — referential integrity as a
    left-anti join (never an IN-list; SURVEY.md §2.3 F1)."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)), [child_key], "left_anti"
    )
