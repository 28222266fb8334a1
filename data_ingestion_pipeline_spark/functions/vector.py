"""Vector math over ``array<float|double>`` columns — pure SQL expressions.

Embedding similarity at 100 TB must stay JVM-side: ``zip_with`` +
``aggregate`` fold sequentially over the array inside codegen, which both
avoids Python serde entirely and gives bit-reproducible results (the
sequential fold order matches DuckDB's list functions, verified bitwise in
the oracle suite). A pandas-UDF path would batch through Arrow but loses
cross-engine determinism; it's only worth it for matrix-shaped batch scoring
(see similarity/brute_force.py for the trade-off note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine", "as_double_array"]


def as_double_array(col: Column) -> Column:
    """Float32 embeddings are widened to double *before* arithmetic so both
    precision and fold order are pinned down (float accumulation would
    diverge from every external engine)."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
