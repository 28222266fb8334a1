"""Per-basket co-occurrence pair generation.

The co-purchase graph queries (PageRank, k-core, LPA, triangle census,
lift/cosine mining, Adamic-Adar, k-hop, assortativity, transitivity,
local clustering) all start from the same relation: the oriented pair set
``(a < b)`` of parts sharing an order. The original build was

    po = lineitem.select(ok, pk).distinct()          -- Exchange(ok, pk)
    a JOIN b ON ok, filter(a < b)                    -- Exchange(ok) x2
                                                     -- (self-join; the two
                                                     --  projected sides don't
                                                     --  reuse one exchange)

i.e. up to three exchanges of the fact projection plus a join whose
fan-out re-materializes k rows per basket twice. ``basket_pairs`` produces
the identical multiset with ONE exchange and no join (guide §2.4 "remove
shuffles outright", §1.2 "the distributed algorithm first"):

    groupBy(ok).agg(sort_array(collect_set(pk)))     -- Exchange(ok) only
    explode(pair-expansion over the sorted set)      -- narrow

``collect_set`` subsumes the ``distinct`` (it dedups items within the
basket), the sorted array makes the ``x < y`` orientation a position
predicate, and the expansion emits each basket's k(k-1)/2 oriented pairs
exactly once — so ``groupBy(a, b).count`` over the result is the same
support count the self-join produced. Baskets are size-bounded (order
lines), so the per-row expansion is O(k²) with tiny k and there is no
skew; at 100 TB the saved exchanges are corpus-sized.

The explicit ``repartition(shuffle.partitions, order_col)`` serves two
purposes: locally the single-row-group fixture scans as 1-3 tasks and the
aggregate would otherwise run on 1-3 of 32 cores (the ``fan_out`` regime,
functions/partitioning.py); and since hash(order_col) partitioning
satisfies the aggregate's distribution, the groupBy introduces NO second
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["basket_pairs"]

# k(k-1)/2 oriented pairs from the sorted item array: element i pairs with
# every later element (slice is 1-based; i is the 0-based lambda index).
_PAIR_EXPR = (
    "flatten(transform(_items, (x, i) -> "
    "transform(slice(_items, i + 2, size(_items) - i - 1), "
    "y -> struct(x AS a, y AS b))))"
)


def basket_pairs(
    df: DataFrame,
    order_col: str,
    item_col: str,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Oriented per-basket co-occurrence pairs: one row per (basket,
    unordered item pair), with ``a < b`` (item type preserved). Multiset-
    identical to ``SELECT DISTINCT order, item`` self-joined on the order
    key with ``a < b`` — one exchange instead of three, no join."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    baskets = (
        df.select(order_col, item_col)
        .repartition(n, order_col)
        .groupBy(order_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("_items"))
    )
    return baskets.select(F.explode(F.expr(_PAIR_EXPR)).alias("_p")).select(
        F.col("_p.a").alias(a), F.col("_p.b").alias(b)
    )
