"""Classic TPC-H query shapes (Q1/Q3/Q5/Q8/Q10) over the synthetic star
schema — the canonical multi-join benchmark suite, adapted to the columns
this corpus ships (no o_shippriority / partsupp; nations are NATION_k).

These are the five most structurally distinct TPC-H plans and together
they exercise exactly the shapes the rest of the ledger's single-purpose
reports don't combine: full-scan multi-aggregate with a pushed range
predicate (Q1), selective dim-filtered fact-fact join + top-k (Q3), a
six-table join closed by an equality constraint BETWEEN two dimensions
(customer nation = supplier nation, Q5), conditional market-share over a
seven-relation join (Q8), and a returned-items top-k customer report
(Q10).

Scale posture (100 TB): every dimension side (region 5, nation 25,
supplier 100, part 2k, filtered customer ≤ dim) broadcasts — the only
shuffles are the orders⋈lineitem fact-fact hash join on l_orderkey and
the final group-by keys; all date/flag/segment predicates sit directly on
scan columns so parquet row-group pruning and min/max skipping do the
heavy lifting before a single join row materializes. Money aggregates use
the repo-wide exact-decimal discipline (order-independent, oracle-equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.numeric import dec_sum
from data_ingestion_pipeline_spark.plans.join_strategies import broadcast_if_small
from data_ingestion_pipeline_spark.sources.catalog import load_table

__all__ = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "TPCH_Q1_PRICING_SUMMARY_ORACLE",
    "TPCH_Q3_SHIPPING_PRIORITY_ORACLE",
    "TPCH_Q5_LOCAL_SUPPLIER_VOLUME_ORACLE",
    "TPCH_Q8_MARKET_SHARE_ORACLE",
    "TPCH_Q10_RETURNED_ITEMS_ORACLE",
]


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report — per (returnflag, linestatus)
    sums of quantity / base price / discounted price / charge, the three
    averages, and the row count, under a shipdate cutoff.

    The benchmark's scan-throughput yardstick: ONE pass, ONE shuffle of
    six-cell aggregate states over a 6-group key. The cutoff is a plain
    scan predicate (PushedFilters), and only 7 of 11 lineitem columns are
    read. All four money sums are exact decimal; the averages divide the
    decimal sums by the bigint count (double division, both engines)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1999-12-01"))
    )
    charge = _disc_price() * (F.lit(1.0) + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(dec_sum(F.col("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.round(dec_sum(F.col("l_extendedprice")), 2)
        .cast("double")
        .alias("sum_base_price"),
        F.round(dec_sum(_disc_price(), 38, 12), 2)
        .cast("double")
        .alias("sum_disc_price"),
        F.round(dec_sum(charge, 38, 12), 2).cast("double").alias("sum_charge"),
        dec_sum(F.col("l_quantity")).alias("_sq"),
        dec_sum(F.col("l_extendedprice")).alias("_sp"),
        dec_sum(F.col("l_discount"), 18, 12).alias("_sd"),
        F.count("*").cast("bigint").alias("count_order"),
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.round(F.col("_sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("_sp").cast("double") / n, 6).alias("avg_price"),
        F.round(F.col("_sd").cast("double") / n, 6).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


TPCH_Q1_PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,12))), 2) AS DOUBLE)
           AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           * (1.0 + l_tax) AS DECIMAL(38,12))), 2) AS DOUBLE)
           AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market
    segment — orders placed before a date whose lineitems ship after it
    (o_orderpriority stands in for the schema's missing o_shippriority).

    Plan: the BUILDING customer keys broadcast into the orders scan
    (date predicate pushed), the surviving orders hash-join lineitem on
    l_orderkey (the one fact-fact shuffle), and the head is a bounded
    TakeOrdered with deterministic (revenue, date, key) sort keys — never
    a global sort of the aggregate."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        # size-gated (round-7 verdict ask #4): the segment-filtered customer
        # map grows with the table — hint only while Catalyst's estimate
        # fits the session ceiling, else fall back to a shuffle join
        orders.join(broadcast_if_small(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(dec_sum(_disc_price(), 38, 12), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


TPCH_Q3_SHIPPING_PRIORITY_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,12))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue per nation from LOCAL suppliers — lineitems of
    one region's customers' 1996 orders, counted only when the supplier
    sits in the customer's own nation. The structurally interesting bit
    is the closing equality between two dimension attributes
    (c_nationkey = s_nationkey), which no other ledger join has.

    Plan: region→nation→customer reduce to a broadcast key set; orders
    (date-pushed) pick up c_nationkey map-side; the single fact-fact
    shuffle joins lineitem on l_orderkey; supplier (100 rows) broadcasts
    with the two-column (l_suppkey, nationkey) condition closing the
    cycle — so the 'local' constraint costs zero extra shuffles."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    local_cust = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            cust.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        # size-gated: region-filtered customers (ask #4) — see Q3
        orders.join(broadcast_if_small(local_cust), orders.o_custkey == F.col("c_custkey"))
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(dec_sum(_disc_price(), 38, 12), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


TPCH_Q5_LOCAL_SUPPLIER_VOLUME_ORACLE = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,12))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1's share of AMERICA's ECONOMY-part order volume
    per year — the conditional-aggregate-over-seven-relations shape:
    share(year) = Σ(volume where supplier nation = NATION_1) / Σ(volume).

    Plan: part (type-filtered) and supplier⋈nation broadcast into the
    lineitem scan; orders (date-pushed) joins customer⋈nation⋈region
    broadcast-side to keep only AMERICA buyers; the fact-fact l_orderkey
    shuffle is again the only big exchange. Numerator and denominator are
    both exact decimal sums; the share divides them as doubles."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    s_nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    c_nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    america_cust = cust.join(
        F.broadcast(
            c_nation.join(
                F.broadcast(region), c_nation.n_regionkey == region.r_regionkey
            )
        ),
        cust.c_nationkey == c_nation.n_nationkey,
    ).select("c_custkey")
    vol = _disc_price()
    return (
        # size-gated: region-filtered customers (ask #4) — see Q3
        orders.join(
            broadcast_if_small(america_cust), orders.o_custkey == F.col("c_custkey")
        )
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(s_nation), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                dec_sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                        F.lit(0.0)
                    ),
                    38,
                    12,
                ),
                2,
            )
            .cast("double")
            .alias("nation_volume"),
            F.round(dec_sum(vol, 38, 12), 2).cast("double").alias("total_volume"),
            (
                dec_sum(
                    F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                        F.lit(0.0)
                    ),
                    38,
                    12,
                ).cast("double")
                / dec_sum(vol, 38, 12).cast("double")
            ).alias("_share"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            F.round("_share", 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


TPCH_Q8_MARKET_SHARE_ORACLE = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
                                THEN l_extendedprice * (1.0 - l_discount)
                                ELSE 0.0 END AS DECIMAL(38,12))), 2) AS DOUBLE)
           AS nation_volume,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,12))), 2) AS DOUBLE) AS total_volume,
       ROUND(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
                                THEN l_extendedprice * (1.0 - l_discount)
                                ELSE 0.0 END AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(38,12))) AS DOUBLE), 6) AS mkt_share
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'AMERICA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY o_year
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who lost the most revenue to returns
    in one quarter — returned (l_returnflag='R') lineitems of 1997-Q1
    orders, grouped per customer with their nation.

    Plan: quarter-pushed orders shuffle-join lineitem (returnflag pushed
    to the scan) on l_orderkey; the per-customer aggregate then joins
    customer⋈nation broadcast-side AFTER the group-by, so dimension
    payload columns never ride through the fact shuffle. Head = bounded
    TakeOrdered on (revenue desc, custkey)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(dec_sum(_disc_price(), 38, 12), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    dim = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        # size-gated (ask #4): dim here is ALL customers + nation — at a
        # 100x scale-up both sides are O(customers) and the right plan is
        # a shuffle join on custkey, which the gate degrades to
        per_cust.join(broadcast_if_small(dim), per_cust.o_custkey == dim.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


TPCH_Q10_RETURNED_ITEMS_ORACLE = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(38,12))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""
