"""TPC-DS-shape mini-suite, tranche 9 (q3/q7/q13/q15/q27/q62/q91) — the
remaining simple named families (inventory/tpcds8.py precedes).

- q3: year x brand revenue leaderboard under an item-type filter;
- q7 (q26 family): four-way average panel per brand under customer-
  segment and order-priority filters;
- q13: one-row multi-average under OR-of-AND demographic bands;
- q15: per-nation revenue where rows qualify through ANY of three
  heterogeneous predicates (key bucket, balance, order size);
- q27 (q86 family): ROLLUP(nation, brand) average panel;
- q62 (q99 family): ship-lag day-bucket histogram grouped by TWO dims
  (priority x linestatus);
- q91: returned-revenue loss report per (nation, segment, month).

All single-pass aggregates over bounded dim joins; determinism contract
as in the earlier tranches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, davg, tables

_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


def tpcds_q3_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q3: yearly brand revenue for one item type, ordered by year
    then exact-decimal revenue (brand tiebreak)."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    g = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_type").startswith("ECONOMY"))
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_brand")
        .agg(F.sum(_rev()).alias("sum_agg"))
    )
    return (
        g.orderBy("d_year", F.desc("sum_agg"), "p_brand")
        .limit(100)
        .select("d_year", "p_brand", F.col("sum_agg").cast("double").alias("sum_agg"))
    )


TPCDS_Q3_SQL = f"""
SELECT d_year, p_brand, CAST(sum_agg AS DOUBLE) AS sum_agg FROM (
  SELECT year(o_orderdate) AS d_year, p_brand, SUM({_REV_SQL}) AS sum_agg
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type LIKE 'ECONOMY%'
  GROUP BY 1, 2
  ORDER BY d_year, sum_agg DESC, p_brand
  LIMIT 100) t
"""


def tpcds_q7_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q7/q26: per-brand four-average panel (quantity, price,
    discount, revenue) for one customer segment buying at one order
    priority."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "part")
    g = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderpriority") == "3-MEDIUM")
        )
        .groupBy("p_brand")
        .agg(
            davg(D("l_quantity"), "agg1"),
            davg(D("l_extendedprice"), "agg2"),
            davg(D("l_discount"), "agg3"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return g.orderBy("p_brand").limit(100)


TPCDS_Q7_SQL = """
SELECT p_brand, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg1,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg2,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg3, COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '3-MEDIUM'
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
"""


def tpcds_q13_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q13: one-row average panel where each line qualifies through
    any of three (segment AND quantity-band) conjunctions."""
    t = tables(spark, sf, "lineitem", "orders", "customer")
    p = (
        ((F.col("c_mktsegment") == "BUILDING") & F.col("l_quantity").between(1, 20))
        | ((F.col("c_mktsegment") == "MACHINERY") & F.col("l_quantity").between(21, 35))
        | ((F.col("c_mktsegment") == "AUTOMOBILE") & F.col("l_quantity").between(36, 50))
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .where(p)
        .agg(
            davg(D("l_quantity"), "avg_qty"),
            davg(D("l_extendedprice"), "avg_price"),
            davg(D("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCDS_Q13_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 1 AND 20)
   OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 21 AND 35)
   OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 36 AND 50)
"""


def tpcds_q15_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q15: per-nation Q1-1995 revenue where a row qualifies through
    ANY of three heterogeneous predicates — a key bucket, a balance
    threshold, or an order-size threshold."""
    t = tables(spark, sf, "orders", "customer", "nation")
    q = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.year("o_orderdate") == 1995)
            & (F.quarter("o_orderdate") == 1)
            & (
                (F.col("c_custkey") % 100 < 5)
                | (F.col("c_acctbal") > 9000)
                | (F.col("o_totalprice") > 400000)
            )
        )
    )
    return (
        q.groupBy("n_name")
        .agg(
            F.sum(D("o_totalprice")).cast("double").alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


TPCDS_Q15_SQL = """
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_sales,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1
  AND (c_custkey % 100 < 5 OR c_acctbal > 9000 OR o_totalprice > 400000)
GROUP BY n_name
ORDER BY n_name
"""


def tpcds_q27_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q27/q86: ROLLUP(nation, brand) average panel for one customer
    segment — subtotals and grand total from one grouping-sets pass."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "nation", "part")
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("c_mktsegment") == "HOUSEHOLD")
    )
    return (
        base.rollup("n_name", "p_brand")
        .agg(
            davg(D("l_quantity"), "agg1"),
            davg(D("l_extendedprice"), "agg2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("p_brand"))
        .limit(200)
    )


TPCDS_Q27_SQL = """
SELECT n_name, p_brand, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg1,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg2, COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE c_mktsegment = 'HOUSEHOLD'
GROUP BY ROLLUP (n_name, p_brand)
ORDER BY n_name ASC NULLS FIRST, p_brand ASC NULLS FIRST
LIMIT 200
"""


def tpcds_q62_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q62: ship-lag day-bucket histogram grouped by TWO dims
    (priority x linestatus) — q99's bucket family with a wider grouping
    key."""
    t = tables(spark, sf, "lineitem", "orders")
    lag_d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("o_orderpriority", "l_linestatus", lag_d.alias("lag_d"))
    return (
        j.groupBy("o_orderpriority", "l_linestatus")
        .agg(
            F.sum(F.when(F.col("lag_d") <= 30, 1).otherwise(0)).alias("d30"),
            F.sum(
                F.when((F.col("lag_d") > 30) & (F.col("lag_d") <= 60), 1).otherwise(0)
            ).alias("d60"),
            F.sum(
                F.when((F.col("lag_d") > 60) & (F.col("lag_d") <= 90), 1).otherwise(0)
            ).alias("d90"),
            F.sum(F.when(F.col("lag_d") > 90, 1).otherwise(0)).alias("d_over_90"),
        )
        .orderBy("o_orderpriority", "l_linestatus")
    )


TPCDS_Q62_SQL = """
SELECT o_orderpriority, l_linestatus,
  CAST(SUM(CASE WHEN lag_d <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN lag_d > 30 AND lag_d <= 60 THEN 1 ELSE 0 END)
       AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN lag_d > 60 AND lag_d <= 90 THEN 1 ELSE 0 END)
       AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN lag_d > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_90
FROM (
  SELECT o_orderpriority, l_linestatus,
         date_diff('day', o_orderdate, l_shipdate) AS lag_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
GROUP BY o_orderpriority, l_linestatus
ORDER BY o_orderpriority, l_linestatus
"""


def tpcds_q91_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q91: returned-revenue loss per (nation, segment, month of
    1995) — the returns fact filtered and rolled up across three dims."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "nation")
    r = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        r.groupBy(
            "n_name",
            "c_mktsegment",
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.sum(_rev()).cast("double").alias("returns_loss"))
        .orderBy("n_name", "c_mktsegment", "m")
        .limit(200)
    )


TPCDS_Q91_SQL = f"""
SELECT n_name, c_mktsegment, month(o_orderdate) AS m,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS returns_loss
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R' AND year(o_orderdate) = 1995
GROUP BY 1, 2, 3
ORDER BY n_name, c_mktsegment, m
LIMIT 200
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q3_shape": QuerySpec(tpcds_q3_shape, TPCDS_Q3_SQL),
    "tpcds_q7_shape": QuerySpec(tpcds_q7_shape, TPCDS_Q7_SQL),
    "tpcds_q13_shape": QuerySpec(tpcds_q13_shape, TPCDS_Q13_SQL),
    "tpcds_q15_shape": QuerySpec(tpcds_q15_shape, TPCDS_Q15_SQL),
    "tpcds_q27_shape": QuerySpec(tpcds_q27_shape, TPCDS_Q27_SQL),
    "tpcds_q62_shape": QuerySpec(tpcds_q62_shape, TPCDS_Q62_SQL),
    "tpcds_q91_shape": QuerySpec(tpcds_q91_shape, TPCDS_Q91_SQL),
}
