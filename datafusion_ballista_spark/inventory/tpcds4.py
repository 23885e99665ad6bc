"""TPC-DS-shape mini-suite, tranche 4 (q59/q65/q70/q98) — continues
inventory/tpcds3.py toward the reference's 99-query CI gate.

Shapes (fixture mapping as before; store analog = l_suppkey % 100):

- q59: per-(store, week) day-of-week sales matrix (7-way conditional
  aggregate), self-joined year-over-year on (store, week) into per-dow
  ratios;
- q65: per-(store, item) revenue against 10% of the store's average item
  revenue — aggregate-over-aggregate threshold with the compare done as
  exact decimal cross-multiplication (rev*10*cnt <= sum_rev);
- q70: ranked semi-join (top-5 nations by profit feeding the main
  aggregate's filter) + ROLLUP(nation, supplier-group) with GROUPING()
  lochierarchy and rank-within-parent;
- q98: revenue share within class via a window over an aggregate
  (SUM(rev) OVER (PARTITION BY class) on grouped rows).

Scale notes (100 TB): dow matrices and revenue spines are single-shuffle
partial/final aggregates; the q59/q65 self-joins are spine-to-spine; the
q70 top-5 window runs over a 25-row nation aggregate (bounded — the
rollup itself is one grouping-sets aggregate); q98's share window
partitions by class over already-aggregated rows.

Determinism: decimal sums; ratio outputs divide in DOUBLE on both sides
(DuckDB decimal division returns DOUBLE); DuckDB ``dayofweek`` is
0=Sunday vs Spark's 1=Sunday — the oracle offsets its constants; unique
sort keys + LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, tables

_DOW = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]


# --------------------------------------------------------------------------
# q59 shape: weekly dow matrix, year-over-year ratio join.
# reference: benchmarks/queries-tpcds/q59.sql
# --------------------------------------------------------------------------
def tpcds_q59_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q59's wss spine: per (store, week) revenue split across the
    seven weekdays by conditional aggregation, then week w of 1995 joined
    to week w of 1996 per store and each weekday ratioed — the join is
    spine-to-spine on (store, week)."""
    t = tables(spark, sf, "lineitem", "orders")
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        (F.col("l_suppkey") % 100).alias("store"),
        F.year("o_orderdate").alias("y"),
        F.weekofyear("o_orderdate").alias("wk"),
        F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday .. 7=Saturday
        D("l_extendedprice").alias("price"),
    )
    wss = base.groupBy("store", "y", "wk").agg(
        *[
            F.sum(F.when(F.col("dow") == i + 1, F.col("price"))).alias(
                f"{d}_sales"
            )
            for i, d in enumerate(_DOW)
        ]
    )
    y1 = wss.where(F.col("y") == 1995)
    y2 = wss.where(F.col("y") == 1996).select(
        F.col("store").alias("store2"),
        F.col("wk").alias("wk2"),
        *[F.col(f"{d}_sales").alias(f"{d}_sales2") for d in _DOW],
    )
    j = y1.join(
        y2, (F.col("store") == F.col("store2")) & (F.col("wk") == F.col("wk2"))
    )
    return (
        j.select(
            "store",
            "wk",
            *[
                F.round(
                    F.col(f"{d}_sales").cast("double")
                    / F.col(f"{d}_sales2").cast("double"),
                    6,
                ).alias(f"{d}_ratio")
                for d in _DOW
            ],
        )
        .orderBy("store", "wk")
        .limit(100)
    )


def _q59_dow_sql(i: int, d: str) -> str:
    # DuckDB dayofweek: 0=Sunday .. 6=Saturday (Spark is 1..7)
    return (
        f"SUM(CASE WHEN dayofweek(o_orderdate) = {i} THEN "
        f"CAST(l_extendedprice AS DECIMAL(18,2)) END) AS {d}_sales"
    )


TPCDS_Q59_SQL = (
    """
WITH wss AS (
  SELECT l_suppkey % 100 AS store, year(o_orderdate) AS y,
         weekofyear(o_orderdate) AS wk,
         """
    + ",\n         ".join(_q59_dow_sql(i, d) for i, d in enumerate(_DOW))
    + """
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2, 3)
SELECT y1.store, y1.wk,
       """
    + ",\n       ".join(
        f"ROUND(y1.{d}_sales / y2.{d}_sales, 6) AS {d}_ratio" for d in _DOW
    )
    + """
FROM wss y1 JOIN wss y2 ON y1.store = y2.store AND y1.wk = y2.wk
WHERE y1.y = 1995 AND y2.y = 1996
ORDER BY y1.store, y1.wk
LIMIT 100
"""
)


# --------------------------------------------------------------------------
# q65 shape: revenue below 10% of the store's average item revenue.
# reference: benchmarks/queries-tpcds/q65.sql
# --------------------------------------------------------------------------
def tpcds_q65_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q65's slow-mover report: per-(store, item) revenue spine, the
    per-store average item revenue derived FROM that spine (aggregate of
    an aggregate), and items earning at most 10% of their store's
    average — compared as rev*10*cnt <= sum_rev, exact in decimal/int,
    so no float threshold exists on either engine."""
    t = tables(spark, sf, "lineitem", "part")
    sc = (
        t.lineitem.where(F.year("l_shipdate") == 1995)
        .groupBy(
            (F.col("l_suppkey") % 100).alias("store"),
            F.col("l_partkey"),
        )
        .agg(F.sum(D("l_extendedprice")).alias("rev"))
    )
    sb = sc.groupBy(F.col("store").alias("store_b")).agg(
        F.sum("rev").alias("sum_rev"), F.count(F.lit(1)).alias("cnt")
    )
    j = sc.join(sb, F.col("store") == F.col("store_b")).where(
        F.col("rev") * 10 * F.col("cnt") <= F.col("sum_rev")
    )
    return (
        j.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "store",
            "p_name",
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy("store", "l_partkey")
        .limit(100)
    )


TPCDS_Q65_SQL = """
WITH sc AS (
  SELECT l_suppkey % 100 AS store, l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem WHERE year(l_shipdate) = 1995
  GROUP BY 1, 2),
sb AS (
  SELECT store, SUM(rev) AS sum_rev, COUNT(*) AS cnt
  FROM sc GROUP BY 1)
SELECT sc.store, p_name, sc.l_partkey, CAST(rev AS DOUBLE) AS revenue
FROM sc JOIN sb ON sc.store = sb.store
JOIN part ON sc.l_partkey = p_partkey
WHERE rev * 10 * cnt <= sum_rev
ORDER BY sc.store, sc.l_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q70 shape: ranked semi-join feeding ROLLUP + rank-within-parent.
# reference: benchmarks/queries-tpcds/q70.sql
# --------------------------------------------------------------------------
def tpcds_q70_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q70's two-stage ranking: nations ranked by total profit (the
    subquery's rank <= 5 semi-join — a window over a 25-row nation
    aggregate, bounded), then ROLLUP(nation, supplier-group) over only
    the qualifying nations with GROUPING() lochierarchy and a rank within
    each parent level."""
    t = tables(spark, sf, "lineitem", "supplier", "nation")
    profit = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            (F.col("s_suppkey") % 10).alias("sgrp"),
            D(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4
            ).alias("p"),
        )
    )
    by_nation = profit.groupBy("n_name").agg(F.sum("p").alias("tot"))
    top5 = (
        by_nation.withColumn(
            "rk",
            F.rank().over(Window.orderBy(F.desc("tot"), F.asc("n_name"))),
        )
        .where(F.col("rk") <= 5)
        .select(F.col("n_name").alias("top_nation"))
    )
    rolled = (
        profit.join(top5, F.col("n_name") == F.col("top_nation"), "left_semi")
        .rollup("n_name", "sgrp")
        .agg(
            F.sum("p").alias("total_sum"),
            (F.grouping("n_name") + F.grouping("sgrp")).alias("lochierarchy"),
            F.grouping("sgrp").alias("g_s"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_s") == 1, F.lit(None)).otherwise(F.col("n_name")),
    ).orderBy(
        F.desc("total_sum"),
        F.asc_nulls_first("sgrp"),
        F.asc_nulls_first("n_name"),
    )
    return (
        rolled.select(
            F.col("total_sum").cast("double").alias("total_sum"),
            "n_name",
            "sgrp",
            "lochierarchy",
            F.row_number().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("n_name"),
            "rank_within_parent",
        )
        .limit(100)
    )


TPCDS_Q70_SQL = """
WITH profit AS (
  SELECT n_name, s_suppkey % 10 AS sgrp,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS p
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey),
top5 AS (
  SELECT n_name FROM (
    SELECT n_name,
           RANK() OVER (ORDER BY SUM(p) DESC, n_name) AS rk
    FROM profit GROUP BY n_name) t
  WHERE rk <= 5),
rolled AS (
  SELECT SUM(p) AS total_sum, n_name, sgrp,
         GROUPING(n_name) + GROUPING(sgrp) AS lochierarchy,
         GROUPING(sgrp) AS g_s
  FROM profit
  WHERE n_name IN (SELECT n_name FROM top5)
  GROUP BY ROLLUP (n_name, sgrp))
SELECT CAST(total_sum AS DOUBLE) AS total_sum, n_name, sgrp, lochierarchy,
       ROW_NUMBER() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN g_s = 1 THEN NULL ELSE n_name END
         ORDER BY total_sum DESC, sgrp ASC NULLS FIRST,
                  n_name ASC NULLS FIRST)
         AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, n_name ASC NULLS FIRST, rank_within_parent
LIMIT 100
"""


# --------------------------------------------------------------------------
# q98 shape: revenue share within class via window over aggregate.
# reference: benchmarks/queries-tpcds/q98.sql
# --------------------------------------------------------------------------
def tpcds_q98_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q98's itemrevenue report: revenue per (type, brand) with each
    row's share of its type's total computed by a SUM window OVER the
    grouped rows (window-over-aggregate, partitioned by class — one
    shuffle on the class key)."""
    t = tables(spark, sf, "lineitem", "part")
    rev = (
        t.lineitem.where(F.year("l_shipdate") == 1995)
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(
                D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)
            ).alias("itemrevenue")
        )
    )
    w = Window.partitionBy("p_type")
    return (
        rev.select(
            "p_type",
            "p_brand",
            F.col("itemrevenue").cast("double").alias("itemrevenue"),
            F.round(
                F.col("itemrevenue").cast("double")
                * 100
                / F.sum("itemrevenue").over(w).cast("double"),
                6,
            ).alias("revenueratio"),
        )
        .orderBy("p_type", "p_brand")
        .limit(1000)
    )


TPCDS_Q98_SQL = """
WITH rev AS (
  SELECT p_type, p_brand,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
           AS itemrevenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1995
  GROUP BY 1, 2)
SELECT p_type, p_brand, CAST(itemrevenue AS DOUBLE) AS itemrevenue,
       ROUND(CAST(itemrevenue AS DOUBLE) * 100
             / CAST(SUM(itemrevenue) OVER (PARTITION BY p_type) AS DOUBLE),
             6) AS revenueratio
FROM rev
ORDER BY p_type, p_brand
LIMIT 1000
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q59_shape": QuerySpec(tpcds_q59_shape, TPCDS_Q59_SQL),
    "tpcds_q65_shape": QuerySpec(tpcds_q65_shape, TPCDS_Q65_SQL),
    "tpcds_q70_shape": QuerySpec(tpcds_q70_shape, TPCDS_Q70_SQL),
    "tpcds_q98_shape": QuerySpec(tpcds_q98_shape, TPCDS_Q98_SQL),
}
