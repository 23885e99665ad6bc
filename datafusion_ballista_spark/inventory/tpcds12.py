"""TPC-DS-shape mini-suite, tranche 12 — the final 21 named variants
(q42/q43/q50/q53/q55/q56/q57/q60/q63/q68/q69/q71/q73/q74/q79/q81/q82/
q84/q85/q86/q89), completing a named analogue for every query in the
reference's 99-query CI gate (/root/reference/benchmarks/queries-tpcds/,
tpcds.yml:55-74). Each docstring names its family anchor; TPC-DS itself
generates these from shared templates (the q42/q52/q55 trio, the
q53/q63/q89 trio, the q33/q56/q60 trio, ...), and the analogues vary
exactly the same knobs: channel, grouping dim, date window, band.

Determinism and scale rules as in earlier tranches: decimal sums, DOUBLE
division on both sides, CAST(SUM-int AS BIGINT) oracle pins, unique sort
keys + LIMIT, no unbounded broadcast, aggregates before self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, davg, tables

_STORE, _WEB, _CATALOG = 0, 1, 2


def _chan(k: int):
    return F.col("l_linenumber") % 3 == k


def _chan_sql(k: int) -> str:
    return f"l_linenumber % 3 = {k}"


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"
_DOW = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


def _fact(spark, sf):
    t = tables(spark, sf, "lineitem", "orders")
    return t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))


# -- q42 (q3 family): year x type revenue leaderboard ----------------------
def tpcds_q42_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q3 family grouped by item type (ds q42)."""
    t = tables(spark, sf, "part")
    g = (
        _fact(spark, sf)
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_type")
        .agg(F.sum(_rev()).alias("sum_agg"))
    )
    return (
        g.orderBy("d_year", F.desc("sum_agg"), "p_type")
        .limit(100)
        .select("d_year", "p_type", F.col("sum_agg").cast("double").alias("sum_agg"))
    )


TPCDS_Q42_SQL = f"""
SELECT d_year, p_type, CAST(sum_agg AS DOUBLE) AS sum_agg FROM (
  SELECT year(o_orderdate) AS d_year, p_type, SUM({_REV_SQL}) AS sum_agg
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2 ORDER BY d_year, sum_agg DESC, p_type LIMIT 100) t
"""


# -- q43 (q59 family): per-store dow matrix, single year -------------------
def tpcds_q43_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q59 family without the year-over-year join (ds q43)."""
    base = _fact(spark, sf).where(F.year("o_orderdate") == 1995)
    g = base.groupBy((F.col("l_suppkey") % 100).alias("store")).agg(
        *[
            F.sum(
                F.when(F.dayofweek("o_orderdate") == i + 1, _rev())
                .otherwise(F.lit(0).cast("decimal(27,4)"))
            )
            .cast("double")
            .alias(f"{d}_sales")
            for i, d in enumerate(_DOW)
        ]
    )
    return g.orderBy("store").limit(100)


TPCDS_Q43_SQL = (
    "SELECT store, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN dayofweek(o_orderdate) = {i} THEN {_REV_SQL} "
        f"ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE) AS {d}_sales"
        for i, d in enumerate(_DOW)
    )
    + """
FROM (SELECT l_suppkey % 100 AS store, o_orderdate, l_extendedprice,
             l_discount
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) = 1995)
GROUP BY store ORDER BY store LIMIT 100
"""
)


# -- q50 (q62/q99 family): returned-line lag buckets by nation -------------
def tpcds_q50_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q99 family restricted to returned lines, grouped by supplier
    nation (ds q50's store-vs-return lag census)."""
    t = tables(spark, sf, "supplier", "nation")
    lag_d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = (
        _fact(spark, sf)
        .where(F.col("l_returnflag") == "R")
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", lag_d.alias("lag_d"))
    )
    return (
        j.groupBy("n_name")
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
        .orderBy("n_name")
    )


TPCDS_Q50_SQL = """
SELECT n_name,
  CAST(SUM(CASE WHEN lag_d <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN lag_d > 30 AND lag_d <= 60 THEN 1 ELSE 0 END)
       AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN lag_d > 60 AND lag_d <= 90 THEN 1 ELSE 0 END)
       AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN lag_d > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d_over_90
FROM (SELECT n_name, date_diff('day', o_orderdate, l_shipdate) AS lag_d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE l_returnflag = 'R')
GROUP BY n_name ORDER BY n_name
"""


# -- q53/q63/q89 trio (q47 family): window-over-agg deviation, no chain ----
def _deviation_shape(spark, sf, chan, group_col: str, group_expr) -> DataFrame:
    base = _fact(spark, sf).where(
        _chan(chan) & F.year("o_orderdate").isin(1995)
    )
    t = tables(spark, sf, "part")
    v1 = (
        base.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(group_expr.alias(group_col), F.quarter("o_orderdate").alias("q"))
        .agg(F.sum(_rev()).alias("sum_sales"))
        .withColumn(
            # exact decimal window SUM / COUNT (see tpcds3 q47 note)
            "avg_q_sales",
            F.sum("sum_sales").over(Window.partitionBy(group_col)).cast("double")
            / F.count(F.lit(1)).over(Window.partitionBy(group_col)),
        )
    )
    return (
        v1.where(
            (F.col("avg_q_sales") > 0)
            & (
                F.round(
                    F.abs(
                        F.col("sum_sales").cast("double")
                        - F.col("avg_q_sales").cast("double")
                    )
                    / F.col("avg_q_sales").cast("double"),
                    6,
                )
                > 0.1
            )
        )
        .select(
            group_col,
            "q",
            F.col("sum_sales").cast("double").alias("sum_sales"),
            F.round(F.col("avg_q_sales").cast("double"), 6).alias("avg_q_sales"),
        )
        .orderBy(group_col, "q")
        .limit(100)
    )


def _deviation_sql(chan: int, group_col: str, group_sql: str) -> str:
    return f"""
WITH v1 AS (
  SELECT {group_sql} AS {group_col}, quarter(o_orderdate) AS q,
         SUM({_REV_SQL}) AS sum_sales,
         CAST(SUM(SUM({_REV_SQL})) OVER (PARTITION BY {group_sql}) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY {group_sql})
           AS avg_q_sales
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE {_chan_sql(chan)} AND year(o_orderdate) = 1995
  GROUP BY 1, 2)
SELECT {group_col}, q, CAST(sum_sales AS DOUBLE) AS sum_sales,
       ROUND(CAST(avg_q_sales AS DOUBLE), 6) AS avg_q_sales
FROM v1
WHERE avg_q_sales > 0
  AND ROUND(ABS(CAST(sum_sales AS DOUBLE) - CAST(avg_q_sales AS DOUBLE))
            / CAST(avg_q_sales AS DOUBLE), 6) > 0.1
ORDER BY {group_col}, q
LIMIT 100
"""


def tpcds_q53_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q47 family, store channel by brand, no rank chain (ds q53)."""
    return _deviation_shape(spark, sf, _STORE, "p_brand", F.col("p_brand"))


def tpcds_q63_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q53's type-grouped sibling (ds q63)."""
    return _deviation_shape(spark, sf, _STORE, "p_type", F.col("p_type"))


def tpcds_q89_shape(spark: SparkSession, sf: str) -> DataFrame:
    """the web-channel sibling (ds q89)."""
    return _deviation_shape(spark, sf, _WEB, "p_brand", F.col("p_brand"))


# -- q55 (q52 family): single-month brand leaderboard, month 12 ------------
def tpcds_q55_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q52 family at a different month (ds q55)."""
    t = tables(spark, sf, "part")
    rev = (
        _fact(spark, sf)
        .where((F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 12))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.sum(_rev()).alias("brand_rev"))
    )
    return (
        rev.orderBy(F.desc("brand_rev"), F.asc("p_brand"))
        .limit(100)
        .select("p_brand", F.col("brand_rev").cast("double").alias("brand_rev"))
    )


TPCDS_Q55_SQL = f"""
SELECT p_brand, CAST(brand_rev AS DOUBLE) AS brand_rev FROM (
  SELECT p_brand, SUM({_REV_SQL}) AS brand_rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 12
  GROUP BY p_brand ORDER BY brand_rev DESC, p_brand LIMIT 100) t
"""


# -- q56/q60 (q33 family): dim-filtered channel unions ---------------------
def _channel_union_shape(spark, sf, dim_filter, tag: str) -> DataFrame:
    t = tables(spark, sf, "part")
    base = (
        _fact(spark, sf)
        .where((F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 6))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t.part.where(dim_filter).select("p_brand").distinct(),
            "p_brand",
            "left_semi",
        )
    )
    u = None
    for k in (_STORE, _WEB, _CATALOG):
        c = base.where(_chan(k)).groupBy("p_brand").agg(
            F.sum(_rev()).alias("total_sales")
        )
        u = c if u is None else u.unionAll(c)
    return (
        u.groupBy("p_brand")
        .agg(F.sum("total_sales").cast("double").alias("total_sales"))
        .orderBy("p_brand")
        .limit(100)
    )


def _channel_union_sql(dim_sql: str) -> str:
    legs = "\n  UNION ALL\n".join(
        f"""
  SELECT p_brand, SUM({_REV_SQL}) AS total_sales
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 6
    AND {_chan_sql(k)}
    AND p_brand IN (SELECT DISTINCT p_brand FROM part WHERE {dim_sql})
  GROUP BY p_brand"""
        for k in (_STORE, _WEB, _CATALOG)
    )
    return (
        "SELECT p_brand, CAST(SUM(total_sales) AS DOUBLE) AS total_sales"
        " FROM (" + legs + "\n) u GROUP BY p_brand ORDER BY p_brand LIMIT 100"
    )


def tpcds_q56_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q33 family, brand set from a name-prefix filter (ds q56)."""
    return _channel_union_shape(
        spark, sf, F.col("p_name").startswith("a"), "q56"
    )


def tpcds_q60_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q33 family, brand set from a size-band filter (ds q60)."""
    return _channel_union_shape(
        spark, sf, F.col("p_size").between(20, 30), "q60"
    )


# -- q57 (q47 family): catalog channel with the rank chain -----------------
def tpcds_q57_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q47's catalog-channel sibling, rank chain included (ds q57)."""
    t = tables(spark, sf, "part")
    v1 = (
        _fact(spark, sf)
        .where(_chan(_CATALOG) & F.year("o_orderdate").isin(1995, 1996))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_type",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("moy"),
        )
        .agg(F.sum(_rev()).alias("sum_sales"))
        .withColumn(
            "rn",
            F.rank().over(Window.partitionBy("p_type").orderBy("y", "moy")),
        )
    )
    lag = v1.select(
        F.col("p_type").alias("t_lag"),
        F.col("rn").alias("rn_lag"),
        F.col("sum_sales").alias("psum"),
    )
    lead = v1.select(
        F.col("p_type").alias("t_lead"),
        F.col("rn").alias("rn_lead"),
        F.col("sum_sales").alias("nsum"),
    )
    return (
        v1.join(
            lag,
            (F.col("p_type") == F.col("t_lag")) & (F.col("rn") == F.col("rn_lag") + 1),
        )
        .join(
            lead,
            (F.col("p_type") == F.col("t_lead"))
            & (F.col("rn") == F.col("rn_lead") - 1),
        )
        .where(F.col("y") == 1995)
        .select(
            "p_type",
            "y",
            "moy",
            F.col("sum_sales").cast("double").alias("sum_sales"),
            F.col("psum").cast("double").alias("psum"),
            F.col("nsum").cast("double").alias("nsum"),
        )
        .orderBy("p_type", "y", "moy")
        .limit(100)
    )


TPCDS_Q57_SQL = f"""
WITH v1 AS (
  SELECT p_type, year(o_orderdate) AS y, month(o_orderdate) AS moy,
         SUM({_REV_SQL}) AS sum_sales,
         RANK() OVER (PARTITION BY p_type
                      ORDER BY year(o_orderdate), month(o_orderdate)) AS rn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE {_chan_sql(_CATALOG)} AND year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3)
SELECT v1.p_type, v1.y, v1.moy,
       CAST(v1.sum_sales AS DOUBLE) AS sum_sales,
       CAST(v_lag.sum_sales AS DOUBLE) AS psum,
       CAST(v_lead.sum_sales AS DOUBLE) AS nsum
FROM v1
JOIN v1 v_lag ON v1.p_type = v_lag.p_type AND v1.rn = v_lag.rn + 1
JOIN v1 v_lead ON v1.p_type = v_lead.p_type AND v1.rn = v_lead.rn - 1
WHERE v1.y = 1995
ORDER BY v1.p_type, v1.y, v1.moy
LIMIT 100
"""


# -- q68 (q46 family): cross-nation per-order aggregate, extra sums --------
def tpcds_q68_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q46's sibling with extra measure columns and a weekday filter
    (ds q68)."""
    t = tables(spark, sf, "customer", "supplier", "nation")
    n2 = t.nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("home_nation"),
    )
    dn = (
        _fact(spark, sf)
        .where(F.dayofweek("o_orderdate").isin(2, 3))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_orderkey", "o_custkey", F.col("n_name").alias("bought_nation"))
        .agg(
            F.sum(_rev()).alias("amt"),
            F.sum(D(F.col("l_extendedprice") * F.col("l_tax"), 27, 4)).alias(
                "tax_amt"
            ),
        )
    )
    return (
        dn.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("home_nation") != F.col("bought_nation"))
        .select(
            "c_name",
            "home_nation",
            "bought_nation",
            "l_orderkey",
            F.col("amt").cast("double").alias("amt"),
            F.col("tax_amt").cast("double").alias("tax_amt"),
        )
        .orderBy("c_name", "l_orderkey", "bought_nation")
        .limit(100)
    )


TPCDS_Q68_SQL = f"""
WITH dn AS (
  SELECT l_orderkey, o_custkey, n_name AS bought_nation,
         SUM({_REV_SQL}) AS amt,
         SUM(CAST(l_extendedprice * l_tax AS DECIMAL(27,4))) AS tax_amt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE dayofweek(o_orderdate) IN (1, 2)
  GROUP BY 1, 2, 3)
SELECT c_name, n2.n_name AS home_nation, bought_nation, l_orderkey,
       CAST(amt AS DOUBLE) AS amt, CAST(tax_amt AS DOUBLE) AS tax_amt
FROM dn JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n2.n_name <> bought_nation
ORDER BY c_name, l_orderkey, bought_nation
LIMIT 100
"""


# -- q69 (q10 family): NOT EXISTS in BOTH other channels -------------------
def tpcds_q69_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q10's sibling: active in store, absent from web AND catalog
    (ds q69)."""
    t = tables(spark, sf, "customer", "nation")
    base = _fact(spark, sf).where(F.year("o_orderdate") == 1995)

    def custs(k: int) -> DataFrame:
        return base.where(_chan(k)).select("o_custkey").distinct()

    gated = (
        t.customer.join(
            custs(_STORE), F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .join(custs(_WEB), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            custs(_CATALOG), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        gated.groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name", "c_mktsegment")
    )


TPCDS_Q69_SQL = f"""
SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (
    SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
      AND {_chan_sql(_STORE)})
  AND NOT EXISTS (
    SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
      AND {_chan_sql(_WEB)})
  AND NOT EXISTS (
    SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
      AND {_chan_sql(_CATALOG)})
GROUP BY n_name, c_mktsegment
ORDER BY n_name, c_mktsegment
"""


# -- q71 (time-dim union): brand revenue across unioned date windows ------
def tpcds_q71_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q71: the time dimension assembled as a UNION of three windows
    (Dec 1995 / Jan 1996 / Feb 1996), revenue per (window, brand)."""
    t = tables(spark, sf, "part")
    base = _fact(spark, sf).join(
        t.part, F.col("l_partkey") == F.col("p_partkey")
    )

    def leg(y: int, m: int, tag: str) -> DataFrame:
        return base.where(
            (F.year("o_orderdate") == y) & (F.month("o_orderdate") == m)
        ).select(F.lit(tag).alias("t_window"), "p_brand", _rev().alias("rev"))

    u = (
        leg(1995, 12, "dec95")
        .unionAll(leg(1996, 1, "jan96"))
        .unionAll(leg(1996, 2, "feb96"))
    )
    return (
        u.groupBy("t_window", "p_brand")
        .agg(F.sum("rev").cast("double").alias("ext_price"))
        .orderBy("t_window", "p_brand")
        .limit(300)
    )


def _q71_leg_sql(y: int, m: int, tag: str) -> str:
    return f"""
  SELECT '{tag}' AS t_window, p_brand, {_REV_SQL} AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = {y} AND month(o_orderdate) = {m}"""


TPCDS_Q71_SQL = (
    "SELECT t_window, p_brand, CAST(SUM(rev) AS DOUBLE) AS ext_price FROM ("
    + _q71_leg_sql(1995, 12, "dec95")
    + "\n  UNION ALL\n"
    + _q71_leg_sql(1996, 1, "jan96")
    + "\n  UNION ALL\n"
    + _q71_leg_sql(1996, 2, "feb96")
    + "\n) u GROUP BY t_window, p_brand ORDER BY t_window, p_brand LIMIT 300"
)


# -- q73/q79 (q34 family): per-order line-count band + customer join -------
def tpcds_q73_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q34 family with a tighter band (ds q73): orders of 5-8 lines."""
    t = tables(spark, sf, "customer")
    dn = (
        _fact(spark, sf)
        .groupBy("l_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt").between(5, 8))
    )
    return (
        dn.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "l_orderkey", "cnt")
        .orderBy("c_name", "l_orderkey")
        .limit(100)
    )


TPCDS_Q73_SQL = """
SELECT c_name, l_orderkey, cnt FROM (
  SELECT l_orderkey, o_custkey, COUNT(*) AS cnt
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 5 AND 8) dn
JOIN customer ON o_custkey = c_custkey
ORDER BY c_name, l_orderkey
LIMIT 100
"""


def tpcds_q79_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q34/q46 blend (ds q79): weekend per-order revenue aggregates,
    each customer's single largest order via a partitioned ranking."""
    t = tables(spark, sf, "customer")
    dn = (
        _fact(spark, sf)
        .where(F.dayofweek("o_orderdate").isin(1, 7))
        .groupBy("l_orderkey", "o_custkey")
        .agg(F.sum(_rev()).alias("amt"))
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("amt"), F.asc("l_orderkey"))
    top = dn.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return (
        top.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "l_orderkey", F.col("amt").cast("double").alias("amt"))
        .orderBy("c_name", "l_orderkey")
        .limit(100)
    )


TPCDS_Q79_SQL = f"""
SELECT c_name, l_orderkey, CAST(amt AS DOUBLE) AS amt FROM (
  SELECT l_orderkey, o_custkey, amt,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY amt DESC, l_orderkey) AS rk
  FROM (SELECT l_orderkey, o_custkey, SUM({_REV_SQL}) AS amt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE dayofweek(o_orderdate) IN (0, 6)
        GROUP BY 1, 2) dn) t
JOIN customer ON o_custkey = c_custkey
WHERE rk = 1
ORDER BY c_name, l_orderkey
LIMIT 100
"""


# -- q74 (q11 family): year-over-year growth on quantity -------------------
def tpcds_q74_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q11/q4 family on quantity totals (ds q74)."""
    spine = (
        _fact(spark, sf)
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("o_custkey", F.year("o_orderdate").alias("y"))
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    a = spine.where(F.col("y") == 1995).select(
        F.col("o_custkey").alias("ck"), F.col("qty").alias("q95")
    )
    b = spine.where(F.col("y") == 1996).select(
        F.col("o_custkey").alias("ck2"), F.col("qty").alias("q96")
    )
    return (
        a.join(b, F.col("ck") == F.col("ck2"))
        .where((F.col("q95") > 0) & (F.col("q96") * 10 > F.col("q95") * 12))
        .select(
            F.col("ck").alias("o_custkey"),
            "q95",
            "q96",
            F.round(F.col("q96").cast("double") / F.col("q95").cast("double"), 6).alias(
                "growth"
            ),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


TPCDS_Q74_SQL = """
WITH spine AS (
  SELECT o_custkey, year(o_orderdate) AS y,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2)
SELECT a.o_custkey, a.qty AS q95, b.qty AS q96,
       ROUND(CAST(b.qty AS DOUBLE) / CAST(a.qty AS DOUBLE), 6) AS growth
FROM spine a JOIN spine b ON a.o_custkey = b.o_custkey
WHERE a.y = 1995 AND b.y = 1996 AND a.qty > 0 AND b.qty * 10 > a.qty * 12
ORDER BY a.o_custkey
LIMIT 100
"""


# -- q81 (q30 family): catalog-channel returns vs nation average -----------
def tpcds_q81_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q30's catalog-channel sibling (ds q81)."""
    t = tables(spark, sf, "lineitem", "orders", "customer")
    ctr = (
        t.lineitem.where(_chan(_CATALOG) & (F.col("l_returnflag") == "R"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("o_custkey").alias("ctr_custkey"),
            F.col("c_nationkey").alias("ctr_nation"),
        )
        .agg(F.sum(_rev()).alias("ctr_total"))
    )
    nat = ctr.groupBy(F.col("ctr_nation").alias("na_nation")).agg(
        F.sum("ctr_total").alias("nat_sum"), F.count(F.lit(1)).alias("nat_cnt")
    )
    return (
        ctr.join(nat, F.col("ctr_nation") == F.col("na_nation"))
        .where(F.col("ctr_total") * F.col("nat_cnt") * 10 > F.col("nat_sum") * 12)
        .select(
            "ctr_custkey",
            "ctr_nation",
            F.col("ctr_total").cast("double").alias("total_returns"),
        )
        .orderBy("ctr_custkey")
        .limit(100)
    )


TPCDS_Q81_SQL = f"""
WITH ctr AS (
  SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nation,
         SUM({_REV_SQL}) AS ctr_total
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE {_chan_sql(_CATALOG)} AND l_returnflag = 'R'
  GROUP BY 1, 2),
nat AS (
  SELECT ctr_nation, SUM(ctr_total) AS nat_sum, COUNT(*) AS nat_cnt
  FROM ctr GROUP BY 1)
SELECT ctr_custkey, ctr_nation, CAST(ctr_total AS DOUBLE) AS total_returns
FROM ctr JOIN nat USING (ctr_nation)
WHERE ctr_total * nat_cnt * 10 > nat_sum * 12
ORDER BY ctr_custkey
LIMIT 100
"""


# -- q82 (q37 family): different band + supplier-parity probe --------------
def tpcds_q82_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q37's sibling band with an extra supplier-parity condition in the
    fact probe (ds q82)."""
    t = tables(spark, sf, "lineitem", "part")
    qualifying = t.lineitem.where(
        (F.year("l_shipdate") == 1996)
        & F.col("l_quantity").between(25, 35)
        & (F.col("l_suppkey") % 2 == 0)
    ).select("l_partkey")
    return (
        t.part.where(F.col("p_retailprice").between(900, 1100))
        .join(qualifying, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(100)
    )


TPCDS_Q82_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice BETWEEN 900 AND 1100
  AND p_partkey IN (
    SELECT l_partkey FROM lineitem
    WHERE year(l_shipdate) = 1996 AND l_quantity BETWEEN 25 AND 35
      AND l_suppkey % 2 = 0)
ORDER BY p_partkey
LIMIT 100
"""


# -- q84 (flat dim lookup): balance-band customer listing ------------------
def tpcds_q84_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q84: flat dim join chain listing customers in a balance band
    from one nation."""
    t = tables(spark, sf, "customer", "nation")
    return (
        t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("n_name") == "GERMANY")
            & F.col("c_acctbal").between(1000, 3000)
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q84_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_name = 'GERMANY' AND c_acctbal BETWEEN 1000 AND 3000
ORDER BY c_custkey
LIMIT 100
"""


# -- q85 (banded OR returns panel) ----------------------------------------
def tpcds_q85_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q85: averages over returned lines qualifying through any of
    three (quantity band AND discount band) conjunctions, per priority."""
    p = (
        (F.col("l_quantity").between(1, 15) & F.col("l_discount").between(0.0, 0.03))
        | (F.col("l_quantity").between(16, 30) & F.col("l_discount").between(0.03, 0.06))
        | (F.col("l_quantity").between(31, 50) & F.col("l_discount").between(0.06, 0.10))
    )
    return (
        _fact(spark, sf)
        .where((F.col("l_returnflag") == "R") & p)
        .groupBy("o_orderpriority")
        .agg(
            davg(D("l_quantity"), "avg_qty"),
            davg(D("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


TPCDS_Q85_SQL = """
SELECT o_orderpriority, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND ((l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN 0.0 AND 0.03)
    OR (l_quantity BETWEEN 16 AND 30 AND l_discount BETWEEN 0.03 AND 0.06)
    OR (l_quantity BETWEEN 31 AND 50 AND l_discount BETWEEN 0.06 AND 0.10))
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- q86 (q36/q70 family): 2-level rollup + rank within parent -------------
def tpcds_q86_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q36 family at two levels on the web channel (ds q86)."""
    t = tables(spark, sf, "customer")
    rolled = (
        _fact(spark, sf)
        .where(_chan(_WEB))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.sum(_rev()).alias("total_sum"),
            (
                F.grouping("c_mktsegment") + F.grouping("o_orderpriority")
            ).alias("lochierarchy"),
            F.grouping("o_orderpriority").alias("g_p"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_p") == 1, F.lit(None)).otherwise(F.col("c_mktsegment")),
    ).orderBy(F.desc("total_sum"), F.asc_nulls_first("o_orderpriority"))
    return (
        rolled.select(
            F.col("total_sum").cast("double").alias("total_sum"),
            "c_mktsegment",
            "o_orderpriority",
            "lochierarchy",
            F.row_number().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("c_mktsegment"),
            "rank_within_parent",
        )
        .limit(100)
    )


TPCDS_Q86_SQL = f"""
WITH rolled AS (
  SELECT SUM({_REV_SQL}) AS total_sum, c_mktsegment, o_orderpriority,
         GROUPING(c_mktsegment) + GROUPING(o_orderpriority)
           AS lochierarchy,
         GROUPING(o_orderpriority) AS g_p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE {_chan_sql(_WEB)}
  GROUP BY ROLLUP (c_mktsegment, o_orderpriority))
SELECT CAST(total_sum AS DOUBLE) AS total_sum, c_mktsegment,
       o_orderpriority, lochierarchy,
       ROW_NUMBER() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN g_p = 1 THEN NULL ELSE c_mktsegment END
         ORDER BY total_sum DESC, o_orderpriority ASC NULLS FIRST)
         AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, c_mktsegment ASC NULLS FIRST,
         rank_within_parent
LIMIT 100
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q42_shape": QuerySpec(tpcds_q42_shape, TPCDS_Q42_SQL),
    "tpcds_q43_shape": QuerySpec(tpcds_q43_shape, TPCDS_Q43_SQL),
    "tpcds_q50_shape": QuerySpec(tpcds_q50_shape, TPCDS_Q50_SQL),
    "tpcds_q53_shape": QuerySpec(
        tpcds_q53_shape, _deviation_sql(_STORE, "p_brand", "p_brand")
    ),
    "tpcds_q55_shape": QuerySpec(tpcds_q55_shape, TPCDS_Q55_SQL),
    "tpcds_q56_shape": QuerySpec(
        tpcds_q56_shape, _channel_union_sql("p_name LIKE 'a%'")
    ),
    "tpcds_q57_shape": QuerySpec(tpcds_q57_shape, TPCDS_Q57_SQL),
    "tpcds_q60_shape": QuerySpec(
        tpcds_q60_shape, _channel_union_sql("p_size BETWEEN 20 AND 30")
    ),
    "tpcds_q63_shape": QuerySpec(
        tpcds_q63_shape, _deviation_sql(_STORE, "p_type", "p_type")
    ),
    "tpcds_q68_shape": QuerySpec(tpcds_q68_shape, TPCDS_Q68_SQL),
    "tpcds_q69_shape": QuerySpec(tpcds_q69_shape, TPCDS_Q69_SQL),
    "tpcds_q71_shape": QuerySpec(tpcds_q71_shape, TPCDS_Q71_SQL),
    "tpcds_q73_shape": QuerySpec(tpcds_q73_shape, TPCDS_Q73_SQL),
    "tpcds_q74_shape": QuerySpec(tpcds_q74_shape, TPCDS_Q74_SQL),
    "tpcds_q79_shape": QuerySpec(tpcds_q79_shape, TPCDS_Q79_SQL),
    "tpcds_q81_shape": QuerySpec(tpcds_q81_shape, TPCDS_Q81_SQL),
    "tpcds_q82_shape": QuerySpec(tpcds_q82_shape, TPCDS_Q82_SQL),
    "tpcds_q84_shape": QuerySpec(tpcds_q84_shape, TPCDS_Q84_SQL),
    "tpcds_q85_shape": QuerySpec(tpcds_q85_shape, TPCDS_Q85_SQL),
    "tpcds_q86_shape": QuerySpec(tpcds_q86_shape, TPCDS_Q86_SQL),
    "tpcds_q89_shape": QuerySpec(
        tpcds_q89_shape, _deviation_sql(_WEB, "p_brand", "p_brand")
    ),
}
