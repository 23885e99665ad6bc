"""TPC-DS-shape mini-suite, tranche 11 (q12/q16/q18/q20/q25/q26/q29/q30/
q32/q40) — channel/dimension VARIANTS of families already covered in
tranches 1-10, implemented so every remaining reference CI query has a
named analogue (the reference gates on all 99:
/root/reference/benchmarks/queries-tpcds/). Each docstring names the
family anchor; the operator pattern is the anchor's, re-instantiated on
the variant's channel/dims exactly as TPC-DS itself varies q12/q20/q98
or q7/q26.

All determinism and scale rules as in earlier tranches.
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


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


def _share_shape(spark, sf, chan: int, q: int) -> DataFrame:
    """q12/q20 both = q98's share-window on a different channel + a
    bounded date window."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            _chan(chan)
            & (F.year("o_orderdate") == 1995)
            & (F.quarter("o_orderdate") == q)
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_rev()).alias("itemrevenue"))
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
        .limit(500)
    )


def _share_sql(chan: int, q: int) -> str:
    return f"""
WITH rev AS (
  SELECT p_type, p_brand, SUM({_REV_SQL}) AS itemrevenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE {_chan_sql(chan)} AND year(o_orderdate) = 1995
    AND quarter(o_orderdate) = {q}
  GROUP BY 1, 2)
SELECT p_type, p_brand, CAST(itemrevenue AS DOUBLE) AS itemrevenue,
       ROUND(CAST(itemrevenue AS DOUBLE) * 100
             / CAST(SUM(itemrevenue) OVER (PARTITION BY p_type) AS DOUBLE),
             6) AS revenueratio
FROM rev ORDER BY p_type, p_brand LIMIT 500
"""


def tpcds_q12_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q98 family, web channel + Q1 window (ds q12)."""
    return _share_shape(spark, sf, _WEB, 1)


def tpcds_q20_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q98 family, catalog channel + Q2 window (ds q20)."""
    return _share_shape(spark, sf, _CATALOG, 2)


def tpcds_q16_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q94/q95 family on the catalog channel (ds q16): multi-supplier
    orders with no returned line, restricted to catalog-channel lines
    and a priority filter."""
    t = tables(spark, sf, "lineitem", "orders")
    cat = t.lineitem.where(_chan(_CATALOG))
    multi = (
        cat.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") > 1)
        .select("l_orderkey")
    )
    ret_orders = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    sel = (
        t.orders.where(
            (F.year("o_orderdate") == 1995)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .join(multi, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(ret_orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
    )
    return sel.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.sum(D("o_totalprice")).cast("double").alias("total_price"),
    )


TPCDS_Q16_SQL = f"""
SELECT COUNT(DISTINCT o_orderkey) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE year(o_orderdate) = 1995
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderkey IN (
    SELECT l_orderkey FROM lineitem WHERE {_chan_sql(_CATALOG)}
    GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1)
  AND o_orderkey NOT IN (
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


def tpcds_q18_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q27 family at three ROLLUP levels (ds q18: nation, segment,
    priority averages)."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "nation")
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.year("o_orderdate") == 1995)
    )
    # Averages via exact decimal sums (the inventory determinism contract):
    # plain AVG(double) is an order-dependent float sum, and at the sf1
    # group sizes the drift crosses the 6-dp rounding boundary vs DuckDB.
    return (
        base.rollup("n_name", "c_mktsegment", "o_orderpriority")
        .agg(
            davg(D("l_quantity"), "agg1"),
            davg(D("l_extendedprice"), "agg2"),
            davg(D("l_discount"), "agg3"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.asc_nulls_first("n_name"),
            F.asc_nulls_first("c_mktsegment"),
            F.asc_nulls_first("o_orderpriority"),
        )
        .limit(200)
    )


TPCDS_Q18_SQL = """
SELECT n_name, c_mktsegment, o_orderpriority,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg1,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg2,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg3, COUNT(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1995
GROUP BY ROLLUP (n_name, c_mktsegment, o_orderpriority)
ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST,
         o_orderpriority ASC NULLS FIRST
LIMIT 200
"""


def _stats_panel(spark, sf, agg_fn, agg_sql: str, name: str):
    """q17 family panel builder for q25 (sums) / q29 (quantity sums)."""
    t = tables(spark, sf, "lineitem")
    li = t.lineitem

    def stats(cond, tag: str) -> DataFrame:
        return (
            li.where(cond)
            .groupBy("l_partkey")
            .agg(agg_fn(tag), F.count(F.lit(1)).alias(f"{tag}_cnt"))
            .where(F.col(f"{tag}_cnt") >= 3)
        )

    ss = stats(_chan(_STORE) & (F.col("l_returnflag") != "R"), "ss")
    sr = stats(F.col("l_returnflag") == "R", "sr").withColumnRenamed(
        "l_partkey", "sr_pk"
    )
    cs = stats(_chan(_CATALOG) & (F.col("l_returnflag") != "R"), "cs").withColumnRenamed(
        "l_partkey", "cs_pk"
    )
    return (
        ss.join(sr, F.col("l_partkey") == F.col("sr_pk"))
        .join(cs, F.col("l_partkey") == F.col("cs_pk"))
        .select(
            "l_partkey",
            f"ss_{name}", "ss_cnt", f"sr_{name}", "sr_cnt",
            f"cs_{name}", "cs_cnt",
        )
        .orderBy("l_partkey")
        .limit(100)
    )


def _stats_panel_sql(agg_sql: str, name: str) -> str:
    def blk(cond: str, tag: str) -> str:
        return (
            f"{tag} AS (SELECT l_partkey, {agg_sql} AS {tag}_{name}, "
            f"COUNT(*) AS {tag}_cnt FROM lineitem WHERE {cond} "
            f"GROUP BY 1 HAVING COUNT(*) >= 3)"
        )

    return (
        "WITH "
        + blk(f"{_chan_sql(_STORE)} AND l_returnflag <> 'R'", "ss")
        + ", "
        + blk("l_returnflag = 'R'", "sr")
        + ", "
        + blk(f"{_chan_sql(_CATALOG)} AND l_returnflag <> 'R'", "cs")
        + f"""
SELECT ss.l_partkey, ss_{name}, ss_cnt, sr_{name}, sr_cnt,
       cs_{name}, cs_cnt
FROM ss JOIN sr ON ss.l_partkey = sr.l_partkey
JOIN cs ON ss.l_partkey = cs.l_partkey
ORDER BY ss.l_partkey LIMIT 100
"""
    )


def tpcds_q25_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q17 family with revenue SUM panels (ds q25)."""
    return _stats_panel(
        spark,
        sf,
        lambda tag: F.sum(_rev()).cast("double").alias(f"{tag}_rev"),
        "",
        "rev",
    )


TPCDS_Q25_SQL = _stats_panel_sql(f"CAST(SUM({_REV_SQL}) AS DOUBLE)", "rev")


def tpcds_q29_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q17 family with quantity SUM panels (ds q29)."""
    return _stats_panel(
        spark,
        sf,
        lambda tag: F.sum("l_quantity").cast("bigint").alias(f"{tag}_qty"),
        "",
        "qty",
    )


TPCDS_Q29_SQL = _stats_panel_sql("CAST(SUM(l_quantity) AS BIGINT)", "qty")


def tpcds_q26_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q7 family on the catalog channel (ds q26)."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "part")
    return (
        t.lineitem.where(_chan(_CATALOG))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(
            (F.col("c_mktsegment") == "MACHINERY")
            & (F.col("o_orderpriority") == "2-HIGH")
        )
        .groupBy("p_brand")
        .agg(
            davg(D("l_quantity"), "agg1"),
            davg(D("l_extendedprice"), "agg2"),
            davg(D("l_discount"), "agg3"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


TPCDS_Q26_SQL = f"""
SELECT p_brand, ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg1,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg2,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS agg3, COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
WHERE {_chan_sql(_CATALOG)} AND c_mktsegment = 'MACHINERY'
  AND o_orderpriority = '2-HIGH'
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
"""


def tpcds_q30_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q1 family on RETURNS (ds q30): customers whose returned revenue
    exceeds 1.2x their nation's average returned revenue — the
    customer_total_return CTE reused twice, on the returns subset."""
    t = tables(spark, sf, "lineitem", "orders", "customer")
    ctr = (
        t.lineitem.where(F.col("l_returnflag") == "R")
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


TPCDS_Q30_SQL = f"""
WITH ctr AS (
  SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nation,
         SUM({_REV_SQL}) AS ctr_total
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
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


def tpcds_q32_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q92 family on the catalog channel (ds q32): excess-discount total
    for catalog lines against the per-part catalog average."""
    t = tables(spark, sf, "lineitem")
    li = t.lineitem.where(_chan(_CATALOG) & (F.year("l_shipdate") == 1995))
    # exact decimal sum / count for the threshold average: a float-drifted
    # AVG can flip rows sitting exactly on the 1.3x boundary
    avg_disc = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(D("l_discount")).cast("double") / F.count(F.lit(1))).alias("ad")
    )
    return (
        li.join(avg_disc, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_discount") > F.col("ad") * 1.3)
        .agg(
            F.sum(D("l_extendedprice")).cast("double").alias(
                "excess_discount_amount"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCDS_Q32_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS excess_discount_amount,
       COUNT(*) AS n_lines
FROM lineitem l1
WHERE {_chan_sql(_CATALOG)} AND year(l_shipdate) = 1995
  AND l_discount > 1.3 * (
    SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey AND year(l2.l_shipdate) = 1995
      AND l2.l_linenumber % 3 = {_CATALOG})
"""


def tpcds_q40_shape(spark: SparkSession, sf: str) -> DataFrame:
    """q21 family with revenue deltas (ds q40): per (nation, part),
    revenue in the 60 days before vs after the pivot date — both sides
    reported, no band filter (the before/after split is the shape)."""
    t = tables(spark, sf, "lineitem", "supplier", "nation")
    pivot = "1995-06-01"
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.date_sub(F.lit(pivot).cast("date"), 60))
        & (F.col("l_shipdate") < F.date_add(F.lit(pivot).cast("date"), 60))
    )
    g = (
        li.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate") < F.lit(pivot).cast("date"), _rev()
                ).otherwise(F.lit(0).cast("decimal(27,4)"))
            ).alias("rev_before"),
            F.sum(
                F.when(
                    F.col("l_shipdate") >= F.lit(pivot).cast("date"), _rev()
                ).otherwise(F.lit(0).cast("decimal(27,4)"))
            ).alias("rev_after"),
        )
    )
    return (
        g.select(
            "n_name",
            "l_partkey",
            F.col("rev_before").cast("double").alias("rev_before"),
            F.col("rev_after").cast("double").alias("rev_after"),
        )
        .orderBy("n_name", "l_partkey")
        .limit(100)
    )


TPCDS_Q40_SQL = f"""
SELECT n_name, l_partkey,
  CAST(SUM(CASE WHEN l_shipdate < DATE '1995-06-01'
           THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
    AS rev_before,
  CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-06-01'
           THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
    AS rev_after
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l_shipdate >= DATE '1995-06-01' - INTERVAL 60 DAY
  AND l_shipdate < DATE '1995-06-01' + INTERVAL 60 DAY
GROUP BY 1, 2
ORDER BY n_name, l_partkey
LIMIT 100
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q12_shape": QuerySpec(tpcds_q12_shape, _share_sql(_WEB, 1)),
    "tpcds_q16_shape": QuerySpec(tpcds_q16_shape, TPCDS_Q16_SQL),
    "tpcds_q18_shape": QuerySpec(tpcds_q18_shape, TPCDS_Q18_SQL),
    "tpcds_q20_shape": QuerySpec(tpcds_q20_shape, _share_sql(_CATALOG, 2)),
    "tpcds_q25_shape": QuerySpec(tpcds_q25_shape, TPCDS_Q25_SQL),
    "tpcds_q26_shape": QuerySpec(tpcds_q26_shape, TPCDS_Q26_SQL),
    "tpcds_q29_shape": QuerySpec(tpcds_q29_shape, TPCDS_Q29_SQL),
    "tpcds_q30_shape": QuerySpec(tpcds_q30_shape, TPCDS_Q30_SQL),
    "tpcds_q32_shape": QuerySpec(tpcds_q32_shape, TPCDS_Q32_SQL),
    "tpcds_q40_shape": QuerySpec(tpcds_q40_shape, TPCDS_Q40_SQL),
}
