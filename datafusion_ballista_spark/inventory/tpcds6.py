"""TPC-DS-shape mini-suite, tranche 6 (q10/q54/q80) — continues
inventory/tpcds5.py toward the reference's 99-query CI gate.

Shapes (fixture mapping as before; channels = l_linenumber % 3):

- q10: customer census gated by EXISTS (active in the store channel)
  AND NOT EXISTS (absent from the web channel) — the semi + anti probe
  combination over the same fact, then demographic-style counts;
- q54: revenue-band histogram — per-customer quarterly revenue bucketed
  into fixed-width bands, customers counted per band (ds q54's
  ``floor(revenue/50)`` segmentation);
- q80: channel P&L — per channel, non-returned line revenue LEFT JOINed
  to the aggregated returned amounts per (order, part), summed into
  sales/returns/profit, UNION ALL'd and ROLLUP'd over channel.

Scale notes (100 TB): the q10 probes are key-shuffled semi/anti joins on
the customer key; q54's banding is a map-side expression over one
aggregate; q80's returns join is fact-to-aggregate on (order, part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, tables

_STORE, _WEB, _CATALOG = 0, 1, 2


def _chan(k: int):
    return F.col("l_linenumber") % 3 == k


def _chan_sql(k: int) -> str:
    return f"l_linenumber % 3 = {k}"


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


# --------------------------------------------------------------------------
# q10 shape: EXISTS + NOT EXISTS channel gate -> demographic counts.
# reference: benchmarks/queries-tpcds/q10.sql (also q35/q69 family)
# --------------------------------------------------------------------------
def tpcds_q10_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q10's gated census: customers with 1995 store-channel activity
    (EXISTS -> left_semi) and no 1995 web-channel activity (NOT EXISTS ->
    left_anti), counted per (nation, mktsegment). Both probes shuffle on
    the customer key; the distinct customer spines are built once."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "nation")
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
    )

    def custs(k: int) -> DataFrame:
        return base.where(_chan(k)).select("o_custkey").distinct()

    gated = (
        t.customer.join(
            custs(_STORE), F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .join(
            custs(_WEB), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        gated.groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.avg(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"),
                6,
            ).alias("avg_bal"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


TPCDS_Q10_SQL = f"""
SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
  ROUND(CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6)
    AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (
    SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
      AND {_chan_sql(_STORE)})
  AND NOT EXISTS (
    SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995
      AND {_chan_sql(_WEB)})
GROUP BY n_name, c_mktsegment
ORDER BY n_name, c_mktsegment
"""


# --------------------------------------------------------------------------
# q54 shape: per-customer revenue banded into a fixed-width histogram.
# reference: benchmarks/queries-tpcds/q54.sql
# --------------------------------------------------------------------------
def tpcds_q54_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q54's segment histogram: Q2-1995 per-customer revenue bucketed
    by floor(revenue / 5000) and customers counted per band — one
    aggregate, one map-side banding expression, one re-aggregate. The
    band boundary divides an exact decimal by an integer literal, so
    band assignment is engine-exact."""
    t = tables(spark, sf, "lineitem", "orders")
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.year("o_orderdate") == 1995) & (F.quarter("o_orderdate") == 2)
        )
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("revenue"))
    )
    banded = rev.select(
        F.floor(F.col("revenue") / 5000).cast("bigint").alias("segment")
    )
    return (
        banded.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("num_customers"))
        .select(
            "segment",
            "num_customers",
            (F.col("segment") * 5000).alias("segment_base"),
        )
        .orderBy("segment")
        .limit(100)
    )


TPCDS_Q54_SQL = f"""
WITH rev AS (
  SELECT o_custkey, SUM({_REV_SQL}) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2
  GROUP BY o_custkey)
SELECT segment, COUNT(*) AS num_customers, segment * 5000 AS segment_base
FROM (SELECT CAST(FLOOR(revenue / 5000) AS BIGINT) AS segment FROM rev)
GROUP BY segment
ORDER BY segment
LIMIT 100
"""


# --------------------------------------------------------------------------
# q80 shape: channel P&L with returns LEFT JOIN, UNION, ROLLUP(channel).
# reference: benchmarks/queries-tpcds/q80.sql
# --------------------------------------------------------------------------
def tpcds_q80_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q80's channel P&L: per channel, every non-returned sale line
    LEFT JOINs the aggregated returned amount for its (order, part);
    sales / returns / profit roll up per channel and grand-total
    (ROLLUP over the 3-row channel spine). The returns side is a
    fact-to-aggregate join on the composite key."""
    t = tables(spark, sf, "lineitem", "orders")
    ret = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .groupBy(
            F.col("l_orderkey").alias("r_ok"), F.col("l_partkey").alias("r_pk")
        )
        .agg(F.sum(_rev()).alias("ret_amt"))
    )
    base = (
        t.lineitem.where(F.col("l_returnflag") != "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
        .join(
            ret,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_partkey") == F.col("r_pk")),
            "left",
        )
        .select(
            (F.col("l_linenumber") % 3).alias("chan_id"),
            _rev().alias("sales"),
            F.coalesce(F.col("ret_amt"), F.lit(0).cast("decimal(27,4)")).alias(
                "returns"
            ),
        )
    )
    chan_name = (
        F.when(F.col("chan_id") == _STORE, "store")
        .when(F.col("chan_id") == _WEB, "web")
        .otherwise("catalog")
    )
    per_line = base.select(
        chan_name.alias("channel"), "sales", "returns"
    )
    return (
        per_line.rollup("channel")
        .agg(
            F.sum("sales").cast("double").alias("sales"),
            F.sum("returns").cast("double").alias("returns"),
            (F.sum("sales") - F.sum("returns")).cast("double").alias("profit"),
        )
        .orderBy(F.asc_nulls_first("channel"))
    )


TPCDS_Q80_SQL = f"""
WITH ret AS (
  SELECT l_orderkey AS r_ok, l_partkey AS r_pk, SUM({_REV_SQL}) AS ret_amt
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY 1, 2),
per_line AS (
  SELECT CASE l_linenumber % 3 WHEN {_STORE} THEN 'store'
              WHEN {_WEB} THEN 'web' ELSE 'catalog' END AS channel,
         {_REV_SQL} AS sales,
         COALESCE(ret_amt, CAST(0 AS DECIMAL(27,4))) AS returns
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  LEFT JOIN ret ON l_orderkey = r_ok AND l_partkey = r_pk
  WHERE l_returnflag <> 'R' AND year(o_orderdate) = 1995)
SELECT channel, CAST(SUM(sales) AS DOUBLE) AS sales,
       CAST(SUM(returns) AS DOUBLE) AS returns,
       CAST(SUM(sales) - SUM(returns) AS DOUBLE) AS profit
FROM per_line
GROUP BY ROLLUP (channel)
ORDER BY channel ASC NULLS FIRST
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q10_shape": QuerySpec(tpcds_q10_shape, TPCDS_Q10_SQL),
    "tpcds_q54_shape": QuerySpec(tpcds_q54_shape, TPCDS_Q54_SQL),
    "tpcds_q80_shape": QuerySpec(tpcds_q80_shape, TPCDS_Q80_SQL),
}
