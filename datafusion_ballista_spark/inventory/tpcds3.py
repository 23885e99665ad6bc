"""TPC-DS-shape mini-suite, tranche 3 (q4/q17/q31/q38/q47/q87/q94) —
continues inventory/tpcds2.py toward the reference's 99-query CI gate
(/root/reference/benchmarks/queries-tpcds/, tpcds.yml:55-74).

Shapes in this tranche (fixture mapping as in tpcds2: lineitem = sales
fact, l_linenumber % 3 = channel, l_returnflag = returns, orders =
customer/date side):

- q4: three-channel per-(customer, year) totals UNION ALL'd, then the
  year-over-year growth of one channel compared against another via the
  classic 6-alias join — all growth compares are decimal
  cross-multiplications (no division in predicates);
- q17: sales/returns/catalog triple stats — count/avg/stddev/cov of
  quantity per part from three different subsets, joined on part;
- q31: quarter-chain ratios — per-(nation, quarter) spines self-joined
  q1->q2->q3 for two channels (6 aliases of 2 CTEs);
- q38: three-channel INTERSECT of distinct (customer, day) -> COUNT;
- q47: window-over-aggregate — monthly brand sums with an AVG-over-year
  window and a rank chain self-joined rn±1 for prev/next month values;
- q87: the same three channels EXCEPT-chained -> COUNT;
- q94: multi-supplier orders with no returned line (semi + anti join on
  the order spine) -> COUNT(DISTINCT) + decimal total.

Scale notes (100 TB): channel spines and quarter/month spines are
partial/final hash aggregates; all self-joins are spine-to-spine (keyed
on aggregated rows, not fact rows); INTERSECT/EXCEPT hash-shuffle on the
distinct key; the q94 probes are semi/anti joins on o_orderkey. Nothing
collects driver-side; no unbounded broadcast.

Determinism: decimal sums, ROUND on genuine double math (stddev/cov,
ratio outputs), CAST(SUM/COUNT-of-int AS BIGINT) pinning on the DuckDB
side, unique tiebreakers + LIMIT everywhere a sort feeds output.
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


# --------------------------------------------------------------------------
# q4 shape: channel-union customer year totals; growth-ratio comparison via
# the 6-alias join. reference: benchmarks/queries-tpcds/q4.sql
# --------------------------------------------------------------------------
def tpcds_q4_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q4's year_total spine: per (customer, year, channel) revenue
    UNION ALL'd, then customers whose web channel grew strictly faster
    than their store channel from 1995 to 1996 — the growth compare is
    the decimal cross-multiplication w96*s95 > w95*s96 (exact; division
    appears only in the rounded output columns)."""
    t = tables(spark, sf, "lineitem", "orders")
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    )

    def spine(modes: int) -> DataFrame:
        return (
            base.where(_chan(modes) & F.year("o_orderdate").isin(1995, 1996))
            .groupBy("o_custkey", F.year("o_orderdate").alias("y"))
            .agg(F.sum(D("l_extendedprice")).alias("tot"))
        )

    s = spine(_STORE)
    w = spine(_WEB)
    s95 = s.where(F.col("y") == 1995).select(
        F.col("o_custkey").alias("ck"), F.col("tot").alias("s95")
    )
    s96 = s.where(F.col("y") == 1996).select(
        F.col("o_custkey").alias("ck2"), F.col("tot").alias("s96")
    )
    w95 = w.where(F.col("y") == 1995).select(
        F.col("o_custkey").alias("ck3"), F.col("tot").alias("w95")
    )
    w96 = w.where(F.col("y") == 1996).select(
        F.col("o_custkey").alias("ck4"), F.col("tot").alias("w96")
    )
    j = (
        s95.join(s96, F.col("ck") == F.col("ck2"))
        .join(w95, F.col("ck") == F.col("ck3"))
        .join(w96, F.col("ck") == F.col("ck4"))
        .where(
            (F.col("s95") > 0)
            & (F.col("w95") > 0)
            & (F.col("w96") * F.col("s95") > F.col("w95") * F.col("s96"))
        )
    )
    return (
        j.select(
            F.col("ck").alias("o_custkey"),
            # double division on both sides: DuckDB's decimal/decimal is
            # DOUBLE, Spark's is DECIMAL — cast so kinds agree.
            F.round(
                F.col("w96").cast("double") / F.col("w95").cast("double"), 6
            ).alias("web_growth"),
            F.round(
                F.col("s96").cast("double") / F.col("s95").cast("double"), 6
            ).alias("store_growth"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


TPCDS_Q4_SQL = f"""
WITH spine AS (
  SELECT o_custkey, year(o_orderdate) AS y, l_linenumber % 3 AS chan,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3)
SELECT s95.o_custkey,
       ROUND(w96.tot / w95.tot, 6) AS web_growth,
       ROUND(s96.tot / s95.tot, 6) AS store_growth
FROM spine s95
JOIN spine s96 ON s95.o_custkey = s96.o_custkey
JOIN spine w95 ON s95.o_custkey = w95.o_custkey
JOIN spine w96 ON s95.o_custkey = w96.o_custkey
WHERE s95.y = 1995 AND s95.chan = {_STORE}
  AND s96.y = 1996 AND s96.chan = {_STORE}
  AND w95.y = 1995 AND w95.chan = {_WEB}
  AND w96.y = 1996 AND w96.chan = {_WEB}
  AND s95.tot > 0 AND w95.tot > 0
  AND w96.tot * s95.tot > w95.tot * s96.tot
ORDER BY s95.o_custkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q17 shape: triple-subset quantity statistics joined on part.
# reference: benchmarks/queries-tpcds/q17.sql
# --------------------------------------------------------------------------
def tpcds_q17_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q17's store-sales/store-returns/catalog-sales quantity panel:
    count/avg/stddev/cov of quantity per part computed over three
    disjoint subsets (store channel, returned lines, catalog channel)
    and inner-joined on part — three aggregate spines, one join key."""
    t = tables(spark, sf, "lineitem")
    li = t.lineitem

    def stats(cond, tag: str) -> DataFrame:
        # stddev/cov from exact decimal power sums (sum, sum-of-squares):
        # native STDDEV_SAMP is an order-dependent float reduction whose
        # engine-specific accumulation can cross the rounding boundary.
        # With exact sums pinned, both engines evaluate the SAME double
        # expression tree -> bit-identical results; variance is clamped
        # at 0 against cancellation noise for constant groups.
        n = F.count(F.lit(1))
        s1 = F.sum(D("l_quantity")).cast("double")
        s2 = F.sum(
            D(F.col("l_quantity") * F.col("l_quantity"), 28, 4)
        ).cast("double")
        var = F.greatest(F.lit(0.0), (s2 - s1 * s1 / n) / (n - 1))
        return (
            li.where(cond)
            .groupBy("l_partkey")
            .agg(
                n.alias(f"{tag}_cnt"),
                F.round(s1 / n, 6).alias(f"{tag}_avg"),
                F.round(F.sqrt(var), 6).alias(f"{tag}_std"),
                F.round(F.sqrt(var) / (s1 / n), 6).alias(f"{tag}_cov"),
            )
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
            "ss_cnt", "ss_avg", "ss_std", "ss_cov",
            "sr_cnt", "sr_avg", "sr_std", "sr_cov",
            "cs_cnt", "cs_avg", "cs_std", "cs_cov",
        )
        .orderBy("l_partkey")
        .limit(100)
    )


def _q17_stats_sql(cond: str, tag: str) -> str:
    # Mirrors the Spark side exactly: stddev/cov from exact decimal power
    # sums, same double expression tree, variance clamped at 0.
    s1 = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
    s2 = "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE)"
    var = f"GREATEST(0.0, ({s2} - {s1} * {s1} / COUNT(*)) / (COUNT(*) - 1))"
    return f"""
{tag} AS (
  SELECT l_partkey, COUNT(*) AS {tag}_cnt,
         ROUND({s1} / COUNT(*), 6) AS {tag}_avg,
         ROUND(SQRT({var}), 6) AS {tag}_std,
         ROUND(SQRT({var}) / ({s1} / COUNT(*)), 6) AS {tag}_cov
  FROM lineitem WHERE {cond}
  GROUP BY 1 HAVING COUNT(*) >= 3)"""


TPCDS_Q17_SQL = (
    "WITH "
    + _q17_stats_sql(f"{_chan_sql(_STORE)} AND l_returnflag <> 'R'", "ss")[1:]
    + ","
    + _q17_stats_sql("l_returnflag = 'R'", "sr")
    + ","
    + _q17_stats_sql(f"{_chan_sql(_CATALOG)} AND l_returnflag <> 'R'", "cs")
    + """
SELECT ss.l_partkey,
       ss_cnt, ss_avg, ss_std, ss_cov,
       sr_cnt, sr_avg, sr_std, sr_cov,
       cs_cnt, cs_avg, cs_std, cs_cov
FROM ss JOIN sr ON ss.l_partkey = sr.l_partkey
JOIN cs ON ss.l_partkey = cs.l_partkey
ORDER BY ss.l_partkey
LIMIT 100
"""
)


# --------------------------------------------------------------------------
# q31 shape: per-(nation, quarter) spines chained q1->q2->q3 across two
# channels. reference: benchmarks/queries-tpcds/q31.sql
# --------------------------------------------------------------------------
def tpcds_q31_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q31's county quarter-chain: per customer-nation quarterly
    revenue spines for the urgent and standard order channels, 6 aliases
    joined on nation so each row carries q1/q2/q3 of both channels;
    nations where the urgent channel accelerated faster than standard in
    BOTH quarter steps (decimal cross-multiplied)."""
    t = tables(spark, sf, "orders", "customer")
    o = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    base = o.where(F.year("o_orderdate") == 1995).select(
        "c_nationkey",
        F.quarter("o_orderdate").alias("q"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
        "o_totalprice",
    )
    spine = base.groupBy("c_nationkey", "q", "urgent").agg(
        F.sum(D("o_totalprice")).alias("tot")
    )

    def alias_q(qn: int, urgent: bool, tag: str) -> DataFrame:
        return spine.where(
            (F.col("q") == qn) & (F.col("urgent") == urgent)
        ).select(F.col("c_nationkey").alias(f"nk_{tag}"), F.col("tot").alias(tag))

    u1, u2, u3 = (alias_q(i, True, f"u{i}") for i in (1, 2, 3))
    s1, s2, s3 = (alias_q(i, False, f"s{i}") for i in (1, 2, 3))
    j = (
        u1.join(u2, F.col("nk_u1") == F.col("nk_u2"))
        .join(u3, F.col("nk_u1") == F.col("nk_u3"))
        .join(s1, F.col("nk_u1") == F.col("nk_s1"))
        .join(s2, F.col("nk_u1") == F.col("nk_s2"))
        .join(s3, F.col("nk_u1") == F.col("nk_s3"))
        .where(
            (F.col("u2") * F.col("s1") > F.col("u1") * F.col("s2"))
            & (F.col("u3") * F.col("s2") > F.col("u2") * F.col("s3"))
        )
    )
    return (
        j.select(
            F.col("nk_u1").alias("c_nationkey"),
            F.round(F.col("u2").cast("double") / F.col("u1").cast("double"), 6).alias("urgent_q1_q2"),
            F.round(F.col("u3").cast("double") / F.col("u2").cast("double"), 6).alias("urgent_q2_q3"),
            F.round(F.col("s2").cast("double") / F.col("s1").cast("double"), 6).alias("std_q1_q2"),
            F.round(F.col("s3").cast("double") / F.col("s2").cast("double"), 6).alias("std_q2_q3"),
        )
        .orderBy("c_nationkey")
    )


TPCDS_Q31_SQL = """
WITH spine AS (
  SELECT c_nationkey, quarter(o_orderdate) AS q,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1995
  GROUP BY 1, 2, 3)
SELECT u1.c_nationkey,
       ROUND(u2.tot / u1.tot, 6) AS urgent_q1_q2,
       ROUND(u3.tot / u2.tot, 6) AS urgent_q2_q3,
       ROUND(s2.tot / s1.tot, 6) AS std_q1_q2,
       ROUND(s3.tot / s2.tot, 6) AS std_q2_q3
FROM spine u1 JOIN spine u2 ON u1.c_nationkey = u2.c_nationkey
JOIN spine u3 ON u1.c_nationkey = u3.c_nationkey
JOIN spine s1 ON u1.c_nationkey = s1.c_nationkey
JOIN spine s2 ON u1.c_nationkey = s2.c_nationkey
JOIN spine s3 ON u1.c_nationkey = s3.c_nationkey
WHERE u1.q = 1 AND u1.urgent AND u2.q = 2 AND u2.urgent
  AND u3.q = 3 AND u3.urgent
  AND s1.q = 1 AND NOT s1.urgent AND s2.q = 2 AND NOT s2.urgent
  AND s3.q = 3 AND NOT s3.urgent
  AND u2.tot * s1.tot > u1.tot * s2.tot
  AND u3.tot * s2.tot > u2.tot * s3.tot
ORDER BY u1.c_nationkey
"""


# --------------------------------------------------------------------------
# q38 / q87 shapes: three-channel INTERSECT / EXCEPT chains -> COUNT.
# reference: benchmarks/queries-tpcds/q38.sql, q87.sql
# --------------------------------------------------------------------------
def _chan_cust_days(spark: SparkSession, sf: str, modes: int) -> DataFrame:
    t = tables(spark, sf, "lineitem", "orders")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(_chan(modes) & (F.year("o_orderdate") == 1995))
        .select("o_custkey", F.to_date("o_orderdate").alias("d"))
        .distinct()
    )


def tpcds_q38_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q38: customers active on the same day in ALL three channels —
    two INTERSECTs over distinct (customer, day) spines, then COUNT(*).
    Each INTERSECT is one hash shuffle on the distinct key."""
    a = _chan_cust_days(spark, sf, _STORE)
    b = _chan_cust_days(spark, sf, _WEB)
    c = _chan_cust_days(spark, sf, _CATALOG)
    return a.intersect(b).intersect(c).agg(
        F.count(F.lit(1)).alias("n_triple_channel")
    )


def _chan_cust_days_sql(modes: int) -> str:
    return f"""
  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE {_chan_sql(modes)} AND year(o_orderdate) = 1995"""


TPCDS_Q38_SQL = (
    "SELECT COUNT(*) AS n_triple_channel FROM (("
    + _chan_cust_days_sql(_STORE)
    + ") INTERSECT ("
    + _chan_cust_days_sql(_WEB)
    + ") INTERSECT ("
    + _chan_cust_days_sql(_CATALOG)
    + ")) t"
)


def tpcds_q87_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q87: store-channel (customer, day) pairs seen in NEITHER other
    channel — an EXCEPT chain over the same spines as q38, then COUNT."""
    a = _chan_cust_days(spark, sf, _STORE)
    b = _chan_cust_days(spark, sf, _WEB)
    c = _chan_cust_days(spark, sf, _CATALOG)
    return a.subtract(b).subtract(c).agg(
        F.count(F.lit(1)).alias("n_store_only")
    )


TPCDS_Q87_SQL = (
    "SELECT COUNT(*) AS n_store_only FROM (("
    + _chan_cust_days_sql(_STORE)
    + ") EXCEPT ("
    + _chan_cust_days_sql(_WEB)
    + ") EXCEPT ("
    + _chan_cust_days_sql(_CATALOG)
    + ")) t"
)


# --------------------------------------------------------------------------
# q47 shape: window-over-aggregate + rank-chain self-join for prev/next.
# reference: benchmarks/queries-tpcds/q47.sql (q57 is the same spine)
# --------------------------------------------------------------------------
def tpcds_q47_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q47's v1/v2 pattern: monthly brand revenue with an AVG window
    over the brand-year and a rank() chain over months, self-joined on
    rn-1/rn+1 to attach previous and next month revenue; keep months
    deviating >10% from the year average. Both windows partition by
    brand (never global); the rn self-join is spine-to-spine."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    v1 = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "p_brand",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("moy"),
        )
        .agg(F.sum(D("l_extendedprice")).alias("sum_sales"))
        .withColumn(
            # exact decimal window SUM / window COUNT, divided in double —
            # AVG(decimal) returns an order-dependent double in DuckDB,
            # and the engines' rounding can split at the 6th decimal
            "avg_monthly_sales",
            F.sum("sum_sales")
            .over(Window.partitionBy("p_brand", "y"))
            .cast("double")
            / F.count(F.lit(1)).over(Window.partitionBy("p_brand", "y")),
        )
        .withColumn(
            "rn",
            F.rank().over(Window.partitionBy("p_brand").orderBy("y", "moy")),
        )
    )
    lag = v1.select(
        F.col("p_brand").alias("b_lag"),
        F.col("rn").alias("rn_lag"),
        F.col("sum_sales").alias("psum"),
    )
    lead = v1.select(
        F.col("p_brand").alias("b_lead"),
        F.col("rn").alias("rn_lead"),
        F.col("sum_sales").alias("nsum"),
    )
    out = (
        v1.join(
            lag,
            (F.col("p_brand") == F.col("b_lag"))
            & (F.col("rn") == F.col("rn_lag") + 1),
        )
        .join(
            lead,
            (F.col("p_brand") == F.col("b_lead"))
            & (F.col("rn") == F.col("rn_lead") - 1),
        )
        .where(
            (F.col("y") == 1995)
            & (F.col("avg_monthly_sales") > 0)
            & (
                F.round(
                    F.abs(
                        F.col("sum_sales").cast("double")
                        - F.col("avg_monthly_sales").cast("double")
                    )
                    / F.col("avg_monthly_sales").cast("double"),
                    6,
                )
                > 0.1
            )
        )
    )
    return (
        out.select(
            "p_brand",
            "y",
            "moy",
            F.col("sum_sales").cast("double").alias("sum_sales"),
            F.round(F.col("avg_monthly_sales").cast("double"), 6).alias(
                "avg_monthly_sales"
            ),
            F.col("psum").cast("double").alias("psum"),
            F.col("nsum").cast("double").alias("nsum"),
        )
        .orderBy("p_brand", "y", "moy")
        .limit(100)
    )


TPCDS_Q47_SQL = """
WITH v1 AS (
  SELECT p_brand, year(o_orderdate) AS y, month(o_orderdate) AS moy,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_sales,
         CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(18,2))))
              OVER (PARTITION BY p_brand, year(o_orderdate)) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY p_brand, year(o_orderdate))
           AS avg_monthly_sales,
         RANK() OVER (PARTITION BY p_brand
                      ORDER BY year(o_orderdate), month(o_orderdate)) AS rn
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3)
SELECT v1.p_brand, v1.y, v1.moy,
       CAST(v1.sum_sales AS DOUBLE) AS sum_sales,
       ROUND(CAST(v1.avg_monthly_sales AS DOUBLE), 6) AS avg_monthly_sales,
       CAST(v_lag.sum_sales AS DOUBLE) AS psum,
       CAST(v_lead.sum_sales AS DOUBLE) AS nsum
FROM v1
JOIN v1 v_lag ON v1.p_brand = v_lag.p_brand AND v1.rn = v_lag.rn + 1
JOIN v1 v_lead ON v1.p_brand = v_lead.p_brand AND v1.rn = v_lead.rn - 1
WHERE v1.y = 1995 AND v1.avg_monthly_sales > 0
  AND ROUND(ABS(CAST(v1.sum_sales AS DOUBLE)
                - CAST(v1.avg_monthly_sales AS DOUBLE))
            / CAST(v1.avg_monthly_sales AS DOUBLE), 6) > 0.1
ORDER BY v1.p_brand, v1.y, v1.moy
LIMIT 100
"""


# --------------------------------------------------------------------------
# q94 shape: multi-supplier orders with no returned line -> COUNT(DISTINCT).
# reference: benchmarks/queries-tpcds/q94.sql
# --------------------------------------------------------------------------
def tpcds_q94_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q94's shipped-not-returned census: Q1-1995 orders whose lines
    span more than one supplier (semi-join on the COUNT(DISTINCT) spine)
    and with NO returned line (anti-join on the returned-order spine) —
    the q95 plan with the second membership probe inverted."""
    t = tables(spark, sf, "lineitem", "orders")
    multi = (
        t.lineitem.groupBy("l_orderkey")
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
            (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") <= 3)
        )
        .join(multi, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(
            ret_orders,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_anti",
        )
    )
    return sel.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.sum(D("o_totalprice")).cast("double").alias("total_price"),
    )


TPCDS_Q94_SQL = """
SELECT COUNT(DISTINCT o_orderkey) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3
  AND o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1)
  AND o_orderkey NOT IN (
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q4_shape": QuerySpec(tpcds_q4_shape, TPCDS_Q4_SQL),
    "tpcds_q17_shape": QuerySpec(tpcds_q17_shape, TPCDS_Q17_SQL),
    "tpcds_q31_shape": QuerySpec(tpcds_q31_shape, TPCDS_Q31_SQL),
    "tpcds_q38_shape": QuerySpec(tpcds_q38_shape, TPCDS_Q38_SQL),
    "tpcds_q47_shape": QuerySpec(tpcds_q47_shape, TPCDS_Q47_SQL),
    "tpcds_q87_shape": QuerySpec(tpcds_q87_shape, TPCDS_Q87_SQL),
    "tpcds_q94_shape": QuerySpec(tpcds_q94_shape, TPCDS_Q94_SQL),
}
