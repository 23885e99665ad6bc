"""TPC-DS-shape mini-suite, tranche 5 (q33/q41/q46/q77/q90/q92) —
continues inventory/tpcds4.py toward the reference's 99-query CI gate.

Shapes (fixture mapping as before):

- q33: dim-subquery-filtered per-manufacturer (p_brand) revenue computed
  per channel, UNION ALL'd and re-aggregated into a total ranking;
- q41: correlated-EXISTS dim self-probe — product names whose brand has
  at least one item matching an OR-of-ANDs attribute pattern;
- q46: per-order aggregate join chain with a cross-entity inequality
  residual (supplier nation <> customer nation — ds's bought_city vs
  current_city);
- q77: per-channel sales and returns spines FULL OUTER joined per
  nation, UNION'd across channels, then ROLLUP(channel, nation);
- q90: am/pm activity ratio per event type (two conditional counts and
  their quotient — ds's morning/evening census over the events table);
- q92: correlated scalar-subquery threshold — discounts exceeding 1.3x
  their part's average discount, reduced to one total (decorrelated to a
  per-part aggregate join in Spark, verbatim-correlated in the oracle).

Scale notes (100 TB): dim probes are semi-joins on bounded dim spines;
channel spines aggregate before any join; the q92 threshold join is
fact-to-aggregate on the part key; q77's rollup runs over a
channels x nations spine (bounded). No driver-side loops, no unbounded
broadcasts.
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


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


# --------------------------------------------------------------------------
# q33 shape: dim-subquery filter + per-channel manufacturer totals UNION'd.
# reference: benchmarks/queries-tpcds/q33.sql
# --------------------------------------------------------------------------
def tpcds_q33_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q33's manufacturer roll-call: the qualifying manufacturer set
    comes from a dim subquery (brands carrying any PROMO-type part); each
    channel aggregates revenue per brand over that set (semi-join), the
    three spines UNION ALL and re-aggregate. The dim probe is bounded;
    each channel reads the fact once."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    promo_brands = (
        t.part.where(F.col("p_type").startswith("PROMO"))
        .select("p_brand")
        .distinct()
    )
    base = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 3)
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .join(promo_brands, "p_brand", "left_semi")
    )

    def channel(k: int) -> DataFrame:
        return (
            base.where(_chan(k))
            .groupBy("p_brand")
            .agg(F.sum(_rev()).alias("total_sales"))
        )

    u = channel(_STORE).unionAll(channel(_WEB)).unionAll(channel(_CATALOG))
    return (
        u.groupBy("p_brand")
        .agg(F.sum("total_sales").cast("double").alias("total_sales"))
        .orderBy("p_brand")
        .limit(100)
    )


def _q33_channel_sql(k: int) -> str:
    return f"""
  SELECT p_brand, SUM({_REV_SQL}) AS total_sales
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 3
    AND {_chan_sql(k)}
    AND p_brand IN (SELECT DISTINCT p_brand FROM part
                    WHERE p_type LIKE 'PROMO%')
  GROUP BY p_brand"""


TPCDS_Q33_SQL = (
    "SELECT p_brand, CAST(SUM(total_sales) AS DOUBLE) AS total_sales FROM ("
    + _q33_channel_sql(_STORE)
    + "\n  UNION ALL\n"
    + _q33_channel_sql(_WEB)
    + "\n  UNION ALL\n"
    + _q33_channel_sql(_CATALOG)
    + "\n) u GROUP BY p_brand ORDER BY p_brand LIMIT 100"
)


# --------------------------------------------------------------------------
# q41 shape: correlated EXISTS over the item dim with OR-of-ANDs.
# reference: benchmarks/queries-tpcds/q41.sql
# --------------------------------------------------------------------------
def tpcds_q41_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q41's manufacturer attribute probe: distinct product names in a
    key range whose BRAND carries at least one part matching an
    OR-of-ANDs pattern — the correlated COUNT(*)>0 subquery expressed as
    a semi-join against the matching-brand dim spine (Catalyst's own
    EXISTS decorrelation)."""
    t = tables(spark, sf, "part")
    p = t.part
    pattern = (
        (
            F.col("p_type").startswith("STANDARD")
            & (F.col("p_size") < 10)
        )
        | (
            F.col("p_type").startswith("SMALL")
            & F.col("p_size").between(10, 25)
        )
        | (
            F.col("p_type").startswith("LARGE")
            & (F.col("p_size") > 40)
        )
    )
    match_brands = p.where(pattern).select("p_brand").distinct()
    return (
        p.where(F.col("p_partkey").between(500, 1200))
        .join(match_brands, "p_brand", "left_semi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(100)
    )


TPCDS_Q41_SQL = """
SELECT DISTINCT p_name
FROM part p1
WHERE p_partkey BETWEEN 500 AND 1200
  AND EXISTS (
    SELECT 1 FROM part
    WHERE p_brand = p1.p_brand
      AND ((p_type LIKE 'STANDARD%' AND p_size < 10)
        OR (p_type LIKE 'SMALL%' AND p_size BETWEEN 10 AND 25)
        OR (p_type LIKE 'LARGE%' AND p_size > 40)))
ORDER BY p_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# q46 shape: per-order aggregate + cross-entity inequality residual.
# reference: benchmarks/queries-tpcds/q46.sql
# --------------------------------------------------------------------------
def tpcds_q46_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q46's bought-city vs home-city report: weekend orders
    aggregated per (order, customer, supplier-nation), then joined to the
    customer's own nation keeping only cross-nation purchases (the
    ca_city <> bought_city residual). The per-order aggregate shuffles
    once on the order key; the customer join is key-equi with the
    inequality as a post-join filter."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "supplier", "nation")
    n2 = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("home_nation")
    )
    dn = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.dayofweek("o_orderdate").isin(1, 7))  # weekend
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "l_orderkey",
            "o_custkey",
            F.col("n_name").alias("bought_nation"),
        )
        .agg(
            F.sum(_rev()).alias("amt"),
            F.count(F.lit(1)).alias("n_lines"),
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
            "n_lines",
        )
        .orderBy("c_name", "l_orderkey", "bought_nation")
        .limit(100)
    )


TPCDS_Q46_SQL = f"""
WITH dn AS (
  SELECT l_orderkey, o_custkey, n_name AS bought_nation,
         SUM({_REV_SQL}) AS amt, COUNT(*) AS n_lines
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE dayofweek(o_orderdate) IN (0, 6)
  GROUP BY 1, 2, 3)
SELECT c_name, n2.n_name AS home_nation, bought_nation, l_orderkey,
       CAST(amt AS DOUBLE) AS amt, n_lines
FROM dn
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n2.n_name <> bought_nation
ORDER BY c_name, l_orderkey, bought_nation
LIMIT 100
"""


# --------------------------------------------------------------------------
# q77 shape: per-channel sales/returns FULL OUTER spines + ROLLUP.
# reference: benchmarks/queries-tpcds/q77.sql
# --------------------------------------------------------------------------
def tpcds_q77_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q77's channel P&L: per channel, the sales spine (non-returned
    revenue per nation) FULL OUTER joins the returns spine (returned
    revenue per nation); the three channel results UNION ALL and ROLLUP
    over (channel, nation) with grand totals. All spines are bounded
    (channels x nations); the rollup is one grouping-sets aggregate."""
    t = tables(spark, sf, "lineitem", "supplier", "nation")
    base = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
    )

    def channel(k: int, name: str) -> DataFrame:
        sales = (
            base.where(_chan(k) & (F.col("l_returnflag") != "R"))
            .groupBy(F.col("n_name").alias("s_nation"))
            .agg(F.sum(_rev()).alias("sales"))
        )
        returns = (
            base.where(_chan(k) & (F.col("l_returnflag") == "R"))
            .groupBy(F.col("n_name").alias("r_nation"))
            .agg(F.sum(_rev()).alias("returns"))
        )
        return (
            sales.join(
                returns, F.col("s_nation") == F.col("r_nation"), "full_outer"
            )
            .select(
                F.lit(name).alias("channel"),
                F.coalesce(F.col("s_nation"), F.col("r_nation")).alias(
                    "nation"
                ),
                F.coalesce(F.col("sales"), F.lit(0).cast("decimal(27,4)")).alias(
                    "sales"
                ),
                F.coalesce(
                    F.col("returns"), F.lit(0).cast("decimal(27,4)")
                ).alias("returns"),
            )
        )

    u = (
        channel(_STORE, "store")
        .unionAll(channel(_WEB, "web"))
        .unionAll(channel(_CATALOG, "catalog"))
    )
    return (
        u.rollup("channel", "nation")
        .agg(
            F.sum("sales").cast("double").alias("sales"),
            F.sum("returns").cast("double").alias("returns"),
        )
        .orderBy(
            F.asc_nulls_first("channel"), F.asc_nulls_first("nation")
        )
    )


def _q77_channel_sql(k: int, name: str) -> str:
    return f"""
  SELECT '{name}' AS channel,
         COALESCE(s.n_name, r.n_name) AS nation,
         COALESCE(sales, CAST(0 AS DECIMAL(27,4))) AS sales,
         COALESCE(returns, CAST(0 AS DECIMAL(27,4))) AS returns
  FROM (SELECT n_name, SUM({_REV_SQL}) AS sales
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE {_chan_sql(k)} AND l_returnflag <> 'R' GROUP BY n_name) s
  FULL OUTER JOIN
       (SELECT n_name, SUM({_REV_SQL}) AS returns
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE {_chan_sql(k)} AND l_returnflag = 'R' GROUP BY n_name) r
    ON s.n_name = r.n_name"""


TPCDS_Q77_SQL = (
    "SELECT channel, nation, CAST(SUM(sales) AS DOUBLE) AS sales, "
    "CAST(SUM(returns) AS DOUBLE) AS returns FROM ("
    + _q77_channel_sql(_STORE, "store")
    + "\n  UNION ALL\n"
    + _q77_channel_sql(_WEB, "web")
    + "\n  UNION ALL\n"
    + _q77_channel_sql(_CATALOG, "catalog")
    + """
) u GROUP BY ROLLUP (channel, nation)
ORDER BY channel ASC NULLS FIRST, nation ASC NULLS FIRST"""
)


# --------------------------------------------------------------------------
# q90 shape: am/pm conditional-count ratio.
# reference: benchmarks/queries-tpcds/q90.sql
# --------------------------------------------------------------------------
def tpcds_q90_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q90's am_pm_ratio over the events table: morning (06-11) vs
    evening (18-23) event counts per type and their quotient — one
    conditional aggregate, ratio in DOUBLE on both sides."""
    e = tables(spark, sf, "events").events
    h = F.hour("ts")
    g = e.groupBy("event_type").agg(
        F.sum(F.when(h.between(6, 11), 1).otherwise(0)).alias("am_cnt"),
        F.sum(F.when(h.between(18, 23), 1).otherwise(0)).alias("pm_cnt"),
    )
    return g.select(
        "event_type",
        "am_cnt",
        "pm_cnt",
        F.round(
            F.col("am_cnt").cast("double")
            / F.nullif(F.col("pm_cnt"), F.lit(0)).cast("double"),
            6,
        ).alias("am_pm_ratio"),
    ).orderBy("event_type")


TPCDS_Q90_SQL = """
SELECT event_type,
  CAST(SUM(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
       AS BIGINT) AS am_cnt,
  CAST(SUM(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 ELSE 0 END)
       AS BIGINT) AS pm_cnt,
  ROUND(CAST(SUM(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
             AS DOUBLE)
        / NULLIF(CAST(SUM(CASE WHEN hour(ts) BETWEEN 18 AND 23
                          THEN 1 ELSE 0 END) AS DOUBLE), 0), 6)
    AS am_pm_ratio
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# q92 shape: correlated scalar-subquery discount threshold.
# reference: benchmarks/queries-tpcds/q92.sql
# --------------------------------------------------------------------------
def tpcds_q92_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q92's excess-discount amount: lines whose discount exceeds 1.3x
    their part's average discount, totaled. Spark decorrelates to a
    per-part average join (fact-to-aggregate on the part key); the
    oracle keeps the verbatim correlated scalar subquery."""
    t = tables(spark, sf, "lineitem")
    li = t.lineitem.where(F.year("l_shipdate") == 1995)
    # exact decimal sum / count for the threshold average (see tpcds11 q32)
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


TPCDS_Q92_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS excess_discount_amount,
       COUNT(*) AS n_lines
FROM lineitem l1
WHERE year(l_shipdate) = 1995
  AND l_discount > 1.3 * (
    SELECT CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey AND year(l2.l_shipdate) = 1995)
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q33_shape": QuerySpec(tpcds_q33_shape, TPCDS_Q33_SQL),
    "tpcds_q41_shape": QuerySpec(tpcds_q41_shape, TPCDS_Q41_SQL),
    "tpcds_q46_shape": QuerySpec(tpcds_q46_shape, TPCDS_Q46_SQL),
    "tpcds_q77_shape": QuerySpec(tpcds_q77_shape, TPCDS_Q77_SQL),
    "tpcds_q90_shape": QuerySpec(tpcds_q90_shape, TPCDS_Q90_SQL),
    "tpcds_q92_shape": QuerySpec(tpcds_q92_shape, TPCDS_Q92_SQL),
}
