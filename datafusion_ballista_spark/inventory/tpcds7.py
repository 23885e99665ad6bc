"""TPC-DS-shape mini-suite, tranche 7 (q9/q22/q37/q45/q48/q52/q61/q96) —
the compact tail of the named-shape census (inventory/tpcds6.py
precedes). Each reproduces a smaller but named TPC-DS pattern:

- q9: bucketed CASE over scalar aggregates — one conditional aggregate
  row feeding five CASE-selected outputs;
- q22: multi-level ROLLUP (brand, type-prefix, size) with average
  quantity per level;
- q37/q82 family: dim attribute band + fact-qty band, DISTINCT names;
- q45: predicate from an IN-list OR an IN-subquery (either source
  qualifies the row);
- q48: one sum over OR-of-AND band predicates (quantity x discount);
- q52/q42/q55 family: single-month brand revenue ranking;
- q61: promotional-to-total revenue ratio from two scalar aggregates;
- q96: straight multi-predicate count.

Scale notes: every entry is one or two partial/final aggregates over the
fact with bounded dim joins; the q9/q61 scalar sides are genuine 1-row
broadcasts (whitelisted in the plan audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, davg, tables

_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


# --------------------------------------------------------------------------
# q9: five quantity buckets, CASE-selected scalar statistics.
# --------------------------------------------------------------------------
def tpcds_q9_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q9's bucket report: for each of five l_quantity bands, emit the
    average discount if the band is populous (> 1000 lines) else the
    average tax — fifteen scalar aggregates folded into ONE conditional
    aggregation pass + five CASE projections (the reference text runs 15
    separate scalar subqueries; one pass is the scale-correct plan)."""
    li = tables(spark, sf, "lineitem").lineitem
    aggs = []
    for i, (lo, hi) in enumerate(
        [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
    ):
        band = F.col("l_quantity").between(lo, hi)
        # Conditional averages via exact decimal sums over an explicit
        # band count (AVG(double) is an order-dependent float sum — the
        # sf1 stress gate showed the class diverging from the oracle).
        n_band = F.sum(F.when(band, 1).otherwise(0))

        def cavg(col: str, alias: str):
            num = F.sum(D(F.when(band, F.col(col))))
            return F.round(
                num.cast("double") / F.nullif(n_band, F.lit(0)), 6
            ).alias(alias)

        aggs += [
            n_band.alias(f"cnt{i}"),
            cavg("l_discount", f"disc{i}"),
            cavg("l_tax", f"tax{i}"),
        ]
    one = li.agg(*aggs)
    return one.select(
        *[
            F.when(F.col(f"cnt{i}") > 1000, F.col(f"disc{i}"))
            .otherwise(F.col(f"tax{i}"))
            .alias(f"bucket{i}")
            for i in range(1, 6)
        ]
    )


def _q9_bucket_sql(i: int, lo: int, hi: int) -> str:
    b = f"l_quantity BETWEEN {lo} AND {hi}"

    def cavg(col: str) -> str:
        return (
            f"ROUND(CAST(SUM(CAST(CASE WHEN {b} THEN {col} END"
            f" AS DECIMAL(18,2))) AS DOUBLE)"
            f" / NULLIF(SUM(CASE WHEN {b} THEN 1 ELSE 0 END), 0), 6)"
        )

    return (
        f"CASE WHEN SUM(CASE WHEN {b} THEN 1 ELSE 0 END) > 1000 "
        f"THEN {cavg('l_discount')} "
        f"ELSE {cavg('l_tax')} END AS bucket{i}"
    )


TPCDS_Q9_SQL = (
    "SELECT "
    + ", ".join(
        _q9_bucket_sql(i, lo, hi)
        for i, (lo, hi) in enumerate(
            [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
        )
    )
    + " FROM lineitem"
)


# --------------------------------------------------------------------------
# q22: multi-level ROLLUP average.
# --------------------------------------------------------------------------
def tpcds_q22_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q22's inventory-health rollup: average quantity across a
    three-level ROLLUP (brand, type-prefix, size) — one grouping-sets
    aggregate, ordered by the average."""
    t = tables(spark, sf, "lineitem", "part")
    j = t.lineitem.join(t.part, F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.substring("p_type", 1, 6).alias("p_type6"),
        "p_size",
        "l_quantity",
    )
    return (
        j.rollup("p_brand", "p_type6", "p_size")
        .agg(
            davg(D("l_quantity"), "qoh"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.asc_nulls_first("p_brand"),
            F.asc_nulls_first("p_type6"),
            F.asc_nulls_first("p_size"),
        )
        .limit(100)
    )


TPCDS_Q22_SQL = """
SELECT p_brand, substr(p_type, 1, 6) AS p_type6, p_size,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS qoh, COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_brand, substr(p_type, 1, 6), p_size)
ORDER BY p_brand ASC NULLS FIRST, p_type6 ASC NULLS FIRST,
         p_size ASC NULLS FIRST
LIMIT 100
"""


# --------------------------------------------------------------------------
# q37/q82: attribute band + fact band, DISTINCT names.
# --------------------------------------------------------------------------
def tpcds_q37_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q37/q82's in-stock item listing: parts in a retail-price band
    whose 1995 order lines carry a quantity band — DISTINCT names via a
    semi-join (the fact probe never duplicates the dim side)."""
    t = tables(spark, sf, "lineitem", "part")
    qualifying = t.lineitem.where(
        (F.year("l_shipdate") == 1995)
        & F.col("l_quantity").between(10, 20)
    ).select("l_partkey")
    return (
        t.part.where(F.col("p_retailprice").between(1200, 1500))
        .join(qualifying, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(100)
    )


TPCDS_Q37_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice BETWEEN 1200 AND 1500
  AND p_partkey IN (
    SELECT l_partkey FROM lineitem
    WHERE year(l_shipdate) = 1995 AND l_quantity BETWEEN 10 AND 20)
ORDER BY p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q45: IN-list OR IN-subquery predicate.
# --------------------------------------------------------------------------
def tpcds_q45_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q45's either-source qualification: revenue per nation from
    customers qualifying EITHER by a literal key list OR by membership in
    a dim subquery (top-balance customers) — the OR of a local predicate
    and a membership probe, kept as one left-semi join against the
    union of both sources."""
    t = tables(spark, sf, "orders", "customer", "nation")
    literal_keys = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]
    rich = t.customer.where(F.col("c_acctbal") > 9900).select("c_custkey")
    qualify = (
        t.customer.where(F.col("c_custkey").isin(literal_keys))
        .select("c_custkey")
        .unionAll(rich)
        .distinct()
        .withColumnRenamed("c_custkey", "qk")
    )
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(qualify, F.col("c_custkey") == F.col("qk"), "left_semi")
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(D("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


_Q45_KEYS = "1, 2, 3, 5, 8, 13, 21, 34, 55, 89"

TPCDS_Q45_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN ({_Q45_KEYS})
   OR c_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
GROUP BY n_name
ORDER BY n_name
"""


# --------------------------------------------------------------------------
# q48: sum over OR-of-AND band predicates.
# --------------------------------------------------------------------------
def tpcds_q48_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q48's banded quantity total: one sum where each row qualifies
    through any of three (quantity band AND discount band) conjunctions —
    a single scan with a disjunctive residual, no join at all."""
    li = tables(spark, sf, "lineitem").lineitem
    p = (
        (F.col("l_quantity").between(1, 15) & F.col("l_discount").between(0.0, 0.03))
        | (F.col("l_quantity").between(16, 30) & F.col("l_discount").between(0.03, 0.06))
        | (F.col("l_quantity").between(31, 50) & F.col("l_discount").between(0.06, 0.10))
    )
    return li.where(p & (F.year("l_shipdate") == 1995)).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


TPCDS_Q48_SQL = """
SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       COUNT(*) AS n_lines
FROM lineitem
WHERE year(l_shipdate) = 1995
  AND ((l_quantity BETWEEN 1 AND 15 AND l_discount BETWEEN 0.0 AND 0.03)
    OR (l_quantity BETWEEN 16 AND 30 AND l_discount BETWEEN 0.03 AND 0.06)
    OR (l_quantity BETWEEN 31 AND 50 AND l_discount BETWEEN 0.06 AND 0.10))
"""


# --------------------------------------------------------------------------
# q52 (q42/q55 family): single-month brand revenue ranking.
# --------------------------------------------------------------------------
def tpcds_q52_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q52's monthly brand leaderboard: one month's revenue per brand,
    ordered by revenue (exact decimal) with the brand tiebreak."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 11)
        )
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.sum(_rev()).alias("brand_rev"))
    )
    return (
        rev.orderBy(F.desc("brand_rev"), F.asc("p_brand"))
        .limit(100)
        .select("p_brand", F.col("brand_rev").cast("double").alias("brand_rev"))
    )


TPCDS_Q52_SQL = f"""
SELECT p_brand, CAST(brand_rev AS DOUBLE) AS brand_rev FROM (
  SELECT p_brand, SUM({_REV_SQL}) AS brand_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 11
  GROUP BY p_brand
  ORDER BY brand_rev DESC, p_brand
  LIMIT 100) t
"""


# --------------------------------------------------------------------------
# q61: promotional-to-total revenue ratio (two scalars).
# --------------------------------------------------------------------------
def tpcds_q61_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q61's promo share: revenue through promotional parts (size <=
    5) over total revenue, both as 1-row scalar aggregates cross-joined —
    two genuine scalar broadcasts and a double division."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).where(F.year("o_orderdate") == 1995)
    promo = (
        base.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_size") <= 5)
        .agg(F.sum(_rev()).alias("promo_rev"))
    )
    total = base.agg(F.sum(_rev()).alias("total_rev"))
    return promo.crossJoin(F.broadcast(total)).select(
        F.col("promo_rev").cast("double").alias("promotions"),
        F.col("total_rev").cast("double").alias("total"),
        F.round(
            F.col("promo_rev").cast("double")
            * 100
            / F.col("total_rev").cast("double"),
            6,
        ).alias("promo_pct"),
    )


TPCDS_Q61_SQL = f"""
WITH promo AS (
  SELECT SUM({_REV_SQL}) AS promo_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995 AND p_size <= 5),
tot AS (
  SELECT SUM({_REV_SQL}) AS total_rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995)
SELECT CAST(promo_rev AS DOUBLE) AS promotions,
       CAST(total_rev AS DOUBLE) AS total,
       ROUND(CAST(promo_rev AS DOUBLE) * 100
             / CAST(total_rev AS DOUBLE), 6) AS promo_pct
FROM promo, tot
"""


# --------------------------------------------------------------------------
# q96: straight multi-predicate count.
# --------------------------------------------------------------------------
def tpcds_q96_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q96's gated count: lines in an urgent-priority order, small
    quantity, shipped in H1-1995 — a pure filter-count through two
    joined predicates."""
    t = tables(spark, sf, "lineitem", "orders")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("l_quantity") < 5)
            & (F.year("l_shipdate") == 1995)
            & (F.month("l_shipdate") <= 6)
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


TPCDS_Q96_SQL = """
SELECT COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND l_quantity < 5
  AND year(l_shipdate) = 1995 AND month(l_shipdate) <= 6
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q9_shape": QuerySpec(tpcds_q9_shape, TPCDS_Q9_SQL),
    "tpcds_q22_shape": QuerySpec(tpcds_q22_shape, TPCDS_Q22_SQL),
    "tpcds_q37_shape": QuerySpec(tpcds_q37_shape, TPCDS_Q37_SQL),
    "tpcds_q45_shape": QuerySpec(tpcds_q45_shape, TPCDS_Q45_SQL),
    "tpcds_q48_shape": QuerySpec(tpcds_q48_shape, TPCDS_Q48_SQL),
    "tpcds_q52_shape": QuerySpec(tpcds_q52_shape, TPCDS_Q52_SQL),
    "tpcds_q61_shape": QuerySpec(tpcds_q61_shape, TPCDS_Q61_SQL),
    "tpcds_q96_shape": QuerySpec(tpcds_q96_shape, TPCDS_Q96_SQL),
}
