"""TPC-DS-shape mini-suite, tranche 8 (q21/q28/q58/q76) — continues
inventory/tpcds7.py toward the reference's 99-query CI gate.

- q21: before/after-pivot conditional sums per (nation, part) with an
  exact fraction band filter (2/3 <= after/before <= 3/2, cross-
  multiplied — no division in the predicate);
- q28: six quantity-band statistic blocks — avg price, DISTINCT price
  count, row count per band — computed in ONE conditional-aggregation
  pass (the reference text cross-joins six scalar subqueries; one scan
  is the scale-correct plan, and COUNT(DISTINCT CASE ...) preserves the
  per-band distinct semantics);
- q58: three-channel revenue agreement — items whose store/web/catalog
  revenues each sit within 10% of the three-channel average
  (cross-multiplied decimal band checks over three joined spines);
- q76: heterogeneous null/flag census — three differently-filtered
  projections UNION ALL'd and counted per (channel, reason).

Scale notes: q21/q28 are single-scan conditional aggregates; q58 joins
three per-item aggregate spines; q76 is a union of filtered projections
into one partial/final count — no unbounded joins anywhere.
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
# q21: before/after pivot-date quantity ratio band.
# --------------------------------------------------------------------------
def tpcds_q21_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q21's inventory-shift audit: per (supplier-nation, part),
    quantity shipped in the 60 days before vs after a pivot date; keep
    pairs where the after/before ratio stays within [2/3, 3/2] — checked
    as 2*before <= 3*after AND 2*after <= 3*before on exact bigint sums."""
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
                    F.col("l_shipdate") < F.lit(pivot).cast("date"),
                    F.col("l_quantity"),
                ).otherwise(0.0)
            )
            .cast("bigint")
            .alias("qty_before"),
            F.sum(
                F.when(
                    F.col("l_shipdate") >= F.lit(pivot).cast("date"),
                    F.col("l_quantity"),
                ).otherwise(0.0)
            )
            .cast("bigint")
            .alias("qty_after"),
        )
    )
    return (
        g.where(
            (F.col("qty_before") > 0)
            & (F.col("qty_after") > 0)
            & (2 * F.col("qty_before") <= 3 * F.col("qty_after"))
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
        )
        .select("n_name", "l_partkey", "qty_before", "qty_after")
        .orderBy("n_name", "l_partkey")
        .limit(100)
    )


TPCDS_Q21_SQL = """
WITH g AS (
  SELECT n_name, l_partkey,
    CAST(SUM(CASE WHEN l_shipdate < DATE '1995-06-01'
             THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_before,
    CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-06-01'
             THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_after
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_shipdate >= DATE '1995-06-01' - INTERVAL 60 DAY
    AND l_shipdate < DATE '1995-06-01' + INTERVAL 60 DAY
  GROUP BY 1, 2)
SELECT n_name, l_partkey, qty_before, qty_after
FROM g
WHERE qty_before > 0 AND qty_after > 0
  AND 2 * qty_before <= 3 * qty_after
  AND 2 * qty_after <= 3 * qty_before
ORDER BY n_name, l_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q28: six band statistic blocks in one pass (avg / distinct / count).
# --------------------------------------------------------------------------
_Q28_BANDS = [(0, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)]


def tpcds_q28_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q28's six list-price panels: per quantity band, the average
    extended price, the DISTINCT extended price count, and the row count.
    The reference cross-joins six scalar subqueries; here all eighteen
    statistics come from ONE scan (COUNT(DISTINCT CASE WHEN band THEN
    price END) keeps per-band distinct semantics — NULLs are ignored)."""
    li = tables(spark, sf, "lineitem").lineitem
    aggs = []
    for i, (lo, hi) in enumerate(_Q28_BANDS, start=1):
        band = F.col("l_quantity").between(lo, hi)
        priced = F.when(band, F.col("l_extendedprice"))
        n_band = F.sum(F.when(band, 1).otherwise(0))
        aggs += [
            # exact decimal sum / explicit band count — AVG(double) drifts
            # order-dependently at scale (sf1-gate finding, see tpcds11 q18)
            F.round(
                F.sum(D(priced)).cast("double") / F.nullif(n_band, F.lit(0)), 6
            ).alias(f"avg_price_{i}"),
            F.countDistinct(priced).alias(f"distinct_prices_{i}"),
            n_band.alias(f"n_{i}"),
        ]
    return li.agg(*aggs)


def _q28_block_sql(i: int, lo: int, hi: int) -> str:
    b = f"l_quantity BETWEEN {lo} AND {hi}"
    return (
        f"ROUND(CAST(SUM(CAST(CASE WHEN {b} THEN l_extendedprice END"
        f" AS DECIMAL(18,2))) AS DOUBLE)"
        f" / NULLIF(SUM(CASE WHEN {b} THEN 1 ELSE 0 END), 0), 6)"
        f" AS avg_price_{i}, "
        f"COUNT(DISTINCT CASE WHEN {b} THEN l_extendedprice END)"
        f" AS distinct_prices_{i}, "
        f"CAST(SUM(CASE WHEN {b} THEN 1 ELSE 0 END) AS BIGINT) AS n_{i}"
    )


TPCDS_Q28_SQL = (
    "SELECT "
    + ", ".join(
        _q28_block_sql(i, lo, hi)
        for i, (lo, hi) in enumerate(_Q28_BANDS, start=1)
    )
    + " FROM lineitem"
)


# --------------------------------------------------------------------------
# q58: three-channel revenue agreement within 10% of the average.
# --------------------------------------------------------------------------
def tpcds_q58_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q58's balanced items: parts whose store, web, AND catalog
    revenues each sit within 10% of the three-channel average — three
    per-part spines joined on the part key, the band checks done as
    decimal cross-multiplications (30*chan between 27*sum and 33*sum)."""
    t = tables(spark, sf, "lineitem")

    def spine(k: int, tag: str) -> DataFrame:
        return (
            t.lineitem.where(_chan(k))
            .groupBy(F.col("l_partkey").alias(f"pk_{tag}"))
            .agg(F.sum(_rev()).alias(tag))
        )

    s, w, c = spine(_STORE, "s_rev"), spine(_WEB, "w_rev"), spine(_CATALOG, "c_rev")
    j = (
        s.join(w, F.col("pk_s_rev") == F.col("pk_w_rev"))
        .join(c, F.col("pk_s_rev") == F.col("pk_c_rev"))
        .withColumn("total", F.col("s_rev") + F.col("w_rev") + F.col("c_rev"))
    )

    def in_band(col: str):
        return (F.col(col) * 30 >= F.col("total") * 9) & (
            F.col(col) * 30 <= F.col("total") * 11
        )

    return (
        j.where(in_band("s_rev") & in_band("w_rev") & in_band("c_rev"))
        .select(
            F.col("pk_s_rev").alias("l_partkey"),
            F.col("s_rev").cast("double").alias("store_rev"),
            F.col("w_rev").cast("double").alias("web_rev"),
            F.col("c_rev").cast("double").alias("catalog_rev"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


def _q58_spine_sql(k: int, tag: str) -> str:
    return (
        f"{tag} AS (SELECT l_partkey, SUM({_REV_SQL}) AS {tag}_v "
        f"FROM lineitem WHERE {_chan_sql(k)} GROUP BY l_partkey)"
    )


TPCDS_Q58_SQL = (
    "WITH "
    + ", ".join(
        _q58_spine_sql(k, t)
        for k, t in [(_STORE, "s"), (_WEB, "w"), (_CATALOG, "c")]
    )
    + """
SELECT s.l_partkey,
       CAST(s_v AS DOUBLE) AS store_rev,
       CAST(w_v AS DOUBLE) AS web_rev,
       CAST(c_v AS DOUBLE) AS catalog_rev
FROM s JOIN w ON s.l_partkey = w.l_partkey
JOIN c ON s.l_partkey = c.l_partkey
WHERE s_v * 30 >= (s_v + w_v + c_v) * 9
  AND s_v * 30 <= (s_v + w_v + c_v) * 11
  AND w_v * 30 >= (s_v + w_v + c_v) * 9
  AND w_v * 30 <= (s_v + w_v + c_v) * 11
  AND c_v * 30 >= (s_v + w_v + c_v) * 9
  AND c_v * 30 <= (s_v + w_v + c_v) * 11
ORDER BY s.l_partkey
LIMIT 100
"""
)


# --------------------------------------------------------------------------
# q76: heterogeneous filtered-projection union census.
# --------------------------------------------------------------------------
def tpcds_q76_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q76's null-column census: three differently-filtered
    projections of the fact (zero-discount, zero-tax, returned) UNION
    ALL'd with a reason tag and counted per (channel, reason) with the
    revenue at stake."""
    li = tables(spark, sf, "lineitem").lineitem
    chan = (
        F.when(F.col("l_linenumber") % 3 == _STORE, "store")
        .when(F.col("l_linenumber") % 3 == _WEB, "web")
        .otherwise("catalog")
    )

    def leg(cond, reason: str) -> DataFrame:
        return li.where(cond).select(
            chan.alias("channel"),
            F.lit(reason).alias("reason"),
            _rev().alias("rev"),
        )

    u = (
        leg(F.col("l_discount") == 0.0, "no_discount")
        .unionAll(leg(F.col("l_tax") == 0.0, "no_tax"))
        .unionAll(leg(F.col("l_returnflag") == "R", "returned"))
    )
    return (
        u.groupBy("channel", "reason")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("channel", "reason")
    )


def _q76_leg_sql(cond: str, reason: str) -> str:
    return f"""
  SELECT CASE l_linenumber % 3 WHEN {_STORE} THEN 'store'
              WHEN {_WEB} THEN 'web' ELSE 'catalog' END AS channel,
         '{reason}' AS reason, {_REV_SQL} AS rev
  FROM lineitem WHERE {cond}"""


TPCDS_Q76_SQL = (
    "SELECT channel, reason, COUNT(*) AS n_rows, "
    "CAST(SUM(rev) AS DOUBLE) AS revenue FROM ("
    + _q76_leg_sql("l_discount = 0.0", "no_discount")
    + "\n  UNION ALL\n"
    + _q76_leg_sql("l_tax = 0.0", "no_tax")
    + "\n  UNION ALL\n"
    + _q76_leg_sql("l_returnflag = 'R'", "returned")
    + "\n) u GROUP BY channel, reason ORDER BY channel, reason"
)


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q21_shape": QuerySpec(tpcds_q21_shape, TPCDS_Q21_SQL),
    "tpcds_q28_shape": QuerySpec(tpcds_q28_shape, TPCDS_Q28_SQL),
    "tpcds_q58_shape": QuerySpec(tpcds_q58_shape, TPCDS_Q58_SQL),
    "tpcds_q76_shape": QuerySpec(tpcds_q76_shape, TPCDS_Q76_SQL),
}
