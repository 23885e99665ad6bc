"""TPC-DS-shape mini-suite adapted to the driver's star schema.

The reference gates on all 99 TPC-DS queries in CI
(/root/reference/benchmarks/queries-tpcds/q1.sql..q99.sql,
.github/workflows/tpcds.yml:55-74). The fixture schema cannot host the
TPC-DS catalog verbatim, so — exactly as tpch.py does for TPC-H — each
query here reproduces the *operator shape* of a named TPC-DS query on the
fixture tables: repeated-CTE reuse, multi-channel UNION fan-out, wide
conditional aggregation, window-over-aggregate ranking, scalar-subquery
fan-in. The shape source is cited per query.

Determinism contract: decimal sums, identical aliases both sides, unique
sort tiebreakers, ROUND on genuine double math (see inventory/__init__).

Scale notes (100 TB):
- the repeated CTE (q1 shape) is expressed once and referenced twice —
  Catalyst plans both consumers against the same aggregate subtree; the
  threshold compare is decimal-multiplication only (no division), so no
  float boundary exists at any SF;
- global best/worst rankings (q44 shape) reduce via orderBy().limit(k)
  (TakeOrderedAndProject) BEFORE any no-PARTITION-BY window, the same
  bounded-window discipline as win_global_topk;
- rollups/conditional aggs are single-shuffle partial/final hash
  aggregates; the union fan-outs read each source once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, davg, dsum, tables


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


# --------------------------------------------------------------------------
# q1 shape: CTE defined once, consumed twice (row side + correlated scalar
# aggregate side). reference: benchmarks/queries-tpcds/q1.sql
# --------------------------------------------------------------------------
def tpcds_q1_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Customers whose total spend exceeds 1.2x their nation's average —
    ds q1's customer_total_return CTE reused twice. The avg threshold is
    decorrelated to a per-nation aggregate and compared with decimal
    multiplication (total*cnt*10 > nat_sum*12), exact on both engines."""
    t = tables(spark, sf, "orders", "customer")
    ct = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("o_custkey").alias("ctr_custkey"),
            F.col("c_nationkey").alias("ctr_nation"),
        )
        .agg(F.sum(D("o_totalprice")).alias("ctr_total"))
    )
    nat = ct.groupBy(F.col("ctr_nation").alias("na_nation")).agg(
        F.sum("ctr_total").alias("nat_sum"), F.count(F.lit(1)).alias("nat_cnt")
    )
    return (
        ct.join(nat, F.col("ctr_nation") == F.col("na_nation"))
        .where(
            F.col("ctr_total") * F.col("nat_cnt") * 10 > F.col("nat_sum") * 12
        )
        .join(t.customer, F.col("ctr_custkey") == F.col("c_custkey"))
        .select("c_name", F.col("ctr_total").cast("double").alias("total_spend"))
        .orderBy("c_name")
        .limit(100)
    )


TPCDS_Q1_SQL = """
WITH ct AS (
  SELECT o_custkey AS ctr_custkey, c_nationkey AS ctr_nation,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ctr_total
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2),
nat AS (
  SELECT ctr_nation, SUM(ctr_total) AS nat_sum, COUNT(*) AS nat_cnt
  FROM ct GROUP BY 1)
SELECT c_name, CAST(ctr_total AS DOUBLE) AS total_spend
FROM ct JOIN nat USING (ctr_nation)
JOIN customer ON ctr_custkey = c_custkey
WHERE ctr_total * nat_cnt * 10 > nat_sum * 12
ORDER BY c_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# q2 shape: two channels UNION'd, periodized, then period joined to
# period+1 for a ratio. reference: benchmarks/queries-tpcds/q2.sql
# --------------------------------------------------------------------------
def tpcds_q2_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Year-over-year monthly revenue ratio across the union of two order
    'channels' (urgent vs standard priority), ds q2's
    wscs-union -> weekly-sum -> y/y+1 self-join shape."""
    t = tables(spark, sf, "orders")
    urgent = t.orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    standard = t.orders.where(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    sales = urgent.select("o_orderdate", "o_totalprice").unionAll(
        standard.select("o_orderdate", "o_totalprice")
    )
    monthly = sales.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(D("o_totalprice")).alias("tot"))
    nxt = monthly.select(
        (F.col("y") - 1).alias("ny"),
        F.col("m").alias("nm"),
        F.col("tot").alias("ntot"),
    )
    return (
        monthly.join(nxt, (F.col("y") == F.col("ny")) & (F.col("m") == F.col("nm")))
        .select(
            "y",
            "m",
            F.col("tot").cast("double").alias("cur_total"),
            F.col("ntot").cast("double").alias("next_total"),
            F.round(
                F.col("tot").cast("double") / F.col("ntot").cast("double"), 6
            ).alias("yoy_ratio"),
        )
        .orderBy("y", "m")
    )


TPCDS_Q2_SQL = """
WITH sales AS (
  SELECT o_orderdate, o_totalprice FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  UNION ALL
  SELECT o_orderdate, o_totalprice FROM orders
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')),
monthly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM sales GROUP BY 1, 2)
SELECT a.y, a.m,
  CAST(a.tot AS DOUBLE) AS cur_total,
  CAST(b.tot AS DOUBLE) AS next_total,
  ROUND(CAST(a.tot AS DOUBLE) / CAST(b.tot AS DOUBLE), 6) AS yoy_ratio
FROM monthly a JOIN monthly b ON a.y = b.y - 1 AND a.m = b.m
ORDER BY a.y, a.m
"""


# --------------------------------------------------------------------------
# q5 shape: three channels UNION ALL'd into a (sales, returns) ledger,
# ROLLUP over (channel, id). reference: benchmarks/queries-tpcds/q5.sql
# --------------------------------------------------------------------------
def tpcds_q5_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Channel profit report: store (lineitem via supplier nation),
    catalog (orders via customer nation), web (events by synthetic nation),
    ROLLUP(channel, nation) — ds q5's salesreturns fan-out."""
    t = tables(spark, sf, "lineitem", "supplier", "orders", "customer", "events")
    store = (
        t.lineitem.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.lit("store").alias("channel"),
            F.col("s_nationkey").cast("int").alias("nation"),
            F.when(F.col("l_returnflag") != "R", _rev())
            .otherwise(F.lit(0).cast("decimal(27,4)"))
            .alias("sales"),
            F.when(F.col("l_returnflag") == "R", _rev())
            .otherwise(F.lit(0).cast("decimal(27,4)"))
            .alias("returns"),
        )
    )
    catalog = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.lit("catalog").alias("channel"),
            F.col("c_nationkey").cast("int").alias("nation"),
            D("o_totalprice", 27, 4).alias("sales"),
            F.lit(0).cast("decimal(27,4)").alias("returns"),
        )
    )
    web = t.events.select(
        F.lit("web").alias("channel"),
        (F.col("user_id") % 25).cast("int").alias("nation"),
        F.when(F.col("event_type") == "purchase", D("value", 27, 4))
        .otherwise(F.lit(0).cast("decimal(27,4)"))
        .alias("sales"),
        F.when(F.col("event_type") == "error", D("value", 27, 4))
        .otherwise(F.lit(0).cast("decimal(27,4)"))
        .alias("returns"),
    )
    ledger = store.unionAll(catalog).unionAll(web)
    return (
        ledger.rollup("channel", "nation")
        .agg(
            dsum(F.col("sales"), "total_sales"),
            dsum(F.col("returns"), "total_returns"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("channel").asc_nulls_first(), F.col("nation").asc_nulls_first()
        )
    )


TPCDS_Q5_SQL = f"""
WITH ledger AS (
  SELECT 'store' AS channel, CAST(s_nationkey AS INTEGER) AS nation,
    CASE WHEN l_returnflag <> 'R' THEN {_REV_SQL}
         ELSE CAST(0 AS DECIMAL(27,4)) END AS sales,
    CASE WHEN l_returnflag = 'R' THEN {_REV_SQL}
         ELSE CAST(0 AS DECIMAL(27,4)) END AS returns
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  UNION ALL
  SELECT 'catalog', CAST(c_nationkey AS INTEGER),
    CAST(o_totalprice AS DECIMAL(27,4)), CAST(0 AS DECIMAL(27,4))
  FROM orders JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'web', CAST(user_id % 25 AS INTEGER),
    CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(27,4))
         ELSE CAST(0 AS DECIMAL(27,4)) END,
    CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(27,4))
         ELSE CAST(0 AS DECIMAL(27,4)) END
  FROM events)
SELECT channel, nation,
  CAST(SUM(sales) AS DOUBLE) AS total_sales,
  CAST(SUM(returns) AS DOUBLE) AS total_returns,
  COUNT(*) AS n_rows
FROM ledger
GROUP BY ROLLUP (channel, nation)
ORDER BY channel ASC NULLS FIRST, nation ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# q34/q73 shape: per-customer count with HAVING BETWEEN, joined back to the
# dimension. reference: benchmarks/queries-tpcds/q34.sql, q73.sql
# --------------------------------------------------------------------------
def tpcds_q34_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Frequent buyers: customers with 3..8 high-priority orders — ds q34's
    ticket-count-BETWEEN shape (dn CTE + HAVING + dimension join)."""
    t = tables(spark, sf, "orders", "customer")
    freq = (
        t.orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders").between(3, 8))
    )
    return (
        freq.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_mktsegment", "n_orders")
        .orderBy(F.desc("n_orders"), "c_name")
    )


TPCDS_Q34_SQL = """
WITH freq AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_custkey HAVING COUNT(*) BETWEEN 3 AND 8)
SELECT c_name, c_mktsegment, n_orders
FROM freq JOIN customer ON o_custkey = c_custkey
ORDER BY n_orders DESC, c_name
"""


# --------------------------------------------------------------------------
# q44 shape: best and worst performers ranked independently, joined on
# rank. reference: benchmarks/queries-tpcds/q44.sql
# --------------------------------------------------------------------------
def tpcds_q44_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 best and worst parts by average lineitem revenue, paired by
    rank — ds q44's ascending/descending double ranking. Both rankings
    reduce via orderBy().limit(10) (TakeOrderedAndProject) before the
    10-row ranking window, so no full-cardinality global sort exists."""
    t = tables(spark, sf, "lineitem", "part")
    perf = t.lineitem.groupBy("l_partkey").agg(
        F.round(F.sum(_rev()).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_rev"
        )
    )

    def ranked(df: DataFrame, order: list, alias: str) -> DataFrame:
        top = df.orderBy(*order).limit(10)
        w = Window.orderBy(*order)
        return top.select(
            F.row_number().over(w).alias("rnk"),
            F.col("l_partkey").alias(f"{alias}_partkey"),
        )

    best = ranked(perf, [F.desc("avg_rev"), F.asc("l_partkey")], "best")
    worst = ranked(perf, [F.asc("avg_rev"), F.asc("l_partkey")], "worst")
    p = t.part.select("p_partkey", "p_name")
    return (
        best.join(worst, "rnk")
        .join(
            p.select(
                F.col("p_partkey").alias("bk"), F.col("p_name").alias("best_part")
            ),
            F.col("best_partkey") == F.col("bk"),
        )
        .join(
            p.select(
                F.col("p_partkey").alias("wk"), F.col("p_name").alias("worst_part")
            ),
            F.col("worst_partkey") == F.col("wk"),
        )
        .select("rnk", "best_part", "worst_part")
        .orderBy("rnk")
    )


TPCDS_Q44_SQL = f"""
WITH perf AS (
  SELECT l_partkey,
    ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE) / COUNT(*), 6) AS avg_rev
  FROM lineitem GROUP BY l_partkey),
best AS (
  SELECT ROW_NUMBER() OVER (ORDER BY avg_rev DESC, l_partkey) AS rnk,
         l_partkey FROM perf
  ORDER BY avg_rev DESC, l_partkey LIMIT 10),
worst AS (
  SELECT ROW_NUMBER() OVER (ORDER BY avg_rev ASC, l_partkey) AS rnk,
         l_partkey FROM perf
  ORDER BY avg_rev ASC, l_partkey LIMIT 10)
SELECT best.rnk AS rnk, pb.p_name AS best_part, pw.p_name AS worst_part
FROM best JOIN worst ON best.rnk = worst.rnk
JOIN part pb ON best.l_partkey = pb.p_partkey
JOIN part pw ON worst.l_partkey = pw.p_partkey
ORDER BY rnk
"""


# --------------------------------------------------------------------------
# q66 shape: wide conditional aggregation — 12 month-bucketed sums in one
# aggregate pass. reference: benchmarks/queries-tpcds/q66.sql
# --------------------------------------------------------------------------
def tpcds_q66_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly sales pivot per customer nation: CAST(CAST(CAST(CAST(CAST(SUM(CASE WHEN month=i ...)
    x12 in a single aggregate — ds q66's jan_sales..dec_sales block."""
    t = tables(spark, sf, "orders", "customer")
    o = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    aggs = [
        dsum(
            F.when(F.month("o_orderdate") == i, D("o_totalprice"))
            .otherwise(F.lit(0).cast("decimal(18,2)")),
            f"m{i:02d}_sales",
        )
        for i in range(1, 13)
    ]
    return (
        o.groupBy(F.col("c_nationkey").cast("int").alias("nation"))
        .agg(*aggs)
        .orderBy("nation")
    )


_MONTH_COLS = ",\n  ".join(
    "CAST(SUM(CASE WHEN month(o_orderdate) = {i} "
    "THEN CAST(o_totalprice AS DECIMAL(18,2)) "
    "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS m{i:02d}_sales".format(i=i)
    for i in range(1, 13)
)

TPCDS_Q66_SQL = f"""
SELECT CAST(c_nationkey AS INTEGER) AS nation,
  {_MONTH_COLS}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
ORDER BY nation
"""


# --------------------------------------------------------------------------
# q67 shape: window rank over a grouped aggregate, top-N per partition.
# reference: benchmarks/queries-tpcds/q67.sql
# --------------------------------------------------------------------------
def tpcds_q67_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 revenue months per order priority: groupBy aggregate, then
    rank() partitioned by priority — ds q67's rank-over-rollup shape. The
    window runs over aggregate output (|priorities| x 12 rows per key),
    partitioned — never a global sort."""
    t = tables(spark, sf, "orders")
    monthly = t.orders.groupBy(
        "o_orderpriority",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(D("o_totalprice")).alias("tot"))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("tot"), F.asc("y"), F.asc("m")
    )
    return (
        monthly.select(
            "o_orderpriority",
            "y",
            "m",
            F.col("tot").cast("double").alias("month_sales"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .orderBy("o_orderpriority", "rk")
    )


TPCDS_Q67_SQL = """
WITH monthly AS (
  SELECT o_orderpriority,
    CAST(year(o_orderdate) AS INTEGER) AS y,
    CAST(month(o_orderdate) AS INTEGER) AS m,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders
  GROUP BY 1, 2, 3)
SELECT * FROM (
  SELECT o_orderpriority, y, m,
    CAST(tot AS DOUBLE) AS month_sales,
    ROW_NUMBER() OVER (
      PARTITION BY o_orderpriority ORDER BY tot DESC, y, m) AS rk
  FROM monthly)
WHERE rk <= 3
ORDER BY o_orderpriority, rk
"""


# --------------------------------------------------------------------------
# q88 shape: N independent scalar-count subqueries cross-joined into one
# row. reference: benchmarks/queries-tpcds/q88.sql
# --------------------------------------------------------------------------
def tpcds_q88_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Eight 3-hour-bucket activity counts as independent scalar aggregates
    cross-joined into a single row — ds q88's s1..s8 shape. Each side is a
    genuine 1-row aggregate, so the cross joins are bounded broadcasts."""
    t = tables(spark, sf, "events")
    ev = t.events.where(F.col("event_type").isin("click", "view"))
    out = None
    for lo in range(0, 24, 3):
        c = (
            ev.where(F.hour("ts").between(lo, lo + 2))
            .agg(F.count(F.lit(1)).alias(f"h{lo:02d}_{lo + 2:02d}"))
        )
        out = c if out is None else out.crossJoin(F.broadcast(c))
    return out


_H_SUBQS = ",\n  ".join(
    "(SELECT COUNT(*) AS h{lo:02d}_{hi:02d} FROM events "
    "WHERE event_type IN ('click','view') "
    "AND hour(ts) BETWEEN {lo} AND {hi}) t{n}".format(lo=lo, hi=lo + 2, n=lo // 3)
    for lo in range(0, 24, 3)
)

TPCDS_Q88_SQL = f"""
SELECT * FROM
  {_H_SUBQS}
"""


# --------------------------------------------------------------------------
# q11 shape: one year_total CTE consumed FOUR times (two channels x two
# years), growth-ratio comparison. reference: benchmarks/queries-tpcds/q11.sql
# --------------------------------------------------------------------------
def tpcds_q11_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Customers whose urgent-channel spend grew faster year-over-year than
    their standard-channel spend (1997 -> 1998) — ds q11's four-way
    year_total self-join. The ratio compare is cross-multiplied decimal
    (u2*s1 > s2*u1), so no float division exists at any SF."""
    t = tables(spark, sf, "orders", "customer")
    yt = (
        t.orders.withColumn(
            "channel",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent"
            ).otherwise("standard"),
        )
        .groupBy(
            "o_custkey", F.year("o_orderdate").alias("y"), F.col("channel")
        )
        .agg(F.sum(D("o_totalprice")).alias("tot"))
    )

    def slice_(ch: str, y: int, alias: str):
        return yt.where((F.col("channel") == ch) & (F.col("y") == y)).select(
            F.col("o_custkey").alias(f"{alias}_ck"), F.col("tot").alias(alias)
        )

    u1, u2 = slice_("urgent", 1997, "u1"), slice_("urgent", 1998, "u2")
    s1, s2 = slice_("standard", 1997, "s1"), slice_("standard", 1998, "s2")
    return (
        u1.join(u2, F.col("u1_ck") == F.col("u2_ck"))
        .join(s1, F.col("u1_ck") == F.col("s1_ck"))
        .join(s2, F.col("u1_ck") == F.col("s2_ck"))
        .where(
            (F.col("u1") > 0)
            & (F.col("s1") > 0)
            & (F.col("u2") * F.col("s1") > F.col("s2") * F.col("u1"))
        )
        .join(t.customer, F.col("u1_ck") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("u1").cast("double").alias("urgent_1997"),
            F.col("u2").cast("double").alias("urgent_1998"),
            F.col("s1").cast("double").alias("standard_1997"),
            F.col("s2").cast("double").alias("standard_1998"),
        )
        .orderBy("c_custkey")
    )


TPCDS_Q11_SQL = """
WITH yt AS (
  SELECT o_custkey,
    CAST(year(o_orderdate) AS INTEGER) AS y,
    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         THEN 'urgent' ELSE 'standard' END AS channel,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders GROUP BY 1, 2, 3)
SELECT c_custkey, c_name,
  CAST(u1.tot AS DOUBLE) AS urgent_1997,
  CAST(u2.tot AS DOUBLE) AS urgent_1998,
  CAST(s1.tot AS DOUBLE) AS standard_1997,
  CAST(s2.tot AS DOUBLE) AS standard_1998
FROM yt u1
JOIN yt u2 ON u1.o_custkey = u2.o_custkey
JOIN yt s1 ON u1.o_custkey = s1.o_custkey
JOIN yt s2 ON u1.o_custkey = s2.o_custkey
JOIN customer ON u1.o_custkey = c_custkey
WHERE u1.channel = 'urgent' AND u1.y = 1997
  AND u2.channel = 'urgent' AND u2.y = 1998
  AND s1.channel = 'standard' AND s1.y = 1997
  AND s2.channel = 'standard' AND s2.y = 1998
  AND u1.tot > 0 AND s1.tot > 0
  AND u2.tot * s1.tot > s2.tot * u1.tot
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# q14 shape: cross-channel INTERSECT feeding the main aggregate.
# reference: benchmarks/queries-tpcds/q14.sql (cross_items CTE)
# --------------------------------------------------------------------------
def tpcds_q14_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue by brand over parts sold through BOTH order channels in 1997
    — ds q14's cross_items INTERSECT, then a semi-join-reduced aggregate."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    li97 = t.lineitem.join(
        t.orders.where(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    urgent = li97.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("l_partkey")
    standard = li97.where(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("l_partkey")
    cross_items = urgent.intersect(standard)
    return (
        t.lineitem.join(cross_items, "l_partkey", "left_semi")
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(_rev(), "revenue"),
        )
        .orderBy("p_brand")
    )


TPCDS_Q14_SQL = f"""
WITH li97 AS (
  SELECT l_partkey, o_orderpriority
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
cross_items AS (
  SELECT l_partkey FROM li97 WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  INTERSECT
  SELECT l_partkey FROM li97
  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
SELECT p_brand, COUNT(*) AS n_items,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
GROUP BY p_brand
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# q35 shape: OR of two correlated EXISTS + multi-stat conditional aggregate.
# reference: benchmarks/queries-tpcds/q35.sql
# --------------------------------------------------------------------------
def tpcds_q35_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Customer demographics for customers active in EITHER channel — ds
    q35's (EXISTS ws OR EXISTS cs) decorrelated as a semi join against the
    union of both channels' key sets, then count/avg/max/min stats."""
    t = tables(spark, sf, "orders", "customer")
    urgent_keys = t.orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.col("o_custkey"))
    big_keys = t.orders.where(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey")
    )
    active = urgent_keys.unionAll(big_keys)
    return (
        t.customer.join(
            active, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            davg(D("c_acctbal"), "avg_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


TPCDS_Q35_SQL = """
SELECT c_nationkey, c_mktsegment,
  COUNT(*) AS n_cust,
  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
    AS avg_bal,
  MAX(c_acctbal) AS max_bal,
  MIN(c_acctbal) AS min_bal
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
   OR EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_totalprice > 300000)
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""


# --------------------------------------------------------------------------
# q51 shape: two cumulative window series FULL OUTER joined and compared.
# reference: benchmarks/queries-tpcds/q51.sql
# --------------------------------------------------------------------------
def tpcds_q51_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Months where the urgent channel's cumulative revenue exceeds the
    standard channel's — ds q51's web_v1/store_v1 cumulative windows +
    FULL OUTER join. Cumulatives run in DECIMAL, partitioned by year (the
    window input is the monthly aggregate, so partitions are 12 rows)."""
    t = tables(spark, sf, "orders")

    def monthly(ch_filter, alias: str) -> DataFrame:
        w = Window.partitionBy("y").orderBy("m").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            t.orders.where(ch_filter)
            .groupBy(
                F.year("o_orderdate").alias("y"),
                F.month("o_orderdate").alias("m"),
            )
            .agg(F.sum(D("o_totalprice")).alias("tot"))
            .select(
                "y", "m", F.sum("tot").over(w).alias(f"cum_{alias}")
            )
        )

    u = monthly(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "u")
    s = monthly(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "s"
    ).select(F.col("y").alias("sy"), F.col("m").alias("sm"), "cum_s")
    return (
        u.join(
            s, (F.col("y") == F.col("sy")) & (F.col("m") == F.col("sm")), "full"
        )
        .where(
            F.col("cum_u").isNull()
            | F.col("cum_s").isNull()
            # urgent is 2 of 5 priorities vs standard's 3: compare against
            # the 2/3 parity line, cross-multiplied IN DECIMAL (before any
            # double cast) so both engines decide identically
            | (F.col("cum_u") * 3 > F.col("cum_s") * 2)
        )
        .select(
            F.coalesce("y", "sy").alias("y"),
            F.coalesce("m", "sm").alias("m"),
            F.col("cum_u").cast("double").alias("cum_urgent"),
            F.col("cum_s").cast("double").alias("cum_standard"),
        )
        .orderBy("y", "m")
    )


TPCDS_Q51_SQL = """
WITH u AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY 1, 2),
s AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY 1, 2),
uc AS (
  SELECT y, m, SUM(tot) OVER (PARTITION BY y ORDER BY m
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u
  FROM u),
sc AS (
  SELECT y, m, SUM(tot) OVER (PARTITION BY y ORDER BY m
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
  FROM s)
SELECT COALESCE(uc.y, sc.y) AS y, COALESCE(uc.m, sc.m) AS m,
  CAST(cum_u AS DOUBLE) AS cum_urgent,
  CAST(cum_s AS DOUBLE) AS cum_standard
FROM uc FULL OUTER JOIN sc ON uc.y = sc.y AND uc.m = sc.m
WHERE cum_u IS NULL OR cum_s IS NULL
   OR cum_u * 3 > cum_s * 2
ORDER BY y, m
"""


# --------------------------------------------------------------------------
# q36 shape: ROLLUP + GROUPING() + rank within each grouping level.
# reference: benchmarks/queries-tpcds/q36.sql (lochierarchy ranking)
# --------------------------------------------------------------------------
def tpcds_q36_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue ROLLUP over (priority, segment) with ds q36's lochierarchy
    pattern: GROUPING() builds the level indicator and a window ranks rows
    WITHIN each (level, parent) group — rank-over-grouping-sets, a combo no
    other inventory entry exercises. Ranking keys on exact decimal revenue
    with a name tiebreak, so no float order ambiguity."""
    t = tables(spark, sf, "orders", "customer")
    o = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
    rolled = o.rollup("o_orderpriority", "c_mktsegment").agg(
        F.sum(D("o_totalprice")).alias("rev"),
        # grouping() is only resolvable INSIDE the grouping-sets aggregate
        (F.grouping("o_orderpriority") + F.grouping("c_mktsegment")).alias(
            "lochierarchy"
        ),
        F.grouping("c_mktsegment").alias("g_seg"),
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_seg") == 1, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ),
    ).orderBy(F.desc("rev"), F.asc_nulls_first("c_mktsegment"))
    return (
        rolled.select(
            "o_orderpriority",
            "c_mktsegment",
            F.col("rev").cast("double").alias("total_rev"),
            "lochierarchy",
            F.row_number().over(w).alias("rank_within_parent"),
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("o_orderpriority"),
            "rank_within_parent",
        )
    )


TPCDS_Q36_SQL = """
WITH rolled AS (
  SELECT o_orderpriority, c_mktsegment,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
    GROUPING(o_orderpriority) + GROUPING(c_mktsegment) AS lochierarchy,
    GROUPING(c_mktsegment) AS g_seg
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY ROLLUP (o_orderpriority, c_mktsegment))
SELECT o_orderpriority, c_mktsegment,
  CAST(rev AS DOUBLE) AS total_rev,
  lochierarchy,
  ROW_NUMBER() OVER (
    PARTITION BY lochierarchy,
                 CASE WHEN g_seg = 1 THEN NULL ELSE o_orderpriority END
    ORDER BY rev DESC, c_mktsegment ASC NULLS FIRST) AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, o_orderpriority ASC NULLS FIRST,
         rank_within_parent
"""


# --------------------------------------------------------------------------
# q99 shape: latency-bucket wide conditional aggregation.
# reference: benchmarks/queries-tpcds/q99.sql (days-to-ship buckets)
# --------------------------------------------------------------------------
def tpcds_q99_shape(spark: SparkSession, sf: str) -> DataFrame:
    """Days-to-ship histogram per priority — ds q99's 30/60/90/120-day
    CASE buckets as one wide conditional aggregate over the order-lineitem
    join (single pass, map-side partial)."""
    t = tables(spark, sf, "orders", "lineitem")
    j = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_d"),
    )

    def bucket(lo: int | None, hi: int | None, alias: str):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("lag_d") > lo)
        if hi is not None:
            cond = cond & (F.col("lag_d") <= hi)
        return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)

    return (
        j.groupBy("o_orderpriority")
        .agg(
            bucket(None, 30, "d30"),
            bucket(30, 60, "d60"),
            bucket(60, 90, "d90"),
            bucket(90, 120, "d120"),
            bucket(120, None, "d_over_120"),
        )
        .orderBy("o_orderpriority")
    )


TPCDS_Q99_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
      THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
       AND date_diff('day', o_orderdate, l_shipdate) <= 60
      THEN 1 ELSE 0 END) AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
       AND date_diff('day', o_orderdate, l_shipdate) <= 90
      THEN 1 ELSE 0 END) AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
       AND date_diff('day', o_orderdate, l_shipdate) <= 120
      THEN 1 ELSE 0 END) AS BIGINT) AS d120,
  CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120
      THEN 1 ELSE 0 END) AS BIGINT) AS d_over_120
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q1_shape": QuerySpec(tpcds_q1_shape, TPCDS_Q1_SQL),
    "tpcds_q2_shape": QuerySpec(tpcds_q2_shape, TPCDS_Q2_SQL),
    "tpcds_q5_shape": QuerySpec(tpcds_q5_shape, TPCDS_Q5_SQL),
    "tpcds_q11_shape": QuerySpec(tpcds_q11_shape, TPCDS_Q11_SQL),
    "tpcds_q14_shape": QuerySpec(tpcds_q14_shape, TPCDS_Q14_SQL),
    "tpcds_q34_shape": QuerySpec(tpcds_q34_shape, TPCDS_Q34_SQL),
    "tpcds_q35_shape": QuerySpec(tpcds_q35_shape, TPCDS_Q35_SQL),
    "tpcds_q36_shape": QuerySpec(tpcds_q36_shape, TPCDS_Q36_SQL),
    "tpcds_q51_shape": QuerySpec(tpcds_q51_shape, TPCDS_Q51_SQL),
    "tpcds_q44_shape": QuerySpec(tpcds_q44_shape, TPCDS_Q44_SQL),
    "tpcds_q66_shape": QuerySpec(tpcds_q66_shape, TPCDS_Q66_SQL),
    "tpcds_q67_shape": QuerySpec(tpcds_q67_shape, TPCDS_Q67_SQL),
    "tpcds_q88_shape": QuerySpec(tpcds_q88_shape, TPCDS_Q88_SQL),
    "tpcds_q99_shape": QuerySpec(tpcds_q99_shape, TPCDS_Q99_SQL),
}
