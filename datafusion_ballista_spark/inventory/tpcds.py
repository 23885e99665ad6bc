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
from datafusion_ballista_spark.inventory.util import D, dsum, tables


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
    """Monthly sales pivot per customer nation: SUM(CASE WHEN month=i ...)
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


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q1_shape": QuerySpec(tpcds_q1_shape, TPCDS_Q1_SQL),
    "tpcds_q2_shape": QuerySpec(tpcds_q2_shape, TPCDS_Q2_SQL),
    "tpcds_q5_shape": QuerySpec(tpcds_q5_shape, TPCDS_Q5_SQL),
    "tpcds_q34_shape": QuerySpec(tpcds_q34_shape, TPCDS_Q34_SQL),
    "tpcds_q44_shape": QuerySpec(tpcds_q44_shape, TPCDS_Q44_SQL),
    "tpcds_q66_shape": QuerySpec(tpcds_q66_shape, TPCDS_Q66_SQL),
    "tpcds_q67_shape": QuerySpec(tpcds_q67_shape, TPCDS_Q67_SQL),
    "tpcds_q88_shape": QuerySpec(tpcds_q88_shape, TPCDS_Q88_SQL),
}
