"""Window-function inventory (SURVEY.md §2.6).

Reference surface: DataFusion's default window functions registered in
ballista/core/src/registry.rs:63-67 (row_number, rank, dense_rank,
percent_rank, cume_dist, ntile, lag, lead, first_value, last_value,
nth_value), aggregates-over-windows (WindowExprNode, datafusion.proto:571-587),
ROWS/RANGE frames (:647-673), null treatment (:674-681), exercised by the
h2o window suite (benchmarks/queries/h2o/window.sql).

Determinism contract: every ORDER BY inside a window either ends in a unique
tiebreaker (event_id) or feeds a tie-insensitive function (rank/dense_rank,
RANGE frames include peers). Windowed sums run over DECIMAL so sliding-frame
accumulation order (Spark running-sum vs DuckDB segment tree) cannot produce
float noise.

Scale notes (100 TB): all partitioned windows shuffle once on the partition
key and sort within partitions — the same plan shape at any SF; skewed
partition keys are the risk, mitigated by AQE skew handling. The
no-PARTITION-BY query (win_global_topk) reduces to a k-row
TakeOrderedAndProject BEFORE windowing, so its single partition is bounded
by k, not table size (the reference attacks the same problem with range
repartition + halo, partitioned_bounded_window_agg.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, tables


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return tables(spark, sf, "events").events


def win_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """row_number / rank / dense_rank per event_type; top-5 by row_number.

    reference: registry.rs:63-67; ROW_NUMBER in benchmarks/queries/h2o/groupby.sql:15
    """
    e = _events(spark, sf)
    w_unique = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    w_ties = Window.partitionBy("event_type").orderBy(F.desc("value"))
    return (
        e.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_ties).alias("rk"),
            F.dense_rank().over(w_ties).alias("drk"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("event_type", "rn")
    )


WIN_RANKING_SQL = """
SELECT * FROM (
  SELECT event_type, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn,
    RANK() OVER (PARTITION BY event_type ORDER BY value DESC) AS rk,
    DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value DESC) AS drk
  FROM events)
WHERE rn <= 5
ORDER BY event_type, rn
"""


def win_ntile_pct(spark: SparkSession, sf: str) -> DataFrame:
    """ntile / percent_rank / cume_dist (exact-rational doubles, no noise)."""
    e = _events(spark, sf).where(F.col("user_id") < 10)
    w_unique = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    w_ties = Window.partitionBy("user_id").orderBy("value")
    return e.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w_unique).alias("quartile"),
        F.percent_rank().over(w_ties).alias("pct_rank"),
        F.cume_dist().over(w_ties).alias("cdist"),
    ).orderBy("user_id", "event_id")


WIN_NTILE_SQL = """
SELECT user_id, event_id,
  NTILE(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS quartile,
  PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank,
  CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS cdist
FROM events WHERE user_id < 10
ORDER BY user_id, event_id
"""


def win_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead with offset + default (reference WindowExprNode args)."""
    e = _events(spark, sf).where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_neg1"),
    ).orderBy("user_id", "event_id")


WIN_LAG_LEAD_SQL = """
SELECT user_id, event_id, value,
  LAG(value, 1) OVER w AS prev_value,
  LEAD(value, 1) OVER w AS next_value,
  LAG(value, 2, -1.0) OVER w AS prev2_or_neg1
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


def win_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """IGNORE NULLS treatment (datafusion.proto:674-681): last non-null
    before current row == lag-ignore-nulls, via frame-bounded last_value."""
    e = _events(spark, sf).where(F.col("user_id") < 20).withColumn(
        "v_n", F.when(F.col("event_type") != "error", F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_frame = w.rowsBetween(Window.unboundedPreceding, -1)
    full_frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "v_n",
        F.last("v_n", ignorenulls=True).over(prev_frame).alias("last_nn_before"),
        F.first("v_n", ignorenulls=True).over(full_frame).alias("first_nn"),
        F.nth_value("v_n", 2, ignoreNulls=True).over(full_frame).alias("second_nn"),
    ).orderBy("user_id", "event_id")


WIN_IGNORE_NULLS_SQL = """
SELECT user_id, event_id, v_n,
  LAST_VALUE(v_n IGNORE NULLS) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_nn_before,
  FIRST_VALUE(v_n IGNORE NULLS) OVER w2 AS first_nn,
  NTH_VALUE(v_n, 2 IGNORE NULLS) OVER w2 AS second_nn
FROM (SELECT *, CASE WHEN event_type <> 'error' THEN value END AS v_n
      FROM events WHERE user_id < 20)
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
"""


def win_running_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregates over windows: running sum/count/min/max (exact decimal)."""
    e = _events(spark, sf).where(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(D("value")).over(w).cast("double").alias("run_sum"),
        F.count(F.lit(1)).over(w).alias("run_cnt"),
        F.min("value").over(w).alias("run_min"),
        F.max("value").over(w).alias("run_max"),
    ).orderBy("user_id", "event_id")


WIN_RUNNING_SQL = """
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_sum,
  COUNT(*) OVER w AS run_cnt,
  MIN(value) OVER w AS run_min,
  MAX(value) OVER w AS run_max
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def win_rows_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding ROWS frame (3 PRECEDING..CURRENT): moving decimal avg."""
    e = _events(spark, sf).where(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(D("value")).over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("mov_avg"),
    ).orderBy("user_id", "event_id")


WIN_ROWS_FRAME_SQL = """
SELECT user_id, event_id,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        / COUNT(*) OVER w, 6) AS mov_avg
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def win_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame with a numeric offset (tie-insensitive: peers included).

    Counts orders whose o_totalprice lies within 1000 below the current
    row's, per priority — a value-based frame, not a row-based one.
    """
    t = tables(spark, sf, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return (
        t.orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_within_1000"),
            F.sum(D("o_totalprice")).over(w).cast("double").alias("sum_within_1000"),
        )
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


WIN_RANGE_FRAME_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
  COUNT(*) OVER w AS n_within_1000,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_within_1000
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
ORDER BY o_orderpriority, o_totalprice, o_orderkey
"""


def win_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """Default-frame aggregate over window: share of partition total."""
    e = _events(spark, sf).where(F.col("user_id") < 10)
    w = Window.partitionBy("event_type")
    return e.select(
        "event_type",
        "event_id",
        F.round(
            D("value").cast("double")
            / F.sum(D("value")).over(w).cast("double"),
            9,
        ).alias("share"),
    ).orderBy("event_type", "event_id")


WIN_SHARE_SQL = """
SELECT event_type, event_id,
  ROUND(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)
        / CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY event_type) AS DOUBLE),
        9) AS share
FROM events WHERE user_id < 10
ORDER BY event_type, event_id
"""


def win_global_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-100 + running total, scale-safely: ``orderBy().limit(100)``
    compiles to TakeOrderedAndProject (per-partition top-100 heaps merged at
    k rows — never a full global sort), and only then does the
    no-PARTITION-BY window run, over exactly 100 rows. Ranking the full
    table first would single-partition-sort all of it — the problem the
    reference built PartitionedBoundedWindowAggExec +
    OrderedRangeRepartitionExec to avoid
    (ballista/core/src/execution_plans/partitioned_bounded_window_agg.rs:17-60).
    The rewrite is exact: ranks and prefix sums of the top-100 rows only
    involve rows within the top 100."""
    e = _events(spark, sf)
    top = (
        e.select("event_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
    )
    w = Window.orderBy(F.desc("value"), F.asc("event_id"))
    return top.select(
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.sum(D("value")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("double").alias("run_total"),
    ).orderBy("rn")


WIN_GLOBAL_SQL = """
SELECT * FROM (
  SELECT event_id, value,
    ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rn,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      (ORDER BY value DESC, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
  FROM events)
WHERE rn <= 100
ORDER BY rn
"""


def win_first_last_nth(spark: SparkSession, sf: str) -> DataFrame:
    """first/last/nth_value over an explicit full frame, one row per group."""
    e = _events(spark, sf)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "event_type",
            F.first("event_id").over(w).alias("top_event"),
            F.last("event_id").over(w).alias("bottom_event"),
            F.nth_value("event_id", 3).over(w).alias("third_event"),
        )
        .distinct()
        .orderBy("event_type")
    )


WIN_FIRST_LAST_SQL = """
SELECT DISTINCT event_type,
  FIRST_VALUE(event_id) OVER w AS top_event,
  LAST_VALUE(event_id) OVER w AS bottom_event,
  NTH_VALUE(event_id, 3) OVER w AS third_event
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY event_type
"""


def win_global_rownumber_dist(spark: SparkSession, sf: str) -> DataFrame:
    """FULL-table global row numbering WITHOUT a single-partition sort —
    the reference's PartitionedBoundedWindowAggExec
    (partitioned_bounded_window_agg.rs:17-60) as a Spark operator
    (operators/global_window.py): range shuffle, per-partition windows,
    offset stitching. Every 97th rank is emitted so the oracle match
    proves the offsets are exact across the entire range, not just at the
    top (win_global_topk already covers the bounded-k case)."""
    from datafusion_ballista_spark.operators import global_row_number

    e = _events(spark, sf).select("event_id", "value")
    ranked = global_row_number(
        e, [F.desc("value"), F.asc("event_id")], out_col="rn"
    )
    return (
        ranked.where(F.col("rn") % 97 == 0)
        .select("rn", "event_id", "value")
        .orderBy("rn")
    )


WIN_GLOBAL_RN_SQL = """
SELECT rn, event_id, value FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rn,
         event_id, value
  FROM events)
WHERE rn % 97 = 0
ORDER BY rn
"""


def win_global_rank_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Full-table ``rank()`` with real ties, distributed — extends the
    offset-stitched global window operator (operators/global_window.py)
    beyond row_number: repartitionByRange keeps a tie group inside one
    partition, so local rank + prior-partition row counts is exact. Every
    97th rank is emitted to prove offsets across the whole range."""
    from datafusion_ballista_spark.operators import global_rank

    e = _events(spark, sf).select("event_id", "value")
    ranked = global_rank(e, [F.desc("value")], out_col="rnk")
    return (
        ranked.where(F.col("rnk") % 97 == 0)
        .select("rnk", "event_id", "value")
        .orderBy("rnk", "event_id")
    )


WIN_GLOBAL_RANK_SQL = """
SELECT rnk, event_id, value FROM (
  SELECT CAST(RANK() OVER (ORDER BY value DESC) AS BIGINT) AS rnk,
         event_id, value
  FROM events)
WHERE rnk % 97 = 0
ORDER BY rnk, event_id
"""


def win_global_dense_rank_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Full-table ``dense_rank()``, distributed: the stitch offset is the
    count of DISTINCT sort keys in prior partitions (a per-partition
    countDistinct — still one tiny metadata row per partition)."""
    from datafusion_ballista_spark.operators import global_rank

    e = _events(spark, sf).select("event_id", "value")
    ranked = global_rank(e, [F.desc("value")], out_col="rnk", dense=True)
    return (
        ranked.where(F.col("rnk") % 23 == 0)
        .select("rnk", "event_id", "value")
        .orderBy("rnk", "event_id")
    )


WIN_GLOBAL_DENSE_RANK_SQL = """
SELECT rnk, event_id, value FROM (
  SELECT CAST(DENSE_RANK() OVER (ORDER BY value DESC) AS BIGINT) AS rnk,
         event_id, value
  FROM events)
WHERE rnk % 23 = 0
ORDER BY rnk, event_id
"""


def win_global_cumsum_dist(spark: SparkSession, sf: str) -> DataFrame:
    """Full-table running SUM OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING), distributed: per-partition local cumulative sums shifted
    by the prior partitions' totals. Values accumulate in DECIMAL so the
    stitched result is bit-identical to a serial scan (float partials
    would re-associate)."""
    from datafusion_ballista_spark.operators import global_running_sum

    e = _events(spark, sf).select(
        "event_id", F.col("value").cast("decimal(18,2)").alias("v")
    )
    out = global_running_sum(
        e, [F.asc("event_id")], F.col("v"), out_col="rsum"
    )
    return (
        out.where(F.col("event_id") % 97 == 0)
        .select("event_id", F.col("rsum").cast("double").alias("rsum"))
        .orderBy("event_id")
    )


WIN_GLOBAL_CUMSUM_SQL = """
SELECT event_id, CAST(rsum AS DOUBLE) AS rsum FROM (
  SELECT event_id,
         SUM(CAST(value AS DECIMAL(18,2)))
           OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum
  FROM events)
WHERE event_id % 97 = 0
ORDER BY event_id
"""


QUERIES: dict[str, QuerySpec] = {
    "win_ranking": QuerySpec(win_ranking, WIN_RANKING_SQL),
    "win_ntile_pct": QuerySpec(win_ntile_pct, WIN_NTILE_SQL),
    "win_lag_lead": QuerySpec(win_lag_lead, WIN_LAG_LEAD_SQL),
    "win_ignore_nulls": QuerySpec(win_ignore_nulls, WIN_IGNORE_NULLS_SQL),
    "win_running_agg": QuerySpec(win_running_agg, WIN_RUNNING_SQL),
    "win_rows_frame": QuerySpec(win_rows_frame, WIN_ROWS_FRAME_SQL),
    "win_range_frame": QuerySpec(win_range_frame, WIN_RANGE_FRAME_SQL),
    "win_share_of_total": QuerySpec(win_share_of_total, WIN_SHARE_SQL),
    "win_global_topk": QuerySpec(win_global_topk, WIN_GLOBAL_SQL),
    "win_first_last_nth": QuerySpec(win_first_last_nth, WIN_FIRST_LAST_SQL),
    "win_global_rownumber_dist": QuerySpec(
        win_global_rownumber_dist, WIN_GLOBAL_RN_SQL
    ),
    "win_global_rank_dist": QuerySpec(win_global_rank_dist, WIN_GLOBAL_RANK_SQL),
    "win_global_dense_rank_dist": QuerySpec(
        win_global_dense_rank_dist, WIN_GLOBAL_DENSE_RANK_SQL
    ),
    "win_global_cumsum_dist": QuerySpec(
        win_global_cumsum_dist, WIN_GLOBAL_CUMSUM_SQL
    ),
}
