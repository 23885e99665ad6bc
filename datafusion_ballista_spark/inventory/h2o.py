"""h2o.ai db-benchmark suite, run verbatim through the SQL string path.

Reference: the suite Ballista ships and benchmarks against —
benchmarks/queries/h2o/groupby.sql (10 queries), join.sql (5 queries),
window.sql (frames/partitions/top-N) — exercised here through
``BallistaSession.sql`` so the *Spark SQL parser* (not the DataFrame API)
handles CTEs, MEDIAN/STDDEV/CORR, ROW_NUMBER, and explicit ROWS/RANGE
frames. The identical SQL text is the DuckDB oracle.

Table mapping (h2o generates G1_* csv tables; the driver fixtures stand in):
``x``      <- events   (id1/id2 low/mid-card strings, id3 unique string,
                        id4/id5/id6 ints, v1/v2 small ints, v3 double)
``small``  <- region   (unique on id1)
``medium`` <- customer (unique on id2; id5 int for the j4 key)
``large``  <- orders   (unique on id3)

Documented deviations from the verbatim text (each forced by the
cross-engine hash gate, none changes the operator under test):
- double aggregates (SUM/AVG/MEDIAN/STDDEV/CORR of v3) are wrapped in
  ROUND(.., 4..6): partition-order float noise sits ~1e-10 below that;
- the window top-N cardinality sweep keys on id6 % N (our id3 is the
  h2o-style string id, which doesn't support %);
- window ORDER BY keys are unique by construction (id3 = 'id'||event_id),
  so every frame is deterministic without changing the query shape.

Scale notes (100 TB): every groupby is a partial/final hash aggregate on
the grouping key; joins are plain equi-joins with no forced broadcast
hints — AQE promotes small/medium to broadcast at runtime, exactly the
reference scheduler's size-threshold promotion
(ballista/scheduler/src/planner.rs:430-560). The window.sql suite is now
verbatim-complete: the _SQL entries cover every PARTITION BY /
bounded-frame row (single hash/range shuffle each), and the two
no-PARTITION-BY rows run scale-safe — ``SUM(v2) OVER ()`` as the
scalar-broadcast rewrite (h2o_w_basic_global_sum) and ``row_number()
OVER (ORDER BY id3)`` through the distributed ``global_row_number``
operator (h2o_w_sorted_rownum, operators/global_window.py) — never a
single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.session import BallistaSession
from datafusion_ballista_spark.sources.registry import register_all

_CTE = """
WITH x AS (
  SELECT concat('id', CAST(user_id % 10 AS STRING))  AS id1,
         concat('id', CAST(user_id % 100 AS STRING)) AS id2,
         concat('id', CAST(event_id AS STRING))      AS id3,
         CAST(user_id % 10 AS INT)    AS id4,
         CAST(user_id % 100 AS INT)   AS id5,
         CAST(event_id % 1000 AS INT) AS id6,
         CAST(event_id % 7 + 1 AS INT)  AS v1,
         CAST(user_id % 15 + 1 AS INT)  AS v2,
         value AS v3
  FROM events
),
small AS (
  SELECT concat('id', CAST(r_regionkey AS STRING)) AS id1,
         CAST(r_regionkey AS INT) AS id4,
         CAST(r_regionkey * 11 + 1 AS INT) AS v2
  FROM region
),
medium AS (
  SELECT concat('id', CAST(c_custkey % 100 AS STRING)) AS id2,
         concat('id', CAST(MIN(c_custkey) % 10 AS STRING)) AS id1,
         CAST(MIN(c_custkey) % 10 AS INT) AS id4,
         CAST(MIN(c_custkey) % 1000 AS INT) AS id5,
         CAST(MIN(c_custkey) % 97 + 1 AS INT) AS v2
  FROM customer GROUP BY c_custkey % 100
),
large AS (
  SELECT concat('id', CAST(o_orderkey AS STRING))     AS id3,
         concat('id', CAST(o_custkey % 10 AS STRING)) AS id1,
         concat('id', CAST(o_custkey % 100 AS STRING)) AS id2,
         CAST(o_custkey % 10 AS INT)    AS id4,
         CAST(o_custkey % 100 AS INT)   AS id5,
         CAST(o_orderkey % 1000 AS INT) AS id6,
         CAST(o_orderkey % 31 + 1 AS INT) AS v2
  FROM orders
)
"""

# groupby.sql:1-19 — the ten h2o groupby questions, same order.
_SQL: dict[str, str] = {
    # CAST(SUM(int) AS BIGINT) everywhere: a no-op on Spark (SUM(INT) is
    # already BIGINT) but pins DuckDB, whose SUM(INTEGER) returns HUGEINT
    # (arrow decimal128) and hash-mismatches the driver's type-aware compare.
    "h2o_g1_sum_by_id1": (
        "SELECT id1, CAST(SUM(v1) AS BIGINT) AS v1 FROM x GROUP BY id1"
    ),
    "h2o_g2_sum_by_id1_id2": (
        "SELECT id1, id2, CAST(SUM(v1) AS BIGINT) AS v1 FROM x GROUP BY id1, id2"
    ),
    "h2o_g3_sum_avg_by_id3": (
        "SELECT id3, CAST(SUM(v1) AS BIGINT) AS v1, ROUND(AVG(v3), 6) AS v3 "
        "FROM x GROUP BY id3"
    ),
    "h2o_g4_means_by_id4": (
        "SELECT id4, ROUND(AVG(v1), 6) AS v1, ROUND(AVG(v2), 6) AS v2, "
        "ROUND(AVG(v3), 6) AS v3 FROM x GROUP BY id4"
    ),
    "h2o_g5_sums_by_id6": (
        "SELECT id6, CAST(SUM(v1) AS BIGINT) AS v1, "
        "CAST(SUM(v2) AS BIGINT) AS v2, ROUND(SUM(v3), 4) AS v3 "
        "FROM x GROUP BY id6"
    ),
    "h2o_g6_median_sd": (
        "SELECT id4, id5, ROUND(MEDIAN(v3), 6) AS median_v3, "
        "ROUND(STDDEV(v3), 6) AS sd_v3 FROM x GROUP BY id4, id5"
    ),
    "h2o_g7_range_by_id3": (
        "SELECT id3, MAX(v1) - MIN(v2) AS range_v1_v2 FROM x GROUP BY id3"
    ),
    "h2o_g8_top2_v3_by_id6": (
        "SELECT id6, largest2_v3 FROM ("
        "SELECT id6, v3 AS largest2_v3, "
        "ROW_NUMBER() OVER (PARTITION BY id6 ORDER BY v3 DESC) AS order_v3 "
        "FROM x WHERE v3 IS NOT NULL) sub_query WHERE order_v3 <= 2"
    ),
    # Deviation: r2 is written as covar²/ (var·var) instead of POWER(CORR,2)
    # because CORR's internal divide raises under Spark ANSI mode on
    # zero-variance groups. NULLIF pins degenerate groups to NULL on both
    # engines with no conf scoping — ANSI-safe by construction (x/NULL is
    # NULL, never an error), algebraically identical to CORR².
    "h2o_g9_corr_r2": (
        "SELECT id2, id4, "
        "ROUND(POWER(COVAR_SAMP(v1, v2), 2) "
        "/ NULLIF(VAR_SAMP(v1) * VAR_SAMP(v2), 0), 6) AS r2 "
        "FROM x GROUP BY id2, id4"
    ),
    "h2o_g10_sum_count_6keys": (
        "SELECT id1, id2, id3, id4, id5, id6, ROUND(SUM(v3), 4) AS v3, "
        "COUNT(*) AS count FROM x GROUP BY id1, id2, id3, id4, id5, id6"
    ),
    # join.sql:1-9 — the five h2o join questions, same order.
    "h2o_j1_small_inner": (
        "SELECT x.id1, x.id2, x.id3, x.id4 AS xid4, small.id4 AS smallid4, "
        "x.id5, x.id6, x.v1, small.v2 "
        "FROM x INNER JOIN small ON x.id1 = small.id1"
    ),
    "h2o_j2_medium_inner": (
        "SELECT x.id1 AS xid1, medium.id1 AS mediumid1, x.id2, x.id3, "
        "x.id4 AS xid4, medium.id4 AS mediumid4, x.id5 AS xid5, "
        "medium.id5 AS mediumid5, x.id6, x.v1, medium.v2 "
        "FROM x INNER JOIN medium ON x.id2 = medium.id2"
    ),
    "h2o_j3_medium_left": (
        "SELECT x.id1 AS xid1, medium.id1 AS mediumid1, x.id2, x.id3, "
        "x.id4 AS xid4, medium.id4 AS mediumid4, x.id5 AS xid5, "
        "medium.id5 AS mediumid5, x.id6, x.v1, medium.v2 "
        "FROM x LEFT JOIN medium ON x.id2 = medium.id2"
    ),
    "h2o_j4_medium_on_int": (
        "SELECT x.id1 AS xid1, medium.id1 AS mediumid1, x.id2 AS xid2, "
        "medium.id2 AS mediumid2, x.id3, x.id4 AS xid4, medium.id4 AS mediumid4, "
        "x.id5, x.id6, x.v1, medium.v2 "
        "FROM x JOIN medium ON x.id5 = medium.id5"
    ),
    "h2o_j5_large_on_id3": (
        "SELECT x.id1 AS xid1, large.id1 AS largeid1, x.id2 AS xid2, "
        "large.id2 AS largeid2, x.id3, x.id4 AS xid4, large.id4 AS largeid4, "
        "x.id5 AS xid5, large.id5 AS largeid5, x.id6 AS xid6, "
        "large.id6 AS largeid6, x.v1, large.v2 "
        "FROM x JOIN large ON x.id3 = large.id3"
    ),
    # window.sql — representative frames (partitioned/bounded only; see
    # module docstring for the OVER () scale note).
    "h2o_w_partition_sums": (
        "SELECT id1, id2, id3, v2, "
        "CAST(SUM(v2) OVER (PARTITION BY id1) AS BIGINT) AS sum_by_id1, "
        "CAST(SUM(v2) OVER (PARTITION BY id2) AS BIGINT) AS sum_by_id2, "
        "CAST(SUM(v2) OVER (PARTITION BY id3) AS BIGINT) AS sum_by_id3 FROM x"
    ),
    "h2o_w_lag_lead_frames": (
        "SELECT id1, id2, id3, v2, "
        "FIRST_VALUE(v2) OVER (PARTITION BY id2 ORDER BY id3 "
        "ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS my_lag_by_id2, "
        "FIRST_VALUE(v2) OVER (PARTITION BY id2 ORDER BY id3 "
        "ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS my_lead_by_id2 FROM x"
    ),
    "h2o_w_moving_avg": (
        "SELECT id1, id2, id3, v2, "
        "ROUND(AVG(v2) OVER (PARTITION BY id2 ORDER BY id3 "
        "ROWS BETWEEN 100 PRECEDING AND CURRENT ROW), 6) "
        "AS my_moving_average_by_id2 FROM x"
    ),
    "h2o_w_rolling_sum": (
        "SELECT id1, id2, id3, v2, "
        "CAST(SUM(v2) OVER (PARTITION BY id2 ORDER BY id3 "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS my_rolling_sum_by_id2 FROM x"
    ),
    "h2o_w_range_between": (
        "SELECT id1, id2, id3, v2, "
        "CAST(SUM(v2) OVER (PARTITION BY id2 ORDER BY v2 "
        "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS my_range_between_by_id2 FROM x"
    ),
    "h2o_w_top2_per_key": (
        "SELECT id2, largest2_v2 FROM ("
        "SELECT id2, v2 AS largest2_v2, "
        "ROW_NUMBER() OVER (PARTITION BY id2 ORDER BY v2 DESC, id3) AS order_v2 "
        "FROM x WHERE v2 IS NOT NULL) sub_query WHERE order_v2 <= 2"
    ),
    "h2o_w_topn_sweep_100": (
        "SELECT pk, largest2_v2 FROM ("
        "SELECT id6 % 100 AS pk, v2 AS largest2_v2, "
        "ROW_NUMBER() OVER (PARTITION BY id6 % 100 ORDER BY v2 DESC, id3) "
        "AS order_v2 FROM x WHERE v2 IS NOT NULL) sub_query WHERE order_v2 <= 2"
    ),
}


def _make(sql_text: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        register_all(spark, sf)
        return BallistaSession(spark).sql(sql_text)

    return run


def _x(spark: SparkSession, sf: str) -> DataFrame:
    register_all(spark, sf)
    return BallistaSession(spark).sql(_CTE + "SELECT id1, id2, id3, v2 FROM x")


def h2o_w_basic_global_sum(spark: SparkSession, sf: str) -> DataFrame:
    """window.sql:1-8 verbatim ("Basic Window", SUM(v2) OVER ()) — but as
    the scalar-broadcast rewrite, not a single-partition window: an
    unpartitioned unbounded SUM is a constant, so compute it as a 1-row
    aggregate (partial/final, fully parallel) and broadcast-join it back.
    Identical semantics at any scale; no global shuffle of the fact rows."""
    from pyspark.sql import functions as F

    x = _x(spark, sf)
    total = x.agg(F.sum("v2").alias("window_basic"))
    # ORDER BY id3 (unique) pins the returned row order on both sides:
    # the verbatim text has no ORDER BY, so without it the output is
    # order-underdetermined — the one class that diverges under an
    # order-sensitive row hash (compare.py's ordered_match audit).
    return (
        x.crossJoin(F.broadcast(total))
        .select("id1", "id2", "id3", "v2", "window_basic")
        .orderBy("id3")
    )


def h2o_w_sorted_rownum(spark: SparkSession, sf: str) -> DataFrame:
    """window.sql:10-18 verbatim ("Sorted Window") through the distributed
    ``global_row_number`` operator (operators/global_window.py — the
    reference's PartitionedBoundedWindowAggExec shape; rank and row_number
    coincide here because id3 is unique) instead of Spark's default
    single-partition plan for ``OVER (ORDER BY id3)``. The companion
    ``FIRST_VALUE(v2) OVER (ORDER BY id3)`` is constant over the whole
    table (the frame always starts at the first row), so it is the 1-row
    MIN_BY aggregate broadcast back — id3 is unique, so both are exact."""
    from pyspark.sql import functions as F

    from datafusion_ballista_spark.operators import global_row_number

    x = _x(spark, sf)
    first = x.agg(F.min_by("v2", "id3").alias("first_order_by"))
    ranked = global_row_number(
        x, [F.asc("id3")], out_col="row_number_order_by"
    )
    return ranked.crossJoin(F.broadcast(first)).select(
        "id1", "id2", "id3", "v2", "first_order_by", "row_number_order_by"
    )


_W_BASIC_SQL = _CTE + (
    "SELECT id1, id2, id3, v2, "
    "CAST(SUM(v2) OVER () AS BIGINT) AS window_basic FROM x ORDER BY id3"
)

_W_SORTED_SQL = _CTE + (
    "SELECT id1, id2, id3, v2, "
    "FIRST_VALUE(v2) OVER (ORDER BY id3) AS first_order_by, "
    "ROW_NUMBER() OVER (ORDER BY id3) AS row_number_order_by FROM x"
)


QUERIES: dict[str, QuerySpec] = {
    name: QuerySpec(_make(_CTE + body), _CTE + body) for name, body in _SQL.items()
}
QUERIES["h2o_w_basic_global_sum"] = QuerySpec(h2o_w_basic_global_sum, _W_BASIC_SQL)
QUERIES["h2o_w_sorted_rownum"] = QuerySpec(h2o_w_sorted_rownum, _W_SORTED_SQL)
