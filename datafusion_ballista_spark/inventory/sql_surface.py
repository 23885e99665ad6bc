"""Spark-SQL string-path surface (SURVEY §2.3 subqueries, §2.7 misc).

Round 1 proved subqueries only as manually-decorrelated DataFrame shapes
(VERDICT row 20); this module drives the *parser-native* paths the reference
exercises through its SQL front end: CTE chains (datafusion.proto:366-372),
recursive CTE (:1434-1445 RecursiveQueryNode / CTE work-table scan),
correlated scalar / EXISTS / IN subqueries (decorrelated by Catalyst, not by
hand), LATERAL subqueries, PREPARE-style parameterized SQL
(datafusion.proto:181-189,450-458 -> ``spark.sql(query, args)``), and PIVOT.

Every query runs through ``BallistaSession.sql`` (dialect rewrites + Spark
parser). Oracles: identical text where DuckDB's dialect agrees; dialect
variants are documented inline where they differ (PIVOT, parameter markers).

Scale notes: Catalyst decorrelates every subquery here into a join
(scalar -> aggregate + join, EXISTS/IN -> semi join, NOT IN -> null-aware
anti join) — no per-row re-execution, the same rewrite DataFusion applies
(optimizer decorrelate_predicate_subquery). The recursive CTE iterates
driver-side over bounded depth (months of a year), each step a distributed
job; fine when depth ≪ data size, which is the only scale shape recursion
is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.session import BallistaSession
from datafusion_ballista_spark.sources.registry import register_all

_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

# -- shared-text queries (same SQL on Spark and DuckDB) ----------------------

_SHARED: dict[str, str] = {
    # CTE chain: two stacked CTEs, the second referencing the first.
    "sql_cte_chain": f"""
WITH cust_rev AS (
  SELECT o_custkey, {_REV} AS rev
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_custkey
),
nation_rev AS (
  SELECT c_nationkey, ROUND(SUM(rev), 2) AS nat_rev, COUNT(*) AS n_cust
  FROM cust_rev JOIN customer ON c_custkey = o_custkey
  GROUP BY c_nationkey
)
SELECT n_name, nat_rev, n_cust
FROM nation_rev JOIN nation ON n_nationkey = c_nationkey
ORDER BY nat_rev DESC, n_name
""",
    # Correlated scalar subquery: customers above their nation's average
    # balance. Catalyst decorrelates to an aggregate + join.
    "sql_scalar_subquery": """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal
FROM customer c1
WHERE c_acctbal > (
  SELECT AVG(c_acctbal) + 1000 FROM customer c2
  WHERE c2.c_nationkey = c1.c_nationkey
)
ORDER BY bal DESC, c_custkey
LIMIT 50
""",
    # Correlated EXISTS + NOT EXISTS in one query -> semi + anti join.
    "sql_exists_correlated": """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_discount > 0.09
)
ORDER BY s_suppkey
""",
    # IN + NOT IN through the parser: NOT IN against a NULL-bearing subquery
    # must use Spark's native null-aware anti join (VERDICT "what's wrong"
    # #1 was the hand-rolled version; this is the engine path).
    "sql_in_notin_null": """
SELECT COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
  AND p_partkey NOT IN (
    SELECT CASE WHEN l_discount > 0.099 THEN NULL ELSE l_partkey END
    FROM lineitem WHERE l_quantity <= 2
  )
""",
    # Recursive CTE: month scaffold 1..12 left-joined to order counts —
    # months with no orders still appear (the generate_series-style shape,
    # datafusion.proto:1434-1445).
    "sql_recursive_cte": """
WITH RECURSIVE months(m) AS (
  SELECT 1
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
)
SELECT m,
  (SELECT COUNT(*) FROM orders
   WHERE CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) = m
     AND EXTRACT(YEAR FROM o_orderdate) = 1997) AS n_orders
FROM months ORDER BY m
""",
    # LATERAL correlated subquery: top-balance customer per nation.
    "sql_lateral_topk": """
SELECT n_name, top_c.c_name, top_c.bal
FROM nation,
LATERAL (
  SELECT c_name, ROUND(c_acctbal, 2) AS bal
  FROM customer WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 1
) AS top_c
ORDER BY n_name
""",
    # QUALIFY (window filter clause): DataFusion/DuckDB parse it natively;
    # Spark gets it through the sql.py rewrite to a subquery WHERE. The
    # identical text is the oracle — DuckDB runs the raw QUALIFY.
    "sql_qualify": """
SELECT o_orderpriority, o_orderkey, o_totalprice,
  ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority
    ORDER BY o_totalprice DESC, o_orderkey) AS rk
FROM orders
QUALIFY rk <= 3
ORDER BY o_orderpriority, rk
""",
}

# -- dialect-divergent queries ----------------------------------------------

_PARAM_SPARK = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02' AND l_discount BETWEEN :lo AND :hi
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_PARAM_ORACLE = _PARAM_SPARK.replace(":lo", "0.03").replace(":hi", "0.07")

_PIVOT_SPARK = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderstatus FROM orders
)
PIVOT (
  COUNT(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
)
ORDER BY o_orderpriority
"""

# DuckDB spells the same relational shape with FILTERed aggregates.
_PIVOT_ORACLE = """
SELECT o_orderpriority,
  COUNT(*) FILTER (o_orderstatus = 'F') AS f,
  COUNT(*) FILTER (o_orderstatus = 'O') AS o,
  COUNT(*) FILTER (o_orderstatus = 'P') AS p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


_UNPIVOT_SPARK = """
SELECT l_returnflag, metric, val FROM (
  SELECT l_returnflag,
    CAST(SUM(l_quantity) AS DOUBLE) AS qty,
    CAST(SUM(l_extendedprice) AS DOUBLE) AS revenue,
    CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (val FOR metric IN (qty, revenue, cnt))
ORDER BY l_returnflag, metric
"""

# DuckDB's UNPIVOT spells the melt with ON ... INTO NAME/VALUE.
_UNPIVOT_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
    CAST(SUM(l_quantity) AS DOUBLE) AS qty,
    CAST(SUM(l_extendedprice) AS DOUBLE) AS revenue,
    CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, val
FROM (UNPIVOT m ON qty, revenue, cnt INTO NAME metric VALUE val)
ORDER BY l_returnflag, metric
"""


def _shared(sql_text: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        register_all(spark, sf)
        return BallistaSession(spark).sql(sql_text)

    return run


def sql_parameterized(spark: SparkSession, sf: str) -> DataFrame:
    """PREPARE/placeholder parity: named parameter markers bound at execution
    (datafusion.proto:181-189 Prepare / :450-458 param types)."""
    register_all(spark, sf)
    from datafusion_ballista_spark.sql import rewrite_sql

    return spark.sql(rewrite_sql(_PARAM_SPARK), args={"lo": 0.03, "hi": 0.07})


def sql_show_functions(spark: SparkSession, sf: str) -> DataFrame:
    """SHOW FUNCTIONS through the facade — reference CLI ListFunctions
    parity (ballista-cli/src/command.rs:44-45,93,123). The Spark side
    resolves each compat name against the LIVE function catalog
    (catalog.functionExists); the oracle pins the committed expectation
    (functions.NON_CATALOG_NAMES), so a pyspark-version drift in the
    builtin surface goes red here instead of silently changing which
    names hit a shim."""
    register_all(spark, sf)
    return BallistaSession(spark).sql("SHOW FUNCTIONS")


def _show_functions_oracle_sql() -> str:
    from datafusion_ballista_spark.functions import (
        AGGREGATE_NAMES,
        FUNCTIONS,
        NON_CATALOG_NAMES,
    )

    rows = ",\n  ".join(
        "('{}', '{}', '{}')".format(
            n,
            "aggregate" if n in AGGREGATE_NAMES else "scalar",
            "NO" if n in NON_CATALOG_NAMES else "YES",
        )
        for n in sorted(FUNCTIONS)
    )
    return (
        "SELECT * FROM (VALUES\n  "
        + rows
        + "\n) AS t(function_name, function_type, spark_native)\n"
        + "ORDER BY function_name"
    )


def sql_describe_table(spark: SparkSession, sf: str) -> DataFrame:
    """DESCRIBE TABLE through the facade — reference CLI DescribeTable
    parity (ballista-cli/src/command.rs:45,123). Cross-engine schema
    check: Spark's DESCRIBE of the registered view vs DuckDB's
    information_schema.columns over the same parquet, with the DuckDB
    type vocabulary mapped to Spark's (VARCHAR->string,
    TIMESTAMP->timestamp_ntz — both naive wall-clock types).

    Scale: catalog metadata only, no jobs."""
    register_all(spark, sf)
    return (
        BallistaSession(spark)
        .sql("DESCRIBE TABLE lineitem")
        .select("col_name", "data_type")
        .orderBy("col_name")
    )


_DESCRIBE_ORACLE = """
SELECT column_name AS col_name,
  CASE data_type
    WHEN 'BIGINT' THEN 'bigint'
    WHEN 'INTEGER' THEN 'int'
    WHEN 'DOUBLE' THEN 'double'
    WHEN 'VARCHAR' THEN 'string'
    WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
    WHEN 'DATE' THEN 'date'
    ELSE lower(data_type)
  END AS data_type
FROM information_schema.columns
WHERE table_name = 'lineitem'
ORDER BY col_name
"""


def sql_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT through the parser; Spark names single-aggregate pivot columns
    after the IN-list aliases (f/o/p), which the oracle pins explicitly."""
    register_all(spark, sf)
    return BallistaSession(spark).sql(_PIVOT_SPARK)


QUERIES: dict[str, QuerySpec] = {
    **{name: QuerySpec(_shared(text), text) for name, text in _SHARED.items()},
    "sql_parameterized": QuerySpec(sql_parameterized, _PARAM_ORACLE),
    "sql_pivot": QuerySpec(sql_pivot, _PIVOT_ORACLE),
    "sql_unpivot": QuerySpec(_shared(_UNPIVOT_SPARK), _UNPIVOT_ORACLE),
    "sql_show_functions": QuerySpec(
        sql_show_functions, _show_functions_oracle_sql()
    ),
    "sql_describe_table": QuerySpec(sql_describe_table, _DESCRIBE_ORACLE),
}
