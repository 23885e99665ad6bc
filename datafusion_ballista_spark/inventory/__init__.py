"""Operator inventory: one named query per SURVEY.md §2 capability row.

Each entry pairs a Spark DataFrame-API implementation with an equivalent
ANSI-SQL oracle string DuckDB can run on the same parquet fixtures. The
driver executes both at sf0.01 and hash-compares (CORRECTNESS_r{N}.json);
``oracle=None`` marks genuinely non-SQL-expressible ops (rows-only check).

Determinism contract (so value hashes match across engines AND across Spark
partition orderings):
- money/double aggregates are summed in DECIMAL (exact, order-independent)
  and cast to double at the end;
- every computed column is explicitly aliased identically on both sides;
- floating outputs that involve genuine double math are rounded on both
  sides at a precision far above data noise;
- top-k queries always carry a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only


def all_queries() -> dict[str, QuerySpec]:
    from datafusion_ballista_spark.inventory import (
        events,
        functions_cov,
        h2o,
        io_ops,
        multimodal_cov,
        pipeline_text,
        pipeline_train,
        pipeline_vector,
        relational,
        sql_surface,
        streaming_cov,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpcds5,
        tpcds6,
        tpcds7,
        tpcds8,
        tpcds9,
        tpcds10,
        tpcds11,
        tpcds12,
        tpch,
        udf_surface,
        windows,
    )

    # Registration order drives the driver's CORRECTNESS window (first 50
    # entries). Rounds 1-2 proved tpch+relational+windows; round 3 proved
    # functions_cov/h2o/udf/sql_surface 39/50 (11 red on oracle-side
    # HUGEINT, since fixed). Round-4 window = those 11 fixed rows for
    # re-verification + 39 first-ever rows for the LLM-pipeline layer
    # (dedup/ANN/text, io, events, multimodal lead). Queued for round 5:
    # remaining multimodal + streaming + tpcds + tpch_q21 +
    # win_global_rownumber_dist. The local pytest oracle gate
    # (tests/test_inventory.py) still covers ALL entries every round.
    refixed = [
        "fn_math",
        "fn_json",
        "fn_agg_approx",
        "h2o_g1_sum_by_id1",
        "h2o_g2_sum_by_id1_id2",
        "h2o_g3_sum_avg_by_id3",
        "h2o_g5_sums_by_id6",
        "h2o_w_partition_sums",
        "h2o_w_rolling_sum",
        "h2o_w_range_between",
        "udf_sql_register",
    ]

    pool: dict[str, QuerySpec] = {}
    for mod in (
        pipeline_text,
        pipeline_vector,
        io_ops,
        events,
        multimodal_cov,
        streaming_cov,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpcds5,
        tpcds6,
        tpcds7,
        tpcds8,
        tpcds9,
        tpcds10,
        tpcds11,
        tpcds12,
        pipeline_train,
        functions_cov,
        h2o,
        udf_surface,
        sql_surface,
        tpch,
        relational,
        windows,
    ):
        for name, spec in mod.QUERIES.items():
            assert name not in pool, f"duplicate query name: {name}"
            pool[name] = spec

    out: dict[str, QuerySpec] = {name: pool.pop(name) for name in refixed}
    out.update(pool)
    return out
