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
        pipeline_vector,
        relational,
        sql_surface,
        streaming_cov,
        tpcds,
        tpch,
        udf_surface,
        windows,
    )

    out: dict[str, QuerySpec] = {}
    # Registration order drives the driver's CORRECTNESS window (first 50
    # entries). Rounds 1-2 proved tpch+relational+windows (50/50 green);
    # round 3 rotates the driver-unverified modules to the front:
    # functions_cov (17) + h2o (22) + udf_surface (7) + sql_surface (first 4)
    # = the 50-entry window. Next rotation: pipelines, events, io,
    # multimodal, streaming, tpcds. The local pytest oracle gate
    # (tests/test_inventory.py) still covers ALL entries every round.
    for mod in (
        functions_cov,
        h2o,
        udf_surface,
        sql_surface,
        pipeline_text,
        pipeline_vector,
        io_ops,
        events,
        multimodal_cov,
        streaming_cov,
        tpcds,
        tpch,
        relational,
        windows,
    ):
        for name, spec in mod.QUERIES.items():
            assert name not in out, f"duplicate query name: {name}"
            out[name] = spec
    return out
