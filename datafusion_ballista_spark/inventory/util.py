"""Shared helpers for inventory queries: exact-decimal aggregation and
fixture loading. See package docstring for the determinism contract."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_ballista_spark.sources.registry import tables  # re-export

__all__ = ["tables", "D", "dsum", "davg", "to_date", "not_in_join"]


def D(c: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Cast a 2-dp money double to exact decimal for order-independent sums."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double (schema parity with DuckDB)."""
    return F.sum(c).cast("double").alias(alias)


def davg(c: Column, alias: str, nd: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, rounded double.

    Divides by COUNT(*) — matching every paired COUNT(*) oracle — not by the
    non-null count, so results stay aligned when the column is nullable.
    """
    return F.round(F.sum(c).cast("double") / F.count(F.lit(1)), nd).alias(alias)


def to_date(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("date")


def not_in_join(left: DataFrame, left_key: str, right: DataFrame, right_key: str) -> DataFrame:
    """Null-aware NOT IN: keep left rows whose key is not in the subquery.

    SQL three-valued semantics (reference null corpus:
    ballista/client/tests/null_aware.rs): if the subquery yields any NULL,
    NOT IN is never true; a NULL left key only survives an *empty* subquery.
    Plain ``left_anti`` gets both wrong.

    Scale: the membership probe shuffles on the key (no forced broadcast —
    AQE promotes to broadcast when the dedup'd subquery is small); the
    null/empty statistics side is a genuine 1-row scalar broadcast. Mirrors
    the reference's distributed NOT IN rewrite
    (ballista/core/src/optimizer.rs:17-60) without its single-task lowering.
    """
    probe = right.select(F.col(right_key).alias("__nik")).where(
        F.col(right_key).isNotNull()
    ).distinct()
    stats = right.agg(
        F.count(F.lit(1)).alias("__n_total"),
        F.count(right_key).alias("__n_nonnull"),
    )
    keep = (F.col("__n_total") == 0) | (
        F.col(left_key).isNotNull()
        & F.col("__nik").isNull()
        & (F.col("__n_total") == F.col("__n_nonnull"))
    )
    return (
        left.join(probe, F.col(left_key) == F.col("__nik"), "left")
        .crossJoin(F.broadcast(stats))
        .where(keep)
        .drop("__nik", "__n_total", "__n_nonnull")
    )
