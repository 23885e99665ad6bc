"""Shared helpers for inventory queries: exact-decimal aggregation and
fixture loading. See package docstring for the determinism contract."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_ballista_spark.sources.registry import tables  # re-export

__all__ = ["tables", "D", "dsum", "davg", "to_date"]


def D(c: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Cast a 2-dp money double to exact decimal for order-independent sums."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double (schema parity with DuckDB)."""
    return F.sum(c).cast("double").alias(alias)


def davg(c: Column, alias: str, nd: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, rounded double."""
    return F.round(F.sum(c).cast("double") / F.count(c), nd).alias(alias)


def to_date(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("date")
