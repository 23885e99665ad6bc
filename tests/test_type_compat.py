"""Edge-type reject paths (SURVEY §1.3, docs/TYPE_COMPAT.md): the three
reference-representable Arrow types with no Spark equivalent must fail
loudly with the documented error class — not silently corrupt."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_time64_parquet_rejected(spark, tmp_path):
    p = os.path.join(tmp_path, "time.parquet")
    pq.write_table(
        pa.table({"t": pa.array([1, 2, 3], type=pa.time64("us"))}), p
    )
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
        spark.read.parquet(p).collect()


def test_decimal256_over_38_rejected(spark, tmp_path):
    p = os.path.join(tmp_path, "dec.parquet")
    pq.write_table(
        pa.table({"d": pa.array([1], type=pa.decimal256(50, 2))}), p
    )
    with pytest.raises(
        Exception, match="DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION"
    ):
        spark.read.parquet(p).collect()


def test_decimal256_within_38_narrows(spark, tmp_path):
    # DECIMAL256 at precision <= 38 is representable: narrows to
    # DecimalType losslessly rather than rejecting.
    p = os.path.join(tmp_path, "dec_ok.parquet")
    pq.write_table(
        pa.table(
            {"d": pa.array([12345], type=pa.decimal256(38, 2))}
        ),
        p,
    )
    df = spark.read.parquet(p)
    assert dict(df.dtypes)["d"] == "decimal(38,2)"
    assert df.collect()[0][0] is not None


def test_month_day_nano_interval_rejected(spark):
    tbl = pa.table(
        {"i": pa.array([(1, 2, 3)], type=pa.month_day_nano_interval())}
    )
    with pytest.raises(Exception, match="CANNOT_DETERMINE_TYPE"):
        spark.createDataFrame(tbl.to_pandas())


def test_month_day_nano_decomposition(spark):
    # The documented decomposition: (months, days, nanos) struct — the
    # reference's own wire layout (datafusion_common.proto
    # IntervalMonthDayNano) — round-trips fine.
    df = spark.createDataFrame(
        [(1, 2, 3_000_000_000)], "months int, days int, nanos bigint"
    )
    # CalendarIntervalType has no Python collect path; assert on the
    # string form computed JVM-side.
    row = df.selectExpr(
        "CAST(make_interval(0, months, 0, days, 0, 0, nanos / 1e9)"
        " AS STRING) AS iv"
    ).collect()[0]
    assert row.iv == "1 months 2 days 3 seconds"
