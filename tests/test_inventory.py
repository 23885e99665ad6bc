"""Every inventory query runs on Spark and (when an oracle exists)
hash-matches DuckDB — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.inventory import all_queries
from tests.conftest import SF_DIR, assert_query_matches

_ALL = all_queries()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_inventory_query(name, spark, oracle):
    spec = _ALL[name]
    df = spec.spark(spark, SF_DIR)
    if spec.oracle is None:
        rows = df.limit(10001).collect()
        assert rows is not None  # rows-only check: executes and returns
    else:
        assert_query_matches(df, oracle, spec.oracle, name)


def test_driver_window_rotation():
    """The driver verifies only the FIRST 50 registry entries. Round-5
    window = the first 43 TPC-DS shape analogues + all 7 streaming rows —
    the two largest never-driver-verified tiers. Lock the composition so
    an accidental reorder doesn't silently waste a round."""
    names = list(_ALL)[:50]
    assert names[:43] == [f"tpcds_q{i}_shape" for i in range(1, 44)]
    assert names[43:50] == [
        "stream_windowed_counts",
        "stream_session_windows",
        "stream_stream_join",
        "stream_dedup_exact",
        "stream_dedup_watermarked",
        "stream_stateful_counter",
        "stream_foreach_batch_sink",
    ]
    # Round-6 head queued immediately after the window: the never-checked
    # sql_surface rows first, then the remaining tpcds shapes.
    assert names and list(_ALL)[50:57] == [
        "sql_pivot",
        "sql_lateral_topk",
        "sql_parameterized",
        "sql_qualify",
        "sql_recursive_cte",
        "tpcds_q44_shape",
        "tpcds_q45_shape",
    ]
