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
    """The driver verifies only the FIRST 50 registry entries. Round-4
    window = the 11 rows that were driver-red in round 3 (oracle HUGEINT,
    since fixed — they must be re-verified) + 39 first-ever rows for the
    LLM-pipeline / io / events layer. Lock the composition so an
    accidental reorder doesn't silently waste a round."""
    names = list(_ALL)[:50]
    mods = [_ALL[n].spark.__module__.rsplit(".", 1)[-1] for n in names]
    assert names[:3] == ["fn_math", "fn_json", "fn_agg_approx"]
    assert mods[3:10] == ["h2o"] * 7
    assert names[10] == "udf_sql_register"
    assert mods[11:22] == ["pipeline_text"] * 11
    assert mods[22:30] == ["pipeline_vector"] * 8
    assert mods[30:44] == ["io_ops"] * 14
    assert mods[44:50] == ["events"] * 6
