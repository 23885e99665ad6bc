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
    """The driver verifies only the FIRST 50 registry entries; round 3
    rotates the previously-unverified modules into that window. Lock the
    composition so an accidental reorder doesn't silently waste a round."""
    names = list(_ALL)[:50]
    mods = [_ALL[n].spark.__module__.rsplit(".", 1)[-1] for n in names]
    assert mods[:17] == ["functions_cov"] * 17
    assert mods[17:39] == ["h2o"] * 22
    assert mods[39:46] == ["udf_surface"] * 7
    assert mods[46:50] == ["sql_surface"] * 4
