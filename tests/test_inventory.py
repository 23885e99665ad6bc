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
