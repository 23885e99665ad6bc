"""Every inventory query runs on Spark and (when an oracle exists)
hash-matches DuckDB — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.compare import (
    complex_output_columns,
    decimal_output_columns,
    driver_canon_check,
)
from datafusion_ballista_spark.inventory import all_queries
from tests.conftest import SF_DIR, assert_query_matches

_ALL = all_queries()

# No registry entry may emit a bare DecimalType output column — the
# round-6 driver proved its value hash diverges on decimal
# *representation* even when both engines return bit-identical values
# (tpcds_real q12/q20/q37: rows+schema green, hash red; exactly the
# three then-unpinned decimal(7,2) passthroughs). Empty whitelist on
# purpose: pin to DOUBLE (exact for 2dp money) or BIGINT instead.
_DECIMAL_OUTPUT_WHITELIST: frozenset[str] = frozenset()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_inventory_query(name, spark, oracle):
    spec = _ALL[name]
    df = spec.spark(spark, SF_DIR)
    if name not in _DECIMAL_OUTPUT_WHITELIST:
        dec_cols = decimal_output_columns(df)
        assert not dec_cols, (
            f"[{name}] bare DecimalType output column(s) {dec_cols}: the "
            f"driver's hash diverges on decimal representation even when "
            f"values match (round-6 q12/q20/q37) — pin to DOUBLE/BIGINT"
        )
    cplx = complex_output_columns(df)
    assert not cplx, (
        f"[{name}] complex-typed output column(s) {cplx}: the driver's "
        f"pandas canonicalizer cannot sort array/map/struct cells "
        f"(round-10 emb_random_projection) — flatten to scalar columns"
    )
    if spec.oracle is None:
        rows = [tuple(r) for r in df.limit(10001).collect()]
        driver_canon_check(list(df.columns), rows)
    else:
        assert_query_matches(df, oracle, spec.oracle, name)


def test_rows_only_set_is_exactly_the_documented_exception():
    """oracle=None is the weaker driver check, so it must stay a loud,
    named exception (the decimal/float whitelist discipline): exactly
    one op remains — the KLL compaction cascade, whose sketch content
    is a function of the physical partition/batch order, not the data,
    so no cross-engine replay can exist even in principle. (BFD packing
    left this set in round 12: its deterministic fold got a WITH
    RECURSIVE DuckDB oracle.) A new rows-only entry must be argued
    here, not slipped in."""
    rows_only = {n for n, s in _ALL.items() if s.oracle is None}
    assert rows_only == {"sketch_kll_quantiles"}


def test_driver_window_rotation():
    """The driver verifies only the FIRST 50 registry entries. Round-12
    window (VERDICT r11 Next #1+#6, swapped in exactly as queued in
    round 11 plus the round-12-touched head): the 3 ops whose code or
    oracle changed this round (train_pack_bestfit's new WITH RECURSIVE
    oracle needs its driver hash-green; the two quality-filter perf
    rewrites must re-prove bit-identical output), the 2 round-11-new
    SQL-surface ops (the only rows never driver-checked), the 23
    remaining round-3-era sentinels, then 22 round-4-era pipeline_text
    greens (the oldest driver evidence left). Lock the composition so
    an accidental reorder doesn't silently waste a round; the r13
    continuation is the natural pool order (pipeline_text tail, then
    pipeline_vector)."""
    names = list(_ALL)[:50]
    assert names[:5] == [
        "train_pack_bestfit",
        "quality_repetition_gopher",
        "quality_unigram_logprob",
        "sql_show_functions",
        "sql_describe_table",
    ]
    # round-3-era sentinel continuation (fn_json..h2o)
    assert names[5] == "fn_json"
    assert names[11] == "fn_agg_approx"
    assert names[12] == "udf_sql_register"
    assert names[19] == "sql_parameterized"
    assert names[22] == "h2o_g1_sum_by_id1"
    assert names[27] == "h2o_w_partition_sums"
    # round-4-era pipeline_text greens in registration order
    assert names[28] == "text_winnow_fingerprint"
    assert names[35] == "dedup_exact"
    assert names[49] == "lang_id"
    # r13 queue = natural pool order: pipeline_text tail first
    rest = list(_ALL)[50:]
    assert rest[0] == "quality_token_entropy"
