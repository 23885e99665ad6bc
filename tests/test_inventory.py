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
    named exception (the decimal/float whitelist discipline). The set
    is EMPTY as of round 13: the last holdout, the KLL compaction
    cascade (whose ESTIMATE is a function of physical partition/batch
    order and therefore can never be replayed cross-engine), was made
    hash-provable by restructuring its output to deterministic order
    statistics with the sketch pinned by an in-plan assert_true —
    every registry entry now has a DuckDB oracle. A new rows-only
    entry must be argued here, not slipped in."""
    rows_only = {n for n, s in _ALL.items() if s.oracle is None}
    assert rows_only == set()


def test_driver_window_rotation():
    """The driver verifies only the FIRST 50 registry entries. Round-13
    window (VERDICT r12 Next #2, exactly as queued in round 12): the 2
    round-13-touched ops lead (sketch_kll_quantiles' restructured
    deterministic output + new oracle must earn the driver hash-green
    that closes the registry's last rows-only row;
    ev_range_join_bucketed is the round's perf-touched op), then the
    natural pool order continues the round-4-era sweep — the
    pipeline_text tail from quality_token_entropy, then the
    pipeline_vector family (r4/r5 evidence, the oldest left). Lock the
    composition so an accidental reorder doesn't silently waste a
    round; the r14 continuation is the natural pool order, which
    resumes at the r12-checked pipeline_text greens and then reaches
    the sketches/events families."""
    names = list(_ALL)[:50]
    assert names[:2] == [
        "sketch_kll_quantiles",
        "ev_range_join_bucketed",
    ]
    # pipeline_text tail in registration order
    assert names[2] == "quality_token_entropy"
    assert names[6] == "text_bm25_topk"
    assert names[12] == "text_vocab_coverage"
    # pipeline_vector family in registration order
    assert names[13] == "emb_covariance"
    assert names[25] == "emb_neardup_cosine"
    assert names[35] == "ann_recall_eval"
    # io_ops head closes the window
    assert names[36] == "write_parquet_roundtrip"
    assert names[49] == "write_arrow_ipc_dist_roundtrip"
    # r14 queue = natural pool order: the r12-checked pipeline_text
    # greens lead (freshest evidence — the r14 head should jump them)
    rest = list(_ALL)[50:]
    assert rest[0] == "text_winnow_fingerprint"
