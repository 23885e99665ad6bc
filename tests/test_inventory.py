"""Every inventory query runs on Spark and (when an oracle exists)
hash-matches DuckDB — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.compare import decimal_output_columns
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
    if spec.oracle is None:
        rows = df.limit(10001).collect()
        assert rows is not None  # rows-only check: executes and returns
    else:
        assert_query_matches(df, oracle, spec.oracle, name)


def test_driver_window_rotation():
    """The driver verifies only the FIRST 50 registry entries. Round-8
    window (VERDICT r7 Next #1) = the 11 round-7 operators that have
    never had a driver CORRECTNESS row (new code is where driver blind
    spots live — round 6 proved it) + tpcds_real_q51-q89. Lock the
    composition so an accidental reorder doesn't silently waste a
    round; the r9/r10 queues are committed below (VERDICT r7 Next #3).
    """
    names = list(_ALL)[:50]
    assert names[:11] == [
        "ann_ivfpq_topk",
        "quality_bigram_logprob",
        "train_bpe_encode",
        "dedup_cdc_chunks",
        "quality_fasttext_hash",
        "text_collocation_pmi",
        "train_curriculum_order",
        "emb_covariance",
        "emb_pca_project",
        "multimodal_phash_neardup",
        "sql_unpivot",
    ]
    assert names[11:50] == [f"tpcds_real_q{i}" for i in range(51, 90)]
    # r9 window = the 5 round-8-new ops first (the newest-code-first
    # principle of VERDICT r7 Next #1) + q90-q99 verbatim + first 35
    # shape analogues.
    assert list(_ALL)[50:55] == [
        "text_winnow_fingerprint",
        "quality_lexical_ttr",
        "dedup_prefix_filter_join",
        "multimodal_audio_vad",
        "ann_ivfpq_refine",
    ]
    assert list(_ALL)[55:65] == [f"tpcds_real_q{i}" for i in range(90, 100)]
    assert list(_ALL)[65:100] == [f"tpcds_q{i}_shape" for i in range(44, 79)]
    # r10 window = remaining 21 shapes + 29 regression sentinels
    # (oldest driver greens: verbatim TPC-H tier + earliest
    # relational/window rows, r2/r3 evidence that will be 6+ rounds
    # stale by then; the sentinel list runs past 149 for r11).
    assert list(_ALL)[100:121] == [f"tpcds_q{i}_shape" for i in range(79, 100)]
    sentinels = list(_ALL)[121:155]
    assert sentinels[0] == "tpch_q1"
    assert sentinels[20] == "tpch_q22_global_sales"
    assert len([n for n in sentinels if n.startswith("tpch_")]) == 21
    assert sentinels[-1] == "rel_except_all"
