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
    """The driver verifies only the FIRST 50 registry entries. Round-9
    window (VERDICT r8 Next #1, swapped in exactly as committed in
    round 8) = the 5 round-8 operators that have never had a driver
    CORRECTNESS row (newest code is where driver blind spots live —
    round 6 proved it) + tpcds_real_q90-q99 + the first 35 shape
    analogues. Lock the composition so an accidental reorder doesn't
    silently waste a round; the r10 queue is committed below
    (VERDICT r8 Next #4), led by the 5 round-9-new operators.
    """
    names = list(_ALL)[:50]
    assert names[:5] == [
        "text_winnow_fingerprint",
        "quality_lexical_ttr",
        "dedup_prefix_filter_join",
        "multimodal_audio_vad",
        "ann_ivfpq_refine",
    ]
    assert names[5:15] == [f"tpcds_real_q{i}" for i in range(90, 100)]
    assert names[15:50] == [f"tpcds_q{i}_shape" for i in range(44, 79)]
    # r10 window = the 11 round-9-new ops first (same newest-code-first
    # rule; within the batch the late-round additions lead) + remaining
    # 21 shapes + 20 regression sentinels (oldest driver greens: the
    # verbatim TPC-H tier + earliest relational/window rows, r2/r3
    # evidence that will be 7+ rounds stale by r10; the 34-sentinel
    # list runs past position 99 for r11).
    assert list(_ALL)[50:61] == [
        "sketch_hll_distinct",
        "sketch_countmin_topk",
        "text_bm25_topk",
        "train_contamination_bloom",
        "ann_range_search",
        "emb_kmeanspp_init",
        "dedup_lines_keep_first",
        "quality_kneser_ney_bigram",
        "quality_ccnet_bucket",
        "emb_random_projection",
        "ann_mmr_rerank",
    ]
    assert list(_ALL)[61:82] == [f"tpcds_q{i}_shape" for i in range(79, 100)]
    sentinels = list(_ALL)[82:116]
    assert sentinels[0] == "tpch_q1"
    assert sentinels[20] == "tpch_q22_global_sales"
    assert len([n for n in sentinels if n.startswith("tpch_")]) == 21
    assert sentinels[-1] == "rel_except_all"
