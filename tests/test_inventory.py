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


def test_rows_only_set_is_exactly_the_documented_pair():
    """oracle=None is the weaker driver check, so it must stay a loud,
    named exception (the decimal/float whitelist discipline): exactly
    the two ops whose core loop is order-dependent and therefore not
    SQL-expressible — the KLL compaction cascade and BFD bin packing.
    A new rows-only entry must be argued here, not slipped in."""
    rows_only = {n for n, s in _ALL.items() if s.oracle is None}
    assert rows_only == {"sketch_kll_quantiles", "train_pack_bestfit"}


def test_driver_window_rotation():
    """The driver verifies only the FIRST 50 registry entries. Round-10
    window (VERDICT r9 Next #1, swapped in exactly as committed in
    round 9) = the 11 round-9 operators that have never had a driver
    CORRECTNESS row (newest code is where driver blind spots live —
    round 6 proved it) + the last 21 shape analogues (q79-q99) + the
    first 18 regression sentinels (verbatim TPC-H, r2 evidence now 8
    rounds stale). Lock the composition so an accidental reorder
    doesn't silently waste a round; the r11 queue is committed below,
    led by ALL 18 round-10-new operators (the two late-round batches
    first, then the quantile-sketch family), so every op again gets a
    driver row one round after landing.
    """
    names = list(_ALL)[:50]
    assert names[:11] == [
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
    assert names[11:32] == [f"tpcds_q{i}_shape" for i in range(79, 100)]
    assert names[32] == "tpch_q1"
    assert names[49] == "tpch_q18_large_volume"
    assert len([n for n in names[32:50] if n.startswith("tpch_")]) == 18
    # r11 window = the round-10-new ops first (same newest-code-first
    # rule), then the sentinel continuation: the 16 remaining r10
    # sentinels (late TPC-H + earliest relational/window rows), then
    # the round-3-era greens (scalar-function surface, UDF surface,
    # SQL surface, first h2o rows) — all 7+ rounds stale by r11.
    rest = list(_ALL)[50:]
    assert rest[:23] == [
        "ann_recall_eval",
        "stream_sliding_counts",
        "train_pack_bestfit",
        "ev_anomaly_mad",
        "text_vocab_coverage",
        "sketch_hll_sliding_3h",
        "text_zipf_fit",
        "dedup_edit_distance_verify",
        "ann_lsh_multiprobe",
        "emb_matryoshka_trunc",
        "ev_decayed_topk",
        "train_epoch_shuffle_shards",
        "train_priority_sample_sum",
        "sketch_moments_power_sums",
        "sketch_ams_f2",
        "sketch_theta_set_ops",
        "sketch_hll_merge_hourly",
        "quality_token_entropy",
        "train_pack_concat_chunks",
        "sketch_kll_quantiles",
        "sketch_range_partition_cuts",
        "sketch_quantile_bottomk",
        "sketch_hll_distinct_p12",
    ]
    assert rest[23] == "tpch_q19_disjunctive"
    assert rest[25] == "tpch_q22_global_sales"
    assert rest[38] == "rel_except_all"
    assert rest[39] == "fn_string"
    assert rest[55] == "fn_agg_approx"
    assert rest[56] == "udf_sql_register"
    assert rest[63] == "sql_parameterized"
    assert rest[66] == "h2o_g1_sum_by_id1"
    assert rest[71] == "h2o_w_partition_sums"
