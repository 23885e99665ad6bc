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
    """The driver verifies only the FIRST 50 registry entries. Round-6
    window (VERDICT r5 Next #1) = the 5 never-checked sql_surface rows +
    the first 45 VERBATIM TPC-DS texts on the real star fixture (the
    reference's own CI gate). Lock the composition so an accidental
    reorder doesn't silently waste a round."""
    names = list(_ALL)[:50]
    assert names[:5] == [
        "sql_pivot",
        "sql_lateral_topk",
        "sql_parameterized",
        "sql_qualify",
        "sql_recursive_cte",
    ]
    assert names[5:50] == [f"tpcds_real_q{i}" for i in range(1, 46)]
    # Round-7 head queued immediately after the window (VERDICT r5 Next
    # #2): every beyond-reference tier that has never had a driver row.
    assert list(_ALL)[50:92] == [
        "train_split_hash",
        "train_sample_stratified",
        "train_seq_packing",
        "train_contamination_ngram",
        "train_mix_weights",
        "train_split_leakage",
        "train_doc_chunking",
        "multimodal_featurize",
        "multimodal_frame_sample",
        "multimodal_resize",
        "multimodal_audio_stats",
        "multimodal_wav_roundtrip",
        "multimodal_video_keyframes",
        "pii_scrub",
        "quality_unigram_logprob",
        "ev_range_join_bucketed",
        "dedup_incremental",
        "stream_static_enrich",
        "stream_checkpoint_resume",
        "win_global_rownumber_dist",
        "win_global_rank_dist",
        "win_global_dense_rank_dist",
        "win_global_cumsum_dist",
        "h2o_w_basic_global_sum",
        "h2o_w_sorted_rownum",
        "rel_salted_skew_join",
        "tpch_q21_waiting_suppliers",
        "quality_repetition_gopher",
        "ev_funnel_steps",
        "train_token_budget_sample",
        "emb_kmeans_lloyd",
        "train_dsir_select",
        "dedup_semdedup",
        "quality_c4_filters",
        "dedup_substring_exact",
        "dedup_containment",
        "emb_pq_encode",
        "ann_pq_adc",
        "dedup_keep_best",
        "train_sample_weighted",
        "text_ngram_topk",
        "train_bpe_merges",
    ]
    # Remaining verbatim texts precede the leftover shape analogues.
    assert list(_ALL)[92:94] == ["tpcds_real_q46", "tpcds_real_q47"]
    assert list(_ALL)[146:148] == ["tpcds_q44_shape", "tpcds_q45_shape"]
