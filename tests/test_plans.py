"""Plan-shape audit — the 100x scale grade, enforced as tests.

Round-1 verdict: broadcast hints on unbounded sides are scale-killers, and
cartesian products must only appear for genuine 1-row scalar sides. This
sweep builds every lazily-planned inventory query and asserts:

- no CartesianProduct / BroadcastNestedLoopJoin outside the whitelist of
  known scalar (1-row) cross joins and the deliberate theta join;
- parquet scans in filtered TPC-H queries carry PushedFilters.

Eager-side-effect modules (io_ops writes, streaming runs, h2o_g9's scoped
execution) are excluded — their plans are audited by their own runs.
"""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.inventory import all_queries
from tests.conftest import SF_DIR

# Queries whose *construction* executes work (writes, streams, collects):
# planning them here would re-run side effects, not just build a plan.
_EAGER_MODULES = {"io_ops", "streaming_cov"}
_EAGER_QUERIES = {
    "ctas_insert_sql",
    "dedup_clusters",  # iterative fixpoint: construction runs jobs per round
    "dedup_keep_best",  # same label-propagation fixpoint at construction
    "train_bpe_merges",  # iterative merge rounds collect at construction
    "train_bpe_encode",  # same merge learning collects at construction
    "emb_kmeans_lloyd",  # iterative Lloyd rounds: update jobs at construction
    "emb_pq_encode",  # 4 subspace codebooks train (collect) at construction
    "ann_pq_adc",  # same codebook training collects at construction
    "ann_ivfpq_topk",  # coarse k-means + codebooks train (collect) at construction
    "emb_pca_project",  # moment matrix + component sums collect at construction
    "train_curriculum_order",  # global row-number offsets collect at construction
    "win_global_rownumber_dist",  # offset cumulation collects per-part counts
    "win_global_rank_dist",  # same operator family
    "win_global_dense_rank_dist",  # same operator family
    "win_global_cumsum_dist",  # same operator family
    "h2o_w_sorted_rownum",  # same operator: offsets collect at construction
    "emb_kmeanspp_init",  # farthest-first rounds collect at construction
    "train_contamination_bloom",  # bloom set-bit positions collect at construction
    "sketch_quantile_bottomk",  # bounded bottom-k sample collects at construction
    "sketch_range_partition_cuts",  # same bounded sample collect
    "sketch_kll_quantiles",  # sketch merge (bounded rows) collects at construction
    "sketch_theta_set_ops",  # two bounded KMV samples collect at construction
    "train_pack_concat_chunks",  # global cumsum offsets collect at construction
}

# Nested-loop / cartesian is legitimate only for genuinely-bounded sides:
# 1-row scalar aggregates (tpch q11/q14/q17/q22, NOT IN stats row, global
# top-k threshold, share-of-total denominators) or the deliberate theta
# join / small VALUES dims.
_NESTED_LOOP_OK = {
    "tpch_q11_important_parts",
    "tpch_q14_promo",
    "tpch_q16_part_supplier",  # not_in_join's 1-row stats crossJoin
    "tpch_q17_small_qty",
    "tpch_q22_global_sales",
    "rel_values_inmem",  # range-band join against a 3-row literal table
    "rel_theta_join",
    "rel_not_in",
    "rel_not_in_nulls",
    "win_share_of_total",
    "tpcds_q88_shape",  # ds q88 shape: eight 1-row scalar counts cross-joined
    "tpcds_real_q88",  # verbatim ds q88: same eight 1-row counts, real schema
    "tpcds_real_q28",  # verbatim ds q28: six 1-row quantity-band stat blocks
    "tpcds_real_q61",  # verbatim ds q61: two 1-row scalar revenue blocks
    "tpcds_real_q77",  # verbatim ds q77: published 6x6 call-center CTE cross
    "tpcds_real_q90",  # verbatim ds q90: two 1-row am/pm count blocks
    "tpcds_q23_shape",  # ds q23 shape: 1-row max-spend threshold crossJoin
    "tpcds_q61_shape",  # ds q61 shape: two 1-row scalar revenue crossJoins
    "tpcds_q24_shape",  # ds q24 shape: 1-row spine-average threshold crossJoin
    "h2o_w_basic_global_sum",  # OVER () rewrite: 1-row total crossJoin
    "dedup_containment",  # quote seeding: 1-row max(doc_id) scalar crossJoin
    "text_collocation_pmi",  # two 1-row corpus-total scalar crossJoins
    "quality_bigram_logprob",  # 1-row unigram-total scalar crossJoin
    "quality_kneser_ney_bigram",  # 1-row bigram-type-total scalar crossJoin
    "quality_ccnet_bucket",  # 1-row corpus-token-total scalar crossJoin
    "ann_mmr_rerank",  # broadcast of the bounded (5-row) query set
    "text_bm25_topk",  # 1-row corpus dl/N stats scalar crossJoin
    "sketch_hll_distinct",  # 1-row exact-distinct scalar crossJoin
    "sketch_hll_distinct_p12",  # same 1-row exact-distinct scalar crossJoin
    # deliberate brute-force pair spaces (documented scale path is the
    # LSH-bucketed variant, which planning confirms has NO nested loop):
    "ann_bruteforce_topk",  # exact baseline by design
    "emb_neardup_cosine",  # exact ground truth for the LSH variant
    "emb_knn_classify",  # broadcast of a bounded (20-row) query set
    "ann_ivf_topk",  # N x L centroid assignment: L bounded, centroids broadcast
    "tfidf_topk_terms",  # 1-row corpus-size scalar crossJoin
    "quality_unigram_logprob",  # 1-row corpus-token-total scalar crossJoin
    "train_mix_weights",  # 1-row total-chars scalar crossJoin
    "train_token_budget_sample",  # 1-row total-tokens scalar crossJoin
    "train_dsir_select",  # 1-row corpus/target token-total scalar crossJoin
    "rel_salted_skew_join",  # 5-row dim x 8 salts: bounded salting fan-out
    "sketch_ams_f2",  # 1-row exact-F2 + 1-row mean scalar crossJoins
    "train_priority_sample_sum",  # 1-row tau + 1-row exact-total crossJoins
    "train_epoch_shuffle_shards",  # 1-row corpus-count scalar crossJoin
    "ev_decayed_topk",  # 1-row max-timestamp anchor crossJoin
    "text_zipf_fit",  # 1-row corpus-totals scalar crossJoin
    "text_vocab_coverage",  # 1-row corpus-totals scalar crossJoin
    "emb_matryoshka_trunc",  # broadcast of the bounded (5-row) query set
    "ann_recall_eval",  # exact arm broadcasts the bounded (20-row) query set
}

_ALL = {
    name: spec
    for name, spec in all_queries().items()
    if spec.spark.__module__.rsplit(".", 1)[-1] not in _EAGER_MODULES
    and name not in _EAGER_QUERIES
}


def _plan(spark, name):
    df = _ALL[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(_ALL))
def test_no_unbounded_cartesian(name, spark):
    plan = _plan(spark, name)
    # Python may enter a plan only through Arrow-vectorized evaluation
    # (ArrowEvalPython / mapInPandas / mapInArrow). BatchEvalPython is the
    # row-at-a-time pickle path — 10-100x slower — and must never appear.
    assert "BatchEvalPython" not in plan, (
        f"[{name}] row-at-a-time Python UDF in plan"
    )
    if name in _NESTED_LOOP_OK:
        return
    assert "CartesianProduct" not in plan, f"[{name}] cartesian product in plan"
    # BroadcastNestedLoopJoin is the non-equi fallback; outside the
    # whitelist it means a join lost its equi-key.
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"[{name}] nested-loop join in plan"
    )


def test_global_topk_is_take_ordered(spark):
    """win_global_topk must reduce to a k-row TakeOrderedAndProject before
    its no-PARTITION-BY window — never a full-table single-partition sort
    (the reference's PartitionedBoundedWindowAggExec rationale)."""
    plan = _plan(spark, "win_global_topk")
    assert "TakeOrderedAndProject" in plan, plan
    # the window's sort must sit ABOVE the take-ordered k-row reduction,
    # i.e. the full-table scan feeds TakeOrderedAndProject, not a Sort
    assert plan.index("TakeOrderedAndProject") > plan.index("Window"), plan


@pytest.mark.parametrize(
    "name",
    ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q12_priority_shipping"],
)
def test_filters_reach_scan(name, spark):
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan
    # at least one scan actually pushes a predicate (not the empty list)
    pushed = [
        seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any(p.strip() for p in pushed), f"[{name}] no pushed filters\n{plan}"
