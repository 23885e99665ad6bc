"""Operator inventory: one named query per SURVEY.md §2 capability row.

Each entry pairs a Spark DataFrame-API implementation with an equivalent
ANSI-SQL oracle string DuckDB can run on the same parquet fixtures. The
driver executes both at sf0.01 and hash-compares (CORRECTNESS_r{N}.json);
``oracle=None`` marks genuinely non-SQL-expressible ops (rows-only check).

Determinism contract (so value hashes match across engines AND across Spark
partition orderings):
- money/double aggregates are summed in DECIMAL (exact, order-independent)
  and cast to double at the end;
- every computed column is explicitly aliased identically on both sides;
- floating outputs that involve genuine double math are rounded on both
  sides at a precision far above data noise;
- top-k queries always carry a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only


def all_queries() -> dict[str, QuerySpec]:
    from datafusion_ballista_spark.inventory import (
        events,
        functions_cov,
        h2o,
        io_ops,
        multimodal_cov,
        pipeline_text,
        pipeline_train,
        pipeline_vector,
        relational,
        sql_surface,
        streaming_cov,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpcds5,
        tpcds6,
        tpcds7,
        tpcds8,
        tpcds9,
        tpcds10,
        tpcds11,
        tpcds12,
        tpcds_real,
        tpcds_real2,
        tpcds_real3,
        tpcds_real4,
        tpcds_real5,
        tpcds_real6,
        tpcds_real7,
        tpcds_real8,
        tpcds_real9,
        tpch,
        udf_surface,
        windows,
    )

    # Registration order drives the driver's CORRECTNESS window (first 50
    # entries). Rounds 1-2 proved tpch+relational+windows; round 3 proved
    # functions_cov/h2o/udf/sql_surface; round 4 proved the 11 HUGEINT
    # re-fixes + pipeline_text/vector + io_ops + events; round 5 proved
    # the first 43 TPC-DS shape analogues + all 7 streaming rows (50/50
    # green each round).
    # Round-7 window (per VERDICT r6 Next #1): LEAD with the three
    # round-6 driver-red queries (tpcds_real_q12/q20/q37 — the bare
    # DecimalType passthrough outputs, now pinned to DOUBLE) so the fix
    # is proven with driver evidence, then the 42 beyond-reference rows
    # that have never had a driver CORRECTNESS row — train(10) +
    # multimodal(6) + pii/quality/ev + win_global(4) + h2o-window(2) +
    # salted/q21/dedup_incremental + 2 stream rows + the round-6
    # dedup/ANN-PQ/BPE additions — then the next 5 verbatim TPC-DS
    # texts (q46-q50) to keep advancing the verbatim tier.
    window = [
        "tpcds_real_q12",
        "tpcds_real_q20",
        "tpcds_real_q37",
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
    ] + [f"tpcds_real_q{i}" for i in range(46, 51)]
    # Round-8 queue starts at position 50 so the next rotation is a
    # one-line window swap (VERDICT r6 Next #3): the remaining verbatim
    # tpcds_real texts q51-q99 (strictly stronger evidence than shape
    # analogues), then the leftover shapes q44-q99. Each future swap
    # advances the window over never-checked rows instead of
    # re-verifying green ones.
    queue = (
        [f"tpcds_real_q{i}" for i in range(51, 100)]
        + [f"tpcds_q{i}_shape" for i in range(44, 100)]
    )

    pool: dict[str, QuerySpec] = {}
    for mod in (
        pipeline_text,
        pipeline_vector,
        io_ops,
        events,
        multimodal_cov,
        streaming_cov,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpcds5,
        tpcds6,
        tpcds7,
        tpcds8,
        tpcds9,
        tpcds10,
        tpcds11,
        tpcds12,
        tpcds_real,
        tpcds_real2,
        tpcds_real3,
        tpcds_real4,
        tpcds_real5,
        tpcds_real6,
        tpcds_real7,
        tpcds_real8,
        tpcds_real9,
        pipeline_train,
        functions_cov,
        h2o,
        udf_surface,
        sql_surface,
        tpch,
        relational,
        windows,
    ):
        for name, spec in mod.QUERIES.items():
            assert name not in pool, f"duplicate query name: {name}"
            pool[name] = spec

    out: dict[str, QuerySpec] = {name: pool.pop(name) for name in window}
    out.update({name: pool.pop(name) for name in queue})
    out.update(pool)
    return out
