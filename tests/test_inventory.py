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
    """The driver verifies only the FIRST 50 registry entries. Round-14
    window: the ops whose code changed this round lead —
    text_winnow_fingerprint's selection rewrite, train_bpe_encode's
    Arrow encode kernel and the packed minhash band keys must re-prove
    bit-identity on the driver, and the ivfpq/pq/kmeans family executes
    the new in-path asserts — then the two queries the local-mode
    parallelismFirst flip moved most at sf1, then the family sweep the
    r13 rotation note queued (sketches + events + multimodal +
    streaming + the headline h2o grouper). Lock the composition so an
    accidental reorder doesn't silently waste a round."""
    names = list(_ALL)[:50]
    assert names[:11] == [
        "text_winnow_fingerprint",
        "train_bpe_encode",
        "dedup_minhash_lsh",
        "dedup_incremental",
        "ann_pq_adc",
        "ann_ivfpq_topk",
        "ann_ivfpq_refine",
        "emb_pq_encode",
        "emb_kmeans_lloyd",
        "train_contamination_ngram",
        "ev_range_join_bucketed",
    ]
    # sketches family in registration order
    assert names[11] == "sketch_quantile_bottomk"
    assert names[13] == "sketch_kll_quantiles"
    # events family in registration order
    assert names[17] == "sketch_hll_distinct"
    assert names[30] == "ev_anomaly_mad"
    # multimodal then streaming families
    assert names[31] == "multimodal_audio_vad"
    assert names[39] == "stream_windowed_counts"
    assert names[48] == "stream_checkpoint_resume"
    # the headline h2o grouper closes the window
    assert names[49] == "h2o_g2_sum_by_id1_id2"
    # r15 queue = natural pool order: the r12/r13-checked text greens
    # lead (freshest evidence — the r15 head should jump them)
    rest = list(_ALL)[50:]
    assert rest[0] == "quality_token_entropy"
