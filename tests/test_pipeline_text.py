"""Cross-technique checks for the near-dup pipeline: the exact n-gram
Jaccard pairs are ground truth; the sketch techniques must recover them."""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.inventory.pipeline_text import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def true_pairs(spark):
    return {
        (r.da, r.db): r.jaccard
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }


def test_fixture_has_planted_near_dups(true_pairs):
    assert len(true_pairs) >= 5, "fixture should contain planted near-dups"
    assert max(true_pairs.values()) >= 0.9


def test_minhash_recall_and_precision(spark, true_pairs):
    cand = {
        (r.da, r.db): r.est_jaccard
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    high = {p for p, j in true_pairs.items() if j >= 0.9}
    found = high & set(cand)
    assert len(found) >= 0.9 * len(high), f"minhash recall too low: {len(found)}/{len(high)}"
    # every candidate with strong signature agreement must be a true near-dup
    strong = {p for p, e in cand.items() if e >= 0.75}
    assert strong <= set(true_pairs), f"false positives: {strong - set(true_pairs)}"


def test_simhash_recall(spark, true_pairs):
    pairs = {(r.da, r.db) for r in dedup_simhash(spark, SF_DIR).collect()}
    high = {p for p, j in true_pairs.items() if j >= 0.95}
    found = high & pairs
    assert len(found) >= 0.8 * len(high), f"simhash recall too low: {len(found)}/{len(high)}"
    assert pairs <= set(true_pairs), f"false positives: {pairs - set(true_pairs)}"


def test_spread_for_explode_rebalances_narrow_scans(spark):
    """Explode-amplified pipelines must not run on a single core just
    because the input table packs into fewer splits than cores: the
    pre-explode rebalance widens a narrow scan to defaultParallelism and
    leaves an already-wide input untouched (at real scale the scan has
    more splits than cores, so the exchange is a no-op)."""
    from datafusion_ballista_spark.inventory.pipeline_text import (
        _spread_for_explode,
    )

    cores = spark.sparkContext.defaultParallelism
    # File sources: split estimate comes from inputFiles + the
    # maxPartitionBytes rule, with no RDD-conversion re-planning.
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        narrow_p = f"{tmp}/narrow"
        spark.range(1000).coalesce(1).write.parquet(narrow_p)
        narrow = spark.read.parquet(narrow_p)
        assert (
            _spread_for_explode(spark, narrow).rdd.getNumPartitions() == cores
        )
        wide_p = f"{tmp}/wide"
        spark.range(1000).repartition(cores + 4).write.parquet(wide_p)
        wide = spark.read.parquet(wide_p)
        assert _spread_for_explode(spark, wide) is wide
    # Non-file sources (in-memory, stream) have no split metadata: spread.
    mem = spark.range(1000).coalesce(1)
    assert _spread_for_explode(spark, mem).rdd.getNumPartitions() == cores
