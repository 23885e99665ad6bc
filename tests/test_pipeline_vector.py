"""LSH-vs-bruteforce behavior checks for the vector pipeline."""

from __future__ import annotations

from datafusion_ballista_spark.inventory.pipeline_vector import (
    ann_bruteforce_topk,
    ann_lsh_bucketed,
)
from tests.conftest import SF_DIR


def test_lsh_results_are_subset_quality(spark):
    """Every LSH hit must be a real vector with a correct (re-ranked exact)
    cosine; its top-1 should match brute-force top-1 reasonably often."""
    bf = {
        (r.qid, r.rk): (r.nid, r.cosine)
        for r in ann_bruteforce_topk(spark, SF_DIR).collect()
    }
    lsh_rows = ann_lsh_bucketed(spark, SF_DIR).collect()
    assert lsh_rows, "LSH buckets produced no candidates at all"
    # exactness of the re-rank: any (qid, nid) present in both must agree
    bf_pairs = {(r.qid, r.nid): r.cosine for r in ann_bruteforce_topk(spark, SF_DIR).collect()}
    for r in lsh_rows:
        if (r.qid, r.nid) in bf_pairs:
            assert abs(bf_pairs[(r.qid, r.nid)] - r.cosine) < 1e-9


def test_lsh_bucket_sizes_bounded(spark):
    """The bucketing must actually split the corpus (scale guard): no
    bucket may hold more than half the vectors."""
    from pyspark.sql import functions as F

    from datafusion_ballista_spark.inventory.pipeline_vector import _bucket, _emb

    e = _emb(spark, SF_DIR).withColumn("b", _bucket(F.col("v")))
    sizes = [r.n for r in e.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()]
    total = sum(sizes)
    assert len(sizes) > 10, f"only {len(sizes)} buckets used"
    assert max(sizes) < total / 2


def test_vectorized_kernels_match(spark):
    """The Arrow-batched kernels (the documented high-dim switch-over
    path) must agree with the in-JVM expression folds the queries use:
    identical LSH buckets, cosines equal at the 9-dp rounding every
    consumer applies."""
    from pyspark.sql import functions as F

    from datafusion_ballista_spark.inventory.pipeline_vector import (
        _bucket,
        _bucket_vec,
        _cos,
        _cos_vec,
        _emb,
    )
    from tests.conftest import SF_DIR

    e = _emb(spark, SF_DIR).limit(200)
    pairs = (
        e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
        .join(
            e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb")),
            F.col("ia") == F.col("ib") - 1,
        )
    )
    diff = pairs.select(
        (
            F.round(_cos(F.col("va"), F.col("vb")), 9)
            != F.round(_cos_vec(F.col("va"), F.col("vb")), 9)
        ).alias("cos_diff")
    ).where(F.col("cos_diff"))
    assert diff.count() == 0
    bdiff = e.select(
        (_bucket(F.col("v")) != _bucket_vec(F.col("v"))).alias("d")
    ).where(F.col("d"))
    assert bdiff.count() == 0


def test_km_assign_kernels_agree(spark):
    """The Arrow-vectorized default assignment and the expression-fold
    alternative must produce identical (cid, dist) for every vector
    against the shared final centroids."""
    from datafusion_ballista_spark.inventory.pipeline_vector import (
        _km_assign,
        _km_assign_expr,
        _km_final_cents,
        _km_quantized,
    )
    from tests.conftest import SF_DIR

    pts = _km_quantized(spark, SF_DIR).localCheckpoint(eager=False)
    cents = _km_final_cents(pts)
    a = {
        r.vec_id: (r.cid, r.dist)
        for r in _km_assign(pts, cents).collect()
    }
    b = {
        r.vec_id: (r.cid, r.dist)
        for r in _km_assign_expr(pts, cents).collect()
    }
    assert a == b and len(a) > 0
