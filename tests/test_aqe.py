"""AQE runtime re-planning parity.

The reference scheduler promotes shuffle joins to broadcast at runtime when
a completed stage's output is under the size threshold
(ballista/scheduler/src/planner.rs:430-560) and coalesces shuffle
partitions adaptively (scheduler AQE tests). Spark's AQE provides both —
these tests pin that the engine's session defaults actually engage them,
since the round-1 scale fixes rely on AQE instead of forced hints.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_ballista_spark.session import BallistaSession
from tests.conftest import SF_DIR


def _final_plan(df) -> str:
    # collect() drives this DataFrame's own QueryExecution so AQE finalizes
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_promotes_small_side_to_broadcast(spark):
    """A shuffle join whose small side is only known small at RUNTIME must
    end up a BroadcastHashJoin in the final adaptive plan — no hint. The
    static threshold is disabled so compile-time planning picks a shuffle
    join; only AQE's post-stage size measurement can promote it (the
    reference scheduler's exact behavior, planner.rs:430-560)."""
    static_prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    try:
        orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        cust = (
            spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
            .where(F.col("c_acctbal") > 9000)
        )
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
            "c_mktsegment"
        ).count()
        plan = _final_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", static_prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_aqe_coalesces_shuffle_partitions(spark):
    """Tiny shuffles must coalesce below the static partition count
    (AQECoalesce parity: reference range_repartition/aqe tests)."""
    n_static = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    agg = nation.groupBy("n_regionkey").count()
    n_out = agg.rdd.getNumPartitions()  # materializes via AQE final plan
    assert n_out < n_static, f"expected coalesce below {n_static}, got {n_out}"


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling must engage on a deliberately skewed
    sort-merge join: one key owning ~95% of the fact rows becomes one
    monster shuffle partition, and OptimizeSkewedJoin must split it into
    parallel sub-partitions — the final plan carries the
    ``SortMergeJoin(skew=true)`` marker. This is the automatic complement
    to the explicit salting rewrite (rel_salted_skew_join), which remains
    for skew beyond AQE's thresholds."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    # Force a sort-merge join (no broadcast escape hatch) and scale the
    # skew thresholds down to test-fixture bytes; the mechanism under test
    # (split-and-replicate of oversized partitions) is size-relative.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        dim = spark.range(0, 50).select(
            F.col("id").alias("k2"),
            F.concat(F.lit("dim-"), F.col("id")).alias("tag"),
        )
        joined = fact.join(dim, F.col("k") == F.col("k2")).select(
            "k", "pay", "tag"
        )
        plan = _final_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level pruning: a selective dim filter must inject a
    Bloom filter on the fact side of a shuffle join, so fact rows that
    cannot match die at the scan instead of crossing the shuffle — the
    single biggest shuffle-volume lever on a 100 TB fact join. The engine
    ships Spark's default-on bloomFilter rewrite; the probe-side scan
    threshold (default 10 GiB — sized for real fact scans, unreachable in
    a test fixture) is lowered HERE ONLY so the rewrite engages at test
    scale. Broadcast is disabled because the rewrite targets shuffle
    joins; results are asserted identical with the filter on and off."""
    prev_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1",
    )
    try:
        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        pt = spark.read.parquet(os.path.join(SF_DIR, "part.parquet")).where(
            F.col("p_size") == 1
        )
        joined = (
            li.join(pt, li.l_partkey == pt.p_partkey)
            .groupBy("p_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        opt = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloomfilter" in opt.lower() or "might_contain" in opt.lower(), opt
        with_bloom = {(r["p_type"], r["n"]) for r in joined.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        li2 = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        pt2 = spark.read.parquet(os.path.join(SF_DIR, "part.parquet")).where(
            F.col("p_size") == 1
        )
        without = {
            (r["p_type"], r["n"])
            for r in li2.join(pt2, li2.l_partkey == pt2.p_partkey)
            .groupBy("p_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert with_bloom == without and with_bloom
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_static)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")


def test_job_name_maps_to_description(spark):
    bs = BallistaSession(spark)
    bs.set("ballista.job.name", "parity-check-job")
    assert (
        spark.sparkContext._jsc.sc().getLocalProperty("spark.job.description")
        == "parity-check-job"
    )
