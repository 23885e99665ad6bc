"""Task-retry correctness — the chaos-testing analogue.

The reference maintains a chaos harness that kills executors mid-query and
relies on stage retry (reference: chaos-testing/README.md:23-60). Spark
owns task/stage retry natively; this test PINS that a query whose task
fails on its first attempt still completes and produces the exact same
result: a mapInPandas stage raises on ``TaskContext.attemptNumber() == 0``
for one partition, the rescheduled attempt succeeds, and the aggregate
hash-matches the no-failure run.

Retries need ``local[N, maxFailures]`` (plain local mode runs tasks with
maxFailures=1, so the first failure kills the job — which the control
case below also pins); that master can't be swapped into the shared
session fixture, so the scenario runs in a subprocess with its own
SparkSession.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys

from pyspark import TaskContext
from pyspark.sql import functions as F

from datafusion_ballista_spark.session import get_session

spark = get_session(master="local[4,3]", app_name="retry-chaos",
                    shuffle_partitions=4)
try:
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    base = lineitem.select("l_orderkey", "l_quantity").repartition(4)

    def flaky(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            raise RuntimeError("chaos: injected first-attempt task failure")
        for pdf in batches:
            yield pdf

    flaked = base.mapInPandas(flaky, schema=base.schema)
    agg = lambda df: df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
    ).collect()[0]
    expect = agg(base)
    got = agg(flaked)  # must survive the injected failure via task retry
    assert got == expect, f"retry changed the result: {got} != {expect}"
    print("RETRY_MATCH", got.n, got.s)
finally:
    spark.stop()
"""


def test_injected_task_failure_retries_and_hash_matches():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"retry scenario failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "RETRY_MATCH" in proc.stdout
    # The failure genuinely happened (attempt 0 raised and was retried),
    # otherwise this test pins nothing.
    assert "chaos: injected first-attempt task failure" in proc.stderr


_SWEEP_SCRIPT = r"""
import random
import sys

from pyspark import TaskContext
from pyspark.sql import functions as F

from datafusion_ballista_spark.session import get_session

SEED = int(sys.argv[1])
N_FAULTS = 6  # failure budget per query, spread across its stages

spark = get_session(master="local[4,4]", app_name="chaos-sweep",
                    shuffle_partitions=4)
try:
    sf = "/root/testdata/sf0.001"
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    documents = spark.read.parquet(f"{sf}/documents.parquet")

    def flaky(stage, plan):
        # plan: {(stage, partition): attempts_to_fail (< maxFailures-1)}
        def f(batches):
            tc = TaskContext.get()
            k = (stage, tc.partitionId())
            if k in plan and tc.attemptNumber() < plan[k]:
                raise RuntimeError(f"chaos: injected failure at {k} "
                                   f"attempt {tc.attemptNumber()}")
            yield from batches
        return f

    def q_agg(inject):
        # scan -> [fault] -> hash agg -> [fault] -> global sort
        d = lineitem.select("l_orderkey", "l_returnflag", "l_quantity")
        d = d.repartition(4)
        if inject: d = d.mapInPandas(inject(0), schema=d.schema)
        a = d.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        if inject: a = a.mapInPandas(inject(1), schema=a.schema)
        return a.orderBy("l_returnflag")

    def q_join(inject):
        # two scans -> [fault each side] -> shuffle join -> agg
        l = lineitem.select("l_orderkey", "l_extendedprice").repartition(4)
        o = orders.select("o_orderkey", "o_orderpriority").repartition(4)
        if inject:
            l = l.mapInPandas(inject(0), schema=l.schema)
            o = o.mapInPandas(inject(1), schema=o.schema)
        j = l.join(o, l.l_orderkey == o.o_orderkey)
        a = j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"))
        if inject: a = a.mapInPandas(inject(2), schema=a.schema)
        return a.orderBy("o_orderpriority")

    def q_dedup(inject):
        # explode-shaped text pass -> [fault] -> two-level distinct count
        d = documents.select("doc_id", "text").repartition(4)
        if inject: d = d.mapInPandas(inject(0), schema=d.schema)
        t = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        g = t.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
        if inject: g = g.mapInPandas(inject(1), schema=g.schema)
        return g.agg(F.count(F.lit(1)).alias("vocab"),
                     F.sum("df").alias("postings"))

    rng = random.Random(SEED)
    total_injected = 0
    for name, q, n_stages in (("agg", q_agg, 2), ("join", q_join, 3),
                              ("dedup", q_dedup, 2)):
        expect = [tuple(r) for r in q(None).collect()]
        plan = {}
        budget = N_FAULTS
        while budget > 0:
            k = (rng.randrange(n_stages), rng.randrange(4))
            fails = min(budget, rng.randint(1, 2))
            # cap per-site failures below maxFailures=4; decrement the
            # budget by the delta actually applied, so the SWEEP_TOTAL
            # invariant holds for ANY seed, not just ones that miss the cap
            before = plan.get(k, 0)
            plan[k] = min(before + fails, 3)
            budget -= plan[k] - before
        inject = lambda stage: flaky(stage, plan)
        got = [tuple(r) for r in q(inject).collect()]
        assert got == expect, f"{name}: retries changed the result"
        n_inj = sum(plan.values())
        total_injected += n_inj
        print(f"SWEEP_OK {name} faults={n_inj} stages={sorted(set(s for s,_ in plan))}")
    print(f"SWEEP_TOTAL {total_injected}")
finally:
    spark.stop()
"""


def test_seeded_multifault_sweep_hash_matches():
    """Seeded, budgeted multi-fault chaos sweep — the reference's chaos
    harness posture (chaos-testing/src/budget.rs: a seeded budget of
    injected faults spread across the cluster; tests/ha.rs asserts
    queries still return correct results). Three pipeline shapes (hash
    agg, shuffle join, explode+two-level distinct) each absorb a
    6-fault budget spread over distinct stages and random partitions
    (seed pinned for reproducibility); every result must match the
    no-fault run exactly, and the injected failures must actually have
    fired (asserted via stderr, like the single-fault case above)."""
    proc = subprocess.run(
        [sys.executable, "-c", _SWEEP_SCRIPT, "20260816"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"chaos sweep failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.count("SWEEP_OK") == 3
    assert "SWEEP_TOTAL 18" in proc.stdout
    assert "chaos: injected failure" in proc.stderr
