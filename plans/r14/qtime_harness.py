"""Fresh-JVM single-query timer for alternating A/B runs (round 14).

One process = one JVM = one draw: cold + N steady noop-sink timings of a
named query, JSON on stdout. Run alternately from the before-tree (a
`git archive` extraction) and the working tree, both orderings, then
compare per-side MIN/median — the only comparison the sandbox VM's
draw-to-draw drift respects (see r13 methodology notes).

Usage: python plans/r14/qtime_harness.py <query> <sf_dir> <cores> [n_steady]
Env:   SPARK_GRAFT_DRIVER_MEM (optional) sizes the single-JVM heap.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from datafusion_ballista_spark.session import get_session  # noqa: E402
from datafusion_ballista_spark.inventory import all_queries  # noqa: E402

QNAME, SF_DIR, CORES = sys.argv[1], sys.argv[2], int(sys.argv[3])
N = int(sys.argv[4]) if len(sys.argv) > 4 else 3
mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
spark = get_session(
    master=f"local[{CORES}]",
    app_name=f"qtime:{QNAME}",
    shuffle_partitions=CORES,
    extra_conf={"spark.driver.memory": mem} if mem else None,
)
spark.sparkContext.setJobDescription(f"qtime:{QNAME}")
spec = all_queries()[QNAME]
samples = []
for _ in range(N + 1):
    t0 = time.perf_counter()
    spec.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    samples.append(round(time.perf_counter() - t0, 3))
steady = sorted(samples[1:])
print(
    json.dumps(
        {
            "query": QNAME,
            "cwd": os.getcwd(),
            "cold": samples[0],
            "steady": samples[1:],
            "min": steady[0],
            "median": steady[len(steady) // 2],
        }
    )
)
