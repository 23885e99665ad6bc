"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is forced with a noop sink (full pipeline, no driver collect
cost), mirroring the reference benchmark harness's timing shape
(reference: benchmarks/src/bin/tpch.rs benchmark loop).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from datafusion_ballista_spark.inventory import all_queries
    from datafusion_ballista_spark.session import get_session

    spark = get_session(
        master=f"local[{cpus}]",
        app_name="dbspark-bench",
        shuffle_partitions=int(cpus),
    )

    headline = [
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "tpch_q9_profit",
        "tpch_q13_custdist",
        "tpch_q18_large_volume",
    ]
    specs = all_queries()
    names = [n for n in headline if n in specs]

    # warmup: JVM/codegen/parquet footer caches on the smallest query
    specs["tpch_q6"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
