"""A/B the streaming state-store provider on the stateful streaming ops.
Alternates provider per run in one JVM (provider is read at query start;
each run_available_now starts a fresh query with a fresh checkpoint).
Usage: python stream_ab.py <sf_dir> <n_cycles> out.json
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.getcwd())
SF_DIR = sys.argv[1]
N = int(sys.argv[2])
OUT = sys.argv[3]

from datafusion_ballista_spark.session import get_session
from datafusion_ballista_spark.inventory import all_queries

spark = get_session(master="local[32]", app_name="streamab",
                    shuffle_partitions=32)
specs = all_queries()
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
ROCKS = ("org.apache.spark.sql.execution.streaming.state."
         "RocksDBStateStoreProvider")
QS = ["stream_stream_join", "stream_session_windows",
      "stream_windowed_counts", "stream_dedup_exact"]
QS = [q for q in QS if q in specs]
print("queries:", QS, flush=True)

res = {}
for name in QS:
    res[name] = {"hdfs": [], "rocksdb": []}
    # warm both paths once
    for prov in (HDFS, ROCKS):
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)
        specs[name].spark(spark, SF_DIR).count()
    for _ in range(N):
        for key, prov in (("hdfs", HDFS), ("rocksdb", ROCKS)):
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prov)
            t0 = time.perf_counter()
            specs[name].spark(spark, SF_DIR).count()
            res[name][key].append(round(time.perf_counter() - t0, 3))
    m_h = statistics.median(res[name]["hdfs"])
    m_r = statistics.median(res[name]["rocksdb"])
    res[name]["median_hdfs"] = m_h
    res[name]["median_rocksdb"] = m_r
    res[name]["rocks_over_hdfs"] = round(m_r / m_h, 3)
    print(name, "hdfs", res[name]["hdfs"], "rocks", res[name]["rocksdb"],
          "ratio", res[name]["rocks_over_hdfs"], flush=True)
with open(OUT, "w") as f:
    json.dump(res, f, indent=1)
