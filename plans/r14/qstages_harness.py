"""Per-stage wall-clock breakdown of one steady run of a named query.
Usage: python qstages.py <query> <sf_dir> <cores>
"""
import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.getcwd())
QNAME, SF_DIR, CORES = sys.argv[1], sys.argv[2], int(sys.argv[3])

from datafusion_ballista_spark.session import get_session
from datafusion_ballista_spark.inventory import all_queries

spark = get_session(master=f"local[{CORES}]", app_name="qstage",
                    shuffle_partitions=CORES)
specs = all_queries()
spec = specs[QNAME]
for _ in range(3):  # warm
    spec.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
sc = spark.sparkContext
app_id = sc.applicationId
base = sc.uiWebUrl
with urllib.request.urlopen(
    f"{base}/api/v1/applications/{app_id}/stages?status=complete"
) as r:
    n_before = len(json.load(r))
t0 = time.perf_counter()
spec.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
with urllib.request.urlopen(
    f"{base}/api/v1/applications/{app_id}/stages?status=complete"
) as r:
    stages = json.load(r)


def ts(x):
    return datetime.strptime(x[:-3], "%Y-%m-%dT%H:%M:%S.%f")


new = sorted(stages, key=lambda x: x["stageId"])[n_before:]
t_first = min(ts(s["firstTaskLaunchedTime"]) for s in new)
tot_exec = 0
tot_tasks = 0
for s in new:
    sub = (ts(s["submissionTime"]) - t_first).total_seconds()
    fst = (ts(s["firstTaskLaunchedTime"]) - t_first).total_seconds()
    end = (ts(s["completionTime"]) - t_first).total_seconds()
    tot_exec += s["executorRunTime"]
    tot_tasks += s["numCompleteTasks"]
    print(f'stage {s["stageId"]:3d} tasks={s["numCompleteTasks"]:3d} '
          f'submit={sub:6.3f} first={fst:6.3f} done={end:6.3f} '
          f'exec_ms={s["executorRunTime"]:6d} '
          f'in={s.get("inputBytes", 0)} sh_r={s.get("shuffleReadBytes", 0)} '
          f'sh_w={s.get("shuffleWriteBytes", 0)}', flush=True)
print(f"wall={wall:.3f}s stages={len(new)} tasks={tot_tasks} "
      f"exec_total={tot_exec / 1000.0:.3f}s "
      f"exec_per_core={tot_exec / 1000.0 / CORES:.3f}s", flush=True)
