#!/usr/bin/env python
"""Serving + introspection — the analogue of the reference's
remote-client examples (``examples/examples/remote-sql.rs`` dials a
running scheduler at df://localhost:50050) and its REST status surface:
start the Spark Connect endpoint (the Flight SQL analogue), print the
client URL a remote session would attach to, then read the cumulative
metrics counters (the SchedulerMetricsCollector analogue).

With grpcio installed, a remote client attaches with:

    from pyspark.sql import SparkSession
    client = SparkSession.builder.remote("sc://localhost:15002").getOrCreate()
    client.sql("SELECT 1").show()

or interactively: ``python tools/repl.py`` against the same session.

Usage: python examples/serve_and_status.py [data_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_ballista_spark import BallistaSession


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bs = BallistaSession.standalone(cpus=2)
    bs.register_parquet("nation", f"{data}/nation.parquet")
    url = bs.serve()
    print(f"Spark Connect endpoint live at {url}")

    # the serving session stays fully usable (shared-JVM discipline)
    bs.sql("SELECT COUNT(*) AS n FROM nation").show()

    print("status:", bs.status())
    print("metrics:", bs.metrics())

    bs.stop_serving()
    print("endpoint stopped; session still alive:",
          bs.sql("SELECT 1 AS ok").collect()[0].ok == 1)
    bs.stop()


if __name__ == "__main__":
    main()
