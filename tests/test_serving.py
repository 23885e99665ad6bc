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
