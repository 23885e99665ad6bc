"""The examples tier (examples/*.py) — the analogue of the reference's
runnable examples crate (examples/examples/remote-sql.rs,
remote-dataframe.rs, remote-spark-functions.rs, standalone-sql.rs).
Each script must run green as a real user would invoke it: a fresh
subprocess, data dir as argv[1], exit code 0."""

from __future__ import annotations

import subprocess
import sys

import pytest

_DATA = "/root/testdata/sf0.001"


def _run(script: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, f"examples/{script}", _DATA],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )


@pytest.mark.parametrize(
    "script,expect",
    [
        ("standalone_sql.py", "l_returnflag"),
        ("dataframe_api.py", "o_totalprice"),
        ("spark_functions.py", "uppercase"),
        ("serve_and_status.py", "metrics:"),
        ("llm_pipeline.py", "== train_pack_concat_chunks"),
    ],
)
def test_example_runs_green(script, expect):
    proc = _run(script)
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    assert expect in proc.stdout, proc.stdout[-2000:]


def test_serve_example_reports_endpoint_and_counters():
    proc = _run("serve_and_status.py")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "Spark Connect endpoint live at sc://localhost:" in proc.stdout
    assert "'jobs':" in proc.stdout and "'queries':" in proc.stdout
    assert "session still alive: True" in proc.stdout
