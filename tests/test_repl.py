"""CLI REPL (tools/repl.py) — the ballista-cli analogue.

Reference surface: ballista-cli/src/command.rs:40-56,178-187 (ListTables,
DescribeTable, ListFunctions, SearchFunctions, QuietMode, OutputFormat,
Help, Quit) and main.rs:83-99 (--file batch mode, --format). One
subprocess drives the whole surface over stdin exactly as a user would.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """\
CREATE EXTERNAL TABLE nation STORED AS PARQUET LOCATION '/root/testdata/sf0.001/nation.parquet';
\\d
\\d nation
SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey;
\\pset format csv
SELECT n_name FROM nation WHERE n_nationkey = 0;
\\h regexp_like
\\h definitely_not_a_function
\\quiet on
SET ballista.shuffle.partitions = 7;
\\quiet off
\\status
\\?
\\q
SELECT should_never_run;
"""


def _run(*argv: str, stdin: str | None = None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "tools/repl.py", "--cpus", "2", *argv],
        input=stdin,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )


def test_repl_drives_full_command_surface(tmp_path):
    proc = _run(stdin=_SCRIPT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    # \\d after CREATE EXTERNAL TABLE lists the registered table
    assert "| nation" in out
    # \\d nation describes its columns
    assert "n_nationkey" in out and "n_regionkey | int" in out
    # SQL result in table format with row-count/timing footer
    assert "| n_regionkey | n" in out.replace("  ", " ")
    assert "row(s) in set. Query took" in out
    # \\pset format csv switches rendering
    assert "Output format is csv." in out
    assert "n_name\nNATION_0" in out
    # \\h NAME searches functions; a miss says so (command.rs:130-132)
    assert "regexp_like" in out
    assert "definitely_not_a_function is not a supported function" in out
    # \\quiet toggles the footer (no footer printed while quiet)
    assert "Quiet mode set to true" in out and "Quiet mode set to false" in out
    # \\status renders the introspection dict (api/routes.rs analogue)
    # plus the cumulative metrics counters (metrics/mod.rs analogue)
    assert "active_job_count" in out and "executor_count" in out
    assert "jobs.succeeded" in out and "queries.completed" in out
    assert "tasks.completed" in out
    # \\? prints the command table
    assert "\\pset [NAME [VALUE]]" in out
    # \\q stops processing: the statement after it never runs
    assert "should_never_run" not in out


def test_repl_file_batch_mode(tmp_path):
    f = tmp_path / "batch.sql"
    f.write_text(
        "CREATE EXTERNAL TABLE region STORED AS PARQUET "
        "LOCATION '/root/testdata/sf0.001/region.parquet';\n"
        "SELECT COUNT(*) AS n FROM region;\n"
    )
    proc = _run("--file", str(f), "--format", "ndjson", "--quiet")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert '{"n": 5}' in proc.stdout
    # quiet: no banner, no timing footer
    assert "Query took" not in proc.stdout


def test_repl_json_array_and_automatic(tmp_path):
    f = tmp_path / "batch.sql"
    f.write_text(
        "CREATE EXTERNAL TABLE region STORED AS PARQUET "
        "LOCATION '/root/testdata/sf0.001/region.parquet';\n"
        "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2;\n"
        "\\pset format automatic\n"
        "SELECT COUNT(*) AS n FROM region;\n"
    )
    proc = _run("--file", str(f), "--format", "json", "--quiet")
    assert proc.returncode == 0, proc.stderr[-3000:]
    # json renders one array per result set (datafusion-cli PrintFormat)
    assert '[{"r_regionkey": 0}, {"r_regionkey": 1}]' in proc.stdout
    # automatic resolves to the table renderer
    assert "| n" in proc.stdout and "| 5" in proc.stdout


def test_repl_json_clipped_stdout_stays_parseable(tmp_path):
    """When maxrows clips a json/ndjson result, the clipped notice must
    go to stderr — stdout stays machine-readable (r12 ADVICE)."""
    import json

    f = tmp_path / "batch.sql"
    f.write_text(
        "CREATE EXTERNAL TABLE region STORED AS PARQUET "
        "LOCATION '/root/testdata/sf0.001/region.parquet';\n"
        "SELECT r_regionkey FROM region ORDER BY r_regionkey;\n"
    )
    proc = _run(
        "--file", str(f), "--format", "json", "--quiet", "--maxrows", "2"
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payload = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(payload) == 1, proc.stdout
    assert json.loads(payload[0]) == [
        {"r_regionkey": 0},
        {"r_regionkey": 1},
    ]
    assert "clipped" not in proc.stdout
    assert "(output clipped at 2 rows)" in proc.stderr


def test_repl_data_path_rc_and_batch_size(tmp_path):
    """--data-path registers every parquet by stem on startup
    (main.rs:51), --rc runs startup files before the stream
    (main.rs:92), --batch-size reaches the session conf (main.rs:55)."""
    rc = tmp_path / "startup.sql"
    rc.write_text("\\pset format csv\n")
    script = (
        "SELECT COUNT(*) AS n FROM nation;\n"
        "SELECT COUNT(*) AS r FROM region;\n"
        "SET ballista.shuffle.partitions;\n"
        "\\q\n"
    )
    proc = _run(
        "--data-path", "/root/testdata/sf0.001",
        "--rc", str(rc),
        "--batch-size", "777",
        "--quiet",
        stdin=script,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # rc file switched the format before the stdin statements ran
    assert "n\n25" in proc.stdout
    assert "r\n5" in proc.stdout
