#!/usr/bin/env python
"""ballista-cli analogue: an interactive SQL REPL over BallistaSession.

Maps the reference CLI's command surface (ballista-cli/src/command.rs:40-56,
178-187 and main.rs flags) onto the session facade:

  \\q                 quit                      (command.rs:219)
  \\?                 help: list commands       (command.rs:222)
  \\d                 list tables               (command.rs:220 -> SHOW TABLES)
  \\d NAME            describe table            (command.rs:221 -> DESCRIBE)
  \\h                 list functions            (command.rs:223 -> SHOW FUNCTIONS)
  \\h NAME            search functions          (command.rs:224 -> ... LIKE)
  \\quiet [on|off]    print or set quiet mode   (command.rs:225-231)
  \\pset format FMT   set output format         (command.rs:232; table/csv/tsv/json)

plus plain SQL (semicolon-terminated, like the reference); SET/SHOW/DDL all
ride the facade's dialect rewrites. Flags mirror main.rs: ``--file`` (execute
statements from file(s), then exit — main.rs:83), ``--format`` (main.rs:99),
``--quiet``, ``--maxrows``. No TUI (command.rs OpenTui is feature-gated in
the reference too).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HELP_ROWS = [
    ("\\d", "list tables"),
    ("\\d name", "describe table"),
    ("\\q", "quit ballista-cli"),
    ("\\?", "help"),
    ("\\h", "function list"),
    ("\\h function", "search function"),
    ("\\quiet (true|false)?", "print or set quiet mode"),
    ("\\pset [NAME [VALUE]]", "set table output option (format)"),
    ("\\status", "session status (jobs/stages/executors)"),
]

# datafusion-cli's PrintFormat vocabulary (the reference CLI reuses it:
# main.rs:98-99): automatic resolves to table here (no TTY detection
# offline), json is an array, ndjson one object per line.
FORMATS = ("table", "csv", "tsv", "json", "ndjson", "automatic")


class Repl:
    def __init__(self, session, fmt: str = "table", quiet: bool = False,
                 maxrows: int = 1000, out=sys.stdout):
        self.bs = session
        self.fmt = fmt
        self.quiet = quiet
        self.maxrows = maxrows
        self.out = out

    # -- rendering -----------------------------------------------------------

    def _render(self, df) -> int:
        rows = df.limit(self.maxrows + 1).collect()
        clipped = len(rows) > self.maxrows
        rows = rows[: self.maxrows]
        cols = df.columns
        if not cols:
            return 0  # DDL/commands with no result schema render nothing
        w = self.out
        fmt = "table" if self.fmt == "automatic" else self.fmt
        if fmt == "table":
            cells = [[("" if v is None else str(v)) for v in r] for r in rows]
            widths = [
                max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
                for i, c in enumerate(cols)
            ]
            sep = "+" + "+".join("-" * (x + 2) for x in widths) + "+"
            print(sep, file=w)
            print(
                "| " + " | ".join(c.ljust(x) for c, x in zip(cols, widths)) + " |",
                file=w,
            )
            print(sep, file=w)
            for row in cells:
                print(
                    "| " + " | ".join(v.ljust(x) for v, x in zip(row, widths)) + " |",
                    file=w,
                )
            print(sep, file=w)
        elif fmt in ("csv", "tsv"):
            d = "," if fmt == "csv" else "\t"
            print(d.join(cols), file=w)
            for r in rows:
                print(d.join("" if v is None else str(v) for v in r), file=w)
        elif fmt == "json":
            import json

            print(
                json.dumps([dict(zip(cols, r)) for r in rows], default=str),
                file=w,
            )
        elif fmt == "ndjson":
            import json

            for r in rows:
                print(json.dumps(dict(zip(cols, r)), default=str), file=w)
        if clipped:
            # machine-readable formats keep stdout parseable: the notice
            # goes to stderr instead of trailing the JSON payload
            notice_stream = (
                sys.stderr if fmt in ("json", "ndjson") else w
            )
            print(
                f"(output clipped at {self.maxrows} rows)",
                file=notice_stream,
            )
        return len(rows)

    def _print_literal(self, cols, rows) -> None:
        df = self.bs.spark.createDataFrame(rows, ", ".join(f"{c} string" for c in cols))
        self._render(df)

    # -- one statement -------------------------------------------------------

    def execute(self, stmt: str) -> bool:
        """Run one command/statement; returns False on quit."""
        stmt = stmt.strip().rstrip(";").strip()
        if not stmt:
            return True
        if stmt.startswith("\\"):
            return self._command(stmt[1:])
        t0 = time.time()
        try:
            n = self._render(self.bs.sql(stmt))
        except Exception as ex:  # surface analysis errors, keep the REPL alive
            print(f"Error: {type(ex).__name__}: {ex}", file=self.out)
            return True
        if not self.quiet:
            print(
                f"{n} row(s) in set. Query took {time.time() - t0:.3f} seconds.",
                file=self.out,
            )
        return True

    def _command(self, c: str) -> bool:
        name, _, arg = c.partition(" ")
        arg = arg.strip()
        if name == "q":
            return False
        if name == "?":
            self._print_literal(["Command", "Description"], HELP_ROWS)
        elif name == "d" and not arg:
            self._render(self.bs.sql("SHOW TABLES"))
        elif name == "d":
            self._render(self.bs.sql(f"DESCRIBE TABLE {arg}"))
        elif name == "h" and not arg:
            self._render(self.bs.sql("SHOW FUNCTIONS"))
        elif name == "h":
            n = self._render(self.bs.sql(f"SHOW FUNCTIONS LIKE '%{arg}%'"))
            if n == 0:
                print(f"{arg} is not a supported function", file=self.out)
        elif name == "quiet":
            if arg in ("true", "t", "yes", "y", "on"):
                self.quiet = True
            elif arg in ("false", "f", "no", "n", "off"):
                self.quiet = False
            elif arg:
                print(f"Error: invalid quiet value {arg!r}", file=self.out)
                return True
            state = "true" if self.quiet else "false"
            verb = "set to" if arg else "is"
            print(f"Quiet mode {verb} {state}", file=self.out)
        elif name == "status":
            # scheduler REST introspection analogue (api/routes.rs) plus
            # the cumulative SchedulerMetricsCollector counters
            # (metrics/mod.rs), rendered as a 2-column table like the
            # reference's \? output
            rows = [(k, str(v)) for k, v in self.bs.status().items()]
            for fam, counters in self.bs.metrics().items():
                rows += [
                    (f"{fam}.{k}", str(v)) for k, v in counters.items()
                ]
            self._print_literal(["key", "value"], rows)
        elif name == "pset":
            sub, _, val = arg.partition(" ")
            val = val.strip().lower()
            if sub == "format" and val in FORMATS:
                self.fmt = val
                print(f"Output format is {self.fmt}.", file=self.out)
            elif sub == "format" and not val:
                print(f"Output format is {self.fmt}.", file=self.out)
            else:
                print(f"Error: unsupported pset {arg!r}", file=self.out)
        else:
            print(f"Error: unknown command \\{c}", file=self.out)
        return True

    # -- statement stream (semicolon-terminated SQL, one-line \\commands) ----

    def run_lines(self, lines) -> None:
        buf: list[str] = []
        for line in lines:
            line = line.rstrip("\n")
            if not buf and line.lstrip().startswith("\\"):
                if not self.execute(line.lstrip()):
                    return
                continue
            buf.append(line)
            if line.rstrip().endswith(";"):
                if not self.execute("\n".join(buf)):
                    return
                buf = []
        if buf:
            self.execute("\n".join(buf))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="ballista-cli analogue (PySpark)")
    ap.add_argument("--file", action="append", default=[],
                    help="execute statements from file(s), then exit "
                         "(main.rs:83)")
    ap.add_argument("--rc", action="append", default=[],
                    help="run the provided file(s) on startup, then stay "
                         "interactive (main.rs:92)")
    ap.add_argument("--format", choices=FORMATS, default="table")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--maxrows", type=int, default=1000)
    ap.add_argument("--cpus", "--vcores", dest="cpus", type=int, default=4,
                    help="local executor cores (main.rs --vcores)")
    ap.add_argument("--master", default=None,
                    help="attach to a running cluster master URL instead of "
                         "local mode — the --host/--port scheduler flags "
                         "(main.rs:101-105)")
    ap.add_argument("--data-path", default=None,
                    help="directory whose *.parquet files are registered as "
                         "tables by file stem on startup (main.rs:51)")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="columnar batch row count (main.rs:55; maps to "
                         "parquet columnarReaderBatchSize + Arrow "
                         "maxRecordsPerBatch)")
    args = ap.parse_args(argv)

    from datafusion_ballista_spark.session import BallistaSession

    conf: dict[str, str] = {}
    if args.batch_size:
        conf["spark.sql.parquet.columnarReaderBatchSize"] = str(args.batch_size)
        conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(args.batch_size)
    if args.master:
        bs = BallistaSession.remote(args.master, **conf)
    else:
        bs = BallistaSession.standalone(cpus=args.cpus, **conf)
    if args.data_path:
        import glob as _glob

        for p in sorted(_glob.glob(os.path.join(args.data_path, "*.parquet"))):
            name = os.path.splitext(os.path.basename(p))[0]
            bs.register_parquet(name, p)
    repl = Repl(bs, fmt=args.format, quiet=args.quiet, maxrows=args.maxrows)
    if not args.quiet:
        print("Ballista (PySpark) CLI — \\? for help", file=repl.out)
    try:
        for f in args.rc:
            with open(f) as fh:
                repl.run_lines(fh)
        if args.file:
            for f in args.file:
                with open(f) as fh:
                    repl.run_lines(fh)
        else:
            repl.run_lines(sys.stdin)
    finally:
        bs.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
