"""SQL-dialect shims: rewrite DataFusion-isms Spark SQL rejects.

Reference dialect surface: CREATE EXTERNAL TABLE (datafusion.proto:163-180,
test ballista/client/tests/context_checks.rs:381), SIMILAR TO
(datafusion.proto:595-615). Spark-side targets per SURVEY.md §7.1 step 4.

Deliberately regex-light: these are syntactic renames, not a SQL parser.
Anything semantically different (GROUPS frames, non-literal SIMILAR TO
patterns) raises ``UnsupportedSQLFeature`` instead of silently
mis-translating.
"""

from __future__ import annotations

import re

# Column list with one nesting level of parens, enough for DECIMAL(10,2)-style
# parameterized types inside the list.
_BALANCED = r"\((?:[^()]|\([^()]*\))*\)"

_EXTERNAL_TABLE_RE = re.compile(
    r"CREATE\s+EXTERNAL\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    rf"(?P<cols>{_BALANCED})?\s*"
    r"STORED\s+AS\s+(?P<fmt>\w+)\s*"
    r"(?P<header>WITH\s+HEADER\s+ROW\s*)?"
    rf"(?:PARTITIONED\s+BY\s+(?P<partcols>{_BALANCED})\s*)?"
    rf"(?:OPTIONS\s*(?P<opts>{_BALANCED})\s*)?"
    r"LOCATION\s+(?P<loc>'[^']+')",
    re.IGNORECASE | re.DOTALL,
)

# Clauses the reference proto supports that we do not translate yet
# (datafusion.proto:163-180: WITH ORDER, constraints). Reject loudly.
_EXTERNAL_UNSUPPORTED_RE = re.compile(
    r"CREATE\s+EXTERNAL\s+TABLE[^;]*WITH\s+ORDER\b", re.IGNORECASE | re.DOTALL
)

_SIMILAR_LIT_RE = re.compile(
    r"(?P<not>NOT\s+)?SIMILAR\s+TO\s+'(?P<pat>[^']*)'", re.IGNORECASE
)
_SIMILAR_ANY_RE = re.compile(r"\bSIMILAR\s+TO\b", re.IGNORECASE)
_GROUPS_FRAME_RE = re.compile(r"\bGROUPS\s+BETWEEN\b", re.IGNORECASE)

# SIMILAR TO metacharacters that carry over to regex unchanged (SQL spec:
# | * + ? { } ( ) [ ]); everything else regex-special must be escaped.
_SIMILAR_META = set("|*+?{}()[]")
_REGEX_SPECIAL = set(".^$\\")


class UnsupportedSQLFeature(Exception):
    """Raised for reference features with no Spark equivalent (SURVEY §7.2)."""


# -- COPY TO (datafusion.proto:269-278 CopyTo sink; DataFusion SQL:
#    COPY {table | (query)} TO 'path' [STORED AS fmt] [PARTITIONED BY (..)]
#    [OPTIONS (..)], plus the legacy parenthesized (FORMAT fmt)) ------------
_COPY_RE = re.compile(
    r"^\s*COPY\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|[\w.]+)\s+"
    r"TO\s+'(?P<path>[^']+)'\s*(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COPY_STORED_RE = re.compile(r"STORED\s+AS\s+(\w+)", re.IGNORECASE)
_COPY_FORMAT_RE = re.compile(r"\(\s*FORMAT\s+(\w+)\s*\)", re.IGNORECASE)
_COPY_PART_RE = re.compile(rf"PARTITIONED\s+BY\s+({_BALANCED})", re.IGNORECASE)
_COPY_OPTS_RE = re.compile(rf"OPTIONS\s*({_BALANCED})", re.IGNORECASE)

_COPY_FORMATS = {"parquet": "parquet", "csv": "csv", "json": "json",
                 "ndjson": "json"}


class CopyTo:
    """Parsed COPY statement: run ``source_sql``, write ``fmt`` at ``path``."""

    def __init__(self, source_sql: str, path: str, fmt: str,
                 partition_by: list[str], options: dict[str, str]):
        self.source_sql = source_sql
        self.path = path
        self.fmt = fmt
        self.partition_by = partition_by
        self.options = options


def _split_outside_quotes(s: str, sep: str = ",") -> list[str]:
    parts: list[str] = []
    cur: list[str] = []
    quote: str | None = None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == sep:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


_COPY_OPT_PAIR_RE = re.compile(
    r"^\s*(?P<k>'[^']*'|\"[^\"]*\"|[\w.]+)\s*(?:=\s*|\s+)(?P<v>.*?)\s*$",
    re.DOTALL,
)


def parse_copy(query: str) -> CopyTo | None:
    """Parse a DataFusion COPY statement; None if the query is not a COPY."""
    m = _COPY_RE.match(query)
    if m is None:
        if re.match(r"\s*COPY\b", query, re.IGNORECASE):
            # A COPY statement our grammar can't parse (e.g. deeply nested
            # subquery) must fail HERE with a real message, not fall through
            # to spark.sql and die with an opaque parse error.
            raise UnsupportedSQLFeature(
                "could not parse COPY statement; supported form is "
                "COPY {table | (query)} TO 'path' [STORED AS fmt] "
                "[PARTITIONED BY (..)] [OPTIONS (..)] — deeper subquery "
                "nesting is not supported, CREATE a view first"
            )
        return None
    src = m.group("src").strip()
    source_sql = src[1:-1] if src.startswith("(") else f"SELECT * FROM {src}"
    rest = m.group("rest") or ""
    fmt_m = _COPY_STORED_RE.search(rest) or _COPY_FORMAT_RE.search(rest)
    if fmt_m:
        fmt = fmt_m.group(1).lower()
    else:
        # DataFusion infers the format from the target extension.
        fmt = m.group("path").rsplit(".", 1)[-1].lower()
    if fmt not in _COPY_FORMATS:
        raise UnsupportedSQLFeature(
            f"COPY TO format {fmt!r} is not supported (use parquet/csv/json, "
            "via STORED AS or a recognizable file extension)"
        )
    part_m = _COPY_PART_RE.search(rest)
    partition_by = (
        [c.strip().strip("'\"`") for c in part_m.group(1)[1:-1].split(",")]
        if part_m
        else []
    )
    options: dict[str, str] = {}
    opts_m = _COPY_OPTS_RE.search(rest)
    if opts_m:
        # split on commas OUTSIDE quotes so a value like 'a,b' survives;
        # the pair regex splits key from value at the first '='/space, so
        # '=' inside a quoted value survives too.
        for pair in _split_outside_quotes(opts_m.group(1)[1:-1]):
            if not pair.strip():
                continue
            kv = _COPY_OPT_PAIR_RE.match(pair)
            if kv:
                options[kv.group("k").strip("'\"")] = (
                    kv.group("v").strip().strip("'\"")
                )
    return CopyTo(source_sql, m.group("path"), _COPY_FORMATS[fmt],
                  partition_by, options)


def similar_to_regex(pattern: str) -> str:
    """Translate a SQL ``SIMILAR TO`` pattern to an anchored Java regex.

    SIMILAR TO is a whole-string match using ``%``/``_`` wildcards on top of
    a regex subset; RLIKE is an unanchored regex search. Both differences are
    corrected here: wildcards are translated and the result is wrapped in
    ``^(?:...)$``.
    """
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):  # escaped literal
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c in _SIMILAR_META:
            out.append(c)
        elif c in _REGEX_SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "^(?:" + "".join(out) + ")$"


# QUALIFY (window-function filter; DataFusion/DuckDB support it natively,
# Spark has no equivalent clause). Conservative single-statement rewrite:
#   [WITH ...] SELECT <body> QUALIFY <pred> [ORDER BY ...] [LIMIT ...]
# -> SELECT * FROM ([WITH...] SELECT <body>) __qualify WHERE <pred> [tail]
# (Spark allows CTE definitions inside a subquery, so the WITH prefix
# wraps along with the SELECT.) The predicate must reference select-list
# ALIASES (true in DataFusion too when the window expr isn't repeated
# verbatim). The QUALIFY keyword is located on a literal-blanked copy of
# the query, so 'QUALIFY' inside a string literal never triggers.


def _blank_literals(query: str) -> str:
    """Same-length copy with single-quoted literal contents blanked, so
    keyword searches can't false-match inside strings."""
    return re.sub(
        r"'[^']*'", lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", query
    )


def _rewrite_qualify(query: str) -> str:
    blanked = _blank_literals(query)
    hits = list(re.finditer(r"\bQUALIFY\b", blanked, re.IGNORECASE))
    if not hits:
        return query
    if len(hits) > 1:
        raise UnsupportedSQLFeature(
            "only a single top-level QUALIFY clause is supported; rewrite "
            "nested QUALIFYs as subquery WHERE filters"
        )
    if not re.match(r"\s*(WITH|SELECT)\b", query, re.IGNORECASE):
        raise UnsupportedSQLFeature(
            "QUALIFY is only supported on a top-level [WITH ...] SELECT "
            "statement"
        )
    pos = hits[0].start()
    body = query[:pos].rstrip()
    after = query[pos + len("QUALIFY"):]
    tail_m = re.search(
        r"\bORDER\s+BY\b|\bLIMIT\b", blanked[pos + len("QUALIFY"):],
        re.IGNORECASE,
    )
    if tail_m:
        pred = after[: tail_m.start()].strip()
        tail = after[tail_m.start():].strip()
    else:
        pred, tail = after.strip().rstrip(";"), ""
    return (
        f"SELECT * FROM ({body}) __qualify WHERE {pred}"
        + (f" {tail}" if tail else "")
    )


# DataFusion/DuckDB star-exclusion spelling: `SELECT * EXCLUDE (a, b)`.
# Spark 4 has the same feature as `* EXCEPT (...)` — pure keyword rename.
_EXCLUDE_RE = re.compile(r"(\*\s+)EXCLUDE(\s*\()", re.IGNORECASE)


def rewrite_sql(query: str) -> str:
    """Apply dialect rewrites; pass everything else through to Spark SQL."""
    query = _rewrite_qualify(query)
    query = _EXCLUDE_RE.sub(r"\1EXCEPT\2", query)
    if _GROUPS_FRAME_RE.search(query):
        # SURVEY.md §2.6: GROUPS window frames do not exist in Spark.
        raise UnsupportedSQLFeature(
            "GROUPS window frames are not supported by Spark; rewrite with a "
            "dense_rank()-keyed RANGE frame (see SURVEY.md §2.6)"
        )
    if _EXTERNAL_UNSUPPORTED_RE.search(query):
        raise UnsupportedSQLFeature(
            "CREATE EXTERNAL TABLE ... WITH ORDER is not supported; create "
            "the table without an order clause"
        )

    def _ext(m: re.Match) -> str:
        cols = f" {m.group('cols')}" if m.group("cols") else ""
        fmt = m.group("fmt").lower()
        opts: list[str] = []
        if m.group("opts"):
            opts.append(m.group("opts")[1:-1].strip())
        if m.group("header"):
            opts.append("header 'true'")
        part = (
            f" PARTITIONED BY {m.group('partcols')}" if m.group("partcols") else ""
        )
        options = f" OPTIONS ({', '.join(opts)})" if opts else ""
        return (
            f"CREATE TABLE {m.group('name')}{cols} "
            f"USING {fmt}{options}{part} LOCATION {m.group('loc')}"
        )

    query = _EXTERNAL_TABLE_RE.sub(_ext, query)

    def _sim(m: re.Match) -> str:
        neg = "NOT " if m.group("not") else ""
        # Spark string literals consume one level of backslash escaping.
        rx = similar_to_regex(m.group("pat")).replace("\\", "\\\\")
        return f"{neg}RLIKE '{rx}'"

    query = _SIMILAR_LIT_RE.sub(_sim, query)
    if _SIMILAR_ANY_RE.search(query):
        # Non-literal pattern: translating at rewrite time is impossible.
        raise UnsupportedSQLFeature(
            "SIMILAR TO with a non-literal pattern is not supported; use "
            "RLIKE with an anchored regex"
        )
    return query
