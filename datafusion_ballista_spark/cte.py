"""Materialized-CTE execution for multi-referenced WITH clauses (opt-in).

Catalyst INLINES every CTE reference (Spark has no CTE materialization),
so a `WITH heavy AS (...)` consumed by N branches plans the heavy subtree
N times — column pruning then specializes each copy, which also defeats
exchange reuse (TPC-DS q14's inlined plan carries 62 parquet scans).
DuckDB and PostgreSQL 12+ materialize multi-referenced CTEs instead.

``run_with_materialized_ctes`` brings that execution strategy to any SQL
text WITHOUT changing the text (the verbatim-fidelity contract): it
splits the top-level WITH clause, registers each CTE as a temp view in
definition order, and materializes the ones referenced more than once
via a lazy ``localCheckpoint`` (computed once per execution, freed by
the ContextCleaner on GC — the same reuse mechanism as
inventory/pipeline_text._reusable_signatures). Single-referenced CTEs
stay lazy views, preserving Catalyst's inline pushdown for them.

MEASURED VERDICT — default OFF. A 12-query same-session A/B over the
multi-CTE verbatim TPC-DS tier at the x100 star fixture (median-of-3,
noop sink) measured inlining faster overall: 36.4 s inline vs 77.9 s
materialized. Consumer-specific filter pushdown into the CTE body is the
dominant effect on Spark — q4/q11's per-(channel,year) branch filters
prune two of year_total's three union arms per consumer, and q95's
``ws_wh`` pair-list CTE feeds EXISTS subqueries that Catalyst plans as
pushed semi-joins when inline but must fully enumerate when materialized
(3.9 s -> 44.2 s). Materialization won only where the shared subtree is
expensive AND consumed unfiltered: q14 5.7->4.9, q23 5.2->4.4, q47/q57
marginal. Hence: the verbatim runner executes inline by default and
offers this strategy behind SPARK_GRAFT_MATERIALIZE_CTES=1 — the same
user-controlled posture as PostgreSQL's ``AS MATERIALIZED``. Correctness
of the strategy is hash-pinned against the DuckDB oracle either way
(tests/test_cte.py).

Scope: top-level WITH only (nested WITH inside a CTE body stays inline);
no RECURSIVE (callers' dialect layer handles that separately); no
column-list CTEs (falls back to verbatim). The scanner respects
single-quoted strings, double-quoted identifiers, and ``--`` / ``/* */``
comments; ANY shape the splitter cannot parse — including malformed
text — falls back to verbatim ``spark.sql(sql)`` rather than erroring.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_WITH_RE = re.compile(r"^\s*with\s+", re.IGNORECASE)


def _skip_literal(sql: str, i: int) -> int:
    """i points at a quote/comment opener; return index just past it."""
    c = sql[i]
    if c == "'" or c == '"':
        j = i + 1
        while j < len(sql):
            if sql[j] == c:
                if j + 1 < len(sql) and sql[j + 1] == c:  # '' escape
                    j += 2
                    continue
                return j + 1
            j += 1
        return j
    if sql.startswith("--", i):
        j = sql.find("\n", i)
        return len(sql) if j < 0 else j + 1
    if sql.startswith("/*", i):
        j = sql.find("*/", i + 2)
        return len(sql) if j < 0 else j + 2
    raise AssertionError("not at a literal")


def _at_literal(sql: str, i: int) -> bool:
    return sql[i] in "'\"" or sql.startswith("--", i) or sql.startswith("/*", i)


def _skip_insignificant(sql: str, i: int) -> int:
    """Advance past whitespace and comments to the next significant char."""
    while i < len(sql):
        if sql[i].isspace():
            i += 1
        elif sql.startswith("--", i) or sql.startswith("/*", i):
            i = _skip_literal(sql, i)
        else:
            break
    return i


def _strip_insignificant(sql: str) -> str:
    """Copy of ``sql`` with string literals, quoted identifiers, and
    comments blanked out (replaced by spaces), so identifier-reference
    counting cannot match inside them."""
    out = []
    i = 0
    while i < len(sql):
        if _at_literal(sql, i):
            j = _skip_literal(sql, i)
            out.append(" " * (j - i))
            i = j
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


def _match_paren(sql: str, i: int) -> int:
    """i points at '('; return the index of its matching ')'."""
    depth = 0
    while i < len(sql):
        c = sql[i]
        if _at_literal(sql, i):
            i = _skip_literal(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def split_top_level_ctes(sql: str):
    """Split ``WITH a AS (...), b AS (...) <remainder>``.

    Returns (ctes, remainder) where ctes is a list of (name, body_sql),
    or None when the text has no top-level WITH (or uses RECURSIVE,
    which is left to the dialect layer).
    """
    m = _WITH_RE.match(sql)
    if not m:
        return None
    i = _skip_insignificant(sql, m.end())
    if re.match(r"recursive\b", sql[i:], re.IGNORECASE):
        return None
    ctes: list[tuple[str, str]] = []
    while True:
        nm = re.compile(r"[A-Za-z_][A-Za-z_0-9]*").match(sql, i)
        if not nm:
            return None
        name = nm.group(0)
        i = _skip_insignificant(sql, nm.end())
        # optional column list: name (c1, c2) AS (...) — would need
        # view-level renames; none of the supported texts use them, so
        # bail out to plain execution
        if i < len(sql) and sql[i] == "(":
            return None
        am = re.match(r"as\b", sql[i:], re.IGNORECASE)
        if not am:
            return None
        i = _skip_insignificant(sql, i + am.end())
        if i >= len(sql) or sql[i] != "(":
            return None
        body_close = _match_paren(sql, i)
        ctes.append((name, sql[i + 1 : body_close]))
        i = _skip_insignificant(sql, body_close + 1)
        if i < len(sql) and sql[i] == ",":
            i = _skip_insignificant(sql, i + 1)
            continue
        return ctes, sql[i:]


def _ident_refs(name: str, text: str) -> int:
    """Occurrences of ``name`` as an identifier in ``text`` — literals,
    quoted identifiers, and comments are blanked first so a mention
    inside a string or comment cannot inflate the count (it would only
    misclassify materialize-vs-inline, but keep it honest)."""
    return len(
        re.findall(rf"\b{re.escape(name)}\b", _strip_insignificant(text), re.IGNORECASE)
    )


def run_with_materialized_ctes(
    spark: SparkSession, sql: str, min_refs: int = 2
) -> DataFrame:
    """Execute ``sql``; top-level CTEs referenced >= min_refs times
    downstream are materialized once (lazy localCheckpoint), the rest
    become plain temp views (equivalent to Catalyst's inlining). Falls
    back to ``spark.sql(sql)`` verbatim when the text has no top-level
    WITH or ANY shape the splitter does not support (including malformed
    text — the splitter may raise on unbalanced parens)."""
    try:
        parsed = split_top_level_ctes(sql)
    except Exception:
        parsed = None
    if parsed is None:
        return spark.sql(sql)
    ctes, remainder = parsed
    registered: list[str] = []
    try:
        for idx, (name, body) in enumerate(ctes):
            # '\n'-joined INCLUDING the remainder: concatenating without a
            # separator could glue the last body's trailing token to the
            # remainder's first and miss a \b-boundary reference
            downstream = "\n".join([b for _, b in ctes[idx + 1 :]] + [remainder])
            df = spark.sql(body)
            if _ident_refs(name, downstream) >= min_refs:
                df = df.localCheckpoint(eager=False)
            df.createOrReplaceTempView(name)
            registered.append(name)
        return spark.sql(remainder)
    finally:
        # the returned DF's plan is resolved eagerly at spark.sql() time,
        # so the views can be dropped immediately — they must not shadow
        # same-named tables for later queries in the session
        for name in registered:
            spark.catalog.dropTempView(name)
