"""SQL-dialect shims: rewrite DataFusion-isms Spark SQL rejects.

Reference dialect surface: CREATE EXTERNAL TABLE (datafusion.proto:163-180,
test ballista/client/tests/context_checks.rs:381), SIMILAR TO
(datafusion.proto:595-615). Spark-side targets per SURVEY.md §7.1 step 4.

Deliberately regex-light: these are syntactic renames, not a SQL parser.
Anything semantically different (GROUPS frames) raises with a clear error.
"""

from __future__ import annotations

import re

_EXTERNAL_TABLE_RE = re.compile(
    r"CREATE\s+EXTERNAL\s+TABLE\s+(?P<name>\w+)\s*"
    r"(?P<cols>\([^)]*\))?\s*"
    r"STORED\s+AS\s+(?P<fmt>\w+)\s+"
    r"LOCATION\s+(?P<loc>'[^']+')",
    re.IGNORECASE | re.DOTALL,
)

_SIMILAR_TO_RE = re.compile(r"\bSIMILAR\s+TO\b", re.IGNORECASE)
_NOT_SIMILAR_TO_RE = re.compile(r"\bNOT\s+SIMILAR\s+TO\b", re.IGNORECASE)
_GROUPS_FRAME_RE = re.compile(r"\bGROUPS\s+BETWEEN\b", re.IGNORECASE)


class UnsupportedSQLFeature(Exception):
    """Raised for reference features with no Spark equivalent (SURVEY §7.2)."""


def rewrite_sql(query: str) -> str:
    """Apply dialect rewrites; pass everything else through to Spark SQL."""
    if _GROUPS_FRAME_RE.search(query):
        # SURVEY.md §2.6: GROUPS window frames do not exist in Spark.
        raise UnsupportedSQLFeature(
            "GROUPS window frames are not supported by Spark; rewrite with a "
            "dense_rank()-keyed RANGE frame (see SURVEY.md §2.6)"
        )

    def _ext(m: re.Match) -> str:
        cols = m.group("cols") or ""
        return (
            f"CREATE TABLE {m.group('name')} {cols} "
            f"USING {m.group('fmt')} LOCATION {m.group('loc')}"
        )

    query = _EXTERNAL_TABLE_RE.sub(_ext, query)
    # SIMILAR TO <regex> -> RLIKE; DataFusion/PG SIMILAR TO anchors the whole
    # string, Spark RLIKE is a contains-match: anchoring is the caller's
    # responsibility in complex cases, but we keep the common path working.
    query = _NOT_SIMILAR_TO_RE.sub("NOT RLIKE", query)
    query = _SIMILAR_TO_RE.sub("RLIKE", query)
    return query
