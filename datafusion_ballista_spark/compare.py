"""Cross-engine result comparison — the driver's CORRECTNESS contract.

Run a Spark DataFrame and a DuckDB oracle SQL over the same parquet and
compare row count, column names, and values order-insensitively (columns
sorted by name, rows sorted after cell normalization). Used by the pytest
gate (tests/conftest.py) and the full-inventory artifact tool
(tools/local_correctness.py).
"""

from __future__ import annotations

import math


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation noise far below our rounding levels
        return round(v + 0.0, 9)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def compare_query(spark_df, oracle_con, oracle_sql: str | None) -> dict:
    """Run both sides; return a driver-shaped CORRECTNESS record."""
    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        s_cols = list(spark_df.columns)
        s_rows = [tuple(r) for r in spark_df.collect()]
        rec["spark_rows"] = len(s_rows)
        if oracle_sql is None:
            # rows-only check: executes and returns
            rec["rows_match"] = True
            return rec
        rel = oracle_con.sql(oracle_sql)
        o_cols = list(rel.columns)
        o_rows = [tuple(r) for r in rel.fetchall()]
        rec["oracle_rows"] = len(o_rows)
        rec["rows_match"] = len(s_rows) == len(o_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
        _, sn = normalize(s_cols, s_rows)
        _, on = normalize(o_cols, o_rows)
        rec["hash_match"] = rec["rows_match"] and rec["schema_match"] and sn == on
    except Exception as ex:  # recorded, not raised: the artifact shows it
        rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
    return rec
