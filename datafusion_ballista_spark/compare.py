"""Cross-engine result comparison — the driver's CORRECTNESS contract.

Run a Spark DataFrame and a DuckDB oracle SQL over the same parquet and
compare row count, column names, and values order-insensitively (columns
sorted by name, rows sorted after cell normalization). Used by the pytest
gate (tests/conftest.py) and the full-inventory artifact tool
(tools/local_correctness.py).

Round-3 lesson baked in: the oracle side is fetched via Arrow, not
``fetchall()``. DuckDB returns HUGEINT (arrow decimal128(38,0)) for
``SUM(INTEGER)`` and ``factorial()``; ``fetchall()`` collapses that to a
Python int, hiding a type-level difference the driver's hash sees — 10
rows were locally green and driver-red in round 3 because of exactly
this. Normalization is therefore type-marked: Decimal cells and float
cells carry a kind tag, so decimal-vs-bigint and double-vs-bigint
divergences go red here before they go red on the driver.
"""

from __future__ import annotations

import math
from decimal import Decimal


def _canon_decimal(v: Decimal) -> str:
    # Fixed-point text with trailing zeros stripped, so decimal(38,2)
    # "123.40" and decimal(22,4) "123.4000" canonicalize identically.
    s = format(v, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("-0", "") else s


def norm_cell(v, *, strict_floats: bool = False):
    if v is None:
        return None
    if isinstance(v, bool):  # before int/float checks (bool is an int)
        return v
    if isinstance(v, Decimal):
        # Kind-tagged: a DuckDB HUGEINT/DECIMAL result must NOT silently
        # equal a Spark bigint — that is the driver divergence of round 3.
        return ("dec", _canon_decimal(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if strict_floats:
            # BIT-EXACT mode (the float audit, round-8): -0.0 and NaN
            # canonicalized, everything else raw — a mismatch here that
            # the 9dp/12sg mode hides means the normalization is
            # LOAD-BEARING for that query, i.e. the driver's own hash
            # (which may not normalize) could diverge where the local
            # gate stays green — the same blind-spot class as the
            # round-6 decimal-representation reds.
            return ("f", v + 0.0)
        # kill -0.0 and representation noise far below our rounding levels;
        # kind-tagged so double-vs-int divergences are visible too. The 9dp
        # rounding is ABSOLUTE, so it does nothing at large magnitudes —
        # cap at 12 significant digits too: the engines' decimal->double
        # conversions legitimately differ by 1 ULP, and ULP(2.8e10) ~ 4e-6
        # (first seen on tpch_q1.sum_charge at the sf1 stress gate).
        return ("f", float(f"{round(v + 0.0, 9):.12g}"))
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, dict):  # map/struct cells (either engine)
        return tuple(
            sorted(
                (str(k), norm_cell(x, strict_floats=strict_floats))
                for k, x in v.items()
            )
        )
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x, strict_floats=strict_floats) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(cols, rows, *, sort_rows: bool = True, strict_floats: bool = False):
    """Columns are always sorted by name; rows are sorted unless
    ``sort_rows=False`` (the ordered second comparison mode — hash rows
    in RETURNED order, closing the driver-vs-replica semantic unknown of
    whether the driver's hash is order-sensitive). ``strict_floats=True``
    compares float cells bit-exactly (the float-normalization audit)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(norm_cell(r[i], strict_floats=strict_floats) for i in order)
        for r in rows
    ]
    if sort_rows:
        out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def hugeint_columns(arrow_table) -> list[str]:
    """Names of columns carrying DuckDB's HUGEINT signature
    (decimal128(38,0)) — almost always an un-cast SUM(int)/factorial()
    in the oracle SQL that must be wrapped in CAST(... AS BIGINT)."""
    try:
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        return []
    out = []
    for field in arrow_table.schema:
        t = field.type
        if pa.types.is_decimal(t) and t.precision == 38 and t.scale == 0:
            out.append(field.name)
    return out


def decimal_output_columns(spark_df) -> list[str]:
    """Names of Spark output columns whose type contains a DecimalType
    (including nested array/map/struct elements).

    Round-6 driver lesson: even when Spark and DuckDB return bit-identical
    decimal VALUES, the driver's value hash diverges on decimal
    *representation* (tpcds_real q12/q20/q37: rows+schema green, hash red;
    exactly the three queries emitting a bare decimal(7,2) passthrough).
    ``norm_cell``'s scale-stripping canonicalization is blind to this
    class by construction, so the local gate instead refuses bare
    DecimalType outputs entirely — pin them to DOUBLE (exact for the
    2dp money columns) or BIGINT before they reach the output schema."""
    from pyspark.sql import types as T

    def has_decimal(dt) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return has_decimal(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_decimal(dt.keyType) or has_decimal(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(has_decimal(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in spark_df.schema.fields if has_decimal(f.dataType)]


def complex_output_columns(spark_df) -> list[str]:
    """Names of Spark output columns with a complex (array/map/struct)
    top-level type.

    Round-10 driver lesson: the driver canonicalizes results with a
    pandas ``sort_values`` over ALL columns, which dies with
    ``TypeError: unhashable type: 'list'`` on any array cell
    (emb_random_projection was rows/schema/hash-green locally and red
    on the driver for exactly this). Registry outputs must therefore be
    scalar-only — flatten arrays to p0..pN columns or ``array_join``
    them to a string before the output schema."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def driver_canon_check(cols, rows) -> None:
    """Replicate the driver harness's canonicalization move on collected
    Spark rows: build a pandas DataFrame and ``sort_values`` over every
    column (the exact call that raised on round 10's array<bigint>
    output). Raises the same exception class the driver would — running
    this inside the local gate means a harness-shape red can never again
    appear only in the driver window."""
    import pandas as pd

    if not cols:
        return
    pdf = pd.DataFrame(rows, columns=list(cols), dtype=object)
    # mirror the driver EXACTLY: a plain multi-column sort_values (no
    # key=), which factorizes each column via a pandas hash table — the
    # step that is unhashable-cell-intolerant. Adding a key= here would
    # hide exactly the failure this check exists to surface.
    pdf.sort_values(by=list(cols))


def fetch_oracle(rel):
    """(columns, row-tuples, hugeint column names) from a DuckDB relation,
    fetched via Arrow so type-level divergence survives into the compare."""
    tbl = rel.arrow()
    cols = list(tbl.column_names)
    # per-column fetch, NOT to_pylist(): a row-dict collapses duplicate
    # output names (q39's twin inv1/inv2 columns) to the last value.
    rows = list(zip(*[col.to_pylist() for col in tbl.columns])) if cols else []
    return cols, rows, hugeint_columns(tbl)


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
        dec_cols = decimal_output_columns(spark_df)
        if dec_cols:
            # Treated as a failure, not a warning: the driver's hash is
            # known to diverge on decimal representation even when values
            # match (round-6 q12/q20/q37).
            rec["decimal_output"] = dec_cols
        cplx_cols = complex_output_columns(spark_df)
        if cplx_cols:
            # Same treatment: the driver's pandas canonicalizer cannot
            # sort complex cells (round-10 emb_random_projection).
            rec["complex_output"] = cplx_cols
        s_rows = [tuple(r) for r in spark_df.collect()]
        rec["spark_rows"] = len(s_rows)
        # driver-canon pre-flight: the driver's own sort_values must
        # succeed on these rows or this records the same error it would
        driver_canon_check(s_cols, s_rows)
        if oracle_sql is None:
            # rows-only check: executes and returns
            rec["rows_match"] = True
            return rec
        o_cols, o_rows, hugeints = fetch_oracle(oracle_con.sql(oracle_sql))
        if hugeints:
            rec["warn_hugeint"] = hugeints
        rec["oracle_rows"] = len(o_rows)
        rec["rows_match"] = len(s_rows) == len(o_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
        _, sn = normalize(s_cols, s_rows)
        _, on = normalize(o_cols, o_rows)
        rec["hash_match"] = (
            rec["rows_match"]
            and rec["schema_match"]
            and sn == on
            and not dec_cols
            and not cplx_cols
        )
        # Second, stricter mode recorded alongside (never gates): rows
        # hashed in RETURNED order. True for fully-ORDER-BY-determined
        # outputs; False only flags order-underdetermined queries — the
        # class that would diverge IF the driver's hash is row-order
        # sensitive.
        _, sn_o = normalize(s_cols, s_rows, sort_rows=False)
        _, on_o = normalize(o_cols, o_rows, sort_rows=False)
        rec["ordered_match"] = bool(rec["hash_match"]) and sn_o == on_o
        # Third recorded mode (never gates here; the pytest gate enforces
        # it with a documented whitelist): float cells compared BIT-EXACT.
        # False while hash_match is True means the 9dp/12sg normalization
        # is load-bearing — the cross-engine float divergence class the
        # driver's own hash might not absorb.
        _, sn_s = normalize(s_cols, s_rows, strict_floats=True)
        _, on_s = normalize(o_cols, o_rows, strict_floats=True)
        rec["float_strict_match"] = bool(rec["hash_match"]) and sn_s == on_s
    except Exception as ex:  # recorded, not raised: the artifact shows it
        rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
    return rec
