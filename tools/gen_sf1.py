"""Scale the driver's sf0.1 fixtures to sf1 for a stress-gate run.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The
reference gates CI at TPC-H SF10 and publishes SF1000
(reference: .github/workflows/tpch.yml:53-71, docs/.../benchmarking.md) —
an order-of-magnitude stress point above the daily fixture is part of its
test strategy, so replicate it: synthesize sf1 by stacking 10 key-shifted
copies of sf0.1. Every key column shifts by copy*1e8, preserving
referential integrity (orders.o_custkey shifts with customer.c_custkey,
lineitem's three FKs with their dims), so join/agg cardinalities scale the
way TPC-H scales. region/nation stay fixed (bounded dims, as in TPC-H).

Correctness at sf1 is still oracle-gated: tools/local_correctness.py runs
Spark and DuckDB over the SAME files, so the 10x replication (including
its deliberately duplicated document texts — a dedup stress case) affects
both engines identically.

Determinism: pure relational restatement of committed inputs — no RNG,
bit-identical on regeneration. Output is ~170MB and NOT committed
(fixtures/sf1/ is gitignored); rerun this script to rebuild.

Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 100_000_000  # > any key in sf0.1; copies never collide

# table -> key columns to shift per copy (referential integrity pairs
# shift by the same constant on both sides of each FK edge).
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def generate(src: str, out: str, factor: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # multiple row groups per file so Spark splits the scan into parallel
    # tasks (the committed fixtures are single-row-group = 1 task).
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
    for t, keys in SHIFT_COLS.items():
        cols = [f.strip() for f in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall() for f in [f[0]]]
        sel = ", ".join(
            f"{c} + k.k * {SHIFT} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({factor})) AS k) k ORDER BY k.k) "
            f"TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 262144)"
        )
    for t in list(SHIFT_COLS) + COPY_AS_IS:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, os.path.abspath(dst), factor)
