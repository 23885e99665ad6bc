"""Null-aware NOT IN semantics, mirroring the reference's null corpus
(ballista/client/tests/null_aware.rs): the engine must agree with DuckDB's
true NOT IN on null-bearing keys, empty subqueries, and null subquery rows.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_ballista_spark.inventory.util import not_in_join

LEFT = [(1, "a"), (2, "b"), (3, "c"), (None, "d")]
CASES = {
    "plain": [(2,), (5,)],
    "with_null": [(2,), (None,)],
    "all_null": [(None,)],
    "empty": [],
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_not_in_matches_duckdb(spark, case):
    right = CASES[case]
    left_df = spark.createDataFrame(LEFT, "k int, v string")
    right_df = spark.createDataFrame(right, "rk int")
    got = sorted(
        [(r.k, r.v) for r in not_in_join(left_df, "k", right_df, "rk").collect()],
        key=str,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INTEGER, v VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?, ?)", LEFT)
    con.execute("CREATE TABLE r (rk INTEGER)")
    if right:
        con.executemany("INSERT INTO r VALUES (?)", right)
    want = sorted(
        con.sql("SELECT k, v FROM l WHERE k NOT IN (SELECT rk FROM r)").fetchall(),
        key=str,
    )
    assert got == want, f"case={case}: spark={got} duckdb={want}"
