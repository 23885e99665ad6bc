"""Materialized-CTE execution (datafusion_ballista_spark/cte.py).

Correctness of the 99 verbatim queries under this strategy is pinned by
the inventory oracle gate; here we pin the splitter itself (quote/paren/
comment handling, fallback shapes) and the view-hygiene contract (no CTE
temp view survives the call).
"""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.cte import (
    run_with_materialized_ctes,
    split_top_level_ctes,
)


def test_split_basic_two_ctes():
    sql = "with a as (select 1 x), b as (select x from a) select * from b, a"
    ctes, rest = split_top_level_ctes(sql)
    assert [n for n, _ in ctes] == ["a", "b"]
    assert ctes[0][1].strip() == "select 1 x"
    assert rest.strip() == "select * from b, a"


def test_split_respects_strings_and_comments():
    sql = (
        "with a as (select '(,)' q, \"weird)name\" from t -- comment (\n"
        "), b as (select * from a) select * from b"
    )
    ctes, rest = split_top_level_ctes(sql)
    assert [n for n, _ in ctes] == ["a", "b"]
    assert "'(,)'" in ctes[0][1]
    assert rest.strip() == "select * from b"


def test_split_nested_parens():
    sql = "with a as (select * from (select (1+(2)) v) s) select v from a"
    ctes, rest = split_top_level_ctes(sql)
    assert len(ctes) == 1 and "((" not in ctes[0][0]
    assert rest.strip() == "select v from a"


def test_no_with_returns_none():
    assert split_top_level_ctes("select 1") is None
    assert split_top_level_ctes("  SELECT 'with a as (x)'") is None


def test_recursive_and_column_list_fall_back():
    assert split_top_level_ctes("with recursive r as (select 1) select 1") is None
    assert (
        split_top_level_ctes("with a (c1) as (select 1) select c1 from a")
        is None
    )


def test_all_verbatim_texts_split_or_fall_back():
    """Every tpcds_real body either splits cleanly (names match the crude
    regex census) or falls back to verbatim execution — the splitter must
    never mis-parse one of the 99 production texts."""
    import re

    from datafusion_ballista_spark.inventory import (
        tpcds_real, tpcds_real2, tpcds_real3, tpcds_real4, tpcds_real5,
        tpcds_real6, tpcds_real7, tpcds_real8, tpcds_real9,
    )

    for mod in (tpcds_real, tpcds_real2, tpcds_real3, tpcds_real4,
                tpcds_real5, tpcds_real6, tpcds_real7, tpcds_real8,
                tpcds_real9):
        for name, body in mod._BODIES.items():
            out = split_top_level_ctes(body)
            starts_with = bool(re.match(r"^\s*with\s", body, re.IGNORECASE))
            if not starts_with:
                assert out is None, name
                continue
            assert out is not None, f"{name}: WITH text failed to split"
            ctes, rest = out
            assert ctes and rest.strip(), name
            for cte_name, cte_body in ctes:
                assert re.match(r"^[A-Za-z_]\w*$", cte_name), (name, cte_name)
                assert cte_body.strip(), (name, cte_name)


def test_views_do_not_leak_and_result_matches_inline(spark):
    sql = (
        "with heavy as (select id % 7 k, sum(id) s from range(1000) "
        "group by id % 7) "
        "select a.k, a.s + b.s tot from heavy a join heavy b on a.k = b.k "
        "order by a.k"
    )
    out = run_with_materialized_ctes(spark, sql)
    inline = spark.sql(sql)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in inline.collect()
    ]
    assert not any(t.name == "heavy" for t in spark.catalog.listTables())


def test_single_ref_ctes_stay_lazy_views(spark):
    # referenced once -> no checkpoint node in the final plan
    sql = "with a as (select id from range(10)) select count(*) n from a"
    out = run_with_materialized_ctes(spark, sql)
    assert "ExistingRDD" not in out._jdf.queryExecution().optimizedPlan().toString()
    assert out.collect()[0].n == 10


@pytest.mark.parametrize(
    "name",
    [
        "tpcds_real_q4",
        "tpcds_real_q14",
        "tpcds_real_q23",
        "tpcds_real_q47",
        "tpcds_real_q57",
        "tpcds_real_q95",
    ],
)
def test_materialized_strategy_hash_matches_oracle(name, spark):
    """The opt-in materialized path must produce hash-identical results to
    the DuckDB oracle on real multi-CTE queries — including q95, whose
    EXISTS-feeding CTE is the measured worst case for materialization
    (slower, never wrong)."""
    import duckdb

    from datafusion_ballista_spark.inventory import all_queries
    from datafusion_ballista_spark.inventory.tpcds_real import _register
    from tests.conftest import assert_query_matches

    spec = all_queries()[name]
    _register(spark)
    bodies = {}
    from datafusion_ballista_spark.inventory import (
        tpcds_real, tpcds_real2, tpcds_real3, tpcds_real4, tpcds_real5,
        tpcds_real6, tpcds_real7, tpcds_real8, tpcds_real9,
    )

    for mod in (tpcds_real, tpcds_real2, tpcds_real3, tpcds_real4,
                tpcds_real5, tpcds_real6, tpcds_real7, tpcds_real8,
                tpcds_real9):
        bodies.update(mod._BODIES)
    df = run_with_materialized_ctes(spark, bodies[name])
    con = duckdb.connect()
    try:
        assert_query_matches(df, con, spec.oracle, f"{name}-materialized")
    finally:
        con.close()


def test_split_block_comments_and_inter_cte_comments():
    # ADVICE r6: '-- note' after a body's close paren, and /* */ blocks,
    # must not derail the top-level scan
    sql = (
        "with a as (select 1 as x) -- note\n"
        ", /* between */ b as (select x from a /* inner */)\n"
        "select * from b"
    )
    ctes, rem = split_top_level_ctes(sql)
    assert [n for n, _ in ctes] == ["a", "b"]
    assert rem.strip() == "select * from b"


def test_malformed_text_falls_back_verbatim(spark):
    # unbalanced paren after a valid-looking prefix: the splitter raises
    # internally; run_with_materialized_ctes must fall back, not error
    sql = "with a as (select 1 as x), b as (select x from a select * from b"
    with pytest.raises(Exception):
        spark.sql(sql).collect()  # genuinely invalid SQL either way
    # and a VALID text whose split raises ValueError in the scanner is
    # simulated by a half-comment shape the old scanner choked on:
    ok = "with a as (select 1 as x) -- trailing\nselect x from a"
    assert run_with_materialized_ctes(spark, ok).collect()[0][0] == 1


def test_ident_refs_ignore_strings_and_comments():
    from datafusion_ballista_spark.cte import _ident_refs

    text = "select 'heavy' as s, x -- heavy heavy\n /* heavy */ from heavy"
    assert _ident_refs("heavy", text) == 1
