"""Session-facade behavior specs mirrored from the reference client tests
(ballista/client/tests/context_checks.rs): SET/SHOW round trips (:239-340),
EXPLAIN / EXPLAIN ANALYZE (:1072,1129), ANALYZE TABLE (datafusion.proto:224-228),
plus the parameterized-SQL binding path."""

from __future__ import annotations

import os
import shutil

import pytest

from datafusion_ballista_spark.session import BallistaSession
from tests.conftest import SF_DIR


@pytest.fixture()
def bs(spark):
    return BallistaSession(spark)


def test_set_round_trip(bs):
    # context_checks.rs:239-340 — SET through the SQL entry point, read back
    # through the translated config surface.
    prev = bs.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        out = bs.sql("SET ballista.optimizer.broadcast_join_threshold_bytes = 2097152")
        assert out.count() == 0  # SET yields an empty OK relation
        assert bs.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "2097152"
        # native Spark keys pass through untranslated
        bs.sql("SET spark.sql.shuffle.partitions = 16")
        assert bs.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    finally:
        bs.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        bs.spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_show_tables_lists_registered(bs):
    bs.register_parquet("show_t1", os.path.join(SF_DIR, "region.parquet"))
    assert "show_t1" in bs.tables()
    rows = bs.sql("SHOW TABLES").collect()
    assert any(r.tableName == "show_t1" for r in rows)


def test_explain_formatted(bs):
    bs.register_parquet("ex_nation", os.path.join(SF_DIR, "nation.parquet"))
    bs.register_parquet("ex_region", os.path.join(SF_DIR, "region.parquet"))
    plan = bs.explain(
        "SELECT n_name FROM ex_nation JOIN ex_region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA'"
    )
    assert "Join" in plan
    # predicate pushdown must reach the scan (the 100x grade)
    assert "PushedFilters" in plan


def test_explain_analyze_has_metrics(bs):
    bs.register_parquet("exa_nation", os.path.join(SF_DIR, "nation.parquet"))
    plan = bs.explain("SELECT COUNT(*) AS n FROM exa_nation", analyze=True)
    # executed AQE plan carries operator tree + is marked final
    assert "HashAggregate" in plan


def test_analyze_table(bs, tmp_path):
    src = os.path.join(SF_DIR, "region.parquet")
    loc = str(tmp_path / "region_tbl")
    shutil.copytree(src, loc) if os.path.isdir(src) else shutil.copy(src, loc)
    bs.spark.sql("DROP TABLE IF EXISTS analyze_region")
    bs.spark.sql(
        f"CREATE TABLE analyze_region USING parquet LOCATION '{loc}'"
    )
    try:
        bs.analyze_table("analyze_region")
        stats = bs.spark.sql("DESCRIBE TABLE EXTENDED analyze_region").collect()
        assert any("Statistics" in str(r) for r in stats)
    finally:
        bs.spark.sql("DROP TABLE IF EXISTS analyze_region")


def test_parameterized_binding(bs):
    bs.register_parquet("param_nation", os.path.join(SF_DIR, "nation.parquet"))
    df = bs.spark.sql(
        "SELECT COUNT(*) AS n FROM param_nation WHERE n_regionkey = :rk",
        args={"rk": 2},
    )
    n_param = df.collect()[0].n
    n_lit = bs.sql(
        "SELECT COUNT(*) AS n FROM param_nation WHERE n_regionkey = 2"
    ).collect()[0].n
    assert n_param == n_lit > 0


def test_information_schema_tables_and_columns(bs):
    bs.register_parquet("info_nation", os.path.join(SF_DIR, "nation.parquet"))
    rows = bs.sql(
        "SELECT table_name, table_type FROM information_schema.tables"
    ).collect()
    assert any(r.table_name == "info_nation" for r in rows)
    cols = bs.sql(
        "SELECT column_name, ordinal_position, data_type "
        "FROM information_schema.columns WHERE table_name = 'info_nation' "
        "ORDER BY ordinal_position"
    ).collect()
    assert [c.column_name for c in cols] == [
        "n_nationkey", "n_name", "n_regionkey",
    ]
    assert cols[0].data_type == "int"


def test_information_schema_schemata_and_settings(bs):
    schemas = bs.sql(
        "SELECT schema_name FROM information_schema.schemata"
    ).collect()
    assert any(r.schema_name == "default" for r in schemas)
    bs.sql("SET ballista.shuffle.partitions = 8")
    settings = bs.sql(
        "SELECT name, value FROM information_schema.df_settings "
        "WHERE name = 'spark.sql.shuffle.partitions'"
    ).collect()
    assert settings and settings[0].value == "8"


def test_create_schema_ddl(bs):
    # CREATE SCHEMA / DATABASE pass through natively (CreateCatalogSchema,
    # datafusion.proto:190-201); verify via the catalog and info-schema.
    bs.sql("CREATE SCHEMA IF NOT EXISTS bs_test_schema")
    try:
        names = [d.name for d in bs.spark.catalog.listDatabases()]
        assert "bs_test_schema" in names
        rows = bs.sql(
            "SELECT schema_name FROM information_schema.schemata"
        ).collect()
        assert any(r.schema_name == "bs_test_schema" for r in rows)
    finally:
        bs.spark.sql("DROP SCHEMA IF EXISTS bs_test_schema")


def test_analyze_table_column_stats(bs, tmp_path):
    # FOR ALL COLUMNS records per-column min/max/null-count (the reference's
    # ColumnStats, datafusion_common.proto:655-681).
    bs.spark.sql("DROP TABLE IF EXISTS analyze_cols")
    bs.spark.range(100).selectExpr("id", "id % 7 AS g").write.saveAsTable(
        "analyze_cols"
    )
    try:
        bs.analyze_table("analyze_cols", columns=True)
        desc = bs.spark.sql("DESCRIBE EXTENDED analyze_cols id").collect()
        info = {r.info_name: r.info_value for r in desc}
        assert info.get("min") == "0"
        assert info.get("max") == "99"
        assert info.get("num_nulls") == "0"
    finally:
        bs.spark.sql("DROP TABLE IF EXISTS analyze_cols")


def test_stats_drive_broadcast_promotion(bs):
    # A small table with recorded stats is broadcast WITHOUT a hint: the
    # size estimate (from stats) sits under autoBroadcastJoinThreshold —
    # the same size-driven promotion as the reference's join_selection.
    bs.spark.sql("DROP TABLE IF EXISTS bc_dim")
    bs.spark.range(50).selectExpr(
        "id AS k", "concat('v', id) AS v"
    ).write.saveAsTable("bc_dim")
    try:
        bs.analyze_table("bc_dim", columns=True)
        big = bs.spark.range(100000).selectExpr("id % 50 AS k", "id AS x")
        plan = (
            big.join(bs.spark.table("bc_dim"), "k")
            ._jdf.queryExecution()
            .explainString(
                bs.spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        )
        assert "BroadcastHashJoin" in plan, plan
    finally:
        bs.spark.sql("DROP TABLE IF EXISTS bc_dim")


def test_show_functions_like_patterns(bs):
    """SHOW FUNCTIONS LIKE: SQL %/_ wildcards work, and glob
    metacharacters in the pattern are literals (SQL LIKE has no glob
    semantics — a literal '[' must not open an fnmatch char class)."""
    all_names = {r.function_name for r in bs.sql("SHOW FUNCTIONS").collect()}
    assert "regexp_like" in all_names
    pre = {r.function_name for r in bs.sql("SHOW FUNCTIONS LIKE 'regexp%'").collect()}
    assert pre and pre == {n for n in all_names if n.startswith("regexp")}
    one = {r.function_name for r in bs.sql("SHOW FUNCTIONS LIKE 'md_'").collect()}
    assert one == {"md5"}
    # glob metachars are literal: no registered name contains *, ?, or [
    for lit in ("*", "m*", "[m]d5", "?d5"):
        got = bs.sql(f"SHOW FUNCTIONS LIKE '{lit}'").collect()
        assert got == [], f"pattern {lit!r} should match nothing, got {got}"
