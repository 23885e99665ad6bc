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
