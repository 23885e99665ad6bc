"""Unit tests for the SQL dialect rewrites and config SET path.

Behavior spec: reference client tests (ballista/client/tests/
context_checks.rs:239-340 for SET/SHOW; :381 for CREATE EXTERNAL TABLE).
"""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.sql import (
    UnsupportedSQLFeature,
    rewrite_sql,
    similar_to_regex,
)


class TestSimilarTo:
    def test_wildcards_translated_and_anchored(self):
        assert similar_to_regex("hot%") == "^(?:hot.*)$"
        assert similar_to_regex("h_t") == "^(?:h.t)$"

    def test_regex_specials_escaped(self):
        # '.' is a literal in SIMILAR TO
        assert similar_to_regex("a.b") == "^(?:a\\.b)$"

    def test_similar_meta_preserved(self):
        assert similar_to_regex("(a|b)+") == "^(?:(a|b)+)$"

    def test_rewrite_in_query(self):
        q = rewrite_sql("SELECT * FROM t WHERE x SIMILAR TO 'hot%'")
        assert "RLIKE '^(?:hot.*)$'" in q

    def test_not_similar(self):
        q = rewrite_sql("SELECT * FROM t WHERE x NOT SIMILAR TO 'a_'")
        assert "NOT RLIKE '^(?:a.)$'" in q

    def test_non_literal_pattern_rejected(self):
        with pytest.raises(UnsupportedSQLFeature):
            rewrite_sql("SELECT * FROM t WHERE x SIMILAR TO y")

    def test_semantics_on_spark(self, spark):
        # SIMILAR TO is a full-string match: 'abc' SIMILAR TO 'a' is false.
        q = rewrite_sql(
            "SELECT 'abc' SIMILAR TO 'a' AS m1, 'abc' SIMILAR TO 'a%' AS m2, "
            "'abc' SIMILAR TO 'a.c' AS m3, 'a.c' SIMILAR TO 'a.c' AS m4"
        )
        row = spark.sql(q).collect()[0]
        assert (row.m1, row.m2, row.m3, row.m4) == (False, True, False, True)


class TestExternalTable:
    def test_basic(self):
        q = rewrite_sql(
            "CREATE EXTERNAL TABLE t STORED AS PARQUET LOCATION '/tmp/x'"
        )
        assert q == "CREATE TABLE t USING parquet LOCATION '/tmp/x'"

    def test_parenthesized_types(self):
        q = rewrite_sql(
            "CREATE EXTERNAL TABLE t (a DECIMAL(10,2), b INT) "
            "STORED AS CSV LOCATION '/tmp/x'"
        )
        assert "(a DECIMAL(10,2), b INT)" in q
        assert "USING csv" in q

    def test_header_row(self):
        q = rewrite_sql(
            "CREATE EXTERNAL TABLE t STORED AS CSV WITH HEADER ROW "
            "LOCATION '/tmp/x'"
        )
        assert "OPTIONS (header 'true')" in q

    def test_partitioned_by(self):
        q = rewrite_sql(
            "CREATE EXTERNAL TABLE t (a INT, b INT) STORED AS PARQUET "
            "PARTITIONED BY (b) LOCATION '/tmp/x'"
        )
        assert "PARTITIONED BY (b)" in q

    def test_with_order_rejected(self):
        with pytest.raises(UnsupportedSQLFeature):
            rewrite_sql(
                "CREATE EXTERNAL TABLE t (a INT) STORED AS CSV "
                "WITH ORDER (a ASC) LOCATION '/tmp/x'"
            )


class TestGroups:
    def test_groups_frame_rejected(self):
        with pytest.raises(UnsupportedSQLFeature):
            rewrite_sql(
                "SELECT sum(x) OVER (ORDER BY y GROUPS BETWEEN 1 PRECEDING "
                "AND CURRENT ROW) FROM t"
            )


class TestSetPath:
    def test_set_translates_and_applies(self, spark):
        from datafusion_ballista_spark.session import BallistaSession

        s = BallistaSession(spark)
        before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            s.sql("SET ballista.optimizer.broadcast_join_threshold_bytes = 12345")
            assert (
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "12345"
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)

    def test_set_returns_empty_df(self, spark):
        from datafusion_ballista_spark.session import BallistaSession

        s = BallistaSession(spark)
        assert s.sql("SET spark.sql.shuffle.partitions = 8").count() == 0


class TestCopyTo:
    def test_parse_query_source(self):
        from datafusion_ballista_spark.sql import parse_copy

        cp = parse_copy(
            "COPY (SELECT a, b FROM t WHERE a > 1) TO '/tmp/out' "
            "STORED AS PARQUET"
        )
        assert cp.source_sql == "SELECT a, b FROM t WHERE a > 1"
        assert cp.path == "/tmp/out"
        assert cp.fmt == "parquet"
        assert cp.partition_by == [] and cp.options == {}

    def test_parse_table_source_and_legacy_format(self):
        from datafusion_ballista_spark.sql import parse_copy

        cp = parse_copy("COPY mytable TO '/tmp/out.csv' (FORMAT csv)")
        assert cp.source_sql == "SELECT * FROM mytable"
        assert cp.fmt == "csv"

    def test_parse_extension_inference_and_partition(self):
        from datafusion_ballista_spark.sql import parse_copy

        cp = parse_copy(
            "COPY t TO '/tmp/out.json' PARTITIONED BY (y, m) "
            "OPTIONS ('compression' 'gzip')"
        )
        assert cp.fmt == "json"
        assert cp.partition_by == ["y", "m"]
        assert cp.options == {"compression": "gzip"}

    def test_parse_non_copy_returns_none(self):
        from datafusion_ballista_spark.sql import parse_copy

        assert parse_copy("SELECT 1") is None

    def test_unknown_format_rejected(self):
        from datafusion_ballista_spark.sql import UnsupportedSQLFeature, parse_copy

        with pytest.raises(UnsupportedSQLFeature):
            parse_copy("COPY t TO '/tmp/out.xlsx'")

    def test_copy_executes_on_spark(self, spark, tmp_path):
        from datafusion_ballista_spark.session import BallistaSession

        bs = BallistaSession(spark)
        spark.range(10).selectExpr(
            "id", "id % 3 AS g"
        ).createOrReplaceTempView("copy_src")
        out = str(tmp_path / "copy_out")
        res = bs.sql(
            f"COPY (SELECT * FROM copy_src WHERE id < 7) TO '{out}' "
            "STORED AS PARQUET"
        ).collect()
        assert res[0]["count"] == 7
        assert spark.read.parquet(out).count() == 7

    def test_copy_csv_roundtrip(self, spark, tmp_path):
        from datafusion_ballista_spark.session import BallistaSession

        bs = BallistaSession(spark)
        out = str(tmp_path / "copy_csv")
        res = bs.sql(f"COPY (SELECT 1 AS a, 'x' AS b) TO '{out}' (FORMAT csv)")
        assert res.collect()[0]["count"] == 1


class TestQualify:
    def test_basic_rewrite(self):
        q = rewrite_sql(
            "SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rk FROM t "
            "QUALIFY rk <= 3 ORDER BY a"
        )
        assert q.startswith("SELECT * FROM (SELECT a,")
        assert "WHERE rk <= 3 ORDER BY a" in q
        assert "QUALIFY" not in q.upper().replace("__QUALIFY", "")

    def test_no_tail(self):
        q = rewrite_sql("SELECT a, rank() OVER (ORDER BY a) r FROM t QUALIFY r = 1")
        assert q.endswith("WHERE r = 1")

    def test_nested_qualify_rejected(self):
        with pytest.raises(UnsupportedSQLFeature):
            rewrite_sql(
                "SELECT * FROM (SELECT a, r FROM t QUALIFY r = 1) x "
                "QUALIFY a = 2"
            )

    def test_semantics_on_spark(self, spark):
        spark.range(10).selectExpr("id", "id % 2 AS g").createOrReplaceTempView(
            "qual_t"
        )
        q = rewrite_sql(
            "SELECT g, id, ROW_NUMBER() OVER "
            "(PARTITION BY g ORDER BY id DESC) AS rk "
            "FROM qual_t QUALIFY rk = 1 ORDER BY g"
        )
        rows = spark.sql(q).collect()
        assert [(r.g, r.id) for r in rows] == [(0, 8), (1, 9)]


class TestExclude:
    def test_rewrite(self):
        q = rewrite_sql("SELECT * EXCLUDE (b, c) FROM t")
        assert q == "SELECT * EXCEPT (b, c) FROM t"

    def test_qualified_star(self):
        q = rewrite_sql("SELECT t.* EXCLUDE(b) FROM t")
        assert q == "SELECT t.* EXCEPT(b) FROM t"

    def test_semantics_on_spark(self, spark):
        spark.range(3).selectExpr("id", "id * 2 AS b").createOrReplaceTempView(
            "excl_t"
        )
        q = rewrite_sql("SELECT * EXCLUDE (b) FROM excl_t")
        assert spark.sql(q).columns == ["id"]
