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
