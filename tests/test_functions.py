"""Unit tests for the DataFusion-name compat layer
(datafusion_ballista_spark/functions.py; reference registry:
ballista/core/src/registry.rs:20-73)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_spark import functions as dfn
from datafusion_ballista_spark.functions import FUNCTIONS, compat_fn

# (alias, build(fn) -> Column, expected)
CASES = [
    ("strpos", lambda f: f(F.lit("hello"), "ll"), 3),
    ("btrim", lambda f: f(F.lit("  x  ")), "x"),
    ("split_part", lambda f: f(F.lit("a-b-c"), F.lit("-"), F.lit(2)), "b"),
    ("starts_with", lambda f: f(F.lit("abc"), F.lit("ab")), True),
    ("ends_with", lambda f: f(F.lit("abc"), F.lit("bc")), True),
    ("to_hex", lambda f: f(F.lit(255)), "ff"),
    ("levenshtein", lambda f: f(F.lit("abc"), F.lit("abd")), 1),
    ("regexp_count", lambda f: f(F.lit("a1b2"), F.lit("[0-9]")), 2),
    ("power", lambda f: f(F.lit(2.0), F.lit(10.0)), 1024.0),
    ("iszero", lambda f: f(F.lit(0)), True),
    ("gcd", lambda f: f(F.lit(12), F.lit(18)), 6),
    ("gcd", lambda f: f(F.lit(0), F.lit(5)), 5),
    ("lcm", lambda f: f(F.lit(4), F.lit(6)), 12),
    ("factorial", lambda f: f(F.lit(5)), 120),
    ("nvl", lambda f: f(F.lit(None).cast("int"), F.lit(7)), 7),
    ("nvl2", lambda f: f(F.lit(1), F.lit("a"), F.lit("b")), "a"),
    ("ifnull", lambda f: f(F.lit(None).cast("int"), F.lit(3)), 3),
    ("nullif", lambda f: f(F.lit("x"), F.lit("x")), None),
    ("greatest", lambda f: f(F.lit(1), F.lit(3), F.lit(2)), 3),
    ("array_element", lambda f: f(F.array(F.lit(10), F.lit(20)), 2), 20),
    ("array_has", lambda f: f(F.array(F.lit(1), F.lit(2)), 2), True),
    (
        "array_has_all",
        lambda f: f(F.array(F.lit(1), F.lit(2), F.lit(3)), F.array(F.lit(1), F.lit(3))),
        True,
    ),
    (
        "array_has_all",
        lambda f: f(F.array(F.lit(1), F.lit(2)), F.array(F.lit(1), F.lit(9))),
        False,
    ),
    (
        "array_has_any",
        lambda f: f(F.array(F.lit(1)), F.array(F.lit(1), F.lit(9))),
        True,
    ),
    ("array_length", lambda f: f(F.array(F.lit(1), F.lit(2))), 2),
    ("array_empty", lambda f: f(F.array().cast("array<int>")), True),
    (
        "array_to_string",
        lambda f: f(F.array(F.lit("a"), F.lit("b")), ","),
        "a,b",
    ),
    ("try_cast", lambda f: f(F.lit("12x"), "int"), None),
    ("try_cast", lambda f: f(F.lit("12"), "int"), 12),
    ("md5", lambda f: f(F.lit("abc")), "900150983cd24fb0d6963f7d28e17f72"),
    (
        "sha256",
        lambda f: f(F.lit("abc")),
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
    ),
    ("map_extract", lambda f: f(F.create_map(F.lit("k"), F.lit(1)), "k"), 1),
    ("get_field", lambda f: f(F.struct(F.lit(5).alias("a")), "a"), 5),
    ("arrow_typeof", lambda f: f(F.lit(1)), "int"),
]


@pytest.mark.parametrize(
    "i,alias", [(i, c[0]) for i, c in enumerate(CASES)]
)
def test_alias(spark, i, alias):
    _, build, expected = CASES[i]
    got = spark.range(1).select(build(compat_fn(alias)).alias("v")).collect()[0].v
    assert got == expected, f"{alias}: got {got!r}, want {expected!r}"


def test_date_bin_matches_epoch_math(spark):
    df = spark.sql(
        "SELECT TIMESTAMP '2024-03-05 13:47:21.5' AS ts "
        "UNION ALL SELECT TIMESTAMP '1969-12-31 23:59:59'"
    )
    out = df.select(
        dfn.date_bin(900, "ts").alias("b"),
        F.col("ts"),
    ).collect()
    for r in sorted(out, key=lambda r: r.ts):
        epoch = r.ts.timestamp()
        want = (epoch // 900) * 900
        assert r.b.timestamp() == want, (r.ts, r.b)


def test_date_bin_custom_origin(spark):
    # origin shifts the bucket grid
    out = (
        spark.range(1)
        .select(
            dfn.date_bin(
                3600,
                F.lit("2024-01-01 05:30:00").cast("timestamp"),
                origin="2024-01-01 00:15:00",
            ).alias("b")
        )
        .collect()[0]
        .b
    )
    assert out.isoformat() == "2024-01-01T05:15:00"


def test_every_alias_resolves():
    for name in FUNCTIONS:
        assert callable(compat_fn(name)), name


def test_unknown_name_raises():
    with pytest.raises(KeyError):
        compat_fn("definitely_not_a_function")


def test_approx_bounds(spark):
    from datafusion_ballista_spark.inventory.functions_cov import fn_agg_approx
    from tests.conftest import SF_DIR

    rows = {r.event_type: r for r in fn_agg_approx(spark, SF_DIR).collect()}
    from datafusion_ballista_spark.sources.registry import load_table

    e = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        # the deterministic contract: every sketch landed in bounds and the
        # exact companion column carries the real cross-engine signal
        assert r.exact_users == exact[et]
        assert r.users_ok and r.med_ok
