"""Pure-Python Avro OCF reader/writer (sources/avro_ocf.py).

Behavior spec: the Avro 1.x specification (container format + binary
encoding); reference scan surface datafusion.proto:1155-1158.
"""

from __future__ import annotations

import pytest

from datafusion_ballista_spark.sources.avro_ocf import (
    read_avro_ocf,
    write_avro_ocf,
)

_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
    ],
}

_ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True},
    {"id": 2, "name": None, "score": -2.25, "ok": False},
    {"id": 3, "name": "γunicode", "score": 0.0, "ok": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(spark, tmp_path, codec):
    p = str(tmp_path / "t.avro")
    write_avro_ocf(_ROWS, _SCHEMA, p, codec=codec)
    df = read_avro_ocf(spark, p)
    got = sorted((r.id, r.name, r.score, r.ok) for r in df.collect())
    want = sorted((r["id"], r["name"], r["score"], r["ok"]) for r in _ROWS)
    assert got == want
    assert dict(df.dtypes) == {
        "id": "bigint", "name": "string", "score": "double", "ok": "boolean"
    }


def test_multi_file_directory(spark, tmp_path):
    write_avro_ocf(_ROWS[:2], _SCHEMA, str(tmp_path / "a.avro"))
    write_avro_ocf(_ROWS[2:], _SCHEMA, str(tmp_path / "b.avro"), codec="deflate")
    df = read_avro_ocf(spark, str(tmp_path))
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 2  # one task per file


def test_bad_magic_rejected(spark, tmp_path):
    p = tmp_path / "junk.avro"
    p.write_bytes(b"PAR1not-avro")
    with pytest.raises(Exception, match="bad magic"):
        read_avro_ocf(spark, str(p))


def test_unsupported_schema_rejected(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "xs", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(ValueError, match="unsupported"):
        write_avro_ocf([{"xs": [1]}], schema, str(tmp_path / "x.avro"))


def test_session_read_avro_fallback(spark, tmp_path):
    from datafusion_ballista_spark.session import BallistaSession

    p = str(tmp_path / "s.avro")
    write_avro_ocf(_ROWS, _SCHEMA, p, codec="deflate")
    df = BallistaSession(spark).read_avro(p)
    assert df.count() == 3


def test_registered_datasource(spark, tmp_path):
    """Spark 4 Python DataSource registration: avro_ocf becomes a normal
    format() source (the reference's custom-TableProvider surface)."""
    from datafusion_ballista_spark.sources.avro_datasource import register

    register(spark)
    write_avro_ocf(_ROWS[:2], _SCHEMA, str(tmp_path / "a.avro"))
    write_avro_ocf(_ROWS[2:], _SCHEMA, str(tmp_path / "b.avro"), codec="deflate")
    df = spark.read.format("avro_ocf").load(str(tmp_path))
    got = sorted((r.id, r.name, r.score, r.ok) for r in df.collect())
    want = sorted((r["id"], r["name"], r["score"], r["ok"]) for r in _ROWS)
    assert got == want
    assert df.rdd.getNumPartitions() == 2  # one task per file


def test_distributed_sink_one_file_per_partition(spark, tmp_path):
    """write_avro_ocf_dist (round-11): every partition writes its own
    OCF file executor-side — the scan_avro fixture path must never
    collect the table to the driver. Pins: one file per non-empty
    partition, codec_by_pid honored per file, lossless round-trip, and
    empty partitions leave no file behind."""
    import os

    from datafusion_ballista_spark.sources.avro_ocf import (
        _read_header,
        write_avro_ocf_dist,
    )

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 2, i % 2 == 0) for i in range(30)],
        "id long, name string, score double, ok boolean",
    ).repartition(3, "id")
    out = str(tmp_path / "dist_avro")
    paths = write_avro_ocf_dist(
        df, _SCHEMA, out,
        codec_by_pid=lambda pid: "deflate" if pid % 2 == 0 else "null",
    )
    assert len(paths) == 3
    assert sorted(os.listdir(out)) == [os.path.basename(p) for p in paths]
    codecs = []
    for p in paths:
        with open(p, "rb") as f:
            import io as _io

            _, codec, _ = _read_header(_io.BytesIO(f.read()))
            codecs.append(codec)
    assert set(codecs) == {"deflate", "null"}
    back = read_avro_ocf(spark, out)
    got = sorted((r.id, r.name, r.score, r.ok) for r in back.collect())
    want = sorted((i, f"n{i}", float(i) / 2, i % 2 == 0) for i in range(30))
    assert got == want
    # an empty DataFrame writes nothing
    out2 = str(tmp_path / "dist_avro_empty")
    assert write_avro_ocf_dist(df.where("id < 0").repartition(2), _SCHEMA, out2) == []
    assert os.listdir(out2) == []


def test_distributed_sink_nullable_numeric_nulls(spark, tmp_path):
    """SQL NULLs in nullable long/double columns survive the distributed
    sink. pandas hands mapInPandas NaN (not None) for missing numerics;
    the writer must normalize them back to the Avro null branch — before
    the round-12 fix a nullable long with a NULL crashed (int(nan)) and a
    nullable double silently round-tripped as NaN instead of NULL."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "x", "type": ["null", "double"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    df = spark.createDataFrame(
        [(1, 10, 1.5, "a"), (2, None, None, None), (3, 30, None, "c")],
        "id long, n long, x double, s string",
    ).repartition(2)
    out = str(tmp_path / "nulls_avro")
    from datafusion_ballista_spark.sources.avro_ocf import write_avro_ocf_dist

    paths = write_avro_ocf_dist(df, schema, out, codec="deflate")
    assert paths
    back = read_avro_ocf(spark, out)
    got = sorted((r.id, r.n, r.x, r.s) for r in back.collect())
    assert got == [(1, 10, 1.5, "a"), (2, None, None, None), (3, 30, None, "c")]
