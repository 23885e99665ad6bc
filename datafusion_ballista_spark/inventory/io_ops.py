"""Write-path (sinks/DML) and non-parquet scan inventory (SURVEY §2.2).

Reference surface: CSV/JSON/Parquet sink nodes + INSERT INTO / COPY TO /
CTAS (datafusion.proto:834-869, :269-310; client tests
ballista/client/tests/context_checks.rs:448,596,657), CSV scan
(client fixture customer.csv), NDJSON scan (:1151-1154), Arrow IPC scan
(:1159-1162; context_checks.rs:1319), CREATE EXTERNAL TABLE DDL
(:163-180; context_checks.rs:381).

Each round-trip writes with the DISTRIBUTED writer (df.write — one file per
partition, exactly the 100 TB shape), reads the result back through the
matching scan, and aggregates; the oracle runs the same aggregate on the
ORIGINAL parquet, so a lossless round trip is exactly a hash match.
Temp outputs live under /tmp/dbspark_io/<sf-tag>/ and are overwritten
idempotently.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, dsum, tables

_BASE = "/tmp/dbspark_io"


def _out(sf: str, leaf: str) -> str:
    tag = os.path.basename(sf.rstrip("/")) or "sf"
    return os.path.join(_BASE, tag, leaf)


def _orders_slice(spark: SparkSession, sf: str) -> DataFrame:
    return (
        tables(spark, sf, "orders")
        .orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


_ORDERS_AGG_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(D("o_totalprice"), "total"))
        .orderBy("o_orderstatus")
    )


def write_parquet_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """df.write.parquet → read-back (datafusion.proto:866-869 ParquetSink)."""
    path = _out(sf, "orders_parquet")
    _orders_slice(spark, sf).write.mode("overwrite").parquet(path)
    return _agg(spark.read.parquet(path))


def write_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """df.write.csv with header → schema-ful read-back (CsvSink :834-845)."""
    path = _out(sf, "orders_csv")
    _orders_slice(spark, sf).write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    return _agg(spark.read.option("header", True).schema(schema).csv(path))


def write_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """df.write.json → read-back (JsonSink :846-855)."""
    path = _out(sf, "orders_json")
    _orders_slice(spark, sf).write.mode("overwrite").json(path)
    return _agg(spark.read.json(path).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    ))


def ctas_insert_sql(spark: SparkSession, sf: str) -> DataFrame:
    """DDL/DML through the SQL path: CREATE EXTERNAL TABLE (via the dialect
    rewrite) + INSERT INTO + read back (context_checks.rs:381,448,596)."""
    from datafusion_ballista_spark.sql import rewrite_sql

    path = _out(sf, "orders_ctas")
    shutil.rmtree(path, ignore_errors=True)
    tables(spark, sf, "orders").orders.createOrReplaceTempView("io_orders_src")
    spark.sql("DROP TABLE IF EXISTS io_orders_tbl")
    spark.sql(
        rewrite_sql(
            "CREATE EXTERNAL TABLE io_orders_tbl "
            "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
            "o_orderstatus STRING) "
            f"STORED AS PARQUET LOCATION '{path}'"
        )
    )
    spark.sql(
        "INSERT INTO io_orders_tbl "
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus "
        "FROM io_orders_src WHERE o_orderpriority = '1-URGENT'"
    )
    return _agg(spark.table("io_orders_tbl"))


def copy_to_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """COPY (query) TO 'path' STORED AS PARQUET through the SQL path
    (datafusion.proto:269-278 CopyTo; context_checks.rs:657), then read the
    written directory back and aggregate — a lossless sink is a hash match
    against the original table's aggregate."""
    from datafusion_ballista_spark.session import BallistaSession

    path = _out(sf, "orders_copy")
    tables(spark, sf, "orders").orders.createOrReplaceTempView("io_copy_src")
    n = BallistaSession(spark).sql(
        "COPY (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus "
        "FROM io_copy_src WHERE o_orderpriority = '1-URGENT') "
        f"TO '{path}' STORED AS PARQUET"
    )
    assert n.collect()[0]["count"] > 0
    return _agg(spark.read.parquet(path))


def scan_csv(spark: SparkSession, sf: str) -> DataFrame:
    """CSV scan of the full customer table (reference fixture customer.csv)."""
    path = _out(sf, "customer_csv")
    c = tables(spark, sf, "customer").customer
    c.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = spark.read.option("header", True).schema(schema).csv(path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(D("c_acctbal"), "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


SCAN_CSV_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def scan_ndjson(spark: SparkSession, sf: str) -> DataFrame:
    """NDJSON scan (datafusion.proto:1151-1154)."""
    path = _out(sf, "supplier_json")
    s = tables(spark, sf, "supplier").supplier
    s.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return (
        back.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum(D("s_acctbal"), "total_bal"))
        .orderBy("s_nationkey")
    )


SCAN_NDJSON_SQL = """
SELECT s_nationkey, COUNT(*) AS n,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def scan_avro(spark: SparkSession, sf: str) -> DataFrame:
    """Avro OCF scan (datafusion.proto:1155-1158) through the pure-Python
    distributed reader — no spark-avro jar in this container. The fixture
    is produced by the DISTRIBUTED per-partition OCF sink (round-11: the
    previous whole-table collect feeding a driver-side writer was the
    VERDICT-flagged 100x bottleneck); partitions alternate deflate/null
    codecs so the multi-file path and both standard codecs are exercised;
    the aggregate hash-matches the original parquet."""
    from datafusion_ballista_spark.session import BallistaSession
    from datafusion_ballista_spark.sources.avro_ocf import write_avro_ocf_dist

    out_dir = _out(sf, "supplier_avro")
    # the sink appends part files by partition id; clear any prior run's
    # layout (file names changed when the write went distributed) so the
    # globbing reader only ever sees this run's manifest
    shutil.rmtree(out_dir, ignore_errors=True)
    s = tables(spark, sf, "supplier").supplier
    schema = {
        "type": "record",
        "name": "supplier",
        "fields": [
            {"name": "s_suppkey", "type": "long"},
            {"name": "s_name", "type": ["null", "string"]},
            {"name": "s_nationkey", "type": "int"},
            {"name": "s_acctbal", "type": "double"},
        ],
    }
    cols = s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    paths = write_avro_ocf_dist(
        cols.repartition(2, "s_suppkey"),
        schema,
        out_dir,
        codec_by_pid=lambda pid: "deflate" if pid % 2 == 0 else "null",
    )
    if len(paths) != 2:
        # hash partitioning gives no non-empty guarantee at tiny SFs; a
        # one-file fixture would silently drop the multi-file/multi-codec
        # coverage this entry exists for — fall back to round-robin, which
        # does guarantee two non-empty partitions for >=2 rows
        shutil.rmtree(out_dir, ignore_errors=True)
        paths = write_avro_ocf_dist(
            cols.repartition(2),
            schema,
            out_dir,
            codec_by_pid=lambda pid: "deflate" if pid % 2 == 0 else "null",
        )
    assert len(paths) == 2, f"avro fixture degenerated to {paths}"
    back = BallistaSession(spark).read_avro(out_dir)
    return (
        back.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum(D("s_acctbal"), "total_bal"))
        .orderBy("s_nationkey")
    )


def scan_arrow_ipc(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow IPC scan through the distributed mapInPandas reader
    (context_checks.rs:1319; sources/arrow_ipc.py)."""
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    from datafusion_ballista_spark.sources.arrow_ipc import read_arrow_ipc_dist

    out_dir = _out(sf, "nation_arrow")
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(sf, "nation.parquet"))
    # two files to exercise the multi-file distributed path
    mid = tbl.num_rows // 2
    for i, piece in enumerate((tbl.slice(0, mid), tbl.slice(mid))):
        with ipc.new_file(os.path.join(out_dir, f"part{i}.arrow"), tbl.schema) as w:
            w.write_table(piece)
    back = read_arrow_ipc_dist(spark, sorted(glob.glob(f"{out_dir}/*.arrow")))
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("n_regionkey")
    )


SCAN_ARROW_SQL = """
SELECT n_regionkey, COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


def write_arrow_ipc_dist_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Arrow IPC sink roundtrip: every partition streams its
    own IPC file via mapInArrow (sources/arrow_ipc.py:write_arrow_ipc_dist
    — no driver materialization), then the distributed reader aggregates
    them back. Proves the bulk write path, not just the small-result
    sink."""
    from datafusion_ballista_spark.sources.arrow_ipc import (
        read_arrow_ipc_dist,
        write_arrow_ipc_dist,
    )

    out_dir = _out(sf, "supplier_arrow_dist")
    src = tables(spark, sf, "supplier").supplier.select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    ).repartition(4, "s_suppkey")
    paths = write_arrow_ipc_dist(src, out_dir)
    back = read_arrow_ipc_dist(spark, paths)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


WRITE_ARROW_DIST_SQL = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def url_table_sql(spark: SparkSession, sf: str) -> DataFrame:
    """URL table: query a file path directly (context_checks.rs:561) —
    Spark's ``parquet.`path``` form."""
    return spark.sql(
        f"SELECT r_name, COUNT(*) AS n FROM parquet.`{sf}/region.parquet` "
        "GROUP BY r_name ORDER BY r_name"
    )


URL_TABLE_SQL = """
SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name ORDER BY r_name
"""


def scan_partitioned_listing(spark: SparkSession, sf: str) -> DataFrame:
    """Listing table with hive-style partition discovery + partition pruning
    (SURVEY §2.2 row 7; reference ListingTable). Writes lineitem partitioned
    by ship year, reads the *directory* back, and filters on the partition
    column — the filter prunes whole directories at file-listing time, the
    exact mechanism that makes a 100 TB date-partitioned lake scannable.
    tests/test_sources.py asserts PartitionFilters appears in the plan."""
    path = _out(sf, "lineitem_by_year")
    li = tables(spark, sf, "lineitem").lineitem
    (
        li.withColumn("l_year", F.year("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("l_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)  # partition discovery from dir layout
    return (
        back.where(F.col("l_year") == 1997)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum(D("l_extendedprice"), "total"))
        .orderBy("l_returnflag")
    )


SCAN_PARTITIONED_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def bucketed_colocated_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed tables + shuffle-free co-located join: both sides are
    written ``bucketBy(8, custkey)`` so the join reads matching buckets
    directly — the exact mechanism that makes a repeated 100 TB fact-fact
    join affordable (pay the shuffle once at write time, never per query).
    tests/test_sources.py asserts the join plan contains NO shuffle
    exchange. The merge hint pins SMJ so AQE's broadcast promotion (valid
    but shuffle-free anyway) doesn't mask the bucketing proof."""
    t = tables(spark, sf, "orders", "customer")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a stale location from a previous session's run survives DROP
        # (this session's catalog never knew the table); clear it
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    (
        t.orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        t.customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
    )
    return (
        spark.table("b_orders")
        .hint("merge")
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(D("o_totalprice"), "total"),
        )
        .orderBy("c_mktsegment")
    )


BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def inmem_table_join(spark: SparkSession, sf: str) -> DataFrame:
    """In-memory table (SURVEY §2.2 row 6; reference MemTable /
    register_record_batches): literal rows created driver-side, joined to a
    parquet fact table. A few-row in-memory dim is the one side that is
    ALWAYS broadcast-safe at any scale."""
    weights = spark.createDataFrame(
        [("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3), ("4-NOT SPECIFIED", 2), ("5-LOW", 1)],
        ["prio", "weight"],
    )
    o = tables(spark, sf, "orders").orders
    return (
        o.join(F.broadcast(weights), o.o_orderpriority == weights.prio)
        .groupBy("prio")
        .agg((F.count(F.lit(1)) * F.min("weight")).alias("weighted_n"))
        .orderBy("prio")
    )


INMEM_TABLE_SQL = """
SELECT prio, COUNT(*) * MIN(weight) AS weighted_n
FROM orders
JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
             ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(prio, weight)
  ON o_orderpriority = prio
GROUP BY prio ORDER BY prio
"""


QUERIES: dict[str, QuerySpec] = {
    "write_parquet_roundtrip": QuerySpec(write_parquet_roundtrip, _ORDERS_AGG_SQL),
    "write_csv_roundtrip": QuerySpec(write_csv_roundtrip, _ORDERS_AGG_SQL),
    "write_json_roundtrip": QuerySpec(write_json_roundtrip, _ORDERS_AGG_SQL),
    "ctas_insert_sql": QuerySpec(ctas_insert_sql, _ORDERS_AGG_SQL),
    "copy_to_roundtrip": QuerySpec(copy_to_roundtrip, _ORDERS_AGG_SQL),
    "scan_csv": QuerySpec(scan_csv, SCAN_CSV_SQL),
    "scan_ndjson": QuerySpec(scan_ndjson, SCAN_NDJSON_SQL),
    "scan_avro": QuerySpec(scan_avro, SCAN_NDJSON_SQL),
    "scan_arrow_ipc": QuerySpec(scan_arrow_ipc, SCAN_ARROW_SQL),
    "url_table_sql": QuerySpec(url_table_sql, URL_TABLE_SQL),
    "scan_partitioned_listing": QuerySpec(
        scan_partitioned_listing, SCAN_PARTITIONED_SQL
    ),
    "inmem_table_join": QuerySpec(inmem_table_join, INMEM_TABLE_SQL),
    "bucketed_colocated_join": QuerySpec(
        bucketed_colocated_join, BUCKETED_JOIN_SQL
    ),
    "write_arrow_ipc_dist_roundtrip": QuerySpec(
        write_arrow_ipc_dist_roundtrip, WRITE_ARROW_DIST_SQL
    ),
}
