"""TPC-DS-shape mini-suite, tranche 10 (q6/q8/q19/q24/q83) — final
named-family sweep (inventory/tpcds9.py precedes).

- q6: dim-attribute-vs-category-average gate — parts priced 20% above
  their type's average price, then order counts per nation through the
  gated part set;
- q8: INTERSECT of two differently-derived dim sets (literal nation
  bucket ∩ nations with enough high-balance customers) feeding the
  revenue aggregate;
- q19: brand revenue panel restricted to cross-nation purchases
  (supplier nation <> customer nation residual);
- q24: per-(customer, part) revenue spine kept only where it exceeds a
  multiple of the spine's scalar average (1-row broadcast threshold);
- q83: three channel returned-quantity spines joined on part with
  share-of-total ratio outputs.

All spines are partial/final hash aggregates; thresholds are scalar
broadcasts or decimal cross-multiplications; set ops hash on their key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, tables

_STORE, _WEB, _CATALOG = 0, 1, 2


def _chan(k: int):
    return F.col("l_linenumber") % 3 == k


def _chan_sql(k: int) -> str:
    return f"l_linenumber % 3 = {k}"


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))"


def _rev():
    return D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)


def tpcds_q6_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q6: parts priced at least 20% above their type's average
    retail price (dim-side aggregate threshold, cross-multiplied in
    decimal: price*10 >= avg*12 via price*10*cnt >= sum*12), then 1995
    order counts per customer nation through that part set."""
    t = tables(spark, sf, "lineitem", "orders", "customer", "nation", "part")
    stats = t.part.groupBy(F.col("p_type").alias("t2")).agg(
        F.sum(D("p_retailprice")).alias("price_sum"),
        F.count(F.lit(1)).alias("price_cnt"),
    )
    pricey = (
        t.part.join(stats, F.col("p_type") == F.col("t2"))
        .where(
            D("p_retailprice") * 10 * F.col("price_cnt")
            >= F.col("price_sum") * 12
        )
        .select("p_partkey")
    )
    return (
        t.lineitem.join(pricey, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 10)
        .orderBy("cnt", "n_name")
        .limit(100)
    )


TPCDS_Q6_SQL = """
WITH stats AS (
  SELECT p_type AS t2, SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS price_sum,
         COUNT(*) AS price_cnt
  FROM part GROUP BY p_type),
pricey AS (
  SELECT p_partkey FROM part JOIN stats ON p_type = t2
  WHERE CAST(p_retailprice AS DECIMAL(18,2)) * 10 * price_cnt
        >= price_sum * 12)
SELECT n_name, COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_partkey IN (SELECT p_partkey FROM pricey)
  AND year(o_orderdate) = 1995
GROUP BY n_name
HAVING COUNT(*) >= 10
ORDER BY cnt, n_name
LIMIT 100
"""


def tpcds_q8_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q8: revenue restricted to the INTERSECT of two differently-
    derived dim sets — a literal nation-key bucket and nations holding
    more than 20 high-balance customers (the zip-list ∩ preferred-
    customer-zips shape)."""
    t = tables(spark, sf, "orders", "customer", "nation")
    bucket = t.nation.where(F.col("n_nationkey") % 3 == 1).select("n_nationkey")
    rich = (
        t.customer.where(F.col("c_acctbal") > 7000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich"))
        .where(F.col("n_rich") > 20)
        .select(F.col("nk").alias("n_nationkey"))
    )
    qual = bucket.intersect(rich)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(qual, F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.year("o_orderdate") == 1995)
        .groupBy("n_name")
        .agg(F.sum(D("o_totalprice")).cast("double").alias("net_profit"))
        .orderBy("n_name")
    )


TPCDS_Q8_SQL = """
WITH qual AS (
  SELECT n_nationkey FROM nation WHERE n_nationkey % 3 = 1
  INTERSECT
  SELECT c_nationkey FROM customer WHERE c_acctbal > 7000
  GROUP BY c_nationkey HAVING COUNT(*) > 20)
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS net_profit
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE c_nationkey IN (SELECT n_nationkey FROM qual)
  AND year(o_orderdate) = 1995
GROUP BY n_name
ORDER BY n_name
"""


def tpcds_q19_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q19: brand revenue panel over cross-nation purchases only
    (supplier nation <> buyer nation — the store-zip vs customer-zip
    inequality), with a part-size band filter."""
    t = tables(
        spark, sf, "lineitem", "orders", "customer", "supplier", "nation", "part"
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_size").between(1, 15))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("cnk"))
        .where(F.col("n_name") != F.col("cust_nation"))
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.sum(_rev()).cast("double").alias("ext_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


TPCDS_Q19_SQL = f"""
SELECT p_brand, CAST(SUM({_REV_SQL}) AS DOUBLE) AS ext_price,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE year(o_orderdate) = 1995 AND p_size BETWEEN 1 AND 15
  AND sn.n_name <> cn.n_name
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
"""


def tpcds_q24_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q24: per-(customer, part) revenue spine kept where it exceeds
    3x the spine-wide average — the HAVING-above-scalar-average gate as
    a 1-row broadcast threshold (decimal cross-multiplied)."""
    t = tables(spark, sf, "lineitem", "orders")
    spine = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum(_rev()).alias("paid"))
    )
    avg_row = spine.agg(
        F.sum("paid").alias("paid_sum"), F.count(F.lit(1)).alias("paid_cnt")
    )
    return (
        spine.crossJoin(F.broadcast(avg_row))
        .where(F.col("paid") * F.col("paid_cnt") > F.col("paid_sum") * 3)
        .select(
            "o_custkey", "l_partkey", F.col("paid").cast("double").alias("paid")
        )
        .orderBy("o_custkey", "l_partkey")
        .limit(100)
    )


TPCDS_Q24_SQL = f"""
WITH spine AS (
  SELECT o_custkey, l_partkey, SUM({_REV_SQL}) AS paid
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
thr AS (SELECT SUM(paid) AS paid_sum, COUNT(*) AS paid_cnt FROM spine)
SELECT o_custkey, l_partkey, CAST(paid AS DOUBLE) AS paid
FROM spine, thr
WHERE paid * paid_cnt > paid_sum * 3
ORDER BY o_custkey, l_partkey
LIMIT 100
"""


def tpcds_q83_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q83: the three channel returned-quantity spines joined on part
    with each channel's share of the combined total (ratio outputs in
    DOUBLE, totals exact bigint)."""
    t = tables(spark, sf, "lineitem")
    r = t.lineitem.where(F.col("l_returnflag") == "R")

    def spine(k: int, tag: str) -> DataFrame:
        return (
            r.where(_chan(k))
            .groupBy(F.col("l_partkey").alias(f"pk_{tag}"))
            .agg(F.sum("l_quantity").cast("bigint").alias(tag))
        )

    s, w, c = spine(_STORE, "sr"), spine(_WEB, "wr"), spine(_CATALOG, "cr")
    j = (
        s.join(w, F.col("pk_sr") == F.col("pk_wr"))
        .join(c, F.col("pk_sr") == F.col("pk_cr"))
        .withColumn("total", F.col("sr") + F.col("wr") + F.col("cr"))
    )
    return (
        j.select(
            F.col("pk_sr").alias("l_partkey"),
            "sr", "wr", "cr", "total",
            F.round(F.col("sr").cast("double") / F.col("total"), 6).alias(
                "store_share"
            ),
            F.round(F.col("wr").cast("double") / F.col("total"), 6).alias(
                "web_share"
            ),
            F.round(F.col("cr").cast("double") / F.col("total"), 6).alias(
                "catalog_share"
            ),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


def _q83_spine_sql(k: int, tag: str) -> str:
    return (
        f"{tag} AS (SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT)"
        f" AS {tag}_v FROM lineitem"
        f" WHERE l_returnflag = 'R' AND {_chan_sql(k)} GROUP BY l_partkey)"
    )


TPCDS_Q83_SQL = (
    "WITH "
    + ", ".join(
        _q83_spine_sql(k, t)
        for k, t in [(_STORE, "sr"), (_WEB, "wr"), (_CATALOG, "cr")]
    )
    + """
SELECT sr.l_partkey, sr_v AS sr, wr_v AS wr, cr_v AS cr,
       sr_v + wr_v + cr_v AS total,
       ROUND(CAST(sr_v AS DOUBLE) / (sr_v + wr_v + cr_v), 6)
         AS store_share,
       ROUND(CAST(wr_v AS DOUBLE) / (sr_v + wr_v + cr_v), 6)
         AS web_share,
       ROUND(CAST(cr_v AS DOUBLE) / (sr_v + wr_v + cr_v), 6)
         AS catalog_share
FROM sr JOIN wr ON sr.l_partkey = wr.l_partkey
JOIN cr ON sr.l_partkey = cr.l_partkey
ORDER BY sr.l_partkey
LIMIT 100
"""
)


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q6_shape": QuerySpec(tpcds_q6_shape, TPCDS_Q6_SQL),
    "tpcds_q8_shape": QuerySpec(tpcds_q8_shape, TPCDS_Q8_SQL),
    "tpcds_q19_shape": QuerySpec(tpcds_q19_shape, TPCDS_Q19_SQL),
    "tpcds_q24_shape": QuerySpec(tpcds_q24_shape, TPCDS_Q24_SQL),
    "tpcds_q83_shape": QuerySpec(tpcds_q83_shape, TPCDS_Q83_SQL),
}
