"""TPC-DS-shape mini-suite, tranche 2 (q23/q39/q49/q64/q72/q75/q78/q93/
q95/q97) — continues inventory/tpcds.py toward the reference's 99-query
CI gate (/root/reference/benchmarks/queries-tpcds/, tpcds.yml:55-74).

As in tranche 1, each entry reproduces the *operator shape* of the named
TPC-DS query on the fixture star schema (lineitem = sales fact with
l_returnflag as the returns channel, l_shipmode as the sales channel,
orders = customer/date side, part/supplier/nation/region = dims):

- q23: three stacked CTEs (HAVING count, scalar MAX subquery, 95%-of-max
  HAVING) feeding a two-channel UNION ALL double-semi-join reduction;
- q39: per-month mean/stddev stats self-joined month->month+1;
- q49: per-channel return-ratio ranking, top-N per channel UNION'd;
- q64: multi-year repeated join — same aggregate spine self-joined
  year->year+1 with a count guard;
- q72: wide 6-dim join chain + LEFT OUTER promotion + non-equi residual;
- q75: channel-union yearly per-part sales minus returns, prev/curr year
  join with an exact 0.9 shrink predicate;
- q78: per-channel returns-anti-join aggregates, store channel LEFT
  JOINed to web/catalog with COALESCE ratios;
- q93: returns-adjusted sales (LEFT JOIN + conditional arithmetic) per
  customer, decimal-ordered top-100;
- q95: double semi-join on a multi-supplier order spine + returned-order
  spine, COUNT(DISTINCT) reduction;
- q97: two-channel distinct (customer, part) spines FULL OUTER joined
  into both/only-left/only-right counts.

Scale notes (100 TB): every CTE spine is a partial/final hash aggregate
on its grouping key; semi/anti membership probes shuffle on the key and
AQE promotes the small side to broadcast (no forced broadcast on
unbounded sides); the only self-joins are on aggregated spines (years x
parts / orders), orders of magnitude smaller than the fact table; no
query collects or loops driver-side.

Determinism contract (inventory/__init__): decimal sums, identical
aliases both sides, CAST(SUM(int) AS BIGINT) on the DuckDB side (HUGEINT
pin), ROUND on genuine double math, unique sort tiebreakers + LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import D, davg, tables

# Channel split — the fixture analogue of TPC-DS's store/web/catalog fact
# tables. The regenerated lineitem fixture carries no shipmode column, so
# the channel key is the deterministic l_linenumber % 3.
_STORE, _WEB, _CATALOG = 0, 1, 2


def _chan(k: int):
    return F.col("l_linenumber") % 3 == k


def _chan_sql(k: int) -> str:
    return f"l_linenumber % 3 = {k}"


# --------------------------------------------------------------------------
# q23 shape: frequent-items CTE (HAVING), max-sales scalar CTE, best-customer
# CTE (threshold-of-max HAVING), two-channel UNION ALL double semi-join.
# reference: benchmarks/queries-tpcds/q23.sql
# --------------------------------------------------------------------------
def tpcds_q23_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q23's cross-channel promotional-sales reduction: parts sold
    often (HAVING COUNT > 35), customers spending above 50% of the max
    customer spend (scalar-subquery threshold), then revenue from two
    channels restricted to both sets via semi-joins and UNION ALL'd into
    one row. The max-spend threshold is a genuine 1-row broadcast; both
    membership probes are key-shuffled semi-joins."""
    t = tables(spark, sf, "lineitem", "orders")
    li, o = t.lineitem, t.orders
    freq = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 35)
        .select("l_partkey")
    )
    sale = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    per_cust = sale.groupBy("o_custkey").agg(
        F.sum(D("l_extendedprice")).alias("csales")
    )
    mx = per_cust.agg(F.max("csales").alias("cmax"))
    best = (
        per_cust.crossJoin(F.broadcast(mx))
        .where(F.col("csales") * 2 > F.col("cmax"))
        .select("o_custkey")
    )

    def channel(modes: int) -> DataFrame:
        return (
            sale.where(
                _chan(modes) & (F.year("o_orderdate") == 1995)
            )
            .join(freq, "l_partkey", "left_semi")
            .join(best, "o_custkey", "left_semi")
            .select(
                D(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    27,
                    4,
                ).alias("sales")
            )
        )

    u = channel(_WEB).unionAll(channel(_CATALOG))
    return u.agg(
        F.sum("sales").cast("double").alias("total_sales"),
        F.count(F.lit(1)).alias("n_rows"),
    )


TPCDS_Q23_SQL = f"""
WITH freq AS (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 35),
sale AS (
  SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice, l_discount,
         o_custkey, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
per_cust AS (
  SELECT o_custkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS csales
  FROM sale GROUP BY o_custkey),
best AS (
  SELECT o_custkey FROM per_cust
  WHERE csales * 2 > (SELECT MAX(csales) FROM per_cust)),
u AS (
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS sales
  FROM sale
  WHERE {_chan_sql(_WEB)} AND year(o_orderdate) = 1995
    AND l_partkey IN (SELECT l_partkey FROM freq)
    AND o_custkey IN (SELECT o_custkey FROM best)
  UNION ALL
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS sales
  FROM sale
  WHERE {_chan_sql(_CATALOG)} AND year(o_orderdate) = 1995
    AND l_partkey IN (SELECT l_partkey FROM freq)
    AND o_custkey IN (SELECT o_custkey FROM best))
SELECT CAST(SUM(sales) AS DOUBLE) AS total_sales, COUNT(*) AS n_rows FROM u
"""


# --------------------------------------------------------------------------
# q39 shape: per-month quantity mean/stddev per (supplier, part), adjacent
# months self-joined. reference: benchmarks/queries-tpcds/q39.sql
# --------------------------------------------------------------------------
def tpcds_q39_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q39's inventory-variance pairing: per (suppkey, partkey, month)
    quantity mean and sample stddev over 1995 shipments, then month-1
    stats joined to month-2 stats for pairs with >= 3 observations in
    both — the stats spine is tiny relative to the fact, so the self-join
    is aggregate-to-aggregate."""
    t = tables(spark, sf, "lineitem")
    li = t.lineitem.where(F.year("l_shipdate") == 1995)
    stats = (
        li.groupBy(
            "l_suppkey", "l_partkey", F.month("l_shipdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            davg(D("l_quantity"), "qmean"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qstd"),
        )
        .where(F.col("cnt") >= 3)
    )
    m1 = stats.where(F.col("m") == 1).select(
        "l_suppkey",
        "l_partkey",
        F.col("qmean").alias("mean1"),
        F.col("qstd").alias("std1"),
    )
    m2 = stats.where(F.col("m") == 2).select(
        F.col("l_suppkey").alias("s2"),
        F.col("l_partkey").alias("p2"),
        F.col("qmean").alias("mean2"),
        F.col("qstd").alias("std2"),
    )
    return (
        m1.join(
            m2,
            (F.col("l_suppkey") == F.col("s2"))
            & (F.col("l_partkey") == F.col("p2")),
        )
        .select("l_suppkey", "l_partkey", "mean1", "std1", "mean2", "std2")
        .orderBy("l_suppkey", "l_partkey")
        .limit(100)
    )


TPCDS_Q39_SQL = """
WITH stats AS (
  SELECT l_suppkey, l_partkey, month(l_shipdate) AS m, COUNT(*) AS cnt,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS qmean,
         ROUND(STDDEV_SAMP(l_quantity), 6) AS qstd
  FROM lineitem WHERE year(l_shipdate) = 1995
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3)
SELECT m1.l_suppkey, m1.l_partkey,
       m1.qmean AS mean1, m1.qstd AS std1,
       m2.qmean AS mean2, m2.qstd AS std2
FROM stats m1 JOIN stats m2
  ON m1.l_suppkey = m2.l_suppkey AND m1.l_partkey = m2.l_partkey
WHERE m1.m = 1 AND m2.m = 2
ORDER BY m1.l_suppkey, m1.l_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q49 shape: per-channel worst-return-ratio top-N, ranked and UNION'd.
# reference: benchmarks/queries-tpcds/q49.sql
# --------------------------------------------------------------------------
def tpcds_q49_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q49's worst-returns report: per channel and part, the returned
    vs shipped quantity ratio, ranked inside each channel (partitioned
    window — never a global sort) with a unique part tiebreak; the
    channel top-10s are UNION'd. Ratios order on exact integer-derived
    doubles, so ranks agree across engines."""
    t = tables(spark, sf, "lineitem", "orders")
    li, o = t.lineitem, t.orders
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.year("o_orderdate") == 1995
    )

    def channel(name: str, modes: int) -> DataFrame:
        per_part = (
            base.where(_chan(modes))
            .groupBy("l_partkey")
            .agg(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R", F.col("l_quantity")
                    ).otherwise(0.0)
                )
                .cast("bigint")
                .alias("ret_qty"),
                F.sum("l_quantity").cast("bigint").alias("qty"),
            )
            .where(F.col("qty") > 0)
        )
        w = Window.partitionBy(F.lit(name)).orderBy(
            F.desc(F.col("ret_qty").cast("double") / F.col("qty")),
            F.asc("l_partkey"),
        )
        return per_part.select(
            F.lit(name).alias("channel"),
            "l_partkey",
            F.round(F.col("ret_qty").cast("double") / F.col("qty"), 6).alias(
                "ratio"
            ),
            F.row_number().over(w).alias("rnk"),
        ).where(F.col("rnk") <= 10)

    return (
        channel("store", _STORE)
        .unionAll(channel("web", _WEB))
        .unionAll(channel("catalog", _CATALOG))
        .orderBy("channel", "rnk")
    )


def _q49_channel_sql(name: str, modes: int) -> str:
    return f"""
  SELECT '{name}' AS channel, l_partkey,
         ROUND(CAST(ret_qty AS DOUBLE) / qty, 6) AS ratio,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ret_qty AS DOUBLE) / qty DESC, l_partkey) AS rnk
  FROM (
    SELECT l_partkey,
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
           AS BIGINT) AS ret_qty,
      CAST(SUM(l_quantity) AS BIGINT) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(o_orderdate) = 1995 AND {_chan_sql(modes)}
    GROUP BY l_partkey HAVING SUM(l_quantity) > 0) t
  QUALIFY rnk <= 10"""


TPCDS_Q49_SQL = (
    "SELECT * FROM ("
    + _q49_channel_sql("store", _STORE)
    + "\n  UNION ALL\n"
    + _q49_channel_sql("web", _WEB)
    + "\n  UNION ALL\n"
    + _q49_channel_sql("catalog", _CATALOG)
    + "\n) u ORDER BY channel, rnk"
)


# --------------------------------------------------------------------------
# q64 shape: one aggregate spine consumed twice, year y joined to year y+1.
# reference: benchmarks/queries-tpcds/q64.sql (cross_sales self-join)
# --------------------------------------------------------------------------
def tpcds_q64_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q64's repeated-join signature: the per-(part, year) sales spine
    (count, wholesale-ish sum, list-ish sum) is built once and self-joined
    1995->1996 keeping pairs where the later year sold at least as often —
    aggregate-to-aggregate join, never fact-to-fact."""
    t = tables(spark, sf, "lineitem", "orders", "part")
    li, o = t.lineitem, t.orders
    spine = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey", F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(D("l_extendedprice")).alias("s1"),
            F.sum(D(F.col("l_extendedprice") * (1 - F.col("l_discount")), 27, 4)).alias(
                "s2"
            ),
        )
    )
    a = spine.where(F.col("y") == 1995)
    b = spine.where(F.col("y") == 1996).select(
        F.col("l_partkey").alias("pk2"),
        F.col("cnt").alias("cnt2"),
        F.col("s1").alias("s1_2"),
        F.col("s2").alias("s2_2"),
    )
    return (
        a.join(b, (F.col("l_partkey") == F.col("pk2")) & (F.col("cnt2") >= F.col("cnt")))
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_name",
            "l_partkey",
            "cnt",
            F.col("cnt2").alias("cnt_next"),
            F.col("s1").cast("double").alias("sale_1995"),
            F.col("s1_2").cast("double").alias("sale_1996"),
            F.col("s2").cast("double").alias("net_1995"),
            F.col("s2_2").cast("double").alias("net_1996"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


TPCDS_Q64_SQL = """
WITH spine AS (
  SELECT l_partkey, year(o_orderdate) AS y, COUNT(*) AS cnt,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s1,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS s2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2)
SELECT p_name, a.l_partkey, a.cnt, b.cnt AS cnt_next,
       CAST(a.s1 AS DOUBLE) AS sale_1995, CAST(b.s1 AS DOUBLE) AS sale_1996,
       CAST(a.s2 AS DOUBLE) AS net_1995, CAST(b.s2 AS DOUBLE) AS net_1996
FROM spine a
JOIN spine b ON a.l_partkey = b.l_partkey AND b.cnt >= a.cnt
JOIN part ON a.l_partkey = p_partkey
WHERE a.y = 1995 AND b.y = 1996
ORDER BY a.l_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q72 shape: wide dim join chain + LEFT OUTER promotion + non-equi residual.
# reference: benchmarks/queries-tpcds/q72.sql
# --------------------------------------------------------------------------
def tpcds_q72_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q72's join pipeline: fact -> orders -> part -> supplier ->
    nation -> region (5 dim hops), LEFT OUTER to a derived promotion dim,
    a non-equi residual (quantity above part size, ds's
    inv_quantity_on_hand < cs_quantity), then promo/no-promo conditional
    counts. Dims are bounded (AQE broadcasts them); the fact is joined
    once and never re-shuffled between dim hops."""
    t = tables(spark, sf, "lineitem", "orders", "part", "supplier", "nation", "region")
    promo = t.part.where(F.col("p_size") <= 5).select(
        F.col("p_partkey").alias("promo_pk")
    )
    j = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.year("o_orderdate") == 1995)
        .join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.region, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("l_quantity") > F.col("p_size"))
        .join(promo, F.col("l_partkey") == F.col("promo_pk"), "left")
    )
    return (
        j.groupBy("r_name", "p_brand")
        .agg(
            F.sum(F.when(F.col("promo_pk").isNull(), 1).otherwise(0)).alias(
                "no_promo"
            ),
            F.sum(F.when(F.col("promo_pk").isNotNull(), 1).otherwise(0)).alias(
                "promo"
            ),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(F.desc("total_cnt"), "r_name", "p_brand")
        .limit(100)
    )


TPCDS_Q72_SQL = """
SELECT r_name, p_brand,
  CAST(SUM(CASE WHEN promo_pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS no_promo,
  CAST(SUM(CASE WHEN promo_pk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS promo,
  COUNT(*) AS total_cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN (SELECT p_partkey AS promo_pk FROM part WHERE p_size <= 5) pr
  ON l_partkey = promo_pk
WHERE year(o_orderdate) = 1995 AND l_quantity > p_size
GROUP BY r_name, p_brand
ORDER BY total_cnt DESC, r_name, p_brand
LIMIT 100
"""


# --------------------------------------------------------------------------
# q75 shape: channel-union yearly sales-minus-returns, prev/curr year join
# with an exact shrink predicate. reference: benchmarks/queries-tpcds/q75.sql
# --------------------------------------------------------------------------
def tpcds_q75_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q75's year-over-year decline report: per-channel per-(year,
    part) net quantity (sold minus returned) UNION ALL'd and re-grouped,
    then 1995 joined to 1996 keeping parts whose sales shrank below 90%
    — the predicate is integer math (curr*10 < prev*9), no float
    boundary."""
    t = tables(spark, sf, "lineitem", "orders")
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    )

    def channel(modes: int) -> DataFrame:
        return (
            base.where(_chan(modes))
            .groupBy(F.year("o_orderdate").alias("y"), "l_partkey")
            .agg(
                F.sum(
                    F.when(F.col("l_returnflag") != "R", F.col("l_quantity"))
                    .otherwise(-F.col("l_quantity"))
                )
                .cast("bigint")
                .alias("net_qty")
            )
        )

    u = (
        channel(_STORE)
        .unionAll(channel(_WEB))
        .unionAll(channel(_CATALOG))
        .groupBy("y", "l_partkey")
        .agg(F.sum("net_qty").alias("net_qty"))
    )
    prev = u.where(F.col("y") == 1995).select(
        "l_partkey", F.col("net_qty").alias("prev_qty")
    )
    curr = u.where(F.col("y") == 1996).select(
        F.col("l_partkey").alias("pk2"), F.col("net_qty").alias("curr_qty")
    )
    return (
        prev.join(curr, F.col("l_partkey") == F.col("pk2"))
        .where(
            (F.col("prev_qty") > 0)
            & (F.col("curr_qty") * 10 < F.col("prev_qty") * 9)
        )
        .select(
            "l_partkey",
            "prev_qty",
            "curr_qty",
            (F.col("curr_qty") - F.col("prev_qty")).alias("qty_diff"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


def _q75_channel_sql(modes: int) -> str:
    return f"""
  SELECT year(o_orderdate) AS y, l_partkey,
    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN l_quantity
             ELSE -l_quantity END) AS BIGINT) AS net_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE {_chan_sql(modes)}
  GROUP BY 1, 2"""


TPCDS_Q75_SQL = (
    "WITH u AS (SELECT y, l_partkey, CAST(SUM(net_qty) AS BIGINT) AS net_qty"
    " FROM ("
    + _q75_channel_sql(_STORE)
    + "\n  UNION ALL\n"
    + _q75_channel_sql(_WEB)
    + "\n  UNION ALL\n"
    + _q75_channel_sql(_CATALOG)
    + """
) c GROUP BY y, l_partkey)
SELECT p.l_partkey, p.net_qty AS prev_qty, c.net_qty AS curr_qty,
       c.net_qty - p.net_qty AS qty_diff
FROM u p JOIN u c ON p.l_partkey = c.l_partkey
WHERE p.y = 1995 AND c.y = 1996
  AND p.net_qty > 0 AND c.net_qty * 10 < p.net_qty * 9
ORDER BY p.l_partkey
LIMIT 100
"""
)


# --------------------------------------------------------------------------
# q78 shape: per-channel returns-anti-join spines, store LEFT JOIN web and
# catalog with COALESCE ratios. reference: benchmarks/queries-tpcds/q78.sql
# --------------------------------------------------------------------------
def tpcds_q78_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q78's cross-channel loyalty spine: each channel aggregates only
    never-returned sales (anti-join against the returned (order, part)
    set — ds's 'wr_order_number is null' LEFT-JOIN-null idiom), grouped
    by (year, part, customer); the store spine LEFT JOINs the other two
    and keeps rows with any other-channel activity, computing COALESCE'd
    ratios. Anti-joins shuffle on the composite key; the three spines are
    aggregates, so the final joins are spine-to-spine."""
    t = tables(spark, sf, "lineitem", "orders")
    returned = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).where(F.year("o_orderdate") == 1995)

    def spine(modes: int, tag: str) -> DataFrame:
        return (
            base.where(_chan(modes))
            .join(returned, ["l_orderkey", "l_partkey"], "left_anti")
            .groupBy("l_partkey", "o_custkey")
            .agg(
                F.sum("l_quantity").cast("bigint").alias(f"{tag}_qty"),
                F.sum(D("l_extendedprice")).alias(f"{tag}_sp"),
            )
        )

    ss = spine(_STORE, "ss")
    ws = spine(_WEB, "ws").withColumnsRenamed(
        {"l_partkey": "w_pk", "o_custkey": "w_ck"}
    )
    cs = spine(_CATALOG, "cs").withColumnsRenamed(
        {"l_partkey": "c_pk", "o_custkey": "c_ck"}
    )
    out = (
        ss.join(
            ws,
            (F.col("l_partkey") == F.col("w_pk"))
            & (F.col("o_custkey") == F.col("w_ck")),
            "left",
        )
        .join(
            cs,
            (F.col("l_partkey") == F.col("c_pk"))
            & (F.col("o_custkey") == F.col("c_ck")),
            "left",
        )
        .withColumn(
            "other_qty",
            F.coalesce(F.col("ws_qty"), F.lit(0))
            + F.coalesce(F.col("cs_qty"), F.lit(0)),
        )
        .where(F.col("other_qty") > 0)
    )
    return (
        out.select(
            "l_partkey",
            "o_custkey",
            "ss_qty",
            "other_qty",
            F.round(
                F.col("ss_qty").cast("double") / F.col("other_qty"), 6
            ).alias("ratio"),
            F.col("ss_sp").cast("double").alias("store_sales"),
            (
                F.coalesce(F.col("ws_sp"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("cs_sp"), F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("other_sales"),
        )
        .orderBy("l_partkey", "o_custkey")
        .limit(100)
    )


def _q78_spine_sql(modes: int, tag: str) -> str:
    return f"""
{tag} AS (
  SELECT l_partkey, o_custkey,
         CAST(SUM(l_quantity) AS BIGINT) AS {tag}_qty,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS {tag}_sp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995 AND {_chan_sql(modes)}
    AND NOT EXISTS (
      SELECT 1 FROM lineitem r
      WHERE r.l_returnflag = 'R'
        AND r.l_orderkey = lineitem.l_orderkey
        AND r.l_partkey = lineitem.l_partkey)
  GROUP BY 1, 2)"""


TPCDS_Q78_SQL = (
    "WITH "
    + _q78_spine_sql(_STORE, "ss")[1:]
    + ","
    + _q78_spine_sql(_WEB, "ws")
    + ","
    + _q78_spine_sql(_CATALOG, "cs")
    + """
SELECT ss.l_partkey, ss.o_custkey, ss_qty,
       COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS other_qty,
       ROUND(CAST(ss_qty AS DOUBLE)
             / (COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0)), 6) AS ratio,
       CAST(ss_sp AS DOUBLE) AS store_sales,
       CAST(COALESCE(ws_sp, CAST(0 AS DECIMAL(18,2)))
            + COALESCE(cs_sp, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
         AS other_sales
FROM ss
LEFT JOIN ws ON ss.l_partkey = ws.l_partkey AND ss.o_custkey = ws.o_custkey
LEFT JOIN cs ON ss.l_partkey = cs.l_partkey AND ss.o_custkey = cs.o_custkey
WHERE COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) > 0
ORDER BY ss.l_partkey, ss.o_custkey
LIMIT 100
"""
)


# --------------------------------------------------------------------------
# q93 shape: returns-adjusted actual sales via LEFT JOIN + conditional
# arithmetic. reference: benchmarks/queries-tpcds/q93.sql
# --------------------------------------------------------------------------
def tpcds_q93_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q93's refund-adjusted revenue: the per-(order, part) returned
    quantity LEFT JOINs back onto sales lines, each line's effective
    quantity is (qty - returned, floored at 0), and the adjusted decimal
    revenue rolls up per customer — top-100 ordered on the exact decimal
    before the double cast."""
    t = tables(spark, sf, "lineitem", "orders")
    ret = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("ret_qty"))
    )
    li = t.lineitem.where(F.col("l_returnflag") != "R")
    adj = (
        li.join(ret, ["l_orderkey", "l_partkey"], "left")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "eff_qty",
            F.greatest(
                F.col("l_quantity").cast("bigint")
                - F.coalesce(F.col("ret_qty"), F.lit(0)),
                F.lit(0),
            ),
        )
        .withColumn(
            "act_sales",
            D("l_extendedprice") * F.col("eff_qty"),
        )
    )
    agg = adj.groupBy("o_custkey").agg(F.sum("act_sales").alias("sumsales"))
    return (
        agg.orderBy(F.desc("sumsales"), "o_custkey")
        .limit(100)
        .select(
            "o_custkey", F.col("sumsales").cast("double").alias("act_sales")
        )
    )


TPCDS_Q93_SQL = """
WITH ret AS (
  SELECT l_orderkey, l_partkey,
         CAST(SUM(l_quantity) AS BIGINT) AS ret_qty
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2),
adj AS (
  SELECT o_custkey,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * GREATEST(CAST(l_quantity AS BIGINT) - COALESCE(ret_qty, 0), 0)
      AS act_sales
  FROM lineitem
  LEFT JOIN ret USING (l_orderkey, l_partkey)
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag <> 'R')
SELECT o_custkey, CAST(sumsales AS DOUBLE) AS act_sales
FROM (SELECT o_custkey, SUM(act_sales) AS sumsales FROM adj GROUP BY 1)
ORDER BY sumsales DESC, o_custkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# q95 shape: double semi-join (multi-supplier orders AND returned orders),
# COUNT(DISTINCT) reduction. reference: benchmarks/queries-tpcds/q95.sql
# --------------------------------------------------------------------------
def tpcds_q95_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q95's ws_wh double-IN: orders in Q1-1995 that used more than
    one supplier (the ws_wh self-join expressed as a COUNT(DISTINCT)
    HAVING spine — same semantics, one shuffle instead of a fact
    self-join) AND had at least one returned line; reduced to
    COUNT(DISTINCT) + decimal total. Both probes are semi-joins on
    o_orderkey."""
    t = tables(spark, sf, "lineitem", "orders")
    multi = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") > 1)
        .select("l_orderkey")
    )
    ret_orders = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    sel = (
        t.orders.where(
            (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") <= 3)
        )
        .join(multi, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(
            ret_orders,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
    )
    return sel.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.sum(D("o_totalprice")).cast("double").alias("total_price"),
    )


TPCDS_Q95_SQL = """
SELECT COUNT(DISTINCT o_orderkey) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 3
  AND o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1)
  AND o_orderkey IN (
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


# --------------------------------------------------------------------------
# q97 shape: two distinct (customer, part) spines FULL OUTER joined into
# both/only counts. reference: benchmarks/queries-tpcds/q97.sql
# --------------------------------------------------------------------------
def tpcds_q97_shape(spark: SparkSession, sf: str) -> DataFrame:
    """ds q97's channel-overlap census: the distinct (customer, part)
    pairs of the store and catalog channels FULL OUTER joined, counting
    store-only / catalog-only / both. The spines are DISTINCT aggregates;
    the FULL OUTER is spine-to-spine on the composite key."""
    t = tables(spark, sf, "lineitem", "orders")
    base = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    )

    def spine(modes: int, ck: str, pk: str) -> DataFrame:
        return (
            base.where(_chan(modes))
            .select(
                F.col("o_custkey").alias(ck), F.col("l_partkey").alias(pk)
            )
            .distinct()
        )

    ssc = spine(_STORE, "s_ck", "s_pk")
    csc = spine(_CATALOG, "c_ck", "c_pk")
    j = ssc.join(
        csc,
        (F.col("s_ck") == F.col("c_ck")) & (F.col("s_pk") == F.col("c_pk")),
        "full_outer",
    )
    return j.agg(
        F.sum(
            F.when(
                F.col("s_ck").isNotNull() & F.col("c_ck").isNull(), 1
            ).otherwise(0)
        ).alias("store_only"),
        F.sum(
            F.when(
                F.col("s_ck").isNull() & F.col("c_ck").isNotNull(), 1
            ).otherwise(0)
        ).alias("catalog_only"),
        F.sum(
            F.when(
                F.col("s_ck").isNotNull() & F.col("c_ck").isNotNull(), 1
            ).otherwise(0)
        ).alias("both_channels"),
    )


TPCDS_Q97_SQL = f"""
WITH ssc AS (
  SELECT DISTINCT o_custkey AS s_ck, l_partkey AS s_pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE {_chan_sql(_STORE)}),
csc AS (
  SELECT DISTINCT o_custkey AS c_ck, l_partkey AS c_pk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE {_chan_sql(_CATALOG)})
SELECT
  CAST(SUM(CASE WHEN s_ck IS NOT NULL AND c_ck IS NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS store_only,
  CAST(SUM(CASE WHEN s_ck IS NULL AND c_ck IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS catalog_only,
  CAST(SUM(CASE WHEN s_ck IS NOT NULL AND c_ck IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS both_channels
FROM ssc FULL OUTER JOIN csc ON s_ck = c_ck AND s_pk = c_pk
"""


QUERIES: dict[str, QuerySpec] = {
    "tpcds_q23_shape": QuerySpec(tpcds_q23_shape, TPCDS_Q23_SQL),
    "tpcds_q39_shape": QuerySpec(tpcds_q39_shape, TPCDS_Q39_SQL),
    "tpcds_q49_shape": QuerySpec(tpcds_q49_shape, TPCDS_Q49_SQL),
    "tpcds_q64_shape": QuerySpec(tpcds_q64_shape, TPCDS_Q64_SQL),
    "tpcds_q72_shape": QuerySpec(tpcds_q72_shape, TPCDS_Q72_SQL),
    "tpcds_q75_shape": QuerySpec(tpcds_q75_shape, TPCDS_Q75_SQL),
    "tpcds_q78_shape": QuerySpec(tpcds_q78_shape, TPCDS_Q78_SQL),
    "tpcds_q93_shape": QuerySpec(tpcds_q93_shape, TPCDS_Q93_SQL),
    "tpcds_q95_shape": QuerySpec(tpcds_q95_shape, TPCDS_Q95_SQL),
    "tpcds_q97_shape": QuerySpec(tpcds_q97_shape, TPCDS_Q97_SQL),
}
