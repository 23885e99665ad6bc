"""UDF / UDAF / UDTF surface (SURVEY §2.9) — where Spark exceeds the reference.

The reference serializes Rust ScalarUDF/AggregateUDF/WindowUDF by name
(datafusion.proto:555-570, PhysicalScalarUdfNode :951-959) and explicitly
lacks Python UDFs (ROADMAP.md:60 "Support Python UDFs (#173)"); its only
table function is the built-in generate_series (datafusion.proto:1487-1498).
This module exercises every UDF entry point PySpark offers natively:

- ``spark.udf.register``   -> scalar Python UDF callable from SQL
- ``@pandas_udf`` (scalar) -> Arrow-vectorized columnar transform
- ``@pandas_udf`` (grouped agg) -> custom aggregate over whole groups
- ``groupBy().applyInPandas``   -> grouped-map transform (per-group frame)
- ``@udtf`` + LATERAL           -> Python table function (rows out per row in)
- ``cogroup().applyInPandas``   -> two-sided grouped map; used for an AS-OF
  join, an operator the reference lacks entirely (DuckDB's native ASOF JOIN
  is the oracle)

Hot-path discipline (the 100 TB story): per-row Python UDFs exist here to
*prove the surface*, not as the recommended path — every transform in this
module is also expressible with built-ins (the oracle SQL is exactly that),
and the pipeline modules keep Python out of hot loops. The pandas variants
move data via Arrow batches (10-100x over row-at-a-time); applyInPandas /
cogroup shuffle once on the grouping key and then stream one group per
pandas frame, so memory is bounded by the largest single group — at 100 TB
you key by something with bounded group size (user_id, not event_type).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import tables


def udf_sql_register(spark: SparkSession, sf: str) -> DataFrame:
    """``spark.udf.register`` + SQL call — the reference's by-name scalar UDF
    registration surface (datafusion.proto:555-562) on the Python side.
    Registered as an Arrow-vectorized ``pandas_udf`` (not a per-row Python
    function) so the surface demo is also the recommended pattern: the SQL
    caller sees the same by-name function, the executor sees batches."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _tok_count(text: pd.Series) -> pd.Series:
        # Single-space split, mirroring the oracle's string_split(text, ' ');
        # nulls propagate (str accessor keeps NaN -> Int64 NA).
        return text.str.split(" ").str.len().astype("Int64")

    spark.udf.register("tok_count", _tok_count)
    tables(spark, sf, "documents").documents.createOrReplaceTempView("udf_docs")
    return spark.sql(
        "SELECT lang, SUM(tok_count(text)) AS toks, COUNT(*) AS docs "
        "FROM udf_docs GROUP BY lang ORDER BY lang"
    )


UDF_SQL_REGISTER_SQL = """
SELECT lang, CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS toks,
  COUNT(*) AS docs
FROM documents GROUP BY lang ORDER BY lang
"""


def pandas_udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (batch-at-a-time, no per-row
    Python) — log-scale scoring of event values."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log_score(v: pd.Series) -> pd.Series:
        return np.log1p(np.abs(v))

    ev = tables(spark, sf, "events").events
    return (
        ev.select("event_type", log_score("value").alias("s"))
        .groupBy("event_type")
        .agg(F.round(F.sum("s"), 4).alias("total_score"))
        .orderBy("event_type")
    )


PANDAS_UDF_SCALAR_SQL = """
SELECT event_type, ROUND(SUM(ln(1 + abs(value))), 4) AS total_score
FROM events GROUP BY event_type ORDER BY event_type
"""


def pandas_udf_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (custom UDAF: weighted mean) — the
    AggregateUDF surface (datafusion.proto:563-570)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = tables(spark, sf, "events").events.withColumn(
        "w", (F.col("user_id") % 10 + 1).cast("double")
    )
    return (
        ev.groupBy("event_type")
        .agg(F.round(wavg("value", "w"), 6).alias("wavg_value"))
        .orderBy("event_type")
    )


PANDAS_UDF_GROUPED_AGG_SQL = """
SELECT event_type,
  ROUND(SUM(value * (user_id % 10 + 1)) / SUM(user_id % 10 + 1), 6)
    AS wavg_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def apply_in_pandas_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """groupBy().applyInPandas — per-group z-score normalization, one pandas
    frame per group (grouped-map; the shape every featurization pipeline
    uses). Oracle: the equivalent window-aggregate SQL. Trailing sort on
    the unique event_id pins returned-row order on both sides so the
    stricter ordered-hash comparison mode holds too."""
    ev = tables(spark, sf, "events").events

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.assign(z=((v - v.mean()) / v.std()).round(6))
        return pdf[["event_id", "event_type", "z"]]

    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, z double")
        .orderBy("event_id")
    )


APPLY_IN_PANDAS_ZSCORE_SQL = """
SELECT event_id, event_type,
  ROUND((value - AVG(value) OVER (PARTITION BY event_type))
        / STDDEV(value) OVER (PARTITION BY event_type), 6) AS z
FROM events
ORDER BY event_id
"""


def udtf_lateral_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF via LATERAL — a user table function, which the reference
    has no surface for at all (only built-in generate_series,
    datafusion.proto:1487-1498). ``useArrow=True`` keeps even this
    row-generator surface on the Arrow serialization path (plan shows
    ArrowEvalPythonUDTF, not the pickle BatchEvalPython — pinned by the
    whole-inventory audit in tests/test_plans.py)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string", useArrow=True)
    class SplitToks:
        def eval(self, text: str | None):
            if text is not None:
                for t in text.split(" "):
                    yield (t,)

    spark.udtf.register("split_toks", SplitToks)
    tables(spark, sf, "documents").documents.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.tok FROM udtf_docs d, "
        "LATERAL split_toks(d.text) t WHERE d.doc_id < 100"
    )


UDTF_LATERAL_TOKENS_SQL = """
SELECT doc_id, unnest(string_split(text, ' ')) AS tok
FROM documents WHERE doc_id < 100
"""


def map_in_arrow_stats(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow``: zero-copy Arrow RecordBatch transform — the leanest
    Python data-path surface (no pandas materialization; Arrow compute
    kernels are C++-vectorized). Per-doc char and space counts via
    pyarrow.compute, matched against plain SQL string math."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = tables(spark, sf, "documents").documents.select("doc_id", "text")

    def stats(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.utf8_length(b.column("text")),
                    pc.count_substring(b.column("text"), " "),
                ],
                names=["doc_id", "n_chars", "n_spaces"],
            )

    return d.mapInArrow(
        stats, "doc_id long, n_chars int, n_spaces int"
    ).orderBy("doc_id")


MAP_IN_ARROW_SQL = """
SELECT doc_id,
  CAST(length(text) AS INTEGER) AS n_chars,
  CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER) AS n_spaces
FROM documents
ORDER BY doc_id
"""


def cogroup_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join via cogroup().applyInPandas: each event joins the most
    recent prior-or-equal 'signup' event of the same user. An operator the
    reference lacks; DuckDB's native ASOF JOIN is the oracle.

    Scale: cogroup shuffles both sides once on user_id, then runs
    pd.merge_asof per user — group size is one user's history, bounded
    regardless of total data size. (user_id, ts) is unique in the fixture,
    so the backward match is deterministic. Trailing sort on the unique
    event_id pins returned-row order on both sides so the stricter
    ordered-hash comparison mode holds too."""
    ev = tables(spark, sf, "events").events
    left = ev.select("event_id", "user_id", "ts", "event_type")
    right = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("anchor_ts"), F.col("value").alias("anchor_value")
    )

    def asof(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values("ts")
        r = r.sort_values("anchor_ts")
        out = pd.merge_asof(
            l, r.drop(columns=["user_id"]), left_on="ts", right_on="anchor_ts"
        )
        return out[["event_id", "user_id", "ts", "anchor_ts", "anchor_value"]]

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema="event_id long, user_id long, ts timestamp, "
            "anchor_ts timestamp, anchor_value double",
        )
        .orderBy("event_id")
    )


COGROUP_ASOF_JOIN_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.ts AS anchor_ts, r.value AS anchor_value
FROM events l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


QUERIES: dict[str, QuerySpec] = {
    "udf_sql_register": QuerySpec(udf_sql_register, UDF_SQL_REGISTER_SQL),
    "pandas_udf_scalar": QuerySpec(pandas_udf_scalar, PANDAS_UDF_SCALAR_SQL),
    "pandas_udf_grouped_agg": QuerySpec(
        pandas_udf_grouped_agg, PANDAS_UDF_GROUPED_AGG_SQL
    ),
    "apply_in_pandas_zscore": QuerySpec(
        apply_in_pandas_zscore, APPLY_IN_PANDAS_ZSCORE_SQL
    ),
    "udtf_lateral_tokens": QuerySpec(udtf_lateral_tokens, UDTF_LATERAL_TOKENS_SQL),
    "map_in_arrow_stats": QuerySpec(map_in_arrow_stats, MAP_IN_ARROW_SQL),
    "cogroup_asof_join": QuerySpec(cogroup_asof_join, COGROUP_ASOF_JOIN_SQL),
}
