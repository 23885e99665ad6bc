"""Plan dumps for the text_winnow_fingerprint SELECTION subtree (round 14).

The full query's .explain is truncated at the localCheckpoint boundary
(the fingerprint table is materialized once), so the committed
text_winnow_fingerprint_{before,after}.txt dumps cannot show the
selection-stage change. This script rebuilds the selection subtree both
ways from the module's own helpers and writes
  text_winnow_sel_before.txt  (row_number sort-window, rn = 1)
  text_winnow_sel_after.txt   (min(h) hash aggregation)
so the plan claim — Window+Sort replaced by partial/final HashAggregate —
is checkable against committed files.

Usage: SPARK_GRAFT_SF_DIR=... python plans/r14/winnow_sel_plans.py
"""
import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datafusion_ballista_spark.session import get_session  # noqa: E402
import datafusion_ballista_spark.inventory.pipeline_text as pt  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(master="local[8]", app_name="winnow-sel-plans",
                    shuffle_partitions=8)

# the function body up to `wrows`, verbatim from text_winnow_fingerprint
d = pt._spread_for_explode(spark, pt.tables(spark, SF_DIR, "documents").documents)
toks = d.select("doc_id", pt._tokens(F.col("text")).alias("arr")).where(
    F.size("arr") >= 3
)
n = F.size(F.col("arr")) - 2
grams = toks.select(
    "doc_id",
    n.alias("m"),
    F.posexplode(
        F.zip_with(
            F.slice("arr", F.lit(1), n),
            F.zip_with(
                F.slice("arr", F.lit(2), n),
                F.slice("arr", F.lit(3), n),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
            lambda x, yz: F.concat_ws(" ", x, yz),
        )
    ).alias("p0", "g"),
).select(
    "doc_id",
    "m",
    (F.col("p0") + 1).alias("pos"),
    pt._h48(F.col("g")).alias("h"),
)
W = pt._WINNOW_W
wrows = grams.select(
    "doc_id",
    "pos",
    "h",
    F.explode(
        F.sequence(
            F.greatest(F.lit(1), F.col("pos") - (W - 1)),
            F.least(F.col("pos"), F.greatest(F.col("m") - (W - 1), F.lit(1))),
        )
    ).alias("w"),
)

sel_before = (
    wrows.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id", "w").orderBy(F.asc("h"), F.desc("pos"))
        ),
    )
    .where(F.col("rn") == 1)
    .select("doc_id", "h")
    .distinct()
)
# the rightmost-on-ties rule only decides WHICH ROW wins among equal-h
# rows; the operator keeps only (doc_id, h), so min(h) is bit-identical
sel_after = (
    wrows.groupBy("doc_id", "w")
    .agg(F.min("h").alias("h"))
    .select("doc_id", "h")
    .distinct()
)

import contextlib  # noqa: E402
import io  # noqa: E402

for name, df in (("before", sel_before), ("after", sel_after)):
    path = f"plans/r14/text_winnow_sel_{name}.txt"
    try:
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
    with open(path, "w") as f:
        f.write(txt)
    print("wrote", path, len(txt))
