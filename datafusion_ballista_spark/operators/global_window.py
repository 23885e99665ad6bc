"""Distributed global row-number — the reference's partitioned bounded
window operator, Spark-first.

A no-PARTITION-BY ranking window forces every engine's default plan into a
single-partition global sort. The reference built a dedicated physical
operator pair to avoid that — OrderedRangeRepartitionExec +
PartitionedBoundedWindowAggExec
(ballista/core/src/execution_plans/partitioned_bounded_window_agg.rs:17-60):
range-repartition by the sort key, run the window per partition, then
shift each partition's results by the preceding partitions' row counts.

``global_row_number`` is the same algorithm in DataFrame terms:

1. ``repartitionByRange`` on the sort keys — a parallel range shuffle
   (sampled boundaries; correctness never depends on where they land);
2. per-partition local ``row_number`` — the window partitions on
   ``spark_partition_id()``, so no single-task sort exists anywhere;
3. per-partition counts (a tiny metadata aggregate, one row per
   partition) cumulated driver-side into offsets and broadcast back;
4. global rank = local rank + preceding-partitions offset.

Every stage is bounded: the range shuffle is the same one a global sort
would need anyway, the windows are per-partition, and the offset table
has ``numPartitions`` rows. Catalyst additionally hash-shuffles on the
pinned partition id to satisfy the window's distribution requirement —
one extra parallel shuffle, never a single task. A unique tiebreaker in
``order_cols`` makes ranks exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gw_pid"
_LOCAL_RN = "__gw_local_rn"
_OFFSET = "__gw_offset"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a GLOBAL 1-based row number ordered by ``order_cols`` without
    a single-partition sort. ``order_cols`` must end in a unique tiebreaker
    for exact ranks."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    # localCheckpoint PINS the range partitioning: the range partitioner
    # SAMPLES its boundaries, so without materialization the counts job and
    # the final job could re-execute the shuffle with different boundaries,
    # silently mismatching offsets and partition ids between the two runs.
    ranged = (
        df.repartitionByRange(int(n), *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = ranged.withColumn(_LOCAL_RN, F.row_number().over(w))
    # one row per partition; tiny driver-side cumulation, broadcast back
    counts = sorted(
        (r[_PID], r["c"])
        for r in local.groupBy(_PID).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID} int, {_OFFSET} bigint"
    )
    return (
        local.join(F.broadcast(off_df), _PID)
        # bigint on purpose: this operator exists for full-table ranking at
        # scale, where ranks exceed 2^31 (the reference's row_number is i64).
        .withColumn(out_col, (F.col(_LOCAL_RN) + F.col(_OFFSET)).cast("bigint"))
        .drop(_PID, _LOCAL_RN, _OFFSET)
    )
