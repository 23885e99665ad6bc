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

import math

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


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rnk",
    dense: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed no-PARTITION-BY ``rank()`` / ``dense_rank()`` — the same
    offset-stitched algorithm as ``global_row_number``, exact because
    ``repartitionByRange`` hashes EQUAL sort keys to the SAME partition:
    a tie group never straddles a partition boundary, so a local rank plus
    the preceding partitions' row count (or distinct-key count for dense)
    is the global rank."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = (
        df.repartitionByRange(int(n), *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()  # pin sampled range boundaries (see above)
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    fn = F.dense_rank() if dense else F.rank()
    local = ranged.withColumn(_LOCAL_RN, fn.over(w))
    if dense:
        # dense offset = number of DISTINCT key tuples in prior partitions,
        # which is exactly the partition's max local dense_rank (no need to
        # re-derive the key expression from the sort columns).
        counts_df = local.groupBy(_PID).agg(F.max(_LOCAL_RN).alias("c"))
    else:
        counts_df = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("c"))
    counts = sorted((r[_PID], r["c"]) for r in counts_df.collect())
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID} int, {_OFFSET} bigint"
    )
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_LOCAL_RN) + F.col(_OFFSET)).cast("bigint"))
        .drop(_PID, _LOCAL_RN, _OFFSET)
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: Column,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed no-PARTITION-BY running ``SUM(value) OVER (ORDER BY ...
    ROWS UNBOUNDED PRECEDING)`` — range shuffle, per-partition local
    cumulative sum, then each partition shifts by the total of all prior
    partitions (one tiny per-partition aggregate, cumulated driver-side
    and broadcast back; the reference's partitioned bounded-window shape).
    ``order_cols`` must end in a unique tiebreaker so the ROWS frame is
    deterministic.

    Exactness: decimal/integer value columns stitch exactly (addition is
    associative). For float/double values the per-partition offsets are
    accumulated with ``math.fsum`` (error-free driver-side summation), so
    drift vs a serial scan is bounded to the final rounding of each offset
    — pass a decimal column when bit-exact running sums are required."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    val = "__gw_val"
    ranged = (
        df.withColumn(val, value_col)
        .repartitionByRange(int(n), *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(_LOCAL_RN, F.sum(val).over(w))
    # Offsets carry the LOCAL SUM's OWN type (pass decimals for exact,
    # order-independent stitching — float partials would re-associate).
    sum_type = dict(local.dtypes)[_LOCAL_RN]
    sums = sorted(
        (r[_PID], r["s"])
        for r in ranged.groupBy(_PID).agg(F.sum(val).alias("s")).collect()
    )
    float_vals = sum_type in ("float", "double")
    offsets, prior = [], []
    for pid, s in sums:
        # fsum keeps double offsets error-free over any partition count;
        # cheap because len(prior) <= shuffle partitions (metadata-sized).
        acc = math.fsum(prior) if float_vals else sum(prior)
        offsets.append((pid, str(acc)))
        prior.append(s if s is not None else 0)
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID} int, {_OFFSET} string"
    ).withColumn(_OFFSET, F.col(_OFFSET).cast(sum_type))
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_LOCAL_RN) + F.col(_OFFSET))
        .drop(_PID, _LOCAL_RN, _OFFSET, val)
    )
