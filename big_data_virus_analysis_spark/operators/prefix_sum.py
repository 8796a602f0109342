"""Distributed global prefix sum — the two-phase scan primitive.

A global ordered cumulative sum expressed naively is one
``Window.orderBy(...)`` with no partitioning: Spark funnels the WHOLE
table through a single task — the canonical scale killer.  The
distributed form is the classic two-phase scan (the same shape Spark's
own RangePartitioner sampling uses):

1. range-repartition on the order key so partitions hold contiguous,
   sorted, balanced key ranges;
2. per-partition local cumulative sums (a window PARTITIONED by the
   range bucket — parallel);
3. per-partition totals (one tiny row per partition) are prefix-summed
   on the driver and broadcast back as additive offsets.

The driver step touches P rows (hundreds), never data rows.  Output is
bit-identical to the single-partition window because integer/decimal
addition is associative; for doubles use a decimal value column first.

No reference counterpart (the reference never needed a global scan);
this is engine-infrastructure for order-defined operators — sequence
packing (plans/packing.py), exact quantile assignment, pagination.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    n_buckets: int | None = None,
    order_exprs=None,
) -> DataFrame:
    """Add ``out_col`` = cumulative sum of ``value_col`` over the GLOBAL
    ``order_col`` order (inclusive prefix sum), without a global window.

    ``order_col`` must be unique (it defines the scan order).  The range
    bucketing uses ``ntile``-free percent_rank-less binning: buckets come
    from ``pmod(dense-rank-free range split)`` — here simply
    ``repartitionByRange`` + ``spark_partition_id`` materialized BEFORE
    the window so the per-bucket window is hash-clustered on a plain
    column.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    if order_exprs is None:
        order_exprs = [F.col(order_col)]  # default scan order; pass a
        # list of expressions (e.g. [col desc, tiebreaker]) for others
    bucketed = (
        df.repartitionByRange(n_buckets, *order_exprs)
        .withColumn("_bucket", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin bucket assignment for reuse below
    )
    local_w = Window.partitionBy("_bucket").orderBy(*order_exprs)
    with_local = bucketed.withColumn("_local_cum", F.sum(value_col).over(local_w))
    # P tiny rows -> driver prefix sum -> broadcast offsets
    totals = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_total"))
        .collect()
    )
    cum_type = dict(with_local.dtypes)["_local_cum"]  # sum()'s widened type
    zero = Decimal(0) if cum_type.startswith("decimal") else 0
    offsets, running = {}, zero
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = running
        running += row["_total"]
    offset_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], f"_bucket int, _offset {cum_type}"
    )
    return (
        with_local.join(F.broadcast(offset_df), "_bucket")
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop("_bucket", "_local_cum", "_offset")
    )


def global_row_number(
    df: DataFrame,
    order_exprs,
    out_col: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = row_number() over the GLOBAL order without a
    single-partition window: range-partition on the order expressions,
    number rows per bucket in parallel, then offset each bucket by the
    count of all earlier buckets (P tiny rows through the driver).

    The order must be total (include a unique tiebreaker) so bucket
    boundaries cannot split ties; output is then bit-identical to the
    naive global window.  percent_rank and ntile derive from (rn, n):
    ``percent_rank = (rn-1)/(n-1)``; SQL ntile(k) assigns the first
    ``n % k`` buckets ``n//k + 1`` rows — both plain expressions once a
    one-row count broadcasts.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    bucketed = (
        df.repartitionByRange(n_buckets, *order_exprs)
        .withColumn("_bucket", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local_w = Window.partitionBy("_bucket").orderBy(*order_exprs)
    with_local = bucketed.withColumn("_local_rn", F.row_number().over(local_w))
    counts = bucketed.groupBy("_bucket").count().collect()
    offsets, running = {}, 0
    for row in sorted(counts, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = running
        running += row["count"]
    offset_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_bucket int, _offset bigint"
    )
    return (
        with_local.join(F.broadcast(offset_df), "_bucket")
        .withColumn(out_col, (F.col("_local_rn") + F.col("_offset")).cast("int"))
        .drop("_bucket", "_local_rn", "_offset")
    )
