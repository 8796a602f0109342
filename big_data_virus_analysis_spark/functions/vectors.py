"""Dense-vector expressions over ``array<float|double>`` columns.

Embedding math stays JVM-side: ``zip_with`` + ``aggregate`` compile to
codegen'd loops over the array, so brute-force cosine scoring of a
broadcast query set never leaves the executor JVM.  (A pandas-UDF
variant exists in operators/similarity.py for very wide vectors, where
Arrow-batched NumPy beats codegen'd per-element loops.)

All helpers cast elements to double *before* multiplying so Spark and
the DuckDB oracle accumulate identically (float32 multiplies would
diverge in the low bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def zorder_value(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns —
    sort by this before writing and parquet min/max stats narrow on
    BOTH dimensions at once (multi-dimensional data skipping).

    Pure shift/add expression tree (interleaved bits never overlap, so
    addition is bitwise-or): bit i of ``a`` lands at 2i, of ``b`` at
    2i+1.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("bigint"), i) % 2, 2 * i)
        z = z + F.shiftleft(F.shiftright(b.cast("bigint"), i) % 2, 2 * i + 1)
    return z


def contiguous_ids(df, id_col: str = "row_id"):
    """Contiguous 0-based unique ids without a global sort — the
    DataFrame re-expression of RDD ``zipWithIndex``: per-partition row
    counts (one tiny agg, |partitions| rows) become cumulative offsets
    via a window over that tiny frame, broadcast back and added to the
    within-partition row_number.  No stage sees more than its own
    partition; assignment order within a partition is arbitrary (as
    with zipWithIndex), but ids are guaranteed unique and contiguous.

    The driver-free contrast: ``monotonically_increasing_id`` is a pure
    map but leaves gaps; a single-partition ``row_number`` window is
    contiguous but serial.  This is both.
    """
    from pyspark.sql import Window

    with_pid = df.withColumn("_pid", F.spark_partition_id())
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        with_pid.groupBy("_pid")
        .count()
        .withColumn("_offset", F.coalesce(F.sum("count").over(woff), F.lit(0)))
        .select("_pid", "_offset")
    )
    win = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            id_col, (F.col("_offset") + F.row_number().over(win) - 1).cast("long")
        )
        .drop("_pid", "_offset")
    )
