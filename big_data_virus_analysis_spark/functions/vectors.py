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
