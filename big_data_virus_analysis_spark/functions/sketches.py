"""Mergeable-sketch utilities: count-min and Bloom filters.

These wrap Spark's distributed sketch builders (``df.stat`` — computed
scan-side with partial merges, returning a bounded-size sketch to the
driver).  The returned sketches are the broadcast-back artifacts of the
classic two-phase pattern: build a tiny summary of side A distributed,
ship it to every task scanning side B (Spark's own runtime bloom-filter
join pushdown automates exactly this; `tests/test_plans.py` asserts it
engages — these wrappers are for when the summary must OUTLIVE the
query, e.g. daily key sketches persisted for next-day anti-joins).

Guarantees (asserted in tests/test_operators.py):
* count-min: estimate ≥ true count; ≤ true + eps·N with prob ≥ confidence.
* bloom: zero false negatives; false-positive rate ≈ configured fpp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def column_count_min(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 42
):
    """Count-min sketch of a column: point-lookup frequency estimates
    in O(1/eps) space regardless of cardinality.

    PySpark never wrapped Dataset.stat's sketch builders, so this goes
    through the JVM handle; the build itself is fully distributed
    (partial sketches merged tree-wise), only the final fixed-size
    sketch lands on the driver.  Query with ``.estimateCount(value)``."""
    return df._jdf.stat().countMinSketch(col, float(eps), float(confidence), int(seed))


def column_bloom(df: DataFrame, col: str, expected_items: int, fpp: float = 0.01):
    """Bloom filter of a column's value set: membership tests with no
    false negatives in ~1.44·log2(1/fpp) bits per item.  Same JVM
    bridging note as :func:`column_count_min`; query with
    ``.mightContain(value)``."""
    return df._jdf.stat().bloomFilter(col, int(expected_items), float(fpp))
