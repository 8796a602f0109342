"""As-of (point-in-time) join — a custom operator Spark has no built-in
for, composed from union + window instead of a range join.

Semantics: for every left row, attach the single most recent right row
with ``right.time <= left.time`` within the same key (the classic
"latest quote at trade time" / "last purchase before this event" join).

Plan shape — why union+window and not a join:

* A naive ``left.join(right, key AND r.ts <= l.ts)`` explodes to every
  qualifying pair and needs a post-aggregation to keep the latest —
  O(|L|·|R|) per key worst case; unusable when a key has thousands of
  right rows.
* This implementation UNIONs the tagged sides and runs ONE running-max
  window per key ordered by time: a single hash shuffle on the key +
  one sort — O((|L|+|R|) log) per partition, no pair explosion, and
  the window never holds more than one value of state per row.  This is
  the shape that survives 100 TB; skewed keys fall under the same AQE /
  salting story as any keyed shuffle.

DuckDB's native ``ASOF JOIN`` is the oracle (catalog:
``asof_last_purchase``).

No reference counterpart (SURVEY.md §2.4: "No sort-merge, theta, range,
as-of ... joins exist in the reference") — north-star operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row at-or-before
    its time, NULL when no right row precedes it.

    ``value_cols`` are the right-side columns to carry (each lands as
    ``<name><suffix>``).  Ties (right_time == left_time) match, i.e.
    ``<=`` semantics — identical to DuckDB ``ASOF JOIN ... ON l.t >= r.t``.
    """
    lt = F.col(left_time)
    tagged_left = left.select(
        F.col(key).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows sort BEFORE left rows at equal time (_is_left asc) so a
    # same-timestamp right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_is_left") == 1).drop(
        "_k", "_t", "_is_left", *[f"_rv_{c}" for c in value_cols]
    )
