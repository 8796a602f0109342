"""Bucketed interval (range) join — points matched to containing time
ranges without a nested-loop join.

Spark plans a raw ``points.join(intervals, ts BETWEEN lo AND hi)`` as
BroadcastNestedLoopJoin (or a cartesian product when neither side fits
in memory) because there is no equi-key — O(|P|·|I|) and a driver OOM
waiting to happen at scale.  The standard scalable rewrite:

1. pick a bucket width ~ the typical interval length;
2. explode each interval to every bucket it overlaps (short intervals
   → 1-2 rows; cost is interval_span/width, bounded and known);
3. equi-join points to exploded intervals on (key, bucket) — a plain
   hash-shuffle join Catalyst and AQE fully optimize;
4. re-apply the exact range predicate (buckets over-approximate);
5. dedup (an interval spanning k buckets meets a point once per shared
   bucket — at most once per pair here since a point is in exactly one
   bucket, so no dedup needed when points explode on one side only).

No reference counterpart (SURVEY.md §2.4 lists range joins as absent);
north-star operator surface.  Oracle: DuckDB executes the same BETWEEN
join exactly (catalog: ``interval_join_error_clicks``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start: str,
    end: str,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Inner-join each point to every interval of the same ``key`` with
    ``start <= point_time <= end``.

    Returns all columns of both inputs (names must not collide except
    ``key``).  Times are timestamp columns; bucketing is on epoch
    seconds ``div`` bucket width.
    """
    b = F.lit(bucket_seconds).cast("bigint")

    def _bucket_of(col: str):
        return F.floor(F.unix_timestamp(F.col(col)) / b).cast("bigint")

    p = points.withColumn("_bucket", _bucket_of(point_time))
    # a point has exactly one bucket; intervals explode to each bucket
    # they overlap, so every qualifying (point, interval) pair meets in
    # exactly one bucket — inner join needs no dedup afterwards
    i = intervals.withColumn(
        "_bucket", F.explode(F.sequence(_bucket_of(start), _bucket_of(end)))
    )
    joined = p.join(i, [key, "_bucket"])
    return joined.where(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    ).drop("_bucket")
