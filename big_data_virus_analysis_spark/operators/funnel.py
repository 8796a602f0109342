"""Event-sequence funnel analysis over the events table.

The classic product-analytics question — how many users did A, then B
after A, then C after B — expressed as staged conditional aggregations:
each stage is a per-user min-timestamp aggregate of the next step
filtered to AFTER the previous stage's timestamp.  Three user-keyed
shuffles total (one per stage), each over per-user rows, never a
self-join of the raw event table against itself.

At 100 TB: every stage aggregates then joins on user_id — co-partition
all stages on user_id (bucketed layout or one repartition) and the
joins are shuffle-free zips of user-sized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Staged funnel over ``steps``: users reaching each stage in order.

    Output: ``(stage, step_name, n_users)`` with stage 1..3.
    """
    a, b, c = steps
    s1 = events.where(F.col("event_type") == a).groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        events.where(F.col("event_type") == b)
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.where(F.col("event_type") == c)
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("step_name"),
            F.count("*").alias("n_users"),
        )

    return stage(1, a, s1).unionByName(stage(2, b, s2)).unionByName(stage(3, c, s3))
