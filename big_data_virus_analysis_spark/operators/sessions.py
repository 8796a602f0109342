"""Event-time operators over the ``events`` table (batch forms).

The streaming counterparts live in ``streaming/``; these batch
DataFrame forms are the oracle-checkable semantics.  Timestamps are
compared in epoch **microseconds** (``unix_micros``) so Spark and the
DuckDB oracle agree exactly (no second-truncation, no timezone
rendering).

Scale note: sessionization partitions by ``user_id`` — one shuffle, and
the window sort is per-user (bounded).  Skewed users would be the
concern at 100 TB; AQE skew handling applies because this is a regular
hash partitioning, and a power-user salt + two-phase stitch is the
documented escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 1800


def sessionize(events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """Gap-based sessions per user.

    Output: ``(user_id, session_id, session_start_us, session_end_us,
    n_events, sum_value)`` — session_id is 1-based per user in time
    order; classic lag → new-session flag → running sum.
    """
    gap_us = gap_seconds * 1_000_000
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tus = F.unix_micros("ts")
    prev = F.lag(tus).over(w)
    new_session = F.when(prev.isNull() | (tus - prev > gap_us), 1).otherwise(0)

    return (
        events.withColumn("tus", tus)
        .withColumn("session_id", F.sum(new_session).over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("tus").alias("session_start_us"),
            F.max("tus").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def tumbling_window_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows × event_type.

    Output: ``(window_start_us, event_type, n_events, sum_value)``.
    Batch analog of the Structured-Streaming windowed aggregation in
    ``streaming/windows.py``.
    """
    win = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
