"""Hierarchical time-bucket rollup (hypertable-style continuous
aggregate) over the events table.

The 100 TB pattern for multi-granularity time-series dashboards: the
raw table is scanned ONCE at the finest grain (hour), and every coarser
grain (day) is re-aggregated from the hour table — count and sum are
algebraic, so the day rollup reads the tiny hour aggregate instead of
re-shuffling the raw events.  In a materialized deployment the hour
table is the continuous aggregate and the day view is derived; here
both grains are returned in one frame tagged by a ``grain`` column.

Money-exact accumulation: ``value`` is summed through DECIMAL(18,6) so
the double-summation order (which differs between partial/final Spark
aggregation and any other engine) cannot perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Hour buckets from the raw scan; day buckets from the hour table.

    Output: ``(grain, bucket_us, event_type, n_events, sum_value)`` with
    ``bucket_us`` the bucket start as epoch microseconds.
    """
    hour = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))

    def shape(grain: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.unix_micros(F.col("bucket")).alias("bucket_us"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("sv").cast("double"), 6).alias("sum_value"),
        )

    return shape("hour", hour).unionByName(shape("day", day))


def hll_distinct_rollup(events: DataFrame) -> DataFrame:
    """Re-aggregable distinct-user counts via DataSketches HLL.

    Day-grain sketches are built ONCE from the raw scan; the total grain
    MERGES the day sketches (``hll_union_agg``) — never re-reading raw
    data.  This is the 100 TB pattern for distinct counts over rolling
    grains: an exact ``count(DISTINCT)`` per grain re-shuffles the raw
    table once PER GRAIN, while sketches make every coarser grain a
    union over the finest grain's tiny state (the same
    sketch-once/roll-up-anywhere shape as hypertable_rollup's sums —
    but sums are trivially re-aggregable and distinct counts are not,
    which is what the sketch buys).

    Estimates carry HLL error (~1.6% at the default lgConfigK=12) — no
    exact SQL oracle; the error-bound test against exact distincts is
    tests/test_operators.py::test_hll_rollup_within_error_bounds.

    Output: ``(grain, bucket_us, event_type, n_users_est)``.
    """
    day_sketch = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    day = day_sketch.select(
        F.lit("day").alias("grain"),
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "event_type",
        F.round(F.hll_sketch_estimate("sk")).cast("bigint").alias("n_users_est"),
    )
    total = (
        day_sketch.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("total").alias("grain"),
            F.lit(None).cast("bigint").alias("bucket_us"),
            "event_type",
            F.round(F.hll_sketch_estimate("sk")).cast("bigint").alias("n_users_est"),
        )
    )
    return day.unionByName(total)


def histogram_quantile_rollup(
    events: DataFrame,
    bin_width: float = 5.0,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Re-aggregable quantile estimation via fixed-width histograms.

    The quantile analogue of :func:`hll_distinct_rollup`: the raw scan
    builds ONE day-grain histogram (``groupBy(day, bin).count``); the
    corpus-level histogram is a SUM over the day bins — no second scan
    of the raw table — and any quantile is answered from a histogram's
    cumulative counts with linear interpolation inside the landing bin.
    Unlike ``percentile_approx`` state, the day histogram is a plain
    (bin, count) table, so it can be persisted as a continuous
    aggregate and re-aggregated to ANY coarser grain later.  Estimates
    are deterministic (no sketch randomness), so the DuckDB oracle
    recomputes them exactly; the error bound |est − exact| ≤ bin_width
    is asserted in tests.

    Output: ``(day, q, n, est)`` with ``day`` = 'YYYY-MM-DD' or 'ALL'.
    """
    from pyspark.sql.window import Window

    binned = events.select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / bin_width).alias("bin"),
    )
    day_hist = binned.groupBy("day", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    all_hist = day_hist.groupBy("bin").agg(F.sum("cnt").alias("cnt")).select(
        F.lit("ALL").alias("day"), "bin", "cnt"
    )
    hist = day_hist.unionByName(all_hist)
    w = Window.partitionBy("day").orderBy("bin")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("day")))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
    )
    exploded = cum.withColumn("q", F.explode(F.array(*[F.lit(q) for q in qs])))
    target = F.col("q") * F.col("n")
    return (
        exploded.where((F.col("cum_before") < target) & (target <= F.col("cum")))
        .select(
            "day",
            "q",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.col("bin") * bin_width
                + bin_width * (target - F.col("cum_before")) / F.col("cnt"),
                6,
            ).alias("est"),
        )
    )
