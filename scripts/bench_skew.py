"""Planted-skew benchmark (VERDICT r03 #8): salted vs unsalted on a
hot-key fixture where ONE user owns ~30% of all event rows.

Two families, measured separately because Spark neutralizes them
differently:

* AGGREGATION (count/sum by user): map-side partial aggregation already
  collapses the hot key to one row per map task, so the reduce side
  never sees the skew — the salted twin should measure ~equal.  The
  bench records this so the claim "salting is needed for aggregation"
  is not overstated: it matters only for non-collapsible aggregates
  (exact distinct, collect_*), which is documented in SCALING.md.
* SHUFFLE JOIN (fact x dim on the hot key): with the dim too large to
  broadcast — the 100 TB regime, emulated by autoBroadcastJoinThreshold
  =-1 — the sort-merge join shuffles fact rows BY KEY, and one reducer
  owns 30% of the table.  Three plans are timed: the naive join with
  AQE skew-split off (the raw pathology), the naive join with AQE on
  (runtime mitigation), and salted_skew_join (plan-level guarantee that
  also composes under bucketed layouts / disabled AQE).

Writes one JSON line; results are committed into SCALING.md.

Usage: python scripts/bench_skew.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_virus_analysis_spark.operators.skew import (  # noqa: E402
    salted_count_sum,
    salted_skew_join,
)
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402
from big_data_virus_analysis_spark.sources.tables import load_table  # noqa: E402

N_RUNS = 3
HOT_USER = 42
HOT_FRACTION = 0.30
#: replication factor for the fixture: sf0.1's raw 100k rows are far too
#: small for any reducer to be a bottleneck (a 30k-row hot task finishes
#: in milliseconds, so salting overhead would dominate the signal).
#: Replicating to ~6.4M rows gives the hot reducer ~1.9M rows vs ~20k
#: for the median reducer — the shape one hot key has at cluster scale.
REPLICATE = int(os.environ.get("SPARK_GRAFT_SKEW_REPLICATE", "64"))


def _median_time(fn) -> float:
    runs = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bdva-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # planted-skew fixture: remap ~30% of rows (deterministic hash of
    # event id) onto one user; materialize so generation cost is not
    # measured
    skew_path = "/tmp/bdva_skew_events"
    events = load_table(spark, sf_dir, "events")
    replicated = events.crossJoin(
        F.broadcast(
            spark.range(REPLICATE).select(F.col("id").alias("_copy"))
        )
    ).withColumn("value", F.col("value") + F.col("_copy") * 0.001)
    skewed = replicated.withColumn(
        "user_id",
        F.when(
            F.pmod(F.hash("ts", "value"), F.lit(100)) < int(HOT_FRACTION * 100),
            F.lit(HOT_USER).cast(events.schema["user_id"].dataType.simpleString()),
        ).otherwise(F.col("user_id")),
    ).drop("_copy")
    skewed.write.mode("overwrite").parquet(skew_path)
    fact = spark.read.parquet(skew_path)
    n_rows = fact.count()
    hot_rows = fact.where(F.col("user_id") == HOT_USER).count()
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    results: dict[str, float] = {}

    # ---- aggregation family (partial agg collapses the hot key) -------
    results["agg_unsalted"] = _median_time(
        lambda: fact.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    results["agg_salted"] = _median_time(
        lambda: salted_count_sum(fact, "user_id", "value", n_salts=16)
    )

    # ---- shuffle-join family (dim too big to broadcast at 100 TB) -----
    def rollup(joined):
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        results["join_unsalted_no_aqe_skew"] = _median_time(
            lambda: rollup(fact.join(dim, fact.user_id == dim.c_custkey))
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        results["join_unsalted_aqe_skew"] = _median_time(
            lambda: rollup(fact.join(dim, fact.user_id == dim.c_custkey))
        )
        results["join_salted"] = _median_time(
            lambda: rollup(
                salted_skew_join(fact, dim, "user_id", "c_custkey", n_salts=16)
            )
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(
        json.dumps(
            {
                "metric": "planted_skew_bench",
                "unit": "sec",
                "sf_dir": sf_dir,
                "n_rows": n_rows,
                "hot_rows": hot_rows,
                "hot_fraction": round(hot_rows / n_rows, 3),
                "n_salts": 16,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
