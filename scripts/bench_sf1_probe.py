"""Out-of-grid scaling probe: replicate the sf0.1 corpus 10× (a
synthetic "sf1") and measure a representative headline subset there,
comparing against what the fitted sf0.01→0.1 exponents predict.

The measured scaling curve (bench.py) stops at sf0.1 where fixed
overhead still dominates; this probe is the falsification check one
decade further out: if a plan had a hidden super-linear term, the
measured sf1 time would overshoot both the exponent prediction AND the
linear bound.  Replication offsets ids so key cardinalities grow with
the data (no artificial hot keys).

Writes one JSON line; results are committed into SCALING.md.

Usage: python scripts/bench_sf1_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402
from big_data_virus_analysis_spark.sources.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/bdva_sf1"
FACTOR = 10
N_RUNS = 3

#: headline subset spanning the cost families: gram-explosion hashing,
#: exact dedup hash-agg, pure-map text stats, event sessionization,
#: window rank, count-min build+merge
PROBE = [
    "minhash_lsh_pairs_fast",
    "dedup_exact",
    "token_stats",
    "sessionize_events",
    "window_rank_parts",
    "cms_heavy_users",
]

#: id column to offset per replica so cardinality scales with the data
ID_COLS = {
    "documents": "doc_id",
    "events": "user_id",  # users also scale: no artificial hot keys
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}
OFFSET = 10_000_000


def build_sf1(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        out = f"{DST}/{name}.parquet"
        if os.path.exists(out):
            shutil.rmtree(out, ignore_errors=True)
        df = load_table(spark, SRC, name)
        if name in ID_COLS:
            copies = spark.range(FACTOR).select(F.col("id").alias("_copy"))
            col = ID_COLS[name]
            df = (
                df.crossJoin(F.broadcast(copies))
                .withColumn(col, F.col(col) + F.col("_copy") * OFFSET)
                .drop("_copy")
            )
        df.write.mode("overwrite").parquet(out)


def main() -> None:
    spark = get_spark("bdva-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = json.load(open(os.path.join(repo_root, "BENCH_FULL.json")))
    results = {}
    for name in PROBE:
        # warm the plan shape at the small SF first (codegen compile)
        CATALOG[name].spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            CATALOG[name].spark(spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        t_sf1 = round(statistics.median(runs), 3)
        t_01 = base["queries"].get(name)
        exp = base["scaling_exponent"].get(name)
        results[name] = {
            "sf0.1": t_01,
            "sf1_measured": t_sf1,
            "sf1_predicted_exp": round(t_01 * FACTOR**exp, 3) if exp is not None else None,
            "sf1_linear_bound": round(t_01 * FACTOR, 3) if t_01 else None,
            "measured_exponent_0.1_to_1": (
                round(__import__("math").log(t_sf1 / t_01) / __import__("math").log(FACTOR), 2)
                if t_01
                else None
            ),
        }

    print(
        json.dumps(
            {
                "metric": "sf1_probe",
                "unit": "sec",
                "factor": FACTOR,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
