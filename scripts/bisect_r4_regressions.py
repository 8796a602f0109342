"""Bisect harness: time the 3 regressed queries in a fresh JVM.

Usage: python /tmp/bisect_bench.py <repo_path> [n_runs]
Mirrors bench.py's protocol exactly: sf0.001 warmup per plan, then
n_runs timed noop-sink executions at sf0.1 with clearCache between.
"""
import json
import os
import statistics
import sys
import time

repo = sys.argv[1]
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sys.path.insert(0, repo)

from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402

NAMES = ["training_shuffle_order", "cosine_topk_bruteforce", "dedup_cluster_assign_two_phase"]

spark = get_spark("bisect")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for name in NAMES:
    CATALOG[name].spark(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

out = {}
for name in NAMES:
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        CATALOG[name].spark(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    out[name] = {"median": round(statistics.median(runs), 3), "min": round(min(runs), 3), "max": round(max(runs), 3)}
print("BISECT " + json.dumps({"repo": repo, "n": n_runs, "timings": out}))
