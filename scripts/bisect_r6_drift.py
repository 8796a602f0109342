"""Fresh-JVM bisect of the round-6 +18% shared-39 bench drift.

The driver's BENCH_r06 showed 30+ unrelated queries up 25-45% vs
BENCH_r05 with zero plan changes (r6 VERDICT directive #1).  This
harness times the 10 worst drifts in a FRESH JVM per repo checkout —
the r4 recipe (scripts/bisect_r4_regressions.py) that proved the r4
episode was JVM-state, not code.

Usage: python scripts/bisect_r6_drift.py <repo_path> [n_runs]
Run once against an r5-code worktree and once against the current
tree; compare the two BISECT lines.  Mirrors bench.py's protocol:
sf0.001 warmup per plan, then n_runs timed noop-sink executions at
sf0.1, cache-clear + GC hint between runs.
"""
import json
import statistics
import sys
import time

repo = sys.argv[1]
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sys.path.insert(0, repo)

from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402

#: the 10 worst shared-39 r5->r6 drift ratios from BENCH_r05/BENCH_r06
NAMES = [
    "sequence_packing",
    "token_stats",
    "cosine_topk_bruteforce",
    "minhash_lsh_pairs_fast",
    "ann_lsh_topk",
    "rag_chunk_windows",
    "ivf_ann_topk_fixed",
    "dedup_cluster_assign_two_phase",
    "sliding_window_events",
    "tfidf_top_terms",
]

spark = get_spark("bisect-r6")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def _reset():
    try:
        from big_data_virus_analysis_spark.operators.caching import (
            release_tracked_caches,
        )

        release_tracked_caches()
    except Exception:
        pass
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


for name in NAMES:
    CATALOG[name].spark(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    _reset()

out = {}
for name in NAMES:
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        CATALOG[name].spark(spark, "/root/testdata/sf0.1").write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        _reset()
    out[name] = {
        "median": round(statistics.median(runs), 3),
        "min": round(min(runs), 3),
        "max": round(max(runs), 3),
    }
print("BISECT " + json.dumps({"repo": repo, "n": n_runs, "timings": out}))
