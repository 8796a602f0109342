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
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_virus_analysis_spark.operators.caching import (  # noqa: E402
    release_tracked_caches,
)
from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402

from make_sf1 import replicate_corpus  # noqa: E402

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
    # the 5 most expensive headline queries (VERDICT r04 #6): measured
    # at sf1 so their exponents are fitted over three decades
    "dedup_cluster_assign_two_phase",
    "dedup_incremental_batch",
    "dup_span_doc_fraction",
    "minhash_lsh_pairs",
    "semantic_dedup_pairs",
    # round-10 (r9 VERDICT directive #4): the round-9 heavyweights
    "msf_boruvka_dup_graph",
    "hits_bipartite_topk",
    "kneser_ney_bigram_ppl",
]

#: SPARK_GRAFT_SF1_PROBE_ONLY=a,b,c restricts the probe to named
#: queries (any catalog name) — the bench.py triage-hook convention
_ONLY = os.environ.get("SPARK_GRAFT_SF1_PROBE_ONLY", "")
if _ONLY:
    PROBE = [c for c in _ONLY.split(",") if c]

def main() -> None:
    spark = get_spark("bdva-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate_corpus(spark, SRC, DST, FACTOR)

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
            release_tracked_caches()
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
