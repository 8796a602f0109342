"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation of
every output column, no write cost, no driver collect).  Each query runs
N_RUNS times; the headline number is the per-query MEDIAN (single-digit
-second measurements are variance-dominated, so one run can't separate a
plan change from scheduler noise), with per-query [min, max] spread
reported alongside."""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_virus_analysis_spark.plans.catalog import CATALOG  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

HEADLINE = [
    # reference-parity core
    "info_gain_topk",
    "scan_filter_project",
    "agg_pricing_summary",
    "join_orders_customer",
    "broadcast_dim_rollup",
    "semi_join_vocab",
    "window_rank_parts",
    "sessionize_events",
    "tumbling_window_events",
    "shingle_documents",
    # training-data-pipeline extensions
    "dedup_exact",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_fast",
    "token_stats",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "embedding_near_dup",
    "payload_metadata_stats",
    "sliding_window_events",
    "tfidf_top_terms",
    "hypertable_rollup",
    "top_unshipped_revenue",
    # iterative-components and two-phase-scan paths (timed, not just
    # correctness-checked)
    "dedup_cluster_assign_two_phase",
    "sequence_packing",
    # round-3 corpus-filter / RAG pack (span inverted index, bigram-LM
    # shuffle join, pure-map chunking)
    "dup_span_doc_fraction",
    "bigram_lm_perplexity",
    "rag_chunk_windows",
    # round-3 semantic/ingest/mixture pack (cluster-scoped pair join,
    # asymmetric batch-vs-corpus index probe, two-phase seeded shuffle)
    "semantic_dedup_pairs",
    "dedup_incremental_batch",
    "training_shuffle_order",
    # round-4 exact ML twins + sketch pack (Lloyd iteration, fixed-
    # quantizer IVF probe, count-min merge)
    "kmeans_lloyd_step",
    "ivf_ann_topk_fixed",
    "cms_heavy_users",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bdva-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warmup: run every headline plan once at sf0.001 so
    # the measured window times execution, not one-time JVM/codegen
    # compilation (whole-stage codegen compiles per plan shape; at the
    # 100 TB design point compile time is noise, at sf0.1 it would
    # dominate several queries).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        if name in CATALOG:
            CATALOG[name].spark(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in CATALOG:
            continue
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            CATALOG[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            # pair generators cache their signature frames; clear so
            # every run pays the full build (no warm-cache flattery)
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # Measured scaling curve (VERDICT r03 #3): one run per query at the
    # other scale factors, so the 100x claims rest on data, not just
    # plan-shape argument.  The per-query exponent is the log-log slope
    # between the two LARGEST measured SFs (the smallest is fixed-
    # overhead-dominated); sub-linear exponents mean constant overhead
    # still dominates at these sizes, n-squared pair generators are
    # expected near their blocked/banded bound, everything else should
    # sit at or below ~1.  Disable with SPARK_GRAFT_SCALING=0.
    scaling: dict[str, dict[str, float]] = {}
    exponents: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        base = os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata"
        extra = [s for s in ("0.001", "0.01") if s != sf]
        for name in HEADLINE:
            if name not in CATALOG:
                continue
            per = {sf: timings[name]}
            for s in extra:
                d = os.path.join(base, f"sf{s}")
                if not os.path.isdir(d):
                    continue
                t0 = time.perf_counter()
                CATALOG[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                per[s] = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
            scaling[name] = {k: per[k] for k in sorted(per, key=float)}
            sfs = sorted(per, key=float)
            if len(sfs) >= 2:
                s1, s2 = sfs[-2], sfs[-1]
                if per[s1] > 0 and per[s2] > 0:
                    exponents[name] = round(
                        math.log(per[s2] / per[s1]) / math.log(float(s2) / float(s1)),
                        2,
                    )

    total = round(sum(timings.values()), 3)
    # Key order is deliberate: the driver records only the TAIL of this
    # line, so the keys a reviewer needs most (per-query medians, the
    # scaling exponents, the headline total) come LAST; the bulky
    # per-SF map and spreads come first.  The complete payload is also
    # written to BENCH_FULL.json beside this script for the committed
    # record (SCALING.md carries the full per-SF table).
    payload = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "n_runs": N_RUNS,
        "spread": spread,
        "scaling": scaling,
        "queries": timings,
        "scaling_exponent": exponents,
        "value": total,
        "sf": float(sf),
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
            "w",
        ) as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries everything
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
