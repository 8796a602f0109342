"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation of
every output column, no write cost, no driver collect).  Each query runs
N_RUNS times; the headline number is the per-query MEDIAN (single-digit
-second measurements are variance-dominated, so one run can't separate a
plan change from scheduler noise), with per-query [min, max] spread
reported alongside.

Round-5 hygiene (the r4 "regressions" were harness-state, not code —
scripts/bisect_r4_regressions.py showed all three suspect queries at or
below their r3 medians in a fresh JVM):

* tracked caches are RELEASED and a JVM GC is hinted between queries,
  so a long 33-query session doesn't inflate late measurements with
  accumulated cache entries and Py4J-pinned plan objects;
* every scale factor is measured the same way — warm-up run, then
  median of N_RUNS — so the fitted log-log exponents compare
  like-for-like (previously the base SF was a warm median but the
  smaller SFs were single cold runs, biasing exponents low);
* the FINAL stdout line is a compact (<1800 chars) JSON summary —
  medians, total, worst exponent — because the driver records only the
  last 2000 chars of output.  The complete payload (spreads, per-SF
  scaling map) goes to BENCH_FULL.json and an earlier stdout line.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_virus_analysis_spark.operators.caching import (  # noqa: E402
    release_tracked_caches,
)
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
    # round-5 composed canary (ingest -> minhash -> pairs -> components
    # -> survivors -> retention, one plan)
    "dedup_pipeline_e2e",
    # round-5 similarity additions (weighted inverted-index pairs,
    # PQ-ADC code search)
    "tfidf_cosine_pairs",
    "pq_adc_topk_fixed",
    # round-5 layout/ML/stats additions (double global-rank zone audit,
    # one-plan NB train+score, prefix-sum rank test over a join)
    "zone_map_pruning_audit",
    "nb_gaussian_confusion",
    "mann_whitney_u_test",
    # round-6 additions (ExactSubstr span dedup over the gram inverted
    # index; PageRank iterations over the shingle-overlap graph; the
    # composed curation canary)
    "suffix_dedup_spans",
    "pagerank_dup_graph_exact",
    "corpus_curation_e2e",
    # round-6 session-2 additions (wedge-join link prediction over the
    # min-support graph; the bucketed epsilon-band join primitive)
    "adamic_adar_linkpred",
    "band_join_prices",
    # round-6 session-3 additions (market-basket self-join CF; LM
    # retrieval over the inverted index; rank-stat test via two
    # prefix-sum passes + value joins)
    "item_item_topk_recs",
    "dirichlet_ql_retrieval",
    "spearman_price_quantity",
    # composed canary #3 (five dashboard legs in one plan)
    "bi_dashboard_e2e",
]


def _reset(spark) -> None:
    """Between-measurement hygiene: drop every cache and hint a JVM GC
    so a query's measurement never pays for its predecessors' state."""
    release_tracked_caches()
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


def _run_once(spark, name: str, d: str) -> float:
    t0 = time.perf_counter()
    CATALOG[name].spark(spark, d).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    _reset(spark)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bdva-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in CATALOG]

    # Steady-state warmup: run every headline plan once at sf0.001 so
    # the measured window times execution, not one-time JVM/codegen
    # compilation (whole-stage codegen compiles per plan shape; at the
    # 100 TB design point compile time is noise, at sf0.1 it would
    # dominate several queries).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        _run_once(spark, name, "/root/testdata/sf0.001")

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        runs = [_run_once(spark, name, sf_dir) for _ in range(N_RUNS)]
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # Measured scaling curve: median of N_RUNS at EVERY scale factor
    # (the sf0.001 warm-up above doubles as each query's warm-up run),
    # so the 100x claims rest on like-for-like medians.  The per-query
    # exponent is the log-log slope between the two LARGEST measured
    # SFs (the smallest is fixed-overhead-dominated); sub-linear
    # exponents mean constant overhead still dominates at these sizes,
    # n-squared pair generators are expected near their blocked/banded
    # bound, everything else should sit at or below ~1.  Disable with
    # SPARK_GRAFT_SCALING=0.
    # Optional fourth decade: $SPARK_GRAFT_SF1_DIR points at a synthetic
    # sf1 built by scripts/make_sf1.py (10x-replicated sf0.1, offset
    # ids).  Only the expensive family runs there — the queries whose
    # scale behaviour matters most — so their exponents are fitted over
    # sf0.001→1, three decades.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "")
    sf1_family = {
        "dedup_cluster_assign_two_phase",
        "dedup_incremental_batch",
        "dup_span_doc_fraction",
        "minhash_lsh_pairs",
        "semantic_dedup_pairs",
        "dedup_pipeline_e2e",
    }
    scaling: dict[str, dict[str, float]] = {}
    scaling_spread: dict[str, dict[str, list[float]]] = {}
    exponents: dict[str, float] = {}
    exponent_interval: dict[str, list[float]] = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        base = os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata"
        extra = [s for s in ("0.001", "0.01") if s != sf]
        for name in names:
            per = {sf: timings[name]}
            per_spread = {sf: spread[name]}
            for s in extra:
                d = os.path.join(base, f"sf{s}")
                if not os.path.isdir(d):
                    continue
                runs = [_run_once(spark, name, d) for _ in range(N_RUNS)]
                per[s] = round(statistics.median(runs), 3)
                per_spread[s] = [round(min(runs), 3), round(max(runs), 3)]
            if sf1_dir and name in sf1_family and os.path.isdir(sf1_dir):
                runs = [_run_once(spark, name, sf1_dir) for _ in range(N_RUNS)]
                per["1"] = round(statistics.median(runs), 3)
                per_spread["1"] = [round(min(runs), 3), round(max(runs), 3)]
            scaling[name] = {k: per[k] for k in sorted(per, key=float)}
            scaling_spread[name] = {
                k: per_spread[k] for k in sorted(per_spread, key=float)
            }
            sfs = sorted(per, key=float)
            if len(sfs) >= 2:
                s1, s2 = sfs[-2], sfs[-1]
                denom = math.log(float(s2) / float(s1))
                if per[s1] > 0 and per[s2] > 0:
                    exponents[name] = round(
                        math.log(per[s2] / per[s1]) / denom, 2
                    )
                    # r5 judge directive: one exponent number, WITH its
                    # spread — the interval brackets the fit over the
                    # run-to-run min/max at the two fitted SFs, so
                    # round-over-round drift inside the interval is
                    # noise, outside it is a finding
                    lo1, hi1 = per_spread[s1]
                    lo2, hi2 = per_spread[s2]
                    if hi1 > 0 and lo2 > 0:
                        exponent_interval[name] = [
                            round(math.log(lo2 / hi1) / denom, 2),
                            round(math.log(hi2 / lo1) / denom, 2),
                        ]

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "n_runs": N_RUNS,
        "spread": spread,
        "scaling": scaling,
        "scaling_spread": scaling_spread,
        "queries": timings,
        "scaling_exponent": exponents,
        "exponent_interval": exponent_interval,
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
    # Full payload first (committed record lives in BENCH_FULL.json)...
    print(json.dumps(payload))
    # ...then a compact summary as the VERY LAST line: the driver keeps
    # only the final 2000 chars of stdout, so this line must stand
    # alone and parse.  Budget: ~35 query medians at ~30 chars each
    # stays well under 1800; if the catalog ever outgrows that, the
    # medians are truncated to the most expensive entries.
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
        "n_runs": N_RUNS,
        "worst_exponent": max(exponents.values()) if exponents else None,
        "worst_exponent_interval": (
            exponent_interval.get(max(exponents, key=exponents.get))
            if exponents
            else None
        ),
        "queries": timings,
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1800:
        keep = sorted(timings, key=timings.get, reverse=True)[: max(1, len(compact["queries"]) - 5)]
        compact["queries"] = {k: timings[k] for k in keep}
        compact["queries_truncated_to_top"] = len(keep)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
