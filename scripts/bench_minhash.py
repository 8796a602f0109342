"""MinHash signature-stage recall/cost table (VERDICT r03 #9).

Quantifies the k=32/8-band vs k=16/4-band trade on BOTH axes:

* COST — wall time of the full candidate-pair query at sf0.1 (median of
  3, noop sink), for the md5 family (oracle path) and the xxhash64
  family (scale path).  Signature arithmetic is k hash evaluations per
  gram, so halving k should halve the dominant stage if the arithmetic
  is compute-bound; if the times barely move, the stage is bound by
  gram materialization / memory traffic instead — that is the
  measurement the round-2/3 "one more push" discussion needed.
* RECALL — fraction of PLANTED near-duplicate pairs (token-replacement
  noise at several true-Jaccard levels) recovered by the banded join,
  against the theoretical 1-(1-j^r)^b curve.

Writes one JSON line; the table is committed into SCALING.md.

Usage: python scripts/bench_minhash.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_virus_analysis_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from big_data_virus_analysis_spark.session import get_spark  # noqa: E402
from big_data_virus_analysis_spark.sources.tables import load_table  # noqa: E402

N_RUNS = 3
CONFIGS = [(32, 8), (16, 4)]  # (k, bands); r = k/bands = 4 for both


def _median_time(fn) -> float:
    runs = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def _planted_fixture(spark, n_docs: int = 400, doc_len: int = 120):
    """Synthetic docs + one near-dup per base doc at varied noise rates.

    True 3-gram Jaccard per pair is computed exactly on the driver so
    recall can be bucketed by the real j, not the nominal noise rate.
    """
    rng = random.Random(1234)
    vocab = [f"tok{v}" for v in range(5000)]
    rows, pairs = [], []
    for i in range(n_docs):
        base = [rng.choice(vocab) for _ in range(doc_len)]
        rows.append((i, " ".join(base)))
        # noise rate cycles through levels that land j in ~[0.25, 0.95]
        rate = (0.01, 0.03, 0.06, 0.10, 0.18)[i % 5]
        dup = [
            (rng.choice(vocab) if rng.random() < rate else t) for t in base
        ]
        rows.append((100000 + i, " ".join(dup)))
        g = lambda toks: {tuple(toks[j : j + 3]) for j in range(len(toks) - 2)}
        ga, gb = g(base), g(dup)
        j = len(ga & gb) / len(ga | gb)
        pairs.append((i, 100000 + i, round(j, 3)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs, pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bdva-minhash-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    fixture, planted = _planted_fixture(spark)
    fixture = fixture.cache()
    fixture.count()

    out: dict[str, dict] = {}
    for k, bands in CONFIGS:
        cfg = f"k{k}_b{bands}"
        res: dict = {
            "time_md5": _median_time(
                lambda: minhash_lsh_pairs(docs, n=3, k=k, bands=bands)
            ),
            "time_xxhash64": _median_time(
                lambda: minhash_lsh_pairs(
                    docs, n=3, k=k, bands=bands, hash_method="xxhash64"
                )
            ),
        }
        spark.catalog.clearCache()
        got = {
            (r.doc_a, r.doc_b)
            for r in minhash_lsh_pairs(
                fixture, n=3, k=k, bands=bands, hash_method="xxhash64"
            ).collect()
        }
        spark.catalog.clearCache()
        # bucket recall by true Jaccard
        buckets: dict[str, list[int]] = {}
        for a, b, j in planted:
            key = f"j{int(j * 10) / 10:.1f}"
            buckets.setdefault(key, []).append(int((a, b) in got))
        r = k // bands
        res["recall_by_jaccard"] = {
            key: {
                "n": len(v),
                "measured": round(sum(v) / len(v), 3),
                "theory": round(
                    statistics.mean(
                        1 - (1 - j**r) ** bands
                        for a, b, j in planted
                        if f"j{int(j * 10) / 10:.1f}" == key
                    ),
                    3,
                ),
            }
            for key, v in sorted(buckets.items())
        }
        out[cfg] = res

    print(
        json.dumps(
            {
                "metric": "minhash_recall_cost",
                "unit": "sec",
                "sf_dir": sf_dir,
                "n_planted_pairs": len(planted),
                "configs": out,
            }
        )
    )


if __name__ == "__main__":
    main()
