"""Vectorized (Arrow + NumPy) similarity search.

The expression-based fold in ``similarity.py`` keeps everything in JVM
codegen — right for narrow vectors and exact oracles.  For wide vectors
(≥ 256 dims) a BLAS matmul over Arrow batches wins; this module is that
path: ``mapInPandas`` with a per-batch partial top-k followed by an
exact global top-k window — the standard two-phase top-k that never
materializes the full similarity matrix.

The query matrix rides to executors inside the closure (it is the small
side — same role as a broadcast join build side).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cosine_topk_numpy(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors via Arrow-batched matmul.

    Output: ``(query_id, cand_id, sim, rank)`` — same shape as
    ``similarity.cosine_topk`` (sims may differ in the last float bits:
    BLAS accumulation order ≠ sequential fold).
    """
    qpdf = (
        embeddings.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .toPandas()
    )
    q_ids = qpdf["vec_id"].to_numpy()
    qm = np.vstack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm.T  # (n_cand, n_q)
            cand_ids = pdf["vec_id"].to_numpy()
            out = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = cand_ids != qid
                ids, vals = cand_ids[mask], col[mask]
                take = min(k, len(vals))
                if take == 0:
                    continue
                idx = np.argpartition(-vals, take - 1)[:take]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "cand_id": ids[idx], "sim": np.round(vals[idx], 6)}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        partial_topk, schema="query_id long, cand_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "sim", "rank")
    )


def blocked_near_dup_candidates(
    embeddings: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    margin: float = 1e-6,
) -> DataFrame:
    """Exact-recall candidate pairs for a thresholded cosine join via
    triangle block partitioning + per-task BLAS matmul.

    Dense low-threshold similarity join is inherently O(n²) dot
    products — no sound candidate pruning exists at e.g. θ=0.4, where
    sign-LSH bit agreement is ~0.63/plane (no (planes, tables) point
    gives recall AND pruning).  The scalable EXACT shape is therefore to
    distribute the n² work evenly and vectorize it:

    * each vector lands in block ``g = vec_id mod B``;
    * it is replicated to the B block-pairs ``(min(g,k), max(g,k))`` —
      every pair of vectors meets in exactly one of the B(B+1)/2 tasks;
    * each task matmuls its two blocks (float64 BLAS — ~100× the
      per-row fold) and emits id pairs with sim ≥ threshold − margin.

    Replication factor is B per side, so pick B ≈ sqrt(2·target_tasks):
    B=32 → 528 even tasks on a 1000-executor cluster, each holding
    2·n/B vectors — bounded memory, no skew, no driver collect.

    ``margin`` must cover the half-ulp-of-round-6 boundary (the exact
    operator rounds before thresholding) plus BLAS-vs-fold float noise;
    the JVM verify downstream recomputes the canonical similarity, so
    candidates only need superset-recall, never precision.

    Output: ``(vec_a, vec_b)`` with vec_a < vec_b, superset of the
    true ≥ threshold pairs.
    """
    b_lit = F.lit(n_blocks)
    g = F.pmod(F.col("vec_id"), b_lit).cast("int")
    pairs = F.array(
        *[
            F.struct(
                F.least(g, F.lit(k)).alias("bi"),
                F.greatest(g, F.lit(k)).alias("bj"),
            )
            for k in range(n_blocks)
        ]
    )
    exploded = (
        embeddings.select("vec_id", "embedding", g.alias("g"))
        .select("vec_id", "embedding", "g", F.explode(pairs).alias("bp"))
        .select("vec_id", "embedding", "g", "bp.bi", "bp.bj")
        # k == g contributes (g, g) once; nothing else collides
        .dropDuplicates(["vec_id", "bi", "bj"])
    )
    cutoff = threshold - margin

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        if pdf.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            mat = mat / norms  # zero vectors -> nan rows, never pass the cutoff
        ids = pdf["vec_id"].to_numpy()
        gcol = pdf["g"].to_numpy()
        li, ri = np.flatnonzero(gcol == bi), np.flatnonzero(gcol == bj)
        sims = mat[li] @ mat[ri].T
        with np.errstate(invalid="ignore"):
            hit = sims >= cutoff
        a_idx, b_idx = np.nonzero(hit)
        va, vb = ids[li][a_idx], ids[ri][b_idx]
        if bi == bj:
            # symmetric matrix: every unordered pair appears twice —
            # keep the canonical orientation (also drops the diagonal)
            keep = va < vb
            va, vb = va[keep], vb[keep]
        else:
            # disjoint blocks: each pair appears once, in whichever
            # orientation the blocks landed — canonicalize by value
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": va, "vec_b": vb})

    return exploded.groupBy("bi", "bj").applyInPandas(
        block_pairs, schema="vec_a long, vec_b long"
    )
