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
