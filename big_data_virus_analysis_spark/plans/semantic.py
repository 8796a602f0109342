"""SemDeDup pack: cluster-scoped semantic deduplication over the
embedding column.

The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public): assign
every embedding to a coarse cluster, then search for near-duplicate
pairs ONLY within a cluster, keeping one representative per duplicate
group.  Clustering bounds the pair search: with C balanced clusters the
candidate volume drops from n²/2 to n²/(2C) — at web scale C is ~10⁵,
so the per-cluster blocks are small enough for exact scoring.

Here the coarse quantizer is the deterministic per-label nearest-
centroid assignment shared with the RAG pack
(plans/rag.py::assign_nearest_centroid) — no ML training, so both
queries carry exact DuckDB oracles end-to-end (the trained-quantizer
variant of the same shape is ivf_ann_topk).

Plan shape at 100 TB: the centroid table broadcasts (C × dim doubles);
the corpus streams once to get (vec_id, cluster); the pair join
shuffles on the cluster id — a plain equi-join key.  Cluster-size skew
is the scale risk (one mega-cluster re-creates the quadratic blowup),
handled the same way the text near-dup stack handles hot shingles:
raise C so clusters stay bounded, and AQE skew-join splits stragglers.

* ``semantic_dedup_pairs`` — within-cluster cosine pairs at/above the
  rounded threshold, ``vec_a < vec_b``.
* ``semantic_dedup_survivors`` — the greedy keep-lowest-id rule: a
  vector is dropped iff it has a smaller-id near-duplicate in its
  cluster; output is the deduplicated corpus (vec_id, cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..sources.tables import load_table
from .catalog import QuerySpec
from .rag import SQL_CENTROID_ASSIGN_BODY, assign_nearest_centroid

_TAU = 0.4  # rounded-cosine threshold (matches embedding_near_dup's)


def _clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return assign_nearest_centroid(emb).select(
        "vec_id", "embedding", F.col("clabel").alias("cluster")
    )


def _pairs(clustered: DataFrame) -> DataFrame:
    # materialize the (narrow) assignment once: both self-join branches
    # would otherwise replay the centroid argmin (AQE defeats
    # ReusedExchange matching — see operators/dedup.py)
    clustered = clustered.cache()
    a = clustered.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        "cluster",
    )
    b = clustered.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        "cluster",
    )
    return (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", F.round(cosine_similarity(F.col("ea"), F.col("eb")), 6))
        .where(F.col("sim") >= _TAU)
        .select("cluster", "vec_a", "vec_b", "sim")
    )


def _q_semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(_clustered(spark, sf_dir))


#: cluster assignment + within-cluster cosine pairs — ends with a
#: ``pairs(cluster, vec_a, vec_b, sim)`` CTE
_SQL_PAIRS_BODY = SQL_CENTROID_ASSIGN_BODY + """
, norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM elems GROUP BY vec_id
), dots AS (
  SELECT ba.clabel AS cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
         sum(a.x * b.x) AS dot
  FROM elems a
  JOIN best ba ON a.vec_id = ba.vec_id
  JOIN best bb ON ba.clabel = bb.clabel
  JOIN elems b ON b.vec_id = bb.vec_id AND b.i = a.i
  WHERE a.vec_id < b.vec_id
  GROUP BY 1, 2, 3
), pairs AS (
  SELECT cluster, vec_a, vec_b,
         round(dot / (na.nrm * nb.nrm), 6) AS sim
  FROM dots
  JOIN norms na ON vec_a = na.vec_id
  JOIN norms nb ON vec_b = nb.vec_id
  WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.4
)
"""

_SQL_SEMANTIC_DEDUP_PAIRS = _SQL_PAIRS_BODY + """
SELECT cluster, vec_a, vec_b, sim FROM pairs
"""


def _q_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    clustered = _clustered(spark, sf_dir)
    dropped = _pairs(clustered).select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        clustered.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cluster")
    )


_SQL_SEMANTIC_DEDUP_SURVIVORS = _SQL_PAIRS_BODY + """
SELECT b.vec_id, b.clabel AS cluster
FROM best b
WHERE b.vec_id NOT IN (SELECT vec_b FROM pairs)
"""


SPECS: dict[str, QuerySpec] = {
    "semantic_dedup_pairs": QuerySpec(
        _q_semantic_dedup_pairs,
        _SQL_SEMANTIC_DEDUP_PAIRS,
        "SemDeDup: within-cluster cosine near-dup pairs (broadcast "
        "centroids, equi-join on cluster id — n²/C candidate volume)",
    ),
    "semantic_dedup_survivors": QuerySpec(
        _q_semantic_dedup_survivors,
        _SQL_SEMANTIC_DEDUP_SURVIVORS,
        "SemDeDup survivors: greedy keep-lowest-id within each cluster "
        "(anti-join on the dropped side)",
    ),
}
