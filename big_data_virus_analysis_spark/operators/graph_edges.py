"""Shared near-duplicate document graph builder.

One construction, three graph-analytics consumers (r6 VERDICT
directive #3 — previously ``plans/round6_ops.py`` (PageRank),
``plans/round6_ir.py`` (triangles / degree distribution), and
``plans/round6_graph3.py`` (local clustering / transitivity) each
duplicated the gram-index edge derivation and its constants):

1. token 8-grams per document via ``split`` + ``slice`` (JVM-side,
   no Python UDF), deduped per document;
2. hot-gram cutoff: a gram appearing in more than ``DF_CAP`` documents
   is boilerplate and contributes quadratically many candidate pairs —
   drop it before pairing (the dedup family's hot-shingle discipline);
3. inverted-index self-join on the surviving grams, ``u < v``
   orientation, pair count >= ``MIN_SHARED`` keeps an edge.

100 TB shape: the gram index shuffles once on ``gram`` (the cutoff is
a partial agg over the same key), the pair join is per-gram quadratic
bounded by ``DF_CAP``, and the edge aggregation shuffles on the pair
key.  The gram frame is tracked-cached because both sides of the
self-join scan it; consumers tracked-cache the edge output when they
run multiple passes over it (degree + iterations).

The DuckDB twin of the same construction is exported as CTE text so
every consumer's oracle embeds literally identical SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .caching import tracked_cache

#: token n-gram length for the shingle overlap graph
GRAM_L = 8
#: hot-gram document-frequency cutoff (boilerplate guard)
DF_CAP = 64
#: minimum shared (deduped) grams for an edge
MIN_SHARED = 5


def dup_graph_edges(
    spark: SparkSession,
    sf_dir: str,
    *,
    gram_l: int = GRAM_L,
    df_cap: int = DF_CAP,
    min_shared: int = MIN_SHARED,
    keep_shared: bool = False,
) -> DataFrame:
    """Undirected near-dup edge list over ``documents``: one (u, v)
    row per edge with ``u < v`` (plus the ``shared`` gram count as an
    edge weight when ``keep_shared`` — the round-9 MSF consumer)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    positions = F.when(
        F.size("_toks") >= gram_l,
        F.sequence(F.lit(1), F.size("_toks") - gram_l + 1),
    ).otherwise(F.array().cast("array<int>"))
    grams = tracked_cache(
        toks.select("doc_id", F.explode(positions).alias("pos"), "_toks")
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("_toks", F.col("pos"), gram_l)).alias(
                "gram"
            ),
        )
        .distinct()
    )
    cool = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .where(F.col("gdf") <= df_cap)
        .select("gram")
    )
    capped = grams.join(cool, "gram")
    return (
        capped.alias("a")
        .join(capped.alias("b"), "gram")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select("u", "v", *(["shared"] if keep_shared else []))
    )


def dup_graph_edges_ctes(
    *,
    gram_l: int = GRAM_L,
    df_cap: int = DF_CAP,
    min_shared: int = MIN_SHARED,
    keep_shared: bool = False,
) -> str:
    """DuckDB CTE chain ending in ``pr(u, v)`` — the exact relational
    twin of :func:`dup_graph_edges`.  Consumers append further CTEs:
    ``dup_graph_edges_ctes() + ", edges AS (...) SELECT ..."``."""
    shared_col = ", count(*) AS shared" if keep_shared else ""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{gram_l}-1], ' ') AS gram
  FROM t, UNNEST(range(1, greatest(len(toks) - {gram_l} + 2, 1))) AS u(i)
), cool AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) <= {df_cap}
), gc AS (
  SELECT g.doc_id, g.gram FROM g JOIN cool USING (gram)
), pr AS (
  SELECT a.doc_id AS u, b.doc_id AS v{shared_col}
  FROM gc a JOIN gc b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
)"""
