"""Shared near-duplicate document graph builder.

One construction, three graph-analytics consumers (r6 VERDICT
directive #3 — previously ``plans/round6_ops.py`` (PageRank),
``plans/round6_ir.py`` (triangles / degree distribution), and
``plans/round6_graph3.py`` (local clustering / transitivity) each
duplicated the gram-index edge derivation and its constants):

1. token 8-grams per document via ``split`` + ``slice`` (JVM-side,
   no Python UDF), deduped per document NARROWLY — ``array_distinct``
   over the per-doc gram array before exploding, so dedup costs no
   shuffle (a ``SELECT DISTINCT`` after explode would);
2. hot-gram cutoff: a gram appearing in more than ``DF_CAP`` documents
   is boilerplate and contributes quadratically many candidate pairs —
   drop it BEFORE any per-gram doc list is collected (the dedup
   family's hot-shingle discipline; the count filter runs first so a
   boilerplate gram in millions of documents never materializes a
   million-element aggregation buffer);
3. surviving grams collect their ≤ ``DF_CAP`` doc ids per gram and the
   candidate pairs are generated as a BOUNDED array comprehension
   (``u < v``, ≤ C(DF_CAP, 2) = 2016 structs per gram) — a narrow
   projection replacing the inverted-index self-join; pair count
   >= ``MIN_SHARED`` keeps an edge.

100 TB shape: three shuffles total — the gram-count partial agg, the
survivor join (whose output keeps the gram hash partitioning, so the
``collect_list`` aggregate that follows needs NO further exchange),
and the final pair aggregation.  The quadratic step is in-memory per
gram and capped by ``DF_CAP``; the gram frame is recomputed (not
cached) for its two consumers — the narrow explode is cheaper than
materializing the exploded frame (r11, guide §5); consumers
tracked-cache the edge output when they run multiple passes over it
(degree + iterations).

The DuckDB twin of the same construction is exported as CTE text so
every consumer's oracle embeds literally identical SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fan_out, load_table

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
    # r11 optimization (guide §2.5 input skew): documents is one
    # parquet file at bench scale → one input split, so the gram
    # build (split + per-position slice/concat + array_distinct +
    # explode — the corpus-sized compute of EVERY graph consumer) ran
    # on a single core.  fan_out spreads the narrow pre-explosion
    # rows; its partition-count guard makes it a no-op at the 100-TB
    # design point where the scan already has thousands of splits.
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    # per-doc gram set built narrowly: transform over start positions,
    # then array_distinct — the within-doc dedup a post-explode
    # SELECT DISTINCT would otherwise pay a full shuffle for
    gram_arr = F.expr(
        f"CASE WHEN size(_toks) >= {gram_l} THEN "
        f"array_distinct(transform(sequence(1, size(_toks) - {gram_l} + 1), "
        f"i -> concat_ws(' ', slice(_toks, i, {gram_l})))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    # r11 optimization (guide §5 — cache only when recompute is dearer):
    # the gram frame was tracked_cache'd for its two consumers (count
    # agg + survivor join), but the explode is a cheap narrow transform
    # of a much SMALLER source — materializing the exploded frame costs
    # more than recomputing it, at bench scale (measured: cached build
    # 1.54 s vs recompute 1.14 s, the cache write alone ~0.4 s) and at
    # the 100-TB point (a second fully-parallel scan+explode vs writing
    # and re-reading a frame ~50× the source).  Each consumer fuses its
    # own explode into its shuffle's map stage.
    grams = toks.select("doc_id", F.explode(gram_arr).alias("gram"))
    cool = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .where(F.col("gdf") <= df_cap)
        .select("gram")
    )
    # survivor join first (hot grams never reach the list aggregate),
    # then collect the ≤ df_cap doc ids per gram — the join output is
    # already hash-partitioned on gram, so this agg adds no exchange —
    # and generate u < v pairs as a bounded array comprehension
    pairs = (
        grams.join(cool, "gram")
        .groupBy("gram")
        .agg(F.collect_list("doc_id").alias("_ds"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(_ds, x -> "
                    "transform(filter(_ds, y -> y > x), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("_p")
        )
    )
    return (
        pairs.groupBy(F.col("_p.u").alias("u"), F.col("_p.v").alias("v"))
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
