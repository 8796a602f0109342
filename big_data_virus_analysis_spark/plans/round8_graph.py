"""Round-8 graph pack — cohesion structure over the shared near-dup
document graph (``operators/graph_edges.py``: gram inverted index,
hot-gram cap, min-shared support — one builder, now six consumers).

* ``ktruss_edge_support`` — per-edge triangle support (number of
  common neighbors of the endpoints) aggregated into a support
  histogram plus the surviving edge counts of the 3-truss and 4-truss
  (support ≥ k−2; Cohen 2008, "Trusses: cohesive subgraphs for social
  network analysis").  Edge support is THE peel key of truss
  decomposition; one exact support pass is the honest oracle-able unit
  (the full peel iterates — same policy as the k-core/PageRank exact
  rounds).
* ``rich_club_coefficient`` — φ(k) = 2·E_k / (k·(k−1)) for the top-8
  and top-16 nodes by degree (deterministic (deg desc, node asc)
  ranking): do high-degree documents preferentially connect to each
  other (boilerplate families) or spread?  Both k legs ride one
  broadcast of the 16-row rank frame.
* ``jaccard_link_similarity`` — neighborhood Jaccard for EXISTING
  edges: |N(u)∩N(v)| / (deg(u)+deg(v)−|N(u)∩N(v)|), top-15 by
  (jaccard desc, u, v) via orderBy+limit.  The link-homophily audit:
  near-1 edges are redundant (their endpoints are interchangeable in
  the dup cluster), near-0 edges are bridges.

100 TB shape: everything is bounded by the upstream hot-gram cap —
the common-neighbor join is adjacency ⋈ adjacency on the pivot node
(per-node work ≤ deg², deg capped by DF_CAP-bounded pair generation),
the rank frame is 16 rows, and the histograms are tiny hash aggs.
The edge + adjacency frames are tracked-cached (every query here reads
them ≥ 2×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import graph_edges
from ..operators.caching import tracked_cache
from .catalog import QuerySpec

_RICH_KS = (8, 16)
_JACC_TOPK = 15


def _adjacency(spark: SparkSession, sf_dir: str):
    edges = tracked_cache(graph_edges.dup_graph_edges(spark, sf_dir))
    adj = tracked_cache(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    return edges, adj


_SQL_ADJ_CTES = (
    graph_edges.dup_graph_edges_ctes()
    + """, adj AS (
  SELECT u AS node, v AS nbr FROM pr
  UNION ALL
  SELECT v AS node, u AS nbr FROM pr
)"""
)


def _edge_support(edges: DataFrame, adj: DataFrame) -> DataFrame:
    """(u, v, support): common-neighbor count per existing edge."""
    return (
        edges.join(
            adj.select(F.col("node").alias("u"), F.col("nbr").alias("w1")), "u"
        )
        .join(
            adj.select(F.col("node").alias("v"), F.col("nbr").alias("w2")),
            "v",
        )
        .where(F.col("w1") == F.col("w2"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
    )


_SQL_EDGE_SUPPORT_CTE = """, sup AS (
  SELECT e.u, e.v, count(*) AS support
  FROM pr e
  JOIN adj a ON a.node = e.u
  JOIN adj b ON b.node = e.v AND b.nbr = a.nbr
  GROUP BY e.u, e.v
)"""


def _q_ktruss_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, adj = _adjacency(spark, sf_dir)
    sup = _edge_support(edges, adj)
    # triangle-free edges have support 0 — they never appear in the
    # wedge join, so re-attach them via a left join before histogramming
    full = tracked_cache(
        edges.join(sup, ["u", "v"], "left").select(
            F.coalesce("support", F.lit(0)).alias("support")
        )
    )
    # total edge count as a 1-row-agg broadcast (r8 VERDICT nit: was a
    # driver-side full.count(); same value, repo convention, no collect)
    tot = full.agg(F.count(F.lit(1)).alias("total_edges"))
    return (
        full.groupBy("support")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("support").cast("int").alias("support"),
            "n_edges",
            "total_edges",
            (F.col("support") >= 1).alias("in_3truss"),
            (F.col("support") >= 2).alias("in_4truss"),
        )
        .orderBy("support")
    )


_SQL_KTRUSS_EDGE_SUPPORT = (
    _SQL_ADJ_CTES
    + _SQL_EDGE_SUPPORT_CTE
    + """, alledges AS (
  SELECT coalesce(s.support, 0) AS support
  FROM pr e LEFT JOIN sup s ON e.u = s.u AND e.v = s.v
), tot AS (
  SELECT count(*) AS total_edges FROM alledges
)
SELECT CAST(support AS INT) AS support,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(total_edges AS BIGINT) AS total_edges,
       support >= 1 AS in_3truss,
       support >= 2 AS in_4truss
FROM alledges CROSS JOIN tot
GROUP BY support, total_edges
ORDER BY support
"""
)


def _q_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, adj = _adjacency(spark, sf_dir)
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # limit-then-rank discipline: the global row_number runs over the
    # 16-row TakeOrderedAndProject output only (plan-lint auto-cleared)
    rich = (
        deg.orderBy(F.desc("deg"), F.asc("node"))
        .limit(max(_RICH_KS))
        .select(
            "node",
            F.row_number()
            .over(Window.orderBy(F.desc("deg"), F.asc("node")))
            .alias("rank"),
        )
    )
    ru = rich.select(F.col("node").alias("u"), F.col("rank").alias("rank_u"))
    rv = rich.select(F.col("node").alias("v"), F.col("rank").alias("rank_v"))
    marked = edges.join(F.broadcast(ru), "u").join(F.broadcast(rv), "v")
    counts = marked.agg(
        *[
            F.sum(
                (
                    (F.col("rank_u") <= k) & (F.col("rank_v") <= k)
                ).cast("bigint")
            ).alias(f"e{k}")
            for k in _RICH_KS
        ]
    )
    rows = None
    for k in _RICH_KS:
        leg = counts.select(
            F.lit(k).alias("k"),
            F.coalesce(F.col(f"e{k}"), F.lit(0)).alias("n_rich_edges"),
            F.round(
                2.0 * F.coalesce(F.col(f"e{k}"), F.lit(0)).cast("double")
                / (k * (k - 1)),
                6,
            ).alias("phi"),
        )
        rows = leg if rows is None else rows.unionByName(leg)
    return rows.orderBy("k")


_SQL_RICH_CLUB_COEFFICIENT = (
    _SQL_ADJ_CTES
    + f""", deg AS (
  SELECT node, count(*) AS deg FROM adj GROUP BY node
), rich AS (
  SELECT node, row_number() OVER (ORDER BY deg DESC, node ASC) AS rank
  FROM deg
  ORDER BY deg DESC, node ASC LIMIT {max(_RICH_KS)}
), marked AS (
  SELECT ru.rank AS rank_u, rv.rank AS rank_v
  FROM pr e JOIN rich ru ON e.u = ru.node JOIN rich rv ON e.v = rv.node
), counts AS (
  SELECT
    {", ".join(f"coalesce(sum(CASE WHEN rank_u <= {k} AND rank_v <= {k} THEN 1 END), 0) AS e{k}" for k in _RICH_KS)}
  FROM marked
)
{" UNION ALL ".join(f"SELECT {k} AS k, CAST(e{k} AS BIGINT) AS n_rich_edges, round(2.0 * e{k} / ({k} * ({k} - 1)), 6) AS phi FROM counts" for k in _RICH_KS)}
ORDER BY k
"""
)


def _q_jaccard_link_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, adj = _adjacency(spark, sf_dir)
    sup = _edge_support(edges, adj)
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        edges.join(sup, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.coalesce("support", F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce("support", F.lit(0)).cast("double")
                / (
                    F.col("deg_u") + F.col("deg_v") - F.coalesce("support", F.lit(0))
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), F.asc("u"), F.asc("v")
    ).limit(_JACC_TOPK)


_SQL_JACCARD_LINK_SIMILARITY = (
    _SQL_ADJ_CTES
    + _SQL_EDGE_SUPPORT_CTE
    + f""", deg AS (
  SELECT node, count(*) AS deg FROM adj GROUP BY node
)
SELECT e.u, e.v,
       CAST(coalesce(s.support, 0) AS BIGINT) AS n_common,
       round(CAST(coalesce(s.support, 0) AS DOUBLE)
             / (du.deg + dv.deg - coalesce(s.support, 0)), 6) AS jaccard
FROM pr e
LEFT JOIN sup s ON e.u = s.u AND e.v = s.v
JOIN deg du ON du.node = e.u
JOIN deg dv ON dv.node = e.v
ORDER BY jaccard DESC, e.u ASC, e.v ASC
LIMIT {_JACC_TOPK}
"""
)


SPECS: dict[str, QuerySpec] = {
    "ktruss_edge_support": QuerySpec(
        _q_ktruss_edge_support,
        _SQL_KTRUSS_EDGE_SUPPORT,
        "per-edge triangle support histogram + 3/4-truss survival over "
        "the shared near-dup graph (the truss-decomposition peel key, "
        "one exact pass)",
    ),
    "rich_club_coefficient": QuerySpec(
        _q_rich_club_coefficient,
        _SQL_RICH_CLUB_COEFFICIENT,
        "rich-club coefficient phi(k) among the top-8/top-16 degree "
        "documents (16-row broadcast rank frame, deterministic "
        "tiebreaks)",
    ),
    "jaccard_link_similarity": QuerySpec(
        _q_jaccard_link_similarity,
        _SQL_JACCARD_LINK_SIMILARITY,
        "neighborhood Jaccard of existing near-dup edges, top-15 "
        "(redundant-edge vs bridge audit; shares the edge-support "
        "join with ktruss_edge_support)",
    ),
}
