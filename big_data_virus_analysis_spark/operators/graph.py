"""Iterative graph analytics as DataFrame loops: PageRank.

Complements the dedup pipeline's connected components
(`operators/dedup.py::dedup_clusters`, min-label propagation) with the
other canonical iterative-join algorithm.  Like everything else in this
engine there is no RDD code: one PageRank iteration is

    edges ⋈ ranks  →  per-destination contribution sum  →  rank update

i.e. a shuffle join keyed on the source plus a hash agg keyed on the
destination.  Spark reuses the edge table's partitioning across
iterations once it is cached, which is exactly the classic
"partition-the-links-once" PageRank recipe — expressed declaratively so
Catalyst/AQE still get to pick join strategies per iteration.

Determinism contract (for the DuckDB oracle): ranks are DOUBLE and every
per-edge contribution `rank / outdeg` is computed in IEEE double (same
bits in both engines), then cast to DECIMAL(28,12) *before* the sum so
accumulation is exact and order-independent; the damping update returns
to double with a fixed operation order.  The oracle unrolls the same
iterations as nested CTEs (`pagerank_oracle_sql`).

Scale notes (100 TB): the rank table is |V| rows (small next to |E|);
broadcast it when it fits, else AQE handles the shuffle join.  Lineage
grows linearly with iterations — for tens of iterations checkpoint (or
localCheckpoint) the rank table every few rounds to cut the plan; at the
5 iterations used by the catalog query the straight-line plan is fine.
Dangling nodes: the co-purchase graph below is symmetric (every node has
out-edges), so no dangling-mass redistribution term is needed; a general
deployment adds `0.85 * dangling_mass / N` to the update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .caching import tracked_cache

DAMPING = 0.85
RESET = 0.15

#: exact-accumulation type for per-edge contributions (both engines sum
#: DECIMAL(28,12) → DECIMAL(38,12) without overflow for |V| < 10^10)
_CONTRIB_DEC = "decimal(28,12)"


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct co-purchase edges: parts that share an order, both
    directions.  (order, part) is deduped first so a part appearing on
    several lines of one order contributes one edge, and the pair join
    is keyed on the order — the standard inverted-index self-join (same
    shape as dedup's shingle join, skew handled by AQE).  The deduped
    index is cached: both join branches otherwise replay the scan +
    dedup shuffle (no ReusedExchange once the join re-keys on the
    order — see the dedup.py materialize-once note)."""
    op = lineitem.select("l_orderkey", "l_partkey").dropDuplicates().transform(tracked_cache)
    a = op.alias("a")
    b = op.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .dropDuplicates()
    )


def pagerank(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """PageRank over an edge list (columns ``src``, ``dst``) with the
    decimal-contribution determinism contract described in the module
    docstring.  Returns (node, rank) with rank rounded to 6."""
    edges = edges.transform(tracked_cache)
    nodes = edges.select(F.col("src").alias("node")).dropDuplicates().transform(tracked_cache)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    zero = F.lit("0").cast(_CONTRIB_DEC)
    for _ in range(iterations):
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select(
                "dst",
                (F.col("rank") / F.col("outdeg")).cast(_CONTRIB_DEC).alias("contrib"),
            )
        )
        sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
        ranks = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (
                F.lit(RESET)
                + F.lit(DAMPING) * F.coalesce(F.col("s"), zero).cast("double")
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def pagerank_oracle_sql(iterations: int = 5) -> str:
    """DuckDB oracle: the same iterations unrolled as CTEs, with the
    identical double→decimal→double operation order."""
    base = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), outdeg AS (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
), r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes
)"""
    step = """, r{i} AS (
  SELECT n.node,
         0.15 + 0.85 * CAST(coalesce(s.s, CAST('0' AS DECIMAL(28,12))) AS DOUBLE)
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst,
           sum(CAST(r.rank / o.outdeg AS DECIMAL(28,12))) AS s
    FROM edges e
    JOIN outdeg o ON e.src = o.src
    JOIN r{p} r ON e.src = r.node
    GROUP BY e.dst
  ) s ON n.node = s.dst
)"""
    sql = base
    for i in range(1, iterations + 1):
        sql += step.format(i=i, p=i - 1)
    sql += f"\nSELECT node, round(rank, 6) AS rank FROM r{iterations}"
    return sql


def undirected_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct UNDIRECTED co-purchase edges, canonicalized src < dst —
    the half-size edge list triangle counting needs (each triangle then
    appears exactly once as s1 < s2 < s3)."""
    op = lineitem.select("l_orderkey", "l_partkey").dropDuplicates().transform(tracked_cache)
    a = op.alias("a")
    b = op.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .dropDuplicates()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over a canonical (src < dst) edge list —
    the standard two-join plan: wedges (a→b→c with a<b<c by
    construction) joined back against the edge list to close a→c.

    Scale shape: both joins are equi-joins on single node keys, so they
    hash-partition cleanly; the classic refinement for power-law graphs
    (order nodes by degree so high-degree nodes sit on the wedge tips)
    drops worst-case work and slots in here as a pre-ranking of the
    edge list without changing the plan shape.  AQE's skew-join
    splitting covers the moderate case.  Returns one row:
    ``n_triangles``."""
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"),
        F.col("e2.dst").alias("c"),
    )
    closed = wedges.join(
        e3, (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst"))
    )
    return closed.agg(F.count("*").alias("n_triangles"))


def bfs_hops(edges: DataFrame, source: int, max_hops: int = 3) -> DataFrame:
    """Breadth-first hop distance from ``source`` over a DIRECTED edge
    list (pass both directions for undirected semantics) — the frontier-
    expansion iterative pattern (vs PageRank's fixed-point iteration):
    each round extends known distances one hop through the edge list
    and keeps the minimum per node.

    Scale shape: per round, one shuffle join (frontier ⋈ edges on the
    frontier node) and one min-aggregate; the frontier is a node-keyed
    frame ≤ |V|.  Like PageRank, deep traversals checkpoint every few
    rounds to cut lineage.  Returns (node, hops) for reached nodes,
    hops ≤ max_hops."""
    dist = (
        edges.sparkSession.createDataFrame([(source, 0)], "node long, hops int")
    )
    for _ in range(max_hops):
        expanded = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
    return dist


def bfs_oracle_sql(source: int, max_hops: int = 3) -> str:
    """DuckDB oracle: the same frontier expansion unrolled as CTEs over
    the symmetric co-purchase edge list."""
    base = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey
), d0 AS (
  SELECT CAST({source} AS BIGINT) AS node, 0 AS hops
)"""
    step = """, d{i} AS (
  SELECT node, min(hops) AS hops FROM (
    SELECT node, hops FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d.hops + 1 AS hops
    FROM d{p} d JOIN edges e ON d.node = e.src
  ) GROUP BY node
)"""
    sql = base
    for i in range(1, max_hops + 1):
        sql += step.format(i=i, p=i - 1)
    sql += f"\nSELECT node, CAST(hops AS INT) AS hops FROM d{max_hops}"
    return sql
