"""The shared near-dup graph builder (operators/graph_edges.py) —
one construction, three consumers (r6 VERDICT directive #3)."""

from __future__ import annotations

from conftest import SF_DIR

from big_data_virus_analysis_spark.operators.caching import (
    release_tracked_caches,
)
from big_data_virus_analysis_spark.operators.graph_edges import (
    dup_graph_edges,
    dup_graph_edges_ctes,
)


def test_edge_frame_matches_sql_twin(spark, duck):
    """The Spark builder and the exported DuckDB CTE chain produce the
    identical edge set (the frames all three packs consume)."""
    spark_edges = sorted(
        (r.u, r.v) for r in dup_graph_edges(spark, SF_DIR).collect()
    )
    release_tracked_caches()
    duck_edges = sorted(
        (u, v)
        for u, v in duck.execute(
            dup_graph_edges_ctes() + " SELECT u, v FROM pr"
        ).fetchall()
    )
    assert len(spark_edges) > 0
    assert spark_edges == duck_edges


def test_three_consumers_share_the_builder():
    """PageRank (round6_ops), triangles/degrees (round6_ir), and
    clustering/transitivity (round6_graph3) all derive their edge
    frames from the ONE shared builder — function identity on the
    Spark side, literal CTE-prefix identity on the oracle side."""
    from big_data_virus_analysis_spark.plans import (
        round6_graph3,
        round6_ir,
        round6_ops,
    )

    assert round6_ir._dup_edges is dup_graph_edges
    assert round6_graph3._dup_edges is dup_graph_edges
    ctes = dup_graph_edges_ctes()
    assert round6_ir._SQL_DUP_EDGES == ctes
    assert round6_graph3._SQL_DUP_EDGES == ctes
    assert round6_ops._SQL_PAGERANK_DUP_GRAPH_EXACT.startswith(ctes)
    # constants consumed by docstrings/tests stay pinned to the shared
    # module's values
    assert (round6_ops._PR_GRAM_L, round6_ops._PR_DF_CAP) == (8, 64)
    assert round6_ops._PR_MIN_SHARED == 5
