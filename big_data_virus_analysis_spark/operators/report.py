"""Cluster report + D3 hierarchy export.

Reference shape (KmeansVirus.scala:106-135 + exportJSON.php:12-45):
per-sample report rows ``cluster;label;[{"name":...,"size":...},...]``
then a 5-layer tree Main → Cluster → {Clean, Virus} → Sample → API leaf.

The reference collected everything to the driver, string-built JSON,
and round-tripped through PHP.  Here both artifacts are single
DataFrame plans: nested ``collect_list(struct(...))`` group-bys and one
``to_json`` at the end — the report writes distributed, the tree is a
one-row JSON document.

``size = total_features − (rank − 1)`` preserves the reference's
descending-rank weight (KmeansVirus.scala:109-111, with rank defined
deterministically — SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import label_decode


def sample_api_structs(
    assignments: DataFrame, vocab: DataFrame, total_features: int
) -> DataFrame:
    """Attach the per-sample API list.

    ``assignments``: (doc, cluster, label, indices: array<int>).
    ``vocab``: (token, rank) — broadcast lookup.
    Output: (doc, cluster, label, apis: array<struct<name,size>>),
    apis ordered by ascending index (= descending size).
    """
    exploded = assignments.select(
        "doc", "cluster", "label", F.explode("indices").alias("idx")
    )
    named = exploded.join(
        F.broadcast(vocab), exploded.idx == vocab.rank
    ).select(
        "doc",
        "cluster",
        "label",
        "idx",
        F.struct(
            F.col("token").alias("name"),
            (F.lit(total_features) - (F.col("rank") - 1)).cast("int").alias("size"),
        ).alias("api"),
    )
    return (
        named.groupBy("doc", "cluster", "label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("api")))),
                lambda s: s["api"],
            ).alias("apis")
        )
    )


def report_lines(samples: DataFrame) -> DataFrame:
    """Per-sample text rows ``cluster;label;[{"name":..,"size":..},..]``
    (format spec: reference readme.md:43-59, golden output.txt)."""
    return samples.select(
        "doc",
        F.concat_ws(
            ";",
            F.col("cluster").cast("string"),
            F.col("label").cast("string"),
            F.to_json("apis"),
        ).alias("line"),
    )


def d3_tree(samples: DataFrame) -> DataFrame:
    """One-row D3 circle-packing JSON (exportJSON.php:12-45 semantics).

    Main Container → Cluster #i → {Clean, Virus} → Sample → API leaves.
    Built with three nested collect_list group-bys; every level sorted
    for determinism.
    """
    per_sample = samples.select(
        "cluster",
        label_decode(F.col("label")).alias("class_name"),
        F.struct(
            F.concat(F.lit("Sample "), F.col("doc").cast("string")).alias("name"),
            F.col("apis").alias("children"),
        ).alias("sample"),
    )
    per_class = (
        per_sample.groupBy("cluster", "class_name")
        .agg(F.array_sort(F.collect_list("sample")).alias("samples"))
        .select(
            "cluster",
            F.struct(
                F.col("class_name").alias("name"), F.col("samples").alias("children")
            ).alias("class_node"),
        )
    )
    per_cluster = (
        per_class.groupBy("cluster")
        .agg(F.array_sort(F.collect_list("class_node")).alias("classes"))
        .select(
            "cluster",
            F.struct(
                F.concat(F.lit("Cluster #"), F.col("cluster").cast("string")).alias("name"),
                F.col("classes").alias("children"),
            ).alias("cluster_node"),
        )
    )
    # collect_list order is nondeterministic — sort by cluster id inside
    # the aggregate, then project the node out
    return per_cluster.agg(
        F.to_json(
            F.struct(
                F.lit("Main Container").alias("name"),
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cluster", "cluster_node"))),
                    lambda s: s["cluster_node"],
                ).alias("children"),
            )
        ).alias("tree_json")
    )
