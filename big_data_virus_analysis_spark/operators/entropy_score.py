"""Cluster-quality scoring: weighted average cluster entropy.

The reference computed this with ``groupByKey`` + in-closure histograms
(costlyWeightedAveEntropyScore, reference SVMDT.scala:253-285) — a full
shuffle of raw label values.  Here it is a two-level hash aggregate plus
a cluster-partitioned window:

  groupBy(cluster, label).count()          [1 shuffle, partial agg]
  sum(count) over (partition by cluster)   [reuses the same partitioning]
  Σ_rows -p·ln(p)·s  /  n                  [scalar agg]

which shuffles only (cluster, label, count) rows — label-cardinality ×
cluster-count rows, not the corpus.  Natural log deliberately (the
reference's cluster entropy uses ln while its IG uses log2 —
SVMDT.scala:296 vs FeatureSelectionCloud.scala:351).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def label_histogram(assignments: DataFrame, cluster_col: str, label_col: str) -> DataFrame:
    """``(cluster, label, cnt)`` — replaces groupByKey+closure histograms."""
    return assignments.groupBy(
        F.col(cluster_col).alias("cluster"), F.col(label_col).alias("label")
    ).agg(F.count("*").alias("cnt"))


def weighted_average_entropy(
    assignments: DataFrame, cluster_col: str, label_col: str
) -> DataFrame:
    """One-row ``(score: double)`` — Σ_c size_c·H(c) / n, H in nats."""
    hist = label_histogram(assignments, cluster_col, label_col)
    w = Window.partitionBy("cluster")
    s = F.sum("cnt").over(w)
    p = F.col("cnt").cast("double") / s.cast("double")
    term: Column = F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0)) * s.cast("double")
    return (
        hist.withColumn("term", term)
        .agg(
            F.round(F.sum("term") / F.sum("cnt").cast("double"), 6).alias("score")
        )
    )
