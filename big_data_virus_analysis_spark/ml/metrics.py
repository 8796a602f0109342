"""Exact distributed ROC-AUC — the metric layer shared by the ML grids
and the oracle-checked catalog queries.

``BinaryClassificationEvaluator`` approximates the ROC curve with 1000
score bins; this module computes the EXACT area via the Mann–Whitney
identity on score-grouped counts (ties handled by the midpoint term —
identical to trapezoidal integration over the exact ROC):

    AUC = Σ_s  n₊(s) · ( N₋(<s) + n₋(s)/2 )  /  (N₊ · N₋)

Plan shape: one hash aggregate groups the scored rows by score (the
only pass over the data), then the cumulative negative count runs over
the *distinct-score* frame through the two-phase distributed scan
(operators/prefix_sum.py::global_prefix_sum) — no global single-task
window, so the distinct-score frame may be as large as the corpus and
the plan still holds at 100 TB.

Used by ml/pipeline.py's classifier grids (SVMDT.scala:153-179's
``areaUnderROC``) and exact-oracle-checked end-to-end by the
``fixed_scorer_auc`` catalog entry (plans/ml_exact.py) and
``auc_rank_based`` (plans/drift.py) — the driver's DuckDB oracle pins
this exact computation, so the grids' metric path is oracle-visible
even though model training itself is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.prefix_sum import global_prefix_sum


def exact_auc_frame(
    scored: DataFrame, score_col: str = "score", pos_col: str = "pos"
) -> DataFrame:
    """One-row ``(n_pos, n_neg, auc)`` from ``(score, pos∈{0,1})`` rows.

    ``score_col`` must be deterministic (round it first if it comes from
    floating-point model output); ``pos_col`` is an int 0/1 label.
    """
    grouped = scored.groupBy(score_col).agg(
        F.sum(pos_col).alias("np_s"),
        F.sum(1 - F.col(pos_col)).alias("nn_s"),
    )
    # cumulative negatives at/below each distinct score — two-phase scan,
    # total order guaranteed (scores are distinct after the groupBy)
    cum = global_prefix_sum(grouped, score_col, "nn_s", "cum_nn")
    return cum.agg(
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"),
        F.round(
            F.sum(F.col("np_s") * (F.col("cum_nn") - F.col("nn_s") / 2.0))
            / (F.sum("np_s") * F.sum("nn_s")).cast("double"),
            6,
        ).alias("auc"),
    )


def exact_auc(
    predictions: DataFrame,
    score_col: str,
    label_col: str = "label",
    decimals: int = 9,
) -> float:
    """Exact scalar AUC of a prediction frame — drop-in for
    ``BinaryClassificationEvaluator(metricName="areaUnderROC")``.

    ``score_col`` may be a VectorUDT column (rawPrediction/probability):
    element [1] is taken as the positive-class score, exactly the
    element the evaluator ranks by.  Scores are rounded to ``decimals``
    so the grouping key is deterministic across replays.
    """
    dtype = dict(predictions.dtypes).get(score_col)
    if dtype not in ("double", "float"):
        from pyspark.ml.functions import vector_to_array

        score = vector_to_array(F.col(score_col))[1]
    else:
        score = F.col(score_col).cast("double")
    scored = predictions.select(
        F.round(score, decimals).alias("score"),
        F.col(label_col).cast("int").alias("pos"),
    )
    row = exact_auc_frame(scored).first()
    if row["auc"] is None:
        raise ValueError(
            f"AUC undefined: prediction frame has n_pos={row['n_pos']}, "
            f"n_neg={row['n_neg']} — both classes must be present to rank "
            "positives against negatives"
        )
    return float(row["auc"])
