"""Single-pass data-quality gate via Spark's Observation API.

An ingest pipeline wants row counts, null rates, and range checks on
every batch it writes — but a separate ``df.agg(...)`` action re-scans
the input.  ``df.observe()`` attaches aggregate expressions to the SAME
physical plan: the metrics are collected as a side channel of the write
action, so the gate costs ZERO extra passes — the difference between
"audit every batch" and "audit when we can afford it" at 100 TB.

No reference counterpart (the reference never audited its inputs);
engine-infrastructure for the ingestion surfaces (sources/, streaming/
foreachBatch writers can read the same metrics per epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def attach_quality_gate(
    df: DataFrame,
    numeric_cols: list[str] | None = None,
    required_cols: list[str] | None = None,
    name: str = "quality_gate",
) -> tuple[DataFrame, Observation]:
    """Attach a metrics observation to ``df``; returns ``(df, obs)``.

    After ANY action on the returned frame, ``obs.get`` holds:
    ``n_rows``, ``<col>_nulls`` for each required column, and
    ``<col>_min`` / ``<col>_max`` for each numeric column — computed in
    the same pass as the action.
    """
    numeric_cols = numeric_cols or []
    required_cols = required_cols or []
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
    for c in numeric_cols:
        metrics.append(F.min(c).alias(f"{c}_min"))
        metrics.append(F.max(c).alias(f"{c}_max"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def gate_passed(
    metrics: dict,
    max_null_frac: float = 0.0,
    min_rows: int = 1,
) -> bool:
    """Evaluate the collected metrics against the gate policy."""
    n = metrics.get("n_rows", 0)
    if n < min_rows:
        return False
    for k, v in metrics.items():
        if k.endswith("_nulls") and n > 0 and (v or 0) / n > max_null_frac:
            return False
    return True
