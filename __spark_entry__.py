"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``big_data_virus_analysis_spark.plans.catalog`` — the
engine's query catalog.  Each catalog entry pairs a Spark plan with an
equivalent DuckDB oracle SQL (where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_virus_analysis_spark.plans import catalog as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: information-gain feature ranking (the reference's
    core analytic, FeatureSelectionCloud.scala:376-442) at sf0.001."""
    return _catalog.CATALOG["info_gain_topk"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
