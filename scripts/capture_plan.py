"""Capture ``explain("formatted")`` for named catalog queries.

Usage: python scripts/capture_plan.py OUT_DIR SUFFIX name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default sf0.1) on a vanilla local session —
the physical-plan evidence files the optimization rounds commit under
plans/r11/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from big_data_virus_analysis_spark.plans.catalog import CATALOG
    from big_data_virus_analysis_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].spark(spark, SF_DIR)
        # r11 ADVICE: go through the query execution's own
        # explainString(ExplainMode) instead of the PythonSQLUtils
        # private helper — one less version-fragile internal hop
        jqe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = jqe.explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{path}: {len(txt)} chars", flush=True)


if __name__ == "__main__":
    main()
