"""Catalog-wide oracle output-type scan (driver-parity lint, round 11).

Compiles every Spark plan (schema only — nothing executes) and binds
every DuckDB oracle (``con.sql(...).types`` — nothing executes), then
prints hard/soft divergences per ``plans/oracle_typecheck.py``.

Usage: python scripts/scan_oracle_types.py [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    from big_data_virus_analysis_spark.plans.catalog import CATALOG
    from big_data_virus_analysis_spark.plans.oracle_typecheck import divergences
    from big_data_virus_analysis_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-type-scan", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_hard = n_soft = n_ok = 0
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        try:
            schema = spec.spark(spark, SF_DIR).schema
            rel = con.sql(spec.oracle)
            hard, soft = divergences(schema, rel.columns, rel.types)
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_hard += 1
            continue
        if hard:
            n_hard += 1
            for m in hard:
                print(f"HARD {name}: {m}")
        if soft:
            n_soft += 1
            for m in soft:
                print(f"soft {name}: {m}")
        if not hard and not soft:
            n_ok += 1
    print(f"\nok={n_ok} soft-only={n_soft} hard={n_hard}")
    sys.exit(1 if n_hard else 0)


if __name__ == "__main__":
    main()
