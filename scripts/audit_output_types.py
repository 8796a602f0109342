"""Audit final output schemas of every catalog query on both engines.

Any DECIMAL-typed (or engine-mismatched) output column is
normalization-fragile: a harness that renders ``Decimal('0.0')``
differently from ``0.0`` will hash-mismatch even when values agree.
Policy: accumulate exact in DECIMAL, but the *final* schema must be
concrete primitive types (DOUBLE/BIGINT/STRING/...) on both engines.

Usage: python scripts/audit_output_types.py
Prints one line per offending query: name, side, column, type.
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
    from big_data_virus_analysis_spark.plans.catalog import CATALOG, oracle_sql
    from big_data_virus_analysis_spark.session import get_spark

    spark = get_spark("type-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    osql = oracle_sql()
    bad = 0
    for name, spec in sorted(CATALOG.items()):
        try:
            sdf = spec.spark(spark, SF_DIR)
            stypes = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: spark {e}")
            bad += 1
            continue
        for col, typ in stypes.items():
            if typ.startswith("decimal"):
                print(f"DEC  {name}: spark  {col}: {typ}")
                bad += 1
        if name not in osql:
            continue
        try:
            rel = con.sql(osql[name])
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: duckdb {e}")
            bad += 1
            continue
        for col, typ in otypes.items():
            if typ.startswith("DECIMAL"):
                print(f"DEC  {name}: oracle {col}: {typ}")
                bad += 1
            # sum(INTEGER/BIGINT) in DuckDB widens to HUGEINT (int128);
            # pandas-based harnesses render that as float/object while
            # Spark's bigint stays int64 — same fragility as Decimal.
            if typ == "HUGEINT":
                print(f"HUGE {name}: oracle {col}: {typ}")
                bad += 1
        # Engine type-family mismatches (float vs int vs decimal vs other).
        fam = lambda t: (  # noqa: E731
            "f"
            if ("float" in t.lower() or "double" in t.lower() or t.lower().startswith("decimal"))
            else "i" if "int" in t.lower() else "o"
        )
        for col in stypes:
            if col in otypes and fam(stypes[col]) != fam(otypes[col]):
                print(
                    f"MIS  {name}: {col}: spark={stypes[col]} oracle={otypes[col]}"
                )
                bad += 1
    print(f"\n{bad} findings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
