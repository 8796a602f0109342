"""Reusable synthetic-SF fixture generator: replicate a testdata SF
directory K× with per-replica id offsets, so key cardinalities grow
with the data (no artificial hot keys).

The committed grid stops at sf0.1; this builds the out-of-grid decade
(a synthetic "sf1" at factor 10) used by scripts/bench_sf1_probe.py and
bench.py's optional $SPARK_GRAFT_SF1_DIR scaling leg.

Usage: python scripts/make_sf1.py [src] [dst] [factor]
       (defaults: /root/testdata/sf0.1 /tmp/bdva_sf1 10)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_virus_analysis_spark.sources.tables import load_table  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: id column to offset per replica so cardinality scales with the data
ID_COLS = {
    "documents": "doc_id",
    "events": "user_id",  # users also scale: no artificial hot keys
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}
OFFSET = 10_000_000


def replicate_corpus(spark, src: str, dst: str, factor: int = 10) -> None:
    """Write every table of ``src`` to ``dst`` replicated ``factor``×,
    with id columns offset per replica (broadcast copy-index cross
    join — one scan per table, embarrassingly parallel)."""
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        out = f"{dst}/{name}.parquet"
        if os.path.exists(out):
            shutil.rmtree(out, ignore_errors=True)
        df = load_table(spark, src, name)
        if name in ID_COLS:
            copies = spark.range(factor).select(F.col("id").alias("_copy"))
            col = ID_COLS[name]
            df = (
                df.crossJoin(F.broadcast(copies))
                .withColumn(col, F.col(col) + F.col("_copy") * OFFSET)
                .drop("_copy")
            )
        df.write.mode("overwrite").parquet(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bdva_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from big_data_virus_analysis_spark.session import get_spark

    spark = get_spark("bdva-make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    replicate_corpus(spark, src, dst, factor)
    print(f"replicated {src} -> {dst} x{factor}")


if __name__ == "__main__":
    main()
