"""Distributed sinks — the reference's driver-side writers done right.

The reference collected results to the driver and wrote local files,
then uploaded to S3 (BufferedWriter + putFile:
FeatureSelectionCloud.scala:147-180, KmeansVirus.scala:128-157,
SVMDT.scala:216-226).  Every sink here is a distributed ``df.write`` —
on a cluster the same call targets ``s3a://`` URIs directly, no driver
hop, no single-node memory ceiling.

Layout guidance for the 100 TB design point is baked into the
partitioned-parquet writer: partition columns for coarse pruning
(low-cardinality dimensions like class/date), bucketing for co-located
joins on high-cardinality keys (see tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet with optional hive-style partition directories.

    Partition columns become directory keys → partition pruning turns
    ``WHERE class = 'virus'`` into a directory listing, not a scan.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json_lines(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink (the D3 export path: exportJSON.php's tree is one
    row from ``report.d3_tree`` → one JSON document)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_report_text(df: DataFrame, path: str, column: str = "line", single_file: bool = False) -> None:
    """Text sink for the ``cluster;label;json`` report rows
    (KmeansVirus.scala:128-136's output.txt, written distributed)."""
    out = df.select(df[column].alias("value"))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header; timestamps in ISO-8601 micros so a
    header-driven schema read round-trips exactly."""
    df.write.mode(mode).option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — columnar alternative when the downstream reader is
    Hive/Trino-side; same pushdown/pruning properties as parquet."""
    df.write.mode(mode).orc(path)


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Range-partitioned, in-file-sorted parquet: per-file min/max
    ranges on ``col`` are DISJOINT, so a point/range predicate prunes to
    one file's row groups via parquet statistics — data skipping
    without any table-format dependency."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def write_dynamic_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Partitioned overwrite that replaces ONLY the partitions present
    in ``df`` (``partitionOverwriteMode=dynamic``) — the idempotent
    daily-reprocess sink: rerunning one day's batch rewrites that day's
    directory and leaves history untouched."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_small_files(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(rows / target_rows_per_file)`` files.  Streaming sinks and
    per-batch appends accumulate kilobyte files whose open/footer cost
    dominates scans; periodic compaction is standard table maintenance.
    Round-robin ``repartition(n)`` (not coalesce) so output files are
    uniform.  Returns the file count written.

    The rewrite stages into ``path + '.compact'`` then swaps, because
    overwriting a directory while reading it races."""
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    n = max(1, math.ceil(df.count() / target_rows_per_file))
    staging = path.rstrip("/") + ".compact"
    df.repartition(n).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return n
