"""Schema-explicit readers for the interchange formats the sinks write.

Parquet/ORC carry their own schema; CSV and JSON are schema-on-read
hazards at scale — inference costs an extra full scan of 100 TB and can
silently widen types between runs.  Every reader here therefore takes
an explicit Spark DDL schema ("col TYPE, ...") and disables inference;
``schema_of(df)`` produces that DDL from a live frame so writers and
readers share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def schema_of(df: DataFrame) -> StructType:
    """A frame's schema, to feed back into the readers (StructType is
    accepted by ``spark.read.schema`` directly — no DDL string
    round-trip, so nested array/struct columns survive verbatim)."""
    return df.schema


def read_csv(spark: SparkSession, path: str, schema: str | StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str | StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
