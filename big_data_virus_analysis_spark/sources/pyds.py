"""Custom connector via Spark 4's Python DataSource API.

The reference ingests from a bespoke source (S3 listing + per-file
loops, FeatureSelectionCloud.scala:204-246); the modern Spark-native
equivalent of "teach the engine a new source" is the DataSource API:
declare a schema, plan N input partitions, and let every executor pull
its own partition — the source scales out exactly like a file scan
(partition planning is the contract that matters at 100 TB; a source
without it funnels through one task).

The demonstrator is a deterministic LCG row generator whose output is
reproducible in closed form, so the whole custom-source path (options →
partition planning → per-partition iterators → DataFrame ops on top)
gets an exact DuckDB oracle — the strongest check a connector can have.
Swapping the generator body for an HTTP/queue/object-store client
changes nothing about the Spark-side plumbing.

The classes are built inside the factory and therefore pickled BY VALUE
(cloudpickle): the source works even when Python workers cannot import
this package — the driver contract makes no worker-PYTHONPATH promise
(same discipline as streaming/stateful.py's closures).
"""

from __future__ import annotations

_M = 2_147_483_648
_A = 1103515245
_B = 12345


def _make_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    m, a, b = _M, _A, _B  # captured by value into the pickled closures

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options) -> None:
            self.n_shards = int(options.get("shards", 8))
            self.rows_per_shard = int(options.get("rows_per_shard", 1000))

        def partitions(self):  # the scale contract: one task per shard
            return [InputPartition(i) for i in range(self.n_shards)]

        def read(self, partition):
            shard = partition.value
            base = shard * self.rows_per_shard
            for seq in range(self.rows_per_shard):
                s = (a * (base + seq) + b) % m
                yield (shard, seq, s % 1000, s % 9973)

    class SyntheticEventsDataSource(DataSource):
        """``spark.read.format("synthetic_events")`` after registration.

        Options: ``shards`` (input partitions to plan, default 8) and
        ``rows_per_shard`` (default 1000).  Row ``(shard, seq)`` carries
        the LCG state ``s = (A·(shard·rows+seq) + B) mod 2³¹`` shredded
        into ``user_id = s mod 1000`` and ``amount = s mod 9973``.
        """

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return "shard int, seq int, user_id bigint, amount bigint"

        def reader(self, schema) -> "SyntheticEventsReader":
            return SyntheticEventsReader(self.options)

    return SyntheticEventsDataSource


def register_synthetic_events(spark) -> None:
    """Idempotent registration of the custom source.

    ``spark.dataSource.register`` overwrites an existing registration
    of the same name (verified against Spark 4.1), so re-registering is
    naturally idempotent — genuine failures (API mismatch, pickling
    errors) propagate instead of being masked as 'already registered'.
    """
    spark.dataSource.register(_make_datasource())
