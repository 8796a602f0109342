"""Custom stateful streaming operator: per-user running totals.

Demonstrates the engine's escape hatch for operators Spark's built-in
windowed aggregations cannot express — arbitrary per-key state kept
across micro-batches via ``applyInPandasWithState`` (Arrow-batched
group-map with a ``GroupState`` handle; never row-at-a-time Python).

No reference counterpart (SURVEY.md §2.10).  The batch-equivalent
semantics (for tests and the DuckDB oracle) are simply
``groupBy(user_id).agg(count, sum)`` — the streaming operator maintains
that aggregate incrementally and emits the updated running total for
every user seen in each micro-batch.

Scale note: state is one (count, sum) pair per user — O(#users), the
minimum possible for this semantics.  A production deployment sets a
state timeout so dormant users age out; here the timeout is "no
timeout" for deterministic tests.

Both pandas functions are defined as closures (pickled by VALUE) so the
operator works even when Python workers don't have this package on
their import path — the driver contract makes no PYTHONPATH promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum(value)) maintained across
    micro-batches; emits the updated total for each user per batch.

    On a streaming frame: ``applyInPandasWithState`` with
    ``outputMode("update")``.  On a batch frame (where Spark forbids the
    stateful form) the identical accumulation runs as one stateless
    ``applyInPandas`` pass — semantically
    ``groupBy(user_id).agg(count(*), round(sum(value), 4))``.
    """
    import pandas as pd

    def update_user_totals(key, batches, state):
        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    def batch_user_totals(pdf):
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [int(len(pdf))],
                "sum_value": [round(float(pdf["value"].sum()), 4)],
            }
        )

    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return events.groupBy("user_id").applyInPandas(
        batch_user_totals, schema=OUTPUT_SCHEMA
    )
