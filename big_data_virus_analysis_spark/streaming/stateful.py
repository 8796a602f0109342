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


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def session_emitter(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming gap-based sessionization with EVENT-TIME TIMEOUTS —
    the second custom stateful operator: sessions close (and emit,
    append-mode) either when a later in-batch event exceeds the gap, or
    when the WATERMARK passes session_end + gap and the state timeout
    fires for a dormant user.  State per user is one (start, last, n)
    triple; the timeout is what bounds state for users who simply stop
    — the piece `running_user_totals` deliberately omits.

    Requires a watermark on ``ts`` (the caller sets it; tests use the
    batch twin ``operators/sessions.py::sessionize`` for parity on
    closed sessions).  Emits CLOSED sessions only — open sessions
    remain in state until their timeout.
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def update_sessions(key, batches, state):
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            ts_list: list[int] = []
            for pdf in batches:
                ts_list.extend(int(v) for v in pdf["ts_us"])
            ts_list.sort()
            cur = state.get if state.exists else None
            for t in ts_list:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
                else:
                    closed.append(cur)
                    cur = (t, t, 1)
            if cur is not None:
                state.update(cur)
                # fire once the watermark passes last event + gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    from pyspark.sql import functions as F

    with_us = events.withColumn("ts_us", F.unix_micros("ts"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (StatefulProcessor with named state handles, timers, TTL support)
    that replaces ``applyInPandasWithState``'s single-tuple state.

    Shipping BOTH forms keeps the engine current: new pipelines get the
    processor API (composable named states, per-state TTL — the pieces
    a 100 TB resident topology needs for state hygiene), existing ones
    keep the classic form.  Batch parity with the oracle-checked
    groupBy aggregate is asserted in tests/test_streaming.py.

    Runtime requirements (both standard): the RocksDB state store
    provider and the `protobuf` package (TWS's state-server protocol
    imports google.protobuf in the Python driver worker) — the parity
    test importorskips where protobuf is absent.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 4)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
