"""Structured-Streaming surface over the ``events`` table.

The reference is strictly batch (SURVEY.md §2.10 — no streaming code
exists); this package is the north-star extension: the same event-time
semantics as ``operators/sessions.py``, expressed so one transformation
function serves BOTH a batch DataFrame (oracle-checkable) and a
``readStream`` DataFrame (watermarks + incremental state).
"""

from .streams import (
    flag_incremental_dups,
    read_documents_stream,
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_counts,
)
from .stateful import running_user_totals, running_user_totals_tws

__all__ = [
    "flag_incremental_dups",
    "read_documents_stream",
    "read_events_stream",
    "session_window_agg",
    "sliding_window_agg",
    "streaming_dedup",
    "tumbling_window_counts",
    "running_user_totals",
    "running_user_totals_tws",
]
