from .exactly_once import make_idempotent_jdbc_writer
from .ingest import latest_state, stream_csv_upsert
from .stateful import finalized_sessions, user_running_totals
from .tws import threshold_alerts, threshold_alerts_batch, threshold_alerts_tws
from .windows import (
    attribution_join,
    read_events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "attribution_join",
    "read_events_stream",
    "run_to_memory",
    "session_counts",
    "sliding_counts",
    "stream_dedup",
    "user_running_totals",
    "finalized_sessions",
    "threshold_alerts",
    "threshold_alerts_batch",
    "threshold_alerts_tws",
    "latest_state",
    "make_idempotent_jdbc_writer",
    "stream_csv_upsert",
    "tumbling_counts",
]
