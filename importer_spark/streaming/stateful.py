"""Custom stateful streaming operator (SURVEY §2.9 beyond-reference:
applyInPandasWithState) — running per-user aggregates that survive across
micro-batches.

The reference has no streaming at all; this is the Spark-native upgrade of
its cursor-based incrementality: instead of recomputing trailing aggregates
from scratch each run (A8), state carries them forward and each batch does
O(batch) work.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(key, pdf_iter, state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        # Round per batch to keep the running double stable across batch
        # boundaries (state stores a plain double).
        total = round(total + float(pdf["value"].sum()), 2)
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in state. Input must
    be a streaming DataFrame with user_id and value columns."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf runtime in the Python
    worker (its state-server protocol is protobuf-framed): without it the
    query fails at runtime with 'TransformWithStateInPySpark driver worker
    exited unexpectedly (crashed)'. Gate on the EXACT module the worker
    loads — pyspark's generated StateMessage_pb2, whose import is what
    raises ModuleNotFoundError('google') when protobuf is absent (root
    cause + repro: COVERAGE.md §2.9)."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark-4-native version of running_user_totals: a StatefulProcessor
    under transformWithStateInPandas. Functionally identical to the
    applyInPandasWithState operator above, but the new API adds
    composable typed state (value/list/map), timers, and TTL — and runs on
    the RocksDB state-store provider, which is what bounds state size at
    100 TB (changelog checkpointing instead of full-snapshot JVM heap).

    Requires ``tws_available()``; callers keep the applyInPandasWithState
    path as the portable fallback.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total = round(total + float(pdf["value"].sum()), 2)
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start long, last long, n bigint"


def _update_sessions(gap_seconds: int):
    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        rows = pd.concat(list(pdf_iter))
        # Micro-batch order within a group is not ts-ordered; sort locally
        # (single user's batch slice — bounded by the batch, not the stream).
        for ts in sorted(int(t.value) // 1000 for t in pd.to_datetime(rows["ts"])):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_seconds * 1_000_000:
                closed.append((start, last, n))
                start, last, n = ts, ts, 1
            else:
                last, n = ts, n + 1
        state.update((start, last, n))
        out = pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )
        yield out

    return update


def stateful_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful sessionizer: per-user session state carries across
    micro-batches, and a session is EMITTED when a later event arrives more
    than ``gap_seconds`` after it ended — deterministic emission on data,
    not on processing-time timeouts (still-open sessions remain in state;
    add an EventTimeTimeout flush for production finalization). The
    cross-batch twin of the batch `sessionization` query: a session split
    across batch boundaries comes out whole."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions(gap_seconds),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUT_SCHEMA = "user_id bigint, from_type string, to_type string, n bigint"
TRANSITION_STATE_SCHEMA = "last_type string, last_us long, last_id long"


def _update_transitions(key, pdf_iter, state: GroupState):
    (user_id,) = key
    last_type, last_us, last_id = (
        state.get if state.exists else (None, None, None)
    )
    rows = pd.concat(list(pdf_iter))
    rows = rows.assign(us=rows["ts"].astype("int64") // 1000).sort_values(
        ["us", "event_id"]
    )
    counts: dict[tuple[str, str], int] = {}
    for r in rows.itertuples(index=False):
        if last_type is not None:
            pair = (last_type, r.event_type)
            counts[pair] = counts.get(pair, 0) + 1
        last_type, last_us, last_id = r.event_type, int(r.us), int(r.event_id)
    state.update((last_type, last_us, last_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(counts),
            "from_type": [a for a, _ in counts],
            "to_type": [b for _, b in counts],
            "n": list(counts.values()),
        }
    )


def streaming_transition_counts(events: DataFrame) -> DataFrame:
    """Incremental Markov transition counts — the streaming twin of the
    batch `event_transition_matrix` query: per-user state carries the last
    seen event across micro-batches, so a transition whose two events land
    in DIFFERENT batches is still counted exactly once. Emits per-batch
    (user, from, to, n) increments (update mode); the global matrix is
    their sum, maintained downstream by any idempotent sink (e.g. the
    exactly-once txn merge). Assumes per-user event-time order across
    batches — the cursor-extract contract (streaming/incremental.py) that
    feeds it; within a batch, rows sort locally."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANSITION_OUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
