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
    """transformWithStateInPandas needs protobuf in the Python worker
    (its state-server protocol is protobuf-framed); absent here, so the
    Spark-4-native variant below is import-gated rather than stubbed."""
    try:
        from google.protobuf import descriptor  # noqa: F401

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
