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
