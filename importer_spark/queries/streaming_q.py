"""Batch-mode catalog entries for the streaming-shaped operators: the same
transformation functions run under readStream in tests (SURVEY §2.9)."""

from __future__ import annotations

from importer_spark.io import Tables
from importer_spark.queries.registry import query
from importer_spark.streaming.incremental import windowed_event_counts

_WINDOWED_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("tumbling_window_counts", oracle=_WINDOWED_SQL)
def tumbling_window_counts(spark, sf_dir):
    """Tumbling-window aggregation (F.window). This exact function also runs
    under Structured Streaming with a watermark — tests prove batch/stream
    result equivalence on the same data."""
    t = Tables(spark, sf_dir)
    return windowed_event_counts(t.events)
