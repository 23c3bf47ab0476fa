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


# Each event belongs to window/slide = 2 overlapping 10-minute windows that
# hop every 5 minutes; the oracle derives both window starts with explicit
# epoch arithmetic — proving F.window's sliding semantics equal the manual
# construction.
_SLIDING_SQL = """
WITH hops AS (SELECT UNNEST([0, 1]) AS o),
assigned AS (
  SELECT e.event_type, e.value,
    (FLOOR(epoch(e.ts) / 300) - h.o) * 300 AS ws
  FROM events e CROSS JOIN hops h
  WHERE epoch(e.ts) >= (FLOOR(epoch(e.ts) / 300) - h.o) * 300
    AND epoch(e.ts) < (FLOOR(epoch(e.ts) / 300) - h.o) * 300 + 600
)
SELECT
  strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM assigned GROUP BY 1, 2
"""


@query("sliding_window_counts", oracle=_SLIDING_SQL)
def sliding_window_counts_q(spark, sf_dir):
    """Sliding-window aggregation (10-minute windows hopping every 5): the
    streaming-native overlap shape, here in batch mode with the same
    function tests run under readStream. Spark expands each row into its 2
    covering windows BEFORE the shuffle (map-side), so the cost model is
    rows × overlap — identical to the oracle's explicit cross-join
    construction."""
    from importer_spark.streaming.incremental import sliding_window_counts

    t = Tables(spark, sf_dir)
    return sliding_window_counts(t.events)
