"""Native session windows (F.session_window) and grouped-map pandas
processing (applyInPandas) — the remaining streaming-native and
grouped-pandas surfaces.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double
from importer_spark.io import Tables
from importer_spark.queries.registry import query

_SESSION_WINDOW_SQL = """
WITH seq AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT *, CAST(SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM seq
)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_id
"""


@query("session_window_native", oracle=_SESSION_WINDOW_SQL)
def session_window_native(spark, sf_dir):
    """F.session_window gap-merged sessions (30-minute inactivity). The
    oracle derives identical sessions via lag-gap + running sum — passing
    parity also certifies the two sessionization formulations agree
    (boundary semantics: a gap of exactly 30:00 starts a new session).
    Streaming-ready: the same groupBy works under readStream + watermark."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            out_double(F.sum(dec(F.col("value")))).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_GAPS_SQL = """
SELECT user_id, event_id,
  CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq,
  epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("user_event_gaps", oracle=_GAPS_SQL)
def user_event_gaps(spark, sf_dir):
    """Grouped-map pandas processing (applyInPandas): per-user event
    sequencing + inter-event gaps computed in a pandas DataFrame per group.
    Integer/microsecond outputs — bit-exact across engines. At scale each
    group materializes in one executor's memory: use for per-entity
    sequence models, not whole-table math."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        micros = pdf["ts"].astype("int64") // 1000
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": range(1, len(pdf) + 1),
                "gap_us": micros.diff(),
            }
        )
        return out

    t = Tables(spark, sf_dir)
    return (
        t.events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(per_user, schema="user_id bigint, event_id bigint, seq int, gap_us bigint")
    )
