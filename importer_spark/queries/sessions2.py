"""Native session windows (F.session_window) and grouped-map pandas
processing (applyInPandas) — the remaining streaming-native and
grouped-pandas surfaces (SURVEY §2.9; BASELINE.json sessionization).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
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

_GAPS_SAMPLED_SQL = _GAPS_SQL.replace(
    "FROM events", "FROM events WHERE user_id % 10 = 0"
)


@query("user_event_gaps", oracle=_GAPS_SAMPLED_SQL)
def user_event_gaps(spark, sf_dir):
    """Grouped-map pandas processing (applyInPandas): per-user event
    sequencing + inter-event gaps computed in a pandas DataFrame per group.
    Integer/microsecond outputs — bit-exact across engines. Runs on a
    deterministic 1-in-10 user subsample: the point here is the per-group
    surface (~30 ms of Python per group); `user_event_gaps_streamed` below
    is the full-corpus scale path for the identical semantics. At scale
    each group materializes in one executor's memory: use for per-entity
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
        t.events.filter(F.col("user_id") % 10 == 0)
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(per_user, schema="user_id bigint, event_id bigint, seq int, gap_us bigint")
    )


def _gaps_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-user sequencing over a MULTI-user frame (rows already
    sorted by user_id, ts, event_id)."""
    micros = pdf["ts"].astype("int64") // 1000
    by_user = pdf.groupby("user_id", sort=False)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "seq": (by_user.cumcount() + 1).astype("int32"),
            "gap_us": micros.groupby(pdf["user_id"].values).diff(),
        }
    )


def complete_group_frames(batches, key: str):
    """Re-chunk an iterator of key-sorted frames so no group straddles a
    yielded frame: hold back the trailing group of each batch and prepend it
    to the next. THE invariant that makes batch-granular pandas correct for
    grouped logic (property-tested against arbitrary batch splits in
    tests/test_properties.py)."""
    carry = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last = pdf[key].iloc[-1]
        tail = pdf[key] == last
        carry = pdf[tail]
        head = pdf[~tail]
        if len(head):
            yield head
    if carry is not None and len(carry):
        yield carry


@query("user_event_gaps_streamed", oracle=_GAPS_SQL)
def user_event_gaps_streamed(spark, sf_dir):
    """Same result as user_event_gaps, restructured for scale: instead of
    one pandas frame PER GROUP (applyInPandas pays Arrow + Python overhead
    per user), repartition+sortWithinPartitions co-locates and orders the
    groups, and mapInPandas processes whole Arrow batches, carrying the
    trailing (possibly split) user across batch boundaries. Per-batch
    overhead replaces per-group overhead — the difference between 10k
    python calls and ~10 at sf0.1, and the pattern that keeps grouped
    pandas logic viable at 100 TB group counts."""

    def gaps(batches):
        for frame in complete_group_frames(batches, "user_id"):
            yield _gaps_frame(frame)

    t = Tables(spark, sf_dir)
    ev = (
        t.events.select("user_id", "event_id", "ts")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )
    return ev.mapInPandas(
        gaps, schema="user_id bigint, event_id bigint, seq int, gap_us bigint"
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
  GROUP BY 1
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
  CASE WHEN p.purchase_ts IS NOT NULL THEN 3
       WHEN c.click_ts IS NOT NULL THEN 2
       ELSE 1 END AS funnel_stage
FROM v LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


@query("user_funnel_stages", oracle=_FUNNEL_SQL)
def user_funnel_stages(spark, sf_dir):
    """Ordered funnel (view -> click-after-view -> purchase-after-click)
    per user: stage timestamps are conditional mins evaluated as THREE
    STACKED window aggregates over the same user_id partitioning — one
    shuffle total, no per-stage self-joins (the oracle's 3-CTE join chain
    shows the shape this replaces; at 100 TB that's 3 event-table scans vs
    1) and no per-user array materialization, so a power user with millions
    of events costs sort time, not memory. Conditional mins nest: a click
    counts only at/after the first view, a purchase only at/after that
    click."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id")
    e = t.events.select("user_id", "event_type", "ts")
    staged = (
        e.withColumn(
            "view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("view_ts").isNotNull())
        .select("user_id", "view_ts", "click_ts", "purchase_ts")
        .distinct()
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("funnel_stage"),
        )
    )
