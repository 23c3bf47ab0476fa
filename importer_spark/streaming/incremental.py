"""Streaming / incremental processing (SURVEY §2.9).

The reference is batch-only; its incremental machinery maps to:
  I1 cursor-based extract  → ``cursor_incremental_batch`` (batch + watermark
     table) or ``stream_events`` (Structured Streaming file source, whose
     checkpoint gives exactly-once the reference hand-rolls via a JSON ledger
     — orchestrator.py:34-141).
  I2 snapshot append       → io.snapshot_append.
  I3 merge upsert          → io.merge_by_key.

``windowed_event_counts`` is written against a plain DataFrame so the SAME
code runs in batch (oracle-checked in the catalog) and under readStream with
a watermark (exercised in tests with availableNow) — the Spark-first way to
add the late-data semantics the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from importer_spark.functions import dec, out_double


def stream_events(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (Auto-Loader analog of the
    reference's glob-and-ledger discovery, S2/S3)."""
    return spark.readStream.schema(schema).format("parquet").load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. With ``watermark`` set and
    a streaming input this is an append-mode late-data-tolerant aggregation;
    with a batch input it's a plain windowed groupBy (same plan shape)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            out_double(F.sum(dec(F.col("value")))).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def cursor_incremental_batch(
    spark: SparkSession,
    source: DataFrame,
    cursor_col: str,
    state_path: str,
) -> DataFrame:
    """Cursor-based incremental extract (reference I1: dlt's ``updated_at``
    high-watermark, shopify_dlt/__init__.py:69-77): return only rows past the
    persisted cursor and advance it. State is a 1-row parquet — on a real
    deployment, a table in the catalog."""
    try:
        prev = spark.read.parquet(state_path).first()["cursor"]
    except Exception:
        prev = None
    delta = source if prev is None else source.filter(F.col(cursor_col) > F.lit(prev))
    new_cursor = source.agg(F.max(cursor_col).alias("cursor"))
    new_cursor.write.mode("overwrite").parquet(state_path)
    return delta
