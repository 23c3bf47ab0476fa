"""SparkSession factory and deterministic clock.

The reference pipeline sprinkles ``CURRENT_DATE``/``CURRENT_TIMESTAMP`` through
~40 expressions (reference: models/intermediate/int_quickbooks__customer_revenue.sql:44-49,
mart_company_period_metrics.sql:40-131).  For reproducible results (and oracle
parity) every time-relative computation in this engine takes an explicit
``as_of`` anchor instead; by convention we derive it from the data itself
(max order date) so the same inputs always yield the same outputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CONF = {
    # local[N] runs every task inside the driver JVM, so the driver must be
    # sized like an executor: the 1g JVM default OOMs ~6M-row hash
    # aggregations at 32 threads (found by the 10x scaling run, PERF.md).
    # Effective only when this session launches the JVM; harmless after.
    "spark.driver.memory": "16g",
    # Adaptive execution: runtime re-planning, partition coalescing, skew-join
    # splitting. At 100 TB this is what absorbs hot keys (SURVEY §2.4 J11).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dims (region/nation/part at any SF, mapping tables) should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas-UDF path and toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timezone for date/timestamp math.
    "spark.sql.session.timeZone": "UTC",
    # Write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96 columns
    # carry NO parquet footer statistics, which silently disables timestamp
    # data skipping (txn.read_where) and row-group pushdown everywhere.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def shuffle_partitions_for_dir(
    input_dir: str, per_partition_mb: float = 12.0, floor: int = 8, cap: int = 256
) -> int:
    """Shuffle-partition count derived from on-disk input bytes: ~1
    partition per ``per_partition_mb`` of compressed input (≈150 MB of
    decompressed shuffle per partition at parquet's ~2.5× expansion — the
    DEPLOY.md §Session sizing rule), floored and capped for local mode.

    Divisor history, all MEASURED on the join-heavy marts at the 100×
    sweep dir (1.8 GB): /32 → 57 partitions, spill, fake growth exponent
    1.3; /16 → 114, STILL on the spill cliff (mart_product_period_spending
    38.8 s min-of-4); /12 → ~153, past the cliff (24.3 s at 128 in the same
    session — SCALE_SWEEP sf10_100x_sh128chk). bench.py and
    tools/run_scale_sweep.py both call this ONE rule (r7 review: the two
    hand-copied versions had already diverged once), overridable via
    SPARK_GRAFT_SHUFFLE at the call sites. On a real cluster leave AQE
    coalescing to right-size post-shuffle partitions instead."""
    size_mb = (
        sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(input_dir)
            for f in fs
        )
        / 1e6
    )
    return max(floor, min(cap, int(size_mb / per_partition_mb)))


def get_spark(
    app_name: str = "importer-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` is sized for local testing; on a real cluster leave
    AQE's coalescing to right-size post-shuffle partitions instead.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def data_as_of(df: DataFrame, ts_col: str):
    """Deterministic "now": the max timestamp present in the data.

    Returns a Python scalar (one-row distributed max → driver); use it as a
    literal anchor for trailing-window logic. Replaces the reference's
    CURRENT_DATE-relative filters so results are reproducible.
    """
    return df.agg(F.max(ts_col).alias("as_of")).first()["as_of"]
