"""SparkSession factory and deterministic clock.

The reference pipeline sprinkles ``CURRENT_DATE``/``CURRENT_TIMESTAMP`` through
~40 expressions (reference: models/intermediate/int_quickbooks__customer_revenue.sql:44-49,
mart_company_period_metrics.sql:40-131).  For reproducible results (and oracle
parity) every time-relative computation in this engine takes an explicit
``as_of`` anchor instead; by convention we derive it from the data itself
(max order date) so the same inputs always yield the same outputs.
"""

from __future__ import annotations

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
