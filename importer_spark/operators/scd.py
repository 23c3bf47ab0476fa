"""Slowly-changing-dimension (SCD2) merge — CDC emulation without Delta.

The reference's merge disposition overwrites by PK (latest snapshot wins,
I3); SCD2 is the history-preserving upgrade a warehouse on Spark would use:
each key keeps one open row (valid_to NULL) plus closed history rows. On
Delta/Iceberg this is a MERGE with two WHEN clauses; on plain parquet we
emulate with union + window versioning — same logical output, atomically
rewritten.

Scale: one shuffle on the business key (both window passes share the
partitioning); history is passthrough, so the recompute touches only open
rows + the update batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: list[str],
    attrs: list[str],
    effective_col: str,
) -> DataFrame:
    """Apply an update batch to an SCD2 table.

    ``current`` has columns key + attrs + valid_from + valid_to (NULL = open);
    ``updates`` has key + attrs + ``effective_col`` (the change timestamp).
    Closed history rows pass through untouched. Open rows and updates are
    sequenced per key by effective time; versions whose attrs equal the
    previous version are dropped (no-op updates), each surviving version
    closes at the next survivor's start, and the last stays open.
    """
    ts_type = updates.schema[effective_col].dataType
    hist = current.filter(F.col("valid_to").isNotNull()).select(
        *key, *attrs, "valid_from", "valid_to"
    )
    live = current.filter(F.col("valid_to").isNull()).select(
        *key, *attrs, "valid_from", F.lit(0).alias("_src")
    )
    upd = updates.select(
        *key, *attrs, F.col(effective_col).alias("valid_from"), F.lit(1).alias("_src")
    )
    seq = live.unionByName(upd)
    # attrs join the ordering as a final tiebreak: two updates for one key
    # sharing an effective timestamp would otherwise sequence arbitrarily
    # per run (which version survives / stays open would flip)
    order = [F.col("valid_from").asc(), F.col("_src").asc()] + [F.col(a).asc() for a in attrs]
    w = Window.partitionBy(*key).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    survivors = seq.withColumn("_keep", first | changed).filter(F.col("_keep"))
    w2 = Window.partitionBy(*key).orderBy(*order)
    out = survivors.select(
        *key,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w2).cast(ts_type).alias("valid_to"),
    )
    return hist.unionByName(out)
