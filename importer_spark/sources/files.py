"""File-based sources (SURVEY §2.1 S1-S11): discovery/ordering, ingest
metadata injection, schema-evolution tolerance, XLSX gating.

The reference discovers QuickBooks exports by glob, extracts dates from two
filename formats, sorts oldest-first, and optionally keeps only the latest
per type (pipelines/quickbooks/pipeline.py:63-149); every ingested row gets
load/snapshot metadata (:185-198). Here the same behaviors are driver-side
helpers feeding Spark readers — on a real deployment the discovery half is
replaced by a file-stream source whose checkpoint subsumes the processed-file
ledger (orchestrator.py:34-141).
"""

from __future__ import annotations

import datetime
import glob as globlib
import os
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Two filename date formats the reference parses: "01-31-2024" and "2024-01-31".
# Each pattern maps its 0-based split parts to (year, month, day).
_DATE_PATTERNS = [
    (re.compile(r"(\d{2})-(\d{2})-(\d{4})"), lambda p: (p[2], p[0], p[1])),
    (re.compile(r"(\d{4})-(\d{2})-(\d{2})"), lambda p: (p[0], p[1], p[2])),
]


@dataclass(frozen=True)
class DiscoveredFile:
    path: str
    file_date: str | None  # ISO yyyy-mm-dd
    kind: str


def filename_date(path: str) -> str | None:
    name = os.path.basename(path)
    for pat, order in _DATE_PATTERNS:
        m = pat.search(name)
        if m:
            y, mo, d = order(m.group(0).split("-"))
            return f"{y}-{mo}-{d}"
    return None


def discover_files(
    pattern: str, kind: str = "default", latest_only: bool = False
) -> list[DiscoveredFile]:
    """Glob + chronological ordering + optional latest-per-kind selection
    (reference S2). Undated files sort first (treated as seeds)."""
    found = [
        DiscoveredFile(p, filename_date(p), kind) for p in sorted(globlib.glob(pattern))
    ]
    found.sort(key=lambda f: (f.file_date or "", f.path))
    if latest_only and found:
        return [found[-1]]
    return found


def with_ingest_metadata(
    df: DataFrame,
    snapshot_date: str | None = None,
    is_seed: bool = False,
    worksheet_name: str | None = None,
    load_date: str | None = None,
) -> DataFrame:
    """Metadata-column injection (reference S9: load_date, snapshot_date,
    is_seed, worksheet_name, source_file on every row)."""
    load_date = load_date or datetime.date.today().isoformat()
    return (
        df.withColumn("load_date", F.lit(load_date))
        .withColumn("snapshot_date", F.lit(snapshot_date or "seed"))
        .withColumn("is_seed", F.lit(is_seed))
        .withColumn("worksheet_name", F.lit(worksheet_name))
        .withColumn("source_file", F.input_file_name())
    )


def optional_column(df: DataFrame, name: str, dtype: str = "string") -> Column:
    """Compile-time optional-column probe (reference P7:
    macros/optional_columns.sql:6-22 — tolerate absent columns across export
    vintages): the column if present, else a typed NULL."""
    if name in df.columns:
        return F.col(name)
    return F.lit(None).cast(dtype).alias(name)


def align_to_schema(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Union-projection alignment (reference P8:
    base_quickbooks__order_items.sql:1-173 — invoice vs sales-receipt column
    maps with NULL::type padding): project to a target schema, padding
    missing columns with typed nulls. Compose with unionByName for the
    UNION ALL branches."""
    return df.select(
        *[optional_column(df, name, dtype).alias(name) for name, dtype in columns.items()]
    )


def read_xlsx(spark, path: str, sheet: str | None = None) -> DataFrame:
    """XLSX scan (reference S1). Requires an Excel engine (openpyxl or the
    spark-excel datasource) — not present in this environment, so the reader
    is gated: raises with guidance instead of failing mid-pipeline."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "XLSX ingestion needs openpyxl (driver-side pandas read) or the "
            "com.crealytics:spark-excel datasource on the classpath; neither "
            "is available in this environment. Parquet/JSONL paths cover the "
            "same pipeline shapes."
        ) from e
    pdf = pd.read_excel(path, sheet_name=sheet)  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover


HEADER_REMAP = {
    # Reference S11 (trade_shows/pipeline.py:122-141): human headers → snake.
    "First Name": "first_name",
    "Last Name": "last_name",
    "Email": "email",
    "Company": "company",
    "Phone": "phone",
}


def remap_headers(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    mapping = mapping or HEADER_REMAP
    out = df
    for old, new in mapping.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def synthesize_lead_id(
    df: DataFrame, id_col: str = "lead_id", parts: list[str] | None = None
) -> DataFrame:
    """Deterministic ID synthesis for rows lacking a natural key (reference
    S11: 'gen_'+md5(email|first|last|company|show)[:16],
    trade_shows/pipeline.py:150-161)."""
    parts = parts or ["email", "first_name", "last_name", "company"]
    gen = F.concat(
        F.lit("gen_"),
        F.substring(
            F.md5(F.concat_ws("|", *[F.coalesce(F.col(p), F.lit("")) for p in parts])),
            1,
            16,
        ),
    )
    if id_col in df.columns:
        return df.withColumn(
            id_col, F.coalesce(F.nullif(F.trim(F.col(id_col)), F.lit("")), gen)
        )
    return df.withColumn(id_col, gen)


def read_evolving_parquet(spark, paths: list[str]) -> DataFrame:
    """Schema-evolution tolerant scan (reference §1.3: dlt adds columns as
    new worksheets/fields appear): mergeSchema unions all file schemas."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
