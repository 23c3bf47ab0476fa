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


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54 (column letters only; row digits ignored)."""
    idx = 0
    for ch in cell_ref:
        if ch.isdigit():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _xlsx_rows(path: str, sheet: str | None) -> list[list[str | None]]:
    """Parse an .xlsx (it is a zip of SpreadsheetML XML) with the stdlib —
    no Excel engine needed. Handles shared strings, inline strings, rich-text
    runs, numbers/booleans as raw text, and sparse cells (gaps become None).
    All values surface as STRINGS: the reference's dlt load forces strings
    anyway (X5), and typing is the caller's projection step."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        target = "xl/worksheets/sheet1.xml"
        if sheet is not None:
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
            # Relative targets resolve against xl/ (the rels live in
            # xl/_rels); absolute targets ('/xl/worksheets/...') are already
            # package-rooted and must NOT be re-prefixed.
            rid_to_target = {
                r.get("Id"): (
                    t.lstrip("/") if t.startswith("/") else "xl/" + t
                )
                for r in rels.findall(f"{rel_ns}Relationship")
                for t in [r.get("Target")]
            }
            doc_rel = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
            for s in wb.iter(f"{_XLSX_NS}sheet"):
                if s.get("name") == sheet:
                    target = rid_to_target[s.get(f"{doc_rel}id")]
                    break
            else:
                raise ValueError(f"sheet {sheet!r} not found in {path}")
        rows: list[list[str | None]] = []
        root = ET.fromstring(z.read(target))
        for row_el in root.iter(f"{_XLSX_NS}row"):
            cells: dict[int, str | None] = {}
            pos = 0
            for c in row_el.findall(f"{_XLSX_NS}c"):
                idx = _col_index(c.get("r")) if c.get("r") else pos
                pos = idx + 1
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{_XLSX_NS}v")
                    val = None if v is None else v.text
                    if ctype == "s" and val is not None:
                        val = shared[int(val)]
                cells[idx] = val
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
    return rows


def read_xlsx(spark, path: str, sheet: str | None = None) -> DataFrame:
    """XLSX scan (reference S1: pipelines/trade_shows + quickbooks XLSX
    exports). Pure-stdlib SpreadsheetML parse (zipfile + ElementTree) —
    no openpyxl/spark-excel dependency. First row is the header; every
    column is a string (see _xlsx_rows). XLSX files are driver-sized by
    nature (the reference's are ~2k rows); for many files, parallelize by
    FILE (one task per workbook via discover_files), not within one."""
    rows = _xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    # Width follows the widest row: exports sometimes carry data in columns
    # whose header cell is blank (named col_{i} here, like pandas' Unnamed).
    width = max(len(r) for r in rows)
    head = rows[0] + [None] * (width - len(rows[0]))
    header = [h if h else f"col_{i}" for i, h in enumerate(head)]
    data = [
        tuple((r[i] if i < len(r) else None) for i in range(width))
        for r in rows[1:]
    ]
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(h, StringType(), True) for h in header])
    return spark.createDataFrame(data, schema)


def read_xlsx_distributed(
    spark,
    path_glob: str,
    sheet: str | None = None,
    columns: list[str] | None = None,
    source_col: str = "_source_file",
) -> DataFrame:
    """Many-workbook XLSX ingest as ONE distributed job — the 100 TB
    posture for reference S1 (the driver-side read_xlsx stays the
    per-file decoder). ``binaryFile`` scans the glob so workbook BYTES ship
    to executors (one input split per file — Spark never splits binaryFile
    rows), and an Arrow-batched mapInPandas parses each workbook with the
    same pure-stdlib SpreadsheetML parser, so N workbooks parse in
    parallel across the cluster with the driver never holding file
    contents.

    ``columns``: the target schema (header names). When omitted, the
    first workbook (by path order) is probed on the driver — one small
    file read, NOT the whole corpus. Per-workbook header drift is aligned
    BY NAME against the target: missing columns surface as null, extra
    columns are dropped (the remap/typing projection is the caller's next
    step, as with read_xlsx). Every value is a string; ``source_col``
    carries the originating file for lineage/debugging.
    """
    import pandas as pd

    binary = spark.read.format("binaryFile").load(path_glob)
    if columns is None:
        # Schema probe: collect ONE workbook's bytes (works on any
        # Spark-readable filesystem — file://, hdfs://, s3a://), parse its
        # header row. One small file, never the corpus.
        import io

        first = binary.select("path", "content").orderBy("path").limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no files match {path_glob}")
        head_rows = _xlsx_rows(io.BytesIO(first[0]["content"]), sheet)
        if not head_rows:
            raise ValueError(f"empty worksheet in {first[0]['path']}")
        head = head_rows[0]
        columns = [h if h else f"col_{i}" for i, h in enumerate(head)]
    out_cols = list(columns) + [source_col]
    schema = ", ".join(f"`{c}` string" for c in out_cols)

    def parse(batches):
        import io

        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = _xlsx_rows(io.BytesIO(row["content"]), sheet)
                if not rows:
                    continue
                width = max(len(r) for r in rows)
                head = list(rows[0]) + [None] * (width - len(rows[0]))
                header = [h if h else f"col_{i}" for i, h in enumerate(head)]
                pos = {h: i for i, h in enumerate(header)}
                data = {
                    c: [
                        (r[pos[c]] if pos.get(c) is not None and pos[c] < len(r) else None)
                        for r in rows[1:]
                    ]
                    if c in pos
                    else [None] * (len(rows) - 1)
                    for c in columns
                }
                data[source_col] = [row["path"]] * (len(rows) - 1)
                yield pd.DataFrame(data, columns=out_cols)

    # content+path only: column pruning keeps modificationTime/length out of
    # the Arrow transfer.
    return binary.select("path", "content").mapInPandas(parse, schema=schema)


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
