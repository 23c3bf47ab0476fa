from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from importer_spark.io import TABLES
from importer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="importer-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # Spark multi-file table dir → glob
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _cell(v) -> str:
    """Canonical string form so Spark/DuckDB pandas dtypes compare equal."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_,)):
        v = bool(v)
    if isinstance(v, float):
        # IEEE -0.0 == 0.0; engines disagree on the sign of a rounded zero
        # (Spark ROUND normalizes via BigDecimal to +0.0, DuckDB keeps -0.0
        # — surfaced by the sf1 gate on 10x-diluted ratio shares).
        return repr(v + 0.0 if v == 0 else v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v) + 0.0 if v == 0 else float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(_cell)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def assert_query_matches(spark, name: str, sf_dir: str = SF_DIR):
    """Mirror of the driver's t2 gate: run the Spark query and the DuckDB
    oracle on the same parquet dir; compare row count, column set, and
    order-insensitive values."""
    from importer_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck_con(sf_dir).execute(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    a, b = canonical(sdf), canonical(odf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first differing rows:\n"
            f"spark:\n{a[diff_mask].head(5)}\noracle:\n{b[diff_mask].head(5)}"
        )
