"""Pin Tables.events ts normalization across every parquet generator variant.

The testdata generator has shipped events.ts as TIMESTAMP(MICROS) with a
timezone flag (Spark: TimestampType), without one (Spark: TIMESTAMP_NTZ —
which unix_micros/window range frames reject), and as TIMESTAMP(NANOS)
(which Spark's vectorized reader refuses outright). Tables._read_events
must normalize all three to TimestampType with identical UTC instants.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from importer_spark.io import Tables

TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
]


def _write_events(dir_path, unit: str, tz: str | None) -> None:
    arr = pa.array(TS, type=pa.timestamp(unit, tz=tz))
    table = pa.table({"event_id": pa.array([1, 2], type=pa.int64()), "ts": arr})
    pq.write_table(table, str(dir_path / "events.parquet"))


@pytest.mark.parametrize(
    "unit,tz",
    [("us", "UTC"), ("us", None), ("ns", None)],
    ids=["micros-tz", "micros-ntz", "nanos"],
)
def test_events_ts_normalized_to_timestamp(spark, tmp_path, unit, tz):
    _write_events(tmp_path, unit, tz)
    df = Tables(spark, str(tmp_path)).events
    assert df.schema["ts"].dataType == TimestampType()
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == TS  # session tz is UTC: instants must be value-identical


def test_events_real_testdata_is_timestamp(spark):
    df = Tables(spark, "/root/testdata/sf0.001").events
    assert df.schema["ts"].dataType == TimestampType()


def test_events_missing_ts_column_passthrough(spark, tmp_path):
    table = pa.table({"event_id": pa.array([1], type=pa.int64())})
    pq.write_table(table, str(tmp_path / "events.parquet"))
    df = Tables(spark, str(tmp_path)).events
    assert df.columns == ["event_id"]


def test_events_missing_path_raises(spark, tmp_path):
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist|Path"):
        Tables(spark, str(tmp_path / "nope")).events.count()
