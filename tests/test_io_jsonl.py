"""JSONL round-trip: export sink (S6) + null-forcing reader (S4/X5)."""

from __future__ import annotations

from pyspark.sql import Row

from importer_spark.io import export_jsonl_snapshot, read_jsonl


def test_jsonl_export_and_reimport(spark, tmp_path):
    path = str(tmp_path / "hist")
    df = spark.createDataFrame(
        [
            Row(item="a", snapshot_date="2024-01-01", qty=1, note="x"),
            Row(item="b", snapshot_date="2024-02-01", qty=2, note=None),
        ]
    )
    export_jsonl_snapshot(df, path, "snapshot_date", order_by=["item", "snapshot_date"])
    # Incremental export: only rows after the last snapshot.
    more = spark.createDataFrame(
        [
            Row(item="a", snapshot_date="2024-01-15", qty=9, note="old"),  # filtered
            Row(item="c", snapshot_date="2024-03-01", qty=3, note="new"),
        ]
    )
    export_jsonl_snapshot(more, path, "snapshot_date", after="2024-02-01")
    back = read_jsonl(spark, path)
    rows = {r.item: (r.snapshot_date, r.note) for r in back.collect()}
    assert set(rows) == {"a", "b", "c"}
    # read_jsonl forces nulls on string columns to '' (dlt behavior, X5).
    assert rows["b"][1] == ""
    # P2 SELECT * EXCEPT — drop on reimport.
    assert "note" not in back.drop("note").columns
