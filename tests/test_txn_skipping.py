"""Manifest-level data skipping on the txn table: commits carry per-file
parquet-footer min/max/null stats; read_where prunes files a conjunction of
predicates provably cannot match, then re-applies the full predicate (pruning
is an optimization, never a correctness dependency).

Soundness edges pinned here: Spark's NaN-sorts-high semantics (float columns
never prune on >, >=, !=), NULL three-valued logic (comparisons never keep a
file alive for its nulls; is_null does), stats surviving checkpoints, and the
no-stats fallback for tables written before the feature existed.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import Row

from importer_spark.txn import TxnTable, _file_may_match


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _three_commit_table(spark, tmp_path):
    """Three single-file commits with disjoint id ranges — the clustered
    layout data skipping rewards."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200):
        t.commit_append(
            spark.createDataFrame(
                [Row(id=lo + i, grp=chr(97 + lo // 100), val=float(lo + i)) for i in range(10)]
            ).coalesce(1)
        )
    return t


def test_point_predicate_prunes_to_one_file(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    rep = t.skipping_report([("id", "==", 105)])
    assert rep["total"] == 3 and len(rep["kept"]) == 1
    assert _rows(t.read_where([("id", "==", 105)])) == [(105, "b", 105.0)]


def test_range_predicate_prunes_and_matches_full_scan(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    conds = [("id", ">=", 200), ("id", "<", 205)]
    rep = t.skipping_report(conds)
    assert len(rep["kept"]) == 1
    from pyspark.sql import functions as F

    full = t.read().filter((F.col("id") >= 200) & (F.col("id") < 205))
    assert _rows(t.read_where(conds)) == _rows(full)


def test_string_predicate_prunes(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    rep = t.skipping_report([("grp", "==", "c")])
    assert len(rep["kept"]) == 1
    assert len(_rows(t.read_where([("grp", "==", "c")]))) == 10


def test_in_predicate(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    rep = t.skipping_report([("id", "in", [5, 205])])
    assert len(rep["kept"]) == 2
    assert len(_rows(t.read_where([("id", "in", [5, 205])]))) == 2


def test_no_file_matches_returns_empty_with_schema(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    out = t.read_where([("id", "==", 999)])
    assert out.count() == 0
    assert out.columns == ["id", "grp", "val"]


def test_float_upper_bound_never_prunes(spark, tmp_path):
    """Spark orders NaN above every double, parquet footers ignore NaNs —
    so a float max is untrustworthy for > / >= / != pruning. The guard is
    conservative even when this table happens to contain no NaN."""
    t = _three_commit_table(spark, tmp_path)
    assert len(t.skipping_report([("val", ">", 1e9)])["kept"]) == 3
    assert len(t.skipping_report([("val", ">=", 1e9)])["kept"]) == 3
    # lower-bound ops stay prunable: NaN never satisfies <, <=, ==
    assert len(t.skipping_report([("val", "<", 50.0)])["kept"]) == 1
    assert len(t.skipping_report([("val", "==", 105.0)])["kept"]) == 1


def test_nan_rows_survive_float_guard(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([Row(id=1, v=1.0), Row(id=2, v=float("nan"))]).coalesce(1)
    )
    # Spark: NaN > 100.0 is TRUE. Pruning must keep the file.
    out = t.read_where([("v", ">", 100.0)])
    assert out.count() == 1  # the NaN row


def test_nan_literal_never_prunes(spark, tmp_path):
    """Spark treats NaN = NaN as TRUE (non-IEEE), so `== NaN` / `in [NaN]`
    CAN match rows — rows the parquet footer stats never counted. A NaN
    literal on a float column must therefore disable pruning entirely
    (ADVICE r4 medium)."""
    nan = float("nan")
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([Row(id=1, v=1.0), Row(id=2, v=nan)]).coalesce(1)
    )
    t.commit_append(
        spark.createDataFrame([Row(id=3, v=500.0), Row(id=4, v=nan)]).coalesce(1)
    )
    # footer stats say [1,1] and [500,500]; both files hold hidden NaNs
    rep = t.skipping_report([("v", "in", [nan, 999.0])])
    assert len(rep["kept"]) == 2  # pruning disabled, not "no file in range"
    assert t.read_where([("v", "in", [nan, 999.0])]).count() == 2  # both NaN rows
    assert len(t.skipping_report([("v", "==", nan)])["kept"]) == 2
    assert t.read_where([("v", "==", nan)]).count() == 2
    # non-NaN IN lists still prune as before (unit level: real footers omit
    # min/max when a page holds NaN, so these files never prune regardless)
    st = {"rows": 2, "cols": {"v": {"min": 1.0, "max": 2.0, "nulls": 0, "float": True}}}
    assert not _file_may_match(st, [("v", "in", [500.0])])
    assert _file_may_match(st, [("v", "in", [500.0, nan])])
    assert _file_may_match(st, [("v", "==", nan)])


def test_read_where_pins_version_against_concurrent_commit(spark, tmp_path):
    """An explicit version stays the version actually scanned even when the
    predicate matches nothing — the empty branch must not slide to a newer
    snapshot committed mid-call (ADVICE r4 low)."""
    t = _three_commit_table(spark, tmp_path)
    v = t.latest_version()
    t.commit_append(
        spark.createDataFrame([Row(id=999, grp="z", val=999.0)]).coalesce(1)
    )
    assert t.read_where([("id", "==", 999)], version=v).count() == 0
    assert t.read_where([("id", "==", 999)]).count() == 1


def test_null_predicates(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(
        spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")]).coalesce(1)
    )
    t.commit_append(
        spark.createDataFrame(
            [Row(id=3, x=None), Row(id=4, x="d")],
            "id bigint, x string",
        ).coalesce(1)
    )
    rep = t.skipping_report([("x", "is_null",)])
    assert len(rep["kept"]) == 1  # only the file with a null
    assert _rows(t.read_where([("x", "is_null")])) == [(3, None)]
    # not_null keeps both (neither file is all-null)
    assert len(t.skipping_report([("x", "not_null")])["kept"]) == 2


def test_timestamp_pruning(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for day in (1, 15):
        t.commit_append(
            spark.createDataFrame(
                [Row(id=day, ts=datetime.datetime(2024, 1, day, 12, 0))]
            ).coalesce(1)
        )
    rep = t.skipping_report([("ts", ">=", datetime.datetime(2024, 1, 10))])
    assert len(rep["kept"]) == 1
    assert t.read_where([("ts", ">=", datetime.datetime(2024, 1, 10))]).count() == 1


def test_stats_survive_checkpoint(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    t.checkpoint()
    # A fresh instance replaying FROM the checkpoint must still prune —
    # stats are materialized into the checkpoint, not recomputed.
    t2 = TxnTable(spark, str(tmp_path / "t"))
    # prove the replay actually starts at the checkpoint: drop the raw
    # manifests' stats so only the checkpoint can supply them
    for v in t2._versions():
        p = os.path.join(t2.log_dir, f"{v:020d}.json")
        m = json.load(open(p))
        m.pop("stats", None)
        json.dump(m, open(p, "w"))
    rep = t2.skipping_report([("id", "==", 105)])
    assert len(rep["kept"]) == 1


def test_stats_refresh_on_delete_rewrite(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    t.commit_delete("id >= 100 and id < 109")  # rewrites the middle file
    rep = t.skipping_report([("id", "==", 109)])
    assert len(rep["kept"]) == 1  # the rewritten survivor file has fresh stats
    assert _rows(t.read_where([("id", "==", 109)])) == [(109, "b", 109.0)]
    assert t.read_where([("id", "==", 105)]).count() == 0


def test_legacy_table_without_stats_still_correct(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    for v in t._versions():
        p = os.path.join(t.log_dir, f"{v:020d}.json")
        m = json.load(open(p))
        m.pop("stats", None)
        json.dump(m, open(p, "w"))
    rep = t.skipping_report([("id", "==", 105)])
    assert len(rep["kept"]) == 3  # nothing pruned...
    assert _rows(t.read_where([("id", "==", 105)])) == [(105, "b", 105.0)]  # ...still right


def test_zorder_compaction_tightens_ranges(spark, tmp_path):
    """Z-ordered compaction + stats = the real pairing: after clustering,
    a range predicate on a clustered column touches a strict subset of
    files."""
    import random

    rng = random.Random(7)
    rows = [Row(id=i, a=rng.randrange(1000), b=rng.randrange(1000)) for i in range(4000)]
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame(rows).repartition(8))  # random layout
    before = t.skipping_report([("a", "<", 100)])
    t.commit_compact(target_files=8, zorder_cols=["a", "b"])
    after = t.skipping_report([("a", "<", 100)])
    assert len(after["kept"]) < len(before["kept"])
    assert t.read_where([("a", "<", 100)]).count() == sum(1 for r in rows if r.a < 100)


def test_unsupported_op_raises(spark, tmp_path):
    t = _three_commit_table(spark, tmp_path)
    with pytest.raises(ValueError):
        t.skipping_report([("id", "like", "x%")])


def test_file_may_match_unit():
    st = {"rows": 10, "cols": {"x": {"min": 5, "max": 9, "nulls": 0}}}
    assert _file_may_match(st, [("x", ">=", 9)])
    assert not _file_may_match(st, [("x", ">", 9)])
    assert not _file_may_match(st, [("x", "==", 4)])
    assert not _file_may_match(st, [("x", "is_null")])
    assert _file_may_match(st, [("y", "==", 1)])  # unknown col: keep
    assert _file_may_match(None, [("x", "==", 1)])  # no stats: keep
    # mixed-type literal never prunes
    assert _file_may_match(st, [("x", "==", "not-an-int")])


def test_catalog_query_layout_prunes_six_of_eight(spark):
    """Pin the file-prune count for txn_skipped_revenue's exact layout
    (8 range-clustered files, half-year predicate): the manifest stats must
    prove at least 6 of 8 files irrelevant — if this drops, the catalog
    query silently degrades to a near-full scan (r4 VERDICT ask: a pinned
    prune count for the read_where-driven catalog row)."""
    from tests.conftest import SF_DIR

    from importer_spark.queries.etl import TXN_SKIP_CONDS, build_orders_txn

    table = build_orders_txn(spark, SF_DIR)
    rep = table.skipping_report(TXN_SKIP_CONDS)
    assert rep["total"] == 8
    assert len(rep["skipped"]) >= 6, rep
