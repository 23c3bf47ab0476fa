"""Transaction-log table format: atomic commits, snapshot isolation, time
travel, optimistic concurrency, merge, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from importer_spark.txn import TxnTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_and_read(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    v0 = t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    v1 = t.commit_append(spark.createDataFrame([Row(id=2, x="b")]))
    assert (v0, v1) == (0, 1)
    assert _rows(t.read()) == [(1, "a"), (2, "b")]


def test_replace_hides_history_and_time_travel(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    t.commit_replace(spark.createDataFrame([Row(id=9, x="z")]))
    assert _rows(t.read()) == [(9, "z")]
    assert _rows(t.read(version=0)) == [(1, "a")]  # time travel


def test_merge_upserts_by_key(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")]))
    t.commit_merge(spark.createDataFrame([Row(id=2, x="B"), Row(id=3, x="c")]), keys=["id"])
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c")]


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    snap = t.read()  # file list resolved NOW
    t.commit_replace(spark.createDataFrame([Row(id=9, x="z")]))
    assert _rows(snap) == [(1, "a")]  # the pinned snapshot is unchanged
    assert _rows(t.read()) == [(9, "z")]


def test_version_conflict_retries_on_top(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    # Simulate a racing writer that claimed version 1 with its own commit.
    racing = {"version": 1, "action": "append", "adds": [], "removes": []}
    with open(os.path.join(str(tmp_path / "t"), "_log", f"{1:020d}.json"), "w") as fh:
        json.dump(racing, fh)
    v = t.commit_append(spark.createDataFrame([Row(id=2, x="b")]))
    assert v == 2  # lost the race for 1, retried on top
    assert _rows(t.read()) == [(1, "a"), (2, "b")]


def test_empty_replace_keeps_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    t.commit_replace(t.read().filter("id < 0"))
    out = t.read()
    assert out.count() == 0
    assert set(out.columns) == {"id", "x"}


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    t.commit_replace(spark.createDataFrame([Row(id=9, x="z")]))
    deleted = t.vacuum(retain_from_version=1)
    assert deleted  # v0's files are gone
    assert _rows(t.read()) == [(9, "z")]  # current snapshot untouched
    with pytest.raises(Exception):
        t.read(version=0).collect()  # time travel below the floor is dead


def test_read_before_any_commit_raises(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read()


def test_streaming_exactly_once_append(spark, tmp_path):
    """A replayed micro-batch (same batchId) must be a no-op: rows land once."""
    from importer_spark.streaming.txn_sink import exactly_once_append

    t = TxnTable(spark, str(tmp_path / "t"))
    write = exactly_once_append(t, "load-1")
    b0 = spark.createDataFrame([Row(id=1, x="a")])
    b1 = spark.createDataFrame([Row(id=2, x="b")])
    write(b0, 0)
    write(b0, 0)  # crash-replay of epoch 0
    write(b1, 1)
    write(b1, 1)
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    assert t.latest_version() == 1  # two commits, not four


def test_streaming_exactly_once_through_real_stream(spark, tmp_path):
    """Drive it through an actual Structured Streaming query (file source,
    availableNow) — the foreachBatch wiring, not just the callback."""
    from importer_spark.streaming.txn_sink import exactly_once_append

    src = tmp_path / "src"
    spark.createDataFrame([Row(id=i, x=str(i)) for i in range(5)]).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    t = TxnTable(spark, str(tmp_path / "t"))
    q = (
        spark.readStream.schema(schema).format("parquet").load(str(src))
        .writeStream.foreachBatch(exactly_once_append(t, "stream-1"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_change_data_feed(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))   # v0
    t.commit_append(spark.createDataFrame([Row(id=2, x="b")]))   # v1
    t.commit_append(spark.createDataFrame([Row(id=3, x="c")]))   # v2
    assert _rows(t.read_changes(0)) == [(2, "b"), (3, "c")]      # after v0
    assert _rows(t.read_changes(0, 1)) == [(2, "b")]             # bounded
    assert t.read_changes(2).count() == 0                        # caught up


def test_schema_evolution_merge_schema_read(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    t.commit_append(spark.createDataFrame([Row(id=2, x="b", y=7)]))  # new col
    out = t.read(merge_schema=True)
    assert set(out.columns) == {"id", "x", "y"}
    got = {r["id"]: r["y"] for r in out.collect()}
    assert got == {1: None, 2: 7}  # pre-evolution rows read the column as null


def test_checkpoint_replay_equivalence(spark, tmp_path):
    """Reads through a checkpoint must equal full-log replay, including
    commits after the checkpoint and time travel before it."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))   # v0
    t.commit_replace(spark.createDataFrame([Row(id=2, x="b")]))  # v1
    full_v1 = _rows(t.read(1))
    t.checkpoint(1)
    t.commit_append(spark.createDataFrame([Row(id=3, x="c")]))   # v2 after ckpt
    assert _rows(t.read(1)) == full_v1                 # via checkpoint
    assert _rows(t.read()) == [(2, "b"), (3, "c")]     # ckpt + tail replay
    assert _rows(t.read(0)) == [(1, "a")]              # pre-ckpt time travel
    t.checkpoint()                                      # idempotent re-claim
    t.checkpoint()
    assert _rows(t.read()) == [(2, "b"), (3, "c")]


def test_delete_rewrites_only_hit_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")]))  # file A
    t.commit_append(spark.createDataFrame([Row(id=10, x="z")]))                   # file B
    before = set(t._snapshot_files(t.latest_version()))
    t.commit_delete("id = 2")
    after = set(t._snapshot_files(t.latest_version()))
    assert _rows(t.read()) == [(1, "a"), (10, "z")]
    # file B (no matches) carried over BY REFERENCE; file A was rewritten
    assert before & after, "untouched file should survive by reference"
    assert before != after


def test_delete_no_match_is_noop(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    v = t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    assert t.commit_delete("id = 99") == v  # no new version
    assert _rows(t.read()) == [(1, "a")]


def test_compaction_preserves_rows_and_history(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit_append(spark.createDataFrame([Row(id=i, x=str(i))]))
    rows_before = _rows(t.read())
    n_files_before = len(t._snapshot_files(t.latest_version()))
    v = t.commit_compact(target_files=1)
    assert _rows(t.read()) == rows_before
    assert len(t._snapshot_files(v)) < n_files_before
    assert _rows(t.read(version=1)) == rows_before[:2]  # time travel intact


def test_full_lifecycle_integration(spark, tmp_path):
    """The whole table lifecycle in order: streamed appends -> merge ->
    file-granular delete -> compaction -> checkpoint -> vacuum — every
    stage preserving exactly the expected rows."""
    from importer_spark.streaming.txn_sink import exactly_once_append

    t = TxnTable(spark, str(tmp_path / "t"))
    write = exactly_once_append(t, "life")
    write(spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")]), 0)
    write(spark.createDataFrame([Row(id=3, x="c")]), 1)
    write(spark.createDataFrame([Row(id=3, x="c")]), 1)  # replay no-op
    t.commit_merge(spark.createDataFrame([Row(id=2, x="B"), Row(id=4, x="d")]), keys=["id"])
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    t.commit_delete("id = 3")
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (4, "d")]
    v = t.commit_compact(target_files=1)
    assert len(t._snapshot_files(v)) == 1
    t.checkpoint()
    floor = t.latest_version()
    deleted = t.vacuum(retain_from_version=floor)
    assert deleted  # pre-compaction files physically gone
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (4, "d")]
    # appends still work on the vacuumed, checkpointed table
    t.commit_append(spark.createDataFrame([Row(id=9, x="z")]))
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (4, "d"), (9, "z")]


def test_read_nonexistent_version_raises(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    with pytest.raises(ValueError, match="does not exist"):
        t.read(version=7)


def test_vacuum_floor_above_latest_refuses(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a")]))
    with pytest.raises(ValueError, match="exceeds latest"):
        t.vacuum(retain_from_version=99)
    assert _rows(t.read()) == [(1, "a")]  # nothing was deleted


def test_merge_version_guard_ignores_stale_updates(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="v5", ver=5)]))
    # Late-arriving older changelog entry must NOT regress state…
    t.commit_merge(spark.createDataFrame([Row(id=1, x="v3", ver=3)]), keys=["id"], version_col="ver")
    assert _rows(t.read()) == [(1, "v5", 5)]
    # …but a newer one applies, and only the newest of several lands.
    t.commit_merge(
        spark.createDataFrame([Row(id=1, x="v6", ver=6), Row(id=1, x="v8", ver=8)]),
        keys=["id"], version_col="ver",
    )
    assert _rows(t.read()) == [(1, "v8", 8)]


def test_merge_delete_markers_remove_keys(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a", ver=1), Row(id=2, x="b", ver=1)]))
    changelog = spark.createDataFrame(
        [Row(id=1, x=None, ver=2, deleted=True), Row(id=3, x="c", ver=2, deleted=False)]
    )
    t.commit_merge(changelog, keys=["id"], version_col="ver", delete_col="deleted")
    assert _rows(t.read()) == [(2, "b", 1), (3, "c", 2)]
    assert "deleted" not in t.read().columns


def test_merge_delete_on_bootstrap_is_filtered(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    changelog = spark.createDataFrame(
        [Row(id=1, x="a", deleted=False), Row(id=2, x="dead", deleted=True)]
    )
    t.commit_merge(changelog, keys=["id"], delete_col="deleted")
    assert _rows(t.read()) == [(1, "a")]


def test_streaming_exactly_once_merge(spark, tmp_path):
    """CDC changelog batches applied exactly once: replayed epochs are
    version-free no-ops; version guard + tombstones flow through."""
    from importer_spark.streaming.txn_sink import exactly_once_merge

    t = TxnTable(spark, str(tmp_path / "t"))
    apply = exactly_once_merge(t, "cdc", keys=["id"], version_col="ver", delete_col="dead")
    b0 = spark.createDataFrame(
        [Row(id=1, x="a", ver=1, dead=False), Row(id=2, x="b", ver=1, dead=False)]
    )
    b1 = spark.createDataFrame(
        [Row(id=1, x="a2", ver=2, dead=False), Row(id=2, x=None, ver=2, dead=True)]
    )
    apply(b0, 0)
    apply(b0, 0)  # replay
    v_after_b0 = t.latest_version()
    apply(b1, 1)
    apply(b1, 1)  # replay
    assert _rows(t.read()) == [(1, "a2", 2)]
    assert t.latest_version() == v_after_b0 + 1  # replays created no versions


def test_compaction_with_zorder_tightens_layout(spark, tmp_path):
    import pyarrow.parquet as pq
    import os as _os

    t = TxnTable(spark, str(tmp_path / "t"))
    rows = [Row(id=i, a=i % 50, b=(i * 7) % 50) for i in range(2000)]
    t.commit_append(spark.createDataFrame(rows))
    v = t.commit_compact(target_files=4, zorder_cols=["a", "b"])
    # Rows preserved...
    assert t.read().count() == 2000
    # ...and per-file spans on BOTH clustered columns shrink vs full range.
    spans = []
    for f in t._snapshot_files(v):
        md = pq.ParquetFile(_os.path.join(str(tmp_path / "t"), "data", f)).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rg = md.row_group(0)
        sa = rg.column(cols["a"]).statistics
        sb = rg.column(cols["b"]).statistics
        spans.append(((sa.max - sa.min), (sb.max - sb.min)))
    avg_a = sum(s[0] for s in spans) / len(spans)
    avg_b = sum(s[1] for s in spans) / len(spans)
    assert avg_a < 49 * 0.8 and avg_b < 49 * 0.8, spans


def test_concurrent_writers_no_lost_updates(spark, tmp_path):
    """4 threads x 3 appends racing for versions: every commit must land
    (optimistic retries), producing exactly 12 versions and all 12 rows."""
    from concurrent.futures import ThreadPoolExecutor

    t = TxnTable(spark, str(tmp_path / "t"))

    def writer(i):
        for j in range(3):
            t.commit_append(spark.createDataFrame([Row(id=i * 10 + j, x=f"w{i}")]))

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(writer, range(4)))
    assert t.latest_version() == 11  # 12 commits, versions 0..11
    ids = sorted(r.id for r in t.read().collect())
    assert ids == sorted(i * 10 + j for i in range(4) for j in range(3))


def test_merge_engines_agree_on_random_sequences(spark, tmp_path):
    """The two upsert engines — bucket-pruned merge_by_key and the
    txn-log commit_merge — must converge to the same table from the same
    random versioned batch sequence (cross-implementation consistency)."""
    import random

    from importer_spark.io import merge_by_key

    rng = random.Random(11)
    t = TxnTable(spark, str(tmp_path / "txn"))
    mbk_path = str(tmp_path / "mbk")
    for batch_no in range(4):
        rows = [
            Row(
                k=rng.randrange(8),
                v=f"b{batch_no}r{i}",
                ver=batch_no * 10 + rng.randrange(5),
            )
            for i in range(6)
        ]
        # Within-batch key collisions: keep highest version (deterministic
        # tie-break on v) so both engines see an unambiguous batch.
        best = {}
        for r in rows:
            cur = best.get(r.k)
            if cur is None or (r.ver, r.v) > (cur.ver, cur.v):
                best[r.k] = r
        batch = spark.createDataFrame(list(best.values()))
        merge_by_key(spark, batch, mbk_path, keys=["k"], version_col="ver", n_buckets=4)
        t.commit_merge(batch, keys=["k"], version_col="ver")
    mbk = sorted(tuple(r) for r in spark.read.parquet(mbk_path).select("k", "v", "ver").collect())
    txn = sorted(tuple(r) for r in t.read().select("k", "v", "ver").collect())
    assert mbk == txn and len(mbk) > 0


# --- round-4 conflict-safety fixes (ADVICE r3) ------------------------------


def test_merge_racing_commit_raises_conflict_not_duplicates(spark, tmp_path):
    """Two racing snapshot-dependent commits: the loser's removes are stale
    (computed against the pre-race snapshot), so blindly retrying on top
    would duplicate nearly the whole table. The loser must raise
    TxnConflict instead (Delta conflict rule)."""
    from importer_spark.txn import TxnConflict

    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="a"), Row(id=2, x="b")]))

    # Deterministic race: hijack the data-file write so a concurrent append
    # lands BETWEEN commit_merge's snapshot read and its publish.
    t2 = TxnTable(spark, str(tmp_path / "t"))
    orig = t._write_data_files
    fired = []

    def hijack(df, hint):
        names = orig(df, hint)
        if not fired:
            fired.append(True)
            t2.commit_append(spark.createDataFrame([Row(id=99, x="concurrent")]))
        return names

    t._write_data_files = hijack
    with pytest.raises(TxnConflict, match="snapshot moved"):
        t.commit_merge(spark.createDataFrame([Row(id=2, x="B")]), keys=["id"])
    t._write_data_files = orig
    # The concurrent append survived untouched; the failed merge left no
    # manifest (only vacuumable garbage files).
    assert _rows(t.read().select("id", "x")) == [(1, "a"), (2, "b"), (99, "concurrent")]
    # Recompute-and-retry against the fresh snapshot now succeeds.
    t.commit_merge(spark.createDataFrame([Row(id=2, x="B")]), keys=["id"])
    assert _rows(t.read().select("id", "x")) == [(1, "a"), (2, "B"), (99, "concurrent")]


def test_delete_racing_compact_raises_conflict(spark, tmp_path):
    """delete vs compact race: compact's removes reference the pre-delete
    files, so publishing it after the delete would resurrect deleted rows."""
    from importer_spark.txn import TxnConflict

    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=i, x=str(i)) for i in range(10)]))
    t2 = TxnTable(spark, str(tmp_path / "t"))
    orig = t._write_data_files
    fired = []

    def hijack(df, hint):
        names = orig(df, hint)
        if not fired:
            fired.append(True)
            t2.commit_delete("id = 3")
        return names

    t._write_data_files = hijack
    with pytest.raises(TxnConflict, match="snapshot moved"):
        t.commit_compact(target_files=1)
    t._write_data_files = orig
    assert sorted(r.id for r in t.read().collect()) == [i for i in range(10) if i != 3]
    t.commit_compact(target_files=1)  # retry on the fresh snapshot works
    assert sorted(r.id for r in t.read().collect()) == [i for i in range(10) if i != 3]


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE three-valued logic: a row whose predicate evaluates NULL
    is NOT deleted — filter(cond)/filter(~cond) are not complements, so the
    survivors rewrite must coalesce NULL to false. The NULL row shares a
    data file with a matching row to force the rewrite path."""
    t = TxnTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(id=1, x=2), Row(id=2, x=None), Row(id=3, x=7)],
        schema="id INT, x INT",
    ).coalesce(1)  # one file: the NULL row co-locates with the x=2 match
    t.commit_append(df)
    t.commit_delete("x = 2")
    got = sorted(((r.id, r.x) for r in t.read().collect()), key=str)
    assert got == sorted([(2, None), (3, 7)], key=str)


def test_merge_plain_path_dedups_source_keys(spark, tmp_path):
    """Plain (no version_col) merge with duplicated source keys lands
    exactly ONE row per key, chosen deterministically (max over the non-key
    columns) — consistent with the versioned path instead of landing every
    duplicate."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.commit_append(spark.createDataFrame([Row(id=1, x="old")]))
    src = spark.createDataFrame(
        [Row(id=1, x="a"), Row(id=1, x="z"), Row(id=2, x="m"), Row(id=2, x="b")]
    )
    t.commit_merge(src, keys=["id"])
    assert _rows(t.read()) == [(1, "z"), (2, "m")]
    # Bootstrap (empty-table) path dedups identically.
    t2 = TxnTable(spark, str(tmp_path / "t2"))
    t2.commit_merge(src, keys=["id"])
    assert _rows(t2.read()) == [(1, "z"), (2, "m")]


def test_streaming_sink_caches_high_water_mark(spark, tmp_path):
    """The exactly-once guard consults the log newest-first and caches the
    last batchId between batches — replays skip without a full log scan."""
    from importer_spark.streaming.txn_sink import (
        exactly_once_append,
        last_committed_batch_id,
    )

    t = TxnTable(spark, str(tmp_path / "t"))
    write = exactly_once_append(t, "q1")
    write(spark.createDataFrame([Row(id=1)]), 0)
    write(spark.createDataFrame([Row(id=2)]), 1)
    write(spark.createDataFrame([Row(id=2)]), 1)  # replay: cached skip
    write(spark.createDataFrame([Row(id=3)]), 2)
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]
    assert last_committed_batch_id(t, "q1") == 2
    assert last_committed_batch_id(t, "nope") is None
    # A fresh process (new callback, cold cache) still skips replays.
    write2 = exactly_once_append(t, "q1")
    write2(spark.createDataFrame([Row(id=99)]), 2)  # replayed epoch
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_log_store_put_if_absent_contract(tmp_path):
    """Both stores honor the one-winner-per-key contract: first put True,
    second put False, first payload intact (never overwritten)."""
    from importer_spark.txn import ConditionalPutLogStore, FilesystemLogStore

    for store in (FilesystemLogStore(), ConditionalPutLogStore()):
        d = str(tmp_path / type(store).__name__)
        import os

        os.makedirs(d, exist_ok=True)
        assert store.put_if_absent(d, "00000000000000000001.json", b'{"v":1}')
        assert not store.put_if_absent(d, "00000000000000000001.json", b'{"v":2}')
        with open(os.path.join(d, "00000000000000000001.json"), "rb") as fh:
            assert fh.read() == b'{"v":1}'
        # No temp litter left behind.
        assert [f for f in os.listdir(d) if f.startswith("_tmp")] == []


def test_conditional_put_store_contention(spark, tmp_path):
    """r6 verdict #6: the object-store adapter is code, not a comment —
    the same racing-writers scenario as the filesystem store, run through
    the conditional-put twin: 4 threads x 3 appends, every commit lands,
    exactly 12 versions, no lost updates, readers see whole commits."""
    from concurrent.futures import ThreadPoolExecutor

    from importer_spark.txn import ConditionalPutLogStore

    t = TxnTable(spark, str(tmp_path / "t"), log_store=ConditionalPutLogStore())

    def writer(i):
        for j in range(3):
            t.commit_append(spark.createDataFrame([Row(id=i * 10 + j, x=f"w{i}")]))

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(writer, range(4)))
    assert t.latest_version() == 11
    ids = sorted(r.id for r in t.read().collect())
    assert ids == sorted(i * 10 + j for i in range(4) for j in range(3))
    # The snapshot-conditional conflict rule holds through the injected
    # store too: a replace computed against a stale base must raise.
    t2 = TxnTable(spark, str(tmp_path / "t"), log_store=ConditionalPutLogStore())
    base = t2.latest_version()
    t.commit_append(spark.createDataFrame([Row(id=999, x="mover")]))
    import pytest as _pytest

    from importer_spark.txn import TxnConflict

    df = spark.createDataFrame([Row(id=0, x="replace")])
    adds = t2._write_data_files(df, (t2.latest_version() or 0) + 1)
    with _pytest.raises(TxnConflict):
        t2._publish(
            {"action": "replace", "adds": adds, "removes": []},
            expected_base=base,
        )


def test_conditional_put_failed_write_leaves_nothing(tmp_path, monkeypatch):
    """r7 review: a write failure mid-PUT (ENOSPC, interrupt) must not
    leave the version claimed with a torn manifest — real conditional-PUT
    stores land all-or-nothing, so the model undoes the O_EXCL claim
    before the error propagates and a retry can still win the name."""
    import os

    import pytest as _pytest

    from importer_spark.txn import ConditionalPutLogStore

    store = ConditionalPutLogStore()
    d = str(tmp_path)
    name = "00000000000000000001.json"

    real_fsync = os.fsync
    calls = {"n": 0}

    def failing_fsync(fd):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError(28, "No space left on device")
        return real_fsync(fd)

    monkeypatch.setattr(os, "fsync", failing_fsync)
    with _pytest.raises(OSError):
        store.put_if_absent(d, name, b'{"v":1}')
    # Nothing landed: no torn object, and the version number is still free.
    assert not os.path.exists(os.path.join(d, name))
    # The retry wins and the payload is intact end-to-end.
    assert store.put_if_absent(d, name, b'{"v":1}')
    with open(os.path.join(d, name), "rb") as fh:
        assert fh.read() == b'{"v":1}'


def test_conditional_put_completes_short_writes(tmp_path, monkeypatch):
    """POSIX os.write may write fewer bytes than asked; the PUT loop must
    finish the payload rather than silently truncating the manifest."""
    import os

    from importer_spark.txn import ConditionalPutLogStore

    real_write = os.write

    def one_byte_write(fd, data):
        return real_write(fd, bytes(data)[:1])

    monkeypatch.setattr(os, "write", one_byte_write)
    payload = b'{"v": 12345, "pad": "abcdefgh"}'
    assert ConditionalPutLogStore().put_if_absent(str(tmp_path), "x.json", payload)
    monkeypatch.undo()
    with open(tmp_path / "x.json", "rb") as fh:
        assert fh.read() == payload
