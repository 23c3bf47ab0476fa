"""Streaming throughput floors: the txn CDC sink and the stateful
sessionizer must stay within 4-5x of their recorded sf0.1 numbers
(PERF.md §streaming) — a collapse (accidental per-row path, log-scan
regression, state blowup) fails loudly; machine noise does not."""

from __future__ import annotations

from tools.bench_streaming import bench_exactly_once_merge, bench_stateful_sessions

SF_DIR = "/root/testdata/sf0.1"

# Recorded 2026-08-14 on local[32]: merge 8877 rows/s, sessions 18669 rows/s.
MERGE_FLOOR = 2000
SESSIONS_FLOOR = 4000


def test_exactly_once_merge_throughput(spark):
    r = bench_exactly_once_merge(spark, SF_DIR, n_batches=5)
    assert r["rows"] == 100_000
    assert r["rows_per_s"] >= MERGE_FLOOR, r


def test_stateful_sessions_throughput(spark):
    r = bench_stateful_sessions(spark, SF_DIR)
    assert r["rows"] == 100_000
    assert r["sessions_emitted"] > 0
    assert r["rows_per_s"] >= SESSIONS_FLOOR, r
