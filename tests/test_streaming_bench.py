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


def _best_of(bench_fn, floor, retries=2):
    """bench.py's retry discipline for absolute throughput floors (r10:
    the ssjoin floor tripped at 3869 vs 5000 rows/s inside a full-suite
    run on a session whose calibration read the shared host ~2× slow,
    then cleared 5000 immediately in isolation). Noise only ever
    DEFLATES throughput, so keep the best of up to ``retries + 1`` runs
    and stop early once the floor clears; a genuine collapse — the
    floors sit 4-5× under the recorded numbers — fails every attempt.
    Clean sessions still pay exactly one run."""
    best = bench_fn()
    for _ in range(retries):
        if best["rows_per_s"] >= floor:
            break
        r = bench_fn()
        if r["rows_per_s"] > best["rows_per_s"]:
            best = r
    return best


def test_exactly_once_merge_throughput(spark):
    r = _best_of(lambda: bench_exactly_once_merge(spark, SF_DIR, n_batches=5), MERGE_FLOOR)
    assert r["rows"] == 100_000
    assert r["rows_per_s"] >= MERGE_FLOOR, r


def test_stateful_sessions_throughput(spark):
    r = _best_of(lambda: bench_stateful_sessions(spark, SF_DIR), SESSIONS_FLOOR)
    assert r["rows"] == 100_000
    assert r["sessions_emitted"] > 0
    assert r["rows_per_s"] >= SESSIONS_FLOOR, r


# Recorded 2026-08-14 (r5) on local[32]: join 28991 rows/s (342 pairs),
# dedup 178958 rows/s over the doubled stream.
SSJOIN_FLOOR = 5000
SDEDUP_FLOOR = 20000


def test_stream_stream_join_throughput(spark):
    from tools.bench_streaming import bench_stream_stream_join

    r = _best_of(lambda: bench_stream_stream_join(spark, SF_DIR), SSJOIN_FLOOR)
    assert r["rows"] == 100_000
    assert r["pairs_emitted"] > 0
    assert r["rows_per_s"] >= SSJOIN_FLOOR, r


def test_stream_dedup_throughput(spark):
    from tools.bench_streaming import bench_stream_dedup

    r = _best_of(lambda: bench_stream_dedup(spark, SF_DIR), SDEDUP_FLOOR)
    assert r["rows"] == 200_000
    assert r["unique_emitted"] == 100_000  # dedup exactly halves the stream
    assert r["rows_per_s"] >= SDEDUP_FLOOR, r


def test_merge_amortizes_at_batch_scale(spark):
    """r6 (r5 verdict item 7): the merge sink's cost is per-COMMIT, not
    per-row — the same 100k rows pushed as ONE batch must clear at least
    1.8x the 10-batch throughput measured in the same session (relative
    floor: immune to machine noise, pins the amortization curve itself;
    the absolute 100x-scale point — 10M rows / 1M-row batches =
    364,787 rows/s — is recorded in PERF.md)."""
    # Best-of-2 per configuration, interleaved (r6 advice): a single run
    # per side can flake under ambient load or JIT/warmup skew even though
    # the typical margin is ~3.7x; interleaving means any transient
    # slowdown hits both configurations, and best-of-2 is the throughput
    # twin of the bench's min-of-2 time convention.
    runs = [
        bench_exactly_once_merge(spark, SF_DIR, n_batches=n)
        for n in (10, 1, 10, 1)
    ]
    assert all(r["rows"] == 100_000 for r in runs)
    many = max(runs[0]["rows_per_s"], runs[2]["rows_per_s"])
    one = max(runs[1]["rows_per_s"], runs[3]["rows_per_s"])
    assert one >= 1.8 * many, (one, many, runs)
