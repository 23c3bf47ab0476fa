"""Cross-round anchor-query ratchet (r9 verdict #4).

The single-round regression gate compares each round only to the PREVIOUS
round's re-pinned baseline, so a 5%/round drift (r8→r9 isolated median was
1.059×) compounds invisibly. ANCHOR_TREND.json (tools/update_anchor_trend.py,
appended once per round after the official pin) records ~15 stable anchor
queries' isolated times plus the calibration anchor per round; this test
fails when any anchor's calibration-normalized time has drifted past the
ratchet versus its FIRST recorded round, sustained across the latest
window of rounds (min-of-window, so one noisy round can't fire it).

Normalization: t_norm = t * (cal_first / cal_round) — the same
base_cal/this_cal convention bench.py uses, anchored at the first
recorded round so every later round is judged on one fixed scale.
"""

from __future__ import annotations

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
TREND_PATH = os.path.join(HERE, os.pardir, "ANCHOR_TREND.json")

RATCHET = 1.3  # normalized drift vs the first recorded round
SUSTAIN_ROUNDS = 3  # the drift must hold across this many latest rounds
NOISE_FLOOR_SEC = 0.3  # absolute normalized delta below this never fires


def _drifts(trend: dict, ratchet: float = RATCHET) -> list[tuple]:
    rounds = trend["rounds"]
    if len(rounds) < SUSTAIN_ROUNDS:
        return []
    first = rounds[0]
    window = rounds[-SUSTAIN_ROUNDS:]
    out = []
    for a in trend["anchors"]:
        base = first["queries"].get(a)
        if not base:
            continue
        # min over the window: a genuine creep holds on EVERY recent round,
        # one slow-host round does not.
        norm = [
            r["queries"][a] * (first["calibration_seconds"] / r["calibration_seconds"])
            for r in window
            if a in r["queries"] and r.get("calibration_seconds")
        ]
        if len(norm) < SUSTAIN_ROUNDS:
            continue
        worst_sustained = min(norm)
        if worst_sustained > base * ratchet and worst_sustained - base > NOISE_FLOOR_SEC:
            out.append((a, base, round(worst_sustained, 3)))
    return out


def test_no_sustained_anchor_drift():
    if not os.path.exists(TREND_PATH):
        pytest.skip("no ANCHOR_TREND.json recorded yet")
    with open(TREND_PATH) as fh:
        trend = json.load(fh)
    if len(trend["rounds"]) < SUSTAIN_ROUNDS:
        pytest.skip(
            f"only {len(trend['rounds'])} round(s) recorded; the ratchet "
            f"arms at {SUSTAIN_ROUNDS}"
        )
    drifted = _drifts(trend)
    assert not drifted, (
        "anchors drifted >1.3x (calibration-normalized, sustained across "
        f"the latest {SUSTAIN_ROUNDS} rounds) vs their first recorded "
        f"round (name, first_s, sustained_norm_s): {drifted}"
    )


# --- synthetic tests for the ratchet itself ---------------------------------

def _synth(rows):
    return {
        "anchors": ["qa"],
        "rounds": [
            {"round": i + 1, "calibration_seconds": cal, "queries": {"qa": t}}
            for i, (t, cal) in enumerate(rows)
        ],
    }


def test_ratchet_fires_on_compounding_creep():
    """5%/round drift with a steady calibration: invisible to the
    round-over-round gate, caught here once it compounds past 1.3x."""
    rows = [(1.0 * 1.05**i, 0.4) for i in range(10)]  # 1.0 → 1.55
    assert _drifts(_synth(rows)) == [("qa", 1.0, round(1.0 * 1.05**7, 3))]


def test_ratchet_forgives_slow_host_rounds():
    """Raw times doubled but the calibration doubled too — machine speed,
    not code. Normalization must forgive it."""
    rows = [(1.0, 0.4)] * 3 + [(2.0, 0.8)] * 3
    assert _drifts(_synth(rows)) == []


def test_one_noisy_round_does_not_fire():
    """A single 2x round inside an otherwise flat window is noise; the
    min-over-window sustains only genuine creep."""
    rows = [(1.0, 0.4)] * 5 + [(2.0, 0.4)] + [(1.0, 0.4)]
    assert _drifts(_synth(rows)) == []
