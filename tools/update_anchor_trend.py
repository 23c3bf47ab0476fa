"""Append the current pinned bench record to the cross-round anchor trend.

The per-round regression gate re-pins tests/bench_isolated_baseline.json
wholesale each round, so a ~5%/round drift compounds invisibly — nothing
ever compares round 10 to round 1 (r9 verdict #4). This artifact is the
fix: an APPEND-ONLY record of ~15 stable anchor queries' isolated times
(plus the calibration anchor) per round. tests/test_anchor_trend.py reads
it and fails when the calibration-normalized trend of any anchor across
>= 3 recorded rounds exceeds the ratchet (1.3x vs its first recorded
round), so slow creep has to show itself.

Usage (run AFTER the round's official `python bench.py --pin`):

    python tools/update_anchor_trend.py <round_number>

Refuses to overwrite an existing round entry (append-only by contract);
pass --force to replace the CURRENT round's entry after a re-pin in the
same round.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREND_PATH = os.path.join(HERE, "ANCHOR_TREND.json")
DETAIL_PATH = os.path.join(HERE, "BENCH_DETAIL.json")

# Stable anchors: code-untouched plan families spanning scan/agg (TPC-H),
# the flagship projection, marts, joins, windows, the LLM dedup/similarity
# stack, and the pure-SQL entry. Chosen >= ~0.3 s isolated at sf0.1 so a
# single anchor is not pure scheduling noise; the RATCHET judges the
# calibration-normalized trend, not single-round deltas.
ANCHORS = [
    "tpch_q1_pricing_summary_sql",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume_customers",
    "orders_fact",
    "pricing_summary",
    "mart_customer_health",
    "region_revenue",
    "near_dup_pairs",
    "tfidf_weights",
    "embedding_cosine_topk",
    "order_value_percentiles",
    "sql_nation_revenue",
    "asof_last_view",
    "sequence_packing",
    "lang_id",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    if len(args) != 1:
        raise SystemExit(__doc__)
    round_no = int(args[0])

    with open(DETAIL_PATH) as fh:
        detail = json.load(fh)
    iso = detail.get("queries_isolated") or {}
    cal = detail.get("calibration_seconds")
    if not iso or not cal:
        raise SystemExit("pinned BENCH_DETAIL.json lacks isolated times/calibration")
    missing = [a for a in ANCHORS if a not in iso]
    if missing:
        raise SystemExit(f"pinned record missing anchors: {missing}")

    trend = {"anchors": ANCHORS, "rounds": []}
    if os.path.exists(TREND_PATH):
        with open(TREND_PATH) as fh:
            trend = json.load(fh)
        if trend.get("anchors") != ANCHORS:
            raise SystemExit(
                "anchor set changed — the trend is only meaningful over a "
                "FIXED set; start a new artifact deliberately if you must"
            )
    rounds = {r["round"]: r for r in trend["rounds"]}
    if round_no in rounds and not force:
        raise SystemExit(
            f"round {round_no} already recorded (append-only); --force replaces it"
        )
    rounds[round_no] = {
        "round": round_no,
        "calibration_seconds": cal,
        "sf": detail.get("sf"),
        "queries": {a: iso[a] for a in ANCHORS},
    }
    trend["rounds"] = [rounds[k] for k in sorted(rounds)]
    with open(TREND_PATH, "w") as fh:
        json.dump(trend, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": TREND_PATH, "rounds": sorted(rounds)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
