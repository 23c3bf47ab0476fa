"""Growth-exponent report over SCALE_SWEEP.json.

For a pair of labels whose data dirs differ by a known factor, the
per-query growth exponent is log(t_hi/t_lo) / log(factor). DEPLOY.md's
"pinned growth exponents" section and every round's verdict read these
numbers — this tool makes them mechanical instead of hand-computed, and
flags regressions against the documented expectations:

- pair-emitting probes (simhash/embedding near-dups) are expected
  super-linear on the clone-heavy scaled data (output-driven, measured);
- everything else above EXPONENT_ALARM is flagged as a potential
  regression (r6 rule: >1.3 on a non-pair query = regression, with the
  spill-driven mart outliers now fixed by partition sizing — alarm set
  tighter at 1.35 to leave noise headroom).

Usage:
    python tools/sweep_exponents.py [lo_label hi_label factor]
defaults: sf5_50x sf10_100x 2
"""

from __future__ import annotations

import json
import math
import os
import sys

# Queries whose growth is expected super-linear on the cloned scale data:
# their cost follows copy PAIRS (~4x per 2x) or clone-bucket candidates,
# not the plan (measured attributions in DEPLOY.md / PERF.md).
PAIR_DRIVEN = {
    "simhash_near_dups",
    "embedding_near_dups_incremental",
    "margin_bitext_mine",  # p fixed in the sweep -> per-bucket quadratic
}
EXPONENT_ALARM = 1.35


def main() -> int:
    lo_label = sys.argv[1] if len(sys.argv) > 1 else "sf5_50x"
    hi_label = sys.argv[2] if len(sys.argv) > 2 else "sf10_100x"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SWEEP.json",
    )
    with open(path) as fh:
        sweep = json.load(fh)
    lo, hi = sweep[lo_label], sweep[hi_label]
    rows = []
    for q in sorted(set(lo) & set(hi)):
        if q.startswith("_"):
            continue
        t_lo, t_hi = lo[q], hi[q]
        if not t_lo or not t_hi:
            continue
        exp = math.log(t_hi / t_lo) / math.log(factor)
        rows.append((exp, q, t_lo, t_hi))
    rows.sort(reverse=True)
    alarms = []
    print(f"# {lo_label} -> {hi_label} (factor {factor:g}), {len(rows)} queries")
    print(f"{'exp':>6}  {'lo_s':>8}  {'hi_s':>8}  query")
    for exp, q, t_lo, t_hi in rows:
        mark = ""
        if q in PAIR_DRIVEN:
            mark = "  [pair-driven: expected super-linear]"
        elif exp > EXPONENT_ALARM:
            mark = "  [ALARM: above expected growth]"
            alarms.append(q)
        print(f"{exp:6.2f}  {t_lo:8.2f}  {t_hi:8.2f}  {q}{mark}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else float("nan")
    print(
        json.dumps(
            {
                "pair": f"{lo_label}->{hi_label}",
                "n": len(rows),
                "median_exp": round(med, 2),
                "alarms": alarms,
            }
        )
    )
    return 1 if alarms else 0


if __name__ == "__main__":
    sys.exit(main())
