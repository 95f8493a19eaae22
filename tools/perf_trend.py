"""First-strike / drift TREND across rounds (verdict r12 ask #2).

Reads every PERFCHECK_r*.json at the repo root and prints one row per
round: machine drift, first-strike count (confirmed + retime-cleared —
older artifacts predate the explicit ``n_first_strikes`` field, so the
count is derived from the flag arrays when absent), confirmed
over-budget count, and the sweep totals. The freeze commit quotes the
final line verbatim so the 1 → 1 → 13 (r10 → r11 → r12) step change —
and whatever round 13's median-of-3 sampling does to it — is tracked
in-history, not just inside one round's artifact.

Usage:
    python tools/perf_trend.py          # table + one JSON line
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rows() -> list[dict]:
    out = []
    for path in sorted(glob.glob(os.path.join(ROOT, "PERFCHECK_r*.json"))):
        m = re.search(r"PERFCHECK_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            doc = json.load(f)
        strikes = doc.get("n_first_strikes")
        if strikes is None:
            strikes = len(doc.get("over_budget", [])) + len(
                doc.get("first_strike_cleared", [])
            )
        out.append(
            {
                "round": int(m.group(1)),
                "drift": doc.get("machine_drift"),
                "first_strikes": strikes,
                "confirmed_over": len(doc.get("over_budget", [])),
                "n_queries": doc.get("n_queries"),
                "total_warm_s": doc.get("total_warm_s"),
                "pass": doc.get("pass"),
            }
        )
    return sorted(out, key=lambda r: r["round"])


def main() -> int:
    rs = rows()
    if not rs:
        print("no PERFCHECK_r*.json artifacts found")
        return 1
    print(f"{'round':>5} {'drift':>6} {'strikes':>7} {'over':>4} "
          f"{'queries':>7} {'warm_s':>7} {'pass':>5}")
    for r in rs:
        print(f"{r['round']:>5} {r['drift']:>6} {r['first_strikes']:>7} "
              f"{r['confirmed_over']:>4} {r['n_queries']:>7} "
              f"{r['total_warm_s']:>7} {str(r['pass']):>5}")
    print(json.dumps({"perf_trend": rs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
