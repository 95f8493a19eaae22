"""Like-for-like bench ratio FROM THE DRIVER'S ARTIFACTS (r12 verdict
ask #5): freeze commits must quote a round-over-round number that is
reproducible from the two committed BENCH_r{N}.json files — not a
self-measured local re-run, which can disagree with the driver by more
than the machine-drift band (r11's ×0.96 claim vs the driver's ×1.055).

Usage:
    python tools/bench_ratio.py                 # latest two BENCH_r*.json
    python tools/bench_ratio.py BENCH_r10.json BENCH_r11.json

Prints one JSON line: {"prev": ..., "cur": ..., "common_rows": N,
"prev_total_sec": ..., "cur_total_sec": ..., "ratio": cur/prev} over
the queries present in BOTH files.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def bench_files() -> list[str]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fs = glob.glob(os.path.join(root, "BENCH_r*.json"))

    def key(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(fs, key=key)


def ratio(prev_path: str, cur_path: str) -> dict:
    def load(path):
        with open(path) as fh:
            d = json.load(fh)
        # driver artifacts wrap bench.py's JSON line under "parsed";
        # a raw bench.py line has "queries" at the top level
        return d.get("parsed", d)

    prev, cur = load(prev_path), load(cur_path)
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    common = sorted(set(pq) & set(cq))
    pt = round(sum(pq[q] for q in common), 3)
    ct = round(sum(cq[q] for q in common), 3)
    return {
        "prev": os.path.basename(prev_path),
        "cur": os.path.basename(cur_path),
        "common_rows": len(common),
        "prev_total_sec": pt,
        "cur_total_sec": ct,
        "ratio": round(ct / pt, 3) if pt else None,
    }


def main() -> int:
    argv = sys.argv[1:]
    if len(argv) == 2:
        prev_path, cur_path = argv
    else:
        fs = bench_files()
        if len(fs) < 2:
            print("need at least two BENCH_r*.json artifacts", file=sys.stderr)
            return 1
        prev_path, cur_path = fs[-2], fs[-1]
    print(json.dumps(ratio(prev_path, cur_path)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
