"""Probe the chronic one-row PERFCHECK first-strike (r11 verdict ask
#7): each round ONE different sub-second row clears its 2x budget only
on the second-strike re-time (kql_top_hitters r10 at 4x, then
w_event_transitions r11 at 4x) — always cleared warm, never the same
row twice. Hypothesis A: the alphabetically PRECEDING sweep row leaves
JVM/executor state (GC debt, code-cache churn) that inflates the next
row's first warm count. Hypothesis B: uncorrelated machine noise
(the two-strike gate's original rationale).

Protocol (one JVM, quiet machine): for a target row, interleave
  a) "in-context" timing — run its 3 sweep predecessors first
     (cold+warm counts each, clearCache between, exactly the sweep
     protocol), then time the target;
  b) "isolated" timing — clearCache, time the target alone;
N reps of each, alternating a/b so slow machine drift cancels. If the
in-context warm median is materially (>1.5x) above the isolated one,
sweep order is real (→ fix: drop caches/GC between rows); if the two
medians agree, the spikes are noise and the two-strike gate is the
right mitigation.

Usage: python tools/probe_cold_spike.py [sf_dir] [target] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = sys.argv[2] if len(sys.argv) > 2 else "w_event_transitions"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    qs = E.queries()
    names = sorted(qs)
    i = names.index(target)
    preds = names[max(0, i - 3):i]
    spark = get_spark(app_name="probe-cold-spike")

    def run_sweep_style(name: str) -> float:
        df = qs[name](spark, sf_dir)
        df.count()  # cold
        t0 = time.time()
        df.count()  # warm — the measured sample, same as the sweep
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    # JVM warmup so rep 1 isn't measuring JIT
    run_sweep_style(target)

    in_context, isolated = [], []
    for _ in range(reps):
        for p in preds:
            run_sweep_style(p)
        in_context.append(round(run_sweep_style(target), 3))
        isolated.append(round(run_sweep_style(target), 3))

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(json.dumps({
        "target": target,
        "predecessors": preds,
        "in_context_warm": in_context,
        "isolated_warm": isolated,
        "in_context_median": med(in_context),
        "isolated_median": med(isolated),
        "ratio": round(med(in_context) / max(med(isolated), 1e-9), 3),
        "sf_dir": sf_dir,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
