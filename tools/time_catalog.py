"""Spark-side timing sweep of EVERY catalog query — the outlier finder.

Runs each `queries()` entry at the given sf dir (default sf0.1), counts
once cold and once warm, and prints one JSON line per query plus a
sorted slowest-first summary. No DuckDB side, so sf0.1 finishes in
minutes (the oracle-joined gate is tools/check_correctness.py).

This sweep found the round-6 outliers the headline bench never sees:
the AQE byte-coalescing serialization of grouped-python panels, the
HOF expression-inlining quadratic re-tokenize, and the interpreted
all-pairs embedding screen (SCALING.md has the write-ups).

Usage: python tools/time_catalog.py [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    spark = get_spark(app_name="catalog-times")
    out: dict[str, tuple[float, float]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.count()
            cold = time.time() - t0
            t0 = time.time()
            df.count()
            warm = time.time() - t0
            out[name] = (round(cold, 3), round(warm, 3))
            print(json.dumps({"q": name, "cold": out[name][0], "warm": out[name][1]}), flush=True)
        except Exception as exc:  # a failing build is the headline result
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(json.dumps({"q": name, "err": errs[name]}), flush=True)
        spark.catalog.clearCache()

    total = sum(w for _, w in out.values())
    print(f"\n{len(out)} timed, {len(errs)} errored; total warm {total:.1f}s")
    for name, (cold, warm) in sorted(out.items(), key=lambda kv: -kv[1][1])[:top_n]:
        print(f"{name:40s} cold {cold:7.2f}  warm {warm:7.2f}")
    for name, e in errs.items():
        print(f"ERROR {name}: {e}")
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
