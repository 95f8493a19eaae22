"""Bench a subset of headline rows with bench.py's exact protocol.

Usage:
    python tools/bench_some.py <query> [query ...]

Same timing discipline as bench.py (warm count, median of 4 reps with
the max discarded, clearCache between rows) so per-row numbers are
comparable with full-bench runs on the same box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    qs = E.queries()
    spark = get_spark(app_name="ades-bench-some")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        df.count()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df.count()
            samples.append(time.time() - t0)
        samples.sort()
        kept = samples[:-1] if len(samples) >= 3 else samples
        timings[name] = round(kept[len(kept) // 2], 3)
        spark.catalog.clearCache()
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
