"""Hot-key ceiling probe for the scan (sequence-match) operator.

A scan group is ONE sequential task by semantics (Kusto's scan is a
serialized state machine per key) — salting cannot split it. This
probe pins what that ceiling costs: 20M events with 50% of rows on a
single viral key, through scan_steps with

  - a SELECTIVE 2-step funnel (~2% of rows match either step — the
    realistic telemetry shape: most events are not funnel events), and
  - a DENSE funnel (every row matches a step — the worst case: the
    candidate-jump matcher degenerates to visiting every row).

Also demonstrates the max_group_rows guard failing loudly.

Usage: python tools/probe_scan_hotkey.py [--rows 20000000]
Prints one JSON line per probe. Results recorded in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark import get_spark
    from azuredataengineering_deeplearning_spark.operators.scan import scan_steps

    spark = get_spark(app_name="scan-hotkey-probe")
    hot_rows = args.rows // 2

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        # 50% of rows on user 0; etype 0..99 round-robin within each key
        (
            spark.range(args.rows)
            .select(
                F.when(F.col("id") % 2 == 0, 0)
                .otherwise(F.col("id") % 1000)
                .alias("user_id"),
                F.col("id").alias("ts"),
                # hashed so etype is independent of user_id (id % k
                # correlates with id % 1000 and yields 0 matches)
                F.pmod(F.hash(F.col("id")), F.lit(100)).alias("etype"),
            )
            .write.mode("overwrite").parquet(path)
        )
        ev = spark.read.parquet(path)

        def timed(fn):
            t0 = time.time()
            n = fn()
            return round(time.time() - t0, 2), n

        # warm-up: JVM/Arrow/python-worker spin-up off the clock
        ev.limit(100000).count()
        scan_steps(
            ev.filter(F.col("user_id") == 1), ["user_id"], [("ts", True)],
            [F.col("etype") == 3, F.col("etype") == 7],
        ).count()

        # selective: steps hit 1% of rows each (etype 3 then 7)
        t, n = timed(
            lambda: scan_steps(
                ev, ["user_id"], [("ts", True)],
                [F.col("etype") == 3, F.col("etype") == 7],
            ).count()
        )
        print(json.dumps({
            "probe": "scan_hotkey_selective_2pct", "rows": args.rows,
            "hot_group_rows": hot_rows, "sec": t, "out_rows": n,
            "hot_rows_per_sec": round(hot_rows / t),
        }))

        # dense: every row matches a step (even etype = step1, odd = step2)
        t, n = timed(
            lambda: scan_steps(
                ev, ["user_id"], [("ts", True)],
                [F.col("etype") % 2 == 0, F.col("etype") % 2 == 1],
            ).count()
        )
        print(json.dumps({
            "probe": "scan_hotkey_dense_allmatch", "rows": args.rows,
            "hot_group_rows": hot_rows, "sec": t, "out_rows": n,
            "hot_rows_per_sec": round(hot_rows / t),
        }))

        # guard: fail loudly instead of running the viral key
        try:
            scan_steps(
                ev, ["user_id"], [("ts", True)],
                [F.col("etype") == 3, F.col("etype") == 7],
                max_group_rows=1_000_000,
            ).count()
            guard = "DID NOT RAISE"
        except Exception as e:  # Py4J wraps the task ValueError
            guard = "raised" if "max_group_rows" in str(e) else f"odd: {e}"
        print(json.dumps({"probe": "scan_hotkey_guard", "result": guard}))

    spark.stop()


if __name__ == "__main__":
    main()
