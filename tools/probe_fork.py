"""fork shared-prefix probe: 20M events, a filtered/derived prefix,
three consumer branches — share_source=True (persist the prefix once,
every branch reads the cache) vs False (each branch re-plans the
prefix from the source).

Usage: python tools/probe_fork.py [--rows 20000000]
Prints one JSON line per mode. Results recorded in SCALING.md.
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
    from azuredataengineering_deeplearning_spark.sources.kql import kql_fork

    spark = get_spark(app_name="fork-probe")

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events"
        (
            spark.range(args.rows)
            .select(
                (F.col("id") % 100_000).alias("user_id"),
                F.col("id").alias("ts"),
                F.pmod(F.hash(F.col("id")), F.lit(100)).cast("double")
                .alias("value"),
                F.concat(F.lit("et"), (F.col("id") % 7).cast("string"))
                .alias("event_type"),
            )
            .write.mode("overwrite").parquet(path)
        )
        ev = spark.read.parquet(path)
        pipe = (
            "events | where value > 10"
            " | extend bucket = user_id % 256"
            " | fork (summarize n = count())"
            " (summarize m = max(value), s = avg(value) by event_type)"
            " (summarize u = dcount(user_id) by bucket)"
        )
        ev.limit(100_000).count()  # warm

        # cheap prefix (filter+extend: a re-scan costs one parquet pass)
        # AND an expensive prefix (a shuffled per-user aggregate: a
        # re-plan repeats the whole exchange per branch)
        heavy = (
            "events | summarize v = sum(value), n = count() by user_id"
            " | where n > 100"
            " | fork (summarize c = count())"
            " (summarize m = max(v))"
            " (top 5 by v | project user_id, v)"
        )
        for label, q in (("cheap_prefix", pipe), ("heavy_prefix", heavy)):
            for share in (True, False):
                t0 = time.time()
                out = kql_fork({"events": ev}, q, share_source=share)
                for df in out.values():
                    df.count()
                t = round(time.time() - t0, 2)
                spark.catalog.clearCache()
                print(json.dumps({
                    "probe": f"fork_{label}_share_{str(share).lower()}",
                    "rows": args.rows, "branches": 3, "sec": t,
                }))

    spark.stop()


if __name__ == "__main__":
    main()
