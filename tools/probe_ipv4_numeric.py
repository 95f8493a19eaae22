"""ipv4_lookup 20M-flow probe: string dotted-quad input (parse-bound)
vs pre-parsed bigint input (join-bound — the round-11 numeric fast
path). Same 957-entry CIDR table as the round-10 LPM probe.

Usage: python tools/probe_ipv4_numeric.py [--rows 20000000]
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
    from azuredataengineering_deeplearning_spark.sources.kql import _ipv4_lookup

    spark = get_spark(app_name="ipv4-numeric-probe")

    # /8 + 256 x /16 + 700 x /24 CIDR dim (the round-10 probe's table)
    cidrs = [("10.0.0.0/8", "corp")]
    cidrs += [(f"10.{i}.0.0/16", f"n16_{i}") for i in range(256)]
    cidrs += [(f"10.{i % 256}.{i % 250}.0/24", f"n24_{i}") for i in range(700)]
    lut = spark.createDataFrame(cidrs, "cidr string, net string").cache()
    lut.count()

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/flows"
        (
            spark.range(args.rows)
            .select(
                F.col("id").alias("flow_id"),
                F.concat(
                    F.lit("10."), (F.col("id") % 256).cast("string"),
                    F.lit("."), (F.col("id") % 250).cast("string"),
                    F.lit("."), (F.col("id") % 200).cast("string"),
                ).alias("ip"),
                (
                    F.lit(10 * 16777216)
                    + (F.col("id") % 256) * 65536
                    + (F.col("id") % 250) * 256
                    + (F.col("id") % 200)
                ).cast("bigint").alias("ipnum"),
            )
            .write.mode("overwrite").parquet(path)
        )
        flows = spark.read.parquet(path)

        def timed(fn):
            t0 = time.time()
            n = fn()
            return round(time.time() - t0, 2), n

        # warm-up
        _ipv4_lookup(
            flows.limit(50_000).select("flow_id", "ip"),
            lut, "ip", "cidr", False,
        ).count()

        for col, label in (("ip", "string_parse"), ("ipnum", "numeric")):
            t, n = timed(
                lambda c=col: _ipv4_lookup(
                    flows.select("flow_id", c), lut, c, "cidr", False
                ).count()
            )
            print(json.dumps({
                "probe": f"ipv4_lookup_20m_{label}", "rows": args.rows,
                "cidrs": len(cidrs), "sec": t, "out_rows": n,
            }))

    spark.stop()


if __name__ == "__main__":
    main()
