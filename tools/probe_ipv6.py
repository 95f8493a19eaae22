"""IPv6-parse 20M-row probe: per-row cost of the round-13 bind-once
parse/compare expressions. The parse is a chain of higher-order
functions (transform/filter/aggregate) which Spark evaluates
INTERPRETED (CodegenFallback) — this probe pins what that costs per
row at scale, against two baselines: a plain string op (split) and the
ipv4 bigint arithmetic family.

Usage: python tools/probe_ipv6.py [--rows 20000000]
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
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    spark = get_spark(app_name="ipv6-probe")

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/flows"
        (
            spark.range(args.rows)
            .select(
                F.col("id").alias("flow_id"),
                F.concat(
                    F.lit("2001:db8:"),
                    F.lower(F.hex(F.col("id") % 4096)),
                    F.lit("::"),
                    F.lower(F.hex(F.col("id") % 65521 + 1)),
                ).alias("ip"),
                F.concat(
                    F.lit("172."), (F.col("id") % 64).cast("string"),
                    F.lit("."), (F.col("id") % 250).cast("string"),
                    F.lit(".9"),
                ).alias("ip4"),
            )
            .write.mode("overwrite").parquet(path)
        )
        flows = spark.read.parquet(path)
        flows.count()  # warm the page cache

        def bench(label, df):
            t0 = time.time()
            n = df.count()
            dt = time.time() - t0
            print(json.dumps({
                "probe": label, "rows": args.rows, "matched": n,
                "sec": round(dt, 2),
                "ns_per_row": round(dt / args.rows * 1e9, 1),
            }))

        t = {"flows": flows}
        # baseline: plain JVM string op over the same column
        bench("baseline_split", flows.filter(
            F.split(F.col("ip"), ":").getItem(1) == "db8"))
        # baseline: the ipv4 bigint family (codegen arithmetic)
        bench("ipv4_is_private", kql_to_df(
            t, "flows | where ipv4_is_private(ip4)"))
        # the interpreted-HOF parse chain, filter-only consumption
        bench("ipv6_is_in_range", kql_to_df(
            t, "flows | where ipv6_is_in_range(ip, '2001:db8:800::/37')"))
        # full canonicalization materialized into a new column
        bench("parse_ipv6_project", kql_to_df(
            t, "flows | extend p = parse_ipv6(ip)"
               " | where strlen(p) > 0"))
        # two parses + key compare per row (the most expensive shape)
        bench("ipv6_compare_pair", kql_to_df(
            t, "flows | where ipv6_compare(ip, ip4) != 0"))

    spark.stop()


if __name__ == "__main__":
    main()
