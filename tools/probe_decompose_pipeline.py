"""END-TO-END decompose pipeline probe (r12 verdict ask #5): the
round-12 probe costed the per-row kernel in isolation; this one runs
the full catalog-shaped pipeline at scale —

    20M events → make-series (the ONE data shuffle: (key, bin)
    aggregate) → series_decompose_anomalies → posexplode join-back of
    the anomaly flags to (key, bin) rows → anomalous-bin count

at ~100k series × 128 bins, once with the EXPLICIT period dial
(period = 7, the recommended path) and once with period = -1
autodetection (the documented O(B²/2) quadratic), confirming at
pipeline level that (a) the arrays never leave their executor — the
exchange count in the executed plan stays constant when the kernel is
added — and (b) the explicit-period dial is where the money is.

Protocol: cold = first action on a FRESH DataFrame after JIT-warming
the kernel on a tiny twin frame (absolute-cost claims need this — see
the round-12 measurement note in SCALING.md: re-running the same
DataFrame reuses shuffle files); warm = second action on the same
DataFrame (regression-relative only). A no-kernel baseline (make-series
+ explode only) isolates the kernel's share of the wall clock.

Usage: python tools/probe_decompose_pipeline.py [n_events] [n_series]
Prints one JSON line. Synthetic events are generated IN Spark (seeded
hash noise + trend + period-7 seasonal — no driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BINS = 128


def _pipe(spark, events, period):
    """make-series → decompose-anomalies → explode back to bins →
    anomaly rows. period=None skips the kernel (baseline)."""
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    made = kql_to_df(
        {"E": events},
        f"E | make-series v = avg(v) on x from 0 to {BINS} step 1 by uid",
    )
    if period is None:
        out = made.selectExpr("uid", "posexplode(v) AS (ix, b)")
        return out.filter("b > 1e9")  # never true: count forces full scan
    kql = (
        f"M | extend a = series_decompose_anomalies(v, 1.5, {period})"
        " | project uid, an = a.anomalies"
    )
    out = kql_to_df({"M": made}, kql)
    return out.selectExpr("uid", "posexplode(an) AS (ix, flag)").filter(
        "flag != 0"
    )


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from azuredataengineering_deeplearning_spark import get_spark

    spark = get_spark(app_name="probe-decompose-pipeline")

    def fresh_events():
        # trend + period-7 seasonal + hash noise per (series, bin)
        return spark.range(n_events).selectExpr(
            f"id % {n_series} as uid",
            f"cast((id div {n_series}) % {BINS} as double) as x",
            f"0.05d * ((id div {n_series}) % {BINS})"
            " + element_at(array(4.0d, -2.0d, 1.0d, -3.0d, 2.0d, 0.0d,"
            f" -1.5d), cast((id div {n_series}) % 7 as int) + 1)"
            " + pmod(xxhash64(id), 100) / 50.0d as v",
        )

    # JIT warm-up on a tiny twin so cold numbers are not codegen
    tiny = spark.range(512).selectExpr(
        "id % 8 as uid", "cast(id % 16 as double) as x",
        "pmod(xxhash64(id), 7) / 2.0d as v",
    )
    for per in (None, 7, -1):
        _pipe(spark, tiny, per).count()

    res = {"n_events": n_events, "n_series": n_series, "bins": BINS}
    for label, per in (("baseline_no_kernel", None),
                       ("explicit_p7", 7), ("autodetect", -1)):
        df = _pipe(spark, fresh_events(), per)
        plan = df._jdf.queryExecution().executedPlan().toString()
        t0 = time.time()
        rows = df.count()
        cold = time.time() - t0
        t0 = time.time()
        df.count()
        warm = time.time() - t0
        res[label] = {
            "cold_s": round(cold, 2),
            "warm_s": round(warm, 2),
            "out_rows": rows,
            # pre-action plan exchanges: the (uid, bin) aggregate's
            # pair; the kernel must add ZERO
            "n_exchanges": plan.count("Exchange"),
        }
        spark.catalog.clearCache()
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
