"""Scale probe for the round-12 series_decompose family: per-row array
SQL, zero shuffles — so the cost model is (rows x per-row kernel work).
Measures, at N series x B bins (default 20k x 512 ~= 10M elements):

  1. series_decompose with an EXPLICIT period (O(B*p) class means +
     O(B) trend) — the recommended long-array path;
  2. series_decompose with period = -1 autodetection (O(B^2/2) ACF
     fold per row) — the documented quadratic dial;
  3. series_periods_detect over lags 2..64 (O(B*lags)).

Usage: python tools/probe_decompose.py [n_series] [bins]
Prints one JSON line. Synthetic data is generated IN Spark (seeded
hash-based values — deterministic, no driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    bins = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from azuredataengineering_deeplearning_spark import get_spark
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    spark = get_spark(app_name="probe-decompose")
    # seeded synthetic series: value = trend + period-7 seasonal + hash noise
    base = spark.range(n).selectExpr(
        "id as rid",
        f"transform(sequence(0, {bins - 1}), i -> "
        " 0.05d * i + element_at(array(4.0d, -2.0d, 1.0d, -3.0d, 2.0d,"
        " 0.0d, -1.5d), (i % 7) + 1)"
        " + pmod(xxhash64(id, i), 100) / 50.0d) as y",
    ).persist()
    base.count()

    # JIT warm on a tiny twin frame so the first real measurement is
    # not paying codegen compilation
    tiny = spark.range(64).selectExpr(
        "id as rid",
        "transform(sequence(0, 31), i -> pmod(xxhash64(id, i), 7)"
        " / 2.0d) as y",
    )

    def timed(pipe: str) -> float:
        kql_to_df({"T": tiny}, pipe).collect()
        # COLD timing of a FRESH DataFrame: re-collecting the same DF
        # object reuses the heavy map stage's shuffle files (skipped
        # stages) and measures only the 1-row reduce — 180x too
        # flattering (observed 22.7s -> 0.08s). Budgets/bench measure
        # warm BY CONVENTION (regression-relative); a probe making
        # absolute cost claims must pay the map stage.
        df = kql_to_df({"T": base}, pipe)
        t0 = time.time()
        df.collect()  # 1-row aggregate: every element is consumed
        return round(time.time() - t0, 3)

    explicit = timed(
        "T | extend d = series_decompose(y, 7)"
        " | extend rs = series_sum(d.residual)"
        " | summarize total = sum(rs)"
    )
    auto = timed(
        "T | extend d = series_decompose(y)"
        " | extend rs = series_sum(d.residual)"
        " | summarize total = sum(rs)"
    )
    periods = timed(
        "T | extend p = series_periods_detect(y, 2, 64, 3)"
        " | extend ts = series_sum(p.scores)"
        " | summarize total = sum(ts)"
    )
    base.unpersist()
    print(json.dumps({
        "n_series": n,
        "bins": bins,
        "elements": n * bins,
        "decompose_explicit_p7_s": explicit,
        "decompose_autodetect_s": auto,
        "periods_detect_2_64_s": periods,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
