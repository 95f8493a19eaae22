"""Scale probe for operators/spatial.geohash_radius_join: 20M points
vs 1k centers at 25 km radius, precision 3 — candidate generation is
an equi-join on the geohash cell (centers ×≤9 offset cells,
broadcast), verification is the exact haversine. Measures cold (fresh
DataFrame first action after a JIT warm on a tiny twin) and warm, and
reports the candidate:hit ratio (the blocking selectivity the 3×3
covering buys).

Usage: python tools/probe_geo_join.py [n_points] [n_centers]
Prints one JSON line. Data generated IN Spark (hash-scattered points
clustered around the centers so hits exist at every scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_ctr = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    from azuredataengineering_deeplearning_spark import get_spark
    from azuredataengineering_deeplearning_spark.operators.spatial import (
        geohash_radius_join,
    )

    spark = get_spark(app_name="probe-geo-join")

    def centers():
        return spark.range(n_ctr).selectExpr(
            "id as center_id",
            "(pmod(xxhash64(id), 3200)) / 10.0 - 160 + 0.05 as lon",
            "(pmod(xxhash64(id, id), 1100)) / 10.0 - 55 + 0.05 as lat",
        )

    def points():
        # each point scatters +-0.9 deg around a hash-chosen center
        return spark.range(n_pts).selectExpr(
            "id as point_id", f"pmod(xxhash64(id), {n_ctr}) as __c",
        ).join(
            centers().selectExpr(
                "center_id as __c", "lon as __clon", "lat as __clat"
            ),
            "__c",
        ).selectExpr(
            "point_id",
            "__clon + (pmod(xxhash64(point_id, 1), 1800)) / 1000.0 - 0.9 as lon",
            "__clat + (pmod(xxhash64(point_id, 2), 1800)) / 1000.0 - 0.9 as lat",
        )

    tiny_p = spark.range(64).selectExpr(
        "id as point_id", "cast(pmod(id, 30) as double) as lon",
        "cast(pmod(id, 20) as double) as lat")
    tiny_c = spark.range(4).selectExpr(
        "id as center_id", "cast(id * 7 as double) as lon",
        "cast(id * 5 as double) as lat")
    geohash_radius_join(tiny_p, tiny_c, 25000, 3).count()

    df = geohash_radius_join(points(), centers(), 25000, 3)
    t0 = time.time()
    hits = df.count()
    cold = time.time() - t0
    t0 = time.time()
    df.count()
    warm = time.time() - t0
    print(json.dumps({
        "n_points": n_pts, "n_centers": n_ctr, "radius_km": 25,
        "precision": 3, "hits": hits,
        "cold_s": round(cold, 2), "warm_s": round(warm, 2),
        "hit_rate": round(hits / n_pts, 4),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
