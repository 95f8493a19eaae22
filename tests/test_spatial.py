"""Round-13 geo family pins: geohash encode against PUBLIC ground
truth (the canonical Wikipedia examples — external oracle, not a
self-twin), decode centers, null/invalid edges, and the
geohash_radius_join operator (coverage validation, antimeridian wrap,
equivalence to the brute-force pair set on a clustered corpus)."""

import math

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.spatial import (
    cell_id_sql,
    geohash_radius_join,
    geohash_sql,
)
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _gh(spark, lon, lat, p):
    return spark.range(1).selectExpr(
        f"{geohash_sql(repr(lon), repr(lat), p)} as g"
    ).collect()[0]["g"]


def test_geohash_known_values(spark):
    # the canonical public example: (57.64911 N, 10.40744 E) -> u4pruydqqvj
    assert _gh(spark, 10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert _gh(spark, 10.40744, 57.64911, 5) == "u4pru"
    # London and Tokyo prefixes
    assert _gh(spark, -0.1278, 51.5074, 5) == "gcpvj"
    assert _gh(spark, 139.6917, 35.6895, 5) == "xn774"
    # corners land in the extreme cells instead of overflowing
    assert _gh(spark, 180.0, 90.0, 1) == "z"
    assert _gh(spark, -180.0, -90.0, 1) == "0"


def test_geohash_decode_center_and_edges(spark):
    out = kql_to_df(
        {"T": spark.range(1).selectExpr("1 as rid")},
        "T | extend c = geo_geohash_to_central_point('ezs42'),"
        " bad = geo_geohash_to_central_point('aiol'),"
        " emp = geo_geohash_to_central_point('')",
    ).collect()[0]
    # public decode example: ezs42 cell center (-5.60302734375, 42.60498046875)
    lon, lat = out["c"]["coordinates"]
    assert lon == pytest.approx(-5.60302734375, abs=1e-9)
    assert lat == pytest.approx(42.60498046875, abs=1e-9)
    assert out["c"]["type"] == "Point"
    # 'a', 'i', 'l', 'o' are not geohash characters -> null, like Kusto
    assert out["bad"] is None and out["emp"] is None


def test_geohash_roundtrip_random(spark):
    import random

    rng = random.Random(13)
    pts = [
        (i, round(rng.uniform(-180, 180), 5), round(rng.uniform(-90, 90), 5))
        for i in range(64)
    ]
    df = spark.createDataFrame(pts, "rid int, lon double, lat double")
    out = kql_to_df(
        {"T": df},
        "T | extend c = geo_geohash_to_central_point("
        "geo_point_to_geohash(lon, lat, 9)) | project rid, lon, lat, c",
    ).collect()
    # precision-9 cells are ~5m x 5m: the decoded center must be within
    # one cell diagonal of the input
    for r in out:
        assert abs(r["c"]["coordinates"][1] - r["lat"]) < 5e-5
        dlon = abs(r["c"]["coordinates"][0] - r["lon"])
        assert min(dlon, 360 - dlon) < 1e-4


def test_precision_validation(spark):
    with pytest.raises(ValueError, match="1..12"):
        _gh(spark, 0.0, 0.0, 13)
    with pytest.raises(ValueError, match="integer literal"):
        kql_to_df(
            {"T": spark.range(1).selectExpr("1 as rid", "2 as pcol")},
            "T | extend g = geo_point_to_geohash(1.0, 2.0, pcol)",
        )


@pytest.fixture(scope="module")
def clustered(spark):
    import random

    rng = random.Random(131)
    centers = [("c1", 12.5, 45.2), ("c2", -71.1, 42.3), ("c3", 151.2, -33.9)]
    pts = []
    i = 0
    for _, clon, clat in centers:
        for _ in range(40):
            pts.append(
                (i, clon + rng.uniform(-0.8, 0.8), clat + rng.uniform(-0.8, 0.8))
            )
            i += 1
    cdf = spark.createDataFrame(centers, "center_id string, lon double, lat double")
    pdf = spark.createDataFrame(pts, "point_id int, lon double, lat double")
    return pdf, cdf


@pytest.mark.slow
def test_radius_join_matches_brute_force(spark, clustered):
    pdf, cdf = clustered
    got = {
        (r["point_id"], r["center_id"])
        for r in geohash_radius_join(pdf, cdf, 30000, 3).collect()
    }
    # brute force in python
    want = set()
    R = 6371008.8
    for p in pdf.collect():
        for c in cdf.collect():
            la1, la2 = math.radians(p["lat"]), math.radians(c["lat"])
            dla = (la2 - la1) / 2
            dlo = (math.radians(c["lon"]) - math.radians(p["lon"])) / 2
            d = 2 * R * math.asin(math.sqrt(
                math.sin(dla) ** 2
                + math.cos(la1) * math.cos(la2) * math.sin(dlo) ** 2
            ))
            if d <= 30000:
                want.add((p["point_id"], c["center_id"]))
    assert got == want and len(want) > 0


def test_radius_join_antimeridian_wrap(spark):
    cdf = spark.createDataFrame(
        [("c", 179.95, 0.0)], "center_id string, lon double, lat double"
    )
    pdf = spark.createDataFrame(
        [(1, -179.98, 0.01), (2, 179.90, -0.02), (3, -179.0, 0.0)],
        "point_id int, lon double, lat double",
    )
    got = {
        r["point_id"]
        for r in geohash_radius_join(pdf, cdf, 30000, 3).collect()
    }
    # 1 and 2 are within ~10 km across the antimeridian; 3 is ~117 km away
    assert got == {1, 2}


def test_cell_id_bijective_with_geohash(spark):
    """The r14 blocking key (integer cell id) partitions space exactly
    like the geohash string: on a random + edge-case sample, the
    geohash↔cell_id mapping must be a bijection at every precision the
    join might use, and null coordinates must yield a null cell."""
    import random

    rng = random.Random(1414)
    pts = [
        (i, round(rng.uniform(-180, 180), 6), round(rng.uniform(-90, 90), 6))
        for i in range(200)
    ] + [
        (900, 0.0, 0.0), (901, -180.0, -90.0), (902, 180.0, 90.0),
        (903, 179.999999, -0.000001), (904, -0.703125, 42.626953125),
    ]
    df = spark.createDataFrame(pts, "rid int, lon double, lat double")
    for p in (1, 2, 3, 5):
        rows = df.selectExpr(
            f"{geohash_sql('lon', 'lat', p)} as g",
            f"{cell_id_sql('lon', 'lat', p)} as c",
        ).collect()
        g2c, c2g = {}, {}
        for r in rows:
            assert g2c.setdefault(r["g"], r["c"]) == r["c"]
            assert c2g.setdefault(r["c"], r["g"]) == r["g"]
    nulls = spark.range(1).selectExpr(
        f"{cell_id_sql('CAST(NULL AS DOUBLE)', '1.0', 3)} as a",
        f"{cell_id_sql('1.0', 'CAST(NULL AS DOUBLE)', 3)} as b",
    ).collect()[0]
    assert nulls["a"] is None and nulls["b"] is None


def test_radius_join_precision_too_fine_raises(spark, clustered):
    pdf, cdf = clustered
    with pytest.raises(ValueError, match="coarser precision"):
        geohash_radius_join(pdf, cdf, 30000, 6)


def test_radius_join_plan_is_blocked(spark, clustered):
    pdf, cdf = clustered
    plan = geohash_radius_join(pdf, cdf, 30000, 3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _textbook_geohash(lon, lat, p):
    """The FOREIGN twin: classic interval-halving geohash (the
    wikipedia algorithm), structurally unlike the engine's closed-form
    quantize-and-interleave — agreement is an algorithmic cross-check,
    not a replay."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    out, bits, ch, even = [], 0, 0, True
    while len(out) < p:
        if even:
            mid = (lo_x + hi_x) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lo_x = mid
            else:
                ch = ch * 2
                hi_x = mid
        else:
            mid = (lo_y + hi_y) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lo_y = mid
            else:
                ch = ch * 2
                hi_y = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alphabet[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_fuzz_vs_textbook_algorithm(spark):
    import random

    rng = random.Random(1313)
    pts = [
        (i,
         round(rng.uniform(-180, 180), 6),
         round(rng.uniform(-90, 90), 6),
         rng.randint(1, 12))
        for i in range(48)
    ] + [
        # quantization-boundary stress: exact cell-edge coordinates
        (100, 0.0, 0.0, 7), (101, -180.0, -90.0, 9), (102, 180.0, 90.0, 9),
        (103, 11.25, 45.0, 4), (104, -0.703125, 42.626953125, 6),
    ]
    df = spark.createDataFrame(pts, "rid int, lon double, lat double, p int")
    for p in sorted({r[3] for r in pts}):
        sub = [r for r in pts if r[3] == p]
        sdf = df.filter(F.col("p") == p)
        got = {
            r["rid"]: r["g"]
            for r in sdf.selectExpr(
                "rid", f"{geohash_sql('lon', 'lat', p)} as g"
            ).collect()
        }
        for rid, lon, lat, _ in sub:
            assert got[rid] == _textbook_geohash(lon, lat, p), (
                rid, lon, lat, p, got[rid]
            )


def test_geohash_neighbors_vs_geometric_construction(spark):
    """Independent check: a cell's neighbors are the textbook-encodes
    of its center shifted by one cell width/height in each direction —
    geometry, not a replay of the bit arithmetic."""
    import random

    rng = random.Random(1314)
    ghs = [
        _textbook_geohash(
            round(rng.uniform(-179, 179), 5),
            round(rng.uniform(-89, 89), 5),
            rng.randint(1, 8),
        )
        for i in range(24)
    ] + ["u4pru", "z", "0", "8", "gcpvj"]
    df = spark.createDataFrame([(i, g) for i, g in enumerate(ghs)],
                               "rid int, g string")
    out = {
        r["rid"]: r["n"]
        for r in kql_to_df(
            {"T": df}, "T | extend n = geo_geohash_neighbors(g)"
            " | project rid, n"
        ).collect()
    }
    for i, gh in enumerate(ghs):
        p = len(gh)
        nbits = 5 * p
        nx, ny = (nbits + 1) // 2, nbits // 2
        w, h = 360.0 / (1 << nx), 180.0 / (1 << ny)
        # decode center from the textbook bit layout via the engine's
        # tested decode path equivalence: re-derive with python ints
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        xi = yi = 0
        for k in range(nbits):
            cv = alphabet.index(gh[k // 5])
            b = (cv >> (4 - k % 5)) & 1
            if k % 2 == 0:
                xi = xi * 2 + b
            else:
                yi = yi * 2 + b
        clon = -180 + w * (xi + 0.5)
        clat = -90 + h * (yi + 0.5)
        want = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nlat = clat + dy * h
                if not -90 <= nlat <= 90:
                    continue
                nlon = clon + dx * w
                if nlon > 180:
                    nlon -= 360
                if nlon < -180:
                    nlon += 360
                want.add(_textbook_geohash(nlon, nlat, p))
        assert set(out[i]) == want, (gh, sorted(out[i]), sorted(want))
