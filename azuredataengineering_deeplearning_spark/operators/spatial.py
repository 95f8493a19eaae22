"""Geospatial primitives: closed-form geohash encode/decode and a
geohash-blocked radius join.

Reference parity: the reference repo's pipelines carry no geospatial
workload, but Kusto's documented scalar surface includes the geo_*
family (geo_point_to_geohash / geo_geohash_to_central_point /
geo_point_in_circle / geo_distance_2points) — this module closes it
the same way the ipv4 family was closed in round 10: pure SQL bit
arithmetic, zero UDFs, identical formulas on both engines so the
DuckDB oracle replays them bit-for-bit.

Geohash here is the CLOSED FORM, not the textbook interval-halving
loop: the lon bit sequence of a geohash is exactly the binary
expansion of floor((lon+180)/360 · 2^nx) (nx = count of lon bits) and
likewise for lat, so encoding is two fixed-point quantizations plus a
bit interleave — transforms and shifts, no sequential state. That is
also what makes it cheap at 100 TB: whole-stage-codegen integer math
per row, and the cell id is an equi-join key.

Scale design (the radius join): candidate generation is an EQUI-join
on the cell id — each center covers its circle with the geohash cells
of a 3×3 offset grid (center, ±radius in each axis), valid whenever
the cell is at least 2·radius tall and wide (validated against the
centers' worst-case latitude with one bounded aggregate, loud error
otherwise); each point computes its single cell. The join explodes
centers ×≤9 (bounded, broadcast-sized), hash-joins on the cell, then
verifies with the exact haversine — the LSH-banding argument applied
to space: never an all-pairs cross product, skew bounded by real
point density per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# IUGG mean radius — same constant as the kql geo_distance_2points
# rewrite; both engines run the identical spherical haversine
EARTH_RADIUS_M = 6371008.8


def _nx_ny(precision: int) -> tuple[int, int]:
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2


def _check_precision(precision) -> int:
    try:
        p = int(str(precision).strip())
    except ValueError:
        raise ValueError(
            "geohash precision must be an integer literal 1..12, got "
            f"{precision!r} (dynamic precision is not supported — the "
            "bit layout is compiled into the expression)"
        ) from None
    if not 1 <= p <= 12:
        raise ValueError(f"geohash precision must be in 1..12, got {p}")
    return p


def geohash_sql(lon_sql: str, lat_sql: str, precision=5) -> str:
    """``geo_point_to_geohash(lon, lat, p)`` as closed-form SQL: two
    fixed-point quantizations + a compile-time bit interleave. Inputs
    clamped to the valid cell range (lon = 180 / lat = 90 land in the
    last cell, Kusto's edge); null input → null."""
    p = _check_precision(precision)
    nx, ny = _nx_ny(p)
    xint = (
        f"CAST(least(greatest(floor((CAST(({lon_sql}) AS DOUBLE) + 180)"
        f" / 360 * {1 << nx}), 0), {(1 << nx) - 1}) AS BIGINT)"
    )
    yint = (
        f"CAST(least(greatest(floor((CAST(({lat_sql}) AS DOUBLE) + 90)"
        f" / 180 * {1 << ny}), 0), {(1 << ny) - 1}) AS BIGINT)"
    )
    # bit k (k = 0..5p-1, MSB first): even k -> lon bit (nx-1 - k/2),
    # odd k -> lat bit (ny-1 - k/2 with truncating DIV)
    chars = []
    for ci in range(p):
        terms = []
        for j in range(5):
            k = 5 * ci + j
            w = 1 << (4 - j)
            if k % 2 == 0:
                sh = nx - 1 - k // 2
                terms.append(f"(shiftright(__gx, {sh}) & 1) * {w}")
            else:
                sh = ny - 1 - k // 2
                terms.append(f"(shiftright(__gy, {sh}) & 1) * {w}")
        cval = " + ".join(terms)
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', CAST(({cval}) AS INT) + 1, 1)"
        )
    body = "concat(" + ", ".join(chars) + ")"
    guarded = (
        f"CASE WHEN ({lon_sql}) IS NULL OR ({lat_sql}) IS NULL"
        f" THEN CAST(NULL AS STRING) ELSE "
        + _b(xint, "__gx", _b(yint, "__gy", body))
        + " END"
    )
    return guarded


def _b(arg: str, var: str, body: str) -> str:
    return f"element_at(transform(array(({arg})), {var} -> {body}), 1)"


def cell_id_sql(lon_sql: str, lat_sql: str, precision=5) -> str:
    """The precision-``p`` geohash CELL as one BIGINT — the same
    partition of space as ``geohash_sql`` (bijective with the string:
    cell = xi * 2^ny + yi where xi/yi are the quantized axis integers
    whose bits the string interleaves), but pure whole-stage-codegen
    arithmetic: no lambda binding, no bit interleave, no substr/concat.
    Null lon/lat yields a null cell (explicit guard — Spark's
    least/greatest SKIP nulls, so the clamp alone would swallow them),
    which can never equi-join — identical matching semantics to the
    null-guarded string form.

    Use this whenever the cell is only a blocking/equi-join KEY (the
    radius join); use ``geohash_sql`` when the textual geohash itself
    is the result. Measured in round 14: the string form's interpreted
    ``transform(...)`` HOF was the dominant per-row cost of
    geo_radius_join, and the inferred ``isnotnull(cell)`` pushed a
    second full evaluation into the upstream join condition."""
    p = _check_precision(precision)
    nx, ny = _nx_ny(p)
    xint = (
        f"CAST(least(greatest(floor((CAST(({lon_sql}) AS DOUBLE) + 180)"
        f" / 360 * {1 << nx}), 0), {(1 << nx) - 1}) AS BIGINT)"
    )
    yint = (
        f"CAST(least(greatest(floor((CAST(({lat_sql}) AS DOUBLE) + 90)"
        f" / 180 * {1 << ny}), 0), {(1 << ny) - 1}) AS BIGINT)"
    )
    return (
        f"(CASE WHEN ({lon_sql}) IS NULL OR ({lat_sql}) IS NULL"
        f" THEN CAST(NULL AS BIGINT)"
        f" ELSE {xint} * {1 << ny} + {yint} END)"
    )


_POINT_STRUCT_T = "STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>"


def geohash_center_sql(gh_sql: str) -> str:
    """``geo_geohash_to_central_point(gh)`` — decode a geohash of ANY
    length (the bit layout is recomputed from length()) to its cell's
    central point as the GeoJSON-shaped struct(type='Point',
    coordinates=[lon, lat]). Invalid characters or empty input →
    null (Kusto)."""
    # per-char 5-bit values; instr = 0 marks an invalid char
    cvs = (
        f"transform(sequence(0, CAST(length(__gh) AS INT) - 1), __i ->"
        f" instr('{GEOHASH_ALPHABET}', substr(__gh, __i + 1, 1)) - 1)"
    )
    # x/y ints reassembled from interleaved bits: global bit k lives in
    # char k DIV 5 at in-char position k % 5 (MSB first)
    bit = (
        "(shiftright(element_at(__cv, CAST(__k DIV 5 AS INT) + 1), CAST(4 - __k % 5 AS INT)) & 1)"
    )
    xint = (
        "aggregate(sequence(0, 5 * CAST(length(__gh) AS INT) - 1),"
        " CAST(0 AS BIGINT), (a, __k) -> IF(__k % 2 = 0,"
        f" a * 2 + {bit}, a))"
    )
    yint = (
        "aggregate(sequence(0, 5 * CAST(length(__gh) AS INT) - 1),"
        " CAST(0 AS BIGINT), (a, __k) -> IF(__k % 2 = 1,"
        f" a * 2 + {bit}, a))"
    )
    nx = "CAST((5 * length(__gh) + 1) DIV 2 AS INT)"
    ny = "CAST((5 * length(__gh)) DIV 2 AS INT)"
    pt = (
        "named_struct('type', 'Point', 'coordinates', array("
        f"-180 + 360 * (CAST(__xi AS DOUBLE) + 0.5) / pow(2, {nx}),"
        f" -90 + 180 * (CAST(__yi AS DOUBLE) + 0.5) / pow(2, {ny})))"
    )
    body = _b(
        cvs, "__cv",
        "CASE WHEN size(filter(__cv, __v -> __v < 0)) > 0"
        f" THEN CAST(NULL AS {_POINT_STRUCT_T}) ELSE "
        + _b(xint, "__xi", _b(yint, "__yi", pt))
        + " END",
    )
    return (
        f"CASE WHEN ({gh_sql}) IS NULL OR length(({gh_sql})) = 0"
        f" THEN CAST(NULL AS {_POINT_STRUCT_T}) ELSE "
        + _b(f"({gh_sql})", "__gh", body)
        + " END"
    )


def haversine_sql(lo1: str, la1: str, lo2: str, la2: str) -> str:
    """Spherical haversine meters — the identical formula text both
    engines run (also the kql geo_distance_2points rewrite)."""
    return (
        f"(2 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin((radians({la2}) - radians({la1})) / 2), 2)"
        f" + cos(radians({la1})) * cos(radians({la2}))"
        f" * pow(sin((radians({lo2}) - radians({lo1})) / 2), 2))))"
    )


# meters per degree of latitude (and of longitude at the equator) on
# the sphere — used only for the coverage VALIDATION and the candidate
# offsets, never for the exact distance verify
_M_PER_DEG = 111194.92664455873  # 2*pi*R / 360


def geohash_radius_join(
    points: DataFrame,
    centers: DataFrame,
    radius_m: float,
    precision: int,
    p_id: str = "point_id",
    p_lon: str = "lon",
    p_lat: str = "lat",
    c_id: str = "center_id",
    c_lon: str = "lon",
    c_lat: str = "lat",
) -> DataFrame:
    """All (point, center) pairs within ``radius_m`` meters, by
    geohash-cell blocking: centers fan out to the cells of a 3×3
    offset grid covering their circle (×≤9 bounded expansion), points
    compute ONE cell, the sides hash-join on the cell id, and the
    exact haversine filters the candidates. Returns (p_id, c_id,
    distance_m).

    Correctness precondition: a cell must be ≥ 2·radius tall and wide
    at the centers' worst-case latitude, else a circle can touch cells
    the 3×3 grid misses — VALIDATED here with one bounded aggregate
    (max |lat| over centers is one row), loud ValueError otherwise
    (pick a smaller precision). At 100 TB: the centers side is
    dimensional (broadcast), the points side computes its cell in
    whole-stage codegen and joins without a shuffle of the big side
    beyond the one hash exchange; per-cell skew is real point density,
    the same economics as the LSH band join."""
    import math

    p = _check_precision(precision)
    nx, ny = _nx_ny(p)
    cell_lat_deg = 180.0 / (1 << ny)
    cell_lon_deg = 360.0 / (1 << nx)
    r_deg_lat = radius_m / _M_PER_DEG

    row = centers.agg(
        F.max(F.abs(F.col(c_lat))).alias("mx")
    ).collect()  # bounded: one row
    max_lat = float(row[0]["mx"] or 0.0)
    # the offset grid reaches radius_m beyond the extreme center
    worst_lat = min(max_lat + r_deg_lat, 89.9)
    cos_w = math.cos(math.radians(worst_lat))
    if cell_lat_deg * _M_PER_DEG < 2 * radius_m or (
        cell_lon_deg * _M_PER_DEG * cos_w < 2 * radius_m
    ):
        raise ValueError(
            f"geohash_radius_join: precision {p} cells "
            f"({cell_lat_deg * _M_PER_DEG / 1000:.1f} km lat x "
            f"{cell_lon_deg * _M_PER_DEG * cos_w / 1000:.1f} km lon at "
            f"lat {worst_lat:.1f}) are smaller than 2 x radius "
            f"({2 * radius_m / 1000:.1f} km) — the 3x3 covering would "
            "miss cells; use a coarser precision"
        )

    # centers x 9 offset cells, deduped per center
    off = F.explode(
        F.expr("array(-1.0D, 0.0D, 1.0D)")
    )
    c9 = (
        centers.select(
            F.col(c_id).alias("__cid"),
            F.col(c_lon).alias("__clon").cast("double"),
            F.col(c_lat).alias("__clat").cast("double"),
        )
        .withColumn("__dy", off)
        .withColumn("__dx", F.explode(F.expr("array(-1.0D, 0.0D, 1.0D)")))
        .withColumn(
            "__olat",
            F.expr(f"least(greatest(__clat + __dy * {r_deg_lat}, -90D), 90D)"),
        )
        .withColumn(
            "__olon",
            # wrap longitude so circles straddling the antimeridian
            # still cover their cells
            F.expr(
                f"__clon + __dx * {r_deg_lat}"
                " / greatest(cos(radians(__clat)), 0.01D)"
            ),
        )
        .withColumn(
            "__olon",
            F.expr(
                "CASE WHEN __olon > 180 THEN __olon - 360 "
                "WHEN __olon < -180 THEN __olon + 360 ELSE __olon END"
            ),
        )
        .select(
            "__cid", "__clon", "__clat",
            # integer cell id, not the geohash STRING: same cells
            # (bijective), but codegen arithmetic instead of an
            # interpreted HOF, and a BIGINT join key instead of a
            # string one (see cell_id_sql)
            F.expr(cell_id_sql("__olon", "__olat", p)).alias("__cell"),
        )
        .distinct()
    )
    pts = points.select(
        F.col(p_id).alias("__pid"),
        F.col(p_lon).alias("__plon").cast("double"),
        F.col(p_lat).alias("__plat").cast("double"),
    ).withColumn(
        "__cell", F.expr(cell_id_sql("__plon", "__plat", p))
    )
    joined = pts.join(F.broadcast(c9), "__cell").withColumn(
        "__dist",
        F.expr(haversine_sql("__plon", "__plat", "__clon", "__clat")),
    )
    return (
        joined.filter(F.col("__dist") <= F.lit(float(radius_m)))
        .select(
            F.col("__pid").alias(p_id),
            F.col("__cid").alias(c_id),
            F.col("__dist").alias("distance_m"),
        )
    )


def geohash_neighbors_sql(gh_sql: str) -> str:
    """``geo_geohash_neighbors(gh)`` — the up-to-8 adjacent cells of a
    geohash of ANY length, as an array of geohash strings in the fixed
    row-major order [SW, S, SE, W, E, NW, N, NE] (Kusto's exact order
    is unspecified; a pinned deterministic order keeps results
    reproducible). Longitude wraps across the antimeridian (xint ± 1
    mod 2^nx); latitude CLAMPS — cells touching a pole drop their
    out-of-range neighbors, so polar cells return fewer than 8.
    Invalid input → null (the decode contract)."""
    cvs = (
        f"transform(sequence(0, CAST(length(__gh) AS INT) - 1), __i ->"
        f" instr('{GEOHASH_ALPHABET}', substr(__gh, __i + 1, 1)) - 1)"
    )
    bit = (
        "(shiftright(element_at(__cv, CAST(__k DIV 5 AS INT) + 1),"
        " CAST(4 - __k % 5 AS INT)) & 1)"
    )
    xint = (
        "aggregate(sequence(0, 5 * CAST(length(__gh) AS INT) - 1),"
        " CAST(0 AS BIGINT), (a, __k) -> IF(__k % 2 = 0,"
        f" a * 2 + {bit}, a))"
    )
    yint = (
        "aggregate(sequence(0, 5 * CAST(length(__gh) AS INT) - 1),"
        " CAST(0 AS BIGINT), (a, __k) -> IF(__k % 2 = 1,"
        f" a * 2 + {bit}, a))"
    )
    nx = "CAST((5 * length(__gh) + 1) DIV 2 AS INT)"
    ny = "CAST((5 * length(__gh)) DIV 2 AS INT)"
    # re-encode (dynamic-length twin of the compile-time interleave in
    # geohash_sql): char ci = fold of the 5 interleaved bits
    char = (
        "aggregate(sequence(0, 4), CAST(0 AS BIGINT), (a, __j) ->"
        " a * 2 + IF((5 * __ci + __j) % 2 = 0,"
        " shiftright(__nxi, __hx - 1 - CAST((5 * __ci + __j) DIV 2 AS INT)) & 1,"
        " shiftright(__nyi, __hy - 1 - CAST((5 * __ci + __j) DIV 2 AS INT)) & 1))"
    )
    enc = (
        "array_join(transform(sequence(0, CAST(length(__gh) AS INT) - 1),"
        f" __ci -> substr('{GEOHASH_ALPHABET}', CAST(({char}) AS INT) + 1, 1)),"
        " '')"
    )
    # candidate offsets (dx, dy) in row-major order, excluding (0, 0):
    # dy=-1 row (SW, S, SE), dy=0 (W, E), dy=+1 (NW, N, NE)
    offs = (
        "array(named_struct('dx', -1, 'dy', -1), named_struct('dx', 0, 'dy', -1),"
        " named_struct('dx', 1, 'dy', -1), named_struct('dx', -1, 'dy', 0),"
        " named_struct('dx', 1, 'dy', 0), named_struct('dx', -1, 'dy', 1),"
        " named_struct('dx', 0, 'dy', 1), named_struct('dx', 1, 'dy', 1))"
    )
    per_off = (
        "IF(__yi + __o.dy < 0 OR __yi + __o.dy >= shiftleft(CAST(1 AS BIGINT), __hy),"
        " CAST(NULL AS STRING), "
        + _b(
            "pmod(__xi + __o.dx, shiftleft(CAST(1 AS BIGINT), __hx))",
            "__nxi",
            _b("__yi + CAST(__o.dy AS BIGINT)", "__nyi", enc),
        )
        + ")"
    )
    body = _b(
        cvs, "__cv",
        "CASE WHEN size(filter(__cv, __v -> __v < 0)) > 0"
        " THEN CAST(NULL AS ARRAY<STRING>) ELSE "
        + _b(
            xint, "__xi",
            _b(
                yint, "__yi",
                _b(
                    nx, "__hx",
                    _b(
                        ny, "__hy",
                        f"filter(transform({offs}, __o -> {per_off}),"
                        " __s -> __s IS NOT NULL)",
                    ),
                ),
            ),
        )
        + " END",
    )
    return (
        f"CASE WHEN ({gh_sql}) IS NULL OR length(({gh_sql})) = 0"
        " THEN CAST(NULL AS ARRAY<STRING>) ELSE "
        + _b(f"({gh_sql})", "__gh", body)
        + " END"
    )
