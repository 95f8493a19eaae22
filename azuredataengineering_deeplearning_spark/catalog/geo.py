"""Catalog: round-13 geo family — closed-form geohash encode/decode
and the geohash-blocked radius join (operators/spatial.py).

Both oracles replay the IDENTICAL closed forms in DuckDB dialect
(fixed-point quantize + bit interleave, spherical haversine on the
shared IUGG radius) — no approximation gap to paper over. Point data
is synthesized from events columns with pure integer/double
arithmetic both engines compute identically."""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators.spatial import (
    GEOHASH_ALPHABET,
    geohash_radius_join,
    _nx_ny,
)
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet


def _duck_geohash(lon: str, lat: str, p: int) -> str:
    """The engine's closed-form geohash in DuckDB dialect (>> works
    there; the arithmetic text is otherwise identical)."""
    nx, ny = _nx_ny(p)
    xint = (
        f"CAST(least(greatest(floor((({lon}) + 180) / 360 * {1 << nx}),"
        f" 0), {(1 << nx) - 1}) AS BIGINT)"
    )
    yint = (
        f"CAST(least(greatest(floor((({lat}) + 90) / 180 * {1 << ny}),"
        f" 0), {(1 << ny) - 1}) AS BIGINT)"
    )
    chars = []
    for ci in range(p):
        terms = []
        for j in range(5):
            k = 5 * ci + j
            w = 1 << (4 - j)
            if k % 2 == 0:
                terms.append(f"(({xint} >> {nx - 1 - k // 2}) & 1) * {w}")
            else:
                terms.append(f"(({yint} >> {ny - 1 - k // 2}) & 1) * {w}")
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', CAST(({' + '.join(terms)})"
            " AS INT) + 1, 1)"
        )
    return " || ".join(chars)


def _duck_center(axis_int: str, nbits: int, full: int, off: int) -> str:
    """Cell center coordinate from the quantized axis integer."""
    return (
        f"-{off} + {full} * (CAST({axis_int} AS DOUBLE) + 0.5)"
        f" / {1 << nbits}"
    )


_P = 7
_NX, _NY = _nx_ny(_P)
_LON = "(event_id % 3600) / 10.0 - 180 + 0.05"
_LAT = "(user_id % 1600) / 10.0 - 80 + 0.05"
_XI = (
    f"CAST(least(greatest(floor((({_LON}) + 180) / 360 * {1 << _NX}),"
    f" 0), {(1 << _NX) - 1}) AS BIGINT)"
)
_YI = (
    f"CAST(least(greatest(floor((({_LAT}) + 90) / 180 * {1 << _NY}),"
    f" 0), {(1 << _NY) - 1}) AS BIGINT)"
)


@query(
    "kql_geo_geohash",
    f"""
    SELECT event_id,
           {_duck_geohash(_LON, _LAT, _P)} AS gh,
           {_duck_center(_XI, _NX, 360, 180)} AS clon,
           {_duck_center(_YI, _NY, 180, 90)} AS clat
    FROM events
    """,
)
def kql_geo_geohash(spark, sf_dir):
    """KQL ``geo_point_to_geohash`` + ``geo_geohash_to_central_point``
    round trip over synthesized event points: encode at precision 7,
    decode the cell center back out. The oracle interleaves the same
    quantized axis integers and derives the center from them directly
    — so a broken decode shows up as a center mismatch. Pure
    whole-stage-codegen bit math, zero UDFs, zero shuffles."""
    t = read_parquet(spark, f"{sf_dir}/events.parquet")
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    out = kql_to_df(
        {"events": t},
        f"""
        events
        | extend lon = todouble(event_id % 3600) / 10.0 - 180 + 0.05,
                 lat = todouble(user_id % 1600) / 10.0 - 80 + 0.05
        | extend gh = geo_point_to_geohash(lon, lat, {_P})
        | extend c = geo_geohash_to_central_point(gh)
        | project event_id, gh, c
        """,
    )
    return out.selectExpr(
        "event_id", "gh",
        "c.coordinates[0] as clon", "c.coordinates[1] as clat",
    )


@query(
    "geo_radius_join",
    f"""
    WITH c AS (
      SELECT event_type AS center_id,
             (unicode(substr(event_type, 1, 1)) * 7 +
              unicode(substr(event_type, 2, 1)) * 3) % 280 - 140 + 0.25 AS lon,
             (unicode(substr(event_type, 1, 1)) * 11 +
              length(event_type) * 17) % 100 - 50 + 0.25 AS lat
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    p AS (
      SELECT e.event_id AS point_id,
             c.lon + (e.event_id % 200) / 100.0 - 1.0 AS lon,
             c.lat + (e.user_id % 200) / 100.0 - 1.0 AS lat
      FROM events e JOIN c ON e.event_type = c.center_id
    )
    SELECT p.point_id, c.center_id,
           2 * 6371008.8 * asin(sqrt(
             pow(sin((radians(c.lat) - radians(p.lat)) / 2), 2)
             + cos(radians(p.lat)) * cos(radians(c.lat))
             * pow(sin((radians(c.lon) - radians(p.lon)) / 2), 2)))
             AS distance_m
    FROM p CROSS JOIN c
    WHERE 2 * 6371008.8 * asin(sqrt(
             pow(sin((radians(c.lat) - radians(p.lat)) / 2), 2)
             + cos(radians(p.lat)) * cos(radians(c.lat))
             * pow(sin((radians(c.lon) - radians(p.lon)) / 2), 2)))
          <= 30000
    """,
)
def geo_radius_join(spark, sf_dir):
    """Spatial radius join, geohash-blocked: points clustered ±1°
    around per-type centers, all (point, center) pairs within 30 km.
    Engine: centers fan out to a 3×3 offset-cell covering (×≤9,
    broadcast), points compute ONE cell, equi-join on the cell id,
    exact haversine verify — never a cross product (the oracle IS the
    cross product, which is exactly what this operator exists to
    avoid at scale). Precision 3 cells (~156 km) ≥ 2×30 km at the
    centers' worst latitude — validated inside the operator."""
    e = read_parquet(
        spark, f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )
    centers = (
        e.select("event_type").distinct().selectExpr(
            "event_type as center_id",
            "(ascii(substr(event_type, 1, 1)) * 7 +"
            " ascii(substr(event_type, 2, 1)) * 3) % 280 - 140 + 0.25"
            " as lon",
            "(ascii(substr(event_type, 1, 1)) * 11 +"
            " length(event_type) * 17) % 100 - 50 + 0.25 as lat",
        )
    )
    # points JOIN the centers dim rather than inlining the (pure
    # function of event_type) center formula — measured deliberately in
    # r13-opt: the inline form is ~15% SLOWER (interleaved medians
    # 1.56 s join vs 1.79 s inline at sf0.1) because CollapseProject
    # substitutes the ascii/substr formula into every one of the ~70
    # references the geohash bit-math makes to lon/lat, while the join
    # output is an attribute the codegen evaluates once per row. The
    # broadcast build of a |event_type|-row dim is noise by comparison.
    points = e.join(
        centers.withColumnRenamed("center_id", "event_type"),
        "event_type",
    ).selectExpr(
        "event_id as point_id",
        "lon + (event_id % 200) / 100.0 - 1.0 as lon",
        "lat + (user_id % 200) / 100.0 - 1.0 as lat",
    )
    return geohash_radius_join(
        points, centers, radius_m=30000, precision=3
    )


def _duck_geohash_from_ints(xi: str, yi: str, p: int) -> str:
    """Bit-interleave encode from the quantized axis integers (DuckDB
    dialect) — the re-encode half of the neighbors oracle."""
    nx, ny = _nx_ny(p)
    chars = []
    for ci in range(p):
        terms = []
        for j in range(5):
            k = 5 * ci + j
            w = 1 << (4 - j)
            if k % 2 == 0:
                terms.append(f"((({xi}) >> {nx - 1 - k // 2}) & 1) * {w}")
            else:
                terms.append(f"((({yi}) >> {ny - 1 - k // 2}) & 1) * {w}")
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', CAST(({' + '.join(terms)})"
            " AS INT) + 1, 1)"
        )
    return " || ".join(chars)


_P5 = 5
_NX5, _NY5 = _nx_ny(_P5)
_XI5 = (
    f"CAST(least(greatest(floor((({_LON}) + 180) / 360 * {1 << _NX5}),"
    f" 0), {(1 << _NX5) - 1}) AS BIGINT)"
)
_YI5 = (
    f"CAST(least(greatest(floor((({_LAT}) + 90) / 180 * {1 << _NY5}),"
    f" 0), {(1 << _NY5) - 1}) AS BIGINT)"
)


@query(
    "kql_geo_neighbors",
    f"""
    WITH pts AS (
      SELECT event_id, {_XI5} AS xi, {_YI5} AS yi FROM events
    ),
    offs AS (
      SELECT * FROM (VALUES (-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                            (-1, 1), (0, 1), (1, 1)) o(dx, dy)
    ),
    nb AS (
      SELECT p.event_id,
             ((p.xi + o.dx) % {1 << _NX5} + {1 << _NX5}) % {1 << _NX5} AS nxi,
             p.yi + o.dy AS nyi
      FROM pts p CROSS JOIN offs o
      WHERE p.yi + o.dy >= 0 AND p.yi + o.dy < {1 << _NY5}
    )
    SELECT event_id, {_duck_geohash_from_ints('nxi', 'nyi', _P5)} AS nb
    FROM nb
    """,
)
def kql_geo_neighbors(spark, sf_dir):
    """KQL ``geo_geohash_neighbors`` over the synthesized event points
    (precision 5): decode → ±1 in each axis with longitude wrap and
    latitude clamp → re-encode, exploded to one row per neighbor. The
    oracle derives the quantized axis integers from the coordinates
    directly and re-interleaves — so both the decode and the
    neighbor-encode halves are independently checked."""
    t = read_parquet(spark, f"{sf_dir}/events.parquet")
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    out = kql_to_df(
        {"events": t},
        """
        events
        | extend lon = todouble(event_id % 3600) / 10.0 - 180 + 0.05,
                 lat = todouble(user_id % 1600) / 10.0 - 80 + 0.05
        | extend nbs = geo_geohash_neighbors(geo_point_to_geohash(lon, lat, 5))
        | project event_id, nbs
        """,
    )
    # MATERIALIZE the array before the explode (scoped persist):
    # CollapseProject would otherwise inline the heavy interpreted
    # HOF expression into Generate, which re-pays the generator per
    # OUTPUT row — 100k inputs × 8-way fan measured 38 s fused vs
    # 0.6 s materialized (SCALING.md round-13 note)
    out = out.persist()
    return out.selectExpr("event_id", "explode(nbs) as nb")
