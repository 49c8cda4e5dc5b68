"""Geodesic scalar math as native Spark column expressions.

Everything here stays JVM-side (whole-stage codegen) — no UDFs. Semantics
mirror the reference's scalar kernel so parity tests can compare distances
bit-closely:

- haversine with R = 6 376 500 m and the atan2 formulation
  (reference: Core/Helpers/OsmGeoTools.cs:16-25)
- cheap pythagorean distance at 111 139 m/deg (OsmGeoTools.cs:32-39)
- interior segment angle with cos(lat) lon scaling (OsmGeoTools.cs:70-86)
- spherical shoelace area in km^2 with R = 6 378 137 (OsmGeoTools.cs:93-111)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_376_500.0  # reference haversine radius
AREA_RADIUS_M = 6_378_137.0  # reference area radius (WGS84 equatorial)
METERS_PER_DEGREE = 111_139.0


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (atan2 haversine, R=6 376 500)."""
    la1, lo1, la2, lo2 = (F.radians(_c(v)) for v in (lat1, lon1, lat2, lon2))
    a = (
        F.pow(F.sin((la2 - la1) / 2.0), F.lit(2.0))
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2.0), F.lit(2.0))
    )
    return F.lit(EARTH_RADIUS_M) * 2.0 * F.atan2(F.sqrt(a), F.sqrt(1.0 - a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL text (used to build DuckDB oracles)."""
    la1 = f"radians({lat1})"
    lo1 = f"radians({lon1})"
    la2 = f"radians({lat2})"
    lo2 = f"radians({lon2})"
    a = (
        f"(pow(sin(({la2}-{la1})/2),2) + cos({la1})*cos({la2})"
        f"*pow(sin(({lo2}-{lo1})/2),2))"
    )
    return f"(6376500.0 * 2.0 * atan2(sqrt({a}), sqrt(1.0-{a})))"


def cheap_distance_m(lat1, lon1, lat2, lon2) -> Column:
    """Fast planar approximation: sqrt(dlat^2+dlon^2) * 111 139."""
    dlat = _c(lat2) - _c(lat1)
    dlon = _c(lon2) - _c(lon1)
    return F.sqrt(dlat * dlat + dlon * dlon) * F.lit(METERS_PER_DEGREE)


def angle_between_segments_deg(a_lat, a_lon, s_lat, s_lon, b_lat, b_lon) -> Column:
    """Interior angle at the shared point between shared->a and shared->b,
    in degrees [0, 180]; lon deltas scaled by cos(shared.lat)."""
    cos_lat = F.cos(F.radians(_c(s_lat)))
    ax = (_c(a_lon) - _c(s_lon)) * cos_lat
    ay = _c(a_lat) - _c(s_lat)
    bx = (_c(b_lon) - _c(s_lon)) * cos_lat
    by = _c(b_lat) - _c(s_lat)
    dot = ax * bx + ay * by
    cross = ax * by - ay * bx
    return F.degrees(F.atan2(F.abs(cross), dot))


def spherical_area_km2_expr(ring) -> Column:
    """Area in km^2 of a closed ring given as array<struct<lat,lon>>.

    Spherical shoelace over consecutive vertex pairs; `aggregate` keeps the
    fold inside the JVM. Returns 0.0 for rings with <3 vertices.

    Parity note: the reference (OsmGeoTools.cs:93-111) feeds *degree* lon
    deltas into the spherical formula (no radian conversion), so its result
    is 180/pi times the true spherical area. We reproduce that behavior
    exactly — parity beats physics here; divide by 57.29578 for real km^2.
    """
    ring = _c(ring)
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 2)  # pairs (i, i+1)
    term = F.transform(
        idx,
        lambda i: (
            (ring[i + 1]["lon"] - ring[i]["lon"])
            * (
                F.lit(2.0)
                + F.sin(F.radians(ring[i]["lat"]))
                + F.sin(F.radians(ring[i + 1]["lat"]))
            )
        ),
    )
    total = F.aggregate(term, F.lit(0.0), lambda acc, x: acc + x)
    area = F.abs(total * F.lit(AREA_RADIUS_M) * F.lit(AREA_RADIUS_M) / 2.0 / 1_000_000.0)
    return F.when(n < 3, F.lit(0.0)).otherwise(area)


def centroid_expr(ring) -> Column:
    """Average coordinate of an array<struct<lat,lon>> (plain mean of
    vertices, the reference's AverageCoord semantics)."""
    ring = _c(ring)
    n = F.size(ring).cast("double")
    lat = F.aggregate(ring, F.lit(0.0), lambda acc, p: acc + p["lat"]) / n
    lon = F.aggregate(ring, F.lit(0.0), lambda acc, p: acc + p["lon"]) / n
    return F.struct(lat.alias("lat"), lon.alias("lon"))
