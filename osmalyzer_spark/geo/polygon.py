"""Polygons, WKB codec, and vectorized ray-cast point-in-polygon.

Semantics mirror the reference:

- ray cast parity test with the exact boundary conventions of
  Core/Helpers/OsmPolygon.cs:112-128 (edge straddles the point's lon with
  strict `<` on one end and `>=` on the other; interpolated lat strictly
  below the point's lat toggles).
- multipolygon = inside any outer ring AND inside no inner ring (hole)
  (Core/Helpers/OsmMultiPolygon.cs:238-262).
- fuzzy relation containment: fraction of member nodes inside vs loose 0.3
  / strict 0.8 thresholds (Core/Helpers/OsmPolygon.cs:62-94) — exposed as
  DataFrame-level aggregation in operators.pip_join.

Polygons are small (admin boundaries) and are BROADCAST to executors via
UDF closure; points are the big side and flow through a vectorized numpy
ray cast (loop over edges, vectorized over the Arrow batch of points — no
per-row Python).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WKB_LINESTRING = 2

LOOSE_CONTAINMENT = 0.3
STRICT_CONTAINMENT = 0.8


def ring_to_wkb(ring: np.ndarray) -> bytes:
    """Encode an (n,2) array of (lat, lon) as a little-endian WKB
    LineString (x=lon, y=lat)."""
    ring = np.asarray(ring, dtype=np.float64)
    out = [struct.pack("<BII", 1, _WKB_LINESTRING, len(ring))]
    xy = np.empty((len(ring), 2), dtype="<f8")
    xy[:, 0] = ring[:, 1]  # x = lon
    xy[:, 1] = ring[:, 0]  # y = lat
    out.append(xy.tobytes())
    return b"".join(out)


def wkb_to_ring(wkb: bytes) -> np.ndarray:
    """Decode a WKB LineString into an (n,2) array of (lat, lon)."""
    byte_order, geom_type, n = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or geom_type != _WKB_LINESTRING:
        raise ValueError(f"unsupported WKB (order={byte_order} type={geom_type})")
    xy = np.frombuffer(wkb, dtype="<f8", count=2 * n, offset=9).reshape(n, 2)
    ring = np.empty_like(xy)
    ring[:, 0] = xy[:, 1]  # lat
    ring[:, 1] = xy[:, 0]  # lon
    return ring


def ring_contains(lats: np.ndarray, lons: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray cast of many points against one ring.

    Boundary conventions replicate OsmPolygon.cs:112-128 exactly: for each
    edge (a, b): toggle when the edge lons straddle the point lon
    (`lon_a < p < = lon_b` style asymmetry) and the lat interpolated at the
    point's lon is strictly below the point's lat.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    rl = np.asarray(ring[:, 0], dtype=np.float64)
    rg = np.asarray(ring[:, 1], dtype=np.float64)
    inside = np.zeros(lats.shape[0], dtype=bool)
    b = len(rl) - 1
    for a in range(len(rl)):
        la, ga = rl[a], rg[a]
        lb, gb = rl[b], rg[b]
        straddle = ((ga < lons) & (gb >= lons)) | ((gb < lons) & (ga >= lons))
        if straddle.any():
            denom = gb - ga  # nonzero wherever straddle holds
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(denom != 0.0, (lons - ga) / np.where(denom == 0.0, 1.0, denom), 0.0)
                crossing_lat = la + t * (lb - la)
            inside ^= straddle & (crossing_lat < lats)
        b = a
    return inside


@dataclass
class Polygon:
    """One (multi)polygon: any number of outer rings plus holes.

    Rings are (n,2) float64 arrays of (lat, lon); closure of the ring is
    implicit (the ray cast wraps last->first like the reference).
    """

    outers: list[np.ndarray]
    inners: list[np.ndarray] = field(default_factory=list)
    polygon_id: str = ""

    def contains(self, lats: np.ndarray, lons: np.ndarray) -> np.ndarray:
        inside = np.zeros(len(lats), dtype=bool)
        # bbox prefilter — skip the edge loop for far-away batches
        lats = np.asarray(lats, dtype=np.float64)
        lons = np.asarray(lons, dtype=np.float64)
        for outer in self.outers:
            bb = (
                (lats >= outer[:, 0].min())
                & (lats <= outer[:, 0].max())
                & (lons >= outer[:, 1].min())
                & (lons <= outer[:, 1].max())
            )
            if bb.any():
                sub = ring_contains(lats[bb], lons[bb], outer)
                tmp = np.zeros(len(lats), dtype=bool)
                tmp[np.where(bb)[0]] = sub
                inside |= tmp
        for inner in self.inners:
            if inside.any():
                hole = ring_contains(lats, lons, inner)
                inside &= ~hole
        return inside

    def to_wkb_row(self) -> dict:
        return {
            "polygon_id": self.polygon_id,
            "kind": "multipolygon" if (self.inners or len(self.outers) > 1) else "simple",
            "outer_wkb": [ring_to_wkb(r) for r in self.outers],
            "inner_wkb": [ring_to_wkb(r) for r in self.inners],
        }

    @classmethod
    def from_wkb_row(cls, row) -> "Polygon":
        return cls(
            outers=[wkb_to_ring(bytes(w)) for w in row["outer_wkb"]],
            inners=[wkb_to_ring(bytes(w)) for w in (row["inner_wkb"] or [])],
            polygon_id=row["polygon_id"],
        )


def pip_bool_udf(polygon: Polygon):
    """pandas UDF: (lat, lon) -> boolean contained-in-`polygon`.

    The polygon rides to executors inside the UDF closure (broadcast by
    task serialization — tiny)."""

    @F.pandas_udf(T.BooleanType())
    def _contains(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(polygon.contains(lat.to_numpy(), lon.to_numpy()))

    return _contains


def pip_tag_udf(polygons: list[Polygon]):
    """pandas UDF: (lat, lon) -> polygon_id of the first containing polygon
    (list order), else null. Used to tag each point with its region."""
    polys = list(polygons)

    @F.pandas_udf(T.StringType())
    def _tag(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy()
        lo = lon.to_numpy()
        out = np.full(len(la), None, dtype=object)
        unassigned = np.ones(len(la), dtype=bool)
        for poly in polys:
            if not unassigned.any():
                break
            hit = poly.contains(la, lo) & unassigned
            out[hit] = poly.polygon_id
            unassigned &= ~hit
        return pd.Series(out)

    return _tag


def pip_tag_expr(polygons: list[Polygon], lat, lon) -> Column:
    """Native region tag: polygon_id of the first containing polygon
    (list order, same semantics as pip_tag_udf), else null. Falls back
    to the vectorized UDF when the combined vertex count would blow up
    the literal plan size."""
    if sum(len(r) for p in polygons for r in p.outers + p.inners) > _NATIVE_VERTEX_LIMIT:
        lat_c = lat if isinstance(lat, Column) else F.col(lat)
        lon_c = lon if isinstance(lon, Column) else F.col(lon)
        return pip_tag_udf(polygons)(lat_c, lon_c)
    expr = F.lit(None).cast(T.StringType())
    for poly in reversed(list(polygons)):
        expr = F.when(contains_expr(poly, lat, lon), F.lit(poly.polygon_id)).otherwise(
            expr
        )
    return expr


def inside_ring_expr(lat, lon, ring) -> Column:
    """Native-expression ray cast of a point against a per-row ring column
    (array<struct<lat,lon>>, closing vertex stored) — the same boundary
    conventions and IEEE operation order as `ring_contains`
    (OsmPolygon.cs:112-128): edge (a, a-1 wrap over ALL stored vertices),
    toggle when the edge lons straddle the point lon and the lat
    interpolated at the point lon is strictly below the point lat.

    Replaces the per-pair pandas-UDF ray cast on hot paths: the ring
    arrays stay in the JVM instead of crossing the Arrow boundary once
    per candidate pair (guide §4.1; measured ~3 s of a 10 s query at
    sf0.1 was Arrow struct-array serialization alone).
    """
    y = lat if isinstance(lat, Column) else F.col(lat)
    x = lon if isinstance(lon, Column) else F.col(lon)
    r = ring if isinstance(ring, Column) else F.col(ring)
    n = F.size(r)

    def term(apos):
        va = F.element_at(r, apos)
        vb = F.element_at(r, F.when(apos == 1, n).otherwise(apos - 1))
        ga, la = va["lon"], va["lat"]
        gb, lb = vb["lon"], vb["lat"]
        straddle = ((ga < x) & (gb >= x)) | ((gb < x) & (ga >= x))
        # same op order as ring_contains: t = (x-ga)/(gb-ga); la + t*(lb-la);
        # the denom==0 guard mirrors numpy's where() (straddle is false
        # there, so the guarded value never decides)
        t = F.when(gb != ga, (x - ga) / (gb - ga)).otherwise(F.lit(0.0))
        cross = la + t * (lb - la)
        return F.when(straddle & (cross < y), F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, apos: acc + term(apos)
    )
    return crossings % 2 == 1


def _ring_literal(ring: np.ndarray) -> Column:
    """A constant ring as an array<struct<lat,lon>> literal column. The
    ray cast over it is a runtime fold (`aggregate`), so codegen size
    does not grow with the vertex count — only the literal array does."""
    return F.array(
        *[
            F.struct(F.lit(float(la)).alias("lat"), F.lit(float(lo)).alias("lon"))
            for la, lo in ring
        ]
    )


# constant polygons up to this many total vertices evaluate natively (no
# Python boundary); larger ones keep the vectorized-UDF path so literal
# plan size stays bounded
_NATIVE_VERTEX_LIMIT = 512


def contains_expr(polygon: Polygon, lat, lon) -> Column:
    """Boolean column: point inside polygon. The bbox prefilter is always
    native; the exact ray cast is native too (inside_ring_expr over the
    rings as literals — bit-identical to ring_contains, guide §4.1: no
    Arrow round-trip per row) for constant polygons up to
    _NATIVE_VERTEX_LIMIT total vertices, else the vectorized UDF."""
    lat = lat if isinstance(lat, Column) else F.col(lat)
    lon = lon if isinstance(lon, Column) else F.col(lon)
    all_rings = polygon.outers + polygon.inners
    lat_min = min(float(r[:, 0].min()) for r in all_rings)
    lat_max = max(float(r[:, 0].max()) for r in all_rings)
    lon_min = min(float(r[:, 1].min()) for r in all_rings)
    lon_max = max(float(r[:, 1].max()) for r in all_rings)
    bbox = (
        (lat >= F.lit(lat_min))
        & (lat <= F.lit(lat_max))
        & (lon >= F.lit(lon_min))
        & (lon <= F.lit(lon_max))
    )
    if sum(len(r) for r in all_rings) <= _NATIVE_VERTEX_LIMIT:
        # mirrors Polygon.contains: per-outer bbox gate (pure perf — a
        # point outside a ring's bbox is outside the ring), OR over
        # outers, minus holes
        inside = F.lit(False)
        for outer in polygon.outers:
            ob = (
                (lat >= F.lit(float(outer[:, 0].min())))
                & (lat <= F.lit(float(outer[:, 0].max())))
                & (lon >= F.lit(float(outer[:, 1].min())))
                & (lon <= F.lit(float(outer[:, 1].max())))
            )
            inside = inside | (ob & inside_ring_expr(lat, lon, _ring_literal(outer)))
        for inner in polygon.inners:
            inside = inside & ~inside_ring_expr(lat, lon, _ring_literal(inner))
        return F.when(bbox, inside).otherwise(F.lit(False))
    return F.when(bbox, pip_bool_udf(polygon)(lat, lon)).otherwise(F.lit(False))


# --- polygon overlap coverage (A11) ---------------------------------------
# Reference: OsmPolygon.GetOverlapCoveragePercent (OsmPolygon.cs:155-215):
# sample points along each ring's perimeter (degree-length space, capped at
# max_samples), count the fraction within epsilon (meters at 111139 m/deg)
# of the other ring; the symmetric coverage is the min of both directions.
# Douglas-Peucker simplification mirrors OsmMultiPolygon.cs:125-146.


def _closed(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def _sample_along(ring: np.ndarray, step: float) -> np.ndarray:
    """Points every `step` (degree units) along the closed ring polyline,
    the LengthIndexedLine.ExtractPoint walk."""
    ring = _closed(ring)
    seg = np.diff(ring, axis=0)
    seg_len = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    ds = np.arange(0.0, total + step * 0.5, step)
    ds = np.clip(ds, 0.0, total)
    idx = np.clip(np.searchsorted(cum, ds, side="right") - 1, 0, len(seg_len) - 1)
    t = np.where(seg_len[idx] > 0, (ds - cum[idx]) / np.where(seg_len[idx] == 0, 1.0, seg_len[idx]), 0.0)
    return ring[idx] + seg[idx] * t[:, None]


def _min_dist_to_ring(points: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min Euclidean (degree-space) distance from each point to the closed
    ring's segments — vectorized over points x segments."""
    ring = _closed(ring)
    a = ring[:-1]  # (m, 2)
    d = ring[1:] - a  # (m, 2)
    dd = (d * d).sum(axis=1)  # (m,)
    # (n, m, 2) deltas
    pa = points[:, None, :] - a[None, :, :]
    t = np.where(dd > 0, (pa * d[None, :, :]).sum(axis=2) / np.where(dd == 0, 1.0, dd), 0.0)
    t = np.clip(t, 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * d[None, :, :]
    dist = np.hypot(points[:, None, 0] - proj[:, :, 0], points[:, None, 1] - proj[:, :, 1])
    return dist.min(axis=1)


def directed_coverage(
    source: np.ndarray, target: np.ndarray, epsilon_m: float = 10.0, max_samples: int = 300
) -> float:
    """Fraction of points sampled along `source` within epsilon of
    `target` (DirectedCoverage semantics incl. the step-size formula)."""
    src = _closed(source)
    seg = np.diff(src, axis=0)
    length = float(np.hypot(seg[:, 0], seg[:, 1]).sum())
    if length == 0.0:
        return 0.0
    eps_deg = epsilon_m / 111_139.0
    n_steps = min(max_samples, max(10, int(length / eps_deg)))
    step = length / n_steps
    pts = _sample_along(source, step)
    dist = _min_dist_to_ring(pts, target)
    return float((dist <= eps_deg).mean())


def overlap_coverage(
    a: np.ndarray, b: np.ndarray, epsilon_m: float = 10.0, max_samples: int = 300
) -> float:
    """Symmetric boundary-overlap coverage in [0, 1]: min of the two
    directed coverages (GetOverlapCoveragePercent)."""
    return min(
        directed_coverage(a, b, epsilon_m, max_samples),
        directed_coverage(b, a, epsilon_m, max_samples),
    )


def simplify_ring(ring: np.ndarray, tolerance_deg: float) -> np.ndarray:
    """Douglas-Peucker ring simplification (OsmMultiPolygon.cs:125-146
    pre-compare step)."""
    ring = np.asarray(ring, dtype=np.float64)

    def dp(pts: np.ndarray) -> np.ndarray:
        if len(pts) < 3:
            return pts
        a, b = pts[0], pts[-1]
        d = b - a
        dd = float((d * d).sum())
        if dd == 0:
            dist = np.hypot(*(pts - a).T)
        else:
            t = np.clip(((pts - a) @ d) / dd, 0.0, 1.0)
            proj = a + t[:, None] * d
            dist = np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])
        i = int(dist.argmax())
        if dist[i] > tolerance_deg:
            left = dp(pts[: i + 1])
            right = dp(pts[i:])
            return np.vstack([left[:-1], right])
        return np.vstack([pts[0], pts[-1]])

    return dp(ring)


def overlap_coverage_udf(epsilon_m: float = 10.0, max_samples: int = 300):
    """pandas UDF over (a_wkb binary, b_wkb binary) -> coverage double,
    for comparing polygon pairs at DataFrame scale (pairs are pre-bucketed
    by cell like any other spatial join)."""

    @F.pandas_udf(T.DoubleType())
    def _cov(a_wkb: pd.Series, b_wkb: pd.Series) -> pd.Series:
        out = np.empty(len(a_wkb))
        for i in range(len(a_wkb)):
            ra = wkb_to_ring(bytes(a_wkb.iloc[i]))
            rb = wkb_to_ring(bytes(b_wkb.iloc[i]))
            out[i] = overlap_coverage(ra, rb, epsilon_m, max_samples)
        return pd.Series(out)

    return _cov


def read_poly_text(text: str) -> np.ndarray:
    """Osmosis `.poly` text -> (n, 2) array of (lat, lon).

    Mirrors OsmPolygon.cs:19-44's "complete assumption about the file
    structure": line 0 = name, line 1 = section id, last two lines = END
    markers; every line in between is "<lon> <lat>" in scientific
    notation (the reference writes lon first).
    """
    lines = [ln for ln in text.splitlines()]
    coords = []
    for line in lines[2:-2]:
        parts = line.split()
        coords.append((float(parts[1]), float(parts[0])))
    return np.array(coords, dtype=float)


def write_poly_text(coords) -> str:
    """(lat, lon) sequence -> Osmosis `.poly` text (OsmPolygon.cs:138-152):
    "none"/"1" header, one "<lon:E> <lat:E>" line per vertex, END END.
    Python's %E prints 2-digit exponents where C# prints 3 — both parse
    back identically."""
    out = ["none", "1"]
    for lat, lon in np.asarray(coords, dtype=float):
        out.append(f"{lon:.6E} {lat:.6E}")
    out += ["END", "END"]
    return "\n".join(out) + "\n"
