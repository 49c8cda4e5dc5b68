import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.geo.cells import cell_deg_for_radius, cell_id_expr, neighbor_cells_expr
from osmalyzer_spark.geo.distance import (
    angle_between_segments_deg,
    cheap_distance_m,
    haversine_m,
    spherical_area_km2_expr,
)
from tests.oracle_correlator import haversine as haversine_py


RNG = np.random.default_rng(42)


def _rand_latvia(n):
    lat = RNG.uniform(55.6, 58.1, n)
    lon = RNG.uniform(20.9, 28.3, n)
    return lat, lon


def test_haversine_matches_reference_formula(spark):
    lat1, lon1 = _rand_latvia(200)
    lat2, lon2 = _rand_latvia(200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d)) for a, b, c, d in zip(lat1, lon1, lat2, lon2)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = df.select(haversine_m("lat1", "lon1", "lat2", "lon2").alias("d")).toPandas()["d"].to_numpy()
    want = np.array([haversine_py(a, b, c, d) for a, b, c, d in zip(lat1, lon1, lat2, lon2)])
    assert np.allclose(got, want, rtol=1e-12, atol=1e-6)


def test_cheap_distance(spark):
    df = spark.createDataFrame([(56.0, 24.0, 56.1, 24.2)], "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(cheap_distance_m("lat1", "lon1", "lat2", "lon2").alias("d")).first()["d"]
    want = math.sqrt(0.1**2 + 0.2**2) * 111_139
    assert got == pytest.approx(want, rel=1e-12)


def test_angle_right_angle(spark):
    # at lat 0 (cos=1): a is due north of shared, b is due east -> 90 deg
    df = spark.createDataFrame([(1.0, 0.0, 0.0, 0.0, 0.0, 1.0)], "alat double, alon double, slat double, slon double, blat double, blon double")
    got = df.select(angle_between_segments_deg("alat", "alon", "slat", "slon", "blat", "blon").alias("a")).first()["a"]
    assert got == pytest.approx(90.0, abs=1e-9)


def test_spherical_area_small_square(spark):
    # ~1.113 km x ~1.113 km square at the equator -> about 1.24 km^2
    d = 0.01
    ring = [(0.0, 0.0), (0.0, d), (d, d), (d, 0.0), (0.0, 0.0)]
    df = spark.createDataFrame([(ring,)], "ring array<struct<lat:double,lon:double>>")
    got = df.select(spherical_area_km2_expr("ring").alias("a")).first()["a"]
    side_km = d * 111.32  # approx
    # reference formula uses degree lon deltas -> 180/pi x true area
    assert got == pytest.approx(side_km**2 * 180.0 / math.pi, rel=0.02)


def test_cell_adjacency_covers_radius(spark):
    """Any two points within radius r must land in the same or adjacent
    cells at cell_deg_for_radius(r) — the 3x3 ring join is then lossless."""
    r = 500.0
    cell_deg = cell_deg_for_radius(r, max_abs_lat_deg=58.2)
    n = 3000
    lat1, lon1 = _rand_latvia(n)
    # random offsets up to r meters
    bearing = RNG.uniform(0, 2 * math.pi, n)
    dist = RNG.uniform(0, r, n)
    dlat = dist * np.cos(bearing) / 111_320.0
    dlon = dist * np.sin(bearing) / (111_320.0 * np.cos(np.radians(lat1)))
    lat2, lon2 = lat1 + dlat, lon1 + dlon

    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d)) for a, b, c, d in zip(lat1, lon1, lat2, lon2)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    cells = df.select(
        cell_id_expr("lat1", "lon1", cell_deg).alias("c1"),
        cell_id_expr("lat2", "lon2", cell_deg).alias("c2"),
        neighbor_cells_expr(cell_id_expr("lat1", "lon1", cell_deg)).alias("ring"),
    )
    bad = cells.filter(~F.array_contains("ring", F.col("c2"))).count()
    assert bad == 0


def test_neighbor_ring_size(spark):
    df = spark.createDataFrame([(56.9, 24.1)], "lat double, lon double")
    ring = df.select(
        neighbor_cells_expr(cell_id_expr("lat", "lon", 0.01), ring=2).alias("r")
    ).first()["r"]
    assert len(ring) == 25
    assert len(set(ring)) == 25
