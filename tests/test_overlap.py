"""A11 polygon overlap coverage — mirrors CoreTests/OsmPolygonTests.cs:
exact match ~100%, disjoint ~0%, partial in between."""

import numpy as np

from osmalyzer_spark.geo.polygon import (
    overlap_coverage,
    overlap_coverage_udf,
    ring_to_wkb,
    simplify_ring,
)


def square(lat0, lon0, size):
    return np.array(
        [(lat0, lon0), (lat0, lon0 + size), (lat0 + size, lon0 + size), (lat0 + size, lon0)]
    )


def test_identical_rings_full_coverage():
    a = square(56.0, 24.0, 0.01)
    assert overlap_coverage(a, a) == 1.0


def test_near_identical_within_epsilon():
    a = square(56.0, 24.0, 0.01)
    b = a + 3.0 / 111_139.0  # shifted ~3 m < 10 m epsilon
    assert overlap_coverage(a, b) >= 0.99


def test_disjoint_zero():
    a = square(56.0, 24.0, 0.01)
    b = square(57.0, 25.0, 0.01)
    assert overlap_coverage(a, b) == 0.0


def test_partial_overlap_between():
    a = square(56.0, 24.0, 0.01)
    # shares the left edge only
    b = np.array(
        [(56.0, 23.99), (56.0, 24.0), (56.01, 24.0), (56.01, 23.99)]
    )
    cov = overlap_coverage(a, b)
    assert 0.05 < cov < 0.6


def test_simplify_ring():
    # collinear midpoints collapse
    ring = np.array([(0.0, 0.0), (0.0, 0.5), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)])
    simp = simplify_ring(ring, 1e-9)
    assert len(simp) == 4  # midpoint dropped (endpoints kept)


def test_overlap_udf(spark):
    a = ring_to_wkb(square(56.0, 24.0, 0.01))
    b = ring_to_wkb(square(56.0, 24.0, 0.01) + 3.0 / 111_139.0)
    c = ring_to_wkb(square(57.0, 25.0, 0.01))
    df = spark.createDataFrame(
        [(bytearray(a), bytearray(b)), (bytearray(a), bytearray(c))],
        "a_wkb binary, b_wkb binary",
    )
    got = [r[0] for r in df.select(overlap_coverage_udf()("a_wkb", "b_wkb")).collect()]
    assert got[0] >= 0.99
    assert got[1] == 0.0
