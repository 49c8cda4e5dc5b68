"""Property-based tests (hypothesis) for the pure-python kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmalyzer_spark.datagen.png import png_decode, png_encode
from osmalyzer_spark.geo.polygon import ring_contains, ring_to_wkb, wkb_to_ring
from osmalyzer_spark.geo.proj import lks92_forward, lks92_inverse
from tests.oracle_correlator import haversine


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


@settings(max_examples=30, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-89, 89, allow_nan=False), st.floats(-179, 179, allow_nan=False)
        ),
        min_size=3,
        max_size=12,
    )
)
def test_wkb_roundtrip_property(pts):
    ring = np.array(pts, dtype=np.float64)
    assert np.array_equal(wkb_to_ring(ring_to_wkb(ring)), ring)


@settings(max_examples=50, deadline=None)
@given(
    lat=st.floats(55.0, 59.0, allow_nan=False),
    lon=st.floats(20.0, 29.0, allow_nan=False),
)
def test_lks92_roundtrip_property(lat, lon):
    x, y = lks92_forward(np.array([lat]), np.array([lon]))
    lat2, lon2 = lks92_inverse(x, y)
    assert abs(lat2[0] - lat) < 5e-7
    assert abs(lon2[0] - lon) < 5e-7


@settings(max_examples=30, deadline=None)
@given(
    lat=st.floats(55.6, 58.1, allow_nan=False),
    lon=st.floats(20.9, 28.3, allow_nan=False),
    seed=st.integers(0, 10_000),
)
def test_pip_oracle_property(lat, lon, seed):
    """Vectorized ray cast == scalar reference implementation for random
    rings and points (generalizes the ChunkerTests oracle pattern)."""
    rng = np.random.default_rng(seed)
    ring = np.stack(
        [rng.uniform(55.0, 59.0, 6), rng.uniform(20.0, 29.0, 6)], axis=1
    )
    got = ring_contains(np.array([lat]), np.array([lon]), ring)[0]

    res = False
    b = len(ring) - 1
    for a in range(len(ring)):
        la, ga = ring[a]
        lb, gb = ring[b]
        if (ga < lon and gb >= lon) or (gb < lon and ga >= lon):
            if la + (lon - ga) / (gb - ga) * (lb - la) < lat:
                res = not res
        b = a
    assert bool(got) == res


@settings(max_examples=30, deadline=None)
@given(
    lat1=st.floats(-85, 85, allow_nan=False),
    lon1=st.floats(-179, 179, allow_nan=False),
    lat2=st.floats(-85, 85, allow_nan=False),
    lon2=st.floats(-179, 179, allow_nan=False),
)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d = haversine(lat1, lon1, lat2, lon2)
    assert d >= 0
    assert d == haversine(lat2, lon2, lat1, lon1)  # symmetry
    assert haversine(lat1, lon1, lat1, lon1) == 0.0
    assert d <= 6_376_500.0 * np.pi + 1e-6  # half circumference bound
