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


@settings(max_examples=200, deadline=None)
@given(raw=st.text(max_size=80))
def test_fuzzy_parser_never_crashes(raw):
    """Arbitrary text either parses to >=1 parts or returns None —
    never raises (the reference parser is likewise total on non-null)."""
    from osmalyzer_spark.functions.fuzzy_address import parse_fuzzy_address

    parts = parse_fuzzy_address(raw)
    assert parts is None or len(parts) >= 1
    if parts is not None:
        for p in parts:
            assert 0 <= p.confidence <= 4
            assert 0 <= p.index < len(raw.split(","))


@settings(max_examples=100, deadline=None)
@given(
    days=st.lists(
        st.sampled_from(["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su", "Xx"]),
        min_size=0, max_size=6,
    ),
    times=st.lists(st.sampled_from(["08:00-12:00", "09:00-13:00", "Off"]),
                   min_size=6, max_size=6),
)
def test_opening_hours_merge_properties(days, times):
    """Pure-python replica of the reference algorithm vs the Spark fold:
    same output on arbitrary line lists; output never longer than input."""
    lines = [f"{d} {t}" for d, t in zip(days, times)]

    # reference algorithm, transcribed (OsmOpeningHoursHelper.cs:19-127)
    def merge_py(ls):
        DAYS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
        out = []
        for cur in ls:
            if not out:
                out.append(cur)
                continue
            prev = out[-1]
            if len(cur) > 3 and cur[3] == "-":
                out.append(cur)
                continue
            sp = prev.find(" ")
            time_match = (
                sp >= 0 and len(cur) >= 4 and prev[sp + 1:] == cur[3:]
            )
            if len(prev) >= 3 and prev[2] == "-":
                a_end = prev[3:5] if len(prev) >= 5 else None
            else:
                a_end = prev[:2] if len(prev) >= 2 else None
            b_day = cur[:2] if len(cur) >= 2 else None
            seq = (
                a_end in DAYS and b_day in DAYS
                and DAYS.index(a_end) == DAYS.index(b_day) - 1
            )
            if time_match and seq:
                out[-1] = prev[:2] + "-" + b_day + " " + cur[3:]
            else:
                out.append(cur)
        return out

    expected = merge_py(lines)
    assert len(expected) <= max(len(lines), 1)
    test_opening_hours_merge_properties.cases.append((lines, expected))


test_opening_hours_merge_properties.cases = []


def test_opening_hours_merge_spark_matches_python_replica(spark):
    """Run the accumulated hypothesis cases through the Spark fold in ONE
    job and compare against the python replica (per-case Spark jobs would
    be too slow inside @given)."""
    from osmalyzer_spark.functions.opening_hours import merge_weekday_lines

    cases = test_opening_hours_merge_properties.cases
    assert cases, "hypothesis case collector ran first"
    df = spark.createDataFrame(
        [(i, lines) for i, (lines, _) in enumerate(cases)],
        "i long, lines array<string>",
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", merge_weekday_lines("lines").alias("m")).collect()
    }
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, f"case {i}: {cases[i][0]}"


@settings(max_examples=50, deadline=None)
@given(
    msgs=st.lists(st.binary(min_size=0, max_size=90), min_size=0, max_size=40)
)
def test_md5_batch_matches_hashlib(msgs):
    """Vectorized MD5 is bit-identical to hashlib on arbitrary bytes,
    across the 55-byte single-block boundary."""
    import hashlib

    from osmalyzer_spark.functions.md5 import md5_lower64_batch

    got = md5_lower64_batch(msgs)
    want = np.array(
        [int.from_bytes(hashlib.md5(m).digest()[8:], "little") for m in msgs],
        dtype=np.uint64,
    )
    assert (got == want).all() if len(msgs) else len(got) == 0


def _union_find_components(edges):
    """Plain union-find oracle: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=50, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    )
)
def test_union_find_oracle_is_consistent(edges):
    """The union-find oracle itself satisfies the component axioms: both
    endpoints of every edge share a label, and each label is the minimum
    node id of its label class (pure Python — the Spark comparison below
    uses its own deterministic graph set, no cross-test state)."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    want = _union_find_components(edges)
    for a, b in edges:
        assert want[a] == want[b]
    by_label: dict[int, list[int]] = {}
    for n, lbl in want.items():
        by_label.setdefault(lbl, []).append(n)
    for lbl, members in by_label.items():
        assert lbl == min(members)


def test_star_cc_spark_matches_union_find_oracle(spark):
    """Spark star CC == union-find on a fixed seeded graph set (chains,
    stars, cliques, random sparse multigraphs with self-loops dropped)."""
    import random

    from osmalyzer_spark.operators.dedup import connected_components_star

    rng = random.Random(20260816)
    cases = [
        [(i, i + 1) for i in range(12)],                      # one long chain
        [(0, i) for i in range(1, 10)],                       # star
        [(a, b) for a in range(6) for b in range(a + 1, 6)],  # clique
        [(1, 2), (3, 4), (5, 6), (7, 8)],                     # matchings
    ]
    for _ in range(6):
        n = rng.randint(2, 26)
        m = rng.randint(1, 60)
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        es = [(a, b) for a, b in es if a != b]
        if es:
            cases.append(es)
    for edges in cases:
        want = _union_find_components(edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        assert got == want, edges
