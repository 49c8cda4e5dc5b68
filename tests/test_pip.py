import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.geo.polygon import (
    Polygon,
    contains_expr,
    pip_tag_udf,
    ring_contains,
    ring_to_wkb,
    wkb_to_ring,
)


def square(lat0, lon0, size):
    return np.array(
        [
            (lat0, lon0),
            (lat0, lon0 + size),
            (lat0 + size, lon0 + size),
            (lat0 + size, lon0),
        ]
    )


def test_wkb_roundtrip():
    ring = square(56.0, 24.0, 0.5)
    assert np.array_equal(wkb_to_ring(ring_to_wkb(ring)), ring)


def test_ring_contains_basic():
    ring = square(0.0, 0.0, 10.0)
    lats = np.array([5.0, 15.0, -1.0, 9.999])
    lons = np.array([5.0, 5.0, 5.0, 9.999])
    assert ring_contains(lats, lons, ring).tolist() == [True, False, False, True]


def test_ring_boundary_convention():
    """Reference ray cast (OsmPolygon.cs:112-128): the bottom-left corner
    vertex is OUT (interpolated lat < point lat is strict), a point on the
    left (lon-min) edge interior is IN for this orientation."""
    ring = square(0.0, 0.0, 10.0)
    # exactly on the lon=0 edge at lat=5
    on_left_edge = ring_contains(np.array([5.0]), np.array([0.0]), ring)[0]
    # exactly on the lon=10 edge at lat=5
    on_right_edge = ring_contains(np.array([5.0]), np.array([10.0]), ring)[0]
    # asymmetric boundary rule: exactly one side counts as inside
    assert on_left_edge != on_right_edge


def test_concave_polygon():
    # U-shape: notch cut from the top
    ring = np.array(
        [
            (0.0, 0.0),
            (0.0, 10.0),
            (10.0, 10.0),
            (10.0, 7.0),
            (2.0, 7.0),
            (2.0, 3.0),
            (10.0, 3.0),
            (10.0, 0.0),
        ]
    )
    lats = np.array([5.0, 5.0, 1.0])
    lons = np.array([5.0, 8.0, 5.0])  # in notch -> out; right arm in... (lat5,lon8): lat5 lon8: inside notch region? notch spans lon 3..7, lat 2..10
    got = ring_contains(lats, lons, ring).tolist()
    # (5,5): lon=5 within notch lon-range (3..7) and lat>2 -> outside
    # (5,8): lon=8 beyond notch -> inside
    # (1,5): below notch floor lat... notch is lat in [2,10] -> inside
    assert got == [False, True, True]


def test_polygon_with_hole():
    outer = square(0.0, 0.0, 10.0)
    hole = square(4.0, 4.0, 2.0)
    poly = Polygon(outers=[outer], inners=[hole], polygon_id="holey")
    lats = np.array([5.0, 2.0, 11.0])
    lons = np.array([5.0, 2.0, 5.0])
    assert poly.contains(lats, lons).tolist() == [False, True, False]


def test_multi_outer():
    poly = Polygon(outers=[square(0, 0, 2.0), square(10, 10, 2.0)], polygon_id="multi")
    lats = np.array([1.0, 11.0, 5.0])
    lons = np.array([1.0, 11.0, 5.0])
    assert poly.contains(lats, lons).tolist() == [True, True, False]


def test_contains_expr_and_tag_udf(spark):
    latvia_ish = Polygon(outers=[square(55.6, 20.9, 2.0)], polygon_id="latvia")
    riga = Polygon(outers=[square(56.5, 21.5, 0.2)], polygon_id="riga")
    df = spark.createDataFrame(
        [(1, 56.0, 21.5), (2, 59.9, 25.0), (3, 56.6, 21.6)],
        "id int, lat double, lon double",
    )
    got = df.withColumn("in_lv", contains_expr(latvia_ish, "lat", "lon")).orderBy("id")
    assert [r["in_lv"] for r in got.collect()] == [True, False, True]
    # first-match-wins tagging (riga listed first)
    tagged = df.withColumn("region", pip_tag_udf([riga, latvia_ish])(F.col("lat"), F.col("lon"))).orderBy("id")
    assert [r["region"] for r in tagged.collect()] == ["latvia", None, "riga"]


def test_oracle_equivalence_random():
    """Chunked-vs-brute-force pattern (CoreTests/ChunkerTests.cs):
    vectorized ray cast against a per-point python reimplementation."""
    rng = np.random.default_rng(7)
    ring = np.array([(float(a), float(b)) for a, b in rng.uniform(0, 10, (7, 2))])
    lats = rng.uniform(-1, 11, 500)
    lons = rng.uniform(-1, 11, 500)
    got = ring_contains(lats, lons, ring)

    def one(lat, lon):
        res = False
        b = len(ring) - 1
        for a in range(len(ring)):
            la, ga = ring[a]
            lb, gb = ring[b]
            if (ga < lon and gb >= lon) or (gb < lon and ga >= lon):
                if la + (lon - ga) / (gb - ga) * (lb - la) < lat:
                    res = not res
            b = a
        return res

    want = np.array([one(a, b) for a, b in zip(lats, lons)])
    assert np.array_equal(got, want)


def test_admin_polygons_fixture_roundtrip(spark):
    """FIXTURES §4: WKB table round-trip + the mandated edge cases —
    point in a hole, point on a ring edge (asymmetric convention),
    fuzzy 30%/80% member straddle."""
    from osmalyzer_spark.datagen.polygons import admin_polygons_table, load_polygons
    from osmalyzer_spark.operators.osm import fuzzy_relation_containment

    table = admin_polygons_table(spark)
    assert table.count() == 4
    polys = {p.polygon_id: p for p in load_polygons(table)}
    assert polys["hole_case"].inners and polys["multi_outer"].outers[1] is not None

    hole = polys["hole_case"]
    assert hole.contains(np.array([56.5]), np.array([25.5]))[0] == False  # in hole
    assert hole.contains(np.array([56.2]), np.array([25.2]))[0] == True
    # point exactly on the lon edge of the riga box: the <\/>= asymmetry
    # means exactly one vertical edge counts as inside
    riga = polys["riga"]
    on_w = riga.contains(np.array([56.95]), np.array([23.9]))[0]
    on_e = riga.contains(np.array([56.95]), np.array([24.4]))[0]
    assert bool(on_w) != bool(on_e)

    # relation members straddling latvia at ~30% and ~80%
    rows = []
    for i in range(10):
        rows.append((30, 56.9 if i < 3 else 59.5, 24.1))   # 30% inside
        rows.append((80, 56.9 if i < 8 else 59.5, 24.1))   # 80% inside
    df = spark.createDataFrame(rows, "relation_id long, lat double, lon double")
    got = {r["relation_id"]: r for r in fuzzy_relation_containment(df, polys["latvia"]).collect()}
    assert not got[30]["loose_inside"] or got[30]["containment"] == pytest.approx(0.3)
    assert got[80]["containment"] == pytest.approx(0.8)
    assert got[80]["loose_inside"] and not got[80]["strict_inside"]
