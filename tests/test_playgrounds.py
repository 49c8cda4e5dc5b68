"""PlaygroundAnalyzer semantics over a hand-built micro-fixture:
polygon containment, 30 m node proximity, 100 m nearest search,
orphans, and broken non-node playgrounds."""

from osmalyzer_spark.plans.playgrounds import playground_check

# ~11 m of latitude per 0.0001 deg at the reference earth radius
_SQ = [  # square: half 0.0005 lat x 0.001 lon around (56.95, 24.10)
    (56.9495, 24.099),
    (56.9495, 24.101),
    (56.9505, 24.101),
    (56.9505, 24.099),
]


def _elements(spark, rows):
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, lat double, lon double"
    )


def _playgrounds(spark, rows):
    return spark.createDataFrame(
        list(rows),
        "id long, ptype string, lat double, lon double, "
        "ring array<struct<lat double, lon double>>",
    )


def test_playground_classification(spark):
    pgs = _playgrounds(
        spark,
        [
            (1, "node", 56.90, 24.10, None),
            (2, "way", 56.95, 24.10, _SQ),
            (3, "way", 56.80, 24.10, None),  # open way: no polygon
        ],
    )
    els = _elements(
        spark,
        [
            (10, {"playground": "swing"}, 56.9002, 24.10),    # 22 m from node: ok
            (11, {"playground": "slide"}, 56.90035, 24.10),   # 39 m: outside near node
            (12, {"playground": "swing"}, 56.9502, 24.1005),  # inside polygon: ok
            (13, {"playground": "seesaw"}, 56.9507, 24.10),   # 78 m outside polygon
            (14, {"playground": "swing"}, 56.8001, 24.10),    # near broken way pg
            (15, {"playground": "swing"}, 57.50, 25.00),      # orphan
            (16, {"playground": "zipline",
                  "leisure": "playground"}, 56.9002, 24.10),  # excluded
            (17, {"amenity": "bench"}, 56.9002, 24.10),       # not equipment
        ],
    )
    rows = playground_check(els, pgs).collect()
    eq_rows = {r.eq_id: r for r in rows if r.eq_id is not None}
    assert set(eq_rows) == {11, 13, 14, 15}
    assert eq_rows[11].kind == "outside_near_node" and eq_rows[11].pg_id == 1
    assert 35 < eq_rows[11].dist_m < 45
    assert eq_rows[13].kind == "outside_near_area" and eq_rows[13].pg_id == 2
    assert eq_rows[14].kind == "outside_near_area" and eq_rows[14].pg_id == 3
    assert eq_rows[15].kind == "orphan" and eq_rows[15].pg_id is None
    assert eq_rows[15].dist_m is None
    broken = [r for r in rows if r.kind == "broken_polygon"]
    assert [(r.pg_id, r.eq_id) for r in broken] == [(3, None)]


def test_playground_polygon_beats_proximity(spark):
    # equipment inside a polygon emits nothing even with a far node pg
    pgs = _playgrounds(spark, [(2, "way", 56.95, 24.10, _SQ)])
    els = _elements(spark, [(12, {"playground": "swing"}, 56.9502, 24.1005)])
    assert playground_check(els, pgs).count() == 0
