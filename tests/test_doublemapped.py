"""DoubleMappedFeaturesAnalyzer semantics: feature-class taxonomy (incl.
the fitness-station node exception), the 0.3 km2 area cap, the
isolated_dwelling skip, cheap-distance prefilter, and containment."""

from pyspark.sql import functions as F

from osmalyzer_spark.plans.doublemapped import (
    area_feature_exprs,
    area_size_km2,
    double_mapped_check,
)

# ~27 m x 61 m box around (56.95, 24.10). NOTE the reference's
# GetAreaSize sums lon deltas in DEGREES, inflating true area by
# 180/pi (~57x) — its 0.3 "km2" cap therefore really admits only
# playground-sized areas, and this fixture must honor the formula's
# units, not true km2 (this box reads ~0.093 in formula units).
_SQ = [
    (56.94988, 24.0995),
    (56.94988, 24.1005),
    (56.95012, 24.1005),
    (56.95012, 24.0995),
    (56.94988, 24.0995),  # closing vertex, OSM way convention
]
# 0.07 x 0.1 deg: hundreds of km2 -> over the 0.3 km2 cap
_BIG = [
    (56.90, 24.05),
    (56.90, 24.15),
    (56.97, 24.15),
    (56.97, 24.05),
    (56.90, 24.05),
]


def _ways(spark, rows):
    return spark.createDataFrame(
        list(rows),
        "id long, tags map<string,string>, "
        "ring array<struct<lat double, lon double>>",
    )


def _nodes(spark, rows):
    return spark.createDataFrame(
        list(rows), "id long, tags map<string,string>, lat double, lon double"
    )


def test_area_size_formula(spark):
    df = _ways(spark, [(1, {"leisure": "park"}, _SQ)])
    km2 = df.select(area_size_km2("ring").alias("a")).collect()[0]["a"]
    # true area ~0.00165 km2; the reference formula's degree-lon quirk
    # inflates it by 180/pi to ~0.093 — reproduced as-is, because the
    # 0.3 cap in the reference compares against THIS value
    assert 0.05 < km2 < 0.15


def test_feature_class_priorities_and_fitness_exception(spark):
    rows = [
        (1, {"amenity": "parking", "leisure": "park"}),  # amenity wins
        (2, {"amenity": "bench", "leisure": "park"}),  # amenity not in list
        (3, {"leisure": "fitness_station"}),  # station: classifies
        (4, {"leisure": "fitness_station", "fitness_station": "bar"}),  # equipment
        (5, {"place": "village"}),
        (6, {"shop": "bakery"}),  # no class
    ]
    df = spark.createDataFrame(rows, "id long, tags map<string,string>")
    k, v = area_feature_exprs("tags", F.lit(True))
    got = {r.id: (r.k, r.v) for r in df.select("id", k.alias("k"), v.alias("v")).collect()}
    assert got[1] == ("amenity", "parking")
    assert got[2] == ("leisure", "park")
    assert got[3] == ("leisure", "fitness_station")
    assert got[4] == (None, None)  # node with fitness_station key
    assert got[5] == ("place", "village")
    assert got[6] == (None, None)
    # same tags on a NON-node: the equipment exception does not apply
    kw, vw = area_feature_exprs("tags", F.lit(False))
    goww = {r.id: r.k for r in df.select("id", kw.alias("k")).collect()}
    assert goww[4] == "leisure"


def test_double_mapped_check(spark):
    ways = _ways(
        spark,
        [
            (1, {"leisure": "park"}, _SQ),
            (2, {"leisure": "park"}, _BIG),  # over the cap: dropped
            (3, {"place": "isolated_dwelling"}, _SQ),  # skipped
            (4, {"amenity": "parking"}, _SQ),
        ],
    )
    nodes = _nodes(
        spark,
        [
            (10, {"leisure": "park"}, 56.95, 24.1),  # inside 1 & 4's ring
            (11, {"amenity": "parking"}, 56.95005, 24.0998),  # inside, matches 4
            (12, {"leisure": "park"}, 56.9502, 24.102),  # outside the ring
            (13, {"place": "isolated_dwelling"}, 56.95, 24.1),  # only way 3
            (14, {"leisure": "pitch"}, 56.95, 24.1),  # class mismatch
        ],
    )
    rows = double_mapped_check(ways, nodes).collect()
    got = {r.area_id: r for r in rows}
    assert set(got) == {1, 4}
    assert got[1].n_nodes == 1 and got[1].node_ids == "10"
    assert got[4].n_nodes == 1 and got[4].node_ids == "11"
    assert got[1].feature_key == "leisure" and got[1].feature_value == "park"
    assert got[1].area_km2 == got[4].area_km2  # same ring
