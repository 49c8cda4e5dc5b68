import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.operators.rings import assemble_rings
from osmalyzer_spark.sources.gtfs import (
    read_gtfs_stops,
    route_variants,
    score_route_matches,
    stop_gap_pairs,
)


@pytest.fixture(scope="module")
def gtfs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs")
    (d / "stops.txt").write_text(
        'stop_id,stop_name,stop_lat,stop_lon\n'
        's1,"Centrs",56.95,24.10\n'
        's2,"Majoru stacija (Majori)",56.97,23.79\n'
        's2,"Majoru DUPLICATE",56.97,23.79\n'  # TryAdd: first wins
        's3,"Ozoli",56.90,24.20\n'
        's4,broken,,\n'  # dropped: no coords
    )
    (d / "stop_times.txt").write_text(
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence\n"
        "t1,08:00:00,08:00:10,s1,1\n"
        "t1,08:05:00,08:05:10,s2,2\n"
        "t1,08:10:00,08:10:10,s3,3\n"
        "t2,09:00:00,09:00:10,s1,1\n"
        "t2,09:05:00,09:05:10,s2,2\n"
        "t2,09:10:00,09:10:10,s3,3\n"
        "t3,10:00:00,10:00:10,s3,1\n"
        "t3,10:05:00,10:05:10,s1,2\n"
        "t4,11:00:00,11:00:10,s1,1\n"  # degenerate 1-stop trip
    )
    return str(d)


def test_gtfs_stops_dedup_and_drop(spark, gtfs_dir):
    stops = read_gtfs_stops(spark, f"{gtfs_dir}/stops.txt")
    rows = {r["stop_id"]: r["name"] for r in stops.collect()}
    assert rows == {"s1": "Centrs", "s2": "Majoru stacija (Majori)", "s3": "Ozoli"}


def test_route_variants(spark, gtfs_dir):
    from osmalyzer_spark.sources.gtfs import read_gtfs_stop_times

    st = read_gtfs_stop_times(spark, f"{gtfs_dir}/stop_times.txt")
    var = route_variants(st).collect()
    by_stops = {tuple(r["stops"]): r["n_trips"] for r in var}
    assert by_stops == {("s1", "s2", "s3"): 2, ("s3", "s1"): 1}  # t4 dropped


def test_stop_gap_pairs(spark):
    # route: seq1 matched, seq2 unmatched OSM stop whose GTFS twin (the
    # successor of seq1's match) is ~30 m away -> paired
    rows = [
        ("r1", 1, 100, 56.9500, 24.1000, "g1", 56.9500, 24.1000, True),
        ("r1", 2, 101, 56.9510, 24.1010, "g2", 56.95103, 24.1010, False),
        ("r1", 3, 102, 56.9600, 24.2000, "g3", 56.99, 24.5, False),  # too far
    ]
    df = spark.createDataFrame(
        rows,
        "route_id string, seq int, osm_stop_id long, osm_lat double, osm_lon double, "
        "gtfs_stop_id string, gtfs_lat double, gtfs_lon double, matched boolean",
    )
    got = stop_gap_pairs(df, max_gap_m=70.0).collect()
    assert len(got) == 1
    assert got[0]["osm_stop_id"] == 101 and got[0]["paired_gtfs_stop_id"] == "g2"


def test_score_route_matches(spark):
    stops_a = [{"name": "A", "lat": 56.95, "lon": 24.10}, {"name": "B", "lat": 56.96, "lon": 24.11}, {"name": "C", "lat": 56.97, "lon": 24.12}]
    stops_b = [{"name": "X", "lat": 56.95, "lon": 24.10}, {"name": "Y", "lat": 56.96, "lon": 24.11}]
    variants = spark.createDataFrame(
        [("v1", 56.96, 24.11, stops_a), ("v2", 56.955, 24.105, stops_b)],
        "variant_id string, centroid_lat double, centroid_lon double, "
        "stops array<struct<name string, lat double, lon double>>",
    )
    osm_routes = spark.createDataFrame(
        [(900, 56.96, 24.11, stops_a)],
        "route_rel_id long, centroid_lat2 double, centroid_lon2 double, "
        "stops2 array<struct<name string, lat double, lon double>>",
    )
    got = score_route_matches(spark, variants, osm_routes).collect()
    assert len(got) == 1
    assert got[0]["variant_id"] == "v1" and got[0]["route_rel_id"] == 900
    assert got[0]["score"] == pytest.approx(1.0, abs=1e-6)


def _way(rel, wid, node_ids, coords):
    return (rel, wid, [{"node_id": n, "lat": c[0], "lon": c[1]} for n, c in zip(node_ids, coords)])


WAY_SCHEMA = (
    "relation_id long, way_id long, "
    "nodes array<struct<node_id long, lat double, lon double>>"
)


def test_ring_assembly_simple_square(spark):
    # 4 ways forming a square 1-2-3-4; way 3 deliberately reversed
    c = {1: (0.0, 0.0), 2: (0.0, 1.0), 3: (1.0, 1.0), 4: (1.0, 0.0)}
    ways = [
        _way(7, 10, [1, 2], [c[1], c[2]]),
        _way(7, 11, [2, 3], [c[2], c[3]]),
        _way(7, 12, [4, 3], [c[4], c[3]]),  # reversed orientation
        _way(7, 13, [4, 1], [c[4], c[1]]),
    ]
    df = spark.createDataFrame(ways, WAY_SCHEMA)
    rings = assemble_rings(df).collect()
    assert len(rings) == 1
    r = rings[0]
    assert r["valid"] is True
    assert len(r["ring_node_ids"]) == 4  # each junction once
    assert set(r["ring_node_ids"]) == {1, 2, 3, 4}
    # consecutive nodes must share a way (chain integrity)
    seq = r["ring_node_ids"]
    edges = {frozenset(e) for e in [(1, 2), (2, 3), (3, 4), (4, 1)]}
    for i in range(4):
        assert frozenset((seq[i], seq[(i + 1) % 4])) in edges


def test_ring_assembly_two_rings(spark):
    ways = [
        _way(8, 20, [1, 2], [(0.0, 0.0), (0.0, 1.0)]),
        _way(8, 21, [2, 1], [(0.0, 1.0), (0.0, 0.0)]),
        _way(8, 22, [5, 6], [(5.0, 5.0), (5.0, 6.0)]),
        _way(8, 23, [6, 5], [(5.0, 6.0), (5.0, 5.0)]),
    ]
    df = spark.createDataFrame(ways, WAY_SCHEMA)
    rings = assemble_rings(df).collect()
    assert len(rings) == 2
    assert all(r["valid"] for r in rings)


def test_ring_assembly_invalid_geo(spark):
    # node 2 is a terminal of THREE ways -> invalid (reference returns null)
    ways = [
        _way(9, 30, [1, 2], [(0.0, 0.0), (0.0, 1.0)]),
        _way(9, 31, [2, 3], [(0.0, 1.0), (1.0, 1.0)]),
        _way(9, 32, [2, 4], [(0.0, 1.0), (1.0, 0.0)]),
    ]
    df = spark.createDataFrame(ways, WAY_SCHEMA)
    rings = assemble_rings(df).collect()
    assert any(r["valid"] is False for r in rings)


def test_analyzers_on_synthetic_views(spark):
    from osmalyzer_spark.datagen import generate_images, osm_elements_view, data_items_view
    from osmalyzer_spark.plans.analyzers import shop_analyzer, street_name_groups, spawner_pass

    images = generate_images(spark, 1500, seed=42).cache()
    elements = osm_elements_view(images)
    items = data_items_view(images)
    res = shop_analyzer(spark, elements, items, ["Rimi", "Maxima", "LaTS", "top!", "Elvi", "Mego", "Aibe", "Citro"])
    kinds = dict((r["kind"], r["n"]) for r in res.summary.collect())
    assert kinds.get("matched", 0) > 0
    # strong address matches exist (same caption on both sides)
    assert res.matched.filter(F.col("strength") == 3).count() > 0
    groups = street_name_groups(elements)
    assert groups.count() == 8  # STREETS list size
    sugg = spawner_pass(
        res.unmatched_items.join(items, "item_id"),
        {"shop": "supermarket"},
    )
    assert sugg.columns == ["action", "item_id", "lat", "lon", "suggested_tags"]


def test_validator_pass(spark):
    from osmalyzer_spark.plans.analyzers import validator_pass

    matched = spark.createDataFrame(
        [
            (1, "a", {"shop": "supermarket", "name": "Rimi"}),
            (2, "b", {"shop": "convenience", "name": "Rimi"}),
            (3, "c", {"name": "Rimi"}),  # missing shop tag entirely
        ],
        "elem_id long, item_id string, tags map<string,string>",
    )
    issues = validator_pass(matched, {"shop": "supermarket"}).collect()
    got = {(r["elem_id"], r["rule"], r["found"]) for r in issues}
    assert (2, "tag:shop", "convenience") in got
    assert (3, "tag:shop", None) in got
    assert all(r["elem_id"] != 1 for r in issues)


def test_bank_location_analyzer(spark):
    """BankLocationAnalyzer flow: first-non-null operator/brand/name must
    contain the bank (an element whose operator is another bank is out
    even if its name mentions ours); ATMs and branches correlate
    separately; address match upgrades to Strong."""
    from osmalyzer_spark.plans.analyzers import bank_location_analyzer

    elements = spark.createDataFrame(
        [
            (1, 56.9500, 24.1000, {"amenity": "atm", "operator": "Bankia"}),
            # operator is FIRST non-null and doesn't contain -> excluded,
            # even though name would match (??-coalesce semantics)
            (2, 56.9501, 24.1001, {"amenity": "atm", "operator": "Other",
                                   "name": "Bankia ATM"}),
            (3, 56.9600, 24.1100, {"amenity": "bank", "brand": "bankia",
                                   "addr:street": "Ozolu iela",
                                   "addr:housenumber": "4"}),
            (4, 56.9700, 24.1200, {"amenity": "cafe", "name": "Bankia cafe"}),
        ],
        "elem_id long, elem_lat double, elem_lon double, tags map<string,string>",
    )
    atms = spark.createDataFrame(
        [("a1", 56.9500, 24.1000, None)],
        "item_id string, item_lat double, item_lon double, item_address string",
    )
    branches = spark.createDataFrame(
        [("b1", 56.9600, 24.1100, "Ozolu iela 4, Rīga")],
        "item_id string, item_lat double, item_lon double, item_address string",
    )
    atm_res, br_res = bank_location_analyzer(spark, elements, atms, branches, "Bankia")
    atm_matched = {(r["item_id"], r["elem_id"]) for r in atm_res.matched.collect()}
    assert atm_matched == {("a1", 1)}  # elem 2 excluded by coalesce rule
    br = br_res.matched.collect()
    assert [(r["item_id"], r["elem_id"]) for r in br] == [("b1", 3)]
    assert br[0]["strength"] == 3  # address match -> Strong


def test_clean_stop_name_reference_examples(spark):
    """The CleanName cases cited in PublicTransportAnalyzer.cs:791-824."""
    from osmalyzer_spark.sources.gtfs import clean_stop_name

    # canonical form pads BOTH sides of ./- (the lookaround original
    # converges to the same form from either spelling: "18.Novembra" and
    # "18. novembra" both clean to "18 . novembra")
    cases = [
        ("18.Novembra iela", "18 . novembra iela"),   # Rezekne case + dot pad
        ("DS  Salūts", "ds salūts"),                # double space
        ("Majoru stacija (Majori)", "majoru stacija"),      # OSM parens
        ("Promenādes iela [Rīgas iela]", "promenādes iela"),  # GTFS brackets
        ('Arēna "Rīga"', "arēna rīga"),             # quotes
        ("TEC-2 pārvalde", "tec - 2 pārvalde"),     # dash pad
        ("P.Lejiņa iela", "p . lejiņa iela"),
        ("Upesgrīvas iela/ Spice", "upesgrīvas iela / spice"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "raw string")
    got = [r["c"] for r in df.select(clean_stop_name(F.col("raw")).alias("c")).collect()]
    assert got == [w for _, w in cases]


def test_mail_box_analyzer(spark):
    """LatviaPostMailBoxAnalyzer semantics: address agreement upgrades a
    match to Strong (and extends reach to 500 m via strong_extra);
    proximity alone is Good; a listed box with nothing within seek is
    unmatched; non-post_box elements are out of the pool."""
    from osmalyzer_spark.plans.analyzers import mail_box_analyzer

    elements = spark.createDataFrame(
        [
            (1, 56.9500, 24.1000,
             {"amenity": "post_box", "addr:street": "Brīvības iela",
              "addr:housenumber": "21"}),
            # 2: within 200 m of item B, no address tags -> Good match
            (2, 56.9530, 24.1000, {"amenity": "post_box"}),
            # 3: a bench, not a post box -> never a candidate
            (3, 56.9531, 24.1001, {"amenity": "bench"}),
            # 4: ~400 m from item C whose address matches -> Strong-only reach
            (4, 56.9570, 24.2000,
             {"amenity": "post_box", "addr:street": "Tērbatas iela",
              "addr:housenumber": "5"}),
        ],
        "elem_id long, elem_lat double, elem_lon double, tags map<string,string>",
    )
    items = spark.createDataFrame(
        [
            ("A", 56.9501, 24.1001, "Brīvības iela 21, Rīga"),   # addr match -> Strong
            ("B", 56.9529, 24.1001, None),                        # proximity -> Good
            ("C", 56.9606, 24.2000, "Tērbatas iela 5"),           # ~400 m, Strong extra
            ("D", 56.4000, 22.0000, None),                        # nothing near
        ],
        "item_id string, item_lat double, item_lon double, item_address string",
    )
    res = mail_box_analyzer(spark, elements, items)
    matched = {r["item_id"]: (r["elem_id"], r["strength"], r["far"])
               for r in res.matched.collect()}
    assert matched["A"][0] == 1 and matched["A"][1] == 3  # Strong
    assert matched["A"][2] is False                        # within 100 m
    assert matched["B"][0] == 2 and matched["B"][1] == 2  # Good
    assert matched["C"][0] == 4 and matched["C"][1] == 3  # Strong at ~400 m
    assert matched["C"][2] is True                         # beyond match_distance
    assert [r["item_id"] for r in res.unmatched_items.collect()] == ["D"]
    # the bench (elem 3) is not even an unmatched_osm candidate
    assert 3 not in {r["elem_id"] for r in res.unmatched_elements.collect()}
