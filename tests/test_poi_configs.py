"""Thin POI-analyzer configs (plans/poi_configs.py): exact scope
filters, distance ladders, strength callbacks, and lone allowances for
the drinking-water / Glika-oak / city-meadow / picnic-site /
ticket-vending / cultural-center reference analyzers."""

from pyspark.sql import functions as F

from osmalyzer_spark.plans.poi_configs import (
    cc_looks_like,
    cc_names_match,
    city_meadows,
    cultural_centers,
    glika_oaks,
    lvm_picnic_sites,
    riga_drinking_water,
    rs_ticket_vending,
)

DEG = 1.0 / 111297.0  # ~1 m of latitude at the engine's R=6376500


def _osm(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, type string, tags map<string,string>, "
        "lat double, lon double",
    )


def _items(spark, rows, extra=""):
    return spark.createDataFrame(
        rows, "item_id long, item_lat double, item_lon double" + extra
    )


def _kinds(df):
    return {
        (r.kind, r.osm_id if r.osm_id is not None else -1,
         r.item_id if r.item_id is not None else -1)
        for r in df.collect()
    }


def test_riga_drinking_water(spark):
    osm = _osm(
        spark,
        [
            # in scope, 10 m -> matched (default 15/75 ladder)
            (1, "node", {"amenity": "drinking_water", "operator": "Rīgas ūdens",
                         "man_made": "water_tap", "drinking_water": "yes",
                         "seasonal": "yes"}, 56.0 + 10 * DEG, 24.0),
            # indoor=yes -> out of scope entirely
            (2, "node", {"amenity": "drinking_water", "indoor": "yes"},
             56.0, 24.0),
            # way -> out of scope (IsNode)
            (3, "way", {"amenity": "drinking_water"}, 56.0, 24.0),
            # no candidates; seasonal=yes -> lone
            (4, "node", {"amenity": "drinking_water", "seasonal": "yes",
                         "fixme": "resurvey"}, 57.0, 24.0),
            # no candidates, not seasonal -> unmatched
            (5, "node", {"amenity": "drinking_water", "seasonal": "maybe"},
             58.0, 24.0),
        ],
    )
    taps = _items(spark, [(1, 56.0, 24.0), (2, 59.0, 24.0)])
    corr, issues = riga_drinking_water(spark, osm, taps)
    got = _kinds(corr)
    assert ("matched", 1, 1) in got
    assert ("lone_osm", 4, -1) in got
    assert ("unmatched_osm", 5, -1) in got
    assert ("unmatched_item", -1, 2) in got
    by_rule = {(r.elem_id, r.rule, r.tag) for r in issues.collect()}
    # element 1 passes everything except the seasonal any_value? no: yes is allowed
    assert (1, "has_value", "operator") not in by_rule
    assert (4, "fixme", "fixme") in by_rule
    assert (5, "any_value", "seasonal") in by_rule  # 'maybe' not in {yes,no}
    assert (5, "has_value", "operator") in by_rule  # missing


def test_glika_oaks(spark):
    osm = _osm(
        spark,
        [
            # named Glika oak 100 m out: Strong, far 300 -> matched_far
            (1, "node", {"natural": "tree", "name": "Glika ozols Nr. 3"},
             56.0 + 100 * DEG, 24.0),
            # unnamed tree right at the item: strength UNMATCHED -> dropped
            (2, "node", {"natural": "tree"}, 56.0, 24.0),
            # named, no candidates -> lone
            (3, "node", {"natural": "tree", "name": "Vecais GLIKA OZOLS"},
             58.0, 24.0),
        ],
    )
    oaks = _items(spark, [(1, 56.0, 24.0)])
    got = _kinds(glika_oaks(spark, osm, oaks))
    assert ("matched_far", 1, 1) in got
    assert ("unmatched_osm", 2, -1) in got
    assert ("lone_osm", 3, -1) in got


def test_city_meadows(spark):
    osm = _osm(
        spark,
        [
            # exact name, 20 m -> matched (50/100)
            (1, "way", {"natural": "grassland", "name": "Lucavsalas pļava"},
             56.0 + 20 * DEG, 24.0),
            # alt_name hit at 80 m -> matched_far
            (2, "way", {"landuse": "grass", "alt_name": "Ziedu pļava"},
             57.0 + 80 * DEG, 24.0),
            # description keyword (case-insensitive) -> Good at 20 m
            (3, "way", {"landuse": "grass",
                        "description": "Rīgas PILSĒTAS PĻAVA projekts"},
             58.0 + 20 * DEG, 24.0),
            # no signal -> strength UNMATCHED, dropped
            (4, "way", {"natural": "grassland"}, 59.0, 24.0),
        ],
    )
    meadows = spark.createDataFrame(
        [
            (1, 56.0, 24.0, "Lucavsalas pļava"),
            (2, 57.0, 24.0, "Ziedu pļava"),
            (3, 58.0, 24.0, "Cita pļava"),
            (4, 59.0, 24.0, "Bez partnera"),
        ],
        "item_id long, item_lat double, item_lon double, item_name string",
    )
    got = _kinds(city_meadows(spark, osm, meadows))
    assert ("matched", 1, 1) in got
    assert ("matched_far", 2, 2) in got
    assert ("matched", 3, 3) in got
    assert ("unmatched_osm", 4, -1) in got
    assert ("unmatched_item", -1, 4) in got


def test_lvm_picnic_sites(spark):
    osm = _osm(
        spark,
        [
            (1, "node", {"tourism": "picnic_site"}, 56.0 + 50 * DEG, 24.0),
            (2, "node", {"tourism": "picnic_site"}, 57.0 + 200 * DEG, 24.0),
            (3, "node", {"tourism": "hotel"}, 56.0, 24.0),
        ],
    )
    sites = _items(spark, [(1, 56.0, 24.0), (2, 57.0, 24.0)])
    got = _kinds(lvm_picnic_sites(spark, osm, sites))
    assert ("matched", 1, 1) in got  # 50 m <= 100
    assert ("matched_far", 2, 2) in got  # 200 m <= 300 far band


def test_rs_ticket_vending(spark):
    osm = _osm(
        spark,
        [
            # address hit 300 m out -> Strong (<= 650) -> matched_far
            (1, "node", {"amenity": "vending_machine",
                         "vending": "public_transport_tickets",
                         "addr:street": "Ozolu iela",
                         "addr:housenumber": "9",
                         "operator": "Rīgas satiksme",
                         "operator:wikidata": "Q2280274"},
             56.0 + 300 * DEG, 24.0),
            # no address, 300 m -> Good -> dropped (> 150)
            (2, "node", {"amenity": "vending_machine",
                         "vending": "public_transport_tickets"},
             57.0 + 300 * DEG, 24.0),
            # wrong vending value -> out of scope
            (3, "node", {"amenity": "vending_machine", "vending": "drinks"},
             56.0, 24.0),
        ],
    )
    machines = spark.createDataFrame(
        [(1, 56.0, 24.0, "Ozolu iela 9"), (2, 57.0, 24.0, None)],
        "item_id long, item_lat double, item_lon double, address string",
    )
    corr, issues = rs_ticket_vending(spark, osm, machines)
    got = _kinds(corr)
    assert ("matched_far", 1, 1) in got
    assert ("unmatched_osm", 2, -1) in got
    assert ("unmatched_item", -1, 2) in got
    by_rule = {(r.elem_id, r.rule, r.tag) for r in issues.collect()}
    assert (2, "has_value", "operator") in by_rule
    assert (1, "has_value", "operator") not in by_rule


class TestCulturalCenters:
    def test_names_match_cascade(self, spark):
        cases = [
            # direct ordinal-ignore-case equality
            ("Allažu tautas nams", "ALLAŽU TAUTAS NAMS", True),
            # normalized: trailing "kultūras nams" stripped
            ("Cēsu kultūras nams", "Cēsu", True),
            # normalized: leading "... novada " stripped
            ("Siguldas novada Mores amatu māja", "Mores amatu māja", True),
            # containment needs both normalized forms > 5 chars
            ("Lielvārdes kultūras nams", "Lielvārdes KN ēka", True),
            # normalized 'Ogres' is exactly 5 chars -> the >5 guard fails
            ("Ogres kultūras centrs", "Ogres kultūras centrs (jaunais)", False),
            ("Ādaži", "Ādažu kultūras centrs", False),  # 5-char guard
            ("Liepājas nams", "Ventspils nams", False),
        ]
        df = spark.createDataFrame(cases, "a string, b string, want boolean")
        got = df.withColumn("got", cc_names_match(F.col("a"), F.col("b")))
        assert all(r.got is r.want for r in got.collect())

    def test_correlation_and_lone(self, spark):
        osm = _osm(
            spark,
            [
                # Strong name match 600 m out (<= 500+700) -> matched_far
                (1, "way", {"amenity": "community_centre",
                            "name": "Cēsu kultūras nams"},
                 56.0 + 600 * DEG, 24.0),
                # Regular at 600 m -> dropped (> 500); name keyword -> lone
                (2, "way", {"amenity": "community_centre",
                            "name": "Mālpils saieta nams"},
                 57.0 + 600 * DEG, 24.0),
                # Regular at 100 m -> matched
                (3, "way", {"amenity": "community_centre"},
                 58.0 + 100 * DEG, 24.0),
            ],
        )
        centers = spark.createDataFrame(
            [
                (1, 56.0, 24.0, "Cēsu", None),
                (2, 57.0, 24.0, "Liepu nams", None),
                (3, 58.0, 24.0, "Trešais", ""),
            ],
            "item_id long, item_lat double, item_lon double, "
            "item_name string, address string",
        )
        got = _kinds(cultural_centers(spark, osm, centers))
        assert ("matched_far", 1, 1) in got
        assert ("lone_osm", 2, -1) in got
        assert ("matched", 3, 3) in got
        assert ("unmatched_item", -1, 2) in got


def test_educational_institutions(spark):
    from osmalyzer_spark.plans.poi_configs import educational_institutions

    osm = _osm(
        spark,
        [
            (1, "node", {"amenity": "school", "name": "Rīgas 1. vidusskola"},
             56.0, 24.0),
            (2, "way", {"amenity": "school", "name": "Rīgas 1. vidusskola"},
             56.0, 24.0),
            (3, "node", {"amenity": "school"}, 56.0, 24.0),  # unnamed
            (4, "node", {"amenity": "kindergarten", "name": "Zvaniņš"},
             56.0, 24.0),
            (5, "node", {"amenity": "university", "name": "LU"}, 56.0, 24.0),
            (6, "node", {"amenity": "library"}, 56.0, 24.0),  # out of scope
        ],
    )
    rows = {(r.kind, r.edu_type, r.name): r.n
            for r in educational_institutions(osm).collect()}
    assert rows[("total", "school", "")] == 3
    assert rows[("name_group", "school", "Rīgas 1. vidusskola")] == 2
    assert rows[("name_group", "school", "∅")] == 1
    assert rows[("total", "kindergarten", "")] == 1
    assert rows[("name_group", "university", "LU")] == 1
    assert ("total", "college", "") not in rows
