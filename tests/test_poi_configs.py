"""Thin POI-analyzer configs (plans/poi_configs.py): exact scope
filters, distance ladders, strength callbacks, and lone allowances for
the drinking-water / Glika-oak / city-meadow / picnic-site /
ticket-vending / cultural-center reference analyzers."""

from pyspark.sql import functions as F

from osmalyzer_spark.plans.poi_configs import (
    cc_looks_like,
    cc_names_match,
    city_meadows,
    courthouses,
    cultural_centers,
    glika_oaks,
    lvm_picnic_sites,
    notary_offices,
    riga_drinking_water,
    rs_ticket_vending,
    state_police,
    validate_tag_suffixes,
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


class TestStateServices:
    def test_notary_strength_cascade(self, spark):
        osm = _osm(
            spark,
            [
                # addr + name -> Strong at 600 m (<= 800) -> matched_far
                (1, "node", {"office": "notary",
                             "name": "Zvērināts notārs Jānis Bērziņš",
                             "addr:street": "Ozolu iela",
                             "addr:housenumber": "9"},
                 56.0 + 600 * DEG, 24.0),
                # name only -> Good at 250 m (<= 300) -> matched_far
                (2, "node", {"office": "notary", "name": "Anna Liepa"},
                 57.0 + 250 * DEG, 24.0),
                # neither -> Regular at 250 m -> survives (<= 300)? yes
                (3, "node", {"office": "notary"}, 58.0 + 250 * DEG, 24.0),
                # Strong-only band: neither -> Regular at 600 m -> dropped
                (4, "node", {"office": "notary"}, 59.0 + 600 * DEG, 24.0),
            ],
        )
        offices = spark.createDataFrame(
            [
                (1, 56.0, 24.0, "Jānis Bērziņš", "Ozolu iela 9"),
                (2, 57.0, 24.0, "Anna Liepa", "Liepu iela 2"),
                (3, 58.0, 24.0, "Cits Notārs", None),
                (4, 59.0, 24.0, "Vēl Viens", None),
            ],
            "item_id long, item_lat double, item_lon double, "
            "item_name string, address string",
        )
        rows = {r.osm_id: r for r in notary_offices(spark, osm, offices)
                .collect() if r.osm_id is not None and r.item_id is not None}
        assert rows[1].strength == 3 and rows[1].kind == "matched_far"
        assert rows[2].strength == 2
        assert rows[3].strength == 1
        assert 4 not in rows  # Regular beyond 300 never correlates

    def test_suffix_validator(self, spark):
        matched = spark.createDataFrame(
            [
                (1, 10, {"language:lv": "yes", "language:en": "no",
                         "language:de": "yes", "name": "x"},
                 ["lv", "en", "ru"]),
                (2, 11, {"name": "y"}, None),  # no expected list -> skipped
            ],
            "elem_id long, item_id long, tags map<string,string>, "
            "suffixes array<string>",
        )
        rows = {(r.kind, r.suffix): r.found
                for r in validate_tag_suffixes(
                    matched, "language", "yes").collect()}
        assert rows == {
            ("suffix_missing", "ru"): "",
            ("suffix_wrong", "en"): "no",
            ("suffix_extra", "de"): "yes",
        }

    def test_courthouse_different_type_and_keywords(self, spark):
        osm = _osm(
            spark,
            [
                # different-type name at 0 m -> UNMATCHED pair dropped;
                # not lone either
                (1, "way", {"amenity": "courthouse",
                            "name": "Ogres Bāriņtiesa"}, 56.0, 24.0),
                # shared specific keyword + address -> Strong
                (2, "way", {"amenity": "courthouse",
                            "name": "Kurzemes apgabaltiesa (ēka)",
                            "addr:street": "Ozolu iela",
                            "addr:housenumber": "9"},
                 56.0 + 20 * DEG, 24.0),
                # keyword name, no candidates -> lone
                (3, "way", {"amenity": "courthouse",
                            "name": "Zemgales rajona tiesa"}, 58.0, 24.0),
            ],
        )
        courts = spark.createDataFrame(
            [(1, 56.0, 24.0, "Kurzemes apgabaltiesa", "Ozolu iela 9")],
            "item_id long, item_lat double, item_lon double, "
            "item_name string, address string",
        )
        got = _kinds(courthouses(spark, osm, courts))
        assert ("matched", 2, 1) in got
        assert ("unmatched_osm", 1, -1) in got
        assert ("lone_osm", 3, -1) in got

    def test_state_police_lone(self, spark):
        osm = _osm(
            spark,
            [
                (1, "node", {"amenity": "police", "name": "VP iecirknis"},
                 58.0, 24.0),
                (2, "node", {"amenity": "police",
                             "operator": "Rīgas pašvaldības policija"},
                 58.5, 24.0),
            ],
        )
        offices = _items(spark, [(1, 56.0, 24.0)])
        got = _kinds(state_police(spark, osm, offices))
        assert ("lone_osm", 1, -1) in got
        assert ("unmatched_osm", 2, -1) in got
        assert ("unmatched_item", -1, 1) in got
