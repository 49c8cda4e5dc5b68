"""BottleDepositPointsAnalyzer semantics (plans/deposit.py): the three
scope filters (incl. the brand??name shadowing quirk), the
75/150/+500(Strong) fuzzy-address correlation, the kiosk/vending
validation rule sets, and the case-insensitive shop stats
(reference BottleDepositPointsAnalyzer.cs, Validator.cs)."""

from pyspark.sql import Row

from osmalyzer_spark.plans.deposit import (
    KIOSK_RULES,
    VENDING_RULES,
    correlate_deposit,
    kiosk_scope,
    manual_scope,
    shop_stats,
    validate_elements,
    vending_scope,
)

DEG = 1.0 / 111297.0  # ~1 m of latitude at the engine's R=6376500


def _osm(spark, rows):
    return spark.createDataFrame(
        rows, "id long, tags map<string,string>, lat double, lon double"
    )


class TestScopes:
    def test_kiosk_brand_shadows_name(self, spark):
        osm = _osm(
            spark,
            [
                (1, {"amenity": "recycling", "brand": "Depozīta punkts"}, 0.0, 0.0),
                (2, {"amenity": "recycling", "name": "DEPOSIT point"}, 0.0, 0.0),
                # brand exists and does NOT match: name is never consulted
                (3, {"amenity": "recycling", "brand": "Cits",
                     "name": "Depozīta punkts"}, 0.0, 0.0),
                (4, {"amenity": "recycling"}, 0.0, 0.0),
                (5, {"amenity": "waste_basket", "brand": "Depozīta punkts"},
                 0.0, 0.0),
            ],
        )
        assert {r.id for r in kiosk_scope(osm).collect()} == {1, 2}

    def test_vending_and_manual_scopes(self, spark):
        osm = _osm(
            spark,
            [
                (1, {"amenity": "vending_machine", "vending": "bottle_return"},
                 0.0, 0.0),
                (2, {"amenity": "vending_machine", "vending": "drinks"},
                 0.0, 0.0),
                (3, {"shop": "yes", "recycling:cans": "yes",
                     "recycling:plastic_bottles": "yes",
                     "recycling:glass_bottles": "yes"}, 0.0, 0.0),
                (4, {"shop": "yes", "recycling:cans": "no",
                     "recycling:plastic_bottles": "yes",
                     "recycling:glass_bottles": "yes"}, 0.0, 0.0),
            ],
        )
        assert {r.id for r in vending_scope(osm).collect()} == {1}
        assert {r.id for r in manual_scope(osm).collect()} == {3}


class TestCorrelation:
    def test_ladder_and_address_strength(self, spark):
        items = spark.createDataFrame(
            [
                Row(item_id=1, item_lat=56.0, item_lon=24.0,
                    address="Ozolu iela 9"),
                Row(item_id=2, item_lat=57.0, item_lon=24.0,
                    address="Ozolu iela 5"),
                Row(item_id=3, item_lat=58.0, item_lon=24.0, address=None),
            ]
        )
        osm = _osm(
            spark,
            [
                # 50 m, wrong number -> Good, matched (<=75)
                (10, {"addr:street": "Ozolu iela", "addr:housenumber": "7"},
                 56.0 + 50 * DEG, 24.0),
                # 400 m, address hit -> Strong -> matched_far (<=650)
                (20, {"addr:street": "Ozolu iela", "addr:housenumber": "5"},
                 57.0 + 400 * DEG, 24.0),
                # 400 m, no address on item -> Good -> dropped (>150)
                (30, {"addr:street": "Ozolu iela", "addr:housenumber": "1"},
                 58.0 + 400 * DEG, 24.0),
            ],
        )
        res = correlate_deposit(spark, osm, items)
        kinds = {
            (r.kind, r.osm_id if r.osm_id is not None else -1,
             r.item_id if r.item_id is not None else -1): r
            for r in res.collect()
        }
        assert ("matched", 10, 1) in kinds
        assert kinds[("matched", 10, 1)].strength == 2
        assert ("matched_far", 20, 2) in kinds
        assert kinds[("matched_far", 20, 2)].strength == 3
        assert ("unmatched_item", -1, 3) in kinds
        assert ("unmatched_osm", 30, -1) in kinds


class TestValidationAndStats:
    def test_kiosk_rules(self, spark):
        good = {
            "name": "Depozīta punkts", "brand": "Depozīta punkts",
            "brand:wikidata": "Q110979381", "building": "kiosk",
            "recycling:cans": "yes", "recycling:glass_bottles": "yes",
            "recycling:plastic_bottles": "yes",
        }
        bad = dict(good, building="roof", recycling_type="centre",
                   fixme="check me")
        osm = _osm(spark, [(1, good, 0.0, 0.0), (2, bad, 0.0, 0.0)])
        rows = validate_elements(osm, KIOSK_RULES).collect()
        assert {(r.elem_id, r.rule, r.tag, r.found) for r in rows} == {
            (2, "has_value", "building", "roof"),
            (2, "no_tag", "recycling_type", "centre"),
            (2, "fixme", "fixme", "check me"),
        }

    def test_vending_any_value(self, spark):
        base = {
            "name": "Depozīta punkts", "brand": "Depozīta punkts",
            "brand:wikidata": "Q110979381", "recycling:cans": "yes",
            "recycling:plastic_bottles": "yes",
        }
        osm = _osm(
            spark,
            [
                (1, dict(base, **{"recycling:glass_bottles": "yes"}), 0.0, 0.0),
                (2, dict(base, **{"recycling:glass_bottles": "no"}), 0.0, 0.0),
                (3, dict(base, **{"recycling:glass_bottles": "maybe"}), 0.0, 0.0),
                (4, base, 0.0, 0.0),  # missing -> issue
            ],
        )
        rows = validate_elements(osm, VENDING_RULES).collect()
        glass = {r.elem_id for r in rows if r.tag == "recycling:glass_bottles"}
        assert glass == {3, 4}

    def test_shop_stats_case_insensitive(self, spark):
        items = spark.createDataFrame(
            [("Maxima",), ("MAXIMA",), ("Rimi",), (None,), (None,)],
            "shop_name string",
        )
        rows = {r.shop: r.n for r in shop_stats(items).collect()}
        assert rows == {"maxima": 2, "rimi": 1, "": 2}
