"""Parcel-locker analyzer family (plans/lockers.py): brand-substring
membership cascade, the 100/200/+500(Strong) correlation ladder, and
the unknown-locker report."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osmalyzer_spark.plans.lockers import (
    brand_member_expr,
    correlate_lockers,
    unknown_lockers,
)

BRANDING = {"Omniva": ["omniva"], "DPD": ["dpd"]}


def _lockers(spark, rows):
    schema = (
        "elem_id long, elem_lat double, elem_lon double, name_tag string, "
        "operator_tag string, brand_tag string, street_tag string, "
        "housenum_tag string"
    )
    return spark.createDataFrame(rows, schema)


class TestBrandMembership:
    def test_cascade_over_three_tags_case_insensitive(self, spark):
        df = _lockers(
            spark,
            [
                (1, 0.0, 0.0, "OMNIVA paku skapis", None, None, None, None),
                (2, 0.0, 0.0, None, "Omniva", None, None, None),
                (3, 0.0, 0.0, None, None, "omniva", None, None),
                (4, 0.0, 0.0, "DPD Pickup", None, None, None, None),
                (5, 0.0, 0.0, None, None, None, None, None),
                (6, 0.0, 0.0, "Itella", "SmartPost", "x", None, None),
            ],
        )
        got = {
            r.elem_id
            for r in df.filter(
                brand_member_expr(BRANDING["Omniva"])
            ).collect()
        }
        assert got == {1, 2, 3}

    def test_unknown_and_stats(self, spark):
        df = _lockers(
            spark,
            [
                (1, 0.0, 0.0, "Omniva", None, "Omniva", None, None),
                (2, 0.0, 0.0, "Omniva", "Latvijas Pasts", None, None, None),
                (3, 0.0, 0.0, "Paku skapis", None, None, None, None),
            ],
        )
        rows = unknown_lockers(df, BRANDING).collect()
        unknown = {r.elem_id for r in rows if r.kind == "unknown"}
        stats = {r.value: r.n for r in rows if r.kind == "stat"}
        assert unknown == {3}
        # elem 1's duplicate 'Omniva' across name+brand counts ONCE
        assert stats == {"Omniva": 2, "Latvijas Pasts": 1}


class TestLockerCorrelation:
    def test_distance_ladder(self, spark):
        # item at origin; lockers at ~50 m (good), ~400 m strong-address,
        # ~400 m good (dropped), ~150 m far band
        deg = 1.0 / 111297.0  # ~1 m of latitude at R=6376500
        items = spark.createDataFrame(
            [
                Row(item_id=1, item_lat=56.0, item_lon=24.0, op="Omniva",
                    address="Ozolu iela 9"),
                Row(item_id=2, item_lat=57.0, item_lon=24.0, op="Omniva",
                    address="Ozolu iela 5"),
                Row(item_id=3, item_lat=58.0, item_lon=24.0, op="Omniva",
                    address=None),
            ]
        )
        lockers = _lockers(
            spark,
            [
                # item 1: closest allowed wins, 50 m
                (10, 56.0 + 50 * deg, 24.0, "Omniva", None, None,
                 "Ozolu iela", "9"),
                # item 2: only a 400 m candidate, Strong address -> allowed
                (20, 57.0 + 400 * deg, 24.0, "Omniva", None, None,
                 "Ozolu iela", "5"),
                # item 3: 400 m candidate, Good (no item address) -> dropped
                (30, 58.0 + 400 * deg, 24.0, "Omniva", None, None,
                 "Ozolu iela", "1"),
                # far band for item 1? no - loses to 10; stays unmatched osm
                (11, 56.0 + 150 * deg, 24.0, "omniva skapis", None, None,
                 None, None),
            ],
        )
        res = correlate_lockers(spark, lockers, items, {"Omniva": ["omniva"]})
        kinds = {
            (r.kind, r.osm_id if r.osm_id is not None else -1,
             r.item_id if r.item_id is not None else -1)
            for r in res.collect()
        }
        assert ("matched", 10, 1) in kinds
        assert ("matched_far", 20, 2) in kinds  # 400 m > match 100 -> far
        assert ("unmatched_item", -1, 3) in kinds
        assert ("unmatched_osm", 30, -1) in kinds
        assert ("unmatched_osm", 11, -1) in kinds

    def test_strength_values(self, spark):
        deg = 1.0 / 111297.0
        items = spark.createDataFrame(
            [Row(item_id=1, item_lat=56.0, item_lon=24.0, op="DPD",
                 address="Ozolu iela 9")]
        )
        lockers = _lockers(
            spark,
            [(10, 56.0 + 50 * deg, 24.0, "DPD", None, None,
              "Ozolu iela", "9")],
        )
        res = correlate_lockers(spark, lockers, items, {"DPD": ["dpd"]})
        m = [r for r in res.collect() if r.kind == "matched"]
        assert len(m) == 1 and m[0].strength == 3  # fuzzy address -> Strong


class TestMultiBrandInstancing:
    def test_locker_matching_two_operators_correlates_in_both(self, spark):
        # one machine carries both brands: it must be instanced into BOTH
        # operators' rotated bands and can match an item in each
        items = spark.createDataFrame(
            [
                (1, 56.0, 24.0, "Omniva", None),
                (2, 56.0, 24.0, "DPD", None),
            ],
            "item_id long, item_lat double, item_lon double, op string, "
            "address string",
        )
        lockers = _lockers(
            spark, [(10, 56.0, 24.0, "Omniva / DPD paku skapis", None, None,
                     None, None)]
        )
        res = correlate_lockers(
            spark, lockers, items, {"Omniva": ["omniva"], "DPD": ["dpd"]}
        )
        matched = {(r.op, r.osm_id, r.item_id)
                   for r in res.collect() if r.kind == "matched"}
        assert matched == {("Omniva", 10, 1), ("DPD", 10, 2)}
