"""CulturalMonumentsAnalyzer semantics (plans/monuments.py): the
DoesOsmNodeMatchMonument strength cascade with the dead-code heritage
quirk, the IsOsmElementHeritagePoiByItself lone allowance, the
30/300/+1200(Strong) ladder, and the ref:LV:vkpai value validator
(reference Analyzers/POIs/CulturalMonumentsAnalyzer.cs:119-255)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from osmalyzer_spark.operators.correlator import GOOD, REGULAR, STRONG
from osmalyzer_spark.plans.monuments import (
    correlate_monuments,
    monument_ref_issues,
    monument_strength_expr,
)

DEG = 1.0 / 111297.0  # ~1 m of latitude at the engine's R=6376500

_ELEM_SCHEMA = (
    "elem_id long, elem_lat double, elem_lon double, name_tag string, "
    "old_name_tag string, vkpai_tag string, heritage_tag string, "
    "oper_tag string, wikidata_tag string"
)
_ITEM_SCHEMA = (
    "item_id long, item_lat double, item_lon double, item_name string, "
    "ref_id long, item_wd string"
)


def _elems(spark, rows):
    return spark.createDataFrame(rows, _ELEM_SCHEMA)


def _items(spark, rows):
    return spark.createDataFrame(rows, _ITEM_SCHEMA)


def _strengths(spark, tag_rows, item=("Rīgas pils", 1001, "900001")):
    """Evaluate the cascade on a synthetic pair frame: one row per
    tag_rows entry, all paired with the same item."""
    name, ref, wd = item
    pairs = spark.createDataFrame(
        [
            Row(
                pid=i,
                name_tag=r.get("name"),
                old_name_tag=r.get("old_name"),
                vkpai_tag=r.get("vkpai"),
                heritage_tag=r.get("heritage"),
                oper_tag=r.get("oper"),
                wikidata_tag=r.get("wikidata"),
                item_name=name,
                ref_id=ref,
                item_wd=wd,
            )
            for i, r in enumerate(tag_rows)
        ],
        "pid int, name_tag string, old_name_tag string, vkpai_tag string, "
        "heritage_tag string, oper_tag string, wikidata_tag string, "
        "item_name string, ref_id long, item_wd string",
    )
    out = pairs.withColumn("s", monument_strength_expr(pairs))
    return [r.s for r in out.orderBy("pid").collect()]


class TestStrengthCascade:
    def test_fuzzy_name_and_old_name_are_strong(self, spark):
        s = _strengths(
            spark,
            [
                {"name": "Rīgas pils"},  # exact
                {"name": "  rīgas PILS  "},  # lower/trim
                {"name": "Pils"},  # element name contained in item name
                {"old_name": "Vecā Rīgas pils un muzejs"},  # contains item
                {"name": "Cits nams"},  # no containment, no other tags
            ],
        )
        assert s == [STRONG, STRONG, STRONG, STRONG, 0]

    def test_ref_cascade_and_order(self, spark):
        s = _strengths(
            spark,
            [
                {"vkpai": "1001"},  # int-parses, equals -> Strong
                {"vkpai": "1002"},  # int, unknown -> Good
                {"vkpai": "x9"},  # non-int -> Good
                # name wins BEFORE the (wrong) ref is consulted
                {"name": "Rīgas pils", "vkpai": "9999"},
            ],
        )
        assert s == [STRONG, GOOD, GOOD, STRONG]

    def test_heritage_dead_code_quirk(self, spark):
        # the reference re-parses the (null) ref string instead of the
        # heritage value, so heritage NEVER yields Good — even '2'
        s = _strengths(
            spark,
            [
                {"heritage": "2"},
                {"heritage": "1"},
                # heritage precedes operator: Regular even with a VKPAI oper
                {"heritage": "2", "oper": "VKPAI"},
            ],
        )
        assert s == [REGULAR, REGULAR, REGULAR]

    def test_operator_and_wikidata(self, spark):
        s = _strengths(
            spark,
            [
                {"oper": "VKPAI Rīgas nodaļa"},
                {"oper": "Valsts kultūras pieminekļu aizsardzības inspekcija"},
                {"oper": "Pašvaldība"},
                {"wikidata": "900001"},  # long-parses, equals item_wd
                {"wikidata": "900002"},  # differs -> unmatched
                {"wikidata": "Q900001"},  # not a long -> unmatched
                {"wikidata": "9"},  # length 1 -> guard fails
                # operator precedes wikidata: Regular despite matching wd
                {"oper": "Pašvaldība", "wikidata": "900001"},
            ],
        )
        assert s == [GOOD, GOOD, REGULAR, STRONG, 0, 0, 0, REGULAR]

    def test_wikidata_needs_item_wd(self, spark):
        s = _strengths(
            spark, [{"wikidata": "900001"}], item=("Rīgas pils", 1001, None)
        )
        assert s == [0]


class TestCorrelationLadder:
    def test_distance_bands_and_lone_split(self, spark):
        items = _items(
            spark,
            [
                (1, 56.0, 24.0, "Rīgas pils", 1001, "900001"),
                (2, 57.0, 24.0, "Cēsu pils", 1002, None),
                (3, 58.0, 24.0, "Turaidas pils", 1003, None),
            ],
        )
        elems = _elems(
            spark,
            [
                # item 1: 20 m Strong name -> matched (not far)
                (10, 56.0 + 20 * DEG, 24.0, "Rīgas pils", None, None, None,
                 None, None),
                # item 1 loses this farther one -> lone (known wikidata)
                (11, 56.0 + 200 * DEG, 24.0, None, None, None, None, None,
                 "900001"),
                # item 2: 500 m Good ref -> beyond 300 allowance, dropped;
                # carries ref:LV:vkpai -> lone
                (20, 57.0 + 500 * DEG, 24.0, None, None, "9999", None, None,
                 None),
                # item 2: 500 m Strong name -> within 1500 -> matched_far
                (21, 57.0 + 500 * DEG, 24.001, "Cēsu pils", None, None, None,
                 None, None),
                # no candidates, no allowance -> unmatched_osm
                (30, 55.0, 20.0, None, None, None, "2", None, None),
                # no candidates, VKPAI operator -> lone
                (31, 55.0, 21.0, None, None, None, None, "vkpai", None),
            ],
        )
        corr, bad = correlate_monuments(spark, elems, items)
        kinds = {
            (r.kind, r.osm_id if r.osm_id is not None else -1,
             r.item_id if r.item_id is not None else -1)
            for r in corr.collect()
        }
        assert ("matched", 10, 1) in kinds
        assert ("matched_far", 21, 2) in kinds
        assert ("unmatched_item", -1, 3) in kinds
        assert ("lone_osm", 11, -1) in kinds
        assert ("lone_osm", 20, -1) in kinds
        assert ("lone_osm", 31, -1) in kinds
        assert ("unmatched_osm", 30, -1) in kinds
        assert len(kinds) == 7
        m = {r.osm_id: r for r in corr.collect() if r.osm_id == 10}
        assert m[10].strength == STRONG and m[10].far is False

    def test_ref_validator(self, spark):
        items = _items(
            spark, [(1, 56.0, 24.0, "Rīgas pils", 1001, None)]
        )
        elems = _elems(
            spark,
            [
                (10, 56.0, 24.0, None, None, "1001", None, None, None),
                (11, 56.0, 24.0, None, None, "1002", None, None, None),
                (12, 56.0, 24.0, None, None, "01001", None, None, None),
                (13, 56.0, 24.0, None, None, None, None, None, None),
            ],
        )
        bad = monument_ref_issues(elems, items).collect()
        # string equality against ReferenceID.ToString(): '01001' is bad
        assert {(r.elem_id, r.value) for r in bad} == {
            (11, "1002"), (12, "01001"),
        }
