"""LVCRoadAnalyzer semantics (plans/lvc.py): ref validity/exclusion
regexes, all-token split checks, law membership both ways, shared
segments, relation presence by raw ref, and the unrecognized/excluded
tail (reference Analyzers/Roads/LVCRoadAnalyzer.cs)."""

from pyspark.sql import functions as F

from osmalyzer_spark.plans.lvc import (
    is_excluded_lvc_ref,
    is_valid_lvc_ref,
    lvc_road_report,
)


def _ways(spark, rows):
    return spark.createDataFrame(
        rows, "id long, tags map<string,string>, lat double, lon double"
    )


def _report(spark, ways, rels=None, law=None, shared=None):
    rels_df = _ways(spark, rels or [])
    law_df = spark.createDataFrame([(c,) for c in (law or [])], "code string")
    shared_df = spark.createDataFrame(
        list(shared or []), "code string, shared string"
    )
    return lvc_road_report(ways, rels_df, law_df, shared_df)


def _kinds(rows):
    return {(r.kind, r.a, r.b, r.n) for r in rows}


class TestRefPredicates:
    def test_valid_ref_shapes_and_ceilings(self, spark):
        cases = [
            ("A5", True), ("A30", True), ("A31", False),
            ("P300", True), ("P301", False),
            ("V3000", True), ("V3001", False),
            ("P05", False),  # leading zero
            ("B5", False), ("A", False), ("A12345", False), ("a5", False),
        ]
        df = spark.createDataFrame([(t,) for t, _ in cases], "tok string")
        got = {
            r.tok: r.ok
            for r in df.withColumn("ok", is_valid_lvc_ref("tok")).collect()
        }
        for tok, want in cases:
            assert got[tok] is want, tok

    def test_excluded_ref_patterns(self, spark):
        cases = [
            ("C9", True), ("C-9", True), ("C-122", True), ("C0", False),
            ("B3.-01", True), ("A3.-03", True), ("C3.-01", False),
            ("6278B003", True), ("6296C008", True), ("6178B003", False),
            ("C1-29", True), ("A1-30", True), ("X1", False),
        ]
        df = spark.createDataFrame([(t,) for t, _ in cases], "tok string")
        got = {
            r.tok: r.ok
            for r in df.withColumn("ok", is_excluded_lvc_ref("tok")).collect()
        }
        for tok, want in cases:
            assert got[tok] is want, tok


class TestReport:
    def test_full_report_kinds(self, spark):
        ways = _ways(
            spark,
            [
                (1, {"highway": "primary", "ref": "A5"}, 56.5, 24.5),
                # split group membership: belongs to V12 AND P5 groups
                (2, {"highway": "primary", "ref": "V12;P5"}, 56.5, 24.5),
                (3, {"highway": "primary", "ref": "V12;P5",
                     "junction": "roundabout"}, 56.5, 24.5),
                (4, {"highway": "primary", "ref": "A31"}, 56.5, 24.5),
                (5, {"highway": "primary", "ref": "C-9"}, 56.5, 24.5),
                (6, {"highway": "primary", "ref": "X1"}, 56.5, 24.5),
                # mixed valid+invalid: neither recognized nor unrecognized
                (7, {"highway": "primary", "ref": "A5;X1"}, 56.5, 24.5),
                # aeroway / missing-highway scope exclusions
                (8, {"highway": "x", "ref": "A7", "aeroway": "t"}, 56.5, 24.5),
                (9, {"ref": "A8"}, 56.5, 24.5),
                # roundabout-only pair group
                (10, {"highway": "primary", "ref": "A9;A10",
                      "junction": "roundabout"}, 56.5, 24.5),
            ],
        )
        rels = [
            (100, {"type": "route", "route": "road", "ref": "A5"}, 56.5, 24.5),
            (101, {"type": "route", "route": "road", "ref": "A5"}, 56.5, 24.5),
            (102, {"type": "route", "route": "road", "ref": "P9"}, 56.5, 24.5),
            # wrong route type -> out of scope
            (103, {"type": "route", "route": "bicycle", "ref": "V12"},
             56.5, 24.5),
        ]
        got = _kinds(
            _report(
                spark, ways, rels,
                law=["A5", "P5", "P7"],
                shared=[("V12", "P5"), ("A5", "P7"), ("P99", "P98")],
            ).collect()
        )
        assert got == {
            # V12 group has ways 2+3; A9/A10 from the roundabout way
            ("mapped_not_in_law", "V12", "", 2),
            ("mapped_not_in_law", "A9", "", 1),
            ("mapped_not_in_law", "A10", "", 1),
            ("law_not_mapped", "P7", "", -1),
            # A5 mapped but never co-occurs with P7; (P99,P98) skipped
            # because P99 is not mapped; (V12,P5) co-occurs -> fine
            ("unshared", "A5", "P7", -1),
            # way 7 (invalid-mixed) still contributes its pair
            ("shared_not_in_law", "A5", "X1", 1),
            ("shared_roundabout_only", "A10", "A9", -1),
            # raw-ref relation checks: A5 has two, P5/V12/A9/A10 none
            ("missing_relation", "V12", "", -1),
            ("missing_relation", "P5", "", -1),
            ("missing_relation", "A9", "", -1),
            ("missing_relation", "A10", "", -1),
            ("same_ref_relations", "A5", "", 2),
            ("extra_relation", "P9", "102", -1),
            # all-invalid ways 4,5,6; C-9 is excluded -> value-count delta 1
            ("unrecognized", "A31", "", 1),
            ("unrecognized", "X1", "", 1),
            ("excluded_count", "", "", 1),
        }

    def test_unshared_requires_mapped_key(self, spark):
        ways = _ways(
            spark, [(1, {"highway": "r", "ref": "A5"}, 56.5, 24.5)]
        )
        got = _kinds(
            _report(spark, ways, law=["A5"],
                    shared=[("P9", "A5")]).collect()
        )
        # P9 is not mapped, so the law pair is not checked
        assert not any(k[0] == "unshared" for k in got)
