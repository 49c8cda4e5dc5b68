"""VDB place-name pipeline semantics (plans/vdb.py): pairs-only
duplicate resolution with the known whitelist, the 3+-group quirk,
STAVOKLIS/VEIDS typed parsing with the strict-active rule, and the
qualifier-histogram stats (reference VdbAnalysisData.cs:160-418,
VdbAnalyzer.cs:20-100, VdbEntry.cs:780)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from osmalyzer_spark.plans.vdb import (
    vdb_resolve_duplicates,
    vdb_stats,
    vdb_typed,
)

_RAW_SCHEMA = (
    "object_id string, main_name string, all_names string, "
    "state_raw string, type_raw string, official_raw string"
)
_COMPARED = ["main_name", "all_names", "state_raw", "type_raw", "official_raw"]


def _raw(spark, rows):
    return spark.createDataFrame(rows, _RAW_SCHEMA)


def _row(oid, name, state="pastāv", typ="ciems", names=None, off="Oficiāls"):
    return (oid, name, names, state, typ, off)


class TestDuplicateResolution:
    def test_pair_with_known_member_resolves(self, spark):
        raw = _raw(
            spark,
            [
                _row("10", "Sabile"), _row("11", "Sabile"),
                _row("20", "Cita vieta"),
            ],
        )
        surv, issues = vdb_resolve_duplicates(
            spark, raw, _COMPARED, [("10", "Sabile")]
        )
        assert {r.object_id for r in surv.collect()} == {"10", "20"}
        assert [(r.kind, r.main_id, r.other_id) for r in issues.collect()] == [
            ("resolved_dup", "10", "11")
        ]

    def test_pair_without_known_drops_both(self, spark):
        raw = _raw(spark, [_row("10", "X"), _row("11", "X")])
        surv, issues = vdb_resolve_duplicates(spark, raw, _COMPARED, [])
        assert surv.count() == 0
        assert [(r.kind, r.main_id, r.other_id) for r in issues.collect()] == [
            ("unresolved_dup", "10", "11")
        ]

    def test_triples_pass_through_untouched(self, spark):
        # the reference only resolves groups of EXACTLY 2
        raw = _raw(spark, [_row("1", "Y"), _row("2", "Y"), _row("3", "Y")])
        surv, issues = vdb_resolve_duplicates(
            spark, raw, _COMPARED, [("1", "Y")]
        )
        assert surv.count() == 3 and issues.count() == 0

    def test_known_needs_both_id_and_name(self, spark):
        raw = _raw(spark, [_row("10", "X"), _row("11", "X")])
        _, issues = vdb_resolve_duplicates(
            spark, raw, _COMPARED, [("10", "Wrong name")]
        )
        assert issues.collect()[0].kind == "unresolved_dup"

    def test_key_excludes_ids(self, spark):
        # identical compared fields but different object ids ARE a pair
        raw = _raw(spark, [_row("1", "Z"), _row("99", "Z")])
        _, issues = vdb_resolve_duplicates(spark, raw, _COMPARED, [])
        assert issues.count() == 1


class TestTypedAndStats:
    def test_state_type_official_active(self, spark):
        raw = _raw(
            spark,
            [
                _row("1", "A", state="pastāv", typ="viensēta"),
                _row("2", "B", state="daļēji izzudis", typ="mazciems"),
                _row("3", "C", state="nepastāv", typ="valstspilsēta",
                     off="Neoficiāls"),
                _row("4", "D", state="nezināms", typ="ezers"),
            ],
        )
        t = {r.object_id: r for r in vdb_typed(raw).collect()}
        assert t["1"].state == "exists" and t["1"].is_active is True
        # strict: PartiallyGone is NOT active (VdbEntry.cs:780)
        assert t["2"].state == "partially_gone" and t["2"].is_active is False
        assert t["1"].object_type == "hamlet" == t["2"].object_type
        assert t["3"].object_type == "state_city" and t["3"].official is False
        assert t["4"].object_type == "unparsed"

    def test_unknown_state_raises(self, spark):
        raw = _raw(spark, [_row("1", "A", state="kaut kas cits")])
        with pytest.raises(Exception, match="STAVOKLIS"):
            vdb_typed(raw).collect()

    def test_stats_counts_and_qualifiers(self, spark):
        raw = _raw(
            spark,
            [
                _row("1", "A", typ="ciems", names="Orlas ezers [o]"),
                _row("2", "B", typ="ciems", state="nepastāv",
                     names="Vylku azars (x), Cits [o]"),
                _row("3", "C", typ="novada pilsēta", names=None),
                _row("4", "D", typ="ezers"),
            ],
        )
        rows = {(r.kind, r.a): r.n for r in vdb_stats(vdb_typed(raw)).collect()}
        assert rows[("admin_count", "villages")] == 2
        assert rows[("admin_active", "villages")] == 1
        assert rows[("admin_count", "cities")] == 1
        assert rows[("total_entries", "")] == 4  # unparsed still counted
        assert rows[("pronunciation", "o")] == 2
        assert rows[("comment", "x")] == 1
