"""GTFS routes/calendar readers, Osmosis .poly text codec, resolutions
anti-join — the small source-matrix closers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.geo.polygon import read_poly_text, write_poly_text
from osmalyzer_spark.operators.resolving import mark_resolved, suppress_resolved
from osmalyzer_spark.sources.gtfs import read_gtfs_routes, read_gtfs_services


@pytest.fixture()
def tmpdir_files(tmp_path):
    routes = tmp_path / "routes.txt"
    routes.write_text(
        "route_id,route_short_name,route_long_name,route_desc,route_type\n"
        'riga_bus_3,"3","Daugavgrīva - Pļavnieki",,3\n'
        'riga_tram_5,"5","Tram line",,0\n'
        'riga_trol_16,"16","Trolley",,11\n'
        'riga_bus_3,"3","DUPLICATE - must lose",,3\n'
        "plainid,9,NoUnderscore,,3\n"
        'riga_zeppelin_1,"1","Unknown type",,3\n',
        encoding="utf-8",
    )
    calendar = tmp_path / "calendar.txt"
    calendar.write_text(
        "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n"
        "24837,0,0,0,0,0,1,1,20230415,20240401\n"
        "24838,1,1,1,1,1,0,0,20230415,20240401\n"
        "24837,1,1,1,1,1,1,1,20230415,20240401\n",
        encoding="utf-8",
    )
    return tmp_path


def test_read_gtfs_routes(spark, tmpdir_files):
    rows = {r["route_id"]: r for r in read_gtfs_routes(spark, str(tmpdir_files / "routes.txt")).collect()}
    assert len(rows) == 5  # duplicate id collapsed, first wins
    assert rows["riga_bus_3"]["name"] == "Daugavgrīva - Pļavnieki"
    assert rows["riga_bus_3"]["vehicle_type"] == "bus"
    assert rows["riga_tram_5"]["vehicle_type"] == "tram"
    assert rows["riga_trol_16"]["vehicle_type"] == "trolleybus"
    assert rows["plainid"]["vehicle_type"] == "bus"  # no underscore -> default
    assert rows["riga_zeppelin_1"]["vehicle_type"] is None  # unknown -> null


def test_read_gtfs_services(spark, tmpdir_files):
    rows = {r["service_id"]: r for r in read_gtfs_services(spark, str(tmpdir_files / "calendar.txt")).collect()}
    assert len(rows) == 2  # duplicate id collapsed, first wins
    r = rows["24837"]
    assert (r["saturday"], r["sunday"], r["monday"]) == (True, True, False)
    assert str(r["start_date"]) == "2023-04-15"
    assert str(r["end_date"]) == "2024-04-01"


def test_poly_text_roundtrip():
    coords = np.array([(55.66109, 26.59394), (55.69487, 26.37334), (56.1, 25.0)])
    text = write_poly_text(coords)
    lines = text.splitlines()
    assert lines[0] == "none" and lines[1] == "1"
    assert lines[-2:] == ["END", "END"]
    # lon comes first on coordinate lines (reference convention)
    assert float(lines[2].split()[0]) == pytest.approx(26.59394)
    back = read_poly_text(text)
    assert np.allclose(back, coords)


def test_poly_text_parses_reference_sample():
    # the exact shape shown in OsmPolygon.cs:19-31 (3-digit exponents too)
    sample = (
        "none\n1\n"
        "   2.659394E+01   5.566109E+01\n"
        "   2.637334E+001   5.569487E+001\n"
        "END\nEND\n"
    )
    got = read_poly_text(sample)
    assert np.allclose(got, [(55.66109, 26.59394), (55.69487, 26.37334)])


def _report(spark):
    return spark.createDataFrame(
        [
            ("shops", "missing-name", "node/1", "problem A"),
            ("shops", "missing-name", "node/2", "problem B"),
            ("banks", "far-away", "node/1", "problem C"),
        ],
        "analyzer string, issue_id string, subject_key string, detail string",
    )


def _resolutions(spark):
    return spark.createDataFrame(
        [
            ("shops", "missing-name", "node/1", 1),   # current revision
            ("banks", "far-away", "node/1", 99),      # stale -> ignored
        ],
        "analyzer string, issue_id string, subject_key string, revision int",
    )


def test_mark_resolved(spark):
    out = {
        (r["analyzer"], r["subject_key"]): r["resolved"]
        for r in mark_resolved(_report(spark), _resolutions(spark)).collect()
    }
    assert out[("shops", "node/1")] is True
    assert out[("shops", "node/2")] is False
    assert out[("banks", "node/1")] is False  # stale revision skipped


def test_suppress_resolved(spark):
    out = suppress_resolved(_report(spark), _resolutions(spark))
    assert out.count() == 2
    assert sorted(r["subject_key"] for r in out.collect()) == ["node/1", "node/2"]


def test_extent_validation_raises(spark):
    """Points beyond the cell index's supported extent fail explicitly
    instead of silently missing in-radius pairs (ADVICE r1)."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    from osmalyzer_spark.operators.knn import radius_join

    probe = spark.createDataFrame([(1, 75.0, 10.0)], "pid int, plat double, plon double")
    build = spark.createDataFrame([(2, 75.0, 10.0)], "bid int, blat double, blon double")
    joined = radius_join(
        probe, build, 1000.0,
        probe_coords=("plat", "plon"), build_coords=("blat", "blon"),
    )
    with pytest.raises(Exception, match="extent"):
        joined.count()
    # same points pass with a widened bound
    ok = radius_join(
        probe, build, 1000.0,
        probe_coords=("plat", "plon"), build_coords=("blat", "blon"),
        max_abs_lat_deg=80.0,
    )
    assert ok.count() == 1


def test_overpass_query_and_filter_agree(spark):
    """One rule set -> Overpass QL text AND the equivalent Spark filter."""
    from osmalyzer_spark.functions.overpass import (
        DoesNotHaveKey, DoesNotHaveValue, HasKey, HasValue,
        overpass_link, overpass_query, rules_filter,
    )

    rules = [HasKey("amenity"), HasValue("amenity", "atm"),
             DoesNotHaveKey("disused"), DoesNotHaveValue("operator", "X")]
    q = overpass_query(rules)
    assert '["amenity"]["amenity"="atm"][!"disused"]["operator"!="X"]' in q
    assert q.startswith("[out:json][timeout:25];")
    assert "{{geocodeArea:Latvia}}->.searchArea;" in q
    assert overpass_link(rules).startswith("https://overpass-turbo.eu/?Q=")

    df = spark.createDataFrame(
        [
            (1, {"amenity": "atm"}),                      # matches
            (2, {"amenity": "atm", "operator": "X"}),     # operator=X -> out
            (3, {"amenity": "atm", "disused": "yes"}),    # disused -> out
            (4, {"amenity": "bank"}),                     # value mismatch
            (5, {"shop": "kiosk"}),                       # no amenity
        ],
        "id int, tags map<string,string>",
    )
    got = sorted(r["id"] for r in df.filter(rules_filter(rules, "tags")).collect())
    assert got == [1]


def test_read_table_fallback_and_snapshot(spark, tmp_path):
    """No Iceberg jar in this sandbox: read_table falls back to parquet
    and snapshot_id yields a files-digest that tracks input changes."""
    from osmalyzer_spark.sources.tables import iceberg_available, read_table, snapshot_id

    p = str(tmp_path / "t")
    spark.range(5).write.parquet(p)
    assert iceberg_available(spark) is False
    assert read_table(spark, p).count() == 5
    s1 = snapshot_id(spark, p)
    assert s1.startswith("files:")
    spark.range(5, 9).write.mode("append").parquet(p)
    s2 = snapshot_id(spark, p)
    assert s2 != s1  # lineage token tracks the input
