"""HTML/Leaflet report sink (S11) — structure, escaping, caps."""

import pytest

from osmalyzer_spark.sinks.report_html import render_leaflet_report, write_report


def corr_df(spark):
    return spark.createDataFrame(
        [
            ("matched", 1, 10, 12.5, 3, 56.9, 24.1),
            ("matched_far", 2, 11, 210.0, 1, 56.8, 24.2),
            ("unmatched_item", None, 12, None, None, 56.7, 24.3),
            ("lone_osm", 3, None, None, None, None, None),  # no coords
            ("matched", 4, 13, 1.0, 3, 57.0, 24.0),
        ],
        "kind string, osm_id long, item_id long, distance double, "
        "strength int, lat double, lon double",
    )


def test_report_structure(spark):
    htmlstr = render_leaflet_report(corr_df(spark), "Shops — Brand X")
    assert htmlstr.count("circleMarker") == 1  # template JS
    import json, re
    m = re.search(r"var markers = (\[.*?\]);", htmlstr, re.S)
    markers = json.loads(m.group(1))
    assert len(markers) == 4  # lone_osm row has no coords
    assert {mk["kind"] for mk in markers} == {"matched", "matched_far", "unmatched_item"}
    # summary includes ALL kinds, coords or not
    assert "<td>lone_osm</td><td>1</td>" in htmlstr
    assert "<td>matched</td><td>2</td>" in htmlstr
    assert "Shops — Brand X" in htmlstr


def test_report_escapes_html(spark):
    df = spark.createDataFrame(
        [("matched", "<script>alert(1)</script>", 56.9, 24.1)],
        "kind string, item_id string, lat double, lon double",
    )
    htmlstr = render_leaflet_report(df, "<b>T</b>")
    assert "<script>alert(1)</script>" not in htmlstr
    assert "<b>T</b>" not in htmlstr  # title escaped


def test_report_row_cap(spark):
    df = spark.range(0, 20).selectExpr(
        "'matched' AS kind", "CAST(id AS double) AS lat", "24.0 AS lon"
    )
    with pytest.raises(ValueError, match="exceeds"):
        render_leaflet_report(df, "big", max_rows=10)


def test_write_report(spark, tmp_path):
    p = str(tmp_path / "r.html")
    write_report(corr_df(spark), p, "T")
    assert open(p, encoding="utf-8").read().startswith("<!DOCTYPE html>")
