"""Shapefile reader (S7 completion): byte-level decode, .dbf, .prj, the
centroid semantics the reference relies on, and the distributed reader.

Reference behavior mirrored: MicroReserveAnalysisData.cs:72-146 reads the
.prj WKT into a transform, iterates .shp geometries, takes
geometry.Centroid, transforms it to WGS84, and reads .dbf attribute
values per record.
"""

import os
import struct

import numpy as np
import pytest

from osmalyzer_spark.geo.proj import lks92_forward
from osmalyzer_spark.sources.shapefile import (
    LKS92_WKT,
    SHAPE_POINT,
    SHAPE_POLYGON,
    SHAPE_POLYLINE,
    decode_dbf_record,
    decode_shp_record,
    parse_prj,
    read_dbf_header,
    read_shapefile,
    read_shx_index,
    scan_shp_index,
    shape_centroid,
    write_shapefile,
)

SQUARE = [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]]
# outer CW square with a CCW hole in the upper-right quadrant
HOLED = [
    [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)],
    [(6.0, 6.0), (8.0, 6.0), (8.0, 8.0), (6.0, 8.0), (6.0, 6.0)],
]


def test_centroid_polygon_square():
    cx, cy = shape_centroid(SHAPE_POLYGON, SQUARE)
    assert (cx, cy) == pytest.approx((5.0, 5.0))


def test_centroid_polygon_hole_shifts_centroid():
    """Signed accumulation subtracts the hole (NTS Centroid semantics):
    centroid = (100*(5,5) - 4*(7,7)) / 96."""
    cx, cy = shape_centroid(SHAPE_POLYGON, HOLED)
    assert (cx, cy) == pytest.approx((
        (100 * 5.0 - 4 * 7.0) / 96.0,
        (100 * 5.0 - 4 * 7.0) / 96.0,
    ))


def test_centroid_polyline_length_weighted():
    # L-shape: two segments of length 10 and 20
    parts = [[(0.0, 0.0), (0.0, 10.0), (20.0, 10.0)]]
    cx, cy = shape_centroid(SHAPE_POLYLINE, parts)
    assert (cx, cy) == pytest.approx(
        ((10 * 0.0 + 20 * 10.0) / 30.0, (10 * 5.0 + 20 * 10.0) / 30.0)
    )


def test_decode_polygon_z_skips_z_arrays():
    """PolygonZ (type 15) carries trailing Z/M blocks; XY decode must not
    read into them."""
    ring = SQUARE[0]
    flat = [c for pt in ring for c in pt]
    n = len(ring)
    content = struct.pack(
        f"<i4d2i1i{2 * n}d", 15, 0, 0, 10, 10, 1, n, 0, *flat
    )
    # z range + z values + m range + m values
    content += struct.pack(f"<2d{n}d", 1.0, 2.0, *([1.5] * n))
    content += struct.pack(f"<2d{n}d", 0.0, 0.0, *([0.0] * n))
    stype, parts = decode_shp_record(content)
    assert stype == 15
    assert parts == [[(x, y) for x, y in ring]]


def test_prj_classification():
    assert parse_prj(LKS92_WKT) == "lks92"
    assert parse_prj('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984"]]') == "wgs84"
    with pytest.raises(ValueError):
        parse_prj('PROJCS["x",PROJECTION["Lambert_Conformal_Conic"]]')
    with pytest.raises(ValueError):
        # TM but wrong params (UTM zone 34N, not LKS-92)
        parse_prj(
            'PROJCS["x",PROJECTION["Transverse_Mercator"],'
            'PARAMETER["False_Easting",500000.0],'
            'PARAMETER["False_Northing",0.0],'
            'PARAMETER["Central_Meridian",21.0],'
            'PARAMETER["Scale_Factor",0.9996],'
            'PARAMETER["Latitude_Of_Origin",0.0]]'
        )


def _write_fixture(tmp_path, with_prj=False, n_extra_points=0):
    base = str(tmp_path / "mr")
    shapes = [
        (SHAPE_POLYGON, HOLED),
        (SHAPE_POINT, [[(2.5, 3.5)]]),
        (SHAPE_POLYGON, SQUARE),
    ]
    attrs = [
        {"OBJECTID": "1", "MR_OBJEKTS": "2", "MR_TIPS": "10", "NOS": "Pūpolu mežs"},
        {"OBJECTID": "2", "MR_OBJEKTS": "1", "MR_TIPS": "4", "NOS": "Strazdu sala"},
        {"OBJECTID": "3", "MR_OBJEKTS": "3", "MR_TIPS": "6", "NOS": "Ķemeru tīrelis"},
    ]
    for i in range(n_extra_points):
        shapes.append((SHAPE_POINT, [[(float(i), float(i) / 2.0)]]))
        attrs.append({"OBJECTID": str(4 + i), "MR_OBJEKTS": "0",
                      "MR_TIPS": "0", "NOS": f"p{i}"})
    fields = [
        ("OBJECTID", "N", 10, 0),
        ("MR_OBJEKTS", "N", 6, 0),
        ("MR_TIPS", "N", 6, 0),
        ("NOS", "C", 40, 0),
    ]
    write_shapefile(
        base, shapes, attrs, fields, prj_wkt=LKS92_WKT if with_prj else None
    )
    return base, shapes, attrs


def test_shx_and_scan_agree(tmp_path):
    base, shapes, _ = _write_fixture(tmp_path)
    assert read_shx_index(base + ".shx") == scan_shp_index(base + ".shp")


def test_dbf_header_and_records(tmp_path):
    base, _, attrs = _write_fixture(tmp_path)
    fields, n_rec, hdr, rec = read_dbf_header(base + ".dbf")
    assert n_rec == 3
    assert [f[0] for f in fields] == ["OBJECTID", "MR_OBJEKTS", "MR_TIPS", "NOS"]
    with open(base + ".dbf", "rb") as f:
        f.seek(hdr)
        first = decode_dbf_record(f.read(rec), fields)
    assert first["NOS"] == "Pūpolu mežs"  # cp1257 round-trip
    assert first["MR_OBJEKTS"] == "2"
    # deleted flag
    assert decode_dbf_record(b"*" + b" " * (rec - 1), fields) is None


def test_read_shapefile_roundtrip(spark, tmp_path):
    base, shapes, attrs = _write_fixture(tmp_path)
    rows = {r["fid"]: r for r in read_shapefile(spark, base).collect()}
    assert len(rows) == 3
    holed = rows[1]
    assert holed["stype"] == SHAPE_POLYGON
    assert holed["cx"] == pytest.approx((100 * 5.0 - 4 * 7.0) / 96.0)
    assert holed["n_points"] == 10
    assert len(holed["rings"]) == 2
    assert holed["rings"][1][0]["x"] == 6.0
    assert holed["attrs"]["NOS"] == "Pūpolu mežs"
    pt = rows[2]
    assert (pt["x"], pt["y"]) == (2.5, 3.5)
    assert (pt["cx"], pt["cy"]) == (2.5, 3.5)
    assert pt["attrs"]["MR_TIPS"] == "4"


def test_read_shapefile_wgs84_reprojection(spark, tmp_path):
    """Write LKS-92 meters derived from known WGS84 points; the reader
    must return those lat/lon back (~1e-7 deg ≈ 1 cm, matching the
    proj.py round-trip bound)."""
    lat, lon = np.array([56.9496, 56.509]), np.array([24.1052, 21.011])
    x, y = lks92_forward(lat, lon)
    base = str(tmp_path / "geo")
    write_shapefile(
        base,
        [(SHAPE_POINT, [[(float(x[i]), float(y[i]))]]) for i in range(2)],
        attrs=[{"ID": "1"}, {"ID": "2"}],
        prj_wkt=LKS92_WKT,
    )
    rows = read_shapefile(spark, base).orderBy("fid").collect()
    for i, r in enumerate(rows):
        assert r["x"] == pytest.approx(float(lon[i]), abs=1e-6)
        assert r["y"] == pytest.approx(float(lat[i]), abs=1e-6)
        assert r["cx"] == pytest.approx(float(lon[i]), abs=1e-6)


def test_read_shapefile_distributed_and_no_shx(spark, tmp_path):
    """Many record-range tasks must agree with the single-task read, and
    the .shx-less fallback must produce the same result."""
    base, _, _ = _write_fixture(tmp_path, n_extra_points=29)
    whole = read_shapefile(spark, base).orderBy("fid").collect()
    sliced = read_shapefile(spark, base, records_per_task=4).orderBy("fid").collect()
    assert whole == sliced
    os.remove(base + ".shx")
    no_shx = read_shapefile(spark, base, records_per_task=4).orderBy("fid").collect()
    assert whole == no_shx
    assert len(whole) == 32


def test_read_shapefile_dbf_count_mismatch(tmp_path, spark):
    base, _, _ = _write_fixture(tmp_path)
    # truncate the dbf record count by rewriting the header count field
    with open(base + ".dbf", "r+b") as f:
        f.seek(4)
        f.write(struct.pack("<I", 2))
    with pytest.raises(ValueError, match="records"):
        read_shapefile(spark, base)


def test_shape_area_hole_subtracts():
    from osmalyzer_spark.sources.shapefile import shape_area

    assert shape_area(SHAPE_POLYGON, HOLED) == pytest.approx(96.0)
    assert shape_area(SHAPE_POINT, [[(1.0, 2.0)]]) == 0.0


def test_micro_reserve_analyzer_end_to_end(spark, tmp_path):
    """S7 wired into the MicroReservesAnalyzer flow: shapefile polygons ->
    WGS84 centroids -> closest OSM nature-reserve element within 300 m;
    unmatched reserves and multi-matched OSM elements reported
    (MicroReservesAnalyzer.cs:15-126)."""
    from osmalyzer_spark.plans.analyzers import micro_reserve_analyzer

    # three reserves: two near one OSM element (multi-match), one far away
    centers = [(56.9500, 24.1000), (56.9504, 24.1002), (56.4000, 22.0000)]
    shapes = []
    for lat, lon in centers:
        x, y = lks92_forward(np.array([lat]), np.array([lon]))
        d = 50.0  # ~100 m square around the center, in LKS-92 meters
        ring = [(float(x[0]) - d, float(y[0]) - d), (float(x[0]) - d, float(y[0]) + d),
                (float(x[0]) + d, float(y[0]) + d), (float(x[0]) + d, float(y[0]) - d),
                (float(x[0]) - d, float(y[0]) - d)]
        shapes.append((SHAPE_POLYGON, [ring]))
    base = str(tmp_path / "mr2")
    write_shapefile(base, shapes, attrs=[{"ID": str(i)} for i in range(3)],
                    prj_wkt=LKS92_WKT)

    elements = spark.createDataFrame(
        [
            (10, 56.9501, 24.1001, {"leisure": "nature_reserve"}, "way"),
            (11, 56.0000, 21.0000, {"leisure": "nature_reserve"}, "way"),  # far
            (12, 56.9502, 24.1003, {"shop": "yes"}, "way"),  # wrong tags
            (13, 56.9502, 24.0999, {"boundary": "protected_area"}, "node"),  # wrong kind
        ],
        "elem_id long, elem_lat double, elem_lon double, tags map<string,string>, kind string",
    )
    rows = micro_reserve_analyzer(spark, elements, base).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert {r["reserve_fid"] for r in by_kind["matched"]} == {1, 2}
    assert all(r["osm_id"] == 10 for r in by_kind["matched"])
    assert all(r["area_m2"] == pytest.approx(10000.0, rel=1e-3) for r in by_kind["matched"])
    assert [r["reserve_fid"] for r in by_kind["unmatched_reserve"]] == [3]
    assert [(r["osm_id"], r["n_reserves"]) for r in by_kind["multi_match"]] == [(10, 2)]


def test_to_wgs84_without_prj_raises(spark, tmp_path):
    """Explicit to_wgs84=True with no .prj must fail loudly (ADVICE r3):
    returning source-CRS coordinates as if they were WGS84 contradicts
    parse_prj's own silently-misprojecting-is-worse-than-failing policy."""
    base, _, _ = _write_fixture(tmp_path, with_prj=False)
    with pytest.raises(ValueError, match="no .prj"):
        read_shapefile(spark, base, to_wgs84=True)
    # default (auto) and explicit False still read fine in source CRS
    assert read_shapefile(spark, base).count() == 3
    assert read_shapefile(spark, base, to_wgs84=False).count() == 3
