"""FlatGeobuf reader (S6): byte-level layout assertions, round-trip, and
the distributed points reader."""

import struct

import pytest

from osmalyzer_spark.sources.flatgeobuf import (
    CT_DOUBLE, CT_INT, CT_LONG, CT_STRING, MAGIC,
    parse_fgb, read_fgb_points, rtree_size, write_fgb_points,
)

COLS = [("name", CT_STRING), ("ref", CT_LONG), ("grade", CT_INT), ("score", CT_DOUBLE)]

POINTS = [
    (24.105, 56.949, {"name": "Brīvības piemineklis", "ref": 101, "grade": 1, "score": 9.5}),
    (26.594, 55.661, {"name": "x<&>y", "ref": 202}),
    (21.010, 56.505, {}),
]


def test_roundtrip():
    blob = write_fgb_points(POINTS, COLS, name="monuments")
    header, feats = parse_fgb(blob)
    assert header["name"] == "monuments"
    assert header["geometry_type"] == 1  # Point
    assert header["features_count"] == 3
    assert header["columns"] == COLS
    assert len(feats) == 3
    for i, (x, y, props) in enumerate(POINTS):
        idx, gtype, xy, got = feats[i]
        assert (idx, gtype) == (i, 1)
        assert xy == [(x, y)]
        assert got == props


def test_byte_layout_invariants():
    """Independent byte-level checks — not routed through the reader."""
    blob = write_fgb_points(POINTS[:1], COLS)
    assert blob[:8] == MAGIC
    (header_len,) = struct.unpack_from("<I", blob, 8)
    assert 0 < header_len < len(blob)
    # features_count u64 == 1 must appear inside the header bytes
    header = blob[12 : 12 + header_len]
    assert struct.pack("<Q", 1) in header
    # the point's xy doubles must appear contiguously in the feature bytes
    feature = blob[12 + header_len :]
    assert struct.pack("<dd", 24.105, 56.949) in feature
    # the first feature's length prefix covers exactly the rest
    (flen,) = struct.unpack_from("<I", feature, 0)
    assert flen == len(feature) - 4


def test_rtree_size_matches_reference_formula():
    """PackedRTree.CalcSize transcription (Index/PackedRTree.cs:16-33)."""
    # n=1: 1 node -> wait, loop: n=1 initially numNodes=1, do: n=(1+15)//16=1 -> +1 => 2
    def ref(num_items, node_size):
        node_size = min(max(node_size, 2), 65535)
        n = num_items
        num_nodes = n
        while True:
            n = (n + node_size - 1) // node_size
            num_nodes += n
            if n == 1:
                break
        return num_nodes * 40

    for items, ns in [(1, 16), (100, 16), (1000, 16), (17, 16), (256, 2)]:
        assert rtree_size(items, ns) == ref(items, ns)
    assert rtree_size(0, 16) == 0


def test_corrupted_string_length_tolerated():
    """The reference tolerates an over-long string length in properties
    (FeatureConversions.cs:170-176) — the reader must too."""
    from osmalyzer_spark.sources.flatgeobuf import _decode_properties

    pb = struct.pack("<H", 0) + struct.pack("<I", 9999) + b"abc"
    out = _decode_properties(pb, [("name", CT_STRING)])
    assert out["name"] == ""


def test_not_fgb_raises():
    with pytest.raises(ValueError, match="Not a FlatGeobuf"):
        parse_fgb(b"PK\x03\x04junkjunkjunk")


def test_read_fgb_points_distributed(spark, tmp_path):
    d = tmp_path / "tiles"
    d.mkdir()
    (d / "tile1.fgb").write_bytes(write_fgb_points(POINTS[:2], COLS))
    (d / "tile2.fgb").write_bytes(write_fgb_points(POINTS[2:], COLS))
    df = read_fgb_points(spark, str(d) + "/*.fgb")
    rows = sorted(df.collect(), key=lambda r: (r["file"], r["feature_idx"]))
    assert len(rows) == 3
    assert rows[0]["lat"] == pytest.approx(56.949)
    assert rows[0]["lon"] == pytest.approx(24.105)
    assert rows[0]["properties"]["name"] == "Brīvības piemineklis"
    assert rows[0]["properties"]["ref"] == "101"
    assert rows[2]["properties"] == {}
    # two files -> two parallel units
    assert {r["file"].split("/")[-1] for r in rows} == {"tile1.fgb", "tile2.fgb"}
