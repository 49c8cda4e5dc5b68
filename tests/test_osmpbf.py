"""OSM PBF reader (S1): round-trip against a spec-faithful test writer,
delta/zigzag/granularity decoding, and the blob-parallel Spark reader."""

import struct
import zlib

import pytest

from osmalyzer_spark.sources.osmpbf import (
    decode_primitive_block, index_blobs, read_pbf,
)


# ---------------------------------------------------------------------------
# minimal spec-faithful writer (tests only)
# ---------------------------------------------------------------------------


def enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zz(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def f_varint(field: int, v: int) -> bytes:
    return enc_varint((field << 3) | 0) + enc_varint(v)


def f_bytes(field: int, data: bytes) -> bytes:
    return enc_varint((field << 3) | 2) + enc_varint(len(data)) + data


def f_packed(field: int, vals, signed=False) -> bytes:
    body = b"".join(enc_varint(zz(v) if signed else v) for v in vals)
    return f_bytes(field, body)


def deltas(vals):
    out, prev = [], 0
    for v in vals:
        out.append(v - prev)
        prev = v
    return out


def make_pbf(nodes, ways, rels, granularity=100, lat_off=0, lon_off=0) -> bytes:
    """nodes: [(id, lat_nano, lon_nano, {k:v})]; ways: [(id, [refs], {k:v})];
    rels: [(id, [(memid, type_int, role)], {k:v})]."""
    strings = [""]

    def sid(s):
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    kv_stream = []
    for _, _, _, tags in nodes:
        for k, v in tags.items():
            kv_stream += [sid(k), sid(v)]
        kv_stream.append(0)
    dense = (
        f_packed(1, deltas([n[0] for n in nodes]), signed=True)
        + f_packed(8, deltas([n[1] for n in nodes]), signed=True)
        + f_packed(9, deltas([n[2] for n in nodes]), signed=True)
        + f_packed(10, kv_stream)
    )
    group = f_bytes(2, dense)
    for wid, refs, tags in ways:
        way = (
            f_varint(1, wid)
            + f_packed(2, [sid(k) for k in tags])
            + f_packed(3, [sid(v) for v in tags.values()])
            + f_packed(8, deltas(refs), signed=True)
        )
        group += f_bytes(3, way)
    for rid, members, tags in rels:
        rel = (
            f_varint(1, rid)
            + f_packed(2, [sid(k) for k in tags])
            + f_packed(3, [sid(v) for v in tags.values()])
            + f_packed(8, [sid(role) for _, _, role in members])
            + f_packed(9, deltas([m for m, _, _ in members]), signed=True)
            + f_packed(10, [t for _, t, _ in members])
        )
        group += f_bytes(4, rel)

    st = b"".join(f_bytes(1, s.encode()) for s in strings)
    block = (
        f_bytes(1, st)
        + f_bytes(2, group)
        + f_varint(17, granularity)
        + f_varint(19, lat_off)
        + f_varint(20, lon_off)
    )
    zdata = zlib.compress(block)
    blob = f_varint(2, len(block)) + f_bytes(3, zdata)
    header = f_bytes(1, b"OSMData") + f_varint(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


NODES = [
    (1001, 56_949_000_000 // 100, 24_105_000_000 // 100, {"amenity": "atm", "name": "X"}),
    (1002, 56_950_000_000 // 100, 24_106_000_000 // 100, {}),
    (1003, 55_661_000_000 // 100, 26_594_000_000 // 100, {"shop": "yes"}),
]
WAYS = [(2001, [1001, 1002, 1003, 1001], {"building": "yes"})]
RELS = [(3001, [(2001, 1, "outer"), (1002, 0, "admin_centre")], {"type": "multipolygon"})]


def test_decode_primitive_block_roundtrip(tmp_path):
    blob = make_pbf(NODES, WAYS, RELS)
    p = tmp_path / "x.osm.pbf"
    p.write_bytes(blob)
    idx = index_blobs(str(p))
    assert [t for t, _, _ in idx] == ["OSMData"]
    from osmalyzer_spark.sources.osmpbf import _inflate_blob

    off, size = idx[0][1], idx[0][2]
    nodes, ways, rels = decode_primitive_block(
        _inflate_blob(blob[off : off + size])
    )
    assert [(n[0]) for n in nodes] == [1001, 1002, 1003]
    assert nodes[0][1] == pytest.approx(56.949) and nodes[0][2] == pytest.approx(24.105)
    assert nodes[0][3] == {"amenity": "atm", "name": "X"}
    assert nodes[1][3] == {}
    assert ways[0][0] == 2001 and ways[0][1] == [1001, 1002, 1003, 1001]
    assert ways[0][2] == {"building": "yes"}
    rid, mids, mtypes, roles, tags = rels[0]
    assert rid == 3001 and mids == [2001, 1002]
    assert mtypes == ["way", "node"] and roles == ["outer", "admin_centre"]
    assert tags == {"type": "multipolygon"}


def test_granularity_and_offsets(tmp_path):
    # granularity 1000 + nonzero offsets must reproduce the same coords
    nodes = [(5, 56_949_000_000 // 1000 - 7, 24_105_000_000 // 1000 - 9, {})]
    blob = make_pbf(nodes, [], [], granularity=1000, lat_off=7000, lon_off=9000)
    p = tmp_path / "g.osm.pbf"
    p.write_bytes(blob)
    from osmalyzer_spark.sources.osmpbf import _inflate_blob

    _, off, size = index_blobs(str(p))[0]
    got, _, _ = decode_primitive_block(_inflate_blob(blob[off : off + size]))
    assert got[0][1] == pytest.approx(56.949, abs=1e-5)
    assert got[0][2] == pytest.approx(24.105, abs=1e-5)


def test_read_pbf_distributed(spark, tmp_path):
    """Multiple OSMData blobs parse as independent tasks; an OSMHeader
    blob (if present) is skipped like real extracts have."""
    b1 = make_pbf(NODES, WAYS, RELS)
    b2 = make_pbf([(9001, 57_000_000_000 // 100, 25_000_000_000 // 100, {"t": "v"})], [], [])
    p = tmp_path / "multi.osm.pbf"
    p.write_bytes(b1 + b2)
    nodes, ways, rels = read_pbf(spark, str(p))
    got_nodes = {r["elem_id"]: r for r in nodes.collect()}
    assert set(got_nodes) == {1001, 1002, 1003, 9001}
    assert got_nodes[9001]["tags"] == {"t": "v"}
    assert got_nodes[1001]["lat"] == pytest.approx(56.949)
    assert ways.collect()[0]["node_ids"] == [1001, 1002, 1003, 1001]
    r = rels.collect()[0]
    assert r["member_types"] == ["way", "node"]
    # feeds the engine's existing way-resolution operator directly
    from osmalyzer_spark.operators.osm import resolve_way_geometries

    resolved = resolve_way_geometries(
        ways.withColumnRenamed("elem_id", "id"),
        nodes.withColumnRenamed("elem_id", "id"),
    )
    assert resolved.count() >= 1
