"""FlatGeobuf reader (S6) — from-scratch binary parse, no vendored lib.

The reference vendors the upstream FlatGeobuf C# library to read the
cultural-monuments point layers (CulturalMonumentsMapAnalysisData.cs:34
reads zoomN-points.fgb). This module implements the published FGB layout
directly (https://flatgeobuf.org / flatgeobuf.fbs — the field slots and
framing below were cross-checked against the reference's generated
bindings, /root/reference/FlatGeobuf/{Header,Feature,Geometry,Column}.cs
and Helpers.cs:25-60):

  magic 66 67 62 03 66 67 62 00 (first 4 bytes checked)
  | uint32 LE header length | flatbuffers Header
  | packed Hilbert R-tree index (iff index_node_size > 0;
    size per PackedRTree.CalcSize with 40-byte node items)
  | per feature: uint32 LE length | flatbuffers Feature

Flatbuffers tables are decoded with a minimal reader (root uoffset,
vtable slots, strings, vectors) — ~60 lines is all the format needs for
reading. Geometry support: Point and MultiPoint (the shapes the
reference consumes); properties decode per the schema column table
(bool/ints/floats/string/datetime — string-length corruption tolerated
the same way the reference does, FeatureConversions.cs:170-176).

Distribution model: one FGB file = one parallel unit (files are how the
reference shards too); `read_fgb_points` uses binaryFiles + flatMap so a
directory of FGB tiles parses across the cluster.
"""

from __future__ import annotations

import struct

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00])
NODE_ITEM_LEN = 40  # 4 float64 bbox + uint64 offset (PackedRTree.cs)

GEOM_POINT = 1
GEOM_MULTIPOINT = 4

# ColumnType.cs
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT = 0, 1, 2, 3, 4
CT_INT, CT_UINT, CT_LONG, CT_ULONG, CT_FLOAT, CT_DOUBLE = 5, 6, 7, 8, 9, 10
CT_STRING, CT_JSON, CT_DATETIME, CT_BINARY = 11, 12, 13, 14

_SCALAR_FMT = {
    CT_BYTE: ("<b", 1), CT_UBYTE: ("<B", 1), CT_BOOL: ("<?", 1),
    CT_SHORT: ("<h", 2), CT_USHORT: ("<H", 2), CT_INT: ("<i", 4),
    CT_UINT: ("<I", 4), CT_LONG: ("<q", 8), CT_ULONG: ("<Q", 8),
    CT_FLOAT: ("<f", 4), CT_DOUBLE: ("<d", 8),
}


# --------------------------------------------------------------------------
# minimal flatbuffers read primitives
# --------------------------------------------------------------------------


def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _i32(b, p):
    return struct.unpack_from("<i", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _root(b) -> int:
    return _u32(b, 0)


def _field(b, table: int, slot: int) -> int:
    """Absolute position of field `slot` (4 + 2*id), 0 if absent."""
    vtab = table - _i32(b, table)
    if slot >= _u16(b, vtab):
        return 0
    rel = _u16(b, vtab + slot)
    return table + rel if rel else 0


def _indirect(b, p) -> int:
    return p + _u32(b, p)


def _string(b, field_pos) -> str:
    p = _indirect(b, field_pos)
    n = _u32(b, p)
    return b[p + 4 : p + 4 + n].decode("utf-8")


def _vector(b, field_pos) -> tuple[int, int]:
    """(element_count, data_start)."""
    p = _indirect(b, field_pos)
    return _u32(b, p), p + 4


# --------------------------------------------------------------------------
# FGB structures
# --------------------------------------------------------------------------


def parse_header(b: bytes) -> dict:
    t = _root(b)
    out = {"name": None, "geometry_type": 0, "features_count": 0,
           "index_node_size": 16, "columns": []}
    p = _field(b, t, 4)
    if p:
        out["name"] = _string(b, p)
    p = _field(b, t, 8)
    if p:
        out["geometry_type"] = b[p]
    p = _field(b, t, 20)
    if p:
        out["features_count"] = struct.unpack_from("<Q", b, p)[0]
    p = _field(b, t, 22)
    if p:
        out["index_node_size"] = _u16(b, p)
    p = _field(b, t, 18)
    if p:
        n, data = _vector(b, p)
        for j in range(n):
            col_t = _indirect(b, data + 4 * j)
            name_p = _field(b, col_t, 4)
            type_p = _field(b, col_t, 6)
            out["columns"].append(
                (_string(b, name_p) if name_p else "",
                 b[type_p] if type_p else CT_BYTE)
            )
    return out


def rtree_size(num_items: int, node_size: int) -> int:
    """PackedRTree.CalcSize (Index/PackedRTree.cs:16-33)."""
    if num_items == 0:
        return 0
    node_size = min(max(node_size, 2), 65535)
    n = num_items
    num_nodes = n
    while True:  # do-while: even a single item gets a root level
        n = (n + node_size - 1) // node_size
        num_nodes += n
        if n == 1:
            break
    return num_nodes * NODE_ITEM_LEN


def _decode_properties(pb: bytes, columns: list[tuple[str, int]]) -> dict:
    """Per-column (uint16 index, value) stream (FeatureConversions.cs:120-182)."""
    out: dict[str, object] = {}
    pos = 0
    while pos < len(pb):
        (i,) = struct.unpack_from("<H", pb, pos)
        pos += 2
        name, ctype = columns[i]
        if ctype in _SCALAR_FMT:
            fmt, width = _SCALAR_FMT[ctype]
            (v,) = struct.unpack_from(fmt, pb, pos)
            pos += width
            out[name] = v
        elif ctype in (CT_STRING, CT_DATETIME, CT_JSON, CT_BINARY):
            (n,) = struct.unpack_from("<I", pb, pos)
            pos += 4
            if pos + n > len(pb):  # reference's corrupted-length tolerance
                out[name] = ""
                n = len(pb) - pos
            else:
                raw = pb[pos : pos + n]
                out[name] = raw if ctype == CT_BINARY else raw.decode("utf-8", "replace")
            pos += n
        else:
            raise ValueError(f"unknown column type {ctype}")
    return out


def parse_feature(b: bytes, columns) -> tuple[int, list[tuple[float, float]], dict]:
    """-> (geometry_type, [(x, y), ...], properties)."""
    t = _root(b)
    xy: list[tuple[float, float]] = []
    gtype = 0
    p = _field(b, t, 4)
    if p:
        g = _indirect(b, p)
        tp = _field(b, g, 16)
        if tp:
            gtype = b[tp]
        xp = _field(b, g, 6)
        if xp:
            n, data = _vector(b, xp)
            vals = struct.unpack_from(f"<{n}d", b, data)
            xy = [(vals[k], vals[k + 1]) for k in range(0, n, 2)]
    props: dict = {}
    pp = _field(b, t, 6)
    if pp:
        n, data = _vector(b, pp)
        props = _decode_properties(bytes(b[data : data + n]), columns)
    return gtype, xy, props


def parse_fgb(blob: bytes) -> tuple[dict, list[tuple[int, int, list, dict]]]:
    """Full file -> (header, [(feature_idx, geom_type, xy, props), ...])."""
    if blob[:4] != MAGIC[:4]:
        raise ValueError("Not a FlatGeobuf file")
    (header_len,) = struct.unpack_from("<I", blob, 8)
    hstart = 12
    header = parse_header(blob[hstart : hstart + header_len])
    pos = hstart + header_len
    if header["index_node_size"] > 0 and header["features_count"] > 0:
        pos += rtree_size(header["features_count"], header["index_node_size"])
    feats = []
    idx = 0
    while pos < len(blob):
        (flen,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        gtype, xy, props = parse_feature(blob[pos : pos + flen], header["columns"])
        feats.append((idx, gtype, xy, props))
        pos += flen
        idx += 1
    return header, feats


def read_fgb_points(spark, path: str):
    """Directory/glob of point-geometry .fgb files -> DataFrame
    (file, feature_idx, lat, lon, properties map<string,string>).

    FGB stores x=longitude, y=latitude. MultiPoints explode to one row
    per point. One file parses in one task — shard datasets into tile
    files (the reference's zoomN-points.fgb layout) for parallelism.
    """
    rdd = spark.sparkContext.binaryFiles(path)

    def explode(kv):
        fname, blob = kv
        _, feats = parse_fgb(bytes(blob))
        for idx, gtype, xy, props in feats:
            if gtype not in (GEOM_POINT, GEOM_MULTIPOINT, 0):
                raise NotImplementedError(
                    f"geometry type {gtype} not supported by read_fgb_points"
                )
            for x, y in xy:
                yield (fname, idx, y, x, {k: str(v) for k, v in props.items()})

    return spark.createDataFrame(
        rdd.flatMap(explode),
        "file string, feature_idx int, lat double, lon double, "
        "properties map<string,string>",
    )


# --------------------------------------------------------------------------
# minimal writer (tests + tile export) — same layout, forward-building
# flatbuffers with patched forward uoffsets
# --------------------------------------------------------------------------


class _FB:
    """Tiny forward-building flatbuffers writer: root table first, children
    appended after with their uoffsets patched in (all offsets in the wire
    format point forward, so parent-before-child works)."""

    def __init__(self):
        self.buf = bytearray(4)  # root uoffset placeholder
        self.patches: list[tuple[int, "._Pending"]] = []

    def _align(self, a: int):
        while len(self.buf) % a:
            self.buf.append(0)

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """fields: (slot_id, kind, value); kind in {scalar fmts like '<B',
        '<Q','<H'} or 'offset' (value = callable writing the child and
        returning its absolute position). Returns table position."""
        # plan table layout: i32 soffset at 0, then fields in given order
        layout = []  # (slot, kind, value, rel_off)
        rel = 4
        for slot, kind, value in fields:
            size = 4 if kind == "offset" else struct.calcsize(kind)
            rel = (rel + size - 1) // size * size
            layout.append((slot, kind, value, rel))
            rel += size
        table_size = rel
        max_slot = max(s for s, _, _, _ in layout)
        vt_size = 4 + 2 * ((max_slot - 4) // 2 + 1)
        self._align(2)
        vt_pos = len(self.buf)
        self.buf += struct.pack("<HH", vt_size, table_size)
        slots = {s: r for s, _, _, r in layout}
        for slot in range(4, max_slot + 2, 2):
            self.buf += struct.pack("<H", slots.get(slot, 0))
        self._align(4)
        t_pos = len(self.buf)
        self.buf += bytes(table_size)
        struct.pack_into("<i", self.buf, t_pos, t_pos - vt_pos)
        for slot, kind, value, r in layout:
            if kind == "offset":
                self.patches.append((t_pos + r, value))
            else:
                struct.pack_into(kind, self.buf, t_pos + r, value)
        return t_pos

    def run_patches(self):
        # children appended breadth-first; a child writer may add more
        while self.patches:
            field_pos, writer = self.patches.pop(0)
            child_pos = writer()
            struct.pack_into("<I", self.buf, field_pos, child_pos - field_pos)

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        self._align(4)
        p = len(self.buf)
        self.buf += struct.pack("<I", len(data)) + data + b"\0"
        return p

    def vector(self, fmt: str, values) -> int:
        esize = struct.calcsize(fmt)
        self._align(max(4, esize))
        # length prefix must sit directly before data; re-align so DATA is
        # aligned (prefix at data-4)
        while (len(self.buf) + 4) % esize:
            self.buf.append(0)
        p = len(self.buf)
        self.buf += struct.pack("<I", len(values))
        for v in values:
            self.buf += struct.pack(fmt, v)
        return p

    def byte_vector(self, data: bytes) -> int:
        self._align(4)
        p = len(self.buf)
        self.buf += struct.pack("<I", len(data)) + data
        return p

    def offset_vector(self, writers) -> int:
        self._align(4)
        p = len(self.buf)
        self.buf += struct.pack("<I", len(writers)) + bytes(4 * len(writers))
        for j, w in enumerate(writers):
            self.patches.append((p + 4 + 4 * j, w))
        return p

    def finish(self, root_pos: int) -> bytes:
        self.run_patches()
        struct.pack_into("<I", self.buf, 0, root_pos)
        return bytes(self.buf)


def _encode_properties(props: dict, columns: list[tuple[str, int]]) -> bytes:
    out = bytearray()
    index = {name: (i, t) for i, (name, t) in enumerate(columns)}
    for k, v in props.items():
        i, ctype = index[k]
        out += struct.pack("<H", i)
        if ctype in _SCALAR_FMT:
            out += struct.pack(_SCALAR_FMT[ctype][0], v)
        else:
            data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(data)) + data
    return bytes(out)


def write_fgb_points(
    points: list[tuple[float, float, dict]],
    columns: list[tuple[str, int]],
    name: str = "points",
) -> bytes:
    """(x=lon, y=lat, props) rows -> FGB bytes (Point geometry, no spatial
    index: index_node_size=0, which the reader honors)."""
    fb = _FB()
    header_pos = fb.table(
        [
            (4, "offset", lambda: fb.string(name)),
            (8, "<B", GEOM_POINT),
            (18, "offset", lambda: fb.offset_vector(
                [
                    (lambda nm=nm, ct=ct: fb.table(
                        [(4, "offset", lambda nm=nm: fb.string(nm)), (6, "<B", ct)]
                    ))
                    for nm, ct in columns
                ]
            )),
            (20, "<Q", len(points)),
            (22, "<H", 0),  # no index
        ]
    )
    header = fb.finish(header_pos)
    out = bytearray(MAGIC)
    out += struct.pack("<I", len(header))
    out += header
    for x, y, props in points:
        ffb = _FB()
        pb = _encode_properties(props, columns)
        f_pos = ffb.table(
            [
                (4, "offset", lambda: ffb.table(
                    [
                        (6, "offset", lambda: ffb.vector("<d", [x, y])),
                        (16, "<B", GEOM_POINT),
                    ]
                )),
                (6, "offset", lambda: ffb.byte_vector(pb)),
            ]
        )
        fbytes = ffb.finish(f_pos)
        out += struct.pack("<I", len(fbytes)) + fbytes
    return bytes(out)
