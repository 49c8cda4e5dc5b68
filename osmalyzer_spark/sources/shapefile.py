"""From-scratch ESRI Shapefile reader (.shp / .shx / .dbf / .prj) — S7.

The reference ingests government geodata shapefiles via NetTopologySuite's
ShapefileDataReader and reprojects with ProjNet (Osmalyzer/Data/Misc Data
Fetchers/MicroReserveAnalysisData.cs:72-146: .prj WKT -> WGS84 transform,
per-record geometry -> Centroid, plus the .dbf attribute columns it dumps
and reads typed values from). This module re-implements the container
formats directly from the public ESRI Shapefile Technical Description
(July 1998) and the dBase III header layout — no third-party parser.

Distribution follows the repo's PBF/FGB pattern (sources/osmpbf.py,
sources/flatgeobuf.py): the driver reads only the fixed-size headers plus
the tiny .shx record index (8 bytes/record), slices the record space into
ranges, and each executor task seeks straight to its byte ranges in .shp
and .dbf. A single .shp is capped at 4 GB by the format (32-bit word
offsets), so at 100 TB the scale unit is many shapefiles; `read_shapefile`
accepts a list of base paths and parallelizes across (file, record-range).

Geometry handling matches the reference's use: XY coordinates of Point /
MultiPoint / PolyLine / Polygon records (Z/M variants parsed by skipping
the trailing Z/M arrays), per-record signed-area centroid (holes carry
opposite ring orientation, so the signed accumulation subtracts them —
the same convention NetTopologySuite's Geometry.Centroid uses), and the
.prj WKT driving an LKS-92 -> WGS84 reprojection via geo/proj.py.
"""

from __future__ import annotations

import os
import re
import struct

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8

# Z/M variants share the XY layout with trailing Z/M arrays we skip
_POINT_TYPES = {1, 11, 21}
_MULTIPOINT_TYPES = {8, 18, 28}
_POLYLINE_TYPES = {3, 13, 23}
_POLYGON_TYPES = {5, 15, 25}

_SCHEMA = (
    "fid long, stype int, x double, y double, cx double, cy double, "
    "area double, n_points int, rings array<array<struct<x:double,y:double>>>, "
    "attrs map<string,string>"
)


def shape_area(stype: int, parts: list[list[tuple[float, float]]]) -> float:
    """Planar polygon area in source-CRS units² (holes subtract via ring
    orientation — NTS Geometry.Area semantics, which the reference stores
    per reserve, MicroReserveAnalysisData.cs:224); 0 for non-polygons."""
    if stype not in _POLYGON_TYPES or not parts:
        return 0.0
    a2 = 0.0
    for ring in parts:
        for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
            a2 += x0 * y1 - x1 * y0
    return abs(a2) / 2.0


# --------------------------------------------------------------------------
# .shx / .shp
# --------------------------------------------------------------------------


def read_shx_index(path: str) -> list[tuple[int, int]]:
    """-> [(byte_offset, content_bytes)] per record (driver-side, tiny)."""
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: bad shapefile magic (expected 9994)")
    out = []
    for p in range(100, len(data) - 7, 8):
        off_w, len_w = struct.unpack(">ii", data[p : p + 8])
        out.append((off_w * 2, len_w * 2))
    return out


def scan_shp_index(path: str) -> list[tuple[int, int]]:
    """Fallback when .shx is absent: walk the record headers (header-only
    reads, still O(#records) seeks but no geometry decode)."""
    size = os.path.getsize(path)
    out = []
    with open(path, "rb") as f:
        magic = struct.unpack(">i", f.read(4))[0]
        if magic != 9994:
            raise ValueError(f"{path}: bad shapefile magic (expected 9994)")
        pos = 100
        while pos + 8 <= size:
            f.seek(pos)
            _recno, len_w = struct.unpack(">ii", f.read(8))
            out.append((pos, len_w * 2))
            pos += 8 + len_w * 2
    return out


def decode_shp_record(content: bytes) -> tuple[int, list[list[tuple[float, float]]]]:
    """Record content (after the 8-byte record header) -> (shape_type, parts).

    parts is a list of coordinate sequences; a Point yields one 1-element
    part. Null shapes yield []. Z/M payloads trail the XY block and are
    skipped (the content length bounds them out).
    """
    (stype,) = struct.unpack("<i", content[0:4])
    if stype == SHAPE_NULL:
        return stype, []
    if stype in _POINT_TYPES:
        x, y = struct.unpack("<2d", content[4:20])
        return stype, [[(x, y)]]
    if stype in _MULTIPOINT_TYPES:
        (n,) = struct.unpack("<i", content[36:40])
        pts = struct.unpack(f"<{2 * n}d", content[40 : 40 + 16 * n])
        return stype, [[(pts[2 * i], pts[2 * i + 1]) for i in range(n)]]
    if stype in _POLYLINE_TYPES or stype in _POLYGON_TYPES:
        nparts, npoints = struct.unpack("<2i", content[36:44])
        parts_idx = struct.unpack(f"<{nparts}i", content[44 : 44 + 4 * nparts])
        base = 44 + 4 * nparts
        flat = struct.unpack(f"<{2 * npoints}d", content[base : base + 16 * npoints])
        bounds = list(parts_idx) + [npoints]
        return stype, [
            [(flat[2 * i], flat[2 * i + 1]) for i in range(bounds[k], bounds[k + 1])]
            for k in range(nparts)
        ]
    raise ValueError(f"unsupported shape type {stype}")


def shape_centroid(
    stype: int, parts: list[list[tuple[float, float]]]
) -> tuple[float, float] | None:
    """Centroid with the reference's (NTS Geometry.Centroid) semantics:
    area centroid for polygons (signed accumulation — CW outer rings and
    CCW holes cancel correctly), length-weighted for polylines, mean for
    points/multipoints."""
    if not parts:
        return None
    if stype in _POINT_TYPES or stype in _MULTIPOINT_TYPES:
        pts = parts[0]
        return (
            sum(p[0] for p in pts) / len(pts),
            sum(p[1] for p in pts) / len(pts),
        )
    if stype in _POLYGON_TYPES:
        a2 = cx = cy = 0.0
        for ring in parts:
            for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
                cross = x0 * y1 - x1 * y0
                a2 += cross
                cx += (x0 + x1) * cross
                cy += (y0 + y1) * cross
        if abs(a2) < 1e-12:  # degenerate: fall back to vertex mean
            pts = [p for ring in parts for p in ring]
            return (
                sum(p[0] for p in pts) / len(pts),
                sum(p[1] for p in pts) / len(pts),
            )
        return cx / (3.0 * a2), cy / (3.0 * a2)
    # polyline: length-weighted segment midpoints
    total = cx = cy = 0.0
    for ring in parts:
        for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
            seg = ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
            total += seg
            cx += seg * (x0 + x1) / 2.0
            cy += seg * (y0 + y1) / 2.0
    if total < 1e-12:
        p = parts[0][0]
        return p
    return cx / total, cy / total


# --------------------------------------------------------------------------
# .dbf (dBase III)
# --------------------------------------------------------------------------


def read_dbf_header(path: str) -> tuple[list[tuple[str, str, int, int]], int, int, int]:
    """-> (fields, n_records, header_size, record_size); fields are
    (name, type_char, length, decimals)."""
    with open(path, "rb") as f:
        head = f.read(32)
        n_rec, hdr_size, rec_size = struct.unpack("<IHH", head[4:12])
        fields = []
        raw = f.read(hdr_size - 32)
    p = 0
    while p + 32 <= len(raw) and raw[p] != 0x0D:
        name = raw[p : p + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[p + 11])
        flen = raw[p + 16]
        fdec = raw[p + 17]
        fields.append((name, ftype, flen, fdec))
        p += 32
    return fields, n_rec, hdr_size, rec_size


def decode_dbf_record(
    rec: bytes, fields: list[tuple[str, str, int, int]], encoding: str = "cp1257"
) -> dict[str, str] | None:
    """One fixed-width record -> {name: string value}; None if deleted.

    Values stay strings (the reference dumps them as strings and casts the
    two it uses, MicroReserveAnalysisData.cs:155-157); numeric parsing is
    the consumer's cast, exactly as there.
    """
    if rec[0:1] == b"*":
        return None
    out: dict[str, str] = {}
    p = 1
    for name, ftype, flen, _fdec in fields:
        v = rec[p : p + flen].decode(encoding, "replace").strip()
        p += flen
        out[name] = v
    return out


# --------------------------------------------------------------------------
# .prj
# --------------------------------------------------------------------------

# LKS-92 / Latvia TM (EPSG:3059) projection parameters, matched against
# the .prj WKT the way the reference feeds it to ProjNet
_LKS92_PARAMS = {
    "latitude_of_origin": 0.0,
    "central_meridian": 24.0,
    "scale_factor": 0.9996,
    "false_easting": 500000.0,
    "false_northing": -6000000.0,
}


def parse_prj(wkt: str) -> str:
    """Classify the .prj WKT: 'lks92' | 'wgs84'. Anything else raises —
    silently misprojecting coordinates is worse than failing."""
    if re.match(r"\s*GEOGCS", wkt):
        if "WGS" in wkt and "84" in wkt:
            return "wgs84"
        raise ValueError(f"unsupported geographic CRS in .prj: {wkt[:80]}...")
    m = re.search(r'PROJECTION\["([^"]+)"\]', wkt)
    if not m or m.group(1).lower() not in ("transverse_mercator",):
        raise ValueError(f"unsupported projection in .prj: {wkt[:80]}...")
    params = {
        k.lower(): float(v)
        for k, v in re.findall(r'PARAMETER\["([^"]+)",\s*([-\d.eE]+)\]', wkt)
    }
    for k, want in _LKS92_PARAMS.items():
        got = params.get(k)
        if got is None or abs(got - want) > 1e-6 * max(1.0, abs(want)):
            raise ValueError(
                f"Transverse Mercator .prj is not LKS-92: {k}={got} (want {want})"
            )
    return "lks92"


# --------------------------------------------------------------------------
# Spark reader
# --------------------------------------------------------------------------


def read_shapefile(
    spark,
    base_paths: str | list[str],
    encoding: str = "cp1257",
    records_per_task: int = 4096,
    to_wgs84: bool | None = None,
):
    """-> DataFrame(fid, stype, x, y, cx, cy, area, n_points, rings, attrs).

    `base_paths`: one or many shapefile base paths (with or without .shp).
    Point records fill (x, y); all records fill the centroid (cx, cy) and
    `rings` (parts in file order, XY in the source CRS). `attrs` carries
    the .dbf columns as strings. With to_wgs84 (default: auto from .prj),
    x/y/cx/cy are reprojected to WGS84 lon/lat; rings stay in source CRS
    (the reference also only transforms the centroid,
    MicroReserveAnalysisData.cs:218-221).

    Driver work is headers + .shx only; geometry and attribute bytes are
    read and decoded inside executor tasks, one task per record range.
    """
    if isinstance(base_paths, str):
        base_paths = [base_paths]

    tasks = []  # (shp_path, dbf_path|None, crs, fields, hdr, rec_size, lo, hi, index_slice)
    for base in base_paths:
        base = re.sub(r"\.shp$", "", base)
        shp, shx, dbf, prj = (base + e for e in (".shp", ".shx", ".dbf", ".prj"))
        index = read_shx_index(shx) if os.path.exists(shx) else scan_shp_index(shp)
        crs = "none"
        if os.path.exists(prj):
            with open(prj, "r", encoding="utf-8") as f:
                crs = parse_prj(f.read())
        elif to_wgs84 is True:
            # caller explicitly asked for WGS84 but the source CRS is
            # unknown — same policy as parse_prj: silently misprojecting
            # (returning source-CRS coordinates as if they were WGS84) is
            # worse than failing
            raise ValueError(
                f"{base}: to_wgs84=True but no .prj sidecar — source CRS unknown"
            )
        fields: list[tuple[str, str, int, int]] = []
        hdr_size = rec_size = 0
        if os.path.exists(dbf):
            fields, n_rec, hdr_size, rec_size = read_dbf_header(dbf)
            if n_rec != len(index):
                raise ValueError(
                    f"{base}: .dbf has {n_rec} records but .shp has {len(index)}"
                )
        else:
            dbf = None
        for lo in range(0, len(index), records_per_task):
            hi = min(lo + records_per_task, len(index))
            tasks.append(
                (shp, dbf, crs, fields, hdr_size, rec_size, lo, hi, index[lo:hi])
            )

    want_wgs84 = to_wgs84
    n_slices = max(1, min(len(tasks), 256))

    def decode_range(task):
        import numpy as np

        from osmalyzer_spark.geo.proj import lks92_inverse

        shp, dbf, crs, fields, hdr_size, rec_size, lo, hi, idx = task
        rows = []
        with open(shp, "rb") as f:
            for k, (off, clen) in enumerate(idx):
                f.seek(off + 8)  # skip the 8-byte record header
                stype, parts = decode_shp_record(f.read(clen))
                cent = shape_centroid(stype, parts)
                x, y = (parts[0][0] if stype in _POINT_TYPES and parts else (None, None))
                npts = sum(len(p) for p in parts)
                rows.append(
                    [lo + k + 1, stype, x, y,
                     cent[0] if cent else None, cent[1] if cent else None,
                     shape_area(stype, parts),
                     npts, [[(px, py) for px, py in p] for p in parts], None]
                )
        if dbf is not None:
            with open(dbf, "rb") as f:
                f.seek(hdr_size + lo * rec_size)
                blob = f.read((hi - lo) * rec_size)
            for k in range(hi - lo):
                rows[k][9] = decode_dbf_record(
                    blob[k * rec_size : (k + 1) * rec_size], fields, encoding
                )
        do_wgs84 = want_wgs84 if want_wgs84 is not None else (crs == "lks92")
        if do_wgs84 and crs == "lks92":
            for r in rows:
                for xi, yi in ((2, 3), (4, 5)):
                    if r[xi] is not None:
                        lat, lon = lks92_inverse(
                            np.array([r[xi]]), np.array([r[yi]])
                        )
                        r[xi], r[yi] = float(lon[0]), float(lat[0])
        return [tuple(r) for r in rows]

    rdd = spark.sparkContext.parallelize(tasks, n_slices).flatMap(decode_range)
    return spark.createDataFrame(rdd, _SCHEMA)


# --------------------------------------------------------------------------
# Spec-faithful writer (test fixture generator, like write_fgb_points /
# the PBF test writer — lets round-trip tests exist without external data)
# --------------------------------------------------------------------------

LKS92_WKT = (
    'PROJCS["LKS_1992_Latvia_TM",GEOGCS["GCS_LKS_1992",DATUM["D_Latvia_1992",'
    'SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",-6000000.0],'
    'PARAMETER["Central_Meridian",24.0],PARAMETER["Scale_Factor",0.9996],'
    'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
)


def _encode_shape(stype: int, parts: list[list[tuple[float, float]]]) -> bytes:
    if stype == SHAPE_NULL or not parts:
        return struct.pack("<i", SHAPE_NULL)
    if stype in _POINT_TYPES:
        (x, y) = parts[0][0]
        return struct.pack("<i2d", SHAPE_POINT, x, y)
    flat = [c for p in parts for pt in p for c in pt]
    xs, ys = flat[0::2], flat[1::2]
    bbox = (min(xs), min(ys), max(xs), max(ys))
    if stype in _MULTIPOINT_TYPES:
        n = len(xs)
        return struct.pack(f"<i4di{2 * n}d", SHAPE_MULTIPOINT, *bbox, n, *flat)
    st = SHAPE_POLYGON if stype in _POLYGON_TYPES else SHAPE_POLYLINE
    starts, acc = [], 0
    for p in parts:
        starts.append(acc)
        acc += len(p)
    return struct.pack(
        f"<i4d2i{len(parts)}i{2 * acc}d",
        st, *bbox, len(parts), acc, *starts, *flat,
    )


def write_shapefile(
    base_path: str,
    shapes: list[tuple[int, list[list[tuple[float, float]]]]],
    attrs: list[dict] | None = None,
    fields: list[tuple[str, str, int, int]] | None = None,
    prj_wkt: str | None = None,
    encoding: str = "cp1257",
) -> None:
    """Write .shp/.shx/.dbf (and .prj if given) per the ESRI spec."""
    recs = [_encode_shape(st, parts) for st, parts in shapes]
    all_pts = [
        pt for _st, parts in shapes for p in parts for pt in p
    ] or [(0.0, 0.0)]
    bbox = (
        min(p[0] for p in all_pts), min(p[1] for p in all_pts),
        max(p[0] for p in all_pts), max(p[1] for p in all_pts),
    )
    total = 100 + sum(8 + len(r) for r in recs)

    def header(file_bytes: int, stype: int) -> bytes:
        return (
            struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", file_bytes // 2)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    main_type = next((st for st, p in shapes if st != SHAPE_NULL), SHAPE_NULL)
    with open(base_path + ".shp", "wb") as f:
        f.write(header(total, main_type))
        off = 100
        offsets = []
        for i, r in enumerate(recs):
            offsets.append((off // 2, len(r) // 2))
            f.write(struct.pack(">2i", i + 1, len(r) // 2))
            f.write(r)
            off += 8 + len(r)
    with open(base_path + ".shx", "wb") as f:
        f.write(header(100 + 8 * len(recs), main_type))
        for ow, lw in offsets:
            f.write(struct.pack(">2i", ow, lw))
    if attrs is not None:
        if fields is None:
            names = list(attrs[0].keys()) if attrs else []
            fields = [(n, "C", 32, 0) for n in names]
        rec_size = 1 + sum(f[2] for f in fields)
        hdr_size = 32 + 32 * len(fields) + 1
        with open(base_path + ".dbf", "wb") as f:
            f.write(
                struct.pack(
                    "<4BIHH", 0x03, 24, 1, 1, len(attrs), hdr_size, rec_size
                )
                + b"\x00" * 20
            )
            for name, ftype, flen, fdec in fields:
                f.write(
                    name.encode("ascii")[:11].ljust(11, b"\x00")
                    + ftype.encode("ascii")
                    + b"\x00" * 4
                    + struct.pack("<2B", flen, fdec)
                    + b"\x00" * 14
                )
            f.write(b"\x0d")
            for a in attrs:
                f.write(b" ")
                for name, ftype, flen, fdec in fields:
                    v = a.get(name, "")
                    if ftype in ("N", "F") and not isinstance(v, str):
                        v = f"{v:.{fdec}f}" if fdec else str(int(v))
                        v = v.rjust(flen)
                    else:
                        v = str(v).ljust(flen)
                    f.write(v.encode(encoding, "replace")[:flen].ljust(flen, b" "))
            f.write(b"\x1a")
    if prj_wkt is not None:
        with open(base_path + ".prj", "w", encoding="utf-8") as f:
            f.write(prj_wkt)
