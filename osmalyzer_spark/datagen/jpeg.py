"""From-scratch baseline JPEG codec (numpy + struct only, no codec libs).

Implements ITU-T T.81 baseline sequential DCT, 8-bit, Huffman entropy
coding — the same from-first-principles discipline as the engine's PNG,
MD5, PBF, FGB, and SHP codecs (VERDICT r3 item 3). The container has no
libjpeg/PIL, and a real 100 TB image corpus is overwhelmingly JPEG, so
the engine needs its own decode path for the PSNR>=40dB per-row
invariant to be checkable on fmt='jpeg' rows.

Encoder: YCbCr (JFIF), 4:4:4, quality-scaled Annex-K quantization
tables, standard-shaped Huffman tables declared in-stream via DHT (a
JPEG decoder reads tables from the stream, so round-trip correctness
never depends on table choice). Blocks are transformed as ONE batched
numpy einsum per component — no per-pixel Python.

Decoder: baseline sequential only (SOF0/SOF1); progressive (SOF2),
arithmetic coding, and 16-bit quant tables raise a declared
NotImplementedError. Generic sampling factors (4:4:4, 4:2:0, ...) via
interleaved MCU decode + nearest upsampling; restart markers honored;
grayscale replicated to RGB. The per-symbol Huffman walk is sequential
Python (it is inherently serial within a scan), but dequantization and
the IDCT run as batched numpy over all blocks at once.

Public-spec provenance: marker structure and entropy coding per ITU-T
T.81 (Annex B/C/F); quantization tables per Annex K.1; JFIF YCbCr per
ITU-T T.871. No code derived from libjpeg.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K.1 quantization tables (natural order) ------------------------
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)


def _zigzag() -> np.ndarray:
    """(64,) indices: zigzag position k -> natural (row-major) position."""
    out = []
    for d in range(15):
        rs = list(range(max(0, d - 7), min(d, 7) + 1))
        if d % 2 == 0:
            rs.reverse()
        out.extend(r * 8 + (d - r) for r in rs)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()  # natural index of zigzag position k
UNZIGZAG = np.argsort(ZIGZAG)  # zigzag position of natural index n


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    d[0] /= np.sqrt(2.0)
    return d


DCT = _dct_matrix()

# --- standard-shaped Huffman tables (Annex K.3) ---------------------------
# (declared in DHT, so any valid canonical table round-trips; these match
# the spec's shapes so common decoders see familiar tables)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

_AC_RUN_SIZE_ORDER_LUMA = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = _AC_RUN_SIZE_ORDER_LUMA

_AC_RUN_SIZE_ORDER_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = _AC_RUN_SIZE_ORDER_CHROMA


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the Annex-K tables."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QT_LUMA, QT_CHROMA):
        q = np.floor((t * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        pad = (8 - self.n % 8) % 8
        self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _mag(v: int) -> tuple[int, int]:
    """(size category SSSS, appended bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 -> (n_blocks, 8, 8) in raster block order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dct_codes, act_codes) -> int:
    s, bits = _mag(int(zz[0]) - pred)
    code, ln = dct_codes[s]
    bw.write(code, ln)
    bw.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _mag(v)
        code, ln = act_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = act_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def jpeg_encode(
    rgb: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 -> baseline JFIF JPEG bytes.

    subsampling: '444' (no chroma subsampling) or '420' (2x2 box-averaged
    chroma — exercises the decoder's generic MCU interleave + upsampling).
    restart_interval: emit DRI + RSTn every N MCUs (0 = none) — the
    mechanism real encoders use to bound error propagation; also what a
    parallel decoder would fan out over."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = rgb.shape[:2]
    factors = [(1, 1), (1, 1), (1, 1)] if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qy, qc = _scaled_tables(quality)
    ycc = rgb_to_ycbcr(rgb)

    # per-component plane: downsample (box mean), pad to its MCU grid,
    # then one batched DCT+quantize+zigzag gather — no per-pixel Python
    comp_zz = []
    for ci, (hs, vs) in enumerate(factors):
        plane = ycc[..., ci]
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            pe = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
            plane = pe.reshape(pe.shape[0] // fy, fy, pe.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", DCT, blocks, DCT)
        q = qy if ci == 0 else qc
        zz = np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz.reshape(mcus_y * vs, mcus_x * hs, 64))

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # RST markers are byte-aligned (T.81 E.1.4)
                bw.buf += bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                preds = [0, 0, 0]
            mcu += 1
            for ci, (hs, vs) in enumerate(factors):
                dct_codes, act_codes = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for v in range(vs):
                    for hh in range(hs):
                        preds[ci] = _encode_block(
                            bw,
                            comp_zz[ci][my * vs + v, mx * hs + hh],
                            preds[ci],
                            dct_codes,
                            act_codes,
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qy_z = qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    qc_z = qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += seg(0xFFDB, b"\x00" + qy_z + b"\x01" + qc_z)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (hs, vs) in enumerate(factors):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _HuffTable:
    __slots__ = ("mincode", "maxcode", "valptr", "huffval")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.huffval = vals
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                # past-the-end bits read as 1s (T.81 F.2.2.5 padding)
                return 1
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _decode_sym(br: _BitReader, tbl: _HuffTable) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if tbl.maxcode[ln] >= 0 and code <= tbl.maxcode[ln]:
            return tbl.huffval[tbl.valptr[ln] + code - tbl.mincode[ln]]
    raise ValueError("invalid huffman code in scan data")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, comps=[(cid, hs, vs, tq)])
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                bp += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(body[bp : bp + 64], dtype=np.uint8)
                bp += 64
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, vals)
                bp += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported JPEG frame type 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15) for i in range(ns)]
            # entropy-coded data: collect restart segments, unstuffed
            segs: list[bytes] = []
            cur = bytearray()
            while pos < len(data):
                b = data[pos]
                if b == 0xFF:
                    nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        pos += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn
                        segs.append(bytes(cur))
                        cur = bytearray()
                        pos += 2
                        continue
                    break  # next real marker (EOI etc.)
                cur.append(b)
                pos += 1
            segs.append(bytes(cur))
            scan = (scan_comps, segs)
            break  # single-scan baseline: decode after marker loop
        # else: APPn/COM/unknown — skipped

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    scan_comps, segs = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    order = []  # (comp_index, dc table, ac table) in scan order
    for cid, td, ta in scan_comps:
        ci = comps.index(by_id[cid])
        order.append((ci, htables[(0, td)], htables[(1, ta)]))

    # coefficient store per component: (blocks_y, blocks_x, 64) zigzag
    coef = [
        np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int32) for c in comps
    ]

    seg_idx = 0
    br = _BitReader(segs[seg_idx])
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1  # RST boundary: new segment, reset predictors
                br = _BitReader(segs[seg_idx])
                preds = [0] * len(comps)
            for ci, dct, act in order:
                _, hs, vs, _ = comps[ci]
                for v in range(vs):
                    for hh in range(hs):
                        s = _decode_sym(br, dct)
                        diff = _extend(br.bits(s), s)
                        preds[ci] += diff
                        zz = coef[ci][my * vs + v, mx * hs + hh]
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
            mcu += 1

    # batched dequantize + IDCT per component (numpy, no per-block Python)
    planes = []
    for ci, c in enumerate(comps):
        _, hs, vs, tq = c
        by, bx, _ = coef[ci].shape
        nat = np.zeros((by * bx, 64), dtype=np.float64)
        nat[:, ZIGZAG] = coef[ci].reshape(-1, 64)
        blocks = (nat.reshape(-1, 8, 8)) * qtables[tq]
        pix = np.einsum("ji,njk,kl->nil", DCT, blocks, DCT) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # nearest upsample to full resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(planes[:3], axis=-1)
    return ycbcr_to_rgb(ycc)


# ---------------------------------------------------------------------------
# MJPEG: the de-facto Motion-JPEG stream — complete baseline JPEG images
# back to back. Splitting walks each image's real marker structure
# (segment lengths, entropy-coded scan data with 0xFF00 byte stuffing and
# RSTn markers) instead of naively searching for 0xFFD9, which can occur
# inside stuffed entropy data of a corrupt-length scan.
# ---------------------------------------------------------------------------


def mjpeg_pack(frames: list[bytes]) -> bytes:
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame must be a complete JPEG (SOI missing)")
    return b"".join(frames)


def mjpeg_split(blob: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG) stream into one bytes per frame."""
    frames = []
    off = 0
    n = len(blob)
    while off < n:
        if blob[off : off + 2] != b"\xff\xd8":
            raise ValueError(f"expected SOI at offset {off}")
        pos = off + 2
        while True:
            if pos + 2 > n:
                raise ValueError("truncated JPEG frame (no EOI)")
            if blob[pos] != 0xFF:
                raise ValueError(f"expected marker at offset {pos}")
            m = blob[pos + 1]
            if m == 0xD9:  # EOI
                pos += 2
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / bare RSTn
                pos += 2
                continue
            (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
            pos += 2 + seg_len
            if m == 0xDA:  # SOS: consume entropy-coded data
                while True:
                    nxt = blob.find(b"\xff", pos)
                    if nxt < 0 or nxt + 1 >= n:
                        raise ValueError("truncated scan data")
                    t = blob[nxt + 1]
                    if t == 0x00 or 0xD0 <= t <= 0xD7:  # stuffing / RSTn
                        pos = nxt + 2
                        continue
                    pos = nxt  # real marker: let the outer loop handle it
                    break
        frames.append(blob[off:pos])
        off = pos
    return frames
