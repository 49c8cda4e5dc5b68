"""Minimal deterministic PNG codec (stdlib zlib + struct only).

The container has no imaging libraries; the engine's image payloads are
tiny synthesized PNGs (8-bit RGB, filter 0 on every scanline). The decoder
handles exactly what the encoder emits plus any standard filter-0 RGB PNG.
Lossless, so the per-row pixel invariant (PSNR >= 40 dB, here infinite)
is checkable end-to-end without PIL.

JPEG rows decode through the engine's own from-scratch baseline codec
(datagen/jpeg.py, round 4) — the PSNR invariant is checkable on the
dominant real-corpus format too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 -> PNG bytes (8-bit RGB, filter 0)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode filter-0 8-bit RGB PNG -> (h, w, 3) uint8."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos = len(_SIG)
    w = h = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG supported")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + 3 * w
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    pix = rows[:, 1:].reshape(h, w, 3)
    if not (filters == 0).all():
        raise NotImplementedError(
            "only filter-0 scanlines supported (all PNGs produced by this "
            "engine's encoder use filter 0)"
        )
    return np.ascontiguousarray(pix)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "jpeg":
        from osmalyzer_spark.datagen.jpeg import jpeg_decode

        return jpeg_decode(bytes(data))
    raise ValueError(f"unknown image format {fmt!r}")


def decode_images_batch(datas, fmts) -> list[np.ndarray]:
    """Decode an Arrow batch worth of images, pooling same-configuration
    JPEGs through the lane-parallel batch decoder (datagen/jpeg.py
    jpeg_decode_batch); PNGs decode per image (already vectorized per
    scanline pass). Same bits as decode_image row by row."""
    from osmalyzer_spark.datagen.jpeg import jpeg_decode_batch

    out: list[np.ndarray | None] = [None] * len(datas)
    jpeg_idx = []
    jpeg_data = []
    for i, (d, f) in enumerate(zip(datas, fmts)):
        if f == "jpeg":
            jpeg_idx.append(i)
            jpeg_data.append(bytes(d))
        else:
            out[i] = decode_image(bytes(d), f)
    if jpeg_idx:
        for i, px in zip(jpeg_idx, jpeg_decode_batch(jpeg_data)):
            out[i] = px
    return out  # type: ignore[return-value]


def image_dims(data: bytes, fmt: str) -> tuple[int, int]:
    """(w, h) from the container header alone — no pixel decode.

    PNG: IHDR fields; JPEG: marker walk to SOF. Frame sampling and
    catalog passes need only dimensions, and a full entropy decode for
    metadata is exactly the kind of hidden 100 TB cost this avoids."""
    data = bytes(data)
    if fmt == "png":
        if not data.startswith(_SIG) or data[12:16] != b"IHDR":
            raise ValueError("not a PNG")
        w, h = struct.unpack_from(">II", data, 16)
        return int(w), int(h)
    if fmt == "jpeg":
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (no SOI)")
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            marker = data[pos + 1]
            pos += 2
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                continue
            (seglen,) = struct.unpack_from(">H", data, pos)
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                _prec, h, w = struct.unpack_from(">BHH", data, pos + 2)
                return int(w), int(h)
            pos += seglen
        raise ValueError("no SOF marker before end of stream")
    raise ValueError(f"unknown image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
