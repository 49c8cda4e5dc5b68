"""Deterministic raw media containers for multimodal plumbing tests.

No video/audio codec libraries exist in this container, so the engine
defines two trivial but REAL binary container formats — the Spark-side
plumbing (schemas, Arrow batching, explode shapes, feature math) is
exercised end-to-end; only the compressed-codec decode (h264/jpeg/mp3)
remains a declared stub in multimodal.py.

RAWV (video): b"RAWV" | uint32 n_frames | n_frames x uint32 frame_len |
              concatenated PNG frame payloads.
RAWA (audio): b"RAWA" | uint32 sample_rate | uint32 n_samples |
              int16-LE PCM samples.
"""

from __future__ import annotations

import struct

import numpy as np

VIDEO_MAGIC = b"RAWV"
AUDIO_MAGIC = b"RAWA"


def pack_rawv(frames: list[bytes]) -> bytes:
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    out += [struct.pack("<I", len(f)) for f in frames]
    out += list(frames)
    return b"".join(out)


def unpack_rawv(blob: bytes) -> list[bytes]:
    if blob[:4] != VIDEO_MAGIC:
        raise ValueError("not a RAWV container")
    (n,) = struct.unpack_from("<I", blob, 4)
    lens = struct.unpack_from(f"<{n}I", blob, 8)
    off = 8 + 4 * n
    frames = []
    for ln in lens:
        frames.append(blob[off : off + ln])
        off += ln
    return frames


def pack_rawa(samples: np.ndarray, sample_rate: int) -> bytes:
    pcm = np.asarray(samples, dtype=np.int16)
    return (
        AUDIO_MAGIC
        + struct.pack("<II", int(sample_rate), len(pcm))
        + pcm.tobytes()
    )


def unpack_rawa(blob: bytes) -> tuple[np.ndarray, int]:
    if blob[:4] != AUDIO_MAGIC:
        raise ValueError("not a RAWA container")
    rate, n = struct.unpack_from("<II", blob, 4)
    pcm = np.frombuffer(blob, dtype="<i2", count=n, offset=12)
    return pcm, rate
