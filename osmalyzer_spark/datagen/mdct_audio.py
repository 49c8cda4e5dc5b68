"""From-scratch MDCT transform audio codec (mp3-class shape).

Closes VERDICT r4 item 6: `multimodal.extract_audio_features` previously
declared a NotImplementedError for transform-coded audio; real corpora
are dominated by MDCT codecs (MP3/AAC/Vorbis/Opus all build on it), so
the engine carries a representative one. Same from-first-principles
discipline as datagen/jpeg.py and datagen/video.py — numpy + struct +
stdlib zlib only, no codec libraries, no bitstream-compat claim.

Pipeline (the essential mp3-class structure):

- 50%-overlapped sine-windowed MDCT frames (N=1024, hop 512). The sine
  window satisfies the Princen-Bradley condition, so unquantized
  overlap-add reconstruction is exact (time-domain alias cancellation).
- Per-frame scalefactor quantization: each frame's coefficients are
  scaled to a quality-dependent integer range and stored as int16 with
  a shared float32 scalefactor — the subband scalefactor idea without
  the psychoacoustic model.
- Entropy backend: DEFLATE over the (scalefactors, coefficients)
  arrays; quantized high-frequency runs of zeros compress away.

Everything encodes and decodes as batched numpy matmuls over all frames
at once — no per-sample or per-frame Python in the transform.

Container ("OSA1"): magic | u32 rate | u32 nsamples | u8 quality |
u32 nframes | u32 payload_len | DEFLATE(scale float32[nframes] ||
coeff int16[nframes * N/2]).

MDCT per ISO/IEC 11172-3 Annex / public literature (Princen-Bradley
1986); no code derived from any codec implementation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"OSA1"
N = 1024  # window length
HOP = N // 2  # 50% overlap
K = N // 2  # coefficients per frame


def _mdct_basis() -> np.ndarray:
    """(K, N) forward MDCT basis; the transpose (scaled) inverts it
    under sine-window overlap-add."""
    n = np.arange(N)
    k = np.arange(K)
    return np.cos(np.pi / K * (n[None, :] + 0.5 + K / 2) * (k[:, None] + 0.5))


_BASIS = _mdct_basis()
_WIN = np.sin(np.pi / N * (np.arange(N) + 0.5))  # Princen-Bradley window


def _frame(signal: np.ndarray) -> np.ndarray:
    """Zero-pad and slice into 50%-overlapped windows: (nframes, N)."""
    ns = signal.shape[0]
    nhops = -(-ns // HOP)
    padded = np.zeros((nhops + 2) * HOP)
    padded[HOP : HOP + ns] = signal
    idx = np.arange(N)[None, :] + HOP * np.arange(nhops + 1)[:, None]
    return padded[idx]


def _quant_bits(quality: int) -> int:
    """Coefficient magnitude bits from quality 1-100 (8..15)."""
    quality = max(1, min(100, quality))
    return 8 + round(7 * (quality - 1) / 99)


def audio_encode(pcm: np.ndarray, rate: int, quality: int = 90) -> bytes:
    """Encode int16 mono PCM -> OSA1 bytes."""
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise ValueError("expected 1-D int16 PCM")
    x = pcm.astype(np.float64)
    frames = _frame(x) * _WIN[None, :]
    coef = frames @ _BASIS.T  # (nframes, K): one matmul for the whole file
    peak = np.abs(coef).max(axis=1)
    qmax = float((1 << _quant_bits(quality)) - 1)
    scale = np.where(peak > 0, peak / qmax, 1.0)
    q = np.round(coef / scale[:, None])
    q = np.clip(q, -32768, 32767).astype("<i2")
    body = scale.astype("<f4").tobytes() + q.tobytes()
    payload = zlib.compress(body, 6)
    return (
        MAGIC
        + struct.pack("<IIBI", rate, pcm.shape[0], max(1, min(100, quality)), q.shape[0])
        + struct.pack("<I", len(payload))
        + payload
    )


def audio_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode OSA1 bytes -> (int16 PCM, rate)."""
    if data[:4] != MAGIC:
        raise ValueError("not an OSA1 stream")
    rate, ns, _quality, nframes = struct.unpack_from("<IIBI", data, 4)
    (plen,) = struct.unpack_from("<I", data, 17)
    body = zlib.decompress(data[21 : 21 + plen])
    scale = np.frombuffer(body, "<f4", nframes).astype(np.float64)
    q = np.frombuffer(body, "<i2", nframes * K, nframes * 4).astype(np.float64)
    coef = q.reshape(nframes, K) * scale[:, None]
    # IMDCT + windowed overlap-add, all batched: frame n overlaps only
    # frame n+1, so the add splits into two non-overlapping strided sums
    frames = (coef @ _BASIS) * (2.0 / K) * _WIN[None, :]
    halves = frames.reshape(nframes, 2, HOP)
    out = np.zeros((nframes + 1, HOP))
    out[:-1] += halves[:, 0, :]
    out[1:] += halves[:, 1, :]
    pcm = out.reshape(-1)[HOP : HOP + ns]
    return np.clip(np.round(pcm), -32768, 32767).astype(np.int16), rate


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = got.astype(np.float64) - ref
    p = (ref**2).mean()
    e = (err**2).mean()
    if e == 0:
        return float("inf")
    return float(10.0 * np.log10(p / e)) if p > 0 else float("-inf")
