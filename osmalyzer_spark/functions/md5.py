"""Batch-vectorized MD5 (RFC 1321) over numpy for short messages.

Token/shingle fingerprints in operators/dedup.py are the lower 64 bits of
md5 (little-endian digest bytes 8..16 == DuckDB ``md5_number_lower``) so
that every fingerprint is bit-replayable in plain SQL for the oracle
gate. Hashing one `hashlib.md5` per shingle was the measured Python hot
spot of the MinHash stage (BENCH.md); this module runs the full 64-round
MD5 compression function as numpy uint32 array ops over an entire Arrow
batch of messages at once.

Messages up to 55 bytes fit one padded 64-byte block — true for
essentially all word tokens and k-word shingles — and take the
vectorized path; longer messages fall back to hashlib per message.
Bit-identical to hashlib/DuckDB by construction (asserted in tests and
by the hash-green q21/q22 oracles).
"""

from __future__ import annotations

import hashlib

import numpy as np

# per-round left-rotate amounts and sine-derived constants (RFC 1321 §3.4)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = (
    np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2.0**32)
    .astype(np.uint64)
    .astype(np.uint32)
)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


_CHUNK = 32768  # keep the working set L2-resident; measured ~2x vs one pass


def _compress_lower64(buf: np.ndarray) -> np.ndarray:
    """(m, 64) padded single blocks -> uint64 lower-64 digests."""
    m = buf.shape[0]
    out = np.empty(m, dtype=np.uint64)
    for lo in range(0, m, _CHUNK):
        hi = min(lo + _CHUNK, m)
        # transpose once so M[g] reads are contiguous instead of 64-byte
        # strided column walks (also measured, see BENCH.md micro)
        Mt = buf[lo:hi].view("<u4").T.copy()  # (16, chunk)
        k = hi - lo
        A = np.full(k, _INIT[0], dtype=np.uint32)
        B = np.full(k, _INIT[1], dtype=np.uint32)
        C = np.full(k, _INIT[2], dtype=np.uint32)
        D = np.full(k, _INIT[3], dtype=np.uint32)
        for i in range(64):
            if i < 16:
                Fv = (B & C) | (~B & D)
                g = i
            elif i < 32:
                Fv = (D & B) | (~D & C)
                g = (5 * i + 1) % 16
            elif i < 48:
                Fv = B ^ C ^ D
                g = (3 * i + 5) % 16
            else:
                Fv = C ^ (B | ~D)
                g = (7 * i) % 16
            tmp = Fv + A + _K[i] + Mt[g]  # uint32 wraparound
            s = _S[i]
            A, D, C, B = D, C, B, B + ((tmp << s) | (tmp >> (np.uint32(32) - s)))
        # lower-64 = little-endian digest bytes 8..16 = words C', D'
        C = C + np.uint32(_INIT[2])
        D = D + np.uint32(_INIT[3])
        out[lo:hi] = C.astype(np.uint64) | (D.astype(np.uint64) << np.uint64(32))
    return out


def md5_lower64_batch(msgs: list[bytes]) -> np.ndarray:
    """uint64[n]: md5_number_lower of each message, vectorized.

    One numpy pass over all messages <= 55 bytes (single-block after
    padding); rare longer messages are hashed with hashlib — identical
    output either way.
    """
    n = len(msgs)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    long_idx = np.nonzero(lens > 55)[0]
    for i in long_idx:
        out[i] = int.from_bytes(hashlib.md5(msgs[i]).digest()[8:], "little")
    short_idx = np.nonzero(lens <= 55)[0]
    m = len(short_idx)
    if m == 0:
        return out

    # pad: message || 0x80 || zeros || bit-length (little-endian u64).
    # Grouping by length (<= 56 groups) turns padding into one
    # join+frombuffer+reshape per distinct length — ~5x faster than a
    # per-message fill loop (the rounds themselves are cheap; padding was
    # the measured bottleneck).
    buf = np.zeros((m, 64), dtype=np.uint8)
    lens_short = lens[short_idx]
    for ln in np.unique(lens_short):
        grp = np.nonzero(lens_short == ln)[0]
        if ln:
            sub = b"".join([msgs[short_idx[j]] for j in grp])
            buf[grp, :ln] = np.frombuffer(sub, dtype=np.uint8).reshape(len(grp), ln)
        buf[grp, ln] = 0x80
    bitlens = (lens_short.astype(np.uint64) * np.uint64(8)).astype("<u8")
    buf[:, 56:64] = bitlens.view(np.uint8).reshape(m, 8)
    out[short_idx] = _compress_lower64(buf)
    return out


def md5_lower64_ranges(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """md5_number_lower of byte ranges flat[starts[i] : starts[i]+lens[i]].

    The zero-per-message path: when messages are substrings of one buffer
    (k-word shingles of a space-joined document ARE contiguous slices of
    it), padding is a group-by-length 2D gather — no Python string or
    bytes object is ever created per message.
    """
    n = len(starts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    for i in np.nonzero(lens > 55)[0]:
        s = int(starts[i])
        out[i] = int.from_bytes(
            hashlib.md5(flat[s : s + int(lens[i])].tobytes()).digest()[8:], "little"
        )
    short = np.nonzero(lens <= 55)[0]
    m = len(short)
    if m == 0:
        return out
    ss, ls = starts[short], lens[short]
    buf = np.zeros((m, 64), dtype=np.uint8)
    for ln in np.unique(ls):
        grp = np.nonzero(ls == ln)[0]
        if ln:
            buf[grp, :ln] = flat[ss[grp][:, None] + np.arange(ln)[None, :]]
        buf[grp, ln] = 0x80
    bitlens = (ls.astype(np.uint64) * np.uint64(8)).astype("<u8")
    buf[:, 56:64] = bitlens.view(np.uint8).reshape(m, 8)
    out[short] = _compress_lower64(buf)
    return out
