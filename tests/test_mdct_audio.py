"""OSA1 MDCT transform audio codec (datagen/mdct_audio.py) +
extract_audio_features integration (VERDICT r4 item 6)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from osmalyzer_spark.datagen.mdct_audio import (
    HOP,
    MAGIC,
    N,
    _BASIS,
    _WIN,
    audio_decode,
    audio_encode,
    snr_db,
)


def tones(rate=16000, secs=1.5, seed=7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * secs)) / rate
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t)
        + 4000 * np.sin(2 * np.pi * 1230 * t + 0.4)
        + 1500 * np.sin(2 * np.pi * 3700 * t)
        + rng.normal(0, 120, t.shape)
    )
    return np.clip(np.round(sig), -32768, 32767).astype(np.int16)


def test_princen_bradley_window_condition():
    """sin window: w[n]^2 + w[n+HOP]^2 == 1 — the exact-reconstruction
    (TDAC) condition for 50% overlap."""
    assert np.allclose(_WIN[:HOP] ** 2 + _WIN[HOP:] ** 2, 1.0)


def test_mdct_tdac_identity():
    """Unquantized forward->inverse->overlap-add is (near-)exact: the
    time-domain alias introduced by the 2:1 critical sampling cancels
    between adjacent windows."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1000, 5 * HOP)
    # two overlapping analysis frames reconstruct the shared hop exactly
    f0 = x[:N] * _WIN
    f1 = x[HOP : HOP + N] * _WIN
    c0, c1 = f0 @ _BASIS.T, f1 @ _BASIS.T
    r0 = (c0 @ _BASIS) * (2.0 / (N // 2)) * _WIN
    r1 = (c1 @ _BASIS) * (2.0 / (N // 2)) * _WIN
    shared = r0[HOP:] + r1[:HOP]
    assert np.allclose(shared, x[HOP:N], atol=1e-9 * np.abs(x).max())


@pytest.mark.parametrize("quality,snr_floor", [(95, 60.0), (90, 55.0), (60, 45.0)])
def test_roundtrip_snr(quality, snr_floor):
    pcm = tones()
    data = audio_encode(pcm, 16000, quality)
    dec, rate = audio_decode(data)
    assert rate == 16000 and dec.shape == pcm.shape and dec.dtype == np.int16
    assert snr_db(pcm, dec) >= snr_floor


def test_compression_and_quality_monotone():
    pcm = tones()
    sizes = [len(audio_encode(pcm, 16000, q)) for q in (40, 70, 95)]
    assert sizes == sorted(sizes)
    assert sizes[0] < len(pcm.tobytes()) * 0.6  # q40 well under raw PCM


def test_deterministic_and_magic_and_lengths():
    pcm = tones(secs=0.37)  # non-multiple of HOP
    data = audio_encode(pcm, 8000, 85)
    assert data[:4] == MAGIC
    assert data == audio_encode(pcm, 8000, 85)
    dec, rate = audio_decode(data)
    assert rate == 8000 and dec.shape == pcm.shape
    with pytest.raises(ValueError, match="OSA1"):
        audio_decode(b"XXXXXXXX")
    with pytest.raises(ValueError, match="int16"):
        audio_encode(pcm.astype(np.float32), 8000)


def test_silence_roundtrip():
    pcm = np.zeros(4096, np.int16)
    dec, _ = audio_decode(audio_encode(pcm, 8000, 90))
    assert (dec == 0).all()


def test_audio_features_osa(spark):
    """extract_audio_features on the transform codec: rms ~ amp/sqrt(2),
    zero-crossing rate ~ 2f for a pure sine — same physics checks the
    PCM/ADPCM paths pass."""
    from osmalyzer_spark.multimodal import extract_audio_features

    rate, freq, amp = 8000, 440.0, 0.5
    t = np.arange(rate) / rate
    pcm = np.round(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(audio_encode(pcm, rate, 95)), "osa")],
        "image_id long, bytes binary, fmt string",
    )
    r = extract_audio_features(df).collect()[0]
    assert abs(r["duration_s"] - 1.0) < 1e-6
    assert math.isclose(r["rms"], amp / math.sqrt(2), rel_tol=0.02)
    assert math.isclose(r["zero_cross_per_s"], 2 * freq, rel_tol=0.02)
