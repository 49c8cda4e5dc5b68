"""Compressed media codecs: RIFF/WAV (PCM + IMA ADPCM) and MJPEG."""

import math

import numpy as np
import pytest

from osmalyzer_spark.datagen.jpeg import (
    jpeg_decode,
    jpeg_encode,
    mjpeg_pack,
    mjpeg_split,
)
from osmalyzer_spark.datagen.wav_adpcm import (
    BLOCK_ALIGN,
    SAMPLES_PER_BLOCK,
    wav_decode,
    wav_encode,
)


def _sine(rate=8000, secs=2.0, freq=440.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * 32767 * np.sin(2 * math.pi * freq * t)).astype(np.int16)


# ------------------------------------------------------------------- WAV


def test_wav_pcm_roundtrip_exact():
    pcm = _sine()
    out, rate = wav_decode(wav_encode(pcm, 8000, "pcm"))
    assert rate == 8000
    assert np.array_equal(out, pcm)


def test_wav_adpcm_ratio_and_quality():
    pcm = _sine()
    blob = wav_encode(pcm, 8000, "adpcm")
    out, rate = wav_decode(blob)
    assert rate == 8000 and len(out) == len(pcm)
    # 4:1 vs 16-bit PCM (plus container overhead)
    assert len(blob) < 0.27 * (2 * len(pcm))
    snr = 10 * np.log10(
        (pcm.astype(np.float64) ** 2).mean()
        / ((out.astype(np.float64) - pcm) ** 2).mean()
    )
    assert snr > 25.0  # typical IMA ADPCM on tonal content


def test_wav_adpcm_length_not_multiple_of_block():
    # fact chunk must trim the padded tail exactly
    for n in [1, 2, SAMPLES_PER_BLOCK - 1, SAMPLES_PER_BLOCK, SAMPLES_PER_BLOCK + 1]:
        pcm = _sine()[:n]
        out, _ = wav_decode(wav_encode(pcm, 8000, "adpcm"))
        assert len(out) == n
    # first sample is stored verbatim in the block header
    out, _ = wav_decode(wav_encode(np.array([-12345], dtype=np.int16), 8000, "adpcm"))
    assert out[0] == -12345


def test_wav_adpcm_block_structure():
    pcm = _sine(secs=0.2)
    blob = wav_encode(pcm, 8000, "adpcm")
    # fmt chunk declares IMA ADPCM mono with our block align
    i = blob.index(b"fmt ")
    import struct as s

    tag, n_ch, rate = s.unpack_from("<HHI", blob, i + 8)
    (block_align,) = s.unpack_from("<H", blob, i + 20)
    assert (tag, n_ch, rate, block_align) == (0x11, 1, 8000, BLOCK_ALIGN)


def test_wav_decoder_rejects_unknown():
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_decode(b"JUNKJUNKJUNK")
    pcm = _sine(secs=0.1)
    blob = bytearray(wav_encode(pcm, 8000, "pcm"))
    i = bytes(blob).index(b"fmt ")
    blob[i + 8] = 0x55  # format tag -> unknown
    with pytest.raises(ValueError, match="unsupported WAV format"):
        wav_decode(bytes(blob))


# ----------------------------------------------------------------- MJPEG


def _smooth_frames(n, h=24, w=16, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        raw = rng.integers(0, 255, h * w * 3).astype(np.float64)
        out.append(
            np.convolve(raw, np.ones(5) / 5, "same").reshape(h, w, 3).astype(np.uint8)
        )
    return out


def test_mjpeg_split_exact_frames():
    px = _smooth_frames(5)
    # restart markers inside scans exercise the RSTn walk
    frames = [
        jpeg_encode(p, quality=90, subsampling="420", restart_interval=2) for p in px
    ]
    got = mjpeg_split(mjpeg_pack(frames))
    assert got == frames  # byte-identical split
    for want, f in zip(px, got):
        dec = jpeg_decode(f)
        assert dec.shape == want.shape


def test_mjpeg_split_rejects_garbage():
    with pytest.raises(ValueError, match="expected SOI"):
        mjpeg_split(b"\x00\x01\x02")
    frames = [jpeg_encode(p, quality=85) for p in _smooth_frames(1)]
    with pytest.raises(ValueError, match="truncated"):
        mjpeg_split(mjpeg_pack(frames)[:-4])


# --------------------------------------------------- Spark-side plumbing


def test_video_frame_sampling_mjpg(spark):
    from osmalyzer_spark.multimodal import sample_video_frames

    px = _smooth_frames(7)
    frames = [jpeg_encode(p, quality=90) for p in px]
    df = spark.createDataFrame(
        [(1, bytearray(mjpeg_pack(frames)), "mjpg")],
        "image_id long, bytes binary, fmt string",
    )
    out = sorted(sample_video_frames(df, every_nth=3).collect(), key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["fmt"], r["w"], r["h"]) for r in out] == [
        (0, "jpeg", 16, 24), (3, "jpeg", 16, 24), (6, "jpeg", 16, 24),
    ]
    for r in out:
        assert bytes(r["bytes"]) == frames[r["frame_idx"]]


def test_audio_features_wav_adpcm(spark):
    from osmalyzer_spark.multimodal import extract_audio_features

    rate, freq, amp = 8000, 440.0, 0.5
    pcm = _sine(rate, 1.0, freq, amp)
    rows = [
        (1, bytearray(wav_encode(pcm, rate, "pcm")), "wav"),
        (2, bytearray(wav_encode(pcm, rate, "adpcm")), "wav"),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary, fmt string")
    got = {r["image_id"]: r for r in extract_audio_features(df).collect()}
    for i in (1, 2):
        assert got[i]["duration_s"] == 1.0
        assert got[i]["rms"] == pytest.approx(amp / math.sqrt(2), rel=0.02)
        assert got[i]["zero_cross_per_s"] == pytest.approx(2 * freq, rel=0.02)


def test_image_dims_header_only():
    """image_dims reads (w, h) from container headers without pixel
    decode — the frame-sampling metadata path."""
    import numpy as np

    from osmalyzer_spark.datagen.png import image_dims, png_encode

    img = np.zeros((21, 34, 3), np.uint8)
    assert image_dims(png_encode(img), "png") == (34, 21)
    assert image_dims(jpeg_encode(img, quality=90), "jpeg") == (34, 21)
    assert (
        image_dims(
            jpeg_encode(img, quality=85, subsampling="420", restart_interval=2),
            "jpeg",
        )
        == (34, 21)
    )
    with pytest.raises(ValueError, match="unknown image format"):
        image_dims(b"", "tiff")
    with pytest.raises(ValueError):
        image_dims(b"garbage", "png")
