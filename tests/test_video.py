"""OSV1 block-motion-compensated video codec (datagen/video.py) +
sample_video_frames integration (VERDICT r4 item 5)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osmalyzer_spark.datagen.png import decode_image, psnr
from osmalyzer_spark.datagen.video import (
    MAGIC,
    video_decode,
    video_encode,
)


def moving_scene(h=96, w=128, n=10, seed=3, dx=3, dy=2):
    """Translating gradients + texture + noise: motion search has real
    structure to find, residuals are small but nonzero."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        # one global translation (dx, dy) per step — camera-pan motion a
        # single MV field can represent
        u, v = xx + dx * t, yy + dy * t
        base = np.stack(
            [
                120 + 90 * np.sin(u / 17.0),
                120 + 80 * np.cos(v / 13.0),
                128 + 60 * np.sin((u + v) / 23.0),
            ],
            axis=-1,
        )
        frames.append(
            np.clip(base + rng.normal(0, 1, (h, w, 3)), 0, 255).astype(np.uint8)
        )
    return frames


def test_roundtrip_psnr_and_shape():
    frames = moving_scene()
    data = video_encode(frames, quality=95, gop=6, search=4)
    dec = video_decode(data)
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert b.shape == a.shape and b.dtype == np.uint8
        assert psnr(a, b) >= 40.0


def test_gop_structure_and_p_frame_compression():
    """I-frames at the GOP cadence; P-frames on translating content are
    much smaller than intra frames (motion compensation actually works)."""
    frames = moving_scene(n=9)
    data = video_encode(frames, quality=90, gop=4, search=4)
    pos = 13
    kinds, sizes = [], []
    for _ in range(9):
        ftype, plen = struct.unpack_from("<BI", data, pos)
        kinds.append(ftype)
        sizes.append(plen)
        pos += 5 + plen
    assert kinds == [0, 1, 1, 1, 0, 1, 1, 1, 0]
    i_sizes = [s for k, s in zip(kinds, sizes) if k == 0]
    p_sizes = [s for k, s in zip(kinds, sizes) if k == 1]
    assert max(p_sizes) < min(i_sizes) / 2


def test_deterministic_and_magic():
    frames = moving_scene(n=4)
    a = video_encode(frames, quality=85)
    assert a[:4] == MAGIC
    assert a == video_encode(frames, quality=85)
    with pytest.raises(ValueError, match="OSV1"):
        video_decode(b"JUNKJUNK")


def test_odd_dimensions_pad_and_crop():
    frames = [f[:57, :83] for f in moving_scene(h=64, w=96, n=5)]
    dec = video_decode(video_encode(frames, quality=95, gop=3))
    assert dec[0].shape == (57, 83, 3)
    for a, b in zip(frames, dec):
        assert psnr(a, b) >= 38.0  # edge padding costs a little at the crop


def test_static_scene_zero_motion_stays_cheap():
    """A static scene: the closed-loop reference converges within two
    P-frames (payloads collapse to a fixed point, no drift), and quality
    never degrades through the GOP."""
    frame = moving_scene(n=1)[0]
    frames = [frame] * 8
    data = video_encode(frames, quality=90, gop=8, search=4)
    dec = video_decode(data)
    pos = 13
    sizes = []
    for _ in range(8):
        _ft, plen = struct.unpack_from("<BI", data, pos)
        sizes.append(plen)
        pos += 5 + plen
    # residuals vanish once the loop converges: tail P payloads are tiny
    assert max(sizes[2:]) < sizes[0] / 50
    # and the reconstruction is pinned (drift-free) from there on
    for b in dec[3:]:
        assert (b == dec[2]).all()
    assert min(psnr(frame, d) for d in dec) >= 40.0


def test_sample_video_frames_osv(spark):
    from osmalyzer_spark.multimodal import sample_video_frames

    frames = moving_scene(h=48, w=64, n=7)
    data = video_encode(frames, quality=95, gop=4, search=3)
    df = spark.createDataFrame(
        [(1, bytearray(data), "osv")], "image_id long, bytes binary, fmt string"
    )
    out = sorted(
        sample_video_frames(df, every_nth=3).collect(), key=lambda r: r["frame_idx"]
    )
    assert [(r["frame_idx"], r["fmt"], r["w"], r["h"]) for r in out] == [
        (0, "png", 64, 48),
        (3, "png", 64, 48),
        (6, "png", 64, 48),
    ]
    ref = video_decode(data)
    for r in out:
        got = decode_image(bytes(r["bytes"]), "png")
        assert (got == ref[r["frame_idx"]]).all()
        assert psnr(frames[r["frame_idx"]], got) >= 40.0
