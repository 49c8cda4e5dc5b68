"""Microbenchmark: JPEG entropy-decode throughput, fast LUT vs walk.

Measures single-core decode throughput (MB/s of compressed input and
Mpixel/s of output) for the table-driven fast entropy decoder against
the bit-at-a-time reference walk (VERDICT r4 item 1: done bar is >=10x).

Usage: python tools/bench_jpeg.py [side=512] [reps_fast=5]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from osmalyzer_spark.datagen.jpeg import jpeg_decode, jpeg_encode  # noqa: E402


def natural_image(side: int, seed: int = 7) -> np.ndarray:
    """Smooth gradients + texture + edges — a natural-photo-like entropy
    profile (pure noise overstates AC density, flat fields understate)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side]
    base = np.stack(
        [
            128 + 90 * np.sin(xx / 41.0) * np.cos(yy / 29.0),
            128 + 80 * np.cos((xx + yy) / 53.0),
            128 + 70 * np.sin(yy / 23.0),
        ],
        axis=-1,
    )
    # hard edges (text/structure analog) + sensor-ish noise
    base[:, :: side // 8] = 230
    base[:: side // 8, :] = 25
    img = base + rng.normal(0, 4.0, (side, side, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def time_decode(data: bytes, engine: str, reps: int) -> tuple[float, float]:
    """(best full-decode seconds, best entropy-stage seconds)."""
    best = ebest = float("inf")
    for _ in range(reps):
        ph: dict = {}
        t0 = time.perf_counter()
        jpeg_decode(data, _engine=engine, _phases=ph)
        best = min(best, time.perf_counter() - t0)
        ebest = min(ebest, ph["entropy_s"])
    return best, ebest


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps_fast = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    img = natural_image(side)
    out = {"side": side, "configs": {}}
    for label, kw in (
        # DRI streams: the lane-parallel batched decoder (the scale path —
        # restart segments are exactly what a cluster decoder fans out on)
        ("q90_420_ri1", dict(quality=90, subsampling="420", restart_interval=1)),
        ("q90_444_ri1", dict(quality=90, subsampling="444", restart_interval=1)),
        ("q75_420_ri2", dict(quality=75, subsampling="420", restart_interval=2)),
        # DRI-less stream: scalar LUT-chase fallback
        ("q90_420_nori", dict(quality=90, subsampling="420")),
    ):
        data = jpeg_encode(img, **kw)
        assert (
            jpeg_decode(data, _engine="fast") == jpeg_decode(data, _engine="walk")
        ).all(), f"fast/walk mismatch on {label}"
        tf, ef = time_decode(data, "fast", reps_fast)
        tw, ew = time_decode(data, "walk", max(1, reps_fast // 2))
        mb = len(data) / 1e6
        mpix = side * side / 1e6
        out["configs"][label] = {
            "compressed_mb": round(mb, 3),
            "fast_s": round(tf, 4),
            "walk_s": round(tw, 4),
            "decode_speedup": round(tw / tf, 1),
            "fast_mb_per_s": round(mb / tf, 2),
            "fast_mpixel_per_s": round(mpix / tf, 2),
            "entropy_fast_s": round(ef, 4),
            "entropy_walk_s": round(ew, 4),
            "entropy_speedup": round(ew / ef, 1),
            "entropy_fast_mb_per_s": round(mb / ef, 2),
            "entropy_walk_mb_per_s": round(mb / ew, 2),
        }
    print(json.dumps(out))


def batch_mode(side: int = 128, n: int = 512) -> None:
    """Cross-image pooled batch decode vs per-image (DRI-less corpus)."""
    imgs = [natural_image(side, seed=i) for i in range(n)]
    datas = [jpeg_encode(im, quality=90, subsampling="420") for im in imgs]
    from osmalyzer_spark.datagen.jpeg import jpeg_decode_batch

    jpeg_decode_batch(datas[: min(64, n)])  # warm
    t0 = time.perf_counter()
    r1 = jpeg_decode_batch(datas)
    tb = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = [jpeg_decode(d) for d in datas]
    ts = time.perf_counter() - t0
    assert all((a == b).all() for a, b in zip(r1, r2))
    mb = sum(len(d) for d in datas) / 1e6
    print(
        json.dumps(
            {
                "mode": "batch",
                "side": side,
                "n_images": n,
                "batch_s": round(tb, 3),
                "per_image_s": round(ts, 3),
                "speedup": round(ts / tb, 2),
                "batch_mb_per_s": round(mb / tb, 2),
                "batch_mpixel_per_s": round(n * side * side / 1e6 / tb, 2),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--batch":
        batch_mode(
            int(sys.argv[2]) if len(sys.argv) > 2 else 128,
            int(sys.argv[3]) if len(sys.argv) > 3 else 512,
        )
    else:
        main()
