"""Deterministic synthetic generator for the engine's substrate table.

Schema exactly matches BASELINE.json `input_hint`:
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64).

Generation is itself distributed (spark.range -> mapInPandas), so the same
code path scales from 10^3 test rows to the bench sizes; every row is a
pure function of (seed, id) — regenerating any partition yields identical
bytes, which is what makes the per-cell checkpoint/resume story testable.

The caption carries the name/address payload that the derived views parse
into tags (reference analog: tag dictionary, Core/Primitives/OsmElement.cs),
formatted "{name} @ {street} {housenum}, {parish}". `phash` deterministically
seeds the geotag (FIXTURES.md §1) with a dense Riga cluster for skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

NAMES = ["Rimi", "Maxima XX", "LaTS", "top!", "Elvi", "Mego", "Aibe", "Citro"]
STREETS = [
    "Brīvības iela", "Ozolu iela", "Skolas iela", "Dzirnavu iela",
    "Valdemāra iela", "Tērbatas iela", "Maskavas iela", "Lāčplēša iela",
]
PARISHES = ["Rīga", "Mārupe", "Ādaži", "Salaspils", "Jelgava", "Ogre", "Sigulda"]


def _phash_of(image_id: str) -> int:
    # 62-bit positive deterministic hash
    return int.from_bytes(hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "big") >> 2


def _row(idx: int, seed: int) -> tuple:
    from osmalyzer_spark.datagen.jpeg import jpeg_encode
    from osmalyzer_spark.datagen.png import png_encode

    rng = np.random.default_rng((seed << 32) ^ idx)
    image_id = f"img{idx:09d}"
    w = int(rng.integers(8, 33))
    h = int(rng.integers(8, 33))
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # a real corpus is mostly JPEG: every 4th row carries a baseline JPEG
    # payload (own codec, q=100 keeps the round-trip PSNR far above the
    # 40 dB row invariant even on noise imagery)
    if idx % 4 == 1:
        payload, fmt = jpeg_encode(rgb, quality=100), "jpeg"
    else:
        payload, fmt = png_encode(rgb), "png"
    name = NAMES[idx % len(NAMES)]
    street = STREETS[(idx // len(NAMES)) % len(STREETS)]
    housenum = 1 + (idx % 97)
    suffix = "" if idx % 5 else "B"
    parish = PARISHES[(idx // 3) % len(PARISHES)]
    caption = f"{name} @ {street} {housenum}{suffix}, {parish}"
    return (
        image_id,
        bytearray(payload),
        w,
        h,
        fmt,
        caption,
        _phash_of(image_id),
    )


def generate_images(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic images table of n rows."""
    parts = partitions or max(1, min(64, n // 1000 or 1))
    base = spark.range(0, n, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return base.mapInPandas(gen, schema=SCHEMA)
