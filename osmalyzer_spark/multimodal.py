"""Multimodal (image) column plumbing.

Images are opaque `binary` columns with typed metadata (w, h, fmt) per
BASELINE.json input_hint. Everything here is mapInPandas/pandas-UDF over
Arrow batches — batch sizes are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (set low in session.py
because payload rows are fat).

Real in this environment: PNG decode/encode (stdlib codec), PSNR
integrity check, nearest-neighbor resize, mean-color feature extraction.
Declared stubs (no codec libs in container): JPEG decode, video frame
sampling, audio decode — the Spark-side plumbing (schema, batching,
partitioning) is identical and tested via the PNG path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmalyzer_spark.datagen.png import decode_image, png_encode, psnr

PSNR_THRESHOLD_DB = 40.0


def mean_color_udf():
    """(bytes, fmt) -> array<double>[3] mean RGB — feature-extract demo."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _mean(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, f in zip(data, fmt):
            px = decode_image(bytes(b), f)
            out.append([float(x) for x in px.reshape(-1, 3).mean(axis=0)])
        return pd.Series(out)

    return _mean


def resize_images(df: DataFrame, out_w: int, out_h: int, bytes_col: str = "bytes") -> DataFrame:
    """Nearest-neighbor resize of every image to (out_w, out_h); re-encoded
    PNG replaces the payload, w/h metadata updated. mapInPandas keeps the
    whole row so non-image columns pass through untouched."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_bytes = []
            for b, f in zip(pdf[bytes_col], pdf["fmt"]):
                px = decode_image(bytes(b), f)
                ys = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                new_bytes.append(bytearray(png_encode(px[ys][:, xs])))
            pdf = pdf.copy()
            pdf[bytes_col] = new_bytes
            pdf["w"] = out_w
            pdf["h"] = out_h
            pdf["fmt"] = "png"
            yield pdf

    return df.mapInPandas(run, schema=schema)


def check_payload_integrity(
    original: DataFrame,
    processed: DataFrame,
    id_col: str = "image_id",
    threshold_db: float = PSNR_THRESHOLD_DB,
) -> DataFrame:
    """Per-row invariant check (input_hint): decoded-pixel PSNR >=
    threshold AND caption byte-equality, joined by image_id.

    Output: (image_id, psnr_db, caption_equal, ok)."""
    o = original.select(
        F.col(id_col),
        F.col("bytes").alias("o_bytes"),
        F.col("fmt").alias("o_fmt"),
        F.col("caption").alias("o_caption"),
    )
    p = processed.select(
        F.col(id_col),
        F.col("bytes").alias("p_bytes"),
        F.col("fmt").alias("p_fmt"),
        F.col("caption").alias("p_caption"),
    )

    @F.pandas_udf(T.DoubleType())
    def psnr_udf(ob: pd.Series, of: pd.Series, pb: pd.Series, pf: pd.Series) -> pd.Series:
        out = np.empty(len(ob))
        for i in range(len(ob)):
            a = decode_image(bytes(ob.iloc[i]), of.iloc[i])
            b = decode_image(bytes(pb.iloc[i]), pf.iloc[i])
            if a.shape != b.shape:
                out[i] = float("-inf")
            else:
                v = psnr(a, b)
                out[i] = 1e9 if v == float("inf") else v
        return pd.Series(out)

    joined = o.join(p, id_col)
    return joined.select(
        id_col,
        psnr_udf("o_bytes", "o_fmt", "p_bytes", "p_fmt").alias("psnr_db"),
        (F.col("o_caption") == F.col("p_caption")).alias("caption_equal"),
    ).withColumn(
        "ok", (F.col("psnr_db") >= threshold_db) & F.col("caption_equal")
    )


def sample_video_frames(df: DataFrame, every_nth: int = 30) -> DataFrame:
    """STUB: video frame sampling. No video codec in this container; the
    operator shape is (binary, fmt) -> exploded frame rows. Raises until a
    codec is wired in."""
    raise NotImplementedError(
        "video decode unavailable in this environment; see multimodal.py docstring"
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """STUB: audio feature extraction (no audio codec in container)."""
    raise NotImplementedError(
        "audio decode unavailable in this environment; see multimodal.py docstring"
    )
