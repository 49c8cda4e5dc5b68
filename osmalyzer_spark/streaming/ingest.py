"""Structured Streaming ingest of image+caption batches.

The reference is a daily batch job (SURVEY §2.9 — no streaming exists
there); this module is the engine's incremental-ingest extension: new
parquet files landing in a directory stream through cell/tile assignment
into an append sink, with per-window arrival stats. Uses
Trigger.availableNow semantics (process-everything-then-stop) so the same
code serves both continuous ingest on a cluster and catch-up batches in
tests; checkpointLocation gives exactly-once file tracking — the streaming
counterpart of checkpoint.py's per-cell batch resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmalyzer_spark.datagen.images import SCHEMA as IMAGES_SCHEMA
from osmalyzer_spark.datagen.views import geotag_lat, geotag_lon
from osmalyzer_spark.operators.tiles import tile_id_expr


def read_images_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream of input_hint-shaped parquet batches."""
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )


def assign_cells_stream(images: DataFrame, zoom: int = 12, cell_deg: float = 0.01) -> DataFrame:
    """Streaming projection: geotag + cell + tile per arriving image row.
    Payload passes through untouched (the integrity invariant holds across
    the stream)."""
    from osmalyzer_spark.geo.cells import cell_id_expr

    lat = geotag_lat("phash")
    lon = geotag_lon("phash")
    return images.select(
        "*",
        lat.alias("lat"),
        lon.alias("lon"),
        cell_id_expr(lat, lon, cell_deg).alias("cell_id"),
        tile_id_expr(lat, lon, zoom).alias("tile_id"),
    )


def start_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    zoom: int = 12,
):
    """Run the ingest to completion over currently-available files
    (Trigger.availableNow) and return the query handle. On a cluster the
    same writeStream without availableNow runs continuously."""
    assigned = assign_cells_stream(read_images_stream(spark, in_dir), zoom=zoom)
    return (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def arrival_stats_stream(images_with_ts: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked per-window arrival counts (late data beyond 2 windows
    dropped) — the standard streaming-agg shape for ingest monitoring."""
    return (
        images_with_ts.withWatermark("event_ts", "2 minutes")
        .groupBy(F.window("event_ts", window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("image_id").alias("approx_ids"),
        )
    )


def extract_features_stream(images: DataFrame) -> DataFrame:
    """Streaming media feature extraction: decode + mean-color per
    arriving image row, Arrow-batched through the SAME cross-image
    pooled decoder the batch path uses (datagen/jpeg.py
    jpeg_decode_batch via decode_images_batch) — mapInPandas composes
    with streaming sources unchanged, so the multimodal column is
    first-class in both execution modes."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osmalyzer_spark.datagen.png import decode_images_batch

        for pdf in batches:
            pixs = decode_images_batch(list(pdf["bytes"]), list(pdf["fmt"]))
            rows = []
            for img_id, px in zip(pdf["image_id"], pixs):
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        img_id,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "mean_r", "mean_g", "mean_b"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run,
        schema=(
            "image_id string, w int, h int, mean_r double, mean_g double, "
            "mean_b double"
        ),
    )
