import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="stream_test_")
    yield f"{base}/in", f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(base, ignore_errors=True)


def test_streaming_ingest_and_resume(spark, dirs):
    from osmalyzer_spark.datagen import generate_images
    from osmalyzer_spark.streaming.ingest import start_ingest

    in_dir, out_dir, ckpt = dirs
    generate_images(spark, 200, seed=42).write.mode("append").parquet(in_dir)

    q = start_ingest(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 200
    assert {"cell_id", "tile_id", "lat", "lon"} <= set(out.columns)
    # payload survived the stream
    assert out.filter(F.col("bytes").isNull()).count() == 0

    # second batch of files: only the new rows are processed (exactly-once
    # file tracking via the stream checkpoint)
    generate_images(spark, 100, seed=43).write.mode("append").parquet(in_dir)
    q2 = start_ingest(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 300


def test_arrival_stats_watermark(spark):
    from osmalyzer_spark.streaming.ingest import arrival_stats_stream

    # batch-mode check of the streaming aggregation shape
    df = spark.createDataFrame(
        [("img1", "2024-01-01 00:00:10"), ("img2", "2024-01-01 00:00:50"), ("img3", "2024-01-01 00:01:10")],
        "image_id string, ts string",
    ).select("image_id", F.to_timestamp("ts").alias("event_ts"))
    got = arrival_stats_stream(df).collect()
    assert sum(r["n_rows"] for r in got) == 3
    assert len(got) == 2  # two 1-minute windows


def test_stateful_streaming_dedup_across_restarts(spark, dirs):
    """applyInPandasWithState dedup: first arrival per key passes, repeats
    drop — including repeats arriving AFTER a query restart (state store
    persists via the checkpoint)."""
    from osmalyzer_spark.streaming.stateful import dedup_stream

    in_dir, out_dir, ckpt = dirs
    rows1 = [(1, "ka"), (2, "kb"), (3, "ka"), (4, "kc")]  # ka duplicated in-batch
    spark.createDataFrame(rows1, "doc_id long, key string").write.mode("append").parquet(in_dir)

    def run():
        stream = spark.readStream.schema("doc_id long, key string").parquet(in_dir)
        q = (
            dedup_stream(stream, "key", "doc_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)

    run()
    out1 = {(r["doc_id"], r["key"]) for r in spark.read.parquet(out_dir).collect()}
    assert out1 == {(1, "ka"), (2, "kb"), (4, "kc")}  # lowest id kept per key

    # restart with repeats of old keys + one genuinely new key
    rows2 = [(5, "ka"), (6, "kb"), (7, "kd")]
    spark.createDataFrame(rows2, "doc_id long, key string").write.mode("append").parquet(in_dir)
    run()
    out2 = {(r["doc_id"], r["key"]) for r in spark.read.parquet(out_dir).collect()}
    assert out2 == out1 | {(7, "kd")}  # ka/kb suppressed by persisted state


def test_streaming_media_feature_extraction(spark, dirs):
    """The multimodal decode path composes with Structured Streaming:
    image rows stream through the pooled batch decoder into per-row
    mean-color features, matching the batch-mode decode exactly."""
    import numpy as np

    from osmalyzer_spark.datagen.images import generate_images
    from osmalyzer_spark.datagen.png import decode_image
    from osmalyzer_spark.streaming.ingest import (
        extract_features_stream,
        read_images_stream,
    )

    in_dir, out_dir, ckpt = dirs
    imgs = generate_images(spark, 40, seed=9, partitions=2)
    imgs.write.mode("overwrite").parquet(in_dir)

    feats = extract_features_stream(read_images_stream(spark, in_dir))
    q = (
        feats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    got = {r["image_id"]: r for r in spark.read.parquet(out_dir).collect()}
    src = imgs.collect()
    assert len(got) == len(src) == 40
    for row in src[:10]:
        px = decode_image(bytes(row["bytes"]), row["fmt"])
        want = px.reshape(-1, 3).mean(axis=0)
        g = got[row["image_id"]]
        assert (g["w"], g["h"]) == (px.shape[1], px.shape[0])
        assert np.allclose([g["mean_r"], g["mean_g"], g["mean_b"]], want)
