import math
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.checkpoint import CheckpointedRun
from osmalyzer_spark.geo.polygon import Polygon
from osmalyzer_spark.operators.textstats import text_stats
from osmalyzer_spark.operators.tiles import assign_tiles, tile_stats


def slippy(lat, lon, z):
    n = 1 << z
    x = int((lon + 180.0) / 360.0 * n)
    y = int((1.0 - math.log(math.tan(math.radians(lat)) + 1 / math.cos(math.radians(lat))) / math.pi) / 2.0 * n)
    return x, y


def test_tile_assignment_matches_slippy_formula(spark):
    pts = [(i, 55.6 + i * 0.17, 20.9 + i * 0.5) for i in range(15)]
    df = spark.createDataFrame(pts, "id int, lat double, lon double")
    got = assign_tiles(df, zoom=12).collect()
    for r in got:
        x, y = slippy(r["lat"], r["lon"], 12)
        assert (r["tile_x"], r["tile_y"]) == (x, y)
        assert r["tile_id"] == (12 << 58) + (x << 29) + y


def test_tile_region_tagging_and_stats(spark):
    box = Polygon(outers=[np.array([(56.0, 23.0), (56.0, 25.0), (58.0, 25.0), (58.0, 23.0)])], polygon_id="riga_box")
    pts = [(1, 56.9, 24.1), (2, 56.95, 24.12), (3, 57.5, 21.5)]
    df = spark.createDataFrame(pts, "id int, lat double, lon double")
    tagged = assign_tiles(df, zoom=10, polygons=[box])
    rows = {r["id"]: r["region"] for r in tagged.collect()}
    assert rows == {1: "riga_box", 2: "riga_box", 3: None}
    stats = tile_stats(tagged)
    assert stats.agg(F.sum("n_rows")).first()[0] == 3


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in a field"),
            (2, "der hund und die katze ist ein tier mit fell"),
            (3, "x" * 5),
            (4, "the quick brown fox jumps over the lazy dog in a field"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_stats(df, "doc_id", "text").collect()}
    assert got[1]["lang_guess"] == "en"
    assert got[2]["lang_guess"] == "de"
    assert got[3]["lang_guess"] == "other"
    assert got[1]["n_tokens_ws"] == 12
    assert got[1]["stop_ratio"] == pytest.approx(4 / 12, abs=1e-3)
    assert got[1]["quality"] > got[3]["quality"]
    # order-sensitive fingerprint: identical docs equal, different differ
    assert got[1]["fingerprint"] == got[4]["fingerprint"]
    assert got[1]["fingerprint"] != got[2]["fingerprint"]


def test_bpe_token_count(spark):
    from osmalyzer_spark.operators.textstats import token_count_bpe

    df = spark.createDataFrame([(1, "hello, world42! foo-bar")], "id int, text string")
    n = df.select(token_count_bpe("text").alias("n")).first()["n"]
    # hello , world 42 ! foo - bar -> 8 pieces
    assert n == 8


@pytest.fixture()
def tmp_out():
    d = tempfile.mkdtemp(prefix="ckpt_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _inp(spark):
    return spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 3 % 97).alias("val")
    )


def _process(df):
    return df.withColumn("out_val", F.col("val") * 2)


def test_checkpoint_complete_run(spark, tmp_out):
    ck = CheckpointedRun(tmp_out, run_id="r1", n_buckets=8, buckets_per_batch=4)
    out = ck.run(spark, _inp(spark), _process, bucket_expr=F.pmod(F.xxhash64("id"), F.lit(8)))
    assert out.count() == 1000
    m = ck.metrics(spark)
    assert m.count() == 8
    assert m.agg(F.sum("rows_in")).first()[0] == 1000
    assert m.agg(F.sum("rows_out")).first()[0] == 1000


def test_checkpoint_resume_after_crash(spark, tmp_out):
    ck = CheckpointedRun(tmp_out, run_id="r2", n_buckets=8, buckets_per_batch=2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.run(
            spark,
            _inp(spark),
            _process,
            bucket_expr=F.pmod(F.xxhash64("id"), F.lit(8)),
            fail_after_batches=2,
        )
    done_before = ck.done_buckets(spark)
    assert len(done_before) == 4  # 2 batches x 2 buckets
    # resume: completes only the remaining buckets
    out = ck.run(spark, _inp(spark), _process, bucket_expr=F.pmod(F.xxhash64("id"), F.lit(8)))
    assert out.count() == 1000
    assert sorted(out.select("id").toPandas()["id"]) == list(range(1000))
    assert len(ck.done_buckets(spark)) == 8
    # resumed output identical to a fresh one-shot run
    fresh = _process(_inp(spark))
    assert out.select("id", "val", "out_val").exceptAll(fresh).count() == 0
    assert fresh.exceptAll(out.select("id", "val", "out_val")).count() == 0


def test_checkpoint_crash_between_data_and_progress_no_duplicates(spark, tmp_out):
    """The dangerous window: a batch's bucket DATA is on disk but its
    progress rows are not. The resume must REPLACE those partitions
    (dynamic overwrite), not append a second copy."""
    ck = CheckpointedRun(tmp_out, run_id="r3", n_buckets=8, buckets_per_batch=2)
    expr = F.pmod(F.xxhash64("id"), F.lit(8))
    with pytest.raises(RuntimeError, match="before progress"):
        ck.run(spark, _inp(spark), _process, bucket_expr=expr, fail_before_progress_batch=1)
    # batch 0 fully committed; batch 1's data written but unacknowledged
    assert len(ck.done_buckets(spark)) == 2
    out = ck.run(spark, _inp(spark), _process, bucket_expr=expr)
    assert out.count() == 1000  # exactly — no duplicate-append
    assert sorted(out.select("id").toPandas()["id"]) == list(range(1000))


def test_checkpoint_single_pass(spark, tmp_out):
    """The scale path: every pending bucket computed + written in one
    shuffle-partitioned job, with per-bucket lineage still recorded."""
    ck = CheckpointedRun(tmp_out, run_id="sp1", n_buckets=8)
    expr = F.pmod(F.xxhash64("id"), F.lit(8))
    out = ck.run_single_pass(spark, _inp(spark), _process, bucket_expr=expr)
    assert out.count() == 1000
    m = ck.metrics(spark)
    assert m.count() == 8
    assert m.agg(F.sum("rows_in")).first()[0] == 1000
    assert m.agg(F.sum("rows_out")).first()[0] == 1000


def test_checkpoint_single_pass_crash_window_resume(spark, tmp_out):
    """Crash after the single-pass data write, before progress: resume
    rewrites every unacknowledged bucket; counts stay exact."""
    ck = CheckpointedRun(tmp_out, run_id="sp2", n_buckets=8)
    expr = F.pmod(F.xxhash64("id"), F.lit(8))
    with pytest.raises(RuntimeError, match="before progress"):
        ck.run_single_pass(
            spark, _inp(spark), _process, bucket_expr=expr, fail_before_progress=True
        )
    assert len(ck.done_buckets(spark)) == 0
    out = ck.run_single_pass(spark, _inp(spark), _process, bucket_expr=expr)
    assert out.count() == 1000
    assert sorted(out.select("id").toPandas()["id"]) == list(range(1000))
    fresh = _process(_inp(spark).withColumn("__bucket", expr.cast("int"))).drop("__bucket")
    assert out.exceptAll(fresh).count() == 0 and fresh.exceptAll(out).count() == 0
