import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.datagen.images import generate_images
from osmalyzer_spark.datagen.png import decode_image, png_decode, png_encode, psnr
from osmalyzer_spark.datagen.views import data_items_view, osm_elements_view
from osmalyzer_spark.multimodal import (
    check_payload_integrity,
    mean_color_udf,
    resize_images,
)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_psnr():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert 0 < psnr(a, b) < 100


def test_jpeg_decode_wired_into_decode_image():
    """fmt='jpeg' decodes through the from-scratch baseline codec (no
    longer a stub, round 4); the mixed-format fixture below exercises it
    through integrity, resize, and feature extraction."""
    from osmalyzer_spark.datagen.jpeg import jpeg_encode

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    out = decode_image(jpeg_encode(img, quality=100), "jpeg")
    assert out.shape == img.shape
    assert psnr(img, out) >= 40.0


def test_generated_images_are_mixed_format(spark, images):
    fmts = {r["fmt"] for r in images.select("fmt").distinct().collect()}
    assert fmts == {"png", "jpeg"}


@pytest.fixture(scope="module")
def images(spark):
    return generate_images(spark, 300, seed=42).cache()


def test_images_schema_and_determinism(spark, images):
    assert images.columns == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert images.count() == 300
    # deterministic: regenerate -> identical bytes and captions
    again = generate_images(spark, 300, seed=42)
    a = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in images.collect()}
    b = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in again.collect()}
    assert a == b
    # bytes decode to (h, w, 3)
    r = images.first()
    px = decode_image(bytes(r["bytes"]), r["fmt"])
    assert px.shape == (r["h"], r["w"], 3)


def test_views_and_geotag_extent(spark, images):
    elems = osm_elements_view(images)
    rows = elems.select("elem_lat", "elem_lon", "tags").collect()
    for r in rows:
        assert 55.6 <= r["elem_lat"] <= 58.2
        assert 20.9 <= r["elem_lon"] <= 28.4
    tags = rows[0]["tags"]
    assert set(tags) == {"name", "addr:street", "addr:housenumber", "addr:parish", "shop"}
    items = data_items_view(images)
    assert 0 < items.count() < 100
    assert items.columns == ["item_id", "item_lat", "item_lon", "item_name", "item_address", "item_image_id"]


def test_payload_integrity_identity(spark, images):
    rep = check_payload_integrity(images, images)
    assert rep.filter(~F.col("ok")).count() == 0


def test_payload_integrity_catches_corruption(spark, images):
    corrupted = images.limit(20).withColumn(
        "caption", F.concat(F.col("caption"), F.lit("!"))
    )
    rep = check_payload_integrity(images.limit(20), corrupted)
    assert rep.filter(F.col("ok")).count() == 0
    assert rep.filter(~F.col("caption_equal")).count() == 20


def test_resize_plumbing(spark, images):
    small = resize_images(images.limit(10), 4, 4)
    rows = small.collect()
    for r in rows:
        assert r["w"] == 4 and r["h"] == 4
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (4, 4, 3)
    # non-image columns ride through
    assert {r["image_id"] for r in rows} == {r["image_id"] for r in images.limit(10).collect()}


def test_mean_color_feature(spark, images):
    feat = images.limit(5).select("image_id", mean_color_udf()(F.col("bytes"), F.col("fmt")).alias("rgb"))
    for r in feat.collect():
        assert len(r["rgb"]) == 3
        assert all(0 <= v <= 255 for v in r["rgb"])


def test_video_frame_sampling_rawv(spark):
    """RAWV container -> every-nth frame exploded, pixels intact."""
    import numpy as np

    from osmalyzer_spark.datagen.png import decode_image, png_encode
    from osmalyzer_spark.datagen.rawmedia import pack_rawv
    from osmalyzer_spark.multimodal import sample_video_frames

    rng = np.random.default_rng(5)
    frames = [png_encode(rng.integers(0, 255, (8, 6, 3)).astype(np.uint8)) for _ in range(7)]
    df = spark.createDataFrame(
        [(1, bytearray(pack_rawv(frames)), "rawv")],
        "image_id long, bytes binary, fmt string",
    )
    out = sample_video_frames(df, every_nth=3).collect()
    assert [(r["frame_idx"], r["w"], r["h"]) for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        (0, 6, 8), (3, 6, 8), (6, 6, 8),
    ]
    for r in out:
        want = decode_image(frames[r["frame_idx"]], "png")
        got = decode_image(bytes(r["bytes"]), "png")
        assert (want == got).all()


def test_video_unknown_codec_is_declared_stub(spark):
    import pytest as _pytest

    from osmalyzer_spark.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00"), "h264")], "image_id long, bytes binary, fmt string"
    )
    with _pytest.raises(Exception, match="no decoder for video format"):
        sample_video_frames(df).collect()


def test_audio_features_rawa(spark):
    """Sine-wave PCM: rms ~ amp/sqrt(2), zero crossings ~ 2f per second."""
    import math

    import numpy as np

    from osmalyzer_spark.datagen.rawmedia import pack_rawa
    from osmalyzer_spark.multimodal import extract_audio_features

    rate, freq, amp = 8000, 440.0, 0.5
    t = np.arange(rate) / rate  # 1 second
    pcm = (amp * 32767 * np.sin(2 * math.pi * freq * t)).astype(np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(pack_rawa(pcm, rate)), "rawa")],
        "image_id long, bytes binary, fmt string",
    )
    r = extract_audio_features(df).collect()[0]
    assert r["duration_s"] == 1.0
    assert r["rms"] == pytest.approx(amp / math.sqrt(2), rel=0.01)
    assert r["zero_cross_per_s"] == pytest.approx(2 * freq, rel=0.01)
    assert r["peak"] == pytest.approx(amp, rel=0.01)


# ---------------------------------------------------------------- pHash


def test_phash_brightness_invariance_and_determinism():
    from osmalyzer_spark.multimodal import phash64_batch

    rng = np.random.default_rng(11)
    px = rng.integers(0, 240, size=(48, 40, 3), dtype=np.uint8)
    h1 = phash64_batch([px])[0]
    h2 = phash64_batch([px + np.uint8(12)])[0]  # no clipping (<252)
    h3 = phash64_batch([px])[0]
    assert h1 == h2 == h3
    assert 0 <= int(h1) < 2**63


def test_phash_area_resize_exact_block_mean_and_upscale():
    from osmalyzer_spark.multimodal import _area_resize

    rng = np.random.default_rng(3)
    g = rng.random((64, 64))
    assert np.allclose(
        _area_resize(g, 32, 32), g.reshape(32, 2, 32, 2).mean(axis=(1, 3))
    )
    # ragged downscale preserves the global mean exactly
    g2 = rng.random((37, 53))
    assert abs(_area_resize(g2, 32, 32).mean() - g2.mean()) < 1e-9
    # upscale of a constant image is constant (substrate images are 8-33px)
    assert np.allclose(_area_resize(np.full((9, 13), 5.0), 32, 32), 5.0)


def test_phash_separates_unrelated_tolerates_tiny_noise():
    from osmalyzer_spark.multimodal import phash64_batch

    rng = np.random.default_rng(7)
    a = rng.integers(0, 240, size=(48, 48, 3), dtype=np.uint8)
    b = rng.integers(0, 240, size=(48, 48, 3), dtype=np.uint8)
    ha, hb = (int(x) for x in phash64_batch([a, b]))
    assert bin(ha ^ hb).count("1") > 16
    c = a.astype(np.int16)
    c[::7, ::5] += 1  # sparse +-1 perturbation
    hc = int(phash64_batch([c.clip(0, 255).astype(np.uint8)])[0])
    assert bin(ha ^ hc).count("1") <= 4


def test_phash_batch_matches_single():
    from osmalyzer_spark.multimodal import phash64_batch

    rng = np.random.default_rng(5)
    pixs = [
        rng.integers(0, 256, size=(int(h), int(w), 3), dtype=np.uint8)
        for h, w in rng.integers(8, 64, size=(6, 2))
    ]
    batch = phash64_batch(pixs)
    singles = np.array([phash64_batch([p])[0] for p in pixs])
    assert (batch == singles).all()


def test_phash_images_and_near_pairs_spark(spark):
    from osmalyzer_spark.datagen.png import png_encode
    from osmalyzer_spark.multimodal import (
        phash64_batch,
        phash_images,
        phash_near_pairs,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(0, 240, size=(32, 32, 3), dtype=np.uint8)
    other = rng.integers(0, 240, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        ("a", bytearray(png_encode(base)), "png"),
        ("b", bytearray(png_encode(base + np.uint8(9))), "png"),
        ("c", bytearray(png_encode(other)), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    ph = phash_images(df)
    got = {r["image_id"]: r["phash64"] for r in ph.collect()}
    # Spark column agrees with the local batch function
    assert got["a"] == int(phash64_batch([base])[0])
    assert got["a"] == got["b"] != got["c"]
    pairs = phash_near_pairs(
        ph.select("image_id", "phash64"), max_hamming=6, bands=8
    ).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [("a", "b", 0)]
