import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.geo.proj import (
    lks92_forward,
    lks92_inverse,
    lks92_to_wgs84_udf,
    wgs84_to_lks92_udf,
)


def test_lks92_roundtrip_latvia_extent():
    rng = np.random.default_rng(11)
    lat = rng.uniform(55.6, 58.1, 2000)
    lon = rng.uniform(20.9, 28.3, 2000)
    x, y = lks92_forward(lat, lon)
    lat2, lon2 = lks92_inverse(x, y)
    # series truncation: ~8e-8 deg (~8 mm) at the far-east extent
    assert np.max(np.abs(lat2 - lat)) < 2e-7
    assert np.max(np.abs(lon2 - lon)) < 2e-7


def test_lks92_anchors():
    # central meridian maps to the false easting exactly
    x, y = lks92_forward(np.array([57.0]), np.array([24.0]))
    assert x[0] == pytest.approx(500_000.0, abs=1e-6)
    # northing grows with latitude; Latvia sits in the ~150k-450k band
    xs, ys = lks92_forward(np.array([55.7, 58.0]), np.array([24.0, 24.0]))
    assert ys[0] < ys[1]
    assert 150_000 < ys[0] < 450_000 and 150_000 < ys[1] < 500_000
    # one degree of longitude at 57N is ~60.7 km easting
    x2, _ = lks92_forward(np.array([57.0]), np.array([25.0]))
    assert (x2[0] - 500_000.0) == pytest.approx(60_700, rel=0.01)


def test_lks92_udfs(spark):
    df = spark.createDataFrame(
        [(56.95, 24.10), (57.5, 27.0)], "lat double, lon double"
    )
    fwd = df.withColumn("xy", wgs84_to_lks92_udf()(F.col("lat"), F.col("lon")))
    back = fwd.withColumn("ll", lks92_to_wgs84_udf()(F.col("xy.x"), F.col("xy.y")))
    rows = back.collect()
    for r in rows:
        assert r["ll"]["lat"] == pytest.approx(r["lat"], abs=2e-7)
        assert r["ll"]["lon"] == pytest.approx(r["lon"], abs=2e-7)


def test_osmchange_spawner_document(spark):
    from osmalyzer_spark.sources.osmchange import spawner_to_osmchange

    sugg = spark.createDataFrame(
        [
            ("item_a", 56.95, 24.1, {"shop": "supermarket", "name": 'Rimi "Mini"'}),
            ("item_b", 57.0, 24.2, {"amenity": "post_box"}),
        ],
        "item_id string, lat double, lon double, suggested_tags map<string,string>",
    )
    xml = spawner_to_osmchange(sugg)
    assert xml.startswith('<?xml version="1.0"')
    assert xml.count("<create>") == 2
    assert '<node id="-1"' in xml and '<node id="-2"' in xml
    assert 'k="shop" v="supermarket"' in xml
    assert "&quot;Mini&quot;" in xml  # escaping
    assert xml.rstrip().endswith("</osmChange>")


def test_osmchange_bulk_files(spark, tmp_path):
    from osmalyzer_spark.sources.osmchange import node_xml_expr, write_osmchange_files

    df = spark.createDataFrame(
        [(i, 56.9 + i * 0.01, 24.1, {"name": f"n{i}"}) for i in range(10)],
        "id long, lat double, lon double, tags map<string,string>",
    ).repartition(2)
    blocks = df.select(node_xml_expr("modify", "id", "lat", "lon", "tags").alias("xml"))
    out = str(tmp_path / "osc")
    write_osmchange_files(blocks, "xml", out)
    txt = "".join(p.read_text() for p in (tmp_path / "osc").glob("part-*"))
    assert txt.count("<modify>") == 10
    assert txt.count("<osmChange") >= 1
