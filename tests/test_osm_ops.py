import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.geo.polygon import Polygon
from osmalyzer_spark.operators.osm import (
    double_mapped_features,
    fuzzy_relation_containment,
    junctions,
    resolve_relation_members,
    resolve_way_geometries,
    sharp_angles,
    unresolved_relations,
)


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [(1, 56.90, 24.10), (2, 56.91, 24.10), (3, 56.91, 24.11), (4, 56.90, 24.11), (5, 56.95, 24.15)],
        "id long, lat double, lon double",
    )
    ways = spark.createDataFrame(
        [(100, [1, 2, 3]), (101, [3, 4, 1]), (102, [1, 5]), (103, [1, 2, 999])],
        "id long, node_ids array<long>",
    )
    return nodes.cache(), ways.cache()


def test_resolve_way_geometries(spark, graph):
    nodes, ways = graph
    geo = {r["way_id"]: r for r in resolve_way_geometries(ways, nodes).collect()}
    g100 = geo[100]
    assert [p["node_id"] for p in g100["geometry"]] == [1, 2, 3]
    assert g100["fully_resolved"] is True
    assert g100["centroid_lat"] == pytest.approx((56.90 + 56.91 + 56.91) / 3)
    # unresolved ref 999
    assert geo[103]["fully_resolved"] is False


def test_junction_backlinks(spark, graph):
    nodes, ways = graph
    j = {r["node_id"]: r["way_ids"] for r in junctions(ways).collect()}
    assert j[1] == [100, 101, 102, 103]
    assert j[3] == [100, 101]
    assert 5 not in j  # single way


def test_relation_member_resolution(spark, graph):
    nodes, ways = graph
    relations = spark.createDataFrame(
        [
            (500, [{"type": "way", "ref": 100, "role": "outer"}, {"type": "way", "ref": 101, "role": "outer"}]),
            (501, [{"type": "way", "ref": 100, "role": "outer"}, {"type": "way", "ref": 777, "role": "outer"}]),
        ],
        "id long, members array<struct<type string, ref long, role string>>",
    )
    elements = ways.select("id", F.lit("way").alias("type"))
    resolved = resolve_relation_members(relations, elements)
    assert resolved.filter("relation_id = 500 and not resolved").count() == 0
    bad = unresolved_relations(relations, elements).collect()
    assert [(r["relation_id"], r["n_unresolved"]) for r in bad] == [(501, 1)]


def test_double_mapped_features(spark):
    # a shop node inside a shop-class closed area + a park node inside it
    nodes = spark.createDataFrame(
        [(1, 56.905, 24.105, "shop"), (2, 56.905, 24.106, "park"), (3, 57.5, 25.5, "shop")],
        "node_id long, lat double, lon double, feature_class string",
    )
    ring = [
        {"lat": 56.90, "lon": 24.10}, {"lat": 56.90, "lon": 24.11},
        {"lat": 56.91, "lon": 24.11}, {"lat": 56.91, "lon": 24.10},
    ]
    areas = spark.createDataFrame(
        [(900, "shop", ring)],
        "area_id long, area_class string, ring array<struct<lat double, lon double>>",
    )
    got = double_mapped_features(nodes, areas).collect()
    assert [(r["node_id"], r["area_id"]) for r in got] == [(1, 900)]


def test_fuzzy_relation_containment(spark):
    box = Polygon(outers=[np.array([(56.0, 24.0), (56.0, 25.0), (57.0, 25.0), (57.0, 24.0)])], polygon_id="b")
    rows = []
    # relation 1: 9/10 inside (strict), relation 2: 4/10 (loose only), 3: 1/10 (neither)
    for i in range(10):
        rows.append((1, 56.5 if i < 9 else 59.0, 24.5))
        rows.append((2, 56.5 if i < 4 else 59.0, 24.5))
        rows.append((3, 56.5 if i < 1 else 59.0, 24.5))
    df = spark.createDataFrame(rows, "relation_id long, lat double, lon double")
    got = {r["relation_id"]: r for r in fuzzy_relation_containment(df, box).collect()}
    assert got[1]["strict_inside"] and got[1]["loose_inside"]
    assert not got[2]["strict_inside"] and got[2]["loose_inside"]
    assert not got[3]["loose_inside"]


def test_sharp_angles(spark, graph):
    nodes, ways = graph
    # way 200: sharp hairpin at node B (angle ~0), way 201: straight (180)
    pts = spark.createDataFrame(
        [(10, 56.90, 24.10), (11, 56.91, 24.10), (12, 56.900001, 24.100001), (13, 56.92, 24.10)],
        "id long, lat double, lon double",
    )
    w = spark.createDataFrame(
        [(200, [10, 11, 12]), (201, [10, 11, 13])], "id long, node_ids array<long>"
    )
    geo = resolve_way_geometries(w, pts)
    sharp = sharp_angles(geo, max_angle_deg=30.0).collect()
    assert [(r["way_id"], r["node_id"]) for r in sharp] == [(200, 11)]
