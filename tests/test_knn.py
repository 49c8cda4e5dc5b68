import numpy as np
import pytest
from pyspark.sql import functions as F

from osmalyzer_spark.operators.knn import SaltSpec, closest_join, radius_join
from tests.oracle_correlator import haversine


RNG = np.random.default_rng(123)


@pytest.fixture(scope="module")
def scene(spark):
    n_elem, n_item = 2000, 150
    elat = RNG.uniform(56.8, 57.1, n_elem)
    elon = RNG.uniform(23.9, 24.4, n_elem)
    ilat = RNG.uniform(56.8, 57.1, n_item)
    ilon = RNG.uniform(23.9, 24.4, n_item)
    elems = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(elat, elon))],
        "elem_id long, elem_lat double, elem_lon double",
    ).cache()
    items = spark.createDataFrame(
        [(f"it{i:04d}", float(a), float(b)) for i, (a, b) in enumerate(zip(ilat, ilon))],
        "item_id string, item_lat double, item_lon double",
    ).cache()
    brute = {}
    for i, (a, b) in enumerate(zip(ilat, ilon)):
        ds = [(haversine(a, b, c, d), j) for j, (c, d) in enumerate(zip(elat, elon))]
        brute[f"it{i:04d}"] = sorted(ds)
    return elems, items, brute


def _expected_pairs(brute, radius):
    return {
        (iid, j) for iid, ds in brute.items() for d, j in ds if d <= radius
    }


@pytest.mark.parametrize("radius", [200.0, 800.0])
def test_radius_join_matches_brute_force(spark, scene, radius):
    elems, items, brute = scene
    got = radius_join(
        items,
        elems,
        radius,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
    )
    got_pairs = {(r["item_id"], r["elem_id"]) for r in got.collect()}
    assert got_pairs == _expected_pairs(brute, radius)


def test_radius_join_salted_same_result(spark, scene):
    elems, items, brute = scene
    got = radius_join(
        items,
        elems,
        500.0,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
        salt=SaltSpec(threshold=50, max_factor=8),  # force salting on this data
    )
    got_pairs = {(r["item_id"], r["elem_id"]) for r in got.collect()}
    assert got_pairs == _expected_pairs(brute, 500.0)


def test_closest_join_top1(spark, scene):
    elems, items, brute = scene
    got = closest_join(
        items,
        elems,
        2000.0,
        probe_id="item_id",
        build_id="elem_id",
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
    )
    rows = {r["item_id"]: (r["elem_id"], r["dist_m"]) for r in got.collect()}
    for iid, ds in brute.items():
        if ds and ds[0][0] <= 2000.0:
            d, j = ds[0]
            assert rows[iid][0] == j
            assert rows[iid][1] == pytest.approx(d, rel=1e-9)
        else:
            assert iid not in rows


def test_closest_join_k3(spark, scene):
    elems, items, brute = scene
    got = closest_join(
        items,
        elems,
        2000.0,
        probe_id="item_id",
        build_id="elem_id",
        k=3,
        probe_coords=("item_lat", "item_lon"),
        build_coords=("elem_lat", "elem_lon"),
    )
    rows = {}
    for r in got.collect():
        rows.setdefault(r["item_id"], []).append((r["knn_rank"], r["elem_id"]))
    for iid, ds in brute.items():
        want = [j for d, j in ds[:3] if d <= 2000.0]
        have = [e for _, e in sorted(rows.get(iid, []))]
        assert have == want


def test_column_collision_rejected(spark, scene):
    elems, items, _ = scene
    with pytest.raises(ValueError, match="collision"):
        radius_join(items, items, 100.0, probe_coords=("item_lat", "item_lon"), build_coords=("item_lat", "item_lon"))
