"""CityAnalyzer composite (plans/cities.py): rectangle boundary-coverage
UDF vs the direct numpy path, correlation determinism, and tag
validation semantics."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osmalyzer_spark.geo.polygon import overlap_coverage
from osmalyzer_spark.plans.cities import (
    match_cities,
    rect_coverage_udf,
    validate_tags,
)


def _rect(lat0, lon0, lat1, lon1):
    return np.array(
        [[lat0, lon0], [lat0, lon1], [lat1, lon1], [lat1, lon0]]
    )


class TestRectCoverageUdf:
    def test_matches_direct_overlap_coverage(self, spark):
        cases = [
            # identical rects -> 1.0
            (56.0, 24.0, 56.004, 24.006, 56.0, 24.0, 56.004, 24.006),
            # 25 m lon shift -> partial
            (56.0, 24.0, 56.004, 24.006,
             56.0, 24.0 + 25.0 / 111139.0, 56.004, 24.006 + 25.0 / 111139.0),
            # disjoint -> 0.0
            (56.0, 24.0, 56.004, 24.006, 57.0, 25.0, 57.004, 25.006),
        ]
        df = spark.createDataFrame(
            [Row(a0=a, a1=b, a2=c, a3=d, b0=e, b1=f, b2=g, b3=h)
             for a, b, c, d, e, f, g, h in cases]
        )
        got = [
            r.cov
            for r in df.select(
                rect_coverage_udf()(
                    "a0", "a1", "a2", "a3", "b0", "b1", "b2", "b3"
                ).alias("cov")
            ).collect()
        ]
        for (a, b, c, d, e, f, g, h), v in zip(cases, got):
            want = overlap_coverage(_rect(a, b, c, d), _rect(e, f, g, h))
            assert v == want
        assert got[0] == 1.0
        assert 0.0 < got[1] < 1.0
        assert got[2] == 0.0

    def test_small_shift_within_epsilon_full_coverage(self, spark):
        # 4 m < epsilon=10 m: every sample within tolerance
        a = _rect(56.0, 24.0, 56.004, 24.006)
        b = _rect(56.0, 24.0 + 4.0 / 111139.0, 56.004, 24.006 + 4.0 / 111139.0)
        assert overlap_coverage(a, b) == 1.0


class TestMatchCities:
    def _dfs(self, spark):
        items = spark.createDataFrame(
            [
                Row(item_id=1, name="Pilseta 1", addr_id="ADDR1",
                    item_lat=56.0, item_lon=24.0),
                Row(item_id=2, name="Pilseta 2", addr_id="ADDR2",
                    item_lat=56.5, item_lon=24.5),
            ]
        )
        rels = spark.createDataFrame(
            [
                # matches item 1 by name, 0 m away
                Row(elem_id=10, name_tag="Pilseta 1", addr_tag=None,
                    elem_lat=56.0, elem_lon=24.0),
                # also matches item 1 (by addr), farther -> loses
                Row(elem_id=11, name_tag="x", addr_tag="ADDR1",
                    elem_lat=56.01, elem_lon=24.0),
                # matches item 2 but beyond the 30 km far cap
                Row(elem_id=12, name_tag="Pilseta 2", addr_tag=None,
                    elem_lat=57.9, elem_lon=24.5),
            ]
        )
        return items, rels

    def test_closest_wins_and_far_cap(self, spark):
        items, rels = self._dfs(spark)
        got = {
            (r.item_id, r.elem_id)
            for r in match_cities(items, rels).collect()
        }
        assert got == {(1, 10)}

    def test_far_band_kept(self, spark):
        items, rels = self._dfs(spark)
        # relation 16.7 km away: matched (far band), distance reported
        rels2 = rels.union(
            spark.createDataFrame(
                [Row(elem_id=13, name_tag="Pilseta 2", addr_tag="",
                     elem_lat=56.65, elem_lon=24.5)],
                schema=rels.schema,
            )
        )
        rows = {r.elem_id: r.dist_m for r in
                match_cities(items, rels2).collect()}
        assert set(rows) == {10, 13}
        assert 10_000 < rows[13] < 30_000


class TestValidateTags:
    def test_null_safe_rules(self, spark):
        mm = spark.createDataFrame(
            [
                Row(item_id=1, elem_id=10, name_tag="A", name="A",
                    pop_tag=None, exp_pop="5"),
                Row(item_id=2, elem_id=11, name_tag="B", name="C",
                    pop_tag="7", exp_pop="7"),
                Row(item_id=3, elem_id=12, name_tag=None, name=None,
                    pop_tag=None, exp_pop=None),
            ]
        )
        got = validate_tags(
            mm, [("name", "name_tag", "name"),
                 ("population", "pop_tag", "exp_pop")]
        ).collect()
        issues = {(r.item_id, r.rule, r.found, r.expected) for r in got}
        assert issues == {
            (1, "population", None, "5"),
            (2, "name", "B", "C"),
        }


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q65_runs_and_kinds(spark, sf_dir):
    from osmalyzer_spark.plans.driver_queries import q65_city_analyzer

    rows = q65_city_analyzer(spark, sf_dir).collect()
    kinds = {r.kind for r in rows}
    assert "matched" in kinds and "missing_city" in kinds
    for r in rows:
        if r.kind == "boundary":
            assert r.coverage is not None and 0.0 <= r.coverage < 0.99
            assert r.rule in ("problem", "dubious")
