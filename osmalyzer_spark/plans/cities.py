"""CityAnalyzer composite (reference Analyzers/Administrative/
CityAnalyzer.cs): name/address-keyed city correlation, official-vs-mapped
boundary overlap validation, and per-item tag validation.

Semantics preserved from the reference:

- match strength (CityAnalyzer.cs GetCityMatchStrength): an OSM relation
  matches a city item when its ``ref:LV:addr`` equals the item's address
  id OR its ``name`` equals the item's name; both are Strong, so the
  correlator keeps whichever candidate is closest (match distance
  10 000 m, far distance 30 000 m — pairs in (10 km, 30 km] are reported
  by MatchedFarPairBatch but remain matched correlations).
- boundary validation (CityAnalyzer.cs:195-260): for every matched
  relation, compare the mapped boundary against the official city
  polygon with ``GetOverlapCoveragePercent`` (OsmPolygon.cs:160-215:
  symmetric min of the two directed coverages; sample points along the
  source perimeter in degree space, a point counts as covered when it
  lies within epsilon=10 m (at 111 139 m/deg) of the target ring;
  sample step = length / min(maxSamples, max(10, int(length/eps)))).
  Coverage < 0.99 is reported — Problem below 0.95, Dubious otherwise;
  a relation without a valid polygon is its own issue row.
- tag validation (CityAnalyzer.cs Validator block): per matched pair,
  the element tag must equal the item-derived expected value
  (ValidateElementValueMatchesDataItemValue, Validator.cs) — here the
  name / place / admin_level / ref / population rules.
- lone elements (DoesOsmElementLookLikeACity): unmatched relations are
  reported when tagged place=city, or carrying no place tag at all
  (the reference's admin-level fallback accepts those).

Spark shape: the candidate generation is two equi-joins (address id,
name) unioned — never a distance cross join; the one-per-item /
one-per-element selection is a pair of window ranks over (distance,
id); the coverage check is a vectorized pandas UDF over the few matched
boundary pairs (each call runs the general ring-sampling numpy path in
geo/polygon.py). No driver loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmalyzer_spark.geo.polygon import overlap_coverage

MATCH_DISTANCE_M = 10_000.0  # CityAnalyzer.cs MatchDistanceParamater
FAR_DISTANCE_M = 30_000.0  # CityAnalyzer.cs MatchFarDistanceParamater
COVERAGE_LIMIT = 0.99  # CityAnalyzer.cs matchLimit
COVERAGE_PROBLEM = 0.95  # CityAnalyzer.cs Problem/Dubious split


def rect_coverage_udf(epsilon_m: float = 10.0, max_samples: int = 300):
    """pandas UDF: boundary-overlap coverage between two axis-aligned
    rectangles given as (lat0, lon0, lat1, lon1) corner columns.

    Each row builds the two 4-point rings and runs the general
    ``overlap_coverage`` sampling path (geo/polygon.py, the
    OsmPolygon.GetOverlapCoveragePercent semantics) — rectangles are
    the analytically-replayable instance the DuckDB oracle can mirror
    sample-for-sample.
    """

    @F.pandas_udf(T.DoubleType())
    def _cov(
        a0lat: pd.Series, a0lon: pd.Series, a1lat: pd.Series, a1lon: pd.Series,
        b0lat: pd.Series, b0lon: pd.Series, b1lat: pd.Series, b1lon: pd.Series,
    ) -> pd.Series:
        out = np.empty(len(a0lat))
        for i in range(len(a0lat)):
            ra = np.array(
                [
                    [a0lat.iloc[i], a0lon.iloc[i]],
                    [a0lat.iloc[i], a1lon.iloc[i]],
                    [a1lat.iloc[i], a1lon.iloc[i]],
                    [a1lat.iloc[i], a0lon.iloc[i]],
                ]
            )
            rb = np.array(
                [
                    [b0lat.iloc[i], b0lon.iloc[i]],
                    [b0lat.iloc[i], b1lon.iloc[i]],
                    [b1lat.iloc[i], b1lon.iloc[i]],
                    [b1lat.iloc[i], b0lon.iloc[i]],
                ]
            )
            out[i] = overlap_coverage(ra, rb, epsilon_m, max_samples)
        return pd.Series(out)

    return _cov


def match_cities(items: DataFrame, relations: DataFrame) -> DataFrame:
    """CityAnalyzer correlation: items x relations candidates over the
    address-id and name channels, distance-capped, one relation per item
    and one item per relation, closest-first.

    items:     (item_id, name, addr_id, item_lat, item_lon)
    relations: (elem_id, name_tag, addr_tag, elem_lat, elem_lon)

    Returns (item_id, elem_id, dist_m) — ``dist_m`` in meters, far
    pairs (> MATCH_DISTANCE_M) included up to FAR_DISTANCE_M like the
    reference's MatchedFarPairBatch.
    """
    from osmalyzer_spark.geo.distance import haversine_m

    by_addr = items.join(
        relations, items["addr_id"] == relations["addr_tag"], "inner"
    )
    by_name = items.join(
        relations, items["name"] == relations["name_tag"], "inner"
    )
    cand = (
        by_addr.unionByName(by_name)
        .select("item_id", "elem_id", "item_lat", "item_lon",
                "elem_lat", "elem_lon")
        .dropDuplicates(["item_id", "elem_id"])
        .withColumn(
            "dist_m",
            haversine_m(
                F.col("item_lat"), F.col("item_lon"),
                F.col("elem_lat"), F.col("elem_lon"),
            ),
        )
        .filter(F.col("dist_m") <= F.lit(FAR_DISTANCE_M))
    )
    # Closest-first, deterministic: rank per item, then per element.
    w_item = Window.partitionBy("item_id").orderBy("dist_m", "elem_id")
    w_elem = Window.partitionBy("elem_id").orderBy("dist_m", "item_id")
    return (
        cand.withColumn("r_item", F.row_number().over(w_item))
        .filter(F.col("r_item") == 1)
        .withColumn("r_elem", F.row_number().over(w_elem))
        .filter(F.col("r_elem") == 1)
        .select("item_id", "elem_id", "dist_m")
    )


def validate_tags(
    matched: DataFrame, rules: list[tuple[str, str, str]]
) -> DataFrame:
    """Per-item tag validation (Validator.cs
    ValidateElementValueMatchesDataItemValue): for each (rule, found
    column, expected column), emit an issue row when the element value
    differs (null-safe) from the item-derived expected value."""
    # one pass: each row emits its failing rules as an exploded array
    # (a per-rule filtered scan would re-execute the upstream plan once
    # per rule)
    checks = F.array(
        *[
            F.when(
                ~F.col(found_col).eqNullSafe(F.col(expected_col)),
                F.struct(
                    F.lit(rule).alias("rule"),
                    F.col(found_col).alias("found"),
                    F.col(expected_col).alias("expected"),
                ),
            )
            for rule, found_col, expected_col in rules
        ]
    )
    return (
        matched.select(
            "item_id",
            "elem_id",
            F.explode(F.filter(checks, lambda s: s.isNotNull())).alias("i"),
        )
        .select("item_id", "elem_id", "i.rule", "i.found", "i.expected")
    )
