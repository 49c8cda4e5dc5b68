"""BottleDepositPointsAnalyzer (reference Analyzers/POIs/
BottleDepositPointsAnalyzer.cs): the bottle-deposit network vs OSM in
three scopes, each with its own element filter and item list but shared
correlation parameters.

Semantics preserved from the reference:

- scopes (:30-58): kiosks are amenity=recycling elements whose
  `brand ?? name` (brand takes precedence and name is NOT consulted
  when brand exists — quirk preserved) lowercase-contains "depozīta" or
  "deposit"; manual locations have a `shop` key plus all three
  recycling:cans/plastic_bottles/glass_bottles = yes; vending machines
  are amenity=vending_machine + vending=bottle_return.
- correlation (:73-110): MatchDistance 75 / far 150 / Strong +500,
  strength Strong when FuzzyAddressMatcher hits the item's freeform
  address, else Good — every in-range pair correlates.
- validation (:119-156, Validator.cs:17-63 with both flags true, so
  EVERY scoped element is validated): kiosk expects
  name/brand='Depozīta punkts', brand:wikidata='Q110979381',
  building='kiosk', the three recycling=yes tags, NO recycling_type,
  and no fixme; vending machines expect the same name/brand/wikidata,
  recycling:cans/plastic_bottles='yes',
  recycling:glass_bottles in {yes, no}, NO building, and no fixme.
- shop stats (:160-199): per item list, shop names grouped
  case-insensitively with a count and the no-shop-name tally (the
  reference's first-seen spelling list is presentation only; the
  distributed group key is the lowercased name).

Spark shape: scope filters are native map expressions; each scope runs
the audited deferred-acceptance correlator; validators are one
filter+union pass over the scoped elements (no join — the rules are
per-element); stats are one groupBy(lower(shop)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmalyzer_spark.functions.address import fuzzy_address_match
from osmalyzer_spark.functions.tags import get_value, has_key
from osmalyzer_spark.operators.correlator import (
    GOOD,
    STRONG,
    CorrelatorParams,
    correlate,
)

MATCH_DISTANCE_M = 75.0
FAR_DISTANCE_M = 150.0
STRONG_EXTRA_M = 500.0

EXPECTED_NAME = "Depozīta punkts"
EXPECTED_WIKIDATA = "Q110979381"


def _deposit_name_expr() -> F.Column:
    """`brand ?? name` lowercase-contains check
    (BottleDepositPointsAnalyzer.cs:47-58)."""
    osm_name = F.coalesce(
        get_value("tags", "brand"), get_value("tags", "name")
    )
    low = F.lower(osm_name)
    return osm_name.isNotNull() & (
        low.contains("depozīta") | low.contains("deposit")
    )


def kiosk_scope(osm: DataFrame) -> DataFrame:
    return osm.filter(
        (get_value("tags", "amenity") == "recycling") & _deposit_name_expr()
    )


def manual_scope(osm: DataFrame) -> DataFrame:
    return osm.filter(
        has_key("tags", "shop")
        & (get_value("tags", "recycling:cans") == "yes")
        & (get_value("tags", "recycling:plastic_bottles") == "yes")
        & (get_value("tags", "recycling:glass_bottles") == "yes")
    )


def vending_scope(osm: DataFrame) -> DataFrame:
    return osm.filter(
        (get_value("tags", "amenity") == "vending_machine")
        & (get_value("tags", "vending") == "bottle_return")
    )


def correlate_deposit(
    spark: SparkSession, scoped: DataFrame, items: DataFrame
) -> DataFrame:
    """One scope's correlation: elements (id, tags, lat, lon) vs items
    (item_id, item_lat, item_lon, address). Strong on a fuzzy-address
    hit, Good otherwise."""
    elements = scoped.select(
        F.col("id").alias("elem_id"),
        F.col("lat").alias("elem_lat"),
        F.col("lon").alias("elem_lon"),
        get_value("tags", "addr:street").alias("street_tag"),
        get_value("tags", "addr:housenumber").alias("housenum_tag"),
    )
    params = CorrelatorParams(
        match_distance=MATCH_DISTANCE_M,
        unmatch_distance=FAR_DISTANCE_M,
        strong_extra_distance=STRONG_EXTRA_M,
        strength_expr=lambda df: F.when(
            F.col("address").isNotNull()
            & fuzzy_address_match(
                F.col("street_tag"), F.col("housenum_tag"), F.col("address")
            ),
            F.lit(STRONG),
        ).otherwise(F.lit(GOOD)),
    )
    return correlate(spark, elements, items, params).correlations


# validation rule sets: (kind, tag, expected) where expected is a string
# for HasValue, a tuple for HasAnyValue, None for DoesntHaveTag
KIOSK_RULES = [
    ("has_value", "name", EXPECTED_NAME),
    ("has_value", "brand", EXPECTED_NAME),
    ("has_value", "brand:wikidata", EXPECTED_WIKIDATA),
    ("has_value", "building", "kiosk"),
    ("has_value", "recycling:cans", "yes"),
    ("has_value", "recycling:glass_bottles", "yes"),
    ("has_value", "recycling:plastic_bottles", "yes"),
    ("no_tag", "recycling_type", None),
    ("fixme", "fixme", None),
]
VENDING_RULES = [
    ("has_value", "name", EXPECTED_NAME),
    ("has_value", "brand", EXPECTED_NAME),
    ("has_value", "brand:wikidata", EXPECTED_WIKIDATA),
    ("has_value", "recycling:cans", "yes"),
    ("any_value", "recycling:glass_bottles", ("yes", "no")),
    ("has_value", "recycling:plastic_bottles", "yes"),
    ("no_tag", "building", None),
    ("fixme", "fixme", None),
]


def validate_elements(scoped: DataFrame, rules) -> DataFrame:
    """Validator.Validate with both flags true: every scoped element is
    checked against every rule; one issue row per failing rule
    (rule kind, tag, element id, found value)."""
    structs = []
    for kind, tag, expected in rules:
        v = get_value("tags", tag)
        if kind == "has_value":
            bad = v.isNull() | (v != expected)
        elif kind == "any_value":
            bad = v.isNull() | ~v.isin(*expected)
        elif kind == "no_tag":
            bad = v.isNotNull()
        elif kind == "fixme":
            bad = v.isNotNull()
        else:  # pragma: no cover
            raise ValueError(kind)
        structs.append(
            F.when(
                bad,
                F.struct(
                    F.lit(kind).alias("rule"),
                    F.lit(tag).alias("tag"),
                    F.coalesce(v, F.lit("")).alias("found"),
                ),
            )
        )
    # one pass: each element emits its failing rules as an exploded
    # array instead of one filtered scan per rule
    return (
        scoped.select(
            F.col("id").alias("elem_id"),
            F.explode(F.filter(F.array(*structs), lambda s: s.isNotNull())).alias("i"),
        )
        .select("i.rule", "i.tag", "elem_id", "i.found")
    )


def shop_stats(items: DataFrame) -> DataFrame:
    """Case-insensitive shop-name histogram + the unspecified tally
    (BottleDepositPointsAnalyzer.cs:166-199); group key is
    lower(shop_name)."""
    named = (
        items.filter(F.col("shop_name").isNotNull())
        .groupBy(F.lower("shop_name").alias("shop"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    unspec = items.filter(F.col("shop_name").isNull()).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("").alias("shop"), "n")
    return named.unionByName(unspec)
