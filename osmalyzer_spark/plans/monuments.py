"""CulturalMonumentsAnalyzer (reference Analyzers/POIs/
CulturalMonumentsAnalyzer.cs): heritage-element correlation against the
VKPAI monument registry.

Semantics preserved from the reference:

- match strength cascade (CulturalMonumentsAnalyzer.cs
  DoesOsmNodeMatchMonument, evaluated in this order):
    1. FuzzyNameMatcher on name or old_name vs the monument name
       (lowercase/trim bidirectional containment) -> Strong
    2. ref:LV:vkpai present: int-parses equal to the monument's
       ReferenceID -> Strong, else -> Good
    3. heritage present -> Regular. The reference's `osmRef == 2 -> Good`
       branch is DEAD CODE: it re-parses `osmRefStr` (always null here,
       or the cascade would have returned at step 2) instead of
       `heritageStr` — the quirk is reproduced as-is.
    4. heritage:operator present: contains 'vkpai' or the full
       inspectorate name (lowercased) -> Good, else -> Regular
    5. element wikidata: length > 1, parses as a long, and its string
       form equals the monument's wikidata property value -> Strong
    6. otherwise Unmatched (pair dropped)
- distances: MatchDistanceParamater(30), MatchFarDistanceParamater(300),
  MatchExtraDistanceParamater(Strong, 1200).
- lone allowance (IsOsmElementHeritagePoiByItself): ref:LV:vkpai
  present, or heritage:operator containing the VKPAI names, or the
  element's parsed wikidata id belonging to the registry's wikidata id
  set.
- validation (ValidateElementHasAcceptableValue): every checked element
  carrying ref:LV:vkpai whose value is not a known monument ReferenceID
  is an issue row.

Spark shape: the wikidata-set and known-ref-id memberships are
broadcast semi/anti joins against the (small) item projections computed
BEFORE the correlator, so the strength callback and lone allowance stay
pure column expressions; the correlation itself is the general
deferred-acceptance operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmalyzer_spark.functions.strings import fuzzy_name_match
from osmalyzer_spark.operators.correlator import (
    GOOD,
    REGULAR,
    STRONG,
    UNMATCHED,
    CorrelatorParams,
    correlate,
)

MATCH_DISTANCE_M = 30.0
FAR_DISTANCE_M = 300.0
STRONG_EXTRA_M = 1200.0

VKPAI_NAMES = ("vkpai", "valsts kultūras pieminekļu aizsardzības inspekcija")


def _oper_is_vkpai(col: F.Column) -> F.Column:
    low = F.lower(col)
    cond = F.lit(False)
    for n in VKPAI_NAMES:
        cond = cond | F.coalesce(low.contains(n), F.lit(False))
    return cond


def monument_strength_expr(df: DataFrame) -> F.Column:
    """DoesOsmNodeMatchMonument as one column cascade over the pair frame
    (columns: name_tag/old_name_tag/vkpai_tag/heritage_tag/oper_tag/
    wikidata_tag from the element, item_name/ref_id/item_wd + the
    precomputed __wd element flag is NOT used here — wikidata strength
    needs the per-item equality, not set membership)."""
    name_strong = F.coalesce(
        fuzzy_name_match(F.col("name_tag"), F.col("item_name")), F.lit(False)
    ) | F.coalesce(
        fuzzy_name_match(F.col("old_name_tag"), F.col("item_name")),
        F.lit(False),
    )
    vkpai_int = F.col("vkpai_tag").try_cast("int")
    wd_long = F.col("wikidata_tag").try_cast("bigint")
    wd_strong = (
        F.col("item_wd").isNotNull()
        & F.col("wikidata_tag").isNotNull()
        & (F.length("wikidata_tag") > 1)
        & wd_long.isNotNull()
        & (wd_long.cast("string") == F.col("item_wd"))
    )
    return (
        F.when(name_strong, F.lit(STRONG))
        .when(
            F.col("vkpai_tag").isNotNull(),
            F.when(vkpai_int == F.col("ref_id"), F.lit(STRONG)).otherwise(
                F.lit(GOOD)
            ),
        )
        # reference dead-code quirk: heritage always falls to Regular
        .when(F.col("heritage_tag").isNotNull(), F.lit(REGULAR))
        .when(
            F.col("oper_tag").isNotNull(),
            F.when(_oper_is_vkpai(F.col("oper_tag")), F.lit(GOOD)).otherwise(
                F.lit(REGULAR)
            ),
        )
        .when(wd_strong, F.lit(STRONG))
        .otherwise(F.lit(UNMATCHED))
    )


def correlate_monuments(
    spark: SparkSession, elements: DataFrame, items: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (correlations, bad_ref_issues).

    elements: (elem_id, elem_lat, elem_lon, name_tag, old_name_tag,
               vkpai_tag, heritage_tag, oper_tag, wikidata_tag)
    items:    (item_id, item_lat, item_lon, item_name, ref_id, item_wd)
    """
    wd_set = items.filter(F.col("item_wd").isNotNull()).select(
        F.col("item_wd").alias("__wd")
    ).distinct()
    wd_long = F.col("wikidata_tag").try_cast("bigint")
    elements = elements.withColumn(
        "__wd_probe",
        F.when(
            F.col("wikidata_tag").isNotNull()
            & (F.length("wikidata_tag") > 1)
            & wd_long.isNotNull(),
            wd_long.cast("string"),
        ),
    )
    known_wd = (
        elements.select("elem_id", "__wd_probe")
        .join(
            F.broadcast(wd_set),
            F.col("__wd_probe") == F.col("__wd"),
            "left_semi",
        )
        .select("elem_id", F.lit(True).alias("__wd_known"))
    )
    elements = elements.join(known_wd, "elem_id", "left").withColumn(
        "__wd_known", F.coalesce(F.col("__wd_known"), F.lit(False))
    )

    params = CorrelatorParams(
        match_distance=MATCH_DISTANCE_M,
        unmatch_distance=FAR_DISTANCE_M,
        strong_extra_distance=STRONG_EXTRA_M,
        strength_expr=monument_strength_expr,
        lone_allowance_expr=lambda df: (
            F.col("vkpai_tag").isNotNull()
            | (
                F.col("oper_tag").isNotNull()
                & _oper_is_vkpai(F.col("oper_tag"))
            )
            | F.col("__wd_known")
        ),
    )
    res = correlate(spark, elements, items, params)
    return res.correlations, monument_ref_issues(elements, items)


def monument_ref_issues(elements: DataFrame, items: DataFrame) -> DataFrame:
    """ValidateElementHasAcceptableValue('ref:LV:vkpai',
    IsKnownMonumentRefID) — every element carrying ref:LV:vkpai whose
    value string-equals no monument ReferenceID
    (CulturalMonumentsAnalyzer.cs:240-255). Broadcast anti-join: the
    registry is the small side."""
    ref_set = items.filter(F.col("ref_id").isNotNull()).select(
        F.col("ref_id").cast("string").alias("__ref")
    ).distinct()
    return (
        elements.filter(F.col("vkpai_tag").isNotNull())
        .join(
            F.broadcast(ref_set),
            F.col("vkpai_tag") == F.col("__ref"),
            "left_anti",
        )
        .select("elem_id", F.col("vkpai_tag").alias("value"))
    )
