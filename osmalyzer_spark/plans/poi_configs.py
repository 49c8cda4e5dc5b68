"""Thin POI-analyzer configs: the remaining reference analyzers that are
pure parameterizations of the correlator + validator machinery, each
with its exact scope filter, distance ladder, strength callback, and
lone allowance.

- riga_drinking_water (RigaDrinkingWaterAnalyzer.cs:24-90): drinking
  water nodes, indoor!=yes, DEFAULT 15/75 ladder (the reference passes
  no distance parameters), lone allowance seasonal=yes (the city list
  is deleted in winter), and the operator/man_made/drinking_water/
  seasonal/fixme validator set.
- glika_oaks (GlikaOaksAnalyzer.cs:23-68): natural=tree nodes, far 300,
  strength Strong iff the name lowercase-contains "glika ozols" (else
  UNMATCHED — the pair is dropped), the same predicate as the lone
  allowance.
- city_meadows (CityMeadowsAnalyzer.cs:23-66): natural=grassland OR
  landuse=grass inside the city polygon, 50/100, strength Strong on
  exact name or alt_name equality, Good when the description contains
  "pilsētas pļava" case-insensitively, else UNMATCHED.
- lvm_picnic_sites (LVMPicnicSiteAnalyzer.cs:27-55): tourism=
  picnic_site, 100/300, no callback (every in-range pair Regular).
- rs_ticket_vending (RigasSatiksmeTicketVendingAnalyzer.cs:30-82):
  amenity=vending_machine + vending=public_transport_tickets,
  75/150/+500(Strong), Strong on a FuzzyAddressMatcher hit else Good,
  plus the operator/operator:wikidata/fixme validators.
- cultural_centers (CulturalCenterAnalyzer.cs:43-125,251-283):
  amenity=community_centre, 150/500/+700(Strong), strength Strong when
  NamesMatch hits name or official_name (ordinal-ignore-case equality,
  or equality after NormalizeName strips a trailing "kultūras
  nams/centrs" and a leading "... novada ", or >5-char bidirectional
  containment of the normalized forms), Good on a fuzzy-address hit,
  else Regular; lone allowance: the name contains any cultural-center
  keyword group.

All scope filters are native tag-map expressions; every config returns
the six-kind correlations frame from the audited deferred-acceptance
operator. The ValidateElementValueMatchesDataItemValue('name') pass the
cultural-center reference also runs is available via
plans/cities.validate_tags on the matched pairs (the caller joins tags
back to the correlation ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osmalyzer_spark.functions.address import fuzzy_address_match
from osmalyzer_spark.functions.tags import (
    doesnt_have_value,
    get_value,
    is_node,
)
from osmalyzer_spark.geo.polygon import Polygon, contains_expr
from osmalyzer_spark.operators.correlator import (
    GOOD,
    REGULAR,
    STRONG,
    UNMATCHED,
    CorrelatorParams,
    correlate,
)
from osmalyzer_spark.plans.deposit import validate_elements

CC_KEYWORDS = [
    ["kultūras nams"],
    ["kultūras centrs"],
    ["tautas nams"],
    ["saieta nams", "saietu nams"],
]

DRINKING_WATER_RULES = [
    ("has_value", "operator", "Rīgas ūdens"),
    ("has_value", "man_made", "water_tap"),
    ("has_value", "drinking_water", "yes"),
    ("any_value", "seasonal", ("yes", "no")),
    ("fixme", "fixme", None),
]
TICKET_VENDING_RULES = [
    ("has_value", "operator", "Rīgas satiksme"),
    ("has_value", "operator:wikidata", "Q2280274"),
    ("fixme", "fixme", None),
]


def _slim(scoped: DataFrame, tag_cols: dict[str, str]) -> DataFrame:
    cols = [
        F.col("id").alias("elem_id"),
        F.col("lat").alias("elem_lat"),
        F.col("lon").alias("elem_lon"),
    ] + [get_value("tags", tag).alias(alias) for alias, tag in tag_cols.items()]
    return scoped.select(*cols)


def _poly(df: DataFrame, polygon: Polygon | None) -> DataFrame:
    if polygon is not None:
        df = df.filter(contains_expr(polygon, "lat", "lon"))
    return df


def riga_drinking_water_scope(
    osm: DataFrame, polygon: Polygon | None = None
) -> DataFrame:
    return _poly(
        osm.filter(
            is_node("type")
            & (get_value("tags", "amenity") == "drinking_water")
            & doesnt_have_value("tags", "indoor", "yes")
        ),
        polygon,
    )


def riga_drinking_water(
    spark: SparkSession,
    osm: DataFrame,
    taps: DataFrame,
    polygon: Polygon | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (correlations, validation issues). taps: static city taps
    (item_id, item_lat, item_lon)."""
    scoped = riga_drinking_water_scope(osm, polygon)
    elements = _slim(scoped, {"seasonal_tag": "seasonal"})
    params = CorrelatorParams(  # reference passes NO distance params
        lone_allowance_expr=lambda df: F.coalesce(
            F.col("seasonal_tag") == "yes", F.lit(False)
        ),
    )
    res = correlate(spark, elements, taps, params)
    return res.correlations, validate_elements(scoped, DRINKING_WATER_RULES)


def glika_strength(name: Column) -> Column:
    return F.coalesce(
        F.lower(name).contains("glika ozols"), F.lit(False)
    )


def glika_oaks(
    spark: SparkSession, osm: DataFrame, oaks: DataFrame
) -> DataFrame:
    trees = osm.filter(
        is_node("type") & (get_value("tags", "natural") == "tree")
    )
    elements = _slim(trees, {"name_tag": "name"})
    params = CorrelatorParams(
        unmatch_distance=300.0,  # MatchFarDistanceParamater(300)
        strength_expr=lambda df: F.when(
            glika_strength(F.col("name_tag")), F.lit(STRONG)
        ).otherwise(F.lit(UNMATCHED)),
        lone_allowance_expr=lambda df: glika_strength(F.col("name_tag")),
    )
    return correlate(spark, elements, oaks, params).correlations


def city_meadows(
    spark: SparkSession,
    osm: DataFrame,
    meadows: DataFrame,
    polygon: Polygon | None = None,
) -> DataFrame:
    """meadows: (item_id, item_lat, item_lon, item_name)."""
    scoped = _poly(
        osm.filter(
            (get_value("tags", "natural") == "grassland")
            | (get_value("tags", "landuse") == "grass")
        ),
        polygon,
    )
    elements = _slim(
        scoped,
        {"name_tag": "name", "alt_name_tag": "alt_name", "descr_tag": "description"},
    )
    params = CorrelatorParams(
        match_distance=50.0,
        unmatch_distance=100.0,
        strength_expr=lambda df: F.when(
            F.coalesce(F.col("name_tag") == F.col("item_name"), F.lit(False))
            | F.coalesce(
                F.col("alt_name_tag") == F.col("item_name"), F.lit(False)
            ),
            F.lit(STRONG),
        )
        .when(
            F.coalesce(
                F.lower(F.col("descr_tag")).contains("pilsētas pļava"),
                F.lit(False),
            ),
            F.lit(GOOD),
        )
        .otherwise(F.lit(UNMATCHED)),
    )
    return correlate(spark, elements, meadows, params).correlations


def lvm_picnic_sites(
    spark: SparkSession, osm: DataFrame, sites: DataFrame
) -> DataFrame:
    scoped = osm.filter(get_value("tags", "tourism") == "picnic_site")
    params = CorrelatorParams(match_distance=100.0, unmatch_distance=300.0)
    return correlate(spark, _slim(scoped, {}), sites, params).correlations


def rs_ticket_vending_scope(osm: DataFrame) -> DataFrame:
    return osm.filter(
        (get_value("tags", "amenity") == "vending_machine")
        & (get_value("tags", "vending") == "public_transport_tickets")
    )


def rs_ticket_vending(
    spark: SparkSession, osm: DataFrame, machines: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """machines: (item_id, item_lat, item_lon, address). Returns
    (correlations, validation issues)."""
    scoped = rs_ticket_vending_scope(osm)
    elements = _slim(
        scoped,
        {"street_tag": "addr:street", "housenum_tag": "addr:housenumber"},
    )
    params = CorrelatorParams(
        match_distance=75.0,
        unmatch_distance=150.0,
        strong_extra_distance=500.0,
        strength_expr=lambda df: F.when(
            F.col("address").isNotNull()
            & fuzzy_address_match(
                F.col("street_tag"), F.col("housenum_tag"), F.col("address")
            ),
            F.lit(STRONG),
        ).otherwise(F.lit(GOOD)),
    )
    res = correlate(spark, elements, machines, params)
    return res.correlations, validate_elements(scoped, TICKET_VENDING_RULES)


def _cc_normalize(c: Column) -> Column:
    """NormalizeName (CulturalCenterAnalyzer.cs:274-283). (?iu), not
    (?i): Java's bare CASE_INSENSITIVE is ASCII-only while the C#
    RegexOptions.IgnoreCase folds Unicode, so the ū in "kultūras" needs
    UNICODE_CASE to strip uppercase forms."""
    c = F.trim(c)
    c = F.regexp_replace(c, r"(?iu)\s+kultūras (nams|centrs)$", "")
    c = F.regexp_replace(c, r"(?iu)^.+?\s+novada\s+", "")
    return c


def cc_names_match(data_name: Column, osm_name: Column) -> Column:
    """NamesMatch (CulturalCenterAnalyzer.cs:251-271)."""
    direct = F.lower(data_name) == F.lower(osm_name)
    nd, no = _cc_normalize(data_name), _cc_normalize(osm_name)
    norm_eq = F.lower(nd) == F.lower(no)
    contain = (
        (F.length(nd) > 5)
        & (F.length(no) > 5)
        & (
            F.lower(no).contains(F.lower(nd))
            | F.lower(nd).contains(F.lower(no))
        )
    )
    return F.coalesce(direct | norm_eq | contain, F.lit(False))


def cc_looks_like(name: Column) -> Column:
    """LooksLikeCulturalCenter (CulturalCenterAnalyzer.cs:88-103)."""
    low = F.lower(name)
    out = F.lit(False)
    for group in CC_KEYWORDS:
        for kw in group:
            out = out | F.coalesce(low.contains(kw), F.lit(False))
    return out


def _cc_name_cols(name: Column, prefix: str) -> list[Column]:
    """Per-SIDE precomputed NamesMatch inputs: the regex normalization
    cascade runs once per element/item row instead of once per candidate
    PAIR (pairs >> rows; guide §2.3 'aggregate before you shuffle'
    applied to expression work). cc_names_match over these columns is
    term-for-term the pair expression it replaces."""
    norm = _cc_normalize(name)
    return [
        F.lower(name).alias(f"{prefix}_low"),
        F.lower(norm).alias(f"{prefix}_nlow"),
        F.length(norm).alias(f"{prefix}_nlen"),
    ]


def _cc_match_pre(d: str, o: str) -> Column:
    """cc_names_match over `_cc_name_cols` columns (d/o prefixes)."""
    direct = F.col(f"{d}_low") == F.col(f"{o}_low")
    norm_eq = F.col(f"{d}_nlow") == F.col(f"{o}_nlow")
    contain = (
        (F.col(f"{d}_nlen") > 5)
        & (F.col(f"{o}_nlen") > 5)
        & (
            F.col(f"{o}_nlow").contains(F.col(f"{d}_nlow"))
            | F.col(f"{d}_nlow").contains(F.col(f"{o}_nlow"))
        )
    )
    return F.coalesce(direct | norm_eq | contain, F.lit(False))


def cultural_centers(
    spark: SparkSession,
    osm: DataFrame,
    centers: DataFrame,
    polygon: Polygon | None = None,
) -> DataFrame:
    """centers: (item_id, item_lat, item_lon, item_name, address)."""
    scoped = _poly(
        osm.filter(get_value("tags", "amenity") == "community_centre"), polygon
    )
    elements = _slim(
        scoped,
        {
            "name_tag": "name",
            "official_name_tag": "official_name",
            "street_tag": "addr:street",
            "housenum_tag": "addr:housenumber",
        },
    )
    elements = elements.select(
        "*",
        *_cc_name_cols(F.col("name_tag"), "on"),
        *_cc_name_cols(F.col("official_name_tag"), "oo"),
    )
    centers = centers.select("*", *_cc_name_cols(F.col("item_name"), "dn"))
    params = CorrelatorParams(
        match_distance=150.0,
        unmatch_distance=500.0,
        strong_extra_distance=700.0,
        strength_expr=lambda df: F.when(
            (F.col("name_tag").isNotNull() & _cc_match_pre("dn", "on"))
            | (
                F.col("official_name_tag").isNotNull()
                & _cc_match_pre("dn", "oo")
            ),
            F.lit(STRONG),
        )
        .when(
            F.col("address").isNotNull()
            & (F.col("address") != "")
            & fuzzy_address_match(
                F.col("street_tag"), F.col("housenum_tag"), F.col("address")
            ),
            F.lit(GOOD),
        )
        .otherwise(F.lit(REGULAR)),
        lone_allowance_expr=lambda df: F.col("name_tag").isNotNull()
        & cc_looks_like(F.col("name_tag")),
    )
    return correlate(spark, elements, centers, params).correlations


EDU_TYPES = [  # EducationalInstitutionAnalyzer.cs:26-29, amenity value per type
    ("kindergarten", "kindergarten"),
    ("school", "school"),
    ("college", "college"),
    ("university", "university"),
]


def educational_institutions(osm: DataFrame) -> DataFrame:
    """EducationalInstitutionAnalyzer (:20-160): per-type name groups —
    each amenity class grouped by name (missing name -> the reference's
    '∅' placeholder) with occurrence counts, plus the per-type totals.
    One scan: the four amenity filters are one isin + a type column.

    Output: (kind, edu_type, name, n) with kind in {total, name_group}.
    """
    amap = {a: t for t, a in EDU_TYPES}
    amen = get_value("tags", "amenity")
    typ = None
    for a, t in amap.items():
        typ = F.when(amen == a, F.lit(t)) if typ is None else typ.when(
            amen == a, F.lit(t)
        )
    scoped = osm.filter(amen.isin(*[a for _, a in EDU_TYPES])).select(
        typ.alias("edu_type"),
        F.coalesce(get_value("tags", "name"), F.lit("∅")).alias("name"),
    )
    groups = scoped.groupBy("edu_type", "name").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = scoped.groupBy("edu_type").agg(F.count(F.lit(1)).alias("n"))
    return totals.select(
        F.lit("total").alias("kind"), "edu_type", F.lit("").alias("name"), "n"
    ).unionByName(
        groups.select(F.lit("name_group").alias("kind"), "edu_type", "name", "n")
    )


# --- State Services group (Analyzers/State Services/*.cs) -----------------

COURTHOUSE_KEYWORDS = [  # CourthouseAnalyzer.cs:16-21
    "tiesu nams", "rajona tiesa", "apgabaltiesa", "augstākā tiesa",
]


def _contains_ci(a: Column, b: Column) -> Column:
    return F.coalesce(F.lower(a).contains(F.lower(b)), F.lit(False))


def _bidi_contains_ci(a: Column, b: Column) -> Column:
    """InvariantCultureIgnoreCase bidirectional containment."""
    return _contains_ci(a, b) | _contains_ci(b, a)


def notary_offices(
    spark: SparkSession, osm: DataFrame, offices: DataFrame
) -> DataFrame:
    """NotaryAnalyzer (:28-67): office=notary, 100/300/+500(Strong).
    Strength: fuzzy-address hit AND a name hit -> Strong; either alone
    -> Good; neither -> Regular (NameMatches is bidirectional
    case-insensitive containment, :69-79).
    offices: (item_id, item_lat, item_lon, item_name, address)."""
    scoped = osm.filter(get_value("tags", "office") == "notary")
    elements = _slim(
        scoped,
        {"name_tag": "name", "street_tag": "addr:street",
         "housenum_tag": "addr:housenumber"},
    )
    addr_hit = F.col("address").isNotNull() & fuzzy_address_match(
        F.col("street_tag"), F.col("housenum_tag"), F.col("address")
    )
    name_hit = F.col("name_tag").isNotNull() & _bidi_contains_ci(
        F.col("name_tag"), F.col("item_name")
    )
    params = CorrelatorParams(
        match_distance=100.0,
        unmatch_distance=300.0,
        strong_extra_distance=500.0,
        strength_expr=lambda df: F.when(addr_hit & name_hit, F.lit(STRONG))
        .when(addr_hit | name_hit, F.lit(GOOD))
        .otherwise(F.lit(REGULAR)),
    )
    return correlate(spark, elements, offices, params).correlations


def validate_tag_suffixes(
    matched: DataFrame,
    prefix: str,
    expected_value: str,
    suffixes_col: str = "suffixes",
) -> DataFrame:
    """ValidateElementTagSuffixesMatchDataItemValues (Validator.cs:
    505-590): over MATCHED pairs only — every expected suffix must be
    present as `prefix:suffix == expected_value` (missing or different
    value is an issue), and every existing `prefix:*` tag whose suffix
    is not in the item's list is an `extra` issue.

    matched: (elem_id, item_id, tags, <suffixes_col: array<string>>).
    Output: (kind, elem_id, item_id, suffix, found) with kind in
    {suffix_missing, suffix_wrong, suffix_extra}.
    """
    pre = prefix + ":"
    base = matched.filter(F.col(suffixes_col).isNotNull())
    exp = base.select(
        "elem_id", "item_id", "tags",
        F.explode(suffixes_col).alias("suffix"),
    ).withColumn(
        "found",
        F.element_at(F.col("tags"), F.concat(F.lit(pre), F.col("suffix"))),
    )
    missing = exp.filter(F.col("found").isNull()).select(
        F.lit("suffix_missing").alias("kind"), "elem_id", "item_id",
        "suffix", F.lit("").alias("found"),
    )
    wrong = exp.filter(
        F.col("found").isNotNull() & (F.col("found") != expected_value)
    ).select(
        F.lit("suffix_wrong").alias("kind"), "elem_id", "item_id",
        "suffix", "found",
    )
    existing = base.select(
        "elem_id", "item_id", F.col(suffixes_col).alias("__want"),
        F.explode(
            F.map_filter(F.col("tags"), lambda k, v: k.startswith(pre))
        ).alias("k", "v"),
    ).withColumn("suffix", F.expr(f"substring(k, {len(pre) + 1})"))
    extra = existing.filter(
        ~F.array_contains(F.col("__want"), F.col("suffix"))
    ).select(
        F.lit("suffix_extra").alias("kind"), "elem_id", "item_id",
        "suffix", F.col("v").alias("found"),
    )
    return missing.unionByName(wrong).unionByName(extra)


def courthouses(
    spark: SparkSession, osm: DataFrame, courts: DataFrame
) -> DataFrame:
    """CourthouseAnalyzer (:32-125): amenity=courthouse,
    100/300/+700(Strong). A "different type of courthouse" name
    (zemesgrāmat/bāriņties, :128-137) is UNMATCHED outright; a
    fuzzy-address hit is Strong when GoodNameMatch (bidirectional
    containment or a shared specific keyword, :90-109) else Good;
    everything else Regular. Lone allowance: not-different-type AND the
    name contains a courthouse keyword.
    courts: (item_id, item_lat, item_lon, item_name, address)."""
    scoped = osm.filter(get_value("tags", "amenity") == "courthouse")
    elements = _slim(
        scoped,
        {"name_tag": "name", "street_tag": "addr:street",
         "housenum_tag": "addr:housenumber"},
    )
    low = F.lower(F.col("name_tag"))
    different = F.coalesce(
        low.contains("zemesgrāmat") | low.contains("bāriņties"), F.lit(False)
    )
    addr_hit = F.col("address").isNotNull() & fuzzy_address_match(
        F.col("street_tag"), F.col("housenum_tag"), F.col("address")
    )
    kw_shared = F.lit(False)
    kw_elem = F.lit(False)
    for kw in COURTHOUSE_KEYWORDS:
        kw_shared = kw_shared | (
            _contains_ci(F.col("name_tag"), F.lit(kw))
            & _contains_ci(F.col("item_name"), F.lit(kw))
        )
        kw_elem = kw_elem | _contains_ci(F.col("name_tag"), F.lit(kw))
    good_name = F.col("name_tag").isNotNull() & (
        _bidi_contains_ci(F.col("name_tag"), F.col("item_name")) | kw_shared
    )
    params = CorrelatorParams(
        match_distance=100.0,
        unmatch_distance=300.0,
        strong_extra_distance=700.0,
        strength_expr=lambda df: F.when(different, F.lit(UNMATCHED))
        .when(addr_hit & good_name, F.lit(STRONG))
        .when(addr_hit, F.lit(GOOD))
        .otherwise(F.lit(REGULAR)),
        lone_allowance_expr=lambda df: ~different
        & F.col("name_tag").isNotNull()
        & kw_elem,
    )
    return correlate(spark, elements, courts, params).correlations


def state_police(
    spark: SparkSession,
    osm: DataFrame,
    offices: DataFrame,
    polygon: Polygon | None = None,
) -> DataFrame:
    """StatePoliceAnalyzer (:28-46): amenity=police inside the country
    polygon, 100/200, no strength callback; lone allowance: the element
    does NOT look like some other police (name or operator containing
    "pašvaldīb" case-insensitively, :50-70)."""
    scoped = _poly(osm.filter(get_value("tags", "amenity") == "police"), polygon)
    elements = _slim(
        scoped, {"name_tag": "name", "operator_tag": "operator"}
    )
    other = _contains_ci(F.col("name_tag"), F.lit("pašvaldīb")) | _contains_ci(
        F.col("operator_tag"), F.lit("pašvaldīb")
    )
    params = CorrelatorParams(
        match_distance=100.0,
        unmatch_distance=200.0,
        lone_allowance_expr=lambda df: ~other,
    )
    return correlate(spark, elements, offices, params).correlations
