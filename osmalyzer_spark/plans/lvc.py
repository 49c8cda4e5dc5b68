"""LVCRoadAnalyzer (reference Analyzers/Roads/LVCRoadAnalyzer.cs): the
state road-register ("road law") cross-reference over ref-tagged ways
and road route relations.

Semantics preserved from the reference:

- way scope (LVCRoadAnalyzer.cs:29-48): ways with `highway` AND `ref`,
  minus any carrying `aeroway`/`abandoned:aeroway`/`disused:aeroway`/
  `railway`; relation scope: type=route + route=road + `ref` where
  EVERY `;`-split ref token passes IsValidRef (SplitValuesCheck is
  all-tokens, Core/Filters/SplitValuesCheck.cs:24-44). Both sides are
  then clipped to the country polygon.
- IsValidRef (:400-418): ^[AVP][1-9][0-9]{0,3}$ with per-letter number
  ceilings A<=30 / P<=300 / V<=3000. IsExcludedRef (:420-443): the four
  municipal-register patterns.
- "recognized" ways: ALL split ref tokens valid; road groups are per
  SPLIT token (GroupByValues(split=true), Core/OsmData.cs:391-439), so
  a `V12;P5` way belongs to both groups.
- map vs law membership both ways (:71-119), law shared-segment pairs
  whose partner never co-occurs on a mapped way that carries the key
  (:122-176, guarded on the key being mapped at all), co-occurring ref
  pairs not in the law with the all-roundabout exemption (:178-257,
  over ALL reffed ways, recognized or not), route-relation presence by
  RAW ref string equality against mapped group values (:269-289 — the
  reference compares the unsplit relation ref), duplicate-code
  relations, and the unrecognized-ref tail where excluded refs are
  counted as a distinct-VALUE delta (:352-371: both SplitValuesCheck
  passes are all-tokens, so a mixed valid+invalid ref is in NEITHER the
  recognized nor the unrecognized population — quirk preserved).

Spark shape: tag predicates are native map expressions; split-token
groups come from one explode + groupBy(token); pair extraction is a
bounded per-row nested transform (refs lists are 2-3 tokens) exploded
to canonical (least, greatest) pairs; every law-side join is a
broadcast (the register is ~2k rows against web-scale OSM); relation
checks group by the raw ref string. No driver-side loops.

Output: one kind-tagged frame (kind, a, b, n) unioning the eight
report groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import (
    doesnt_have_key,
    get_delimited_values,
    get_value,
    has_key,
    split_values_check,
)
from osmalyzer_spark.geo.polygon import Polygon, contains_expr

_VALID_SHAPE = "^[AVP][1-9][0-9]{0,3}$"
_EXCLUDED_RES = [
    r"^C-?[1-9][0-9]{0,2}$",  # C class: C9 C-9 C27 C-122
    r"^[AB][0-9]\.-[0-9]{2}$",  # Limbazi: B3.-01 A3.-03
    r"^62[0-9]{2}[ABCD][0-9]{3}$",  # Kuldiga: 6278B003
    r"^[ABC]1-[0-9]{2}$",  # Limbazi: C1-29
]


def is_valid_lvc_ref(tok) -> Column:
    """IsValidRef (LVCRoadAnalyzer.cs:400-418)."""
    tok = F.col(tok) if isinstance(tok, str) else tok
    limit = (
        F.when(F.substring(tok, 1, 1) == "A", F.lit(30))
        .when(F.substring(tok, 1, 1) == "P", F.lit(300))
        .otherwise(F.lit(3000))
    )
    num = F.substring(tok, 2, 8).cast("int")
    return tok.rlike(_VALID_SHAPE) & (num <= limit)


def is_excluded_lvc_ref(tok) -> Column:
    """IsExcludedRef (LVCRoadAnalyzer.cs:420-443)."""
    tok = F.col(tok) if isinstance(tok, str) else tok
    out = F.lit(False)
    for pat in _EXCLUDED_RES:
        out = out | tok.rlike(pat)
    return out


def _scope(df: DataFrame, polygon: Polygon | None) -> DataFrame:
    if polygon is not None:
        df = df.filter(contains_expr(polygon, "lat", "lon"))
    return df


def _ref_tokens() -> Column:
    return get_delimited_values("tags", "ref")


def _token_groups(df: DataFrame) -> DataFrame:
    """GroupByValues('ref', split=true): (value, n_elements)."""
    return (
        df.select(F.explode(_ref_tokens()).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pairs(df: DataFrame) -> DataFrame:
    """All unordered split-ref pairs per way, canonicalized to
    (least, greatest); (pa, pb, n_ways, all_roundabout)."""
    toks = _ref_tokens()
    pair_list = F.flatten(
        F.transform(
            toks,
            lambda a, i: F.filter(
                F.transform(
                    toks,
                    lambda b, j: F.when(
                        j > i, F.struct(F.least(a, b).alias("pa"), F.greatest(a, b).alias("pb"))
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    rb = get_value("tags", "junction") == "roundabout"
    return (
        df.select(
            F.explode(pair_list).alias("p"),
            F.coalesce(rb, F.lit(False)).alias("rb"),
        )
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rb").alias("all_roundabout"),
        )
    )


def lvc_road_report(
    ways: DataFrame,
    route_rels: DataFrame,
    law_roads: DataFrame,
    law_shared: DataFrame,
    polygon: Polygon | None = None,
) -> DataFrame:
    """The full LVC Roads report as one kind-tagged union.

    ways / route_rels: (id, tags map<string,string>, lat, lon) with the
    element's representative (average) coordinate. law_roads: (code);
    law_shared: (code, shared) directed as in the law.

    Kinds: mapped_not_in_law(a=ref, n=ways), law_not_mapped(a=code),
    unshared(a=key, b=missing partner), shared_not_in_law(a<b, n=ways),
    shared_roundabout_only(a<b), missing_relation(a=code),
    extra_relation(a=code, b=relation id), same_ref_relations(a=code,
    n=relations), unrecognized(a=value, n=ways), excluded_count(n).
    """
    reffed = _scope(
        ways.filter(
            has_key("tags", "highway")
            & has_key("tags", "ref")
            & doesnt_have_key("tags", "aeroway")
            & doesnt_have_key("tags", "abandoned:aeroway")
            & doesnt_have_key("tags", "disused:aeroway")
            & doesnt_have_key("tags", "railway")
        ),
        polygon,
    )
    # the scoped ways feed five consumers (recognized groups, two pair
    # extractions, the all-invalid tail twice); cache the scoped subset
    # (a small fraction of the planet table after the tag filters) so
    # the base table is scanned once
    reffed = reffed.cache()
    recognized = reffed.filter(
        split_values_check("tags", "ref", is_valid_lvc_ref)
    )
    rels = _scope(
        route_rels.filter(
            (get_value("tags", "type") == "route")
            & (get_value("tags", "route") == "road")
            & has_key("tags", "ref")
            & split_values_check("tags", "ref", is_valid_lvc_ref)
        ),
        polygon,
    )

    roads_by_ref = _token_groups(recognized).cache()
    law = F.broadcast(law_roads.select("code").distinct())
    law_pairs = F.broadcast(
        law_shared.select(
            F.least("code", "shared").alias("pa"),
            F.greatest("code", "shared").alias("pb"),
        ).distinct()
    )

    s = F.lit("")

    # roads on the map but not in the law / in the law but not mapped
    mapped_not_in_law = (
        roads_by_ref.join(law, roads_by_ref.value == law.code, "left_anti")
        .select(F.lit("mapped_not_in_law").alias("kind"),
                F.col("value").alias("a"), s.alias("b"), "n")
    )
    law_not_mapped = (
        law.join(roads_by_ref, law.code == roads_by_ref.value, "left_anti")
        .select(F.lit("law_not_mapped").alias("kind"),
                F.col("code").alias("a"), s.alias("b"), F.lit(-1).alias("n"))
    )

    # law shared segments whose partner never co-occurs with the key on
    # a recognized way (only when the key is mapped at all)
    rec_pairs = _pairs(recognized)
    unshared = (
        law_shared.join(
            roads_by_ref, law_shared.code == roads_by_ref.value, "left_semi"
        )
        .withColumn("pa", F.least("code", "shared"))
        .withColumn("pb", F.greatest("code", "shared"))
        .join(rec_pairs.select("pa", "pb"), ["pa", "pb"], "left_anti")
        .select(F.lit("unshared").alias("kind"), F.col("code").alias("a"),
                F.col("shared").alias("b"), F.lit(-1).alias("n"))
    )

    # co-occurring ref pairs (ALL reffed ways) not in the law
    not_in_law = _pairs(reffed).join(law_pairs, ["pa", "pb"], "left_anti")
    shared_not_in_law = not_in_law.filter(~F.col("all_roundabout")).select(
        F.lit("shared_not_in_law").alias("kind"),
        F.col("pa").alias("a"), F.col("pb").alias("b"), "n",
    )
    shared_roundabout_only = not_in_law.filter(F.col("all_roundabout")).select(
        F.lit("shared_roundabout_only").alias("kind"),
        F.col("pa").alias("a"), F.col("pb").alias("b"), F.lit(-1).alias("n"),
    )

    # route relations by RAW ref string (the reference compares unsplit)
    rel_refs = (
        rels.select(
            get_value("tags", "ref").alias("code"),
            F.col("id").alias("rel_id"),
        )
        .cache()
    )
    rel_counts = rel_refs.groupBy("code").agg(F.count(F.lit(1)).alias("n"))
    missing_relation = (
        roads_by_ref.join(rel_counts, roads_by_ref.value == rel_counts.code,
                          "left_anti")
        .select(F.lit("missing_relation").alias("kind"),
                F.col("value").alias("a"), s.alias("b"), F.lit(-1).alias("n"))
    )
    same_ref_relations = (
        rel_counts.join(roads_by_ref, rel_counts.code == roads_by_ref.value,
                        "left_semi")
        .filter(F.col("n") > 1)
        .select(F.lit("same_ref_relations").alias("kind"),
                F.col("code").alias("a"), s.alias("b"), "n")
    )
    extra_relation = (
        rel_refs.join(roads_by_ref, rel_refs.code == roads_by_ref.value,
                      "left_anti")
        .select(F.lit("extra_relation").alias("kind"),
                F.col("code").alias("a"),
                F.col("rel_id").cast("string").alias("b"),
                F.lit(-1).alias("n"))
    )

    # unrecognized refs: ways whose tokens are ALL invalid; excluded
    # refs are reported as a distinct-value count delta
    all_invalid = reffed.filter(
        split_values_check("tags", "ref", lambda t: ~is_valid_lvc_ref(t))
    )
    pre_groups = _token_groups(all_invalid)
    kept = all_invalid.filter(
        split_values_check("tags", "ref", lambda t: ~is_excluded_lvc_ref(t))
    )
    unrec_groups = _token_groups(kept).cache()
    unrecognized = unrec_groups.select(
        F.lit("unrecognized").alias("kind"), F.col("value").alias("a"),
        s.alias("b"), "n",
    )
    excluded_count = (
        pre_groups.select(F.count(F.lit(1)).alias("pre"))
        .crossJoin(unrec_groups.select(F.count(F.lit(1)).alias("post")))
        .select(F.lit("excluded_count").alias("kind"), s.alias("a"),
                s.alias("b"), (F.col("pre") - F.col("post")).alias("n"))
    )

    out = mapped_not_in_law
    for part in (
        law_not_mapped, unshared, shared_not_in_law, shared_roundabout_only,
        missing_relation, same_ref_relations, extra_relation,
        unrecognized, excluded_count,
    ):
        out = out.unionByName(part)
    return out.withColumn("n", F.col("n").cast("long"))
