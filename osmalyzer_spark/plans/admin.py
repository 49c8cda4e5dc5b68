"""Administrative analyzer group (reference Analyzers/Administrative/
AdminAnalyzerBase.cs + MunicipalityAnalyzer.cs): admin-boundary
relations, admin-center self-assignment, and external-entry matching.

Semantics preserved from the reference:
- candidate relations: boundary=administrative + the requested
  admin_level, centroid inside the country polygon
  (MunicipalityAnalyzer.cs:33-38; the relation coordinate here is the
  average of its resolved node members, OsmGeoTools.GetAverageCoord).
- SelfAssignAdminCenters (AdminAnalyzerBase.cs:277-324): node members
  with role admin_centre/label carrying the preferred tag=value win
  when exactly one exists (more than one assigns nothing and STOPS the
  fallback); otherwise exactly-one role=admin_centre member, then
  exactly-one role=label member.
- external assignment (WikidataData.AssignWikidataItems,
  WikidataData.cs:10-57, same shape for ATVK/VDB): per item, entries
  matching by name — zero leaves the item unassigned; more than one is
  a `multiple_matches` issue (unassigned); exactly one whose coordinate
  exists and sits beyond the cheap-distance cap is a `coord_mismatch`
  issue (unassigned); else assigned. Missing rows cover EVERY
  unassigned item (AdminAnalyzerBase.ReportMissingWikidataItems);
  extra rows cover entries assigned to no item
  (ReportExtraWikidataItems/ReportExtraAtvkEntries) — an entry that
  matched but lost to an issue still counts as extra.

Spark shape: one groupBy over relation members for both the centroid
and the center-preference counts; the entry match is a name equi-join
+ per-item conditional aggregation. No UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHEAP_M_PER_DEG = 111139.0  # OsmGeoTools.cs:38


def assign_admin_centers(
    members: DataFrame,
    nodes: DataFrame,
    preferred_tag_value: tuple[str, str] | None = None,
) -> DataFrame:
    """One row per relation with a resolvable center.

    members: (relation_id, mtype, role, ref); nodes: (id, tags).
    preferred_tag_value: the (tag, value) a preferred center node must
    carry (e.g. ("place", "city")).

    Output: (relation_id, center_id) — relations whose rules assign no
    center are absent, like the reference leaving UserData null.
    """
    from osmalyzer_spark.functions.tags import get_value

    m = members.filter(F.col("mtype") == "node").join(
        nodes.select(
            F.col("id").alias("ref"),
            *(
                [
                    (
                        get_value("tags", preferred_tag_value[0])
                        == preferred_tag_value[1]
                    ).alias("__pref_ok")
                ]
                if preferred_tag_value is not None
                else [F.lit(False).alias("__pref_ok")]
            ),
        ),
        "ref",
    )
    is_pref = (
        F.col("role").isin("admin_centre", "label")
        & F.coalesce(F.col("__pref_ok"), F.lit(False))
    ).cast("int")
    is_ac = (F.col("role") == "admin_centre").cast("int")
    is_label = (F.col("role") == "label").cast("int")

    def only(flag: F.Column) -> F.Column:
        return F.min(F.when(flag == 1, F.col("ref")))

    agg = m.groupBy("relation_id").agg(
        F.sum(is_pref).alias("n_pref"),
        only(is_pref).alias("pref_id"),
        F.sum(is_ac).alias("n_ac"),
        only(is_ac).alias("ac_id"),
        F.sum(is_label).alias("n_label"),
        only(is_label).alias("label_id"),
    )
    center = F.when(
        F.col("n_pref") > 0, F.when(F.col("n_pref") == 1, F.col("pref_id"))
    ).otherwise(
        F.when(F.col("n_ac") == 1, F.col("ac_id")).when(
            (F.col("n_ac") == 0) & (F.col("n_label") == 1), F.col("label_id")
        )
    )
    return (
        agg.withColumn("center_id", center)
        .filter(F.col("center_id").isNotNull())
        .select("relation_id", "center_id")
    )


def external_assign(
    items: DataFrame, entries: DataFrame, max_dist_m: float
) -> DataFrame:
    """AssignWikidataItems + the base-class extra/missing reports as one
    tall DataFrame.

    items: (item_id, name, lat, lon); entries: (entry_id, name,
    elat nullable, elon nullable). Output: (kind, item_id, entry_id,
    n, dist_m) with kind in {assigned, multiple_matches,
    coord_mismatch, missing, extra_entry}; dist_m is the reference's
    F0 whole-meter rounding on mismatch rows.
    """
    j = items.join(
        entries.withColumnRenamed("name", "__ename"),
        F.col("name") == F.col("__ename"),
        "left",
    )
    cheap = (
        F.sqrt(
            (F.col("elat") - F.col("lat")) * (F.col("elat") - F.col("lat"))
            + (F.col("elon") - F.col("lon")) * (F.col("elon") - F.col("lon"))
        )
        * CHEAP_M_PER_DEG
    )
    per_item = j.groupBy("item_id").agg(
        F.count(F.col("entry_id")).alias("n_matches"),
        F.min(
            F.when(
                F.col("entry_id").isNotNull(),
                F.struct(
                    F.col("entry_id"),
                    F.col("elat"),
                    F.col("elon"),
                    cheap.alias("dist"),
                ),
            )
        ).alias("__e"),
    )
    has_coord = F.col("__e.elat").isNotNull() & F.col("__e.elon").isNotNull()
    mismatch = (F.col("n_matches") == 1) & has_coord & (
        F.col("__e.dist") > F.lit(float(max_dist_m))
    )
    assigned = per_item.filter((F.col("n_matches") == 1) & ~mismatch).select(
        F.lit("assigned").alias("kind"),
        "item_id",
        F.col("__e.entry_id").alias("entry_id"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("dist_m"),
    )
    multiple = per_item.filter(F.col("n_matches") > 1).select(
        F.lit("multiple_matches").alias("kind"),
        "item_id",
        F.lit(None).cast("long").alias("entry_id"),
        F.col("n_matches").cast("long").alias("n"),
        F.lit(None).cast("double").alias("dist_m"),
    )
    mism = per_item.filter(mismatch).select(
        F.lit("coord_mismatch").alias("kind"),
        "item_id",
        F.col("__e.entry_id").alias("entry_id"),
        F.lit(None).cast("long").alias("n"),
        F.round(F.col("__e.dist"), 0).alias("dist_m"),
    )
    missing = per_item.filter(
        (F.col("n_matches") != 1) | mismatch
    ).select(
        F.lit("missing").alias("kind"),
        "item_id",
        F.lit(None).cast("long").alias("entry_id"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("dist_m"),
    )
    extra = entries.join(
        assigned.select(F.col("entry_id").alias("__a")),
        F.col("entry_id") == F.col("__a"),
        "left_anti",
    ).select(
        F.lit("extra_entry").alias("kind"),
        F.lit(None).cast("long").alias("item_id"),
        "entry_id",
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("dist_m"),
    )
    return (
        assigned.unionByName(multiple)
        .unionByName(mism)
        .unionByName(missing)
        .unionByName(extra)
    )
