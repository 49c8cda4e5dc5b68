"""PostCodeAnalyzer (reference Analyzers/Miscellaneous/
PostCodeAnalyzer.cs): post-code regions, syntax validation, post-office
consistency, and distant-element detection, as one tall result.

Semantics preserved from the reference:
- post offices = amenity=post_office INSIDE the boundary polygon
  (:36-40); they are subtracted from the regular post-coded element set
  (:42) — an office outside the polygon participates as a regular
  element.
- ValidPostCodeSyntax (:341-363): `LV-####` is valid; otherwise an
  explicit foreign addr:country or a position outside the polygon makes
  the element not-in-Latvia (silently skipped); only the remainder is
  reported invalid. Post offices report ANY non-valid code (:209).
- regions = valid codes grouped with their average coord; < 10 members
  is its own issue class (:157).
- offices sharing a code move to a repeat group and do NOT count as
  the code's office (:186-242, including for the region-without-office
  check); single offices whose code no region uses are reported
  (:278-296); regions with no single office are enumerated (:298-318).
- distant elements: > 50 km from their region's average coord
  (:320-341).

Spark shape: one narrow projection of the element table, a polygon
containment column (broadcast Polygon, bbox prefilter + vectorized ray
cast) computed only where the regex fails or the office filter needs
it, one groupBy per code family (regions, office counts — both tiny
key domains), and a members-to-region equi-join for the distance
check. No UDF beyond the shared ray cast, no all-pairs stage.

Output: (kind, postcode, elem_id, n, lat, lon) — kind in {region,
region_sparse, invalid_code, office_no_postcode, office_invalid_code,
office_ok, office_repeat, office_unused_code, region_no_office,
distant}; lat/lon only on region rows (rounded to 4), n only on
region/region_no_office/office_repeat rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.functions.tags import get_value
from osmalyzer_spark.geo.polygon import Polygon, contains_expr

POSTCODE_RE = "^LV-[0-9]{4}$"  # PostCodeAnalyzer.cs:345
DISTANT_THRESHOLD_M = 50_000.0  # PostCodeAnalyzer.cs:44
SPARSE_REGION_SIZE = 10  # PostCodeAnalyzer.cs:157


def _row(kind, postcode=None, elem_id=None, n=None, lat=None, lon=None):
    null = lambda t: F.lit(None).cast(t)  # noqa: E731
    return [
        F.lit(kind).alias("kind"),
        (postcode if postcode is not None else null("string")).alias("postcode"),
        (elem_id if elem_id is not None else null("long")).alias("elem_id"),
        (n if n is not None else null("long")).alias("n"),
        (lat if lat is not None else null("double")).alias("lat"),
        (lon if lon is not None else null("double")).alias("lon"),
    ]


def postcode_check(elements: DataFrame, polygon: Polygon) -> DataFrame:
    """Run the full post-code analysis over (id, tags, lat, lon)
    elements against the boundary `polygon`."""
    from osmalyzer_spark.operators.knn import distance_expr

    base = elements.select(
        "id",
        get_value("tags", "addr:postcode").alias("postcode"),
        get_value("tags", "addr:country").alias("country"),
        get_value("tags", "amenity").alias("amenity"),
        "lat",
        "lon",
    )
    inside = contains_expr(polygon, "lat", "lon")
    valid = F.col("postcode").rlike(POSTCODE_RE)
    is_office = F.coalesce(
        (F.col("amenity") == "post_office") & inside, F.lit(False)
    )
    base = base.withColumn("__office", is_office).cache()

    offices = base.filter(F.col("__office"))
    regular = base.filter(~F.col("__office") & F.col("postcode").isNotNull())

    # regular elements: valid -> region member; invalid in Latvia -> row
    members = regular.filter(valid).select("id", "postcode", "lat", "lon")
    invalid_rows = regular.filter(
        ~valid
        & (F.col("country").isNull() | (F.col("country") == "LV"))
        & inside
    ).select(*_row("invalid_code", postcode=F.col("postcode"), elem_id=F.col("id")))

    regions = members.groupBy("postcode").agg(
        F.count("*").alias("n"),
        F.avg("lat").alias("avg_lat"),
        F.avg("lon").alias("avg_lon"),
    )
    region_rows = regions.select(
        *_row(
            None,  # placeholder, kind set below
            postcode=F.col("postcode"),
            n=F.col("n"),
            lat=F.round("avg_lat", 4),
            lon=F.round("avg_lon", 4),
        )[1:],
        F.when(F.col("n") < SPARSE_REGION_SIZE, F.lit("region_sparse"))
        .otherwise(F.lit("region"))
        .alias("kind"),
    ).select("kind", "postcode", "elem_id", "n", "lat", "lon")

    # post offices
    off_no_code = offices.filter(F.col("postcode").isNull()).select(
        *_row("office_no_postcode", elem_id=F.col("id"))
    )
    off_invalid = offices.filter(F.col("postcode").isNotNull() & ~valid).select(
        *_row("office_invalid_code", postcode=F.col("postcode"), elem_id=F.col("id"))
    )
    off_valid = offices.filter(F.coalesce(valid, F.lit(False)))
    ocounts = off_valid.groupBy("postcode").agg(F.count("*").alias("n_off"))
    off_repeat = ocounts.filter(F.col("n_off") > 1).select(
        *_row("office_repeat", postcode=F.col("postcode"), n=F.col("n_off"))
    )
    singles = off_valid.join(
        ocounts.filter(F.col("n_off") == 1).select("postcode"), "postcode"
    ).select("id", "postcode")
    off_ok = singles.select(
        *_row("office_ok", postcode=F.col("postcode"), elem_id=F.col("id"))
    )
    off_unused = singles.join(
        regions.select("postcode"), "postcode", "left_anti"
    ).select(
        *_row("office_unused_code", postcode=F.col("postcode"), elem_id=F.col("id"))
    )
    region_no_office = regions.join(
        singles.select("postcode"), "postcode", "left_anti"
    ).select(*_row("region_no_office", postcode=F.col("postcode"), n=F.col("n")))

    # distant members (> 50 km from their region's average coord);
    # the reported float stays out of the gated schema on purpose
    distant = (
        members.join(
            regions.select("postcode", "avg_lat", "avg_lon"), "postcode"
        )
        .filter(
            distance_expr("avg_lat", "avg_lon", "lat", "lon")
            > DISTANT_THRESHOLD_M
        )
        .select(*_row("distant", postcode=F.col("postcode"), elem_id=F.col("id")))
    )

    return (
        region_rows.unionByName(invalid_rows)
        .unionByName(off_no_code)
        .unionByName(off_invalid)
        .unionByName(off_repeat)
        .unionByName(off_ok)
        .unionByName(off_unused)
        .unionByName(region_no_office)
        .unionByName(distant)
    )
