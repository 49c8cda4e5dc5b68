"""Derived views over the images substrate (SURVEY.md §1.4).

The OSM-element and data-item tables of the reference are *views* of the
image+caption Iceberg table: the geotag is a pure native-expression
function of `phash` (so it never needs the binary payload), the caption
parses into the tags map with native regexps, and `image_id` remains the
payload join-back key. ~30% of rows land in the dense Riga cluster
(skew fixture, north_star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# caption grammar: "{name} @ {street} {housenum}{suffix}, {parish}"
_CAPTION_RE = r"^(.*) @ (.*) (\d+[A-Z]?), (.*)$"


def geotag_lat(phash) -> Column:
    p = phash if isinstance(phash, Column) else F.col(phash)
    dense = (p % 10) < 3
    return F.when(
        dense, F.lit(56.90) + ((p % 100003) / 100003.0) * 0.10
    ).otherwise(F.lit(55.60) + ((p % 1000003) / 1000003.0) * 2.50)


def geotag_lon(phash) -> Column:
    p = phash if isinstance(phash, Column) else F.col(phash)
    dense = (p % 10) < 3
    # independent stream from the high bits (p is 62-bit; double division
    # would lose precision past 53 bits)
    p2 = F.shiftrightunsigned(p, 20)
    return F.when(
        dense, F.lit(24.00) + ((p2 % 100019) / 100019.0) * 0.20
    ).otherwise(F.lit(20.90) + ((p2 % 999983) / 999983.0) * 7.40)


def parse_caption_tags(caption) -> Column:
    """caption -> map<string,string> tags (name / addr:street /
    addr:housenumber / addr:parish / shop)."""
    c = caption if isinstance(caption, Column) else F.col(caption)
    name = F.regexp_extract(c, _CAPTION_RE, 1)
    street = F.regexp_extract(c, _CAPTION_RE, 2)
    housenum = F.regexp_extract(c, _CAPTION_RE, 3)
    parish = F.regexp_extract(c, _CAPTION_RE, 4)
    return F.map_from_arrays(
        F.array(
            F.lit("name"),
            F.lit("addr:street"),
            F.lit("addr:housenumber"),
            F.lit("addr:parish"),
            F.lit("shop"),
        ),
        F.array(name, street, housenum, parish, F.lit("supermarket")),
    )


def osm_elements_view(images: DataFrame) -> DataFrame:
    """images -> OSM-element-shaped view: (elem_id, type, elem_lat,
    elem_lon, tags, image_id). Payload (`bytes`) intentionally excluded —
    re-join by image_id at emission."""
    return images.select(
        F.xxhash64("image_id").alias("elem_id"),
        F.lit("node").alias("type"),
        geotag_lat("phash").alias("elem_lat"),
        geotag_lon("phash").alias("elem_lon"),
        parse_caption_tags("caption").alias("tags"),
        "image_id",
    )


def data_items_view(images: DataFrame, every_nth: int = 10) -> DataFrame:
    """images -> external-data-item view: every n-th image becomes a source
    item whose coordinate is offset from its element twin by a
    deterministic band (FIXTURES.md §3): ~60% within 15 m (clean match),
    ~25% at 15-75 m (far band), ~10% at 75-700 m (unmatched unless strong),
    ~5% at >700 m (strong-extra case)."""
    cand = images.filter(F.xxhash64("image_id") % every_nth == 0)
    band = F.abs(F.xxhash64("image_id", F.lit(1))) % 100
    offset_m = (
        F.when(band < 60, 2.0 + (band % 13))          # <=15 m
        .when(band < 85, 20.0 + (band % 50))          # 15-75 m
        .when(band < 95, 100.0 + (band % 7) * 80.0)   # 75-700 m
        .otherwise(800.0 + (band % 5) * 100.0)        # >700 m
    )
    bearing = (F.abs(F.xxhash64("image_id", F.lit(2))) % 360) * 0.0174532925199433
    lat = geotag_lat("phash")
    dlat = offset_m * F.cos(bearing) / 111_320.0
    dlon = offset_m * F.sin(bearing) / (111_320.0 * F.cos(F.radians(lat)))
    return cand.select(
        F.concat(F.lit("item_"), F.col("image_id")).alias("item_id"),
        (lat + dlat).alias("item_lat"),
        (geotag_lon("phash") + dlon).alias("item_lon"),
        F.regexp_extract("caption", _CAPTION_RE, 1).alias("item_name"),
        F.concat(
            F.regexp_extract("caption", _CAPTION_RE, 2),
            F.lit(" "),
            F.regexp_extract("caption", _CAPTION_RE, 3),
        ).alias("item_address"),
        # distinct name: item and element views are routinely joined
        # (radius join forbids column collisions)
        F.col("image_id").alias("item_image_id"),
    )
