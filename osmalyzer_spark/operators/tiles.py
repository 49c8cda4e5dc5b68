"""Raster-tile <-> vector assignment (north_star component).

Assigns each geotagged row a slippy-map tile id at a fixed zoom (the
reference's analog is the zoom{10,15,16,20} FGB tile files it consumes,
Osmalyzer/Data/Misc Data Fetchers/CulturalMonumentsMapAnalysisData.cs:23-37)
plus optional region (polygon) tags, and computes per-tile aggregates.
Pure native expressions for the tile math; PIP tagging reuses the
vectorized ray-cast.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmalyzer_spark.geo.polygon import Polygon, pip_tag_expr


def tile_xy_exprs(lat, lon, zoom: int) -> tuple[Column, Column]:
    lat_c = lat if isinstance(lat, Column) else F.col(lat)
    lon_c = lon if isinstance(lon, Column) else F.col(lon)
    n = 1 << zoom
    lat_r = F.radians(lat_c)
    x = F.floor((lon_c + 180.0) / 360.0 * n).cast("long")
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / F.lit(math.pi)) / 2.0 * n
    ).cast("long")
    return x, y


def tile_id_expr(lat, lon, zoom: int) -> Column:
    """Single int64 tile id: (zoom << 58) | (x << 29) | y (29 bits each —
    enough through zoom 28)."""
    x, y = tile_xy_exprs(lat, lon, zoom)
    return (
        (F.lit(zoom).cast("long") * F.lit(1 << 58).cast("long"))
        + x * F.lit(1 << 29).cast("long")
        + y
    )


def assign_tiles(
    df: DataFrame,
    zoom: int,
    lat: str = "lat",
    lon: str = "lon",
    polygons: list[Polygon] | None = None,
) -> DataFrame:
    """Adds tile_x, tile_y, tile_id (and region when polygons given)."""
    x, y = tile_xy_exprs(lat, lon, zoom)
    out = (
        df.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .withColumn("tile_id", tile_id_expr(lat, lon, zoom))
    )
    if polygons:
        # native for small constant polygons (no Python boundary), UDF
        # beyond the literal-size bound — see geo/polygon.pip_tag_expr
        out = out.withColumn("region", pip_tag_expr(polygons, F.col(lat), F.col(lon)))
    return out


def tile_stats(assigned: DataFrame, extra_aggs: list | None = None) -> DataFrame:
    """Per-tile rollup: row count (+caller aggregates)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if extra_aggs:
        aggs.extend(extra_aggs)
    return assigned.groupBy("tile_id", "tile_x", "tile_y").agg(*aggs)
