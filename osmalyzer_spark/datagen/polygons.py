"""Admin-polygon fixtures (FIXTURES.md §4).

Deterministic boundary polygons for tests and analyzers: a Latvia-extent
ring, a Riga box, a polygon with a hole, and a two-outer multipolygon —
as Polygon objects and as the WKB DataFrame shape
(polygon_id, kind, outer_wkb array<binary>, inner_wkb array<binary>).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from osmalyzer_spark.geo.polygon import Polygon

POLYGON_SCHEMA = (
    "polygon_id string, kind string, outer_wkb array<binary>, inner_wkb array<binary>"
)


def _rect(lat0, lon0, lat1, lon1) -> np.ndarray:
    return np.array([(lat0, lon0), (lat0, lon1), (lat1, lon1), (lat1, lon0)])


def fixture_polygons() -> list[Polygon]:
    latvia = Polygon(outers=[_rect(55.6, 20.9, 58.1, 28.3)], polygon_id="latvia")
    riga = Polygon(outers=[_rect(56.85, 23.9, 57.1, 24.4)], polygon_id="riga")
    hole_case = Polygon(
        outers=[_rect(56.0, 25.0, 57.0, 26.0)],
        inners=[_rect(56.4, 25.4, 56.6, 25.6)],
        polygon_id="hole_case",
    )
    multi_outer = Polygon(
        outers=[_rect(55.7, 21.0, 55.9, 21.3), _rect(57.8, 27.8, 58.0, 28.1)],
        polygon_id="multi_outer",
    )
    return [latvia, riga, hole_case, multi_outer]


def admin_polygons_table(spark: SparkSession) -> DataFrame:
    rows = []
    for p in fixture_polygons():
        r = p.to_wkb_row()
        rows.append(
            (
                r["polygon_id"],
                r["kind"],
                [bytearray(b) for b in r["outer_wkb"]],
                [bytearray(b) for b in r["inner_wkb"]],
            )
        )
    return spark.createDataFrame(rows, POLYGON_SCHEMA)


def load_polygons(df: DataFrame) -> list[Polygon]:
    """Round-trip the WKB table back into Polygon objects (driver-side —
    these are broadcast-small admin boundaries)."""
    return [Polygon.from_wkb_row(r) for r in df.collect()]
