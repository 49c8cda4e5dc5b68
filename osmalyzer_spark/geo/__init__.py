from osmalyzer_spark.geo.distance import (
    EARTH_RADIUS_M,
    angle_between_segments_deg,
    cheap_distance_m,
    haversine_m,
    spherical_area_km2_expr,
)
from osmalyzer_spark.geo.cells import (
    cell_deg_for_radius,
    cell_id_expr,
    neighbor_cells_expr,
    with_cell,
)

__all__ = [
    "EARTH_RADIUS_M",
    "haversine_m",
    "cheap_distance_m",
    "angle_between_segments_deg",
    "spherical_area_km2_expr",
    "cell_deg_for_radius",
    "cell_id_expr",
    "neighbor_cells_expr",
    "with_cell",
]
