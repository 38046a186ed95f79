"""Geometry / tile-pyramid kernels.

All tile math is pure Column arithmetic (JVM-side, whole-stage codegen) —
faster than any UDF; numpy-in-pandas-UDF is reserved for genuinely
shape-dependent kernels (point-in-polygon)."""

from .tilemath import (
    MERCATOR_MAX_LAT,
    lon_to_tile_x,
    lat_to_tile_y,
    tile_cols,
    tms_y,
    xyz_y,
    cell_encode,
    cell_decode,
    cell_parent,
    cell_child_origin,
    k_ring_cells,
    polyfill_bbox,
    quadkey,
)
from .geom import (
    EARTH_RADIUS_M,
    bearing_deg,
    destination_point,
    haversine_m,
    polygon_bbox,
    polygon_centroid,
    ring_perimeter,
    shoelace_area2,
)
from .pip import point_in_polygon_join
from .simplify import rdp_keep_indices, simplify_rdp
from .s2 import (
    s2_cell,
    s2_covering_join,
    s2_contains,
    s2_face,
    s2_level,
    s2_parent,
    s2_range_max,
    s2_range_min,
    s2_token,
    with_s2_cell,
)

__all__ = [
    "rdp_keep_indices",
    "simplify_rdp",
    "EARTH_RADIUS_M",
    "bearing_deg",
    "destination_point",
    "haversine_m",
    "polygon_bbox",
    "polygon_centroid",
    "ring_perimeter",
    "shoelace_area2",
    "with_s2_cell",
    "s2_covering_join",
    "s2_cell",
    "s2_contains",
    "s2_face",
    "s2_level",
    "s2_parent",
    "s2_range_max",
    "s2_range_min",
    "s2_token",
    "MERCATOR_MAX_LAT",
    "lon_to_tile_x",
    "lat_to_tile_y",
    "tile_cols",
    "tms_y",
    "xyz_y",
    "cell_encode",
    "cell_decode",
    "cell_parent",
    "cell_child_origin",
    "k_ring_cells",
    "polyfill_bbox",
    "quadkey",
    "point_in_polygon_join",
]
