"""Down-copy: replace filter-matched features at dst zoom with the matched
features of the four child tiles one zoom deeper.

Parity target: /root/reference/src/Mapbox/DownCopy.hs:48-81 +
/root/reference/app/Main.hs:517-522.

Reference semantics reproduced:
- children of (z, x, y) are (z+1, 2x+bx, 2y+by), bx,by in {0,1}
  (Main.hs:519-521); equivalently parent = (z-1, x div 2, y div 2).
- dst tile: NEGATED spec filter on the spec's source-layer; every OTHER
  layer keeps all features (simpleNegFilter default-True, Filters.hs:59-62).
- child tiles: spec filter on the spec's source-layer; every other layer is
  dropped entirely (simpleFilter default-False, Filters.hs:40-43,56-57).
- merge order: dst features first, then children in (0,0),(0,1),(1,0),(1,1)
  enumeration order; feature ids renumbered 1..n per (tile, layer,
  geometry-kind) — the reference renumbers each geometry vector
  independently (DownCopy.hs:74-81).
- geometry: the reference transforms tile-local integer points
  ``p' = (quadrant*extent + p) div 2`` (DownCopy.hs:63-70).  This engine
  stores WORLD coordinates (lon/lat), where that transform is the identity:
  a child feature lands in the parent tile at the same world position, so no
  column transform is needed — documented representation difference.  The
  quadrant is still emitted (``quadrant`` column) for consumers that
  re-rasterize to tile-local coords.

Spark shape: two filters + a union + one window — the window partitions by
the same (z, x, y, layer) key the tile assembly shuffles on, so AQE reuses
the partitioning; no extra exchange beyond the union's.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..style import ast as A
from ..style import typecheck as TC
from ..style.compile import FeatureCols, compile_typed


@dataclass(frozen=True)
class DownCopySpec:
    """JSON: {"dst-zoom": int, "source-layer": str, "filter": expr}
    (DownCopy.hs:36-43)."""

    dst_zoom: int
    source_layer: str
    filter_typed: TC.TExp

    @classmethod
    def from_json(cls, spec: dict) -> "DownCopySpec":
        texp = TC.type_check_filter(A.parse_expression(spec["filter"]))
        return cls(int(spec["dst-zoom"]), spec["source-layer"], texp)


def _spec_pred(spec: DownCopySpec, cols: FeatureCols) -> Column:
    return compile_typed(spec.filter_typed, cols).col


def copy_down(
    tile_features: DataFrame,
    spec: Optional[DownCopySpec],
    layer_col: str = "layer",
    cols: Optional[FeatureCols] = None,
) -> DataFrame:
    """Apply down-copy to exploded tile-feature rows.

    Input: one row per (z, x, y, layer, feature) — the pre-assembly shape
    with feature_id / geom_kind / props columns.  Rows at every zoom other
    than dst pass through untouched — INCLUDING dst+1: the reference stores
    the child level independently (its tiles are filtered and written by the
    normal path; copyDown only REBUILDS the dst tile, Main.hs:385,517-522),
    so consuming the children here would silently delete the dst+1 level
    from a composed multi-zoom pyramid.  Matched dst+1 features are COPIED
    (not moved) into the dst tile.  Output adds ``new_feature_id`` (the
    renumbered id) and ``quadrant`` (child offset code, 0 for non-copies).
    """
    cols = cols or FeatureCols()
    lc = F.col(layer_col)

    if spec is None:
        return tile_features.withColumn(
            "new_feature_id", cols.fid_col
        ).withColumn("quadrant", F.lit(0))

    raw = _spec_pred(spec, cols)
    keep_pos = F.coalesce(raw, F.lit(False))
    keep_neg = F.coalesce(~raw, F.lit(False))

    z = F.col("z")
    dst = tile_features.filter(
        (z == spec.dst_zoom)
        & F.when(lc == spec.source_layer, keep_neg).otherwise(F.lit(True))
    ).withColumn("_src_rank", F.lit(0)).withColumn("quadrant", F.lit(0))

    children = (
        tile_features.filter(
            (z == spec.dst_zoom + 1) & (lc == spec.source_layer) & keep_pos
        )
        # quadrant order (bx, by) = (x mod 2, y mod 2); enumeration order
        # (0,0),(0,1),(1,0),(1,1) => rank = 2*bx + by + 1 (Main.hs:519-521)
        .withColumn(
            "_src_rank",
            (F.pmod(F.col("x"), F.lit(2)) * 2 + F.pmod(F.col("y"), F.lit(2)) + 1
             ).cast("int"),
        )
        .withColumn("quadrant", F.col("_src_rank") - 1)
        # child -> parent tile key (z-1, x div 2, y div 2)
        .withColumn("x", F.floor(F.col("x") / 2).cast("long"))
        .withColumn("y", F.floor(F.col("y") / 2).cast("long"))
        .withColumn("z", F.lit(spec.dst_zoom))
    )

    # renumber 1..n per geometry vector: dst first, then quadrant order,
    # stable on original feature_id within each source (DownCopy.hs:77-81).
    # Parity detail: addAndRenumber leaves a vector untouched when the child
    # side contributed nothing (DownCopy.hs:77-78), so renumbering applies
    # only to partitions that actually received child rows.
    # Scale shape (round-2 review fix): ONLY the rebuilt dst-zoom slice rides
    # the window's hash exchange — passthrough zooms are provably identity
    # (no child rows can land there), so they union in below with
    # new_feature_id = feature_id and never touch the window.  In a composed
    # multi-zoom pyramid that removes a full shuffle of every other level.
    merged = dst.unionByName(children)
    part = W.partitionBy("z", "x", "y", layer_col, cols.geom_kind)
    w = part.orderBy(F.col("_src_rank").asc(), cols.fid_col.asc())
    has_child = F.max("_src_rank").over(part) > 0
    renumbered = merged.withColumn(
        "new_feature_id",
        F.when(has_child, F.row_number().over(w).cast("long"))
        .otherwise(cols.fid_col),
    ).drop("_src_rank")

    passthrough = (
        tile_features.filter(z != spec.dst_zoom)
        .withColumn("quadrant", F.lit(0))
        .withColumn("new_feature_id", cols.fid_col)
        .select(*renumbered.columns)
    )
    return renumbered.unionByName(passthrough)
