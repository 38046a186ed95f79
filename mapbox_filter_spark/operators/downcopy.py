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


def _zig(n: Column) -> Column:
    return F.shiftleft(n, 1).bitwiseXOR(F.shiftright(n, 63))


def _unzig(e: Column) -> Column:
    return F.shiftright(e, 1).bitwiseXOR(-e.bitwiseAND(F.lit(1).cast("long")))


def shrink_cmds_col(cmds: Column, dx: Column, dy: Column,
                    extent: "int | Column" = 4096) -> Column:
    """NATIVE down-copy geometry transform over a raw MVT command-stream
    array (``geom_cmds: array<bigint>``): every absolute tile-local point p
    becomes ``(d*extent + p) div 2`` per axis — quadrant (dx, dy) of the
    parent tile (src/Mapbox/DownCopy.hs:63-70; div 2 = arithmetic shift).

    One ``F.aggregate`` fold per row, whole-stage-codegen JVM expression —
    no Python, no explode, no shuffle: the right cost model for rescaling
    10^9 child geometries during a pyramid rebuild.  The command parser is
    a 3-state machine in the fold accumulator (expect-command / expect-x /
    expect-y with a remaining-point counter); command integers pass through
    untouched, zigzag deltas are re-derived against the transformed cursor.
    Python twin (differentially tested equal): sources.mvt.shrink_cmds."""
    lz = F.lit(0).cast("long")
    init = F.struct(
        F.lit(0).alias("st"), F.lit(0).alias("rem"),
        lz.alias("x"), lz.alias("y"), lz.alias("tx"), lz.alias("ty"),
        F.array().cast("array<long>").alias("out"))
    ext = (F.lit(int(extent)) if isinstance(extent, int) else extent) \
        .cast("long")
    dxl, dyl = dx.cast("long"), dy.cast("long")

    def step(acc, e):
        op = e.bitwiseAND(F.lit(7).cast("long"))
        cnt = F.shiftright(e, 3).cast("int")
        # state 0 (command integer): MoveTo/LineTo with params -> expect x
        st0_next = F.when(op.isin(1, 2) & (cnt > 0), F.lit(1)).otherwise(F.lit(0))
        # state 1 (x param): advance cursor, transform, emit new delta
        x1 = acc["x"] + _unzig(e)
        nx = F.shiftright(dxl * ext + x1, 1)
        # state 2 (y param): same on y; one point consumed
        y1 = acc["y"] + _unzig(e)
        ny = F.shiftright(dyl * ext + y1, 1)
        rem1 = acc["rem"] - 1
        return F.struct(
            F.when(acc["st"] == 0, st0_next)
            .when(acc["st"] == 1, F.lit(2))
            .otherwise(F.when(rem1 > 0, F.lit(1)).otherwise(F.lit(0)))
            .alias("st"),
            F.when(acc["st"] == 0, cnt)
            .when(acc["st"] == 2, rem1).otherwise(acc["rem"]).alias("rem"),
            F.when(acc["st"] == 1, x1).otherwise(acc["x"]).alias("x"),
            F.when(acc["st"] == 2, y1).otherwise(acc["y"]).alias("y"),
            F.when(acc["st"] == 1, nx).otherwise(acc["tx"]).alias("tx"),
            F.when(acc["st"] == 2, ny).otherwise(acc["ty"]).alias("ty"),
            F.concat(acc["out"], F.array(
                F.when(acc["st"] == 0, e)
                .when(acc["st"] == 1, _zig(nx - acc["tx"]))
                .otherwise(_zig(ny - acc["ty"])))).alias("out"),
        )

    return F.when(cmds.isNull(), F.lit(None).cast("array<long>")).otherwise(
        F.aggregate(cmds, init, step, lambda a: a["out"]))


def copy_down(
    tile_features: DataFrame,
    spec: Optional[DownCopySpec],
    layer_col: str = "layer",
    cols: Optional[FeatureCols] = None,
    cmds_col: Optional[str] = None,
    extent: "int | str" = 4096,
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

    ``cmds_col`` (optional): name of a raw MVT command-stream column
    (``array<bigint>``, tile-LOCAL coords as sources.mvt emits) — copied
    children get the reference's geometry rescale
    ``p' = (quadrant*extent + p) div 2`` (DownCopy.hs:63-70) applied
    natively via :func:`shrink_cmds_col`.  The engine's world-coordinate
    columns (lon/lat) need no transform (module doc); this closes the gap
    for consumers holding tile-local ``geom_cmds``.
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
    )
    if cmds_col is not None:
        # rescale child tile-local geometry into its parent quadrant BEFORE
        # the tile key is re-parented (dx, dy come from the child's x, y);
        # extent may name a per-row column (MVT layers carry their own,
        # like the reference's `layer ^. extent`)
        ext = F.col(extent) if isinstance(extent, str) else extent
        children = children.withColumn(
            cmds_col,
            shrink_cmds_col(F.col(cmds_col), F.pmod(F.col("x"), F.lit(2)),
                            F.pmod(F.col("y"), F.lit(2)), ext))
    children = (
        children
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
