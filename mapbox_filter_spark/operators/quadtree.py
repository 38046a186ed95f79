"""Density-balanced tile pyramids: adaptive quadtree splitting.

Real tiling systems don't emit one uniform zoom — dense areas (cities)
split deeper than oceans.  ``adaptive_tile_split`` starts at ``z0`` and
recursively splits any tile holding more than ``cap`` points into its
four children until the cap is met or ``z_max`` is reached, producing a
LEAF tile set whose per-tile feature counts are bounded (except at
``z_max``, where the residue is emitted as-is and the caller applies a
per-tile feature cap — cap_per_group — like the reference's serve-time
story).

Reference parity: the reference emits uniform pyramids per zoom list
(app/Main.hs job loop); adaptive splitting extends that with the
density-balanced variant every production tiler grows eventually.

Scale shape per level: ONE groupBy(tile) count + ONE broadcastable
semi-join that restricts the point set to hot tiles — the working set
SHRINKS monotonically (cold regions leave the loop at their level), so
the total cost is bounded by (levels × surviving points), not
levels × corpus.  Hot-tile key lists are localCheckpoint-ed (tiny);
levels are bounded by z_max − z0 (driver loop is control only).
Determinism: counts are exact longs; tile assignment recomputes from
lon/lat at every level with the same mercator chain the tile_assign
gate value-hashes, so the whole leaf set is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adaptive_tile_split", "tile_compact", "tile_uncompact"]


def adaptive_tile_split(pts: DataFrame, z0: int, z_max: int, cap: int,
                        lon_col: str = "lon",
                        lat_col: str = "lat") -> DataFrame:
    """(z, x, y, n) leaf tiles of the adaptive pyramid."""
    from ..geo.tilemath import tile_cols

    if not (0 <= z0 <= z_max <= 30) or cap < 1:
        raise ValueError(f"need 0 <= z0 <= z_max <= 30 and cap >= 1: "
                         f"z0={z0} z_max={z_max} cap={cap}")
    cur = pts.select(F.col(lon_col).alias("lon"),
                     F.col(lat_col).alias("lat"))
    leaves = []
    for z in range(z0, z_max + 1):
        x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(z))
        tiled = cur.select("lon", "lat", x.alias("x"), y.alias("y"))
        counts = (tiled.groupBy("x", "y")
                  .agg(F.count(F.lit(1)).alias("n")))
        if z == z_max:
            leaves.append(counts.withColumn("z", F.lit(z)))
            break
        counts = counts.localCheckpoint()  # tiny; read twice below
        leaves.append(counts.filter(F.col("n") <= cap)
                      .withColumn("z", F.lit(z)))
        hot = counts.filter(F.col("n") > cap).select("x", "y")
        if hot.isEmpty():
            break  # nothing left to split — all leaves emitted
        cur = tiled.join(F.broadcast(hot), ["x", "y"], "left_semi") \
            .select("lon", "lat")
    out = leaves[0]
    for df in leaves[1:]:
        out = out.unionByName(df)
    return out.select("z", "x", "y", "n")


def tile_compact(tiles: DataFrame, z_min: int = 0, *,
                 z: str = "z", x: str = "x", y: str = "y") -> DataFrame:
    """Normalize a single-zoom tile SET into its minimal mixed-zoom
    covering: wherever all four children of a parent are present they
    collapse to the parent, recursively down to ``z_min`` — the ZXY
    analog of S2 ``CellUnion::Normalize`` (and of H3 ``compact``), the
    operation every tile-manifest diff / covering cache runs before
    storing a region.

    Input must sit at ONE zoom level (validated driver-side — the
    polyfill/scan shape; mixed-zoom inputs are already coverings).
    Per level: ONE parent groupBy (count == 4 ⇒ promote) + one
    broadcast-able anti-join that removes the promoted children; the
    frontier SHRINKS ≥ 4× per promoted parent and the loop is bounded
    by z0 − z_min rounds (driver control only, localCheckpoint per
    round).  Exact integers throughout.

    Returns the minimal set as ``(z, x, y)`` — disjoint, and
    uncompacting back to z0 reproduces the input exactly
    (:func:`tile_uncompact`; the roundtrip is oracle-gated).
    """
    from ..geo.tilemath import floor_div

    zs = [r[0] for r in tiles.select(z).distinct().collect()]
    if len(zs) != 1:
        raise ValueError(f"tile_compact: input must be single-zoom, "
                         f"got z levels {sorted(zs)}")
    z0 = int(zs[0])
    if z0 < z_min:
        raise ValueError(f"tile_compact: z0 {z0} < z_min {z_min}")
    cur = (tiles.select(F.col(x).cast("long").alias("x"),
                        F.col(y).cast("long").alias("y"))
           .distinct().localCheckpoint())
    parts = []
    level = z0
    while level > z_min:
        px = floor_div(F.col("x"), 2)
        py = floor_div(F.col("y"), 2)
        par = (cur.groupBy(px.alias("px"), py.alias("py"))
               .agg(F.count(F.lit(1)).alias("_c")))
        full = (par.filter(F.col("_c") == 4).select("px", "py")
                .localCheckpoint())
        keep = (cur.join(full,
                         (px == F.col("px")) & (py == F.col("py")),
                         "left_anti")
                .select(F.lit(level).alias("z"), "x", "y"))
        parts.append(keep)
        cur = (full.select(F.col("px").alias("x"),
                           F.col("py").alias("y")).localCheckpoint())
        level -= 1
        if cur.isEmpty():
            break
    parts.append(cur.select(F.lit(level).alias("z"), "x", "y"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("z", "x", "y")


def tile_uncompact(tiles: DataFrame, z_target: int, *,
                   z: str = "z", x: str = "x", y: str = "y",
                   max_fanout_bits: int = 12) -> DataFrame:
    """Expand a mixed-zoom tile covering to the uniform ``z_target``
    level — the inverse of :func:`tile_compact` (H3 ``uncompact``):
    every tile at z < z_target explodes to its 4^(z_target−z)
    descendants via two bounded sequences.  Raise-checked in-plan:
    tiles deeper than ``z_target`` or fanning out past
    ``2^max_fanout_bits`` per axis (default 4096, i.e. 16M descendants)
    are errors, never silent.

    Returns the distinct ``(z, x, y)`` set at ``z_target``.
    """
    dz = F.lit(z_target) - F.col(z).cast("int")
    bad = (dz < 0) | (dz > max_fanout_bits)
    # 2^dz exact as double for dz <= 12, cast back to long
    f = F.when(bad, F.raise_error(F.concat(
        F.lit(f"tile_uncompact: z outside [{z_target - max_fanout_bits}"
              f", {z_target}]: "), F.col(z).cast("string")))
        .cast("long")).otherwise(
        F.pow(F.lit(2.0), dz.cast("double")).cast("long"))
    pre = tiles.select((F.col(x).cast("long") * f).alias("_x0"),
                       (F.col(y).cast("long") * f).alias("_y0"),
                       f.alias("_f"))
    e1 = pre.select(
        "_y0", "_f",
        F.explode(F.sequence(
            F.col("_x0"), F.col("_x0") + F.col("_f") - 1)).alias("cx"))
    e2 = e1.select(
        "cx",
        F.explode(F.sequence(
            F.col("_y0"), F.col("_y0") + F.col("_f") - 1)).alias("cy"))
    return (e2.select(F.lit(z_target).alias("z"),
                      F.col("cx").alias("x"), F.col("cy").alias("y"))
            .distinct())
