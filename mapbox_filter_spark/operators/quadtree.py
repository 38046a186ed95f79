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

__all__ = ["adaptive_tile_split"]


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
