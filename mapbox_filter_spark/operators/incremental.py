"""Incremental recompute avoidance: content-hash diff between runs.

Parity target: /root/reference/app/Md5Worker.hs:37-55 (per-tile md5 compared
against the previous run's hash DB; only changed tiles uploaded, vanished
tiles deleted).  The reference serializes hash-DB writes through a single
thread + bounded channel (Md5Worker.hs:57-64) — in Spark the shuffle IS the
serializer, so the whole machine reduces to a hash column + one left join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_content_hash(tiles: DataFrame, payload: Column) -> DataFrame:
    """(z, x, y, layer) + deterministic sha256 of the tile payload.

    ``payload`` must be an expression over the tile row (e.g. a canonical
    JSON of the sorted feature list) — determinism comes from the assembly
    operator's ordering guarantees (operators/assemble.py)."""
    return tiles.select("z", "x", "y", "layer",
                        F.sha2(payload.cast("string"), 256).alias("tile_hash"))


def default_tile_payload() -> Column:
    """Canonical payload: JSON of the ordered feature array (stable because
    assemble_tiles sorts features and spans deterministically)."""
    return F.to_json(F.col("features"))


def diff_tiles(current: DataFrame, previous: DataFrame | None) -> DataFrame:
    """Classify tiles against the previous run's hashes.

    Returns (z, x, y, layer, change) where change ∈
    {'new', 'changed', 'unchanged', 'deleted'} — 'deleted' rows come from
    the previous side (tile vanished; reference deletes the object,
    app/Main.hs:475-484).
    """
    if previous is None:
        return current.select("z", "x", "y", "layer",
                              F.lit("new").alias("change"))
    cur = current.select("z", "x", "y", "layer",
                         F.col("tile_hash").alias("h_cur"))
    prev = previous.select("z", "x", "y", "layer",
                           F.col("tile_hash").alias("h_prev"))
    joined = cur.join(prev, ["z", "x", "y", "layer"], "full_outer")
    return joined.select(
        "z", "x", "y", "layer",
        F.when(F.col("h_prev").isNull(), "new")
        .when(F.col("h_cur").isNull(), "deleted")
        .when(F.col("h_cur") != F.col("h_prev"), "changed")
        .otherwise("unchanged")
        .alias("change"),
    )


def changed_only(current: DataFrame, previous: DataFrame | None) -> DataFrame:
    """Tiles needing (re)publication: new + changed (skip-unchanged is the
    reference's upload-avoidance win)."""
    d = diff_tiles(current, previous)
    return d.filter(F.col("change").isin("new", "changed"))


def dirty_ancestors(changed: DataFrame, z: int) -> DataFrame:
    """Pyramid invalidation closure: every ancestor tile (all zooms
    ``0..z``) of a changed-tile set — what a tile CDN / overzoom cache
    must evict after an incremental update (each parent's rendered
    content aggregates its children).  The ancestor map is exact integer
    division, the fan-out is a ``z+1``-row literal explode, and the ONE
    shuffle is the final DISTINCT — at 100 TB the input here is already
    the (small) diff output, not the corpus.
    """
    steps = F.array(*[
        F.struct(F.lit(z - d).alias("az"), F.lit(1 << d).alias("dv"))
        for d in range(z + 1)])
    return (changed.select("x", "y", F.explode(steps).alias("s"))
            .select(F.col("s.az").alias("z"),
                    F.expr("x div s.dv").alias("x"),
                    F.expr("y div s.dv").alias("y"))
            .distinct())
