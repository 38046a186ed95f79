"""Exact tile clipping of line segments — the MVT-encode cut step.

``clip_segments_to_tiles`` splits every input segment into the pieces
that fall inside each tile of a ``tile``-sized grid, with the clip
points computed in EXACT integer fraction arithmetic (Liang-Barsky
entry/exit parameters carried as (num, den) pairs with den > 0, every
comparison cross-multiplied) and emitted on a ``scale``-subpixel
integer grid via one half-up floor division per coordinate.  No
doubles anywhere, so the clipped geometry value-hashes across engines.

Conventions (pinned, tested):
- tile boxes are CLOSED [t·T, (t+1)·T] on both axes: a piece that ends
  exactly on a shared boundary belongs to the tile it came from, the
  neighbor sees a zero-length touch and drops it (strict t0 < t1);
  a segment LYING on a shared boundary goes to the HIGHER tile only
  (candidates come from floor-div bbox tiles — no closed-box
  duplication);
- coordinates must be non-negative (raise_error in-plan otherwise):
  shift upstream, like every tile pipeline does;
- candidate tiles are the segment's bbox tiles, bounded in-plan by
  ``max_tiles`` (a segment spanning more tiles than that is a data
  bug at any sane tile size, and the explode must stay bounded).

Scale: the only fan-out is the bounded bbox-tile explode (×k per
segment, k ≤ max_tiles); everything else is whole-stage-codegen
Column arithmetic — no shuffle at all until the caller aggregates per
tile.  At 100 TB this is the map-side step in front of tile assembly.

Reference parity: mapbox-filter consumes tiles already cut upstream
(src/Mapbox/*.hs filter/encode only); this operator supplies that
upstream cut Spark-side, completing the pyramid path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tilemath import floor_div

__all__ = ["clip_segments_to_tiles"]


def _frac_max(a1: Column, b1: Column, a2: Column, b2: Column):
    c = a1 * b2 >= a2 * b1
    return F.when(c, a1).otherwise(a2), F.when(c, b1).otherwise(b2)


def _frac_min(a1: Column, b1: Column, a2: Column, b2: Column):
    c = a1 * b2 <= a2 * b1
    return F.when(c, a1).otherwise(a2), F.when(c, b1).otherwise(b2)


def _axis_params(p0: Column, d: Column, lo: Column, hi: Column):
    """Liang-Barsky entry/exit fractions for one axis, den > 0.
    d = 0 inside the slab → full [0,1]; outside → empty (1,1)>(0,1)."""
    inside = (lo <= p0) & (p0 <= hi)
    en_a = (F.when(d > 0, lo - p0).when(d < 0, p0 - hi)
            .otherwise(F.when(inside, F.lit(0)).otherwise(F.lit(1))))
    ex_a = (F.when(d > 0, hi - p0).when(d < 0, p0 - lo)
            .otherwise(F.when(inside, F.lit(1)).otherwise(F.lit(0))))
    den = F.when(d > 0, d).when(d < 0, -d).otherwise(F.lit(1))
    return en_a, den, ex_a, den


def _quant(p0: Column, d: Column, a: Column, b: Column,
           scale: int) -> Column:
    """Half-up ``scale``-subpixel quantization of p0 + d·a/b (exact:
    numerator and denominator are int64, coordinate ≥ 0, b > 0)."""
    num = 2 * scale * (p0 * b + d * a) + b
    return floor_div(num, 2 * b)


def clip_segments_to_tiles(segs: DataFrame, tile: int, scale: int = 8,
                           *, max_tiles: int = 64) -> DataFrame:
    """Clip ``(line_id, seg_i, x0, y0, x1, y1)`` segments to every
    ``tile``-sized box they cross.  Returns ``(line_id, seg_i, tx, ty,
    qx0, qy0, qx1, qy1, cut_in, cut_out)`` with coordinates on the
    ``scale``-subpixel grid and flags marking clipped (vs original)
    endpoints."""
    if tile < 1:
        raise ValueError("tile must be a positive integer")
    if scale < 1:
        raise ValueError("scale must be a positive integer")

    cols = [F.col(c).cast("long") for c in ("x0", "y0", "x1", "y1")]
    neg = (cols[0] < 0) | (cols[1] < 0) | (cols[2] < 0) | (cols[3] < 0)
    s = segs.select(
        "line_id", "seg_i",
        *[F.when(neg, F.raise_error(F.lit(
            "clip_segments_to_tiles: negative coordinate — shift "
            "upstream"))).otherwise(c).alias(n)
          for n, c in zip(("x0", "y0", "x1", "y1"), cols)])

    txl = floor_div(F.least("x0", "x1"), tile)
    txh = floor_div(F.greatest("x0", "x1"), tile)
    tyl = floor_div(F.least("y0", "y1"), tile)
    tyh = floor_div(F.greatest("y0", "y1"), tile)
    span = (txh - txl + 1) * (tyh - tyl + 1)
    # guard rides the sequence endpoint — a detached column would be
    # pruned before it could fire
    txl_g = (F.when(span > max_tiles, F.raise_error(F.lit(
        f"clip_segments_to_tiles: segment bbox spans > {max_tiles} "
        "tiles — raise max_tiles or use a coarser grid")).cast("long"))
        .otherwise(txl))
    cand = (s.withColumn("tx", F.explode(F.sequence(txl_g, txh)))
            .withColumn("ty", F.explode(F.sequence(tyl, tyh))))

    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    t = F.lit(tile)
    xen_a, xen_b, xex_a, xex_b = _axis_params(
        F.col("x0"), dx, F.col("tx") * t, (F.col("tx") + 1) * t)
    yen_a, yen_b, yex_a, yex_b = _axis_params(
        F.col("y0"), dy, F.col("ty") * t, (F.col("ty") + 1) * t)
    e_a, e_b = _frac_max(xen_a, xen_b, yen_a, yen_b)
    t0_a, t0_b = _frac_max(e_a, e_b, F.lit(0), F.lit(1))
    x_a, x_b = _frac_min(xex_a, xex_b, yex_a, yex_b)
    t1_a, t1_b = _frac_min(x_a, x_b, F.lit(1), F.lit(1))

    w = (cand.select(
        "line_id", "seg_i", "tx", "ty", "x0", "y0",
        dx.alias("dx"), dy.alias("dy"),
        t0_a.alias("t0a"), t0_b.alias("t0b"),
        t1_a.alias("t1a"), t1_b.alias("t1b"))
        .filter(F.col("t0a") * F.col("t1b")
                < F.col("t1a") * F.col("t0b")))
    return w.select(
        "line_id", "seg_i", "tx", "ty",
        _quant(F.col("x0"), F.col("dx"), F.col("t0a"), F.col("t0b"),
               scale).alias("qx0"),
        _quant(F.col("y0"), F.col("dy"), F.col("t0a"), F.col("t0b"),
               scale).alias("qy0"),
        _quant(F.col("x0"), F.col("dx"), F.col("t1a"), F.col("t1b"),
               scale).alias("qx1"),
        _quant(F.col("y0"), F.col("dy"), F.col("t1a"), F.col("t1b"),
               scale).alias("qy1"),
        (F.col("t0a") > 0).alias("cut_in"),
        (F.col("t1a") < F.col("t1b")).alias("cut_out"))
