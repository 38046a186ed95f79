"""Per-cell convex hulls over exact integer coordinates.

The engine computes each cell's hull with Andrew's monotone chain
(O(n log n), python-int cross products — exact), run per grid cell via
``applyInPandas``; the oracle proves it with the brute supporting-line
characterization (O(n³)/cell): a point is on the hull BOUNDARY iff some
line through it and another point keeps every cell point on one closed
side.  "Boundary" deliberately includes collinear edge points — that is
the characterization a closed half-plane test can state in first-order
SQL, and the chain reproduces it by popping only on STRICT right turns.

Scale: the grid bounds each pandas group to one cell's points (cell
size is the caller's density knob); a hot cell costs one O(n log n)
chain, not a quadratic pair join, and groups shuffle once on the cell
key.  Coordinates within a cell differ by ≤ cell, so cross products
stay far inside int64 for any cell ≤ 2³⁰.

Reference parity: the reference has no hull operator (geometry work in
mapbox-filter is filter/encode only — src/Mapbox/*.hs); this extends
the engine's geometry family for viewport/footprint summarization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tilemath import floor_div

__all__ = ["hull_boundary_points", "convex_hull_cells"]


def hull_boundary_points(xs, ys) -> "list[tuple[int, int]]":
    """Distinct points on the convex hull boundary (corners AND
    collinear edge points), exact python-int arithmetic.

    Monotone chain popping only on strict right turns (cross < 0): a
    non-strict pop would drop collinear boundary points, which the
    supporting-line oracle keeps.
    """
    pts = sorted(set(zip((int(x) for x in xs), (int(y) for y in ys))))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) < 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) < 0:
            upper.pop()
        upper.append(p)
    return sorted(set(lower) | set(upper))


def convex_hull_cells(pts: DataFrame, cell: int,
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """(cx, cy, x, y) rows: the hull-boundary point set of every
    occupied grid cell.  One shuffle on the cell key; the chain runs
    Arrow-batched per cell."""
    if cell <= 0 or cell > (1 << 30):
        raise ValueError(f"cell out of (0, 2^30]: {cell}")
    src = pts.select(
        floor_div(F.col(x_col).cast("long"), cell).alias("cx"),
        floor_div(F.col(y_col).cast("long"), cell).alias("cy"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"))

    def _hull(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cx, cy = key
        hull = hull_boundary_points(pdf["x"], pdf["y"])
        return pd.DataFrame({
            "cx": [cx] * len(hull), "cy": [cy] * len(hull),
            "x": [p[0] for p in hull], "y": [p[1] for p in hull]})

    return src.groupBy("cx", "cy").applyInPandas(
        _hull, "cx long, cy long, x long, y long")


def hull_metrics(pts: DataFrame, cell: int,
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-cell hull diameter — max pairwise d² with its witness pair —
    plus point/boundary counts: ``(cx, cy, n_pts, n_boundary, diam2,
    ax, ay, bx, by)``.

    The diameter of a point set equals the diameter of its convex-hull
    boundary (maximal pairs are extreme points; any point strictly
    inside an edge or the hull is strictly closer by convexity of
    |x−q| along segments), so the pair search runs over the SMALL
    boundary set from :func:`convex_hull_cells` — O(h²) per cell, never
    the raw-point quadratic.  The witness is the lexicographically
    least ``(ax, ay, bx, by)`` among maximal pairs via ONE min-struct
    fold with ``−d²`` leading, so ties resolve identically in any
    engine; single-point cells report ``diam2 = 0`` with the point as
    its own witness.  All arithmetic exact int64 (coords within a cell
    differ by ≤ 3·cell after the ×9 hull ring — safe for cell ≤ 2³⁰).

    Shape: the boundary set is already hash-partitioned by (cx, cy)
    from the hull's groupBy, so the within-cell pair join and the
    per-cell folds reuse that exchange; the raw points contribute one
    count aggregation on the same key.
    """
    src = pts.select(
        floor_div(F.col(x_col).cast("long"), cell).alias("cx"),
        floor_div(F.col(y_col).cast("long"), cell).alias("cy"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"))
    counts = src.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n_pts"))
    hull = convex_hull_cells(pts, cell, x_col, y_col)
    bcnt = hull.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n_boundary"),
        F.min(F.struct("x", "y")).alias("_p0"))
    a = hull.select("cx", "cy", F.col("x").alias("ax"),
                    F.col("y").alias("ay"))
    b = hull.select("cx", "cy", F.col("x").alias("bx"),
                    F.col("y").alias("by"))
    pair_lt = ((F.col("ax") < F.col("bx"))
               | ((F.col("ax") == F.col("bx"))
                  & (F.col("ay") < F.col("by"))))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    best = (a.join(b, ["cx", "cy"]).filter(pair_lt)
            .select("cx", "cy", d2.alias("d2"),
                    "ax", "ay", "bx", "by")
            .groupBy("cx", "cy")
            .agg(F.min(F.struct(
                (-F.col("d2")).alias("nd"), F.col("ax"), F.col("ay"),
                F.col("bx"), F.col("by"))).alias("_w")))
    return (counts.join(bcnt, ["cx", "cy"])
            .join(best, ["cx", "cy"], "left")
            .select(
                "cx", "cy", "n_pts", "n_boundary",
                F.coalesce(-F.col("_w.nd"), F.lit(0).cast("long"))
                .alias("diam2"),
                F.coalesce(F.col("_w.ax"), F.col("_p0.x")).alias("ax"),
                F.coalesce(F.col("_w.ay"), F.col("_p0.y")).alias("ay"),
                F.coalesce(F.col("_w.bx"), F.col("_p0.x")).alias("bx"),
                F.coalesce(F.col("_w.by"), F.col("_p0.y")).alias("by")))
