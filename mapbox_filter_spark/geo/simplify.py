"""Ramer–Douglas–Peucker polyline simplification on integer geometry.

The operator real tiling engines run between down-copy and re-encode:
at each coarser zoom a line needs ~half the vertices, and RDP is the
standard pick (the reference stops at the ``div 2`` coordinate rescale,
app/DbAccess.hs down-copy path; this is the densification control it
leaves to the tiler).

Exact-integer decision rule, so results are bit-identical on every
engine (and the DuckDB gate oracle can replay it with a recursive CTE):

- for segment (i0, i1) the perpendicular-distance test
  ``dist(j) > eps`` is evaluated as ``cross(j)² > eps²·L²`` where
  ``cross(j) = (x1−x0)(yj−y0) − (xj−x0)(y1−y0)`` and ``L²`` is the
  squared chord length — all integer products, no sqrt, no rounding;
- degenerate chord (``L² = 0``): plain squared point distance vs
  ``eps²``;
- the split vertex is the max metric, ties to the LOWEST index —
  deterministic recursion shape.

Overflow bounds: for MVT tile-local coords (0..4096) ``cross ≤ 2·4096²``
so ``cross² < 2⁵¹``; for coordinates up to ~1.5e6 the rule still fits
int64 (``cross² < 2⁶³`` needs |coord·Δ| < 2³¹·⁵).  Callers with larger
grids should pre-translate to local coordinates (exact).

RDP recursion is data-dependent per geometry — not expressible as a
Column fold — so the Spark face is an Arrow-batched pandas UDF: Python
touches each VERTEX once per recursion level (O(n log n) typical), and
parallelism is geometry-level, the right grain at 100 TB (billions of
small geometries, not one huge one).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rdp_keep_indices(xs, ys, eps: int) -> list[int]:
    """Indices kept by exact-integer RDP (iterative stack; python ints)."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    eps2 = eps * eps
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 <= 1:
            continue
        x0, y0, x1, y1 = xs[i0], ys[i0], xs[i1], ys[i1]
        dx, dy = x1 - x0, y1 - y0
        l2 = dx * dx + dy * dy
        best_j, best_m = -1, -1
        for j in range(i0 + 1, i1):
            if l2 == 0:
                m = (xs[j] - x0) ** 2 + (ys[j] - y0) ** 2
            else:
                c = dx * (ys[j] - y0) - (xs[j] - x0) * dy
                m = c * c
            if m > best_m:
                best_m, best_j = m, j
        if best_m > (eps2 if l2 == 0 else eps2 * l2):
            keep.add(best_j)
            stack.append((i0, best_j))
            stack.append((best_j, i1))
    return sorted(keep)


_OUT_T = T.ArrayType(T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
]))


def simplify_rdp(verts: Column, eps: int) -> Column:
    """array<struct<x,y>> → array<struct<i,x,y>> of RDP-kept vertices.

    ``i`` is the ORIGINAL vertex index — downstream re-encoders (and the
    oracle) key on it; the (x, y) are passed through untouched.
    """

    @F.pandas_udf(_OUT_T)
    def _rdp(col: pd.Series) -> pd.Series:
        out = []
        for pts in col:
            if pts is None:
                out.append(None)
                continue
            xs = [int(p["x"]) for p in pts]
            ys = [int(p["y"]) for p in pts]
            out.append([{"i": i, "x": xs[i], "y": ys[i]}
                        for i in rdp_keep_indices(xs, ys, eps)])
        return pd.Series(out)

    return _rdp(verts)


def visvalingam(df, group_cols, *, order_col: str = "o",
                x_col: str = "x", y_col: str = "y",
                thresh2: int = 0, max_remove: int = 12,
                max_pts: int = 24):
    """Visvalingam-Whyatt polyline simplification (Visvalingam &
    Whyatt 1993): repeatedly drop the interior vertex whose EFFECTIVE
    triangle area (with its current neighbours — recomputed after
    every removal, which is what distinguishes VW from a one-pass
    filter) is smallest, while ``2·area < thresh2``, up to
    ``max_remove`` removals.  The areal counterpart of RDP: RDP keeps
    offset extremes (an Arrow kernel here), VW keeps area-significant
    shape and is expressible as a pure Column fold — exact integer
    area2 = |cross|, endpoints always kept, ties remove the earliest
    vertex.

    All removal rounds run inside ONE in-row fold (no plan growth);
    the (area2, position) argmin is encoded as ``area2·max_pts + p``
    and binds once per round (hof.bind_once).  ``max_pts`` is both
    the in-plan length guard and the encode base.

    Returns ``(*group_cols, n_in, n_kept, kept, removed_area2)``
    where ``kept`` is the comma-joined surviving order values and
    ``removed_area2`` the exact sum of removed effective areas.
    """
    from pyspark.sql import functions as F

    from ..operators.hof import bind_once

    if max_pts < 3 or max_remove < 1 or thresh2 < 0:
        raise ValueError("need max_pts >= 3, max_remove >= 1, "
                         "thresh2 >= 0")
    pts_s = F.array_sort(F.collect_list(F.struct(
        F.col(order_col).cast("long").alias("o"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"))))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        pts_s.alias("_pts"))
    pts = F.col("_pts")
    n = F.size("_pts")
    n_guard = F.when(
        n > max_pts,
        F.raise_error(F.format_string(
            f"visvalingam: group exceeds max_pts={max_pts} (got %s)",
            n.cast("string")))).otherwise(n)

    def at(k: Column, p: Column) -> Column:
        return F.element_at(pts, (F.element_at(k, (p + 1).cast("int"))
                                  + 1).cast("int"))

    def area2(k: Column, p: Column) -> Column:
        a, b, c = at(k, p - 1), at(k, p), at(k, p + 1)
        return F.abs((b["x"] - a["x"]) * (c["y"] - a["y"])
                     - (b["y"] - a["y"]) * (c["x"] - a["x"]))

    def step(acc: Column) -> Column:
        k, s = acc["k"], acc["s"]
        m = F.size(k)
        enc_expr = F.array_min(F.transform(
            F.when(m > 2, F.sequence(F.lit(1), m - 2))
            .otherwise(F.array().cast("array<int>")),
            lambda p: area2(k, p) * max_pts + p))

        def build(enc: Column) -> Column:
            from ..geo.tilemath import floor_div_big

            p = F.pmod(enc, F.lit(max_pts)).cast("int")
            # exact decode at any coordinate scale (enc can pass 2^53)
            a2 = floor_div_big(enc, F.lit(max_pts).cast("long"))
            removed = F.struct(
                F.concat(F.slice(k, 1, p),
                         F.slice(k, p + 2, (m - p - 1).cast("int")))
                .alias("k"),
                (s + a2).alias("s"))
            return F.when(enc.isNotNull() & (a2 < thresh2), removed) \
                .otherwise(acc)

        return bind_once({"enc": enc_expr}, build)

    init = F.struct(
        F.sequence(F.lit(0).cast("long"), (n - 1).cast("long"))
        .alias("k"),
        F.lit(0).cast("long").alias("s"))
    final = F.aggregate(F.sequence(F.lit(1), F.lit(max_remove)), init,
                        lambda acc, _: step(acc))
    mid = g.select(*group_cols, n_guard.alias("n_in"),
                   pts.alias("_pts"), final.alias("_f"))
    pts2 = F.col("_pts")
    k2 = F.col("_f.k")
    return mid.select(
        *group_cols, "n_in",
        F.size(k2).alias("n_kept"),
        F.array_join(F.transform(
            k2, lambda i: F.element_at(
                pts2, (i + 1).cast("int"))["o"].cast("string")), ",")
        .alias("kept"),
        F.col("_f.s").alias("removed_area2"))
