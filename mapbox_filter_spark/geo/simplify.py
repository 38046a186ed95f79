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
