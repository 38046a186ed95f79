"""Hilbert space-filling curve index — the locality-preserving sort key
for laying out 100 TB of spatial data on disk.

Why it exists: files sorted/partitioned by the Hilbert distance keep
spatially adjacent features in adjacent row groups, so a bbox query
prunes to a near-minimal contiguous set of files (Hilbert preserves 2-D
locality strictly better than the Z-order/Morton interleave — no
Z-shaped jumps across the map at quadrant boundaries).  This is the
clustering key lakehouse engines expose as OPTIMIZE ... ZORDER/HILBERT;
here it is integer-only Column math, usable directly in
``repartitionByRange`` / ``sortWithinPartitions`` before a parquet
write.

Algorithm: the standard xy→d bit-twiddling loop (public domain, as on
the Hilbert-curve Wikipedia page), unrolled at plan-build time into one
projection step per curve level:

    for s in (2^(order-1), ..., 2, 1):
        rx = (x // s) % 2 ; ry = (y // s) % 2
        d += s*s * ((3*rx) XOR ry)        # = 3-ry if rx else ry
        if ry == 0:
            if rx == 1:  x, y = n-1 - y, n-1 - x    # reflect+swap
            else:        x, y = y, x                 # swap
    # (n = 2^order: the canonical full-grid reflection keeps x, y in
    # [0, n) at every level — s-1 variants go negative mid-loop, where
    # Spark's pmod and SQL's sign-following % diverge)

Each level's (x, y, d) are materialized as REAL intermediate columns
(chained selects), not one nested expression: the naive single-Column
unroll grows ~4^order leaf references (each level reads the previous
x AND y several times), while the staged form stays linear — Catalyst's
CollapseProject keeps the stages separate (it refuses to inline
non-cheap expressions referenced more than once) and whole-stage
codegen fuses them back into one pass at runtime.  Exact longs
end-to-end, no UDF, and transcribable level-for-level into a DuckDB
materialized-CTE chain for the value-hash oracle.

The reference engine has no spatial-layout analogue (closest:
mapbox-filter's z/x/y scan order, src/Mapbox/DbAccess.hs); this is part
of the graft-mandated geospatial surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hilbert_encode", "py_hilbert_d"]


def _bit(c: Column, s: int) -> Column:
    # c is a nonnegative grid coord < 2^order: (c // s) % 2 == bit test
    return F.pmod(F.floor(c / F.lit(s)).cast("long"), F.lit(2))


def hilbert_encode(df: DataFrame, order: int,
                   x_col: str = "hx", y_col: str = "hy",
                   out_col: str = "h") -> DataFrame:
    """Attach the Hilbert curve distance of integer grid coords
    ``(x_col, y_col)`` in [0, 2^order) as ``out_col`` (long).

    Feed the result to ``df.repartitionByRange(N, out_col)
    .sortWithinPartitions(out_col)`` before a parquet write for
    spatially-clustered file layout.
    """
    if not 1 <= order <= 26:
        # 26 keeps s*s * 3 + d within long trivially and the plan short
        raise ValueError("order must be in [1, 26]")
    for c in ("_hsx", "_hsy", "_hrx", "_hry", out_col):
        if c in df.columns:
            raise ValueError(f"column {c} already present")
    work = df.select(
        "*",
        F.col(x_col).cast("long").alias("_hsx"),
        F.col(y_col).cast("long").alias("_hsy"),
        F.lit(0).cast("long").alias(out_col))
    keep = [c for c in work.columns if c not in ("_hsx", "_hsy")]
    n = 1 << order
    for k in range(order - 1, -1, -1):
        s = 1 << k
        work = work.select(
            "*",
            _bit(F.col("_hsx"), s).alias("_hrx"),
            _bit(F.col("_hsy"), s).alias("_hry"))
        rx, ry = F.col("_hrx"), F.col("_hry")
        x, y = F.col("_hsx"), F.col("_hsy")
        d = (F.col(out_col) + F.lit(s) * F.lit(s)
             * F.when(rx == 1, F.lit(3) - ry).otherwise(ry))
        new_x = F.when(ry == 0,
                       F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)) \
            .otherwise(x)
        new_y = F.when(ry == 0,
                       F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)) \
            .otherwise(y)
        passthru = [c for c in work.columns
                    if c not in ("_hsx", "_hsy", "_hrx", "_hry", out_col)]
        work = work.select(
            *passthru,
            new_x.alias("_hsx"), new_y.alias("_hsy"), d.alias(out_col))
    return work.select(*keep)


def py_hilbert_d(x: int, y: int, order: int) -> int:
    """Driver-side reference implementation (tests / differentials)."""
    d = 0
    n = 1 << order
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - y, n - 1 - x
            else:
                x, y = y, x
        s //= 2
    return d
