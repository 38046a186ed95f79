"""Hexagonal grid index on the Web-Mercator plane — the "H3" half of the
north rule's "H3/S2 index", built from scratch as pure Column math.

BASELINE.json names an H3/S2 cell index.  geo/s2.py provides the S2
(Hilbert-on-cube) family; this module provides the HEXAGONAL family: a
pointy-top axial-coordinate hex grid over the unit Web-Mercator square
(the same plane tilemath.py tiles), with the three properties hexagonal
indexes are chosen for over square grids:

- **uniform adjacency** — every cell has exactly 6 neighbors at ONE
  center distance (a square grid has 2 distances across its 8), so
  k-ring smoothing, hotspot kernels, and ring-expansion searches are
  isotropic;
- **exact integer cell arithmetic** — neighbors, rings, and distances
  are closed-form on the axial pair ``(hq, hr)``
  (distance = (|dq|+|dr|+|dq+dr|)/2), no trig after assignment;
- **constant-area-per-row binning** on the mercator plane (true-area
  distortion is the mercator cos² factor, identical to tile binning —
  documented, not hidden).

This is deliberately NOT Uber's icosahedral H3 (gnomonic faces, aperture
7, 12 pentagons): that layout's value is avoiding polar area inflation
for global statistics; its cost is non-exact hierarchy and pentagon
special-casing at every operator.  For a tiling engine whose outputs are
ZXY pyramids, binning on the SAME mercator plane means hex cells align
with the tile stack and the clamp rules (|lat| ≤ 85.051°) are shared.
The published axial/cube hex algebra (Red Blob Games' "Hexagonal Grids",
public reference) is re-derived here as Spark Columns.

Assignment (all whole-stage-codegen, no Python):

    mx = (lon + 180)/360                      ∈ [0, 1]
    my = (1 − ln(tan φ + sec φ)/π)/2          ∈ [0, 1]  (lat clamped)
    q  = (√3/3·mx − my/3)/size                fractional axial
    r  = (2/3·my)/size
    cube-round(q, r)  →  (hq, hr)             largest-residual fix

Rounding is ``floor(x + 0.5)`` — NOT engine round() — because Spark
HALF_UP BigDecimal rounding and DuckDB double rounding disagree at exact
.5 boundaries while floor is a single IEEE op both engines share; the
cube-round residual comparison chain is order-pinned so the DuckDB
oracle reproduces every cell id bit-for-bit (the hex_assign gate).

At 100 TB: assignment is a per-row projection (zero shuffle, codegen);
cell-keyed aggregation shuffles once on (hq, hr); ring joins follow the
geohash/S2 pattern — tiny probe side exploded to literal offset arrays
and broadcast, corpus never shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tilemath import MERCATOR_MAX_LAT

__all__ = [
    "SQRT3_3",
    "hex_axial",
    "hex_cell_id",
    "hex_center",
    "hex_distance",
    "hex_disk_offsets",
    "hex_gi_star",
    "hex_neighbor_offsets",
    "mercator_xy",
    "sql_hex_axial",
    "sql_mercator_xy",
]

# √3/3 pinned to the exact double both engines parse from this literal;
# emitting repr() into SQL keeps the constant bit-identical.
SQRT3_3 = math.sqrt(3.0) / 3.0
SQRT3 = math.sqrt(3.0)
# 2/3 pre-evaluated: a literal `2.0 / 3.0` in DuckDB SQL is DECIMAL
# division (different value lattice); Spark constant-folds the double.
# Pinning the evaluated double literal keeps both engines identical.
TWO_THIRDS = 2.0 / 3.0

# Axial direction vectors (pointy-top, CCW from east).
HEX_DIRS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def mercator_xy(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Unit-square Web-Mercator (mx, my) ∈ [0,1]² — the tilemath plane
    before the 2^z scaling (identical clamp + op order to
    lat_to_tile_y, so hex cells and tiles quantize the same point the
    same way)."""
    mx = (lon.cast("double") + F.lit(180.0)) / F.lit(360.0)
    latc = F.greatest(F.lit(-MERCATOR_MAX_LAT),
                      F.least(lat.cast("double"), F.lit(MERCATOR_MAX_LAT)))
    rad = F.radians(latc)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    my = (F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0)
    return mx, my


def _round_half_up(x: Column) -> Column:
    # floor(x + 0.5): one IEEE add + one exact floor — portable across
    # engines, unlike BigDecimal/double round() (see module docstring).
    return F.floor(x + F.lit(0.5))


def hex_axial(lon: Column, lat: Column, size: float) -> tuple[Column, Column]:
    """Axial hex cell (hq, hr) as exact longs for the pointy-top grid of
    circumradius ``size`` on the unit mercator square.  Cube rounding
    fixes the coordinate with the LARGEST residual (strict-> chain:
    q wins ties against r and s, r wins ties against s — pinned order,
    mirrored in :func:`sql_hex_axial`)."""
    mx, my = mercator_xy(lon, lat)
    s = F.lit(float(size))
    qd = (F.lit(SQRT3_3) * mx - my / F.lit(3.0)) / s
    rd = (F.lit(TWO_THIRDS) * my) / s
    sd = -qd - rd
    rq, rr, rs = (_round_half_up(c) for c in (qd, rd, sd))
    dq = F.abs(rq.cast("double") - qd)
    dr = F.abs(rr.cast("double") - rd)
    ds = F.abs(rs.cast("double") - sd)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    hq = F.when(fix_q, -rr - rs).otherwise(rq).cast("long")
    hr = F.when(fix_r, -rq - rs).otherwise(rr).cast("long")
    return hq, hr


def sql_mercator_xy(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """DuckDB expressions for :func:`mercator_xy` — identical op order."""
    mx = f"(({lon}) + 180.0) / 360.0"
    latc = f"GREATEST(-{MERCATOR_MAX_LAT}, LEAST({lat}, {MERCATOR_MAX_LAT}))"
    merc = f"LN(TAN(RADIANS({latc})) + 1.0 / COS(RADIANS({latc})))"
    my = f"(1.0 - {merc} / PI()) / 2.0"
    return mx, my


def sql_hex_axial(size: float, lon: str = "lon", lat: str = "lat") -> str:
    """DuckDB CTE body computing (hq, hr) bit-for-bit equal to
    :func:`hex_axial` — emit as ``SELECT ..., {this} FROM t``.  Returns
    the two projections joined by a comma (aliases hq, hr)."""
    mx, my = sql_mercator_xy(lon, lat)
    s = repr(float(size))
    qd = f"(({SQRT3_3!r} * ({mx}) - ({my}) / 3.0) / {s})"
    rd = f"(({TWO_THIRDS!r} * ({my})) / {s})"
    sd = f"(-{qd} - {rd})"
    rq, rr, rs = (f"FLOOR({c} + 0.5)" for c in (qd, rd, sd))
    dq = f"ABS({rq} - {qd})"
    dr = f"ABS({rr} - {rd})"
    ds = f"ABS({rs} - {sd})"
    fix_q = f"({dq} > {dr} AND {dq} > {ds})"
    fix_r = f"(NOT {fix_q} AND {dr} > {ds})"
    hq = (f"CAST(CASE WHEN {fix_q} THEN -{rr} - {rs} "
          f"ELSE {rq} END AS BIGINT)")
    hr = (f"CAST(CASE WHEN {fix_r} THEN -{rq} - {rs} "
          f"ELSE {rr} END AS BIGINT)")
    return f"{hq} AS hq, {hr} AS hr"


def hex_cell_id(hq: Column, hr: Column) -> Column:
    """Pack the axial pair into one long: ``hq·2³² + hr`` (injective for
    |hr| < 2³¹ — the unit square at any practical size is far inside).
    Keeps cell keys single-column for bucketing / bloom filters."""
    return (hq * F.lit(4294967296) + hr).cast("long")


def hex_center(hq: Column, hr: Column, size: float) -> tuple[Column, Column]:
    """Mercator-plane center (mx, my) of an axial cell — the inverse of
    the fractional transform in :func:`hex_axial`."""
    s = F.lit(float(size))
    q = hq.cast("double")
    r = hr.cast("double")
    mx = s * (F.lit(SQRT3) * q + F.lit(SQRT3) / F.lit(2.0) * r)
    my = s * (F.lit(3.0) / F.lit(2.0) * r)
    return mx, my


def hex_distance(dq: Column, dr: Column) -> Column:
    """Hex (cube) distance of an axial delta:
    ``(|dq| + |dr| + |dq + dr|) / 2`` — exact integer (sum is even)."""
    tot = F.abs(dq) + F.abs(dr) + F.abs(dq + dr)
    return (tot / F.lit(2)).cast("long")


def hex_neighbor_offsets() -> list[tuple[int, int]]:
    """The 6 axial neighbor deltas (pointy-top, CCW from east)."""
    return list(HEX_DIRS)


def hex_disk_offsets(k: int) -> list[tuple[int, int]]:
    """All axial deltas with hex distance ≤ k — the filled k-ring disk,
    ``1 + 3k(k+1)`` offsets, generated driver-side (tiny, literal) for
    explode-and-broadcast ring joins."""
    if k < 0:
        raise ValueError("k must be >= 0")
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return out


def hex_gi_star(cells, value: str = "n", k: int = 1):
    """Getis-Ord Gi* hotspot statistic over a hex cell table — the
    standard local spatial-autocorrelation z-score (Getis & Ord 1992),
    with binary weights over the k-disk (self included, the * variant).

    ``cells``: one row per OCCUPIED cell (hq, hr, <value>); the
    occupied set is the statistical universe n (documented convention —
    including empty cells would make n depend on an arbitrary bbox).

    For each cell i with disk-neighbor count W_i and disk sum S1_i:

        Gi* = (S1_i − x̄·W_i) / (s·√((n·W_i − W_i²)/(n−1)))

    Shape: the disk join explodes the CELL table (already aggregated —
    tiny vs the point corpus) ×(1+3k(k+1)) and equi-joins it against
    itself; global moments are ONE single-row aggregate broadcast back.
    Every input is an exact integer, the IEEE op order is pinned (and
    mirrored by the gate's DuckDB oracle bit-for-bit), and BOTH
    degenerate-denominator guards are integer-only — n·W − W² > 0
    (weight spread) and n·Σx² − (Σx)² > 0 (zero variance: a constant
    field has no hotspots, and Spark's NULL-on-divide-by-zero vs
    DuckDB's NaN would otherwise split the engines) — so hotspot
    z-scores are engine-reproducible.  (Σx)² bounds the value domain:
    |Σx| must stay < 2^31 for the integer guard product.

    Returns (hq, hr, w_i, s1, z).
    """
    from pyspark.sql import functions as F  # noqa: F811 (module-local)

    offs = F.array(*[
        F.struct(F.lit(dq).cast("long").alias("dq"),
                 F.lit(dr).cast("long").alias("dr"))
        for dq, dr in hex_disk_offsets(k)])
    probes = cells.select(
        F.col("hq").alias("chq"), F.col("hr").alias("chr"),
        F.explode(offs).alias("_o")).select(
        "chq", "chr",
        (F.col("chq") + F.col("_o.dq")).alias("thq"),
        (F.col("chr") + F.col("_o.dr")).alias("thr"))
    disk = (probes.join(cells,
                        (probes["thq"] == cells["hq"])
                        & (probes["thr"] == cells["hr"]))
            .groupBy(F.col("chq").alias("hq"), F.col("chr").alias("hr"))
            .agg(F.count(F.lit(1)).alias("w_i"),
                 F.sum(value).alias("s1")))
    glob = cells.agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum(value).alias("sx"),
        F.sum(F.col(value) * F.col(value)).alias("sxx"))
    j = disk.crossJoin(F.broadcast(glob))
    nc = F.col("nc").cast("double")
    xbar = F.col("sx").cast("double") / nc
    s = F.sqrt(F.col("sxx").cast("double") / nc - xbar * xbar)
    w = F.col("w_i").cast("double")
    num = F.col("s1").cast("double") - xbar * w
    den = s * F.sqrt((nc * w - w * w) / (nc - F.lit(1.0)))
    return (j.filter((F.col("nc") * F.col("w_i")
                      - F.col("w_i") * F.col("w_i") > 0)
                     & (F.col("nc") * F.col("sxx")
                        - F.col("sx") * F.col("sx") > 0))
            .select("hq", "hr", "w_i", "s1", (num / den).alias("z")))


def hex_polyfill_bbox(lon0, lat0, lon1, lat1, size: float):
    """Covering hex cells of a lon/lat bbox — the H3-polyfill analogue
    under this grid's center-in-region convention (a cell belongs to
    the box iff its CENTER lies in the half-open mercator rectangle
    [mx0, mx1) × [my0, my1) — the same convention H3 documents, which
    makes polyfills of a partition of space a partition of cells).

    Returns an array<struct<hq,hr>> Column: candidate axial ranges come
    from the fractional transform at the bbox corners (monotone in mx
    and my) padded by one cell, then centers are filtered exactly.
    Bounded explode (the candidate parallelogram), all codegen —
    mirrored bit-for-bit by the gate's SQL."""
    mx0, myA = mercator_xy(lon0, lat0)
    mx1, myB = mercator_xy(lon1, lat1)
    my_lo = F.least(myA, myB)
    my_hi = F.greatest(myA, myB)
    s = float(size)
    sc = F.lit(s)

    def qd(mx, my):
        return (F.lit(SQRT3_3) * mx - my / F.lit(3.0)) / sc

    def rd(my):
        return (F.lit(TWO_THIRDS) * my) / sc

    qmin = F.floor(qd(mx0, my_hi)).cast("long") - 1
    qmax = F.floor(qd(mx1, my_lo)).cast("long") + 1
    rmin = F.floor(rd(my_lo)).cast("long") - 1
    rmax = F.floor(rd(my_hi)).cast("long") + 1

    def center_ok(hq, hr):
        cx, cy = hex_center(hq, hr, s)
        return (cx >= mx0) & (cx < mx1) & (cy >= my_lo) & (cy < my_hi)

    return F.filter(
        F.flatten(F.transform(
            F.sequence(qmin, qmax),
            lambda hq: F.transform(
                F.sequence(rmin, rmax),
                lambda hr: F.struct(hq.alias("hq"), hr.alias("hr"))))),
        lambda c: center_ok(c["hq"], c["hr"]))
