"""Web-Mercator tile math as native Column expressions.

Hierarchical quadkey int64 cells give H3-equivalent index semantics with
exact, dependency-free math — and ZXY/quadkey is what the reference itself
computes over (tile ids /root/reference/app/Types.hs:14-31, TMS flip
app/Types.hs:34-38 ``2^z - y - 1``, child coords app/Main.hs:519-521
``(z+1, 2x+bx, 2y+by)``, path layout app/Main.hs:503-505).

Cell encoding: ``cell = (z << 58) | (x << 29) | y`` — valid for z <= 28,
monotone in (x, y) within a zoom, parent/child by shift arithmetic.  All
functions return Columns; everything stays inside whole-stage codegen.

Scale note: at 10^12 rows these expressions cost ~a dozen flops/row with no
shuffle, no Python, and no UDF serialization; the derived ``z/x/y`` columns
are the partition keys for every downstream join/agg.
"""

from __future__ import annotations

import math
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

MERCATOR_MAX_LAT = 85.05112878  # Web-Mercator latitude clamp

ColOrName = Union[Column, str]
_Z_SHIFT = 58
_X_SHIFT = 29
_XY_MASK = (1 << 29) - 1


def _c(c: ColOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _n_tiles(z: ColOrName) -> Column:
    # 2^z as long — an integer shift, identical in value to the previous
    # pow(2.0, z) cast (exact for z <= 28, the cell-encoding bound) but a
    # single ALU op per row instead of a libm pow call when z is a column
    # (multi-zoom pipelines; literal z constant-folds either way).  The
    # python F.shiftleft wrapper only takes a literal shift amount; the SQL
    # function takes a Column.
    return F.call_function("shiftleft", F.lit(1).cast("long"),
                           _c(z).cast("int"))



def floor_div(c: Column, d: int) -> Column:
    """True floor division of an integer column by a positive literal —
    ``(c - pmod(c, d)) / d`` cast long: exact through the double divide
    for |c| < 2^53, and correct for NEGATIVE c (unlike `div`'s
    truncation toward zero, which breaks grid-cell adjacency at 0).
    The shared grid-cell quantizer for the eps-cell joins
    (operators/cluster.py, geo/overlay.py)."""
    return ((c - F.pmod(c, F.lit(d))) / F.lit(d)).cast("long")


def floor_div_big(num: Column, den: Column) -> Column:
    """Exact floor division of NON-NEGATIVE int64 columns at ANY
    magnitude: remainder removal + DECIMAL(38) division (exact for
    the then-integral quotient), cast back to long.  The double-divide
    spelling of :func:`floor_div` silently floors off by one past
    2^53 numerators (verified: 177744319624659649 // 716411281 reads
    248103740 instead of 248103741 — a cross-engine hash break against
    DuckDB's integer ``//``); use THIS form whenever the numerator can
    exceed 2^53 (cross² terms, encoded argmins over large coords).
    """
    return ((num - F.pmod(num, den)).cast("decimal(38,0)")
            / den.cast("decimal(38,0)")).cast("long")

def lon_to_tile_x(lon: ColOrName, z: ColOrName) -> Column:
    """Longitude -> tile column at zoom z (clamped into [0, 2^z - 1])."""
    n = _n_tiles(z)
    x = F.floor((_c(lon) + F.lit(180.0)) / F.lit(360.0) * n.cast("double"))
    return F.greatest(F.lit(0).cast("long"), F.least(x.cast("long"), n - 1))


def lat_to_tile_y(lat: ColOrName, z: ColOrName) -> Column:
    """Latitude -> XYZ tile row at zoom z (Web-Mercator, clamped)."""
    n = _n_tiles(z)
    latc = F.greatest(F.lit(-MERCATOR_MAX_LAT),
                      F.least(_c(lat).cast("double"), F.lit(MERCATOR_MAX_LAT)))
    rad = F.radians(latc)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0)
                * n.cast("double"))
    return F.greatest(F.lit(0).cast("long"), F.least(y.cast("long"), n - 1))


def tile_cols(lon: ColOrName, lat: ColOrName, z: ColOrName) -> tuple[Column, Column]:
    return lon_to_tile_x(lon, z), lat_to_tile_y(lat, z)


def tms_y(y: ColOrName, z: ColOrName) -> Column:
    """XYZ -> TMS row flip: ``2^z - y - 1`` (app/Types.hs:34-38)."""
    return _n_tiles(z) - _c(y).cast("long") - 1


xyz_y = tms_y  # the flip is an involution


def cell_encode(z: ColOrName, x: ColOrName, y: ColOrName) -> Column:
    """(z, x, y) -> int64 cell id."""
    # disjoint bit fields => addition == bitwise-or (and stays codegen-simple)
    return (
        F.shiftleft(_c(z).cast("long"), _Z_SHIFT)
        + F.shiftleft(_c(x).cast("long"), _X_SHIFT)
        + _c(y).cast("long")
    )


def cell_decode(cell: ColOrName) -> tuple[Column, Column, Column]:
    c = _c(cell).cast("long")
    z = F.shiftright(c, _Z_SHIFT).cast("int")
    # python & on Columns is logical AND; mask via pmod instead
    x = F.pmod(F.shiftright(c, _X_SHIFT), F.lit(_XY_MASK + 1).cast("long"))
    y = F.pmod(c, F.lit(_XY_MASK + 1).cast("long"))
    return z, x, y


def cell_parent(cell: ColOrName, steps: int = 1) -> Column:
    """Parent cell ``(z-s, x >> s, y >> s)`` — the down-copy key math
    (src/Mapbox/DownCopy.hs:63-70, app/Main.hs:519-521 inverted)."""
    z, x, y = cell_decode(cell)
    return cell_encode(z - F.lit(steps), F.shiftright(x, steps),
                       F.shiftright(y, steps))


def cell_child_origin(cell: ColOrName) -> Column:
    """First child cell ``(z+1, 2x, 2y)``; the 4 children are origin +
    {0,1}<<29 | {0,1} offsets."""
    z, x, y = cell_decode(cell)
    return cell_encode(z + F.lit(1), F.shiftleft(x, 1), F.shiftleft(y, 1))


def quadkey(z: ColOrName, x: ColOrName, y: ColOrName) -> Column:
    """Microsoft-style quadkey string (z characters of base-4 digits).

    Built natively: digit_i = 2*bit_i(y) + bit_i(x) for i from z-1 down to 0.
    """
    zc, xc, yc = _c(z).cast("int"), _c(x).cast("long"), _c(y).cast("long")
    idx = F.sequence(zc - 1, F.lit(0), F.lit(-1))
    bit = lambda v, i: F.pmod(  # noqa: E731  (shift amount must be literal)
        F.floor(v.cast("double") / F.pow(F.lit(2.0), i.cast("double"))).cast("long"),
        F.lit(2).cast("long"),
    )
    digits = F.transform(
        idx, lambda i: (bit(yc, i) * 2 + bit(xc, i)).cast("string"))
    return F.when(zc == 0, F.lit("")).otherwise(F.array_join(digits, ""))


def k_ring_cells(cell: ColOrName, radius: ColOrName | int) -> Column:
    """array<long> of all cells within Chebyshev radius r of ``cell`` at the
    same zoom, clamped at pyramid edges (no antimeridian wrap — matching the
    reference's non-wrapping tile addressing).  Native nested ``transform``
    over ``sequence`` — no UDF, no explode until the caller chooses to.
    """
    r = F.lit(radius) if isinstance(radius, int) else _c(radius)
    z, x, y = cell_decode(cell)
    n = _n_tiles(z)
    dxs = F.sequence(-r, r)
    nested = F.transform(
        dxs,
        lambda dx: F.transform(
            dxs,
            lambda dy: F.when(
                (x + dx >= 0) & (x + dx < n) & (y + dy >= 0) & (y + dy < n),
                cell_encode(z, x + dx, y + dy),
            ),
        ),
    )
    return F.filter(F.flatten(nested), lambda c: c.isNotNull())


def ring_only_cells(cell: ColOrName, radius: ColOrName | int) -> Column:
    """Cells at EXACTLY Chebyshev distance r (the expansion frontier for
    incremental kNN search)."""
    r = F.lit(radius) if isinstance(radius, int) else _c(radius)
    z, x, y = cell_decode(cell)
    n = _n_tiles(z)
    dxs = F.sequence(-r, r)
    nested = F.transform(
        dxs,
        lambda dx: F.transform(
            dxs,
            lambda dy: F.when(
                (F.greatest(F.abs(dx), F.abs(dy)) == r)
                & (x + dx >= 0) & (x + dx < n) & (y + dy >= 0) & (y + dy < n),
                cell_encode(z, x + dx, y + dy),
            ),
        ),
    )
    return F.filter(F.flatten(nested), lambda c: c.isNotNull())


def polyfill_bbox(
    lon_min: ColOrName, lat_min: ColOrName,
    lon_max: ColOrName, lat_max: ColOrName,
    z: ColOrName | int,
) -> Column:
    """array<long> covering cells of a bbox at zoom z (polyfill).

    Native ``sequence`` x ``sequence`` cross — the Spark-first replacement
    for H3 polyfill on axis-aligned extents; arbitrary polygons polyfill
    their bbox then refine via the PIP kernel.
    """
    zc = F.lit(z) if isinstance(z, int) else _c(z)
    x0, x1 = lon_to_tile_x(lon_min, zc), lon_to_tile_x(lon_max, zc)
    # note: lat_max maps to the SMALLER y (XYZ rows grow southward)
    y0, y1 = lat_to_tile_y(lat_max, zc), lat_to_tile_y(lat_min, zc)
    xs = F.sequence(x0, x1)
    return F.flatten(
        F.transform(xs, lambda x: F.transform(F.sequence(y0, y1),
                                              lambda y: cell_encode(zc, x, y)))
    )
