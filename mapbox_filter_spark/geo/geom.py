"""Polygon/polyline analytics as native Column folds over vertex arrays.

Vertices are ``array<struct<x:long,y:long>>`` in integer micro-degrees (or
any integer grid, e.g. the MVT 0..4096 tile-local extent) — the same
integer-geometry discipline the reference's tile coder uses
(src/Mapbox/UntaleFilter analogue: geometry stays integral end-to-end).
Integer coordinates make every derived statistic either exact integer
arithmetic (shoelace area, centroid numerators, bbox) or a fixed-order
IEEE fold (perimeter), so the DuckDB oracle can match value-for-value
with zero rounding slop.

Overflow discipline (ANSI mode makes long overflow a runtime error, not a
wrap): the shoelace fold works on ABSOLUTE coords — per-term products stay
< 2^57 for micro-degree magnitudes (<1.8e8 × 9e7) — but the centroid
numerator multiplies a coordinate SUM by a cross term, which would
overflow at ~1e24; both engines therefore translate to vertex-0-local
coordinates first (exact, and the centroid is translation-equivariant).

All folds are sequential left folds (``F.aggregate``) so double summation
order is pinned; the oracle mirrors with ordered ``list_reduce``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)


def _vx(v: Column) -> Column:
    return v["x"]


def _vy(v: Column) -> Column:
    return v["y"]


def _nxt(verts: Column, i: Column) -> Column:
    """Vertex after index i with ring wraparound (element_at is 1-based)."""
    return F.element_at(verts, (F.pmod(i + 1, F.size(verts)) + 1).cast("int"))


def _cur(verts: Column, i: Column) -> Column:
    return F.element_at(verts, (i + 1).cast("int"))


def shoelace_area2(verts: Column) -> Column:
    """Twice the signed polygon area (long, exact): Σ xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ.

    Positive for counter-clockwise rings — the MVT exterior-ring winding
    convention, so ``shoelace_area2 > 0`` doubles as the is-exterior test.
    """
    idx = F.sequence(F.lit(0), F.size(verts) - 1)
    return F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, i: acc
        + _vx(_cur(verts, i)) * _vy(_nxt(verts, i))
        - _vx(_nxt(verts, i)) * _vy(_cur(verts, i)),
    )


def _local(verts: Column) -> Column:
    """Vertices translated so vertex 0 is the origin (exact ints)."""
    v0 = F.element_at(verts, 1)
    return F.transform(
        verts,
        lambda v: F.struct((_vx(v) - _vx(v0)).alias("x"),
                           (_vy(v) - _vy(v0)).alias("y")))


def polygon_centroid(verts: Column) -> tuple[Column, Column]:
    """(cx, cy) area-weighted polygon centroid as doubles.

    Numerators are exact longs over vertex-0-local coords; the single
    double division (and the final exact-int add-back of vertex 0) is
    IEEE-identical across engines.  Degenerate (zero-area) polygons
    return nulls rather than a division error.
    """
    loc = _local(verts)
    idx = F.sequence(F.lit(0), F.size(verts) - 1)

    def num(coord: str) -> Column:
        return F.aggregate(
            idx, F.lit(0).cast("long"),
            lambda acc, i: acc
            + (_cur(loc, i)[coord] + _nxt(loc, i)[coord])
            * (_vx(_cur(loc, i)) * _vy(_nxt(loc, i))
               - _vx(_nxt(loc, i)) * _vy(_cur(loc, i))),
        )

    a2 = shoelace_area2(verts)  # translation-invariant
    denom = F.when(a2 != 0, (3 * a2).cast("double"))
    v0 = F.element_at(verts, 1)
    cx = num("x").cast("double") / denom + _vx(v0).cast("double")
    cy = num("y").cast("double") / denom + _vy(v0).cast("double")
    return cx, cy


def polygon_bbox(verts: Column) -> tuple[Column, Column, Column, Column]:
    """(minx, miny, maxx, maxy) as exact longs."""
    xs = F.transform(verts, _vx)
    ys = F.transform(verts, _vy)
    return (F.array_min(xs), F.array_min(ys),
            F.array_max(xs), F.array_max(ys))


def ring_perimeter(verts: Column) -> Column:
    """Closed-ring planar perimeter (double): Σ √(Δx²+Δy²) in vertex order.

    Δ products are exact longs; sqrt is correctly rounded IEEE on every
    engine; the sum is a pinned-order left fold — bit-reproducible.
    """
    idx = F.sequence(F.lit(0), F.size(verts) - 1)
    return F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc + F.sqrt(
            ((_vx(_nxt(verts, i)) - _vx(_cur(verts, i)))
             * (_vx(_nxt(verts, i)) - _vx(_cur(verts, i)))
             + (_vy(_nxt(verts, i)) - _vy(_cur(verts, i)))
             * (_vy(_nxt(verts, i)) - _vy(_cur(verts, i)))).cast("double")),
    )


def haversine_m(lon1: Column, lat1: Column,
                lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters between two lon/lat points (degrees).

    Native trig Columns (whole-stage codegen) — the geodesic metric for
    cross-tile distances where the planar tile-local metric stops being
    valid.  NOT used in value-hash gates: libm trig differs across
    engines in final ulps; parity is pytest-differential (rel 1e-12).
    """
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon))
    return 2 * EARTH_RADIUS_M * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def bearing_deg(lon1: Column, lat1: Column,
                lon2: Column, lat2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees in
    [0, 360).  Native trig (codegen); like haversine_m, NOT for
    value-hash gates (libm ulps) — parity is pytest-differential."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(rl2)
    x = (F.cos(rl1) * F.sin(rl2)
         - F.sin(rl1) * F.cos(rl2) * F.cos(dlon))
    return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))


def destination_point(lon: Column, lat: Column, bearing: Column,
                      dist_m: Column) -> Column:
    """struct(lon, lat) reached from the start point along the initial
    ``bearing`` (degrees) for ``dist_m`` meters on the great circle —
    the forward geodesic on the sphere (direct problem).  Longitude
    normalized to [-180, 180)."""
    rl = F.radians(lat)
    rb = F.radians(bearing)
    ad = dist_m / F.lit(EARTH_RADIUS_M)
    lat2 = F.asin(F.sin(rl) * F.cos(ad)
                  + F.cos(rl) * F.sin(ad) * F.cos(rb))
    lon2 = (F.radians(lon)
            + F.atan2(F.sin(rb) * F.sin(ad) * F.cos(rl),
                      F.cos(ad) - F.sin(rl) * F.sin(lat2)))
    lon_deg = F.pmod(F.degrees(lon2) + 180.0, F.lit(360.0)) - 180.0
    return F.struct(lon_deg.alias("lon"), F.degrees(lat2).alias("lat"))


def line_point_at(verts: Column, frac: float) -> Column:
    """The point at fraction ``frac`` of a polyline's length
    (ST_LineInterpolatePoint analogue): struct(seg_i, px, py).

    Entirely in-row (no shuffle): segment lengths are sqrt of exact
    integer deltas; every cumulative sum is the LEFT FOLD of the length
    prefix (prefix(i) recomputed per candidate — O(n²) folds, fine for
    vertex counts that fit in a row), so an engine replaying the same
    association reproduces the selection index and the interpolated
    coordinates bit-for-bit.  ``seg_i`` is the 1-based segment index;
    the crossing segment is the FIRST i with prefix(i) ≥ frac·total
    (ties at a vertex resolve to the earlier segment, u = 1).
    """
    n = F.size(verts)

    def seg_len(i: Column) -> Column:
        a = F.element_at(verts, i)
        b = F.element_at(verts, i + 1)
        dx = (b["x"] - a["x"]).cast("double")
        dy = (b["y"] - a["y"]).cast("double")
        return F.sqrt(dx * dx + dy * dy)

    lens = F.transform(F.sequence(F.lit(1), n - 1),
                       lambda i: seg_len(i.cast("int")))

    def prefix(cnt: Column) -> Column:
        return F.aggregate(F.slice(lens, 1, cnt), F.lit(0.0),
                           lambda a, b: a + b)

    total = F.aggregate(lens, F.lit(0.0), lambda a, b: a + b)
    target = total * F.lit(float(frac))
    idx = F.element_at(
        F.filter(F.sequence(F.lit(1), n - 1),
                 lambda i: prefix(i) >= target), 1)
    cum_before = F.when(idx == 1, F.lit(0.0)).otherwise(prefix(idx - 1))
    u = (target - cum_before) / F.element_at(lens, idx)
    a = F.element_at(verts, idx)
    b = F.element_at(verts, idx + 1)
    px = a["x"].cast("double") + u * (b["x"] - a["x"]).cast("double")
    py = a["y"].cast("double") + u * (b["y"] - a["y"]).cast("double")
    return F.struct(idx.cast("long").alias("seg_i"),
                    px.alias("px"), py.alias("py"))


def spherical_area_m2(verts: Column, scale: float = 1e6) -> Column:
    """True (spherical) polygon area in m² — the Chamberlain & Duquette
    (JPL 2007) ring-area formula the GeoJSON ecosystem uses
    (turf.js ringArea):

        A = |Σᵢ (λᵢ₊₁ − λᵢ)·(2 + sin φᵢ + sin φᵢ₊₁)| · R²/2

    over the closed ring, λ/φ in radians.  ``verts`` is the repo's
    array<struct<x,y>> in integer micro-degrees (``scale`` converts to
    degrees); the summation is an F.aggregate LEFT FOLD in vertex
    order, so the oracle's ordered ``list_reduce`` replays the exact
    IEEE sequence — the true-area complement to the planar
    ``shoelace_area2`` (exact integers, mercator-plane).  Accurate to
    the sphere model (no ellipsoid), same as the published source."""
    n = F.size(verts)
    inv = 1.0 / float(scale)

    def lam(i: Column) -> Column:
        return F.radians(F.element_at(verts, i)["x"].cast("double")
                         * F.lit(inv))

    def phi(i: Column) -> Column:
        return F.radians(F.element_at(verts, i)["y"].cast("double")
                         * F.lit(inv))

    def term(i: Column) -> Column:
        j = F.when(i == n, F.lit(1)).otherwise(i + 1).cast("int")
        return ((lam(j) - lam(i))
                * (F.lit(2.0) + F.sin(phi(i)) + F.sin(phi(j))))

    s = F.aggregate(F.sequence(F.lit(1), n),
                    F.lit(0.0),
                    lambda acc, i: acc + term(i.cast("int")))
    return F.abs(s) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)
