"""Geohash encoding as closed-form native bit math (no loops, no UDF).

Third public cell scheme next to ZXY/quadkey (tilemath.py) and S2
(s2.py): base-32 text keys whose prefix ordering IS spatial containment,
so prefix filters prune partition/row-group ranges on string-clustered
layouts the same way the S2 BETWEEN ranges do on int64 layouts.

Algorithm (public spec): lon/lat are binary-bisected B times each; the
bit streams interleave lon-first; each 5-bit group maps into the geohash
base-32 alphabet.  The bisection closed form is
``floor((lon+180)/360 · 2^B)`` and the interleave is a Morton spread —
five mask-shift stages, all 64-bit integer ops, so Spark's codegen and
the DuckDB oracle produce bit-identical keys (the only doubles are one
add/divide/multiply/floor chain, pinned to the same IEEE op order).

Precision 8 (B=20 bits per axis, 40 bits total) ≈ 19 m cells — finer
than any zoom the tile pyramid uses; precision is capped at 12 (the
int64 interleave limit, 60 bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# Morton spread stages for a <=30-bit input (bit k -> bit 2k)
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(x: Column) -> Column:
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _axis_bits(v: Column, lo: float, hi: float, b: int) -> Column:
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << b)))
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)),
                   F.lit((1 << b) - 1))


def geohash_bits(lon: Column, lat: Column, precision: int = 8) -> Column:
    """The interleaved ``5·precision``-bit geohash integer (long)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12 (int64 interleave)")
    nbits = 5 * precision
    b_lon = (nbits + 1) // 2
    b_lat = nbits // 2
    lon_i = _axis_bits(lon, -180.0, 180.0, b_lon)
    lat_i = _axis_bits(lat, -90.0, 90.0, b_lat)
    if b_lon == b_lat:  # even total: lon at odd bit positions (MSB first)
        return F.shiftleft(_spread_bits(lon_i), 1)\
                .bitwiseOR(_spread_bits(lat_i))
    # odd total: lon has one extra leading bit
    return _spread_bits(lon_i).bitwiseOR(F.shiftleft(_spread_bits(lat_i), 1))


def geohash(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Base-32 geohash string of the given precision — native Columns."""
    bits = geohash_bits(lon, lat, precision)
    chars = F.array(*[F.lit(c) for c in _ALPHABET])
    return F.concat(*[
        F.element_at(
            chars,
            (F.shiftright(bits, 5 * (precision - 1 - i))
             .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for i in range(precision)
    ])


def py_geohash(lon: float, lat: float, precision: int = 8) -> str:
    """Pure-python twin (bisection reference, no Morton trick) for tests."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    for _ in range(5 * precision):
        if even:
            mid = (lo_lon + hi_lon) / 2
            bit = lon >= mid
            lo_lon, hi_lon = (mid, hi_lon) if bit else (lo_lon, mid)
        else:
            mid = (lo_lat + hi_lat) / 2
            bit = lat >= mid
            lo_lat, hi_lat = (mid, hi_lat) if bit else (lo_lat, mid)
        bits = (bits << 1) | int(bit)
        even = not even
    for i in range(precision):
        out.append(_ALPHABET[(bits >> 5 * (precision - 1 - i)) & 31])
    return "".join(out)


def sql_geohash_select(src_sql: str, key_cols: list[str], lon_col: str,
                       lat_col: str, precision: int = 8,
                       out: str = "gh") -> str:
    """DuckDB SELECT mirroring :func:`geohash` bit-for-bit.

    Emitted as a chain of nested SELECT stages (one per Morton mask) —
    inlining the spread as one expression would nest its argument 2⁵
    times per stage and blow the SQL up exponentially.
    """
    nbits = 5 * precision
    b_lon = (nbits + 1) // 2
    b_lat = nbits // 2
    keys = ", ".join(key_cols)

    def axis(expr, lo, span, b):
        return (f"LEAST(GREATEST(CAST(FLOOR((({expr}) - ({lo})) / {span} "
                f"* {float(1 << b)}) AS BIGINT), 0), {(1 << b) - 1})")

    q = (f"SELECT {keys}, {axis(lon_col, '-180.0', '360.0', b_lon)} AS li, "
         f"{axis(lat_col, '-90.0', '180.0', b_lat)} AS ti FROM ({src_sql})")
    for shift, mask in _SPREAD:
        q = (f"SELECT {keys}, ((li | (li << {shift})) & {mask}) AS li, "
             f"((ti | (ti << {shift})) & {mask}) AS ti FROM ({q})")
    if b_lon == b_lat:
        q = f"SELECT {keys}, ((li << 1) | ti) AS bits FROM ({q})"
    else:
        q = f"SELECT {keys}, (li | (ti << 1)) AS bits FROM ({q})"
    chars = "'" + _ALPHABET + "'"
    parts = [
        f"SUBSTR({chars}, CAST(((bits >> {5 * (precision - 1 - i)}) & 31)"
        f" + 1 AS INT), 1)"
        for i in range(precision)
    ]
    return f"SELECT {keys}, {' || '.join(parts)} AS {out} FROM ({q})"


# ------------------------------------------------- decode / neighbors

_COMPACT = [(1, 0x3333333333333333), (2, 0x0F0F0F0F0F0F0F0F),
            (4, 0x00FF00FF00FF00FF), (8, 0x0000FFFF0000FFFF),
            (16, 0x00000000FFFFFFFF)]


def _compact_bits(x: Column) -> Column:
    """Inverse Morton spread: keep even-position bits, pack to the low
    half (bit 2k -> bit k)."""
    x = x.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in _COMPACT:
        x = (x.bitwiseOR(F.shiftright(x, shift))).bitwiseAND(F.lit(mask))
    return x


def geohash_to_bits(gh: Column, precision: int) -> Column:
    """Base-32 string -> interleaved bit integer (inverse of geohash)."""
    total = None
    for i in range(precision):
        # call_function: SQL locate() takes expression args (the python
        # F.locate wrapper only accepts a literal substring)
        idx = (F.call_function("locate", F.substring(gh, i + 1, 1),
                               F.lit(_ALPHABET)) - 1).cast("long")
        term = F.shiftleft(idx, 5 * (precision - 1 - i))
        total = term if total is None else total.bitwiseOR(term)
    return total


def _axes_of_bits(bits: Column, precision: int) -> tuple:
    """(lon_i, lat_i) integer cell coordinates from the interleave."""
    nbits = 5 * precision
    b_lon = (nbits + 1) // 2
    if b_lon == nbits - b_lon:  # even: lon at odd positions
        return _compact_bits(F.shiftright(bits, 1)), _compact_bits(bits)
    return _compact_bits(bits), _compact_bits(F.shiftright(bits, 1))


def _axis_masks(precision: int) -> tuple:
    """(lon_mask, lat_mask): which bit positions of the interleave belong
    to each axis.  Bit j (LSB-0) is stream position ``nbits-1-j``; even
    stream positions are longitude."""
    nbits = 5 * precision
    lon_m = lat_m = 0
    for j in range(nbits):
        if (nbits - 1 - j) % 2 == 0:
            lon_m |= 1 << j
        else:
            lat_m |= 1 << j
    return lon_m, lat_m


def geohash_neighbor(gh: Column, dlon: int, dlat: int,
                     precision: int) -> Column:
    """The geohash ``(dlon, dlat)`` cells away, via Morton masked
    add/sub (the libmorton/BIGMIN trick): setting the OTHER axis's bit
    positions to all-ones makes ``+1`` carry straight through them, so a
    single-axis step is four int64 ops — no decode / re-encode round
    trip (an earlier decode-based draft duplicated the input subtree
    2^5 times per compact stage and OOM'd codegen at precision 5).
    Longitude WRAPS at the antimeridian; stepping past a pole returns
    NULL (there is no cell there)."""
    lon_m, lat_m = _axis_masks(precision)
    bits = geohash_to_bits(gh, precision)
    valid = None

    def inc(b: Column, m: int) -> Column:
        # ~m is the two's-complement python int — a legal int64 literal
        return ((b.bitwiseOR(F.lit(~m)) + 1).bitwiseAND(F.lit(m))
                ).bitwiseOR(b.bitwiseAND(F.lit(~m)))

    def dec(b: Column, m: int) -> Column:
        return ((b.bitwiseAND(F.lit(m)) - 1).bitwiseAND(F.lit(m))
                ).bitwiseOR(b.bitwiseAND(F.lit(~m)))

    for _ in range(abs(dlat)):
        at_edge = (bits.bitwiseAND(F.lit(lat_m))
                   == F.lit(lat_m if dlat > 0 else 0))
        valid = ~at_edge if valid is None else valid & ~at_edge
        bits = inc(bits, lat_m) if dlat > 0 else dec(bits, lat_m)
    for _ in range(abs(dlon)):  # masked wrap IS the antimeridian wrap
        bits = inc(bits, lon_m) if dlon > 0 else dec(bits, lon_m)
    chars = F.array(*[F.lit(c) for c in _ALPHABET])
    s = F.concat(*[
        F.element_at(
            chars,
            (F.shiftright(bits, 5 * (precision - 1 - i))
             .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for i in range(precision)
    ])
    return s if valid is None else F.when(valid, s)


def geohash_ring_cells(gh: Column, precision: int) -> Column:
    """``array<string>`` of the 3×3 cell block centered on ``gh`` (self +
    the 8 Morton-stepped neighbors; pole-clipped entries are NULL — drop
    them after explode).  Pass a plain column reference, not a full
    ``geohash()`` expression: each neighbor re-reads ``gh`` ``precision``
    times, so a complex input subtree is duplicated 8·precision×."""
    cells = [gh] + [
        geohash_neighbor(gh, dlon, dlat, precision)
        for dlon in (-1, 0, 1) for dlat in (-1, 0, 1)
        if not (dlon == 0 and dlat == 0)
    ]
    return F.array(*cells)


def py_geohash_neighbors(gh: str) -> "list[str]":
    """All 8 edge/corner neighbors (python twin; pole-clipped,
    antimeridian-wrapped)."""
    p = len(gh)
    nbits = 5 * p
    b_lon = (nbits + 1) // 2
    b_lat = nbits // 2
    bits = 0
    for c in gh:
        bits = (bits << 5) | _ALPHABET.index(c)
    lon_i, lat_i = 0, 0
    for k in range(nbits):  # MSB-first: bit 0 of stream is lon
        bit = (bits >> (nbits - 1 - k)) & 1
        if k % 2 == 0:
            lon_i = (lon_i << 1) | bit
        else:
            lat_i = (lat_i << 1) | bit
    out = []
    for dlon in (-1, 0, 1):
        for dlat in (-1, 0, 1):
            if dlon == dlat == 0:
                continue
            la = lat_i + dlat
            if not 0 <= la < (1 << b_lat):
                continue
            lo = (lon_i + dlon) % (1 << b_lon)
            nb = 0
            for k in range(nbits):
                if k % 2 == 0:
                    nb = (nb << 1) | ((lo >> (b_lon - 1 - k // 2)) & 1)
                else:
                    nb = (nb << 1) | ((la >> (b_lat - 1 - k // 2)) & 1)
            out.append("".join(_ALPHABET[(nb >> 5 * (p - 1 - i)) & 31]
                               for i in range(p)))
    return out


def py_geohash_ring(gh: str, k: int) -> "list[str]":
    """Cells at Chebyshev distance ≤ k (the probe list for a prefix/
    equality pruned neighbor join) — BFS over py_geohash_neighbors."""
    seen = {gh}
    frontier = [gh]
    for _ in range(k):
        nxt = []
        for g in frontier:
            for nb in py_geohash_neighbors(g):
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        frontier = nxt
    return sorted(seen)
