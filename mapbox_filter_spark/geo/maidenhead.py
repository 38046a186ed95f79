"""Maidenhead grid locator encoding as pure integer Columns.

The Maidenhead locator (the IARU ham-radio grid, public spec) is a
prefix code over alternating lon/lat digit pairs: an 18×18 letter FIELD
(20° × 10°), a 10×10 digit SQUARE (2° × 1°), a 24×24 lowercase
SUBSQUARE (5' × 2.5'), and an optional 10×10 EXTENDED digit pair
(~0.5' × 0.25', ≈ 900 m × 450 m at the equator).  Like the plus code
(geo/olc.py) it truncates to coarser valid locators at every even
length — the roll-up property the gate exercises.

Exactness contract (the olc.py discipline): inputs are integer
MICRO-degrees, every stage is floor-div / mod over non-negative int64
(max intermediate lng'·240 < 8.7·10¹⁰ — far inside int64), and
characters map through literal alphabet arrays — the locator
value-hashes cross-engine.  Latitude must lie in [−90°, 90°) and
longitude in [−180°, 180°) (normalize upstream; the spec pins the
N-pole to field 'RR' via a lat = 90 clip that is the caller's job).

All pure Columns, zero shuffle — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tilemath import floor_div as _fdiv

__all__ = ["FIELDS", "SUBSQUARES", "maidenhead_encode"]

FIELDS = "ABCDEFGHIJKLMNOPQR"
SUBSQUARES = "abcdefghijklmnopqrstuvwx"
_DIGITS = "0123456789"

_E6 = 1_000_000


def _char(alphabet: str, d: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(ch) for ch in alphabet]),
        (d + 1).cast("int"))


def maidenhead_encode(lat_e6: Column, lng_e6: Column, *,
                      length: int = 8) -> Column:
    """Maidenhead locator of a point given integer micro-degree
    coordinates.  ``length`` ∈ {2, 4, 6, 8} chars (field / square /
    subsquare / extended).  Pure Column expression."""
    if length not in (2, 4, 6, 8):
        raise ValueError(f"length must be 2, 4, 6 or 8: {length}")
    lng = lng_e6.cast("long") + F.lit(180 * _E6)
    lat = lat_e6.cast("long") + F.lit(90 * _E6)
    parts = [
        _char(FIELDS, _fdiv(lng, 20 * _E6)),
        _char(FIELDS, _fdiv(lat, 10 * _E6)),
    ]
    if length >= 4:
        parts.append(_char(_DIGITS, _fdiv(F.pmod(lng, F.lit(20 * _E6)),
                                          2 * _E6)))
        parts.append(_char(_DIGITS, _fdiv(F.pmod(lat, F.lit(10 * _E6)),
                                          _E6)))
    if length >= 6:
        # subsquare: 24 cells across 2° lon / 1° lat
        parts.append(_char(SUBSQUARES,
                           _fdiv(F.pmod(lng, F.lit(2 * _E6)) * 12, _E6)))
        parts.append(_char(SUBSQUARES,
                           _fdiv(F.pmod(lat, F.lit(_E6)) * 24, _E6)))
    if length >= 8:
        # extended square: tenths of a subsquare
        parts.append(_char(_DIGITS, F.pmod(
            _fdiv(F.pmod(lng, F.lit(2 * _E6)) * 120, _E6), F.lit(10))))
        parts.append(_char(_DIGITS, F.pmod(
            _fdiv(F.pmod(lat, F.lit(_E6)) * 240, _E6), F.lit(10))))
    return F.concat(*parts)
