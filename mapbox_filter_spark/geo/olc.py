"""Open Location Code (plus codes) encoding as pure integer Columns.

OLC is the public-domain Google grid code (openlocationcode spec): a
base-20 interleaved lat/lng prefix code — 10 digits address a
1/8000° × 1/8000° cell (~14 m), an optional 11th digit refines it on a
5 × 4 sub-grid (~3.5 m).  Unlike geohash (base-32 bit interleave) the
digit pairs are DECIMAL-degree aligned, so codes truncate to coarser
valid codes at every even length — the property that makes plus codes
human-shareable addresses.

Exactness contract: inputs are integer MICRO-degrees, every stage is
floor-div / mod over non-negative int64 (max intermediate
(lat+90°)·40000 in µdeg ≈ 7.2·10¹² — far inside int64), and digits map
through a literal alphabet array — the code value-hashes cross-engine.
Latitude must lie in [−90°, 90°) and longitude in [−180°, 180°)
(normalize upstream; the spec's lat = 90 clip is the caller's job —
documented, not silently applied).

All pure Columns, zero shuffle — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tilemath import floor_div as _fdiv

__all__ = ["OLC_ALPHABET", "olc_encode"]

OLC_ALPHABET = "23456789CFGHJMPQRVWX"

_E6 = 1_000_000


def _digit_char(d: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(ch) for ch in OLC_ALPHABET]),
        (d + 1).cast("int"))


def olc_encode(lat_e6: Column, lng_e6: Column, *,
               length: int = 10) -> Column:
    """Plus code of a point given integer micro-degree coordinates.

    ``length`` 10 → ``"7FG49QCJ+2V"`` form (8 digits, '+', 2 digits);
    11 adds the 5×4 grid refinement char.  Pure Column expression.
    """
    if length not in (10, 11):
        raise ValueError(f"length must be 10 or 11: {length}")
    lat = lat_e6.cast("long") + F.lit(90 * _E6)
    lng = lng_e6.cast("long") + F.lit(180 * _E6)
    latv = _fdiv(lat * F.lit(8000), _E6)
    lngv = _fdiv(lng * F.lit(8000), _E6)
    chars: "list[Column]" = []
    for i in range(5):
        p = 20 ** (4 - i)
        chars.append(_digit_char(F.pmod(_fdiv(latv, p), F.lit(20))))
        chars.append(_digit_char(F.pmod(_fdiv(lngv, p), F.lit(20))))
    parts = chars[:8] + [F.lit("+")] + chars[8:10]
    if length == 11:
        row = F.pmod(_fdiv(lat * F.lit(40000), _E6), F.lit(5))
        col = F.pmod(_fdiv(lng * F.lit(32000), _E6), F.lit(4))
        parts.append(_digit_char(row * 4 + col))
    return F.concat(*parts)
