"""Untyped expression AST + JSON parser.

Parity target: /root/reference/src/Mapbox/UntypedExpression.hs (117 LoC).
Behavioral notes replicated exactly:

- A JSON array whose elements are ALL numbers parses as a number-array
  literal, NOT an expression (UntypedExpression.hs:83-85); this includes the
  empty array ``[]``.
- JSON ``null`` is rejected ("Null not supported as expression").
- A JSON object parses as a legacy "function" (stops) node carrying only its
  ``property`` — later rejected by the type checker, but its property name
  still feeds attribute scraping (Style.hs:61).
- ``match`` tables are built by *prepending* pairs (UntypedExpression.hs:113-116),
  so the runtime sees label pairs in REVERSED source order — on duplicate
  labels the last occurrence wins.  We preserve source order in the AST and
  reverse in the type checker, where the reversal is documented.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Union


class ExprParseError(ValueError):
    pass


# ---------------------------------------------------------------- AST nodes


@dataclass(frozen=True)
class UNum:
    value: float


@dataclass(frozen=True)
class UStr:
    value: str


@dataclass(frozen=True)
class UBool:
    value: bool


@dataclass(frozen=True)
class UNumArr:
    values: tuple[float, ...]


@dataclass(frozen=True)
class UVar:
    name: str


@dataclass(frozen=True)
class UApp:
    name: str
    args: tuple["UExp", ...]


@dataclass(frozen=True)
class ULet:
    name: str
    value: "UExp"
    body: "UExp"


@dataclass(frozen=True)
class UFunction:
    """Legacy zoom-function ("stops") object; rejected at type check."""

    property: str | None = None


# match labels ------------------------------------------------------------


@dataclass(frozen=True)
class LStr:
    value: str


@dataclass(frozen=True)
class LStrArr:
    values: tuple[str, ...]


@dataclass(frozen=True)
class LNum:
    value: float


@dataclass(frozen=True)
class LNumArr:
    values: tuple[float, ...]


@dataclass(frozen=True)
class LBool:
    value: bool


ULabel = Union[LStr, LStrArr, LNum, LNumArr, LBool]


@dataclass(frozen=True)
class UMatch:
    input: "UExp"
    table: tuple[tuple[ULabel, "UExp"], ...]  # source order (see module docstring)
    default: "UExp"


UExp = Union[UNum, UStr, UBool, UNumArr, UVar, UApp, ULet, UFunction, UMatch]


# ---------------------------------------------------------------- parsing


def _is_number(v: Any) -> bool:
    # bool is a subclass of int in Python; JSON booleans are NOT numbers.
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _parse_label(v: Any) -> ULabel:
    """Label parse with the reference's alternative order:
    Str | StrArr | Num | NumArr | Bool (UntypedExpression.hs:33-38)."""
    if isinstance(v, str):
        return LStr(v)
    if isinstance(v, list) and all(isinstance(x, str) for x in v):
        return LStrArr(tuple(v))
    if _is_number(v):
        return LNum(float(v))
    if isinstance(v, list) and all(_is_number(x) for x in v):
        return LNumArr(tuple(float(x) for x in v))
    if isinstance(v, bool):
        return LBool(v)
    raise ExprParseError(f"Invalid match label: {v!r}")


def parse_expression(v: Any) -> UExp:
    """JSON value (already loaded to Python objects) -> untyped AST."""
    if isinstance(v, str):
        return UStr(v)
    if isinstance(v, bool):
        return UBool(v)
    if _is_number(v):
        return UNum(float(v))
    if v is None:
        raise ExprParseError("Null not supported as expression")
    if isinstance(v, dict):
        prop = v.get("property")
        if prop is not None and not isinstance(prop, str):
            raise ExprParseError(f"Invalid function property: {prop!r}")
        return UFunction(prop)
    if isinstance(v, list):
        # number-array literal takes precedence (incl. the empty array)
        if all(_is_number(x) for x in v):
            return UNumArr(tuple(float(x) for x in v))
        head, *args = v
        if not isinstance(head, str):
            raise ExprParseError(f"Expression head must be a string: {head!r}")
        if head == "let":
            if len(args) != 3 or not isinstance(args[0], str):
                raise ExprParseError("Invalid let expression")
            return ULet(args[0], parse_expression(args[1]), parse_expression(args[2]))
        if head == "var":
            if len(args) != 1 or not isinstance(args[0], str):
                raise ExprParseError("Invalid var expression")
            return UVar(args[0])
        if head == "match":
            if len(args) < 2:
                raise ExprParseError(f"Invalid match arguments: {args!r}")
            inp = parse_expression(args[0])
            rest = args[1:]
            if len(rest) % 2 != 1:
                raise ExprParseError("Wrong number of arguments to match")
            table = tuple(
                (_parse_label(rest[i]), parse_expression(rest[i + 1]))
                for i in range(0, len(rest) - 1, 2)
            )
            return UMatch(inp, table, parse_expression(rest[-1]))
        return UApp(head, tuple(parse_expression(a) for a in args))
    raise ExprParseError(f"Unsupported expression value: {v!r}")
