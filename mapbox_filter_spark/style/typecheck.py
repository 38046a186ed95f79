"""Static type check: untyped AST -> typed AST.

Parity target: /root/reference/src/Mapbox/Expression.hs:196-278.

The reference type-checks filters into a GADT at style-parse time and REJECTS
ill-typed programs rather than coercing (Catalyst's analyzer would silently
coerce, so this pass runs driver-side before any Column is built).  Replicated
rejection rules:

- "stops" function objects: "Functions (stops) are not implemented."
- unknown ops / wrong arity.
- ``==``/``!=`` on differently-typed args unless one side is Any (then both
  upcast to Any; cross-constructor Any comparison is *unequal*, not an error).
- ``<``/``<=``/``>``/``>=``: both args must be the SAME type and that type must
  be num or str ("Cannot compare other than str/num") — notably ``Any`` is
  rejected, which is why the legacy converter wraps gets in string()/number().
- ``match`` labels must coerce to the input type; all outputs + default must
  share one type.
- ``["id"]`` is declared in the reference but unreachable from its type
  checker (Expression.hs:46-47 vs 216-274) — rejected here too unless
  ``allow_id_extension=True`` (documented extension: yields Any(num)).

Type names: 'bool' | 'num' | 'str' | 'numarray' | 'any'.

``match`` pair order: the reference's parser builds the table reversed
(UntypedExpression.hs:113-116) and the interpreter scans it in that order, so
the LAST duplicate label wins; we reverse here to match.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from . import ast as U


class TypeCheckError(ValueError):
    pass


# ---------------------------------------------------------------- typed AST


@dataclass(frozen=True)
class TNum:
    value: float
    typ: str = "num"


@dataclass(frozen=True)
class TStr:
    value: str
    typ: str = "str"


@dataclass(frozen=True)
class TBool:
    value: bool
    typ: str = "bool"


@dataclass(frozen=True)
class TNumArr:
    values: tuple[float, ...]
    typ: str = "numarray"


@dataclass(frozen=True)
class TToAny:
    """Upcast of a statically-typed expression into the Any union."""

    expr: "TExp"
    src_typ: str
    typ: str = "any"


@dataclass(frozen=True)
class TCmpOp:
    op: str  # '==' | '!='
    left: "TExp"
    right: "TExp"
    arg_typ: str  # common type of both sides ('any' => tagged compare)
    typ: str = "bool"


@dataclass(frozen=True)
class TOrdOp:
    op: str  # '<' | '<=' | '>' | '>='
    left: "TExp"
    right: "TExp"
    arg_typ: str  # 'num' | 'str'
    typ: str = "bool"


@dataclass(frozen=True)
class TBoolFunc:
    op: str  # 'all' | 'any'
    args: tuple["TExp", ...]
    typ: str = "bool"


@dataclass(frozen=True)
class TReadMeta:
    name: "TExp"  # :: str
    typ: str = "any"


@dataclass(frozen=True)
class TCheckMeta:
    name: "TExp"  # :: str
    typ: str = "bool"


@dataclass(frozen=True)
class TNegate:
    expr: "TExp"
    typ: str = "bool"


@dataclass(frozen=True)
class TConvert:
    """string/number/boolean assertions (force=False) and
    to-string/to-number/to-boolean coercions (force=True).

    Runtime semantics (Interpret.hs:80-118):
    - force=False: each arg tried in order; BOTH a static type mismatch and a
      runtime evaluation failure fall through to the next arg; no args left =>
      failure.
    - force=True num: evaluation failure of the current arg fails the NODE;
      only a *conversion* (parse) failure falls through.
    - force=True str/bool: first arg only; rest ignored.
    """

    force: bool
    restype: str  # 'str' | 'num' | 'bool'
    args: tuple["TExp", ...]
    typ: str = ""

    def __post_init__(self):
        object.__setattr__(self, "typ", self.restype)


@dataclass(frozen=True)
class TGeometryType:
    typ: str = "str"


@dataclass(frozen=True)
class TFeatureId:
    """Extension (see module docstring): numeric feature id as Any."""

    typ: str = "any"


@dataclass(frozen=True)
class TMatch:
    input: "TExp"
    pairs: tuple[tuple[tuple, "TExp"], ...]  # (labels_tuple, out); REVERSED source order
    default: "TExp"
    in_typ: str
    typ: str = ""  # output type

    def __post_init__(self):
        pass


TExp = Union[
    TNum, TStr, TBool, TNumArr, TToAny, TCmpOp, TOrdOp, TBoolFunc,
    TReadMeta, TCheckMeta, TNegate, TConvert, TGeometryType, TFeatureId, TMatch,
]

_ORD_OPS = {"<", "<=", ">", ">="}
_CMP_OPS = {"==", "!="}
_ASSERTS = {"string": "str", "number": "num", "boolean": "bool"}
_COERCE = {"to-string": "str", "to-number": "num", "to-boolean": "bool"}


def _convert_match_label(in_typ: str, lbl: U.ULabel) -> tuple:
    """Label list coerced to the match input type (Expression.hs:174-185).

    For Any input, labels become (tag, value) pairs mirroring the ANum/AStr/
    ABool constructors.
    """
    if in_typ == "num":
        if isinstance(lbl, U.LNum):
            return (lbl.value,)
        if isinstance(lbl, U.LNumArr):
            return tuple(lbl.values)
    elif in_typ == "str":
        if isinstance(lbl, U.LStr):
            return (lbl.value,)
        if isinstance(lbl, U.LStrArr):
            return tuple(lbl.values)
    elif in_typ == "bool":
        if isinstance(lbl, U.LBool):
            return (lbl.value,)
    elif in_typ == "any":
        if isinstance(lbl, U.LNum):
            return (("num", lbl.value),)
        if isinstance(lbl, U.LNumArr):
            return tuple(("num", v) for v in lbl.values)
        if isinstance(lbl, U.LStr):
            return (("str", lbl.value),)
        if isinstance(lbl, U.LStrArr):
            return tuple(("str", v) for v in lbl.values)
        if isinstance(lbl, U.LBool):
            return (("bool", lbl.value),)
    raise TypeCheckError(f"Impossible match label: {lbl!r} for input type {in_typ}")


def type_check(
    expr: U.UExp,
    env: dict[str, TExp] | None = None,
    *,
    allow_id_extension: bool = False,
) -> TExp:
    env = env or {}

    def go(e: U.UExp, env: dict[str, TExp]) -> TExp:
        if isinstance(e, U.UNum):
            return TNum(e.value)
        if isinstance(e, U.UStr):
            return TStr(e.value)
        if isinstance(e, U.UBool):
            return TBool(e.value)
        if isinstance(e, U.UNumArr):
            return TNumArr(e.values)
        if isinstance(e, U.UFunction):
            raise TypeCheckError("Functions (stops) are not implemented.")
        if isinstance(e, U.UVar):
            if e.name not in env:
                raise TypeCheckError(f"Variable {e.name} not found.")
            return env[e.name]
        if isinstance(e, U.ULet):
            bound = go(e.value, env)
            return go(e.body, {**env, e.name: bound})
        if isinstance(e, U.UMatch):
            inp = go(e.input, env)
            default = go(e.default, env)
            out_typ = default.typ
            pairs = []
            for lbl, out_expr in e.table:
                labels = _convert_match_label(inp.typ, lbl)
                out = go(out_expr, env)
                if out.typ != out_typ:
                    raise TypeCheckError(
                        f"Expression {out!r} has type {out.typ}, expected {out_typ}"
                    )
                pairs.append((labels, out))
            # reversed: reference parser prepends pairs (see module docstring)
            node = TMatch(inp, tuple(reversed(pairs)), default, inp.typ)
            object.__setattr__(node, "typ", out_typ)
            return node
        assert isinstance(e, U.UApp)
        name, args = e.name, e.args
        if name in _ASSERTS:
            targs = tuple(go(a, env) for a in args)
            return TConvert(False, _ASSERTS[name], targs)
        if name in _COERCE:
            targs = tuple(go(a, env) for a in args)
            return TConvert(True, _COERCE[name], targs)
        if name == "get" and len(args) == 1:
            nm = go(args[0], env)
            if nm.typ != "str":
                raise TypeCheckError(f"get: name must be str, got {nm.typ}")
            return TReadMeta(nm)
        if name == "has" and len(args) == 1:
            nm = go(args[0], env)
            if nm.typ != "str":
                raise TypeCheckError(f"has: name must be str, got {nm.typ}")
            return TCheckMeta(nm)
        if name == "!" and len(args) == 1:
            b = go(args[0], env)
            if b.typ != "bool":
                raise TypeCheckError(
                    f"Expression {b!r} has type {b.typ}, expected bool"
                )
            return TNegate(b)
        if name in _CMP_OPS and len(args) == 2:
            a1, a2 = go(args[0], env), go(args[1], env)
            if a1.typ == a2.typ:
                return TCmpOp(name, a1, a2, a1.typ)
            if a1.typ == "any" or a2.typ == "any":
                return TCmpOp(
                    name,
                    TToAny(a1, a1.typ) if a1.typ != "any" else a1,
                    TToAny(a2, a2.typ) if a2.typ != "any" else a2,
                    "any",
                )
            raise TypeCheckError(
                f"Comparing unequal things: {args[0]!r}, {args[1]!r}: "
                f"{a1.typ} vs. {a2.typ}"
            )
        if name in _ORD_OPS and len(args) == 2:
            a1, a2 = go(args[0], env), go(args[1], env)
            if a1.typ != a2.typ:
                raise TypeCheckError(
                    f"Comparing unequal things: {args[0]!r}, {args[1]!r}: "
                    f"{a1.typ} vs. {a2.typ}"
                )
            if a1.typ not in ("num", "str"):
                raise TypeCheckError("Cannot compare other than str/num")
            return TOrdOp(name, a1, a2, a1.typ)
        if name in ("all", "any"):
            targs = []
            for a in args:
                t = go(a, env)
                if t.typ != "bool":
                    raise TypeCheckError(
                        f"Expression {t!r} has type {t.typ}, expected bool"
                    )
                targs.append(t)
            return TBoolFunc(name, tuple(targs))
        if name == "geometry-type" and len(args) == 0:
            return TGeometryType()
        if name == "id" and len(args) == 0:
            if allow_id_extension:
                return TFeatureId()
            raise TypeCheckError(
                "Unknown function name / wrong param count: id "
                "(reference parity: ['id'] is unreachable; "
                "pass allow_id_extension=True to enable)"
            )
        raise TypeCheckError(f"Unknown function name / wrong param count: {name}")

    return go(expr, env)


def type_check_filter(expr: U.UExp, *, allow_id_extension: bool = False) -> TExp:
    """Top-level filter must be boolean (Expression.hs:277-278)."""
    t = type_check(expr, allow_id_extension=allow_id_extension)
    if t.typ != "bool":
        raise TypeCheckError(
            f"Expression {t!r} has type {t.typ}, expected bool"
        )
    return t
