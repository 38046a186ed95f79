"""Pure-Python row-at-a-time evaluator for typed expressions.

A direct transcription of the reference interpreter's semantics
(/root/reference/src/Mapbox/Interpret.hs:51-157) onto THIS engine's data
model, used as the differential-test oracle for the Column compiler
(never on the Spark hot path).

Data model note (engine decision, documented in SURVEY.md §1.4): feature
properties are stored as canonical strings (``props: map<string,string>``);
the protobuf value tag of the reference (St/Fl/Do/I64/W64/S64/B) is recovered
by CONTENT-BASED tag inference:

- ``"true"`` / ``"false"``            -> bool
- parseable as a double (try_cast)    -> num
- anything else                       -> str

Failure (the reference's ``Maybe`` monad, Interpret.hs:44-48) is modeled as
the ``EvalFailure`` exception; ``run_filter`` maps it to False
(``fromMaybe False``, Interpret.hs:157).
"""

from __future__ import annotations

from typing import Any

from . import typecheck as T


class EvalFailure(Exception):
    pass


AnyVal = tuple  # (tag, value): ('bool', b) | ('num', f) | ('str', s) | ('numarray', tuple)


# Java FloatingPointLiteral grammar (what Spark's try_cast delegates to,
# verified empirically: '5d' -> 5.0, '0x1Ap0' -> 26.0, '1_000' -> None,
# fullwidth digits -> None):
_DEC_NUM_RE = __import__("re").compile(
    r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?[dDfF]?$")
_HEX_NUM_RE = __import__("re").compile(
    r"^[+-]?0[xX]([0-9a-fA-F]+\.?[0-9a-fA-F]*|\.[0-9a-fA-F]+)"
    r"[pP][+-]?\d+[dDfF]?$")


def str_to_num(s: str) -> float | None:
    """Mirror of compile._str_to_num: Spark ``try_cast(s AS double)`` parse
    (the Java parseDouble grammar — decimal/scientific with optional dDfF
    type suffix, hex-floats with a mandatory p-exponent, ASCII only, no
    underscores) MINUS NaN/Infinity spellings, which BOTH paths reject for
    reference parity — Haskell ``readMaybe`` (Interpret.hs:25,107) does not
    accept them, and excluding them keeps Spark's NaN==NaN=TRUE semantics
    unreachable.  Overflow forms like '1e999' still yield Infinity on both
    paths."""
    if not s.isascii():
        return None  # Spark rejects fullwidth/Arabic digits; Python doesn't
    t = s.strip()
    if not t:
        return None
    low = t.lower().lstrip("+-")
    if low in ("infinity", "inf", "nan"):
        return None
    if _DEC_NUM_RE.match(t):
        return float(t.rstrip("dDfF"))
    if _HEX_NUM_RE.match(t):
        return float.fromhex(t.rstrip("dDfF"))
    return None


def infer_tag(v: str) -> AnyVal:
    if v == "true":
        return ("bool", True)
    if v == "false":
        return ("bool", False)
    n = str_to_num(v)
    if n is not None:
        return ("num", n)
    return ("str", v)


def _shortest_digits(a: float) -> tuple[str, int]:
    """(significant digits, decimal exponent) of a > 0 via Python's
    shortest-round-trip repr: value = 0.D1D2... * 10^(dexp+1)."""
    s = repr(a)
    if "e" in s:
        mant, exps = s.split("e")
        exp = int(exps)
    else:
        mant, exp = s, 0
    if "." in mant:
        ip, fp = mant.split(".")
    else:
        ip, fp = mant, ""
    alldig = ip + fp
    stripped = alldig.lstrip("0")
    lead_zeros = len(alldig) - len(stripped)
    digits = stripped.rstrip("0") or "0"
    dexp = len(ip) - lead_zeros + exp - 1
    return digits, dexp


def num_to_string(n: float) -> str:
    """Java ``Double.toString`` replica — what Spark CAST(double AS STRING)
    emits: decimal form for 1e-3 <= |n| < 1e7, else ``d.dddE±x`` scientific
    (verified against Spark: 1e7 -> '1.0E7', 0.00099 -> '9.9E-4').

    Known divergence: deep-subnormal shortest digits can differ between
    Java's legacy FloatingDecimal and Python repr (5e-324: Java '4.9E-324'
    vs here '5.0E-324') — unreachable from realistic property strings and
    excluded from the differential corpus."""
    import math

    if math.isnan(n):
        return "NaN"
    if math.isinf(n):
        return "Infinity" if n > 0 else "-Infinity"
    sign = "-" if math.copysign(1.0, n) < 0 else ""
    a = abs(n)
    if a == 0:
        return sign + "0.0"
    digits, dexp = _shortest_digits(a)
    if -3 <= dexp < 7:
        if dexp >= 0:
            int_part = digits[:dexp + 1].ljust(dexp + 1, "0")
            frac = digits[dexp + 1:] or "0"
            return f"{sign}{int_part}.{frac}"
        return sign + "0." + "0" * (-dexp - 1) + digits
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{dexp}"


def _to_any(typ: str, v: Any) -> AnyVal:
    return (typ, v)


def evaluate(e: T.TExp, feature: dict) -> Any:
    """Evaluate a typed expression against one feature row.

    ``feature`` = {"feature_id": int, "geom_kind": str, "props": {str: str}}.
    Raises EvalFailure on reference 'Nothing'.
    """
    if isinstance(e, T.TNum):
        return e.value
    if isinstance(e, T.TStr):
        return e.value
    if isinstance(e, T.TBool):
        return e.value
    if isinstance(e, T.TNumArr):
        return tuple(e.values)
    if isinstance(e, T.TNegate):
        return not evaluate(e.expr, feature)
    if isinstance(e, T.TGeometryType):
        return feature["geom_kind"]
    if isinstance(e, T.TFeatureId):
        return ("num", float(feature["feature_id"]))
    if isinstance(e, T.TCheckMeta):
        name = evaluate(e.name, feature)
        return name in feature["props"]
    if isinstance(e, T.TReadMeta):
        name = evaluate(e.name, feature)
        props = feature["props"]
        if name not in props or props[name] is None:
            raise EvalFailure(f"missing property {name}")
        return infer_tag(props[name])
    if isinstance(e, T.TToAny):
        return _to_any(e.src_typ, evaluate(e.expr, feature))
    if isinstance(e, T.TBoolFunc):
        vals = [evaluate(a, feature) for a in e.args]  # strict: any failure -> node fails
        return any(vals) if e.op == "any" else all(vals)
    if isinstance(e, T.TCmpOp):
        v1 = evaluate(e.left, feature)
        v2 = evaluate(e.right, feature)
        eq = v1 == v2  # Any values are (tag, val) tuples: cross-tag => unequal
        return eq if e.op == "==" else not eq
    if isinstance(e, T.TOrdOp):
        v1 = evaluate(e.left, feature)
        v2 = evaluate(e.right, feature)
        return {
            "<": v1 < v2,
            "<=": v1 <= v2,
            ">": v1 > v2,
            ">=": v1 >= v2,
        }[e.op]
    if isinstance(e, T.TMatch):
        inp = evaluate(e.input, feature)
        for labels, out in e.pairs:
            if inp in labels:
                return evaluate(out, feature)
        return evaluate(e.default, feature)
    if isinstance(e, T.TConvert):
        return _convert(e, feature)
    raise TypeError(f"Unknown node {e!r}")


def _convert(e: T.TConvert, feature: dict) -> Any:
    if not e.force:
        # assertions: string/number/boolean — runtime failure OR type
        # mismatch falls through to the next arg (Interpret.hs:80-88)
        for arg in e.args:
            try:
                if arg.typ == e.restype:
                    return evaluate(arg, feature)
                if arg.typ == "any":
                    tag, val = evaluate(arg, feature)
                    if tag == e.restype:
                        return val
                    continue  # narrow failed -> next arg
                continue  # static mismatch -> next arg
            except EvalFailure:
                continue
        raise EvalFailure("assertion exhausted")
    # coercions
    if e.restype == "str":
        # first arg only; evaluation failure propagates (Interpret.hs:90-97)
        if not e.args:
            raise EvalFailure("to-string: no args")
        arg = e.args[0]
        av = _as_any(arg, feature)
        tag, val = av
        if tag == "num":
            return num_to_string(val)
        if tag == "bool":
            return "true" if val else "false"
        if tag == "str":
            return val
        return "[" + ",".join(num_to_string(x) for x in val) + "]"
    if e.restype == "num":
        # eval failure fails the NODE; parse failure falls through
        # (Interpret.hs:98-108)
        for arg in e.args:
            tag, val = _as_any(arg, feature)  # EvalFailure propagates
            if tag == "num":
                return val
            if tag == "bool":
                return 1.0 if val else 0.0
            if tag == "str":
                n = str_to_num(val)
                if n is not None:
                    return n
                continue
            continue  # numarray -> conversion failure -> next arg
        raise EvalFailure("to-number exhausted")
    if e.restype == "bool":
        # first arg only (Interpret.hs:109-117)
        if not e.args:
            raise EvalFailure("to-boolean: no args")
        tag, val = _as_any(e.args[0], feature)
        if tag == "str":
            return val != ""
        if tag == "num":
            return val != 0
        if tag == "bool":
            return val
        return True
    raise TypeError(f"bad restype {e.restype}")


def _as_any(arg: T.TExp, feature: dict) -> AnyVal:
    v = evaluate(arg, feature)
    if arg.typ == "any":
        return v
    return (arg.typ, v)


def run_filter(e: T.TExp, feature: dict) -> bool:
    """Top-level predicate: failure -> False (Interpret.hs:154-157)."""
    try:
        return bool(evaluate(e, feature))
    except EvalFailure:
        return False
