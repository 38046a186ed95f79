"""Typed expression AST -> native ``pyspark.sql.Column`` compiler.

This is the engine's core query compiler: every Mapbox GL filter becomes a
single Catalyst expression tree — whole-stage-codegen'd, predicate-pushdown
eligible, ZERO Python on the executor path.

Failure-semantics contract (the load-bearing part — SURVEY.md §2.1 note):
the reference evaluates in a failure monad (``ReaderT FeatureInfo Maybe``,
/root/reference/src/Mapbox/Interpret.hs:44-48), NOT SQL three-valued logic.
We encode failure as SQL NULL and keep the two algebras aligned by
construction:

- NULL (failure) is strict through ``!``, ``==``, ``<``..., ``match`` input —
  plain Column ops already propagate NULL there;
- ``all``/``any`` must be NULL-STRICT (reference: one failing arm fails the
  node, Interpret.hs:119-123) whereas SQL is null-lenient
  (``FALSE AND NULL = FALSE``, ``TRUE OR NULL = TRUE``), so they compile to
  explicit ``when(any_arm_null, NULL).otherwise(and/or)`` wrappers;
- assertion/coercion fall-through *catches* failure (Interpret.hs:80-108) —
  compiled as ``coalesce`` chains / guarded ``when`` ladders;
- the top level maps failure to False: ``coalesce(pred, FALSE)``
  (Interpret.hs:157).

Any (the dynamic union, Expression.hs:52-57) compiles to a 5-slot struct of
columns ``(tag, b, n, s, arr)`` where ``tag IS NULL`` means failure and
cross-tag equality is *unequal* (matching distinct AnyValue constructors).

ANSI note: Spark 4 defaults to ANSI mode, so all fallible casts/lookups use
``try_cast`` / ``try_element_at`` (semantically exactly our failure model).
"""

from __future__ import annotations

import functools
import operator
from dataclasses import dataclass
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import ast as A
from . import typecheck as T
from .legacy import convert_legacy_filter

_SLOT_TYPES = {"bool": "boolean", "num": "double", "str": "string",
               "numarray": "array<double>"}


def _null(typ: str) -> Column:
    return F.lit(None).cast(_SLOT_TYPES[typ])


# Spark's cast accepts NaN/Infinity spellings ('NaN', 'inf', '-Infinity', …)
# but the reference parses strings with Haskell ``readMaybe``
# (Interpret.hs:25,107), which rejects them — and letting NaN into the value
# space would also split the two engines' equality/ordering semantics
# (Spark: NaN==NaN is TRUE and NaN sorts largest; the reference/Python:
# IEEE).  So every string->double parse site rejects these spellings.
# Overflow forms like '1e999' still parse to Infinity on BOTH engines
# (readMaybe does the same), which is safe: +-Inf compare identically.
# \s* (not F.trim) because try_cast itself trims tabs/newlines while trim
# only strips spaces — the rejection must cover exactly what the cast accepts
_NONFINITE_SPELLING = r"^\s*[+-]?(nan|inf|infinity)\s*$"


def _str_to_num(s: Column) -> Column:
    """String -> double with reference parse semantics (see above).

    Perf shape (measured r6): a first-character gate short-circuits both
    the regex and the cast for letter-initial strings.  Everything the
    cast can parse starts with a char <= '9' (sign, dot, digit, or the
    <= 0x20 whitespace try_cast trims; hex floats start with '0'), and
    the nan/inf spellings the regex must reject are letter- or
    sign/space-initial — letter-initial ones are rejected by the gate
    itself (NULL = failure, same verdict), sign/space-initial ones still
    reach the regex.  ``try_cast`` to double is exception-driven on
    non-parsing strings, so skipping it for plain words halved the
    flagship filter's CPU (A/B in OPTIMIZATION_r06.md); a cast-first
    variant measured 2x SLOWER — keep this ordering."""
    return F.when(F.substring(s, 1, 1) > "9", _null("num")).otherwise(
        F.when(F.lower(s).rlike(_NONFINITE_SPELLING), _null("num"))
        .otherwise(s.try_cast("double")))


@dataclass(frozen=True)
class FeatureCols:
    """Column bindings of the feature table the expression reads.

    ``attr_mirrors`` maps literal metadata keys to FLAT string columns that
    mirror ``props[key]`` (non-null exactly when the key is present — the
    engine's substrate convention, sources/features.py flat mirrors).  When
    a ``get``/``has`` names a mirrored key literally, the compiler reads the
    flat column instead of scanning the map: the parquet scan then decodes a
    dictionary-encoded string column rather than the whole map, and each of
    the (unshared) expression references costs a column read instead of a
    key scan.  Semantics are identical BY CONTRACT — the caller asserts the
    mirror faithfulness (tests/test_pipeline_equiv.py pins it for the
    feature substrate); non-literal keys and unmapped keys use the map."""

    props: str = "props"          # map<string,string>
    geom_kind: str = "geom_kind"  # 'Point' | 'LineString' | 'Polygon'
    feature_id: str = "feature_id"
    attr_mirrors: "tuple[tuple[str, str], ...]" = ()

    def mirror_for(self, key: str) -> "str | None":
        for k, col in self.attr_mirrors:
            if k == key:
                return col
        return None

    @property
    def props_col(self) -> Column:
        return F.col(self.props)

    @property
    def geom_col(self) -> Column:
        return F.col(self.geom_kind)

    @property
    def fid_col(self) -> Column:
        return F.col(self.feature_id)


class CTyped:
    """Compiled statically-typed value; ``col IS NULL`` == failure."""

    __slots__ = ("typ", "col")

    def __init__(self, typ: str, col: Column):
        self.typ = typ
        self.col = col


class CAny:
    """Compiled Any value: tag in ('bool','num','str','numarray') or NULL
    (failure); exactly one slot is non-NULL when tag is set.

    ``src`` (r6): when the Any was inferred from a plain string source
    (map property / mirror column), the raw string column — consumers use
    it for fused fast paths (failure test = src IS NULL; to-number without
    re-deriving the whole tag chain).  Catalyst has no expression sharing,
    so every avoided re-reference of the inferred tag is per-row work."""

    __slots__ = ("tag", "b", "n", "s", "arr", "src")

    def __init__(self, tag: Column, b: Column | None = None,
                 n: Column | None = None, s: Column | None = None,
                 arr: Column | None = None, src: Column | None = None):
        self.tag = tag
        self.b = b if b is not None else _null("bool")
        self.n = n if n is not None else _null("num")
        self.s = s if s is not None else _null("str")
        self.arr = arr if arr is not None else _null("numarray")
        self.src = src

    def slot(self, typ: str) -> Column:
        return {"bool": self.b, "num": self.n, "str": self.s,
                "numarray": self.arr}[typ]

    def fail(self) -> Column:
        """Failure test — equivalent to ``tag IS NULL`` but cheap for
        string-sourced Anys (the tag is NULL exactly when the source is)."""
        return self.src.isNull() if self.src is not None else self.tag.isNull()


CVal = Union[CTyped, CAny]


def _strict_bool(op: str, cols: list[Column]) -> Column:
    """Null-strict conjunction/disjunction (see module docstring).

    Arithmetic form (r6): each arm is referenced exactly ONCE.  The previous
    ``when(isnull(a)|isnull(b), NULL).otherwise(a & b)`` spelling embedded
    every arm twice, and Catalyst has no expression sharing — for nested
    all/any the compiled tree (and per-row work in FilterExec, which does no
    subexpression elimination) doubled per level.  true→1 / false→0 / NULL→
    NULL casts make integer addition exactly null-strict: the sum is NULL
    iff any arm failed, and ``all = (sum == n)``, ``any = (sum >= 1)``."""
    if not cols:
        return F.lit(op == "all")  # and [] = True; or [] = False
    total = functools.reduce(operator.add, (c.cast("int") for c in cols))
    if op == "all":
        return total == F.lit(len(cols))
    return total >= F.lit(1)


def _infer_any_from_string(v: Column) -> CAny:
    """Content-based tag inference for map-sourced property values
    (engine data model — see pyinterp module docstring).

    Slots are derived straight from the source string rather than from the
    tag column (r6): ``when(tag == 'str', v)`` re-embedded the whole tag
    chain per slot reference, and Catalyst never shares subtrees.  The
    direct forms are value-identical: a NULL source nulls every condition,
    and the bool/num/str cases are mutually exclusive by construction."""
    is_bool = v.isin("true", "false")
    as_num = _str_to_num(v)
    tag = (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(is_bool, F.lit("bool"))
        .when(as_num.isNotNull(), F.lit("num"))
        .otherwise(F.lit("str"))
    )
    return CAny(
        tag,
        b=F.when(is_bool, v == "true"),
        n=F.when(~is_bool, as_num),
        s=F.when(~is_bool & as_num.isNull(), v),
        src=v,
    )


def _to_any(cv: CVal) -> CAny:
    if isinstance(cv, CAny):
        return cv
    tag = F.when(cv.col.isNull(), F.lit(None).cast("string")).otherwise(
        F.lit(cv.typ))
    kwargs = {{"bool": "b", "num": "n", "str": "s", "numarray": "arr"}[cv.typ]: cv.col}
    return CAny(tag, **kwargs)


def _any_eq(a: CAny, b: CAny) -> Column:
    """Any == Any: cross-tag => unequal; same tag => slot equality.
    NULL tag (failure) on either side => NULL (failure)."""
    fail = a.tag.isNull() | b.tag.isNull()
    slot_eq = (
        F.when(a.tag == "bool", a.b == b.b)
        .when(a.tag == "num", a.n == b.n)
        .when(a.tag == "str", a.s == b.s)
        .otherwise(a.arr == b.arr)
    )
    # tags differ -> (a.tag==b.tag)=False, slot_eq may be NULL; FALSE AND NULL
    # = FALSE in SQL, which is exactly "distinct constructors are unequal".
    return F.when(fail, _null("bool")).otherwise((a.tag == b.tag) & slot_eq)


def _any_to_num(a: CAny) -> Column:
    """to-number conversion of an Any value; NULL = conversion failure
    (NOT evaluation failure — caller guards on ``a.fail()``).

    String-sourced fast path (r6): bool spellings map to 1/0, everything
    else is the shared string parse — a str-tagged value is by definition
    non-numeric, so its parse yields NULL (= conversion failure), exactly
    the generic chain's verdict, with one reference to the source."""
    if a.src is not None:
        v = a.src
        return (
            F.when(v == "true", F.lit(1.0))
            .when(v == "false", F.lit(0.0))
            .otherwise(_str_to_num(v))
        )
    return (
        F.when(a.tag == "num", a.n)
        .when(a.tag == "bool", F.when(a.b, F.lit(1.0)).otherwise(F.lit(0.0)))
        .when(a.tag == "str", _str_to_num(a.s))
        .otherwise(_null("num"))
    )


def _any_to_str(a: CAny) -> Column:
    arr_str = F.concat(
        F.lit("["),
        F.array_join(F.transform(a.arr, lambda x: x.cast("string")), ","),
        F.lit("]"),
    )
    return (
        F.when(a.tag == "num", a.n.cast("string"))
        .when(a.tag == "bool", a.b.cast("string"))
        .when(a.tag == "str", a.s)
        .when(a.tag == "numarray", arr_str)
    )  # NULL tag -> NULL (failure propagates)


def _any_truthy(a: CAny) -> Column:
    """to-boolean: "" -> false, 0 -> false, bool -> itself, else true
    (Interpret.hs:109-117)."""
    return (
        F.when(a.tag.isNull(), _null("bool"))
        .when(a.tag == "str", a.s != "")
        .when(a.tag == "num", a.n != 0.0)
        .when(a.tag == "bool", a.b)
        .otherwise(F.lit(True))
    )


def compile_typed(e: T.TExp, cols: FeatureCols) -> CVal:
    """Typed AST node -> compiled Column(s)."""
    c = lambda x: compile_typed(x, cols)  # noqa: E731

    if isinstance(e, T.TNum):
        return CTyped("num", F.lit(float(e.value)))
    if isinstance(e, T.TStr):
        return CTyped("str", F.lit(e.value))
    if isinstance(e, T.TBool):
        return CTyped("bool", F.lit(bool(e.value)))
    if isinstance(e, T.TNumArr):
        if not e.values:
            return CTyped("numarray", F.array().cast("array<double>"))
        return CTyped(
            "numarray", F.array(*[F.lit(float(v)) for v in e.values]))
    if isinstance(e, T.TNegate):
        return CTyped("bool", ~c(e.expr).col)  # NULL propagates (strict)
    if isinstance(e, T.TGeometryType):
        return CTyped("str", cols.geom_col)
    if isinstance(e, T.TFeatureId):
        fid = cols.fid_col.cast("double")
        return CAny(F.when(fid.isNull(), F.lit(None).cast("string"))
                    .otherwise(F.lit("num")), n=fid)
    if isinstance(e, T.TCheckMeta):
        if isinstance(e.name, T.TStr):
            m = cols.mirror_for(e.name.value)
            if m is not None:  # mirror contract: non-null <=> key present
                return CTyped("bool", F.col(m).isNotNull())
        name = c(e.name).col
        # map_contains_key(_, NULL) -> NULL: name failure propagates
        return CTyped("bool", F.map_contains_key(cols.props_col, name))
    if isinstance(e, T.TReadMeta):
        if isinstance(e.name, T.TStr):
            m = cols.mirror_for(e.name.value)
            if m is not None:
                return _infer_any_from_string(F.col(m))
        name = c(e.name).col
        return _infer_any_from_string(F.try_element_at(cols.props_col, name))
    if isinstance(e, T.TToAny):
        return _to_any(c(e.expr))
    if isinstance(e, T.TBoolFunc):
        return CTyped("bool", _strict_bool(e.op, [c(a).col for a in e.args]))
    if isinstance(e, T.TCmpOp):
        if e.arg_typ == "any":
            eq = _any_eq(_to_any(c(e.left)), _to_any(c(e.right)))
        else:
            l, r = c(e.left).col, c(e.right).col
            eq = l == r  # NULL propagates on either side
        return CTyped("bool", eq if e.op == "==" else ~eq)
    if isinstance(e, T.TOrdOp):
        l, r = c(e.left).col, c(e.right).col
        col = {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[e.op]
        return CTyped("bool", col)
    if isinstance(e, T.TMatch):
        return _compile_match(e, cols)
    if isinstance(e, T.TConvert):
        return _compile_convert(e, cols)
    raise TypeError(f"Unknown typed node: {e!r}")


def _label_cond(inp: CVal, labels: tuple) -> Column:
    """Branch condition: input ∈ labels (input known non-failed by guard)."""
    if isinstance(inp, CAny):
        conds = []
        for tag, val in labels:
            slot = inp.slot(tag)
            conds.append((inp.tag == tag) & (slot == F.lit(val)))
        if not conds:
            return F.lit(False)
        return functools.reduce(operator.or_, conds)
    if not labels:
        return F.lit(False)
    return inp.col.isin(*labels)


def _compile_match(e: T.TMatch, cols: FeatureCols) -> CVal:
    inp = compile_typed(e.input, cols)
    default = compile_typed(e.default, cols)
    outs = [(labels, compile_typed(o, cols)) for labels, o in e.pairs]
    inp_fail = inp.fail() if isinstance(inp, CAny) else inp.col.isNull()

    if e.typ != "any":
        chain = None
        for labels, out in outs:
            cond = _label_cond(inp, labels)
            chain = (chain.when(cond, out.col) if chain is not None
                     else F.when(cond, out.col))
        body = chain.otherwise(default.col) if chain is not None else default.col
        return CTyped(e.typ, F.when(inp_fail, _null(e.typ)).otherwise(body))

    # Any output: compose slot-wise
    outs_any = [(labels, _to_any(o)) for labels, o in outs]
    dflt = _to_any(default)

    def pick(get):
        chain = None
        for labels, out in outs_any:
            cond = _label_cond(inp, labels)
            chain = (chain.when(cond, get(out)) if chain is not None
                     else F.when(cond, get(out)))
        return chain.otherwise(get(dflt)) if chain is not None else get(dflt)

    # CAny invariant: when the node FAILS every slot must be NULL too —
    # assertions read slots directly, so an unguarded slot would leak a
    # branch value out of a failed match (reference: input failure fails
    # the whole node, Interpret.hs:142-145)
    tag = F.when(inp_fail, F.lit(None).cast("string")).otherwise(
        pick(lambda o: o.tag))

    def guarded(get, typ):
        return F.when(inp_fail, _null(typ)).otherwise(pick(get))

    return CAny(tag,
                b=guarded(lambda o: o.b, "bool"),
                n=guarded(lambda o: o.n, "num"),
                s=guarded(lambda o: o.s, "str"),
                arr=guarded(lambda o: o.arr, "numarray"))


def _compile_convert(e: T.TConvert, cols: FeatureCols) -> CVal:
    compiled = [compile_typed(a, cols) for a in e.args]

    if not e.force:
        # assertions: failure OR type mismatch falls through (coalesce chain)
        candidates: list[Column] = []
        for a in compiled:
            if isinstance(a, CAny):
                candidates.append(a.slot(e.restype))
            elif a.typ == e.restype:
                candidates.append(a.col)
            # static mismatch: contributes nothing (always falls through)
        if not candidates:
            return CTyped(e.restype, _null(e.restype))
        return CTyped(e.restype, F.coalesce(*candidates))

    if e.restype == "num":
        # right-fold: eval-failure of the scanned arg fails the NODE;
        # conversion failure falls to the next arg (Interpret.hs:98-108)
        acc = _null("num")
        for a in reversed(compiled):
            if isinstance(a, CAny):
                raw_null, conv = a.fail(), _any_to_num(a)
            elif a.typ == "num":
                raw_null, conv = a.col.isNull(), a.col
            elif a.typ == "bool":
                raw_null = a.col.isNull()
                conv = F.when(a.col, F.lit(1.0)).otherwise(F.lit(0.0))
            elif a.typ == "str":
                raw_null, conv = a.col.isNull(), _str_to_num(a.col)
            else:  # numarray never converts
                raw_null, conv = a.col.isNull(), _null("num")
            acc = (F.when(raw_null, _null("num"))
                   .when(conv.isNotNull(), conv)
                   .otherwise(acc))
        return CTyped("num", acc)

    if not compiled:
        return CTyped(e.restype, _null(e.restype))
    first = compiled[0]
    a = first if isinstance(first, CAny) else _to_any(first)
    if e.restype == "str":
        return CTyped("str", _any_to_str(a))
    if e.restype == "bool":
        return CTyped("bool", _any_truthy(a))
    raise TypeError(f"bad restype {e.restype}")


# ------------------------------------------------------------ entry points


def compile_filter(
    filter_json: Any,
    cols: FeatureCols | None = None,
    *,
    legacy: bool = False,
    allow_id_extension: bool = False,
) -> Column:
    """Filter JSON -> nullable boolean Column (NULL == reference failure).

    Wrap with :func:`finalize_predicate` before use in ``df.filter``.
    """
    cols = cols or FeatureCols()
    if legacy:
        filter_json = convert_legacy_filter(filter_json)
    uexp = A.parse_expression(filter_json)
    texp = T.type_check_filter(uexp, allow_id_extension=allow_id_extension)
    out = compile_typed(texp, cols)
    assert isinstance(out, CTyped) and out.typ == "bool"
    return out.col


def finalize_predicate(pred: Column) -> Column:
    """Top-level failure -> False (Interpret.hs:157 ``fromMaybe False``)."""
    return F.coalesce(pred, F.lit(False))
