"""Property-based totality tests of the expression front end (no Spark).

For ANY JSON-shaped value: parse_expression either raises ExprParseError or
returns an AST; type_check either raises TypeCheckError or returns a typed
AST; a well-typed boolean AST evaluates under pyinterp to a bool or a clean
EvalFailure on ANY feature.  (The Spark-vs-pyinterp value agreement is
covered by tests/test_expr_differential.py.)
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from mapbox_filter_spark.style.ast import ExprParseError, parse_expression  # noqa: E402
from mapbox_filter_spark.style.pyinterp import EvalFailure, run_filter  # noqa: E402
from mapbox_filter_spark.style.typecheck import TypeCheckError, type_check_filter  # noqa: E402

json_scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-1000, max_value=1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
    st.none(),
)

json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=5), children, max_size=3),
    ),
    max_leaves=12,
)

op_names = st.sampled_from(
    ["get", "has", "!", "==", "!=", "<", "<=", ">", ">=", "all", "any",
     "match", "string", "number", "boolean", "to-number", "to-string",
     "to-boolean", "geometry-type", "let", "var", "id", "bogus"])

exprish = st.recursive(
    json_scalars,
    lambda children: st.builds(
        lambda op, args: [op] + args, op_names, st.lists(children, max_size=3)),
    max_leaves=16,
)

features = st.fixed_dictionaries({
    "feature_id": st.integers(min_value=0, max_value=10**6),
    "geom_kind": st.sampled_from(["Point", "LineString", "Polygon"]),
    "props": st.dictionaries(
        st.sampled_from(["a", "b", "class", "rank"]),
        st.sampled_from(["", "0", "1", "true", "false", "x", "5.5", "river"]),
        max_size=4),
})


@settings(max_examples=300, deadline=None)
@given(json_values)
def test_parse_total(v):
    try:
        parse_expression(v)
    except ExprParseError:
        pass  # clean rejection is fine; anything else would fail the test


@settings(max_examples=500, deadline=None)
@given(exprish, features)
def test_frontend_total(v, feature):
    try:
        texp = type_check_filter(parse_expression(v))
    except (ExprParseError, TypeCheckError):
        return
    result = run_filter(texp, feature)  # must not raise anything but clean
    assert isinstance(result, bool)
