"""Additional expression-language edge cases (SURVEY.md §2.1 corners)."""

import pytest

from tests.test_expr_compile import check, run_py
from mapbox_filter_spark.style import parse_expression, type_check_filter
from mapbox_filter_spark.style.typecheck import TypeCheckError


def test_to_string_numarray(spark):
    # Haskell shows the vector; our canonical form is [a,b] with double
    # rendering — engine-defined, pinned here
    check(spark, ["==", ["to-string", [1.0, 2.5]], "[1.0,2.5]"], {}, True)


def test_boolean_assert_multiarg(spark):
    # boolean(): eval-failure falls through to next arg
    check(spark, ["boolean", ["get", "missing"], True], {}, True)
    check(spark, ["boolean", ["get", "a"], False], {"a": "true"}, True)
    # num-tagged value is not bool: falls through
    check(spark, ["boolean", ["get", "a"], True], {"a": "1"}, True)


def test_let_shadowing(spark):
    filt = ["let", "v", "outer",
            ["let", "v", "inner", ["==", ["var", "v"], "inner"]]]
    check(spark, filt, {}, True)


def test_let_body_type_is_binding_type():
    # var returns the bound TYPED expr; using a num binding as bool fails
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["let", "v", 5, ["var", "v"]]))


def test_match_bool_input(spark):
    filt = ["match", ["to-boolean", ["get", "a"]], True, True, False]
    check(spark, filt, {"a": "x"}, True)
    check(spark, filt, {"a": ""}, False)


def test_has_computed_name(spark):
    # typechecker allows any str-typed name expression for has/get
    # (only the SCRAPER requires literals, Style.hs:55)
    filt = ["has", ["to-string", ["get", "keyname"]]]
    check(spark, filt, {"keyname": "target", "target": "1"}, True)
    check(spark, filt, {"keyname": "nope"}, False)
    # name evaluation failure -> node failure -> drop
    check(spark, filt, {}, False)


def test_string_unicode_ordering(spark):
    # binary collation in both engines
    check(spark, ["<", ["string", ["get", "n"]], "é"], {"n": "z"}, True)
    check(spark, [">", ["string", ["get", "n"]], "A"], {"n": "a"}, True)


def test_deep_nesting(spark):
    filt = ["any"] + [
        ["all", ["has", "class"],
         ["match", ["string", ["get", "class"], ""], ["river"],
          ["!", ["==", ["get", "rank"], 99]], False]]
        for _ in range(3)
    ] + [False]
    check(spark, filt, {"class": "river", "rank": "1"}, True)
    check(spark, filt, {"class": "river"}, False)  # inner ! fails -> any fails
    check(spark, filt, {"class": "lake"}, False)


def test_numarray_in_match_num_input(spark):
    # LNumArr label against num input = membership list
    filt = ["match", ["number", ["get", "r"]], [1.0, 2.0, 3.0], True, False]
    check(spark, filt, {"r": "2"}, True)
    check(spark, filt, {"r": "7"}, False)


def test_eq_numarray_any_upcast(spark):
    # numarray literal vs Any (get) -> Any-upcast compare; props never
    # infer numarray tag -> always unequal (but != yields True, not failure)
    check(spark, ["!=", ["get", "a"], [1.0]], {"a": "[1]"}, True)


def test_match_any_output_failed_input_fails_node(spark):
    """Regression: match with Any outputs and FAILED input must fail the
    whole node — an enclosing assertion falls through to its next arg, not
    to a phantom branch value (Interpret.hs:142-145)."""
    filt = ["==",
            ["string",
             ["match", ["get", "m"], "a", ["get", "p"], ["get", "q"]],
             "fallback"],
            "fallback"]
    # m missing -> match fails -> string() falls through -> "fallback"
    check(spark, filt, {"p": "x", "q": "y"}, True)
    # m present, matches "a" -> p's value "x" != "fallback"
    check(spark, filt, {"m": "a", "p": "x", "q": "y"}, False)
    # m present, no match -> default q = "y" != "fallback"
    check(spark, filt, {"m": "zzz", "p": "x", "q": "y"}, False)
    # m present, default branch but q MISSING -> branch fails ->
    # assertion falls through -> "fallback"
    check(spark, filt, {"m": "zzz", "p": "x"}, True)
