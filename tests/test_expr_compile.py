"""Expression-operator unit tests: one block per SURVEY.md §2.1 row, plus the
failure-semantics micro-corpus (FIXTURES.md §C).

Every case is evaluated BOTH through the compiled Column (on a tiny DataFrame)
and through the pure-Python reference interpreter — they must agree."""

import pytest
from pyspark.sql import Row, functions as F, types as SqlT

from mapbox_filter_spark.style import (
    compile_filter,
    finalize_predicate,
    parse_expression,
    type_check_filter,
    TypeCheckError,
)
from mapbox_filter_spark.style import typecheck as TC
from mapbox_filter_spark.style import pyinterp
from mapbox_filter_spark.style.ast import ExprParseError

FEATURE_SCHEMA = SqlT.StructType([
    SqlT.StructField("feature_id", SqlT.LongType()),
    SqlT.StructField("geom_kind", SqlT.StringType()),
    SqlT.StructField("props", SqlT.MapType(SqlT.StringType(), SqlT.StringType())),
])


def run_spark(spark, filt, feature):
    df = spark.createDataFrame([Row(**feature)], schema=FEATURE_SCHEMA)
    pred = finalize_predicate(compile_filter(filt))
    return df.select(pred.alias("keep")).collect()[0]["keep"]


def run_py(filt, feature):
    texp = type_check_filter(parse_expression(filt))
    return pyinterp.run_filter(texp, feature)


def check(spark, filt, props, expect, geom="Point", fid=1):
    feature = {"feature_id": fid, "geom_kind": geom, "props": props}
    got_spark = run_spark(spark, filt, feature)
    got_py = run_py(filt, feature)
    assert got_py == expect, f"pyinterp: {filt} on {props}: {got_py} != {expect}"
    assert got_spark == expect, f"spark: {filt} on {props}: {got_spark} != {expect}"


# ------------------------------------------------------- literals & basics

def test_literal_bool(spark):
    check(spark, True, {}, True)
    check(spark, False, {}, False)


def test_has(spark):
    check(spark, ["has", "a"], {}, False)
    check(spark, ["has", "a"], {"a": ""}, True)


def test_not(spark):
    check(spark, ["!", ["has", "a"]], {}, True)
    # strict: failure propagates through ! (Interpret.hs:56)
    check(spark, ["!", ["==", ["get", "missing"], 1]], {}, False)


def test_get_eq_num(spark):
    check(spark, ["==", ["get", "rank"], 5], {"rank": "5"}, True)
    check(spark, ["==", ["get", "rank"], 5], {"rank": "6"}, False)
    # missing key = failure = drop
    check(spark, ["==", ["get", "rank"], 5], {}, False)
    # cross-type Any comparison: unequal, not failure
    check(spark, ["==", ["get", "rank"], 5], {"rank": "abc"}, False)
    check(spark, ["!=", ["get", "rank"], 5], {"rank": "abc"}, True)


def test_eq_str(spark):
    check(spark, ["==", ["get", "cls"], "river"], {"cls": "river"}, True)
    check(spark, ["==", ["get", "cls"], "river"], {"cls": "stream"}, False)
    check(spark, ["!=", ["get", "cls"], "river"], {"cls": "stream"}, True)
    # != with missing key is also failure -> drop
    check(spark, ["!=", ["get", "cls"], "river"], {}, False)


def test_eq_bool_inference(spark):
    check(spark, ["==", ["get", "intermittent"], True], {"intermittent": "true"}, True)
    check(spark, ["==", ["get", "intermittent"], True], {"intermittent": "false"}, False)
    # numeric 1 is not bool true (distinct constructors)
    check(spark, ["==", ["get", "intermittent"], True], {"intermittent": "1"}, False)


def test_ordered(spark):
    check(spark, ["<", ["number", ["get", "rank"]], 5], {"rank": "3"}, True)
    check(spark, ["<", ["number", ["get", "rank"]], 5], {"rank": "7"}, False)
    check(spark, [">=", ["number", ["get", "rank"]], 5], {"rank": "5"}, True)
    # string ordering (binary collation)
    check(spark, ["<", ["string", ["get", "name"]], "m"], {"name": "abc"}, True)
    check(spark, [">", ["string", ["get", "name"]], "m"], {"name": "zzz"}, True)
    # failure: missing key
    check(spark, ["<", ["number", ["get", "rank"]], 5], {}, False)


def test_ordered_rejects_any_and_bool():
    # reference: "Cannot compare other than str/num" (Expression.hs:267)
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["<", ["get", "rank"], 5]))
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["<", True, False]))


def test_eq_type_mismatch_rejected():
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["==", "x", 5]))


# ---------------------------------------------------- all / any null-strict

def test_any_failure_strict(spark):
    # THE load-bearing corner: any(fail, true) = failure = drop
    # (SQL would give NULL OR TRUE = TRUE and wrongly keep)
    check(spark, ["any", ["==", ["get", "missing"], 1], True], {}, False)
    check(spark, ["all", ["==", ["get", "missing"], 1], True], {}, False)
    check(spark, ["any", ["==", ["get", "a"], 1], True], {"a": "2"}, True)
    check(spark, ["all", ["==", ["get", "a"], 1], True], {"a": "1"}, True)
    check(spark, ["all", ["==", ["get", "a"], 1], False], {"a": "1"}, False)


def test_nested_strictness(spark):
    # !(all(fail)) is failure, not True
    check(spark, ["!", ["all", ["==", ["get", "m"], 1], True]], {}, False)
    check(spark, ["!", ["any", ["==", ["get", "m"], 1], False]], {}, False)


def test_empty_all_any(spark):
    check(spark, ["all"], {}, True)   # and [] = True
    check(spark, ["any"], {}, False)  # or [] = False


# ------------------------------------------------------------- assertions

def test_assertion_fallthrough(spark):
    # assertion catches arg-eval failure (Interpret.hs:80-88)
    check(spark, ["==", ["string", ["get", "a"], ["get", "b"]], "x"], {"b": "x"}, True)
    # type-mismatch fall-through: a is num-tagged, b is str
    check(spark, ["==", ["string", ["get", "a"], ["get", "b"]], "x"],
          {"a": "5", "b": "x"}, True)
    # assertion exhausted = failure
    check(spark, ["==", ["string", ["get", "a"]], "x"], {}, False)
    check(spark, ["==", ["number", ["get", "a"]], 5], {"a": "xyz"}, False)


def test_assertion_static_mismatch(spark):
    # statically-typed non-matching arg falls through
    check(spark, ["==", ["string", 5, "fallback"], "fallback"], {}, True)


# -------------------------------------------------------------- coercions

def test_to_number(spark):
    check(spark, ["==", ["to-number", ["get", "a"]], 2], {"a": "2"}, True)
    check(spark, ["==", ["to-number", ["get", "a"], ["get", "b"]], 2],
          {"a": "zz", "b": "2"}, True)  # parse-fail falls through
    check(spark, ["==", ["to-number", True], 1], {}, True)
    check(spark, ["==", ["to-number", False], 0], {}, True)
    # eval failure of scanned arg fails the NODE (no fall-through!)
    check(spark, ["==", ["to-number", ["get", "missing"], ["get", "b"]], 2],
          {"b": "2"}, False)


def test_to_string(spark):
    check(spark, ["==", ["to-string", True], "true"], {}, True)
    check(spark, ["==", ["to-string", ["get", "a"]], "x"], {"a": "x"}, True)
    check(spark, ["==", ["to-string", 5], "5.0"], {}, True)


def test_to_boolean(spark):
    # "" -> false, numeric 0 -> false, other strings -> true
    check(spark, ["to-boolean", ["get", "a"]], {"a": ""}, False)
    check(spark, ["to-boolean", ["get", "a"]], {"a": "0"}, False)
    check(spark, ["to-boolean", ["get", "a"]], {"a": "x"}, True)
    check(spark, ["to-boolean", ["get", "a"]], {"a": "false"}, False)
    check(spark, ["to-boolean", ["get", "a"]], {"a": "true"}, True)
    check(spark, ["to-boolean", ["get", "a"]], {}, False)  # failure


# ------------------------------------------------------------------ match

def test_match_str(spark):
    filt = ["match", ["string", ["get", "brunnel"], ""],
            ["tunnel", "bridge"], False, True]
    check(spark, filt, {"brunnel": "tunnel"}, False)
    check(spark, filt, {"brunnel": "bridge"}, False)
    check(spark, filt, {"brunnel": "ford"}, True)
    check(spark, filt, {}, True)  # assertion default "" -> else branch


def test_match_num_array_labels(spark):
    filt = ["match", ["number", ["get", "rank"]], [1, 2, 3], True, False]
    check(spark, filt, {"rank": "2"}, True)
    check(spark, filt, {"rank": "9"}, False)
    check(spark, filt, {}, False)  # input failure fails node


def test_match_any_input(spark):
    filt = ["match", ["get", "cls"], ["a", "b"], True, False]
    check(spark, filt, {"cls": "b"}, True)
    check(spark, filt, {"cls": "c"}, False)
    # num-tagged input vs str labels: no match (distinct constructors)
    check(spark, filt, {"cls": "5"}, False)
    check(spark, filt, {}, False)


def test_match_duplicate_label_last_wins(spark):
    # reference parser builds the table reversed => LAST duplicate wins
    filt = ["match", ["string", ["get", "x"]], "a", False, "a", True, False]
    check(spark, filt, {"x": "a"}, True)


# ------------------------------------------------------------ geometry/id

def test_geometry_type(spark):
    filt = ["==", ["geometry-type"], "LineString"]
    check(spark, filt, {}, True, geom="LineString")
    check(spark, filt, {}, False, geom="Point")


def test_id_rejected_by_default():
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["==", ["id"], 5]))


def test_id_extension(spark):
    from mapbox_filter_spark.style.compile import compile_filter as cf
    from pyspark.sql import Row
    df = spark.createDataFrame(
        [Row(feature_id=7, geom_kind="Point", props={})], schema=FEATURE_SCHEMA)
    pred = finalize_predicate(cf(["==", ["id"], 7], allow_id_extension=True))
    assert df.select(pred.alias("k")).collect()[0]["k"] is True


# ------------------------------------------------------------- let / var

def test_let_var(spark):
    filt = ["let", "v", ["get", "cls"], ["==", ["var", "v"], "river"]]
    check(spark, filt, {"cls": "river"}, True)
    check(spark, filt, {"cls": "x"}, False)


def test_var_unbound():
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression(["==", ["var", "nope"], 1]))


# ------------------------------------------------------- parse-level rules

def test_numarray_literal_precedence():
    # [1,2] parses as num-array literal, not an expression
    e = parse_expression([1, 2])
    from mapbox_filter_spark.style.ast import UNumArr
    assert isinstance(e, UNumArr)


def test_numarray_equality(spark):
    check(spark, ["==", [1.0, 2.0], [1.0, 2.0]], {}, True)
    check(spark, ["==", [1.0, 2.0], [1.0, 3.0]], {}, False)
    # Any (props) vs numarray: distinct constructors -> unequal
    check(spark, ["==", ["get", "a"], [1.0, 2.0]], {"a": "1"}, False)


def test_stops_rejected():
    with pytest.raises(TypeCheckError):
        type_check_filter(parse_expression({"property": "x", "stops": []}))


def test_null_rejected():
    with pytest.raises(ExprParseError):
        parse_expression(None)


# ------------------------------------------- README copy-down filter (E2E)

README_FILTER = [
    "all",
    ["==", ["geometry-type"], "LineString"],
    ["!=", ["string", ["get", "class"]], "stream"],
    ["match", ["string", ["get", "brunnel"], ""], ["tunnel", "bridge"],
     False, True],
]


def test_readme_copydown_filter(spark):
    check(spark, README_FILTER, {"class": "river"}, True, geom="LineString")
    check(spark, README_FILTER, {"class": "stream"}, False, geom="LineString")
    check(spark, README_FILTER, {"class": "river", "brunnel": "tunnel"},
          False, geom="LineString")
    check(spark, README_FILTER, {"class": "river", "brunnel": "ford"},
          True, geom="LineString")
    check(spark, README_FILTER, {"class": "river"}, False, geom="Point")
    # class missing: ["string", ["get","class"]] fails -> != fails ->
    # all fails -> drop
    check(spark, README_FILTER, {}, False, geom="LineString")
