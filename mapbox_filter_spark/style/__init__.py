"""Mapbox GL style-expression front end.

JSON filter -> (optional legacy rewrite) -> untyped AST -> typed AST
(static type check, reference-parity rejections) -> either a native
``pyspark.sql.Column`` predicate (``compile.compile_filter``) or a pure-Python
row evaluation (``pyinterp.evaluate`` — the differential-test oracle).

Reference parity: /root/reference/src/Mapbox/{UntypedExpression,Expression,
Interpret,OldStyleConvert,Style}.hs (behavior studied, code written from
scratch for Spark).
"""

from .ast import parse_expression, ExprParseError
from .legacy import convert_legacy_filter, LegacyConvertError
from .typecheck import type_check_filter, TypeCheckError
from .compile import compile_filter, compile_typed, FeatureCols, finalize_predicate
from .model import MapboxStyle, VectorLayer, load_style
from .scrape import scrape_layer_attrs

__all__ = [
    "parse_expression",
    "ExprParseError",
    "convert_legacy_filter",
    "LegacyConvertError",
    "type_check_filter",
    "TypeCheckError",
    "compile_filter",
    "compile_typed",
    "FeatureCols",
    "finalize_predicate",
    "MapboxStyle",
    "VectorLayer",
    "load_style",
    "scrape_layer_attrs",
]
