"""RTL conversion golden tests (style/rtl.py + the flag-gated operator).

Expected values hand-derived from the Presentation Forms-B tables and the
reference's ICU pipeline shape (shapeArabic then visual reorder,
Filters.hs:88-94); BiDi is the documented simplified-UAX#9 best effort.
"""

from pyspark.sql import functions as F

from mapbox_filter_spark.style.rtl import (
    reorder_paragraph, rtl_convert, shape_arabic,
)

ALEF_ISO = "ﺍ"
BEH_ISO = "ﺏ"
BEH_INI = "ﺑ"
JEEM_FIN = "ﺞ"
LAM_ALEF_ISO = "ﻻ"
LAM_ALEF_FIN = "ﻼ"


def test_shaping_contextual_forms():
    # alef (right-joining) + beh (dual) + jeem (dual):
    # isolated alef, initial beh, final jeem — logical order preserved
    assert shape_arabic("ابج") == ALEF_ISO + BEH_INI + JEEM_FIN
    # non-joining neighbors -> isolated forms
    assert shape_arabic("اب") == ALEF_ISO + BEH_ISO
    # latin passthrough
    assert shape_arabic("abc") == "abc"


def test_lam_alef_ligature():
    assert shape_arabic("لا") == LAM_ALEF_ISO
    # joined from the left: final ligature
    assert shape_arabic("بلا") == BEH_INI + LAM_ALEF_FIN


def test_reorder_visual():
    shaped = shape_arabic("ابج")
    # RTL base: single run reversed into visual order
    assert reorder_paragraph(shaped) == JEEM_FIN + BEH_INI + ALEF_ISO
    # LTR base: untouched
    assert reorder_paragraph("hello اب") == "hello اب"
    # digits form an LTR island inside RTL
    assert rtl_convert("ابج 123") == "123 " + JEEM_FIN + BEH_INI + ALEF_ISO
    # mirroring of brackets in RTL runs (unshaped input: reorder only)
    assert reorder_paragraph("(اب)") == "(با)"
    # bidi controls removed (RemoveBidiControls)
    assert reorder_paragraph("‏" + "اب") == "با"


def test_paragraphs_rejoined():
    one = rtl_convert("ابج")
    assert rtl_convert("ابج\nابج") == one + "\n" + one


def test_operator_flag(spark):
    from mapbox_filter_spark.operators.style_ops import rtl_transform

    df = spark.createDataFrame(
        [({"name": "ابج", "class": "river"},)], "props map<string,string>")
    # flag off: no-op plan
    assert rtl_transform(df, enabled=False) is df
    out = rtl_transform(df, enabled=True).collect()[0]["props"]
    assert out["name"] == JEEM_FIN + BEH_INI + ALEF_ISO
    assert out["class"] == "river"
