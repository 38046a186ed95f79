"""RTL conversion golden tests (style/rtl.py + the flag-gated operator).

Expected values hand-derived from the Presentation Forms-B tables and the
reference's ICU pipeline shape (shapeArabic then visual reorder,
Filters.hs:88-94); BiDi is the UAX#9 implicit algorithm (weak types,
bracket pairs N0, neutrals N1/N2, levels + L2 reversal + L4 mirroring).
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
    # LTR base: embedded RTL run is reversed (ICU reorder does this too;
    # the old simplified path left LTR paragraphs untouched)
    assert reorder_paragraph("hello اب") == "hello با"
    # digits form an LTR island inside RTL
    assert rtl_convert("ابج 123") == "123 " + JEEM_FIN + BEH_INI + ALEF_ISO
    # mirroring of brackets in RTL runs (unshaped input: reorder only)
    assert reorder_paragraph("(اب)") == "(با)"
    # bidi controls removed (RemoveBidiControls)
    assert reorder_paragraph("‏" + "اب") == "با"


def test_brackets_around_ltr_in_rtl():
    """Round-2 advice regression: balanced brackets around an LTR island in
    an RTL paragraph survive — N0 resolves both brackets to the embedding
    direction, the island stays LTR inside them, and mirroring happens on
    both (so the pair still reads '(test)').  The old run-segmenter
    attached the trailing bracket to the LTR run and mirrored only the
    opener, yielding 'test))'."""
    out = reorder_paragraph("اب (test)")
    assert out == "(test) با"
    # nested opposite-direction runs with digits (weak types + neutrals)
    assert reorder_paragraph("اب [x 12] ج") == "ج [x 12] با"
    # unbalanced bracket: no N0 pairing, so N2 resolves it to the RTL base
    # and L4 mirrors it (per UAX#9; ICU does the same)
    assert reorder_paragraph("اب (x") == "x) با"


LRE, RLE, PDF = "‪", "‫", "‬"
LRO, RLO = "‭", "‮"
LRI, RLI, FSI, PDI = "⁦", "⁧", "⁨", "⁩"


def test_explicit_embeddings_and_overrides():
    """X1-X10: explicit codes are honored during resolution, then removed
    from the output (RemoveBidiControls)."""
    # RLO override forces Latin to render reversed; base stays LTR (P2
    # sees the first strong char, overrides don't change the paragraph)
    assert reorder_paragraph(RLO + "abc" + PDF) == "cba"
    assert reorder_paragraph(RLO + "ab" + PDF + "cd") == "bacd"
    # LRE inside an RTL paragraph: the embedded LTR island keeps its order
    assert reorder_paragraph("اب " + LRE + "abc" + PDF) == "abc با"
    # unmatched PDF / stray PDI are ignored, text unharmed
    assert reorder_paragraph(PDF + "abc" + PDI) == "abc"


def test_directional_isolates():
    # RLI isolate inside LTR: content reordered RTL, placed as one unit
    assert reorder_paragraph("x " + RLI + "اب" + PDI + " y") == "x با y"
    # FSI: direction from the first strong char in its scope (Arabic -> R);
    # the digit stays visually after the Arabic inside the isolate
    assert reorder_paragraph("x " + FSI + "اب 1" + PDI + " y") == "x 1 با y"
    # an isolate's content doesn't leak direction: paragraph base comes
    # from the first strong OUTSIDE isolate scopes (P2 skips them)
    assert reorder_paragraph(RLI + "اب" + PDI + " ab") == "با ab"


def test_zwnj_preserved():
    """ZWNJ/ZWJ are BN (removed from resolution per X9) but are NOT
    Bidi_Control: they stay in the output, riding their run's level."""
    assert reorder_paragraph("ab‌cd") == "ab‌cd"
    # inside an RTL run the ZWNJ travels with the reversed run
    out = reorder_paragraph("اب‌ج")
    assert "‌" in out and out[0] == "ج"


def test_paragraphs_rejoined():
    one = rtl_convert("ابج")
    assert rtl_convert("ابج\nابج") == one + "\n" + one


def test_reorder_properties():
    """Property sweep over random mixes of Latin/Arabic/digits/neutrals and
    explicit codes: the visual string is a permutation of the input minus
    Bidi_Control characters, and control-free LTR text is unchanged."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from mapbox_filter_spark.style.rtl import _BIDI_CONTROLS

    alphabet = (
        "ab1 .,()[]"                 # L, EN, WS, CS, ON, brackets
        "ابج٣"                       # AL + Arabic-Indic digit (AN)
        "‎‏"               # LRM RLM
        "‪‫‬‭‮"  # LRE RLE PDF LRO RLO
        "⁦⁧⁨⁩"   # LRI RLI FSI PDI
        "‌"                     # ZWNJ (BN, kept)
    )

    @given(st.text(alphabet=alphabet, max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(s):
        out = reorder_paragraph(s)
        kept = [c for c in s if c not in _BIDI_CONTROLS]
        # mirroring maps within the multiset's bracket pairs; normalize
        norm = {"(": ")", "[": "]"}
        def canon(cs):
            return Counter(norm.get(c, c) for c in cs)
        assert canon(out) == canon(kept)
        assert not any(c in _BIDI_CONTROLS for c in out)

    check()

    # control-free pure-LTR text is a no-op
    for s in ("hello world", "a1 b2, c3.", "x (y) [z]"):
        assert reorder_paragraph(s) == s


def test_operator_flag(spark):
    from mapbox_filter_spark.operators.style_ops import rtl_transform

    df = spark.createDataFrame(
        [({"name": "ابج", "class": "river"},)], "props map<string,string>")
    # flag off: no-op plan
    assert rtl_transform(df, enabled=False) is df
    out = rtl_transform(df, enabled=True).collect()[0]["props"]
    assert out["name"] == JEEM_FIN + BEH_INI + ALEF_ISO
    assert out["class"] == "river"


def test_bidi_bracket_table_consistent_with_unicodedata():
    """The transcribed BidiBrackets.txt table must agree with the stdlib
    Unicode database: every open is category Ps, every close Pe, all are
    bidi class ON and Bidi_Mirrored, and the pairing is bijective."""
    import unicodedata

    from mapbox_filter_spark.style.rtl import (
        _BIDI_BRACKETS, _BRACKET_CLOSE, _BRACKET_PAIRS, _canon_bracket)

    assert len(_BIDI_BRACKETS) == 64
    closes = set()
    for o, c in _BIDI_BRACKETS:
        assert unicodedata.category(chr(o)) == "Ps", hex(o)
        assert unicodedata.category(chr(c)) == "Pe", hex(c)
        assert unicodedata.bidirectional(chr(o)) == "ON", hex(o)
        assert unicodedata.bidirectional(chr(c)) == "ON", hex(c)
        assert unicodedata.mirrored(chr(o)) and unicodedata.mirrored(chr(c))
        assert c not in closes
        closes.add(c)
    # canonical collapse: 2329/232A fold onto 3008/3009, everything else
    # keeps its own identity; the maps stay mutually inverse
    assert _canon_bracket("〈") == "〈"
    assert _canon_bracket("〉") == "〉"
    assert _canon_bracket("（") == "（"  # compat decomp NOT folded
    assert len(_BRACKET_PAIRS) == 63  # 64 rows, one canonical collapse
    assert {(v, k) for k, v in _BRACKET_PAIRS.items()} == \
        set(_BRACKET_CLOSE.items()) | set()
    assert all(_BRACKET_CLOSE[v] == k for k, v in _BRACKET_PAIRS.items())
