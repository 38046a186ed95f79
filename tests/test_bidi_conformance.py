"""UAX#9 conformance vectors for style/rtl.reorder_paragraph — the
BidiCharacterTest-style hardening pass over the explicit-code paths
(X1-X10), isolates, brackets (N0), and weak types (W1-W7).

Every expected string was hand-derived from the UAX#9 algorithm (levels →
L2 run reversal), derivation noted per vector.  Output convention: the
visual order read left-to-right, bidi controls removed (ICU
``ubidi_writeReordered`` + RemoveBidiControls parity — the reference calls
ICU's reorderParagraphs, src/Mapbox/Filters.hs:92-95).  L3
(combining-mark reset) is NOT applied, matching ICU's default WRITE mode:
an NSM reverses with its run (see ``w1-nsm``).
"""

import pytest

from mapbox_filter_spark.style.rtl import reorder_paragraph

LRE, RLE, PDF, LRO, RLO = "‪", "‫", "‬", "‭", "‮"
LRI, RLI, FSI, PDI = "⁦", "⁧", "⁨", "⁩"
A, B, G, D = "א", "ב", "ג", "ד"  # א ב ג ד

VECTORS = [
    # --- implicit levels (P, I, L2) ---
    # all-L: identity
    ("pure-ltr", "abc", "abc"),
    # all-R, para level 1: single run reversed
    ("pure-rtl", A + B + G, G + B + A),
    # L para: the R run (level 1) reverses in place
    ("ltr-para-rtl-run", f"abc {A}{B}{G} def", f"abc {G}{B}{A} def"),
    # R para: EN gets level 2; level-2 run + whole-para reversal ⇒ digits
    # keep logical order, flanking R words swap ends
    ("rtl-para-digits", f"{A}{B} 12 {G}{D}", f"{D}{G} 12 {B}{A}"),
    # R para: L word at level 2, same double-reversal shape
    ("rtl-para-ltr-word", f"{A}{B} xy {G}", f"{G} xy {B}{A}"),
    # --- weak types ---
    # W1: NSM takes the class of its base (R) and reverses with the run;
    # L3 not applied, so the mark lands BEFORE its base in the string
    ("w1-nsm", A + "שׁ" + B, B + "ׁש" + A),
    # W4: ES between EN stays EN — "1.2" is one level-2 run
    ("w4-en-separator", f"{A} 1.2 {B}", f"{B} 1.2 {A}"),
    # W4: CS between AN stays AN (arabic-indic digits + thousands sep)
    ("w4-cs-an", f"{A} ١٢٬٣ {B}",
     f"{B} ١٢٬٣ {A}"),
    # W5/W6: ET adjacent to EN joins the number run
    ("w5-et-percent", f"{A} 10% {B}", f"{B} 10% {A}"),
    # W7: EN after L context becomes L — no level bump, pure LTR layout
    ("w7-en-after-l", f"a 12 {A}", f"a 12 {A}"),
    # --- explicit embeddings/overrides (X1-X8) ---
    # RLO in L para: 'abc' forced R at level 1 ⇒ reversed
    ("x-rlo-override", f"a{RLO}abc{PDF}b", "acbab"),
    # LRO in R para: inner run pinned L at level 2, rides para reversal
    ("x-lro-in-rtl", f"{A}{LRO}{A}{B}{PDF}{G}", f"{G}{A}{B}{A}"),
    # RLE in L para: embedded R text reversed in place
    ("x-rle-embed", f"a{RLE}{A}{B}{PDF}b", f"a{B}{A}b"),
    # LRE in R para: embedded L text keeps order, para reverses around it
    ("x-lre-embed-in-rtl", f"{A}{LRE}ab{PDF}{B}", f"{B}ab{A}"),
    # X7: PDF with empty directional stack is ignored
    ("x-unmatched-pdf", f"ab{PDF}c", "abc"),
    # overflow: >125 RLEs — overflow counters absorb the excess, text
    # survives, no crash (X5 overflow rules)
    ("x-overflow-guard", RLE * 130 + "a" + PDF * 130, "a"),
    # --- isolates (X5a-X6a, BD13 run sequences) ---
    ("x-rli-isolate", f"a{RLI}{A}{B}{PDI}c", f"a{B}{A}c"),
    ("x-lri-isolate-in-rtl", f"{A}{LRI}ab{PDI}{B}", f"{B}ab{A}"),
    # nested: outer RLI content reversed, inner LRI 'b' kept LTR
    ("x-nested-isolates", f"a{RLI}{A}{LRI}b{PDI}{B}{PDI}c",
     f"a{B}b{A}c"),
    # FSI first-strong=R: isolate renders RTL; para level comes from
    # OUTSIDE the isolate (P2 skips isolate content) ⇒ L para here
    ("x-fsi-rtl", f"{FSI}{A}{B}{PDI} x", f"{B}{A} x"),
    # FSI first-strong=L: isolate renders LTR inside an R para
    ("x-fsi-ltr", f"{FSI}ab{PDI} {A}", f"{A} ab"),
    # --- N0 bracket pairs (BD16) ---
    # brackets in an all-R context take R; mirrored at odd level ⇒ the
    # visual string still reads "(ב)"
    ("n0-brackets-rtl", f"{A} ({B}) {G}", f"{G} ({B}) {A}"),
    # the ADVICE regression: L word parenthesized inside an R para —
    # neutrals between opposite runs resolve to para direction (N1/N2),
    # brackets pair around the L run and are NOT double-mirrored
    ("n0-brackets-ltr-word", f"{A}{B} (test) {G}", f"{G} (test) {B}{A}"),
    # CJK corner brackets: same derivation as n0-brackets-ltr-word —
    # brackets resolve R (level 1), L2 re-reverses the L island, L4
    # mirrors both at odd level, so the visual pair still encloses it
    ("n0-brackets-cjk", f"{A}{B} 【test】 {G}", f"{G} 【test】 {B}{A}"),
    # Tibetan paired marks (U+0F3A/B) — deep BidiBrackets.txt rows
    ("n0-brackets-tibetan", f"{A}{B} ༺test༻ {G}", f"{G} ༺test༻ {B}{A}"),
    # canonical equivalence (BD16 note): U+2329 canonically equals U+3008,
    # so it PAIRS with the CJK closer U+3009.  Both resolve R (level 1);
    # L2 swaps their positions and L4 mirrors each to its BidiMirroring
    # partner (U+3009 -> U+3008, U+2329 -> U+232A), so the visual string
    # opens with the CJK form and closes with the deprecated angle form
    ("n0-brackets-canonical-equiv",
     f"{A}{B} \u2329test\u3009 {G}", f"{G} \u3008test\u232a {B}{A}"),
    # crossed tick-bracket rows: U+298D pairs with U+2990 (not U+298E)
    ("n0-brackets-crossed-ticks",
     f"{A}{B} ⦍test⦐ {G}", f"{G} ⦍test⦐ {B}{A}"),
    # --- degenerate ---
    ("empty", "", ""),
    ("spaces-only", "   ", "   "),
]


@pytest.mark.parametrize("name,logical,visual",
                         VECTORS, ids=[v[0] for v in VECTORS])
def test_bidi_conformance(name, logical, visual):
    assert reorder_paragraph(logical) == visual


def test_controls_always_removed():
    for ctl in (LRE, RLE, PDF, LRO, RLO, LRI, RLI, FSI, PDI):
        assert ctl not in reorder_paragraph(f"a{ctl}b")
