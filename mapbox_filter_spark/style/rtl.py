"""RTL text conversion: Arabic contextual shaping + BiDi paragraph reorder.

Parity target: /root/reference/src/Mapbox/Filters.hs:84-95 — the reference
pipes every retained string metadata value through ICU's
``shapeArabic [LettersShape]`` then ``reorderParagraphs [DoMirroring,
RemoveBidiControls]`` and rejoins paragraphs with '\\n'.

ICU bindings are unavailable in this environment, so this is a pure-Python
BEST-EFFORT replica (documented deviation, COVERAGE.md):

- :func:`shape_arabic` — the full Arabic Presentation Forms-B contextual
  mapping (isolated/final/initial/medial + the four mandatory lam-alef
  ligatures, with harakat transparent to joining), equivalent to ICU
  LettersShape for unvocalized Arabic text.
- :func:`reorder_paragraph` — the UAX#9 implicit algorithm, full
  fidelity for text without explicit directional formatting characters:
  P2/P3 base direction, weak-type resolution W1-W7 (classes from the
  stdlib Unicode database, ``unicodedata.bidirectional``), bracket-pair
  resolution N0 (BD16 stack pairing over the common bracket set),
  neutral resolution N1/N2, implicit levels I1/I2, whitespace reset L1,
  level-run reversal L2, and glyph mirroring L4 at odd (RTL) resolved
  levels only.  Remaining deviation (documented, COVERAGE.md): explicit
  directional embedding/override/isolate codes (X1-X10) are stripped as
  bidi controls BEFORE resolution instead of being honored first — the
  reference's RemoveBidiControls removes them from the OUTPUT after
  processing, so strings that rely on explicit overrides may differ.

All of it runs inside an Arrow-batched pandas UDF over pruned metadata
(style_ops.rtl_transform) — the boundary-op pattern, never per-row Python
on unpruned data.
"""

from __future__ import annotations

# base char -> (isolated, final, initial, medial); initial/medial None for
# right-joining letters, all-but-isolated None for non-joining hamza.
_ARABIC_FORMS: dict[str, tuple[str, str | None, str | None, str | None]] = {
    "ء": ("ﺀ", None, None, None),
    "آ": ("ﺁ", "ﺂ", None, None),
    "أ": ("ﺃ", "ﺄ", None, None),
    "ؤ": ("ﺅ", "ﺆ", None, None),
    "إ": ("ﺇ", "ﺈ", None, None),
    "ئ": ("ﺉ", "ﺊ", "ﺋ", "ﺌ"),
    "ا": ("ﺍ", "ﺎ", None, None),
    "ب": ("ﺏ", "ﺐ", "ﺑ", "ﺒ"),
    "ة": ("ﺓ", "ﺔ", None, None),
    "ت": ("ﺕ", "ﺖ", "ﺗ", "ﺘ"),
    "ث": ("ﺙ", "ﺚ", "ﺛ", "ﺜ"),
    "ج": ("ﺝ", "ﺞ", "ﺟ", "ﺠ"),
    "ح": ("ﺡ", "ﺢ", "ﺣ", "ﺤ"),
    "خ": ("ﺥ", "ﺦ", "ﺧ", "ﺨ"),
    "د": ("ﺩ", "ﺪ", None, None),
    "ذ": ("ﺫ", "ﺬ", None, None),
    "ر": ("ﺭ", "ﺮ", None, None),
    "ز": ("ﺯ", "ﺰ", None, None),
    "س": ("ﺱ", "ﺲ", "ﺳ", "ﺴ"),
    "ش": ("ﺵ", "ﺶ", "ﺷ", "ﺸ"),
    "ص": ("ﺹ", "ﺺ", "ﺻ", "ﺼ"),
    "ض": ("ﺽ", "ﺾ", "ﺿ", "ﻀ"),
    "ط": ("ﻁ", "ﻂ", "ﻃ", "ﻄ"),
    "ظ": ("ﻅ", "ﻆ", "ﻇ", "ﻈ"),
    "ع": ("ﻉ", "ﻊ", "ﻋ", "ﻌ"),
    "غ": ("ﻍ", "ﻎ", "ﻏ", "ﻐ"),
    "ف": ("ﻑ", "ﻒ", "ﻓ", "ﻔ"),
    "ق": ("ﻕ", "ﻖ", "ﻗ", "ﻘ"),
    "ك": ("ﻙ", "ﻚ", "ﻛ", "ﻜ"),
    "ل": ("ﻝ", "ﻞ", "ﻟ", "ﻠ"),
    "م": ("ﻡ", "ﻢ", "ﻣ", "ﻤ"),
    "ن": ("ﻥ", "ﻦ", "ﻧ", "ﻨ"),
    "ه": ("ﻩ", "ﻪ", "ﻫ", "ﻬ"),
    "و": ("ﻭ", "ﻮ", None, None),
    "ى": ("ﻯ", "ﻰ", None, None),
    "ي": ("ﻱ", "ﻲ", "ﻳ", "ﻴ"),
}

# lam + alef-variant -> (isolated ligature, final ligature)
_LAM_ALEF = {
    "آ": ("ﻵ", "ﻶ"),
    "أ": ("ﻷ", "ﻸ"),
    "إ": ("ﻹ", "ﻺ"),
    "ا": ("ﻻ", "ﻼ"),
}

_LAM = "ل"
# harakat & marks transparent to joining (Mn class within Arabic block)
_TRANSPARENT = set(
    [chr(c) for c in range(0x064B, 0x0660)] + ["ٰ"]
)

_BIDI_CONTROLS = set(
    "‌‍‎‏‪‫‬‭‮"
    "⁦⁧⁨⁩؜"
)

_MIRROR = {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{",
           "<": ">", ">": "<", "«": "»", "»": "«", "⟨": "⟩", "⟩": "⟨",
           "⟦": "⟧", "⟧": "⟦", "⁅": "⁆", "⁆": "⁅", "〈": "〉", "〉": "〈",
           "《": "》", "》": "《", "〔": "〕", "〕": "〔"}


def _joins_next(c: str) -> bool:
    f = _ARABIC_FORMS.get(c)
    return f is not None and f[2] is not None  # has initial form


def _joins_prev(c: str) -> bool:
    f = _ARABIC_FORMS.get(c)
    return f is not None and f[1] is not None  # has final form


def shape_arabic(text: str) -> str:
    """Contextual presentation forms (logical order preserved)."""
    chars = list(text)
    out: list[str] = []
    i = 0
    n = len(chars)

    def prev_joins(idx: int) -> bool:
        j = idx - 1
        while j >= 0 and chars[j] in _TRANSPARENT:
            j -= 1
        return j >= 0 and _joins_next(chars[j])

    def next_joins_prev(idx: int) -> bool:
        j = idx + 1
        while j < n and chars[j] in _TRANSPARENT:
            j += 1
        return j < n and _joins_prev(chars[j])

    while i < n:
        c = chars[i]
        forms = _ARABIC_FORMS.get(c)
        if forms is None:
            out.append(c)
            i += 1
            continue
        # mandatory lam-alef ligature
        if c == _LAM:
            j = i + 1
            while j < n and chars[j] in _TRANSPARENT:
                j += 1
            if j < n and chars[j] in _LAM_ALEF:
                iso, fin = _LAM_ALEF[chars[j]]
                out.append(fin if prev_joins(i) else iso)
                out.extend(chars[i + 1:j])  # keep interleaved harakat
                i = j + 1
                continue
        linked_prev = prev_joins(i)
        linked_next = _joins_next(c) and next_joins_prev(i)
        iso, fin, ini, med = forms
        if linked_prev and linked_next:
            out.append(med or fin or iso)
        elif linked_prev:
            out.append(fin or iso)
        elif linked_next:
            out.append(ini or iso)
        else:
            out.append(iso)
        i += 1
    return "".join(out)


# BD16 bracket pairing set (BidiBrackets.txt common subset)
_BRACKET_PAIRS = {"(": ")", "[": "]", "{": "}", "⟨": "⟩", "⟦": "⟧",
                  "⁅": "⁆", "〈": "〉", "《": "》", "「": "」", "『": "』",
                  "【": "】", "〔": "〕", "〖": "〗", "〚": "〛"}
_BRACKET_CLOSE = {v: k for k, v in _BRACKET_PAIRS.items()}

_NEUTRAL = frozenset(("B", "S", "WS", "ON"))


def _strong_dir(b: str) -> str | None:
    """N0/N1 strong context: EN and AN are treated as R."""
    if b == "L":
        return "L"
    if b in ("R", "EN", "AN"):
        return "R"
    return None


def reorder_paragraph(text: str) -> str:
    """Logical -> visual order: UAX#9 implicit algorithm (module doc).

    One paragraph, no explicit formatting codes (stripped upfront), so the
    whole text is a single isolating run sequence with sos = eos = the
    paragraph direction."""
    import unicodedata as ud

    text = "".join(c for c in text if c not in _BIDI_CONTROLS)
    if not text:
        return text
    cls = [ud.bidirectional(c) or "ON" for c in text]
    n = len(text)

    # P2/P3: first strong type sets the paragraph level
    base = 0
    for b in cls:
        if b == "L":
            break
        if b in ("R", "AL"):
            base = 1
            break
    e_dir = "R" if base else "L"
    sos = eos = e_dir

    # W1: NSM takes the class of the previous character (sos at start)
    prev = sos
    for i, b in enumerate(cls):
        if b == "NSM":
            cls[i] = prev
        prev = cls[i]
    # W2: EN after an AL context becomes AN
    strong = sos
    for i, b in enumerate(cls):
        if b in ("L", "R", "AL"):
            strong = b
        elif b == "EN" and strong == "AL":
            cls[i] = "AN"
    # W3: AL -> R
    cls = [("R" if b == "AL" else b) for b in cls]
    # W4: ES between EN,EN -> EN; CS between same-type EN/AN -> that type
    for i in range(1, n - 1):
        if cls[i] == "ES" and cls[i - 1] == "EN" and cls[i + 1] == "EN":
            cls[i] = "EN"
        elif (cls[i] == "CS" and cls[i - 1] == cls[i + 1]
              and cls[i - 1] in ("EN", "AN")):
            cls[i] = cls[i - 1]
    # W5: ET runs adjacent to EN -> EN
    i = 0
    while i < n:
        if cls[i] != "ET":
            i += 1
            continue
        j = i
        while j < n and cls[j] == "ET":
            j += 1
        if (i > 0 and cls[i - 1] == "EN") or (j < n and cls[j] == "EN"):
            for k in range(i, j):
                cls[k] = "EN"
        i = j
    # W6: leftover separators/terminators -> ON
    cls = [("ON" if b in ("ET", "ES", "CS") else b) for b in cls]
    # W7: EN after an L context -> L
    strong = sos
    for i, b in enumerate(cls):
        if b in ("L", "R"):
            strong = b
        elif b == "EN" and strong == "L":
            cls[i] = "L"

    # N0: bracket pairs (BD16 stack pairing, 63-deep)
    stack: list[tuple[str, int]] = []
    pairs: list[tuple[int, int]] = []
    for i, c in enumerate(text):
        if cls[i] != "ON":
            continue
        if c in _BRACKET_PAIRS:
            if len(stack) >= 63:
                break
            stack.append((c, i))
        elif c in _BRACKET_CLOSE:
            for k in range(len(stack) - 1, -1, -1):
                if stack[k][0] == _BRACKET_CLOSE[c]:
                    pairs.append((stack[k][1], i))
                    del stack[k:]
                    break
    opp = "L" if e_dir == "R" else "R"
    for o, c_ in sorted(pairs):
        inside = {_strong_dir(b) for b in cls[o + 1:c_]}
        if e_dir in inside:
            cls[o] = cls[c_] = e_dir
        elif opp in inside:
            ctx = sos
            for k in range(o - 1, -1, -1):
                d = _strong_dir(cls[k])
                if d:
                    ctx = d
                    break
            cls[o] = cls[c_] = opp if ctx == opp else e_dir
        # else: no strong inside — brackets stay neutral (N1/N2 decide)

    # N1/N2: neutral runs take the surrounding direction if it agrees on
    # both sides (EN/AN count as R), else the embedding direction
    i = 0
    while i < n:
        if cls[i] not in _NEUTRAL:
            i += 1
            continue
        j = i
        while j < n and cls[j] in _NEUTRAL:
            j += 1
        bdir = _strong_dir(cls[i - 1]) if i > 0 else sos
        adir = _strong_dir(cls[j]) if j < n else eos
        fill = bdir if (bdir is not None and bdir == adir) else e_dir
        for k in range(i, j):
            cls[k] = fill
        i = j

    # I1/I2: implicit levels
    if base == 0:
        levels = [0 if b == "L" else (1 if b == "R" else 2) for b in cls]
    else:
        levels = [1 if b == "R" else 2 for b in cls]

    # L1: S/B and whitespace runs before them + trailing whitespace reset
    # to the paragraph level (ORIGINAL classes, not resolved ones)
    orig = [ud.bidirectional(c) or "ON" for c in text]
    k = n - 1
    while k >= 0 and orig[k] == "WS":
        levels[k] = base
        k -= 1
    for i in range(n):
        if orig[i] in ("S", "B"):
            levels[i] = base
            j = i - 1
            while j >= 0 and orig[j] == "WS":
                levels[j] = base
                j -= 1

    # L2: reverse contiguous runs, highest level down to lowest odd level
    chars = list(text)
    odd_levels = [lv for lv in levels if lv % 2]
    if odd_levels:
        for lev in range(max(levels), min(odd_levels) - 1, -1):
            i = 0
            while i < n:
                if levels[i] < lev:
                    i += 1
                    continue
                j = i
                while j < n and levels[j] >= lev:
                    j += 1
                chars[i:j] = chars[i:j][::-1]
                levels[i:j] = levels[i:j][::-1]
                i = j

    # L4: mirror glyphs whose RESOLVED direction is R (odd level)
    return "".join(
        _MIRROR.get(c, c) if lv % 2 else c
        for c, lv in zip(chars, levels))


def rtl_convert(text: str) -> str:
    """The reference's full conversion: shape, reorder per paragraph, rejoin
    with '\\n' (Filters.hs:88-94)."""
    shaped = shape_arabic(text)
    return "\n".join(reorder_paragraph(p) for p in shaped.split("\n"))
