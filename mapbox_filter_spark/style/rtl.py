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
- :func:`reorder_paragraph` — a simplified UAX#9: first-strong base
  direction, strong-run segmentation (RTL = Arabic/Hebrew blocks incl.
  presentation forms; digits stay LTR), visual reordering for RTL base,
  bracket mirroring inside RTL runs, bidi-control removal.  Full UAX#9
  (explicit embeddings, weak-type resolution chains) is NOT implemented —
  cases relying on it may differ from ICU.

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
           "<": ">", ">": "<", "«": "»", "»": "«"}


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


def _is_rtl(c: str) -> bool:
    cp = ord(c)
    return (0x0590 <= cp <= 0x08FF or 0xFB1D <= cp <= 0xFDFF
            or 0xFE70 <= cp <= 0xFEFF)


def _is_ltr(c: str) -> bool:
    return c.isalpha() and not _is_rtl(c)


def reorder_paragraph(text: str) -> str:
    """Logical -> visual order (simplified UAX#9; see module docstring)."""
    text = "".join(c for c in text if c not in _BIDI_CONTROLS)
    if not text:
        return text
    base_rtl = next((_is_rtl(c) for c in text if _is_rtl(c) or _is_ltr(c)),
                    False)
    if not base_rtl:
        return text

    # segment into strong runs; neutrals/digits attach to the current run,
    # leading neutrals to the first run
    runs: list[tuple[bool, list[str]]] = []  # (is_rtl_run, chars)
    cur_rtl: bool | None = None
    for c in text:
        if _is_rtl(c):
            strong: bool | None = True
        elif _is_ltr(c) or c.isdigit():
            strong = False
        else:
            strong = cur_rtl
        if not runs or strong != cur_rtl:
            cur_rtl = strong if strong is not None else base_rtl
            runs.append((cur_rtl, []))
        runs[-1][1].append(c)
        cur_rtl = runs[-1][0]

    visual: list[str] = []
    for is_rtl_run, chars in reversed(runs):
        if is_rtl_run:
            visual.extend(_MIRROR.get(c, c) for c in reversed(chars))
        else:
            visual.extend(chars)
    return "".join(visual)


def rtl_convert(text: str) -> str:
    """The reference's full conversion: shape, reorder per paragraph, rejoin
    with '\\n' (Filters.hs:88-94)."""
    shaped = shape_arabic(text)
    return "\n".join(reorder_paragraph(p) for p in shaped.split("\n"))
