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
- :func:`reorder_paragraph` — the full UAX#9 algorithm: P2/P3 base
  direction (skipping isolated scopes), explicit embedding/override/
  isolate codes X1-X8 (directional status stack, overflow counters,
  max depth 125), X9 removal, X10 isolating run sequences (BD13, with
  per-sequence sos/eos), weak-type resolution W1-W7 per sequence
  (classes from the stdlib Unicode database,
  ``unicodedata.bidirectional``), bracket-pair resolution N0 (BD16
  stack pairing over the COMPLETE BidiBrackets.txt table with
  canonical-equivalence matching), neutral resolution
  N1/N2, implicit levels I1/I2, whitespace/separator reset L1,
  level-run reversal L2, and glyph mirroring L4 at odd (RTL) resolved
  levels only.  Bidi control characters (LRM/RLM/ALM, the
  embedding/override/PDF codes, and the isolate codes) participate in
  resolution and are then removed from the output — the reference's
  ``RemoveBidiControls`` behavior.  ZWNJ/ZWJ (class BN) are removed
  from resolution per X9 but KEPT in the output (they are not
  Bidi_Control and ICU retains them), carried at the level of the
  preceding character.

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

# Unicode Bidi_Control: ALM, LRM, RLM, LRE/RLE/PDF/LRO/RLO, LRI/RLI/FSI/PDI.
# These take part in resolution (strong marks, explicit levels) and are then
# dropped from the OUTPUT (the reference's RemoveBidiControls).  ZWNJ/ZWJ are
# deliberately NOT here: they are BN, not Bidi_Control, and ICU keeps them.
_BIDI_CONTROLS = frozenset(
    "؜‎‏‪‫‬‭‮"
    "⁦⁧⁨⁩"
)

# L4 mirror glyphs: the non-bracket common mirrors here; every
# BidiBrackets.txt pair is added (both directions) right after
# _BIDI_BRACKETS is defined below — BidiMirroring.txt maps each paired
# bracket to its partner, so the bracket table doubles as its mirror slice.
_MIRROR = {"<": ">", ">": "<", "«": "»", "»": "«", "‹": "›", "›": "‹",
           "≤": "≥", "≥": "≤"}


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


# BD16 bracket pairing: the COMPLETE Unicode BidiBrackets.txt table (all
# 64 Open_Paired_Bracket entries of the public Unicode 14+ data file,
# transcribed as open->close codepoint pairs; the pre-14 file lacks only
# the four U+2E55..U+2E5C pairs).  Note the two tick-bracket pairs cross:
# U+298D pairs with U+2990 and U+298F with U+298E.
_BIDI_BRACKETS = (
    (0x0028, 0x0029), (0x005B, 0x005D), (0x007B, 0x007D),
    (0x0F3A, 0x0F3B), (0x0F3C, 0x0F3D), (0x169B, 0x169C),
    (0x2045, 0x2046), (0x207D, 0x207E), (0x208D, 0x208E),
    (0x2308, 0x2309), (0x230A, 0x230B), (0x2329, 0x232A),
    (0x2768, 0x2769), (0x276A, 0x276B), (0x276C, 0x276D),
    (0x276E, 0x276F), (0x2770, 0x2771), (0x2772, 0x2773),
    (0x2774, 0x2775), (0x27C5, 0x27C6), (0x27E6, 0x27E7),
    (0x27E8, 0x27E9), (0x27EA, 0x27EB), (0x27EC, 0x27ED),
    (0x27EE, 0x27EF), (0x2983, 0x2984), (0x2985, 0x2986),
    (0x2987, 0x2988), (0x2989, 0x298A), (0x298B, 0x298C),
    (0x298D, 0x2990), (0x298F, 0x298E), (0x2991, 0x2992),
    (0x2993, 0x2994), (0x2995, 0x2996), (0x2997, 0x2998),
    (0x29D8, 0x29D9), (0x29DA, 0x29DB), (0x29FC, 0x29FD),
    (0x2E22, 0x2E23), (0x2E24, 0x2E25), (0x2E26, 0x2E27),
    (0x2E28, 0x2E29), (0x2E55, 0x2E56), (0x2E57, 0x2E58),
    (0x2E59, 0x2E5A), (0x2E5B, 0x2E5C), (0x3008, 0x3009),
    (0x300A, 0x300B), (0x300C, 0x300D), (0x300E, 0x300F),
    (0x3010, 0x3011), (0x3014, 0x3015), (0x3016, 0x3017),
    (0x3018, 0x3019), (0x301A, 0x301B), (0xFE59, 0xFE5A),
    (0xFE5B, 0xFE5C), (0xFE5D, 0xFE5E), (0xFF08, 0xFF09),
    (0xFF3B, 0xFF3D), (0xFF5B, 0xFF5D), (0xFF5F, 0xFF60),
    (0xFF62, 0xFF63),
)


def _canon_bracket(ch: str) -> str:
    """BD16's canonical-equivalence rule: pairing compares CANONICAL
    codepoints, so U+2329/U+232A (singleton canonical decompositions to
    U+3008/U+3009) match the CJK angle brackets.  Only pure canonical
    singletons qualify — compatibility decompositions (e.g. the
    fullwidth U+FF08 '<wide> 0028') must NOT collapse."""
    import unicodedata

    d = unicodedata.decomposition(ch)
    if d and not d.startswith("<"):
        cps = d.split()
        if len(cps) == 1:
            return chr(int(cps[0], 16))
    return ch


_BRACKET_PAIRS = {_canon_bracket(chr(o)): _canon_bracket(chr(c))
                  for o, c in _BIDI_BRACKETS}
_BRACKET_CLOSE = {v: k for k, v in _BRACKET_PAIRS.items()}

for _o, _c in _BIDI_BRACKETS:  # L4 mirror slice (see _MIRROR above)
    _MIRROR[chr(_o)] = chr(_c)
    _MIRROR[chr(_c)] = chr(_o)
del _o, _c

_NEUTRAL = frozenset(("B", "S", "WS", "ON"))


def _strong_dir(b: str) -> str | None:
    """N0/N1 strong context: EN and AN are treated as R."""
    if b == "L":
        return "L"
    if b in ("R", "EN", "AN"):
        return "R"
    return None


_ISO_INIT = ("LRI", "RLI", "FSI")
_X9_REMOVED = frozenset(("LRE", "RLE", "LRO", "RLO", "PDF", "BN"))
# classes that extend an L1 whitespace-reset run (UAX#9 L1 + §5.2: isolate
# formatting characters and removed explicit codes count as whitespace here)
_L1_WS = frozenset(("WS",)) | _X9_REMOVED | set(_ISO_INIT) | {"PDI"}
_MAX_DEPTH = 125


def _match_isolates(cls: list[str]) -> tuple[dict[int, int], dict[int, int]]:
    """BD9: matching PDI per isolate initiator (and the reverse map)."""
    stack: list[int] = []
    m_pdi: dict[int, int] = {}
    m_init: dict[int, int] = {}
    for i, b in enumerate(cls):
        if b in _ISO_INIT:
            stack.append(i)
        elif b == "PDI" and stack:
            j = stack.pop()
            m_pdi[j] = i
            m_init[i] = j
    return m_pdi, m_init


def _paragraph_level(cls: list[str], lo: int = 0, hi: "int | None" = None) -> int:
    """P2/P3: first strong type not inside an isolate scope sets the level."""
    hi = len(cls) if hi is None else hi
    depth = 0
    for i in range(lo, hi):
        b = cls[i]
        if b in _ISO_INIT:
            depth += 1
        elif b == "PDI":
            if depth:
                depth -= 1
        elif depth == 0:
            if b == "L":
                return 0
            if b in ("R", "AL"):
                return 1
    return 0


def _explicit_levels(
    cls: list[str], base: int, m_pdi: dict[int, int],
) -> tuple[list[int], list[str], list[bool]]:
    """X1-X8 directional status stack + X9 removal flags.

    Returns (embedding level per char, working classes with overrides
    applied, removed-from-resolution flags)."""
    n = len(cls)
    levels = [base] * n
    wcls = list(cls)
    removed = [False] * n
    # (embedding level, override 'L'/'R'/None, is directional isolate)
    stack: list[tuple[int, "str | None", bool]] = [(base, None, False)]
    o_iso = o_emb = valid_iso = 0
    for i, b in enumerate(cls):
        if b in ("RLE", "LRE", "RLO", "LRO"):
            removed[i] = True
            lvl = stack[-1][0]
            new = ((lvl + 1) | 1) if b[0] == "R" else ((lvl + 2) & ~1)
            if new <= _MAX_DEPTH and not o_iso and not o_emb:
                stack.append((new, b[0] if b[2] == "O" else None, False))
            elif not o_iso:
                o_emb += 1
        elif b in _ISO_INIT:
            d = b
            if b == "FSI":  # X5c: P2/P3 within the isolate's scope
                d = "RLI" if _paragraph_level(
                    cls, i + 1, m_pdi.get(i, n)) else "LRI"
            lvl, ov, _ = stack[-1]
            levels[i] = lvl
            if ov:
                wcls[i] = ov
            new = ((lvl + 1) | 1) if d == "RLI" else ((lvl + 2) & ~1)
            if new <= _MAX_DEPTH and not o_iso and not o_emb:
                valid_iso += 1
                stack.append((new, None, True))
            else:
                o_iso += 1
        elif b == "PDI":  # X6a
            if o_iso:
                o_iso -= 1
            elif valid_iso:
                o_emb = 0
                while not stack[-1][2]:
                    stack.pop()
                stack.pop()
                valid_iso -= 1
            lvl, ov, _ = stack[-1]
            levels[i] = lvl
            if ov:
                wcls[i] = ov
        elif b == "PDF":  # X7
            removed[i] = True
            if o_iso:
                pass
            elif o_emb:
                o_emb -= 1
            elif not stack[-1][2] and len(stack) > 1:
                stack.pop()
        elif b == "B":  # X8
            levels[i] = base
        elif b == "BN":
            removed[i] = True
        else:  # X6
            lvl, ov, _ = stack[-1]
            levels[i] = lvl
            if ov:
                wcls[i] = ov
    return levels, wcls, removed


def _run_sequences(
    retained: list[int], levels: list[int], cls: list[str],
    m_pdi: dict[int, int], m_init: dict[int, int],
) -> list[list[int]]:
    """X10/BD13: level runs chained initiator -> matching PDI."""
    runs: list[list[int]] = []
    cur: list[int] = []
    for i in retained:
        if cur and levels[i] != levels[cur[-1]]:
            runs.append(cur)
            cur = []
        cur.append(i)
    if cur:
        runs.append(cur)

    seqs: list[list[int]] = []
    pending: dict[int, int] = {}  # initiator index -> seq position
    for run in runs:
        first = run[0]
        init = m_init.get(first)
        if cls[first] == "PDI" and init is not None and init in pending:
            s = pending.pop(init)
            seqs[s].extend(run)
        else:
            seqs.append(list(run))
            s = len(seqs) - 1
        last = run[-1]
        if cls[last] in _ISO_INIT and last in m_pdi:
            pending[last] = s
    return seqs


def _resolve_sequence(
    chars: list[str], cls: list[str], orig: list[str],
    sos: str, eos: str, e_dir: str,
) -> None:
    """W1-W7, N0, N1/N2 over ONE isolating run sequence (local lists,
    mutated in place).  ``orig`` carries the original classes for the W1
    isolate-initiator/PDI special case."""
    n = len(cls)
    # isolate initiators / PDI act as ON within the sequence
    for i, b in enumerate(cls):
        if b in _ISO_INIT or b == "PDI":
            cls[i] = "ON"

    # W1: NSM takes the class of the previous character (sos at start);
    # after an isolate initiator or PDI it becomes ON
    prev = sos
    for i, b in enumerate(cls):
        if b == "NSM":
            cls[i] = ("ON" if i > 0
                      and (orig[i - 1] in _ISO_INIT or orig[i - 1] == "PDI")
                      else prev)
        prev = cls[i]
    # W2: EN after an AL context becomes AN
    strong = sos
    for i, b in enumerate(cls):
        if b in ("L", "R", "AL"):
            strong = b
        elif b == "EN" and strong == "AL":
            cls[i] = "AN"
    # W3: AL -> R
    for i, b in enumerate(cls):
        if b == "AL":
            cls[i] = "R"
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
    for i, b in enumerate(cls):
        if b in ("ET", "ES", "CS"):
            cls[i] = "ON"
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
    for i, c in enumerate(chars):
        if cls[i] != "ON":
            continue
        cc = _canon_bracket(c)
        if cc in _BRACKET_PAIRS:
            if len(stack) >= 63:
                break
            stack.append((cc, i))
        elif cc in _BRACKET_CLOSE:
            for k in range(len(stack) - 1, -1, -1):
                if stack[k][0] == _BRACKET_CLOSE[cc]:
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


def reorder_paragraph(text: str) -> str:
    """Logical -> visual order: the full UAX#9 algorithm (module doc),
    explicit directional codes included.  Output has Bidi_Control
    characters removed (reference RemoveBidiControls parity)."""
    import unicodedata as ud

    if not text:
        return text
    chars = list(text)
    n = len(chars)
    orig = [ud.bidirectional(c) or "ON" for c in chars]

    m_pdi, m_init = _match_isolates(orig)
    base = _paragraph_level(orig)
    levels, wcls, removed = _explicit_levels(orig, base, m_pdi)

    retained = [i for i in range(n) if not removed[i]]
    pos_of = {i: p for p, i in enumerate(retained)}

    final_levels = list(levels)
    for seq in _run_sequences(retained, levels, orig, m_pdi, m_init):
        lvl = levels[seq[0]]
        p0, pL = pos_of[seq[0]], pos_of[seq[-1]]
        prev_lvl = levels[retained[p0 - 1]] if p0 > 0 else base
        if orig[seq[-1]] in _ISO_INIT and seq[-1] not in m_pdi:
            next_lvl = base  # initiator with no matching PDI (BD13)
        else:
            next_lvl = (levels[retained[pL + 1]]
                        if pL + 1 < len(retained) else base)
        sos = "R" if max(lvl, prev_lvl) % 2 else "L"
        eos = "R" if max(levels[seq[-1]], next_lvl) % 2 else "L"
        e_dir = "R" if lvl % 2 else "L"

        s_chars = [chars[i] for i in seq]
        s_cls = [wcls[i] for i in seq]
        s_orig = [orig[i] for i in seq]
        _resolve_sequence(s_chars, s_cls, s_orig, sos, eos, e_dir)
        for k, i in enumerate(seq):
            b, lv = s_cls[k], levels[i]
            if lv % 2 == 0:  # I1
                final_levels[i] = (lv + 1 if b == "R"
                                   else lv + 2 if b in ("AN", "EN") else lv)
            else:  # I2
                final_levels[i] = lv + 1 if b in ("L", "AN", "EN") else lv

    # L1: S/B reset to the paragraph level, along with any preceding run of
    # whitespace/isolate-formatting characters, and the trailing run
    # (ORIGINAL classes; removed explicit codes count as whitespace)
    l1_reset = [False] * n
    k = n - 1
    while k >= 0 and orig[k] in _L1_WS:
        final_levels[k] = base
        l1_reset[k] = True
        k -= 1
    for i in range(n):
        if orig[i] in ("S", "B"):
            final_levels[i] = base
            l1_reset[i] = True
            j = i - 1
            while j >= 0 and orig[j] in _L1_WS:
                final_levels[j] = base
                l1_reset[j] = True
                j -= 1

    # output chars: X9-removed explicit codes vanish; BN (ZWNJ/ZWJ) stays,
    # carried at the level of the preceding retained character so it travels
    # with its run under L2
    out_idx: list[int] = []
    out_lvl: list[int] = []
    carry = base
    for i in range(n):
        if orig[i] in ("LRE", "RLE", "LRO", "RLO", "PDF"):
            continue
        if removed[i]:  # BN
            out_idx.append(i)
            out_lvl.append(base if l1_reset[i] else carry)
        else:
            carry = final_levels[i]
            out_idx.append(i)
            out_lvl.append(carry)
    m = len(out_idx)
    out_chars = [chars[i] for i in out_idx]

    # L2: reverse contiguous runs, highest level down to lowest odd level
    odd = [lv for lv in out_lvl if lv % 2]
    if odd:
        for lev in range(max(out_lvl), min(odd) - 1, -1):
            i = 0
            while i < m:
                if out_lvl[i] < lev:
                    i += 1
                    continue
                j = i
                while j < m and out_lvl[j] >= lev:
                    j += 1
                out_chars[i:j] = out_chars[i:j][::-1]
                out_lvl[i:j] = out_lvl[i:j][::-1]
                i = j

    # L4: mirror glyphs whose RESOLVED direction is R (odd level); then
    # remove Bidi_Control characters from the visual result
    return "".join(
        _MIRROR.get(c, c) if lv % 2 else c
        for c, lv in zip(out_chars, out_lvl)
        if c not in _BIDI_CONTROLS)


def rtl_convert(text: str) -> str:
    """The reference's full conversion: shape, reorder per paragraph, rejoin
    with '\\n' (Filters.hs:88-94)."""
    shaped = shape_arabic(text)
    return "\n".join(reorder_paragraph(p) for p in shaped.split("\n"))
