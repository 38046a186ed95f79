"""Static attribute scraping: which property keys does a style layer need?

Parity target: /root/reference/src/Mapbox/Style.hs:51-69 (``scrapeExprMeta``):
- every ``["get", name]`` / ``["has", name]`` with a literal name contributes
  that name (non-literal names are an error);
- legacy "function" objects contribute their ``property``;
- every string literal is scanned for ``{placeholder}`` deinterpolation,
  including the reference's quirk that an unterminated ``{tail`` still
  contributes ``tail``.

The retained-key union (display meta from paint/layout + filter meta) drives
metadata pruning (Filters.hs:74-82) — the map-key analogue of Catalyst column
pruning (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any

from . import ast as A


class ScrapeError(ValueError):
    pass


def deinterpolate(txt: str) -> set[str]:
    """Extract ``{var}`` names from a string (Style.hs:64-69), including the
    unterminated-brace quirk."""
    out: set[str] = set()
    rest = txt
    while True:
        i = rest.find("{")
        if i == -1:
            return out
        rest = rest[i + 1:]
        j = rest.find("}")
        if j == -1:
            out.add(rest)
            return out
        out.add(rest[:j])
        rest = rest[j:]


def scrape_expr_meta(e: A.UExp) -> set[str]:
    """Property names referenced by an untyped expression."""
    if isinstance(e, A.UApp):
        if e.name in ("get", "has"):
            if len(e.args) == 1 and isinstance(e.args[0], A.UStr):
                return {e.args[0].value}
            raise ScrapeError(
                f"Unsupported computation in expression '{e.name}', "
                "only direct strings allowed"
            )
        out: set[str] = set()
        for a in e.args:
            out |= scrape_expr_meta(a)
        return out
    if isinstance(e, A.ULet):
        return scrape_expr_meta(e.value) | scrape_expr_meta(e.body)
    if isinstance(e, A.UStr):
        return deinterpolate(e.value)
    if isinstance(e, A.UFunction):
        return {e.property} if e.property is not None else set()
    # UMatch: contributes NOTHING — reference parity.  scrapeExprMeta has no
    # UMatch case, so it falls to the ``getMeta _ = mempty`` catch-all
    # (Style.hs:62): keys referenced only inside a match (including every
    # legacy in/!in filter, which the rewriter converts to match) are NOT
    # retained and get pruned from emitted tile metadata.  Arguably a
    # reference bug, but "byte-for-meaning" output parity wins; the r1
    # engine recursed into match and emitted extra keys (deviation flagged
    # by round-1 advice).  Use scrape_expr_meta_match_aware for the
    # fixed-behavior extension.
    return set()


def scrape_expr_meta_match_aware(e: A.UExp) -> set[str]:
    """EXTENSION (non-parity): like scrape_expr_meta but also recursing into
    match input/outputs/default, for styles that rely on keys referenced
    only inside match.  Not used by default — see the UMatch note above."""
    if isinstance(e, A.UMatch):
        out = scrape_expr_meta_match_aware(e.input) \
            | scrape_expr_meta_match_aware(e.default)
        for _lbl, v in e.table:
            out |= scrape_expr_meta_match_aware(v)
        return out
    if isinstance(e, A.UApp) and e.name not in ("get", "has"):
        out = set()
        for a in e.args:
            out |= scrape_expr_meta_match_aware(a)
        return out
    if isinstance(e, A.ULet):
        return scrape_expr_meta_match_aware(e.value) \
            | scrape_expr_meta_match_aware(e.body)
    return scrape_expr_meta(e)


def scrape_json_meta(v: Any) -> set[str]:
    """Scrape a paint/layout property VALUE (parsed as an expression the way
    the reference does, Style.hs:92)."""
    return scrape_expr_meta(A.parse_expression(v))


def scrape_layer_attrs(layer_json: dict) -> tuple[set[str], set[str]]:
    """(display_meta, filter_meta) for one style-layer JSON object."""
    display: set[str] = set()
    for section in ("paint", "layout"):
        for _k, val in (layer_json.get(section) or {}).items():
            display |= scrape_json_meta(val)
    filt = layer_json.get("filter")
    filter_meta = scrape_expr_meta(A.parse_expression(filt)) if filt is not None else set()
    return display, filter_meta
