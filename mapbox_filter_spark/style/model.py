"""Style JSON model.

Parity target: /root/reference/src/Mapbox/Style.hs (106 LoC).

- Layer kinds: vector (the only one carrying work), raster, background.
- Filters are type-checked AT STYLE PARSE TIME (Style.hs:86-88) — a broken
  filter fails ``load_style``, not the job.
- Styles merge as a semigroup (multi ``-j`` input, Style.hs:105-106) —
  ``MapboxStyle.merge``.
- ``clamp_min_zoom`` mirrors checkStyle's minzoom clamp to the source's max
  zoom (/root/reference/app/Main.hs:247-259) so that a style layer whose
  minzoom exceeds the tile pyramid's depth still applies at the deepest zoom.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from typing import Any, Optional

from . import ast as A
from . import typecheck as TC
from .legacy import convert_legacy_filter, LegacyConvertError
from .scrape import scrape_layer_attrs


class StyleError(ValueError):
    pass


@dataclass(frozen=True)
class VectorLayer:
    source: str
    source_layer: str
    filter_json: Optional[Any]          # new-style expression JSON (post legacy rewrite)
    filter_typed: Optional[TC.TExp]     # type-checked AST (None = no filter = keep all)
    min_zoom: Optional[int]
    max_zoom: Optional[int]
    display_meta: frozenset[str]
    filter_meta: frozenset[str]

    @property
    def meta(self) -> frozenset[str]:
        return self.display_meta | self.filter_meta

    def accepts_zoom(self, zoom: int) -> bool:
        """Zoom gate (Filters.hs:116-121)."""
        if self.min_zoom is not None and zoom < self.min_zoom:
            return False
        if self.max_zoom is not None and zoom > self.max_zoom:
            return False
        return True


@dataclass(frozen=True)
class MapboxStyle:
    vector_layers: tuple[VectorLayer, ...]
    n_raster: int = 0
    n_background: int = 0

    def merge(self, other: "MapboxStyle") -> "MapboxStyle":
        return MapboxStyle(
            self.vector_layers + other.vector_layers,
            self.n_raster + other.n_raster,
            self.n_background + other.n_background,
        )

    @property
    def source_layers(self) -> tuple[str, ...]:
        """Distinct source-layer names, first-seen order."""
        seen: dict[str, None] = {}
        for l in self.vector_layers:
            seen.setdefault(l.source_layer, None)
        return tuple(seen)

    def layers_for_zoom(self, zoom: int) -> dict[str, list[VectorLayer]]:
        """source_layer -> zoom-accepted style layers (styleToCFilters
        grouping, Filters.hs:99-121)."""
        out: dict[str, list[VectorLayer]] = {}
        for l in self.vector_layers:
            if l.accepts_zoom(zoom):
                out.setdefault(l.source_layer, []).append(l)
        return out

    @property
    def sources(self) -> tuple[str, ...]:
        """Distinct vector SOURCE names, first-seen order (checkStyle,
        app/Main.hs:250-252)."""
        seen: dict[str, None] = {}
        for l in self.vector_layers:
            seen.setdefault(l.source, None)
        return tuple(seen)

    def select_source(self, source: Optional[str] = None
                      ) -> tuple["MapboxStyle", str]:
        """checkStyle parity (app/Main.hs:249-266): pick the tile source —
        the named one (must exist) or the style's only one — and drop every
        layer belonging to a different source.  Raises StyleError exactly
        where the reference errors."""
        srcs = self.sources
        if source is not None:
            if source not in srcs:
                raise StyleError(f"Invalid tile source specified, {source!r}"
                                 f" (style has {list(srcs)})")
            chosen = source
        elif len(srcs) == 1:
            chosen = srcs[0]
        else:
            raise StyleError(
                f"Invalid tile source specified, None (style has "
                f"{list(srcs)}; pass -s/--source)")
        return MapboxStyle(
            tuple(l for l in self.vector_layers if l.source == chosen),
            self.n_raster, self.n_background,
        ), chosen

    def clamp_min_zoom(self, max_zoom: int) -> "MapboxStyle":
        """Clamp layer minzooms to the pyramid's max zoom
        (app/Main.hs:247-259)."""
        return MapboxStyle(
            tuple(
                replace(l, min_zoom=min(l.min_zoom, max_zoom))
                if l.min_zoom is not None else l
                for l in self.vector_layers
            ),
            self.n_raster,
            self.n_background,
        )


def _parse_vector_layer(o: dict, *, auto_legacy: bool) -> VectorLayer:
    flt = o.get("filter")
    if flt is not None and auto_legacy and _looks_legacy(flt):
        flt = convert_legacy_filter(flt)
    typed = None
    if flt is not None:
        try:
            typed = TC.type_check_filter(A.parse_expression(flt))
        except (TC.TypeCheckError, A.ExprParseError) as err:
            raise StyleError(
                f"layer {o.get('id', '?')}: bad filter: {err}") from err
    display, filter_meta = scrape_layer_attrs({**o, "filter": flt})
    return VectorLayer(
        source=o["source"],
        source_layer=o["source-layer"],
        filter_json=flt,
        filter_typed=typed,
        min_zoom=o.get("minzoom"),
        max_zoom=o.get("maxzoom"),
        display_meta=frozenset(display),
        filter_meta=frozenset(filter_meta),
    )


def _looks_legacy(flt: Any) -> bool:
    """Heuristic: legacy comparison/set ops take a bare key string as the
    first argument (``["==", "class", "x"]``); expressions never have a bare
    string there except has. Only used when auto_legacy=True — explicit
    ``convert_legacy_filter`` is the parity path (the reference has a separate
    CLI for it and otherwise assumes new-style)."""
    if not (isinstance(flt, list) and flt and isinstance(flt[0], str)):
        return False
    op, *args = flt
    if op in ("!has", "!in", "none"):
        return True
    if op in ("==", "!=", ">", ">=", "<", "<=", "in") and args and isinstance(args[0], str):
        return True
    if op in ("all", "any"):
        return any(_looks_legacy(a) for a in args)
    return False


def load_style(style: dict | str, *, auto_legacy: bool = False) -> MapboxStyle:
    """Parse a style JSON document (dict or JSON string)."""
    if isinstance(style, str):
        style = json.loads(style)
    layers = style.get("layers")
    if layers is None:
        raise StyleError("Style: missing 'layers'")
    vec: list[VectorLayer] = []
    n_raster = n_background = 0
    for o in layers:
        ltype = o.get("type")
        if ltype == "background":
            n_background += 1
        elif ltype == "raster":
            n_raster += 1
        else:
            vec.append(_parse_vector_layer(o, auto_legacy=auto_legacy))
    return MapboxStyle(tuple(vec), n_raster, n_background)
