"""Style-driven relational operators: σ (keep / negated keep) and the map-key
π (metadata pruning).

Parity targets:
- per-source-layer filter combination with failure recovery:
  /root/reference/src/Mapbox/Filters.hs:99-121 (``styleToCFilters`` +
  ``combineFilters``).  ``HMap.fromListWith combine`` folds with
  ``combine(new, old) = if new is True then True else old`` in the failure
  monad, so the FIRST style layer's raw filter is the fold tail and later
  layers contribute ``coalesce(f, False)`` arms.  We reproduce that fold as a
  Column so even the negated-filter corner (where a tail failure differs
  from a coalesced False) matches.
- default-drop of layers absent from the style: Filters.hs:40-43.
- negated filter (down-copy destination): Filters.hs:59-62 —
  ``coalesce(NOT pred, False)`` with default-KEEP for absent layers.
- metadata pruning: Filters.hs:74-82 — keys retained iff referenced by any
  zoom-accepted style layer of that source-layer (scraped display ∪ filter
  attrs).  This is column pruning generalized to map keys: Catalyst cannot
  prune map keys, so the π is an explicit ``map_filter``.
- zoom gating: Filters.hs:116-121 — compiled as predicates on the ``z``
  column, so when output is partitioned by z Catalyst turns them into
  partition pruning.

The whole style compiles to ONE predicate Column — the reference recompiles
per tile (app/Main.hs:382); we compile once per job.
"""

from __future__ import annotations

import functools
import operator
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..style.compile import FeatureCols, compile_typed, finalize_predicate
from ..style.model import MapboxStyle, VectorLayer

# Compiled-Column memo.  Building a style predicate is hundreds of py4j
# Column constructions (~0.1-0.3 s per query on the r6 attribution — a
# third of the measured wall at sf0.1); Columns are immutable unresolved
# expression handles, so the SAME Column object can be reused across any
# number of DataFrames/plans.  Results are unchanged by construction: the
# memo returns the identical expression tree the builder would produce.
# Keys carry id(style); values pin the style object so an id can never be
# recycled while its entry lives.  Bounded (tests build many throwaway
# styles).
_COMPILE_MEMO: dict = {}


def _memoized(style, key, build):
    entry = _COMPILE_MEMO.get(key)
    if entry is not None and entry[0] is style:
        return entry[1]
    val = build()
    if len(_COMPILE_MEMO) > 512:
        _COMPILE_MEMO.clear()
    _COMPILE_MEMO[key] = (style, val)
    return val


def _literal_meta_keys(node) -> set:
    """Literal ``get``/``has`` key names referenced anywhere in a typed
    filter AST (the scrape that decides which attribute mirrors apply)."""
    import dataclasses

    from ..style import typecheck as T

    out: set = set()

    def walk(n):
        if isinstance(n, (T.TReadMeta, T.TCheckMeta)) \
                and isinstance(n.name, T.TStr):
            out.add(n.name.value)
        if dataclasses.is_dataclass(n) and not isinstance(n, type):
            for f in dataclasses.fields(n):
                walk(getattr(n, f.name))
        elif isinstance(n, (tuple, list)):
            for x in n:
                walk(x)

    walk(node)
    return out


def mirror_feature_cols(style: MapboxStyle, columns,
                        prefix: str = "p_",
                        base: Optional[FeatureCols] = None) -> FeatureCols:
    """FeatureCols with attribute mirrors bound for every literal filter
    key whose flat mirror column ``<prefix><key>`` exists in ``columns``.

    The mirror contract (sources/features.py): ``p_<key>`` equals
    ``props[<key>]`` and is non-null exactly when the key is present.  On
    a schema honouring it, the compiled filter reads cheap flat string
    columns instead of per-reference map scans — and a count/aggregate
    that doesn't otherwise touch ``props`` skips decoding the map column
    entirely.  Schemas that use ``p_*`` for unrelated data must not pass
    their columns here (the engine only auto-binds in its own pipeline
    over its own substrate schema)."""
    import dataclasses

    keys: set = set()
    for l in style.vector_layers:
        if l.filter_typed is not None:
            keys |= _literal_meta_keys(l.filter_typed)
    cols = set(columns)
    pairs = tuple(sorted((k, prefix + k) for k in keys if prefix + k in cols))
    base = base or FeatureCols()
    if not pairs:
        return base
    return dataclasses.replace(base, attr_mirrors=pairs)


def _zoom_gate(l: VectorLayer, z: Column) -> Column:
    gate = F.lit(True)
    if l.min_zoom is not None:
        gate = gate & (z >= F.lit(int(l.min_zoom)))
    if l.max_zoom is not None:
        gate = gate & (z <= F.lit(int(l.max_zoom)))
    return gate


def _layer_filter_col(l: VectorLayer, cols: FeatureCols) -> Column:
    """Raw (nullable) compiled filter; no filter => keep-all (Filters.hs:105)."""
    if l.filter_typed is None:
        return F.lit(True)
    out = compile_typed(l.filter_typed, cols)
    return out.col


def _combined_raw(
    layers: list[VectorLayer], z: Column, cols: FeatureCols
) -> tuple[Column, Column]:
    """(present, comb_raw) for one source-layer: the exact fromListWith fold
    (see module docstring), with per-zoom presence decided by the z column."""
    present = F.lit(False)
    comb = F.lit(None).cast("boolean")
    for l in layers:  # style order == insertion order
        f = _layer_filter_col(l, cols)
        gate = _zoom_gate(l, z)
        folded = (
            F.when(~present, f)  # first present arm: raw tail
            .when(F.coalesce(f, F.lit(False)), F.lit(True))
            .otherwise(comb)
        )
        comb = F.when(gate, folded).otherwise(comb)
        present = present | gate
    return present, comb


def _by_source_layer(style: MapboxStyle) -> dict[str, list[VectorLayer]]:
    out: dict[str, list[VectorLayer]] = {}
    for l in style.vector_layers:
        out.setdefault(l.source_layer, []).append(l)
    return out


def keep_predicate(
    style: MapboxStyle,
    z: Column | int,
    layer_col: str = "layer",
    cols: Optional[FeatureCols] = None,
) -> Column:
    """Finalized boolean: feature survives the style filter.

    Features in source-layers the style never mentions are DROPPED
    (Filters.hs:40-43)."""
    cols = cols or FeatureCols()
    zc = F.lit(int(z)) if isinstance(z, int) else z

    def build() -> Column:
        lc = F.col(layer_col)
        pred = F.lit(False)
        for sl, layers in _by_source_layer(style).items():
            present, comb = _combined_raw(layers, zc, cols)
            pred = F.when(lc == sl,
                          present & F.coalesce(comb, F.lit(False))).otherwise(pred)
        return pred

    zk = int(z) if isinstance(z, int) else str(z)
    return _memoized(style, ("kp", id(style), zk, layer_col, cols), build)


def neg_predicate(
    style: MapboxStyle,
    z: Column | int,
    layer_col: str = "layer",
    cols: Optional[FeatureCols] = None,
) -> Column:
    """Finalized boolean: feature survives the NEGATED filter (down-copy
    destination path, Filters.hs:59-62).  Absent source-layers keep
    everything (default True)."""
    cols = cols or FeatureCols()
    zc = F.lit(int(z)) if isinstance(z, int) else z

    def build() -> Column:
        lc = F.col(layer_col)
        pred = F.lit(True)
        for sl, layers in _by_source_layer(style).items():
            present, comb = _combined_raw(layers, zc, cols)
            layer_neg = F.when(present,
                               F.coalesce(~comb, F.lit(False))).otherwise(True)
            pred = F.when(lc == sl, layer_neg).otherwise(pred)
        return pred

    zk = int(z) if isinstance(z, int) else str(z)
    return _memoized(style, ("np", id(style), zk, layer_col, cols), build)


def filter_keep(df: DataFrame, style: MapboxStyle, z="z",
                layer_col: str = "layer", cols: Optional[FeatureCols] = None) -> DataFrame:
    zc = F.col(z) if isinstance(z, str) else z
    # pushable companion: keep_predicate is CASE-else-false over the
    # mentioned source-layers, so `layer IN (mentioned)` is implied — but
    # a CASE never reaches the parquet scan, while the In() does
    # (row-group dictionary/min-max pruning on attribute substrates)
    sls = list(_by_source_layer(style))
    pre = F.col(layer_col).isin(sls) if sls else F.lit(False)
    return df.filter(pre).filter(keep_predicate(style, zc, layer_col, cols))


def filter_neg(df: DataFrame, style: MapboxStyle, z="z",
               layer_col: str = "layer", cols: Optional[FeatureCols] = None) -> DataFrame:
    zc = F.col(z) if isinstance(z, str) else z
    return df.filter(neg_predicate(style, zc, layer_col, cols))


def retained_key_condition(
    style: MapboxStyle, z: Column, layer_col: Column, key: Column
) -> Column:
    """True iff ``key`` is retained for this row's (source-layer, zoom)."""
    cond = F.lit(False)
    for sl, layers in _by_source_layer(style).items():
        per_layer = F.lit(False)
        for l in layers:
            keys = sorted(l.meta)
            if keys:
                per_layer = per_layer | (_zoom_gate(l, z) & key.isin(*keys))
        cond = F.when(layer_col == sl, per_layer).otherwise(cond)
    return cond


def prune_props(
    df: DataFrame,
    style: MapboxStyle,
    z="z",
    layer_col: str = "layer",
    props_col: str = "props",
) -> DataFrame:
    """π over map keys: drop properties not referenced by the style
    (display ∪ filter attrs of zoom-accepted layers).

    Plan shape: the retained-key set depends only on (source-layer, z), so
    it is materialized ONCE per row as a literal-array column and the
    map_filter lambda reduces to ``array_contains`` per key — the previous
    shape re-evaluated the whole per-layer zoom-gate when-chain for every
    map key (~8% on the flagship at sf0.1; grows with map width).

    When ``z`` is a PYTHON int (single-zoom stage), the zoom gates are
    folded at plan-build time: each source-layer's retained keys collapse
    to one literal array — no per-row gate evaluation at all, a smaller
    expression tree per zoom in multi-zoom pipelines (asserted in
    test_plans.py::test_prune_props_literal_zoom_plan)."""
    def build() -> Column:
        lc = F.col(layer_col)
        empty = F.array().cast("array<string>")
        keys_col = F.lit(None).cast("array<string>")
        if isinstance(z, int):
            for sl, layers in _by_source_layer(style).items():
                ks = sorted({k for l in layers if l.meta
                             and (l.min_zoom is None or z >= int(l.min_zoom))
                             and (l.max_zoom is None or z <= int(l.max_zoom))
                             for k in l.meta})
                layer_keys = F.array(*[F.lit(k) for k in ks]) if ks else empty
                keys_col = F.when(lc == sl, layer_keys).otherwise(keys_col)
        else:
            zc = F.col(z) if isinstance(z, str) else z
            for sl, layers in _by_source_layer(style).items():
                arrs = [
                    F.when(_zoom_gate(l, zc),
                           F.array(*[F.lit(k) for k in sorted(l.meta)])
                           if l.meta else empty).otherwise(empty)
                    for l in layers
                ]
                layer_keys = (F.array_distinct(F.flatten(F.array(*arrs)))
                              if arrs else empty)
                keys_col = F.when(lc == sl, layer_keys).otherwise(keys_col)
        return keys_col

    zk = z if isinstance(z, (int, str)) else str(z)
    keys_col = _memoized(style, ("pp", id(style), zk, layer_col), build)
    out = df.withColumn("__retained_keys", keys_col)
    out = out.withColumn(
        props_col,
        F.map_filter(F.col(props_col),
                     lambda k, _v: F.array_contains(
                         F.col("__retained_keys"), k)),
    )
    return out.drop("__retained_keys")


def attach_filter_bodies(
    df: DataFrame, style: MapboxStyle, cols: Optional[FeatureCols] = None,
) -> tuple[DataFrame, dict[int, str]]:
    """Evaluate every style layer's filter BODY once per feature row,
    materializing nullable-boolean columns ``__flt{i}`` (NULL == failure).

    Multi-zoom pipelines explode each feature once per zoom; recompiling the
    predicate per zoom-row multiplies expression work by |zooms|.  Bodies
    are z-independent (only the min/max zoom GATES depend on z —
    Filters.hs:116-121), so they can be computed pre-explode and the
    post-explode predicate reduces to gates over these boolean columns.
    """
    cols = cols or FeatureCols()

    def build() -> dict[str, Column]:
        return {f"__flt{i}": _layer_filter_col(l, cols)
                for i, l in enumerate(style.vector_layers)}

    named = _memoized(style, ("afb", id(style), cols), build)
    out = df.withColumns(named)
    return out, {i: n for i, n in enumerate(named)}


def keep_predicate_from_bodies(
    style: MapboxStyle,
    body_cols: dict[int, str],
    z: Column,
    layer_col: str = "layer",
) -> Column:
    """Exact keep predicate (same fold as :func:`keep_predicate`) reading
    precomputed body columns instead of recompiling filters."""
    def build() -> Column:
        lc = F.col(layer_col)
        by_sl: dict[str, list[tuple[int, VectorLayer]]] = {}
        for i, l in enumerate(style.vector_layers):
            by_sl.setdefault(l.source_layer, []).append((i, l))
        pred = F.lit(False)
        for sl, layers in by_sl.items():
            present = F.lit(False)
            comb = F.lit(None).cast("boolean")
            for i, l in layers:
                f = F.col(body_cols[i])
                gate = _zoom_gate(l, z)
                folded = (
                    F.when(~present, f)
                    .when(F.coalesce(f, F.lit(False)), F.lit(True))
                    .otherwise(comb)
                )
                comb = F.when(gate, folded).otherwise(comb)
                present = present | gate
            pred = F.when(lc == sl,
                          present & F.coalesce(comb, F.lit(False))).otherwise(pred)
        return pred

    return _memoized(style, ("kpb", id(style), tuple(sorted(body_cols.items())),
                             str(z), layer_col), build)


def prefilter_necessary(
    style: MapboxStyle, body_cols: dict[int, str], layer_col: str = "layer",
) -> Column:
    """A z-independent NECESSARY condition for survival at ANY zoom,
    deliberately CHEAP: the feature's source-layer is styled (default-drop,
    Filters.hs:40-43).  Applied BEFORE the zoom explode it prunes the
    explode volume without changing results (the exact gated predicate
    still runs after).

    Why not fold the body columns in (round-1 shape): Catalyst's
    PushDownPredicate substitutes projected aliases when pushing a filter
    toward the scan, so a body-referencing prefilter arrives at the scan
    with EVERY compiled filter body fully inlined (measured: a 66 KB
    predicate expression — past the codegen method limit, evaluated
    interpreted, and redundantly with the body project).  Layer membership
    is attribute-only, inlines for free, and is the dominant prune; rows
    whose bodies fail die at the cheap post-explode gate filter (boolean
    column reads) before any shuffle, so the extra explode volume costs no
    network."""
    lc = F.col(layer_col)
    styled = sorted({l.source_layer for l in style.vector_layers})
    if not styled:
        return F.lit(False)
    return lc.isin(*styled)


def prune_props_per_feature(
    df: DataFrame,
    style: MapboxStyle,
    z="z",
    layer_col: str = "layer",
    props_col: str = "props",
    cols: Optional[FeatureCols] = None,
) -> DataFrame:
    """PER-FEATURE metadata granularity — the reference's own TODO realized
    (Filters.hs:30 "we can make the metadata selection granular on a
    per-feature level"): a feature retains only the keys of style layers
    that actually ACCEPT it (zoom gate passes AND filter body holds), not
    the union over every zoom-accepted layer of its source-layer.

    Strictly tighter than :func:`prune_props` (never retains more);
    features no layer accepts keep nothing — σ drops them anyway.  Same
    plan shape: per-layer bodies evaluated once, retained-key array
    materialized per row, map_filter via array_contains."""
    cols = cols or FeatureCols()
    zc = F.col(z) if isinstance(z, str) else z
    lc = F.col(layer_col)
    empty = F.array().cast("array<string>")
    keys_col = F.lit(None).cast("array<string>")
    for sl, layers in _by_source_layer(style).items():
        arrs = [
            F.when(
                _zoom_gate(l, zc)
                & F.coalesce(_layer_filter_col(l, cols), F.lit(False)),
                F.array(*[F.lit(k) for k in sorted(l.meta)])
                if l.meta else empty,
            ).otherwise(empty)
            for l in layers
        ]
        layer_keys = (F.array_distinct(F.flatten(F.array(*arrs)))
                      if arrs else empty)
        keys_col = F.when(lc == sl, layer_keys).otherwise(keys_col)
    out = df.withColumn("__retained_keys", keys_col)
    out = out.withColumn(
        props_col,
        F.map_filter(F.col(props_col),
                     lambda k, _v: F.array_contains(
                         F.col("__retained_keys"), k)),
    )
    return out.drop("__retained_keys")


def rtl_transform(df: DataFrame, props_col: str = "props",
                  enabled: bool = False) -> DataFrame:
    """RTL conversion (Arabic contextual shaping + BiDi visual reorder) of
    property values — the reference's ``stringConversion`` applied to every
    retained metadata value AFTER pruning (Filters.hs:84-95).

    Implementation: pure-Python ICU replica (style/rtl.py —
    presentation-forms shaping is complete; BiDi is the FULL UAX#9
    algorithm including BD16 bracket pairing with the complete
    BidiBrackets table + canonical equivalence) in ONE Arrow-batched
    pandas UDF over the pruned props map.  Flag-gated like the
    reference's --rtl-convert switch (Main.hs:168)."""
    if not enabled:
        return df

    def _rtl_map(maps):
        from ..style.rtl import rtl_convert

        return maps.apply(
            lambda d: None if d is None
            else {k: rtl_convert(v) if v is not None else v
                  for k, v in d.items()})

    udf = F.pandas_udf(_rtl_map, "map<string,string>")
    return df.withColumn(props_col, udf(F.col(props_col)))
