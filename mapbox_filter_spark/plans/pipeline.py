"""The flagship job: documents -> filtered tile pyramid.

Spark lifecycle equivalent of the reference's ``filter`` command
(/root/reference/app/Main.hs:330-422, SURVEY.md §3.1): one declarative
DataFrame program replaces the per-tile thread-pool loop —

    read(documents)
      -> posexplode(spans) -> feature rows          (decode stage)
      -> assign (z, x, y) per requested zoom        (pure Column math)
      -> σ style predicate (zoom-gated, per-layer)  (single codegen'd filter)
      -> π map-key metadata pruning
      -> γ tile assembly (sorted features, span order re-established)

Catalyst analyze/optimize/codegen replaces the reference's IR2-IR4; the
executor pool replaces its two-level thread pool (app/Main.hs:397-402).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.assemble import assemble_tiles, assign_tiles
from ..operators.style_ops import filter_keep, prune_props
from ..style.model import MapboxStyle


def run_filter_job(
    documents: DataFrame,
    style: MapboxStyle,
    zooms: Sequence[int],
    seed: int = 42,
) -> DataFrame:
    """documents (interleaved spans shape) -> tiles DataFrame."""
    from ..sources.documents import explode_documents

    features = explode_documents(documents, seed=seed)
    assigned = assign_tiles(features, zooms)
    kept = filter_keep(assigned, style)
    pruned = prune_props(kept, style)
    return assemble_tiles(pruned)


def run_filter_job_features(
    features: DataFrame,
    style: MapboxStyle,
    zooms: Sequence[int],
) -> DataFrame:
    """Same job starting from already-exploded feature rows.

    Plan shape (multi-zoom optimization): filter BODIES are evaluated once
    per feature and a z-independent necessary condition prunes rows BEFORE
    the |zooms|-way explode; the exact zoom-gated predicate then runs on
    precomputed booleans.  Semantics identical to filter_keep per zoom
    (asserted by tests/test_pipeline_equiv.py), expression work /= |zooms|,
    explode volume *= survivor rate.
    """
    from ..operators.style_ops import (
        attach_filter_bodies, keep_predicate_from_bodies, mirror_feature_cols,
        prefilter_necessary,
    )

    # Bind flat attribute mirrors (p_<key>) where the input schema carries
    # them — the engine's own substrate convention.  The filter bodies then
    # read dictionary-encoded string columns instead of scanning the props
    # map per reference, and a downstream aggregate that never touches
    # ``props`` (e.g. tile counts) skips the map column decode entirely.
    cols = mirror_feature_cols(style, features.columns)
    with_bodies, body_cols = attach_filter_bodies(features, style, cols)
    pruned_in = with_bodies.filter(prefilter_necessary(style, body_cols))
    assigned = assign_tiles(pruned_in, zooms)
    kept = assigned.filter(
        keep_predicate_from_bodies(style, body_cols, F.col("z")))
    kept = kept.drop(*body_cols.values())
    pruned = prune_props(kept, style)
    return assemble_tiles(pruned)


def job_counters(features_assigned: DataFrame, style: MapboxStyle):
    """The reference's run counters (app/Main.hs:341-344,407-421):
    total / kept / dropped feature counts in ONE pass via ``observe``
    (no extra job; metrics surface after the next action).

    Returns (observed_df, Observation); read ``obs.get`` after an action.
    """
    from pyspark.sql import Observation

    from ..operators.style_ops import keep_predicate

    obs = Observation("job_counters")
    pred = keep_predicate(style, F.col("z"))
    observed = features_assigned.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("kept"),
        F.sum(F.when(pred, 0).otherwise(1)).alias("dropped"),
    )
    return observed, obs
