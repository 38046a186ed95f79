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
    """Same job starting from already-exploded feature rows."""
    assigned = assign_tiles(features, zooms)
    kept = filter_keep(assigned, style)
    pruned = prune_props(kept, style)
    return assemble_tiles(pruned)
