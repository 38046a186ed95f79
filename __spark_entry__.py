"""Driver contract for the spark-graft builder (PySpark target).

Engine: mapbox_filter_spark — see SURVEY.md §2 for the operator inventory
each ``queries()`` entry maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lineitem-derived features -> README-style-filtered tile
    pyramid at z ∈ {4, 6} (σ -> π -> γ with deterministic ordering)."""
    from mapbox_filter_spark.plans.pipeline import run_filter_job_features
    from mapbox_filter_spark.queries import README_STYLE
    from mapbox_filter_spark.sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, "/root/testdata/sf0.001")
    tiles = run_filter_job_features(feats, README_STYLE, zooms=[4, 6])
    return tiles.select("z", "x", "y", "layer", "feature_count")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mapbox_filter_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from mapbox_filter_spark import queries as q

    return q.oracle_sql()
