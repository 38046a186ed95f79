"""Debug/dump operator: per-feature kept/dropped markers for a style.

Parity target: the reference's ``dump`` command
(/root/reference/app/Main.hs:292-314) — its de-facto test oracle: print
every feature of a tile with a marker showing whether the style keeps it.
Here it is a DataFrame transform (composable, testable) plus a formatter
mirroring the reference's human-readable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.style_ops import keep_predicate
from ..style.model import MapboxStyle


def dump_features(
    features: DataFrame, style: MapboxStyle, zoom: int,
    layer_col: str = "layer",
) -> DataFrame:
    """Add a boolean ``kept`` column: would the style keep this feature at
    ``zoom``?"""
    return features.withColumn(
        "kept", keep_predicate(style, F.lit(zoom), layer_col))


def format_dump(features: DataFrame, style: MapboxStyle, zoom: int,
                limit: int = 100) -> str:
    """Human-readable dump, one feature per line with +/- marker."""
    rows = dump_features(features, style, zoom).limit(limit).collect()
    lines = []
    for r in rows:
        mark = "+" if r["kept"] else "-"
        props = ",".join(f"{k}={v}" for k, v in sorted((r["props"] or {}).items()))
        lines.append(
            f"{mark} {r['layer']}/{r['geom_kind']} id={r['feature_id']} {props}")
    return "\n".join(lines)
