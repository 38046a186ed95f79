"""Tile assignment + tile assembly (the γ that builds the pyramid).

- ``assign_tiles``: feature rows -> (z, x, y) at one or more zooms.  The
  zoom fan-out is a small ``explode`` of a literal array (bounded by pyramid
  depth, <= ~20), NOT a shuffle; x/y are pure Column math
  (geo.tilemath).  Down the plan, ``z`` is the partition column — zoom-gate
  predicates prune partitions (SURVEY.md §4).
- ``assemble_tiles``: groupBy (z, x, y, layer) -> sorted feature list +
  count.  Parity: untile/encode aggregate /root/reference/app/Main.hs:386 +
  empty elimination /root/reference/src/Mapbox/Filters.hs:68-71 (empty
  groups simply never exist after aggregation).

SPAN-SEQUENCE INVARIANT (BASELINE.json input_hint): ``collect_list`` order
is non-deterministic after shuffles, so the feature list is ALWAYS re-sorted
with ``array_sort`` on (feature_id) and each feature's spans are re-sorted by
(offset) INSIDE the aggregate — deterministic output independent of
partitioning, which is what "span-sequence equality preserved through every
shuffle" requires.

Scale: one shuffle on (z, x, y, layer) — the minimal possible for a keyed
aggregate; partial aggregation (map-side combine) applies since collect_list
is partial-izable; skewed hot tiles are handled by AQE + the salted-join
operators where applicable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo.tilemath import tile_cols


def assign_tiles(
    features: DataFrame,
    zooms: Sequence[int],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Add (z, x, y) per zoom level (explodes |zooms| rows per feature)."""
    zs = F.explode(F.array(*[F.lit(int(z)) for z in zooms])).alias("z")
    df = features.select("*", zs)
    x, y = tile_cols(F.col(lon), F.col(lat), F.col("z"))
    return df.withColumn("x", x).withColumn("y", y)


def assemble_tiles(
    features: DataFrame,
    feature_struct_cols: Sequence[str] = ("feature_id", "doc_id", "geom_kind", "props"),
    include_spans: bool = True,
) -> DataFrame:
    """(z, x, y, layer)-keyed tiles with deterministically-ordered features.

    Output schema mirrors FIXTURES.md §D: features sorted by feature_id,
    spans (if carried) sorted by offset.
    """
    struct_fields = [F.col(c).alias(c) for c in feature_struct_cols]
    if include_spans and "spans" in features.columns:
        struct_fields.append(
            F.array_sort(
                F.col("spans"),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ).alias("spans")
        )
    feat = F.struct(*struct_fields)
    out = (
        features.groupBy("z", "x", "y", "layer")
        .agg(
            F.collect_list(feat).alias("_features"),
            F.count(F.lit(1)).alias("feature_count"),
        )
        .withColumn(
            "features",
            F.array_sort(
                F.col("_features"),
                lambda a, b: F.when(a["feature_id"] < b["feature_id"], -1)
                .when(a["feature_id"] > b["feature_id"], 1)
                .otherwise(0),
            ),
        )
        .drop("_features")
    )
    return out


def renumber_features(tiles_features: DataFrame) -> DataFrame:
    """Sequential per-tile feature-id renumbering (1..n) — the reference
    renumbers after layer merge (/root/reference/src/Mapbox/DownCopy.hs:77-81).

    Input: exploded feature rows keyed by (z, x, y, layer); adds
    ``new_feature_id`` via row_number over a (tile, layer) window ordered by
    (feature_id) — deterministic, and the window partitions align with the
    assembly shuffle so no extra exchange is needed.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("z", "x", "y", "layer")
        .orderBy(F.col("feature_id").asc(), F.col("doc_id").asc())
    )
    return tiles_features.withColumn("new_feature_id", F.row_number().over(w))
