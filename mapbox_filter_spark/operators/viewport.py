"""Viewport (bbox) queries over a persistent cell-bucketed corpus — the
serving-side "give me everything in this map window" primitive
(reference parity: the serve path's tile lookup, plans/serve.py, is the
single-tile special case; this is the arbitrary-rectangle general
form).

Index layout: one row per point with its Web-Mercator tile cell at a
fixed zoom, written ``bucketBy(cell)`` (plans/sink.write_bucketed
discipline).  A query rectangle becomes (a) a driver-side cell-cover —
the zoom-Z tile rectangle spanned by the bbox corners, padded by one
cell — turned into ``cell IN (...)``, which Spark executes as BUCKET
PRUNING on the index (SelectedBucketsCount in the plan; only buckets
hosting covered cells are read), then (b) the EXACT lon/lat residual
filter.  At 100 TB the full-corpus scan never happens; cost scales
with the viewport, not the world.

The one-cell pad makes the cover robust to last-ulp disagreement
between the driver's python mercator math and the JVM's at cell
boundaries — correctness never depends on the float seam, because the
residual filter is exact and the cover is a superset.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.tilemath import MERCATOR_MAX_LAT, cell_encode
from ..plans.sink import write_bucketed
from .knn import mercator_xy
from .retrieval import _pinned_bucket_probe

__all__ = ["write_viewport_corpus", "bbox_cell_cover", "bbox_query"]


def write_viewport_corpus(points: DataFrame, table: str, path: str,
                          zoom: int = 6, id_col: str = "feature_id",
                          n_buckets: int = 16) -> None:
    """Persist ``(id, lon, lat, cell)`` bucketed+sorted by ``cell`` —
    the substrate every ``bbox_query`` probes.  Written once out-of-band
    at fleet scale; the gate overwrite-writes per call (idempotent,
    stale-catalog-safe — the knn_ring recipe)."""
    mx, my = mercator_xy(F.col("lon"), F.col("lat"))
    n = 1 << zoom
    cell = cell_encode(
        F.lit(zoom),
        F.least(F.floor(mx * n).cast("long"), F.lit(n - 1)),
        F.least(F.floor(my * n).cast("long"), F.lit(n - 1)))
    prepped = points.select(F.col(id_col), "lon", "lat",
                            cell.alias("cell"))
    write_bucketed(prepped, table, path, bucket_cols=("cell",),
                   n_buckets=n_buckets, sort_cols=("cell", id_col))


def _merc_xy(lon: float, lat: float) -> "tuple[float, float]":
    mx = (lon + 180.0) / 360.0
    latc = max(-MERCATOR_MAX_LAT, min(lat, MERCATOR_MAX_LAT))
    rad = math.radians(latc)
    my = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
          / math.pi) / 2.0
    return mx, my


def bbox_cell_cover(lon_lo: float, lon_hi: float, lat_lo: float,
                    lat_hi: float, zoom: int,
                    pad: int = 1) -> "list[int]":
    """Driver-side zoom-Z tile rectangle covering the bbox, padded by
    ``pad`` cells each side (clamped to the grid) — a small python
    list of packed cell ids for the IN-probe.  Mercator y DECREASES
    with latitude, so the y range comes from (lat_hi, lat_lo)."""
    n = 1 << zoom
    clamp = lambda v: max(0, min(v, n - 1))  # noqa: E731
    x0 = clamp(math.floor(_merc_xy(lon_lo, 0.0)[0] * n) - pad)
    x1 = clamp(math.floor(_merc_xy(lon_hi, 0.0)[0] * n) + pad)
    y0 = clamp(math.floor(_merc_xy(0.0, lat_hi)[1] * n) - pad)
    y1 = clamp(math.floor(_merc_xy(0.0, lat_lo)[1] * n) + pad)
    # python mirror of geo/tilemath.cell_encode's disjoint bit fields
    pack = lambda z, x, y: (z << 58) + (x << 29) + y  # noqa: E731
    return [pack(zoom, x, y)
            for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)]


def bbox_query(spark: SparkSession, table: str, lon_lo: float,
               lon_hi: float, lat_lo: float, lat_hi: float,
               zoom: int = 6,
               plan_log: "list | None" = None) -> DataFrame:
    """All corpus points inside the bbox: bucket-pruned cell-cover
    probe + exact lon/lat residual.  The result is eagerly
    ``localCheckpoint``-ed inside the planner pin (the
    _pinned_bucket_probe contract) — viewport results are small by
    definition; a job needing huge windows keeps the conf pinned for
    its whole run instead.  ``plan_log``, when a list, receives the
    probe's executed-plan string BEFORE the checkpoint erases it (the
    knn_ring test hook)."""
    cells = bbox_cell_cover(lon_lo, lon_hi, lat_lo, lat_hi, zoom)
    with _pinned_bucket_probe(spark):
        probe = (spark.table(table)
                 .filter(F.col("cell").isin(cells))
                 .filter((F.col("lon") >= F.lit(lon_lo))
                         & (F.col("lon") <= F.lit(lon_hi))
                         & (F.col("lat") >= F.lit(lat_lo))
                         & (F.col("lat") <= F.lit(lat_hi)))
                 .drop("cell"))
        if plan_log is not None:
            plan_log.append(
                probe._jdf.queryExecution().executedPlan().toString())
        hits = probe.localCheckpoint()
    return hits
