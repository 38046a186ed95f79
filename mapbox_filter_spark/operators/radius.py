"""Geodesic radius join: all corpus points within R meters of each query.

The planar cell-join trilogy (geohash_ring_count / knn_ring /
s2_covering_join) generates candidates by CELL adjacency; this operator
adds the metric REFINE step — great-circle distance (geo.geom
haversine_m, native trig, whole-stage codegen) — giving the
"points within R meters" primitive (geofencing, POI matching,
proximity alerts).

Coverage contract (documented, asserted): ring-``k`` candidate
generation is a SUPERSET of the R-ball only while every cell dimension
spans ≥ R/k meters.  Latitude cell height is constant
(180/2^b_lat · 111.2 km); longitude cell width shrinks by cos(lat), so
the guarantee holds for |lat| ≤ ``lat_max`` where
``cos(lat_max) · lon_span_m ≥ R/k``.  ``plan_radius_cells`` picks the
coarsest precision (fewest candidates) that satisfies both axes for the
caller's R and lat_max; queries beyond lat_max violate the contract and
must be handled by a coarser precision or a polar band scan (the same
escape hatch real cell indexes document — e.g. S2 cap coverings grow
their cell unions near the poles).

Scale shape: identical to the ring-count gate — probes (queries × ≤9
ring cells) broadcast; the corpus is touched via one cell equi join
(zero corpus shuffle) and the refine is a per-row native trig filter.
Haversine is float trig, so correctness here is pytest-differential
(brute-force cross-join equality), not a value-hash oracle — the rule
geo/geom.py already documents for the metric.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.geohash import geohash, geohash_ring_cells
from ..geo.geom import EARTH_RADIUS_M, haversine_m

_M_PER_DEG = math.pi * EARTH_RADIUS_M / 180.0  # ≈ 111.2 km


def plan_radius_cells(radius_m: float, lat_max: float = 60.0) -> int:
    """The coarsest geohash precision whose ring-1 neighborhood is a
    superset of the ``radius_m`` ball for every |lat| ≤ ``lat_max``."""
    for precision in range(12, 0, -1):
        nbits = 5 * precision
        b_lon, b_lat = (nbits + 1) // 2, nbits // 2
        lat_span_m = 180.0 / (1 << b_lat) * _M_PER_DEG
        lon_span_m = (360.0 / (1 << b_lon) * _M_PER_DEG
                      * math.cos(math.radians(lat_max)))
        if lat_span_m >= radius_m and lon_span_m >= radius_m:
            return precision
    raise ValueError(
        f"radius {radius_m} m exceeds the coarsest cell at |lat| <= "
        f"{lat_max}; use a polar band scan")


def radius_join(
    corpus: DataFrame,
    queries: DataFrame,
    radius_m: float,
    lat_max: float = 60.0,
    corpus_id: str = "point_id",
    query_id: str = "query_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(query_id, point_id, dist_m) for every corpus point within
    ``radius_m`` meters of a query point.  Queries with |lat| beyond
    ``lat_max`` raise (coverage contract above)."""
    precision = plan_radius_cells(radius_m, lat_max)
    q = queries.select(
        F.col(query_id),
        F.col(lon).alias("_qlon"), F.col(lat).alias("_qlat"),
        geohash(F.col(lon), F.col(lat), precision).alias("_qgh"))
    bad = q.filter(F.abs(F.col("_qlat")) > lat_max).limit(1).count()
    if bad:
        raise ValueError(f"query latitude beyond lat_max={lat_max}")
    probes = (q.select(query_id, "_qlon", "_qlat",
                       F.explode(geohash_ring_cells(F.col("_qgh"),
                                                    precision))
                       .alias("_cell"))
              .filter(F.col("_cell").isNotNull()))
    c = corpus.select(
        F.col(corpus_id),
        F.col(lon).alias("_clon"), F.col(lat).alias("_clat"),
        geohash(F.col(lon), F.col(lat), precision).alias("_cgh"))
    joined = c.join(F.broadcast(probes), c["_cgh"] == probes["_cell"])
    d = haversine_m(F.col("_qlon"), F.col("_qlat"),
                    F.col("_clon"), F.col("_clat"))
    return (joined.select(query_id, corpus_id, d.alias("dist_m"))
            .filter(F.col("dist_m") <= F.lit(float(radius_m))))
