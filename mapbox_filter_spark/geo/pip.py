"""Point-in-polygon join: cell-pruned broadcast join + vectorized PIP kernel.

Reference generalization mandated by BASELINE.json (north_star): the
reference has no PIP (its geometries are pre-tiled), so this is the graft's
raster/vector spatial-join surface.

Plan shape (the 100 TB story):
1. polygons -> bbox polyfill at a pruning zoom -> explode to (cell, poly)
   rows (small side; broadcast).
2. points -> same-zoom cell (pure Column math, no shuffle).
3. broadcast hash join on cell — candidate pairs only; the big side is never
   shuffled.
4. exact even-odd ray-cast test in an Arrow-batched pandas UDF (numpy inner
   loop per edge set; no per-row Python on the big side until candidates).

Boundary semantics: even-odd crossing; points exactly on an edge are
implementation-defined (documented; fixtures avoid exact-boundary points).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tilemath import cell_encode, polyfill_bbox, tile_cols


def _pip_kernel(poly_id: pd.Series, px: pd.Series, py: pd.Series,
                rlon: pd.Series, rlat: pd.Series) -> pd.Series:
    """Even-odd ray-cast, vectorized points x edges.

    After the cell-pruned join, a batch holds many points per polygon, so we
    group by poly_id and test ALL of a polygon's points against its edge
    arrays in one (P, E) numpy broadcast — no per-row Python.  Point chunks
    bound the (P, E) intermediate to ~32 MB for high-vertex polygons."""
    import numpy as np

    out = np.zeros(len(px), dtype=bool)
    pxv, pyv = px.to_numpy(dtype=float), py.to_numpy(dtype=float)
    codes, uniques = pd.factorize(poly_id)
    for g in range(len(uniques)):
        idx = np.nonzero(codes == g)[0]
        first = idx[0]
        lon = np.asarray(rlon.iloc[first], dtype=float)
        lat = np.asarray(rlat.iloc[first], dtype=float)
        if lon.size < 3:
            continue
        lx, ly = np.roll(lon, 1), np.roll(lat, 1)  # previous vertex
        dy = ly - lat
        chunk = max(1, (1 << 22) // lon.size)
        for s in range(0, idx.size, chunk):
            rows = idx[s:s + chunk]
            x0 = pxv[rows][:, None]
            y0 = pyv[rows][:, None]
            cond = (lat[None, :] > y0) != (ly[None, :] > y0)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (lx - lon)[None, :] * (y0 - lat[None, :]) / dy[None, :] \
                    + lon[None, :]
            out[rows] = (np.count_nonzero(cond & (x0 < xint), axis=1) % 2) \
                .astype(bool)
    return pd.Series(out)


pip_udf = F.pandas_udf(_pip_kernel, T.BooleanType())


def prepare_polygons(polys: DataFrame, zoom: int) -> DataFrame:
    """Polygon table -> exploded (cell, poly_id, ring_lon, ring_lat) cover.

    ``polys`` columns: poly_id + ring array<struct<lon:double,lat:double>>.
    """
    ring = F.col("ring")
    lon_arr = F.transform(ring, lambda p: p["lon"])
    lat_arr = F.transform(ring, lambda p: p["lat"])
    covered = polys.select(
        "poly_id",
        lon_arr.alias("ring_lon"),
        lat_arr.alias("ring_lat"),
        polyfill_bbox(
            F.array_min(lon_arr), F.array_min(lat_arr),
            F.array_max(lon_arr), F.array_max(lat_arr), zoom,
        ).alias("cells"),
    )
    return covered.select(
        "poly_id", "ring_lon", "ring_lat", F.explode("cells").alias("cell")
    )


def point_in_polygon_join(
    points: DataFrame,
    polys: DataFrame,
    zoom: int = 12,
    lon: str = "lon",
    lat: str = "lat",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to containing polygons.

    Returns ``points`` columns + ``poly_id``.  ``zoom`` trades candidate
    fan-out (coarse) vs broadcast size (fine); 12 gives ~10 km cells.
    """
    cover = prepare_polygons(polys, zoom)
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(zoom))
    pts = points.withColumn("__cell", cell_encode(F.lit(zoom), x, y))
    cand = pts.join(F.broadcast(cover), pts["__cell"] == cover["cell"], how)
    hit = cand.filter(
        pip_udf(F.col("poly_id"), F.col(lon), F.col(lat),
                F.col("ring_lon"), F.col("ring_lat"))
    )
    return hit.drop("__cell", "cell", "ring_lon", "ring_lat")
