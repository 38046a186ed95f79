"""Gate query for the polygon-analytics block (geo/geom.py).

Substrate: deterministic 8-vertex star polygons in integer micro-degrees
derived from ``part`` — center from the same affine grid the PIP rects
use, per-vertex radii varied by a partkey hash, vertices on the 8 compass
directions in CCW order (strictly increasing angle ⇒ simple polygons,
positive shoelace area).

Every output is either exact integer arithmetic (area2, bbox) or a
pinned-order IEEE fold (centroid division, perimeter) — the DuckDB oracle
reproduces each value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo.geom import (
    polygon_bbox,
    polygon_centroid,
    ring_perimeter,
    shoelace_area2,
)

# CCW compass directions (angles 0,45,...,315 degrees)
_DIRS = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
_N_POLY = 200


def _star_verts() -> F.Column:
    """array<struct<x:long,y:long>> star polygon for the current part row."""
    pk = F.col("p_partkey")
    cx = ((pk * 7013) % 340 - 170) * 1_000_000 + 500
    cy = ((pk * 3571) % 150 - 75) * 1_000_000 + 500
    dxs = F.array(*[F.lit(d[0]).cast("long") for d in _DIRS])
    dys = F.array(*[F.lit(d[1]).cast("long") for d in _DIRS])
    return F.transform(
        F.sequence(F.lit(0), F.lit(len(_DIRS) - 1)),
        lambda i: F.struct(
            (cx + F.element_at(dxs, (i + 1).cast("int"))
             * (1000 + ((pk * 31 + i * 17) % 13) * 500)).alias("x"),
            (cy + F.element_at(dys, (i + 1).cast("int"))
             * (1000 + ((pk * 31 + i * 17) % 13) * 500)).alias("y"),
        ),
    )


def q_geom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _N_POLY))
    df = part.select(F.col("p_partkey").alias("poly_id"),
                     _star_verts().alias("verts"))
    v = F.col("verts")
    cx, cy = polygon_centroid(v)
    minx, miny, maxx, maxy = polygon_bbox(v)
    return df.select(
        "poly_id",
        F.size(v).cast("long").alias("n_verts"),
        shoelace_area2(v).alias("area2"),
        cx.alias("cx"), cy.alias("cy"),
        ring_perimeter(v).alias("perimeter"),
        minx.alias("minx"), miny.alias("miny"),
        maxx.alias("maxx"), maxy.alias("maxy"),
    )


def sql_geom_stats() -> str:
    dirs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate(_DIRS))
    return f"""
WITH dirs(i, dx, dy) AS (VALUES {dirs}),
verts AS (
  SELECT p_partkey AS poly_id, d.i,
         ((p_partkey*7013) % 340 - 170) * 1000000 + 500
           + d.dx * (1000 + ((p_partkey*31 + d.i*17) % 13) * 500) AS vx,
         ((p_partkey*3571) % 150 - 75) * 1000000 + 500
           + d.dy * (1000 + ((p_partkey*31 + d.i*17) % 13) * 500) AS vy
  FROM part, dirs d WHERE p_partkey <= {_N_POLY}
),
edges AS (
  SELECT poly_id, i, vx, vy,
         first_value(vx) OVER w AS x0, first_value(vy) OVER w AS y0,
         COALESCE(lead(vx) OVER w, first_value(vx) OVER w) AS nx,
         COALESCE(lead(vy) OVER w, first_value(vy) OVER w) AS ny
  FROM verts
  WINDOW w AS (PARTITION BY poly_id ORDER BY i)
),
agg AS (
  SELECT poly_id,
         COUNT(*) AS n_verts,
         CAST(SUM(vx*ny - nx*vy) AS BIGINT) AS area2,
         CAST(SUM(((vx-x0)+(nx-x0))
                  * ((vx-x0)*(ny-y0) - (nx-x0)*(vy-y0))) AS BIGINT) AS cxn,
         CAST(SUM(((vy-y0)+(ny-y0))
                  * ((vx-x0)*(ny-y0) - (nx-x0)*(vy-y0))) AS BIGINT) AS cyn,
         MIN(x0) AS x0, MIN(y0) AS y0,
         MIN(vx) AS minx, MIN(vy) AS miny,
         MAX(vx) AS maxx, MAX(vy) AS maxy,
         list_reduce(
           list(sqrt(CAST((nx-vx)*(nx-vx) + (ny-vy)*(ny-vy) AS DOUBLE))
                ORDER BY i),
           (a, b) -> a + b) AS perimeter
  FROM edges GROUP BY poly_id
)
SELECT poly_id, n_verts, area2,
       CAST(cxn AS DOUBLE) / CAST(3*area2 AS DOUBLE)
         + CAST(x0 AS DOUBLE) AS cx,
       CAST(cyn AS DOUBLE) / CAST(3*area2 AS DOUBLE)
         + CAST(y0 AS DOUBLE) AS cy,
       perimeter, minx, miny, maxx, maxy
FROM agg"""


GEOM_QUERIES = {
    "geom_stats": (q_geom_stats, sql_geom_stats),
}
