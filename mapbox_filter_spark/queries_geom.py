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

from pyspark.sql import DataFrame, SparkSession, Window
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


_RDP_N = 16      # vertices per polyline
_RDP_EPS = 10    # tolerance (integer grid units); decision uses eps^2 * L^2
_RDP_LINES = 120


def _wiggly_verts() -> F.Column:
    """16-vertex polyline: x strictly increasing (so chords never
    degenerate), small y noise (< eps, simplified away) plus one big
    spike per line (kept) — non-vacuous in both directions."""
    pk = F.col("p_partkey")
    return F.transform(
        F.sequence(F.lit(0), F.lit(_RDP_N - 1)),
        lambda i: F.struct(
            (i.cast("long") * 256).alias("x"),
            ((pk * 37 + i * 13) % 7
             + F.when(i == pk % _RDP_N, F.lit(1000)).otherwise(F.lit(0)))
            .cast("long").alias("y"),
        ),
    )


def q_rdp_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .geo.simplify import simplify_rdp

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RDP_LINES))
    lines = part.select(F.col("p_partkey").alias("line_id"),
                        _wiggly_verts().alias("verts"))
    kept = lines.select(
        "line_id", F.explode(simplify_rdp(F.col("verts"), _RDP_EPS))
        .alias("v"))
    return kept.select("line_id", F.col("v.i").alias("i"),
                       F.col("v.x").alias("x"), F.col("v.y").alias("y"))


def sql_rdp_simplify() -> str:
    e2 = _RDP_EPS * _RDP_EPS
    cross = ("((z.x-a.x)*(p.y-a.y) - (p.x-a.x)*(z.y-a.y))"
             " * ((z.x-a.x)*(p.y-a.y) - (p.x-a.x)*(z.y-a.y))")
    l2 = "((z.x-a.x)*(z.x-a.x) + (z.y-a.y)*(z.y-a.y))"
    return f"""
WITH RECURSIVE
pts AS (
  SELECT p_partkey AS line_id, CAST(t.i AS BIGINT) AS i,
         CAST(t.i * 256 AS BIGINT) AS x,
         CAST((p_partkey*37 + t.i*13) % 7
              + CASE WHEN t.i = p_partkey % {_RDP_N} THEN 1000 ELSE 0 END
              AS BIGINT) AS y
  FROM part, LATERAL (SELECT unnest(range({_RDP_N})) AS i) t
  WHERE p_partkey <= {_RDP_LINES}
),
seg(line_id, i0, i1) AS (
  SELECT line_id, CAST(0 AS BIGINT), CAST({_RDP_N - 1} AS BIGINT)
  FROM (SELECT DISTINCT line_id FROM pts)
  UNION ALL
  SELECT b.line_id,
         CASE WHEN sd.s = 0 THEN b.i0 ELSE b.jmax END,
         CASE WHEN sd.s = 0 THEN b.jmax ELSE b.i1 END
  FROM (
    SELECT line_id, i0, i1, jmax FROM (
      SELECT s.line_id, s.i0, s.i1, p.i AS jmax,
             {cross} AS m, {l2} AS lsq,
             ROW_NUMBER() OVER (PARTITION BY s.line_id, s.i0, s.i1
                                ORDER BY {cross} DESC, p.i ASC) AS rn
      FROM seg s
      JOIN pts a ON a.line_id = s.line_id AND a.i = s.i0
      JOIN pts z ON z.line_id = s.line_id AND z.i = s.i1
      JOIN pts p ON p.line_id = s.line_id AND p.i > s.i0 AND p.i < s.i1
    ) WHERE rn = 1 AND m > {e2} * lsq
  ) b, (VALUES (0), (1)) sd(s)
),
final AS (
  SELECT s.line_id, s.i0, s.i1 FROM seg s
  WHERE s.i1 - s.i0 <= 1 OR NOT EXISTS (
    SELECT 1 FROM pts a, pts z, pts p
    WHERE a.line_id = s.line_id AND a.i = s.i0
      AND z.line_id = s.line_id AND z.i = s.i1
      AND p.line_id = s.line_id AND p.i > s.i0 AND p.i < s.i1
      AND {cross} > {e2} * {l2}
  )
),
kept AS (
  -- NOTE: a top-level UNION here would be parsed as a RECURSIVE CTE
  -- body (this is under WITH RECURSIVE) and duplicates leak through;
  -- nest the UNION ALL and deduplicate explicitly instead.
  SELECT DISTINCT line_id, i FROM (
    SELECT line_id, i0 AS i FROM final
    UNION ALL
    SELECT line_id, i1 AS i FROM final)
)
SELECT k.line_id, CAST(k.i AS INT) AS i, p.x, p.y
FROM kept k JOIN pts p ON p.line_id = k.line_id AND p.i = k.i"""


def q_geohash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell keys for every feature, at two precisions.

    ``gh8`` (~19 m cells) and ``gh4`` (~20 km) are encoded INDEPENDENTLY
    by the closed-form Morton pipeline (geo/geohash.py), while the oracle
    derives ``gh4`` as ``SUBSTR(gh8, 1, 4)`` — so a value-hash match also
    proves the prefix-containment property (truncation = coarser cell)
    cross-engine, which is what makes string-prefix pruning on
    geohash-clustered layouts sound.
    """
    from .geo.geohash import geohash
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    return feats.select(
        "feature_id",
        geohash(F.col("lon"), F.col("lat"), 8).alias("gh8"),
        geohash(F.col("lon"), F.col("lat"), 4).alias("gh4"),
    )


def sql_geohash_assign() -> str:
    from .geo.geohash import sql_geohash_select
    from .sources.features import FEATURES_ORACLE_SQL

    src = (f"WITH {FEATURES_ORACLE_SQL} "
           "SELECT feature_id, lon, lat FROM features")
    inner = sql_geohash_select(src, ["feature_id"], "lon", "lat",
                               precision=8, out="gh8")
    return (f"SELECT feature_id, gh8, SUBSTR(gh8, 1, 4) AS gh4 "
            f"FROM ({inner})")


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial continuous aggregate (operators/assemble.py
    tile_pyramid_rollup): z=10 counts aggregated once, z=7 derived from
    the persisted partial via the exact parent map — while the oracle
    computes BOTH zooms directly from lon/lat, so the value-hash match
    proves the quantizer nests exactly under the parent division."""
    from .operators.assemble import tile_pyramid_rollup
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    return tile_pyramid_rollup(feats, 10, [7])


def sql_tile_pyramid() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    return f"""WITH {FEATURES_ORACLE_SQL}
SELECT 10 AS z, {_sql_tile_x(10)} AS x, {_sql_tile_y(10)} AS y,
       COUNT(*) AS n
FROM features GROUP BY 1, 2, 3
UNION ALL
SELECT 7 AS z, {_sql_tile_x(7)} AS x, {_sql_tile_y(7)} AS y,
       COUNT(*) AS n
FROM features GROUP BY 1, 2, 3"""


# precision 3 = 15 bits: b_lon=8 (256 cols), b_lat=7 (128 rows) — 32768
# cells for ~60k features at sf0.01 keeps ~2 features/cell, so ring
# counts are dominated by CROSS-CELL matches (a finer grid would leave
# every query alone in its block and the neighbor stepping untested)
_RING_PREC = 3
_RING_QMOD = 997      # feature_id % 997 == 0 -> ~60 query points at sf0.01


def q_geohash_ring_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-radius neighbor search as a cell-ring equi join.

    Each query point's 3×3 geohash block is generated NATIVELY by the
    Morton masked-add neighbor (geo/geohash.py geohash_neighbor — four
    int64 ops per step, no decode round trip), exploded, and
    broadcast-joined against the full feature corpus on cell-string
    equality — the corpus never shuffles and the probe side is ~540
    rows.  The oracle never touches geohash strings: it defines
    adjacency directly in integer coordinate space (Chebyshev distance
    ≤ 1, longitude wrapped mod 2^13, latitude pole-clipped by range), so
    the value-hash match proves the bit-trick stepping IS the
    coordinate-space neighborhood, including antimeridian wrap and pole
    clip.  Reference parity: mapbox-filter has no neighbor search; this
    is graft-mandated spatial-join surface (SURVEY §2.4).
    """
    from .geo.geohash import geohash, geohash_ring_cells
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        "feature_id",
        geohash(F.col("lon"), F.col("lat"), _RING_PREC).alias("gh"))
    queries = (feats.filter(F.col("feature_id") % _RING_QMOD == 0)
               .select(F.col("feature_id").alias("query_id"), "gh"))
    probes = (queries
              .select("query_id",
                      F.explode(geohash_ring_cells(F.col("gh"), _RING_PREC))
                      .alias("cell"))
              .filter(F.col("cell").isNotNull()))
    joined = feats.join(F.broadcast(probes), feats["gh"] == probes["cell"])
    return (joined.groupBy("query_id")
            .agg(F.count("*").alias("n_in_ring"),
                 F.sum("feature_id").alias("sum_fid")))


def sql_geohash_ring_count() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    b_lon = (5 * _RING_PREC + 1) // 2
    b_lat = 5 * _RING_PREC // 2
    w_lon, w_lat = 1 << b_lon, 1 << b_lat

    def axis(expr, lo, span, w):
        # identical IEEE op order to geohash.py _axis_bits
        return (f"LEAST(GREATEST(CAST(FLOOR((({expr}) - ({lo})) / {span} "
                f"* {float(w)}) AS BIGINT), 0), {w - 1})")

    return f"""WITH {FEATURES_ORACLE_SQL},
cells AS (
  SELECT feature_id,
         {axis('lon', '-180.0', '360.0', w_lon)} AS lon_i,
         {axis('lat', '-90.0', '180.0', w_lat)} AS lat_i
  FROM features
)
SELECT q.feature_id AS query_id,
       COUNT(*) AS n_in_ring,
       CAST(SUM(f.feature_id) AS BIGINT) AS sum_fid
FROM cells q JOIN cells f
  ON f.lat_i BETWEEN q.lat_i - 1 AND q.lat_i + 1
 AND ((f.lon_i - q.lon_i + {w_lon}) % {w_lon}) IN (0, 1, {w_lon - 1})
WHERE q.feature_id % {_RING_QMOD} = 0
GROUP BY q.feature_id"""


_TRAJ_JUMP = 1000          # per-axis jump range (micro-degrees)
_TRAJ_DWELL2 = 500_000     # squared step threshold for stay-point runs


def _sql_walk_pos() -> str:
    """The integer-random-walk position CTE shared by every
    trajectory-family oracle (mirror of
    operators/trajectory.py random_walk_positions)."""
    m = 2 * _TRAJ_JUMP + 1
    return f"""pos AS (
  SELECT user_id, ts, event_id,
         CAST(SUM((event_id * 7919) % {m} - {_TRAJ_JUMP}) OVER w AS BIGINT) AS x,
         CAST(SUM((event_id * 104729) % {m} - {_TRAJ_JUMP}) OVER w AS BIGINT) AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


def q_traj_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory profile (operators/trajectory.py) over a
    deterministic integer random walk derived from events: path length
    as a pinned-order IEEE fold of exact integer step norms, exact
    bbox/net-displacement/max-step, and gaps-and-islands stay-point runs
    — ordering window, lag window, and final groupBy all share the
    user_id key, so the whole profile is ONE shuffle."""
    from .operators.trajectory import random_walk_positions, trajectory_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return trajectory_stats(pos, dwell_step2=_TRAJ_DWELL2)


def sql_traj_stats() -> str:
    m = 2 * _TRAJ_JUMP + 1
    t = _TRAJ_DWELL2
    return f"""WITH {_sql_walk_pos()},
st AS (
  SELECT user_id, x, y,
         ROW_NUMBER() OVER w2 AS rn,
         x - lag(x) OVER w2 AS dx,
         y - lag(y) OVER w2 AS dy
  FROM pos
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
st2 AS (
  SELECT user_id, rn, x, y, dx, dy, dx*dx + dy*dy AS step2,
         lag(dx*dx + dy*dy) OVER (PARTITION BY user_id ORDER BY rn) AS prev2
  FROM st
)
SELECT user_id,
       COUNT(*) AS n_pts,
       CASE WHEN COUNT(*) <= 1 THEN CAST(0.0 AS DOUBLE)
            ELSE list_reduce(list(sqrt(CAST(step2 AS DOUBLE)) ORDER BY rn)
                               FILTER (rn > 1),
                             (a, b) -> a + b) END AS path_len,
       CAST(MAX(step2) AS BIGINT) AS max_step2,
       CAST(SUM(dx) AS BIGINT) AS net_dx,
       CAST(SUM(dy) AS BIGINT) AS net_dy,
       MIN(x) AS minx, MIN(y) AS miny, MAX(x) AS maxx, MAX(y) AS maxy,
       CAST(SUM(CASE WHEN step2 <= {t} AND (prev2 IS NULL OR prev2 > {t})
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dwells
FROM st2 GROUP BY user_id"""


def q_heatmap_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel-density heatmap (operators/assemble.py heatmap_tiles):
    3×3 integer splat per feature at z=8, antimeridian-wrapped and
    pole-clipped; exact integer heat, one shuffle."""
    from .operators.assemble import heatmap_tiles
    from .sources.features import features_from_lineitem

    return heatmap_tiles(features_from_lineitem(spark, sf_dir), 8)


def sql_heatmap_tiles() -> str:
    from .operators.assemble import _HEAT_KERNEL
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    z, n = 8, 1 << 8
    vals = ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in _HEAT_KERNEL)
    return f"""WITH {FEATURES_ORACLE_SQL},
t AS (SELECT {_sql_tile_x(z)} AS x, {_sql_tile_y(z)} AS y FROM features),
kern(dx, dy, w) AS (VALUES {vals})
SELECT {z} AS z, (t.x + kern.dx + {n}) % {n} AS x, t.y + kern.dy AS y,
       CAST(SUM(kern.w) AS BIGINT) AS heat
FROM t CROSS JOIN kern
WHERE t.y + kern.dy BETWEEN 0 AND {n - 1}
GROUP BY 2, 3"""


_OD_Z = 4


def _sql_od_flow_ctes() -> str:
    """Shared oracle CTE chain for the hashed-position OD flow matrix
    (pos -> z-tiles -> lag hops -> flows ``f``) — used by the od_flows
    and gravity_decay gates."""
    from .queries import _sql_tile_x, _sql_tile_y

    z = _OD_Z
    return f"""pos AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 360000) / 1000.0 - 180.0 AS lon,
         ((event_id * 104729) % 170000) / 1000.0 - 85.0 AS lat
  FROM events
),
t AS (
  SELECT user_id, ts, event_id,
         {_sql_tile_x(z)} AS tx, {_sql_tile_y(z)} AS ty
  FROM pos
),
h AS (
  SELECT lag(tx) OVER w AS fx, lag(ty) OVER w AS fy, tx, ty
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
f AS (
  SELECT fx, fy, tx, ty, COUNT(*) AS n_hops
  FROM h WHERE fx IS NOT NULL
  GROUP BY 1, 2, 3, 4
)"""


def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin→destination tile-flow matrix (operators/trajectory.py
    od_flows): per-user consecutive events become directed z=4 tile
    transitions, counted globally.  Positions are a deterministic hash
    of event_id (the features-table formula), so both engines quantize
    identical doubles."""
    from .operators.trajectory import od_flows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = ev.select(
        "user_id", "ts", "event_id",
        (((F.col("event_id") * 7919) % 360000) / 1000.0 - 180.0)
        .alias("lon"),
        (((F.col("event_id") * 104729) % 170000) / 1000.0 - 85.0)
        .alias("lat"))
    return od_flows(pos, _OD_Z)


def sql_od_flows() -> str:
    return (f"WITH {_sql_od_flow_ctes()}\n"
            f"SELECT {_OD_Z} AS z, fx, fy, tx, ty, n_hops FROM f")


def q_st_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-time cube (operators/assemble.py st_cube): (z6 tile, day)
    counts from one scan of events; (z4 tile, week) re-aggregated from
    the persisted partial — while the oracle computes BOTH grains
    directly from lon/lat/ts, so the value-hash match proves the
    two-dimensional partial re-aggregation is exact."""
    from .operators.assemble import st_cube

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = ev.select(
        (((F.col("event_id") * 7919) % 360000) / 1000.0 - 180.0)
        .alias("lon"),
        (((F.col("event_id") * 104729) % 170000) / 1000.0 - 85.0)
        .alias("lat"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    return st_cube(pos, z_fine=6, z_coarse=4)


def sql_st_cube() -> str:
    from .queries import _sql_tile_x, _sql_tile_y

    day_us = 86_400_000_000
    return f"""WITH pos AS (
  SELECT ((event_id * 7919) % 360000) / 1000.0 - 180.0 AS lon,
         ((event_id * 104729) % 170000) / 1000.0 - 85.0 AS lat,
         epoch_us(ts) AS ts_us
  FROM events
)
SELECT 'day' AS grain, 6 AS z, {_sql_tile_x(6)} AS x, {_sql_tile_y(6)} AS y,
       ts_us // {day_us} AS t, COUNT(*) AS n
FROM pos GROUP BY 3, 4, 5
UNION ALL
SELECT 'week' AS grain, 4 AS z, {_sql_tile_x(4)} AS x, {_sql_tile_y(4)} AS y,
       ts_us // {day_us * 7} AS t, COUNT(*) AS n
FROM pos GROUP BY 3, 4, 5"""


def q_idw_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted interpolation at cell centers: each
    query cell's value is Σwᵢvᵢ/Σwᵢ over the features in its 3×3
    geohash block, w = 1/(1+d²) in degree space.  Candidates come from
    the Morton ring join (zero corpus shuffle, broadcast probes); both
    weight folds run in feature_id order so every double is
    bit-reproducible (exact coordinate deltas → IEEE mul/div/ln-free
    chain → pinned-association sums).  The classic scattered-field →
    raster-grid operator (spatial analytics tier)."""
    from .geo.geohash import geohash, geohash_ring_cells
    from .sources.features import features_from_lineitem

    prec = _RING_PREC
    nbits = 5 * prec
    b_lon, b_lat = (nbits + 1) // 2, nbits // 2
    step_lon, step_lat = 360.0 / (1 << b_lon), 180.0 / (1 << b_lat)

    feats = features_from_lineitem(spark, sf_dir).select(
        "feature_id", "lon", "lat",
        (F.col("feature_id") % 97).cast("double").alias("v"),
        geohash(F.col("lon"), F.col("lat"), prec).alias("gh"))
    lon_i = F.floor((F.col("lon") + 180.0) / 360.0 * (1 << b_lon))
    lat_i = F.floor((F.col("lat") + 90.0) / 180.0 * (1 << b_lat))
    queries = (feats.filter(F.col("feature_id") % _RING_QMOD == 0)
               .select(F.col("feature_id").alias("query_id"), "gh",
                       (F.lit(-180.0) + (lon_i.cast("double") + 0.5)
                        * step_lon).alias("cx"),
                       (F.lit(-90.0) + (lat_i.cast("double") + 0.5)
                        * step_lat).alias("cy")))
    probes = (queries.select(
        "query_id", "cx", "cy",
        F.explode(geohash_ring_cells(F.col("gh"), prec)).alias("cell"))
        .filter(F.col("cell").isNotNull()))
    j = feats.join(F.broadcast(probes), feats["gh"] == probes["cell"])
    dx = F.col("lon") - F.col("cx")
    dy = F.col("lat") - F.col("cy")
    w = F.lit(1.0) / (F.lit(1.0) + (dx * dx + dy * dy))
    entries = F.collect_list(F.struct(
        F.col("feature_id"), w.alias("w"), (w * F.col("v")).alias("wv")))
    sorted_e = F.sort_array(entries)
    sum_w = F.aggregate(sorted_e, F.lit(0.0), lambda a, e: a + e["w"])
    sum_wv = F.aggregate(sorted_e, F.lit(0.0), lambda a, e: a + e["wv"])
    return (j.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_src"),
                 sum_w.alias("sum_w"), sum_wv.alias("sum_wv"))
            .withColumn("idw", F.col("sum_wv") / F.col("sum_w")))


def sql_idw_interpolate() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    prec = _RING_PREC
    nbits = 5 * prec
    b_lon, b_lat = (nbits + 1) // 2, nbits // 2
    w_lon, w_lat = 1 << b_lon, 1 << b_lat
    step_lon, step_lat = 360.0 / w_lon, 180.0 / w_lat
    return f"""WITH {FEATURES_ORACLE_SQL},
cells AS (
  SELECT feature_id, lon, lat,
         CAST(feature_id % 97 AS DOUBLE) AS v,
         LEAST(GREATEST(CAST(FLOOR((lon - (-180.0)) / 360.0 * {float(w_lon)})
               AS BIGINT), 0), {w_lon - 1}) AS lon_i,
         LEAST(GREATEST(CAST(FLOOR((lat - (-90.0)) / 180.0 * {float(w_lat)})
               AS BIGINT), 0), {w_lat - 1}) AS lat_i
  FROM features
),
q AS (
  SELECT feature_id AS query_id, lon_i, lat_i,
         CAST(-180.0 AS DOUBLE)
           + (FLOOR((lon - (-180.0)) / 360.0 * {float(w_lon)}) + 0.5)
           * {step_lon!r} AS cx,
         CAST(-90.0 AS DOUBLE)
           + (FLOOR((lat - (-90.0)) / 180.0 * {float(w_lat)}) + 0.5)
           * {step_lat!r} AS cy
  FROM cells WHERE feature_id % {_RING_QMOD} = 0
),
pairs AS (
  SELECT q.query_id, f.feature_id, q.cx, q.cy,
         1.0 / (1.0 + ((f.lon - q.cx) * (f.lon - q.cx)
                       + (f.lat - q.cy) * (f.lat - q.cy))) AS w,
         (1.0 / (1.0 + ((f.lon - q.cx) * (f.lon - q.cx)
                        + (f.lat - q.cy) * (f.lat - q.cy)))) * f.v AS wv
  FROM q JOIN cells f
    ON f.lat_i BETWEEN q.lat_i - 1 AND q.lat_i + 1
   AND ((f.lon_i - q.lon_i + {w_lon}) % {w_lon}) IN (0, 1, {w_lon - 1})
)
SELECT query_id, COUNT(*) AS n_src,
       list_reduce(list(w ORDER BY feature_id), (a, b) -> a + b) AS sum_w,
       list_reduce(list(wv ORDER BY feature_id), (a, b) -> a + b) AS sum_wv,
       list_reduce(list(wv ORDER BY feature_id), (a, b) -> a + b)
         / list_reduce(list(w ORDER BY feature_id), (a, b) -> a + b) AS idw
FROM pairs GROUP BY query_id"""


def q_trending_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trending tiles (operators/assemble.py decayed_tile_scores):
    half-life-decayed event hotness with EXACT integer dyadic weights
    (2^(40−half_lives), order-free sums) — the TakeOrderedAndProject
    top-k is the scale path; ranks assigned over the 20 survivors."""
    from pyspark.sql import Window

    from .operators.assemble import decayed_tile_scores

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = ev.select(
        (((F.col("event_id") * 7919) % 360000) / 1000.0 - 180.0)
        .alias("lon"),
        (((F.col("event_id") * 104729) % 170000) / 1000.0 - 85.0)
        .alias("lat"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    scores = decayed_tile_scores(pos, z=6)
    top = (scores.orderBy(F.col("score").desc(), "x", "y").limit(20))
    w = Window.orderBy(F.col("score").desc(), "x", "y")
    return top.withColumn("rank", F.row_number().over(w)) \
              .select("rank", "z", "x", "y", "n_events", "score")


def sql_trending_tiles() -> str:
    from .queries import _sql_tile_x, _sql_tile_y

    day_us = 86_400_000_000
    return f"""WITH pos AS (
  SELECT ((event_id * 7919) % 360000) / 1000.0 - 180.0 AS lon,
         ((event_id * 104729) % 170000) / 1000.0 - 85.0 AS lat,
         epoch_us(ts) // {day_us} AS day
  FROM events
),
t AS (SELECT {_sql_tile_x(6)} AS x, {_sql_tile_y(6)} AS y, day FROM pos),
ref AS (SELECT MAX(day) AS t_ref FROM t),
scored AS (
  SELECT x, y, COUNT(*) AS n_events,
         CAST(SUM(1::BIGINT << CAST(40 - LEAST((ref.t_ref - day) // 7, 40)
                                    AS INT)) AS BIGINT) AS score
  FROM t, ref GROUP BY x, y
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, x, y) AS INT) AS rank,
       6 AS z, x, y, n_events, score
FROM scored
ORDER BY score DESC, x, y LIMIT 20"""


def q_polyfill_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon→tile covering (geo/tilemath.py polyfill_bbox): each
    rectangle's bbox — derived generically from its ring via array
    min/max — polyfills to z=6 cells (native sequence×sequence cross,
    the H3-polyfill analogue), decoded back to (x, y) via cell_decode.
    Arbitrary polygons bbox-polyfill then refine with the PIP kernel
    (pip_join); this gate pins the covering itself."""
    from .geo.tilemath import cell_decode, polyfill_bbox
    from .queries_ext import _rect_polys

    polys = _rect_polys(spark, sf_dir)
    r = F.col("ring")
    cells = polyfill_bbox(
        F.array_min(F.transform(r, lambda p: p["lon"])),
        F.array_min(F.transform(r, lambda p: p["lat"])),
        F.array_max(F.transform(r, lambda p: p["lon"])),
        F.array_max(F.transform(r, lambda p: p["lat"])),
        6)
    e = polys.select("poly_id", F.explode(cells).alias("cell"))
    z, x, y = cell_decode(F.col("cell"))
    return e.select("poly_id", x.alias("x"), y.alias("y"))


def sql_polyfill_cover() -> str:
    from .queries import _sql_tile_x, _sql_tile_y

    tx = _sql_tile_x(6)
    ty = _sql_tile_y(6)
    return f"""WITH polys AS (
  SELECT CAST(p_partkey AS VARCHAR) AS poly_id,
         (p_partkey * 7013) % 340 - 170 + 0.0005 AS x0,
         (p_partkey * 3571) % 150 - 75 + 0.0005 AS y0,
         (p_partkey * 37) % 20 + 2 AS w,
         (p_partkey * 53) % 14 + 2 AS h
  FROM part WHERE p_partkey <= 30
),
spans AS (
  SELECT poly_id,
         {tx.replace("lon", "(x0)")} AS tx0,
         {tx.replace("lon", "(x0 + w)")} AS tx1,
         {ty.replace("lat", "(y0 + h)")} AS ty0,
         {ty.replace("lat", "(y0)")} AS ty1
  FROM polys
)
SELECT poly_id, gx.x, gy.y
FROM spans,
     LATERAL (SELECT unnest(range(tx0, tx1 + 1)) AS x) gx,
     LATERAL (SELECT unnest(range(ty0, ty1 + 1)) AS y) gy"""


_TRIP_BREAK2 = 1_000_000


def q_trip_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trip segmentation (operators/trajectory.py trip_segments): the
    random walk splits where a squared step exceeds 1e6 µdeg²; per-trip
    point count, pinned-fold path length, max in-trip step, and
    endpoint coordinates — all on ONE entity-key shuffle."""
    from .operators.trajectory import random_walk_positions, trip_segments

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return trip_segments(pos, _TRIP_BREAK2)


def sql_trip_segments() -> str:
    m = 2 * _TRAJ_JUMP + 1
    t = _TRIP_BREAK2
    return f"""WITH {_sql_walk_pos()},
st AS (
  SELECT user_id, x, y,
         ROW_NUMBER() OVER w2 AS rn,
         (x - lag(x) OVER w2) * (x - lag(x) OVER w2)
           + (y - lag(y) OVER w2) * (y - lag(y) OVER w2) AS step2
  FROM pos
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tr AS (
  SELECT user_id, x, y, rn, step2,
         CASE WHEN step2 IS NULL OR step2 > {t} THEN 1 ELSE 0 END AS brk,
         CAST(SUM(CASE WHEN step2 IS NULL OR step2 > {t} THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS trip_id
  FROM st
)
SELECT user_id, trip_id, COUNT(*) AS n_pts,
       CASE WHEN COUNT(*) FILTER (brk = 0) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE list_reduce(list(sqrt(CAST(step2 AS DOUBLE)) ORDER BY rn)
                               FILTER (brk = 0), (a, b) -> a + b) END
         AS path_len,
       CAST(MAX(CASE WHEN brk = 0 THEN step2 END) AS BIGINT) AS max_step2,
       arg_min(x, rn) AS start_x, arg_min(y, rn) AS start_y,
       arg_max(x, rn) AS end_x, arg_max(y, rn) AS end_y
FROM tr GROUP BY user_id, trip_id"""


_RJ_QMOD = 43
_RJ_RADIUS = 6000


def q_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planar radius join (operators/cluster.py grid_radius_join): ALL
    in-range corpus points per query via ONE cell equi-join, exact
    integer d² refine — full value-hash against the brute oracle
    (VERDICT r4 item 5: the same exact-integer recipe as
    knn_join/geofence_flag).  The geodesic form (haversine refine,
    libm trig) is the separate rows-only ``radius_join_geo`` gate plus
    the brute-force differential in tests/test_radius.py."""
    from .operators.cluster import grid_radius_join
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.select(F.col("feature_id").alias("id"),
                        F.pmod(F.col("feature_id") * 6007,
                               F.lit(400000)).alias("x"),
                        F.pmod(F.col("feature_id") * 9973,
                               F.lit(200000)).alias("y"))
           .distinct())
    qs = (pts.filter(F.col("id") % _RJ_QMOD == 0)
          .withColumnRenamed("id", "query_id"))
    cs = pts.withColumnRenamed("id", "point_id")
    return grid_radius_join(qs, cs, _RJ_RADIUS)


def sql_radius_join() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    r2 = _RJ_RADIUS * _RJ_RADIUS
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (SELECT DISTINCT feature_id AS id,
        (feature_id*6007)%400000 AS x, (feature_id*9973)%200000 AS y
        FROM features)
SELECT q.id AS query_id, c.id AS point_id,
       (q.x-c.x)*(q.x-c.x) + (q.y-c.y)*(q.y-c.y) AS d2
FROM pts q JOIN pts c
  ON (q.x-c.x)*(q.x-c.x) + (q.y-c.y)*(q.y-c.y) <= {r2}
WHERE q.id % {_RJ_QMOD} = 0"""


def q_radius_join_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic radius join (operators/radius.py): every feature within
    75 km of each query point.  ROWS-ONLY gate by design: the refine is
    libm trig (haversine) whose final ulps differ across engines, so
    boundary membership can't be value-hashed (geo/geom.py documents
    the rule); correctness is the brute-force differential equality in
    tests/test_radius.py."""
    from .operators.radius import radius_join
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.col("feature_id").alias("point_id"), "lon", "lat")
    queries = (feats.filter((F.col("point_id") % 997 == 0)
                            & (F.abs(F.col("lat")) <= 55.0))
               .select(F.col("point_id").alias("query_id"), "lon", "lat"))
    return radius_join(feats, queries, 75_000.0, lat_max=60.0)


def q_line_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midpoint-along-length of each RDP polyline (geo/geom.py
    line_point_at): in-row pinned-fold cumulative lengths select the
    crossing segment and lerp — the oracle replays the same left-fold
    association through ordered window sums, so seg index and
    interpolated doubles match bit-for-bit."""
    from .geo.geom import line_point_at

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RDP_LINES))
    lines = part.select(F.col("p_partkey").alias("line_id"),
                        _wiggly_verts().alias("verts"))
    p = line_point_at(F.col("verts"), 0.5)
    return lines.select("line_id", p["seg_i"].alias("seg_i"),
                        p["px"].alias("px"), p["py"].alias("py"))


def sql_line_interpolate() -> str:
    return f"""
WITH pts AS (
  SELECT p_partkey AS line_id, CAST(t.i AS BIGINT) AS i,
         CAST(t.i * 256 AS BIGINT) AS x,
         CAST((p_partkey*37 + t.i*13) % 7
              + CASE WHEN t.i = p_partkey % {_RDP_N} THEN 1000 ELSE 0 END
              AS BIGINT) AS y
  FROM part, LATERAL (SELECT unnest(range({_RDP_N})) AS i) t
  WHERE p_partkey <= {_RDP_LINES}
),
seg AS (
  SELECT line_id, i, x, y,
         lead(x) OVER w AS nx, lead(y) OVER w AS ny
  FROM pts WINDOW w AS (PARTITION BY line_id ORDER BY i)
),
lens AS (
  SELECT line_id, i, x, y, nx, ny,
         sqrt(CAST((nx - x) * (nx - x) + (ny - y) * (ny - y) AS DOUBLE))
           AS len
  FROM seg WHERE nx IS NOT NULL
),
lists AS (
  -- explicit list folds, NOT window sums: a windowed SUM may aggregate
  -- via segment tree (pairwise association) while the engine's in-row
  -- prefix is a strict left fold — list_reduce replays the left fold
  SELECT line_id,
         list(len ORDER BY i) AS ll,
         list(x ORDER BY i) AS xs, list(y ORDER BY i) AS ys,
         list(nx ORDER BY i) AS nxs, list(ny ORDER BY i) AS nys
  FROM lens GROUP BY line_id
),
m AS (
  SELECT line_id, ll, xs, ys, nxs, nys,
         list_reduce(ll, (a, b) -> a + b) * 0.5 AS target
  FROM lists
),
cand AS (
  SELECT m.line_id, t.k
  FROM m, LATERAL (SELECT unnest(range(1, len(m.ll) + 1)) AS k) t
  WHERE list_reduce(m.ll[1:CAST(t.k AS INT)], (a, b) -> a + b) >= m.target
),
pick AS (SELECT line_id, MIN(k) AS k FROM cand GROUP BY line_id)
SELECT m.line_id, CAST(p.k AS BIGINT) AS seg_i,
       m.xs[CAST(p.k AS INT)]
         + (m.target - CASE WHEN p.k = 1 THEN CAST(0.0 AS DOUBLE)
                            ELSE list_reduce(m.ll[1:CAST(p.k - 1 AS INT)],
                                             (a, b) -> a + b) END)
           / m.ll[CAST(p.k AS INT)]
           * (m.nxs[CAST(p.k AS INT)] - m.xs[CAST(p.k AS INT)]) AS px,
       m.ys[CAST(p.k AS INT)]
         + (m.target - CASE WHEN p.k = 1 THEN CAST(0.0 AS DOUBLE)
                            ELSE list_reduce(m.ll[1:CAST(p.k - 1 AS INT)],
                                             (a, b) -> a + b) END)
           / m.ll[CAST(p.k AS INT)]
           * (m.nys[CAST(p.k AS INT)] - m.ys[CAST(p.k AS INT)]) AS py
FROM pick p JOIN m USING (line_id)"""


# hex grid: 1/64 of the unit mercator square per circumradius — ~3.5k
# occupied cells over ~60k sf0.01 features (≈17 features/cell), so the
# cube-round fix path and multi-feature cells are both exercised.
_HEX_SIZE = 1.0 / 64.0


def q_hex_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal cell binning (geo/hex.py — the H3-family half of the
    north rule's "H3/S2 index"): pointy-top axial cells on the unit
    mercator plane via cube rounding, all whole-stage codegen.  The
    DuckDB oracle replays the identical IEEE chain (mercator → fractional
    axial → floor(x+0.5) round → largest-residual fix), so the
    value-hash match proves every cell id bit-for-bit, including rows
    that take the fix_q / fix_r correction branches."""
    from .geo.hex import hex_axial, hex_cell_id
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), _HEX_SIZE)
    return (feats.select(hq.alias("hq"), hr.alias("hr"), "feature_id")
            .groupBy("hq", "hr")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("feature_id").alias("sum_fid"))
            .withColumn("hex_id", hex_cell_id(F.col("hq"), F.col("hr"))))


def sql_hex_assign() -> str:
    from .geo.hex import sql_hex_axial
    from .sources.features import FEATURES_ORACLE_SQL

    return f"""WITH {FEATURES_ORACLE_SQL},
cells AS (
  SELECT {sql_hex_axial(_HEX_SIZE)}, feature_id FROM features
)
SELECT hq, hr, COUNT(*) AS n, CAST(SUM(feature_id) AS BIGINT) AS sum_fid,
       hq * 4294967296 + hr AS hex_id
FROM cells GROUP BY hq, hr"""


def q_hex_ring_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=1 hex-disk smoothing — the kernel aggregation hexagonal grids
    exist for (uniform 6-adjacency, one neighbor distance): each
    occupied cell splats its count/weight to its 7-cell disk via a
    7-row literal explode, one groupBy on the target key.  Corpus
    features shuffle ONCE (the binning agg); the splat re-aggregates
    the ~3.5k occupied CELLS, not the rows — the same
    aggregate-then-splat discipline as heatmap_tiles.  The oracle joins
    the cell table against the offset VALUES list in integer coordinate
    space, proving the splat equals the disk neighborhood sum."""
    from .geo.hex import hex_axial, hex_disk_offsets
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), _HEX_SIZE)
    cells = (feats.select(hq.alias("hq"), hr.alias("hr"), "feature_id")
             .groupBy("hq", "hr")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("feature_id").alias("sum_fid")))
    offs = F.array(*[
        F.struct(F.lit(dq).cast("long").alias("dq"),
                 F.lit(dr).cast("long").alias("dr"))
        for dq, dr in hex_disk_offsets(1)])
    splat = cells.select(
        "n", "sum_fid", F.explode(offs).alias("o"),
        (F.col("hq") + F.col("o.dq")).alias("thq"),
        (F.col("hr") + F.col("o.dr")).alias("thr"))
    return (splat.groupBy(F.col("thq").alias("hq"),
                          F.col("thr").alias("hr"))
            .agg(F.sum("n").alias("disk_n"),
                 F.sum("sum_fid").alias("disk_fid")))


def sql_hex_ring_agg() -> str:
    from .geo.hex import hex_disk_offsets, sql_hex_axial
    from .sources.features import FEATURES_ORACLE_SQL

    offs = ", ".join(f"({dq}, {dr})" for dq, dr in hex_disk_offsets(1))
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT {sql_hex_axial(_HEX_SIZE)}, feature_id FROM features
),
cells AS (
  SELECT hq, hr, COUNT(*) AS n, CAST(SUM(feature_id) AS BIGINT) AS sum_fid
  FROM pts GROUP BY hq, hr
),
offs(dq, dr) AS (VALUES {offs})
SELECT c.hq + o.dq AS hq, c.hr + o.dr AS hr,
       CAST(SUM(c.n) AS BIGINT) AS disk_n,
       CAST(SUM(c.sum_fid) AS BIGINT) AS disk_fid
FROM cells c, offs o GROUP BY 1, 2"""


# DBSCAN gate: milli-degree integer lattice coords straight from the
# feature_id hash (no doubles anywhere), eps 5000 / min_pts 4 over the
# %23 subsample — ~35% cores, 171 clusters, borders and noise all
# populated, and the oracle's reachability closure stays small.
_DBSCAN_EPS = 5000
_DBSCAN_MINPTS = 4
_DBSCAN_QMOD = 23


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-accelerated DBSCAN (operators/cluster.py): eps-cell 3×3
    candidate join → integer distance refine → core flags → connected
    components over core-core edges → border attachment by minimum
    neighbor label.  All-integer pipeline, so the DuckDB oracle — brute
    O(n²) neighbor join + recursive-CTE reachability + the same border
    MIN rule — matches by full value hash: every point's role AND
    cluster label, including noise NULLs.  feature_id is NON-unique in
    the synthetic lineitem (45832/60000 distinct), so the sample is
    deduped by id on both sides before clustering."""
    from .operators.cluster import dbscan
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.filter(F.col("feature_id") % _DBSCAN_QMOD == 0)
           .select(F.col("feature_id").alias("id"),
                   F.pmod(F.col("feature_id") * 7919,
                          F.lit(360000)).alias("x"),
                   F.pmod(F.col("feature_id") * 104729,
                          F.lit(170000)).alias("y"))
           .distinct())
    return dbscan(pts, _DBSCAN_EPS, _DBSCAN_MINPTS, id_col="id")


def sql_dbscan_clusters() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    eps2 = _DBSCAN_EPS * _DBSCAN_EPS
    return f"""WITH RECURSIVE {FEATURES_ORACLE_SQL},
pts AS (SELECT DISTINCT feature_id AS id,
        (feature_id*7919)%360000 AS x, (feature_id*104729)%170000 AS y
        FROM features WHERE feature_id % {_DBSCAN_QMOD} = 0),
pairs AS (SELECT a.id i, b.id j FROM pts a JOIN pts b
          ON a.id <> b.id
         AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {eps2}),
cnt AS (SELECT i, COUNT(*) n FROM pairs GROUP BY i),
core AS (SELECT p.id FROM pts p JOIN cnt c ON c.i = p.id
         WHERE c.n + 1 >= {_DBSCAN_MINPTS}),
ce AS (SELECT p.i, p.j FROM pairs p
       JOIN core a ON a.id = p.i JOIN core b ON b.id = p.j),
r AS (SELECT id AS node, id AS comp FROM core
      UNION
      SELECT ce.j, r.comp FROM r JOIN ce ON ce.i = r.node),
lab AS (SELECT node AS id, MIN(comp) AS label FROM r GROUP BY node),
bord AS (SELECT p.i AS id, MIN(l.label) AS label
         FROM pairs p JOIN core c ON c.id = p.j JOIN lab l ON l.id = p.j
         LEFT JOIN core me ON me.id = p.i
         WHERE me.id IS NULL GROUP BY p.i)
SELECT id, label, 'core' AS role FROM lab
UNION ALL
SELECT id, label, 'border' AS role FROM bord
UNION ALL
SELECT p.id, CAST(NULL AS BIGINT) AS label, 'noise' AS role
FROM pts p LEFT JOIN core c ON c.id = p.id
           LEFT JOIN bord b ON b.id = p.id
WHERE c.id IS NULL AND b.id IS NULL"""


# segment field: 1500 segments on a 60k² integer grid, paired so
# (2k, 2k+1) share their anchor endpoint — guaranteeing the collinear
# 'touch' branch fires (750×) alongside organic proper crossings (42)
# and bbox-overlap rejects (643): every predicate branch is exercised.
_SEG_N = 1500
_SEG_CELL = 2048


# shared SQL for the synthetic road-segment field — ONE definition for
# every oracle that replays _segs_df (seg_intersections, map_match)
_SEGS_SQL = f"""segs0 AS (
  SELECT p_partkey AS sid,
         2000 + ((p_partkey - p_partkey%2)*7919) % 60000 AS x1,
         2000 + ((p_partkey - p_partkey%2)*104729) % 60000 AS y1,
         2000 + ((p_partkey - p_partkey%2)*7919) % 60000
              + (p_partkey*31) % 3001 - 1500 AS x2,
         2000 + ((p_partkey - p_partkey%2)*104729) % 60000
              + (p_partkey*57) % 3001 - 1500 AS y2
  FROM part WHERE p_partkey <= {_SEG_N})"""


def _segs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    pk = F.col("p_partkey")
    anchor = pk - pk % 2
    x1 = 2000 + F.pmod(anchor * 7919, F.lit(60000))
    y1 = 2000 + F.pmod(anchor * 104729, F.lit(60000))
    return (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(pk <= _SEG_N)
            .select(pk.alias("seg_id"),
                    x1.cast("long").alias("x1"),
                    y1.cast("long").alias("y1"),
                    (x1 + F.pmod(pk * 31, F.lit(3001)) - 1500)
                    .cast("long").alias("x2"),
                    (y1 + F.pmod(pk * 57, F.lit(3001)) - 1500)
                    .cast("long").alias("y2")))


def q_seg_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-intersection overlay (geo/overlay.py): grid-cell
    candidate join + exact CLRS orientation predicate, each pair tested
    in exactly ONE cell (the bbox-overlap top-left rule — no post-join
    dedup).  The oracle is the brute O(n²) join with the identical
    integer sign analysis, so kind labels (proper/touch) match by full
    value hash."""
    from .geo.overlay import segment_pairs_intersecting

    return segment_pairs_intersecting(_segs_df(spark, sf_dir), _SEG_CELL)


def sql_seg_intersections() -> str:
    return f"""
WITH {_SEGS_SQL},
segs AS (
  SELECT sid, x1, y1, x2, y2,
         LEAST(x1,x2) AS minx, GREATEST(x1,x2) AS maxx,
         LEAST(y1,y2) AS miny, GREATEST(y1,y2) AS maxy
  FROM segs0
),
pr AS (
  SELECT a.sid i, b.sid j,
    (b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1) AS d1,
    (b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1) AS d2,
    (a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1) AS d3,
    (a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1) AS d4,
    a.x1 ax1, a.y1 ay1, a.x2 ax2, a.y2 ay2,
    b.x1 bx1, b.y1 by1, b.x2 bx2, b.y2 by2
  FROM segs a JOIN segs b ON a.sid < b.sid
  WHERE a.minx <= b.maxx AND b.minx <= a.maxx
    AND a.miny <= b.maxy AND b.miny <= a.maxy
),
k AS (
 SELECT i, j, CASE
  WHEN ((d1>0 AND d2<0) OR (d1<0 AND d2>0))
   AND ((d3>0 AND d4<0) OR (d3<0 AND d4>0)) THEN 'proper'
  WHEN (d1=0 AND ax1 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
             AND ay1 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))
    OR (d2=0 AND ax2 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
             AND ay2 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))
    OR (d3=0 AND bx1 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
             AND by1 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
    OR (d4=0 AND bx2 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
             AND by2 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
   THEN 'touch' END AS kind
 FROM pr
)
SELECT i, j, kind FROM k WHERE kind IS NOT NULL"""


def q_hex_hotspot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over the hex binning (geo/hex.py
    hex_gi_star): binary 1-disk weights, occupied-cell universe, exact
    integer moments, pinned IEEE division/sqrt order — the oracle
    replays the identical chain so even the z DOUBLES value-hash
    match."""
    from .geo.hex import hex_axial, hex_gi_star
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), _HEX_SIZE)
    cells = (feats.select(hq.alias("hq"), hr.alias("hr"))
             .groupBy("hq", "hr")
             .agg(F.count(F.lit(1)).alias("n")))
    return hex_gi_star(cells, value="n", k=1)


def sql_hex_hotspot() -> str:
    from .geo.hex import hex_disk_offsets, sql_hex_axial
    from .sources.features import FEATURES_ORACLE_SQL

    offs = ", ".join(f"({dq}, {dr})" for dq, dr in hex_disk_offsets(1))
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT {sql_hex_axial(_HEX_SIZE)} FROM features
),
cells AS (
  SELECT hq, hr, COUNT(*) AS n FROM pts GROUP BY hq, hr
),
offs(dq, dr) AS (VALUES {offs}),
disk AS (
  SELECT c.hq, c.hr, COUNT(*) AS w_i, CAST(SUM(t.n) AS BIGINT) AS s1
  FROM cells c JOIN offs o ON TRUE
  JOIN cells t ON t.hq = c.hq + o.dq AND t.hr = c.hr + o.dr
  GROUP BY c.hq, c.hr
),
gstats AS (
  SELECT COUNT(*) AS nc, CAST(SUM(n) AS BIGINT) AS sx,
         CAST(SUM(n*n) AS BIGINT) AS sxx
  FROM cells
)
SELECT d.hq, d.hr, d.w_i, d.s1,
       (CAST(d.s1 AS DOUBLE)
        - (CAST(g.sx AS DOUBLE) / CAST(g.nc AS DOUBLE))
          * CAST(d.w_i AS DOUBLE))
       / (SQRT(CAST(g.sxx AS DOUBLE) / CAST(g.nc AS DOUBLE)
               - (CAST(g.sx AS DOUBLE) / CAST(g.nc AS DOUBLE))
                 * (CAST(g.sx AS DOUBLE) / CAST(g.nc AS DOUBLE)))
          * SQRT((CAST(g.nc AS DOUBLE) * CAST(d.w_i AS DOUBLE)
                  - CAST(d.w_i AS DOUBLE) * CAST(d.w_i AS DOUBLE))
                 / (CAST(g.nc AS DOUBLE) - 1.0))) AS z
FROM disk d, gstats g
WHERE g.nc * d.w_i - d.w_i * d.w_i > 0
  AND g.nc * g.sxx - g.sx * g.sx > 0"""


# map-matching: GPS-like lattice points snapped to the seg_intersections
# road field within a 1500-unit error radius (cell 2048 ⇒ ring-1
# coverage proof holds); ~2k points, most matched, some off-road.
_MM_QMOD = 29
_MM_RADIUS = 1500


def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-matching (geo/overlay.py snap_to_segments): nearest-segment
    snap via one cell equi-join; exact integer projection clamp, single
    pinned IEEE division, (d2, seg_id) struct-min tie-break.  The
    oracle is the brute point×segment join with the identical CASE
    chain and ROW_NUMBER pick — d2 doubles value-hash-match."""
    from .geo.overlay import snap_to_segments
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.filter(F.col("feature_id") % _MM_QMOD == 0)
           .select(F.col("feature_id").alias("point_id"),
                   (1000 + F.pmod(F.col("feature_id") * 7919,
                                  F.lit(62000))).alias("x"),
                   (1000 + F.pmod(F.col("feature_id") * 104729,
                                  F.lit(62000))).alias("y"))
           .distinct())
    return snap_to_segments(pts, _segs_df(spark, sf_dir),
                            _MM_RADIUS, _SEG_CELL)


def sql_map_match() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    r2 = _MM_RADIUS * _MM_RADIUS
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT DISTINCT feature_id AS pid,
         1000 + (feature_id*7919) % 62000 AS px,
         1000 + (feature_id*104729) % 62000 AS py
  FROM features WHERE feature_id % {_MM_QMOD} = 0
),
{_SEGS_SQL},
segs AS (SELECT sid, x1, y1, x2, y2 FROM segs0),
cand AS (
  SELECT p.pid, s.sid,
    CASE
      WHEN ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1)) = 0
        OR ((p.px-s.x1)*(s.x2-s.x1) + (p.py-s.y1)*(s.y2-s.y1)) <= 0
      THEN CAST((p.px-s.x1)*(p.px-s.x1) + (p.py-s.y1)*(p.py-s.y1)
                AS DOUBLE)
      WHEN ((p.px-s.x1)*(s.x2-s.x1) + (p.py-s.y1)*(s.y2-s.y1))
           >= ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))
      THEN CAST((p.px-s.x2)*(p.px-s.x2) + (p.py-s.y2)*(p.py-s.y2)
                AS DOUBLE)
      ELSE CAST(((s.x2-s.x1)*(p.py-s.y1) - (s.y2-s.y1)*(p.px-s.x1))
                * ((s.x2-s.x1)*(p.py-s.y1) - (s.y2-s.y1)*(p.px-s.x1))
                AS DOUBLE)
           / CAST((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1)
                  AS DOUBLE)
    END AS d2
  FROM pts p JOIN segs s ON TRUE
)
SELECT pid AS point_id, sid AS seg_id, d2 FROM (
  SELECT pid, sid, d2,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, sid) AS rn
  FROM cand WHERE d2 <= {r2}
) WHERE rn = 1"""


# polygon validity: the 8-vertex stars are simple by construction;
# every 5th polygon gets ring positions 1 and 2 swapped — a bowtie whose
# crossing edges the overlay must flag.  Adjacent edges share an
# endpoint (touch) and are excluded by the ring-distance test.
_PV_SWAP_MOD = 5
_PV_CELL = 1 << 15  # >= max star edge extent (~14k micro-deg)


def q_polygon_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon simplicity check (OGC is-simple analogue) as a
    composition: ring edges → segment_pairs_intersecting (geo/overlay)
    → drop ring-adjacent touches → count per polygon.  Exact integer
    predicate end to end; the oracle recomputes the same sign analysis
    over the brute edge-pair join."""
    from .geo.overlay import segment_pairs_intersecting

    n = len(_DIRS)
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter((F.col("p_partkey") >= 1)
                    & (F.col("p_partkey") <= _N_POLY)))
    pk = F.col("p_partkey")
    verts = _star_verts()
    perm = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda rp: F.when((pk % _PV_SWAP_MOD == 0) & (rp == 1), F.lit(2))
        .when((pk % _PV_SWAP_MOD == 0) & (rp == 2), F.lit(1))
        .otherwise(rp))
    ring = F.transform(perm, lambda j: F.element_at(
        verts, (j + 1).cast("int")))
    polys = part.select(pk.alias("poly_id"), ring.alias("ring"))
    edges = polys.select(
        "poly_id",
        F.posexplode(F.col("ring")).alias("e", "v"))
    nxt = edges.select(
        "poly_id",
        F.col("e").cast("long").alias("e"),
        F.col("v.x").alias("x1"), F.col("v.y").alias("y1"))
    # close the ring: edge e runs vertex e -> vertex (e+1) mod n
    nxt2 = edges.select(
        "poly_id",
        F.pmod(F.col("e") - 1, F.lit(n)).cast("long").alias("e"),
        F.col("v.x").alias("x2"), F.col("v.y").alias("y2"))
    segs = (nxt.join(nxt2, ["poly_id", "e"])
            .select((F.col("poly_id") * n + F.col("e")).alias("seg_id"),
                    "poly_id", "e", "x1", "y1", "x2", "y2"))
    hits = segment_pairs_intersecting(
        segs.select("seg_id", "x1", "y1", "x2", "y2"), _PV_CELL,
        validate=False)
    bad = (hits
           .filter((F.col("i") / n).cast("long")
                   == (F.col("j") / n).cast("long"))
           .select((F.col("i") / n).cast("long").alias("poly_id"),
                   F.pmod(F.col("i"), F.lit(n)).alias("ei"),
                   F.pmod(F.col("j"), F.lit(n)).alias("ej"))
           .filter(~F.pmod(F.col("ej") - F.col("ei"), F.lit(n))
                   .isin(1, n - 1))
           .groupBy("poly_id")
           .agg(F.count(F.lit(1)).alias("n_bad")))
    return (polys.select("poly_id").join(bad, "poly_id", "left")
            .select("poly_id",
                    F.coalesce("n_bad", F.lit(0)).alias("n_bad"),
                    (F.coalesce("n_bad", F.lit(0)) == 0)
                    .alias("is_simple")))


def sql_polygon_validity() -> str:
    n = len(_DIRS)
    dirs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate(_DIRS))
    return f"""
WITH dirs(i, dx, dy) AS (VALUES {dirs}),
ring AS (
  SELECT p_partkey AS poly_id, rp.r AS rp,
         CASE WHEN p_partkey % {_PV_SWAP_MOD} = 0 AND rp.r = 1 THEN 2
              WHEN p_partkey % {_PV_SWAP_MOD} = 0 AND rp.r = 2 THEN 1
              ELSE rp.r END AS j
  FROM part, LATERAL (SELECT unnest(range({n})) AS r) rp
  WHERE p_partkey >= 1 AND p_partkey <= {_N_POLY}
),
verts AS (
  SELECT r.poly_id, r.rp,
         ((r.poly_id*7013) % 340 - 170) * 1000000 + 500
           + d.dx * (1000 + ((r.poly_id*31 + r.j*17) % 13) * 500) AS vx,
         ((r.poly_id*3571) % 150 - 75) * 1000000 + 500
           + d.dy * (1000 + ((r.poly_id*31 + r.j*17) % 13) * 500) AS vy
  FROM ring r JOIN dirs d ON d.i = r.j
),
segs AS (
  SELECT a.poly_id, a.rp AS e, a.vx AS x1, a.vy AS y1,
         b.vx AS x2, b.vy AS y2
  FROM verts a JOIN verts b
    ON b.poly_id = a.poly_id AND b.rp = (a.rp + 1) % {n}
),
pr AS (
  SELECT a.poly_id, a.e AS ei, b.e AS ej,
    (b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1) AS d1,
    (b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1) AS d2,
    (a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1) AS d3,
    (a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1) AS d4,
    a.x1 ax1, a.y1 ay1, a.x2 ax2, a.y2 ay2,
    b.x1 bx1, b.y1 by1, b.x2 bx2, b.y2 by2
  FROM segs a JOIN segs b
    ON b.poly_id = a.poly_id AND a.e < b.e
   AND (b.e - a.e) % {n} NOT IN (1, {n - 1})
),
bad AS (
  SELECT poly_id, COUNT(*) AS n_bad FROM pr
  WHERE (((d1>0 AND d2<0) OR (d1<0 AND d2>0))
         AND ((d3>0 AND d4<0) OR (d3<0 AND d4>0)))
     OR (d1=0 AND ax1 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
              AND ay1 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))
     OR (d2=0 AND ax2 BETWEEN LEAST(bx1,bx2) AND GREATEST(bx1,bx2)
              AND ay2 BETWEEN LEAST(by1,by2) AND GREATEST(by1,by2))
     OR (d3=0 AND bx1 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
              AND by1 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
     OR (d4=0 AND bx2 BETWEEN LEAST(ax1,ax2) AND GREATEST(ax1,ax2)
              AND by2 BETWEEN LEAST(ay1,ay2) AND GREATEST(ay1,ay2))
  GROUP BY poly_id
)
SELECT p.poly_id, COALESCE(b.n_bad, 0) AS n_bad,
       COALESCE(b.n_bad, 0) = 0 AS is_simple
FROM (SELECT DISTINCT poly_id FROM ring) p
LEFT JOIN bad b USING (poly_id)"""


# hex polyfill: 80 deterministic lon/lat boxes (3-12° spans) from part;
# a finer grid than the binning gates (1/256 ⇒ ~2.4° hex width) so each
# box holds a meaningful covering rather than 0-2 centers.
_PF_N_BOX = 80
_PF_SIZE = 1.0 / 256.0


def q_hex_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex covering of lon/lat bboxes (geo/hex.py hex_polyfill_bbox —
    the H3-polyfill analogue, center-in-region convention): candidate
    parallelogram from the corner transforms, exact center filter,
    bounded explode.  Oracle replays the identical double chain over
    unnested ranges — cell sets match by value hash."""
    from .geo.hex import hex_polyfill_bbox

    pk = F.col("p_partkey")
    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter((pk >= 1) & (pk <= _PF_N_BOX)))
    lon0 = (F.pmod(pk * 7013, F.lit(300)) - 170).cast("double")
    lat0 = (F.pmod(pk * 3571, F.lit(130)) - 70).cast("double")
    lon1 = lon0 + (3 + F.pmod(pk * 11, F.lit(10))).cast("double")
    lat1 = lat0 + (3 + F.pmod(pk * 13, F.lit(8))).cast("double")
    cells = hex_polyfill_bbox(lon0, lat0, lon1, lat1, _PF_SIZE)
    return (part.select(pk.alias("box_id"), F.explode(cells).alias("c"))
            .select("box_id", F.col("c.hq").alias("hq"),
                    F.col("c.hr").alias("hr")))


def sql_hex_polyfill() -> str:
    from .geo.hex import SQRT3, SQRT3_3, TWO_THIRDS, sql_mercator_xy

    s = repr(float(_PF_SIZE))
    half_sqrt3 = repr(SQRT3 / 2.0)
    mx_a, my_a = sql_mercator_xy("lon0", "lat0")
    mx_b, my_b = sql_mercator_xy("lon1", "lat1")
    qd = lambda mx, my: f"(({SQRT3_3!r} * ({mx}) - ({my}) / 3.0) / {s})"  # noqa: E731
    rd = lambda my: f"(({TWO_THIRDS!r} * ({my})) / {s})"  # noqa: E731
    return f"""
WITH boxes AS (
  SELECT p_partkey AS box_id,
         CAST((p_partkey*7013) % 300 - 170 AS DOUBLE) AS lon0,
         CAST((p_partkey*3571) % 130 - 70 AS DOUBLE) AS lat0,
         CAST((p_partkey*7013) % 300 - 170
              + 3 + (p_partkey*11) % 10 AS DOUBLE) AS lon1,
         CAST((p_partkey*3571) % 130 - 70
              + 3 + (p_partkey*13) % 8 AS DOUBLE) AS lat1
  FROM part WHERE p_partkey >= 1 AND p_partkey <= {_PF_N_BOX}
),
merc AS (
  SELECT box_id, {mx_a} AS mx0, {mx_b} AS mx1,
         LEAST({my_a}, {my_b}) AS my_lo,
         GREATEST({my_a}, {my_b}) AS my_hi
  FROM boxes
),
rng AS (
  SELECT box_id, mx0, mx1, my_lo, my_hi,
         CAST(FLOOR({qd('mx0', 'my_hi')}) AS BIGINT) - 1 AS qmin,
         CAST(FLOOR({qd('mx1', 'my_lo')}) AS BIGINT) + 1 AS qmax,
         CAST(FLOOR({rd('my_lo')}) AS BIGINT) - 1 AS rmin,
         CAST(FLOOR({rd('my_hi')}) AS BIGINT) + 1 AS rmax
  FROM merc
),
cand AS (
  SELECT r.box_id, r.mx0, r.mx1, r.my_lo, r.my_hi,
         q.hq, t.hr,
         {s} * ({SQRT3!r} * CAST(q.hq AS DOUBLE)
                + {half_sqrt3} * CAST(t.hr AS DOUBLE)) AS cx,
         {s} * (1.5 * CAST(t.hr AS DOUBLE)) AS cy
  FROM rng r,
       LATERAL (SELECT unnest(range(r.qmin, r.qmax + 1)) AS hq) q,
       LATERAL (SELECT unnest(range(r.rmin, r.rmax + 1)) AS hr) t
)
SELECT box_id, hq, hr FROM cand
WHERE cx >= mx0 AND cx < mx1 AND cy >= my_lo AND cy < my_hi"""


# radius-bounded kNN join: ~1100 queries (%41) against the deduped
# 45.8k-point lattice, 3 nearest within 8000 milli-deg units
_KJ_QMOD = 41
_KJ_K = 3
_KJ_RADIUS = 8000


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded kNN join (operators/cluster.py grid_knn_join):
    k nearest in-range corpus points per query via ONE cell equi-join +
    per-query window — integer d², (d², id) tie-break, full value-hash
    against the brute oracle."""
    from .operators.cluster import grid_knn_join
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.select(F.col("feature_id").alias("id"),
                        F.pmod(F.col("feature_id") * 7919,
                               F.lit(360000)).alias("x"),
                        F.pmod(F.col("feature_id") * 104729,
                               F.lit(170000)).alias("y"))
           .distinct())
    qs = pts.filter(F.col("id") % _KJ_QMOD == 0)             .withColumnRenamed("id", "query_id")
    cs = pts.withColumnRenamed("id", "point_id")
    return grid_knn_join(qs, cs, _KJ_K, _KJ_RADIUS)


def sql_knn_join() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    r2 = _KJ_RADIUS * _KJ_RADIUS
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (SELECT DISTINCT feature_id AS id,
        (feature_id*7919)%360000 AS x, (feature_id*104729)%170000 AS y
        FROM features),
cand AS (
  SELECT q.id AS query_id, c.id AS point_id,
         (q.x-c.x)*(q.x-c.x) + (q.y-c.y)*(q.y-c.y) AS d2
  FROM pts q JOIN pts c
    ON (q.x-c.x)*(q.x-c.x) + (q.y-c.y)*(q.y-c.y) <= {r2}
  WHERE q.id % {_KJ_QMOD} = 0
)
SELECT query_id, rank, point_id, d2 FROM (
  SELECT query_id, point_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2 ASC, point_id ASC) AS rank
  FROM cand
) WHERE rank <= {_KJ_K}"""


def _star_verts_sql() -> str:
    """dirs+verts CTE text for the star-polygon substrate (shared by the
    spherical-area oracle; sql_geom_stats predates the helper and keeps
    its inline copy with extra edge logic)."""
    dirs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate(_DIRS))
    return f"""dirs(i, dx, dy) AS (VALUES {dirs}),
verts AS (
  SELECT p_partkey AS poly_id, d.i,
         ((p_partkey*7013) % 340 - 170) * 1000000 + 500
           + d.dx * (1000 + ((p_partkey*31 + d.i*17) % 13) * 500) AS vx,
         ((p_partkey*3571) % 150 - 75) * 1000000 + 500
           + d.dy * (1000 + ((p_partkey*31 + d.i*17) % 13) * 500) AS vy
  FROM part, dirs d WHERE p_partkey <= {_N_POLY}
)"""


def q_spherical_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True spherical polygon area (geo/geom.py spherical_area_m2 — the
    Chamberlain-Duquette/turf ringArea formula) for the star-polygon
    substrate: an ordered in-row LEFT FOLD of trig terms, mirrored by
    the oracle's list_reduce over the same vertex order — area doubles
    bit-match (the sin/radians chain is libm-stable, per the repo's
    parity rules)."""
    from .geo.geom import spherical_area_m2

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _N_POLY))
    df = part.select(F.col("p_partkey").alias("poly_id"),
                     _star_verts().alias("verts"))
    return df.select("poly_id",
                     spherical_area_m2(F.col("verts")).alias("area_m2"))


def sql_spherical_area() -> str:
    from .geo.geom import EARTH_RADIUS_M

    half_r2 = repr(EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0)
    inv = repr(1.0 / 1e6)
    t = (f"(RADIANS(CAST(nx AS DOUBLE) * {inv})"
         f" - RADIANS(CAST(vx AS DOUBLE) * {inv}))"
         f" * (2.0 + SIN(RADIANS(CAST(vy AS DOUBLE) * {inv}))"
         f" + SIN(RADIANS(CAST(ny AS DOUBLE) * {inv})))")
    return f"""
WITH {_star_verts_sql()},
edges AS (
  SELECT poly_id, i, vx, vy,
         COALESCE(lead(vx) OVER w, first_value(vx) OVER w) AS nx,
         COALESCE(lead(vy) OVER w, first_value(vy) OVER w) AS ny
  FROM verts WINDOW w AS (PARTITION BY poly_id ORDER BY i)
)
SELECT poly_id,
       ABS(list_reduce(list({t} ORDER BY i), (a, b) -> a + b))
         * {half_r2} AS area_m2
FROM edges GROUP BY poly_id"""


# geofence: 60 zone centers (%773 of the lattice) at radius 6000
_GF_ZMOD = 773
_GF_RADIUS = 6000


def q_geofence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence screening (operators/cluster.py geofence_flag): every
    lattice point flagged in/out of any zone's 6000-unit ball, with the
    nearest zone where inside — the negative-join form of the radius
    join, one cell pass, integer-exact both ways."""
    from .operators.cluster import geofence_flag
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.select(F.col("feature_id").alias("id"),
                        F.pmod(F.col("feature_id") * 7919,
                               F.lit(360000)).alias("x"),
                        F.pmod(F.col("feature_id") * 104729,
                               F.lit(170000)).alias("y"))
           .distinct())
    zones = pts.filter(F.col("id") % _GF_ZMOD == 0)                .withColumnRenamed("id", "zone_id")
    return geofence_flag(pts.withColumnRenamed("id", "point_id"),
                         zones, _GF_RADIUS)


def sql_geofence_flag() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    r2 = _GF_RADIUS * _GF_RADIUS
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (SELECT DISTINCT feature_id AS id,
        (feature_id*7919)%360000 AS x, (feature_id*104729)%170000 AS y
        FROM features),
hits AS (
  SELECT p.id AS pid, z.id AS zid,
         (p.x-z.x)*(p.x-z.x) + (p.y-z.y)*(p.y-z.y) AS d2
  FROM pts p JOIN pts z
    ON z.id % {_GF_ZMOD} = 0
   AND (p.x-z.x)*(p.x-z.x) + (p.y-z.y)*(p.y-z.y) <= {r2}
),
best AS (
  SELECT pid, zid, d2 FROM (
    SELECT pid, zid, d2,
           ROW_NUMBER() OVER (PARTITION BY pid
                              ORDER BY d2 ASC, zid ASC) AS rn
    FROM hits
  ) WHERE rn = 1
)
SELECT p.id AS point_id, b.pid IS NOT NULL AS in_fence,
       b.zid AS nearest_zone, b.d2 AS d2
FROM pts p LEFT JOIN best b ON b.pid = p.id"""


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics — the canonical PIP-then-aggregate composition
    (land-use stats per admin polygon, POI density per zone): the
    cell-pruned broadcast PIP join (geo/pip.py) feeding ONE groupBy on
    poly_id.  Exact outputs only (count / bigint sum / distinct count),
    so the gate value-hashes against the brute rectangle oracle."""
    from .geo.pip import point_in_polygon_join
    from .queries_ext import _rect_polys
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        "feature_id", "layer", "lon", "lat")
    j = point_in_polygon_join(feats, _rect_polys(spark, sf_dir), zoom=6)
    return j.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum("feature_id").cast("long").alias("sum_fid"),
        F.countDistinct("layer").alias("n_layers"))


def sql_zonal_stats() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    return f"""WITH {FEATURES_ORACLE_SQL},
polys AS (
  SELECT CAST(p_partkey AS VARCHAR) AS poly_id,
         (p_partkey * 7013) % 340 - 170 + 0.0005 AS x0,
         (p_partkey * 3571) % 150 - 75 + 0.0005 AS y0,
         (p_partkey * 37) % 20 + 2 AS w,
         (p_partkey * 53) % 14 + 2 AS h
  FROM part WHERE p_partkey <= 30
)
SELECT p.poly_id,
       COUNT(*) AS n_pts,
       CAST(SUM(f.feature_id) AS BIGINT) AS sum_fid,
       COUNT(DISTINCT f.layer) AS n_layers
FROM features f JOIN polys p
  ON f.lon > p.x0 AND f.lon < p.x0 + p.w
 AND f.lat > p.y0 AND f.lat < p.y0 + p.h
GROUP BY p.poly_id"""


def q_st_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal as-of join — for every probe event, the LATEST
    sensor reading in the SAME grid cell at or before it (trajectory
    enrichment: attach last-known weather/traffic cell state to each
    ping).  Pure composition: integer cell assignment becomes extra
    equi-keys on operators/temporal.py asof_join, so the whole thing is
    ONE hash shuffle on (cx, cy) + an in-partition sort — no per-cell
    range scan.  Readings deduped per (cell, ts) by max event_id for
    cross-engine tie determinism; DuckDB's native multi-key ASOF JOIN
    is the independent oracle."""
    from .operators.temporal import asof_join

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                  "user_id"))
    cx = F.pmod(F.col("user_id") * 7919, F.lit(64)).alias("cx")
    cy = F.pmod(F.col("user_id") * 104729, F.lit(64)).alias("cy")
    readings = (ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == 0)
                .select(cx, cy, "ts", "event_id")
                .groupBy("cx", "cy", "ts")
                .agg(F.max("event_id").alias("reading_id")))
    probes = (ev.filter(F.pmod(F.col("event_id"), F.lit(97)) == 1)
              .select("event_id", cx, cy, "ts"))
    j = asof_join(probes, readings, on=["cx", "cy"],
                  left_ts="ts", right_ts="ts", tiebreak="reading_id")
    return j.select("event_id",
                    F.col("reading_id_r").alias("reading_id"),
                    F.col("asof_gap_us").alias("gap_us"))


def sql_st_asof_join() -> str:
    return """
WITH ev AS (
  SELECT event_id, ts, (user_id*7919)%64 AS cx, (user_id*104729)%64 AS cy
  FROM events
),
rd AS (SELECT cx, cy, ts, MAX(event_id) AS reading_id FROM ev
       WHERE event_id % 3 = 0 GROUP BY cx, cy, ts),
pb AS (SELECT event_id, cx, cy, ts FROM ev WHERE event_id % 97 = 1)
SELECT pb.event_id, rd.reading_id,
       date_diff('microsecond', rd.ts, pb.ts) AS gap_us
FROM pb ASOF LEFT JOIN rd
  ON pb.cx = rd.cx AND pb.cy = rd.cy AND pb.ts >= rd.ts"""


_COLOC_CELL = 500          # grid cell side (walk units)
_COLOC_BUCKET_S = 86_400   # one-day time buckets
_COLOC_MIN_MEET = 3        # distinct co-visits to report a pair


def q_colocation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal co-location join (operators/trajectory.py
    colocation_pairs): entity pairs observed in the same (500-unit grid
    cell x day) space-time cell on >= 3 distinct occasions along the
    deterministic walk — the contact-tracing / co-movement primitive.
    Distinct-visit pre-pass, one space-time equi-join, one pair groupBy;
    exact integers end-to-end."""
    from .operators.trajectory import colocation_pairs, random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return colocation_pairs(pos, cell=_COLOC_CELL,
                            bucket_s=_COLOC_BUCKET_S,
                            min_meetings=_COLOC_MIN_MEET)


def sql_colocation_pairs() -> str:
    c = _COLOC_CELL
    b_us = _COLOC_BUCKET_S * 1_000_000
    return f"""WITH {_sql_walk_pos()},
viz AS (
  SELECT DISTINCT user_id,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy,
         epoch_us(ts) // {b_us} AS tb
  FROM pos)
SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*) AS n_meet
FROM viz a JOIN viz b
  ON a.cx = b.cx AND a.cy = b.cy AND a.tb = b.tb
 AND a.user_id < b.user_id
GROUP BY 1, 2
HAVING COUNT(*) >= {_COLOC_MIN_MEET}"""


_HILBERT_ORDER = 8  # 256x256 grid (z=8 tile coords)


def q_hilbert_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert space-filling-curve index (geo/hilbert.py hilbert_encode)
    of every feature's z=8 tile coordinate — the locality-preserving
    clustering key for 100 TB parquet layout (sort/range-partition by h
    before writing; bbox scans then prune to contiguous file runs).
    Integer-only staged Column math, zero shuffle; the oracle replays
    the identical bit-twiddle level-for-level as a DuckDB CTE chain."""
    from .geo.hilbert import hilbert_encode
    from .geo.tilemath import tile_cols
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(_HILBERT_ORDER))
    g = feats.select("feature_id", x.alias("hx"), y.alias("hy"))
    return hilbert_encode(g, _HILBERT_ORDER)


def sql_hilbert_order() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    o = _HILBERT_ORDER
    ctes = [f"""g{o} AS MATERIALIZED (
  SELECT feature_id, x AS hx, y AS hy, x, y, CAST(0 AS BIGINT) AS d
  FROM (SELECT feature_id, {_sql_tile_x(o)} AS x, {_sql_tile_y(o)} AS y
        FROM features))"""]
    n = 1 << o
    for k in range(o - 1, -1, -1):
        s = 1 << k
        ctes.append(f"""g{k} AS MATERIALIZED (
  SELECT feature_id, hx, hy,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
              ELSE x END AS x,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
              ELSE y END AS y,
         d + {s * s} * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END) AS d
  FROM (SELECT *, (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry
        FROM g{k + 1}))""")
    return (f"WITH {FEATURES_ORACLE_SQL},\n" + ",\n".join(ctes)
            + "\nSELECT feature_id, hx, hy, CAST(d AS BIGINT) AS h FROM g0")


_SETSIM_CELL = 2000        # visited-cell token grid
_SETSIM_TAU = (1, 2)       # Jaccard threshold as an exact rational


def q_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (operators/setsim.py
    set_similarity_join — prefix filtering, AllPairs/PPJoin family):
    user pairs whose distinct visited-cell sets have Jaccard >= 1/2.
    Completeness is the prefix-filter THEOREM (rarest-first global
    token order), not an LSH recall curve; the oracle is the
    independent brute token self-join, so the gate proves the filter
    loses no pairs.  Integer cross-multiplied threshold test."""
    from .geo.tilemath import floor_div
    from .operators.setsim import set_similarity_join
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    toks = pos.select(
        "user_id",
        (floor_div(F.col("x"), _SETSIM_CELL) * 100_000
         + floor_div(F.col("y"), _SETSIM_CELL)).alias("tok"))
    return set_similarity_join(toks, "user_id", "tok",
                               tau_num=_SETSIM_TAU[0],
                               tau_den=_SETSIM_TAU[1])


def sql_setsim_join() -> str:
    c = _SETSIM_CELL
    num, den = _SETSIM_TAU
    return f"""WITH {_sql_walk_pos()},
s AS (
  SELECT DISTINCT user_id AS sid,
         CAST(floor(x / {c}.0) AS BIGINT) * 100000
           + CAST(floor(y / {c}.0) AS BIGINT) AS tok
  FROM pos),
sz AS (SELECT sid, COUNT(*) AS sz FROM s GROUP BY sid),
i AS (
  SELECT a.sid AS id_a, b.sid AS id_b, COUNT(*) AS n_inter
  FROM s a JOIN s b ON a.tok = b.tok AND a.sid < b.sid
  GROUP BY 1, 2)
SELECT id_a, id_b, n_inter, za.sz + zb.sz - n_inter AS n_union
FROM i JOIN sz za ON za.sid = i.id_a JOIN sz zb ON zb.sid = i.id_b
WHERE ({den} + {num}) * n_inter >= {num} * (za.sz + zb.sz)"""


_KM_K = 8
_KM_ITERS = 3
_KM_SALT = "kmeans-r5"


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Lloyd k-means (operators/cluster.py kmeans_integer) over
    the walk positions: content-hashed seeds, exact-long argmin
    assignment (d2*k+cid fold), floor-div centroid updates, fixed 3
    iterations — the centroid-based clustering sibling of the dbscan
    gate, value-hashed against an unrolled-CTE replay (the pagerank
    oracle pattern)."""
    from .operators.cluster import kmeans_integer
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return kmeans_integer(pos, "x", "y", k=_KM_K, iters=_KM_ITERS,
                          salt=_KM_SALT)


def _sql_kmeans_ctes() -> "tuple[list[str], str, str]":
    """(ctes, final_centroid_table, assignment_key_expr) for the
    unrolled Lloyd replay — shared by the kmeans_cells and
    silhouette_score oracles."""
    k, T = _KM_K, _KM_ITERS
    h = ("CAST(('0x' || substr(md5(concat_ws(chr(31), '" + _KM_SALT
         + "', CAST(x AS VARCHAR), CAST(y AS VARCHAR))), 1, 15)) "
         "AS BIGINT)")
    key = f"((p.x - c.cx)*(p.x - c.cx) + (p.y - c.cy)*(p.y - c.cy)) * {k} + c.cent_id"
    ctes = [_sql_walk_pos(), f"""pts AS MATERIALIZED (
  SELECT x, y, COUNT(*) AS w FROM pos GROUP BY x, y),
c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, x, y) - 1 AS INTEGER)
           AS cent_id,
         x AS cx, y AS cy
  FROM (SELECT x, y, {h} AS h FROM (SELECT DISTINCT x, y FROM pts))
  ORDER BY h, x, y LIMIT {k})"""]
    for i in range(T):
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT p.x, p.y, p.w, CAST(MIN({key}) % {k} AS INTEGER) AS cid
  FROM pts p CROSS JOIN c{i} c GROUP BY p.x, p.y, p.w),
c{i + 1} AS MATERIALIZED (
  SELECT c.cent_id,
         COALESCE((s.sx - ((s.sx % s.n) + s.n) % s.n) // s.n, c.cx)
           AS cx,
         COALESCE((s.sy - ((s.sy % s.n) + s.n) % s.n) // s.n, c.cy)
           AS cy
  FROM c{i} c LEFT JOIN (
    SELECT cid, SUM(x * w) AS sx, SUM(y * w) AS sy, SUM(w) AS n
    FROM a{i} GROUP BY cid) s ON s.cid = c.cent_id)""")
    return ctes, f"c{T}", key


def sql_kmeans_cells() -> str:
    k, T = _KM_K, _KM_ITERS
    ctes, cfin, key = _sql_kmeans_ctes()
    ctes.append(f"""fin AS (
  SELECT p.w, CAST(MIN({key}) % {k} AS INTEGER) AS cid
  FROM pts p CROSS JOIN {cfin} c GROUP BY p.x, p.y, p.w)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c.cent_id, c.cx, c.cy, CAST(COALESCE(m.n, 0) AS BIGINT)
         AS n_members
FROM {cfin} c LEFT JOIN (SELECT cid, SUM(w) AS n FROM fin GROUP BY cid) m
  ON m.cid = c.cent_id""")


_ESDA_STEP = 5.0    # degrees per grid cell: 72x36 grid over the globe
_STAY_CELL = 4000          # stay-point cell side (walk units, 4x jump)
_STAY_GAP_US = 172_800_000_000    # 48 h max inter-ping gap in a dwell
_STAY_DWELL_US = 3_600_000_000    # keep dwells >= 1 h

_SQL_ESDA_OFFS = ("offs AS (SELECT * FROM (VALUES "
                  "(-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)"
                  ") AS t(dx, dy))")


def _esda_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature counts on the coarse ESDA grid — the shared input of the
    morans_i / getis_ord gates (one row per occupied cell, exact long
    counts)."""
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    return (feats.select(
        F.floor(F.col("lon") / F.lit(_ESDA_STEP)).cast("long").alias("cx"),
        F.floor(F.col("lat") / F.lit(_ESDA_STEP)).cast("long").alias("cy"))
        .groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n_feat")))


def _sql_esda_cells() -> str:
    from .sources.features import FEATURES_ORACLE_SQL
    return f"""{FEATURES_ORACLE_SQL},
cells AS (
  SELECT CAST(floor(lon / {_ESDA_STEP!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_ESDA_STEP!r}) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM features GROUP BY 1, 2)"""


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of feature density on the 5-degree grid
    (operators/spatialstats.py morans_i): n-scaled deviations
    z = n·v − S1 keep the cross-product and denominator sums exact
    longs; queen contiguity is one explode(x8) + equi-join — the
    spatial-clustering yes/no statistic."""
    from .operators.spatialstats import morans_i

    return morans_i(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat")


def sql_morans_i() -> str:
    return f"""WITH {_sql_esda_cells()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1 FROM cells),
z AS (SELECT cx, cy, n * v - s1 AS z, n FROM cells, tot),
{_SQL_ESDA_OFFS},
p AS (
  SELECT a.z AS za, b.z AS zb
  FROM z a CROSS JOIN offs o
  JOIN z b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
             CAST(SUM(za * zb) AS BIGINT) AS cross_num FROM p),
d AS (SELECT CAST(MAX(n) AS BIGINT) AS n_cells,
             CAST(SUM(z * z) AS BIGINT) AS den FROM z)
SELECT n_cells, w_pairs, cross_num, den,
       CASE WHEN n_cells > 1
            THEN CAST(-1.0 AS DOUBLE) / CAST(n_cells - 1 AS DOUBLE)
            END AS e_i,
       CASE WHEN den > 0 AND w_pairs > 0
            THEN (CAST(n_cells AS DOUBLE) * CAST(cross_num AS DOUBLE))
                 / (CAST(w_pairs AS DOUBLE) * CAST(den AS DOUBLE))
            END AS moran_i
FROM d, c"""


def q_getis_ord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-score per 5-degree cell
    (operators/spatialstats.py getis_ord_gi): exact scaled numerator
    n·T − k·S1 over the self-inclusive queen neighborhood, one pinned
    √-chain per cell — the per-cell WHERE of which morans_i is the
    whether."""
    from .operators.spatialstats import getis_ord_gi

    return getis_ord_gi(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat")


def sql_getis_ord() -> str:
    return f"""WITH {_sql_esda_cells()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1,
               CAST(SUM(v * v) AS BIGINT) AS s2 FROM cells),
offs AS (SELECT * FROM (VALUES
  (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
) AS t(dx, dy)),
nb AS (
  SELECT a.cx, a.cy, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(b.v) AS BIGINT) AS t_sum
  FROM cells a CROSS JOIN offs o
  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  GROUP BY 1, 2)
SELECT a.cx AS x, a.cy AS y, a.v AS v, nb.k AS k, nb.t_sum AS t_sum,
       n * nb.t_sum - nb.k * s1 AS g_num,
       CASE WHEN n * s2 - s1 * s1 > 0 AND n * nb.k - nb.k * nb.k > 0
             AND n > 1
            THEN CAST(n * nb.t_sum - nb.k * s1 AS DOUBLE)
                 / sqrt(CAST((n * s2 - s1 * s1)
                             * (n * nb.k - nb.k * nb.k) AS DOUBLE)
                        / CAST(n - 1 AS DOUBLE))
            END AS gi
FROM cells a JOIN nb ON nb.cx = a.cx AND nb.cy = a.cy, tot"""


def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point (dwell) detection along the deterministic walk
    (operators/trajectory.py stay_points): gaps-and-islands over
    (cell, time-gap) change flags — one exchange on the entity key;
    every output column an exact long.  The home/work/POI-visit
    primitive."""
    from .operators.trajectory import random_walk_positions, stay_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return stay_points(pos, cell=_STAY_CELL, gap_us=_STAY_GAP_US,
                       min_dwell_us=_STAY_DWELL_US)


def sql_stay_points() -> str:
    c = _STAY_CELL
    return f"""WITH {_sql_walk_pos()},
q AS (
  SELECT user_id, ts, event_id,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy,
         epoch_us(ts) AS us
  FROM pos),
f AS (
  SELECT user_id, cx, cy, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR cx <> lag(cx) OVER w OR cy <> lag(cy) OVER w
                OR us - lag(us) OVER w > {_STAY_GAP_US}
              THEN 1 ELSE 0 END AS brk,
         ROW_NUMBER() OVER w AS rn
  FROM q
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
e AS (
  SELECT user_id, cx, cy, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY rn
                        ROWS UNBOUNDED PRECEDING) AS ep
  FROM f),
a AS (
  SELECT user_id, ep,
         CAST(MIN(cx) AS BIGINT) AS cx, CAST(MIN(cy) AS BIGINT) AS cy,
         MIN(us) AS enter_us, MAX(us) AS exit_us,
         CAST(COUNT(*) AS BIGINT) AS n_pings
  FROM e GROUP BY 1, 2)
SELECT user_id, cx, cy, enter_us, exit_us, n_pings,
       exit_us - enter_us AS dwell_us
FROM a WHERE exit_us - enter_us >= {_STAY_DWELL_US}"""


_MK_CELL = 8192


def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell Mann-Kendall trend over daily activity counts along the
    deterministic walk (operators/spatialstats.py mann_kendall_cells):
    S = Σ sign(c_j − c_i) in pure integer arithmetic; the pair volume
    is calendar-bounded (d ≤ 30 active days in this corpus), never
    event-bounded."""
    from .operators.spatialstats import mann_kendall_cells
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return mann_kendall_cells(pos, cell=_MK_CELL)


def sql_emerging_hotspots() -> str:
    c = _MK_CELL
    return f"""WITH {_sql_walk_pos()},
d AS (
  SELECT CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         COUNT(*) AS n
  FROM pos GROUP BY 1, 2, 3),
p AS (
  SELECT l.cx, l.cy,
         CASE WHEN r.n > l.n THEN 1
              WHEN r.n < l.n THEN -1 ELSE 0 END AS sg
  FROM d l JOIN d r ON l.cx = r.cx AND l.cy = r.cy AND l.day < r.day),
s AS (SELECT cx, cy, CAST(SUM(sg) AS BIGINT) AS s_stat
      FROM p GROUP BY 1, 2),
g AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM d GROUP BY 1, 2)
SELECT g.cx, g.cy, g.n_days,
       COALESCE(s.s_stat, 0) AS s_stat,
       CASE WHEN COALESCE(s.s_stat, 0) > 0 THEN 'up'
            WHEN COALESCE(s.s_stat, 0) < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM g LEFT JOIN s ON s.cx = g.cx AND s.cy = g.cy"""


_KNOX_EPS = 1000                       # space threshold (micro-degrees)
_KNOX_TAU_US = 2 * 3600 * 1_000_000    # time threshold (2 h in micros)
_RIPLEY_RADII = [250, 500, 1000, 2000]


def q_knox_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction statistic over the deterministic
    walk (operators/spatialstats.py knox_pairs): exact int64 pair
    counts via one eps-grid block join (space + joint) and one
    tau-bucket block join (time) — the quadratic pair space is never
    materialized; ``expected`` is the one pinned divide."""
    from .operators.spatialstats import knox_pairs
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP).select(
        F.col("event_id").alias("i"), "x", "y",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t"))
    return knox_pairs(pos, eps=_KNOX_EPS, tau=_KNOX_TAU_US)


def sql_knox_test() -> str:
    e2 = _KNOX_EPS * _KNOX_EPS
    tau = _KNOX_TAU_US
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (
  SELECT event_id AS i, x, y, epoch_us(CAST(ts AS TIMESTAMP)) AS t
  FROM pos),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM p),
sp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS space_pairs,
         CAST(COALESCE(SUM(CASE WHEN abs(a.t - b.t) <= {tau}
                                THEN 1 END), 0) AS BIGINT) AS joint_pairs
  FROM p a JOIN p b ON a.i < b.i
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {e2}),
tp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS time_pairs
  FROM p a JOIN p b ON a.i < b.i AND abs(a.t - b.t) <= {tau})
SELECT n_points,
       CAST(n_points * (n_points - 1) / 2 AS BIGINT) AS n_pairs,
       space_pairs, time_pairs, joint_pairs,
       CASE WHEN n_points > 1 THEN
         CAST(space_pairs AS DOUBLE) * CAST(time_pairs AS DOUBLE)
           / CAST(n_points * (n_points - 1) / 2 AS DOUBLE)
       END AS expected
FROM c, sp, tp"""


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K radius ladder over the deterministic walk
    (operators/spatialstats.py ripley_k): the whole ladder reuses ONE
    r_max block join with per-rung conditional integer sums; bbox area
    and counts exact int64, k_hat the one pinned double chain."""
    from .operators.spatialstats import ripley_k
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP).select(
        F.col("event_id").alias("i"), "x", "y")
    return ripley_k(pos, _RIPLEY_RADII)


def sql_ripley_k() -> str:
    rmax2 = _RIPLEY_RADII[-1] * _RIPLEY_RADII[-1]
    sums = ",\n         ".join(
        f"CAST(COALESCE(SUM(CASE WHEN d2 <= {r * r} THEN 1 END), 0)"
        f" AS BIGINT) AS c{r}" for r in _RIPLEY_RADII)
    rungs = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS r, c{r} AS pair_cnt FROM c"
        for r in _RIPLEY_RADII)
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS i, x, y FROM pos),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST((MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS BIGINT)
               AS area
      FROM p),
d AS (SELECT (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
      FROM p a JOIN p b ON a.i < b.i
       AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {rmax2}),
c AS MATERIALIZED (SELECT {sums} FROM d),
l AS ({rungs})
SELECT l.r, l.pair_cnt, s.n_points, s.area,
       CASE WHEN s.n_points > 1 THEN
         CAST(l.pair_cnt * 2 AS DOUBLE) * CAST(s.area AS DOUBLE)
           / CAST(s.n_points * (s.n_points - 1) AS DOUBLE)
       END AS k_hat
FROM l, s"""


_BBOX = (-60.0, -20.0, -45.0, -25.0)  # lon_lo, lon_hi, lat_lo, lat_hi
_BBOX_ZOOM = 6
# cover <= 9x6 = 54 cells < 64 buckets: strict bucket pruning is
# GUARANTEED by pigeonhole (54 distinct cells select at most 54 buckets)
_BBOX_BUCKETS = 64


def q_bbox_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewport (bbox) query through the PRODUCTION bucketed corpus
    (operators/viewport.py): cell-cover IN-probe → bucket pruning
    (SelectedBucketsCount plan-asserted in tests/test_viewport.py) →
    exact lon/lat residual.  The oracle is the brute full-scan
    filter."""
    import os
    import tempfile

    from .operators.viewport import bbox_query, write_viewport_corpus
    from .sources.features import _source_fingerprint, \
        features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir) \
        .select("feature_id", "lon", "lat")
    tag = _source_fingerprint(sf_dir)
    table = f"viewport_corpus_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"mfs_viewport_{tag}")
    # overwrite-write per call: idempotent / stale-catalog-safe (the
    # knn_ring recipe); fleet-scale corpora are written once out-of-band
    write_viewport_corpus(feats, table, path, zoom=_BBOX_ZOOM,
                          n_buckets=_BBOX_BUCKETS)
    lon_lo, lon_hi, lat_lo, lat_hi = _BBOX
    return bbox_query(spark, table, lon_lo, lon_hi, lat_lo, lat_hi,
                      zoom=_BBOX_ZOOM)


def sql_bbox_query() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    lon_lo, lon_hi, lat_lo, lat_hi = _BBOX
    return f"""WITH {FEATURES_ORACLE_SQL}
SELECT feature_id, lon, lat
FROM features
WHERE lon >= {lon_lo!r} AND lon <= {lon_hi!r}
  AND lat >= {lat_lo!r} AND lat <= {lat_hi!r}"""


def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell LISA quadrants of feature density on the 5-degree grid
    (operators/spatialstats.py local_moran): exact long z·lag numerators
    + HH/LL/HL/LH classes — the map of which morans_i is the single
    number."""
    from .operators.spatialstats import local_moran

    return local_moran(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat")


def sql_local_moran() -> str:
    return f"""WITH {_sql_esda_cells()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1 FROM cells),
z AS (SELECT cx, cy, n * v - s1 AS z FROM cells, tot),
{_SQL_ESDA_OFFS},
lg AS (
  SELECT a.cx, a.cy, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
         CAST(SUM(b.z) AS BIGINT) AS lag_s
  FROM z a CROSS JOIN offs o
  JOIN z b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  GROUP BY 1, 2)
SELECT z.cx AS x, z.cy AS y, z.z AS z_s,
       COALESCE(lg.n_nbrs, 0) AS n_nbrs, lg.lag_s,
       z.z * lg.lag_s AS local_num,
       CASE WHEN lg.lag_s IS NULL THEN NULL
            WHEN z.z = 0 OR lg.lag_s = 0 THEN 'ZERO'
            WHEN z.z > 0 AND lg.lag_s > 0 THEN 'HH'
            WHEN z.z < 0 AND lg.lag_s < 0 THEN 'LL'
            WHEN z.z > 0 THEN 'HL' ELSE 'LH' END AS quad
FROM z LEFT JOIN lg ON lg.cx = z.cx AND lg.cy = z.cy"""


_HD_BLOCKS = 25      # entity blocking: user_id % 25
_HD_MAX_PTS = 24     # deterministic per-entity point cap


def q_hausdorff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric squared Hausdorff distance between co-blocked user
    trajectories (operators/trajectory.py hausdorff_pairs): integer
    milli-degree coordinates (the features formula), per-user point cap
    via the deterministic (ts, event_id) bottom-k, hash blocking —
    exact longs end to end."""
    from pyspark.sql import Window

    from .operators.trajectory import hausdorff_pairs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = (ev.select("user_id", "ts", "event_id")
           .withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= _HD_MAX_PTS)
           .select(F.pmod(F.col("user_id"), F.lit(_HD_BLOCKS))
                   .alias("blk"),
                   F.col("user_id").alias("ent"),
                   F.col("event_id").alias("idx"),
                   ((F.col("event_id") * 7919) % 360000).alias("x"),
                   ((F.col("event_id") * 104729) % 170000).alias("y")))
    return hausdorff_pairs(pts, "ent", "blk", "idx", "x", "y")


def sql_hausdorff_pairs() -> str:
    return f"""WITH pts AS (
  SELECT user_id % {_HD_BLOCKS} AS blk, user_id AS ent, event_id AS idx,
         (event_id * 7919) % 360000 AS x,
         (event_id * 104729) % 170000 AS y
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) <= {_HD_MAX_PTS}),
c AS (
  SELECT a.ent AS u, b.ent AS v, a.idx AS ai, b.idx AS bi,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b ON a.blk = b.blk AND a.ent < b.ent),
ha AS (SELECT u, v, CAST(MAX(m) AS BIGINT) AS h2_ab FROM
       (SELECT u, v, ai, MIN(d2) AS m FROM c GROUP BY 1, 2, 3)
       GROUP BY 1, 2),
hb AS (SELECT u, v, CAST(MAX(m) AS BIGINT) AS h2_ba FROM
       (SELECT u, v, bi, MIN(d2) AS m FROM c GROUP BY 1, 2, 3)
       GROUP BY 1, 2)
SELECT ha.u, ha.v, ha.h2_ab, hb.h2_ba,
       GREATEST(ha.h2_ab, hb.h2_ba) AS h2
FROM ha JOIN hb ON ha.u = hb.u AND ha.v = hb.v"""



_HULL_QMOD = 5
_HULL_CELL = 16384


def q_convex_hull_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-grid-cell convex hull boundary points (geo/hull.py — Arrow
    monotone chain, exact integer cross products) over the hashed
    lineitem scatter.  The oracle is the independent O(n³) supporting-
    line characterization, so a value-hash match proves the chain's
    boundary set, collinear points included."""
    from .geo.hull import convex_hull_cells
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.filter(F.col("feature_id") % _HULL_QMOD == 0)
           .select(F.pmod(F.col("feature_id") * 7919,
                          F.lit(360000)).alias("x"),
                   F.pmod(F.col("feature_id") * 104729,
                          F.lit(170000)).alias("y"))
           .distinct())
    return convex_hull_cells(pts, _HULL_CELL)


def sql_convex_hull_cells() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    c, q = _HULL_CELL, _HULL_QMOD
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT DISTINCT ((feature_id * 7919) % 360000) // {c} AS cx,
         ((feature_id * 104729) % 170000) // {c} AS cy,
         (feature_id * 7919) % 360000 AS x,
         (feature_id * 104729) % 170000 AS y
  FROM features WHERE feature_id % {q} = 0),
cnt AS (SELECT cx, cy, COUNT(*) AS n FROM pts GROUP BY 1, 2)
SELECT p.cx, p.cy, p.x, p.y
FROM pts p JOIN cnt t ON t.cx = p.cx AND t.cy = p.cy
WHERE t.n = 1 OR EXISTS (
  SELECT 1 FROM pts q
  WHERE q.cx = p.cx AND q.cy = p.cy AND (q.x <> p.x OR q.y <> p.y)
    AND NOT EXISTS (
      SELECT 1 FROM pts r
      WHERE r.cx = p.cx AND r.cy = p.cy
        AND (q.x - p.x) * (r.y - p.y)
            - (q.y - p.y) * (r.x - p.x) < 0))"""


def q_heading_octants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading histogram over the integer random walk
    (operators/trajectory.py heading_octants — exact octant
    classification, no atan2)."""
    from .operators.trajectory import heading_octants, \
        random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return heading_octants(pos)


def sql_heading_octants() -> str:
    return f"""WITH {_sql_walk_pos()},
st AS (
  SELECT user_id, x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
o AS (
  SELECT user_id,
         CASE WHEN dx = 0 AND dy = 0 THEN -1
              WHEN abs(dx) > abs(dy) AND dx > 0 THEN 0
              WHEN abs(dx) > abs(dy) THEN 4
              WHEN abs(dy) > abs(dx) AND dy > 0 THEN 2
              WHEN abs(dy) > abs(dx) THEN 6
              WHEN dx > 0 AND dy > 0 THEN 1
              WHEN dx < 0 AND dy > 0 THEN 3
              WHEN dx < 0 AND dy < 0 THEN 5
              ELSE 7 END AS octant,
         abs(dx) + abs(dy) AS l1
  FROM st WHERE dx IS NOT NULL)
SELECT octant, COUNT(*) AS n_steps, CAST(SUM(l1) AS BIGINT) AS sum_l1,
       COUNT(DISTINCT user_id) AS n_entities
FROM o GROUP BY 1"""


_DISSOLVE_CELL = 1024
_DISSOLVE_PACK = 1 << 20


def q_region_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-cell region dissolve (operators/cluster.py region_dissolve):
    cells above the global mean occupancy merge through queen adjacency
    into contiguous regions via connected components.  Substrate: a
    multi-modal scatter — each user gets a hashed home on a 5×3 grid of
    centers 40k apart, each event a ±2k jitter — so the dissolve finds
    the 15 home blobs, not one percolated sheet.  The threshold is the
    exact integer form of n > mean: n·C > S, resolved driver-side to
    min_pts = S//C + 1 (equivalent for integers; the oracle states the
    product form directly)."""
    from .operators.cluster import region_dissolve

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        (F.pmod(F.col("user_id") * 7919, F.lit(5)) * 40000
         + F.pmod(F.col("event_id") * 7919, F.lit(4001))).alias("x"),
        (F.pmod(F.col("user_id") * 104729, F.lit(3)) * 40000
         + F.pmod(F.col("event_id") * 104729, F.lit(4001))).alias("y"))
    from .geo.tilemath import floor_div
    tot = (pts.groupBy(floor_div(F.col("x"), _DISSOLVE_CELL),
                       floor_div(F.col("y"), _DISSOLVE_CELL))
           .agg(F.count(F.lit(1)).alias("n"))
           .agg(F.count(F.lit(1)).alias("c"),
                F.sum("n").alias("s")).first())
    min_pts = tot["s"] // tot["c"] + 1
    return region_dissolve(pts, _DISSOLVE_CELL,
                           int(min_pts), pack=_DISSOLVE_PACK)


def sql_region_dissolve() -> str:
    c, pk = _DISSOLVE_CELL, _DISSOLVE_PACK
    return f"""WITH RECURSIVE pts AS (
  SELECT ((user_id * 7919) % 5) * 40000
           + (event_id * 7919) % 4001 AS x,
         ((user_id * 104729) % 3) * 40000
           + (event_id * 104729) % 4001 AS y
  FROM events),
occ AS (
  SELECT x // {c} AS cx, y // {c} AS cy, COUNT(*) AS n
  FROM pts GROUP BY 1, 2),
tot AS (SELECT COUNT(*) AS cc, CAST(SUM(n) AS BIGINT) AS ss FROM occ),
hot AS (
  SELECT cx, cy, n, cx * {pk} + cy AS id
  FROM occ, tot WHERE n * tot.cc > tot.ss),
e AS (
  SELECT a.id AS src, b.id AS dst FROM hot a JOIN hot b
  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.id <> b.id),
r AS (
  SELECT id AS node, id AS comp FROM hot
  UNION SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.node),
lab AS (SELECT node, MIN(comp) AS region FROM r GROUP BY 1)
SELECT l.region, COUNT(*) AS n_cells, CAST(SUM(h.n) AS BIGINT) AS n_pts,
       MIN(h.cx) AS min_cx, MIN(h.cy) AS min_cy,
       MAX(h.cx) AS max_cx, MAX(h.cy) AS max_cy
FROM hot h JOIN lab l ON l.node = h.id
GROUP BY 1"""



_EDR_CELL = 2048
_EDR_MAX_MOVES = 40
_EDR_BLOCKS = 100


def q_traj_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-aware trajectory similarity (operators/trajectory.py
    traj_edit_distance): cell-sequence signatures (consecutive repeats
    collapsed, 26-letter cell hash, 40-move cap) + exact Levenshtein
    over hash-blocked pairs — the sequence-alignment sibling of
    hausdorff_pairs."""
    from .operators.trajectory import random_walk_positions, \
        traj_edit_distance

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return traj_edit_distance(pos, cell=_EDR_CELL,
                              max_moves=_EDR_MAX_MOVES,
                              n_blocks=_EDR_BLOCKS)


def sql_traj_edit_distance() -> str:
    c, mm, nb = _EDR_CELL, _EDR_MAX_MOVES, _EDR_BLOCKS
    return f"""WITH {_sql_walk_pos()},
cells AS (
  SELECT user_id, ts, event_id,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy
  FROM pos),
flagged AS (
  SELECT *, CASE WHEN lag(cx) OVER w IS NULL
                   OR lag(cx) OVER w <> cx
                   OR lag(cy) OVER w <> cy THEN 1 ELSE 0 END AS keep
  FROM cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
moves AS (
  SELECT user_id,
         chr(97 + CAST(((cx * 31 + cy) % 26 + 26) % 26 AS INT)) AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM flagged WHERE keep = 1),
sig AS (
  SELECT user_id, string_agg(s, '' ORDER BY rn) AS sig
  FROM moves WHERE rn <= {mm} GROUP BY 1),
p AS (SELECT user_id, sig, user_id % {nb} AS blk FROM sig)
SELECT a.user_id AS u, b.user_id AS v,
       length(a.sig) AS len_u, length(b.sig) AS len_v,
       levenshtein(a.sig, b.sig) AS dist
FROM p a JOIN p b ON a.blk = b.blk AND a.user_id < b.user_id"""



_QSPLIT_Z0, _QSPLIT_ZMAX, _QSPLIT_CAP = 3, 7, 400


def q_adaptive_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-balanced tile pyramid (operators/quadtree.py
    adaptive_tile_split): tiles over cap split into children until the
    cap holds or z_max — per level one count + one broadcast semi-join
    over a monotonically shrinking point set."""
    from .operators.quadtree import adaptive_tile_split
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    return adaptive_tile_split(feats, _QSPLIT_Z0, _QSPLIT_ZMAX,
                               _QSPLIT_CAP)


def sql_adaptive_tiles() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    cap = _QSPLIT_CAP
    ctes = [FEATURES_ORACLE_SQL + """,
p3 AS MATERIALIZED (SELECT lon, lat FROM features)"""]
    emits = []
    for z in range(_QSPLIT_Z0, _QSPLIT_ZMAX + 1):
        ctes.append(f"""t{z} AS MATERIALIZED (
  SELECT lon, lat, {_sql_tile_x(z)} AS x, {_sql_tile_y(z)} AS y
  FROM p{z}),
c{z} AS MATERIALIZED (
  SELECT x, y, COUNT(*) AS n FROM t{z} GROUP BY 1, 2)""")
        if z < _QSPLIT_ZMAX:
            emits.append(f"SELECT {z} AS z, x, y, n FROM c{z} "
                         f"WHERE n <= {cap}")
            ctes.append(f"""p{z + 1} AS MATERIALIZED (
  SELECT t.lon, t.lat FROM t{z} t
  JOIN (SELECT x, y FROM c{z} WHERE n > {cap}) h
    ON t.x = h.x AND t.y = h.y)""")
        else:
            emits.append(f"SELECT {z} AS z, x, y, n FROM c{z}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(emits))


_RECT_CELL = 8192


def _rects_sql(table: str, key: str) -> str:
    return (f"SELECT {key} AS id, "
            f"({key} * 7919) % 100000 AS x0, "
            f"({key} * 104729) % 100000 AS y0, "
            f"({key} * 7919) % 100000 + ({key} * 31) % 4000 + 100 AS x1, "
            f"({key} * 104729) % 100000 + ({key} * 17) % 4000 + 100 AS y1 "
            f"FROM {table}")


def _rects_df(df: DataFrame, key: str, idc: str) -> DataFrame:
    k = F.col(key)
    x0 = F.pmod(k * 7919, F.lit(100000))
    y0 = F.pmod(k * 104729, F.lit(100000))
    return df.select(
        k.alias(idc), x0.alias("x0"), y0.alias("y0"),
        (x0 + F.pmod(k * 31, F.lit(4000)) + 100).alias("x1"),
        (y0 + F.pmod(k * 17, F.lit(4000)) + 100).alias("y1"))


def q_rect_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-intersection spatial join (geo/overlay.py
    rect_overlap_join): covering-cell candidates + exact closed-interval
    test; the brute theta join lives only in the oracle, so the
    value-hash match proves candidate completeness."""
    from .geo.overlay import rect_overlap_join

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    a = _rects_df(part, "p_partkey", "a_id")
    b = _rects_df(supp, "s_suppkey", "b_id")
    return rect_overlap_join(a, b, cell=_RECT_CELL)


def sql_rect_overlap_join() -> str:
    return f"""WITH a AS ({_rects_sql("part", "p_partkey")}),
b AS ({_rects_sql("supplier", "s_suppkey")})
SELECT a.id AS a_id, b.id AS b_id,
       GREATEST(a.x0, b.x0) AS ix0, GREATEST(a.y0, b.y0) AS iy0,
       LEAST(a.x1, b.x1) AS ix1, LEAST(a.y1, b.y1) AS iy1,
       CAST((LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0))
            * (LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0)) AS BIGINT)
         AS inter_area
FROM a JOIN b
  ON a.x0 <= b.x1 AND b.x0 <= a.x1
 AND a.y0 <= b.y1 AND b.y0 <= a.y1"""


GEOM_QUERIES = {
    "convex_hull_cells": (q_convex_hull_cells, sql_convex_hull_cells),
    "heading_octants": (q_heading_octants, sql_heading_octants),
    "traj_edit_distance": (q_traj_edit_distance, sql_traj_edit_distance),
    "adaptive_tiles": (q_adaptive_tiles, sql_adaptive_tiles),
    "rect_overlap_join": (q_rect_overlap_join, sql_rect_overlap_join),
    "region_dissolve": (q_region_dissolve, sql_region_dissolve),
    "geom_stats": (q_geom_stats, sql_geom_stats),
    "zonal_stats": (q_zonal_stats, sql_zonal_stats),
    "st_asof_join": (q_st_asof_join, sql_st_asof_join),
    "rdp_simplify": (q_rdp_simplify, sql_rdp_simplify),
    "geohash_assign": (q_geohash_assign, sql_geohash_assign),
    "geohash_ring_count": (q_geohash_ring_count, sql_geohash_ring_count),
    "traj_stats": (q_traj_stats, sql_traj_stats),
    "heatmap_tiles": (q_heatmap_tiles, sql_heatmap_tiles),
    "od_flows": (q_od_flows, sql_od_flows),
    "st_cube": (q_st_cube, sql_st_cube),
    "idw_interpolate": (q_idw_interpolate, sql_idw_interpolate),
    "trending_tiles": (q_trending_tiles, sql_trending_tiles),
    "polyfill_cover": (q_polyfill_cover, sql_polyfill_cover),
    "trip_segments": (q_trip_segments, sql_trip_segments),
    "radius_join": (q_radius_join, sql_radius_join),
    "radius_join_geo": (q_radius_join_geo, None),
    "hex_assign": (q_hex_assign, sql_hex_assign),
    "hex_ring_agg": (q_hex_ring_agg, sql_hex_ring_agg),
    "dbscan_clusters": (q_dbscan_clusters, sql_dbscan_clusters),
    "seg_intersections": (q_seg_intersections, sql_seg_intersections),
    "hex_hotspot": (q_hex_hotspot, sql_hex_hotspot),
    "map_match": (q_map_match, sql_map_match),
    "polygon_validity": (q_polygon_validity, sql_polygon_validity),
    "hex_polyfill": (q_hex_polyfill, sql_hex_polyfill),
    "knn_join": (q_knn_join, sql_knn_join),
    "spherical_area": (q_spherical_area, sql_spherical_area),
    "geofence_flag": (q_geofence_flag, sql_geofence_flag),
    "line_interpolate": (q_line_interpolate, sql_line_interpolate),
    "tile_pyramid": (q_tile_pyramid, sql_tile_pyramid),
    "colocation_pairs": (q_colocation_pairs, sql_colocation_pairs),
    "hilbert_order": (q_hilbert_order, sql_hilbert_order),
    "setsim_join": (q_setsim_join, sql_setsim_join),
    "kmeans_cells": (q_kmeans_cells, sql_kmeans_cells),
    "morans_i": (q_morans_i, sql_morans_i),
    "getis_ord": (q_getis_ord, sql_getis_ord),
    "stay_points": (q_stay_points, sql_stay_points),
    "emerging_hotspots": (q_emerging_hotspots, sql_emerging_hotspots),
    "knox_test": (q_knox_test, sql_knox_test),
    "ripley_k": (q_ripley_k, sql_ripley_k),
    "bbox_query": (q_bbox_query, sql_bbox_query),
    "local_moran": (q_local_moran, sql_local_moran),
    "hausdorff_pairs": (q_hausdorff_pairs, sql_hausdorff_pairs),
}


_LOF_K = 8
_LOF_RADIUS = 1000
_LOF_SCALE = 10 ** 15


def q_lof_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor over the deterministic walk
    (operators/cluster.py lof_scores): radius-bounded self-kNN on one
    grid join, exact integer reach sums, floor-div scaled reciprocals
    — no float enters any unordered aggregation."""
    from .operators.cluster import lof_scores
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP).select(
        F.col("event_id").alias("i"), "x", "y")
    return lof_scores(pos, k=_LOF_K, radius=_LOF_RADIUS)


def sql_lof_scores() -> str:
    r2 = _LOF_RADIUS * _LOF_RADIUS
    k = _LOF_K
    s = _LOF_SCALE
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS i, x, y FROM pos),
sel AS MATERIALIZED (
  SELECT i, j, d2 FROM (
    SELECT i, j, d2,
           ROW_NUMBER() OVER (PARTITION BY i ORDER BY d2, j) AS r
    FROM (SELECT a.i AS i, b.i AS j,
                 (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
          FROM p a JOIN p b ON a.i <> b.i
           AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {r2}))
  WHERE r <= {k}),
kd AS MATERIALIZED (
  SELECT i, CAST(MAX(d2) AS BIGINT) AS kdist2,
         CAST(COUNT(*) AS BIGINT) AS n_k
  FROM sel GROUP BY 1),
reach AS (
  SELECT s.i, greatest(kj.kdist2, s.d2) AS reach2
  FROM sel s JOIN kd kj ON kj.i = s.j),
per AS (SELECT i, CAST(SUM(reach2) AS BIGINT) AS sum_reach2
        FROM reach GROUP BY 1),
stat AS MATERIALIZED (
  SELECT kd.i, kd.n_k, kd.kdist2, per.sum_reach2
  FROM kd JOIN per USING (i)),
rj AS (
  SELECT s.i,
         CASE WHEN st.sum_reach2 > 0
              THEN (st.n_k * CAST({s} AS BIGINT)) // st.sum_reach2
         END AS r_j,
         CASE WHEN st.sum_reach2 <= 0 THEN 1 ELSE 0 END AS z
  FROM sel s JOIN stat st ON st.i = s.j),
ri AS (SELECT i, CAST(SUM(r_j) AS BIGINT) AS sumr, MAX(z) AS anyz
       FROM rj GROUP BY 1)
SELECT st.i, st.n_k, st.kdist2, st.sum_reach2,
       CASE WHEN ri.anyz = 1 THEN NULL ELSE ri.sumr END AS sum_recip,
       CASE WHEN st.sum_reach2 > 0 AND ri.anyz = 0 THEN
         CAST(st.sum_reach2 AS DOUBLE) * CAST(ri.sumr AS DOUBLE)
           / CAST(st.n_k * st.n_k AS DOUBLE) / {float(s)!r}
       END AS lof
FROM stat st JOIN ri USING (i)"""


GEOM_QUERIES["lof_scores"] = (q_lof_scores, sql_lof_scores)


def q_gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Geary's C of feature density on the 5-degree grid
    (operators/spatialstats.py gearys_c): raw-value neighbor
    differences (exact — differences cancel the mean) over the queen
    join, n-scaled variance denominator, one pinned ratio — the
    local-contrast twin of the morans_i gate on the same cells."""
    from .operators.spatialstats import gearys_c

    return gearys_c(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat")


def sql_gearys_c() -> str:
    return f"""WITH {_sql_esda_cells()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1 FROM cells),
{_SQL_ESDA_OFFS},
p AS (
  SELECT a.v AS va, b.v AS vb
  FROM cells a CROSS JOIN offs o
  JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
             CAST(COALESCE(SUM((va - vb) * (va - vb)), 0) AS BIGINT)
               AS diff_num
      FROM p),
z AS (SELECT n * v - s1 AS z, n FROM cells, tot),
d AS (SELECT CAST(MAX(n) AS BIGINT) AS n_cells,
             CAST(SUM(z * z) AS BIGINT) AS den FROM z)
SELECT n_cells, w_pairs, diff_num, den,
       CASE WHEN n_cells > 1 THEN CAST(1.0 AS DOUBLE) END AS e_c,
       CASE WHEN den > 0 AND w_pairs > 0
            THEN (CAST((n_cells - 1) * n_cells * n_cells AS DOUBLE)
                  * CAST(diff_num AS DOUBLE))
                 / (CAST(2.0 AS DOUBLE) * CAST(w_pairs AS DOUBLE)
                    * CAST(den AS DOUBLE))
            END AS geary_c
FROM d, c"""


GEOM_QUERIES["gearys_c"] = (q_gearys_c, sql_gearys_c)


_Z_ORDER = 16
_Z_SHIFT = 32768                 # walk coords are ±~16k; shift to [0, 2^16)
_Z_BBOX = (30000, 36000, 28000, 34000)   # x_lo, x_hi, y_lo, y_hi (shifted)


def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle query through the Z-ORDER-clustered corpus
    (geo/zorder.py): morton-sorted parquet layout, budgeted quadtree
    range cover pushed as OR-of-BETWEENs (row-group min/max pruning),
    exact residual filter — the oracle is the brute full-scan filter,
    so the gate proves layout + decomposition lose nothing."""
    import os
    import tempfile

    from .geo.zorder import write_zorder_corpus, zorder_bbox_scan
    from .operators.trajectory import random_walk_positions
    from .sources.features import _source_fingerprint

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP).select(
        F.col("event_id").alias("i"),
        (F.col("x") + _Z_SHIFT).alias("x"),
        (F.col("y") + _Z_SHIFT).alias("y"))
    tag = _source_fingerprint(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"mfs_zorder_{tag}")
    # overwrite-write per call: idempotent / stale-layout-safe (the
    # knn_ring recipe); fleet-scale corpora are written once out-of-band
    write_zorder_corpus(pos, path, _Z_ORDER)
    x_lo, x_hi, y_lo, y_hi = _Z_BBOX
    return zorder_bbox_scan(spark, path, x_lo, x_hi, y_lo, y_hi,
                            _Z_ORDER).select("i", "x", "y")


def sql_zorder_scan() -> str:
    x_lo, x_hi, y_lo, y_hi = _Z_BBOX
    return f"""WITH {_sql_walk_pos()}
SELECT event_id AS i,
       x + {_Z_SHIFT} AS x, y + {_Z_SHIFT} AS y
FROM pos
WHERE x + {_Z_SHIFT} BETWEEN {x_lo} AND {x_hi}
  AND y + {_Z_SHIFT} BETWEEN {y_lo} AND {y_hi}"""


GEOM_QUERIES["zorder_scan"] = (q_zorder_scan, sql_zorder_scan)


def q_focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 focal statistics on the shared ESDA density grid
    (operators/raster.py focal_stats): per occupied cell the moving-
    window count/sum/min/max over occupied neighbors plus the one
    pinned-division mean — the raster smoothing primitive, one
    explode(x9) + equi-join."""
    from .operators.raster import focal_stats

    return focal_stats(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat",
                       radius=1, include_self=True)


def sql_focal_mean() -> str:
    offs9 = ", ".join(f"({dx},{dy})" for dx in (-1, 0, 1)
                      for dy in (-1, 0, 1))
    return f"""WITH {_sql_esda_cells()},
offs9 AS (SELECT * FROM (VALUES {offs9}) AS t(dx, dy)),
nb AS (
  SELECT a.cx + dx AS tx, a.cy + dy AS ty, a.v AS sv
  FROM cells a CROSS JOIN offs9)
SELECT c.cx, c.cy, c.v AS n_feat,
       COUNT(*) AS n_nb,
       CAST(SUM(nb.sv) AS BIGINT) AS sum_nb,
       CAST(MIN(nb.sv) AS BIGINT) AS min_nb,
       CAST(MAX(nb.sv) AS BIGINT) AS max_nb,
       CAST(SUM(nb.sv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_nb
FROM cells c JOIN nb ON nb.tx = c.cx AND nb.ty = c.cy
GROUP BY 1, 2, 3"""


def q_d8_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow direction on the ESDA density surface
    (operators/raster.py d8_flow): steepest strictly-downslope occupied
    neighbor by EXACT integer slope² ranking (drop²·{2,1} for
    cardinal/diagonal), ESRI direction codes, sinks flagged."""
    from .operators.raster import d8_flow

    return d8_flow(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat")


def sql_d8_flow() -> str:
    from .operators.raster import D8_DIRS

    dirs = ", ".join(f"({dx},{dy},{code},{dx * dx + dy * dy})"
                     for dx, dy, code in D8_DIRS)
    return f"""WITH {_sql_esda_cells()},
dirs AS (SELECT * FROM (VALUES {dirs}) AS t(dx, dy, code, d2)),
cand AS (
  SELECT a.cx, a.cy, a.v AS z, a.cx + dx AS nx, a.cy + dy AS ny,
         code, d2
  FROM cells a CROSS JOIN dirs),
down AS (
  SELECT c.cx, c.cy, c.code, c.z - b.v AS zd,
         (c.z - b.v) * (c.z - b.v)
           * (CASE WHEN c.d2 = 1 THEN 2 ELSE 1 END) AS key
  FROM cand c JOIN cells b ON b.cx = c.nx AND b.cy = c.ny
  WHERE c.z - b.v > 0),
best AS (
  SELECT cx, cy, code, zd,
         ROW_NUMBER() OVER (PARTITION BY cx, cy
                            ORDER BY key DESC, code ASC) AS r
  FROM down)
SELECT c.cx, c.cy, c.v AS n_feat,
       b.code AS dir, b.zd AS zdrop, b.code IS NULL AS is_sink
FROM cells c
LEFT JOIN (SELECT * FROM best WHERE r = 1) b USING (cx, cy)"""


GEOM_QUERIES["focal_mean"] = (q_focal_mean, sql_focal_mean)
GEOM_QUERIES["d8_flow"] = (q_d8_flow, sql_d8_flow)


_BASIN_ROUNDS = 8  # 2^8 = 256 >> max descending-path length at gate SFs


def q_d8_basins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed delineation on the ESDA density surface
    (operators/raster.py d8_basins): pointer-doubled D8 flow pointers
    label every cell with its basin sink in O(log path) rounds; the
    unrolled oracle replays the identical squaring, so an insufficient
    unroll fails the value hash loudly (sssp evidence pattern)."""
    from .operators.raster import d8_basins

    return d8_basins(_esda_cells(spark, sf_dir), "cx", "cy", "n_feat",
                     rounds=_BASIN_ROUNDS)


def _sql_d8_parent_ctes() -> str:
    """Shared oracle CTE chain: ESDA cells -> D8 steepest-descent best
    neighbor -> parent pointers ``p0``(cx, cy, px, py, is_sink) (sinks
    self-point).  Used by the d8_basins and d8_accum gates."""
    from .operators.raster import D8_DIRS

    dirs = ", ".join(f"({dx},{dy},{code},{dx * dx + dy * dy})"
                     for dx, dy, code in D8_DIRS)
    dxc = " ".join(f"WHEN {code} THEN {dx}" for dx, _dy, code in D8_DIRS)
    dyc = " ".join(f"WHEN {code} THEN {dy}" for _dx, dy, code in D8_DIRS)
    return f"""{_sql_esda_cells()},
dirs AS (SELECT * FROM (VALUES {dirs}) AS t(dx, dy, code, d2)),
cand AS (
  SELECT a.cx, a.cy, a.v AS z, a.cx + dx AS nx, a.cy + dy AS ny,
         code, d2
  FROM cells a CROSS JOIN dirs),
down AS (
  SELECT c.cx, c.cy, c.code, c.z - b.v AS zd,
         (c.z - b.v) * (c.z - b.v)
           * (CASE WHEN c.d2 = 1 THEN 2 ELSE 1 END) AS key
  FROM cand c JOIN cells b ON b.cx = c.nx AND b.cy = c.ny
  WHERE c.z - b.v > 0),
best AS (
  SELECT cx, cy, code FROM (
    SELECT cx, cy, code,
           ROW_NUMBER() OVER (PARTITION BY cx, cy
                              ORDER BY key DESC, code ASC) AS r
    FROM down) WHERE r = 1),
p0 AS MATERIALIZED (
  SELECT c.cx, c.cy,
         CASE WHEN b.code IS NULL THEN c.cx
              ELSE c.cx + CASE b.code {dxc} END END AS px,
         CASE WHEN b.code IS NULL THEN c.cy
              ELSE c.cy + CASE b.code {dyc} END END AS py,
         b.code IS NULL AS is_sink
  FROM cells c LEFT JOIN best b USING (cx, cy))"""


def sql_d8_basins() -> str:
    parts = [_sql_d8_parent_ctes()]
    for i in range(1, _BASIN_ROUNDS + 1):
        parts.append(f""",
p{i} AS MATERIALIZED (
  SELECT a.cx, a.cy, b.px, b.py, a.is_sink
  FROM p{i - 1} a JOIN p{i - 1} b ON b.cx = a.px AND b.cy = a.py)""")
    return ("WITH " + "".join(parts)
            + f"""
SELECT cx, cy, px AS basin_x, py AS basin_y, is_sink
FROM p{_BASIN_ROUNDS}""")


GEOM_QUERIES["d8_basins"] = (q_d8_basins, sql_d8_basins)


_AREAL_GRID = 4096
_AREAL_SCALE = 10 ** 8


def q_areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Areal interpolation (geo/overlay.py areal_interpolate): part
    rectangles carry a deterministic integer value redistributed onto a
    4096-unit grid by exact scaled-integer area weights — the
    polygon→raster reapportionment primitive."""
    from .geo.overlay import areal_interpolate

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rects = _rects_df(part, "p_partkey", "a_id").withColumn(
        "val", F.pmod(F.col("a_id") * 13, F.lit(1000)) + 1)
    return areal_interpolate(rects, grid=_AREAL_GRID, value_col="val",
                             scale=_AREAL_SCALE)


def sql_areal_interp() -> str:
    g, sc = _AREAL_GRID, _AREAL_SCALE
    return f"""
WITH a AS ({_rects_sql("part", "p_partkey")}),
v AS (SELECT id, x0, y0, x1, y1,
             (id * 13) % 1000 + 1 AS val,
             CAST((x1 - x0) * (y1 - y0) AS BIGINT) AS area
      FROM a),
e AS (
  SELECT v.*, gx.gx, gy.gy
  FROM v,
       LATERAL (SELECT unnest(range(x0 // {g}, (x1 - 1) // {g} + 1))
                AS gx) gx,
       LATERAL (SELECT unnest(range(y0 // {g}, (y1 - 1) // {g} + 1))
                AS gy) gy),
t AS (
  SELECT gx, gy,
         (LEAST(x1, (gx + 1) * {g}) - GREATEST(x0, gx * {g}))
         * (LEAST(y1, (gy + 1) * {g}) - GREATEST(y0, gy * {g})) AS ov,
         val, area
  FROM e),
terms AS (
  SELECT gx, gy,
         (val * ov * CAST({sc} AS BIGINT)) // area AS term
  FROM t WHERE ov > 0)
SELECT gx, gy, COUNT(*) AS n_src,
       CAST(SUM(term) AS BIGINT) AS est_scaled,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / CAST({sc} AS DOUBLE) AS est
FROM terms GROUP BY 1, 2"""


def q_gravity_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity-model distance decay (operators/stats.py loglog_fit over
    trajectory.od_flows): ln(flow) vs ln(tile d²) across all non-dwell
    OD pairs — the spatial-interaction deterrence exponent, fitted with
    the µ-nat integer-moment recipe."""
    from .operators.stats import loglog_fit
    from .operators.trajectory import od_flows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = ev.select(
        "user_id", "ts", "event_id",
        (((F.col("event_id") * 7919) % 360000) / 1000.0 - 180.0)
        .alias("lon"),
        (((F.col("event_id") * 104729) % 170000) / 1000.0 - 85.0)
        .alias("lat"))
    flows = od_flows(pos, _OD_Z)
    d2 = ((F.col("tx") - F.col("fx")) * (F.col("tx") - F.col("fx"))
          + (F.col("ty") - F.col("fy")) * (F.col("ty") - F.col("fy")))
    pts = flows.withColumn("d2", d2).filter(F.col("d2") > 0) \
        .select("d2", "n_hops")
    return loglog_fit(pts, "d2", "n_hops")


def sql_gravity_decay() -> str:
    from .queries_curation import sql_lnln_fit_tail

    return f"""WITH {_sql_od_flow_ctes()},
lnpts AS (
  SELECT (tx - fx) * (tx - fx) + (ty - fy) * (ty - fy) AS x,
         n_hops AS y
  FROM f
  WHERE (tx - fx) * (tx - fx) + (ty - fy) * (ty - fy) > 0
),
{sql_lnln_fit_tail()}"""


GEOM_QUERIES["areal_interp"] = (q_areal_interp, sql_areal_interp)
GEOM_QUERIES["gravity_decay"] = (q_gravity_decay, sql_gravity_decay)


_LOS_K = 12


def q_los_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-to-peak line-of-sight on the ESDA density surface
    (operators/raster.py los_visibility): exact integer DDA ray
    sampling + cross-multiplied sight-line test over the top-12 density
    peaks — the viewshed primitive, rays broadcast against one raster
    scan."""
    from .operators.raster import los_visibility

    cells = _esda_cells(spark, sf_dir)
    peaks = (cells.orderBy(F.col("n_feat").desc(), F.col("cx").asc(),
                           F.col("cy").asc())
             .limit(_LOS_K).select("cx", "cy"))
    a = peaks.select(F.col("cx").alias("x0"), F.col("cy").alias("y0"))
    b = peaks.select(F.col("cx").alias("x1"), F.col("cy").alias("y1"))
    pairs = a.crossJoin(b).filter(
        (F.col("x0") < F.col("x1"))
        | ((F.col("x0") == F.col("x1")) & (F.col("y0") < F.col("y1"))))
    return los_visibility(cells, pairs, "cx", "cy", "n_feat")


def sql_los_visibility() -> str:
    return f"""WITH {_sql_esda_cells()},
peaks AS (
  SELECT cx, cy FROM (
    SELECT cx, cy,
           ROW_NUMBER() OVER (ORDER BY v DESC, cx ASC, cy ASC) AS r
    FROM cells) WHERE r <= {_LOS_K}),
pairs AS (
  SELECT a.cx AS x0, a.cy AS y0, b.cx AS x1, b.cy AS y1
  FROM peaks a, peaks b
  WHERE a.cx < b.cx OR (a.cx = b.cx AND a.cy < b.cy)),
p AS (
  SELECT pairs.*, c0.v AS z0, c1.v AS z1,
         x1 - x0 AS dx, y1 - y0 AS dy,
         GREATEST(abs(x1 - x0), abs(y1 - y0)) AS n
  FROM pairs
  JOIN cells c0 ON c0.cx = x0 AND c0.cy = y0
  JOIN cells c1 ON c1.cx = x1 AND c1.cy = y1),
ray AS (
  -- DuckDB // truncates toward zero; mirror Spark's pmod-floor form
  -- (numerator minus its positive remainder is exactly divisible)
  SELECT p.*, t.t,
         x0 + ((2 * t.t * dx + n)
               - (((2 * t.t * dx + n) % (2 * n) + 2 * n) % (2 * n)))
              // (2 * n) AS xt,
         y0 + ((2 * t.t * dy + n)
               - (((2 * t.t * dy + n) % (2 * n) + 2 * n) % (2 * n)))
              // (2 * n) AS yt
  FROM p, LATERAL (SELECT unnest(range(1, n)) AS t) t
  WHERE n >= 2),
hit AS (
  SELECT x0, y0, x1, y1,
         CAST(SUM(CASE WHEN c.v * n >= z0 * (n - t) + z1 * t
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
  FROM ray JOIN cells c ON c.cx = ray.xt AND c.cy = ray.yt
  GROUP BY 1, 2, 3, 4)
SELECT p.x0, p.y0, p.x1, p.y1, p.n,
       CAST(COALESCE(h.n_blocked, 0) AS BIGINT) AS n_blocked,
       COALESCE(h.n_blocked, 0) = 0 AS visible
FROM p LEFT JOIN hit h USING (x0, y0, x1, y1)"""


GEOM_QUERIES["los_visibility"] = (q_los_visibility, sql_los_visibility)


_ACCUM_UNROLL = 16  # oracle margin over the longest flow path


def q_d8_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow accumulation on the ESDA density surface
    (operators/raster.py d8_accumulation): exact upstream-cell counts
    via the engine's TRUE-fixpoint iteration; the oracle unrolls 16
    rounds of the same monotone recurrence, so an insufficient unroll —
    or a non-converged engine — fails the value hash loudly."""
    from .operators.raster import d8_accumulation

    return d8_accumulation(_esda_cells(spark, sf_dir), "cx", "cy",
                           "n_feat")


def sql_d8_accum() -> str:
    parts = [_sql_d8_parent_ctes() + """,
u0 AS MATERIALIZED (SELECT cx, cy, CAST(0 AS BIGINT) AS u FROM cells)"""]
    for i in range(1, _ACCUM_UNROLL + 1):
        parts.append(f""",
u{i} AS MATERIALIZED (
  SELECT c.cx, c.cy,
         CAST(COALESCE(SUM(prev.u + 1), 0) AS BIGINT) AS u
  FROM cells c
  LEFT JOIN p0 ch ON NOT ch.is_sink
                 AND ch.px = c.cx AND ch.py = c.cy
  LEFT JOIN u{i - 1} prev ON prev.cx = ch.cx AND prev.cy = ch.cy
  GROUP BY 1, 2)""")
    return ("WITH " + "".join(parts)
            + f"""
SELECT p0.cx, p0.cy, u.u AS n_upstream, p0.is_sink
FROM p0 JOIN u{_ACCUM_UNROLL} u USING (cx, cy)""")


GEOM_QUERIES["d8_accum"] = (q_d8_accum, sql_d8_accum)


_CL_ORDER = 8


def q_curve_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve locality profile: for every occupied grid
    cell with an occupied right/down neighbor, the |key jump| to that
    neighbor under the Hilbert curve (geo/hilbert.py) vs the Morton/Z
    curve (geo/zorder.py).  Instructive measured result: total jump
    mass is near-identical and Hilbert's WORST spatial-neighbor jump
    is larger than Morton's central-seam 2/3·4^order — Hilbert's
    guarantee runs the other way (curve-adjacent keys are always
    spatially adjacent, so range scans touch contiguous blocks; see
    the quadtree range-decomposition costs in zorder_scan for that
    half of the story).  Exact integers: (curve, n_pairs, total_jump,
    max_jump)."""
    from .geo.hilbert import hilbert_encode
    from .geo.tilemath import tile_cols
    from .geo.zorder import morton_col
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(_CL_ORDER))
    cells = feats.select(x.alias("hx"), y.alias("hy")).distinct()
    enc = hilbert_encode(cells, _CL_ORDER).withColumn(
        "zkey", morton_col(F.col("hx"), F.col("hy"), _CL_ORDER)) \
        .localCheckpoint()
    pairs = None
    for dx, dy in ((1, 0), (0, 1)):
        b = enc.select(F.col("hx").alias("bx"), F.col("hy").alias("by"),
                       F.col("h").alias("h2"), F.col("zkey").alias("z2"))
        j = enc.join(b, (F.col("bx") == F.col("hx") + dx)
                     & (F.col("by") == F.col("hy") + dy)) \
            .select(F.abs(F.col("h2") - F.col("h")).alias("dh"),
                    F.abs(F.col("z2") - F.col("zkey")).alias("dz"))
        pairs = j if pairs is None else pairs.unionByName(j)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("dh").alias("th"), F.max("dh").alias("mh"),
        F.sum("dz").alias("tz"), F.max("dz").alias("mz"))
    return agg.select(F.expr(
        "stack(2, 'hilbert', n_pairs, th, mh,"
        " 'morton', n_pairs, tz, mz)")
        .alias("curve", "n_pairs", "total_jump", "max_jump"))


def sql_curve_locality() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    o = _CL_ORDER
    n = 1 << o
    ctes = [f"""cells AS MATERIALIZED (
  SELECT DISTINCT {_sql_tile_x(o)} AS hx, {_sql_tile_y(o)} AS hy
  FROM features)""",
            f"""g{o} AS MATERIALIZED (
  SELECT hx, hy, hx AS x, hy AS y, CAST(0 AS BIGINT) AS d
  FROM cells)"""]
    for k in range(o - 1, -1, -1):
        s = 1 << k
        ctes.append(f"""g{k} AS MATERIALIZED (
  SELECT hx, hy,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - y ELSE y END
              ELSE x END AS x,
         CASE WHEN ry = 0
              THEN CASE WHEN rx = 1 THEN {n - 1} - x ELSE x END
              ELSE y END AS y,
         d + {s * s} * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END) AS d
  FROM (SELECT *, (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry
        FROM g{k + 1}))""")
    morton = " + ".join(
        f"((hx // {1 << k}) % 2) * {1 << (2 * k)}"
        f" + ((hy // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(o))
    ctes.append(f"""enc AS MATERIALIZED (
  SELECT g0.hx, g0.hy, CAST(g0.d AS BIGINT) AS h,
         CAST({morton} AS BIGINT) AS zkey
  FROM g0)""")
    ctes.append("""jumps AS (
  SELECT abs(b.h - a.h) AS dh, abs(b.zkey - a.zkey) AS dz
  FROM enc a JOIN enc b ON b.hx = a.hx + 1 AND b.hy = a.hy
  UNION ALL
  SELECT abs(b.h - a.h), abs(b.zkey - a.zkey)
  FROM enc a JOIN enc b ON b.hx = a.hx AND b.hy = a.hy + 1)""")
    return (f"WITH {FEATURES_ORACLE_SQL},\n" + ",\n".join(ctes) + """
SELECT 'hilbert' AS curve, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(dh) AS BIGINT) AS total_jump,
       CAST(MAX(dh) AS BIGINT) AS max_jump
FROM jumps
UNION ALL
SELECT 'morton', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(dz) AS BIGINT), CAST(MAX(dz) AS BIGINT)
FROM jumps""")


GEOM_QUERIES["curve_locality"] = (q_curve_locality, sql_curve_locality)


_SKEW_ZOOMS = (4, 8, 12)


def q_tile_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zoom tile-load skew profile: exact order-statistic
    p50/p99 and max of features-per-tile at zooms 4/8/12 — the
    measured basis for the salted-join / AQE-skew-split decisions the
    tiling pipeline documents (hot tiles are THE scale hazard of a
    z/x/y pyramid).  Pure integer arithmetic (rank_percentiles
    recipe)."""
    from .geo.tilemath import tile_cols
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).localCheckpoint()
    from pyspark.sql import Window as W
    out = None
    for z in _SKEW_ZOOMS:
        x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(z))
        loads = (feats.select(x.alias("tx"), y.alias("ty"))
                 .groupBy("tx", "ty")
                 .agg(F.count(F.lit(1)).cast("long").alias("n")))
        w = W.orderBy("n", "tx", "ty")
        ranked = loads.select(
            "n", F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("nt"))

        def tgt(q):
            t = F.col("nt") * q + 99
            return ((t - F.pmod(t, F.lit(100))) / 100).cast("long")

        prof = ranked.agg(
            F.max("nt").cast("long").alias("n_tiles"),
            F.sum("n").cast("long").alias("total_feat"),
            F.max("n").alias("max_feat"),
            F.max(F.when(F.col("rn") == tgt(50), F.col("n")))
            .alias("p50"),
            F.max(F.when(F.col("rn") == tgt(99), F.col("n")))
            .alias("p99")).select(
            F.lit(z).alias("z"), "n_tiles", "total_feat", "max_feat",
            "p50", "p99")
        out = prof if out is None else out.unionByName(prof)
    return out


def sql_tile_skew_profile() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    blocks = []
    for z in _SKEW_ZOOMS:
        blocks.append(f"""
SELECT {z} AS z,
       CAST(MAX(nt) AS BIGINT) AS n_tiles,
       CAST(SUM(n) AS BIGINT) AS total_feat,
       CAST(MAX(n) AS BIGINT) AS max_feat,
       MAX(CASE WHEN rn = (nt * 50 + 99) // 100 THEN n END) AS p50,
       MAX(CASE WHEN rn = (nt * 99 + 99) // 100 THEN n END) AS p99
FROM (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n, tx, ty) AS rn,
         COUNT(*) OVER () AS nt
  FROM (
    SELECT {_sql_tile_x(z)} AS tx, {_sql_tile_y(z)} AS ty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM features GROUP BY 1, 2))""")
    return (f"WITH {FEATURES_ORACLE_SQL}"
            + "\nUNION ALL\n".join(blocks))


GEOM_QUERIES["tile_skew_profile"] = (q_tile_skew_profile,
                                     sql_tile_skew_profile)


def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary join-count statistics of hot cells on the 5-degree grid
    (operators/spatialstats.py join_count_stats): cells binarized by
    the exact integer above-mean test n·v > S1, BB/BW/WW adjacency
    counts under queen contiguity plus hypergeometric-null
    expectations — the categorical member of the ESDA family sharing
    the morans_i cells."""
    from .operators.spatialstats import join_count_stats

    return join_count_stats(_esda_cells(spark, sf_dir), "cx", "cy",
                            "n_feat")


def sql_join_counts() -> str:
    return f"""WITH {_sql_esda_cells()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s1 FROM cells),
h AS (SELECT cx, cy,
             CAST(CASE WHEN n * v > s1 THEN 1 ELSE 0 END AS BIGINT)
               AS b, n
      FROM cells, tot),
{_SQL_ESDA_OFFS},
p AS (
  SELECT a.b AS ba, nb.b AS bb
  FROM h a CROSS JOIN offs o
  JOIN h nb ON nb.cx = a.cx + o.dx AND nb.cy = a.cy + o.dy),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS w_pairs,
             CAST(COALESCE(SUM(ba * bb), 0) AS BIGINT) AS bb,
             CAST(COALESCE(SUM((1 - ba) * (1 - bb)), 0) AS BIGINT)
               AS ww
      FROM p),
t AS (SELECT CAST(MAX(n) AS BIGINT) AS n_cells,
             CAST(SUM(b) AS BIGINT) AS n_hot FROM h)
SELECT n_cells, n_hot, w_pairs, bb, w_pairs - bb - ww AS bw, ww,
       CASE WHEN n_cells > 1
            THEN CAST(w_pairs * n_hot * (n_hot - 1) AS DOUBLE)
                 / CAST(n_cells * (n_cells - 1) AS DOUBLE)
            END AS e_bb,
       CASE WHEN n_cells > 1
            THEN CAST(w_pairs * 2 * n_hot * (n_cells - n_hot)
                      AS DOUBLE)
                 / CAST(n_cells * (n_cells - 1) AS DOUBLE)
            END AS e_bw
FROM t, c"""


GEOM_QUERIES["join_counts"] = (q_join_counts, sql_join_counts)


def q_sde_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse of feature positions per layer
    (operators/spatialstats.py sd_ellipse): milli-degree shifted
    integer coordinates, exact DECIMAL(38) anchored power sums,
    pinned-chain central moments and ellipse parameters (tan2θ
    instead of θ — atan2 is not cross-engine bit-stable) — the
    centrography summary of where each layer's features sit."""
    from .operators.spatialstats import sd_ellipse
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        "layer",
        F.floor((F.col("lon") + F.lit(180.0)) * F.lit(1000.0))
        .cast("long").alias("mx"),
        F.floor((F.col("lat") + F.lit(85.0)) * F.lit(1000.0))
        .cast("long").alias("my"))
    return sd_ellipse(feats, ["layer"], "mx", "my")


def sql_sde_profile() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    nd = "CAST(n AS DOUBLE)"
    mxx = (f"CAST(dx2 AS DOUBLE) / {nd} - (CAST(dx1 AS DOUBLE) / {nd})"
           f" * (CAST(dx1 AS DOUBLE) / {nd})")
    myy = (f"CAST(dy2 AS DOUBLE) / {nd} - (CAST(dy1 AS DOUBLE) / {nd})"
           f" * (CAST(dy1 AS DOUBLE) / {nd})")
    mxy = (f"CAST(dxy AS DOUBLE) / {nd} - (CAST(dx1 AS DOUBLE) / {nd})"
           f" * (CAST(dy1 AS DOUBLE) / {nd})")
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT layer AS g,
         CAST(floor((lon + 180.0) * 1000.0) AS BIGINT) AS x,
         CAST(floor((lat + 85.0) * 1000.0) AS BIGINT) AS y
  FROM features),
anch AS (
  SELECT g, CAST(SUM(x) // COUNT(*) AS BIGINT) AS ax,
         CAST(SUM(y) // COUNT(*) AS BIGINT) AS ay
  FROM pts GROUP BY 1),
d AS (
  SELECT p.g, CAST(p.x - a.ax AS BIGINT) AS dx,
         CAST(p.y - a.ay AS BIGINT) AS dy
  FROM pts p JOIN anch a ON p.g = a.g),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(dx AS HUGEINT)) AS dx1,
         SUM(CAST(dy AS HUGEINT)) AS dy1,
         SUM(CAST(dx * dx AS HUGEINT)) AS dx2,
         SUM(CAST(dy * dy AS HUGEINT)) AS dy2,
         SUM(CAST(dx * dy AS HUGEINT)) AS dxy
  FROM d GROUP BY 1),
m AS (
  SELECT g, n, {mxx} AS mxx, {myy} AS myy, {mxy} AS mxy,
         (CAST(n AS HUGEINT) * (dx2 - dy2)
          = dx1 * dx1 - dy1 * dy1) AS iso
  FROM agg),
e AS (
  SELECT g, n, mxx, myy, mxy, iso,
         (mxx + myy) / 2.0 AS tr,
         sqrt(((mxx - myy) / 2.0) * ((mxx - myy) / 2.0)
              + mxy * mxy) AS disc
  FROM m)
SELECT g AS layer, n,
       CASE WHEN n >= 2 THEN mxx END AS mxx,
       CASE WHEN n >= 2 THEN myy END AS myy,
       CASE WHEN n >= 2 THEN mxy END AS mxy,
       CASE WHEN n >= 2 AND NOT iso
            THEN (2.0 * mxy) / (mxx - myy) END AS tan2theta,
       CASE WHEN n >= 2 THEN sqrt(tr + disc) END AS sigma1,
       CASE WHEN n >= 2
            THEN sqrt(greatest(tr - disc, CAST(0.0 AS DOUBLE)))
            END AS sigma2
FROM e"""


GEOM_QUERIES["sde_profile"] = (q_sde_profile, sql_sde_profile)


def q_kde_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartic-kernel density surface of feature positions on a 0.4°
    grid (operators/spatialstats.py kde_surface): milli-degree shifted
    integer coordinates, doubled-integer cell centers, exact int64
    kernel numerators, one pinned divide for the density — the heat
    surface behind a density-map tile layer."""
    from .operators.spatialstats import kde_surface
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.floor((F.col("lon") + F.lit(180.0)) * F.lit(1000.0))
        .cast("long").alias("mx"),
        F.floor((F.col("lat") + F.lit(85.0)) * F.lit(1000.0))
        .cast("long").alias("my"))
    return kde_surface(feats, cell=400, radius=600,
                       x_col="mx", y_col="my")


def sql_kde_surface() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    # cell=400, radius=600 -> doubled radius 1200, r2d2 = 1_440_000;
    # density divisor r2d2^2 = 2_073_600_000_000 (exactly representable).
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT CAST(floor((lon + 180.0) * 1000.0) AS BIGINT) AS x,
         CAST(floor((lat + 85.0) * 1000.0) AS BIGINT) AS y
  FROM features),
offs AS (SELECT * FROM (VALUES
  (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))
  t(dx, dy)),
c AS (
  SELECT (x // 400) + dx AS gx, (y // 400) + dy AS gy,
         2 * x - (((x // 400) + dx) * 800 + 400) AS ddx,
         2 * y - (((y // 400) + dy) * 800 + 400) AS ddy
  FROM pts CROSS JOIN offs),
f AS (
  SELECT gx, gy,
         CAST(1440000 - (ddx * ddx + ddy * ddy) AS BIGINT) AS num
  FROM c WHERE ddx * ddx + ddy * ddy < 1440000)
SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_contrib,
       CAST(SUM(num * num) AS BIGINT) AS kde_num,
       CAST(CAST(SUM(num * num) AS BIGINT) AS DOUBLE)
         / 2073600000000.0 AS density
FROM f GROUP BY gx, gy"""


GEOM_QUERIES["kde_surface"] = (q_kde_surface, sql_kde_surface)


_LBL_RADIUS = 7500          # suppression radius, milli-degrees (1.5 cells)
# Oracle unroll bound: the greedy-MIS fixpoint settles in 8 rounds at
# sf0.01 (7 at sf0.1); 16 is 2x margin.  SELF-CHECKING: the engine runs
# to a TRUE fixpoint, so if 16 rounds were ever insufficient some label
# would still read st=0 -> kept=false and the value-hash comparison
# fails loudly — a green gate proves the unroll sufficed (the k_core
# evidence pattern).
_LBL_UNROLL = 16


def _label_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label candidates on the 5° ESDA grid: one label per occupied
    cell at the cell center (shifted milli-degree integers), priority
    = exact total order (denser cells first, then cx, cy — packed as
    -v*2^16 + (cx+40)*2^8 + (cy+40); cx ∈ [-36,36], cy ∈ [-17,17] by
    the feature substrate's lon/lat bounds, so the low 16 bits are a
    collision-free cell id)."""
    cells = _esda_cells(spark, sf_dir)
    return cells.select(
        "cx", "cy", "n_feat",
        (F.col("cx") * 5000 + 182500).alias("lx"),
        (F.col("cy") * 5000 + 87500).alias("ly"),
        ((-F.col("n_feat")) * 65536
         + (F.col("cx") + 40) * 256 + F.col("cy") + 40).alias("prio"))


def q_label_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy collision-free label placement (operators/cluster.py
    label_suppress) over 5°-cell label candidates: keep a label iff no
    higher-priority label sits within 7.5° — the renderer's placement
    pass as a synchronous greedy-MIS fixpoint (per round one join of
    the shrinking suppressor-edge set + one groupBy)."""
    from .operators.cluster import label_suppress

    out = label_suppress(_label_cells(spark, sf_dir), _LBL_RADIUS,
                         id_col="prio", x="lx", y="ly",
                         prio_col="prio")
    return out.select("cx", "cy", F.col("n_feat").cast("long")
                      .alias("n_feat"), "kept")


def sql_label_suppress() -> str:
    r2 = _LBL_RADIUS * _LBL_RADIUS
    ctes = [f"""{_sql_esda_cells()},
lab AS MATERIALIZED (
  SELECT cx, cy, v, cx * 5000 + 182500 AS x, cy * 5000 + 87500 AS y,
         (-v) * 65536 + (cx + 40) * 256 + (cy + 40) AS p
  FROM cells),
e AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM lab a JOIN lab b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {r2}
   AND a.p < b.p),
st0 AS (SELECT p, 0 AS st FROM lab)"""]
    for i in range(_LBL_UNROLL):
        ctes.append(f"""ag{i} AS MATERIALIZED (
  SELECT e.pb AS p,
         MAX(CASE WHEN s.st = 1 THEN 1 ELSE 0 END) AS ak,
         MAX(CASE WHEN s.st = 0 THEN 1 ELSE 0 END) AS au
  FROM e JOIN st{i} s ON s.p = e.pa GROUP BY e.pb),
st{i + 1} AS MATERIALIZED (
  SELECT t.p, CASE WHEN t.st <> 0 THEN t.st
                   WHEN COALESCE(g.ak, 0) = 1 THEN -1
                   WHEN COALESCE(g.au, 0) = 0 THEN 1
                   ELSE 0 END AS st
  FROM st{i} t LEFT JOIN ag{i} g ON g.p = t.p)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT l.cx, l.cy, CAST(l.v AS BIGINT) AS n_feat, s.st = 1 AS kept
FROM lab l JOIN st{_LBL_UNROLL} s ON s.p = l.p""")


GEOM_QUERIES["label_suppress"] = (q_label_suppress, sql_label_suppress)


_VOR_K = 25


def q_voronoi_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Voronoi allocation (operators/cluster.py
    voronoi_assign): every feature assigned to the nearest of the 25
    densest 5°-cell hubs by exact integer d² with the d²·k + seed_id
    tie-break fold — the seed table is a driver-side control table
    unrolled into a zero-shuffle least-chain, so the fact table never
    exchanges.  Returns per-hub allocation mass and exact total d²."""
    from pyspark.sql import Window

    from .operators.cluster import voronoi_assign
    from .sources.features import features_from_lineitem

    cells = _esda_cells(spark, sf_dir)
    w = Window.orderBy(F.col("n_feat").desc(), "cx", "cy")
    seeds = (cells.orderBy(F.col("n_feat").desc(), "cx", "cy")
             .limit(_VOR_K)
             .select((F.row_number().over(w) - 1).alias("seed_id"),
                     (F.col("cx") * 5000 + 182500).alias("sx"),
                     (F.col("cy") * 5000 + 87500).alias("sy")))
    pts = features_from_lineitem(spark, sf_dir).select(
        F.floor((F.col("lon") + F.lit(180.0)) * F.lit(1000.0))
        .cast("long").alias("mx"),
        F.floor((F.col("lat") + F.lit(85.0)) * F.lit(1000.0))
        .cast("long").alias("my"))
    va = voronoi_assign(pts, seeds, x="mx", y="my")
    agg = va.groupBy("seed_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum("d2").alias("sum_d2"))
    return (seeds.join(agg, "seed_id", "left")
            .select("seed_id", "sx", "sy",
                    F.coalesce("n_assigned", F.lit(0)).cast("long")
                    .alias("n_assigned"),
                    F.coalesce("sum_d2", F.lit(0)).cast("long")
                    .alias("sum_d2")))


def sql_voronoi_assign() -> str:
    from .sources.features import FEATURES_ORACLE_SQL
    k = _VOR_K
    return f"""WITH {FEATURES_ORACLE_SQL},
cells AS (
  SELECT CAST(floor(lon / 5.0) AS BIGINT) AS cx,
         CAST(floor(lat / 5.0) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM features GROUP BY 1, 2),
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY v DESC, cx, cy) - 1
              AS INTEGER) AS seed_id,
         cx * 5000 + 182500 AS sx, cy * 5000 + 87500 AS sy
  FROM cells ORDER BY v DESC, cx, cy LIMIT {k}),
pts AS (
  SELECT CAST(floor((lon + 180.0) * 1000.0) AS BIGINT) AS x,
         CAST(floor((lat + 85.0) * 1000.0) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM features GROUP BY 1, 2),
a AS (
  SELECT x, y, w,
         MIN(((x - sx) * (x - sx) + (y - sy) * (y - sy)) * {k}
             + seed_id) AS key
  FROM pts CROSS JOIN seeds GROUP BY x, y, w)
SELECT s.seed_id, s.sx, s.sy,
       CAST(COALESCE(SUM(a.w), 0) AS BIGINT) AS n_assigned,
       CAST(COALESCE(SUM(a.w * ((a.key - a.key % {k}) // {k})), 0)
            AS BIGINT) AS sum_d2
FROM seeds s LEFT JOIN a ON a.key % {k} = s.seed_id
GROUP BY 1, 2, 3"""


GEOM_QUERIES["voronoi_assign"] = (q_voronoi_assign, sql_voronoi_assign)


_COMPACT_Z = 7


def _z7_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import _with_tiles
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    return _with_tiles(feats, _COMPACT_Z).select("z", "x", "y").distinct()


def _sql_z7_tiles() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    z = _COMPACT_Z
    return f"""{FEATURES_ORACLE_SQL},
t{z} AS MATERIALIZED (
  SELECT DISTINCT {_sql_tile_x(z)} AS x, {_sql_tile_y(z)} AS y
  FROM features)"""


def q_tile_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-covering normalization of the z=7 occupied-tile set
    (operators/quadtree.py tile_compact — the ZXY analog of S2
    CellUnion::Normalize / H3 compact): complete sibling quads
    collapse to parents recursively (13,988 z7 tiles → 4,442 tiles
    across z3-z7 at sf0.01).  One count-4 groupBy + anti-join per
    level."""
    from .operators.quadtree import tile_compact

    return tile_compact(_z7_tiles(spark, sf_dir), 0)


def sql_tile_compact() -> str:
    z0 = _COMPACT_Z
    ctes = [_sql_z7_tiles()]
    sels = []
    for lvl in range(z0, 0, -1):
        ctes.append(f"""p{lvl} AS MATERIALIZED (
  SELECT x // 2 AS px, y // 2 AS py, COUNT(*) AS c
  FROM t{lvl} GROUP BY 1, 2),
k{lvl} AS (
  SELECT t.x, t.y FROM t{lvl} t JOIN p{lvl} p
    ON p.px = t.x // 2 AND p.py = t.y // 2
  WHERE p.c < 4),
t{lvl - 1} AS MATERIALIZED (
  SELECT px AS x, py AS y FROM p{lvl} WHERE c = 4)""")
        sels.append(f"SELECT {lvl} AS z, x, y FROM k{lvl}")
    sels.append("SELECT 0 AS z, x, y FROM t0")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(sels))


GEOM_QUERIES["tile_compact"] = (q_tile_compact, sql_tile_compact)


def q_tile_uncompact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact → uncompact roundtrip (operators/quadtree.py
    tile_uncompact): the minimal z3-z7 covering explodes back to the
    uniform z=7 set via two bounded sequences — value-hashed against
    the INDEPENDENT direct tile derivation (no compaction in the
    oracle at all), proving uncompact ∘ compact = identity."""
    from .operators.quadtree import tile_compact, tile_uncompact

    return tile_uncompact(tile_compact(_z7_tiles(spark, sf_dir), 0),
                          _COMPACT_Z)


def sql_tile_uncompact() -> str:
    z = _COMPACT_Z
    return f"""WITH {_sql_z7_tiles()}
SELECT {z} AS z, x, y FROM t{z}"""


GEOM_QUERIES["tile_uncompact"] = (q_tile_uncompact, sql_tile_uncompact)


_MS_T = 4_000_000_000_000


def q_contour_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares isolines of the quartic-KDE surface
    (operators/spatialstats.py contour_segments): the exact-int64
    kde_num grid thresholded at 4e12, corner bits ORed by ONE
    explode-x4 groupBy, midpoint-rule segments in doubled grid
    coordinates — every output column an exact integer, saddles on
    the fixed disconnected convention."""
    from .operators.spatialstats import contour_segments

    grid = q_kde_surface(spark, sf_dir).select(
        "gx", "gy", F.col("kde_num").alias("v"))
    return contour_segments(grid, _MS_T)


def sql_contour_segments() -> str:
    kde = sql_kde_surface()
    t = _MS_T
    return f"""WITH kde AS MATERIALIZED ({kde}),
corners AS (
  SELECT gx - dx AS bx, gy - dy AS by,
         CASE WHEN kde_num >= {t} THEN bit ELSE 0 END AS b
  FROM kde CROSS JOIN (VALUES (0,0,1),(1,0,2),(1,1,4),(0,1,8))
    o(dx, dy, bit)),
blocks AS (
  SELECT bx, by, CAST(SUM(b) AS INT) AS mcase
  FROM corners GROUP BY 1, 2
  HAVING SUM(b) BETWEEN 1 AND 14),
lut(mcase, ox0, oy0, ox1, oy1) AS (VALUES
  (1,0,1,1,0),(2,1,0,2,1),(3,0,1,2,1),(4,1,2,2,1),
  (5,0,1,1,0),(5,1,2,2,1),(6,1,0,1,2),(7,0,1,1,2),
  (8,0,1,1,2),(9,1,0,1,2),(10,1,0,2,1),(10,0,1,1,2),
  (11,1,2,2,1),(12,0,1,2,1),(13,1,0,2,1),(14,0,1,1,0))
SELECT b.bx, b.by, b.mcase,
       2 * b.bx + l.ox0 AS x0, 2 * b.by + l.oy0 AS y0,
       2 * b.bx + l.ox1 AS x1, 2 * b.by + l.oy1 AS y1
FROM blocks b JOIN lut l ON l.mcase = b.mcase"""


GEOM_QUERIES["contour_segments"] = (q_contour_segments,
                                    sql_contour_segments)


_CE_QMOD = 20              # every 20th event -> 500 sample points
_CE_RADIUS = 16384         # NN search bound (≫ CSR mean spacing)
_QUAD_CELL = 4096          # quadrat edge (micro-degrees)


def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark-Evans nearest-neighbour index over a 500-point sample of
    the deterministic walk (operators/spatialstats.py clark_evans):
    radius-bounded NN via ONE eps-grid cell join, per-point distances
    µ-quantized (floor(√d²·10⁶)) so the sums value-hash; R and z are
    the one pinned double chain — clustered (R<1) vs dispersed (R>1)
    in one row."""
    from .operators.spatialstats import clark_evans
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return clark_evans(pts, _CE_RADIUS)


def sql_clark_evans() -> str:
    r2 = _CE_RADIUS * _CE_RADIUS
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS i, x, y FROM pos
                   WHERE event_id % {_CE_QMOD} = 0),
nn AS (SELECT a.i,
              MIN((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)) AS nn_d2
       FROM p a JOIN p b ON a.i <> b.i
        AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {r2}
       GROUP BY a.i),
obs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_with_nn,
               CAST(SUM(CAST(floor(sqrt(CAST(nn_d2 AS DOUBLE))
                                   * 1000000.0) AS BIGINT))
                    AS BIGINT) AS sum_nn_micro
        FROM nn),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST((MAX(x)-MIN(x))*(MAX(y)-MIN(y)) AS BIGINT) AS area
        FROM p)
SELECT n_points, n_with_nn, area, sum_nn_micro,
       CASE WHEN n_with_nn > 0 THEN
         (CAST(sum_nn_micro AS DOUBLE)
          / (CAST(n_with_nn AS DOUBLE) * 1000000.0))
         / (0.5 * sqrt(CAST(area AS DOUBLE) / CAST(n_points AS DOUBLE)))
       END AS r_index,
       CASE WHEN n_with_nn > 0 THEN
         ((CAST(sum_nn_micro AS DOUBLE)
           / (CAST(n_with_nn AS DOUBLE) * 1000000.0))
          - 0.5 * sqrt(CAST(area AS DOUBLE) / CAST(n_points AS DOUBLE)))
         / (sqrt((4.0 - 3.141592653589793)
                 / (4.0 * 3.141592653589793))
            * sqrt(CAST(area AS DOUBLE)) / CAST(n_points AS DOUBLE))
       END AS z_score
FROM tot, obs"""


GEOM_QUERIES["clark_evans"] = (q_clark_evans, sql_clark_evans)


def q_quadrat_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat-count CSR census over ALL walk positions
    (operators/spatialstats.py quadrat_test): empty quadrats enter the
    variance through the exact bbox grid size — VMR as an exact
    integer rational (vmr_num/vmr_den) plus the pinned χ²; one
    map-side-combinable groupBy, zero joins."""
    from .operators.spatialstats import quadrat_test
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return quadrat_test(pos, _QUAD_CELL)


def sql_quadrat_test() -> str:
    c = _QUAD_CELL
    fd = (lambda e: f"(({e}) - ((({e}) % {c}) + {c}) % {c}) // {c}")
    return f"""WITH {_sql_walk_pos()},
q AS (SELECT x, y, {fd('x')} AS qx, {fd('y')} AS qy FROM pos),
occ AS (SELECT qx, qy, COUNT(*) AS cnt FROM q GROUP BY 1, 2),
sums AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_points,
                CAST(COUNT(*) AS BIGINT) AS n_occupied,
                CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2
         FROM occ),
ext AS (SELECT ({fd('MAX(x)')}) - ({fd('MIN(x)')}) + 1 AS nx,
               ({fd('MAX(y)')}) - ({fd('MIN(y)')}) + 1 AS ny
        FROM q)
SELECT n_points,
       CAST(nx * ny AS BIGINT) AS n_quadrats,
       n_occupied, sum_c2,
       CAST(nx * ny * sum_c2 - n_points * n_points AS BIGINT)
         AS vmr_num,
       CAST(n_points * (nx * ny - 1) AS BIGINT) AS vmr_den,
       CASE WHEN n_points * (nx * ny - 1) > 0 THEN
         CAST(nx * ny * sum_c2 - n_points * n_points AS DOUBLE)
         / CAST(n_points * (nx * ny - 1) AS DOUBLE)
       END AS vmr,
       CASE WHEN n_points > 0 AND n_points * (nx * ny - 1) > 0 THEN
         CAST(nx * ny - 1 AS DOUBLE)
         * CAST(nx * ny * sum_c2 - n_points * n_points AS DOUBLE)
         / CAST(n_points * (nx * ny - 1) AS DOUBLE)
       END AS chi2
FROM sums, ext"""


GEOM_QUERIES["quadrat_test"] = (q_quadrat_test, sql_quadrat_test)


def q_silhouette_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette for the kmeans_cells fit
    (operators/cluster.py centroid_silhouette): µ-quantized distances
    to own vs nearest-other centroid, exact floor-div score sums —
    the fit-quality companion of the kmeans_cells gate, zero-shuffle
    scoring via the same literal centroid chain."""
    from .operators.cluster import centroid_silhouette, kmeans_integer
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    cents = [(r["cent_id"], r["cx"], r["cy"])
             for r in kmeans_integer(pos, "x", "y", k=_KM_K,
                                     iters=_KM_ITERS,
                                     salt=_KM_SALT).collect()]
    return centroid_silhouette(pos, "x", "y", sorted(cents))


def sql_silhouette_score() -> str:
    k = _KM_K
    ctes, cfin, key = _sql_kmeans_ctes()
    ctes.append(f"""asg AS (
  SELECT p.x, p.y, p.w, MIN({key}) AS mk
  FROM pts p CROSS JOIN {cfin} c GROUP BY p.x, p.y, p.w),
ab AS (
  SELECT a.x, a.y, a.w, CAST(a.mk % {k} AS INTEGER) AS cid,
         CAST(floor(sqrt(CAST((a.mk - a.mk % {k}) // {k} AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS am,
         CAST(floor(sqrt(CAST(MIN((a.x - c.cx)*(a.x - c.cx)
                               + (a.y - c.cy)*(a.y - c.cy)) AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS bm
  FROM asg a CROSS JOIN {cfin} c
  WHERE c.cent_id <> CAST(a.mk % {k} AS INTEGER)
  GROUP BY a.x, a.y, a.w, a.mk),
sil AS (
  SELECT cid, w,
         CASE WHEN GREATEST(am, bm) > 0 THEN
           ((bm - am) * 1000000
            - ((((bm - am) * 1000000) % GREATEST(am, bm))
               + GREATEST(am, bm)) % GREATEST(am, bm))
           // GREATEST(am, bm)
         ELSE 0 END AS s
  FROM ab)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT cid AS cent_id,
       CAST(SUM(w) AS BIGINT) AS n_members,
       CAST(SUM(s * w) AS BIGINT) AS sum_s_scaled,
       CAST(SUM(s * w) AS DOUBLE)
         / (CAST(SUM(w) AS DOUBLE) * 1000000.0) AS mean_s
FROM sil GROUP BY cid""")


GEOM_QUERIES["silhouette_score"] = (q_silhouette_score,
                                    sql_silhouette_score)


def q_rayleigh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh directional-uniformity test over the walk's step
    headings (operators/spatialstats.py rayleigh_test): per-step
    cos/sin as µ-quantized dx/√d², exact component sums, pinned R̄ and
    z = n·R̄² — the continuous upgrade of heading_octants."""
    from .operators.spatialstats import rayleigh_test
    from .operators.trajectory import random_walk_positions

    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pos.select(
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy")).dropna()
    return rayleigh_test(steps)


def sql_rayleigh_test() -> str:
    return f"""WITH {_sql_walk_pos()},
st AS (SELECT x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
       FROM pos
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
base AS (SELECT dx, dy, dx*dx + dy*dy AS d2 FROM st
         WHERE dx IS NOT NULL AND dx*dx + dy*dy > 0),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
         CAST(SUM(CAST(FLOOR(CAST(dx AS DOUBLE)
                             / sqrt(CAST(d2 AS DOUBLE))
                             * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_cos_micro,
         CAST(SUM(CAST(FLOOR(CAST(dy AS DOUBLE)
                             / sqrt(CAST(d2 AS DOUBLE))
                             * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_sin_micro
        FROM base)
SELECT n_steps, sum_cos_micro, sum_sin_micro, rbar,
       CASE WHEN n_steps > 0
            THEN CAST(n_steps AS DOUBLE) * rbar * rbar END AS z
FROM (SELECT *,
        CASE WHEN n_steps > 0 THEN
          sqrt(CAST(sum_cos_micro AS DOUBLE)
               * CAST(sum_cos_micro AS DOUBLE)
               + CAST(sum_sin_micro AS DOUBLE)
               * CAST(sum_sin_micro AS DOUBLE))
          / (CAST(n_steps AS DOUBLE) * 1000000.0) END AS rbar
      FROM agg)"""


GEOM_QUERIES["rayleigh_test"] = (q_rayleigh_test, sql_rayleigh_test)


_HUFF_SCALE = 1_000_000_000
_HUFF_CMOD = 10             # every 10th customer as a consumer


def q_huff_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huff gravity market shares (operators/cluster.py huff_shares):
    hashed store/consumer positions, quantized-exact utilities
    A·scale div d², share as the exact rational t/Σt — the trade-area
    allocator over the supplier fleet."""
    from .operators.cluster import huff_shares

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("store_id"),
        (F.pmod(F.col("s_suppkey"), F.lit(5)) + 1).alias("attract"),
        F.pmod(F.col("s_suppkey") * 7919, F.lit(360000)).alias("x"),
        F.pmod(F.col("s_suppkey") * 104729, F.lit(170000)).alias("y"))
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.pmod(F.col("c_custkey"), F.lit(_HUFF_CMOD)) == 0)
            .select(
                F.col("c_custkey").alias("consumer_id"),
                F.pmod(F.col("c_custkey") * 7919, F.lit(360000))
                .alias("x"),
                F.pmod(F.col("c_custkey") * 104729, F.lit(170000))
                .alias("y")))
    return huff_shares(cust, sup, scale=_HUFF_SCALE)


def sql_huff_shares() -> str:
    return f"""WITH s AS (
  SELECT s_suppkey AS sid, s_suppkey % 5 + 1 AS a,
         (s_suppkey * 7919) % 360000 AS sx,
         (s_suppkey * 104729) % 170000 AS sy
  FROM supplier),
c AS (
  SELECT c_custkey AS cid,
         (c_custkey * 7919) % 360000 AS cx,
         (c_custkey * 104729) % 170000 AS cy
  FROM customer WHERE c_custkey % {_HUFF_CMOD} = 0),
pairs AS (
  SELECT c.cid, s.sid, s.a,
         GREATEST((c.cx - s.sx)*(c.cx - s.sx)
                  + (c.cy - s.sy)*(c.cy - s.sy), 1) AS d2
  FROM c CROSS JOIN s),
ut AS (
  SELECT cid, sid, d2,
         CAST((a * {_HUFF_SCALE}) // d2 AS BIGINT) AS t
  FROM pairs),
den AS (SELECT cid, CAST(SUM(t) AS BIGINT) AS share_den
        FROM ut GROUP BY 1)
SELECT u.cid AS consumer_id, u.sid AS store_id,
       CAST(u.d2 AS BIGINT) AS d2, u.t, d.share_den,
       CASE WHEN d.share_den > 0 THEN
         CAST(u.t AS DOUBLE) / CAST(d.share_den AS DOUBLE)
       END AS share
FROM ut u JOIN den d USING (cid)"""


GEOM_QUERIES["huff_shares"] = (q_huff_shares, sql_huff_shares)


def q_olc_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plus-code (Open Location Code) assignment per feature
    (geo/olc.py olc_encode): 11-char code from integer micro-degree
    coordinates — pure floor-div/mod digit extraction, zero shuffle —
    plus the 8-char neighborhood prefix for roll-ups."""
    from .geo.olc import olc_encode

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    lat_e6 = (F.pmod(fid * 104729, F.lit(170000)) * 1000
              - F.lit(85_000_000))
    lng_e6 = (F.pmod(fid * 7919, F.lit(360000)) * 1000
              - F.lit(180_000_000))
    code = olc_encode(lat_e6, lng_e6, length=11)
    return li.select(fid.alias("feature_id"), code.alias("olc"),
                     F.substring(code, 1, 8).alias("olc8"))


def _sql_olc_digit(val: str, p: int) -> str:
    return (f"substr('23456789CFGHJMPQRVWX', "
            f"CAST(({val} // {p}) % 20 + 1 AS INT), 1)")


def sql_olc_encode() -> str:
    pieces = []
    for i in range(5):
        p = 20 ** (4 - i)
        pieces.append(_sql_olc_digit("latv", p))
        pieces.append(_sql_olc_digit("lngv", p))
    code = (" || ".join(pieces[:8]) + " || '+' || "
            + " || ".join(pieces[8:10])
            + " || substr('23456789CFGHJMPQRVWX', CAST("
              "(((lat * 40000) // 1000000) % 5) * 4"
              " + ((lng * 32000) // 1000000) % 4 + 1 AS INT), 1)")
    return f"""WITH f AS (
  SELECT (l_orderkey * 10 + l_linenumber) AS fid
  FROM lineitem),
pt AS (
  SELECT fid,
         ((fid * 104729) % 170000) * 1000 - 85000000 + 90000000 AS lat,
         ((fid * 7919) % 360000) * 1000 - 180000000 + 180000000 AS lng
  FROM f),
v AS (
  SELECT fid, lat, lng,
         (lat * 8000) // 1000000 AS latv,
         (lng * 8000) // 1000000 AS lngv
  FROM pt),
c AS (SELECT fid AS feature_id, {code} AS olc FROM v)
SELECT feature_id, olc, substr(olc, 1, 8) AS olc8 FROM c"""


GEOM_QUERIES["olc_encode"] = (q_olc_encode, sql_olc_encode)


_DTW_CELL = 2048
_DTW_MAX = 12
_DTW_BLOCKS = 20


def q_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW trajectory similarity (operators/trajectory.py dtw_pairs):
    Manhattan-cost dynamic time warping over capped cell signatures —
    exact int64 end-to-end via the nested in-row DP fold; the oracle
    unrolls the telescoped running-min window form of the same DP."""
    from .operators.trajectory import dtw_pairs, random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return dtw_pairs(pos, cell=_DTW_CELL, max_moves=_DTW_MAX,
                     n_blocks=_DTW_BLOCKS)


def _sql_traj_pair_costs(c: int, mm: int, nb: int) -> str:
    """Shared oracle prefix for the DP trajectory metrics: walk
    positions -> capped collapsed cell moves -> blocked u < v pairs ->
    the (pair, i, j, cost) table (mirror of
    operators/trajectory.py _cell_signature_pairs)."""
    return f"""{_sql_walk_pos()},
cells AS (
  SELECT user_id, ts, event_id,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy
  FROM pos),
flagged AS (
  SELECT *, CASE WHEN lag(cx) OVER w IS NULL
                   OR lag(cx) OVER w <> cx
                   OR lag(cy) OVER w <> cy THEN 1 ELSE 0 END AS keep
  FROM cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
mv AS MATERIALIZED (
  SELECT user_id, cx, cy,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM flagged WHERE keep = 1
  QUALIFY rn <= {mm}),
lens AS (SELECT user_id, CAST(MAX(rn) AS BIGINT) AS len
         FROM mv GROUP BY 1),
pairs AS MATERIALIZED (
  SELECT a.user_id AS u, b.user_id AS v
  FROM lens a JOIN lens b
    ON a.user_id % {nb} = b.user_id % {nb}
   AND a.user_id < b.user_id),
costs AS MATERIALIZED (
  SELECT p.u, p.v, ma.rn AS i, mb.rn AS j,
         abs(ma.cx - mb.cx) + abs(ma.cy - mb.cy) AS cst,
         GREATEST(abs(ma.cx - mb.cx), abs(ma.cy - mb.cy)) AS cheb
  FROM pairs p
  JOIN mv ma ON ma.user_id = p.u
  JOIN mv mb ON mb.user_id = p.v)"""


def sql_dtw_pairs() -> str:
    c, mm, nb = _DTW_CELL, _DTW_MAX, _DTW_BLOCKS
    inf = 1 << 60
    ctes = [_sql_traj_pair_costs(c, mm, nb) + """,
r1 AS MATERIALIZED (
  SELECT u, v, j,
         CAST(SUM(cst) OVER (PARTITION BY u, v ORDER BY j)
              AS BIGINT) AS val
  FROM costs WHERE i = 1)"""]
    for i in range(2, mm + 1):
        # telescoped DP row: r_j = P_j + min_k<=j (m_k - P_{k-1});
        # m - P + cst == m_k - P_{k-1}
        ctes.append(f"""r{i} AS MATERIALIZED (
  SELECT u, v, j,
         CAST(P + MIN(m - P + cst)
              OVER (PARTITION BY u, v ORDER BY j) AS BIGINT) AS val
  FROM (
    SELECT cs.u, cs.v, cs.j, cs.cst,
           SUM(cs.cst) OVER w AS P,
           LEAST(r.val, COALESCE(lag(r.val) OVER w, {inf})) AS m
    FROM costs cs JOIN r{i - 1} r
      ON r.u = cs.u AND r.v = cs.v AND r.j = cs.j
    WHERE cs.i = {i}
    WINDOW w AS (PARTITION BY cs.u, cs.v ORDER BY cs.j)))""")
    allr = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, u, v, j, val FROM r{i}"
        for i in range(1, mm + 1))
    ctes.append(f"allr AS ({allr})")
    return ("WITH " + ",\n".join(ctes) + """
SELECT p.u, p.v, la.len AS len_u, lb.len AS len_v, a.val AS dtw
FROM pairs p
JOIN lens la ON la.user_id = p.u
JOIN lens lb ON lb.user_id = p.v
JOIN allr a ON a.u = p.u AND a.v = p.v
           AND a.i = la.len AND a.j = lb.len""")


GEOM_QUERIES["dtw_pairs"] = (q_dtw_pairs, sql_dtw_pairs)


def q_frechet_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Fréchet distance (operators/trajectory.py
    frechet_pairs): the bottleneck alignment metric over the shared
    cell-signature pairs — exact int64 max-min DP; the oracle unrolls
    the DP column-wise (lateral aliases, no window)."""
    from .operators.trajectory import frechet_pairs, \
        random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return frechet_pairs(pos, cell=_DTW_CELL, max_moves=_DTW_MAX,
                         n_blocks=_DTW_BLOCKS)


def sql_frechet_pairs() -> str:
    c, mm, nb = _DTW_CELL, _DTW_MAX, _DTW_BLOCKS
    inf = 1 << 60
    ccols = ",\n         ".join(
        f"MAX(CASE WHEN j = {j} THEN cst END) AS c{j}"
        for j in range(1, mm + 1))
    ctes = [_sql_traj_pair_costs(c, mm, nb) + f""",
cw AS MATERIALIZED (
  SELECT u, v, i,
         {ccols}
  FROM costs GROUP BY 1, 2, 3)"""]
    # row 1: running max of c, via lateral aliases
    row1 = ["c1 AS g1"]
    for j in range(2, mm + 1):
        row1.append(f"GREATEST(c{j}, g{j - 1}) AS g{j}")
    ctes.append("f1 AS MATERIALIZED (\n  SELECT u, v, "
                + ",\n         ".join(row1)
                + "\n  FROM cw WHERE i = 1)")
    for i in range(2, mm + 1):
        # F_j = max(c_j, min(F_{j-1} same row, prev_j, prev_{j-1})).
        # Lateral aliases must NOT be named g*: unqualified g{j-1}
        # would bind to the joined previous-row table's column, not
        # the same-row alias — compute as t*, re-alias outside.
        exprs = [f"GREATEST(w.c1, p.g1) AS t1"]
        for j in range(2, mm + 1):
            exprs.append(
                f"GREATEST(w.c{j}, LEAST(t{j - 1}, p.g{j}, "
                f"p.g{j - 1})) AS t{j}")
        body = ",\n           ".join(exprs)
        outer = ", ".join(f"t{j} AS g{j}" for j in range(1, mm + 1))
        ctes.append(f"""f{i} AS MATERIALIZED (
  SELECT u, v, {outer} FROM (
    SELECT w.u AS u, w.v AS v, {body}
    FROM cw w JOIN f{i - 1} p ON p.u = w.u AND p.v = w.v
    WHERE w.i = {i}))""")
    pick = " ".join(f"WHEN {j} THEN g{j}" for j in range(1, mm + 1))
    allf = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, * FROM f{i}" for i in range(1, mm + 1))
    ctes.append(f"allf AS ({allf})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT p.u, p.v, la.len AS len_u, lb.len AS len_v,
       CAST(CASE lb.len {pick} END AS BIGINT) AS frechet
FROM pairs p
JOIN lens la ON la.user_id = p.u
JOIN lens lb ON lb.user_id = p.v
JOIN allf a ON a.u = p.u AND a.v = p.v AND a.i = la.len""")


GEOM_QUERIES["frechet_pairs"] = (q_frechet_pairs, sql_frechet_pairs)


_CHAIKIN_CAP = 10
_CHAIKIN_ITERS = 2


def q_chaikin_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaikin corner-cutting over the first 10 walk positions per
    user (operators/trajectory.py chaikin_smooth): two refinement
    rounds carried in exact ×16-scaled integers — the smoothing dual
    of rdp_simplify."""
    from .operators.trajectory import chaikin_smooth, \
        random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (pos.withColumn("_r0", F.row_number().over(w))
              .filter(F.col("_r0") <= _CHAIKIN_CAP).drop("_r0"))
    return chaikin_smooth(capped, iters=_CHAIKIN_ITERS)


def sql_chaikin_smooth() -> str:
    ctes = [f"""{_sql_walk_pos()},
p0 AS MATERIALIZED (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         x, y
  FROM pos
  QUALIFY rn <= {_CHAIKIN_CAP})"""]
    for k in range(1, _CHAIKIN_ITERS + 1):
        ctes.append(f"""s{k} AS (
  SELECT user_id, rn, x, y,
         lead(x) OVER w AS nx, lead(y) OVER w AS ny,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM p{k - 1}
  WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
u{k} AS (
  SELECT user_id, 3 * x + nx AS x, 3 * y + ny AS y, 2 * rn AS o
  FROM s{k} WHERE nx IS NOT NULL
  UNION ALL
  SELECT user_id, x + 3 * nx, y + 3 * ny, 2 * rn + 1
  FROM s{k} WHERE nx IS NOT NULL
  UNION ALL
  SELECT user_id, 4 * x, 4 * y, 1 FROM s{k} WHERE rn = 1
  UNION ALL
  SELECT user_id, 4 * x, 4 * y, 2 * rn
  FROM s{k} WHERE rn = n AND n > 1),
p{k} AS MATERIALIZED (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY o) AS rn,
         x, y
  FROM u{k})""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT user_id, CAST(rn AS BIGINT) AS rn,
       CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST({4 ** _CHAIKIN_ITERS} AS BIGINT) AS scale
FROM p{_CHAIKIN_ITERS}""")


GEOM_QUERIES["chaikin_smooth"] = (q_chaikin_smooth, sql_chaikin_smooth)


_MORPH_CELL = 4096


def q_morphology_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morphological closing of the occupied walk-cell mask
    (operators/raster.py morphology_close): 3×3 dilate-then-erode —
    pure integer set algebra, was_filled marks the healed gaps."""
    from .geo.tilemath import floor_div
    from .operators.raster import morphology_close
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    cells = pos.select(
        floor_div(F.col("x"), _MORPH_CELL).alias("cx"),
        floor_div(F.col("y"), _MORPH_CELL).alias("cy"))
    return morphology_close(cells)


def sql_morphology_close() -> str:
    c = _MORPH_CELL
    offs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""WITH {_sql_walk_pos()},
base AS MATERIALIZED (
  SELECT DISTINCT CAST(floor(x / {c}.0) AS BIGINT) AS x,
                  CAST(floor(y / {c}.0) AS BIGINT) AS y
  FROM pos),
offs(dx, dy) AS (VALUES {offs}),
dil AS MATERIALIZED (
  SELECT DISTINCT b.x + o.dx AS x, b.y + o.dy AS y
  FROM base b CROSS JOIN offs o),
cov AS (
  SELECT d.x, d.y
  FROM dil d CROSS JOIN offs o
  JOIN dil n ON n.x = d.x + o.dx AND n.y = d.y + o.dy
  GROUP BY 1, 2
  HAVING COUNT(*) = 9)
SELECT c.x, c.y,
       CASE WHEN b.x IS NULL THEN 1 ELSE 0 END AS was_filled
FROM cov c LEFT JOIN base b ON b.x = c.x AND b.y = c.y"""


GEOM_QUERIES["morphology_close"] = (q_morphology_close,
                                    sql_morphology_close)


_LCSS_EPS = 1


def q_lcss_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCSS trajectory similarity (operators/trajectory.py
    lcss_pairs): noise-robust longest match chain with Chebyshev-eps
    matching over the shared cell-signature pairs — exact integers;
    the oracle unrolls the max DP column-wise like frechet_pairs."""
    from .operators.trajectory import lcss_pairs, \
        random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return lcss_pairs(pos, cell=_DTW_CELL, max_moves=_DTW_MAX,
                      n_blocks=_DTW_BLOCKS, eps=_LCSS_EPS)


def sql_lcss_pairs() -> str:
    c, mm, nb, eps = _DTW_CELL, _DTW_MAX, _DTW_BLOCKS, _LCSS_EPS
    mcols = ",\n         ".join(
        f"MAX(CASE WHEN j = {j} THEN "
        f"CASE WHEN cheb <= {eps} THEN 1 ELSE 0 END END) AS m{j}"
        for j in range(1, mm + 1))
    ctes = [_sql_traj_pair_costs(c, mm, nb) + f""",
cw AS MATERIALIZED (
  SELECT u, v, i,
         {mcols}
  FROM costs GROUP BY 1, 2, 3)"""]
    row1 = ["CAST(m1 AS BIGINT) AS g1"]
    for j in range(2, mm + 1):
        row1.append(f"GREATEST(CAST(m{j} AS BIGINT), g{j - 1}) AS g{j}")
    ctes.append("f1 AS MATERIALIZED (\n  SELECT u, v, "
                + ",\n         ".join(row1)
                + "\n  FROM cw WHERE i = 1)")
    for i in range(2, mm + 1):
        exprs = ["CASE WHEN w.m1 = 1 THEN 1 ELSE p.g1 END AS t1"]
        for j in range(2, mm + 1):
            exprs.append(
                f"CASE WHEN w.m{j} = 1 THEN p.g{j - 1} + 1 "
                f"ELSE GREATEST(p.g{j}, t{j - 1}) END AS t{j}")
        body = ",\n           ".join(exprs)
        outer = ", ".join(f"t{j} AS g{j}" for j in range(1, mm + 1))
        ctes.append(f"""f{i} AS MATERIALIZED (
  SELECT u, v, {outer} FROM (
    SELECT w.u AS u, w.v AS v, {body}
    FROM cw w JOIN f{i - 1} p ON p.u = w.u AND p.v = w.v
    WHERE w.i = {i}))""")
    pick = " ".join(f"WHEN {j} THEN g{j}" for j in range(1, mm + 1))
    allf = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, * FROM f{i}" for i in range(1, mm + 1))
    ctes.append(f"allf AS ({allf})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT p.u, p.v, la.len AS len_u, lb.len AS len_v,
       CAST(CASE lb.len {pick} END AS BIGINT) AS lcss,
       CASE WHEN LEAST(la.len, lb.len) > 0
            THEN CAST(CASE lb.len {pick} END AS DOUBLE)
                 / CAST(LEAST(la.len, lb.len) AS DOUBLE)
       END AS sim
FROM pairs p
JOIN lens la ON la.user_id = p.u
JOIN lens lb ON lb.user_id = p.v
JOIN allf a ON a.u = p.u AND a.v = p.v AND a.i = la.len""")


GEOM_QUERIES["lcss_pairs"] = (q_lcss_pairs, sql_lcss_pairs)


def q_maidenhead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maidenhead grid locator per feature (geo/maidenhead.py
    maidenhead_encode): 8-char extended locator from integer
    micro-degree coordinates — pure floor-div/mod character
    extraction, zero shuffle — plus the 4-char square prefix for
    roll-ups (the same truncation property the olc_encode gate pins
    for plus codes)."""
    from .geo.maidenhead import maidenhead_encode

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    lat_e6 = (F.pmod(fid * 130363, F.lit(170000)) * 1000
              - F.lit(85_000_000))
    lng_e6 = (F.pmod(fid * 9973, F.lit(360000)) * 1000
              - F.lit(180_000_000))
    code = maidenhead_encode(lat_e6, lng_e6, length=8)
    return li.select(fid.alias("feature_id"), code.alias("mh8"),
                     F.substring(code, 1, 4).alias("mh4"))


def sql_maidenhead() -> str:
    fields = "ABCDEFGHIJKLMNOPQR"
    subs = "abcdefghijklmnopqrstuvwx"
    code = (
        f"substr('{fields}', CAST(lng // 20000000 + 1 AS INT), 1)"
        f" || substr('{fields}', CAST(lat // 10000000 + 1 AS INT), 1)"
        " || substr('0123456789',"
        " CAST((lng % 20000000) // 2000000 + 1 AS INT), 1)"
        " || substr('0123456789',"
        " CAST((lat % 10000000) // 1000000 + 1 AS INT), 1)"
        f" || substr('{subs}',"
        " CAST(((lng % 2000000) * 12) // 1000000 + 1 AS INT), 1)"
        f" || substr('{subs}',"
        " CAST(((lat % 1000000) * 24) // 1000000 + 1 AS INT), 1)"
        " || substr('0123456789',"
        " CAST((((lng % 2000000) * 120) // 1000000) % 10 + 1 AS INT), 1)"
        " || substr('0123456789',"
        " CAST((((lat % 1000000) * 240) // 1000000) % 10 + 1 AS INT), 1)")
    return f"""WITH f AS (
  SELECT (l_orderkey * 10 + l_linenumber) AS fid
  FROM lineitem),
pt AS (
  SELECT fid,
         ((fid * 130363) % 170000) * 1000 - 85000000 + 90000000 AS lat,
         ((fid * 9973) % 360000) * 1000 - 180000000 + 180000000 AS lng
  FROM f),
c AS (SELECT fid AS feature_id, {code} AS mh8 FROM pt)
SELECT feature_id, mh8, substr(mh8, 1, 4) AS mh4 FROM c"""


GEOM_QUERIES["maidenhead"] = (q_maidenhead, sql_maidenhead)


def q_location_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer location quotients on the 5-degree ESDA grid
    (operators/spatialstats.py location_quotient): which grid cells
    over-represent a layer relative to its global share — exact long
    count rationals, one pinned divide; cell totals ride the same
    exchange as the (cell, layer) groupBy, layer/grand totals are
    broadcast."""
    from .operators.spatialstats import location_quotient
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.floor(F.col("lon") / F.lit(_ESDA_STEP)).cast("long").alias("cx"),
        F.floor(F.col("lat") / F.lit(_ESDA_STEP)).cast("long").alias("cy"),
        "layer")
    return location_quotient(feats, ["cx", "cy"], "layer")


def sql_location_quotient() -> str:
    from .sources.features import FEATURES_ORACLE_SQL
    return f"""WITH {FEATURES_ORACLE_SQL},
obs AS (
  SELECT CAST(floor(lon / {_ESDA_STEP!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_ESDA_STEP!r}) AS BIGINT) AS cy,
         layer
  FROM features),
cc AS (
  SELECT cx, cy, layer, CAST(COUNT(*) AS BIGINT) AS n_ck
  FROM obs GROUP BY 1, 2, 3),
wc AS (
  SELECT cx, cy, layer, n_ck,
         CAST(SUM(n_ck) OVER (PARTITION BY cx, cy) AS BIGINT) AS n_c
  FROM cc),
kt AS (
  SELECT layer, CAST(SUM(n_ck) AS BIGINT) AS n_k
  FROM cc GROUP BY 1),
tot AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n_tot FROM kt)
SELECT wc.cx, wc.cy, wc.layer, wc.n_ck, wc.n_c, kt.n_k, tot.n_tot,
       CASE WHEN wc.n_c > 0 AND kt.n_k > 0
            THEN CAST(wc.n_ck * tot.n_tot AS DOUBLE)
                 / CAST(wc.n_c * kt.n_k AS DOUBLE) END AS lq
FROM wc JOIN kt USING (layer) CROSS JOIN tot"""


GEOM_QUERIES["location_quotient"] = (q_location_quotient,
                                     sql_location_quotient)


_GF_RADII = [256, 512, 1024, 2048]     # NN-distance CDF ladder


def q_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diggle G function over the clark_evans 500-point sample
    (operators/spatialstats.py g_function): NN-distance CDF rungs as
    exact integer d-squared-vs-r-squared counts from ONE r_max grid
    join — first-contact clustering beside ripley_k's second moment;
    g_csr is the one pinned exp chain."""
    from .operators.spatialstats import g_function
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return g_function(pts, _GF_RADII)


def sql_g_function() -> str:
    rmax = max(_GF_RADII)
    rungs = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS r" for r in _GF_RADII)
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS i, x, y FROM pos
                   WHERE event_id % {_CE_QMOD} = 0),
nn AS (SELECT a.i,
              MIN((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)) AS nn_d2
       FROM p a JOIN p b ON a.i <> b.i
        AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {rmax * rmax}
       GROUP BY a.i),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST((MAX(x)-MIN(x))*(MAX(y)-MIN(y)) AS BIGINT) AS area
        FROM p),
rung AS ({rungs}),
cnt AS (
  SELECT rung.r,
         CAST(COALESCE(SUM(CASE WHEN nn.nn_d2 <= rung.r * rung.r
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_le
  FROM rung LEFT JOIN nn ON TRUE GROUP BY rung.r)
SELECT c.r, c.n_le, t.n_points, t.area,
       CASE WHEN t.n_points > 0
            THEN CAST(c.n_le AS DOUBLE) / CAST(t.n_points AS DOUBLE)
            END AS g_hat,
       CASE WHEN t.area > 0 THEN
         1.0 - exp(-((CAST(t.n_points AS DOUBLE)
                      / CAST(t.area AS DOUBLE))
                     * 3.141592653589793
                     * CAST(c.r * c.r AS DOUBLE)))
       END AS g_csr
FROM cnt c CROSS JOIN tot t"""


GEOM_QUERIES["g_function"] = (q_g_function, sql_g_function)


_DI_CELL = 8192            # dissimilarity census cell (micro-degrees)


def q_dissimilarity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duncan dissimilarity D between click and purchase events over
    the walk grid (operators/spatialstats.py dissimilarity_index):
    how unevenly the two event populations occupy space — exact long
    numerator sum |a_i*B - b_i*A|, one pinned divide, one groupBy and
    one single-row fold (no joins in row space)."""
    from .operators.spatialstats import dissimilarity_index
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    pts = (pos.join(ev.select("event_id", "event_type"), "event_id")
           .filter(F.col("event_type").isin("click", "purchase"))
           .select(
               F.floor(F.col("x") / F.lit(float(_DI_CELL)))
               .cast("long").alias("cx"),
               F.floor(F.col("y") / F.lit(float(_DI_CELL)))
               .cast("long").alias("cy"),
               (F.col("event_type") == "click").alias("is_click")))
    return dissimilarity_index(pts, ["cx", "cy"], "is_click")


def sql_dissimilarity_index() -> str:
    c = _DI_CELL
    return f"""WITH {_sql_walk_pos()},
pts AS (
  SELECT CAST(floor(pos.x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(pos.y / {c}.0) AS BIGINT) AS cy,
         (e.event_type = 'click') AS f
  FROM pos JOIN events e USING (event_id)
  WHERE e.event_type IN ('click', 'purchase')),
cells AS (
  SELECT cx, cy,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM pts GROUP BY 1, 2),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(a) AS BIGINT) AS n_a,
         CAST(SUM(b) AS BIGINT) AS n_b
  FROM cells)
SELECT t.n_cells, t.n_a, t.n_b,
       CAST(SUM(ABS(c2.a * t.n_b - c2.b * t.n_a)) AS BIGINT) AS d_num,
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
         CAST(SUM(ABS(c2.a * t.n_b - c2.b * t.n_a)) AS DOUBLE)
           / (2.0 * CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE))
       END AS d_index
FROM cells c2 CROSS JOIN tot t
GROUP BY t.n_cells, t.n_a, t.n_b"""


GEOM_QUERIES["dissimilarity_index"] = (q_dissimilarity_index,
                                       sql_dissimilarity_index)


_PG_RMAX = 2048            # proximity-graph edge window (micro-degrees)


def q_gabriel_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gabriel / relative-neighbourhood graph flags over the
    clark_evans 500-point sample (operators/cluster.py
    proximity_graph): every pair within rmax flagged by the exact
    integer empty-circle (Thales) and empty-lune witness tests — two
    eps-grid radius joins and one max-flag groupBy, MST ⊆ RNG ⊆
    Gabriel by construction."""
    from .operators.cluster import proximity_graph
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return proximity_graph(pts, _PG_RMAX)


def sql_gabriel_graph() -> str:
    r2 = _PG_RMAX * _PG_RMAX
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS i, x, y FROM pos
                   WHERE event_id % {_CE_QMOD} = 0),
pr AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, a.x AS ax, a.y AS ay,
         b.x AS bx, b.y AS by,
         (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS d2
  FROM p a JOIN p b ON a.i < b.i
   AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {r2})
SELECT pr.i, pr.j, pr.d2,
  NOT EXISTS (SELECT 1 FROM p w WHERE w.i <> pr.i AND w.i <> pr.j
    AND ((pr.ax-w.x)*(pr.ax-w.x)+(pr.ay-w.y)*(pr.ay-w.y))
      + ((pr.bx-w.x)*(pr.bx-w.x)+(pr.by-w.y)*(pr.by-w.y))
      < pr.d2) AS is_gabriel,
  NOT EXISTS (SELECT 1 FROM p w WHERE w.i <> pr.i AND w.i <> pr.j
    AND greatest(
          (pr.ax-w.x)*(pr.ax-w.x)+(pr.ay-w.y)*(pr.ay-w.y),
          (pr.bx-w.x)*(pr.bx-w.x)+(pr.by-w.y)*(pr.by-w.y))
      < pr.d2) AS is_rng
FROM pr"""


GEOM_QUERIES["gabriel_graph"] = (q_gabriel_graph, sql_gabriel_graph)


_LR_CELL = 256             # supercover raster cell (micro-degrees)
_LR_SMOD = 5               # every 5th walk segment


def q_line_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supercover trajectory raster (operators/raster.py
    line_rasterize): every 5th walk segment exploded onto the grid
    cells its closed segment crosses — pure integer separating-axis
    test, two bounded explodes, zero joins — then one
    map-side-combinable per-cell segment count."""
    from .operators.raster import line_rasterize
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (pos.select(
        "event_id", F.col("x").alias("x1"), F.col("y").alias("y1"),
        F.lag("x").over(w).alias("x0"), F.lag("y").over(w).alias("y0"))
        .filter(F.col("x0").isNotNull()
                & (F.pmod(F.col("event_id"), F.lit(_LR_SMOD)) == 0)))
    cells = line_rasterize(seg, _LR_CELL, id_cols=("event_id",))
    return (cells.groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_segs")))


def sql_line_rasterize() -> str:
    c = _LR_CELL
    return f"""WITH {_sql_walk_pos()},
seg AS (
  SELECT event_id, x AS x1, y AS y1,
         lag(x) OVER w AS x0, lag(y) OVER w AS y0
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS MATERIALIZED (
  SELECT event_id, x0, y0, x1, y1 FROM seg
  WHERE x0 IS NOT NULL AND event_id % {_LR_SMOD} = 0),
gx AS (SELECT *,
  CAST(floor((least(x0, x1) - 1) / {c}.0) AS BIGINT) AS cxmin,
  CAST(floor(greatest(x0, x1) / {c}.0) AS BIGINT) AS cxmax,
  CAST(floor((least(y0, y1) - 1) / {c}.0) AS BIGINT) AS cymin,
  CAST(floor(greatest(y0, y1) / {c}.0) AS BIGINT) AS cymax
  FROM s),
ex AS (SELECT *, unnest(generate_series(cxmin, cxmax)) AS cx FROM gx),
ey AS (SELECT *, unnest(generate_series(cymin, cymax)) AS cy FROM ex),
sd AS (SELECT cx, cy,
  sign((x1-x0)*(cy*{c}-y0)     - (y1-y0)*(cx*{c}-x0))     AS s00,
  sign((x1-x0)*(cy*{c}-y0)     - (y1-y0)*((cx+1)*{c}-x0)) AS s10,
  sign((x1-x0)*((cy+1)*{c}-y0) - (y1-y0)*(cx*{c}-x0))     AS s01,
  sign((x1-x0)*((cy+1)*{c}-y0) - (y1-y0)*((cx+1)*{c}-x0)) AS s11
  FROM ey)
SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_segs
FROM sd
WHERE NOT (least(s00, s10, s01, s11) > 0
           OR greatest(s00, s10, s01, s11) < 0)
GROUP BY cx, cy"""


GEOM_QUERIES["line_rasterize"] = (q_line_rasterize, sql_line_rasterize)


def q_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Ripley cross-K over the deterministic walk
    (operators/spatialstats.py cross_k): positions split into two
    kinds by event-id parity; the ladder asks whether odd-kind points
    cluster around even-kind points beyond independence — ONE r_max
    block join carries all rungs, kinds ride as extra columns."""
    from .operators.spatialstats import cross_k
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP).select(
        F.col("event_id").alias("i"), "x", "y",
        F.pmod(F.col("event_id"), F.lit(2)).alias("kind"))
    return cross_k(pos, _RIPLEY_RADII)


def sql_cross_k() -> str:
    rmax2 = _RIPLEY_RADII[-1] * _RIPLEY_RADII[-1]
    sums = ",\n         ".join(
        f"CAST(COALESCE(SUM(CASE WHEN d2 <= {r * r} THEN 1 END), 0)"
        f" AS BIGINT) AS c{r}" for r in _RIPLEY_RADII)
    rungs = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS r, c{r} AS pair_cnt FROM c"
        for r in _RIPLEY_RADII)
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (
  SELECT event_id AS i, x, y, event_id % 2 AS kind FROM pos),
s AS (SELECT CAST(SUM(CASE WHEN kind = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b,
             CAST((MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS BIGINT)
               AS area
      FROM p),
d AS (SELECT (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
      FROM p a JOIN p b ON a.i < b.i AND a.kind <> b.kind
       AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {rmax2}),
c AS MATERIALIZED (SELECT {sums} FROM d),
l AS ({rungs})
SELECT l.r, l.pair_cnt, s.n_a, s.n_b, s.area,
       CASE WHEN s.n_a > 0 AND s.n_b > 0 THEN
         CAST(l.pair_cnt AS DOUBLE) * CAST(s.area AS DOUBLE)
           / CAST(s.n_a * s.n_b AS DOUBLE)
       END AS k_hat
FROM l, s"""


GEOM_QUERIES["cross_k"] = (q_cross_k, sql_cross_k)


def q_lee_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee's L bivariate spatial association on the 5-degree ESDA grid
    (operators/spatialstats.py lee_l): does the density surface of ALL
    features co-locate with the surface of ranked features?  Exact
    n-scaled deviations and neighbor sums; the three quadratic sums
    ride pinned (cx, cy)-ordered folds — the bivariate companion of
    the morans_i gate on the same stencil."""
    from .operators.spatialstats import lee_l
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    cells = (feats.select(
        F.floor(F.col("lon") / F.lit(_ESDA_STEP)).cast("long").alias("cx"),
        F.floor(F.col("lat") / F.lit(_ESDA_STEP)).cast("long").alias("cy"),
        F.col("p_rank"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("va"),
             F.sum(F.when(F.col("p_rank").isNotNull(), 1).otherwise(0))
             .alias("vb")))
    return lee_l(cells, "cx", "cy", "va", "vb")


def sql_lee_l() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    fold = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {lst}), "
            "(a, x) -> a + x)")
    uv = fold.format(
        lst="list(CAST(u AS DOUBLE) * CAST(w AS DOUBLE) "
            "ORDER BY cx, cy)")
    xx = fold.format(
        lst="list(CAST(zx AS DOUBLE) * CAST(zx AS DOUBLE) "
            "ORDER BY cx, cy)")
    yy = fold.format(
        lst="list(CAST(zy AS DOUBLE) * CAST(zy AS DOUBLE) "
            "ORDER BY cx, cy)")
    return f"""WITH {FEATURES_ORACLE_SQL},
cells AS (
  SELECT CAST(floor(lon / {_ESDA_STEP!r}) AS BIGINT) AS cx,
         CAST(floor(lat / {_ESDA_STEP!r}) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS va,
         CAST(SUM(CASE WHEN p_rank IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS vb
  FROM features GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(va) AS BIGINT) AS sa,
               CAST(SUM(vb) AS BIGINT) AS sb FROM cells),
z AS (SELECT cx, cy, n, n * va - sa AS zx, n * vb - sb AS zy
      FROM cells, tot),
{_SQL_ESDA_OFFS},
nb AS (
  SELECT a.cx, a.cy, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(b.zx) AS BIGINT) AS u,
         CAST(SUM(b.zy) AS BIGINT) AS w
  FROM z a CROSS JOIN offs o
  JOIN z b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  GROUP BY 1, 2),
cs AS (SELECT CAST(SUM(k * k) AS BIGINT) AS sum_k2, {uv} AS s_uv
       FROM nb),
sq AS (SELECT CAST(MAX(n) AS BIGINT) AS n_cells, {xx} AS s_xx,
              {yy} AS s_yy
       FROM z)
SELECT n_cells, sum_k2, s_uv, s_xx, s_yy,
       CASE WHEN s_xx > 0.0 AND s_yy > 0.0 AND sum_k2 > 0
            THEN CAST(n_cells AS DOUBLE) * s_uv
                 / (CAST(sum_k2 AS DOUBLE) * sqrt(s_xx) * sqrt(s_yy))
       END AS lee_l
FROM sq, cs"""


GEOM_QUERIES["lee_l"] = (q_lee_l, sql_lee_l)


_FF_STEP = 4096            # probe-lattice pitch (micro-degrees)


def q_f_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-space F function over the clark_evans 500-point sample
    (operators/spatialstats.py f_function): deterministic probe
    lattice generated in-plan from the bbox, probe-NN CDF rungs as
    exact d-squared counts from ONE r_max grid join — the
    empty-space mirror of the g_function gate (clustering pulls F
    BELOW its CSR curve while G rises above)."""
    from .operators.spatialstats import f_function
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return f_function(pts, _GF_RADII, step=_FF_STEP)


def sql_f_function() -> str:
    rmax = max(_GF_RADII)
    rungs = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS r" for r in _GF_RADII)
    s = _FF_STEP
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS j, x, y FROM pos
                   WHERE event_id % {_CE_QMOD} = 0),
bb AS (SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1,
              CAST(COUNT(*) AS BIGINT) AS n_points,
              CAST((MAX(x)-MIN(x))*(MAX(y)-MIN(y)) AS BIGINT) AS area
       FROM p),
probes AS (
  SELECT gx.px AS x, gy.py AS y
  FROM bb,
       unnest(generate_series(bb.x0, bb.x1, {s})) AS gx(px),
       unnest(generate_series(bb.y0, bb.y1, {s})) AS gy(py)),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM probes),
nn AS (SELECT pr.x, pr.y,
              MIN((pr.x-p.x)*(pr.x-p.x)+(pr.y-p.y)*(pr.y-p.y)) AS nn_d2
       FROM probes pr JOIN p
         ON (pr.x-p.x)*(pr.x-p.x)+(pr.y-p.y)*(pr.y-p.y)
            <= {rmax * rmax}
       GROUP BY pr.x, pr.y),
rung AS ({rungs}),
cnt AS (
  SELECT rung.r,
         CAST(COALESCE(SUM(CASE WHEN nn.nn_d2 <= rung.r * rung.r
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_le
  FROM rung LEFT JOIN nn ON TRUE GROUP BY rung.r)
SELECT c.r, c.n_le, np.n_probes, b.n_points, b.area,
       CASE WHEN np.n_probes > 0
            THEN CAST(c.n_le AS DOUBLE) / CAST(np.n_probes AS DOUBLE)
            END AS f_hat,
       CASE WHEN b.area > 0 THEN
         1.0 - exp(-((CAST(b.n_points AS DOUBLE)
                      / CAST(b.area AS DOUBLE))
                     * 3.141592653589793
                     * CAST(c.r * c.r AS DOUBLE)))
       END AS f_csr
FROM cnt c CROSS JOIN np CROSS JOIN bb b"""


GEOM_QUERIES["f_function"] = (q_f_function, sql_f_function)


_HOP_RMAX = 1 << 16


def q_hopkins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clustering tendency of the walk sample
    (operators/spatialstats.py hopkins_statistic): probe-lattice NN
    distances vs data-point NN distances, both censored at rmax² —
    exact integer d² sums, ONE division; the should-I-cluster
    pre-check beside clark_evans/g/f."""
    from .operators.spatialstats import hopkins_statistic
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return hopkins_statistic(pts, step=_FF_STEP, rmax=_HOP_RMAX,
                             sample_mod=3)


def sql_hopkins() -> str:
    r2 = _HOP_RMAX * _HOP_RMAX
    s = _FF_STEP
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (SELECT event_id AS j, x, y FROM pos
                   WHERE event_id % {_CE_QMOD} = 0),
bb AS (SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1,
              CAST(COUNT(*) AS BIGINT) AS n_points
       FROM p),
probes AS MATERIALIZED (
  SELECT gx.px AS x, gy.py AS y
  FROM bb,
       unnest(generate_series(bb.x0, bb.x1, {s})) AS gx(px),
       unnest(generate_series(bb.y0, bb.y1, {s})) AS gy(py)),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM probes),
un AS (SELECT pr.x, pr.y,
              MIN((pr.x-p.x)*(pr.x-p.x)+(pr.y-p.y)*(pr.y-p.y)) AS d2
       FROM probes pr JOIN p
         ON (pr.x-p.x)*(pr.x-p.x)+(pr.y-p.y)*(pr.y-p.y) <= {r2}
       GROUP BY pr.x, pr.y),
uu AS (SELECT CAST(SUM(least(COALESCE(un.d2, {r2}), {r2}))
               AS BIGINT) AS u_sum
       FROM probes pr LEFT JOIN un USING (x, y)),
samp AS MATERIALIZED (SELECT j, x, y FROM p WHERE j % 3 = 0),
wn AS (SELECT a.j,
              MIN((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)) AS d2
       FROM samp a JOIN p b
         ON a.j <> b.j
        AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {r2}
       GROUP BY a.j),
ww AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
              CAST(SUM(least(COALESCE(wn.d2, {r2}), {r2}))
               AS BIGINT) AS w_sum
       FROM samp LEFT JOIN wn USING (j))
SELECT bb.n_points, ww.n_sample, np.n_probes, uu.u_sum, ww.w_sum,
       CASE WHEN uu.u_sum + ww.w_sum > 0
            THEN CAST(uu.u_sum AS DOUBLE)
                 / CAST(uu.u_sum + ww.w_sum AS DOUBLE)
       END AS hopkins
FROM bb CROSS JOIN np CROSS JOIN uu CROSS JOIN ww"""


GEOM_QUERIES["hopkins"] = (q_hopkins, sql_hopkins)


def q_j_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J function over the walk sample (operators/spatialstats.py
    j_function): (1−G)/(1−F) on the shared radius ladder — the
    intensity-free CSR diagnostic composing the g_function and
    f_function gates; J < 1 confirms the clustering both curves
    show separately."""
    from .operators.spatialstats import j_function
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("i"), "x", "y"))
    return j_function(pts, _GF_RADII, step=_FF_STEP)


def sql_j_function() -> str:
    return f"""WITH g AS ({sql_g_function()}),
f AS ({sql_f_function()})
SELECT g.r, g.g_hat, f.f_hat,
       CASE WHEN f.f_hat < 1.0
            THEN (1.0 - g.g_hat) / (1.0 - f.f_hat) END AS j_hat
FROM g JOIN f USING (r)"""


GEOM_QUERIES["j_function"] = (q_j_function, sql_j_function)


_SCAN_K = 25
_SCAN_WINDOWS = (1, 2, 4)


def q_scan_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kulldorff space-time scan over (z4 tile, day) cylinders
    (operators/spatialstats.py scan_statistic): hashed-position
    events on the od_flows substrate, window lengths 1/2/4 days,
    top-25 cylinders by exact-integer-ratio Poisson LLR — the
    outbreak detector above getis_ord's pure-space view."""
    from .geo.tilemath import floor_div
    from .operators.spatialstats import scan_statistic

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from .geo.tilemath import tile_cols
    lon = (((F.col("event_id") * 7919) % 360000) / 1000.0 - 180.0)
    lat = (((F.col("event_id") * 104729) % 170000) / 1000.0 - 85.0)
    x, y = tile_cols(lon, lat, F.lit(_OD_Z))
    pos = ev.select(
        (x * 100000 + y).alias("cell"),
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  86_400_000_000).alias("day"))
    return scan_statistic(pos, "cell", "day",
                          window_lens=_SCAN_WINDOWS, k=_SCAN_K)


def sql_scan_statistic() -> str:
    from .queries import _sql_tile_x, _sql_tile_y

    z = _OD_Z
    zone_sel = "\nUNION ALL\n".join(f"""
  SELECT cell, t AS t0, {w} AS w,
         CAST(SUM(cnt) OVER (PARTITION BY cell ORDER BY t
                             RANGE BETWEEN CURRENT ROW
                             AND {w - 1} FOLLOWING) AS BIGINT) AS n
  FROM g""" for w in _SCAN_WINDOWS)
    tw_sel = "\nUNION ALL\n".join(f"""
  SELECT t, {w} AS w,
         CAST(SUM(tot) OVER (ORDER BY t
                             RANGE BETWEEN CURRENT ROW
                             AND {w - 1} FOLLOWING) AS BIGINT) AS n_w
  FROM pt""" for w in _SCAN_WINDOWS)
    return f"""WITH pos AS (
  SELECT ((event_id * 7919) % 360000) / 1000.0 - 180.0 AS lon,
         ((event_id * 104729) % 170000) / 1000.0 - 85.0 AS lat,
         epoch_us(ts) // 86400000000 AS day
  FROM events),
p2 AS (
  SELECT ({_sql_tile_x(z)}) * 100000 + ({_sql_tile_y(z)}) AS cell, day
  FROM pos),
g AS (
  SELECT cell, day AS t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM p2 GROUP BY 1, 2),
pt AS (SELECT t, CAST(SUM(cnt) AS BIGINT) AS tot FROM g GROUP BY 1),
nt AS (SELECT CAST(SUM(tot) AS BIGINT) AS n_tot FROM pt),
nc AS (SELECT cell, CAST(SUM(cnt) AS BIGINT) AS n_c
       FROM g GROUP BY 1),
zones AS ({zone_sel}),
tws AS ({tw_sel}),
zz AS (
  SELECT z.cell, z.t0, z.w, z.n, nc.n_c, t.n_w, nt.n_tot
  FROM zones z
  JOIN tws t ON t.t = z.t0 AND t.w = z.w
  JOIN nc USING (cell) CROSS JOIN nt),
sc AS (
  SELECT cell, t0, w, n, n_c, n_w,
         CASE WHEN n * n_tot > n_c * n_w THEN
           CAST(n AS DOUBLE)
             * ln(CAST(n * n_tot AS DOUBLE)
                  / CAST(n_c * n_w AS DOUBLE))
           + CASE WHEN n_tot > n THEN
               CAST(n_tot - n AS DOUBLE)
                 * ln(CAST(n_tot * (n_tot - n) AS DOUBLE)
                      / CAST(n_tot * n_tot - n_c * n_w AS DOUBLE))
             ELSE 0.0 END
         ELSE 0.0 END AS llr
  FROM zz)
SELECT cell, t0, CAST(w AS INTEGER) AS w, n, n_c, n_w, llr,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY llr DESC, cell, t0, w)
           AS rank
  FROM sc)
WHERE rank <= {_SCAN_K}"""


GEOM_QUERIES["scan_statistic"] = (q_scan_statistic, sql_scan_statistic)


_VARIO_BINS = [512, 1024, 2048]


def q_semivariogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of event cents over the walk sample
    (operators/spatialstats.py semivariogram): one r_max block join
    carries the whole distance-bin ladder, (Δv)² sums exact int64,
    γ one division per bin — the kriging-grade spatial-structure
    diagnostic beside morans_i."""
    from .operators.spatialstats import semivariogram
    from .operators.trajectory import random_walk_positions
    from .queries_curation import _cents

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0))
    vals = (ev.filter(F.col("value").isNotNull())
            .select(F.col("event_id").alias("i"),
                    _cents().alias("v")))
    pts = (pos.select(F.col("event_id").alias("i"), "x", "y")
           .join(vals, "i"))
    return semivariogram(pts, _VARIO_BINS)


def sql_semivariogram() -> str:
    edges = [0] + _VARIO_BINS
    rmax2 = _VARIO_BINS[-1] ** 2
    bin_case = " ".join(
        f"WHEN d2 > {lo * lo} AND d2 <= {hi * hi} "
        f"THEN CAST({lo} AS BIGINT)"
        for lo, hi in zip(edges, edges[1:]))
    hi_case = " ".join(
        f"WHEN d2 > {lo * lo} AND d2 <= {hi * hi} "
        f"THEN CAST({hi} AS BIGINT)"
        for lo, hi in zip(edges, edges[1:]))
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (
  SELECT pos.event_id AS i, pos.x, pos.y,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS v
  FROM pos JOIN events e ON e.event_id = pos.event_id
  WHERE pos.event_id % {_CE_QMOD} = 0 AND e.value IS NOT NULL),
d AS (
  SELECT (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2,
         (a.v - b.v) * (a.v - b.v) AS sq
  FROM p a JOIN p b ON a.i < b.i
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {rmax2}),
t AS (
  SELECT CASE {bin_case} END AS r_lo,
         CASE {hi_case} END AS r_hi, sq
  FROM d)
SELECT r_lo, r_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sq) AS BIGINT) AS sq_sum,
       CAST(SUM(sq) AS DOUBLE) / CAST(2 * COUNT(*) AS DOUBLE)
         AS gamma
FROM t WHERE r_lo IS NOT NULL
GROUP BY 1, 2"""


GEOM_QUERIES["semivariogram"] = (q_semivariogram, sql_semivariogram)


def q_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rand/ARI agreement between two independent cell labelings of
    the walk sample (operators/cluster.py rand_index): a coarse-grid
    labeling vs a shifted-origin labeling of the same points — pure
    contingency-cell pair arithmetic, no pair join; the external
    clustering comparison beside centroid_silhouette's internal
    score."""
    from .geo.tilemath import floor_div
    from .operators.cluster import rand_index
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("id"), "x", "y"))
    lab = pts.select(
        "id",
        F.concat_ws(":", floor_div(F.col("x"), 4096),
                    floor_div(F.col("y"), 4096)).alias("la"),
        F.concat_ws(":", floor_div(F.col("x") + 2048, 4096),
                    floor_div(F.col("y") + 2048, 4096)).alias("lb"))
    return rand_index(lab, "la", "lb")


def sql_rand_index() -> str:
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (
  SELECT event_id AS id, x, y FROM pos
  WHERE event_id % {_CE_QMOD} = 0),
lab AS (
  SELECT id,
         CAST(CASE WHEN x >= 0 THEN x // 4096
                   ELSE -((-x + 4095) // 4096) END AS VARCHAR)
           || ':' ||
         CAST(CASE WHEN y >= 0 THEN y // 4096
                   ELSE -((-y + 4095) // 4096) END AS VARCHAR) AS la,
         CAST(CASE WHEN x + 2048 >= 0 THEN (x + 2048) // 4096
                   ELSE -((-(x + 2048) + 4095) // 4096) END
              AS VARCHAR)
           || ':' ||
         CAST(CASE WHEN y + 2048 >= 0 THEN (y + 2048) // 4096
                   ELSE -((-(y + 2048) + 4095) // 4096) END
              AS VARCHAR) AS lb
  FROM p),
cell AS (
  SELECT la, lb, CAST(COUNT(*) AS BIGINT) AS n
  FROM lab GROUP BY 1, 2),
s AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS s_pairs
  FROM cell),
pa AS (
  SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS pa_pairs
  FROM (SELECT la, CAST(SUM(n) AS BIGINT) AS m
        FROM cell GROUP BY 1)),
pb AS (
  SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS pb_pairs
  FROM (SELECT lb, CAST(SUM(n) AS BIGINT) AS m
        FROM cell GROUP BY 1))
SELECT s.n, s.s_pairs, pa.pa_pairs, pb.pb_pairs,
       CASE WHEN s.n * (s.n - 1) // 2 > 0 THEN
         CAST(s.n * (s.n - 1) // 2 + 2 * s.s_pairs
              - pa.pa_pairs - pb.pb_pairs AS DOUBLE)
         / CAST(s.n * (s.n - 1) // 2 AS DOUBLE) END AS rand,
       CASE WHEN s.n * (s.n - 1) // 2 > 0
             AND CAST(pa.pa_pairs + pb.pb_pairs AS DOUBLE) / 2.0
                 - CAST(pa.pa_pairs AS DOUBLE)
                   * CAST(pb.pb_pairs AS DOUBLE)
                   / CAST(s.n * (s.n - 1) // 2 AS DOUBLE) <> 0.0
            THEN (CAST(s.s_pairs AS DOUBLE)
                  - CAST(pa.pa_pairs AS DOUBLE)
                    * CAST(pb.pb_pairs AS DOUBLE)
                    / CAST(s.n * (s.n - 1) // 2 AS DOUBLE))
                 / (CAST(pa.pa_pairs + pb.pb_pairs AS DOUBLE) / 2.0
                    - CAST(pa.pa_pairs AS DOUBLE)
                      * CAST(pb.pb_pairs AS DOUBLE)
                      / CAST(s.n * (s.n - 1) // 2 AS DOUBLE))
       END AS ari
FROM s CROSS JOIN pa CROSS JOIN pb"""


GEOM_QUERIES["rand_index"] = (q_rand_index, sql_rand_index)


def q_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn slope/aspect on the ESDA density surface
    (operators/raster.py slope_aspect): ×8-scaled exact integer
    gradients over complete 3×3 windows, slope one pinned √, aspect
    as the integer D8 octant — the continuous-gradient companion of
    the d8_flow gate."""
    from .operators.raster import slope_aspect

    return slope_aspect(_esda_cells(spark, sf_dir), "cx", "cy",
                        "n_feat")


def sql_slope_aspect() -> str:
    offs8 = ", ".join(f"({dx},{dy})" for dx in (-1, 0, 1)
                      for dy in (-1, 0, 1) if (dx, dy) != (0, 0))
    return f"""WITH {_sql_esda_cells()},
offs AS (SELECT * FROM (VALUES {offs8}) AS t(dx, dy)),
nb AS (
  SELECT a.cx + dx AS tx, a.cy + dy AS ty,
         -dx AS rdx, -dy AS rdy, a.v AS sv
  FROM cells a CROSS JOIN offs),
agg AS (
  SELECT c.cx, c.cy, c.v,
         COUNT(*) AS k,
         CAST(SUM(rdx * (CASE WHEN rdy = 0 THEN 2 ELSE 1 END)
                  * nb.sv) AS BIGINT) AS gx8,
         CAST(SUM(rdy * (CASE WHEN rdx = 0 THEN 2 ELSE 1 END)
                  * nb.sv) AS BIGINT) AS gy8
  FROM cells c JOIN nb ON nb.tx = c.cx AND nb.ty = c.cy
  GROUP BY 1, 2, 3)
SELECT cx, cy, CAST(v AS BIGINT) AS n_feat, gx8, gy8,
       gx8 * gx8 + gy8 * gy8 AS slope64_q,
       sqrt(CAST(gx8 * gx8 + gy8 * gy8 AS DOUBLE)) / 8.0 AS slope,
       CASE WHEN gx8 * gx8 + gy8 * gy8 > 0 THEN
         CASE WHEN abs(-gx8) >= 2 * abs(-gy8) THEN
                CASE WHEN -gx8 > 0 THEN 0 ELSE 4 END
              WHEN abs(-gy8) >= 2 * abs(-gx8) THEN
                CASE WHEN -gy8 > 0 THEN 2 ELSE 6 END
              WHEN -gx8 > 0 AND -gy8 > 0 THEN 1
              WHEN -gx8 < 0 AND -gy8 > 0 THEN 3
              WHEN -gx8 < 0 AND -gy8 < 0 THEN 5
              ELSE 7 END
       END AS aspect_oct
FROM agg WHERE k = 8"""


GEOM_QUERIES["slope_aspect"] = (q_slope_aspect, sql_slope_aspect)


def q_nmi_clusterings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NMI between the rand_index gate's two cell labelings
    (operators/cluster.py nmi_clusterings): pinned label-ordered
    Σ·ln folds over exact contingency counts — the
    information-theoretic half of the external clustering
    comparison."""
    from .geo.tilemath import floor_div
    from .operators.cluster import nmi_clusterings
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = (random_walk_positions(ev, jump=_TRAJ_JUMP)
           .filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
           .select(F.col("event_id").alias("id"), "x", "y"))
    lab = pts.select(
        "id",
        F.concat_ws(":", floor_div(F.col("x"), 4096),
                    floor_div(F.col("y"), 4096)).alias("la"),
        F.concat_ws(":", floor_div(F.col("x") + 2048, 4096),
                    floor_div(F.col("y") + 2048, 4096)).alias("lb"))
    return nmi_clusterings(lab, "la", "lb")


def sql_nmi_clusterings() -> str:
    fold = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {lst}), "
            "(a, x) -> a + x)")
    mi_l = fold.format(lst="list(t ORDER BY _a, _b)")
    ha_l = fold.format(lst="list(t ORDER BY _a)")
    hb_l = fold.format(lst="list(t ORDER BY _b)")
    return f"""WITH {_sql_walk_pos()},
p AS MATERIALIZED (
  SELECT event_id AS id, x, y FROM pos
  WHERE event_id % {_CE_QMOD} = 0),
lab AS (
  SELECT id,
         CAST(CASE WHEN x >= 0 THEN x // 4096
                   ELSE -((-x + 4095) // 4096) END AS VARCHAR)
           || ':' ||
         CAST(CASE WHEN y >= 0 THEN y // 4096
                   ELSE -((-y + 4095) // 4096) END AS VARCHAR) AS _a,
         CAST(CASE WHEN x + 2048 >= 0 THEN (x + 2048) // 4096
                   ELSE -((-(x + 2048) + 4095) // 4096) END
              AS VARCHAR)
           || ':' ||
         CAST(CASE WHEN y + 2048 >= 0 THEN (y + 2048) // 4096
                   ELSE -((-(y + 2048) + 4095) // 4096) END
              AS VARCHAR) AS _b
  FROM p),
cell AS (
  SELECT _a, _b, CAST(COUNT(*) AS BIGINT) AS k
  FROM lab GROUP BY 1, 2),
nn AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM cell),
mt AS (
  SELECT c._a, c._b,
         (CAST(c.k AS DOUBLE) / CAST(nn.n AS DOUBLE))
         * ln(CAST(c.k * nn.n AS DOUBLE)
              / CAST(ra.m * cb.m AS DOUBLE)) AS t
  FROM cell c
  JOIN (SELECT _a, CAST(SUM(k) AS BIGINT) AS m FROM cell GROUP BY 1)
       ra ON ra._a = c._a
  JOIN (SELECT _b, CAST(SUM(k) AS BIGINT) AS m FROM cell GROUP BY 1)
       cb ON cb._b = c._b
  CROSS JOIN nn),
mi AS (SELECT {mi_l} AS mi_nats FROM mt),
hat AS (
  SELECT _a, (CAST(m AS DOUBLE) / CAST(nn.n AS DOUBLE))
             * ln(CAST(nn.n AS DOUBLE) / CAST(m AS DOUBLE)) AS t
  FROM (SELECT _a, CAST(SUM(k) AS BIGINT) AS m FROM cell GROUP BY 1)
  CROSS JOIN nn),
hbt AS (
  SELECT _b, (CAST(m AS DOUBLE) / CAST(nn.n AS DOUBLE))
             * ln(CAST(nn.n AS DOUBLE) / CAST(m AS DOUBLE)) AS t
  FROM (SELECT _b, CAST(SUM(k) AS BIGINT) AS m FROM cell GROUP BY 1)
  CROSS JOIN nn),
ha AS (SELECT {ha_l} AS h_a FROM hat),
hb AS (SELECT {hb_l} AS h_b FROM hbt)
SELECT nn.n, mi.mi_nats, ha.h_a, hb.h_b,
       CASE WHEN ha.h_a > 0.0 AND hb.h_b > 0.0
            THEN mi.mi_nats / sqrt(ha.h_a * hb.h_b) END AS nmi
FROM nn CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb"""


GEOM_QUERIES["nmi_clusterings"] = (q_nmi_clusterings,
                                   sql_nmi_clusterings)


_SHEP_RADIUS = 1500        # candidate ball, micro-degrees
_SHEP_QMOD = 10            # every 10th event -> query site


def q_shepard_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shepard inverse-distance-squared interpolation of event cents
    at off-sample walk sites (operators/spatialstats.py
    idw_interpolate): the planar, radius-bounded sibling of the
    geohash-ring ``idw_interpolate`` gate.  Corpus = the clark_evans
    500-point sample (cents values); queries = every 10th event's
    walk position, so half the queries COINCIDE with a corpus point
    and exercise the exact-hit mean rule (an exact integer ratio)
    while the rest take the 1/d² weighted path.  Candidates come from
    ONE grid_radius_join (×9 probe, exact integer d²); both weight
    sums are pinned corpus-id-ordered in-row folds, so y_hat is
    bit-reproducible cross-engine."""
    from .operators.spatialstats import idw_interpolate
    from .operators.trajectory import random_walk_positions
    from .queries_curation import _cents

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    vals = (ev.filter(F.col("value").isNotNull())
            .select(F.col("event_id").alias("j"), _cents().alias("v")))
    corpus = (pos.filter(F.pmod(F.col("event_id"), F.lit(_CE_QMOD)) == 0)
              .select(F.col("event_id").alias("j"), "x", "y")
              .join(vals, "j"))
    queries = (pos.filter(F.pmod(F.col("event_id"),
                                 F.lit(_SHEP_QMOD)) == 0)
               .select(F.col("event_id").alias("q"), "x", "y"))
    return idw_interpolate(queries, corpus, _SHEP_RADIUS)


def sql_shepard_idw() -> str:
    r2 = _SHEP_RADIUS * _SHEP_RADIUS
    return f"""WITH {_sql_walk_pos()},
samp AS MATERIALIZED (
  SELECT pos.event_id AS j, pos.x, pos.y,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS v
  FROM pos JOIN events e ON e.event_id = pos.event_id
  WHERE pos.event_id % {_CE_QMOD} = 0 AND e.value IS NOT NULL),
qry AS MATERIALIZED (
  SELECT event_id AS q, x, y FROM pos WHERE event_id % {_SHEP_QMOD} = 0),
pairs AS (
  SELECT qry.q, samp.j, samp.v,
         (qry.x-samp.x)*(qry.x-samp.x)
           + (qry.y-samp.y)*(qry.y-samp.y) AS d2
  FROM qry JOIN samp
    ON (qry.x-samp.x)*(qry.x-samp.x)
         + (qry.y-samp.y)*(qry.y-samp.y) <= {r2}),
w AS (
  SELECT q, j,
         CASE WHEN d2 > 0 THEN CAST(v AS DOUBLE) / CAST(d2 AS DOUBLE)
              ELSE 0.0 END AS wn,
         CASE WHEN d2 > 0 THEN 1.0 / CAST(d2 AS DOUBLE)
              ELSE 0.0 END AS wd,
         CASE WHEN d2 = 0 THEN 1 ELSE 0 END AS ex,
         CASE WHEN d2 = 0 THEN v ELSE 0 END AS ev
  FROM pairs)
SELECT q, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(ex) AS BIGINT) AS n_exact,
       CASE WHEN SUM(ex) > 0
            THEN CAST(SUM(ev) AS DOUBLE) / CAST(SUM(ex) AS DOUBLE)
            ELSE list_reduce(list(wn ORDER BY j), (a, b) -> a + b)
                 / list_reduce(list(wd ORDER BY j), (a, b) -> a + b)
       END AS y_hat
FROM w GROUP BY q"""


GEOM_QUERIES["shepard_idw"] = (q_shepard_idw, sql_shepard_idw)


def q_hull_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell hull diameter with witness pair (geo/hull.py
    hull_metrics) over the convex_hull_cells scatter: the engine
    searches pairs on the SMALL hull-boundary set only; the oracle is
    the independent brute max over ALL cell point pairs — a value-hash
    match proves the extreme-point reduction loses no maximal pair,
    witness included (min-lex tie rule)."""
    from .geo.hull import hull_metrics
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    pts = (feats.filter(F.col("feature_id") % _HULL_QMOD == 0)
           .select(F.pmod(F.col("feature_id") * 7919,
                          F.lit(360000)).alias("x"),
                   F.pmod(F.col("feature_id") * 104729,
                          F.lit(170000)).alias("y"))
           .distinct())
    return hull_metrics(pts, _HULL_CELL)


def sql_hull_diameter() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    c, q = _HULL_CELL, _HULL_QMOD
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT DISTINCT ((feature_id * 7919) % 360000) // {c} AS cx,
         ((feature_id * 104729) % 170000) // {c} AS cy,
         (feature_id * 7919) % 360000 AS x,
         (feature_id * 104729) % 170000 AS y
  FROM features WHERE feature_id % {q} = 0),
cnt AS (
  SELECT cx, cy, COUNT(*) AS n_pts, MIN(x) AS px, MIN(y) AS py
  FROM pts GROUP BY 1, 2),
bnd AS (
  SELECT p.cx, p.cy, p.x, p.y
  FROM pts p JOIN cnt t ON t.cx = p.cx AND t.cy = p.cy
  WHERE t.n_pts = 1 OR EXISTS (
    SELECT 1 FROM pts q
    WHERE q.cx = p.cx AND q.cy = p.cy AND (q.x <> p.x OR q.y <> p.y)
      AND NOT EXISTS (
        SELECT 1 FROM pts r
        WHERE r.cx = p.cx AND r.cy = p.cy
          AND (q.x - p.x) * (r.y - p.y)
              - (q.y - p.y) * (r.x - p.x) < 0))),
bc AS (SELECT cx, cy, COUNT(*) AS n_boundary FROM bnd GROUP BY 1, 2),
pairs AS (
  SELECT a.cx, a.cy,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
         a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
  FROM pts a JOIN pts b
    ON a.cx = b.cx AND a.cy = b.cy
   AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
best AS (
  SELECT cx, cy, d2, ax, ay, bx, by
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY cx, cy
          ORDER BY d2 DESC, ax, ay, bx, by) AS rn
        FROM pairs)
  WHERE rn = 1)
SELECT cnt.cx, cnt.cy, cnt.n_pts, bc.n_boundary,
       COALESCE(best.d2, 0) AS diam2,
       COALESCE(best.ax, cnt.px) AS ax,
       COALESCE(best.ay, cnt.py) AS ay,
       COALESCE(best.bx, cnt.px) AS bx,
       COALESCE(best.by, cnt.py) AS by
FROM cnt JOIN bc ON bc.cx = cnt.cx AND bc.cy = cnt.cy
LEFT JOIN best ON best.cx = cnt.cx AND best.cy = cnt.cy"""


GEOM_QUERIES["hull_diameter"] = (q_hull_diameter, sql_hull_diameter)


_CLIP_TILE = 512
_CLIP_SCALE = 8


def q_tile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tile clipping of the wiggly polylines (geo/clip.py
    clip_segments_to_tiles): every segment cut into per-tile pieces by
    integer Liang-Barsky — entry/exit parameters as (num, den)
    fractions, cross-multiplied comparisons, half-up subpixel
    quantization — so the clipped geometry value-hashes across
    engines.  The spike vertices force real diagonal boundary
    crossings with non-trivial rational clip points."""
    from .geo.clip import clip_segments_to_tiles

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RDP_LINES))
    lines = part.select(F.col("p_partkey").alias("line_id"),
                        _wiggly_verts().alias("verts"))
    seg = F.transform(
        F.sequence(F.lit(0), F.lit(_RDP_N - 2)),
        lambda i: F.struct(
            i.cast("long").alias("seg_i"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["x"]
            .alias("x0"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["y"]
            .alias("y0"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["x"]
            .alias("x1"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["y"]
            .alias("y1")))
    segs = (lines.select("line_id", F.explode(seg).alias("s"))
            .select("line_id", "s.*"))
    return clip_segments_to_tiles(segs, _CLIP_TILE, _CLIP_SCALE)


def sql_tile_clip() -> str:
    t, sc = _CLIP_TILE, _CLIP_SCALE
    return f"""WITH pts AS (
  SELECT p_partkey AS line_id, CAST(t.i AS BIGINT) AS i,
         CAST(t.i * 256 AS BIGINT) AS x,
         CAST((p_partkey*37 + t.i*13) % 7
              + CASE WHEN t.i = p_partkey % {_RDP_N} THEN 1000 ELSE 0 END
              AS BIGINT) AS y
  FROM part, LATERAL (SELECT unnest(range({_RDP_N})) AS i) t
  WHERE p_partkey <= {_RDP_LINES}),
segs AS (
  SELECT line_id, i AS seg_i, x AS x0, y AS y0,
         lead(x) OVER w AS x1, lead(y) OVER w AS y1
  FROM pts WINDOW w AS (PARTITION BY line_id ORDER BY i)
  QUALIFY lead(x) OVER w IS NOT NULL),
cand AS (
  SELECT s.*, s.x1 - s.x0 AS dx, s.y1 - s.y0 AS dy, t1.tx, t2.ty
  FROM segs s,
  LATERAL (SELECT unnest(range(least(x0, x1) // {t},
                               greatest(x0, x1) // {t} + 1)) AS tx) t1,
  LATERAL (SELECT unnest(range(least(y0, y1) // {t},
                               greatest(y0, y1) // {t} + 1)) AS ty) t2),
ax AS (
  SELECT *,
    CASE WHEN dx > 0 THEN tx*{t} - x0 WHEN dx < 0 THEN x0 - (tx+1)*{t}
         WHEN x0 BETWEEN tx*{t} AND (tx+1)*{t} THEN 0 ELSE 1
    END AS xen_a,
    CASE WHEN dx > 0 THEN (tx+1)*{t} - x0 WHEN dx < 0 THEN x0 - tx*{t}
         WHEN x0 BETWEEN tx*{t} AND (tx+1)*{t} THEN 1 ELSE 0
    END AS xex_a,
    CASE WHEN dx > 0 THEN dx WHEN dx < 0 THEN -dx ELSE 1 END AS xb,
    CASE WHEN dy > 0 THEN ty*{t} - y0 WHEN dy < 0 THEN y0 - (ty+1)*{t}
         WHEN y0 BETWEEN ty*{t} AND (ty+1)*{t} THEN 0 ELSE 1
    END AS yen_a,
    CASE WHEN dy > 0 THEN (ty+1)*{t} - y0 WHEN dy < 0 THEN y0 - ty*{t}
         WHEN y0 BETWEEN ty*{t} AND (ty+1)*{t} THEN 1 ELSE 0
    END AS yex_a,
    CASE WHEN dy > 0 THEN dy WHEN dy < 0 THEN -dy ELSE 1 END AS yb
  FROM cand),
e AS (
  SELECT *,
    CASE WHEN xen_a*yb >= yen_a*xb THEN xen_a ELSE yen_a END AS e_a,
    CASE WHEN xen_a*yb >= yen_a*xb THEN xb ELSE yb END AS e_b,
    CASE WHEN xex_a*yb <= yex_a*xb THEN xex_a ELSE yex_a END AS g_a,
    CASE WHEN xex_a*yb <= yex_a*xb THEN xb ELSE yb END AS g_b
  FROM ax),
tt AS (
  SELECT *,
    CASE WHEN e_a >= 0 THEN e_a ELSE 0 END AS t0a,
    CASE WHEN e_a >= 0 THEN e_b ELSE 1 END AS t0b,
    CASE WHEN g_a <= g_b THEN g_a ELSE 1 END AS t1a,
    CASE WHEN g_a <= g_b THEN g_b ELSE 1 END AS t1b
  FROM e)
SELECT line_id, seg_i, tx, ty,
       (2*{sc}*(x0*t0b + dx*t0a) + t0b) // (2*t0b) AS qx0,
       (2*{sc}*(y0*t0b + dy*t0a) + t0b) // (2*t0b) AS qy0,
       (2*{sc}*(x0*t1b + dx*t1a) + t1b) // (2*t1b) AS qx1,
       (2*{sc}*(y0*t1b + dy*t1a) + t1b) // (2*t1b) AS qy1,
       t0a > 0 AS cut_in, t1a < t1b AS cut_out
FROM tt WHERE t0a*t1b < t1a*t0b"""


GEOM_QUERIES["tile_clip"] = (q_tile_clip, sql_tile_clip)


_RCLIP_TILE = 2048
_RCLIP_SCALE = 8
_RCLIP_PARTS = 300


def q_ring_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sutherland-Hodgman polygon clipping of hashed diamonds into
    tile boxes (geo/clip.py clip_rings_to_tiles): four half-plane
    window passes, exact-rational intersections snapped half-up at
    emission, consecutive-duplicate collapse — the MVT areas cut
    beside tile_clip's segment cut; vertex ORDER is part of the
    value hash."""
    from .geo.clip import clip_rings_to_tiles

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RCLIP_PARTS))
    pk = F.col("p_partkey")
    cx = F.pmod(pk * 7919, F.lit(360000))
    cy = F.pmod(pk * 104729, F.lit(170000))
    r = F.pmod(pk, F.lit(1500)) + 100
    verts = F.array(
        F.struct((cx + r).alias("x"), cy.alias("y")),
        F.struct(cx.alias("x"), (cy + r).alias("y")),
        F.struct(F.greatest(cx - r, F.lit(0)).alias("x"),
                 cy.alias("y")),
        F.struct(cx.alias("x"),
                 F.greatest(cy - r, F.lit(0)).alias("y")))
    rings = part.select(pk.alias("ring_id"), verts.alias("verts"))
    return clip_rings_to_tiles(rings, _RCLIP_TILE, _RCLIP_SCALE)


def _sql_ring_stage(src: str, dst: str, axis: str, cmp: str,
                    bound: str) -> str:
    op = ">=" if cmp == "ge" else "<="
    if axis == "x":
        d, off_c, off_p, prv = "(x - px)", "y", "py", "px"
        ipt = f"{{'sub': 0, 'x': {bound}, 'y': ioff}}"
    else:
        d, off_c, off_p, prv = "(y - py)", "x", "px", "py"
        ipt = f"{{'sub': 0, 'x': ioff, 'y': {bound}}}"
    cur = "x" if axis == "x" else "y"
    pc = "px" if axis == "x" else "py"
    return f""",
{dst}_a AS (
  SELECT rid, tx, ty, i, x, y,
         coalesce(lag(x) OVER w, last_value(x) OVER wf) AS px,
         coalesce(lag(y) OVER w, last_value(y) OVER wf) AS py
  FROM {src}
  WINDOW w AS (PARTITION BY rid, tx, ty ORDER BY i),
         wf AS (PARTITION BY rid, tx, ty ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING)),
{dst}_b AS (
  SELECT rid, tx, ty, i, x, y, px, py,
         (2 * (CASE WHEN {d} < 0
               THEN -({off_p} * {d} + ({off_c} - {off_p})
                      * (({bound}) - {prv}))
               ELSE {off_p} * {d} + ({off_c} - {off_p})
                    * (({bound}) - {prv}) END)
          + abs({d})) // (2 * greatest(abs({d}), 1)) AS ioff
  FROM {dst}_a),
{dst}_c AS (
  SELECT rid, tx, ty, i, u.sub, u.x, u.y
  FROM {dst}_b, LATERAL (SELECT unnest(
    CASE WHEN {cur} {op} ({bound}) AND {pc} {op} ({bound})
         THEN [{{'sub': 1, 'x': x, 'y': y}}]
         WHEN {cur} {op} ({bound}) AND NOT ({pc} {op} ({bound}))
         THEN [{ipt}, {{'sub': 1, 'x': x, 'y': y}}]
         WHEN NOT ({cur} {op} ({bound})) AND {pc} {op} ({bound})
         THEN [{ipt}]
         ELSE []::STRUCT(sub INT, x BIGINT, y BIGINT)[] END)
    AS u) t),
{dst} AS (
  SELECT rid, tx, ty,
         ROW_NUMBER() OVER (PARTITION BY rid, tx, ty
                            ORDER BY i, sub) AS i, x, y
  FROM {dst}_c)"""


def sql_ring_clip(geom_sql: "str | None" = None) -> str:
    ts = _RCLIP_TILE * _RCLIP_SCALE
    sc = _RCLIP_SCALE
    stages = (
        _sql_ring_stage("cand", "s1", "x", "ge", f"tx * {ts}")
        + _sql_ring_stage("s1", "s2", "x", "le", f"(tx + 1) * {ts}")
        + _sql_ring_stage("s2", "s3", "y", "ge", f"ty * {ts}")
        + _sql_ring_stage("s3", "s4", "y", "le", f"(ty + 1) * {ts}"))
    if geom_sql is None:
        geom_sql = f"""
  SELECT p_partkey AS rid,
         (p_partkey * 7919) % 360000 AS cx,
         (p_partkey * 104729) % 170000 AS cy,
         p_partkey % 1500 + 100 AS r
  FROM part WHERE p_partkey <= {_RCLIP_PARTS}"""
    return f"""WITH geom AS ({geom_sql}),
v AS (
  SELECT rid, t.i,
         CAST(t.vx * {sc} AS BIGINT) AS x,
         CAST(t.vy * {sc} AS BIGINT) AS y
  FROM geom, LATERAL (
    SELECT * FROM (VALUES
      (0, cx + r, cy), (1, cx, cy + r),
      (2, greatest(cx - r, 0), cy), (3, cx, greatest(cy - r, 0)))
      AS q(i, vx, vy)) t),
bb AS (
  SELECT rid, MIN(x) // {ts} AS txl, MAX(x) // {ts} AS txh,
         MIN(y) // {ts} AS tyl, MAX(y) // {ts} AS tyh
  FROM v GROUP BY rid),
cand AS (
  SELECT v.rid, t1.tx, t2.ty, v.i, v.x, v.y
  FROM v JOIN bb ON bb.rid = v.rid,
  LATERAL (SELECT unnest(range(bb.txl, bb.txh + 1)) AS tx) t1,
  LATERAL (SELECT unnest(range(bb.tyl, bb.tyh + 1)) AS ty) t2){stages},
ded AS (
  SELECT rid, tx, ty, i, x, y,
         coalesce(lag(x) OVER w, last_value(x) OVER wf) AS px,
         coalesce(lag(y) OVER w, last_value(y) OVER wf) AS py,
         COUNT(*) OVER (PARTITION BY rid, tx, ty) AS cnt
  FROM s4
  WINDOW w AS (PARTITION BY rid, tx, ty ORDER BY i),
         wf AS (PARTITION BY rid, tx, ty ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING)),
kept AS (
  SELECT rid, tx, ty, i, x, y FROM ded
  WHERE cnt = 1 OR x <> px OR y <> py),
fin AS (
  SELECT rid, tx, ty,
         ROW_NUMBER() OVER (PARTITION BY rid, tx, ty
                            ORDER BY i) AS i, x, y,
         COUNT(*) OVER (PARTITION BY rid, tx, ty) AS n
  FROM kept)
SELECT rid AS ring_id, tx, ty, CAST(i AS BIGINT) AS i, x, y
FROM fin WHERE n >= 3"""


GEOM_QUERIES["ring_clip"] = (q_ring_clip, sql_ring_clip)


def q_tile_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile summed polygon coverage: the ring_clip diamonds'
    clipped pieces reduced by the exact shoelace fold (geo/geom.py
    shoelace_area2) and normalized by tile area — the raster-style
    density summary the areas pyramid needs (overlapping rings sum;
    union-area is a different operator, documented)."""
    from .geo.clip import clip_rings_to_tiles
    from .geo.geom import shoelace_area2

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RCLIP_PARTS))
    pk = F.col("p_partkey")
    cx = F.pmod(pk * 7919, F.lit(360000))
    cy = F.pmod(pk * 104729, F.lit(170000))
    r = F.pmod(pk, F.lit(1500)) + 100
    verts = F.array(
        F.struct((cx + r).alias("x"), cy.alias("y")),
        F.struct(cx.alias("x"), (cy + r).alias("y")),
        F.struct(F.greatest(cx - r, F.lit(0)).alias("x"),
                 cy.alias("y")),
        F.struct(cx.alias("x"),
                 F.greatest(cy - r, F.lit(0)).alias("y")))
    rings = part.select(pk.alias("ring_id"), verts.alias("verts"))
    clipped = clip_rings_to_tiles(rings, _RCLIP_TILE, _RCLIP_SCALE)
    rv = (clipped.groupBy("ring_id", "tx", "ty")
          .agg(F.transform(
              F.array_sort(F.collect_list(
                  F.struct("i", "x", "y"))),
              lambda s: F.struct(s["x"].alias("x"),
                                 s["y"].alias("y"))).alias("verts")))
    a2 = F.abs(shoelace_area2(F.col("verts")))
    ts = _RCLIP_TILE * _RCLIP_SCALE
    return (rv.select("tx", "ty", a2.alias("_a2"))
            .groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("n_rings"),
                 F.sum("_a2").alias("area2_sum"))
            .withColumn("coverage",
                        F.col("area2_sum").cast("double")
                        / F.lit(float(2 * ts * ts))))


def sql_tile_coverage() -> str:
    base = sql_ring_clip()
    # reuse the full ring_clip chain as a subquery
    ts = _RCLIP_TILE * _RCLIP_SCALE
    return f"""WITH clipped AS ({base}),
t AS (
  SELECT ring_id, tx, ty, i, x, y,
         lead(x) OVER w AS nx, lead(y) OVER w AS ny,
         first_value(x) OVER w AS fx, first_value(y) OVER w AS fy
  FROM clipped
  WINDOW w AS (PARTITION BY ring_id, tx, ty ORDER BY i)),
a AS (
  SELECT ring_id, tx, ty,
         abs(SUM(x * coalesce(ny, fy) - coalesce(nx, fx) * y)) AS a2
  FROM t GROUP BY 1, 2, 3)
SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_rings,
       CAST(SUM(a2) AS BIGINT) AS area2_sum,
       CAST(SUM(a2) AS DOUBLE) / {float(2 * ts * ts)!r} AS coverage
FROM a GROUP BY 1, 2"""


GEOM_QUERIES["tile_coverage"] = (q_tile_coverage, sql_tile_coverage)


_KANON_K = 10
_KANON_PREC = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial k-anonymity over the feature scatter
    (operators/privacy.py k_anonymity_generalize): every feature
    published at the finest geohash prefix holding ≥ 10 peers,
    under-k singletons suppressed — generalize-then-suppress on the
    geohash hierarchy, exact counts end to end."""
    from .geo.geohash import geohash
    from .operators.privacy import k_anonymity_generalize
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.col("feature_id").alias("id"),
        geohash(F.col("lon"), F.col("lat"), _KANON_PREC).alias("gh"))
    return k_anonymity_generalize(feats, _KANON_K, _KANON_PREC)


def sql_k_anonymity() -> str:
    from .geo.geohash import sql_geohash_select
    from .sources.features import FEATURES_ORACLE_SQL

    src = (f"WITH {FEATURES_ORACLE_SQL} "
           "SELECT feature_id, lon, lat FROM features")
    inner = sql_geohash_select(src, ["feature_id"], "lon", "lat",
                               precision=_KANON_PREC, out="gh")
    return f"""WITH pts AS ({inner}),
pref AS (
  SELECT feature_id AS id, t.p, SUBSTR(gh, 1, t.p) AS cell
  FROM pts, LATERAL (SELECT unnest(range(1, {_KANON_PREC} + 1))
                     AS p) t),
cnt AS (
  SELECT p, cell, CAST(COUNT(*) AS BIGINT) AS cell_count
  FROM pref GROUP BY 1, 2 HAVING COUNT(*) >= {_KANON_K}),
best AS (
  SELECT pr.id, pr.p, pr.cell, c.cell_count,
         ROW_NUMBER() OVER (PARTITION BY pr.id
                            ORDER BY pr.p DESC) AS rn
  FROM pref pr JOIN cnt c ON c.p = pr.p AND c.cell = pr.cell)
SELECT p.feature_id AS id,
       CAST(coalesce(b.p, 0) AS INTEGER) AS prec,
       b.cell, b.cell_count
FROM pts p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.id = p.feature_id"""


GEOM_QUERIES["k_anonymity"] = (q_k_anonymity, sql_k_anonymity)


_KNAP_Z = 8
_KNAP_CAP = 64


def q_tile_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile feature-budget knapsack at z=8
    (operators/assemble.py tile_knapsack): hashed weights/scores,
    capacity 64 — the exact DP ceiling every greedy tile-dropping
    heuristic is judged against, value-hashed per tile."""
    from .geo.tilemath import tile_cols
    from .operators.assemble import tile_knapsack
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    tx, ty = tile_cols(F.col("lon"), F.col("lat"), F.lit(_KNAP_Z))
    items = feats.select(
        F.lit(_KNAP_Z).cast("long").alias("z"),
        tx.alias("x"), ty.alias("y"),
        "feature_id",
        (F.pmod(F.col("feature_id"), F.lit(19)) + 1).alias("w"),
        (F.pmod(F.col("feature_id"), F.lit(47)) + 1).alias("v"))
    return tile_knapsack(items, _KNAP_CAP)


def sql_tile_knapsack() -> str:
    from .queries import _sql_tile_x, _sql_tile_y
    from .sources.features import FEATURES_ORACLE_SQL

    cap = _KNAP_CAP
    zero = "[" + ",".join("0" for _ in range(cap + 1)) + "]"
    return f"""WITH {FEATURES_ORACLE_SQL},
items AS (
  SELECT CAST({_KNAP_Z} AS BIGINT) AS z,
         {_sql_tile_x(_KNAP_Z)} AS x, {_sql_tile_y(_KNAP_Z)} AS y,
         feature_id,
         CAST(feature_id % 19 + 1 AS BIGINT) AS w,
         CAST(feature_id % 47 + 1 AS BIGINT) AS v
  FROM features),
per AS (
  SELECT z, x, y, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(w) AS BIGINT) AS w_total,
         list(CASE WHEN w <= {cap} THEN [w, v] END
              ORDER BY feature_id) FILTER (WHERE w <= {cap}) AS a
  FROM items GROUP BY 1, 2, 3)
SELECT z, x, y, n_items, w_total,
       coalesce(list_reduce(
         list_prepend(CAST({zero} AS BIGINT[]), coalesce(a, [])),
         (acc, it) -> list_transform(range(0, {cap + 1}),
             c -> greatest(acc[c + 1],
                  CASE WHEN c >= it[1]
                       THEN acc[CAST(c - it[1] + 1 AS INTEGER)] + it[2]
                       ELSE acc[c + 1] END)))[{cap + 1}],
         0) AS best_value
FROM per"""


GEOM_QUERIES["tile_knapsack"] = (q_tile_knapsack, sql_tile_knapsack)


_LDIV_L = 3


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the k_anonymity release
    (operators/privacy.py l_diversity_audit): each published geohash
    cell checked for ≥ 3 distinct sensitive categories — the leak
    k-anonymity alone misses."""
    from .geo.geohash import geohash
    from .operators.privacy import l_diversity_audit
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.col("feature_id").alias("id"),
        geohash(F.col("lon"), F.col("lat"), _KANON_PREC).alias("gh"),
        F.pmod(F.col("feature_id"), F.lit(6)).alias("s"))
    return l_diversity_audit(feats, _KANON_K, _KANON_PREC, _LDIV_L)


def sql_l_diversity() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    base = sql_k_anonymity()
    return f"""WITH gen AS ({base}),
sens AS (
  SELECT feature_id AS id, feature_id % 6 AS s
  FROM (WITH {FEATURES_ORACLE_SQL} SELECT feature_id FROM features))
SELECT g.prec, g.cell, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT s.s) AS BIGINT) AS n_sensitive,
       g.cell IS NOT NULL AND COUNT(DISTINCT s.s) >= {_LDIV_L}
         AS diverse
FROM gen g JOIN sens s ON s.id = g.id
GROUP BY 1, 2"""


GEOM_QUERIES["l_diversity"] = (q_l_diversity, sql_l_diversity)


_RANSAC_QMOD = 5
_RANSAC_CAND = 16
_RANSAC_EPS = 100


def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line recovery on a planted-slope scatter
    with 25% gross outliers (operators/cluster.py ransac_line):
    hash-drawn candidate pairs, exact cross-multiplied inlier tests,
    (max inliers, min candidate) winner — the >50%-breakdown robust
    fit beside theil_sen_slope."""
    from .operators.cluster import ransac_line
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir)
    fid = F.col("feature_id")
    g = F.pmod(fid, F.lit(3))
    x = F.pmod(fid * 7919, F.lit(2000))
    outlier = F.pmod(fid * 31, F.lit(4)) == 0
    y = (F.when(outlier, F.pmod(fid * 104729, F.lit(8000)) - 4000)
         .otherwise((g + 1) * x + F.pmod(fid * 13, F.lit(60)) - 30))
    pts = (feats.filter(F.pmod(fid, F.lit(_RANSAC_QMOD)) == 0)
           .select(g.alias("g"), fid.alias("id"),
                   x.alias("x"), y.alias("y")))
    return ransac_line(pts, ["g"], eps=_RANSAC_EPS,
                       n_cand=_RANSAC_CAND)


def sql_ransac_line() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    def draw(tag: str) -> str:
        return (f"CAST(('0x' || substr(md5(concat_ws(chr(31), "
                f"'ransac|{tag}', CAST(g AS VARCHAR), "
                f"CAST(c AS VARCHAR))), 1, 15)) AS BIGINT) % n + 1")

    e2 = _RANSAC_EPS * _RANSAC_EPS
    return f"""WITH {FEATURES_ORACLE_SQL},
pts0 AS (
  SELECT feature_id % 3 AS g, feature_id AS id,
         (feature_id * 7919) % 2000 AS x,
         CASE WHEN (feature_id * 31) % 4 = 0
              THEN (feature_id * 104729) % 8000 - 4000
              ELSE (feature_id % 3 + 1) * ((feature_id * 7919) % 2000)
                   + (feature_id * 13) % 60 - 30 END AS y
  FROM features WHERE feature_id % {_RANSAC_QMOD} = 0),
p AS (
  SELECT g, x, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, y, id)
              AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM pts0),
heads AS (
  SELECT gg.g, gg.n, t.c, {draw('a')} AS ra, {draw('b')} AS rb
  FROM (SELECT g, MAX(n) AS n FROM p GROUP BY g) gg,
  LATERAL (SELECT unnest(range({_RANSAC_CAND})) AS c) t),
lines AS (
  SELECT h.g, h.n, h.c, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM heads h
  JOIN p a ON a.g = h.g AND a.rk = h.ra
  JOIN p b ON b.g = h.g AND b.rk = h.rb
  WHERE h.ra <> h.rb AND (a.x <> b.x OR a.y <> b.y)),
scored AS (
  SELECT l.g, l.n, l.c, l.x1, l.y1, l.x2, l.y2,
         CAST(SUM(CASE WHEN
           ((q.x - l.x1) * (l.y2 - l.y1)
            - (q.y - l.y1) * (l.x2 - l.x1))
           * ((q.x - l.x1) * (l.y2 - l.y1)
              - (q.y - l.y1) * (l.x2 - l.x1))
           <= {e2} * ((l.x2 - l.x1) * (l.x2 - l.x1)
                      + (l.y2 - l.y1) * (l.y2 - l.y1))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
  FROM lines l JOIN p q ON q.g = l.g
  GROUP BY 1, 2, 3, 4, 5, 6, 7)
SELECT g, n, c AS cand, x1, y1, x2, y2, n_inliers,
       CAST(n_inliers AS DOUBLE) / CAST(n AS DOUBLE) AS inlier_frac
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
        ORDER BY n_inliers DESC, c) AS rn FROM scored)
WHERE rn = 1"""


GEOM_QUERIES["ransac_line"] = (q_ransac_line, sql_ransac_line)


def q_tile_line_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile clipped polyline length — the road-km-per-tile
    cartographic stat: tile_clip's exact subpixel pieces reduced by
    the trajectory-family discipline (pinned (line, seg)-ordered left
    fold of √(exact int d²)), plus piece/cut counts."""
    from .geo.clip import clip_segments_to_tiles

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RDP_LINES))
    lines = part.select(F.col("p_partkey").alias("line_id"),
                        _wiggly_verts().alias("verts"))
    seg = F.transform(
        F.sequence(F.lit(0), F.lit(_RDP_N - 2)),
        lambda i: F.struct(
            i.cast("long").alias("seg_i"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["x"]
            .alias("x0"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["y"]
            .alias("y0"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["x"]
            .alias("x1"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["y"]
            .alias("y1")))
    segs = (lines.select("line_id", F.explode(seg).alias("s"))
            .select("line_id", "s.*"))
    clipped = clip_segments_to_tiles(segs, _CLIP_TILE, _CLIP_SCALE)
    d2 = ((F.col("qx1") - F.col("qx0")) * (F.col("qx1") - F.col("qx0"))
          + (F.col("qy1") - F.col("qy0"))
          * (F.col("qy1") - F.col("qy0")))
    arr = F.sort_array(F.collect_list(F.struct(
        "line_id", "seg_i",
        F.sqrt(d2.cast("double")).alias("s"))))
    per = (clipped.groupBy("tx", "ty")
           .agg(F.count(F.lit(1)).alias("n_pieces"),
                F.sum((F.col("cut_in") | F.col("cut_out")).cast("int"))
                .alias("n_cut"),
                arr.alias("_a")))
    return per.select(
        "tx", "ty", "n_pieces", F.col("n_cut").cast("long").alias("n_cut"),
        F.aggregate(F.col("_a"), F.lit(0.0),
                    lambda a, s: a + s["s"]).alias("len_subpx"))


def sql_tile_line_length() -> str:
    base = sql_tile_clip()
    return f"""WITH clipped AS ({base})
SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_pieces,
       CAST(SUM(CASE WHEN cut_in OR cut_out THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cut,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(sqrt(CAST((qx1 - qx0) * (qx1 - qx0)
                        + (qy1 - qy0) * (qy1 - qy0) AS DOUBLE))
              ORDER BY line_id, seg_i)),
         (a, q) -> a + q) AS len_subpx
FROM clipped GROUP BY 1, 2"""


GEOM_QUERIES["tile_line_length"] = (q_tile_line_length,
                                    sql_tile_line_length)


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of the k_anonymity release
    (operators/privacy.py t_closeness_audit): per published cell the
    exact cross-multiplied W₁ distance between its ordinal sensitive
    distribution and the corpus — the skew leak l-diversity misses;
    privacy triad complete."""
    from .geo.geohash import geohash
    from .operators.privacy import t_closeness_audit
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        F.col("feature_id").alias("id"),
        geohash(F.col("lon"), F.col("lat"), _KANON_PREC).alias("gh"),
        F.pmod(F.col("feature_id"), F.lit(6)).alias("s"))
    return t_closeness_audit(feats, _KANON_K, _KANON_PREC)


def sql_t_closeness() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    base = sql_k_anonymity()
    return f"""WITH gen AS ({base}),
sens AS (
  SELECT feature_id AS id, feature_id % 6 AS s
  FROM (WITH {FEATURES_ORACLE_SQL} SELECT feature_id FROM features)),
j AS (
  SELECT g.prec, g.cell, s.s
  FROM gen g JOIN sens s ON s.id = g.id),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM j),
kc AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS kcats FROM j),
cellcat AS (
  SELECT prec, cell, s, CAST(COUNT(*) AS BIGINT) AS c
  FROM j GROUP BY 1, 2, 3),
cells AS (
  SELECT prec, cell, SUM(c) AS n FROM cellcat GROUP BY 1, 2),
cats AS (SELECT DISTINCT s FROM j),
grid AS (
  SELECT ce.prec, ce.cell, ce.n, ca.s, coalesce(cc.c, 0) AS c
  FROM cells ce CROSS JOIN cats ca
  LEFT JOIN cellcat cc
    ON cc.prec = ce.prec
   AND (cc.cell = ce.cell OR (cc.cell IS NULL AND ce.cell IS NULL))
   AND cc.s = ca.s),
gfreq AS (
  SELECT s, SUM(CAST(cnt AS BIGINT)) OVER (ORDER BY s) AS gc
  FROM (SELECT s, COUNT(*) AS cnt FROM j GROUP BY s)),
terms AS (
  SELECT g.prec, g.cell, g.n,
         SUM(g.c) OVER (PARTITION BY g.prec, g.cell
                        ORDER BY g.s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cc,
         gl.gc
  FROM grid g JOIN gfreq gl ON gl.s = g.s)
SELECT t.prec, t.cell, t.n,
       CAST(SUM(abs(t.cc * tot.big_n - t.gc * t.n)) AS DOUBLE)
         / CAST(t.n * tot.big_n
                * greatest(kc.kcats - 1, 1) AS DOUBLE) AS t_w1,
       CAST(MAX(abs(t.cc * tot.big_n - t.gc * t.n)) AS DOUBLE)
         / CAST(t.n * tot.big_n AS DOUBLE) AS worst_cat_gap
FROM terms t, tot, kc
GROUP BY t.prec, t.cell, t.n, tot.big_n, kc.kcats"""


GEOM_QUERIES["t_closeness"] = (q_t_closeness, sql_t_closeness)


_DP_EPS = 0.5
_DP_ZMAX = 16
_DP_SALT = "dp-hist-v1"
_DP_PREC = 4


def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP histogram release of the feature scatter
    (operators/privacy.py dp_histogram): per-geohash-cell counts +
    deterministic discrete-Laplace noise (ε=0.5) drawn by inverting
    the quantized DL CDF at the cell's md5-u60 coordinate — the
    replay-stable seeded-noise release; exact-integer ladder, so the
    whole release value-hashes."""
    from .geo.geohash import geohash
    from .operators.privacy import dp_histogram
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        geohash(F.col("lon"), F.col("lat"), _DP_PREC).alias("cell"))
    return dp_histogram(feats, ["cell"], epsilon=_DP_EPS,
                        salt=_DP_SALT, z_max=_DP_ZMAX)


def sql_dp_histogram() -> str:
    from .geo.geohash import sql_geohash_select
    from .operators.privacy import _dlap_thresholds
    from .sources.features import FEATURES_ORACLE_SQL

    src = (f"WITH {FEATURES_ORACLE_SQL} "
           "SELECT feature_id, lon, lat FROM features")
    inner = sql_geohash_select(src, ["feature_id"], "lon", "lat",
                               precision=_DP_PREC, out="cell")
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), "
         f"'{_DP_SALT}', cell)), 1, 15)) AS BIGINT)")
    ladder = " + ".join(
        f"(CASE WHEN u60 >= {t} THEN 1 ELSE 0 END)"
        for t in _dlap_thresholds(_DP_EPS, _DP_ZMAX))
    return f"""WITH pts AS ({inner}),
cnt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n
        FROM pts GROUP BY 1),
uu AS (SELECT cell, n, {u} AS u60 FROM cnt)
SELECT cell,
       greatest(n + ({ladder}) - {_DP_ZMAX}, 0) AS n_noisy
FROM uu"""


GEOM_QUERIES["dp_histogram"] = (q_dp_histogram, sql_dp_histogram)


_TOUR_VEH = 40
_TOUR_CAP = 24


def _tour_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared capped stop set for the route gates — ONE definition of
    the vehicle split + hashed coordinates (the SQL twin is
    _sql_tour_ctes' stops0/capd)."""
    from .operators.splits import cap_per_group
    from .sources.features import features_from_lineitem

    fid = F.col("feature_id")
    # feature_id repeats across lineitem rows — a stop is visited once
    stops = features_from_lineitem(spark, sf_dir).select(
        F.pmod(fid, F.lit(_TOUR_VEH)).alias("vehicle"),
        "feature_id",
        F.pmod(fid * 7919, F.lit(360000)).alias("x"),
        F.pmod(fid * 104729, F.lit(170000)).alias("y")).distinct()
    return cap_per_group(stops, ["vehicle"], _TOUR_CAP,
                         id_col="feature_id")


def q_route_tour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vehicle route sequencing (operators/routing.py nn_tour):
    the feature scatter split into 40 vehicles, stops deterministically
    capped at 24/vehicle (cap_per_group), then the greedy
    nearest-neighbour tour solved inside each vehicle's row as an
    exact-integer fold — visit order and µ-quantized tour length
    value-hash end to end."""
    from .operators.routing import nn_tour

    t = nn_tour(_tour_stops(spark, sf_dir), ["vehicle"],
                id_col="feature_id", max_stops=_TOUR_CAP)
    return t.select("vehicle", "n_stops",
                    F.array_join(F.col("tour"), ",").alias("tour"),
                    "tour_len_micro")


def _sql_tour_ctes() -> str:
    """Shared oracle CTE chain: capped stop set -> pts list -> greedy
    NN tour indices (tidx).  The argmin is encoded as list_min of
    d2*64+ii (ii < 64 asserted by the cap): a nested list_reduce
    mis-vectorizes at volume in DuckDB, the same bug the jenks_breaks
    oracle works around."""
    assert _TOUR_CAP < 64
    return f"""stops0 AS (
  SELECT DISTINCT feature_id % {_TOUR_VEH} AS vehicle, feature_id,
         (feature_id * 7919) % 360000 AS x,
         (feature_id * 104729) % 170000 AS y
  FROM features),
capd AS (
  SELECT vehicle, feature_id, x, y FROM (
    SELECT vehicle, feature_id, x, y,
           ROW_NUMBER() OVER (PARTITION BY vehicle
             ORDER BY md5(CAST(feature_id AS VARCHAR)), feature_id)
             AS rk
    FROM stops0) WHERE rk <= {_TOUR_CAP}),
per AS (
  SELECT vehicle, CAST(COUNT(*) AS BIGINT) AS n,
         list({{'i': CAST(feature_id AS BIGINT),
               'x': CAST(x AS BIGINT),
               'y': CAST(y AS BIGINT)}} ORDER BY feature_id) AS pts
  FROM capd GROUP BY 1),
tours AS (
  SELECT vehicle, n, pts,
    list_reduce(
      list_prepend(CAST([0] AS BIGINT[]),
                   CASE WHEN n > 1
                        THEN list_transform(
                               range(1, CAST(n AS INTEGER)),
                               s -> CAST([s] AS BIGINT[]))
                        ELSE [] END),
      (acc, st) -> list_append(acc,
        list_min(list_transform(
            list_filter(range(0, CAST(n AS INTEGER)),
                        ii -> NOT list_contains(acc, ii)),
            ii -> (
              (pts[CAST(acc[-1] + 1 AS INTEGER)].x - pts[ii + 1].x)
              * (pts[CAST(acc[-1] + 1 AS INTEGER)].x - pts[ii + 1].x)
              + (pts[CAST(acc[-1] + 1 AS INTEGER)].y - pts[ii + 1].y)
              * (pts[CAST(acc[-1] + 1 AS INTEGER)].y - pts[ii + 1].y)
            ) * 64 + ii)) % 64)
    ) AS tidx
  FROM per)"""


def _sql_tour_str(t: str) -> str:
    return (f"""list_aggregate(list_transform({t},
      j -> CAST(pts[CAST(j + 1 AS INTEGER)].i AS VARCHAR)),
      'string_agg', ',')""")


def _sql_tour_len(t: str) -> str:
    return f"""CASE WHEN n > 1 THEN
    (SELECT CAST(COALESCE(SUM(CAST(floor(sqrt(CAST(
       (pts[CAST({t}[k] + 1 AS INTEGER)].x
        - pts[CAST({t}[k+1] + 1 AS INTEGER)].x)
     * (pts[CAST({t}[k] + 1 AS INTEGER)].x
        - pts[CAST({t}[k+1] + 1 AS INTEGER)].x)
     + (pts[CAST({t}[k] + 1 AS INTEGER)].y
        - pts[CAST({t}[k+1] + 1 AS INTEGER)].y)
     * (pts[CAST({t}[k] + 1 AS INTEGER)].y
        - pts[CAST({t}[k+1] + 1 AS INTEGER)].y)
       AS DOUBLE)) * 1000000.0) AS BIGINT)), 0) AS BIGINT)
     FROM unnest(range(1, CAST(n AS INTEGER))) t(k))
  ELSE 0 END"""


def sql_route_tour() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    return f"""WITH {FEATURES_ORACLE_SQL},
{_sql_tour_ctes()}
SELECT vehicle, n AS n_stops,
  {_sql_tour_str('tidx')} AS tour,
  {_sql_tour_len('tidx')} AS tour_len_micro
FROM tours"""


GEOM_QUERIES["route_tour"] = (q_route_tour, sql_route_tour)


_TOUR_ROUNDS = 6


def q_route_2opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-opt route improvement (operators/routing.py two_opt): the
    greedy NN tours refined by 6 best-improvement segment reversals
    per vehicle, all inside one in-row fold — exact integer gains, so
    visit order and both lengths (construction vs improved)
    value-hash; improved ≤ construction by design."""
    from .operators.routing import two_opt

    t = two_opt(_tour_stops(spark, sf_dir), ["vehicle"],
                id_col="feature_id", max_stops=_TOUR_CAP,
                rounds=_TOUR_ROUNDS)
    return t.select("vehicle", "n_stops",
                    F.array_join(F.col("tour"), ",").alias("tour"),
                    "nn_len_micro", "tour_len_micro")


def _sql_2opt_qd(pa: str, pb: str) -> str:
    a = f"CAST(tidx[CAST(({pa}) + 1 AS INTEGER)] + 1 AS INTEGER)"
    b = f"CAST(tidx[CAST(({pb}) + 1 AS INTEGER)] + 1 AS INTEGER)"
    return (f"""CAST(floor(sqrt(CAST(
      (pts[{a}].x - pts[{b}].x) * (pts[{a}].x - pts[{b}].x)
      + (pts[{a}].y - pts[{b}].y) * (pts[{a}].y - pts[{b}].y)
      AS DOUBLE)) * 1000000.0) AS BIGINT)""")


def sql_route_2opt() -> str:
    from .sources.features import FEATURES_ORACLE_SQL

    i, j = "(k // n)", "(k % n)"
    delta = (f"{_sql_2opt_qd(i + ' - 1', j)} - "
             f"{_sql_2opt_qd(i + ' - 1', i)} + "
             f"CASE WHEN {j} < n - 1 THEN "
             f"{_sql_2opt_qd(i, j + ' + 1')} - "
             f"{_sql_2opt_qd(j, j + ' + 1')} ELSE 0 END")
    rounds = []
    for r in range(1, _TOUR_ROUNDS + 1):
        rounds.append(f"""e{r} AS MATERIALIZED (
  SELECT vehicle, n, pts, nn_len, tidx,
    list_min(list_transform(
      list_filter(range(0, CAST(n * n AS INTEGER)),
                  k -> k // n >= 1 AND k // n < k % n),
      k -> ({delta}) * (n * n) + k)) AS enc
  FROM r{r - 1}),
r{r} AS MATERIALIZED (
  SELECT vehicle, n, pts, nn_len,
    CASE WHEN enc IS NOT NULL AND enc < 0 THEN
      list_concat(list_concat(
        list_slice(tidx, 1, CAST(kb // n AS INTEGER)),
        list_reverse(list_slice(tidx, CAST(kb // n AS INTEGER) + 1,
                                CAST(kb % n AS INTEGER) + 1))),
        CASE WHEN kb % n < n - 1
             THEN list_slice(tidx, CAST(kb % n AS INTEGER) + 2,
                             CAST(n AS INTEGER))
             ELSE CAST([] AS BIGINT[]) END)
    ELSE tidx END AS tidx
  FROM (SELECT *, ((enc % (n * n)) + (n * n)) % (n * n) AS kb
        FROM e{r}))""")
    chain = ",\n".join(rounds)
    return f"""WITH {FEATURES_ORACLE_SQL},
{_sql_tour_ctes()},
r0 AS MATERIALIZED (
  SELECT vehicle, n, pts, tidx,
         {_sql_tour_len('tidx')} AS nn_len
  FROM tours),
{chain}
SELECT vehicle, n AS n_stops,
  {_sql_tour_str('tidx')} AS tour,
  nn_len AS nn_len_micro,
  {_sql_tour_len('tidx')} AS tour_len_micro
FROM r{_TOUR_ROUNDS}"""


GEOM_QUERIES["route_2opt"] = (q_route_2opt, sql_route_2opt)


_RR_SALT = "rr-v1"
_RR_PREC = 1


def q_rr_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP sensitive-rate estimation per geohash cell
    (operators/privacy.py randomized_response, Warner p=3/4): each
    feature's private bit flips on its deterministic md5-u60 coin and
    only flipped bits aggregate; the per-cell debiased rate is one
    exact rational (4·yes − n)/(2n)."""
    from .geo.geohash import geohash
    from .operators.privacy import randomized_response
    from .sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, sf_dir).select(
        "feature_id",
        geohash(F.col("lon"), F.col("lat"), _RR_PREC).alias("cell"),
        (F.pmod(F.col("feature_id"), F.lit(6)) == 0).alias("s"))
    return randomized_response(feats, ["cell"], bit_col="s",
                               id_col="feature_id", salt=_RR_SALT)


def sql_rr_estimate() -> str:
    from .geo.geohash import sql_geohash_select
    from .sources.features import FEATURES_ORACLE_SQL

    thr = (3 * (1 << 60)) // 4
    src = (f"WITH {FEATURES_ORACLE_SQL} "
           "SELECT feature_id, lon, lat FROM features")
    inner = sql_geohash_select(src, ["feature_id"], "lon", "lat",
                               precision=_RR_PREC, out="cell")
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), "
         f"'{_RR_SALT}', CAST(feature_id AS VARCHAR))), 1, 15)) "
         "AS BIGINT)")
    return f"""WITH pts AS ({inner}),
rr AS (
  SELECT cell,
         CASE WHEN {u} < {thr}
              THEN feature_id % 6 = 0
              ELSE NOT (feature_id % 6 = 0) END AS r
  FROM pts),
agg AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_yes
  FROM rr GROUP BY 1)
SELECT cell, n, n_yes,
       CAST(4 * n_yes - n AS DOUBLE) / CAST(2 * n AS DOUBLE) AS pi_hat
FROM agg"""


GEOM_QUERIES["rr_estimate"] = (q_rr_estimate, sql_rr_estimate)


_CONVOY_MIN_RUN = 3


def q_convoy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise convoy detection (operators/trajectory.py
    convoy_pairs): walk entities sharing a (500-unit cell x day)
    space-time cell on >= 3 CONSECUTIVE days — sustained co-movement,
    not colocation_pairs' repeated chance encounters; gaps-and-islands
    over the co-visit days, exact integers end-to-end."""
    from .operators.trajectory import convoy_pairs, random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return convoy_pairs(pos, cell=_COLOC_CELL,
                        bucket_s=_COLOC_BUCKET_S,
                        min_run=_CONVOY_MIN_RUN)


def sql_convoy_pairs() -> str:
    c = _COLOC_CELL
    b_us = _COLOC_BUCKET_S * 1_000_000
    return f"""WITH {_sql_walk_pos()},
viz AS (
  SELECT DISTINCT user_id,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy,
         epoch_us(ts) // {b_us} AS tb
  FROM pos),
cob AS (
  SELECT DISTINCT a.user_id AS user_a, b.user_id AS user_b, a.tb
  FROM viz a JOIN viz b
    ON a.cx = b.cx AND a.cy = b.cy AND a.tb = b.tb
   AND a.user_id < b.user_id),
isl AS (
  SELECT user_a, user_b, tb,
         tb - ROW_NUMBER() OVER (PARTITION BY user_a, user_b
                                 ORDER BY tb) AS g
  FROM cob),
runs AS (
  SELECT user_a, user_b, g, CAST(COUNT(*) AS BIGINT) AS run
  FROM isl GROUP BY 1, 2, 3)
SELECT user_a, user_b,
       CAST(SUM(run) AS BIGINT) AS n_buckets,
       CAST(MAX(run) AS BIGINT) AS max_run
FROM runs GROUP BY 1, 2
HAVING MAX(run) >= {_CONVOY_MIN_RUN}"""


GEOM_QUERIES["convoy_pairs"] = (q_convoy_pairs, sql_convoy_pairs)


_STR_CAP = 256


def q_str_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR R-tree bulk-load packing of the feature scatter
    (operators/zonemap.py str_pack): x-strips then y-leaves by exact
    NTILE with id tiebreak, 256 points per leaf — per-leaf occupancy
    and MBRs value-hash; the page layout the bbox scan family prunes
    against."""
    from .operators.zonemap import str_pack
    from .sources.features import features_from_lineitem

    fid = F.col("feature_id")
    pts = features_from_lineitem(spark, sf_dir).select(
        "feature_id",
        F.pmod(fid * 7919, F.lit(360000)).alias("x"),
        F.pmod(fid * 104729, F.lit(170000)).alias("y"))
    return str_pack(pts, id_col="feature_id", x_col="x", y_col="y",
                    leaf_cap=_STR_CAP)


def sql_str_pack() -> str:
    import math

    from .sources.features import FEATURES_ORACLE_SQL

    # the strip/leaf counts are control scalars derived from n; the
    # oracle computes them inline from the same count
    return f"""WITH {FEATURES_ORACLE_SQL},
pts AS (
  SELECT feature_id AS id,
         (feature_id * 7919) % 360000 AS x,
         (feature_id * 104729) % 170000 AS y
  FROM features),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
dims AS (
  SELECT n,
         CAST(ceil(sqrt(ceil(n / {_STR_CAP}.0))) AS BIGINT) AS s,
         CAST(ceil(ceil(n / {_STR_CAP}.0)
                   / ceil(sqrt(ceil(n / {_STR_CAP}.0)))) AS BIGINT)
           AS per_strip
  FROM nn),
striped AS (
  SELECT id, x, y,
         NTILE((SELECT CAST(s AS INTEGER) FROM dims))
           OVER (ORDER BY x, id) AS strip
  FROM pts),
leaved AS (
  SELECT strip, x, y,
         NTILE((SELECT CAST(per_strip AS INTEGER) FROM dims))
           OVER (PARTITION BY strip ORDER BY y, id) AS leaf
  FROM striped)
SELECT strip, leaf, CAST(COUNT(*) AS BIGINT) AS n_pts,
       MIN(x) AS xmin, MAX(x) AS xmax,
       MIN(y) AS ymin, MAX(y) AS ymax
FROM leaved GROUP BY 1, 2"""


GEOM_QUERIES["str_pack"] = (q_str_pack, sql_str_pack)


_VM_T = 12        # pings per trajectory
_VM_K = 3         # candidates per ping
_VM_PINGS = 720   # part rows consumed -> 60 trajectories


def q_viterbi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi map-matching over the road-segment field
    (operators/trajectory.py viterbi_match): 12-ping trajectories
    jittered around per-trajectory anchors, top-3 exact-integer
    candidates per ping, and the min-cost segment SEQUENCE
    (emission d² + squared matched-position displacement) — the
    sequence decoder that beats pointwise snapping on noisy GPS."""
    from .geo.tilemath import floor_div
    from .operators.trajectory import viterbi_match

    pk = F.col("p_partkey")
    v = floor_div(pk - 1, _VM_T)
    # p_partkey = 0 exists: pk-1 = -1 splits engines on %/floor-div
    pings = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .filter((pk >= 1) & (pk <= _VM_PINGS))
             .select(
                 v.alias("traj"),
                 F.pmod(pk - 1, F.lit(_VM_T)).alias("step"),
                 (2000 + F.pmod(v * 7919 + 1234, F.lit(58000))
                  + F.pmod(pk * 31, F.lit(2001)) - 1000).alias("x"),
                 (2000 + F.pmod(v * 104729 + 4321, F.lit(58000))
                  + F.pmod(pk * 57, F.lit(2001)) - 1000).alias("y")))
    return viterbi_match(pings, _segs_df(spark, sf_dir), _MM_RADIUS,
                         _SEG_CELL, steps=_VM_T, k=_VM_K)


def sql_viterbi_match() -> str:
    r2 = _MM_RADIUS * _MM_RADIUS
    l2 = "((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))"
    tnum = "((p.x-s.x1)*(s.x2-s.x1) + (p.y-s.y1)*(s.y2-s.y1))"
    cross = "((s.x2-s.x1)*(p.y-s.y1) - (s.y2-s.y1)*(p.x-s.x1))"
    e = f"""CASE WHEN {l2} = 0 OR {tnum} <= 0
         THEN (p.x-s.x1)*(p.x-s.x1) + (p.y-s.y1)*(p.y-s.y1)
       WHEN {tnum} >= {l2}
         THEN (p.x-s.x2)*(p.x-s.x2) + (p.y-s.y2)*(p.y-s.y2)
       ELSE ({cross} * {cross}) // {l2} END"""
    qx = f"""CASE WHEN {l2} = 0 OR {tnum} <= 0 THEN s.x1
       WHEN {tnum} >= {l2} THEN s.x2
       ELSE (2*(s.x1*{l2} + {tnum}*(s.x2-s.x1)) + {l2})
            // (2*{l2}) END"""
    qy = f"""CASE WHEN {l2} = 0 OR {tnum} <= 0 THEN s.y1
       WHEN {tnum} >= {l2} THEN s.y2
       ELSE (2*(s.y1*{l2} + {tnum}*(s.y2-s.y1)) + {l2})
            // (2*{l2}) END"""
    rounds = []
    for r in range(1, _VM_T):
        tr = ("(c.qx-p.qx)*(c.qx-p.qx) + (c.qy-p.qy)*(c.qy-p.qy)")
        rounds.append(f"""v{r} AS MATERIALIZED (
  SELECT traj, j, cost, path, qx, qy FROM (
    SELECT p.traj, c.j,
           p.cost + {tr} + c.e AS cost,
           p.path || ',' || CAST(c.sid AS VARCHAR) AS path,
           c.qx, c.qy,
           ROW_NUMBER() OVER (PARTITION BY p.traj, c.j
             ORDER BY p.cost + {tr} + c.e,
                      p.path || ',' || CAST(c.sid AS VARCHAR)) AS rn
    FROM v{r - 1} p JOIN cand c
      ON c.traj = p.traj AND c.step = {r})
  WHERE rn = 1)""")
    chain = ",\n".join(rounds)
    return f"""WITH {_SEGS_SQL},
pings AS (
  SELECT (p_partkey-1) // {_VM_T} AS traj,
         (p_partkey-1) % {_VM_T} AS step,
         2000 + (((p_partkey-1) // {_VM_T}) * 7919 + 1234) % 58000
              + (p_partkey*31) % 2001 - 1000 AS x,
         2000 + (((p_partkey-1) // {_VM_T}) * 104729 + 4321) % 58000
              + (p_partkey*57) % 2001 - 1000 AS y
  FROM part WHERE p_partkey BETWEEN 1 AND {_VM_PINGS}),
cand0 AS (
  -- brute theta join: the oracle proves the engine's cell-join
  -- candidate set lost nothing
  SELECT p.traj, p.step, s.sid,
         {e} AS e, {qx} AS qx, {qy} AS qy
  FROM pings p, segs0 s),
cand AS MATERIALIZED (
  SELECT traj, step,
         ROW_NUMBER() OVER (PARTITION BY traj, step
                            ORDER BY e, sid) - 1 AS j,
         sid, e, qx, qy
  FROM cand0 WHERE e <= {r2}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY traj, step
                             ORDER BY e, sid) <= {_VM_K}),
complete AS (
  SELECT traj FROM (SELECT DISTINCT traj, step FROM cand)
  GROUP BY traj HAVING COUNT(*) = {_VM_T}),
v0 AS MATERIALIZED (
  SELECT c.traj, c.j, c.e AS cost, CAST(c.sid AS VARCHAR) AS path,
         c.qx, c.qy
  FROM cand c JOIN complete USING (traj) WHERE c.step = 0),
{chain}
SELECT traj, cost AS total_cost, path FROM (
  SELECT traj, cost, path,
         ROW_NUMBER() OVER (PARTITION BY traj
                            ORDER BY cost, path) AS rn
  FROM v{_VM_T - 1}) WHERE rn = 1"""


GEOM_QUERIES["viterbi_match"] = (q_viterbi_match, sql_viterbi_match)


_VW_THRESH2 = 200_000
_VW_MAXPTS = 24
_VW_ROUNDS = 12


def q_vw_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visvalingam-Whyatt simplification of per-user walk polylines
    (geo/simplify.py visvalingam): up to 12 smallest-effective-area
    interior vertices removed below the area threshold, recomputed
    after each removal — surviving vertex sequence and exact removed
    area sum value-hash; both stopping rules (threshold and round
    budget) bind at this threshold."""
    from pyspark.sql import Window as W

    from .geo.simplify import visvalingam
    from .operators.trajectory import random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pts = (pos.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= _VW_MAXPTS)
           .select("user_id", F.col("rn").alias("o"), "x", "y"))
    return visvalingam(pts, ["user_id"], thresh2=_VW_THRESH2,
                       max_remove=_VW_ROUNDS, max_pts=_VW_MAXPTS)


def sql_vw_simplify() -> str:
    K = _VW_MAXPTS
    a2 = """abs(
      (pts[CAST(k[p + 1] + 1 AS INTEGER)].x
       - pts[CAST(k[p] + 1 AS INTEGER)].x)
      * (pts[CAST(k[p + 2] + 1 AS INTEGER)].y
         - pts[CAST(k[p] + 1 AS INTEGER)].y)
      - (pts[CAST(k[p + 1] + 1 AS INTEGER)].y
         - pts[CAST(k[p] + 1 AS INTEGER)].y)
      * (pts[CAST(k[p + 2] + 1 AS INTEGER)].x
         - pts[CAST(k[p] + 1 AS INTEGER)].x))"""
    rounds = []
    for r in range(1, _VW_ROUNDS + 1):
        rounds.append(f"""e{r} AS MATERIALIZED (
  SELECT user_id, pts, n_in, k, s,
    CASE WHEN len(k) > 2 THEN
      list_min(list_transform(range(1, CAST(len(k) - 1 AS INTEGER)),
        p -> {a2} * {K} + p)) END AS enc
  FROM v{r - 1}),
v{r} AS MATERIALIZED (
  SELECT user_id, pts, n_in,
    CASE WHEN enc IS NOT NULL AND (enc - enc % {K}) // {K}
              < {_VW_THRESH2}
      THEN list_concat(
             list_slice(k, 1, CAST(enc % {K} AS INTEGER)),
             list_slice(k, CAST(enc % {K} AS INTEGER) + 2, len(k)))
      ELSE k END AS k,
    CASE WHEN enc IS NOT NULL AND (enc - enc % {K}) // {K}
              < {_VW_THRESH2}
      THEN s + (enc - enc % {K}) // {K} ELSE s END AS s
  FROM e{r})""")
    chain = ",\n".join(rounds)
    return f"""WITH {_sql_walk_pos()},
lim AS (
  SELECT user_id, rn AS o, x, y FROM (
    SELECT user_id, x, y,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM pos) WHERE rn <= {K}),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_in,
         list({{'o': CAST(o AS BIGINT), 'x': CAST(x AS BIGINT),
               'y': CAST(y AS BIGINT)}} ORDER BY o) AS pts
  FROM lim GROUP BY 1),
v0 AS MATERIALIZED (
  SELECT user_id, pts, n_in,
         list_transform(range(0, CAST(n_in AS INTEGER)),
                        i -> CAST(i AS BIGINT)) AS k,
         CAST(0 AS BIGINT) AS s
  FROM per),
{chain}
SELECT user_id, n_in, CAST(len(k) AS BIGINT) AS n_kept,
  list_aggregate(list_transform(k,
      i -> CAST(pts[CAST(i + 1 AS INTEGER)].o AS VARCHAR)),
      'string_agg', ',') AS kept,
  s AS removed_area2
FROM v{_VW_ROUNDS}"""


GEOM_QUERIES["vw_simplify"] = (q_vw_simplify, sql_vw_simplify)


_KRIG_RADIUS = 2000
_KRIG_NQ = 64


def q_kriging_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary kriging of the feature scatter's hashed field at 64
    probe points (operators/kriging.py kriging_ok): 3-NN stencil from
    the cell join, linear-variogram bordered system solved by exact
    int64 Cramer determinants, prediction as the pinned λ·z fold —
    the geostat interpolator beside shepard_idw."""
    from .operators.kriging import kriging_ok
    from .sources.features import features_from_lineitem

    fid = F.col("feature_id")
    corpus = features_from_lineitem(spark, sf_dir).select(
        "feature_id",
        F.pmod(fid * 7919, F.lit(360000)).alias("x"),
        F.pmod(fid * 104729, F.lit(170000)).alias("y"),
        F.pmod(fid, F.lit(1000)).alias("z")).distinct()
    pk = F.col("p_partkey")
    queries = (spark.read.parquet(f"{sf_dir}/part.parquet")
               .filter((pk >= 1) & (pk <= _KRIG_NQ))
               .select(pk.alias("query_id"),
                       F.pmod(pk * 6151, F.lit(360000)).alias("x"),
                       F.pmod(pk * 9433, F.lit(170000)).alias("y")))
    return kriging_ok(queries, corpus, _KRIG_RADIUS,
                      query_id="query_id", corpus_id="feature_id")


def _sql_det4(m) -> str:
    from .operators.kriging import det4_terms
    parts = []
    for sign, entries in det4_terms(m):
        term = " * ".join(f"({e})" for e in entries) if entries else "1"
        parts.append(("+ " if sign > 0 else "- ") + term)
    out = " ".join(parts)
    return "(" + (out[2:] if out.startswith("+ ") else out) + ")"


def sql_kriging_ok() -> str:
    from .operators.kriging import ONE
    from .sources.features import FEATURES_ORACLE_SQL

    def at(i, j):
        if i == 3 and j == 3:
            return None
        if i == 3 or j == 3:
            return ONE
        if i == j:
            return None
        return f"g{min(i, j) + 1}{max(i, j) + 1}"

    A = [[at(i, j) for j in range(4)] for i in range(4)]
    det = _sql_det4(A)
    dets = []
    for col in range(3):
        b = ["gq1", "gq2", "gq3", ONE]
        Ai = [[b[i] if j == col else A[i][j] for j in range(4)]
              for i in range(4)]
        dets.append(_sql_det4(Ai))
    gd = ("CAST(floor(sqrt(CAST((x{a}-x{b})*(x{a}-x{b})"
          "+(y{a}-y{b})*(y{a}-y{b}) AS DOUBLE))) AS BIGINT)")
    return f"""WITH {FEATURES_ORACLE_SQL},
corpus AS (
  SELECT DISTINCT feature_id AS cid,
         (feature_id * 7919) % 360000 AS x,
         (feature_id * 104729) % 170000 AS y,
         feature_id % 1000 AS z
  FROM features),
qs AS (
  SELECT p_partkey AS qid,
         (p_partkey * 6151) % 360000 AS qx,
         (p_partkey * 9433) % 170000 AS qy
  FROM part WHERE p_partkey BETWEEN 1 AND {_KRIG_NQ}),
nn AS (
  -- brute theta join: proves the engine's cell candidates complete
  SELECT qid, cid, x, y, z, d2, rnk FROM (
    SELECT q.qid, c.cid, c.x, c.y, c.z,
           (q.qx-c.x)*(q.qx-c.x)+(q.qy-c.y)*(q.qy-c.y) AS d2,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY (q.qx-c.x)*(q.qx-c.x)+(q.qy-c.y)*(q.qy-c.y),
                      c.cid) AS rnk
    FROM qs q JOIN corpus c
      ON (q.qx-c.x)*(q.qx-c.x)+(q.qy-c.y)*(q.qy-c.y)
         <= {_KRIG_RADIUS * _KRIG_RADIUS})
  WHERE rnk <= 3),
wide AS (
  SELECT qid,
         MAX(CASE WHEN rnk=1 THEN x END) AS x1,
         MAX(CASE WHEN rnk=1 THEN y END) AS y1,
         MAX(CASE WHEN rnk=1 THEN z END) AS z1,
         MAX(CASE WHEN rnk=1 THEN d2 END) AS d2_1,
         MAX(CASE WHEN rnk=2 THEN x END) AS x2,
         MAX(CASE WHEN rnk=2 THEN y END) AS y2,
         MAX(CASE WHEN rnk=2 THEN z END) AS z2,
         MAX(CASE WHEN rnk=2 THEN d2 END) AS d2_2,
         MAX(CASE WHEN rnk=3 THEN x END) AS x3,
         MAX(CASE WHEN rnk=3 THEN y END) AS y3,
         MAX(CASE WHEN rnk=3 THEN z END) AS z3,
         MAX(CASE WHEN rnk=3 THEN d2 END) AS d2_3
  FROM nn GROUP BY 1
  HAVING COUNT(*) = 3),
gs AS (
  SELECT qid, z1, z2, z3, d2_1,
         {gd.format(a=1, b=2)} AS g12,
         {gd.format(a=1, b=3)} AS g13,
         {gd.format(a=2, b=3)} AS g23,
         CAST(floor(sqrt(CAST(d2_1 AS DOUBLE))) AS BIGINT) AS gq1,
         CAST(floor(sqrt(CAST(d2_2 AS DOUBLE))) AS BIGINT) AS gq2,
         CAST(floor(sqrt(CAST(d2_3 AS DOUBLE))) AS BIGINT) AS gq3
  FROM wide),
solved AS (
  SELECT qid, z1, z2, z3, d2_1,
         {det} AS det,
         {dets[0]} AS det1, {dets[1]} AS det2, {dets[2]} AS det3
  FROM gs)
SELECT qid AS query_id,
       CASE WHEN d2_1 = 0 THEN NULL ELSE det END AS det,
       CASE WHEN d2_1 = 0 THEN CAST(z1 AS DOUBLE)
            WHEN det <> 0 THEN
              ((CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE))
                 * CAST(z1 AS DOUBLE)
               + (CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE))
                 * CAST(z2 AS DOUBLE))
              + (CAST(det3 AS DOUBLE) / CAST(det AS DOUBLE))
                * CAST(z3 AS DOUBLE)
       END AS pred
FROM solved"""


GEOM_QUERIES["kriging_ok"] = (q_kriging_ok, sql_kriging_ok)


_HW_CELL = 2000


def q_home_work(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Home/work anchor inference over the deterministic walk
    (operators/trajectory.py home_work_infer): per user the modal
    night-window and day-window 2000-unit cells with exact dominance
    shares — the mobility-mining anchor primitive."""
    from .operators.trajectory import home_work_infer, \
        random_walk_positions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pos = random_walk_positions(ev, jump=_TRAJ_JUMP)
    return home_work_infer(pos, _HW_CELL)


def sql_home_work() -> str:
    c = _HW_CELL

    def anchor(cond: str, tag: str) -> str:
        return f"""{tag}_per AS (
  SELECT user_id AS entity,
         CAST(floor(x / {c}.0) AS BIGINT) AS cx,
         CAST(floor(y / {c}.0) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM hb WHERE {cond} GROUP BY 1, 2, 3),
{tag}_tot AS (
  SELECT entity, CAST(SUM(n) AS BIGINT) AS tot
  FROM {tag}_per GROUP BY 1),
{tag}_best AS (
  SELECT entity, cx, cy, n FROM (
    SELECT entity, cx, cy, n,
           ROW_NUMBER() OVER (PARTITION BY entity
                              ORDER BY n DESC, cx, cy) AS rn
    FROM {tag}_per) WHERE rn = 1)"""

    return f"""WITH {_sql_walk_pos()},
hb AS (
  SELECT user_id, x, y,
         (epoch_us(ts) // 3600000000) % 24 AS h
  FROM pos),
{anchor("h >= 22 OR h < 6", "home")},
{anchor("h >= 9 AND h < 17", "work")}
SELECT e.entity,
       hb2.cx AS home_cx, hb2.cy AS home_cy, hb2.n AS home_n,
       ht.tot AS home_total,
       CAST(hb2.n AS DOUBLE) / CAST(ht.tot AS DOUBLE) AS home_share,
       wb.cx AS work_cx, wb.cy AS work_cy, wb.n AS work_n,
       wt.tot AS work_total,
       CAST(wb.n AS DOUBLE) / CAST(wt.tot AS DOUBLE) AS work_share
FROM (SELECT DISTINCT user_id AS entity FROM hb) e
LEFT JOIN home_best hb2 ON hb2.entity = e.entity
LEFT JOIN home_tot ht ON ht.entity = e.entity
LEFT JOIN work_best wb ON wb.entity = e.entity
LEFT JOIN work_tot wt ON wt.entity = e.entity"""


GEOM_QUERIES["home_work"] = (q_home_work, sql_home_work)


def q_clip_seam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seam-consistency audit of the tile_clip pieces (geo/clip.py
    clip_seam_audit): every boundary exit point reappears bit-identical
    as the adjacent tile's entry — the no-cracks invariant of the
    clip arithmetic, per line; seam_ok must read true everywhere."""
    from .geo.clip import clip_seam_audit, clip_segments_to_tiles

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RDP_LINES))
    lines = part.select(F.col("p_partkey").alias("line_id"),
                        _wiggly_verts().alias("verts"))
    seg = F.transform(
        F.sequence(F.lit(0), F.lit(_RDP_N - 2)),
        lambda i: F.struct(
            i.cast("long").alias("seg_i"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["x"]
            .alias("x0"),
            F.element_at(F.col("verts"), (i + 1).cast("int"))["y"]
            .alias("y0"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["x"]
            .alias("x1"),
            F.element_at(F.col("verts"), (i + 2).cast("int"))["y"]
            .alias("y1")))
    segs = (lines.select("line_id", F.explode(seg).alias("s"))
            .select("line_id", "s.*"))
    # materialize once: the audit reads the pieces four ways, and
    # re-expanding the clip arithmetic per consumer also overruns the
    # codegen method limit
    clipped = clip_segments_to_tiles(segs, _CLIP_TILE,
                                     _CLIP_SCALE).localCheckpoint()
    return clip_seam_audit(clipped)


def sql_clip_seam() -> str:
    base = sql_tile_clip()
    return f"""WITH clipped AS ({base}),
outs AS (SELECT line_id, seg_i, qx1 AS px, qy1 AS py
         FROM clipped WHERE cut_out),
ins AS (SELECT line_id, seg_i, qx0 AS px, qy0 AS py
        FROM clipped WHERE cut_in),
om AS (
  SELECT o.line_id, CAST(COUNT(*) AS BIGINT) AS n_out_matched
  FROM outs o
  WHERE EXISTS (SELECT 1 FROM ins i
                WHERE i.line_id = o.line_id AND i.seg_i = o.seg_i
                  AND i.px = o.px AND i.py = o.py)
  GROUP BY 1),
im AS (
  SELECT i.line_id, CAST(COUNT(*) AS BIGINT) AS n_in_matched
  FROM ins i
  WHERE EXISTS (SELECT 1 FROM outs o
                WHERE o.line_id = i.line_id AND o.seg_i = i.seg_i
                  AND o.px = i.px AND o.py = i.py)
  GROUP BY 1),
per AS (
  SELECT line_id, CAST(COUNT(*) AS BIGINT) AS n_pieces,
         CAST(SUM(CASE WHEN cut_out THEN 1 ELSE 0 END) AS BIGINT)
           AS n_out,
         CAST(SUM(CASE WHEN cut_in THEN 1 ELSE 0 END) AS BIGINT)
           AS n_in
  FROM clipped GROUP BY 1)
SELECT per.line_id, per.n_pieces, per.n_out, per.n_in,
       COALESCE(om.n_out_matched, 0) AS n_out_matched,
       COALESCE(im.n_in_matched, 0) AS n_in_matched,
       COALESCE(om.n_out_matched, 0) = per.n_out
       AND COALESCE(im.n_in_matched, 0) = per.n_in AS seam_ok
FROM per
LEFT JOIN om USING (line_id)
LEFT JOIN im USING (line_id)"""


GEOM_QUERIES["clip_seam"] = (q_clip_seam, sql_clip_seam)


_UC_GRID = 32


_DENSE_GEOM_SQL = f"""
  SELECT p_partkey AS rid,
         (p_partkey * 373) % 20000 AS cx,
         (p_partkey * 911) % 15000 AS cy,
         p_partkey % 1500 + 100 AS r
  FROM part WHERE p_partkey <= {_RCLIP_PARTS}"""


def _dense_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense overlapping diamond field -> clipped rings, shared by the
    union/label gates (SQL twin: _DENSE_GEOM_SQL through
    sql_ring_clip).  The tile_coverage scatter never overlaps — its
    large hash multipliers form a good lattice with min diamond gap
    1860 — so these gates use small multipliers over 20000x15000."""
    from .geo.clip import clip_rings_to_tiles

    part = (spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_partkey") <= _RCLIP_PARTS))
    pk = F.col("p_partkey")
    cx = F.pmod(pk * 373, F.lit(20000))
    cy = F.pmod(pk * 911, F.lit(15000))
    r = F.pmod(pk, F.lit(1500)) + 100
    verts = F.array(
        F.struct((cx + r).alias("x"), cy.alias("y")),
        F.struct(cx.alias("x"), (cy + r).alias("y")),
        F.struct(F.greatest(cx - r, F.lit(0)).alias("x"),
                 cy.alias("y")),
        F.struct(cx.alias("x"),
                 F.greatest(cy - r, F.lit(0)).alias("y")))
    rings = part.select(pk.alias("ring_id"), verts.alias("verts"))
    return clip_rings_to_tiles(rings, _RCLIP_TILE, _RCLIP_SCALE)


def q_union_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile polygon UNION coverage of the ring_clip diamonds
    (geo/clip.py ring_union_cover): 32x32 lattice ray-cast in the
    doubled integer frame, distinct covered cells across rings — the
    overlap-deduplicated complement of tile_coverage's shoelace sum;
    union ≤ sum visible in every tile."""
    from .geo.clip import ring_union_cover

    return ring_union_cover(_dense_clipped(spark, sf_dir),
                            _RCLIP_TILE, _RCLIP_SCALE, grid=_UC_GRID)


def sql_union_cover() -> str:
    base = sql_ring_clip(geom_sql=_DENSE_GEOM_SQL)
    ts = _RCLIP_TILE * _RCLIP_SCALE
    g = _UC_GRID
    sub2 = 2 * (ts // g)
    half = sub2 // 2 - 1
    if half % 2 == 0:
        half += 1
    return f"""WITH clipped AS ({base}),
edges AS (
  SELECT c.ring_id, c.tx, c.ty,
         2 * c.x AS ax2, 2 * c.y AS ay2,
         2 * COALESCE(LEAD(c.x) OVER w, FIRST_VALUE(c.x) OVER w)
           AS bx2,
         2 * COALESCE(LEAD(c.y) OVER w, FIRST_VALUE(c.y) OVER w)
           AS by2
  FROM clipped c
  WINDOW w AS (PARTITION BY c.ring_id, c.tx, c.ty ORDER BY c.i)),
hits AS (
  SELECT e.ring_id, e.tx, e.ty, t.c,
         CAST(SUM(CASE WHEN
             (e.ay2 > 2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half})
             <> (e.by2 > 2 * e.ty * {ts} + (t.c // {g}) * {sub2}
                 + {half})
             AND CASE WHEN e.by2 - e.ay2 > 0 THEN
               (2 * e.tx * {ts} + (t.c % {g}) * {sub2} + {half}
                - e.ax2) * (e.by2 - e.ay2)
               - (e.bx2 - e.ax2)
                 * (2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half}
                    - e.ay2) < 0
             ELSE
               (2 * e.tx * {ts} + (t.c % {g}) * {sub2} + {half}
                - e.ax2) * (e.by2 - e.ay2)
               - (e.bx2 - e.ax2)
                 * (2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half}
                    - e.ay2) > 0
             END
           THEN 1 ELSE 0 END) AS BIGINT) AS crossings
  FROM edges e, UNNEST(range({g * g})) t(c)
  GROUP BY 1, 2, 3, 4
  HAVING SUM(CASE WHEN
             (e.ay2 > 2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half})
             <> (e.by2 > 2 * e.ty * {ts} + (t.c // {g}) * {sub2}
                 + {half})
             AND CASE WHEN e.by2 - e.ay2 > 0 THEN
               (2 * e.tx * {ts} + (t.c % {g}) * {sub2} + {half}
                - e.ax2) * (e.by2 - e.ay2)
               - (e.bx2 - e.ax2)
                 * (2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half}
                    - e.ay2) < 0
             ELSE
               (2 * e.tx * {ts} + (t.c % {g}) * {sub2} + {half}
                - e.ax2) * (e.by2 - e.ay2)
               - (e.bx2 - e.ax2)
                 * (2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half}
                    - e.ay2) > 0
             END
           THEN 1 ELSE 0 END) % 2 = 1)
SELECT tx, ty,
       CAST(COUNT(DISTINCT ring_id) AS BIGINT) AS n_rings,
       CAST(COUNT(DISTINCT c) AS BIGINT) AS cells_union,
       CAST(COUNT(*) AS BIGINT) AS cells_sum,
       CAST(COUNT(DISTINCT c) AS DOUBLE) / {float(g * g)!r}
         AS union_frac
FROM hits GROUP BY 1, 2"""


GEOM_QUERIES["union_cover"] = (q_union_cover, sql_union_cover)


def q_label_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pole-of-inaccessibility label anchors for the dense clipped
    diamonds (geo/clip.py ring_label_anchor — the lattice form of
    mapbox/polylabel): per (ring, tile) piece the in-polygon sample
    farthest from every edge, exact integer max-min d² in the doubled
    frame."""
    from .geo.clip import ring_label_anchor

    return ring_label_anchor(_dense_clipped(spark, sf_dir),
                             _RCLIP_TILE, _RCLIP_SCALE, grid=_UC_GRID)


def sql_label_anchor() -> str:
    base = sql_ring_clip(geom_sql=_DENSE_GEOM_SQL)
    ts = _RCLIP_TILE * _RCLIP_SCALE
    g = _UC_GRID
    sub2 = 2 * (ts // g)
    half = sub2 // 2 - 1
    if half % 2 == 0:
        half += 1
    px = f"(2 * e.tx * {ts} + (t.c % {g}) * {sub2} + {half})"
    py = f"(2 * e.ty * {ts} + (t.c // {g}) * {sub2} + {half})"
    crossing = f"""CASE WHEN
        (e.ay2 > {py}) <> (e.by2 > {py})
        AND CASE WHEN e.by2 - e.ay2 > 0 THEN
          ({px} - e.ax2) * (e.by2 - e.ay2)
          - (e.bx2 - e.ax2) * ({py} - e.ay2) < 0
        ELSE
          ({px} - e.ax2) * (e.by2 - e.ay2)
          - (e.bx2 - e.ax2) * ({py} - e.ay2) > 0
        END
      THEN 1 ELSE 0 END"""
    tnum = (f"(({px} - e.ax2) * (e.bx2 - e.ax2)"
            f" + ({py} - e.ay2) * (e.by2 - e.ay2))")
    l2 = ("((e.bx2 - e.ax2) * (e.bx2 - e.ax2)"
          " + (e.by2 - e.ay2) * (e.by2 - e.ay2))")
    cross = (f"((e.bx2 - e.ax2) * ({py} - e.ay2)"
             f" - (e.by2 - e.ay2) * ({px} - e.ax2))")
    segd2 = f"""CASE WHEN {l2} = 0 OR {tnum} <= 0
        THEN ({px} - e.ax2) * ({px} - e.ax2)
             + ({py} - e.ay2) * ({py} - e.ay2)
      WHEN {tnum} >= {l2}
        THEN ({px} - e.bx2) * ({px} - e.bx2)
             + ({py} - e.by2) * ({py} - e.by2)
      ELSE ({cross} * {cross}) // {l2} END"""
    return f"""WITH clipped AS ({base}),
edges AS (
  SELECT c.ring_id, c.tx, c.ty,
         2 * c.x AS ax2, 2 * c.y AS ay2,
         2 * COALESCE(LEAD(c.x) OVER w, FIRST_VALUE(c.x) OVER w)
           AS bx2,
         2 * COALESCE(LEAD(c.y) OVER w, FIRST_VALUE(c.y) OVER w)
           AS by2
  FROM clipped c
  WINDOW w AS (PARTITION BY c.ring_id, c.tx, c.ty ORDER BY c.i)),
cand AS (
  SELECT e.ring_id, e.tx, e.ty, t.c,
         CAST(SUM({crossing}) AS BIGINT) AS crossings,
         CAST(MIN({segd2}) AS BIGINT) AS mind2
  FROM edges e, UNNEST(range({g * g})) t(c)
  GROUP BY 1, 2, 3, 4
  HAVING SUM({crossing}) % 2 = 1)
SELECT ring_id, tx, ty, CAST(c AS BIGINT) AS cell,
       2 * tx * {ts} + (c % {g}) * {sub2} + {half} AS ax2,
       2 * ty * {ts} + (c // {g}) * {sub2} + {half} AS ay2,
       mind2 AS clearance_d2
FROM (
  SELECT ring_id, tx, ty, c, mind2,
         ROW_NUMBER() OVER (PARTITION BY ring_id, tx, ty
                            ORDER BY mind2 DESC, c) AS rn
  FROM cand) WHERE rn = 1"""


GEOM_QUERIES["label_anchor"] = (q_label_anchor, sql_label_anchor)
