"""Spatial statistics (operators/spatialstats.py morans_i /
getis_ord_gi) and stay-point detection (operators/trajectory.py
stay_points): python replays with exact integer arithmetic, planted
spatial structure, and episode-splitting edge cases."""

import math
import random

from mapbox_filter_spark.operators.spatialstats import (
    getis_ord_gi, morans_i)
from mapbox_filter_spark.operators.trajectory import stay_points

_QUEEN = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          if (dx, dy) != (0, 0)]


def _py_moran(cells, offsets=_QUEEN):
    n = len(cells)
    s1 = sum(cells.values())
    z = {k: n * v - s1 for k, v in cells.items()}
    w = cross = 0
    for (x, y), za in z.items():
        for dx, dy in offsets:
            zb = z.get((x + dx, y + dy))
            if zb is not None:
                w += 1
                cross += za * zb
    den = sum(v * v for v in z.values())
    moran = (float(n) * float(cross)) / (float(w) * float(den)) \
        if den > 0 and w > 0 else None
    return n, w, cross, den, moran


def test_moran_replay_random(spark):
    random.seed(21)
    cells = {(x, y): random.randrange(1, 40)
             for x in range(8) for y in range(6)}
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()],
        "cx long, cy long, v long")
    r = morans_i(df, "cx", "cy", "v").collect()[0]
    n, w, cross, den, moran = _py_moran(cells)
    assert (r.n_cells, r.w_pairs, r.cross_num, r.den) == (n, w, cross, den)
    assert r.moran_i == moran
    assert r.e_i == -1.0 / (n - 1)


def test_moran_checkerboard_rook_is_minus_one(spark):
    # perfect rook anti-correlation: all 4-neighbor products negative
    # and |z| constant -> I = -1 exactly
    cells = [(x, y, 10 if (x + y) % 2 == 0 else 20)
             for x in range(6) for y in range(6)]
    df = spark.createDataFrame(cells, "cx long, cy long, v long")
    r = morans_i(df, "cx", "cy", "v", queen=False).collect()[0]
    assert r.moran_i == -1.0


def test_moran_gradient_positive_constant_null(spark):
    grad = [(x, y, 10 * x) for x in range(8) for y in range(4)]
    df = spark.createDataFrame(grad, "cx long, cy long, v long")
    assert morans_i(df, "cx", "cy", "v").collect()[0].moran_i > 0.4
    flat = [(x, y, 7) for x in range(4) for y in range(4)]
    dff = spark.createDataFrame(flat, "cx long, cy long, v long")
    assert morans_i(dff, "cx", "cy", "v").collect()[0].moran_i is None


def _py_gi(cells):
    n = len(cells)
    s1 = sum(cells.values())
    s2 = sum(v * v for v in cells.values())
    out = {}
    for (x, y), v in cells.items():
        nb = [cells.get((x + dx, y + dy))
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        nb = [b for b in nb if b is not None]
        k, t = len(nb), sum(nb)
        num = n * t - k * s1
        a, b = n * s2 - s1 * s1, n * k - k * k
        gi = (float(num)
              / math.sqrt(float(a * b) / float(n - 1))
              if a > 0 and b > 0 and n > 1 else None)
        out[(x, y)] = (v, k, t, num, gi)
    return out


def test_getis_replay_and_hotspot(spark):
    random.seed(22)
    cells = {(x, y): random.randrange(5, 15)
             for x in range(7) for y in range(7)}
    cells[(3, 3)] = 200          # planted hotspot
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()],
        "cx long, cy long, v long")
    got = {(r.x, r.y): r for r in
           getis_ord_gi(df, "cx", "cy", "v").collect()}
    exp = _py_gi(cells)
    assert set(got) == set(exp)
    for key, (v, k, t, num, gi) in exp.items():
        r = got[key]
        assert (r.v, r.k, r.t_sum, r.g_num) == (v, k, t, num)
        assert r.gi == gi
    # the hotspot and its 8 neighbors carry the top Gi* scores
    top = sorted(got.values(), key=lambda r: -r.gi)[:9]
    assert all(abs(r.x - 3) <= 1 and abs(r.y - 3) <= 1 for r in top)
    assert got[(3, 3)].gi > 1.96


def _mk_pos(spark, rows):
    # rows: (user, ts_us, x, y) with ts as seconds-scale micros
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(u, t, i, x, y) for i, (u, t, x, y) in enumerate(rows)],
        "user_id long, us long, event_id long, x long, y long")
    return df.select("user_id", "event_id", "x", "y",
                     F.timestamp_micros(F.col("us")).alias("ts"))


H = 3_600_000_000  # one hour in micros


def test_stay_points_episodes(spark):
    rows = [
        # user 1: dwell in cell (0,0) for 3 pings over 2h, then move
        (1, 0 * H, 100, 100), (1, 1 * H, 900, 500), (1, 2 * H, 300, 300),
        (1, 3 * H, 9000, 9000),      # new cell -> episode break
        # ...return to (0,0) later: SEPARATE episode (1 ping, dwell 0)
        (1, 10 * H, 200, 200),
        # user 2: same cell but a 72h gap splits the episode
        (2, 0 * H, 50, 50), (2, 1 * H, 60, 60),
        (2, 80 * H, 70, 70), (2, 81 * H, 80, 80),
    ]
    out = stay_points(_mk_pos(spark, rows), cell=4000,
                      gap_us=48 * H, min_dwell_us=H).collect()
    got = {(r.user_id, r.enter_us): r for r in out}
    assert set(got) == {(1, 0), (2, 0), (2, 80 * H)}
    ep = got[(1, 0)]
    assert (ep.cx, ep.cy, ep.exit_us, ep.n_pings, ep.dwell_us) == \
        (0, 0, 2 * H, 3, 2 * H)
    assert got[(2, 0)].n_pings == 2 and got[(2, 80 * H)].n_pings == 2


def test_stay_points_negative_coords_and_threshold(spark):
    # floor_div cell ids: x in [-4000, -1] is cell -1, not 0
    rows = [(1, 0, -100, -100), (1, H, -3900, -3900),
            (1, 2 * H, -100, -3900)]
    out = stay_points(_mk_pos(spark, rows), cell=4000,
                      gap_us=48 * H, min_dwell_us=0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cx, r.cy, r.n_pings, r.dwell_us) == (-1, -1, 3, 2 * H)
    # min_dwell filter drops everything when set above the span
    assert stay_points(_mk_pos(spark, rows), cell=4000, gap_us=48 * H,
                       min_dwell_us=3 * H).count() == 0
