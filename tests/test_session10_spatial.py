"""Session-10 spatial statistics (operators/spatialstats.py
join_count_stats / sd_ellipse): brute-force python replays with
planted spatial structure, plus degenerate and bound cases.  Replays
mirror the same exact-integer / pinned-IEEE chains the engines run."""

import math
import random

import pyspark.errors
import pytest

from mapbox_filter_spark.operators.spatialstats import (
    join_count_stats, sd_ellipse)

_QUEEN = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          if (dx, dy) != (0, 0)]


def _py_join_counts(cells):
    """cells: {(x, y): v}.  Same exact-integer arithmetic as the
    operator (ordered pairs, above-mean binarization)."""
    n = len(cells)
    s1 = sum(cells.values())
    hot = {k: 1 if n * v > s1 else 0 for k, v in cells.items()}
    w = bb = ww = 0
    for (x, y), ha in hot.items():
        for dx, dy in _QUEEN:
            hb = hot.get((x + dx, y + dy))
            if hb is not None:
                w += 1
                bb += ha * hb
                ww += (1 - ha) * (1 - hb)
    nb = sum(hot.values())
    e_bb = float(w * nb * (nb - 1)) / float(n * (n - 1)) if n > 1 else None
    e_bw = (float(w * 2 * nb * (n - nb)) / float(n * (n - 1))
            if n > 1 else None)
    return dict(n_cells=n, n_hot=nb, w_pairs=w, bb=bb,
                bw=w - bb - ww, ww=ww, e_bb=e_bb, e_bw=e_bw)


def _run_join_counts(spark, cells):
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in cells.items()], "x long, y long, v long")
    return join_count_stats(df, "x", "y", "v").collect()[0].asDict()


def test_join_counts_checkerboard(spark):
    # 4x4 checkerboard of 0/10: every adjacent rook pair is BW, the
    # diagonal queen pairs are BB or WW
    cells = {(x, y): 10 * ((x + y) % 2) for x in range(4) for y in range(4)}
    got = _run_join_counts(spark, cells)
    exp = _py_join_counts(cells)
    assert got == exp
    # checkerboard: BW dominates its expectation
    assert got["bw"] > got["e_bw"]


def test_join_counts_clustered_random(spark):
    rng = random.Random(7)
    # hot 3x3 block inside a cold 8x8 field + noise
    cells = {(x, y): (100 if 2 <= x <= 4 and 2 <= y <= 4 else 0)
             + rng.randrange(3)
             for x in range(8) for y in range(8)}
    got = _run_join_counts(spark, cells)
    exp = _py_join_counts(cells)
    assert got == exp
    # clustered: BB above expectation
    assert got["bb"] > got["e_bb"]


def test_join_counts_constant_field(spark):
    # constant field: nothing exceeds the mean -> 0 hot, bb = 0
    cells = {(x, y): 5 for x in range(3) for y in range(3)}
    got = _run_join_counts(spark, cells)
    assert got["n_hot"] == 0 and got["bb"] == 0
    assert got["ww"] == got["w_pairs"]


def _py_sde(pts):
    """pts: [(x, y)] exact ints.  Same anchored-decimal / pinned-chain
    arithmetic as the operator (div truncation == floor for the
    non-negative sums used here)."""
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    ax, ay = sx // n, sy // n
    dx = [p[0] - ax for p in pts]
    dy = [p[1] - ay for p in pts]
    dx1, dy1 = sum(dx), sum(dy)
    dx2 = sum(d * d for d in dx)
    dy2 = sum(d * d for d in dy)
    dxy = sum(a * b for a, b in zip(dx, dy))
    nd = float(n)
    delx, dely = float(dx1) / nd, float(dy1) / nd
    mxx = float(dx2) / nd - delx * delx
    myy = float(dy2) / nd - dely * dely
    mxy = float(dxy) / nd - delx * dely
    iso = n * (dx2 - dy2) == dx1 * dx1 - dy1 * dy1
    tan2 = (2.0 * mxy) / (mxx - myy) if n >= 2 and not iso else None
    tr = (mxx + myy) / 2.0
    half = (mxx - myy) / 2.0
    disc = math.sqrt(half * half + mxy * mxy)
    s1 = math.sqrt(tr + disc) if n >= 2 else None
    s2 = math.sqrt(max(tr - disc, 0.0)) if n >= 2 else None
    return dict(n=n, mxx=mxx if n >= 2 else None,
                myy=myy if n >= 2 else None,
                mxy=mxy if n >= 2 else None,
                tan2theta=tan2, sigma1=s1, sigma2=s2)


def _run_sde(spark, pts):
    df = spark.createDataFrame([("g", x, y) for x, y in pts],
                               "g string, x long, y long")
    return sd_ellipse(df, ["g"], "x", "y").collect()[0].asDict()


def test_sde_random_cloud(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(100_000), rng.randrange(50_000))
           for _ in range(500)]
    got = _run_sde(spark, pts)
    exp = _py_sde(pts)
    for k, v in exp.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, rel=1e-12), k
        else:
            assert got[k] == v, k


def test_sde_oriented_line(spark):
    # points on y = 2x: collinear -> sigma2 == 0 exactly (the clamp),
    # orientation tan(2*theta) with tan(theta) = 2 -> tan2 = -4/3
    pts = [(i, 2 * i) for i in range(0, 1000, 7)]
    got = _run_sde(spark, pts)
    exp = _py_sde(pts)
    assert got["sigma2"] == 0.0
    assert got["tan2theta"] == pytest.approx(-4.0 / 3.0, rel=1e-9)
    assert got["tan2theta"] == exp["tan2theta"]


def test_sde_isotropic_null(spark):
    # exact 45-degree symmetry: mxx == myy exactly -> tan2theta NULL
    pts = [(0, 0), (10, 10), (0, 10), (10, 0)]
    got = _run_sde(spark, pts)
    assert got["tan2theta"] is None
    assert got["mxx"] == got["myy"]


def test_sde_single_point_guarded(spark):
    got = _run_sde(spark, [(5, 9)])
    assert got["n"] == 1
    assert all(got[k] is None for k in
               ("mxx", "myy", "mxy", "tan2theta", "sigma1", "sigma2"))


def test_sde_deviation_bound_raises(spark):
    # two points 2e6 apart: |x - anchor| exceeds the exact bound
    df = spark.createDataFrame([("g", 0, 0), ("g", 2_500_000, 0)],
                               "g string, x long, y long")
    with pytest.raises(Exception) as exc:
        sd_ellipse(df, ["g"], "x", "y").collect()
    assert "exceeds exact bound" in str(exc.value)


# --- kde_surface ------------------------------------------------------

def _py_kde(pts, cell, radius):
    """Brute replay of kde_surface: same doubled-integer chain."""
    r2d = 2 * radius
    r2d2 = r2d * r2d
    agg = {}
    for x, y in pts:
        gx0, gy0 = x // cell, y // cell
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = gx0 + dx, gy0 + dy
                cx, cy = gx * 2 * cell + cell, gy * 2 * cell + cell
                d2 = (2 * x - cx) ** 2 + (2 * y - cy) ** 2
                if d2 < r2d2:
                    a = agg.setdefault((gx, gy), [0, 0])
                    a[0] += 1
                    a[1] += (r2d2 - d2) ** 2
    return {k: (v[0], v[1], v[1] / (float(r2d2) * float(r2d2)))
            for k, v in agg.items()}


def _run_kde(spark, pts, cell, radius):
    from mapbox_filter_spark.operators.spatialstats import kde_surface
    df = spark.createDataFrame(list(pts), "x long, y long")
    rows = kde_surface(df, cell=cell, radius=radius).collect()
    return {(r.gx, r.gy): (r.n_contrib, r.kde_num, r.density)
            for r in rows}


def test_kde_random_cloud(spark):
    rng = random.Random(23)
    pts = [(rng.randrange(-5_000, 5_000), rng.randrange(-5_000, 5_000))
           for _ in range(600)]
    got = _run_kde(spark, pts, cell=400, radius=600)
    exp = _py_kde(pts, 400, 600)
    assert got == exp


def test_kde_single_point_disc(spark):
    # one point dead-center of cell (0,0): full kernel at the center
    # (d=0 -> num = r2d2, density exactly 1.0); rook neighbors at
    # distance cell=400 and corner neighbors at 400*sqrt(2)~565.7 are
    # all inside radius 600 -> all 9 ring-1 cells receive mass.
    cell, radius = 400, 600
    pts = [(200, 200)]
    got = _run_kde(spark, pts, cell, radius)
    exp = _py_kde(pts, cell, radius)
    assert got == exp
    r2d2 = (2 * radius) ** 2
    assert got[(0, 0)] == (1, r2d2 * r2d2, 1.0)
    assert len(got) == 9


def test_kde_ring1_coverage_at_bound(spark):
    # radius == 1.5*cell exactly: the nearest ring-2 center sits at
    # exactly radius -> kernel is zero there and the strict < filter
    # drops it in BOTH the brute replay and the operator.
    cell, radius = 400, 600
    rng = random.Random(7)
    pts = [(rng.randrange(0, 1200), rng.randrange(0, 1200))
           for _ in range(200)]
    # include exact edge points that sit 1.5*cell from a ring-2 center
    pts += [(0, 200), (1200, 200), (200, 0)]
    assert _run_kde(spark, pts, cell, radius) == _py_kde(
        pts, cell, radius)


def test_kde_radius_bound_raises(spark):
    from mapbox_filter_spark.operators.spatialstats import kde_surface
    df = spark.createDataFrame([(0, 0)], "x long, y long")
    with pytest.raises(ValueError) as exc:
        kde_surface(df, cell=400, radius=601)
    assert "ring-1 coverage" in str(exc.value)
