"""Session-18 operator blocks: Gabriel/RNG proximity graphs +
supercover line rasterization — python brute differentials + edge
pins."""

import pytest

from mapbox_filter_spark.operators.cluster import proximity_graph
from mapbox_filter_spark.operators.raster import line_rasterize


# ---- proximity_graph ----

def test_proximity_graph_hand_case(spark):
    # Square + center: diagonals are NOT Gabriel (center inside the
    # diameter circle); sides are Gabriel; sides are NOT RNG relative
    # to... sides ARE RNG here (no point in any side's lune).
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 0), (3, 10, 10), (4, 0, 10), (5, 5, 5)],
        "i long, x long, y long")
    out = {(r.i, r.j): r for r in proximity_graph(pts, 20).collect()}
    # corner-corner diagonal (1,3): d2=200, center witness 5:
    # d2(1,5)+d2(5,3) = 50+50 = 100 < 200 -> not Gabriel
    assert out[(1, 3)].is_gabriel is False
    assert out[(1, 3)].is_rng is False
    # side (1,2): d2=100; center w: d2(1,5)=50, d2(5,2)=50; sum=100
    # NOT < 100 -> Gabriel holds; max=50 < 100 -> RNG witness -> cut
    assert out[(1, 2)].is_gabriel is True
    assert out[(1, 2)].is_rng is False
    # spoke (1,5): d2=50; witnesses 2/4: d2(1,2)=100 > 50 -> no
    assert out[(1, 5)].is_gabriel is True
    assert out[(1, 5)].is_rng is True
    # RNG implies Gabriel everywhere
    for r in out.values():
        assert (not r.is_rng) or r.is_gabriel


def test_proximity_graph_python_differential(spark):
    import random
    rng = random.Random(181)
    pts = [(i, rng.randrange(-40, 40), rng.randrange(-40, 40))
           for i in range(80)]
    rmax = 30
    df = spark.createDataFrame(pts, "i long, x long, y long")
    out = {(r.i, r.j): (r.d2, r.is_gabriel, r.is_rng)
           for r in proximity_graph(df, rmax).collect()}
    exp = {}
    for i, x1, y1 in pts:
        for j, x2, y2 in pts:
            if i >= j:
                continue
            d2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
            if d2 > rmax * rmax:
                continue
            hg = hr = False
            for w, xw, yw in pts:
                if w in (i, j):
                    continue
                a = (x1 - xw) ** 2 + (y1 - yw) ** 2
                b = (x2 - xw) ** 2 + (y2 - yw) ** 2
                hg = hg or (a + b < d2)
                hr = hr or (max(a, b) < d2)
            exp[(i, j)] = (d2, not hg, not hr)
    assert out == exp


def test_proximity_graph_coincident_and_errors(spark):
    # coincident pair stays connected in both graphs
    df = spark.createDataFrame([(1, 3, 3), (2, 3, 3), (3, 9, 9)],
                               "i long, x long, y long")
    out = {(r.i, r.j): r for r in proximity_graph(df, 10).collect()}
    assert out[(1, 2)].is_gabriel and out[(1, 2)].is_rng
    assert out[(1, 2)].d2 == 0
    with pytest.raises(ValueError):
        proximity_graph(df, 0)


# ---- line_rasterize ----

def _brute_cells(x0, y0, x1, y1, cell):
    """Closed-square vs closed-segment intersection, brute SAT."""
    import math
    cells = set()
    cxa = math.floor((min(x0, x1) - 1) / cell)
    cxb = math.floor(max(x0, x1) / cell)
    cya = math.floor((min(y0, y1) - 1) / cell)
    cyb = math.floor(max(y0, y1) / cell)
    dx, dy = x1 - x0, y1 - y0
    for cx in range(cxa, cxb + 1):
        for cy in range(cya, cyb + 1):
            signs = []
            for px, py in ((cx * cell, cy * cell),
                           ((cx + 1) * cell, cy * cell),
                           (cx * cell, (cy + 1) * cell),
                           ((cx + 1) * cell, (cy + 1) * cell)):
                f = dx * (py - y0) - dy * (px - x0)
                signs.append(0 if f == 0 else (1 if f > 0 else -1))
            if not (min(signs) > 0 or max(signs) < 0):
                cells.add((cx, cy))
    return cells


def test_line_rasterize_hand_cases(spark):
    # diagonal through cell corners: touches all 4 cells at the
    # shared corner (closed-set semantics)
    df = spark.createDataFrame([(1, -5, -5, 5, 5)],
                               "seg_id long, x0 long, y0 long, "
                               "x1 long, y1 long")
    got = {(r.cx, r.cy)
           for r in line_rasterize(df, 10).collect()}
    # segment (-5,-5)->(5,5) crosses corner (0,0): all 4 incident
    # cells are touched
    assert got == {(-1, -1), (0, 0), (-1, 0), (0, -1)}
    # axis-aligned segment along a cell edge: both adjacent rows, and
    # the endpoint on x=0 touches column -1 (closed-square semantics)
    df2 = spark.createDataFrame([(1, 0, 10, 25, 10)],
                                "seg_id long, x0 long, y0 long, "
                                "x1 long, y1 long")
    got2 = {(r.cx, r.cy) for r in line_rasterize(df2, 10).collect()}
    assert got2 == {(cx, cy) for cx in (-1, 0, 1, 2) for cy in (0, 1)}
    # zero-length segment inside one cell
    df3 = spark.createDataFrame([(1, 3, 4, 3, 4)],
                                "seg_id long, x0 long, y0 long, "
                                "x1 long, y1 long")
    got3 = {(r.cx, r.cy) for r in line_rasterize(df3, 10).collect()}
    assert got3 == {(0, 0)}


def test_line_rasterize_python_differential(spark):
    import random
    rng = random.Random(182)
    segs = [(k, rng.randrange(-100, 100), rng.randrange(-100, 100),
             rng.randrange(-100, 100), rng.randrange(-100, 100))
            for k in range(60)]
    df = spark.createDataFrame(
        segs, "seg_id long, x0 long, y0 long, x1 long, y1 long")
    out = {}
    for r in line_rasterize(df, 16).collect():
        out.setdefault(r.seg_id, set()).add((r.cx, r.cy))
    for k, x0, y0, x1, y1 in segs:
        assert out.get(k, set()) == _brute_cells(x0, y0, x1, y1, 16), k


def test_line_rasterize_guard_and_errors(spark):
    df = spark.createDataFrame([(1, 0, 0, 10_000, 10_000)],
                               "seg_id long, x0 long, y0 long, "
                               "x1 long, y1 long")
    with pytest.raises(Exception, match="max_cells"):
        line_rasterize(df, 10, max_cells=100).collect()
    with pytest.raises(ValueError):
        line_rasterize(df, 0)
    # supercover never skips: consecutive cells along the walk are
    # 8-connected (a closed segment cannot jump a cell boundary)
    df2 = spark.createDataFrame([(1, -95, 17, 88, -64)],
                                "seg_id long, x0 long, y0 long, "
                                "x1 long, y1 long")
    cells = {(r.cx, r.cy) for r in line_rasterize(df2, 12).collect()}
    # every covered cell (except endpoints' cells) has a covered
    # neighbor in the 3x3 ring
    for cx, cy in cells:
        assert any((cx + dx, cy + dy) in cells
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                   if (dx, dy) != (0, 0)) or len(cells) == 1
