"""geo/overlay.py — segment intersection overlay.

Differential: an independent python solver (parametric line equations
over exact ``fractions.Fraction``, collinear case via 1-D interval
overlap — a different formulation from the operator's orientation-sign
predicate) decides intersection for every pair; the grid join must
report exactly those pairs, each once.
"""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from mapbox_filter_spark.geo.overlay import segment_pairs_intersecting


def _intersects(a, b) -> bool:
    """Exact segment intersection via parametric solve (Fractions)."""
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b
    r = (ax2 - ax1, ay2 - ay1)
    s = (bx2 - bx1, by2 - by1)
    qp = (bx1 - ax1, by1 - ay1)
    rxs = r[0] * s[1] - r[1] * s[0]
    qpxr = qp[0] * r[1] - qp[1] * r[0]
    if rxs == 0:
        if qpxr != 0:
            return False  # parallel non-collinear
        # collinear: project onto the dominant axis of r (or s if r
        # degenerate) and test interval overlap
        if r != (0, 0):
            axis = 0 if abs(r[0]) >= abs(r[1]) else 1
        elif s != (0, 0):
            axis = 0 if abs(s[0]) >= abs(s[1]) else 1
        else:  # both points
            return (ax1, ay1) == (bx1, by1)
        av = sorted((a[axis], a[axis + 2]))
        bv = sorted((b[axis], b[axis + 2]))
        return av[0] <= bv[1] and bv[0] <= av[1]
    t = Fraction(qp[0] * s[1] - qp[1] * s[0], rxs)
    u = Fraction(qpxr, rxs)
    return 0 <= t <= 1 and 0 <= u <= 1


def _run(spark, segs, cell):
    df = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    rows = segment_pairs_intersecting(df, cell).collect()
    pairs = [(r["i"], r["j"]) for r in rows]
    assert len(pairs) == len(set(pairs))  # each pair reported once
    return {(r["i"], r["j"]): r["kind"] for r in rows}


def test_crafted_kinds(spark):
    segs = [
        (1, 0, 0, 10, 10), (2, 0, 10, 10, 0),       # X — proper
        (3, 20, 0, 30, 0), (4, 25, 0, 25, 10),      # T — touch
        (5, 40, 0, 50, 0), (6, 50, 0, 60, 5),       # shared endpoint
        (7, 70, 0, 80, 0), (8, 75, 0, 85, 0),       # collinear overlap
        (9, 90, 0, 95, 0), (10, 96, 0, 99, 0),      # collinear disjoint
        (11, 0, 20, 10, 20), (12, 0, 22, 10, 22),   # parallel
        (13, 0, 30, 10, 31), (14, 0, 32, 10, 31.9 // 1),  # bbox overlap, miss
    ]
    segs = [(i, int(x1), int(y1), int(x2), int(y2))
            for i, x1, y1, x2, y2 in segs]
    got = _run(spark, segs, cell=64)
    assert got[(1, 2)] == "proper"
    assert got[(3, 4)] == "touch"
    assert got[(5, 6)] == "touch"
    assert got[(7, 8)] == "touch"
    assert (9, 10) not in got and (11, 12) not in got
    # differential for the whole crafted set
    by_id = {i: (x1, y1, x2, y2) for i, x1, y1, x2, y2 in segs}
    want = {(i, j) for i in by_id for j in by_id if i < j
            and _intersects(by_id[i], by_id[j])}
    assert set(got) == want


@pytest.mark.parametrize("seed,cell", [(1, 32), (2, 64), (3, 128)])
def test_random_differential(spark, seed, cell):
    rng = random.Random(seed)
    segs = []
    for i in range(120):
        x1, y1 = rng.randrange(0, 400), rng.randrange(0, 400)
        segs.append((i, x1, y1,
                     x1 + rng.randrange(-cell, cell + 1),
                     y1 + rng.randrange(-cell, cell + 1)))
    got = set(_run(spark, segs, cell))
    by_id = {i: (x1, y1, x2, y2) for i, x1, y1, x2, y2 in segs}
    want = {(i, j) for i in by_id for j in by_id if i < j
            and _intersects(by_id[i], by_id[j])}
    assert got == want


def test_cross_cell_pair(spark):
    # segments whose home cells differ but which cross at a boundary
    segs = [(1, 60, 60, 70, 70), (2, 70, 60, 60, 70)]
    got = _run(spark, segs, cell=64)
    assert got == {(1, 2): "proper"}


def test_extent_validation(spark):
    df = spark.createDataFrame([(1, 0, 0, 100, 0)],
                               "seg_id long, x1 long, y1 long, x2 long, y2 long")
    with pytest.raises(ValueError, match="extent"):
        segment_pairs_intersecting(df, 64)
    # validate=False skips the scan (caller guarantees the bound)
    assert segment_pairs_intersecting(df, 64, validate=False) is not None
    with pytest.raises(ValueError, match="cell"):
        segment_pairs_intersecting(df, 0)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, 0, 0, 5, 5), (2, 0, 5, 5, 0)],
                               "seg_id long, x1 long, y1 long, x2 long, y2 long")
    plan = segment_pairs_intersecting(df, 64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ map matching


def _py_d2(p, s):
    """Python twin of the snap distance — identical IEEE op order."""
    px, py = p
    x1, y1, x2, y2 = s
    tnum = (px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)
    l2 = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)
    if l2 == 0 or tnum <= 0:
        return float((px - x1) ** 2 + (py - y1) ** 2)
    if tnum >= l2:
        return float((px - x2) ** 2 + (py - y2) ** 2)
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    return float(cross * cross) / float(l2)


def _py_snap(points, segs, radius):
    out = {}
    for pid, px, py in points:
        best = None
        for sid, *s in segs:
            d2 = _py_d2((px, py), s)
            if d2 <= radius * radius:
                k = (d2, sid)
                if best is None or k < best:
                    best = k
        if best is not None:
            out[pid] = (best[1], best[0])
    return out


def _spark_snap(spark, points, segs, radius, cell):
    from mapbox_filter_spark.geo.overlay import snap_to_segments

    p = spark.createDataFrame(points, "point_id long, x long, y long")
    s = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    return {r["point_id"]: (r["seg_id"], r["d2"])
            for r in snap_to_segments(p, s, radius, cell).collect()}


def test_snap_crafted(spark):
    segs = [(1, 0, 0, 100, 0),      # horizontal road
            (2, 0, 50, 100, 50),    # parallel road
            (3, 200, 0, 200, 100)]  # vertical road
    points = [(10, 50, 10),   # interior projection onto seg 1 (d2=100)
              (11, 50, 25),   # equidistant 1 vs 2 -> lower sid wins
              (12, 120, 20),  # past seg 1's endpoint -> clamp to (100,0)
              (13, 210, 50),  # near the vertical road
              (14, 500, 500)]  # off-road
    got = _spark_snap(spark, points, segs, radius=60, cell=128)
    assert got == _py_snap(points, segs, 60)
    assert got[10] == (1, 100.0)
    assert got[11][0] == 1  # tie-break by seg id
    assert got[12] == (1, float(20 * 20 + 20 * 20))
    assert 14 not in got


@pytest.mark.parametrize("seed", [5, 6])
def test_snap_random_differential(spark, seed):
    rng = random.Random(seed)
    cell = 64
    segs = []
    for i in range(80):
        x1, y1 = rng.randrange(0, 500), rng.randrange(0, 500)
        segs.append((i, x1, y1, x1 + rng.randrange(-cell, cell + 1),
                     y1 + rng.randrange(-cell, cell + 1)))
    points = [(i, rng.randrange(0, 500), rng.randrange(0, 500))
              for i in range(200)]
    got = _spark_snap(spark, points, segs, radius=cell, cell=cell)
    assert got == _py_snap(points, segs, cell)


def test_snap_validations(spark):
    p = spark.createDataFrame([(1, 0, 0)], "point_id long, x long, y long")
    s = spark.createDataFrame([(1, 0, 0, 5, 5)],
                              "seg_id long, x1 long, y1 long, x2 long, y2 long")
    from mapbox_filter_spark.geo.overlay import snap_to_segments

    with pytest.raises(ValueError, match="radius"):
        snap_to_segments(p, s, 100, 64)  # radius > cell
    with pytest.raises(ValueError, match="radius"):
        snap_to_segments(p, s, 0, 64)
