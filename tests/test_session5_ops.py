"""Unit differentials for the session-5 operator block: convex hull
(chain vs brute), Theil-Sen (hand case + guard), HITS (invariants +
python replay), heading octants (hand case), region dissolve (hand
case), HLL (register math vs python replay)."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.hull import (convex_hull_cells,
                                          hull_boundary_points)


def brute_boundary(pts):
    """Supporting-line characterization — the oracle's O(n³) rule."""
    pts = sorted(set(pts))
    if len(pts) <= 1:
        return pts
    out = []
    for p in pts:
        ok = False
        for q in pts:
            if q == p:
                continue
            if all((q[0] - p[0]) * (r[1] - p[1])
                   - (q[1] - p[1]) * (r[0] - p[0]) >= 0 for r in pts):
                ok = True
                break
        if ok:
            out.append(p)
    return out


def test_hull_chain_matches_brute_random():
    rng = random.Random(42)
    for trial in range(200):
        n = rng.randint(1, 24)
        span = rng.choice([3, 5, 50])
        pts = [(rng.randint(0, span), rng.randint(0, span))
               for _ in range(n)]
        chain = hull_boundary_points([p[0] for p in pts],
                                     [p[1] for p in pts])
        assert chain == brute_boundary(pts), (trial, pts)


def test_hull_collinear_and_degenerate():
    # all collinear: every distinct point is boundary
    assert hull_boundary_points([0, 1, 2, 3], [0, 1, 2, 3]) == \
        [(0, 0), (1, 1), (2, 2), (3, 3)]
    # duplicates collapse
    assert hull_boundary_points([5, 5, 5], [7, 7, 7]) == [(5, 7)]
    # square + center: center excluded, edge midpoint kept
    pts = [(0, 0), (2, 0), (0, 2), (2, 2), (1, 1), (1, 0)]
    assert (1, 1) not in hull_boundary_points(
        [p[0] for p in pts], [p[1] for p in pts])
    assert (1, 0) in hull_boundary_points(
        [p[0] for p in pts], [p[1] for p in pts])


def test_convex_hull_cells_operator(spark):
    rows = [Row(x=x, y=y) for x in range(0, 30, 3)
            for y in range(0, 30, 3)]
    out = convex_hull_cells(spark.createDataFrame(rows), 100).collect()
    got = sorted((r.x, r.y) for r in out)
    assert got == brute_boundary([(r.x, r.y) for r in rows])


def test_theil_sen_hand_case(spark):
    from mapbox_filter_spark.operators.rankstats import theil_sen

    # y = 2x except one gross outlier; slopes median must be 2
    rows = [Row(g="a", x=x, y=2 * x) for x in range(6)]
    rows[5] = Row(g="a", x=5, y=100)
    df = spark.createDataFrame(rows)
    r = theil_sen(df, ["g"], "x", "y").collect()[0]
    assert r.n_pts == 6 and r.n_pairs == 15
    assert r.slope == 2.0 and r.med_dy / r.med_dx == 2.0


def test_theil_sen_group_cap(spark):
    from mapbox_filter_spark.operators.rankstats import (
        _THEILSEN_MAX_GROUP_ROWS, theil_sen)

    n = _THEILSEN_MAX_GROUP_ROWS + 1
    df = spark.range(n).select(F.lit("g").alias("g"),
                               F.col("id").alias("x"),
                               F.col("id").alias("y"))
    with pytest.raises(Exception, match="pair-join bound"):
        theil_sen(df, ["g"], "x", "y").collect()


def _hits_python(nodes, edges, iters, scale):
    hub = {u: scale // len(nodes) for u in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {u: 0 for u in nodes}
        for s, d in edges:
            raw_a[d] += hub[s]
        t = sum(raw_a.values())
        auth = {u: (scale * raw_a[u]) // t for u in nodes}
        raw_h = {u: 0 for u in nodes}
        for s, d in edges:
            raw_h[s] += auth[d]
        t = sum(raw_h.values())
        hub = {u: (scale * raw_h[u]) // t for u in nodes}
    return hub, auth


def test_hits_exact_replay(spark):
    from mapbox_filter_spark.operators.graph import hits_exact

    rng = random.Random(7)
    nodes = list(range(12))
    edges = sorted({(rng.randrange(12), rng.randrange(12))
                    for _ in range(30)})
    edges = [(s, d) for s, d in edges if s != d]
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r.node: (r.hub, r.auth)
           for r in hits_exact(ndf, edf, iters=3).collect()}
    hub, auth = _hits_python(nodes, edges, 3, 10**9)
    assert got == {n: (hub[n], auth[n]) for n in nodes}


def test_heading_octants_hand(spark):
    from mapbox_filter_spark.operators.trajectory import heading_octants

    # one walker: E, NE, N, zero, SW-ish steps with |dx|>|dy| => W
    pts = [(0, 0), (5, 0), (8, 3), (8, 9), (8, 9), (1, 7)]
    rows = [Row(user_id=1, ts=i, event_id=i, x=x, y=y)
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows)
    got = {r.octant: (r.n_steps, r.sum_l1)
           for r in heading_octants(df, order_cols=("ts",)).collect()}
    assert got == {0: (1, 5), 1: (1, 6), 2: (1, 6), -1: (1, 0),
                   4: (1, 9)}


def test_region_dissolve_hand(spark):
    from mapbox_filter_spark.operators.cluster import region_dissolve

    # two hot blobs: cells (0,0)+(1,1) diagonal-adjacent; (5,5) isolated
    def cell_pts(cx, cy, k):
        return [Row(x=cx * 10 + i % 3, y=cy * 10 + i // 3)
                for i in range(k)]

    rows = (cell_pts(0, 0, 4) + cell_pts(1, 1, 5) + cell_pts(5, 5, 3)
            + cell_pts(3, 0, 1))  # cold cell
    df = spark.createDataFrame(rows)
    out = {r.region: (r.n_cells, r.n_pts)
           for r in region_dissolve(df, 10, 3, pack=100).collect()}
    assert out == {0: (2, 9), 505: (1, 3)}


def test_hll_registers_replay(spark):
    import hashlib

    from mapbox_filter_spark.operators.sketch import (hll_estimate,
                                                      hll_registers)

    rows = [Row(g="a", k=str(i)) for i in range(300)]
    df = spark.createDataFrame(rows)
    regs = {(r.bucket): r.reg
            for r in hll_registers(df, ["g"], ["k"], b=6,
                                   salt="t").collect()}

    py = {}
    for i in range(300):
        h = int(hashlib.md5(f"t\x1f{i}".encode()).hexdigest()[:15], 16)
        b, w = h % 64, h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        py[b] = max(py.get(b, 0), rho)
    assert regs == py

    est = hll_estimate(
        hll_registers(df, ["g"], ["k"], b=6, salt="t"), ["g"],
        b=6).collect()[0]
    s = sum(1 << (55 - r) for r in py.values()) \
        + (64 - len(py)) * (1 << 55)
    assert est.s_scaled == s and est.v_zero == 64 - len(py)
    # estimate within HLL's expected error of the true 300
    assert abs(est.est_hll - 300) < 300 * 0.35
