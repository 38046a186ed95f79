"""Session-12 map-placement operators (operators/cluster.py
label_suppress / voronoi_assign): brute-force python replays —
sequential greedy placement vs the distributed fixpoint, exhaustive
argmin vs the least-chain fold — plus guard cases."""

import random

import pytest

from mapbox_filter_spark.operators.cluster import (
    label_suppress, voronoi_assign)
from pyspark.sql import functions as F


def _brute_greedy(pts, radius):
    """Sequential greedy: ascending prio, keep iff no KEPT label within
    radius — the order the fixpoint must reproduce exactly."""
    kept_xy, exp = [], {}
    for i, x, y, p in sorted(pts, key=lambda t: t[3]):
        ok = all((x - kx) ** 2 + (y - ky) ** 2 > radius * radius
                 for kx, ky in kept_xy)
        if ok:
            kept_xy.append((x, y))
        exp[i] = ok
    return exp


def _run_suppress(spark, pts, radius):
    df = spark.createDataFrame(
        list(pts), "i long, x long, y long, prio long")
    return {r.i: r.kept for r in label_suppress(df, radius).collect()}


def test_suppress_random_with_cluster(spark):
    rng = random.Random(42)
    pts = [(i, rng.randrange(0, 4000), rng.randrange(0, 4000), i)
           for i in range(300)]
    # dense cluster: deep suppression chains + clique settling
    pts += [(i, 2000 + rng.randrange(0, 120), 2000 + rng.randrange(0, 120), i)
            for i in range(300, 340)]
    assert _run_suppress(spark, pts, 300) == _brute_greedy(pts, 300)


def test_suppress_chain(spark):
    # a path graph in priority order: the worst-case round count
    # (keep, suppress, keep, ... alternates down the chain)
    pts = [(i, i * 250, 0, i) for i in range(20)]
    got = _run_suppress(spark, pts, 300)
    assert got == _brute_greedy(pts, 300)
    assert got == {i: i % 2 == 0 for i in range(20)}


def test_suppress_reversed_priority(spark):
    # same chain, reversed priorities: the OTHER alternation — proves
    # the fixpoint follows prio, not position or id
    pts = [(i, i * 250, 0, 100 - i) for i in range(20)]
    got = _run_suppress(spark, pts, 300)
    assert got == _brute_greedy(pts, 300)
    assert got == {i: i % 2 == 1 for i in range(20)}


def test_suppress_tie_raises(spark):
    df = spark.createDataFrame(
        [(0, 0, 0, 5), (1, 10, 10, 5)],
        "i long, x long, y long, prio long")
    with pytest.raises(Exception) as exc:
        label_suppress(df, 300).collect()
    assert "prio ties within radius" in str(exc.value)


def test_suppress_distant_ties_allowed(spark):
    # equal priorities are fine when the labels never collide
    df = spark.createDataFrame(
        [(0, 0, 0, 5), (1, 10_000, 10_000, 5)],
        "i long, x long, y long, prio long")
    got = {r.i: r.kept for r in label_suppress(df, 300).collect()}
    assert got == {0: True, 1: True}


def test_suppress_max_rounds_raises(spark):
    pts = [(i, i * 250, 0, i) for i in range(20)]
    df = spark.createDataFrame(
        pts, "i long, x long, y long, prio long")
    with pytest.raises(RuntimeError) as exc:
        label_suppress(df, 300, max_rounds=2)
    assert "no fixpoint" in str(exc.value)


def test_voronoi_exhaustive(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(-3000, 3000), rng.randrange(-3000, 3000))
           for i in range(400)]
    seeds = [(j, rng.randrange(-3000, 3000), rng.randrange(-3000, 3000))
             for j in range(9)]
    pdf = spark.createDataFrame(pts, "i long, x long, y long")
    sdf = spark.createDataFrame(seeds, "seed_id int, sx long, sy long")
    got = {r.i: (r.seed_id, r.d2)
           for r in voronoi_assign(pdf, sdf).collect()}
    for i, x, y in pts:
        d2, j = min(((x - sx) ** 2 + (y - sy) ** 2, j)
                    for j, sx, sy in seeds)
        assert got[i] == (j, d2), (i, got[i], (j, d2))


def test_voronoi_tie_breaks_to_smaller_seed(spark):
    # point equidistant from seeds 0 and 1 -> the fold picks seed 0
    pdf = spark.createDataFrame([(0, 0, 0)], "i long, x long, y long")
    sdf = spark.createDataFrame(
        [(0, 100, 0), (1, -100, 0)], "seed_id int, sx long, sy long")
    r = voronoi_assign(pdf, sdf).collect()[0]
    assert (r.seed_id, r.d2) == (0, 10_000)


def test_voronoi_guards(spark):
    pdf = spark.createDataFrame([(0, 0, 0)], "i long, x long, y long")
    with pytest.raises(ValueError):
        voronoi_assign(pdf, pdf.filter("false").selectExpr(
            "cast(i as int) seed_id", "x sx", "y sy"))
    sdf = spark.createDataFrame([(1, 0, 0)],
                                "seed_id int, sx long, sy long")
    with pytest.raises(ValueError) as exc:
        voronoi_assign(pdf, sdf)
    assert "dense 0.." in str(exc.value)
    big = spark.createDataFrame([(0, 1 << 22, 0)],
                                "i long, x long, y long")
    ok = spark.createDataFrame([(0, 0, 0)],
                               "seed_id int, sx long, sy long")
    with pytest.raises(Exception) as exc:
        voronoi_assign(big, ok).collect()
    assert "exceed bound" in str(exc.value)


def test_voronoi_zero_shuffle_plan(spark):
    # the fact side must not exchange: assignment is a pure projection
    pdf = spark.createDataFrame([(0, 5, 5)], "i long, x long, y long")
    sdf = spark.createDataFrame([(0, 0, 0), (1, 9, 9)],
                                "seed_id int, sx long, sy long")
    out = voronoi_assign(pdf, sdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
