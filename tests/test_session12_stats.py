"""Session-12 statistics/metrics operators (partial_corr, grubbs_test,
map_mrr_at_k): brute-force python replays with planted structure."""

import math
import random

import pytest

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.metrics import map_mrr_at_k
from mapbox_filter_spark.operators.stats import grubbs_test, partial_corr


def _py_pcorr(rows):
    n = len(rows)
    sx = sum(r[0] for r in rows); sy = sum(r[1] for r in rows)
    sz = sum(r[2] for r in rows)
    sxx = sum(r[0] * r[0] for r in rows)
    syy = sum(r[1] * r[1] for r in rows)
    szz = sum(r[2] * r[2] for r in rows)
    sxy = sum(r[0] * r[1] for r in rows)
    sxz = sum(r[0] * r[2] for r in rows)
    syz = sum(r[1] * r[2] for r in rows)
    Sxx, Syy, Szz = n * sxx - sx * sx, n * syy - sy * sy, n * szz - sz * sz
    Sxy, Sxz, Syz = n * sxy - sx * sy, n * sxz - sx * sz, n * syz - sy * sz

    def r(ab, aa, bb):
        if aa > 0 and bb > 0:
            return float(ab) / math.sqrt(float(aa) * float(bb))
        return None

    rxy, rxz, ryz = r(Sxy, Sxx, Syy), r(Sxz, Sxx, Szz), r(Syz, Syy, Szz)
    pc = None
    if None not in (rxy, rxz, ryz):
        den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
        if den > 0:
            pc = (rxy - rxz * ryz) / math.sqrt(den)
    return rxy, rxz, ryz, pc


def test_partial_corr_differential(spark):
    rng = random.Random(3)
    rows = []
    for _ in range(500):
        z = rng.randrange(0, 100)
        # x, y both driven by z plus noise: r_xy high, r_xy.z small
        x = 3 * z + rng.randrange(0, 20)
        y = 2 * z + rng.randrange(0, 20)
        rows.append((x, y, z))
    df = spark.createDataFrame(
        [("g",) + r for r in rows], "g string, x long, y long, z long")
    got = partial_corr(df, ["g"], "x", "y", "z").collect()[0]
    rxy, rxz, ryz, pc = _py_pcorr(rows)
    assert got.n == 500
    assert got.r_xy == pytest.approx(rxy, rel=1e-12)
    assert got.r_xy_z == pytest.approx(pc, rel=1e-9)
    # the confound is detected: raw corr strong, partial corr weak
    assert got.r_xy > 0.9 and abs(got.r_xy_z) < 0.3


def test_partial_corr_degenerate(spark):
    # constant z -> r_xz undefined -> r_xy_z NULL; r_xy still real
    df = spark.createDataFrame(
        [("g", i, 2 * i, 7) for i in range(10)],
        "g string, x long, y long, z long")
    got = partial_corr(df, ["g"], "x", "y", "z").collect()[0]
    assert got.r_xy == pytest.approx(1.0)
    assert got.r_xz is None and got.r_xy_z is None
    # z == x exactly -> 1 - r_xz^2 == 0 -> NULL
    df2 = spark.createDataFrame(
        [("g", i, 2 * i + (i % 3), i) for i in range(10)],
        "g string, x long, y long, z long")
    got2 = partial_corr(df2, ["g"], "x", "y", "z").collect()[0]
    assert got2.r_xz == pytest.approx(1.0)
    assert got2.r_xy_z is None


def test_grubbs_differential(spark):
    rng = random.Random(9)
    vals = [rng.randrange(90, 110) for _ in range(200)] + [500]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, tb long, x long")
    got = grubbs_test(df, ["g"], "x", "tb").collect()[0]
    n = len(vals)
    sx = sum(vals); sxx = sum(v * v for v in vals)
    dev = max(abs(n * v - sx) for v in vals)
    s = math.sqrt(float(n * sxx - sx * sx) * float(n) / float(n - 1))
    assert got.x_out == 500
    assert got.g_stat == pytest.approx(dev / s, rel=1e-12)
    assert got.g_stat > 10        # the planted outlier is loud


def test_grubbs_small_and_constant_null(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 9), ("b", 1, 4), ("b", 2, 4),
         ("b", 3, 4), ("b", 4, 4)],
        "g string, tb long, x long")
    got = {r.g: r for r in grubbs_test(df, ["g"], "x", "tb").collect()}
    assert got["a"].g_stat is None          # n < 3
    assert got["b"].g_stat is None          # constant group
    assert got["b"].x_out == 4


def _py_map_mrr(ranking, k):
    L = math.lcm(*range(1, k + 1))
    from collections import defaultdict
    byq = defaultdict(list)
    for q, rank, rel in ranking:
        if rank <= k:
            byq[q].append((rank, rel))
    s_ap = s_rr = 0
    for q, rows in byq.items():
        rows.sort()
        cum = 0
        rr = 0
        ap = 0
        for rank, rel in rows:
            cum += rel
            if rel:
                ap += cum * (L // rank)
                if rr == 0:
                    rr = L // rank
        s_ap += ap
        s_rr += rr
    nq = len(byq)
    return (nq, s_ap, s_rr, s_ap / (nq * L * k), s_rr / (nq * L))


def test_map_mrr_differential(spark):
    rng = random.Random(17)
    ranking = []
    for q in range(60):
        for rank in range(1, 11):
            ranking.append((q, rank, rng.randrange(2)))
    df = spark.createDataFrame(ranking, "q_id long, rank long, rel long")
    got = map_mrr_at_k(df, 10).collect()[0]
    exp = _py_map_mrr(ranking, 10)
    assert (got.n_q, got.sum_ap_l, got.sum_rr_l) == exp[:3]
    assert got.map_at_k == pytest.approx(exp[3], rel=1e-12)
    assert got.mrr_at_k == pytest.approx(exp[4], rel=1e-12)


def test_map_mrr_pinned_values(spark):
    # one query, relevant at ranks 1 and 3:
    # AP@2520 = 1*2520 + 2*840 = 4200; AP = 4200/(2520*10) = 1/6
    # MRR = 2520/2520 = 1.0
    rows = [(1, r, 1 if r in (1, 3) else 0) for r in range(1, 11)]
    df = spark.createDataFrame(rows, "q_id long, rank long, rel long")
    got = map_mrr_at_k(df, 10).collect()[0]
    assert got.sum_ap_l == 4200 and got.sum_rr_l == 2520
    assert got.map_at_k == pytest.approx(4200 / 25200)
    assert got.mrr_at_k == 1.0
