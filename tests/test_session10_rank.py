"""Session-10 rank/robust statistics (operators/stats.py
brown_forsythe, operators/rankstats.py pettitt_test / friedman_test):
brute-force python replays against the textbook DEFINITIONS (not the
engine's rank identities), planted-structure checks, and degenerate
cases."""

import random

import pytest

from mapbox_filter_spark.operators.rankstats import (
    friedman_test, pettitt_test)
from mapbox_filter_spark.operators.stats import brown_forsythe


# ---------------------------------------------------------------- BF

def _py_bf(rows, quant=1):
    """rows: (group, value).  Textbook BF: ANOVA F on |x − median_g|,
    replayed with the engine's doubled-median / floor-div arithmetic."""
    from collections import defaultdict
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    z = []
    for g, vs in groups.items():
        vs = sorted(vs)
        n = len(vs)
        m2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
        z.extend((g, abs(2 * v - m2) // quant) for v in vs)
    # anova_f exact-integer replay
    agg = defaultdict(lambda: [0, 0, 0])
    for g, zz in z:
        a = agg[g]
        a[0] += 1
        a[1] += zz
        a[2] += zz * zz
    n = sum(a[0] for a in agg.values())
    k = len(agg)
    s = sum(a[1] for a in agg.values())
    q = sum(a[2] for a in agg.values())
    t = sum((a[1] * a[1]) // a[0] for a in agg.values())
    ssb = max(0, t - (s * s) // n)
    ssw = q - t
    f = (float(ssb) * float(n - k)) / (float(ssw) * float(k - 1)) \
        if k > 1 and ssw > 0 else None
    return dict(n=n, k=k, ssb_q=ssb, ssw_q=ssw, f_stat=f)


def _run_bf(spark, rows, quant=1):
    df = spark.createDataFrame(rows, "g string, v long")
    return brown_forsythe(df, "g", "v", dev_quant=quant).collect()[0] \
        .asDict()


def test_bf_random_differential(spark):
    rng = random.Random(3)
    rows = [(f"g{i % 4}", rng.randrange(-5000, 5000)) for i in range(400)]
    assert _run_bf(spark, rows) == _py_bf(rows)


def test_bf_quantized_differential(spark):
    rng = random.Random(5)
    rows = [(f"g{i % 3}", rng.randrange(0, 100_000)) for i in range(301)]
    assert _run_bf(spark, rows, quant=100) == _py_bf(rows, quant=100)


def test_bf_detects_spread_difference(spark):
    rng = random.Random(9)
    tight = [("tight", 1000 + rng.randrange(-10, 11)) for _ in range(200)]
    wide = [("wide", 1000 + rng.randrange(-2000, 2001))
            for _ in range(200)]
    got = _run_bf(spark, tight + wide)
    assert got["f_stat"] > 50  # spreads differ wildly -> huge F
    # same spread, shifted mean: BF must NOT react (medians re-center)
    shifted = [("a", v) for _, v in tight] + \
        [("b", v + 100_000) for _, v in tight]
    got2 = _run_bf(spark, shifted)
    assert got2["f_stat"] < 5


def test_bf_constant_groups_null(spark):
    rows = [("a", 5)] * 10 + [("b", 9)] * 10
    got = _run_bf(spark, rows)
    assert got["ssw_q"] == 0 and got["f_stat"] is None


# ----------------------------------------------------------- Pettitt

def _py_pettitt(vals):
    """Textbook U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), O(n^2)."""
    n = len(vals)
    best = None
    for t in range(1, n):
        u = sum((vals[i] > vals[j]) - (vals[i] < vals[j])
                for i in range(t) for j in range(t, n))
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    return dict(n=n, t_star=best[0], u_at_t=best[1],
                k_stat=abs(best[1]))


def _run_pettitt(spark, vals):
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, o long, v long")
    return pettitt_test(df, ["g"], ["o"], "v").collect()[0].asDict()


def test_pettitt_random_differential(spark):
    rng = random.Random(17)
    vals = [rng.randrange(100) for _ in range(120)]
    got = _run_pettitt(spark, vals)
    exp = _py_pettitt(vals)
    assert got["k_stat"] == exp["k_stat"]
    assert got["u_at_t"] == exp["u_at_t"]
    assert got["t_star"] == exp["t_star"]


def test_pettitt_with_ties_differential(spark):
    rng = random.Random(23)
    vals = [rng.randrange(6) for _ in range(90)]  # heavy ties
    got = _run_pettitt(spark, vals)
    exp = _py_pettitt(vals)
    assert (got["t_star"], got["u_at_t"], got["k_stat"]) == \
        (exp["t_star"], exp["u_at_t"], exp["k_stat"])


def test_pettitt_planted_shift(spark):
    rng = random.Random(31)
    vals = [rng.randrange(50) for _ in range(100)] + \
        [80 + rng.randrange(50) for _ in range(100)]
    got = _run_pettitt(spark, vals)
    assert abs(got["t_star"] - 100) <= 2  # finds the break
    assert got["k_stat"] == 100 * 100    # clean separation: max possible


def test_pettitt_constant_series(spark):
    got = _run_pettitt(spark, [7] * 20)
    assert got["k_stat"] == 0 and got["t_star"] == 1  # tie -> smallest t


def test_pettitt_group_cap_raises(spark):
    from mapbox_filter_spark.operators.rankstats import _MAX_GROUP_ROWS
    df = spark.range(_MAX_GROUP_ROWS + 1).selectExpr(
        "'g' AS g", "id AS o", "id % 97 AS v")
    with pytest.raises(Exception) as exc:
        pettitt_test(df, ["g"], ["o"], "v").collect()
    assert "exact rank bound" in str(exc.value)


# ---------------------------------------------------------- Friedman

def _py_friedman(rows):
    """rows: (block, treat, value).  Textbook tie-corrected Friedman
    over complete blocks, replayed with doubled ranks."""
    from collections import defaultdict
    blocks = defaultdict(dict)
    for b, t, v in rows:
        blocks[b][t] = v
    treats = sorted({t for _, t, _ in rows})
    k = len(treats)
    complete = {b: d for b, d in blocks.items() if len(d) == k}
    n = len(complete)
    r2sum = defaultdict(int)
    allrsq = 0
    for d in complete.values():
        vals = sorted(d.values())
        first = {}
        cnt = defaultdict(int)
        for v in vals:
            cnt[v] += 1
        r = 1
        for v in sorted(cnt):
            first[v] = r
            r += cnt[v]
        for t, v in d.items():
            r2 = 2 * first[v] + cnt[v] - 1
            r2sum[t] += r2
            allrsq += r2 * r2
    sq = sum((r2sum[t] - n * (k + 1)) ** 2 for t in treats)
    num = (k - 1) * sq
    den = allrsq - n * k * (k + 1) * (k + 1)
    q = float(num) / float(den) if den > 0 else None
    return dict(n_blocks=n, k=k, num=num, den=den, q_stat=q)


def _run_friedman(spark, rows):
    df = spark.createDataFrame(rows, "b long, t string, v long")
    return friedman_test(df, "b", "t", "v").collect()[0].asDict()


def test_friedman_random_differential(spark):
    rng = random.Random(41)
    rows = [(b, f"t{t}", rng.randrange(1000))
            for b in range(25) for t in range(4)]
    assert _run_friedman(spark, rows) == _py_friedman(rows)


def test_friedman_incomplete_blocks_excluded(spark):
    rng = random.Random(43)
    rows = [(b, f"t{t}", rng.randrange(100))
            for b in range(20) for t in range(3)]
    # two broken blocks: one missing a treatment, one duplicated row
    broken = [(100, "t0", 5), (100, "t1", 6),
              (101, "t0", 1), (101, "t1", 2), (101, "t2", 3),
              (101, "t2", 4)]
    got = _run_friedman(spark, rows + broken)
    exp = _py_friedman(rows)  # replay WITHOUT the broken blocks
    assert got["n_blocks"] == 20
    assert got == exp


def test_friedman_consistent_winner(spark):
    # treatment t2 always ranks last, t0 always first -> big Q
    rows = [r for b in range(15) for r in
            [(b, "t0", 100 + b), (b, "t1", 50 + b), (b, "t2", b)]]
    got = _run_friedman(spark, rows)
    assert got["q_stat"] == pytest.approx(30.0)  # 2*15 for k=3 perfect


def test_friedman_all_tied_null(spark):
    rows = [(b, f"t{t}", 7) for b in range(10) for t in range(3)]
    got = _run_friedman(spark, rows)
    assert got["den"] == 0 and got["q_stat"] is None
