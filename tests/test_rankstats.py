"""Spearman correlation (operators/rankstats.py): python replay with
tie-corrected ranks, and the canonical ±1 / degenerate cases."""

import math
import random

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.rankstats import spearman_corr


def _avg_ranks2(vals):
    # doubled average ranks, matching 2*RANK() + tiecount - 1
    s = sorted(vals)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
    cnt = {}
    for v in s:
        cnt[v] = cnt.get(v, 0) + 1
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def _py_spearman(xs, ys):
    rx, ry = _avg_ranks2(xs), _avg_ranks2(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    rho = (float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
           if dx > 0 and dy > 0 else None)
    return n, num, dx, dy, rho


def test_replay_with_ties(spark):
    random.seed(5)
    xs = [random.randrange(0, 20) for _ in range(200)]   # heavy ties
    ys = [x * 3 + random.randrange(-10, 10) for x in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)],
        "g string, x long, y long")
    r = spearman_corr(df, ["g"], "x", "y").collect()[0]
    n, num, dx, dy, rho = _py_spearman(xs, ys)
    assert (r.n, r.s_num, r.d_x, r.d_y) == (n, num, dx, dy)
    assert r.rho == rho        # same IEEE chain -> exact equality
    assert 0.5 < r.rho <= 1.0  # strongly monotone by construction


def test_perfect_and_degenerate(spark):
    rows = ([("up", i, 10 * i) for i in range(50)]
            + [("down", i, -i) for i in range(50)]
            + [("flat", i, 7) for i in range(50)])
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in spearman_corr(df, ["g"], "x", "y").collect()}
    # the pinned chain num/(sqrt(d)*sqrt(d)) is 1 - 1ulp, not 1.0 — the
    # same value the oracle's identical chain produces
    up = got["up"]
    assert up.rho == float(up.s_num) / (math.sqrt(float(up.d_x))
                                        * math.sqrt(float(up.d_y)))
    assert abs(up.rho - 1.0) < 1e-12 and up.s_num == up.d_x == up.d_y
    down = got["down"]
    assert abs(down.rho + 1.0) < 1e-12 and down.s_num == -down.d_x
    assert got["flat"].rho is None and got["flat"].d_y == 0


def test_group_bound_raises(spark):
    # 38,001 rows in one group must fail loudly (raise_error branch or
    # ANSI overflow upstream), never wrap silently
    import pyspark.errors

    from mapbox_filter_spark.operators import rankstats
    big = spark.range(rankstats._MAX_GROUP_ROWS + 1).select(
        F.lit("g").alias("g"), F.col("id").alias("x"),
        (F.col("id") % 97).alias("y"))
    try:
        rankstats.spearman_corr(big, ["g"], "x", "y").collect()
        raise AssertionError("expected a loud failure past the bound")
    except pyspark.errors.PySparkException:
        pass
