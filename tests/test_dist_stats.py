"""Distribution statistics (operators/stats.py gini_profile /
chi_square_independence, operators/rankstats.py ks_2samp /
kendall_tau): brute-force python replays plus degenerate and bound
cases.  Replays use EXACT integer arithmetic so equality is ==, not
approx (the same pinned chains both engines run)."""

import math
import random

import pyspark.errors
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.rankstats import kendall_tau, ks_2samp
from mapbox_filter_spark.operators.stats import (
    chi_square_independence, gini_profile)


def _py_gini(vals):
    s = sorted(vals)
    n = len(s)
    num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(s))
    tot = sum(s)
    gini = float(num) / float(n * tot) if tot > 0 else None
    return n, tot, num, gini


def test_gini_replay(spark):
    random.seed(11)
    vals = [random.randrange(0, 5000) for _ in range(300)] + [0, 0, 7, 7]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    r = gini_profile(df, ["g"], "v").collect()[0]
    n, tot, num, gini = _py_gini(vals)
    assert (r.n, r.sum_v, r.g_num) == (n, tot, num)
    assert r.gini == gini
    assert 0.0 <= r.gini < 1.0


def test_gini_degenerate_and_negative(spark):
    rows = ([("zero", 0)] * 10 + [("one", 9)]
            + [("equal", 5)] * 40)
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r for r in gini_profile(df, ["g"], "v").collect()}
    assert got["zero"].gini is None           # all-zero -> NULL guard
    assert got["one"].gini == 0.0             # single row
    assert got["equal"].gini == 0.0           # perfect equality
    bad = spark.createDataFrame([("g", -1)], "g string, v long")
    try:
        gini_profile(bad, ["g"], "v").collect()
        raise AssertionError("negative value must raise in-plan")
    except pyspark.errors.PySparkException:
        pass


def _py_ks(pairs):
    # pairs: (flag, value); returns n1, n2, d_num
    xs = sorted({v for _, v in pairs})
    n1 = sum(1 for f, _ in pairs if f)
    n2 = sum(1 for f, _ in pairs if not f)
    d = 0
    c1 = c2 = 0
    for x in xs:
        c1 += sum(1 for f, v in pairs if f and v == x)
        c2 += sum(1 for f, v in pairs if not f and v == x)
        d = max(d, abs(n2 * c1 - n1 * c2))
    return n1, n2, d


def test_ks_replay(spark):
    random.seed(12)
    # sample 1 shifted AND widened vs sample 2 — KS must see it
    pairs = ([(True, random.randrange(50, 400)) for _ in range(180)]
             + [(False, random.randrange(0, 200)) for _ in range(220)])
    df = spark.createDataFrame([("g", f, v) for f, v in pairs],
                               "g string, f boolean, v long")
    r = ks_2samp(df, ["g"], "f", "v").collect()[0]
    n1, n2, d = _py_ks(pairs)
    assert (r.n1, r.n2, r.d_num) == (n1, n2, d)
    assert r.d_stat == float(d) / float(n1 * n2)
    assert r.d_stat > 0.3


def test_ks_identical_and_empty_side(spark):
    rows = [("same", f, v) for v in range(20) for f in (True, False)]
    rows += [("onesided", True, v) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    got = {r.g: r for r in ks_2samp(df, ["g"], "f", "v").collect()}
    assert got["same"].d_num == 0 and got["same"].d_stat == 0.0
    assert got["onesided"].d_stat is None     # empty sample 2 -> NULL


def _py_kendall(xy):
    n = len(xy)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (xy[i][0] > xy[j][0]) - (xy[i][0] < xy[j][0])
            sy = (xy[i][1] > xy[j][1]) - (xy[i][1] < xy[j][1])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    dx, dy = n0 - tx, n0 - ty
    tau = (float(c - d) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
           if dx > 0 and dy > 0 else None)
    return n, c - d, dx, dy, tau


def test_kendall_replay_with_ties(spark):
    random.seed(13)
    xy = [(random.randrange(0, 15), random.randrange(0, 15))
          for _ in range(150)]
    df = spark.createDataFrame([("g", x, y) for x, y in xy],
                               "g string, x long, y long")
    r = kendall_tau(df, ["g"], "x", "y").collect()[0]
    n, cd, dx, dy, tau = _py_kendall(xy)
    assert (r.n, r.c_minus_d, r.d_x, r.d_y) == (n, cd, dx, dy)
    assert r.tau == tau


def test_kendall_perfect_and_degenerate(spark):
    rows = ([("up", i, 2 * i) for i in range(40)]
            + [("down", i, -i) for i in range(40)]
            + [("flat", i, 3) for i in range(40)])
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in kendall_tau(df, ["g"], "x", "y").collect()}
    assert abs(got["up"].tau - 1.0) < 1e-12
    assert abs(got["down"].tau + 1.0) < 1e-12
    assert got["flat"].tau is None and got["flat"].d_y == 0


def test_kendall_group_bound_raises(spark):
    from mapbox_filter_spark.operators import rankstats
    big = spark.range(rankstats._KENDALL_MAX_GROUP_ROWS + 1).select(
        F.lit("g").alias("g"), F.col("id").alias("x"),
        (F.col("id") % 7).alias("y"))
    try:
        kendall_tau(big, ["g"], "x", "y").collect()
        raise AssertionError("expected a loud failure past the bound")
    except pyspark.errors.PySparkException:
        pass


def _py_chi2(pairs):
    from collections import Counter
    cells = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    n = len(pairs)
    acc = 0.0
    # COMPLETED grid, pinned (a, b) order: empty cells count O = 0
    for a in sorted(ra):
        for b in sorted(cb):
            o, r, c = cells.get((a, b), 0), ra[a], cb[b]
            dev = float(n * o - r * c)    # exact long -> double, then
            acc += dev * dev / (float(n) * float(r) * float(c))  # IEEE
    dof = (len(ra) - 1) * (len(cb) - 1)
    return n, len(ra), len(cb), dof, (acc if dof > 0 else None)


def test_chi_square_replay(spark):
    random.seed(14)
    # dependent columns: b correlates with a
    pairs = [(f"a{i % 3}", (i % 3) * 2 + random.randrange(0, 3))
             for i in range(400)]
    df = spark.createDataFrame([(a, b) for a, b in pairs],
                               "a string, b long")
    r = chi_square_independence(df, "a", "b").collect()[0]
    n, na, nb, dof, chi2 = _py_chi2(pairs)
    assert (r.n, r.n_a, r.n_b, r.dof) == (n, na, nb, dof)
    assert r.chi2 == chi2
    assert r.chi2 > 100.0                 # strong dependence planted


def test_chi_square_constant_column(spark):
    df = spark.createDataFrame([("x", i % 4) for i in range(40)],
                               "a string, b long")
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r.dof == 0 and r.chi2 is None


def test_cents_spelling_tripwire():
    """Every SQL-side cents quantizer must be the one canonical
    spelling (_CENTS_SQL or the legacy ROUND twin, which is
    value-equal for the non-negative corpus) — a drifted copy would
    silently split a value-hash gate."""
    import pathlib
    import re

    import mapbox_filter_spark
    from mapbox_filter_spark.queries_curation import _CENTS_SQL

    root = pathlib.Path(mapbox_filter_spark.__file__).parent
    ok = {_CENTS_SQL,
          "CAST(ROUND(value * 100) AS BIGINT)",
          "CAST(ROUND(value * 100, 0) AS BIGINT)"}
    pat = re.compile(r"CAST\((?:floor|ROUND)\(value \* 100[^)]*\)[^)]*\)")
    bad = []
    for p in sorted(root.glob("queries*.py")):
        for m in pat.finditer(p.read_text()):
            if m.group(0) not in ok:
                bad.append((p.name, m.group(0)))
    assert not bad, f"drifted cents spellings: {bad}"


def test_rank_percentiles_duplicate_qs_rejected(spark):
    import pytest

    from mapbox_filter_spark.operators.stats import rank_percentiles
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError, match="duplicate"):
        rank_percentiles(df, ["g"], "v", qs=(50, 50))
