"""Unit differentials for mann_whitney_u and benford_profile."""

import math
import random

from mapbox_filter_spark.operators.rankstats import mann_whitney_u
from mapbox_filter_spark.operators.stats import benford_profile


def _avg_ranks2(vals):
    s = sorted(vals)
    first, cnt = {}, {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def test_mann_whitney_replay(spark):
    random.seed(9)
    xs = [(True, random.randrange(0, 30) + 5) for _ in range(80)]
    xs += [(False, random.randrange(0, 30)) for _ in range(120)]
    df = spark.createDataFrame([("g", f, v) for f, v in xs],
                               "g string, f boolean, v long")
    r = mann_whitney_u(df, ["g"], "f", "v").collect()[0]
    ranks = _avg_ranks2([v for _, v in xs])
    r1x2 = sum(rk for (f, _), rk in zip(xs, ranks) if f)
    n1 = sum(1 for f, _ in xs if f)
    n2 = len(xs) - n1
    u2 = r1x2 - n1 * (n1 + 1)
    assert (r.n1, r.n2, r.u2) == (n1, n2, u2)
    assert r.rbc == 1.0 - float(u2) / float(n1 * n2)
    assert r.rbc < 0  # sample 1 shifted HIGH -> U small -> rbc negative


def test_mann_whitney_identical_samples(spark):
    rows = [("g", f, v) for f in (True, False) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    r = mann_whitney_u(df, ["g"], "f", "v").collect()[0]
    # identical distributions: U = n1*n2/2 exactly -> rbc = 0
    assert r.u2 == r.n1 * r.n2
    assert r.rbc == 0.0


def test_mann_whitney_one_empty_side(spark):
    df = spark.createDataFrame([("g", True, 1), ("g", True, 2)],
                               "g string, f boolean, v long")
    r = mann_whitney_u(df, ["g"], "f", "v").collect()[0]
    assert (r.n1, r.n2) == (2, 0) and r.rbc is None


def test_benford_counts_and_expectation(spark):
    vals = [1, 19, 123, 2, 25, 9, 94, 900, 17, 0, -5]  # 0/-5 excluded
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    got = {r.digit: r for r in
           benford_profile(df, ["g"], "v").collect()}
    assert {d: got[d].n_d for d in got} == {1: 4, 2: 2, 9: 3}
    assert all(got[d].n == 9 for d in got)
    e1 = 9.0 * (math.log(1.0 + 1.0 / 1.0) / math.log(10.0))
    assert got[1].exp_d == e1  # same pinned chain


def test_entropy_profile(spark):
    from mapbox_filter_spark.operators.stats import entropy_profile
    rows = ([("uni", c) for c in "abcd" * 5]          # uniform over 4
            + [("one", "x")] * 7                       # single category
            + [("skew", "a")] * 9 + [("skew", "b")])   # 9:1
    df = spark.createDataFrame(rows, "g string, cat string")
    got = {r.g: r for r in entropy_profile(df, ["g"], "cat").collect()}
    assert got["one"].entropy == 0.0 and got["one"].n_cats == 1
    # uniform over k: H = ln(k) via the same chain ln(n) - (k*(n/k)ln(n/k))/n
    u = got["uni"]
    assert (u.n, u.n_cats) == (20, 4)
    exp = math.log(20.0) - (4 * (5.0 * math.log(5.0))) / 20.0
    assert abs(u.entropy - exp) < 1e-14 and abs(u.entropy
                                                - math.log(4.0)) < 1e-12
    s = got["skew"]
    exp_s = math.log(10.0) - (9.0 * math.log(9.0) + 1.0 * math.log(1.0)) / 10.0
    assert abs(s.entropy - exp_s) < 1e-14


def test_benford_sub_one_values_excluded(spark):
    # 0 < v < 1 truncates to 0 — must be EXCLUDED, never a digit-0 row
    # (review finding: 1.0/digit divides by zero under ANSI)
    df = spark.createDataFrame(
        [("g", 0.42), ("g", 0.95), ("g", 7.2), ("g", 42.0)],
        "g string, v double")
    got = {r.digit: r for r in
           benford_profile(df, ["g"], "v").collect()}
    assert set(got) == {7, 4} and all(r.n == 2 for r in got.values())


def test_mann_whitney_null_rows_excluded(spark):
    # a NULL flag/value row must not occupy a pooled rank (review
    # finding: it inflated U and pushed rbc outside [-1, 1])
    rows = [("g", True, 5), ("g", False, 3), ("g", None, 1),
            ("g", True, None)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    r = mann_whitney_u(df, ["g"], "f", "v").collect()[0]
    # {5} vs {3}: r1x2 = 2*rank(5) = 4; u2 = 4 - 1*2 = 2; rbc = -1
    assert (r.n1, r.n2, r.u2, r.rbc) == (1, 1, 2, -1.0)
