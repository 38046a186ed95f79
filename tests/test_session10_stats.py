"""Session-10 statistics operators (operators/rankstats.py
kruskal_wallis, operators/stats.py jarque_bera): brute-force python
replays plus degenerate and bound cases.  Replays mirror the same
pinned IEEE chains the engines run, so equality is == where the chain
is reproduced exactly and approx only where python's evaluation order
differs."""

import random

import pyspark.errors
import pytest

from mapbox_filter_spark.operators.rankstats import kruskal_wallis
from mapbox_filter_spark.operators.stats import jarque_bera


def _py_kruskal(rows):
    """rows: (group, value).  Returns (n, k, tie_sum, h, h_c) with the
    SAME doubled-rank / pinned-chain arithmetic as the operator."""
    vals = sorted(v for _, v in rows)
    n = len(rows)
    # doubled tie-corrected rank per value
    from collections import Counter
    cnt = Counter(vals)
    first_rank = {}
    r = 1
    for v in sorted(cnt):
        first_rank[v] = r
        r += cnt[v]
    r2 = {v: 2 * first_rank[v] + cnt[v] - 1 for v in cnt}
    groups = {}
    for g, v in rows:
        acc = groups.setdefault(g, [0, 0])
        acc[0] += 1
        acc[1] += r2[v]
    k = len(groups)
    tie_sum = sum(t ** 3 - t for t in cnt.values())
    fold = 0.0
    for g in sorted(groups):
        n_g, r2_g = groups[g]
        fold += (float(r2_g) * float(r2_g)) / float(n_g)
    h = 3.0 * fold / (float(n) * (float(n) + 1.0)) \
        - 3.0 * (float(n) + 1.0)
    n3n = n ** 3 - n
    h_c = None
    if k >= 2 and n > 1 and n3n > tie_sum:
        h_c = h / (1.0 - float(tie_sum) / float(n3n))
    return n, k, tie_sum, h, h_c


def test_kruskal_replay(spark):
    random.seed(23)
    rows = [("a", random.randrange(0, 40)) for _ in range(120)] + \
           [("b", random.randrange(10, 60)) for _ in range(90)] + \
           [("c", random.randrange(0, 25)) for _ in range(70)]
    df = spark.createDataFrame([("p", g, v) for g, v in rows],
                               "p string, g string, v long")
    r = kruskal_wallis(df, ["p"], "g", "v").collect()[0]
    n, k, tie_sum, h, h_c = _py_kruskal(rows)
    assert (r.n, r.k, r.tie_sum) == (n, k, tie_sum)
    assert r.h == pytest.approx(h, rel=1e-12)
    assert r.h_c == pytest.approx(h_c, rel=1e-12)
    assert r.h_c > 0.0            # real separation between the groups


def test_kruskal_matches_scipy_formula_no_ties(spark):
    # distinct values: h == h_c and matches the textbook
    # 12/(N(N+1)) ΣR²/n − 3(N+1) computed from plain ranks
    rows = [("a", v) for v in (1, 3, 5, 9)] + \
           [("b", v) for v in (2, 4, 6)] + \
           [("c", v) for v in (7, 8, 10, 11, 12)]
    df = spark.createDataFrame([("p", g, v) for g, v in rows],
                               "p string, g string, v long")
    r = kruskal_wallis(df, ["p"], "g", "v").collect()[0]
    ranks = {v: i + 1 for i, v in
             enumerate(sorted(v for _, v in rows))}
    n = len(rows)
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(ranks[v])
    h_ref = 12.0 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in by_g.values()) - 3 * (n + 1)
    assert r.tie_sum == 0
    assert r.h == pytest.approx(h_ref, rel=1e-12)
    assert r.h_c == pytest.approx(r.h)


def test_kruskal_degenerate(spark):
    # single group -> NULL; all-tied values -> correction hits 0 -> NULL
    one = spark.createDataFrame([("p", "a", v) for v in (1, 2, 3)],
                                "p string, g string, v long")
    r = kruskal_wallis(one, ["p"], "g", "v").collect()[0]
    assert r.h is None and r.h_c is None
    tied = spark.createDataFrame(
        [("p", g, 7) for g in ("a", "b", "a", "b")],
        "p string, g string, v long")
    r = kruskal_wallis(tied, ["p"], "g", "v").collect()[0]
    assert r.h is not None and r.h_c is None   # 0/0 correction guarded


def _py_jb(vals):
    n = len(vals)
    a = sum(vals) // n if sum(vals) >= 0 else -((-sum(vals)) // n)
    ds = [v - a for v in vals]
    d1 = sum(ds)
    d2 = sum(d * d for d in ds)
    d3 = sum(d ** 3 for d in ds)
    d4 = sum(d ** 4 for d in ds)
    nd = float(n)
    delta = float(d1) / nd
    m2 = float(d2) / nd - delta * delta
    m3 = (float(d3) / nd - 3.0 * delta * (float(d2) / nd)
          + 2.0 * delta * delta * delta)
    m4 = (float(d4) / nd - 4.0 * delta * (float(d3) / nd)
          + 6.0 * delta * delta * (float(d2) / nd)
          - 3.0 * delta * delta * delta * delta)
    import math
    g1 = m3 / (m2 * math.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    jb = nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    return n, g1, g2, jb


def test_jarque_bera_replay(spark):
    random.seed(31)
    vals = [random.randrange(0, 50_000) for _ in range(400)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    r = jarque_bera(df, ["g"], "v").collect()[0]
    n, g1, g2, jb = _py_jb(vals)
    assert r.n == n
    assert r.g1 == pytest.approx(g1, rel=1e-12)
    assert r.g2 == pytest.approx(g2, rel=1e-12)
    assert r.jb == pytest.approx(jb, rel=1e-12)


def test_jarque_bera_skewed_vs_symmetric(spark):
    # a heavy right tail must push g1 well positive; a symmetric
    # sample stays near 0 — sign sanity, not just replay
    sym = [("s", v) for v in range(-100, 101)]
    skw = [("k", v) for v in ([0] * 180 + [1000] * 20)]
    df = spark.createDataFrame(sym + skw, "g string, v long")
    got = {r.g: r for r in jarque_bera(df, ["g"], "v").collect()}
    assert abs(got["s"].g1) < 1e-9
    assert got["k"].g1 > 1.0
    assert got["k"].jb > got["s"].jb


def test_jarque_bera_degenerate_and_bound(spark):
    const = spark.createDataFrame([("g", 5)] * 10, "g string, v long")
    r = jarque_bera(const, ["g"], "v").collect()[0]
    assert r.g1 is None and r.g2 is None and r.jb is None
    single = spark.createDataFrame([("g", 5)], "g string, v long")
    r = jarque_bera(single, ["g"], "v").collect()[0]
    assert r.jb is None
    # |x − anchor| > 1e6 must raise in-plan, never wrap
    wide = spark.createDataFrame([("g", 0), ("g", 10_000_000)],
                                 "g string, v long")
    with pytest.raises(pyspark.errors.PySparkException):
        jarque_bera(wide, ["g"], "v").collect()


def test_kruskal_negative_values_ok(spark):
    # rank statistics are order-only: negatives need no guard
    df = spark.createDataFrame(
        [("p", "a", -5), ("p", "a", -1), ("p", "b", 2), ("p", "b", 7)],
        "p string, g string, v long")
    r = kruskal_wallis(df, ["p"], "g", "v").collect()[0]
    assert r.n == 4 and r.k == 2 and r.h is not None
