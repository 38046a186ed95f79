"""autocorr (operators/temporal.py) and assoc_rules
(operators/cooccur.py): python replays with the same pinned fold
order, plus planted-pattern sanity."""

import random

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.cooccur import assoc_rules
from mapbox_filter_spark.operators.temporal import autocorr


def _py_acf(xs, lags):
    n = len(xs)
    s = sum(xs)
    z = [n * x - s for x in xs]
    den = 0.0
    for v in z:                      # index order — the pinned fold
        den += float(v) * float(v)
    out = {}
    for L in lags:
        num, np_ = 0.0, 0
        for i in range(L, n):
            num += float(z[i]) * float(z[i - L])
            np_ += 1
        out[L] = (np_, num / den if np_ > 0 and den > 0.0 else None)
    return out


def _ts(spark, xs):
    return spark.createDataFrame(
        [("g", i, 0, x) for i, x in enumerate(xs)],
        "g string, t long, e long, x long")


def test_autocorr_replay(spark):
    random.seed(61)
    xs = [random.randrange(0, 1000) for _ in range(300)]
    got = {r.lag: r for r in
           autocorr(_ts(spark, xs), ["g"], order_cols=("t", "e"),
                    value_col="x", lags=(1, 2, 3)).collect()}
    exp = _py_acf(xs, (1, 2, 3))
    for L in (1, 2, 3):
        np_, acf = exp[L]
        assert got[L].n == 300 and got[L].n_pairs == np_
        assert got[L].acf == acf           # same IEEE fold order


def test_autocorr_patterns(spark):
    # alternating series: acf(1) near -1, acf(2) near +1
    alt = [10 if i % 2 == 0 else 20 for i in range(200)]
    got = {r.lag: r.acf for r in
           autocorr(_ts(spark, alt), ["g"], order_cols=("t", "e"),
                    value_col="x", lags=(1, 2)).collect()}
    assert got[1] < -0.95 and got[2] > 0.95
    # constant series -> NULL; 1-row series -> no pairs -> NULL
    const = autocorr(_ts(spark, [7] * 50), ["g"], order_cols=("t", "e"),
                     value_col="x", lags=(1,)).collect()[0]
    assert const.acf is None
    single = autocorr(_ts(spark, [3]), ["g"], order_cols=("t", "e"),
                      value_col="x", lags=(1,)).collect()[0]
    assert single.n_pairs == 0 and single.acf is None


def test_assoc_rules_replay(spark):
    # baskets: {A,B} x30, {A} x10, {B,C} x10, {C} x50
    rows = []
    bid = 0
    for items, k in ((["A", "B"], 30), (["A"], 10),
                     (["B", "C"], 10), (["C"], 50)):
        for _ in range(k):
            for it in items:
                rows.append((bid, it))
                rows.append((bid, it))   # duplicates must not inflate
            bid += 1
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {(r.ant, r.cons): r for r in
           assoc_rules(df, "bk", "it").collect()}
    n, ca, cb, cc = 100, 40, 40, 60
    ab = got[("A", "B")]
    assert (ab.n_baskets, ab.c_a, ab.c_b, ab.c_ab) == (n, ca, cb, 30)
    assert ab.conf == 30.0 / 40.0
    assert ab.lift == float(n * 30) / float(ca * cb)
    bc = got[("B", "C")]
    assert bc.c_ab == 10 and bc.conf == 10.0 / 40.0
    assert bc.lift == float(n * 10) / float(cb * cc)  # < 1: disassoc
    assert bc.lift < 1.0 < ab.lift
    assert ("A", "C") not in got          # never co-occur
    # symmetry of c_ab, asymmetry of confidence
    assert got[("C", "B")].c_ab == 10
    assert got[("C", "B")].conf == 10.0 / 60.0
