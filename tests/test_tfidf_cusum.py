"""Unit differentials for tfidf_topk and cusum_changepoint."""

import math
import random

from mapbox_filter_spark.operators.retrieval import tfidf_topk
from mapbox_filter_spark.operators.temporal import cusum_changepoint


def test_tfidf_small(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "cherry cherry cherry common")],
        "doc_id long, text string")
    got = {(r.doc_id, r.rk): (r.term, r.tf, r.df_) for r in
           tfidf_topk(docs, k=2).collect()}
    # doc 1: apple tf=2 df=1 -> 2*ln(3) tops; banana tf=1 df=2 next
    assert got[(1, 1)] == ("apple", 2, 1)
    assert got[(1, 2)] == ("banana", 1, 2)
    # doc 3: cherry tf=3 df=2 -> 3*ln(1.5); 'common' df=3 scores 0
    assert got[(3, 1)] == ("cherry", 3, 2)
    assert got[(3, 2)] == ("common", 1, 3)
    r1 = [r for r in tfidf_topk(docs, k=2).collect()
          if r.doc_id == 1 and r.rk == 1][0]
    # JVM Math.log vs python libm can differ by 1 ulp (the gate's
    # engine<->DuckDB bit-match is what matters; python is a 3rd libm)
    assert abs(r1.score - 2.0 * math.log(3.0)) < 1e-14


def _py_cusum(vals):
    n, tot = len(vals), sum(vals)
    best = None
    pfx = 0
    for i, v in enumerate(vals, start=1):
        pfx += v
        s = n * pfx - i * tot
        if best is None or abs(s) > abs(best[1]):
            best = (i, s)
    return n, best[0], best[1], tot


def test_cusum_replay(spark):
    random.seed(13)
    rows = []
    expect = {}
    for k in range(8):
        # planted level shift at a random index
        cut = random.randrange(5, 45)
        vals = [random.randrange(0, 20) for _ in range(cut)] + \
               [random.randrange(40, 60) for _ in range(50 - cut)]
        expect[k] = _py_cusum(vals)
        rows += [(k, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    got = {r.k: (r.n, r.cp_idx, r.cp_stat, r.total) for r in
           cusum_changepoint(df, ["k"], order_cols=("t",),
                             value_col="v").collect()}
    assert got == expect


def test_cusum_constant_series(spark):
    df = spark.createDataFrame([(1, i, 5) for i in range(10)],
                               "k long, t long, v long")
    r = cusum_changepoint(df, ["k"], order_cols=("t",),
                          value_col="v").collect()[0]
    # uniform rate: S' == 0 everywhere -> tie -> smallest index
    assert (r.cp_idx, r.cp_stat) == (1, 0)
