"""Unit differentials for cooccurrence_pmi (operators/cooccur.py) and
ema_final (operators/ema.py)."""

import math

import pytest

from mapbox_filter_spark.operators.cooccur import cooccurrence_pmi
from mapbox_filter_spark.operators.ema import ema_final


def test_cooccur_counts_and_pmi(spark):
    docs = spark.createDataFrame(
        [(1, "red fox red dog"), (2, "red fox cat"), (3, "fox dog")],
        "doc_id long, text string")
    res = {(r.w_a, r.w_b): r for r in
           cooccurrence_pmi(docs, "doc_id", "text").collect()}
    # repeated token in doc 1 counts once (distinct pre-pass)
    r = res[("fox", "red")]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 2)
    assert r.pmi == pytest.approx(math.log(2 * 3 / (3 * 2)))
    r = res[("dog", "fox")]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 2, 3)
    # short tokens dropped entirely ('a' never appears)
    docs2 = spark.createDataFrame([(1, "a bb ccc ddd"), (2, "ccc ddd")],
                                  "doc_id long, text string")
    res2 = {(r.w_a, r.w_b) for r in
            cooccurrence_pmi(docs2, "doc_id", "text").collect()}
    assert res2 == {("ccc", "ddd")}


def test_cooccur_min_count(spark):
    docs = spark.createDataFrame(
        [(i, "aaa bbb") for i in range(5)] + [(9, "aaa ccc")],
        "doc_id long, text string")
    res = {(r.w_a, r.w_b): r.n_ab for r in
           cooccurrence_pmi(docs, "doc_id", "text",
                            min_count=2).collect()}
    assert res == {("aaa", "bbb"): 5}


def test_ema_fold_order_and_singleton(spark):
    rows = [(1, 2, 15.0), (1, 0, 10.0), (1, 1, 20.0), (2, 0, 7.0)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    got = {r.k: (r.n_obs, r.ema) for r in
           ema_final(df, "k", ("t",), "v",
                     alpha_num=1, alpha_den=4).collect()}
    acc = 10.0
    for v in (20.0, 15.0):          # time order, not insertion order
        acc = acc + 0.25 * (v - acc)
    assert got[1] == (3, acc)
    assert got[2] == (1, 7.0)


def test_ema_validation(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError, match="power of two"):
        ema_final(df, "k", ("t",), "v", alpha_num=1, alpha_den=3)
    with pytest.raises(ValueError, match="alpha"):
        ema_final(df, "k", ("t",), "v", alpha_num=0, alpha_den=8)
