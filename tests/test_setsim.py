"""Prefix-filtered set-similarity join (operators/setsim.py): brute
differential (completeness of the prefix filter) and edge cases."""

import random

import pytest

from mapbox_filter_spark.operators.setsim import set_similarity_join


def _brute(sets, num, den):
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and (den + num) * inter >= num * (len(sets[a])
                                                       + len(sets[b])):
                out[(a, b)] = (inter, len(sets[a] | sets[b]))
    return out


def _run(spark, sets, num, den):
    rows = [(sid, t) for sid, toks in sets.items() for t in toks]
    df = spark.createDataFrame(rows, "sid long, tok long")
    res = set_similarity_join(df, "sid", "tok", num, den)
    return {(r.id_a, r.id_b): (r.n_inter, r.n_union) for r in res.collect()}


def test_brute_differential(spark):
    # skewed token frequencies: a few stopword-like tokens in most sets,
    # a long tail of rare ones — the regime prefix filtering exists for
    random.seed(11)
    sets = {}
    for sid in range(60):
        toks = {t for t in range(5) if random.random() < 0.8}
        toks |= {random.randrange(5, 200) for _ in range(random.randrange(3, 12))}
        sets[sid] = toks
    for num, den in [(1, 2), (2, 3), (1, 4)]:
        assert _run(spark, sets, num, den) == _brute(sets, num, den), \
            (num, den)


def test_exact_duplicates_at_tau_one(spark):
    sets = {1: {10, 20, 30}, 2: {10, 20, 30}, 3: {10, 20, 31}, 4: {99}}
    got = _run(spark, sets, 1, 1)
    assert got == {(1, 2): (3, 3)}


def test_disjoint_and_subset(spark):
    sets = {1: {1, 2, 3, 4}, 2: {5, 6, 7, 8}, 3: {1, 2}}
    # J(1,3) = 2/4 = 0.5 — inclusive threshold keeps it
    got = _run(spark, sets, 1, 2)
    assert got == {(1, 3): (2, 4)}


def test_duplicate_rows_deduplicated(spark):
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 10), (2, 20)]
    df = spark.createDataFrame(rows, "sid long, tok long")
    res = set_similarity_join(df, "sid", "tok", 1, 1).collect()
    assert len(res) == 1 and res[0].n_inter == 2 and res[0].n_union == 2


def test_tau_validation(spark):
    df = spark.createDataFrame([(1, 1)], "sid long, tok long")
    with pytest.raises(ValueError):
        set_similarity_join(df, "sid", "tok", 3, 2)
    with pytest.raises(ValueError):
        set_similarity_join(df, "sid", "tok", 0, 2)
