"""Session-11 survival operators (operators/stats.py logrank_test,
concordance_index): brute-force python replays over random subject
tables, plus degenerate and bound cases.  The python replays mirror
the pinned IEEE chains (per-time divides summed in dur order), so
comparisons are exact where the chain is reproduced and approx
elsewhere."""

import math
import random

import pytest

from mapbox_filter_spark.operators.stats import (concordance_index,
                                                 logrank_test)


def _py_logrank(subjects):
    """subjects: (flag, dur, event).  Returns (n1, n0, o1, e1, v, chi2)
    with the operator's exact O and per-time pinned divides summed in
    dur order."""
    n1 = sum(1 for f, _, _ in subjects if f)
    n0 = len(subjects) - n1
    at1, at0 = n1, n0
    o1 = 0
    e1 = 0.0
    v = 0.0
    by_dur = {}
    for f, t, ev in subjects:
        rec = by_dur.setdefault(t, [0, 0, 0, 0])  # d1 d0 c1 c0
        idx = (0 if ev else 2) + (0 if f else 1)
        rec[idx] += 1
    for t in sorted(by_dur):
        d1, d0, c1, c0 = by_dur[t]
        rn1, rn0 = at1, at0
        n = rn1 + rn0
        d = d1 + d0
        if d >= 1:
            o1 += d1
            e1 += float(d * rn1) / float(n)
            if n > 1:
                v += (float(d * rn1 * rn0 * (n - d))
                      / float(n * n * (n - 1)))
        at1 -= d1 + c1
        at0 -= d0 + c0
    diff = float(o1) - e1
    chi2 = diff * diff / v if v > 0.0 else None
    return n1, n0, o1, e1, v, chi2


def _py_cindex(subjects):
    """subjects: (dur, event, score).  Returns (n_pairs, units2, c)."""
    n_pairs = 0
    units2 = 0
    for ti, evi, si in subjects:
        if not evi:
            continue
        for tj, _evj, sj in subjects:
            if ti < tj:
                n_pairs += 1
                if si > sj:
                    units2 += 2
                elif si == sj:
                    units2 += 1
    c = units2 / (2.0 * n_pairs) if n_pairs else None
    return n_pairs, units2, c


def _subjects_df(spark, rows):
    return spark.createDataFrame(
        rows, "g string, flag boolean, dur long, event int, score long")


def test_logrank_random_differential(spark):
    rng = random.Random(411)
    rows = [("a", rng.random() < 0.5, rng.randrange(0, 40),
             int(rng.random() < 0.7), 0) for _ in range(300)]
    out = logrank_test(_subjects_df(spark, rows), ["g"], "flag").collect()
    assert len(out) == 1
    r = out[0]
    n1, n0, o1, e1, v, chi2 = _py_logrank(
        [(f, t, ev) for _, f, t, ev, _ in rows])
    assert (r["n1_subj"], r["n0_subj"], r["o1"]) == (n1, n0, o1)
    # the spark fold and the python loop run the identical add order
    assert r["e1"] == pytest.approx(e1, abs=1e-12)
    assert r["v"] == pytest.approx(v, abs=1e-12)
    assert r["chi2"] == pytest.approx(chi2, rel=1e-12)


def test_logrank_identical_arms_chi2_zero(spark):
    # the two arms are copies: O = E exactly at every time, chi2 == 0
    base = [(t, ev) for t in range(10) for ev in (1, 1, 0)]
    rows = ([("a", True, t, ev, 0) for t, ev in base]
            + [("a", False, t, ev, 0) for t, ev in base])
    r = logrank_test(_subjects_df(spark, rows), ["g"], "flag").collect()[0]
    assert r["o1"] == pytest.approx(r["e1"])
    assert r["chi2"] == pytest.approx(0.0, abs=1e-18)


def test_logrank_no_events_null_chi2(spark):
    rows = [("a", i % 2 == 0, i, 0, 0) for i in range(8)]
    out = logrank_test(_subjects_df(spark, rows), ["g"], "flag").collect()
    # every subject censored: no event times survive the d >= 1 filter
    assert out == []


def test_logrank_separated_arms_large_chi2(spark):
    # treatment dies early, control late: strongly significant
    rows = ([("a", True, t, 1, 0) for t in range(1, 21)]
            + [("a", False, t, 1, 0) for t in range(100, 120)])
    r = logrank_test(_subjects_df(spark, rows), ["g"], "flag").collect()[0]
    assert r["chi2"] > 20.0


def test_cindex_random_differential(spark):
    rng = random.Random(412)
    rows = [("a", False, rng.randrange(0, 30),
             int(rng.random() < 0.6), rng.randrange(0, 6))
            for _ in range(150)]
    r = concordance_index(
        _subjects_df(spark, rows), ["g"], "score").collect()[0]
    n_pairs, units2, c = _py_cindex(
        [(t, ev, s) for _, _, t, ev, s in rows])
    assert (r["n_pairs"], r["units2"]) == (n_pairs, units2)
    assert r["c_index"] == pytest.approx(c, rel=1e-15)
    assert r["n_subj"] == 150


def test_cindex_perfect_and_inverted(spark):
    # score strictly decreasing in duration => perfect concordance
    rows = [("a", False, t, 1, 100 - t) for t in range(20)]
    r = concordance_index(
        _subjects_df(spark, rows), ["g"], "score").collect()[0]
    assert r["c_index"] == 1.0
    rows = [("a", False, t, 1, t) for t in range(20)]
    r = concordance_index(
        _subjects_df(spark, rows), ["g"], "score").collect()[0]
    assert r["c_index"] == 0.0


def test_cindex_all_ties_half(spark):
    rows = [("a", False, t, 1, 7) for t in range(10)]
    r = concordance_index(
        _subjects_df(spark, rows), ["g"], "score").collect()[0]
    assert r["c_index"] == 0.5


def test_cindex_no_comparable_pairs_empty(spark):
    # all subjects share one duration: strict t_i < t_j never holds
    rows = [("a", False, 5, 1, i) for i in range(6)]
    out = concordance_index(
        _subjects_df(spark, rows), ["g"], "score").collect()
    assert out == []


def test_cindex_group_bound_raises(spark):
    from mapbox_filter_spark.operators import stats as stats_mod
    rows = [("a", False, i, 1, i) for i in range(30)]
    df = _subjects_df(spark, rows)
    old = stats_mod._CINDEX_MAX_GROUP_ROWS
    # the bound is baked into the plan at build time via the module
    # constant; rebuild the plan under a tiny bound
    try:
        stats_mod._CINDEX_MAX_GROUP_ROWS = 10
        with pytest.raises(Exception, match="pair-join bound"):
            concordance_index(df, ["g"], "score").collect()
    finally:
        stats_mod._CINDEX_MAX_GROUP_ROWS = old
