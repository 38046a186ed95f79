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


# ---------------------------------------------------------------- block 2
from mapbox_filter_spark.operators.stats import (cochran_q, mcnemar_test,
                                                 mood_median)


def test_mcnemar_differential(spark):
    rng = random.Random(421)
    rows = [("a", rng.random() < 0.5, rng.random() < 0.4)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    r = mcnemar_test(df, ["g"], "a", "b").collect()[0]
    b01 = sum(1 for _, a, b in rows if a and not b)
    b10 = sum(1 for _, a, b in rows if not a and b)
    assert (r["n"], r["b01"], r["b10"]) == (200, b01, b10)
    assert r["chi2"] == pytest.approx(
        (b01 - b10) ** 2 / (b01 + b10), rel=1e-15)


def test_mcnemar_no_discordant_null(spark):
    rows = [("a", True, True), ("a", False, False)] * 5
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    r = mcnemar_test(df, ["g"], "a", "b").collect()[0]
    assert r["chi2"] is None and r["b01"] == 0 and r["b10"] == 0


def _py_cochran(pres):
    """pres: set of (block, treat).  Returns (n_blocks, k, t, num,
    den, q)."""
    from collections import Counter
    cj = Counter(t for _, t in pres)
    ri = Counter(b for b, _ in pres)
    k = len(cj)
    t = len(pres)
    num = (k - 1) * (k * sum(c * c for c in cj.values()) - t * t)
    den = k * t - sum(r * r for r in ri.values())
    q = num / den if den > 0 else None
    return len(ri), k, t, num, den, q


def test_cochran_differential(spark):
    rng = random.Random(422)
    pres = {(b, t) for b in range(40) for t in "ABCD"
            if rng.random() < 0.3 + 0.15 * (ord(t) - ord("A"))}
    rows = [("g", b, t) for b, t in pres] + [("g", 0, "A")]  # dup row
    df = spark.createDataFrame(rows, "g string, blk long, trt string")
    pres = pres | {(0, "A")}
    r = cochran_q(df, ["g"], "blk", "trt").collect()[0]
    n_blocks, k, t, num, den, q = _py_cochran(pres)
    assert (r["n_blocks"], r["k"], r["t"]) == (n_blocks, k, t)
    assert (r["num"], r["den"]) == (num, den)
    assert r["q_stat"] == pytest.approx(q, rel=1e-15)


def test_cochran_all_ones_invariant(spark):
    # adding an all-1 block must not change Q (documented invariance)
    pres = [(0, "A"), (0, "B"), (1, "A"), (2, "B"), (2, "C"), (3, "C")]
    base = [("g", b, t) for b, t in pres]
    full = base + [("g", 9, t) for t in "ABC"]
    df1 = spark.createDataFrame(base, "g string, blk long, trt string")
    df2 = spark.createDataFrame(full, "g string, blk long, trt string")
    q1 = cochran_q(df1, ["g"], "blk", "trt").collect()[0]["q_stat"]
    q2 = cochran_q(df2, ["g"], "blk", "trt").collect()[0]["q_stat"]
    assert q1 == pytest.approx(q2, rel=1e-12)


def test_mood_median_differential(spark):
    rng = random.Random(423)
    rows = ([("s1", rng.randrange(0, 50)) for _ in range(101)]
            + [("s2", rng.randrange(20, 80)) for _ in range(97)])
    df = spark.createDataFrame(rows, "s string, v long")
    r = mood_median(df, "s", "v").collect()[0]
    vals = sorted(v for _, v in rows)
    med = vals[(len(vals) + 1) // 2 - 1]  # lower median
    assert r["median"] == med
    # brute chi-square on the 2x2 table with the same pinned chain
    cells = {}
    for s, v in rows:
        key = (s, 1 if v > med else 0)
        cells[key] = cells.get(key, 0) + 1
    n = len(rows)
    rtot = {s: sum(c for (ss, _), c in cells.items() if ss == s)
            for s in ("s1", "s2")}
    ctot = {a: sum(c for (_, aa), c in cells.items() if aa == a)
            for a in (0, 1)}
    chi = 0.0
    for key in sorted(cells):
        s, a = key
        o = cells[key]
        dev = float(n * o - rtot[s] * ctot[a])
        chi += dev * dev / (float(n) * float(rtot[s]) * float(ctot[a]))
    assert r["chi2"] == pytest.approx(chi, rel=1e-12)
    assert r["n"] == n and r["n_samples"] == 2 and r["dof"] == 1


def test_mood_median_even_n_lower_median(spark):
    rows = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (5, 6)]
    r = mood_median(spark.createDataFrame(rows, "s string, v long"),
                    "s", "v").collect()[0]
    assert r["median"] == 3  # lower median of 6 values


# ---------------------------------------------------------------- block 3
from mapbox_filter_spark.operators.graph import adamic_adar, rich_club


def _rand_graph(rng, n=30, m=70):
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((max(a, b), min(a, b)))
    return sorted(edges)


def test_adamic_adar_differential(spark):
    rng = random.Random(431)
    edges = _rand_graph(rng)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r["u"], r["v"]): (r["n_common"], r["aa"])
           for r in adamic_adar(df).collect()}
    # brute: neighborhoods + existing-edge exclusion
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expected = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (max(u, v), min(u, v)) in edges:
                continue
            common = sorted(nbrs[u] & nbrs[v])
            if not common:
                continue
            aa = 0.0
            for w in common:
                aa += 1.0 / math.log(float(len(nbrs[w])))
            expected[(u, v)] = (len(common), aa)
    assert set(out) == set(expected)
    for k in expected:
        assert out[k][0] == expected[k][0]
        assert out[k][1] == pytest.approx(expected[k][1], rel=1e-12)


def test_adamic_adar_weights_rare_neighbors_higher(spark):
    # hub (deg 4) vs rare (deg 2) shared neighbor: AA must rank the
    # rare-neighbor pair higher while raw common-count ties them
    edges = [(10, 1), (10, 2), (10, 3), (10, 4),  # hub 10
             (20, 5), (20, 6)]                    # rare 20
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {(r["u"], r["v"]): r["aa"] for r in adamic_adar(df).collect()}
    assert rows[(5, 6)] > rows[(1, 2)]


def test_rich_club_differential(spark):
    rng = random.Random(432)
    edges = _rand_graph(rng, n=25, m=60)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
           for r in rich_club(df, ks=(1, 2, 3, 4, 6)).collect()}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (1, 2, 3, 4, 6):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        phi = (2.0 * ek) / (nk * (nk - 1)) if nk >= 2 else None
        assert out[k][0] == nk and out[k][1] == ek
        if phi is None:
            assert out[k][2] is None
        else:
            assert out[k][2] == pytest.approx(phi, rel=1e-15)


def test_rich_club_empty_club(spark):
    edges = [(1, 0), (2, 0)]  # max degree 2
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: r for r in rich_club(df, ks=(5,)).collect()}
    assert out[5]["n_nodes"] == 0 and out[5]["n_edges"] == 0
    assert out[5]["phi"] is None


# ---------------------------------------------------------------- block 4
from mapbox_filter_spark.operators.ml import calibration_bins, decision_stump


def _py_stump(rows, feats):
    """rows: dicts with feature values + 'y'.  Returns {feature:
    (thr, n_left, pos_left, n_right, pos_right, gini_split,
    gini_root)} with the operator's pinned chain."""
    out = {}
    for f in feats:
        from collections import Counter
        cnt, pos = Counter(), Counter()
        for r in rows:
            cnt[r[f]] += 1
            pos[r[f]] += r["y"]
        n = sum(cnt.values())
        ptot = sum(pos.values())
        xs = sorted(cnt)
        best = None
        nl = pl = 0
        for x in xs[:-1]:
            nl += cnt[x]
            pl += pos[x]
            nr, pr = n - nl, ptot - pl
            s = (float(pl * pl + (nl - pl) * (nl - pl)) / float(nl)
                 + float(pr * pr + (nr - pr) * (nr - pr)) / float(nr))
            if best is None or s > best[0]:
                best = (s, x, nl, pl, nr, pr)
        s, x, nl, pl, nr, pr = best
        gini_split = (float(n) - s) / float(n)
        gini_root = 1.0 - float(ptot * ptot + (n - ptot) * (n - ptot)) \
            / (float(n) * float(n))
        out[f] = (x, nl, pl, nr, pr, gini_split, gini_root)
    return out


def test_decision_stump_differential(spark):
    rng = random.Random(441)
    rows = [{"h": rng.randrange(0, 8),
             "c": rng.randrange(0, 5),
             "y": 0} for _ in range(400)]
    for r in rows:  # plant signal on h
        r["y"] = int(rng.random() < (0.8 if r["h"] >= 5 else 0.1))
    df = spark.createDataFrame(
        [(r["h"], r["c"], r["y"]) for r in rows],
        "h long, c long, y int")
    got = {r["feature"]: r for r in
           decision_stump(df, ["h", "c"], "y").collect()}
    exp = _py_stump(rows, ["h", "c"])
    for f in ("h", "c"):
        e = exp[f]
        g = got[f]
        assert (g["thr"], g["n_left"], g["pos_left"],
                g["n_right"], g["pos_right"]) == e[:5]
        assert g["gini_split"] == pytest.approx(e[5], rel=1e-15)
        assert g["gini_root"] == pytest.approx(e[6], rel=1e-15)
    # the planted split must be found: threshold 4 on h
    assert got["h"]["thr"] == 4
    # and h must beat the noise feature on impurity decrease
    assert (got["h"]["gini_root"] - got["h"]["gini_split"]
            > got["c"]["gini_root"] - got["c"]["gini_split"])


def test_decision_stump_pure_labels(spark):
    # perfectly separable: gini_split == 0
    rows = [(x, int(x > 3)) for x in range(8) for _ in range(5)]
    df = spark.createDataFrame(rows, "x long, y int")
    r = decision_stump(df, ["x"], "y").collect()[0]
    assert r["thr"] == 3 and r["gini_split"] == 0.0


def test_calibration_bins_differential(spark):
    rng = random.Random(442)
    rows = [(rng.randrange(0, 1000),) for _ in range(500)]
    rows = [(s, int(rng.random() < s / 1000.0)) for (s,) in rows]
    df = spark.createDataFrame(rows, "s long, y int")
    got = {r["bin"]: r for r in
           calibration_bins(df, "s", "y").collect()}
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0, 0])
    for s, y in rows:
        b = s * 10 // 1000
        agg[b][0] += 1
        agg[b][1] += y
        agg[b][2] += s
    assert set(got) == set(agg)
    for b, (n, pos, ss) in agg.items():
        r = got[b]
        assert (r["n"], r["pos"], r["sum_score"]) == (n, pos, ss)
        assert r["mean_score"] == pytest.approx(ss / (n * 1000.0),
                                                rel=1e-15)
        assert r["frac_pos"] == pytest.approx(pos / n, rel=1e-15)
    # a score drawn calibrated must produce a roughly monotone curve
    fracs = [got[b]["frac_pos"] for b in sorted(got)]
    assert fracs[-1] > fracs[0]


# ---------------------------------------------------------------- block 5
from mapbox_filter_spark.operators.temporal import (durbin_watson,
                                                    forecast_accuracy)


def test_durbin_watson_differential(spark):
    rng = random.Random(451)
    rows = [("a", i, rng.randrange(0, 1000)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = durbin_watson(df, ["g"], ["t"], "x").collect()[0]
    xs = [x for _, _, x in rows]
    num = sum((xs[i] - xs[i - 1]) ** 2 for i in range(1, len(xs)))
    n = len(xs)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert (r["n"], r["num"]) == (n, num)
    assert r["dw"] == pytest.approx(float(n * num) / float(den),
                                    rel=1e-15)


def test_durbin_watson_alternating_near_four(spark):
    rows = [("a", i, 100 if i % 2 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = durbin_watson(df, ["g"], ["t"], "x").collect()[0]
    assert r["dw"] > 3.8  # alternation drives DW toward 4


def test_durbin_watson_trending_near_zero(spark):
    rows = [("a", i, i * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = durbin_watson(df, ["g"], ["t"], "x").collect()[0]
    assert r["dw"] < 0.01  # smooth trend: tiny steps vs huge variance


def test_durbin_watson_constant_null(spark):
    rows = [("a", i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    assert durbin_watson(df, ["g"], ["t"], "x").collect()[0]["dw"] is None


def _py_forecast(ys, season=7):
    n_f = 0
    se = 0
    nd = 0
    sn = 0
    sm = 0.0
    nsm = 0
    for i, y in enumerate(ys):
        if i >= season:
            yh = ys[i - season]
            n_f += 1
            se += abs(y - yh)
            if y + yh > 0:
                sm += 2.0 * float(abs(y - yh)) / float(y + yh)
                nsm += 1
        if i >= 1:
            nd += 1
            sn += abs(y - ys[i - 1])
    mase = float(se * nd) / float(n_f * sn) if n_f and sn else None
    smape = sm / float(nsm) if nsm else None
    return n_f, se, sn, mase, smape


def test_forecast_accuracy_differential(spark):
    rng = random.Random(452)
    ys = [rng.randrange(50, 150) for _ in range(40)]
    rows = [("a", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    r = forecast_accuracy(df, ["g"], "t", "y").collect()[0]
    n_f, se, sn, mase, smape = _py_forecast(ys)
    assert (r["n_f"], r["sum_abs_err"], r["sum_abs_naive"]) \
        == (n_f, se, sn)
    assert r["mase"] == pytest.approx(mase, rel=1e-15)
    assert r["smape"] == pytest.approx(smape, rel=1e-12)


def test_forecast_accuracy_perfect_weekly_cycle(spark):
    # exact period-7 signal: seasonal-naive is perfect, MASE = 0
    ys = [(i % 7) * 10 + 5 for i in range(35)]
    rows = [("a", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    r = forecast_accuracy(df, ["g"], "t", "y").collect()[0]
    assert r["sum_abs_err"] == 0 and r["mase"] == 0.0 and r["smape"] == 0.0


def test_forecast_accuracy_constant_series_null_mase(spark):
    ys = [9] * 20
    rows = [("a", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    r = forecast_accuracy(df, ["g"], "t", "y").collect()[0]
    assert r["mase"] is None and r["smape"] == 0.0
