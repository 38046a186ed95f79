"""Unit differentials for the session-7 operator block: Knox
space-time pairs and Ripley's K (hand-built counts + python brute
replay, negative coords crossing cell boundaries, exact-threshold
ties)."""

import random

from pyspark.sql import functions as F


def _brute_knox(rows, eps, tau):
    sp = tp = joint = 0
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            (ia, xa, ya, ta), (ib, xb, yb, tb) = rows[a], rows[b]
            s = (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps
            t = abs(ta - tb) <= tau
            sp += s
            tp += t
            joint += s and t
    return sp, tp, joint


def test_knox_hand(spark):
    from mapbox_filter_spark.operators.spatialstats import knox_pairs
    # ids distinct; pair (1,2) close in both; (1,3) space only (tie at
    # exactly eps); (2,4) time only (tie at exactly tau); negatives
    # cross the cell-0 boundary.
    rows = [(1, 0, 0, 0), (2, 3, 4, 50), (3, -10, 0, 99999),
            (4, 500, 500, 150)]
    df = spark.createDataFrame(rows, "i long, x long, y long, t long")
    got = knox_pairs(df, eps=10, tau=100).collect()[0]
    sp, tp, joint = _brute_knox(rows, 10, 100)
    assert (got["space_pairs"], got["time_pairs"],
            got["joint_pairs"]) == (sp, tp, joint)
    assert got["n_points"] == 4 and got["n_pairs"] == 6
    assert got["expected"] == sp * float(tp) / 6.0


def test_knox_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import knox_pairs
    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 50), rng.randint(-50, 50),
             rng.randint(0, 1000)) for i in range(120)]
    df = spark.createDataFrame(rows, "i long, x long, y long, t long")
    got = knox_pairs(df, eps=13, tau=37).collect()[0]
    sp, tp, joint = _brute_knox(rows, 13, 37)
    assert (got["space_pairs"], got["time_pairs"],
            got["joint_pairs"]) == (sp, tp, joint)


def test_ripley_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import ripley_k
    rng = random.Random(3)
    rows = [(i, rng.randint(-40, 40), rng.randint(-40, 40))
            for i in range(100)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    radii = [5, 11, 25]
    got = {r["r"]: r for r in ripley_k(df, radii).collect()}
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    n = len(rows)
    for r in radii:
        cnt = sum((xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
                  for a, (_, xa, ya) in enumerate(rows)
                  for (_, xb, yb) in rows[a + 1:])
        row = got[r]
        assert row["pair_cnt"] == cnt
        assert row["n_points"] == n and row["area"] == area
        assert row["k_hat"] == (cnt * 2.0) * float(area) / (n * (n - 1))


def test_ripley_rejects_bad_radii(spark):
    from mapbox_filter_spark.operators.spatialstats import ripley_k
    import pytest
    df = spark.createDataFrame([(1, 0, 0)], "i long, x long, y long")
    with pytest.raises(ValueError):
        ripley_k(df, [])
    with pytest.raises(ValueError):
        ripley_k(df, [0, 5])


def _brute_km(subjects, scale=10**9):
    """Python replay of the exact-integer log-carry KM contract."""
    import collections
    import math
    out = []
    groups = collections.defaultdict(list)
    for g, dur, ev in subjects:
        groups[g].append((dur, ev))
    for g, rows in groups.items():
        per = collections.defaultdict(lambda: [0, 0])
        for dur, ev in rows:
            per[dur][0 if ev else 1] += 1
        n = len(rows)
        cum = 0
        dead = False
        for dur in sorted(per):
            d, c = per[dur]
            n_risk = n
            n -= d + c
            if n_risk > d:
                cum += math.floor(
                    math.log((n_risk - d) / n_risk) * scale + 0.5)
            else:
                dead = True
            if d >= 1:
                out.append((g, dur, n_risk, d, c,
                            None if dead else cum))
    return sorted(out)


def test_kaplan_meier_hand(spark):
    from mapbox_filter_spark.operators.stats import kaplan_meier
    # classic toy: durations 1,2,2,3(censored),4; group B dies out.
    rows = [("A", 1, 1), ("A", 2, 1), ("A", 2, 1), ("A", 3, 0),
            ("A", 4, 1),
            ("B", 5, 1), ("B", 5, 1)]
    df = spark.createDataFrame(rows, "segment string, dur long, event int")
    got = sorted(
        tuple(r) for r in
        kaplan_meier(df, ["segment"]).collect())
    assert got == _brute_km(rows)
    # group B hits zero at its only event time -> NULL log survival
    b = [r for r in got if r[0] == "B"]
    assert b == [("B", 5, 2, 2, 0, None)]
    # group A at dur=2: n_risk 4, 2 events
    a2 = [r for r in got if r[0] == "A" and r[1] == 2][0]
    assert (a2[2], a2[3], a2[4]) == (4, 2, 0)


def test_kaplan_meier_replay(spark):
    from mapbox_filter_spark.operators.stats import kaplan_meier
    rng = random.Random(23)
    rows = [(f"g{rng.randint(0, 3)}", rng.randint(0, 40),
             rng.randint(0, 1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "segment string, dur long, event int")
    got = sorted(tuple(r) for r in
                 kaplan_meier(df, ["segment"]).collect())
    # ln quantization: spark JVM ln vs python libm can differ 1 ulp;
    # the floor(x*1e9+0.5) quantization collapses that except exactly
    # at a .5 boundary, which these random ratios don't hit.
    assert got == _brute_km(rows)


def _brute_sq8(queries, corpus, k, levels=255):
    import math
    dims = len(corpus[0][1])
    lo = [min(v[d] for _, v in corpus) for d in range(dims)]
    hi = [max(v[d] for _, v in corpus) for d in range(dims)]

    def enc(v):
        out = []
        for d in range(dims):
            if hi[d] > lo[d]:
                c = math.floor((v[d] - lo[d]) / (hi[d] - lo[d])
                               * levels + 0.5)
            else:
                c = 0
            out.append(max(0, min(levels, c)))
        return out

    cc = [(i, enc(v)) for i, v in corpus]
    res = []
    for qi, qv in queries:
        qc = enc(qv)
        scored = sorted(
            ((sum(a * b for a, b in zip(qc, c)), i) for i, c in cc),
            key=lambda t: (-t[0], t[1]))
        for rank, (dot, i) in enumerate(scored[:k], 1):
            res.append((qi, rank, i, dot))
    return sorted(res)


def test_sq8_hand_clamp_and_constant_dim(spark):
    from mapbox_filter_spark.operators.similarity import sq8_topk
    # dim 2 is constant in the corpus (encodes to 0); the query's
    # values fall outside the corpus range on dim 0 -> clamped.
    corpus = [(1, [0.0, 1.0, 7.0]), (2, [2.0, 3.0, 7.0]),
              (3, [1.0, 0.0, 7.0])]
    queries = [(9, [-5.0, 99.0, 0.0])]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(queries,
                              "query_id long, embedding array<double>")
    got = sorted(tuple(r) for r in sq8_topk(q, c, k=3).collect())
    assert got == _brute_sq8(queries, corpus, 3)
    # clamped query code is (0, 255, 0): dot ranks by second dim code
    assert [g[2] for g in got] == [2, 1, 3]


def test_sq8_replay(spark):
    from mapbox_filter_spark.operators.similarity import sq8_topk
    rng = random.Random(41)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)])
              for i in range(60)]
    queries = [(100 + i, [rng.uniform(-1.5, 1.5) for _ in range(8)])
               for i in range(7)]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(queries,
                              "query_id long, embedding array<double>")
    got = sorted(tuple(r) for r in sq8_topk(q, c, k=4).collect())
    assert got == _brute_sq8(queries, corpus, 4)


def _brute_lof(rows, k, radius, scale=10**15):
    r2 = radius * radius
    ids = {i: (x, y) for i, x, y in rows}
    knn = {}
    for i, (xi, yi) in ids.items():
        cand = sorted(
            ((xi - xj) ** 2 + (yi - yj) ** 2, j)
            for j, (xj, yj) in ids.items() if j != i)
        cand = [(d, j) for d, j in cand if d <= r2][:k]
        if cand:
            knn[i] = cand
    kd = {i: max(d for d, _ in c) for i, c in knn.items()}
    nk = {i: len(c) for i, c in knn.items()}
    sreach = {}
    for i, c in knn.items():
        sreach[i] = sum(max(kd[j], d) for d, j in c if j in kd)
        # neighbors outside knn (isolated) can't happen: j has i in range
    out = []
    for i, c in knn.items():
        anyz = any(sreach[j] == 0 for _, j in c)
        sumr = None if anyz else sum(
            nk[j] * scale // sreach[j] for _, j in c)
        lof = None
        if sreach[i] > 0 and not anyz:
            lof = (float(sreach[i]) * float(sumr)
                   / float(nk[i] * nk[i]) / float(scale))
        out.append((i, nk[i], kd[i], sreach[i], sumr, lof))
    return sorted(out)


def test_lof_hand_outlier(spark):
    from mapbox_filter_spark.operators.cluster import lof_scores
    # tight 3x3 grid cluster + one point far-but-in-radius: the lone
    # point's LOF must exceed every cluster point's.
    rows = [(3 * r + c_ + 1, r, c_) for r in range(3) for c_ in range(3)]
    rows.append((99, 40, 40))
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = sorted(tuple(r) for r in
                 lof_scores(df, k=3, radius=100).collect())
    assert got == _brute_lof(rows, 3, 100)
    lofs = {r[0]: r[5] for r in got}
    assert lofs[99] > max(v for i, v in lofs.items() if i != 99) * 5


def test_lof_coincident_zero_reach_is_null(spark):
    from mapbox_filter_spark.operators.cluster import lof_scores
    # 4 coincident points with k=3: kdist2=0, reach sums 0 -> NULL lof.
    rows = [(i, 5, 5) for i in range(1, 5)] + [(9, 8, 8)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {r["i"]: r for r in lof_scores(df, k=3, radius=100).collect()}
    for i in range(1, 5):
        assert got[i]["sum_reach2"] == 0
        assert got[i]["lof"] is None and got[i]["sum_recip"] is None
    # the separated point's neighbors all have zero reach sums -> NULL
    assert got[9]["lof"] is None


def test_lof_replay(spark):
    from mapbox_filter_spark.operators.cluster import lof_scores
    rng = random.Random(19)
    rows = [(i, rng.randint(-60, 60), rng.randint(-60, 60))
            for i in range(150)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = sorted(tuple(r) for r in
                 lof_scores(df, k=4, radius=25).collect())
    assert got == _brute_lof(rows, 4, 25)


def test_knox_ripley_empty_and_degenerate(spark):
    """Review regressions: empty pair sets must count 0 (not NULL) and
    degenerate denominators must be NULL in BOTH engines (not 0/0)."""
    from mapbox_filter_spark.operators.spatialstats import (
        knox_pairs, ripley_k)
    # two far-apart points: no space pair, one time pair
    df = spark.createDataFrame([(1, 0, 0, 0), (2, 10**6, 10**6, 5)],
                               "i long, x long, y long, t long")
    r = knox_pairs(df, eps=10, tau=100).collect()[0]
    assert (r["space_pairs"], r["joint_pairs"], r["time_pairs"]) == \
        (0, 0, 1)
    assert r["expected"] == 0.0
    rk = {x["r"]: x for x in ripley_k(df.select("i", "x", "y"),
                                      [5, 7]).collect()}
    assert rk[5]["pair_cnt"] == 0 and rk[5]["k_hat"] == 0.0
    # single point: n_pairs = 0 -> expected/k_hat NULL, counts 0
    one = spark.createDataFrame([(1, 0, 0, 0)],
                                "i long, x long, y long, t long")
    r = knox_pairs(one, eps=10, tau=100).collect()[0]
    assert (r["n_pairs"], r["space_pairs"], r["time_pairs"],
            r["joint_pairs"]) == (0, 0, 0, 0)
    assert r["expected"] is None
    rk = ripley_k(one.select("i", "x", "y"), [5]).collect()[0]
    assert rk["pair_cnt"] == 0 and rk["k_hat"] is None


def test_blocked_pairs_int32_inputs_do_not_overflow(spark):
    """Review regression: 32-bit coordinate columns are cast to long
    before the d² arithmetic."""
    from mapbox_filter_spark.operators.cluster import blocked_pairs
    big = 60000
    df = spark.createDataFrame([(1, -big, 0), (2, big, 0)],
                               "i long, x int, y int")
    got = blocked_pairs(df, 200000).collect()
    assert len(got) == 1 and got[0]["d2"] == (2 * big) ** 2


def test_sq8_null_element_excluded_not_max(spark):
    """Review regression: a NULL vector element must NOT encode as max
    code 255; the vector drops out of ranking instead."""
    from mapbox_filter_spark.operators.similarity import sq8_topk
    corpus = [(1, [0.0, 1.0]), (2, [2.0, 3.0]), (3, [None, 3.0])]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(9, [2.0, 3.0])],
                              "query_id long, embedding array<double>")
    got = sorted((r["rank"], r["vec_id"]) for r in
                 sq8_topk(q, c, k=3).collect())
    assert got == [(1, 2), (2, 1)]       # vec 3 excluded entirely
