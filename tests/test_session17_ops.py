"""Session-17 operator blocks: Dirichlet query-likelihood retrieval +
MMR diversification — python brute differentials + edge pins."""

import math

import pytest

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.retrieval import (lm_dirichlet_topk,
                                                     mmr_rerank)


# ---- lm_dirichlet_topk ----

_DOCS = [
    (1, "spark table scan fast"),
    (2, "table table scan"),
    (3, "spark spark spark join"),
    (4, "filter join scan table spark"),
    (5, "nothing relevant here at all"),
]


def _lm_expected(docs, terms, mu):
    """Literal python replay of the Dirichlet QL formula."""
    toks = {d: t.split() for d, t in docs}
    dl = {d: len(ws) for d, ws in toks.items()}
    total = sum(dl.values())
    cf = {t: sum(ws.count(t) for ws in toks.values()) for t in terms}
    cf = {t: c for t, c in cf.items() if c > 0}
    scores = {}
    for d, ws in toks.items():
        if not any(t in ws for t in cf):
            continue
        s = 0.0
        for t in cf:
            p = mu * (cf[t] / total)
            s += math.log(ws.count(t) + p)
        s -= len(cf) * math.log(dl[d] + mu)
        scores[d] = s
    return scores


def test_lm_dirichlet_hand_differential(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    terms = ["spark", "table", "absent_term"]
    mu = 10.0
    out = lm_dirichlet_topk(df, terms, k=10, mu=mu).collect()
    exp = _lm_expected(_DOCS, terms, mu)
    got = {r.doc_id: r.score for r in out}
    assert set(got) == set(exp)  # doc 5 matches nothing -> excluded
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-9)
    # ranks follow (score desc, id asc)
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] \
        == [d for d, _ in ranked]


def test_lm_dirichlet_tf_monotone(spark):
    # more occurrences of the query term -> higher score at equal dl
    docs = [(1, "x a b c"), (2, "x x b c"), (3, "x x x c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.score
           for r in lm_dirichlet_topk(df, ["x"], k=3).collect()}
    assert out[3] > out[2] > out[1]


def test_lm_dirichlet_errors(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_dirichlet_topk(df, [], k=5)
    with pytest.raises(ValueError):
        lm_dirichlet_topk(df, ["spark"], k=5, mu=0.0)
    with pytest.raises(ValueError):
        lm_dirichlet_topk(df, ["zz_not_in_corpus"], k=5)


def test_lm_dirichlet_plan_no_python_broadcast_cf(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = lm_dirichlet_topk(df, ["spark", "table"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # cf table joins by broadcast
    assert "TakeOrderedAndProject" in plan  # distributed top-k


# ---- mmr_rerank ----

def _mmr_greedy(cand, sims, k, ln, ld):
    """Literal python replay: cand = {id: rel}, sims = {(a,b): sim}."""
    sel, out = [], []
    for r in range(1, k + 1):
        best = None
        for cid, rel in cand.items():
            if cid in sel:
                continue
            if sel:
                ms = max(sims[(cid, s)] for s in sel)
                mmr = ln * rel - (ld - ln) * ms
            else:
                mmr = ln * rel
            key = (-mmr, cid)
            if best is None or key < best[0]:
                best = (key, cid, rel, mmr)
        sel.append(best[1])
        out.append((r, best[1], best[2], best[3]))
    return out


def _mk_mmr_inputs(spark, cand, sims):
    cdf = spark.createDataFrame(list(cand.items()),
                                "c_id long, dot long")
    sdf = spark.createDataFrame(
        [(a, b, s) for (a, b), s in sims.items()],
        "a_id long, b_id long, sim long")
    return cdf, sdf


def test_mmr_diversity_beats_pure_relevance(spark):
    # docs 1,2 nearly identical and most relevant; doc 3 less relevant
    # but dissimilar -> MMR must pick 3 second, relevance would pick 2.
    cand = {1: 100, 2: 99, 3: 60}
    sims = {(1, 2): 99, (2, 1): 99, (1, 3): 5, (3, 1): 5,
            (2, 3): 5, (3, 2): 5}
    cdf, sdf = _mk_mmr_inputs(spark, cand, sims)
    out = sorted(mmr_rerank(cdf, sdf, 3).collect(),
                 key=lambda r: r.rank)
    # round 2: doc 2 scores 7*99 - 3*99 = 396 < doc 3's
    # 7*60 - 3*5 = 405 -> diversity promotes doc 3
    assert [r.c_id for r in out] == [1, 3, 2]
    assert out[0].mmr == 7 * 100
    exp = _mmr_greedy(cand, sims, 3, 7, 10)
    assert [(r.rank, r.c_id, r.rel, r.mmr) for r in out] == exp


def test_mmr_python_differential(spark):
    import random
    rng = random.Random(17)
    ids = list(range(20))
    cand = {i: rng.randrange(1000) for i in ids}
    sims = {}
    for a in ids:
        for b in ids:
            if a < b:
                s = rng.randrange(-200, 800)
                sims[(a, b)] = s
                sims[(b, a)] = s
    cdf, sdf = _mk_mmr_inputs(spark, cand, sims)
    out = sorted(mmr_rerank(cdf, sdf, 6).collect(),
                 key=lambda r: r.rank)
    assert [(r.rank, r.c_id, r.rel, r.mmr) for r in out] \
        == _mmr_greedy(cand, sims, 6, 7, 10)


def test_mmr_errors(spark):
    cand = {1: 10, 2: 5}
    sims = {(1, 2): 3, (2, 1): 3}
    cdf, sdf = _mk_mmr_inputs(spark, cand, sims)
    with pytest.raises(ValueError):
        mmr_rerank(cdf, sdf, 0)
    with pytest.raises(ValueError):
        mmr_rerank(cdf, sdf, 3)  # k > n
    with pytest.raises(ValueError):
        mmr_rerank(cdf, sdf, 2, lam_num=10, lam_den=10)


# ---- wilcoxon_signed_rank ----

def _wilcoxon_expected(pairs):
    """pairs: list of (a, b). Returns (n, n_zero, w2p, rbc)."""
    ds = [a - b for a, b in pairs]
    nz = [d for d in ds if d != 0]
    n, n_zero = len(nz), len(ds) - len(nz)
    srt = sorted(range(n), key=lambda i: abs(nz[i]))
    # average ranks on |d|, doubled
    r2 = [0] * n
    i = 0
    while i < n:
        j = i
        while j < n and abs(nz[srt[j]]) == abs(nz[srt[i]]):
            j += 1
        for t in range(i, j):
            r2[srt[t]] = (i + 1) + j  # 2*avg of ranks i+1..j
        i = j
    w2p = sum(r2[i] for i in range(n) if nz[i] > 0)
    rbc = (2 * w2p - n * (n + 1)) / (n * (n + 1)) if n else None
    return n, n_zero, w2p, rbc


def test_wilcoxon_hand_case(spark):
    from mapbox_filter_spark.operators.rankstats import \
        wilcoxon_signed_rank
    # diffs: +2, -1, +3, 0 -> |d| ranks: 1->1, 2->2, 3->3
    # W+ = ranks of (+2, +3) = 2 + 3 = 5 -> w2p = 10
    rows = [("g", 5, 3), ("g", 2, 3), ("g", 7, 4), ("g", 9, 9)]
    df = spark.createDataFrame(rows, "g string, a long, b long")
    r = wilcoxon_signed_rank(df, ["g"], "a", "b").collect()[0]
    assert (r.n, r.n_zero, r.w2p) == (3, 1, 10)
    assert r.rbc == pytest.approx(2 / 3)  # (2*w2p - n(n+1))/(n(n+1))
    exp = _wilcoxon_expected([(5, 3), (2, 3), (7, 4), (9, 9)])
    assert (r.n, r.n_zero, r.w2p, ) == exp[:3]
    assert r.rbc == pytest.approx(exp[3])


def test_wilcoxon_python_differential(spark):
    import random
    from mapbox_filter_spark.operators.rankstats import \
        wilcoxon_signed_rank
    rng = random.Random(171)
    rows = [("g1", rng.randrange(8), rng.randrange(8))
            for _ in range(200)] + \
           [("g2", rng.randrange(40), rng.randrange(40))
            for _ in range(150)]
    df = spark.createDataFrame(rows, "g string, a long, b long")
    out = {r.g: r for r in
           wilcoxon_signed_rank(df, ["g"], "a", "b").collect()}
    for g in ("g1", "g2"):
        exp = _wilcoxon_expected([(a, b) for gg, a, b in rows
                                  if gg == g])
        r = out[g]
        assert (r.n, r.n_zero, r.w2p) == exp[:3]
        assert r.rbc == pytest.approx(exp[3])


def test_wilcoxon_all_zero_group_absent_nulls_dropped(spark):
    from mapbox_filter_spark.operators.rankstats import \
        wilcoxon_signed_rank
    rows = [("z", 4, 4), ("z", 7, 7), ("k", 5, None), ("k", 6, 2)]
    df = spark.createDataFrame(rows, "g string, a long, b long")
    out = {r.g: r for r in
           wilcoxon_signed_rank(df, ["g"], "a", "b").collect()}
    assert "z" not in out          # all-zero group has no ranked rows
    assert out["k"].n == 1 and out["k"].n_zero == 0  # null pair gone


# ---- jonckheere_trend ----

def _jt_expected(rows):
    """rows: list of (level, value). Returns (n, j2, jmax2, effect)."""
    n = len(rows)
    j2 = 0
    for l1, v1 in rows:
        for l2, v2 in rows:
            if l1 < l2:
                if v1 < v2:
                    j2 += 2
                elif v1 == v2:
                    j2 += 1
    from collections import Counter
    nl = Counter(l for l, _ in rows)
    jmax2 = n * n - sum(c * c for c in nl.values())
    eff = (2 * j2 - jmax2) / jmax2 if jmax2 else None
    return n, j2, jmax2, eff


def test_jonckheere_perfect_trend_and_reverse(spark):
    from mapbox_filter_spark.operators.rankstats import \
        jonckheere_trend
    up = [("g", 1, 1), ("g", 1, 2), ("g", 2, 5), ("g", 2, 6),
          ("g", 3, 9), ("g", 3, 10)]
    df = spark.createDataFrame(up, "g string, l long, v long")
    r = jonckheere_trend(df, ["g"], "l", "v").collect()[0]
    assert r.effect == 1.0 and r.j2 == 2 * 12 and r.jmax2 == 24
    down = [("g", l, -v) for g, l, v in up]
    df2 = spark.createDataFrame(down, "g string, l long, v long")
    r2 = jonckheere_trend(df2, ["g"], "l", "v").collect()[0]
    assert r2.effect == -1.0 and r2.j2 == 0


def test_jonckheere_python_differential(spark):
    import random
    from mapbox_filter_spark.operators.rankstats import \
        jonckheere_trend
    rng = random.Random(172)
    rows = [("g", rng.randrange(1, 5), rng.randrange(6) +
             rng.randrange(1, 5)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, l long, v long")
    r = jonckheere_trend(df, ["g"], "l", "v").collect()[0]
    exp = _jt_expected([(l, v) for _, l, v in rows])
    assert (r.n, r.j2, r.jmax2) == exp[:3]
    assert r.effect == pytest.approx(exp[3])
    assert r.n_cells == len({(l, v) for _, l, v in rows})


def test_jonckheere_single_level_null_effect_and_cap(spark):
    from mapbox_filter_spark.operators import rankstats
    from mapbox_filter_spark.operators.rankstats import \
        jonckheere_trend
    one = spark.createDataFrame([("g", 2, 5), ("g", 2, 7)],
                                "g string, l long, v long")
    r = jonckheere_trend(one, ["g"], "l", "v").collect()[0]
    assert r.effect is None and r.jmax2 == 0 and r.j2 == 0
    big = spark.createDataFrame(
        [("g", i % 7, i) for i in range(300)],
        "g string, l long, v long")
    old = rankstats._JT_MAX_CELLS
    rankstats._JT_MAX_CELLS = 100
    try:
        with pytest.raises(ValueError, match="cell-join bound"):
            jonckheere_trend(big, ["g"], "l", "v")
    finally:
        rankstats._JT_MAX_CELLS = old


# ---- g_function ----

def test_g_function_hand_case(spark):
    import math as m
    from mapbox_filter_spark.operators.spatialstats import g_function
    # 4 points: NN distances 1, 1, 3, 3 (squared: 1, 1, 9, 9)
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 0), (3, 10, 0), (4, 13, 0)],
        "i long, x long, y long")
    out = {r.r: r for r in g_function(pts, [1, 2, 3]).collect()}
    assert [out[r].n_le for r in (1, 2, 3)] == [2, 2, 4]
    assert out[1].g_hat == 0.5 and out[3].g_hat == 1.0
    # theoretical CSR curve: bbox area 13*0 = 0 -> g_csr NULL
    assert out[1].g_csr is None
    pts2 = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 1), (3, 10, 4), (4, 13, 9)],
        "i long, x long, y long")
    r1 = {r.r: r for r in g_function(pts2, [5]).collect()}[5]
    lam = 4 / (13 * 9)
    assert r1.g_csr == pytest.approx(1 - m.exp(-lam * m.pi * 25))


def test_g_function_python_differential(spark):
    import random
    from mapbox_filter_spark.operators.spatialstats import g_function
    rng = random.Random(173)
    pts = [(i, rng.randrange(-50, 50), rng.randrange(-50, 50))
           for i in range(120)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    radii = [3, 7, 15, 40]
    out = {r.r: r.n_le for r in g_function(df, radii).collect()}
    nn = {}
    for i, x1, y1 in pts:
        best = None
        for j, x2, y2 in pts:
            if i != j:
                d2 = (x1 - x2) ** 2 + (y1 - y2) ** 2
                best = d2 if best is None else min(best, d2)
        nn[i] = best
    for r in radii:
        assert out[r] == sum(1 for d2 in nn.values() if d2 <= r * r)


def test_g_function_monotone_and_errors(spark):
    from mapbox_filter_spark.operators.spatialstats import g_function
    df = spark.createDataFrame([(1, 0, 0), (2, 5, 5)],
                               "i long, x long, y long")
    rows = sorted(g_function(df, [2, 8, 16]).collect(),
                  key=lambda r: r.r)
    assert [r.n_le for r in rows] == sorted(r.n_le for r in rows)
    with pytest.raises(ValueError):
        g_function(df, [])
    with pytest.raises(ValueError):
        g_function(df, [0, 5])


# ---- dissimilarity_index ----

def _d_expected(rows):
    """rows: (cell, flag). Returns (n_cells, n_a, n_b, d_num, d)."""
    from collections import defaultdict
    a, b = defaultdict(int), defaultdict(int)
    for cell, f in rows:
        (a if f else b)[cell] += 1
    cells = set(a) | set(b)
    na, nb = sum(a.values()), sum(b.values())
    d_num = sum(abs(a[c] * nb - b[c] * na) for c in cells)
    d = d_num / (2 * na * nb) if na and nb else None
    return len(cells), na, nb, d_num, d


def test_dissimilarity_extremes(spark):
    from mapbox_filter_spark.operators.spatialstats import \
        dissimilarity_index
    # total segregation -> D = 1
    rows = [(0, 0, True)] * 3 + [(5, 5, False)] * 4
    df = spark.createDataFrame(
        [(x, y, f) for x, y, f in rows], "cx long, cy long, f boolean")
    r = dissimilarity_index(df, ["cx", "cy"], "f").collect()[0]
    assert r.d_index == 1.0 and (r.n_a, r.n_b) == (3, 4)
    # identical layout -> D = 0
    rows2 = [(0, 0, True), (0, 0, False), (1, 1, True), (1, 1, False)]
    df2 = spark.createDataFrame(rows2, "cx long, cy long, f boolean")
    r2 = dissimilarity_index(df2, ["cx", "cy"], "f").collect()[0]
    assert r2.d_index == 0.0 and r2.d_num == 0
    # one empty population -> NULL
    df3 = spark.createDataFrame([(0, 0, True)],
                                "cx long, cy long, f boolean")
    r3 = dissimilarity_index(df3, ["cx", "cy"], "f").collect()[0]
    assert r3.d_index is None


def test_dissimilarity_python_differential(spark):
    import random
    from mapbox_filter_spark.operators.spatialstats import \
        dissimilarity_index
    rng = random.Random(174)
    rows = [(rng.randrange(6), rng.random() < 0.4) for _ in range(500)]
    df = spark.createDataFrame([(c, 0, f) for c, f in rows],
                               "cx long, cy long, f boolean")
    r = dissimilarity_index(df, ["cx", "cy"], "f").collect()[0]
    exp = _d_expected(rows)
    assert (r.n_cells, r.n_a, r.n_b, r.d_num) == exp[:4]
    assert r.d_index == pytest.approx(exp[4])


# ---- span_lcs ----

def _lcs_brute(a, b):
    n, m = len(a), len(b)
    L = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            L[i][j] = (L[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                       else max(L[i - 1][j], L[i][j - 1]))
    return L[n][m]


def _run_lcs(spark, cases):
    from mapbox_filter_spark.operators.media import span_lcs
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("sa", T.ArrayType(T.StringType())),
        T.StructField("sb", T.ArrayType(T.StringType()))])
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)], schema)
    return {r.doc_id: r for r in span_lcs(df).collect()}


def test_span_lcs_hand_cases(spark):
    out = _run_lcs(spark, [
        (list("ABCBDAB"), list("BDCABA")),   # classic: LCS = 4 (BCBA)
        (list("AGGTAB"), list("GXTXAYB")),   # classic: LCS = 4 (GTAB)
        (list("ABC"), list("ABC")),          # identical
        (list("ABC"), list("CBA")),          # reversal -> 1
        (list("ABC"), []),                   # empty B
        ([], []),                            # both empty
    ])
    assert out[0].lcs == 4 and out[1].lcs == 4
    assert out[2].lcs == 3 and out[2].sim == 1.0
    assert out[3].lcs == 1                   # order matters vs set overlap
    assert out[4].lcs == 0 and out[4].sim == 0.0
    assert out[5].lcs == 0 and out[5].sim is None


def test_span_lcs_python_differential(spark):
    import random
    rng = random.Random(175)
    cases = []
    for _ in range(60):
        la, lb = rng.randrange(0, 9), rng.randrange(0, 9)
        a = [rng.choice("xyzw") for _ in range(la)]
        b = [rng.choice("xyzw") for _ in range(lb)]
        cases.append((a, b))
    out = _run_lcs(spark, cases)
    for i, (a, b) in enumerate(cases):
        r = out[i]
        assert (r.len_a, r.len_b, r.lcs) == (len(a), len(b),
                                             _lcs_brute(a, b)), (a, b)
        exp_sim = (2 * _lcs_brute(a, b) / (len(a) + len(b))
                   if (a or b) else None)
        if exp_sim is None:
            assert r.sim is None
        else:
            assert r.sim == pytest.approx(exp_sim)


def test_span_lcs_max_len_guard(spark):
    from mapbox_filter_spark.operators.media import span_lcs
    from pyspark.sql import types as T
    import pyspark.errors
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("sa", T.ArrayType(T.StringType())),
        T.StructField("sb", T.ArrayType(T.StringType()))])
    df = spark.createDataFrame([(1, ["a"] * 9, ["a"] * 2)], schema)
    with pytest.raises(Exception, match="max_len"):
        span_lcs(df, max_len=8).collect()
