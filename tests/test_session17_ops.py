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
