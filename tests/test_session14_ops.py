"""Unit differentials for the session-14 operator block (point-pattern
statistics: Clark-Evans NN index, quadrat-count CSR test)."""

import pytest

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.spatialstats import (clark_evans,
                                                        quadrat_test)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "i long, x long, y long")


def test_clark_evans_square_corners(spark):
    # 4 corners of a 10x10 square: every NN distance is exactly 10,
    # bbox area 100, D_exp = 0.5*sqrt(100/4) = 2.5 -> R = 4.0
    out = clark_evans(
        _pts(spark, [(1, 0, 0), (2, 10, 0), (3, 0, 10), (4, 10, 10)]),
        radius=64).collect()[0]
    assert out.n_points == 4 and out.n_with_nn == 4
    assert out.area == 100
    assert out.sum_nn_micro == 4 * 10_000_000
    assert out.r_index == pytest.approx(4.0)
    assert out.z_score > 0  # dispersed


def test_clark_evans_excludes_isolated_points(spark):
    # 5th point beyond the search radius contributes to n_points/area
    # but not to the NN mean (the documented bounded-search contract)
    out = clark_evans(
        _pts(spark, [(1, 0, 0), (2, 10, 0), (3, 0, 10), (4, 10, 10),
                     (5, 1000, 1000)]),
        radius=64).collect()[0]
    assert out.n_points == 5
    assert out.n_with_nn == 4
    assert out.sum_nn_micro == 4 * 10_000_000


def test_clark_evans_python_differential(spark):
    # brute-force replay of the whole statistic on a hashed pattern
    import math
    rows = [(i, (i * 7919) % 97, (i * 104729) % 89)
            for i in range(30)]
    out = clark_evans(_pts(spark, rows), radius=200).collect()[0]
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    nn_sum = 0
    for i, x, y in rows:
        d2 = min((x - bx) ** 2 + (y - by) ** 2
                 for j, bx, by in rows if j != i)
        nn_sum += math.floor(math.sqrt(d2) * 1e6)
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    assert out.area == area
    assert out.sum_nn_micro == nn_sum
    d_obs = nn_sum / (30 * 1e6)
    d_exp = 0.5 * math.sqrt(area / 30)
    assert out.r_index == pytest.approx(d_obs / d_exp)
    se = math.sqrt((4 - math.pi) / (4 * math.pi)) * math.sqrt(area) / 30
    assert out.z_score == pytest.approx((d_obs - d_exp) / se)


def test_quadrat_vmr_exact_rational(spark):
    # cell=10: cells {0:(3 pts), 1:(1 pt)}, bbox grid = 2x1 quadrats
    # VMR = (Nq*sum_c2 - n^2) / (n*(Nq-1)) = (2*10-16)/4 = 1.0
    out = quadrat_test(
        _pts(spark, [(1, 1, 1), (2, 2, 1), (3, 3, 1), (4, 15, 1)]),
        cell=10).collect()[0]
    assert out.n_points == 4 and out.n_quadrats == 2
    assert out.n_occupied == 2 and out.sum_c2 == 10
    assert (out.vmr_num, out.vmr_den) == (4, 4)
    assert out.vmr == pytest.approx(1.0)
    assert out.chi2 == pytest.approx(1.0)


def test_quadrat_counts_empty_quadrats(spark):
    # all mass in two far cells -> interior EMPTY quadrats raise VMR
    out = quadrat_test(
        _pts(spark, [(1, 1, 1), (2, 2, 1), (3, 3, 1), (4, 35, 1)]),
        cell=10).collect()[0]
    assert out.n_quadrats == 4          # cells 0..3 on x, 1 on y
    assert out.n_occupied == 2
    # VMR = (4*10 - 16) / (4*3) = 2.0
    assert out.vmr == pytest.approx(2.0)


def test_quadrat_negative_coords_floor(spark):
    # floor division must keep (-1,-1) in cell (-1,-1), not (0,0)
    out = quadrat_test(
        _pts(spark, [(1, -1, -1), (2, 1, 1)]), cell=10).collect()[0]
    assert out.n_quadrats == 4          # 2x2 bbox grid across origin
    assert out.n_occupied == 2


def test_quadrat_single_exchange_plan(spark):
    out = quadrat_test(_pts(spark, [(1, 1, 1), (2, 15, 1)]), cell=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Join" in plan  # the single-row totals crossJoin only
    assert plan.count("Exchange") <= 4


def test_quadrat_rejects_bad_cell(spark):
    with pytest.raises(ValueError):
        quadrat_test(_pts(spark, [(1, 1, 1)]), cell=0)
    with pytest.raises(ValueError):
        clark_evans(_pts(spark, [(1, 1, 1)]), radius=0)


# ---- agreement statistics: Cohen's kappa, Kendall's W ----

from mapbox_filter_spark.operators.stats import cohen_kappa
from mapbox_filter_spark.operators.rankstats import kendalls_w


def test_cohen_kappa_textbook(spark):
    # classic 2x2: 35/50 agree, marginal chance 1250/2500 -> k = 0.4
    rows = ([("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 5 + [("n", "y")] * 10)
    out = cohen_kappa(
        spark.createDataFrame(rows, "t string, p string"),
        "t", "p").collect()[0]
    assert out.n_total == 50 and out.n_agree == 35
    assert out.chance_num == 25 * 30 + 25 * 20
    assert (out.kappa_num, out.kappa_den) == (500, 1250)
    assert out.kappa == pytest.approx(0.4)


def test_cohen_kappa_disjoint_labels(spark):
    # predictions never overlap truth: agreement 0, chance 0 -> k=0
    rows = [("a", "b")] * 4
    out = cohen_kappa(
        spark.createDataFrame(rows, "t string, p string"),
        "t", "p").collect()[0]
    assert out.n_agree == 0 and out.chance_num == 0
    assert out.kappa == pytest.approx(0.0)


def _rt(spark, rows):
    return spark.createDataFrame(rows, "r string, i string, v long")


def test_kendalls_w_unanimous(spark):
    rows = [(r, i, v) for r in "abc"
            for i, v in [("x", 1), ("y", 2), ("z", 3)]]
    out = kendalls_w(_rt(spark, rows), "r", "i", "v").collect()[0]
    assert (out.m_raters, out.n_items) == (3, 3)
    assert out.s4 == 72 and out.tie_term == 0
    assert out.w == pytest.approx(1.0)


def test_kendalls_w_reversed_pair(spark):
    # two raters with exactly opposite orderings -> W = 0
    rows = [("a", "x", 1), ("a", "y", 2), ("a", "z", 3),
            ("b", "x", 3), ("b", "y", 2), ("b", "z", 1)]
    out = kendalls_w(_rt(spark, rows), "r", "i", "v").collect()[0]
    assert out.s4 == 0
    assert out.w == pytest.approx(0.0)


def test_kendalls_w_tie_correction_and_grid_fill(spark):
    # rater b ties everything (t=3 -> T=24); rater a misses item z
    # (grid completion reads v=0, ranking z lowest for a)
    rows = [("a", "x", 5), ("a", "y", 9),
            ("b", "x", 2), ("b", "y", 2), ("b", "z", 2)]
    out = kendalls_w(_rt(spark, rows), "r", "i", "v").collect()[0]
    assert out.m_raters == 2 and out.n_items == 3
    assert out.tie_term == 24
    # w_den = 4*24 - 2*24 = 48; rater a ranks z=1,x=2,y=3 (avg2 2,4,6)
    # rater b all avg2 = 2*1+2 = 4; S2 = {z:6, x:8, y:10}, mean 8
    # S4 = 4 + 0 + 4 = 8 -> W = 24/48 = 0.5
    assert (out.s4, out.w_num, out.w_den) == (8, 24, 48)
    assert out.w == pytest.approx(0.5)


def test_kendalls_w_python_differential(spark):
    rows = [(f"r{r}", f"i{i}", (r * 7919 + i * 104729) % 13)
            for r in range(5) for i in range(7)]
    out = kendalls_w(_rt(spark, rows), "r", "i", "v").collect()[0]
    # brute replay with average ranks
    m, n = 5, 7
    byr = {}
    for r, i, v in rows:
        byr.setdefault(r, []).append((i, v))
    s2 = {}
    tie = 0
    for r, iv in byr.items():
        vals = sorted(v for _, v in iv)
        from collections import Counter
        cnt = Counter(vals)
        tie += sum(t ** 3 - t for t in cnt.values())
        for i, v in iv:
            rmin = 1 + sum(1 for w in vals if w < v)
            t = cnt[v]
            s2[i] = s2.get(i, 0) + 2 * rmin + (t - 1)
    s4 = sum((x - m * (n + 1)) ** 2 for x in s2.values())
    assert out.s4 == s4 and out.tie_term == tie
    w = 3 * s4 / (m * m * (n ** 3 - n) - m * tie)
    assert out.w == pytest.approx(w)


# ---- curation: containment pairs, cross-source overlap ----

from mapbox_filter_spark.operators.dedup import (containment_pairs,
                                                 source_overlap)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_detects_quote_inclusion(spark):
    # doc 2 is a verbatim excerpt of doc 1: containment(2->1) = 1.0
    # while Jaccard is diluted far below any dedup threshold
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short = "alpha beta gamma"
    out = {(r.id_a, r.id_b): r for r in containment_pairs(
        _docs(spark, [(1, long), (2, short)]),
        shingle_n=2, threshold=0.0).collect()}
    fwd = out[(2, 1)]
    assert fwd.containment == pytest.approx(1.0)
    assert fwd.inter == 2 and fwd.size_a == 2 and fwd.size_b == 9
    back = out[(1, 2)]
    assert back.containment == pytest.approx(2 / 9)


def test_containment_threshold_and_blocking(spark):
    # different first tokens -> different blocks -> no pair at all
    out = containment_pairs(
        _docs(spark, [(1, "alpha beta gamma"), (2, "beta gamma")]),
        shingle_n=2, threshold=0.0).collect()
    assert out == []


def test_containment_max_block_drops_loudly(spark):
    rows = [(i, "the same start text") for i in range(5)]
    out = containment_pairs(_docs(spark, rows), shingle_n=2,
                            threshold=0.0, max_block=3).collect()
    assert out == []   # block of 5 > cap 3 -> dropped, not truncated


def test_source_overlap_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "b c d e", "s2"),
         (3, "x y z w", "s3")],
        "doc_id long, text string, source string")
    out = {(r.src_a, r.src_b): r
           for r in source_overlap(df, shingle_n=2).collect()}
    # s1 grams {ab,bc,cd}, s2 {bc,cd,de} -> shared 2, union 4
    r = out[("s1", "s2")]
    assert (r.shared, r.n_a, r.n_b) == (2, 3, 3)
    assert r.jaccard == pytest.approx(0.5)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_source_overlap_distinct_within_source(spark):
    # duplicate docs inside one source must not double-count grams
    df = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s1"), (3, "a b c", "s2")],
        "doc_id long, text string, source string")
    r = source_overlap(df, shingle_n=2).collect()[0]
    assert (r.shared, r.n_a, r.n_b) == (2, 2, 2)
    assert r.jaccard == pytest.approx(1.0)


# ---- cluster quality: simplified centroid silhouette ----

from mapbox_filter_spark.operators.cluster import centroid_silhouette


def test_silhouette_compact_separated(spark):
    # two tight blobs at the centroids -> every point has a = 0, s = 1
    pts = spark.createDataFrame(
        [(0, 0), (0, 1), (100, 100), (100, 101)], "x long, y long")
    out = {r.cent_id: r for r in centroid_silhouette(
        pts, "x", "y", [(0, 0, 0), (1, 100, 100)]).collect()}
    for cid in (0, 1):
        assert out[cid].n_members == 2
        # one on-centroid point (a=0 -> s=1) + one at dist 1
        assert out[cid].mean_s > 0.9


def test_silhouette_negative_for_misassigned(spark):
    # a point sitting ON centroid 1 but forced into cluster 0's side
    # of the argmin fold can't happen; instead test a point midway but
    # nearer to its own: s in (0,1); and symmetric point -> same s
    pts = spark.createDataFrame([(4, 0)], "x long, y long")
    r = centroid_silhouette(pts, "x", "y",
                            [(0, 0, 0), (1, 10, 0)]).collect()[0]
    # a=4, b=6 -> s = (6-4)/6 = 1/3
    assert r.cent_id == 0
    assert r.mean_s == pytest.approx(1 / 3, abs=1e-6)


def test_silhouette_python_differential(spark):
    import math
    rows = [((i * 7919) % 50, (i * 104729) % 40) for i in range(60)]
    cents = [(0, 5, 5), (1, 40, 30), (2, 25, 10)]
    out = {r.cent_id: r for r in centroid_silhouette(
        spark.createDataFrame(rows, "x long, y long"),
        "x", "y", cents).collect()}
    agg = {}
    for x, y in rows:
        ds = [((x - cx) ** 2 + (y - cy) ** 2, cid)
              for cid, cx, cy in cents]
        keyed = sorted(d2 * 3 + cid for d2, cid in ds)
        cid = keyed[0] % 3
        d2o = (keyed[0] - cid) // 3
        d2b = min(d2 for d2, c in ds if c != cid)
        a = math.floor(math.sqrt(d2o) * 1e6)
        b = math.floor(math.sqrt(d2b) * 1e6)
        s = ((b - a) * 1_000_000) // max(a, b) if max(a, b) > 0 else 0
        n, t = agg.get(cid, (0, 0))
        agg[cid] = (n + 1, t + s)
    for cid, (n, t) in agg.items():
        assert out[cid].n_members == n
        assert out[cid].sum_s_scaled == t


def test_silhouette_rejects_single_centroid(spark):
    pts = spark.createDataFrame([(0, 0)], "x long, y long")
    with pytest.raises(ValueError):
        centroid_silhouette(pts, "x", "y", [(0, 0, 0)])


def test_silhouette_zero_shuffle_plan(spark):
    pts = spark.createDataFrame([(0, 0), (9, 9)], "x long, y long")
    out = centroid_silhouette(pts, "x", "y", [(0, 0, 0), (1, 9, 9)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 2   # the single k-group groupBy


# ---- retrieval: rank-biased overlap curve ----

from mapbox_filter_spark.operators.retrieval import rbo_curve


def _rl(spark, ids):
    return spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids)], "doc_id long, rank long")


def test_rbo_identical_lists_is_one(spark):
    out = rbo_curve(_rl(spark, [1, 2, 3, 4]), _rl(spark, [1, 2, 3, 4]),
                    depth=4).collect()
    by_d = {r.d: r for r in out}
    assert [by_d[d].x_d for d in range(1, 5)] == [1, 2, 3, 4]
    # identical lists: A_d = 1 at every depth, so RBO@d = (1-p)sum p^i
    p = 0.9
    for d in range(1, 5):
        expect = (1 - p) * sum(p ** (i - 1) for i in range(1, d + 1))
        assert by_d[d].rbo_at_d == pytest.approx(expect)


def test_rbo_disjoint_lists_is_zero(spark):
    out = rbo_curve(_rl(spark, [1, 2]), _rl(spark, [3, 4]),
                    depth=2).collect()
    assert all(r.x_d == 0 and r.rbo_at_d == pytest.approx(0.0)
               for r in out)


def test_rbo_python_differential(spark):
    a = [5, 1, 9, 3, 7, 2]
    b = [1, 5, 2, 8, 3, 6]
    depth, p = 6, 0.9
    out = {r.d: r for r in
           rbo_curve(_rl(spark, a), _rl(spark, b), depth=depth).collect()}
    acc = 0.0
    for d in range(1, depth + 1):
        x = len(set(a[:d]) & set(b[:d]))
        acc += x * p ** (d - 1) / d
        assert out[d].x_d == x
        assert out[d].rbo_at_d == pytest.approx((1 - p) * acc)


def test_rbo_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        rbo_curve(_rl(spark, [1]), _rl(spark, [1]), depth=0)
    with pytest.raises(ValueError):
        rbo_curve(_rl(spark, [1]), _rl(spark, [1]), depth=3, p=1.0)


# ---- SPC + long-memory: c-chart, Hurst R/S ----

from mapbox_filter_spark.operators.temporal import c_chart, hurst_rs


def test_c_chart_flags_spike_and_silence(spark):
    # 10 steady weeks of 9 + one 100-count spike; the completed grid
    # adds week 11 as a silent 0 for group g
    rows = ([("g", wk) for wk in range(10) for _ in range(9)]
            + [("g", 10)] * 100 + [("h", 11)])
    df = spark.createDataFrame(rows, "g string, wk long")
    out = {(r.g, r.wk): r for r in
           c_chart(df, ["g"], "wk").collect()}
    assert out[("g", 10)].ooc == 1          # the spike
    assert out[("g", 0)].ooc == 0           # steady weeks in band
    assert ("g", 11) in out                 # grid completion
    assert out[("g", 11)].c == 0
    # exact decision replay: W=12, S=190, c=0 -> (0-190)^2 vs 9*190*12
    r = out[("g", 11)]
    assert (r.w_periods, r.c_total) == (12, 190)
    assert r.ooc == (1 if (12 * 0 - 190) ** 2 > 9 * 190 * 12 else 0)


def test_c_chart_limits_pinned(spark):
    df = spark.createDataFrame(
        [("g", w) for w in range(4) for _ in range(4)],
        "g string, wk long")
    r = c_chart(df, ["g"], "wk").collect()[0]
    import math
    assert r.cbar == pytest.approx(4.0)
    assert r.ucl == pytest.approx(4.0 + 3 * math.sqrt(4.0))
    assert r.lcl == pytest.approx(0.0)      # clamped at zero
    assert r.ooc == 0


def test_hurst_random_walk_increments(spark):
    # iid-ish hashed increments: H should land in a wide band around
    # 0.5 (this is a smoke on direction, the oracle pins the values)
    rows = [(1, i, (i * 7919) % 97) for i in range(512)]
    df = spark.createDataFrame(rows, "u long, t long, x long")
    out = hurst_rs(df, ["u"], ["t"], "x",
                   windows=(4, 8, 16, 32)).collect()
    assert len(out) == 4
    h = out[0].hurst
    assert 0.05 < h < 0.95
    assert all(r.hurst == h for r in out)


def test_hurst_python_differential(spark):
    import math
    vals = [((i * 104729) % 53) for i in range(96)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "u long, t long, x long")
    out = {r.w: r for r in hurst_rs(df, ["u"], ["t"], "x",
                                    windows=(4, 8)).collect()}
    for w in (4, 8):
        total, cnt = 0, 0
        for c0 in range(0, 96 - w + 1, w):
            chunk = vals[c0:c0 + w]
            s, ss = sum(chunk), sum(v * v for v in chunk)
            vnum = w * ss - s * s
            if vnum <= 0:
                continue
            pref, devs = 0, []
            for j, v in enumerate(chunk, 1):
                pref += v
                devs.append(w * pref - j * s)
            rng = max(devs) - min(devs)
            total += math.floor(rng / math.sqrt(vnum) * 1e6)
            cnt += 1
        assert out[w].n_chunks == cnt
        assert out[w].sum_rs_micro == total


def test_hurst_drops_flat_and_partial_chunks(spark):
    # 6 rows at w=4: one full constant chunk (dropped: zero variance)
    # and a 2-row tail (dropped: partial) -> no w=4 output row at all
    df = spark.createDataFrame(
        [(1, i, 7) for i in range(6)], "u long, t long, x long")
    out = hurst_rs(df, ["u"], ["t"], "x", windows=(4,)).collect()
    assert out == []


def test_hurst_rejects_tiny_window(spark):
    df = spark.createDataFrame([(1, 1, 1)], "u long, t long, x long")
    with pytest.raises(ValueError):
        hurst_rs(df, ["u"], ["t"], "x", windows=(1,))


# ---- recommender: weighted Slope-One ----

from mapbox_filter_spark.operators.cooccur import slope_one_topk


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "u long, i string, r long")


def test_slope_one_textbook(spark):
    # Lemire & Maclachlan's running example:
    # userA: itemI=1, itemJ=1.5 ; userB: itemI=2 -> P(B,J) = 2.5
    # (×2-scaled ratings keep everything integer: 2, 3, 4 -> pred 5)
    rows = [(1, "I", 2), (1, "J", 3), (2, "I", 4)]
    out = slope_one_topk(_ratings(spark, rows), "u", "i", "r",
                         k=3, min_support=1).collect()
    pb = [r for r in out if r.user == 2 and r.item == "J"]
    assert len(pb) == 1
    # dev(J,I): c=1, sum_diff = 3-2 = 1; P = (1 + 4*1)/1 = 5
    assert (pb[0].pred_num, pb[0].pred_den) == (5, 1)


def test_slope_one_weighted_multi_source(spark):
    # item K predicted from both I (2 co-raters) and J (1 co-rater):
    # weighted form sums numerators over sources
    rows = [(1, "I", 2), (1, "K", 4),
            (2, "I", 4), (2, "K", 4),
            (3, "J", 6), (3, "K", 10),
            (9, "I", 6), (9, "J", 4)]
    out = {r.item: r for r in slope_one_topk(
        _ratings(spark, rows), "u", "i", "r", k=5, min_support=1,
        predict_filter=F.col("u") == 9).collect()}
    k = out["K"]
    # dev(K,I): c=2, sum=(4-2)+(4-4)=2 ; dev(K,J): c=1, sum=10-6=4
    # P(9,K) = [(2 + 6*2) + (4 + 4*1)] / (2+1) = 22/3
    assert (k.pred_num, k.pred_den) == (22, 3)
    assert k.score_q == 22 * 1_000_000 // 3


def test_slope_one_excludes_rated_and_ranks(spark):
    rows = [(1, "A", 5), (1, "B", 1),
            (2, "A", 5), (2, "B", 1), (2, "C", 3),
            (7, "A", 5)]
    out = slope_one_topk(_ratings(spark, rows), "u", "i", "r",
                         k=5, min_support=1,
                         predict_filter=F.col("u") == 7).collect()
    items = {r.item for r in out}
    assert "A" not in items          # already rated
    assert items == {"B", "C"}
    by = {r.item: r for r in out}
    # B predicted low (dev B-A = -4), C mid (dev C-A = -2)
    assert by["C"].score_q > by["B"].score_q
    assert by["C"].rank == 1 and by["B"].rank == 2


def test_slope_one_min_support_prunes(spark):
    rows = [(1, "A", 5), (1, "B", 1), (2, "A", 5)]
    out = slope_one_topk(_ratings(spark, rows), "u", "i", "r",
                         k=5, min_support=2,
                         predict_filter=F.col("u") == 2).collect()
    assert out == []     # the single co-rating is below support


def test_slope_one_python_differential(spark):
    rows = [((i * 7) % 5, f"it{(i * 11) % 7}", 1 + (i * 13) % 9)
            for i in range(40)]
    # dedupe to one rating per (u, i): keep max
    best = {}
    for u, i, r in rows:
        best[(u, i)] = max(best.get((u, i), 0), r)
    flat = [(u, i, r) for (u, i), r in best.items()]
    out = slope_one_topk(_ratings(spark, flat), "u", "i", "r",
                         k=100, min_support=2).collect()
    byu = {}
    for u, i, r in flat:
        byu.setdefault(u, {})[i] = r
    from collections import defaultdict
    c = defaultdict(int)
    sd = defaultdict(int)
    for u, ri in byu.items():
        for j in ri:
            for i in ri:
                if i != j:
                    c[(j, i)] += 1
                    sd[(j, i)] += ri[j] - ri[i]
    expect = {}
    for u, ri in byu.items():
        for (j, i), cc in c.items():
            if cc >= 2 and i in ri and j not in ri:
                n, d = expect.get((u, j), (0, 0))
                expect[(u, j)] = (n + sd[(j, i)] + ri[i] * cc, d + cc)
    got = {(r.user, r.item): (r.pred_num, r.pred_den) for r in out}
    assert got == expect


# ---- interleaved-geo: span path geometry, Rayleigh heading test ----

from mapbox_filter_spark.operators.media import geo_span_path
from mapbox_filter_spark.operators.spatialstats import rayleigh_test


def _span_docs(spark, rows):
    # rows: list of (doc_id, [(kind, text, offset), ...])
    data = [(d, [{"kind": k, "text": t, "media_ref": None,
                  "offset": o} for k, t, o in sp]) for d, sp in rows]
    schema = ("doc_id long, spans array<struct<kind string, text string,"
              " media_ref string, offset int>>")
    return spark.createDataFrame(data, schema)


def test_geo_span_path_hand_case(spark):
    # 3-4-5 right turn: steps 3 and 4, net displacement 5
    df = _span_docs(spark, [
        (1, [("geo", "0,0", 0), ("text", "hi", 1),
             ("geo", "3,0", 2), ("geo", "3,4", 3)]),
        (2, [("geo", "7,7", 0)]),
        (3, [("text", "no geo here", 0)]),
    ])
    out = {r.doc_id: r for r in geo_span_path(df).collect()}
    r1 = out[1]
    assert r1.n_geo == 3
    assert r1.path_len_micro == 3_000_000 + 4_000_000
    assert r1.net_disp_micro == 5_000_000
    assert r1.bbox_area == 3 * 4
    r2 = out[2]
    assert (r2.n_geo, r2.path_len_micro, r2.net_disp_micro,
            r2.bbox_area) == (1, 0, 0, 0)
    assert 3 not in out           # no geo span -> no row


def test_geo_span_path_orders_by_offset(spark):
    # same points, scrambled offsets: path follows OFFSET order
    df = _span_docs(spark, [
        (1, [("geo", "10,0", 2), ("geo", "0,0", 0), ("geo", "5,0", 1)]),
    ])
    r = geo_span_path(df).collect()[0]
    assert r.path_len_micro == 10_000_000      # 0->5->10
    assert r.net_disp_micro == 10_000_000


def test_rayleigh_uniform_vs_directed(spark):
    # four cardinal steps cancel -> rbar 0; four identical steps -> 1
    un = spark.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    r = rayleigh_test(un).collect()[0]
    assert r.n_steps == 4
    assert r.rbar == pytest.approx(0.0, abs=1e-6)
    di = spark.createDataFrame([(3, 4)] * 4, "dx long, dy long")
    r2 = rayleigh_test(di).collect()[0]
    assert r2.rbar == pytest.approx(1.0, abs=1e-5)
    assert r2.z == pytest.approx(4.0, abs=1e-4)


def test_rayleigh_drops_zero_steps_and_python_differential(spark):
    import math
    steps = [((i * 7919) % 11 - 5, (i * 104729) % 9 - 4)
             for i in range(50)]
    df = spark.createDataFrame(steps + [(0, 0)], "dx long, dy long")
    r = rayleigh_test(df).collect()[0]
    live = [(dx, dy) for dx, dy in steps if dx * dx + dy * dy > 0]
    sc = sum(math.floor(dx / math.sqrt(dx * dx + dy * dy) * 1e6)
             for dx, dy in live)
    ss = sum(math.floor(dy / math.sqrt(dx * dx + dy * dy) * 1e6)
             for dx, dy in live)
    assert r.n_steps == len(live)
    assert (r.sum_cos_micro, r.sum_sin_micro) == (sc, ss)
    rbar = math.sqrt(sc * sc + ss * ss) / (len(live) * 1e6)
    assert r.rbar == pytest.approx(rbar)
    assert r.z == pytest.approx(len(live) * rbar * rbar)


# ---- distribution distance + reliability: W1, Cronbach's alpha ----

from mapbox_filter_spark.operators.rankstats import wasserstein_1d
from mapbox_filter_spark.operators.stats import cronbach_alpha


def _gv(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_wasserstein_identical_is_zero(spark):
    rows = [("a", x) for x in (1, 5, 9)] + [("b", x) for x in (1, 5, 9)]
    r = wasserstein_1d(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert r.w1_num == 0 and r.w1 == pytest.approx(0.0)


def test_wasserstein_point_masses(spark):
    # delta at 0 vs delta at 7 -> W1 = 7
    rows = [("a", 0)] * 3 + [("b", 7)] * 3
    r = wasserstein_1d(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.w1 == pytest.approx(7.0)


def test_wasserstein_scipy_free_differential(spark):
    a = [1, 1, 4, 6, 6, 9]
    b = [2, 3, 3, 7, 8]
    rows = [("a", x) for x in a] + [("b", x) for x in b]
    r = wasserstein_1d(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    # brute: integrate |F_A - F_B| over the merged grid
    grid = sorted(set(a) | set(b))
    total = 0
    for v, nxt in zip(grid, grid[1:]):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        total += abs(ca * len(b) - cb * len(a)) * (nxt - v)
    assert r.w1_num == total
    assert r.w1_den == len(a) * len(b)
    assert r.w1 == pytest.approx(total / (len(a) * len(b)))


def test_wasserstein_ignores_other_groups(spark):
    rows = [("a", 0), ("b", 4), ("zzz", 10**9)]
    r = wasserstein_1d(_gv(spark, rows), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (1, 1)
    assert r.w1 == pytest.approx(4.0)


def test_cronbach_perfectly_parallel_items(spark):
    # i2 = i1 + 3: equal variance, perfectly correlated -> alpha = 1
    # (a 2x-scaled item would NOT give 1: alpha is not scale-free)
    df = spark.createDataFrame(
        [(x, x + 3) for x in (1, 4, 9, 2, 7)], "i1 long, i2 long")
    r = cronbach_alpha(df, ["i1", "i2"]).collect()[0]
    assert r.alpha == pytest.approx(1.0)


def test_cronbach_python_differential(spark):
    import statistics
    rows = [((i * 7) % 5, (i * 11) % 7, (i * 13) % 4) for i in range(12)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    n = len(rows)
    cols = list(zip(*rows))
    tot = [sum(t) for t in rows]
    pvar = lambda xs: (n * sum(x * x for x in xs) - sum(xs) ** 2)
    num = sum(pvar(c) for c in cols)
    den = pvar(tot)
    assert (r.var_items_num, r.var_total_num) == (num, den)
    assert r.alpha == pytest.approx(3 / 2 * (1 - num / den))


def test_cronbach_rejects_single_item(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        cronbach_alpha(df, ["a"])


# ---- market allocation + inequality: Huff shares, Theil index ----

from mapbox_filter_spark.operators.cluster import huff_shares
from mapbox_filter_spark.operators.stats import theil_index


def test_huff_shares_textbook(spark):
    # one consumer at origin; store A (attract 2) at d2=4, store B
    # (attract 1) at d2=1: utilities 2s/4 vs 1s/1 -> shares 1/3, 2/3
    cons = spark.createDataFrame([(1, 0, 0)],
                                 "consumer_id long, x long, y long")
    st = spark.createDataFrame(
        [(10, 2, 2, 0), (20, 1, 0, 1)],
        "store_id long, attract long, x long, y long")
    out = {r.store_id: r for r in
           huff_shares(cons, st, scale=1000).collect()}
    assert out[10].t == 2 * 1000 // 4 and out[20].t == 1000
    assert out[10].share == pytest.approx(1 / 3)
    assert out[20].share == pytest.approx(2 / 3)
    assert out[10].share_den == 1500


def test_huff_colocated_consumer_d2_clamp(spark):
    # consumer on top of store: d2 clamps to 1, store takes ~all
    cons = spark.createDataFrame([(1, 5, 5)],
                                 "consumer_id long, x long, y long")
    st = spark.createDataFrame(
        [(10, 1, 5, 5), (20, 1, 105, 5)],
        "store_id long, attract long, x long, y long")
    out = {r.store_id: r for r in
           huff_shares(cons, st, scale=10**9).collect()}
    assert out[10].d2 == 1
    assert out[10].share > 0.999


def test_huff_store_bound_raises(spark):
    cons = spark.createDataFrame([(1, 0, 0)],
                                 "consumer_id long, x long, y long")
    st = spark.createDataFrame(
        [(i, 1, i, 0) for i in range(5)],
        "store_id long, attract long, x long, y long")
    with pytest.raises(ValueError):
        huff_shares(cons, st, max_stores=3)


def test_theil_equal_values_zero(spark):
    df = spark.createDataFrame([("g", 7)] * 5, "g string, x long")
    r = theil_index(df, ["g"], "x").collect()[0]
    assert r.theil == pytest.approx(0.0, abs=1e-5)


def test_theil_python_differential_and_concentration(spark):
    import math
    vals = [1, 1, 1, 1, 96]       # concentrated
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, x long")
    r = theil_index(df, ["g"], "x").collect()[0]
    s = sum(vals)
    qs = sum(v * math.floor(math.log(v) * 1e6 + 0.5) for v in vals)
    assert (r.n, r.s, r.sum_x_qln) == (5, s, qs)
    expect = qs / (s * 1e6) - math.log(s / 5)
    assert r.theil == pytest.approx(expect)
    assert r.theil > 1.0          # strong concentration


def test_theil_rejects_nonpositive(spark):
    df = spark.createDataFrame([("g", 0)], "g string, x long")
    with pytest.raises(Exception):
        theil_index(df, ["g"], "x").collect()
