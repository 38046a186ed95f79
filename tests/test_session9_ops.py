"""Session-9 operators: item-item CF, local clustering coefficient,
one-way ANOVA F, functional-dependency profiling — brute python
differentials and bound-guard checks."""

import math

import pytest


def test_item_item_topk_brute(spark):
    from mapbox_filter_spark.operators.cooccur import item_item_topk
    # baskets: {1,2,3}, {1,2}, {1,3}, {2,3}, {1,2}
    rows = [(10, 1), (10, 2), (10, 3),
            (20, 1), (20, 2),
            (30, 1), (30, 3),
            (40, 2), (40, 3),
            (50, 1), (50, 2), (50, 2)]  # dup (50,2) collapses
    df = spark.createDataFrame(rows, "b long, i long")
    got = {(r.item, r.rank): (r.neighbor, r.n_ij, r.score_q)
           for r in item_item_topk(df, "b", "i", k=2, min_cooc=2,
                                   scale=10**6).collect()}
    # counts: n_1=4, n_2=4, n_3=3; cooc 12=3, 13=2, 23=2
    s12 = (3 * 3 * 10**6) // (4 * 4)   # 562500
    s13 = (2 * 2 * 10**6) // (4 * 3)   # 333333
    s23 = (2 * 2 * 10**6) // (4 * 3)   # 333333
    assert got[(1, 1)] == (2, 3, s12)
    assert got[(1, 2)] == (3, 2, s13)
    assert got[(2, 1)] == (1, 3, s12)
    assert got[(2, 2)] == (3, 2, s23)
    assert got[(3, 1)] == (1, 2, s13)  # tie on score -> neighbor asc
    assert got[(3, 2)] == (2, 2, s23)


def test_local_clustering_triangle_plus_pendant(spark):
    from mapbox_filter_spark.operators.graph import local_clustering
    # triangle 1-2-3 plus pendant 4 hanging off 1
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long")
    got = {r.node: (r.deg, r.n_tri, r.coeff_q)
           for r in local_clustering(e, scale=1000).collect()}
    assert got[1] == (3, 1, (2 * 1 * 1000) // (3 * 2))  # 333
    assert got[2] == (2, 1, 1000)
    assert got[3] == (2, 1, 1000)
    assert got[4] == (1, 0, None)


def _py_anova(groups):
    vals = [x for g in groups for x in g]
    n, k = len(vals), len(groups)
    t = sum((sum(g) ** 2) // len(g) for g in groups)
    s, q = sum(vals), sum(x * x for x in vals)
    ssb = max(0, t - (s * s) // n)
    ssw = q - t
    f = (float(ssb) * float(n - k)) / (float(ssw) * float(k - 1)) \
        if k > 1 and ssw > 0 else None
    return n, k, ssb, ssw, f


def test_anova_f_replay(spark):
    from mapbox_filter_spark.operators.stats import anova_f
    groups = {"a": [10, 12, 11, 9], "b": [20, 22, 21], "c": [10, 21, 30]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_f(df, "g", "v").collect()[0]
    n, k, ssb, ssw, f = _py_anova(list(groups.values()))
    assert (r.n, r.k, r.ssb_q, r.ssw_q) == (n, k, ssb, ssw)
    assert r.f_stat == f


def test_anova_f_degenerate_single_group(spark):
    from mapbox_filter_spark.operators.stats import anova_f
    df = spark.createDataFrame([("a", 1), ("a", 5)], "g string, v long")
    r = anova_f(df, "g", "v").collect()[0]
    assert r.k == 1 and r.f_stat is None


def test_anova_f_bound_guard_raises(spark):
    from mapbox_filter_spark.operators.stats import anova_f
    big = 2_000_000_000
    df = spark.createDataFrame(
        [("a", big), ("a", big), ("b", 1), ("b", 2)], "g string, v long")
    with pytest.raises(Exception, match="exact-int64 bound"):
        anova_f(df, "g", "v").collect()


def test_fd_profile_g3(spark):
    from mapbox_filter_spark.operators.analytics import fd_profile
    # lhs=1 maps to x,x,y (violates, g3=1); lhs=2 maps to z,z (holds)
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "z"), (2, "z")],
        "a long, b string")
    r = fd_profile(df, "a", "b").collect()[0]
    assert r.fd == "a->b"
    assert (r.lhs_groups, r.violating_groups, r.n_rows, r.g3_del) == \
        (2, 1, 5, 1)


def test_fd_profile_multi_lhs(spark):
    from mapbox_filter_spark.operators.analytics import fd_profile
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 1, "y"), (1, 2, "x")],
        "a long, b long, c string")
    r = fd_profile(df, ["a", "b"], "c", fd_name="ab->c").collect()[0]
    assert r.fd == "ab->c"
    assert (r.lhs_groups, r.violating_groups, r.g3_del) == (2, 1, 1)


def test_rake_phrases_hand_example(spark):
    from mapbox_filter_spark.operators.text import rake_phrases
    # doc: "deep learning of deep nets" stop={of}
    # phrases: "deep learning" (len2), "deep nets" (len2)
    # freq: deep=2, learning=1, nets=1; deg: deep=4, learning=2, nets=2
    # wscore(scale=10): deep=(4*10)//2=20, learning=20, nets=20
    # phrase scores: both 40; n=1 each
    df = spark.createDataFrame(
        [(1, "deep learning of deep nets")], "doc_id long, text string")
    rows = rake_phrases(df, "doc_id", "text", stopwords=("of",),
                        k=10, scale=10).collect()
    got = {r.phrase: (r.n, r.score_q) for r in rows}
    assert got == {"deep learning": (1, 40), "deep nets": (1, 40)}


def test_rake_phrases_repeated_phrase_counts(spark):
    from mapbox_filter_spark.operators.text import rake_phrases
    df = spark.createDataFrame(
        [(1, "big data the big data"), (2, "big data")],
        "doc_id long, text string")
    rows = rake_phrases(df, "doc_id", "text", stopwords=("the",),
                        k=10, scale=100).collect()
    # three identical "big data" phrases; freq(big)=3 deg=6 -> 200 each
    assert [(r.phrase, r.n, r.score_q) for r in rows] == \
        [("big data", 3, 400)]


def test_prefix_topk(spark):
    from mapbox_filter_spark.operators.retrieval import prefix_topk
    df = spark.createDataFrame(
        [("spark spark spark scan scan sort",)], "text string")
    rows = prefix_topk(df, "text", max_prefix=2, k=2,
                       min_count=1).collect()
    got = {(r.prefix, r.rank): (r.token, r.n) for r in rows}
    assert got[("s", 1)] == ("spark", 3)
    assert got[("s", 2)] == ("scan", 2)
    assert got[("sp", 1)] == ("spark", 3)
    assert got[("sc", 1)] == ("scan", 2)
    assert got[("so", 1)] == ("sort", 1)


def test_reciprocity_mixed_graph(spark):
    from mapbox_filter_spark.operators.graph import reciprocity
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (5, 1), (2, 2)],
        "src long, dst long")
    got = {r.node: (r.out_deg, r.n_recip, r.recip_q)
           for r in reciprocity(e, scale=100).collect()}
    assert got[1] == (3, 2, (2 * 100) // 3)   # 2,3 mutual; 4 not
    assert got[2] == (1, 1, 100)
    assert got[3] == (1, 1, 100)
    assert got[5] == (1, 0, 0)
    assert 4 not in got  # no out-edges (self-loop 2->2 dropped)


def test_business_days_exact(spark):
    from mapbox_filter_spark.operators.temporal import business_days
    import datetime as dt
    cases = [
        # Mon 1995-01-02 -> Fri 1995-01-06: 4 busdays
        (dt.datetime(1995, 1, 2), dt.datetime(1995, 1, 6), 4),
        # Fri -> next Mon: 1 busday
        (dt.datetime(1995, 1, 6), dt.datetime(1995, 1, 9), 1),
        # Sat -> Sun same weekend: 0
        (dt.datetime(1995, 1, 7), dt.datetime(1995, 1, 8), 0),
        # full week Mon -> next Mon: 5
        (dt.datetime(1995, 1, 2), dt.datetime(1995, 1, 9), 5),
        # reversed: negative
        (dt.datetime(1995, 1, 9), dt.datetime(1995, 1, 2), -5),
    ]
    df = spark.createDataFrame(
        [(a, b, exp) for a, b, exp in cases],
        "d0 timestamp, d1 timestamp, exp long")
    rows = df.select(business_days("d0", "d1").alias("bd"),
                     "exp").collect()
    for r in rows:
        assert r.bd == r.exp


def test_runs_test_hand_sequence(spark):
    from mapbox_filter_spark.operators.rankstats import runs_test
    # values in order: 5 1 6 2 7 3 8 (alternating) median=5 (r4 of 7)
    # drop the 5; signs of 1 6 2 7 3 8 -> 0 1 0 1 0 1: runs=6
    vals = [5, 1, 6, 2, 7, 3, 8]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "g string, seq long, v long")
    r = runs_test(df, ["g"], "seq", "v").collect()[0]
    assert (r.n1, r.n0, r.runs) == (3, 3, 6)
    n, n1, n0, R = 6, 3, 3, 6
    a = n * (R - 1) - 2 * n1 * n0
    rad = 2 * n1 * n0 * (2 * n1 * n0 - n)
    assert r.z == float(a) * math.sqrt(float(n - 1)) / math.sqrt(
        float(rad))


def test_runs_test_one_sided_null_z(spark):
    from mapbox_filter_spark.operators.rankstats import runs_test
    # all values equal except one above: n0=0 -> z NULL
    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 1), ("a", 2, 9)],
        "g string, seq long, v long")
    r = runs_test(df, ["g"], "seq", "v").collect()[0]
    assert r.n0 == 0 and r.z is None


def test_seasonal_decompose_daily(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import (
        seasonal_decompose_daily)
    # 14 days, count = 1 except two Mondays with 3
    rows = []
    eid = 0
    for d in range(14):
        day = dt.datetime(1995, 1, 2) + dt.timedelta(days=d)
        n = 3 if day.weekday() == 0 else 1
        for _ in range(n):
            rows.append((day + dt.timedelta(hours=1),))
            eid += 1
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r.day_us: r for r in
           seasonal_decompose_daily(df, "ts").collect()}
    import calendar
    first = dt.datetime(1995, 1, 2, tzinfo=dt.timezone.utc)
    k0 = int(first.timestamp() * 1_000_000)
    r0 = out[k0]
    assert r0.dow == 0 and r0.n == 3
    # trend at day 0: days 0..3 = 3+1+1+1 = 6 (partial window)
    assert r0.trend7_sum == 6
    # Monday cohort: two Mondays, both 3 -> dev 3*2-6 = 0
    assert (r0.n_w, r0.s_w, r0.dev_num) == (2, 6, 0)
    # a Tuesday: n=1, cohort 2 days sum 2 -> dev 0; day-1 partial
    # calendar window spans days 0..4 = 3+1+1+1+1 = 7
    k1 = k0 + 86_400_000_000
    r1 = out[k1]
    assert r1.dow == 1 and r1.trend7_sum == 3 + 1 + 1 + 1 + 1 == 7


def test_burstiness_regular_vs_bursty(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.analytics import burstiness
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly regular 60s gaps -> sigma=0 -> B=-1
    for i in range(5):
        rows.append((1, base + dt.timedelta(seconds=60 * i), i))
    # user 2: gaps 10, 10, 1000 -> bursty, B>0
    t = base
    for i, g in enumerate([0, 10, 10, 1000]):
        t = t + dt.timedelta(seconds=g)
        rows.append((2, t, 100 + i))
    df = spark.createDataFrame(rows, "u long, ts timestamp, eid long")
    got = {r.key: r for r in burstiness(df, "u", "ts", "eid").collect()}
    assert got[1].n_gaps == 4 and got[1].d_term == 0
    assert got[1].b == -1.0
    g2 = got[2]
    n, s, q = 3, 1020, 10 * 10 + 10 * 10 + 1000 * 1000
    d = n * q - s * s
    assert (g2.n_gaps, g2.s_sum, g2.d_term) == (n, s, d)
    exp = (math.sqrt(float(d)) - float(s)) / (math.sqrt(float(d))
                                              + float(s))
    assert g2.b == exp and g2.b > 0


def _tarjan(edges):
    from collections import defaultdict
    g = defaultdict(list)
    for a, b in edges:
        g[a].append(b)
    nodes = set(g) | {b for _, b in edges}
    idx, low, onstk, stk, out, cnt = {}, {}, set(), [], {}, [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                idx[v] = low[v] = cnt[0]
                cnt[0] += 1
                stk.append(v)
                onstk.add(v)
            recurse = False
            for i in range(pi, len(g[v])):
                w = g[v][i]
                if w not in idx:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[v] = min(low[v], idx[w])
            if recurse:
                continue
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in list(nodes):
        if v not in idx:
            strongconnect(v)
    return out


def test_scc_labels_hand_graph(spark):
    from mapbox_filter_spark.operators.graph import scc_labels
    # two 3-cycles bridged one-way + a tail
    e = [(1, 2), (2, 3), (3, 1),        # scc {1,2,3}
         (3, 10), (10, 11), (11, 12), (12, 10),   # scc {10,11,12}
         (12, 99)]                      # singleton 99
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r.node: (r.scc, r.scc_size)
           for r in scc_labels(df).collect()}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[10] == (10, 3) and got[12] == (10, 3)
    assert got[99] == (99, 1)


def test_scc_labels_random_vs_tarjan(spark):
    import random
    from mapbox_filter_spark.operators.graph import scc_labels
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = list({(rng.randrange(n), rng.randrange(n))
                      for _ in range(70)})
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.scc for r in scc_labels(df).collect()}
        assert got == _tarjan(edges), f"trial {trial}"


def test_fellegi_weights_hand_counts(spark):
    from mapbox_filter_spark.operators.analytics import fellegi_weights
    rows = [
        # match, f1, f2
        (True, True, False),
        (True, True, True),
        (False, False, True),
        (False, True, False),
        (False, False, False),
    ]
    df = spark.createDataFrame(rows, "match boolean, f1 boolean, "
                                     "f2 boolean")
    got = {r.feature: r for r in
           fellegi_weights(df, "match", ["f1", "f2"]).collect()}
    r = got["f1"]
    assert (r.n_match, r.agree_match, r.n_nonmatch,
            r.agree_nonmatch) == (2, 2, 3, 1)
    assert r.weight == math.log((3 * 5) / (4 * 2))
    r2 = got["f2"]
    assert (r2.agree_match, r2.agree_nonmatch) == (1, 1)
    assert r2.weight == math.log((2 * 5) / (4 * 2))


def test_zone_map_prune_report(spark):
    from mapbox_filter_spark.operators.zonemap import (
        zone_map, zone_map_prune_report)
    rows = [(0, 5), (0, 9), (1, 20), (1, 30), (2, 8), (2, 25)]
    df = spark.createDataFrame(rows, "f long, v long")
    zm = zone_map(df, "f", "v")
    got = {r.file_id: (r.n_rows, r.vmin, r.vmax) for r in zm.collect()}
    assert got == {0: (2, 5, 9), 1: (2, 20, 30), 2: (2, 8, 25)}
    # predicate [10, 15]: file0 pruned (max 9 < 10), file1 pruned
    # (min 20 > 15), file2 overlaps -> kept
    r = zone_map_prune_report(zm, 10, 15).collect()[0]
    assert (r.n_files, r.n_pruned, r.rows_total, r.rows_skipped) == \
        (3, 2, 6, 4)


def test_winsorize_profile_hand(spark):
    from mapbox_filter_spark.operators.stats import winsorize_profile
    vals = list(range(1, 21)) + [1000]   # 21 values, one outlier
    df = spark.createDataFrame([("a", v) for v in vals],
                               "g string, v long")
    r = winsorize_profile(df, ["g"], "v", lo_q=5, hi_q=95).collect()[0]
    n = 21
    lo_rank = (n * 5 + 99) // 100    # 2 -> value 2
    hi_rank = (n * 95 + 99) // 100   # 20 -> value 20
    assert (r.n, r.lo_c, r.hi_c) == (21, 2, 20)
    assert (r.n_clip_lo, r.n_clip_hi) == (1, 1)   # value 1 and 1000
    assert r.sum_c == sum(vals)
    assert r.winsorized_sum_c == sum(
        max(min(v, 20), 2) for v in vals)


def test_vocab_growth_monotone_and_total(spark):
    from mapbox_filter_spark.operators.text import vocab_growth
    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "alpha gamma delta")
         for i in range(10)], "doc_id long, text string")
    rows = sorted(vocab_growth(df, "doc_id", "text", deciles=5)
                  .collect())
    assert [r.decile for r in rows] == [1, 2, 3, 4, 5]
    vocabs = [r.vocab for r in rows]
    assert vocabs == sorted(vocabs)          # monotone non-decreasing
    assert vocabs[-1] == 4                   # alpha beta gamma delta
    assert rows[-1].n_docs == 10


def test_peak_concurrency_tie_rule(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import peak_concurrency
    d = dt.datetime
    # interval A [1,3), B [3,5): at t=3 the close of A processes
    # before the open of B -> peak stays 1
    iv = spark.createDataFrame(
        [(d(1995, 1, 2), d(1995, 1, 4)),
         (d(1995, 1, 4), d(1995, 1, 6)),
         (d(1995, 1, 3), d(1995, 1, 5))],   # overlaps both -> peak 2
        "s timestamp, e timestamp")
    rows = {r.week: r.max_open
            for r in peak_concurrency(iv, "s", "e").collect()}
    assert rows == {1: 2}  # all within week 1 (anchor 1994-12-26)


def test_two_proportion_z_hand(spark):
    from mapbox_filter_spark.operators.analytics import two_proportion_z
    df = spark.createDataFrame(
        [(1, 100, 20), (2, 100, 35), (3, 50, 0)],
        "b long, n long, a long")
    rows = {r.bucket: r for r in
            two_proportion_z(df, "b", "n", "a").collect()}
    r2 = rows[2]
    num = 20 * 100 - 35 * 100
    n_tot, a_tot = 200, 55
    rad = 100 * 100 * 55 * (200 - 55)
    assert r2.z == float(num) * math.sqrt(float(n_tot)) / math.sqrt(
        float(rad))
    assert r2.z < 0   # conversion went UP week-over-week
    r3 = rows[3]
    assert (r3.n_prev, r3.a_prev, r3.n_cur, r3.a_cur) == \
        (100, 35, 50, 0)
    assert r3.z is not None   # pooled 35/150 not degenerate
    assert 1 not in rows      # no predecessor


def test_curve_locality_unit_square(spark):
    from mapbox_filter_spark.geo.hilbert import py_hilbert_d
    from mapbox_filter_spark.queries_geom import q_curve_locality  # noqa
    # direct check of the jump math on a full 4x4 grid via the
    # python hilbert reference
    order = 2
    jumps_h = []
    for x in range(4):
        for y in range(4):
            for dx, dy in ((1, 0), (0, 1)):
                nx, ny = x + dx, y + dy
                if nx < 4 and ny < 4:
                    jumps_h.append(abs(
                        py_hilbert_d(nx, ny, order)
                        - py_hilbert_d(x, y, order)))
    # hilbert on full grid: every curve step is a spatial neighbor,
    # so at least 15 of the 24 neighbor pairs have jump 1
    assert sum(1 for j in jumps_h if j == 1) >= 15
    assert max(jumps_h) <= 15


def _mk_spans(spark, spans):
    rows = [(1, [(k, t, m, o) for (k, t, m, o) in spans])]
    return spark.createDataFrame(
        rows, "doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")


def test_media_context_windows(spark):
    from mapbox_filter_spark.operators.media import media_context_windows
    # shuffled input order; media at offset 2 with text at 0,1,4
    df = _mk_spans(spark, [
        ("text", "far", None, 0),
        ("media", None, "m://a", 2),
        ("text", "near", None, 1),
        ("text", "after", None, 4),
        ("geo", "1,2", None, 3),
    ])
    rows = media_context_windows(df, window=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # offsets 0,1,4 within +-2 of 2: 0,1,4 all qualify -> sorted order
    assert (r.media_ref, r.offset, r.n_ctx) == ("m://a", 2, 3)
    assert r.context_text == "far near after"


def test_media_context_windows_empty_context(spark):
    from mapbox_filter_spark.operators.media import media_context_windows
    df = _mk_spans(spark, [
        ("media", None, "m://b", 0),
        ("text", "distant", None, 9),
    ])
    r = media_context_windows(df, window=2).collect()[0]
    assert r.context_text is None and r.n_ctx == 0


def test_interleave_profile(spark):
    from mapbox_filter_spark.operators.media import interleave_profile
    df = _mk_spans(spark, [
        ("text", "ab", None, 0),
        ("media", None, "m://a", 1),
        ("text", "cde", None, 2),
        ("text", None, None, 3),     # NULL text counts 0 chars
        ("geo", "1,2", None, 4),
    ])
    r = interleave_profile(df).collect()[0]
    assert (r.n_spans, r.n_text, r.n_media, r.n_geo) == (5, 3, 1, 1)
    # kinds in order: text media text text geo -> switches at 3 spots
    assert r.n_switches == 3
    assert r.text_chars == 2 + 3 + 0


def test_discrete_mi_hand(spark):
    from mapbox_filter_spark.operators.analytics import discrete_mi
    # perfectly dependent: x == y -> MI = H(X) = ln 2 for balanced
    rows = [(0, 0)] * 5 + [(1, 1)] * 5
    df = spark.createDataFrame(rows, "x int, y int")
    r = discrete_mi(df, "x", "y", (0, 1), (0, 1)).collect()[0]
    assert r.n == 10
    assert abs(r.mi_nats - math.log(2)) < 1e-12
    # independent uniform -> MI = 0
    rows2 = [(x, y) for x in (0, 1) for y in (0, 1) for _ in range(3)]
    df2 = spark.createDataFrame(rows2, "x int, y int")
    r2 = discrete_mi(df2, "x", "y", (0, 1), (0, 1)).collect()[0]
    assert abs(r2.mi_nats) < 1e-12
    # out-of-enumeration rows excluded
    df3 = spark.createDataFrame(rows + [(7, 0)], "x int, y int")
    r3 = discrete_mi(df3, "x", "y", (0, 1), (0, 1)).collect()[0]
    assert r3.n == 10


def test_welch_t_replay(spark):
    from mapbox_filter_spark.operators.stats import welch_t
    a = [10, 12, 14, 16]
    b = [9, 9, 10]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 99)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_t(df, "g", "v", "a", "b").collect()[0]
    na, sa, qa = len(a), sum(a), sum(v * v for v in a)
    nb, sb, qb = len(b), sum(b), sum(v * v for v in b)
    da, db_ = na * qa - sa * sa, nb * qb - sb * sb
    assert (r.n_a, r.s_a, r.d_a, r.n_b, r.s_b, r.d_b) == \
        (na, sa, da, nb, sb, db_)
    va = float(da) / ((float(na) - 1.0) * (float(na) * float(na)))
    vb = float(db_) / ((float(nb) - 1.0) * (float(nb) * float(nb)))
    exp = ((float(sa) / float(na)) - (float(sb) / float(nb))) \
        / math.sqrt(va + vb)
    assert r.t == exp and r.t > 0


def test_cohort_ltv_triangle(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.analytics import cohort_ltv
    d = dt.datetime
    rows = [
        (1, d(1995, 1, 5), 100),    # cohort Jan-95
        (1, d(1995, 2, 5), 50),     # age 1
        (1, d(1995, 2, 20), 25),    # age 1 again
        (2, d(1995, 1, 9), 10),     # same cohort
        (3, d(1995, 3, 1), 7),      # cohort Mar-95
    ]
    df = spark.createDataFrame(rows, "cust long, dt timestamp, c long")
    got = {(r.cohort_month, r.month_age): r
           for r in cohort_ltv(df, "cust", "dt", "c").collect()}
    jan = (1995 - 1970) * 12 + 0
    mar = jan + 2
    assert got[(jan, 0)].revenue_u == 110
    assert got[(jan, 0)].n_customers == 2
    assert got[(jan, 1)].revenue_u == 75
    assert got[(jan, 1)].cum_revenue_u == 185
    assert got[(mar, 0)].n_customers == 1
    assert got[(mar, 0)].cum_revenue_u == 7


def test_poisson_bootstrap_ci(spark):
    from mapbox_filter_spark.operators.stats import poisson_bootstrap_ci
    rows = [(i, 100 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = poisson_bootstrap_ci(df, "id", "v", n_replicas=40).collect()[0]
    assert r.n == 500 and r.b_replicas == 40
    exact_mean = sum(v for _, v in rows) / 500
    assert r.mean == exact_mean
    # interval must bracket the mean and be tight for this variance
    assert r.lo_mean <= exact_mean <= r.hi_mean
    assert r.hi_mean - r.lo_mean < 2.0
    # determinism: a second run bit-matches
    r2 = poisson_bootstrap_ci(df, "id", "v", n_replicas=40).collect()[0]
    assert (r.lo_mean, r.hi_mean) == (r2.lo_mean, r2.hi_mean)


def test_auc_score_hand(spark):
    # regression: the rank window referenced the pre-rename column
    # (session-8 latent bug caught by the full-suite oracle run)
    from mapbox_filter_spark.operators.metrics import auc_score
    rows = [("g", 10, 0), ("g", 20, 0), ("g", 30, 1), ("g", 40, 1),
            ("g", 25, 0)]
    df = spark.createDataFrame(rows, "g string, score long, y long")
    r = auc_score(df, ["g"], "score", "y").collect()[0]
    # positives at 30,40 beat all three negatives -> AUC = 1.0
    assert (r.n_pos, r.n_neg) == (2, 3)
    assert r.auc == 1.0
    # with a tie: score 25 positive vs 25 negative contributes 0.5
    rows2 = [("g", 25, 1), ("g", 25, 0), ("g", 10, 0)]
    r2 = auc_score(spark.createDataFrame(
        rows2, "g string, score long, y long"), ["g"], "score",
        "y").collect()[0]
    assert r2.auc == 0.75


def test_markov_stationary_two_state(spark):
    from mapbox_filter_spark.operators.analytics import markov_stationary
    # chain: A->B always, B->A always -> stationary (0.5, 0.5)
    tr = spark.createDataFrame(
        [("A", "B", 10, 10), ("B", "A", 7, 7)],
        "prev string, cur string, n long, n_from long")
    got = {r.state: r.pi_q
           for r in markov_stationary(tr, iters=6,
                                      scale=10**6).collect()}
    assert got == {"A": 500000, "B": 500000}
    # biased chain: A->A 3/4, A->B 1/4; B->A always
    # stationary: pi_A = 4/5, pi_B = 1/5
    tr2 = spark.createDataFrame(
        [("A", "A", 3, 4), ("A", "B", 1, 4), ("B", "A", 5, 5)],
        "prev string, cur string, n long, n_from long")
    got2 = {r.state: r.pi_q
            for r in markov_stationary(tr2, iters=40,
                                       scale=10**6).collect()}
    assert abs(got2["A"] - 800000) < 200   # floor-quantization drift
    assert abs(got2["B"] - 200000) < 200


def test_k_truss_hand_graph(spark):
    from mapbox_filter_spark.operators.graph import k_truss
    # K4 on {1,2,3,4} plus a triangle {5,6,7} glued by edge 4-5 and
    # a dangling edge 7-9
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    e = k4 + [(5, 6), (6, 7), (5, 7), (4, 5), (7, 9)]
    df = spark.createDataFrame(e, "src long, dst long")
    # 4-truss (support >= 2): only K4 survives, each edge in 2 tri
    t4 = {(r.u, r.v): r.support for r in k_truss(df, 4).collect()}
    assert set(t4) == set(k4) and all(s == 2 for s in t4.values())
    # 3-truss (support >= 1): K4 + the triangle; bridge + dangle drop
    t3 = {(r.u, r.v) for r in k_truss(df, 3).collect()}
    assert t3 == set(k4) | {(5, 6), (6, 7), (5, 7)}


def test_haar_energy_hand_series(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import haar_energy
    # 4 days with counts 3,1,4,2
    rows = []
    for d, n in enumerate([3, 1, 4, 2]):
        for _ in range(n):
            rows.append(("a", dt.datetime(2024, 1, 1 + d, 12),))
    df = spark.createDataFrame(
        [(g, t) for g, t in rows], "g string, ts timestamp")
    got = {r.level: (r.n_coeffs, r.energy_u)
           for r in haar_energy(df, "ts", ("g",), levels=2).collect()}
    # L1 details: 3-1=2, 4-2=2 -> energy 8; approx 4,6
    # L2 detail: 4-6=-2 -> energy 4
    assert got[1] == (2, 8)
    assert got[2] == (1, 4)


def test_haar_energy_odd_tail(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import haar_energy
    rows = []
    for d, n in enumerate([5, 2, 7]):   # odd length
        for _ in range(n):
            rows.append(("a", dt.datetime(2024, 2, 1 + d, 8)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.level: (r.n_coeffs, r.energy_u)
           for r in haar_energy(df, "ts", ("g",), levels=1).collect()}
    # pairs: (5,2) d=3; (7, implicit 0) d=7 -> 9 + 49
    assert got[1] == (2, 58)


def test_boruvka_msf_vs_kruskal(spark):
    import random

    from mapbox_filter_spark.operators.graph import boruvka_msf

    def kruskal(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        forest = []
        for w, u, v in sorted((w, u, v) for u, v, w in edges):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                forest.append((u, v, w))
        return sorted(forest)

    rng = random.Random(23)
    for trial in range(2):
        n = 25
        raw = list({(min(a, b), max(a, b))
                    for a, b in ((rng.randrange(n), rng.randrange(n))
                                 for _ in range(50)) if a != b})
        edges = [(u, v, rng.randrange(10**6)) for u, v in raw]
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = sorted((r.u, r.v, r.w)
                     for r in boruvka_msf(df).collect())
        assert got == kruskal(edges), f"trial {trial}"


def test_boruvka_msf_forest_two_components(spark):
    from mapbox_filter_spark.operators.graph import boruvka_msf
    # two disjoint triangles -> forest of 2+2 edges
    e = [(1, 2, 5), (2, 3, 1), (1, 3, 2),
         (10, 11, 9), (11, 12, 4), (10, 12, 3)]
    df = spark.createDataFrame(e, "src long, dst long, w long")
    got = sorted((r.u, r.v, r.w) for r in boruvka_msf(df).collect())
    assert got == [(1, 3, 2), (2, 3, 1), (10, 12, 3), (11, 12, 4)]


def test_psi_drift_identical_and_shifted(spark):
    from mapbox_filter_spark.operators.analytics import psi_drift
    # identical distributions -> PSI ~ 0 (exactly 0 with equal counts)
    rows = [("a", b) for b in (0, 0, 1, 2)] + \
           [("b", b) for b in (0, 0, 1, 2)]
    df = spark.createDataFrame(rows, "p string, vb int")
    r = psi_drift(df, "p", "vb", (0, 1, 2), "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (4, 4) and r.psi == 0.0
    # fully shifted -> large PSI
    rows2 = [("a", 0)] * 10 + [("b", 2)] * 10
    r2 = psi_drift(spark.createDataFrame(rows2, "p string, vb int"),
                   "p", "vb", (0, 1, 2), "a", "b").collect()[0]
    assert r2.psi > 1.0


def test_table_checksum_detects_any_change(spark):
    from mapbox_filter_spark.operators.analytics import table_checksum
    rows = [(i, i % 3) for i in range(200)]
    a = spark.createDataFrame(rows, "k long, l long")
    b = spark.createDataFrame(rows, "k long, l long").repartition(7)
    ca = sorted(map(tuple, table_checksum(a, ["k", "l"]).collect()))
    cb = sorted(map(tuple, table_checksum(b, ["k", "l"]).collect()))
    assert ca == cb                      # partitioning-invariant
    # drop one row -> root and exactly one bucket differ
    c = spark.createDataFrame(rows[:-1], "k long, l long")
    cc = sorted(map(tuple, table_checksum(c, ["k", "l"]).collect()))
    assert cc != ca
    diffs = [x for x, y in zip(ca, cc) if x != y] if len(ca) == len(cc) \
        else None
    root_a = [t for t in ca if t[0] == -1][0]
    root_c = [t for t in cc if t[0] == -1][0]
    assert root_a[1] == 200 and root_c[1] == 199
    assert root_a[2] != root_c[2]


def test_nelson_aalen_hand(spark):
    from mapbox_filter_spark.operators.stats import nelson_aalen
    # 4 subjects: events at t=1 (d=1, n=4), t=3 (d=1, n=2);
    # censored at t=2 and t=3
    subj = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 3, 0)],
        "seg string, dur long, event long")
    rows = {r.dur: r for r in
            nelson_aalen(subj, ["seg"], "dur", "event",
                         scale=1000).collect()}
    assert set(rows) == {1, 3}
    r1 = rows[1]
    assert (r1.n_risk, r1.n_event) == (4, 1)
    assert r1.hazard_nano == 250      # 1/4 * 1000
    r3 = rows[3]
    assert (r3.n_risk, r3.n_event, r3.n_censor) == (2, 1, 1)
    assert r3.hazard_nano == 250 + 500   # + 1/2 * 1000


def test_diff_in_diff_hand(spark):
    from mapbox_filter_spark.operators.analytics import diff_in_diff
    rows = [("t", "pre", 10), ("t", "pre", 12),    # mean 11
            ("t", "post", 30), ("t", "post", 32),  # mean 31 (+20)
            ("c", "pre", 5), ("c", "post", 10)]    # +5
    df = spark.createDataFrame(rows, "g string, p string, y long")
    r = diff_in_diff(df, "g", "p", "y",
                     treat="t", pre="pre", post="post").collect()[0]
    assert (r.n_tpre, r.s_tpre, r.n_tpost) == (2, 22, 2)
    assert r.did == (31.0 - 11.0) - (10.0 - 5.0)   # 15.0
    # empty cell -> NULL
    df2 = spark.createDataFrame(rows[:4], "g string, p string, y long")
    assert diff_in_diff(df2, "g", "p", "y", treat="t", pre="pre",
                        post="post").collect()[0].did is None


def test_join_size_stats_exact(spark):
    from mapbox_filter_spark.operators.analytics import join_size_stats
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    r = join_size_stats(a, b, "k", "k").collect()[0]
    assert (r.keys_a, r.rows_a, r.keys_b, r.rows_b) == (3, 4, 3, 4)
    # key 1: 2*1=2; key 2: 1*2=2 -> join 4 rows, max per key 2
    assert (r.matching_keys, r.join_rows, r.max_key_rows) == (2, 4, 2)
    # verify against the actual join
    assert a.join(b, "k").count() == r.join_rows


def test_peak_concurrency_carry_in_weeks(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import peak_concurrency
    d = dt.datetime
    # one interval spanning 3+ weeks: weeks with NO events must still
    # report the carried-in open count (review regression)
    iv = spark.createDataFrame(
        [(d(1995, 1, 2), d(1995, 1, 20))], "s timestamp, e timestamp")
    rows = {r.week: r.max_open
            for r in peak_concurrency(iv, "s", "e").collect()}
    # anchor 1994-12-26: weeks 1 (open), 2 (event-less), 3 (close)
    assert rows == {1: 1, 2: 1, 3: 1}


def test_markov_stationary_absorbing_sink(spark):
    from mapbox_filter_spark.operators.analytics import markov_stationary
    # A -> B always; B is a sink -> all mass ends in B (review
    # regression: sink mass was silently dropped)
    tr = spark.createDataFrame(
        [("A", "B", 5, 5)], "prev string, cur string, n long, n_from long")
    got = {r.state: r.pi_q
           for r in markov_stationary(tr, iters=3,
                                      scale=10**6).collect()}
    assert got == {"B": 10**6}


def test_haar_energy_calendar_gap(spark):
    import datetime as dt
    from mapbox_filter_spark.operators.temporal import haar_energy
    # events on day 0 and day 2 only: calendar indexing pairs day0
    # with the MISSING day1 (implicit 0), day2 with missing day3 —
    # NOT day0 with day2 (review regression)
    rows = [("a", dt.datetime(2024, 3, 1, 9))] * 3 + \
           [("a", dt.datetime(2024, 3, 3, 9))] * 5
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.level: (r.n_coeffs, r.energy_u)
           for r in haar_energy(df, "ts", ("g",), levels=1).collect()}
    # pairs: (3, 0) d=3 and (5, 0) d=5 -> 9 + 25
    assert got[1] == (2, 34)


def test_vocab_growth_empty_deciles_present(spark):
    from mapbox_filter_spark.operators.text import vocab_growth
    df = spark.createDataFrame(
        [(i, "only word") for i in range(5)], "doc_id long, text string")
    rows = sorted(vocab_growth(df, "doc_id", "text", deciles=10)
                  .collect())
    assert len(rows) == 10                      # exactly deciles rows
    assert rows[0].decile == 1 and rows[0].n_docs == 0
    assert rows[0].vocab == 0                   # empty prefix = 0
    assert rows[-1].vocab == 2


def test_table_checksum_null_injective(spark):
    from mapbox_filter_spark.operators.analytics import table_checksum
    # NULL-vs-value swaps must CHANGE the checksum (review regression:
    # concat_ws silently skipped NULLs)
    a = spark.createDataFrame([("a", None)], "x string, y string")
    b = spark.createDataFrame([(None, "a")], "x string, y string")
    ca = sorted(map(tuple, table_checksum(a, ["x", "y"]).collect()))
    cb = sorted(map(tuple, table_checksum(b, ["x", "y"]).collect()))
    assert ca != cb
    # separator-bearing values must not collide across boundaries
    c = spark.createDataFrame([("a:b", "c")], "x string, y string")
    d = spark.createDataFrame([("a", "b:c")], "x string, y string")
    assert sorted(map(tuple, table_checksum(c, ["x", "y"]).collect())) \
        != sorted(map(tuple, table_checksum(d, ["x", "y"]).collect()))


def test_scc_labels_empty_input(spark):
    from mapbox_filter_spark.operators.graph import scc_labels
    e = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert scc_labels(e).count() == 0


def test_join_size_stats_disjoint_keys(spark):
    from mapbox_filter_spark.operators.analytics import join_size_stats
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    r = join_size_stats(a, b, "k", "k").collect()[0]
    assert (r.matching_keys, r.join_rows, r.max_key_rows) == (0, 0, 0)
