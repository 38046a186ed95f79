"""Session-15 operator blocks: PR curve, Cramér's V, 2×2 effect
sizes — python brute differentials + edge pins."""

import math

import pytest

from mapbox_filter_spark.operators.metrics import pr_curve
from mapbox_filter_spark.operators.stats import cramers_v, odds_ratio


# ---- pr_curve ----

def test_pr_curve_hand_case(spark):
    # scores desc: 9(+), 7(-), 7(+), 4(-)  -> thresholds 9,7,4
    rows = [("g", 9, 1), ("g", 7, 0), ("g", 7, 1), ("g", 4, 0)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    out = {r.threshold: r for r in
           pr_curve(df, ["g"], "s", "y").collect()}
    assert set(out) == {9, 7, 4}
    r9 = out[9]
    assert (r9.tp, r9.fp, r9.fn) == (1, 0, 1)
    assert r9.precision == 1.0 and r9.recall == 0.5
    r7 = out[7]  # ties at 7 share one row: tp=2 fp=1
    assert (r7.tp, r7.fp, r7.fn) == (2, 1, 0)
    assert r7.precision == pytest.approx(2 / 3)
    assert r7.recall == 1.0
    assert r7.f1 == pytest.approx(4 / 5)
    r4 = out[4]
    assert (r4.tp, r4.fp, r4.fn) == (2, 2, 0)


def test_pr_curve_python_differential(spark):
    import random
    rng = random.Random(7)
    rows = [("g", rng.randrange(8), rng.randrange(2))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    got = {r.threshold: r for r in
           pr_curve(df, ["g"], "s", "y").collect()}
    pos = sum(y for _, _, y in rows)
    for t in {s for _, s, _ in rows}:
        tp = sum(1 for _, s, y in rows if s >= t and y == 1)
        fp = sum(1 for _, s, y in rows if s >= t and y == 0)
        r = got[t]
        assert (r.tp, r.fp, r.fn) == (tp, fp, pos - tp)
        assert r.precision == pytest.approx(tp / (tp + fp))
        assert r.recall == pytest.approx(tp / pos)
        assert r.f1 == pytest.approx(2 * tp / (2 * tp + fp + pos - tp))


def test_pr_curve_all_negative_group(spark):
    df = spark.createDataFrame([("g", 3, 0), ("g", 1, 0)],
                               "g string, s long, y long")
    for r in pr_curve(df, ["g"], "s", "y").collect():
        assert r.tp == 0 and r.recall is None and r.precision == 0.0


# ---- cramers_v ----

def test_cramers_v_perfect_association(spark):
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.v == pytest.approx(1.0)
    assert r.chi2 == pytest.approx(r.n)  # 2x2 perfect: chi2 = n


def test_cramers_v_independence_zero(spark):
    rows = [(u, w) for u in "ab" for w in "xy" for _ in range(3)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.v == pytest.approx(0.0, abs=1e-12)


def test_cramers_v_python_differential(spark):
    import random
    rng = random.Random(3)
    rows = [(rng.choice("abc"), rng.choice("xyzw"))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    from collections import Counter
    o = Counter(rows)
    ra = Counter(u for u, _ in rows)
    cb = Counter(w for _, w in rows)
    n = len(rows)
    chi2 = 0.0
    for (u, w) in sorted(o):
        dev = float(n * o[(u, w)] - ra[u] * cb[w])
        chi2 += dev * dev / (float(n) * float(ra[u]) * float(cb[w]))
    assert r.chi2 == pytest.approx(chi2)
    assert r.v == pytest.approx(math.sqrt(chi2 / (n * 2)))


def test_cramers_v_degenerate_null(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "y")],
                               "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.v is None and r.dof == 0


# ---- odds_ratio ----

def test_odds_ratio_textbook(spark):
    # a=10 b=5 c=2 d=8: OR = 80/10 = 8; RR = (10/15)/(2/10) = 10/3
    rows = ([(1, 1)] * 10 + [(1, 0)] * 5 + [(0, 1)] * 2
            + [(0, 0)] * 8)
    df = spark.createDataFrame(rows, "e long, o long")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert (r.a, r.b, r.c, r.d) == (10, 5, 2, 8)
    assert r.odds_ratio == pytest.approx(8.0)
    assert r.rel_risk == pytest.approx(10 / 3)
    assert r.risk_diff == pytest.approx(10 / 15 - 2 / 10)
    assert r.ln_or_se == pytest.approx(
        math.sqrt(1 / 10 + 1 / 5 + 1 / 2 + 1 / 8))


def test_odds_ratio_zero_cell_nulls(spark):
    rows = [(1, 1)] * 3 + [(0, 0)] * 3  # b = c = 0
    df = spark.createDataFrame(rows, "e long, o long")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert r.odds_ratio is None and r.rel_risk is None
    assert r.ln_or_se is None
    assert r.risk_diff == pytest.approx(1.0)


# ---- olc_encode ----

from pyspark.sql import functions as F

from mapbox_filter_spark.geo.olc import OLC_ALPHABET, olc_encode


def _py_olc(lat_e6, lng_e6, length=11):
    """Independent replica straight from the public OLC spec."""
    lat = lat_e6 + 90_000_000
    lng = lng_e6 + 180_000_000
    latv = lat * 8000 // 1_000_000
    lngv = lng * 8000 // 1_000_000
    digs = []
    for i in range(5):
        p = 20 ** (4 - i)
        digs.append(OLC_ALPHABET[latv // p % 20])
        digs.append(OLC_ALPHABET[lngv // p % 20])
    code = "".join(digs[:8]) + "+" + "".join(digs[8:10])
    if length == 11:
        row = lat * 40000 // 1_000_000 % 5
        col = lng * 32000 // 1_000_000 % 4
        code += OLC_ALPHABET[row * 4 + col]
    return code


def test_olc_google_example(spark):
    # the spec's worked example area: 20.37°N 2.78°E -> 7FG49Q...
    df = spark.createDataFrame([(20_370_112, 2_782_235)],
                               "lat long, lng long")
    got = df.select(olc_encode(F.col("lat"), F.col("lng"),
                               length=11).alias("c")).collect()[0].c
    assert got.startswith("7FG49Q")
    assert got[8] == "+" and len(got) == 12
    assert got == _py_olc(20_370_112, 2_782_235)


def test_olc_python_differential(spark):
    import random
    rng = random.Random(15)
    pts = [(rng.randrange(-90_000_000, 90_000_000),
            rng.randrange(-180_000_000, 180_000_000))
           for _ in range(300)]
    df = spark.createDataFrame(pts, "lat long, lng long")
    got = df.select("lat", "lng",
                    olc_encode(F.col("lat"), F.col("lng"),
                               length=10).alias("c10"),
                    olc_encode(F.col("lat"), F.col("lng"),
                               length=11).alias("c11")).collect()
    for r in got:
        assert r.c10 == _py_olc(r.lat, r.lng, 10)
        assert r.c11 == _py_olc(r.lat, r.lng, 11)
        assert r.c11[:11] == r.c10      # truncation property


def test_olc_bad_length():
    import pytest as _pt
    with _pt.raises(ValueError):
        olc_encode(F.lit(0), F.lit(0), length=9)


# ---- feature_hashing ----

from mapbox_filter_spark.operators.ml import feature_hashing


def test_feature_hashing_python_differential(spark):
    import hashlib
    import re
    from collections import Counter
    docs = [(1, "The cat sat  on the MAT"), (2, "dog dog dog runs"),
            (3, ""), (4, "x " * 50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k = 16
    got = {(r.doc_id, r.bucket): (r.feat, r.n_tokens)
           for r in feature_hashing(df, k, salt="t").collect()}
    expect = {}
    for did, text in docs:
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        for w, c in Counter(words).items():
            u = int(hashlib.md5(f"t\x1f{w}".encode()).hexdigest()[:15],
                    16)
            b = u % k
            sc = (1 - 2 * (u // k % 2)) * c
            f0, n0 = expect.get((did, b), (0, 0))
            expect[(did, b)] = (f0 + sc, n0 + c)
    assert got == expect
    assert not any(d == 3 for d, _ in got)  # empty doc -> no rows


def test_feature_hashing_bucket_range(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i*7} common") for i in range(50)],
        "doc_id long, text string")
    rows = feature_hashing(df, 8).collect()
    assert all(0 <= r.bucket < 8 for r in rows)
    with pytest.raises(ValueError):
        feature_hashing(df, 1)


# ---- ljung_box ----

from mapbox_filter_spark.operators.temporal import ljung_box


def _py_ljung_box(xs, m):
    n = len(xs)
    s = sum(xs)
    z = [n * x - s for x in xs]
    den = 0.0
    for zz in z:
        den += float(zz) * float(zz)
    q = 0.0
    for k in range(1, m + 1):
        num = 0.0
        for i in range(k, n):
            num += float(z[i]) * float(z[i - k])
        r = num / den
        q += r * r / float(n - k)
    return n * (n + 2) * q


def test_ljung_box_python_differential(spark):
    import random
    rng = random.Random(9)
    xs = [rng.randrange(100) for _ in range(60)]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, i long, x long")
    r = ljung_box(df, ["g"], order_cols=("i",), value_col="x",
                  m=4).collect()[0]
    assert (r.n, r.m) == (60, 4)
    assert r.q_stat == pytest.approx(_py_ljung_box(xs, 4))


def test_ljung_box_ar1_large_q(spark):
    # strongly autocorrelated series -> Q far above white-noise range
    xs = []
    v = 0
    for i in range(200):
        v = v + (1 if (i * 2654435761) % 97 < 48 else -1)
        xs.append(v + 1000)
    df = spark.createDataFrame([("g", i, x) for i, x in enumerate(xs)],
                               "g string, i long, x long")
    r = ljung_box(df, ["g"], order_cols=("i",), value_col="x",
                  m=5).collect()[0]
    assert r.q_stat > 100.0


def test_ljung_box_constant_series_null(spark):
    df = spark.createDataFrame([("g", i, 5) for i in range(20)],
                               "g string, i long, x long")
    r = ljung_box(df, ["g"], order_cols=("i",), value_col="x",
                  m=3).collect()[0]
    assert r.q_stat is None


def test_ljung_box_short_series_null(spark):
    df = spark.createDataFrame([("g", i, i * 3 % 7) for i in range(4)],
                               "g string, i long, x long")
    r = ljung_box(df, ["g"], order_cols=("i",), value_col="x",
                  m=5).collect()[0]
    assert r.q_stat is None
    with pytest.raises(ValueError):
        ljung_box(df, ["g"], order_cols=("i",), value_col="x", m=0)


# ---- median_impute ----

from mapbox_filter_spark.operators.ml import median_impute


def test_median_impute_fills_lower_median(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("a", 4, 40),
            ("a", 5, None), ("b", 6, 7), ("b", 7, None)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r.id: r for r in
           median_impute(df, ["g"], "v").collect()}
    # lower median of {10,20,30,40} = 20 (rank (4*50+99)//100 = 2)
    assert got[5].v_filled == 20 and got[5].was_imputed == 1
    assert got[7].v_filled == 7 and got[7].was_imputed == 1
    assert got[1].v_filled == 10 and got[1].was_imputed == 0


def test_median_impute_all_null_group_keeps_null(spark):
    rows = [("a", 1, None), ("a", 2, None), ("b", 3, 9)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {r.id: r for r in median_impute(df, ["g"], "v").collect()}
    assert got[1].v_filled is None and got[1].was_imputed == 0
    assert got[3].v_filled == 9


def test_median_impute_broadcast_plan(spark):
    rows = [("a", i, i if i % 3 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = median_impute(df, ["g"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- double_sweep_diameter ----

from mapbox_filter_spark.operators.graph import double_sweep_diameter


def _py_bfs(adj, s):
    from collections import deque
    d = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in d:
                d[v] = d[u] + 1
                q.append(v)
    return d


def test_double_sweep_path_graph_exact(spark):
    # path 0-1-2-3-4 with seed at an interior attachment: diameter 4
    edges = [(2, 0), (0, 1), (1, 3), (3, 4)]
    # relabel so min node (0) is interior: 0-1, 0-2, 1-3, 3-4
    df = spark.createDataFrame(edges, "src long, dst long")
    r = double_sweep_diameter(df, rounds=6).collect()[0]
    assert r.seed == 0
    assert r.diameter_lb == 4          # 2 .. 0 .. 1 .. 3 .. 4
    assert {r.peripheral, r.far_node} == {2, 4}


def test_double_sweep_brute_differential(spark):
    import random
    rng = random.Random(11)
    n = 40
    edges = {(i, (i + 1) % n) for i in range(n)}  # ring keeps it connected
    edges |= {(rng.randrange(n), rng.randrange(n)) for _ in range(25)}
    edges = [(a, b) for a, b in edges if a != b]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    df = spark.createDataFrame(edges, "src long, dst long")
    r = double_sweep_diameter(df, rounds=n).collect()[0]
    d0 = _py_bfs(adj, 0)
    ecc0 = max(d0.values())
    assert r.seed == 0 and r.ecc_seed == ecc0
    per = min(u for u, d in d0.items() if d == ecc0)
    assert r.peripheral == per
    d1 = _py_bfs(adj, per)
    assert r.diameter_lb == max(d1.values())
    # lower bound sanity vs true diameter
    true_diam = max(max(_py_bfs(adj, s).values()) for s in adj)
    assert r.ecc_seed <= r.diameter_lb <= true_diam


def test_double_sweep_rounds_guard():
    with pytest.raises(ValueError):
        double_sweep_diameter(None, rounds=0)


# ---- dtw_pairs ----

from mapbox_filter_spark.operators.trajectory import dtw_pairs


def _py_dtw(a, b):
    na, nb = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (nb + 1) for _ in range(na + 1)]
    D[0][0] = 0
    for i in range(1, na + 1):
        for j in range(1, nb + 1):
            c = abs(a[i - 1][0] - b[j - 1][0]) \
                + abs(a[i - 1][1] - b[j - 1][1])
            D[i][j] = c + min(D[i][j - 1], D[i - 1][j],
                              D[i - 1][j - 1])
    return D[na][nb]


def _collapse(seq, cell):
    out = []
    for x, y in seq:
        c = (x // cell, y // cell)
        if not out or out[-1] != c:
            out.append(c)
    return out


def test_dtw_identical_tracks_zero(spark):
    rows = [(u, i, i * 5000, i * 3000)
            for u in (1, 2) for i in range(6)]
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    r = dtw_pairs(df, order_cols=("i",), cell=1024,
                  n_blocks=1).collect()[0]
    assert (r.u, r.v) == (1, 2)
    assert r.dtw == 0 and r.len_u == r.len_v


def test_dtw_brute_differential(spark):
    import random
    rng = random.Random(21)
    rows, tracks = [], {}
    for u in range(8):
        x = y = 0
        seq = []
        for i in range(rng.randrange(3, 15)):
            x += rng.randrange(-3000, 3000)
            y += rng.randrange(-3000, 3000)
            rows.append((u, i, x, y))
            seq.append((x, y))
        tracks[u] = seq
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    got = {(r.u, r.v): r
           for r in dtw_pairs(df, order_cols=("i",), cell=1024,
                              max_moves=12, n_blocks=1).collect()}
    for u in range(8):
        for v in range(u + 1, 8):
            a = _collapse(tracks[u], 1024)[:12]
            b = _collapse(tracks[v], 1024)[:12]
            r = got[(u, v)]
            assert (r.len_u, r.len_v) == (len(a), len(b))
            assert r.dtw == _py_dtw(a, b), (u, v)


def test_dtw_single_move_track(spark):
    rows = [(1, 0, 100, 100), (2, 0, 5000, 5000), (2, 1, 9000, 9000)]
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    r = dtw_pairs(df, order_cols=("i",), cell=1024,
                  n_blocks=1).collect()[0]
    a = _collapse([(100, 100)], 1024)
    b = _collapse([(5000, 5000), (9000, 9000)], 1024)
    assert r.dtw == _py_dtw(a, b)
    assert r.len_u == 1


def test_dtw_guards():
    with pytest.raises(ValueError):
        dtw_pairs(None, cell=1000)
    with pytest.raises(ValueError):
        dtw_pairs(None, cell=1024, max_moves=0)


# ---- frechet_pairs ----

from mapbox_filter_spark.operators.trajectory import frechet_pairs


def _py_frechet(a, b):
    na, nb = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (nb + 1) for _ in range(na + 1)]
    D[0][0] = 0
    for i in range(1, na + 1):
        for j in range(1, nb + 1):
            c = abs(a[i - 1][0] - b[j - 1][0]) \
                + abs(a[i - 1][1] - b[j - 1][1])
            prev = min(D[i][j - 1], D[i - 1][j], D[i - 1][j - 1])
            D[i][j] = max(c, prev)
    return D[na][nb]


def test_frechet_brute_differential(spark):
    import random
    rng = random.Random(33)
    rows, tracks = [], {}
    for u in range(8):
        x = y = 0
        seq = []
        for i in range(rng.randrange(3, 15)):
            x += rng.randrange(-3000, 3000)
            y += rng.randrange(-3000, 3000)
            rows.append((u, i, x, y))
            seq.append((x, y))
        tracks[u] = seq
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    got = {(r.u, r.v): r
           for r in frechet_pairs(df, order_cols=("i",), cell=1024,
                                  max_moves=12, n_blocks=1).collect()}
    for u in range(8):
        for v in range(u + 1, 8):
            a = _collapse(tracks[u], 1024)[:12]
            b = _collapse(tracks[v], 1024)[:12]
            r = got[(u, v)]
            assert r.frechet == _py_frechet(a, b), (u, v)


def test_frechet_leash_vs_dtw(spark):
    # two parallel straight tracks one cell apart: frechet = 1 per
    # step leash; dtw = n (sum over n aligned steps)
    rows = ([(1, i, i * 2048, 0) for i in range(6)]
            + [(2, i, i * 2048, 2048) for i in range(6)])
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    fr = frechet_pairs(df, order_cols=("i",), cell=2048,
                       n_blocks=1).collect()[0]
    dt = dtw_pairs(df, order_cols=("i",), cell=2048,
                   n_blocks=1).collect()[0]
    assert fr.frechet == 1
    assert dt.dtw == 6


# ---- cvm_2samp + turning_points ----

from mapbox_filter_spark.operators.rankstats import cvm_2samp
from mapbox_filter_spark.operators.stats import turning_points


def test_cvm_python_differential(spark):
    import random
    rng = random.Random(5)
    rows = [("g", rng.random() < 0.4, rng.randrange(20))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    r = cvm_2samp(df, ["g"], "f", "v").collect()[0]
    s1 = sorted(v for _, f, v in rows if f)
    s2 = sorted(v for _, f, v in rows if not f)
    n1, n2 = len(s1), len(s2)
    vals = sorted(set(v for _, _, v in rows))
    S = 0
    for x in vals:
        c1 = sum(1 for v in s1 if v <= x)
        c2 = sum(1 for v in s2 if v <= x)
        w = sum(1 for _, _, v in rows if v == x)
        d = n2 * c1 - n1 * c2
        S += w * d * d
    assert (r.n1, r.n2) == (n1, n2)
    assert int(r.s_num) == S
    N = n1 + n2
    assert r.cvm == pytest.approx(S / (n1 * n2 * N * N))


def test_cvm_identical_samples_zero(spark):
    rows = [("g", True, v) for v in range(10)] \
        + [("g", False, v) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    r = cvm_2samp(df, ["g"], "f", "v").collect()[0]
    assert int(r.s_num) == 0 and r.cvm == 0.0


def test_cvm_empty_sample_null(spark):
    rows = [("g", True, v) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, f boolean, v long")
    r = cvm_2samp(df, ["g"], "f", "v").collect()[0]
    assert r.cvm is None


def test_turning_points_hand_and_brute(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 5, 8]
    df = spark.createDataFrame([("g", i, x) for i, x in enumerate(xs)],
                               "g string, i long, x long")
    r = turning_points(df, ["g"], order_cols=("i",),
                       value_col="x").collect()[0]
    t = sum(1 for i in range(1, len(xs) - 1)
            if (xs[i - 1] < xs[i] > xs[i + 1])
            or (xs[i - 1] > xs[i] < xs[i + 1]))
    assert r.t_count == t
    import math
    n = len(xs)
    assert r.z == pytest.approx(
        (t - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90))


def test_turning_points_monotone_zero(spark):
    df = spark.createDataFrame([("g", i, i * 2) for i in range(20)],
                               "g string, i long, x long")
    r = turning_points(df, ["g"], order_cols=("i",),
                       value_col="x").collect()[0]
    assert r.t_count == 0 and r.z < -3.0  # strong trend signal


def test_turning_points_alternating_max(spark):
    df = spark.createDataFrame(
        [("g", i, i % 2) for i in range(20)],
        "g string, i long, x long")
    r = turning_points(df, ["g"], order_cols=("i",),
                       value_col="x").collect()[0]
    assert r.t_count == 18 and r.z > 3.0


# ---- chaikin_smooth + morphology_close ----

from mapbox_filter_spark.operators.trajectory import chaikin_smooth
from mapbox_filter_spark.operators.raster import morphology_close


def _py_chaikin(seq, iters):
    cur = [(x, y) for x, y in seq]
    for _ in range(iters):
        if len(cur) == 1:
            cur = [(4 * cur[0][0], 4 * cur[0][1])]
            continue
        out = [(4 * cur[0][0], 4 * cur[0][1])]
        for (x0, y0), (x1, y1) in zip(cur, cur[1:]):
            out.append((3 * x0 + x1, 3 * y0 + y1))
            out.append((x0 + 3 * x1, y0 + 3 * y1))
        out.append((4 * cur[-1][0], 4 * cur[-1][1]))
        cur = out
    return cur


def test_chaikin_python_differential(spark):
    import random
    rng = random.Random(41)
    rows, tracks = [], {}
    for u in range(5):
        seq = [(rng.randrange(-500, 500), rng.randrange(-500, 500))
               for _ in range(rng.randrange(1, 8))]
        tracks[u] = seq
        rows += [(u, i, x, y) for i, (x, y) in enumerate(seq)]
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    out = chaikin_smooth(df, order_cols=("i",), iters=2).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, {})[r.rn] = (r.x, r.y)
        assert r.scale == 16
    for u, seq in tracks.items():
        expect = _py_chaikin(seq, 2)
        pts = [got[u][i + 1] for i in range(len(got[u]))]
        assert pts == expect, u


def test_chaikin_preserves_endpoints_and_smooths(spark):
    # right-angle corner gets cut: no output vertex AT the corner
    seq = [(0, 0), (100, 0), (100, 100)]
    df = spark.createDataFrame(
        [(1, i, x, y) for i, (x, y) in enumerate(seq)],
        "user_id long, i long, x long, y long")
    out = sorted(chaikin_smooth(df, order_cols=("i",),
                                iters=1).collect(),
                 key=lambda r: r.rn)
    assert (out[0].x, out[0].y) == (0, 0)
    assert (out[-1].x, out[-1].y) == (400, 400)
    assert (400, 0) not in [(r.x, r.y) for r in out]
    with pytest.raises(ValueError):
        chaikin_smooth(df, iters=0)


def test_morphology_close_fills_pinhole(spark):
    # 3x3 block with the center missing -> closing fills it
    cells = [(x, y) for x in range(3) for y in range(3)
             if (x, y) != (1, 1)]
    df = spark.createDataFrame(cells, "cx long, cy long")
    got = {(r.x, r.y): r.was_filled
           for r in morphology_close(df).collect()}
    assert got[(1, 1)] == 1           # pinhole healed
    for c in cells:
        assert got[c] == 0            # originals kept
    # closing never REMOVES original cells
    assert set(cells) <= set(got)


def test_morphology_close_isolated_point_kept(spark):
    df = spark.createDataFrame([(5, 5)], "cx long, cy long")
    got = morphology_close(df).collect()
    assert {(r.x, r.y) for r in got} == {(5, 5)}
    assert got[0].was_filled == 0


def test_morphology_close_no_bridge_across_gap(spark):
    # two cells 3 apart: dilations overlap nowhere 9-covered between
    df = spark.createDataFrame([(0, 0), (4, 0)], "cx long, cy long")
    got = {(r.x, r.y) for r in morphology_close(df).collect()}
    assert got == {(0, 0), (4, 0)}


def test_turning_points_short_group_zero_not_null(spark):
    # 2-row group: lag/lead NULL everywhere -> t_count must be 0
    df = spark.createDataFrame([("g", 0, 5), ("g", 1, 3)],
                               "g string, i long, x long")
    r = turning_points(df, ["g"], order_cols=("i",),
                       value_col="x").collect()[0]
    assert r.t_count == 0 and r.z is None


def test_chi2_oracle_fragment_tripwire():
    """Every chi-square-family oracle must build on the ONE shared
    grid-completing CTE chain (the _CENTS_SQL single-definition rule);
    a hand-copied chain is how the mood_median oracle silently missed
    the empty-cell fix."""
    from mapbox_filter_spark import queries_curation as qc
    frag = "COALESCE(obs.o, 0)"
    assert frag in qc._CHI2_CTES_SQL
    for name in ("chi_square", "cramers_v", "mood_median"):
        sql = qc.CURATION_QUERIES[name][1]()
        assert qc._CHI2_CTES_SQL in sql, name


# ---- rolling_distinct + quantile_bins ----

from mapbox_filter_spark.operators.temporal import rolling_distinct
from mapbox_filter_spark.operators.ml import quantile_bins


def test_rolling_distinct_brute(spark):
    import datetime
    base = datetime.datetime(2026, 1, 1)
    rows = []
    acts = {}  # day -> set of users
    import random
    rng = random.Random(8)
    for _ in range(200):
        d = rng.randrange(15)
        u = rng.randrange(12)
        rows.append((base + datetime.timedelta(days=d, hours=3), u))
        acts.setdefault(d, set()).add(u)
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    day0 = int(base.timestamp() * 1_000_000) // 86_400_000_000
    got = {r.day - day0: r.active
           for r in rolling_distinct(df, ts_col="ts",
                                     entity_col="user_id",
                                     window_days=7).collect()}
    for d in acts:
        expect = set()
        for back in range(7):
            expect |= acts.get(d - back, set())
        assert got[d] == len(expect), d
    assert set(got) == set(acts)      # observed days only
    with pytest.raises(ValueError):
        rolling_distinct(df, ts_col="ts", entity_col="user_id",
                         window_days=0)


def test_quantile_bins_balanced_and_ties(spark):
    rows = [("g", i, v) for i, v in enumerate(range(100, 180))]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_bins(df, ["g"], "v", k=4).collect()
    from collections import Counter
    c = Counter(r.bin for r in out)
    assert c == {1: 20, 2: 20, 3: 20, 4: 20}
    # order preserved: higher value -> same or higher bin
    by_v = sorted(out, key=lambda r: r.v)
    assert all(a.bin <= b.bin for a, b in zip(by_v, by_v[1:]))
    # ties share a bin
    tied = [("g", i, 5) for i in range(10)] + [("g", 99, 9)]
    df2 = spark.createDataFrame(tied, "g string, id long, v long")
    got = quantile_bins(df2, ["g"], "v", k=4).collect()
    assert {r.bin for r in got if r.v == 5} == {1}
    assert [r.bin for r in got if r.v == 9] == [4]
    with pytest.raises(ValueError):
        quantile_bins(df2, ["g"], "v", k=1)


# ---- lcss_pairs ----

from mapbox_filter_spark.operators.trajectory import lcss_pairs


def _py_lcss(a, b, eps):
    na, nb = len(a), len(b)
    L = [[0] * (nb + 1) for _ in range(na + 1)]
    for i in range(1, na + 1):
        for j in range(1, nb + 1):
            if (abs(a[i - 1][0] - b[j - 1][0]) <= eps
                    and abs(a[i - 1][1] - b[j - 1][1]) <= eps):
                L[i][j] = L[i - 1][j - 1] + 1
            else:
                L[i][j] = max(L[i - 1][j], L[i][j - 1])
    return L[na][nb]


def test_lcss_brute_differential(spark):
    import random
    rng = random.Random(55)
    rows, tracks = [], {}
    for u in range(8):
        x = y = 0
        seq = []
        for i in range(rng.randrange(3, 15)):
            x += rng.randrange(-3000, 3000)
            y += rng.randrange(-3000, 3000)
            rows.append((u, i, x, y))
            seq.append((x, y))
        tracks[u] = seq
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    got = {(r.u, r.v): r
           for r in lcss_pairs(df, order_cols=("i",), cell=1024,
                               max_moves=12, n_blocks=1,
                               eps=1).collect()}
    for u in range(8):
        for v in range(u + 1, 8):
            a = _collapse(tracks[u], 1024)[:12]
            b = _collapse(tracks[v], 1024)[:12]
            r = got[(u, v)]
            assert r.lcss == _py_lcss(a, b, 1), (u, v)
            assert r.sim == pytest.approx(
                r.lcss / min(len(a), len(b)))


def test_lcss_outlier_robust_vs_dtw(spark):
    # identical tracks except one teleport spike in the middle:
    # LCSS skips the spike (sim stays high), DTW pays its distance
    base = [(i * 2048, 0) for i in range(8)]
    spiky = list(base)
    spiky[4] = (4 * 2048, 500 * 2048)
    rows = ([(1, i, x, y) for i, (x, y) in enumerate(base)]
            + [(2, i, x, y) for i, (x, y) in enumerate(spiky)])
    df = spark.createDataFrame(rows, "user_id long, i long, x long, y long")
    lc = lcss_pairs(df, order_cols=("i",), cell=2048, n_blocks=1,
                    eps=0).collect()[0]
    dt = dtw_pairs(df, order_cols=("i",), cell=2048,
                   n_blocks=1).collect()[0]
    assert lc.lcss == 7              # everything but the spike aligns
    assert dt.dtw >= 500             # DTW pays the teleport
    with pytest.raises(ValueError):
        lcss_pairs(df, eps=-1)


# ---- cohen_d ----

from mapbox_filter_spark.operators.stats import cohen_d


def test_cohen_d_textbook(spark):
    import math
    a = [2, 4, 6, 8]       # mean 5, ss 20
    b = [1, 2, 3]          # mean 2, ss 2
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = cohen_d(df, "g", "v", "a", "b").collect()[0]
    sp2 = (20 + 2) / (4 + 3 - 2)
    expect = (5 - 2) / math.sqrt(sp2)
    assert r.cohen_d == pytest.approx(expect)
    j = 1 - 3 / (4 * 5 - 1)
    assert r.hedges_g == pytest.approx(j * expect)
    assert (r.n_a, r.s_a, r.d_a) == (4, 20, 4 * 120 - 400)


def test_cohen_d_degenerate_null(spark):
    df = spark.createDataFrame([("a", 5), ("b", 7)], "g string, v long")
    r = cohen_d(df, "g", "v", "a", "b").collect()[0]
    assert r.cohen_d is None and r.hedges_g is None


# ---- icc_oneway ----

from mapbox_filter_spark.operators.stats import icc_oneway


def test_icc_python_differential(spark):
    import random
    rng = random.Random(77)
    rows = []
    for g in range(10):
        trait = g * 50
        for _ in range(rng.randrange(3, 9)):
            rows.append((g, trait + rng.randrange(10)))
    df = spark.createDataFrame(rows, "g long, v long")
    r = icc_oneway(df, "g", "v").collect()[0]
    from collections import defaultdict
    by = defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    N = len(rows)
    G = len(by)
    S = sum(v for _, v in rows)
    Q = sum(v * v for _, v in rows)
    T = sum(sum(vs) ** 2 // len(vs) for vs in by.values())
    ssb = max(0, T - S * S // N)
    ssw = Q - T
    ng2 = sum(len(vs) ** 2 for vs in by.values())
    assert (r.n, r.k, r.ssb_q, r.ssw_q, r.sum_ng2) == (
        N, G, ssb, ssw, ng2)
    msb = ssb / (G - 1)
    msw = ssw / (N - G)
    k0 = (N - ng2 / N) / (G - 1)
    assert r.icc == pytest.approx((msb - msw) / (msb + (k0 - 1) * msw))
    assert r.icc > 0.9   # trait variance dominates by construction


def test_icc_no_group_effect_near_zero(spark):
    rows = [(g, v) for g in range(8) for v in range(10)]
    df = spark.createDataFrame(rows, "g long, v long")
    r = icc_oneway(df, "g", "v").collect()[0]
    assert r.ssb_q == 0 and r.icc <= 0.0


def test_icc_degenerate_null(spark):
    df = spark.createDataFrame([(1, 5)], "g long, v long")
    r = icc_oneway(df, "g", "v").collect()[0]
    assert r.icc is None
