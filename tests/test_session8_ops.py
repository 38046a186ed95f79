"""Unit differentials for the session-8 operator block: Bloom-filter
semi-join pruning (brute python bit mirror) and count-min sketch
(register-plane replay + upper-bound invariant)."""

import hashlib
import random

from pyspark.sql import functions as F


def _h60(salt: str, key) -> int:
    return int(hashlib.md5(
        (salt + "\x1f" + str(key)).encode()).hexdigest()[:15], 16)


def _bloom_positions_py(key, n_bits: int, k: int, salt: str):
    h1 = _h60(f"{salt}-a", key) % n_bits
    h2 = _h60(f"{salt}-b", key) % (n_bits - 1) + 1
    return [(h1 + i * h2) % n_bits for i in range(k)]


def test_bloom_no_false_negatives_and_python_differential(spark):
    from mapbox_filter_spark.operators.sketch import (bloom_build,
                                                      bloom_prune)

    rng = random.Random(8)
    members = sorted(rng.sample(range(100000), 60))
    probes = members + sorted(rng.sample(range(100000, 200000), 400))
    n_words, k, salt = 8, 3, "t8"
    n_bits = n_words * 63

    dim = spark.createDataFrame([(m,) for m in members], "key long")
    fact = spark.createDataFrame([(p,) for p in probes], "key long")
    bloom = bloom_build(dim, "key", n_words=n_words, k=k, salt=salt)
    got = {r["key"]: r["bloom_pass"]
           for r in bloom_prune(fact, bloom, "key", n_words=n_words,
                                k=k, salt=salt).collect()}

    words = [0] * n_words
    for m in members:
        for p in _bloom_positions_py(m, n_bits, k, salt):
            words[p // 63] |= 1 << (p % 63)
    for q in probes:
        want = all((words[p // 63] >> (p % 63)) & 1
                   for p in _bloom_positions_py(q, n_bits, k, salt))
        assert got[q] == want, q
    # the Bloom contract itself: every member passes
    assert all(got[m] for m in members)
    # and the filter is non-vacuous: some non-member fails
    assert not all(got[q] for q in probes)


def test_bloom_build_is_dense_array(spark):
    from mapbox_filter_spark.operators.sketch import bloom_build
    dim = spark.createDataFrame([(1,)], "key long")
    row = bloom_build(dim, "key", n_words=4, k=2, salt="t8d").collect()
    assert len(row) == 1 and len(row[0]["bloom"]) == 4
    assert sum(bin(w & ((1 << 63) - 1)).count("1")
               for w in row[0]["bloom"]) <= 2


def test_cms_python_differential_and_upper_bound(spark):
    from mapbox_filter_spark.operators.sketch import (cms_query,
                                                      cms_registers)

    rng = random.Random(88)
    data = [rng.randrange(40) for _ in range(3000)]
    d, w, salt = 3, 16, "t8c"  # tiny plane → heavy collisions
    df = spark.createDataFrame([(v,) for v in data], "key long")
    regs = cms_registers(df, "key", d=d, w=w, salt=salt)
    est = {r["key"]: r["est"]
           for r in cms_query(regs, df, "key", d=d, w=w,
                              salt=salt).collect()}

    plane = {}
    for v in data:
        for i in range(d):
            c = _h60(f"{salt}-{i}", v) % w
            plane[(i, c)] = plane.get((i, c), 0) + 1
    exact = {}
    for v in data:
        exact[v] = exact.get(v, 0) + 1
    for key, n in exact.items():
        want = min(plane[(i, _h60(f"{salt}-{i}", key) % w)]
                   for i in range(d))
        assert est[key] == want, key
        assert est[key] >= n, key


def test_cms_weighted(spark):
    from mapbox_filter_spark.operators.sketch import (cms_query,
                                                      cms_registers)
    df = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "key long, wt long")
    regs = cms_registers(df, "key", d=2, w=64, salt="t8w",
                         weight_col="wt")
    est = {r["key"]: r["est"]
           for r in cms_query(regs, df.select("key"), "key", d=2, w=64,
                              salt="t8w").collect()}
    assert est[1] >= 12 and est[2] >= 3


def test_rrf_fuse_hand_math(spark):
    from mapbox_filter_spark.operators.retrieval import RRF_SCALE, rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(12, 1), (10, 2), (13, 3)],
                              "doc_id long, rank long")
    got = {r["doc_id"]: (r["rrf"], r["n_lists"], r["rank"])
           for r in rrf_fuse([a, b], k=4, c=60).collect()}
    w = lambda r: RRF_SCALE // (60 + r)
    want = {10: w(1) + w(2), 11: w(2), 12: w(3) + w(1), 13: w(3)}
    for d, (rrf, n, _) in got.items():
        assert rrf == want[d], d
        assert n == (2 if d in (10, 12) else 1)
    # fused order: 10 (w1+w2) > 12 (w1+w3) > 11 (w2) > 13 (w3)
    order = sorted(got, key=lambda d: got[d][2])
    assert order == [10, 12, 11, 13]


def test_rrf_fuse_three_lists_and_validation(spark):
    import pytest
    from mapbox_filter_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    got = rrf_fuse([a, a, a], k=1, c=0).collect()
    assert got[0]["n_lists"] == 3 and got[0]["rrf"] == 3 * 10 ** 15
    with pytest.raises(ValueError):
        rrf_fuse([], k=1)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_int_dot_topk_differential(spark):
    import random
    from mapbox_filter_spark.operators.similarity import int_dot_topk

    rng = random.Random(9)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(8)])
              for i in range(40)]
    queries = [(100 + j, [rng.uniform(-1, 1) for _ in range(8)])
               for j in range(3)]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(queries, "query_id long, embedding array<double>")
    got = int_dot_topk(q, c, 5, scale=1000).collect()

    import math
    qz = {qid: [math.floor(x * 1000 + 0.5) for x in v]
          for qid, v in queries}
    cz = {cid: [math.floor(x * 1000 + 0.5) for x in v]
          for cid, v in corpus}
    for qid in qz:
        dots = sorted(((sum(a * b for a, b in zip(qz[qid], cz[cid])), -cid,
                        cid) for cid in cz), reverse=True)
        want = [(cid, d) for d, _, cid in dots[:5]]
        mine = sorted([(r["rank"], r["c_id"], r["dot"]) for r in got
                       if r["q_id"] == qid])
        assert [(c_, d_) for _, c_, d_ in mine] == want, qid


def test_target_encode_loo_hand_math(spark):
    from mapbox_filter_spark.operators.ml import target_encode_loo

    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30),
            (4, "b", 100), (5, "c", 7)]
    df = spark.createDataFrame(rows, "id long, cat string, y long")
    got = {r["id"]: r["enc"]
           for r in target_encode_loo(df, "cat", "y", id_cols=["id"],
                                      prior_weight=0).collect()}
    assert got[1] == (20 + 30) / 2
    assert got[2] == (10 + 30) / 2
    assert got[4] is None and got[5] is None  # singleton, m=0 → NULL

    got_m = {r["id"]: r["enc"]
             for r in target_encode_loo(df, "cat", "y", id_cols=["id"],
                                        prior_weight=2).collect()}
    s_g, n_g = 167, 5
    # exact rational: ((S_c − y)·N + m·S) / ((n_c − 1 + m)·N)
    assert got_m[4] == ((100 - 100) * n_g + 2 * s_g) / ((0 + 2) * n_g)
    assert got_m[1] == ((60 - 10) * n_g + 2 * s_g) / ((2 + 2) * n_g)


def test_naive_bayes_differential(spark):
    import math
    import random
    from mapbox_filter_spark.operators.ml import (naive_bayes_predict,
                                                  naive_bayes_train)

    rng = random.Random(81)
    classes = ["x", "y", "z"]
    rows = []
    for i in range(600):
        c = classes[i % 3]
        f1 = (rng.randrange(4) + (0 if c == "x" else 2)) % 6
        f2 = (rng.randrange(3) + (2 if c == "z" else 0)) % 5
        rows.append((i, c, f1, f2))
    df = spark.createDataFrame(rows, "id long, c string, f1 long, f2 long")
    train = [r for r in rows if r[0] % 4 != 0]
    test = [r for r in rows if r[0] % 4 == 0]
    tr = df.filter(F.pmod(F.col("id"), F.lit(4)) != 0)
    te = df.filter(F.pmod(F.col("id"), F.lit(4)) == 0)
    model = naive_bayes_train(tr, "c", ["f1", "f2"])
    got = {r["id"]: r["pred"]
           for r in naive_bayes_predict(te, model, id_cols=["id"],
                                        feature_cols=["f1", "f2"])
           .collect()}

    n = len(train)
    n_c = {c: sum(1 for r in train if r[1] == c) for c in classes}
    v1 = len({r[2] for r in train})
    v2 = len({r[3] for r in train})
    cnt1, cnt2 = {}, {}
    for _, c, f1, f2 in train:
        cnt1[(c, f1)] = cnt1.get((c, f1), 0) + 1
        cnt2[(c, f2)] = cnt2.get((c, f2), 0) + 1
    for i, _, f1, f2 in test:
        best = min(
            ((-(math.log((n_c[c] + 1) / (n + 3))
                + math.log((cnt1.get((c, f1), 0) + 1) / (n_c[c] + v1))
                + math.log((cnt2.get((c, f2), 0) + 1) / (n_c[c] + v2))),
              c) for c in classes))
        assert got[i] == best[1], i


def test_focal_stats_hand_grid(spark):
    from mapbox_filter_spark.operators.raster import focal_stats

    # 2x2 occupied block plus an isolated cell
    rows = [(0, 0, 1), (1, 0, 2), (0, 1, 3), (1, 1, 4), (5, 5, 9)]
    df = spark.createDataFrame(rows, "cx long, cy long, v long")
    got = {(r["cx"], r["cy"]): r
           for r in focal_stats(df, "cx", "cy", "v").collect()}
    assert got[(0, 0)]["n_nb"] == 4 and got[(0, 0)]["sum_nb"] == 10
    assert got[(0, 0)]["mean_nb"] == 2.5
    assert got[(5, 5)]["n_nb"] == 1 and got[(5, 5)]["sum_nb"] == 9
    ex = focal_stats(df, "cx", "cy", "v", include_self=False)
    got2 = {(r["cx"], r["cy"]): r for r in ex.collect()}
    assert got2[(0, 0)]["sum_nb"] == 9
    assert (5, 5) not in got2  # no neighbors, excluded-self window empty


def test_d8_flow_hand_grid(spark):
    from mapbox_filter_spark.operators.raster import d8_flow

    # ramp: z falls eastward; (2,0) is the pit
    rows = [(0, 0, 10), (1, 0, 5), (2, 0, 1)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {(r["cx"], r["cy"]): r
           for r in d8_flow(df, "cx", "cy", "z").collect()}
    assert got[(0, 0)]["dir"] == 1 and got[(0, 0)]["zdrop"] == 5  # E
    assert got[(1, 0)]["dir"] == 1 and got[(1, 0)]["zdrop"] == 4
    assert got[(2, 0)]["is_sink"] and got[(2, 0)]["dir"] is None


def test_d8_flow_diagonal_vs_cardinal_exact(spark):
    from mapbox_filter_spark.operators.raster import d8_flow

    # drop 3 diagonal (slope² = 9/2 = 4.5) vs drop 2 cardinal
    # (slope² = 4): diagonal wins; with cardinal drop 3 (9 > 4.5) the
    # cardinal wins — the integer key must decide both correctly.
    rows = [(0, 0, 10), (1, 1, 7), (1, 0, 8)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {(r["cx"], r["cy"]): r
           for r in d8_flow(df, "cx", "cy", "z").collect()}
    assert got[(0, 0)]["dir"] == 128  # NE diagonal, slope² 4.5 > 4

    rows2 = [(0, 0, 10), (1, 1, 7), (1, 0, 7)]
    df2 = spark.createDataFrame(rows2, "cx long, cy long, z long")
    got2 = {(r["cx"], r["cy"]): r
            for r in d8_flow(df2, "cx", "cy", "z").collect()}
    assert got2[(0, 0)]["dir"] == 1  # cardinal drop 3: 9 > 9/2


def test_modularity_two_cliques(spark):
    from mapbox_filter_spark.operators.graph import modularity

    # two triangles bridged by one edge: the textbook 2-community graph
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    edges = spark.createDataFrame(tri1 + tri2 + [(2, 3)],
                                  "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long")
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    m = 7
    for lab in (0, 1):
        assert rows[lab]["e_intra"] == 3 and rows[lab]["d_tot"] == 7
        assert rows[lab]["q_part"] == (4 * m * 3 - 49) / (4 * m * m)
    q = sum(r["q_part"] for r in rows.values())
    assert abs(q - (6 / 7 - 2 * (7 / 14) ** 2)) < 1e-12


def test_quadrangle_square_and_k4(spark):
    from mapbox_filter_spark.operators.graph import quadrangle_profile

    square = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    rows = quadrangle_profile(square).collect()
    assert rows and all(r["n_c4"] == 1 for r in rows)
    # square: diagonals (0,2) and (1,3) each have cod 2 → one C4
    hist = {r["cod"]: r["n_pairs"] for r in rows}
    assert hist == {2: 2}

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long")
    rows4 = quadrangle_profile(k4).collect()
    assert rows4 and all(r["n_c4"] == 3 for r in rows4)


def test_zipf_slope_exact_power_law(spark):
    from mapbox_filter_spark.operators.text import zipf_slope

    # synthetic corpus with counts ∝ rank⁻¹ exactly: token t_r appears
    # floor(1200/r) times → slope ≈ −1 within quantization+floor noise
    words = []
    for r in range(1, 31):
        words += [f"t{r:02d}"] * (1200 // r)
    docs = spark.createDataFrame([(0, " ".join(words))],
                                 "doc_id long, text string")
    row = zipf_slope(docs, top_n=30).collect()[0]
    assert row["n"] == 30
    assert abs(row["slope"] + 1.0) < 0.02
    assert row["r2"] > 0.999


def test_d8_basins_two_valleys(spark):
    from mapbox_filter_spark.operators.raster import d8_basins

    # long west ramp draining to (0,0) and a separate east pit at (9,0)
    rows = [(x, 0, x + 1) for x in range(6)] + \
           [(8, 0, 3), (9, 0, 1)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {(r["cx"], r["cy"]): (r["basin_x"], r["basin_y"], r["is_sink"])
           for r in d8_basins(df, "cx", "cy", "z", rounds=4).collect()}
    for x in range(6):
        assert got[(x, 0)][:2] == (0, 0), x
    assert got[(8, 0)][:2] == (9, 0)
    assert got[(9, 0)] == (9, 0, True)
    assert got[(0, 0)][2] is True


def test_areal_interpolate_hand_math(spark):
    from mapbox_filter_spark.geo.overlay import areal_interpolate

    # one 10x10 rect of value 100 straddling 4 grid-8 cells:
    # overlap areas 4,24,16? -> x in [4,14): cells 0 ([4,8) w=4) and
    # 1 ([8,14) w=6); y likewise. terms = 100*area*sc // 100
    rects = spark.createDataFrame(
        [(1, 4, 4, 14, 14, 100)],
        "a_id long, x0 long, y0 long, x1 long, y1 long, val long")
    got = {(r["gx"], r["gy"]): r["est_scaled"]
           for r in areal_interpolate(rects, grid=8, value_col="val",
                                      scale=10 ** 6).collect()}
    sc = 10 ** 6
    assert got[(0, 0)] == (100 * 16 * sc) // 100
    assert got[(1, 0)] == (100 * 24 * sc) // 100
    assert got[(0, 1)] == (100 * 24 * sc) // 100
    assert got[(1, 1)] == (100 * 36 * sc) // 100
    # mass conservation up to floor rounding: Σ terms ≈ val·scale
    assert sum(got.values()) == 100 * sc


def test_areal_interpolate_rejects_degenerate(spark):
    import pytest
    from mapbox_filter_spark.geo.overlay import areal_interpolate

    bad = spark.createDataFrame(
        [(1, 4, 4, 4, 14, 10)],
        "a_id long, x0 long, y0 long, x1 long, y1 long, val long")
    with pytest.raises(Exception, match="degenerate"):
        areal_interpolate(bad, grid=8, value_col="val").collect()


def test_loglog_fit_exact_power_law(spark):
    import math
    from mapbox_filter_spark.operators.stats import loglog_fit

    # y = 7·x² exactly on powers of 2 → slope 2, intercept ln 7
    pts = [(2 ** k, 7 * 4 ** k) for k in range(1, 11)]
    df = spark.createDataFrame(pts, "x long, y long")
    row = loglog_fit(df, "x", "y").collect()[0]
    assert abs(row["slope"] - 2.0) < 1e-5
    assert abs(row["intercept"] - math.log(7)) < 1e-4
    assert row["r2"] > 0.9999999


def test_prf_expansion_hand_corpus(spark):
    from mapbox_filter_spark.operators.retrieval import prf_expansion

    docs = spark.createDataFrame([
        (0, "query apple banana banana"),
        (1, "query apple cherry"),
        (2, "noise date date date"),
    ], "doc_id long, text string")
    got = prf_expansion(docs, ["query"], k_docs=2, k_terms=3).collect()
    ranked = [(r["term"], r["df_fb"], r["tf_fb"]) for r in
              sorted(got, key=lambda r: r["rank"])]
    # feedback set = docs 0,1 (only they contain 'query'); 'query'
    # itself excluded; apple df 2 beats banana df 1 despite tf 2
    assert ranked == [("apple", 2, 2), ("banana", 1, 2), ("cherry", 1, 1)]


def test_cuped_matches_numpy(spark):
    import random
    import numpy as np
    from mapbox_filter_spark.operators.analytics import cuped_adjust

    rng = random.Random(21)
    rows = []
    for i in range(400):
        x = rng.randrange(1000, 5000)
        y = 2 * x + rng.randrange(-500, 500)
        rows.append(("g", i, x, y))
    df = spark.createDataFrame(rows, "g string, i long, x long, y long")
    r = cuped_adjust(df, ["g"], "x", "y").collect()[0]
    xs = np.array([x for _, _, x, _ in rows], dtype=float)
    ys = np.array([y for _, _, _, y in rows], dtype=float)
    cov = np.cov(xs, ys, bias=True)[0, 1]
    vx, vy = xs.var(), ys.var()
    assert r["n"] == 400
    assert abs(r["theta"] - cov / vx) < 1e-9 * abs(cov / vx)
    assert abs(r["var_y"] - vy) < 1e-6 * vy
    want_adj = vy - cov * cov / vx
    assert abs(r["var_adj"] - want_adj) < 1e-6 * vy
    assert r["var_adj"] < r["var_y"]  # the point of CUPED
    assert 0.9 < r["rho2"] < 1.0


def test_cuped_degenerate_covariate(spark):
    from mapbox_filter_spark.operators.analytics import cuped_adjust

    df = spark.createDataFrame([("g", 5, 1), ("g", 5, 9)],
                               "g string, x long, y long")
    r = cuped_adjust(df, ["g"], "x", "y").collect()[0]
    assert r["theta"] is None and r["rho2"] is None
    assert r["var_adj"] == r["var_y"] == 16.0


def test_los_visibility_hand_terrain(spark):
    from mapbox_filter_spark.operators.raster import los_visibility

    # flat ground z=0 at x=0..4 on y=0, a wall z=10 at x=2; towers z=5
    # at the ends
    cells = spark.createDataFrame(
        [(0, 0, 5), (1, 0, 0), (2, 0, 10), (3, 0, 0), (4, 0, 5),
         (0, 2, 5), (4, 2, 5)],
        "cx long, cy long, z long")
    pairs = spark.createDataFrame(
        [(0, 0, 4, 0),   # blocked by the wall
         (0, 2, 4, 2),   # clear line (no cells between -> transparent)
         (0, 0, 1, 0)],  # adjacent: no intermediate steps
        "x0 long, y0 long, x1 long, y1 long")
    got = {(r["x0"], r["y0"], r["x1"], r["y1"]): r
           for r in los_visibility(cells, pairs, "cx", "cy",
                                   "z").collect()}
    assert got[(0, 0, 4, 0)]["visible"] is False
    assert got[(0, 0, 4, 0)]["n_blocked"] == 1
    assert got[(0, 2, 4, 2)]["visible"] is True
    assert got[(0, 0, 1, 0)]["visible"] is True and \
        got[(0, 0, 1, 0)]["n"] == 1


def test_los_grazing_counts_blocked(spark):
    from mapbox_filter_spark.operators.raster import los_visibility

    # ridge exactly ON the sight line (z=5 midway between 0 and 10):
    # grazing contact blocks by the >= convention
    cells = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 5), (2, 0, 10)], "cx long, cy long, z long")
    pairs = spark.createDataFrame([(0, 0, 2, 0)],
                                  "x0 long, y0 long, x1 long, y1 long")
    r = los_visibility(cells, pairs, "cx", "cy", "z").collect()[0]
    assert r["visible"] is False and r["n_blocked"] == 1


def test_d8_accumulation_ramp_and_confluence(spark):
    from mapbox_filter_spark.operators.raster import d8_accumulation

    # two branches joining: (0,1) z=5 and (0,-1) z=5 both flow into
    # (1,0) z=3, which flows to the pit (2,0) z=1
    rows = [(0, 1, 5), (0, -1, 5), (1, 0, 3), (2, 0, 1)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {(r["cx"], r["cy"]): (r["n_upstream"], r["is_sink"])
           for r in d8_accumulation(df, "cx", "cy", "z").collect()}
    assert got[(0, 1)] == (0, False)
    assert got[(0, -1)] == (0, False)
    assert got[(1, 0)] == (2, False)
    assert got[(2, 0)] == (3, True)


def test_d8_accumulation_long_chain_fixpoint(spark):
    from mapbox_filter_spark.operators.raster import d8_accumulation

    # a 12-cell strictly descending chain: the fixpoint loop must run
    # depth rounds, and the head count must be the full chain
    rows = [(x, 0, 100 - x) for x in range(12)]
    df = spark.createDataFrame(rows, "cx long, cy long, z long")
    got = {r["cx"]: r["n_upstream"]
           for r in d8_accumulation(df, "cx", "cy", "z").collect()}
    assert got[11] == 11 and got[0] == 0 and got[5] == 5
