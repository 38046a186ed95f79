"""Session-19 operator blocks: unit differentials + edge pins.

Each operator's oracle gate lives in tests/test_oracle.py via the
queries()/oracle_sql() registry; these tests are the independent brute
python replays and hand-pinned edge cases.
"""

import random

import pytest
from pyspark.sql import functions as F


# ---- idw_interpolate (Shepard p=2, exact-hit rule) ----

def _brute_idw(queries, corpus, radius):
    """Python replay: j-ordered left fold of wn/wd doubles."""
    r2 = radius * radius
    out = {}
    for q, qx, qy in queries:
        cand = []
        for j, cx, cy, v in corpus:
            d2 = (qx - cx) ** 2 + (qy - cy) ** 2
            if d2 <= r2:
                cand.append((j, d2, v))
        if not cand:
            continue
        cand.sort()
        n_exact = sum(1 for _, d2, _ in cand if d2 == 0)
        if n_exact:
            ev = sum(v for _, d2, v in cand if d2 == 0)
            y = float(ev) / float(n_exact)
        else:
            s_wn = 0.0
            s_wd = 0.0
            for _, d2, v in cand:
                s_wn += float(v) / float(d2)
                s_wd += 1.0 / float(d2)
            y = s_wn / s_wd
        out[q] = (len(cand), n_exact, y)
    return out


def test_idw_differential(spark):
    from mapbox_filter_spark.operators.spatialstats import idw_interpolate

    rng = random.Random(19)
    corpus = [(j, rng.randrange(0, 400), rng.randrange(0, 400),
               rng.randrange(-50, 500)) for j in range(120)]
    queries = [(q, rng.randrange(0, 400), rng.randrange(0, 400))
               for q in range(60)]
    # force exact hits: queries 100.. sit on corpus points
    for k in range(5):
        j, cx, cy, _ = corpus[k * 7]
        queries.append((100 + k, cx, cy))
    qdf = spark.createDataFrame(queries, "q long, x long, y long")
    cdf = spark.createDataFrame(corpus, "j long, x long, y long, v long")
    got = {r["q"]: (r["n_samples"], r["n_exact"], r["y_hat"])
           for r in idw_interpolate(qdf, cdf, 60).collect()}
    want = _brute_idw(queries, corpus, 60)
    assert set(got) == set(want)
    for q in want:
        assert got[q][0] == want[q][0], q
        assert got[q][1] == want[q][1], q
        assert got[q][2] == pytest.approx(want[q][2], abs=1e-12), q


def test_idw_exact_hit_mean(spark):
    from mapbox_filter_spark.operators.spatialstats import idw_interpolate

    # two coincident samples AT the query + one nearby: exact rule wins,
    # y_hat is the mean of the coincident values only
    corpus = [(1, 10, 10, 100), (2, 10, 10, 301), (3, 12, 10, 999)]
    queries = [(7, 10, 10)]
    qdf = spark.createDataFrame(queries, "q long, x long, y long")
    cdf = spark.createDataFrame(corpus, "j long, x long, y long, v long")
    rows = idw_interpolate(qdf, cdf, 5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_samples"], r["n_exact"]) == (3, 2)
    assert r["y_hat"] == pytest.approx((100 + 301) / 2.0)


def test_idw_out_of_range_drops(spark):
    from mapbox_filter_spark.operators.spatialstats import idw_interpolate

    corpus = [(1, 0, 0, 5)]
    queries = [(1, 0, 3), (2, 1000, 1000)]
    qdf = spark.createDataFrame(queries, "q long, x long, y long")
    cdf = spark.createDataFrame(corpus, "j long, x long, y long, v long")
    rows = {r["q"]: r for r in idw_interpolate(qdf, cdf, 10).collect()}
    assert set(rows) == {1}
    assert rows[1]["y_hat"] == pytest.approx(5.0)


def test_idw_gate_plan_no_python(spark):
    from mapbox_filter_spark.queries_geom import q_shepard_idw

    plan = q_shepard_idw(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---- hull_metrics (per-cell diameter + witness) ----

def _brute_hull_metrics(points, cell):
    from mapbox_filter_spark.geo.hull import hull_boundary_points

    cells = {}
    for x, y in set(points):
        cells.setdefault((x // cell, y // cell), []).append((x, y))
    out = {}
    for key, ps in cells.items():
        bnd = hull_boundary_points([p[0] for p in ps],
                                   [p[1] for p in ps])
        best = None
        for i, a in enumerate(sorted(ps)):
            for b in sorted(ps)[i + 1:]:
                d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                cand = (-d2, a[0], a[1], b[0], b[1])
                if best is None or cand < best:
                    best = cand
        if best is None:
            p = ps[0]
            out[key] = (len(ps), len(bnd), 0, p[0], p[1], p[0], p[1])
        else:
            out[key] = (len(ps), len(bnd), -best[0], best[1], best[2],
                        best[3], best[4])
    return out


def test_hull_metrics_differential(spark):
    from mapbox_filter_spark.geo.hull import hull_metrics

    rng = random.Random(42)
    pts = [(rng.randrange(0, 300), rng.randrange(0, 300))
           for _ in range(250)]
    pts += [(1000, 1000)]                     # single-point cell
    pts += [(2000 + 3 * k, 2000 + 4 * k) for k in range(6)]  # collinear
    pdf = spark.createDataFrame(list(set(pts)), "x long, y long")
    got = {(r["cx"], r["cy"]): (r["n_pts"], r["n_boundary"], r["diam2"],
                                r["ax"], r["ay"], r["bx"], r["by"])
           for r in hull_metrics(pdf, 100).collect()}
    want = _brute_hull_metrics(pts, 100)
    assert got == want


def test_hull_metrics_single_and_collinear(spark):
    from mapbox_filter_spark.geo.hull import hull_metrics

    pdf = spark.createDataFrame(
        [(5, 5), (50, 10), (60, 20), (70, 30)], "x long, y long")
    rows = {(r["cx"], r["cy"]): r
            for r in hull_metrics(pdf, 40).collect()}
    lone = rows[(0, 0)]
    assert (lone["n_pts"], lone["n_boundary"], lone["diam2"]) == (1, 1, 0)
    assert (lone["ax"], lone["ay"], lone["bx"], lone["by"]) == (5, 5, 5, 5)
    col = rows[(1, 0)]
    assert (col["n_pts"], col["n_boundary"]) == (3, 3)
    assert col["diam2"] == 20 * 20 + 20 * 20
    assert (col["ax"], col["ay"], col["bx"], col["by"]) == (50, 10, 70, 30)


# ---- clip_segments_to_tiles (exact Liang-Barsky tile cut) ----

def _brute_clip(segs, tile, scale, max_tiles=64):
    from fractions import Fraction

    out = set()
    for line_id, seg_i, x0, y0, x1, y1 in segs:
        assert min(x0, y0, x1, y1) >= 0
        dx, dy = x1 - x0, y1 - y0
        txl, txh = min(x0, x1) // tile, max(x0, x1) // tile
        tyl, tyh = min(y0, y1) // tile, max(y0, y1) // tile
        assert (txh - txl + 1) * (tyh - tyl + 1) <= max_tiles
        for tx in range(txl, txh + 1):
            for ty in range(tyl, tyh + 1):
                lo_x, hi_x = tx * tile, (tx + 1) * tile
                lo_y, hi_y = ty * tile, (ty + 1) * tile

                def axis(p0, d, lo, hi):
                    if d > 0:
                        return (Fraction(lo - p0, d),
                                Fraction(hi - p0, d))
                    if d < 0:
                        return (Fraction(hi - p0, d),
                                Fraction(lo - p0, d))
                    if lo <= p0 <= hi:
                        return Fraction(0), Fraction(1)
                    return Fraction(1), Fraction(0)

                ex0, ex1 = axis(x0, dx, lo_x, hi_x)
                ey0, ey1 = axis(y0, dy, lo_y, hi_y)
                t0 = max(ex0, ey0, Fraction(0))
                t1 = min(ex1, ey1, Fraction(1))
                if not t0 < t1:
                    continue

                def quant(p0, d, t):
                    v = Fraction(p0) + d * t
                    num = 2 * scale * v.numerator + v.denominator
                    return num // (2 * v.denominator)

                out.add((line_id, seg_i, tx, ty,
                         quant(x0, dx, t0), quant(y0, dy, t0),
                         quant(x0, dx, t1), quant(y0, dy, t1),
                         t0 > 0, t1 < 1))
    return out


def _clip_collect(spark, segs, tile, scale):
    from mapbox_filter_spark.geo.clip import clip_segments_to_tiles

    df = spark.createDataFrame(
        segs, "line_id long, seg_i long, x0 long, y0 long, "
              "x1 long, y1 long")
    rows = clip_segments_to_tiles(df, tile, scale).collect()
    return {tuple(r) for r in rows}


def test_clip_differential(spark):
    rng = random.Random(7)
    segs = []
    for k in range(80):
        x0, y0 = rng.randrange(0, 3000), rng.randrange(0, 3000)
        segs.append((1, k, x0, y0,
                     max(0, x0 + rng.randrange(-900, 900)),
                     max(0, y0 + rng.randrange(-900, 900))))
    got = _clip_collect(spark, segs, 512, 8)
    assert got == _brute_clip(segs, 512, 8)


def test_clip_boundary_conventions(spark):
    # endpoint exactly ON a shared boundary: only the source tile emits
    segs = [(1, 0, 100, 10, 512, 10)]
    got = _clip_collect(spark, segs, 512, 8)
    assert got == {(1, 0, 0, 0, 800, 80, 4096, 80, False, False)}

    # segment LYING on the boundary: floor-div bbox candidates put it
    # in the HIGHER tile only — no duplication
    segs = [(1, 1, 512, 100, 512, 400)]
    got = _clip_collect(spark, segs, 512, 8)
    assert {(r[2], r[3]) for r in got} == {(1, 0)}
    assert got == _brute_clip(segs, 512, 8)

    # crossing midway: clip point is an exact rational, cut flags set
    segs = [(2, 0, 0, 0, 1024, 100)]
    got = _clip_collect(spark, segs, 512, 8)
    assert got == _brute_clip(segs, 512, 8)
    by_tile = {(r[2], r[3]): r for r in got}
    left, right = by_tile[(0, 0)], by_tile[(1, 0)]
    assert left[8] is False and left[9] is True      # cut at exit
    assert right[8] is True and right[9] is False    # cut at entry
    assert left[6] == 512 * 8                        # qx1 on boundary
    assert left[7] == 400                            # y=50 exactly ×8

    # degenerate point segment on a corner → the floor-div tile only
    segs = [(3, 0, 512, 512, 512, 512)]
    got = _clip_collect(spark, segs, 512, 8)
    assert {(r[2], r[3]) for r in got} == {(1, 1)}
    assert got == _brute_clip(segs, 512, 8)


def test_clip_guards(spark):
    from mapbox_filter_spark.geo.clip import clip_segments_to_tiles

    df = spark.createDataFrame([(1, 0, -5, 0, 10, 10)],
                               "line_id long, seg_i long, x0 long, "
                               "y0 long, x1 long, y1 long")
    with pytest.raises(Exception, match="negative coordinate"):
        clip_segments_to_tiles(df, 512).collect()
    df2 = spark.createDataFrame([(1, 0, 0, 0, 100000, 100000)],
                                "line_id long, seg_i long, x0 long, "
                                "y0 long, x1 long, y1 long")
    with pytest.raises(Exception, match="spans"):
        clip_segments_to_tiles(df2, 64).collect()


# ---- maximal_independent_set (deterministic Luby) ----

def _u60(salt, rnd, u):
    import hashlib

    s = f"{salt}|r{rnd}\x1f{u}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_mis(edges, salt="mis"):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = set(adj)
    out = {}
    rnd = 0
    while live:
        pr = {u: (_u60(salt, rnd, u), u) for u in live}
        win = {u for u in live
               if all(pr[u] < pr[v] for v in adj[u] if v in live)}
        assert win, "Luby must remove at least the global min"
        for u in win:
            out[u] = rnd
        gone = set(win)
        for u in win:
            gone |= {v for v in adj[u] if v in live}
        live -= gone
        rnd += 1
    return out


def test_mis_differential(spark):
    from mapbox_filter_spark.operators.graph import \
        maximal_independent_set

    rng = random.Random(5)
    edges = list({(rng.randrange(0, 60), rng.randrange(0, 60))
                  for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["round"]
           for r in maximal_independent_set(df).collect()}
    want = _brute_mis(edges)
    assert got == want
    # independence + maximality against the adjacency
    adj = set()
    for a, b in edges:
        if a != b:
            adj |= {(a, b), (b, a)}
    mis = set(got)
    assert not any((a, b) in adj for a in mis for b in mis)
    nodes = {a for e in adj for a in e}
    for u in nodes - mis:
        assert any((u, v) in adj for v in mis), f"{u} uncovered"


def test_mis_path_and_star(spark):
    from mapbox_filter_spark.operators.graph import \
        maximal_independent_set

    star = [(0, k) for k in range(1, 8)]
    df = spark.createDataFrame(star, "src long, dst long")
    got = {r["node"]: r["round"]
           for r in maximal_independent_set(df).collect()}
    assert got == _brute_mis(star)
    mis = set(got)
    assert mis == set(range(1, 8)) or mis == {0}


# ---- krippendorff_alpha (nominal, varying raters) ----

def _brute_kripp(rows):
    """rows: (g, unit, cat) ratings; returns g -> alpha tuple."""
    from collections import Counter, defaultdict

    units = defaultdict(Counter)
    for g, u, c in rows:
        units[(g, u)][c] += 1
    per_g = defaultdict(list)
    for (g, u), cnt in units.items():
        m = sum(cnt.values())
        if m >= 2:
            per_g[g].append(cnt)
    out = {}
    for g, cl in per_g.items():
        n = sum(sum(c.values()) for c in cl)
        do_scaled = 0
        nc = Counter()
        for cnt in cl:
            m = sum(cnt.values())
            d = m * m - sum(v * v for v in cnt.values())
            do_scaled += d * (27720 // (m - 1))
            nc.update(cnt)
        se = sum(v * v for v in nc.values())
        if n * n - se > 0:
            alpha = 1.0 - float((n - 1) * do_scaled) \
                / float(27720 * (n * n - se))
        else:
            alpha = None
        out[g] = (len(cl), n, len(nc), do_scaled, se, alpha)
    return out


def test_krippendorff_differential(spark):
    from mapbox_filter_spark.operators.stats import krippendorff_alpha

    rng = random.Random(11)
    rows = []
    for g in range(3):
        for u in range(40):
            for _ in range(rng.randrange(1, 9)):   # includes singletons
                rows.append((g, u, rng.randrange(0, 4)))
    df = spark.createDataFrame(rows, "g long, u long, c long")
    got = {r["g"]: (r["n_units"], r["n_ratings"], r["n_cats"],
                    r["do_scaled"], r["se_cat"], r["alpha"])
           for r in krippendorff_alpha(df, ["g"], "u", "c").collect()}
    want = _brute_kripp(rows)
    assert set(got) == set(want)
    for g in want:
        assert got[g][:5] == want[g][:5], g
        assert got[g][5] == pytest.approx(want[g][5], abs=1e-12), g


def test_krippendorff_edges(spark):
    from mapbox_filter_spark.operators.stats import krippendorff_alpha

    # perfect agreement in 2 categories -> alpha = 1
    rows = [(0, u, u % 2) for u in range(6) for _ in range(3)]
    r = krippendorff_alpha(
        spark.createDataFrame(rows, "g long, u long, c long"),
        ["g"], "u", "c").collect()[0]
    assert r["alpha"] == pytest.approx(1.0)

    # one category only -> D_e = 0 -> NULL
    rows = [(0, u, 7) for u in range(4) for _ in range(2)]
    r = krippendorff_alpha(
        spark.createDataFrame(rows, "g long, u long, c long"),
        ["g"], "u", "c").collect()[0]
    assert r["alpha"] is None

    # singleton units drop; a group with only singletons vanishes
    rows = [(0, 1, 0), (0, 2, 1), (1, 1, 0), (1, 1, 1)]
    out = krippendorff_alpha(
        spark.createDataFrame(rows, "g long, u long, c long"),
        ["g"], "u", "c").collect()
    assert [r["g"] for r in out] == [1]

    # > 13 raters on one unit raises in-plan
    rows = [(0, 1, k % 2) for k in range(14)]
    with pytest.raises(Exception, match="raters on a unit"):
        krippendorff_alpha(
            spark.createDataFrame(rows, "g long, u long, c long"),
            ["g"], "u", "c").collect()


# ---- hodges_lehmann (lower-median Walsh average) ----

def _brute_hl(vals):
    n = len(vals)
    vs = sorted(vals)
    sums = sorted(vs[i] + vs[j] for i in range(n)
                  for j in range(i, n))
    np = n * (n + 1) // 2
    s = sums[(np + 1) // 2 - 1]
    return n, np, s, s / 2


def test_hodges_lehmann_differential(spark):
    from mapbox_filter_spark.operators.stats import hodges_lehmann

    rng = random.Random(3)
    rows = []
    for g in range(4):
        n = rng.randrange(1, 40)
        for i in range(n):
            rows.append((g, g * 1000 + i, rng.randrange(-500, 500)))
    df = spark.createDataFrame(rows, "g long, id long, x long")
    got = {r["g"]: (r["n"], r["n_pairs"], r["hl_num"], r["hl"])
           for r in hodges_lehmann(df, ["g"], "id", "x").collect()}
    by_g = {}
    for g, _, x in rows:
        by_g.setdefault(g, []).append(x)
    for g, vals in by_g.items():
        assert got[g] == _brute_hl(vals), g


def test_hodges_lehmann_edges(spark):
    from mapbox_filter_spark.operators.stats import hodges_lehmann

    # single row: HL = the value itself
    df = spark.createDataFrame([(0, 1, 7)], "g long, id long, x long")
    r = hodges_lehmann(df, ["g"], "id", "x").collect()[0]
    assert (r["n"], r["n_pairs"], r["hl_num"], r["hl"]) == (1, 1, 14, 7.0)

    # heavy tie mass: selection is well-defined and matches brute
    vals = [5] * 10 + [6] * 10 + [100]
    df = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "g long, id long, x long")
    r = hodges_lehmann(df, ["g"], "id", "x").collect()[0]
    assert (r["n"], r["n_pairs"], r["hl_num"], r["hl"]) == \
        _brute_hl(vals)

    # cap raises in-plan
    df = spark.createDataFrame([(0, i, i) for i in range(30)],
                               "g long, id long, x long")
    with pytest.raises(Exception, match="exceeds"):
        hodges_lehmann(df, ["g"], "id", "x", max_rows=20).collect()


# ---- crosscorr (lead-lag CCF) ----

def _brute_ccf(xs, ys, lags):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    zx = [n * v - sx for v in xs]
    zy = [n * v - sy for v in ys]
    dx = 0.0
    dy = 0.0
    for i in range(n):
        dx += float(zx[i]) * float(zx[i])
        dy += float(zy[i]) * float(zy[i])
    out = {}
    for L in lags:
        num = 0.0
        np_ = 0
        for i in range(n):
            j = i - L
            if 0 <= j < n:
                num += float(zx[i]) * float(zy[j])
                np_ += 1
        ccf = (num / (dx * dy) ** 0.5
               if np_ > 0 and dx > 0.0 and dy > 0.0 else None)
        out[L] = (n, np_, ccf)
    return out


def test_crosscorr_differential(spark):
    from mapbox_filter_spark.operators.temporal import crosscorr

    rng = random.Random(23)
    xs = [rng.randrange(-50, 50) for _ in range(40)]
    # y trails x by 2 with noise -> ccf peaks at lag +2
    ys = [xs[max(0, i - 2)] * 3 + rng.randrange(-5, 5)
          for i in range(40)]
    rows = [(1, i, xs[i], ys[i]) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, t long, x long, y long")
    lags = (-2, -1, 0, 1, 2)
    got = {r["lag"]: (r["n"], r["n_pairs"], r["ccf"])
           for r in crosscorr(df, ["k"], order_cols=("t",),
                              x_col="x", y_col="y", lags=lags).collect()}
    want = _brute_ccf(xs, ys, lags)
    assert set(got) == set(want)
    for L in lags:
        assert got[L][:2] == want[L][:2]
        assert got[L][2] == pytest.approx(want[L][2], rel=1e-12)
    # y trails x by 2 ⇒ x LEADS y ⇒ the documented convention puts the
    # peak at k = −2 (ccf pairs x_t with y_{t−k})
    assert max(got, key=lambda L: got[L][2]) == -2


def test_crosscorr_constant_series_null(spark):
    from mapbox_filter_spark.operators.temporal import crosscorr

    rows = [(1, i, 5, i) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, x long, y long")
    out = crosscorr(df, ["k"], order_cols=("t",), x_col="x",
                    y_col="y", lags=(0, 1)).collect()
    assert all(r["ccf"] is None for r in out)


# ---- ewma_chart ----

def _brute_ewma(xs, lam=0.25, L=3.0):
    import math

    n = len(xs)
    s = sum(xs)
    sq = sum(v * v for v in xs)
    mu = float(s) / float(n)
    var = float(n * sq - s * s) / float(n * n)
    sigma = math.sqrt(var)
    c2 = lam / (2.0 - lam)
    d1sq = (1.0 - lam) * (1.0 - lam)
    z, w = mu, 1.0
    out = []
    for t, x in enumerate(xs, 1):
        z = z + lam * (float(x) - z)
        w = w * d1sq
        half = (L * sigma) * math.sqrt(c2 * (1.0 - w))
        out.append((t, n, z, w, mu + half, mu - half,
                    z > mu + half or z < mu - half))
    return out


def test_ewma_differential(spark):
    from mapbox_filter_spark.operators.temporal import ewma_chart

    rng = random.Random(9)
    xs = [rng.randrange(90, 110) for _ in range(60)]
    xs += [130] * 6                      # mean shift -> must flag
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = sorted(
        (r["t"], r["n"], r["z"], r["w"], r["ucl"], r["lcl"], r["ooc"])
        for r in ewma_chart(df, ["k"], order_cols=("t",),
                            value_col="x").collect())
    want = _brute_ewma(xs)
    assert len(got) == len(want)
    for g, wv in zip(got, want):
        assert g[:2] == wv[:2]
        for a, b in zip(g[2:6], wv[2:6]):
            assert a == pytest.approx(b, rel=1e-12)
        assert g[6] == wv[6]
    assert any(r[6] for r in got), "shift must go out of control"


def test_ewma_guards(spark):
    from mapbox_filter_spark.operators.temporal import ewma_chart

    df = spark.createDataFrame([(1, i, i) for i in range(10)],
                               "k long, t long, x long")
    with pytest.raises(ValueError, match="power of two"):
        ewma_chart(df, ["k"], order_cols=("t",), value_col="x",
                   lam_num=1, lam_den=3)
    with pytest.raises(Exception, match="exceeds"):
        ewma_chart(df, ["k"], order_cols=("t",), value_col="x",
                   max_len=5).collect()


# ---- sax_words ----

def _brute_sax(xs, w=4, word_len=4, alphabet="abcd",
               breaks=(-0.6745, 0.0, 0.6745)):
    import math
    from collections import Counter

    n = len(xs)
    s = sum(xs)
    sq = sum(v * v for v in xs)
    z = [n * v - s for v in xs]
    sig = math.sqrt(float(n * sq - s * s) / float(n * n))
    pts = w * word_len
    words = Counter()
    for widx in range(n // pts):
        word = ""
        for seg in range(word_len):
            lo = widx * pts + seg * w
            sz = sum(z[lo:lo + w])
            sym = alphabet[-1]
            for ch, b in zip(alphabet, breaks):
                if float(sz) < (b * sig) * float(n * w):
                    sym = ch
                    break
            word += sym
        words[word] += 1
    return dict(words)


def test_sax_differential(spark):
    from mapbox_filter_spark.operators.temporal import sax_words

    rng = random.Random(77)
    xs = [rng.randrange(-100, 100) for _ in range(135)]  # 8 words + tail
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["word"]: r["n_words"]
           for r in sax_words(df, ["k"], order_cols=("t",),
                              value_col="x").collect()}
    assert got == _brute_sax(xs)
    assert sum(got.values()) == 135 // 16


def test_sax_constant_and_trend(spark):
    from mapbox_filter_spark.operators.temporal import sax_words

    # constant series -> every word is the top symbol
    rows = [(1, i, 5) for i in range(32)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["word"]: r["n_words"]
           for r in sax_words(df, ["k"], order_cols=("t",),
                              value_col="x").collect()}
    assert got == {"dddd": 2}

    # strong ramp -> first word starts low, last ends high
    rows = [(1, i, i * 10) for i in range(32)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["word"]: r["n_words"]
           for r in sax_words(df, ["k"], order_cols=("t",),
                              value_col="x").collect()}
    assert got == _brute_sax([i * 10 for i in range(32)])
    words = sorted(got)
    assert words[0][0] == "a" and words[-1][-1] == "d"


# ---- bom_explode (weighted forest closure) ----

def _brute_bom(edges):
    parent = {c: (p, q) for p, c, q in edges}
    out = {}
    for c in parent:
        q = 1
        d = 0
        u = c
        while u in parent:
            p, eq = parent[u]
            q *= eq
            d += 1
            out[(p, c)] = (q, d)
            u = p
    return out


def test_bom_differential(spark):
    from mapbox_filter_spark.operators.graph import bom_explode

    # 3-ary forest over 1..80, parent = n // 3, qty = n % 4 + 1
    edges = [(n // 3, n, n % 4 + 1) for n in range(3, 81)]
    df = spark.createDataFrame(edges, "parent long, child long, qty long")
    got = {(r["anc"], r["descendant"]): (r["total_qty"], r["depth"])
           for r in bom_explode(df).collect()}
    assert got == _brute_bom(edges)


def test_bom_deep_chain_and_forest_guard(spark):
    from mapbox_filter_spark.operators.graph import bom_explode

    chain = [(i, i + 1, 2) for i in range(20)]   # depth 20 < 2^5
    df = spark.createDataFrame(chain, "parent long, child long, qty long")
    got = {(r["anc"], r["descendant"]): (r["total_qty"], r["depth"])
           for r in bom_explode(df).collect()}
    assert got[(0, 20)] == (2 ** 20, 20)
    assert len(got) == 20 * 21 // 2

    bad = [(1, 3, 1), (2, 3, 1)]
    df = spark.createDataFrame(bad, "parent long, child long, qty long")
    with pytest.raises(Exception, match="not a forest"):
        bom_explode(df).collect()


# ---- bartlett_test ----

def _brute_bartlett(cells):
    """cells: list of value-lists (one per cell, order = cell key)."""
    import math

    cells = [c for c in cells if len(c) >= 2]
    k = len(cells)
    n = sum(len(c) for c in cells)
    lnsum = 0.0
    spnum = 0.0
    rsum = 0.0
    has0 = False
    for c in cells:
        ni = len(c)
        s = sum(c)
        sq = sum(v * v for v in c)
        num = ni * sq - s * s
        if num == 0:
            has0 = True
        lnsum += float(ni - 1) * math.log(
            float(num) / float(ni * (ni - 1)))
        spnum += float(num) / float(ni)
        rsum += 1.0 / float(ni - 1)
    nk = float(n - k)
    sp2 = spnum / nk
    cfac = 1.0 + (rsum - 1.0 / nk) / (3.0 * float(k - 1))
    chi2 = None if (k < 2 or has0) \
        else (nk * math.log(sp2) - lnsum) / cfac
    return k, n, sp2, cfac, chi2


def test_bartlett_differential(spark):
    from mapbox_filter_spark.operators.stats import bartlett_test

    rng = random.Random(31)
    cells = [[rng.randrange(-100, 100 + 40 * c) for _ in
              range(rng.randrange(5, 25))] for c in range(6)]
    cells.append([7])                       # singleton drops
    rows = [(0, c, v) for c, vs in enumerate(cells) for v in vs]
    df = spark.createDataFrame(rows, "g long, c long, x long")
    r = bartlett_test(df, ["g"], "c", "x").collect()[0]
    k, n, sp2, cfac, chi2 = _brute_bartlett(cells)
    assert (r["k"], r["n_total"]) == (k, n)
    assert r["sp2"] == pytest.approx(sp2, rel=1e-12)
    assert r["c_factor"] == pytest.approx(cfac, rel=1e-12)
    assert r["chi2"] == pytest.approx(chi2, rel=1e-10)


def test_bartlett_constant_cell_null(spark):
    from mapbox_filter_spark.operators.stats import bartlett_test

    rows = ([(0, 0, v) for v in (1, 5, 9, 2)]
            + [(0, 1, 4)] * 3)              # constant cell -> NULL
    df = spark.createDataFrame(rows, "g long, c long, x long")
    r = bartlett_test(df, ["g"], "c", "x").collect()[0]
    assert r["k"] == 2 and r["chi2"] is None


# ---- wl_colors (1-WL refinement) ----

def _brute_wl(edges, rounds=2, salt="wl"):
    import hashlib

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    col = {u: len(vs) for u, vs in adj.items()}
    for k in range(rounds):
        nxt = {}
        for u in adj:
            nb = ",".join(str(c) for c in sorted(col[v]
                                                 for v in adj[u]))
            s = f"{salt}{k}\x1f{col[u]}\x1f{nb}"
            nxt[u] = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        col = nxt
    return col


def test_wl_differential(spark):
    from mapbox_filter_spark.operators.graph import wl_colors

    rng = random.Random(13)
    edges = list({(rng.randrange(0, 40), rng.randrange(0, 40))
                  for _ in range(90)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["color"] for r in wl_colors(df).collect()}
    assert got == _brute_wl(edges)


def test_wl_regular_graph_limitation(spark):
    from collections import Counter

    from mapbox_filter_spark.operators.graph import wl_colors

    # C6 vs 2xC3: 1-WL famously CANNOT separate equal-degree regular
    # graphs — both histograms collapse to one color class of 6
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    tri2 = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (22, 20)]
    h6 = Counter(r["color"] for r in wl_colors(
        spark.createDataFrame(c6, "src long, dst long")).collect())
    h3 = Counter(r["color"] for r in wl_colors(
        spark.createDataFrame(tri2, "src long, dst long")).collect())
    assert h6 == h3 and len(h6) == 1

    # path P4 vs star S3: same edge count, different histograms
    p4 = [(0, 1), (1, 2), (2, 3)]
    s3 = [(0, 1), (0, 2), (0, 3)]
    hp = Counter(r["color"] for r in wl_colors(
        spark.createDataFrame(p4, "src long, dst long")).collect())
    hs = Counter(r["color"] for r in wl_colors(
        spark.createDataFrame(s3, "src long, dst long")).collect())
    assert hp != hs


# ---- symspell_correct ----

def _lev(a, b):
    n, m = len(a), len(b)
    d = list(range(m + 1))
    for i in range(1, n + 1):
        prev, d[0] = d[0], i
        for j in range(1, m + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[m]


def _brute_symspell(queries, lexicon):
    out = {}
    for qid, q in queries:
        best = None
        for t, f in lexicon:
            # same candidate set as the delete trick + verify
            if _lev(q, t) <= 1:
                cand = (_lev(q, t), -f, t)
                if best is None or cand < best:
                    best = cand
        if best is not None:
            out[(qid, q)] = (best[2], best[0], -best[1])
    return out


def test_symspell_differential(spark):
    from mapbox_filter_spark.operators.text import symspell_correct

    lexicon = [("table", 50), ("cable", 40), ("tablet", 30),
               ("stable", 20), ("tale", 35), ("able", 10),
               ("word", 5), ("ward", 9)]
    queries = [(1, "tble"), (2, "tabl"), (3, "cble"), (4, "wird"),
               (5, "zzz"), (6, "table"), (7, "tables"), (8, "wrd")]
    qdf = spark.createDataFrame(queries, "qid long, term string")
    ldf = spark.createDataFrame(lexicon, "term string, freq long")
    got = {(r["qid"], r["term"]): (r["suggestion"], r["dist"], r["freq"])
           for r in symspell_correct(qdf, ldf).collect()}
    assert got == _brute_symspell(queries, lexicon)
    assert (1, "tble") in got and got[(1, "tble")][0] == "table"
    assert (5, "zzz") not in got                      # out of range
    assert got[(6, "table")] == ("table", 0, 50)      # exact hit wins
    # tie on distance resolves by higher freq: "wird" -> ward(9) vs
    # word(5) both dist 1
    assert got[(4, "wird")] == ("ward", 1, 9)


def test_symspell_guard(spark):
    from mapbox_filter_spark.operators.text import symspell_correct

    qdf = spark.createDataFrame([(1, "x" * 30)], "qid long, term string")
    ldf = spark.createDataFrame([("ok", 1)], "term string, freq long")
    with pytest.raises(Exception, match="longer than"):
        symspell_correct(qdf, ldf).collect()


# ---- mahalanobis2d ----

def _brute_maha(pts, thr=5.991464547107979):
    n = len(pts)
    sx = sum(p[1] for p in pts)
    sy = sum(p[2] for p in pts)
    sxx = sum(p[1] * p[1] for p in pts)
    sxy = sum(p[1] * p[2] for p in pts)
    syy = sum(p[2] * p[2] for p in pts)
    a = n * sxx - sx * sx
    b = n * sxy - sx * sy
    c = n * syy - sy * sy
    det = a * c - b * b
    out = {}
    for pid, x, y in pts:
        if det <= 0:
            out[pid] = (None, None)
            continue
        zx, zy = n * x - sx, n * y - sy
        num = c * zx * zx - 2 * b * zx * zy + a * zy * zy
        d2 = float(num) / float(det)
        out[pid] = (d2, d2 > thr)
    return out


def test_mahalanobis_differential(spark):
    from mapbox_filter_spark.operators.stats import mahalanobis2d

    rng = random.Random(55)
    # correlated cloud + one on-axis-innocent / off-ridge outlier
    pts = []
    for i in range(200):
        x = rng.randrange(-1000, 1000)
        pts.append((i, x, x + rng.randrange(-100, 100)))
    pts.append((900, 800, -800))      # 2σ on each axis, off the ridge
    rows = [(0, *p) for p in pts]
    df = spark.createDataFrame(rows, "g long, id long, x long, y long")
    got = {r["id"]: (r["d2m"], r["outlier"])
           for r in mahalanobis2d(df, ["g"], "id", "x", "y").collect()}
    want = _brute_maha(pts)
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == pytest.approx(want[pid][0], rel=1e-12)
        assert got[pid][1] == want[pid][1]
    assert got[900][1] is True


def test_mahalanobis_degenerate_and_rails(spark):
    from mapbox_filter_spark.operators.stats import mahalanobis2d

    # collinear -> det = 0 -> NULLs
    rows = [(0, i, i, 2 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "g long, id long, x long, y long")
    out = mahalanobis2d(df, ["g"], "id", "x", "y").collect()
    assert all(r["d2m"] is None and r["outlier"] is None for r in out)

    df = spark.createDataFrame([(0, 1, 200_001, 0), (0, 2, 5, 5)],
                               "g long, id long, x long, y long")
    with pytest.raises(Exception, match="exceeds 100000"):
        mahalanobis2d(df, ["g"], "id", "x", "y").collect()


# ---- clip_rings_to_tiles (Sutherland-Hodgman tile cut) ----

def _sh_stage(ring, axis, cmp, bound):
    if not ring:
        return []
    out = []
    prev = ring[-1]
    for cur in ring:
        pc = cur[0] if axis == "x" else cur[1]
        pp = prev[0] if axis == "x" else prev[1]
        ic = pc >= bound if cmp == "ge" else pc <= bound
        ip = pp >= bound if cmp == "ge" else pp <= bound
        if ic != ip:
            d = pc - pp
            off_c = cur[1] if axis == "x" else cur[0]
            off_p = prev[1] if axis == "x" else prev[0]
            num = off_p * d + (off_c - off_p) * (bound - pp)
            if d < 0:
                num, d = -num, -d
            ioff = (2 * num + d) // (2 * d)
            ipt = (bound, ioff) if axis == "x" else (ioff, bound)
            out.append(ipt)
        if ic:
            out.append(cur)
        prev = cur
    return out


def _brute_ring_clip(rings, tile, scale):
    out = {}
    ts = tile * scale
    for rid, verts in rings:
        sv = [(x * scale, y * scale) for x, y in verts]
        xs = [p[0] for p in sv]
        ys = [p[1] for p in sv]
        for tx in range(min(xs) // ts, max(xs) // ts + 1):
            for ty in range(min(ys) // ts, max(ys) // ts + 1):
                r = _sh_stage(sv, "x", "ge", tx * ts)
                r = _sh_stage(r, "x", "le", (tx + 1) * ts)
                r = _sh_stage(r, "y", "ge", ty * ts)
                r = _sh_stage(r, "y", "le", (ty + 1) * ts)
                if r:
                    ded = [p for k, p in enumerate(r)
                           if len(r) == 1 or p != r[k - 1]]
                    if len(ded) >= 3:
                        out[(rid, tx, ty)] = ded
    return out


def _ring_clip_collect(spark, rings, tile, scale):
    rows = [(rid, [{"x": x, "y": y} for x, y in verts])
            for rid, verts in rings]
    df = spark.createDataFrame(
        rows, "ring_id long, verts array<struct<x: long, y: long>>")
    from mapbox_filter_spark.geo.clip import clip_rings_to_tiles

    res = {}
    for r in clip_rings_to_tiles(df, tile, scale).collect():
        res.setdefault((r["ring_id"], r["tx"], r["ty"]), []).append(
            (r["i"], r["x"], r["y"]))
    return {k: [(x, y) for _, x, y in sorted(v)]
            for k, v in res.items()}


def test_ring_clip_differential(spark):
    rng = random.Random(21)
    rings = []
    for rid in range(25):
        cx, cy = rng.randrange(200, 1800), rng.randrange(200, 1800)
        r = rng.randrange(50, 600)
        rings.append((rid, [(cx + r, cy), (cx, cy + r),
                            (max(0, cx - r), cy), (cx, max(0, cy - r))]))
    got = _ring_clip_collect(spark, rings, 512, 8)
    assert got == _brute_ring_clip(rings, 512, 8)


def test_ring_clip_conventions(spark):
    # fully inside: passes through verbatim (×scale)
    rings = [(1, [(10, 10), (100, 10), (100, 100), (10, 100)])]
    got = _ring_clip_collect(spark, rings, 512, 8)
    assert got == {(1, 0, 0): [(80, 80), (800, 80),
                               (800, 800), (80, 800)]}

    # square straddling the x=512 boundary: two clipped halves
    rings = [(2, [(400, 100), (600, 100), (600, 200), (400, 200)])]
    got = _ring_clip_collect(spark, rings, 512, 8)
    assert set(got) == {(2, 0, 0), (2, 1, 0)}
    b = 512 * 8
    assert got[(2, 0, 0)] == [(400 * 8, 100 * 8), (b, 100 * 8),
                              (b, 200 * 8), (400 * 8, 200 * 8)]
    assert got[(2, 1, 0)] == [(b, 100 * 8), (600 * 8, 100 * 8),
                              (600 * 8, 200 * 8), (b, 200 * 8)]
    assert got == _brute_ring_clip(rings, 512, 8)

    # diagonal cut: rational intersection snapped half-up
    rings = [(3, [(500, 0), (532, 64), (500, 64)])]
    got = _ring_clip_collect(spark, rings, 512, 8)
    assert got == _brute_ring_clip(rings, 512, 8)
    assert set(got) == {(3, 0, 0), (3, 1, 0)}


# ---- process_capability ----

def test_cpk_differential_and_edges(spark):
    import math

    from mapbox_filter_spark.operators.stats import process_capability

    rng = random.Random(8)
    vals = [rng.randrange(200, 800) for _ in range(300)]
    df = spark.createDataFrame([(0, v) for v in vals], "g long, x long")
    r = process_capability(df, ["g"], "x", lsl=0, usl=1000).collect()[0]
    n = len(vals)
    s = sum(vals)
    sq = sum(v * v for v in vals)
    mu = float(s) / n
    sig = math.sqrt(float(n * sq - s * s) / float(n * n))
    assert r["mu"] == pytest.approx(mu, rel=1e-12)
    assert r["sigma"] == pytest.approx(sig, rel=1e-12)
    assert r["cp"] == pytest.approx(1000.0 / (6.0 * sig), rel=1e-12)
    assert r["cpk"] == pytest.approx(
        min(1000.0 - mu, mu - 0.0) / (3.0 * sig), rel=1e-12)

    # constant group -> NULLs; off-center process: cpk < cp
    df = spark.createDataFrame([(0, 5)] * 4, "g long, x long")
    r = process_capability(df, ["g"], "x", lsl=0, usl=10).collect()[0]
    assert r["cp"] is None and r["cpk"] is None

    df = spark.createDataFrame([(0, v) for v in (900, 910, 920, 930)],
                               "g long, x long")
    r = process_capability(df, ["g"], "x", lsl=0, usl=1000).collect()[0]
    assert r["cpk"] < r["cp"]

    with pytest.raises(ValueError):
        process_capability(df, ["g"], "x", lsl=10, usl=10)


# ---- tile_coverage composition: area conservation across the cut ----

def test_ring_clip_area_conservation(spark):
    from mapbox_filter_spark.geo.clip import clip_rings_to_tiles

    def shoelace2(vs):
        n = len(vs)
        return abs(sum(vs[i][0] * vs[(i + 1) % n][1]
                       - vs[(i + 1) % n][0] * vs[i][1]
                       for i in range(n)))

    rng = random.Random(99)
    scale = 8
    for _ in range(5):
        cx, cy = rng.randrange(400, 1600), rng.randrange(400, 1600)
        r = rng.randrange(100, 700)
        verts = [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)]
        rows = [(1, [{"x": x, "y": y} for x, y in verts])]
        df = spark.createDataFrame(
            rows, "ring_id long, verts array<struct<x: long, y: long>>")
        pieces = {}
        for rr in clip_rings_to_tiles(df, 512, scale).collect():
            pieces.setdefault((rr["tx"], rr["ty"]), []).append(
                (rr["i"], rr["x"], rr["y"]))
        total = sum(shoelace2([(x, y) for _, x, y in sorted(v)])
                    for v in pieces.values())
        orig = shoelace2([(x * scale, y * scale) for x, y in verts])
        # snap-on-clip shifts each cut vertex by < 1 unit: the area
        # error is bounded by ~perimeter, far under 0.1% here
        assert abs(total - orig) <= 8 * 4 * r * scale // 100 + 16, \
            (total, orig)


# ---- platt_scaling ----

def _brute_platt(data, iters=6, ridge=1e-12):
    import math

    def sigmoid(z):
        e = math.exp(-abs(z))
        return 1.0 / (1.0 + e) if z >= 0 \
            else math.exp(z) / (1.0 + math.exp(z))

    data = sorted(data)
    n = len(data)
    npos = sum(y for _, y in data)
    nneg = n - npos
    tp = float(npos + 1) / float(npos + 2)
    tm = 1.0 / float(nneg + 2)
    a, b = 0.0, math.log(float(nneg + 1) / float(npos + 1))
    for _ in range(iters):
        ga = gb = haa = hab = hbb = 0.0
        for s, y in data:
            u = sigmoid(a * float(s) + b)
            t = tp if y == 1 else tm
            d = u - (1.0 - t)
            ga += d * float(s)
            gb += d
            haa += u * (1.0 - u) * float(s) * float(s)
            hab += u * (1.0 - u) * float(s)
            hbb += u * (1.0 - u)
        haa += ridge
        hbb += ridge
        det = haa * hbb - hab * hab
        a = a - (hbb * ga - hab * gb) / det
        b = b - (haa * gb - hab * ga) / det
    return n, npos, a, b


def test_platt_differential(spark):
    import math

    from mapbox_filter_spark.operators.ml import platt_scaling

    rng = random.Random(4)
    data = []
    for i in range(400):
        s = rng.randrange(-40, 40)
        pr = 1.0 / (1.0 + math.exp(-0.2 * s))
        data.append((s, 1 if rng.random() < pr else 0))
    rows = [(0, s, y) for s, y in data]
    df = spark.createDataFrame(rows, "g long, s long, y int")
    r = platt_scaling(df, ["g"], "s", "y").collect()[0]
    n, npos, a, b = _brute_platt(data)
    assert (r["n"], r["n_pos"]) == (n, npos)
    assert r["a"] == pytest.approx(a, rel=1e-9)
    assert r["b"] == pytest.approx(b, rel=1e-9)
    # the fitted slope must recover the negative of the generator's
    # logit scale (Platt's A multiplies inside 1/(1+exp(A s + B)))
    assert r["a"] == pytest.approx(-0.2, abs=0.05)


def test_platt_separable_bounded(spark):
    from mapbox_filter_spark.operators.ml import platt_scaling

    rows = [(0, s, 1 if s > 0 else 0)
            for s in range(-20, 21) if s != 0]
    df = spark.createDataFrame(rows, "g long, s long, y int")
    r = platt_scaling(df, ["g"], "s", "y").collect()[0]
    data = [(s, y) for _, s, y in rows]
    n, npos, a, b = _brute_platt(data)
    assert r["a"] == pytest.approx(a, rel=1e-9)
    assert abs(r["a"]) < 100          # fixed iterations bound the march


# ---- min_cover_window ----

def _brute_mcw(text, terms):
    toks = text.lower().split()
    occ = [(i, w) for i, w in enumerate(toks) if w in terms]
    best = None
    for p, _ in occ:
        ends = []
        ok = True
        for t in terms:
            nxt = [i for i, w in occ if w == t and i >= p]
            if not nxt:
                ok = False
                break
            ends.append(min(nxt))
        if ok:
            e = max(ends)
            c = (e - p + 1, p, e)
            if best is None or c < best:
                best = c
    return best


def test_mcw_differential(spark):
    rng = random.Random(6)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    terms = ["aa", "bb", "cc"]
    rows = []
    for d in range(40):
        rows.append((d, " ".join(rng.choice(vocab)
                                 for _ in range(rng.randrange(3, 60)))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from mapbox_filter_spark.operators.retrieval import min_cover_window

    got = {r["doc_id"]: (r["win_len"], r["lo"], r["hi"])
           for r in min_cover_window(df, terms).collect()}
    for d, text in rows:
        want = _brute_mcw(text, terms)
        if want is None:
            assert d not in got
        else:
            assert got[d] == want, (d, text)


def test_mcw_pinned_cases(spark):
    from mapbox_filter_spark.operators.retrieval import min_cover_window

    rows = [
        (1, "x aa y bb cc aa bb x"),     # best = [3,5] len 3 (bb cc aa? no: cc at 4)
        (2, "aa bb cc"),                 # exact cover
        (3, "aa bb aa bb"),              # missing cc -> drops
        (4, "cc bb aa cc aa bb cc"),     # leftmost tie rule
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["win_len"], r["lo"], r["hi"])
           for r in min_cover_window(df, ["aa", "bb", "cc"]).collect()}
    assert 3 not in got
    assert got[2] == (3, 0, 2)
    for d, text in rows:
        if d in got:
            assert got[d] == _brute_mcw(text, ["aa", "bb", "cc"])


# ---- sprt_monitor ----

def _brute_sprt(outcomes, p0, p1, alpha=0.05, beta=0.2):
    import math

    c1 = math.log(p1 / p0)
    c2 = math.log((1.0 - p1) / (1.0 - p0))
    a = math.log((1.0 - beta) / alpha)
    b = math.log(beta / (1.0 - alpha))
    k = 0
    cross = None
    for t, y in enumerate(outcomes, 1):
        k += y
        llr = c1 * float(k) + c2 * float(t - k)
        if cross is None:
            if llr >= a:
                cross = (t, "h1", llr)
            elif llr <= b:
                cross = (t, "h0", llr)
    n = len(outcomes)
    if cross is None:
        return (n, k, "continue", None, None)
    return (n, k, cross[1], cross[0], cross[2])


def test_sprt_differential(spark):
    from mapbox_filter_spark.operators.analytics import sprt_monitor

    rng = random.Random(14)
    cases = {0: 0.30, 1: 0.10, 2: 0.21}   # h1-ish, h0-ish, ambiguous
    rows = []
    series = {}
    for g, p in cases.items():
        ys = [1 if rng.random() < p else 0 for _ in range(300)]
        series[g] = ys
        rows += [(g, t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g long, t long, y int")
    got = {r["g"]: (r["n_obs"], r["n_pos"], r["decision"],
                    r["t_cross"], r["llr_cross"])
           for r in sprt_monitor(df, ["g"], order_cols=("t",),
                                 outcome_col="y",
                                 p0=0.2, p1=0.3).collect()}
    for g, ys in series.items():
        want = _brute_sprt(ys, 0.2, 0.3)
        assert got[g][:4] == want[:4], g
        if want[4] is None:
            assert got[g][4] is None
        else:
            assert got[g][4] == pytest.approx(want[4], rel=1e-12)
    assert got[0][2] == "h1" and got[1][2] == "h0"


def test_sprt_validates_params(spark):
    from mapbox_filter_spark.operators.analytics import sprt_monitor

    df = spark.createDataFrame([(0, 1, 1)], "g long, t long, y int")
    with pytest.raises(ValueError):
        sprt_monitor(df, ["g"], order_cols=("t",), outcome_col="y",
                     p0=0.2, p1=0.2)


# ---- k_anonymity_generalize ----

def _brute_kanon(ghs, k, precision):
    from collections import Counter

    cnt = Counter()
    for _, g in ghs:
        for p in range(1, precision + 1):
            cnt[(p, g[:p])] += 1
    out = {}
    for pid, g in ghs:
        best = None
        for p in range(1, precision + 1):
            if cnt[(p, g[:p])] >= k:
                best = (p, g[:p], cnt[(p, g[:p])])
        out[pid] = best if best else (0, None, None)
    return out


def test_kanon_differential(spark):
    from mapbox_filter_spark.operators.privacy import \
        k_anonymity_generalize

    rng = random.Random(2)
    ghs = [(i, "".join(rng.choice("ab") for _ in range(4)))
           for i in range(120)]
    ghs.append((999, "zzzz"))           # unique everywhere -> suppress
    df = spark.createDataFrame(ghs, "id long, gh string")
    got = {r["id"]: (r["prec"], r["cell"], r["cell_count"])
           for r in k_anonymity_generalize(df, 5, 4).collect()}
    assert got == _brute_kanon(ghs, 5, 4)
    assert got[999] == (0, None, None)
    # monotone safety: every published cell holds >= k peers
    for pid, (p, cell, c) in got.items():
        if p > 0:
            assert c >= 5


# ---- tile_knapsack ----

def _brute_knap(items, cap):
    dp = [0] * (cap + 1)
    for _, w, v in sorted(items):
        if w > cap:
            continue
        ndp = dp[:]
        for c in range(cap + 1):
            if c >= w:
                ndp[c] = max(dp[c], dp[c - w] + v)
        dp = ndp
    return dp[cap]


def test_knapsack_differential(spark):
    from mapbox_filter_spark.operators.assemble import tile_knapsack

    rng = random.Random(17)
    rows = []
    tiles = {}
    for tz in range(6):
        its = [(i, rng.randrange(1, 20), rng.randrange(1, 50))
               for i in range(rng.randrange(1, 30))]
        tiles[tz] = its
        rows += [(10, tz, 0, i, w, v) for i, w, v in its]
    df = spark.createDataFrame(
        rows, "z long, x long, y long, feature_id long, w long, v long")
    got = {r["x"]: (r["n_items"], r["w_total"], r["best_value"])
           for r in tile_knapsack(df, 48).collect()}
    for tz, its in tiles.items():
        assert got[tz] == (len(its), sum(w for _, w, _ in its),
                           _brute_knap(its, 48)), tz


def test_knapsack_edges(spark):
    from mapbox_filter_spark.operators.assemble import tile_knapsack

    # overweight item excluded but counted; optimal skips greedy trap
    rows = [(0, 0, 0, 1, 100, 999),     # > capacity: never packs
            (0, 0, 0, 2, 6, 10),        # greedy-by-density trap
            (0, 0, 0, 3, 5, 8),
            (0, 0, 0, 4, 5, 8)]
    df = spark.createDataFrame(
        rows, "z long, x long, y long, feature_id long, w long, v long")
    r = tile_knapsack(df, 10).collect()[0]
    assert (r["n_items"], r["w_total"], r["best_value"]) == (4, 116, 16)

    df = spark.createDataFrame(
        [(0, 0, 0, 1, 0, 5)],
        "z long, x long, y long, feature_id long, w long, v long")
    with pytest.raises(Exception, match="non-positive"):
        tile_knapsack(df, 10).collect()


# ---- transfer_entropy ----

def _brute_te(xs, ys):
    import math
    from collections import Counter

    def one(drv, tgt):
        c3 = Counter()
        for t in range(len(tgt) - 1):
            c3[(tgt[t + 1], tgt[t], drv[t])] += 1
        n = sum(c3.values())
        s = 0.0
        for (yp, y, x) in sorted(c3):
            c = c3[(yp, y, x)]
            cyx = sum(v for k, v in c3.items()
                      if k[1] == y and k[2] == x)
            cyy = sum(v for k, v in c3.items()
                      if k[0] == yp and k[1] == y)
            cy = sum(v for k, v in c3.items() if k[1] == y)
            s += float(c) * math.log(float(c * cy) / float(cyx * cyy))
        return n, s / float(n)

    return {"x->y": one(xs, ys), "y->x": one(ys, xs)}


def test_te_differential_and_direction(spark):
    rng = random.Random(3)
    n = 600
    xs = [rng.randrange(2) for _ in range(n)]
    # y copies x with one step delay 85% of the time -> TE(x->y) >> TE(y->x)
    ys = [0] + [xs[t - 1] if rng.random() < 0.85 else rng.randrange(2)
                for t in range(1, n)]
    rows = [(0, t, xs[t], ys[t]) for t in range(n)]
    df = spark.createDataFrame(rows, "g long, t long, x int, y int")
    from mapbox_filter_spark.operators.temporal import transfer_entropy

    got = {r["direction"]: (r["n_trans"], r["te_nats"])
           for r in transfer_entropy(df, ["g"]).collect()}
    want = _brute_te(xs, ys)
    for d in ("x->y", "y->x"):
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
    assert got["x->y"][1] > 5 * max(got["y->x"][1], 1e-6)


def test_te_independent_near_zero(spark):
    rng = random.Random(44)
    n = 800
    xs = [rng.randrange(2) for _ in range(n)]
    ys = [rng.randrange(2) for _ in range(n)]
    rows = [(0, t, xs[t], ys[t]) for t in range(n)]
    df = spark.createDataFrame(rows, "g long, t long, x int, y int")
    from mapbox_filter_spark.operators.temporal import transfer_entropy

    got = {r["direction"]: r["te_nats"]
           for r in transfer_entropy(df, ["g"]).collect()}
    assert abs(got["x->y"]) < 0.01 and abs(got["y->x"]) < 0.01
    assert got == {k: pytest.approx(v[1], rel=1e-12)
                   for k, v in _brute_te(xs, ys).items()}


# ---- l_diversity_audit ----

def test_l_diversity_audit(spark):
    from mapbox_filter_spark.operators.privacy import l_diversity_audit

    # two dense cells: one diverse, one with a single sensitive value
    rows = ([(i, "aaxx", i % 4) for i in range(12)]
            + [(100 + i, "abyy", 7) for i in range(12)]
            + [(999, "zzzz", 1)])          # suppressed singleton
    df = spark.createDataFrame(rows, "id long, gh string, s long")
    out = {(r["prec"], r["cell"]): (r["n"], r["n_sensitive"],
                                    r["diverse"])
           for r in l_diversity_audit(df, 5, 4, 3).collect()}
    assert out[(4, "aaxx")] == (12, 4, True)
    assert out[(4, "abyy")] == (12, 1, False)     # k-anon yet leaking
    assert out[(0, None)][2] is False             # suppressed row


# ---- rouge_n ----

def _brute_rouge(cand, ref, n=2):
    from collections import Counter

    def grams(t):
        w = [x for x in t.lower().split() if x]
        return Counter(tuple(w[i:i + n])
                       for i in range(len(w) - n + 1))

    gc, gr = grams(cand), grams(ref)
    m = sum(min(c, gr[g]) for g, c in gc.items())
    nc, nr = sum(gc.values()), sum(gr.values())
    p = m / nc if nc else None
    r = m / nr if nr else None
    f = 2.0 * m / (nc + nr) if nc and nr else None
    return m, nc, nr, p, r, f


def test_rouge_differential(spark):
    from mapbox_filter_spark.operators.text import rouge_n

    rng = random.Random(66)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = []
    for d in range(30):
        cand = " ".join(rng.choice(vocab)
                        for _ in range(rng.randrange(0, 25)))
        ref = " ".join(rng.choice(vocab)
                       for _ in range(rng.randrange(0, 25)))
        rows.append((d, cand, ref))
    df = spark.createDataFrame(rows, "doc_id long, cand string, "
                                     "ref string")
    got = {r["doc_id"]: (r["n_match"], r["n_cand"], r["n_ref"],
                         r["precision"], r["recall"], r["f1"])
           for r in rouge_n(df, 2).collect()}
    for d, cand, ref in rows:
        m, nc, nr, p, rr, f = _brute_rouge(cand, ref)
        assert got[d][:3] == (m, nc, nr), d
        for a, b in zip(got[d][3:], (p, rr, f)):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, rel=1e-12)


def test_rouge_identical_and_clipping(spark):
    from mapbox_filter_spark.operators.text import rouge_n

    rows = [(1, "a b c d", "a b c d"),          # perfect -> 1.0
            (2, "a a a a", "a a"),              # clipping: 1 match
            (3, "", "a b c")]                   # empty candidate
    df = spark.createDataFrame(rows, "doc_id long, cand string, "
                                     "ref string")
    got = {r["doc_id"]: r for r in rouge_n(df, 2).collect()}
    assert got[1]["f1"] == pytest.approx(1.0)
    assert (got[2]["n_match"], got[2]["n_cand"], got[2]["n_ref"]) \
        == (1, 3, 1)
    assert got[3]["precision"] is None and got[3]["n_ref"] == 2


# ---- conformal_interval ----

def _brute_conformal(rows, salt="conformal", an=1, ad=10):
    import hashlib
    from collections import defaultdict

    def u60(v):
        s = f"{salt}\x1f{v}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    groups = defaultdict(lambda: ([], []))
    for g, i, y in rows:
        (groups[g][0] if u60(i) < (1 << 60) // 2
         else groups[g][1]).append((i, y))
    out = {}
    for g, (cal, test) in groups.items():
        if not cal:
            continue
        ys = sorted((y, i) for i, y in cal)
        nc = len(cal)
        yhat = ys[(nc + 1) // 2 - 1][0]
        res = sorted((abs(y - yhat), i) for i, y in cal)
        k = ((ad - an) * (nc + 1) + ad - 1) // ad
        qhat = res[k - 1][0] if k <= nc else None
        nt = len(test)
        cov = None
        if nt > 0 and qhat is not None:
            cov = sum(1 for _, y in test
                      if abs(y - yhat) <= qhat) / nt
        out[g] = (nc, nt, yhat, qhat, cov)
    return out


def test_conformal_differential(spark):
    from mapbox_filter_spark.operators.ml import conformal_interval

    rng = random.Random(12)
    rows = [(g, g * 10000 + i, rng.randrange(-200, 200) + 50 * g)
            for g in range(3) for i in range(150)]
    rows += [(9, 90001, 5), (9, 90002, 7)]     # tiny group: k overflow
    df = spark.createDataFrame(rows, "g long, id long, y long")
    got = {r["g"]: (r["n_cal"], r["n_test"], r["y_hat"], r["q_hat"],
                    r["coverage"])
           for r in conformal_interval(df, ["g"], id_col="id",
                                       val_col="y").collect()}
    want = _brute_conformal(rows)
    assert set(got) == set(want)
    for g in want:
        assert got[g][:4] == want[g][:4], g
        if want[g][4] is None:
            assert got[g][4] is None
        else:
            assert got[g][4] == pytest.approx(want[g][4], rel=1e-12)
    # marginal coverage near/above 1-alpha on the big groups
    for g in range(3):
        assert got[g][4] >= 0.8


# ---- stratified_ate ----

def _brute_sate(rows, k=5):
    from collections import defaultdict

    xs = sorted((x, 1) for _, _, _, x in rows)
    vals = sorted(x for _, _, _, x in rows)
    n = len(vals)
    rankmap = {}
    for i, v in enumerate(vals):
        if v not in rankmap:
            rankmap[v] = i + 1            # min-rank
    strata = defaultdict(lambda: [0, 0, 0, 0])
    for _, t, y, x in rows:
        s = (rankmap[x] - 1) * k // n + 1
        c = strata[s]
        if t == 1:
            c[0] += 1
            c[1] += y
        else:
            c[2] += 1
            c[3] += y
    used = {s: c for s, c in strata.items() if c[0] > 0 and c[2] > 0}
    n_used = sum(c[0] + c[2] for c in used.values())
    ate = 0.0
    for s in sorted(used):
        n1, s1, n0, s0 = used[s]
        ate += float(n1 + n0) / float(n_used) \
            * (float(s1) / float(n1) - float(s0) / float(n0))
    return (len(rows), n_used, len(used), len(rows) - n_used,
            ate if n_used else None)


def test_stratified_ate_recovers_effect(spark):
    from mapbox_filter_spark.operators.ml import stratified_ate

    rng = random.Random(20)
    rows = []
    for i in range(1500):
        x = rng.randrange(0, 100)
        # confounded: treatment more likely at high x; y rises with x
        t = 1 if rng.randrange(100) < 20 + x // 2 else 0
        y = 3 * x + (40 if t else 0) + rng.randrange(-10, 10)
        rows.append((0, t, y, x))
    df = spark.createDataFrame(rows, "g long, t int, y long, x long")
    r = stratified_ate(df, ["g"], treat_col="t", outcome_col="y",
                       conf_col="x").collect()[0]
    want = _brute_sate([tuple(x) for x in rows])
    assert (r["n"], r["n_used"], r["k_strata"], r["n_dropped"]) \
        == want[:4]
    assert r["ate"] == pytest.approx(want[4], rel=1e-12)
    # stratification strips the confounding the naive diff keeps
    n1 = sum(1 for _, t, _, _ in rows if t)
    naive = (sum(y for _, t, y, _ in rows if t) / n1
             - sum(y for _, t, y, _ in rows if not t)
             / (len(rows) - n1))
    assert abs(r["ate"] - 40) < 8 < abs(naive - 40)


# ---- ransac_line ----

def _brute_ransac(points, eps=100, n_cand=16, salt="ransac", gkey="0"):
    import hashlib

    pts = sorted((x, y, i) for i, x, y in points)
    n = len(pts)

    def draw(tag, c):
        s = f"{salt}|{tag}\x1f{gkey}\x1f{c}"
        u = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return u % n + 1

    best = None
    for c in range(n_cand):
        ra, rb = draw("a", c), draw("b", c)
        if ra == rb:
            continue
        x1, y1, _ = pts[ra - 1]
        x2, y2, _ = pts[rb - 1]
        if (x1, y1) == (x2, y2):
            continue
        dx, dy = x2 - x1, y2 - y1
        ni = sum(1 for x, y, _ in pts
                 if ((x - x1) * dy - (y - y1) * dx) ** 2
                 <= eps * eps * (dx * dx + dy * dy))
        cand = (-ni, c, n, x1, y1, x2, y2)
        if best is None or cand < best:
            best = cand
    if best is None:
        return None
    ni = -best[0]
    return (n, best[1], best[3], best[4], best[5], best[6], ni,
            ni / n)


def test_ransac_differential_and_robustness(spark):
    from mapbox_filter_spark.operators.cluster import ransac_line

    rng = random.Random(28)
    # 70% of points on y = 2x + 50 (±30), 30% gross outliers
    points = []
    for i in range(140):
        x = rng.randrange(0, 2000)
        points.append((i, x, 2 * x + 50 + rng.randrange(-30, 30)))
    for i in range(140, 200):
        points.append((i, rng.randrange(0, 2000),
                       rng.randrange(-5000, 5000)))
    rows = [(0, i, x, y) for i, x, y in points]
    df = spark.createDataFrame(rows, "g long, id long, x long, y long")
    r = ransac_line(df, ["g"]).collect()[0]
    want = _brute_ransac(points)
    got = (r["n"], r["cand"], r["x1"], r["y1"], r["x2"], r["y2"],
           r["n_inliers"], r["inlier_frac"])
    assert got[:7] == want[:7]
    assert got[7] == pytest.approx(want[7], rel=1e-12)
    # the winning line must be near the planted slope, immune to the
    # 30% outlier mass
    slope = (r["y2"] - r["y1"]) / (r["x2"] - r["x1"])
    assert abs(slope - 2.0) < 0.2
    assert r["inlier_frac"] > 0.5


def test_ransac_degenerate_group_vanishes(spark):
    from mapbox_filter_spark.operators.cluster import ransac_line

    df = spark.createDataFrame([(0, 1, 5, 5), (0, 2, 5, 5)],
                               "g long, id long, x long, y long")
    assert ransac_line(df, ["g"]).collect() == []


# ---- holt_forecast ----

def _brute_holt(xs, al=0.25, be=0.125, horizon=3):
    if len(xs) < 2:
        return None
    l, b = float(xs[0]), float(xs[1]) - float(xs[0])
    for x in xs[1:]:
        prior = l + b
        nl = prior + al * (float(x) - prior)
        nb = b + be * (nl - l - b)
        l, b = nl, nb
    return {h: (len(xs), l, b, l + float(h) * b)
            for h in range(1, horizon + 1)}


def test_holt_differential(spark):
    from mapbox_filter_spark.operators.temporal import holt_forecast

    rng = random.Random(33)
    xs = [100 + 5 * t + rng.randrange(-8, 8) for t in range(80)]
    rows = [(1, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["h"]: (r["n"], r["level"], r["trend"], r["forecast"])
           for r in holt_forecast(df, ["k"], order_cols=("t",),
                                  value_col="x").collect()}
    want = _brute_holt(xs)
    assert set(got) == set(want)
    for h in want:
        assert got[h][0] == want[h][0]
        for a, b in zip(got[h][1:], want[h][1:]):
            assert a == pytest.approx(b, rel=1e-12)
    # trend must track the planted slope, forecasts extend it
    assert got[1][2] == pytest.approx(5.0, abs=1.5)
    assert got[3][3] > got[1][3]


def test_holt_guards(spark):
    from mapbox_filter_spark.operators.temporal import holt_forecast

    df = spark.createDataFrame([(1, 0, 5)], "k long, t long, x long")
    assert holt_forecast(df, ["k"], order_cols=("t",),
                         value_col="x").collect() == []
    with pytest.raises(ValueError, match="dyadic"):
        holt_forecast(df, ["k"], order_cols=("t",), value_col="x",
                      alpha_num=1, alpha_den=3)


# ---- ucb_replay ----

def _brute_ucb(stream, k=3):
    import math

    t = 0
    n = [0] * k
    s = [0] * k
    for a, r in stream:
        unplayed = next((i for i in range(k) if n[i] == 0), None)
        if unplayed is not None:
            p = unplayed
        else:
            best, bi = 0, s[0] / n[0] + math.sqrt(
                2.0 * math.log(float(t)) / n[0])
            for i in range(1, k):
                ia = s[i] / n[i] + math.sqrt(
                    2.0 * math.log(float(t)) / n[i])
                if ia > bi:
                    best, bi = i, ia
            p = best
        if p == a:
            t += 1
            n[a] += 1
            s[a] += r
    rs = sum(s)
    return (len(stream), t, rs, rs / t if t else None, tuple(n))


def test_ucb_replay_differential(spark):
    from mapbox_filter_spark.operators.analytics import ucb_replay

    rng = random.Random(41)
    rates = [0.2, 0.45, 0.7]
    stream = [(a, 1 if rng.random() < rates[a] else 0)
              for a in (rng.randrange(3) for _ in range(3000))]
    rows = [(0, i, a, r) for i, (a, r) in enumerate(stream)]
    df = spark.createDataFrame(rows, "g long, i long, a int, r int")
    r = ucb_replay(df, ["g"], order_cols=("i",), arm_col="a",
                   reward_col="r").collect()[0]
    n_ev, nm, rs, ctr, pulls = _brute_ucb(stream)
    assert (r["n_events"], r["n_matched"], r["reward_sum"]) \
        == (n_ev, nm, rs)
    assert r["ctr"] == pytest.approx(ctr, rel=1e-12)
    assert (r["pulls_0"], r["pulls_1"], r["pulls_2"]) == pulls
    # the replayed policy must concentrate on the best arm and beat
    # the logging policy's uniform CTR
    assert r["pulls_2"] > r["pulls_0"] and r["pulls_2"] > r["pulls_1"]
    logged_ctr = sum(x for _, x in stream) / len(stream)
    assert r["ctr"] > logged_ctr + 0.1


def test_ucb_replay_guards(spark):
    from mapbox_filter_spark.operators.analytics import ucb_replay

    df = spark.createDataFrame([(0, 1, 7, 1)],
                               "g long, i long, a int, r int")
    with pytest.raises(Exception, match="arm outside"):
        ucb_replay(df, ["g"], order_cols=("i",), arm_col="a",
                   reward_col="r").collect()


# ---- weighted_scheduling ----

def _brute_wis(intervals):
    ivs = sorted((e, s, w) for s, e, w in intervals)
    n = len(ivs)
    dp = [0] * (n + 1)
    for i in range(1, n + 1):
        e, s, w = ivs[i - 1]
        p = sum(1 for j in range(i - 1) if ivs[j][0] <= s)
        dp[i] = max(dp[i - 1], w + dp[p])
    return dp[n]


def test_wis_differential(spark):
    from mapbox_filter_spark.operators.temporal import \
        weighted_scheduling

    rng = random.Random(36)
    rows = []
    groups = {}
    for gk in range(4):
        ivs = []
        for _ in range(rng.randrange(1, 40)):
            s = rng.randrange(0, 500)
            ivs.append((s, s + rng.randrange(1, 80),
                        rng.randrange(1, 50)))
        groups[gk] = ivs
        rows += [(gk, s, e, w) for s, e, w in ivs]
    df = spark.createDataFrame(rows, "g long, s long, e long, w long")
    got = {r["g"]: (r["n"], r["best_weight"])
           for r in weighted_scheduling(
               df, ["g"], start_col="s", end_col="e",
               weight_col="w").collect()}
    for gk, ivs in groups.items():
        assert got[gk] == (len(ivs), _brute_wis(ivs)), gk


def test_wis_beats_greedy_count(spark):
    from mapbox_filter_spark.operators.temporal import \
        weighted_scheduling

    # two light compatible intervals vs one heavy overlapping both:
    # count-greedy picks 2 (weight 2), the DP picks the heavy 100
    rows = [(0, 0, 10, 1), (0, 10, 20, 1), (0, 5, 15, 100)]
    df = spark.createDataFrame(rows, "g long, s long, e long, w long")
    r = weighted_scheduling(df, ["g"], start_col="s", end_col="e",
                            weight_col="w").collect()[0]
    assert r["best_weight"] == 100

    # touching endpoints are compatible
    rows = [(0, 0, 10, 5), (0, 10, 20, 7)]
    df = spark.createDataFrame(rows, "g long, s long, e long, w long")
    r = weighted_scheduling(df, ["g"], start_col="s", end_col="e",
                            weight_col="w").collect()[0]
    assert r["best_weight"] == 12


# ---- jenks_breaks ----

def _brute_jenks(xs, k=4):
    xs = sorted(xs)
    n = len(xs)
    P = [0] * (n + 1)
    Q = [0] * (n + 1)
    for i, x in enumerate(xs, 1):
        P[i] = P[i - 1] + x
        Q[i] = Q[i - 1] + x * x

    def ssd(j, i):
        m = i - j
        s = P[i] - P[j]
        q = Q[i] - Q[j]
        return float(m * q - s * s) / float(m)

    prev = [(ssd(0, i), 0) for i in range(1, n + 1)]
    layers = [prev]
    for c in range(2, k + 1):
        cur = []
        for i in range(c, n + 1):
            best = (layers[-1][(c - 1) - (c - 1)][0]
                    + ssd(c - 1, i), c - 1)
            for j in range(c, i):
                cc = layers[-1][j - (c - 1)][0] + ssd(j, i)
                if cc < best[0] or (cc == best[0] and j < best[1]):
                    best = (cc, j)
            cur.append(best)
        layers.append(cur)
    cost, j = layers[-1][n - k]
    brks = []
    jcur = j
    for c in range(k - 1, 0, -1):
        brks.append(xs[jcur - 1])
        if c > 1:
            jcur = layers[c - 1][jcur - c][1]
    return cost, tuple(reversed(brks)), xs[0], xs[-1]


def test_jenks_differential(spark):
    from mapbox_filter_spark.operators.ml import jenks_breaks

    rng = random.Random(51)
    # three planted clusters + stragglers
    xs = ([rng.randrange(0, 40) for _ in range(30)]
          + [rng.randrange(480, 540) for _ in range(25)]
          + [rng.randrange(900, 1000) for _ in range(20)]
          + [250, 700])
    df = spark.createDataFrame([(0, x) for x in xs], "g long, x long")
    r = jenks_breaks(df, ["g"], "x", k=4).collect()[0]
    cost, brks, lo, hi = _brute_jenks(xs, 4)
    assert r["total_cost"] == pytest.approx(cost, rel=1e-12)
    assert (r["break_1"], r["break_2"], r["break_3"]) == brks
    assert (r["x_min"], r["x_max"]) == (lo, hi)
    # breaks are CLASS MAXIMA: ordered, interior, and the planted
    # cluster gaps carry no break STRADDLING a cluster (optimum may
    # give stragglers their own class — that's correct behavior)
    assert (r["x_min"] <= r["break_1"] <= r["break_2"]
            <= r["break_3"] < r["x_max"])


def test_jenks_small_and_guard(spark):
    from mapbox_filter_spark.operators.ml import jenks_breaks

    # n == k: every class a singleton, zero cost
    df = spark.createDataFrame([(0, x) for x in (5, 10, 20, 40)],
                               "g long, x long")
    r = jenks_breaks(df, ["g"], "x", k=4).collect()[0]
    assert r["total_cost"] == 0.0
    assert (r["break_1"], r["break_2"], r["break_3"]) == (5, 10, 20)

    # n < k drops
    df = spark.createDataFrame([(0, 1), (0, 2)], "g long, x long")
    assert jenks_breaks(df, ["g"], "x", k=4).collect() == []


# ---- concentration_profile ----

def _brute_conc(counts):
    import math

    cs = sorted(counts.values(), reverse=True)
    n = len(cs)
    C = sum(cs)
    hhi = sum(v * v for v in cs) / (C * C)
    cr4 = sum(cs[:4]) / C
    top = cs[0] / C
    lnsum = 0.0
    for c, f in sorted((c, f) for f, c in counts.items()):
        lnsum += math.log(float(c))
    atk = 1.0 - math.exp(lnsum / n) / (C / n)
    return n, C, hhi, cr4, top, atk


def test_concentration_differential(spark):
    from mapbox_filter_spark.operators.analytics import \
        concentration_profile

    rng = random.Random(61)
    counts = {f: rng.randrange(1, 200) for f in range(30)}
    counts[99] = 2000                       # dominant firm
    rows = [(0, f) for f, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "g long, f long")
    r = concentration_profile(df, ["g"], "f").collect()[0]
    n, C, hhi, cr4, top, atk = _brute_conc(counts)
    assert (r["n_firms"], r["total"]) == (n, C)
    for a, b in ((r["hhi"], hhi), (r["cr4"], cr4),
                 (r["top_share"], top), (r["atkinson"], atk)):
        assert a == pytest.approx(b, rel=1e-12)
    assert r["top_share"] > 0.3 and r["atkinson"] > 0.2

    # perfectly equal market: HHI = 1/n, atkinson ~ 0
    rows = [(0, f) for f in range(10) for _ in range(7)]
    df = spark.createDataFrame(rows, "g long, f long")
    r = concentration_profile(df, ["g"], "f").collect()[0]
    assert r["hhi"] == pytest.approx(0.1)
    assert r["atkinson"] == pytest.approx(0.0, abs=1e-12)


# ---- mdlp_split ----

def _brute_mdlp(pairs):
    import math
    from collections import Counter

    n = len(pairs)
    n1 = sum(y for _, y in pairs)
    vals = Counter()
    ones = Counter()
    for x, y in pairs:
        vals[x] += 1
        ones[x] += y

    def ent(m, c1):
        if m == 0:
            return 0.0
        out = math.log(float(m))
        for c in (c1, m - c1):
            if c > 0:
                out -= c * math.log(float(c)) / m
        return out

    def kc(m, c1):
        return (1 if c1 > 0 else 0) + (1 if m - c1 > 0 else 0)

    hs = ent(n, n1)
    k = kc(n, n1)
    best = None
    xs = sorted(vals)
    nl = nl1 = 0
    ln2 = math.log(2.0)
    for v in xs[:-1]:
        nl += vals[v]
        nl1 += ones[v]
        nr, nr1 = n - nl, n1 - nl1
        h1, h2 = ent(nl, nl1), ent(nr, nr1)
        gain = hs - nl / n * h1 - nr / n * h2
        delta = (math.log(3.0 ** k - 2.0) / ln2
                 - (k * hs - kc(nl, nl1) * h1
                    - kc(nr, nr1) * h2) / ln2)
        thr = ((math.log(float(n - 1)) / ln2 + delta) / n) * ln2
        cand = (-gain, v, thr)
        if best is None or cand < best:
            best = cand
    if best is None:
        return (n, k, None, None, None, False)
    gain, v, thr = -best[0], best[1], best[2]
    return (n, k, v, gain, thr, gain > thr)


def test_mdlp_differential(spark):
    from mapbox_filter_spark.operators.ml import mdlp_split

    rng = random.Random(47)
    # separable: y mostly 1 above 50
    pairs = [(x, 1 if (x > 50) ^ (rng.random() < 0.1) else 0)
             for x in (rng.randrange(0, 100) for _ in range(400))]
    df = spark.createDataFrame([(0, x, y) for x, y in pairs],
                               "g long, x long, y int")
    r = mdlp_split(df, ["g"], val_col="x", label_col="y").collect()[0]
    n, k, v, gain, thr, acc = _brute_mdlp(pairs)
    assert (r["n"], r["k_classes"], r["split_value"]) == (n, k, v)
    assert r["gain_nats"] == pytest.approx(gain, rel=1e-12)
    assert r["threshold_nats"] == pytest.approx(thr, rel=1e-12)
    assert r["accepted"] is True and 40 <= v <= 60

    # pure noise must be REJECTED by the MDL bar
    pairs = [(x, rng.randrange(2))
             for x in (rng.randrange(0, 100) for _ in range(400))]
    df = spark.createDataFrame([(0, x, y) for x, y in pairs],
                               "g long, x long, y int")
    r = mdlp_split(df, ["g"], val_col="x", label_col="y").collect()[0]
    assert r["accepted"] is False
    assert r["gain_nats"] == pytest.approx(_brute_mdlp(pairs)[3],
                                           rel=1e-10)


def test_mdlp_degenerate(spark):
    from mapbox_filter_spark.operators.ml import mdlp_split

    # single distinct value: no candidates
    df = spark.createDataFrame([(0, 5, 1)] * 4, "g long, x long, y int")
    r = mdlp_split(df, ["g"], val_col="x", label_col="y").collect()[0]
    assert r["split_value"] is None and r["accepted"] is False
    assert r["k_classes"] == 1


# ---- spiegelhalter_z ----

def test_spiegelhalter_differential(spark):
    import math

    from mapbox_filter_spark.operators.stats import spiegelhalter_z

    rng = random.Random(73)
    rows = []
    # group 0: perfectly calibrated; group 1: overconfident (true rate
    # squeezed toward 0.5)
    for gk, squeeze in ((0, 1.0), (1, 0.4)):
        for i in range(3000):
            m = rng.randrange(1, 1000)
            true_p = 0.5 + (m / 1000 - 0.5) * squeeze
            yv = 1 if rng.random() < true_p else 0
            rows.append((gk, m, yv))
    df = spark.createDataFrame(rows, "g long, m long, y int")
    got = {r["g"]: (r["n"], r["z_num"], r["z_den"], r["z"])
           for r in spiegelhalter_z(
               df, ["g"], p_millis_col="m",
               label_col="y").collect()}
    for gk in (0, 1):
        zn = sum((1000 * yv - m) * (1000 - 2 * m)
                 for gg, m, yv in rows if gg == gk)
        zd = sum((1000 - 2 * m) ** 2 * m * (1000 - m)
                 for gg, m, yv in rows if gg == gk)
        assert got[gk][:3] == (3000, zn, zd)
        assert got[gk][3] == pytest.approx(zn / math.sqrt(zd),
                                           rel=1e-12)
    assert abs(got[0][3]) < 3.0       # calibrated within noise
    assert abs(got[1][3]) > 5.0       # overconfidence detected

    df = spark.createDataFrame([(0, 1000, 1)], "g long, m long, y int")
    with pytest.raises(Exception, match="outside"):
        spiegelhalter_z(df, ["g"], p_millis_col="m",
                        label_col="y").collect()


# ---- holt_winters ----

def _brute_hw(xs, m=7, al=0.25, be=0.125, ga=0.25, horizon=7):
    if len(xs) < 2 * m:
        return None
    xs = [float(x) for x in xs]
    l = sum(xs[:m]) / float(m)
    b = (sum(xs[m:2 * m]) / float(m) - l) / float(m)
    s = [xs[j] - l for j in range(m)]
    t = m
    for x in xs[m:]:
        sidx = t % m
        l_old, s_old = l, s[sidx]
        l = al * (x - s_old) + (1.0 - al) * (l_old + b)
        b = be * (l - l_old) + (1.0 - be) * b
        s[sidx] = ga * (x - l) + (1.0 - ga) * s_old
        t += 1
    n = len(xs)
    return {h: (l, b, s[(n + h - 1) % m],
                l + float(h) * b + s[(n + h - 1) % m])
            for h in range(1, horizon + 1)}


def test_hw_differential(spark):
    from mapbox_filter_spark.operators.temporal import holt_winters

    rng = random.Random(64)
    season = [0, 40, 80, 20, -30, -60, -50]
    xs = [1000 + 3 * t + season[t % 7] + rng.randrange(-10, 10)
          for t in range(70)]
    rows = [(1, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["h"]: (r["level"], r["trend"], r["seasonal"],
                    r["forecast"])
           for r in holt_winters(df, ["k"], order_cols=("t",),
                                 value_col="x").collect()}
    want = _brute_hw(xs)
    assert set(got) == set(want)
    for h in want:
        for a, b in zip(got[h], want[h]):
            assert a == pytest.approx(b, rel=1e-12), h
    # the fitted seasonal pattern must track the planted one: peak
    # day and trough day agree
    fc = {h: got[h][3] for h in got}
    peak = max(fc, key=fc.get)
    trough = min(fc, key=fc.get)
    n = len(xs)
    assert season[(n + peak - 1) % 7] == max(season)
    assert season[(n + trough - 1) % 7] == min(season)


def test_hw_short_series_drop(spark):
    from mapbox_filter_spark.operators.temporal import holt_winters

    rows = [(1, t, t) for t in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    assert holt_winters(df, ["k"], order_cols=("t",),
                        value_col="x").collect() == []


# ---- t_closeness_audit ----

def _brute_tclose(points, k, precision):
    kan = _brute_kanon([(i, g) for i, g, _ in points], k, precision)
    N = len(points)
    cats = sorted({s for _, _, s in points})
    K = len(cats)
    from collections import Counter

    gl = Counter(s for _, _, s in points)
    cells = {}
    for i, g, s in points:
        p, cell, _ = kan[i]
        cells.setdefault((p, cell), []).append(s)
    out = {}
    for key, ss in cells.items():
        n = len(ss)
        cc = Counter(ss)
        sg = mg = 0
        cum_c = cum_g = 0
        for c in cats:
            cum_c += cc.get(c, 0)
            cum_g += gl[c]
            gap = abs(cum_c * N - cum_g * n)
            sg += gap
            mg = max(mg, gap)
        out[key] = (n, sg / (n * N * max(K - 1, 1)),
                    mg / (n * N))
    return out


def test_tcloseness_differential(spark):
    from mapbox_filter_spark.operators.privacy import t_closeness_audit

    rng = random.Random(83)
    # cell "aaaa": sensitive skewed to category 0; others mixed
    points = []
    for i in range(40):
        points.append((i, "aaaa", 0 if rng.random() < 0.9 else 1))
    for i in range(40, 120):
        points.append((i, rng.choice(["bbbb", "cccc"]),
                       rng.randrange(3)))
    # two isolated points -> fully suppressed NULL cell; its category
    # counts must survive the null-safe completion join
    points.append((120, "zzzz", 0))
    points.append((121, "yyyy", 2))
    df = spark.createDataFrame(points, "id long, gh string, s long")
    got = {(r["prec"], r["cell"]): (r["n"], r["t_w1"],
                                    r["worst_cat_gap"])
           for r in t_closeness_audit(df, 5, 4).collect()}
    want = _brute_tclose(points, 5, 4)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert got[key][1] == pytest.approx(want[key][1], rel=1e-12)
        assert got[key][2] == pytest.approx(want[key][2], rel=1e-12)
    # the deliberately skewed cell is the farthest from the corpus
    skew = got[(4, "aaaa")][1]
    assert skew == max(v[1] for v in got.values())
