"""Unit differentials for the session-5 operator block: convex hull
(chain vs brute), Theil-Sen (hand case + guard), HITS (invariants +
python replay), heading octants (hand case), region dissolve (hand
case), HLL (register math vs python replay)."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.hull import (convex_hull_cells,
                                          hull_boundary_points)


def brute_boundary(pts):
    """Supporting-line characterization — the oracle's O(n³) rule."""
    pts = sorted(set(pts))
    if len(pts) <= 1:
        return pts
    out = []
    for p in pts:
        ok = False
        for q in pts:
            if q == p:
                continue
            if all((q[0] - p[0]) * (r[1] - p[1])
                   - (q[1] - p[1]) * (r[0] - p[0]) >= 0 for r in pts):
                ok = True
                break
        if ok:
            out.append(p)
    return out


def test_hull_chain_matches_brute_random():
    rng = random.Random(42)
    for trial in range(200):
        n = rng.randint(1, 24)
        span = rng.choice([3, 5, 50])
        pts = [(rng.randint(0, span), rng.randint(0, span))
               for _ in range(n)]
        chain = hull_boundary_points([p[0] for p in pts],
                                     [p[1] for p in pts])
        assert chain == brute_boundary(pts), (trial, pts)


def test_hull_collinear_and_degenerate():
    # all collinear: every distinct point is boundary
    assert hull_boundary_points([0, 1, 2, 3], [0, 1, 2, 3]) == \
        [(0, 0), (1, 1), (2, 2), (3, 3)]
    # duplicates collapse
    assert hull_boundary_points([5, 5, 5], [7, 7, 7]) == [(5, 7)]
    # square + center: center excluded, edge midpoint kept
    pts = [(0, 0), (2, 0), (0, 2), (2, 2), (1, 1), (1, 0)]
    assert (1, 1) not in hull_boundary_points(
        [p[0] for p in pts], [p[1] for p in pts])
    assert (1, 0) in hull_boundary_points(
        [p[0] for p in pts], [p[1] for p in pts])


def test_convex_hull_cells_operator(spark):
    rows = [Row(x=x, y=y) for x in range(0, 30, 3)
            for y in range(0, 30, 3)]
    out = convex_hull_cells(spark.createDataFrame(rows), 100).collect()
    got = sorted((r.x, r.y) for r in out)
    assert got == brute_boundary([(r.x, r.y) for r in rows])


def test_theil_sen_hand_case(spark):
    from mapbox_filter_spark.operators.rankstats import theil_sen

    # y = 2x except one gross outlier; slopes median must be 2
    rows = [Row(g="a", x=x, y=2 * x) for x in range(6)]
    rows[5] = Row(g="a", x=5, y=100)
    df = spark.createDataFrame(rows)
    r = theil_sen(df, ["g"], "x", "y").collect()[0]
    assert r.n_pts == 6 and r.n_pairs == 15
    assert r.slope == 2.0 and r.med_dy / r.med_dx == 2.0


def test_theil_sen_group_cap(spark):
    from mapbox_filter_spark.operators.rankstats import (
        _THEILSEN_MAX_GROUP_ROWS, theil_sen)

    n = _THEILSEN_MAX_GROUP_ROWS + 1
    df = spark.range(n).select(F.lit("g").alias("g"),
                               F.col("id").alias("x"),
                               F.col("id").alias("y"))
    with pytest.raises(Exception, match="pair-join bound"):
        theil_sen(df, ["g"], "x", "y").collect()


def _hits_python(nodes, edges, iters, scale):
    hub = {u: scale // len(nodes) for u in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {u: 0 for u in nodes}
        for s, d in edges:
            raw_a[d] += hub[s]
        t = sum(raw_a.values())
        auth = {u: (scale * raw_a[u]) // t for u in nodes}
        raw_h = {u: 0 for u in nodes}
        for s, d in edges:
            raw_h[s] += auth[d]
        t = sum(raw_h.values())
        hub = {u: (scale * raw_h[u]) // t for u in nodes}
    return hub, auth


def test_hits_exact_replay(spark):
    from mapbox_filter_spark.operators.graph import hits_exact

    rng = random.Random(7)
    nodes = list(range(12))
    edges = sorted({(rng.randrange(12), rng.randrange(12))
                    for _ in range(30)})
    edges = [(s, d) for s, d in edges if s != d]
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r.node: (r.hub, r.auth)
           for r in hits_exact(ndf, edf, iters=3).collect()}
    hub, auth = _hits_python(nodes, edges, 3, 10**9)
    assert got == {n: (hub[n], auth[n]) for n in nodes}


def test_heading_octants_hand(spark):
    from mapbox_filter_spark.operators.trajectory import heading_octants

    # one walker: E, NE, N, zero, SW-ish steps with |dx|>|dy| => W
    pts = [(0, 0), (5, 0), (8, 3), (8, 9), (8, 9), (1, 7)]
    rows = [Row(user_id=1, ts=i, event_id=i, x=x, y=y)
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows)
    got = {r.octant: (r.n_steps, r.sum_l1)
           for r in heading_octants(df, order_cols=("ts",)).collect()}
    assert got == {0: (1, 5), 1: (1, 6), 2: (1, 6), -1: (1, 0),
                   4: (1, 9)}


def test_region_dissolve_hand(spark):
    from mapbox_filter_spark.operators.cluster import region_dissolve

    # two hot blobs: cells (0,0)+(1,1) diagonal-adjacent; (5,5) isolated
    def cell_pts(cx, cy, k):
        return [Row(x=cx * 10 + i % 3, y=cy * 10 + i // 3)
                for i in range(k)]

    rows = (cell_pts(0, 0, 4) + cell_pts(1, 1, 5) + cell_pts(5, 5, 3)
            + cell_pts(3, 0, 1))  # cold cell
    df = spark.createDataFrame(rows)
    out = {r.region: (r.n_cells, r.n_pts)
           for r in region_dissolve(df, 10, 3, pack=100).collect()}
    assert out == {0: (2, 9), 505: (1, 3)}


def test_hll_registers_replay(spark):
    import hashlib

    from mapbox_filter_spark.operators.sketch import (hll_estimate,
                                                      hll_registers)

    rows = [Row(g="a", k=str(i)) for i in range(300)]
    df = spark.createDataFrame(rows)
    regs = {(r.bucket): r.reg
            for r in hll_registers(df, ["g"], ["k"], b=6,
                                   salt="t").collect()}

    py = {}
    for i in range(300):
        h = int(hashlib.md5(f"t\x1f{i}".encode()).hexdigest()[:15], 16)
        b, w = h % 64, h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        py[b] = max(py.get(b, 0), rho)
    assert regs == py

    est = hll_estimate(
        hll_registers(df, ["g"], ["k"], b=6, salt="t"), ["g"],
        b=6).collect()[0]
    s = sum(1 << (55 - r) for r in py.values()) \
        + (64 - len(py)) * (1 << 55)
    assert est.s_scaled == s and est.v_zero == 64 - len(py)
    # estimate within HLL's expected error of the true 300
    assert abs(est.est_hll - 300) < 300 * 0.35


def test_g2_collocations_replay(spark):
    import math

    from mapbox_filter_spark.operators.cooccur import g2_collocations

    docs = [Row(doc_id=1, text="a b a b c"), Row(doc_id=2, text="a b x")]
    out = {(r.w_a, r.w_b): r
           for r in g2_collocations(spark.createDataFrame(docs),
                                    "doc_id", "text").collect()}
    # bigrams: (a,b)x3 (b,a) (b,c) (b,x) => N=6
    bi = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("b", "x"): 1}
    n = 6
    ra = {"a": 3, "b": 3}
    cb = {"b": 3, "a": 1, "c": 1, "x": 1}
    for (wa, wb), k11 in bi.items():
        r = out[(wa, wb)]
        na, nb = ra[wa], cb[wb]
        assert (r.n_ab, r.n_a, r.n_b, r.n_total) == (k11, na, nb, n)
        k12, k21 = na - k11, nb - k11
        k22 = n - na - nb + k11
        exp = 0.0
        for k, row, col in ((k11, na, nb), (k12, na, n - nb),
                            (k21, n - na, nb), (k22, n - na, n - nb)):
            if k > 0:
                exp += k * math.log(k * n / (row * col))
        assert abs(r.g2 - 2.0 * exp) < 1e-9


def test_ppr_seeds_replay(spark):
    from mapbox_filter_spark.operators.graph import pagerank_exact

    nodes = list(range(8))
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4)]
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    seeds = spark.createDataFrame([Row(node=0)])
    scale = 10**12
    got = {r.node: r.pr
           for r in pagerank_exact(ndf, edf, iters=3, scale=scale,
                                   seeds=seeds).collect()}

    deg = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {u: (scale if u == 0 else 0) for u in nodes}
    for _ in range(3):
        inc = {u: 0 for u in nodes}
        for s, d in edges:
            inc[d] += pr[s] // deg[s]
        pr = {u: ((scale * 15) // 100 if u == 0 else 0)
              + (85 * inc[u]) // 100 for u in nodes}
    assert got == pr


def test_span_runs_hand(spark):
    from mapbox_filter_spark.operators.media import span_runs

    spans = [{"kind": k, "text": None, "media_ref": None, "offset": i}
             for i, k in enumerate(["text", "text", "media", "text"])]
    df = spark.createDataFrame(
        [Row(doc_id=1, spans=spans), Row(doc_id=2, spans=spans[:2])])
    got = {(r.kind, r.run_len): (r.n_runs, r.n_docs)
           for r in span_runs(df).collect()}
    assert got == {("text", 2): (2, 2), ("media", 1): (1, 1),
                   ("text", 1): (1, 1)}


def test_kwic_hand(spark):
    from mapbox_filter_spark.operators.text import kwic_contexts

    docs = [Row(text="the old bridge stands"),
            Row(text="bridge over water"),
            Row(text="under the bridge")]
    got = {(r.l2, r.l1, r.r1, r.r2): r.n
           for r in kwic_contexts(spark.createDataFrame(docs),
                                  "text", "bridge").collect()}
    assert got == {("the", "old", "stands", "$"): 1,
                   ("^", "^", "over", "water"): 1,
                   ("under", "the", "$", "$"): 1}


def test_bitmap_distinct_exact(spark):
    from mapbox_filter_spark.operators.sketch import bitmap_distinct

    rows = [Row(g="a", k=v) for v in [0, 1, 63, 64, 64, 200, 0]] \
        + [Row(g="b", k=v) for v in [5, 5, 5]]
    df = spark.createDataFrame(rows)
    got = {r.g: (r.n_buckets, r.n_distinct, r.max_bucket_card)
           for r in bitmap_distinct(df, ["g"], "k").collect()}
    # 63-slot words: 0,1 -> bucket 0; 63,64 -> bucket 1; 200 -> bucket 3
    assert got == {"a": (3, 5, 2), "b": (1, 1, 1)}

    bad = spark.createDataFrame([Row(g="a", k=-1)])
    with pytest.raises(Exception, match="negative key"):
        bitmap_distinct(bad, ["g"], "k").collect()


def test_pareto_topk_hand(spark):
    from mapbox_filter_spark.operators.analytics import pareto_topk

    rows = ([Row(g="t", k=1)] * 5 + [Row(g="t", k=2)] * 3
            + [Row(g="t", k=3)] * 3 + [Row(g="t", k=4)] * 2
            + [Row(g="t", k=5)])
    out = {r.label: (r.n_keys, r.cnt, r.total, r.share)
           for r in pareto_topk(spark.createDataFrame(rows),
                                ["g"], "k", 2).collect()}
    # ties (2,3) broken by key asc: top2 = {1, 2}
    assert out == {"1": (1, 5, 14, 5 / 14), "2": (1, 3, 14, 3 / 14),
                   "(other)": (3, 6, 14, 6 / 14)}


def test_traj_edit_distance_hand(spark):
    from mapbox_filter_spark.operators.trajectory import traj_edit_distance

    # two walkers in block 0 (ids 0 and 100 with n_blocks=100):
    # 0 visits cells (0,0)->(1,0)->(1,1); 100 visits (0,0)->(1,1)
    def rows(uid, cells):
        return [Row(user_id=uid, ts=i, event_id=i,
                    x=cx * 8 + 1, y=cy * 8 + 1)
                for i, (cx, cy) in enumerate(cells)]

    df = spark.createDataFrame(
        rows(0, [(0, 0), (0, 0), (1, 0), (1, 1)])
        + rows(100, [(0, 0), (1, 1)]))
    out = traj_edit_distance(df, cell=8, max_moves=10,
                             n_blocks=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.len_u, r.len_v) == (0, 100, 3, 2)
    # signatures share prefix+suffix symbols; middle symbol deleted
    assert r.dist == 1


def test_hll_register_stream_matches_batch(spark, tmp_path):
    """Streamed MAX-merged HLL registers == batch registers EXACTLY
    (idempotent merge), and the estimates agree bit-for-bit."""
    from mapbox_filter_spark.operators.sketch import (hll_estimate,
                                                      hll_registers)
    from mapbox_filter_spark.streaming.incremental import (
        hll_register_stream, hll_store_read)

    df = spark.range(8000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.pmod(F.col("id") * 7919, F.lit(1300)).cast("string").alias("k"))
    src = str(tmp_path / "src")
    df.repartition(6).write.parquet(src)

    store = str(tmp_path / "store")
    q = hll_register_stream(
        spark, src, store, str(tmp_path / "ckpt"),
        schema=df.schema, group_cols=["g"], key_cols=["k"], b=6,
        salt="s", max_files=2)
    q.awaitTermination(120)

    got = {(r.g, r.bucket, r.reg)
           for r in hll_store_read(spark, store).collect()}
    want = {(r.g, r.bucket, r.reg)
            for r in hll_registers(df, ["g"], ["k"], b=6,
                                   salt="s").collect()}
    assert got == want
    est_s = {(r.g, r.s_scaled, r.est_hll)
             for r in hll_estimate(hll_store_read(spark, store), ["g"],
                                   b=6).collect()}
    est_b = {(r.g, r.s_scaled, r.est_hll)
             for r in hll_estimate(hll_registers(df, ["g"], ["k"], b=6,
                                                 salt="s"), ["g"],
                                   b=6).collect()}
    assert est_s == est_b


# --- review-pass regression tests ---


def test_hits_high_degree_no_spurious_overflow(spark):
    """r5 review: the old guard rejected outdeg >= 10 at scale 1e9;
    the true bound is scale² (degree-independent, distinct edges)."""
    from mapbox_filter_spark.operators.graph import hits_exact

    nodes = list(range(12))
    edges = [(0, d) for d in range(1, 12)]  # star, outdeg 11
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    out = hits_exact(ndf, edf, iters=2).collect()
    assert len(out) == 12
    hub, auth = _hits_python(nodes, edges, 2, 10**9)
    assert {r.node: (r.hub, r.auth) for r in out} == \
        {n: (hub[n], auth[n]) for n in nodes}
    with pytest.raises(ValueError, match="scale"):
        hits_exact(ndf, edf, iters=1, scale=4 * 10**9)


def test_hits_duplicate_edges_deduped(spark):
    from mapbox_filter_spark.operators.graph import hits_exact

    ndf = spark.createDataFrame([Row(node=n) for n in range(3)])
    e1 = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=0)])
    e2 = e1.unionAll(e1)  # duplicated edge list
    a = {(r.node, r.hub, r.auth) for r in hits_exact(ndf, e1).collect()}
    b = {(r.node, r.hub, r.auth) for r in hits_exact(ndf, e2).collect()}
    assert a == b


def test_ppr_duplicate_and_unknown_seeds(spark):
    """r5 review: |S| must count distinct MEMBER seeds only."""
    from mapbox_filter_spark.operators.graph import pagerank_exact

    nodes = list(range(8))
    edges = [(i, (i + 1) % 8) for i in range(8)]
    ndf = spark.createDataFrame([Row(node=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    clean = spark.createDataFrame([Row(node=0)])
    dirty = spark.createDataFrame(
        [Row(node=0), Row(node=0), Row(node=99)])  # dup + non-member
    a = {r.node: r.pr
         for r in pagerank_exact(ndf, edf, iters=2,
                                 seeds=clean).collect()}
    b = {r.node: r.pr
         for r in pagerank_exact(ndf, edf, iters=2,
                                 seeds=dirty).collect()}
    assert a == b
    only_unknown = spark.createDataFrame([Row(node=99)])
    with pytest.raises(ValueError, match="member"):
        pagerank_exact(ndf, edf, iters=1, seeds=only_unknown)


def test_pareto_label_collision_raises(spark):
    from mapbox_filter_spark.operators.analytics import pareto_topk

    df = spark.createDataFrame(
        [Row(g="t", k="(other)"), Row(g="t", k="x")])
    with pytest.raises(Exception, match="collides"):
        pareto_topk(df, ["g"], "k", 1).collect()


def test_g2_empty_corpus(spark):
    from mapbox_filter_spark.operators.cooccur import g2_collocations

    df = spark.createDataFrame([Row(doc_id=1, text="single"),
                                Row(doc_id=2, text="  ")])
    assert g2_collocations(df, "doc_id", "text").count() == 0


def test_theil_sen_noninteger_raises(spark):
    from mapbox_filter_spark.operators.rankstats import theil_sen

    df = spark.createDataFrame(
        [Row(g="a", x=1, y=0.5), Row(g="a", x=2, y=1.5)])
    with pytest.raises(Exception, match="non-integer"):
        theil_sen(df, ["g"], "x", "y").collect()


def test_hll_store_ignores_uncommitted_epochs(tmp_path):
    import os

    from mapbox_filter_spark.streaming.incremental import _hll_latest_epoch

    root = str(tmp_path / "store")
    for n, ok in [(1, True), (2, True), (3, False)]:
        d = os.path.join(root, f"epoch={n}")
        os.makedirs(d)
        if ok:
            open(os.path.join(d, "_SUCCESS"), "w").close()
    assert _hll_latest_epoch(root) == 2          # 3 is uncommitted
    assert _hll_latest_epoch(root, before=2) == 1
    assert _hll_latest_epoch(str(tmp_path / "nope")) is None


def test_adaptive_tile_split_invariants(spark):
    from mapbox_filter_spark.operators.quadtree import adaptive_tile_split

    # 500 points jammed into one spot + 50 scattered
    rows = [Row(lon=10.001 + (i % 7) * 1e-4, lat=45.001 + (i % 5) * 1e-4)
            for i in range(500)]
    rows += [Row(lon=-150.0 + i * 5.0, lat=-60.0 + i * 2.0)
             for i in range(50)]
    df = spark.createDataFrame(rows)
    leaves = adaptive_tile_split(df, 2, 6, 100).collect()
    total = sum(r.n for r in leaves)
    assert total == 550
    # below z_max every leaf respects the cap
    assert all(r.n <= 100 for r in leaves if r.z < 6)
    # the dense spot was driven to z_max
    assert any(r.z == 6 for r in leaves)
    # scattered points stayed shallow
    assert any(r.z == 2 for r in leaves)


def test_rect_overlap_join_brute(spark):
    from mapbox_filter_spark.geo.overlay import rect_overlap_join

    rng = random.Random(11)

    def mk(n, span, wmax):
        out = []
        for i in range(n):
            x0, y0 = rng.randint(0, span), rng.randint(0, span)
            out.append((i, x0, y0, x0 + rng.randint(0, wmax),
                        y0 + rng.randint(0, wmax)))
        return out

    A, B = mk(60, 300, 80), mk(40, 300, 80)
    a = spark.createDataFrame(A, "a_id long, x0 long, y0 long, "
                                 "x1 long, y1 long")
    b = spark.createDataFrame(B, "b_id long, x0 long, y0 long, "
                                 "x1 long, y1 long")
    got = {(r.a_id, r.b_id, r.ix0, r.iy0, r.ix1, r.iy1, r.inter_area)
           for r in rect_overlap_join(a, b, cell=64).collect()}
    want = set()
    for (i, ax0, ay0, ax1, ay1) in A:
        for (j, bx0, by0, bx1, by1) in B:
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                ix0, iy0 = max(ax0, bx0), max(ay0, by0)
                ix1, iy1 = min(ax1, bx1), min(ay1, by1)
                want.add((i, j, ix0, iy0, ix1, iy1,
                          (ix1 - ix0) * (iy1 - iy0)))
    assert got == want and want


def test_cdc_apply_hand(spark):
    from mapbox_filter_spark.operators.scd import cdc_apply

    base = spark.createDataFrame(
        [Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=30)])
    chg = spark.createDataFrame([
        Row(k=1, v=11, seq=5, op="U"),
        Row(k=1, v=12, seq=9, op="U"),   # last writer wins
        Row(k=2, v=0, seq=4, op="D"),    # delete
        Row(k=4, v=40, seq=7, op="I"),   # insert-only key
    ])
    out = {r.k: (r.v, r.last_seq, r.n_ops)
           for r in cdc_apply(base, chg, key="k",
                              val_cols=["v"]).collect()}
    assert out == {1: (12, 9, 2), 3: (30, -1, 0), 4: (40, 7, 1)}


def test_cdc_apply_guards(spark):
    from mapbox_filter_spark.operators.scd import cdc_apply

    base = spark.createDataFrame([Row(k=1, v=10)])
    dup = spark.createDataFrame(
        [Row(k=1, v=1, seq=5, op="U"), Row(k=1, v=2, seq=5, op="U")])
    with pytest.raises(Exception, match="duplicate seq"):
        cdc_apply(base, dup, key="k", val_cols=["v"]).collect()
    neg = spark.createDataFrame([Row(k=1, v=1, seq=-3, op="U")])
    with pytest.raises(Exception, match=">= 0"):
        cdc_apply(base, neg, key="k", val_cols=["v"]).collect()


def test_nearest_event_join_brute(spark):
    from mapbox_filter_spark.operators.temporal import nearest_event_join

    rng = random.Random(3)
    lrows, rrows = [], []
    for u in range(6):
        for t in rng.sample(range(1000), 15):
            lrows.append(Row(user_id=u, ts=t * 1000000))
        if u != 5:  # user 5 has no right rows -> NULLs
            for t in rng.sample(range(1000), 8):
                rrows.append(Row(user_id=u, ts=t * 1000000,
                                 val=float(t)))
    l = spark.createDataFrame(lrows).select(
        "user_id", F.timestamp_micros(F.col("ts")).alias("ts"))
    r = spark.createDataFrame(rrows).select(
        "user_id", F.timestamp_micros(F.col("ts")).alias("ts"), "val")
    got = {(x.user_id, x.ts_us): (x.near_val, x.near_ts_us, x.delta_us)
           for x in nearest_event_join(l, r, key=["user_id"],
                                       right_val="val").collect()}
    rs = {}
    for x in rrows:
        rs.setdefault(x.user_id, []).append((x.ts, x.val))
    want = {}
    for x in lrows:
        cands = rs.get(x.user_id)
        if not cands:
            want[(x.user_id, x.ts)] = (None, None, None)
            continue
        best = min(cands, key=lambda c: (abs(x.ts - c[0]), c[0]))
        want[(x.user_id, x.ts)] = (best[1], best[0], abs(x.ts - best[0]))
    assert got == want


def test_group_mode_hand_and_replay(spark):
    from mapbox_filter_spark.operators.stats import group_mode
    rows = [("a", 3), ("a", 3), ("a", 1), ("a", 1), ("a", 2),
            ("b", 9), ("b", None), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r["g"]: (r["mode_val"], r["mode_cnt"], r["n_distinct"])
           for r in group_mode(df, ["g"], "v").collect()}
    # tie 3 vs 1 (both x2) breaks to the SMALLEST value
    assert got["a"] == (1, 2, 3)
    assert got["b"] == (9, 1, 1)
    # all-NULL group vanishes (NULL is absence, not a value)
    assert "c" not in got

    # python replay differential on a random corpus
    import collections
    import random
    rng = random.Random(7)
    data = [(rng.choice("pqr"), rng.randint(0, 5)) for _ in range(400)]
    df2 = spark.createDataFrame(data, "g string, v int")
    got2 = {r["g"]: (r["mode_val"], r["mode_cnt"], r["n_distinct"])
            for r in group_mode(df2, ["g"], "v").collect()}
    per = collections.defaultdict(collections.Counter)
    for g, v in data:
        per[g][v] += 1
    for g, c in per.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got2[g] == (best[0], best[1], len(c))
