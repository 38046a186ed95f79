"""Session-13 operator units: tile_compact / tile_uncompact
(operators/quadtree.py) — minimal-covering normalization of ZXY tile
sets (the S2 CellUnion::Normalize / H3 compact analog) and its exact
inverse."""
import pytest

from mapbox_filter_spark.operators.quadtree import (tile_compact,
                                                    tile_uncompact)


def _tiles(spark, z, xys):
    return spark.createDataFrame([(z, x, y) for x, y in xys],
                                 "z int, x long, y long")


def test_compact_full_quad_collapses(spark):
    # the four z=2 children of (1, (0,1)) collapse to the parent;
    # the lone (3,3) survives at z=2
    xys = [(0, 2), (1, 2), (0, 3), (1, 3), (3, 3)]
    out = {(r.z, r.x, r.y)
           for r in tile_compact(_tiles(spark, 2, xys), 0).collect()}
    assert out == {(1, 0, 1), (2, 3, 3)}


def test_compact_recursive_to_root(spark):
    # ALL 16 z=2 tiles → the single z=0 root
    xys = [(x, y) for x in range(4) for y in range(4)]
    out = tile_compact(_tiles(spark, 2, xys), 0).collect()
    assert [(r.z, r.x, r.y) for r in out] == [(0, 0, 0)]


def test_compact_z_min_floor(spark):
    # z_min=2 forbids promotion past z=2: input returns unchanged
    xys = [(x, y) for x in range(4) for y in range(4)]
    out = {(r.z, r.x, r.y)
           for r in tile_compact(_tiles(spark, 2, xys), 2).collect()}
    assert out == {(2, x, y) for x, y in xys}


def test_compact_rejects_mixed_zoom(spark):
    df = spark.createDataFrame([(1, 0, 0), (2, 0, 0)],
                               "z int, x long, y long")
    with pytest.raises(ValueError) as exc:
        tile_compact(df, 0)
    assert "single-zoom" in str(exc.value)


def test_uncompact_roundtrip_identity(spark):
    # compact ∘ uncompact = identity on an L-shaped z=3 region
    xys = [(x, y) for x in range(8) for y in range(8)
           if x < 2 or y < 2]
    z3 = _tiles(spark, 3, xys)
    back = tile_uncompact(tile_compact(z3, 0), 3)
    assert ({(r.x, r.y) for r in back.collect()} == set(xys))


def test_uncompact_bounds_raise(spark):
    # z deeper than the target is an in-plan error, never silent
    df = _tiles(spark, 3, [(0, 0)])
    with pytest.raises(Exception) as exc:
        tile_uncompact(df, 2).collect()
    assert "tile_uncompact" in str(exc.value)


from mapbox_filter_spark.operators.spatialstats import contour_segments


def _grid(spark, cells):
    return spark.createDataFrame([(x, y, v) for x, y, v in cells],
                                 "gx long, gy long, v long")


def test_contour_single_inside_cell(spark):
    # one cell >= T at (0,0): its 4 corner-squares each get exactly
    # one inside corner (cases 1/2/4/8), forming a closed diamond of
    # 4 segments around the cell
    out = contour_segments(_grid(spark, [(0, 0, 10)]), 10).collect()
    segs = {(r.x0, r.y0, r.x1, r.y1) for r in out}
    assert len(out) == 4
    # diamond through the 4 edge midpoints around (0,0)
    assert segs == {(-1, 0, 0, -1),   # square (-1,-1): case 4 T-R
                    (0, -1, 1, 0),    # square (0,-1):  case 8 L-T
                    (-1, 0, 0, 1),    # square (-1,0):  case 2 B-R
                    (0, 1, 1, 0)}     # square (0,0):   case 1 L-B


def test_contour_case_index_and_missing_is_outside(spark):
    # square (0,0) with BL and TR inside and BR/TL missing -> saddle
    # case 5 -> the fixed disconnected pair {L-B, T-R}
    out = contour_segments(
        _grid(spark, [(0, 0, 99), (1, 1, 99)]), 50)
    rows = [r for r in out.collect() if (r.bx, r.by) == (0, 0)]
    assert {r.mcase for r in rows} == {5}
    assert {(r.x0, r.y0, r.x1, r.y1) for r in rows} == {
        (0, 1, 1, 0), (1, 2, 2, 1)}


def test_contour_full_square_emits_nothing(spark):
    # all four corners inside -> case 15 -> no segment for (0,0)
    cells = [(0, 0, 9), (1, 0, 9), (0, 1, 9), (1, 1, 9)]
    out = contour_segments(_grid(spark, cells), 5).collect()
    assert all((r.bx, r.by) != (0, 0) for r in out)


def test_contour_segments_form_closed_loops(spark):
    # a 2x2 inside blob: every midpoint vertex must have even degree
    # (isolines of a binary field close)
    cells = [(x, y, 7) for x in (0, 1) for y in (0, 1)]
    out = contour_segments(_grid(spark, cells), 7).collect()
    from collections import Counter
    deg = Counter()
    for r in out:
        deg[(r.x0, r.y0)] += 1
        deg[(r.x1, r.y1)] += 1
    assert deg and all(d % 2 == 0 for d in deg.values())


def test_contour_single_shuffle_plan(spark):
    out = contour_segments(_grid(spark, [(0, 0, 1)]), 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2      # partial+final agg only
    assert "Join" not in plan
    assert "EvalPython" not in plan


from mapbox_filter_spark.operators.media import span_schedule


def _docs(spark, spans_by_doc):
    rows = [(d, [{"start": s, "end": e} for s, e in sp])
            for d, sp in spans_by_doc.items()]
    return spark.createDataFrame(
        rows, "doc_id long, spans array<struct<start:int,end:int>>")


def test_span_schedule_basic_greedy(spark):
    out = span_schedule(_docs(spark, {
        1: [(1, 4), (3, 5), (4, 7), (6, 9)],
        2: [(0, 10), (1, 2), (2, 3)]}))
    got = {(r.doc_id, r.rank, r.start, r.end) for r in out.collect()}
    assert got == {(1, 1, 1, 4), (1, 2, 4, 7),
                   (2, 1, 1, 2), (2, 2, 2, 3)}


def test_span_schedule_matches_bruteforce_optimum(spark):
    # greedy earliest-end is optimal for max cardinality: check the
    # SIZE against exhaustive search on 40 deterministic random docs
    import itertools
    import random
    rng = random.Random(13)
    cases = {}
    for d in range(40):
        cases[d] = [(s, s + rng.randint(1, 6))
                    for s in (rng.randint(0, 20)
                              for _ in range(rng.randint(1, 7)))]

    def brute(iv):
        best = 0
        for r in range(len(iv), 0, -1):
            for sub in itertools.combinations(iv, r):
                ss = sorted(sub)
                if all(ss[k][1] <= ss[k + 1][0]
                       for k in range(len(ss) - 1)):
                    return r
        return best

    out = span_schedule(_docs(spark, cases))
    sizes = {r["doc_id"]: r["n"] for r in
             out.groupBy("doc_id").count()
             .withColumnRenamed("count", "n").collect()}
    for d, iv in cases.items():
        assert sizes.get(d, 0) == brute(iv), (d, iv)


def test_span_schedule_drops_degenerate_and_is_deterministic(spark):
    # zero/negative-length spans never selected; duplicate intervals
    # resolve by input index so output is stable
    out = span_schedule(_docs(spark, {
        5: [(3, 3), (4, 2), (1, 2), (1, 2)]})).collect()
    assert [(r.rank, r.start, r.end) for r in out] == [(1, 1, 2)]


def test_span_schedule_zero_shuffle_plan(spark):
    out = span_schedule(_docs(spark, {1: [(0, 1)]}))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


from mapbox_filter_spark.operators.ml import isotonic_fit


def test_isotonic_classic_pava_example(spark):
    rows = [("a", i, y) for i, y in enumerate([1, 0, 1, 1, 0, 0, 1, 1])]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    out = sorted((r.x, r.fit) for r in
                 isotonic_fit(df, "g", "x", "y").collect())
    assert [f for _, f in out] == [0.5] * 6 + [1.0] * 2


def test_isotonic_monotone_and_mean_preserving(spark):
    # deterministic pseudo-random labels over 3 groups x 20 bins
    rows = [(g, x, 1 if (g * 37 + x * x * 13) % 7 < 3 else 0)
            for g in range(3) for x in range(20) for _ in range(4)]
    df = spark.createDataFrame(rows, "g int, x int, y int")
    out = isotonic_fit(df, "g", "x", "y").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: r.x)
        fits = [r.fit for r in rs]
        assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:])), g
        # weighted mean preserved: sum(fit*n) == sum(y)
        assert abs(sum(r.fit * r.n for r in rs)
                   - sum(r.sum_y for r in rs)) < 1e-9


def test_isotonic_identity_when_already_monotone(spark):
    rows = []
    for x in range(5):
        rows += [("g", x, 1)] * x + [("g", x, 0)] * (5 - x)
    df = spark.createDataFrame(rows, "g string, x int, y int")
    out = sorted((r.x, r.fit) for r in
                 isotonic_fit(df, "g", "x", "y").collect())
    assert [f for _, f in out] == [x / 5 for x in range(5)]


def test_isotonic_max_bins_guard(spark):
    df = spark.createDataFrame([("g", x, 0) for x in range(9)],
                               "g string, x int, y int")
    with pytest.raises(Exception) as exc:
        isotonic_fit(df, "g", "x", "y", max_bins=8).collect()
    assert "max_bins" in str(exc.value)


def test_isotonic_two_exchange_plan(spark):
    df = spark.createDataFrame([("g", 0, 0)], "g string, x int, y int")
    out = isotonic_fit(df, "g", "x", "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Join" not in plan


from mapbox_filter_spark.operators.rankstats import bh_fdr


def _pvals(spark, vals, den=100):
    rows = [("g", i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, id int, p int")


def test_bh_fdr_textbook_example(spark):
    # p = .01 .02 .03 .04 .05 over m=5 at alpha=.05:
    # p_(k) <= .05k/5 = .01k holds for ALL k -> all rejected
    out = bh_fdr(_pvals(spark, [1, 2, 3, 4, 5]), ["g"], "id", "p",
                 100).collect()
    assert all(r.rejected == 1 for r in out)


def test_bh_fdr_step_up_rescues_interior(spark):
    # p/100 = .01 .04 .03 .50: sorted .01 .03 .04 .50, bounds
    # .0125 .025 .0375 .05 -> k=1 passes, k=2,3 fail, k=4 fails;
    # kstar=1 -> only the .01 test rejected
    out = {r.id: r.rejected for r in
           bh_fdr(_pvals(spark, [1, 4, 3, 50]), ["g"], "id", "p",
                  100, alpha_num=5, alpha_den=100).collect()}
    assert out == {0: 1, 1: 0, 2: 0, 3: 0}
    # step-up rejects k=1..3 when k=3 passes, even though k=2's own
    # bound also holds here: p .01 .02 .03 .50
    out2 = {r.id: r.rejected for r in
            bh_fdr(_pvals(spark, [1, 2, 3, 50]), ["g"], "id", "p",
                   100).collect()}
    assert out2 == {0: 1, 1: 1, 2: 1, 3: 0}
    # true step-up rescue: p .020 .021 .030, m=3, bounds .0167
    # .0333 .05 — k=1 FAILS its own bound (.020 > .0167) but k=3
    # passes, so kstar=3 rejects all three
    out3 = {r.id: r.rejected for r in
            bh_fdr(_pvals(spark, [20, 21, 30], den=1000), ["g"],
                   "id", "p", 1000).collect()}
    assert out3 == {0: 1, 1: 1, 2: 1}


def test_bh_fdr_no_rejections_and_group_isolation(spark):
    rows = [("a", 0, 90), ("a", 1, 95), ("b", 2, 1)]
    df = spark.createDataFrame(rows, "g string, id int, p int")
    out = {r.id: r.rejected for r in
           bh_fdr(df, ["g"], "id", "p", 100).collect()}
    assert out == {0: 0, 1: 0, 2: 1}


def test_bh_fdr_single_exchange_plan(spark):
    df = _pvals(spark, [1, 2])
    out = bh_fdr(df, ["g"], "id", "p", 100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "EvalPython" not in plan
