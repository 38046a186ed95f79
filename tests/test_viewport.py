"""Viewport bbox-query (operators/viewport.py), local Moran LISA
(operators/spatialstats.py), and Hausdorff trajectory pairs
(operators/trajectory.py): brute-force python replays + the
bucket-pruning plan assertion for the viewport probe."""

import random
import re
from collections import defaultdict


def test_bbox_query_pruned_and_exact(spark, tmp_path):
    """bbox_query must (a) equal the brute filter, and (b) BUCKET-PRUNE
    the probe scan (SelectedBucketsCount strictly below the bucket
    count)."""
    from mapbox_filter_spark.operators.viewport import (
        bbox_query, write_viewport_corpus)

    rng = random.Random(57)
    pts = [(i, rng.uniform(-170, 170), rng.uniform(-80, 80))
           for i in range(3000)]
    df = spark.createDataFrame(
        pts, "feature_id long, lon double, lat double")
    table = "viewport_corpus_t"
    try:
        write_viewport_corpus(df, table, str(tmp_path / "vp"), zoom=6,
                              n_buckets=64)
        # cover is at most 6x6 = 36 cells < 64 buckets: strict pruning
        # guaranteed by pigeonhole
        box = (0.0, 20.0, 0.0, 20.0)
        plans = []
        got = bbox_query(spark, table, *box, zoom=6, plan_log=plans)
        assert plans
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                      plans[0])
        assert m, "no bucket pruning in the probe scan"
        assert int(m.group(1)) < int(m.group(2)), "full corpus scan"
        exp = sorted((i, lo, la) for i, lo, la in pts
                     if box[0] <= lo <= box[1] and box[2] <= la <= box[3])
        assert sorted(map(tuple, got.collect())) == exp
        assert exp  # non-vacuous
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bbox_cell_cover_pad_and_clamp():
    from mapbox_filter_spark.operators.viewport import bbox_cell_cover

    # whole world clamps to the full grid
    assert len(bbox_cell_cover(-180, 180, -85, 85, 3)) == 64
    # a sub-cell box still yields at least the 3x3 padded neighborhood
    cells = bbox_cell_cover(1.0, 1.1, 1.0, 1.1, 6)
    assert len(cells) == 9
    assert len(set(cells)) == len(cells)


def test_local_moran_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import local_moran

    rng = random.Random(58)
    cells = {}
    for _ in range(120):
        cells[(rng.randrange(8), rng.randrange(8))] = rng.randrange(1, 40)
    cells[(20, 20)] = 5  # isolated cell: NULL lag/local/quad
    rows = [(x, y, v) for (x, y), v in cells.items()]
    df = spark.createDataFrame(rows, "cx long, cy long, v long")
    got = {(r.x, r.y): r for r in
           local_moran(df, "cx", "cy", "v").collect()}

    n, s1 = len(cells), sum(cells.values())
    z = {k: n * v - s1 for k, v in cells.items()}
    for (x, y), v in cells.items():
        nbrs = [z[(x + dx, y + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0) and (x + dx, y + dy) in z]
        g = got[(x, y)]
        assert g.z_s == z[(x, y)]
        assert g.n_nbrs == len(nbrs)
        if not nbrs:
            assert g.lag_s is None and g.local_num is None \
                and g.quad is None
        else:
            lag = sum(nbrs)
            assert g.lag_s == lag
            assert g.local_num == z[(x, y)] * lag
            zi = z[(x, y)]
            exp_quad = ("ZERO" if zi == 0 or lag == 0 else
                        "HH" if zi > 0 and lag > 0 else
                        "LL" if zi < 0 and lag < 0 else
                        "HL" if zi > 0 else "LH")
            assert g.quad == exp_quad
    assert {g.quad for g in got.values()} >= {"HH", "LL"}


def _py_hausdorff(pts):
    # pts: list of (blk, ent, idx, x, y)
    traj = defaultdict(list)
    blk_of = {}
    for b, e, i, x, y in pts:
        traj[e].append((x, y))
        blk_of[e] = b
    out = {}
    ents = sorted(traj)
    for i, u in enumerate(ents):
        for v in ents[i + 1:]:
            if blk_of[u] != blk_of[v]:
                continue
            d2 = lambda a, b: (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            h_ab = max(min(d2(a, b) for b in traj[v]) for a in traj[u])
            h_ba = max(min(d2(b, a) for a in traj[u]) for b in traj[v])
            out[(u, v)] = (h_ab, h_ba, max(h_ab, h_ba))
    return out


def test_hausdorff_pairs_replay(spark):
    from mapbox_filter_spark.operators.trajectory import hausdorff_pairs

    rng = random.Random(59)
    pts = []
    idx = 0
    for ent in range(12):
        for _ in range(rng.randrange(3, 9)):
            pts.append((ent % 3, ent, idx,
                        rng.randrange(1000), rng.randrange(1000)))
            idx += 1
    df = spark.createDataFrame(
        pts, "blk long, ent long, idx long, x long, y long")
    got = {(r.u, r.v): (r.h2_ab, r.h2_ba, r.h2) for r in
           hausdorff_pairs(df, "ent", "blk", "idx", "x", "y").collect()}
    assert got == _py_hausdorff(pts)
    assert got
    # identical trajectories => distance 0
    dup = [(9, 100, 900, 5, 5), (9, 100, 901, 7, 9),
           (9, 101, 902, 5, 5), (9, 101, 903, 7, 9)]
    df2 = spark.createDataFrame(
        dup, "blk long, ent long, idx long, x long, y long")
    r = hausdorff_pairs(df2, "ent", "blk", "idx", "x", "y").collect()[0]
    assert (r.h2_ab, r.h2_ba, r.h2) == (0, 0, 0)
