"""Unit differentials for the session-7b operator block: Allen
interval algebra (all 13 relations pinned by hand), in-row proximity
search (brute replay), exact 2-feature OLS (numpy lstsq differential +
degenerate designs)."""

import random

from pyspark.sql import functions as F


_ALLEN_CASES = [
    # (l_start, l_end, r_start, r_end, relation)
    (0, 10, 0, 10, "equals"),
    (0, 3, 5, 9, "before"),
    (5, 9, 0, 3, "after"),
    (0, 5, 5, 9, "meets"),
    (5, 9, 0, 5, "met_by"),
    (0, 4, 0, 9, "starts"),
    (0, 9, 0, 4, "started_by"),
    (5, 9, 0, 9, "finishes"),
    (0, 9, 5, 9, "finished_by"),
    (3, 6, 0, 9, "during"),
    (0, 9, 3, 6, "contains"),
    (0, 6, 3, 9, "overlaps"),
    (3, 9, 0, 6, "overlapped_by"),
    # point-interval degeneracies: branch order is the contract
    # (boundary-equality relations outrank meets/met_by)
    (5, 5, 5, 5, "equals"),
    (5, 5, 5, 9, "starts"),
    (9, 9, 5, 9, "finishes"),
    (5, 5, 0, 5, "finishes"),
    (0, 5, 5, 5, "finished_by"),
    (5, 5, 0, 9, "during"),
]


def test_allen_all_13_relations(spark):
    from mapbox_filter_spark.operators.temporal import allen_join
    left = spark.createDataFrame(
        [(i, ls, le) for i, (ls, le, _, _, _) in enumerate(_ALLEN_CASES)],
        "k long, l_start long, l_end long")
    right = spark.createDataFrame(
        [(i, rs, re) for i, (_, _, rs, re, _) in enumerate(_ALLEN_CASES)],
        "k long, r_start long, r_end long")
    got = {r["k"]: r["rel"]
           for r in allen_join(left, right, ["k"],
                               touching_only=False).collect()}
    for i, (_, _, _, _, want) in enumerate(_ALLEN_CASES):
        assert got[i] == want, (i, got[i], want)


def test_allen_touching_only_drops_disjoint(spark):
    from mapbox_filter_spark.operators.temporal import allen_join
    left = spark.createDataFrame([(1, 0, 3), (1, 0, 5)],
                                 "k long, l_start long, l_end long")
    right = spark.createDataFrame([(1, 5, 9)],
                                  "k long, r_start long, r_end long")
    rels = sorted(r["rel"] for r in
                  allen_join(left, right, ["k"]).collect())
    assert rels == ["meets"]          # the 'before' pair is dropped


def test_near_query_hand_and_replay(spark):
    from mapbox_filter_spark.operators.retrieval import near_query
    rows = [
        (1, "a b target x y anchor z"),      # gap 3
        (2, "target anchor"),                # gap 1
        (3, "target x x x x x anchor"),      # gap 6: out of window
        (4, "anchor only here"),             # missing term
        (5, "target anchor target anchor"),  # multiple pairs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_pairs"], r["min_gap"]) for r in
           near_query(df, "target", "anchor", 3).collect()}
    assert got == {1: (1, 3), 2: (1, 1), 5: (4, 1)}
    # brute replay on random word soup
    rng = random.Random(31)
    vocab = ["target", "anchor", "x", "y", "z"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 near_query(df, "target", "anchor", 2).collect())
    want = []
    for i, text in rows:
        ws = text.split()
        pa = [k for k, w in enumerate(ws) if w == "target"]
        pb = [k for k, w in enumerate(ws) if w == "anchor"]
        hits = [abs(a - b) for a in pa for b in pb if abs(a - b) <= 2]
        if hits:
            want.append((i, len(hits), min(hits)))
    assert got == sorted(want)


def test_near_query_rejects_bad_args(spark):
    import pytest
    from mapbox_filter_spark.operators.retrieval import near_query
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        near_query(df, "a", "a", 2)
    with pytest.raises(ValueError):
        near_query(df, "a", "b", 0)


def test_ols2_recovers_exact_plane(spark):
    from mapbox_filter_spark.operators.stats import ols2
    # y generated exactly on a plane: coefficients recover exactly
    rng = random.Random(5)
    rows = [(x1, x2, 7 + 3 * x1 - 2 * x2)
            for x1, x2 in {(rng.randint(0, 23), rng.randint(0, 6))
                           for _ in range(200)}]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    r = ols2(df, "x1", "x2", "y").collect()[0]
    assert (r["b0"], r["b1"], r["b2"]) == (7.0, 3.0, -2.0)


def test_ols2_matches_numpy_and_guards_collinear(spark):
    import numpy as np
    from mapbox_filter_spark.operators.stats import ols2
    rng = random.Random(13)
    rows = [("g", rng.randint(0, 23), rng.randint(0, 6),
             rng.randint(-500, 500)) for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, x1 long, x2 long, y long")
    r = ols2(df, "x1", "x2", "y", group_cols=["g"]).collect()[0]
    a = np.array([[1.0, x1, x2] for _, x1, x2, _ in rows])
    yv = np.array([float(y) for _, _, _, y in rows])
    beta = np.linalg.lstsq(a, yv, rcond=None)[0]
    for got, want in zip((r["b0"], r["b1"], r["b2"]), beta):
        assert abs(got - want) < 1e-9 * max(1.0, abs(want))
    # collinear design (x2 = 2*x1): det = 0 -> NULL coefficients
    rows = [(x1, 2 * x1, x1 + 1) for x1 in range(50)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    r = ols2(df, "x1", "x2", "y").collect()[0]
    assert r["b0"] is None and r["b1"] is None and r["b2"] is None
    assert r["n"] == 50


def test_gearys_c_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import gearys_c
    rng = random.Random(17)
    cells = {(rng.randint(0, 8), rng.randint(0, 8)): rng.randint(0, 40)
             for _ in range(45)}
    rows = [(x, y, v) for (x, y), v in cells.items()]
    df = spark.createDataFrame(rows, "cx long, cy long, v long")
    r = gearys_c(df, "cx", "cy", "v").collect()[0]
    n = len(cells)
    mean = sum(cells.values()) / n
    diff = w = 0
    for (x, y), v in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx or dy) and (x + dx, y + dy) in cells:
                    w += 1
                    diff += (v - cells[(x + dx, y + dy)]) ** 2
    den = sum((v - mean) ** 2 for v in cells.values())
    want = (n - 1) * diff / (2 * w * den)
    assert (r["n_cells"], r["w_pairs"], r["diff_num"]) == (n, w, diff)
    assert abs(r["geary_c"] - want) < 1e-12
    assert r["e_c"] == 1.0
    # constant field -> NULL C, exact zero denominator
    df = spark.createDataFrame([(0, 0, 5), (0, 1, 5), (1, 0, 5)],
                               "cx long, cy long, v long")
    r = gearys_c(df, "cx", "cy", "v").collect()[0]
    assert r["den"] == 0 and r["geary_c"] is None


def _py_morton(x, y, order):
    m = 0
    for k in range(order):
        m |= ((x >> k) & 1) << (2 * k)
        m |= ((y >> k) & 1) << (2 * k + 1)
    return m


def test_morton_encode_matches_python(spark):
    from mapbox_filter_spark.geo.zorder import morton_col
    rng = random.Random(3)
    rows = [(rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
            for _ in range(200)] + [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y",
                    morton_col(F.col("x"), F.col("y"), 16).alias("m")) \
        .collect()
    for r in got:
        assert r["m"] == _py_morton(r["x"], r["y"], 16)


def test_morton_ranges_cover_exactly(spark):
    """Unbudgeted range cover contains EXACTLY the rectangle's keys."""
    from mapbox_filter_spark.geo.zorder import morton_ranges
    rng = random.Random(9)
    for _ in range(25):
        order = rng.randint(2, 6)
        n = 1 << order
        x_lo = rng.randrange(n); x_hi = rng.randrange(x_lo, n)
        y_lo = rng.randrange(n); y_hi = rng.randrange(y_lo, n)
        ranges = morton_ranges(order, x_lo, x_hi, y_lo, y_hi,
                               max_ranges=10**9)
        keys = set()
        for lo, hi in ranges:
            keys.update(range(lo, hi + 1))
        want = {_py_morton(x, y, order)
                for x in range(x_lo, x_hi + 1)
                for y in range(y_lo, y_hi + 1)}
        assert keys == want, (order, x_lo, x_hi, y_lo, y_hi)
    # a tight budget yields a SUPERSET (gap merging), never a miss
    ranges = morton_ranges(5, 3, 17, 2, 23, max_ranges=3)
    assert len(ranges) <= 3
    keys = set()
    for lo, hi in ranges:
        keys.update(range(lo, hi + 1))
    want = {_py_morton(x, y, 5) for x in range(3, 18)
            for y in range(2, 24)}
    assert want <= keys


def test_zorder_scan_pushes_ranges_to_parquet(spark, tmp_path):
    from mapbox_filter_spark.geo.zorder import (
        write_zorder_corpus, zorder_bbox_scan)
    rng = random.Random(21)
    rows = [(i, rng.randrange(0, 256), rng.randrange(0, 256))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    path = str(tmp_path / "zc")
    write_zorder_corpus(df, path, 8)
    got = zorder_bbox_scan(spark, path, 40, 90, 100, 140, 8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "morton" in plan
    have = sorted((r["i"], r["x"], r["y"])
                  for r in got.select("i", "x", "y").collect())
    want = sorted((i, x, y) for i, x, y in rows
                  if 40 <= x <= 90 and 100 <= y <= 140)
    assert have == want
