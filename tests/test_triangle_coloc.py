"""Unit differentials for triangle_counts (operators/graph.py) and
colocation_pairs (operators/trajectory.py)."""

import itertools
import random
from datetime import datetime

from mapbox_filter_spark.operators.graph import triangle_counts
from mapbox_filter_spark.operators.trajectory import colocation_pairs


def _brute(edges, n):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    cnt = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            for v in (a, b, c):
                cnt[v] = cnt.get(v, 0) + 1
    return cnt


def test_triangle_brute_differential(spark):
    random.seed(42)
    n = 40
    edges = set()
    while len(edges) < 120:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((a, b))
    edf = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(edf).collect()}
    assert got == _brute(edges, n)


def test_triangle_star_plus_one(spark):
    # a star has NO triangles (the hub case the degree ordering exists
    # for); closing one leaf pair creates exactly one
    star = [(0, i) for i in range(1, 8)]
    edf = spark.createDataFrame(star, "src long, dst long")
    assert triangle_counts(edf).count() == 0
    edf2 = spark.createDataFrame(star + [(3, 5)], "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(edf2).collect()}
    assert got == {0: 1, 3: 1, 5: 1}


def test_triangle_dirty_input(spark):
    # self-loops, duplicates, and reversed duplicates must not count
    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (2, 3), (1, 3), (3, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(edf).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_colocation_semantics(spark):
    # users 1 and 2: three shared (cell, day) visits — user 1's repeated
    # pings in the same space-time cell count once; user 3 meets user 1
    # only twice, below the threshold
    rows = [
        (1, _ts(1), 10, 10), (1, _ts(1, 5), 40, 40),  # same cell twice
        (2, _ts(1), 20, 20),
        (1, _ts(2), 10, 10), (2, _ts(2), 30, 30),
        (1, _ts(3), 10, 10), (2, _ts(3), 10, 10),
        (3, _ts(1), 50, 50), (3, _ts(2), 50, 50),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, x long, y long")
    got = {(r.user_a, r.user_b): r.n_meet
           for r in colocation_pairs(df, cell=100, bucket_s=86400,
                                     min_meetings=3).collect()}
    assert got == {(1, 2): 3}
    # threshold 2 admits the (1,3) and (2,3) pairs
    got2 = {(r.user_a, r.user_b): r.n_meet
            for r in colocation_pairs(df, cell=100, bucket_s=86400,
                                      min_meetings=2).collect()}
    assert got2 == {(1, 2): 3, (1, 3): 2, (2, 3): 2}


def test_colocation_negative_coords(spark):
    # floor-division cells: (-1, -1) and (1, 1) are DIFFERENT cells at
    # cell=100 (truncation toward zero would merge them)
    rows = [(1, _ts(1), -1, -1), (2, _ts(1), 1, 1)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, x long, y long")
    assert colocation_pairs(df, cell=100, bucket_s=86400,
                            min_meetings=1).count() == 0
