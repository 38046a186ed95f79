"""Session-10 sketch + graph operators (operators/sketch.py
ams_registers / ams_f2_estimate, operators/graph.py
landmark_distances): brute python replays of the md5 sign chain and
the BFS definition, merge/bound properties, degenerate cases."""

import hashlib
import random
from collections import defaultdict

from mapbox_filter_spark.operators.graph import landmark_distances
from mapbox_filter_spark.operators.sketch import (
    ams_f2_estimate, ams_registers)


def _py_sign(key: str, salt: str) -> int:
    h = hashlib.md5(f"{salt}\x1f{key}".encode()).hexdigest()[:15]
    return 1 - 2 * (int(h, 16) % 2)


def _py_ams(keys, s, salt):
    regs = defaultdict(int)
    for k in keys:
        for j in range(s):
            regs[j] += _py_sign(k, f"{salt}-{j}")
    ests = sorted((regs[j] * regs[j], j) for j in range(s))
    return dict(regs), ests[(s + 1) // 2 - 1][0]


def test_ams_registers_differential(spark):
    rng = random.Random(7)
    keys = [f"u{rng.randrange(40)}" for _ in range(600)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["seed"]: r["reg"]
           for r in ams_registers(df, "k", s=8, salt="t").collect()}
    exp_regs, exp_med = _py_ams(keys, 8, "t")
    assert got == exp_regs
    est = ams_f2_estimate(
        ams_registers(df, "k", s=8, salt="t"), s=8).collect()[0]
    assert est["f2_est"] == exp_med


def test_ams_merge_by_sum(spark):
    rng = random.Random(13)
    keys = [f"k{rng.randrange(25)}" for _ in range(400)]
    half = len(keys) // 2
    df_all = spark.createDataFrame([(k,) for k in keys], "k string")
    df_a = spark.createDataFrame([(k,) for k in keys[:half]], "k string")
    df_b = spark.createDataFrame([(k,) for k in keys[half:]], "k string")
    whole = {r["seed"]: r["reg"]
             for r in ams_registers(df_all, "k", s=6).collect()}
    pa = {r["seed"]: r["reg"]
          for r in ams_registers(df_a, "k", s=6).collect()}
    pb = {r["seed"]: r["reg"]
          for r in ams_registers(df_b, "k", s=6).collect()}
    assert whole == {j: pa.get(j, 0) + pb.get(j, 0) for j in whole}


def test_ams_estimate_tracks_f2(spark):
    # uniform stream: 50 keys x 20 each -> F2 = 50*400 = 20000; the
    # 16-seed median lands within the standard AMS factor
    keys = [f"k{i % 50}" for i in range(1000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    est = ams_f2_estimate(ams_registers(df, "k", s=16),
                          s=16).collect()[0]["f2_est"]
    f2 = 50 * 400
    assert f2 / 4 <= est <= f2 * 4


def _py_bfs(edges, lms, rounds):
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    out = {}
    for lm in lms:
        dist = {lm: 0}
        frontier = [lm]
        for r in range(1, rounds + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = r
                        nxt.append(v)
            frontier = nxt
        for n, d in dist.items():
            out[(lm, n)] = d
    return out


def _run_lmd(spark, edges, lms, rounds):
    e = spark.createDataFrame(edges, "src long, dst long")
    l = spark.createDataFrame([(x,) for x in lms], "lm long")
    rows = landmark_distances(e, l, rounds=rounds).collect()
    return {(r["lm"], r["node"]): r["dist"] for r in rows}


def test_landmark_bfs_differential(spark):
    rng = random.Random(29)
    edges = list({(rng.randrange(60), rng.randrange(60))
                  for _ in range(150)})
    lms = [0, 7, 13]
    assert _run_lmd(spark, edges, lms, 4) == _py_bfs(edges, lms, 4)


def test_landmark_bfs_round_bound(spark):
    # a directed path 0->1->...->9: rounds=3 must reach only nodes 0..3
    edges = [(i, i + 1) for i in range(9)]
    got = _run_lmd(spark, edges, [0], 3)
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3}


def test_landmark_bfs_directed(spark):
    # edge 5->6 only: landmark 6 reaches nothing downstream
    got = _run_lmd(spark, [(5, 6)], [6], 3)
    assert got == {(6, 6): 0}


def test_landmark_bfs_early_exhaustion(spark):
    # a 3-cycle explored with a generous round budget terminates early
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _run_lmd(spark, edges, [0], 10)
    assert got == {(0, 0): 0, (0, 1): 1, (0, 2): 2}
