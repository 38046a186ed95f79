"""Integer k-means (operators/cluster.py kmeans_integer): python
replay differential and determinism/edge guards."""

import random

import pytest

from mapbox_filter_spark.operators.cluster import kmeans_integer


def _u60(salt, x, y):
    import hashlib
    s = chr(31).join([salt, str(x), str(y)])
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(pts, k, iters, salt):
    distinct = sorted(set(pts), key=lambda p: (_u60(salt, *p), p))
    cents = {i: distinct[i] for i in range(k)}
    for _ in range(iters + 1):
        assign = {}
        for (x, y) in pts:
            key = min(((x - cx) ** 2 + (y - cy) ** 2) * k + cid
                      for cid, (cx, cy) in cents.items())
            assign.setdefault(key % k, []).append((x, y))
        if _ == iters:
            return {cid: (cents[cid][0], cents[cid][1], len(m))
                    for cid, m in assign.items()} | {
                cid: (c[0], c[1], 0) for cid, c in cents.items()
                if cid not in assign}
        new = {}
        for cid, (cx, cy) in cents.items():
            m = assign.get(cid)
            if not m:
                new[cid] = (cx, cy)
            else:
                sx = sum(p[0] for p in m)
                sy = sum(p[1] for p in m)
                new[cid] = (sx // len(m), sy // len(m))
        cents = new


def test_replay_differential(spark):
    random.seed(3)
    pts = [(random.randrange(-500, 500), random.randrange(-500, 500))
           for _ in range(400)]
    pts += pts[:50]  # duplicates: weighted coords must not double-seed
    df = spark.createDataFrame(pts, "x long, y long")
    got = {r.cent_id: (r.cx, r.cy, r.n_members)
           for r in kmeans_integer(df, "x", "y", k=5, iters=3,
                                   salt="t").collect()}
    assert got == _replay(pts, 5, 3, "t")


def test_zero_iters_returns_seed_assignment(spark):
    pts = [(0, 0), (10, 0), (100, 100)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = kmeans_integer(df, "x", "y", k=3, iters=0, salt="t")
    rows = out.collect()
    assert sorted((r.cx, r.cy) for r in rows) == sorted(pts)
    assert sum(r.n_members for r in rows) == 3


def test_guards(spark):
    df = spark.createDataFrame([(1, 1), (1, 1)], "x long, y long")
    with pytest.raises(ValueError, match="distinct"):
        kmeans_integer(df, "x", "y", k=2, iters=1)
    with pytest.raises(ValueError, match="k > 0"):
        kmeans_integer(df, "x", "y", k=0, iters=1)
