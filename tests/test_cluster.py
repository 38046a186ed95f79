"""operators/cluster.py — grid DBSCAN vs a brute-force python twin."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.cluster import dbscan, grid_neighbor_pairs


def _py_dbscan(pts, eps, min_pts):
    """Brute-force twin with the same deterministic rules: labels are
    component-min core ids; borders take the min label among their core
    neighbors; everything else noise (None)."""
    eps2 = eps * eps
    nbrs = {i: set() for i, _, _ in pts}
    for i, xi, yi in pts:
        for j, xj, yj in pts:
            if i != j and (xi - xj) ** 2 + (yi - yj) ** 2 <= eps2:
                nbrs[i].add(j)
    cores = {i for i in nbrs if len(nbrs[i]) + 1 >= min_pts}
    label = {}
    for seed in sorted(cores):
        if seed in label:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in cores and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in nbrs:
        if i in cores:
            out[i] = (label[i], "core")
        else:
            core_nb = [label[j] for j in nbrs[i] if j in cores]
            out[i] = ((min(core_nb), "border") if core_nb
                      else (None, "noise"))
    return out


def _spark_dbscan(spark, pts, eps, min_pts, parts=4):
    df = spark.createDataFrame(pts, "id long, x long, y long") \
              .repartition(parts)
    return {r["id"]: (r["label"], r["role"])
            for r in dbscan(df, eps, min_pts).collect()}


def test_crafted_clusters(spark):
    # two dense blobs, a bridge border point, and an outlier
    pts = [
        (1, 0, 0), (2, 3, 0), (3, 0, 3), (4, 3, 3),           # blob A
        (10, 100, 100), (11, 103, 100), (12, 100, 103), (13, 103, 103),
        (20, 8, 0),             # border: near blob A's (3,0) core only
        (30, 500, 500),         # noise
    ]
    got = _spark_dbscan(spark, pts, eps=5, min_pts=4)
    want = _py_dbscan(pts, 5, 4)
    assert got == want
    assert got[1] == (1, "core")
    assert got[10] == (10, "core")
    assert got[20] == (1, "border")
    assert got[30] == (None, "noise")


@pytest.mark.parametrize("seed,eps,min_pts", [(1, 40, 3), (2, 25, 4),
                                              (3, 60, 5)])
def test_random_differential(spark, seed, eps, min_pts):
    rng = random.Random(seed)
    # clustered generator: 12 centers, gaussian-ish scatter, plus noise
    centers = [(rng.randrange(0, 2000), rng.randrange(0, 2000))
               for _ in range(12)]
    pts = []
    i = 0
    for cx, cy in centers:
        for _ in range(rng.randrange(3, 15)):
            pts.append((i, cx + rng.randrange(-30, 31),
                        cy + rng.randrange(-30, 31)))
            i += 1
    for _ in range(40):
        pts.append((i, rng.randrange(0, 2000), rng.randrange(0, 2000)))
        i += 1
    assert _spark_dbscan(spark, pts, eps, min_pts) == \
        _py_dbscan(pts, eps, min_pts)


def test_negative_coordinates(spark):
    # floor-div cells must stay adjacent across 0 (truncating div would
    # make cell 0 span 2*eps and miss neighbors at the boundary)
    pts = [(1, -2, 0), (2, 2, 0), (3, -2, 3), (4, 2, 3), (5, -9, 0)]
    got = _spark_dbscan(spark, pts, eps=5, min_pts=4)
    assert got == _py_dbscan(pts, 5, 4)
    assert got[1][1] == "core"


def test_partitioning_independent(spark):
    rng = random.Random(9)
    pts = [(i, rng.randrange(0, 300), rng.randrange(0, 300))
           for i in range(150)]
    a = _spark_dbscan(spark, pts, 20, 4, parts=1)
    b = _spark_dbscan(spark, pts, 20, 4, parts=13)
    assert a == b


def test_pair_symmetry_and_no_self(spark):
    rng = random.Random(4)
    pts = [(i, rng.randrange(0, 200), rng.randrange(0, 200))
           for i in range(80)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    pairs = {(r["i"], r["j"])
             for r in grid_neighbor_pairs(df, 30).collect()}
    assert pairs and all((j, i) in pairs for i, j in pairs)
    assert all(i != j for i, j in pairs)


def test_validations(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError, match="eps"):
        grid_neighbor_pairs(df, 0)
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, 5, 0)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(i, i * 7, i * 3) for i in range(50)],
                               "id long, x long, y long")
    plan = grid_neighbor_pairs(df, 10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- bounded kNN join


def _py_knn_join(queries, corpus, k, radius):
    out = []
    for qid, qx, qy in queries:
        cands = []
        for cid, cx, cy in corpus:
            d2 = (qx - cx) ** 2 + (qy - cy) ** 2
            if d2 <= radius * radius:
                cands.append((d2, cid))
        for rank, (d2, cid) in enumerate(sorted(cands)[:k], start=1):
            out.append((qid, rank, cid, d2))
    return sorted(out)


def test_knn_join_differential(spark):
    import random

    from mapbox_filter_spark.operators.cluster import grid_knn_join

    rng = random.Random(21)
    corpus = [(i, rng.randrange(0, 600), rng.randrange(0, 600))
              for i in range(300)]
    queries = [(1000 + i, rng.randrange(0, 600), rng.randrange(0, 600))
               for i in range(60)]
    q = spark.createDataFrame(queries, "query_id long, x long, y long")
    c = spark.createDataFrame(corpus, "point_id long, x long, y long")
    got = sorted(map(tuple, grid_knn_join(q, c, 4, 80).collect()))
    assert got == _py_knn_join(queries, corpus, 4, 80)


def test_knn_join_sparse_returns_fewer(spark):
    from mapbox_filter_spark.operators.cluster import grid_knn_join

    q = spark.createDataFrame([(1, 0, 0)], "query_id long, x long, y long")
    c = spark.createDataFrame([(10, 5, 0), (11, 500, 500)],
                              "point_id long, x long, y long")
    rows = grid_knn_join(q, c, 3, 50).collect()
    assert [(r["rank"], r["point_id"], r["d2"]) for r in rows] == [(1, 10, 25)]


def test_knn_join_validations(spark):
    from mapbox_filter_spark.operators.cluster import grid_knn_join

    df = spark.createDataFrame([(1, 0, 0)], "query_id long, x long, y long")
    c = df.withColumnRenamed("query_id", "point_id")
    with pytest.raises(ValueError, match="k"):
        grid_knn_join(df, c, 0, 10)
    with pytest.raises(ValueError, match="radius"):
        grid_knn_join(df, c, 1, 0)


# ---------------------------------------------------------------- geofence


def test_geofence_flag_differential(spark):
    import random

    from mapbox_filter_spark.operators.cluster import geofence_flag

    rng = random.Random(27)
    pts = [(i, rng.randrange(0, 500), rng.randrange(0, 500))
           for i in range(200)]
    zones = [(100 + i, rng.randrange(0, 500), rng.randrange(0, 500))
             for i in range(6)]
    p = spark.createDataFrame(pts, "point_id long, x long, y long")
    z = spark.createDataFrame(zones, "zone_id long, x long, y long")
    r = 60
    got = {row["point_id"]: (row["in_fence"], row["nearest_zone"], row["d2"])
           for row in geofence_flag(p, z, r).collect()}
    for pid, px, py in pts:
        cands = sorted((((px - zx) ** 2 + (py - zy) ** 2), zid)
                       for zid, zx, zy in zones
                       if (px - zx) ** 2 + (py - zy) ** 2 <= r * r)
        if cands:
            assert got[pid] == (True, cands[0][1], cands[0][0])
        else:
            assert got[pid] == (False, None, None)
    assert len(got) == len(pts)


def test_geofence_validation(spark):
    from mapbox_filter_spark.operators.cluster import geofence_flag

    df = spark.createDataFrame([(1, 0, 0)], "point_id long, x long, y long")
    z = df.withColumnRenamed("point_id", "zone_id")
    import pytest as _pt

    with _pt.raises(ValueError, match="radius"):
        geofence_flag(df, z, 0)


def test_salted_pairs_identical(spark):
    """salt=S spreads a hot cell's refine across S map-time shards with
    IDENTICAL output — the parity contract behind dbscan_skew_micro."""
    rng = random.Random(11)
    # hotspot: half the points in one eps-cell, rest uniform
    pts = [(i, rng.randrange(0, 18), rng.randrange(0, 18))
           for i in range(60)]
    pts += [(i, rng.randrange(0, 400), rng.randrange(0, 400))
            for i in range(60, 140)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    plain = sorted((r["i"], r["j"])
                   for r in grid_neighbor_pairs(df, 20).collect())
    salted = sorted((r["i"], r["j"])
                    for r in grid_neighbor_pairs(df, 20, salt=7,
                                             salt_threshold=20).collect())
    assert plain == salted and plain


def test_salted_dbscan_identical(spark):
    rng = random.Random(12)
    pts = [(i, rng.randrange(0, 15), rng.randrange(0, 15))
           for i in range(50)]
    pts += [(i, rng.randrange(0, 300), rng.randrange(0, 300))
            for i in range(50, 120)]
    a = _spark_dbscan(spark, pts, 20, 4)
    df = spark.createDataFrame(pts, "id long, x long, y long")
    b = {r["id"]: (r["label"], r["role"])
         for r in dbscan(df, 20, 4, salt=5, salt_threshold=20).collect()}
    assert a == b


def test_salt_validation(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError, match="salt"):
        grid_neighbor_pairs(df, 5, salt=1)


def test_grid_radius_join_differential(spark):
    from mapbox_filter_spark.operators.cluster import grid_radius_join

    rng = random.Random(33)
    corpus = [(i, rng.randrange(0, 600), rng.randrange(0, 600))
              for i in range(250)]
    queries = [(1000 + i, rng.randrange(0, 600), rng.randrange(0, 600))
               for i in range(50)]
    q = spark.createDataFrame(queries, "query_id long, x long, y long")
    c = spark.createDataFrame(corpus, "point_id long, x long, y long")
    r = 70
    got = sorted(map(tuple, grid_radius_join(q, c, r).collect()))
    want = sorted((qid, cid, (qx - cx) ** 2 + (qy - cy) ** 2)
                  for qid, qx, qy in queries
                  for cid, cx, cy in corpus
                  if (qx - cx) ** 2 + (qy - cy) ** 2 <= r * r)
    assert got == want and got


def test_grid_radius_join_validation(spark):
    from mapbox_filter_spark.operators.cluster import grid_radius_join

    df = spark.createDataFrame([(1, 0, 0)], "query_id long, x long, y long")
    c = df.withColumnRenamed("query_id", "point_id")
    with pytest.raises(ValueError, match="radius"):
        grid_radius_join(df, c, 0)
