"""Connected-components tests (operators/graph.py): differential against
a python union-find on seeded random graphs, structured worst-ish cases,
and the dedup_clusters wrapper."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, v)  # first visit in ascending order = min
    return {v: comp[find(v)] for v in range(n_nodes)}


@pytest.mark.parametrize("n,p,seed", [
    (60, 0.01, 1), (200, 0.005, 2), (400, 0.002, 3), (400, 0.02, 4),
])
def test_cc_matches_union_find(spark, n, p, seed):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    edges = [(int(i), int(j)) for i in range(n) for j in range(i + 1, n)
             if m[i, j]]
    assert edges
    want = _union_find(n, edges)
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"))
    got = {r["node"]: r["component"]
           for r in connected_components(e).collect()}
    # operator only sees nodes with edges; compare on those
    seen = {a for ab in edges for a in ab}
    assert set(got) == seen
    assert all(got[v] == want[v] for v in seen)


def test_cc_long_chain(spark):
    """A path graph maximizes rounds for naive propagation; the star
    algorithm contracts it in O(log n) alternations."""
    n = 400
    e = spark.createDataFrame(
        pd.DataFrame({"src": range(n - 1),
                      "dst": range(1, n)}).astype("int64"))
    out = connected_components(e).collect()
    assert len(out) == n
    assert {r["component"] for r in out} == {0}


def test_cc_many_components_and_duplicate_edges(spark):
    """50 separate triangles, edges duplicated both directions."""
    rows = []
    for k in range(50):
        a, b, c = 3 * k, 3 * k + 1, 3 * k + 2
        rows += [(a, b), (b, a), (b, c), (a, c), (c, a)]
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst"]).astype("int64"))
    out = connected_components(e).collect()
    assert len(out) == 150
    for r in out:
        assert r["component"] == (r["node"] // 3) * 3


def test_dedup_clusters_singletons_and_representatives(spark):
    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(10))}).astype("int64"))
    pairs = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 7], "dst": [2, 3, 8]}).astype("int64"))
    out = {r["doc_id"]: (r["component"], r["is_representative"])
           for r in dedup_clusters(ids, pairs, id_col="doc_id").collect()}
    assert len(out) == 10
    assert out[1] == (1, True) and out[2] == (1, False) \
        and out[3] == (1, False)
    assert out[7] == (7, True) and out[8] == (7, False)
    for v in (0, 4, 5, 6, 9):                  # singletons
        assert out[v] == (v, True)
    n_reps = sum(1 for c, rep in out.values() if rep)
    assert n_reps == 7  # 10 docs -> 2 multi clusters + 5 singletons


def test_cc_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert connected_components(e).count() == 0
    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 6]}).astype("int64"))
    out = {r["doc_id"]: (r["component"], r["is_representative"])
           for r in dedup_clusters(ids, e, id_col="doc_id").collect()}
    assert out == {5: (5, True), 6: (6, True)}


def test_cc_no_collect_set_in_plan(spark):
    """The giant-cluster guard: CC rounds must be min-agg + join, never
    a materialized neighbor array.  Scoped to the CC machinery — other
    graph operators (adamic_adar) legitimately use a BOUNDED per-pair
    collect_list as the pinned-order float-sum fold."""
    import inspect

    from mapbox_filter_spark.operators import graph

    src = "".join(inspect.getsource(f) for f in (
        graph._large_star, graph._small_star,
        graph.connected_components, graph.dedup_clusters))
    assert "F.collect_set(" not in src and "F.collect_list(" not in src


# ---------------------------------------------------------- pagerank

from mapbox_filter_spark.operators.graph import pagerank_exact  # noqa: E402


def _py_pagerank(n, edge_list, iters=5, scale=10**12):
    """Integer twin replaying the exact arithmetic."""
    from collections import defaultdict
    deg = defaultdict(int)
    for s, _ in edge_list:
        deg[s] += 1
    base = (scale * 15) // (100 * n)
    pr = {v: scale // n for v in range(n)}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edge_list:
            s[b] += pr[a] // deg[a]
        pr = {v: base + (85 * s[v]) // 100 for v in range(n)}
    return pr


def test_pagerank_matches_integer_twin(spark):
    import random
    rnd = random.Random(11)
    n = 60
    edge_list = list({(rnd.randrange(n), rnd.randrange(n))
                      for _ in range(150)})
    edge_list = [(a, b) for a, b in edge_list if a != b]
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["pr"]
           for r in pagerank_exact(nodes, edges, iters=5).collect()}
    assert got == _py_pagerank(n, edge_list)


def test_pagerank_partitioning_independent(spark):
    edge_list = [(i, (i * 7 + 1) % 40) for i in range(40)] + \
        [(i, (i * 3 + 2) % 40) for i in range(40)]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    nodes = spark.range(40).select(F.col("id").alias("node"))
    e1 = spark.createDataFrame(edge_list, "src long, dst long")
    a = sorted(map(tuple, pagerank_exact(
        nodes.repartition(1), e1.repartition(1), iters=4).collect()))
    b = sorted(map(tuple, pagerank_exact(
        nodes.repartition(9), e1.repartition(13), iters=4).collect()))
    assert a == b


def test_pagerank_hub_ranks_highest(spark):
    # star: everyone links to node 0
    n = 20
    edge_list = [(i, 0) for i in range(1, n)]
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    pr = {r["node"]: r["pr"]
          for r in pagerank_exact(nodes, edges, iters=5).collect()}
    assert pr[0] == max(pr.values())
    assert pr[0] > 10 * pr[1]


def test_pagerank_validations(spark):
    nodes = spark.range(3).select(F.col("id").alias("node"))
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    import pytest as _pt
    with _pt.raises(ValueError):
        pagerank_exact(nodes, edges, iters=0)
    with _pt.raises(ValueError):
        pagerank_exact(nodes.filter("node < 0"), edges)


# ------------------------------------------------------------- shortest paths


def _py_dijkstra(edges, sources):
    """heapq twin: exact min distances from the source set."""
    import heapq
    adj = {}
    for s, t, w in edges:
        adj.setdefault(s, []).append((t, w))
    dist = {}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if u in dist:
            continue
        dist[u] = d
        for v, w in adj.get(u, []):
            if v not in dist:
                heapq.heappush(heap, (d + w, v))
    return dist


def _spark_sssp(spark, edges, sources):
    from mapbox_filter_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {r["node"]: r["dist"]
            for r in shortest_paths(e, s).collect()}


def test_sssp_crafted(spark):
    # diamond with a cheaper long way round + an unreachable node
    edges = [(0, 1, 10), (1, 3, 10), (0, 2, 1), (2, 4, 1), (4, 3, 1),
             (5, 6, 1)]
    got = _spark_sssp(spark, edges, [0])
    assert got == {0: 0, 1: 10, 2: 1, 4: 2, 3: 3}  # 5, 6 unreachable


def test_sssp_multi_source(spark):
    edges = [(0, 1, 5), (10, 1, 2), (1, 2, 1)]
    got = _spark_sssp(spark, edges, [0, 10])
    assert got == {0: 0, 10: 0, 1: 2, 2: 3}


def test_sssp_random_differential(spark):
    import random

    rng = random.Random(11)
    n = 60
    edges = []
    for _ in range(240):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((a, b, rng.randrange(1, 20)))
    got = _spark_sssp(spark, edges, [0, 7])
    assert got == _py_dijkstra(edges, [0, 7])


def test_sssp_zero_weight_edges(spark):
    edges = [(0, 1, 0), (1, 2, 0), (2, 3, 4)]
    assert _spark_sssp(spark, edges, [0]) == {0: 0, 1: 0, 2: 0, 3: 4}


def test_sssp_max_rounds(spark):
    edges = [(i, i + 1, 1) for i in range(10)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    from mapbox_filter_spark.operators.graph import shortest_paths

    with pytest.raises(RuntimeError, match="convergence"):
        shortest_paths(e, s, max_rounds=3)


def _py_kcore(edges, k):
    import collections
    adj = collections.defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    while True:
        bad = [n for n, s in adj.items() if len(s) < k]
        if not bad:
            return {n: len(s) for n, s in adj.items()}
        for n in bad:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_k_core_replay_random(spark):
    import random

    from mapbox_filter_spark.operators.graph import k_core

    rng = random.Random(31)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(160)})
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.deg for r in k_core(e, k=3).collect()}
    assert got == _py_kcore(edges, 3)


def test_k_core_path_and_clique(spark):
    from mapbox_filter_spark.operators.graph import k_core

    # a path has no 2-core (peels from both ends); a clique survives
    path = [(i, i + 1) for i in range(12)]
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i)]
    e = spark.createDataFrame(path + clique, "src long, dst long")
    got = {r.node: r.deg for r in k_core(e, k=2).collect()}
    assert got == {100 + i: 4 for i in range(5)}
    assert k_core(e, k=5).isEmpty()          # no 5-core anywhere


def _py_assort(edges):
    import collections
    import math
    c = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    deg = collections.Counter()
    for u, v in c:
        deg[u] += 1
        deg[v] += 1
    ends = [(deg[u], deg[v]) for u, v in c] + [(deg[v], deg[u])
                                               for u, v in c]
    m = len(ends)
    sx = sum(x for x, _ in ends)
    sxx = sum(x * x for x, _ in ends)
    sxy = sum(x * y for x, y in ends)
    num, d = m * sxy - sx * sx, m * sxx - sx * sx
    r = float(num) / (math.sqrt(float(d)) * math.sqrt(float(d))) \
        if d > 0 else None
    return m, num, d, r


def test_assortativity_replay_and_star(spark):
    import random

    from mapbox_filter_spark.operators.graph import degree_assortativity

    rng = random.Random(32)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(90)})
    e = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(e).collect()[0]
    m, num, d, r = _py_assort(edges)
    assert (row.m_ends, row.s_num, row.d_x, row.d_y) == (m, num, d, d)
    assert row.r == r
    # star graph: perfectly disassortative, r = -1
    star = spark.createDataFrame([(0, i) for i in range(1, 9)],
                                 "src long, dst long")
    assert abs(degree_assortativity(star).collect()[0].r + 1.0) < 1e-12
    # 3-regular graph (K4): zero degree variance -> NULL
    k4 = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(i)],
        "src long, dst long")
    assert degree_assortativity(k4).collect()[0].r is None
