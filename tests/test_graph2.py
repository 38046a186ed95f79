"""Differentials for the round-5 graph additions (operators/graph.py
label_propagation / jaccard_links / hash_walks): hand fixtures + exact
python replays of the same deterministic rules."""

import hashlib
from collections import Counter, defaultdict


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _py_lpa(nodes, pairs, rounds):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            if not adj[v]:
                new[v] = v
                continue
            cnt = Counter(lab[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def test_lpa_two_communities_and_replay(spark):
    from mapbox_filter_spark.operators.graph import label_propagation

    # two triangles bridged by a single edge: CC would merge them; LPA
    # keeps both sides on their local majority label
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    nodes = [1, 2, 3, 4, 5, 6, 99]  # 99 isolated
    got = {r.node: r.label for r in
           label_propagation(_nodes_df(spark, nodes),
                             _edges_df(spark, pairs),
                             rounds=4).collect()}
    exp = _py_lpa(nodes, pairs, 4)
    assert got == exp
    assert got[99] == 99
    # the bridge did not collapse the two triangles into one label
    assert len({got[1], got[2]} | {got[5], got[6]}) >= 2


def test_lpa_replay_random(spark):
    import random

    from mapbox_filter_spark.operators.graph import label_propagation

    random.seed(53)
    nodes = list(range(60))
    pairs = [(random.randrange(60), random.randrange(60))
             for _ in range(120)]
    got = {r.node: r.label for r in
           label_propagation(_nodes_df(spark, nodes),
                             _edges_df(spark, pairs),
                             rounds=3).collect()}
    assert got == _py_lpa(nodes, pairs, 3)


def _py_jaccard(pairs, min_common):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    ns = sorted(adj)
    for i, u in enumerate(ns):
        for v in ns[i + 1:]:
            if v in adj[u]:
                continue
            c = len(adj[u] & adj[v])
            if c >= min_common:
                out[(u, v)] = (c, len(adj[u]), len(adj[v]),
                               c / (len(adj[u]) + len(adj[v]) - c))
    return out


def test_jaccard_links_replay(spark):
    import random

    from mapbox_filter_spark.operators.graph import jaccard_links

    random.seed(54)
    pairs = [(random.randrange(40), random.randrange(40))
             for _ in range(150)]
    got = {(r.u, r.v): (r.n_common, r.deg_u, r.deg_v, r.jaccard)
           for r in jaccard_links(_edges_df(spark, pairs),
                                  min_common=2).collect()}
    assert got == _py_jaccard(pairs, 2)
    assert got  # non-vacuous


def _h60(*parts):
    s = "\x1f".join(parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(nodes, pairs, steps, salt):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    out = {}
    for start in nodes:
        cur, moves = start, 0
        for i in range(steps):
            nbrs = adj[cur]
            if nbrs:
                cur = min(nbrs, key=lambda d: (_h60(salt, str(cur),
                                                    str(i), str(d)), d))
                moves += 1
        out[start] = (cur, moves)
    return out


def test_hash_walks_replay_and_absorb(spark):
    import random

    from mapbox_filter_spark.operators.graph import hash_walks

    random.seed(55)
    nodes = list(range(30))
    # directed edges; node 29 gets none -> absorbs at step 0
    pairs = [(random.randrange(29), random.randrange(30))
             for _ in range(80)]
    got = {r.start: (r.node, r.n_moves) for r in
           hash_walks(_nodes_df(spark, nodes), _edges_df(spark, pairs),
                      steps=4, salt="t").collect()}
    exp = _py_walks(nodes, pairs, 4, "t")
    assert got == exp
    if 29 not in {a for a, _ in pairs}:
        assert got[29] == (29, 0)
