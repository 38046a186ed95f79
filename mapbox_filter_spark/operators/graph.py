"""Connected components over an edge list — the operator that turns
pairwise near-duplicate MATCHES (MinHash/SimHash/embedding buckets emit
pairs) into duplicate CLUSTERS, so a 100 TB dedup keeps one
representative per cluster instead of per pair.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — a public
algorithm, re-derived here for DataFrames):

- large-star: every node connects its strictly LARGER neighbors to the
  minimum of its neighborhood (including itself);
- small-star (on the directed big→small list): every node connects its
  out-neighbors and itself to its minimum out-neighbor.

Both rounds are expressed as ``groupBy(min) + join`` — deliberately NOT
``collect_set``: at convergence the component minimum neighbors the
ENTIRE component, and materializing that neighbor set as an in-row array
is exactly the giant-cluster OOM a boilerplate flood would trigger.  The
min-aggregate + join shape streams through map-side combine instead, so
a 100M-member duplicate cluster costs nothing more than a skewed-key
join (which AQE splits).

Converges to a forest of height 1 (edge = node → component minimum) in
O(log² n) rounds worst-case, a handful on real dedup graphs.
Convergence is detected by an order-insensitive edge-set fingerprint
(count + sum of xxhash64 pairs — no driver collect), and every round is
``localCheckpoint``-ed to cut the iterative lineage (without it the plan
doubles per round).  The driver loop is control only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters", "pagerank_exact",
           "shortest_paths", "triangle_counts", "hits_exact"]


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected pairs → canonical directed (big → small), no
    self-loops, distinct."""
    a, b = F.col(src), F.col(dst)
    return (edges
            .select(F.greatest(a, b).alias("src"),
                    F.least(a, b).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def _sym(e: DataFrame) -> DataFrame:
    """Symmetric (u, v) edge-end list: every canonical edge contributes
    both directions (duplicates preserved — callers feed _canon output,
    which is already distinct per undirected edge)."""
    return (e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .unionAll(e.select(F.col("dst").alias("u"),
                               F.col("src").alias("v"))))


def _large_star(e: DataFrame) -> DataFrame:
    """(v, min(Γ(u) ∪ {u})) for every neighbor v > u.  Output keeps the
    src > dst invariant: v > u ≥ min."""
    nbrs = _sym(e)
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), m.alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """On the directed big→small list: connect each center u and its
    out-neighbors to u's minimum out-neighbor m.  All emitted edges
    (v, m) and (u, m) satisfy src > dst (v, u > m = min)."""
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    j = e.join(mins, "src")
    leaves = (j.filter(F.col("dst") != F.col("m"))
              .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    centers = mins.select(F.col("src"), F.col("m").alias("dst"))
    return leaves.unionByName(centers).distinct()


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id of its connected component.  Isolated nodes never
    appear in an edge list — callers union them in afterwards (see
    ``dedup_clusters``)."""
    e = _canon(edges, src, dst).localCheckpoint()

    def fingerprint(df: DataFrame):
        # bit_xor: order-insensitive and overflow-free (a SUM of full-
        # range xxhash64 values overflows long under ANSI mode)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h")).first()
        return r["n"], r["h"]

    fp = fingerprint(e)
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint()
        fp2 = fingerprint(e)
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(f"no convergence in {max_rounds} rounds")

    # converged: edges are node -> component minimum.  The minima
    # themselves appear only on the dst side; add their self rows.
    nodes = e.select(F.col("src").alias("node"),
                     F.col("dst").alias("component"))
    minima = (e.select(F.col("dst").alias("node")).distinct()
              .join(e.select(F.col("src").alias("node")).distinct(),
                    "node", "left_anti")
              .withColumn("component", F.col("node")))
    return nodes.unionByName(minima)


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Cluster ids from near-duplicate pairs: every id in ``ids`` gets a
    ``component`` (its cluster's minimum id; singletons map to
    themselves) and a ``is_representative`` flag — the keep-one-per-
    cluster decision a dedup pipeline acts on."""
    cc = connected_components(pairs, src=src, dst=dst,
                              max_rounds=max_rounds)
    out = (ids.select(F.col(id_col))
           .join(cc.withColumnRenamed("node", id_col), id_col, "left")
           .withColumn("component",
                       F.coalesce("component", F.col(id_col))))
    return out.withColumn("is_representative",
                          F.col(id_col) == F.col("component"))


def pagerank_exact(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    alpha: tuple[int, int] = (85, 100),
    scale: int = 10**12,
    seeds: "DataFrame | None" = None,
) -> DataFrame:
    """PageRank in EXACT fixed-point integer arithmetic.  With
    ``seeds`` (a 1-column node DataFrame), personalized PageRank: both
    the initial mass and the per-round teleport term concentrate
    uniformly on the seed set instead of all nodes.

    Ranks are integers in units of ``1/scale`` probability mass; every
    step is integer (`div` truncation, fixed op order), so the result is
    bit-identical on any partitioning, any cluster shape, and any engine
    replaying the same arithmetic (the oracle unrolls the iterations as
    chained SQL CTEs) — floating-point PageRank can't promise that (its
    per-node sums re-associate across partitions).  Truncation leaks
    ≤ 1 unit of mass per (node, iteration) — at scale 10¹² that is a
    relative error ~n·iters/10¹², far below float64 noise; dangling
    nodes' mass leaks too (documented standard simplification).

    Per iteration: one join (contributions along edges, ``pr div
    outdeg``), one groupBy(dst) sum, one left join back to the node set —
    the same shapes connected_components uses, AQE-splittable on skew;
    ``localCheckpoint`` per round keeps the plan flat.
    """
    num, den = alpha
    if not (0 <= num <= den) or iters < 1:
        raise ValueError("need 0 <= alpha <= 1 and iters >= 1")
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")

    base_nodes = nodes.select(F.col(node_col).alias("node"))
    if seeds is None:
        base = (scale * (den - num)) // (den * n)
        init = scale // n
        nb = (base_nodes
              .withColumn("_base", F.lit(base).cast("long"))
              .withColumn("_init", F.lit(init).cast("long")))
    else:
        # personalized PageRank: ALL teleport mass lands on the seed
        # set (uniformly), so scores measure proximity to the seeds.
        # |S| is counted AFTER dedup and AFTER intersecting with the
        # node set — a duplicated or unknown seed row must not deflate
        # the per-seed mass
        flag = seeds.select(F.col(seeds.columns[0]).alias("node"),
                            F.lit(True).alias("_seed")).distinct()
        flagged = base_nodes.join(flag, "node", "left").localCheckpoint()
        s_n = flagged.filter("_seed").count()
        if s_n == 0:
            raise ValueError("no seed is a member of the node set")
        s_base = (scale * (den - num)) // (den * s_n)
        s_init = scale // s_n
        nb = flagged.select(
            "node",
            F.when(F.col("_seed"), F.lit(s_base))
            .otherwise(F.lit(0)).cast("long").alias("_base"),
            F.when(F.col("_seed"), F.lit(s_init))
            .otherwise(F.lit(0)).cast("long").alias("_init"))
    nb = nb.localCheckpoint()

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_d"))
    e = (edges.select(src, dst).join(deg, src)
         .localCheckpoint())  # degree computed once, lineage cut

    pr = nb.select("node", F.col("_init").alias("pr")).localCheckpoint()
    for _ in range(iters):
        contrib = (e.join(pr, e[src] == pr["node"])
                   .select(F.col(dst).alias("node"),
                           F.expr("pr div _d").alias("_c")))
        summed = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        pr = (nb.join(summed, "node", "left")
              .select("node",
                      (F.col("_base")
                       + F.expr(f"({num} * coalesce(_s, 0L)) div {den}"))
                      .cast("long").alias("pr"))
              .localCheckpoint())
    return pr


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_col: str = "node",
    max_rounds: int = 100,
) -> DataFrame:
    """Multi-source shortest paths — ``(node, dist)`` for every node
    reachable from ``sources``, ``dist`` the exact minimum path weight
    (integer weights ≥ 0; the road-network / isochrone primitive).

    Frontier-pruned Bellman-Ford: each round relaxes only edges leaving
    nodes whose distance IMPROVED last round (the standard distributed
    SSSP shape — Pregel's vertex-activation, re-derived for
    DataFrames).  Per round: one join (frontier × out-edges), one
    groupBy-min, one anti-join merge — all map-side-combinable keyed
    ops; ``localCheckpoint`` cuts the iterative lineage.  Rounds are
    bounded by the maximum HOP COUNT over optimal paths, not node
    count; on weight distributions with bounded spread (w ∈ [a, b]) an
    optimal path's hops exceed the hop-minimal path's by at most
    ×(b/a), which keeps rounds near the graph diameter.

    All-integer arithmetic ⇒ distances are engine- and partitioning-
    independent (the gate's DuckDB oracle unrolls the same relaxation
    as chained CTEs to a PROVEN round bound).  The per-round
    ``count()`` is driver control only (empty-frontier termination),
    same as connected_components' fingerprint."""
    e = (edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"),
                      F.col(weight).alias("_ew"))
         .localCheckpoint())
    dist = (sources.select(F.col(node_col).alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint())
    frontier = dist
    for _ in range(max_rounds):
        best = (frontier.join(e, frontier["node"] == e["_es"])
                .select(F.col("_ed").alias("node"),
                        (F.col("dist") + F.col("_ew")).alias("_cand"))
                .groupBy("node").agg(F.min("_cand").alias("_cand")))
        improved = (best.join(dist.withColumnRenamed("dist", "_old"),
                              "node", "left")
                    .filter(F.col("_old").isNull()
                            | (F.col("_cand") < F.col("_old")))
                    .select("node", F.col("_cand").alias("dist"))
                    .localCheckpoint())
        if improved.count() == 0:
            return dist
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
                .localCheckpoint())
        frontier = improved
    raise RuntimeError(f"no convergence in {max_rounds} rounds")


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    — the clustering-coefficient / community-density primitive.

    Algorithm (degree-ordered wedge closure — Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11; a
    public algorithm, re-derived for DataFrames): orient every
    deduplicated undirected edge from its lower-(degree, id) endpoint to
    the higher.  Each triangle then has exactly ONE vertex with two
    out-edges (its rank-minimum), so wedges are generated only at that
    apex and closed by a single equi-join against the oriented edge set.

    Scale shape: out-degree under this orientation is O(sqrt(E)) on ANY
    graph — a celebrity hub with 10M followers generates wedges at its
    LOW-degree neighbors, not at itself, which is what keeps the wedge
    stage from exploding on a power-law 100 TB graph.  Three shuffles
    total (degree agg, wedge self-join, closing join), all
    map-side-combinable or AQE-skew-splittable; no driver collect.

    Output: ``(node, n_tri)`` for every node in ≥ 1 triangle; each
    triangle contributes 1 to each of its three corners.  Exact
    integers — value-hashable against a brute 3-way-join oracle.
    """
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.least(src, dst).alias("u"),
                 F.greatest(src, dst).alias("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    # orient low-rank -> high-rank; carry the head's rank key for the
    # wedge-endpoint ordering below
    lo_first = (F.col("du") < F.col("dv")) | \
        ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"))
    o1, o2 = o.alias("o1"), o.alias("o2")
    wedge_ord = (F.col("o1.db") < F.col("o2.db")) | \
        ((F.col("o1.db") == F.col("o2.db"))
         & (F.col("o1.b") < F.col("o2.b")))
    wedges = (o1.join(o2, (F.col("o1.a") == F.col("o2.a")) & wedge_ord)
              .select(F.col("o1.a").alias("apex"),
                      F.col("o1.b").alias("x"),
                      F.col("o2.b").alias("y")))
    close = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(close, ["x", "y"])
    corners = (tri.select(F.col("apex").alias("node"))
               .unionByName(tri.select(F.col("x").alias("node")))
               .unionByName(tri.select(F.col("y").alias("node"))))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_tri"))


def k_core(edges: DataFrame, k: int, src: str = "src",
           dst: str = "dst", max_rounds: int = 200) -> DataFrame:
    """The k-core of an undirected graph — the maximal subgraph where
    every node keeps degree ≥ k — by parallel peeling: each round drops
    ALL nodes of degree < k and their incident edges, until a fixpoint.
    The standard dense-subgraph / spam-farm / community-seed filter
    (Seidman 1983; the synchronous-peel formulation is the textbook
    distributed variant).

    Scale shape: per round, one symmetric-degree groupBy + one
    broadcast-able anti-join of the (small, shrinking) drop set against
    the edge list — edges only ever shrink, and every round's result is
    ``localCheckpoint``-ed to cut lineage (the connected_components
    discipline).  Rounds are data-bounded: each one removes ≥ 1 node or
    terminates, and in practice peeling converges in a handful of
    rounds (degree-k chains peel from BOTH ends simultaneously).  The
    driver-side per-round count is a scalar control decision, same as
    the shortest_paths frontier loop — no data collect.

    Returns ``(node, deg)`` for core members — exact longs; deg is the
    degree WITHIN the core (≥ k by construction).  Empty result = no
    k-core.  Raises after ``max_rounds`` (never silent truncation).
    """
    e = _canon(edges, src, dst).localCheckpoint()
    for _ in range(max_rounds):
        deg = _sym(e).groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        # eager-checkpoint the (small) drop set: it feeds two anti-joins
        # and the emptiness probe — one degree scan per round, not three
        drop = deg.filter(F.col("deg") < k).select("u").localCheckpoint()
        if drop.isEmpty():
            return deg.select(F.col("u").alias("node"), "deg")
        e = (e.join(drop.withColumnRenamed("u", "src"), "src", "left_anti")
             .join(drop.withColumnRenamed("u", "dst"), "dst", "left_anti")
             .select("src", "dst")
             .localCheckpoint())
    raise RuntimeError(f"k_core: no fixpoint in {max_rounds} rounds")


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Newman's degree-assortativity coefficient r of an undirected
    graph — the Pearson correlation of endpoint degrees over the edge
    list (Newman 2002, "Assortative mixing in networks").  r > 0: hubs
    link to hubs (social nets); r < 0: hubs link to leaves (the
    hub-and-spoke shape that makes skew salting necessary).

    Exactness: over the SYMMETRIC directed edge list (each undirected
    edge contributes both directions, the standard convention — making
    Σx = Σy by construction), every moment (M, Σx, Σx², Σxy) is an
    exact long, and r is the same pinned long→double √-chain as
    spearman_corr.  Int64 bound: Σd² ≤ M·d_max² — ANSI raises loudly
    past ~10⁹ edge-ends × 10⁴·⁵ degree.

    Scale shape: one degree groupBy + two (broadcast-able) joins of the
    degree table onto the edge list + one global agg — no windows, no
    driver loop.

    Returns one row ``(m_ends, s_num, d_x, d_y, r)`` (m_ends = 2·|E|;
    r NULL for degree-regular graphs, integer guard).
    """
    e = _canon(edges, src, dst)
    sym = _sym(e)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dy"))
    j = sym.join(du, "u").join(dv, "v")
    agg = j.agg(
        F.count(F.lit(1)).alias("m_ends"),
        F.sum("dx").alias("_sx"), F.sum("dy").alias("_sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("_sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("_syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("_sxy"))
    m = F.col("m_ends")
    s_num = m * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    d_x = m * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    d_y = m * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r = F.when(
        (d_x > 0) & (d_y > 0),
        s_num.cast("double")
        / (F.sqrt(d_x.cast("double")) * F.sqrt(d_y.cast("double"))))
    return agg.select("m_ends", s_num.alias("s_num"), d_x.alias("d_x"),
                      d_y.alias("d_y"), r.alias("r"))


def label_propagation(nodes: DataFrame, edges: DataFrame,
                      rounds: int, id_col: str = "id",
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, made
    deterministic): every node starts with its own id as label; each
    round it adopts the MODE of its neighbors' previous-round labels,
    ties broken by the SMALLEST label.  Fixed round count — synchronous
    LPA need not converge (bipartite graphs oscillate), so the operator
    is defined as "the labeling after R rounds", which is exactly
    value-hashable.

    Community detection distinct from connected components: CC merges
    everything reachable; LPA keeps weakly-linked regions apart because
    a node follows its local MAJORITY, not any single path.

    Scale shape per round: one equi-join (labels onto the symmetric
    edge-end list) + one map-side-combinable (node, label) count + one
    argmax agg — no windows; ``localCheckpoint`` per round cuts the
    lineage (connected_components discipline).  Isolated nodes never
    appear in the edge list and keep their own label via the final
    left join.

    Returns ``(node, label)`` for every node in ``nodes``.
    """
    e = _canon(edges, src, dst)
    sym = _sym(e).localCheckpoint()
    labels = nodes.select(F.col(id_col).alias("node"),
                          F.col(id_col).alias("label")).localCheckpoint()
    for _ in range(rounds):
        nbr = (sym.join(labels.withColumnRenamed("node", "v"), "v")
               .groupBy(F.col("u").alias("node"), "label")
               .agg(F.count(F.lit(1)).alias("c")))
        # argmax (count, then min label): max over struct(c, -label)
        new = (nbr.groupBy("node")
               .agg(F.max(F.struct(F.col("c"),
                                   (-F.col("label")).alias("neg")))
                    .alias("m"))
               .select("node", (-F.col("m.neg")).alias("label")))
        labels = (labels.select("node")
                  .join(new, "node", "left")
                  .join(nodes.select(F.col(id_col).alias("node"),
                                     F.col(id_col).alias("self_label")),
                        "node")
                  .select("node", F.coalesce("label", "self_label")
                          .alias("label"))
                  .localCheckpoint())
    return labels


def jaccard_links(edges: DataFrame, min_common: int = 2,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell &
    Kleinberg 2003): score non-adjacent node pairs by the Jaccard
    similarity of their neighborhoods, |Γ(u) ∩ Γ(v)| / |Γ(u) ∪ Γ(v)| —
    the classic "people you may know" / co-citation candidate
    generator.

    Exact path: wedges are generated AT the shared neighbor (one
    self-join of the symmetric edge-end list with u < v), counted per
    pair, joined to exact degrees, and EXISTING edges are removed by a
    left-anti join (prediction = new links only).  The score double is
    a single n/(da+db−n) bigint division.

    Scale shape: the wedge stage is Σ deg(w)² — the celebrity-hub
    hazard.  Unlike triangle counting there is no orientation trick
    that preserves exactness (a hub's wedges ARE candidate pairs), so
    at fleet scale cap or sample hub wedge centers (the colocation_pairs
    cap/salt recipe) and document the recall cut; ``min_common`` ≥ 2
    keeps the OUTPUT bounded either way.  Gate graphs are hashed k=3
    link graphs (max degree ~2k), where the quadratic term is trivial.

    Returns ``(u, v, n_common, deg_u, deg_v, jaccard)`` with u < v.
    """
    e = _canon(edges, src, dst)
    sym = _sym(e)
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    pairs = (s1.join(s2, (F.col("s1.u") == F.col("s2.u"))
                     & (F.col("s1.v") < F.col("s2.v")))
             .groupBy(F.col("s1.v").alias("u"),
                      F.col("s2.v").alias("v"))
             .agg(F.count(F.lit(1)).alias("n_common"))
             .filter(F.col("n_common") >= min_common))
    # drop pairs already linked (canonical form is (greatest, least) —
    # compare against both orderings of (u, v))
    adj = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    cand = pairs.join(adj, ["u", "v"], "left_anti")
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select("u", F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v"))
    j = cand.join(du, "u").join(dv, "v")
    return j.select(
        "u", "v", "n_common", "deg_u", "deg_v",
        (F.col("n_common").cast("double")
         / (F.col("deg_u") + F.col("deg_v")
            - F.col("n_common")).cast("double")).alias("jaccard"))


def hash_walks(nodes: DataFrame, edges: DataFrame, steps: int,
               salt: str, id_col: str = "id", src: str = "src",
               dst: str = "dst") -> DataFrame:
    """Deterministic graph walks: from every node, ``steps`` hops where
    each hop moves to the out-neighbor minimizing a 60-bit md5 of
    (salt, current node, step index, neighbor) — DeepWalk-style walk
    sampling (Perozzi et al. 2014) made REPRODUCIBLE: the "random"
    choice is a content hash, so reruns, retries, and both engines of
    the oracle gate agree bit-for-bit.  Nodes with no out-edge absorb
    (stay put).

    Directed: walks follow ``src → dst`` as given (callers wanting
    undirected walks pass the symmetric edge list).

    Scale shape per step: one equi-join (frontier onto edges, key =
    current node) + one argmin agg + a left join back for absorbing
    nodes; ``localCheckpoint`` per step.  Hub fan-out is bounded by the
    out-degree (the join is on the walk's CURRENT node, one row per
    (walker, out-edge)); at fleet scale pre-cap out-degree per node
    with the deterministic bottom-k sampler if hubs dominate.

    Returns ``(start, node, n_moves)`` — where each walk ended and how
    many hops actually moved.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    walks = nodes.select(F.col(id_col).alias("start"),
                         F.col(id_col).alias("cur"),
                         F.lit(0).cast("long").alias("n_moves")) \
        .localCheckpoint()
    for i in range(steps):
        h = F.conv(F.substring(F.md5(F.concat_ws(
            "\x1f", F.lit(salt), F.col("cur").cast("string"),
            F.lit(str(i)), F.col("dst").cast("string"))), 1, 15),
            16, 10).cast("long")
        nxt = (walks.join(e, walks.cur == e.src)
               .select("start", h.alias("h"), "dst")
               .groupBy("start")
               .agg(F.min(F.struct("h", "dst")).alias("m"))
               .select("start", F.col("m.dst").alias("nxt")))
        walks = (walks.join(nxt, "start", "left")
                 .select("start",
                         F.coalesce("nxt", "cur").alias("cur"),
                         (F.col("n_moves")
                          + F.col("nxt").isNotNull().cast("long"))
                         .alias("n_moves"))
                 .localCheckpoint())
    return walks.select("start", F.col("cur").alias("node"), "n_moves")


def hits_exact(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**9,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg JACM'99) in EXACT fixed-point
    integer arithmetic — the same determinism contract as
    ``pagerank_exact``: scores are integers in units of ``1/scale`` of
    the L1-normalized mass, every step is integer (fixed op order,
    ``div`` truncation), so results are bit-identical on any
    partitioning / cluster shape, and the oracle can unroll the
    iterations as chained SQL CTEs.

    Per round: auth(v) = Σ_{(u,v)∈E} hub(u) re-normalized to L1 mass
    ``scale`` by one integer division; then hub(u) = Σ_{(u,v)∈E} auth(v)
    normalized the same way.  (Classical HITS normalizes by the L2 norm
    — irrational, so inherently inexact; L1 keeps the SAME ranking and
    eigenvector direction at the fixpoint and admits exact arithmetic.)

    Overflow bound: edges are deduplicated on entry, so a node's raw
    sum Σ hub(u) over its in-edges (each u contributes at most once) is
    ≤ the total L1 mass ``scale``, and the re-scaling product is
    ≤ scale² — degree-independent.  scale ≤ 3·10⁹ keeps scale² < 2⁶³
    (checked); the default 10⁹ has 9× headroom.

    Plan shape per round: two (join + groupBy-sum) passes over the edge
    list plus one broadcast of the 1-row total — no driver collect in
    the loop; ``localCheckpoint`` per round keeps the plan flat.  At
    100 TB the joins shuffle on node id and AQE splits skewed hubs.
    """
    if iters < 1 or scale < 10**3:
        raise ValueError("need iters >= 1 and scale >= 1000")
    if scale * scale >= (1 << 63):
        raise ValueError(f"scale² overflows int64; need scale <= 3e9, "
                         f"got {scale}")
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")

    # distinct: the scale² overflow bound relies on each node
    # contributing to a given neighbor's raw sum at most once
    e = edges.select(src, dst).distinct().localCheckpoint()
    if e.isEmpty():
        raise ValueError("empty edge set")
    base = nodes.select(F.col(node_col).alias("node"))
    hub = base.withColumn("hub", F.lit(scale // n).cast("long")) \
        .localCheckpoint()

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        tot = raw.agg(F.sum(col).alias("_t"))
        return (base.join(raw, "node", "left")
                .crossJoin(F.broadcast(tot))
                .select("node",
                        F.expr(f"({scale} * coalesce({col}, 0L)) div _t")
                        .cast("long").alias(col)))

    auth = None
    for _ in range(iters):
        raw_a = (e.join(hub, e[src] == hub["node"])
                 .select(F.col(dst).alias("node"), "hub")
                 .groupBy("node").agg(F.sum("hub").alias("auth")))
        auth = _norm(raw_a, "auth").localCheckpoint()
        raw_h = (e.join(auth, e[dst] == auth["node"])
                 .select(F.col(src).alias("node"), "auth")
                 .groupBy("node").agg(F.sum("auth").alias("hub")))
        hub = _norm(raw_h, "hub").localCheckpoint()
    return hub.join(auth, "node")


def modularity(edges: DataFrame, labels: DataFrame, *,
               src: str = "src", dst: str = "dst",
               node_col: str = "node",
               label_col: str = "label") -> DataFrame:
    """Per-community Newman modularity decomposition (Newman & Girvan,
    PRE 69, 2004) of a labeling (e.g. label_propagation's output):

        Q = Σ_c [ e_c/m − (d_c/2m)² ]
          = Σ_c (4·m·e_c − d_c²) / (4·m²)

    with e_c the intra-community undirected edge count, d_c the total
    degree in c, m the undirected edge count — every term an exact
    int64 (bound: d_c² < 2^63 ⇔ 2m < ~3·10⁹ within one community),
    so each community's contribution ``q_part`` is ONE pinned double
    division and Σ q_part is Q.

    Shape: canonicalize edges (one distinct), two broadcast-joins of
    the (node, label) table onto edge endpoints, two tiny groupBys —
    the labeling is community-cardinality-small but the label TABLE is
    node-sized, so at fleet scale the label join is the shuffle; it
    reuses the edge partitioning when labels come pre-hashed on node.
    Returns (label, n_nodes, e_intra, d_tot, q_part)."""
    e = _canon(edges, src, dst)
    lab = labels.select(F.col(node_col).alias("_n"),
                        F.col(label_col).alias("_l"))
    m_df = e.groupBy().agg(F.count(F.lit(1)).alias("_m"))
    lu = lab.select(F.col("_n").alias("_nu"), F.col("_l").alias("_lu"))
    lv = lab.select(F.col("_n").alias("_nv"), F.col("_l").alias("_lv"))
    tagged = (e.join(lu, e["src"] == F.col("_nu"))
              .join(lv, e["dst"] == F.col("_nv")))
    intra = (tagged.filter(F.col("_lu") == F.col("_lv"))
             .groupBy(F.col("_lu").alias("label"))
             .agg(F.count(F.lit(1)).alias("e_intra")))
    deg = (_sym(e).join(lab, F.col("u") == F.col("_n"))
           .groupBy(F.col("_l").alias("label"))
           .agg(F.count(F.lit(1)).alias("d_tot")))
    nn = lab.groupBy(F.col("_l").alias("label")).agg(
        F.count(F.lit(1)).alias("n_nodes"))
    out = (nn.join(deg, "label", "left").join(intra, "label", "left")
           .crossJoin(F.broadcast(m_df))
           .select("label", "n_nodes",
                   F.coalesce("d_tot", F.lit(0)).alias("d_tot"),
                   F.coalesce("e_intra", F.lit(0)).alias("e_intra"),
                   F.col("_m").alias("m")))
    q = ((F.lit(4) * F.col("m") * F.col("e_intra")
          - F.col("d_tot") * F.col("d_tot")).cast("double")
         / (F.lit(4) * F.col("m") * F.col("m")).cast("double"))
    return out.select("label", "n_nodes", "e_intra", "d_tot", "m",
                      F.when(F.col("m") > 0, q).alias("q_part"))


def quadrangle_profile(edges: DataFrame, *, src: str = "src",
                       dst: str = "dst") -> DataFrame:
    """4-cycle (quadrangle) census via co-degree combinatorics: every
    unordered pair (u < v) with ``cod`` common neighbors
    closes ``C(cod, 2)`` quadrangles at that diagonal, and each C4 has
    exactly two diagonals, so  #C4 = Σ C(cod, 2) / 2  — exact integer
    arithmetic end to end (chorded cycles counted, the standard
    subgraph census convention).

    Shape: wedges are generated AT THEIR CENTER (one self-join of the
    symmetric adjacency on the center key, u < v ordering halves the
    pair space) then one groupBy(u, v) — cost Σ_w deg(w)², the same
    hub-quadratic profile as triangle counting; at fleet scale cap or
    salt super-hub centers exactly as the DBSCAN candidate stage does.
    Returns the co-degree histogram (cod, n_pairs, contrib) with the
    global ``n_c4`` broadcast onto every row."""
    e = _canon(edges, src, dst)
    s = _sym(e)
    s1 = s.select(F.col("u").alias("_w"), F.col("v").alias("_a"))
    s2 = s.select(F.col("u").alias("_w"), F.col("v").alias("_b"))
    cod = (s1.join(s2, "_w")
           .filter(F.col("_a") < F.col("_b"))
           .groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("cod"))
           .filter(F.col("cod") >= 2))
    hist = (cod.groupBy("cod")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .withColumn("contrib",
                        F.col("n_pairs") * F.expr(
                            "cod * (cod - 1) div 2")))
    tot = hist.groupBy().agg(
        F.expr("CAST(sum(contrib) AS BIGINT) div 2").alias("n_c4"))
    return hist.crossJoin(F.broadcast(tot))


def local_clustering(edges: DataFrame, *, src: str = "src",
                     dst: str = "dst",
                     scale: int = 10**9) -> DataFrame:
    """Per-node local clustering coefficient — exact quantized:
    ``coeff_q = (2·n_tri·scale) // (deg·(deg−1))`` (Watts-Strogatz
    definition; numerator non-negative so truncating/flooring integer
    division agree cross-engine).  Nodes with deg < 2 get coeff_q NULL
    (coefficient undefined), deg-≥2 nodes outside any triangle get 0.

    Reuses ``triangle_counts`` (degree-ordered wedge closure — the
    power-law-safe shape); degrees come from the same canonical
    deduplicated edge set, so the two aggregates are consistent by
    construction.  int64 bound: n_tri·scale ≤ 9·10¹⁸ → n_tri ≤ 4.6·10⁹
    at the default scale (beyond any real per-node triangle count).

    Output: ``(node, deg, n_tri, coeff_q)`` for every node with ≥ 1
    edge.
    """
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.least(src, dst).alias("u"),
                 F.greatest(src, dst).alias("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    tri = triangle_counts(e, src="u", dst="v")
    j = deg.join(tri, "node", "left").select(
        "node", "deg",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"))
    return j.withColumn(
        "coeff_q",
        F.when(F.col("deg") >= 2,
               F.expr(f"(2 * n_tri * CAST({int(scale)} AS BIGINT))"
                      " div (deg * (deg - 1))").cast("long"))
        .otherwise(F.lit(None).cast("long")))


def reciprocity(edges: DataFrame, *, src: str = "src",
                dst: str = "dst", scale: int = 10**9) -> DataFrame:
    """Per-node edge reciprocity of a DIRECTED graph: of a node's
    distinct out-edges, how many have the reverse edge present —
    ``recip_q = (n_recip·scale) // out_deg`` exact (non-negative
    floor-div).  The follower-graph mutuality primitive.

    Scale shape: one distinct projection, one self-join on the
    reversed key pair (equi-join — AQE-skew-splittable on hot hubs),
    two keyed aggregates.  No driver collect.

    Output: ``(node, out_deg, n_recip, recip_q)`` for every node with
    ≥ 1 out-edge.
    """
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = (e.join(rev, ["a", "b"], "leftsemi")
              .groupBy("a").agg(F.count(F.lit(1)).alias("n_recip")))
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("out_deg"))
    j = deg.join(mutual, "a", "left").select(
        F.col("a").alias("node"), "out_deg",
        F.coalesce(F.col("n_recip"), F.lit(0)).cast("long")
        .alias("n_recip"))
    return j.withColumn(
        "recip_q",
        F.expr(f"(n_recip * CAST({int(scale)} AS BIGINT))"
               " div out_deg").cast("long"))


def scc_labels(edges: DataFrame, *, src: str = "src", dst: str = "dst",
               max_peels: int = 50,
               max_prop_rounds: int = 200) -> DataFrame:
    """Strongly connected components of a DIRECTED graph via
    forward-backward min-label peeling (the coloring/FB decomposition
    of Orzan'04 / Hong et al. — public algorithms, re-derived for
    DataFrames).

    Per peel round, over the still-unresolved subgraph:

    1. ``F(v)`` = min node id that REACHES v (forward min-label
       propagation to a true fixpoint);
    2. ``B(v)`` = min node id v REACHES (same, on reversed edges);
    3. every v with ``F(v) = B(v) = m`` is in SCC(m) (m reaches v and
       v reaches m) — resolved and removed.

    The minimum unresolved node's SCC always resolves (nothing smaller
    exists to reach into it), so each peel strictly shrinks the
    residual and the loop terminates in ≤ #SCC rounds — typically a
    handful, since every basin-minimum SCC resolves simultaneously.

    Scale shape: each propagation step is one edge⋈label equi-join +
    one map-side-combinable min-groupBy, localCheckpoint per step to
    cut lineage (the k_core / flow-accumulation fixpoint discipline);
    no driver collect beyond the per-step convergence counts.  Hub
    skew in the label join is AQE-skew-splittable.

    Output: ``(node, scc, scc_size)`` — scc is the component's minimum
    node id.
    """
    e_all = (edges.filter(F.col(src) != F.col(dst))
             .select(F.col(src).alias("s"), F.col(dst).alias("d"))
             .distinct().localCheckpoint())
    nodes = (e_all.select(F.col("s").alias("node"))
             .unionByName(e_all.select(F.col("d").alias("node")))
             .distinct().localCheckpoint())

    def _min_closure(nds: DataFrame, es: DataFrame) -> DataFrame:
        """lab(v) = min over {v} ∪ {lab(u) : u→v}, to fixpoint."""
        lab = nds.select("node", F.col("node").alias("lab"))
        for _ in range(max_prop_rounds):
            prop = (es.join(lab.select(F.col("node").alias("s"),
                                       F.col("lab").alias("in_lab")),
                            "s")
                    .groupBy(F.col("d").alias("node"))
                    .agg(F.min("in_lab").alias("prop_lab")))
            new = (lab.join(prop, "node", "left")
                   .select("node",
                           F.least(F.col("lab"),
                                   F.coalesce(F.col("prop_lab"),
                                              F.col("lab")))
                           .alias("lab"))
                   .localCheckpoint())
            changed = (new.join(lab.select("node",
                                           F.col("lab").alias("old")),
                                "node")
                       .filter(F.col("lab") != F.col("old")).count())
            lab = new
            if changed == 0:
                return lab
        raise RuntimeError(
            f"scc_labels: min-label closure did not converge in "
            f"{max_prop_rounds} rounds")

    resolved = None
    active_nodes, active_edges = nodes, e_all
    for _ in range(max_peels):
        if active_nodes.limit(1).count() == 0:
            break
        fwd = _min_closure(active_nodes, active_edges)
        bwd = _min_closure(
            active_nodes,
            active_edges.select(F.col("d").alias("s"),
                                F.col("s").alias("d")))
        both = (fwd.join(bwd.select("node",
                                    F.col("lab").alias("blab")),
                         "node"))
        res = (both.filter(F.col("lab") == F.col("blab"))
               .select("node", F.col("lab").alias("scc"))
               .localCheckpoint())
        resolved = res if resolved is None else \
            resolved.unionByName(res).localCheckpoint()
        active_nodes = (active_nodes
                        .join(res.select("node"), "node", "left_anti")
                        .localCheckpoint())
        active_edges = (active_edges
                        .join(res.select(F.col("node").alias("s")),
                              "s", "left_anti")
                        .join(res.select(F.col("node").alias("d")),
                              "d", "left_anti")
                        .localCheckpoint())
    else:
        raise RuntimeError(
            f"scc_labels: not resolved within {max_peels} peel rounds")
    if resolved is None:   # empty graph (no non-self-loop edges)
        return nodes.select(
            "node", F.col("node").alias("scc"),
            F.lit(0).cast("long").alias("scc_size")).filter(F.lit(False))
    sizes = resolved.groupBy("scc").agg(
        F.count(F.lit(1)).alias("scc_size"))
    return resolved.join(sizes, "scc").select("node", "scc", "scc_size")


def k_truss(edges: DataFrame, k: int, *, src: str = "src",
            dst: str = "dst", max_rounds: int = 100) -> DataFrame:
    """k-truss decomposition: the maximal subgraph where every edge is
    supported by ≥ k−2 triangles (Cohen 2008, public algorithm) — the
    cohesive-subgraph primitive one step stronger than k-core.

    Synchronous peeling to a TRUE fixpoint (the k_core discipline):
    per round, per-edge triangle support is recomputed on the
    SURVIVING edge set via the degree-ordered wedge-closure join (the
    power-law-safe triangle shape), edges under threshold drop, until
    none do.  localCheckpoint per round cuts lineage; the only driver
    values are the per-round drop counts.

    Output: the k-truss edges ``(u, v, support)`` with their final
    in-truss support (u < v canonical).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    thresh = k - 2
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.least(src, dst).alias("u"),
                 F.greatest(src, dst).alias("v"))
         .distinct().localCheckpoint())

    def _support(es: DataFrame) -> DataFrame:
        deg = (es.select(F.col("u").alias("node"))
               .unionByName(es.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
        du = deg.select(F.col("node").alias("u"),
                        F.col("deg").alias("du"))
        dv = deg.select(F.col("node").alias("v"),
                        F.col("deg").alias("dv"))
        ed = es.join(du, "u").join(dv, "v")
        lo_first = (F.col("du") < F.col("dv")) | \
            ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        o = ed.select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v"))
            .alias("a"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u"))
            .alias("b"),
            F.when(lo_first, F.col("dv")).otherwise(F.col("du"))
            .alias("db"))
        o1, o2 = o.alias("o1"), o.alias("o2")
        wedge_ord = (F.col("o1.db") < F.col("o2.db")) | \
            ((F.col("o1.db") == F.col("o2.db"))
             & (F.col("o1.b") < F.col("o2.b")))
        wedges = (o1.join(o2, (F.col("o1.a") == F.col("o2.a"))
                          & wedge_ord)
                  .select(F.col("o1.a").alias("ta"),
                          F.col("o1.b").alias("tb"),
                          F.col("o2.b").alias("tc")))
        close = o.select(F.col("a").alias("tb"),
                         F.col("b").alias("tc"))
        tri = wedges.join(close, ["tb", "tc"])
        # credit each triangle to its three edges (canonical u<v)
        sides = None
        for x, y in (("ta", "tb"), ("ta", "tc"), ("tb", "tc")):
            s = tri.select(F.least(F.col(x), F.col(y)).alias("u"),
                           F.greatest(F.col(x), F.col(y)).alias("v"))
            sides = s if sides is None else sides.unionByName(s)
        return sides.groupBy("u", "v").agg(
            F.count(F.lit(1)).alias("support"))

    cur = e
    for _ in range(max_rounds):
        sup = _support(cur)
        scored = (cur.join(sup, ["u", "v"], "left")
                  .select("u", "v",
                          F.coalesce(F.col("support"),
                                     F.lit(0)).cast("long")
                          .alias("support"))
                  .localCheckpoint())
        dropped = scored.filter(F.col("support") < thresh).count()
        cur = scored.filter(F.col("support") >= thresh) \
            .select("u", "v").localCheckpoint()
        if dropped == 0:
            return scored.filter(F.col("support") >= thresh)
    raise RuntimeError(f"k_truss: no fixpoint in {max_rounds} rounds")


def boruvka_msf(edges: DataFrame, *, src: str = "src",
                dst: str = "dst", weight: str = "w",
                max_rounds: int = 40) -> DataFrame:
    """Minimum spanning forest via Borůvka's algorithm (1926; THE
    parallel MST shape — every component picks its minimum outgoing
    edge each round, components merge, rounds ≤ log₂ n).

    Weights must give a TOTAL order per edge — ties are broken by
    (w, u, v), so the forest is unique and deterministic even with
    duplicate weights.  Each round: one component-labeled edge
    projection, one per-component min (struct-extreme fold —
    map-side-combinable), a connected-components merge over the
    SELECTED edges' component graph (operators/graph.py
    connected_components — the giant-cluster-safe large/small-star
    rounds), and a label rejoin; localCheckpoint per round.

    Output: the forest edges ``(u, v, w)`` (canonical u < v).
    """
    e = (edges.filter(F.col(src) != F.col(dst))
         .select(F.least(src, dst).alias("u"),
                 F.greatest(src, dst).alias("v"),
                 F.col(weight).cast("long").alias("w"))
         .groupBy("u", "v").agg(F.min("w").alias("w"))
         .localCheckpoint())
    comp = (e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("comp"))
            .localCheckpoint())
    forest = None
    for _ in range(max_rounds):
        cu = comp.select(F.col("node").alias("u"),
                         F.col("comp").alias("cu"))
        cv = comp.select(F.col("node").alias("v"),
                         F.col("comp").alias("cv"))
        ec = (e.join(cu, "u").join(cv, "v")
              .filter(F.col("cu") != F.col("cv")).localCheckpoint())
        if ec.limit(1).count() == 0:
            break
        cand = (ec.select(F.col("cu").alias("c"), "w", "u", "v",
                          "cu", "cv")
                .unionByName(ec.select(F.col("cv").alias("c"), "w",
                                       "u", "v", "cu", "cv")))
        mins = (cand.groupBy("c")
                .agg(F.min(F.struct("w", "u", "v", "cu", "cv"))
                     .alias("m"))
                .select("m.w", "m.u", "m.v", "m.cu", "m.cv"))
        sel = mins.select("u", "v", "w", "cu", "cv").distinct() \
            .localCheckpoint()
        add = sel.select("u", "v", "w")
        forest = add if forest is None else \
            forest.unionByName(add).localCheckpoint()
        cedges = sel.select(F.col("cu").alias("src"),
                            F.col("cv").alias("dst"))
        merged = connected_components(cedges)
        relabel = merged.select(F.col("node").alias("comp"),
                                F.col("component").alias("newc"))
        comp = (comp.join(relabel, "comp", "left")
                .select("node",
                        F.coalesce(F.col("newc"), F.col("comp"))
                        .alias("comp"))
                .localCheckpoint())
    else:
        raise RuntimeError(
            f"boruvka_msf: no fixpoint in {max_rounds} rounds")
    if forest is None:
        return e.filter(F.lit(False)).select("u", "v", "w")
    return forest.groupBy("u", "v").agg(F.min("w").alias("w"))


def landmark_distances(edges: DataFrame, landmarks: DataFrame, *,
                       rounds: int, src: str = "src",
                       dst: str = "dst",
                       lm_col: str = "lm") -> DataFrame:
    """Bounded multi-landmark BFS — ``(lm, node, dist)`` for every node
    within ``rounds`` hops of each landmark over the DIRECTED edge set
    (unweighted; first reach = hop distance).  The substrate of
    landmark-based centrality estimates (harmonic/closeness à la
    Eppstein-Wang): exact distances from a small deterministic
    landmark set stand in for the all-pairs BFS no 10¹²-node graph
    can afford.

    FIXED-round semantics (not run-to-fixpoint): nodes farther than
    ``rounds`` hops stay absent, which makes the operator exactly
    mirrorable as a ``rounds``-deep CTE unroll — the same contract as
    the pagerank/SSSP oracles.  Per round: one frontier×edges join +
    one first-reach anti-join, keyed by (lm, node) — frontier-pruned
    like shortest_paths, localCheckpoint per round to cut lineage.

    All-integer ⇒ partitioning-independent.  Landmark count is the
    cost knob: work ≈ |landmarks| × BFS; skew-safe because each
    frontier row fans out by out-degree only."""
    e = (edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"))
         .localCheckpoint())
    dist = (landmarks.select(F.col(lm_col).alias("lm"))
            .distinct()
            .select("lm", F.col("lm").alias("node"),
                    F.lit(0).cast("long").alias("dist"))
            .localCheckpoint())
    frontier = dist
    for _ in range(rounds):
        cand = (frontier.join(e, frontier["node"] == e["_es"])
                .select("lm", F.col("_ed").alias("node"),
                        (F.col("dist") + 1).alias("_d"))
                .groupBy("lm", "node").agg(F.min("_d").alias("_d")))
        new = (cand.join(dist, ["lm", "node"], "left_anti")
               .select("lm", "node", F.col("_d").alias("dist"))
               .localCheckpoint())
        if new.count() == 0:  # driver control only (early exhaustion)
            break
        dist = dist.unionByName(new).localCheckpoint()
        frontier = new
    return dist


def adamic_adar(edges: DataFrame, min_common: int = 1,
                src: str = "src", dst: str = "dst") -> DataFrame:
    """Adamic-Adar link prediction — score non-adjacent pairs by
    Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg(w)): common neighbors weighted DOWN by
    their degree, so a shared obscure neighbor says more than a shared
    celebrity (Adamic & Adar 2003, "Friends and neighbors on the
    Web").  The degree-aware sibling of jaccard_links.

    Exactness: wedges are generated AT the shared neighbor (u < v),
    each carrying the center's exact long degree; a wedge center has
    ≥ 2 neighbors by construction, so ln(deg) > 0 always and each
    term is ONE pinned long→double ln + divide.  The per-pair sum is
    a PINNED-ORDER fold over the common-neighbor list sorted by
    center id (the entropy_profile discipline — groupBy float sums
    have nondeterministic addend order).

    Scale shape: same as jaccard_links — Σ deg(w)² wedge generation
    (cap or sample hub centers at fleet scale; 1/ln(deg) means the
    dropped hub terms are the SMALLEST contributions, which is what
    makes capping defensible here), one anti-join against existing
    edges, one fold.

    Returns ``(u, v, n_common, aa)`` with u < v, non-adjacent pairs
    only, n_common ≥ ``min_common``.
    """
    e = _canon(edges, src, dst)
    sym = _sym(e)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    cen = sym.join(deg, "u")
    s1, s2 = cen.alias("s1"), cen.alias("s2")
    wedges = (s1.join(s2, (F.col("s1.u") == F.col("s2.u"))
                      & (F.col("s1.v") < F.col("s2.v")))
              .select(F.col("s1.v").alias("u"),
                      F.col("s2.v").alias("v"),
                      F.col("s1.u").alias("w"),
                      F.col("s1.deg").alias("wdeg")))
    term = F.lit(1.0) / F.log(F.col("wdeg").cast("double"))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("w"), term.alias("t"))))
    pairs = (wedges.groupBy("u", "v")
             .agg(F.count(F.lit(1)).alias("n_common"),
                  F.aggregate(arr, F.lit(0.0),
                              lambda acc, s: acc + s["t"]).alias("aa"))
             .filter(F.col("n_common") >= min_common))
    adj = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return pairs.join(adj, ["u", "v"], "left_anti") \
        .select("u", "v", "n_common", "aa")


def rich_club(edges: DataFrame, ks: "tuple[int, ...]" = (2, 3, 4, 6, 8),
              src: str = "src", dst: str = "dst") -> DataFrame:
    """Rich-club coefficient φ(k) — do high-degree nodes link to EACH
    OTHER more densely than chance?  φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1))
    over the subgraph induced by nodes of degree > k (Zhou & Mondragón
    2004; Colizza et al. 2006 for the null-model normalization, which
    callers apply against a degree-preserving rewire).

    Exactness without a per-k pass: every edge's membership in EVERY
    club is determined by min(deg_u, deg_v), and every node's by its
    degree — so ONE degree histogram and ONE min-degree edge histogram
    answer all k thresholds as conditional sums over the TINY collapsed
    tables (rows = distinct degrees, not nodes).  All counts exact
    longs; φ is one pinned divide.

    Scale shape: one symmetric-degree groupBy + one edge join to
    degrees + two histogram groupBys; the k fan-out happens on
    histogram rows only.

    Returns one row per k: ``(k, n_nodes, n_edges, phi)`` — phi NULL
    when the club has < 2 nodes.
    """
    e = _canon(edges, src, dst)
    sym = _sym(e)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    node_hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nc"))
    du = deg.select(F.col("u").alias("_n1"), F.col("deg").alias("d1"))
    dv = deg.select(F.col("u").alias("_n2"), F.col("deg").alias("d2"))
    emin = (e.join(du, e["src"] == du["_n1"])
            .join(dv, e["dst"] == dv["_n2"])
            .select(F.least(F.col("d1"), F.col("d2")).alias("mindeg")))
    edge_hist = emin.groupBy("mindeg").agg(
        F.count(F.lit(1)).alias("ec"))
    ks_df = e.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k long")
    n_k = (ks_df.join(F.broadcast(node_hist),
                      node_hist["deg"] > ks_df["k"], "left")
           .groupBy("k").agg(
               F.coalesce(F.sum("nc"), F.lit(0).cast("long"))
               .alias("n_nodes")))
    e_k = (ks_df.join(F.broadcast(edge_hist),
                      edge_hist["mindeg"] > ks_df["k"], "left")
           .groupBy("k").agg(
               F.coalesce(F.sum("ec"), F.lit(0).cast("long"))
               .alias("n_edges")))
    out = n_k.join(e_k, "k")
    phi = F.when(
        F.col("n_nodes") >= 2,
        (F.lit(2.0) * F.col("n_edges").cast("double"))
        / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double"))
    return out.select("k", "n_nodes", "n_edges", phi.alias("phi"))


def double_sweep_diameter(edges: DataFrame, *, rounds: int,
                          src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """Double-sweep BFS diameter lower bound (Magnien-Latapy-Habib,
    JEA 2009): BFS from a deterministic seed (the minimum node id),
    re-BFS from the farthest node found — the second eccentricity is
    the classic cheap, usually-tight diameter lower bound (exact on
    trees; within a few hops on small-world graphs).  Two BFS
    traversals instead of the |V| an exact diameter needs.

    FIXED-round semantics: both sweeps run exactly ``rounds``
    frontier expansions (the landmark_distances contract), so the
    operator mirrors as a 2×rounds CTE unroll and the result is
    engine-exact even when the true eccentricity exceeds the budget
    (both engines truncate identically; size ``rounds`` above the
    expected diameter).  Ties break to the SMALLEST node id — a total
    order, hash-stable.

    The graph is symmetrized (diameter is an undirected notion).
    Each sweep is the frontier-join BFS (work ≈ |E|·rounds, keyed on
    node); the two argmax picks are one-row driver-side control
    reads — the established centroid/probe pattern.

    Returns one row ``(seed, ecc_seed, peripheral, diameter_lb,
    far_node)``.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1: {rounds}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")) \
        .filter(F.col("_s") != F.col("_d"))
    sym = (e.select("_s", "_d")
           .unionByName(e.select(F.col("_d").alias("_s"),
                                 F.col("_s").alias("_d")))
           .distinct()
           .select(F.col("_s").alias("src"), F.col("_d").alias("dst")))

    def far(dist_df):
        row = (dist_df.orderBy(F.col("dist").desc(),
                               F.col("node").asc())
               .select("node", "dist").first())
        return row.node, row.dist

    seed = sym.agg(F.min("src").alias("m")).first().m
    lm1 = sym.sparkSession.createDataFrame([(seed,)], "lm long")
    d1 = landmark_distances(sym, lm1, rounds=rounds)
    peripheral, ecc_seed = far(d1)
    lm2 = sym.sparkSession.createDataFrame([(peripheral,)], "lm long")
    d2 = landmark_distances(sym, lm2, rounds=rounds)
    agg = (d2.orderBy(F.col("dist").desc(), F.col("node").asc())
           .limit(1)
           .select(F.lit(seed).cast("long").alias("seed"),
                   F.lit(ecc_seed).cast("long").alias("ecc_seed"),
                   F.lit(peripheral).cast("long").alias("peripheral"),
                   F.col("dist").alias("diameter_lb"),
                   F.col("node").alias("far_node")))
    return agg


def conductance(edges: DataFrame, labels: DataFrame, *,
                src: str = "src", dst: str = "dst",
                node_col: str = "node",
                label_col: str = "label") -> DataFrame:
    """Per-community conductance of a labeling — the cut-quality score
    that complements :func:`modularity` (Kannan, Vempala & Vetta 2004):

        φ(c) = cut(c) / min(vol(c), vol(V̄))
             = (d_c − 2·e_c) / min(d_c, 2m − d_c)

    φ → 0 means the community is nearly sealed off (few boundary
    edges), φ → 1 means it leaks everywhere — the standard acceptance
    test for label_propagation / connected-components output before
    using communities as shards or dedup clusters.

    Pure exact-integer derivation from modularity's per-community
    sums (d_c, e_c, 2m all exact longs — same single labeling join),
    one pinned division; φ NULL for a community that owns no edge
    volume or swallows the whole graph (denominator 0).

    Returns ``(label, n_nodes, e_intra, d_tot, m, cut, conductance)``.
    """
    base = modularity(edges, labels, src=src, dst=dst,
                      node_col=node_col, label_col=label_col)
    cut = (F.col("d_tot") - 2 * F.col("e_intra"))
    denom = F.least(F.col("d_tot"), 2 * F.col("m") - F.col("d_tot"))
    return base.select(
        "label", "n_nodes", "e_intra", "d_tot", "m",
        cut.alias("cut"),
        F.when(denom > 0, cut.cast("double") / denom.cast("double"))
        .alias("conductance"))


def maximal_independent_set(edges: DataFrame, *, src: str = "src",
                            dst: str = "dst", salt: str = "mis",
                            max_rounds: int = 200) -> DataFrame:
    """Deterministic Luby maximal independent set (Luby 1986, the
    textbook distributed MIS): each round every live node draws a
    content-hashed priority ``(hash_u60(salt|round, node), node)`` —
    unique by the node tiebreak — and joins the MIS iff it beats every
    live neighbor; winners and their neighborhoods leave the graph.
    The classic symmetry-breaking primitive behind distributed
    coloring, scheduling, and landmark selection — and, here, the
    deterministic replacement for "pick an arbitrary maximal set".

    Determinism: priorities are pure md5 folds of (salt, round, node)
    — no RNG, no partition dependence — so the member set AND the
    round each member enters are engine-reproducible.  The per-round
    winner test is one min-struct fold over neighbor priorities.

    Scale shape: per round, one symmetric join of the (shrinking)
    edge list against the live-priority table + one groupBy; removals
    are anti-joins; every round localCheckpoints (the k_core
    discipline).  Rounds are O(log n) with high probability under the
    hash's uniformity — max_rounds raises loudly, never truncates.
    Isolated live nodes win immediately (NULL neighbor fold), so
    termination is guaranteed: the globally-minimal live priority
    always enters.

    Returns ``(node, round)`` — round is the 0-based entry round.
    Nodes with no incident edge in ``edges`` are not seen; union them
    in as round-0 members upstream if the node universe is wider.
    """
    from .splits import hash_u60

    e = _canon(edges, src, dst).localCheckpoint()
    live = _sym(e).select("u").distinct().localCheckpoint()
    parts = []
    for rnd in range(max_rounds):
        if live.isEmpty():
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            return out
        pr = live.select(
            "u", hash_u60(["u"], salt=f"{salt}|r{rnd}").alias("p"))
        nb = (_sym(e)
              .join(pr.select(F.col("u").alias("v"),
                              F.col("p").alias("pv")), "v")
              .groupBy("u")
              .agg(F.min(F.struct("pv", "v")).alias("_nb")))
        win = (pr.join(nb, "u", "left")
               .filter(F.col("_nb").isNull()
                       | (F.struct("p", "u")
                          < F.struct(F.col("_nb.pv").alias("p"),
                                     F.col("_nb.v").alias("u"))))
               .select("u").localCheckpoint())
        parts.append(win.select(
            F.col("u").alias("node"),
            F.lit(rnd).cast("long").alias("round")))
        gone = (win.unionAll(
            _sym(e).join(win.select(F.col("u").alias("v")), "v")
            .select("u"))
            .distinct().localCheckpoint())
        live = live.join(gone, "u", "left_anti").localCheckpoint()
        e = (e.join(gone.withColumnRenamed("u", "src"), "src",
                    "left_anti")
             .join(gone.withColumnRenamed("u", "dst"), "dst",
                   "left_anti")
             .localCheckpoint())
    raise RuntimeError(
        f"maximal_independent_set: no fixpoint in {max_rounds} rounds")


def bom_explode(edges: DataFrame, *, parent: str = "parent",
                child: str = "child", qty: str = "qty",
                max_rounds: int = 5) -> DataFrame:
    """Weighted transitive closure of a FOREST — the classic
    bill-of-materials parts explosion: for every ancestor→descendant
    pair, the total multiplicity is the PRODUCT of edge quantities
    along the (unique) path, plus its depth.  The textbook recursive
    query, done Spark-side by pointer doubling.

    Shape: ``max_rounds`` doubling rounds (R ← distinct(R ∪ R∘R)),
    so depth up to 2^max_rounds is covered in logarithmically many
    self-joins — each round one equi-join on the closure's frontier
    key and one distinct (duplicate derivations of the same pair
    carry identical qty/depth because forest paths are unique), with
    localCheckpoint cutting lineage (the connected-components
    discipline).  A non-forest input (node with two parents) is a
    data bug: detected in-plan and raised, because then qty would
    depend on derivation order.

    Exactness: qty products and depths are int64 — with edge
    quantities ≤ q and depth ≤ d the product is ≤ q^d; size bounds
    are the caller's contract (raise_error on product overflow is the
    engine's ANSI default).  Completion is self-checking downstream:
    if 2^max_rounds < true depth the closure misses pairs — compare
    against the recursive oracle.

    Returns ``(anc, descendant, total_qty, depth)``.
    """
    e = edges.select(F.col(parent).cast("long").alias("anc"),
                     F.col(child).cast("long").alias("descendant"),
                     F.col(qty).cast("long").alias("total_qty"),
                     F.lit(1).cast("long").alias("depth"))
    # forest check: a child with two parents makes qty path-dependent
    dup = (e.groupBy("descendant")
           .agg(F.count(F.lit(1)).alias("_p"))
           .filter(F.col("_p") > 1))
    # the guard rides total_qty — a detached column would be pruned
    e = (e.join(dup.select("descendant", F.lit(1).alias("_dup")),
                "descendant", "left")
         .select("anc", "descendant",
                 F.when(F.col("_dup").isNotNull(), F.raise_error(F.lit(
                     "bom_explode: node with multiple parents — input "
                     "is not a forest")).cast("long"))
                 .otherwise(F.col("total_qty")).alias("total_qty"),
                 "depth"))
    r = e.localCheckpoint()
    for _ in range(max_rounds):
        a = r.select(F.col("anc").alias("_a"),
                     F.col("descendant").alias("_m"),
                     F.col("total_qty").alias("_q1"),
                     F.col("depth").alias("_d1"))
        b = r.select(F.col("anc").alias("_m"),
                     F.col("descendant").alias("_d"),
                     F.col("total_qty").alias("_q2"),
                     F.col("depth").alias("_d2"))
        comp = (a.join(b, "_m")
                .select(F.col("_a").alias("anc"),
                        F.col("_d").alias("descendant"),
                        (F.col("_q1") * F.col("_q2"))
                        .alias("total_qty"),
                        (F.col("_d1") + F.col("_d2")).alias("depth")))
        r = r.unionAll(comp).distinct().localCheckpoint()
    return r


def wl_colors(edges: DataFrame, *, src: str = "src", dst: str = "dst",
              rounds: int = 2, salt: str = "wl") -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement (the 1-WL /
    naive-vertex-refinement test): color₀ = degree; each round a
    node's color becomes a content hash of (own color, SORTED multiset
    of neighbor colors).  The structural-role fingerprint behind graph
    isomorphism screening, WL graph kernels, and GNN expressiveness
    arguments — two graphs with different final color histograms are
    certainly non-isomorphic (the converse fails: 1-WL cannot separate
    regular graphs of equal degree, e.g. C₆ vs 2×C₃ — documented, and
    pinned in tests).

    Determinism: the multiset is a numerically-sorted join of 60-bit
    md5 colors; the new color is the splits-module hash_u60 spelling
    of (salt|round, own, joined) — reproducible in any engine,
    collision probability ≈ n²/2⁶¹ per round.

    Scale shape: per round one symmetric join of the edge list against
    the (node, color) table + one groupBy — the standard iterated
    sparse matrix-vector shape; ``rounds`` is a literal (1-WL
    stabilizes within diameter rounds; 2 suffice for role features).

    Returns ``(node, color)`` — the final-round color.
    """
    e = _canon(edges, src, dst)
    sym = _sym(e).localCheckpoint()
    col = (sym.groupBy("u")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    for k in range(rounds):
        nb = (sym.join(col.select(F.col("u").alias("v"),
                                  F.col("c").alias("cv")), "v")
              .groupBy("u")
              .agg(F.array_join(
                  F.transform(
                      F.array_sort(F.collect_list("cv")),
                      lambda x: x.cast("string")), ",").alias("_nb")))
        col = (col.join(nb, "u")
               .select("u", F.conv(F.substring(F.md5(F.concat_ws(
                   "\x1f", F.lit(f"{salt}{k}"),
                   F.col("c").cast("string"), F.col("_nb"))), 1, 15),
                   16, 10).cast("long").alias("c"))
               .localCheckpoint())
    return col.select(F.col("u").alias("node"),
                      F.col("c").alias("color"))


def louvain_move(edges: DataFrame, labels: DataFrame, *,
                 src: str = "src", dst: str = "dst",
                 node_col: str = "node",
                 label_col: str = "label") -> DataFrame:
    """One synchronized Louvain local-move round (Blondel et al. 2008
    phase 1, the synchronous variant distributed implementations use):
    every node evaluates — against the CURRENT partition, so all moves
    are decided simultaneously — the modularity gain of relocating to
    each neighbouring community B from its community A:

        ΔQ·4m² ∝ gain_num(B) = 2m·(k_iB − k_iA) − k_i·(d_B − d_A + k_i)

    with k_iB = edges from i into B, k_i = deg(i), d_C = Σ degrees in
    C (including i's in A), m = undirected edge count — every term
    exact int64 (bound: m·max_deg < 2⁶², far beyond any real graph's
    2m < 10¹² at fleet scale).  The node moves to the argmax community
    when its gain is strictly positive; ties break to the smallest
    label.  Synchronous rounds may oscillate on bipartite-ish
    structure (same caveat as synchronous LPA), so the operator is
    defined as exactly one round — iterate with fresh labels to
    converge.

    Scale shape: degree + community aggregates, one (node,
    neighbour-label) map-side-combinable count over the symmetric edge
    list, equi-joins on node/label, one argmax groupBy — no windows
    over fact-sized partitions, no driver loop.

    Returns ``(node, old_label, new_label, moved, gain_num)`` —
    gain_num is the best candidate's scaled gain (NULL when the node
    has no neighbouring community to consider).
    """
    e = _canon(edges, src, dst)
    sym = _sym(e)
    lab = labels.select(F.col(node_col).alias("node"),
                        F.col(label_col).alias("old_label"))
    m_df = e.groupBy().agg(F.count(F.lit(1)).alias("_m"))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("_ki"))
    sigt = (lab.join(deg, "node", "left")
            .groupBy(F.col("old_label").alias("_lbl"))
            .agg(F.sum(F.coalesce(F.col("_ki"), F.lit(0)))
                 .alias("_dtot")))
    kic = (sym.join(lab.select(F.col("node").alias("v"),
                               F.col("old_label").alias("nbr_label")),
                    "v")
           .groupBy(F.col("u").alias("node"), "nbr_label")
           .agg(F.count(F.lit(1)).alias("_kic")))
    own = (kic.join(lab, "node")
           .filter(F.col("nbr_label") == F.col("old_label"))
           .select("node", F.col("_kic").alias("_kia")))
    cand = (kic.join(lab, "node")
            .filter(F.col("nbr_label") != F.col("old_label"))
            .join(own, "node", "left")
            .join(deg, "node")
            .join(sigt.select(F.col("_lbl").alias("nbr_label"),
                              F.col("_dtot").alias("_db")), "nbr_label")
            .join(sigt.select(F.col("_lbl").alias("old_label"),
                              F.col("_dtot").alias("_da")), "old_label")
            .crossJoin(F.broadcast(m_df)))
    gain = (2 * F.col("_m")
            * (F.col("_kic") - F.coalesce(F.col("_kia"), F.lit(0)))
            - F.col("_ki")
            * (F.col("_db") - F.col("_da") + F.col("_ki")))
    best = (cand.select("node", "old_label", "nbr_label",
                        gain.alias("_g"))
            .groupBy("node", "old_label")
            .agg(F.max(F.struct(F.col("_g"),
                                (-F.col("nbr_label")).alias("_neg")))
                 .alias("_b")))
    picked = best.select(
        "node", "old_label",
        F.col("_b._g").alias("gain_num"),
        (-F.col("_b._neg")).alias("_cand_label"))
    return (lab.join(picked.drop("old_label"), "node", "left")
            .select(
                "node", "old_label",
                F.when(F.col("gain_num") > 0, F.col("_cand_label"))
                .otherwise(F.col("old_label")).alias("new_label"),
                F.coalesce(F.col("gain_num") > 0, F.lit(False))
                .alias("moved"),
                "gain_num"))
