"""Density-based spatial clustering (DBSCAN) as a grid self-join plus
connected components — distributed, no pairwise O(n²) stage.

The reference engine has no clustering operator; this is graft-mandated
spatial-analytics surface (SURVEY §2.4 neighborhood family): hotspot
extraction, stay-region mining, and near-duplicate *location* grouping
all reduce to DBSCAN over cell-indexed points.

Algorithm (Ester et al., KDD'96, re-derived for DataFrames):

1. **Candidate pairs** — bin points into ``eps``-sized grid cells
   (floor division via ``pmod``, exact for any sign); the probe side
   explodes each point to its 3×3 cell block and equi-joins the plain
   side on the cell key.  Every neighbor pair (dist² ≤ eps²) appears in
   exactly one cell-pair, directed both ways.  This is the ONLY place
   the corpus shuffles: one hash exchange per side on the cell key; the
   refine predicate is integer arithmetic in the join condition.
2. **Cores** — neighbor counts per point (map-side combinable);
   ``count + 1 ≥ min_pts`` (the point itself is in its own
   ε-neighborhood, the KDD'96 convention).
3. **Clusters** — connected components (operators/graph.py
   large-star/small-star — min-agg + join rounds, giant-cluster-safe)
   over the core↔core edge subset; a core with no core neighbor is its
   own singleton cluster.  Labels are the component MINIMUM core id —
   deterministic under any partitioning.
4. **Borders** — non-core points with ≥1 core neighbor join the MINIMUM
   label among their core neighbors (the deterministic tie-break for
   the KDD'96 "first scanner wins" order-dependence; documented
   deviation, value-hash-stable).  Everything else is noise
   (label NULL).

Coordinates must be exact integers (quantize upstream — the gate uses
the feature lattice's own milli-degree integers) so the distance
predicate, counts, and labels are bit-identical on any engine: the
DuckDB oracle recomputes all four stages from the same integers,
including the recursive-CTE component closure.

At 100 TB: stage 1 is the standard spatial-grid join (cell key scatter
×9 on one side only, id+coords payload); stages 2-4 are keyed
aggregations and the CC loop is O(log² n) rounds of min-agg + join on
the (much smaller) core-edge set.  Skewed cells (urban hotspots) are
handled by the built-in hot-cell salt (``salt=S`` on
grid_neighbor_pairs/dbscan: occupancy pre-count → id-hash shard the hot
cells' base rows, replicate only their probe rows ×S) — MEASURED on a
power-law corpus in bench.py dbscan_skew_micro: max/median task 24x →
1.8x, 2.5x wall vs the plain cell join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.tilemath import floor_div as _floor_div
from .graph import connected_components

__all__ = ["dbscan", "geofence_flag", "grid_knn_join", "kmeans_integer",
           "grid_neighbor_pairs", "grid_radius_join",
           "centroid_silhouette", "huff_shares", "proximity_graph",
           "rand_index", "nmi_clusterings"]


def _ring_offsets():
    """The 3x3 neighbor-offset array literal shared by every grid
    candidate stage in this module."""
    return F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])


def grid_neighbor_pairs(
    pts: DataFrame,
    eps: int,
    *,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    salt: "int | None" = None,
    salt_threshold: int = 4096,
) -> DataFrame:
    """Directed neighbor pairs ``(i, j)`` with
    ``0 < (xi−xj)² + (yi−yj)² ≤ eps²`` — each unordered pair emitted in
    both directions (what neighbor counting and border attachment
    consume).  Integer coordinates; one shuffle per side on the
    eps-grid cell key; ×9 row expansion on the probe side only.

    ``salt=S`` is the hotspot escape hatch (urban cores, venue
    clusters): a cell holding h points does ~h² refine work in ONE
    reduce task under the plain cell join.  Hot cells (occupancy ≥
    ``salt_threshold``, found by one map-side-combinable pre-count and
    collected driver-side — ≤ n/threshold cells by construction, the
    same explicit-hot-key shape as joins.salted_join) get their BASE
    rows split into S id-hash shards and their probe rows replicated
    ×S at MAP time; COLD cells pay nothing, so total probe expansion
    stays ~×9 (AQE's post-hoc skew split would instead re-read the
    skewed shuffle files).  Output is IDENTICAL (tested); measured A/B
    in bench.py dbscan_skew_micro."""
    if eps <= 0:
        raise ValueError("eps must be a positive integer")
    if salt is not None and salt < 2:
        raise ValueError("salt must be >= 2 when given")
    eps2 = eps * eps
    hot: list[str] = []
    if salt:
        occ = (pts.groupBy(_floor_div(F.col(x), eps).alias("_cx"),
                           _floor_div(F.col(y), eps).alias("_cy"))
               .count().filter(F.col("count") >= salt_threshold))
        hot = [f"{r['_cx']},{r['_cy']}" for r in occ.collect()]

    def _cellkey(cx, cy):
        return F.concat_ws(",", cx.cast("string"), cy.cast("string"))

    base = pts.select(
        F.col(id_col).alias("i"),
        F.col(x).alias("_xi"), F.col(y).alias("_yi"),
        _floor_div(F.col(x), eps).alias("_cx"),
        _floor_div(F.col(y), eps).alias("_cy"))
    if hot:
        base = base.withColumn(
            "_si",
            F.when(_cellkey(F.col("_cx"), F.col("_cy")).isin(hot),
                   F.pmod(F.xxhash64(F.col("i")), F.lit(salt)))
            .otherwise(F.lit(0)))
    offs = _ring_offsets()
    probe = (pts.select(
        F.col(id_col).alias("j"),
        F.col(x).alias("_xj"), F.col(y).alias("_yj"),
        _floor_div(F.col(x), eps).alias("_jcx"),
        _floor_div(F.col(y), eps).alias("_jcy"),
        F.explode(offs).alias("_o"))
        .select("j", "_xj", "_yj",
                (F.col("_jcx") + F.col("_o.dx")).alias("_px"),
                (F.col("_jcy") + F.col("_o.dy")).alias("_py")))
    if hot:
        probe = probe.withColumn(
            "_sj",
            F.explode(
                F.when(_cellkey(F.col("_px"), F.col("_py")).isin(hot),
                       F.sequence(F.lit(0), F.lit(salt - 1)))
                .otherwise(F.array(F.lit(0)))))
    d2 = ((F.col("_xi") - F.col("_xj")) * (F.col("_xi") - F.col("_xj"))
          + (F.col("_yi") - F.col("_yj")) * (F.col("_yi") - F.col("_yj")))
    cond = ((base["_cx"] == probe["_px"])
            & (base["_cy"] == probe["_py"])
            & (F.col("i") != F.col("j"))
            & (d2 <= F.lit(eps2)))
    if hot:
        cond = cond & (base["_si"] == probe["_sj"])
    return base.join(probe, cond).select("i", "j")


def blocked_pairs(pts: DataFrame, cell: int, *,
                  id_col: str = "i", x: str = "x", y: str = "y",
                  extra_cols: "tuple[str, ...]" = (),
                  directed: bool = False) -> DataFrame:
    """Near-pairs with exact squared distance ``d2 <= cell²`` via the
    shared eps-grid block join (the ONE implementation behind
    knox_pairs, ripley_k, and lof_scores): base keeps its own cell,
    the probe side explodes ×9 into its neighborhood, so every
    qualifying pair matches on EXACTLY one (base-cell == probe-cell)
    key — counted once, no post-hoc dedup.  Coordinates are cast to
    long up front (32-bit inputs would silently wrap in d²).  One
    shuffle per side on the cell key; pair volume is output-bounded.

    ``directed=False`` (default) emits each unordered pair once as
    ``i < j``; ``directed=True`` emits both directions (``i ≠ j``) —
    what per-point neighborhood consumers (kNN, LOF) need.
    ``extra_cols`` ride along as ``l_<c>`` / ``r_<c>``.
    Returns ``(i, j, d2, *extras)``.
    """
    from ..geo.tilemath import floor_div

    base = pts.select(
        F.col(id_col).alias("i"),
        F.col(x).cast("long").alias("_xi"),
        F.col(y).cast("long").alias("_yi"),
        *[F.col(c).alias(f"l_{c}") for c in extra_cols],
        floor_div(F.col(x).cast("long"), cell).alias("_cx"),
        floor_div(F.col(y).cast("long"), cell).alias("_cy"))
    probe = (pts.select(
        F.col(id_col).alias("j"),
        F.col(x).cast("long").alias("_xj"),
        F.col(y).cast("long").alias("_yj"),
        *[F.col(c).alias(f"r_{c}") for c in extra_cols],
        floor_div(F.col(x).cast("long"), cell).alias("_jcx"),
        floor_div(F.col(y).cast("long"), cell).alias("_jcy"))
        .select("j", "_xj", "_yj", "_jcx", "_jcy",
                *[f"r_{c}" for c in extra_cols],
                F.explode(_ring_offsets()).alias("_o"))
        .select("j", "_xj", "_yj",
                *[f"r_{c}" for c in extra_cols],
                (F.col("_jcx") + F.col("_o.dx")).alias("_px"),
                (F.col("_jcy") + F.col("_o.dy")).alias("_py")))
    d2 = ((F.col("_xi") - F.col("_xj")) * (F.col("_xi") - F.col("_xj"))
          + (F.col("_yi") - F.col("_yj")) * (F.col("_yi") - F.col("_yj")))
    ids = (F.col("i") != F.col("j")) if directed \
        else (F.col("i") < F.col("j"))
    return (base.join(probe,
                      (base["_cx"] == probe["_px"])
                      & (base["_cy"] == probe["_py"])
                      & ids & (d2 <= F.lit(cell * cell)))
            .select("i", "j", d2.alias("d2"),
                    *[f"l_{c}" for c in extra_cols],
                    *[f"r_{c}" for c in extra_cols]))


def dbscan(
    pts: DataFrame,
    eps: int,
    min_pts: int,
    *,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    max_rounds: int = 50,
    salt: "int | None" = None,
    salt_threshold: int = 4096,
) -> DataFrame:
    """``(id, label, role)`` per input point: role ∈ core/border/noise,
    label = cluster id (minimum member core id; NULL for noise).
    ``salt``/``salt_threshold`` pass through to the candidate stage for
    hotspot-skewed corpora (grid_neighbor_pairs docstring)."""
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    pairs = grid_neighbor_pairs(pts, eps, id_col=id_col, x=x, y=y,
                                salt=salt, salt_threshold=salt_threshold)
    pairs = pairs.localCheckpoint()  # consumed 3× below; cut the 9× join
    cnt = pairs.groupBy("i").agg(F.count(F.lit(1)).alias("_nn"))
    ids = pts.select(F.col(id_col).alias("i"))
    cores = (ids.join(cnt, "i", "left")
             .filter(F.coalesce(F.col("_nn"), F.lit(0)) + 1 >= min_pts)
             .select("i"))

    core_edges = (pairs
                  .join(cores.withColumnRenamed("i", "j"), "j", "semi")
                  .join(cores, "i", "semi"))
    cc = connected_components(core_edges, src="i", dst="j",
                              max_rounds=max_rounds)
    core_labels = (cores.join(cc.withColumnRenamed("node", "i"), "i", "left")
                   .select("i", F.coalesce("component", F.col("i"))
                           .alias("label")))

    borders = (pairs
               .join(ids.join(cores, "i", "anti"), "i", "semi")
               .join(core_labels.withColumnRenamed("i", "j"), "j")
               .groupBy("i")
               .agg(F.min("label").alias("label")))

    out_core = core_labels.withColumn("role", F.lit("core"))
    out_border = borders.withColumn("role", F.lit("border"))
    out_noise = (ids.join(cores, "i", "anti")
                 .join(borders.select("i"), "i", "anti")
                 .select("i", F.lit(None).cast("long").alias("label"),
                         F.lit("noise").alias("role")))
    return (out_core.unionByName(out_border).unionByName(out_noise)
            .withColumnRenamed("i", id_col))


def grid_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    radius: int,
    *,
    query_id: str = "query_id",
    corpus_id: str = "point_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Radius-bounded kNN JOIN — for EVERY query point, the k nearest
    corpus points within ``radius`` (spatial enrichment: nearest-N POIs
    per event; the set form of map-matching's nearest-1).  Queries with
    fewer than k in-range neighbors return what exists; beyond-radius
    neighbors are out of contract (bounded search is what makes the
    join one cell pass instead of a ring-expansion loop per point).

    Exact: integer d² refine, (d², corpus_id) rank tie-break — fully
    value-hashable.  Shape: cell size = radius ⇒ the query's 3×3 ring
    covers the radius ball; ONE equi-join on the cell key (query side
    exploded ×9 carrying ids+coords only), then a per-query window.
    Returns (query_id, rank, corpus_id, d2).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if radius < 1:
        raise ValueError("radius must be a positive integer")
    r2 = radius * radius
    offs = _ring_offsets()
    q = (queries.select(
        F.col(query_id).alias("qid"),
        F.col(x).cast("long").alias("qx"),
        F.col(y).cast("long").alias("qy"),
        F.explode(offs).alias("_o"))
        .select("qid", "qx", "qy",
                (_floor_div(F.col("qx"), radius)
                 + F.col("_o.dx")).alias("qcx"),
                (_floor_div(F.col("qy"), radius)
                 + F.col("_o.dy")).alias("qcy")))
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(x).cast("long").alias("cx"),
        F.col(y).cast("long").alias("cy"),
        _floor_div(F.col(x), radius).alias("ccx"),
        _floor_div(F.col(y), radius).alias("ccy"))
    d2 = ((F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx"))
          + (F.col("qy") - F.col("cy")) * (F.col("qy") - F.col("cy")))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(),
                                          F.col("cid").asc())
    return (q.join(c, (q["qcx"] == c["ccx"]) & (q["qcy"] == c["ccy"]))
            .select("qid", "cid", d2.alias("d2"))
            .filter(F.col("d2") <= F.lit(r2))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias(query_id), "rank",
                    F.col("cid").alias(corpus_id), "d2"))


def grid_radius_join(
    queries: DataFrame,
    corpus: DataFrame,
    radius: int,
    *,
    query_id: str = "query_id",
    corpus_id: str = "point_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Planar radius join — EVERY corpus point within ``radius`` of each
    query point, exact-integer refine (the unbounded-k sibling of
    grid_knn_join; the value-hashable counterpart of the geodesic
    operators/radius.py radius_join, whose haversine refine is libm trig
    and therefore pytest-differential by the geo/geom.py rule).

    Shape: cell size = radius ⇒ the query's 3×3 ring covers the radius
    ball; the QUERY side explodes ×9 onto cell keys (ids+coords only),
    ONE equi-join on the cell key — zero corpus shuffle beyond the cell
    hash exchange — then an integer d² filter.  Returns
    (query_id, point_id, d2)."""
    if radius < 1:
        raise ValueError("radius must be a positive integer")
    r2 = radius * radius
    offs = _ring_offsets()
    q = (queries.select(
        F.col(query_id).alias("qid"),
        F.col(x).cast("long").alias("qx"),
        F.col(y).cast("long").alias("qy"),
        F.explode(offs).alias("_o"))
        .select("qid", "qx", "qy",
                (_floor_div(F.col("qx"), radius)
                 + F.col("_o.dx")).alias("qcx"),
                (_floor_div(F.col("qy"), radius)
                 + F.col("_o.dy")).alias("qcy")))
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(x).cast("long").alias("cx"),
        F.col(y).cast("long").alias("cy"),
        _floor_div(F.col(x), radius).alias("ccx"),
        _floor_div(F.col(y), radius).alias("ccy"))
    d2 = ((F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx"))
          + (F.col("qy") - F.col("cy")) * (F.col("qy") - F.col("cy")))
    return (q.join(c, (q["qcx"] == c["ccx"]) & (q["qcy"] == c["ccy"]))
            .select(F.col("qid").alias(query_id),
                    F.col("cid").alias(corpus_id), d2.alias("d2"))
            .filter(F.col("d2") <= F.lit(r2)))


def geofence_flag(
    points: DataFrame,
    zones: DataFrame,
    radius: int,
    *,
    point_id: str = "point_id",
    zone_id: str = "zone_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Geofence screening — every point flagged with whether ANY zone
    center lies within ``radius`` (privacy scrubbing near sensitive
    sites, restricted-area exclusion): ``(point_id, in_fence,
    nearest_zone, d2)`` where nearest_zone/d2 are NULL outside.

    The negative-join shape: same one-pass cell candidates as
    grid_knn_join (zone side exploded ×9 — zones are the SMALL side),
    then a left join + min-struct pick, so "no zone in range" is a NULL
    from the join, never a second scan.  All-integer refine ⇒
    value-hashable both ways (flag and nearest)."""
    if radius < 1:
        raise ValueError("radius must be a positive integer")
    r2 = radius * radius
    offs = _ring_offsets()
    z = (zones.select(
        F.col(zone_id).alias("zid"),
        F.col(x).cast("long").alias("zx"),
        F.col(y).cast("long").alias("zy"),
        F.explode(offs).alias("_o"))
        .select("zid", "zx", "zy",
                (_floor_div(F.col("zx"), radius)
                 + F.col("_o.dx")).alias("zcx"),
                (_floor_div(F.col("zy"), radius)
                 + F.col("_o.dy")).alias("zcy")))
    p = points.select(
        F.col(point_id).alias("pid"),
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
        _floor_div(F.col(x), radius).alias("pcx"),
        _floor_div(F.col(y), radius).alias("pcy"))
    d2 = ((F.col("px") - F.col("zx")) * (F.col("px") - F.col("zx"))
          + (F.col("py") - F.col("zy")) * (F.col("py") - F.col("zy")))
    hits = (p.join(z, (p["pcx"] == z["zcx"]) & (p["pcy"] == z["zcy"]))
            .select("pid", "zid", d2.alias("d2"))
            .filter(F.col("d2") <= F.lit(r2))
            .groupBy("pid")
            .agg(F.min(F.struct(F.col("d2"), F.col("zid"))).alias("_b")))
    return (points.select(F.col(point_id).alias("pid"))
            .join(hits, "pid", "left")
            .select(F.col("pid").alias(point_id),
                    F.col("_b").isNotNull().alias("in_fence"),
                    F.col("_b.zid").alias("nearest_zone"),
                    F.col("_b.d2").alias("d2")))


def kmeans_integer(df: DataFrame, x_col: str, y_col: str, *,
                   k: int, iters: int,
                   salt: str = "kmeans-v1") -> DataFrame:
    """Lloyd k-means over integer planar coordinates with EXACT integer
    arithmetic end-to-end — the deterministic, value-hashable sibling of
    the float codebook trainer (operators/similarity.py
    train_centroids; that one owns the high-dim ANN path).

    Determinism contract (same results on any cluster shape / engine):

    - seeds: the k distinct coordinates with the smallest
      ``u60(salt, x, y)`` content hash ((x, y) as the tie-break) —
      seeded-random-without-randomness, the splits.py discipline;
    - assignment: argmin of integer d² with cent_id as the tie-break,
      folded into ONE exact long ``min(d2 * k + cent_id)`` (d² < 2^57/k
      checked by the caller's coordinate range; here ≤ ~2^38 for
      micro-degree grids);
    - update: per-cluster floor-div of exact coordinate sums (empty
      clusters keep their previous centroid);
    - a FIXED iteration count, so an unrolled-SQL oracle replays it.

    Scale shape: per iteration, assignment is ZERO-shuffle (the k
    centroids are collected driver-side — k×2 longs — and inlined as a
    literal least-chain, the broadcast-literal pattern), followed by ONE
    map-side-combinable groupBy of k groups.  The corpus never moves.

    Returns ``(cent_id, cx, cy, n_members)`` for the final iteration.
    """
    if k <= 0 or iters < 0:
        raise ValueError("need k > 0 and iters >= 0")
    from .splits import hash_u60

    # iters+2 actions reuse pts: checkpoint once so the upstream
    # lineage (scan, walk windows, ...) is not re-executed per round
    # (the pagerank_exact discipline)
    pts = df.select(F.col(x_col).cast("long").alias("_kx"),
                    F.col(y_col).cast("long").alias("_ky")) \
        .localCheckpoint()
    seeds = (pts.distinct()
             .withColumn("_h", hash_u60(["_kx", "_ky"], salt))
             .orderBy("_h", "_kx", "_ky")
             .limit(k)
             .collect())
    if len(seeds) < k:
        raise ValueError(f"fewer than k={k} distinct points")
    cents = [(i, r["_kx"], r["_ky"]) for i, r in enumerate(seeds)]

    def assign_col(cs):
        keys = [((F.col("_kx") - F.lit(cx)) * (F.col("_kx") - F.lit(cx))
                 + (F.col("_ky") - F.lit(cy)) * (F.col("_ky") - F.lit(cy)))
                * F.lit(k) + F.lit(cid)
                for cid, cx, cy in cs]
        best = keys[0] if len(keys) == 1 else F.least(*keys)
        return F.pmod(best, F.lit(k)).cast("int")

    stats = None
    for _ in range(iters):
        stats = (pts.withColumn("_cid", assign_col(cents))
                 .groupBy("_cid")
                 .agg(F.sum("_kx").alias("_sx"),
                      F.sum("_ky").alias("_sy"),
                      F.count(F.lit(1)).alias("_n"))
                 .collect())
        got = {r["_cid"]: r for r in stats}
        new = []
        for cid, cx, cy in cents:
            r = got.get(cid)
            if r is None:                      # empty cluster: keep
                new.append((cid, cx, cy))
            else:
                sx, sy, n = r["_sx"], r["_sy"], r["_n"]
                new.append((cid, (sx - sx % n) // n, (sy - sy % n) // n))
        cents = new

    final = (pts.withColumn("_cid", assign_col(cents))
             .groupBy("_cid")
             .agg(F.count(F.lit(1)).alias("n_members")))
    cdf = df.sparkSession.createDataFrame(
        cents, "cent_id int, cx long, cy long")
    return (cdf.join(final, cdf["cent_id"] == final["_cid"], "left")
            .select("cent_id", "cx", "cy",
                    F.coalesce("n_members", F.lit(0)).alias("n_members")))


def region_dissolve(pts: DataFrame, cell: int, min_pts: int,
                    x_col: str = "x", y_col: str = "y",
                    pack: int = 1 << 20) -> DataFrame:
    """Dissolve hot grid cells into contiguous REGIONS — the raster
    analog of polygon dissolve: cells holding ≥ ``min_pts`` points are
    kept, 8-neighborhood (queen) adjacency connects them, and each
    connected blob becomes one region row.

    Pipeline: one groupBy(cell) occupancy count → explode(×8) +
    equi-join for adjacency (the morans_i contiguity shape — never a
    spatial theta join) → ``connected_components`` (large-star/small-
    star, giant-region-safe) over the hot-cell graph → one groupBy per
    region.  Isolated hot cells are unioned back as 1-cell regions.

    Cell ids pack as ``cx * pack + cy``; caller guarantees
    ``0 ≤ cy < pack`` (raise-checked in-plan).  Returns
    ``(region, n_cells, n_pts, min_cx, min_cy, max_cx, max_cy)`` with
    ``region`` = the minimum packed cell id of the blob.
    """
    if min_pts < 1 or cell <= 0:
        raise ValueError("need min_pts >= 1 and cell > 0")
    cx = _floor_div(F.col(x_col).cast("long"), cell)
    cy = _floor_div(F.col(y_col).cast("long"), cell)
    occ = (pts.select(cx.alias("cx"), cy.alias("cy"))
           .groupBy("cx", "cy")
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") >= min_pts))
    bad = (F.col("cy") < 0) | (F.col("cy") >= pack)
    occ = occ.withColumn(
        "id",
        F.when(bad, F.raise_error(F.concat(
            F.lit(f"region_dissolve: cy out of [0, {pack}): "),
            F.col("cy").cast("string"))).cast("long"))
        .otherwise(F.col("cx") * pack + F.col("cy"))).localCheckpoint()

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    nbr = F.explode(F.array(*[
        F.struct((F.col("cx") + dx).alias("nx"),
                 (F.col("cy") + dy).alias("ny"))
        for dx, dy in offs])).alias("o")
    probes = occ.select("id", nbr).select(
        "id", F.col("o.nx").alias("cx"), F.col("o.ny").alias("cy"))
    edges = (probes.join(occ.select("cx", "cy",
                                    F.col("id").alias("dst")),
                         ["cx", "cy"])
             .select(F.col("id").alias("src"), "dst")
             .filter(F.col("src") < F.col("dst")))

    comp = connected_components(edges)
    lab = (occ.join(comp, occ["id"] == comp["node"], "left")
           .select("cx", "cy", "n",
                   F.coalesce("component", "id").alias("region")))
    return (lab.groupBy("region")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("n").alias("n_pts"),
                 F.min("cx").alias("min_cx"), F.min("cy").alias("min_cy"),
                 F.max("cx").alias("max_cx"), F.max("cy").alias("max_cy")))


def lof_scores(pts: DataFrame, k: int, radius: int, *,
               id_col: str = "i", x: str = "x", y: str = "y",
               scale: int = 10 ** 15) -> DataFrame:
    """Local Outlier Factor — the density-based anomaly score: LOF(p) =
    mean(lrd of p's k neighbors) / lrd(p), where lrd is the inverse
    mean reachability.  LOF ≈ 1 inside uniform density, ≫ 1 for points
    whose neighborhood is much denser than they are — the standard
    "local" outlier detector that a global z-score can't replicate.

    Contract deviations, both documented and deterministic: (1) the
    metric is the SQUARED integer distance (a monotone transform —
    neighbor sets and ranks are identical; the score scale differs
    from textbook LOF); (2) the search is radius-bounded like
    grid_knn_join (points with no in-radius neighbor are absent;
    k-distance ties truncate by (d², id) row_number, not the
    tie-inclusive set).

    Exactness: every sum is exact int64 — reachability reach²(p←o) =
    max(kdist²(o), d²(p,o)) is an integer, and the neighbor lrd sum is
    carried as the FLOOR-DIV scaled reciprocal ``n_o·scale // S_o``
    (exact integer division in both engines), so no float ever enters
    an unordered aggregation; ``lof`` is one pinned double chain
    S_p · R_p / n_p² / scale.  Degenerate zero-reach neighborhoods
    (≥ k+1 coincident points) yield NULL lof rather than a silent ∞.

    Scale shape: LOF's inherent 3-hop dataflow — (1) ONE ×9-probe
    grid join at cell = radius + per-point window for the kNN set,
    (2) kdist² joined back on the NEIGHBOR key, (3) reach sums and
    reciprocal sums as two map-side-combinable groupBys on the point
    key.  All shuffles hash point/neighbor ids; candidate volume is
    output-bounded by the radius ball, never n².

    Reference: Breunig et al. (SIGMOD 2000, "LOF: Identifying
    Density-Based Local Outliers"); the exact-integer carry is this
    engine's.

    Returns ``(i, n_k, kdist2, sum_reach2, sum_recip, lof)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if radius < 1:
        raise ValueError("radius must be a positive integer")
    from pyspark.sql import Window

    w = Window.partitionBy("i").orderBy(F.col("d2").asc(),
                                        F.col("j").asc())
    knn = (blocked_pairs(pts, radius, id_col=id_col, x=x, y=y,
                         directed=True)
           .withColumn("_r", F.row_number().over(w))
           .filter(F.col("_r") <= k)
           .select("i", "j", "d2"))
    kd = knn.groupBy("i").agg(
        F.max("d2").alias("kdist2"),
        F.count(F.lit(1)).alias("n_k"))
    reach = (knn.join(kd.select(F.col("i").alias("j"),
                                F.col("kdist2").alias("_kdj")), "j")
             .select("i", F.greatest(F.col("_kdj"), F.col("d2"))
                     .alias("_reach2")))
    per = reach.groupBy("i").agg(F.sum("_reach2").alias("sum_reach2"))
    stat = kd.join(per, "i")
    nbr = stat.select(F.col("i").alias("j"),
                      F.col("n_k").alias("_nj"),
                      F.col("sum_reach2").alias("_sj"))
    rj = (knn.join(nbr, "j")
          .select("i",
                  F.when(F.col("_sj") > 0,
                         F.expr(f"(_nj * CAST({scale} AS BIGINT))"
                                " div _sj")).alias("_rj"),
                  F.when(F.col("_sj") <= 0, 1).otherwise(0).alias("_z")))
    ri = rj.groupBy("i").agg(F.sum("_rj").alias("_sumr"),
                             F.max("_z").alias("_anyz"))
    lof = F.when(
        (F.col("sum_reach2") > 0) & (F.col("_anyz") == 0),
        F.col("sum_reach2").cast("double") * F.col("_sumr").cast("double")
        / (F.col("n_k") * F.col("n_k")).cast("double")
        / F.lit(float(scale)))
    return (stat.join(ri, "i")
            .select("i", "n_k", "kdist2", "sum_reach2",
                    F.when(F.col("_anyz") == 1, F.lit(None).cast("long"))
                    .otherwise(F.col("_sumr")).alias("sum_recip"),
                    lof.alias("lof")))


def label_suppress(labels: DataFrame, radius: int, *,
                   id_col: str = "i", x: str = "x", y: str = "y",
                   prio_col: str = "prio",
                   max_rounds: int = 64) -> DataFrame:
    """Greedy collision-free label placement — the label set a tile
    renderer actually draws: process labels in strictly increasing
    ``prio`` order (smaller = more important, an exact TOTAL order —
    ties within ``radius`` raise in-plan, never a silent engine-
    dependent pick) and KEEP a label iff no already-kept label lies
    within ``radius``.  This sequential greedy is exactly maximal-
    independent-set by fixed priority on the proximity graph
    (collision-resolution in mapbox-gl's placement pass; the
    rank-greedy MIS formulation is the textbook distributed variant),
    computed here WITHOUT the sequence as a synchronous fixpoint:

    round: an undecided label whose higher-priority neighbors are all
    SUPPRESSED becomes KEPT; one with ANY kept higher-priority
    neighbor becomes SUPPRESSED.  The minimum-priority undecided label
    always decides, so every round makes progress; rounds are bounded
    by the longest suppression chain (dense cliques settle in 2).
    Raises after ``max_rounds`` — never silent truncation.

    Scale shape: candidate pairs come from the shared eps-grid block
    join (``blocked_pairs`` — one shuffle per side, ×9 probe
    expansion, hot-cell salt available upstream); per round ONE join
    of the shrinking edge set against the status table + one groupBy,
    both ``localCheckpoint``-ed (the k_core discipline).  The
    quadratic pair space is never materialized.

    Returns the input columns plus ``kept`` (boolean).
    """
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    ids = labels.select(
        F.col(id_col).alias("id"),
        F.col(prio_col).cast("long").alias("_p"))
    pr = blocked_pairs(
        labels.select(F.col(id_col).alias("_lid"),
                      F.col(x).alias("_lx"), F.col(y).alias("_ly"),
                      F.col(prio_col).cast("long").alias("_lp")),
        cell=radius, id_col="_lid", x="_lx", y="_ly",
        extra_cols=("_lp",), directed=False)
    tie = F.when(
        F.col("l__lp") == F.col("r__lp"),
        F.raise_error(F.concat(
            F.lit("label_suppress: prio ties within radius at ids "),
            F.col("i").cast("string"), F.lit("/"),
            F.col("j").cast("string"))).cast("long"))
    # directed edge suppressor a -> target b (prio_a < prio_b)
    e = (pr.select(
        F.when(F.col("l__lp") < F.col("r__lp"), F.col("i"))
        .otherwise(tie.otherwise(F.col("j"))).alias("a"),
        F.when(F.col("l__lp") < F.col("r__lp"), F.col("j"))
        .otherwise(F.col("i")).alias("b"))
        .localCheckpoint())

    # st: 0 undecided, 1 kept, -1 suppressed
    st = ids.select("id", F.lit(0).alias("st")).localCheckpoint()
    for _ in range(max_rounds):
        if st.filter(F.col("st") == 0).isEmpty():
            out = labels.join(
                st.select(F.col("id").alias(id_col),
                          (F.col("st") == 1).alias("kept")),
                id_col)
            return out.select(*labels.columns, "kept")
        sa = st.select(F.col("id").alias("a"), F.col("st").alias("_sa"))
        ag = (e.join(sa, "a")
              .groupBy("b")
              .agg(F.max((F.col("_sa") == 1).cast("int")).alias("_ak"),
                   F.max((F.col("_sa") == 0).cast("int")).alias("_au")))
        st = (st.join(ag, st["id"] == ag["b"], "left")
              .select(
                  "id",
                  F.when(F.col("st") != 0, F.col("st"))
                  .when(F.coalesce(F.col("_ak"), F.lit(0)) == 1,
                        F.lit(-1))
                  .when(F.coalesce(F.col("_au"), F.lit(0)) == 0,
                        F.lit(1))
                  .otherwise(F.lit(0)).alias("st"))
              .localCheckpoint())
        # edges from suppressed suppressors or to decided targets are dead
        alive_a = st.filter(F.col("st") >= 0).select(
            F.col("id").alias("a"))
        und_b = st.filter(F.col("st") == 0).select(
            F.col("id").alias("b"))
        e = e.join(alive_a, "a", "left_semi") \
             .join(und_b, "b", "left_semi").localCheckpoint()
    raise RuntimeError(
        f"label_suppress: no fixpoint in {max_rounds} rounds")


def voronoi_assign(pts: DataFrame, seeds: DataFrame, *,
                   x: str = "x", y: str = "y",
                   sx: str = "sx", sy: str = "sy",
                   seed_id: str = "seed_id",
                   coord_bound: int = 1 << 20) -> DataFrame:
    """Discrete Voronoi allocation — assign every point to its nearest
    seed site (facility, hub, depot) by EXACT integer squared distance
    with the deterministic ``d²·k + seed_id`` argmin fold (the kmeans
    assignment tie-break: equal distances resolve to the smallest seed
    id on any engine).

    ``seeds`` is a driver-side CONTROL TABLE (the kmeans-centroid
    convention): it is collected (must be small — facilities, hubs;
    raise past 1024) and unrolled into a zero-shuffle ``least`` chain,
    so the point table never exchanges and never joins — assignment
    runs entirely inside whole-stage codegen.  ``seed_id`` must be a
    dense 0..k-1 rank (validated driver-side).

    Exactness bound: |coords| ≤ ``coord_bound`` (default 2²⁰,
    raise-checked in-plan) keeps d² ≤ 8·2⁴⁰ and the fold key
    d²·k + id < 2⁶³ for k ≤ 1024.

    Returns the input columns plus ``(seed_id, d2)``.
    """
    rows = seeds.select(seed_id, sx, sy).collect()
    k = len(rows)
    if k == 0:
        raise ValueError("voronoi_assign: empty seed table")
    if k > 1024:
        raise ValueError(f"voronoi_assign: {k} seeds exceed the "
                         "broadcast-literal bound (1024)")
    got = sorted(r[seed_id] for r in rows)
    if got != list(range(k)):
        raise ValueError("voronoi_assign: seed_id must be a dense "
                         f"0..{k - 1} rank, got {got[:5]}...")
    for r in rows:
        if abs(r[sx]) > coord_bound or abs(r[sy]) > coord_bound:
            raise ValueError("voronoi_assign: seed coords exceed "
                             f"bound {coord_bound}")
    bad = ((F.abs(F.col(x).cast("long")) > coord_bound)
           | (F.abs(F.col(y).cast("long")) > coord_bound))
    px = F.when(bad, F.raise_error(F.lit(
        f"voronoi_assign: point coords exceed bound {coord_bound}"))
        .cast("long")).otherwise(F.col(x).cast("long"))
    py = F.col(y).cast("long")

    def _key(r):
        d2 = ((px - F.lit(int(r[sx]))) * (px - F.lit(int(r[sx])))
              + (py - F.lit(int(r[sy]))) * (py - F.lit(int(r[sy]))))
        return d2 * k + int(r[seed_id])

    keys = [_key(r) for r in rows]
    key = keys[0] if k == 1 else F.least(*keys)
    return (pts.withColumn("_vkey", key)
            .select(*pts.columns,
                    F.pmod(F.col("_vkey"), F.lit(k)).cast("int")
                    .alias("seed_id"),
                    (F.col("_vkey") - F.pmod(F.col("_vkey"), F.lit(k)))
                    .cast("long").alias("_num"))
            .withColumn("d2", (F.col("_num") / k).cast("long"))
            .drop("_num"))


def centroid_silhouette(df: DataFrame, x_col: str, y_col: str,
                        cents: "list[tuple[int, int, int]]",
                        scale: int = 1_000_000) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the
    cluster-quality score for a :func:`kmeans_integer` fit without the
    all-pairs cost of the classic silhouette (Hruschka et al. 2004):
    per point, a = dist to OWN centroid, b = dist to the nearest OTHER
    centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; report per-cluster
    means (s ≈ 1 compact & separated, s < 0 likely mis-assigned).

    ``cents`` is the literal centroid list ``[(cent_id, cx, cy)…]``
    (k × 2 longs — the same driver-side broadcast-literal pattern as
    the k-means assignment itself), so scoring is ZERO-shuffle per
    point: one literal least-chain for the assignment fold
    (min d²·k + cid), one null-skipping least for b, then ONE
    map-side-combinable groupBy of k groups.

    Exactness: distances are µ-quantized (floor(√d²·``scale``), the
    clark_evans discipline), s is the exact floor-division
    ``(b−a)·scale div max(a,b)`` (pmod floor form — correct for the
    negative numerator), so ``sum_s_scaled`` is an exact long;
    ``mean_s`` is the one pinned double.

    Returns ``(cent_id, n_members, sum_s_scaled, mean_s)``.
    """
    k = len(cents)
    if k < 2:
        raise ValueError("need >= 2 centroids for silhouette")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")

    def d2(cx, cy):
        return ((x - F.lit(cx)) * (x - F.lit(cx))
                + (y - F.lit(cy)) * (y - F.lit(cy)))

    keys = [d2(cx, cy) * F.lit(k) + F.lit(cid) for cid, cx, cy in cents]
    mk = F.least(*keys)
    cid = F.pmod(mk, F.lit(k)).cast("int")
    from ..geo.tilemath import floor_div_big

    d2_own = floor_div_big(mk, F.lit(k).cast("long"))
    pts = df.select(cid.alias("_cid"), d2_own.alias("_d2o"),
                    *[d2(cx, cy).alias(f"_d2_{cid_}")
                      for cid_, cx, cy in cents])
    others = F.least(*[
        F.when(F.col("_cid") != F.lit(cid_), F.col(f"_d2_{cid_}"))
        for cid_, _, _ in cents])
    micro = lambda c: F.floor(  # noqa: E731
        F.sqrt(c.cast("double")) * F.lit(float(scale))).cast("long")
    ab = pts.select("_cid", micro(F.col("_d2o")).alias("_a"),
                    micro(others).alias("_b"))
    t = (F.col("_b") - F.col("_a")) * F.lit(scale)
    den = F.greatest(F.col("_a"), F.col("_b"))
    from ..geo.tilemath import floor_div_big as _fdb

    # t = (b-a)*scale can pass 2^53 (micro-quantized distances x 1e6):
    # the double-divide floor is off by one there — exact decimal form
    s = F.when(den > 0, _fdb(t, den)).otherwise(F.lit(0))
    return (ab.select("_cid", s.alias("_s"))
            .groupBy(F.col("_cid").alias("cent_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                 F.sum("_s").cast("long").alias("sum_s_scaled"))
            .withColumn(
                "mean_s",
                F.col("sum_s_scaled").cast("double")
                / (F.col("n_members").cast("double")
                   * F.lit(float(scale)))))


def huff_shares(consumers: DataFrame, stores: DataFrame, *,
                consumer_id: str = "consumer_id",
                store_id: str = "store_id", attract_col: str = "attract",
                x: str = "x", y: str = "y", beta2: int = 1,
                scale: int = 1_000_000_000,
                max_stores: int = 1024) -> DataFrame:
    """Huff gravity model of market capture (Huff 1964): consumer i
    patronizes store j with probability
    P_ij = A_j/d_ij^(2β) / Σ_k A_k/d_ik^(2β) — the trade-area /
    catchment allocator behind store-siting and demand attribution.

    QUANTIZED-EXACT contract (the engine-wide alternative to float
    shares): each utility is the floor-div integer
    ``t_ij = A_j·scale div (d²_ij)^β2``, and the share is the exact
    rational ``t_ij / Σ_k t_ik`` — numerator/denominator longs, so
    the gate value-hashes; the quantization error is ≤ 1/scale per
    term (documented, same discipline as loglog_fit's µ-nats).
    Consumers co-located with a store (d² = 0) give that store the
    whole budget (t = A·scale, others still counted) — pinned by the
    ``d² ≥ 1`` clamp.

    Scale shape: the store table must be SMALL (≤ ``max_stores``,
    validated loudly) — it broadcasts, and each consumer row fans out
    ×|stores| in one map-side join; one groupBy(consumer) for the
    denominator.  For store fleets past the bound, pre-prune by cell
    (grid_knn_join) — utilities beyond a few cells are noise.

    Returns ``(consumer_id, store_id, d2, t, share_den, share)``.
    """
    if beta2 < 1:
        raise ValueError("beta2 must be >= 1")
    n_stores = stores.count()
    if n_stores > max_stores:
        raise ValueError(
            f"{n_stores} stores exceeds the broadcast bound "
            f"{max_stores}; pre-prune by cell (grid_knn_join) first")
    c = consumers.select(F.col(consumer_id).alias("cid"),
                         F.col(x).cast("long").alias("cx"),
                         F.col(y).cast("long").alias("cy"))
    s = stores.select(F.col(store_id).alias("sid"),
                      F.col(attract_col).cast("long").alias("a"),
                      F.col(x).cast("long").alias("sx"),
                      F.col(y).cast("long").alias("sy"))
    d2 = ((F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
          + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy")))
    pairs = c.crossJoin(F.broadcast(s)).withColumn(
        "d2", F.greatest(d2, F.lit(1)))
    dpow = F.col("d2")
    for _ in range(beta2 - 1):
        dpow = dpow * F.col("d2")
    from ..geo.tilemath import floor_div_big as _fdb2

    num = F.col("a") * F.lit(scale)
    t = _fdb2(num, dpow)
    from pyspark.sql import Window

    pairs = pairs.withColumn("t", t)
    den = Window.partitionBy("cid")
    return (pairs
            .withColumn("share_den", F.sum("t").over(den))
            .select(F.col("cid").alias(consumer_id),
                    F.col("sid").alias(store_id), "d2", "t",
                    "share_den",
                    F.when(F.col("share_den") > 0,
                           F.col("t").cast("double")
                           / F.col("share_den").cast("double"))
                    .alias("share")))


def proximity_graph(pts: DataFrame, rmax: int, *,
                    id_col: str = "i", x_col: str = "x",
                    y_col: str = "y") -> DataFrame:
    """Gabriel graph and relative-neighbourhood graph (RNG) edge flags
    over every point pair within ``rmax`` — the classic
    proximity-graph ladder (Gabriel & Sokal 1969; Toussaint, Pattern
    Recognition 1980) between the Delaunay triangulation and the MST:

        MST ⊆ RNG ⊆ Gabriel ⊆ Delaunay.

    An edge (a, b) is *Gabriel* iff no third point lies strictly inside
    the circle with diameter ab — by Thales, iff no witness w has
    d²(a,w) + d²(w,b) < d²(a,b).  It is *RNG* iff no witness lies
    strictly inside the lune — max(d²(a,w), d²(w,b)) < d²(a,b).  Both
    predicates are pure integer comparisons on squared distances, so
    the flags value-hash.  The Gabriel witness condition implies the
    RNG one, hence ``is_rng ⇒ is_gabriel`` row-wise.  Coincident pairs
    (d² = 0) admit no strict witness and stay connected in both graphs.

    ``rmax`` bounds the edge set (pairs beyond rmax are not emitted —
    the standard windowed construction; a witness for ANY candidate
    pair satisfies d(a,w) < d(a,b) ≤ rmax, so the bound loses no
    witness, only long edges).

    Scale shape: TWO eps-grid radius joins (the dbscan candidate
    discipline — query side ×9 on cell keys, ids+coords only) plus
    three id equi-joins and one max-flag groupBy.  The witness stage is
    |pairs| × cell-occupancy — the same quadratic hot-cell hazard
    colocation_pairs documents: cap dense cells or shrink rmax before
    running city-scale point dumps through it.

    Returns ``(i, j, d2, is_gabriel, is_rng)`` with i < j.
    """
    p = (pts.select(F.col(id_col).cast("long").alias("i"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"))
         .localCheckpoint(eager=False))
    c = p.select(F.col("i").alias("j"), "x", "y")
    pr = (grid_radius_join(p, c, rmax, query_id="i", corpus_id="j")
          .filter(F.col("i") < F.col("j")))
    pa = p.select("i", F.col("x").alias("ax"), F.col("y").alias("ay"))
    pb = p.select(F.col("i").alias("j"), F.col("x").alias("bx"),
                  F.col("y").alias("by"))
    pairs = (pr.join(pa, "i").join(pb, "j")
             .withColumn("pk", F.concat_ws("_", "i", "j"))
             .localCheckpoint(eager=False))
    q = pairs.select("pk", F.col("ax").alias("x"), F.col("ay").alias("y"))
    wit = (grid_radius_join(q, p.select(F.col("i").alias("w"), "x", "y"),
                            rmax, query_id="pk", corpus_id="w")
           .withColumnRenamed("d2", "d2aw"))
    wc = p.select(F.col("i").alias("w"), F.col("x").alias("wx"),
                  F.col("y").alias("wy"))
    d2bw = ((F.col("bx") - F.col("wx")) * (F.col("bx") - F.col("wx"))
            + (F.col("by") - F.col("wy")) * (F.col("by") - F.col("wy")))
    j = (wit.join(wc, "w")
         .join(pairs.select("pk", "i", "j", "bx", "by",
                            F.col("d2").alias("d2ab")), "pk")
         .filter((F.col("w") != F.col("i")) & (F.col("w") != F.col("j")))
         .withColumn("d2bw", d2bw))
    flags = (j.groupBy("pk").agg(
        F.max((F.col("d2aw") + F.col("d2bw")) < F.col("d2ab"))
        .alias("_hg"),
        F.max(F.greatest(F.col("d2aw"), F.col("d2bw")) < F.col("d2ab"))
        .alias("_hr")))
    return (pairs.join(flags, "pk", "left")
            .select("i", "j", "d2",
                    (~F.coalesce(F.col("_hg"), F.lit(False)))
                    .alias("is_gabriel"),
                    (~F.coalesce(F.col("_hr"), F.lit(False)))
                    .alias("is_rng")))


def rand_index(df: DataFrame, a_col: str, b_col: str, *,
               id_col: str = "id") -> DataFrame:
    """Rand index + Adjusted Rand Index between two labelings of the
    same items (Rand 1971; Hubert & Arabie 1985) — the external
    clustering-quality comparison: do dbscan and kmeans_integer agree?
    did today's dedup_clusters drift from yesterday's?  RI counts
    pair-level agreement; ARI rescales so random labelings score ~0
    and identical ones 1.

    Exact pair-count arithmetic — no pair join: from the contingency
    cells n_ij and marginals a_i, b_j,

        RI  = [C(n,2) + 2·Σ C(n_ij,2) − Σ C(a_i,2) − Σ C(b_j,2)]
              / C(n,2)                      (an exact integer ratio)
        ARI = (S − Pa·Pb/C) / ((Pa+Pb)/2 − Pa·Pb/C)

    with S = Σ C(n_ij,2), Pa = Σ C(a_i,2), Pb = Σ C(b_j,2),
    C = C(n,2) — every term an exact int64 (C(x,2) via the even
    product x(x−1) halved by integer div), ARI one pinned double
    chain.  Int64 bound: n ≤ 3·10⁹ (C(n,2) < 2⁶²; ANSI-loud).

    Shape: one groupBy on the label pair + two marginal collapses —
    the contingency table is |A|·|B| rows, never the item pairs.

    Returns ONE row ``(n, s_pairs, pa_pairs, pb_pairs, rand, ari)``
    — ARI NULL for the degenerate all-singletons-vs-all-singletons
    case (denominator 0).
    """
    from ..geo.tilemath import floor_div
    clean = df.filter(F.col(a_col).isNotNull()
                      & F.col(b_col).isNotNull())
    cell = clean.groupBy(F.col(a_col).alias("_a"),
                         F.col(b_col).alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))

    def comb2(c):
        return floor_div(c * (c - 1), 2)

    s = cell.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum(comb2(F.col("_n"))).cast("long").alias("s_pairs"))
    pa = (cell.groupBy("_a").agg(F.sum("_n").alias("_m"))
          .agg(F.sum(comb2(F.col("_m"))).cast("long")
               .alias("pa_pairs")))
    pb = (cell.groupBy("_b").agg(F.sum("_n").alias("_m"))
          .agg(F.sum(comb2(F.col("_m"))).cast("long")
               .alias("pb_pairs")))
    j = s.crossJoin(F.broadcast(pa)).crossJoin(F.broadcast(pb))
    ctot = comb2(F.col("n"))
    rand = F.when(
        ctot > 0,
        (ctot + 2 * F.col("s_pairs") - F.col("pa_pairs")
         - F.col("pb_pairs")).cast("double") / ctot.cast("double"))
    e = (F.col("pa_pairs").cast("double")
         * F.col("pb_pairs").cast("double")) / ctot.cast("double")
    den = ((F.col("pa_pairs") + F.col("pb_pairs")).cast("double")
           / F.lit(2.0) - e)
    ari = F.when((ctot > 0) & (den != 0.0),
                 (F.col("s_pairs").cast("double") - e) / den)
    return j.select("n", "s_pairs", "pa_pairs", "pb_pairs",
                    rand.alias("rand"), ari.alias("ari"))


def nmi_clusterings(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Normalized mutual information between two labelings of the same
    items (Strehl & Ghosh 2002) — :func:`rand_index`'s
    information-theoretic twin: NMI = I(A;B)/√(H(A)·H(B)) ∈ [0,1],
    insensitive to label names and (unlike raw MI) comparable across
    clusterings of different granularity.  Report BOTH ARI and NMI —
    they disagree exactly when cluster size skew matters.

    Unlike ``discrete_mi`` (pinned enumerated categories), labels here
    are arbitrary values: cell and marginal counts are exact longs
    from one label-pair groupBy, and the three Σ·ln chains ride
    PINNED label-ordered in-row folds (cells by (a,b), marginals by
    label) — every ln argument an exact integer ratio.

    Shape: contingency-sized, never item-pair-sized — one groupBy +
    two collapses.  Returns ONE row ``(n, mi_nats, h_a, h_b, nmi)``
    — NMI NULL when either labeling is constant (H = 0).
    """
    from pyspark.sql import Window
    clean = df.filter(F.col(a_col).isNotNull()
                      & F.col(b_col).isNotNull())
    cell = clean.groupBy(F.col(a_col).alias("_a"),
                         F.col(b_col).alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_k"))
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    wg = Window.partitionBy()
    full = cell.select(
        "_a", "_b", "_k",
        F.sum("_k").over(wa).alias("_ra"),
        F.sum("_k").over(wb).alias("_cb"),
        F.sum("_k").over(wg).alias("_n"))
    nd = F.col("_n").cast("double")
    mi_t = ((F.col("_k").cast("double") / nd)
            * F.log((F.col("_k") * F.col("_n")).cast("double")
                    / (F.col("_ra") * F.col("_cb")).cast("double")))
    mi_arr = F.sort_array(F.collect_list(F.struct(
        F.col("_a"), F.col("_b"), mi_t.alias("t"))))
    ha_t = ((F.col("_m").cast("double") / F.col("_n").cast("double"))
            * F.log(F.col("_n").cast("double")
                    / F.col("_m").cast("double")))
    ma = (cell.groupBy("_a").agg(F.sum("_k").alias("_m"))
          .crossJoin(F.broadcast(
              cell.agg(F.sum("_k").alias("_n")))))
    mb = (cell.groupBy("_b").agg(F.sum("_k").alias("_m"))
          .crossJoin(F.broadcast(
              cell.agg(F.sum("_k").alias("_n")))))
    ha = ma.agg(F.aggregate(
        F.sort_array(F.collect_list(F.struct(
            F.col("_a"), ha_t.alias("t")))),
        F.lit(0.0), lambda acc, s_: acc + s_["t"]).alias("h_a"))
    hb = mb.agg(F.aggregate(
        F.sort_array(F.collect_list(F.struct(
            F.col("_b"), ha_t.alias("t")))),
        F.lit(0.0), lambda acc, s_: acc + s_["t"]).alias("h_b"))
    mi = full.agg(
        F.max("_n").cast("long").alias("n"),
        F.aggregate(mi_arr, F.lit(0.0),
                    lambda acc, s_: acc + s_["t"]).alias("mi_nats"))
    out = mi.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    nmi = F.when(
        (F.col("h_a") > 0.0) & (F.col("h_b") > 0.0),
        F.col("mi_nats") / F.sqrt(F.col("h_a") * F.col("h_b")))
    return out.select("n", "mi_nats", "h_a", "h_b", nmi.alias("nmi"))


def ransac_line(pts: DataFrame, group_cols: "list[str]", *,
                id_col: str = "id", x_col: str = "x", y_col: str = "y",
                eps: int = 100, n_cand: int = 16,
                salt: str = "ransac") -> DataFrame:
    """Deterministic RANSAC line fit (Fischler-Bolles 1981, with the
    random sampler replaced by content hashes): ``n_cand`` candidate
    lines through hash-chosen point pairs, each scored by its exact
    inlier count — a point is an inlier iff its perpendicular
    distance is ≤ eps, tested CROSS-MULTIPLIED as cross² ≤ eps²·len²
    in pure int64 — and the winner is (max inliers, min candidate
    index).  The robust model-fit primitive beside theil_sen_slope
    (which aggregates all pairs; RANSAC survives > 50% gross
    outliers).

    Determinism: pair choices are hash_u60-style md5 draws of
    (salt, group, candidate, a|b) mod n over the (x, y, id)-ranked
    point table — cluster-shape-independent; degenerate draws (same
    rank or coincident coords) drop on BOTH engines.  Groups with no
    valid candidate vanish.

    Shape: one rank window, two rank joins to materialize ≤ n_cand
    lines per group (a tiny, broadcast-able table), one lines×points
    equi-join on the group key for scoring, one min-struct pick.

    Returns ``(*group_cols, n, cand, x1, y1, x2, y2, n_inliers,
    inlier_frac)``.
    """
    from pyspark.sql import Column, Window  # noqa: F401

    if eps < 0 or n_cand < 1:
        raise ValueError("need eps >= 0 and n_cand >= 1")
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy("_x", "_y", "_id")
    wg = Window.partitionBy(*g)
    p = (pts.select(*g, F.col(id_col).alias("_id"),
                    F.col(x_col).cast("long").alias("_x"),
                    F.col(y_col).cast("long").alias("_y"))
         .select(*g, "_x", "_y",
                 F.row_number().over(w).cast("long").alias("_rk"),
                 F.count(F.lit(1)).over(wg).alias("_n")))

    def draw(tag: str) -> Column:
        parts = [F.lit(f"{salt}|{tag}")] + \
            [F.col(c).cast("string") for c in g] + \
            [F.col("_c").cast("string")]
        u = F.conv(F.substring(F.md5(F.concat_ws("\x1f", *parts)),
                               1, 15), 16, 10).cast("long")
        return F.pmod(u, F.col("_n")) + 1

    heads = (p.groupBy(*g).agg(F.max("_n").alias("_n"))
             .select(*g, "_n",
                     F.explode(F.sequence(
                         F.lit(0), F.lit(n_cand - 1))).alias("_c"))
             .select(*g, "_n", "_c", draw("a").alias("_ra"),
                     draw("b").alias("_rb"))
             .filter(F.col("_ra") != F.col("_rb")))
    a = p.select(*g, F.col("_rk").alias("_ra"),
                 F.col("_x").alias("x1"), F.col("_y").alias("y1"))
    b = p.select(*g, F.col("_rk").alias("_rb"),
                 F.col("_x").alias("x2"), F.col("_y").alias("y2"))
    lines = (heads.join(a, [*g, "_ra"]).join(b, [*g, "_rb"])
             .filter((F.col("x1") != F.col("x2"))
                     | (F.col("y1") != F.col("y2")))
             .select(*g, "_n", "_c", "x1", "y1", "x2", "y2"))
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    cross = ((F.col("_x") - F.col("x1")) * dy
             - (F.col("_y") - F.col("y1")) * dx)
    inlier = (cross * cross
              <= F.lit(eps * eps) * (dx * dx + dy * dy))
    scored = (F.broadcast(lines).join(p.select(*g, "_x", "_y"), g)
              .groupBy(*g, "_n", "_c", "x1", "y1", "x2", "y2")
              .agg(F.sum(inlier.cast("long")).alias("n_inliers")))
    best = (scored.groupBy(*g)
            .agg(F.min(F.struct(
                (-F.col("n_inliers")).alias("ni"), F.col("_c"),
                F.col("_n"), F.col("x1"), F.col("y1"),
                F.col("x2"), F.col("y2"))).alias("_b")))
    return best.select(
        *g, F.col("_b._n").alias("n"), F.col("_b._c").alias("cand"),
        F.col("_b.x1").alias("x1"), F.col("_b.y1").alias("y1"),
        F.col("_b.x2").alias("x2"), F.col("_b.y2").alias("y2"),
        (-F.col("_b.ni")).alias("n_inliers"),
        ((-F.col("_b.ni")).cast("double")
         / F.col("_b._n").cast("double")).alias("inlier_frac"))
