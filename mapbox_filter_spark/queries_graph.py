"""Gate query for connected components / dedup clustering
(operators/graph.py).

Edge rule (deterministic, data-derived): two documents are "near dups"
when they share a language and their lengths differ by ≤ 2 chars.
Length chains make transitivity do real work — doc A links B links C
even when A and C differ by 4 — which is exactly the closure connected
components exist to compute.  The oracle is an independent algorithm: a
recursive-CTE reachability closure + MIN per node, against the engine's
alternating large-star/small-star contraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.graph import dedup_clusters

_MAX_DIFF = 2


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                    & (F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                       <= _MAX_DIFF)
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("src"),
                     F.col("b.doc_id").alias("dst")))
    return (dedup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
            .select("doc_id", "component", "is_representative"))


def sql_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT a.doc_id AS x, b.doc_id AS y
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND abs(a.n_chars - b.n_chars) <= {_MAX_DIFF}
   AND a.doc_id <> b.doc_id
), r AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.y, r.comp FROM r JOIN e ON e.x = r.node
)
SELECT node AS doc_id,
       MIN(comp) AS component,
       MIN(comp) = node AS is_representative
FROM r GROUP BY node"""


_PR_ITERS = 5
_PR_SALT = "mfs-r4"
_PR_K = 3  # hashed out-links per node
_PR_SCALE = 10**12


def _sql_link_edges() -> str:
    """Oracle mirror of the deterministic hashed link graph shared by
    the pagerank and triangle_count gates (operators/splits.py
    negative_pairs with k=3, dedup'd)."""
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), '"
         f"{_PR_SALT}', CAST(doc_id AS VARCHAR), CAST(t.j AS VARCHAR))), "
         "1, 15)) AS BIGINT)")
    return f"""nc AS (SELECT COUNT(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT doc_id AS src,
         CASE WHEN raw = doc_id THEN (raw + 1) % c ELSE raw END AS dst
  FROM (
    SELECT d.doc_id, ({u}) % nc.n AS raw, nc.n AS c
    FROM documents d, nc,
         LATERAL (SELECT unnest(range(1, {_PR_K + 1})) AS j) t)
)"""


def _link_edges(spark: SparkSession, sf_dir: str) -> "DataFrame":
    """Engine side of the same hashed link graph."""
    from .operators.splits import negative_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    n = docs.count()
    return (negative_pairs(docs, "doc_id", n_ids=n, k=_PR_K,
                           salt=_PR_SALT)
            .select(F.col("doc_id").alias("src"),
                    F.col("neg_id").alias("dst"))
            .distinct())


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point PageRank over a deterministic hashed link graph
    (operators/graph.py pagerank_exact; edges from splits.negative_pairs
    — every doc links to 3 content-hashed targets, dedup'd)."""
    from .operators.graph import pagerank_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = _link_edges(spark, sf_dir)
    return (pagerank_exact(docs, edges, node_col="doc_id",
                           iters=_PR_ITERS, scale=_PR_SCALE)
            .select(F.col("node").alias("doc_id"), "pr"))


def sql_pagerank() -> str:
    s = _PR_SCALE
    ctes = [_sql_link_edges() + f""",
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT doc_id AS node, {s} // nc.n AS pr FROM documents, nc)"""]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
  SELECT n.node,
         ({s} * 15) // (100 * (SELECT n FROM nc))
         + (85 * COALESCE(sm.s, 0)) // 100 AS pr
  FROM (SELECT doc_id AS node FROM documents) n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr // g.d) AS s
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN deg g ON g.src = e.src
    GROUP BY e.dst) sm USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, pr FROM pr{_PR_ITERS}")


# SSSP gate: 20×15 road-grid (300 nodes from part), undirected edges
# with weights 100..103.  The tight spread PROVES the oracle's unroll
# bound: an optimal path's hop count can exceed the hop-minimal path's
# (≤ 33 hops from corner 0) by at most ×103/100 < 34/33, so every
# optimal path has ≤ 33 edges and 36 relaxation rounds are sufficient
# — the unrolled-CTE oracle is exact, not heuristic.
_SSSP_W, _SSSP_H = 20, 15
_SSSP_N = _SSSP_W * _SSSP_H
_SSSP_UNROLL = 36


def q_sssp_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths (operators/graph.py shortest_paths):
    frontier-pruned Bellman-Ford over the synthetic road grid, exact
    integer distances, driver loop terminating on an empty frontier.
    The oracle unrolls the same relaxation to the proven 36-round bound
    — full value-hash on (node, dist)."""
    from .operators.graph import shortest_paths

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    i = (F.col("p_partkey") - 1).cast("long")
    nodes = (part.filter((F.col("p_partkey") >= 1)
                         & (F.col("p_partkey") <= _SSSP_N))
             .select(i.alias("i")))
    right = nodes.filter(F.col("i") % _SSSP_W != _SSSP_W - 1)
    down = nodes.filter(F.col("i") < _SSSP_N - _SSSP_W)
    wr = (100 + F.pmod(F.col("i") * 31 + 7, F.lit(4))).cast("long")
    wd = (100 + F.pmod(F.col("i") * 31 + 13, F.lit(4))).cast("long")
    e = (right.select(F.col("i").alias("src"),
                      (F.col("i") + 1).alias("dst"), wr.alias("w"))
         .unionByName(right.select((F.col("i") + 1).alias("src"),
                                   F.col("i").alias("dst"), wr.alias("w")))
         .unionByName(down.select(F.col("i").alias("src"),
                                  (F.col("i") + _SSSP_W).alias("dst"),
                                  wd.alias("w")))
         .unionByName(down.select((F.col("i") + _SSSP_W).alias("src"),
                                  F.col("i").alias("dst"), wd.alias("w"))))
    sources = nodes.filter(F.col("i") == 0)
    return shortest_paths(e, sources, node_col="i")


def sql_sssp_grid() -> str:
    W, N = _SSSP_W, _SSSP_N
    ctes = [f"""nodes AS MATERIALIZED (
  SELECT CAST(p_partkey - 1 AS BIGINT) AS i FROM part
  WHERE p_partkey >= 1 AND p_partkey <= {N}),
e AS MATERIALIZED (
  SELECT i AS s, i + 1 AS t, CAST(100 + (i*31 + 7) % 4 AS BIGINT) AS w
  FROM nodes WHERE i % {W} <> {W - 1}
  UNION ALL
  SELECT i + 1, i, CAST(100 + (i*31 + 7) % 4 AS BIGINT)
  FROM nodes WHERE i % {W} <> {W - 1}
  UNION ALL
  SELECT i, i + {W}, CAST(100 + (i*31 + 13) % 4 AS BIGINT)
  FROM nodes WHERE i < {N - W}
  UNION ALL
  SELECT i + {W}, i, CAST(100 + (i*31 + 13) % 4 AS BIGINT)
  FROM nodes WHERE i < {N - W}),
d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)"""]
    for k in range(1, _SSSP_UNROLL + 1):
        ctes.append(f"""d{k} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.t, d{k - 1}.dist + e.w FROM d{k - 1}
    JOIN e ON e.s = d{k - 1}.node) GROUP BY node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, dist FROM d{_SSSP_UNROLL}")


_ISO_BAND = 200  # ~2 grid hops per band at w ∈ [100, 103]


def q_isochrone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone bands — the routing-engine reachability product:
    shortest-path distances from the depot node banded into travel-cost
    rings (band = dist div 200), with per-band node counts and exact
    min/max cost.  Pure composition over shortest_paths; the oracle
    bands the same 36-round unrolled relaxation."""
    dist = q_sssp_grid(spark, sf_dir)
    return (dist.withColumn("band", F.expr(f"dist div {_ISO_BAND}"))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("dist").alias("min_dist"),
                 F.max("dist").alias("max_dist")))


def sql_isochrone() -> str:
    return (f"WITH sp AS ({sql_sssp_grid()})\n"
            f"SELECT dist // {_ISO_BAND} AS band, COUNT(*) AS n_nodes,\n"
            f"       MIN(dist) AS min_dist, MAX(dist) AS max_dist\n"
            f"FROM sp GROUP BY 1")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster representative selection — the curation op that
    FOLLOWS clustering: within each near-dup component keep the single
    highest-quality document (here: longest, doc_id as the deterministic
    tie-break) and drop the rest.  One window over the component key on
    top of the same CC labels as dedup_clusters; this is how a 100 TB
    dedup pass actually ends (keep-best, not keep-first)."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "n_chars")
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                    & (F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                       <= _MAX_DIFF)
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("src"),
                     F.col("b.doc_id").alias("dst")))
    labels = dedup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").desc())
    return (labels.join(docs.select("doc_id", "n_chars"), "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .select("doc_id", "component",
                    (F.col("rn") == 1).alias("keep")))


def sql_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT a.doc_id AS x, b.doc_id AS y
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND abs(a.n_chars - b.n_chars) <= {_MAX_DIFF}
   AND a.doc_id <> b.doc_id
), r AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.y, r.comp FROM r JOIN e ON e.x = r.node
), lab AS (
  SELECT node AS doc_id, MIN(comp) AS component FROM r GROUP BY node
)
SELECT lab.doc_id, lab.component,
       ROW_NUMBER() OVER (PARTITION BY lab.component
                          ORDER BY d.n_chars DESC, lab.doc_id DESC) = 1
         AS keep
FROM lab JOIN documents d ON d.doc_id = lab.doc_id"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation (operators/graph.py
    triangle_counts — degree-ordered wedge closure so hub wedges are
    generated at their low-degree neighbors, the power-law-safe shape)
    over the SAME deterministic hashed link graph as the pagerank gate.
    The oracle is an independent algorithm: brute 3-way self-join on
    the canonical undirected edge set."""
    from .operators.graph import triangle_counts

    return (triangle_counts(_link_edges(spark, sf_dir))
            .select(F.col("node").alias("doc_id"), "n_tri"))


def sql_triangle_count() -> str:
    return f"""WITH {_sql_link_edges()},
e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT node AS doc_id, COUNT(*) AS n_tri FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
GROUP BY node"""


_KCORE_K = 4
# Oracle unroll bound: the hashed link graph peels to its 4-core in 4
# rounds at sf0.01 (3 at sf0.1); 8 rounds is 2x margin.  SELF-CHECKING:
# the engine runs to a TRUE fixpoint, so if 8 rounds were ever
# insufficient the value-hash comparison fails loudly — a green gate
# proves the unroll sufficed (the sssp_grid evidence pattern).
_KCORE_UNROLL = 8


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (operators/graph.py k_core) of the hashed
    link graph: synchronous peeling to fixpoint — per round one degree
    groupBy + anti-join of the shrinking drop set, localCheckpoint per
    round.  Returns core members with their in-core degree."""
    from .operators.graph import k_core

    return (k_core(_link_edges(spark, sf_dir), k=_KCORE_K)
            .select(F.col("node").alias("doc_id"), "deg"))


def sql_k_core() -> str:
    k = _KCORE_K
    ctes = [_sql_link_edges() + """,
e0 AS MATERIALIZED (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
        FROM edges WHERE src <> dst))"""]
    for i in range(_KCORE_UNROLL):
        ctes.append(f"""bad{i} AS MATERIALIZED (
  SELECT u FROM (
    SELECT u, COUNT(*) AS c FROM (
      SELECT u FROM e{i} UNION ALL SELECT v FROM e{i}) GROUP BY u)
  WHERE c < {k}),
e{i + 1} AS MATERIALIZED (
  SELECT u, v FROM e{i}
  WHERE u NOT IN (SELECT u FROM bad{i})
    AND v NOT IN (SELECT u FROM bad{i}))""")
    last = f"e{_KCORE_UNROLL}"
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
  SELECT u FROM {last} UNION ALL SELECT v FROM {last})
GROUP BY u""")


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (operators/graph.py degree_assortativity)
    of the hashed link graph: exact integer moments over the symmetric
    edge list, r via the pinned spearman √-chain."""
    from .operators.graph import degree_assortativity

    return degree_assortativity(_link_edges(spark, sf_dir))


def sql_assortativity() -> str:
    return f"""WITH {_sql_link_edges()},
c AS (SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM (SELECT DISTINCT LEAST(src, dst) AS src,
                   GREATEST(src, dst) AS dst
            FROM edges WHERE src <> dst)),
sym AS (SELECT u, v FROM c UNION ALL SELECT v, u FROM c),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
j AS (
  SELECT a.d AS dx, b.d AS dy
  FROM sym JOIN deg a ON a.u = sym.u JOIN deg b ON b.u = sym.v),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_ends,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy
  FROM j)
SELECT m_ends,
       m_ends * sxy - sx * sy AS s_num,
       m_ends * sxx - sx * sx AS d_x,
       m_ends * syy - sy * sy AS d_y,
       CASE WHEN m_ends * sxx - sx * sx > 0
             AND m_ends * syy - sy * sy > 0
            THEN CAST(m_ends * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(m_ends * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m_ends * syy - sy * sy AS DOUBLE)))
            END AS r
FROM m"""


_SQL_CANON_SYM = """canon AS MATERIALIZED (
  SELECT DISTINCT greatest(src, dst) AS cu, least(src, dst) AS cv
  FROM edges WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT cu AS u, cv AS v FROM canon
  UNION ALL SELECT cv AS u, cu AS v FROM canon)"""

_LPA_ROUNDS = 4


def _sql_lpa_ctes(final: str = "lab") -> str:
    """Shared oracle CTE chain: hashed link graph -> canon/sym -> the
    4-round synchronous LPA unroll, ending in ``final``(node, label).
    Used by the label_propagation and modularity gates."""
    parts = [_sql_link_edges() + ",", _SQL_CANON_SYM + ",",
             "l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS label"
             " FROM documents)"]
    for i in range(1, _LPA_ROUNDS + 1):
        parts.append(f""",
c{i} AS MATERIALIZED (
  SELECT s.u AS node, l.label, COUNT(*) AS c
  FROM sym s JOIN l{i - 1} l ON l.node = s.v
  GROUP BY 1, 2),
s{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM c{i}) WHERE rn = 1),
l{i} AS MATERIALIZED (
  SELECT l0.node, COALESCE(s{i}.label, l0.node) AS label
  FROM l0 LEFT JOIN s{i} ON s{i}.node = l0.node)""")
    parts.append(f""",
{final} AS MATERIALIZED (SELECT node, label FROM l{_LPA_ROUNDS})""")
    return "".join(parts)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation over the hashed link
    graph (operators/graph.py label_propagation, 4 rounds, mode labels
    with min tiebreak)."""
    from .operators.graph import label_propagation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return label_propagation(
        docs, _link_edges(spark, sf_dir), rounds=_LPA_ROUNDS,
        id_col="doc_id").select(F.col("node").alias("doc_id"), "label")


def sql_label_propagation() -> str:
    return ("WITH " + _sql_lpa_ctes()
            + "\nSELECT node AS doc_id, label FROM lab")


_JL_MIN_COMMON = 2


def q_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor/Jaccard link prediction over the hashed link
    graph (operators/graph.py jaccard_links — existing edges anti-joined
    away, exact degree Jaccard)."""
    from .operators.graph import jaccard_links

    return jaccard_links(_link_edges(spark, sf_dir),
                         min_common=_JL_MIN_COMMON)


def sql_jaccard_links() -> str:
    return f"""WITH {_sql_link_edges()},
{_SQL_CANON_SYM},
w AS (
  SELECT a.v AS u, b.v AS v, COUNT(*) AS n_common
  FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_JL_MIN_COMMON}),
deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1)
SELECT w.u, w.v, w.n_common, du.deg AS deg_u, dv.deg AS deg_v,
       CAST(w.n_common AS DOUBLE)
       / CAST(du.deg + dv.deg - w.n_common AS DOUBLE) AS jaccard
FROM w
JOIN deg du ON du.u = w.u
JOIN deg dv ON dv.u = w.v
WHERE NOT EXISTS (SELECT 1 FROM canon c
                  WHERE c.cu = w.v AND c.cv = w.u)"""


_WALK_STEPS = 4
_WALK_SALT = "mfs-walk-r5"


def q_hash_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-greedy graph walks over the directed hashed
    link graph (operators/graph.py hash_walks — DeepWalk-style sampling
    with content-hash choices, 4 hops)."""
    from .operators.graph import hash_walks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    return hash_walks(docs, _link_edges(spark, sf_dir),
                      steps=_WALK_STEPS, salt=_WALK_SALT,
                      id_col="doc_id") \
        .select(F.col("start").alias("doc_id"), "node", "n_moves")


def sql_hash_walks() -> str:
    parts = [_sql_link_edges() + ",",
             """de AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
w0 AS MATERIALIZED (
  SELECT doc_id AS start, doc_id AS cur, CAST(0 AS BIGINT) AS n_moves
  FROM documents)"""]
    for i in range(_WALK_STEPS):
        h = (f"CAST(('0x' || substr(md5(concat_ws(chr(31), "
             f"'{_WALK_SALT}', CAST(w.cur AS VARCHAR), '{i}', "
             f"CAST(e.dst AS VARCHAR))), 1, 15)) AS BIGINT)")
        parts.append(f""",
c{i} AS MATERIALIZED (
  SELECT w.start, e.dst, {h} AS h
  FROM w{i} w JOIN de e ON e.src = w.cur),
x{i} AS MATERIALIZED (
  SELECT start, dst FROM (
    SELECT start, dst,
           ROW_NUMBER() OVER (PARTITION BY start ORDER BY h, dst) AS rn
    FROM c{i}) WHERE rn = 1),
w{i + 1} AS MATERIALIZED (
  SELECT w.start, COALESCE(x.dst, w.cur) AS cur,
         w.n_moves + CASE WHEN x.dst IS NULL THEN 0 ELSE 1 END AS n_moves
  FROM w{i} w LEFT JOIN x{i} x ON x.start = w.start)""")
    return ("WITH " + "".join(parts)
            + f"\nSELECT start AS doc_id, cur AS node, n_moves"
            f" FROM w{_WALK_STEPS}")



_HITS_ITERS = 3
_HITS_SCALE = 10**9


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the shared hashed link graph
    (operators/graph.py hits_exact — exact fixed-point integer L1
    normalization, same determinism contract as the pagerank gate)."""
    from .operators.graph import hits_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = _link_edges(spark, sf_dir)
    return (hits_exact(docs, edges, node_col="doc_id",
                       iters=_HITS_ITERS, scale=_HITS_SCALE)
            .select(F.col("node").alias("doc_id"), "hub", "auth"))


def sql_hits_scores() -> str:
    # MATERIALIZED per step: each normalization references its raw CTE
    # twice (join + scalar total); non-materialized CTEs would inline
    # the whole chain 2x per round (see memory: DuckDB CTE inlining).
    s = _HITS_SCALE
    ctes = [_sql_link_edges() + f""",
h0 AS MATERIALIZED (
  SELECT doc_id AS node, {s} // nc.n AS hub FROM documents, nc)"""]
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(f"""ra{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS r
  FROM edges e JOIN h{i - 1} h ON h.node = e.src GROUP BY 1),
a{i} AS MATERIALIZED (
  SELECT d.doc_id AS node,
         ({s} * COALESCE(ra.r, 0)) // (SELECT SUM(r) FROM ra{i}) AS auth
  FROM documents d LEFT JOIN ra{i} ra ON ra.node = d.doc_id),
rh{i} AS MATERIALIZED (
  SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS r
  FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY 1),
h{i} AS MATERIALIZED (
  SELECT d.doc_id AS node,
         ({s} * COALESCE(rh.r, 0)) // (SELECT SUM(r) FROM rh{i}) AS hub
  FROM documents d LEFT JOIN rh{i} rh ON rh.node = d.doc_id)""")
    k = _HITS_ITERS
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT h.node AS doc_id, h.hub, a.auth
FROM h{k} h JOIN a{k} a USING (node)""")



_PPR_QMOD = 41


def q_ppr_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py pagerank_exact with
    seeds=): teleport mass concentrated on the hashed seed docs
    (doc_id % 41 == 0) — proximity-to-seeds scoring over the shared
    link graph, same exact integer fixpoint as the pagerank gate."""
    from .operators.graph import pagerank_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    seeds = docs.filter(F.col("doc_id") % _PPR_QMOD == 0)
    edges = _link_edges(spark, sf_dir)
    return (pagerank_exact(docs, edges, node_col="doc_id",
                           iters=_PR_ITERS, scale=_PR_SCALE, seeds=seeds)
            .select(F.col("node").alias("doc_id"), "pr"))


def sql_ppr_scores() -> str:
    s = _PR_SCALE
    ctes = [_sql_link_edges() + f""",
sd AS (SELECT doc_id AS node FROM documents WHERE doc_id % {_PPR_QMOD} = 0),
sn AS (SELECT COUNT(*) AS k FROM sd),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
nb AS (
  SELECT d.doc_id AS node,
         CASE WHEN se.node IS NOT NULL THEN 1 ELSE 0 END AS isd
  FROM documents d LEFT JOIN sd se ON se.node = d.doc_id),
pr0 AS (SELECT node, isd * ({s} // (SELECT k FROM sn)) AS pr FROM nb)"""]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
  SELECT nb.node,
         nb.isd * (({s} * 15) // (100 * (SELECT k FROM sn)))
         + (85 * COALESCE(sm.s, 0)) // 100 AS pr
  FROM nb
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr // g.d) AS s
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN deg g ON g.src = e.src
    GROUP BY e.dst) sm USING (node))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, pr FROM pr{_PR_ITERS}")


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity decomposition of the 4-round LPA communities
    on the hashed link graph (operators/graph.py modularity): per
    community exact (n_nodes, e_intra, d_tot, m) and the one-division
    q_part whose sum is Q."""
    from .operators.graph import label_propagation, modularity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = _link_edges(spark, sf_dir)
    labels = label_propagation(docs, edges, rounds=_LPA_ROUNDS,
                               id_col="doc_id")
    return modularity(edges, labels)


def sql_modularity() -> str:
    return "WITH " + _sql_lpa_ctes() + """,
mm AS (SELECT COUNT(*) AS m FROM canon),
intra AS (
  SELECT lu.label, COUNT(*) AS e_intra
  FROM canon
  JOIN lab lu ON lu.node = canon.cu
  JOIN lab lv ON lv.node = canon.cv
  WHERE lu.label = lv.label
  GROUP BY 1),
deg AS (
  SELECT lab.label, COUNT(*) AS d_tot
  FROM sym JOIN lab ON lab.node = sym.u
  GROUP BY 1),
nn AS (SELECT label, COUNT(*) AS n_nodes FROM lab GROUP BY 1)
SELECT nn.label, nn.n_nodes,
       CAST(COALESCE(intra.e_intra, 0) AS BIGINT) AS e_intra,
       CAST(COALESCE(deg.d_tot, 0) AS BIGINT) AS d_tot,
       CAST(mm.m AS BIGINT) AS m,
       CASE WHEN mm.m > 0 THEN
         CAST(4 * mm.m * COALESCE(intra.e_intra, 0)
              - COALESCE(deg.d_tot, 0) * COALESCE(deg.d_tot, 0)
              AS DOUBLE)
         / CAST(4 * mm.m * mm.m AS DOUBLE) END AS q_part
FROM nn
LEFT JOIN deg USING (label)
LEFT JOIN intra USING (label)
CROSS JOIN mm"""


def q_quadrangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-cycle census of the hashed link graph (operators/graph.py
    quadrangle_profile): co-degree histogram + global C4 count by the
    two-diagonals identity, exact integers end to end."""
    from .operators.graph import quadrangle_profile

    return quadrangle_profile(_link_edges(spark, sf_dir))


def sql_quadrangle_count() -> str:
    return f"""WITH {_sql_link_edges()},
{_SQL_CANON_SYM},
cod AS (
  SELECT s1.v AS a, s2.v AS b, COUNT(*) AS cod
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2),
hist AS (
  SELECT cod, COUNT(*) AS n_pairs,
         CAST(COUNT(*) AS BIGINT) * (cod * (cod - 1) // 2) AS contrib
  FROM cod GROUP BY 1),
tot AS (SELECT CAST(SUM(contrib) AS BIGINT) // 2 AS n_c4 FROM hist)
SELECT cod, n_pairs, contrib, n_c4 FROM hist, tot"""


GRAPH_QUERIES = {
    "modularity": (q_modularity, sql_modularity),
    "quadrangle_count": (q_quadrangle_count, sql_quadrangle_count),

    "dedup_clusters": (q_dedup_clusters, sql_dedup_clusters),
    "dedup_keep_best": (q_dedup_keep_best, sql_dedup_keep_best),
    "pagerank": (q_pagerank, sql_pagerank),
    "sssp_grid": (q_sssp_grid, sql_sssp_grid),
    "isochrone": (q_isochrone, sql_isochrone),
    "triangle_count": (q_triangle_count, sql_triangle_count),
    "k_core": (q_k_core, sql_k_core),
    "assortativity": (q_assortativity, sql_assortativity),
    "label_propagation": (q_label_propagation, sql_label_propagation),
    "jaccard_links": (q_jaccard_links, sql_jaccard_links),
    "hash_walks": (q_hash_walks, sql_hash_walks),
    "hits_scores": (q_hits_scores, sql_hits_scores),
    "ppr_scores": (q_ppr_scores, sql_ppr_scores),
}


_LCC_SCALE = 10**9


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (operators/graph.py
    local_clustering) over the shared hashed link graph — exact
    quantized (2·tri·10⁹)//(deg·(deg−1)), NULL below degree 2."""
    from .operators.graph import local_clustering

    return (local_clustering(_link_edges(spark, sf_dir),
                             scale=_LCC_SCALE)
            .select(F.col("node").alias("doc_id"), "deg", "n_tri",
                    "coeff_q"))


def sql_local_clustering() -> str:
    return f"""WITH {_sql_link_edges()},
e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM edges WHERE src <> dst),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY 1),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
ntri AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY 1)
SELECT d.node AS doc_id, d.deg,
       COALESCE(n.n_tri, CAST(0 AS BIGINT)) AS n_tri,
       CASE WHEN d.deg >= 2
            THEN (2 * COALESCE(n.n_tri, CAST(0 AS BIGINT))
                  * CAST({_LCC_SCALE} AS BIGINT))
                 // (d.deg * (d.deg - 1))
       END AS coeff_q
FROM deg d LEFT JOIN ntri n ON d.node = n.node"""


GRAPH_QUERIES["local_clustering"] = (q_local_clustering,
                                     sql_local_clustering)


_RECIP_SCALE = 10**9


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node edge reciprocity (operators/graph.py reciprocity) of
    the DIRECTED hashed link graph — exact (n_recip·10⁹)//out_deg."""
    from .operators.graph import reciprocity

    return (reciprocity(_link_edges(spark, sf_dir),
                        scale=_RECIP_SCALE)
            .select(F.col("node").alias("doc_id"), "out_deg",
                    "n_recip", "recip_q"))


def sql_reciprocity() -> str:
    return f"""WITH {_sql_link_edges()},
e AS (SELECT DISTINCT src AS a, dst AS b FROM edges WHERE src <> dst),
m AS (SELECT e.a, CAST(COUNT(*) AS BIGINT) AS n
      FROM e JOIN e r ON e.a = r.b AND e.b = r.a GROUP BY 1),
d AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY 1)
SELECT d.a AS doc_id, d.out_deg,
       COALESCE(m.n, CAST(0 AS BIGINT)) AS n_recip,
       (COALESCE(m.n, CAST(0 AS BIGINT))
        * CAST({_RECIP_SCALE} AS BIGINT)) // d.out_deg AS recip_q
FROM d LEFT JOIN m ON d.a = m.a"""


GRAPH_QUERIES["reciprocity"] = (q_reciprocity, sql_reciprocity)


# sf0.01 needs 5 peel rounds (measured); 8 is margin.  SELF-CHECKING:
# the engine peels to a TRUE fixpoint, so if 8 unrolled rounds were
# ever insufficient the row-count/value-hash comparison fails loudly —
# a green gate proves the unroll sufficed (the k_core / sssp evidence
# pattern).
_SCC_UNROLL = 8


def q_scc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the DIRECTED hashed link graph
    (operators/graph.py scc_labels — forward/backward min-label
    peeling to fixpoint; matches an independent iterative Tarjan on
    the collected graph in tests)."""
    from .operators.graph import scc_labels

    return (scc_labels(_link_edges(spark, sf_dir))
            .select(F.col("node").alias("doc_id"), "scc", "scc_size"))


def sql_scc_labels() -> str:
    parts = [f"""{_sql_link_edges()},
e0 AS MATERIALIZED (SELECT DISTINCT src AS s, dst AS d
                    FROM edges WHERE src <> dst),
n0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM e0
                    UNION SELECT DISTINCT d FROM e0)"""]
    for r in range(_SCC_UNROLL):
        parts.append(f"""
fc{r} AS (SELECT node, node AS lab FROM n{r}
          UNION
          SELECT e.d, fc{r}.lab FROM fc{r} JOIN e{r} e
            ON e.s = fc{r}.node),
fm{r} AS MATERIALIZED (SELECT node, MIN(lab) AS flab
                       FROM fc{r} GROUP BY 1),
bc{r} AS (SELECT node, node AS lab FROM n{r}
          UNION
          SELECT e.s, bc{r}.lab FROM bc{r} JOIN e{r} e
            ON e.d = bc{r}.node),
bm{r} AS MATERIALIZED (SELECT node, MIN(lab) AS blab
                       FROM bc{r} GROUP BY 1),
res{r} AS MATERIALIZED (
  SELECT fm{r}.node, fm{r}.flab AS scc
  FROM fm{r} JOIN bm{r} ON fm{r}.node = bm{r}.node
                       AND fm{r}.flab = bm{r}.blab),
n{r + 1} AS MATERIALIZED (
  SELECT node FROM n{r}
  WHERE node NOT IN (SELECT node FROM res{r})),
e{r + 1} AS MATERIALIZED (
  SELECT s, d FROM e{r}
  WHERE s IN (SELECT node FROM n{r + 1})
    AND d IN (SELECT node FROM n{r + 1}))""")
    allres = "\nUNION ALL\n".join(
        f"  SELECT node, scc FROM res{r}" for r in range(_SCC_UNROLL))
    return ("WITH RECURSIVE " + ",".join(parts) + f""",
allres AS (
{allres}),
sz AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS scc_size
       FROM allres GROUP BY 1)
SELECT a.node AS doc_id, a.scc, sz.scc_size
FROM allres a JOIN sz ON a.scc = sz.scc""")


GRAPH_QUERIES["scc_labels"] = (q_scc_labels, sql_scc_labels)


_TRUSS_K = 3
# sf0.01 peels in 2 rounds (measured); 4 is margin.  SELF-CHECKING
# like scc/k_core: the engine peels to a TRUE fixpoint, so an
# insufficient unroll fails the value-hash loudly.
_TRUSS_UNROLL = 4


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the hashed link graph (operators/graph.py k_truss —
    synchronous support peel to fixpoint over degree-ordered wedge
    closure); 73 of 1,490 canonical edges survive at sf0.01."""
    from .operators.graph import k_truss

    return (k_truss(_link_edges(spark, sf_dir), k=_TRUSS_K)
            .select(F.col("u").alias("doc_a"),
                    F.col("v").alias("doc_b"), "support"))


def sql_k_truss() -> str:
    thresh = _TRUSS_K - 2
    ctes = [f"""{_sql_link_edges()},
t0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM edges WHERE src <> dst)"""]

    def support(r):
        return f"""tri{r} AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM t{r} a JOIN t{r} b ON b.u = a.v
              JOIN t{r} c ON c.u = a.u AND c.v = b.v),
sup{r} AS MATERIALIZED (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS s FROM (
    SELECT LEAST(x, y) AS u, GREATEST(x, y) AS v FROM tri{r}
    UNION ALL SELECT LEAST(x, z), GREATEST(x, z) FROM tri{r}
    UNION ALL SELECT LEAST(y, z), GREATEST(y, z) FROM tri{r})
  GROUP BY 1, 2)"""

    for r in range(_TRUSS_UNROLL):
        ctes.append(support(r))
        ctes.append(f"""t{r + 1} AS MATERIALIZED (
  SELECT t.u, t.v FROM t{r} t
  JOIN sup{r} s ON t.u = s.u AND t.v = s.v
  WHERE s.s >= {thresh})""")
    last = _TRUSS_UNROLL
    ctes.append(support(last))
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT t.u AS doc_a, t.v AS doc_b, s.s AS support
FROM t{last} t JOIN sup{last} s ON t.u = s.u AND t.v = s.v
WHERE s.s >= {thresh}""")


GRAPH_QUERIES["k_truss"] = (q_k_truss, sql_k_truss)


_MSF_SALT = "msf"
# sf0.01 converges in 4 Borůvka rounds (measured); 6 is margin.
# Self-checking: the engine runs to fixpoint, so an insufficient
# unroll fails the value-hash loudly.
_MSF_UNROLL = 6


def _msf_w_sql(u: str, v: str) -> str:
    return (f"CAST(('0x' || substr(md5(concat_ws(chr(31), "
            f"'{_MSF_SALT}', CAST({u} AS VARCHAR), "
            f"CAST({v} AS VARCHAR))), 1, 15)) AS BIGINT)")


def q_msf_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the (undirected) hashed link graph
    (operators/graph.py boruvka_msf — per-component min-edge rounds +
    connected-components merges) under deterministic md5 edge weights;
    Kruskal-differential tested on random graphs.  499 tree edges at
    sf0.01 (the graph is one component)."""
    from .operators.graph import boruvka_msf

    e = (_link_edges(spark, sf_dir)
         .filter(F.col("src") != F.col("dst"))
         .select(F.least("src", "dst").alias("src"),
                 F.greatest("src", "dst").alias("dst"))
         .distinct())
    w = F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.lit(_MSF_SALT),
                          F.col("src").cast("string"),
                          F.col("dst").cast("string"))), 1, 15),
        16, 10).cast("long")
    return (boruvka_msf(e.withColumn("w", w))
            .select(F.col("u").alias("doc_a"),
                    F.col("v").alias("doc_b"), "w"))


def sql_msf_edges() -> str:
    ctes = [f"""{_sql_link_edges()},
ew AS MATERIALIZED (
  SELECT u, v, {_msf_w_sql('u', 'v')} AS w FROM (
    SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
    FROM edges WHERE src <> dst)),
comp0 AS MATERIALIZED (
  SELECT node, node AS comp FROM (
    SELECT DISTINCT u AS node FROM ew
    UNION SELECT DISTINCT v FROM ew))"""]
    for r in range(_MSF_UNROLL):
        ctes.append(f"""ec{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.w, a.comp AS cu, b.comp AS cv
  FROM ew e JOIN comp{r} a ON e.u = a.node
            JOIN comp{r} b ON e.v = b.node
  WHERE a.comp <> b.comp),
mins{r} AS MATERIALIZED (
  SELECT u, v, w, cu, cv FROM (
    SELECT c, u, v, w, cu, cv,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM (SELECT cu AS c, u, v, w, cu, cv FROM ec{r}
          UNION ALL
          SELECT cv, u, v, w, cu, cv FROM ec{r}))
  WHERE rn = 1),
sel{r} AS MATERIALIZED (
  SELECT DISTINCT u, v, w, cu, cv FROM mins{r}),
mc{r} AS MATERIALIZED (
  SELECT cu AS a, cv AS b FROM sel{r}
  UNION SELECT cv, cu FROM sel{r}),
cl{r} AS (
  SELECT a AS node, a AS lab FROM mc{r}
  UNION
  SELECT m.b, cl{r}.lab FROM cl{r} JOIN mc{r} m ON m.a = cl{r}.node),
nl{r} AS MATERIALIZED (
  SELECT node, MIN(lab) AS newc FROM cl{r} GROUP BY 1),
comp{r + 1} AS MATERIALIZED (
  SELECT c.node, COALESCE(n.newc, c.comp) AS comp
  FROM comp{r} c LEFT JOIN nl{r} n ON c.comp = n.node)""")
    allsel = "\nUNION ALL\n".join(
        f"  SELECT u, v, w FROM sel{r}" for r in range(_MSF_UNROLL))
    return ("WITH RECURSIVE " + ",\n".join(ctes) + f""",
forest AS (
{allsel})
SELECT u AS doc_a, v AS doc_b, CAST(MIN(w) AS BIGINT) AS w
FROM forest GROUP BY 1, 2""")


GRAPH_QUERIES["msf_edges"] = (q_msf_edges, sql_msf_edges)


_HC_LANDMARKS = 4
_HC_ROUNDS = 6
_HC_SALT = "hc"
_HC_SCALE = 10**9


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-based harmonic centrality over the shared hashed link
    graph (operators/graph.py landmark_distances): 4 md5-minimal
    landmark docs, bounded 6-round BFS (fixed-round semantics — the
    oracle unrolls exactly 6 CTEs), per-node score the exact integer
    Σ 10⁹ // dist over reached landmarks (Eppstein-Wang style landmark
    estimate; floor-div keeps the whole score value-hashable)."""
    from .operators.graph import landmark_distances
    from .operators.splits import hash_u60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    lms = (docs.select("doc_id",
                       hash_u60(["doc_id"], _HC_SALT).alias("_h"))
           .orderBy("_h", "doc_id").limit(_HC_LANDMARKS)
           .select(F.col("doc_id").alias("lm")))
    d = landmark_distances(_link_edges(spark, sf_dir), lms,
                           rounds=_HC_ROUNDS)
    return (d.filter(F.col("dist") > 0)
            .groupBy(F.col("node").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_lm"),
                 F.sum(F.expr(f"{_HC_SCALE} div dist"))
                 .alias("h_score")))


def sql_harmonic_centrality() -> str:
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), '"
         f"{_HC_SALT}', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)")
    ctes = [_sql_link_edges() + f""",
lms AS (
  SELECT doc_id AS lm FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY {u}, doc_id) AS rn
    FROM documents) WHERE rn <= {_HC_LANDMARKS}),
d0 AS (SELECT lm, lm AS node, CAST(0 AS BIGINT) AS dist FROM lms)"""]
    for i in range(1, _HC_ROUNDS + 1):
        ctes.append(f"""d{i} AS (
  SELECT lm, node, MIN(dist) AS dist FROM (
    SELECT lm, node, dist FROM d{i - 1}
    UNION ALL
    SELECT d.lm, e.dst AS node, d.dist + 1 AS dist
    FROM d{i - 1} d JOIN edges e ON e.src = d.node)
  GROUP BY 1, 2)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_lm,
       CAST(SUM({_HC_SCALE} // dist) AS BIGINT) AS h_score
FROM d{_HC_ROUNDS} WHERE dist > 0 GROUP BY 1""")


GRAPH_QUERIES["harmonic_centrality"] = (q_harmonic_centrality,
                                        sql_harmonic_centrality)


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the shared hashed link graph
    (operators/graph.py adamic_adar): wedge generation at the shared
    neighbor carrying its exact degree, 1/ln(deg) terms summed by a
    center-sorted pinned fold, existing edges anti-joined away."""
    from .operators.graph import adamic_adar

    return (adamic_adar(_link_edges(spark, sf_dir), min_common=2)
            .select(F.col("u").alias("doc_u"),
                    F.col("v").alias("doc_v"), "n_common", "aa"))


def sql_adamic_adar() -> str:
    return f"""WITH {_sql_link_edges()},
e AS (SELECT DISTINCT GREATEST(src, dst) AS gs, LEAST(src, dst) AS ls
      FROM edges WHERE src <> dst),
sym AS (SELECT gs AS u, ls AS v FROM e
        UNION ALL SELECT ls AS u, gs AS v FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
w AS (
  SELECT s1.v AS u, s2.v AS v, s1.u AS w, d.deg
  FROM sym s1 JOIN sym s2 ON s2.u = s1.u AND s1.v < s2.v
  JOIN deg d ON d.u = s1.u),
p AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(CAST(1.0 AS DOUBLE)
                             / ln(CAST(deg AS DOUBLE)) ORDER BY w)),
           (a, b) -> a + b) AS aa
  FROM w GROUP BY 1, 2)
SELECT p.u AS doc_u, p.v AS doc_v, p.n_common, p.aa
FROM p
WHERE p.n_common >= 2
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.gs = p.v AND e.ls = p.u)"""


GRAPH_QUERIES["adamic_adar"] = (q_adamic_adar, sql_adamic_adar)


_RICH_CLUB_KS = (2, 3, 4, 6, 8)


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficients φ(k) of the hashed link graph
    (operators/graph.py rich_club): one degree histogram + one
    min-degree edge histogram answer every k threshold — no per-k
    pass over the graph."""
    from .operators.graph import rich_club

    return rich_club(_link_edges(spark, sf_dir), ks=_RICH_CLUB_KS)


def sql_rich_club() -> str:
    ks = ", ".join(str(k) for k in _RICH_CLUB_KS)
    return f"""WITH {_sql_link_edges()},
e AS (SELECT DISTINCT GREATEST(src, dst) AS gs, LEAST(src, dst) AS ls
      FROM edges WHERE src <> dst),
sym AS (SELECT gs AS u FROM e UNION ALL SELECT ls AS u FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
nh AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS nc FROM deg GROUP BY 1),
eh AS (
  SELECT LEAST(d1.deg, d2.deg) AS mindeg,
         CAST(COUNT(*) AS BIGINT) AS ec
  FROM e JOIN deg d1 ON d1.u = e.gs JOIN deg d2 ON d2.u = e.ls
  GROUP BY 1),
ks AS (SELECT CAST(unnest([{ks}]) AS BIGINT) AS k)
SELECT ks.k,
       CAST(COALESCE((SELECT SUM(nc) FROM nh WHERE nh.deg > ks.k), 0)
            AS BIGINT) AS n_nodes,
       CAST(COALESCE((SELECT SUM(ec) FROM eh WHERE eh.mindeg > ks.k), 0)
            AS BIGINT) AS n_edges,
       CASE WHEN COALESCE((SELECT SUM(nc) FROM nh
                           WHERE nh.deg > ks.k), 0) >= 2 THEN
         CAST(2.0 AS DOUBLE)
           * CAST(COALESCE((SELECT SUM(ec) FROM eh
                            WHERE eh.mindeg > ks.k), 0) AS DOUBLE)
           / CAST(COALESCE((SELECT SUM(nc) FROM nh
                            WHERE nh.deg > ks.k), 0)
                  * (COALESCE((SELECT SUM(nc) FROM nh
                               WHERE nh.deg > ks.k), 0) - 1)
                  AS DOUBLE) END AS phi
FROM ks"""


GRAPH_QUERIES["rich_club"] = (q_rich_club, sql_rich_club)


_DS_ROUNDS = 8


def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep diameter lower bound over the shared hashed link
    graph (operators/graph.py double_sweep_diameter): BFS from the
    min node id, re-BFS from the farthest node — fixed 8-round
    sweeps, ties to the smallest id, mirrored as a 2×8 CTE unroll."""
    from .operators.graph import double_sweep_diameter

    return double_sweep_diameter(_link_edges(spark, sf_dir),
                                 rounds=_DS_ROUNDS)


def sql_graph_diameter() -> str:
    ctes = [_sql_link_edges() + """,
e2 AS (SELECT src AS s, dst AS d FROM edges WHERE src <> dst),
sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT s AS src, d AS dst FROM e2
  UNION ALL SELECT d AS src, s AS dst FROM e2)),
s0 AS (SELECT MIN(src) AS seed FROM sym),
a0 AS (SELECT seed AS node, CAST(0 AS BIGINT) AS dist FROM s0)"""]
    for i in range(1, _DS_ROUNDS + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM a{i - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM a{i - 1} d JOIN sym e ON e.src = d.node)
  GROUP BY 1)""")
    ctes.append(f"""p AS (
  SELECT node AS peripheral, dist AS ecc_seed
  FROM a{_DS_ROUNDS} ORDER BY dist DESC, node ASC LIMIT 1),
b0 AS (SELECT peripheral AS node, CAST(0 AS BIGINT) AS dist FROM p)""")
    for i in range(1, _DS_ROUNDS + 1):
        ctes.append(f"""b{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM b{i - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM b{i - 1} d JOIN sym e ON e.src = d.node)
  GROUP BY 1)""")
    ctes.append(f"""f AS (
  SELECT node AS far_node, dist AS diameter_lb
  FROM b{_DS_ROUNDS} ORDER BY dist DESC, node ASC LIMIT 1)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT CAST(s0.seed AS BIGINT) AS seed,
       CAST(p.ecc_seed AS BIGINT) AS ecc_seed,
       CAST(p.peripheral AS BIGINT) AS peripheral,
       CAST(f.diameter_lb AS BIGINT) AS diameter_lb,
       CAST(f.far_node AS BIGINT) AS far_node
FROM s0, p, f""")


GRAPH_QUERIES["graph_diameter"] = (q_graph_diameter,
                                   sql_graph_diameter)


def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance of the LPA communities
    (operators/graph.py conductance): cut = d_c − 2e_c over
    min(d_c, 2m − d_c), exact integers from the modularity join —
    the seal-quality score for using communities as shards."""
    from .operators.graph import conductance, label_propagation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = _link_edges(spark, sf_dir)
    labels = label_propagation(docs, edges, rounds=_LPA_ROUNDS,
                               id_col="doc_id")
    return conductance(edges, labels)


def sql_conductance() -> str:
    return "WITH " + _sql_lpa_ctes() + """,
mm AS (SELECT COUNT(*) AS m FROM canon),
intra AS (
  SELECT lu.label, COUNT(*) AS e_intra
  FROM canon
  JOIN lab lu ON lu.node = canon.cu
  JOIN lab lv ON lv.node = canon.cv
  WHERE lu.label = lv.label
  GROUP BY 1),
deg AS (
  SELECT lab.label, COUNT(*) AS d_tot
  FROM sym JOIN lab ON lab.node = sym.u
  GROUP BY 1),
nn AS (SELECT label, COUNT(*) AS n_nodes FROM lab GROUP BY 1)
SELECT nn.label, nn.n_nodes,
       CAST(COALESCE(intra.e_intra, 0) AS BIGINT) AS e_intra,
       CAST(COALESCE(deg.d_tot, 0) AS BIGINT) AS d_tot,
       CAST(mm.m AS BIGINT) AS m,
       CAST(COALESCE(deg.d_tot, 0)
            - 2 * COALESCE(intra.e_intra, 0) AS BIGINT) AS cut,
       CASE WHEN least(COALESCE(deg.d_tot, 0),
                       2 * mm.m - COALESCE(deg.d_tot, 0)) > 0
            THEN CAST(COALESCE(deg.d_tot, 0)
                      - 2 * COALESCE(intra.e_intra, 0) AS DOUBLE)
                 / CAST(least(COALESCE(deg.d_tot, 0),
                              2 * mm.m - COALESCE(deg.d_tot, 0))
                        AS DOUBLE) END AS conductance
FROM nn
LEFT JOIN deg USING (label)
LEFT JOIN intra USING (label)
CROSS JOIN mm"""


GRAPH_QUERIES["conductance"] = (q_conductance, sql_conductance)


_MIS_SALT = "mis-r5"
_MIS_UNROLL = 6


def q_mis_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Luby maximal independent set over the hashed link
    graph (operators/graph.py maximal_independent_set): content-hashed
    priorities with node tiebreak, winners beat every live neighbor,
    neighborhoods retire per round.  The engine peels to the TRUE
    fixpoint; the oracle unrolls 6 MATERIALIZED rounds and is
    self-checking — a green value hash proves 6 was enough (3 needed
    at sf0.01)."""
    from .operators.graph import maximal_independent_set

    edges = _link_edges(spark, sf_dir)
    return maximal_independent_set(edges, salt=_MIS_SALT)


def sql_mis_nodes() -> str:
    def pr(rnd: str, u: str = "u") -> str:
        return ("CAST(('0x' || substr(md5(concat_ws(chr(31), "
                f"'{_MIS_SALT}|r{rnd}', CAST({u} AS VARCHAR))), 1, 15)) "
                "AS BIGINT)")

    parts = [_sql_link_edges() + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT greatest(src, dst) AS src, least(src, dst) AS dst
  FROM edges WHERE src <> dst),
live0 AS MATERIALIZED (
  SELECT src AS u FROM e0 UNION SELECT dst FROM e0)"""]
    for k in range(_MIS_UNROLL):
        parts.append(f""",
p{k} AS MATERIALIZED (
  SELECT u, {pr(str(k))} AS p FROM live{k}),
sym{k} AS (
  SELECT src AS u, dst AS v FROM e{k}
  UNION ALL SELECT dst, src FROM e{k}),
nb{k} AS MATERIALIZED (
  SELECT u, pv, v FROM (
    SELECT s.u, pp.p AS pv, s.v,
           ROW_NUMBER() OVER (PARTITION BY s.u
                              ORDER BY pp.p, s.v) AS rn
    FROM sym{k} s JOIN p{k} pp ON pp.u = s.v) WHERE rn = 1),
win{k} AS MATERIALIZED (
  SELECT pr.u FROM p{k} pr LEFT JOIN nb{k} n ON n.u = pr.u
  WHERE n.u IS NULL OR (pr.p, pr.u) < (n.pv, n.v)),
gone{k} AS MATERIALIZED (
  SELECT u FROM win{k}
  UNION SELECT s.u FROM sym{k} s JOIN win{k} w ON w.u = s.v),
live{k + 1} AS MATERIALIZED (
  SELECT u FROM live{k} EXCEPT SELECT u FROM gone{k}),
e{k + 1} AS MATERIALIZED (
  SELECT src, dst FROM e{k}
  WHERE src NOT IN (SELECT u FROM gone{k})
    AND dst NOT IN (SELECT u FROM gone{k}))""")
    sel = "\nUNION ALL ".join(
        f"SELECT u AS node, CAST({k} AS BIGINT) AS round FROM win{k}"
        for k in range(_MIS_UNROLL))
    return "WITH " + "".join(parts) + "\n" + sel


GRAPH_QUERIES["mis_nodes"] = (q_mis_nodes, sql_mis_nodes)


def q_bom_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts explosion over a synthetic 8-ary part forest
    (operators/graph.py bom_explode): parent = p//8, qty = p%5+1 —
    pointer-doubling closure with multiplied quantities, verified
    against DuckDB's genuinely independent WITH RECURSIVE evaluation
    (not a blocking mirror)."""
    from .operators.graph import bom_explode

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    edges = (part.filter(F.col("p_partkey") >= 8)
             .select(F.floor(F.col("p_partkey") / 8).cast("long")
                     .alias("parent"),
                     F.col("p_partkey").alias("child"),
                     (F.pmod(F.col("p_partkey"), F.lit(5)) + 1)
                     .cast("long").alias("qty")))
    return bom_explode(edges)


def sql_bom_explode() -> str:
    return """WITH RECURSIVE edges AS (
  SELECT p_partkey // 8 AS parent, p_partkey AS child,
         CAST(p_partkey % 5 + 1 AS BIGINT) AS qty
  FROM part WHERE p_partkey >= 8),
r AS (
  SELECT parent AS anc, child AS descendant, qty AS total_qty,
         CAST(1 AS BIGINT) AS depth
  FROM edges
  UNION ALL
  SELECT r.anc, e.child, r.total_qty * e.qty, r.depth + 1
  FROM r JOIN edges e ON e.parent = r.descendant)
SELECT anc, descendant, total_qty, depth FROM r"""


GRAPH_QUERIES["bom_explode"] = (q_bom_explode, sql_bom_explode)


_WL_ROUNDS = 2


def q_wl_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-WL color refinement over the hashed link graph
    (operators/graph.py wl_colors): degree seeds, two rounds of
    sorted-multiset md5 refinement — the structural-role fingerprint
    beside hits/pagerank, value-hashed per node."""
    from .operators.graph import wl_colors

    edges = _link_edges(spark, sf_dir)
    return wl_colors(edges, rounds=_WL_ROUNDS)


def sql_wl_colors() -> str:
    def refine(k, prev):
        return f""",
nb{k} AS (
  SELECT s.u,
         string_agg(CAST(c.c AS VARCHAR), ',' ORDER BY c.c) AS nb
  FROM sym s JOIN {prev} c ON c.u = s.v GROUP BY s.u),
c{k + 1} AS MATERIALIZED (
  SELECT p.u,
         CAST(('0x' || substr(md5(concat_ws(chr(31), 'wl{k}',
              CAST(p.c AS VARCHAR), nb{k}.nb)), 1, 15)) AS BIGINT) AS c
  FROM {prev} p JOIN nb{k} ON nb{k}.u = p.u)"""

    parts = [_sql_link_edges() + """,
ec AS MATERIALIZED (
  SELECT DISTINCT greatest(src, dst) AS src, least(src, dst) AS dst
  FROM edges WHERE src <> dst),
sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM ec
  UNION ALL SELECT dst, src FROM ec),
c0 AS MATERIALIZED (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY u)"""]
    for k in range(_WL_ROUNDS):
        parts.append(refine(k, f"c{k}"))
    return ("WITH " + "".join(parts)
            + f"\nSELECT u AS node, c AS color FROM c{_WL_ROUNDS}")


GRAPH_QUERIES["wl_colors"] = (q_wl_colors, sql_wl_colors)


def q_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronized Louvain local-move round over the 4-round LPA
    partition of the hashed link graph (operators/graph.py
    louvain_move): per node the exact-int64 best-candidate modularity
    gain 2m(k_iB−k_iA) − k_i(d_B−d_A+k_i) and the move decision —
    the phase-1 refinement step composed on the modularity-gate
    substrate."""
    from .operators.graph import label_propagation, louvain_move

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = _link_edges(spark, sf_dir)
    labels = label_propagation(docs, edges, rounds=_LPA_ROUNDS,
                               id_col="doc_id")
    return (louvain_move(edges, labels)
            .select(F.col("node").alias("doc_id"), "old_label",
                    "new_label", "moved", "gain_num"))


def sql_louvain_move() -> str:
    return "WITH " + _sql_lpa_ctes() + """,
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM canon),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS ki
        FROM sym GROUP BY 1),
sigt AS (
  SELECT lab.label AS lbl,
         CAST(SUM(COALESCE(deg.ki, 0)) AS BIGINT) AS dtot
  FROM lab LEFT JOIN deg USING (node) GROUP BY 1),
kic AS (
  SELECT s.u AS node, l.label AS nbr_label,
         CAST(COUNT(*) AS BIGINT) AS kc
  FROM sym s JOIN lab l ON l.node = s.v
  GROUP BY 1, 2),
own AS (
  SELECT k.node, k.kc AS kia
  FROM kic k JOIN lab ON lab.node = k.node
  WHERE k.nbr_label = lab.label),
cand AS (
  SELECT k.node, lab.label AS old_label, k.nbr_label,
         2 * mm.m * (k.kc - COALESCE(own.kia, 0))
         - deg.ki * (db.dtot - da.dtot + deg.ki) AS g
  FROM kic k
  JOIN lab ON lab.node = k.node
  LEFT JOIN own ON own.node = k.node
  JOIN deg ON deg.node = k.node
  JOIN sigt db ON db.lbl = k.nbr_label
  JOIN sigt da ON da.lbl = lab.label
  CROSS JOIN mm
  WHERE k.nbr_label <> lab.label),
best AS (
  SELECT node, old_label, nbr_label, g FROM (
    SELECT node, old_label, nbr_label, g,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY g DESC, nbr_label ASC) AS rn
    FROM cand) WHERE rn = 1)
SELECT lab.node AS doc_id, lab.label AS old_label,
       CASE WHEN best.g > 0 THEN best.nbr_label
            ELSE lab.label END AS new_label,
       COALESCE(best.g > 0, FALSE) AS moved,
       best.g AS gain_num
FROM lab LEFT JOIN best ON best.node = lab.node"""


GRAPH_QUERIES["louvain_move"] = (q_louvain_move, sql_louvain_move)
