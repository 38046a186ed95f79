"""Gate query for BM25 retrieval (operators/retrieval.py).

The oracle recomputes the full pipeline — tokenize, tf/dl, df, idf,
BM25 sum, top-k — in SQL with the identical formula; ``avgdl`` is
written as SUM/COUNT (not AVG) in both engines so the division is the
same exact-int-to-double operation.  Scores rounded to 4 dp (the ln/
division chain agrees to the last ulp across engines; ranking happens
on the UNROUNDED score with doc_id tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.retrieval import bm25_topk

_QUERY = ["spark", "table", "scan"]
_K = 20
_K1, _B = 1.2, 0.75


def _sql_bm25_scored() -> str:
    """Shared oracle CTE block: tokenize -> tf/dl -> BM25 ``scored``
    (doc_id, s) for the module's query terms.  Used by the bm25_topk,
    rrf_fusion, and query_expansion gates."""
    terms = ", ".join(f"'{t}'" for t in _QUERY)
    return f"""words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents),
toks AS (SELECT doc_id, unnest(ws) AS term FROM words),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl),
qdf AS (
  SELECT term, COUNT(*) AS df FROM tf
  WHERE term IN ({terms}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         SUM(ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5)
                       / (qdf.df + 0.5))
             * tf.tf * ({_K1} + 1.0)
             / (tf.tf + {_K1} * (1.0 - {_B}
                                 + {_B} * dl.dl
                                   / (SELECT avgdl FROM stats)))
         ) AS s
  FROM tf JOIN qdf USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id)"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = bm25_topk(docs, list(_QUERY), k=_K, k1=_K1, b=_B)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "rank")


def sql_bm25_topk() -> str:
    return f"""
WITH {_sql_bm25_scored()}
SELECT doc_id, ROUND(s, 4) AS score, rank FROM (
  SELECT doc_id, s,
         ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {_K}"""


_KC_K = 5
_KC_QMOD = 5
_KC_SCALE = 1000


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label vote over the embeddings corpus
    (operators/similarity.py knn_classify): every 5th vector is held
    out as a query, classified by the majority label of its 5 nearest
    labeled neighbors — exact integer dot products, deterministic tie
    chain, full value-hash."""
    from .operators.similarity import knn_classify

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % _KC_QMOD == 0)
    corpus = emb.filter(F.col("vec_id") % _KC_QMOD != 0)
    return knn_classify(queries, corpus, _KC_K, scale=_KC_SCALE,
                        query_id="vec_id")


def sql_knn_classify() -> str:
    k, m, s = _KC_K, _KC_QMOD, _KC_SCALE
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS v FROM embeddings
  WHERE vec_id % {m} = 0
),
c AS (
  SELECT vec_id AS c_id, label AS c_label, embedding AS v
  FROM embeddings WHERE vec_id % {m} <> 0
),
dots AS (
  SELECT q.q_id, c.c_id, c.c_label,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(c.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(q.v) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM q, c
),
nn AS (
  SELECT q_id, c_label, dot,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dot DESC, c_id ASC) AS rank
  FROM dots
),
votes AS (
  SELECT q_id, c_label, COUNT(*) AS votes, MAX(dot) AS best_dot
  FROM nn WHERE rank <= {k} GROUP BY q_id, c_label
)
SELECT q_id AS vec_id, c_label AS pred_label, votes, best_dot FROM (
  SELECT q_id, c_label, votes, best_dot,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, c_label ASC) AS r
  FROM votes
) WHERE r = 1"""


_PHRASE = "table value"


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring search through the PRODUCTION index path
    (operators/retrieval.py phrase_search): trigram postings persisted
    bucketed by gram (write_trigram_index), probed with
    ``gram IN (<phrase grams>)`` — bucket-pruned posting-list scans —
    then exact verification + occurrence count on only the candidate
    docs.  The oracle is the direct contains() scan, so the gate proves
    the index path finds EXACTLY the brute-force hit set."""
    import os
    import tempfile

    from .operators.retrieval import phrase_search, write_trigram_index
    from .sources.features import _source_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    tag = _source_fingerprint(sf_dir)
    table = f"trgm_idx_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"mfs_trgm_{tag}")
    # overwrite each call: idempotent, immune to stale catalog entries
    # (at fleet scale the index is written once out-of-band)
    write_trigram_index(docs, path, table_name=table)
    return phrase_search(docs, _PHRASE, index_table=table)


def sql_phrase_search() -> str:
    ph = _PHRASE
    return f"""
SELECT doc_id,
       CAST((LEN(text) - LEN(REPLACE(text, '{ph}', ''))) / {len(ph)}
            AS BIGINT) AS n_hits
FROM documents
WHERE contains(text, '{ph}')"""


_TFIDF_K = 3


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF
    (operators/retrieval.py tfidf_topk): tf·ln(N/df) with the pinned
    exact-long-ratio + ln chain, (score DESC, term ASC) window pick —
    the keyword-extraction complement of the BM25 gate."""
    from .operators.retrieval import tfidf_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_topk(docs, k=_TFIDF_K)


def sql_tfidf_topk() -> str:
    return rf"""WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents),
toks AS (SELECT doc_id, unnest(ws) AS term FROM words),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
dfq AS (SELECT term, COUNT(*) AS df_ FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df_,
         CAST(tf.tf AS DOUBLE)
           * ln(CAST((SELECT n FROM nd) AS DOUBLE)
                / CAST(dfq.df_ AS DOUBLE)) AS score
  FROM tf JOIN dfq USING (term)),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rk
  FROM scored)
SELECT doc_id, term, tf, df_, score, rk FROM r WHERE rk <= {_TFIDF_K}"""


RETRIEVAL_QUERIES = {
    "bm25_topk": (q_bm25_topk, sql_bm25_topk),
    "knn_classify": (q_knn_classify, sql_knn_classify),
    "phrase_search": (q_phrase_search, sql_phrase_search),
    "tfidf_topk": (q_tfidf_topk, sql_tfidf_topk),
}


_NEAR_A, _NEAR_B, _NEAR_W = "hash", "join", 2


def q_near_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search (operators/retrieval.py near_query): in-row
    positional gap evaluation — zero shuffles, one map-only scan."""
    from .operators.retrieval import near_query

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return near_query(docs, _NEAR_A, _NEAR_B, _NEAR_W)


def sql_near_query() -> str:
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x != '') AS ws
  FROM documents),
pos AS (
  SELECT doc_id,
         list_filter(range(1, len(ws)+1), i -> ws[i] = '{_NEAR_A}') AS pa,
         list_filter(range(1, len(ws)+1), i -> ws[i] = '{_NEAR_B}') AS pb
  FROM w),
g AS (
  SELECT doc_id,
         list_filter(flatten(list_transform(pa, x ->
             list_transform(pb, y -> abs(x - y)))),
             d -> d <= {_NEAR_W}) AS hit
  FROM pos)
SELECT doc_id, CAST(len(hit) AS BIGINT) AS n_pairs,
       CAST(list_min(hit) AS BIGINT) AS min_gap
FROM g WHERE len(hit) >= 1"""


RETRIEVAL_QUERIES["near_query"] = (q_near_query, sql_near_query)


_RRF_DEPTH = 50
_RRF_K = 20
_RRF_C = 60
_RRF_QVEC = 0          # the dense query: embedding of vec_id 0
_RRF_SCALE_V = 1000    # int-dot quantization


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (operators/retrieval.py rrf_fuse): BM25 lexical
    top-50 and exact-integer-dot dense top-50 (similarity.py
    int_dot_topk, query = embedding 0) fused by reciprocal-rank with
    scaled-integer weights — ranks, weights, sums, and tie-breaks all
    engine-exact.  doc_id and vec_id share the synthetic id domain, so
    the two lists fuse on the document key."""
    from .operators.retrieval import rrf_fuse
    from .operators.similarity import int_dot_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = bm25_topk(docs, list(_QUERY), k=_RRF_DEPTH, k1=_K1, b=_B) \
        .select("doc_id", "rank")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dense = int_dot_topk(
        emb.filter(F.col("vec_id") == _RRF_QVEC), emb, _RRF_DEPTH,
        scale=_RRF_SCALE_V, query_id="vec_id", corpus_id="vec_id",
    ).select(F.col("c_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, dense], k=_RRF_K, c=_RRF_C)


def sql_rrf_fusion() -> str:
    s = float(_RRF_SCALE_V)
    return f"""
WITH {_sql_bm25_scored()},
lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
    FROM scored) WHERE rank <= {_RRF_DEPTH}),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {_RRF_QVEC}),
dots AS (
  SELECT e.vec_id AS doc_id,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM embeddings e, qv q),
dense AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id) AS rank
    FROM dots) WHERE rank <= {_RRF_DEPTH}),
un AS (
  SELECT doc_id,
         CAST(1000000000000000 AS BIGINT) // (CAST({_RRF_C} AS BIGINT)
                                              + rank) AS w
  FROM lex
  UNION ALL
  SELECT doc_id,
         CAST(1000000000000000 AS BIGINT) // (CAST({_RRF_C} AS BIGINT)
                                              + rank) AS w
  FROM dense),
fused AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS rrf,
         COUNT(*) AS n_lists
  FROM un GROUP BY 1)
SELECT doc_id, rrf, n_lists, rank FROM (
  SELECT doc_id, rrf, n_lists,
         ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank
  FROM fused) WHERE rank <= {_RRF_K}"""


RETRIEVAL_QUERIES["rrf_fusion"] = (q_rrf_fusion, sql_rrf_fusion)


_PRF_KDOCS = 10
_PRF_KTERMS = 20


def q_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRF query expansion (operators/retrieval.py prf_expansion):
    BM25 top-10 feedback docs pool their vocabulary; candidates rank by
    exact integer (feedback df, pooled tf, term) evidence."""
    from .operators.retrieval import prf_expansion

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return prf_expansion(docs, list(_QUERY), k_docs=_PRF_KDOCS,
                         k_terms=_PRF_KTERMS, k1=_K1, b=_B)


def sql_query_expansion() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY)
    return f"""
WITH {_sql_bm25_scored()},
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
    FROM scored) WHERE rank <= {_PRF_KDOCS}),
pool AS (
  SELECT t.doc_id, t.term
  FROM toks t JOIN fb USING (doc_id)
  WHERE t.term NOT IN ({terms})),
agg AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df_fb, COUNT(*) AS tf_fb
  FROM pool GROUP BY 1)
SELECT term, df_fb, tf_fb, rank FROM (
  SELECT term, df_fb, tf_fb,
         ROW_NUMBER() OVER (ORDER BY df_fb DESC, tf_fb DESC,
                            term ASC) AS rank
  FROM agg) WHERE rank <= {_PRF_KTERMS}"""


RETRIEVAL_QUERIES["query_expansion"] = (q_query_expansion,
                                        sql_query_expansion)


_NDCG_K = 10
_NDCG_QMOD = 5


def q_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the exact-dot dense ranking against label relevance
    (operators/metrics.py ndcg_at_k over similarity.int_dot_topk):
    every 5th vector queries the rest; gains are scaled-integer
    literals, so DCG/IDCG are exact integer sums."""
    from .operators.metrics import ndcg_at_k
    from .operators.similarity import int_dot_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % _NDCG_QMOD == 0)
    c = emb.filter(F.col("vec_id") % _NDCG_QMOD != 0)
    top = int_dot_topk(q, c, _NDCG_K, scale=_KC_SCALE,
                       query_id="vec_id", corpus_id="vec_id")
    ql = q.select(F.col("vec_id").alias("q_id"),
                  F.col("label").alias("_ql"))
    cl = c.select(F.col("vec_id").alias("c_id"),
                  F.col("label").alias("_cl"))
    nrel = (c.groupBy(F.col("label").alias("_ql"))
            .agg(F.count(F.lit(1)).alias("n_rel")))
    ranking = (top.join(F.broadcast(ql), "q_id")
               .join(F.broadcast(cl), "c_id")
               .withColumn("rel", (F.col("_ql") == F.col("_cl"))
                           .cast("long"))
               .join(F.broadcast(nrel), "_ql", "left")
               .withColumn("n_rel", F.coalesce("n_rel", F.lit(0))))
    return ndcg_at_k(ranking, _NDCG_K)


def sql_ndcg_at_k() -> str:
    from .operators.metrics import ndcg_gain_weights

    k, m, s = _NDCG_K, _NDCG_QMOD, _KC_SCALE
    ws = ndcg_gain_weights(k)
    gain_case = " ".join(f"WHEN {r + 1} THEN {w}"
                         for r, w in enumerate(ws))
    prefix = [0]
    for w in ws:
        prefix.append(prefix[-1] + w)
    idcg_case = " ".join(f"WHEN {i} THEN {p}"
                         for i, p in enumerate(prefix))
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS ql, embedding AS v FROM embeddings
  WHERE vec_id % {m} = 0),
c AS (
  SELECT vec_id AS c_id, label AS cl, embedding AS v
  FROM embeddings WHERE vec_id % {m} <> 0),
dots AS (
  SELECT q.q_id, q.ql, c.c_id, c.cl,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(c.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(q.v) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM q, c),
rk AS (
  SELECT q_id, ql, cl,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dot DESC, c_id ASC) AS rank
  FROM dots),
nr AS (SELECT cl AS ql, COUNT(*) AS n_rel FROM c GROUP BY 1),
dcg AS (
  SELECT rk.q_id,
         CAST(SUM(CASE WHEN rk.ql = rk.cl
                       THEN CASE rank {gain_case} ELSE 0 END
                       ELSE 0 END) AS BIGINT) AS dcg_s,
         MAX(COALESCE(nr.n_rel, 0)) AS nrel
  FROM rk LEFT JOIN nr ON nr.ql = rk.ql
  WHERE rank <= {k}
  GROUP BY 1)
SELECT q_id,
       dcg_s,
       CAST(CASE LEAST(nrel, {k}) {idcg_case} ELSE 0 END AS BIGINT)
         AS idcg_s,
       CASE WHEN (CASE LEAST(nrel, {k}) {idcg_case} ELSE 0 END) > 0
            THEN CAST(dcg_s AS DOUBLE)
                 / CAST(CASE LEAST(nrel, {k}) {idcg_case}
                        ELSE 0 END AS DOUBLE) END AS ndcg
FROM dcg"""


RETRIEVAL_QUERIES["ndcg_at_k"] = (q_ndcg_at_k, sql_ndcg_at_k)


def q_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP@10 + MRR@10 of the exact-dot dense ranking
    (operators/metrics.py map_mrr_at_k over the ndcg_at_k substrate):
    with L = lcm(1..10) = 2520, precision terms cumrel·(L/rank) and
    reciprocal ranks L/rank are exact integers — both corpus metrics
    are exact integer ratios, one pinned division each."""
    from .operators.metrics import map_mrr_at_k
    from .operators.similarity import int_dot_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % _NDCG_QMOD == 0)
    c = emb.filter(F.col("vec_id") % _NDCG_QMOD != 0)
    top = int_dot_topk(q, c, _NDCG_K, scale=_KC_SCALE,
                       query_id="vec_id", corpus_id="vec_id")
    ql = q.select(F.col("vec_id").alias("q_id"),
                  F.col("label").alias("_ql"))
    cl = c.select(F.col("vec_id").alias("c_id"),
                  F.col("label").alias("_cl"))
    ranking = (top.join(F.broadcast(ql), "q_id")
               .join(F.broadcast(cl), "c_id")
               .withColumn("rel", (F.col("_ql") == F.col("_cl"))
                           .cast("long")))
    return map_mrr_at_k(ranking, _NDCG_K)


def sql_map_mrr() -> str:
    import math

    k, m, s = _NDCG_K, _NDCG_QMOD, _KC_SCALE
    L = math.lcm(*range(1, k + 1))
    w_case = " ".join(f"WHEN {r} THEN {L // r}" for r in range(1, k + 1))
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS ql, embedding AS v FROM embeddings
  WHERE vec_id % {m} = 0),
c AS (
  SELECT vec_id AS c_id, label AS cl, embedding AS v
  FROM embeddings WHERE vec_id % {m} <> 0),
dots AS (
  SELECT q.q_id, q.ql, c.c_id, c.cl,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(c.v[i.i] AS DOUBLE) * {float(s)!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(q.v) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM q, c),
rk AS (
  SELECT q_id, CASE WHEN ql = cl THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dot DESC, c_id ASC) AS rank
  FROM dots),
t AS (
  SELECT q_id, rel, rank,
         SUM(rel) OVER (PARTITION BY q_id ORDER BY rank
                        ROWS UNBOUNDED PRECEDING) AS cum,
         CASE rank {w_case} ELSE 0 END AS w
  FROM rk WHERE rank <= {k}),
per_q AS (
  SELECT q_id,
         CAST(SUM(CASE WHEN rel = 1 THEN cum * w ELSE 0 END)
              AS BIGINT) AS ap_l,
         CAST(MAX(CASE WHEN rel = 1 THEN w ELSE 0 END)
              AS BIGINT) AS rr_l
  FROM t GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_q,
       CAST(SUM(ap_l) AS BIGINT) AS sum_ap_l,
       CAST(SUM(rr_l) AS BIGINT) AS sum_rr_l,
       CASE WHEN COUNT(*) > 0 THEN
         CAST(SUM(ap_l) AS DOUBLE)
           / CAST(COUNT(*) * {L} * {k} AS DOUBLE) END AS map_at_k,
       CASE WHEN COUNT(*) > 0 THEN
         CAST(SUM(rr_l) AS DOUBLE)
           / CAST(COUNT(*) * {L} AS DOUBLE) END AS mrr_at_k
FROM per_q"""


RETRIEVAL_QUERIES["map_mrr"] = (q_map_mrr, sql_map_mrr)


_RBO_DEPTH = 20
_RBO_P = 0.9


def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO curve between the BM25 lexical top-20 and the dense
    int-dot top-20 (operators/retrieval.py rbo_curve): exact overlap
    counts per depth, python-literal geometric weights (no
    cross-engine pow), pinned-order cumulative fold — how much the
    two searchers rrf_fusion merges already agree, rank-weighted."""
    from .operators.retrieval import rbo_curve
    from .operators.similarity import int_dot_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = bm25_topk(docs, list(_QUERY), k=_RBO_DEPTH, k1=_K1, b=_B) \
        .select("doc_id", "rank")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dense = int_dot_topk(
        emb.filter(F.col("vec_id") == _RRF_QVEC), emb, _RBO_DEPTH,
        scale=_RRF_SCALE_V, query_id="vec_id", corpus_id="vec_id",
    ).select(F.col("c_id").alias("doc_id"), "rank")
    return rbo_curve(lex, dense, depth=_RBO_DEPTH, p=_RBO_P)


def sql_rbo_overlap() -> str:
    s = float(_RRF_SCALE_V)
    k = _RBO_DEPTH
    wcase = " ".join(
        f"WHEN {d} THEN {_RBO_P ** (d - 1)!r}" for d in range(1, k + 1))
    one_minus_p = 1.0 - _RBO_P
    return f"""
WITH {_sql_bm25_scored()},
lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
    FROM scored) WHERE rank <= {k}),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {_RRF_QVEC}),
dots AS (
  SELECT e.vec_id AS doc_id,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM embeddings e, qv q),
dense AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id) AS rank
    FROM dots) WHERE rank <= {k}),
m AS (
  SELECT GREATEST(l.rank, d.rank) AS m
  FROM lex l JOIN dense d USING (doc_id)
  WHERE GREATEST(l.rank, d.rank) <= {k}),
cnt AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS x_d
  FROM (SELECT unnest(generate_series(m, {k})) AS d FROM m)
  GROUP BY 1),
alld AS (
  SELECT r.d, COALESCE(c.x_d, 0) AS x_d
  FROM (SELECT unnest(generate_series(1, {k})) AS d) r
  LEFT JOIN cnt c USING (d)),
terms AS (
  SELECT CAST(d AS BIGINT) AS d, CAST(x_d AS BIGINT) AS x_d,
         (CAST(x_d AS DOUBLE) * (CASE d {wcase} END))
           / CAST(d AS DOUBLE) AS t
  FROM alld)
SELECT d, x_d,
       {one_minus_p!r} * SUM(t) OVER (ORDER BY d
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS rbo_at_d
FROM terms"""


RETRIEVAL_QUERIES["rbo_overlap"] = (q_rbo_overlap, sql_rbo_overlap)


_LM_MU = 2000.0
_LM_K = 20


def q_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood Dirichlet-smoothed LM retrieval
    (operators/retrieval.py lm_dirichlet_topk): the standard ranking
    beside bm25_topk — same tokenize/postings substrate, collection
    model cf/|C|, sparse-evaluation rewrite so only matching postings
    are scanned.  Scores rounded to 4 dp; ranking on the unrounded
    score with doc_id tiebreak (the bm25 gate's contract)."""
    from .operators.retrieval import lm_dirichlet_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = lm_dirichlet_topk(docs, list(_QUERY), k=_LM_K, mu=_LM_MU)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "rank")


def sql_lm_dirichlet_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY)
    mu = float(_LM_MU)
    return f"""
WITH {_sql_bm25_scored()},
coll AS (SELECT CAST(SUM(tf) AS BIGINT) AS t FROM tf),
qcf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
  WHERE term IN ({terms}) GROUP BY 1),
qconst AS (
  SELECT COUNT(*) AS nq,
         SUM(ln({mu!r} * (CAST(cf AS DOUBLE) / (SELECT t FROM coll))))
           AS c
  FROM qcf),
lm AS (
  SELECT tf.doc_id,
         SUM(ln(CAST(tf.tf AS DOUBLE)
                + {mu!r} * (CAST(q.cf AS DOUBLE)
                            / (SELECT t FROM coll)))
             - ln({mu!r} * (CAST(q.cf AS DOUBLE)
                            / (SELECT t FROM coll)))) AS s,
         MAX(dl.dl) AS dl
  FROM tf JOIN qcf q USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id),
fin AS (
  SELECT doc_id,
         s + (SELECT c FROM qconst)
           - (SELECT nq FROM qconst)
             * ln(CAST(dl AS DOUBLE) + {mu!r}) AS score
  FROM lm)
SELECT doc_id, ROUND(score, 4) AS score, rank FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM fin) WHERE rank <= {_LM_K}"""


RETRIEVAL_QUERIES["lm_dirichlet_topk"] = (q_lm_dirichlet_topk,
                                          sql_lm_dirichlet_topk)


_MMR_N = 20     # first-stage rerank window
_MMR_K = 5      # diversified picks
_MMR_LN = 7     # lambda = 7/10
_MMR_LD = 10


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (operators/retrieval.py mmr_rerank) of the
    dense int-dot top-20 for query embedding 0: greedy
    lambda-rel-minus-maxsim selection carried entirely in exact longs
    (x10-scaled objective 7*rel - 3*maxsim), candidate-pair
    similarities from one bounded 20x20 integer-dot cross join."""
    from .operators.retrieval import mmr_rerank
    from .operators.similarity import int_dot_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cand = int_dot_topk(
        emb.filter(F.col("vec_id") == _RRF_QVEC), emb, _MMR_N,
        scale=_RRF_SCALE_V, query_id="vec_id", corpus_id="vec_id",
    ).select("c_id", "dot")

    def quant(col):
        return F.transform(
            col, lambda x: F.floor(
                x.cast("double") * F.lit(float(_RRF_SCALE_V))
                + F.lit(0.5)).cast("long"))

    cv = (emb.join(F.broadcast(cand.select("c_id")),
                   emb["vec_id"] == F.col("c_id"))
          .select(F.col("c_id").alias("id"),
                  quant(F.col("embedding")).alias("v")))
    a = cv.select(F.col("id").alias("a_id"), F.col("v").alias("va"))
    b = cv.select(F.col("id").alias("b_id"), F.col("v").alias("vb"))
    sims = (a.crossJoin(F.broadcast(b))  # bounded N x N pair window
            .filter(F.col("a_id") != F.col("b_id"))
            .select("a_id", "b_id",
                    F.aggregate(
                        F.zip_with("va", "vb", lambda x, y: x * y),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x).alias("sim")))
    return mmr_rerank(cand, sims, _MMR_K, lam_num=_MMR_LN,
                      lam_den=_MMR_LD, id_col="c_id", rel_col="dot")


def sql_mmr_rerank() -> str:
    s = float(_RRF_SCALE_V)
    ln, lm = _MMR_LN, _MMR_LD - _MMR_LN
    rounds = []
    for r in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT c_id FROM sel{i}" for i in range(1, r))
        rounds.append(f"""sel{r} AS MATERIALIZED (
  SELECT c_id, dot, mmr FROM (
    SELECT c.c_id, c.dot, {ln} * c.dot - {lm} * ms.m AS mmr,
           ROW_NUMBER() OVER (
             ORDER BY {ln} * c.dot - {lm} * ms.m DESC, c.c_id) AS rn
    FROM cand c
    JOIN (SELECT a_id, MAX(sim) AS m FROM pairs
          WHERE b_id IN ({prev}) GROUP BY a_id) ms
      ON ms.a_id = c.c_id
    WHERE c.c_id NOT IN ({prev}))
  WHERE rn = 1)""")
    finals = " UNION ALL ".join(
        f"SELECT {r} AS rank, c_id, dot AS rel, mmr FROM sel{r}"
        for r in range(1, _MMR_K + 1))
    return f"""
WITH qv AS (SELECT embedding AS v FROM embeddings
            WHERE vec_id = {_RRF_QVEC}),
dots AS (
  SELECT e.vec_id AS doc_id,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(q.v[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i)
          AS BIGINT) AS dot
  FROM embeddings e, qv q),
cand AS MATERIALIZED (
  SELECT doc_id AS c_id, dot FROM (
    SELECT doc_id, dot,
           ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id) AS rn
    FROM dots) WHERE rn <= {_MMR_N}),
cvec AS MATERIALIZED (
  SELECT c.c_id, e.embedding AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.c_id),
pairs AS MATERIALIZED (
  SELECT a.c_id AS a_id, b.c_id AS b_id,
         CAST((SELECT SUM(
              CAST(FLOOR(CAST(a.v[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT)
            * CAST(FLOOR(CAST(b.v[i.i] AS DOUBLE) * {s!r} + 0.5)
                   AS BIGINT))
          FROM (SELECT unnest(range(1, len(a.v) + 1)) AS i) i)
          AS BIGINT) AS sim
  FROM cvec a, cvec b WHERE a.c_id <> b.c_id),
sel1 AS MATERIALIZED (
  SELECT c_id, dot, {ln} * dot AS mmr FROM cand
  ORDER BY dot DESC, c_id LIMIT 1),
{",".join(rounds)}
{finals}"""


RETRIEVAL_QUERIES["mmr_rerank"] = (q_mmr_rerank, sql_mmr_rerank)


_ERR_K, _ERR_GMAX, _ERR_QMOD = 8, 4, 37


def q_err_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@8 cascade metric (operators/metrics.py err_at_k) over a
    deterministic graded ranking: query = event_id mod 37, ranks by
    arrival order, grade = value-cents mod 5 — the whole cascade
    (stop probabilities, prefix products, reciprocal-rank weights)
    is ONE exact scaled-integer fold per query."""
    from pyspark.sql import Window
    from .operators.metrics import err_at_k
    from .queries_curation import _cents

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.pmod(F.col("event_id"), F.lit(_ERR_QMOD))
                  .alias("q_id"),
                  F.pmod(_cents(), F.lit(5)).alias("grade"),
                  "ts", "event_id"))
    w = Window.partitionBy("q_id").orderBy("ts", "event_id")
    ranking = ev.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= _ERR_K).select("q_id", "rank", "grade")
    return err_at_k(ranking, _ERR_K, g_max=_ERR_GMAX)


def sql_err_at_k() -> str:
    import math as _m

    k, gm, qm = _ERR_K, _ERR_GMAX, _ERR_QMOD
    L = _m.lcm(*range(1, k + 1))
    D = 1 << gm
    w_case = " ".join(f"WHEN {r} THEN {(L // r) * (D ** (k - r))}"
                      for r in range(1, k + 1))
    return f"""WITH e AS (
  SELECT event_id % {qm} AS q_id,
         ((CAST(floor(value * 100 + 0.5) AS BIGINT) % 5) + 5) % 5 AS g,
         ts, event_id
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
r AS (
  SELECT q_id, g,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY ts, event_id) AS rank
  FROM e),
t AS (
  SELECT q_id, rank, (CAST(1 AS BIGINT) << g) - 1 AS num
  FROM r WHERE rank <= {k}),
p AS (
  SELECT q_id, rank, num,
         CAST(COALESCE(product(CAST({D} - num AS DOUBLE)) OVER (
                PARTITION BY q_id ORDER BY rank
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              1.0) AS BIGINT) AS pp
  FROM t)
SELECT q_id,
       CAST(SUM((CASE rank {w_case} END) * num * pp) AS BIGINT)
         AS err_s,
       CAST(SUM((CASE rank {w_case} END) * num * pp) AS DOUBLE)
         / CAST({L * (D ** k)} AS DOUBLE) AS err
FROM p GROUP BY q_id"""


RETRIEVAL_QUERIES["err_at_k"] = (q_err_at_k, sql_err_at_k)


_BP_TERMS = ["spark", "table", "join"]
_BP_WIDTH = 12


def q_best_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-passage snippet extraction over the document corpus
    (operators/retrieval.py best_passage): the 12-token window with
    the most query-term hits, leftmost on ties — in-row window
    scoring, exact counts, md5-hashed snippet."""
    from .operators.retrieval import best_passage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return best_passage(docs, _BP_TERMS, width=_BP_WIDTH)


def sql_best_passage() -> str:
    w = _BP_WIDTH
    inlist = ", ".join(f"'{t}'" for t in sorted(_BP_TERMS))
    return f"""WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
wds AS (
  SELECT doc_id, unnest(l) AS word,
         unnest(generate_series(1, len(l))) AS ord
  FROM d WHERE len(l) > 0),
h AS (
  SELECT doc_id, word, ord,
         CASE WHEN word IN ({inlist}) THEN 1 ELSE 0 END AS hit
  FROM wds),
sc AS (
  SELECT doc_id, ord AS st,
         SUM(hit) OVER (PARTITION BY doc_id ORDER BY ord
                        ROWS BETWEEN CURRENT ROW
                        AND {w - 1} FOLLOWING) AS score,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM h),
el AS (
  SELECT doc_id, st, score, n FROM sc
  WHERE st <= greatest(n - {w} + 1, 1)),
best AS (
  SELECT doc_id, st, score, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, st) AS rnk
  FROM el)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(b.st AS BIGINT) AS best_start,
       CAST(b.score AS BIGINT) AS best_score,
       md5(string_agg(wds.word, ' ' ORDER BY wds.ord)) AS snippet_md5
FROM best b
JOIN wds ON wds.doc_id = b.doc_id
        AND wds.ord BETWEEN b.st AND b.st + {w} - 1
WHERE b.rnk = 1
GROUP BY b.doc_id, b.n, b.st, b.score"""


RETRIEVAL_QUERIES["best_passage"] = (q_best_passage, sql_best_passage)


_JM_LAM = 0.4


def q_lm_jm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer smoothed LM retrieval (operators/retrieval.py
    lm_jm_topk): the linear-interpolation companion of the Dirichlet
    gate on the same postings substrate and query; scores rounded to
    4 dp, rank on the unrounded score with doc_id tiebreak."""
    from .operators.retrieval import lm_jm_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = lm_jm_topk(docs, list(_QUERY), k=_LM_K, lam=_JM_LAM)
    return top.select("doc_id", F.round("score", 4).alias("score"),
                      "rank")


def sql_lm_jm_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY)
    lam = float(_JM_LAM)
    om = 1.0 - lam
    return f"""
WITH {_sql_bm25_scored()},
coll AS (SELECT CAST(SUM(tf) AS BIGINT) AS t FROM tf),
qcf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
  WHERE term IN ({terms}) GROUP BY 1),
qconst AS (
  SELECT SUM(ln({om!r} * (CAST(cf AS DOUBLE) / (SELECT t FROM coll))))
           AS c
  FROM qcf),
lm AS (
  SELECT tf.doc_id,
         SUM(ln({lam!r} * (CAST(tf.tf AS DOUBLE)
                           / CAST(dl.dl AS DOUBLE))
                + {om!r} * (CAST(q.cf AS DOUBLE)
                            / (SELECT t FROM coll)))
             - ln({om!r} * (CAST(q.cf AS DOUBLE)
                            / (SELECT t FROM coll)))) AS s
  FROM tf JOIN qcf q USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id),
fin AS (
  SELECT doc_id, s + (SELECT c FROM qconst) AS score FROM lm)
SELECT doc_id, ROUND(score, 4) AS score, rank FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM fin) WHERE rank <= {_LM_K}"""


RETRIEVAL_QUERIES["lm_jm_topk"] = (q_lm_jm_topk, sql_lm_jm_topk)


_MCW_TERMS = ("table", "value", "row")


def q_min_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal covering window for a 3-term query over documents
    (operators/retrieval.py min_cover_window): anchored next-occurrence
    scan in exact integer positions, leftmost-minimal tie rule — the
    proximity signal beside bm25/phrase_search; oracle is the
    INDEPENDENT relational anchor×term min/max, not a fold mirror."""
    from .operators.retrieval import min_cover_window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return min_cover_window(docs, list(_MCW_TERMS))


def sql_min_cover() -> str:
    terms = ", ".join(f"'{t}'" for t in _MCW_TERMS)
    k = len(_MCW_TERMS)
    return f"""WITH toks AS (
  SELECT doc_id, t.i - 1 AS pos, w[t.i] AS tok
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(text), '\\s+') AS w
        FROM documents),
       LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) t),
occ AS (SELECT doc_id, pos, tok FROM toks
        WHERE tok IN ({terms})),
nxt AS (
  SELECT a.doc_id, a.pos AS p, o.tok, MIN(o.pos) AS np
  FROM occ a JOIN occ o ON o.doc_id = a.doc_id AND o.pos >= a.pos
  GROUP BY 1, 2, 3),
win AS (
  SELECT doc_id, p, MAX(np) AS e
  FROM nxt GROUP BY 1, 2 HAVING COUNT(*) = {k}),
best AS (
  SELECT doc_id, e - p + 1 AS win_len, p AS lo, e AS hi,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY e - p + 1, p) AS rn
  FROM win)
SELECT doc_id, win_len, lo, hi FROM best WHERE rn = 1"""


RETRIEVAL_QUERIES["min_cover"] = (q_min_cover, sql_min_cover)
