"""Text retrieval scoring: BM25 over the documents table, with a
persistent bucketed inverted index for the at-scale query path.

A curation pipeline uses retrieval scoring to mine topical subsets
("find me docs about X") and to grade quality against seed queries; at
100 TB that must not rescan the corpus per query.  Shapes:

- ``bm25_scores`` / ``bm25_topk`` — corpus-scan path: tokenize once,
  filter postings to the query terms EARLY (before any aggregation
  beyond the per-doc term counts), join the tiny per-term df/idf table
  by broadcast.  One shuffle on doc_id for the final per-doc sum.
- ``write_term_index`` — the postings list (term, doc_id, tf, dl)
  written BUCKETED by term, plus a one-row stats sidecar (N, avgdl).
  ``bm25_topk(index_path=...)`` probes it with ``term IN (query)`` —
  a bucket-pruned scan of only the query terms' posting lists, the
  inverted-index access path (same discipline as the IVF/LSH/kNN
  persistent indexes in this repo).

Scoring: Lucene-flavored BM25 — ``idf = ln(1 + (N - df + ½)/(df + ½))``,
``tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))`` — standard public formula.
Tokenization matches operators/text.py (_words): lowercase whitespace
split, the same stream every text gate already oracle-matches.
"""

from __future__ import annotations

import math
import os
import re
from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _words

__all__ = [
    "doc_terms",
    "doc_trigrams",
    "bm25_scores",
    "bm25_topk",
    "tfidf_topk",
    "phrase_search",
    "near_query",
    "rrf_fuse",
    "prf_expansion",
    "write_term_index",
    "write_trigram_index",
    "read_term_index",
    "rbo_curve",
    "lm_dirichlet_topk",
    "mmr_rerank",
]

_STATS = "_stats"  # sidecar subdir of the term index


def _index_table_name(prefix: str, path: str) -> str:
    """Default table name from the path basename, sanitized to a valid
    unquoted SQL identifier (paths with '-'/'.' would otherwise crash
    the DROP TABLE / saveAsTable statements)."""
    base = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(path.rstrip("/")))
    return prefix + base


@contextmanager
def _pinned_bucket_probe(spark):
    """Pin autoBucketedScan OFF for a persistent-index probe: the planner
    otherwise disables the bucketed read (and with it bucket pruning on
    the IN-list) when no join needs the distribution.  Callers must
    eagerly materialize (localCheckpoint) anything returned before the
    conf is restored."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, saved)


def _write_bucketed_postings(postings: DataFrame, path: str, *,
                             bucket_col: str, name: str,
                             n_buckets: int) -> None:
    """Shared index-writer scaffolding: drop + bucketed/sorted external
    postings table (single-column spec — Spark bucket pruning only
    engages on those)."""
    spark = postings.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (postings.write.mode("overwrite")
     .option("path", os.path.join(path, "postings"))
     .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
     .format("parquet").saveAsTable(name))


def doc_terms(docs: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Postings rows: (id, term, tf, dl) — term frequency and document
    length from ONE tokenize+explode pass."""
    terms = (docs
             .select(F.col(id_col), F.explode(_words(F.col(text_col)))
                     .alias("term")))
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf.join(dl, id_col)


def _corpus_stats(postings: DataFrame, id_col: str) -> tuple[int, float]:
    r = (postings.groupBy(id_col).agg(F.first("dl").alias("dl"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("dl").alias("s")).first())
    return int(r["n"]), float(r["s"]) / int(r["n"])


def _score(postings: DataFrame, query_terms: list[str], *,
           id_col: str, n_docs: int, avgdl: float,
           k1: float, b: float) -> DataFrame:
    if not query_terms:
        raise ValueError("empty query")
    q = postings.filter(F.col("term").isin(list(query_terms)))
    df_tbl = q.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))  # one row per (doc,term) → count
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    per_term = (q.join(F.broadcast(df_tbl.withColumn("idf", idf)
                                   .select("term", "idf")), "term")
                .withColumn(
                    "w",
                    F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                    / (F.col("tf") + F.lit(k1)
                       * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("dl") / F.lit(avgdl)))))
    return per_term.groupBy(id_col).agg(F.sum("w").alias("score"))


def bm25_scores(docs: DataFrame, query_terms: list[str], *,
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id, score) for every document matching ≥ 1 query term."""
    postings = doc_terms(docs, id_col=id_col, text_col=text_col)
    n_docs = docs.count()
    _, avgdl = _corpus_stats(postings, id_col)
    return _score(postings, query_terms, id_col=id_col, n_docs=n_docs,
                  avgdl=avgdl, k1=k1, b=b)


def bm25_topk(spark_or_docs, query_terms: list[str], *, k: int,
              index_path: str | None = None,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k by (score desc, id asc).  With ``index_path`` the first
    argument is the SparkSession and postings come from the bucketed
    term index (pruned to the query terms' buckets); otherwise it is the
    documents DataFrame and the corpus is tokenized in-flight."""
    from pyspark.sql import SparkSession, Window

    if index_path is not None:
        spark = spark_or_docs
        assert isinstance(spark, SparkSession)
        # same planner pin as the IVF/LSH/kNN persistent-index probes
        # (_pinned_bucket_probe); the tiny top-k is eagerly
        # localCheckpoint-ed so post-return consumption never re-plans
        # the probe with the conf restored.
        with _pinned_bucket_probe(spark):
            postings, n_docs, avgdl = read_term_index(spark, index_path)
            scores = _score(postings, query_terms, id_col=id_col,
                            n_docs=n_docs, avgdl=avgdl, k1=k1, b=b)
            return _rank_topk(scores, id_col, k).localCheckpoint()
    else:
        scores = bm25_scores(spark_or_docs, query_terms, id_col=id_col,
                             text_col=text_col, k1=k1, b=b)
    return _rank_topk(scores, id_col, k)


def _rank_topk(scores: DataFrame, id_col: str, k: int) -> DataFrame:
    """Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    (per-partition heaps, no single-partition window over the full score
    set); the rank window then runs over only the k survivors."""
    from pyspark.sql import Window

    top = scores.orderBy(F.col("score").desc(), F.col(id_col).asc()) \
        .limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def write_term_index(docs: DataFrame, path: str, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64,
                     table_name: str | None = None) -> str:
    """Materialize the inverted index: postings bucketed+sorted by term
    (single-column spec — Spark bucket pruning only engages on those) +
    a (N, avgdl) stats sidecar.  Returns the table name."""
    spark = docs.sparkSession
    postings = doc_terms(docs, id_col=id_col, text_col=text_col)
    name = table_name or _index_table_name("term_idx_", path)
    _write_bucketed_postings(postings, path, bucket_col="term",
                             name=name, n_buckets=n_buckets)
    n_docs = docs.count()
    _, avgdl = _corpus_stats(postings, id_col)
    spark.createDataFrame([(n_docs, avgdl)], "n_docs long, avgdl double") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, _STATS))
    return name


def read_term_index(spark, path: str,
                    table_name: str | None = None):
    """(postings DataFrame, n_docs, avgdl) from a written index."""
    name = table_name or _index_table_name("term_idx_", path)
    postings = spark.table(name)
    r = spark.read.parquet(os.path.join(path, _STATS)).first()
    return postings, int(r["n_docs"]), float(r["avgdl"])


def exact_idf(n_docs: int, df: int) -> float:
    """Python twin of the idf expression (tests)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def doc_trigrams(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(gram, doc_id): DISTINCT character trigrams per document — the
    pg_trgm-style substring-search statistic, built with in-row HOFs
    (sequence → substr → array_distinct) and one explode; no UDF."""
    t = F.col(text_col)
    tri = F.when(
        F.length(t) >= 3,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)))),
    ).otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col), F.explode(tri).alias("gram"))
            .select("gram", id_col))


def write_trigram_index(docs: DataFrame, path: str, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = 64,
                        table_name: str | None = None) -> str:
    """Materialize the substring index: trigram postings bucketed+sorted
    by gram (single-column spec, same bucket-pruning discipline as the
    term/IVF/LSH/kNN indexes).  Returns the table name."""
    name = table_name or _index_table_name("trgm_idx_", path)
    _write_bucketed_postings(
        doc_trigrams(docs, id_col=id_col, text_col=text_col), path,
        bucket_col="gram", name=name, n_buckets=n_buckets)
    return name


def phrase_search(docs: DataFrame, phrase: str, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  index_table: str | None = None) -> DataFrame:
    """Exact substring search at corpus scale (grep over 100 TB):
    candidate docs from the trigram postings (must contain EVERY phrase
    trigram — postings are distinct per (gram, doc), so a count equality
    is the ALL-grams test), then exact verification with an occurrence
    count.  Returns (doc_id, n_hits), n_hits >= 1.

    - corpus-scan path: postings built in flight and pruned to the
      probe grams BEFORE the aggregation (the filter rides the explode).
    - ``index_table`` (write_trigram_index) is the production path:
      ``gram IN (<phrase grams>)`` probes the bucketed postings — a
      bucket-pruned scan of just the phrase's posting lists; only the
      candidate docs' texts are then touched (broadcast semi-join).
    """
    if len(phrase) < 3:
        raise ValueError("phrase must be at least 3 characters")
    grams = sorted({phrase[i:i + 3] for i in range(len(phrase) - 2)})

    def _run(post):
        # countDistinct, not count: duplicate doc_id rows (or any
        # non-distinct postings) would otherwise overshoot the ALL-grams
        # equality and silently drop every hit for that doc
        cand = (post.filter(F.col("gram").isin(grams))
                .groupBy(id_col)
                .agg(F.countDistinct("gram").alias("_ng"))
                .filter(F.col("_ng") == len(grams))
                .select(id_col))
        t = F.col(text_col)
        diff = (F.length(t)
                - F.length(F.replace(t, F.lit(phrase), F.lit(""))))
        # no broadcast hint: the candidate set is data-dependent (a
        # common-trigram phrase can select much of the corpus) — let
        # AQE pick broadcast vs shuffle from the actual size
        return (docs.join(cand, id_col, "left_semi")
                .select(F.col(id_col),
                        (diff / F.lit(len(phrase))).cast("long")
                        .alias("n_hits"))
                .filter(F.col("n_hits") >= 1))

    if index_table is None:
        return _run(doc_trigrams(docs, id_col=id_col, text_col=text_col))
    # same planner pin as the other persistent-index probes
    # (_pinned_bucket_probe); the tiny hit set is eagerly checkpointed
    # so post-return consumption never re-plans the probe
    spark = docs.sparkSession
    with _pinned_bucket_probe(spark):
        return _run(spark.table(index_table)).localCheckpoint()


def tfidf_topk(docs: DataFrame, *, k: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the document
    profiler (keyword extraction / topic labeling), complementing BM25
    (which scores documents FOR a query; this ranks terms WITHIN a
    document).

    score = tf · ln(N/df): one exact-long ratio operand pair and one
    ln per term — the pinned chain, so the DOUBLE sort key bit-matches
    across engines and the (score DESC, term ASC) top-k is
    deterministic.  Shape: the doc_terms tokenize pass, one term-keyed
    df aggregate, one doc-keyed window — all map-side-combinable or
    single-exchange; no vocabulary broadcast (df joins back on term).

    Returns ``(id, term, tf, df_, score, rk)`` with rk ≤ k.
    """
    from pyspark.sql import Window

    # three consumers (n_docs count, dfreq, the score join) — one
    # checkpoint stops the tokenize pass re-running per consumer
    postings = doc_terms(docs, id_col=id_col, text_col=text_col) \
        .localCheckpoint()
    n_docs = postings.select(id_col).distinct().count()
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_"))
    scored = (postings.join(dfreq, "term")
              .select(id_col, "term", "tf", "df_",
                      (F.col("tf").cast("double")
                       * F.log(F.lit(float(n_docs))
                               / F.col("df_").cast("double")))
                      .alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def near_query(docs: DataFrame, term_a: str, term_b: str, window: int, *,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Proximity search ("term_a NEAR/W term_b"): documents where the
    two terms co-occur within ``window`` token positions, with the
    co-occurrence count and the tightest gap — the IR primitive
    between bag-of-words BM25 (position-blind) and phrase_search
    (exact adjacency).

    Everything happens IN-ROW: tokenize once, collect each term's
    position list with an indexed transform, and evaluate all
    |pa|·|pb| gaps as a nested array expression — ZERO shuffles, zero
    explode; the whole query is one map-only scan that parallelizes
    embarrassingly and pushes (id, text) column pruning to the
    parquet reader.  Positions are exact integers, so the row
    value-hashes.  Per-doc cost is |pa|·|pb| — bounded by tf of the
    two query terms, not doc length; for pathological tf (a term
    repeated 10⁵ times in one doc) cap upstream with repetition
    filters.  At fleet scale, run it after a term-index candidate
    probe (write_term_index) so only docs containing BOTH terms are
    scanned.

    Tokenization matches doc_terms/_words (lowercase whitespace).

    Returns ``(id, n_pairs, min_gap)`` for docs with ≥ 1 hit.
    """
    term_a, term_b = term_a.lower(), term_b.lower()  # tokens are
    # lowercased by _words; a verbatim uppercase term would silently
    # match nothing
    if not term_a or not term_b or term_a == term_b:
        raise ValueError("need two distinct non-empty terms")
    if window < 1:
        raise ValueError("window must be >= 1")
    ws = _words(F.col(text_col))

    def positions(term: str):
        return F.filter(
            F.transform(ws, lambda w, i: F.when(w == F.lit(term), i)),
            lambda p: p.isNotNull())

    gaps = F.flatten(F.transform(F.col("_pa"), lambda x: F.transform(
        F.col("_pb"), lambda y: F.abs(x - y))))
    hit = F.filter(gaps, lambda g: g <= F.lit(window))
    return (docs.select(F.col(id_col),
                        positions(term_a).alias("_pa"),
                        positions(term_b).alias("_pb"))
            .select(id_col,
                    F.size(hit).cast("long").alias("n_pairs"),
                    F.array_min(hit).cast("long").alias("min_gap"))
            .filter(F.col("n_pairs") >= 1))


RRF_SCALE = 10 ** 15  # reciprocal weights as exact scaled integers


def rrf_fuse(rankings: "list[DataFrame]", *, k: int, c: int = 60,
             id_col: str = "doc_id", rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09) —
    the hybrid-search combiner: each input ranking contributes
    ``1/(c + rank)`` per document and the fused order is by the summed
    weight.  Weights are carried as exact scaled integers
    ``RRF_SCALE div (c + rank)`` so the fusion (and its tie-break: sum
    desc, id asc) is engine-exact — no float accumulation order can
    split engines.

    Score-blind by design: only RANKS cross the fusion boundary, which
    is what makes RRF the standard lexical+dense combiner (BM25 scores
    and cosine scores are not calibrated against each other).  Inputs
    are top-N lists (tiny); the union + one groupBy is the whole plan —
    at fleet scale each ranking arrives pre-truncated by its own
    distributed top-k, so fusion cost is O(Σ list lengths), independent
    of corpus size.

    Returns ``(id, rrf, n_lists, rank)`` for the top ``k``.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 1 or c < 0:
        raise ValueError("k must be >= 1 and c >= 0")
    wgt = F.expr(f"CAST({RRF_SCALE} AS BIGINT) div"
                 f" (CAST({c} AS BIGINT) + {rank_col})")
    parts = [r.select(F.col(id_col), wgt.alias("_w")) for r in rankings]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    fused = un.groupBy(id_col).agg(
        F.sum("_w").alias("rrf"),
        F.count(F.lit(1)).alias("n_lists"))
    top = fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def prf_expansion(docs: DataFrame, query_terms: "list[str]", *,
                  k_docs: int = 10, k_terms: int = 20,
                  id_col: str = "doc_id", text_col: str = "text",
                  k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio's feedback
    step, JASIS 1971, in its integer-evidence form): take the BM25
    top-``k_docs`` feedback set, pool its vocabulary minus the query
    terms, and rank candidates by (feedback document frequency desc,
    pooled tf desc, term asc) — all exact integer evidence, so the
    expansion list is engine-deterministic (an RM1 float mixture would
    hinge on aggregation order).

    Shape: the feedback set is k rows → broadcast semi-join back onto
    the corpus scan; one explode + one groupBy(term) over just the
    feedback docs' tokens.  Returns ``(term, df_fb, tf_fb, rank)`` for
    the top ``k_terms``."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    fb = bm25_topk(docs, list(query_terms), k=k_docs, id_col=id_col,
                   text_col=text_col, k1=k1, b=b).select(id_col)
    toks = (docs.join(F.broadcast(fb), id_col)
            .select(F.col(id_col),
                    F.explode(_words(F.col(text_col))).alias("term"))
            .filter(~F.col("term").isin(*query_terms)))
    agg = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("df_fb"),
        F.count(F.lit(1)).alias("tf_fb"))
    top = agg.orderBy(F.col("df_fb").desc(), F.col("tf_fb").desc(),
                      F.col("term").asc()).limit(k_terms)
    w = Window.orderBy(F.col("df_fb").desc(), F.col("tf_fb").desc(),
                       F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w))


def prefix_topk(docs: DataFrame, text_col: str, *,
                max_prefix: int = 4, k: int = 3,
                min_count: int = 2) -> DataFrame:
    """Query-autocomplete prefix index: for every token prefix of
    length 1..``max_prefix``, the top-``k`` corpus tokens by frequency
    (ties broken by token ASC) — the typeahead-completion primitive.

    Scale shape: token counting is ONE map-side-combinable groupBy over
    the corpus; prefix expansion then explodes the (small) VOCABULARY
    table ×max_prefix — never the corpus; per-prefix top-k is a window
    over (prefix) on the vocabulary-sized table.  Exact counts only.

    Output: ``(prefix, rank, token, n)``.
    """
    from pyspark.sql import Window as W

    from .text import _words

    counts = (docs.select(
        F.explode(_words(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= int(min_count)))
    pref = counts.select("token", "n", F.explode(F.expr(
        f"transform(sequence(1, least(length(token), {int(max_prefix)})),"
        " i -> substr(token, 1, i))")).alias("prefix"))
    w = W.partitionBy("prefix").orderBy(F.col("n").desc(), "token")
    return (pref.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k))
            .select("prefix", "rank", "token", "n"))


def rbo_curve(list_a: DataFrame, list_b: DataFrame, *, depth: int,
              p: float = 0.9, id_col: str = "doc_id",
              rank_col: str = "rank") -> DataFrame:
    """Rank-biased overlap between two rankings, reported as the full
    per-depth curve (Webber, Moffat & Zobel 2010): at each depth d,
    agreement A_d = |prefix_d(A) ∩ prefix_d(B)| / d, and
    RBO@d = (1−p)·Σ_{i≤d} p^{i−1}·A_i — the top-weighted similarity of
    two searchers (e.g. the BM25 lexical list vs the dense int-dot
    list that rrf_fuse merges: RBO says HOW MUCH they agree before
    fusion, rank-weighted so top disagreements dominate).

    Exactness: the overlap counts X_d are exact longs (a common doc
    enters every depth ≥ max(rank_a, rank_b) via one bounded sequence
    explode — no per-depth rescans); the geometric weights p^{i−1} are
    PRECOMPUTED python doubles inlined as literals (both engines parse
    the same decimal literal — no cross-engine pow()), and the
    cumulative sum runs in depth order over one ≤``depth``-row window
    partition — a pinned-order fold.

    Scale shape: one inner join of two k-row lists + one explode(≤k)
    + one groupBy(d) — the inputs are top-k lists, so this is
    driver-trivial by construction at any corpus size.

    Returns ``(d, x_d, rbo_at_d)`` for d = 1..``depth``.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")
    a = list_a.select(F.col(id_col).alias("_id"),
                      F.col(rank_col).cast("long").alias("_ra"))
    b = list_b.select(F.col(id_col).alias("_id"),
                      F.col(rank_col).cast("long").alias("_rb"))
    m = (a.join(b, "_id")
         .select(F.greatest("_ra", "_rb").alias("_m"))
         .filter(F.col("_m") <= depth))
    counts = (m.select(F.explode(
        F.sequence(F.col("_m"), F.lit(depth))).alias("d"))
        .groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("x_d")))
    spark = list_a.sparkSession
    depths = spark.range(1, depth + 1).select(
        F.col("id").cast("long").alias("d"))
    full = (depths.join(counts, "d", "left")
            .select("d", F.coalesce("x_d", F.lit(0)).alias("x_d")))
    # per-depth term: x_d * p^(d-1) / d, weights inlined as literals
    w = {d: p ** (d - 1) for d in range(1, depth + 1)}
    term = F.col("x_d").cast("double") * F.element_at(
        F.array(*[F.lit(w[d]) for d in range(1, depth + 1)]),
        F.col("d").cast("int")) / F.col("d").cast("double")
    win = (Window.orderBy("d")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (full.withColumn("_t", term)
            .withColumn("rbo_at_d",
                        F.lit(1.0 - p) * F.sum("_t").over(win))
            .select("d", "x_d", "rbo_at_d"))


def lm_dirichlet_topk(docs: DataFrame, query_terms: "list[str]", *,
                      k: int, mu: float = 2000.0,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR'01) — the language-model ranking that sits beside
    BM25 in every IR stack:

        score(q, d) = Σ_{t∈q} ln( (tf_{t,d} + µ·p(t|C)) / (dl_d + µ) )

    with collection model p(t|C) = cf_t / |C| (collection term
    frequency over total corpus tokens).  Rewritten for sparse
    evaluation — only MATCHING postings are touched:

        score = Σ_{t∈q∩d} [ln(tf + µ·p_t) − ln(µ·p_t)]
              + Σ_{t∈q} ln(µ·p_t)  −  |q|·ln(dl + µ)

    The first sum runs over the query-filtered postings; the second is
    a per-query constant; the third needs only the doc length.  Query
    terms with zero collection frequency are DROPPED (their smoothed
    probability is 0 — standard practice; raises if none survive).

    Scale shape: identical to ``bm25_topk``'s corpus-scan path — one
    tokenize+explode, postings filtered to the query terms BEFORE the
    per-doc sum, the |q|-row cf table broadcast, one shuffle on the doc
    key, TakeOrderedAndProject top-k.  With a ``write_term_index``
    postings table the same formula probes bucket-pruned posting
    lists; the collection stats live in the index sidecar.

    Determinism: tf, dl, cf, |C| are exact longs; the double chain
    (one division cf/|C|, one ln per term, one ln per doc) is written
    identically in the SQL oracle, and ranking breaks ties by id.
    Returns ``(id, score, rank)``, top ``k`` by (score desc, id asc).
    """
    if not query_terms:
        raise ValueError("empty query")
    if mu <= 0:
        raise ValueError("mu must be > 0")
    postings = doc_terms(docs, id_col=id_col, text_col=text_col)
    # collection stats: one pass over the postings
    total_tokens = postings.agg(F.sum("tf")).first()[0]
    if not total_tokens:
        raise ValueError("empty corpus")
    q = postings.filter(F.col("term").isin(list(query_terms)))
    cf_tbl = q.groupBy("term").agg(F.sum("tf").alias("cf"))
    # µ·p_t per surviving term, plus the per-query constant Σ ln(µ·p_t)
    mu_p = F.lit(float(mu)) * (F.col("cf").cast("double")
                               / F.lit(float(int(total_tokens))))
    cf_tbl = cf_tbl.withColumn("mu_p", mu_p)
    rows = cf_tbl.select("term", "mu_p").collect()  # ≤ |q| rows
    if not rows:
        raise ValueError("no query term occurs in the corpus")
    const = float(sum(math.log(r["mu_p"]) for r in rows))
    n_q = len(rows)
    per_term = (q.join(F.broadcast(cf_tbl.select("term", "mu_p")),
                       "term")
                .withColumn(
                    "w",
                    F.log(F.col("tf").cast("double") + F.col("mu_p"))
                    - F.log(F.col("mu_p"))))
    scores = (per_term.groupBy(id_col)
              .agg(F.sum("w").alias("_s"), F.first("dl").alias("_dl"))
              .select(
                  F.col(id_col),
                  (F.col("_s") + F.lit(const)
                   - F.lit(float(n_q))
                   * F.log(F.col("_dl").cast("double")
                           + F.lit(float(mu)))).alias("score")))
    return _rank_topk(scores, id_col, k)


def mmr_rerank(candidates: DataFrame, sims: DataFrame, k: int, *,
               lam_num: int = 7, lam_den: int = 10,
               id_col: str = "c_id", rel_col: str = "dot") -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR'98) over a BOUNDED candidate window: greedily pick
    the doc maximizing  λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)  against
    the already-selected set S.  With integer relevance and similarity
    scores (this repo's exact int-dot primitives) and rational
    λ = lam_num/lam_den, the objective is carried ×lam_den as the exact
    long  lam_num·rel − (lam_den−lam_num)·maxsim  — no float anywhere;
    ties break by id ascending.  Round 1 has S = ∅, so its objective is
    lam_num·rel.

    ``candidates`` is (id, rel) — the top-N rerank window from a
    first-stage ranker (int_dot_topk / bm25_topk / ann probes);
    ``sims`` is (a_id, b_id, sim) covering every ordered candidate
    pair.  MMR selection is inherently sequential, so the k rounds run
    as k tiny Spark jobs over the localCheckpoint-ed N-row window —
    the only driver traffic is the 1-row winner per round (same
    bounded-control-table discipline as the k-means centroid loop).
    N is the rerank window (production N ≤ 1000), NOT the corpus: the
    corpus-scale work happened in the first stage.

    Returns ``(rank, id, rel, mmr)`` with ``mmr`` the ×lam_den-scaled
    objective at selection time.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0 < lam_num < lam_den):
        raise ValueError("need 0 < lam_num < lam_den")
    cand = (candidates.select(F.col(id_col).alias("_id"),
                              F.col(rel_col).cast("long").alias("_rel"))
            .localCheckpoint())
    pair = (sims.select(F.col("a_id").alias("_a"),
                        F.col("b_id").alias("_b"),
                        F.col("sim").cast("long").alias("_sim"))
            .localCheckpoint())
    n = cand.count()
    if k > n:
        raise ValueError(f"k={k} exceeds candidate window n={n}")
    selected: list = []
    out = None
    for r in range(1, k + 1):
        if r == 1:
            scored = cand.withColumn(
                "_mmr", F.lit(int(lam_num)) * F.col("_rel"))
        else:
            ms = (pair.filter(F.col("_b").isin(selected))
                  .groupBy("_a").agg(F.max("_sim").alias("_ms")))
            scored = (cand.filter(~F.col("_id").isin(selected))
                      .join(ms, cand["_id"] == ms["_a"])
                      .withColumn(
                          "_mmr",
                          F.lit(int(lam_num)) * F.col("_rel")
                          - F.lit(int(lam_den - lam_num))
                          * F.col("_ms")))
        win = (scored.orderBy(F.col("_mmr").desc(), F.col("_id"))
               .limit(1)
               .select(F.lit(r).alias("rank"), F.col("_id"),
                       F.col("_rel"), F.col("_mmr"))
               .localCheckpoint())  # pin the pick before mutating sel
        wid = win.first()["_id"]
        selected.append(wid)
        out = win if out is None else out.union(win)
    return out.select("rank", F.col("_id").alias(id_col),
                      F.col("_rel").alias("rel"),
                      F.col("_mmr").alias("mmr"))


def best_passage(docs: DataFrame, query_terms: "list[str]", *,
                 width: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Best-passage (snippet) extraction — for each document, the
    ``width``-token window containing the MOST query-term hits
    (leftmost on ties): the passage-retrieval / snippet primitive
    under every search result page and RAG chunk selector (Callan
    1994 passage retrieval).

    Exactness: text is lowercased and ``\\s+``-tokenized (engine-wide
    discipline); per-start hit counts are exact ints evaluated IN-ROW
    (score(s) = hits in tokens[s..s+width−1]; windows truncate at the
    document end exactly like a ROWS BETWEEN frame), and the argmax
    is the array-min of (−score, start) structs — deterministic
    leftmost-max, no shuffle, no Python.  The chosen snippet ships as
    ``snippet_md5`` (md5 of the space-joined window) so the text
    itself value-hashes.

    Shape for scale: rows are independent; per-row cost
    O(n_tokens·width).  The query set is a literal IN-list (compiled
    into the plan, no join).

    Returns ``(id_col, n_tokens, best_start, best_score,
    snippet_md5)`` — ``best_start`` is 1-based; documents with zero
    tokens are dropped.
    """
    if width < 1:
        raise ValueError("width must be >= 1")
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    base = docs.select(F.col(id_col), toks.alias("_t")) \
        .filter(F.size("_t") > 0)
    n = F.size(F.col("_t"))

    def score(s):
        return F.size(F.filter(
            F.slice(F.col("_t"), s, width),
            lambda t: t.isin(*terms)))

    starts = F.sequence(F.lit(1), F.greatest(n - width + 1, F.lit(1)))
    best = F.array_min(F.transform(
        starts, lambda s: F.struct((-score(s)).alias("ns"),
                                   s.alias("st"))))
    out = base.select(
        id_col, n.cast("long").alias("n_tokens"),
        best["st"].cast("long").alias("best_start"),
        (-best["ns"]).cast("long").alias("best_score"),
        F.md5(F.array_join(
            F.slice(F.col("_t"), best["st"], width), " "))
        .alias("snippet_md5"))
    return out


def lm_jm_topk(docs: DataFrame, query_terms: "list[str]", *,
               k: int, lam: float = 0.4, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (Zhai
    & Lafferty, SIGIR'01) — the linear-interpolation companion of
    :func:`lm_dirichlet_topk` (better for verbose queries, where JM's
    fixed mixing beats Dirichlet's length-adaptive prior):

        score(q, d) = Σ_{t∈q} ln( λ·tf_{t,d}/dl_d + (1−λ)·p(t|C) )

    Sparse rewrite — only matching postings are touched:

        score = Σ_{t∈q∩d} [ln(λ·tf/dl + (1−λ)·p_t) − ln((1−λ)·p_t)]
              + Σ_{t∈q} ln((1−λ)·p_t)

    the second sum a per-query constant; unlike Dirichlet there is NO
    separate per-doc length term (it lives inside each matched ln).
    Query terms with zero collection frequency are dropped (standard
    practice; raises if none survive); documents matching no term
    score the constant and are excluded — same contract as Dirichlet.

    Scale shape and determinism: identical to lm_dirichlet_topk — one
    tokenize+explode, postings filtered to the query BEFORE the
    per-doc sum, |q|-row broadcast, top-k by (score desc, id asc);
    tf, dl, cf, |C| exact longs, the double chain written identically
    in the oracle.  Returns ``(id, score, rank)``.
    """
    if not query_terms:
        raise ValueError("empty query")
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    postings = doc_terms(docs, id_col=id_col, text_col=text_col)
    total_tokens = postings.agg(F.sum("tf")).first()[0]
    if not total_tokens:
        raise ValueError("empty corpus")
    q = postings.filter(F.col("term").isin(list(query_terms)))
    cf_tbl = q.groupBy("term").agg(F.sum("tf").alias("cf"))
    om_p = (F.lit(1.0 - float(lam))
            * (F.col("cf").cast("double")
               / F.lit(float(int(total_tokens)))))
    cf_tbl = cf_tbl.withColumn("om_p", om_p)
    rows = cf_tbl.select("term", "om_p").collect()  # ≤ |q| rows
    if not rows:
        raise ValueError("no query term occurs in the corpus")
    const = float(sum(math.log(r["om_p"]) for r in rows))
    per_term = (q.join(F.broadcast(cf_tbl.select("term", "om_p")),
                       "term")
                .withColumn(
                    "w",
                    F.log(F.lit(float(lam))
                          * (F.col("tf").cast("double")
                             / F.col("dl").cast("double"))
                          + F.col("om_p"))
                    - F.log(F.col("om_p"))))
    scores = (per_term.groupBy(id_col)
              .agg(F.sum("w").alias("_s"))
              .select(F.col(id_col),
                      (F.col("_s") + F.lit(const)).alias("score")))
    return _rank_topk(scores, id_col, k)


def min_cover_window(docs: DataFrame, terms: "list[str]", *,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_occ: int = 10_000) -> DataFrame:
    """Minimal covering window — per document, the SHORTEST token
    span containing ALL query terms (ties → leftmost), the classic
    proximity-ranking signal behind "terms near each other" scoring
    and snippet seeding (the multi-term sibling of best_passage's
    fixed window).

    Algorithm, in-row and exact: keep only query-term occurrences;
    anchored at each occurrence position p, the best window starting
    ≥ p ends at max over terms of the term's first occurrence ≥ p
    (NULL if any term never reappears — that anchor is invalid); the
    answer is the min (length, start) struct over anchors.  All
    integer positions — value-hashes exactly.  Cost is O(occ²·|Q|)
    per doc over QUERY-TERM occurrences only, in-plan capped by
    ``max_occ`` (raise_error) — long docs want best_passage-style
    chunking upstream.

    One doc-keyed aggregation, no shuffle beyond it; the term filter
    prunes the explode before any state builds.

    Returns ``(doc_id, win_len, lo, hi)`` — docs missing any term
    drop.
    """
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be non-empty and distinct")
    toks = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+"))
        .alias("pos", "w"))
        .filter(F.col("w").isin(list(terms))))
    arrs = [F.sort_array(F.collect_list(F.when(
        F.col("w") == t, F.col("pos")))).alias(f"_a{i}")
        for i, t in enumerate(terms)]
    per = (toks.groupBy("doc_id")
           .agg(F.sort_array(F.collect_list("pos")).alias("_an"),
                F.count(F.lit(1)).alias("_occ"), *arrs))
    guard = F.when(
        F.col("_occ") > max_occ,
        F.raise_error(F.concat(
            F.lit(f"min_cover_window: > {max_occ} query-term "
                  "occurrences in one doc: "),
            F.col("_occ").cast("string"))).cast("long"))
    nexts = lambda i, p: F.array_min(
        F.filter(F.col(f"_a{i}"), lambda x: x >= p))
    ends = lambda p: [nexts(i, p) for i in range(len(terms))]

    def cand(p):
        e = F.greatest(*ends(p)) if len(terms) > 1 else ends(p)[0]
        invalid = ends(p)[0].isNull()
        for i in range(1, len(terms)):
            invalid = invalid | ends(p)[i].isNull()
        return F.when(~invalid, F.struct(
            (e - p + 1).alias("win_len"),
            p.alias("lo"), e.alias("hi")))

    best = F.array_min(F.filter(
        F.transform(F.col("_an"), cand), lambda c: c.isNotNull()))
    out = per.select("doc_id", F.coalesce(guard, F.lit(0)).alias("_g"),
                     best.alias("_b")).filter(F.col("_b").isNotNull())
    return out.select("doc_id",
                      (F.col("_b.win_len") + F.col("_g") * 0)
                      .alias("win_len"),
                      F.col("_b.lo").alias("lo"),
                      F.col("_b.hi").alias("hi"))
