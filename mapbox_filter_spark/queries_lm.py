"""Gate queries for the n-gram LM statistics block (operators/lm.py)
over the ``documents`` table.

The oracle rebuilds the gram instances with DuckDB list slicing over the
SAME normalized word arrays (the shared ``_WORDS_SQL`` fragment), so a
value-hash match proves tokenization, gram windowing, and the integer
count arithmetic agree instance-for-instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.lm import conditional_counts, continuation_counts
from .queries_curation import _WORDS_SQL

_N = 3  # trigram model


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_GRAMS_SQL = f"""grams AS (
  SELECT array_to_string(words[(t.i + 1):(t.i + {_N - 1})], ' ') AS context,
         words[t.i + {_N}] AS token
  FROM base, LATERAL (
    SELECT unnest(range(LEN(words) - {_N - 1})) AS i) t
  WHERE LEN(words) >= {_N}
)"""


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional trigram table: exact integer (cnt, ctx_cnt) pairs."""
    return conditional_counts(_docs(spark, sf_dir), "text", n=_N)


def sql_ngram_lm() -> str:
    return f"""
WITH {_WORDS_SQL},
{_GRAMS_SQL}
SELECT context, token, COUNT(*) AS cnt,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY context) AS BIGINT) AS ctx_cnt
FROM grams
GROUP BY context, token"""


def q_kn_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts: distinct contexts per token."""
    return continuation_counts(_docs(spark, sf_dir), "text", n=_N)


def sql_kn_continuation() -> str:
    return f"""
WITH {_WORDS_SQL},
{_GRAMS_SQL}
SELECT token, COUNT(DISTINCT context) AS n_contexts
FROM grams
GROUP BY token"""


def q_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM quality score (operators/lm.py doc_lm_scores):
    mean ln P(token|context) under the corpus's own trigram table.  The
    ln/divide chain is bit-reproducible cross-engine because op order is
    pinned (document-order fold); the oracle replays it with
    list_reduce(list(... ORDER BY pos))."""
    from .operators.lm import doc_lm_scores

    return doc_lm_scores(_docs(spark, sf_dir), "text", n=_N)


def sql_lm_doc_score() -> str:
    return f"""
WITH {_WORDS_SQL},
gi AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(words[(t.i + 1):(t.i + {_N - 1})], ' ') AS context,
         words[t.i + {_N}] AS token
  FROM base, LATERAL (
    SELECT unnest(range(LEN(words) - {_N - 1})) AS i) t
  WHERE LEN(words) >= {_N}
),
lm AS (
  SELECT context, token, COUNT(*) AS cnt,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY context) AS BIGINT) AS ctx_cnt
  FROM gi GROUP BY context, token
)
SELECT g.doc_id, COUNT(*) AS n_grams,
       list_reduce(
         list(ln(CAST(l.cnt AS DOUBLE) / CAST(l.ctx_cnt AS DOUBLE))
              ORDER BY g.pos),
         (a, b) -> a + b) AS sum_logprob,
       list_reduce(
         list(ln(CAST(l.cnt AS DOUBLE) / CAST(l.ctx_cnt AS DOUBLE))
              ORDER BY g.pos),
         (a, b) -> a + b) / COUNT(*) AS avg_logprob
FROM gi g JOIN lm l USING (context, token)
GROUP BY g.doc_id"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 BPE statistic: corpus-wide adjacent character pair counts
    (operators/bpe.py char_pair_counts)."""
    from .operators.bpe import char_pair_counts

    return char_pair_counts(_docs(spark, sf_dir), "text")


def sql_bpe_pair_counts() -> str:
    return f"""
WITH {_WORDS_SQL},
w AS (SELECT unnest(words) AS w FROM base),
pairs AS (
  SELECT substr(w, CAST(t.i + 1 AS INT), 1) AS sym_a,
         substr(w, CAST(t.i + 2 AS INT), 1) AS sym_b
  FROM w, LATERAL (SELECT unnest(range(LEN(w) - 1)) AS i) t
)
SELECT sym_a, sym_b, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY: train a small merge list (operators/bpe.py
    train_bpe — deterministic max-count/lexicographic tiebreak) on a
    fixed document slice, then encode that slice with the Arrow-batched
    bpe_encode mapInPandas (per-partition word memo).  ROWS-ONLY gate by
    design: iterative merge application is not SQL-expressible in
    DuckDB; value correctness is the py_bpe_word differential twin in
    tests/test_bpe.py (the driver still checks rows + schema)."""
    from .operators.bpe import bpe_encode, train_bpe

    docs = (_docs(spark, sf_dir)
            .filter(F.col("doc_id") < 200).select("doc_id", "text"))
    merges = train_bpe(docs, "text", n_merges=20)
    enc = bpe_encode(docs, merges, "text")
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_tokens"),
        F.size(F.array_distinct("bpe_tokens")).alias("n_types"),
        F.try_element_at("bpe_tokens", F.lit(1)).alias("first_token"))


_PMI_MIN_COUNT = 25


def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence with PMI (operators/cooccur.py
    cooccurrence_pmi): the association/collocation miner — distinct
    (doc, token) pre-pass, per-doc pair join, one map-side-combinable
    pair count, PMI as one exact-long-ratio division + one ln (the
    BM25 pinned-op-order discipline)."""
    from .operators.cooccur import cooccurrence_pmi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return cooccurrence_pmi(docs, "doc_id", "text",
                            min_count=_PMI_MIN_COUNT)


def sql_cooccur_pmi() -> str:
    return rf"""WITH toks AS (
  SELECT DISTINCT doc_id AS doc, w
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS w
        FROM documents)
  WHERE length(w) >= 3),
nd AS (SELECT COUNT(DISTINCT doc) AS n FROM toks),
dfreq AS (SELECT w, COUNT(*) AS n_w FROM toks GROUP BY w),
pairs AS (
  SELECT a.w AS w_a, b.w AS w_b, COUNT(*) AS n_ab
  FROM toks a JOIN toks b ON a.doc = b.doc AND a.w < b.w
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_PMI_MIN_COUNT})
SELECT w_a, w_b, n_ab, fa.n_w AS n_a, fb.n_w AS n_b,
       ln(CAST(n_ab * (SELECT n FROM nd) AS DOUBLE)
          / CAST(fa.n_w * fb.n_w AS DOUBLE)) AS pmi
FROM pairs JOIN dfreq fa ON fa.w = w_a JOIN dfreq fb ON fb.w = w_b"""


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules, baskets = users, items = event
    types (operators/cooccur.py assoc_rules): exact support /
    confidence / lift from one distinct pre-pass + one basket
    self-join; the directional, linear-scale sibling of cooccur_pmi."""
    from .operators.cooccur import assoc_rules

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "event_type")
    return assoc_rules(ev, "user_id", "event_type", min_count=1)


def sql_assoc_rules() -> str:
    return """WITH b AS (
  SELECT DISTINCT user_id AS bk, event_type AS it FROM events),
n AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
items AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY it),
p AS (
  SELECT l.it AS ant, r.it AS cons, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM b l JOIN b r ON l.bk = r.bk AND l.it <> r.it
  GROUP BY 1, 2 HAVING COUNT(*) >= 1)
SELECT p.ant, p.cons, n.n_baskets, a.c AS c_a, c.c AS c_b, p.c_ab,
       CAST(p.c_ab AS DOUBLE) / CAST(a.c AS DOUBLE) AS conf,
       CAST(n.n_baskets * p.c_ab AS DOUBLE)
         / CAST(a.c * c.c AS DOUBLE) AS lift
FROM p JOIN items a ON a.it = p.ant
       JOIN items c ON c.it = p.cons, n"""



_G2_MIN_COUNT = 25


def q_g2_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocations by Dunning G² (operators/cooccur.py
    g2_collocations): in-row arrays_zip bigrams, one pair count, exact
    2×2 cells, four pinned k·ln(kN/(row·col)) terms summed in fixed
    order."""
    from .operators.cooccur import g2_collocations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return g2_collocations(docs, "doc_id", "text",
                           min_count=_G2_MIN_COUNT)


def sql_g2_collocations() -> str:
    def term(k, row, col):
        return (f"CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE) * "
                f"ln(CAST(({k}) * n AS DOUBLE) / "
                f"CAST(({row}) * ({col}) AS DOUBLE)) "
                "ELSE CAST(0 AS DOUBLE) END")

    t11 = term("n_ab", "n_a", "n_b")
    t12 = term("(n_a - n_ab)", "n_a", "(n - n_b)")
    t21 = term("(n_b - n_ab)", "(n - n_a)", "n_b")
    t22 = term("(n - n_a - n_b + n_ab)", "(n - n_a)", "(n - n_b)")
    return rf"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS a
  FROM documents),
bi AS (
  SELECT a[i] AS w_a, a[i + 1] AS w_b
  FROM toks, LATERAL (SELECT unnest(range(1, len(a))) AS i) t),
cnt AS (SELECT w_a, w_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM bi GROUP BY 1, 2),
nt AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM cnt),
ra AS (SELECT w_a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM cnt GROUP BY 1),
cb AS (SELECT w_b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM cnt GROUP BY 1),
j AS (
  SELECT c.w_a, c.w_b, c.n_ab, ra.n_a, cb.n_b, nt.n
  FROM cnt c JOIN ra USING (w_a) JOIN cb USING (w_b), nt
  WHERE c.n_ab >= {_G2_MIN_COUNT})
SELECT w_a, w_b, n_ab, n_a, n_b, n AS n_total,
       CAST(2 AS DOUBLE) * ((({t11} + {t12}) + {t21}) + {t22}) AS g2
FROM j"""



_KWIC_KW = "merge"


def q_kwic_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance patterns (operators/text.py
    kwic_contexts — in-row match positions + guarded element_at
    neighbor lookups, one groupBy)."""
    from .operators.text import kwic_contexts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("text")
    return kwic_contexts(docs, "text", _KWIC_KW)


def sql_kwic_contexts() -> str:
    def at(off):
        return (f"CASE WHEN i + ({off}) < 1 THEN '^' "
                f"ELSE COALESCE(a[i + ({off})], '$') END")

    return rf"""WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS a
  FROM documents),
hits AS (
  SELECT a, i
  FROM toks, LATERAL (SELECT unnest(range(1, len(a) + 1)) AS i) t
  WHERE a[i] = '{_KWIC_KW}')
SELECT {at(-2)} AS l2, {at(-1)} AS l1,
       {at(1)} AS r1, {at(2)} AS r2,
       COUNT(*) AS n
FROM hits GROUP BY 1, 2, 3, 4"""


LM_QUERIES = {
    "g2_collocations": (q_g2_collocations, sql_g2_collocations),
    "kwic_contexts": (q_kwic_contexts, sql_kwic_contexts),
    "ngram_lm": (q_ngram_lm, sql_ngram_lm),
    "bpe_encode": (q_bpe_encode, None),
    "kn_continuation": (q_kn_continuation, sql_kn_continuation),
    "lm_doc_score": (q_lm_doc_score, sql_lm_doc_score),
    "bpe_pair_counts": (q_bpe_pair_counts, sql_bpe_pair_counts),
    "cooccur_pmi": (q_cooccur_pmi, sql_cooccur_pmi),
    "assoc_rules": (q_assoc_rules, sql_assoc_rules),
}


_RAKE_STOP = ("a", "the", "and", "of", "to", "is", "that")
_RAKE_K = 50
_RAKE_SCALE = 10**9


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the document corpus
    (operators/text.py rake_phrases): exact-integer word scores
    (deg·10⁹)//freq, int64 phrase sums, global top-50."""
    from .operators.text import rake_phrases

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return rake_phrases(docs, "doc_id", "text", stopwords=_RAKE_STOP,
                        k=_RAKE_K, scale=_RAKE_SCALE)


def sql_rake_keywords() -> str:
    stop = ", ".join(f"'{s}'" for s in _RAKE_STOP)
    return f"""WITH {_WORDS_SQL},
pos AS (
  SELECT doc_id, t.i AS pos, words[t.i] AS w
  FROM base, LATERAL (SELECT unnest(range(1, len(words) + 1)) AS i) t),
m AS (SELECT doc_id, pos, w,
             CASE WHEN w IN ({stop}) THEN 1 ELSE 0 END AS s
      FROM pos),
pid AS (
  SELECT doc_id, pos, w, s,
         SUM(s) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM m),
nw AS (SELECT doc_id, phrase_id, pos, w FROM pid WHERE s = 0),
pl AS (
  SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen,
         string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM nw GROUP BY 1, 2),
ws AS (
  SELECT nw.w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(pl.plen) AS BIGINT) AS deg
  FROM nw JOIN pl USING (doc_id, phrase_id) GROUP BY 1),
wq AS (SELECT w, (deg * CAST({_RAKE_SCALE} AS BIGINT)) // freq
              AS wscore
       FROM ws),
ps AS (
  SELECT nw.doc_id, nw.phrase_id,
         CAST(SUM(wq.wscore) AS BIGINT) AS pscore
  FROM nw JOIN wq USING (w) GROUP BY 1, 2),
agg AS (
  SELECT pl.phrase, CAST(COUNT(*) AS BIGINT) AS n,
         MIN(ps.pscore) AS score_q
  FROM pl JOIN ps USING (doc_id, phrase_id) GROUP BY 1)
SELECT phrase, n, score_q FROM agg
QUALIFY ROW_NUMBER() OVER (ORDER BY score_q DESC, phrase)
        <= {_RAKE_K}"""


LM_QUERIES["rake_keywords"] = (q_rake_keywords, sql_rake_keywords)


_PREFIX_MAX = 4
_PREFIX_K = 3
_PREFIX_MIN_COUNT = 5


def q_prefix_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete prefix index (operators/retrieval.py prefix_topk):
    top-3 corpus tokens per prefix (lengths 1-4) by exact counts."""
    from .operators.retrieval import prefix_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("text")
    return prefix_topk(docs, "text", max_prefix=_PREFIX_MAX,
                       k=_PREFIX_K, min_count=_PREFIX_MIN_COUNT)


def sql_prefix_complete() -> str:
    return f"""WITH {_WORDS_SQL},
counts AS (
  SELECT t.w AS token, CAST(COUNT(*) AS BIGINT) AS n
  FROM base, LATERAL (SELECT unnest(words) AS w) t
  GROUP BY 1 HAVING COUNT(*) >= {_PREFIX_MIN_COUNT}),
pref AS (
  SELECT token, n, substr(token, 1, p.i) AS prefix
  FROM counts, LATERAL (
    SELECT unnest(range(1, least(length(token), {_PREFIX_MAX}) + 1))
      AS i) p)
SELECT prefix, rank, token, n FROM (
  SELECT prefix, token, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY prefix
                                 ORDER BY n DESC, token) AS INT)
           AS rank
  FROM pref) WHERE rank <= {_PREFIX_K}"""


LM_QUERIES["prefix_complete"] = (q_prefix_complete, sql_prefix_complete)


_VOCAB_DECILES = 10


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (operators/text.py
    vocab_growth): distinct vocabulary after each hash-ordered corpus
    decile — exact first-occurrence ranks, integer thresholds."""
    from .operators.text import vocab_growth

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return vocab_growth(docs, "doc_id", "text",
                        deciles=_VOCAB_DECILES)


def sql_vocab_growth() -> str:
    d = _VOCAB_DECILES
    return f"""WITH {_WORDS_SQL},
h AS (
  SELECT doc_id, words,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM base),
ranked AS (
  SELECT doc_id, words,
         CAST(ROW_NUMBER() OVER (ORDER BY hv, doc_id) AS BIGINT)
           AS rnk
  FROM h),
toks AS (
  SELECT t.w, CAST(MIN(rnk) AS BIGINT) AS first_rank
  FROM ranked, LATERAL (SELECT unnest(words) AS w) t
  GROUP BY 1),
nt AS (SELECT CAST(MAX(rnk) AS BIGINT) AS n FROM ranked),
ks AS (
  SELECT CAST(k.k AS INT) AS decile,
         (nt.n * k.k) // {d} AS n_docs
  FROM nt, LATERAL (SELECT unnest(range(1, {d} + 1)) AS k) k)
SELECT ks.decile, ks.n_docs,
       CAST(COUNT(toks.w) AS BIGINT) AS vocab
FROM ks LEFT JOIN toks ON toks.first_rank <= ks.n_docs
GROUP BY 1, 2"""


LM_QUERIES["vocab_growth"] = (q_vocab_growth, sql_vocab_growth)


_TR_MIN_COUNT = 5
_TR_ITERS = 4
_TR_SCALE = 10**12
_TR_TOPK = 25


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04):
    exact-integer PageRank (operators/graph.py pagerank_exact — the
    same fixed-point arithmetic as the pagerank gate) over the
    adjacent-word co-occurrence graph from the shared tokenizer
    (operators/lm.py _gram_pairs at n=2, symmetrized + dedup'd,
    vocabulary pruned by exact corpus count >= _TR_MIN_COUNT), then
    the deterministic top-k by (pr desc, word) — corpus-level
    keywording reusing two proven substrates."""
    from .operators.graph import pagerank_exact
    from .operators.lm import _gram_pairs
    from .operators.text import _words

    docs = _docs(spark, sf_dir).select("text")
    occ = docs.select(F.explode(_words(F.col("text"))).alias("w"))
    vocab = (occ.groupBy("w").agg(F.count(F.lit(1)).alias("_c"))
             .filter(F.col("_c") >= _TR_MIN_COUNT).select("w"))
    bp = (_gram_pairs(docs, "text", 2)
          .select(F.col("context").alias("a"), F.col("token").alias("b"))
          .filter(F.col("a") != F.col("b")).distinct())
    ev = (bp.join(vocab.withColumnRenamed("w", "a"), "a")
          .join(vocab.withColumnRenamed("w", "b"), "b"))
    sym = (ev.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(ev.select(F.col("b").alias("src"),
                                  F.col("a").alias("dst")))
           .distinct())
    pr = pagerank_exact(vocab.select(F.col("w").alias("node")), sym,
                        iters=_TR_ITERS, scale=_TR_SCALE)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return (pr.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _TR_TOPK)
            .select(F.col("node").alias("word"), "pr", "rank"))


def sql_textrank_keywords() -> str:
    s = _TR_SCALE
    ctes = [f"""{_WORDS_SQL},
occ AS (SELECT unnest(words) AS w FROM base),
vocab AS (SELECT w FROM occ GROUP BY w
          HAVING COUNT(*) >= {_TR_MIN_COUNT}),
bp AS (
  SELECT DISTINCT words[t.i + 1] AS a, words[t.i + 2] AS b
  FROM base, LATERAL (SELECT unnest(range(LEN(words) - 1)) AS i) t
  WHERE LEN(words) >= 2 AND words[t.i + 1] <> words[t.i + 2]),
ev AS (
  SELECT bp.a, bp.b FROM bp
  JOIN vocab va ON va.w = bp.a
  JOIN vocab vb ON vb.w = bp.b),
edges AS (SELECT a AS src, b AS dst FROM ev
          UNION SELECT b, a FROM ev),
nc AS (SELECT COUNT(*) AS n FROM vocab),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
pr0 AS (SELECT w AS node, {s} // nc.n AS pr FROM vocab, nc)"""]
    for i in range(1, _TR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
  SELECT n.node,
         ({s} * 15) // (100 * (SELECT n FROM nc))
         + (85 * COALESCE(sm.s, 0)) // 100 AS pr
  FROM (SELECT w AS node FROM vocab) n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr // g.d) AS s
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN deg g ON g.src = e.src
    GROUP BY e.dst) sm USING (node))""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node AS word, pr, rn AS rank FROM (
  SELECT node, pr,
         ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rn
  FROM pr{_TR_ITERS})
WHERE rn <= {_TR_TOPK}""")


LM_QUERIES["textrank_keywords"] = (q_textrank_keywords,
                                   sql_textrank_keywords)


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K / Simpson's D / hapax ratio over the document corpus
    (operators/text.py lexical_diversity): the frequency-spectrum
    second moment as an exact DECIMAL(38,0) sum, each statistic one
    pinned decimal-to-double chain — the repetitiveness screen beside
    zipf_slope and vocab_growth."""
    from .operators.text import lexical_diversity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("text")
    return lexical_diversity(docs, "text")


def sql_lexical_diversity() -> str:
    return f"""WITH {_WORDS_SQL},
cnt AS (
  SELECT t.w AS w, CAST(COUNT(*) AS BIGINT) AS n_w
  FROM base, LATERAL (SELECT unnest(words) AS w) t
  GROUP BY 1),
a AS (
  SELECT CAST(SUM(n_w) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS v_types,
         CAST(SUM(CASE WHEN n_w = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS v1_hapax,
         CAST(SUM(CAST(n_w AS DECIMAL(38,0)) * n_w) AS DECIMAL(38,0))
           AS s2
  FROM cnt)
SELECT n_tokens, v_types, v1_hapax, s2,
       CASE WHEN n_tokens > 0
            THEN 1e4 * CAST(s2 - n_tokens AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
            END AS yule_k,
       CASE WHEN n_tokens > 1
            THEN CAST(s2 - n_tokens AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE)
                    * CAST(n_tokens - 1 AS DOUBLE))
            END AS simpson_d,
       CASE WHEN v_types > 0
            THEN CAST(v1_hapax AS DOUBLE) / CAST(v_types AS DOUBLE)
            END AS hapax_ratio
FROM a"""


LM_QUERIES["lexical_diversity"] = (q_lexical_diversity,
                                   sql_lexical_diversity)
