"""Extended operator queries: spatial joins, kNN, down-copy, dedup, text
analysis, similarity — with DuckDB oracles (see queries.py preamble).

Derivation inputs: lineitem-based features (shared CTE) + the driver's
documents/embeddings tables directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .geo.pip import point_in_polygon_join
from .operators import dedup, text
from .operators.downcopy import DownCopySpec, copy_down
from .operators.joins import raster_vector_join
from .operators.knn import knn_brute_force, knn_ring
from .operators.similarity import cosine_topk
from .queries import _sql_tile_x, _sql_tile_y, _README_KEEP_SQL, README_STYLE
from .sources.features import FEATURES_ORACLE_SQL, features_from_lineitem

# ------------------------------------------------------------------ dedup


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dedup_exact(docs).select("doc_id", "content_hash")


def sql_dedup_exact() -> str:
    return """
WITH normed AS (
  SELECT doc_id,
         MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM documents
)
SELECT doc_id, content_hash FROM (
  SELECT doc_id, content_hash,
         ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM normed
) WHERE rn = 1"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    pairs = dedup.dedup_ngram_jaccard(docs, shingle_n=2, threshold=0.3,
                                      max_block=64)
    return pairs.select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))


def sql_ngram_jaccard(max_block: int = 64) -> str:
    # 2-gram shingles + first-token blocking (blocks over max_block dropped,
    # mirroring the operator's scale cap), exact jaccard via list ops
    return f"""
WITH lim AS (SELECT * FROM documents ORDER BY doc_id LIMIT 300),
base AS (
  SELECT doc_id AS id,
         list_filter(REGEXP_SPLIT_TO_ARRAY(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '), x -> x <> '') AS words
  FROM lim
),
sh0 AS (
  SELECT id, words[1] AS blk,
         list_distinct([words[i] || ' ' || words[i+1]
                        FOR i IN RANGE(1, GREATEST(LEN(words) - 1, 1) + 1)]) AS shingles
  FROM base
),
sh AS (
  SELECT sh0.* FROM sh0
  JOIN (SELECT blk FROM sh0 GROUP BY blk
        HAVING COUNT(*) <= {max_block}) ok USING (blk)
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(CAST(LEN(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / LEN(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard_sim
FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
WHERE CAST(LEN(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / LEN(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.3"""


# --- shared SQL fragments for the md5-keyed hash parity (dedup.word_hash64
# hash_mode='md5': integer of the first 15 md5 hex chars, 60-bit, identical
# on both engines — this is what retired the r1 `no_oracle` rows).

def _sql_md5_60(expr: str) -> str:
    return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"


_NORM_SQL = "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))"
# tokens of the NORMALIZED text, split on single space, NO empty-filter
# (mirrors dedup.normalize_text + F.split exactly, incl. the ['']-for-empty
# corner)
_TOKENS_SQL = f"REGEXP_SPLIT_TO_ARRAY({_NORM_SQL}, ' ')"

_MH_PRIME = (1 << 31) - 1
_MINHASH_DOCS = "SELECT * FROM documents WHERE doc_id < 500"


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, md5-keyed so the full pipeline (shingles
    -> 64 minhashes -> 16 band buckets -> capped pair-gen -> Jaccard verify)
    is value-hash-checked against the DuckDB transcription below."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500)
    return dedup.dedup_minhash_lsh(docs, threshold=0.5, hash_mode="md5").select(
        "id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))


def sql_minhash_lsh(k: int = 64, bands: int = 16, seed: int = 42,
                    max_bucket: int = 64, threshold: float = 0.5) -> str:
    rpb = k // bands
    # 3-gram shingles over normalized words (mirrors dedup.word_shingles)
    shingles = ("list_distinct([array_to_string(words[i:i+2], ' ') "
                "FOR i IN RANGE(1, GREATEST(LEN(words) - 2, 1) + 1)])")
    h_shingle = _sql_md5_60(f"'{seed}:' || s")
    mh = ", ".join(
        "list_min(list_transform(shingles, s -> "
        f"(({h_shingle} % {_MH_PRIME}) * {a} + {b}) % {_MH_PRIME}))"
        for a, b in dedup.minhash_mixers(k)
    )
    band_hash = _sql_md5_60(
        f"u.b || ':' || array_to_string(sig[u.b*{rpb}+1 : u.b*{rpb}+{rpb}], ',')")
    jac = ("CAST(LEN(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
           "LEN(list_distinct(list_concat(sa.shingles, sb.shingles)))")
    return f"""
WITH lim AS ({_MINHASH_DOCS}),
base AS (SELECT doc_id AS id, {_TOKENS_SQL} AS words FROM lim),
sh AS (SELECT id, {shingles} AS shingles FROM base),
sig AS (SELECT id, [{mh}] AS sig FROM sh),
banded AS (
  SELECT id, u.b AS band_idx, {band_hash} AS band_hash
  FROM sig, UNNEST(range(0, {bands})) AS u(b)
),
buckets AS (
  SELECT band_idx, band_hash, list(id) AS ids
  FROM banded GROUP BY 1, 2
  HAVING COUNT(*) BETWEEN 2 AND {max_bucket}
),
cand AS (
  SELECT DISTINCT a.a AS id_a, b.b AS id_b
  FROM buckets, UNNEST(ids) AS a(a), UNNEST(ids) AS b(b)
  WHERE a.a < b.b
)
SELECT id_a, id_b, ROUND({jac}, 6) AS jaccard_sim
FROM cand JOIN sh sa ON sa.id = cand.id_a JOIN sh sb ON sb.id = cand.id_b
WHERE {jac} >= {threshold}"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, md5-keyed (full oracle check — see
    sql_simhash): 64-bit fingerprint, 4x16-bit blocking, capped buckets."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500)
    return dedup.dedup_simhash(docs, max_hamming=8, hash_mode="md5").select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def sql_simhash(seed: int = 42, max_hamming: int = 8,
                max_bucket: int = 256) -> str:
    # md5-mode token hashes are 60-bit, so fingerprint bits 60..63 are always
    # 0 — transcribe bits 0..59 only (the Spark side computes 64; identical).
    fp_terms = " + ".join(
        f"(CASE WHEN 2 * LEN(list_filter(hs, h -> (h >> {i}) & 1 = 1)) "
        f"> LEN(hs) THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(60)
    )
    h_tok = _sql_md5_60(f"'{seed}:' || w")
    return f"""
WITH lim AS ({_MINHASH_DOCS}),
toks AS (SELECT doc_id AS id,
                list_transform({_TOKENS_SQL}, w -> {h_tok}) AS hs
         FROM lim),
fp AS (SELECT id, ({fp_terms}) AS fp FROM toks),
blocked AS (
  SELECT id, fp, u.ci AS chunk_idx, (fp >> (u.ci * 16)) & 65535 AS chunk_val
  FROM fp, UNNEST(range(0, 4)) AS u(ci)
),
bsize AS (
  SELECT chunk_idx, chunk_val, COUNT(*) AS c FROM blocked GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
  FROM blocked a
  JOIN blocked b ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
                AND a.id < b.id
  JOIN bsize s ON s.chunk_idx = a.chunk_idx AND s.chunk_val = a.chunk_val
  WHERE s.c BETWEEN 2 AND {max_bucket}
)
SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}"""


# ------------------------------------------------------------- text ops


_STOP_SQL = {
    "en": "['the','and','of','to','is','that']",
    "de": "['der','die','und','das','ist','nicht']",
    "fr": "['le','la','les','et','est','que']",
    "es": "['el','los','las','es','una','que']",
}

_WORDS_SQL = ("list_filter(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'), "
              "x -> x <> '')")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", text.lang_id(F.col("text")).alias("lang_pred"))


def sql_lang_id() -> str:
    scores = ",\n         ".join(
        f"LEN(list_filter({_WORDS_SQL}, x -> list_contains({arr}, x))) AS s_{l}"
        for l, arr in _STOP_SQL.items()
    )
    return f"""
WITH scored AS (
  SELECT doc_id,
         {scores}
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) < 1 THEN 'und'
            WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = GREATEST(s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = GREATEST(s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM scored"""


def q_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = F.col("text")
    feats = text.quality_features(c)
    return docs.select(
        "doc_id",
        text.token_count(c, "whitespace").alias("tokens_ws"),
        feats["n_chars"].alias("n_chars"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
    )


def sql_token_quality() -> str:
    all_stop = "[" + ",".join(
        s for arr in _STOP_SQL.values() for s in arr.strip("[]").split(",")
    ) + "]"
    return f"""
SELECT doc_id,
       LEN({_WORDS_SQL}) AS tokens_ws,
       LENGTH(text) AS n_chars,
       CASE WHEN LEN({_WORDS_SQL}) > 0
            THEN ROUND(CAST(LEN(list_filter({_WORDS_SQL},
                  x -> list_contains({all_stop}, x))) AS DOUBLE)
                 / LEN({_WORDS_SQL}), 6)
            ELSE 0.0 END AS stopword_ratio,
       CASE WHEN LENGTH(text) > 0
            THEN ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6)
            ELSE 0.0 END AS punct_ratio
FROM documents"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprints, md5-keyed word hashes
    (full oracle check via the list_reduce fold below)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        text.doc_fingerprint(F.col("text"), hash_mode="md5").alias("fingerprint"))


def sql_fingerprint(prime: int = 1_000_003) -> str:
    mod = 1 << 31
    h = _sql_md5_60("'0:' || w")
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform({_WORDS_SQL}, w -> {h} % {mod})),
         (acc, h) -> ((acc * {prime}) % {mod} + h) % {mod}) AS fingerprint
FROM documents"""


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1, public): duplicate-line fraction, duplicate-line character
    fraction, top word-2-gram + its character fraction.  All native
    Column folds over sorted arrays — O(n log n) per doc, zero shuffle,
    zero Python; fractions in exact integer micro-units so the oracle
    value-hash holds bit-for-bit."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = text.repetition_features(F.col("text"))
    return docs.select("doc_id", *[c.alias(k) for k, c in feats.items()])


def sql_repetition_profile() -> str:
    return f"""
WITH doc AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
),
lx AS (
  SELECT doc_id,
         UNNEST(list_filter(string_split(text, chr(10)), x -> x <> '')) AS line
  FROM doc
),
lc AS (
  SELECT doc_id, line, COUNT(*) AS c, LENGTH(line) AS len
  FROM lx GROUP BY doc_id, line
),
la AS (
  SELECT doc_id,
         SUM(c)::BIGINT AS n_lines,
         (SUM(c) - COUNT(*))::BIGINT AS dup_lines,
         SUM(CASE WHEN c >= 2 THEN c * len ELSE 0 END)::BIGINT AS dup_chars,
         SUM(c * len)::BIGINT AS line_chars
  FROM lc GROUP BY doc_id
),
gx AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, LEN(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM doc)
),
gc AS (
  SELECT doc_id, gram, COUNT(*)::BIGINT AS c FROM gx GROUP BY doc_id, gram
),
best AS (
  SELECT doc_id, gram, c,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, gram ASC) AS rn
  FROM gc
)
SELECT d.doc_id,
       COALESCE(la.n_lines, 0)::BIGINT AS n_lines,
       (CASE WHEN COALESCE(la.n_lines, 0) > 0
             THEN la.dup_lines * 1000000 // la.n_lines
             ELSE 0 END)::BIGINT AS dup_line_frac_u,
       (CASE WHEN COALESCE(la.line_chars, 0) > 0
             THEN la.dup_chars * 1000000 // la.line_chars
             ELSE 0 END)::BIGINT AS dup_char_frac_u,
       COALESCE(b.gram, '') AS top_gram,
       COALESCE(b.c, 0)::BIGINT AS top_gram_count,
       (CASE WHEN LENGTH(d.text) > 0 AND COALESCE(b.c, 0) > 0
             THEN b.c * LENGTH(b.gram) * 1000000 // LENGTH(d.text)
             ELSE 0 END)::BIGINT AS top_gram_char_frac_u
FROM doc d
LEFT JOIN la USING (doc_id)
LEFT JOIN (SELECT doc_id, gram, c FROM best WHERE rn = 1) b USING (doc_id)"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking + per-category counts over a deterministic synthetic
    contact string (the corpus itself carries no PII): emails, IPv4,
    phone-like digit runs.  Pure regexp_replace/regexp_count chain —
    codegen'd, zero shuffle; patterns restricted to the Java-regex ∩ RE2
    subset so the oracle runs the SAME strings."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    synth = F.concat(
        F.lit("user"), d.cast("string"),
        F.lit("@example.com reach +1 (555) 010-"),
        F.lpad(F.pmod(d, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" at 10.0."), F.pmod(d, F.lit(256)).cast("string"),
        F.lit(".7 ok"))
    cnts = text.pii_counts(synth)
    return docs.select(
        "doc_id", text.mask_pii(synth).alias("masked"),
        *[c.alias(k) for k, c in cnts.items()])


def sql_pii_scrub() -> str:
    email, ip, phone = text.PII_EMAIL, text.PII_IPV4, text.PII_PHONE
    return f"""
WITH s AS (
  SELECT doc_id,
         'user' || doc_id || '@example.com reach +1 (555) 010-'
           || lpad((doc_id % 10000)::VARCHAR, 4, '0')
           || ' at 10.0.' || (doc_id % 256) || '.7 ok' AS synth
  FROM documents
),
m AS (
  SELECT doc_id, synth,
         regexp_replace(regexp_replace(synth,
             '{email}', '<EMAIL>', 'g'),
             '{ip}', '<IP>', 'g') AS no_addr
  FROM s
)
SELECT doc_id,
       regexp_replace(no_addr, '{phone}', '<PHONE>', 'g') AS masked,
       len(regexp_extract_all(synth, '{email}'))::BIGINT AS n_emails,
       len(regexp_extract_all(synth, '{ip}'))::BIGINT AS n_ips,
       len(regexp_extract_all(no_addr, '{phone}'))::BIGINT AS n_phones
FROM m"""


def curation_stage(docs: DataFrame) -> DataFrame:
    """The composed curation flow over a documents frame: exact dedup
    (min-id survivor) -> language ID -> quality scoring -> token floor ->
    keep en docs with quality >= 0.5.  Shared by the batch gate query and
    the streamed foreachBatch accumulation test (dedup is the only
    non-stateless stage, so streamed runs feed it dedup-key-disjoint
    micro-batches — the hash-partitioned shape a 100 TB dedup has
    anyway)."""
    survivors = dedup.dedup_exact(docs)
    c = F.col("text")
    enriched = survivors.select(
        "doc_id",
        text.lang_id(c).alias("lang_pred"),
        text.quality_score(c).alias("quality"),
        text.token_count(c, "whitespace").alias("tokens_ws"),
    )
    return enriched.filter(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
        & (F.col("tokens_ws") >= 5))


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation flow in ONE oracle-checked query
    (see :func:`curation_stage`).  Exercises operator COMPOSITION — each
    stage is also individually gated (dedup_exact, lang_id,
    token_quality)."""
    return curation_stage(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def sql_curation_pipeline() -> str:
    all_stop = "[" + ",".join(
        s for arr in _STOP_SQL.values() for s in arr.strip("[]").split(",")
    ) + "]"
    scores = ",\n         ".join(
        f"LEN(list_filter({_WORDS_SQL}, x -> list_contains({arr}, x))) AS s_{l}"
        for l, arr in _STOP_SQL.items()
    )
    return f"""
WITH survivors AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (
             PARTITION BY MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
             ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
enriched AS (
  SELECT doc_id,
         {scores},
         LEN({_WORDS_SQL}) AS n_words,
         LENGTH(text) AS n_chars,
         LEN(list_filter({_WORDS_SQL},
             x -> list_contains({all_stop}, x))) AS n_stop,
         LENGTH(text)
           - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS n_punct,
         LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g')) AS n_upper
  FROM survivors
),
scored AS (
  SELECT doc_id,
         CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) < 1 THEN 'und'
              WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = GREATEST(s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = GREATEST(s_fr, s_es) THEN 'fr'
              ELSE 'es' END AS lang_pred,
         -- exact integer micro-unit arithmetic (mirrors text.quality_score)
         CAST(
           (CASE WHEN n_words BETWEEN 5 AND 100000 THEN 250000 ELSE 0 END)
           + (CASE WHEN n_words > 0
                   THEN LEAST(n_stop * 2500000 // n_words, 250000)
                   ELSE 0 END)
           + (CASE WHEN n_punct * 10 <= n_chars THEN 250000
                   ELSE GREATEST(250000 -
                        ((CASE WHEN n_chars > 0
                               THEN n_punct * 1000000 // n_chars
                               ELSE 0 END) - 100000), 0) END)
           + (CASE WHEN n_upper * 10 <= n_chars * 3 THEN 250000 ELSE 0 END)
         AS DOUBLE) / 1000000.0 AS quality,
         n_words AS tokens_ws
  FROM enriched
)
SELECT doc_id, lang_pred, quality, tokens_ws FROM scored
WHERE lang_pred = 'en' AND quality >= 0.5 AND tokens_ws >= 5"""


# ------------------------------------------------------- similarity / kNN


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return cosine_topk(queries, emb, k=5)


def sql_cosine_topk() -> str:
    return """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
),
sims AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
                    e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, rank, vec_id, sim FROM sims WHERE rank <= 5"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN, fully oracle-checked: integer-quantized vectors, the
    coarse quantizer is a relational centroid table (every 25th vector), so
    argmin list assignment and nprobe probing are exact arithmetic on both
    engines; only the final cosine is floating (rounded, like cosine_topk)."""
    from .operators.similarity import ivf_flat_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    centroids = emb.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ivf_flat_topk(queries, emb, centroids, k=5, nprobe=3)


def q_ivf_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME IVF job through the BLAS Arrow kernel (wide-embedding
    path, similarity.ivf_assign_arrow) against the SAME oracle: the gate
    vectors are integer-quantized, so matmul vs sequential-fold summation
    order cannot diverge (exact integer-valued doubles) and the
    assignment, probing, tie-breaks, and rounded cosines are all
    bit-identical to the Column path — the Python-boundary kernel is in
    the correctness gate, not just pytest."""
    from .operators.similarity import ivf_flat_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    centroids = emb.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ivf_flat_topk(queries, emb, centroids, k=5, nprobe=3,
                         kernel="arrow")


def sql_ivf_topk(k: int = 5, nprobe: int = 3) -> str:
    d2 = ("list_aggregate(list_transform(list_zip(QV, CV), "
          "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> ROUND(x * 1000)) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id % 25 = 0),
corpus_assign AS (
  SELECT c_id, cvec, cent_id FROM (
    SELECT e.vec_id AS c_id, e.v AS cvec, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {d2.replace("QV", "e.v").replace("CV", "c.cv")},
                      c.cent_id) AS r
    FROM emb e CROSS JOIN cent c) WHERE r = 1
),
probes AS (
  SELECT q_id, qv, cent_id FROM (
    SELECT e.vec_id AS q_id, e.v AS qv, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {d2.replace("QV", "e.v").replace("CV", "c.cv")},
                      c.cent_id) AS r
    FROM emb e CROSS JOIN cent c WHERE e.vec_id < 10) WHERE r <= {nprobe}
),
cand AS (
  SELECT p.q_id, p.qv, a.c_id, a.cvec
  FROM probes p JOIN corpus_assign a USING (cent_id)
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT q_id AS query_id, c_id AS vec_id,
         ROUND(list_cosine_similarity(qv, cvec), 6) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY ROUND(list_cosine_similarity(qv, cvec), 6) DESC, c_id)
           AS rank
  FROM cand
) WHERE rank <= {k}"""


def _quantized_planes(dim: int = 64, n_planes: int = 8, n_tables: int = 4,
                      seed: int = 7) -> list[list[list[float]]]:
    """Integer-valued hyperplanes (gaussian * 1000, rounded): dot products
    against integer-quantized vectors are exact in doubles on BOTH engines,
    so the sign-pattern bucket assignment can never flip on a fp boundary."""
    from .operators.similarity import _hyperplanes

    return [[[float(round(x * 1000)) for x in plane] for plane in table]
            for table in _hyperplanes(dim, n_planes, n_tables, seed)]


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-duplicate vector pairs, fully oracle-checked: the corpus is
    integer-quantized embeddings plus planted perturbed duplicates (every
    50th vector, +1 per dim — cosine ~0.9999), bucketed by integer-quantized
    hyperplanes; the SQL transcribes the same bucket mechanics (including
    the max_bucket cap) so candidate generation matches exactly."""
    from .operators.similarity import embedding_near_dup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    dups = emb.filter(F.pmod(F.col("vec_id"), F.lit(50)) == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x + 1.0).alias("embedding"))
    corpus = emb.unionByName(dups)
    return embedding_near_dup(corpus, threshold=0.99, max_bucket=64,
                              tables=_quantized_planes())


def sql_embedding_near_dup(threshold: float = 0.99, max_bucket: int = 64) -> str:
    tables = _quantized_planes()
    bucket_cases = []
    for ti, table in enumerate(tables):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, {[int(x) for x in plane]}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j, plane in enumerate(table)
        )
        bucket_cases.append(f"WHEN {ti} THEN ({terms})")
    bucket = "CASE u.ti " + " ".join(bucket_cases) + " END"
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> ROUND(x * 1000)) AS v
  FROM embeddings
),
corpus AS (
  SELECT vec_id, v FROM emb
  UNION ALL
  SELECT vec_id + 10000, list_transform(v, x -> x + 1)
  FROM emb WHERE vec_id % 50 = 0
),
b AS (
  SELECT vec_id AS id, v, u.ti AS table_idx, {bucket} AS bucket
  FROM corpus, UNNEST(range(0, {len(tables)})) AS u(ti)
),
bsize AS (SELECT table_idx, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.id AS id_a, b2.id AS id_b, a.v AS va, b2.v AS vb
  FROM b a
  JOIN b b2 ON a.table_idx = b2.table_idx AND a.bucket = b2.bucket
           AND a.id < b2.id
  JOIN bsize s ON s.table_idx = a.table_idx AND s.bucket = a.bucket
  WHERE s.c <= {max_bucket}
)
SELECT id_a, id_b, ROUND(list_cosine_similarity(va, vb), 6) AS sim
FROM cand WHERE ROUND(list_cosine_similarity(va, vb), 6) >= {threshold}"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN, fully oracle-checked: integer-quantized
    vectors + integer-quantized planes (exact sign-pattern buckets on both
    engines); the SQL mirrors the bucket mechanics, candidate dedup, and
    rounded-cosine ranking exactly."""
    from .operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ann_lsh_topk(queries, emb, k=5, dim=64,
                        tables=_quantized_planes())


def q_ann_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same LSH job through the BLAS bucket kernel against the SAME
    oracle: integer-quantized planes and vectors make X·Pᵀ sign bits
    exact regardless of summation order, so buckets, candidates, and
    rounded cosines are bit-identical to the Column path."""
    from .operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return ann_lsh_topk(queries, emb, k=5, dim=64,
                        tables=_quantized_planes(), kernel="arrow")


def sql_ann_topk(k: int = 5) -> str:
    tables = _quantized_planes()
    bucket_cases = []
    for ti, table in enumerate(tables):
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, {[int(x) for x in plane]}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j, plane in enumerate(table)
        )
        bucket_cases.append(f"WHEN {ti} THEN ({terms})")
    bucket = "CASE u.ti " + " ".join(bucket_cases) + " END"
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> ROUND(x * 1000)) AS v
  FROM embeddings
),
b AS (
  SELECT vec_id AS id, v, u.ti AS table_idx, {bucket} AS bucket
  FROM emb, UNNEST(range(0, {len(tables)})) AS u(ti)
),
cand AS (
  SELECT DISTINCT q.id AS q_id, q.v AS qv, c.id AS c_id, c.v AS cv
  FROM b q JOIN b c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.id < 10
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT q_id AS query_id, c_id AS vec_id,
         ROUND(list_cosine_similarity(qv, cv), 6) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, c_id)
           AS rank
  FROM cand
) WHERE rank <= {k}"""


_MERC_Y = ("((1.0 - LN(TAN(RADIANS(GREATEST(-85.05112878, LEAST(lat, 85.05112878))))"
           " + 1.0 / COS(RADIANS(GREATEST(-85.05112878, LEAST(lat, 85.05112878)))))"
           " / PI()) / 2.0)")
_MERC_X = "((lon + 180.0) / 360.0)"


def q_knn_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring-expansion kNN through the PRODUCTION corpus mode (VERDICT r4
    item 3): the corpus is persisted once as a cell-bucketed table
    (write_knn_corpus) and every probe round filters ``p_cell IN (...)``
    — a bucket-pruned scan (SelectedBucketsCount in the plan, asserted
    in tests/test_spatial_ops.py) instead of the in-memory
    cache-and-rescan convenience mode.  Results are identical to the
    DataFrame mode (same oracle)."""
    import os
    import tempfile

    from .operators.knn import write_knn_corpus
    from .sources.features import _source_fingerprint

    feats = features_from_lineitem(spark, sf_dir)
    points = feats.select(F.col("feature_id").alias("point_id"), "lon", "lat")
    queries = (feats.filter(F.pmod(F.col("feature_id"), F.lit(997)) == 0)
               .select(F.col("feature_id").alias("query_id"), "lon", "lat"))
    tag = _source_fingerprint(sf_dir)
    table = f"knn_corpus_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"mfs_knn_corpus_{tag}")
    # overwrite-write every call: idempotent, immune to a stale catalog
    # entry pointing at a cleaned scratch path (tiny at gate scale; at
    # fleet scale the corpus is written once out-of-band)
    write_knn_corpus(points, table, path, zoom=6)
    return knn_ring(queries, None, k=5, zoom=6, points_table=table)


def sql_knn_ring() -> str:
    return f"""WITH {FEATURES_ORACLE_SQL},
p AS (SELECT feature_id AS point_id, {_MERC_X} AS px, {_MERC_Y} AS py FROM features),
q AS (SELECT feature_id AS query_id, {_MERC_X} AS qx, {_MERC_Y} AS qy
      FROM features WHERE feature_id % 997 = 0),
d AS (
  SELECT q.query_id, p.point_id,
         SQRT(POW(qx - px, 2) + POW(qy - py, 2)) AS rawd,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY SQRT(POW(qx - px, 2) + POW(qy - py, 2)),
                                     p.point_id) AS rank
  FROM q CROSS JOIN p
)
SELECT query_id, rank, point_id, ROUND(rawd, 9) AS dist FROM d WHERE rank <= 5"""


# --------------------------------------------------------- spatial joins


def _rect_polys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 axis-aligned rectangles derived from the part table; corners offset
    by 0.0005 so no 3-decimal-grid feature sits exactly on a boundary."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_partkey") <= 30)
    x0 = (F.pmod(F.col("p_partkey") * 7013, F.lit(340)) - 170 + 0.0005).cast("double")
    y0 = (F.pmod(F.col("p_partkey") * 3571, F.lit(150)) - 75 + 0.0005).cast("double")
    w_ = (F.pmod(F.col("p_partkey") * 37, F.lit(20)) + 2).cast("double")
    h_ = (F.pmod(F.col("p_partkey") * 53, F.lit(14)) + 2).cast("double")
    ring = F.array(
        F.struct(x0.alias("lon"), y0.alias("lat")),
        F.struct((x0 + w_).alias("lon"), y0.alias("lat")),
        F.struct((x0 + w_).alias("lon"), (y0 + h_).alias("lat")),
        F.struct(x0.alias("lon"), (y0 + h_).alias("lat")),
    )
    return part.select(F.col("p_partkey").cast("string").alias("poly_id"),
                       ring.alias("ring"))


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = features_from_lineitem(spark, sf_dir).select("feature_id", "lon", "lat")
    polys = _rect_polys(spark, sf_dir)
    return point_in_polygon_join(feats, polys, zoom=6).select(
        "feature_id", "poly_id")


def sql_pip_join() -> str:
    return f"""WITH {FEATURES_ORACLE_SQL},
polys AS (
  SELECT CAST(p_partkey AS VARCHAR) AS poly_id,
         (p_partkey * 7013) % 340 - 170 + 0.0005 AS x0,
         (p_partkey * 3571) % 150 - 75 + 0.0005 AS y0,
         (p_partkey * 37) % 20 + 2 AS w,
         (p_partkey * 53) % 14 + 2 AS h
  FROM part WHERE p_partkey <= 30
)
SELECT f.feature_id, p.poly_id
FROM features f JOIN polys p
  ON f.lon > p.x0 AND f.lon < p.x0 + p.w
 AND f.lat > p.y0 AND f.lat < p.y0 + p.h"""


def q_raster_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster<->vector broadcast join: synthetic per-cell band stats derived
    from supplier, joined to features at z=5."""
    feats = features_from_lineitem(spark, sf_dir)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = 1 << 5
    raster = supp.select(
        F.lit(5).alias("z"),
        F.pmod(F.col("s_suppkey") * 13, F.lit(n)).cast("long").alias("x"),
        F.pmod(F.col("s_suppkey") * 29, F.lit(n)).cast("long").alias("y"),
        F.pmod(F.col("s_suppkey"), F.lit(1000)).alias("band"),
    ).groupBy("z", "x", "y").agg(F.max("band").alias("band_max"))
    out = raster_vector_join(feats, raster, zoom=5)
    return out.groupBy("band_max").agg(F.count(F.lit(1)).alias("n"))


def sql_raster_join() -> str:
    n = 1 << 5
    return f"""WITH {FEATURES_ORACLE_SQL},
raster AS (
  SELECT (s_suppkey * 13) % {n} AS x, (s_suppkey * 29) % {n} AS y,
         MAX(s_suppkey % 1000) AS band_max
  FROM supplier GROUP BY 1, 2
),
j AS (
  SELECT r.band_max
  FROM features f LEFT JOIN raster r
    ON {_sql_tile_x(5)} = r.x AND {_sql_tile_y(5)} = r.y
)
SELECT band_max, COUNT(*) AS n FROM j GROUP BY band_max"""


# ------------------------------------------------------------- down-copy

_DOWNCOPY_SPEC = {
    "dst-zoom": 8,
    "source-layer": "waterway",
    "filter": ["all",
               ["==", ["geometry-type"], "LineString"],
               ["!=", ["string", ["get", "class"]], "stream"],
               ["match", ["string", ["get", "brunnel"], ""],
                ["tunnel", "bridge"], False, True]],
}


def q_downcopy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.assemble import assign_tiles

    feats = features_from_lineitem(spark, sf_dir)
    assigned = assign_tiles(feats, zooms=[8, 9]).select(
        "z", "x", "y", "layer", "feature_id", "geom_kind", "props",
        "p_class", "p_brunnel")
    out = copy_down(assigned, DownCopySpec.from_json(_DOWNCOPY_SPEC))
    return out.filter(F.col("z") == 8).select(
        "z", "x", "y", "layer", "feature_id", "new_feature_id", "quadrant")


def sql_downcopy() -> str:
    keep = ("geom_kind = 'LineString' AND p_class IS NOT NULL AND "
            "p_class <> 'stream' AND COALESCE(p_brunnel,'') NOT IN ('tunnel','bridge')")
    # neg filter: FALSE (not failed): class present AND NOT keep-body
    neg = f"p_class IS NOT NULL AND NOT ({keep})"
    return f"""WITH {FEATURES_ORACLE_SQL},
t8 AS (SELECT 8 AS z, {_sql_tile_x(8)} AS x, {_sql_tile_y(8)} AS y,
              layer, feature_id, geom_kind, p_class, p_brunnel FROM features),
t9 AS (SELECT 9 AS z, {_sql_tile_x(9)} AS x, {_sql_tile_y(9)} AS y,
              layer, feature_id, geom_kind, p_class, p_brunnel FROM features),
dst AS (
  SELECT z, x, y, layer, feature_id, geom_kind, 0 AS rank, 0 AS quadrant
  FROM t8 WHERE layer <> 'waterway' OR ({neg})
),
child AS (
  SELECT 8 AS z, x // 2 AS x, y // 2 AS y, layer, feature_id, geom_kind,
         2 * (x % 2) + (y % 2) + 1 AS rank, 2 * (x % 2) + (y % 2) AS quadrant
  FROM t9 WHERE layer = 'waterway' AND ({keep})
),
merged AS (SELECT * FROM dst UNION ALL SELECT * FROM child)
SELECT z, x, y, layer, feature_id,
       CASE WHEN MAX(rank) OVER (PARTITION BY z, x, y, layer, geom_kind) > 0
            THEN ROW_NUMBER() OVER (PARTITION BY z, x, y, layer, geom_kind
                                    ORDER BY rank, feature_id)
            ELSE feature_id END AS new_feature_id,
       quadrant
FROM merged"""


def q_downcopy_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-copy WITH the reference's geometry rescale (DownCopy.hs:63-70):
    every feature carries a synthetic 2-point LineString command stream
    (MoveTo + LineTo, zigzag deltas, tile-local coords); copied children
    get ``p' = (quadrant*extent + p) div 2`` applied by the NATIVE column
    fold (shrink_cmds_col).  Output = the six command integers as columns,
    value-hash-checked against the DuckDB transcription below."""
    from .operators.assemble import assign_tiles

    feats = features_from_lineitem(spark, sf_dir)
    assigned = assign_tiles(feats, zooms=[8, 9]).select(
        "z", "x", "y", "layer", "feature_id", "geom_kind", "props",
        "p_class", "p_brunnel")
    fid = F.col("feature_id")

    def zig(v):
        return F.when(v >= 0, 2 * v).otherwise(-2 * v - 1).cast("long")

    # coords kept positive so the oracle's // needs no floor-vs-trunc care;
    # the negative-coord floor path is covered by the pytest differential
    px1 = F.lit(64) + F.pmod(fid, F.lit(4000))
    py1 = F.lit(64) + F.pmod(fid * 7, F.lit(4000))
    dx2 = F.pmod(fid, F.lit(97)) - 48
    dy2 = F.pmod(fid, F.lit(89)) - 44
    assigned = assigned.withColumn(
        "geom_cmds",
        F.array(F.lit(9).cast("long"), zig(px1), zig(py1),
                F.lit(10).cast("long"), zig(dx2), zig(dy2)))
    out = copy_down(assigned, DownCopySpec.from_json(_DOWNCOPY_SPEC),
                    cmds_col="geom_cmds")
    g = F.col("geom_cmds")
    return out.filter(F.col("z") == 8).select(
        "z", "x", "y", "layer", "feature_id", "quadrant",
        *[F.element_at(g, i + 1).alias(f"c{i + 1}") for i in range(6)])


def sql_downcopy_geom() -> str:
    keep = ("geom_kind = 'LineString' AND p_class IS NOT NULL AND "
            "p_class <> 'stream' AND COALESCE(p_brunnel,'') NOT IN ('tunnel','bridge')")
    neg = f"p_class IS NOT NULL AND NOT ({keep})"
    zig = "CASE WHEN {v} >= 0 THEN 2*({v}) ELSE -2*({v}) - 1 END"
    px1 = "(64 + feature_id % 4000)"
    py1 = "(64 + (feature_id*7) % 4000)"
    dx2 = "(feature_id % 97 - 48)"
    dy2 = "(feature_id % 89 - 44)"
    # child transform: absolute p1=(px1,py1), p2=p1+d2; n = (q*4096+p)//2
    n1x = f"((x % 2) * 4096 + {px1}) // 2"
    n1y = f"((y % 2) * 4096 + {py1}) // 2"
    n2x = f"((x % 2) * 4096 + {px1} + {dx2}) // 2"
    n2y = f"((y % 2) * 4096 + {py1} + {dy2}) // 2"
    return f"""WITH {FEATURES_ORACLE_SQL},
t8 AS (SELECT 8 AS z, {_sql_tile_x(8)} AS x, {_sql_tile_y(8)} AS y,
              layer, feature_id, geom_kind, p_class, p_brunnel FROM features),
t9 AS (SELECT 9 AS z, {_sql_tile_x(9)} AS x, {_sql_tile_y(9)} AS y,
              layer, feature_id, geom_kind, p_class, p_brunnel FROM features),
dst AS (
  SELECT z, x, y, layer, feature_id, 0 AS quadrant,
         9 AS c1, {zig.format(v=px1)} AS c2, {zig.format(v=py1)} AS c3,
         10 AS c4, {zig.format(v=dx2)} AS c5, {zig.format(v=dy2)} AS c6
  FROM t8 WHERE layer <> 'waterway' OR ({neg})
),
child AS (
  SELECT 8 AS z, x // 2 AS x, y // 2 AS y, layer, feature_id,
         2 * (x % 2) + (y % 2) AS quadrant,
         9 AS c1, {zig.format(v=n1x)} AS c2, {zig.format(v=n1y)} AS c3,
         10 AS c4, {zig.format(v=f"{n2x} - ({n1x})")} AS c5,
         {zig.format(v=f"{n2y} - ({n1y})")} AS c6
  FROM t9 WHERE layer = 'waterway' AND ({keep})
)
SELECT * FROM dst UNION ALL SELECT * FROM child"""


# ------------------------------------------------------------- MVT codec


def q_mvt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gzip+MVT-protobuf codec integrity through Spark: README-filtered
    features -> encode_mvt_tiles (real gzipped MVT blobs, applyInPandas) ->
    decode_mvt_tiles (gunzip-sniff + varint parse, mapInPandas) -> relational
    aggregate.  The oracle computes the same aggregate with NO codec, so any
    corruption of ids, props values (typed Value messages), or the zigzag
    geometry stream shows up as a value mismatch."""
    from .geo.tilemath import tile_cols
    from .operators.style_ops import filter_keep
    from .sources.mvt import decode_mvt_tiles, encode_mvt_tiles

    feats = features_from_lineitem(spark, sf_dir).withColumn("z", F.lit(6))
    kept = filter_keep(feats, README_STYLE)
    x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(6))
    px = F.pmod(F.col("feature_id"), F.lit(4096))
    py = F.pmod(F.col("feature_id") * 7, F.lit(4096))
    gtype = (F.when(F.col("geom_kind") == "Point", 1)
             .when(F.col("geom_kind") == "LineString", 2)
             .otherwise(3)).cast("long")
    rows = kept.select(
        F.col("z").cast("long"), x.alias("x"), y.alias("y"), "layer",
        F.lit(4096).cast("long").alias("extent"), "feature_id",
        gtype.alias("geom_type"), "geom_kind", "props",
        # single-point command stream: MoveTo(1) + zigzag(px) + zigzag(py)
        F.array(F.lit(9).cast("long"), (px * 2).cast("long"),
                (py * 2).cast("long")).alias("geom_cmds"),
    )
    tiles = encode_mvt_tiles(rows)
    decoded = decode_mvt_tiles(tiles)
    return decoded.groupBy("z", "x", "y", "layer").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("feature_id").alias("fid_sum"),
        F.sum(F.when(F.try_element_at(F.col("props"), F.lit("class"))
                     == "river", 1).otherwise(0)).alias("river_n"),
        F.sum(F.element_at(F.col("geom_cmds"), 2)).alias("gx_sum"),
    )


def sql_mvt_roundtrip() -> str:
    return f"""WITH {FEATURES_ORACLE_SQL}
SELECT 6 AS z, {_sql_tile_x(6)} AS x, {_sql_tile_y(6)} AS y, layer,
       COUNT(*) AS n,
       CAST(SUM(feature_id) AS BIGINT) AS fid_sum,
       CAST(SUM(CASE WHEN p_class = 'river' THEN 1 ELSE 0 END) AS BIGINT)
         AS river_n,
       CAST(SUM(2 * (feature_id % 4096)) AS BIGINT) AS gx_sum
FROM features WHERE {_README_KEEP_SQL}
GROUP BY 1, 2, 3, 4"""


def q_downcopy_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-1 advice fix in the GATE: copy_down leaves the child level
    (dst+1) untouched — children are COPIED into dst, never consumed
    (reference stores child tiles independently, Main.hs:385,517-522)."""
    from .operators.assemble import assign_tiles

    feats = features_from_lineitem(spark, sf_dir)
    assigned = assign_tiles(feats, zooms=[8, 9]).select(
        "z", "x", "y", "layer", "feature_id", "geom_kind", "props",
        "p_class", "p_brunnel")
    out = copy_down(assigned, DownCopySpec.from_json(_DOWNCOPY_SPEC))
    return out.filter(F.col("z") == 9).select(
        "z", "x", "y", "layer", "feature_id", "new_feature_id", "quadrant")


def sql_downcopy_passthrough() -> str:
    # every z=9 row passes through unchanged: new id == id, quadrant 0
    return f"""WITH {FEATURES_ORACLE_SQL}
SELECT 9 AS z, {_sql_tile_x(9)} AS x, {_sql_tile_y(9)} AS y,
       layer, feature_id, feature_id AS new_feature_id, 0 AS quadrant
FROM features"""


# ------------------------------------------------- relational breadth


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate (sum/avg/count over two group keys)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def sql_agg_pricing() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def q_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(),
                                            F.col("event_id").asc())
    return (ev.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("event_type", "rk", "event_id"))


def sql_topk_events() -> str:
    return """
SELECT event_type, rk, event_id FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3"""


def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim-chain join: lineitem -> orders -> customer -> nation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(na), c.c_nationkey == na.n_nationkey))
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        # exact cents sum — l_extendedprice is 2-decimal, so the int64 sum
        # is the true total and /100.0 the already-rounded value; the
        # double-sum ROUND was merge-order dependent (sessionize class)
        (F.sum(_price_c()) / 100.0).alias("volume"))


def sql_join_chain() -> str:
    return """
SELECT n_name, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


def q_tile_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator breadth: tiles occupied at z=6 by waterway EXCEPT those
    occupied by place, UNION'd with the INTERSECTION tagged — exercises
    exceptAll/intersect as tile-set algebra (which tiles need repaint when a
    layer toggles)."""
    from .geo.tilemath import tile_cols

    feats = features_from_lineitem(spark, sf_dir)
    x, y = tile_cols(F.col("lon"), F.col("lat"), F.lit(6))
    t = feats.select(F.lit(6).alias("z"), x.alias("x"), y.alias("y"), "layer")
    water = t.filter(F.col("layer") == "waterway").select("z", "x", "y").distinct()
    place = t.filter(F.col("layer") == "place").select("z", "x", "y").distinct()
    only_water = water.exceptAll(place).withColumn("kind", F.lit("water_only"))
    both = water.intersect(place).withColumn("kind", F.lit("both"))
    return only_water.unionByName(both).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"))


def sql_tile_set_ops() -> str:
    return f"""WITH {FEATURES_ORACLE_SQL},
t AS (SELECT 6 AS z, {_sql_tile_x(6)} AS x, {_sql_tile_y(6)} AS y, layer
      FROM features),
water AS (SELECT DISTINCT z, x, y FROM t WHERE layer = 'waterway'),
place AS (SELECT DISTINCT z, x, y FROM t WHERE layer = 'place'),
tagged AS (
  SELECT 'water_only' AS kind FROM (SELECT * FROM water EXCEPT SELECT * FROM place)
  UNION ALL
  SELECT 'both' AS kind FROM (SELECT * FROM water INTERSECT SELECT * FROM place)
)
SELECT kind, COUNT(*) AS n FROM tagged GROUP BY kind"""


def q_manifest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP breadth: tile counts per (z, layer) with per-z and grand
    totals in one pass — the job-manifest summary a resume UI shows."""
    from .operators.assemble import assign_tiles

    feats = features_from_lineitem(spark, sf_dir)
    assigned = assign_tiles(feats, zooms=[5, 6])
    return (
        assigned.rollup("z", "layer")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.coalesce(F.col("z").cast("string"), F.lit("ALL")).alias("z"),
                F.coalesce(F.col("layer"), F.lit("ALL")).alias("layer"), "n")
    )


def sql_manifest_rollup() -> str:
    return f"""WITH {FEATURES_ORACLE_SQL},
zoomed AS (
  SELECT f.*, z.z FROM features f CROSS JOIN (VALUES (5),(6)) AS z(z)
)
SELECT COALESCE(CAST(z AS VARCHAR), 'ALL') AS z,
       COALESCE(layer, 'ALL') AS layer, COUNT(*) AS n
FROM zoomed GROUP BY ROLLUP (z, layer)"""


def _serve_target_tile(z: int = 6, fid: int = 46) -> tuple[int, int]:
    """Deterministic serve-path target: the z-tile containing feature
    ``fid`` (same derivation as sources/features.py, computed driver-side
    so BOTH the Spark query and the SQL oracle share the concrete key).
    fid=46 is the first README-kept waterway feature at sf0.01, so the
    served tile is provably non-empty at the gate's scale factor."""
    import math

    lon = ((fid * 7919) % 360000) / 1000.0 - 180.0
    lat = ((fid * 104729) % 170000) / 1000.0 - 85.0
    latc = max(-85.05112878, min(lat, 85.05112878))
    n = 1 << z
    x = max(0, min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1))
    merc = math.log(math.tan(math.radians(latc))
                    + 1.0 / math.cos(math.radians(latc)))
    y = max(0, min(int(math.floor((1.0 - merc / math.pi) / 2.0 * n)), n - 1))
    return x, y


def q_serve_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path in the gate: keyed point lookup -> on-the-fly README
    filter -> π -> γ for ONE tile (runWebServer's per-request shape,
    Main.hs:556-563) — partition-pruned fetch + assembly."""
    from .operators.assemble import assign_tiles
    from .plans.serve import serve_tile

    x, y = _serve_target_tile()
    feats = features_from_lineitem(spark, sf_dir)
    store = assign_tiles(feats, zooms=[6])
    out = serve_tile(store, README_STYLE, 6, x, y)
    return out.select("z", "x", "y", "layer", "feature_count")


def sql_serve_tile() -> str:
    x, y = _serve_target_tile()
    return f"""WITH {FEATURES_ORACLE_SQL}
SELECT 6 AS z, {x} AS x, {y} AS y, layer, COUNT(*) AS feature_count
FROM features
WHERE {_README_KEEP_SQL}
  AND {_sql_tile_x(6)} = {x} AND {_sql_tile_y(6)} = {y}
GROUP BY layer"""


def q_media_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.media import media_ref_kind

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = F.concat(
        F.lit("media://blob/"), F.col("doc_id").cast("string"),
        F.element_at(F.array(F.lit(".jpg"), F.lit(".mp4"), F.lit(".mp3"),
                             F.lit(".bin")),
                     (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int")),
    )
    return (docs.select(media_ref_kind(ref).alias("kind"))
            .groupBy("kind").agg(F.count(F.lit(1)).alias("n")))


def sql_media_kind() -> str:
    return """
SELECT CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
                       WHEN 2 THEN 'audio' ELSE 'unknown' END AS kind,
       COUNT(*) AS n
FROM documents GROUP BY 1"""


# ------------------------------------------------------ S2-style cell index
#
# north_rule: "H3/S2 index".  geo/s2.py implements the S2 half (cube-face
# + Hilbert) as native columns; these gates value-hash the full pipeline
# (trig → face → quadratic s/t → Hilbert fold → id bit-assembly → parent/
# range arithmetic) against a DuckDB recursive-CTE transcription.


def q_s2_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .geo import s2

    feats = features_from_lineitem(spark, sf_dir).select(
        "feature_id", "lon", "lat")
    # bulk path: chained-projection unroll, whole-stage codegen;
    # parent/token/face below are bit ops on the materialized cell column.
    # Level 21 (~10 m cells) exercises the deep end of the MAX_LEVEL=29
    # layout — the Hilbert fold runs 21 unrolled steps and the ids use
    # high bits (face << 59).
    return (
        s2.with_s2_cell(feats, level=21, out="s2_cell")
        .select(
            "feature_id", "s2_cell",
            s2.s2_face(F.col("s2_cell")).alias("s2_face"),
            s2.s2_parent(F.col("s2_cell"), 4).alias("s2_parent4"),
            s2.s2_token(F.col("s2_cell")).alias("s2_token"))
    )


def sql_s2_assign() -> str:
    from .geo import s2

    cte = s2.s2_oracle_cte(
        "SELECT feature_id AS pkey, lon, lat, 21 AS lvl FROM features")
    lsb4 = 1 << (2 * (s2.MAX_LEVEL - 4))
    return f"""WITH RECURSIVE {FEATURES_ORACLE_SQL}, {cte}
SELECT pkey AS feature_id, cell AS s2_cell,
       cell >> {2 * s2.MAX_LEVEL + 1} AS s2_face,
       (cell & ~({2 * lsb4} - 1)) | {lsb4} AS s2_parent4,
       regexp_replace(lower(hex(cell)), '0+$', '') AS s2_token
FROM s2cells"""


def q_s2_cover_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-level covering: regions at levels 2-4 derived from customer
    keys (a level-2 region CONTAINS its level-3/4 sub-regions, so points
    match several regions — parent-equality can't express this; the range
    join can).  Point corpus never shuffles: broadcast range join."""
    from .geo import s2

    feats = s2.with_s2_cell(
        features_from_lineitem(spark, sf_dir).select("feature_id", "lon", "lat"),
        level=12, out="cell").select("feature_id", "cell")

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.pmod(F.col("c_custkey") * 7919, F.lit(360000))
          .cast("double") / 1000.0) - 180.0).alias("lon"),
        ((F.pmod(F.col("c_custkey") * 104729, F.lit(170000))
          .cast("double") / 1000.0) - 85.0).alias("lat"))
    regions = None
    for k, level in enumerate((2, 3, 4)):
        part = (s2.with_s2_cell(
            cust.filter(F.pmod(F.col("c_custkey"), F.lit(3)) == k),
            level=level, out="region_cell")
            .select("region_cell"))
        regions = part if regions is None else regions.unionByName(part)
    regions = regions.distinct()

    return (s2.s2_covering_join(feats, regions)
            .groupBy("region_cell")
            .agg(F.count(F.lit(1)).alias("n_features")))


def sql_s2_cover_join() -> str:
    from .geo import s2

    cte = s2.s2_oracle_cte("""
SELECT 'f' || CAST(feature_id AS VARCHAR) AS pkey, lon, lat, 12 AS lvl
FROM features
UNION ALL
SELECT 'c' || CAST(c_custkey AS VARCHAR),
       (c_custkey * 7919) % 360000 / 1000.0 - 180.0,
       (c_custkey * 104729) % 170000 / 1000.0 - 85.0,
       CAST(2 + c_custkey % 3 AS INT)
FROM customer""")
    return f"""WITH RECURSIVE {FEATURES_ORACLE_SQL}, {cte},
fcells AS (SELECT cell FROM s2cells WHERE lvl = 12),
rcells AS (SELECT DISTINCT cell AS region_cell FROM s2cells WHERE lvl < 12)
SELECT r.region_cell, COUNT(*) AS n_features
FROM fcells f JOIN rcells r
  ON f.cell BETWEEN r.region_cell - (r.region_cell & -r.region_cell) + 1
                AND r.region_cell + (r.region_cell & -r.region_cell) - 1
GROUP BY r.region_cell"""


def q_s2_cover_join_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-broadcast covering join (region set too big to broadcast):
    point cells explode to their ancestor chain and EQUI-join the region
    cells — a plain hash join, partition-parallel at any region count.
    Same inputs and oracle as s2_cover_join; identical results required."""
    from .geo import s2

    feats = s2.with_s2_cell(
        features_from_lineitem(spark, sf_dir).select("feature_id", "lon", "lat"),
        level=12, out="cell").select("feature_id", "cell")

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.pmod(F.col("c_custkey") * 7919, F.lit(360000))
          .cast("double") / 1000.0) - 180.0).alias("lon"),
        ((F.pmod(F.col("c_custkey") * 104729, F.lit(170000))
          .cast("double") / 1000.0) - 85.0).alias("lat"))
    regions = None
    for k, level in enumerate((2, 3, 4)):
        part = (s2.with_s2_cell(
            cust.filter(F.pmod(F.col("c_custkey"), F.lit(3)) == k),
            level=level, out="region_cell")
            .select("region_cell"))
        regions = part if regions is None else regions.unionByName(part)
    regions = regions.distinct()

    # covering levels are known (2-4): explode 3 ancestors, not 29
    return (s2.s2_covering_join_big(feats, regions,
                                    min_level=2, max_level=4)
            .groupBy("region_cell")
            .agg(F.count(F.lit(1)).alias("n_features")))


_S2_KNN_QUERIES = ((0, 10.0, 20.0), (1, -75.0, -40.0), (2, 150.0, 65.0))
_S2_KNN_LEVEL, _S2_KNN_RADIUS, _S2_KNN_K = 8, 2, 5


def q_s2_ring_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN by S2 ring expansion: each query's candidate set is the k-ring
    of its cell (py_s2_ring — BFS over cross-face neighbors, computed
    driver-side and broadcast as literals, the engine's small-side
    pattern), exact distance re-rank on top.  The corpus never shuffles:
    with_s2_cell (codegen unroll) + a broadcast array_contains join; only
    the tiny candidate subset rides the top-k window."""
    from .geo import s2

    feats = s2.with_s2_cell(
        features_from_lineitem(spark, sf_dir).select("feature_id", "lon", "lat"),
        level=_S2_KNN_LEVEL, out="cell")

    qrows = [
        (qid, qlon, qlat,
         s2.py_s2_ring(s2.py_s2_cell(qlon, qlat, _S2_KNN_LEVEL),
                       _S2_KNN_RADIUS))
        for qid, qlon, qlat in _S2_KNN_QUERIES
    ]
    qdf = spark.createDataFrame(
        qrows, "query_id int, q_lon double, q_lat double, ring array<long>")

    cand = feats.join(F.broadcast(qdf),
                      F.array_contains(F.col("ring"), F.col("cell")))
    # multiplication, not POWER(x, 2): libm pow need not equal x*x in the
    # last ulp, and the oracle multiplies
    dlon = F.col("lon") - F.col("q_lon")
    dlat = F.col("lat") - F.col("q_lat")
    d2 = dlon * dlon + dlat * dlat
    w = W.partitionBy("query_id").orderBy(F.col("d2").asc(),
                                          F.col("feature_id").asc())
    return (cand.withColumn("d2", F.round(d2, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _S2_KNN_K)
            .select("query_id", "rank", "feature_id", "d2"))


def sql_s2_ring_knn() -> str:
    from .geo import s2

    # carry lon/lat THROUGH the fold: re-joining s2cells on feature_id
    # would fan out on the corpus's genuine duplicate ids (seen at
    # sf0.01) — the Spark side never re-joins either
    cte = s2.s2_oracle_cte(
        f"SELECT feature_id AS pkey, lon, lat, {_S2_KNN_LEVEL} AS lvl "
        f"FROM features", carry=("lon", "lat"))
    arms = []
    for qid, qlon, qlat in _S2_KNN_QUERIES:
        ring = s2.py_s2_ring(
            s2.py_s2_cell(qlon, qlat, _S2_KNN_LEVEL), _S2_KNN_RADIUS)
        arms.append(
            f"SELECT {qid} AS query_id,"
            f" CAST({qlon!r} AS DOUBLE) AS q_lon,"
            f" CAST({qlat!r} AS DOUBLE) AS q_lat,"
            f" unnest(ARRAY[{', '.join(map(str, ring))}]) AS cell")
    return f"""WITH RECURSIVE {FEATURES_ORACLE_SQL}, {cte},
fc AS (SELECT pkey AS feature_id, lon, lat, cell FROM s2cells),
qr AS ({' UNION ALL '.join(arms)}),
cand AS (
  SELECT q.query_id, fc.feature_id,
         ROUND((fc.lon - q.q_lon) * (fc.lon - q.q_lon)
               + (fc.lat - q.q_lat) * (fc.lat - q.q_lat), 6) AS d2
  FROM fc JOIN qr q USING (cell)
)
SELECT query_id, rank, feature_id, d2 FROM (
  SELECT query_id, feature_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2, feature_id) AS rank
  FROM cand)
WHERE rank <= {_S2_KNN_K}"""


# -------------------------------------------------- span-sequence invariant
#
# BASELINE.json input_hint: "per-row invariant vs the reference:
# span-sequence equality (kind, text, media_ref, order)".  The gate builds
# the interleaved span table from `documents` with SQL-expressible
# arithmetic (same discipline as FEATURES_ORACLE_SQL), EXPLODES it to one
# row per span, scatters those rows through a hash exchange keyed on a
# span-local hash (adversarial: spans of one doc land on different
# partitions in arbitrary order), reassembles per doc, and emits a
# canonical per-doc signature over (kind, text, media_ref, offset) IN
# ORDER.  The oracle constructs the expected sequence directly — never
# exploded — so a hash match proves the shuffle preserved the sequence
# field-for-field.  Reference analogue: per-tile feature lists survive
# untouched through mapbox-filter's filterTile (src/Mapbox/Filters.hs).

_SPAN_KINDS = ("text", "geo", "text", "media", "geo", "text")


def interleaved_spans(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, spans) with SQL-expressible span arithmetic —
    the shared substrate of the span_integrity and caption_pairs gates
    (mirrored CTE: SPAN_FIELDS_SQL)."""
    n_spans = (F.lit(2) + F.pmod(F.col("doc_id"), F.lit(5))).cast("int")

    def mk_span(i):
        h = F.col("doc_id") * 31 + i * 7
        kind = F.element_at(
            F.array(*[F.lit(k) for k in _SPAN_KINDS]),
            (F.pmod(F.col("doc_id") + i, F.lit(len(_SPAN_KINDS))) + 1).cast("int"))
        start = (F.lit(1) + F.pmod(h, F.lit(30))).cast("int")
        # milli-degree INTEGER payload: exact cross-engine string rendering
        # (double formatting differs between Java and DuckDB)
        lon_m = F.pmod(h * 7919, F.lit(360000)) - 180000
        lat_m = F.pmod(h * 104729, F.lit(170000)) - 85000
        text = (
            F.when(kind == "geo",
                   F.concat_ws(",", lon_m.cast("string"), lat_m.cast("string")))
            .when(kind == "text", F.substring(F.col("text"), start, 12))
            .otherwise(F.lit(None).cast("string")))
        media_ref = F.when(
            kind == "media",
            F.concat(F.lit("media://blob/"), F.col("doc_id").cast("string"),
                     F.lit("-"), i.cast("string"), F.lit(".jpg")))
        return F.struct(kind.alias("kind"), text.alias("text"),
                        media_ref.alias("media_ref"),
                        i.cast("int").alias("offset"))

    return docs.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), n_spans - 1), mk_span).alias("spans"))


def q_span_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    interleaved = interleaved_spans(docs)

    # decode: one row per span; scatter through an exchange keyed on a
    # span-local hash so per-doc arrival order is arbitrary
    span_rows = (
        interleaved
        .select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .repartition(32, F.xxhash64("doc_id", "span_idx"))
    )

    # reassemble: groupBy shuffles the spans back; sort_array on the
    # offset-led struct restores the input order deterministically
    return (
        span_rows
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("span.offset").alias("offset"),
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref")))).alias("seq"))
        .select(
            "doc_id",
            F.size("seq").alias("n_spans"),
            F.concat_ws("|", F.transform(
                F.col("seq"),
                lambda s: F.concat_ws(
                    ":", s["offset"].cast("string"), s["kind"],
                    F.coalesce(s["text"], F.lit("~")),
                    F.coalesce(s["media_ref"], F.lit("~"))))).alias("span_sig"))
    )


def span_fields_sql() -> str:
    """The spans+fields CTE body mirroring :func:`interleaved_spans`."""
    kind_case = " ".join(
        f"WHEN {i} THEN '{k}'" for i, k in enumerate(_SPAN_KINDS))
    return f"""spans AS (
  SELECT d.doc_id, s.i,
         CASE (d.doc_id + s.i) % {len(_SPAN_KINDS)} {kind_case} END AS kind,
         d.text AS doc_text,
         (d.doc_id * 31 + s.i * 7) AS h
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS i) s
  WHERE s.i < 2 + d.doc_id % 5
), fields AS (
  SELECT doc_id, i, kind,
         CASE kind
           WHEN 'geo' THEN
             CAST((h * 7919) % 360000 - 180000 AS VARCHAR)
             || ',' ||
             CAST((h * 104729) % 170000 - 85000 AS VARCHAR)
           WHEN 'text' THEN substring(doc_text, CAST(1 + h % 30 AS INT), 12)
         END AS text,
         CASE kind WHEN 'media' THEN
           'media://blob/' || CAST(doc_id AS VARCHAR) || '-'
           || CAST(i AS VARCHAR) || '.jpg'
         END AS media_ref
  FROM spans
)"""


def sql_span_integrity() -> str:
    return f"""
WITH {span_fields_sql()}
SELECT doc_id,
       COUNT(*) AS n_spans,
       string_agg(
         CAST(i AS VARCHAR) || ':' || kind || ':'
         || COALESCE(text, '~') || ':' || COALESCE(media_ref, '~'),
         '|' ORDER BY i) AS span_sig
FROM fields
GROUP BY doc_id"""


_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8   # 64-dim → 8 subspaces × 16 codewords
_PQ_SCALE = 50.0                   # integer codewords in the ±450 range
_PQ_QMOD = 49                      # vec_id % 49 == 0 → 11 queries at sf0.01
_PQ_TOPK = 10


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py), fully oracle-checked:
    vectors integer-quantized (×1000, like the IVF gates) and the
    codeword lattice integer-scaled, so subspace argmin encoding and
    asymmetric (ADC) distances are exact-integer doubles — the oracle
    recomputes codes and distances with order-free integer SUMs and must
    match rank-for-rank, bit-for-bit.  The corpus side carries only the
    8-byte code array (32× smaller than the float vectors — the 100 TB
    scan body); queries broadcast."""
    from .operators.pq import pq_codebook, pq_topk, write_pq_codes

    cb = pq_codebook(_PQ_M, _PQ_K, _PQ_SUB, scale=_PQ_SCALE)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("v"))
    codes = write_pq_codes(emb, "v", cb)
    queries = (emb.filter(F.col("vec_id") % _PQ_QMOD == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qvec")))
    out = pq_topk(codes, queries, cb, k=_PQ_TOPK)
    return out.withColumn("adc_dist", F.col("adc_dist").cast("long"))


def sql_pq_adc_topk() -> str:
    scale = int(_PQ_SCALE)
    return f"""
WITH cb AS (
  SELECT t1.m, t2.k, t3.d,
         CAST((t1.m*131 + t2.k*31 + t3.d*17) % 19 - 9 AS BIGINT) * {scale} AS c
  FROM range({_PQ_M}) t1(m), range({_PQ_K}) t2(k), range({_PQ_SUB}) t3(d)
),
vecs AS (
  SELECT vec_id, CAST(t.d AS BIGINT) AS d,
         CAST(ROUND(CAST(embedding[t.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS v
  FROM embeddings, range({_PQ_M * _PQ_SUB}) t(d)
),
dists AS (
  SELECT v.vec_id, cb.m, cb.k,
         CAST(SUM((v.v - cb.c) * (v.v - cb.c)) AS BIGINT) AS dist
  FROM vecs v JOIN cb ON cb.m = v.d // {_PQ_SUB} AND cb.d = v.d % {_PQ_SUB}
  GROUP BY v.vec_id, cb.m, cb.k
),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS rn
    FROM dists) WHERE rn = 1
),
lut AS (
  SELECT d.vec_id AS query_id, d.m, d.k, d.dist AS ld
  FROM dists d WHERE d.vec_id % {_PQ_QMOD} = 0
),
adc AS (
  SELECT l.query_id, c.vec_id, CAST(SUM(l.ld) AS BIGINT) AS adc_dist
  FROM codes c JOIN lut l ON l.m = c.m AND l.k = c.code
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT query_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= {_PQ_TOPK}"""


_PQ_SHORTLIST = 40


def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ shortlist → exact rerank (operators/pq.py pq_rerank_topk):
    the deploy pattern end-to-end — ADC over codes retrieves 40
    candidates per query, ONLY those ids fetch float vectors (broadcast
    semi-join), exact L2 reranks to top-10.  Quantized ints keep every
    distance exact; full value-hash."""
    from .operators.pq import pq_codebook, pq_rerank_topk, write_pq_codes

    cb = pq_codebook(_PQ_M, _PQ_K, _PQ_SUB, scale=_PQ_SCALE)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("v"))
    codes = write_pq_codes(emb, "v", cb)
    queries = (emb.filter(F.col("vec_id") % _PQ_QMOD == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qvec")))
    out = pq_rerank_topk(codes, queries, emb, cb, k=_PQ_TOPK,
                         shortlist=_PQ_SHORTLIST, vec_col="v")
    return out.withColumn("d2", F.col("d2").cast("long"))


def sql_pq_rerank_topk() -> str:
    d2 = ("list_aggregate(list_transform(list_zip(QV, CV), "
          "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')")
    adc = sql_pq_adc_topk().replace(f"rank <= {_PQ_TOPK}",
                                    f"rank <= {_PQ_SHORTLIST}")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> ROUND(x * 1000)) AS v
  FROM embeddings
),
short AS (SELECT query_id, vec_id FROM ({adc})),
scored AS (
  SELECT s.query_id, s.vec_id,
         CAST({d2.replace("QV", "q.v").replace("CV", "c.v")} AS BIGINT) AS d2
  FROM short s
  JOIN emb q ON q.vec_id = s.query_id
  JOIN emb c ON c.vec_id = s.vec_id
)
SELECT query_id, rank, vec_id, d2 FROM (
  SELECT query_id, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2, vec_id) AS rank
  FROM scored) WHERE rank <= {_PQ_TOPK}"""


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (operators/pq.py ivfpq_topk): coarse inverted lists with
    residual product quantization, fully oracle-checked — quantized
    vectors and integer codebooks make assignment, residual encoding,
    probing, and ADC ranking all exact-integer arithmetic on both
    engines."""
    from .operators.pq import ivfpq_topk, pq_codebook

    cb = pq_codebook(_PQ_M, _PQ_K, _PQ_SUB, scale=_PQ_SCALE)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000)).alias("embedding"))
    centroids = emb.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_vec"))
    queries = (emb.filter(F.col("vec_id") % _PQ_QMOD == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = ivfpq_topk(queries, emb, centroids, cb, k=_PQ_TOPK, nprobe=3)
    return out.withColumn("adc_dist", F.col("adc_dist").cast("long"))


def sql_ivfpq_topk(nprobe: int = 3) -> str:
    scale = int(_PQ_SCALE)
    dim = _PQ_M * _PQ_SUB
    d2 = ("list_aggregate(list_transform(list_zip(QV, CV), "
          "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> ROUND(x * 1000)) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id % 25 = 0),
cb AS (
  SELECT t1.m, t2.k, t3.d,
         CAST((t1.m*131 + t2.k*31 + t3.d*17) % 19 - 9 AS BIGINT) * {scale} AS c
  FROM range({_PQ_M}) t1(m), range({_PQ_K}) t2(k), range({_PQ_SUB}) t3(d)
),
assign AS (
  SELECT vec_id, cent_id, cv FROM (
    SELECT e.vec_id, c.cent_id, c.cv,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {d2.replace("QV", "e.v").replace("CV", "c.cv")},
                      c.cent_id) AS r
    FROM emb e CROSS JOIN cent c) WHERE r = 1
),
res AS (
  SELECT a.vec_id, a.cent_id, CAST(t.d AS BIGINT) AS d,
         CAST(e.v[t.d + 1] AS BIGINT) - CAST(a.cv[t.d + 1] AS BIGINT) AS r
  FROM assign a JOIN emb e USING (vec_id), range({dim}) t(d)
),
cdists AS (
  SELECT r.vec_id, cb.m, cb.k,
         CAST(SUM((r.r - cb.c) * (r.r - cb.c)) AS BIGINT) AS dist
  FROM res r JOIN cb ON cb.m = r.d // {_PQ_SUB} AND cb.d = r.d % {_PQ_SUB}
  GROUP BY r.vec_id, cb.m, cb.k
),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS rn
    FROM cdists) WHERE rn = 1
),
probes AS (
  SELECT q_id, cent_id, cv FROM (
    SELECT e.vec_id AS q_id, c.cent_id, c.cv,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {d2.replace("QV", "e.v").replace("CV", "c.cv")},
                      c.cent_id) AS r
    FROM emb e CROSS JOIN cent c WHERE e.vec_id % {_PQ_QMOD} = 0)
  WHERE r <= {nprobe}
),
qres AS (
  SELECT p.q_id, p.cent_id, CAST(t.d AS BIGINT) AS d,
         CAST(e.v[t.d + 1] AS BIGINT) - CAST(p.cv[t.d + 1] AS BIGINT) AS r
  FROM probes p JOIN emb e ON e.vec_id = p.q_id, range({dim}) t(d)
),
lut AS (
  SELECT q.q_id, q.cent_id, cb.m, cb.k,
         CAST(SUM((q.r - cb.c) * (q.r - cb.c)) AS BIGINT) AS ld
  FROM qres q JOIN cb ON cb.m = q.d // {_PQ_SUB} AND cb.d = q.d % {_PQ_SUB}
  GROUP BY q.q_id, q.cent_id, cb.m, cb.k
),
adc AS (
  SELECT l.q_id, a.vec_id, CAST(SUM(l.ld) AS BIGINT) AS adc_dist
  FROM assign a
  JOIN codes co ON co.vec_id = a.vec_id
  JOIN lut l ON l.cent_id = a.cent_id AND l.m = co.m AND l.k = co.code
  GROUP BY l.q_id, a.vec_id
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT q_id AS query_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY adc_dist, vec_id) AS rank
  FROM adc) WHERE rank <= {_PQ_TOPK}"""


# ---------------------------------------- TPC-H-shaped relational breadth
#
# Exact-integer revenue: price_c = floor(extendedprice·100 + 0.5) cents
# (non-negative), disc_p = floor(discount·100 + 0.5) ∈ 0..10, so
# revenue_u = price_c · (100 − disc_p) is an EXACT long in 10⁻⁴-dollar
# units — no lossy ROUND anywhere, value-hash-stable cross-engine.

_Q3_SEG = "BUILDING"
_Q3_DATE = "1998-06-01"
_Q3_K = 10
_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1997-01-01", "1998-01-01"
_Q17_BRAND_MOD = 7     # p_partkey % 7 == 0 stands in for the brand filter


def _price_c():
    """Extended price in cents — queries_curation._cents applied to the
    lineitem column (one spelling of the floor(x+0.5) rule)."""
    from .queries_curation import _cents
    return _cents("l_extendedprice")


def _rev_u():
    disc_p = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return _price_c() * (100 - disc_p)


_SQL_REV_U = ("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
              " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))")


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped-revenue top-10
    orders for one market segment — big⋈big sort-merge (lineitem ⋈
    orders, both selectively filtered BEFORE the join so the shuffles
    carry only qualifying rows) + a broadcast customer dim, then a
    deterministic global top-k (TakeOrdered: revenue DESC, orderkey ASC
    tiebreak).  Revenue is the exact-integer revenue_u."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .filter(F.col("l_shipdate") > F.lit(_Q3_DATE)) \
        .select("l_orderkey", _rev_u().alias("rev_u"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderdate") < F.lit(_Q3_DATE)) \
        .select("o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .filter(F.col("c_mktsegment") == _Q3_SEG).select("c_custkey")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    agg = j.groupBy(
        "l_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("order_us"),
        "o_orderpriority").agg(F.sum("rev_u").alias("revenue_u"))
    # global top-k as sort+limit -> TakeOrderedAndProject (per-partition
    # heaps, no single-partition window); deterministic tiebreak
    return (agg.orderBy(F.col("revenue_u").desc(), F.col("l_orderkey"))
            .limit(_Q3_K)
            .select("l_orderkey", "order_us", "o_orderpriority",
                    "revenue_u"))


def sql_top_orders() -> str:
    return f"""WITH j AS (
  SELECT l.l_orderkey,
         epoch_us(o.o_orderdate) AS order_us,
         o.o_orderpriority,
         CAST(SUM({_SQL_REV_U}) AS BIGINT) AS revenue_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
    AND c.c_mktsegment = '{_Q3_SEG}'
  GROUP BY 1, 2, 3)
SELECT l_orderkey, order_us, o_orderpriority, revenue_u FROM j
QUALIFY ROW_NUMBER() OVER (ORDER BY revenue_u DESC, l_orderkey)
        <= {_Q3_K}"""


def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the CYCLIC join graph —
    customer ⋈ orders ⋈ lineitem ⋈ supplier with the extra
    c_nationkey = s_nationkey equality closing the cycle, nation ⋈
    region as broadcast dims.  One year of orders, one region, exact
    revenue_u per nation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_suppkey", _rev_u().alias("rev_u"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter((F.col("o_orderdate") >= F.lit(_Q5_LO))
                & (F.col("o_orderdate") < F.lit(_Q5_HI))) \
        .select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet") \
        .select("s_suppkey", "s_nationkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet") \
        .filter(F.col("r_name") == _Q5_REGION)
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
               & (c.c_nationkey == s.s_nationkey))
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rev_u").alias("revenue_u"))


def sql_regional_volume() -> str:
    return f"""SELECT n.n_name,
       COUNT(*) AS n_items,
       CAST(SUM({_SQL_REV_U}) AS BIGINT) AS revenue_u
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q5_LO} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{_Q5_HI} 00:00:00'
  AND r.r_name = '{_Q5_REGION}'
GROUP BY 1"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    quantity is below 20% of their part's average — the correlated
    aggregate rewritten as groupBy + self-join, with the threshold as
    the EXACT cross-multiplied integer test ``5·qty·n < sum_qty``
    (l_quantity is integer-valued; no float average exists anywhere).
    Part filter is a broadcast semi-join (p_partkey % 7, the brand
    stand-in).  Output: one row of exact counts/cents."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _price_c().alias("price_c"))
    parts = spark.read.parquet(f"{sf_dir}/part.parquet") \
        .filter(F.pmod(F.col("p_partkey"), F.lit(_Q17_BRAND_MOD)) == 0) \
        .select(F.col("p_partkey").alias("l_partkey"))
    tot = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part"),
        F.sum("qty").alias("sum_qty"))
    j = (li.join(F.broadcast(parts), "l_partkey")
         .join(tot, "l_partkey")
         .filter(F.lit(5) * F.col("qty") * F.col("n_part")
                 < F.col("sum_qty")))
    return j.agg(F.count(F.lit(1)).alias("n_small"),
                 F.sum("price_c").alias("sum_cents"))


def sql_small_qty_revenue() -> str:
    return f"""WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM lineitem),
tot AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part,
         CAST(SUM(qty) AS BIGINT) AS sum_qty
  FROM li GROUP BY 1)
SELECT COUNT(*) AS n_small,
       CAST(SUM(li.price_c) AS BIGINT) AS sum_cents
FROM li
JOIN part p ON p.p_partkey = li.l_partkey
           AND p.p_partkey % {_Q17_BRAND_MOD} = 0
JOIN tot ON tot.l_partkey = li.l_partkey
WHERE 5 * li.qty * tot.n_part < tot.sum_qty"""


_Q4_LO, _Q4_HI = "1996-01-01", "1996-04-01"
_Q4_LATE_DAYS = 60


def q_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): per-priority counts of
    one quarter's orders that have ≥ 1 lineitem shipped ≥ 60 days after
    the order date — the EXISTS correlated subquery expressed as a
    LEFT-SEMI join (plan-asserted LeftSemi in tests/test_relational.py),
    so each qualifying order counts ONCE no matter how many late lines
    it has.  The semi-join's non-equi residual (shipdate vs orderdate +
    60d) rides on the orderkey equi-join; only the (filtered) quarter of
    orders shuffles.  Exact counts."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter((F.col("o_orderdate") >= F.lit(_Q4_LO))
                & (F.col("o_orderdate") < F.lit(_Q4_HI))) \
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_shipdate")
    late = (F.col("l_shipdate")
            >= F.col("o_orderdate")
            + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS"))
    sj = o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
    return sj.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"))


def sql_late_orders() -> str:
    return f"""SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{_Q4_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= o.o_orderdate
                    + INTERVAL {_Q4_LATE_DAYS} DAY)
GROUP BY 1"""


_Q13_EXCL = "1-URGENT"


def q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    customer ← (orders minus one excluded priority class), count orders
    per customer INCLUDING the zero-order customers the outer join
    preserves, then the distribution — how many customers placed
    exactly k orders.  Two exact groupBys; the second one's input is
    one row per customer, so the re-shuffle is tiny.  The orders-side
    filter runs BEFORE the join (pushdown-friendly: only surviving
    orders shuffle)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderpriority") != _Q13_EXCL) \
        .select("o_custkey", "o_orderkey")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist"))


def sql_custdist() -> str:
    return f"""WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '{_Q13_EXCL}'
  GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY 1"""


_Q22_DORMANT_SINCE = "2000-01-01"


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): customers whose
    balance beats the positive-balance average AND who placed no order
    since the dormancy cutoff — the scalar AVG subquery as an exact
    cross-multiplied integer test (bal_c · n_pos > sum_pos_c, all cents
    — no float average exists anywhere), the NOT EXISTS as a LEFT-ANTI
    join (plan-asserted LeftAnti).  The scalar (n_pos, sum_pos_c) pair
    is a 1-row broadcast; the orders side is date-filtered BEFORE the
    anti-join and ships only its custkey column.  Per-nation exact
    counts + balance cents."""
    from .queries_curation import _cents
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select("c_custkey", "c_nationkey",
                _cents("c_acctbal").alias("bal_c"))
    pos = c.filter(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("bal_c").alias("sum_pos_c"))
    rich = (c.crossJoin(F.broadcast(pos))
            .filter(F.col("bal_c") * F.col("n_pos")
                    > F.col("sum_pos_c"))
            .select("c_custkey", "c_nationkey", "bal_c"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderdate") >= F.lit(_Q22_DORMANT_SINCE)) \
        .select(F.col("o_custkey").alias("c_custkey"))
    idle = rich.join(o, "c_custkey", "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("bal_c").alias("sum_bal_c"))


def sql_idle_customers() -> str:
    return f"""WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer),
pos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
         CAST(SUM(bal_c) AS BIGINT) AS sum_pos_c
  FROM c WHERE bal_c > 0)
SELECT c.c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(c.bal_c) AS BIGINT) AS sum_bal_c
FROM c, pos
WHERE c.bal_c * pos.n_pos > pos.sum_pos_c
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >=
                        TIMESTAMP '{_Q22_DORMANT_SINCE} 00:00:00')
GROUP BY 1"""


def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` column (get_json_object — JVM-side JSONPath, no
    UDF) and aggregate it per event type.  Exact longs; NULL-safe (rows
    whose props lack k count in n but not n_k)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("k").alias("n_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.count_distinct(F.col("k")).alias("n_distinct_k")))


def sql_props_json() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM e GROUP BY 1"""


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: weekday x event-type count crosstab via the
    DataFrame pivot API (explicit value list — deterministic columns,
    no value-discovery pass), empty cells coalesced to 0 to match the
    oracle's conditional counts.  Exact integers."""
    from .geo.tilemath import floor_div

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).alias("wday"),
        "event_type")
    wide = (ev.groupBy("wday")
            .pivot("event_type", _PIVOT_TYPES)
            .agg(F.count(F.lit(1))))
    return wide.select(
        "wday", *[F.coalesce(F.col(t), F.lit(0)).alias(t)
                  for t in _PIVOT_TYPES])


def sql_pivot_counts() -> str:
    cells = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS {t}" for t in _PIVOT_TYPES)
    return f"""SELECT ((epoch_us(ts) // 86400000000 + 4) % 7) AS wday,
       {cells}
FROM events GROUP BY 1"""


def q_span_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave normalization (operators/media.py span_coalesce):
    adjacent text spans merge into one (offset-ordered, space-joined),
    media/geo spans pass through with the sequence invariant intact,
    offsets renumber densely — gaps-and-islands on the doc key, single
    exchange.  The pre-tokenization cleanup for the BASELINE
    input_hint's interleaved span documents."""
    from .operators.media import span_coalesce

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return span_coalesce(interleaved_spans(docs))


def sql_span_coalesce() -> str:
    return f"""WITH {span_fields_sql()},
flagged AS (
  SELECT doc_id, i, kind, text, media_ref,
         CASE WHEN kind = 'text' AND lag(kind) OVER w = 'text'
              THEN 0 ELSE 1 END AS brk
  FROM fields
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
grouped AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged),
agg AS (
  SELECT doc_id, grp,
         MIN(kind) AS kind,
         MIN(i) AS o0,
         CAST(COUNT(*) AS BIGINT) AS n_merged,
         MIN(media_ref) AS media_ref,
         COALESCE(string_agg(text, ' ' ORDER BY i)
                  FILTER (WHERE text IS NOT NULL), '') AS txt,
         arg_min(text, i) AS t1
  FROM grouped GROUP BY 1, 2)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY o0) - 1
            AS INT) AS new_offset,
       kind,
       CASE WHEN kind = 'text'
            THEN CASE WHEN txt <> '' THEN txt END
            ELSE t1 END AS text,
       media_ref, n_merged
FROM agg"""



def q_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave run-length profile (operators/media.py span_runs):
    gaps-and-islands over the in-row span order — how bursty is each
    span kind in the interleaved corpus."""
    from .operators.media import span_runs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return span_runs(interleaved_spans(docs))


def sql_span_runs() -> str:
    return f"""WITH {span_fields_sql()},
flagged AS (
  SELECT doc_id, i, kind,
         CASE WHEN lag(kind) OVER w = kind THEN 0 ELSE 1 END AS brk
  FROM fields
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
grouped AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged),
per_run AS (
  SELECT doc_id, grp, MIN(kind) AS kind,
         CAST(COUNT(*) AS BIGINT) AS run_len
  FROM grouped GROUP BY 1, 2)
SELECT kind, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs,
       COUNT(DISTINCT doc_id) AS n_docs
FROM per_run GROUP BY 1, 2"""


EXT_QUERIES = {
    "dedup_exact": (q_dedup_exact, sql_dedup_exact),
    "dedup_ngram_jaccard": (q_ngram_jaccard, sql_ngram_jaccard),
    "dedup_minhash_lsh": (q_minhash_lsh, sql_minhash_lsh),
    "dedup_simhash": (q_simhash, sql_simhash),
    "lang_id": (q_lang_id, sql_lang_id),
    "token_quality": (q_token_quality, sql_token_quality),
    "doc_fingerprint": (q_fingerprint, sql_fingerprint),
    "repetition_profile": (q_repetition_profile, sql_repetition_profile),
    "pii_scrub": (q_pii_scrub, sql_pii_scrub),
    "curation_pipeline": (q_curation_pipeline, sql_curation_pipeline),
    "cosine_topk": (q_cosine_topk, sql_cosine_topk),
    "embedding_near_dup": (q_embedding_near_dup, sql_embedding_near_dup),
    "ivf_topk": (q_ivf_topk, sql_ivf_topk),
    "ivf_topk_arrow": (q_ivf_topk_arrow, sql_ivf_topk),
    "pq_adc_topk": (q_pq_adc_topk, sql_pq_adc_topk),
    "ivfpq_topk": (q_ivfpq_topk, sql_ivfpq_topk),
    "pq_rerank_topk": (q_pq_rerank_topk, sql_pq_rerank_topk),
    "ann_lsh_topk": (q_ann_topk, sql_ann_topk),
    "ann_lsh_topk_arrow": (q_ann_topk_arrow, sql_ann_topk),
    "knn_ring": (q_knn_ring, sql_knn_ring),
    "pip_join": (q_pip_join, sql_pip_join),
    "raster_join": (q_raster_join, sql_raster_join),
    "downcopy": (q_downcopy, sql_downcopy),
    "downcopy_passthrough": (q_downcopy_passthrough, sql_downcopy_passthrough),
    "downcopy_geom": (q_downcopy_geom, sql_downcopy_geom),
    "mvt_roundtrip": (q_mvt_roundtrip, sql_mvt_roundtrip),
    "agg_pricing": (q_agg_pricing, sql_agg_pricing),
    "topk_events": (q_topk_events, sql_topk_events),
    "join_chain": (q_join_chain, sql_join_chain),
    "top_orders": (q_top_orders, sql_top_orders),
    "span_coalesce": (q_span_coalesce, sql_span_coalesce),
    "span_runs": (q_span_runs, sql_span_runs),
    "pivot_counts": (q_pivot_counts, sql_pivot_counts),
    "props_json": (q_props_json, sql_props_json),
    "regional_volume": (q_regional_volume, sql_regional_volume),
    "small_qty_revenue": (q_small_qty_revenue, sql_small_qty_revenue),
    "late_orders": (q_late_orders, sql_late_orders),
    "custdist": (q_custdist, sql_custdist),
    "idle_customers": (q_idle_customers, sql_idle_customers),
    "media_kind": (q_media_kind, sql_media_kind),
    "tile_set_ops": (q_tile_set_ops, sql_tile_set_ops),
    "manifest_rollup": (q_manifest_rollup, sql_manifest_rollup),
    "serve_tile": (q_serve_tile, sql_serve_tile),
    "span_integrity": (q_span_integrity, sql_span_integrity),
    "s2_assign": (q_s2_assign, sql_s2_assign),
    "s2_cover_join": (q_s2_cover_join, sql_s2_cover_join),
    "s2_cover_join_big": (q_s2_cover_join_big, sql_s2_cover_join),
    "s2_ring_knn": (q_s2_ring_knn, sql_s2_ring_knn),
}


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized int8 retrieval (operators/similarity.py
    sq8_topk): data-dependent per-dim codebook from corpus extrema,
    half-up 8-bit codes, exact INTEGER dot ranking — zero float
    rounding in the output row."""
    from .operators.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sq8_topk(queries, emb, k=5)


def sql_sq8_topk(k: int = 5) -> str:
    code = ("list_transform(list_zip(V, l.lo, l.hi), "
            "p -> greatest(0, least(255, "
            "CASE WHEN p[3] > p[2] THEN "
            "CAST(floor((p[1]-p[2])/(p[3]-p[2])*255.0 + 0.5) AS BIGINT) "
            "ELSE 0 END)))")
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
dims AS (
  SELECT i AS dim, MIN(v[i]) AS lo, MAX(v[i]) AS hi
  FROM emb, LATERAL (SELECT UNNEST(range(1, len(v) + 1)) AS i)
  GROUP BY 1),
book AS (SELECT list(lo ORDER BY dim) AS lo, list(hi ORDER BY dim) AS hi
         FROM dims),
cc AS (SELECT e.vec_id AS c_id,
              {code.replace("V", "e.v")} AS c_code
       FROM emb e CROSS JOIN book l),
qc AS (SELECT e.vec_id AS q_id,
              {code.replace("V", "e.v")} AS q_code
       FROM emb e CROSS JOIN book l WHERE e.vec_id < 10),
sc AS (
  SELECT q.q_id, c.c_id,
         CAST(list_aggregate(list_transform(list_zip(q.q_code, c.c_code),
              p -> p[1]*p[2]), 'sum') AS BIGINT) AS dot
  FROM qc q CROSS JOIN cc c)
SELECT query_id, rank, vec_id, dot FROM (
  SELECT q_id AS query_id, c_id AS vec_id, dot,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dot DESC, c_id) AS rank
  FROM sc) WHERE rank <= {k}"""


EXT_QUERIES["sq8_topk"] = (q_sq8_topk, sql_sq8_topk)


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled corpus lang vs the n-gram
    heuristic's prediction (operators/text.py lang_id) — the
    quality-control composition over the labeled documents table
    (languages outside the marker set, e.g. zh, land in 'und'/'en'
    cells and expose the detector's blind spots)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select("lang",
                        text.lang_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang", "lang_pred")
            .agg(F.count(F.lit(1)).alias("n")))


def _sql_lang_pred() -> str:
    """scored+pred CTE text: corpus label + lang_id prediction per doc
    (shared by the lang_confusion and cohen_kappa oracles)."""
    scores = ",\n         ".join(
        f"LEN(list_filter({_WORDS_SQL}, x -> list_contains({arr}, x)))"
        f" AS s_{l}"
        for l, arr in _STOP_SQL.items()
    )
    return f"""scored AS (
  SELECT lang,
         {scores}
  FROM documents
),
pred AS (
  SELECT lang,
       CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) < 1 THEN 'und'
            WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = GREATEST(s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = GREATEST(s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
  FROM scored)"""


def sql_lang_confusion() -> str:
    return f"""
WITH {_sql_lang_pred()}
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2"""


EXT_QUERIES["lang_confusion"] = (q_lang_confusion, sql_lang_confusion)


_CTXW = 2


def q_span_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal context-window mining (operators/media.py
    media_context_windows): per media span, the ±2-offset text-span
    context — in-row HOFs only, zero shuffles."""
    from .operators.media import media_context_windows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_context_windows(interleaved_spans(docs),
                                 window=_CTXW)


def sql_span_windows() -> str:
    return f"""WITH {span_fields_sql()},
media AS (
  SELECT doc_id, i AS m_off, media_ref FROM fields
  WHERE kind = 'media'),
ctx AS (
  SELECT m.doc_id, m.m_off, m.media_ref,
         string_agg(t.text, ' ' ORDER BY t.i) AS context_text,
         CAST(COUNT(t.i) AS BIGINT) AS n_ctx
  FROM media m
  LEFT JOIN fields t
    ON t.doc_id = m.doc_id AND t.kind = 'text'
   AND t.text IS NOT NULL AND abs(t.i - m.m_off) <= {_CTXW}
  GROUP BY 1, 2, 3)
SELECT doc_id, media_ref, m_off AS "offset", context_text, n_ctx
FROM ctx"""


EXT_QUERIES["span_windows"] = (q_span_windows, sql_span_windows)


def q_interleave_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interleaving profile (operators/media.py
    interleave_profile): modality counts, alternation count, text
    payload — the corpus-composition report for mixing schedules."""
    from .operators.media import interleave_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return interleave_profile(interleaved_spans(docs))


def sql_interleave_profile() -> str:
    return f"""WITH {span_fields_sql()},
base_counts AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_text,
         CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_media,
         CAST(SUM(CASE WHEN kind = 'geo' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_geo,
         CAST(SUM(CASE WHEN kind = 'text'
                       THEN COALESCE(length(text), 0) ELSE 0 END)
              AS BIGINT) AS text_chars
  FROM fields GROUP BY 1),
sw AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN a.kind <> b.kind THEN 1 ELSE 0 END)
              AS BIGINT) AS n_switches
  FROM fields a JOIN fields b
    ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1)
SELECT c.doc_id, c.n_spans, c.n_text, c.n_media, c.n_geo,
       COALESCE(sw.n_switches, CAST(0 AS BIGINT)) AS n_switches,
       c.text_chars
FROM base_counts c LEFT JOIN sw ON c.doc_id = sw.doc_id"""


EXT_QUERIES["interleave_profile"] = (q_interleave_profile,
                                     sql_interleave_profile)


def _charspan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, spans array<struct<start,end>>): the
    deterministic overlapping char-range annotation set the
    span_schedule gate resolves (mirrored CTE in sql_span_schedule)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (F.lit(3) + F.pmod(F.col("doc_id"), F.lit(6))).cast("int")

    def mk(i):
        h = F.col("doc_id") * 31 + i * 7
        s = F.pmod(h * 7919, F.lit(240))
        ln = F.lit(3) + F.pmod(h * 104729, F.lit(60))
        return F.struct(s.cast("int").alias("start"),
                        (s + ln).cast("int").alias("end"))

    return docs.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), n - 1), mk).alias("spans"))


def q_span_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-annotation conflict resolution (operators/media.py
    span_schedule): per document the maximum non-overlapping set of
    char-range spans, greedy earliest-end (provably optimal), picked
    by ONE in-row array_sort + F.aggregate fold — zero shuffles; the
    oracle replays the greedy as a recursive CTE."""
    from .operators.media import span_schedule

    return span_schedule(_charspan_docs(spark, sf_dir))


def sql_span_schedule() -> str:
    return """WITH RECURSIVE iv AS (
  SELECT d.doc_id, s.i,
         CAST(((d.doc_id * 31 + s.i * 7) * 7919) % 240 AS BIGINT) AS s,
         CAST(((d.doc_id * 31 + s.i * 7) * 7919) % 240
              + 3 + ((d.doc_id * 31 + s.i * 7) * 104729) % 60
              AS BIGINT) AS e
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS i) s
  WHERE s.i < 3 + d.doc_id % 6),
sel AS (
  SELECT doc_id, s, e, 1 AS rnk
  FROM (SELECT doc_id, i, s, e,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY e, s, i) rn
        FROM iv WHERE e > s) WHERE rn = 1
  UNION ALL
  SELECT doc_id, s, e, rnk + 1 FROM (
    SELECT iv.doc_id, iv.s, iv.e, sel.rnk,
           ROW_NUMBER() OVER (PARTITION BY iv.doc_id
                              ORDER BY iv.e, iv.s, iv.i) rn
    FROM sel JOIN iv ON iv.doc_id = sel.doc_id AND iv.s >= sel.e)
  WHERE rn = 1)
SELECT doc_id, CAST(rnk AS INT) AS rank, s AS start, e AS "end"
FROM sel"""


EXT_QUERIES["span_schedule"] = (q_span_schedule, sql_span_schedule)


def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the corpus lang label and the n-gram
    heuristic's prediction (operators/stats.py cohen_kappa) — the
    chance-corrected one-number summary of lang_confusion, as the
    exact rational (N·A − Σrow·col) / (N² − Σrow·col)."""
    from .operators.stats import cohen_kappa

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.select(
        "lang", text.lang_id(F.col("text")).alias("lang_pred"))
    return cohen_kappa(labeled, "lang", "lang_pred")


def sql_cohen_kappa() -> str:
    return f"""WITH {_sql_lang_pred()},
conf AS (SELECT lang AS a, lang_pred AS b, COUNT(*) AS n
         FROM pred GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
                 AS n_agree
        FROM conf),
rmarg AS (SELECT a AS l, SUM(n) AS r FROM conf GROUP BY 1),
cmarg AS (SELECT b AS l, SUM(n) AS c FROM conf GROUP BY 1),
ch AS (SELECT CAST(SUM(COALESCE(r, 0) * COALESCE(c, 0)) AS BIGINT)
         AS chance_num
       FROM rmarg FULL JOIN cmarg USING (l))
SELECT n_total, n_agree, chance_num,
       CAST(n_total * n_agree - chance_num AS BIGINT) AS kappa_num,
       CAST(n_total * n_total - chance_num AS BIGINT) AS kappa_den,
       CASE WHEN n_total * n_total - chance_num > 0 THEN
         CAST(n_total * n_agree - chance_num AS DOUBLE)
         / CAST(n_total * n_total - chance_num AS DOUBLE)
       END AS kappa
FROM tot, ch"""


EXT_QUERIES["cohen_kappa"] = (q_cohen_kappa, sql_cohen_kappa)


def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W concordance across sources ranking languages by
    document count (operators/rankstats.py kendalls_w): do the 20
    corpus shards agree on the language ordering?  Average ranks
    carried ×2, ties corrected by ΣT = Σ(t³−t) — the whole statistic
    an exact integer rational."""
    from .operators.rankstats import kendalls_w

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cnt = (docs.groupBy("source", "lang")
           .agg(F.count(F.lit(1)).alias("n_docs")))
    return kendalls_w(cnt, "source", "lang", "n_docs")


def sql_kendalls_w() -> str:
    return """WITH cnt AS (
  SELECT source, lang, COUNT(*) AS v FROM documents GROUP BY 1, 2),
raters AS (SELECT DISTINCT source FROM documents),
items AS (SELECT DISTINCT lang FROM documents),
grid AS (
  SELECT r.source, i.lang, COALESCE(c.v, 0) AS v
  FROM raters r CROSS JOIN items i
  LEFT JOIN cnt c ON c.source = r.source AND c.lang = i.lang),
rk AS (
  SELECT source, lang, v,
         RANK() OVER (PARTITION BY source ORDER BY v ASC) AS rmin,
         COUNT(*) OVER (PARTITION BY source, v) AS t
  FROM grid),
s2 AS (SELECT lang, CAST(SUM(2 * rmin + (t - 1)) AS BIGINT) AS s2
       FROM rk GROUP BY 1),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_raters FROM raters),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM items),
s4 AS (SELECT CAST(SUM((s2 - m_raters * (n_items + 1))
                       * (s2 - m_raters * (n_items + 1))) AS BIGINT)
         AS s4
       FROM s2, mm, nn),
tie AS (SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT)
          AS tie_term
        FROM (SELECT source, v, COUNT(*) AS t
              FROM grid GROUP BY 1, 2))
SELECT m_raters, n_items, s4, tie_term,
       CAST(3 * s4 AS BIGINT) AS w_num,
       CAST(m_raters * m_raters
            * (n_items * n_items * n_items - n_items)
            - m_raters * tie_term AS BIGINT) AS w_den,
       CASE WHEN m_raters * m_raters
                 * (n_items * n_items * n_items - n_items)
                 - m_raters * tie_term > 0 THEN
         CAST(3 * s4 AS DOUBLE)
         / CAST(m_raters * m_raters
                * (n_items * n_items * n_items - n_items)
                - m_raters * tie_term AS DOUBLE)
       END AS w
FROM mm, nn, s4, tie"""


EXT_QUERIES["kendalls_w"] = (q_kendalls_w, sql_kendalls_w)


def q_span_geo_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document path geometry of the geo spans
    (operators/media.py geo_span_path): ordered by span offset,
    µ-quantized step/net lengths summed as exact longs, integer bbox
    — the trajectory profile of an interleaved document."""
    from .operators.media import geo_span_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return geo_span_path(interleaved_spans(docs))


def sql_span_geo_path() -> str:
    return f"""WITH {span_fields_sql()},
g AS (SELECT doc_id, i,
             CAST(split_part(text, ',', 1) AS BIGINT) AS lon,
             CAST(split_part(text, ',', 2) AS BIGINT) AS lat
      FROM fields WHERE kind = 'geo'),
st AS (SELECT doc_id, i, lon, lat,
              lon - LAG(lon) OVER w AS dx,
              lat - LAG(lat) OVER w AS dy
       FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
agg AS (SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_geo,
         CAST(COALESCE(SUM(CAST(FLOOR(sqrt(CAST(dx*dx + dy*dy
                                              AS DOUBLE))
                                      * 1000000.0) AS BIGINT)), 0)
              AS BIGINT) AS path_len_micro,
         min_by(lon, i) AS lon0, min_by(lat, i) AS lat0,
         max_by(lon, i) AS lon1, max_by(lat, i) AS lat1,
         CAST((MAX(lon) - MIN(lon)) * (MAX(lat) - MIN(lat)) AS BIGINT)
           AS bbox_area
        FROM st GROUP BY 1)
SELECT doc_id, n_geo, path_len_micro,
       CAST(FLOOR(sqrt(CAST((lon1 - lon0) * (lon1 - lon0)
                            + (lat1 - lat0) * (lat1 - lat0)
                            AS DOUBLE)) * 1000000.0) AS BIGINT)
         AS net_disp_micro,
       bbox_area
FROM agg"""


EXT_QUERIES["span_geo_path"] = (q_span_geo_path, sql_span_geo_path)


def q_span_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-diff over interleaved span documents
    (operators/media.py span_lcs): version B of every document drops
    the spans whose local hash % 4 == 0 and edits those with
    hash % 5 == 0, and the LCS similarity 2L/(la+lb) measures what
    survived IN ORDER — the span-sequence invariant as a diff metric,
    evaluated as one in-row HOF DP (no shuffle, no Python)."""
    from .operators.media import span_lcs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = interleaved_spans(docs)

    def h(s):
        return (F.col("doc_id") * 31
                + s["offset"].cast("long") * 7)

    def raw_sig(s):
        return F.concat_ws(
            ":", s["kind"], F.coalesce(s["text"], F.lit("~")),
            F.coalesce(s["media_ref"], F.lit("~")))

    def b_sig(s):
        return F.when(h(s) % 5 == 0,
                      F.concat(F.lit("EDIT:"), h(s).cast("string"))) \
            .otherwise(raw_sig(s))

    prep = base.select(
        "doc_id",
        F.transform(F.col("spans"), raw_sig).alias("sa"),
        F.transform(F.filter(F.col("spans"), lambda s: h(s) % 4 != 0),
                    b_sig).alias("sb"))
    return span_lcs(prep, max_len=8)


def sql_span_diff() -> str:
    mm = 6  # interleaved_spans caps n_spans at 6
    sig = ("kind || ':' || COALESCE(text, '~') || ':' "
           "|| COALESCE(media_ref, '~')")
    mcols = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN j = {j} THEN m END), 0) AS m{j}"
        for j in range(1, mm + 1))
    ctes = [f"""asig AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i,
         {sig} AS sig
  FROM fields),
bsig AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j,
         CASE WHEN (doc_id * 31 + i * 7) % 5 = 0
              THEN 'EDIT:' || CAST(doc_id * 31 + i * 7 AS VARCHAR)
              ELSE {sig} END AS sig
  FROM fields WHERE (doc_id * 31 + i * 7) % 4 <> 0),
la AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS len_a
       FROM asig GROUP BY 1),
lb AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS len_b
       FROM bsig GROUP BY 1),
m AS (
  SELECT a.doc_id, a.i, b.j,
         CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END AS m
  FROM asig a JOIN bsig b USING (doc_id)),
cw AS MATERIALIZED (
  SELECT doc_id, i,
         {mcols}
  FROM m GROUP BY 1, 2)"""]
    row1 = ["CAST(m1 AS BIGINT) AS g1"]
    for j in range(2, mm + 1):
        row1.append(f"GREATEST(CAST(m{j} AS BIGINT), g{j - 1}) AS g{j}")
    ctes.append("f1 AS MATERIALIZED (\n  SELECT doc_id, "
                + ",\n         ".join(row1)
                + "\n  FROM cw WHERE i = 1)")
    for i in range(2, mm + 1):
        exprs = ["CASE WHEN w.m1 = 1 THEN 1 ELSE p.g1 END AS t1"]
        for j in range(2, mm + 1):
            exprs.append(
                f"CASE WHEN w.m{j} = 1 THEN p.g{j - 1} + 1 "
                f"ELSE GREATEST(p.g{j}, t{j - 1}) END AS t{j}")
        body = ",\n           ".join(exprs)
        outer = ", ".join(f"t{j} AS g{j}" for j in range(1, mm + 1))
        ctes.append(f"""f{i} AS MATERIALIZED (
  SELECT doc_id, {outer} FROM (
    SELECT w.doc_id AS doc_id, {body}
    FROM cw w JOIN f{i - 1} p ON p.doc_id = w.doc_id
    WHERE w.i = {i}))""")
    allf = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, * FROM f{i}" for i in range(1, mm + 1))
    ctes.append(f"allf AS ({allf})")
    pick = " ".join(f"WHEN {j} THEN f.g{j}" for j in range(1, mm + 1))
    return (f"WITH {span_fields_sql()},\n" + ",\n".join(ctes) + f"""
SELECT doc_id, len_a, len_b, lcs,
       CASE WHEN len_a + len_b > 0
            THEN CAST(2 * lcs AS DOUBLE)
                 / CAST(len_a + len_b AS DOUBLE) END AS sim
FROM (
  SELECT la.doc_id, la.len_a, COALESCE(lb.len_b, 0) AS len_b,
         CAST(COALESCE(CASE COALESCE(lb.len_b, 0) {pick} END, 0)
              AS BIGINT) AS lcs
  FROM la
  LEFT JOIN lb USING (doc_id)
  LEFT JOIN allf f ON f.doc_id = la.doc_id AND f.i = la.len_a)""")


EXT_QUERIES["span_diff"] = (q_span_diff, sql_span_diff)


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document template-line removal per source
    (operators/text.py boilerplate_lines — the CCNet/RefinedWeb
    line-dedup step): documents are re-wrapped into 2-word lines
    (the small shared vocabulary makes real cross-document repeats),
    any line present in >= 3 distinct documents of the same source is
    boilerplate, and each document reports its residue — exact
    counts, one division, md5-hashed cleaned text."""
    from .operators.text import boilerplate_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    w2 = F.col("_w")
    nc2 = F.floor((F.size(w2) + 1) / F.lit(2)).cast("int")
    chunks2 = F.transform(
        F.sequence(F.lit(1), nc2),
        lambda i: F.array_join(F.slice(w2, (i - 1) * 2 + 1, 2), " "))
    prep = (docs.select("doc_id", "source", w.alias("_w"))
            .filter(F.size(F.col("_w")) > 0)
            .select("doc_id", "source",
                    F.array_join(chunks2, "\n").alias("text")))
    return boilerplate_lines(prep, ["source"], min_docs=3)


def sql_boilerplate_lines() -> str:
    return """WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
w AS (
  SELECT doc_id, source,
         unnest(l) AS word,
         unnest(generate_series(1, len(l))) AS ord
  FROM d WHERE len(l) > 0),
ln AS (
  SELECT doc_id, source, (ord - 1) // 2 AS pos,
         string_agg(word, ' ' ORDER BY ord) AS line
  FROM w GROUP BY 1, 2, 3),
fl AS (
  SELECT source, line,
         (COUNT(DISTINCT doc_id) >= 3) AS boiler
  FROM ln GROUP BY 1, 2)
SELECT l.doc_id, l.source,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS boiler_frac,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE NOT boiler), '')) AS cleaned_md5
FROM ln l JOIN fl USING (source, line)
GROUP BY 1, 2"""


EXT_QUERIES["boilerplate_lines"] = (q_boilerplate_lines,
                                    sql_boilerplate_lines)


def q_span_order_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-interleaving drift between document versions
    (operators/media.py span_order_drift): version B drops the spans
    with local hash % 4 == 0 and re-sorts the survivors by a keyed
    pseudo-random permutation; the normalized Kendall inversion count
    over common signatures measures how far B shuffled A's span
    order — the ORDER complement of the span_diff (LCS) gate, all
    exact in-row integer folds."""
    from .operators.media import span_order_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = interleaved_spans(docs)

    def h(s):
        return (F.col("doc_id") * 31
                + s["offset"].cast("long") * 7)

    def raw_sig(s):
        return F.concat_ws(
            ":", s["kind"], F.coalesce(s["text"], F.lit("~")),
            F.coalesce(s["media_ref"], F.lit("~")))

    fb = F.filter(F.col("spans"), lambda s: h(s) % 4 != 0)
    sorted_b = F.array_sort(F.transform(fb, lambda s: F.struct(
        F.pmod(h(s) * 7919, F.lit(10007)).alias("k"),
        s["offset"].alias("o"),
        raw_sig(s).alias("sig"))))
    prep = base.select(
        "doc_id",
        F.transform(F.col("spans"), raw_sig).alias("sa"),
        F.transform(sorted_b, lambda x: x["sig"]).alias("sb"))
    return span_order_drift(prep, max_len=8)


def sql_span_order_drift() -> str:
    return f"""WITH {span_fields_sql()},
sig AS (
  SELECT doc_id, i,
         kind || ':' || COALESCE(text, '~') || ':'
              || COALESCE(media_ref, '~') AS sig,
         (doc_id * 31 + i * 7) AS h
  FROM fields),
la AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len_a
  FROM sig GROUP BY 1),
bf AS (
  SELECT doc_id, sig,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY (h * 7919) % 10007, i) AS rb
  FROM sig WHERE h % 4 <> 0),
lb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len_b
  FROM bf GROUP BY 1),
a1 AS (SELECT doc_id, sig, MIN(i) AS pa FROM sig GROUP BY 1, 2),
b1 AS (SELECT doc_id, sig, MIN(rb) AS pb FROM bf GROUP BY 1, 2),
c AS (
  SELECT a1.doc_id, a1.pa, b1.pb
  FROM a1 JOIN b1 USING (doc_id, sig)),
nstat AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM c GROUP BY 1),
inv AS (
  SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS inversions
  FROM c x JOIN c y ON x.doc_id = y.doc_id
                   AND x.pa < y.pa AND x.pb > y.pb
  GROUP BY 1)
SELECT la.doc_id, la.len_a,
       COALESCE(lb.len_b, 0) AS len_b,
       COALESCE(n.n_common, 0) AS n_common,
       COALESCE(n.n_common, 0) * (COALESCE(n.n_common, 0) - 1) // 2
         AS n_pairs,
       COALESCE(inv.inversions, 0) AS inversions,
       CASE WHEN COALESCE(n.n_common, 0) >= 2
            THEN CAST(COALESCE(inv.inversions, 0) AS DOUBLE)
                 / CAST(COALESCE(n.n_common, 0)
                        * (COALESCE(n.n_common, 0) - 1) // 2 AS DOUBLE)
       END AS drift
FROM la
LEFT JOIN lb USING (doc_id)
LEFT JOIN nstat n USING (doc_id)
LEFT JOIN inv USING (doc_id)"""


EXT_QUERIES["span_order_drift"] = (q_span_order_drift,
                                   sql_span_order_drift)


_GAZETTEER = [("table", 1), ("scan", 2), ("table scan", 3),
              ("hash", 4), ("sort merge", 5), ("merge batch", 6)]


def q_gazetteer_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer span tagging with maximal-munch semantics
    (operators/text.py gazetteer_tag): a 6-phrase lexicon over the
    document corpus — in-row gram windows, one broadcast lexicon
    join, and the longest-match anti-join dropping 'table'/'scan'
    hits covered by a 'table scan' match."""
    from .operators.text import gazetteer_tag

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    lex = spark.createDataFrame(_GAZETTEER, "term string, ent long")
    return gazetteer_tag(docs, lex, max_words=2, longest_only=True)


def sql_gazetteer_tag() -> str:
    vals = ", ".join(f"('{t}', {e})" for t, e in _GAZETTEER)
    return f"""WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
w AS (
  SELECT doc_id, unnest(l) AS word,
         unnest(generate_series(1, len(l))) AS ord
  FROM d WHERE len(l) > 0),
g AS (
  SELECT doc_id, CAST(ord - 1 AS INT) AS pos, 1 AS n_words,
         word AS gram
  FROM w
  UNION ALL
  SELECT a.doc_id, CAST(a.ord - 1 AS INT) AS pos, 2 AS n_words,
         a.word || ' ' || b.word AS gram
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
lex(term, ent) AS (VALUES {vals}),
m AS (
  SELECT g.doc_id, g.pos, g.n_words, lex.term,
         CAST(lex.ent AS BIGINT) AS ent
  FROM g JOIN lex ON g.gram = lex.term)
SELECT doc_id, pos, CAST(n_words AS INT) AS n_words, term, ent
FROM m
WHERE NOT EXISTS (
  SELECT 1 FROM m m2
  WHERE m2.doc_id = m.doc_id AND m2.n_words > m.n_words
    AND m2.pos <= m.pos
    AND m2.pos + m2.n_words >= m.pos + m.n_words)"""


EXT_QUERIES["gazetteer_tag"] = (q_gazetteer_tag, sql_gazetteer_tag)


def q_soundex_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking census over the document vocabulary
    (operators/text.py soundex_key/soundex_blocks): the explicit
    NARA-Soundex Column chain (translate → H/W merge → run collapse →
    pad) groups phonetically equal words — blocks of ≥ 2 distinct
    words, the record-linkage candidate map."""
    from .operators.text import soundex_blocks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(F.filter(
        F.split(F.lower(F.col("text")), r"\s+"),
        lambda t: t != "")).alias("name"))
    return soundex_blocks(words, "name", min_block=2)


def sql_soundex_blocks() -> str:
    codes = "01230129022455012623019202"
    return f"""WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
w AS (SELECT DISTINCT unnest(l) AS name FROM d),
k AS (
  SELECT name, s, t,
         regexp_replace(regexp_replace(t, '9', '', 'g'),
                        '([0-9])\\1+', '\\1', 'g') AS v
  FROM (
    SELECT name, s,
           translate(s, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     '{codes}') AS t
    FROM (SELECT name,
                 regexp_replace(upper(name), '[^A-Z]', '', 'g') AS s
          FROM w))),
k2 AS (
  SELECT name,
         CASE WHEN length(s) > 0 THEN
           substr(s, 1, 1) ||
           rpad(substr(regexp_replace(
                  CASE WHEN substr(t, 1, 1) IN
                            ('1','2','3','4','5','6')
                       THEN substr(v, 2)
                       ELSE v END,
                  '0', '', 'g'), 1, 3), 3, '0')
         END AS skey
  FROM k)
SELECT skey, CAST(COUNT(*) AS BIGINT) AS n_names,
       MIN(name) AS first_name, MAX(name) AS last_name
FROM k2 WHERE skey IS NOT NULL
GROUP BY skey HAVING COUNT(*) >= 2"""


EXT_QUERIES["soundex_blocks"] = (q_soundex_blocks, sql_soundex_blocks)


_STYLO_TOPN = 20


def q_stylometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows-style stylometric deviation per document
    (operators/text.py stylometric_deviation): z-scored relative
    frequencies of the corpus top-20 words, exact floor-div
    frequency quantization, word-ordered |z| fold — the style
    outlier screen beside quality_score."""
    from .operators.text import stylometric_deviation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return stylometric_deviation(docs, top_n=_STYLO_TOPN)


def sql_stylometric() -> str:
    n = _STYLO_TOPN
    return f"""WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
toks AS (SELECT doc_id, unnest(l) AS w FROM d),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM toks GROUP BY 1),
top AS (SELECT w FROM (
  SELECT w, COUNT(*) AS c FROM toks GROUP BY 1
  ORDER BY c DESC, w ASC LIMIT {n})),
tf AS (
  SELECT toks.doc_id, toks.w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks JOIN top ON toks.w = top.w
  GROUP BY 1, 2),
grid AS (
  SELECT dl.doc_id, dl.dl, top.w,
         CAST(COALESCE(tf.tf, 0) * 1000000 // dl.dl AS BIGINT) AS fq
  FROM dl CROSS JOIN top
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.w = top.w),
st AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(fq) AS BIGINT) AS s1,
         CAST(SUM(fq * fq) AS BIGINT) AS s2
  FROM grid GROUP BY 1),
mv AS (
  SELECT w,
         CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
         CASE WHEN nd > 1 THEN
           (CAST(s2 AS DOUBLE)
            - CAST(nd AS DOUBLE)
              * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE)))
           / CAST(nd - 1 AS DOUBLE) END AS var
  FROM st),
z AS (
  SELECT grid.doc_id, grid.dl, grid.w,
         abs(CAST(grid.fq AS DOUBLE) - mv.mu) / sqrt(mv.var) AS z
  FROM grid JOIN mv ON mv.w = grid.w
  WHERE mv.var > 0.0)
SELECT doc_id, dl,
       CAST(COUNT(*) AS BIGINT) AS n_words_scored,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(z ORDER BY w)),
                   (a, x) -> a + x) / CAST(COUNT(*) AS DOUBLE)
         AS delta0
FROM z GROUP BY 1, 2"""


EXT_QUERIES["stylometric"] = (q_stylometric, sql_stylometric)


_JL_IN, _JL_OUT, _JL_SCALE = 64, 16, 1000


def q_sign_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 projection of the embeddings table
    64 → 16 dims (operators/similarity.py sign_projection): the
    python-baked sign matrix makes every projected component an
    exact in-row int64 fold — the width reducer that runs before
    LSH/IVF when vectors are too wide."""
    from .operators.similarity import sign_projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sign_projection(emb, _JL_IN, _JL_OUT, scale=_JL_SCALE)
    # surface as one row per (id, k, y) so the value-hash sees every
    # component without array-ordering ambiguity
    return out.select(
        "id", F.posexplode("proj").alias("k", "y"))


def sql_sign_projection() -> str:
    from .operators.similarity import jl_sign_matrix

    signs = jl_sign_matrix(_JL_IN, _JL_OUT)
    s = float(_JL_SCALE)
    comps = "\nUNION ALL\n".join(
        f"""SELECT vec_id AS id, {k} AS k,
       CAST((SELECT SUM(
           CAST(FLOOR(CAST(embedding[j.j] AS DOUBLE) * {s!r} + 0.5)
                AS BIGINT)
           * (CASE WHEN list_contains({
               [j + 1 for j in range(_JL_IN) if signs[k][j] == 1]
               }, j.j) THEN 1 ELSE -1 END))
         FROM (SELECT unnest(range(1, {_JL_IN + 1})) AS j) j)
        AS BIGINT) AS y
FROM embeddings"""
        for k in range(_JL_OUT))
    return comps


EXT_QUERIES["sign_projection"] = (q_sign_projection,
                                  sql_sign_projection)


_MND_LIM = 700
_MND_GROUP = 7


def q_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup over synthetic media payloads
    (operators/media.py media_near_dup): 80-byte blobs built as a
    shared 64-byte body per 7-doc cluster + a 16-byte per-doc tail,
    byte-shingle minhash (k=16, md5 mode), banded buckets, signature
    verify — the modality-blind dedup a multimodal corpus needs
    before any codec is involved."""
    from .geo.tilemath import floor_div
    from .operators.media import media_near_dup

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").filter(F.col("doc_id") < _MND_LIM))
    blob = F.unhex(F.concat(
        F.repeat(F.md5(F.concat(
            F.lit("g"), floor_div(F.col("doc_id"),
                                  _MND_GROUP).cast("string"))), 4),
        F.md5(F.concat(F.lit("d"), F.col("doc_id").cast("string")))))
    b = docs.select(F.col("doc_id").alias("id"), blob.alias("blob"))
    return (media_near_dup(b, hash_mode="md5")
            .select(F.col("id_a").alias("doc_a"),
                    F.col("id_b").alias("doc_b"), "matches"))


def sql_media_near_dup() -> str:
    h = _sql_md5_60("'42:' || s")
    mh = ", ".join(
        "list_min(list_transform(shingles, s -> "
        f"(({h} % {_MH_PRIME}) * {a} + {b}) % {_MH_PRIME}))"
        for a, b in dedup.minhash_mixers(16))
    n_sh = (80 - 8) // 4 + 1
    return f"""
WITH refs AS (SELECT doc_id AS id FROM documents
              WHERE doc_id < {_MND_LIM}),
bh AS (
  SELECT id,
         upper(repeat(md5('g' || CAST(id // {_MND_GROUP} AS VARCHAR)),
                      4)
               || md5('d' || CAST(id AS VARCHAR))) AS hx
  FROM refs),
sh AS (SELECT id, list_distinct(
         [substr(hx, i*8 + 1, 16) FOR i IN RANGE(0, {n_sh})])
         AS shingles FROM bh),
sig AS (SELECT id, [{mh}] AS sig FROM sh),
banded AS (
  SELECT id, u.b AS b,
         CAST(u.b AS VARCHAR) || ':'
         || array_to_string(sig[u.b*2+1 : u.b*2+2], ',') AS bkey
  FROM sig, UNNEST(range(0, 8)) u(b)),
szs AS (SELECT b, bkey FROM banded GROUP BY 1, 2
        HAVING COUNT(*) BETWEEN 2 AND 64),
inb AS (SELECT banded.* FROM banded JOIN szs USING (b, bkey)),
cand AS (
  SELECT DISTINCT a.id AS doc_a, bb.id AS doc_b
  FROM inb a JOIN inb bb
    ON a.b = bb.b AND a.bkey = bb.bkey AND a.id < bb.id),
m AS (
  SELECT c.doc_a, c.doc_b,
         CAST(list_sum(list_transform(range(1, 17),
             j -> CASE WHEN sa.sig[j] = sb.sig[j]
                       THEN 1 ELSE 0 END)) AS BIGINT) AS matches
  FROM cand c
  JOIN sig sa ON sa.id = c.doc_a
  JOIN sig sb ON sb.id = c.doc_b)
SELECT doc_a, doc_b, matches FROM m WHERE matches >= 8"""


EXT_QUERIES["media_near_dup"] = (q_media_near_dup, sql_media_near_dup)
