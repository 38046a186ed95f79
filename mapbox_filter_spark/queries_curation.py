"""Gate queries for corpus-level curation ops: C4-style duplicate-span
removal (operators/dedup.py:dedup_spans) and benchmark decontamination
(operators/text.py:decontaminate).

Both run over the ``documents`` table; the oracles rebuild the same
results in plain DuckDB SQL (string_split + window / join).  Span and
n-gram hashes are MD5 strings — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup
from .operators.text import decontaminate

_SPAN_W = 10
_NGRAM_N = 3
_EVAL_MOD = 41  # doc_id % 41 == 0 -> eval set (deterministic split)


def _cents(col: str = "value"):
    """THE portable cents quantizer for NON-NEGATIVE values:
    floor(x·100 + 0.5) cast long — floor(x+0.5) is the cross-engine
    rounding (Spark round() is BigDecimal HALF_UP, DuckDB's double
    round differs at .5 boundaries; see the hex cube-round note).  One
    definition so the parity invariant can't drift; the SQL twin is
    ``_CENTS_SQL`` and tests/test_dist_stats.py pins every SQL spelling
    against it."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


_CENTS_SQL = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

# shared normalized-words CTE fragment (same normalization every text
# gate uses: lower, collapse whitespace, trim, split on single space)
_WORDS_SQL = """base AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(
             TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '') AS words
  FROM documents
)"""


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dedup_spans(docs, span_words=_SPAN_W).select(
        "doc_id", "clean_text", "n_spans", "n_dropped")


def sql_span_dedup() -> str:
    w = _SPAN_W
    return f"""
WITH {_WORDS_SQL},
spans AS (
  SELECT doc_id, CAST(t.i AS INT) AS pos,
         array_to_string(words[(t.i*{w}+1):(t.i*{w}+{w})], ' ') AS span
  FROM base, LATERAL (
    SELECT unnest(range(GREATEST(CAST(CEIL(LEN(words)/{w}.0) AS BIGINT), 1)))
           AS i) t
),
m AS (
  SELECT doc_id, pos, span,
         ROW_NUMBER() OVER (PARTITION BY MD5(span)
                            ORDER BY doc_id, pos) AS rn
  FROM spans
)
SELECT doc_id,
       COALESCE(string_agg(span, ' ' ORDER BY pos) FILTER (WHERE rn = 1),
                '') AS clean_text,
       COUNT(*) AS n_spans,
       COUNT(*) FILTER (WHERE rn > 1) AS n_dropped
FROM m GROUP BY doc_id"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    tr = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return decontaminate(tr, ev, ngram_n=_NGRAM_N).select(
        "doc_id", "n_grams", "n_overlap", "contaminated")


def sql_decontaminate() -> str:
    n = _NGRAM_N
    return f"""
WITH {_WORDS_SQL},
grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+{n - 1}], ' ')
                        FOR i IN RANGE(1, GREATEST(LEN(words) - {n}, 0) + 2)])
         AS gs
  FROM base
),
ev AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams
  WHERE doc_id % {_EVAL_MOD} = 0
),
tr AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
  WHERE doc_id % {_EVAL_MOD} <> 0
)
SELECT tr.doc_id,
       COUNT(*) AS n_grams,
       COUNT(ev.g) AS n_overlap,
       COUNT(ev.g) > 0 AS contaminated
FROM tr LEFT JOIN ev ON tr.g = ev.g
GROUP BY tr.doc_id"""


def q_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pair mining: nearest text span before/after each media
    span over the interleaved-span substrate (operators/media.py
    caption_pairs — pure in-row HOFs, zero shuffle)."""
    from .operators.media import caption_pairs
    from .queries_ext import interleaved_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return caption_pairs(interleaved_spans(docs))


def sql_caption_pairs() -> str:
    from .queries_ext import span_fields_sql

    before = ("last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)"
              " OVER (PARTITION BY doc_id ORDER BY i"
              " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)")
    after = ("first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)"
             " OVER (PARTITION BY doc_id ORDER BY i"
             " ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)")
    return f"""
WITH {span_fields_sql()},
ctx AS (
  SELECT doc_id, i, kind, media_ref,
         {before} AS cap_before,
         {after} AS cap_after
  FROM fields
)
SELECT doc_id, media_ref, CAST(i AS INT) AS offset, cap_before, cap_after
FROM ctx WHERE kind = 'media'"""


_MAD_K = (2, 1)  # flag |dev| > 2·MAD


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-median/MAD outlier flags for n_chars per (lang, source)
    stratum (operators/stats.py — integer-only, cross-multiplied cut)."""
    from .operators.stats import robust_outliers

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "source", "n_chars"))
    return robust_outliers(docs, ["lang", "source"], "n_chars", k=_MAD_K)


def sql_robust_outliers() -> str:
    num, den = _MAD_K
    return f"""
WITH v AS (SELECT doc_id, lang, source, n_chars FROM documents),
r1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
                               ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM v),
med AS (
  SELECT lang, source, MAX(n_chars) AS med
  FROM r1 WHERE rn = (n + 1) // 2 GROUP BY lang, source),
d AS (
  SELECT v.*, med.med, ABS(v.n_chars - med.med) AS dev
  FROM v JOIN med USING (lang, source)),
r2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
                               ORDER BY dev) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM d),
mad AS (
  SELECT lang, source, MAX(dev) AS mad
  FROM r2 WHERE rn = (n + 1) // 2 GROUP BY lang, source)
SELECT d.lang, d.source, d.doc_id, d.n_chars, d.med, m.mad,
       (d.dev * {den} > m.mad * {num}) AS is_outlier
FROM d JOIN mad m USING (lang, source)"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of event value (cents) per event_type,
    weight = 1 + event_id % 7 — integer cross-multiplied threshold
    (2·cumw ≥ W), first-in-order pick, fully deterministic."""
    from pyspark.sql import functions as F

    from .operators.stats import weighted_median

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id",
        # portable rounding: floor(x+0.5) in BOTH engines (Spark
        # round() is BigDecimal HALF_UP — diverges at .5-2^-54)
        _cents().alias("cents"),
        (1 + F.col("event_id") % 7).alias("wgt"))
    return weighted_median(ev, ["event_type"], "cents", "wgt",
                           tiebreak="event_id")


def sql_weighted_median() -> str:
    return """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         1 + event_id % 7 AS wgt
  FROM events
),
ranked AS (
  SELECT event_type, cents, wgt,
         CAST(SUM(wgt) OVER (PARTITION BY event_type
              ORDER BY cents, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumw,
         CAST(SUM(wgt) OVER (PARTITION BY event_type) AS BIGINT) AS w,
         event_id
  FROM ev
)
SELECT event_type, cents AS wmedian, w AS total_weight FROM (
  SELECT event_type, cents, w,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn
  FROM ranked WHERE 2 * cumw >= w
) WHERE rn = 1"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of event value per user (the
    TimescaleDB time_weight aggregate): exact integer cents·seconds
    sums, one IEEE division at the end."""
    from pyspark.sql import functions as F

    from .operators.stats import time_weighted_avg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    return time_weighted_avg(ev, ["user_id"], "ts_us", "cents",
                             tiebreak="event_id")


def sql_time_weighted_avg() -> str:
    return """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
hops AS (
  SELECT user_id, cents,
         (lead(ts_us) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) - ts_us)
           // 1000000 AS dt
  FROM ev
)
SELECT user_id,
       CAST(SUM(cents * dt) AS BIGINT) AS twa_num,
       CAST(SUM(dt) AS BIGINT) AS twa_den,
       CAST(CAST(SUM(cents * dt) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE) AS twa
FROM hops WHERE dt IS NOT NULL
GROUP BY user_id
HAVING CAST(SUM(dt) AS BIGINT) > 0"""


def q_span_hex_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-cell encoding of interleaved-document GEO SPANS — the north
    rule's "batched H3/S2 cell encoding of span geometries" on the hex
    half: each document carries an ordered spans array (kind, lon/lat
    payload, offset); geo spans posexplode (offset preserved — the
    span-sequence invariant), hex-bin (geo/hex.py), and aggregate per
    (cell, lang).  The whole span synthesis + binning is engine-exact
    column math, value-hash-matched."""
    from .geo.hex import hex_axial

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang")
    did = F.col("doc_id")
    n_spans = (2 + F.pmod(did, F.lit(4))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.struct(
            F.element_at(
                F.array(F.lit("text"), F.lit("geo"), F.lit("media")),
                (F.pmod(did * 7 + i, F.lit(3)) + 1).cast("int"))
            .alias("kind"),
            ((F.pmod(did * 7919 + i * 104729, F.lit(360000)))
             .cast("double") / 1000.0 - 180.0).alias("lon"),
            ((F.pmod(did * 104729 + i * 7919, F.lit(170000)))
             .cast("double") / 1000.0 - 85.0).alias("lat"),
            i.cast("int").alias("offset")))
    ex = (docs.select("doc_id", "lang",
                      F.posexplode(spans).alias("span_idx", "s"))
          .filter(F.col("s.kind") == "geo"))
    hq, hr = hex_axial(F.col("s.lon"), F.col("s.lat"), 1.0 / 64.0)
    return (ex.select("doc_id", "lang", hq.alias("hq"), hr.alias("hr"),
                      F.col("s.offset").alias("off"))
            .groupBy("hq", "hr", "lang")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.sum("off").alias("sum_off")))


def sql_span_hex_cells() -> str:
    from .geo.hex import sql_hex_axial

    return f"""
WITH sp AS (
  SELECT d.doc_id, d.lang, CAST(t.i AS INT) AS off,
         ((d.doc_id*7919 + t.i*104729) % 360000) / 1000.0 - 180.0 AS lon,
         ((d.doc_id*104729 + t.i*7919) % 170000) / 1000.0 - 85.0 AS lat,
         (d.doc_id*7 + t.i) % 3 AS kind_i
  FROM documents d,
       LATERAL (SELECT unnest(range(2 + d.doc_id % 4)) AS i) t
),
geo AS (
  SELECT doc_id, lang, off, {sql_hex_axial(1.0 / 64.0)}
  FROM sp WHERE kind_i = 1
)
SELECT hq, hr, lang, COUNT(*) AS n_spans,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(off) AS BIGINT) AS sum_off
FROM geo GROUP BY hq, hr, lang"""


_GRAM_DIM = 64
_GRAM_SCALE = 1000


def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gram matrix over the embeddings corpus
    (operators/stats.py gram_matrix): per-Arrow-batch int64 XᵀX
    partials summed — the mergeable sufficient statistic for PCA/
    whitening, value-hashable because integer sums are order-free
    (float accumulation is not).  Oracle recomputes the same quantized
    products by brute per-dimension self-join."""
    from .operators.stats import gram_matrix

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return gram_matrix(emb, "embedding", _GRAM_DIM, scale=_GRAM_SCALE)


def sql_gram_matrix() -> str:
    d, s = _GRAM_DIM, _GRAM_SCALE
    return f"""
WITH q AS (
  SELECT vec_id, t.i,
         CAST(FLOOR(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * {float(s)!r} + 0.5) AS BIGINT) AS q
  FROM embeddings, LATERAL (SELECT unnest(range({d})) AS i) t
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       CAST(SUM(a.q * b.q) AS BIGINT) AS g,
       (SELECT COUNT(*) FROM embeddings
        WHERE embedding IS NOT NULL) AS n
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i"""


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Spearman correlation between event value and
    time-of-day (operators/rankstats.py spearman_corr): doubled
    tie-corrected average ranks keep every Pearson-on-ranks sum an
    EXACT long; rho is one pinned long→double/√/·// chain (bit-stable),
    zero-variance groups NULL by an integer guard on both engines."""
    from .operators.rankstats import spearman_corr

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         % (86_400 * 1_000_000)).alias("day_us"))
    return spearman_corr(ev, ["event_type"], "cents", "day_us")


def sql_spearman_corr() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) % 86400000000 AS day_us
  FROM events),
r AS (
  SELECT event_type,
         RANK() OVER (PARTITION BY event_type
                      ORDER BY cents NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS rx,
         RANK() OVER (PARTITION BY event_type
                      ORDER BY day_us NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY event_type, day_us) - 1 AS ry
  FROM e),
a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM r GROUP BY event_type)
SELECT event_type, n,
       n * sxy - sx * sy AS s_num,
       n * sxx - sx * sx AS d_x,
       n * syy - sy * sy AS d_y,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
            END AS rho
FROM a"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Mann-Whitney U, weekend vs weekday values
    (operators/rankstats.py mann_whitney_u): exact doubled-rank U
    statistic + rank-biserial effect size; the weekend flag is pure
    integer epoch-day math ((day+4)%7 ∈ {0,6} — no engine-dependent
    dayofweek conventions)."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import mann_whitney_u

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).isin(0, 6).alias("wknd"),
        _cents().alias("cents"))
    return mann_whitney_u(ev, ["event_type"], "wknd", "cents")


def sql_mann_whitney() -> str:
    return """WITH e AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000 + 4) % 7) IN (0, 6) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, f,
         RANK() OVER (PARTITION BY event_type
                      ORDER BY cents NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS r2
  FROM e WHERE f IS NOT NULL AND cents IS NOT NULL),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN f THEN r2 ELSE 0 END) AS BIGINT) AS r1x2
  FROM r GROUP BY event_type)
SELECT event_type, n1, n2, r1x2 - n1 * (n1 + 1) AS u2,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN CAST(1.0 AS DOUBLE)
                 - CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
                   / CAST(n1 * n2 AS DOUBLE) END AS rbc
FROM a"""


def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of event values per type
    (operators/stats.py benford_profile): exact digit counts from the
    decimal string of positive cents; the expected count is the only
    double (one pinned divide + two lns)."""
    from .operators.stats import benford_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        _cents().alias("cents"))
    return benford_profile(ev, ["event_type"], "cents")


def sql_benford_profile() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
p AS (
  SELECT event_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM e WHERE cents > 0),
c AS (SELECT event_type, digit, COUNT(*) AS n_d FROM p GROUP BY 1, 2)
SELECT event_type, digit, n_d,
       CAST(SUM(n_d) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       CAST(CAST(SUM(n_d) OVER (PARTITION BY event_type) AS BIGINT)
            AS DOUBLE)
         * (ln(CAST(1.0 AS DOUBLE)
               + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))
            / ln(CAST(10.0 AS DOUBLE))) AS exp_d
FROM c"""


def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Shannon entropy of the user distribution
    (operators/stats.py entropy_profile): exact counts, Σc·ln c as a
    category-sorted pinned fold (float groupBy sums have
    nondeterministic addend order), H = ln(n) − Σ/n."""
    from .operators.stats import entropy_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "user_id")
    return entropy_profile(ev, ["event_type"], "user_id")


def sql_entropy_profile() -> str:
    return """WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(c) AS BIGINT) AS n,
       COUNT(*) AS n_cats,
       ln(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE))
         - list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
                          list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                               ORDER BY user_id NULLS FIRST)),
             (a, b) -> a + b)
           / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS entropy
FROM c GROUP BY event_type"""


def q_gini_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Gini concentration of event values
    (operators/stats.py gini_profile): sorted-rank numerator
    Σ(2i−n−1)·cents is an exact long (tie-invariant), gini one pinned
    divide; negative values would raise in-plan (none in this corpus)."""
    from .operators.stats import gini_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        _cents().alias("cents"))
    return gini_profile(ev, ["event_type"], "cents")


def sql_gini_profile() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e),
a AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_v,
         CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS g_num
  FROM r GROUP BY event_type)
SELECT event_type, n, sum_v, g_num,
       CASE WHEN sum_v > 0
            THEN CAST(g_num AS DOUBLE) / CAST(n * sum_v AS DOUBLE)
            END AS gini
FROM a"""


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type two-sample Kolmogorov-Smirnov statistic, weekend
    vs weekday value distributions (operators/rankstats.py ks_2samp):
    D numerator is the exact-integer cross-multiplied sup
    max|n2·C1 − n1·C2| over the observed step points; one pinned final
    divide.  The shape-sensitive sibling of the mann_whitney gate."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import ks_2samp

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).isin(0, 6).alias("wknd"),
        _cents().alias("cents"))
    return ks_2samp(ev, ["event_type"], "wknd", "cents")


def sql_ks_test() -> str:
    return """WITH e AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000 + 4) % 7) IN (0, 6) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
g AS (
  SELECT event_type, cents,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM e GROUP BY 1, 2),
s AS (
  SELECT event_type,
         CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
         CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2,
         CAST(SUM(c1) OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g)
SELECT event_type,
       MAX(n1) AS n1, MAX(n2) AS n2,
       MAX(abs(n2 * cum1 - n1 * cum2)) AS d_num,
       CASE WHEN MAX(n1) > 0 AND MAX(n2) > 0
            THEN CAST(MAX(abs(n2 * cum1 - n1 * cum2)) AS DOUBLE)
                 / CAST(MAX(n1) * MAX(n2) AS DOUBLE)
            END AS d_stat
FROM s GROUP BY event_type"""


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Kendall tau-b between event value and
    time-of-day (operators/rankstats.py kendall_tau): exact
    concordant/discordant/tie pair counts from ONE bounded self pair
    join, tau the same pinned √-chain as spearman.  The concordance
    twin of the spearman_corr gate — both correlations over the same
    column pair, independently derived.

    The gate pre-samples 1/16 by event_id (deterministic, identical in
    both engines) — exact tau is O(n²/group) and the operator's 20k
    in-plan cap would otherwise fire at sf0.1 (20,302 signup rows);
    sample-then-tau is exactly the operator's documented guidance for
    big groups, and the sampled gate stays in-cap through sf1.0."""
    from .operators.rankstats import kendall_tau

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.pmod(F.col("event_id"), F.lit(16)) == 0).select(
        "event_type",
        _cents().alias("cents"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         % (86_400 * 1_000_000)).alias("day_us"))
    return kendall_tau(ev, ["event_type"], "cents", "day_us")


def sql_kendall_tau() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         epoch_us(ts) % 86400000000 AS y
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_id % 16 = 0),
r AS (
  SELECT event_type, x, y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY x NULLS FIRST, y NULLS FIRST) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e),
p AS (
  SELECT a.event_type AS event_type,
         CAST(MAX(a.n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM r a JOIN r b ON a.event_type = b.event_type AND a.i < b.i
  GROUP BY a.event_type)
SELECT event_type, n, c - d AS c_minus_d,
       (n * (n - 1)) // 2 - tx AS d_x,
       (n * (n - 1)) // 2 - ty AS d_y,
       CASE WHEN (n * (n - 1)) // 2 - tx > 0
             AND (n * (n - 1)) // 2 - ty > 0
            THEN CAST(c - d AS DOUBLE)
                 / (sqrt(CAST((n * (n - 1)) // 2 - tx AS DOUBLE))
                    * sqrt(CAST((n * (n - 1)) // 2 - ty AS DOUBLE)))
            END AS tau
FROM p"""


# THE chi-square oracle chain (single definition — the _CENTS_SQL
# rule): from an `e(a, b)` CTE, completes the contingency grid
# (empty cells contribute r*c/n; dropping them understates chi2 —
# the round-5 session-15 fix), exact-numerator terms, and the pinned
# (a, b)-sorted fold.  Mirror of operators/stats.py
# chi_square_independence; every chi-square-family oracle MUST build
# on these fragments (tripwire-tested).
_CHI2_CTES_SQL = """obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
          FROM e GROUP BY 1, 2),
-- complete the grid: empty cells contribute r*c/n to chi2
cells AS (
  SELECT g.a, g.b, COALESCE(obs.o, 0) AS o
  FROM (SELECT da.a, db.b
        FROM (SELECT DISTINCT a FROM obs) da
        CROSS JOIN (SELECT DISTINCT b FROM obs) db) g
  LEFT JOIN obs ON g.a = obs.a AND g.b = obs.b),
t AS (
  SELECT a, b, o,
         CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells),
terms AS (
  SELECT a, b, n,
         (CAST(n * o - r * c AS DOUBLE) * CAST(n * o - r * c AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
           AS trm
  FROM t)"""

_CHI2_FOLD_SQL = """list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                                  list(trm ORDER BY a NULLS FIRST,
                                       b NULLS FIRST)),
                     (x, y) -> x + y)"""


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence, event type x weekday
    (operators/stats.py chi_square_independence): exact-numerator form
    (n·O − r·c)²/(n·r·c) per cell, summed as a (a,b)-sorted pinned
    fold — the only doubles are one divide per cell and the fold."""
    from .geo.tilemath import floor_div
    from .operators.stats import chi_square_independence

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).alias("wday"))
    return chi_square_independence(ev, "event_type", "wday")


def sql_chi_square() -> str:
    return f"""WITH e AS (
  SELECT event_type AS a,
         ((epoch_us(ts) // 86400000000 + 4) % 7) AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
{_CHI2_CTES_SQL}
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
       CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
       CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
            AS BIGINT) AS dof,
       CASE WHEN (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) > 0
            THEN {_CHI2_FOLD_SQL}
            END AS chi2
FROM terms"""


def q_rank_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-convention percentiles of event value per type
    (operators/stats.py rank_percentiles): p_q is the ⌈q·n/100⌉-th
    smallest cents value — exact integers end-to-end, unlike the
    interpolating quantile_profile gate (the two conventions are
    deliberately distinct and both covered)."""
    from .operators.stats import rank_percentiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        _cents().alias("cents"))
    return rank_percentiles(ev, ["event_type"], "cents", qs=(50, 90, 99))


def sql_rank_percentiles() -> str:
    pick = "MAX(CASE WHEN rn = (n * {q} + 99) // 100 THEN cents END)"
    return f"""WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       {pick.format(q=50)} AS p50,
       {pick.format(q=90)} AS p90,
       {pick.format(q=99)} AS p99
FROM r GROUP BY event_type"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (operators/text.py
    readability): exact word/sentence/vowel-group counts, one pinned
    double chain — zero shuffle."""
    from .operators.text import readability

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return readability(docs)


def sql_readability() -> str:
    return f"""WITH {_WORDS_SQL},
c AS (
  SELECT b.doc_id,
         CAST(LEN(b.words) AS BIGINT) AS n_words,
         CAST(GREATEST(LEN(regexp_extract_all(d.text, '[.!?]+')), 1)
              AS BIGINT) AS n_sents,
         CAST(list_sum(list_prepend(0, list_transform(b.words,
                w -> LEN(regexp_extract_all(w, '[aeiouy]+')))))
              AS BIGINT) AS n_syll
  FROM base b JOIN documents d ON d.doc_id = b.doc_id)
SELECT doc_id, n_words, n_sents, n_syll,
       CASE WHEN n_words > 0
            THEN CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE)
                   * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
                 - CAST(84.6 AS DOUBLE)
                   * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
            END AS flesch
FROM c"""


def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of the events table (operators/stats.py
    null_profile): exact per-column fill/cardinality from ONE scan +
    one single-row exchange, unpivoted in-row."""
    from .operators.stats import null_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return null_profile(
        ev, ["event_id", "ts", "user_id", "event_type", "value", "props"])


def sql_null_profile() -> str:
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n,
       COUNT(*) - COUNT({c}) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CASE WHEN COUNT(*) > 0
            THEN CAST(COUNT({c}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            END AS fill_rate
FROM events""" for c in cols)
    return rows


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join over part names (operators/text.py
    fuzzy_match_blocked): Levenshtein ≤ 1 pairs candidate-generated by
    first-token blocking — the near-duplicate-name screen; blocking
    recall documented in the operator."""
    from .operators.text import fuzzy_match_blocked

    parts = spark.read.parquet(f"{sf_dir}/part.parquet") \
        .select("p_partkey", "p_name")
    return fuzzy_match_blocked(parts, "p_partkey", "p_name", max_dist=1)


def sql_fuzzy_match() -> str:
    return r"""WITH b AS (
  SELECT p_partkey AS id, p_name AS nm,
         regexp_split_to_array(lower(p_name), '\s+')[1] AS blk
  FROM part WHERE p_name IS NOT NULL)
SELECT l.id AS id_a, r.id AS id_b, l.nm AS name_a, r.nm AS name_b,
       CAST(levenshtein(l.nm, r.nm) AS INTEGER) AS dist
FROM b l JOIN b r ON l.blk = r.blk AND l.id < r.id
WHERE levenshtein(l.nm, r.nm) <= 1"""


def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type MODE of the user distribution (operators/stats.py
    group_mode): most frequent user, equal counts break to the SMALLEST
    user_id — a total order, so every engine agrees.  Two map-side-
    combinable groupBys + one window over the (group, value) AGGREGATE;
    the fact table never sorts."""
    from .operators.stats import group_mode

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "user_id")
    return group_mode(ev, ["event_type"], "user_id")


def sql_group_mode() -> str:
    return """WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS _c
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, user_id, _c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY _c DESC, user_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
  FROM c)
SELECT event_type, user_id AS mode_val, _c AS mode_cnt, n_distinct
FROM r WHERE rn = 1"""


def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type min-max scaling of event cents (operators/stats.py
    minmax_scale): broadcast extrema join back — the fact table never
    exchanges; constant groups and NULL values scale to NULL."""
    from .operators.stats import minmax_scale

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", _cents().alias("cents"))
    return minmax_scale(ev, ["event_type"], "cents")


def sql_feature_scale() -> str:
    return f"""WITH e AS (
  SELECT event_id, event_type, {_CENTS_SQL} AS cents FROM events),
a AS (SELECT event_type, MIN(cents) AS lo, MAX(cents) AS hi
      FROM e WHERE cents IS NOT NULL GROUP BY 1)
SELECT e.event_id, e.event_type, e.cents, a.lo, a.hi,
       CASE WHEN a.hi > a.lo AND e.cents IS NOT NULL
            THEN CAST(e.cents - a.lo AS DOUBLE)
                 / CAST(a.hi - a.lo AS DOUBLE)
            END AS scaled
FROM e LEFT JOIN a USING (event_type)"""


_ZIPF_TOP = 200


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary
    (operators/text.py zipf_slope): ln-ln OLS over the top-200 tokens
    with u-nat integer quantization before the moment sums - order-
    independent exact aggregates, flat pinned double chain after."""
    from .operators.text import zipf_slope

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_slope(docs, top_n=_ZIPF_TOP)


def sql_lnln_fit_tail(pts: str = "lnpts") -> str:
    """Oracle tail mirroring operators/stats.py loglog_fit: given a
    CTE ``pts(x, y)`` of positive integers, quantize, aggregate exact
    moments, and emit (n, slope, intercept, r2) with the identical
    flat double chain.  Shared by the zipf_slope and gravity_decay
    gates."""
    from .operators.stats import LNLN_SCALE

    sc = float(LNLN_SCALE)
    q = lambda e: (f"CAST(FLOOR(ln(CAST({e} AS DOUBLE)) * {sc!r} + 0.5)"
                   " AS BIGINT)")
    return f"""
qpts AS (SELECT {q('x')} AS qx, {q('y')} AS qy FROM {pts}),
agg AS (
  SELECT COUNT(*) AS n,
         SUM(qx) AS sx, SUM(qy) AS sy,
         SUM(qx * qx) AS sxx,
         SUM(qy * qy) AS syy,
         SUM(qx * qy) AS sxy
  FROM qpts),
m AS (
  SELECT n, sx, sy, sxx, syy, sxy,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
  FROM agg)
SELECT n,
       CASE WHEN den > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
       CASE WHEN den > 0
            THEN (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                 / (CAST(den AS DOUBLE) * {sc!r}) END AS intercept,
       CASE WHEN den > 0 AND deny > 0
            THEN (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                 / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE))
            END AS r2
FROM m"""


def sql_zipf_slope() -> str:
    return f"""
WITH words AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents),
toks AS (SELECT unnest(ws) AS tok FROM words),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
top AS (
  SELECT cnt, rank FROM (
    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank
    FROM vocab) WHERE rank <= {_ZIPF_TOP}),
lnpts AS (SELECT rank AS x, cnt AS y FROM top),
{sql_lnln_fit_tail()}"""


CURATION_QUERIES = {
    "zipf_slope": (q_zipf_slope, sql_zipf_slope),

    "span_dedup": (q_span_dedup, sql_span_dedup),
    "decontaminate": (q_decontaminate, sql_decontaminate),
    "caption_pairs": (q_caption_pairs, sql_caption_pairs),
    "robust_outliers": (q_robust_outliers, sql_robust_outliers),
    "weighted_median": (q_weighted_median, sql_weighted_median),
    "time_weighted_avg": (q_time_weighted_avg, sql_time_weighted_avg),
    "span_hex_cells": (q_span_hex_cells, sql_span_hex_cells),
    "gram_matrix": (q_gram_matrix, sql_gram_matrix),
    "spearman_corr": (q_spearman_corr, sql_spearman_corr),
    "mann_whitney": (q_mann_whitney, sql_mann_whitney),
    "benford_profile": (q_benford_profile, sql_benford_profile),
    "entropy_profile": (q_entropy_profile, sql_entropy_profile),
    "gini_profile": (q_gini_profile, sql_gini_profile),
    "ks_test": (q_ks_test, sql_ks_test),
    "kendall_tau": (q_kendall_tau, sql_kendall_tau),
    "chi_square": (q_chi_square, sql_chi_square),
    "rank_percentiles": (q_rank_percentiles, sql_rank_percentiles),
    "readability": (q_readability, sql_readability),
    "null_profile": (q_null_profile, sql_null_profile),
    "fuzzy_match": (q_fuzzy_match, sql_fuzzy_match),
    "group_mode": (q_group_mode, sql_group_mode),
    "feature_scale": (q_feature_scale, sql_feature_scale),
}


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the event-value sequence per event
    type (operators/rankstats.py runs_test): exact lower-median
    dichotomy, integer run counts, one pinned √-chain z."""
    from .operators.rankstats import runs_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", _cents().alias("cents"))
    return runs_test(ev, ["event_type"], "event_id", "cents")


def sql_runs_test() -> str:
    return f"""WITH v AS (
  SELECT event_type AS g, event_id, {_CENTS_SQL} AS v FROM events),
ranked AS (
  SELECT g, event_id, v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, event_id) AS r,
         COUNT(*) OVER (PARTITION BY g) AS n_all
  FROM v),
med AS (SELECT g, v AS medv FROM ranked WHERE r = (n_all + 1) // 2),
signed AS (
  SELECT r.g, r.event_id,
         CASE WHEN r.v > m.medv THEN 1 ELSE 0 END AS s
  FROM ranked r JOIN med m ON r.g = m.g
  WHERE r.v <> m.medv),
seq AS (
  SELECT g, s,
         CASE WHEN LAG(s) OVER (PARTITION BY g ORDER BY event_id)
                   IS NULL THEN 1
              WHEN LAG(s) OVER (PARTITION BY g ORDER BY event_id)
                   <> s THEN 1 ELSE 0 END AS chg
  FROM signed),
agg AS (
  SELECT g AS event_type,
         CAST(SUM(s) AS BIGINT) AS n1,
         CAST(SUM(1 - s) AS BIGINT) AS n0,
         CAST(SUM(chg) AS BIGINT) AS runs
  FROM seq GROUP BY 1)
SELECT event_type, n1, n0, runs,
       CASE WHEN n1 > 0 AND n0 > 0
                 AND 2 * n1 * n0 * (2 * n1 * n0 - (n1 + n0)) > 0
            THEN CAST((n1 + n0) * (runs - 1) - 2 * n1 * n0 AS DOUBLE)
                 * sqrt(CAST(n1 + n0 - 1 AS DOUBLE))
                 / sqrt(CAST(2 * n1 * n0 * (2 * n1 * n0 - (n1 + n0))
                             AS DOUBLE))
       END AS z
FROM agg"""


CURATION_QUERIES["runs_test"] = (q_runs_test, sql_runs_test)


_WINSOR_LO_Q, _WINSOR_HI_Q = 5, 95


def q_winsorize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization report over event values per event type
    (operators/stats.py winsorize_profile): exact order-statistic
    clamp bounds, exact clipped counts and winsorized sums."""
    from .operators.stats import winsorize_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents().alias("cents"))
    return winsorize_profile(ev, ["event_type"], "cents",
                             lo_q=_WINSOR_LO_Q, hi_q=_WINSOR_HI_Q)


def sql_winsorize_profile() -> str:
    lo, hi = _WINSOR_LO_Q, _WINSOR_HI_Q
    return f"""WITH v AS (
  SELECT event_type AS g, {_CENTS_SQL} AS v FROM events
  WHERE value IS NOT NULL),
ranked AS (
  SELECT g, v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM v),
bounds AS (
  SELECT g, MAX(n) AS n,
         MAX(CASE WHEN rn = (n * {lo} + 99) // 100 THEN v END) AS lo_c,
         MAX(CASE WHEN rn = (n * {hi} + 99) // 100 THEN v END) AS hi_c
  FROM ranked GROUP BY 1)
SELECT v.g AS event_type, MAX(b.n) AS n,
       MAX(b.lo_c) AS lo_c, MAX(b.hi_c) AS hi_c,
       CAST(SUM(CASE WHEN v.v < b.lo_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN v.v > b.hi_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       CAST(SUM(v.v) AS BIGINT) AS sum_c,
       CAST(SUM(GREATEST(LEAST(v.v, b.hi_c), b.lo_c)) AS BIGINT)
         AS winsorized_sum_c
FROM v JOIN bounds b ON v.g = b.g
GROUP BY 1"""


CURATION_QUERIES["winsorize_profile"] = (q_winsorize_profile,
                                         sql_winsorize_profile)


_BOOT_B = 40
_BOOT_SALT = "boot"
_BOOT_QLO, _BOOT_QHI = 3, 98


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for the mean event value
    (operators/stats.py poisson_bootstrap_ci): deterministic md5
    Poisson(1) weights against exact integer CDF thresholds, exact
    per-replica moments, exact order-statistic interval."""
    from .operators.stats import poisson_bootstrap_ci

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", _cents().alias("cents"))
    return poisson_bootstrap_ci(ev, "event_id", "cents",
                                n_replicas=_BOOT_B, salt=_BOOT_SALT,
                                q_lo=_BOOT_QLO, q_hi=_BOOT_QHI)


def sql_bootstrap_ci() -> str:
    from .operators.stats import _POISSON1_T60
    w_case = " ".join(
        f"WHEN u < {t} THEN {k}"
        for k, t in enumerate(_POISSON1_T60))
    return f"""WITH fan AS (
  SELECT {_CENTS_SQL} AS x, event_id, t.b
  FROM events, LATERAL (SELECT unnest(range(0, {_BOOT_B})) AS b) t),
uw AS (
  SELECT x, b,
         CASE {w_case} ELSE {len(_POISSON1_T60)} END AS w
  FROM (
    SELECT x, b,
           CAST(('0x' || substr(md5(concat_ws(chr(31), '{_BOOT_SALT}',
                 CAST(event_id AS VARCHAR), CAST(b AS VARCHAR))),
                 1, 15)) AS BIGINT) AS u
    FROM fan)),
rep AS (
  SELECT b, CAST(SUM(w * x) AS BIGINT) AS s,
         CAST(SUM(w) AS BIGINT) AS nw
  FROM uw GROUP BY 1 HAVING SUM(w) > 0),
means AS (
  SELECT b, CAST(s AS DOUBLE) / CAST(nw AS DOUBLE) AS m FROM rep),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS r,
         COUNT(*) OVER () AS bn
  FROM means),
ci AS (
  SELECT CAST(MAX(bn) AS BIGINT) AS b_replicas,
         MAX(CASE WHEN r = (bn * {_BOOT_QLO} + 99) // 100 THEN m END)
           AS lo_mean,
         MAX(CASE WHEN r = (bn * {_BOOT_QHI} + 99) // 100 THEN m END)
           AS hi_mean
  FROM ranked),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS s_all
  FROM events)
SELECT tot.n,
       CAST(tot.s_all AS DOUBLE) / CAST(tot.n AS DOUBLE) AS mean,
       ci.b_replicas, ci.lo_mean, ci.hi_mean
FROM tot CROSS JOIN ci"""


CURATION_QUERIES["bootstrap_ci"] = (q_bootstrap_ci, sql_bootstrap_ci)


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types, one test per weekend flag
    (operators/rankstats.py kruskal_wallis): pooled doubled ranks make
    every rank sum exact; the per-group Σ R2²/n fold runs in
    group-sorted pinned order and the tie correction Σ(t³−t) is one
    exact long — the k-group sibling of the mann_whitney gate."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import kruskal_wallis

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).isin(0, 6).alias("wknd"),
        "event_type",
        _cents().alias("cents"))
    return kruskal_wallis(ev, ["wknd"], "event_type", "cents")


def sql_kruskal_wallis() -> str:
    nd = "CAST(n AS DOUBLE)"
    h = (f"3.0 * fold / ({nd} * ({nd} + 1.0)) "
         f"- 3.0 * ({nd} + 1.0)")
    return f"""WITH e AS (
  SELECT ((epoch_us(ts) // 86400000000 + 4) % 7) IN (0, 6) AS wknd,
         event_type AS g,
         {_CENTS_SQL} AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
r AS (
  SELECT wknd, g,
         RANK() OVER (PARTITION BY wknd ORDER BY v NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY wknd, v) - 1 AS r2,
         CAST(COUNT(*) OVER (PARTITION BY wknd, v) AS BIGINT) AS t
  FROM e),
pg AS (
  SELECT wknd, g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(r2) AS BIGINT) AS r2_g,
         CAST(SUM(t * t - 1) AS BIGINT) AS tt_g
  FROM r GROUP BY 1, 2),
terms AS (
  SELECT wknd, g, n_g, r2_g, tt_g,
         (CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE))
           / CAST(n_g AS DOUBLE) AS trm
  FROM pg),
a AS (
  SELECT wknd, CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(tt_g) AS BIGINT) AS tie_sum,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(trm ORDER BY g NULLS FIRST)),
                     (x, y) -> x + y) AS fold
  FROM terms GROUP BY 1)
SELECT wknd, n, k, tie_sum,
       CASE WHEN k >= 2 AND n > 1 THEN {h} END AS h,
       CASE WHEN k >= 2 AND n > 1 AND n * n * n - n > tie_sum
            THEN ({h})
                 / (1.0 - CAST(tie_sum AS DOUBLE)
                          / CAST(n * n * n - n AS DOUBLE))
            END AS h_c
FROM a"""


CURATION_QUERIES["kruskal_wallis"] = (q_kruskal_wallis,
                                      sql_kruskal_wallis)


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality profile of event cents per type
    (operators/stats.py jarque_bera): anchor-centered exact
    DECIMAL(38) power sums (the floor-mean anchor keeps δ = D1/n in
    [0,1)), central moments and g1/g2/JB as flat pinned double
    chains — the loglog_fit exact-sums-pinned-combination
    discipline."""
    from .operators.stats import jarque_bera

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    return jarque_bera(ev, ["event_type"], "cents")


def sql_jarque_bera() -> str:
    nd = "CAST(n AS DOUBLE)"
    delta = f"(CAST(d1 AS DOUBLE) / {nd})"
    return f"""WITH e AS (
  SELECT event_type AS g, {_CENTS_SQL} AS x
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
anch AS (
  SELECT g, CAST(SUM(x) // COUNT(x) AS BIGINT) AS a
  FROM e GROUP BY 1),
d AS (
  SELECT e.g, CAST(e.x - anch.a AS BIGINT) AS dd
  FROM e JOIN anch ON e.g = anch.g),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(dd AS HUGEINT)) AS d1,
         SUM(CAST(dd * dd AS HUGEINT)) AS d2,
         SUM(CAST(dd * dd AS HUGEINT) * CAST(dd AS HUGEINT)) AS d3,
         SUM(CAST(dd * dd AS HUGEINT)
             * CAST(dd * dd AS HUGEINT)) AS d4
  FROM d GROUP BY 1),
m AS (
  SELECT g, n, d1, d2,
         CAST(d2 AS DOUBLE) / {nd} - {delta} * {delta} AS m2,
         CAST(d3 AS DOUBLE) / {nd}
           - 3.0 * {delta} * (CAST(d2 AS DOUBLE) / {nd})
           + 2.0 * {delta} * {delta} * {delta} AS m3,
         CAST(d4 AS DOUBLE) / {nd}
           - 4.0 * {delta} * (CAST(d3 AS DOUBLE) / {nd})
           + 6.0 * {delta} * {delta} * (CAST(d2 AS DOUBLE) / {nd})
           - 3.0 * {delta} * {delta} * {delta} * {delta} AS m4
  FROM agg),
gg AS (
  SELECT g, n,
         CASE WHEN n >= 2 AND d2 * n > d1 * d1
              THEN m3 / (m2 * sqrt(m2)) END AS g1,
         CASE WHEN n >= 2 AND d2 * n > d1 * d1
              THEN m4 / (m2 * m2) - 3.0 END AS g2
  FROM m)
SELECT g AS event_type, n, g1, g2,
       CASE WHEN g1 IS NOT NULL
            THEN CAST(n AS DOUBLE) / 6.0
                 * (g1 * g1 + g2 * g2 / 4.0) END AS jb
FROM gg"""


CURATION_QUERIES["jarque_bera"] = (q_jarque_bera, sql_jarque_bera)


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity F across event types
    (operators/stats.py brown_forsythe): exact doubled-median centers,
    integer |deviations| floor-quantized to whole units (dev_quant=100
    — the one-signed-sum headroom knob), then the shared anova_f
    exact-moment machinery — the robust screen before anova_f/welch_t
    spread assumptions are trusted."""
    from .operators.stats import brown_forsythe

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    return brown_forsythe(ev, "event_type", "cents", dev_quant=100)


def sql_brown_forsythe() -> str:
    return f"""WITH e AS (
  SELECT event_type AS g, {_CENTS_SQL} AS x
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
r AS (
  SELECT g, x,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM e),
m AS (
  SELECT g,
         CASE WHEN COUNT(*) = 1 THEN SUM(x) * 2 ELSE SUM(x) END AS m2
  FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
  GROUP BY g),
z AS (
  SELECT e.g, abs(e.x * 2 - m.m2) // 100 AS z
  FROM e JOIN m ON e.g = m.g),
gg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(z) AS BIGINT) AS s_g,
         CAST(SUM(z * z) AS BIGINT) AS q_g
  FROM z GROUP BY 1),
t AS (SELECT n_g, s_g, q_g, (s_g * s_g) // n_g AS t_g FROM gg),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q,
         CAST(SUM(t_g) AS BIGINT) AS t
  FROM t),
fin AS (
  SELECT n, k,
         GREATEST(CAST(0 AS BIGINT), t - (s * s) // n) AS ssb_q,
         q - t AS ssw_q
  FROM tot)
SELECT n, k, ssb_q, ssw_q,
       CASE WHEN k > 1 AND ssw_q > 0
            THEN (CAST(ssb_q AS DOUBLE) * CAST(n - k AS DOUBLE))
                 / (CAST(ssw_q AS DOUBLE) * CAST(k - 1 AS DOUBLE))
       END AS f_stat
FROM fin"""


CURATION_QUERIES["brown_forsythe"] = (q_brown_forsythe,
                                      sql_brown_forsythe)


def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test per event type over the event stream
    (operators/rankstats.py pettitt_test): doubled tie-corrected ranks
    make U_t = cumsum(r2) − t(n+1) exact longs; the argmax is pinned
    (max |U|, ties → smallest t) — "did this metric's level shift,
    and when".  Groups past the exact rank bound pre-sample upstream
    (the kendall_tau recipe)."""
    from .operators.rankstats import pettitt_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    return pettitt_test(ev, ["event_type"], ["us", "event_id"], "cents")


def sql_pettitt_test() -> str:
    return f"""WITH e AS (
  SELECT event_type AS g, epoch_us(ts) AS o0, event_id AS o1,
         {_CENTS_SQL} AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL),
r AS (
  SELECT g, o0, o1,
         RANK() OVER (PARTITION BY g ORDER BY v NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY g, v) - 1 AS r2,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM e),
c AS (
  SELECT g, n,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY o0, o1) AS t,
         SUM(r2) OVER (PARTITION BY g ORDER BY o0, o1
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS w2
  FROM r),
u AS (
  SELECT g, n, CAST(t AS BIGINT) AS t,
         CAST(w2 - t * (n + 1) AS BIGINT) AS u
  FROM c WHERE t < n),
p AS (
  SELECT g, n, t, u,
         ROW_NUMBER() OVER (PARTITION BY g
                            ORDER BY abs(u) DESC, t) AS pk
  FROM u)
SELECT g AS event_type, n, t AS t_star, u AS u_at_t, abs(u) AS k_stat
FROM p WHERE pk = 1"""


CURATION_QUERIES["pettitt_test"] = (q_pettitt_test, sql_pettitt_test)


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman blocked rank test — do event types differ in daily
    revenue, judged WITHIN each day (operators/rankstats.py
    friedman_test)?  Blocks are UTC days (all 30 complete at every
    sf), treatments the event types, value the exact daily cents sum;
    doubled ranks keep numerator and denominator exact int64 — the
    repeated-measures sibling of the kruskal_wallis gate."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import friedman_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  86_400_000_000).alias("day"),
        "event_type", _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    daily = ev.groupBy("day", "event_type").agg(
        F.sum("cents").alias("v"))
    return friedman_test(daily, "day", "event_type", "v")


def sql_friedman_test() -> str:
    return f"""WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS b, event_type AS t,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS kk FROM e),
cb AS (
  SELECT b FROM e CROSS JOIN k
  GROUP BY b, kk
  HAVING COUNT(DISTINCT t) = kk AND COUNT(*) = kk),
r AS (
  SELECT e.t,
         RANK() OVER (PARTITION BY e.b ORDER BY e.v NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY e.b, e.v) - 1 AS r2
  FROM e JOIN cb ON e.b = cb.b),
pt AS (
  SELECT t, CAST(SUM(r2) AS BIGINT) AS R2,
         CAST(SUM(r2 * r2) AS BIGINT) AS rsq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM r GROUP BY 1),
kc AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk2 FROM pt),
tot AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
         CAST(MAX(kk2) AS BIGINT) AS k,
         CAST(SUM(rsq) AS BIGINT) AS allrsq,
         CAST(SUM((R2 - n * (kk2 + 1)) * (R2 - n * (kk2 + 1)))
              AS BIGINT) AS sq
  FROM pt CROSS JOIN kc)
SELECT n_blocks, k,
       CAST((k - 1) * sq AS BIGINT) AS num,
       CAST(allrsq - n_blocks * k * (k + 1) * (k + 1) AS BIGINT)
         AS den,
       CASE WHEN allrsq - n_blocks * k * (k + 1) * (k + 1) > 0
            THEN CAST((k - 1) * sq AS DOUBLE)
                 / CAST(allrsq - n_blocks * k * (k + 1) * (k + 1)
                        AS DOUBLE)
       END AS q_stat
FROM tot"""


CURATION_QUERIES["friedman_test"] = (q_friedman_test, sql_friedman_test)


def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-binary test per user cohort (operators/stats.py
    mcnemar_test): subject = user-WEEK (whole-history presence is
    degenerate — every user eventually fires every type), paired
    readings = "purchased that week" vs "hit an error that week" —
    only the discordant counts b01/b10 enter, one exact aggregation +
    one pinned division."""
    from .geo.tilemath import floor_div
    from .operators.stats import mcnemar_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_subj = ev.groupBy(
        "user_id",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  604_800_000_000).alias("wk")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("a"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .alias("b"))
    subj = per_subj.select(
        F.pmod(F.col("user_id"), F.lit(3)).cast("long").alias("cohort"),
        "a", "b")
    return mcnemar_test(subj, ["cohort"], "a", "b")


def sql_mcnemar_test() -> str:
    return """WITH per_subj AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT CAST(user_id % 3 AS BIGINT) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b01,
         CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS b10
  FROM per_subj GROUP BY 1)
SELECT cohort, n, b01, b10,
       CASE WHEN b01 + b10 > 0 THEN
         CAST(b01 - b10 AS DOUBLE) * CAST(b01 - b10 AS DOUBLE)
           / CAST(b01 + b10 AS DOUBLE) END AS chi2
FROM agg"""


CURATION_QUERIES["mcnemar_test"] = (q_mcnemar_test, sql_mcnemar_test)


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q per user cohort (operators/stats.py cochran_q):
    blocks = user-WEEKS (whole-history presence is all-ones —
    degenerate), treatments = event types, outcome = "user fired that
    type that week" — the sparse presence relation straight from one
    distinct, exact int64 numerator/denominator, one pinned divide."""
    from .geo.tilemath import floor_div
    from .operators.stats import cochran_q

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(F.col("user_id"), F.lit(3)).cast("long").alias("cohort"),
        F.concat_ws(
            "#", F.col("user_id").cast("string"),
            floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                      604_800_000_000).cast("string")).alias("blk"),
        "event_type")
    return cochran_q(ev, ["cohort"], "blk", "event_type")


def sql_cochran_q() -> str:
    return """WITH d AS (
  SELECT DISTINCT CAST(user_id % 3 AS BIGINT) AS cohort,
         CAST(user_id AS VARCHAR) || '#'
           || CAST(epoch_us(ts) // 604800000000 AS VARCHAR) AS b,
         event_type AS t
  FROM events),
bt AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(cj) AS BIGINT) AS t,
         CAST(SUM(cj * cj) AS BIGINT) AS scj2
  FROM (SELECT cohort, t, CAST(COUNT(*) AS BIGINT) AS cj
        FROM d GROUP BY 1, 2) GROUP BY cohort),
bb AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(ri * ri) AS BIGINT) AS sri2
  FROM (SELECT cohort, b, CAST(COUNT(*) AS BIGINT) AS ri
        FROM d GROUP BY 1, 2) GROUP BY cohort)
SELECT bt.cohort, bb.n_blocks, bt.k, bt.t,
       CAST((bt.k - 1) * (bt.k * bt.scj2 - bt.t * bt.t) AS BIGINT)
         AS num,
       CAST(bt.k * bt.t - bb.sri2 AS BIGINT) AS den,
       CASE WHEN bt.k * bt.t - bb.sri2 > 0 THEN
         CAST((bt.k - 1) * (bt.k * bt.scj2 - bt.t * bt.t) AS DOUBLE)
           / CAST(bt.k * bt.t - bb.sri2 AS DOUBLE) END AS q_stat
FROM bt JOIN bb ON bb.cohort = bt.cohort"""


CURATION_QUERIES["cochran_q"] = (q_cochran_q, sql_cochran_q)


def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's k-sample median test over event values (operators/stats.py
    mood_median): exact lower grand median from the distinct-cents
    table, then the chi_square_independence exact-numerator pinned
    chain on the event_type × above-median table."""
    from .operators.stats import mood_median

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents().alias("cents"))
    return mood_median(ev, "event_type", "cents")


def sql_mood_median() -> str:
    return f"""WITH src AS (
  SELECT event_type AS s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
cnt AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM src GROUP BY 1),
cum AS (
  SELECT v,
         CAST(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cm,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM cnt),
med AS (SELECT MIN(v) AS median FROM cum
        WHERE cm * 2 >= n + (n % 2)),
e AS (
  SELECT src.s AS a,
         CASE WHEN src.cents > med.median THEN 1 ELSE 0 END AS b
  FROM src CROSS JOIN med),
{_CHI2_CTES_SQL},
chi AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS n_samples,
         CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
              AS BIGINT) AS dof,
         CASE WHEN (COUNT(DISTINCT a) - 1)
                   * (COUNT(DISTINCT b) - 1) > 0
              THEN {_CHI2_FOLD_SQL}
              END AS chi2
  FROM terms)
SELECT med.median, chi.n, chi.n_samples, chi.dof, chi.chi2
FROM chi CROSS JOIN med"""


CURATION_QUERIES["mood_median"] = (q_mood_median, sql_mood_median)


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control per document source
    (operators/rankstats.py bh_fdr): micro-scaled rational p-values
    (planted signals on doc_id % 7 == 0, uniform nulls elsewhere),
    step-up threshold decided by pure int64 cross-multiplication —
    one group-keyed exchange, three windows, zero floats."""
    from .operators.rankstats import bh_fdr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.pmod(F.col("doc_id") * 48271, F.lit(1_000_000))
    sig = F.pmod(F.col("doc_id") * 31, F.lit(2_000))
    tests = docs.select(
        "source", "doc_id",
        F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0, sig)
        .otherwise(h).alias("p_micro"))
    return bh_fdr(tests, ["source"], "doc_id", "p_micro", 1_000_000)


def sql_bh_fdr() -> str:
    return """WITH tests AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % 7 = 0 THEN (doc_id * 31) % 2000
              ELSE (doc_id * 48271) % 1000000 END AS p_num
  FROM documents),
ranked AS (
  SELECT source, doc_id AS id, p_num,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY p_num, doc_id) AS k,
         COUNT(*) OVER (PARTITION BY source) AS m
  FROM tests),
flagged AS (
  SELECT *, MAX(CASE WHEN p_num * 100 * m <= 5 * k * 1000000
                     THEN k END)
              OVER (PARTITION BY source) AS kstar
  FROM ranked)
SELECT source, id, p_num, k, m,
       CASE WHEN k <= COALESCE(kstar, 0) THEN 1 ELSE 0 END AS rejected
FROM flagged"""


CURATION_QUERIES["bh_fdr"] = (q_bh_fdr, sql_bh_fdr)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment pairs on the 300-doc verifier slice
    (operators/dedup.py containment_pairs): |A∩B|/|A| finds
    quote-inclusion relations Jaccard dilutes — exact integer
    inter/sizes, one division, same first-token blocking + loud
    max_block cap as the Jaccard verifier."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    pairs = dedup.containment_pairs(docs, shingle_n=2, threshold=0.2,
                                    max_block=64)
    return pairs.select("id_a", "id_b", "inter", "size_a", "size_b",
                        F.round("containment", 6).alias("containment"))


def sql_containment_pairs() -> str:
    return """
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
        HAVING COUNT(*) <= 64) ok USING (blk)
)
SELECT id_a, id_b, inter, size_a, size_b,
       ROUND(containment, 6) AS containment
FROM (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(LEN(list_intersect(a.shingles, b.shingles)) AS BIGINT)
           AS inter,
         CAST(LEN(a.shingles) AS BIGINT) AS size_a,
         CAST(LEN(b.shingles) AS BIGINT) AS size_b,
         CASE WHEN LEN(a.shingles) > 0 THEN
           CAST(LEN(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / LEN(a.shingles)
         ELSE 0.0 END AS containment
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.id <> b.id
) WHERE containment >= 0.2"""


CURATION_QUERIES["containment_pairs"] = (q_containment_pairs,
                                         sql_containment_pairs)


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 3-gram overlap matrix
    (operators/dedup.py source_overlap): shared distinct-shingle
    counts per source pair via one gram-key equi-join — postings per
    gram bounded by the source count, so no quadratic hazard; the
    contamination/mirror triage view over corpus shards."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.source_overlap(docs, shingle_n=3)
    return out.select("src_a", "src_b", "shared", "n_a", "n_b",
                      F.round("jaccard", 6).alias("jaccard"))


def sql_source_overlap() -> str:
    return """
WITH base AS (
  SELECT source,
         REGEXP_SPLIT_TO_ARRAY(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ') AS words
  FROM documents),
sh AS (
  SELECT source,
         list_distinct([array_to_string(words[i+1:i+3], ' ')
                        FOR i IN RANGE(0, GREATEST(LEN(words) - 3, 0) + 1)])
           AS shingles
  FROM base),
g AS (SELECT DISTINCT src, g
      FROM (SELECT source AS src, unnest(shingles) AS g FROM sh)),
sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
shared AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM g a JOIN g b ON a.g = b.g AND a.src < b.src
  GROUP BY 1, 2)
SELECT src_a, src_b, shared, sa.n AS n_a, sb.n AS n_b,
       ROUND(CASE WHEN sa.n + sb.n - shared > 0 THEN
               CAST(shared AS DOUBLE)
               / CAST(sa.n + sb.n - shared AS DOUBLE)
             ELSE 0.0 END, 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.src = src_a
JOIN sizes sb ON sb.src = src_b"""


CURATION_QUERIES["source_overlap"] = (q_source_overlap,
                                      sql_source_overlap)


def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein distance between the purchase and error value
    distributions (operators/rankstats.py wasserstein_1d): exact
    cross-multiplied mass terms on the merged cents grid — the
    integral drift measure beside ks_test's supremum."""
    from .operators.rankstats import wasserstein_1d

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents().alias("cents"))
    return wasserstein_1d(ev, "event_type", "cents",
                          "purchase", "error")


def sql_wasserstein_1d() -> str:
    return f"""WITH base AS (
  SELECT {_CENTS_SQL} AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS b
  FROM events WHERE event_type IN ('purchase', 'error')),
per_v AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
                 CAST(SUM(b) AS BIGINT) AS cb
          FROM base GROUP BY 1),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumb,
         LEAD(v) OVER (ORDER BY v) - v AS gap
  FROM per_v),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
               CAST(SUM(b) AS BIGINT) AS n_b FROM base)
SELECT n_a, n_b,
       CAST(COALESCE(SUM(ABS(cuma * n_b - cumb * n_a) * gap), 0)
            AS BIGINT) AS w1_num,
       CAST(n_a * n_b AS BIGINT) AS w1_den,
       CASE WHEN n_a * n_b > 0 THEN
         CAST(COALESCE(SUM(ABS(cuma * n_b - cumb * n_a) * gap), 0)
              AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
       END AS w1
FROM cum CROSS JOIN tot
WHERE gap IS NOT NULL
GROUP BY n_a, n_b"""


CURATION_QUERIES["wasserstein_1d"] = (q_wasserstein_1d,
                                      sql_wasserstein_1d)


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α over three integer document-quality items — char
    count, space-token count, 'e' count (operators/stats.py
    cronbach_alpha): do the heuristics measure one underlying
    "document size" trait?  Exact shared-denominator moment rational
    plus the pinned double."""
    from .operators.stats import cronbach_alpha

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    items = docs.select(
        F.length("text").cast("long").alias("i1"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("i2"),
        (F.length("text")
         - F.length(F.regexp_replace(F.col("text"), "e", "")))
        .cast("long").alias("i3"))
    return cronbach_alpha(items, ["i1", "i2", "i3"])


def sql_cronbach_alpha() -> str:
    return """WITH items AS (
  SELECT CAST(LEN(text) AS BIGINT) AS i1,
         CAST(LEN(str_split(text, ' ')) AS BIGINT) AS i2,
         CAST(LEN(text) - LEN(REPLACE(text, 'e', '')) AS BIGINT) AS i3
  FROM documents),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i1) AS BIGINT) AS s1, CAST(SUM(i1*i1) AS BIGINT) AS ss1,
         CAST(SUM(i2) AS BIGINT) AS s2, CAST(SUM(i2*i2) AS BIGINT) AS ss2,
         CAST(SUM(i3) AS BIGINT) AS s3, CAST(SUM(i3*i3) AS BIGINT) AS ss3,
         CAST(SUM(i1+i2+i3) AS BIGINT) AS st,
         CAST(SUM((i1+i2+i3)*(i1+i2+i3)) AS BIGINT) AS stt
  FROM items)
SELECT n AS n_subjects, CAST(3 AS BIGINT) AS k_items,
       CAST((n*ss1 - s1*s1) + (n*ss2 - s2*s2) + (n*ss3 - s3*s3)
            AS BIGINT) AS var_items_num,
       CAST(n*stt - st*st AS BIGINT) AS var_total_num,
       CAST(3 * ((n*stt - st*st)
                 - ((n*ss1 - s1*s1) + (n*ss2 - s2*s2)
                    + (n*ss3 - s3*s3))) AS BIGINT) AS alpha_num,
       CAST(2 * (n*stt - st*st) AS BIGINT) AS alpha_den,
       CASE WHEN 2 * (n*stt - st*st) > 0 THEN
         CAST(3 * ((n*stt - st*st)
                   - ((n*ss1 - s1*s1) + (n*ss2 - s2*s2)
                      + (n*ss3 - s3*s3))) AS DOUBLE)
         / CAST(2 * (n*stt - st*st) AS DOUBLE)
       END AS alpha
FROM m"""


CURATION_QUERIES["cronbach_alpha"] = (q_cronbach_alpha,
                                      sql_cronbach_alpha)


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of document lengths per source
    (operators/stats.py theil_index): µ-nat-quantized x·ln(x) sums
    exact, one pinned tail — the decomposable complement of
    gini_profile."""
    from .operators.stats import theil_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return theil_index(docs.select("source", "n_chars"),
                       ["source"], "n_chars")


def sql_theil_index() -> str:
    return """WITH q AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS qln
  FROM documents),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * qln) AS BIGINT) AS sum_x_qln
  FROM q GROUP BY 1)
SELECT source, n, s, sum_x_qln,
       CASE WHEN s > 0 THEN
         CAST(sum_x_qln AS DOUBLE) / (CAST(s AS DOUBLE) * 1000000.0)
         - ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       END AS theil
FROM agg"""


CURATION_QUERIES["theil_index"] = (q_theil_index, sql_theil_index)


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V, document source × language (operators/stats.py
    cramers_v): the [0,1] effect size on top of the exact-numerator
    χ² fold — is language mix associated with source?"""
    from .operators.stats import cramers_v

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cramers_v(docs.select("source", "lang"), "source", "lang")


def sql_cramers_v() -> str:
    return f"""WITH e AS (
  SELECT source AS a, lang AS b
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL),
{_CHI2_CTES_SQL},
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
         CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
              AS BIGINT) AS dof,
         CASE WHEN (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) > 0
              THEN {_CHI2_FOLD_SQL}
              END AS chi2
  FROM terms)
SELECT n, n_a, n_b, dof, chi2,
       CASE WHEN chi2 IS NOT NULL
                 AND LEAST(n_a - 1, n_b - 1) > 0 AND n > 0
            THEN sqrt(chi2 / (CAST(n AS DOUBLE)
                              * CAST(LEAST(n_a - 1, n_b - 1)
                                     AS DOUBLE)))
       END AS v
FROM agg"""


CURATION_QUERIES["cramers_v"] = (q_cramers_v, sql_cramers_v)


def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 effect sizes over orders (operators/stats.py odds_ratio):
    exposure = urgent/high priority, outcome = status 'F' — OR, RR,
    risk difference as single divisions over exact int64 cells."""
    from .operators.stats import odds_ratio

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
               F.lit(1)).otherwise(F.lit(0)).alias("exposed"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0)).alias("outcome"))
    return odds_ratio(orders, "exposed", "outcome")


def sql_odds_ratio() -> str:
    return """WITH f AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS e,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o
  FROM orders),
cells AS (
  SELECT CAST(SUM(e * o) AS BIGINT) AS a,
         CAST(SUM(e * (1 - o)) AS BIGINT) AS b,
         CAST(SUM((1 - e) * o) AS BIGINT) AS c,
         CAST(SUM((1 - e) * (1 - o)) AS BIGINT) AS d
  FROM f)
SELECT a, b, c, d,
       CASE WHEN b * c > 0 THEN CAST(a * d AS DOUBLE)
            / CAST(b * c AS DOUBLE) END AS odds_ratio,
       CASE WHEN c > 0 AND a + b > 0 AND c + d > 0
            THEN CAST(a * (c + d) AS DOUBLE)
                 / CAST(c * (a + b) AS DOUBLE) END AS rel_risk,
       CASE WHEN a + b > 0 AND c + d > 0
            THEN CAST(a * (c + d) - c * (a + b) AS DOUBLE)
                 / CAST((a + b) * (c + d) AS DOUBLE) END AS risk_diff,
       CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
            THEN sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                      + 1.0 / CAST(c AS DOUBLE)
                      + 1.0 / CAST(d AS DOUBLE)) END AS ln_or_se
FROM cells"""


CURATION_QUERIES["odds_ratio"] = (q_odds_ratio, sql_odds_ratio)


_FH_BUCKETS = 64
_FH_SALT = "fh1"


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text features (operators/ml.py feature_hashing):
    md5-u60 slot + sign per token over the shared word normalization,
    sparse COO output — the vocabulary-free vectorizer."""
    from .operators.ml import feature_hashing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return feature_hashing(docs, _FH_BUCKETS, salt=_FH_SALT)


def sql_feature_hashing() -> str:
    return f"""WITH {_WORDS_SQL},
tok AS (SELECT doc_id, unnest(words) AS w FROM base),
cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2),
h AS (
  SELECT doc_id, c,
         CAST(('0x' || substr(md5(concat_ws(chr(31), '{_FH_SALT}', w)),
                              1, 15)) AS BIGINT) AS u
  FROM cnt)
SELECT doc_id, u % {_FH_BUCKETS} AS bucket,
       CAST(SUM((1 - 2 * ((u // {_FH_BUCKETS}) % 2)) * c) AS BIGINT)
         AS feat,
       CAST(SUM(c) AS BIGINT) AS n_tokens
FROM h GROUP BY 1, 2"""


CURATION_QUERIES["feature_hashing"] = (q_feature_hashing,
                                       sql_feature_hashing)


def q_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Cramér-von Mises statistic, weekend vs weekday
    value distributions (operators/rankstats.py cvm_2samp): the
    squared-integral companion of the ks_test sup and the
    wasserstein_1d first-power integral — S = Σ w·(n2·C1 − n1·C2)²
    exact in DECIMAL(38), one pinned normalization."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import cvm_2samp

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            86_400_000_000) + 4, F.lit(7)).isin(0, 6).alias("wknd"),
        _cents().alias("cents"))
    return cvm_2samp(ev, ["event_type"], "wknd", "cents")


def sql_cvm_test() -> str:
    return """WITH e AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000 + 4) % 7) IN (0, 6) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
g AS (
  SELECT event_type, cents,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM e GROUP BY 1, 2),
s AS (
  SELECT event_type, c1 + c2 AS w,
         CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
         CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2,
         CAST(SUM(c1) OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g),
agg AS (
  SELECT event_type, MAX(n1) AS n1, MAX(n2) AS n2,
         SUM(CAST((n2 * cum1 - n1 * cum2) * (n2 * cum1 - n1 * cum2)
                  AS HUGEINT) * CAST(w AS HUGEINT)) AS s_num
  FROM s GROUP BY event_type)
SELECT event_type, n1, n2, CAST(s_num AS DECIMAL(38, 0)) AS s_num,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN CAST(s_num AS DOUBLE)
                 / (CAST(n1 * n2 AS DOUBLE)
                    * CAST(n1 + n2 AS DOUBLE)
                    * CAST(n1 + n2 AS DOUBLE))
       END AS cvm
FROM agg"""


CURATION_QUERIES["cvm_test"] = (q_cvm_test, sql_cvm_test)


def q_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test of the event value stream per
    type (operators/stats.py turning_points): exact strict-extrema
    count vs the i.i.d. 2(n−2)/3 expectation, integer-numerator z."""
    from .operators.stats import turning_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_type", "ts", "event_id",
                _cents().alias("cents"))
    return turning_points(ev, ["event_type"],
                          order_cols=("ts", "event_id"),
                          value_col="cents")


def sql_turning_points() -> str:
    return """WITH e AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         ts, event_id
  FROM events WHERE value IS NOT NULL),
t AS (
  SELECT event_type,
         CASE WHEN (lag(v) OVER w < v AND lead(v) OVER w < v)
                OR (lag(v) OVER w > v AND lead(v) OVER w > v)
              THEN 1 ELSE 0 END AS turn
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(turn) AS BIGINT) AS t_count
  FROM t GROUP BY 1)
SELECT event_type, n, t_count,
       CASE WHEN n >= 3 AND 16 * n - 29 > 0
            THEN CAST(3 * t_count - 2 * (n - 2) AS DOUBLE)
                 / (3.0 * sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0))
       END AS z
FROM agg"""


CURATION_QUERIES["turning_points"] = (q_turning_points,
                                      sql_turning_points)


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D of time-of-day on event value per event type
    (operators/rankstats.py somers_d): does the value cents PREDICT
    the time of day — the asymmetric companion to the kendall_tau
    gate, sharing its exact pair-concordance substrate and the same
    deterministic 1/16 event-id pre-sample (exact pair counts are
    O(n²/group); sample-then-rank is the operator's documented
    guidance for big groups, in-cap through sf1.0)."""
    from .operators.rankstats import somers_d

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.pmod(F.col("event_id"), F.lit(16)) == 0).select(
        "event_type",
        _cents().alias("cents"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         % (86_400 * 1_000_000)).alias("day_us"))
    return somers_d(ev, ["event_type"], "cents", "day_us")


def sql_somers_d() -> str:
    return """WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         epoch_us(ts) % 86400000000 AS y
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL AND event_id % 16 = 0),
r AS (
  SELECT event_type, x, y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY x NULLS FIRST, y NULLS FIRST) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e),
p AS (
  SELECT a.event_type AS event_type,
         CAST(MAX(a.n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS txy
  FROM r a JOIN r b ON a.event_type = b.event_type AND a.i < b.i
  GROUP BY a.event_type)
SELECT event_type, n, c - d AS c_minus_d,
       (n * (n - 1)) // 2 - tx AS pairs_x,
       (n * (n - 1)) // 2 - ty AS pairs_y,
       c + d AS pairs_cd,
       txy AS t_both,
       CASE WHEN (n * (n - 1)) // 2 - tx > 0
            THEN CAST(c - d AS DOUBLE)
                 / CAST((n * (n - 1)) // 2 - tx AS DOUBLE) END AS d_yx,
       CASE WHEN (n * (n - 1)) // 2 - ty > 0
            THEN CAST(c - d AS DOUBLE)
                 / CAST((n * (n - 1)) // 2 - ty AS DOUBLE) END AS d_xy,
       CASE WHEN c + d > 0
            THEN CAST(c - d AS DOUBLE)
                 / CAST(c + d AS DOUBLE) END AS gamma
FROM p"""


CURATION_QUERIES["somers_d"] = (q_somers_d, sql_somers_d)


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon drift between the language mixes of the two
    doc-id-parity shards of every source (operators/stats.py
    js_divergence): the bounded symmetric drift measure a curation
    pipeline runs between two snapshots or shards — exact integer
    count ratios inside every ln, pinned category-ordered folds."""
    from .operators.stats import js_divergence

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("lang").isNotNull())
            .select("source",
                    (F.pmod(F.col("doc_id"), F.lit(2)) == 0).alias("flag"),
                    "lang"))
    return js_divergence(docs, ["source"], "flag", "lang")


def sql_js_divergence() -> str:
    return """WITH cell AS (
  SELECT source, lang AS cat,
         CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM documents WHERE lang IS NOT NULL
  GROUP BY 1, 2),
tot AS (
  SELECT source, cat, a, b,
         SUM(a) OVER (PARTITION BY source) AS ta,
         SUM(b) OVER (PARTITION BY source) AS tb
  FROM cell),
terms AS (
  SELECT source, cat, a, b, ta, tb,
         CASE WHEN a > 0
              THEN CAST(a AS DOUBLE)
                   * ln(CAST(2 * a * tb AS DOUBLE)
                        / CAST(a * tb + b * ta AS DOUBLE))
              ELSE 0.0 END AS t1,
         CASE WHEN b > 0
              THEN CAST(b AS DOUBLE)
                   * ln(CAST(2 * b * ta AS DOUBLE)
                        / CAST(a * tb + b * ta AS DOUBLE))
              ELSE 0.0 END AS t2
  FROM tot),
agg AS (
  SELECT source,
         CAST(MAX(ta) AS BIGINT) AS n_a,
         CAST(MAX(tb) AS BIGINT) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_cats,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(t1 ORDER BY cat NULLS FIRST)),
                     (acc, x) -> acc + x) AS s1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(t2 ORDER BY cat NULLS FIRST)),
                     (acc, x) -> acc + x) AS s2
  FROM terms GROUP BY source)
SELECT source, n_a, n_b, n_cats,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN s1 / CAST(2 * n_a AS DOUBLE)
                 + s2 / CAST(2 * n_b AS DOUBLE) END AS jsd,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN sqrt(greatest(s1 / CAST(2 * n_a AS DOUBLE)
                               + s2 / CAST(2 * n_b AS DOUBLE),
                               CAST(0.0 AS DOUBLE))) END AS js_dist
FROM agg"""


CURATION_QUERIES["js_divergence"] = (q_js_divergence, sql_js_divergence)


def q_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered trend over daily per-type revenue
    (operators/rankstats.py page_trend): same blocks (UTC days) and
    treatments (event types, alphabetical order as the prespecified
    hypothesis) as the friedman_test gate — the directional sibling:
    do the types' daily-revenue ranks climb in label order?  Exact
    L2/E2 longs, the tie-corrected permutation variance sharing
    Friedman's spread term, one pinned z."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import page_trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  86_400_000_000).alias("day"),
        "event_type", _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    daily = ev.groupBy("day", "event_type").agg(
        F.sum("cents").alias("v"))
    return page_trend(daily, "day", "event_type", "v")


def sql_page_trend() -> str:
    return f"""WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS b, event_type AS t,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS kk FROM e),
cb AS (
  SELECT b FROM e CROSS JOIN k
  GROUP BY b, kk
  HAVING COUNT(DISTINCT t) = kk AND COUNT(*) = kk),
r AS (
  SELECT e.t,
         RANK() OVER (PARTITION BY e.b ORDER BY e.v NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY e.b, e.v) - 1 AS r2
  FROM e JOIN cb ON e.b = cb.b),
pt AS (
  SELECT t, CAST(SUM(r2) AS BIGINT) AS R2,
         CAST(SUM(r2 * r2) AS BIGINT) AS rsq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM r GROUP BY 1),
pc AS (
  SELECT t, R2, rsq, n,
         CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS cj
  FROM pt),
tot AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_blocks,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(cj * R2) AS BIGINT) AS l2,
         CAST(SUM(rsq) AS BIGINT) AS allrsq
  FROM pc)
SELECT n_blocks, k, l2,
       n_blocks * (k * (k + 1) // 2) * (k + 1) AS e2,
       k * (k + 1) * (allrsq - n_blocks * k * (k + 1) * (k + 1))
         AS var_num,
       CASE WHEN k >= 2
             AND allrsq - n_blocks * k * (k + 1) * (k + 1) > 0
            THEN CAST(l2 - n_blocks * (k * (k + 1) // 2) * (k + 1)
                      AS DOUBLE)
                 / sqrt(CAST(k * (k + 1)
                             * (allrsq - n_blocks * k * (k + 1)
                                * (k + 1)) AS DOUBLE) / 12.0)
       END AS z
FROM tot"""


CURATION_QUERIES["page_trend"] = (q_page_trend, sql_page_trend)


def q_storey_qvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storey q-values per document source (operators/rankstats.py
    storey_qvalue) on the SAME planted-signal p-values as the bh_fdr
    gate: π̂₀ from the flat tail above λ=1/2 as an exact rational,
    one pinned division per test, suffix-min coupling — the adaptive
    companion whose estimated null fraction the BH gate assumes to
    be 1."""
    from .operators.rankstats import storey_qvalue

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.pmod(F.col("doc_id") * 48271, F.lit(1_000_000))
    sig = F.pmod(F.col("doc_id") * 31, F.lit(2_000))
    tests = docs.select(
        "source", "doc_id",
        F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0, sig)
        .otherwise(h).alias("p_micro"))
    return storey_qvalue(tests, ["source"], "doc_id", "p_micro",
                         1_000_000)


def sql_storey_qvalue() -> str:
    return """WITH tests AS (
  SELECT source, doc_id,
         CASE WHEN doc_id % 7 = 0 THEN (doc_id * 31) % 2000
              ELSE (doc_id * 48271) % 1000000 END AS p_num
  FROM documents),
ranked AS (
  SELECT source, doc_id AS id, CAST(p_num AS BIGINT) AS p_num,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY p_num, doc_id) AS BIGINT)
           AS k,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN p_num * 2 > 1000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY source) AS BIGINT) * 2 AS t
  FROM tests),
pz AS (
  SELECT source, id, p_num, k, m,
         least(t, m) AS pi0_num, m AS pi0_den,
         CAST(least(t, m) * m * p_num AS DOUBLE)
           / CAST(m * CAST(1000000 AS BIGINT) * k AS DOUBLE) AS qr
  FROM ranked)
SELECT source, id, p_num, k, m, pi0_num, pi0_den,
       MIN(qr) OVER (PARTITION BY source ORDER BY k
                     ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS q
FROM pz"""


CURATION_QUERIES["storey_qvalue"] = (q_storey_qvalue,
                                     sql_storey_qvalue)


def q_seasonal_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend of daily revenue per event type
    (operators/rankstats.py seasonal_mann_kendall): seasons are
    weekdays, periods are ISO weeks — is revenue trending across
    weeks once the strong weekly cycle is blocked out?  Exact
    integer sign pairs and tie-corrected variance polynomials, one
    pinned continuity-corrected z."""
    from .geo.tilemath import floor_div
    from .operators.rankstats import seasonal_mann_kendall

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  86_400_000_000).alias("day"),
        _cents().alias("cents")).filter(
        F.col("event_type").isNotNull() & F.col("cents").isNotNull())
    daily = (ev.groupBy("event_type", "day")
             .agg(F.sum("cents").alias("v"))
             .select("event_type",
                     F.pmod(F.col("day") + 4, F.lit(7)).alias("dow"),
                     floor_div(F.col("day") + 4, 7).alias("week"),
                     "v"))
    return seasonal_mann_kendall(daily, ["event_type"],
                                 season_col="dow", t_col="week",
                                 value_col="v")


def sql_seasonal_mk() -> str:
    return f"""WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         {_CENTS_SQL} AS cents
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
daily AS (
  SELECT event_type, ((day + 4) % 7 + 7) % 7 AS dow,
         (day + 4) // 7 AS week,
         CAST(SUM(cents) AS BIGINT) AS v
  FROM e GROUP BY 1, 2, 3),
sp AS (
  SELECT a.event_type, a.dow,
         CAST(SUM(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END)
              AS BIGINT) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.dow = b.dow
   AND a.week < b.week
  GROUP BY 1, 2),
np AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n
  FROM daily GROUP BY 1, 2),
tt AS (
  SELECT event_type, dow,
         CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS t3
  FROM (SELECT event_type, dow, v, CAST(COUNT(*) AS BIGINT) AS tc
        FROM daily GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
per AS (
  SELECT np.event_type, np.dow, np.n, tt.t3,
         COALESCE(sp.s, 0) AS s,
         np.n * (np.n - 1) * (2 * np.n + 5) - tt.t3 AS vn
  FROM np JOIN tt USING (event_type, dow)
  LEFT JOIN sp USING (event_type, dow)),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_seasons,
         CAST(SUM(n) AS BIGINT) AS n_points,
         CAST(SUM(s) AS BIGINT) AS s_stat,
         CAST(SUM(vn) AS BIGINT) AS var18_num
  FROM per GROUP BY 1)
SELECT event_type, n_seasons, n_points, s_stat, var18_num,
       CASE WHEN var18_num > 0 THEN
         CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                   WHEN s_stat < 0 THEN s_stat + 1
                   ELSE 0 END AS DOUBLE)
         / sqrt(CAST(var18_num AS DOUBLE) / 18.0)
       END AS z
FROM tot"""


CURATION_QUERIES["seasonal_mk"] = (q_seasonal_mk, sql_seasonal_mk)


def q_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell correction of deterministically corrupted vocabulary
    (operators/text.py symspell_correct): lexicon = document term
    frequencies; every term of length ≥ 4 loses its 2nd character and
    must be recovered through the delete-1 variant equi-join +
    levenshtein verify, ranked (dist, freq desc, term)."""
    from .operators.text import symspell_correct

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (docs.select(F.explode(F.split(
        F.lower(F.col("text")), r"\s+")).alias("term"))
        .filter(F.length("term") >= 1))
    lex = words.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    qs = (lex.filter(F.length("term") >= 4)
          .select(F.col("term").alias("qid"),
                  F.concat(F.col("term").substr(F.lit(1), F.lit(1)),
                           F.col("term").substr(
                               F.lit(3), F.length("term")))
                  .alias("term")))
    return symspell_correct(qs, lex)


def sql_symspell() -> str:
    var = ("list_append(list_transform(range(1, length({c}) + 1), "
           "i -> concat(substr({c}, 1, i - 1), "
           "substr({c}, i + 1, length({c})))), {c})")
    return f"""WITH w AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS t
  FROM documents),
lex AS (
  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM w WHERE length(t) >= 1 GROUP BY t),
qs AS (
  SELECT term AS qid,
         concat(substr(term, 1, 1), substr(term, 3)) AS q
  FROM lex WHERE length(term) >= 4),
qv AS (
  SELECT qid, q, vt.v
  FROM qs, LATERAL (SELECT unnest({var.format(c='q')}) AS v) vt),
lv AS (
  SELECT term AS suggestion, freq, vt.v
  FROM lex, LATERAL (SELECT unnest({var.format(c='term')}) AS v) vt),
cand AS (
  SELECT DISTINCT qid, q, lv.suggestion, lv.freq
  FROM qv JOIN lv USING (v)),
ver AS (
  SELECT qid, q, suggestion, freq,
         CAST(levenshtein(q, suggestion) AS INTEGER) AS dist
  FROM cand WHERE levenshtein(q, suggestion) <= 1)
SELECT qid, q AS term, suggestion, dist, freq
FROM ver
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid, q
                           ORDER BY dist, freq DESC, suggestion) = 1"""


CURATION_QUERIES["symspell"] = (q_symspell, sql_symspell)


def q_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 between each document and its every-7th-word-dropped
    compression (operators/text.py rouge_n): clipped bigram matches,
    exact integer counts, F1 telescoped to 2m/(c+r) — the
    summarization-eval metric family beside map_mrr/ndcg."""
    from .operators.text import rouge_n

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                     lambda t: F.length(t) > 0)
    kept = F.filter(words, lambda w, i: F.pmod(i + 1, F.lit(7)) != 0)
    pairs = docs.select("doc_id",
                        F.array_join(kept, " ").alias("cand"),
                        F.col("text").alias("ref"))
    return rouge_n(pairs, 2)


def sql_rouge_overlap() -> str:
    return r"""WITH src AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> len(t) > 0) AS wr
  FROM documents),
pair AS (
  SELECT doc_id, wr,
         list_transform(list_filter(range(1, len(wr) + 1),
                                    i -> i % 7 != 0),
                        i -> wr[i]) AS wc
  FROM src),
cg AS (
  SELECT doc_id, t.g
  FROM pair, LATERAL (SELECT unnest(
    CASE WHEN len(wc) >= 2
         THEN list_transform(range(1, len(wc)),
                             i -> wc[i] || ' ' || wc[i + 1])
         ELSE [] END) AS g) t),
rg AS (
  SELECT doc_id, t.g
  FROM pair, LATERAL (SELECT unnest(
    CASE WHEN len(wr) >= 2
         THEN list_transform(range(1, len(wr)),
                             i -> wr[i] || ' ' || wr[i + 1])
         ELSE [] END) AS g) t),
cc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS nc
       FROM cg GROUP BY 1, 2),
rc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS nr
       FROM rg GROUP BY 1, 2),
j AS (
  SELECT coalesce(cc.doc_id, rc.doc_id) AS doc_id,
         coalesce(cc.nc, 0) AS nc, coalesce(rc.nr, 0) AS nr
  FROM cc FULL OUTER JOIN rc
    ON rc.doc_id = cc.doc_id AND rc.g = cc.g),
per AS (
  SELECT doc_id, SUM(least(nc, nr)) AS n_match,
         SUM(nc) AS n_cand, SUM(nr) AS n_ref
  FROM j GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(p.n_match, 0) AS n_match,
       coalesce(p.n_cand, 0) AS n_cand,
       coalesce(p.n_ref, 0) AS n_ref,
       CASE WHEN coalesce(p.n_cand, 0) > 0
            THEN CAST(p.n_match AS DOUBLE) / CAST(p.n_cand AS DOUBLE)
       END AS precision,
       CASE WHEN coalesce(p.n_ref, 0) > 0
            THEN CAST(p.n_match AS DOUBLE) / CAST(p.n_ref AS DOUBLE)
       END AS recall,
       CASE WHEN coalesce(p.n_cand, 0) > 0
                 AND coalesce(p.n_ref, 0) > 0
            THEN 2.0 * CAST(p.n_match AS DOUBLE)
                 / CAST(p.n_cand + p.n_ref AS DOUBLE)
       END AS f1
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per p ON p.doc_id = d.doc_id"""


CURATION_QUERIES["rouge_overlap"] = (q_rouge_overlap,
                                     sql_rouge_overlap)
