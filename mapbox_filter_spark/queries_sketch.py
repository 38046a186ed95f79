"""Gate query for bounded-memory heavy-hitter detection (operators/sketch.py).

Substrate: a deterministic skewed key over lineitem — ``floor(sqrt(fid %
10000))`` puts key j on ~(2j+1)/10000 of the rows, a linear-density skew
with keys 0..99.  ``sqrt`` of an integer < 2^52 is correctly rounded in
both engines (exact on perfect squares), so the binning is bit-identical.

The engine path runs the two-pass sketch (per-partition Misra–Gries →
exact recount of candidates); the oracle is a plain GROUP BY / HAVING with
the same integer-rational threshold ``ceil(3n/200)`` — a value-hash match
proves the sketch's candidate union lost no true heavy hitter AND the
recount threshold arithmetic agrees to the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sketch import heavy_hitters

_SHARE = (3, 200)  # 1.5% frequency threshold


def _skewed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return li.select(
        F.floor(F.sqrt(F.pmod(fid, F.lit(10000)))).alias("key"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(_skewed_keys(spark, sf_dir), "key", share=_SHARE)


def sql_heavy_hitters() -> str:
    num, den = _SHARE
    return f"""
WITH src AS (
  SELECT CAST(FLOOR(SQRT((l_orderkey * 10 + l_linenumber) % 10000))
              AS BIGINT) AS key
  FROM lineitem
), tot AS (SELECT COUNT(*) AS n FROM src)
SELECT key, COUNT(*) AS cnt
FROM src, tot
GROUP BY key, tot.n
HAVING COUNT(*) >= ({num} * tot.n + {den - 1}) // {den}"""


_KMV_K = 64
_KMV_SALT = "kmv"


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch (operators/sketch.py kmv_rows /
    kmv_estimate) per event_type over the cents-value domain, alongside
    the exact distinct count.  The sketch coordinate is the repo's
    deterministic 60-bit md5, so sketch contents, h_k, AND the
    (k−1)·2⁶⁰/h_k estimate are engine-exact — a value-hash-checkable
    approximate-distinct operator (HLL can't offer that)."""
    from .operators.sketch import kmv_estimate, kmv_rows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    rows = kmv_rows(ev, ["event_type"], ["cents"], _KMV_K, salt=_KMV_SALT)
    est = kmv_estimate(rows, ["event_type"], _KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("cents").alias("n_exact"))
    return est.join(exact, "event_type")


def sql_kmv_distinct() -> str:
    from .operators.splits import SCALE_U60

    k = _KMV_K
    u = repr(float(SCALE_U60))
    return f"""
WITH ev AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(concat_ws(chr(31), '{_KMV_SALT}',
              CAST(cents AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM ev
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
sk AS (
  SELECT event_type, COUNT(*) AS n_sketch, MAX(h) AS h_k
  FROM r WHERE rn <= {k} GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT cents) AS n_exact
  FROM ev GROUP BY event_type
)
SELECT s.event_type, s.n_sketch, s.h_k,
       CASE WHEN s.n_sketch < {k} THEN CAST(s.n_sketch AS DOUBLE)
            ELSE {float(k - 1)!r} * {u} / CAST(s.h_k AS DOUBLE)
       END AS est,
       e.n_exact
FROM sk s JOIN ex e USING (event_type)"""



_HLL_B = 8
_HLL_SALT = "hll-r5"


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event_type (operators/sketch.py
    hll_registers / hll_estimate) alongside the exact count.  Because
    the sketch coordinate is the repo's deterministic 60-bit md5 and the
    harmonic denominator is an exact integer, registers AND the estimate
    (including the linear-counting branch) are engine-exact — the whole
    sketch is value-hash checkable, like the KMV gate."""
    from .operators.sketch import hll_estimate, hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id")
    regs = hll_registers(ev, ["event_type"], ["user_id"], b=_HLL_B,
                         salt=_HLL_SALT)
    est = hll_estimate(regs, ["event_type"], b=_HLL_B)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return est.join(exact, "event_type")


def sql_hll_distinct() -> str:
    b = _HLL_B
    m = 1 << b
    width = 60 - b
    kk = width + 1
    # the SAME python float chain as operators/sketch.hll_estimate —
    # both engines receive the identical double literal
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(2 ** kk)
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(concat_ws(chr(31), '{_HLL_SALT}',
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM events),
rh AS (
  SELECT event_type, h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN {kk}
              ELSE {kk} - length(bin(h // {m})) END AS rho
  FROM h),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS reg
  FROM rh GROUP BY 1, 2),
agg AS (
  SELECT event_type, COUNT(*) AS m_used,
         CAST(SUM(CAST(1 AS BIGINT) << ({kk} - reg)) AS BIGINT) AS s_used
  FROM regs GROUP BY 1),
est AS (
  SELECT event_type, m_used, {m} - m_used AS v_zero,
         s_used + ({m} - m_used) * (CAST(1 AS BIGINT) << {kk})
           AS s_scaled
  FROM agg),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1)
SELECT e.event_type, e.m_used, e.v_zero, e.s_scaled,
       CASE WHEN {num!r} / CAST(e.s_scaled AS DOUBLE) <= {2.5 * m!r}
                 AND e.v_zero > 0
            THEN {float(m)!r} * ln({float(m)!r} / CAST(e.v_zero AS DOUBLE))
            ELSE {num!r} / CAST(e.s_scaled AS DOUBLE)
       END AS est_hll,
       x.n_exact
FROM est e JOIN ex x USING (event_type)"""



def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-bitmap exact distinct (operators/sketch.py
    bitmap_distinct): 64-bit word masks via bit_or, popcount distinct —
    the mergeable exact-compressed index for dense integer keys."""
    from .operators.sketch import bitmap_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id")
    return bitmap_distinct(ev, ["event_type"], "user_id")


def sql_bitmap_distinct() -> str:
    return """
WITH b AS (
  SELECT event_type, user_id // 63 AS bucket,
         CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT) AS bit
  FROM events),
m AS (SELECT event_type, bucket, bit_or(bit) AS mask
      FROM b GROUP BY 1, 2)
SELECT event_type, COUNT(*) AS n_buckets,
       CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct,
       MAX(bit_count(mask)) AS max_bucket_card
FROM m GROUP BY 1"""


_BLOOM_WORDS = 8          # 504 usable bits (63/word — sign-safe)
_BLOOM_K = 3
_BLOOM_SALT = "bloom-r5"


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning (operators/sketch.py bloom_build /
    bloom_prune): the 41 p_size=15 part keys become a 504-bit broadcast
    filter; every lineitem row is probed shuffle-free.  Per returnflag:
    total rows, bloom survivors, true members, and surviving members —
    a value-hash match proves the double-hash bit math AND the no-
    false-negative invariant (n_pass_member == n_member) to the row."""
    from .operators.sketch import bloom_build, bloom_prune

    dim = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_size") == 15).select("p_partkey")
    bloom = bloom_build(dim, "p_partkey", n_words=_BLOOM_WORDS,
                        k=_BLOOM_K, salt=_BLOOM_SALT)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_returnflag")
    flagged = bloom_prune(li, bloom, "l_partkey", n_words=_BLOOM_WORDS,
                          k=_BLOOM_K, salt=_BLOOM_SALT)
    mem = dim.distinct().withColumn("_m", F.lit(1))
    out = flagged.join(F.broadcast(mem),
                       flagged["l_partkey"] == mem["p_partkey"], "left")
    one = F.lit(1).cast("long")
    return (out.groupBy("l_returnflag")
            .agg(F.count(one).alias("n_rows"),
                 F.sum(F.when(F.col("bloom_pass"), one).otherwise(0))
                  .alias("n_pass"),
                 F.sum(F.when(F.col("_m").isNotNull(), one).otherwise(0))
                  .alias("n_member"),
                 F.sum(F.when(F.col("bloom_pass")
                              & F.col("_m").isNotNull(), one).otherwise(0))
                  .alias("n_pass_member")))


def sql_bloom_prune() -> str:
    nb = _BLOOM_WORDS * 63
    s = _BLOOM_SALT

    def h60(tag: str, key: str) -> str:
        return (f"CAST(('0x' || substr(md5(concat_ws(chr(31), '{s}-{tag}',"
                f" CAST({key} AS VARCHAR))), 1, 15)) AS BIGINT)")

    def pos(key: str) -> str:
        return (f"(({h60('a', key)} % {nb})"
                f" + i * (({h60('b', key)} % {nb - 1}) + 1)) % {nb}")

    return f"""
WITH ks AS (SELECT DISTINCT p_partkey AS key FROM part WHERE p_size = 15),
kpos AS (
  SELECT {pos('key')} AS p
  FROM ks CROSS JOIN (VALUES (0), (1), (2)) t(i)),
words AS (
  SELECT p // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS mask
  FROM kpos GROUP BY 1),
fk AS (SELECT DISTINCT l_partkey AS key FROM lineitem),
fpos AS (
  SELECT key, {pos('key')} AS p
  FROM fk CROSS JOIN (VALUES (0), (1), (2)) t(i)),
probe AS (
  SELECT fpos.key,
         bool_and(((COALESCE(w.mask, 0) >> CAST(fpos.p % 63 AS INT))
                   & 1) = 1) AS pass
  FROM fpos LEFT JOIN words w ON w.word = fpos.p // 63
  GROUP BY 1),
mem AS (SELECT key, TRUE AS is_mem FROM ks)
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN is_mem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_member,
       CAST(SUM(CASE WHEN pass AND is_mem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_member
FROM lineitem
JOIN probe ON probe.key = l_partkey
LEFT JOIN mem ON mem.key = l_partkey
GROUP BY 1"""


_CMS_D = 3
_CMS_W = 256
_CMS_SALT = "cms-r5"


def q_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries (operators/sketch.py
    cms_registers / cms_query) over a 400-key linear-skew substrate
    (``floor(sqrt(event_id mod 160000))``) squeezed into 3×256
    registers, joined to the exact counts.  400 keys in 256 columns
    force collisions, so est > exact for many keys — the value hash
    pins the whole register plane, the min-reduction, AND the
    upper-bound invariant cross-engine."""
    from .operators.sketch import cms_query, cms_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.sqrt(F.pmod(F.col("event_id"), F.lit(160000))))
        .alias("key"))
    regs = cms_registers(ev, "key", d=_CMS_D, w=_CMS_W, salt=_CMS_SALT)
    est = cms_query(regs, ev, "key", d=_CMS_D, w=_CMS_W, salt=_CMS_SALT)
    exact = ev.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    return est.join(exact, "key")


def sql_cms_estimate() -> str:
    d, w, s = _CMS_D, _CMS_W, _CMS_SALT
    ivals = ", ".join(f"({i})" for i in range(d))
    return f"""
WITH src AS (
  SELECT CAST(FLOOR(SQRT(event_id % 160000)) AS BIGINT) AS key
  FROM events),
cells AS (
  SELECT i,
         CAST(('0x' || substr(md5(concat_ws(chr(31), '{s}-' ||
              CAST(i AS VARCHAR), CAST(key AS VARCHAR))), 1, 15))
              AS BIGINT) % {w} AS col,
         key
  FROM src CROSS JOIN (VALUES {ivals}) t(i)),
regs AS (
  SELECT i, col, COUNT(*) AS reg FROM cells GROUP BY 1, 2),
pq AS (SELECT DISTINCT i, col, key FROM cells)
SELECT pq.key, CAST(MIN(r.reg) AS BIGINT) AS est,
       (SELECT COUNT(*) FROM src WHERE src.key = pq.key) AS n_exact
FROM pq JOIN regs r USING (i, col)
GROUP BY 1"""


SKETCH_QUERIES = {
    "heavy_hitters": (q_heavy_hitters, sql_heavy_hitters),
    "kmv_distinct": (q_kmv_distinct, sql_kmv_distinct),
    "hll_distinct": (q_hll_distinct, sql_hll_distinct),
    "bitmap_distinct": (q_bitmap_distinct, sql_bitmap_distinct),
    "bloom_prune": (q_bloom_prune, sql_bloom_prune),
    "cms_estimate": (q_cms_estimate, sql_cms_estimate),
}


_AMS_S = 16
_AMS_SALT = "ams"


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch over the events user-id stream
    (operators/sketch.py ams_registers / ams_f2_estimate) next to the
    exact second frequency moment Σf²: ±1 md5-parity signs, exact
    integer registers mergeable by SUM, lower-median-of-squares
    estimate — the fixed-memory self-join-size probe, value-hashable
    end to end (same contract as the kmv_distinct gate)."""
    from .operators.sketch import ams_f2_estimate, ams_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("k"))
    est = ams_f2_estimate(
        ams_registers(ev, "k", s=_AMS_S, salt=_AMS_SALT), s=_AMS_S)
    exact = (ev.groupBy("k").agg(F.count(F.lit(1)).alias("_c"))
             .agg(F.sum(F.col("_c") * F.col("_c")).alias("f2_exact")))
    return est.crossJoin(F.broadcast(exact))


def sql_ams_f2() -> str:
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), '"
         f"{_AMS_SALT}-' || CAST(seed AS VARCHAR), k)), 1, 15)) "
         "AS BIGINT)")
    return f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
seeds AS (SELECT unnest(range(0, {_AMS_S})) AS seed),
sg AS (
  SELECT seed, CAST(1 - 2 * ({u} % 2) AS BIGINT) AS sgn
  FROM ev CROSS JOIN seeds),
regs AS (
  SELECT seed, CAST(SUM(sgn) AS BIGINT) AS reg
  FROM sg GROUP BY 1),
r AS (
  SELECT reg * reg AS e,
         ROW_NUMBER() OVER (ORDER BY reg * reg, seed) AS rn
  FROM regs),
ex AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY k))
SELECT CAST({_AMS_S} AS BIGINT) AS s_seeds,
       CAST(e AS BIGINT) AS f2_est, f2_exact
FROM r, ex WHERE rn = {(_AMS_S + 1) // 2}"""


SKETCH_QUERIES["ams_f2"] = (q_ams_f2, sql_ams_f2)


_CM_W, _CM_D = 64, 4
_CM_SALT = "cm-gate-v1"
_CM_PROBES = ["table", "spark", "join", "scan", "value",
              "absent_token_a", "absent_token_b"]


def q_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries over the document token stream
    (operators/sketch.py cm_sketch/cm_estimate): a 4×64 exact-integer
    counter grid via the md5-u30 universal hashes, probed for five
    present tokens and two absent ones, each estimate joined to its
    exact count — the one-sided ``true ≤ est`` guarantee is part of
    the value-hashed result."""
    from .operators.sketch import cm_estimate, cm_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.filter(
        F.split(F.lower(F.col("text")), r"\s+"),
        lambda t: t != "")).alias("tok"))
    sk = cm_sketch(toks, "tok", width=_CM_W, depth=_CM_D,
                   salt=_CM_SALT)
    probes = spark.createDataFrame([(p,) for p in _CM_PROBES],
                                   "tok string")
    est = cm_estimate(sk, probes, "tok", width=_CM_W, depth=_CM_D,
                      salt=_CM_SALT)
    true = (toks.join(F.broadcast(probes), "tok")
            .groupBy(F.col("tok").alias("item"))
            .agg(F.count(F.lit(1)).cast("long").alias("true_cnt")))
    return (est.join(true, "item", "left")
            .select("item", "est",
                    F.coalesce("true_cnt", F.lit(0).cast("long"))
                    .alias("true_cnt"),
                    (F.col("est")
                     - F.coalesce("true_cnt", F.lit(0).cast("long")))
                    .alias("over")))


def sql_cm_sketch() -> str:
    from .operators.sketch import _CM_P, _CM_U30, cm_coeffs

    probes = ", ".join(f"('{p}')" for p in _CM_PROBES)

    def u30(expr):
        return (f"(CAST('0x' || substr(md5('{_CM_SALT}' || chr(31) "
                f"|| {expr}), 1, 15) AS BIGINT) % {_CM_U30})")

    def bucket(expr, a, b):
        return (f"(({a} * {u30(expr)} + {b}) % {_CM_P}) % {_CM_W}")

    tok_cells = "\n  UNION ALL\n  ".join(
        f"SELECT {d + 1} AS d, {bucket('tok', a, b)} AS bucket, tok"
        f" FROM toks"
        for d, (a, b) in enumerate(cm_coeffs(_CM_D)))
    probe_cells = "\n  UNION ALL\n  ".join(
        f"SELECT {d + 1} AS d, {bucket('item', a, b)} AS bucket, item"
        f" FROM probes"
        for d, (a, b) in enumerate(cm_coeffs(_CM_D)))
    return f"""WITH d0 AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
toks AS (SELECT unnest(l) AS tok FROM d0),
cells AS (
  {tok_cells}),
sk AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2),
probes(item) AS (VALUES {probes}),
pc AS (
  {probe_cells}),
est AS (
  SELECT pc.item,
         CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
  FROM pc LEFT JOIN sk USING (d, bucket)
  GROUP BY pc.item),
tru AS (
  SELECT tok AS item, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM toks JOIN probes ON toks.tok = probes.item
  GROUP BY 1)
SELECT e.item, e.est, COALESCE(t.true_cnt, 0) AS true_cnt,
       e.est - COALESCE(t.true_cnt, 0) AS over
FROM est e LEFT JOIN tru t USING (item)"""


SKETCH_QUERIES["cm_sketch"] = (q_cm_sketch, sql_cm_sketch)


_BL_M, _BL_K = 4096, 5
_BL_SALT = "bloom-gate-v1"


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership over the document token vocabulary
    (operators/sketch.py bloom_bits_build/bloom_bits_probe): a 4096-bit / 5-hash
    filter as a distinct set-bit table, probed with the CM gate's
    present+absent token list — no false negative can appear in the
    value-hashed result by construction."""
    from .operators.sketch import bloom_bits_build, bloom_bits_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.filter(
        F.split(F.lower(F.col("text")), r"\s+"),
        lambda t: t != "")).alias("tok"))
    bl = bloom_bits_build(toks, "tok", m_bits=_BL_M, k_hashes=_BL_K,
                     salt=_BL_SALT)
    probes = spark.createDataFrame([(p,) for p in _CM_PROBES],
                                   "tok string")
    return bloom_bits_probe(bl, probes, "tok", m_bits=_BL_M,
                       k_hashes=_BL_K, salt=_BL_SALT)


def sql_bloom_filter() -> str:
    from .operators.sketch import _CM_P, _CM_U30, cm_coeffs

    probes = ", ".join(f"('{p}')" for p in _CM_PROBES)

    def u30(expr):
        return (f"(CAST('0x' || substr(md5('{_BL_SALT}' || chr(31) "
                f"|| {expr}), 1, 15) AS BIGINT) % {_CM_U30})")

    def bit(expr, a, b):
        return (f"(({a} * {u30(expr)} + {b}) % {_CM_P}) % {_BL_M}")

    tok_bits = "\n  UNION ALL\n  ".join(
        f"SELECT {bit('tok', a, b)} AS bit FROM toks"
        for a, b in cm_coeffs(_BL_K))
    probe_bits = "\n  UNION ALL\n  ".join(
        f"SELECT item, {bit('item', a, b)} AS bit FROM probes"
        for a, b in cm_coeffs(_BL_K))
    return f"""WITH d0 AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
toks AS (SELECT unnest(l) AS tok FROM d0),
bl AS (SELECT DISTINCT bit FROM (
  {tok_bits})),
probes(item) AS (VALUES {probes}),
pb AS (
  {probe_bits}),
hits AS (
  SELECT pb.item,
         CAST(SUM(CASE WHEN bl.bit IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS hits
  FROM pb LEFT JOIN bl USING (bit)
  GROUP BY pb.item)
SELECT item, hits, hits = {_BL_K} AS maybe_present FROM hits"""


SKETCH_QUERIES["bloom_filter"] = (q_bloom_filter, sql_bloom_filter)


def q_species_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness + Good-Turing unseen mass of the token
    distribution per source (operators/sketch.py species_richness):
    frequency-of-frequencies from two stacked groupBys, each
    estimator one pinned division — "how much vocabulary has this
    source NOT shown us yet"."""
    from .operators.sketch import species_richness

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("source", F.explode(F.filter(
        F.split(F.lower(F.col("text")), r"\s+"),
        lambda t: t != "")).alias("tok"))
    return species_richness(toks, ["source"], ["tok"])


def sql_species_richness() -> str:
    return """WITH d AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents),
toks AS (SELECT source, unnest(l) AS tok FROM d),
pk AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2),
prof AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS d_distinct,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM pk GROUP BY 1)
SELECT source, n_tokens, d_distinct, f1, f2,
       CAST(d_distinct AS DOUBLE)
         + CAST(f1 * (f1 - 1) AS DOUBLE)
           / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
       CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unseen_mass,
       1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS coverage
FROM prof"""


SKETCH_QUERIES["species_richness"] = (q_species_richness,
                                      sql_species_richness)
