"""Bounded-memory heavy-hitter detection (Misra–Gries + exact recount).

The salted join (joins.py) needs a hot-key list.  The exact pre-scan
(``hot_keys``: groupBy(key).count) shuffles EVERY distinct key — at 100 TB
with a high-cardinality key the detector itself becomes the bottleneck.
This module is the scale path, the classic two-pass heavy-hitters scheme:

1. **Candidates** (``mg_candidates``): one scan, a Misra–Gries summary of
   at most ``m`` counters PER PARTITION (Arrow-batched ``mapInPandas``,
   O(m) state, no shuffle).  Guarantee: any key whose share of some
   partition exceeds ``1/(m+1)`` survives that partition's summary — and a
   key with GLOBAL share > 1/(m+1) must exceed that share in at least one
   partition (a weighted average is bounded by its maximum), so the union
   of the partition summaries (≤ partitions × m rows, tiny) is a SUPERSET
   of every global heavy hitter regardless of how rows are distributed.
2. **Exact recount** (``heavy_hitters``): second scan counts ONLY the
   candidate keys (broadcast semi-join — the shuffle carries ≤ P·m keys),
   then filters by the exact integer threshold ``ceil(num·n/den)``.

Output = exactly the keys with true count ≥ threshold — deterministic,
partitioning-independent, SQL-expressible (the oracle is a plain
GROUP BY/HAVING), even though pass 1 is a sketch.

Spark's built-ins (``df.stat.freqItems`` — false positives, no counts;
``df.stat.countMinSketch`` — overestimates, driver-side query) don't give
the exact-set semantics the salted join wants; this does, for two scans.

The thresholds are integer rationals (``share=(num, den)``), never floats:
``0.015 * 60000`` is not 900.0 in IEEE, and a boundary key must not
flip between engines.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_update(counters: dict, v, c: int, m: int) -> None:
    """Weighted Misra–Gries: add item ``v`` with weight ``c``."""
    if v in counters:
        counters[v] += c
        return
    if len(counters) < m:
        counters[v] = c
        return
    dmin = min(counters.values())
    d = c if c < dmin else dmin
    for k in list(counters):
        counters[k] -= d
        if counters[k] <= 0:
            del counters[k]
    if c - d > 0:
        counters[v] = c - d  # d == dmin freed at least one slot


def mg_candidates(df: DataFrame, key: str, m: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: ``(key, lb)`` rows, ≤ m per
    partition; ``lb`` is the (decrement-eroded) lower-bound counter.
    NULL keys are ignored (a NULL join key never matches anyway)."""
    key_field = df.schema[key]
    schema = T.StructType([key_field, T.StructField("lb", T.LongType())])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[key].value_counts().items():  # drops NaN/None
                _mg_update(counters, v, int(c), m)
        if counters:
            yield pd.DataFrame({key: list(counters.keys()),
                                "lb": list(counters.values())})

    return df.select(key).mapInPandas(summarize, schema)


def heavy_hitters(
    df: DataFrame,
    key: str,
    share: Tuple[int, int] = (1, 100),
    min_count: Optional[int] = None,
    total: Optional[int] = None,
) -> DataFrame:
    """Exact (key, cnt) for every key with count ≥ ceil(num·n/den) —
    via an MG candidate pass and a candidate-only recount.

    ``share=(num, den)`` is the integer-rational frequency threshold;
    pass ``min_count`` to use an absolute row-count threshold instead
    (skips the total-count job).
    """
    num, den = share
    if total is None:
        total = df.count()
    if min_count is None:
        min_count = -(-num * total // den)  # ceil without floats
    min_count = max(min_count, 1)
    # summary size with the superset guarantee: 1/(m+1) < min_count/n
    m = max(math.ceil(total / min_count), 1)
    cand = mg_candidates(df, key, m).select(key).distinct()
    return (
        df.join(F.broadcast(cand), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
    )


def hot_keys_sketch(df: DataFrame, key: str, threshold: int,
                    total: Optional[int] = None) -> list:
    """Drop-in scale path for joins.hot_keys: keys with count > threshold,
    discovered with bounded memory.  ``total`` (row count, exact or from
    table stats) tightens the summary size; without it the count job runs
    once."""
    hh = heavy_hitters(df, key, min_count=threshold + 1, total=total)
    return [r[0] for r in hh.select(key).collect()]


def mg_merge(summaries: DataFrame, key: str, m: int) -> DataFrame:
    """Merge Misra–Gries summaries into ONE summary of ≤ m counters with
    the combined-stream guarantee (mergeable-summaries construction,
    Agarwal et al., PODS'12): sum counters per key, then subtract the
    (m+1)-th largest sum from everything and drop the non-positives.
    Any key whose share of the COMBINED stream exceeds ``1/(m+1)``
    survives the merge — so summaries can be built per batch / per day /
    per shard and folded associatively, the property the streaming face
    relies on.

    The trim offset is fetched with a driver-side top-(m+1) collect —
    control plane, ≤ m+1 rows."""
    summed = summaries.groupBy(key).agg(F.sum("lb").alias("lb"))
    top = summed.orderBy(F.col("lb").desc()).limit(m + 1).collect()
    t = top[m]["lb"] if len(top) > m else 0
    return (summed.filter(F.col("lb") > F.lit(t))
            .withColumn("lb", F.col("lb") - F.lit(t)))


# ---------------------------------------------------------------- KMV sketch


def kmv_rows(df: DataFrame, group_cols, key_cols, k: int,
             salt: str = "kmv") -> DataFrame:
    """The KMV (k-minimum-values / bottom-k) distinct sketch as a TABLE:
    per group, the k smallest 60-bit md5 coordinates over DISTINCT keys
    (Bar-Yossef et al. 2002; the mergeable distinct-count sketch behind
    theta sketches).  Row form ``(group..., h, rn)`` IS the sketch —
    mergeable by union + re-bottom-k (:func:`kmv_merge`) — and, because
    the coordinate is the repo's deterministic ``hash_u60``, the sketch
    and its estimate are engine-exact (full value-hash oracle), unlike
    HLL register implementations.

    Shape: one distinct on (group, h) + one bottom-k window on the
    group key.  At 100 TB the distinct is the dominant shuffle — same
    key as the window, and the map-side partial distinct collapses
    duplicate content before the exchange."""
    from .splits import hash_u60

    if k < 2:
        raise ValueError("k must be >= 2")
    gc = list(group_cols)
    h = hash_u60(list(key_cols), salt)
    d = df.select(*gc, h.alias("h")).distinct()
    w = Window.partitionBy(*gc).orderBy("h")
    return (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def kmv_merge(parts: DataFrame, group_cols, k: int) -> DataFrame:
    """Merge row-form sketches (a union of :func:`kmv_rows` outputs,
    possibly from different partitions/epochs): distinct hashes,
    re-bottom-k.  The result is IDENTICAL to sketching the union of the
    raw inputs — the mergeability law the pytest proves."""
    gc = list(group_cols)
    d = parts.select(*gc, "h").distinct()
    w = Window.partitionBy(*gc).orderBy("h")
    return (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def kmv_estimate(rows: DataFrame, group_cols, k: int) -> DataFrame:
    """(group..., n_sketch, h_k, est): distinct-count estimate
    ``(k−1)·2⁶⁰ / h_k`` when the sketch is full, exact ``n_sketch``
    when the domain was smaller than k.  Division order pinned (two
    casts, one multiply, one divide) for cross-engine bit equality."""
    from .splits import SCALE_U60

    gc = list(group_cols)
    agg = (rows.groupBy(*gc)
           .agg(F.count(F.lit(1)).alias("n_sketch"),
                F.max("h").alias("h_k")))
    est = (F.when(F.col("n_sketch") < k,
                  F.col("n_sketch").cast("double"))
           .otherwise(F.lit(float(k - 1)) * F.lit(float(SCALE_U60))
                      / F.col("h_k").cast("double")))
    return agg.withColumn("est", est)


def hll_registers(df: DataFrame, group_cols, key_cols, *, b: int = 8,
                  salt: str) -> DataFrame:
    """HyperLogLog register table (Flajolet et al., AofA'07) over the
    repo's deterministic 60-bit md5 coordinate — so unlike library HLLs
    (whose hash/registers are engine-private), the ENTIRE sketch is
    value-hash comparable across engines: bucket = low ``b`` bits,
    rho = leading-zero rank of the remaining ``60−b`` bits, register =
    MAX(rho) per (group, bucket).

    One groupBy — mergeable by construction (MAX re-aggregates), the
    property that lets 100 TB partial sketches combine without rescans.
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b out of range [4,16]: {b}")
    from .splits import hash_u60

    m = 1 << b
    width = 60 - b                      # bits of w; rho in [1, width+1]
    h = hash_u60(list(key_cols), salt)
    df2 = df.select(*group_cols, h.alias("_h"))
    df2 = df2.select(
        *group_cols,
        F.pmod(F.col("_h"), F.lit(m)).alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"))
    rho = F.when(F.col("_w") == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(F.col("_w"))))
    return (df2.select(*group_cols, "bucket", rho.alias("_rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("_rho").alias("reg")))


def hll_estimate(regs: DataFrame, group_cols, *, b: int = 8) -> DataFrame:
    """Cardinality estimate from an ``hll_registers`` table, exactness
    contract: the harmonic denominator is computed as the EXACT integer
    ``S = Σ 2^(K−reg) + (m − n_used)·2^K`` (K = max rho; empty buckets
    contribute 2^K), then exactly ONE double division forms the raw
    estimate and the standard small-range linear-counting branch
    (``est ≤ 2.5m`` with empty buckets → ``m·ln(m/V)``) is mirrored in
    the oracle — both engines agree bit-for-bit (ln matches across
    engines on identical doubles; see spark-duckdb-parity notes).
    """
    m = 1 << b
    K = 60 - b + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(2 ** K)
    g = list(group_cols)
    agg = (regs.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("m_used"),
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {K} - reg)"))
                .alias("_s_used")))
    v = (F.lit(m) - F.col("m_used")).alias("v_zero")
    s = (F.col("_s_used")
         + (F.lit(m) - F.col("m_used")) * F.lit(2 ** K)).alias("s_scaled")
    out = agg.select(*g, "m_used", v, s)
    raw = F.lit(num) / F.col("s_scaled").cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
                 F.lit(float(m))
                 * F.log(F.lit(float(m)) / F.col("v_zero").cast("double"))
                 ).otherwise(raw)
    return out.select(*g, "m_used", "v_zero", "s_scaled",
                      est.alias("est_hll"))


def bitmap_distinct(df: DataFrame, group_cols, key_col: str) -> DataFrame:
    """Bucketed-bitmap distinct index (the roaring-bitmap shape on
    int64 words): per (group, key div 63) one 63-slot mask via
    ``bit_or(1 << key mod 63)``, then exact distinct = Σ popcount.
    63 slots, not 64: a shift into the sign bit is an overflow ERROR
    in DuckDB and a silent wrap in Spark — 63 keeps every mask
    positive and both engines in exact agreement.

    This is the EXACT-compressed alternative to HLL/KMV for dense
    integer key domains: masks are mergeable by bit_or (partial
    bitmaps from 1000 executors combine losslessly), membership is one
    shift-and-test, and storage is 1 bit/key instead of 8 bytes.  Keys
    must be non-negative (raise-checked in-plan).

    One map-side-combinable groupBy to masks + one to the per-group
    profile: ``(group..., n_buckets, n_distinct, max_bucket_card)``.
    """
    g = list(group_cols)
    k = F.col(key_col).cast("long")
    guarded = F.when(
        k < 0,
        F.raise_error(F.concat(
            F.lit("bitmap_distinct: negative key: "),
            k.cast("string"))).cast("long")).otherwise(k)
    b = df.select(*g, guarded.alias("_k")).select(
        *g, F.expr("_k div 63").alias("bucket"),
        F.pmod(F.col("_k"), F.lit(63)).cast("int").alias("slot"))
    masks = (b.groupBy(*g, "bucket")
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), slot))")
                  .alias("mask")))
    return (masks.groupBy(*g)
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum(F.bit_count("mask")).alias("n_distinct"),
                 F.max(F.bit_count("mask")).alias("max_bucket_card")))


_BLOOM_WORD = 63  # slots per word — sign-bit shifts overflow in DuckDB


def bloom_positions(key: Column, n_bits: int, k: int, salt: str) -> list:
    """The ``k`` bit positions of ``key`` in an ``n_bits`` Bloom filter:
    Kirsch–Mitzenmacher double hashing ``(h1 + i·h2) mod n_bits`` over
    two independent 60-bit md5 coordinates (one hash pair serves any
    ``k`` — Kirsch & Mitzenmacher, ESA'06).  ``h2`` is forced non-zero
    mod ``n_bits`` so the k probes never collapse onto one bit.  Pure
    integer Columns: bit-identical in any engine with the same md5."""
    from .splits import _SEP

    s = key.cast("string")

    def h(tag: str) -> Column:
        return F.conv(F.substring(F.md5(F.concat_ws(
            _SEP, F.lit(f"{salt}-{tag}"), s)), 1, 15), 16, 10).cast("long")

    h1 = F.pmod(h("a"), F.lit(n_bits))
    h2 = F.pmod(h("b"), F.lit(n_bits - 1)) + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k)]


def bloom_build(dim: DataFrame, key_col: str, *, n_words: int = 8,
                k: int = 3, salt: str = "bloom") -> DataFrame:
    """Build a Bloom filter of ``dim``'s keys as ONE row holding a dense
    ``n_words × 63``-bit ``array<long>`` — the broadcastable pre-filter
    for ``bloom_prune``.  Mergeable: word masks combine by ``bit_or``,
    so partial filters from 1000 executors union losslessly (the same
    63-slot word contract as ``bitmap_distinct`` — a shift into the
    sign bit is an overflow error in DuckDB and a silent wrap in
    Spark).  The build shuffles only (word, mask) pairs — ≤ ``n_words``
    rows regardless of dim cardinality."""
    n_bits = n_words * _BLOOM_WORD
    pos = F.explode(F.array(*bloom_positions(
        F.col(key_col), n_bits, k, salt))).alias("pos")
    bits = dim.select(F.col(key_col)).distinct().select(pos).select(
        F.expr(f"pos div {_BLOOM_WORD}").alias("word"),
        F.pmod(F.col("pos"), F.lit(_BLOOM_WORD)).cast("int").alias("slot"))
    masks = bits.groupBy("word").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), slot))").alias("mask"))
    # densify absent words to 0 and fold into a single array row — the
    # filter is one array<long> value built in-plan, never a driver
    # collect
    return masks.groupBy().agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("word", "mask"))),
            F.array_repeat(F.lit(0).cast("long"), n_words),
            lambda acc, wm: F.transform(
                acc,
                lambda v, i: F.when(i == wm["word"].cast("int"),
                                    wm["mask"]).otherwise(v)),
        ).alias("bloom"))


def bloom_prune(fact: DataFrame, bloom: DataFrame, key_col: str, *,
                n_words: int = 8, k: int = 3, salt: str = "bloom",
                flag_col: str = "bloom_pass") -> DataFrame:
    """Flag each fact row with its Bloom membership verdict (all ``k``
    probed bits set → may be a member; any clear bit → definitely not).

    This is the shuffle-free semi-join prefilter: at 100 TB the fact
    side is scanned once against a broadcast single-row array and only
    survivors (true matches plus the controlled false-positive residue,
    ≈ (1−e^(−kn/m))^k) need reach the exact join.  The probe is pure
    integer Column arithmetic — whole-stage codegen, no UDF, no
    exchange on the fact side.  Filter on ``flag_col`` to prune; the
    flag form keeps the gate's pass/fail accounting in one scan."""
    n_bits = n_words * _BLOOM_WORD
    probed = fact.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for i, p in enumerate(bloom_positions(
            F.col(key_col), n_bits, k, salt)):
        probed = probed.withColumn(f"_bp{i}", p)
        hit = F.expr(
            f"(element_at(bloom, CAST(_bp{i} div {_BLOOM_WORD} AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT),"
            f"             CAST(pmod(_bp{i}, {_BLOOM_WORD}) AS INT))) != 0")
        cond = cond & hit
    return probed.withColumn(flag_col, cond).drop(
        "bloom", *[f"_bp{i}" for i in range(k)])


def cms_registers(df: DataFrame, key_col: str, *, d: int = 3,
                  w: int = 256, salt: str = "cms",
                  weight_col: Optional[str] = None) -> DataFrame:
    """Count-min sketch registers (Cormode & Muthukrishnan, J.Alg'05):
    ``d`` independent rows of ``w`` counters; every key increments one
    counter per row at column ``md5(salt-i, key) mod w``.  One
    map-side-combinable groupBy over ≤ d·w cells — the fixed-memory
    frequency summary that merges across epochs/executors by plain SUM
    (unlike Misra–Gries, whose merge needs the counter-subtract pass).
    Integer registers: value-hash exact in any engine with md5."""
    from .splits import hash_u60

    wt = (F.col(weight_col).cast("long") if weight_col
          else F.lit(1).cast("long"))
    # ONE fact scan: the d (row, col) cells explode in-row (a d-way
    # union of selects would re-read the input d times)
    cells = F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(hash_u60([key_col], f"{salt}-{i}"),
                        F.lit(w)).alias("col"))
        for i in range(d)])).alias("rc")
    out = df.select(wt.alias("wt"), cells).select(
        F.col("rc.row").alias("row"), F.col("rc.col").alias("col"), "wt")
    return out.groupBy("row", "col").agg(F.sum("wt").alias("reg"))


def cms_query(registers: DataFrame, probes: DataFrame, key_col: str, *,
              d: int = 3, w: int = 256, salt: str = "cms") -> DataFrame:
    """Point-query the count-min sketch for each probe key: the
    estimate is ``min`` over the d probed registers — an upper bound on
    the true count (collisions only inflate).  Registers are ≤ d·w rows
    → broadcast equi-join against the probes; output
    ``(key, est)``."""
    from .splits import hash_u60

    cells = probes.select(F.col(key_col)).distinct()
    for i in range(d):
        cells = cells.withColumn(
            f"_c{i}", F.pmod(hash_u60([key_col], f"{salt}-{i}"),
                             F.lit(w)))
    stacked = cells.select(
        key_col,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     F.col(f"_c{i}").alias("col"))
            for i in range(d)])).alias("rc")
    ).select(key_col, F.col("rc.row").alias("row"),
             F.col("rc.col").alias("col"))
    joined = stacked.join(F.broadcast(registers), ["row", "col"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("reg"), F.lit(0).cast("long")))
                 .alias("est")))


def ams_registers(df: DataFrame, key_col: str, *, s: int = 16,
                  salt: str = "ams") -> DataFrame:
    """AMS tug-of-war registers (Alon-Matias-Szegedy, STOC'96) for the
    second frequency moment F2 = Σ_k f_k²: ``s`` independent ±1-signed
    counters ``reg_j = Σ_rows sign_j(key)``, where ``sign_j`` is the
    parity bit of the repo's deterministic 60-bit md5 coordinate under
    salt ``{salt}-{j}``.  E[reg²] = F2 per seed; the registers are
    exact integers and MERGE by plain SUM across partitions/epochs —
    the fixed-memory skew/self-join-size probe (F2 is exactly the
    self-join size the join_size_stats gate computes exactly).

    One fact scan: the s signed cells explode in-row (the
    cms_registers discipline), one ≤ s-row map-side-combinable
    groupBy.  Integer registers value-hash in any engine with md5."""
    from .splits import hash_u60

    cells = F.explode(F.array(*[
        F.struct(
            F.lit(j).alias("seed"),
            (1 - 2 * F.pmod(hash_u60([key_col], f"{salt}-{j}"),
                            F.lit(2))).cast("long").alias("sgn"))
        for j in range(s)])).alias("sc")
    out = df.select(cells).select(
        F.col("sc.seed").alias("seed"), F.col("sc.sgn").alias("sgn"))
    return out.groupBy("seed").agg(
        F.sum("sgn").cast("long").alias("reg"))


def ams_f2_estimate(regs: DataFrame, *, s: int = 16) -> DataFrame:
    """Collapse the s AMS registers to the classic median-of-estimates:
    per-seed estimate reg², final value the exact LOWER MEDIAN (the
    ⌈s/2⌉-th order statistic — selection, never averaging: the whole
    estimate stays an exact integer and value-hashes cross-engine).
    Returns one row ``(s_seeds, f2_est)``."""
    est = regs.select(
        "seed", (F.col("reg") * F.col("reg")).alias("_e"))
    w = Window.orderBy(F.col("_e").asc(), F.col("seed").asc())
    ranked = est.withColumn("_rn", F.row_number().over(w))
    return (ranked.filter(F.col("_rn") == (s + 1) // 2)
            .select(F.lit(s).cast("long").alias("s_seeds"),
                    F.col("_e").alias("f2_est")))


# ---- Count-Min sketch ----

_CM_P = (1 << 31) - 1          # Mersenne prime 2^31 − 1
_CM_U30 = (1 << 30)


def cm_coeffs(depth: int) -> "list[tuple[int, int]]":
    """The fixed per-depth universal-hash coefficients (a_d, b_d) —
    one deterministic formula, imported by BOTH the operator and the
    oracle SQL builder so the bucket functions match literal-for-
    literal."""
    return [((1103515245 * d + 12345) % _CM_P or 1,
             (2654435761 * d + 1013904223) % _CM_P)
            for d in range(1, depth + 1)]


def _cm_u30(item_col: str, salt: str) -> Column:
    from .splits import hash_u60
    return F.pmod(hash_u60([item_col], salt), F.lit(_CM_U30))


def cm_sketch(df: DataFrame, item_col: str, *, width: int, depth: int,
              weight_col: "str | None" = None,
              salt: str = "cm-v1") -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — the bounded
    ``depth × width`` counter table whose point queries OVERESTIMATE
    true counts by at most εN (ε = e/width) with probability
    1 − e^−depth: the mergeable frequency summary for streams and
    shard-local partials, complementing this module's exact-set
    heavy_hitters (Misra-Gries) and kmv/hll distinct sketches.

    Determinism: the item coordinate is the md5-u60 hash (splits.py
    discipline — bit-identical in DuckDB), folded to 30 bits so the
    per-depth universal hash ``((a_d·u + b_d) mod (2³¹−1)) mod width``
    stays exact int64; coefficients come from :func:`cm_coeffs`, one
    shared formula.  Counters are exact longs.

    Scale shape: one in-row depth explode (×depth rows) + ONE
    map-side-combinable groupBy on (d, bucket) — output is the fixed
    depth·width grid regardless of input size, and two sketches merge
    by unioning and re-summing the same groupBy (partial-aggregation
    algebra; see read/merge rollup partials for the persistence
    pattern).

    Returns ``(d, bucket, cnt)`` — only touched cells appear (absent
    cell ≡ 0).
    """
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2, depth >= 1")
    u = _cm_u30(item_col, salt)
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(F.lit(d + 1).cast("int").alias("d"),
                 F.pmod(F.pmod(F.lit(a) * u + F.lit(b), F.lit(_CM_P)),
                        F.lit(int(width))).cast("long").alias("bucket"))
        for d, (a, b) in enumerate(cm_coeffs(depth))])
    return (df.filter(F.col(item_col).isNotNull())
            .select(F.explode(cells).alias("_c"), w.alias("_w"))
            .groupBy(F.col("_c.d").alias("d"),
                     F.col("_c.bucket").alias("bucket"))
            .agg(F.sum("_w").alias("cnt")))


def cm_estimate(sketch: DataFrame, queries: DataFrame, item_col: str,
                *, width: int, depth: int,
                salt: str = "cm-v1") -> DataFrame:
    """Point-query a :func:`cm_sketch`: est(item) = min over depths of
    the addressed counter (0 for a never-touched cell) — the classic
    one-sided estimate, ``true ≤ est ≤ true + εN`` w.h.p.  The sketch
    side is depth·width rows — broadcast; queries never shuffle.
    Returns ``(item, est)`` (one row per distinct query item)."""
    u = _cm_u30("item", salt)
    cells = F.array(*[
        F.struct(F.lit(d + 1).cast("int").alias("d"),
                 F.pmod(F.pmod(F.lit(a) * u + F.lit(b), F.lit(_CM_P)),
                        F.lit(int(width))).cast("long").alias("bucket"))
        for d, (a, b) in enumerate(cm_coeffs(depth))])
    q = (queries.filter(F.col(item_col).isNotNull())
         .select(F.col(item_col).alias("item")).distinct()
         .select("item", F.explode(cells).alias("_c"))
         .select("item", F.col("_c.d").alias("d"),
                 F.col("_c.bucket").alias("bucket")))
    j = q.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (j.groupBy("item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est")))


def bloom_bits_build(df: DataFrame, item_col: str, *, m_bits: int,
                k_hashes: int, salt: str = "bloom-v1") -> DataFrame:
    """Bloom filter (Bloom 1970) as a relational SET-BIT table (the
    row-form sibling of this module's dense-array bloom_build/
    bloom_prune join-pruning pair): each
    item sets ``k_hashes`` positions in an ``m_bits`` space via the
    same md5-u30 universal hashes as :func:`cm_sketch` (shared
    :func:`cm_coeffs` — engine-mirrorable literal-for-literal).  The
    filter is the DISTINCT set of touched positions (≤ min(m_bits,
    k·n) rows) — NO false negatives ever, false-positive rate
    ≈ (1 − e^{−kn/m})^k; two filters merge by union-distinct.

    Why rows, not packed longs: a distinct-position table is
    map-side-combinable, mergeable with one set union, broadcastable
    at the usual m (20 bits ≈ 1M rows max), and keeps every engine
    bit-exact without bit-twiddling UDFs.  Pack downstream if a
    byte-dense form is needed.

    Returns ``(bit,)`` — the set positions, exact longs.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("m_bits must be >= 2, k_hashes >= 1")
    u = _cm_u30(item_col, salt)
    bits = F.array(*[
        F.pmod(F.pmod(F.lit(a) * u + F.lit(b), F.lit(_CM_P)),
               F.lit(int(m_bits))).cast("long")
        for a, b in cm_coeffs(k_hashes)])
    return (df.filter(F.col(item_col).isNotNull())
            .select(F.explode(bits).alias("bit")).distinct())


def bloom_bits_probe(bloom: DataFrame, queries: DataFrame, item_col: str,
                *, m_bits: int, k_hashes: int,
                salt: str = "bloom-v1") -> DataFrame:
    """Membership-test query items against a :func:`bloom_bits_build`
    table: ``maybe_present`` is true iff ALL ``k_hashes`` addressed
    bits are set (the classic conjunction — false positives possible,
    false negatives impossible).  The filter side broadcasts; queries
    never shuffle.  Returns ``(item, hits, maybe_present)`` with
    ``hits`` the number of set bits found (k ⇒ maybe, < k ⇒
    definitely absent)."""
    u = _cm_u30("item", salt)
    bits = F.array(*[
        F.pmod(F.pmod(F.lit(a) * u + F.lit(b), F.lit(_CM_P)),
               F.lit(int(m_bits))).cast("long")
        for a, b in cm_coeffs(k_hashes)])
    q = (queries.filter(F.col(item_col).isNotNull())
         .select(F.col(item_col).alias("item")).distinct()
         .select("item", F.explode(bits).alias("bit")))
    j = q.join(F.broadcast(bloom.withColumn("_set", F.lit(1))),
               "bit", "left")
    return (q.select("item").distinct().join(
        j.groupBy("item")
        .agg(F.sum(F.coalesce(F.col("_set"), F.lit(0)))
             .cast("long").alias("hits")), "item")
        .select("item", "hits",
                (F.col("hits") == k_hashes).alias("maybe_present")))


def species_richness(df: DataFrame, group_cols, key_cols,
                     ) -> DataFrame:
    """Abundance-based richness and unseen-mass estimators per group —
    how many DISTINCT items exist beyond the ones observed, from the
    frequency-of-frequencies profile alone:

    - **Chao1** (Chao 1984): ``D + f1·(f1−1)/(2·(f2+1))`` — the
      bias-corrected lower bound on true richness from singleton (f1)
      and doubleton (f2) counts (the +1 form is defined at f2 = 0).
    - **Good-Turing unseen mass** (Good 1953): ``P₀ = f1/N`` — the
      probability the NEXT draw is a never-seen item, the number that
      tells a crawler/vocabulary builder how far from saturation it
      is.
    - **Coverage** ``C = 1 − f1/N`` (Turing's estimator).

    Where :func:`kmv_rows`/:func:`hll_registers` estimate D under
    memory bounds, these estimate what was NOT collected — different
    question, same table.

    Exactness: D, N, f1, f2 are exact longs from two stacked
    map-side-combinable groupBys on the same leading key (one
    exchange); each estimator is ONE pinned division on exact int64
    products.

    Returns one row per group: ``(group..., n_tokens, d_distinct, f1,
    f2, chao1, unseen_mass, coverage)``.
    """
    gc = list(group_cols)
    per_key = (df.groupBy(*gc, *[F.col(c) for c in key_cols])
               .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    prof = per_key.groupBy(*gc).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("d_distinct"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
        .cast("long").alias("f1"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0))
        .cast("long").alias("f2"))
    chao1 = (F.col("d_distinct").cast("double")
             + (F.col("f1") * (F.col("f1") - 1)).cast("double")
             / (2 * (F.col("f2") + 1)).cast("double"))
    p0 = F.col("f1").cast("double") / F.col("n_tokens").cast("double")
    return prof.select(
        *gc, "n_tokens", "d_distinct", "f1", "f2",
        chao1.alias("chao1"), p0.alias("unseen_mass"),
        (F.lit(1.0) - p0).alias("coverage"))
