"""Deterministic dataset splitting, sampling, and sequence packing for
training-data pipelines.

Spark's own ``randomSplit``/``sample`` are NOT reproducible artifacts: the
split a row lands in depends on partition layout and evaluation order, so
a repartition, a cluster resize, or AQE re-planning silently reassigns
rows — poison for a train/val holdout that must stay fixed across
reprocessing runs.  Everything here instead derives membership from a
**content hash of explicit key columns**: ``u = int(md5(salt ⊕ key)[:15
hex]) ∈ [0, 2⁶⁰)``, compared against integer thresholds.  That makes the
assignment (a) reproducible bit-for-bit on any cluster shape, (b)
consistent across engines (the oracle recomputes it in SQL), and (c)
stable under incremental reprocessing — new rows join a split without
moving old ones.

All pure Column expressions — no shuffle for split/sample (row-local),
one keyed window for packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_u60",
    "hash_split",
    "group_split",
    "stratified_sample",
    "deterministic_oversample",
    "pack_sequences",
    "shuffle_shards",
    "negative_pairs",
    "SCALE_U60",
]

# hash domain: first 15 hex chars of md5 = 60 bits, exact in an int64
SCALE_U60 = 1 << 60
_SEP = "\x1f"  # unit separator — never appears in the data's keys


def _threshold(frac: float) -> int:
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {frac}")
    return int(frac * SCALE_U60)


def hash_u60(cols: list[str], salt: str) -> Column:
    """Uniform 60-bit integer from (salt, *cols): the split/sample
    coordinate.  ``conv(hex, 16, 10)`` stays JVM-side; 15 hex chars keep
    the value exactly representable (and positive) in a long."""
    parts = [F.lit(salt)] + [F.col(c).cast("string") for c in cols]
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10
    ).cast("long")


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    *,
    salt: str,
    fractions: dict[str, float],
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash threshold.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Rows satisfying ``u < Σfrac·2⁶⁰`` cumulatively take the first
    matching split, so boundaries are integer literals — no float
    comparison ambiguity between engines.  Insertion order of the dict is
    the boundary order (keep it fixed; it is part of the artifact's
    identity, like the salt)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("no fractions")
    u = hash_u60(key_cols, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn(out, expr)


def group_split(
    df: DataFrame,
    group_cols: list[str],
    *,
    salt: str,
    fractions: dict[str, float],
    out: str = "split",
) -> DataFrame:
    """Leakage-safe split: hash only the GROUP key, so every row of a
    group (all docs of one author/source/session) lands in the same
    split.  Identical mechanics to ``hash_split``; the distinction is the
    contract — eval rows must never share a group with training rows."""
    return hash_split(df, group_cols, salt=salt, fractions=fractions,
                      out=out)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_cols: list[str],
    *,
    salt: str,
    fractions: dict[tuple, float] | dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (mixture
    re-weighting: upweight rare languages, downsample boilerplate
    sources).  Stratum membership looks up ``fractions`` by the stratum
    value tuple (or scalar for a single column); rows hash on
    ``key_cols`` so the SAME row survives regardless of cluster shape.
    Row-local — no shuffle, composes with any downstream plan."""
    u = hash_u60(key_cols, salt)
    expr = None
    for stratum, frac in fractions.items():
        key = (stratum,) if not isinstance(stratum, tuple) else stratum
        if len(key) != len(strata_cols):
            raise ValueError(f"stratum {key} arity != {strata_cols}")
        cond = None
        for c, v in zip(strata_cols, key):
            t = F.col(c) == F.lit(v)
            cond = t if cond is None else (cond & t)
        thr = F.lit(_threshold(frac))
        expr = (F.when(cond, thr) if expr is None
                else expr.when(cond, thr))
    thr_col = (F.lit(_threshold(default)) if expr is None
               else expr.otherwise(_threshold(default)))
    return df.filter(u < thr_col)


def _stratum_lookup(strata_cols: list[str],
                    mapping: "dict[tuple, float] | dict[str, float]",
                    default: float,
                    to_lit) -> Column:
    """CASE chain: stratum value tuple → ``to_lit(fraction)``."""
    expr = None
    for stratum, frac in mapping.items():
        key = (stratum,) if not isinstance(stratum, tuple) else stratum
        if len(key) != len(strata_cols):
            raise ValueError(f"stratum {key} arity != {strata_cols}")
        cond = None
        for c, v in zip(strata_cols, key):
            t = F.col(c) == F.lit(v)
            cond = t if cond is None else (cond & t)
        expr = (F.when(cond, to_lit(frac)) if expr is None
                else expr.when(cond, to_lit(frac)))
    return to_lit(default) if expr is None else expr.otherwise(
        to_lit(default))


def deterministic_oversample(
    df: DataFrame,
    strata_cols: list[str],
    key_cols: list[str],
    *,
    salt: str,
    weights: "dict[tuple, float] | dict[str, float]",
    default: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Mixture weights ABOVE 1: emit each row ``floor(w)`` times plus one
    more with probability ``frac(w)`` — so a stratum with weight 2.5
    contributes each row 2 or 3 times, 2.5 in expectation, decided by the
    row's own hash (reproducible anywhere, like everything in this
    module).  Weights below 1 degrade to ``stratified_sample`` semantics
    (0 or 1 copies).  ``copy_col`` numbers the copies 1..n so a
    downstream shard shuffle can separate them.

    Row-local + a bounded explode (fan-out ≤ ceil(max weight)) — no
    shuffle.  The epoch-mixture use case: upweight rare high-quality
    sources without materializing duplicates upstream."""
    if any(w < 0 for w in dict(weights).values()) or default < 0:
        raise ValueError("weights must be non-negative")
    u = hash_u60(key_cols, salt)
    base = _stratum_lookup(strata_cols, weights, default,
                           lambda w: F.lit(int(w)))
    frac_thr = _stratum_lookup(strata_cols, weights, default,
                               lambda w: F.lit(_threshold(w - int(w))))
    n_copies = (base + (u < frac_thr).cast("int")).alias("_n_copies")
    return (df.withColumn("_n_copies", n_copies)
            .filter(F.col("_n_copies") >= 1)  # sequence(1,0) would step -1
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(1),
                                             F.col("_n_copies"))))
            .drop("_n_copies"))


def pack_sequences(
    df: DataFrame,
    *,
    shard_by: list[str],
    order_by: list[str],
    weight: str,
    capacity: int,
    bin_col: str = "bin_idx",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Pack ordered documents into fixed-budget training shards: within
    each ``shard_by`` group, documents are laid out in ``order_by`` order
    and cut into bins of ``capacity`` total ``weight`` (token budget).
    ``bin_idx = floor(cum_weight_before / capacity)`` — the streaming
    first-fit layout a sequence-packing writer produces; ``bin_offset``
    is the document's start position inside its bin.  A document heavier
    than ``capacity`` still gets one bin (and overflows it): splitting
    oversize documents is the tokenizer's job upstream, and the overflow
    is visible as ``bin_offset + weight > capacity``.

    One shuffle (hash on ``shard_by``) + an in-partition sort — the same
    cost as writing the shards at all."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    w = Window.partitionBy(*shard_by).orderBy(*order_by) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_before = (F.sum(weight).over(w) - F.col(weight)).cast("long")
    return (df
            .withColumn("_cum_before", cum_before)
            .withColumn(bin_col,
                        F.floor(F.col("_cum_before") / F.lit(capacity))
                        .cast("long"))
            .withColumn(offset_col,
                        (F.col("_cum_before")
                         - F.col(bin_col) * F.lit(capacity)).cast("long"))
            .drop("_cum_before"))


def shuffle_shards(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt: str = "shuffle-v1",
    shard_col: str = "shard",
    rank_col: str = "shard_rank",
) -> DataFrame:
    """Deterministic global training-order shuffle into ``n_shards``.

    Every row gets the content-derived 60-bit coordinate ``u``; shards are
    CONTIGUOUS ranges of the coordinate (``shard = u // ceil(2⁶⁰/n)``), so
    reading shard 0..n-1 each in ``shard_rank`` order replays ONE uniform
    global permutation of the corpus — the property epoch shuffling needs,
    which per-shard independent ``ORDER BY rand()`` does not have.  Like
    everything in this module the permutation is reproducible on any
    cluster shape and stable under incremental extension (new rows
    splice into position without moving old ones).

    One shuffle (the rank window on ``shard``) — the same exchange the
    shard writer needs anyway; a writer should repartitionByRange on
    (shard, u) + sortWithinPartitions so each output file IS its shard in
    order.  Rank ties (60-bit collisions) break on the key columns, so
    the order stays total and deterministic.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    width = -(-SCALE_U60 // n_shards)  # ceil: shard ids stay < n_shards
    u = hash_u60(key_cols, salt)
    # integer `div`, NOT `/`: u has 60 significant bits — double division
    # flips shard-boundary rows (the engines would disagree at the edge)
    out = df.withColumn("_u", u).withColumn(
        shard_col, F.expr(f"_u div {width}L"))
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_u"), *[F.col(c) for c in key_cols])
    return (out.withColumn(rank_col, F.row_number().over(w))
            .drop("_u"))


def negative_pairs(
    df: DataFrame,
    id_col: str,
    n_ids: int,
    k: int,
    salt: str = "neg-v1",
) -> DataFrame:
    """k deterministic contrastive negatives per row over a DENSE id
    domain ``[0, n_ids)``: ``neg_id = u60(salt, id, j) mod n_ids``, with a
    self-collision shifted to the next id.  Content-derived like every
    sampler here — the same (corpus, salt) yields the same pairs on any
    cluster shape, and the pairs regenerate instead of being stored.

    Row-local Column math (an explode of k small) — ZERO shuffle; joining
    the negatives' payloads back is the caller's join (broadcast if the
    payload table is small, else a hash join on neg_id that AQE handles).
    For non-dense id domains, map ids through a shuffle_shards rank first.
    """
    if n_ids <= 1 or k <= 0:
        raise ValueError("need n_ids > 1 and k > 0")
    d = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_idx"))
    u = hash_u60([id_col, "neg_idx"], salt)
    raw = F.pmod(u, F.lit(n_ids))
    neg = F.when(raw == F.col(id_col),
                 F.pmod(raw + 1, F.lit(n_ids))).otherwise(raw)
    return d.withColumn("neg_id", neg.cast("long"))


def cap_per_group(df: DataFrame, group_cols: "Sequence[str]", k: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-group cap (the Gopher/RefinedWeb "cap hot
    domains" curation stage): keep at most ``k`` rows per group, chosen
    by md5(id) order — a uniform, cluster-shape-independent sample
    (an unordered ``LIMIT`` per group would be nondeterministic and
    irreproducible across partitionings).  One shuffle on the group
    key; the md5 coordinate reuses the hash-split convention
    (engine-identical, see _threshold)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col)
    return (df.withColumn("cap_rank", F.row_number().over(w))
            .filter(F.col("cap_rank") <= k))


def weighted_sample(
    df: DataFrame,
    group_cols: "Sequence[str]",
    weight_col: str,
    k: int,
    id_cols: "Sequence[str]",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — k rows per
    group with inclusion odds ∝ weight (Efraimidis & Spirakis 2006
    order sampling): rank by ``ln(u) / w`` descending, where u is the
    row's md5-60-bit coordinate mapped into (0, 1].

    ``u^(1/w)`` ordering (the paper's key) equals ``ln(u)/w`` ordering
    (ln and /w are monotone), and ln is the libm function the repo's
    parity rules already pin cross-engine — pow is NOT (Java allows
    1-ulp error), which is why the log form is the one used.  Same
    md5 coordinate as hash_split ⇒ the sample is reproducible across
    cluster shapes, partitionings, AND engines (full value-hash gate).
    One shuffle: the rank window on the group key."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    gc = list(group_cols)
    u = ((hash_u60(list(id_cols), salt) + F.lit(1)).cast("double")
         / F.lit(float(SCALE_U60)))
    # weights must be strictly positive: ln(u) < 0, so a NEGATIVE w
    # flips the key positive (that row would win every sample) and a
    # zero w yields NULL (silently never sampled) — fail loudly instead
    w_checked = F.when(
        F.col(weight_col) > 0, F.col(weight_col).cast("double")
    ).otherwise(F.raise_error(F.concat(
        F.lit("weighted_sample: non-positive weight "),
        F.col(weight_col).cast("string"))))
    key = F.log(u) / w_checked
    w = Window.partitionBy(*gc).orderBy(F.col("_skey").desc(),
                                        *[F.col(c) for c in id_cols])
    return (df.withColumn("_skey", key)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_skey", "_rn"))


def bottomk_sample(df: DataFrame, group_cols: "list[str]", id_col: str,
                   k: int, salt: str = "mfs-bk") -> DataFrame:
    """Deterministic per-group bottom-k sample: the k rows whose salted
    60-bit md5 hash of ``id_col`` is smallest — a uniform-without-
    replacement sample that is REPRODUCIBLE across engines, cluster
    shapes, and retries (no rand(), no seed-per-partition drift), and
    mergeable: the bottom-k of a union is the bottom-k of the per-part
    bottom-ks (the KMV property — operators/sketch.py uses the same
    trick for distinct counting).

    One exchange: hash is per-row codegen, the pick is a per-group
    window ordered by (hash, id).  Changing ``salt`` redraws the
    sample; growing ``k`` only ADDS rows (nested samples — the
    train-data debugging property).

    Returns the sampled rows as ``(group..., id, h)``.
    """
    from pyspark.sql import Window

    h = hash_u60([id_col], salt)
    w = Window.partitionBy(*group_cols).orderBy("h", id_col)
    return (df.select(*group_cols, F.col(id_col), h.alias("h"))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))
