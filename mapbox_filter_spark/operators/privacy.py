"""Location-privacy operators: k-anonymity generalization.

Reference parity: mapbox-filter has no privacy surface (filter/encode
only); this extends the engine's curation family to the standard
release-safety transforms a geo corpus needs before publication
(Sweeney 2002 k-anonymity; geohash truncation is the usual spatial
generalization hierarchy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["k_anonymity_generalize"]


def k_anonymity_generalize(pts: DataFrame, k: int, precision: int, *,
                           id_col: str = "id",
                           gh_col: str = "gh") -> DataFrame:
    """Per-point spatial k-anonymity via the geohash generalization
    ladder: each point is published at the FINEST geohash prefix whose
    occupancy (over this dataset) is ≥ k; points whose 1-character
    cell still holds < k peers are fully suppressed (prec 0, NULL
    cell) — never released under-k.  The spatial instance of
    Sweeney's generalize-then-suppress.

    Exactness: prefix truncation + integer counts only — the chosen
    precision, cell, and occupancy value-hash exactly.

    Scale shape: one ×precision prefix explode (tiny strings), ONE
    map-side-combinable count per (prefix-length, cell), then a
    broadcast-able join of the (small) over-k count table back onto
    the prefixes and a per-point max-struct fold.  No windows, no
    per-point loop; the hierarchy depth is the literal ``precision``.

    PRIVACY CAVEAT (r6 note — the classic local-recoding/minimality
    leak): occupancy is counted over ALL points in a cell, but peers
    counted toward a cell may themselves publish at a FINER precision,
    so the set actually RELEASED at a given (prec, cell) can be
    smaller than k; an adversary who knows the rule can subtract dense
    sub-cells and narrow the anonymity set below k.  For a strict
    guarantee use global/top-down recoding (count only records that
    would publish at exactly that level), or audit the released
    cardinalities with :func:`l_diversity_audit` and suppress cells
    whose released (not ladder) occupancy falls below k.

    Returns ``(id, prec, cell, cell_count)``.
    """
    if k < 1 or precision < 1:
        raise ValueError("k and precision must be positive")
    base = pts.select(F.col(id_col).alias("id"),
                      F.col(gh_col).substr(1, precision).alias("_g"))
    pref = base.select(
        "id", F.explode(F.transform(
            F.sequence(F.lit(1), F.lit(precision)),
            lambda p: F.struct(
                p.cast("int").alias("p"),
                F.col("_g").substr(F.lit(1), p).alias("cell"))))
        .alias("_e")).select("id", "_e.p", "_e.cell")
    cnt = (pref.groupBy("p", "cell")
           .agg(F.count(F.lit(1)).alias("cell_count"))
           .filter(F.col("cell_count") >= k))
    best = (pref.join(F.broadcast(cnt), ["p", "cell"])
            .groupBy("id")
            .agg(F.max(F.struct("p", "cell", "cell_count"))
                 .alias("_b")))
    return (base.join(best, "id", "left")
            .select("id",
                    F.coalesce(F.col("_b.p"), F.lit(0)).alias("prec"),
                    F.col("_b.cell").alias("cell"),
                    F.col("_b.cell_count").alias("cell_count")))


def l_diversity_audit(pts: DataFrame, k: int, precision: int, l: int, *,
                      id_col: str = "id", gh_col: str = "gh",
                      sensitive_col: str = "s") -> DataFrame:
    """l-diversity audit of a k-anonymized release (Machanavajjhala
    2007): k-anonymity alone leaks when every member of a published
    cell shares the same sensitive value — this audits each PUBLISHED
    cell (the output of :func:`k_anonymity_generalize` at the same k
    and hierarchy) for at least ``l`` distinct sensitive values.

    Exact counts + COUNT(DISTINCT) only — value-hashes exactly.  One
    extra join of the sensitive attribute onto the generalization and
    one distinct-aggregate per cell.

    Returns ``(prec, cell, n, n_sensitive, diverse)`` — suppressed
    points (prec 0) are audited as their own NULL-cell row, which is
    trivially non-diverse and must stay suppressed.
    """
    if l < 1:
        raise ValueError("l must be positive")
    gen = k_anonymity_generalize(pts, k, precision,
                                 id_col=id_col, gh_col=gh_col)
    sens = pts.select(F.col(id_col).alias("id"),
                      F.col(sensitive_col).alias("_s"))
    j = gen.join(sens, "id")
    return (j.groupBy("prec", "cell")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("_s").alias("n_sensitive"))
            .withColumn("diverse",
                        F.col("cell").isNotNull()
                        & (F.col("n_sensitive") >= l)))


def _dlap_thresholds(epsilon: float, z_max: int) -> list[int]:
    """Quantized CDF thresholds of the discrete Laplace DL(e^{-ε})
    on the clamped support [-z_max, z_max]: T_k = floor(F(k)·2⁶⁰)
    for k in [-z_max, z_max-1].  Computed ONCE in Python and baked as
    integer literals into both engines' plans, so the draw is an
    exact-integer comparison ladder — no cross-engine exp/ln.
    """
    import math
    a = math.exp(-epsilon)
    ts = []
    for k in range(-z_max, z_max):
        if k < 0:
            f = a ** (-k) / (1.0 + a)
        else:
            f = 1.0 - a ** (k + 1) / (1.0 + a)
        ts.append(int(f * float(1 << 60)))
    return ts


def dp_histogram(df: DataFrame, key_cols: list[str], *,
                 epsilon: float, salt: str, z_max: int = 16,
                 out: str = "n_noisy") -> DataFrame:
    """ε-differentially-private histogram release: per-cell exact
    count + two-sided-geometric (discrete Laplace) noise, the discrete
    mechanism of Ghosh-Roughgarden-Sundararajan 2009.  The draw is
    DETERMINISTIC — a keyed-PRF instance of seeded-noise DP: u =
    md5-u60(salt, cell key) inverted through the quantized DL CDF via
    :func:`_dlap_thresholds`, so the release value-hashes exactly
    across engines and replays stably under retries (the production
    property a re-run pipeline needs: the same release, not a fresh
    draw that would burn privacy budget).  Noise is clamped to
    ±z_max (tail mass α^{z_max}/(1+α), documented utility bias);
    negative noisy counts post-process to 0.

    Scale shape: ONE map-side-combinable count per cell; the noise
    ladder is 2·z_max literal integer comparisons in whole-stage
    codegen — nothing leaves the JVM, no second shuffle.

    Returns ``(*key_cols, out)`` — the true count never appears in
    the output.

    PRIVACY CAVEAT (r6 correction): rows are emitted only for cells
    PRESENT in the input (groupBy over observed keys), so a cell's
    presence in the release distinguishes true count ≥ 1 from 0 with
    certainty — over a data-dependent key domain the mechanism is not
    ε-DP as stated.  For a strict guarantee, complete a FIXED public
    key domain with zero counts before calling (then every cell gets a
    noisy row), or post-filter to noisy counts above a stability
    threshold τ and document the weaker (ε, δ)-DP.  The engine keeps
    the observed-domain shape because completing an open domain is a
    caller decision (the public domain is not derivable from the data
    without the same leak).
    """
    from .splits import hash_u60

    if z_max < 1 or epsilon <= 0:
        raise ValueError("epsilon > 0 and z_max >= 1 required")
    cnt = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    u = hash_u60(list(key_cols), salt)
    z = sum((F.when(u >= F.lit(t), 1).otherwise(0)
             for t in _dlap_thresholds(epsilon, z_max)),
            F.lit(-z_max))
    return cnt.select(*key_cols,
                      F.greatest(F.col("_n") + z, F.lit(0)).alias(out))


def t_closeness_audit(pts: DataFrame, k: int, precision: int, *,
                      id_col: str = "id", gh_col: str = "gh",
                      sensitive_col: str = "s") -> DataFrame:
    """t-closeness audit of a k-anonymized release (Li, Li &
    Venkatasubramanian 2007) — the leak past l-diversity: a cell can
    hold l distinct sensitive values yet still have a distribution so
    SKEWED against the corpus that membership is informative.  For
    ORDINAL sensitive attributes the distance is the Earth-Mover /
    W₁ between the cell's distribution and the global one:

        t_cell = Σ_k |F_cell(k) − F_global(k)| / (K − 1)

    computed EXACTLY as Σ|cum_c·N − cum_g·n_c| over the completed
    category grid, one division by n_c·N·(K−1) — the wasserstein_1d
    recipe applied per published cell.

    Shape: rides :func:`k_anonymity_generalize`'s output; one
    (cell, category) count + two cumulative windows over the SMALL
    category grid + one per-cell fold — nothing rescans the points
    after the generalization join.

    Returns ``(prec, cell, n, t_w1, worst_cat_gap)`` — suppressed
    points audit as the NULL cell.
    """
    gen = k_anonymity_generalize(pts, k, precision,
                                 id_col=id_col, gh_col=gh_col)
    sens = pts.select(F.col(id_col).alias("id"),
                      F.col(sensitive_col).cast("long").alias("_s"))
    j = gen.join(sens, "id").select("prec", "cell", "_s")
    cellcat = (j.groupBy("prec", "cell", "_s")
               .agg(F.count(F.lit(1)).alias("_c")))
    cats = j.select("_s").distinct()
    cells = (cellcat.groupBy("prec", "cell")
             .agg(F.sum("_c").alias("n")))
    # suppressed points live in the NULL cell — the completion join
    # must be null-SAFE on cell or their counts silently read 0
    cc2 = (cellcat.withColumnRenamed("prec", "_p2")
           .withColumnRenamed("cell", "_cell2")
           .withColumnRenamed("_s", "_s2"))
    grid = (cells.crossJoin(cats)
            .join(cc2, (F.col("prec") == F.col("_p2"))
                  & F.col("cell").eqNullSafe(F.col("_cell2"))
                  & (F.col("_s") == F.col("_s2")), "left")
            .select("prec", "cell", "n", "_s",
                    F.coalesce(F.col("_c"), F.lit(0)).alias("_c")))
    glob = (j.groupBy("_s").agg(F.count(F.lit(1)).alias("_g")))
    # corpus size and category count stay IN-PLAN (one broadcast
    # cross join of a global aggregate): driver-side counts would run
    # the whole generalization pipeline once per scalar
    tot = j.groupBy().agg(F.count(F.lit(1)).alias("_N"),
                          F.countDistinct("_s").alias("_K"))
    wcum = (Window.partitionBy("prec", "cell").orderBy("_s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wgcum = (Window.orderBy("_s")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    gcum = glob.select("_s", F.sum("_g").over(wgcum).alias("_gc"))
    terms = (grid.join(F.broadcast(gcum), "_s")
             .crossJoin(F.broadcast(tot))
             .select("prec", "cell", "n", "_s", "_N", "_K",
                     F.sum("_c").over(wcum).alias("_cc"), "_gc"))
    gap = F.abs(F.col("_cc") * F.col("_N")
                - F.col("_gc") * F.col("n"))
    per = (terms.groupBy("prec", "cell", "n", "_N", "_K")
           .agg(F.sum(gap).alias("_sg"), F.max(gap).alias("_mg")))
    den = (F.col("n") * F.col("_N")
           * F.greatest(F.col("_K") - 1, F.lit(1))).cast("double")
    return per.select(
        "prec", "cell", "n",
        (F.col("_sg").cast("double") / den).alias("t_w1"),
        (F.col("_mg").cast("double")
         / (F.col("n") * F.col("_N")).cast("double"))
        .alias("worst_cat_gap"))


def randomized_response(df: DataFrame, key_cols: list, *,
                        bit_col: str, id_col: str, salt: str,
                        p_num: int = 3, p_den: int = 4) -> DataFrame:
    """Warner randomized response (Warner 1965, the local-DP
    primitive): each respondent reports the TRUTH of its private bit
    with probability p = p_num/p_den and the flipped bit otherwise;
    the aggregator debiases the observed rate per group:

        π̂ = (obs − n(1−p)) / (n(2p−1))
           = (p_den·obs − (p_den−p_num)·n) / ((2p_num−p_den)·n)

    — one exact-integer rational per group.  The coin is the
    deterministic md5-u60 coordinate of (salt, id) against the integer
    threshold floor(p·2⁶⁰): a keyed-PRF instance of seeded local DP,
    replay-stable like dp_histogram (re-running the release must not
    draw fresh coins).

    Requires p > 1/2 (p_num·2 > p_den) so the debias denominator is
    positive.  Scale shape: the flip is one comparison per row; the
    rest is a single map-side-combinable groupBy.

    Returns ``(*key_cols, n, n_yes, pi_hat)`` — only the flipped bits
    ever aggregate; the true per-row bit never leaves the row scope.
    """
    from .splits import SCALE_U60, hash_u60

    if 2 * p_num <= p_den or p_num > p_den:
        raise ValueError("need 1/2 < p = p_num/p_den <= 1")
    thr = (p_num * SCALE_U60) // p_den
    truth = F.col(bit_col).cast("boolean")
    keep = hash_u60([id_col], salt) < F.lit(thr)
    reported = F.when(keep, truth).otherwise(~truth)
    agg = (df.select(*key_cols, reported.alias("_r"))
           .groupBy(*key_cols)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_r").cast("long")).alias("n_yes")))
    num = p_den * F.col("n_yes") - (p_den - p_num) * F.col("n")
    den = (2 * p_num - p_den) * F.col("n")
    return agg.select(*key_cols, "n", "n_yes",
                      (num.cast("double") / den.cast("double"))
                      .alias("pi_hat"))
