"""Rank statistics — Spearman correlation per group with EXACT
tie-corrected ranks.

Why ranks stay exact: the tie-corrected (average) rank of a value in a
tie group of size c starting at dense position r is r + (c-1)/2 — a
half-integer.  DOUBLING it gives ``2·avg = 2·RANK() + c - 1``, an exact
long from two window functions, so every Pearson-on-ranks sum
(Σx, Σx², Σxy over the doubled ranks) is exact integer arithmetic; the
scale factor cancels in the correlation ratio.

rho = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²)) evaluated as one
pinned chain — long→double conversions, √, ·, / are all
correctly-rounded IEEE ops, so the double bit-matches any engine
running the same chain on the same exact longs.  Degenerate groups
(a constant column ⇒ zero variance) are guarded by an INTEGER
condition on both engines (NULL, never a NULL-vs-NaN split).

Scale shape: two rank windows + one groupBy, ALL partitioned by the
same group key — Spark plans a single exchange (the trajectory_stats
discipline).  Ranks are per-group sorts, the unavoidable cost of rank
statistics; a hot group is a heavy_hitters-detectable cap case.

Exactness bound: n·Σ(2r)² ≤ 4n⁴ must fit int64, so groups are capped
at ``_MAX_GROUP_ROWS`` (38,000) rows — enforced IN the plan with
``raise_error`` (never a silent wrap).  Bigger groups should be
pre-sampled (stratified_sample) or bucketed by a secondary key;
rank statistics on 10⁹-row groups want a sketch, not exact ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_corr", "mann_whitney_u", "ks_2samp", "kendall_tau",
           "kruskal_wallis", "pettitt_test", "friedman_test", "bh_fdr",
           "kendalls_w", "wasserstein_1d", "cvm_2samp", "cliffs_delta",
           "wilcoxon_signed_rank", "jonckheere_trend", "somers_d",
           "ansari_bradley", "page_trend", "storey_qvalue",
           "seasonal_mann_kendall", "ad_2samp"]

# 4n^4 < 2^63  =>  n <= 38,000 keeps every sum exact in int64
_MAX_GROUP_ROWS = 38_000

# kendall_tau materializes n(n-1)/2 pairs per group: 20k rows -> 2e8
# pairs is the practical single-group ceiling before the pair join
# (not int64 exactness) dominates; enforced in-plan like spearman
_KENDALL_MAX_GROUP_ROWS = 20_000



def _pairs_n2(n):
    """Exact n*(n-1)/2 for a non-negative long column at ANY magnitude:
    n*(n-1) is always even, so split the halving onto the even factor and
    stay in pure int64 ops — no double-based floor_div (inexact past 2^53,
    ADVICE r5) and no premature n*(n-1) overflow (n can pass 2^31.5)."""
    n = n.cast("long")
    return F.when(F.pmod(n, F.lit(2)) == 0,
                  F.shiftright(n, 1) * (n - 1))         .otherwise(n * F.shiftright(n - 1, 1))

def _rank2(group_cols, v):
    w = Window.partitionBy(*group_cols).orderBy(v)
    ties = Window.partitionBy(*group_cols, v)
    return (F.rank().over(w) * 2 + F.count(F.lit(1)).over(ties)
            - 1).cast("long")


def spearman_corr(df: DataFrame, group_cols: "list[str]",
                  x_col: str, y_col: str) -> DataFrame:
    """Per-group Spearman rho over exact integer columns ``x_col`` /
    ``y_col``: ``(group..., n, s_num, d_x, d_y, rho)`` where
    ``s_num = nΣxy − ΣxΣy`` and ``d_x/d_y`` are the variance terms of
    the doubled ranks (all exact longs), ``rho`` the IEEE ratio (NULL
    when either variance term is zero)."""
    rx = _rank2(group_cols, F.col(x_col)).alias("_rx")
    ry = _rank2(group_cols, F.col(y_col)).alias("_ry")
    r = df.select(*group_cols, rx, ry)
    agg = r.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rx").alias("_sx"), F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"))
    n = F.col("n")
    s_num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
    d_x = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
    d_y = (n * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    rho = F.when(
        n > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("spearman_corr: group exceeds exact-int64 bound "
                  f"({_MAX_GROUP_ROWS} rows): n="), n.cast("string")))
        .cast("double")
    ).when(
        (d_x > 0) & (d_y > 0),
        s_num.cast("double")
        / (F.sqrt(d_x.cast("double")) * F.sqrt(d_y.cast("double"))))
    return agg.select(*group_cols, "n", s_num.alias("s_num"),
                      d_x.alias("d_x"), d_y.alias("d_y"),
                      rho.alias("rho"))


def mann_whitney_u(df: DataFrame, group_cols: "list[str]",
                   flag_col: str, value_col: str) -> DataFrame:
    """Per-group Mann-Whitney U (Wilcoxon rank-sum) between the rows
    where ``flag_col`` is true (sample 1) and false (sample 2) — the
    distribution-shift detector that needs no normality assumption.

    Exactness: combined tie-corrected doubled ranks (the spearman_corr
    machinery) make 2·R₁ an exact long, so
    ``u2 = 2·U₁ = 2·R₁ − n₁(n₁+1)`` is exact; the rank-biserial effect
    size ``rbc = 1 − u2/(n₁·n₂)`` is one pinned divide.  The normal
    z-approximation needs Σ(t³−t) tie sums that overflow int64 around
    n ≈ 10⁵ — deliberately NOT computed here; rbc is the scale-safe
    effect measure (compute p-values on the collected per-group rows
    driver-side if needed: the output is O(groups)).

    Same single-exchange shape and ``_MAX_GROUP_ROWS``-style bound as
    spearman_corr: 2·R₁ ≤ 2n² stays exact far past any per-group size
    the rank sort itself would tolerate.

    Returns ``(group..., n1, n2, u2, rbc)``.
    """
    # NULL flags/values are excluded BEFORE ranking: a null row would
    # occupy a pooled rank while counting in neither sample, silently
    # inflating U past the [-1,1] rbc range
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    r2 = _rank2(group_cols, F.col(value_col))
    flagged = clean.select(*group_cols,
                           F.col(flag_col).cast("boolean").alias("_f"),
                           r2.alias("_r2"))
    agg = flagged.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_f"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("_f"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("_f"), F.col("_r2")).otherwise(0))
        .alias("_r1x2"))
    staged = agg.withColumn(
        "u2", F.col("_r1x2") - F.col("n1") * (F.col("n1") + 1))
    rbc = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.lit(1.0) - F.col("u2").cast("double")
        / (F.col("n1") * F.col("n2")).cast("double"))
    return staged.select(*group_cols, "n1", "n2", "u2",
                         rbc.alias("rbc"))


def ks_2samp(df: DataFrame, group_cols: "list[str]",
             flag_col: str, value_col: str) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov statistic between the
    rows where ``flag_col`` is true (sample 1) and false (sample 2) —
    the strongest nonparametric distribution-shift screen (sensitive to
    location, scale, AND shape, where Mann-Whitney only sees location).

    Exactness: D = sup_x |F1(x) − F2(x)| is evaluated at the observed
    values only (the sup of a step-function difference is attained at a
    jump), and cross-multiplied to integers:
    ``d_num = max_x |n2·C1(x) − n1·C2(x)|`` over cumulative counts
    C1/C2 — every term an exact long, so d_num is exact and
    ``d_stat = d_num / (n1·n2)`` is one pinned divide.

    Scale shape: one groupBy on (group, value) collapses duplicates,
    then a cumulative window + a total window + the final max — all
    partitioned by the same group key, so Spark plans a SINGLE
    exchange.  No pair join, no per-group bound needed: n1·C1 ≤ n²
    stays exact to n ≈ 3·10⁹ rows per group.

    Returns ``(group..., n1, n2, d_num, d_stat)``; d_stat NULL when
    either sample is empty (integer guard on both engines).
    """
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    per_v = clean.groupBy(*group_cols, value_col).agg(
        F.sum(F.when(F.col(flag_col).cast("boolean"), 1).otherwise(0))
        .alias("_c1"),
        F.sum(F.when(~F.col(flag_col).cast("boolean"), 1).otherwise(0))
        .alias("_c2"))
    w_cum = (Window.partitionBy(*group_cols)
             .orderBy(F.col(value_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*group_cols)
    stepped = per_v.select(
        *group_cols,
        F.sum("_c1").over(w_all).alias("_n1"),
        F.sum("_c2").over(w_all).alias("_n2"),
        F.sum("_c1").over(w_cum).alias("_cum1"),
        F.sum("_c2").over(w_cum).alias("_cum2"))
    diff = F.abs(F.col("_n2") * F.col("_cum1")
                 - F.col("_n1") * F.col("_cum2"))
    agg = stepped.groupBy(*group_cols).agg(
        F.max("_n1").alias("n1"), F.max("_n2").alias("n2"),
        F.max(diff).alias("d_num"))
    d_stat = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.col("d_num").cast("double")
        / (F.col("n1") * F.col("n2")).cast("double"))
    return agg.select(*group_cols, "n1", "n2", "d_num",
                      d_stat.alias("d_stat"))


def _pair_concordance(df: DataFrame, group_cols: "list[str]",
                      x_col: str, y_col: str, caller: str) -> DataFrame:
    """Shared exact pair-concordance counts behind kendall_tau and
    somers_d: ONE bounded per-group self pair join (i < j on a
    ROW_NUMBER — the unordered-pair counts are label-invariant) →
    ``(group..., n, _c, _d, _tx, _ty, _txy)`` — concordant,
    discordant, x-tied, y-tied, tied-in-both pair counts, all exact
    longs.  Group size is capped in-plan at
    ``_KENDALL_MAX_GROUP_ROWS`` (raise_error, never a silent pair
    explosion)."""
    clean = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(F.col(x_col), F.col(y_col))
    r = clean.select(
        *group_cols,
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
        F.row_number().over(w).alias("_i"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("_n"))
    guard = F.when(
        F.col("_n") > _KENDALL_MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit(f"{caller}: group exceeds pair-join bound "
                  f"({_KENDALL_MAX_GROUP_ROWS} rows): n="),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_i"))
    r = r.withColumn("_i", guard)
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(b, [F.col(f"a.{c}") == F.col(f"b.{c}")
                       for c in group_cols] + [F.col("a._i") < F.col("b._i")])
    sx = F.signum((F.col("a._x") - F.col("b._x")).cast("double"))
    sy = F.signum((F.col("a._y") - F.col("b._y")).cast("double"))
    return pairs.groupBy(*[F.col(f"a.{c}").alias(c)
                           for c in group_cols]).agg(
        F.max(F.col("a._n")).alias("n"),
        F.sum(F.when(sx * sy > 0, 1).otherwise(0)).alias("_c"),
        F.sum(F.when(sx * sy < 0, 1).otherwise(0)).alias("_d"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).alias("_tx"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).alias("_ty"),
        F.sum(F.when((sx == 0) & (sy == 0), 1).otherwise(0))
        .alias("_txy"))


def kendall_tau(df: DataFrame, group_cols: "list[str]",
                x_col: str, y_col: str) -> DataFrame:
    """Per-group Kendall tau-b over exact integer columns — the
    concordance-based rank correlation (more robust to outlier ranks
    than Spearman; the standard agreement measure between two rankers).

    Exactness: every count is an exact long from one pair join —
    concordant C, discordant D, x-ties n1 (xᵢ=xⱼ), y-ties n2 — and
    ``tau = (C−D) / (√(n0−n1)·√(n0−n2))`` with ``n0 = n(n−1)/2`` is the
    same pinned long→double/√/·// chain as spearman_corr (bit-stable
    cross-engine).  Pairs tied in BOTH columns count in n1 and n2 and
    in neither C nor D (the tau-b convention).

    Scale shape: rows get a per-group ROW_NUMBER (any total order — the
    unordered-pair counts are label-invariant), then ONE self
    sort-merge join on the group key filtered to i<j: O(n²/group)
    pairs, the inherent cost of exact tau.  Groups are capped at
    ``_KENDALL_MAX_GROUP_ROWS`` in-plan (raise_error, never a silent
    explosion); bigger groups want a sample (dataset_split /
    stratified) or Spearman, whose rank windows stay O(n log n).

    Returns ``(group..., n, c_minus_d, d_x, d_y, tau)`` — d_x/d_y the
    tie-corrected pair-count denominators (exact longs), tau NULL when
    either is zero (constant column).
    """
    agg = _pair_concordance(df, group_cols, x_col, y_col, "kendall_tau")
    n0 = _pairs_n2(F.col("n"))
    d_x = (n0 - F.col("_tx"))
    d_y = (n0 - F.col("_ty"))
    num = (F.col("_c") - F.col("_d"))
    tau = F.when(
        (d_x > 0) & (d_y > 0),
        num.cast("double")
        / (F.sqrt(d_x.cast("double")) * F.sqrt(d_y.cast("double"))))
    return agg.select(*group_cols, "n", num.alias("c_minus_d"),
                      d_x.alias("d_x"), d_y.alias("d_y"),
                      tau.alias("tau"))


_THEILSEN_MAX_GROUP_ROWS = 4000


def theil_sen(df: DataFrame, group_cols: "list[str]",
              x_col: str, y_col: str) -> DataFrame:
    """Per-group Theil–Sen estimator: the LOWER MEDIAN of the pairwise
    slopes (yⱼ−yᵢ)/(xⱼ−xᵢ) over xᵢ<xⱼ — the classic robust trend line
    (breakdown point 29%, vs 0% for the OLS ``trend_slope``).

    Exactness: inputs must be integer columns; each candidate slope is
    carried as the exact rational ``(dy, dx)`` with ``dx > 0`` plus its
    IEEE quotient (one division on exact longs — bit-identical across
    engines), and the median is SELECTED, not averaged: the
    ``⌈k/2⌉``-th row of the total order ``(slope, dy, dx)``.  Ties
    between distinct rationals that round to the same double are broken
    by the exact numerator/denominator, so the selection is fully
    deterministic on any engine.

    Scale shape: one per-group ROW_NUMBER pass, ONE self equi-join on
    the group key filtered to xᵢ<xⱼ (O(n²/group) pairs — the inherent
    cost of exact Theil–Sen), one window median selection.  Group size
    is capped in-plan at ``_THEILSEN_MAX_GROUP_ROWS`` via raise_error —
    never a silent quadratic explosion; bigger groups want a
    deterministic pre-sample (dataset_split) first.

    Returns ``(group..., n_pts, n_pairs, med_dy, med_dx, slope)``;
    groups with fewer than 2 distinct x values drop out (no pair has
    dx > 0... they produce zero pairs).
    """
    clean = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    def _as_long(c: str):
        # integer-only contract enforced in-plan: a double input would
        # otherwise silently truncate into a confidently wrong slope
        v = F.col(c)
        return F.when(
            v.cast("double") != v.cast("long").cast("double"),
            F.raise_error(F.concat(
                F.lit(f"theil_sen: non-integer value in {c}: "),
                v.cast("string"))).cast("long")
        ).otherwise(v.cast("long"))

    n_w = Window.partitionBy(*group_cols)
    r = clean.select(
        *group_cols,
        _as_long(x_col).alias("_x"),
        _as_long(y_col).alias("_y"),
        F.count(F.lit(1)).over(n_w).alias("_n"))
    guard = F.when(
        F.col("_n") > _THEILSEN_MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("theil_sen: group exceeds pair-join bound "
                  f"({_THEILSEN_MAX_GROUP_ROWS} rows): n="),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))
    r = r.withColumn("_n", guard)
    a, b = r.alias("a"), r.alias("b")
    pairs = (a.join(b, [F.col(f"a.{c}") == F.col(f"b.{c}")
                        for c in group_cols]
                    + [F.col("a._x") < F.col("b._x")])
             .select(*[F.col(f"a.{c}").alias(c) for c in group_cols],
                     F.col("a._n").alias("n_pts"),
                     (F.col("b._y") - F.col("a._y")).alias("dy"),
                     (F.col("b._x") - F.col("a._x")).alias("dx")))
    pairs = pairs.withColumn(
        "slope", F.col("dy").cast("double") / F.col("dx").cast("double"))
    sel = Window.partitionBy(*group_cols).orderBy("slope", "dy", "dx")
    from ..geo.tilemath import floor_div
    ranked = pairs.select(
        *group_cols, "n_pts", "dy", "dx", "slope",
        F.row_number().over(sel).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("n_pairs"))
    return (ranked
            .filter(F.col("_rn") == floor_div(F.col("n_pairs") + 1, 2))
            .select(*group_cols, "n_pts", "n_pairs",
                    F.col("dy").alias("med_dy"),
                    F.col("dx").alias("med_dx"), "slope"))


def runs_test(df: DataFrame, group_cols: "list[str]", order_cols,
              value_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test for sequence randomness, per group.

    Each group's values (exact integers — quantize upstream) are
    dichotomized against the group's EXACT lower median (the
    ``⌈n/2⌉``-th order statistic, rank with row_number over (value,
    order) — fully deterministic); values equal to the median are
    DROPPED (the standard treatment).  The run count R is then
    ``1 + Σ[sign ≠ lag(sign)]`` over ``order_cols``.

    Exact outputs: ``(group..., n1, n0, runs)`` plus the z statistic
    as one pinned double chain over exact int64 terms::

        z = (n·(R−1) − 2·n1·n0) · √(n−1) / √(2·n1·n0·(2·n1·n0 − n))

    (algebraic rearrangement of (R−μ)/σ with μ = 1 + 2n1n0/n so every
    pre-√ term is an exact integer; n = n1+n0).  int64 bound: 2n1n0 ≤
    n²/2, and the radicand 2n1n0·(2n1n0−n) needs n ≤ ~55k — enforced
    in-plan via raise_error (_MAX_GROUP_ROWS, same bound discipline as
    spearman).  z is NULL when n1·n0 = 0 (all values on one side).
    """
    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)
    v = F.col(value_col).cast("long")
    # exact lower median per group
    wrank = Window.partitionBy(*group_cols).orderBy(v, *order_cols)
    ranked = df.select(*group_cols, *order_cols,
                       v.alias("_v"),
                       F.row_number().over(wrank).alias("_r"))
    med = (ranked.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("_n_all"))
           .select(*group_cols,
                   ((F.col("_n_all") + 1) / 2).cast("long")
                   .alias("_medrank")))
    with_med = (ranked.join(med, group_cols)
                .withColumn("_is_med", F.col("_r") == F.col("_medrank")))
    medval = (with_med.filter(F.col("_is_med"))
              .select(*group_cols, F.col("_v").alias("_med")))
    signed = (ranked.join(medval, group_cols)
              .filter(F.col("_v") != F.col("_med"))
              .withColumn("_s", (F.col("_v") > F.col("_med"))
                          .cast("int")))
    wseq = Window.partitionBy(*group_cols).orderBy(*order_cols)
    runs = signed.withColumn(
        "_chg",
        F.when(F.lag("_s").over(wseq).isNull(), 1)
        .when(F.lag("_s").over(wseq) != F.col("_s"), 1).otherwise(0))
    agg = runs.groupBy(*group_cols).agg(
        F.sum("_s").cast("long").alias("n1"),
        F.sum(1 - F.col("_s")).cast("long").alias("n0"),
        F.sum("_chg").cast("long").alias("runs"))
    n = (F.col("n1") + F.col("n0"))
    guard = F.when(
        n > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("runs_test: group exceeds exact-int64 bound "
                  f"({_MAX_GROUP_ROWS} rows): n="), n.cast("string")))
        .cast("double"))
    a = n * (F.col("runs") - 1) - 2 * F.col("n1") * F.col("n0")
    rad = (2 * F.col("n1") * F.col("n0")
           * (2 * F.col("n1") * F.col("n0") - n))
    z = guard.otherwise(
        F.when((F.col("n1") > 0) & (F.col("n0") > 0) & (rad > 0),
               a.cast("double") * F.sqrt((n - 1).cast("double"))
               / F.sqrt(rad.cast("double"))))
    return agg.select(*group_cols, "n1", "n0", "runs", z.alias("z"))


# N³ − N must fit int64 for the tie correction: N ≤ 2·10⁶
_KW_MAX_POOLED_ROWS = 2_000_000


def kruskal_wallis(df: DataFrame, part_cols: "list[str]",
                   group_col: str, value_col: str) -> DataFrame:
    """Kruskal-Wallis H test — the k-group generalisation of
    mann_whitney_u (does ``value_col``'s distribution differ across
    the ``group_col`` categories?), computed independently per
    ``part_cols`` partition.

    Exactness: pooled tie-corrected DOUBLED ranks (the spearman_corr
    ``2·RANK() + t − 1`` identity) make every per-group rank sum
    ``R2_g = 2·R_g`` an exact long; with ties of size t each ranked
    row contributes ``t² − 1`` to the partition's tie correction, so
    ``Σ_rows (t²−1) = Σ_ties (t³−t)`` is ALSO one exact long per
    partition — no counts-of-counts pass.  The statistic is then

        H   = 3·Σ_g R2_g²/n_g / (N·(N+1)) − 3·(N+1)
        H_c = H / (1 − Σ(t³−t)/(N³−N))

    where the Σ_g fold runs in group-key-sorted PINNED order (the
    chi_square discipline — a float groupBy sum has nondeterministic
    addend order) and every division is a pinned IEEE chain over the
    exact longs.  H_c is NULL when the partition is degenerate
    (k < 2, N ≤ 1, or all values tied ⇒ the correction hits 0).

    int64 bound: N³ − N needs N ≤ 2·10⁶ pooled rows per partition —
    enforced IN-PLAN via raise_error (never a silent wrap);
    pre-sample (stratified_sample / bottomk_sample) above that.

    Scale shape: one rank window + one (part, group) groupBy + the
    per-partition fold over the TINY k-row group table — all
    partitioned by the same leading keys, a single exchange.

    Returns ``(part..., n, k, tie_sum, h, h_c)``.
    """
    v = F.col(value_col)
    clean = df.filter(v.isNotNull()
                      & F.col(group_col).isNotNull())
    w = Window.partitionBy(*part_cols).orderBy(v)
    wt = Window.partitionBy(*part_cols, v)
    t = F.count(F.lit(1)).over(wt)
    ranked = clean.select(
        *part_cols, F.col(group_col).alias("_g"),
        (F.rank().over(w) * 2 + t - 1).cast("long").alias("_r2"),
        (t.cast("long") * t.cast("long") - 1).alias("_tt"))
    per_g = ranked.groupBy(*part_cols, "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n_g"),
        F.sum("_r2").cast("long").alias("_r2_g"),
        F.sum("_tt").cast("long").alias("_tt_g"))
    term = ((F.col("_r2_g").cast("double")
             * F.col("_r2_g").cast("double"))
            / F.col("_n_g").cast("double"))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("_g").alias("g"), term.alias("t"))))
    agg = per_g.groupBy(*part_cols).agg(
        F.sum("_n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_tt_g").cast("long").alias("tie_sum"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["t"]).alias("_fold"))
    n = F.col("n")
    guard = F.when(
        n > _KW_MAX_POOLED_ROWS,
        F.raise_error(F.concat(
            F.lit("kruskal_wallis: partition exceeds exact-int64 "
                  f"bound ({_KW_MAX_POOLED_ROWS} rows): n="),
            n.cast("string"))).cast("double"))
    nd = n.cast("double")
    h = guard.otherwise(F.when(
        (F.col("k") >= 2) & (n > 1),
        F.lit(3.0) * F.col("_fold") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))))
    # N³ − N exact long under the guard; correction = 1 − ties/(N³−N)
    n3n = (n * n * n - n)
    c = F.lit(1.0) - F.col("tie_sum").cast("double") / n3n.cast("double")
    h_c = F.when((F.col("k") >= 2) & (n > 1) & (n3n > F.col("tie_sum")),
                 h / c)
    return agg.select(*part_cols, "n", "k", "tie_sum",
                      h.alias("h"), h_c.alias("h_c"))


def pettitt_test(df: DataFrame, group_cols: "list[str]", order_cols,
                 value_col: str) -> DataFrame:
    """Pettitt rank-based changepoint test per group — the
    distribution-free "did the level shift, and when?" statistic for
    a time-ordered series: K = max_t |U_t| with
    U_t = Σ_{i≤t} Σ_{j>t} sgn(xᵢ − xⱼ).

    Exactness: via the rank identity U_t = 2·W_t − t(n+1) (W_t the
    cumulative sum of tie-corrected average ranks), the DOUBLED ranks
    r2 = 2·RANK + ties − 1 give ``U_t = cumsum(r2)_t − t·(n+1)``
    directly — every term an exact long (no halves).  The argmax is
    resolved deterministically: max |U|, ties → smallest t; t ranges
    over 1..n−1 (U_n ≡ 0).

    Scale shape: one rank window + one cumulative window + one argmax
    window, ALL partitioned by the same group key — a single exchange
    (the spearman_corr discipline).  Groups are capped at
    ``_MAX_GROUP_ROWS`` in-plan like every rank statistic here (the
    cumsum itself is safe far beyond — 2n² fits int64 to n ≈ 2·10⁹ —
    but the per-group sort cost is the real bound).

    Reference: Pettitt (1979, Applied Statistics) — public formula;
    the doubled-rank exact evaluation is this engine's.

    Returns ``(group..., n, t_star, u_at_t, k_stat)`` — one row per
    group with ≥ 2 rows (singletons have no interior split).
    """
    gcols = list(group_cols)
    ocols = [F.col(c) for c in (order_cols if isinstance(order_cols, list)
                                else [order_cols])]
    v = F.col(value_col).cast("long")
    d = df.select(*gcols, *[o.alias(f"_o{i}") for i, o in enumerate(ocols)],
                  v.alias("_v"))
    onames = [f"_o{i}" for i in range(len(ocols))]
    guard = Window.partitionBy(*gcols)
    d = d.withColumn("_n", F.count(F.lit(1)).over(guard))
    d = d.withColumn("_n", F.when(
        F.col("_n") > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("pettitt_test: group exceeds exact rank bound "
                  f"({_MAX_GROUP_ROWS}): n="),
            F.col("_n").cast("string"))).cast("long"))
        .otherwise(F.col("_n")))
    d = d.withColumn("_r2", _rank2(gcols, F.col("_v")))
    wt = (Window.partitionBy(*gcols)
          .orderBy(*[F.col(c) for c in onames])
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_t", F.row_number().over(
        Window.partitionBy(*gcols).orderBy(*[F.col(c) for c in onames])))
    d = d.withColumn(
        "_u", F.sum("_r2").over(wt) - F.col("_t") * (F.col("_n") + 1))
    interior = d.filter(F.col("_t") < F.col("_n"))
    pick = Window.partitionBy(*gcols).orderBy(
        F.abs(F.col("_u")).desc(), F.col("_t").asc())
    return (interior.withColumn("_pk", F.row_number().over(pick))
            .filter(F.col("_pk") == 1)
            .select(*gcols, F.col("_n").alias("n"),
                    F.col("_t").cast("long").alias("t_star"),
                    F.col("_u").alias("u_at_t"),
                    F.abs(F.col("_u")).alias("k_stat")))


def friedman_test(df: DataFrame, block_col: str, treat_col: str,
                  value_col: str) -> DataFrame:
    """Friedman test — the k-treatment repeated-measures rank test
    over COMPLETE blocks (every treatment observed in the block):
    "do the treatments differ, judged within each block?"  The
    blocked sibling of kruskal_wallis.

    Exactness: only blocks containing all k global treatments enter
    (an exact distinct-count filter); ranks within each block use the
    doubled tie-corrected form r2 = 2·RANK + ties − 1 (exact longs).
    With R2_j = Σ_blocks r2 the tie-corrected statistic (Conover's
    form; the 4s cancel between numerator and denominator under
    doubling)

        Q = (k−1) · Σ_j (R2_j − n(k+1))² / (Σ r2² − n·k·(k+1)²)

    has an exact int64 numerator and denominator — ONE pinned double
    division.  A constant-in-every-block field makes the denominator
    0 (all ranks tied) → Q NULL by integer guard.

    Scale shape: one distinct-count pre-pass + one rank window (both
    keyed by block) + one k-row aggregate; blocks are small by
    construction (k treatments), so no group cap is needed — the
    int64 bound Σr2² ≤ n·(2k)² holds to n ≈ 10¹⁴ blocks at k ≤ 100.

    Reference: Friedman (1937, JASA); Conover ("Practical
    Nonparametric Statistics") for the tie form — public formulas;
    the doubled-rank exact evaluation is this engine's.

    Returns ONE row ``(n_blocks, k, num, den, q_stat)``.
    """
    b, t = F.col(block_col), F.col(treat_col)
    v = F.col(value_col).cast("long")
    d = df.select(b.alias("_b"), t.alias("_t"), v.alias("_v"))
    k_tot = d.select(F.countDistinct("_t").alias("_k"))
    per_block = d.groupBy("_b").agg(
        F.countDistinct("_t").alias("_kb"), F.count(F.lit(1)).alias("_c"))
    complete = (per_block.crossJoin(F.broadcast(k_tot))
                .filter((F.col("_kb") == F.col("_k"))
                        & (F.col("_c") == F.col("_k")))
                .select("_b"))
    dd = d.join(complete, "_b")
    dd = dd.withColumn("_r2", _rank2(["_b"], F.col("_v")))
    per_treat = dd.groupBy("_t").agg(
        F.sum("_r2").alias("_R2"),
        F.sum(F.col("_r2") * F.col("_r2")).alias("_rsq"),
        F.count(F.lit(1)).alias("_n"))
    kk = per_treat.agg(F.count(F.lit(1)).alias("_kk"))
    dev = F.col("_R2") - F.col("_n") * (F.col("_kk") + 1)
    tot = (per_treat.crossJoin(F.broadcast(kk))
           .agg(F.max("_n").alias("n_blocks"),
                F.max("_kk").alias("k"),
                F.sum(F.col("_rsq")).alias("_allrsq"),
                F.sum(dev * dev).alias("_sq")))
    num = ((F.col("k") - 1) * F.col("_sq")).alias("num")
    den = (F.col("_allrsq") - F.col("n_blocks") * F.col("k")
           * (F.col("k") + 1) * (F.col("k") + 1)).alias("den")
    out = tot.select("n_blocks", "k", num, den)
    q = F.when(F.col("den") > 0,
               F.col("num").cast("double") / F.col("den").cast("double"))
    return out.withColumn("q_stat", q)


def bh_fdr(df: DataFrame, group_cols: "list[str]", id_col: str,
           p_num_col: str, p_den: int, *,
           alpha_num: int = 5, alpha_den: int = 100) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control per group — the
    multiple-testing gate a hotspot scan (getis_ord, local_moran,
    knox_test) or an A/B sweep (welch_t, conversion_z) runs before
    declaring any cell "significant" (Benjamini & Hochberg 1995):
    sort the m p-values ascending, find the largest k with
    p_(k) <= α·k/m, reject hypotheses 1..k.

    p-values arrive as EXACT RATIONALS ``p = p_num / p_den`` (the
    repo-wide integer discipline), so the step-up comparison

        p_num · α_den · m  <=  α_num · k · p_den

    is pure int64 arithmetic — no float thresholds, no cross-engine
    rounding (overflow bound: p_num·α_den·m < 2^63 ⇒ m ≲ 9·10^13 /
    p_den at α_den = 100).  Ties in p break deterministically by
    ``id_col``.

    Scale shape: every pass is keyed on the GROUP (the experiment /
    scan id): one rank window, one count window, one max window, all
    on the same key — a single exchange, no global sort, no driver
    collect.  The step-up coupling (k <= K*) is the windowed max of
    the passing ranks, not an iterative scan.

    Returns ``(*group_cols, id, p_num, k, m, rejected)`` with
    ``rejected`` int 0/1.
    """
    from pyspark.sql import Window

    p = F.col(p_num_col).cast("long")
    w = (Window.partitionBy(*group_cols)
         .orderBy(p.asc(), F.col(id_col).asc()))
    wg = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols, F.col(id_col).alias("id"),
        p.alias("p_num"),
        F.row_number().over(w).cast("long").alias("k"),
        F.count(F.lit(1)).over(wg).cast("long").alias("m"))
    passing = (F.col("p_num") * alpha_den * F.col("m")
               <= F.lit(alpha_num) * F.col("k") * F.lit(p_den))
    kstar = F.max(F.when(passing, F.col("k"))).over(wg)
    return ranked.select(
        *group_cols, "id", "p_num", "k", "m",
        F.when(F.col("k") <= F.coalesce(kstar, F.lit(0)),
               F.lit(1)).otherwise(F.lit(0)).alias("rejected"))


def kendalls_w(df: DataFrame, rater_col: str, item_col: str,
               value_col: str) -> DataFrame:
    """Kendall's coefficient of concordance W — do m independent
    raters (sources, shards, model variants) rank the same n items
    consistently? (Kendall & Babington Smith 1939.)  W=1 unanimous
    ordering, W≈0 no agreement; the multi-rater generalization of
    :func:`spearman_corr` (W relates to the mean pairwise Spearman ρ̄
    by W = (ρ̄(m−1)+1)/m).

    Input is the (rater, item, value) table; MISSING pairs read as
    value 0 (the grid is completed via distinct-raters × distinct-items
    before ranking, so every rater ranks every item).  Ties get
    average ranks with the standard correction term ΣT = Σ(t³−t).

    Exactness: average ranks are half-integers, so everything is
    carried ×2 — ``avg2 = 2·rank_min + (ties−1)`` is an exact long,
    per-item rank sums S2 = Σavg2 deviate from the exact mean m(n+1),
    and with S4 = Σ(S2 − m(n+1))² the statistic is the exact rational

        W = 3·S4 / (m²(n³−n) − m·ΣT)

    — numerator/denominator longs plus the one pinned double.

    Scale shape: grid completion is two tiny distinct aggregates +
    one left join on the (rater,item) key; then one rank window per
    RATER (the small axis) and one groupBy per ITEM — no pair joins,
    no global sort.

    Returns ``(m_raters, n_items, s4, tie_term, w_num, w_den, w)``.
    """
    v = F.col(value_col).cast("long")
    base = df.select(F.col(rater_col).alias("_r"),
                     F.col(item_col).alias("_i"), v.alias("_v"))
    raters = base.select("_r").distinct()
    items = base.select("_i").distinct()
    grid = (raters.crossJoin(items)
            .join(base, ["_r", "_i"], "left")
            .select("_r", "_i",
                    F.coalesce(F.col("_v"), F.lit(0)).alias("_v")))
    wr = Window.partitionBy("_r").orderBy(F.col("_v").asc())
    wt = Window.partitionBy("_r", "_v")
    ranked = grid.select(
        "_r", "_i", "_v",
        (F.lit(2) * F.rank().over(wr).cast("long")
         + F.count(F.lit(1)).over(wt).cast("long")
         - F.lit(1)).alias("_avg2"))
    mm = raters.agg(F.count(F.lit(1)).cast("long").alias("m_raters"))
    nn = items.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    s2 = ranked.groupBy("_i").agg(
        F.sum("_avg2").cast("long").alias("_s2"))
    s4 = (s2.crossJoin(mm).crossJoin(nn)
          .select(((F.col("_s2")
                    - F.col("m_raters") * (F.col("n_items") + 1))
                   * (F.col("_s2")
                      - F.col("m_raters") * (F.col("n_items") + 1)))
                  .alias("_d2"))
          .agg(F.sum("_d2").cast("long").alias("s4")))
    ties = (grid.groupBy("_r", "_v")
            .agg(F.count(F.lit(1)).cast("long").alias("_t"))
            .agg(F.coalesce(
                F.sum(F.col("_t") * F.col("_t") * F.col("_t")
                      - F.col("_t")), F.lit(0))
                .cast("long").alias("tie_term")))
    j = mm.crossJoin(nn).crossJoin(s4).crossJoin(ties)
    m = F.col("m_raters")
    n = F.col("n_items")
    w_den = (m * m * (n * n * n - n) - m * F.col("tie_term"))
    w_num = F.lit(3) * F.col("s4")
    return j.select(
        "m_raters", "n_items", "s4", "tie_term",
        w_num.alias("w_num"), w_den.alias("w_den"),
        F.when(w_den > 0, w_num.cast("double") / w_den.cast("double"))
        .alias("w"))


def wasserstein_1d(df: DataFrame, group_col: str, value_col: str,
                   group_a, group_b) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between two empirical
    distributions: W₁ = ∫|F_A − F_B| — the INTEGRAL counterpart of
    :func:`ks_2samp`'s supremum (KS sees the worst single gap, W₁
    sees total transported mass; drift monitors want both).

    Exact rational on the merged value grid: with cumulative counts
    cA, cB at each distinct value v and gap = next(v) − v,

        W₁ = Σ_v |cA·n_B − cB·n_A| · gap  /  (n_A · n_B)

    — numerator and denominator exact longs (every |·| term is a
    cross-multiplied integer; no per-point division), the distance
    itself one pinned double.

    Scale shape: one groupBy(value) with conditional counts, one
    value-ordered window for the cumulatives and the gap — a single
    global-sort window over the DISTINCT values (bounded by the value
    domain, not the row count), then a single-row reduce.

    Returns ``(n_a, n_b, w1_num, w1_den, w1)``.
    """
    v = F.col(value_col).cast("long")
    base = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        v.alias("_v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("_a"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("_b"))
    per_v = base.groupBy("_v").agg(
        F.sum("_a").cast("long").alias("_ca"),
        F.sum("_b").cast("long").alias("_cb"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    wl = Window.orderBy("_v")
    cum = per_v.select(
        "_v",
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        (F.lead("_v").over(wl) - F.col("_v")).alias("_gap"))
    tot = base.agg(F.sum("_a").cast("long").alias("n_a"),
                   F.sum("_b").cast("long").alias("n_b"))
    terms = cum.crossJoin(F.broadcast(tot)).filter(
        F.col("_gap").isNotNull())
    num = F.abs(F.col("_cuma") * F.col("n_b")
                - F.col("_cumb") * F.col("n_a")) * F.col("_gap")
    agg = terms.groupBy("n_a", "n_b").agg(
        F.coalesce(F.sum(num), F.lit(0)).cast("long").alias("w1_num"))
    den = F.col("n_a") * F.col("n_b")
    return agg.select(
        "n_a", "n_b", "w1_num", den.alias("w1_den"),
        F.when(den > 0, F.col("w1_num").cast("double")
               / den.cast("double")).alias("w1"))


_CVM_MAX_NM = 3_000_000_000  # |d| = |n2·C1 − n1·C2| ≤ n1·n2 must stay
                             # int64-squarable: (3e9)² just fits 2^63


def cvm_2samp(df: DataFrame, group_cols: "list[str]",
              flag_col: str, value_col: str) -> DataFrame:
    """Per-group two-sample Cramér-von Mises statistic — the
    SQUARED-INTEGRAL distribution-shift screen, completing the trio
    with ks_2samp (supremum) and wasserstein_1d (first-power
    integral): T = N·ω² = Σ_k w_k·(F1−F2)²(x_k) scaled, sensitive to
    accumulated small deviations a single-point KS sup misses.

    Exactness: evaluated at the N combined observations (weight w_k =
    multiplicity), cross-multiplied — d_k = n2·C1_k − n1·C2_k is an
    exact long, d_k² stays int64 under the in-plan bound
    n1·n2 ≤ 3·10⁹ (raise_error past it — the spearman/kendall
    discipline), and S = Σ w_k·d_k² accumulates in DECIMAL(38)
    (HUGEINT in the oracle).  ``cvm = T = (n1·n2/N²)·Σ(F1−F2)² = S / (n1·n2·N²)``
    is one pinned double chain (Anderson 1962's ecdf form).

    Same single-exchange shape as ks_2samp: one (group, value)
    groupBy, cumulative + total windows, final groupBy — no pair
    join.  Returns ``(group..., n1, n2, s_num, cvm)``; NULL when
    either sample is empty.
    """
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    per_v = clean.groupBy(*group_cols, value_col).agg(
        F.sum(F.when(F.col(flag_col).cast("boolean"), 1).otherwise(0))
        .alias("_c1"),
        F.sum(F.when(~F.col(flag_col).cast("boolean"), 1).otherwise(0))
        .alias("_c2"))
    w_cum = (Window.partitionBy(*group_cols)
             .orderBy(F.col(value_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*group_cols)
    stepped = per_v.select(
        *group_cols,
        (F.col("_c1") + F.col("_c2")).alias("_w"),
        F.sum("_c1").over(w_all).alias("_n1"),
        F.sum("_c2").over(w_all).alias("_n2"),
        F.sum("_c1").over(w_cum).alias("_cum1"),
        F.sum("_c2").over(w_cum).alias("_cum2"))
    d = F.col("_n2") * F.col("_cum1") - F.col("_n1") * F.col("_cum2")
    pd_ = lambda c: c.cast("decimal(38,0)")
    term = pd_(d * d) * pd_(F.col("_w"))
    agg = stepped.groupBy(*group_cols).agg(
        F.max("_n1").alias("n1"), F.max("_n2").alias("n2"),
        F.sum(term).alias("_s"))
    nm = F.col("n1") * F.col("n2")
    n_tot = F.col("n1") + F.col("n2")
    cvm = F.when(
        nm > F.lit(_CVM_MAX_NM),
        F.raise_error(F.concat(
            F.lit("cvm_2samp: n1*n2 exceeds the exact-int64 bound "
                  f"({_CVM_MAX_NM}): "), nm.cast("string")))
        .cast("double")
    ).when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.col("_s").cast("double")
        / (nm.cast("double") * n_tot.cast("double")
           * n_tot.cast("double")))
    return agg.select(*group_cols, "n1", "n2",
                      F.col("_s").alias("s_num"), cvm.alias("cvm"))


def cliffs_delta(df: DataFrame, group_cols: "list[str]",
                 flag_col: str, value_col: str) -> DataFrame:
    """Per-group Cliff's delta between the rows where ``flag_col`` is
    true (sample 1) and false (sample 2) — the ordinal effect size that
    reads a Mann-Whitney shift on a bounded [-1, 1] scale, robust where
    cohen_d's pooled-variance denominator is not.

    Exactness: delta = (#(x1>x2) − #(x1<x2)) / (n1·n2) never counts
    pairs — from the doubled tie-corrected pooled ranks (the
    spearman_corr machinery), ``2U₁ = 2R₁ − n₁(n₁+1)`` counts
    2·#gt + #ties and ``2U₂`` counts 2·#lt + #ties, so the tie terms
    cancel in ``d2 = 2U₁ − 2U₂ = 2·(#gt − #lt)`` — an exact long from
    ONE rank pass.  ``delta = d2 / (2·n1·n2)`` and the probability of
    superiority ``ps = U₁/(n1·n2) = u2_1 / (2·n1·n2)`` are each one
    pinned divide.

    Same single-exchange shape and exactness bound as spearman_corr
    (2R ≤ 2n² needs the pooled group under ``_MAX_GROUP_ROWS``,
    enforced in-plan with raise_error, never a silent wrap).

    Returns ``(group..., n1, n2, d2, delta, ps)``; delta/ps NULL when
    either sample is empty (integer guard on both engines).
    """
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    r2 = _rank2(group_cols, F.col(value_col))
    flagged = clean.select(*group_cols,
                           F.col(flag_col).cast("boolean").alias("_f"),
                           r2.alias("_r2"))
    agg = flagged.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_f"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("_f"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("_f"), F.col("_r2")).otherwise(0))
        .alias("_r1x2"),
        F.sum(F.when(~F.col("_f"), F.col("_r2")).otherwise(0))
        .alias("_r2x2"))
    u2_1 = F.col("_r1x2") - F.col("n1") * (F.col("n1") + 1)
    u2_2 = F.col("_r2x2") - F.col("n2") * (F.col("n2") + 1)
    staged = agg.withColumn("_u2_1", u2_1).withColumn(
        "d2", u2_1 - u2_2)
    n = F.col("n1") + F.col("n2")
    den2 = (F.col("n1") * F.col("n2") * 2).cast("double")
    guard = F.when(
        n > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("cliffs_delta: group exceeds exact-int64 bound "
                  f"({_MAX_GROUP_ROWS} rows): n="), n.cast("string")))
        .cast("double"))
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    delta = guard.when(ok, F.col("d2").cast("double") / den2)
    ps = guard.when(ok, F.col("_u2_1").cast("double") / den2)
    return staged.select(*group_cols, "n1", "n2", "d2",
                         delta.alias("delta"), ps.alias("ps"))


def wilcoxon_signed_rank(df: DataFrame, group_cols: "list[str]",
                         a_col: str, b_col: str) -> DataFrame:
    """Per-group Wilcoxon signed-rank test statistic for PAIRED
    samples — the within-subject sibling of ``mann_whitney_u`` (one
    row = one pair, e.g. a customer's spend before/after a change).

    Method (Wilcoxon 1945, standard practice): d = a − b per pair,
    zero differences DROPPED (counted in ``n_zero``), |d| ranked with
    tie-corrected average ranks, W⁺ = Σ ranks of positive d.  With the
    doubled-rank trick (``_rank2``: 2·avg_rank is an exact long) the
    statistic ``w2p = 2·W⁺`` is exact; since W⁺ + W⁻ = n(n+1)/2, the
    matched-pairs rank-biserial effect size

        rbc = (W⁺ − W⁻) / (W⁺ + W⁻) = (2·w2p − n(n+1)) / (n(n+1))

    is one pinned divide on exact longs.  The z-approximation's tie
    sums are deliberately not computed (the mann_whitney_u rationale).

    Same single-exchange shape as spearman_corr (rank window + groupBy
    on the same key) and the same ``_MAX_GROUP_ROWS`` in-plan bound.

    Returns ``(group..., n, n_zero, w2p, rbc)``.  Groups whose pairs
    are ALL zero differences have no ranked rows and are absent from
    the output (the SQL twin mirrors this).
    """
    clean = df.filter(F.col(a_col).isNotNull()
                      & F.col(b_col).isNotNull())
    d = (F.col(a_col).cast("long") - F.col(b_col).cast("long"))
    based = clean.select(*group_cols, d.alias("_d"))
    nz = based.filter(F.col("_d") != 0)
    r2 = _rank2(group_cols, F.abs(F.col("_d")))
    ranked = nz.select(*group_cols, F.col("_d"), r2.alias("_r2"))
    zeros = (based.filter(F.col("_d") == 0)
             .groupBy(*group_cols)
             .agg(F.count(F.lit(1)).alias("n_zero")))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_d") > 0, F.col("_r2")).otherwise(0))
        .alias("w2p"))
    guard = F.when(
        F.col("n") > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("wilcoxon_signed_rank: group exceeds exact-int64 "
                  f"bound ({_MAX_GROUP_ROWS} rows): n="),
            F.col("n").cast("string"))).cast("double"))
    nn1 = F.col("n") * (F.col("n") + 1)
    rbc = guard.when(
        F.col("n") > 0,
        (F.lit(2) * F.col("w2p") - nn1).cast("double")
        / nn1.cast("double"))
    return (agg.join(zeros, group_cols, "left")
            .select(*group_cols, "n",
                    F.coalesce("n_zero", F.lit(0)).cast("long")
                    .alias("n_zero"),
                    "w2p", rbc.alias("rbc")))


# Jonckheere runs a cell-pair nested-loop over the DISTINCT
# (level, value) cells: ordinal-by-ordinal data has few cells by
# nature; the cap keeps the broadcast self-join driver-trivial.
_JT_MAX_CELLS = 20_000


def jonckheere_trend(df: DataFrame, group_cols: "list[str]",
                     level_col: str, value_col: str) -> DataFrame:
    """Per-group Jonckheere–Terpstra trend statistic: are values
    systematically LARGER at higher ordinal levels?  (The ordered-
    alternative test Kruskal-Wallis can't see: KW asks "any
    difference", JT asks "monotone trend across priority/severity/
    bucket levels".)

    J = Σ_{l₁<l₂} U(G_{l₁}, G_{l₂}) with ties counting ½.  Both
    ``level_col`` and ``value_col`` are ordinal (integers), so the
    group decomposes into DISTINCT (level, value) cells; on cell
    counts n₁, n₂ the doubled statistic is exact:

        j2 = 2J = Σ 2·n₁·n₂ [v₁<v₂] + n₁·n₂ [v₁=v₂]  over l₁<l₂

    computed by one groupBy to cells + one broadcast cell self-join —
    the quadratic lives in CELL space (capped at ``_JT_MAX_CELLS``,
    checked before the join), never row space.  Against the exact
    null ceiling ``jmax2 = 2·J_max = N² − Σ n_l²`` (N rows, level
    sizes n_l) the normalized effect

        effect = (2·j2 − jmax2) / jmax2   ∈ [−1, 1]

    is one pinned divide (0 = no trend; ±1 = perfect separation in
    level order).  Returns ``(group..., n, n_cells, j2, jmax2,
    effect)``; effect NULL when jmax2 = 0 (a single level or all rows
    one level).
    """
    clean = df.filter(F.col(level_col).isNotNull()
                      & F.col(value_col).isNotNull())
    cells = (clean.groupBy(*group_cols,
                           F.col(level_col).cast("long").alias("_l"),
                           F.col(value_col).cast("long").alias("_v"))
             .agg(F.count(F.lit(1)).alias("_c")))
    cells = cells.localCheckpoint()  # reused 3x below
    n_cells = cells.count()
    if n_cells > _JT_MAX_CELLS:
        raise ValueError(
            f"jonckheere_trend: {n_cells} distinct (level, value) "
            f"cells exceed the {_JT_MAX_CELLS} cell-join bound — "
            "bucket value_col coarser (JT is an ordinal test)")
    a = cells.select(*[F.col(g).alias(f"_ga_{g}") for g in group_cols],
                     F.col("_l").alias("_l1"),
                     F.col("_v").alias("_v1"),
                     F.col("_c").alias("_c1"))
    b = cells.select(*[F.col(g).alias(f"_gb_{g}") for g in group_cols],
                     F.col("_l").alias("_l2"),
                     F.col("_v").alias("_v2"),
                     F.col("_c").alias("_c2"))
    cond = F.lit(True)
    for g in group_cols:
        cond = cond & (F.col(f"_ga_{g}") == F.col(f"_gb_{g}"))
    pairs = (a.join(F.broadcast(b),
                    cond & (F.col("_l1") < F.col("_l2"))
                    & (F.col("_v1") <= F.col("_v2"))))
    j = (pairs.groupBy(*[F.col(f"_ga_{g}").alias(g)
                         for g in group_cols])
         .agg(F.sum(F.when(F.col("_v1") < F.col("_v2"),
                           2 * F.col("_c1") * F.col("_c2"))
                    .otherwise(F.col("_c1") * F.col("_c2")))
              .alias("j2")))
    lv = (cells.groupBy(*group_cols, "_l")
          .agg(F.sum("_c").alias("_nl")))
    tot = (lv.groupBy(*group_cols)
           .agg(F.sum("_nl").alias("n"),
                F.sum(F.col("_nl") * F.col("_nl")).alias("_snl2"))
           .withColumn("jmax2", F.col("n") * F.col("n")
                       - F.col("_snl2")))
    nc = (cells.groupBy(*group_cols)
          .agg(F.count(F.lit(1)).alias("n_cells")))
    out = (tot.join(j, group_cols, "left").join(nc, group_cols)
           .withColumn("j2", F.coalesce("j2", F.lit(0)).cast("long")))
    effect = F.when(
        F.col("jmax2") > 0,
        (F.lit(2) * F.col("j2") - F.col("jmax2")).cast("double")
        / F.col("jmax2").cast("double"))
    return out.select(*group_cols, "n", "n_cells", "j2",
                      F.col("jmax2").cast("long").alias("jmax2"),
                      effect.alias("effect"))


def somers_d(df: DataFrame, group_cols: "list[str]",
             x_col: str, y_col: str) -> DataFrame:
    """Per-group Somers' D (both directions) + Goodman-Kruskal gamma —
    the asymmetric siblings of Kendall tau-b, the standard ordinal
    association measures when one column is the predictor: D_yx is the
    familiar concordance index rescaling (AUC = (D_yx+1)/2 for a
    binary y), gamma drops every tied pair.

    Exactness: the same exact pair counts as kendall_tau (shared
    ``_pair_concordance`` substrate — ONE bounded per-group self pair
    join): concordant C, discordant D, x-tied Tx, y-tied Ty, and
    tied-in-both Txy, all longs.  With ``n0 = n(n−1)/2``:

    - ``d_yx = (C−D) / (n0 − Tx)``  (pairs untied on the predictor x)
    - ``d_xy = (C−D) / (n0 − Ty)``
    - ``gamma = (C−D) / (C+D)``    (untied-on-both pairs; equals
      ``n0 − Tx − Ty + Txy`` by inclusion-exclusion — both engines
      compute it as C+D, the identity is pinned in tests)

    Each statistic is ONE long→double division on exact integers
    (bit-stable cross-engine), NULL when its denominator is zero.
    Note ``tau_b² = d_yx · d_xy`` — pinned against kendall_tau in
    tests as an independent cross-operator identity.

    Scale shape: identical to kendall_tau — O(n²/group) pairs from one
    sort-merge self join, in-plan ``_KENDALL_MAX_GROUP_ROWS`` cap
    (raise_error, never a silent explosion); bigger groups want a
    deterministic pre-sample (dataset_split) first.

    Reference parity: no counterpart in mapbox-filter (pure style
    evaluation, src/Mapbox/Expression.hs); this is engine surface for
    the curation/analytics tier.

    Returns ``(group..., n, c_minus_d, pairs_x, pairs_y, pairs_cd,
    t_both, d_yx, d_xy, gamma)``.
    """
    agg = _pair_concordance(df, group_cols, x_col, y_col, "somers_d")
    n0 = _pairs_n2(F.col("n"))
    num = (F.col("_c") - F.col("_d"))
    px = (n0 - F.col("_tx"))
    py = (n0 - F.col("_ty"))
    pcd = (F.col("_c") + F.col("_d"))

    def _ratio(den):
        return F.when(den > 0, num.cast("double") / den.cast("double"))

    return agg.select(*group_cols, "n", num.alias("c_minus_d"),
                      px.alias("pairs_x"), py.alias("pairs_y"),
                      pcd.alias("pairs_cd"), F.col("_txy").alias("t_both"),
                      _ratio(px).alias("d_yx"), _ratio(py).alias("d_xy"),
                      _ratio(pcd).alias("gamma"))


def ansari_bradley(df: DataFrame, group_cols: "list[str]",
                   flag_col: str, value_col: str) -> DataFrame:
    """Per-group Ansari-Bradley scale test — the rank test for EQUAL
    DISPERSION between the flag-true and flag-false samples (Ansari &
    Bradley 1960): where mann_whitney_u detects a location shift, AB
    detects a spread difference around a common median.  Each pooled
    observation scores ``min(rank, N+1−rank)`` (center-heavy), so a
    LARGE sample-1 sum means sample 1 is MORE concentrated (less
    dispersed).

    Exactness: doubled tie-corrected midranks (the ``_rank2``
    machinery) make the doubled score ``s2 = min(r2, 2(N+1) − r2)`` an
    exact long; the statistic ``ab2 = Σ₁ s2`` and the tie-robust
    finite-sampling moments come from exact pooled sums — with
    S = Σ s2 and Q = Σ s2²,

        z = (N·ab2 − n1·S) / sqrt(n1·n2·(N·Q − S²) / (N−1))

    (the hypergeometric sampling variance of a sum of n1 scores drawn
    without replacement — EXACT under ties, no parity-split textbook
    formula needed).  One sqrt + one divide, pinned.  ``N ≤ 38000``
    (the module cap) keeps N·Q and S² inside int64; beyond that,
    pre-sample (dataset_split) — enforced in-plan via raise_error.

    Same single-exchange shape as spearman/cliffs: one rank window
    pass, one groupBy.

    Returns ``(group..., n1, n2, ab2, s_sum2, z)`` — z NULL when a
    sample is empty, N < 2, or every value ties (zero variance).
    """
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    r2 = _rank2(group_cols, F.col(value_col))
    wn = Window.partitionBy(*group_cols)
    n = F.count(F.lit(1)).over(wn)
    guard = F.when(
        n > _MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit(f"ansari_bradley: group exceeds exact-moment bound "
                  f"({_MAX_GROUP_ROWS} rows): n="),
            n.cast("string"))).cast("long")
    ).otherwise(n.cast("long"))
    s2 = F.least(r2, 2 * (guard + 1) - r2)
    flagged = clean.select(*group_cols,
                           F.col(flag_col).cast("boolean").alias("_f"),
                           s2.alias("_s2"))
    agg = flagged.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_f"), 1).otherwise(0)).cast("long")
        .alias("n1"),
        F.sum(F.when(~F.col("_f"), 1).otherwise(0)).cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("_f"), F.col("_s2")).otherwise(F.lit(0)))
        .cast("long").alias("ab2"),
        F.sum("_s2").cast("long").alias("s_sum2"),
        F.sum(F.col("_s2") * F.col("_s2")).cast("long").alias("_q4"))
    nn = (F.col("n1") + F.col("n2"))
    num = (nn * F.col("ab2") - F.col("n1") * F.col("s_sum2"))
    # N·Q − S² stays exact int64 under the 38000 cap; the n1·n2 factor
    # is applied in DOUBLE (n1·n2·(N·Q−S²) would overflow int64)
    spread = (nn * F.col("_q4") - F.col("s_sum2") * F.col("s_sum2"))
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (nn >= 2) & (spread > 0),
        num.cast("double")
        / F.sqrt((F.col("n1") * F.col("n2")).cast("double")
                 * spread.cast("double") / (nn - 1).cast("double")))
    return agg.select(*group_cols, "n1", "n2", "ab2", "s_sum2",
                      z.alias("z"))


def page_trend(df: DataFrame, block_col: str, treat_col: str,
               value_col: str) -> DataFrame:
    """Page's L trend test — the ORDERED-alternative companion of
    :func:`friedman_test` (Page 1963): with treatments in a
    prespecified order (their natural ascending ``treat_col`` order
    here — fix the hypothesis by encoding the order into the
    labels), L weights each treatment's within-block rank sum by its
    position, so a monotone treatment effect drives L up where
    Friedman's omnibus Q only sees "different".

    Exactness: complete blocks only (friedman's distinct-count
    filter), doubled tie-corrected ranks r2, position weights
    c_j = 1..k.  ``L2 = Σ c_j·R2_j`` is an exact long with
    ``E[L2] = n·k(k+1)²/2`` (k(k+1) even → exact), and the exact
    tie-corrected permutation variance telescopes to

        Var[L2] = k(k+1)/12 · (Σ r2² − n·k(k+1)²)

    — the SAME spread term as Friedman's denominator, so ties that
    deflate Q deflate L's variance identically.  ``z = (L2 − E2) /
    sqrt(k·(k+1)·D / 12)`` is one pinned sqrt+divide; D ≤ 0 (every
    block fully tied) → z NULL.  Int64 bound: k(k+1)·D ≤ 4nk⁵ —
    safe to n ≈ 10¹³ blocks at k ≤ 10 (ANSI overflow fails loudly,
    never silently).

    Scale shape: identical to friedman_test — one completeness
    pre-pass, one per-block rank window, one k-row aggregate.

    Reference: Page (1963, JASA "Ordered hypotheses for multiple
    treatments"); exact permutation variance from the standard
    two-multiset permutation-covariance identity — public formulas;
    the doubled-rank evaluation is this engine's.

    Returns ONE row ``(n_blocks, k, l2, e2, var_num, z)`` with
    ``var_num = k(k+1)·D`` (z² = 12·(L2−E2)²/var_num for checking).
    """
    b, t = F.col(block_col), F.col(treat_col)
    v = F.col(value_col).cast("long")
    d = df.select(b.alias("_b"), t.alias("_t"), v.alias("_v"))
    k_tot = d.select(F.countDistinct("_t").alias("_k"))
    per_block = d.groupBy("_b").agg(
        F.countDistinct("_t").alias("_kb"), F.count(F.lit(1)).alias("_c"))
    complete = (per_block.crossJoin(F.broadcast(k_tot))
                .filter((F.col("_kb") == F.col("_k"))
                        & (F.col("_c") == F.col("_k")))
                .select("_b"))
    dd = d.join(complete, "_b")
    dd = dd.withColumn("_r2", _rank2(["_b"], F.col("_v")))
    per_treat = dd.groupBy("_t").agg(
        F.sum("_r2").alias("_R2"),
        F.sum(F.col("_r2") * F.col("_r2")).alias("_rsq"),
        F.count(F.lit(1)).alias("_n"))
    wc = Window.orderBy("_t")
    per_treat = per_treat.withColumn(
        "_cj", F.row_number().over(wc).cast("long"))
    tot = per_treat.agg(
        F.max("_n").alias("n_blocks"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("_cj") * F.col("_R2")).alias("l2"),
        F.sum("_rsq").alias("_allrsq"))
    from ..geo.tilemath import floor_div
    k = F.col("k")
    e2 = F.col("n_blocks") * floor_div(k * (k + 1), 2) * (k + 1)
    dterm = (F.col("_allrsq")
             - F.col("n_blocks") * k * (k + 1) * (k + 1))
    var_num = (k * (k + 1) * dterm)
    z = F.when(
        (k >= 2) & (dterm > 0),
        (F.col("l2") - e2).cast("double")
        / F.sqrt(var_num.cast("double") / F.lit(12.0)))
    return tot.select("n_blocks", "k", "l2", e2.alias("e2"),
                      var_num.alias("var_num"), z.alias("z"))


def storey_qvalue(df: DataFrame, group_cols: "list[str]", id_col: str,
                  p_num_col: str, p_den: int, *,
                  lam_num: int = 1, lam_den: int = 2) -> DataFrame:
    """Storey q-values per group — the adaptive FDR companion of
    :func:`bh_fdr` (Storey 2002, JRSS-B): BH implicitly assumes every
    hypothesis is null (π₀ = 1); Storey estimates the null fraction
    from the flat tail of the p-value histogram,

        π̂₀ = #{p > λ} / ((1−λ)·m)   (capped at 1, λ = 1/2 default)

    and reports per-test q-values ``q_(i) = min_{k≥i} π̂₀·m·p_(k)/k``
    — "reject everything with q ≤ α" controls FDR at α with more
    power when real signals exist.

    Exactness: p-values are exact rationals ``p_num/p_den`` (the
    repo-wide discipline), λ an exact rational, so the tail count
    comparison and π̂₀ = pi0_num/pi0_den (pi0_num = min(#tail·λden,
    m·(λden−λnum)), pi0_den = m·(λden−λnum)) are pure int64.  Each
    raw value ``π̂₀·m·p/k = (pi0_num·m·p_num)/(pi0_den·p_den·k)`` is
    ONE pinned int64→double division, and the step-down coupling is
    a windowed MIN over doubles — order-independent, engine-stable.
    Int64 bound: pi0_num·m·p_num < 2^63 ⇒ m ≲ √(9·10¹⁸/(λden·p_den))
    per group (ANSI overflow fails loudly).

    Scale shape: same single group-keyed exchange as bh_fdr — rank
    window, count window, tail-count window, suffix-min window, all
    on the group key.

    Returns ``(*group_cols, id, p_num, k, m, pi0_num, pi0_den, q)``
    with ties broken deterministically by ``id_col``.
    """
    p = F.col(p_num_col).cast("long")
    w = (Window.partitionBy(*group_cols)
         .orderBy(p.asc(), F.col(id_col).asc()))
    wg = Window.partitionBy(*group_cols)
    tail = F.sum(F.when(p * lam_den > F.lit(lam_num) * F.lit(p_den), 1)
                 .otherwise(0)).over(wg).cast("long")
    ranked = df.select(
        *group_cols, F.col(id_col).alias("id"), p.alias("p_num"),
        F.row_number().over(w).cast("long").alias("k"),
        F.count(F.lit(1)).over(wg).cast("long").alias("m"),
        (tail * lam_den).alias("_t"))
    pi0_den = (F.col("m") * (lam_den - lam_num))
    pi0_num = F.least(F.col("_t"), pi0_den)
    q_raw = ((pi0_num * F.col("m") * F.col("p_num")).cast("double")
             / (pi0_den * F.lit(p_den) * F.col("k")).cast("double"))
    ranked = ranked.select(
        *group_cols, "id", "p_num", "k", "m",
        pi0_num.alias("pi0_num"), pi0_den.alias("pi0_den"),
        q_raw.alias("_qr"))
    wmin = (Window.partitionBy(*group_cols).orderBy("k")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    return ranked.select(
        *group_cols, "id", "p_num", "k", "m", "pi0_num", "pi0_den",
        F.min("_qr").over(wmin).alias("q"))


def seasonal_mann_kendall(df: DataFrame, group_cols: "list[str]", *,
                          season_col: str, t_col: str,
                          value_col: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) — the
    monotone-trend detector for series with a seasonal cycle: the MK
    statistic is computed WITHIN each season (weekday, month) across
    periods, so a strong weekly/annual cycle cannot masquerade as or
    mask a trend; the per-season S and tie-corrected variances then
    ADD (independence across seasons, the Hirsch approximation):

        S = Σ_seasons S_s,
        Var = Σ_s [n_s(n_s−1)(2n_s+5) − Σ_ties t(t−1)(2t+5)] / 18,
        z = (S − sign(S)) / √Var      (continuity-corrected)

    Exactness: one row per (group, season, t) is REQUIRED and enforced
    in-plan (duplicate keys raise — aggregate upstream); S is pure
    integer sign pairs (two comparisons, no signum doubles), both
    variance terms are exact int64 polynomials, and z is one pinned
    ÷18-sqrt-divide chain.  Int64 bound: n_s³ per season —
    calendar-bounded seasons (n_s = #periods) never approach it.

    Scale shape: the pair join and every groupBy hash the (group,
    season) key; pair volume is Σ n_s²/2 with n_s period-bounded —
    linear in groups.

    Returns one row per group: ``(group..., n_seasons, n_points,
    s_stat, var18_num, z)`` (``var18_num`` = 18·Var, exact); z NULL
    when the variance is zero (all tied / single period).
    """
    g = list(group_cols)
    base = df.select(*g, F.col(season_col).alias("_se"),
                     F.col(t_col).cast("long").alias("_t"),
                     F.col(value_col).cast("long").alias("_v"))
    dupw = Window.partitionBy(*g, "_se", "_t")
    guard = F.when(
        F.count(F.lit(1)).over(dupw) > 1,
        F.raise_error(F.concat(
            F.lit("seasonal_mann_kendall: duplicate (season, t) key"
                  " — aggregate upstream: t="),
            F.col("_t").cast("string"))).cast("long")
    ).otherwise(F.col("_v"))
    base = base.withColumn("_v", guard)
    a, b = base.alias("a"), base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in g] + \
        [F.col("a._se") == F.col("b._se"),
         F.col("a._t") < F.col("b._t")]
    sg = (F.when(F.col("b._v") > F.col("a._v"), 1)
          .when(F.col("b._v") < F.col("a._v"), -1).otherwise(0))
    s_per = (a.join(b, cond)
             .groupBy(*[F.col(f"a.{c}").alias(c) for c in g],
                      F.col("a._se").alias("_se"))
             .agg(F.sum(sg).cast("long").alias("_s")))
    n_per = base.groupBy(*g, "_se").agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    ties = (base.groupBy(*g, "_se", "_v")
            .agg(F.count(F.lit(1)).cast("long").alias("_tc"))
            .groupBy(*g, "_se")
            .agg(F.sum(F.col("_tc") * (F.col("_tc") - 1)
                       * (2 * F.col("_tc") + 5)).alias("_tt")))
    per = (n_per.join(ties, [*g, "_se"])
           .join(s_per, [*g, "_se"], "left")
           .select(*g, "_se", "_n", "_tt",
                   F.coalesce("_s", F.lit(0).cast("long"))
                   .alias("_s"),
                   (F.col("_n") * (F.col("_n") - 1)
                    * (2 * F.col("_n") + 5) - F.col("_tt"))
                   .alias("_vn")))
    tot = per.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("_n").cast("long").alias("n_points"),
        F.sum("_s").cast("long").alias("s_stat"),
        F.sum("_vn").cast("long").alias("var18_num"))
    s = F.col("s_stat")
    cc = F.when(s > 0, s - 1).when(s < 0, s + 1).otherwise(F.lit(0))
    z = F.when(
        F.col("var18_num") > 0,
        cc.cast("double")
        / F.sqrt(F.col("var18_num").cast("double") / F.lit(18.0)))
    return tot.select(*g, "n_seasons", "n_points", "s_stat",
                      "var18_num", z.alias("z"))


def ad_2samp(df: DataFrame, group_cols: "list[str]",
             flag_col: str, value_col: str) -> DataFrame:
    """Two-sample Anderson-Darling test per group — the
    tail-sensitive "same distribution?" upgrade of :func:`ks_2samp`
    (AD weights the CDF gap by 1/(F(1−F)), so divergence in the
    tails — exactly where curation filters act — counts fully).
    Scholz & Stephens (1987) k-sample form, k = 2, WITH the exact
    tie adjustment (their eq. 7, midrank version):

        A² = (N−1)/N · Σ_a (1/n_a) Σ_j l_j·(N·M̄_aj − n_a·B̄_j)²
                                      / [N·(B̄_j(N−B̄_j) − N·l_j/4)]

    over distinct pooled values j with tie mass l_j, midpoint
    cumulatives B̄, M̄.  DOUBLING the cumulatives (B̄2 = 2B_{j−1}+l_j,
    M̄2 likewise) clears every half and quarter: the per-term
    numerator (N·M̄2 − n_a·B̄2) and denominator B̄2(2N−B̄2) − N·l_j
    are EXACT int64 (numerator cast-then-squared in double — its
    square exceeds int64), the j-sums are PINNED value-ordered folds,
    and A² is one pinned chain.  E[A²] = k−1 = 1 under H0 (compare
    against that; the normalizing σ_N is a published polynomial
    callers can apply downstream).

    Same single-exchange shape as the other rank tests: one
    (group, value) collapse, running windows on the group key, one
    fold.  Int64 bound: N·M̄2 ≤ 2N² ⇒ N ≤ 2·10⁹ (ANSI-loud).

    Returns ``(group..., n1, n2, n_values, a2)`` — NULL when either
    sample is empty or every value ties (denominator 0 rows are
    skipped exactly when l_j = N).
    """
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(value_col).isNotNull())
    cell = (clean.groupBy(*group_cols,
                          F.col(value_col).alias("_v"))
            .agg(F.sum(F.when(F.col(flag_col).cast("boolean"), 1)
                       .otherwise(0)).cast("long").alias("_l1"),
                 F.sum(F.when(F.col(flag_col).cast("boolean"), 0)
                       .otherwise(1)).cast("long").alias("_l2")))
    wrun = (Window.partitionBy(*group_cols).orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, -1))
    wtot = Window.partitionBy(*group_cols)
    l = F.col("_l1") + F.col("_l2")
    base = cell.select(
        *group_cols, "_v", "_l1", "_l2", l.alias("_l"),
        F.coalesce(F.sum(F.col("_l1") + F.col("_l2")).over(wrun),
                   F.lit(0).cast("long")).alias("_bprev"),
        F.coalesce(F.sum("_l1").over(wrun),
                   F.lit(0).cast("long")).alias("_m1prev"),
        F.coalesce(F.sum("_l2").over(wrun),
                   F.lit(0).cast("long")).alias("_m2prev"),
        F.sum("_l1").over(wtot).alias("_n1"),
        F.sum("_l2").over(wtot).alias("_n2"))
    nn = (F.col("_n1") + F.col("_n2"))
    b2 = 2 * F.col("_bprev") + F.col("_l")
    den2 = (b2 * (2 * nn - b2) - nn * F.col("_l"))

    def term(mprev, lcol, na):
        m2 = 2 * F.col(mprev) + F.col(lcol)
        num = (nn * m2 - na * b2).cast("double")
        return F.when(
            den2 > 0,
            F.col("_l").cast("double") * num * num
            / (nn.cast("double") * den2.cast("double"))
        ).otherwise(F.lit(0.0))

    terms = base.select(
        *group_cols, "_v", "_n1", "_n2",
        term("_m1prev", "_l1", F.col("_n1")).alias("_t1"),
        term("_m2prev", "_l2", F.col("_n2")).alias("_t2"))

    def fold(col):
        arr = F.sort_array(F.collect_list(F.struct(
            F.col("_v"), F.col(col).alias("t"))))
        return F.aggregate(arr, F.lit(0.0),
                           lambda acc, s_: acc + s_["t"])

    agg = terms.groupBy(*group_cols).agg(
        F.max("_n1").alias("n1"), F.max("_n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        fold("_t1").alias("_s1"), fold("_t2").alias("_s2"))
    n1, n2 = F.col("n1"), F.col("n2")
    ntot = n1 + n2
    a2 = F.when(
        (n1 > 0) & (n2 > 0) & (F.col("n_values") > 1),
        (ntot - 1).cast("double") / ntot.cast("double")
        * (F.col("_s1") / n1.cast("double")
           + F.col("_s2") / n2.cast("double")))
    return agg.select(*group_cols, "n1", "n2", "n_values",
                      a2.alias("a2"))
