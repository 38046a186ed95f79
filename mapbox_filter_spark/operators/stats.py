"""Robust per-group statistics: exact rank medians and MAD outlier flags.

Curation pipelines cut length/score outliers per stratum (source,
language) — and mean/stddev are exactly the statistics a heavy-tailed web
corpus breaks.  Median/MAD are the robust pair; this module computes them
EXACTLY with integer arithmetic only:

- the median is the rank-``⌈n/2⌉`` order statistic (the lower median for
  even n) — a VALUE from the data, never an interpolated float;
- MAD is the same rank statistic over ``|x − median|``;
- the cut ``|x − med| > k·MAD`` is evaluated by integer cross-
  multiplication (``dev·k_den > MAD·k_num``) — no division, no floats,
  so the flag is bit-identical across engines and cluster shapes.

Degenerate strata are deterministic too: MAD = 0 (over half the group at
one value) flags every row off the median when k > 0 — callers who want
leniency raise ``k`` or pre-filter constant groups.

Scale: two window passes (one per rank statistic) + two group-keyed joins
back; every exchange hashes on the SAME group key, so AQE coalesces and
the per-group state is one long.  For approximate quantiles at extreme
group cardinality the mergeable histogram sketch (temporal.py
histogram_rollup) is the documented swap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_rank_median", "robust_outliers", "benford_profile",
           "entropy_profile", "cohen_kappa", "cronbach_alpha",
           "theil_index", "cramers_v", "odds_ratio", "turning_points",
           "cohen_d", "icc_oneway"]


def group_rank_median(df: DataFrame, group_cols: Sequence[str],
                      value: str, out: str = "med") -> DataFrame:
    """(group..., out): the exact rank-⌈n/2⌉ order statistic per group.
    Ties need no tiebreak — the k-th value BY VALUE ORDER is unique even
    when row order is not."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value).asc())
    wg = Window.partitionBy(*group_cols)
    d = (df.select(*group_cols, value)
         .withColumn("_rn", F.row_number().over(w))
         .withColumn("_n", F.count(F.lit(1)).over(wg)))
    return (d.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
            .groupBy(*group_cols)
            .agg(F.max(value).alias(out)))


def robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value: str,
    k: tuple[int, int] = (3, 1),
    med_col: str = "med",
    mad_col: str = "mad",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Every input row + (med, mad, is_outlier) for its group.

    ``k = (num, den)`` is the MAD multiplier as an integer rational;
    a row is an outlier iff ``|value − med| · den > mad · num``."""
    k_num, k_den = k
    if k_num < 0 or k_den <= 0:
        raise ValueError("k must be a non-negative rational (num, den>0)")
    group_cols = list(group_cols)
    med = group_rank_median(df, group_cols, value, out=med_col)
    d = df.join(med, group_cols)
    dev = F.abs(F.col(value) - F.col(med_col))
    d = d.withColumn("_dev", dev)
    mad = group_rank_median(d, group_cols, "_dev", out=mad_col)
    return (d.join(mad, group_cols)
            .withColumn(flag_col,
                        F.col("_dev") * F.lit(k_den)
                        > F.col(mad_col) * F.lit(k_num))
            .drop("_dev"))


def weighted_median(df: DataFrame, group_cols: Sequence[str],
                    value_col: str, weight_col: str,
                    tiebreak: str) -> DataFrame:
    """Exact weighted median per group: the FIRST row in
    ``(value, tiebreak)`` order whose running weight satisfies
    ``2·cumw ≥ W`` (integer cross-multiplication — no halving, no
    floats, deterministic on any engine).  One shuffle: both windows and
    the implicit group key share the hash.  Weights must be positive
    integers (quantize upstream)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak)
    wall = Window.partitionBy(*group_cols)
    cum = F.sum(weight_col).over(w)
    total = F.sum(weight_col).over(wall)
    ranked = df.select(
        *group_cols, value_col, weight_col, tiebreak,
        cum.alias("_cumw"), total.alias("_w"))
    hit = ranked.filter(2 * F.col("_cumw") >= F.col("_w"))
    w2 = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak)
    return (hit.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .select(*group_cols,
                    F.col(value_col).alias("wmedian"),
                    F.col("_w").alias("total_weight")))


def time_weighted_avg(df: DataFrame, group_cols: Sequence[str],
                      ts_us: str, value_col: str,
                      tiebreak: str) -> DataFrame:
    """Hypertable-style time-weighted average per group (the
    TimescaleDB ``time_weight('LOCF')`` aggregate): each observation
    holds until the next one, so the mean is
    ``Σ vᵢ·Δtᵢ / Σ Δtᵢ`` over consecutive pairs.  ``value_col`` must be
    an integer quantization (exact products; Δt in whole seconds keeps
    the accumulator < 2^63), so numerator and denominator are exact
    order-free integer sums and only the final division is IEEE —
    bit-reproducible.  The last observation of a group carries no
    interval (standard LOCF-TWA).  ``tiebreak`` makes the ordering
    total when timestamps repeat.  One shuffle (window + groupBy share
    the key)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(ts_us, tiebreak)
    hops = df.select(
        *group_cols, F.col(value_col).alias("_v"),
        (F.lead(ts_us).over(w) - F.col(ts_us)).alias("_dt_us"))
    hops = hops.withColumn("_dt", F.expr("_dt_us div 1000000"))
    return (hops.filter(F.col("_dt").isNotNull())
            .groupBy(*group_cols)
            .agg(F.sum(F.col("_v") * F.col("_dt")).alias("twa_num"),
                 F.sum("_dt").alias("twa_den"))
            # a group whose gaps ALL truncate to 0 s carries no weight:
            # drop it (Spark NULL-on-/0 vs DuckDB NaN would otherwise
            # split the engines); integer guard, deterministic
            .filter(F.col("twa_den") > 0)
            .withColumn("twa", F.col("twa_num").cast("double")
                        / F.col("twa_den").cast("double")))


def gram_matrix(df: DataFrame, vec_col: str, dim: int,
                scale: int = 1000) -> DataFrame:
    """Exact integer Gram matrix Σ xᵢxᵢᵀ over an embedding column — the
    mergeable sufficient statistic behind covariance/PCA/whitening: the
    driver eigendecomposes a dim×dim matrix while the corpus is touched
    once, shuffle payload = one partial matrix per Arrow batch (NOT per
    row, NOT the corpus).

    Embeddings are quantized to integers (``floor(v·scale + 0.5)`` —
    the portable rounding rule the hex grid uses; Spark round() is
    BigDecimal HALF_UP and differs from DuckDB at .5) and each batch
    contributes its int64 ``XᵀX`` partial (numpy, exact, order-free),
    so the summed matrix is bit-identical on any partitioning and any
    engine — a VALUE-HASHABLE covariance, which float accumulation
    can't give (re-association changes low bits).

    Returns (i, j, g, n) for the upper triangle i ≤ j, where g is in
    units of 1/scale² and n is the count of CONTRIBUTING rows — NULL
    vectors are filtered out before the kernel (a crash-vs-skip
    divergence otherwise; callers centering with n get the matching
    denominator).  |v|·scale must stay ≪ 2^31 so per-batch products
    cannot overflow int64.
    """
    import numpy as np
    import pandas as pd

    if dim < 1 or scale < 1:
        raise ValueError("dim and scale must be positive")
    # project + drop NULLs BEFORE the Arrow barrier: unrelated columns
    # would be serialized into every Python batch, and np.stack would
    # crash on a None row
    df = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    iu = np.triu_indices(dim)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            if x.shape[1] != dim:
                raise ValueError(
                    f"expected dim {dim}, got {x.shape[1]}")
            q = np.floor(x * scale + 0.5).astype("int64")
            g = q.T @ q  # int64: exact, order-free
            yield pd.DataFrame({
                "i": iu[0].astype("int32"),
                "j": iu[1].astype("int32"),
                "g": g[iu],
                "n": np.full(len(iu[0]), len(pdf), dtype="int64"),
            })

    part = df.mapInPandas(
        partials, schema="i int, j int, g long, n long")
    return (part.groupBy("i", "j")
            .agg(F.sum("g").alias("g"), F.sum("n").alias("n")))


def benford_profile(df: DataFrame, group_cols: Sequence[str],
                    value_col: str) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the
    data-quality / fraud screen for positive INTEGER-VALUED columns
    (quantize fractional units upstream — cents, micro-degrees; rows
    whose long cast is ≤ 0 are excluded, never a digit-0 row).

    Per (group, digit 1-9): the exact observed count, the group total,
    and the Benford-expected count ``n · ln(1+1/d)/ln(10)`` — the
    expected value is the only double, computed as one pinned
    divide + two lns (the cross-engine-stable chain).  The leading
    digit comes from the decimal string of the positive long (portable:
    no float log10 on the value path).  One map-side-combinable
    groupBy; rows with value ≤ 0 are excluded (Benford is undefined
    there) — exclusion count is the caller's delta check.
    """
    # cast FIRST, then filter: values in (0,1) truncate to 0 and are
    # excluded (a digit-0 row would divide by zero in exp_d under
    # ANSI); quantize fractional units upstream (cents, micro-degrees)
    # so the long holds the first significant digit
    v = F.col(value_col).cast("long")
    pos = df.select(*group_cols, v.alias("_v")) \
        .filter(F.col("_v") > 0) \
        .select(*group_cols,
                F.substring(F.col("_v").cast("string"), 1, 1)
                .cast("int").alias("digit"))
    counts = pos.groupBy(*group_cols, "digit").agg(
        F.count(F.lit(1)).alias("n_d"))
    w_tot = Window.partitionBy(*group_cols)
    return counts.select(
        *group_cols, "digit", "n_d",
        F.sum("n_d").over(w_tot).alias("n"),
        (F.sum("n_d").over(w_tot).cast("double")
         * (F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
            / F.log(F.lit(10.0)))).alias("exp_d"))


def entropy_profile(df: DataFrame, group_cols: Sequence[str],
                    cat_col: str) -> DataFrame:
    """Shannon entropy of a categorical distribution per group — the
    diversity / label-balance metric for dataset curation.

    H = ln(n) − (Σ c·ln c)/n over category counts c: the counts are
    exact longs from one groupBy, and the Σ c·ln c term is a
    PINNED-ORDER fold over the category list sorted by category name
    (a float sum under groupBy has nondeterministic addend order — the
    path_len discipline applies).  Two stacked groupBys on the same
    leading key = one exchange.

    Returns ``(group..., n, n_cats, entropy)`` with entropy in nats
    (0.0 for single-category groups by construction of the fold).
    """
    counts = df.groupBy(*group_cols, cat_col).agg(
        F.count(F.lit(1)).alias("_c"))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col(cat_col).alias("cat"), F.col("_c").alias("c"))))
    per = counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["c"].cast("double")
                    * F.log(s["c"].cast("double"))).alias("_clnc"))
    return per.select(
        *group_cols, "n", "n_cats",
        (F.log(F.col("n").cast("double"))
         - F.col("_clnc") / F.col("n").cast("double")).alias("entropy"))


def gini_profile(df: DataFrame, group_cols: Sequence[str],
                 value_col: str) -> DataFrame:
    """Gini concentration coefficient per group over NON-NEGATIVE exact
    integer values (quantize upstream — cents, token counts): the
    inequality / concentration screen (spend concentration per segment,
    token-budget skew per source).

    Exactness: with values sorted ascending and i the 1-based position,
    ``g_num = Σ (2i − n − 1)·xᵢ`` is an exact long (tie-invariant:
    permuting equal values never changes the sum, so the arbitrary
    order among ties is harmless), and ``gini = g_num / (n·Σx)`` is one
    pinned divide — bit-stable cross-engine.  Negative values raise
    IN-plan (Gini is undefined there; never a silent wrong answer);
    NULLs are excluded.  Int64 headroom: |g_num| ≤ n²·max(x) — ANSI
    overflow fails loudly near n·√max(x) ≈ 3·10⁹; per-group sizes far
    past any exact-statistics use.

    Scale shape: one ROW_NUMBER window + one groupBy on the same group
    key = a single exchange (the spearman_corr discipline).

    Returns ``(group..., n, sum_v, g_num, gini)``; gini NULL for
    all-zero or empty groups (integer guard both engines).
    """
    v = F.col(value_col)
    clean = df.filter(v.isNotNull())
    checked = F.when(
        v < 0,
        F.raise_error(F.concat(
            F.lit("gini_profile: negative value in "), F.lit(value_col),
            F.lit(": "), v.cast("string"))).cast("long")
    ).otherwise(v.cast("long"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("_v"))
    ranked = clean.select(*group_cols, checked.alias("_v")) \
        .select(*group_cols, "_v",
                F.row_number().over(w).cast("long").alias("_i"),
                F.count(F.lit(1))
                .over(Window.partitionBy(*group_cols)).alias("_n"))
    agg = ranked.groupBy(*group_cols).agg(
        F.max("_n").alias("n"),
        F.sum("_v").alias("sum_v"),
        F.sum((F.lit(2) * F.col("_i") - F.col("_n") - 1) * F.col("_v"))
        .alias("g_num"))
    gini = F.when(
        F.col("sum_v") > 0,
        F.col("g_num").cast("double")
        / (F.col("n") * F.col("sum_v")).cast("double"))
    return agg.select(*group_cols, "n", "sum_v", "g_num",
                      gini.alias("gini"))


def rank_percentiles(df: DataFrame, group_cols: Sequence[str],
                     value_col: str,
                     qs: Sequence[int] = (50, 90, 99)) -> DataFrame:
    """Exact order-statistic percentiles per group: p_q is the
    ⌈q·n/100⌉-th smallest value — the RANK convention (no
    interpolation), so every output is an actual data value and the
    whole operator is exact integer arithmetic end-to-end.  The
    latency-SLO / size-budget summary (p50/p90/p99) that
    percentile_approx sketches; this is the exact form for when the
    numbers go in a report.

    Well-defined under ties (the sorted multiset's q-th element doesn't
    depend on tie order) and NULLs are excluded up front.  One
    ROW_NUMBER window + one conditional groupBy on the same key = a
    single exchange; cost is the per-group sort, same as any rank
    statistic.

    Returns ``(group..., n, p<q>...)`` e.g. ``p50, p90, p99``.
    """
    if not qs or any(q < 1 or q > 100 for q in qs):
        raise ValueError(f"qs must be within 1..100: {qs}")
    if len(set(qs)) != len(qs):
        raise ValueError(f"duplicate qs produce ambiguous columns: {qs}")
    v = F.col(value_col)
    clean = df.filter(v.isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(v)
    ranked = clean.select(
        *group_cols, v.alias("_v"),
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("_n"))
    # ceil(q*n/100) without floats: (q*n + 99) floor-div 100
    def _target(q):
        t = F.col("_n") * q + 99
        return ((t - F.pmod(t, F.lit(100))) / 100).cast("long")
    return ranked.groupBy(*group_cols).agg(
        F.max("_n").alias("n"),
        *[F.max(F.when(F.col("_rn") == _target(q), F.col("_v")))
          .alias(f"p{q}") for q in qs])


def chi_square_independence(df: DataFrame, a_col: str,
                            b_col: str) -> DataFrame:
    """Pearson chi-square statistic of independence between two
    categorical columns — the drift / association screen for label
    distributions (is event mix independent of weekday? does source
    predict language?).

    Exactness: cell counts O, row totals r, column totals c and the
    grand total n are exact longs over the COMPLETED grid (distinct-a
    × distinct-b — unobserved cells count O = 0 and still contribute
    r·c/n; dropping them understates chi2), and each cell's
    contribution is the algebraically identical exact-numerator form
    ``(n·O − r·c)² / (n·r·c)`` — the deviation ``n·O − r·c`` is the
    exact long (|dev| ≤ n² ⇒ exact to n ≈ 3·10⁹ rows); its square
    and the ``n·r·c`` denominator are evaluated as pinned IEEE double
    chains (both products overflow int64 far earlier — dev² at
    n ≈ 10⁵, n·r·c at n ≈ 2·10⁶), and the final sum is a PINNED-ORDER
    fold over cells sorted by (a, b) (float groupBy sums have
    nondeterministic addend order — the entropy_profile discipline).

    Scale shape: one (a, b) groupBy collapses the data to the
    contingency table (map-side combinable), then two windows + the
    final single-row fold run on the TINY table — cells = |a|·|b|
    distinct pairs, O(cardinality product), not O(rows).

    Returns one row ``(n, n_a, n_b, dof, chi2)``; chi2 NULL when the
    table is degenerate (dof = 0 — a constant column).
    """
    clean = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    observed = clean.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")).agg(
        F.count(F.lit(1)).alias("_o"))
    # COMPLETE the contingency grid: empty cells (O = 0) still
    # contribute (r·c/n) to chi2 — dropping them understates the
    # statistic (a perfect 2×2 association would read n/2, not n).
    # distinct-a × distinct-b is the tiny cardinality-product table.
    grid = (observed.select("_a").distinct()
            .crossJoin(F.broadcast(observed.select("_b").distinct())))
    cells = (grid.join(observed, ["_a", "_b"], "left")
             .select("_a", "_b",
                     F.coalesce(F.col("_o"), F.lit(0).cast("long"))
                     .alias("_o")))
    w_a = Window.partitionBy("_a")
    w_b = Window.partitionBy("_b")
    w_all = Window.partitionBy()
    with_tot = cells.select(
        "_a", "_b", "_o",
        F.sum("_o").over(w_a).alias("_r"),
        F.sum("_o").over(w_b).alias("_c"),
        F.sum("_o").over(w_all).alias("_n"))
    # dev stays exact int64 (|dev| ≤ n² ⇒ n ≲ 3·10⁹); SQUARE in
    # double — dev² would overflow int64 past n ≈ 10⁵ on a strongly
    # associated table.  n·r·c likewise multiplies as doubles (the
    # int64 product dies at n ≈ 2·10⁶); both are pinned left-to-right
    # IEEE chains, identical in the oracle.
    dev = (F.col("_n") * F.col("_o")
           - F.col("_r") * F.col("_c")).cast("double")
    term = ((dev * dev)
            / (F.col("_n").cast("double") * F.col("_r").cast("double")
               * F.col("_c").cast("double")))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("_a").alias("a"), F.col("_b").alias("b"),
        term.alias("t"))))
    agg = with_tot.groupBy().agg(
        F.max("_n").alias("n"),
        F.count_distinct(F.col("_a")).alias("n_a"),
        F.count_distinct(F.col("_b")).alias("n_b"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["t"]).alias("_chi2"))
    dof = ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long")
    return agg.select(
        "n", "n_a", "n_b", dof.alias("dof"),
        F.when(dof > 0, F.col("_chi2")).alias("chi2"))


def null_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Column-profiling summary — the data-quality first look (fill
    rates, cardinalities) a pipeline runs before trusting a new drop:
    per listed column, exact ``(n, n_null, n_distinct)`` and the
    fill-rate pinned divide.

    ONE pass: a single global aggregate computes every column's counts
    map-side-combinably (no per-column scans), then the one-row result
    unpivots in-row (explode of a literal-keyed struct array) — cost is
    one scan + one single-row exchange no matter how many columns.
    n_distinct counts non-null distincts (SQL COUNT DISTINCT
    semantics, identical in DuckDB).

    Returns ``(col_name, n, n_null, n_distinct, fill_rate)``.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                 F.col(f"_nd_{c}").alias("n_distinct"))
        for c in cols])
    return (one.select(F.col("_n").alias("n"),
                       F.explode(rows).alias("_s"))
            .select(F.col("_s.col_name").alias("col_name"), "n",
                    F.col("_s.n_null").alias("n_null"),
                    F.col("_s.n_distinct").alias("n_distinct"),
                    F.when(F.col("n") > 0,
                           (F.col("n") - F.col("_s.n_null"))
                           .cast("double") / F.col("n").cast("double"))
                    .alias("fill_rate")))


def group_mode(df: DataFrame, group_cols: Sequence[str],
               val_col: str) -> DataFrame:
    """Per-group MODE with a deterministic tie rule: the most frequent
    value; equal counts break to the SMALLEST value (a total order, so
    any engine agrees).  NULLs are excluded (they are absence, not a
    value).

    Two map-side-combinable groupBys + one window over the (group,
    value) AGGREGATE — the fact table never sorts.  Returns
    ``(group..., mode_val, mode_cnt, n_distinct)``.
    """
    g = list(group_cols)
    cnt = (df.filter(F.col(val_col).isNotNull())
           .groupBy(*g, val_col)
           .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy(*g).orderBy(F.col("_c").desc(),
                                       F.col(val_col).asc())
    return (cnt.select(*g, val_col, "_c",
                       F.row_number().over(w).alias("_rn"),
                       F.count(F.lit(1)).over(
                           Window.partitionBy(*g)).alias("n_distinct"))
            .filter(F.col("_rn") == 1)
            .select(*g, F.col(val_col).alias("mode_val"),
                    F.col("_c").alias("mode_cnt"), "n_distinct"))


def minmax_scale(df: DataFrame, group_cols: Sequence[str],
                 val_col: str, out_col: str = "scaled",
                 broadcast_groups: bool = True) -> DataFrame:
    """Per-group min-max feature scaling: ``(v − min) / (max − min)``
    into [0, 1] — the preprocessing normalizer for per-stratum quality
    scores before mixing strata.  Constant groups (max == min) scale to
    NULL (no information, not 0.5 — a sentinel midpoint would silently
    weight constant features).

    Exactness: min/max of exact longs, one pinned long→double divide
    per row.  NULL values pass through as NULL scaled.

    Shape for scale: the per-group extrema table is a map-side-
    combinable groupBy (rows = |groups|, tiny) joined BACK by broadcast
    — the fact table itself never exchanges.  Contrast a
    ``Window.partitionBy(group)`` formulation, which repartitions every
    fact row onto |groups| tasks and dies on low-cardinality groups.
    Pass ``broadcast_groups=False`` when |groups| is itself huge (e.g.
    per-document strata) — the join then hashes on the group key and
    AQE picks the strategy.
    """
    g = list(group_cols)
    ext = (df.filter(F.col(val_col).isNotNull())
           .groupBy(*g)
           .agg(F.min(val_col).alias("_lo"), F.max(val_col).alias("_hi")))
    rng = F.col("_hi") - F.col("_lo")
    scaled = F.when(
        rng > 0,
        (F.col(val_col) - F.col("_lo")).cast("double")
        / rng.cast("double"))
    dim = F.broadcast(ext) if broadcast_groups else ext
    return (df.join(dim, g, "left")
            .select(*df.columns, F.col("_lo").alias("lo"),
                    F.col("_hi").alias("hi"), scaled.alias(out_col)))


def kaplan_meier(subjects: DataFrame, group_cols: Sequence[str],
                 dur_col: str = "dur", event_col: str = "event",
                 scale: int = 1_000_000_000) -> DataFrame:
    """Kaplan-Meier product-limit survival curve per group — the
    survival-analysis staple behind churn / retention / reliability
    curves: at each event time t, S(t) multiplies by (n−d)/n where n
    is the at-risk count and d the event count (censored subjects
    leave the risk set at their censoring time without stepping the
    curve, the estimator's whole point).

    Exactness: risk sets and event/censor counts are exact int64
    windows over integer durations.  The product itself is carried in
    LOG space as an exact integer: each step contributes
    ``floor(ln((n−d)/n)·scale + 0.5)`` — the per-row ln of an
    identical double is engine-stable, the half-up quantization makes
    it an exact long, and the cumulative is then an ORDER-INDEPENDENT
    integer window sum (a raw double cumsum would depend on the
    engine's windowed-aggregation association order).
    ``S(t) = exp(log_surv_nano / scale)`` to within the quantization
    (1e-9 per step by default); when the curve hits exact zero (the
    whole remaining risk set dies — only possible at a group's last
    event time), ``log_surv_nano`` is NULL.

    Shape for scale: one map-side-combinable groupBy to (group,
    duration) — the ONLY subject-sized shuffle — then windows keyed on
    the same group key over the collapsed table (rows = distinct
    durations per group, calendar-bounded).  No joins, no collect.

    Reference: Kaplan & Meier (1958, "Nonparametric estimation from
    incomplete observations"); the exact-integer log carry is this
    engine's.

    Returns one row per (group, event time):
    ``(*group_cols, dur, n_risk, n_event, n_censor, log_surv_nano)``.
    """
    g = list(group_cols)
    ev = F.col(event_col).cast("long")
    per = (subjects.groupBy(*g, F.col(dur_col).alias("dur"))
           .agg(F.sum(ev).alias("n_event"),
                F.sum(1 - ev).alias("n_censor")))
    wtot = Window.partitionBy(*g)
    wprev = (Window.partitionBy(*g).orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, -1))
    wrun = (Window.partitionBy(*g).orderBy("dur")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_risk = (F.sum(F.col("n_event") + F.col("n_censor")).over(wtot)
              - F.coalesce(
                  F.sum(F.col("n_event") + F.col("n_censor")).over(wprev),
                  F.lit(0).cast("long")))
    stepped = per.withColumn("n_risk", n_risk)
    step = F.when(
        F.col("n_risk") > F.col("n_event"),
        F.floor(F.log((F.col("n_risk") - F.col("n_event")).cast("double")
                      / F.col("n_risk").cast("double"))
                * F.lit(float(scale)) + F.lit(0.5)))
    hit_zero = F.max(
        F.when(F.col("n_risk") <= F.col("n_event"), 1).otherwise(0)) \
        .over(wrun)
    out = (stepped
           .withColumn("_step", step)
           .withColumn(
               "log_surv_nano",
               F.when(hit_zero == 1, F.lit(None).cast("long"))
               .otherwise(F.sum("_step").over(wrun))))
    return (out.filter(F.col("n_event") >= 1)
            .select(*g, "dur", "n_risk", "n_event", "n_censor",
                    "log_surv_nano"))


def ols2(df: DataFrame, x1_col: str, x2_col: str, y_col: str,
         group_cols: "Sequence[str] | None" = None) -> DataFrame:
    """Two-feature least squares with intercept, solved EXACTLY by
    Cramer's rule on the integer normal equations — multiple
    regression without any iterative solver or float accumulation:
    the nine moment sums (n, Σx₁, Σx₂, Σx₁², Σx₂², Σx₁x₂, Σy, Σx₁y,
    Σx₂y) are exact int64 from ONE map-side-combinable aggregation,
    and the 3×3 determinants are single-row DECIMAL(38,0) arithmetic
    (int128-exact in DuckDB's HUGEINT — the same values bit-for-bit),
    so the coefficients are each ONE pinned integer→double division.

    Inputs must be integer-valued columns (quantize upstream: cents,
    hours, counts).  Degenerate design (det = 0: collinear or
    constant features) yields NULL coefficients, never a crash.
    Overflow discipline: moment sums must fit int64 (|x|³·n and
    |x|²·|y|·n bounded — rescale units past that); determinants then
    fit decimal(38) by construction for n < 10¹².

    Shape for scale: one aggregation, one single-row projection — the
    fact table shuffles ONCE (or zero times ungrouped: partial aggs
    only).  Per-group mode fits millions of groups (the row per group
    is 9 longs).

    Returns ``(*group_cols, n, b0, b1, b2)`` for y ≈ b0 + b1·x1 +
    b2·x2.
    """
    g = list(group_cols or [])
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    m = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"), F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"), F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"), F.sum(x2 * y).alias("s2y"))
    D = "decimal(38,0)"

    def c(name: str):
        return F.col(name).cast(D)

    def det3(a, b, d):
        # | a0 a1 a2 |   rows of the normal-equation matrix with one
        # | b0 b1 b2 |   column replaced; expansion along row 1.
        # | d0 d1 d2 |
        return (a[0] * (b[1] * d[2] - b[2] * d[1])
                - a[1] * (b[0] * d[2] - b[2] * d[0])
                + a[2] * (b[0] * d[1] - b[1] * d[0]))

    r0 = [c("n"), c("s1"), c("s2")]
    r1 = [c("s1"), c("s11"), c("s12")]
    r2 = [c("s2"), c("s12"), c("s22")]
    ry = [c("sy"), c("s1y"), c("s2y")]
    det = det3(r0, r1, r2)
    # replace the column that multiplies each unknown with the y vector
    det0 = det3([ry[0], c("s1"), c("s2")],
                [ry[1], c("s11"), c("s12")],
                [ry[2], c("s12"), c("s22")])
    det1 = det3([c("n"), ry[0], c("s2")],
                [c("s1"), ry[1], c("s12")],
                [c("s2"), ry[2], c("s22")])
    det2 = det3([c("n"), c("s1"), ry[0]],
                [c("s1"), c("s11"), ry[1]],
                [c("s2"), c("s12"), ry[2]])
    coef = [F.when(det != 0, dd.cast("double") / det.cast("double"))
            for dd in (det0, det1, det2)]
    return m.select(*g, "n", coef[0].alias("b0"),
                    coef[1].alias("b1"), coef[2].alias("b2"))


LNLN_SCALE = 1_000_000  # µ-nat quantization for ln-ln regressions


def loglog_fit(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Log-log OLS over positive integer columns: fit
    ln(y) = intercept + slope·ln(x), the power-law estimator behind
    Zipf slopes and gravity distance-decay fits.  Coordinates are
    quantized to exact integers ``floor(ln(·)·10⁶ + 0.5)`` BEFORE the
    moment sums (order-independent int64 aggregates — a double Σln
    over a distributed groupBy would depend on reduction order); the
    slope is ONE pinned division of exact integers and the
    intercept/r² run as FLAT double expressions (products of moment
    sums would overflow int64).  Quantization bounds the slope error
    at ~1e-6 — the operator's documented contract.

    Exactness bound: per-point products stay int64 (|q| ≤ ~3·10⁷);
    moment sums and their combinations run in DECIMAL(38)/HUGEINT,
    exact through n ≈ 10¹⁰ points (n·Σq² < 10³⁸).

    One scan + one single-row aggregate.  Returns
    ``(n, slope, intercept, r2)``; NULL fit when x is degenerate."""
    s = float(LNLN_SCALE)
    pts = df.select(
        F.floor(F.log(F.col(x_col).cast("double")) * F.lit(s)
                + F.lit(0.5)).cast("long").alias("qx"),
        F.floor(F.log(F.col(y_col).cast("double")) * F.lit(s)
                + F.lit(0.5)).cast("long").alias("qy"))
    pd_ = lambda c: c.cast("decimal(38,0)")
    agg = pts.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pd_(F.col("qx"))).alias("sx"),
        F.sum(pd_(F.col("qy"))).alias("sy"),
        # per-row products fit int64 (|q| ≤ ~3·10⁷) but their SUMS do
        # not past ~10⁴ points — cast to DECIMAL(38) before the sum
        F.sum(pd_(F.col("qx") * F.col("qx"))).alias("sxx"),
        F.sum(pd_(F.col("qy") * F.col("qy"))).alias("syy"),
        F.sum(pd_(F.col("qx") * F.col("qy"))).alias("sxy"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    n, sx, sy = dec("n"), dec("sx"), dec("sy")
    sxx, syy, sxy = dec("sxx"), dec("syy"), dec("sxy")
    # second-moment combinations overflow int64 past ~10³ points, so
    # they run in DECIMAL(38) (exact; DuckDB mirrors with HUGEINT —
    # the ols2 Cramer-determinant recipe), double only at the final
    # pinned divisions
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    deny = n * syy - sy * sy
    d = lambda c: c.cast("double")
    slope = F.when(den > 0, d(num) / d(den))
    intercept = F.when(
        den > 0,
        (d(sy) * d(sxx) - d(sx) * d(sxy))
        / (d(den) * F.lit(s)))
    r2 = F.when((den > 0) & (deny > 0),
                (d(num) * d(num)) / (d(den) * d(deny)))
    return agg.select("n", slope.alias("slope"),
                      intercept.alias("intercept"), r2.alias("r2"))


_ANOVA_MAX_ABS_SUM = 3_000_000_000  # |S_g| bound: S_g² must fit int64


def anova_f(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-way ANOVA F statistic with exact-integer moment arithmetic.

    ``value_col`` must be an integer column (quantize upstream — the
    cents convention).  Per group g: n_g, S_g = Σx, Q_g = Σx².  The
    between/within sums of squares are carried as EXACT int64 via the
    per-group floor-div ``T_g = S_g² // n_g`` (numerator non-negative:
    truncation = floor cross-engine):

        ssb_q = max(0, ΣT_g − S²//N)     (quantization can dip < 0 by
        ssw_q = Q − ΣT_g                  < k; clamped, mirrored)

    F is then ONE pinned double chain over the exact ints:
    ``(ssb·(N−k)) / (ssw·(k−1))`` with each product performed in
    double (the int products can exceed int64; double multiply is
    IEEE-pinned and bit-identical cross-engine).

    int64 bounds enforced IN-PLAN (raise_error, never a silent wrap):
    |S_g| ≤ 3·10⁹ per group AND |S| ≤ 3·10⁹ for the grand total (each
    squares into int64).  F is invariant to integer shifts of x, so
    center on an integer anchor (≈ the global mean) upstream to keep
    both sums small at fleet scale — the gate does exactly this.
    Q = Σx² is int64-safe whenever the bounds hold for x quantized to
    ≤ ~10⁶ units.

    Output: one row — ``(n, k, ssb_q, ssw_q, f_stat)``.
    """
    x = F.col(value_col).cast("long")
    g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(x).alias("s_g"),
        F.sum(x * x).alias("q_g"))
    guard = F.when(
        F.abs(F.col("s_g")) > F.lit(_ANOVA_MAX_ABS_SUM),
        F.raise_error(F.concat(
            F.lit("anova_f: |group sum| exceeds exact-int64 bound "
                  f"({_ANOVA_MAX_ABS_SUM}): s_g="),
            F.col("s_g").cast("string"))).cast("long")
    ).otherwise(F.expr("(s_g * s_g) div n_g").cast("long"))
    tg = g.select("n_g", "s_g", "q_g", guard.alias("t_g"))
    tot = tg.agg(F.sum("n_g").alias("n"),
                 F.count(F.lit(1)).alias("k"),
                 F.sum("s_g").alias("s"),
                 F.sum("q_g").alias("q"),
                 F.sum("t_g").alias("t"))
    # the GRAND total squares too: |s| needs the same in-plan bound as
    # each |s_g| (k same-sign groups sum to k·bound — center the values
    # on an integer anchor upstream to keep s small; F is invariant to
    # integer shifts of x)
    s_guarded = F.when(
        F.abs(F.col("s")) > F.lit(_ANOVA_MAX_ABS_SUM),
        F.raise_error(F.concat(
            F.lit("anova_f: |grand sum| exceeds exact-int64 bound "
                  f"({_ANOVA_MAX_ABS_SUM}); center values on an "
                  "integer anchor upstream: s="),
            F.col("s").cast("string"))).cast("long")
    ).otherwise(F.col("s"))
    tot = tot.withColumn("s", s_guarded)
    ssb = F.greatest(
        F.lit(0).cast("long"),
        (F.col("t") - F.expr("(s * s) div n")).cast("long"))
    ssw = (F.col("q") - F.col("t")).cast("long")
    out = tot.select(
        "n", "k", ssb.alias("ssb_q"), ssw.alias("ssw_q"))
    f_stat = F.when(
        (F.col("k") > 1) & (F.col("ssw_q") > 0),
        (F.col("ssb_q").cast("double")
         * (F.col("n") - F.col("k")).cast("double"))
        / (F.col("ssw_q").cast("double")
           * (F.col("k") - 1).cast("double")))
    return out.withColumn("f_stat", f_stat)


def winsorize_profile(df: DataFrame, group_cols: Sequence[str],
                      value_col: str, *, lo_q: int = 5,
                      hi_q: int = 95) -> DataFrame:
    """Winsorization report per group — the outlier-clamping step of a
    training-data curation pipeline, measured exactly: the clamp
    bounds are the EXACT ⌈q·n/100⌉-th order statistics (the
    rank_percentiles convention — actual data values, no
    interpolation) and every clipped count / sum is exact int64.

    One ROW_NUMBER window + one conditional groupBy on the same key =
    a single exchange, same cost shape as rank_percentiles.

    Output: ``(group..., n, lo_c, hi_c, n_clip_lo, n_clip_hi, sum_c,
    winsorized_sum_c)`` — winsorized_sum replaces values below lo with
    lo and above hi with hi.
    """
    if not (1 <= lo_q < hi_q <= 100):
        raise ValueError(f"need 1 <= lo_q < hi_q <= 100: {lo_q},{hi_q}")
    v = F.col(value_col).cast("long")
    clean = df.filter(v.isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(v)
    ranked = clean.select(
        *group_cols, v.alias("_v"),
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("_n"))

    def _target(q):
        t = F.col("_n") * q + 99
        return ((t - F.pmod(t, F.lit(100))) / 100).cast("long")

    bounds = ranked.groupBy(*group_cols).agg(
        F.max("_n").alias("n"),
        F.max(F.when(F.col("_rn") == _target(lo_q), F.col("_v")))
        .alias("lo_c"),
        F.max(F.when(F.col("_rn") == _target(hi_q), F.col("_v")))
        .alias("hi_c"))
    j = clean.select(*group_cols, v.alias("_v")).join(bounds, group_cols)
    clipped = F.greatest(F.least(F.col("_v"), F.col("hi_c")),
                         F.col("lo_c"))
    return j.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.max("lo_c").alias("lo_c"),
        F.max("hi_c").alias("hi_c"),
        F.sum((F.col("_v") < F.col("lo_c")).cast("int")).cast("long")
        .alias("n_clip_lo"),
        F.sum((F.col("_v") > F.col("hi_c")).cast("int")).cast("long")
        .alias("n_clip_hi"),
        F.sum("_v").alias("sum_c"),
        F.sum(clipped).alias("winsorized_sum_c"))


def welch_t(df: DataFrame, group_col: str, value_col: str,
            group_a, group_b) -> DataFrame:
    """Welch's unequal-variance t statistic between two named groups,
    from exact integer moments (n, S=Σx, Q=Σx² per group — one
    map-side-combinable aggregate; quantize values upstream).

    d_g = n_g·Q_g − S_g² is exact int64 (|S_g| bound enforced in-plan,
    the anova_f discipline); the t statistic is then ONE flat pinned
    double expression over the six exact ints::

        t = (S_a/n_a − S_b/n_b)
            / √( d_a/((n_a−1)·n_a²) + d_b/((n_b−1)·n_b²) )

    evaluated with fixed parenthesization (the loglog_fit
    flat-double-expression precedent).  NULL when either group has
    < 2 rows or both variances are zero.

    Output: one row — ``(n_a, s_a, d_a, n_b, s_b, d_b, t)``.
    """
    x = F.col(value_col).cast("long")
    g = F.col(group_col)
    filt = df.filter(g.isin(group_a, group_b))
    is_a = (g == group_a).cast("int")
    is_b = (g == group_b).cast("int")
    agg = filt.agg(
        F.sum(is_a).cast("long").alias("n_a"),
        F.sum(is_a * x).cast("long").alias("s_a"),
        F.sum(is_a * x * x).cast("long").alias("q_a"),
        F.sum(is_b).cast("long").alias("n_b"),
        F.sum(is_b * x).cast("long").alias("s_b"),
        F.sum(is_b * x * x).cast("long").alias("q_b"))

    def guard(s):
        return F.when(
            F.abs(F.col(s)) > F.lit(_ANOVA_MAX_ABS_SUM),
            F.raise_error(F.concat(
                F.lit(f"welch_t: |{s}| exceeds exact-int64 bound "
                      f"({_ANOVA_MAX_ABS_SUM}); center values "
                      "upstream: "), F.col(s).cast("string")))
            .cast("long")).otherwise(F.col(s))

    agg = agg.withColumn("s_a", guard("s_a")) \
             .withColumn("s_b", guard("s_b"))
    d_a = (F.col("n_a") * F.col("q_a")
           - F.col("s_a") * F.col("s_a")).cast("long")
    d_b = (F.col("n_b") * F.col("q_b")
           - F.col("s_b") * F.col("s_b")).cast("long")
    out = agg.select("n_a", "s_a", d_a.alias("d_a"),
                     "n_b", "s_b", d_b.alias("d_b"))
    dd = lambda c: F.col(c).cast("double")
    va = dd("d_a") / ((dd("n_a") - 1.0) * (dd("n_a") * dd("n_a")))
    vb = dd("d_b") / ((dd("n_b") - 1.0) * (dd("n_b") * dd("n_b")))
    t = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1)
        & ((F.col("d_a") > 0) | (F.col("d_b") > 0)),
        ((dd("s_a") / dd("n_a")) - (dd("s_b") / dd("n_b")))
        / F.sqrt(va + vb))
    return out.withColumn("t", t)


# Poisson(1) CDF thresholds scaled to 2^60 (exact integers; weight k
# is assigned when the 60-bit hash uniform falls in [T_{k-1}, T_k))
_POISSON1_T60 = (424136118829305344, 848272237658610688,
                 1060340297073263360, 1131029650211480960,
                 1148701988496035328, 1152236456152946176,
                 1152825534095764608, 1152909688087595776)


def poisson_bootstrap_ci(df: DataFrame, id_col: str, value_col: str, *,
                         n_replicas: int = 40, salt: str = "boot",
                         q_lo: int = 3, q_hi: int = 98) -> DataFrame:
    """Distributed bootstrap confidence interval for the mean via the
    POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012 — the resampling scheme that
    needs no global row count and no coordinated sampling): every row
    enters replica b with weight w ~ Poisson(1), here DETERMINISTIC —
    w is read off exact integer CDF thresholds against a 60-bit md5
    uniform of (salt, id, b), so the whole interval value-hashes
    cross-engine.

    Exactness: per-replica Σw·x and Σw are exact int64 (one
    map-side-combinable groupBy over the bounded ×B fan-out); each
    replica mean is ONE pinned division; the interval takes the exact
    ⌈q·B/100⌉-th order statistics of the B means (ties broken by
    replica id).

    Output: one row — ``(n, mean, b_replicas, lo_mean, hi_mean)``
    where mean is the full-sample exact-ratio mean.
    """
    from pyspark.sql import Window as W

    b_arr = F.sequence(F.lit(0), F.lit(int(n_replicas) - 1))
    u = F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.lit(salt),
                          F.col("_id").cast("string"),
                          F.col("_b").cast("string"))), 1, 15),
        16, 10).cast("long")
    w_expr = None
    for k, t in enumerate(_POISSON1_T60):
        cond = u < F.lit(t)
        w_expr = F.when(cond, k) if w_expr is None else \
            w_expr.when(cond, k)
    w_expr = w_expr.otherwise(len(_POISSON1_T60)).cast("long")
    x = F.col(value_col).cast("long")
    fan = df.select(x.alias("_x"), F.col(id_col).alias("_id"),
                    F.explode(b_arr).alias("_b"))
    rep = (fan.select("_b", (w_expr * F.col("_x")).alias("_wx"),
                      w_expr.alias("_w"))
           .groupBy("_b")
           .agg(F.sum("_wx").alias("s"), F.sum("_w").alias("nw"))
           .filter(F.col("nw") > 0)
           .select("_b", (F.col("s").cast("double")
                          / F.col("nw").cast("double")).alias("m")))
    wr = W.orderBy(F.col("m"), F.col("_b"))
    ranked = rep.select(
        "m", F.row_number().over(wr).cast("long").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("bn"))

    def _target(q):
        t = F.col("bn") * q + 99
        return ((t - F.pmod(t, F.lit(100))) / 100).cast("long")

    ci = ranked.agg(
        F.max("bn").alias("b_replicas"),
        F.max(F.when(F.col("r") == _target(q_lo), F.col("m")))
        .alias("lo_mean"),
        F.max(F.when(F.col("r") == _target(q_hi), F.col("m")))
        .alias("hi_mean"))
    tot = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(x).alias("s_all"))
    return (tot.crossJoin(F.broadcast(ci))
            .select("n",
                    (F.col("s_all").cast("double")
                     / F.col("n").cast("double")).alias("mean"),
                    "b_replicas", "lo_mean", "hi_mean"))


def nelson_aalen(subjects: DataFrame, group_cols: Sequence[str],
                 dur_col: str = "dur", event_col: str = "event",
                 scale: int = 1_000_000_000) -> DataFrame:
    """Nelson-Aalen cumulative hazard per group — Kaplan-Meier's
    additive sibling (H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ; Nelson 1972 / Aalen
    1978): preferred when hazard RATES are the object, and exactly
    exp(−H) approximates S.

    Same substrate and exactness discipline as kaplan_meier: risk
    sets from exact int64 windows over the collapsed (group,
    duration) table; each step contributes the half-up-quantized
    exact integer ``floor((d/n)·scale + 0.5)`` (one pinned division
    per step — no log needed here) and the cumulative is an
    order-independent integer window sum.  H in true units =
    hazard_nano / scale.

    Returns one row per (group, event time): ``(*group_cols, dur,
    n_risk, n_event, n_censor, hazard_nano)``.
    """
    g = list(group_cols)
    ev = F.col(event_col).cast("long")
    per = (subjects.groupBy(*g, F.col(dur_col).alias("dur"))
           .agg(F.sum(ev).alias("n_event"),
                F.sum(1 - ev).alias("n_censor")))
    wtot = Window.partitionBy(*g)
    wprev = (Window.partitionBy(*g).orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, -1))
    wrun = (Window.partitionBy(*g).orderBy("dur")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_risk = (F.sum(F.col("n_event") + F.col("n_censor")).over(wtot)
              - F.coalesce(
                  F.sum(F.col("n_event")
                        + F.col("n_censor")).over(wprev),
                  F.lit(0).cast("long")))
    stepped = per.withColumn("n_risk", n_risk)
    step = F.floor(F.col("n_event").cast("double")
                   / F.col("n_risk").cast("double")
                   * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    out = stepped.withColumn("_step", step).withColumn(
        "hazard_nano", F.sum("_step").over(wrun).cast("long"))
    return (out.filter(F.col("n_event") >= 1)
            .select(*g, "dur", "n_risk", "n_event", "n_censor",
                    "hazard_nano"))


# |d| bound for jarque_bera: per-row d² must fit int64 and the
# DECIMAL(38) fourth-moment sum must hold n·d⁴ (|d| ≤ 10⁶ keeps
# Σd⁴ ≤ 10²⁴·n exact through n ≈ 10¹⁴ rows per group)
_JB_MAX_ABS_DEV = 1_000_000


def jarque_bera(df: DataFrame, group_cols: Sequence[str],
                value_col: str) -> DataFrame:
    """Per-group Jarque-Bera normality profile — skewness g1, excess
    kurtosis g2 and the JB omnibus statistic ``n/6·(g1² + g2²/4)``,
    the data-quality screen for "is this metric even remotely
    Gaussian" before any t/z machinery is trusted.

    Exactness: ``value_col`` must be integer (the cents convention).
    Each group first computes its exact integer anchor
    ``a = Σx div n`` (floor mean) in one tiny aggregate that
    BROADCAST-joins back — the fact table never exchanges twice —
    then the anchored deviations ``d = x − a`` feed exact DECIMAL(38)
    power sums D1..D4 (D1 ∈ [0, n) by the floor-mean choice, so the
    about-the-mean correction δ = D1/n ∈ [0,1) stays tiny).  Central
    moments follow the standard about-a-point identities

        m2 = D2/n − δ²
        m3 = D3/n − 3δ·(D2/n) + 2δ³
        m4 = D4/n − 4δ·(D3/n) + 6δ²·(D2/n) − 3δ⁴

    as FLAT pinned double chains over the exact decimal sums (the
    loglog_fit discipline: exact integer aggregates, IEEE-pinned
    combination — the all-integer combination n³·D4 − … would
    overflow DECIMAL(38) around n ≈ 10⁵ at cents scale).

    int64/decimal bound: |d| ≤ 10⁶ enforced IN-PLAN via raise_error —
    per-row d² stays int64 and Σd⁴ stays DECIMAL(38)-exact through
    n ≈ 10¹⁴ rows per group.  Wider-spread data should be quantized
    coarser upstream (the F-invariance note on anova_f applies: g1/g2
    are scale-free, so unit choice only moves the guard).

    Scale shape: two map-side-combinable aggregates over one scan
    each + one broadcast join; output is O(groups).

    Returns ``(group..., n, g1, g2, jb)`` — g1/g2/jb NULL when the
    group is degenerate (n < 2 or zero variance, integer guard).
    """
    gcols = list(group_cols)
    x = F.col(value_col).cast("long")
    anchors = df.groupBy(*gcols).agg(
        F.sum(x).alias("_s"), F.count(x).alias("_n"))
    anchors = anchors.select(
        *gcols, F.expr("_s div _n").cast("long").alias("_a"))
    d = (x - F.col("_a"))
    guard_d = F.when(
        F.abs(d) > _JB_MAX_ABS_DEV,
        F.raise_error(F.concat(
            F.lit("jarque_bera: |x − anchor| exceeds exact bound "
                  f"({_JB_MAX_ABS_DEV}): d="), d.cast("string")))
        .cast("long")).otherwise(d)
    with_d = (df.join(F.broadcast(anchors), gcols)
              .select(*gcols, guard_d.alias("_d")))
    d2 = (F.col("_d") * F.col("_d"))  # ≤ 10¹² — exact long
    pd_ = lambda c: c.cast("decimal(38,0)")
    agg = with_d.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(pd_(F.col("_d"))).alias("_d1"),
        F.sum(pd_(d2)).alias("_d2"),
        F.sum(pd_(d2) * pd_(F.col("_d"))).alias("_d3"),
        F.sum(pd_(d2) * pd_(d2)).alias("_d4"))
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")
    delta = dd("_d1") / nd
    m2 = dd("_d2") / nd - delta * delta
    m3 = (dd("_d3") / nd - F.lit(3.0) * delta * (dd("_d2") / nd)
          + F.lit(2.0) * delta * delta * delta)
    m4 = (dd("_d4") / nd - F.lit(4.0) * delta * (dd("_d3") / nd)
          + F.lit(6.0) * delta * delta * (dd("_d2") / nd)
          - F.lit(3.0) * delta * delta * delta * delta)
    ok = (F.col("n") >= 2) & (F.col("_d2") * F.col("n")
                              > F.col("_d1") * F.col("_d1"))
    g1 = F.when(ok, m3 / (m2 * F.sqrt(m2)))
    g2 = F.when(ok, m4 / (m2 * m2) - F.lit(3.0))
    jb = F.when(ok, nd / F.lit(6.0)
                * (g1 * g1 + g2 * g2 / F.lit(4.0)))
    return agg.select(*gcols, "n", g1.alias("g1"), g2.alias("g2"),
                      jb.alias("jb"))


def brown_forsythe(df: DataFrame, group_col: str, value_col: str,
                   dev_quant: int = 1) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test — Levene's test with
    MEDIAN centers: the one-way ANOVA F recomputed on the absolute
    deviations from each group's median.  The robust pre-check before
    anova_f/welch_t conclusions are trusted (unequal spreads are
    exactly what breaks the pooled-variance F).

    ``dev_quant`` > 1 floor-divides the (non-negative) deviations by
    that literal before the F machinery — the bound-headroom knob,
    since |z| sums one-signed and can't be centered away like
    anova_f's input (the F on quantized deviations is a DETERMINISTIC
    documented statistic, mirrored exactly by the oracle; truncation
    = floor on the non-negative z cross-engine).

    Exactness: ``value_col`` must be integer (the cents convention).
    Each group's DOUBLED median ``m2 = m_lo + m_hi`` (the two middle
    order statistics; equal for odd n) is an exact long from one rank
    window, broadcast back, and the deviations ``z = |2x − m2|`` are
    exact longs — no float median, no half-units.  The F machinery is
    anova_f itself (shared code, shared in-plan int64 bounds; note z
    is NON-NEGATIVE so group sums approach the bound twice as fast as
    centered data — quantize coarser upstream if a group's Σ|z|
    nears 3·10⁹).

    Scale shape: one rank window (per-group sort) + one broadcast
    join + anova_f's two map-side-combinable aggregates.

    Reference: Brown & Forsythe (1974, JASA) — public formula; the
    doubled-median exact-integer evaluation is this engine's.

    Output: one row ``(n, k, ssb_q, ssw_q, f_stat)`` over the
    deviations (NULL f when degenerate, integer guard in anova_f).
    """
    x = F.col(value_col).cast("long")
    w = Window.partitionBy(group_col).orderBy(F.col("_x").asc())
    wg = Window.partitionBy(group_col)
    ranked = (df.select(group_col, x.alias("_x"))
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(wg)))
    mid = ranked.filter(
        (F.col("_rn") == F.expr("(_n + 1) div 2"))
        | (F.col("_rn") == F.expr("_n div 2 + 1")))
    med2 = mid.groupBy(group_col).agg(
        F.when(F.count(F.lit(1)) == 1, F.sum("_x") * 2)
        .otherwise(F.sum("_x")).alias("_m2"))
    z = (df.select(group_col, x.alias("_x"))
         .join(F.broadcast(med2), group_col)
         .select(group_col,
                 F.abs(F.col("_x") * 2 - F.col("_m2")).alias("_zr")))
    zq = (F.expr(f"_zr div {int(dev_quant)}") if dev_quant > 1
          else F.col("_zr"))
    return anova_f(z.select(group_col, zq.alias("_z")),
                   group_col, "_z")


# n_risk^4 must fit int64 for the log-rank variance numerator
# d·n1·n0·(n−d) ≤ n^4; 38,000^4 < 2^63 (the rankstats bound, shared
# discipline)
_SURV_MAX_GROUP_ROWS = 38_000

# concordance_index materializes O(n²/group) pairs — same practical
# ceiling as kendall_tau's pair join
_CINDEX_MAX_GROUP_ROWS = 20_000


def logrank_test(subjects: DataFrame, group_cols: Sequence[str],
                 flag_col: str, dur_col: str = "dur",
                 event_col: str = "event") -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test per group — "do these two
    survival curves differ?", the hypothesis test that pairs with the
    kaplan_meier estimator (same subjects schema: integer duration +
    0/1 event flag, plus a boolean ``flag_col`` naming the treatment
    arm).

    At each pooled event time t: observed treatment deaths d1_t
    (exact), expected under the null e1_t = d_t·n1_t/n_t, and the
    hypergeometric variance v_t = d_t·n1_t·n0_t·(n_t−d_t) /
    (n_t²·(n_t−1)).  O₁ = Σd1_t is an exact long; E₁ and V are sums of
    per-time rationals, each evaluated as ONE pinned integer→double
    division (numerators ≤ n⁴ — exact int64 under the in-plan
    ``_SURV_MAX_GROUP_ROWS`` guard) and summed by a PINNED-ORDER fold
    over the time-sorted list (the entropy_profile discipline — a
    float groupBy sum has nondeterministic addend order).
    χ² = (O₁−E₁)²/V on one degree of freedom.

    Scale shape: one subject-sized map-side-combinable groupBy to
    (group, dur) — everything after runs on the collapsed event-time
    table (windows + one fold, all keyed on the same group columns =
    one exchange).  No joins, no collect.

    Reference: Mantel (1966); Peto & Peto (1972, JRSS A) for the
    O/E/V form.  Pairs with kaplan_meier (operators/stats.py) the way
    the reference's style filters pair with its tile diff — test +
    estimator over one substrate.

    Returns one row per group:
    ``(*group_cols, n1_subj, n0_subj, o1, e1, v, chi2)`` — chi2 NULL
    when V = 0 (no comparable event times).
    """
    g = list(group_cols)
    f1 = F.col(flag_col).cast("long")
    ev = F.col(event_col).cast("long")
    per = (subjects.groupBy(*g, F.col(dur_col).alias("dur"))
           .agg(F.sum(ev * f1).alias("d1"),
                F.sum(ev * (1 - f1)).alias("d0"),
                F.sum((1 - ev) * f1).alias("c1"),
                F.sum((1 - ev) * (1 - f1)).alias("c0")))
    wtot = Window.partitionBy(*g)
    wprev = (Window.partitionBy(*g).orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, -1))

    def _risk(dcol, ccol):
        total = F.sum(F.col(dcol) + F.col(ccol)).over(wtot)
        gone = F.coalesce(F.sum(F.col(dcol) + F.col(ccol)).over(wprev),
                          F.lit(0).cast("long"))
        return (total - gone).cast("long")

    r = (per.withColumn("n1", _risk("d1", "c1"))
         .withColumn("n0", _risk("d0", "c0"))
         .withColumn("n1_subj", F.sum(F.col("d1") + F.col("c1"))
                     .over(wtot))
         .withColumn("n0_subj", F.sum(F.col("d0") + F.col("c0"))
                     .over(wtot))
         .filter(F.col("d1") + F.col("d0") >= 1))
    n = (F.col("n1") + F.col("n0"))
    d = (F.col("d1") + F.col("d0"))
    guard = F.when(
        n > _SURV_MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("logrank_test: risk set exceeds exact-int64 bound "
                  f"({_SURV_MAX_GROUP_ROWS}): n="), n.cast("string")))
        .cast("double"))
    e1t = guard.otherwise(
        (d * F.col("n1")).cast("double") / n.cast("double"))
    vt = F.when(
        n > 1,
        (d * F.col("n1") * F.col("n0") * (n - d)).cast("double")
        / (n * n * (n - 1)).cast("double")).otherwise(F.lit(0.0))
    terms = r.select(*g, "dur", "d1", "n1_subj", "n0_subj",
                     e1t.alias("_e1t"), vt.alias("_vt"))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("dur"), F.col("_e1t").alias("e1t"),
        F.col("_vt").alias("vt"))))
    agg = terms.groupBy(*g).agg(
        F.max("n1_subj").alias("n1_subj"),
        F.max("n0_subj").alias("n0_subj"),
        F.sum("d1").alias("o1"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["e1t"]).alias("e1"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["vt"]).alias("v"))
    diff = F.col("o1").cast("double") - F.col("e1")
    chi2 = F.when(F.col("v") > 0.0, diff * diff / F.col("v"))
    return agg.select(*g, "n1_subj", "n0_subj", "o1", "e1", "v",
                      chi2.alias("chi2"))


def concordance_index(subjects: DataFrame, group_cols: Sequence[str],
                      score_col: str, dur_col: str = "dur",
                      event_col: str = "event") -> DataFrame:
    """Harrell's concordance index per group — "does a higher risk
    score actually mean an earlier event?", THE discrimination metric
    for survival / churn models (C = P(score_i > score_j | subject i
    failed first)).

    Convention (pinned, the lifelines default): comparable pairs are
    ``dur_i < dur_j AND event_i = 1`` (strict — pairs tied in duration
    are not comparable); a concordant pair (score_i > score_j) counts
    2 half-units, a score tie counts 1, discordant 0, so
    ``units2 = 2C + T`` is an exact long and
    ``c_index = units2 / (2·n_pairs)`` is ONE pinned division.

    Scale shape: one self equi-join on the group key filtered to
    comparable pairs — O(n²/group), the inherent cost of the exact
    statistic, capped in-plan at ``_CINDEX_MAX_GROUP_ROWS`` subjects
    (raise_error, never a silent explosion); bigger groups want a
    stratified sample or the rank-inversion O(n log n) sketch.

    Returns ``(*group_cols, n_subj, n_pairs, units2, c_index)`` —
    c_index NULL when no comparable pairs exist.
    """
    g = list(group_cols)
    clean = subjects.filter(
        F.col(dur_col).isNotNull() & F.col(score_col).isNotNull())
    n_w = F.count(F.lit(1)).over(Window.partitionBy(*g))
    base = clean.select(
        *g, F.col(dur_col).alias("_t"),
        F.col(event_col).cast("long").alias("_ev"),
        F.col(score_col).alias("_s"), n_w.alias("_n"))
    guard = F.when(
        F.col("_n") > _CINDEX_MAX_GROUP_ROWS,
        F.raise_error(F.concat(
            F.lit("concordance_index: group exceeds pair-join bound "
                  f"({_CINDEX_MAX_GROUP_ROWS}): n="),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))
    base = base.withColumn("_n", guard)
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, [F.col(f"a.{c}") == F.col(f"b.{c}")
                       for c in g]
                   + [F.col("a._t") < F.col("b._t"),
                      F.col("a._ev") == 1])
    units2 = (F.when(F.col("a._s") > F.col("b._s"), 2)
              .when(F.col("a._s") == F.col("b._s"), 1)
              .otherwise(0))
    agg = pairs.groupBy(*[F.col(f"a.{c}").alias(c) for c in g]).agg(
        F.max(F.col("a._n")).alias("n_subj"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(units2).alias("units2"))
    c = F.when(
        F.col("n_pairs") > 0,
        F.col("units2").cast("double")
        / (F.lit(2.0) * F.col("n_pairs").cast("double")))
    return agg.select(*g, "n_subj", "n_pairs", "units2",
                      c.alias("c_index"))


def mcnemar_test(df: DataFrame, group_cols: Sequence[str],
                 a_col: str, b_col: str) -> DataFrame:
    """McNemar's test per group — marginal homogeneity of two PAIRED
    binary readings on the same subjects ("did the flag flip between
    condition A and condition B more often one way than the other?"),
    the paired sibling of the chi-square independence screen.

    Only the discordant cells matter: b01 = #(a ∧ ¬b), b10 = #(¬a ∧ b)
    are exact longs from one aggregation, and the statistic is the
    classic ``(b01−b10)²/(b01+b10)`` — the difference stays an exact
    long, squared in double (the chi_square_independence overflow
    discipline), one pinned division.  No continuity correction (the
    convention is pinned and documented; apply |diff|−1 upstream if
    the Edwards form is wanted).

    Scale shape: ONE map-side-combinable groupBy over subject rows —
    no windows, no joins.

    Returns ``(*group_cols, n, b01, b10, chi2)`` — chi2 NULL when no
    discordant pairs exist.
    """
    g = list(group_cols)
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    clean = df.filter(a.isNotNull() & b.isNotNull())
    agg = clean.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).alias("b01"),
        F.sum(F.when(~a & b, 1).otherwise(0)).alias("b10"))
    diff = (F.col("b01") - F.col("b10")).cast("double")
    tot = (F.col("b01") + F.col("b10"))
    chi2 = F.when(tot > 0, diff * diff / tot.cast("double"))
    return agg.select(*g, "n", "b01", "b10", chi2.alias("chi2"))


def cochran_q(presence: DataFrame, group_cols: Sequence[str],
              block_col: str, treat_col: str) -> DataFrame:
    """Cochran's Q per group — the k-treatment repeated-measures test
    for BINARY outcomes (friedman_test's 0/1 sibling): do the k
    treatments succeed at different rates, judged within blocks?

    Input is the sparse presence relation — one row per (block,
    treatment) where the outcome is 1; absent combinations are the
    0s.  The statistic is invariant to all-0 and all-1 blocks (their
    contributions cancel algebraically in both numerator and
    denominator), so the sparse encoding loses nothing.

    With column totals Cⱼ, block totals Rᵢ, grand total T = ΣCⱼ = ΣRᵢ:

        Q = (k−1)·(k·ΣCⱼ² − T²) / (k·T − ΣRᵢ²)

    — numerator and denominator are exact int64 (bound: k·T² must fit
    int64 ⇒ T ≲ 10⁹/√k, far past any per-group gate scale), ONE
    pinned division.  k is the number of distinct treatments observed
    in the group.

    Scale shape: one distinct + two map-side-combinable groupBys (by
    treatment and by block), all keyed under the same group columns —
    collapsed tables only, no windows over subject rows.

    Reference: Cochran (1950, Biometrika); the sparse-invariance note
    and exact-integer evaluation are this engine's.

    Returns ``(*group_cols, n_blocks, k, t, num, den, q_stat)`` —
    q_stat NULL when den = 0 (every block all-0/all-1).
    """
    g = list(group_cols)
    d = presence.select(
        *g, F.col(block_col).alias("_b"),
        F.col(treat_col).alias("_t")).distinct()
    per_treat = d.groupBy(*g, "_t").agg(F.count(F.lit(1)).alias("_cj"))
    by_g_t = per_treat.groupBy(*g).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_cj").alias("t"),
        F.sum(F.col("_cj") * F.col("_cj")).alias("_scj2"))
    per_block = d.groupBy(*g, "_b").agg(F.count(F.lit(1)).alias("_ri"))
    by_g_b = per_block.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("_ri") * F.col("_ri")).alias("_sri2"))
    j = by_g_t.join(by_g_b, g) if g else by_g_t.crossJoin(by_g_b)
    num = ((F.col("k") - 1)
           * (F.col("k") * F.col("_scj2") - F.col("t") * F.col("t")))
    den = (F.col("k") * F.col("t") - F.col("_sri2"))
    q = F.when(den > 0, num.cast("double") / den.cast("double"))
    return j.select(*g, "n_blocks", "k", "t", num.alias("num"),
                    den.alias("den"), q.alias("q_stat"))


def mood_median(df: DataFrame, sample_col: str,
                value_col: str) -> DataFrame:
    """Mood's median test — k-sample location test via the pooled
    median: flag every observation above the GRAND median and
    chi-square the sample × flag table (the robust screen when
    kruskal_wallis' rank windows are too heavy or distributions are
    wild).

    The grand median is the exact lower median (rank ⌈n/2⌉) computed
    on the collapsed distinct-value table — one groupBy + one window
    over rows bounded by VALUE CARDINALITY, not data size — and the
    test statistic reuses chi_square_independence's exact-numerator
    pinned-fold chain verbatim.

    Returns ONE row ``(median, n, n_samples, dof, chi2)``.
    """
    clean = df.filter(
        F.col(sample_col).isNotNull() & F.col(value_col).isNotNull())
    counts = clean.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c"))
    wcum = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    cum = counts.select(
        "_v", F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"))
    med = cum.filter(
        F.col("_cum") * 2 >= F.col("_n") + F.pmod(F.col("_n"), F.lit(2))
    ).agg(F.min("_v").alias("median"))
    flagged = clean.crossJoin(F.broadcast(med)).select(
        F.col(sample_col).alias("_s"),
        F.when(F.col(value_col) > F.col("median"), 1).otherwise(0)
        .alias("_above"),
        F.col("median"))
    chi = chi_square_independence(flagged, "_s", "_above")
    m = flagged.agg(F.max("median").alias("median"))
    return chi.crossJoin(F.broadcast(m)).select(
        "median", "n", F.col("n_a").alias("n_samples"), "dof", "chi2")


def partial_corr(df: DataFrame, group_cols: Sequence[str],
                 x_col: str, y_col: str, z_col: str) -> DataFrame:
    """First-order partial correlation r_xy·z — the x↔y association
    with the confounder z regressed out (Fisher 1924; the screening
    statistic behind "is price↔quantity real or is discount driving
    both"):

        r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²))

    Exactness: inputs must be integer-valued (cents-quantize
    upstream); per-row products stay int64, the nine moment sums and
    the n-scaled covariances S_ab = n·Σab − Σa·Σb run in DECIMAL(38)
    (the cuped_adjust recipe — DuckDB mirrors with HUGEINT), and each
    correlation is ONE pinned chain: r_ab = S_ab / √(S_aa·S_bb) with
    the √ taken over the double PRODUCT (one spelling, both engines).

    ONE map-side-combinable groupBy.  Returns
    ``(group..., n, r_xy, r_xz, r_yz, r_xy_z)`` — r_ab NULL when
    either variable is constant, r_xy_z NULL when additionally
    |r_xz| = 1 or |r_yz| = 1 (z explains a variable exactly)."""
    g = list(group_cols)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    z = F.col(z_col).cast("long")
    dec = "decimal(38,0)"
    agg = df.groupBy(*g).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(x.cast(dec)).alias("_sx"),
        F.sum(y.cast(dec)).alias("_sy"),
        F.sum(z.cast(dec)).alias("_sz"),
        F.sum((x * x).cast(dec)).alias("_sxx"),
        F.sum((y * y).cast(dec)).alias("_syy"),
        F.sum((z * z).cast(dec)).alias("_szz"),
        F.sum((x * y).cast(dec)).alias("_sxy"),
        F.sum((x * z).cast(dec)).alias("_sxz"),
        F.sum((y * z).cast(dec)).alias("_syz"))
    n = F.col("_n")
    d = lambda c: c.cast("double")

    def s(ab, a, b):
        return n * F.col(ab) - F.col(a) * F.col(b)

    sxx, syy, szz = (s("_sxx", "_sx", "_sx"), s("_syy", "_sy", "_sy"),
                     s("_szz", "_sz", "_sz"))
    sxy, sxz, syz = (s("_sxy", "_sx", "_sy"), s("_sxz", "_sx", "_sz"),
                     s("_syz", "_sy", "_sz"))

    def r(sab, saa, sbb):
        return F.when((saa > 0) & (sbb > 0),
                      d(sab) / F.sqrt(d(saa) * d(sbb)))

    rxy, rxz, ryz = r(sxy, sxx, syy), r(sxz, sxx, szz), r(syz, syy, szz)
    out = agg.select(
        *g, F.col("_n").cast("long").alias("n"),
        rxy.alias("r_xy"), rxz.alias("r_xz"), ryz.alias("r_yz"))
    den = ((F.lit(1.0) - F.col("r_xz") * F.col("r_xz"))
           * (F.lit(1.0) - F.col("r_yz") * F.col("r_yz")))
    pc = F.when(
        F.col("r_xy").isNotNull() & F.col("r_xz").isNotNull()
        & F.col("r_yz").isNotNull() & (den > 0),
        (F.col("r_xy") - F.col("r_xz") * F.col("r_yz")) / F.sqrt(den))
    return out.select(*g, "n", "r_xy", "r_xz", "r_yz",
                      pc.alias("r_xy_z"))


def grubbs_test(df: DataFrame, group_cols: Sequence[str],
                value_col: str, tiebreak: str) -> DataFrame:
    """Grubbs' maximum-deviation outlier statistic per group
    (Grubbs 1950): G = max|x − x̄| / s, the single-outlier screen run
    before trusting a group mean.  Carried exactly:

        G = max|n·x − Σx| / √(ss · n / (n − 1)),  ss = n·Σx² − (Σx)²

    — the deviation |n·x − Σx| is an exact DECIMAL(38) per row, the
    argmax resolves by the deterministic (dev, value, tiebreak)
    struct-max (documented tie-break: the LARGER value wins), and G is
    one pinned double chain (the welch_t discipline).

    Shape: one moments groupBy, a broadcast join of the (small) group
    table back onto the rows, one struct-max groupBy.  Returns
    ``(group..., n, x_out, g_stat)`` — NULL when n < 3 or the group
    is constant."""
    g = list(group_cols)
    x = F.col(value_col).cast("long")
    dec = "decimal(38,0)"
    mom = df.groupBy(*g).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(x.cast(dec)).alias("_sx"),
        F.sum((x * x).cast(dec)).alias("_sxx"))
    rows = df.select(*g, x.alias("_x"), F.col(tiebreak).alias("_tb"))
    jj = rows.join(F.broadcast(mom), g)
    dev = F.abs(F.col("_n") * F.col("_x").cast(dec) - F.col("_sx"))
    best = jj.groupBy(*g).agg(
        F.max(F.struct(dev.alias("_dev"), F.col("_x"),
                       F.col("_tb"))).alias("_m"),
        F.max(F.col("_n")).alias("_n2"),
        F.max(F.col("_sx")).alias("_sx2"),
        F.max(F.col("_sxx")).alias("_sxx2"))
    n = F.col("_n2")
    ss = n * F.col("_sxx2") - F.col("_sx2") * F.col("_sx2")
    d = lambda c: c.cast("double")
    gstat = F.when(
        (n >= 3) & (ss > 0),
        d(F.col("_m._dev"))
        / F.sqrt(d(ss) * d(n) / d(n - F.lit(1).cast(dec))))
    return best.select(
        *g, n.cast("long").alias("n"),
        F.col("_m._x").alias("x_out"), gstat.alias("g_stat"))


def cohen_kappa(df: DataFrame, true_col: str,
                pred_col: str) -> DataFrame:
    """Cohen's κ — chance-corrected agreement between two labelers
    (Cohen 1960): κ = (p_o − p_e)/(1 − p_e) with p_o the observed
    agreement and p_e the marginal-product chance agreement.  The
    one-number upgrade of a confusion matrix (lang_confusion): raw
    accuracy flatters a skewed label mix; κ=0 means "no better than
    guessing the marginals", κ=1 perfect.

    Exact rational form (the engine-wide integer discipline): with
    N = Σn, A = Σ diag, C = Σ_label row(l)·col(l),

        κ = (N·A − C) / (N² − C)

    — every term an exact long, emitted as numerator/denominator plus
    the one pinned double.

    Scale shape: one groupBy on the label pair, two tiny marginal
    aggregates full-outer-joined on the label (≤ |labels| rows), one
    single-row reduce — no row-level pair work.

    Returns ``(n_total, n_agree, chance_num, kappa_num, kappa_den,
    kappa)``.
    """
    conf = (df.groupBy(F.col(true_col).alias("_a"),
                       F.col(pred_col).alias("_b"))
            .agg(F.count(F.lit(1)).alias("_n")))
    tot = conf.agg(
        F.sum("_n").cast("long").alias("n_total"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n"))
              .otherwise(F.lit(0))).cast("long").alias("n_agree"))
    rows = conf.groupBy(F.col("_a").alias("_l")).agg(
        F.sum("_n").cast("long").alias("_r"))
    cols = conf.groupBy(F.col("_b").alias("_l")).agg(
        F.sum("_n").cast("long").alias("_c"))
    chance = (rows.join(cols, "_l", "full_outer")
              .agg(F.sum(F.coalesce(F.col("_r"), F.lit(0))
                         * F.coalesce(F.col("_c"), F.lit(0)))
                   .cast("long").alias("chance_num")))
    j = tot.crossJoin(chance)
    num = (F.col("n_total") * F.col("n_agree") - F.col("chance_num"))
    den = (F.col("n_total") * F.col("n_total") - F.col("chance_num"))
    return j.select(
        "n_total", "n_agree", "chance_num",
        num.alias("kappa_num"), den.alias("kappa_den"),
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .alias("kappa"))


def cronbach_alpha(df: DataFrame, item_cols: "list[str]") -> DataFrame:
    """Cronbach's α — internal-consistency reliability of k integer
    item scores measured on the same subjects (Cronbach 1951):
    α = k/(k−1) · (1 − Σᵢ var(itemᵢ) / var(total)) — do the k
    sub-scores (quality heuristics, rater channels) measure one
    underlying trait (α → 1) or unrelated things (α ≤ 0)?

    Exact rational: population variances share the n² denominator, so

        α = k·(D − N) / ((k−1)·D),   N = Σᵢ (n·Σxᵢ² − Sᵢ²),
                                     D = n·Σt² − T²   (t = Σᵢ xᵢ)

    — every moment an exact long (one scan, no per-subject division),
    emitted as numerator/denominator plus the pinned double.

    Returns ``(n_subjects, k_items, var_items_num, var_total_num,
    alpha_num, alpha_den, alpha)``.
    """
    k = len(item_cols)
    if k < 2:
        raise ValueError("need >= 2 item columns")
    xs = [F.col(c).cast("long") for c in item_cols]
    t = xs[0]
    for x in xs[1:]:
        t = t + x
    aggs = [F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(t).cast("long").alias("st"),
            F.sum(t * t).cast("long").alias("stt")]
    for i, x in enumerate(xs):
        aggs += [F.sum(x).cast("long").alias(f"s{i}"),
                 F.sum(x * x).cast("long").alias(f"ss{i}")]
    a = df.agg(*aggs)
    n = F.col("n")
    num = None
    for i in range(k):
        term = n * F.col(f"ss{i}") - F.col(f"s{i}") * F.col(f"s{i}")
        num = term if num is None else num + term
    den = n * F.col("stt") - F.col("st") * F.col("st")
    a = a.select(
        n.alias("n_subjects"), F.lit(k).cast("long").alias("k_items"),
        num.alias("var_items_num"), den.alias("var_total_num"))
    alpha_num = F.lit(k) * (F.col("var_total_num")
                            - F.col("var_items_num"))
    alpha_den = F.lit(k - 1) * F.col("var_total_num")
    return a.select(
        "n_subjects", "k_items", "var_items_num", "var_total_num",
        alpha_num.alias("alpha_num"), alpha_den.alias("alpha_den"),
        F.when(alpha_den > 0, alpha_num.cast("double")
               / alpha_den.cast("double")).alias("alpha"))


def theil_index(df: DataFrame, group_cols: "Sequence[str]",
                value_col: str) -> DataFrame:
    """Theil T inequality index per group (Theil 1967):
    T = (1/n)·Σ (xᵢ/µ)·ln(xᵢ/µ) — 0 at perfect equality, ln(n) at
    total concentration; the DECOMPOSABLE complement of gini_profile
    (T splits additively into between/within, Gini does not).

    Identity used: T = Σ xᵢ·ln(xᵢ) / S − ln(S/n)  (S = Σx, µ = S/n).
    Per-row ln is µ-nat-quantized (``floor(ln(x)·10⁶ + 0.5)``, the
    loglog_fit discipline) so Σ x·q is an EXACT long — order-free
    across any reduction tree; the final two terms are the one pinned
    double chain.  Non-positive values raise loudly in-plan (ln
    undefined — filter or shift upstream).

    One scan, one groupBy.  Returns
    ``(*group_cols, n, s, sum_x_qln, theil)``.
    """
    sc = float(LNLN_SCALE)
    x = F.col(value_col).cast("long")
    checked = F.when(x > 0, x).otherwise(
        F.raise_error(F.concat(
            F.lit("theil_index: non-positive value "),
            x.cast("string"))))
    q = F.floor(F.log(checked.cast("double")) * F.lit(sc)
                + F.lit(0.5)).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("s"),
        F.sum(x * q).cast("long").alias("sum_x_qln"))
    t = (F.col("sum_x_qln").cast("double")
         / (F.col("s").cast("double") * F.lit(sc))
         - F.log(F.col("s").cast("double") / F.col("n").cast("double")))
    return agg.withColumn(
        "theil", F.when(F.col("s") > 0, t))


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cramér's V effect size for the association between two
    categorical columns: V = sqrt(χ² / (n·min(n_a−1, n_b−1))) — the
    [0, 1]-normalized companion of ``chi_square_independence`` (χ²
    grows with n; V answers "how strong", not "how surprising").

    Exactness inherits the χ² contract (exact-numerator cells, pinned
    (a, b)-sorted fold); V adds one more pinned double chain (divide +
    sqrt).  Same scale shape: one groupBy to the contingency table,
    windows on the tiny cell set.  Returns one row
    ``(n, n_a, n_b, dof, chi2, v)`` — V is NULL when the table is
    degenerate, 1 at perfect association.
    """
    base = chi_square_independence(df, a_col, b_col)
    k = F.least(F.col("n_a") - 1, F.col("n_b") - 1)
    v = F.when(
        F.col("chi2").isNotNull() & (k > 0) & (F.col("n") > 0),
        F.sqrt(F.col("chi2")
               / (F.col("n").cast("double") * k.cast("double"))))
    return base.withColumn("v", v)


def odds_ratio(df: DataFrame, exposed_col: str,
               outcome_col: str) -> DataFrame:
    """2×2 epidemiological effect sizes for a binary exposure ×
    binary outcome: odds ratio OR = a·d / (b·c), relative risk
    RR = a·(c+d) / (c·(a+b)), and risk difference
    RD = (a·(c+d) − c·(a+b)) / ((a+b)·(c+d)) — the cohort-study
    summary trio (a = exposed∧outcome, b = exposed∧¬outcome,
    c = unexposed∧outcome, d = unexposed∧¬outcome).

    Exactness: the four cells are ONE exact map-side-combinable
    aggregate; every ratio is a single division over exact int64
    products (bound: cell products need n < 3·10⁹ — the auc_score
    discipline; shard upstream past that).  ``ln_or_se`` =
    sqrt(1/a + 1/b + 1/c + 1/d) is the one pinned left-to-right
    double chain (Woolf's CI half-width is 1.96·ln_or_se on ln OR).
    Ratios are NULL on empty margins/cells (no ±∞).

    Returns one row ``(a, b, c, d, odds_ratio, rel_risk, risk_diff,
    ln_or_se)``.  Both columns must be 0/1.
    """
    e = F.col(exposed_col).cast("long")
    o = F.col(outcome_col).cast("long")
    agg = df.agg(
        F.sum(e * o).alias("a"),
        F.sum(e * (1 - o)).alias("b"),
        F.sum((1 - e) * o).alias("c"),
        F.sum((1 - e) * (1 - o)).alias("d"))
    a, b, c, d = (F.col(x) for x in "abcd")
    orr = F.when(b * c > 0, (a * d).cast("double")
                 / (b * c).cast("double"))
    rr = F.when((c > 0) & (a + b > 0) & (c + d > 0),
                (a * (c + d)).cast("double")
                / (c * (a + b)).cast("double"))
    rd = F.when((a + b > 0) & (c + d > 0),
                (a * (c + d) - c * (a + b)).cast("double")
                / ((a + b) * (c + d)).cast("double"))
    se = F.when((a > 0) & (b > 0) & (c > 0) & (d > 0),
                F.sqrt(F.lit(1.0) / a.cast("double")
                       + F.lit(1.0) / b.cast("double")
                       + F.lit(1.0) / c.cast("double")
                       + F.lit(1.0) / d.cast("double")))
    return agg.select(
        "a", "b", "c", "d", orr.alias("odds_ratio"),
        rr.alias("rel_risk"), rd.alias("risk_diff"),
        se.alias("ln_or_se"))


def turning_points(df: DataFrame, group_cols: "Sequence[str]", *,
                   order_cols: "tuple[str, ...]", value_col: str
                   ) -> DataFrame:
    """Turning-point test of serial randomness per group: count the
    STRICT interior local extrema of the ordered series (both
    neighbors strictly smaller, or both strictly larger) and compare
    to the i.i.d. expectation E[T] = 2(n−2)/3,
    Var[T] = (16n−29)/90 — the cheap "is this stream random or
    trending/oscillating?" screen (too few turns ⇒ trend, too many ⇒
    alternation).

    Exactness: T is an exact integer count of strict-inequality
    events (tie-adjacent points are not extrema — the deterministic
    convention, documented); the z-score is carried with the EXACT
    integer numerator ``3·T − 2·(n−2)`` over the pinned chain
    ``3·√((16n−29)/90)`` — one divide, one √.  NULL for n < 3 or
    degenerate variance.

    One key exchange (ordering window + groupBy share it).  Returns
    ``(group..., n, t_count, z)``.
    """
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy(*order_cols)
    v = F.col(value_col).cast("long")
    lagv = F.lag(v).over(w)
    leadv = F.lead(v).over(w)
    # endpoint rows have NULL lag/lead: the condition is NULL there, so
    # pin the 0 branch explicitly (CASE-WHEN semantics, matching the
    # oracle) — otherwise a 1-2 row group sums all-NULL to NULL
    is_turn = F.when(((lagv < v) & (leadv < v))
                     | ((lagv > v) & (leadv > v)), 1).otherwise(0)
    base = df.select(*g, is_turn.alias("_t"))
    agg = base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_t").alias("t_count"))
    n = F.col("n")
    # z = (T − 2(n−2)/3) / sqrt((16n−29)/90)
    #   = (3T − 2(n−2)) / (3·sqrt((16n−29)/90)) — integer numerator
    num = (3 * F.col("t_count") - 2 * (n - 2)).cast("double")
    var90 = (16 * n - 29).cast("double")
    z = F.when((n >= 3) & (16 * n - 29 > 0),
               num / (F.lit(3.0) * F.sqrt(var90 / F.lit(90.0))))
    return agg.select(*g, "n", "t_count", z.alias("z"))


def cohen_d(df: DataFrame, group_col: str, value_col: str,
            group_a, group_b) -> DataFrame:
    """Cohen's d standardized mean difference between two named
    groups (pooled SD), with the Hedges small-sample correction
    g = J·d, J = 1 − 3/(4·df − 1) — the effect size a t statistic
    doesn't give you (t grows with n; d doesn't).

    Same exact-moment construction as welch_t: n, S, Q per group in
    one aggregate, (n−1)·s² = d_g/n_g from the exact int64
    d_g = n·Q − S² (|S| guarded in-plan), then

        d = (S_a/n_a − S_b/n_b)
            / √((d_a/n_a + d_b/n_b)/(n_a + n_b − 2))

    as one flat pinned chain.  NULL when df < 1 or both variances
    are zero.  Output one row
    ``(n_a, s_a, d_a, n_b, s_b, d_b, cohen_d, hedges_g)``.
    """
    x = F.col(value_col).cast("long")
    g = F.col(group_col)
    filt = df.filter(g.isin(group_a, group_b))
    is_a = (g == group_a).cast("int")
    is_b = (g == group_b).cast("int")
    agg = filt.agg(
        F.sum(is_a).cast("long").alias("n_a"),
        F.sum(is_a * x).cast("long").alias("s_a"),
        F.sum(is_a * x * x).cast("long").alias("q_a"),
        F.sum(is_b).cast("long").alias("n_b"),
        F.sum(is_b * x).cast("long").alias("s_b"),
        F.sum(is_b * x * x).cast("long").alias("q_b"))

    def guard(s):
        return F.when(
            F.abs(F.col(s)) > F.lit(_ANOVA_MAX_ABS_SUM),
            F.raise_error(F.concat(
                F.lit(f"cohen_d: |{s}| exceeds exact-int64 bound "
                      f"({_ANOVA_MAX_ABS_SUM}); center values "
                      "upstream: "), F.col(s).cast("string")))
            .cast("long")).otherwise(F.col(s))

    agg = agg.withColumn("s_a", guard("s_a")) \
             .withColumn("s_b", guard("s_b"))
    d_a = (F.col("n_a") * F.col("q_a")
           - F.col("s_a") * F.col("s_a")).cast("long")
    d_b = (F.col("n_b") * F.col("q_b")
           - F.col("s_b") * F.col("s_b")).cast("long")
    out = agg.select("n_a", "s_a", d_a.alias("d_a"),
                     "n_b", "s_b", d_b.alias("d_b"))
    dd = lambda c: F.col(c).cast("double")
    df_ = dd("n_a") + dd("n_b") - 2.0
    sp2 = (dd("d_a") / dd("n_a") + dd("d_b") / dd("n_b")) / df_
    d = F.when(
        (F.col("n_a") + F.col("n_b") > 2)
        & ((F.col("d_a") > 0) | (F.col("d_b") > 0)),
        ((dd("s_a") / dd("n_a")) - (dd("s_b") / dd("n_b")))
        / F.sqrt(sp2))
    j = F.lit(1.0) - 3.0 / (4.0 * df_ - 1.0)
    out = out.withColumn("cohen_d", d)
    return out.withColumn(
        "hedges_g", F.when(F.col("cohen_d").isNotNull(),
                           j * F.col("cohen_d")))


def icc_oneway(df: DataFrame, group_col: str,
               value_col: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1)
    (Shrout-Fleiss 1979) — the reliability coefficient: what share of
    measurement variance is BETWEEN subjects rather than within?
    Unequal group sizes use the standard k0 = (N − Σn_g²/N)/(G−1)
    average-size correction.

        ICC = (MSB − MSW) / (MSB + (k0 − 1)·MSW)

    Built on the anova_f exact construction: per-group exact int64
    moments, T_g = S_g² div n_g (floor-div, cross-engine), quantized
    SSB/SSW with the same in-plan |S| guards; Σn_g² is one more exact
    long.  MSB/MSW/k0/ICC are ONE flat pinned double chain.  NULL
    when G < 2, N ≤ G, or the denominator is 0.

    One group aggregate + one single-row fold.  Returns
    ``(n, k, ssb_q, ssw_q, sum_ng2, icc)``.
    """
    x = F.col(value_col).cast("long")
    g = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(x).alias("s_g"),
        F.sum(x * x).alias("q_g"))
    guard = F.when(
        F.abs(F.col("s_g")) > F.lit(_ANOVA_MAX_ABS_SUM),
        F.raise_error(F.concat(
            F.lit("icc_oneway: |group sum| exceeds exact-int64 bound "
                  f"({_ANOVA_MAX_ABS_SUM}): s_g="),
            F.col("s_g").cast("string"))).cast("long")
    ).otherwise(F.expr("(s_g * s_g) div n_g").cast("long"))
    tg = g.select("n_g", "s_g", "q_g", guard.alias("t_g"))
    tot = tg.agg(F.sum("n_g").alias("n"),
                 F.count(F.lit(1)).alias("k"),
                 F.sum("s_g").alias("s"),
                 F.sum("q_g").alias("q"),
                 F.sum("t_g").alias("t"),
                 F.sum(F.col("n_g") * F.col("n_g")).alias("sum_ng2"))
    s_guarded = F.when(
        F.abs(F.col("s")) > F.lit(_ANOVA_MAX_ABS_SUM),
        F.raise_error(F.concat(
            F.lit("icc_oneway: |grand sum| exceeds exact-int64 bound "
                  f"({_ANOVA_MAX_ABS_SUM}); center values upstream: "
                  "s="), F.col("s").cast("string"))).cast("long")
    ).otherwise(F.col("s"))
    tot = tot.withColumn("s", s_guarded)
    ssb = F.greatest(
        F.lit(0).cast("long"),
        (F.col("t") - F.expr("(s * s) div n")).cast("long"))
    ssw = (F.col("q") - F.col("t")).cast("long")
    out = tot.select("n", "k", ssb.alias("ssb_q"), ssw.alias("ssw_q"),
                     "sum_ng2")
    dd = lambda c: F.col(c).cast("double")
    msb = dd("ssb_q") / (dd("k") - 1.0)
    msw = dd("ssw_q") / (dd("n") - dd("k"))
    k0 = (dd("n") - dd("sum_ng2") / dd("n")) / (dd("k") - 1.0)
    den = msb + (k0 - 1.0) * msw
    return out.withColumn(
        "icc", F.when((F.col("k") > 1) & (F.col("n") > F.col("k"))
                      & (F.col("ssw_q") + F.col("ssb_q") > 0),
                      (msb - msw) / den))


_FLEISS_MAX_NM = 100_000


def fleiss_kappa(df: DataFrame, group_cols: Sequence[str],
                 item_col: str, cat_col: str) -> DataFrame:
    """Fleiss' κ — chance-corrected agreement for a PANEL of raters
    (Fleiss 1971), the multi-rater generalization of
    :func:`cohen_kappa`: each item is rated by the same number m of
    raters into nominal categories; κ compares the observed pairwise
    agreement inside items to the agreement the pooled category mix
    would produce by chance.

    Exact rational form (engine-wide integer discipline): with N items,
    m raters, n_ic the item×category counts, S_c = Σᵢ n_ic,

        P_o = (Σ n_ic² − N·m) / (N·m·(m−1)),   P_e = Σ S_c² / (N·m)²
        κ   = (P_o − P_e) / (1 − P_e)
            = (A·D₂ − B·D₁) / (D₁·(D₂ − B))

    with A = Σ n_ic² − Nm, D₁ = Nm(m−1), B = Σ S_c², D₂ = (Nm)² — every
    term an exact long, ONE double division.  The equal-raters
    precondition is enforced IN-PLAN (min ≠ max panel size →
    raise_error), as is the ``N·m ≤ 100000`` bound that keeps
    D₁·D₂ inside int64 (κ is a per-group statistic; bigger panels
    want a finer group key).

    Scale shape: one map-side-combinable groupBy to (group, item,
    category) — the only ratings-sized shuffle — then two tiny
    collapses (per-item, per-category) joined on the group key.  No
    windows over raw ratings, no collect.

    Returns one row per group: ``(*group_cols, n_items, n_raters,
    n_cats, po_num, po_den, pe_num, pe_den, kappa)`` — κ NULL when
    m = 1 or every rating lands in one category (P_e = 1).
    ``group_cols`` must be non-empty (use a constant column for a
    global κ).
    """
    g = list(group_cols)
    cell = (df.groupBy(*g, F.col(item_col).alias("_i"),
                       F.col(cat_col).alias("_c"))
            .agg(F.count(F.lit(1)).alias("_n")))
    item = (cell.groupBy(*g, "_i")
            .agg(F.sum("_n").alias("_m"),
                 F.sum(F.col("_n") * F.col("_n")).alias("_sq")))
    gi = (item.groupBy(*g)
          .agg(F.count(F.lit(1)).alias("n_items"),
               F.min("_m").alias("_mn"), F.max("_m").alias("_mx"),
               F.sum("_sq").alias("_ssq")))
    cat = (cell.groupBy(*g, "_c").agg(F.sum("_n").alias("_s")))
    gc = (cat.groupBy(*g)
          .agg(F.count(F.lit(1)).alias("n_cats"),
               F.sum(F.col("_s") * F.col("_s")).alias("_bsq")))
    j = gi.join(gc, g)
    m = F.when(
        F.col("_mn") != F.col("_mx"),
        F.raise_error(F.concat(
            F.lit("fleiss_kappa: unequal raters per item: min="),
            F.col("_mn").cast("string"), F.lit(" max="),
            F.col("_mx").cast("string"))).cast("long")
    ).otherwise(F.col("_mx"))
    nm = F.when(
        F.col("n_items") * m > _FLEISS_MAX_NM,
        F.raise_error(F.concat(
            F.lit(f"fleiss_kappa: N*m exceeds int64-safe bound "
                  f"({_FLEISS_MAX_NM}): "),
            (F.col("n_items") * m).cast("string"))).cast("long")
    ).otherwise(F.col("n_items") * m)
    a = (F.col("_ssq") - nm)
    d1 = nm * (m - 1)
    b = F.col("_bsq")
    d2 = nm * nm
    num = a * d2 - b * d1
    den = d1 * (d2 - b)
    return j.select(
        *g, "n_items", m.alias("n_raters"), "n_cats",
        a.alias("po_num"), d1.alias("po_den"),
        b.alias("pe_num"), d2.alias("pe_den"),
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .alias("kappa"))


_JSD_MAX_SIDE = 1 << 30


def js_divergence(df: DataFrame, group_cols: Sequence[str],
                  flag_col: str, cat_col: str) -> DataFrame:
    """Jensen-Shannon divergence between the categorical distributions
    of a group's two halves (``flag_col`` true vs false) — the bounded,
    symmetric, zero-tolerant distribution-drift measure (Lin 1991):
    0 = identical mixes, ln 2 = disjoint supports.  Complements
    ``psi_drift`` (which blows up on empty cells) and ``entropy_profile``
    (single-distribution); ``sqrt(jsd)`` — also returned — is a true
    metric (Endres & Schindelin 2003).

    Exactness: category counts a_c, b_c and totals A, B are exact longs
    (ONE map-side-combinable shuffle); each log argument is a ratio of
    exact int64 products, ``p_c/m_c = 2·a_c·B / (a_c·B + b_c·A)``, so
    both engines take ln of the SAME IEEE double, and the two Σ terms
    are PINNED-ORDER folds over the category list sorted by category
    (the entropy_profile discipline).  ``A,B ≤ 2^30`` is enforced
    in-plan to keep ``2·a_c·B`` inside int64 (raise_error — split by a
    finer group key beyond that).

    Returns ``(group..., n_a, n_b, n_cats, jsd, js_dist)`` in nats;
    NULL when either half is empty.
    """
    g = list(group_cols)
    clean = df.filter(F.col(flag_col).isNotNull()
                      & F.col(cat_col).isNotNull())
    cell = (clean.groupBy(*g, F.col(cat_col).alias("_c"))
            .agg(F.sum(F.when(F.col(flag_col), 1).otherwise(0))
                 .cast("long").alias("_a"),
                 F.sum(F.when(~F.col(flag_col), 1).otherwise(0))
                 .cast("long").alias("_b")))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("_c").alias("cat"), F.col("_a").alias("a"),
        F.col("_b").alias("b"))))
    per = cell.groupBy(*g).agg(
        F.sum("_a").alias("n_a"), F.sum("_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_cats"), arr.alias("_arr"))
    big = F.greatest(F.col("n_a"), F.col("n_b"))
    aa = F.when(
        big > _JSD_MAX_SIDE,
        F.raise_error(F.concat(
            F.lit("js_divergence: side exceeds int64-safe bound "
                  f"({_JSD_MAX_SIDE}): "),
            big.cast("string"))).cast("long")
    ).otherwise(F.col("n_a"))
    bb = F.col("n_b")

    def fold(side):
        def term(s):
            a, b = s["a"], s["b"]
            den = (a * bb + b * aa).cast("double")
            if side == "a":
                return F.when(
                    a > 0, a.cast("double")
                    * F.log((2 * a * bb).cast("double") / den)) \
                    .otherwise(F.lit(0.0))
            return F.when(
                b > 0, b.cast("double")
                * F.log((2 * b * aa).cast("double") / den)) \
                .otherwise(F.lit(0.0))
        return F.aggregate(F.col("_arr"), F.lit(0.0),
                           lambda acc, s: acc + term(s))

    jsd = F.when(
        (aa > 0) & (bb > 0),
        fold("a") / (2 * aa).cast("double")
        + fold("b") / (2 * bb).cast("double"))
    return per.select(
        *g, "n_a", "n_b", "n_cats", jsd.alias("jsd"),
        F.when(jsd.isNotNull(),
               F.sqrt(F.greatest(jsd, F.lit(0.0)))).alias("js_dist"))


def rmst(subjects: DataFrame, group_cols: Sequence[str],
         dur_col: str = "dur", event_col: str = "event", *,
         tau: int, scale: int = 1_000_000_000) -> DataFrame:
    """Restricted mean survival time — the area under the
    :func:`kaplan_meier` curve up to the horizon ``tau`` (Royston &
    Parmar 2013): "expected survival time within the first τ days",
    the model-free effect size survival analyses report when hazards
    aren't proportional and medians are undefined.

    Exactness: the KM curve arrives as the exact integer log carry
    (``log_surv_nano``), durations and τ are exact longs, so each
    rectangle ``S(t_{k-1})·(min(t_k,τ) − min(t_{k-1},τ))`` is the
    product of an engine-stable double and an exact integer gap; the
    rectangles are summed in a PINNED ascending-duration fold (one
    in-row aggregate over the collapsed per-group event-time list —
    curve rows per group are calendar-bounded), then the tail
    rectangle ``S(t_last)·(τ − min(t_last,τ))`` is added last.  A
    curve that hits exact zero (NULL log carry) contributes zero
    area from that time on.

    Shape for scale: everything after kaplan_meier's single
    subject-sized shuffle touches only the collapsed curve (rows =
    distinct event durations per group).

    Returns one row per group with at least one EVENT duration:
    ``(*group_cols, n_times, tau, rmst)`` — all-censored groups have
    no curve and drop out, mirroring kaplan_meier.
    """
    g = list(group_cols)
    km = kaplan_meier(subjects, g, dur_col, event_col, scale)
    tau_l = F.lit(int(tau)).cast("long")
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("dur").alias("t"), F.col("log_surv_nano").alias("ls"))))
    per = km.groupBy(*g).agg(F.count(F.lit(1)).alias("n_times"),
                             arr.alias("_a"))
    init = F.struct(F.lit(0).cast("long").alias("t"),
                    F.lit(1.0).alias("s"),
                    F.lit(0.0).alias("tot"))

    def surv(ls):
        return F.when(ls.isNull(), F.lit(0.0)) \
            .otherwise(F.exp(ls.cast("double") / F.lit(float(scale))))

    def merge(acc, x):
        gap = (F.least(x["t"], tau_l) - F.least(acc["t"], tau_l))
        return F.struct(
            x["t"].alias("t"), surv(x["ls"]).alias("s"),
            (acc["tot"] + acc["s"] * gap.cast("double")).alias("tot"))

    def finish(acc):
        return (acc["tot"]
                + acc["s"] * (tau_l - F.least(acc["t"], tau_l))
                .cast("double"))

    val = F.aggregate(F.col("_a"), init, merge, finish)
    return per.select(*g, "n_times", tau_l.alias("tau"),
                      val.alias("rmst"))


def wilson_ci(df: DataFrame, group_cols: Sequence[str],
              success_col: str, *, z: float = 1.959963984540054
              ) -> DataFrame:
    """Wilson score confidence interval for a per-group binomial
    proportion (Wilson 1927) — the interval a metrics pipeline should
    quote instead of the Wald ±z√(p̂q̂/n) one, which collapses to
    zero width at p̂ ∈ {0,1} and undercovers small n; Wilson stays
    inside (0,1) and behaves at the boundary.

    Exactness: n and successes s are exact longs; using the closed
    form

        lo, hi = (2s + z² ∓ z·√(z² + 4·s·(n−s)/n)) / (2·(n + z²))

    the only inexact inputs are the pinned literal z and the ordered
    double chain (4·s·(n−s) is an exact int64 to n ≈ 3·10⁹ — ANSI
    overflow fails loudly past that), so both engines emit identical
    doubles, clamped to [0, 1] (the closed form can overshoot by an
    ulp at the boundary).  One groupBy, map-side combinable; NULL
    rows excluded.

    Returns ``(group..., n, successes, p_hat, lo, hi)``; empty groups
    don't appear, n = 0 cannot arise.
    """
    g = list(group_cols)
    clean = df.filter(F.col(success_col).isNotNull())
    s = F.col(success_col).cast("boolean").cast("long")
    agg = clean.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(s).cast("long").alias("successes"))
    n, sc = F.col("n"), F.col("successes")
    zz = F.lit(float(z))
    z2 = zz * zz
    root = zz * F.sqrt(z2 + (4 * sc * (n - sc)).cast("double")
                       / n.cast("double"))
    den = 2.0 * (n.cast("double") + z2)
    base = (2 * sc).cast("double") + z2
    return agg.select(
        *g, "n", "successes",
        (sc.cast("double") / n.cast("double")).alias("p_hat"),
        F.greatest((base - root) / den, F.lit(0.0)).alias("lo"),
        F.least((base + root) / den, F.lit(1.0)).alias("hi"))


def cuminc(subjects: DataFrame, group_cols: Sequence[str],
           dur_col: str = "dur", cause_col: str = "cause", *,
           scale: int = 1_000_000_000) -> DataFrame:
    """Competing-risks cumulative incidence (the Aalen-Johansen
    estimator, two-state-per-cause form): with cause 0 = censored and
    causes 1..K competing events,

        CIF_k(t) = Σ_{event times s ≤ t}  S(s⁻) · d_{k,s} / n_s

    — the probability of failing FROM CAUSE k by t, which 1−KM per
    cause famously overestimates (the competing events are not
    censoring).  Σ_k CIF_k(∞) + S(∞) = 1.

    Exactness discipline (the kaplan_meier carry, extended): the
    all-cause survival prefix S(s⁻) rides the exact integer log carry
    (order-independent int64 window sum of quantized ln steps, NULL
    after the curve hits exact zero — contributions after that are
    zero); each increment ``S(s⁻)·d_k/n`` is an engine-stable double
    QUANTIZED to ``floor(x·scale + 0.5)`` — an exact long — so the
    running CIF is again an order-independent integer window sum
    (error ≤ 1/scale per event time, deterministic, identical both
    engines; a raw double running sum would depend on the engine's
    windowed-aggregation association order).  ``cif = cif_q/scale``.

    Shape: one subject-sized groupBy to (group, dur, cause) — the only
    big shuffle — then windows on the collapsed (group, dur) and
    (group, cause, dur) tables.

    Returns one row per (group, cause ≥ 1, event time):
    ``(*group_cols, cause, dur, n_risk, d_cause, cif_q, cif)``.
    """
    g = list(group_cols)
    c = F.col(cause_col).cast("long")
    cell = (subjects.groupBy(*g, F.col(dur_col).alias("dur"),
                             c.alias("cause"))
            .agg(F.count(F.lit(1)).cast("long").alias("_d")))
    per_t = (cell.groupBy(*g, "dur")
             .agg(F.sum("_d").alias("_n_at"),
                  F.sum(F.when(F.col("cause") > 0, F.col("_d"))
                        .otherwise(0)).alias("_d_all")))
    wtot = Window.partitionBy(*g)
    wprev = (Window.partitionBy(*g).orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, -1))
    n_risk = (F.sum("_n_at").over(wtot)
              - F.coalesce(F.sum("_n_at").over(wprev),
                           F.lit(0).cast("long")))
    per_t = per_t.withColumn("n_risk", n_risk)
    step = F.when(
        (F.col("n_risk") > F.col("_d_all")) & (F.col("_d_all") > 0),
        F.floor(F.log((F.col("n_risk") - F.col("_d_all"))
                      .cast("double")
                      / F.col("n_risk").cast("double"))
                * F.lit(float(scale)) + F.lit(0.5))
    ).otherwise(F.lit(0).cast("long"))
    dead_before = F.coalesce(
        F.max(F.when(F.col("n_risk") <= F.col("_d_all"), 1)
              .otherwise(0)).over(wprev), F.lit(0))
    log_prev = F.when(dead_before == 1, F.lit(None).cast("long")) \
        .otherwise(F.coalesce(F.sum(step).over(wprev),
                              F.lit(0).cast("long")))
    per_t = per_t.withColumn("_log_prev", log_prev)
    s_prev = F.when(F.col("_log_prev").isNull(), F.lit(0.0)) \
        .otherwise(F.exp(F.col("_log_prev").cast("double")
                         / F.lit(float(scale))))
    inc_q = F.floor(
        s_prev * (F.col("_d").cast("double")
                  / F.col("n_risk").cast("double"))
        * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    ev = (cell.filter(F.col("cause") > 0)
          .join(per_t.select(*g, "dur", "n_risk", "_log_prev"),
                [*g, "dur"])
          .withColumn("_inc_q", inc_q))
    wrunc = (Window.partitionBy(*g, "cause").orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ev.select(
        *g, "cause", "dur", "n_risk", F.col("_d").alias("d_cause"),
        F.sum("_inc_q").over(wrunc).alias("cif_q"))
        .withColumn("cif", F.col("cif_q").cast("double")
                    / F.lit(float(scale))))


def cochran_armitage(df: DataFrame, group_cols: Sequence[str],
                     dose_col: str, success_col: str) -> DataFrame:
    """Cochran-Armitage trend test per group — "does the SUCCESS RATE
    rise with the ordered dose?" (Cochran 1954; Armitage 1955): the
    binary-outcome sibling of jonckheere_trend, the standard
    dose-response / severity-gradient test.  With integer scores c,
    per-level trials n_c and successes r_c, N = Σn, R = Σr:

        T = N·Σ c·r − R·Σ c·n          (exact — the ×N-scaled score
                                        covariance)
        z = T / √( R·(N−R) · D / N ),  D = N·Σ c²·n − (Σ c·n)²

    Exactness: level sums are exact int64; T and D are evaluated in
    DECIMAL(38,0) (int128-exact, DuckDB HUGEINT identical — the ols2
    discipline) since N·Σc·r exceeds int64 at fleet scale; z is one
    pinned decimal→double sqrt-divide chain.  NULL when R = 0, R = N,
    or the dose is constant (D = 0).

    Scale shape: one map-side-combinable groupBy to (group, dose) —
    the only fact-sized shuffle — then a per-group reduce over the
    handful of dose levels.

    Returns one row per group: ``(group..., n_levels, n_total,
    r_total, z)``.
    """
    g = list(group_cols)
    c = F.col(dose_col).cast("long")
    y = F.col(success_col).cast("boolean").cast("long")
    clean = df.filter(c.isNotNull() & y.isNotNull())
    lvl = clean.groupBy(*g, c.alias("_c")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(y).cast("long").alias("_r"))
    per = lvl.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_levels"),
        F.sum("_n").cast("long").alias("n_total"),
        F.sum("_r").cast("long").alias("r_total"),
        F.sum(F.col("_c") * F.col("_r")).cast("long").alias("_cr"),
        F.sum(F.col("_c") * F.col("_n")).cast("long").alias("_cn"),
        F.sum(F.col("_c") * F.col("_c") * F.col("_n")).cast("long")
        .alias("_ccn"))
    dec = "decimal(38,0)"
    nn = F.col("n_total").cast(dec)
    rr = F.col("r_total").cast(dec)
    t = nn * F.col("_cr").cast(dec) - rr * F.col("_cn").cast(dec)
    d = nn * F.col("_ccn").cast(dec) \
        - F.col("_cn").cast(dec) * F.col("_cn").cast(dec)
    z = F.when(
        (F.col("r_total") > 0) & (F.col("r_total") < F.col("n_total"))
        & (d > 0),
        t.cast("double")
        / F.sqrt((rr * (nn - rr)).cast("double") * d.cast("double")
                 / nn.cast("double")))
    return per.select(*g, "n_levels", "n_total", "r_total",
                      z.alias("z"))


def weighted_kappa(df: DataFrame, true_col: str, pred_col: str, *,
                   quadratic: bool = True) -> DataFrame:
    """Weighted Cohen's κ for ORDINAL labels (Cohen 1968) — the
    quadratic form is the "QWK" metric ordinal-regression benchmarks
    report: disagreements are penalized by ``(i−j)²`` (or ``|i−j|``
    linear), so predicting 4 for a 5 costs far less than predicting 1.

    Exact rational form: with integer labels, observed confusion
    counts O_ij, and marginals R_i, C_j,

        κ_w = 1 − N·Σ w_ij·O_ij / Σ w_ij·R_i·C_j

    — both sums exact int64 (w_ij = (i−j)² or |i−j|), evaluated from
    ONE groupBy on the label pair plus a |labels|²-row marginal
    cross; one pinned division.  κ_w NULL when the chance-weighted
    denominator is zero (both raters constant).

    Labels must be integer-valued (quantize upstream); int64 bound:
    N·Σw·O ≤ N²·w_max — fine to N ≈ 3·10⁹/w_max.

    Returns ONE row ``(n_total, w_obs, w_exp_num, kappa_w)`` with
    ``w_exp_num = Σ w·R·C`` (the ×N-scaled chance term).
    """
    t = F.col(true_col).cast("long")
    p = F.col(pred_col).cast("long")
    clean = df.filter(t.isNotNull() & p.isNotNull())
    conf = clean.groupBy(t.alias("_a"), p.alias("_b")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))

    def w(i, j):
        d = i - j
        return d * d if quadratic else F.abs(d)

    obs = conf.agg(
        F.sum("_n").cast("long").alias("n_total"),
        F.sum(w(F.col("_a"), F.col("_b")) * F.col("_n"))
        .cast("long").alias("w_obs"))
    rows = conf.groupBy(F.col("_a").alias("_l")).agg(
        F.sum("_n").cast("long").alias("_r"))
    cols = conf.groupBy(F.col("_b").alias("_l2")).agg(
        F.sum("_n").cast("long").alias("_c"))
    exp_ = (rows.crossJoin(cols)
            .agg(F.sum(w(F.col("_l"), F.col("_l2"))
                       * F.col("_r") * F.col("_c"))
                 .cast("long").alias("w_exp_num")))
    j = obs.crossJoin(F.broadcast(exp_))
    kappa = F.when(
        F.col("w_exp_num") > 0,
        F.lit(1.0) - (F.col("n_total") * F.col("w_obs")).cast("double")
        / F.col("w_exp_num").cast("double"))
    return j.select("n_total", "w_obs", "w_exp_num",
                    kappa.alias("kappa_w"))


def mantel_haenszel(df: DataFrame, group_cols: Sequence[str],
                    stratum_col: str, exposed_col: str,
                    outcome_col: str) -> DataFrame:
    """Mantel-Haenszel stratified 2×2 analysis per group — the pooled
    exposure-outcome association ADJUSTED for a confounder (Mantel &
    Haenszel 1959): each stratum contributes its own 2×2 table
    (a=E∧O, b=E∧¬O, c=¬E∧O, d=¬E∧¬O, N per stratum), and

        OR_MH = Σᵢ aᵢdᵢ/Nᵢ / Σᵢ bᵢcᵢ/Nᵢ
        χ²_CMH = (|Σ(aᵢ − r1ᵢc1ᵢ/Nᵢ)| − ½)² /
                 Σ r1ᵢr2ᵢc1ᵢc2ᵢ/(Nᵢ²(Nᵢ−1))

    — the Simpson's-paradox-proof replacement for the crude
    ``odds_ratio`` on the collapsed table.

    Determinism: cell counts are exact longs from ONE groupBy on
    (group, stratum); each stratum term is a pinned double built from
    exact int64 products (r1·c1 and r2·c2 stay int64 to Nᵢ ≈ 3·10⁹),
    and the four Σs are PINNED stratum-ordered folds (the
    entropy_profile discipline).  OR NULL when Σbc/N = 0; χ² NULL
    when the variance sum is 0; single-subject strata (N=1)
    contribute nothing to χ² (the (N−1) guard) — standard.

    Returns one row per group: ``(group..., n_strata, n_total,
    or_mh, chisq_cmh)``.
    """
    g = list(group_cols)
    e = F.col(exposed_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    clean = df.filter(e.isNotNull() & o.isNotNull())
    cell = clean.groupBy(*g, F.col(stratum_col).alias("_s")).agg(
        F.sum(F.when(e & o, 1).otherwise(0)).cast("long").alias("_a"),
        F.sum(F.when(e & ~o, 1).otherwise(0)).cast("long").alias("_b"),
        F.sum(F.when(~e & o, 1).otherwise(0)).cast("long").alias("_c"),
        F.sum(F.when(~e & ~o, 1).otherwise(0)).cast("long")
        .alias("_d"))
    a, b, c, d = (F.col(x) for x in ("_a", "_b", "_c", "_d"))
    n = (a + b + c + d)
    r1, r2 = a + b, c + d
    c1, c2 = a + c, b + d
    nd = n.cast("double")
    t_ad = (a * d).cast("double") / nd
    t_bc = (b * c).cast("double") / nd
    t_ame = a.cast("double") - (r1 * c1).cast("double") / nd
    t_v = F.when(
        n > 1,
        (r1 * c1).cast("double") * (r2 * c2).cast("double")
        / (nd * nd * (n - 1).cast("double"))).otherwise(F.lit(0.0))
    terms = cell.select(
        *g, "_s", n.alias("_n"),
        t_ad.alias("_tad"), t_bc.alias("_tbc"),
        t_ame.alias("_tame"), t_v.alias("_tv"))

    def fold(col):
        arr = F.sort_array(F.collect_list(F.struct(
            F.col("_s"), F.col(col).alias("t"))))
        return F.aggregate(arr, F.lit(0.0),
                           lambda acc, s_: acc + s_["t"])

    agg = terms.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("_n").cast("long").alias("n_total"),
        fold("_tad").alias("_sad"), fold("_tbc").alias("_sbc"),
        fold("_tame").alias("_same"), fold("_tv").alias("_sv"))
    or_mh = F.when(F.col("_sbc") > 0.0,
                   F.col("_sad") / F.col("_sbc"))
    dev = F.abs(F.col("_same")) - 0.5
    chisq = F.when(F.col("_sv") > 0.0,
                   F.greatest(dev, F.lit(0.0)) * F.greatest(dev, F.lit(0.0))
                   / F.col("_sv"))
    return agg.select(*g, "n_strata", "n_total",
                      or_mh.alias("or_mh"), chisq.alias("chisq_cmh"))


def srm_check(df: DataFrame, group_cols: Sequence[str],
              arm_col: str, expected: "dict[str, tuple[int, int]]"
              ) -> DataFrame:
    """Sample-ratio-mismatch check per experiment — the first
    diagnostic every A/B platform runs (Fabijan et al. 2019): a
    chi-square goodness-of-fit of observed arm counts against the
    DESIGNED split (e.g. 50/50), because a mismatched ratio
    invalidates the experiment before any metric is read.

    ``expected`` maps arm → exact rational share (num, den).  With
    observed o_a and N rows, each term telescopes to exact integers:

        (o_a − N·num/den)²/(N·num/den)
            = (o_a·den − N·num)² / (N·num·den)

    — numerator an exact int64 (cast-then-squared in double beyond
    ±3·10⁹), one pinned division per arm, and the χ² total is a
    PINNED arm-ordered fold.  Arms observed but not in ``expected``
    raise in-plan (a typo'd arm name must never silently pass);
    expected arms with zero observations still contribute their full
    term via the left join.

    Returns one row per group: ``(group..., n, df_chi, chisq)`` with
    ``df_chi`` = #arms − 1.
    """
    g = list(group_cols)
    if not expected:
        raise ValueError("expected must be non-empty")
    arms = sorted(expected)
    exp_rows = [(a, int(expected[a][0]), int(expected[a][1]))
                for a in arms]
    obs = (df.filter(F.col(arm_col).isNotNull())
           .groupBy(*g, F.col(arm_col).alias("_arm"))
           .agg(F.count(F.lit(1)).cast("long").alias("_o")))
    known = F.col("_arm").isin(arms)
    obs = obs.withColumn(
        "_o",
        F.when(~known, F.raise_error(F.concat(
            F.lit("srm_check: unexpected arm: "),
            F.col("_arm"))).cast("long")).otherwise(F.col("_o")))
    tot = obs.groupBy(*g).agg(F.sum("_o").cast("long").alias("n"))
    spark = df.sparkSession
    exp_df = spark.createDataFrame(
        exp_rows, "_arm string, _num long, _den long")
    full = (tot.crossJoin(F.broadcast(exp_df))
            .join(obs, [*g, "_arm"], "left")
            .withColumn("_o", F.coalesce("_o", F.lit(0).cast("long"))))
    dev = (F.col("_o") * F.col("_den")
           - F.col("n") * F.col("_num")).cast("double")
    term = dev * dev / (F.col("n") * F.col("_num")
                        * F.col("_den")).cast("double")
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("_arm"), term.alias("t"))))
    agg = full.groupBy(*g).agg(
        F.max("n").alias("n"),
        (F.count(F.lit(1)) - 1).cast("long").alias("df_chi"),
        F.aggregate(arr, F.lit(0.0),
                    lambda a, s_: a + s_["t"]).alias("chisq"))
    return agg.select(*g, "n", "df_chi", "chisq")


_KRIPP_LCM = 27720          # lcm(1..12): common denominator for m-1
_KRIPP_MAX_M = 13           # so m-1 | _KRIPP_LCM always
_KRIPP_MAX_N = 1_000_000    # keeps (n-1)*do_scaled and LCM*n² in int64


def krippendorff_alpha(df: DataFrame, group_cols: Sequence[str],
                       unit_col: str, cat_col: str) -> DataFrame:
    """Krippendorff's α (nominal) — chance-corrected agreement that,
    unlike :func:`fleiss_kappa`, tolerates MISSING ratings: units may
    have any number of raters ≥ 2 (singletons drop out), the standard
    reliability statistic for content-analysis panels with absences
    (Krippendorff, Content Analysis, §12).

    Exact rational form: with m_u ratings on unit u (m_uc per
    category), n = Σ m_u over included units, n_c = Σ_u m_uc,

        D_o ∝ Σ_u (m_u² − Σ_c m_uc²) / (m_u − 1)
        D_e ∝ (n² − Σ_c n_c²) / (n − 1)
        α   = 1 − D_o/D_e
            = 1 − (n−1)·Σ_u d_u·(L/(m_u−1)) / (L·(n² − Σ n_c²))

    carrying the per-unit rational ladder on the COMMON integer
    denominator L = lcm(1..12) = 27720, so both numerator and
    denominator are exact int64 and α is ONE double division.  The
    price of exactness is an in-plan cap of ``m_u ≤ 13`` raters per
    unit (raise_error — dedup or sub-sample raters upstream) and
    ``n ≤ 10⁶`` ratings per group (α is a per-group statistic).

    Scale shape: one map-side-combinable groupBy to (group, unit,
    category) — the only ratings-sized shuffle — then a per-unit
    collapse, a per-category collapse over included units, and a tiny
    group-key join.  No windows, no collect.

    Returns one row per group: ``(*group_cols, n_units, n_ratings,
    n_cats, do_scaled, se_cat, alpha)`` — α NULL when every included
    rating lands in one category (D_e = 0); groups with no unit of
    ≥ 2 ratings vanish.  ``group_cols`` must be non-empty.
    """
    g = list(group_cols)
    cell = (df.groupBy(*g, F.col(unit_col).alias("_u"),
                       F.col(cat_col).alias("_c"))
            .agg(F.count(F.lit(1)).alias("_n")))
    unit = (cell.groupBy(*g, "_u")
            .agg(F.sum("_n").alias("_m"),
                 F.sum(F.col("_n") * F.col("_n")).alias("_sq")))
    m = F.when(
        F.col("_m") > _KRIPP_MAX_M,
        F.raise_error(F.concat(
            F.lit(f"krippendorff_alpha: > {_KRIPP_MAX_M} raters on a "
                  "unit: "), F.col("_m").cast("string"))).cast("long")
    ).otherwise(F.col("_m"))
    from ..geo.tilemath import floor_div

    unit = (unit.select(
        *g, "_u", m.alias("_m"), "_sq")
        .filter(F.col("_m") >= 2)
        # L/(m−1) is exact by construction (m−1 ≤ 12 divides the lcm)
        .withColumn("_w", (F.col("_m") * F.col("_m") - F.col("_sq"))
                    * floor_div(F.lit(_KRIPP_LCM).cast("long"),
                                F.col("_m") - 1)))
    gu = (unit.groupBy(*g)
          .agg(F.count(F.lit(1)).alias("n_units"),
               F.sum("_m").alias("_nr"),
               F.sum("_w").alias("do_scaled")))
    n = F.when(
        F.col("_nr") > _KRIPP_MAX_N,
        F.raise_error(F.concat(
            F.lit(f"krippendorff_alpha: > {_KRIPP_MAX_N} ratings in a "
                  "group: "), F.col("_nr").cast("string"))).cast("long")
    ).otherwise(F.col("_nr"))
    inc = cell.join(unit.select(*g, "_u"), [*g, "_u"])
    cat = (inc.groupBy(*g, "_c").agg(F.sum("_n").alias("_s")))
    gc = (cat.groupBy(*g)
          .agg(F.count(F.lit(1)).alias("n_cats"),
               F.sum(F.col("_s") * F.col("_s")).alias("se_cat")))
    j = gu.join(gc, g)
    nn = n * n - F.col("se_cat")
    alpha = F.when(
        nn > 0,
        F.lit(1.0) - ((n - 1) * F.col("do_scaled")).cast("double")
        / (F.lit(_KRIPP_LCM).cast("long") * nn).cast("double"))
    return j.select(*g, "n_units", n.alias("n_ratings"), "n_cats",
                    "do_scaled", "se_cat", alpha.alias("alpha"))


_HL_MAX_ROWS = 8000


def hodges_lehmann(df: DataFrame, group_cols: Sequence[str],
                   id_col: str, val_col: str,
                   max_rows: int = _HL_MAX_ROWS) -> DataFrame:
    """Hodges-Lehmann one-sample location estimator — the LOWER median
    of the n(n+1)/2 Walsh averages (xᵢ+xⱼ)/2, i ≤ j (Hodges &
    Lehmann 1963): the robust pseudo-median behind the Wilcoxon
    signed-rank confidence interval, ~0.955 efficient at the normal
    yet 29%-breakdown robust.

    Exactness: Walsh SUMS xᵢ+xⱼ stay int64; the estimator is exact
    rational SELECTION — the ⌈N/2⌉-th smallest sum by the total order
    (sum, ridᵢ, ridⱼ) — never averaging (the theil_sen_slope
    discipline), and ``hl`` is the single exact division num/2.
    Row ranks come from the unique (value, id) order, so the pair
    lattice is engine-reproducible under ties.

    Scale shape: the O(n²) Walsh lattice is per GROUP — one
    ``max_rows``-guarded (raise_error in-plan) self-join on the group
    key plus two windows; groups are independent, so fleet-scale means
    a finer group key or an upstream deterministic sub-sample, never a
    silent cap.

    Returns ``(*group_cols, n, n_pairs, hl_num, hl)``.
    """
    g = list(group_cols)
    v = df.select(*g, F.col(id_col).cast("long").alias("_id"),
                  F.col(val_col).cast("long").alias("_x"))
    wcnt = Window.partitionBy(*g)
    wrk = Window.partitionBy(*g).orderBy("_x", "_id")
    nn = F.count(F.lit(1)).over(wcnt)
    guard = F.when(
        nn > max_rows,
        F.raise_error(F.concat(
            F.lit(f"hodges_lehmann: group exceeds {max_rows} rows: "),
            nn.cast("string"))).cast("long")).otherwise(nn)
    r = v.select(*g, "_x", guard.alias("_n"),
                 F.row_number().over(wrk).cast("long").alias("_rid"))
    a = r.select(*g, "_n", F.col("_x").alias("_xa"),
                 F.col("_rid").alias("_ra"))
    b = r.select(*g, F.col("_x").alias("_xb"),
                 F.col("_rid").alias("_rb"))
    pairs = (a.join(b, g).filter(F.col("_ra") <= F.col("_rb"))
             .select(*g, "_n", (F.col("_xa") + F.col("_xb"))
                     .alias("_s"), "_ra", "_rb"))
    from ..geo.tilemath import floor_div

    wsel = Window.partitionBy(*g).orderBy("_s", "_ra", "_rb")
    npairs = floor_div(F.col("_n") * (F.col("_n") + 1), 2)
    sel = (pairs
           .withColumn("_rn", F.row_number().over(wsel).cast("long"))
           .withColumn("_np", npairs)
           .filter(F.col("_rn") == floor_div(F.col("_np") + 1, 2)))
    return sel.select(*g, F.col("_n").alias("n"),
                      F.col("_np").alias("n_pairs"),
                      F.col("_s").alias("hl_num"),
                      (F.col("_s") / 2).alias("hl"))


def bartlett_test(df: DataFrame, group_cols: Sequence[str],
                  cell_col: str, val_col: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across cells (Bartlett
    1937) — the ANOVA precondition check beside brown_forsythe's
    robust version: under normality,

        χ² = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] / C
        C  = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1))

    Determinism: every per-cell variance is the exact rational
    (nᵢ·Σx² − Sᵢ²)/(nᵢ(nᵢ−1)) with the quadratic moment in
    DECIMAL(38) (int64 dies near nᵢ·x² ≈ 10¹⁹ — the anova_f lesson),
    ONE double division each; the three cross-cell sums (ln terms,
    pooled SS, reciprocal ladder) are PINNED cell-ordered in-row
    folds, and χ² is a fixed IEEE chain on the results.  Cells with
    nᵢ < 2 drop (no within-variance); any constant cell (sᵢ² = 0)
    makes χ² NULL (ln 0 undefined) — both pinned.

    Scale: one map-side-combinable groupBy to cells, then a k-row
    fold per group — no second pass over the data.

    Returns one row per group: ``(*group_cols, k, n_total, sp2,
    c_factor, chi2)``.
    """
    g = list(group_cols)
    v = F.col(val_col).cast("long")
    cell = (df.groupBy(*g, F.col(cell_col).alias("_c"))
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sum(v).alias("_s"),
                 F.sum((v * v).cast("decimal(38,0)")).alias("_sq"))
            .filter(F.col("_n") >= 2))
    num = (F.col("_n").cast("decimal(38,0)") * F.col("_sq")
           - F.col("_s").cast("decimal(38,0)")
           * F.col("_s").cast("decimal(38,0)"))
    cell = cell.select(*g, "_c", "_n", num.alias("_num"))
    arr = F.sort_array(F.collect_list(F.struct(
        "_c",
        F.col("_n").alias("n"),
        F.col("_num").cast("double").alias("numd"))))
    per = (cell.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("k"),
                F.sum("_n").alias("n_total"),
                F.max((F.col("_num") == 0).cast("int")).alias("_has0"),
                arr.alias("_a")))
    lnsum = F.aggregate(
        F.col("_a"), F.lit(0.0),
        lambda a, s: a + (s["n"] - 1).cast("double")
        * F.log(s["numd"] / (s["n"] * (s["n"] - 1)).cast("double")))
    spnum = F.aggregate(
        F.col("_a"), F.lit(0.0),
        lambda a, s: a + s["numd"] / s["n"].cast("double"))
    rsum = F.aggregate(
        F.col("_a"), F.lit(0.0),
        lambda a, s: a + F.lit(1.0) / (s["n"] - 1).cast("double"))
    nk = (F.col("n_total") - F.col("k")).cast("double")
    sp2 = spnum / nk
    cfac = (F.lit(1.0) + (rsum - F.lit(1.0) / nk)
            / (F.lit(3.0) * (F.col("k") - 1).cast("double")))
    chi2 = F.when((F.col("k") >= 2) & (F.col("_has0") == 0),
                  (nk * F.log(sp2) - lnsum) / cfac)
    return per.select(*g, "k", "n_total", sp2.alias("sp2"),
                      cfac.alias("c_factor"), chi2.alias("chi2"))


_MAHA_CHI2_95 = 5.991464547107979   # chi²(2) 0.95 quantile literal


def mahalanobis2d(df: DataFrame, group_cols: Sequence[str],
                  id_col: str, x_col: str, y_col: str,
                  thr: float = _MAHA_CHI2_95) -> DataFrame:
    """Per-point squared Mahalanobis distance to the group's 2-D
    mean under the group covariance — the correlation-aware outlier
    score a per-axis z-test misses (a point can be 2σ on each axis
    yet wildly off the correlation ridge): with n-scaled deviations
    z = n·v − S and A = n·Σx²−Sx², B = n·Σxy−SxSy, C = n·Σy²−Sy²,

        d² = (C·zx² − 2B·zx·zy + A·zy²) / (AC − B²)

    — every term EXACT in DECIMAL(38) (zx² alone brushes int64;
    C·zx² needs ~10³⁶), d² one double division, and the flag is the
    single comparison d² > χ²₂(0.95) on that pinned double.  The
    multivariate sibling of robust_outliers/grubbs.

    Scale shape: one moments groupBy + one broadcast-able join of the
    5-number moment row back onto the points — the feature_scale
    shape; no windows, no second shuffle of the fact table.  The
    DECIMAL(38) headroom demands BOTH in-plan bounds: n ≤ 16000 per
    group and |coordinate| ≤ 10⁵ (C·zx² grows as n⁴·r⁴ ≈ 10³⁷ at
    those rails) — shard by a finer group key or pre-scale upstream.

    Returns ``(*group_cols, id, d2m, outlier)`` — NULL d²/flag for
    degenerate groups (AC = B², e.g. n < 3 or collinear data).
    """
    g = list(group_cols)
    lim = 100_000
    xr = F.col(x_col).cast("long")
    yr = F.col(y_col).cast("long")
    rail = (F.abs(xr) > lim) | (F.abs(yr) > lim)
    pts = df.select(
        *g, F.col(id_col).alias("id"),
        F.when(rail, F.raise_error(F.lit(
            f"mahalanobis2d: |coordinate| exceeds {lim}"))
            .cast("long")).otherwise(xr).alias("_x"),
        yr.alias("_y"))
    mom = (pts.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("_cnt"),
                F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
                F.sum((F.col("_x") * F.col("_x"))
                      .cast("decimal(38,0)")).alias("_sxx"),
                F.sum((F.col("_x") * F.col("_y"))
                      .cast("decimal(38,0)")).alias("_sxy"),
                F.sum((F.col("_y") * F.col("_y"))
                      .cast("decimal(38,0)")).alias("_syy")))
    n = F.when(
        F.col("_cnt") > 16_000,
        F.raise_error(F.concat(
            F.lit("mahalanobis2d: group exceeds 16000 rows: "),
            F.col("_cnt").cast("string"))).cast("long")
    ).otherwise(F.col("_cnt"))
    d38 = lambda c: c.cast("decimal(38,0)")
    a = d38(n) * F.col("_sxx") - d38(F.col("_sx")) * d38(F.col("_sx"))
    b = d38(n) * F.col("_sxy") - d38(F.col("_sx")) * d38(F.col("_sy"))
    c = d38(n) * F.col("_syy") - d38(F.col("_sy")) * d38(F.col("_sy"))
    mom = mom.select(*g, n.alias("_n"), "_sx", "_sy", a.alias("_a"),
                     b.alias("_b"), c.alias("_c"),
                     (a * c - b * b).alias("_det"))
    j = pts.join(mom, g)
    zx = d38(F.col("_n") * F.col("_x") - F.col("_sx"))
    zy = d38(F.col("_n") * F.col("_y") - F.col("_sy"))
    num = (F.col("_c") * (zx * zx)
           - F.lit(2).cast("decimal(38,0)") * F.col("_b") * (zx * zy)
           + F.col("_a") * (zy * zy))
    d2 = F.when(F.col("_det") > 0,
                num.cast("double") / F.col("_det").cast("double"))
    return j.select(*g, "id", d2.alias("d2m"),
                    (d2 > F.lit(thr)).alias("outlier"))


def process_capability(df: DataFrame, group_cols: Sequence[str],
                       val_col: str, *, lsl: int, usl: int) -> DataFrame:
    """Process capability indices Cp / Cpk against spec limits — the
    SPC acceptance summary beside the control charts: Cp compares the
    spec width to the 6σ process spread, Cpk additionally penalizes
    off-center processes (min distance from the mean to either limit
    over 3σ).  Cpk ≥ 1.33 is the conventional "capable" bar.

    μ and σ come from exact integer moments (Σx² in DECIMAL(38)), then
    Cp = (USL−LSL)/(6σ) and Cpk = min(USL−μ, μ−LSL)/(3σ) are fixed
    IEEE chains on those two doubles — NULL for constant groups
    (σ = 0).  ``lsl``/``usl`` are integer spec limits in the value's
    own units.

    One map-side-combinable groupBy; returns ``(*group_cols, n, mu,
    sigma, cp, cpk)``.
    """
    if usl <= lsl:
        raise ValueError("need usl > lsl")
    g = list(group_cols)
    v = F.col(val_col).cast("long")
    per = (df.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(v).alias("_s"),
                F.sum((v * v).cast("decimal(38,0)")).alias("_sq")))
    n = F.col("n")
    mu = F.col("_s").cast("double") / n.cast("double")
    var = ((n.cast("decimal(38,0)") * F.col("_sq")
            - F.col("_s").cast("decimal(38,0)")
            * F.col("_s").cast("decimal(38,0)")).cast("double")
           / (n * n).cast("double"))
    sig = F.sqrt(var)
    cp = F.when(sig > 0.0, F.lit(float(usl - lsl)) / (F.lit(6.0) * sig))
    cpk = F.when(sig > 0.0,
                 F.least(F.lit(float(usl)) - mu, mu - F.lit(float(lsl)))
                 / (F.lit(3.0) * sig))
    return per.select(*g, "n", mu.alias("mu"), sig.alias("sigma"),
                      cp.alias("cp"), cpk.alias("cpk"))


def spiegelhalter_z(df: DataFrame, group_cols: Sequence[str], *,
                    p_millis_col: str, label_col: str) -> DataFrame:
    """Spiegelhalter's calibration Z-test (Spiegelhalter 1986) — does
    a probability forecast's Brier score differ from what a PERFECTLY
    calibrated forecaster with the same probabilities would score?
    The single-number sharpness-adjusted companion to the ece/
    calibration_bins reliability diagrams:

        Z = Σ(y−p)(1−2p) / √(Σ(1−2p)²·p·(1−p))

    Probabilities arrive as INTEGER millis (p = m/1000, 0 < m <
    1000 enforced in-plan — endpoint probs carry zero calibration
    variance); both sums then scale to EXACT int64 —
    (1000y−m)(1000−2m) and (1000−2m)²·m·(1000−m) — with the 10⁶
    scale cancelling between numerator and √denominator, so Z is one
    pinned division-of-√-chain on two exact integers.

    One map-side-combinable groupBy.  Returns ``(*group_cols, n,
    z_num, z_den, z)`` — z NULL when the denominator is 0 (empty
    group can't happen; all-extreme m is excluded by the guard).
    """
    g = list(group_cols)
    m = F.col(p_millis_col).cast("long")
    y = F.col(label_col).cast("long")
    bad = (m <= 0) | (m >= 1000)
    mm = F.when(bad, F.raise_error(F.lit(
        "spiegelhalter_z: p millis outside (0, 1000)")).cast("long")) \
        .otherwise(m)
    num = (1000 * y - mm) * (1000 - 2 * mm)
    den = (1000 - 2 * mm) * (1000 - 2 * mm) * mm * (1000 - mm)
    per = (df.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(num).alias("z_num"),
                F.sum(den).alias("z_den")))
    z = F.when(F.col("z_den") > 0,
               F.col("z_num").cast("double")
               / F.sqrt(F.col("z_den").cast("double")))
    return per.select(*g, "n", "z_num", "z_den", z.alias("z"))


def quantile_normalize(df: DataFrame, group_cols: "list[str]",
                       value_col: str, id_col: str, *,
                       out: str = "v_norm") -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003 — the microarray /
    feature-prep transform): every group's distribution is mapped onto
    the POOLED distribution, so groups become exactly comparable in
    shape.  Each row's within-group rank r (ties broken by ``id_col``
    so the rank — and therefore the output — is engine-deterministic;
    n_g rows) maps to the pooled order statistic at position
    ⌈r·N/n_g⌉ — integer target positions against the pooled sort, no
    interpolation, so the result value-hashes exactly at any N (the
    position arithmetic is the exact DECIMAL(38) floor-div).  The
    pooled side needs no tiebreak: tied pooled values are
    interchangeable.

    Shape: one within-group rank window + one global rank window over
    the pooled values (the exact-order cost; at fleet scale the global
    rank becomes a range-partitioned sort — the same trade documented
    for str_pack/rank_percentiles) + one join of the (position →
    pooled value) table.

    Returns ``(*group_cols, id, v, out)``.
    """
    from pyspark.sql import Window as W

    v = F.col(value_col).cast("long")
    base = df.select(*group_cols, F.col(id_col).alias("id"),
                     v.alias("_v"))
    ng = (base.groupBy(*group_cols)
          .agg(F.count(F.lit(1)).alias("_ng")))
    tot = base.groupBy().agg(F.count(F.lit(1)).alias("_N"))
    ranked = (base.withColumn(
        "_r", F.row_number().over(
            W.partitionBy(*group_cols).orderBy("_v", "id")))
        .join(ng, [*group_cols]).crossJoin(F.broadcast(tot)))
    # target pooled position ceil(r*N/ng) in 1..N — exact decimal
    # floor-div (r*N can pass 2^53 at fleet N)
    from ..geo.tilemath import floor_div_big

    num = F.col("_r") * F.col("_N")
    pos = floor_div_big(num + F.col("_ng") - 1, F.col("_ng"))
    pooled = (base.select(F.col("_v").alias("_pv"))
              .withColumn("_p", F.row_number().over(
                  W.orderBy("_pv"))))
    return (ranked.withColumn("_pos", pos.cast("long"))
            .join(pooled, F.col("_pos") == F.col("_p"))
            .select(*group_cols, "id", F.col("_v").alias("v"),
                    F.col("_pv").alias(out)))
