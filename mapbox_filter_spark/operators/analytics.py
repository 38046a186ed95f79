"""Product-analytics operators: RFM scoring, event-transition matrices,
and exact per-group trend slopes.

These are the classic warehouse/growth-analytics shapes a user of the
reference's data would run downstream of the tile pipeline (reference
scope: style filtering + tiling, src/Mapbox/Filters.hs; these extend the
engine the way SURVEY.md §2's agg/window family does — pure DataFrame
compositions, no UDFs, no driver loops).

Exactness discipline (the repo-wide oracle rule): every score is an
integer or an integer-ratio double — money is cents, recency is whole
days, NTILE/LAG windows carry a total deterministic ORDER BY, and the
OLS slope is a single bigint/bigint division.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rfm_scores", "markov_transitions", "trend_slope",
           "ohlc_bars", "skyline_2d", "path_ngrams"]


def rfm_scores(orders: DataFrame, cust_col: str, date_col: str,
               amount_cents_col: str, n_tiles: int = 5) -> DataFrame:
    """Recency/Frequency/Monetary quintile scoring (Hughes 1994 — the
    standard CRM segmentation), exact end to end.

    Per customer: ``r_days`` = whole days from the customer's latest
    order to the dataset anchor (the GLOBAL max order date — derived
    from the data, so the operator is deterministic with no wall-clock
    dependence), ``f`` = order count, ``m_c`` = lifetime cents.  Scores
    are ``NTILE(n_tiles)`` with 5 = best, over a TOTAL order (metric,
    then customer id) so ties are deterministic cross-engine.

    Scale shape: one groupBy(customer) + three NTILE windows over the
    per-customer table (1 row/customer — the windows sort the SMALL
    aggregate, not the fact table) + a 1-row broadcast for the anchor.
    At 10⁹ customers the single-partition NTILE sort is the bottleneck;
    shard by coarse metric range first (same recipe as rank_percentiles)
    — documented, not needed at gate scale.
    """
    per = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(date_col).alias("_last"),
        F.count(F.lit(1)).alias("f"),
        F.sum(amount_cents_col).alias("m_c"))
    anchor = orders.agg(F.max(date_col).alias("_anchor"))
    per = (per.crossJoin(F.broadcast(anchor))
           .select("cust", "f", "m_c",
                   F.datediff(F.col("_anchor").cast("date"),
                              F.col("_last").cast("date"))
                   .alias("r_days")))
    # 5 = best: most recent (smallest r_days), most frequent, biggest
    # spender.  NTILE ranks 1..n ascending over the ORDER BY, so sort
    # worst-first; customer id breaks every tie deterministically.
    w_r = Window.orderBy(F.col("r_days").desc(), F.col("cust"))
    w_f = Window.orderBy(F.col("f").asc(), F.col("cust"))
    w_m = Window.orderBy(F.col("m_c").asc(), F.col("cust"))
    return per.select(
        "cust", "r_days", "f", "m_c",
        F.ntile(n_tiles).over(w_r).alias("r_score"),
        F.ntile(n_tiles).over(w_f).alias("f_score"),
        F.ntile(n_tiles).over(w_m).alias("m_score"))


def markov_transitions(events: DataFrame, key_col: str, ts_col: str,
                       state_col: str,
                       tiebreak_col: str) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences — the "what do users do next" primitive (and the
    generator for Markov-chain synthetic-sequence training data).

    Sequences are ordered by ``(ts, tiebreak)`` — a TOTAL order, so the
    LAG window is deterministic under equal timestamps.  Each key's
    first event has no predecessor and is dropped (standard convention).
    ``p`` is the row-conditional probability n / n_from — one
    bigint/bigint division, IEEE-identical cross-engine.

    Scale shape: one shuffle (window partitionBy key) + one
    map-side-combinable groupBy on (prev, cur) + a broadcast-able join
    of the tiny per-prev totals.  State-space size bounds the output
    (|S|² rows), not the input.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col))
    pairs = (events
             .select(F.col(key_col),
                     F.col(state_col).alias("cur"),
                     F.lag(state_col).over(w).alias("prev"))
             .filter(F.col("prev").isNotNull()))
    counts = pairs.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("prev").agg(F.sum("n").alias("n_from"))
    return (counts.join(F.broadcast(totals), "prev")
            .select("prev", "cur", "n", "n_from",
                    (F.col("n").cast("double")
                     / F.col("n_from").cast("double")).alias("p")))


def trend_slope(df: DataFrame, group_col: str, x_col: str,
                y_col: str) -> DataFrame:
    """Exact per-group OLS slope over integer (x, y) points — the
    time-series trend detector (is this event type growing?), kept in
    exact arithmetic the whole way.

    Emits the RATIONAL slope as bigint numerator/denominator
    (``s_num = n·Σxy − Σx·Σy``, ``s_den = n·Σx² − (Σx)²``) plus the
    one-division double, NULL when degenerate (n < 2 or zero x
    variance) — the integer-only guard from the variance gates.
    Int64 bound: |n·Σxy| ≤ n²·x_max·y_max; with day-indexed x (≤ 10⁴)
    and daily counts ≤ 10⁹ that is ~10⁸·10⁴·10⁹ — past int64 near
    10⁵ groups-days × 10⁹ counts, ANSI mode raises loudly rather than
    wrapping (the spearman_corr discipline).

    Scale shape: one map-side-combinable groupBy; no windows, no joins.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"), F.sum(x * y).alias("_sxy"))
    n = F.col("n_pts")
    s_num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    s_den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(s_den > 0,
                   s_num.cast("double") / s_den.cast("double"))
    return agg.select(group_col, "n_pts", s_num.alias("s_num"),
                      s_den.alias("s_den"), slope.alias("slope"))


def ohlc_bars(events: DataFrame, group_col: str, bucket_col: str,
              ts_col: str, tiebreak_col: str,
              cents_col: str) -> DataFrame:
    """OHLC/VWAP bar resampling — the market-data / telemetry
    "candlestick" aggregate: per (group, time bucket), the opening and
    closing values plus high/low/volume/VWAP, all exact cents.

    Open/close ride on ONE groupBy as ``min(struct(ts, tiebreak,
    cents))`` / ``max(...)`` — (ts, tiebreak) is a TOTAL order, so the
    lexicographic struct extreme IS the first/last event and the cents
    field comes along for free.  No window, no second shuffle: this is
    the map-side-combinable shape that survives 10⁹-row buckets (a
    windowed row_number would sort every bucket; the struct-extreme
    fold is O(1) state per bucket per partition).

    VWAP here is the equal-weight mean price sum_c/n (the events table
    carries no size column); with a quantity column, pass
    ``cents·qty`` as the cents and aggregate qty alongside.

    Returns ``(group, bucket, open_c, high_c, low_c, close_c, n,
    sum_c, vwap)``.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    first = F.min(F.struct(ts_us.alias("us"),
                           F.col(tiebreak_col).alias("tb"),
                           F.col(cents_col).alias("c")))
    last = F.max(F.struct(ts_us.alias("us"),
                          F.col(tiebreak_col).alias("tb"),
                          F.col(cents_col).alias("c")))
    return (events.groupBy(group_col, bucket_col).agg(
        first.alias("_f"), last.alias("_l"),
        F.max(cents_col).alias("high_c"),
        F.min(cents_col).alias("low_c"),
        F.count(F.lit(1)).alias("n"),
        F.sum(cents_col).alias("sum_c"))
        .select(group_col, bucket_col,
                F.col("_f.c").alias("open_c"), "high_c", "low_c",
                F.col("_l.c").alias("close_c"), "n", "sum_c",
                (F.col("sum_c").cast("double")
                 / F.col("n").cast("double")).alias("vwap")))


def skyline_2d(df: DataFrame, group_col: str, x_col: str,
               y_col: str) -> DataFrame:
    """Per-group 2-D skyline (Pareto frontier, minimize both axes —
    Börzsönyi et al. ICDE'01): rows not strictly dominated by any
    same-group row (dominated = other.x ≤ x AND other.y ≤ y with at
    least one strict).  Equal (x, y) duplicates dominate neither and
    both survive — the standard strict-dominance convention.

    One-pass exact algorithm instead of the quadratic self-join: sorted
    by x within the group, a row is on the frontier iff (a) no strictly
    cheaper row has y ≤ its y — a running ``min(y)`` over the RANGE
    frame ``UNBOUNDED PRECEDING .. 1 PRECEDING`` on x — and (b) it has
    the minimal y among its exact-x peers.  O(n log n) per group, ONE
    shuffle (the window's partitionBy); the quadratic NOT-EXISTS form
    exists only as the independent gate oracle.

    Returns the input columns for surviving rows.
    """
    w_prev = (Window.partitionBy(group_col).orderBy(F.col(x_col))
              .rangeBetween(Window.unboundedPreceding, -1))
    w_eq = Window.partitionBy(group_col, x_col)
    out = (df.withColumn("_min_prev", F.min(y_col).over(w_prev))
           .withColumn("_min_eq", F.min(y_col).over(w_eq))
           .filter((F.col("_min_prev").isNull()
                    | (F.col("_min_prev") > F.col(y_col)))
                   & (F.col(y_col) == F.col("_min_eq"))))
    return out.drop("_min_prev", "_min_eq")


def path_ngrams(events: DataFrame, key_col: str, ts_col: str,
                state_col: str, tiebreak_col: str,
                n: int = 3, min_support: int = 1) -> DataFrame:
    """Frequent event-path n-grams: per-key sequences ordered by the
    TOTAL (ts, tiebreak) order, sliding windows of ``n`` consecutive
    states, counted globally and by distinct keys — the sequential-
    pattern primitive behind funnel discovery and next-action models
    (the n>2 generalization of markov_transitions' pair counts).

    Scale shape: one shuffle (window partitionBy key) for the LAG
    chain, then one map-side-combinable groupBy; output is bounded by
    |S|ⁿ distinct paths, not by input rows.  ``min_support`` (distinct
    keys) prunes the tail at the aggregate, exact.

    Returns ``(step_1 .. step_n, n_occurrences, n_keys)``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col))
    cols = [F.lag(state_col, n - 1 - i).over(w).alias(f"step_{i + 1}")
            for i in range(n)]
    seq = events.select(F.col(key_col).alias("_k"), *cols) \
        .filter(F.col("step_1").isNotNull())
    return (seq.groupBy(*[f"step_{i + 1}" for i in range(n)])
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.count_distinct(F.col("_k")).alias("n_keys"))
            .filter(F.col("n_keys") >= min_support))


def pareto_topk(df: DataFrame, group_cols, key_col: str, k: int,
                other_label: str = "(other)") -> DataFrame:
    """Pareto report: per group the top-``k`` keys by count plus one
    ``(other)`` rollup row — the "80/20" reporting shape that keeps
    result size bounded at |groups|·(k+1) regardless of key
    cardinality.

    Determinism: rank order is (count DESC, key ASC) — a total order,
    so the cut is engine-stable; ``share`` is one division of exact
    longs.  Two map-side-combinable groupBys + one window over the
    (group, key) AGGREGATE (never the fact table).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    g = list(group_cols)
    cnt = (df.groupBy(*g, key_col)
           .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy(*g).orderBy(F.col("_c").desc(),
                                       F.col(key_col).asc())
    tot = Window.partitionBy(*g)
    # a real key whose string form equals the rollup label would fuse
    # with the (other) row and corrupt its counts — refuse in-plan,
    # on EVERY row (a beyond-k collision is just as ambiguous)
    key_str = F.when(
        F.col(key_col).cast("string") == other_label,
        F.raise_error(F.lit(
            f"pareto_topk: key collides with other_label "
            f"{other_label!r}; pass a different other_label"))
        .cast("string")).otherwise(F.col(key_col).cast("string"))
    cnt = cnt.withColumn("_ks", key_str)
    lab = F.when(F.row_number().over(w) <= k, F.col("_ks")) \
        .otherwise(F.lit(other_label))
    ranked = cnt.select(*g, lab.alias("label"), "_c",
                        F.sum("_c").over(tot).alias("total"))
    return (ranked.groupBy(*g, "label")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("_c").alias("cnt"),
                 F.max("total").alias("total"))
            .withColumn("share",
                        F.col("cnt").cast("double")
                        / F.col("total").cast("double")))


def cohort_retention(df: DataFrame, entity_col: str,
                     date_col: str) -> DataFrame:
    """Cohort retention matrix: entities are cohorted by their FIRST
    active calendar month, and each later month contributes one
    retained-count cell at its month offset — the classic growth
    triangle (rows = cohorts, columns = month offsets).

    Months are exact integers (``year·12 + month − 1``), so offsets are
    bigint subtraction, never date arithmetic with engine-specific
    rounding.  ``rate`` is the one pinned divide, n_active/cohort_size;
    the offset-0 cell always exists (the cohort month is itself
    active), so cohort_size is never NULL.

    Shape for scale: the fact table collapses to DISTINCT
    (entity, month) first — map-side combinable, the only fact-sized
    shuffle; the cohort min is a window on that distinct table keyed by
    entity (same key, AQE-coalesced), and the final matrix is a
    low-cardinality groupBy.  No fact-table window, no join.

    Returns ``(cohort_month, offset_months, n_active, cohort_size,
    rate)``.
    """
    mon = (F.year(F.col(date_col).cast("date")) * 12
           + F.month(F.col(date_col).cast("date")) - 1).cast("long")
    act = (df.select(F.col(entity_col).alias("_e"), mon.alias("_mon"))
           .filter(F.col("_mon").isNotNull())
           .distinct())
    we = Window.partitionBy("_e")
    mat = (act.withColumn("_cohort", F.min("_mon").over(we))
           .groupBy(F.col("_cohort").alias("cohort_month"),
                    (F.col("_mon") - F.col("_cohort"))
                    .alias("offset_months"))
           .agg(F.count(F.lit(1)).alias("n_active")))
    wc = Window.partitionBy("cohort_month")
    size = F.max(F.when(F.col("offset_months") == 0,
                        F.col("n_active"))).over(wc)
    return (mat.select("cohort_month", "offset_months", "n_active",
                       size.alias("cohort_size"))
            .withColumn("rate",
                        F.col("n_active").cast("double")
                        / F.col("cohort_size").cast("double")))


def cuped_adjust(df: DataFrame, group_cols, x_col: str,
                 y_col: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM'13):
    per group, the covariate-adjustment coefficient
    ``θ = cov(x,y)/var(x)`` and the adjusted metric variance
    ``var(y) − cov²/var(x)`` — the experimentation primitive that
    shrinks A/B confidence intervals using pre-period behavior, with
    the adjusted MEAN unchanged (own-sample centering).

    Exactness: x and y must be integer-valued (cents-quantize
    upstream); per-row products stay int64, moment sums and their
    combinations run in DECIMAL(38) (n·Σxy − Σx·Σy etc. — the
    loglog_fit/ols2 recipe, DuckDB mirrors with HUGEINT), and θ /
    var_y / var_adj / rho² are each ONE pinned double division.
    Variances are the population form (divide by n²) so every
    denominator is a product of exact integers.

    One groupBy over the unit table — the moments are map-side
    combinable, no second pass.  Returns
    ``(group..., n, theta, var_y, var_adj, rho2)``; θ NULL when x is
    degenerate (var_x = 0)."""
    g = list(group_cols)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    dec = "decimal(38,0)"
    agg = df.groupBy(*g).agg(
        F.count(F.lit(1)).cast(dec).alias("_n"),
        F.sum(x.cast(dec)).alias("_sx"),
        F.sum(y.cast(dec)).alias("_sy"),
        F.sum((x * x).cast(dec)).alias("_sxx"),
        F.sum((y * y).cast(dec)).alias("_syy"),
        F.sum((x * y).cast(dec)).alias("_sxy"))
    n = F.col("_n")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    d = lambda c: c.cast("double")
    n2 = d(n) * d(n)
    theta = F.when(vx > 0, d(cov) / d(vx))
    var_y = d(vy) / n2
    # var_adj = (vy − cov²/vx)/n²: keep cov²/vx in double (cov² can
    # exceed DECIMAL38), flat pinned order
    var_adj = F.when(vx > 0, (d(vy) - d(cov) * d(cov) / d(vx)) / n2) \
        .otherwise(d(vy) / n2)
    rho2 = F.when((vx > 0) & (vy > 0),
                  d(cov) * d(cov) / (d(vx) * d(vy)))
    return agg.select(
        *g, F.col("_n").cast("long").alias("n"),
        theta.alias("theta"), var_y.alias("var_y"),
        var_adj.alias("var_adj"), rho2.alias("rho2"))


def fd_profile(df: DataFrame, lhs_cols, rhs_col: str,
               fd_name: str | None = None) -> DataFrame:
    """Functional-dependency profiling for one candidate FD
    ``lhs_cols → rhs_col`` (the data-quality / schema-discovery
    primitive; g3 error per Kivinen & Mannila's classic measure —
    minimum rows to delete so the FD holds exactly).

    Exact integers from two keyed aggregates: groupBy(lhs, rhs) counts
    (map-side-combinable over the fact table — the ONLY fact-sized
    shuffle), then per-lhs rollup of subgroup count / row sum / max.
    A group violates iff it maps to > 1 distinct rhs; its g3
    contribution is rows − majority.

    Output: one row — ``(fd, lhs_groups, violating_groups, n_rows,
    g3_del)``; union several calls to profile a candidate set.
    """
    lhs = [lhs_cols] if isinstance(lhs_cols, str) else list(lhs_cols)
    name = fd_name or f"{','.join(lhs)}->{rhs_col}"
    sub = (df.groupBy(*lhs, rhs_col)
           .agg(F.count(F.lit(1)).alias("_c")))
    per_lhs = (sub.groupBy(*lhs)
               .agg(F.count(F.lit(1)).alias("_n_rhs"),
                    F.sum("_c").alias("_rows"),
                    F.max("_c").alias("_maj")))
    return per_lhs.agg(
        F.count(F.lit(1)).alias("lhs_groups"),
        F.sum(F.when(F.col("_n_rhs") > 1, 1).otherwise(0))
        .cast("long").alias("violating_groups"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.sum(F.col("_rows") - F.col("_maj")).cast("long")
        .alias("g3_del")
    ).select(F.lit(name).alias("fd"), "lhs_groups",
             "violating_groups", "n_rows", "g3_del")


_BURST_MAX_GAP_S = 10_000_000      # |gap| bound: n·Σg² must fit int64


def burstiness(events: DataFrame, key_col: str, ts_col: str,
               order_col: str, *, min_gaps: int = 2) -> DataFrame:
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of inter-event gaps,
    per entity — the temporal-clumping signal (B→1 bursty, 0 Poisson,
    −1 regular).

    Gaps are whole seconds (``unix_micros`` difference div 10⁶ —
    truncating div, identical cross-engine); moments n, S=Σg, Q=Σg²
    are exact int64.  Using σ² = (nQ−S²)/n², B rearranges so every
    pre-√ term is exact::

        D = n·Q − S²;   B = (√D − S) / (√D + S)

    (the n² under the radical cancels against μ's denominator) — one
    pinned 4-op double chain.  int64 bounds ALL enforced in-plan
    (raise_error, never a silent wrap): per-gap |g| ≤ 10⁷ s, and on
    the aggregates n·Q ≤ 2⁶³−1 and |S| ≤ 3·10⁹ (S² fits int64) —
    quantize gaps to coarser units upstream when an entity trips
    them.

    Output: ``(key, n_gaps, s_sum, d_term, b)``; entities with fewer
    than ``min_gaps`` gaps or S = 0 are dropped/NULL respectively.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (events.select(F.col(key_col).alias("key"),
                          F.col(ts_col), F.col(order_col),
                          (us - F.lag(us).over(w)).alias("_gus"))
            .filter(F.col("_gus").isNotNull())
            .select("key",
                    F.expr("_gus div 1000000").cast("long").alias("g")))
    guarded = gaps.withColumn(
        "g",
        F.when(F.abs(F.col("g")) > _BURST_MAX_GAP_S,
               F.raise_error(F.concat(
                   F.lit("burstiness: |gap| exceeds exact-int64 bound "
                         f"({_BURST_MAX_GAP_S} s): g="),
                   F.col("g").cast("string"))).cast("long"))
        .otherwise(F.col("g")))
    agg = (guarded.groupBy("key")
           .agg(F.count(F.lit(1)).alias("n_gaps"),
                F.sum("g").alias("s_sum"),
                F.sum(F.col("g") * F.col("g")).alias("q_sum"))
           .filter(F.col("n_gaps") >= int(min_gaps)))
    # the MOMENT PRODUCTS square past int64 inside the per-gap bound
    # (n·Q and S²) — enforce both in-plan, same discipline as anova_f
    int64_max = 2**63 - 1
    agg = agg.withColumn(
        "q_sum",
        F.when((F.col("q_sum") > F.expr(f"{int64_max} div n_gaps"))
               | (F.abs(F.col("s_sum")) > F.lit(3_000_000_000)),
               F.raise_error(F.concat(
                   F.lit("burstiness: moment products exceed the "
                         "exact-int64 bound (n·Q or S²); quantize "
                         "gaps to coarser units upstream: n="),
                   F.col("n_gaps").cast("string"),
                   F.lit(" q="), F.col("q_sum").cast("string"),
                   F.lit(" s="), F.col("s_sum").cast("string")))
               .cast("long"))
        .otherwise(F.col("q_sum")))
    d = (F.col("n_gaps") * F.col("q_sum")
         - F.col("s_sum") * F.col("s_sum"))
    out = agg.select("key", "n_gaps", "s_sum",
                     d.cast("long").alias("d_term"))
    b = F.when(
        (F.col("s_sum") > 0) & (F.col("d_term") >= 0),
        (F.sqrt(F.col("d_term").cast("double"))
         - F.col("s_sum").cast("double"))
        / (F.sqrt(F.col("d_term").cast("double"))
           + F.col("s_sum").cast("double")))
    return out.withColumn("b", b)


def fellegi_weights(pairs: DataFrame, match_col: str,
                    feature_cols) -> DataFrame:
    """Fellegi-Sunter record-linkage weight estimation (JASA 1969,
    public method): per comparison feature, the agreement probabilities
    among matches (m) and non-matches (u) and the log match weight,
    from a LABELED candidate-pair table (boolean ``match_col`` +
    boolean agreement columns).

    Exactness: one map-side-combinable aggregate produces every count;
    the weight uses add-one/add-two (Laplace) smoothing so it is
    defined even at zero counts and is ONE division of exact int64
    products + one ln (the PMI/BM25 pinned-chain discipline)::

        w_k = ln( (a_m+1)·(n_u+2) / ((n_m+2)·(a_u+1)) )

    int64 bound: (a_m+1)·(n_u+2) needs pair counts ≤ ~3·10⁹ — sample
    candidate pairs upstream past that (weights are ratios; a uniform
    pair sample estimates them consistently).

    Output: one row per feature — ``(feature, n_match, agree_match,
    n_nonmatch, agree_nonmatch, weight)``.
    """
    feats = list(feature_cols)
    m = F.col(match_col).cast("int")
    aggs = [F.sum(m).cast("long").alias("n_m"),
            F.sum(1 - m).cast("long").alias("n_u")]
    for k in feats:
        fk = F.col(k).cast("int")
        aggs.append(F.sum(m * fk).cast("long").alias(f"am_{k}"))
        aggs.append(F.sum((1 - m) * fk).cast("long").alias(f"au_{k}"))
    tot = pairs.agg(*aggs)
    stack = ", ".join(
        f"'{k}', am_{k}, au_{k}" for k in feats)
    rows = tot.select(
        "n_m", "n_u",
        F.expr(f"stack({len(feats)}, {stack})")
        .alias("feature", "agree_match", "agree_nonmatch"))
    w = F.log(
        ((F.col("agree_match") + 1) * (F.col("n_u") + 2)).cast("double")
        / ((F.col("n_m") + 2) * (F.col("agree_nonmatch") + 1))
        .cast("double"))
    return rows.select(
        "feature", F.col("n_m").alias("n_match"), "agree_match",
        F.col("n_u").alias("n_nonmatch"), "agree_nonmatch",
        w.alias("weight"))


def two_proportion_z(df: DataFrame, bucket_col: str,
                     trials_col: str, successes_col: str) -> DataFrame:
    """Two-proportion z-test between CONSECUTIVE buckets (the
    week-over-week conversion-shift detector).  From exact integer
    (trials, successes) per ordered bucket, the pooled-variance z
    rearranges so every pre-√ term is exact int64::

        z = (a1·n2 − a2·n1) · √(n1+n2)
            / √(n1·n2·(a1+a2)·(n1+n2−a1−a2))

    — one pinned 4-op double chain (the runs_test discipline); NULL
    when either side is empty or the pooled rate is degenerate (all
    successes / none).  int64 bound: n1·n2·a·(N−a) needs per-bucket
    trials ≲ 50k at equal split; aggregate to coarser buckets past
    that (documented, like the other exact tests).

    Output: ``(bucket, n_prev, a_prev, n_cur, a_cur, z)`` for every
    bucket with a predecessor.
    """
    from pyspark.sql import Window as W

    cur = df.select(
        F.col(bucket_col).alias("bucket"),
        F.col(trials_col).cast("long").alias("n_cur"),
        F.col(successes_col).cast("long").alias("a_cur"))
    wb = W.orderBy("bucket")
    lagged = cur.select(
        "bucket", "n_cur", "a_cur",
        F.lag("n_cur").over(wb).alias("n_prev"),
        F.lag("a_cur").over(wb).alias("a_prev")
    ).filter(F.col("n_prev").isNotNull())
    num = (F.col("a_prev") * F.col("n_cur")
           - F.col("a_cur") * F.col("n_prev"))
    n_tot = F.col("n_prev") + F.col("n_cur")
    a_tot = F.col("a_prev") + F.col("a_cur")
    rad = (F.col("n_prev") * F.col("n_cur") * a_tot
           * (n_tot - a_tot))
    z = F.when(rad > 0,
               num.cast("double") * F.sqrt(n_tot.cast("double"))
               / F.sqrt(rad.cast("double")))
    return lagged.select("bucket", "n_prev", "a_prev", "n_cur",
                         "a_cur", z.alias("z"))


def discrete_mi(df: DataFrame, x_col: str, y_col: str,
                x_values, y_values, *,
                feature_name: str | None = None) -> DataFrame:
    """Discrete mutual information I(X;Y) in nats over ENUMERATED
    category lists — the feature-vs-label ranking primitive for
    feature selection.

    The category lists must be passed explicitly (pinned): the cell
    grid is then FIXED, so all |X|·|Y| cell counts ride one
    map-side-combinable aggregate into a single row, and the MI sum
    folds the cells in the pinned (x, y) enumeration order as one flat
    double expression — the G²/BM25 bit-stability discipline (a SUM
    over a cells table would re-associate differently per engine).
    Each term is ``(c/N)·ln(c·N/(r·col))`` with c, N, r, col exact
    int64; zero cells contribute 0.  Rows outside the enumerated
    categories are EXCLUDED (count them upstream if that matters).

    Output: one row — ``(feature, n, mi_nats)``.
    """
    xs, ys = list(x_values), list(y_values)
    name = feature_name or x_col
    x, y = F.col(x_col), F.col(y_col)
    filt = df.filter(x.isin(*xs) & y.isin(*ys))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, xv in enumerate(xs):
        aggs.append(F.sum((x == xv).cast("int")).cast("long")
                    .alias(f"r_{i}"))
    for j, yv in enumerate(ys):
        aggs.append(F.sum((y == yv).cast("int")).cast("long")
                    .alias(f"c_{j}"))
    for i, xv in enumerate(xs):
        for j, yv in enumerate(ys):
            aggs.append(F.sum(((x == xv) & (y == yv)).cast("int"))
                        .cast("long").alias(f"k_{i}_{j}"))
    tot = filt.agg(*aggs)
    n = F.col("n")
    mi = None
    for i in range(len(xs)):
        for j in range(len(ys)):
            k = F.col(f"k_{i}_{j}")
            term = F.when(
                k > 0,
                (k.cast("double") / n.cast("double"))
                * F.log((k * n).cast("double")
                        / (F.col(f"r_{i}") * F.col(f"c_{j}"))
                        .cast("double"))).otherwise(F.lit(0.0))
            mi = term if mi is None else (mi + term)
    return tot.select(F.lit(name).alias("feature"), "n",
                      mi.alias("mi_nats"))


def cohort_ltv(orders: DataFrame, cust_col: str, date_col: str,
               cents_col: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month, revenue accumulated by month age — the standard LTV
    triangle, exact cents end-to-end.

    Months are exact integers ``(year−1970)·12 + (month−1)`` (no
    day-count drift); the cumulative sum is a per-cohort ordered
    window over the (cohort × age) AGGREGATE (≤ months² rows — the
    fact table shuffles twice: first-order groupBy and the
    cohort-month groupBy, both map-side-combinable).

    Output: ``(cohort_month, month_age, n_customers, revenue_u,
    cum_revenue_u)`` — n_customers is the cohort's size (constant per
    cohort row, for per-capita LTV downstream).
    """
    from pyspark.sql import Window as W

    mo = (F.year(F.col(date_col)) - 1970) * 12 \
        + (F.month(F.col(date_col)) - 1)
    o = orders.select(F.col(cust_col).alias("cust"),
                      mo.cast("long").alias("mo"),
                      F.col(cents_col).cast("long").alias("c"))
    first = o.groupBy("cust").agg(F.min("mo").alias("cohort"))
    sized = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers"))
    j = o.join(first, "cust").groupBy(
        "cohort", (F.col("mo") - F.col("cohort")).alias("month_age")
    ).agg(F.sum("c").alias("revenue_u"))
    w = W.partitionBy("cohort").orderBy("month_age") \
        .rowsBetween(W.unboundedPreceding, 0)
    return (j.join(F.broadcast(sized), "cohort")
            .select(F.col("cohort").alias("cohort_month"), "month_age",
                    "n_customers", "revenue_u",
                    F.sum("revenue_u").over(w).cast("long")
                    .alias("cum_revenue_u")))


_STATIONARY_SCALE = 10**12


def markov_stationary(transitions: DataFrame, *, iters: int = 10,
                      scale: int = _STATIONARY_SCALE) -> DataFrame:
    """Stationary distribution of a Markov chain by EXACT fixed-point
    power iteration over a ``(prev, cur, n, n_from)`` transition-count
    table (markov_transitions output): π is carried as scaled int64
    (Σπ = scale exactly at start) and each step is

        π'(j) = Σ_i (π(i)·n_ij) div n_i   (floor-div per edge)

    — the pagerank_exact determinism contract: no floats, so the
    result value-hashes cross-engine and is identical on any cluster
    shape.  SINK states (appearing only as ``cur`` — e.g. a terminal
    event type) RETAIN their mass each iteration (absorbing
    semantics; silently dropping it would shrink total mass
    geometrically).  Floor quantization loses < |edges| units of mass
    per iteration (bounded, deterministic, same both engines); states
    whose mass reaches 0 drop from the output.

    Scale shape: the state space bounds everything — π is |S| rows,
    each iteration one broadcast join + one groupBy.  ``iters`` fixed
    (mirror-unrollable); no convergence collect.

    Output: ``(state, pi_q)`` — scaled stationary mass.
    """
    states = (transitions.select(F.col("prev").alias("state"))
              .unionByName(transitions.select(F.col("cur")
                                              .alias("state")))
              .distinct().localCheckpoint())
    n_states = states.count()
    base = int(scale) // n_states
    rem = int(scale) - base * n_states
    from pyspark.sql import Window as W
    w = W.orderBy("state")
    pi = states.select(
        "state",
        (F.lit(base)
         + F.when(F.row_number().over(w) <= rem, 1).otherwise(0))
        .cast("long").alias("pi_q"))
    edges = transitions.select(F.col("prev").alias("state"),
                               F.col("cur").alias("dst"),
                               F.col("n").cast("long").alias("n_ij"),
                               F.col("n_from").cast("long")
                               .alias("n_i")).localCheckpoint()
    outs = edges.select("state").distinct().localCheckpoint()
    for _ in range(int(iters)):
        inflow = (edges.join(F.broadcast(pi), "state")
                  .select(F.col("dst").alias("state"),
                          F.expr("(pi_q * n_ij) div n_i").cast("long")
                          .alias("m")))
        retained = (pi.join(outs, "state", "left_anti")
                    .select("state", F.col("pi_q").alias("m")))
        pi = (inflow.unionByName(retained)
              .groupBy("state").agg(F.sum("m").alias("pi_q"))
              .localCheckpoint())
    return pi.select("state", F.col("pi_q").cast("long").alias("pi_q"))


def psi_drift(df: DataFrame, period_col: str, bucket_col: str,
              bucket_values, period_a, period_b) -> DataFrame:
    """Population Stability Index between two periods over ENUMERATED
    value buckets — the standard model-input drift monitor
    (PSI = Σ (p_b − q_b)·ln(p_b/q_b)).

    The bucket list is pinned (the discrete_mi discipline): all cell
    counts ride one map-side-combinable aggregate into a single row
    and the PSI folds cells in enumeration order as one flat double
    expression — bit-stable cross-engine.  Add-one smoothing keeps
    empty cells defined: p_b = (c_b+1)/(n+|B|).  Each term is pinned:
    ((ca+1)·db − (cb+1)·da as exact int64 ratio parts) → two
    divisions + one ln per cell, fixed parenthesization.

    Output: one row — ``(n_a, n_b, psi)`` (> 0.2 conventionally =
    major drift).
    """
    buckets = list(bucket_values)
    p = F.col(period_col)
    b = F.col(bucket_col)
    filt = df.filter(p.isin(period_a, period_b) & b.isin(*buckets))
    is_a = (p == period_a).cast("int")
    is_b = (p == period_b).cast("int")
    aggs = [F.sum(is_a).cast("long").alias("n_a"),
            F.sum(is_b).cast("long").alias("n_b")]
    for i, bv in enumerate(buckets):
        hit = (b == bv).cast("int")
        aggs.append(F.sum(is_a * hit).cast("long").alias(f"a_{i}"))
        aggs.append(F.sum(is_b * hit).cast("long").alias(f"b_{i}"))
    tot = filt.agg(*aggs)
    k = len(buckets)
    da = (F.col("n_a") + k).cast("double")
    db_ = (F.col("n_b") + k).cast("double")
    psi = None
    for i in range(k):
        pa = (F.col(f"a_{i}") + 1).cast("double") / da
        pb = (F.col(f"b_{i}") + 1).cast("double") / db_
        term = (pa - pb) * F.log(pa / pb)
        psi = term if psi is None else (psi + term)
    return tot.select("n_a", "n_b", psi.alias("psi"))


def table_checksum(df: DataFrame, key_cols, *, n_buckets: int = 64,
                   salt: str = "ck") -> DataFrame:
    """Order-insensitive integrity checksum of a table — the
    migration/replication verifier: two copies of a table are
    row-identical (over ``key_cols``) iff their checksum tables match,
    with NO sort and NO co-location (the comparison is |buckets| rows).

    Row hash = 60-bit md5 integer of the '\\x1f'-joined key columns
    (deterministic cross-engine); bucket = hash % n_buckets; per
    bucket: row count and bit_xor of hashes (order-insensitive,
    overflow-free — the connected_components fingerprint trick).  A
    single-row root (xor of bucket xors + total count) rides along as
    bucket −1.

    Output: ``(bucket, n_rows, xor_hash)`` — n_buckets (+1 root) rows.
    """
    def enc(c):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s))

    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "|"),
                       *[enc(c) for c in key_cols])), 1, 15),
        16, 10).cast("long")
    hashed = df.select(h.alias("h"),
                       F.pmod(h, F.lit(int(n_buckets))).cast("long")
                       .alias("bucket"))
    per = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(h)").cast("long").alias("xor_hash"))
    root = per.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.expr("bit_xor(xor_hash)").cast("long").alias("xor_hash")
    ).select(F.lit(-1).cast("long").alias("bucket"), "n_rows",
             "xor_hash")
    return per.unionByName(root)


def diff_in_diff(df: DataFrame, group_col: str, period_col: str,
                 outcome_col: str, *, treat, pre, post) -> DataFrame:
    """Difference-in-differences estimate from the four exact cell
    moments (treated/control × pre/post): DiD = (ȳ_t,post − ȳ_t,pre)
    − (ȳ_c,post − ȳ_c,pre).  The quasi-experimental workhorse.

    One map-side-combinable aggregate produces all eight exact int64
    cell sums/counts; the estimate is a flat pinned double expression
    over them (four divisions + three subtractions, fixed
    parenthesization — the welch_t discipline).  Outcomes must be
    integer-quantized upstream.

    Output: one row — ``(n_tpre, s_tpre, n_tpost, s_tpost, n_cpre,
    s_cpre, n_cpost, s_cpost, did)``; NULL when any cell is empty.
    """
    g = F.col(group_col)
    p = F.col(period_col)
    y = F.col(outcome_col).cast("long")
    filt = df.filter(p.isin(pre, post))
    aggs = []
    for gname, gcond in (("t", g == treat), ("c", g != treat)):
        for pname, pcond in (("pre", p == pre), ("post", p == post)):
            key = f"{gname}{pname}"
            hit = (gcond & pcond).cast("int")
            aggs.append(F.sum(hit).cast("long").alias(f"n_{key}"))
            aggs.append(F.sum(hit * y).cast("long").alias(f"s_{key}"))
    tot = filt.agg(*aggs)
    dd = lambda c: F.col(c).cast("double")
    mean = lambda k: dd(f"s_{k}") / dd(f"n_{k}")
    did = F.when(
        (F.col("n_tpre") > 0) & (F.col("n_tpost") > 0)
        & (F.col("n_cpre") > 0) & (F.col("n_cpost") > 0),
        (mean("tpost") - mean("tpre"))
        - (mean("cpost") - mean("cpre")))
    return tot.withColumn("did", did)


def join_size_stats(left: DataFrame, right: DataFrame,
                    left_key: str, right_key: str) -> DataFrame:
    """Exact join-cardinality profile WITHOUT executing the join:
    |A ⋈ B| = Σ_k d_A(k)·d_B(k) over the key-degree tables — the
    planning primitive behind shuffle sizing and skew detection (the
    max d_A·d_B term is the hottest key's output).

    Two map-side-combinable degree aggregates + one equi-join of the
    (small) degree tables.  All exact int64.

    Output: one row — ``(keys_a, rows_a, keys_b, rows_b,
    matching_keys, join_rows, max_key_rows)``.
    """
    da = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("d_a"))
    db_ = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("d_b"))
    j = da.join(db_, "k")
    tot_a = da.agg(F.count(F.lit(1)).alias("keys_a"),
                   F.sum("d_a").alias("rows_a"))
    tot_b = db_.agg(F.count(F.lit(1)).alias("keys_b"),
                    F.sum("d_b").alias("rows_b"))
    jt = j.agg(F.count(F.lit(1)).alias("matching_keys"),
               F.sum(F.col("d_a") * F.col("d_b")).alias("join_rows"),
               F.max(F.col("d_a") * F.col("d_b"))
               .alias("max_key_rows"))
    return (tot_a.crossJoin(F.broadcast(tot_b))
            .crossJoin(F.broadcast(jt))
            .select("keys_a", "rows_a", "keys_b", "rows_b",
                    "matching_keys",
                    F.coalesce(F.col("join_rows"), F.lit(0))
                    .cast("long").alias("join_rows"),
                    F.coalesce(F.col("max_key_rows"), F.lit(0))
                    .cast("long").alias("max_key_rows")))


def inclusion_profile(child: DataFrame, child_col: str,
                      parent: DataFrame, parent_col: str,
                      ind_name: str | None = None) -> DataFrame:
    """Inclusion-dependency profiling for one candidate foreign key
    ``child.child_col ⊆ parent.parent_col`` — the schema-discovery
    twin of fd_profile: a containment of 1.0 marks a real FK, a high
    partial containment a dirty one worth quarantining.

    Exact integers from set arithmetic over DISTINCT values only (the
    fact tables never join each other): distinct child values LEFT
    JOIN distinct parent values, one aggregate.  NULLs are excluded on
    both sides (SQL FK semantics: NULL references nothing).

    Scale shape: two distinct-aggregates (map-side-combinable) + one
    equi-join on the value — the join carries |distinct| rows, not
    fact rows; a dimension-sized parent side broadcasts under AQE.

    Output: one row ``(ind, n_child, n_matched, n_orphans,
    containment)`` — containment the pinned double n_matched/n_child
    (NULL when the child side is empty); union several calls to
    profile a candidate set.
    """
    name = ind_name or f"{child_col}->{parent_col}"
    c = (child.select(F.col(child_col).alias("_v"))
         .filter(F.col("_v").isNotNull()).distinct())
    p = (parent.select(F.col(parent_col).alias("_v"),
                       F.lit(1).alias("_hit"))
         .filter(F.col("_v").isNotNull()).distinct())
    j = c.join(p, "_v", "left")
    return j.agg(
        F.lit(name).alias("ind"),
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
        .alias("n_matched"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("long").alias("n_orphans"),
    ).withColumn(
        "containment",
        F.when(F.col("n_child") > 0,
               F.col("n_matched").cast("double")
               / F.col("n_child").cast("double")))


def key_profile(df: DataFrame, cols, key_name: str | None = None
                ) -> DataFrame:
    """Candidate-key profiling for one column combination — is
    ``cols`` unique, and if not, how badly?  The uniqueness member of
    the data-quality family (fd_profile / inclusion_profile /
    null_profile).

    Exact integers from one groupBy over the candidate columns:
    group count, duplicated-row excess (Σc − groups), the worst
    group's multiplicity, and the exact uniqueness verdict
    ``is_key = (dup_rows = 0)``.  Rows with a NULL in any key column
    are excluded first (a candidate key must be NULL-free) and
    reported as ``null_rows``.

    Scale shape: one map-side-combinable groupBy (the only fact-sized
    shuffle) + one tiny rollup.

    Output: one row ``(key, n_rows, null_rows, n_groups, dup_rows,
    max_group, is_key)``; union several calls to profile a set.
    """
    kcols = [cols] if isinstance(cols, str) else list(cols)
    name = key_name or ",".join(kcols)
    nn = df.filter(F.expr(" AND ".join(
        f"`{c}` IS NOT NULL" for c in kcols)))
    base = df.select(*kcols)
    total = base.agg(F.count(F.lit(1)).alias("_all"))
    g = (nn.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_c")))
    prof = g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("_c").cast("long").alias("_nn_rows"),
        F.max("_c").cast("long").alias("max_group"))
    out = prof.crossJoin(F.broadcast(total))
    return out.select(
        F.lit(name).alias("key"),
        F.col("_all").alias("n_rows"),
        (F.col("_all") - F.col("_nn_rows")).alias("null_rows"),
        "n_groups",
        (F.col("_nn_rows") - F.col("n_groups")).alias("dup_rows"),
        "max_group",
        (F.col("_nn_rows") == F.col("n_groups")).alias("is_key"))


def markov_entropy_rate(transitions: DataFrame, stationary: DataFrame,
                        *, scale: int) -> DataFrame:
    """Entropy rate of a Markov chain — nats of fresh surprise per
    step at stationarity: ``H = −Σᵢ πᵢ Σⱼ p_ij·ln p_ij`` (Shannon
    1948 §7; Cover & Thomas ch. 4).  The sequence-predictability
    number for event streams: H → 0 means the next state is nearly
    determined (template sessions), H → ln|S| means uniform chaos —
    the chain-level companion of the per-distribution
    entropy_profile.

    Inputs are the engine's own exact substrates:
    ``markov_transitions`` counts (prev, cur, n, n_from) and
    ``markov_stationary``'s scaled-int64 π (``pi_q``, quantized mass
    — its Σ is reported so the quantization loss is visible).  Each
    edge term ``(pi_q/scale)·(n/n_from)·ln(n/n_from)`` is built from
    exact integer ratios (both engines take ln of the SAME double)
    and the edge terms are summed in a PINNED (prev, cur)-ordered
    fold.  States whose quantized mass hit zero contribute exactly
    nothing (inner join).

    Shape: the state space bounds everything — one broadcast-scale
    join of |S|² edges against |S| masses, one in-row fold.

    Returns ONE row ``(n_states, n_edges, pi_total_q, h_rate)``.
    """
    states = (transitions.select(F.col("prev").alias("s"))
              .unionByName(transitions.select(F.col("cur").alias("s")))
              .distinct())
    ns = states.agg(F.count(F.lit(1)).alias("n_states"))
    pit = stationary.agg(F.sum("pi_q").cast("long").alias("pi_total_q"))
    j = transitions.join(
        F.broadcast(stationary.withColumnRenamed("state", "prev")),
        "prev")
    p = F.col("n").cast("double") / F.col("n_from").cast("double")
    t = ((F.col("pi_q").cast("double") / F.lit(float(scale)))
         * p * F.log(p))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("prev"), F.col("cur"), t.alias("t"))))
    agg = j.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.aggregate(arr, F.lit(0.0),
                    lambda a, s_: a + s_["t"]).alias("_sum"))
    return (ns.crossJoin(pit).crossJoin(agg)
            .select("n_states", "n_edges", "pi_total_q",
                    (-F.col("_sum")).alias("h_rate")))


def sprt_monitor(df: DataFrame, group_cols: "list[str]", *,
                 order_cols: "tuple[str, ...]", outcome_col: str,
                 p0: float, p1: float, alpha: float = 0.05,
                 beta: float = 0.2) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over a Bernoulli
    stream — the always-valid A/B monitor that may stop EARLY: after
    each observation the log-likelihood ratio

        LLR_t = k_t·ln(p₁/p₀) + (t−k_t)·ln((1−p₁)/(1−p₀))

    is checked against the Wald boundaries A = ln((1−β)/α) (accept
    H₁) and B = ln(β/(1−α)) (accept H₀); the sequential sibling of
    the fixed-horizon conversion_z / srm_check.

    Determinism: the two ln coefficients and both boundaries are
    PYTHON double literals baked into the plan (the rbo discipline);
    LLR_t is each literal times an exact integer running count, one
    add — identical IEEE ops per row in any engine.  The decision is
    the FIRST boundary crossing in (order_cols) order, pinned by a
    min-struct over crossing rows.

    One key exchange (ordering window + final fold).  Returns one row
    per group: ``(*group_cols, n_obs, n_pos, decision, t_cross,
    llr_cross)`` — decision 'h1'/'h0' at the first crossing, or
    'continue' (t_cross/llr_cross NULL) if the stream ends inside the
    boundaries.
    """
    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0 and p0 != p1):
        raise ValueError("need distinct p0, p1 in (0, 1)")
    c1 = math.log(p1 / p0)
    c2 = math.log((1.0 - p1) / (1.0 - p0))
    bound_a = math.log((1.0 - beta) / alpha)
    bound_b = math.log(beta / (1.0 - alpha))

    order = [F.col(c).asc() for c in order_cols]
    w = (Window.partitionBy(*group_cols).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    y = F.col(outcome_col).cast("long")
    base = df.select(
        *group_cols, y.alias("_y"),
        F.count(F.lit(1)).over(w).alias("_t"),
        F.sum(y).over(w).alias("_k"))
    llr = (F.lit(c1) * F.col("_k").cast("double")
           + F.lit(c2) * (F.col("_t") - F.col("_k")).cast("double"))
    crossed = base.select(
        *group_cols, "_t", "_k", llr.alias("_llr"),
        F.when(llr >= F.lit(bound_a), F.lit("h1"))
        .when(llr <= F.lit(bound_b), F.lit("h0")).alias("_d"))
    per = (crossed.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n_obs"),
                F.max("_k").alias("n_pos"),
                F.min(F.when(F.col("_d").isNotNull(), F.struct(
                    F.col("_t"), F.col("_d"), F.col("_llr"))))
                .alias("_c")))
    return per.select(
        *group_cols, "n_obs", "n_pos",
        F.coalesce(F.col("_c._d"), F.lit("continue")).alias("decision"),
        F.col("_c._t").alias("t_cross"),
        F.col("_c._llr").alias("llr_cross"))


def ucb_replay(df: DataFrame, group_cols: "list[str]", *,
               order_cols: "tuple[str, ...]", arm_col: str,
               reward_col: str, n_arms: int = 3,
               max_len: int = 20_000) -> DataFrame:
    """UCB1 off-policy replay (Li et al. WSDM'11 rejection replayer
    over a logged stream; Auer et al. 2002 index): walk the log in
    time order, let UCB1 pick an arm from the REPLAYED counts — play
    unseen arms first (lowest index), else argmax of
    s/n + √(2·ln t / n) — and only when the pick matches the logged
    arm does the event count: the unbiased way to evaluate a bandit
    policy on logged uniform data without deploying it.

    Determinism: the whole replay is ONE in-row fold whose state is a
    flat int64 list [t, n₀.., s₀..] — all exact; the index
    comparisons are pinned double chains recomputed from those ints
    each step, ties to the lowest arm.  ``n_arms`` is a literal (the
    pick expression unrolls per arm).

    One key exchange; ``max_len`` raises in-plan (replay is
    sequential by nature — shard by key, not by time).

    Returns ``(*group_cols, n_events, n_matched, reward_sum, ctr,
    *per-arm pulls)`` with ctr = reward_sum/n_matched.
    """
    if n_arms < 2:
        raise ValueError("need n_arms >= 2")
    g = list(group_cols)
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*g).orderBy(*order)
    base = df.select(
        *g, F.row_number().over(w).alias("_i"),
        F.col(arm_col).cast("long").alias("_a"),
        F.col(reward_col).cast("long").alias("_r"))
    bad = (F.col("_a") < 0) | (F.col("_a") >= n_arms)
    base = base.select(
        *g, "_i",
        F.when(bad, F.raise_error(F.lit(
            f"ucb_replay: arm outside [0, {n_arms})")).cast("long"))
        .otherwise(F.col("_a")).alias("_a"), "_r")
    per = (base.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.array_sort(F.collect_list(
                    F.struct("_i", "_a", "_r"))).alias("_s")))
    guard = F.when(
        F.col("n_events") > max_len,
        F.raise_error(F.concat(
            F.lit(f"ucb_replay: stream exceeds {max_len} events: "),
            F.col("n_events").cast("string"))).cast("long"))
    K = n_arms
    zero = F.array(*([F.lit(0).cast("long")] * (1 + 2 * K)))

    def pick(acc):
        # first unplayed arm wins, lowest index
        unplayed = None
        for a in range(K):
            cond = F.element_at(acc, a + 2) == 0
            unplayed = F.when(cond, F.lit(a)) if unplayed is None \
                else unplayed.when(cond, F.lit(a))
        t = F.element_at(acc, 1).cast("double")

        def idx(a):
            n = F.element_at(acc, a + 2).cast("double")
            s = F.element_at(acc, K + a + 2).cast("double")
            return s / n + F.sqrt(F.lit(2.0) * F.log(t) / n)

        best = F.lit(0)
        bi = idx(0)
        for a in range(1, K):
            ia = idx(a)
            better = ia > bi
            best = F.when(better, F.lit(a)).otherwise(best)
            bi = F.when(better, ia).otherwise(bi)
        return unplayed.otherwise(best)

    def step(acc, e):
        p = pick(acc)
        hit = p == e["_a"]
        slots = [F.element_at(acc, 1)
                 + F.when(hit, F.lit(1)).otherwise(F.lit(0))]
        for a in range(K):
            slots.append(F.element_at(acc, a + 2) + F.when(
                hit & (e["_a"] == a), F.lit(1)).otherwise(F.lit(0)))
        for a in range(K):
            slots.append(F.element_at(acc, K + a + 2) + F.when(
                hit & (e["_a"] == a), e["_r"]).otherwise(F.lit(0)))
        return F.array(*slots)

    fin = F.aggregate(F.col("_s"), zero, step)
    out = per.select(
        *g, F.coalesce(guard, F.col("n_events")).alias("n_events"),
        fin.alias("_f"))
    nm = F.element_at(F.col("_f"), 1)
    rs = None
    for a in range(K):
        t = F.element_at(F.col("_f"), K + a + 2)
        rs = t if rs is None else rs + t
    return out.select(
        *g, "n_events", nm.alias("n_matched"),
        rs.alias("reward_sum"),
        F.when(nm > 0, rs.cast("double") / nm.cast("double"))
        .alias("ctr"),
        *[F.element_at(F.col("_f"), a + 2).alias(f"pulls_{a}")
          for a in range(K)])


def concentration_profile(df: DataFrame, group_cols: "list[str]",
                          firm_col: str) -> DataFrame:
    """Market-concentration profile per group over firm event counts:
    the antitrust/ecosystem-health panel —

    - HHI = Σ cᵢ²/C² (the Herfindahl-Hirschman index, exact rational:
      one division of Σcᵢ² by C²),
    - CR4 = top-4 firm share (exact selection sum / C),
    - top_share = largest firm / C,
    - Atkinson(ε=1) = 1 − geomean(cᵢ)/mean(cᵢ) — the inequality-
      averse view; geomean via a PINNED (count, firm)-ordered ln
      fold, one exp, one division (counts ≥ 1, so ln is total).

    One map-side-combinable count per (group, firm) + one k-row
    collapse.  Returns ``(*group_cols, n_firms, total, hhi, cr4,
    top_share, atkinson)``.
    """
    g = list(group_cols)
    firm = (df.groupBy(*g, F.col(firm_col).alias("_f"))
            .agg(F.count(F.lit(1)).alias("_c")))
    arr = F.sort_array(F.collect_list(F.struct(
        (-F.col("_c")).alias("nc"), F.col("_f").alias("f"))))
    lnarr = F.sort_array(F.collect_list(F.struct(
        F.col("_c").alias("c"), F.col("_f").alias("f"))))
    per = (firm.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n_firms"),
                F.sum("_c").alias("total"),
                F.sum(F.col("_c") * F.col("_c")).alias("_sq"),
                arr.alias("_top"), lnarr.alias("_ln")))
    c = F.col("total")
    cr4 = F.aggregate(
        F.slice(F.col("_top"), 1, 4), F.lit(0).cast("long"),
        lambda a, s: a - s["nc"])
    lnsum = F.aggregate(
        F.col("_ln"), F.lit(0.0),
        lambda a, s: a + F.log(s["c"].cast("double")))
    atk = (F.lit(1.0)
           - F.exp(lnsum / F.col("n_firms").cast("double"))
           / (c.cast("double") / F.col("n_firms").cast("double")))
    return per.select(
        *g, "n_firms", "total",
        (F.col("_sq").cast("double") / (c * c).cast("double"))
        .alias("hhi"),
        (cr4.cast("double") / c.cast("double")).alias("cr4"),
        ((-F.element_at(F.col("_top"), 1)["nc"]).cast("double")
         / c.cast("double")).alias("top_share"),
        atk.alias("atkinson"))
