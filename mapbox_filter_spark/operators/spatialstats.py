"""Spatial autocorrelation statistics over integer grid cells —
global Moran's I and per-cell Getis-Ord Gi* hotspot scores.

These are the classic ESDA (exploratory spatial data analysis)
statistics a tiling engine owes its users once counts-per-cell exist:
Moran's I answers "is the field spatially clustered AT ALL?" (one
number), Gi* answers "WHICH cells are the hot/cold spots?" (a z-score
per cell).  Both use binary queen (8-neighbor) or rook (4-neighbor)
contiguity weights on the integer cell grid, so the neighbor structure
is an EQUI-join on shifted cell coordinates — no geometry predicates,
no broadcast of the cell table, scale-free.

Exactness (the engine-wide discipline): with v the exact long cell
value, n the cell count and S1 = Σv, the n-SCALED deviation
``z = n·v − S1`` is an exact long (no float mean), and every
sum-of-products over z is exact int64; the scale factors cancel in the
final ratios, which are evaluated as one pinned long→double chain —
bit-stable cross-engine.  Overflow of the exact sums fails LOUDLY
under ANSI (never a silent wrap); rescale the value units (e.g. counts
not micro-cents) for corpora past |z|² · pairs ≈ 2⁶³.

Scale shape: one explode(×8 or ×4 offsets) on the anchor side + one
equi-join on the cell key + one groupBy — all hash on cell
coordinates.  The totals row (n, S1, S2) is a single-row broadcast.
Hot cells don't skew: each cell matches ≤ 8 neighbors by construction
(contrast the point-level joins in cluster.py, which salt).

Reference: Moran (1950) / Getis & Ord (1992, "The Analysis of Spatial
Association by Use of Distance Statistics") — public formulas; the
exact-integer scaled-deviation evaluation is this engine's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["morans_i", "getis_ord_gi", "local_moran",
           "mann_kendall_cells", "knox_pairs", "ripley_k", "gearys_c",
           "join_count_stats", "sd_ellipse", "clark_evans",
           "quadrat_test", "rayleigh_test", "location_quotient",
           "g_function", "dissimilarity_index"]

_QUEEN = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          if not (dx == 0 and dy == 0)]
_ROOK = [(-1, 0), (1, 0), (0, -1), (0, 1)]


def _neighbor_pairs(cells: DataFrame, x_col: str, y_col: str,
                    offsets: "list[tuple[int, int]]",
                    include_self: bool = False) -> DataFrame:
    """Ordered (anchor, neighbor) cell pairs under the offset stencil:
    anchor rows explode to their |offsets| probe coordinates, then ONE
    equi-join against the cell table.  Columns: anchor ``x/y/v_a`` and
    neighbor ``v_b``."""
    offs = list(offsets) + ([(0, 0)] if include_self else [])
    stencil = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])
    probes = (cells.select(F.col(x_col).alias("x"),
                           F.col(y_col).alias("y"),
                           F.col("_v").alias("v_a"),
                           F.explode(stencil).alias("o"))
              .select("x", "y", "v_a",
                      (F.col("x") + F.col("o.dx")).alias("nx"),
                      (F.col("y") + F.col("o.dy")).alias("ny")))
    nbrs = cells.select(F.col(x_col).alias("nx"),
                        F.col(y_col).alias("ny"),
                        F.col("_v").alias("v_b"))
    return probes.join(nbrs, ["nx", "ny"])


def _with_totals(cells: DataFrame) -> DataFrame:
    """Cross-join the single totals row (n, S1, S2) — broadcast by
    construction (one row)."""
    totals = cells.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_s1"),
        F.sum(F.col("_v") * F.col("_v")).alias("_s2"))
    return cells.crossJoin(F.broadcast(totals))


def morans_i(cells: DataFrame, x_col: str, y_col: str, value_col: str,
             queen: bool = True) -> DataFrame:
    """Global Moran's I over one-row-per-cell input with exact long
    ``value_col``.  Returns ONE row
    ``(n_cells, w_pairs, cross_num, den, e_i, moran_i)``:

    - ``cross_num = Σ_{(i,j) adjacent} zᵢ·zⱼ`` and ``den = Σ zᵢ²`` over
      the n-scaled deviations z = n·v − S1 (exact longs; the n² scale
      cancels in the ratio),
    - ``moran_i = (n · cross_num) / (w_pairs · den)`` as one pinned
      double chain, NULL for a constant field (den = 0, integer guard),
    - ``e_i = −1/(n−1)`` the null expectation (pinned divide) — I above
      e_i ⇒ clustering, below ⇒ dispersion.

    ``w_pairs`` counts ORDERED adjacent pairs (the standard W for
    symmetric binary weights); edge cells simply contribute fewer
    pairs.  Duplicate (x, y) rows are a caller bug — aggregate first
    (the gate pipes through a groupBy, which guarantees it).
    """
    base = cells.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                        F.col(value_col).cast("long").alias("_v"))
    zed = F.col("_n") * F.col("_v") - F.col("_s1")
    # one row per cell with _v REPLACED by the n-scaled deviation z
    zcells = _with_totals(base).select(
        "x", "y", zed.alias("_v"), F.col("_n"))
    pairs = _neighbor_pairs(
        zcells, "x", "y", _QUEEN if queen else _ROOK)
    cross = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.col("v_a") * F.col("v_b")).alias("cross_num"))
    den = zcells.agg(F.max("_n").alias("n_cells"),
                     F.sum(F.col("_v") * F.col("_v")).alias("den"))
    out = den.crossJoin(F.broadcast(cross))
    moran = F.when(
        (F.col("den") > 0) & (F.col("w_pairs") > 0),
        (F.col("n_cells").cast("double") * F.col("cross_num").cast("double"))
        / (F.col("w_pairs").cast("double") * F.col("den").cast("double")))
    e_i = F.when(F.col("n_cells") > 1,
                 F.lit(-1.0) / (F.col("n_cells") - 1).cast("double"))
    return out.select("n_cells", "w_pairs", "cross_num", "den",
                      e_i.alias("e_i"), moran.alias("moran_i"))


def getis_ord_gi(cells: DataFrame, x_col: str, y_col: str,
                 value_col: str, queen: bool = True) -> DataFrame:
    """Getis-Ord Gi* hotspot z-score per cell (the * variant: the
    neighborhood INCLUDES the cell itself).  Returns one row per cell
    ``(x, y, v, k, t_sum, g_num, gi)``:

    - ``k`` = neighborhood size (≤ 9 queen / ≤ 5 rook — fewer at grid
      edges), ``t_sum = Σ_{j ∈ N(i)∪{i}} vⱼ`` exact,
    - ``g_num = n·t_sum − k·S1`` the exact scaled numerator,
    - ``gi = g_num / √( (n·S2 − S1²) · (n·k − k²) / (n−1) )`` — the
      classical Gi* with every sub-term exact int64 and ONE pinned
      double chain (cast products, one divide, one √, one divide);
      NULL for constant fields or k = n (degenerate variance, integer
      guards).

    |gi| ≳ 1.96 flags 5%-significant hot (positive) / cold (negative)
    spots under the normal approximation — the per-cell complement of
    the single-number morans_i.
    """
    base = cells.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                        F.col(value_col).cast("long").alias("_v"))
    t = _with_totals(base)
    pairs = _neighbor_pairs(
        t, "x", "y", _QUEEN if queen else _ROOK, include_self=True)
    per = pairs.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("v_b").alias("t_sum"))
    joined = t.join(per, ["x", "y"])
    n, s1, s2, k = (F.col("_n"), F.col("_s1"), F.col("_s2"), F.col("k"))
    g_num = n * F.col("t_sum") - k * s1
    var_v = n * s2 - s1 * s1          # n² · Σ(v−v̄)² — exact
    var_k = n * k - k * k             # n² · (k/n)(1−k/n) — exact
    gi = F.when(
        (var_v > 0) & (var_k > 0) & (n > 1),
        g_num.cast("double")
        / F.sqrt((var_v * var_k).cast("double")
                 / (n - 1).cast("double")))
    return joined.select("x", "y", F.col("_v").alias("v"), "k", "t_sum",
                         g_num.alias("g_num"), gi.alias("gi"))


def local_moran(cells: DataFrame, x_col: str, y_col: str,
                value_col: str, queen: bool = True) -> DataFrame:
    """Per-cell local Moran's I (Anselin 1995, "Local Indicators of
    Spatial Association") — the WHERE of which morans_i is the single
    global number: each cell gets the sign/strength of its agreement
    with its neighborhood, classically mapped as the HH/LL/HL/LH
    cluster quadrants.

    Same exact-integer evaluation as morans_i: over the n-scaled
    deviations z = n·v − S1 (exact longs), the per-cell statistic is
    the RAW numerator ``local_num = zᵢ · Σ_{j∈nbr} zⱼ`` — every global
    normalization (1/m₂, W row-standardization) is a positive constant
    that preserves ranking and sign, so the exact long IS the LISA map.
    Int64 bound: 8·(n·v_max)² — ANSI raises loudly past it (rescale
    value units, the morans_i note).

    Quadrants: HH (z>0, lag>0), LL (z<0, lag<0), HL (z>0, lag<0),
    LH (z<0, lag>0), ZERO when either side is exactly 0; cells with no
    neighbors keep NULL lag/local/quad.

    Scale shape: identical to morans_i — one explode(×8) + one
    equi-join + one groupBy; the per-cell join-back is on the cell key.

    Returns ``(x, y, z_s, n_nbrs, lag_s, local_num, quad)``.
    """
    base = cells.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                        F.col(value_col).cast("long").alias("_v"))
    zed = F.col("_n") * F.col("_v") - F.col("_s1")
    zcells = _with_totals(base).select("x", "y", zed.alias("_v"))
    lag = (_neighbor_pairs(zcells, "x", "y",
                           _QUEEN if queen else _ROOK)
           .groupBy("x", "y")
           .agg(F.count(F.lit(1)).alias("n_nbrs"),
                F.sum("v_b").alias("lag_s")))
    j = (zcells.withColumnRenamed("_v", "z_s")
         .join(lag, ["x", "y"], "left")
         .select("x", "y", "z_s",
                 F.coalesce("n_nbrs", F.lit(0).cast("long"))
                 .alias("n_nbrs"),
                 "lag_s",
                 (F.col("z_s") * F.col("lag_s")).alias("local_num")))
    quad = (F.when(F.col("lag_s").isNull(), F.lit(None).cast("string"))
            .when((F.col("z_s") == 0) | (F.col("lag_s") == 0), "ZERO")
            .when((F.col("z_s") > 0) & (F.col("lag_s") > 0), "HH")
            .when((F.col("z_s") < 0) & (F.col("lag_s") < 0), "LL")
            .when(F.col("z_s") > 0, "HL")
            .otherwise("LH"))
    return j.withColumn("quad", quad)


def mann_kendall_cells(pts: DataFrame, cell: int,
                       x_col: str = "x", y_col: str = "y",
                       ts_col: str = "ts") -> DataFrame:
    """Emerging-hotspot detection: per-grid-cell Mann-Kendall trend
    statistic over the cell's daily activity counts — the space-time
    pattern behind "which areas are heating up / cooling down", and the
    statistic ESRI's emerging-hotspot tool runs per cube bin.

    Mann-Kendall S = Σ_{i<j} sign(c_j − c_i) over the day-ordered daily
    counts is PURE integer arithmetic (sign by two comparisons, never
    signum's double) — the whole row value-hashes cross-engine.  A cell
    needs ≥ 2 active days for a defined pair sum; single-day cells
    report S = 0 / 'flat' (kept, via the left join).

    Scale shape: the daily rollup hashes (cell, day) — map-side
    combinable, the only fact-sized shuffle; the pair self-join and
    both groupBys hash the CELL key.  The quadratic term is d(d−1)/2
    per cell where d = DISTINCT ACTIVE DAYS, calendar-bounded (d ≤ 366
    per year regardless of row count), so pair volume grows linearly
    in cells, never in events.

    Reference: Mann (1945) / Kendall's rank-correlation S; trend label
    by the sign of S (the variance-normalized Z needs tie-corrected
    √VAR(S), a non-portable float chain — callers wanting Z compute it
    downstream from the exact S and n_days).

    Returns ``(cx, cy, n_days, s_stat, trend)``.
    """
    from ..geo.tilemath import floor_div

    day = F.datediff(F.col(ts_col).cast("date"),
                     F.lit("1970-01-01").cast("date")).cast("long")
    daily = (pts.select(floor_div(F.col(x_col), cell).alias("cx"),
                        floor_div(F.col(y_col), cell).alias("cy"),
                        day.alias("_day"))
             .groupBy("cx", "cy", "_day")
             .agg(F.count(F.lit(1)).alias("_n")))
    lhs = daily.alias("l")
    rhs = daily.alias("r")
    sg = (F.when(F.col("r._n") > F.col("l._n"), 1)
          .when(F.col("r._n") < F.col("l._n"), -1)
          .otherwise(0)).cast("long")
    pairs = (lhs.join(rhs, (F.col("l.cx") == F.col("r.cx"))
                      & (F.col("l.cy") == F.col("r.cy"))
                      & (F.col("l._day") < F.col("r._day")))
             .groupBy(F.col("l.cx").alias("cx"),
                      F.col("l.cy").alias("cy"))
             .agg(F.sum(sg).alias("s_stat")))
    base = daily.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n_days"))
    s = F.coalesce(F.col("s_stat"), F.lit(0).cast("long"))
    return (base.join(pairs, ["cx", "cy"], "left")
            .select("cx", "cy", "n_days", s.alias("s_stat"),
                    F.when(s > 0, F.lit("up"))
                    .when(s < 0, F.lit("down"))
                    .otherwise(F.lit("flat")).alias("trend")))


def _blocked_pairs(pts: DataFrame, eps: int, id_col: str,
                   x_col: str, y_col: str,
                   extra_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Unordered (``i < j``) near-pairs — thin alias over the shared
    grid block-join helper in operators/cluster.py (one implementation
    of the ×9-probe blocking scheme for knox/ripley/LOF)."""
    from .cluster import blocked_pairs

    return blocked_pairs(pts, eps, id_col=id_col, x=x_col, y=y_col,
                         extra_cols=extra_cols)


def knox_pairs(pts: DataFrame, eps: int, tau: int, *,
               id_col: str = "i", x_col: str = "x", y_col: str = "y",
               t_col: str = "t") -> DataFrame:
    """Knox space-time interaction test: of all n(n−1)/2 point pairs,
    how many are close in space (d² ≤ eps²), close in time
    (|Δt| ≤ tau), and close in BOTH — the epidemiology / crime-analysis
    statistic for "do events cluster in space AND time together"
    (disease outbreaks, aftershocks, repeat victimization).  The
    observed joint count is compared with the independence expectation
    space·time/total (the Knox chance line; significance testing
    permutes timestamps downstream — a Monte-Carlo concern, not an
    engine one).

    Exactness: every count is exact int64 (integer coordinates and
    timestamps, i < j each pair once); ``expected`` is the single
    pinned double expression space·time/total.

    Scale shape: NEVER materializes the quadratic pair space — the
    space+joint counts come from ONE eps-grid block join (×9 probe
    explode, pairs emitted once by cell identity), the time count from
    one tau-bucket block join (×3 probe explode), and n from a
    map-side-combinable count; three independent shuffles, each keyed
    on its blocking cell.  Pair volume is output-bounded (only pairs
    actually within eps / tau), never n².

    Reference: Knox (1964, "The detection of space-time interactions");
    blocked-join evaluation is this engine's.

    Returns one row ``(n_points, n_pairs, space_pairs, time_pairs,
    joint_pairs, expected)``.
    """
    from ..geo.tilemath import floor_div

    if eps <= 0 or tau <= 0:
        raise ValueError("eps and tau must be positive integers")
    # the three aggregates below each rescan pts (and the block joins
    # scan it twice); checkpoint the narrow projection lazily so one
    # materialization feeds all five consumers
    pts = pts.select(F.col(id_col), F.col(x_col), F.col(y_col),
                     F.col(t_col)).localCheckpoint(eager=False)
    sp = (_blocked_pairs(pts, eps, id_col, x_col, y_col,
                         extra_cols=(t_col,))
          .agg(F.count(F.lit(1)).alias("space_pairs"),
               F.coalesce(
                   F.sum(F.when(F.abs(F.col(f"l_{t_col}")
                                      - F.col(f"r_{t_col}")) <= tau, 1)
                         .otherwise(0)),
                   F.lit(0)).cast("long").alias("joint_pairs")))

    tb = pts.select(F.col(id_col).alias("i"), F.col(t_col).alias("_ti"),
                    floor_div(F.col(t_col), tau).alias("_b"))
    probe = (pts.select(F.col(id_col).alias("j"),
                        F.col(t_col).alias("_tj"),
                        floor_div(F.col(t_col), tau).alias("_jb"))
             .select("j", "_tj", F.explode(F.array(
                 F.col("_jb") - 1, F.col("_jb"),
                 F.col("_jb") + 1)).alias("_pb")))
    tp = (tb.join(probe, (tb["_b"] == probe["_pb"])
                  & (F.col("i") < F.col("j"))
                  & (F.abs(F.col("_ti") - F.col("_tj")) <= tau))
          .agg(F.count(F.lit(1)).alias("time_pairs")))

    nn = pts.agg(F.count(F.lit(1)).alias("n_points"))
    npairs = (F.col("n_points") * (F.col("n_points") - 1) / 2) \
        .cast("long")
    return (nn.crossJoin(sp).crossJoin(tp)
            .select("n_points", npairs.alias("n_pairs"),
                    "space_pairs", "time_pairs", "joint_pairs")
            .withColumn(
                "expected",
                F.when(F.col("n_pairs") > 0,   # integer-only guard:
                       # Spark NULL vs DuckDB NaN on 0/0 would split
                       # the value hash (both emit NULL under the CASE)
                       F.col("space_pairs").cast("double")
                       * F.col("time_pairs").cast("double")
                       / F.col("n_pairs").cast("double"))))


def ripley_k(pts: DataFrame, radii: "list[int]", *,
             id_col: str = "i", x_col: str = "x",
             y_col: str = "y") -> DataFrame:
    """Ripley's K function over a radius ladder: K̂(r) =
    A·2·pairs(r)/(n·(n−1)) where pairs(r) counts unordered point pairs
    with d² ≤ r² and A is the bounding-box study area — the
    second-moment summary distinguishing clustered / random / regular
    point processes at each scale r (K above πr² = clustered at that
    scale).  Border correction is the caller's choice of study frame;
    the uncorrected estimator here is the one every correction starts
    from.

    Exactness: pair counts, n, and the bbox area are exact int64; each
    ladder rung reuses ONE block join at cell = max(r) (a pair with
    d² ≤ r² for small r certainly has d² ≤ r_max²), with per-rung
    conditional integer sums — so the whole ladder costs one join, not
    len(radii).  ``k_hat`` is the single pinned double chain
    2·cnt · A / (n·(n−1)).

    Scale shape: one ×9-probe grid join keyed on the r_max cell (pair
    volume output-bounded), one single-row stats aggregate broadcast
    back, and an in-row ladder unpivot (stack) — no per-radius rescan.
    For radius ladders spanning orders of magnitude, call once per
    decade so small rungs don't pay the big rung's candidate volume.

    Reference: Ripley (1976, "The second-order analysis of stationary
    point processes"); blocked one-join ladder is this engine's.

    Returns one row per radius ``(r, pair_cnt, n_points, area, k_hat)``.
    """
    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive integers")
    rmax = rs[-1]
    # one lazy checkpoint feeds the stats aggregate + both join sides
    pts = pts.select(F.col(id_col), F.col(x_col), F.col(y_col)) \
        .localCheckpoint(eager=False)
    pairs = _blocked_pairs(pts, rmax, id_col, x_col, y_col)
    cnt = pairs.agg(*[
        F.coalesce(F.sum(F.when(F.col("d2") <= r * r, 1).otherwise(0)),
                   F.lit(0))
        .cast("long").alias(f"_c{r}") for r in rs])
    stats = pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        ((F.max(x_col) - F.min(x_col))
         * (F.max(y_col) - F.min(y_col))).cast("long").alias("area"))
    stack = F.expr("stack({}, {})".format(
        len(rs), ", ".join(f"bigint({r}), _c{r}" for r in rs))) \
        .alias("r", "pair_cnt")
    return (stats.crossJoin(cnt)
            .select("n_points", "area", stack)
            .select("r", "pair_cnt", "n_points", "area",
                    F.when(F.col("n_points") > 1,  # guard 0/0 NULL-vs-NaN
                           (F.col("pair_cnt") * 2).cast("double")
                           * F.col("area").cast("double")
                           / (F.col("n_points")
                              * (F.col("n_points") - 1)).cast("double"))
                    .alias("k_hat")))


def gearys_c(cells: DataFrame, x_col: str, y_col: str, value_col: str,
             queen: bool = True) -> DataFrame:
    """Global Geary's C — Moran's I's local-contrast twin: C =
    (n−1)·Σ_{adjacent} (vᵢ−vⱼ)² / (2W·Σ(vᵢ−v̄)²).  C < 1 means
    neighbors are more similar than chance (positive autocorrelation),
    C > 1 more dissimilar; because it squares local DIFFERENCES rather
    than cross-products of global deviations, it reacts to small-scale
    structure that Moran's I (a global covariance) smooths over — the
    standard pairing in every ESDA toolkit.

    Exactness: the difference sum Σw(vᵢ−vⱼ)² is exact int64 on raw
    longs (no centering needed — differences cancel the mean), and the
    variance denominator reuses the n-scaled deviation z = n·v − S1
    (Σz² = n²·Σ(v−v̄)², so C = (n−1)·n²·diff / (2W·Σz²)); the ratio is
    one pinned double chain, NULL for a constant field (integer
    guard).  Overflow fails loudly under ANSI (rescale units past
    |Δv|²·pairs ≈ 2⁶³).

    Scale shape: identical to morans_i — one explode(×8/×4) equi-join
    on shifted cell coords + two aggregates, all hashing cell keys;
    the totals row broadcasts.

    Reference: Geary (1954, "The Contiguity Ratio and Statistical
    Mapping"); exact-integer evaluation is this engine's.

    Returns ONE row ``(n_cells, w_pairs, diff_num, den, e_c,
    geary_c)`` with ``e_c = 1.0`` the null expectation.
    """
    base = cells.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                        F.col(value_col).cast("long").alias("_v"))
    pairs = _neighbor_pairs(base, "x", "y", _QUEEN if queen else _ROOK)
    dv = F.col("v_a") - F.col("v_b")
    diff = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.coalesce(F.sum(dv * dv), F.lit(0)).alias("diff_num"))
    zed = F.col("_n") * F.col("_v") - F.col("_s1")
    zcells = _with_totals(base).select(zed.alias("_z"), F.col("_n"))
    den = zcells.agg(F.max("_n").alias("n_cells"),
                     F.sum(F.col("_z") * F.col("_z")).alias("den"))
    out = den.crossJoin(F.broadcast(diff))
    geary = F.when(
        (F.col("den") > 0) & (F.col("w_pairs") > 0),
        (((F.col("n_cells") - 1) * F.col("n_cells") * F.col("n_cells"))
         .cast("double") * F.col("diff_num").cast("double"))
        / (F.lit(2.0) * F.col("w_pairs").cast("double")
           * F.col("den").cast("double")))
    return out.select("n_cells", "w_pairs", "diff_num", "den",
                      F.when(F.col("n_cells") > 1, F.lit(1.0))
                      .alias("e_c"),
                      geary.alias("geary_c"))


def join_count_stats(cells: DataFrame, x_col: str, y_col: str,
                     value_col: str, queen: bool = True) -> DataFrame:
    """Binary join-count statistics (Cliff & Ord) — the categorical
    sibling of morans_i on the same contiguity structure: binarize
    each cell as Black (value strictly above the global mean, the
    EXACT integer test n·v > S1) or White, then count BB / BW / WW
    adjacent pairs under the queen/rook stencil.  BB far above its
    null expectation means the hot cells clump; BW above expectation
    means a checkerboard.

    Exactness: the Black indicator is an integer comparison, the pair
    counts are exact longs, and the nonfree-sampling (hypergeometric)
    null expectations over ORDERED pairs

        E[BB] = W · nB·(nB−1) / (n·(n−1))
        E[BW] = W · 2·nB·nW   / (n·(n−1))

    have exact int64 numerators (the ESDA grid is ≤ 72×36 cells, so
    W·nB² ≤ ~1.4e11) evaluated as one pinned division each.

    Scale shape: identical to morans_i — one explode(×8/×4) equi-join
    on shifted cell coords + one aggregate; the totals row broadcasts.
    All pair counts are ORDERED (each unordered join counted twice),
    the standard W for symmetric binary weights — consistent with the
    w_pairs convention of morans_i/gearys_c.

    Reference: Cliff & Ord (1981, "Spatial Processes"), join-count
    chapter — public formulas; exact-integer evaluation is this
    engine's.

    Returns ONE row ``(n_cells, n_hot, w_pairs, bb, bw, ww, e_bb,
    e_bw)`` — expectations NULL when n < 2 (integer guard).
    """
    base = cells.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                        F.col(value_col).cast("long").alias("_v"))
    hot = F.when(F.col("_n") * F.col("_v") > F.col("_s1"), F.lit(1))
    hcells = _with_totals(base).select(
        "x", "y", hot.otherwise(F.lit(0)).cast("long").alias("_v"),
        F.col("_n"))
    pairs = _neighbor_pairs(hcells, "x", "y",
                            _QUEEN if queen else _ROOK)
    counts = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.coalesce(F.sum(F.col("v_a") * F.col("v_b")), F.lit(0))
        .alias("bb"),
        F.coalesce(F.sum((1 - F.col("v_a")) * (1 - F.col("v_b"))),
                   F.lit(0)).alias("ww"))
    tots = hcells.agg(F.max("_n").alias("n_cells"),
                      F.sum("_v").alias("n_hot"))
    out = tots.crossJoin(F.broadcast(counts))
    n = F.col("n_cells")
    nb = F.col("n_hot")
    nw = n - nb
    den = (n * (n - 1)).cast("double")
    e_bb = F.when(n > 1, (F.col("w_pairs") * nb * (nb - 1))
                  .cast("double") / den)
    e_bw = F.when(n > 1, (F.col("w_pairs") * 2 * nb * nw)
                  .cast("double") / den)
    return out.select(
        "n_cells", "n_hot", "w_pairs", "bb",
        (F.col("w_pairs") - F.col("bb") - F.col("ww")).alias("bw"),
        "ww", e_bb.alias("e_bb"), e_bw.alias("e_bw"))


# |x − anchor| bound keeping per-row products int64 and the DECIMAL(38)
# power sums exact through ~1e14 rows per group (the jarque_bera bound)
_SDE_MAX_ABS_DEV = 1_000_000


def sd_ellipse(df: DataFrame, group_cols, x_col: str,
               y_col: str) -> DataFrame:
    """Standard deviational ellipse per group — the classic centrography
    summary (mean center, dispersion axes, orientation) of a point
    cloud, over EXACT non-negative integer coordinates (shift/scale
    upstream; central moments are shift-invariant).

    Exactness (the jarque_bera discipline): each group computes its
    exact integer anchor (Σx div n, Σy div n) in one tiny aggregate
    broadcast back, then anchored deviations feed exact DECIMAL(38)
    sums Dx1, Dy1, Dx2 = Σdx², Dy2, Dxy = Σdx·dy.  Central second
    moments follow as FLAT pinned double chains

        mxx = Dx2/n − δx²   (δx = Dx1/n ∈ [0,1))
        myy = Dy2/n − δy²
        mxy = Dxy/n − δx·δy

    and the ellipse parameters are one pinned chain each:
    tan2θ = 2·mxy/(mxx − myy) (NULL when the moments are exactly equal
    — the EXACT decimal test n·(Dx2−Dy2) = Dx1²−Dy1² — where the
    orientation is degenerate: any θ+45° pair fits), and the semi-axis
    scales σ1/σ2 = √(t ± d) with t = (mxx+myy)/2,
    d = √(((mxx−myy)/2)² + mxy²); t − d is clamped at 0 (it is ≥ 0
    analytically; the clamp pins the float-rounding edge identically
    on both engines).  tan2θ is emitted instead of θ because atan2 is
    NOT bit-stable across engines — callers wanting degrees apply
    their own atan2 downstream.

    |deviation| ≤ 1e6 is enforced IN-PLAN via raise_error (milli-degree
    geographic coordinates fit globally); per-row products stay int64.

    Scale shape: two map-side-combinable aggregates + one broadcast
    join; output is O(groups).

    Reference: Lefever (1926) / Yuill (1971), the standard SDE
    formulas; exact-anchored evaluation is this engine's.

    Returns ``(group..., n, mxx, myy, mxy, tan2theta, sigma1,
    sigma2)`` — moment columns NULL when n < 2.
    """
    gcols = list(group_cols)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    anchors = df.groupBy(*gcols).agg(
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
        F.count(F.lit(1)).alias("_n"))
    anchors = anchors.select(
        *gcols, F.expr("_sx div _n").cast("long").alias("_ax"),
        F.expr("_sy div _n").cast("long").alias("_ay"))

    def _guard(d):
        return F.when(
            F.abs(d) > _SDE_MAX_ABS_DEV,
            F.raise_error(F.concat(
                F.lit("sd_ellipse: |coord − anchor| exceeds exact "
                      f"bound ({_SDE_MAX_ABS_DEV}): d="),
                d.cast("string"))).cast("long")).otherwise(d)

    with_d = (df.join(F.broadcast(anchors), gcols)
              .select(*gcols, _guard(x - F.col("_ax")).alias("_dx"),
                      _guard(y - F.col("_ay")).alias("_dy")))
    pd_ = lambda c: c.cast("decimal(38,0)")
    dx, dy = F.col("_dx"), F.col("_dy")
    agg = with_d.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(pd_(dx)).alias("_dx1"),
        F.sum(pd_(dy)).alias("_dy1"),
        F.sum(pd_(dx * dx)).alias("_dx2"),
        F.sum(pd_(dy * dy)).alias("_dy2"),
        F.sum(pd_(dx * dy)).alias("_dxy"))
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")
    delx = dd("_dx1") / nd
    dely = dd("_dy1") / nd
    mxx = dd("_dx2") / nd - delx * delx
    myy = dd("_dy2") / nd - dely * dely
    mxy = dd("_dxy") / nd - delx * dely
    ok = F.col("n") >= 2
    iso = (F.col("n").cast("decimal(38,0)")
           * (F.col("_dx2") - F.col("_dy2"))
           == F.col("_dx1") * F.col("_dx1")
           - F.col("_dy1") * F.col("_dy1"))
    tan2 = F.when(ok & ~iso,
                  F.lit(2.0) * mxy / (mxx - myy))
    tr = (mxx + myy) / F.lit(2.0)
    half = (mxx - myy) / F.lit(2.0)
    disc = F.sqrt(half * half + mxy * mxy)
    s1 = F.when(ok, F.sqrt(tr + disc))
    s2 = F.when(ok, F.sqrt(F.greatest(tr - disc, F.lit(0.0))))
    return agg.select(
        *gcols, "n", F.when(ok, mxx).alias("mxx"),
        F.when(ok, myy).alias("myy"), F.when(ok, mxy).alias("mxy"),
        tan2.alias("tan2theta"), s1.alias("sigma1"), s2.alias("sigma2"))


def kde_surface(pts: DataFrame, cell: int, radius: int,
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Kernel-density-estimate surface on a regular grid — the
    continuous heat surface behind every "density map" tile layer
    (Silverman 1986 §4.ЗК; the quartic/biweight kernel is the QGIS /
    ArcGIS heatmap default).  Evaluates the KDE at CELL CENTERS with
    the quartic kernel K(d) = (1 − (d/r)²)² for d < r.

    Exactness: everything runs in DOUBLED integer coordinates so cell
    centers are integral ((2g+1)·cell); the kernel numerator
    (r₂² − d₂²)² is then an exact int64 per contribution and the
    per-cell sum ``kde_num`` is an exact long — the density is ONE
    pinned divide by the constant r₂⁴.  Bound: contributions ≤
    (2r)⁴ each ⇒ Σ fits int64 while n_in_radius·(2r)⁴ < 2⁶³ (r = 2000
    doubles to 4000 ⇒ 2.6·10¹⁴ per point — ~35k points per disc, the
    heavy_hitters-detectable hot-cell case; raise ``cell`` or
    pre-aggregate).

    Scale shape: the DBSCAN discipline — each point explodes to its
    3×3 neighbor cells (ring 1 covers every center within r because
    r ≤ 1.5·cell is ENFORCED; the nearest excluded center sits
    ≥ 1.5·cell away) and ONE map-side-combinable groupBy on the cell
    key aggregates.  No pair joins, no windows.

    Returns ``(gx, gy, n_contrib, kde_num, density)`` for cells with
    ≥ 1 in-radius contribution.
    """
    if radius > 1.5 * cell:
        raise ValueError(
            f"kde_surface: radius {radius} exceeds 1.5*cell "
            f"({1.5 * cell:.0f}) — ring-1 coverage would miss "
            "contributions; raise cell or generalize the ring")
    from ..geo.tilemath import floor_div

    r2d = 2 * radius
    r2d2 = r2d * r2d
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off_arr = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])
    p = pts.select(
        floor_div(F.col(x_col), cell).alias("_gx"),
        floor_div(F.col(y_col), cell).alias("_gy"),
        (F.col(x_col).cast("long") * 2).alias("_x2"),
        (F.col(y_col).cast("long") * 2).alias("_y2"),
        F.explode(off_arr).alias("_o"))
    gx = (F.col("_gx") + F.col("_o.dx"))
    gy = (F.col("_gy") + F.col("_o.dy"))
    cx = (gx * 2 * cell + cell)   # doubled center coordinate
    cy = (gy * 2 * cell + cell)
    d2 = ((F.col("_x2") - cx) * (F.col("_x2") - cx)
          + (F.col("_y2") - cy) * (F.col("_y2") - cy))
    contrib = p.select(
        gx.alias("gx"), gy.alias("gy"), d2.alias("_d2")).filter(
        F.col("_d2") < F.lit(r2d2))
    num = (F.lit(r2d2) - F.col("_d2"))
    agg = contrib.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).alias("n_contrib"),
        F.sum(num * num).alias("kde_num"))
    dens = (F.col("kde_num").cast("double")
            / F.lit(float(r2d2) * float(r2d2)))
    return agg.select("gx", "gy", "n_contrib", "kde_num",
                      dens.alias("density"))


# marching-squares segment table, midpoint rule.  Corner bits:
# BL=1, BR=2, TR=4, TL=8 (bit set when value >= threshold).  Edge
# midpoints in DOUBLED block-relative coordinates: L=(0,1) B=(1,0)
# T=(1,2) R=(2,1); endpoints ordered lexicographically so the segment
# set hashes canonically.  Saddles use the FIXED disconnected
# convention (no center sampling): case 5 = {L-B, T-R}, case 10 =
# {B-R, L-T} — each inside corner isolated.
_MS_SEGS = {
    1: [((0, 1), (1, 0))],                       # L-B
    2: [((1, 0), (2, 1))],                       # B-R
    3: [((0, 1), (2, 1))],                       # L-R
    4: [((1, 2), (2, 1))],                       # T-R
    5: [((0, 1), (1, 0)), ((1, 2), (2, 1))],     # L-B + T-R
    6: [((1, 0), (1, 2))],                       # B-T
    7: [((0, 1), (1, 2))],                       # L-T
    8: [((0, 1), (1, 2))],                       # L-T
    9: [((1, 0), (1, 2))],                       # B-T
    10: [((1, 0), (2, 1)), ((0, 1), (1, 2))],    # B-R + L-T
    11: [((1, 2), (2, 1))],                      # T-R
    12: [((0, 1), (2, 1))],                      # L-R
    13: [((1, 0), (2, 1))],                      # B-R
    14: [((0, 1), (1, 0))],                      # L-B
}


def contour_segments(grid: DataFrame, threshold: int,
                     x_col: str = "gx", y_col: str = "gy",
                     v_col: str = "v") -> DataFrame:
    """Marching-squares isoline extraction (midpoint rule) over an
    integer-valued sparse grid — the contour layer every density /
    elevation tile renderer draws on top of a surface like
    :func:`kde_surface` (Lorensen & Cline's 2-D ancestor; the midpoint
    variant skips interpolation so EVERY coordinate is an exact
    integer in doubled grid units).

    Semantics: a grid square (bx, by) spans corners (bx,by)..(bx+1,
    by+1); missing cells read as 0 (< threshold, outside).  Corner
    bits BL=1 BR=2 TR=4 TL=8 form the classic 16-case index; cases
    1-14 emit 1-2 segments whose endpoints are edge midpoints at
    doubled coordinates (so bottom = (2bx+1, 2by) is integral).
    Saddles (5, 10) use the fixed disconnected convention — each
    inside corner isolated — documented rather than resolved by
    center sampling, so the output is a pure function of the corner
    bits.

    Scale shape: each grid cell explodes to the ≤4 squares it corners
    (×4, no pair join) and ONE map-side-combinable groupBy on the
    square key ORs the bits; the segment table is an in-row literal
    lookup + explode.  Single shuffle, exact integers end-to-end.

    Returns ``(bx, by, mcase, x0, y0, x1, y1)`` — one row per emitted
    segment, endpoints lexicographic.
    """
    v = F.col(v_col).cast("long")
    corner = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(bit).alias("bit"))
        for dx, dy, bit in ((0, 0, 1), (1, 0, 2), (1, 1, 4),
                            (0, 1, 8))])).alias("_c")
    pts = grid.select(
        F.col(x_col).cast("long").alias("_gx"),
        F.col(y_col).cast("long").alias("_gy"),
        F.when(v >= F.lit(int(threshold)), F.lit(1))
        .otherwise(F.lit(0)).alias("_in"), corner)
    blocks = (pts.select(
        (F.col("_gx") - F.col("_c.dx")).alias("bx"),
        (F.col("_gy") - F.col("_c.dy")).alias("by"),
        (F.col("_in") * F.col("_c.bit")).alias("_b"))
        .groupBy("bx", "by")
        .agg(F.sum("_b").cast("int").alias("mcase"))
        .filter((F.col("mcase") >= 1) & (F.col("mcase") <= 14)))
    seg_lut = F.array(*[
        F.array(*[F.struct(F.lit(a[0]).alias("x0"),
                           F.lit(a[1]).alias("y0"),
                           F.lit(b[0]).alias("x1"),
                           F.lit(b[1]).alias("y1"))
                  for a, b in _MS_SEGS[c]])
        for c in range(1, 15)])
    segs = blocks.select(
        "bx", "by", "mcase",
        F.explode(F.element_at(seg_lut, F.col("mcase"))).alias("_s"))
    bx2 = F.col("bx") * 2
    by2 = F.col("by") * 2
    return segs.select(
        "bx", "by", "mcase",
        (bx2 + F.col("_s.x0")).alias("x0"),
        (by2 + F.col("_s.y0")).alias("y0"),
        (bx2 + F.col("_s.x1")).alias("x1"),
        (by2 + F.col("_s.y1")).alias("y1"))


def clark_evans(pts: DataFrame, radius: int, *, id_col: str = "i",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Clark-Evans nearest-neighbour index R with its normal-approx
    z-score — the one-number answer to "is this point pattern
    clustered (R<1), random (R≈1) or dispersed (R>1)?" (Clark & Evans
    1954).  R = D̄_obs / D̄_exp with D̄_exp = ½·√(A/n) under CSR on the
    bounding-box area A; z = (D̄_obs − D̄_exp) / SE,
    SE = √((4−π)/(4π)) · √A / n.

    Radius-bounded NN (the scale contract): the nearest neighbour is
    searched within ``radius`` via the one-pass eps-grid join
    (cluster.grid_radius_join shape) — a point with NO in-radius
    neighbour is EXCLUDED from D̄_obs and reported in
    ``n_points − n_with_nn`` (the bounded search is what keeps this
    one cell-key exchange instead of a ring-expansion loop; choose
    radius ≳ a few × the CSR mean spacing so exclusions are border
    noise, and read the exclusion count before trusting R).

    Exactness: per-point NN distance is µ-quantized —
    ``floor(√d² · 10⁶)`` is one correctly-rounded IEEE √ + one
    rounded × + an exact floor (result < 2⁵³), bit-identical
    cross-engine — so ``sum_nn_micro``, the bbox area and the counts
    are exact longs; R and z are the one pinned double chain.

    Returns a single row ``(n_points, n_with_nn, area, sum_nn_micro,
    r_index, z_score)``.
    """
    from .cluster import grid_radius_join

    if radius < 1:
        raise ValueError("radius must be a positive integer")
    p = pts.select(F.col(id_col).alias("i"),
                   F.col(x_col).cast("long").alias("x"),
                   F.col(y_col).cast("long").alias("y"))
    c = p.select(F.col("i").alias("j"), "x", "y")
    nn = (grid_radius_join(p, c, radius, query_id="i",
                           corpus_id="j", x="x", y="y")
          .filter(F.col("i") != F.col("j"))
          .groupBy("i").agg(F.min("d2").alias("nn_d2")))
    nn_micro = F.floor(F.sqrt(F.col("nn_d2").cast("double"))
                       * F.lit(1_000_000.0)).cast("long")
    obs = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n_with_nn"),
        F.sum(nn_micro).alias("sum_nn_micro"))
    tot = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        ((F.max("x") - F.min("x"))
         * (F.max("y") - F.min("y"))).cast("long").alias("area"))
    j = tot.crossJoin(obs)
    n = F.col("n_points").cast("double")
    a = F.col("area").cast("double")
    d_obs = (F.col("sum_nn_micro").cast("double")
             / (F.col("n_with_nn").cast("double") * F.lit(1e6)))
    d_exp = F.lit(0.5) * F.sqrt(a / n)
    pi = F.lit(3.141592653589793)
    se = (F.sqrt((F.lit(4.0) - pi) / (F.lit(4.0) * pi))
          * F.sqrt(a) / n)
    return j.select(
        "n_points", "n_with_nn", "area", "sum_nn_micro",
        F.when(F.col("n_with_nn") > 0, d_obs / d_exp).alias("r_index"),
        F.when(F.col("n_with_nn") > 0,
               (d_obs - d_exp) / se).alias("z_score"))


def quadrat_test(pts: DataFrame, cell: int, *,
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Quadrat-count CSR test: tile the point pattern's bounding box
    into ``cell``-sized quadrats (EMPTY quadrats included — the
    classic statistic is over the full study frame) and report the
    variance-to-mean ratio with its χ² statistic
    (χ² = (N_q − 1)·VMR, df = N_q − 1): VMR ≈ 1 under CSR, > 1
    clustered, < 1 regular — the grid-census complement of the
    distance-based :func:`clark_evans`.

    Exactness: empty quadrats never materialize — with c the occupied
    counts, Σc = n and Σc² exact longs, and N_q the exact bbox grid
    size, VMR is the exact rational
    ``(N_q·Σc² − n²) / (n·(N_q − 1))`` — emitted as integer
    numerator/denominator (the value-hash substance) plus the pinned
    double VMR and χ².

    Scale shape: one map-side-combinable groupBy on the quadrat key +
    a single-row bbox aggregate — no joins, no pair work, hot cells
    are just big longs.

    Returns ``(n_points, n_quadrats, n_occupied, sum_c2, vmr_num,
    vmr_den, vmr, chi2)``.
    """
    from ..geo.tilemath import floor_div

    if cell < 1:
        raise ValueError("cell must be a positive integer")
    q = pts.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        floor_div(F.col(x_col).cast("long"), cell).alias("qx"),
        floor_div(F.col(y_col).cast("long"), cell).alias("qy"))
    occ = q.groupBy("qx", "qy").agg(F.count(F.lit(1)).alias("c"))
    sums = occ.agg(
        F.sum("c").cast("long").alias("n_points"),
        F.count(F.lit(1)).cast("long").alias("n_occupied"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"))
    ext = q.agg(
        (floor_div(F.max("x"), cell) - floor_div(F.min("x"), cell)
         + 1).alias("_nx"),
        (floor_div(F.max("y"), cell) - floor_div(F.min("y"), cell)
         + 1).alias("_ny"))
    j = sums.crossJoin(ext).withColumn(
        "n_quadrats", (F.col("_nx") * F.col("_ny")).cast("long"))
    num = (F.col("n_quadrats") * F.col("sum_c2")
           - F.col("n_points") * F.col("n_points"))
    den = F.col("n_points") * (F.col("n_quadrats") - 1)
    return j.select(
        "n_points", "n_quadrats", "n_occupied", "sum_c2",
        num.alias("vmr_num"), den.alias("vmr_den"),
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .alias("vmr"),
        F.when((den > 0) & (F.col("n_points") > 0),
               (F.col("n_quadrats") - 1).cast("double")
               * num.cast("double") / den.cast("double"))
        .alias("chi2"))


def rayleigh_test(steps: DataFrame, dx_col: str = "dx",
                  dy_col: str = "dy",
                  scale: int = 1_000_000) -> DataFrame:
    """Rayleigh test of directional uniformity over movement steps
    (Mardia & Jupp, Directional Statistics): mean resultant length
    R̄ = |Σ(cosθ, sinθ)|/n and z = n·R̄² — z large ⟹ headings share a
    preferred direction (the circular-statistics upgrade of
    heading_octants' 8-bin histogram: a continuous test, no binning).

    cosθ/sinθ never call atan2: they are dx/√d² and dy/√d², each
    µ-quantized per row (floor(·scale) — one correctly-rounded √, ÷,
    ×, floor: bit-stable cross-engine), so the component sums are
    exact longs; R̄ and z are the one pinned double chain (component
    squares run as doubles — their int64 squares would overflow past
    ~3 M steps).  Zero-length steps are dropped (no direction).

    One scan, one single-row aggregate — no joins, no windows.

    Returns ``(n_steps, sum_cos_micro, sum_sin_micro, rbar, z)``.
    """
    dx = F.col(dx_col).cast("long")
    dy = F.col(dy_col).cast("long")
    d2 = dx * dx + dy * dy
    base = steps.select(dx.alias("_dx"), dy.alias("_dy"),
                        d2.alias("_d2")).filter(F.col("_d2") > 0)
    q = lambda num: F.floor(  # noqa: E731
        num.cast("double") / F.sqrt(F.col("_d2").cast("double"))
        * F.lit(float(scale))).cast("long")
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum(q(F.col("_dx"))).cast("long").alias("sum_cos_micro"),
        F.sum(q(F.col("_dy"))).cast("long").alias("sum_sin_micro"))
    sc = F.col("sum_cos_micro").cast("double")
    ss = F.col("sum_sin_micro").cast("double")
    n = F.col("n_steps").cast("double")
    rbar = F.sqrt(sc * sc + ss * ss) / (n * F.lit(float(scale)))
    return (agg.withColumn("rbar", F.when(F.col("n_steps") > 0, rbar))
            .withColumn("z", F.when(F.col("n_steps") > 0,
                                    n * F.col("rbar") * F.col("rbar"))))


def location_quotient(df: DataFrame, cell_cols: "list[str]",
                      cat_col: str) -> DataFrame:
    """Location quotient per (cell, category): the regional-analysis
    concentration ratio LQ = (n_ck/n_c) / (N_k/N) — how over- or
    under-represented category k is in cell c relative to its global
    share (LQ > 1: local specialization; the classic economic-base
    screen, here over any categorical attribute on a spatial grid).

    Exactness: LQ = (n_ck·N) / (n_c·N_k) is held as exact long
    numerator/denominator (counts ≤ N keep n_ck·N inside int64 to
    N ≈ 3·10⁹) and emitted with ONE pinned divide.

    Scale shape: the observation-level groupBy(cell, cat) does map-side
    partial aggregation; cell totals ride a window partitioned by the
    SAME cell key (AQE keeps one exchange), category totals and the
    grand total are O(|categories|) broadcast joins — no second
    shuffle of the big side.

    Returns ``(cell..., cat, n_ck, n_c, n_k, n_tot, lq)``.
    """
    cell_cols = list(cell_cols)
    cc = (df.groupBy(*cell_cols, cat_col)
          .agg(F.count(F.lit(1)).alias("n_ck")))
    w_cell = Window.partitionBy(*cell_cols)
    cc = cc.withColumn("n_c", F.sum("n_ck").over(w_cell))
    kt = cc.groupBy(cat_col).agg(F.sum("n_ck").alias("n_k"))
    tot = kt.agg(F.sum("n_k").alias("n_tot"))
    out = (cc.join(F.broadcast(kt), cat_col)
           .crossJoin(F.broadcast(tot)))
    lq = F.when(
        (F.col("n_c") > 0) & (F.col("n_k") > 0),
        (F.col("n_ck") * F.col("n_tot")).cast("double")
        / (F.col("n_c") * F.col("n_k")).cast("double"))
    return out.select(*cell_cols, cat_col, "n_ck", "n_c", "n_k",
                      "n_tot", lq.alias("lq"))


def g_function(pts: DataFrame, radii: "list[int]", *,
               id_col: str = "i", x_col: str = "x",
               y_col: str = "y") -> DataFrame:
    """Diggle's G function (nearest-neighbour distance CDF) over a
    radius ladder: Ĝ(r) = #{points whose NN distance ≤ r} / n — the
    first-contact summary that pairs with ``ripley_k``'s second-moment
    view and ``clark_evans``'s one-number index.  Clustered patterns
    push Ĝ above the CSR curve G_csr(r) = 1 − exp(−λπr²) (λ = n/A on
    the bounding-box frame); regular patterns sit below it.

    Exactness: per-point NN d² comes from ONE eps-grid join bounded at
    r_max (the clark_evans substrate); every ladder rung compares that
    integer d² against the exact long r² — no √ anywhere in Ĝ, so
    ``n_le`` and ``n_points`` value-hash; ``g_hat`` is one divide and
    ``g_csr`` one pinned exp chain.  The r_max bound is EXACT for the
    ladder (a point whose NN lies beyond r_max contributes to no rung).

    Scale shape: one ×9-probe grid join + one min-per-point groupBy +
    an in-row stack unpivot — the whole ladder costs one join, the
    ripley_k discipline.

    Returns one row per radius ``(r, n_le, n_points, area, g_hat,
    g_csr)``.
    """
    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive integers")
    rmax = rs[-1]
    from .cluster import grid_radius_join

    p = (pts.select(F.col(id_col).alias("i"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"))
         .localCheckpoint(eager=False))
    c = p.select(F.col("i").alias("j"), "x", "y")
    nn = (grid_radius_join(p, c, rmax, query_id="i",
                           corpus_id="j", x="x", y="y")
          .filter(F.col("i") != F.col("j"))
          .groupBy("i").agg(F.min("d2").alias("nn_d2")))
    cnt = nn.agg(*[
        F.coalesce(F.sum(F.when(F.col("nn_d2") <= r * r, 1)
                         .otherwise(0)), F.lit(0))
        .cast("long").alias(f"_c{r}") for r in rs])
    stats = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        ((F.max("x") - F.min("x"))
         * (F.max("y") - F.min("y"))).cast("long").alias("area"))
    stack = F.expr("stack({}, {})".format(
        len(rs), ", ".join(f"bigint({r}), _c{r}" for r in rs))) \
        .alias("r", "n_le")
    lam = F.col("n_points").cast("double") / F.col("area").cast("double")
    pi = F.lit(3.141592653589793)
    g_csr = (F.lit(1.0)
             - F.exp(-(lam * pi * (F.col("r") * F.col("r"))
                       .cast("double"))))
    return (stats.crossJoin(cnt)
            .select("n_points", "area", stack)
            .select("r", "n_le", "n_points", "area",
                    F.when(F.col("n_points") > 0,
                           F.col("n_le").cast("double")
                           / F.col("n_points").cast("double"))
                    .alias("g_hat"),
                    F.when(F.col("area") > 0, g_csr).alias("g_csr")))


def dissimilarity_index(df: DataFrame, cell_cols: "list[str]",
                        flag_col: str) -> DataFrame:
    """Duncan & Duncan (1955) dissimilarity index between two
    populations over spatial cells: D = ½ Σ_i |a_i/A − b_i/B| — the
    share of either population that would have to relocate for the
    two distributions to match (0 = identical layout, 1 = total
    segregation).  The evenness summary that ``location_quotient``
    reads cell-by-cell, collapsed to one number.

    Exactness: with per-cell counts a_i, b_i and totals A, B (all
    exact longs from one groupBy),

        D = Σ_i |a_i·B − b_i·A|  /  (2·A·B)

    keeps the numerator ``d_num`` an exact long — value-hashable —
    and D one pinned divide.  |a_i·B − b_i·A| ≤ 2·A·B needs A·B <
    2⁶² : enforced in-plan with raise_error (A, B each < 2³¹ covers
    any single-frame census this engine would run; shard bigger
    populations by region first).

    Scale shape: one map-side-combinable groupBy to cells + one
    single-row fold — no joins, no windows.

    Returns a single row ``(n_cells, n_a, n_b, d_num, d_index)``;
    ``d_index`` NULL when either population is empty.
    """
    f = F.col(flag_col).cast("boolean")
    cells = (df.filter(f.isNotNull())
             .groupBy(*cell_cols)
             .agg(F.sum(F.when(f, 1).otherwise(0)).alias("_a"),
                  F.sum(F.when(~f, 1).otherwise(0)).alias("_b")))
    tot = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("_a").cast("long").alias("n_a"),
        F.sum("_b").cast("long").alias("n_b"))
    num = (cells.crossJoin(F.broadcast(tot))
           .select(
               "n_cells", "n_a", "n_b",
               F.abs(F.col("_a") * F.col("n_b")
                     - F.col("_b") * F.col("n_a")).alias("_t"))
           .groupBy("n_cells", "n_a", "n_b")
           .agg(F.sum("_t").cast("long").alias("d_num")))
    lim = F.lit(2_147_483_648)  # 2^31
    guard = F.when(
        (F.col("n_a") >= lim) | (F.col("n_b") >= lim),
        F.raise_error(F.lit(
            "dissimilarity_index: population exceeds the exact-int64 "
            "bound (2^31 rows per class) — shard by region first"))
        .cast("double"))
    d = guard.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("d_num").cast("double")
        / (F.lit(2.0) * F.col("n_a").cast("double")
           * F.col("n_b").cast("double")))
    return num.select("n_cells", "n_a", "n_b", "d_num",
                      d.alias("d_index"))


def cross_k(pts: DataFrame, radii: "list[int]", *,
            id_col: str = "i", x_col: str = "x", y_col: str = "y",
            kind_col: str = "kind") -> DataFrame:
    """Bivariate (cross) Ripley K between the two kinds present in
    ``kind_col``: K̂_ab(r) = A·pairs_ab(r)/(n_a·n_b) with pairs_ab the
    exact count of mixed-kind pairs at d² ≤ r² — "are B points
    clustered AROUND A points beyond what independence predicts?"
    (K above πr² = attraction, below = repulsion/segregation at scale
    r).  The continuous-distance companion of the categorical
    colocation_pairs / join_count_stats gates; input must carry
    EXACTLY two kinds (more kinds: filter first — enforced by the
    caller, mixed pairs are counted by kind inequality).

    Exactness and shape: identical to :func:`ripley_k` — one ×9-probe
    block join at r_max carries the WHOLE radius ladder (per-rung
    conditional integer sums), kinds ride the join as extra columns,
    counts/areas exact int64, ``k_hat`` one pinned double chain
    cnt·A/(n_a·n_b).  Study area = pooled bounding box (the frame
    every border correction starts from).

    Reference: Lotwick & Silverman (1982, JRSS-B) for the bivariate
    K; the one-join ladder is this engine's.

    Returns one row per radius ``(r, pair_cnt, n_a, n_b, area,
    k_hat)`` — n_a/n_b in ascending kind order.
    """
    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive integers")
    rmax = rs[-1]
    pts = pts.select(F.col(id_col), F.col(x_col), F.col(y_col),
                     F.col(kind_col)) \
        .localCheckpoint(eager=False)
    pairs = _blocked_pairs(pts, rmax, id_col, x_col, y_col,
                           extra_cols=(kind_col,))
    mixed = pairs.filter(F.col(f"l_{kind_col}") != F.col(f"r_{kind_col}"))
    cnt = mixed.agg(*[
        F.coalesce(F.sum(F.when(F.col("d2") <= r * r, 1).otherwise(0)),
                   F.lit(0))
        .cast("long").alias(f"_c{r}") for r in rs])
    per_kind = pts.groupBy(kind_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    kstats = per_kind.agg(
        F.count(F.lit(1)).alias("_nk"),
        F.min_by("_n", F.col(kind_col)).alias("_na"),
        F.max_by("_n", F.col(kind_col)).alias("_nb"))
    n_a = F.when(
        F.col("_nk") != 2,
        F.raise_error(F.concat(
            F.lit("cross_k: input must carry exactly 2 kinds, got "),
            F.col("_nk").cast("string"))).cast("long")
    ).otherwise(F.col("_na"))
    kstats = kstats.select(n_a.alias("n_a"), F.col("_nb").alias("n_b"))
    bbox = pts.agg(
        ((F.max(x_col) - F.min(x_col))
         * (F.max(y_col) - F.min(y_col))).cast("long").alias("area"))
    stack = F.expr("stack({}, {})".format(
        len(rs), ", ".join(f"bigint({r}), _c{r}" for r in rs))) \
        .alias("r", "pair_cnt")
    out = (kstats.crossJoin(bbox).crossJoin(cnt)
           .select("n_a", "n_b", "area", stack))
    k_hat = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("pair_cnt").cast("double") * F.col("area").cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double"))
    return out.select("r", "pair_cnt", "n_a", "n_b", "area",
                      k_hat.alias("k_hat"))


def lee_l(cells: DataFrame, x_col: str, y_col: str,
          a_col: str, b_col: str, queen: bool = True) -> DataFrame:
    """Lee's L — the BIVARIATE spatial association measure (Lee 2001,
    J. Geographical Systems): "are the spatial PATTERNS of two fields
    co-located?"  It integrates Pearson's r with a Moran-style spatial
    smoother: with binary neighbor weights and deviations x̃, ỹ,

        L = n/(Σᵢ kᵢ²) · Σᵢ (Σⱼ∈N(i) x̃ⱼ)(Σⱼ∈N(i) ỹⱼ)
                        / (√Σx̃² · √Σỹ²)

    — positive when the two fields' smoothed surfaces rise and fall
    together, the bivariate companion of the univariate morans_i /
    gearys_c gates on the same stencil.

    Exactness and determinism: deviations are the n-scaled exact longs
    z = n·v − S (the n² scale cancels between numerator and
    denominator); per-cell neighbor sums Uᵢ = Σ zxⱼ, Vᵢ = Σ zyⱼ and
    kᵢ are exact int64 from ONE stencil join; the three quadratic
    sums Σ Uᵢ·Vᵢ, Σ zx², Σ zy² exceed int64 and are therefore
    PINNED-ORDER folds of per-cell double products sorted by (x, y)
    (the autocorr discipline), while Σ kᵢ² stays an exact long.  L is
    one pinned double chain; NULL for a constant field.

    Shape: one totals broadcast, one ×|stencil| probe join keyed on
    the cell, one per-cell groupBy, one single-row reduce.  Duplicate
    (x, y) rows are a caller bug — aggregate first.

    Returns ONE row ``(n_cells, sum_k2, s_uv, s_xx, s_yy, lee_l)``.
    """
    offs = _QUEEN if queen else _ROOK
    base = cells.select(F.col(x_col).alias("x"),
                        F.col(y_col).alias("y"),
                        F.col(a_col).cast("long").alias("_va"),
                        F.col(b_col).cast("long").alias("_vb"))
    totals = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_va").alias("_sa"), F.sum("_vb").alias("_sb"))
    z = base.crossJoin(F.broadcast(totals)).select(
        "x", "y", "_n",
        (F.col("_n") * F.col("_va") - F.col("_sa")).alias("_zx"),
        (F.col("_n") * F.col("_vb") - F.col("_sb")).alias("_zy"))
    stencil = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])
    probes = (z.select("x", "y", F.explode(stencil).alias("o"))
              .select("x", "y",
                      (F.col("x") + F.col("o.dx")).alias("nx"),
                      (F.col("y") + F.col("o.dy")).alias("ny")))
    nbrs = z.select(F.col("x").alias("nx"), F.col("y").alias("ny"),
                    F.col("_zx").alias("_nzx"),
                    F.col("_zy").alias("_nzy"))
    per_cell = (probes.join(nbrs, ["nx", "ny"])
                .groupBy("x", "y")
                .agg(F.count(F.lit(1)).alias("_k"),
                     F.sum("_nzx").alias("_u"),
                     F.sum("_nzy").alias("_w")))
    uv_arr = F.sort_array(F.collect_list(F.struct(
        F.col("x"), F.col("y"),
        (F.col("_u").cast("double") * F.col("_w").cast("double"))
        .alias("p"))))
    cell_stats = per_cell.agg(
        F.sum(F.col("_k") * F.col("_k")).alias("sum_k2"),
        F.aggregate(uv_arr, F.lit(0.0),
                    lambda a, s: a + s["p"]).alias("s_uv"))
    sq = z.agg(
        F.max("_n").alias("n_cells"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                F.col("x"), F.col("y"),
                (F.col("_zx").cast("double") * F.col("_zx")
                 .cast("double")).alias("p")))),
            F.lit(0.0), lambda a, s: a + s["p"]).alias("s_xx"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                F.col("x"), F.col("y"),
                (F.col("_zy").cast("double") * F.col("_zy")
                 .cast("double")).alias("p")))),
            F.lit(0.0), lambda a, s: a + s["p"]).alias("s_yy"))
    out = sq.crossJoin(F.broadcast(cell_stats))
    lee = F.when(
        (F.col("s_xx") > 0.0) & (F.col("s_yy") > 0.0)
        & (F.col("sum_k2") > 0),
        F.col("n_cells").cast("double") * F.col("s_uv")
        / (F.col("sum_k2").cast("double")
           * F.sqrt(F.col("s_xx")) * F.sqrt(F.col("s_yy"))))
    return out.select("n_cells", "sum_k2", "s_uv", "s_xx", "s_yy",
                      lee.alias("lee_l"))


_FFN_MAX_AXIS = 3000


def f_function(pts: DataFrame, radii: "list[int]", *, step: int,
               id_col: str = "i", x_col: str = "x",
               y_col: str = "y") -> DataFrame:
    """The empty-space F function (point-to-nearest-event CDF) over a
    radius ladder: F̂(r) = #{probe locations whose nearest data point
    is ≤ r away} / m — the third leg of the classical point-pattern
    triad beside :func:`g_function` (event-to-event) and
    :func:`ripley_k` (second moment).  CLUSTERED patterns leave more
    empty space, pushing F̂ BELOW the CSR curve 1 − exp(−λπr²) — the
    mirror image of G's behaviour, which is what makes the G/F pair
    (and their J = (1−G)/(1−F) ratio, computable from these outputs)
    diagnostic.

    Probe design: the classical estimator samples random locations;
    this engine uses the DETERMINISTIC lattice of pitch ``step`` over
    the data bounding box (systematic sampling — unbiased for a
    stationary process, reproducible cross-engine).  The lattice is
    generated IN-PLAN from the bbox row (two sequence explodes — no
    driver collect); ≤ 3000 lattice columns/rows per axis enforced by
    raise_error (choose ``step`` accordingly).

    Exactness: probe NN d² from ONE r_max grid join (probes that see
    no point within r_max simply contribute to no rung — exact for
    the ladder); every rung compares integer d² to the exact r²; the
    denominator m = nx·ny counts the FULL lattice (not just matched
    probes); ``f_csr`` is the same pinned λπr² exp chain as G's.

    Returns one row per radius ``(r, n_le, n_probes, n_points, area,
    f_hat, f_csr)``.
    """
    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive integers")
    if step <= 0:
        raise ValueError("step must be a positive integer")
    rmax = rs[-1]
    from ..geo.tilemath import floor_div
    from .cluster import grid_radius_join

    p = (pts.select(F.col(id_col).alias("j"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"))
         .localCheckpoint(eager=False))
    nx = floor_div(F.col("_x1") - F.col("_x0"), step) + 1
    ny = floor_div(F.col("_y1") - F.col("_y0"), step) + 1
    bbox = p.agg(F.min("x").alias("_x0"), F.max("x").alias("_x1"),
                 F.min("y").alias("_y0"), F.max("y").alias("_y1"),
                 F.count(F.lit(1)).cast("long").alias("n_points"))
    # the axis guard is threaded through the sequence ENDPOINTS so it
    # fires before any oversized lattice can materialize
    guard = F.when(
        (nx > _FFN_MAX_AXIS) | (ny > _FFN_MAX_AXIS),
        F.raise_error(F.concat(
            F.lit(f"f_function: lattice axis exceeds "
                  f"{_FFN_MAX_AXIS} cells (raise step): "),
            F.greatest(nx, ny).cast("string"))).cast("long"))
    bbox = bbox.select(
        "_x0", "_y0",
        guard.otherwise(F.col("_x1")).alias("_x1"),
        guard.otherwise(F.col("_y1")).alias("_y1"),
        "n_points",
        guard.otherwise(nx * ny).alias("n_probes"),
        ((F.col("_x1") - F.col("_x0"))
         * (F.col("_y1") - F.col("_y0"))).cast("long").alias("area"))
    probes = (bbox.select(
        "_x0", "_y0", "_y1",
        F.explode(F.sequence(F.col("_x0"), F.col("_x1"),
                             F.lit(int(step)))).alias("px"))
        .select("_x0", "_y0",
                "px", F.explode(F.sequence(F.col("_y0"), F.col("_y1"),
                                           F.lit(int(step)))).alias("py"))
        .select((floor_div(F.col("px") - F.col("_x0"), step)
                 * (_FFN_MAX_AXIS + 1)
                 + floor_div(F.col("py") - F.col("_y0"), step))
                .alias("q"),
                F.col("px").alias("x"), F.col("py").alias("y")))
    nn = (grid_radius_join(probes, p, rmax, query_id="q",
                           corpus_id="j", x="x", y="y")
          .groupBy("q").agg(F.min("d2").alias("nn_d2")))
    cnt = nn.agg(*[
        F.coalesce(F.sum(F.when(F.col("nn_d2") <= r * r, 1)
                         .otherwise(0)), F.lit(0))
        .cast("long").alias(f"_c{r}") for r in rs])
    stack = F.expr("stack({}, {})".format(
        len(rs), ", ".join(f"bigint({r}), _c{r}" for r in rs))) \
        .alias("r", "n_le")
    out = (bbox.select("n_probes", "n_points", "area")
           .crossJoin(cnt).select("n_probes", "n_points", "area", stack))
    lam = F.col("n_points").cast("double") / F.col("area").cast("double")
    pi = F.lit(3.141592653589793)
    f_csr = (F.lit(1.0)
             - F.exp(-(lam * pi * (F.col("r") * F.col("r"))
                       .cast("double"))))
    return out.select(
        "r", "n_le", "n_probes", "n_points", "area",
        F.when(F.col("n_probes") > 0,
               F.col("n_le").cast("double")
               / F.col("n_probes").cast("double")).alias("f_hat"),
        F.when(F.col("area") > 0, f_csr).alias("f_csr"))


def hopkins_statistic(pts: DataFrame, *, step: int, rmax: int,
                      sample_mod: int = 1, id_col: str = "i",
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Hopkins clustering-tendency statistic (Hopkins & Skellam 1954):
    compare nearest-data-point distances seen from UNIFORM probe
    locations (U) against those seen from the data points themselves
    (W) — ``H = U/(U+W)`` sits near 1/2 for complete spatial
    randomness, → 1 for clustered data (probes land in empty space),
    → 0 for super-uniform/regular patterns.  The "should I even run a
    clusterer?" pre-check for dbscan/kmeans_integer.

    Determinism and exactness: probes are the f_function lattice of
    pitch ``step`` (in-plan, no RNG, no collect); the data side uses
    the deterministic ``id % sample_mod == 0`` subsample; both NN
    searches are ONE r_max grid join each with exact integer d², and
    distances are CENSORED at ``rmax²`` (a location with no neighbor
    within r_max contributes exactly rmax² — documented deviation
    from the unbounded textbook form, which a blocked join cannot
    provide; pick rmax ≫ the typical spacing and the censoring is
    idle).  U and W are exact int64 sums (bound: count·rmax² < 2⁶³ —
    ANSI overflow fails loudly), and H is ONE pinned division.

    Returns ONE row ``(n_points, n_sample, n_probes, u_sum, w_sum,
    hopkins)``.
    """
    if step <= 0 or rmax <= 0 or sample_mod <= 0:
        raise ValueError("step, rmax, sample_mod must be positive")
    from ..geo.tilemath import floor_div
    from .cluster import grid_radius_join

    p = (pts.select(F.col(id_col).alias("j"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"))
         .localCheckpoint(eager=False))
    cap = F.lit(int(rmax) * int(rmax)).cast("long")

    nx = floor_div(F.col("_x1") - F.col("_x0"), step) + 1
    ny = floor_div(F.col("_y1") - F.col("_y0"), step) + 1
    bbox = p.agg(F.min("x").alias("_x0"), F.max("x").alias("_x1"),
                 F.min("y").alias("_y0"), F.max("y").alias("_y1"),
                 F.count(F.lit(1)).cast("long").alias("n_points"))
    guard = F.when(
        (nx > _FFN_MAX_AXIS) | (ny > _FFN_MAX_AXIS),
        F.raise_error(F.concat(
            F.lit(f"hopkins_statistic: lattice axis exceeds "
                  f"{_FFN_MAX_AXIS} cells (raise step): "),
            F.greatest(nx, ny).cast("string"))).cast("long"))
    bbox = bbox.select(
        "_x0", "_y0", guard.otherwise(F.col("_x1")).alias("_x1"),
        guard.otherwise(F.col("_y1")).alias("_y1"), "n_points",
        guard.otherwise(nx * ny).alias("n_probes"))
    probes = (bbox.select(
        "_x0", "_y0", "_y1",
        F.explode(F.sequence(F.col("_x0"), F.col("_x1"),
                             F.lit(int(step)))).alias("px"))
        .select("_x0", "_y0", "px",
                F.explode(F.sequence(F.col("_y0"), F.col("_y1"),
                                     F.lit(int(step)))).alias("py"))
        .select((floor_div(F.col("px") - F.col("_x0"), step)
                 * (_FFN_MAX_AXIS + 1)
                 + floor_div(F.col("py") - F.col("_y0"), step))
                .alias("q"),
                F.col("px").alias("x"), F.col("py").alias("y")))
    u_nn = (grid_radius_join(probes, p, rmax, query_id="q",
                             corpus_id="j", x="x", y="y")
            .groupBy("q").agg(F.min("d2").alias("nn_d2")))
    u_row = (probes.join(u_nn, "q", "left")
             .agg(F.sum(F.least(F.coalesce(F.col("nn_d2"), cap), cap))
                  .cast("long").alias("u_sum")))
    sample = p.filter(F.pmod(F.col("j"), F.lit(int(sample_mod))) == 0) \
        .select(F.col("j").alias("q"), "x", "y")
    w_nn = (grid_radius_join(sample, p, rmax, query_id="q",
                             corpus_id="j", x="x", y="y")
            .filter(F.col("q") != F.col("j"))
            .groupBy("q").agg(F.min("d2").alias("nn_d2")))
    w_row = (sample.join(w_nn, "q", "left")
             .agg(F.count(F.lit(1)).cast("long").alias("n_sample"),
                  F.sum(F.least(F.coalesce(F.col("nn_d2"), cap), cap))
                  .cast("long").alias("w_sum")))
    out = (bbox.select("n_points", "n_probes")
           .crossJoin(u_row).crossJoin(w_row))
    h = F.when(
        F.col("u_sum") + F.col("w_sum") > 0,
        F.col("u_sum").cast("double")
        / (F.col("u_sum") + F.col("w_sum")).cast("double"))
    return out.select("n_points", "n_sample", "n_probes",
                      "u_sum", "w_sum", h.alias("hopkins"))


def j_function(pts: DataFrame, radii: "list[int]", *, step: int,
               id_col: str = "i", x_col: str = "x",
               y_col: str = "y") -> DataFrame:
    """The J function — van Lieshout & Baddeley's (1996) combined
    point-pattern summary ``J(r) = (1 − G(r)) / (1 − F(r))``: J ≡ 1
    under CSR WITHOUT needing the intensity or an edge correction
    (the λπr² terms cancel), J < 1 = clustered, J > 1 = regular —
    the single most interpretable curve of the G/F/K family.

    Pure composition of this engine's :func:`g_function`
    (event-to-event NN CDF) and :func:`f_function` (lattice
    empty-space CDF) joined on the shared radius ladder: both inputs
    are exact-count ratios, J is one more pinned division, NULL where
    F̂(r) = 1 (no empty space left at that radius).

    Returns one row per radius ``(r, g_hat, f_hat, j_hat)``.
    """
    g = g_function(pts, radii, id_col=id_col, x_col=x_col,
                   y_col=y_col).select("r", "g_hat")
    f = f_function(pts, radii, step=step, id_col=id_col, x_col=x_col,
                   y_col=y_col).select("r", "f_hat")
    j = g.join(f, "r")
    jh = F.when(
        F.col("f_hat") < 1.0,
        (F.lit(1.0) - F.col("g_hat")) / (F.lit(1.0) - F.col("f_hat")))
    return j.select("r", "g_hat", "f_hat", jh.alias("j_hat"))


_SCAN_MAX_N = 2_000_000_000


def scan_statistic(df: DataFrame, cell_col: str, tick_col: str, *,
                   window_lens: "tuple[int, ...]" = (1, 2, 4),
                   k: int = 25) -> DataFrame:
    """Kulldorff space-time scan statistic on a discrete grid
    (Kulldorff 1997; the space-time permutation form of Kulldorff et
    al. 2005): scan every (cell, time window) cylinder for event
    excess over the independence expectation E = n_cell·n_window/N,
    scoring each zone with the Poisson log-likelihood ratio

        LLR = n·ln(n/E) + (N−n)·ln((N−n)/(N−E))   for n > E, else 0

    — THE outbreak/emerging-hotspot detector (disease surveillance,
    crime spikes, fraud bursts), upgrading getis_ord_gi (pure space)
    and mann_kendall_cells (pure trend) to joint space-time zones.

    Determinism and exactness: cells and ticks are caller-quantized
    integers (tile/hex × day); every count is an exact long; both ln
    arguments are ratios of exact int64 products —
    ``n·N/(n_c·n_w)`` and ``N·(N−n)/(N² − n_c·n_w)`` — so the double
    chain is engine-identical; ``N ≤ 2·10⁹`` is enforced in-plan
    (raise_error) to keep N² inside int64.  Candidate anchors are the
    OBSERVED (cell, tick) pairs (a cylinder anchored on an empty tick
    is dominated or differs only by baseline — the standard discrete
    restriction); the top-k ranking breaks LLR ties by (cell, t0, w).

    Shape: one groupBy to the (cell, tick) grid — the only event-sized
    shuffle — then per-cell RANGE windows for each window length, one
    broadcast of the per-tick totals, one TakeOrderedAndProject.

    Returns ``(cell, t0, w, n, n_c, n_w, llr, rank)`` — the k highest
    scoring cylinders.
    """
    if k < 1 or not window_lens or min(window_lens) < 1:
        raise ValueError("k and window_lens must be positive")
    cell = F.col(cell_col)
    tick = F.col(tick_col).cast("long")
    g = (df.filter(cell.isNotNull() & tick.isNotNull())
         .groupBy(cell.alias("cell"), tick.alias("t"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    g = g.localCheckpoint(eager=False)
    per_tick = (g.groupBy("t").agg(F.sum("cnt").alias("tot")))
    tot_row = per_tick.agg(F.sum("tot").cast("long").alias("n_tot"))
    n_guard = F.when(
        F.col("n_tot") > _SCAN_MAX_N,
        F.raise_error(F.concat(
            F.lit(f"scan_statistic: N exceeds int64-safe bound "
                  f"({_SCAN_MAX_N}): "),
            F.col("n_tot").cast("string"))).cast("long")
    ).otherwise(F.col("n_tot"))
    tot_row = tot_row.select(n_guard.alias("n_tot"))
    n_c = (g.groupBy("cell").agg(F.sum("cnt").cast("long")
                                 .alias("n_c")))
    zones = None
    for w in sorted(set(int(x) for x in window_lens)):
        wc = (Window.partitionBy("cell").orderBy("t")
              .rangeBetween(0, w - 1))
        wt = Window.orderBy("t").rangeBetween(0, w - 1)
        z = g.select(
            "cell", F.col("t").alias("t0"),
            F.lit(w).cast("int").alias("w"),
            F.sum("cnt").over(wc).cast("long").alias("n"))
        tw = per_tick.select(
            "t", F.sum("tot").over(wt).cast("long").alias("n_w"))
        z = z.join(tw, z["t0"] == tw["t"]).drop("t")
        zones = z if zones is None else zones.unionByName(z)
    zz = (zones.join(F.broadcast(n_c), "cell")
          .crossJoin(F.broadcast(tot_row)))
    n, nn = F.col("n"), F.col("n_tot")
    prod = F.col("n_c") * F.col("n_w")
    t1 = n.cast("double") * F.log((n * nn).cast("double")
                                  / prod.cast("double"))
    t2 = F.when(
        nn > n,
        (nn - n).cast("double")
        * F.log((nn * (nn - n)).cast("double")
                / (nn * nn - prod).cast("double"))
    ).otherwise(F.lit(0.0))
    llr = F.when(n * nn > prod, t1 + t2).otherwise(F.lit(0.0))
    scored = zz.select("cell", "t0", "w", "n", "n_c", "n_w",
                       llr.alias("llr"))
    wr = Window.orderBy(F.col("llr").desc(), F.col("cell").asc(),
                        F.col("t0").asc(), F.col("w").asc())
    return (scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k))


def semivariogram(pts: DataFrame, radii: "list[int]", *,
                  id_col: str = "i", x_col: str = "x",
                  y_col: str = "y", value_col: str = "v",
                  by_octant: bool = False) -> DataFrame:
    """Empirical semivariogram over a distance-bin ladder — THE
    geostatistics primitive (Matheron 1963): γ(h) = Σ(vᵢ−vⱼ)²/(2·|P_h|)
    over point pairs whose separation falls in bin h.  Rising γ that
    sills out = spatial autocorrelation with a range; flat γ = no
    structure — the diagnostic behind kriging, sensor-network QA, and
    "how far does this field correlate".  ``by_octant=True`` splits
    each bin by the pair's direction octant (0-3; diametric pairs
    share an octant) — the anisotropy check.

    Exactness: ONE ×9-probe block join at r_max (the ripley_k
    discipline, coordinates riding as extra columns) carries every
    bin: each unordered pair lands in
    exactly one d² rung (exact integer comparisons against the r²
    ladder), (Δv)² sums are exact int64 (integer values — quantize
    upstream; bound |Δv|²·pairs < 2⁶³), and γ is ONE pinned division
    per bin.  Octants come from integer |dx|/|dy| comparisons — no
    atan2, no floats.

    Returns one row per occupied (r_lo, r_hi(, octant)) bin:
    ``(r_lo, r_hi[, octant], n_pairs, sq_sum, gamma)``.
    """
    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive integers")
    rmax = rs[-1]
    p = pts.select(F.col(id_col).alias("i"),
                   F.col(x_col).cast("long").alias("x"),
                   F.col(y_col).cast("long").alias("y"),
                   F.col(value_col).cast("long").alias("v"))
    pairs = _blocked_pairs(p, rmax, "i", "x", "y",
                           extra_cols=("v", "x", "y"))
    edges = [0] + rs
    expr = None
    for lo, hi in zip(edges, edges[1:]):
        cond = (F.col("d2") > lo * lo) & (F.col("d2") <= hi * hi)
        val = F.struct(F.lit(lo).cast("long").alias("lo"),
                       F.lit(hi).cast("long").alias("hi"))
        expr = F.when(cond, val) if expr is None else \
            expr.when(cond, val)
    tagged = pairs.withColumn("_bin", expr).filter(
        F.col("_bin").isNotNull())
    dv = (F.col("l_v") - F.col("r_v"))
    keys = [F.col("_bin.lo").alias("r_lo"),
            F.col("_bin.hi").alias("r_hi")]
    if by_octant:
        adx = F.abs(F.col("l_x") - F.col("r_x"))
        ady = F.abs(F.col("l_y") - F.col("r_y"))
        sme = (F.col("l_x") - F.col("r_x")) \
            * (F.col("l_y") - F.col("r_y")) >= 0
        octant = (F.when((adx >= ady) & sme, 0)
                  .when((adx < ady) & sme, 1)
                  .when((adx < ady) & ~sme, 2)
                  .otherwise(3)).cast("int")
        keys.append(octant.alias("octant"))
    agg = (tagged.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(dv * dv).cast("long").alias("sq_sum")))
    gamma = (F.col("sq_sum").cast("double")
             / (2 * F.col("n_pairs")).cast("double"))
    return agg.withColumn("gamma", gamma)


def idw_interpolate(queries: DataFrame, corpus: DataFrame,
                    radius: int, *, query_id: str = "q",
                    corpus_id: str = "j", x_col: str = "x",
                    y_col: str = "y", value_col: str = "v"
                    ) -> DataFrame:
    """Inverse-distance-weighted interpolation (Shepard 1968, p = 2) —
    the classic "value at an unsampled location" estimator behind
    precipitation maps, sensor in-fill, and price surfaces:

        ŷ(q) = Σ_j v_j/d²_qj / Σ_j 1/d²_qj     over d ≤ radius

    with the standard exact-hit rule: if any sample COINCIDES with
    the query (d² = 0), ŷ is the mean of the coincident samples
    (an exact integer ratio) and no division by zero ever happens.

    Determinism: candidate pairs come from ONE bounded grid join
    (grid_radius_join — ×9 probe, exact integer d²); each weight
    1/d² and weighted value v/d² is a pinned double from exact int64
    inputs, and both Σs are PINNED corpus-id-ordered in-row folds
    (the entropy_profile discipline); ŷ is one division.  Queries
    with no sample inside ``radius`` drop out (no made-up value —
    widen the radius deliberately).

    Shape: one cell-keyed join + one per-query groupBy; per-query
    candidate lists are radius-bounded.

    Returns ``(q, n_samples, n_exact, y_hat)``.
    """
    from .cluster import grid_radius_join

    qdf = queries.select(F.col(query_id).alias("q"),
                         F.col(x_col).cast("long").alias("x"),
                         F.col(y_col).cast("long").alias("y"))
    c = corpus.select(F.col(corpus_id).alias("j"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"),
                      F.col(value_col).cast("long").alias("v"))
    j = grid_radius_join(qdf, c.select("j", "x", "y"), radius,
                         query_id="q", corpus_id="j", x="x", y="y")
    j = j.join(c.select("j", "v"), "j")
    wnum = F.when(F.col("d2") > 0,
                  F.col("v").cast("double")
                  / F.col("d2").cast("double")).otherwise(F.lit(0.0))
    wden = F.when(F.col("d2") > 0,
                  F.lit(1.0) / F.col("d2").cast("double"))
    wden = F.coalesce(wden, F.lit(0.0))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("j"),
        wnum.alias("wn"), wden.alias("wd"),
        (F.col("d2") == 0).cast("long").alias("ex"),
        F.when(F.col("d2") == 0, F.col("v")).otherwise(F.lit(0))
        .cast("long").alias("ev"))))
    per = j.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        arr.alias("_a"))
    s_wn = F.aggregate(F.col("_a"), F.lit(0.0),
                       lambda a, s_: a + s_["wn"])
    s_wd = F.aggregate(F.col("_a"), F.lit(0.0),
                       lambda a, s_: a + s_["wd"])
    s_ex = F.aggregate(F.col("_a"), F.lit(0).cast("long"),
                       lambda a, s_: a + s_["ex"])
    s_ev = F.aggregate(F.col("_a"), F.lit(0).cast("long"),
                       lambda a, s_: a + s_["ev"])
    y = F.when(s_ex > 0,
               s_ev.cast("double") / s_ex.cast("double")) \
        .otherwise(s_wn / s_wd)
    return per.select("q", "n_samples", s_ex.alias("n_exact"),
                      y.alias("y_hat"))
