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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rfm_scores", "markov_transitions", "trend_slope"]


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
