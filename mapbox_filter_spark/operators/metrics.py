"""Ranking-quality metrics: tie-corrected AUC and nDCG@k.

Model-evaluation primitives for the pipeline's scoring stages (quality
classifiers, retrieval rankers), built on the exactness discipline:

- ``auc_score`` is the Mann–Whitney U form of ROC-AUC with the
  standard average-rank tie correction, carried ENTIRELY in integers
  (``2U`` is an exact int64) with one pinned division — no pairwise
  join, no float rank sums.
- ``ndcg_at_k`` quantizes the 1/log2(rank+1) gain weights to scaled
  integer LITERALS computed once in python (both engines receive the
  identical table), so DCG/IDCG are order-independent integer sums and
  nDCG is one pinned division.  Quantization error ≤ k/scale — the
  documented contract, the zipf/LOF carry recipe.

Both are window/groupBy shapes on the (group | query) key — one
exchange each, no quadratic stage.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NDCG_SCALE = 10 ** 12


def auc_score(df: DataFrame, group_cols: Sequence[str], score_col: str,
              label_col: str) -> DataFrame:
    """ROC-AUC per group via the rank-sum (Mann–Whitney U) identity
    with average-rank tie correction:

        2U = Σ_{i: pos} (2·rank_lo_i + ties_i − 1) − n_pos·(n_pos + 1)
        AUC = 2U / (2·n_pos·n_neg)

    ``rank_lo`` is SQL ``RANK()`` by score ascending and ``ties`` the
    per-(group, score) row count, so 2U is an exact int64 (bound:
    n² < 2^63 ⇔ n < 3·10⁹ rows per group).  ``label_col`` must be
    0/1; scores integer.  NULL AUC for degenerate groups (a single
    class).  One window + one groupBy on the group key.  Returns
    ``(group..., n_pos, n_neg, u2, auc)``."""
    g = list(group_cols)
    lab = F.col(label_col).cast("long")
    s = F.col(score_col).cast("long")
    w = Window.partitionBy(*g).orderBy(F.col("_s").asc())
    ranked = df.select(*g, s.alias("_s"), lab.alias("_y")) \
        .withColumn("_rlo", F.rank().over(w)) \
        .withColumn("_ties", F.count(F.lit(1)).over(
            Window.partitionBy(*g, "_s")))
    agg = ranked.groupBy(*g).agg(
        F.sum("_y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).alias("n_neg"),
        F.sum(F.when(F.col("_y") == 1,
                     2 * F.col("_rlo") + F.col("_ties") - 1)
              .otherwise(0)).alias("_rsum2"))
    u2 = F.col("_rsum2") - F.col("n_pos") * (F.col("n_pos") + 1)
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        u2.cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"))
    return agg.select(*g, "n_pos", "n_neg", u2.alias("u2"),
                      auc.alias("auc"))


def ndcg_gain_weights(k: int, scale: int = NDCG_SCALE) -> "list[int]":
    """The scaled integer gain table ``round(scale / log2(r + 1))`` for
    ranks 1..k — computed ONCE in python so both engines consume the
    identical literals."""
    return [round(scale / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_at_k(ranking: DataFrame, k: int, *,
              query_id: str = "q_id", rank_col: str = "rank",
              rel_col: str = "rel",
              n_rel_col: str = "n_rel") -> DataFrame:
    """nDCG@k over a per-query ranking: ``ranking`` carries one row per
    (query, rank ≤ k) with binary relevance ``rel_col`` and the query's
    TOTAL relevant-document count ``n_rel_col`` (for the ideal DCG —
    all relevant docs ranked first).  Gains are the integer literal
    table from :func:`ndcg_gain_weights`, so DCG/IDCG are exact integer
    sums and nDCG is ONE pinned division; queries with no relevant
    documents get NULL.  Returns ``(query, dcg_s, idcg_s, ndcg)``
    (``_s`` = scaled by NDCG_SCALE)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    weights = ndcg_gain_weights(k)
    warr = F.array(*[F.lit(w).cast("long") for w in weights])
    gain = F.element_at(warr, F.col(rank_col).cast("int"))
    dcg = (ranking.filter(F.col(rank_col) <= k)
           .groupBy(query_id)
           .agg(F.sum(F.when(F.col(rel_col).cast("long") == 1, gain)
                      .otherwise(0)).alias("dcg_s"),
                F.max(F.col(n_rel_col).cast("long")).alias("_nrel")))
    # ideal DCG: prefix sum of the weight table up to min(k, n_rel) —
    # an in-row fold over the same literals
    idcg = F.aggregate(
        F.slice(warr, 1, F.greatest(
            F.least(F.col("_nrel"), F.lit(k)), F.lit(0)).cast("int")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    out = dcg.withColumn("idcg_s", idcg)
    ndcg = F.when(F.col("idcg_s") > 0,
                  F.col("dcg_s").cast("double")
                  / F.col("idcg_s").cast("double"))
    return out.select(query_id, "dcg_s", "idcg_s", ndcg.alias("ndcg"))


def map_mrr_at_k(ranking: DataFrame, k: int, *,
                 query_id: str = "q_id", rank_col: str = "rank",
                 rel_col: str = "rel") -> DataFrame:
    """MAP@k and MRR@k over a per-query ranking — the other two
    standard retrieval-eval numbers next to nDCG, carried as ONE exact
    integer aggregate: with L = lcm(1..k), precision contributions
    cumrel_r·(L/r) and reciprocal ranks L/r are exact integers, so the
    corpus totals are exact int64 sums and each metric is one pinned
    division.  AP is the k-NORMALIZED variant (denominator k, not
    min(k, R) — documented choice: it keeps the corpus aggregate an
    exact integer ratio instead of an order-dependent double sum).

    ``ranking``: one row per (query, rank ≤ k) with binary ``rel``;
    ranks must be unique within a query (a top-k output).  Queries
    with no relevant document contribute 0 to both sums.  One window +
    two groupBys on the query key.  Returns a single row
    ``(n_q, sum_ap_l, sum_rr_l, map_at_k, mrr_at_k)`` (``_l`` = scaled
    by L·k and L respectively)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    L = math.lcm(*range(1, k + 1))
    warr = F.array(*[F.lit(L // r).cast("long") for r in range(1, k + 1)])
    w = (Window.partitionBy(query_id).orderBy(rank_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rel = F.col(rel_col).cast("long")
    r = (ranking.filter(F.col(rank_col) <= k)
         .withColumn("_cum", F.sum(rel).over(w))
         .withColumn("_w", F.element_at(warr, F.col(rank_col)
                                        .cast("int"))))
    per_q = r.groupBy(query_id).agg(
        F.sum(F.when(rel == 1, F.col("_cum") * F.col("_w"))
              .otherwise(F.lit(0).cast("long"))).alias("_ap_l"),
        F.max(F.when(rel == 1, F.col("_w"))
              .otherwise(F.lit(0).cast("long"))).alias("_rr_l"))
    tot = per_q.agg(
        F.count(F.lit(1)).alias("n_q"),
        F.sum("_ap_l").alias("sum_ap_l"),
        F.sum("_rr_l").alias("sum_rr_l"))
    nq = F.col("n_q")
    mp = F.when(nq > 0, F.col("sum_ap_l").cast("double")
                / (nq * L * k).cast("double"))
    mrr = F.when(nq > 0, F.col("sum_rr_l").cast("double")
                 / (nq * L).cast("double"))
    return tot.select("n_q", "sum_ap_l", "sum_rr_l",
                      mp.alias("map_at_k"), mrr.alias("mrr_at_k"))


def pr_curve(df: DataFrame, group_cols: Sequence[str], score_col: str,
             label_col: str) -> DataFrame:
    """Precision-recall curve per group: one row per DISTINCT score
    threshold t (descending), with the confusion counts of the
    classifier "predict positive iff score >= t" — the
    threshold-sweep companion of ``auc_score`` (AUC summarizes the
    ranking; the curve says where to cut it).

    Exactness: the data collapses to one row per (group, score) with
    exact positive/negative counts; tp/fp are RANGE-frame cumulative
    sums ordered by score DESC (ties share one threshold row — the
    default RANGE frame includes all peers, identical in both
    engines); precision, recall and F1 are each ONE pinned division
    over exact longs (F1 = 2·tp / (2·tp + fp + fn) — a single exact
    rational, not a harmonic-mean float chain).

    Scale shape: one map-side-combinable groupBy to the (group,
    score) aggregate, then windows over that SMALL table — cost is
    O(distinct scores), not O(rows).  Bucket the score upstream if
    its cardinality approaches the row count.

    Returns ``(group..., threshold, tp, fp, fn, precision, recall,
    f1)``.  ``label_col`` must be 0/1; scores integer.
    """
    g = list(group_cols)
    lab = F.col(label_col).cast("long")
    pts = df.groupBy(*g, F.col(score_col).cast("long")
                     .alias("threshold")).agg(
        F.sum(lab).alias("_p"),
        (F.count(F.lit(1)) - F.sum(lab)).alias("_n"))
    w = Window.partitionBy(*g).orderBy(F.col("threshold").desc())
    wg = Window.partitionBy(*g)
    cur = (pts.withColumn("tp", F.sum("_p").over(w))
           .withColumn("fp", F.sum("_n").over(w))
           .withColumn("_pos", F.sum("_p").over(wg)))
    tp, fp = F.col("tp"), F.col("fp")
    fn = F.col("_pos") - tp
    return cur.select(
        *g, "threshold", "tp", "fp", fn.alias("fn"),
        F.when(tp + fp > 0, tp.cast("double")
               / (tp + fp).cast("double")).alias("precision"),
        F.when(F.col("_pos") > 0, tp.cast("double")
               / F.col("_pos").cast("double")).alias("recall"),
        F.when(2 * tp + fp + fn > 0, (2 * tp).cast("double")
               / (2 * tp + fp + fn).cast("double")).alias("f1"))


def err_at_k(ranking: DataFrame, k: int, *, g_max: int,
             query_id: str = "q_id", rank_col: str = "rank",
             grade_col: str = "grade") -> DataFrame:
    """ERR@k — Expected Reciprocal Rank over a GRADED per-query ranking
    (Chapelle et al. 2009, CIKM): the cascade-model metric
    ``Σ_r (1/r)·R_r·Π_{s<r}(1−R_s)`` with stop probability
    ``R_r = (2^{g_r} − 1)/2^{g_max}`` — rewards putting the first
    satisfying document early, discounts everything behind an already
    satisfying one; the graded companion of :func:`map_mrr_at_k`.

    EXACT integer evaluation: multiplying by ``L·D^k`` (L = lcm(1..k),
    D = 2^{g_max}) turns every term into

        term_r = (L/r) · num_r · Π_{s<r}(D − num_s) · D^{k−r}

    with ``num_r = 2^{g_r} − 1`` — all int64 (each term ≤ L·D^k;
    feasibility of ``k·L·D^{k+1} < 2^62`` is checked at build time, a
    too-deep ladder raises immediately).  The prefix product rides an
    ascending-rank IN-ROW fold over the collected top-k list (≤ k
    structs per query), so ``err_s = Σ term_r`` is exact and
    ``err = err_s/(L·D^k)`` is ONE pinned division.  Grades outside
    [0, g_max] raise in-plan.

    Shape: one groupBy on the query key, the fold in-row — no windows
    over the corpus, no Python.  Ranks must be unique per query (a
    top-k output); rows with rank > k are ignored.

    Returns ``(query_id, err_s, err)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if g_max < 1:
        raise ValueError("g_max must be >= 1")
    L = math.lcm(*range(1, k + 1))
    D = 1 << g_max
    if k * L * (D ** (k + 1)) >= (1 << 62):
        raise ValueError(
            f"err_at_k: k={k}, g_max={g_max} overflows the exact int64 "
            f"chain (need k*lcm(1..k)*2^(g_max*(k+1)) < 2^62)")
    warr = F.array(*[F.lit((L // r) * (D ** (k - r))).cast("long")
                     for r in range(1, k + 1)])
    arr = F.sort_array(F.collect_list(F.struct(
        F.col(rank_col).cast("int").alias("r"),
        F.col(grade_col).cast("int").alias("g"))))
    per = (ranking.filter(F.col(rank_col) <= k)
           .groupBy(query_id).agg(arr.alias("_a")))
    init = F.struct(F.lit(1).cast("long").alias("prod"),
                    F.lit(0).cast("long").alias("tot"))

    numarr = F.array(*[F.lit((1 << g0) - 1).cast("long")
                       for g0 in range(g_max + 1)])

    def num_of(g):
        return F.when(
            (g >= 0) & (g <= g_max), F.element_at(numarr, g + 1)
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"err_at_k: grade outside [0, {g_max}]: "),
            g.cast("string"))).cast("long"))

    def merge(acc, x):
        num = num_of(x["g"])
        term = F.element_at(warr, x["r"]) * num * acc["prod"]
        return F.struct((acc["prod"] * (D - num)).alias("prod"),
                        (acc["tot"] + term).alias("tot"))

    err_s = F.aggregate(F.col("_a"), init, merge, lambda a: a["tot"])
    scale = float(L * (D ** k))
    return per.select(
        query_id, err_s.alias("err_s"),
        (err_s.cast("double") / F.lit(scale)).alias("err"))


def lift_table(df: DataFrame, group_cols: Sequence[str],
               score_col: str, label_col: str, id_col: str, *,
               n_buckets: int = 10) -> DataFrame:
    """Decile lift / cumulative-gains table per group — the model-eval
    readout a targeting or ranking model ships with: rows sorted by
    score descending are cut into ``n_buckets`` equal slices, and each
    slice reports how much richer in positives it is than the base
    rate (``lift``) and what fraction of all positives the top slices
    have captured (``cum_gain``).

    Exactness: the bucket of row rn is ``(rn−1)·B div n + 1`` —
    explicit integer arithmetic, not NTILE, so both engines cut
    identically; ties in score break deterministically by ``id_col``.
    Counts are exact longs; ``lift = (pos_b·N)/(n_b·P)`` and
    ``cum_gain = cum_pos/P`` are single pinned divisions on exact
    int64 products.

    Scale shape: one rank window + one groupBy + two windows over the
    ≤ B-row bucket table, all keyed on the group — a single exchange.

    Returns one row per (group, bucket): ``(group..., bucket, n,
    n_pos, cum_pos, base_pos, base_n, lift, cum_gain)`` — lift NULL
    when the group has no positives.
    """
    from ..geo.tilemath import floor_div
    g = list(group_cols)
    B = int(n_buckets)
    if B < 2:
        raise ValueError("n_buckets must be >= 2")
    clean = df.filter(F.col(score_col).isNotNull()
                      & F.col(label_col).isNotNull())
    w = (Window.partitionBy(*g)
         .orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
    wg = Window.partitionBy(*g)
    lab = F.col(label_col).cast("boolean").cast("long")
    r = clean.select(
        *g, lab.alias("_y"),
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count(F.lit(1)).over(wg).cast("long").alias("_n"))
    r = r.withColumn("bucket",
                     floor_div((F.col("_rn") - 1) * B, F.col("_n")) + 1)
    per = r.groupBy(*g, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"))
    wb = (Window.partitionBy(*g).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per = per.select(
        *g, "bucket", "n", "n_pos",
        F.sum("n_pos").over(wb).cast("long").alias("cum_pos"),
        F.sum("n_pos").over(wg).cast("long").alias("base_pos"),
        F.sum("n").over(wg).cast("long").alias("base_n"))
    lift = F.when(
        F.col("base_pos") > 0,
        (F.col("n_pos") * F.col("base_n")).cast("double")
        / (F.col("n") * F.col("base_pos")).cast("double"))
    gain = F.when(
        F.col("base_pos") > 0,
        F.col("cum_pos").cast("double")
        / F.col("base_pos").cast("double"))
    return per.select(*g, "bucket", "n", "n_pos", "cum_pos",
                      "base_pos", "base_n", lift.alias("lift"),
                      gain.alias("cum_gain"))


def qini_curve(df: DataFrame, group_cols: Sequence[str],
               score_col: str, treat_col: str, y_col: str,
               id_col: str, *, n_buckets: int = 10) -> DataFrame:
    """Qini / uplift curve per group — the evaluation for TARGETING
    models (Radcliffe 2007): rank by predicted uplift score, then at
    each cumulative decile compare treated vs control responders,

        qini(k)  = Rᵗ(k) − Rᶜ(k)·Nᵗ(k)/Nᶜ(k)
        uplift(k) = Rᵗ(k)/Nᵗ(k) − Rᶜ(k)/Nᶜ(k)

    (cumulative counts through decile k) — the incremental responders
    the model's top-k targeting would have won over random.  The
    causal sibling of :func:`lift_table` (which ignores assignment).

    Exactness: the decile cut is lift_table's explicit integer
    arithmetic (never NTILE), ties break by ``id_col``; all eight
    cumulative counts are exact int64 window sums; qini and uplift
    are one pinned double chain each, NULL while a decile's control
    arm is empty.

    Shape: one rank window + one groupBy + running windows over the
    ≤ B-row bucket table, all on the group key — a single exchange.

    Returns one row per (group, bucket): ``(group..., bucket, n_t,
    n_c, r_t, r_c, cum_nt, cum_nc, cum_rt, cum_rc, qini, uplift)``.
    """
    from ..geo.tilemath import floor_div
    g = list(group_cols)
    B = int(n_buckets)
    if B < 2:
        raise ValueError("n_buckets must be >= 2")
    t = F.col(treat_col).cast("boolean")
    y = F.col(y_col).cast("boolean").cast("long")
    clean = df.filter(F.col(score_col).isNotNull() & t.isNotNull()
                      & y.isNotNull())
    w = (Window.partitionBy(*g)
         .orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
    wg = Window.partitionBy(*g)
    r = clean.select(
        *g, t.alias("_t"), y.alias("_y"),
        F.row_number().over(w).cast("long").alias("_rn"),
        F.count(F.lit(1)).over(wg).cast("long").alias("_n"))
    r = r.withColumn("bucket",
                     floor_div((F.col("_rn") - 1) * B, F.col("_n")) + 1)
    per = r.groupBy(*g, "bucket").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long")
        .alias("n_t"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("_t"), F.col("_y")).otherwise(0))
        .cast("long").alias("r_t"),
        F.sum(F.when(~F.col("_t"), F.col("_y")).otherwise(0))
        .cast("long").alias("r_c"))
    wb = (Window.partitionBy(*g).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per = per.select(
        *g, "bucket", "n_t", "n_c", "r_t", "r_c",
        F.sum("n_t").over(wb).cast("long").alias("cum_nt"),
        F.sum("n_c").over(wb).cast("long").alias("cum_nc"),
        F.sum("r_t").over(wb).cast("long").alias("cum_rt"),
        F.sum("r_c").over(wb).cast("long").alias("cum_rc"))
    qini = F.when(
        F.col("cum_nc") > 0,
        F.col("cum_rt").cast("double")
        - (F.col("cum_rc") * F.col("cum_nt")).cast("double")
        / F.col("cum_nc").cast("double"))
    uplift = F.when(
        (F.col("cum_nt") > 0) & (F.col("cum_nc") > 0),
        F.col("cum_rt").cast("double") / F.col("cum_nt").cast("double")
        - F.col("cum_rc").cast("double")
        / F.col("cum_nc").cast("double"))
    return per.select(*g, "bucket", "n_t", "n_c", "r_t", "r_c",
                      "cum_nt", "cum_nc", "cum_rt", "cum_rc",
                      qini.alias("qini"), uplift.alias("uplift"))
