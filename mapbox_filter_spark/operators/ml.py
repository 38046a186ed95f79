"""Supervised feature-engineering operators: leave-one-out target
encoding and categorical Naive Bayes.

Both are training-data-pipeline primitives (the encode/label stages in
front of a model fit), built on the repo's exactness discipline:

- ``target_encode_loo`` keeps the encoding a ratio of exact integer
  sums (DECIMAL(38) combinations) with ONE pinned double division per
  row, so the feature is bit-identical across engines and cluster
  shapes.
- ``naive_bayes_predict`` trains on integer counts and scores in ln
  space as a FLAT expression (never a float aggregate, whose
  association order is engine-dependent): with identical op order,
  ln-chains on identical doubles are bit-stable across Spark and
  DuckDB (measured — the BM25/LM gates set the precedent).

Scale shape: both train stages are map-side-combinable groupBys onto
tiny (category/class-cardinality) tables that broadcast back onto the
fact scan — the fact table is read once and never exchanged until the
argmax window's hash partition by row id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(df: DataFrame, cat_col: str, target_col: str, *,
                      id_cols: Sequence[str], prior_weight: int = 0,
                      out_col: str = "enc") -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward the
    global mean (Micci-Barreca, SIGKDD Explorations 2001): for row i of
    category c,

        enc_i = (S_c − y_i + m·ȳ) / (n_c − 1 + m)

    computed as the exact rational
    ``((S_c − y_i)·N + m·S) / ((n_c − 1 + m)·N)`` (S, N the global sum
    and count), so there is exactly ONE double division per row.  The
    leave-one-out subtraction keeps each row's own target out of its
    feature — the standard leakage guard for high-cardinality
    categoricals.

    ``target_col`` must be integer-valued (cents-quantize upstream);
    the rational runs in DECIMAL(38)/HUGEINT (``max|S_c|·N < 10³⁸`` —
    S_c·N alone passes 2^63 around TPC-H SF1, so int64 would silently
    wrap where the oracle errors).  Rows with n_c == 1 and m == 0 (no
    leave-one-out evidence) get NULL.

    One groupBy(cat) to a category table (broadcast back) + one global
    aggregate — the fact scan is never exchanged.
    """
    ids = list(id_cols)
    y = F.col(target_col).cast("long")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(y).alias("_s_c"),
        F.count(F.lit(1)).alias("_n_c"))
    glob = df.groupBy().agg(F.sum(y).alias("_s_g"),
                            F.count(F.lit(1)).alias("_n_g"))
    m = int(prior_weight)
    dec = lambda c: c.cast("decimal(38,0)")
    # the rational runs in DECIMAL(38): S_c·N alone passes 2^63 around
    # TPC-H SF1 (per-category cent sums × row count) — the
    # cuped_adjust/ols2 recipe, HUGEINT on the oracle side
    num = ((dec(F.col("_s_c")) - dec(y)) * dec(F.col("_n_g"))
           + F.lit(m) * dec(F.col("_s_g"))).cast("double")
    den = ((dec(F.col("_n_c")) - 1 + F.lit(m))
           * dec(F.col("_n_g"))).cast("double")
    enc = F.when(F.col("_n_c") - 1 + F.lit(m) > 0, num / den)
    return (df.join(F.broadcast(per_cat), cat_col)
            .crossJoin(F.broadcast(glob))
            .select(*ids, cat_col, y.alias(target_col),
                    enc.alias(out_col)))


def _ln_ratio(num: Column, den: Column) -> Column:
    """ln(num/den) with both sides cast to double FIRST — the exact op
    order both engines must share for bit-stable ln chains."""
    return F.log(num.cast("double") / den.cast("double"))


def naive_bayes_train(train: DataFrame, class_col: str,
                      feature_cols: Sequence[str]):
    """Categorical NB with Laplace add-1 smoothing.  Returns
    ``(class_table, feature_tables, vocab_row)`` — all integer counts:
    class_table (``_cls, _n_c``); per feature f, counts
    (``_cls, _v, _n_fvc``); vocab_row is ONE row carrying each
    feature's TRAIN distinct-value count ``_vf{i}`` (the smoothing
    denominator) plus the global ``_n`` and class count ``_c``."""
    feats = list(feature_cols)
    cls = train.groupBy(F.col(class_col).alias("_cls")).agg(
        F.count(F.lit(1)).alias("_n_c"))
    tables = [
        train.groupBy(F.col(class_col).alias("_cls"),
                      F.col(f).alias("_v")).agg(
            F.count(F.lit(1)).alias("_n_fvc"))
        for f in feats
    ]
    vocab = train.groupBy().agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(class_col).alias("_c"),
        *[F.countDistinct(f).alias(f"_vf{i}")
          for i, f in enumerate(feats)])
    return cls, tables, vocab


def naive_bayes_predict(test: DataFrame, model, *, id_cols: Sequence[str],
                        feature_cols: Sequence[str],
                        out_col: str = "pred") -> DataFrame:
    """Score every test row against every class and take the argmax
    (ln-posterior desc, class asc).  The posterior is ONE flat ln-chain
    expression — ln(prior) + Σ_f ln(conditional) in declared feature
    order — so the double is bit-identical in any engine with the same
    ln.  Unseen (value, class) pairs fall back to the Laplace floor
    1/(n_c + V_f) via the left-join NULL branch.

    |classes| is assumed broadcast-small: the test scan fans out ×C
    through broadcast joins; the only exchange is the final argmax
    window's hash partition by row id.
    """
    cls, tables, vocab = model
    ids = list(id_cols)
    feats = list(feature_cols)
    scored = (test.select(*ids, *feats)
              .crossJoin(F.broadcast(cls))
              .crossJoin(F.broadcast(vocab)))
    score = _ln_ratio(F.col("_n_c") + 1, F.col("_n") + F.col("_c"))
    for i, f in enumerate(feats):
        t = tables[i].select(
            F.col("_cls").alias(f"_tc{i}"), F.col("_v").alias(f"_tv{i}"),
            F.col("_n_fvc").alias(f"_nf{i}"))
        scored = scored.join(
            F.broadcast(t),
            (F.col("_cls") == F.col(f"_tc{i}"))
            & (F.col(f) == F.col(f"_tv{i}")), "left") \
            .drop(f"_tc{i}", f"_tv{i}")
        score = score + _ln_ratio(
            F.coalesce(F.col(f"_nf{i}"), F.lit(0)) + 1,
            F.col("_n_c") + F.col(f"_vf{i}"))
    w = Window.partitionBy(*ids).orderBy(F.col("_score").desc(),
                                         F.col("_cls").asc())
    return (scored.withColumn("_score", score)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(*ids, F.col("_cls").alias(out_col), "_score"))


def decision_stump(df: DataFrame, feature_cols: Sequence[str],
                   label_col: str) -> DataFrame:
    """Exact best-split search for a one-level decision tree (the 1R /
    decision-stump baseline, and the inner loop of every boosted-tree
    fit): for each integer feature, find the threshold minimizing the
    weighted Gini impurity of the ``x ≤ thr`` split against a binary
    label.

    Exactness: candidate thresholds are the feature's DISTINCT values
    (the collapsed (value, count, positives) table), prefix sums give
    exact long (n_left, pos_left) per threshold, and minimizing the
    weighted Gini is equivalent to maximizing

        S(thr) = (posL² + negL²)/nL + (posR² + negR²)/nR

    — two pinned long→double divisions + one add per candidate, a flat
    bit-stable chain.  The argmax window orders by (S DESC, thr ASC):
    S values are bit-identical across engines, so the deterministic
    tiebreak pins the winner.  ``gini_split = (N − S)/N`` and the root
    impurity ``gini_root = 1 − (P² + (N−P)²)/N²`` are emitted on the
    same discipline.  Overflow: pos² ≤ n² needs n ≲ 3·10⁹ rows per
    feature — int64-safe at any gate scale (the anova_f bound note).

    Scale shape: ONE fact scan (stack unpivots features in-row), one
    map-side-combinable groupBy to distinct values, windows keyed by
    feature over the tiny collapsed table.  This is the standard
    histogram-based split search every distributed GBDT uses — here
    exact because the features are already integer-quantized.

    Returns one row per feature:
    ``(feature, thr, n_left, pos_left, n_right, pos_right, gini_split,
    gini_root)``.
    """
    k = len(feature_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in feature_cols)
    lab = F.col(label_col).cast("long")
    long_df = df.select(
        lab.alias("_y"),
        F.expr(f"stack({k}, {pairs}) AS (_f, _x)")).filter(
        F.col("_x").isNotNull() & F.col("_y").isNotNull())
    vals = long_df.groupBy("_f", "_x").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("_y").alias("_p"))
    wcum = (Window.partitionBy("_f").orderBy("_x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("_f")
    cand = vals.select(
        "_f", F.col("_x").alias("thr"),
        F.sum("_c").over(wcum).alias("n_left"),
        F.sum("_p").over(wcum).alias("pos_left"),
        F.sum("_c").over(wtot).alias("_n"),
        F.sum("_p").over(wtot).alias("_ptot"),
        F.max("_x").over(wtot).alias("_xmax"))
    cand = cand.filter(F.col("thr") < F.col("_xmax"))
    n_r = (F.col("_n") - F.col("n_left"))
    pos_r = (F.col("_ptot") - F.col("pos_left"))
    neg_l = (F.col("n_left") - F.col("pos_left"))
    neg_r = (n_r - pos_r)

    def _side(pos, neg, n):
        return ((pos * pos + neg * neg).cast("double")
                / n.cast("double"))

    s = (_side(F.col("pos_left"), neg_l, F.col("n_left"))
         + _side(pos_r, neg_r, n_r))
    scored = cand.select(
        "_f", "thr", "n_left", "pos_left",
        n_r.alias("n_right"), pos_r.alias("pos_right"),
        "_n", "_ptot", s.alias("_s"))
    wbest = Window.partitionBy("_f").orderBy(
        F.col("_s").desc(), F.col("thr").asc())
    best = (scored.withColumn("_rn", F.row_number().over(wbest))
            .filter(F.col("_rn") == 1))
    n_d = F.col("_n").cast("double")
    gini_split = (n_d - F.col("_s")) / n_d
    neg_tot = (F.col("_n") - F.col("_ptot"))
    gini_root = (F.lit(1.0)
                 - (F.col("_ptot") * F.col("_ptot")
                    + neg_tot * neg_tot).cast("double") / (n_d * n_d))
    return best.select(
        F.col("_f").alias("feature"), "thr", "n_left", "pos_left",
        "n_right", "pos_right", gini_split.alias("gini_split"),
        gini_root.alias("gini_root"))


def calibration_bins(df: DataFrame, score_col: str, label_col: str, *,
                     n_bins: int = 10, scale: int = 1000) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — "when
    the model says 0.7, does it happen 70% of the time?" — the
    calibration companion to the auc_metric/ndcg_at_k ranking gates.

    ``score_col`` is an INTEGER score in [0, scale) (quantize upstream
    — a raw double score would need a float groupBy sum, which is
    order-nondeterministic); bin = ⌊score·n_bins/scale⌋ via exact
    integer floor-div.  Per bin: exact long n, positives and score
    sum; mean score and the empirical positive rate are ONE pinned
    division each, so every row value-hashes.

    Scale shape: one map-side-combinable groupBy onto ≤ n_bins rows.

    Returns ``(bin, n, pos, sum_score, mean_score, frac_pos)`` sorted
    by construction key (bin) at the consumer's discretion.
    """
    from ..geo.tilemath import floor_div

    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    clean = df.filter(s.isNotNull() & y.isNotNull())
    b = floor_div(s * n_bins, scale).alias("bin")
    agg = clean.groupBy(b).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("pos"),
        F.sum(s).alias("sum_score"))
    mean_score = (F.col("sum_score").cast("double")
                  / (F.col("n") * scale).cast("double"))
    frac = F.col("pos").cast("double") / F.col("n").cast("double")
    return agg.select("bin", "n", "pos", "sum_score",
                      mean_score.alias("mean_score"),
                      frac.alias("frac_pos"))


def isotonic_fit(df: DataFrame, group_col: str, x_col: str,
                 y_col: str, *, max_bins: int = 64) -> DataFrame:
    """Per-group isotonic (non-decreasing) least-squares calibration —
    the PAVA fit that turns a reliability diagram
    (:func:`calibration_bins`) into a monotone score→probability map
    (Zadrozny & Elkan KDD'02; Barlow et al. 1972).  Computed through
    the exact minimax characterization of the weighted PAVA solution

        fit(k) = max_{i<=k} min_{j>=k}  (S_j − S_{i−1}) / (C_j − C_{i−1})

    (Robertson-Wright-Dykstra Thm 1.4.4) rather than the sequential
    pool stack, so the whole fit is PURE integer prefix sums + one
    correctly-rounded double divide per candidate — bit-identical
    across engines, no Python, no iteration.

    ``y_col`` must be integral (labels / counts); per (group, x) the
    operator first reduces to exact ``(n, sum_y)``.  The per-group
    bin count is bounded by ``max_bins`` (in-plan raise_error, never
    silent) because the in-row minimax is O(bins³) — bins are model
    score quantiles, inherently small; rows per bin are unbounded.

    Scale shape: ONE map-side-combinable groupBy (group, x) → ONE
    groupBy group with a sorted bounded collect_list → in-row HOF
    minimax → posexplode.  Two exchanges total, both on the group
    key.

    Returns ``(group, x, n, sum_y, rate, fit)`` — ``fit`` is the
    isotonic calibrated probability, non-decreasing in ``x`` within
    every group (property-tested), preserving each group's weighted
    mean.
    """
    g = F.col(group_col)
    binned = (df.groupBy(g.alias("grp"), F.col(x_col).alias("x"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col(y_col).cast("long")).alias("sum_y")))
    arr = F.sort_array(F.collect_list(
        F.struct(F.col("x"), F.col("n"), F.col("sum_y"))))
    per_g = binned.groupBy("grp").agg(arr.alias("_b"))
    nb = F.size("_b")
    guard = F.when(
        nb > max_bins,
        F.raise_error(F.concat(
            F.lit(f"isotonic_fit: group exceeds max_bins={max_bins}: "),
            nb.cast("string")))).otherwise(F.col("_b"))
    per_g = per_g.select("grp", guard.alias("_b"))
    # prefix sums P[j] = sum of sum_y over bins 1..j (P[0] = 0); same
    # for counts Q — O(n^2) slice-folds over a <=max_bins array
    pre = lambda field: F.transform(
        F.sequence(F.lit(0), F.size("_b")),
        lambda j: F.aggregate(
            F.slice("_b", F.lit(1), j), F.lit(0).cast("long"),
            lambda acc, t: acc + t[field]))
    per_g = per_g.select("grp", "_b", pre("sum_y").alias("_P"),
                         pre("n").alias("_Q"))
    P = lambda j: F.element_at("_P", (j + 1).cast("int"))
    Q = lambda j: F.element_at("_Q", (j + 1).cast("int"))
    avg = lambda i, j: ((P(j) - P(i - 1)).cast("double")
                        / (Q(j) - Q(i - 1)).cast("double"))
    n_ = F.size("_b")
    fit = F.transform(
        F.sequence(F.lit(1), n_),
        lambda k: F.array_max(F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_min(F.transform(
                F.sequence(k, n_), lambda j: avg(i, j))))))
    out = per_g.select(
        "grp", F.posexplode(F.zip_with(
            "_b", fit,
            lambda b, f: F.struct(b["x"].alias("x"),
                                  b["n"].alias("n"),
                                  b["sum_y"].alias("sum_y"),
                                  f.alias("fit")))).alias("_i", "_r"))
    return out.select(
        F.col("grp").alias(group_col), F.col("_r.x").alias(x_col),
        F.col("_r.n").alias("n"), F.col("_r.sum_y").alias("sum_y"),
        (F.col("_r.sum_y").cast("double")
         / F.col("_r.n").cast("double")).alias("rate"),
        F.col("_r.fit").alias("fit"))


def feature_hashing(docs: DataFrame, n_buckets: int = 1024, *,
                    doc_col: str = "doc_id", text_col: str = "text",
                    salt: str = "fh1") -> DataFrame:
    """Hashing-trick featurization (Weinberger et al., ICML'09): each
    token hashes to one of ``n_buckets`` feature slots with a ±1 sign
    from an independent hash bit, and the document's feature value is
    the signed token-count sum — the fixed-width, vocabulary-free text
    vectorizer (no dictionary build, no OOV, collisions unbiased by
    the sign trick).

    Determinism: the slot and sign derive from the splits-module md5
    coordinate (``hash_u60``) — ``bucket = u mod k``, ``sign = 1 −
    2·((u div k) mod 2)`` — so the feature matrix is bit-identical on
    any cluster shape and recomputable by the SQL oracle.

    Scale shape: tokens collapse to one row per DISTINCT (doc, token)
    BEFORE hashing (one map-side-combinable groupBy), then a second
    groupBy onto (doc, bucket) — both shuffles carry ids + counts
    only; md5 runs once per distinct pair.  Output is the sparse COO
    form ``(doc_id, bucket, feat, n_tokens)`` (absent buckets are
    zero).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2: {n_buckets}")
    from .splits import hash_u60
    from .text import _words

    tok = docs.select(F.col(doc_col),
                      F.explode(_words(F.col(text_col))).alias("_w"))
    cnt = tok.groupBy(doc_col, "_w").agg(
        F.count(F.lit(1)).alias("_c"))
    # u is 60 bits: the high-part division MUST stay integral (`div`)
    # — a double divide loses bits past 2^53 and flips signs
    with_u = cnt.withColumn("_u", hash_u60(["_w"], salt))
    bucket = F.pmod(F.col("_u"), F.lit(n_buckets))
    hi = F.expr(f"_u div {int(n_buckets)}")
    sign = F.lit(1) - 2 * F.pmod(hi, F.lit(2))
    hashed = with_u.select(doc_col, bucket.alias("bucket"),
                           (sign * F.col("_c")).alias("_sc"),
                           F.col("_c").alias("_c"))
    return (hashed.groupBy(doc_col, "bucket")
            .agg(F.sum("_sc").alias("feat"),
                 F.sum("_c").alias("n_tokens")))


def median_impute(df: DataFrame, group_cols: Sequence[str],
                  value_col: str, *, out_col: "str | None" = None,
                  flag_col: "str | None" = None) -> DataFrame:
    """Per-group median imputation — the standard missing-value fill
    for model features: NULLs in ``value_col`` are replaced by their
    group's EXACT lower median (the ⌈n/2⌉-th smallest non-null, the
    rank_percentiles p50 convention — never an interpolated float),
    with a 0/1 ``was_imputed`` flag so downstream models can learn
    missingness.

    Determinism: the lower median is an order statistic of the data —
    no averaging, no float — so the filled column value-hashes; a
    group with NO observed values keeps its NULLs (flag 0 — nothing
    was imputed, surfaced rather than silently zero-filled).

    Scale shape: the median needs one per-group sort of the NON-NULL
    subset (row_number window — the one fact-sized exchange, same
    class as rank_percentiles); the group→median table is
    group-cardinality-sized and BROADCASTS back onto the fact scan,
    so the fact table itself never exchanges for the fill.
    """
    g = list(group_cols)
    out_col = out_col or f"{value_col}_filled"
    flag_col = flag_col or "was_imputed"
    v = F.col(value_col).cast("long")
    nn = df.filter(v.isNotNull()).select(*g, v.alias("_v"))
    w = Window.partitionBy(*g).orderBy(F.col("_v").asc())
    wg = Window.partitionBy(*g)
    meds = (nn.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wg))
            .filter(F.col("_rn") == F.expr("(_n * 50 + 99) div 100"))
            .select(*g, F.col("_v").alias("_med")))
    joined = df.join(F.broadcast(meds), g, "left")
    return (joined
            .withColumn(out_col, F.coalesce(v, F.col("_med")))
            .withColumn(flag_col,
                        (v.isNull() & F.col("_med").isNotNull())
                        .cast("int"))
            .drop("_med"))


def quantile_bins(df: DataFrame, group_cols: Sequence[str],
                  value_col: str, *, k: int = 4,
                  out_col: str = "bin") -> DataFrame:
    """Per-group equal-frequency (quantile) binning — the qcut
    feature transform: row with min-rank r of n lands in bin
    ``(r−1)·k div n + 1`` ∈ [1, k].  TIES SHARE A BIN (RANK, not
    ROW_NUMBER — equal values must get equal features; the resulting
    imbalance under heavy ties is the standard, documented qcut
    behavior), so the assignment is a pure function of the value and
    value-hashes on any engine.

    One exchange: the rank window and nothing else (the fact table
    keeps its rows).  Exact integer arithmetic throughout.  Returns
    the input columns plus ``bin``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    g = list(group_cols)
    v = F.col(value_col)
    w = Window.partitionBy(*g).orderBy(v.asc())
    wg = Window.partitionBy(*g)
    r = F.rank().over(w)
    n = F.count(F.lit(1)).over(wg)
    ranked = (df.filter(v.isNotNull())
              .withColumn("_r", r).withColumn("_n", n))
    bin_ = (F.expr(f"((_r - 1) * {int(k)}) div _n") + 1).cast("long")
    return ranked.withColumn(out_col, bin_).drop("_r", "_n")


def ece(df: DataFrame, score_col: str, label_col: str, *,
        n_bins: int = 10, scale: int = 1000) -> DataFrame:
    """Expected / maximum calibration error — the one-number summary
    of the :func:`calibration_bins` reliability diagram (Naeini et al.
    2015 AAAI): ``ECE = Σ_b (n_b/N)·|acc_b − conf_b|``, the
    n-weighted gap between what the model predicted and what
    happened; MCE is the worst single bin.

    Exactness: with integer scores in [0, scale) the weighted gap
    telescopes to EXACT integers —

        (n_b/N)·|pos_b/n_b − sum_b/(n_b·scale)|
            = |pos_b·scale − sum_b| / (N·scale)

    so ``ece_num = Σ_b |pos_b·scale − sum_b|`` is an exact int64 and
    ECE is ONE pinned division; MCE takes the max over per-bin pinned
    doubles (max is order-independent — no fold needed).

    Scale shape: calibration_bins' single map-side-combinable groupBy
    onto ≤ n_bins rows, then a one-row reduce.

    Returns ONE row ``(n, n_bins_used, ece_num, ece, mce)``.
    """
    bins = calibration_bins(df, score_col, label_col, n_bins=n_bins,
                            scale=scale)
    gap = F.abs(F.col("pos") * scale - F.col("sum_score"))
    agg = bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(gap).cast("long").alias("ece_num"),
        F.max(gap.cast("double")
              / (F.col("n") * scale).cast("double")).alias("mce"))
    return agg.select(
        "n", "n_bins_used", "ece_num",
        F.when(F.col("n") > 0,
               F.col("ece_num").cast("double")
               / (F.col("n") * scale).cast("double")).alias("ece"),
        "mce")


def eb_shrink_rates(df: DataFrame, entity_col: str, label_col: str
                    ) -> DataFrame:
    """Empirical-Bayes shrinkage of per-entity binomial rates — the
    "smoothed CTR" estimator (beta-binomial, method of moments;
    Robbins 1956 lineage): a 3-impression entity with 3 successes
    should NOT outrank a 10,000-impression entity at 95% — each raw
    rate x/n is pulled toward the population with strength α+β:

        shrunk = (x + α) / (n + α + β),
        α = m·(m(1−m)/v − 1),  β = (1−m)·(m(1−m)/v − 1)

    with m, v the mean and variance of the per-entity raw rates.

    Determinism: n and x are exact longs; each raw rate is ONE pinned
    division; m and the Σr² moment are PINNED entity-ordered folds
    (the entropy_profile discipline — a float groupBy sum is
    order-nondeterministic), so α, β, and every shrunk value are
    bit-stable cross-engine.  Degenerate moments (v ≤ 0 — all rates
    equal — or v ≥ m(1−m), where MoM has no valid Beta) fall back to
    ``shrunk = raw`` with NULL α/β — the honest no-prior answer.

    Shape: one groupBy to per-entity (n, x), one single-row moment
    reduce broadcast back — two exchanges, the first map-side
    combinable.

    Returns ``(entity, n, x, raw_rate, alpha, beta, shrunk)``.
    """
    per = (df.filter(F.col(label_col).isNotNull())
           .groupBy(F.col(entity_col).alias("entity"))
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col(label_col).cast("long")).cast("long")
                .alias("x")))
    r = F.col("x").cast("double") / F.col("n").cast("double")
    per = per.withColumn("raw_rate", r)
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("entity"), F.col("raw_rate").alias("rr"))))
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("_g"),
        F.aggregate(arr, F.lit(0.0),
                    lambda a, s_: a + s_["rr"]).alias("_s1"),
        F.aggregate(arr, F.lit(0.0),
                    lambda a, s_: a + s_["rr"] * s_["rr"])
        .alias("_s2"))
    m = F.col("_s1") / F.col("_g").cast("double")
    v = F.when(
        F.col("_g") > 1,
        (F.col("_s2") - F.col("_g").cast("double") * m * m)
        / (F.col("_g") - 1).cast("double"))
    strength = F.when(
        v.isNotNull() & (v > 0.0) & (v < m * (1.0 - m)),
        m * (1.0 - m) / v - 1.0)
    mom = mom.select((m * strength).alias("alpha"),
                     ((1.0 - m) * strength).alias("beta"))
    j = per.crossJoin(F.broadcast(mom))
    shrunk = F.when(
        F.col("alpha").isNotNull(),
        (F.col("x").cast("double") + F.col("alpha"))
        / (F.col("n").cast("double") + F.col("alpha") + F.col("beta"))
    ).otherwise(F.col("raw_rate"))
    return j.select("entity", "n", "x", "raw_rate", "alpha", "beta",
                    shrunk.alias("shrunk"))


def brier_score(df: DataFrame, score_col: str, label_col: str, *,
                n_bins: int = 10, scale: int = 1000) -> DataFrame:
    """Brier score + Murphy decomposition — the proper scoring rule
    for probabilistic classifiers (Brier 1950; Murphy 1973):

        BS  = (1/N)·Σ (p_i − y_i)²
        BS  = REL − RES + UNC            (for bin-valued forecasts)
        REL = Σ_b n_b·(conf_b − acc_b)²/N   (calibration gap — ece's
                                             squared cousin)
        RES = Σ_b n_b·(acc_b − ȳ)²/N        (resolution: how much the
                                             bins separate outcomes)
        UNC = ȳ·(1−ȳ)

    Exactness: with integer scores in [0, scale), the raw Brier sum
    ``Σ (s_i − y_i·scale)²`` is ONE exact int64 aggregate and BS one
    pinned division; REL and RES numerators are per-bin exact-integer
    gaps ``(sum_b − pos_b·scale)²`` and ``(pos_b·N − n_b·P)²`` whose
    rational bin terms (denominators n_b) are summed in PINNED
    bin-ordered folds; UNC is one exact-product chain.  The Murphy
    identity holds exactly when forecasts are constant within bins;
    otherwise BS also carries the (reported-free) within-bin forecast
    variance — the standard caveat.

    Shape: one map-side-combinable groupBy onto ≤ n_bins rows + one
    exact global aggregate.

    Returns ONE row ``(n, brier_num, brier, rel, res, unc)``.
    """
    from ..geo.tilemath import floor_div

    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    clean = df.filter(s.isNotNull() & y.isNotNull())
    raw = clean.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((s - y * scale) * (s - y * scale)).cast("long")
        .alias("brier_num"),
        F.sum(y).cast("long").alias("_p"))
    b = floor_div(s * n_bins, scale).alias("_bin")
    bins = clean.groupBy(b).agg(
        F.count(F.lit(1)).cast("long").alias("_nb"),
        F.sum(y).cast("long").alias("_pos"),
        F.sum(s).cast("long").alias("_sum"))
    gap = (F.col("_sum") - F.col("_pos") * scale).cast("double")
    rel_t = gap * gap / F.col("_nb").cast("double")
    bins2 = bins.crossJoin(F.broadcast(raw.select("n", "_p")))
    res_t = ((F.col("_pos") * F.col("n") - F.col("_nb") * F.col("_p"))
             .cast("double")
             * (F.col("_pos") * F.col("n") - F.col("_nb") * F.col("_p"))
             .cast("double")) / F.col("_nb").cast("double")
    terms = bins2.select("_bin", rel_t.alias("_rt"),
                         res_t.alias("_st"))

    def fold(col):
        arr = F.sort_array(F.collect_list(F.struct(
            F.col("_bin"), F.col(col).alias("t"))))
        return F.aggregate(arr, F.lit(0.0),
                           lambda acc, x: acc + x["t"])

    folded = terms.agg(fold("_rt").alias("_rel_s"),
                       fold("_st").alias("_res_s"))
    out = raw.crossJoin(F.broadcast(folded))
    nd = F.col("n").cast("double")
    sc2 = float(scale * scale)
    brier = F.col("brier_num").cast("double") / (nd * F.lit(sc2))
    rel = F.col("_rel_s") / (nd * F.lit(sc2))
    res = F.col("_res_s") / (nd * nd * nd)
    unc = (F.col("_p").cast("double")
           * (F.col("n") - F.col("_p")).cast("double")) / (nd * nd)
    return out.select("n", "brier_num", brier.alias("brier"),
                      rel.alias("rel"), res.alias("res"),
                      unc.alias("unc"))


_PLATT_RIDGE = 1e-12
_PLATT_ITERS = 6


def platt_scaling(df: DataFrame, group_cols: "list[str]",
                  score_col: str, label_col: str,
                  iters: int = _PLATT_ITERS) -> DataFrame:
    """Platt scaling (Platt 1999; Lin-Weng-Weng 2007 formulation) —
    fit P(y=1|s) = 1/(1+exp(A·s+B)) to integer scores by ``iters``
    fixed Newton steps with the regularized targets
    t₊ = (N₊+1)/(N₊+2), t₋ = 1/(N₋+2): the parametric sibling of
    isotonic_calibration (monotone-smooth instead of stepwise).

    Determinism: no line search, a FIXED iteration count, and every
    per-iteration sum (∇A, ∇B, three Hessian moments) is a PINNED
    score-index-ordered in-row fold; the sigmoid uses the
    branch-pinned stable form (z ≥ 0 vs z < 0), the 2×2 Newton solve
    is a fixed IEEE chain with +1e-12 ridge on the diagonal — both
    engines execute the identical op sequence, so A and B reproduce
    to the ulp.  Perfectly-separable groups don't diverge (the
    iteration count bounds the march); targets never reach 0/1 by
    the +1/+2 regularization.

    One key exchange into per-group sorted arrays; the fold is
    O(n·iters) in-row — scores should be pre-scaled to keep |A·s+B|
    moderate (cents → dollars upstream).

    Returns ``(*group_cols, n, n_pos, a, b)``.
    """
    g = list(group_cols)
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("int")
    per = (df.select(*g, s.alias("_s"), y.alias("_y"))
           .groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("_y").cast("long").alias("n_pos"),
                F.sort_array(F.collect_list(
                    F.struct("_s", "_y"))).alias("_a")))
    np_, nm = F.col("n_pos"), F.col("n") - F.col("n_pos")
    tp = (np_ + 1).cast("double") / (np_ + 2).cast("double")
    tm = F.lit(1.0) / (nm + 2).cast("double")
    a0 = F.lit(0.0)
    b0 = F.log((nm + 1).cast("double") / (np_ + 1).cast("double"))

    def sigmoid(z):
        e = F.exp(-F.abs(z))
        return F.when(z >= 0, F.lit(1.0) / (F.lit(1.0) + e)) \
            .otherwise(F.exp(z) / (F.lit(1.0) + F.exp(z)))

    def fold(term):
        return F.aggregate(F.col("_a"), F.lit(0.0),
                           lambda acc, e: acc + term(e))

    # each iteration materializes (tiny k-row table) — chaining the
    # raw expressions would re-inline 5 folds per step into the next
    # and blow the plan up 5^iters
    cur = per.select(*g, "n", "n_pos", "_a",
                     tp.alias("_tp"), tm.alias("_tm"),
                     a0.alias("_pa"), b0.alias("_pb")).localCheckpoint()
    for _ in range(iters):
        def u_of(e):
            return sigmoid(F.col("_pa") * e["_s"].cast("double")
                           + F.col("_pb"))

        def d_of(e):
            t = F.when(e["_y"] == 1, F.col("_tp")).otherwise(
                F.col("_tm"))
            return u_of(e) - (F.lit(1.0) - t)

        ga = fold(lambda e: d_of(e) * e["_s"].cast("double"))
        gb = fold(lambda e: d_of(e))
        haa = fold(lambda e: u_of(e) * (F.lit(1.0) - u_of(e))
                   * e["_s"].cast("double")
                   * e["_s"].cast("double")) + F.lit(_PLATT_RIDGE)
        hab = fold(lambda e: u_of(e) * (F.lit(1.0) - u_of(e))
                   * e["_s"].cast("double"))
        hbb = fold(lambda e: u_of(e) * (F.lit(1.0) - u_of(e))) \
            + F.lit(_PLATT_RIDGE)
        det = (haa * hbb - hab * hab).alias("_det")
        step = cur.select(
            *g, "n", "n_pos", "_a", "_tp", "_tm", "_pa", "_pb",
            ga.alias("_ga"), gb.alias("_gb"), haa.alias("_haa"),
            hab.alias("_hab"), hbb.alias("_hbb"), det)
        cur = step.select(
            *g, "n", "n_pos", "_a", "_tp", "_tm",
            (F.col("_pa") - (F.col("_hbb") * F.col("_ga")
                             - F.col("_hab") * F.col("_gb"))
             / F.col("_det")).alias("_pa"),
            (F.col("_pb") - (F.col("_haa") * F.col("_gb")
                             - F.col("_hab") * F.col("_ga"))
             / F.col("_det")).alias("_pb")).localCheckpoint()
    return cur.select(*g, "n", "n_pos", F.col("_pa").alias("a"),
                      F.col("_pb").alias("b"))


def conformal_interval(df: DataFrame, group_cols: "list[str]", *,
                       id_col: str, val_col: str,
                       alpha_num: int = 1, alpha_den: int = 10,
                       salt: str = "conformal") -> DataFrame:
    """Split conformal prediction interval (Vovk; Lei et al. 2018)
    around a per-group median predictor: the calibration half's
    ⌈(n+1)(1−α)⌉-th absolute residual becomes the HALF-WIDTH whose
    marginal test coverage is ≥ 1−α by exchangeability — the
    distribution-free uncertainty wrapper every point predictor needs.

    Everything is exact: the cal/test split is the hash_u60 coordinate
    (cluster-shape-independent, the splits-module contract), ŷ is the
    calibration LOWER MEDIAN (exact selection), q̂ the exact-rank
    residual SELECTION with the integer ceiling
    ((den−num)(n+1)+den−1) div den, and coverage one division of exact
    counts.  Rank overflow (k > n_cal, tiny groups at extreme 1−α) →
    NULL q̂/coverage, pinned — never a silently clamped interval.

    Shape: two rank windows on the calibration half + one broadcast
    join of the 2-value (ŷ, q̂) row onto the test half.

    Returns ``(*group_cols, n_cal, n_test, y_hat, q_hat, coverage)``.
    """
    from ..geo.tilemath import floor_div
    from .splits import SCALE_U60, hash_u60

    if not (0 < alpha_num < alpha_den):
        raise ValueError("need 0 < alpha_num < alpha_den")
    g = list(group_cols)
    base = df.select(*g, F.col(id_col).alias("_id"),
                     F.col(val_col).cast("long").alias("_y"),
                     (hash_u60([id_col], salt=salt)
                      < SCALE_U60 // 2).alias("_cal"))
    cal = base.filter(F.col("_cal"))
    test = base.filter(~F.col("_cal"))

    wc = Window.partitionBy(*g)
    wy = Window.partitionBy(*g).orderBy("_y", "_id")
    yhat = (cal.select(*g, "_y",
                       F.row_number().over(wy).alias("_rn"),
                       F.count(F.lit(1)).over(wc).alias("_nc"))
            .filter(F.col("_rn") == floor_div(F.col("_nc") + 1, 2))
            .select(*g, F.col("_y").alias("y_hat"),
                    F.col("_nc").alias("n_cal")))
    res = (cal.join(yhat, g)
           .select(*g, "n_cal", "y_hat",
                   F.abs(F.col("_y") - F.col("y_hat")).alias("_r"),
                   "_id"))
    wr = Window.partitionBy(*g).orderBy("_r", "_id")
    k = floor_div((alpha_den - alpha_num) * (F.col("n_cal") + 1)
                  + alpha_den - 1, alpha_den)
    qhat = (res.select(*g, "n_cal", "y_hat",
                       F.row_number().over(wr).alias("_rn"),
                       k.alias("_k"), "_r")
            .filter(F.col("_rn") == F.col("_k"))
            .select(*g, "n_cal", "y_hat", F.col("_r").alias("q_hat")))
    head = (yhat.join(qhat.select(*g, "q_hat"), g, "left")
            .select(*g, "n_cal", "y_hat", "q_hat"))
    cov = (test.join(F.broadcast(head), g, "right")
           .groupBy(*g)
           .agg(F.min("n_cal").alias("n_cal"),
                F.min("y_hat").alias("y_hat"),
                F.min("q_hat").alias("q_hat"),
                F.sum(F.when(F.col("_y").isNotNull(), 1).otherwise(0))
                .alias("n_test"),
                F.sum(F.when(
                    F.abs(F.col("_y") - F.col("y_hat"))
                    <= F.col("q_hat"), 1).otherwise(0)).alias("_in")))
    coverage = F.when((F.col("n_test") > 0) & F.col("q_hat").isNotNull(),
                      F.col("_in").cast("double")
                      / F.col("n_test").cast("double"))
    return cov.select(*g, "n_cal", "n_test", "y_hat", "q_hat",
                      coverage.alias("coverage"))


def stratified_ate(df: DataFrame, group_cols: "list[str]", *,
                   treat_col: str, outcome_col: str, conf_col: str,
                   k: int = 5) -> DataFrame:
    """Stratified average treatment effect (Cochran 1968
    subclassification): quantile-bin the confounder into ``k`` strata
    (:func:`quantile_bins` — the standard "five subclasses remove
    ~90% of bias" design), take the treated-minus-control mean
    difference inside each stratum, and size-weight the differences —
    the model-free observational-causal estimator beside
    diff_in_diff/cuped_adjust.

    Exactness: per-stratum sums/counts are exact int64; each stratum
    difference is TWO pinned divisions, and the weighted combination
    Σ (n_s/N_used)·Δ_s is a pinned stratum-ordered fold.  Strata
    missing an arm DROP (no extrapolation) with the weights
    renormalized over the used strata — n_dropped reports how much
    support was lost, never silently.

    Shape: one rank window (the binning) + one 2k-row aggregate.

    Returns ``(*group_cols, n, n_used, k_strata, n_dropped, ate)``.
    """
    g = list(group_cols)
    b = quantile_bins(
        df.select(*g, F.col(treat_col).cast("int").alias("_t"),
                  F.col(outcome_col).cast("long").alias("_y"),
                  F.col(conf_col).cast("long").alias("_x")),
        g, "_x", k=k, out_col="_s")
    cell = (b.groupBy(*g, "_s")
            .agg(F.sum(F.when(F.col("_t") == 1, 1).otherwise(0))
                 .alias("_n1"),
                 F.sum(F.when(F.col("_t") == 1, F.col("_y"))
                       .otherwise(F.lit(0))).alias("_s1"),
                 F.sum(F.when(F.col("_t") == 0, 1).otherwise(0))
                 .alias("_n0"),
                 F.sum(F.when(F.col("_t") == 0, F.col("_y"))
                       .otherwise(F.lit(0))).alias("_s0")))
    used = (F.col("_n1") > 0) & (F.col("_n0") > 0)
    arr = F.sort_array(F.collect_list(F.when(used, F.struct(
        "_s", (F.col("_n1") + F.col("_n0")).alias("ns"),
        "_s1", "_n1", "_s0", "_n0"))))
    per = (cell.groupBy(*g)
           .agg(F.sum(F.col("_n1") + F.col("_n0")).alias("n"),
                F.sum(F.when(used, F.col("_n1") + F.col("_n0"))
                      .otherwise(F.lit(0))).alias("n_used"),
                F.sum(F.when(used, 1).otherwise(0)).alias("k_strata"),
                arr.alias("_a")))
    ate = F.when(F.col("n_used") > 0, F.aggregate(
        F.col("_a"), F.lit(0.0),
        lambda a, s: a + s["ns"].cast("double")
        / F.col("n_used").cast("double")
        * (s["_s1"].cast("double") / s["_n1"].cast("double")
           - s["_s0"].cast("double") / s["_n0"].cast("double"))))
    return per.select(*g, "n", "n_used", "k_strata",
                      (F.col("n") - F.col("n_used")).alias("n_dropped"),
                      ate.alias("ate"))


_JENKS_MAX_N = 400


def jenks_breaks(df: DataFrame, group_cols: "list[str]",
                 val_col: str, *, k: int = 4,
                 max_n: int = _JENKS_MAX_N) -> DataFrame:
    """Jenks-Fisher natural breaks — the optimal k-class 1-D
    classification minimizing total within-class squared deviation:
    THE choropleth / symbol-grading classifier (Jenks 1967; the exact
    DP is Fisher 1958).  Equal-frequency bins (quantile_bins) split
    dense clusters; Jenks puts breaks in the gaps.

    Exact DP over the sorted values: class cost is the pinned double
    (m·Q − S²)/m from exact int64 prefix moments; dp layers carry
    [cost, argmin] pairs (tie → smaller split, pinned); the k−1
    breaks come from backtracking and are reported as CLASS MAXIMA.
    All layer folds are in-row; O(k·n²) work per group — ``max_n``
    raises in-plan (classing inputs are samples or distinct values by
    nature; cap upstream deterministically).

    One key exchange.  Returns ``(*group_cols, n, total_cost,
    break_1..break_{k-1}, x_min, x_max)``.
    """
    if not 2 <= k <= 6:
        raise ValueError("k must be in [2, 6]")
    g = list(group_cols)
    v = F.col(val_col).cast("long")
    per = (df.select(*g, v.alias("_x"))
           .groupBy(*g)
           .agg(F.count(F.lit(1)).alias("_cnt"),
                F.array_sort(F.collect_list("_x")).alias("_xs")))
    n = F.when(
        F.col("_cnt") > max_n,
        F.raise_error(F.concat(
            F.lit(f"jenks_breaks: > {max_n} values in a group: "),
            F.col("_cnt").cast("string"))).cast("long")
    ).otherwise(F.col("_cnt"))
    per = per.filter(F.col("_cnt") >= k).select(
        *g, n.alias("n"), "_xs")
    xs = F.col("_xs")
    nn = F.size(xs)
    pre = F.transform(
        F.sequence(F.lit(0), nn),
        lambda i: F.struct(
            F.aggregate(F.slice(xs, 1, i), F.lit(0).cast("long"),
                        lambda a, x: a + x).alias("s"),
            F.aggregate(F.slice(xs, 1, i), F.lit(0).cast("long"),
                        lambda a, x: a + x * x).alias("q")))
    per = per.withColumn("_p", pre)
    p = F.col("_p")

    def ssd(j, i):
        # cost of class (j, i]: exact numerator, one pinned division
        m = (i - j).cast("double")
        s = (F.element_at(p, (i + 1).cast("int"))["s"]
             - F.element_at(p, (j + 1).cast("int"))["s"])
        q = (F.element_at(p, (i + 1).cast("int"))["q"]
             - F.element_at(p, (j + 1).cast("int"))["q"])
        return ((i - j) * q - s * s).cast("double") / m

    # layer 1: one class over prefix i
    dp_prev = F.transform(
        F.sequence(F.lit(1), nn),
        lambda i: F.struct(ssd(F.lit(0), i).alias("c"),
                           F.lit(0).cast("long").alias("j")))
    layers = [dp_prev]
    for c in range(2, k + 1):
        prev = F.col(f"_d{c - 1}")
        per = per.withColumn(f"_d{c - 1}", dp_prev)

        def layer(i, prev=prev, c=c):
            # prev (layer c-1) covers i' = c-1..n: index = j - c + 2
            def stepj(acc, j):
                cc = (F.element_at(prev, (j - c + 2).cast("int"))["c"]
                      + ssd(j, i))
                better = (cc < acc["c"]) | ((cc == acc["c"])
                                            & (j < acc["j"]))
                return F.struct(
                    F.when(better, cc).otherwise(acc["c"]).alias("c"),
                    F.when(better, j).otherwise(acc["j"]).alias("j"))

            init = F.struct(
                (F.element_at(prev, 1)["c"]
                 + ssd(F.lit(c - 1).cast("long"), i)).alias("c"),
                F.lit(c - 1).cast("long").alias("j"))
            # sequence(c, c-1) would DESCEND (the rouge lesson):
            # empty candidate set must be an explicit branch
            seq = F.when(
                i - 1 >= c,
                F.sequence(F.lit(c).cast("long"), i - 1)) \
                .otherwise(F.array().cast("array<bigint>"))
            return F.aggregate(seq, init, stepj)

        # NOTE: transform() counts lambda params — a default-arg
        # capture would be read as the (elem, index) 2-arg form.  The
        # expression is built eagerly, so plain closure is safe.
        dp_prev = F.transform(
            F.sequence(F.lit(c).cast("long"), nn.cast("long")),
            lambda i: layer(i))  # noqa: B023

        layers.append(dp_prev)
    per = per.withColumn(f"_d{k}", dp_prev)

    # backtrack: j_{k-1} from layer k at i=n, then down the layers
    cols = {}
    cur = F.element_at(F.col(f"_d{k}"), (nn - k + 1).cast("int"))
    cols["total_cost"] = cur["c"]
    brks = []
    jcur = cur["j"]
    for c in range(k - 1, 0, -1):
        brks.append(F.element_at(xs, jcur.cast("int")))
        if c > 1:
            jcur = F.element_at(
                F.col(f"_d{c}"),
                (jcur - (c - 1)).cast("int"))["j"]
    brks = list(reversed(brks))
    return per.select(
        *g, "n", cols["total_cost"].alias("total_cost"),
        *[b.alias(f"break_{i + 1}") for i, b in enumerate(brks)],
        F.element_at(xs, 1).alias("x_min"),
        F.element_at(xs, -1).alias("x_max"))


def mdlp_split(df: DataFrame, group_cols: "list[str]", *,
               val_col: str, label_col: str,
               max_n: int = 100_000) -> DataFrame:
    """MDLP supervised split (Fayyad & Irani 1993) — the root step of
    entropy-based discretization: among all cut points of a numeric
    feature, pick the one maximizing class-information gain, and
    ACCEPT it only if the gain clears the minimum-description-length
    bar

        gain > (log₂(n−1) + log₂(3^k−2)
                − [k·H(S) − k₁·H(S₁) − k₂·H(S₂)]) / n

    — the principled "is this feature worth binning on" test behind
    supervised binning and decision-stump pruning (decision_stump
    maximizes Gini; this is the entropy/MDL sibling with a built-in
    stop).

    Determinism: every entropy is ln(n) − (Σ c·ln c)/n over EXACT
    int64 class counts with the c·ln c terms as per-candidate scalar
    chains (class count per side comes from integer cumsums — no
    folds); the winner is (gain desc, cut asc) via one window; log₂
    conversions use the 1/ln2 python literal.  Candidates are the
    distinct values except the max (cut at v ⇒ left = x ≤ v).

    Shape: one (group, value) aggregate + cumsum windows + one
    rank window.  ``max_n`` guards the count path in-plan.

    Returns ``(*group_cols, n, k_classes, split_value, gain_nats,
    threshold_nats, accepted)`` — groups with one distinct value or
    one class yield NULL split (nothing to cut), accepted false.
    """
    import math as _m

    g = list(group_cols)
    y = F.col(label_col).cast("int")
    base = df.select(*g, F.col(val_col).cast("long").alias("_x"),
                     F.when(y == 1, 1).otherwise(0).alias("_y"))
    vals = (base.groupBy(*g, "_x")
            .agg(F.count(F.lit(1)).alias("_c"),
                 F.sum("_y").alias("_c1")))
    w = Window.partitionBy(*g).orderBy("_x")
    wg = Window.partitionBy(*g)
    cum = vals.select(
        *g, "_x",
        F.sum("_c").over(w).alias("_nl"),
        F.sum("_c1").over(w).alias("_nl1"),
        F.sum("_c").over(wg).alias("_n"),
        F.sum("_c1").over(wg).alias("_n1"),
        F.max("_x").over(wg).alias("_xmax"))
    n = F.when(
        F.col("_n") > max_n,
        F.raise_error(F.concat(
            F.lit(f"mdlp_split: group exceeds {max_n} rows: "),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))

    def clogc(c):
        return F.when(c > 0, c.cast("double")
                      * F.log(c.cast("double"))).otherwise(F.lit(0.0))

    def ent(n_, c1):
        # ln(n) − (c1·ln c1 + c0·ln c0)/n ; 0 for empty side
        c0 = n_ - c1
        return F.when(n_ > 0, F.log(n_.cast("double"))
                      - (clogc(c1) + clogc(c0)) / n_.cast("double")) \
            .otherwise(F.lit(0.0))

    def kcls(n_, c1):
        return (F.when(c1 > 0, 1).otherwise(0)
                + F.when(n_ - c1 > 0, 1).otherwise(0))

    nl, nl1 = F.col("_nl"), F.col("_nl1")
    nr, nr1 = n - nl, F.col("_n1") - nl1
    hs = ent(n, F.col("_n1"))
    h1 = ent(nl, nl1)
    h2 = ent(nr, nr1)
    gain = hs - (nl.cast("double") / n.cast("double")) * h1 \
        - (nr.cast("double") / n.cast("double")) * h2
    k = kcls(n, F.col("_n1"))
    k1 = kcls(nl, nl1)
    k2 = kcls(nr, nr1)
    ln2 = _m.log(2.0)
    delta = (F.log((F.pow(F.lit(3.0), k.cast("double")) - 2.0))
             / F.lit(ln2)
             - (k.cast("double") * hs - k1.cast("double") * h1
                - k2.cast("double") * h2) / F.lit(ln2))
    thr = ((F.log((n - 1).cast("double")) / F.lit(ln2) + delta)
           / n.cast("double")) * F.lit(ln2)   # back to nats
    cand = (cum.filter(F.col("_x") < F.col("_xmax"))
            .select(*g, F.col("_x").alias("split_value"),
                    n.alias("n"), k.alias("k_classes"),
                    gain.alias("gain_nats"),
                    thr.alias("threshold_nats")))
    wb = Window.partitionBy(*g).orderBy(
        F.col("gain_nats").desc(), F.col("split_value").asc())
    best = (cand.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") == 1)
            .select(*g, "n", "k_classes", "split_value", "gain_nats",
                    "threshold_nats",
                    (F.col("gain_nats") > F.col("threshold_nats"))
                    .alias("accepted")))
    allg = (cum.groupBy(*g)
            .agg(F.max("_n").alias("_tn"), F.max("_n1").alias("_tn1")))
    tn = F.when(
        F.col("_tn") > max_n,
        F.raise_error(F.concat(
            F.lit(f"mdlp_split: group exceeds {max_n} rows: "),
            F.col("_tn").cast("string"))).cast("long")
    ).otherwise(F.col("_tn"))
    allg = allg.select(*g, tn.alias("n"),
                       kcls(F.col("_tn"), F.col("_tn1"))
                       .alias("_kall"))
    out = allg.join(best.drop("n"), g, "left")
    return out.select(*g, "n",
                      F.coalesce(F.col("k_classes"), F.col("_kall"))
                      .alias("k_classes"),
                      "split_value", "gain_nats", "threshold_nats",
                      F.coalesce(F.col("accepted"), F.lit(False))
                      .alias("accepted"))


def woe_iv(df: DataFrame, bin_col: str, target_col: str) -> DataFrame:
    """Weight-of-evidence / information-value binning profile (the
    credit-scoring feature screen; Siddiqi 2006): per bin of a
    candidate feature,

        WOE_i = ln( (g_i/G) / (b_i/B) ) = ln( g_i·B / (b_i·G) )
        IV_i  = (g_i/G − b_i/B) · WOE_i

    with g/b the good/bad (target false/true) counts.  Σ IV_i is the
    screening statistic (<0.02 useless, >0.3 strong).

    Exactness: the ln argument is ONE ratio of exact int64 products
    (the js_divergence discipline) and WOE is µ-nat-quantized
    (floor(ln·10⁶ + 0.5)); IV_i's numerator (g_i·B − b_i·G)·woe_q is
    exact int64 — in-plan guards raise past |G·B| bounds rather than
    silently wrapping.  Bins empty on either side get NULL WOE and
    are excluded from IV (the standard degenerate-bin rule; apply a
    smoothing prior upstream if you need them).

    One map-side-combinable groupBy + a broadcast global join.
    Returns ``(bin, n, n_good, n_bad, woe_micro, iv_part)``.
    """
    t = F.col(target_col).cast("boolean")
    per = (df.groupBy(F.col(bin_col).alias("bin"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((~t).cast("long")).alias("n_good"),
                F.sum(t.cast("long")).alias("n_bad")))
    tot = per.groupBy().agg(F.sum("n_good").alias("_G"),
                            F.sum("n_bad").alias("_B"))
    j = per.crossJoin(F.broadcast(tot))
    guard = F.when(
        (F.col("_G") > F.lit(2_000_000_000))
        | (F.col("_B") > F.lit(2_000_000_000)),
        F.raise_error(F.lit(
            "woe_iv: class totals exceed the exact-int64 product "
            "bound; pre-aggregate or sample"))
    ).otherwise(F.col("_G"))
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    woe_q = F.when(ok, F.floor(
        F.log((F.col("n_good") * F.col("_B")).cast("double")
              / (F.col("n_bad") * guard).cast("double"))
        * 1000000.0 + F.lit(0.5)).cast("long"))
    return (j.withColumn("woe_micro", woe_q)
            .select(
                "bin", "n", "n_good", "n_bad", "woe_micro",
                F.when(
                    ok,
                    # the int64 diff is exact under the guard; the woe
                    # factor multiplies in double (diff*woe would wrap)
                    ((F.col("n_good") * F.col("_B")
                      - F.col("n_bad") * F.col("_G")).cast("double")
                     / (F.col("_G") * F.col("_B")).cast("double"))
                    * (F.col("woe_micro").cast("double")
                       / F.lit(1000000.0))).alias("iv_part")))
