"""Token co-occurrence mining with PMI ranking — the association /
collocation primitive (market-basket on documents).

Shape: distinct (doc, token) pre-pass → per-doc token self-join with
``tok_a < tok_b`` → one map-side-combinable pair count → two small
joins against the token document frequencies → PMI.

Scale notes (the "curse of the last reducer" job):

- the per-doc self-join is quadratic in the doc's DISTINCT token count
  — cap pathological docs upstream (cap_per_group in
  operators/splits.py) exactly as the reference-free co-occurrence
  literature prescribes; the distinct pre-pass already collapses
  repeated tokens so the bound is vocabulary-per-doc, not length;
- hot PAIRS (stopword×stopword) are just counters under a
  map-side-combinable groupBy — they never materialize a row set, so
  pair skew is benign (unlike the setsim candidate join);
- PMI = ln((n_ab·N) / (n_a·n_b)) is computed as one division of two
  EXACT long products followed by one ln — the pinned op order that
  bit-matches across engines (the BM25 discipline).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cooccurrence_pmi", "slope_one_topk"]


def cooccurrence_pmi(docs: DataFrame, id_col: str, text_col: str, *,
                     min_count: int = 1,
                     min_token_len: int = 3) -> DataFrame:
    """Token pairs co-occurring in ≥ ``min_count`` documents with their
    PMI: ``(w_a, w_b, n_ab, n_a, n_b, pmi)``, ``w_a < w_b``.

    Tokenization is the package's pinned whitespace convention
    (operators/text.py _WORD_SPLIT) on lowercased text, tokens shorter
    than ``min_token_len`` dropped.
    """
    from .text import _words

    # checkpoint the distinct token set: it feeds THREE consumers
    # (n_docs, dfreq, both sides of the pair self-join) — without it
    # the corpus is re-tokenized per consumer
    toks = (docs.select(
        F.col(id_col).alias("doc"),
        F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= min_token_len)
        .distinct()
        .localCheckpoint())
    n_docs = toks.select("doc").distinct().count()
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (a.join(b, (F.col("a.doc") == F.col("b.doc"))
                    & (F.col("a.w") < F.col("b.w")))
             .groupBy(F.col("a.w").alias("w_a"),
                      F.col("b.w").alias("w_b"))
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_count))
    fa = dfreq.select(F.col("w").alias("w_a"), F.col("n_w").alias("n_a"))
    fb = dfreq.select(F.col("w").alias("w_b"), F.col("n_w").alias("n_b"))
    return (pairs.join(fa, "w_a").join(fb, "w_b")
            .select("w_a", "w_b", "n_ab", "n_a", "n_b",
                    F.log((F.col("n_ab") * F.lit(n_docs)).cast("double")
                          / (F.col("n_a") * F.col("n_b")).cast("double"))
                    .alias("pmi")))


def assoc_rules(df: DataFrame, basket_col: str, item_col: str,
                min_count: int = 1) -> DataFrame:
    """Association rules over (basket, item) pairs — the market-basket
    classic: for every directed item pair A→B, exact support /
    confidence / lift from exact integer counts (Agrawal-Srikant
    support-confidence framework; PMI's linear-scale sibling with
    directional semantics).

    ``conf(A→B) = c_AB/c_A`` and ``lift = n·c_AB/(c_A·c_B)`` are single
    pinned divides over exact longs (n = basket count; c_AB from one
    basket self-join on DISTINCT (basket, item) rows — the same
    distinct pre-pass as colocation_pairs, so duplicate events never
    inflate support).

    Scale shape: distinct → one basket-keyed self-join (quadratic in
    basket SIZE, not corpus — cap giant baskets upstream like every
    pair op) → one (A, B) groupBy; item totals and n are
    broadcast-sized.  Hot item pairs are counters, not row sets.

    Returns ``(ant, cons, n_baskets, c_a, c_b, c_ab, conf, lift)`` for
    pairs with c_ab ≥ min_count.
    """
    # NULL basket ids would inflate item supports while dropping out of
    # n_baskets and the self-join (NULL != NULL) — exclude them, and
    # NULL items, up front
    b = (df.filter(F.col(basket_col).isNotNull()
                   & F.col(item_col).isNotNull())
         .select(F.col(basket_col).alias("bk"),
                 F.col(item_col).alias("it")).distinct())
    totals = b.agg(F.count_distinct("bk").alias("n_baskets"))
    items = b.groupBy("it").agg(F.count(F.lit(1)).alias("c"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (l.join(r, (F.col("l.bk") == F.col("r.bk"))
                    & (F.col("l.it") != F.col("r.it")))
             .groupBy(F.col("l.it").alias("ant"),
                      F.col("r.it").alias("cons"))
             .agg(F.count(F.lit(1)).alias("c_ab"))
             .filter(F.col("c_ab") >= min_count))
    ca = items.select(F.col("it").alias("ant"), F.col("c").alias("c_a"))
    cb = items.select(F.col("it").alias("cons"), F.col("c").alias("c_b"))
    j = (pairs.join(F.broadcast(ca), "ant")
         .join(F.broadcast(cb), "cons")
         .crossJoin(F.broadcast(totals)))
    conf = F.col("c_ab").cast("double") / F.col("c_a").cast("double")
    lift = ((F.col("n_baskets") * F.col("c_ab")).cast("double")
            / (F.col("c_a") * F.col("c_b")).cast("double"))
    return j.select("ant", "cons", "n_baskets", "c_a", "c_b", "c_ab",
                    conf.alias("conf"), lift.alias("lift"))


def g2_collocations(docs: DataFrame, id_col: str, text_col: str, *,
                    min_count: int = 1) -> DataFrame:
    """Adjacent-bigram collocations ranked by Dunning's log-likelihood
    G² (Dunning, CL'93) — the significance-aware alternative to PMI
    (PMI over-ranks rare pairs; G² weights evidence by count).

    Exactness: all 2×2 table cells are exact longs derived from ONE
    bigram count pass (k11 = c(a,b); row a = c(a,·); col b = c(·,b);
    N = total bigrams), each of the four ``k·ln(k·N / (row·col))``
    terms is one division of exact long products + one ln on identical
    doubles, and the four terms add in one pinned order — the BM25
    bit-stability discipline.  Products stay in int64 while
    N < ~3·10⁹ bigrams (N² < 2⁶³); shard the corpus past that.

    Shape: bigrams are built IN-ROW (arrays_zip of the token array and
    its shift — zero extra shuffle), then one map-side-combinable
    groupBy; the row/column marginals are two more tiny groupBys joined
    back.  No self-join at all — adjacency, unlike co-occurrence,
    needs none.
    """
    from .text import _words

    a = _words(F.col(text_col))
    n1 = F.greatest(F.size(a) - 1, F.lit(0))
    bi = docs.select(
        F.explode(F.zip_with(
            F.slice(a, 1, n1), F.slice(a, 2, n1),
            lambda x, y: F.struct(x.alias("w_a"), y.alias("w_b")))
        ).alias("p"))
    pairs = bi.select("p.w_a", "p.w_b")
    cnt = (pairs.groupBy("w_a", "w_b")
           .agg(F.count(F.lit(1)).alias("n_ab")).localCheckpoint())
    n_tot = cnt.agg(F.sum("n_ab").alias("n")).first()["n"]
    if n_tot is None:
        n_tot = 0  # zero bigrams: cnt is empty, result is empty too
    ra = cnt.groupBy("w_a").agg(F.sum("n_ab").alias("n_a"))
    cb = cnt.groupBy("w_b").agg(F.sum("n_ab").alias("n_b"))
    j = (cnt.filter(F.col("n_ab") >= min_count)
         .join(ra, "w_a").join(cb, "w_b"))

    n = F.lit(int(n_tot)).cast("long")
    k11 = F.col("n_ab")
    k12 = F.col("n_a") - k11
    k21 = F.col("n_b") - k11
    k22 = n - F.col("n_a") - F.col("n_b") + k11

    def term(k, row, colm):
        return F.when(
            k > 0,
            k.cast("double") * F.log((k * n).cast("double")
                                     / (row * colm).cast("double"))
        ).otherwise(F.lit(0.0))

    t11 = term(k11, F.col("n_a"), F.col("n_b"))
    t12 = term(k12, F.col("n_a"), n - F.col("n_b"))
    t21 = term(k21, n - F.col("n_a"), F.col("n_b"))
    t22 = term(k22, n - F.col("n_a"), n - F.col("n_b"))
    g2 = F.lit(2.0) * (((t11 + t12) + t21) + t22)
    return j.select("w_a", "w_b", "n_ab", "n_a", "n_b",
                    n.alias("n_total"), g2.alias("g2"))


def item_item_topk(baskets: DataFrame, basket_col: str, item_col: str,
                   *, k: int = 10, min_cooc: int = 2,
                   scale: int = 10**12) -> DataFrame:
    """Item-item collaborative filtering: top-``k`` neighbors per item
    by cosine similarity over basket co-occurrence (the classic
    Sarwar et al. WWW'01 item-based CF shape, re-derived for
    DataFrames).

    Exact-integer ranking: cosine(i,j) = n_ij / √(n_i·n_j) is ranked
    by the monotone square ``score_q = (n_ij²·scale) // (n_i·n_j)`` —
    exact int64 floor-div (numerator non-negative, so truncating and
    flooring division agree cross-engine), zero float rounding in the
    output.  int64 bound ENFORCED IN-PLAN (raise_error, never a
    silent wrap): n_ij ≤ √(2⁶³/scale) — 3·10³ at the default
    scale 10¹²; co-occurrence counts beyond that need a smaller
    scale (10⁶ gives headroom to n_ij ≈ 3M at fleet scale).

    Scale shape: one DISTINCT (basket, item) pre-pass; the per-basket
    pair self-join is quadratic in basket WIDTH only (cap pathological
    baskets upstream with splits.cap_per_group); pair counts are one
    map-side-combinable groupBy; the two item-frequency joins hit the
    AGGREGATED pair table (|pairs| rows, not |baskets·width²|); top-k
    is a per-item window over the scored pair table.  No driver
    collect, no full similarity matrix — only pairs that actually
    co-occur ≥ min_cooc times materialize.
    """
    bi = baskets.select(F.col(basket_col).alias("b"),
                        F.col(item_col).alias("i")).distinct()
    left = bi.select("b", F.col("i").alias("i_a"))
    right = bi.select("b", F.col("i").alias("i_b"))
    pairs = (left.join(right, "b")
             .filter(F.col("i_a") < F.col("i_b"))
             .groupBy("i_a", "i_b")
             .agg(F.count(F.lit(1)).alias("n_ij"))
             .filter(F.col("n_ij") >= int(min_cooc)))
    freq = bi.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    fa = freq.select(F.col("i").alias("i_a"), F.col("n_i").alias("n_a"))
    fb = freq.select(F.col("i").alias("i_b"), F.col("n_i").alias("n_b"))
    max_nij = math.isqrt((2**63 - 1) // int(scale))
    score = F.when(
        F.col("n_ij") > max_nij,
        F.raise_error(F.concat(
            F.lit("item_item_topk: co-occurrence count exceeds the "
                  f"exact-int64 bound for scale={int(scale)} "
                  f"(n_ij <= {max_nij}); lower scale: n_ij="),
            F.col("n_ij").cast("string"))).cast("long")
    ).otherwise(
        F.expr(f"(n_ij * n_ij * CAST({int(scale)} AS BIGINT))"
               " div (n_a * n_b)").cast("long"))
    scored = (pairs.join(fa, "i_a").join(fb, "i_b")
              .withColumn("score_q", score))
    # symmetrize AFTER scoring (each undirected pair scored once)
    sym = (scored.select(F.col("i_a").alias("item"),
                         F.col("i_b").alias("neighbor"),
                         "n_ij", "score_q")
           .unionByName(
               scored.select(F.col("i_b").alias("item"),
                             F.col("i_a").alias("neighbor"),
                             "n_ij", "score_q")))
    from pyspark.sql import Window as W
    w = W.partitionBy("item").orderBy(
        F.col("score_q").desc(), F.col("neighbor"))
    return (sym.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k))
            .select("item", "rank", "neighbor", "n_ij", "score_q"))


def slope_one_topk(ratings: DataFrame, user_col: str, item_col: str,
                   rating_col: str, *, k: int, min_support: int = 2,
                   scale: int = 1_000_000,
                   predict_filter=None) -> DataFrame:
    """Weighted Slope-One rating prediction (Lemire & Maclachlan
    2005): deviation dev(j,i) = Σ_u(r_uj − r_ui)/|U_ji| over co-raters,
    predicted rating P(u,j) = Σ_i (dev(j,i) + r_ui)·c_ji / Σ_i c_ji —
    the simplest serious CF predictor, and the rating-valued sibling
    of :func:`item_item_topk` (which ranks by co-occurrence only).

    Exact rational end-to-end: the weighted form TELESCOPES —
    P(u,j) = Σ_i (sum_diff_ji + r_ui·c_ji) / Σ_i c_ji with
    sum_diff_ji = Σ_u(r_uj − r_ui) an exact long, so the prediction is
    an exact integer ``pred_num / pred_den`` (no per-pair division at
    all); ranking uses the floor-div ``score_q = pred_num·scale div
    pred_den`` with the item id as tie-break (the item_cf recipe).

    Already-rated items are anti-joined out.  ``min_support`` prunes
    deviation pairs with fewer than that many co-raters — the scale
    knob: the deviation table is bounded by co-RATED pairs
    (Σ_u basket_u², the assoc_rules shape — cap basket sizes upstream
    for power-law users), never |items|².

    ``predict_filter`` (optional Column predicate on the user column)
    restricts WHOSE predictions are computed — pushed before the
    candidate join, so scoring 1% of users costs 1% of the join.

    Returns ``(user, rank, item, pred_num, pred_den, score_q)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    r = ratings.select(F.col(user_col).alias("u"),
                       F.col(item_col).alias("i"),
                       F.col(rating_col).cast("long").alias("r"))
    a = r.select("u", F.col("i").alias("j"), F.col("r").alias("rj"))
    b = r.select("u", F.col("i").alias("i"), F.col("r").alias("ri"))
    devs = (a.join(b, "u")
            .filter(F.col("j") != F.col("i"))
            .groupBy("j", "i")
            .agg(F.count(F.lit(1)).cast("long").alias("c"),
                 F.sum(F.col("rj") - F.col("ri")).cast("long")
                 .alias("sum_diff"))
            .filter(F.col("c") >= min_support))
    probe = r.filter(predict_filter) if predict_filter is not None else r
    cand = (probe.join(devs, "i")
            .groupBy(F.col("u").alias("user"), F.col("j").alias("item"))
            .agg(F.sum(F.col("sum_diff") + F.col("r") * F.col("c"))
                 .cast("long").alias("pred_num"),
                 F.sum("c").cast("long").alias("pred_den")))
    rated = probe.select(F.col("u").alias("user"),
                         F.col("i").alias("item"))
    unseen = cand.join(rated, ["user", "item"], "left_anti")
    score_q = ((F.col("pred_num") * F.lit(scale)
                - F.pmod(F.col("pred_num") * F.lit(scale),
                         F.col("pred_den")))
               / F.col("pred_den")).cast("long")
    w = Window.partitionBy("user").orderBy(
        F.col("score_q").desc(), F.col("item").asc())
    return (unseen.withColumn("score_q", score_q)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("user", "rank", "item", "pred_num", "pred_den",
                    "score_q"))
