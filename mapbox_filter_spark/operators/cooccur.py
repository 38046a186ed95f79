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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_pmi"]


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
