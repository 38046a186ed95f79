"""N-gram language-model statistics (KenLM-style count tables).

Training-data pipelines keep n-gram count tables for perplexity-based
quality filtering and contamination scoring.  Everything here is exact
integer counting over the shared whitespace tokenizer (text.py `_words`);
counts are trivially mergeable (sums), so the partial aggregation /
incremental-refresh machinery (temporal.refresh_rollup_partial) applies
unchanged to LM tables.

Scale: gram construction is in-row (HOF over the token array — zero
shuffle); the count table is ONE groupBy whose map-side combine collapses
each partition's duplicate grams before the exchange.  The n-gram key
space explodes with corpus size — standard practice (KenLM) prunes
singleton counts: pass ``min_count`` (applied AFTER aggregation; an exact
pre-filter is impossible, but the heavy-hitter sketch (sketch.py) can
cheaply pre-select candidate contexts when only hot contexts matter).
Conditional tables add one more exchange for the context total.

No BOS/EOS padding: grams live strictly inside a document's token
sequence (offsets 0..len-n), matching the oracle transcription row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _words

__all__ = ["ngram_counts", "conditional_counts", "continuation_counts"]


def _gram_pairs(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """One row per n-gram instance: (context = first n-1 tokens joined,
    token = last token).  In-row HOFs; empty for docs shorter than n."""
    if n < 2:
        raise ValueError("n must be >= 2 (unigrams have no context)")
    d = df.withColumn("_toks", _words(F.col(text_col)))
    sz = F.size("_toks")
    pairs = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.struct(
                F.array_join(F.slice("_toks", i + 1, n - 1), " ")
                .alias("context"),
                F.element_at("_toks", (i + n).cast("int")).alias("token"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<context:string,token:string>>"))
    return (d.select(F.explode(pairs).alias("p"))
            .select("p.context", "p.token"))


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 3,
                 min_count: int = 1) -> DataFrame:
    """(gram, cnt): the raw n-gram count table."""
    pairs = _gram_pairs(df, text_col, n)
    out = (pairs.select(F.concat_ws(" ", "context", "token").alias("gram"))
           .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")))
    return out.filter(F.col("cnt") >= min_count) if min_count > 1 else out


def conditional_counts(df: DataFrame, text_col: str = "text", n: int = 3,
                       min_count: int = 1) -> DataFrame:
    """(context, token, cnt, ctx_cnt): the conditional table behind
    count-ratio probabilities P(token|context) = cnt/ctx_cnt — kept as the
    exact integer pair, never a rounded float (cross-engine exactness and
    lossless mergeability)."""
    counts = (_gram_pairs(df, text_col, n)
              .groupBy("context", "token")
              .agg(F.count(F.lit(1)).alias("cnt")))
    ctx = Window.partitionBy("context")
    out = counts.withColumn("ctx_cnt", F.sum("cnt").over(ctx))
    return out.filter(F.col("cnt") >= min_count) if min_count > 1 else out


def continuation_counts(df: DataFrame, text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """(token, n_contexts): distinct left-context counts — the
    Kneser-Ney continuation statistic (how many distinct contexts a word
    completes, not how often it occurs)."""
    return (_gram_pairs(df, text_col, n)
            .select("context", "token").distinct()
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_contexts")))


def gram_instances(df: DataFrame, text_col: str = "text", n: int = 3,
                   id_col: str = "doc_id") -> DataFrame:
    """One row per n-gram instance WITH provenance: (id, pos, context,
    token) — the per-document face of ``_gram_pairs`` (same tokenizer,
    same windowing), for joins back against the count tables."""
    if n < 2:
        raise ValueError("n must be >= 2")
    d = df.withColumn("_toks", _words(F.col(text_col)))
    sz = F.size("_toks")
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.array_join(F.slice("_toks", i + 1, n - 1), " ")
                .alias("context"),
                F.element_at("_toks", (i + n).cast("int")).alias("token"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<pos:long,context:string,token:string>>"))
    return (d.select(id_col, F.explode(grams).alias("g"))
            .select(id_col, "g.pos", "g.context", "g.token"))


def doc_lm_scores(df: DataFrame, text_col: str = "text", n: int = 3,
                  id_col: str = "doc_id",
                  lm: "DataFrame | None" = None) -> DataFrame:
    """Per-document LM score (the CCNet-style perplexity quality
    signal): mean log P(token|context) under the corpus conditional
    count table — ``ln(cnt/ctx_cnt)`` per gram, summed in DOCUMENT ORDER
    (pinned left fold over the sorted (pos, lp) list) and divided by the
    gram count, so the doubles are bit-reproducible cross-engine (IEEE
    divide + libm ln on identical inputs, fixed association).

    Documents shorter than ``n`` tokens have no grams and are absent
    from the output (score undefined).  Scale: the LM table joins on the
    gram key — a plain hash join that pre-filters to the corpus's own
    grams; at 100 TB prune the table (``min_count``) and the join side
    stays proportional to the pruned vocabulary, or broadcast it when it
    fits.  Self-scoring (lm=None) derives the table from ``df`` itself.
    """
    inst = gram_instances(df, text_col, n, id_col)
    if lm is None:
        lm = conditional_counts(df, text_col, n)
    joined = inst.join(lm, ["context", "token"])
    lp = F.log(F.col("cnt").cast("double") / F.col("ctx_cnt").cast("double"))
    entries = F.collect_list(F.struct(F.col("pos"), lp.alias("lp")))
    total = F.aggregate(F.sort_array(entries), F.lit(0.0),
                        lambda a, e: a + e["lp"])
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 total.alias("sum_logprob"))
            .withColumn("avg_logprob",
                        F.col("sum_logprob") / F.col("n_grams")))
