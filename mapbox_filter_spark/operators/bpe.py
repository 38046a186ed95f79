"""Byte-pair encoding: distributed pair statistics, a Sennrich-style
trainer, and a vocabulary-applying encoder.

The text block's `token_count(mode='bpe')` is a regex approximation; this
module is the real thing at the granularity a corpus engine owns:

- ``char_pair_counts``: corpus-wide adjacent-symbol pair counts — the
  statistic every BPE training step maximizes (SQL-expressible → oracle
  gate).
- ``train_bpe``: the reference algorithm (Sennrich et al. 2016) run
  data-parallel: the corpus collapses ONCE to a distinct-word frequency
  table (the standard trick — merge decisions depend only on word
  shapes × frequencies), then each merge round is one weighted pair-count
  aggregation + an in-row fold applying the winning merge.  Deterministic
  tiebreak: max count, then lexicographically smallest pair — bit-stable
  across cluster shapes.
- ``bpe_encode``: apply a learned merge list to text.  Arrow-batched
  ``mapInPandas`` with a per-partition word→tokens memo (Zipf makes the
  memo hit rate ~99%); merges ship as a broadcast-sized python list (the
  rank dict), exactly how production tokenizers cache vocab.

Scale notes: training touches the corpus once (the word-freq collapse,
one shuffle); each merge round then runs over DISTINCT WORDS (orders of
magnitude smaller, and shrinking as merges fuse symbols).  ``n_merges``
sequential rounds are inherent to BPE (merge k+1 depends on k) — the
driver loop is the algorithm, not an accident; localCheckpoint per round
keeps lineage flat.  Encoding is embarrassingly parallel.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import _words

__all__ = ["char_pair_counts", "word_freqs", "train_bpe", "bpe_encode",
           "py_bpe_word"]


def char_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(sym_a, sym_b, cnt): adjacent CHARACTER pair counts over every
    word instance — the round-0 BPE statistic.  In-row HOFs + one
    groupBy."""
    d = df.select(F.explode(_words(F.col(text_col))).alias("w"))
    n = F.length("w")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.col("w").substr(i + 1, F.lit(1)).alias("sym_a"),
                F.col("w").substr(i + 2, F.lit(1)).alias("sym_b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<sym_a:string,sym_b:string>>"))
    return (d.select(F.explode(pairs).alias("p"))
            .groupBy("p.sym_a", "p.sym_b")
            .agg(F.count(F.lit(1)).alias("cnt")))


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the distinct-word collapse BPE training runs on."""
    return (df.select(F.explode(_words(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _merge_adjacent(syms: Column, a: str, b: str) -> Column:
    """Fold an array<string>, fusing every adjacent (a, b) left-to-right
    (non-overlapping, like the reference implementation)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.struct(F.array().cast("array<string>").alias("out"),
                 F.lit(None).cast("string").alias("carry")),
        lambda acc, s: F.when(
            (acc["carry"] == F.lit(a)) & (s == F.lit(b)),
            F.struct(F.concat(acc["out"], F.array(merged)).alias("out"),
                     F.lit(None).cast("string").alias("carry")),
        ).otherwise(
            F.struct(
                F.when(acc["carry"].isNotNull(),
                       F.concat(acc["out"], F.array(acc["carry"])))
                .otherwise(acc["out"]).alias("out"),
                s.alias("carry"))),
        lambda acc: F.when(
            acc["carry"].isNotNull(),
            F.concat(acc["out"], F.array(acc["carry"]))
        ).otherwise(acc["out"]),
    )


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 50) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus (Sennrich et al.).
    Returns the ranked merge list.  Stops early when no pair repeats."""
    wf = word_freqs(df, text_col)
    syms = F.split(F.col("word"), "")
    # Spark split('', on '') appends one trailing '' — strip empties
    syms = F.filter(syms, lambda s: s != "")
    table = wf.select("word", "freq", syms.alias("syms")).localCheckpoint()

    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.element_at("syms", (i + 1).cast("int")).alias("a"),
                    F.element_at("syms", (i + 2).cast("int")).alias("b"))),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (table.select(F.col("freq"), F.explode(pairs).alias("p"))
               .groupBy("p.a", "p.b")
               .agg(F.sum("freq").alias("cnt"))
               .orderBy(F.col("cnt").desc(), F.col("a").asc(),
                        F.col("b").asc())
               .limit(1).collect())
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        table = (table.withColumn("syms", _merge_adjacent(F.col("syms"),
                                                          a, b))
                 .localCheckpoint())
    return merges


def py_bpe_word(word: str, rank: dict) -> List[str]:
    """Reference per-word encoder: repeatedly fuse the best-ranked
    adjacent pair (left-to-right, non-overlapping per round)."""
    syms = list(word)
    while len(syms) >= 2:
        best, best_rank = None, None
        for p in zip(syms, syms[1:]):
            r = rank.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        a, b = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(df: DataFrame, merges: Sequence[Tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Append ``out_col: array<string>`` — the document's BPE tokens under
    the learned merge list.  Arrow-batched; per-partition word memo."""
    rank = {tuple(m): i for i, m in enumerate(merges)}
    fields = list(df.schema.fields) + [
        T.StructField(out_col, T.ArrayType(T.StringType()))]
    schema = T.StructType(fields)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc: List[str] = []
                for w in (text or "").lower().split():
                    got = memo.get(w)
                    if got is None:
                        got = py_bpe_word(w, rank)
                        memo[w] = got
                    doc.extend(got)
                toks.append(doc)
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return df.mapInPandas(encode, schema)
