"""N-gram LM statistics (operators/lm.py): hand-checked counts, short-doc
edges, mergeability, and plan shape."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.lm import (
    conditional_counts, continuation_counts, ngram_counts)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat ran"),
         (3, "cat"),            # shorter than n: contributes nothing
         (4, ""),               # empty
         (5, "  The   CAT sat  ")],  # normalization: lower + collapse
        "doc_id long, text string")


def _d(df, *cols):
    return {r[cols[0]]: r[cols[-1]] for r in df.collect()}


def test_bigram_counts_exact(spark, corpus):
    got = _d(ngram_counts(corpus, n=2), "gram", "cnt")
    assert got["the cat"] == 3  # docs 1, 2, 5 (normalized)
    assert got["cat sat"] == 2
    assert got["sat on"] == 1
    assert "cat" not in got  # no unigram leakage


def test_trigram_conditional(spark, corpus):
    got = {(r["context"], r["token"]): (r["cnt"], r["ctx_cnt"])
           for r in conditional_counts(corpus, n=3).collect()}
    # context "the cat": sat (docs 1,5), ran (doc 2) -> ctx_cnt 3
    assert got[("the cat", "sat")] == (2, 3)
    assert got[("the cat", "ran")] == (1, 3)
    assert got[("cat sat", "on")] == (1, 1)
    # doc 3 ("cat") and doc 4 ("") contribute no trigrams: every context
    # here is exactly 2 tokens
    assert all(len(c.split(" ")) == 2 for (c, _t) in got)


def test_continuation_counts(spark, corpus):
    got = _d(continuation_counts(corpus, n=2), "token", "n_contexts")
    # "cat" completes contexts {"the"} only -> 1 distinct context
    assert got["cat"] == 1
    # "sat" completes {"cat"} -> 1
    assert got["sat"] == 1


def test_counts_merge_across_splits(spark, corpus):
    """Count tables from disjoint corpus halves sum to the full table —
    the mergeable-partial property incremental refresh relies on."""
    full = _d(ngram_counts(corpus, n=2), "gram", "cnt")
    a = _d(ngram_counts(corpus.filter("doc_id <= 2"), n=2), "gram", "cnt")
    b = _d(ngram_counts(corpus.filter("doc_id > 2"), n=2), "gram", "cnt")
    merged = dict(a)
    for g, c in b.items():
        merged[g] = merged.get(g, 0) + c
    assert merged == full


def test_min_count_prune(spark, corpus):
    got = _d(ngram_counts(corpus, n=2, min_count=2), "gram", "cnt")
    assert got and all(c >= 2 for c in got.values())


def test_ngram_single_shuffle(spark, corpus):
    plan = ngram_counts(corpus, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan


def test_n_must_exceed_one(spark, corpus):
    with pytest.raises(ValueError):
        conditional_counts(corpus, n=1)
