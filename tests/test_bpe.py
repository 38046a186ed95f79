"""BPE (operators/bpe.py): trainer vs the reference algorithm, encoder
twin equality, fold semantics, plan shape."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.bpe import (
    bpe_encode, char_pair_counts, py_bpe_word, train_bpe, word_freqs)


def _py_train(word_freq: dict, n_merges: int):
    """Reference Sennrich trainer on a word->freq dict."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freq.items():
            syms = vocab[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
    ]
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_char_pair_counts_exact(spark):
    df = spark.createDataFrame([(1, "ab ab a xyz")], "id long, text string")
    got = {(r["sym_a"], r["sym_b"]): r["cnt"]
           for r in char_pair_counts(df).collect()}
    assert got == {("a", "b"): 2, ("x", "y"): 1, ("y", "z"): 1}


def test_trainer_matches_reference(spark, corpus):
    wf = {r["word"]: r["freq"] for r in word_freqs(corpus).collect()}
    expected = _py_train(wf, 12)
    got = train_bpe(corpus, n_merges=12)
    assert got == expected
    assert len(got) >= 6  # real merges learned, not an early stop


def test_trainer_early_stop_no_repeats(spark):
    df = spark.createDataFrame([(1, "abc def ghi")], "id long, text string")
    assert train_bpe(df, n_merges=10) == []


def test_encoder_matches_python_twin(spark, corpus):
    merges = train_bpe(corpus, n_merges=10)
    rank = {m: i for i, m in enumerate(merges)}
    out = bpe_encode(corpus, merges).collect()
    for r in out:
        expect = []
        for w in r["text"].lower().split():
            expect.extend(py_bpe_word(w, rank))
        assert r["bpe_tokens"] == expect
        # lossless: concatenation rebuilds the words
        assert "".join(r["bpe_tokens"]) == r["text"].lower().replace(" ", "")


def test_encoder_compresses(spark, corpus):
    merges = train_bpe(corpus, n_merges=10)
    out = bpe_encode(corpus, merges).select(
        F.sum(F.size("bpe_tokens")).alias("bpe"),
        F.sum(F.length(F.regexp_replace("text", r"\s", ""))).alias("chars"),
    ).head()
    assert out["bpe"] < out["chars"]


def test_pair_count_plan_single_shuffle(spark, corpus):
    plan = char_pair_counts(corpus)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan
