"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (regex + array folds) — SQL-mirrorable for the
DuckDB oracle and codegen'd on the executor; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (n-gram heuristic: function words
# are the highest-frequency discriminators between European languages)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "que"),
    "es": ("el", "los", "las", "es", "una", "que"),
}

_WORD_SPLIT = r"\s+"
# BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


from .hof import bind_once  # noqa: F401  (shared HOF once-binding helper)


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), _WORD_SPLIT), lambda w: w != "")


def lang_scores(col: Column) -> Column:
    """map<string,int>: stopword hit count per candidate language."""
    def build(ws):
        return F.map_from_arrays(
            F.array(*[F.lit(l) for l in LANG_MARKERS]),
            F.array(*[
                F.size(F.filter(ws, lambda w: w.isin(*marks)))
                for marks in LANG_MARKERS.values()
            ]),
        )

    return bind_once({"ws": _words(col)}, build)


def lang_id(col: Column, min_hits: int = 1) -> Column:
    """Best-scoring language code, 'und' when nothing scores >= min_hits.

    Ties break by the fixed language order (en, de, fr, es) — deterministic.
    """
    def build(ws):
        best = F.lit("und")
        best_score = F.lit(min_hits - 1)
        for lang, marks in LANG_MARKERS.items():
            score = F.size(F.filter(ws, lambda w: w.isin(*marks)))
            better = score > best_score
            best = F.when(better, F.lit(lang)).otherwise(best)
            best_score = F.when(better, score).otherwise(best_score)
        return best

    return bind_once({"ws": _words(col)}, build)


def token_count(col: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split or 'bpe' (regex symbol-aware)."""
    if mode == "whitespace":
        return F.size(_words(col))
    if mode == "bpe":
        return F.size(
            F.filter(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0),
                     lambda t: t != ""))
    raise ValueError(mode)


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals."""
    n_chars = F.length(col)
    words = _words(col)
    n_words = F.size(words)
    all_stop = [w for marks in LANG_MARKERS.values() for w in marks]
    n_stop = F.size(F.filter(words, lambda w: w.isin(*all_stop)))
    # regexp delta, not a per-char lambda scan (one JVM regex pass vs
    # n_chars interpreted lambda calls); same count, oracle uses the
    # identical REGEXP_REPLACE form
    n_punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[.,!?;:]", ""))
    n_upper = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.when(
            n_words > 0,
            F.round((n_chars - n_words + 1) / n_words, 6)).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_words > 0, F.round(n_stop / n_words, 6)).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0, F.round(n_punct / n_chars, 6)).otherwise(F.lit(0.0)),
        "upper_ratio": F.when(
            n_chars > 0, F.round(n_upper / n_chars, 6)).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards stopword presence and
    moderate length; penalizes punctuation soup and shouting.

    Computed ENTIRELY in integer micro-units (1e-6) — ratios become floor
    divisions, threshold tests become integer cross-multiplications — so
    the score is an exact 6-decimal value with NO float rounding anywhere:
    bit-identical across engines (float ratio rounding hits exact .5
    boundaries whenever a 6-dp ratio is scaled by 2.5, which broke the
    curation oracle's value-hash).

    The counting subtrees (tokenize / stopword hits / punct scan) are
    evaluated ONCE via :func:`bind_once`, not per reference — HOF-heavy
    expressions get no CSE in interpreted eval."""
    all_stop = [w for marks in LANG_MARKERS.values() for w in marks]

    def build(n_chars, n_words, n_stop, n_punct, n_upper):
        length_u = F.when((n_words >= 5) & (n_words <= 100000),
                          F.lit(250_000).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        # stop_ratio * 2.5 capped at 0.25 -> min(n_stop*2_500_000 // n_words,
        # 250_000); true integer division (`div`), not floor-of-double: the
        # exact-integer claim must hold even when the numerator nears 2^53
        stop_u = F.when(
            n_words > 0,
            F.least(F.call_function("div", n_stop * 2_500_000, n_words),
                    F.lit(250_000).cast("long"))) \
            .otherwise(F.lit(0).cast("long"))
        # punct_ratio <= 0.1 <=> n_punct*10 <= n_chars; linear falloff beyond
        punct_ratio_u = F.when(
            n_chars > 0, F.call_function("div", n_punct * 1_000_000, n_chars)
        ).otherwise(F.lit(0).cast("long"))
        punct_u = F.when(n_punct * 10 <= n_chars,
                         F.lit(250_000).cast("long")) \
            .otherwise(F.greatest(
                F.lit(250_000).cast("long") - (punct_ratio_u - 100_000),
                F.lit(0).cast("long")))
        # upper_ratio <= 0.3 <=> n_upper*10 <= n_chars*3
        upper_u = F.when(n_upper * 10 <= n_chars * 3,
                         F.lit(250_000).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        return (length_u + stop_u + punct_u + upper_u) / F.lit(1_000_000.0)

    words = _words(col)
    return bind_once({
        "n_chars": F.length(col).cast("long"),
        "n_words": F.size(words).cast("long"),
        "n_stop": F.size(
            F.filter(words, lambda w: w.isin(*all_stop))).cast("long"),
        # regexp delta, not a per-char lambda scan (see quality_features)
        "n_punct": (F.length(col) - F.length(
            F.regexp_replace(col, r"[.,!?;:]", ""))).cast("long"),
        "n_upper": F.length(F.regexp_replace(col, r"[^A-Z]", ""))
        .cast("long"),
    }, build)


def doc_fingerprint(col: Column, prime: int = 1_000_003,
                    hash_mode: str = "xxhash64") -> Column:
    """Order-sensitive polynomial rolling hash over words:
    fp = fold(acc * prime + h31(word)) mod 2^31.

    The 31-bit modulus keeps ``acc * prime`` below 2^52 (no ANSI long
    overflow, exact in the DuckDB oracle's BIGINT too).  hash_mode='md5'
    makes the word hash DuckDB-computable (see dedup.word_hash64) so the
    fingerprint query gets a full value-hash oracle check."""
    from .dedup import word_hash64

    mod = F.lit(1 << 31).cast("long")
    words = _words(col)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            F.pmod(acc * prime, mod) + F.pmod(word_hash64(w, 0, hash_mode), mod),
            mod),
    )


def _lines(col: Column) -> Column:
    return F.filter(F.split(col, "\n"), lambda l: l != "")


def _run_fold_dup_chars(sorted_arr: Column) -> Column:
    """Characters inside duplicated elements of a SORTED string array:
    one linear fold — when a run reaches length 2 both occurrences count,
    each further repeat adds its own length.  O(n log n) total (the sort),
    NOT the O(n²) a per-element membership count would cost: a 100k-line
    document stays tractable on the executor."""
    zero = F.lit(0).cast("long")
    init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                    zero.alias("dup"))

    def step(a, x):
        same = a["prev"] == x
        run = F.when(same, a["run"] + 1).otherwise(F.lit(1).cast("long"))
        add = (F.when(same & (a["run"] == F.lit(1)), F.length(x) * 2)
               .when(same, F.length(x))
               .otherwise(F.lit(0))).cast("long")
        return F.struct(x.alias("prev"), run.alias("run"),
                        (a["dup"] + add).alias("dup"))

    return F.aggregate(sorted_arr, init, step, lambda a: a["dup"])


def top_ngram(col: Column, n: int = 2) -> Column:
    """struct<gram:string, cnt:long>: the most frequent word n-gram (ties
    break to the lexicographically smallest gram) — the Gopher-style
    top-n-gram repetition signal.  Linear fold over the sorted gram array;
    gram = words joined by single spaces; empty string / 0 when the text
    has fewer than n words.

    The token array binds ONCE (``bind_once``): referencing the tokenizer
    inside the per-gram lambda would re-tokenize the whole document per
    gram — O(n²) re-evaluation, the exact trap interpreted HOF eval sets."""
    def build(ws):
        nw = F.size(ws)
        grams = F.when(
            nw >= n,
            F.transform(
                F.sequence(F.lit(0), nw - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ws, i + j + 1) for j in range(n)])),
        ).otherwise(F.array().cast("array<string>"))
        zero = F.lit(0).cast("long")
        init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                        zero.alias("best"), F.lit("").alias("bestg"))

        def step(a, g):
            run = F.when(a["prev"] == g, a["run"] + 1) \
                .otherwise(F.lit(1).cast("long"))
            better = run > a["best"]  # strict: first (smallest) wins ties
            return F.struct(
                g.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(a["best"]).alias("best"),
                F.when(better, g).otherwise(a["bestg"]).alias("bestg"))

        return F.aggregate(
            F.array_sort(grams), init, step,
            lambda a: F.struct(a["bestg"].alias("gram"),
                               a["best"].alias("cnt")))

    return bind_once({"ws": _words(col)}, build)


def repetition_features(col: Column, ngram_n: int = 2) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    duplicate-line fraction, duplicate-line character fraction, and the
    top word-n-gram character fraction.  Fractions are exact integer
    micro-units (1e-6, floor division) so the DuckDB oracle value-hash
    matches bit-for-bit (same discipline as quality_score)."""
    safe = F.coalesce(col, F.lit(""))
    zero = F.lit(0).cast("long")
    u = F.lit(1_000_000).cast("long")

    def dup_line_frac(ls):
        n_lines = F.size(ls).cast("long")
        dup_lines = (n_lines - F.size(F.array_distinct(ls))).cast("long")
        return F.when(
            n_lines > 0,
            F.call_function("div", dup_lines * u, n_lines)).otherwise(zero)

    def dup_char_frac(ls):
        dup_chars = _run_fold_dup_chars(F.array_sort(ls))
        line_chars = F.aggregate(
            ls, zero, lambda a, x: a + F.length(x).cast("long"))
        return F.when(
            line_chars > 0,
            F.call_function("div", dup_chars * u, line_chars)).otherwise(zero)

    def top_char_frac(top, n_chars):
        return F.when(
            (n_chars > 0) & (top["cnt"] > 0),
            F.call_function(
                "div", top["cnt"] * F.length(top["gram"]).cast("long") * u,
                n_chars)).otherwise(zero)

    lines = _lines(safe)
    return {
        "n_lines": F.size(lines).cast("long"),
        "dup_line_frac_u": bind_once({"ls": lines}, dup_line_frac),
        "dup_char_frac_u": bind_once({"ls": lines}, dup_char_frac),
        "top_gram": top_ngram(safe, ngram_n)["gram"],
        "top_gram_count": top_ngram(safe, ngram_n)["cnt"],
        "top_gram_char_frac_u": bind_once(
            {"top": top_ngram(safe, ngram_n),
             "n_chars": F.length(safe).cast("long")}, top_char_frac),
    }


# PII patterns restricted to the syntax subset Java regex and RE2 share
# (no lookaround, no backrefs) so the DuckDB oracle uses the SAME strings.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\s().-]{7,}\d"


def pii_counts(col: Column) -> dict[str, Column]:
    """Match counts per PII category (emails / IPv4 / phone-like runs)."""
    return {
        "n_emails": F.regexp_count(col, F.lit(PII_EMAIL)).cast("long"),
        "n_ips": F.regexp_count(col, F.lit(PII_IPV4)).cast("long"),
        "n_phones": F.regexp_count(
            F.regexp_replace(F.regexp_replace(col, PII_EMAIL, "<EMAIL>"),
                             PII_IPV4, "<IP>"),
            F.lit(PII_PHONE)).cast("long"),
    }


def mask_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-number-like digit runs
    with typed placeholder tokens.  Order matters: emails first (their
    local parts can contain digits), then IPv4 (dotted quads would
    otherwise match the phone pattern), then phones.  Placeholders are
    digit-free so later passes never re-match earlier replacements.
    Pure regexp_replace chain — codegen'd, no Python."""
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns at once."""
    c = F.col(text_col)
    out = df.withColumn("lang_pred", lang_id(c)) \
            .withColumn("tokens_ws", token_count(c, "whitespace")) \
            .withColumn("tokens_bpe", token_count(c, "bpe")) \
            .withColumn("quality", quality_score(c)) \
            .withColumn("fingerprint", doc_fingerprint(c))
    for name, col in quality_features(c).items():
        out = out.withColumn(name, col)
    for name, col in repetition_features(c).items():
        out = out.withColumn(name, col)
    for name, col in pii_counts(c).items():
        out = out.withColumn(name, col)
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``ngram_n``-gram with an evaluation set (the standard n-gram
    overlap test used before training-data release).

    Returns one row per training document:
    ``(id, n_grams, n_overlap, contaminated)`` where ``n_grams`` is the
    document's count of DISTINCT n-grams and ``n_overlap`` how many of
    them occur anywhere in the eval set.

    Scale shape: the eval side reduces to a DISTINCT set of 128-bit gram
    hashes — tiny relative to the training corpus (eval sets are fixed
    benchmark suites) — and is broadcast, so the training corpus is
    touched once with no shuffle of its rows; the only wide exchange is
    the per-doc regroup of (id, hash) pairs.  For an eval side too big to
    broadcast, pass the same frames through a plain join by dropping the
    broadcast hint — semantics identical.
    """
    from .dedup import word_shingles

    ev = (
        eval_df.select(
            F.explode(word_shingles(F.col(text_col), ngram_n)).alias("g"))
        .select(F.md5("g").alias("h")).distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = (
        train.select(F.col(id_col).alias("id"),
                     F.explode(word_shingles(F.col(text_col), ngram_n))
                     .alias("g"))
        .withColumn("h", F.md5("g"))
    )
    return (
        tr.join(F.broadcast(ev), "h", "left")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0)).cast("long"))
             .alias("n_overlap"))
        .withColumn("contaminated", F.col("n_overlap") > 0)
        .withColumnRenamed("id", id_col)
    )


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document — the curation-side text
    difficulty score (pair with token_quality's length/punct ratios).

    All three inputs are EXACT integer counts from deterministic
    regexes: words = the engine-wide whitespace split (_words),
    sentences = runs of [.!?] (min 1 — headline-only docs divide by
    one, not zero), syllables = vowel-group runs [aeiouy]+ per word
    (the classic dictionary-free approximation, deterministic in any
    engine).  The score
    ``206.835 − 1.015·(words/sents) − 84.6·(syll/words)`` is one
    pinned double chain over those longs — bit-stable cross-engine
    (every literal CAST to double on the SQL side; DuckDB literals are
    DECIMAL).

    Zero-shuffle: pure per-row Column math (one in-row fold for
    syllables).  Empty/whitespace-only docs return NULL score (integer
    guard on words = 0, both engines).

    Returns ``(id, n_words, n_sents, n_syll, flesch)``.
    """
    words = _words(F.col(text_col))
    n_words = F.size(words).cast("long")
    n_sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)) \
        .cast("long")
    n_syll = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.regexp_count(w, F.lit("[aeiouy]+"))
        .cast("long"))
    flesch = F.when(
        n_words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")))
    return df.select(
        F.col(id_col), n_words.alias("n_words"), n_sents.alias("n_sents"),
        n_syll.alias("n_syll"), flesch.alias("flesch"))


def fuzzy_match_blocked(df: DataFrame, id_col: str, name_col: str,
                        max_dist: int = 1,
                        block: "Column | None" = None) -> DataFrame:
    """Entity-resolution fuzzy join: DISTINCT id pairs whose names are
    within Levenshtein distance ``max_dist``, candidate-generated by an
    equi-join on a BLOCKING key (default: the name's first
    whitespace-token).  Levenshtein is the textbook DP — bit-identical
    in any engine — so the pair set is exact GIVEN the blocking.

    Blocking recall is the documented approximation (the universal ER
    trade: exact all-pairs is O(n²)): pairs whose edit path crosses the
    blocking key (here, a typo in the FIRST token) are not candidates.
    Choose ``block`` to taste — phonetic keys, length buckets, q-gram
    anchors all drop in; multi-key blocking = union of passes.

    Scale shape: one equi-join on the block key (hot blocks are
    ordinary skewed keys — AQE/salt), distance computed only on
    candidates, `<` on ids so each unordered pair appears once.

    Returns ``(id_a, id_b, name_a, name_b, dist)``.
    """
    b = block if block is not None \
        else F.split(F.lower(F.col(name_col)), r"\s+")[0]
    base = df.select(F.col(id_col).alias("id"),
                     F.col(name_col).alias("nm"),
                     b.alias("blk")).filter(F.col("nm").isNotNull())
    l, r = base.alias("l"), base.alias("r")
    d = F.levenshtein(F.col("l.nm"), F.col("r.nm"))
    return (l.join(r, (F.col("l.blk") == F.col("r.blk"))
                   & (F.col("l.id") < F.col("r.id")))
            .filter(d <= max_dist)
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"),
                    F.col("l.nm").alias("name_a"),
                    F.col("r.nm").alias("name_b"),
                    d.alias("dist")))


def kwic_contexts(docs: DataFrame, text_col: str,
                  keyword: str) -> DataFrame:
    """Keyword-in-context concordance: for every occurrence of
    ``keyword`` (pinned whitespace tokenization, lowercased), the
    ``width`` tokens left and right, aggregated into context-pattern
    counts — the corpus-linguistics view behind collocation triage.

    Entirely IN-ROW until the final count: token array → match
    positions (in-row filter over the index sequence) → neighbor
    lookups by index (guarded element_at — positions ≤ 0 become the
    ``^`` boundary sentinel, past-end becomes ``$``; negative indices
    would otherwise wrap from the array END in both engines).  One
    map-side-combinable groupBy; no join, no window, no shuffle of the
    corpus itself.  The context is pinned to ±2 tokens — the
    ``(l2, l1, r1, r2, n)`` column contract.
    """
    a = _words(F.col(text_col))
    idxs = F.filter(F.sequence(F.lit(1), F.greatest(F.size(a), F.lit(1))),
                    lambda i: F.try_element_at(a, i) == F.lit(keyword))

    def at(i):
        # boundary sentinels; the WHEN guard keeps negative/zero
        # indices from wrapping to the array tail
        return F.when(i < 1, F.lit("^")).otherwise(
            F.coalesce(F.try_element_at(a, i), F.lit("$")))

    ctx = F.transform(idxs, lambda i: F.struct(
        at(i - 2).alias("l2"), at(i - 1).alias("l1"),
        at(i + 1).alias("r1"), at(i + 2).alias("r2")))
    return (docs.select(F.explode(ctx).alias("c"))
            .select("c.l2", "c.l1", "c.r1", "c.r2")
            .groupBy("l2", "l1", "r1", "r2")
            .agg(F.count(F.lit(1)).alias("n")))



def zipf_slope(docs: DataFrame, *, top_n: int = 200,
               text_col: str = "text") -> DataFrame:
    """Zipf rank–frequency slope of the corpus vocabulary: OLS fit of
    ln(count) on ln(rank) over the ``top_n`` most frequent tokens
    (Zipf's law predicts ≈ −1).  The fit is stats.loglog_fit —
    exactness contract, quantization error bound, and int64 bounds
    documented there.

    One token explode + one groupBy(token) + a top_n heap
    (TakeOrderedAndProject) + a single-row aggregate: the corpus scan
    dominates, everything after the vocabulary groupBy is tiny.
    Returns one row (n, slope, intercept, r2)."""
    if top_n < 3:
        raise ValueError("top_n must be >= 3")
    toks = docs.select(F.explode(_words(F.col(text_col))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top = vocab.orderBy(F.col("cnt").desc(), F.col("tok").asc()) \
        .limit(top_n)
    from pyspark.sql import Window
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = top.withColumn("rank", F.row_number().over(w)) \
        .select("rank", "cnt")
    from .stats import loglog_fit
    return loglog_fit(ranked, "rank", "cnt")


def rake_phrases(docs: DataFrame, id_col: str, text_col: str, *,
                 stopwords: tuple, k: int = 50,
                 scale: int = 10**9) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, public algorithm):
    candidate phrases are maximal runs of non-stopword tokens; word
    score = degree/frequency where degree sums the lengths of phrases
    the word occurs in; a phrase scores the sum of its member words.

    Exact integers end-to-end: word score is the floor-div
    ``(deg·scale)//freq`` (non-negative → truncation = floor
    cross-engine) and phrase scores are int64 sums of those — no float
    anywhere, so the full top-k value-hashes.

    Scale shape: tokenization + stopword marking are in-row; phrase
    segmentation is ONE per-doc window (running stopword count =
    gaps-and-islands id); word stats one groupBy(word); phrase scoring
    re-joins word scores (|words| ≪ corpus) and aggregates by phrase
    text; global top-k is sort+limit (TakeOrdered).  No driver
    collect.

    Output: ``(phrase, n, score_q)`` — top ``k`` by (score_q DESC,
    phrase).
    """
    from pyspark.sql import Window as W

    words = _words(F.col(text_col))
    pos = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(words).alias("pos", "w"))
    marked = pos.withColumn(
        "s", F.when(F.col("w").isin(*stopwords), 1).otherwise(0))
    win = W.partitionBy("_doc").orderBy("pos") \
        .rowsBetween(W.unboundedPreceding, 0)
    pid = marked.withColumn("phrase_id", F.sum("s").over(win))
    nw = pid.filter(F.col("s") == 0) \
        .select("_doc", "phrase_id", "pos", "w")
    pl = (nw.groupBy("_doc", "phrase_id")
          .agg(F.count(F.lit(1)).alias("plen"),
               F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "w"))),
                       lambda st: st["w"]), " ").alias("phrase")))
    ws = (nw.join(pl.select("_doc", "phrase_id", "plen"),
                  ["_doc", "phrase_id"])
          .groupBy("w")
          .agg(F.count(F.lit(1)).alias("freq"),
               F.sum("plen").alias("deg")))
    wq = ws.select(
        "w", F.expr(f"(deg * CAST({int(scale)} AS BIGINT)) div freq")
        .cast("long").alias("wscore"))
    ps = (nw.join(wq, "w")
          .groupBy("_doc", "phrase_id")
          .agg(F.sum("wscore").alias("pscore")))
    agg = (pl.join(ps, ["_doc", "phrase_id"])
           .groupBy("phrase")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("pscore").alias("score_q")))
    return (agg.orderBy(F.col("score_q").desc(), "phrase")
            .limit(int(k))
            .select("phrase", "n", "score_q"))


def vocab_growth(docs: DataFrame, id_col: str, text_col: str, *,
                 deciles: int = 10) -> DataFrame:
    """Vocabulary-growth curve (the Heaps'-law V(n) diagnostic): order
    documents by a content hash (deterministic, corpus-shuffling), and
    report distinct-vocabulary size after each 1/``deciles`` prefix of
    the corpus.  Feed the curve to loglog_fit for the Heaps β.

    Exactness: first-occurrence rank per token = MIN document rank;
    V(n_k) = count of tokens whose first rank ≤ n_k = ⌊N·k/deciles⌋ —
    pure integer arithmetic.  The doc ranking is one global sort of
    (hash, id) pairs — ~16 bytes/doc; past ~10⁹ docs shard the rank
    with a range-partitioned sort (documented; the curve is a corpus
    diagnostic, not a per-row transform).

    Output: ``(decile, n_docs, vocab)`` — exactly ``deciles`` rows
    (empty prefixes emit vocab = 0).
    """
    from pyspark.sql import Window as W

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("long")
    ranked = docs.select(
        F.col(id_col).alias("_doc"), F.col(text_col).alias("_text"),
        F.row_number().over(W.orderBy(h, F.col(id_col))).cast("long")
        .alias("_rank"))
    toks = (ranked.select(
        "_rank", F.explode(_words(F.col("_text"))).alias("w"))
        .groupBy("w").agg(F.min("_rank").alias("first_rank")))
    n_total = ranked.groupBy().agg(F.max("_rank").alias("n"))
    ks = (n_total.select(
        F.explode(F.sequence(F.lit(1), F.lit(int(deciles))))
        .alias("decile"), "n")
        .select("decile",
                F.expr(f"(n * decile) div {int(deciles)}").cast("long")
                .alias("n_docs")))
    counts = (toks.crossJoin(F.broadcast(ks))
              .filter(F.col("first_rank") <= F.col("n_docs"))
              .groupBy("decile", "n_docs")
              .agg(F.count(F.lit(1)).alias("vocab")))
    # LEFT join from the decile spine so empty prefixes emit vocab=0
    # (the contract is exactly ``deciles`` rows)
    return (ks.join(counts, ["decile", "n_docs"], "left")
            .select("decile", "n_docs",
                    F.coalesce(F.col("vocab"), F.lit(0)).cast("long")
                    .alias("vocab")))


def lexical_diversity(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus lexical-diversity profile from the token frequency
    spectrum: Yule's characteristic K, Simpson's repeat-rate D, and the
    hapax ratio — the length-robust repetitiveness screens a curation
    pipeline reads next to zipf_slope / vocab_growth (a template-spam
    corpus shows high K/D; a natural one sits near K ≈ 100-200).

    Both statistics collapse onto ``s2 = Σ_w n_w²`` (the second moment
    of the spectrum, since Σ_m m²·V_m = Σ_w n_w²):

    - ``yule_k    = 10⁴ · (s2 − N) / N²``
    - ``simpson_d = (s2 − N) / (N·(N−1))``  (repeat probability)
    - ``hapax_ratio = V₁ / V``

    Exactness: counts are exact longs; s2 is summed as DECIMAL(38,0)
    because a 10¹²-token corpus puts a stopword's n_w² past int64 —
    the decimal sum stays exact and each statistic is one pinned
    decimal→double chain (loud ANSI overflow, never a silent wrap).

    Scale shape: explode → groupBy(word) with map-side partial
    aggregation → a single-row reduce.  No windows, no joins.

    Returns ONE row ``(n_tokens, v_types, v1_hapax, s2, yule_k,
    simpson_d, hapax_ratio)``.
    """
    toks = docs.select(F.explode(_words(F.col(text_col))).alias("w"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    dec = F.col("n_w").cast("decimal(38,0)")
    agg = cnt.agg(
        F.sum("n_w").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_types"),
        F.sum(F.when(F.col("n_w") == 1, 1).otherwise(0))
        .alias("v1_hapax"),
        F.sum(dec * dec).alias("s2"))
    n = F.col("n_tokens")
    excess = (F.col("s2") - n).cast("double")
    yule = F.when(n > 0, F.lit(1e4) * excess
                  / (n.cast("double") * n.cast("double")))
    simpson = F.when(n > 1, excess
                     / (n.cast("double") * (n - 1).cast("double")))
    hapax = F.when(F.col("v_types") > 0,
                   F.col("v1_hapax").cast("double")
                   / F.col("v_types").cast("double"))
    return agg.select("n_tokens", "v_types", "v1_hapax", "s2",
                      yule.alias("yule_k"), simpson.alias("simpson_d"),
                      hapax.alias("hapax_ratio"))


def boilerplate_lines(docs: DataFrame, group_cols=(), *,
                      min_docs: int, id_col: str = "doc_id",
                      text_col: str = "text",
                      delim: str = "\n") -> DataFrame:
    """Cross-document template-line removal — the CCNet/RefinedWeb
    line-level dedup step: a line that appears in ``min_docs`` or more
    DISTINCT documents of the same group (site, source, language) is
    boilerplate (nav bars, cookie banners, license footers) and is
    stripped; the per-document residue is what a curation pipeline
    keeps.

    Per document: ``n_lines``, ``n_boiler``, ``boiler_frac`` (ONE
    long→double division), and ``cleaned_md5`` — the md5 of the kept
    lines re-joined by ``delim`` in ORIGINAL order (md5('') when every
    line is boilerplate), so the cleaned text itself is value-hashed
    without shipping it.

    Exactness: line identity is the exact string; the document count
    per line is an exact COUNT(DISTINCT id); md5 is bit-identical
    cross-engine.

    Shape for scale: one posexplode (no per-doc state), ONE
    map-side-combinable count-distinct shuffle keyed on
    (group, line) — hot template lines are exactly the skewed keys,
    absorbed by partial aggregation since the key IS the group-by
    key — then one equi-join of line rows against the distinct-line
    flag table (unique build keys; AQE handles probe-side skew) and
    one per-document re-aggregation.  No collect, no Python.

    Reference parity: no counterpart in mapbox-filter (pure style
    evaluation, src/Mapbox/Expression.hs); engine surface for the
    training-data tier (Wenzek et al. 2020 CCNet §3; Penedo et al.
    2023 RefinedWeb §3.4 line-wise filtering).

    Returns ``(id_col, *group_cols, n_lines, n_boiler, boiler_frac,
    cleaned_md5)``; documents whose text splits to zero lines (empty
    string splits to one empty line — kept) never vanish.
    """
    import re as _re
    g = list(group_cols)
    lines = docs.select(
        F.col(id_col), *[F.col(c) for c in g],
        F.posexplode(F.split(F.col(text_col), _re.escape(delim)))
        .alias("_pos", "_line"))
    flags = (lines.groupBy(*g, "_line")
             .agg(F.count_distinct(F.col(id_col)).alias("_d"))
             .select(*g, "_line",
                     (F.col("_d") >= F.lit(int(min_docs))).alias("_boiler")))
    j = lines.join(flags, [*g, "_line"])
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("_boiler"),
               F.struct(F.col("_pos").alias("p"),
                        F.col("_line").alias("l")))))
    return (j.groupBy(F.col(id_col), *[F.col(c) for c in g])
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("_boiler").cast("long")).alias("n_boiler"),
                 kept.alias("_kept"))
            .select(id_col, *g, "n_lines", "n_boiler",
                    (F.col("n_boiler").cast("double")
                     / F.col("n_lines").cast("double")).alias("boiler_frac"),
                    F.md5(F.coalesce(
                        F.array_join(F.transform(F.col("_kept"),
                                                 lambda s: s["l"]), delim),
                        F.lit(""))).alias("cleaned_md5")))


def gazetteer_tag(docs: DataFrame, lexicon: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  term_col: str = "term", max_words: int = 3,
                  longest_only: bool = False) -> DataFrame:
    """Dictionary span tagging — match a gazetteer of (multi-word)
    phrases against document text and return every occurrence with its
    token position: the entity-linking primitive that grounds
    geo-referenced spans (place names, landmark phrases) in interleaved
    documents, and the generic lexicon tagger (profanity lists, product
    catalogs, ICD codes).

    Matching: text is lowercased and whitespace-tokenized (the
    engine-wide ``\\s+`` discipline); every 1..``max_words``-gram is a
    candidate, matched EXACTLY against ``lexicon.term_col``.  With
    ``longest_only`` a match fully covered by a LONGER match in the
    same document is dropped (classic maximal-munch gazetteer
    semantics); equal-length overlaps all survive.

    Shape for scale: grams are built IN-ROW (one flatten of
    ``max_words`` position-window arrays — ≤ max_words rows per token,
    no self-joins) and exploded once; the lexicon joins BROADCAST (a
    gazetteer is a dimension table); ``longest_only`` is one left-anti
    self-join keyed on the document id (sort-merge on the equi key,
    the containment inequalities ride along) over the sparse match
    set, never the token stream.  No Python anywhere.

    Reference parity: no counterpart in mapbox-filter; engine surface
    for the geospatial-text tier (the BASELINE north_star's
    geo-referenced span grounding).

    Returns ``(id_col, pos, n_words, term, *other lexicon columns)``
    with ``pos`` the 0-based token index of the match start.
    """
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda t: t != "")
    empty = F.array().cast(
        "array<struct<pos:int,n_words:int,gram:string>>")

    def grams_for(n):
        return F.when(F.size(w) >= n, F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.lit(n).cast("int").alias("n_words"),
                F.array_join(F.slice(w, i + 1, n), " ").alias("gram")))
        ).otherwise(empty)

    all_grams = F.flatten(F.array(*[grams_for(n)
                                    for n in range(1, max_words + 1)]))
    g = (docs.select(F.col(id_col), F.explode(all_grams).alias("_g"))
         .select(id_col, F.col("_g.pos").alias("pos"),
                 F.col("_g.n_words").alias("n_words"),
                 F.col("_g.gram").alias("gram")))
    lex = lexicon.withColumnRenamed(term_col, "_term")
    tagged = (g.join(F.broadcast(lex),
                     g["gram"] == F.col("_term"))
              .drop("gram")
              .withColumnRenamed("_term", "term"))
    if longest_only:
        a, b = tagged.alias("a"), tagged.alias("b")
        cond = ((F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
                & (F.col("b.n_words") > F.col("a.n_words"))
                & (F.col("b.pos") <= F.col("a.pos"))
                & (F.col("b.pos") + F.col("b.n_words")
                   >= F.col("a.pos") + F.col("a.n_words")))
        tagged = a.join(b, cond, "left_anti")
    return tagged


# American Soundex letter codes; H/W get the marker '9' (they merge
# same-code neighbours), vowels+Y get '0' (they separate them)
_SOUNDEX_CODES = "01230129022455012623019202"


def soundex_key(col: Column) -> Column:
    """American Soundex phonetic key (NARA standard) as ONE explicit
    Column chain — the record-linkage blocking key that puts Robert
    and Rupert (R163), Ashcraft and Ashcroft (A261) in the same
    bucket before an expensive fuzzy match.

    Deliberately NOT ``F.soundex``: the JVM builtin has no DuckDB
    counterpart, so the algorithm is spelled out (translate → drop
    H/W markers → collapse runs → drop the first letter's own code →
    drop separators → pad) identically in both engines, including the
    two classic edge rules: same-code letters separated by H/W code
    ONCE (Pfister → P236, PHP → P000), separated by a vowel code
    TWICE (Tymczak → T522).

    NULL/empty/non-alphabetic input → NULL.  Pure string functions —
    codegen'd, no UDF, usable as a groupBy/join key at any scale.
    """
    s = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    t = F.translate(s, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", _SOUNDEX_CODES)
    u = F.regexp_replace(t, "9", "")
    v = F.regexp_replace(u, r"([0-9])\1+", "$1")
    first_code = F.substring(t, 1, 1)
    w = F.when(first_code.isin("1", "2", "3", "4", "5", "6"),
               F.substring(v, 2, 1_000_000)).otherwise(v)
    x = F.regexp_replace(w, "0", "")
    return F.when(
        F.length(s) > 0,
        F.concat(F.substring(s, 1, 1),
                 F.rpad(F.substring(x, 1, 3), 3, "0")))


def soundex_blocks(df: DataFrame, name_col: str, *,
                   min_block: int = 1) -> DataFrame:
    """Phonetic blocking profile: distinct names grouped by
    :func:`soundex_key` — the pre-join census a record-linkage
    pipeline runs to size its candidate blocks (fellegi_weights /
    fuzzy_match_blocked consume the keys).  One distinct + one
    map-side-combinable groupBy.  Returns ``(skey, n_names, first_name,
    last_name)`` for blocks of at least ``min_block`` distinct names.
    """
    d = (df.select(F.col(name_col).alias("_n")).distinct()
         .select("_n", soundex_key(F.col("_n")).alias("skey"))
         .filter(F.col("skey").isNotNull()))
    return (d.groupBy("skey")
            .agg(F.count(F.lit(1)).cast("long").alias("n_names"),
                 F.min("_n").alias("first_name"),
                 F.max("_n").alias("last_name"))
            .filter(F.col("n_names") >= int(min_block)))


def stylometric_deviation(docs: DataFrame, *, top_n: int = 30,
                          freq_scale: int = 1_000_000,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Burrows-style stylometric profile per document (Burrows 2002
    "Delta"): take the corpus's ``top_n`` most frequent words (the
    function words that fingerprint style), z-score each document's
    relative frequencies against the corpus, and report the mean |z|
    — how far the document's style sits from the corpus norm.  The
    authorship/template/outlier screen on the axis quality_score
    doesn't measure (style, not quality), and the per-document half
    of classic pairwise Delta (Delta(a,b) = mean|z_a − z_b| ≤
    mean|z_a| + mean|z_b| by the triangle inequality — compute pairs
    downstream on the returned profile if needed).

    Determinism: relative frequencies are EXACT integers
    ``freq_q = floor(tf·scale/dl)`` (one floor-div per cell); per-word
    corpus mean/variance over documents use exact integer sums
    (Σfreq_q, Σfreq_q² — int64 to ~10⁶ docs·scale²/…; fleet corpora
    shard by group upstream); z and the final mean-|z| fold are
    pinned chains (the fold is word-ordered in-row).  Documents
    missing a top word contribute freq 0 — REQUIRED for the z-model,
    handled via a dense doc×top-word grid join.

    Shape: tokenize+explode once; top-n by one count (broadcast);
    the dense grid is |docs|×top_n rows — the deliberate cost of the
    method; one groupBy back to documents.

    Returns ``(id, dl, n_words_scored, delta0)`` — delta0 the mean
    absolute z over the top-n vocabulary.
    """
    if top_n < 2:
        raise ValueError("top_n must be >= 2")
    toks = docs.select(
        F.col(id_col),
        F.explode(_words(F.col(text_col))).alias("_w"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long")
                                  .alias("dl"))
    top = (toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
           .orderBy(F.col("_c").desc(), F.col("_w").asc())
           .limit(top_n).select("_w"))
    tf = (toks.join(F.broadcast(top), "_w")
          .groupBy(id_col, "_w")
          .agg(F.count(F.lit(1)).cast("long").alias("_tf")))
    from ..geo.tilemath import floor_div
    grid = (dl.crossJoin(F.broadcast(top))
            .join(tf, [id_col, "_w"], "left")
            .select(id_col, "dl", "_w",
                    floor_div(F.coalesce(F.col("_tf"),
                                         F.lit(0).cast("long"))
                              * freq_scale, F.col("dl"))
                    .alias("_fq")))
    stats = (grid.groupBy("_w")
             .agg(F.count(F.lit(1)).cast("long").alias("_nd"),
                  F.sum("_fq").cast("long").alias("_s1"),
                  F.sum(F.col("_fq") * F.col("_fq")).cast("long")
                  .alias("_s2")))
    mu = F.col("_s1").cast("double") / F.col("_nd").cast("double")
    var = F.when(
        F.col("_nd") > 1,
        (F.col("_s2").cast("double")
         - F.col("_nd").cast("double") * mu * mu)
        / (F.col("_nd") - 1).cast("double"))
    stats = stats.select("_w", mu.alias("_mu"), var.alias("_var"))
    z = F.when(
        F.col("_var") > 0.0,
        F.abs(F.col("_fq").cast("double") - F.col("_mu"))
        / F.sqrt(F.col("_var")))
    scored = (grid.join(F.broadcast(stats), "_w")
              .select(id_col, "dl", "_w", z.alias("_z"))
              .filter(F.col("_z").isNotNull()))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("_w"), F.col("_z").alias("z"))))
    per = scored.groupBy(id_col, "dl").agg(
        F.count(F.lit(1)).cast("long").alias("n_words_scored"),
        F.aggregate(arr, F.lit(0.0),
                    lambda a, s_: a + s_["z"]).alias("_zs"))
    return per.select(
        id_col, "dl", "n_words_scored",
        F.when(F.col("n_words_scored") > 0,
               F.col("_zs") / F.col("n_words_scored").cast("double"))
        .alias("delta0"))


def symspell_correct(queries: DataFrame, lexicon: DataFrame, *,
                     qid_col: str = "qid", term_col: str = "term",
                     freq_col: str = "freq",
                     max_len: int = 24) -> DataFrame:
    """SymSpell spelling correction at max edit distance 1 (Garbe's
    symmetric-delete algorithm): both sides expand to their delete-1
    neighborhoods, candidates meet on EQUAL variant strings — an
    equi-join, never a quadratic distance scan — and the final
    ``levenshtein ≤ 1`` verify discards the ED-2 pairs the delete
    trick over-admits.  The OCR/typo normalizer for token-level
    corpus cleanup.

    Ranking: per query the single best suggestion by (distance asc,
    frequency desc, term asc) — one min-struct fold, deterministic
    under ties.  Queries with no in-range suggestion drop (inner-join
    semantics; left-join downstream to keep them).

    Scale shape: each side fans out ×(len+1) variants (bounded
    in-plan: term length > ``max_len`` raises), one equi-join on the
    variant key — the lexicon side is broadcast-able for real
    dictionaries — then one distinct and one per-query fold.  All
    string/integer ops, no Python.

    Returns ``(qid, term, suggestion, dist, freq)``.
    """
    def variants(c: Column) -> Column:
        n = F.length(c)
        dels = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(c.substr(F.lit(1), i - 1),
                               c.substr(i + 1, n)))
        return F.concat(F.array(c), dels)

    def guarded(c: Column, side: str) -> Column:
        return F.when(
            F.length(c) > max_len,
            F.raise_error(F.concat(
                F.lit(f"symspell_correct: {side} term longer than "
                      f"{max_len}: "), c)).cast("string")
        ).otherwise(c)

    q = (queries.select(F.col(qid_col).alias("qid"),
                        guarded(F.col(term_col), "query").alias("q"))
         .filter(F.length("q") >= 1)
         .select("qid", "q",
                 F.explode(variants(F.col("q"))).alias("_v")))
    lx = (lexicon.select(guarded(F.col(term_col), "lexicon")
                         .alias("suggestion"),
                         F.col(freq_col).cast("long").alias("freq"))
          .filter(F.length("suggestion") >= 1)
          .select("suggestion", "freq",
                  F.explode(variants(F.col("suggestion")))
                  .alias("_v")))
    cand = (q.join(lx, "_v")
            .select("qid", "q", "suggestion", "freq").distinct()
            .withColumn("dist", F.levenshtein("q", "suggestion"))
            .filter(F.col("dist") <= 1))
    best = (cand.groupBy("qid", "q")
            .agg(F.min(F.struct(
                F.col("dist"), (-F.col("freq")).alias("nf"),
                F.col("suggestion"))).alias("_b")))
    return best.select("qid", F.col("q").alias("term"),
                       F.col("_b.suggestion").alias("suggestion"),
                       F.col("_b.dist").alias("dist"),
                       (-F.col("_b.nf")).alias("freq"))


def rouge_n(pairs: DataFrame, n: int = 2, *, id_col: str = "doc_id",
            cand_col: str = "cand", ref_col: str = "ref") -> DataFrame:
    """ROUGE-N overlap between candidate and reference texts (Lin
    2004) — the n-gram recall family behind summarization and
    compression QA: clipped n-gram matches (each reference n-gram
    credits at most its reference multiplicity) over reference /
    candidate totals give recall / precision, F1 the harmonic mean.

    Exactness: token n-grams by the engine-wide ``\\s+`` split, match
    counts are Σ min(count_cand, count_ref) per distinct gram — pure
    integers; the three ratios are single divisions.  Empty sides
    yield NULL scores (no n-grams to match), pinned.

    Shape: both sides explode to (id, gram, count) and meet in ONE
    full-outer equi-join per id+gram — no quadratic pairing; gram
    cardinality is the only fan-out.

    Returns ``(doc_id, n_match, n_cand, n_ref, precision, recall,
    f1)``.
    """
    if n < 1:
        raise ValueError("n must be positive")

    def grams(col: Column) -> Column:
        w = F.filter(F.split(F.lower(col), r"\s+"),
                     lambda t: F.length(t) > 0)
        # sequence(1, 0) DESCENDS in Spark — short texts need the
        # explicit empty branch
        idx = F.when(F.size(w) >= n,
                     F.sequence(F.lit(1), F.size(w) - (n - 1))) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(w, i, n), " "))

    def side(col: str, label: str) -> DataFrame:
        return (pairs.select(F.col(id_col).alias("doc_id"),
                             F.explode_outer(grams(F.col(col)))
                             .alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count(F.lit(1)).alias(label))
                .filter(F.col("g").isNotNull()))

    c = side(cand_col, "nc")
    r = side(ref_col, "nr")
    j = c.join(r, ["doc_id", "g"], "full_outer")
    per = (j.groupBy("doc_id")
           .agg(F.sum(F.least(F.coalesce(F.col("nc"), F.lit(0)),
                              F.coalesce(F.col("nr"), F.lit(0))))
                .alias("n_match"),
                F.sum(F.coalesce(F.col("nc"), F.lit(0)))
                .alias("n_cand"),
                F.sum(F.coalesce(F.col("nr"), F.lit(0)))
                .alias("n_ref")))
    ids = pairs.select(F.col(id_col).alias("doc_id")).distinct()
    per = ids.join(per, "doc_id", "left").select(
        "doc_id",
        *[F.coalesce(F.col(cn), F.lit(0)).alias(cn)
          for cn in ("n_match", "n_cand", "n_ref")])
    prec = F.when(F.col("n_cand") > 0,
                  F.col("n_match").cast("double")
                  / F.col("n_cand").cast("double"))
    rec = F.when(F.col("n_ref") > 0,
                 F.col("n_match").cast("double")
                 / F.col("n_ref").cast("double"))
    # F1 = 2PR/(P+R) telescopes to 2m/(c+r) — exact, and 0 when no
    # grams match (the 0/0 harmonic-mean convention)
    f1 = F.when((F.col("n_cand") > 0) & (F.col("n_ref") > 0),
                F.lit(2.0) * F.col("n_match").cast("double")
                / (F.col("n_cand") + F.col("n_ref")).cast("double"))
    return per.select("doc_id", "n_match", "n_cand", "n_ref",
                      prec.alias("precision"), rec.alias("recall"),
                      f1.alias("f1"))
