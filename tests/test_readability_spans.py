"""readability (operators/text.py), span_coalesce (operators/media.py)
and bottomk_sample (operators/splits.py): hand-built scenarios and
property checks."""

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.media import span_coalesce
from mapbox_filter_spark.operators.splits import bottomk_sample
from mapbox_filter_spark.operators.text import readability


def test_readability_known_counts(spark):
    rows = [
        (1, "The cat sat. The dog ran!"),     # 6 words, 2 sents
        (2, "word"),                          # no terminator -> 1 sent
        (3, "   "),                           # whitespace-only -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability(df).collect()}
    r1 = got[1]
    # syllable groups: the=1 cat=1 sat=1 the=1 dog=1 ran=1 (note
    # 'the' -> 'e' one group) = 6
    assert (r1.n_words, r1.n_sents, r1.n_syll) == (6, 2, 6)
    expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert r1.flesch == expected
    assert got[2].n_sents == 1 and got[2].n_syll == 1
    assert got[3].n_words == 0 and got[3].flesch is None


def _doc(spark, spans):
    # spans: list of (kind, text, media_ref) in order
    rows = [(7, [(k, t, m, i) for i, (k, t, m) in enumerate(spans)])]
    return spark.createDataFrame(
        rows, "doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")


def test_span_coalesce_merges_and_preserves_order(spark):
    spans = [
        ("text", "hello", None),
        ("text", "world", None),
        ("media", None, "media://a.jpg"),
        ("text", "tail", None),
        ("geo", "12,34", None),
        ("text", "x", None),
        ("text", None, None),        # NULL part glues but adds nothing
        ("text", "y", None),
    ]
    out = span_coalesce(_doc(spark, spans)).orderBy("new_offset").collect()
    seq = [(r.new_offset, r.kind, r.text, r.media_ref, r.n_merged)
           for r in out]
    assert seq == [
        (0, "text", "hello world", None, 2),
        (1, "media", None, "media://a.jpg", 1),
        (2, "text", "tail", None, 1),
        (3, "geo", "12,34", None, 1),
        (4, "text", "x y", None, 3),
    ]


def test_span_coalesce_all_null_run_and_identity(spark):
    out = span_coalesce(_doc(spark, [("text", None, None),
                                     ("text", None, None)])).collect()
    assert len(out) == 1 and out[0].text is None and out[0].n_merged == 2
    # a doc with no adjacent text spans passes through unchanged
    spans = [("media", None, "m://1"), ("text", "a", None),
             ("media", None, "m://2")]
    out = span_coalesce(_doc(spark, spans)).orderBy("new_offset").collect()
    assert [(r.kind, r.text, r.media_ref) for r in out] == \
        [("media", None, "m://1"), ("text", "a", None),
         ("media", None, "m://2")]


def test_bottomk_nested_and_shape_independent(spark):
    df = spark.createDataFrame(
        [("g" + str(i % 3), i) for i in range(500)],
        "g string, id long")
    s10 = {(r.g, r.id) for r in
           bottomk_sample(df, ["g"], "id", k=10).collect()}
    s25 = {(r.g, r.id) for r in
           bottomk_sample(df, ["g"], "id", k=25).collect()}
    assert s10 < s25                      # nested under k growth
    assert len(s10) == 30 and len(s25) == 75
    # partitioning-shape independence: same sample after repartition
    s10b = {(r.g, r.id) for r in
            bottomk_sample(df.repartition(17), ["g"], "id", k=10)
            .collect()}
    assert s10b == s10
    # a different salt redraws
    s10c = {(r.g, r.id) for r in
            bottomk_sample(df, ["g"], "id", k=10, salt="other").collect()}
    assert s10c != s10


def test_null_profile_counts(spark):
    from mapbox_filter_spark.operators.stats import null_profile
    rows = [(1, "a", None), (2, "a", 5.0), (None, "b", 5.0),
            (4, None, None)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r.col_name: r for r in
           null_profile(df, ["id", "s", "v"]).collect()}
    assert (got["id"].n, got["id"].n_null, got["id"].n_distinct) == \
        (4, 1, 3)
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_null, got["v"].n_distinct) == (2, 1)
    assert got["id"].fill_rate == 3.0 / 4.0


def test_fuzzy_match_blocked_pairs(spark):
    from mapbox_filter_spark.operators.text import fuzzy_match_blocked
    rows = [(1, "small ring"), (2, "small king"), (3, "small rings"),
            (4, "red ring"),          # different block: never a pair
            (5, "small stone")]
    df = spark.createDataFrame(rows, "id long, nm string")
    got = {(r.id_a, r.id_b): r.dist for r in
           fuzzy_match_blocked(df, "id", "nm", max_dist=1).collect()}
    assert got == {(1, 2): 1, (1, 3): 1}
    # max_dist=2 also reaches king<->rings (2 edits)
    got2 = {(r.id_a, r.id_b) for r in
            fuzzy_match_blocked(df, "id", "nm", max_dist=2).collect()}
    assert got2 == {(1, 2), (1, 3), (2, 3)}
