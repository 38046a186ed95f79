"""Session-10 schema-discovery operators (operators/analytics.py
inclusion_profile / key_profile) and the TextRank composition:
hand-computed fixtures, NULL semantics, and structural sanity."""


from mapbox_filter_spark.operators.analytics import (
    inclusion_profile, key_profile)


def test_inclusion_full_containment(spark):
    child = spark.createDataFrame([(1,), (2,), (2,), (3,)], "v long")
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "p long")
    got = inclusion_profile(child, "v", parent, "p").collect()[0]
    assert (got["n_child"], got["n_matched"], got["n_orphans"]) == \
        (3, 3, 0)
    assert got["containment"] == 1.0


def test_inclusion_partial_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (5,), (None,), (7,), (5,)], "v long")
    parent = spark.createDataFrame([(1,), (None,), (2,)], "p long")
    got = inclusion_profile(child, "v", parent, "p",
                            ind_name="c->p").collect()[0]
    # NULLs excluded both sides; distinct child {1,5,7}, matched {1}
    assert got["ind"] == "c->p"
    assert (got["n_child"], got["n_matched"], got["n_orphans"]) == \
        (3, 1, 2)
    assert got["containment"] == 1.0 / 3.0


def test_inclusion_empty_child(spark):
    child = spark.createDataFrame([(None,)], "v long")
    parent = spark.createDataFrame([(1,)], "p long")
    got = inclusion_profile(child, "v", parent, "p").collect()[0]
    assert got["n_child"] == 0 and got["containment"] is None


def test_key_profile_true_key(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                               "id long, x string")
    got = key_profile(df, "id").collect()[0]
    assert got["is_key"] and got["dup_rows"] == 0
    assert got["n_rows"] == 3 and got["n_groups"] == 3
    assert got["max_group"] == 1


def test_key_profile_duplicates_and_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "id long")
    got = key_profile(df, "id", key_name="t(id)").collect()[0]
    assert got["key"] == "t(id)"
    assert not got["is_key"]
    assert got["n_rows"] == 5 and got["null_rows"] == 1
    assert got["n_groups"] == 2 and got["dup_rows"] == 2
    assert got["max_group"] == 3


def test_key_profile_composite(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 1)], "a long, b long")
    single = key_profile(df, "a").collect()[0]
    combo = key_profile(df, ["a", "b"]).collect()[0]
    assert not single["is_key"]
    assert not combo["is_key"] and combo["dup_rows"] == 1
    unique = key_profile(df.dropDuplicates(["a", "b"]),
                         ["a", "b"]).collect()[0]
    assert unique["is_key"]


def test_textrank_hub_word_wins(spark, tmp_path):
    # corpus where 'hub' co-occurs with every other word: TextRank
    # must rank it first
    import os
    docs = spark.createDataFrame(
        [(i, f"hub w{i} hub w{i} hub") for i in range(8)]
        + [(100 + i, f"w{i} hub") for i in range(8)],
        "doc_id long, text string")
    p = os.path.join(str(tmp_path), "documents.parquet")
    docs.write.parquet(p)

    from mapbox_filter_spark.queries_lm import q_textrank_keywords
    out = q_textrank_keywords(spark, str(tmp_path)).collect()
    assert out[0]["word"] == "hub" and out[0]["rank"] == 1
    # ranks are dense from 1 and pr non-increasing
    prs = [r["pr"] for r in out]
    assert prs == sorted(prs, reverse=True)
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
