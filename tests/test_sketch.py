"""Heavy-hitter sketch (operators/sketch.py): MG invariants, exactness of
the two-pass result, partitioning independence, salted-join integration."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.sketch import (
    _mg_update, heavy_hitters, hot_keys_sketch, mg_candidates)
from mapbox_filter_spark.operators.joins import hot_keys, salted_join


def test_mg_update_superset_guarantee():
    """Any item with share > 1/(m+1) of the stream survives the summary."""
    stream = ["hot"] * 40 + [f"cold{i}" for i in range(60)]
    for m in (2, 4, 8):
        counters = {}
        for v in stream:
            _mg_update(counters, v, 1, m)
        assert len(counters) <= m
        assert "hot" in counters  # share 0.4 > 1/(m+1) for every m >= 2


def test_mg_update_weighted_matches_unary():
    import random
    rnd = random.Random(7)
    stream = [rnd.choice("abcdef") for _ in range(500)]
    unary = {}
    for v in stream:
        _mg_update(unary, v, 1, 3)
    batched = {}
    # arbitrary batch split with weighted updates
    from collections import Counter
    i = 0
    while i < len(stream):
        j = min(i + rnd.randint(1, 50), len(stream))
        for v, c in Counter(stream[i:j]).items():
            _mg_update(batched, v, c, 3)
        i = j
    # not identical state (order differs), but both keep the guarantee:
    true = Counter(stream)
    n = len(stream)
    for d in (unary, batched):
        for v, c in true.items():
            if c > n / 4:  # m=3
                assert v in d


@pytest.fixture(scope="module")
def skewed(spark):
    # key j in 0..31 with weight ~(2j+1): linear-density skew
    return spark.range(20000).select(
        F.floor(F.sqrt(F.pmod(F.col("id") * 7919, F.lit(1024))))
        .alias("key"),
        (F.col("id") % 5).alias("payload"),
    )


def _exact(df, min_count):
    return {(r["key"], r["cnt"]) for r in
            df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= min_count).collect()}


def test_heavy_hitters_exact_and_partition_independent(spark, skewed):
    expected = _exact(skewed, 800)
    assert expected  # non-vacuous
    for nparts in (1, 7, 32):
        got = {(r["key"], r["cnt"]) for r in
               heavy_hitters(skewed.repartition(nparts), "key",
                             min_count=800).collect()}
        assert got == expected, nparts


def test_heavy_hitters_rational_share(spark, skewed):
    total = skewed.count()
    min_count = -(-3 * total // 100)
    got = {(r["key"], r["cnt"]) for r in
           heavy_hitters(skewed, "key", share=(3, 100)).collect()}
    assert got == _exact(skewed, min_count)


def test_null_keys_ignored(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.lit(1)).alias("key"))
    got = heavy_hitters(df, "key", min_count=5).collect()
    assert [(r["key"], r["cnt"]) for r in got] == [(1, 66)]


def test_candidate_volume_bounded(spark, skewed):
    df = skewed.repartition(8)
    m = 10
    assert mg_candidates(df, "key", m).count() <= 8 * m


def test_hot_keys_sketch_matches_exact_prescan(spark, skewed):
    exact = set(hot_keys(skewed, "key", 800))
    sketched = set(hot_keys_sketch(skewed, "key", 800))
    assert sketched == exact
    assert exact  # non-vacuous


def test_salted_join_with_sketched_hot_list(spark, skewed):
    build = spark.range(32).select(F.col("id").alias("key"),
                                   (F.col("id") * 11).alias("dim"))
    hot = hot_keys_sketch(skewed, "key", 800)
    plain = skewed.join(build, "key").groupBy("key").count()
    salted = salted_join(skewed, build, "key", n_salts=4,
                         hot=hot).groupBy("key").count()
    assert {tuple(r) for r in plain.collect()} == \
        {tuple(r) for r in salted.collect()}


def test_mg_merge_combined_stream_guarantee(spark):
    """Summaries built on disjoint halves, merged, keep every key whose
    COMBINED share exceeds 1/(m+1)."""
    from mapbox_filter_spark.operators.sketch import mg_merge
    df = spark.range(20000).select(
        F.floor(F.sqrt(F.pmod(F.col("id") * 7919, F.lit(1024))))
        .alias("key"))
    m = 25
    a = mg_candidates(df.filter("id < 9000").repartition(3), "key", m)
    b = mg_candidates(df.filter("id >= 9000").repartition(5), "key", m)
    merged = mg_merge(a.unionByName(b), "key", m)
    rows = merged.collect()
    assert len(rows) <= m
    kept = {r["key"] for r in rows}
    total = df.count()
    true = {r["key"] for r in
            df.groupBy("key").count()
            .filter(F.col("count") * (m + 1) > total).collect()}
    assert true  # non-vacuous
    assert true <= kept


# ---------------------------------------------------------------- KMV sketch


def test_kmv_mergeability_law(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — exactly."""
    from mapbox_filter_spark.operators.sketch import kmv_merge, kmv_rows

    k = 16
    a = spark.range(0, 400).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v"))
    b = spark.range(300, 900).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v"))
    whole = kmv_rows(a.unionByName(b), ["g"], ["v"], k)
    merged = kmv_merge(
        kmv_rows(a, ["g"], ["v"], k).unionByName(
            kmv_rows(b, ["g"], ["v"], k)), ["g"], k)
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_kmv_estimate_accuracy_and_exact_path(spark):
    from mapbox_filter_spark.operators.sketch import kmv_estimate, kmv_rows

    k = 64
    # group 0: 5000 distinct values (estimator path);
    # group 1: 20 distinct values (exact path, n_sketch < k)
    df = spark.range(5000).select(F.lit(0).alias("g"),
                                  F.col("id").alias("v")) \
        .unionByName(spark.range(20).select(F.lit(1).alias("g"),
                                            F.col("id").alias("v")))
    out = {r["g"]: r for r in
           kmv_estimate(kmv_rows(df, ["g"], ["v"], k), ["g"], k).collect()}
    assert out[1]["n_sketch"] == 20 and out[1]["est"] == 20.0
    assert out[0]["n_sketch"] == k
    # KMV relative error ~ 1/sqrt(k-2) ≈ 0.127; allow 4 sigma
    assert abs(out[0]["est"] - 5000) / 5000 < 0.5


def test_kmv_duplicates_and_partitioning_invariant(spark):
    from mapbox_filter_spark.operators.sketch import kmv_rows

    base = spark.range(500).select((F.col("id") % 100).alias("v"),
                                   F.lit(0).alias("g"))

    def sk(df):
        return sorted(map(tuple, kmv_rows(df, ["g"], ["v"], 8).collect()))

    # duplicates don't change the sketch; neither does partitioning
    assert sk(base) == sk(base.unionByName(base)) == \
        sk(base.repartition(13))


def test_kmv_k_validation(spark):
    from mapbox_filter_spark.operators.sketch import kmv_rows

    df = spark.range(5).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k"):
        kmv_rows(df, ["g"], ["v"], 1)
