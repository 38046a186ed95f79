"""Deterministic split/sample/pack tests (operators/splits.py)."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.splits import (
    SCALE_U60,
    group_split,
    hash_split,
    hash_u60,
    pack_sequences,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_stable_under_repartition(spark, docs):
    """The property randomSplit does NOT have: partition layout must not
    move a single row between splits."""
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, ["doc_id"], salt="s", fractions=fr) \
        .select("doc_id", "split").collect()
    b = hash_split(docs.repartition(37, "lang"), ["doc_id"], salt="s",
                   fractions=fr).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and randomSplit genuinely lacks it (documented contrast): same seed,
    # different partitioning -> different membership is at least possible;
    # we only assert OUR operator's invariant above.


def test_split_fractions_approximate(spark, docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = dict(
        (r["split"], r["n"]) for r in
        hash_split(docs, ["doc_id"], salt="s", fractions=fr)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect())
    n = sum(counts.values())
    assert n == docs.count()
    assert abs(counts.get("train", 0) / n - 0.8) < 0.08
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_split_salt_changes_assignment(spark, docs):
    fr = {"a": 0.5, "b": 0.5}
    x = {r["doc_id"]: r["split"] for r in
         hash_split(docs, ["doc_id"], salt="s1", fractions=fr).collect()}
    y = {r["doc_id"]: r["split"] for r in
         hash_split(docs, ["doc_id"], salt="s2", fractions=fr).collect()}
    moved = sum(1 for k in x if x[k] != y[k])
    assert moved > len(x) * 0.25  # ~half should move


def test_split_incremental_extension(spark, docs):
    """New rows join splits without moving old ones: assignment on a
    subset equals assignment on the full table restricted to it."""
    fr = {"train": 0.8, "val": 0.2}
    full = {r["doc_id"]: r["split"] for r in
            hash_split(docs, ["doc_id"], salt="s", fractions=fr).collect()}
    part = {r["doc_id"]: r["split"] for r in
            hash_split(docs.filter(F.col("doc_id") < 100), ["doc_id"],
                       salt="s", fractions=fr).collect()}
    assert all(full[k] == v for k, v in part.items())


def test_group_split_no_leakage(spark, docs):
    d = group_split(docs, ["source"], salt="s",
                    fractions={"train": 0.7, "val": 0.3})
    per_group = d.groupBy("source").agg(
        F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_group)


def test_split_validations(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, ["doc_id"], salt="s",
                   fractions={"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="no fractions|sum to 1"):
        hash_split(docs, ["doc_id"], salt="s", fractions={})


def test_hash_u60_range_and_uniformity(spark, docs):
    us = [r["u"] for r in
          docs.select(hash_u60(["doc_id"], "s").alias("u")).collect()]
    assert all(0 <= u < SCALE_U60 for u in us)
    assert len(set(us)) == len(us)  # 500 distinct keys -> no collisions
    below_half = sum(1 for u in us if u < SCALE_U60 // 2)
    assert 0.4 < below_half / len(us) < 0.6


def test_stratified_sample_rates(spark, docs):
    out = stratified_sample(docs, ["lang"], ["doc_id"], salt="s",
                            fractions={"zh": 1.0, "en": 0.25},
                            default=0.0)
    got = dict((r["lang"], r["n"]) for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect())
    base = dict((r["lang"], r["n"]) for r in
                docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                .collect())
    assert got["zh"] == base["zh"]            # fraction 1.0 keeps all
    assert set(got) == {"zh", "en"}           # default 0.0 drops others
    assert 0.1 < got["en"] / base["en"] < 0.45


def test_stratified_sample_arity_check(spark, docs):
    with pytest.raises(ValueError, match="arity"):
        stratified_sample(docs, ["lang", "source"], ["doc_id"], salt="s",
                          fractions={"en": 0.5})


def test_pack_sequences_invariants(spark, docs):
    cap = 1500
    out = pack_sequences(docs, shard_by=["source"], order_by=["doc_id"],
                         weight="n_chars", capacity=cap).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["source"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["bin_idx"] == cum // cap
            assert r["bin_offset"] == cum - r["bin_idx"] * cap
            cum += r["n_chars"]
        # bins are contiguous from 0
        bins = sorted({r["bin_idx"] for r in rows})
        assert bins[0] == 0 and bins == list(range(len(bins)))


def test_pack_sequences_oversize_doc_visible(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "src": ["a"] * 3,
        "id": [0, 1, 2],
        "w": [100, 5000, 100]}))
    out = {r["id"]: r for r in
           pack_sequences(df, shard_by=["src"], order_by=["id"],
                          weight="w", capacity=1000).collect()}
    assert out[1]["bin_offset"] + 5000 > 1000  # overflow is visible
    assert out[2]["bin_idx"] == (100 + 5000) // 1000


def test_pack_sequences_single_shuffle(spark, docs):
    out = pack_sequences(docs, shard_by=["source"], order_by=["doc_id"],
                         weight="n_chars", capacity=1500)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p


def test_oversample_counts_and_determinism(spark, docs):
    from mapbox_filter_spark.operators.splits import (
        deterministic_oversample)

    w = {"zh": 2.5, "de": 1.0, "en": 0.3}
    out = deterministic_oversample(docs, ["lang"], ["doc_id"], salt="s",
                                   weights=w, default=0.5)
    per_doc = out.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("k"),
        F.max("copy_idx").alias("mx")).collect()
    base = dict((r["lang"], r["n"]) for r in
                docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                .collect())
    import math
    for r in per_doc:
        wv = w.get(r["lang"], 0.5)
        assert r["k"] in (math.floor(wv), math.floor(wv) + 1)
        assert r["mx"] == r["k"]  # copies numbered 1..k
    # de weight 1.0: exactly one copy of every de doc
    n_de = sum(r["k"] for r in per_doc if r["lang"] == "de")
    assert n_de == base["de"]
    # zh expectation 2.5 per doc
    n_zh = sum(r["k"] for r in per_doc if r["lang"] == "zh")
    assert abs(n_zh / base["zh"] - 2.5) < 0.35
    # deterministic under repartition
    again = deterministic_oversample(
        docs.repartition(13, "source"), ["lang"], ["doc_id"], salt="s",
        weights=w, default=0.5).select("doc_id", "copy_idx").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple,
        out.select("doc_id", "copy_idx").collect()))


def test_oversample_rejects_negative_weight(spark, docs):
    from mapbox_filter_spark.operators.splits import (
        deterministic_oversample)
    with pytest.raises(ValueError, match="non-negative"):
        deterministic_oversample(docs, ["lang"], ["doc_id"], salt="s",
                                 weights={"en": -1.0})


# ------------------------------------------------------- shuffle_shards

from mapbox_filter_spark.operators.splits import shuffle_shards  # noqa: E402


def _perm(df):
    rows = df.collect()
    by_global = sorted(rows, key=lambda r: (r["shard"], r["shard_rank"]))
    return [r["doc_id"] for r in by_global]


def test_shuffle_is_global_permutation(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(df, ["doc_id"], 8)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(500))
    # ranks are 1..k dense per shard
    from collections import defaultdict
    per = defaultdict(list)
    for r in rows:
        per[r["shard"]].append(r["shard_rank"])
        assert 0 <= r["shard"] < 8
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # it's a real shuffle: shard-order differs from input order
    assert _perm(out) != list(range(500))


def test_shuffle_partitioning_independent(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = _perm(shuffle_shards(df.repartition(1), ["doc_id"], 4))
    b = _perm(shuffle_shards(df.repartition(17), ["doc_id"], 4))
    assert a == b


def test_shuffle_incremental_extension_preserves_relative_order(spark):
    """New rows splice into position; old rows never swap."""
    old = spark.range(200).select(F.col("id").alias("doc_id"))
    ext = spark.range(260).select(F.col("id").alias("doc_id"))
    p_old = _perm(shuffle_shards(old, ["doc_id"], 4))
    p_ext = _perm(shuffle_shards(ext, ["doc_id"], 4))
    assert [d for d in p_ext if d < 200] == p_old


def test_shuffle_single_exchange_plan(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = shuffle_shards(df, ["doc_id"], 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan


# ------------------------------------------------------- negative_pairs

from mapbox_filter_spark.operators.splits import negative_pairs  # noqa: E402


def test_negative_pairs_shape_and_range(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    out = negative_pairs(df, "doc_id", n_ids=100, k=3).collect()
    assert len(out) == 300
    for r in out:
        assert 0 <= r["neg_id"] < 100
        assert r["neg_id"] != r["doc_id"]  # self-collisions shifted
        assert 1 <= r["neg_idx"] <= 3


def test_negative_pairs_deterministic(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, negative_pairs(df.repartition(1), "doc_id",
                                         50, 2).collect()))
    b = sorted(map(tuple, negative_pairs(df.repartition(13), "doc_id",
                                         50, 2).collect()))
    assert a == b


def test_negative_pairs_zero_shuffle(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    plan = negative_pairs(df, "doc_id", 10, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_negative_pairs_validation(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    import pytest as _pt
    with _pt.raises(ValueError):
        negative_pairs(df, "doc_id", 1, 2)
    with _pt.raises(ValueError):
        negative_pairs(df, "doc_id", 10, 0)


# ---------------------------------------------------------- weighted sample


def test_weighted_sample_k_and_determinism(spark):
    from mapbox_filter_spark.operators.splits import weighted_sample

    df = spark.range(500).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v"),
        (1 + F.col("id") % 3).cast("long").alias("w"))

    def run(d):
        return sorted(map(tuple, weighted_sample(
            d, ["g"], "w", 20, id_cols=["v"]).collect()))

    a = run(df.repartition(1))
    b = run(df.repartition(13))
    assert a == b  # partition-shape independent
    from collections import Counter

    per_g = Counter(r[0] for r in a)
    assert all(n == 20 for n in per_g.values())
    # a group smaller than k returns whole group
    small = spark.range(7).select(F.lit(0).alias("g"),
                                  F.col("id").alias("v"),
                                  F.lit(1).cast("long").alias("w"))
    assert weighted_sample(small, ["g"], "w", 20,
                           id_cols=["v"]).count() == 7


def test_weighted_sample_follows_weights(spark):
    """Inclusion frequency tracks weight: rows with w=9 should appear
    ~9x as often as w=1 rows in k=1 samples over many groups."""
    from mapbox_filter_spark.operators.splits import weighted_sample

    # 400 groups, each with 2 rows: one w=1, one w=9
    rows = []
    for g in range(400):
        rows.append((g, g * 2, 1))
        rows.append((g, g * 2 + 1, 9))
    df = spark.createDataFrame(rows, "g long, v long, w long")
    picked = weighted_sample(df, ["g"], "w", 1, id_cols=["v"]).collect()
    n_heavy = sum(1 for r in picked if r["w"] == 9)
    # E[heavy] = 0.9 * 400 = 360, sd ≈ 6; accept ±5 sd
    assert 330 <= n_heavy <= 390


def test_weighted_sample_validation(spark):
    from mapbox_filter_spark.operators.splits import weighted_sample

    df = spark.range(3).select(F.lit(0).alias("g"), F.col("id").alias("v"),
                               F.lit(1).cast("long").alias("w"))
    with pytest.raises(ValueError, match="k"):
        weighted_sample(df, ["g"], "w", 0, id_cols=["v"])


def test_weighted_sample_rejects_bad_weights(spark):
    from mapbox_filter_spark.operators.splits import weighted_sample

    df = spark.createDataFrame([(0, 1, 2), (0, 2, -3)],
                               "g long, v long, w long")
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(df, ["g"], "w", 1, id_cols=["v"]).collect()
