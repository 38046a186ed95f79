"""Robust statistics (operators/stats.py): exact rank medians, MAD flags,
degenerate strata, partitioning independence."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.stats import (
    group_rank_median, robust_outliers)


@pytest.fixture(scope="module")
def grouped(spark):
    rows = (
        # group a: odd count -> median is the middle value (30)
        [("a", i, v) for i, v in enumerate([10, 20, 30, 40, 1000])]
        # group b: even count -> LOWER median (20 of [10,20,30,40])
        + [("b", i, v) for i, v in enumerate([40, 10, 30, 20])]
        # group c: constant -> med = v, MAD = 0
        + [("c", i, 7) for i in range(4)]
        + [("c", 4, 99)]
    )
    return spark.createDataFrame(rows, "g string, id int, v long")


def test_rank_median_odd_even_constant(spark, grouped):
    med = {r["g"]: r["med"]
           for r in group_rank_median(grouped, ["g"], "v").collect()}
    assert med == {"a": 30, "b": 20, "c": 7}


def test_mad_and_flags(spark, grouped):
    out = robust_outliers(grouped, ["g"], "v", k=(2, 1))
    rows = {(r["g"], r["id"]): r for r in out.collect()}
    # group a: devs off 30 = [20,10,0,10,970] -> MAD = rank-3 of
    # sorted devs [0,10,10,20,970] = 10; cut dev > 20 -> only 1000
    a = rows[("a", 4)]
    assert (a["med"], a["mad"], a["is_outlier"]) == (30, 10, True)
    assert not rows[("a", 3)]["is_outlier"]  # dev 10 <= 20
    # group c: MAD 0 -> any deviation flags
    assert rows[("c", 4)]["is_outlier"]
    assert not rows[("c", 0)]["is_outlier"]


def test_fractional_k_cross_multiplied(spark, grouped):
    # k = 3/2: group a cut is dev*2 > mad*3 = 30 -> dev 20 row flags
    out = robust_outliers(grouped.filter("g = 'a'"), ["g"], "v", k=(3, 2))
    flags = {r["id"]: r["is_outlier"] for r in out.collect()}
    assert flags == {0: True, 1: False, 2: False, 3: False, 4: True}


def test_partitioning_independent(spark, grouped):
    a = sorted(map(tuple, robust_outliers(
        grouped.repartition(1), ["g"], "v").collect()))
    b = sorted(map(tuple, robust_outliers(
        grouped.repartition(11), ["g"], "v").collect()))
    assert a == b


def test_row_count_preserved(spark, grouped):
    assert robust_outliers(grouped, ["g"], "v").count() == grouped.count()


def test_k_validation(spark, grouped):
    with pytest.raises(ValueError):
        robust_outliers(grouped, ["g"], "v", k=(-1, 1))
    with pytest.raises(ValueError):
        robust_outliers(grouped, ["g"], "v", k=(1, 0))


# ---------------------------------------------------------------- weighted


def _py_wmedian(pairs):
    """First value in (v, tie) order with 2*cumw >= W."""
    total = sum(w for _, _, w in pairs)
    cum = 0
    for v, _t, w in sorted(pairs, key=lambda p: (p[0], p[1])):
        cum += w
        if 2 * cum >= total:
            return v, total
    raise AssertionError("empty group")


def test_weighted_median_differential(spark):
    import random

    from mapbox_filter_spark.operators.stats import weighted_median

    rng = random.Random(7)
    rows = [(f"g{rng.randrange(5)}", i, rng.randrange(-50, 50),
             rng.randrange(1, 9)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id int, v long, w long")
    got = {r["g"]: (r["wmedian"], r["total_weight"])
           for r in weighted_median(df, ["g"], "v", "w", "id").collect()}
    by_g = {}
    for g, i, v, w in rows:
        by_g.setdefault(g, []).append((v, i, w))
    assert got == {g: _py_wmedian(ps) for g, ps in by_g.items()}


def test_weighted_median_unit_weights_match_rank_median(spark, grouped):
    from mapbox_filter_spark.operators.stats import weighted_median

    df = grouped.withColumn("w", F.lit(1).cast("long"))
    wm = {r["g"]: r["wmedian"]
          for r in weighted_median(df, ["g"], "v", "w", "id").collect()}
    med = {r["g"]: r["med"]
           for r in group_rank_median(grouped, ["g"], "v").collect()}
    assert wm == med  # 2*cumw >= W is the LOWER-median rule at w == 1


def test_weighted_median_partitioning_independent(spark, grouped):
    from mapbox_filter_spark.operators.stats import weighted_median

    df = grouped.withColumn("w", (1 + F.col("id") % 3).cast("long"))
    a = sorted(map(tuple, weighted_median(
        df.repartition(1), ["g"], "v", "w", "id").collect()))
    b = sorted(map(tuple, weighted_median(
        df.repartition(13), ["g"], "v", "w", "id").collect()))
    assert a == b


def test_time_weighted_avg_crafted(spark):
    from mapbox_filter_spark.operators.stats import time_weighted_avg

    us = 1_000_000
    # key k: v=10 holds 3 s, v=20 holds 1 s, last obs carries nothing
    rows = [("k", 1, 0 * us, 10), ("k", 2, 3 * us, 20),
            ("k", 3, 4 * us, 99),
            # single-observation key: no interval -> absent from output
            ("solo", 4, 5 * us, 7)]
    df = spark.createDataFrame(
        rows, "g string, id long, ts_us long, v long")
    out = {r["g"]: (r["twa_num"], r["twa_den"], r["twa"])
           for r in time_weighted_avg(df, ["g"], "ts_us", "v", "id")
           .collect()}
    assert out == {"k": (10 * 3 + 20 * 1, 4, 12.5)}


def test_time_weighted_avg_equal_ts_tiebreak(spark):
    from mapbox_filter_spark.operators.stats import time_weighted_avg

    us = 1_000_000
    # two obs at t=0: tiebreak id orders (5 then 10); the 5->10 hop is
    # zero-length so only v=10 accrues over [0, 2s)
    rows = [("k", 1, 0, 5), ("k", 2, 0, 10), ("k", 3, 2 * us, 0)]
    df = spark.createDataFrame(
        rows, "g string, id long, ts_us long, v long")
    row = time_weighted_avg(df, ["g"], "ts_us", "v", "id").collect()[0]
    assert (row["twa_num"], row["twa_den"], row["twa"]) == (20, 2, 10.0)


def test_time_weighted_avg_all_subsecond_group_dropped(spark):
    from mapbox_filter_spark.operators.stats import time_weighted_avg

    # both hops truncate to 0 s -> zero total weight -> group dropped
    rows = [("k", 1, 0, 5), ("k", 2, 400_000, 7), ("k", 3, 900_000, 9),
            ("ok", 4, 0, 1), ("ok", 5, 2_000_000, 3)]
    df = spark.createDataFrame(
        rows, "g string, id long, ts_us long, v long")
    out = {r["g"]: r["twa"]
           for r in time_weighted_avg(df, ["g"], "ts_us", "v", "id")
           .collect()}
    assert out == {"ok": 1.0}


# ---------------------------------------------------------------- gram matrix


def _np_gram(rows, dim, scale):
    import numpy as np

    x = np.array(rows, dtype="float64")
    q = np.floor(x * scale + 0.5).astype("int64")
    g = q.T @ q
    iu = np.triu_indices(dim)
    return {(int(i), int(j)): int(g[i, j]) for i, j in zip(*iu)}


def test_gram_matrix_exact_and_partition_independent(spark):
    import random

    from mapbox_filter_spark.operators.stats import gram_matrix

    rng = random.Random(13)
    dim = 8
    rows = [[rng.uniform(-2, 2) for _ in range(dim)] for _ in range(300)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<double>")

    def run(d):
        return {(r["i"], r["j"]): (r["g"], r["n"])
                for r in gram_matrix(d, "v", dim, scale=100).collect()}

    a = run(df.repartition(1))
    b = run(df.repartition(7))
    assert a == b  # int64 partials are order-free
    want = _np_gram(rows, dim, 100)
    assert {k: v[0] for k, v in a.items()} == want
    assert all(n == 300 for _g, n in a.values())


def test_gram_matrix_drives_pca(spark):
    """The driver-side PCA pattern: eigh of the centered covariance
    assembled from (g, n) + a mean pass recovers a planted direction."""
    import numpy as np

    from mapbox_filter_spark.operators.stats import gram_matrix

    rng = np.random.default_rng(5)
    dim = 6
    direction = np.array([3.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    direction /= np.linalg.norm(direction)
    x = (rng.normal(size=(400, 1)) * 5.0) @ direction[None, :] \
        + rng.normal(scale=0.1, size=(400, dim))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, v array<double>")
    scale = 10_000
    gm = {(r["i"], r["j"]): r["g"]
          for r in gram_matrix(df, "v", dim, scale=scale).collect()}
    g = np.zeros((dim, dim))
    for (i, j), v in gm.items():
        g[i, j] = g[j, i] = v / scale**2
    q = np.floor(x * scale + 0.5) / scale  # the operator's quantization
    mean = q.mean(axis=0)
    cov = g / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(abs(top @ direction) - 1.0) < 1e-3


def test_gram_matrix_validations(spark):
    from mapbox_filter_spark.operators.stats import gram_matrix

    df = spark.createDataFrame([(1, [1.0])], "id long, v array<double>")
    with pytest.raises(ValueError):
        gram_matrix(df, "v", 0)
    import pyspark

    with pytest.raises(Exception, match="expected dim"):
        gram_matrix(df, "v", 3).collect()


def test_gram_matrix_skips_null_vectors(spark):
    from mapbox_filter_spark.operators.stats import gram_matrix

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "id long, v array<double>")
    out = {(r["i"], r["j"]): (r["g"], r["n"])
           for r in gram_matrix(df, "v", 2, scale=1).collect()}
    # only the two non-null rows contribute; n matches
    assert out == {(0, 0): (1 + 9, 2), (0, 1): (2 + 12, 2),
                   (1, 1): (4 + 16, 2)}
