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
