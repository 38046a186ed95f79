"""Hilbert curve index (geo/hilbert.py): engine-vs-reference
differentials, curve properties, and guard rails."""

import random

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.hilbert import hilbert_encode, py_hilbert_d


def test_order4_exhaustive_and_bijection(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "hx int, hy int")
    got = {(r.hx, r.hy): r.h for r in hilbert_encode(df, 4).collect()}
    for (x, y), h in got.items():
        assert h == py_hilbert_d(x, y, 4), (x, y)
    # d is a bijection onto [0, 4^order)
    assert sorted(got.values()) == list(range(256))


def test_unit_step_adjacency():
    # consecutive curve positions are planar neighbors — the locality
    # property that makes h a file-clustering key (true Hilbert, not a
    # Z-order: Morton has |dx|+|dy| jumps up to 2^k at block seams)
    inv = {py_hilbert_d(x, y, 5): (x, y)
           for x in range(32) for y in range(32)}
    for d in range(len(inv) - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_order8_random_sample(spark):
    random.seed(7)
    rows = [(random.randrange(256), random.randrange(256))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "hx int, hy int")
    for r in hilbert_encode(df, 8).collect():
        assert r.h == py_hilbert_d(r.hx, r.hy, 8), (r.hx, r.hy)


def test_passthrough_and_guards(spark):
    df = spark.createDataFrame([(1, 2, 3, "z")],
                               "id int, hx int, hy int, tag string")
    out = hilbert_encode(df, 4)
    assert out.columns == ["id", "hx", "hy", "tag", "h"]
    row = out.collect()[0]
    assert (row.id, row.tag) == (1, "z")
    assert row.h == py_hilbert_d(2, 3, 4)

    with pytest.raises(ValueError, match="order"):
        hilbert_encode(df, 0)
    clash = df.withColumn("_hsx", F.lit(1))
    with pytest.raises(ValueError, match="_hsx"):
        hilbert_encode(clash, 4)
