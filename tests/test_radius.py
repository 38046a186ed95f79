"""Geodesic radius join (operators/radius.py): brute-force differential."""

import math

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.radius import (
    plan_radius_cells,
    radius_join,
)


def _pts(n, seed, lat_cap=55.0):
    # a 20°×110° band: dense enough that 40 km balls are non-empty
    out = []
    for i in range(n):
        h = (i * 2654435761 + seed) % (1 << 32)
        lon = (h % 20000) / 1000.0 - 10.0
        lat = ((h // 20000) % int(2 * lat_cap * 1000)) / 1000.0 - lat_cap
        out.append((i, lon, lat))
    return out


def _hav(lon1, lat1, lon2, lat2):
    r1, r2 = math.radians(lat1), math.radians(lat2)
    dla = math.radians(lat2 - lat1) / 2
    dlo = math.radians(lon2 - lon1) / 2
    a = (math.sin(dla) ** 2
         + math.cos(r1) * math.cos(r2) * math.sin(dlo) ** 2)
    return 2 * 6371008.8 * math.asin(min(math.sqrt(a), 1.0))


def test_plan_picks_coarsest_sufficient():
    # precision 5 cell ≈ 4.9 km lat span; ring-1 must cover the ball
    p = plan_radius_cells(3000.0, lat_max=60.0)
    nbits = 5 * p
    lat_span = 180.0 / (1 << (nbits // 2)) * 111194.9
    assert lat_span >= 3000.0
    # one precision finer would violate at least one axis
    assert plan_radius_cells(3000.0, 60.0) < 12


def test_matches_brute_force(spark):
    corpus = spark.createDataFrame(
        _pts(4000, 7), "point_id long, lon double, lat double")
    queries = spark.createDataFrame(
        [(i, lo, la) for i, lo, la in _pts(25, 991)],
        "query_id long, lon double, lat double")
    R = 75_000.0
    got = {(r["query_id"], r["point_id"])
           for r in radius_join(corpus, queries, R).collect()}
    want = set()
    for qi, qlo, qla in _pts(25, 991):
        for pi, plo, pla in _pts(4000, 7):
            if _hav(qlo, qla, plo, pla) <= R:
                want.add((qi, pi))
    assert got == want
    assert len(want) > 0           # non-vacuous


def test_lat_contract_enforced(spark):
    corpus = spark.createDataFrame(
        _pts(10, 7), "point_id long, lon double, lat double")
    queries = spark.createDataFrame(
        [(0, 10.0, 80.0)], "query_id long, lon double, lat double")
    with pytest.raises(ValueError):
        radius_join(corpus, queries, 10_000.0, lat_max=60.0)


def test_plan_raises_beyond_coarsest():
    with pytest.raises(ValueError):
        plan_radius_cells(6_000_000.0, lat_max=85.0)
