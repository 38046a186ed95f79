"""Trajectory stats (operators/trajectory.py): exact values + plan shape."""

import math

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.trajectory import (
    random_walk_positions,
    trajectory_stats,
)


def _pos_df(spark):
    # user 1: square-ish walk with a dwell pair; user 2: single point
    rows = [
        (1, 10, 100, 0, 0),
        (1, 20, 101, 300, 400),      # step 500
        (1, 30, 102, 310, 405),      # step sqrt(125) (dwell)
        (1, 40, 103, 315, 400),      # step sqrt(50)  (same dwell run)
        (1, 50, 104, 1315, 400),     # step 1000 (run breaks)
        (1, 60, 105, 1320, 400),     # step 5 (second dwell run)
        (2, 10, 200, 7, 9),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts long, event_id long, x long, y long")


def test_values_handcomputed(spark):
    out = {r["user_id"]: r for r in trajectory_stats(
        _pos_df(spark), dwell_step2=1000).collect()}
    u1 = out[1]
    assert u1["n_pts"] == 6
    expect = 0.0
    for s2 in (500 * 500, 125, 50, 1000 * 1000, 25):
        expect += math.sqrt(s2)
    assert u1["path_len"] == expect          # identical fold order
    assert u1["max_step2"] == 1000 * 1000
    assert (u1["net_dx"], u1["net_dy"]) == (1320, 400)
    assert (u1["minx"], u1["miny"], u1["maxx"], u1["maxy"]) == (0, 0, 1320, 405)
    assert u1["n_dwells"] == 2               # {125,50} run + {25} run
    u2 = out[2]
    assert u2["n_pts"] == 1 and u2["path_len"] == 0.0
    assert u2["max_step2"] is None and u2["net_dx"] is None
    assert u2["n_dwells"] == 0


def test_single_shuffle_plan(spark):
    df = trajectory_stats(_pos_df(spark), dwell_step2=1000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange == 1, plan             # windows + groupBy share the key
    assert "EvalPython" not in plan


def test_random_walk_is_cumsum(spark):
    ev = spark.createDataFrame(
        [(1, 10, 3), (1, 20, 4), (1, 30, 5)],
        "user_id int, ts long, event_id long")
    rows = random_walk_positions(ev, jump=1000).orderBy("ts").collect()
    jx = [(e * 7919) % 2001 - 1000 for e in (3, 4, 5)]
    jy = [(e * 104729) % 2001 - 1000 for e in (3, 4, 5)]
    assert [r["x"] for r in rows] == [sum(jx[:i + 1]) for i in range(3)]
    assert [r["y"] for r in rows] == [sum(jy[:i + 1]) for i in range(3)]
