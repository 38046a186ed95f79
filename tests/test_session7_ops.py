"""Unit differentials for the session-7 operator block: Knox
space-time pairs and Ripley's K (hand-built counts + python brute
replay, negative coords crossing cell boundaries, exact-threshold
ties)."""

import random

from pyspark.sql import functions as F


def _brute_knox(rows, eps, tau):
    sp = tp = joint = 0
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            (ia, xa, ya, ta), (ib, xb, yb, tb) = rows[a], rows[b]
            s = (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps
            t = abs(ta - tb) <= tau
            sp += s
            tp += t
            joint += s and t
    return sp, tp, joint


def test_knox_hand(spark):
    from mapbox_filter_spark.operators.spatialstats import knox_pairs
    # ids distinct; pair (1,2) close in both; (1,3) space only (tie at
    # exactly eps); (2,4) time only (tie at exactly tau); negatives
    # cross the cell-0 boundary.
    rows = [(1, 0, 0, 0), (2, 3, 4, 50), (3, -10, 0, 99999),
            (4, 500, 500, 150)]
    df = spark.createDataFrame(rows, "i long, x long, y long, t long")
    got = knox_pairs(df, eps=10, tau=100).collect()[0]
    sp, tp, joint = _brute_knox(rows, 10, 100)
    assert (got["space_pairs"], got["time_pairs"],
            got["joint_pairs"]) == (sp, tp, joint)
    assert got["n_points"] == 4 and got["n_pairs"] == 6
    assert got["expected"] == sp * float(tp) / 6.0


def test_knox_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import knox_pairs
    rng = random.Random(7)
    rows = [(i, rng.randint(-50, 50), rng.randint(-50, 50),
             rng.randint(0, 1000)) for i in range(120)]
    df = spark.createDataFrame(rows, "i long, x long, y long, t long")
    got = knox_pairs(df, eps=13, tau=37).collect()[0]
    sp, tp, joint = _brute_knox(rows, 13, 37)
    assert (got["space_pairs"], got["time_pairs"],
            got["joint_pairs"]) == (sp, tp, joint)


def test_ripley_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import ripley_k
    rng = random.Random(3)
    rows = [(i, rng.randint(-40, 40), rng.randint(-40, 40))
            for i in range(100)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    radii = [5, 11, 25]
    got = {r["r"]: r for r in ripley_k(df, radii).collect()}
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    n = len(rows)
    for r in radii:
        cnt = sum((xa - xb) ** 2 + (ya - yb) ** 2 <= r * r
                  for a, (_, xa, ya) in enumerate(rows)
                  for (_, xb, yb) in rows[a + 1:])
        row = got[r]
        assert row["pair_cnt"] == cnt
        assert row["n_points"] == n and row["area"] == area
        assert row["k_hat"] == (cnt * 2.0) * float(area) / (n * (n - 1))


def test_ripley_rejects_bad_radii(spark):
    from mapbox_filter_spark.operators.spatialstats import ripley_k
    import pytest
    df = spark.createDataFrame([(1, 0, 0)], "i long, x long, y long")
    with pytest.raises(ValueError):
        ripley_k(df, [])
    with pytest.raises(ValueError):
        ripley_k(df, [0, 5])
