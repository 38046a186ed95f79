"""Session-16 operator blocks: Cliff's delta — python brute
differentials + edge pins."""

import pytest

from mapbox_filter_spark.operators.rankstats import cliffs_delta


# ---- cliffs_delta ----

def test_cliffs_delta_hand_case(spark):
    # sample1 = [3, 5], sample2 = [1, 3]
    # pairs: 3>1, 3=3, 5>1, 5>3 -> gt=3, lt=0, ties=1
    # delta = 3/4, ps = U1/(n1 n2) = (3 + 0.5)/4 = 0.875
    rows = [("g", True, 3), ("g", True, 5), ("g", False, 1),
            ("g", False, 3)]
    df = spark.createDataFrame(rows, "g string, f boolean, x long")
    r = cliffs_delta(df, ["g"], "f", "x").collect()[0]
    assert (r.n1, r.n2) == (2, 2)
    assert r.d2 == 2 * 3  # 2*(gt - lt)
    assert r.delta == pytest.approx(0.75)
    assert r.ps == pytest.approx(0.875)


def test_cliffs_delta_python_differential(spark):
    import random
    rng = random.Random(16)
    rows = [("g", rng.random() < 0.5, rng.randrange(6))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, f boolean, x long")
    r = cliffs_delta(df, ["g"], "f", "x").collect()[0]
    s1 = [x for _, f, x in rows if f]
    s2 = [x for _, f, x in rows if not f]
    gt = sum(1 for a in s1 for b in s2 if a > b)
    lt = sum(1 for a in s1 for b in s2 if a < b)
    ties = len(s1) * len(s2) - gt - lt
    assert (r.n1, r.n2) == (len(s1), len(s2))
    assert r.d2 == 2 * (gt - lt)
    assert r.delta == pytest.approx((gt - lt) / (len(s1) * len(s2)))
    assert r.ps == pytest.approx((gt + 0.5 * ties)
                                 / (len(s1) * len(s2)))


def test_cliffs_delta_degenerate_and_extremes(spark):
    # one-sample group -> NULL delta/ps; total dominance -> +1
    rows = [("empty2", True, 1), ("empty2", True, 2),
            ("dom", True, 10), ("dom", True, 11), ("dom", False, 1)]
    df = spark.createDataFrame(rows, "g string, f boolean, x long")
    out = {r.g: r for r in cliffs_delta(df, ["g"], "f", "x").collect()}
    assert out["empty2"].delta is None and out["empty2"].ps is None
    assert out["dom"].delta == 1.0 and out["dom"].ps == 1.0


def test_cliffs_delta_null_rows_excluded(spark):
    rows = [("g", True, 3), ("g", None, 99), ("g", False, None),
            ("g", False, 1)]
    df = spark.createDataFrame(rows, "g string, f boolean, x long")
    r = cliffs_delta(df, ["g"], "f", "x").collect()[0]
    assert (r.n1, r.n2) == (1, 1)
    assert r.delta == 1.0
