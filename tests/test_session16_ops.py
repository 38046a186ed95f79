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


# ---- maidenhead ----

def _mh_py(lat_e6, lng_e6, length=8):
    """Independent spec replica: float-free Maidenhead from microdeg."""
    FIELDS = "ABCDEFGHIJKLMNOPQR"
    SUBS = "abcdefghijklmnopqrstuvwx"
    lng = lng_e6 + 180_000_000
    lat = lat_e6 + 90_000_000
    out = FIELDS[lng // 20_000_000] + FIELDS[lat // 10_000_000]
    if length >= 4:
        out += str((lng % 20_000_000) // 2_000_000)
        out += str((lat % 10_000_000) // 1_000_000)
    if length >= 6:
        out += SUBS[(lng % 2_000_000) * 12 // 1_000_000]
        out += SUBS[(lat % 1_000_000) * 24 // 1_000_000]
    if length >= 8:
        out += str((lng % 2_000_000) * 120 // 1_000_000 % 10)
        out += str((lat % 1_000_000) * 240 // 1_000_000 % 10)
    return out


def test_maidenhead_known_locators(spark):
    from pyspark.sql import functions as F
    from mapbox_filter_spark.geo.maidenhead import maidenhead_encode
    # Munich -> JN58td, ARRL HQ -> FN31pr (public ham-radio examples)
    rows = [(48_146_660, 11_608_330, "JN58td"),
            (41_714_775, -72_727_260, "FN31pr")]
    df = spark.createDataFrame(rows, "lat long, lng long, want string")
    got = df.select(
        maidenhead_encode(F.col("lat"), F.col("lng"), length=6)
        .alias("mh"), "want").collect()
    for r in got:
        assert r.mh == r.want


def test_maidenhead_python_differential(spark):
    import random
    from pyspark.sql import functions as F
    from mapbox_filter_spark.geo.maidenhead import maidenhead_encode
    rng = random.Random(16)
    rows = [(rng.randrange(-90_000_000, 90_000_000),
             rng.randrange(-180_000_000, 180_000_000))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "lat long, lng long")
    for n in (2, 4, 6, 8):
        got = df.select("lat", "lng",
                        maidenhead_encode(F.col("lat"), F.col("lng"),
                                          length=n).alias("mh")).collect()
        for r in got:
            assert r.mh == _mh_py(r.lat, r.lng, n), (r.lat, r.lng, n)


def test_maidenhead_prefix_property(spark):
    from pyspark.sql import functions as F
    from mapbox_filter_spark.geo.maidenhead import maidenhead_encode
    df = spark.createDataFrame([(12_345_678, -98_765_432)],
                               "lat long, lng long")
    r = df.select(
        maidenhead_encode(F.col("lat"), F.col("lng"), length=8)
        .alias("m8"),
        maidenhead_encode(F.col("lat"), F.col("lng"), length=4)
        .alias("m4")).collect()[0]
    assert r.m8.startswith(r.m4)


def test_maidenhead_bad_length():
    import pytest as _pytest
    from pyspark.sql import functions as F
    from mapbox_filter_spark.geo.maidenhead import maidenhead_encode
    with _pytest.raises(ValueError):
        maidenhead_encode(F.lit(0), F.lit(0), length=5)


# ---- location_quotient ----

def test_location_quotient_hand_case(spark):
    from mapbox_filter_spark.operators.spatialstats import \
        location_quotient
    # cell A: 3 of k1, 1 of k2; cell B: 1 of k1, 3 of k2
    rows = ([("A", 0, "k1")] * 3 + [("A", 0, "k2")]
            + [("B", 0, "k1")] + [("B", 0, "k2")] * 3)
    df = spark.createDataFrame(rows, "cx string, cy long, k string")
    out = {(r.cx, r.k): r for r in
           location_quotient(df, ["cx", "cy"], "k").collect()}
    # global shares are 50/50, so LQ = local share / 0.5
    assert out[("A", "k1")].lq == pytest.approx(1.5)
    assert out[("A", "k2")].lq == pytest.approx(0.5)
    assert out[("B", "k1")].lq == pytest.approx(0.5)
    r = out[("B", "k2")]
    assert (r.n_ck, r.n_c, r.n_k, r.n_tot) == (3, 4, 4, 8)
    assert r.lq == pytest.approx(1.5)


def test_location_quotient_python_differential(spark):
    import random
    from mapbox_filter_spark.operators.spatialstats import \
        location_quotient
    rng = random.Random(16)
    rows = [(rng.randrange(4), 0, f"k{rng.randrange(3)}")
            for _ in range(500)]
    df = spark.createDataFrame(rows, "cx long, cy long, k string")
    got = {(r.cx, r.k): r for r in
           location_quotient(df, ["cx", "cy"], "k").collect()}
    n_tot = len(rows)
    for (cx, k), r in got.items():
        n_ck = sum(1 for c, _, kk in rows if c == cx and kk == k)
        n_c = sum(1 for c, _, _ in rows if c == cx)
        n_k = sum(1 for _, _, kk in rows if kk == k)
        assert (r.n_ck, r.n_c, r.n_k, r.n_tot) == (n_ck, n_c, n_k, n_tot)
        assert r.lq == pytest.approx((n_ck * n_tot) / (n_c * n_k))
    # every occupied (cell, cat) pair present, none fabricated
    assert set(got) == {(c, k) for c, _, k in rows}


def test_location_quotient_broadcast_plan(spark):
    from mapbox_filter_spark.operators.spatialstats import \
        location_quotient
    df = spark.createDataFrame([(0, 0, "a"), (1, 0, "b")],
                               "cx long, cy long, k string")
    plan = location_quotient(df, ["cx", "cy"], "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- lexical_diversity ----

def test_lexical_diversity_hand_case(spark):
    from mapbox_filter_spark.operators.text import lexical_diversity
    # tokens: a a a b b c  -> N=6, V=3, s2=9+4+1=14, V1=1
    df = spark.createDataFrame([("a a a b b c",)], "text string")
    r = lexical_diversity(df, "text").collect()[0]
    assert (r.n_tokens, r.v_types, r.v1_hapax, int(r.s2)) == (6, 3, 1, 14)
    assert r.yule_k == pytest.approx(1e4 * (14 - 6) / 36)
    assert r.simpson_d == pytest.approx((14 - 6) / (6 * 5))
    assert r.hapax_ratio == pytest.approx(1 / 3)


def test_lexical_diversity_python_differential(spark):
    import random
    from collections import Counter
    from mapbox_filter_spark.operators.text import lexical_diversity
    rng = random.Random(16)
    docs = [" ".join(f"w{rng.randrange(40)}" for _ in range(rng.randrange(1, 30)))
            for _ in range(60)]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    r = lexical_diversity(df, "text").collect()[0]
    c = Counter(w for d in docs for w in d.split())
    n = sum(c.values())
    s2 = sum(v * v for v in c.values())
    assert (r.n_tokens, r.v_types, int(r.s2)) == (n, len(c), s2)
    assert r.v1_hapax == sum(1 for v in c.values() if v == 1)
    assert r.yule_k == pytest.approx(1e4 * (s2 - n) / (n * n))
    assert r.simpson_d == pytest.approx((s2 - n) / (n * (n - 1)))


def test_lexical_diversity_degenerate(spark):
    from mapbox_filter_spark.operators.text import lexical_diversity
    # all-hapax corpus: simpson = 0, yule = 0
    df = spark.createDataFrame([("x y z",)], "text string")
    r = lexical_diversity(df, "text").collect()[0]
    assert r.yule_k == 0.0 and r.simpson_d == 0.0
    assert r.hapax_ratio == 1.0
