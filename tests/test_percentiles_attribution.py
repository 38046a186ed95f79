"""rank_percentiles (operators/stats.py), seasonal_anomaly
(operators/temporal.py) and the last-touch attribution composition:
python replays + edge cases (tie handling, tolerance cutoffs)."""

import random

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.stats import rank_percentiles
from mapbox_filter_spark.operators.temporal import seasonal_anomaly


def _py_rank_pcts(vals, qs):
    s = sorted(vals)
    n = len(s)
    return {q: s[(q * n + 99) // 100 - 1] for q in qs}


def test_rank_percentiles_replay(spark):
    random.seed(41)
    vals = [random.randrange(0, 10_000) for _ in range(777)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    r = rank_percentiles(df, ["g"], "v", qs=(1, 50, 90, 99, 100)) \
        .collect()[0]
    exp = _py_rank_pcts(vals, (1, 50, 90, 99, 100))
    assert r.n == 777
    assert (r.p1, r.p50, r.p90, r.p99, r.p100) == \
        (exp[1], exp[50], exp[90], exp[99], exp[100])
    # q=100 is the max; q=1 is the ceil(n/100)-th smallest (the 8th
    # here), NOT the min — the rank convention, same in both replays
    assert r.p100 == max(vals) and r.p1 == sorted(vals)[7]


def test_rank_percentiles_ties_and_validation(spark):
    # heavy ties: every percentile is an actual data value
    df = spark.createDataFrame([("g", v % 3) for v in range(100)],
                               "g string, v long")
    r = rank_percentiles(df, ["g"], "v", qs=(50, 99)).collect()[0]
    assert (r.p50, r.p99) == (1, 2)
    with pytest.raises(ValueError, match="1..100"):
        rank_percentiles(df, ["g"], "v", qs=(0, 50))


def _py_seasonal(rows, k):
    from collections import defaultdict
    base = defaultdict(lambda: [0, 0])
    for _id, season, v in rows:
        base[season][0] += 1
        base[season][1] += v
    scored = [(_id, season, v, base[season][0],
               base[season][0] * v - base[season][1])
              for _id, season, v in rows]
    scored.sort(key=lambda t: (-abs(t[4]), t[0]))
    return scored[:k]


def test_seasonal_anomaly_replay(spark):
    random.seed(42)
    rows = [(i, i % 6, random.randrange(0, 100)) for i in range(240)]
    rows[17] = (17, 17 % 6, 10_000)       # planted outlier
    df = spark.createDataFrame([("g", *r) for r in rows],
                               "g string, id long, season long, v long")
    got = seasonal_anomaly(df, ["g"], season_col="season",
                           value_col="v", id_col="id", top_k=5) \
        .orderBy(F.abs(F.col("dev")).desc(), "id").collect()
    exp = _py_seasonal(rows, 5)
    assert [(r.id, r.season, r.v, r.n_season, r.dev) for r in got] == exp
    assert got[0].id == 17                # the plant ranks first


H = 3_600_000_000


def _ev(spark, rows):
    # rows: (event_id, user, type, us, value)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "us long, value double")
    return df.select("event_id", "user_id", "event_type", "value",
                     F.timestamp_micros(F.col("us")).alias("ts"))


def test_attribution_scenarios(spark, tmp_path):
    from mapbox_filter_spark.queries_temporal import q_attribution
    rows = [
        # user 1: click then purchase 1h later -> click attributed
        (1, 1, "click", 0, 0.0),
        (2, 1, "purchase", H, 5.00),
        # user 2: view, then a LATER click, purchase after both ->
        # last touch wins (click)
        (3, 2, "view", 0, 0.0),
        (4, 2, "click", H, 0.0),
        (5, 2, "purchase", 2 * H, 7.00),
        # user 3: touch outside the 7-day window -> none
        (6, 3, "view", 0, 0.0),
        (7, 3, "purchase", 200 * H, 11.00),
        # user 4: purchase with no touch at all -> none
        (8, 4, "purchase", H, 3.00),
        # user 5: view and click at the SAME ts -> greatest event_id
        (9, 5, "view", 0, 0.0),
        (10, 5, "click", 0, 0.0),
        (11, 5, "purchase", H, 2.00),
    ]
    p = str(tmp_path / "events.parquet")
    _ev(spark, rows).write.parquet(p)
    got = {r.touch_type: r for r in
           q_attribution(spark, str(tmp_path)).collect()}
    assert got["click"].n_purch == 3          # users 1, 2, 5
    assert got["click"].sum_cents == 500 + 700 + 200
    assert got["click"].sum_gap_us == H + H + H
    assert got["none"].n_purch == 2           # users 3, 4
    assert got["none"].sum_cents == 1100 + 300
    assert got["none"].sum_gap_us is None
    assert "view" not in got
