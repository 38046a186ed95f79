"""Python-replay differentials for operators/analytics.py (RFM, Markov
transitions, exact OLS trend) plus plan-shape guards — the windows must
sort the per-customer AGGREGATE, not the fact table, and the trend gate
must be a single map-side-combinable groupBy chain."""

import datetime as dt
import random

from pyspark.sql import functions as F


def _ntile(vals, n):
    # ANSI NTILE over an already-sorted list: first (len % n) buckets
    # get one extra row
    ln = len(vals)
    base, extra = divmod(ln, n)
    out, i = {}, 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            out[vals[i]] = b
            i += 1
    return out


def test_rfm_replay(spark):
    from mapbox_filter_spark.operators.analytics import rfm_scores

    random.seed(52)
    rows = []
    for oid in range(400):
        cust = random.randrange(40)
        day = random.randrange(365)
        cents = random.randrange(100, 500000)
        rows.append((cust, dt.datetime(2020, 1, 1)
                     + dt.timedelta(days=day), cents))
    df = spark.createDataFrame(
        rows, "cust long, d timestamp, cents long")
    got = {r.cust: r for r in
           rfm_scores(df, "cust", "d", "cents").collect()}

    anchor = max(r[1] for r in rows)
    per = {}
    for cust, d, cents in rows:
        e = per.setdefault(cust, [None, 0, 0])
        e[0] = d if e[0] is None else max(e[0], d)
        e[1] += 1
        e[2] += cents
    r_days = {c: (anchor - e[0]).days for c, e in per.items()}
    f = {c: e[1] for c, e in per.items()}
    m = {c: e[2] for c, e in per.items()}
    rs = _ntile(sorted(per, key=lambda c: (-r_days[c], c)), 5)
    fs = _ntile(sorted(per, key=lambda c: (f[c], c)), 5)
    ms = _ntile(sorted(per, key=lambda c: (m[c], c)), 5)
    assert set(got) == set(per)
    for c in per:
        g = got[c]
        assert (g.r_days, g.f, g.m_c) == (r_days[c], f[c], m[c]), c
        assert (g.r_score, g.f_score, g.m_score) == (rs[c], fs[c], ms[c]), c


def test_rfm_windows_sort_aggregate_not_facts(spark):
    from mapbox_filter_spark.queries_analytics import q_rfm_scores
    df = q_rfm_scores(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the NTILE windows run AFTER the per-customer HashAggregate: the
    # Window operators' child chain must contain the aggregate, i.e.
    # the first Window appears later in the plan text than the last
    # partial aggregate (plan prints children below parents)
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.rindex("HashAggregate")


def test_markov_replay_and_ties(spark):
    from mapbox_filter_spark.operators.analytics import markov_transitions

    t0 = dt.datetime(2024, 1, 1)
    # user 10: a->b->b->c; user 11 has two events at the SAME ts where
    # the event_id tiebreak decides the order: d(5) before a(6)
    rows = [
        (10, t0, 1, "a"), (10, t0 + dt.timedelta(1), 2, "b"),
        (10, t0 + dt.timedelta(2), 3, "b"), (10, t0 + dt.timedelta(3), 4, "c"),
        (11, t0, 5, "d"), (11, t0, 6, "a"),
        (12, t0, 7, "a"),  # singleton: no transition
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r.prev, r.cur): (r.n, r.n_from, r.p) for r in
           markov_transitions(df, "user_id", "ts", "event_type",
                              "event_id").collect()}
    assert got == {
        ("a", "b"): (1, 1, 1.0),
        ("b", "b"): (1, 2, 0.5),
        ("b", "c"): (1, 2, 0.5),
        ("d", "a"): (1, 1, 1.0),
    }


def test_trend_slope_exact_and_degenerate(spark):
    from mapbox_filter_spark.operators.analytics import trend_slope

    rows = (
        # g1: y = 3x + 7 exactly -> slope 3.0
        [("g1", x, 3 * x + 7) for x in range(10)]
        # g2: single point -> NULL slope (den 0)
        + [("g2", 4, 99)]
        # g3: two points same x -> zero x-variance -> NULL
        + [("g3", 2, 1), ("g3", 2, 5)]
        # g4: known small case y=[1,2,2] at x=[0,1,2] -> slope 1/2
        + [("g4", 0, 1), ("g4", 1, 2), ("g4", 2, 2)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in trend_slope(df, "g", "x", "y").collect()}
    assert got["g1"].slope == 3.0
    assert got["g1"].s_num == 3 * got["g1"].s_den
    assert got["g2"].slope is None and got["g2"].s_den == 0
    assert got["g3"].slope is None and got["g3"].s_den == 0
    assert got["g4"].s_num * 2 == got["g4"].s_den  # slope = 1/2
    assert got["g4"].slope == 0.5


def test_trend_gate_single_groupby_chain(spark):
    from mapbox_filter_spark.queries_analytics import q_trend_slope
    df = q_trend_slope(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_ohlc_bars_fixture(spark):
    from mapbox_filter_spark.operators.analytics import ohlc_bars

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        # bucket 1: ids 2,1 share the open timestamp -> tiebreak id=1
        ("s", 1, t0, 1, 500), ("s", 1, t0, 2, 900),
        ("s", 1, t0 + dt.timedelta(minutes=5), 3, 100),
        ("s", 1, t0 + dt.timedelta(minutes=9), 4, 700),
        # bucket 2: single event
        ("s", 2, t0 + dt.timedelta(days=1), 5, 42),
    ]
    df = spark.createDataFrame(
        rows, "g string, b long, ts timestamp, eid long, c long")
    got = {r.b: r for r in
           ohlc_bars(df, "g", "b", "ts", "eid", "c").collect()}
    b1 = got[1]
    assert (b1.open_c, b1.close_c, b1.high_c, b1.low_c) == (500, 700, 900, 100)
    assert (b1.n, b1.sum_c, b1.vwap) == (4, 2200, 550.0)
    b2 = got[2]
    assert (b2.open_c, b2.close_c, b2.n) == (42, 42, 1)


def test_ohlc_single_groupby_no_window(spark):
    from mapbox_filter_spark.queries_analytics import q_ohlc_bars
    df = q_ohlc_bars(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan


def _py_skyline(rows):
    # rows: (group, key, x, y); strict dominance within group
    out = []
    for g, k, x, y in rows:
        dom = any(g2 == g and x2 <= x and y2 <= y and (x2 < x or y2 < y)
                  for g2, _, x2, y2 in rows)
        if not dom:
            out.append((g, k, x, y))
    return sorted(out)


def test_skyline_replay_with_duplicates(spark):
    from mapbox_filter_spark.operators.analytics import skyline_2d

    random.seed(56)
    rows = [(f"g{random.randrange(3)}", i, random.randrange(12),
             random.randrange(12)) for i in range(300)]
    # force exact-duplicate frontier candidates: both must survive
    rows += [("g9", 9001, 0, 0), ("g9", 9002, 0, 0), ("g9", 9003, 1, 1)]
    df = spark.createDataFrame(rows, "g string, k long, x long, y long")
    got = sorted((r.g, r.k, r.x, r.y) for r in
                 skyline_2d(df, "g", "x", "y").collect())
    assert got == _py_skyline(rows)
    assert ("g9", 9001, 0, 0) in got and ("g9", 9002, 0, 0) in got
    assert ("g9", 9003, 1, 1) not in got


def test_path_ngrams_fixture_and_support(spark):
    from mapbox_filter_spark.operators.analytics import path_ngrams

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1..3 all do a->b->c->b (paths abc, bcb); user 4 does a->b
    for u in (1, 2, 3):
        for i, s in enumerate("abcb"):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, s))
            eid += 1
    rows.append((4, t0, eid, "a"))
    rows.append((4, t0 + dt.timedelta(minutes=1), eid + 1, "b"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = {(r.step_1, r.step_2, r.step_3): (r.n_occurrences, r.n_keys)
           for r in path_ngrams(df, "user_id", "ts", "event_type",
                                "event_id", n=3, min_support=2).collect()}
    assert got == {("a", "b", "c"): (3, 3), ("b", "c", "b"): (3, 3)}
    # support filter: min_support=4 kills everything
    assert path_ngrams(df, "user_id", "ts", "event_type", "event_id",
                       n=3, min_support=4).count() == 0
