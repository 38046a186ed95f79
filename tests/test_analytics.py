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


def test_revenue_delta_full_outer_and_classes(spark, tmp_path):
    from mapbox_filter_spark.queries_analytics import q_revenue_delta

    plan = q_revenue_delta(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan

    # hand fixture: cust 1 up, 2 down, 3 flat, 4 churned, 5 new
    rows = [
        (1, dt.datetime(1999, 6, 1), 10.00), (1, dt.datetime(2000, 6, 1), 20.00),
        (2, dt.datetime(1999, 6, 1), 30.00), (2, dt.datetime(2000, 6, 1), 10.00),
        (3, dt.datetime(1999, 6, 1), 15.00), (3, dt.datetime(2000, 6, 1), 15.00),
        (4, dt.datetime(1999, 6, 1), 99.00),
        (5, dt.datetime(2000, 6, 1), 77.00),
        (6, dt.datetime(1990, 1, 1), 1.00),  # outside both windows
    ]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r.o_custkey: (r.rev_a_c, r.rev_b_c, r.delta_c, r.cls)
           for r in q_revenue_delta(spark, str(tmp_path)).collect()}
    assert got == {
        1: (1000, 2000, 1000, "up"),
        2: (3000, 1000, -2000, "down"),
        3: (1500, 1500, 0, "flat"),
        4: (9900, None, -9900, "churned"),
        5: (None, 7700, 7700, "new"),
    }


def test_grouping_sets_levels(spark):
    from mapbox_filter_spark.queries_analytics import q_grouping_sets_report

    rows = q_grouping_sets_report(spark, "/root/testdata/sf0.001").collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid bitmask: 0 = (prio,status), 1 = (prio), 2 = (status), 3 = ()
    assert set(by_gid) == {0, 1, 2, 3}
    assert len(by_gid[3]) == 1
    total = by_gid[3][0]
    assert total.o_orderpriority is None and total.o_orderstatus is None
    # every level re-aggregates to the same grand totals
    for gid in (0, 1, 2):
        assert sum(r.n for r in by_gid[gid]) == total.n
        assert sum(r.sum_c for r in by_gid[gid]) == total.sum_c


def test_decayed_engagement_exact_shift(spark, tmp_path):
    from mapbox_filter_spark.queries_analytics import q_decayed_engagement

    t = dt.datetime(2024, 1, 10, 12, 0)
    rows = [
        (1, t, 10.00),                      # age 0: 1000 >> 0 = 1000
        (1, t - dt.timedelta(days=1), 10.01),   # 1001 >> 1 = 500
        (1, t - dt.timedelta(days=3), 0.07),    # 7 >> 3 = 0
        (2, t - dt.timedelta(days=2), 4.00),    # 400 >> 2 = 100
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.user_id: (r.n, r.raw_c, r.decayed_c) for r in
           q_decayed_engagement(spark, str(tmp_path)).collect()}
    assert got == {1: (3, 2008, 1500), 2: (1, 400, 100)}


def test_selective_join_gets_runtime_bloom_filter(spark):
    """Scale evidence: with the runtime bloom-filter optimizer enabled
    (and thresholds met), a selective dim filter is pushed to the fact
    side as a might_contain() pre-filter BEFORE the shuffle join — the
    mechanism that keeps a 100 TB fact scan from shuffling rows the
    dim side will drop anyway."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
            .filter("o_orderpriority = '1-URGENT'")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
