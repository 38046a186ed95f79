"""Unit differentials for the session-6 operator block: cohort
retention (hand triangle + python replay), Mann-Kendall cells (hand
trends + replay), min-max scaling (constant-group / NULL contracts +
replay), group-mode lives in test_session5_ops."""

import collections
import datetime
import random

from pyspark.sql import Row


def test_cohort_retention_hand(spark):
    from mapbox_filter_spark.operators.analytics import cohort_retention
    d = datetime.datetime
    rows = [
        ("a", d(2024, 1, 5)), ("a", d(2024, 1, 20)),  # dup month collapses
        ("a", d(2024, 2, 1)), ("a", d(2024, 4, 1)),
        ("b", d(2024, 1, 9)),
        ("c", d(2024, 2, 3)), ("c", d(2024, 3, 3)),
    ]
    df = spark.createDataFrame(rows, "e string, dt timestamp")
    got = {(r["cohort_month"], r["offset_months"]):
           (r["n_active"], r["cohort_size"], r["rate"])
           for r in cohort_retention(df, "e", "dt").collect()}
    jan = 2024 * 12 + 0
    feb = jan + 1
    assert got[(jan, 0)] == (2, 2, 1.0)          # a, b
    assert got[(jan, 1)] == (1, 2, 0.5)          # a in feb
    assert got[(jan, 3)] == (1, 2, 0.5)          # a in apr
    assert (jan, 2) not in got                   # nobody in mar
    assert got[(feb, 0)] == (1, 1, 1.0)          # c
    assert got[(feb, 1)] == (1, 1, 1.0)


def test_cohort_retention_replay(spark):
    from mapbox_filter_spark.operators.analytics import cohort_retention
    rng = random.Random(11)
    rows = [(f"u{rng.randint(0, 30)}",
             datetime.datetime(2024, rng.randint(1, 12), rng.randint(1, 28)))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "e string, dt timestamp")
    got = {(r["cohort_month"], r["offset_months"]): r["n_active"]
           for r in cohort_retention(df, "e", "dt").collect()}
    act = collections.defaultdict(set)
    for e, dt in rows:
        act[e].add(dt.year * 12 + dt.month - 1)
    exp = collections.Counter()
    for e, mons in act.items():
        c = min(mons)
        for m in mons:
            exp[(c, m - c)] += 1
    assert got == dict(exp)


def test_mann_kendall_hand(spark):
    from mapbox_filter_spark.operators.spatialstats import \
        mann_kendall_cells
    d = datetime.datetime
    rows = []
    # cell (0,0): counts 1,2,3 over three days -> S=3, up
    for day, n in [(1, 1), (2, 2), (3, 3)]:
        rows += [(0, 0, d(2024, 1, day))] * n
    # cell (5,5): counts 3,1 -> S=-1, down
    rows += [(50, 50, d(2024, 1, 1))] * 3 + [(50, 50, d(2024, 1, 2))]
    # cell (9,9): one day only -> S=0 flat via the left join
    rows += [(90, 90, d(2024, 1, 4))]
    df = spark.createDataFrame(rows, "x long, y long, ts timestamp")
    got = {(r["cx"], r["cy"]): (r["n_days"], r["s_stat"], r["trend"])
           for r in mann_kendall_cells(df, cell=10).collect()}
    assert got[(0, 0)] == (3, 3, "up")
    assert got[(5, 5)] == (2, -1, "down")
    assert got[(9, 9)] == (1, 0, "flat")


def test_mann_kendall_replay(spark):
    from mapbox_filter_spark.operators.spatialstats import \
        mann_kendall_cells
    rng = random.Random(23)
    rows = [(rng.randint(-25, 25), rng.randint(-25, 25),
             datetime.datetime(2024, 1, rng.randint(1, 10)))
            for _ in range(800)]
    df = spark.createDataFrame(rows, "x long, y long, ts timestamp")
    got = {(r["cx"], r["cy"]): (r["n_days"], r["s_stat"])
           for r in mann_kendall_cells(df, cell=10).collect()}
    daily = collections.Counter()
    for x, y, ts in rows:
        daily[(x // 10, y // 10, ts.day)] += 1
    cells = collections.defaultdict(dict)
    for (cx, cy, day), n in daily.items():
        cells[(cx, cy)][day] = n
    for cell, per in cells.items():
        days = sorted(per)
        s = sum((per[dj] > per[di]) - (per[dj] < per[di])
                for i, di in enumerate(days) for dj in days[i + 1:])
        assert got[cell] == (len(days), s)
    assert len(got) == len(cells)


def test_minmax_scale_contracts(spark):
    from mapbox_filter_spark.operators.stats import minmax_scale
    rows = [("a", 10), ("a", 20), ("a", 40), ("a", None),
            ("b", 7), ("b", 7),           # constant group -> NULL
            ("c", 3)]                     # singleton -> NULL
    df = spark.createDataFrame(rows, "g string, v int")
    out = minmax_scale(df, ["g"], "v").collect()
    got = {(r["g"], r["v"]): (r["lo"], r["hi"], r["scaled"]) for r in out}
    assert got[("a", 10)] == (10, 40, 0.0)
    assert got[("a", 20)] == (10, 40, 1.0 / 3.0)
    assert got[("a", 40)] == (10, 40, 1.0)
    assert got[("a", None)] == (10, 40, None)   # NULL value passes through
    assert got[("b", 7)] == (7, 7, None)        # zero range
    assert got[("c", 3)] == (3, 3, None)
    assert len(out) == len(rows)                # row-preserving
