"""Temporal operator tests (operators/temporal.py).

Independent oracles, not re-derivations:
- asof_join       vs pandas.merge_asof (backward/forward, exact-match flag,
                  tolerance) on a seeded random fixture
- interval_join   vs the naive crossJoin-and-filter range join
- sessionize      vs Spark's built-in session_window aggregation
- time_rollup     coarse grain from partials vs direct aggregation
plus physical-plan shape guards (shuffle counts, no nested-loop join).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.temporal import (
    asof_join,
    interval_join,
    session_stats,
    sessionize,
    time_bucket,
    time_rollup,
)

SEED = 20260817


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tdata():
    """Seeded event fixture: 20 keys, unique (key, ts) per side."""
    rng = np.random.default_rng(SEED)
    base = pd.Timestamp("2024-03-01")

    def mk(n, tag):
        ts = base + pd.to_timedelta(
            rng.choice(10_000_000, size=n, replace=False), unit="s")
        return pd.DataFrame({
            "key": rng.integers(0, 20, size=n).astype("int64"),
            "ts": ts,
            f"{tag}_id": np.arange(n, dtype="int64"),
            f"{tag}_v": np.round(rng.random(n) * 100, 2),
        })

    return mk(400, "l"), mk(300, "r")


@pytest.mark.parametrize("direction,exact,tol", [
    ("backward", True, None),
    ("backward", False, None),
    ("backward", True, 86_400.0),
    ("forward", True, None),
    ("forward", False, 3_600.0 * 48),
])
def test_asof_matches_pandas(spark, tdata, direction, exact, tol):
    lpd, rpd = tdata
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)

    got = asof_join(
        left, right, on=["key"], direction=direction,
        allow_exact_matches=exact, tolerance_s=tol, tiebreak="r_id",
    ).select("l_id", "r_id_r", "r_v_r").toPandas()

    want = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="key", direction=direction,
        allow_exact_matches=exact,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )[["l_id", "r_id", "r_v"]]

    g = got.sort_values("l_id").reset_index(drop=True)
    w = want.sort_values("l_id").reset_index(drop=True)
    assert len(g) == len(w) == len(lpd)
    pd.testing.assert_series_equal(
        g["r_id_r"], w["r_id"], check_names=False)
    pd.testing.assert_series_equal(
        g["r_v_r"], w["r_v"], check_names=False)


def test_asof_gap_sign_and_null(spark, tdata):
    lpd, rpd = tdata
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    for direction in ("backward", "forward"):
        out = asof_join(left, right, on=["key"], direction=direction,
                        tiebreak="r_id").toPandas()
        matched = out[out["r_id_r"].notna()]
        assert (matched["asof_gap_us"] >= 0).all()
        unmatched = out[out["r_id_r"].isna()]
        assert unmatched["asof_gap_us"].isna().all()


def test_asof_equal_ts_tiebreak(spark):
    """Three right rows at one timestamp: backward carries the greatest
    tiebreak (pandas keeps the last sorted right row), forward the
    smallest (pandas keeps the first)."""
    ts = pd.Timestamp("2024-01-01 12:00:00")
    lpd = pd.DataFrame({"key": [1, 1], "ts": [ts, ts],
                        "l_id": np.array([0, 1], dtype="int64")})
    rpd = pd.DataFrame({"key": [1] * 3, "ts": [ts] * 3,
                        "r_id": np.array([7, 5, 9], dtype="int64")})
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    back = asof_join(left, right, on=["key"], direction="backward",
                     tiebreak="r_id").toPandas()
    assert set(back["r_id_r"]) == {9}
    fwd = asof_join(left, right, on=["key"], direction="forward",
                    tiebreak="r_id").toPandas()
    assert set(fwd["r_id_r"]) == {5}
    # exact matches off: nothing strictly before/after
    none = asof_join(left, right, on=["key"], direction="backward",
                     allow_exact_matches=False, tiebreak="r_id").toPandas()
    assert none["r_id_r"].isna().all()


def test_asof_single_shuffle(spark, tdata):
    lpd, rpd = tdata
    j = asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  on=["key"], tiebreak="r_id")
    p = _phys(j)
    n_exchange = p.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"asof_join should shuffle once:\n{p}"
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_interval_join_equals_naive(spark, tdata):
    lpd, rpd = tdata
    ev = spark.createDataFrame(lpd).withColumnRenamed("l_id", "event_id")
    iv = (spark.createDataFrame(rpd)
          .select(F.col("r_id").alias("win_id"), "key",
                  F.col("ts").alias("start"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end")))
    got = (interval_join(ev, iv, on=["key"], ts="ts", start="start",
                         end="end", bucket_s=7200)
           .select("win_id", "event_id"))
    naive = (iv.alias("a").join(ev.alias("b"),
                                (F.col("a.key") == F.col("b.key"))
                                & (F.col("b.ts") >= F.col("a.start"))
                                & (F.col("b.ts") < F.col("a.end")))
             .select("win_id", "event_id"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))
    assert got.count() > 0

    # a bucket much smaller than the interval still gives the same rows
    # (wider explode, same containment)
    small = (interval_join(ev, iv, on=["key"], ts="ts", start="start",
                           end="end", bucket_s=600)
             .select("win_id", "event_id"))
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, naive.collect()))


def test_interval_join_left_keeps_empty(spark):
    ev = spark.createDataFrame(pd.DataFrame({
        "key": np.array([1], dtype="int64"),
        "ts": [pd.Timestamp("2024-01-01 00:30:00")],
        "event_id": np.array([10], dtype="int64")}))
    iv = spark.createDataFrame(pd.DataFrame({
        "key": np.array([1, 1], dtype="int64"),
        "win_id": np.array([0, 1], dtype="int64"),
        "start": [pd.Timestamp("2024-01-01 00:00:00"),
                  pd.Timestamp("2024-01-02 00:00:00")],
        "end": [pd.Timestamp("2024-01-01 01:00:00"),
                pd.Timestamp("2024-01-02 01:00:00")]}))
    out = (interval_join(ev, iv, on=["key"], bucket_s=3600, how="left")
           .groupBy("win_id")
           .agg(F.count("event_id").alias("n"))
           .collect())
    assert {(r["win_id"], r["n"]) for r in out} == {(0, 1), (1, 0)}


def test_interval_join_no_nested_loop(spark, tdata):
    lpd, rpd = tdata
    ev = spark.createDataFrame(lpd)
    iv = (spark.createDataFrame(rpd)
          .select(F.col("r_id").alias("win_id"), "key",
                  F.col("ts").alias("start"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end")))
    p = _phys(interval_join(ev, iv, on=["key"], bucket_s=7200))
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_interval_join_validations(spark, tdata):
    lpd, rpd = tdata
    ev = spark.createDataFrame(lpd)
    iv = spark.createDataFrame(rpd).select(
        "key", F.col("ts").alias("start"), F.col("ts").alias("end"))
    with pytest.raises(ValueError, match="bucket_s"):
        interval_join(ev, iv, on=["key"], bucket_s=0)
    with pytest.raises(ValueError, match="how"):
        interval_join(ev, iv, on=["key"], bucket_s=60, how="full")


def test_sessionize_matches_session_window(spark, tdata):
    """Hand-rolled sessions must reproduce the built-in session_window
    boundaries: [min_ts, max_ts + gap) per session."""
    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    gap = 3600.0 * 6

    mine = (session_stats(
        sessionize(ev, ["key"], gap_s=gap, tiebreak="l_id"), ["key"])
        .select("key", "session_start", "session_end", "n_events"))
    builtin = (ev.groupBy("key",
                          F.session_window("ts", f"{int(gap)} seconds"))
               .agg(F.count(F.lit(1)).alias("n_events"))
               .select("key",
                       F.col("session_window.start").alias("session_start"),
                       (F.col("session_window.end")
                        - F.expr(f"INTERVAL {int(gap)} SECONDS"))
                       .alias("session_end"),
                       "n_events"))
    a = sorted(map(tuple, mine.collect()))
    b = sorted(map(tuple, builtin.collect()))
    assert a == b
    assert len(a) > len(set(r[0] for r in a))  # >1 session for some key


def test_sessionize_gap_is_inclusive(spark):
    """Events exactly gap_s apart stay in ONE session (documented ≤)."""
    ts0 = pd.Timestamp("2024-01-01")
    ev = spark.createDataFrame(pd.DataFrame({
        "key": np.array([1, 1, 1], dtype="int64"),
        "ts": [ts0, ts0 + pd.Timedelta(seconds=60),
               ts0 + pd.Timedelta(seconds=121)],
        "l_id": np.array([0, 1, 2], dtype="int64")}))
    out = sessionize(ev, ["key"], gap_s=60, tiebreak="l_id") \
        .select("l_id", "session_id").collect()
    got = {r["l_id"]: r["session_id"] for r in out}
    assert got == {0: 1, 1: 1, 2: 2}


def test_sessionize_single_shuffle(spark, tdata):
    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    st = session_stats(
        sessionize(ev, ["key"], gap_s=3600, tiebreak="l_id"), ["key"])
    p = _phys(st)
    # the groupBy(key, session_id) reuses the window's hash(key)
    # partitioning — no second exchange
    assert p.count("Exchange hashpartitioning") == 1, p


def test_time_rollup_partials_equal_direct(spark, tdata):
    lpd, _ = tdata
    ev = spark.createDataFrame(lpd).withColumn(
        "v_c", F.round(F.col("l_v") * 100, 0).cast("long"))
    r = time_rollup(ev, value="v_c", group=["key"],
                    grains_s=[3600, 86400])
    coarse = r.filter(F.col("grain_s") == 86400) \
        .select("bucket_start", "key", "n", "vsum", "vmin", "vmax", "vavg")
    direct = (ev.withColumn("bucket_start", time_bucket(F.col("ts"), 86400))
              .groupBy("bucket_start", "key")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("v_c").alias("vsum"),
                   F.min("v_c").alias("vmin"),
                   F.max("v_c").alias("vmax"))
              .select("bucket_start", "key", "n", "vsum", "vmin", "vmax",
                      (F.col("vsum") / F.col("n")).alias("vavg")))
    assert sorted(map(tuple, coarse.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_time_rollup_single_raw_scan(spark, tdata):
    """The raw table is scanned once: coarse grains read the fine
    partial, so the plan contains exactly one scan of the input."""
    lpd, _ = tdata
    path = "/tmp/mfs_rollup_scan_fixture"
    spark.createDataFrame(lpd).withColumn(
        "v_c", F.round(F.col("l_v") * 100, 0).cast("long")) \
        .write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)
    # no-reuse first: once persist() registers the partial, the cache
    # manager substitutes it into ANY later matching plan
    raw = time_rollup(ev, value="v_c", group=["key"],
                      grains_s=[3600, 86400, 7 * 86400],
                      reuse_partials=False)
    praw = _phys(raw)
    assert "InMemoryTableScan" not in praw
    assert praw.count("FileScan parquet") == 3  # one raw scan per grain

    r = time_rollup(ev, value="v_c", group=["key"],
                    grains_s=[3600, 86400, 7 * 86400])
    p = _phys(r)
    # every grain branch reads the SHARED persisted partial (the plan
    # prints the cached subtree under each InMemoryTableScan, so the
    # FileScan line repeats textually but executes once)
    assert p.count("InMemoryTableScan") == 3, p


def test_time_rollup_validations(spark, tdata):
    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    with pytest.raises(ValueError, match="ascending"):
        time_rollup(ev, value="l_v", group=[], grains_s=[3600, 60])
    with pytest.raises(ValueError, match="multiple"):
        time_rollup(ev, value="l_v", group=[], grains_s=[3600, 5000])


def test_incremental_rollup_refresh(spark, tdata):
    """refresh path == full rebuild, and untouched day partitions are
    not rewritten (dynamic partition overwrite)."""
    import os

    from mapbox_filter_spark.operators.temporal import (
        read_rollup_partial,
        refresh_rollup_partial,
        rollup_from_partial,
        write_rollup_partial,
    )

    lpd, _ = tdata
    ev = spark.createDataFrame(lpd).withColumn(
        "v_c", F.round(F.col("l_v") * 100, 0).cast("long"))
    # split mid-range at an hour boundary + 30 min so the two batches
    # SHARE a day — the refresh must merge, not just append
    cut = lpd["ts"].quantile(0.5).floor("h") + pd.Timedelta(minutes=30)
    first = ev.filter(F.col("ts") < F.lit(cut))
    second = ev.filter(F.col("ts") >= F.lit(cut))
    assert first.count() and second.count()

    path = "/tmp/mfs_rollup_store"
    write_rollup_partial(first, path, value="v_c", group=["key"],
                         fine_s=3600)

    # snapshot an early day partition that batch 2 cannot touch
    min_day2 = second.agg(F.min(F.to_date("ts"))).first()[0]
    untouched = [d for d in os.listdir(path)
                 if d.startswith("_pday=") and
                 d.split("=")[1] < str(min_day2)]
    assert untouched, "fixture must have history days before the cut"
    probe_dir = os.path.join(path, untouched[0])
    before = {f: os.path.getmtime(os.path.join(probe_dir, f))
              for f in os.listdir(probe_dir)}

    n_days = refresh_rollup_partial(spark, second, path, value="v_c",
                                    group=["key"], fine_s=3600)
    assert n_days > 0

    after = {f: os.path.getmtime(os.path.join(probe_dir, f))
             for f in os.listdir(probe_dir)}
    assert before == after  # history partition untouched byte-for-byte

    got = rollup_from_partial(
        read_rollup_partial(spark, path), group=["key"],
        grains_s=[3600, 86400])
    want = time_rollup(ev, value="v_c", group=["key"],
                       grains_s=[3600, 86400], reuse_partials=False)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_refresh_empty_batch_noop(spark, tdata):
    from mapbox_filter_spark.operators.temporal import (
        refresh_rollup_partial, write_rollup_partial)

    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    path = "/tmp/mfs_rollup_store_empty"
    write_rollup_partial(ev, path, value="l_v", group=["key"],
                         fine_s=3600)
    n = refresh_rollup_partial(
        spark, ev.filter(F.lit(False)), path,
        value="l_v", group=["key"], fine_s=3600)
    assert n == 0


def test_quantile_approx_within_rank_error(spark):
    """percentile_approx with accuracy A has rank error ≤ n/A of the
    exact percentile — sanity for the sketch path next to the exact
    quantile_profile gate."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    rows = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.9)).alias("exact"),
        F.percentile_approx("value", F.lit(0.9), F.lit(10_000))
        .alias("approx"),
        F.expr("sort_array(collect_list(value))").alias("vals"),
    ).collect()
    for r in rows:
        vals = r["vals"]
        n = len(vals)
        # rank of the approx answer must be within n/10000 + 1 of 0.9n
        import bisect
        rank = bisect.bisect_right(vals, r["approx"])
        assert abs(rank - 0.9 * n) <= n / 10_000 + 2, \
            (r["event_type"], rank, n)


def test_histogram_rollup_error_bound(spark):
    """The estimate shares a bin with the ⌈q·n⌉-th smallest value (the
    rank the crossing-bin search targets), so |est − v_rank| ≤ one bin
    width.  (It is NOT within a bin width of the q·(n−1)-interpolated
    ``percentile`` — a sparse tail can put that one rank lower across an
    arbitrarily wide value gap.)  Merge exactness (day from hourly bins
    == day binned directly) is covered by the oracle gate."""
    import math

    from mapbox_filter_spark.operators.temporal import histogram_rollup

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    lo, hi, n_bins = 0.0, 600.0, 120
    width = (hi - lo) / n_bins
    r = histogram_rollup(ev, value="value", group=["event_type"],
                         grains_s=[86400], lo=lo, hi=hi, n_bins=n_bins,
                         quantiles=[0.5, 0.9])
    vals = (ev.withColumn(
        "bucket_start",
        F.timestamp_micros(
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                     / F.lit(86400_000_000)).cast("long")
             * F.lit(86400_000_000))))
        .groupBy("bucket_start", "event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vs")))
    j = r.join(vals, ["bucket_start", "event_type"]).collect()
    assert j
    for row in j:
        vs = row["vs"]
        v_rank = vs[math.ceil(row["q"] * len(vs)) - 1]
        assert abs(row["est"] - v_rank) <= width + 1e-9, \
            (row["q"], row["est"], v_rank)


def test_histogram_rollup_validations(spark, tdata):
    from mapbox_filter_spark.operators.temporal import histogram_rollup

    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    with pytest.raises(ValueError, match="n_bins"):
        histogram_rollup(ev, value="l_v", group=[], grains_s=[3600],
                         lo=0, hi=0, n_bins=10, quantiles=[0.5])
    with pytest.raises(ValueError, match="quantiles"):
        histogram_rollup(ev, value="l_v", group=[], grains_s=[3600],
                         lo=0, hi=1, n_bins=10, quantiles=[1.5])


def test_distinct_rollup_single_raw_scan_and_hll_error(spark):
    """Pair-set partial: one raw scan for both grains; the HLL sketch
    path (hll_sketch_agg/hll_union_agg) estimates within 5% of exact on
    the same data — the documented swap at extreme cardinalities."""
    from mapbox_filter_spark.operators.temporal import distinct_rollup

    path = "/tmp/mfs_distinct_fixture"
    spark.read.parquet("/root/testdata/sf0.01/events.parquet") \
        .write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)
    r = distinct_rollup(ev, entity="user_id", group=["event_type"],
                        grains_s=[3600, 86400])
    p = r._jdf.queryExecution().executedPlan().toString()
    assert p.count("InMemoryTableScan") == 2, p  # both grains read pairs

    exact = {(row["event_type"]): row["n"] for row in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    hll = {(row["event_type"]): row["n"] for row in
           ev.groupBy("event_type")
           .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
                .alias("n")).collect()}
    for k, n in exact.items():
        assert abs(hll[k] - n) / n < 0.05, (k, hll[k], n)


def test_funnel_crafted_and_single_shuffle(spark):
    """Crafted chains: completion requires order (a click before the
    first view doesn't count), within_s nulls late steps, and the whole
    funnel is ONE shuffle."""
    from mapbox_filter_spark.operators.temporal import funnel

    t0 = pd.Timestamp("2024-01-01")

    def ev(uid, minutes, kind):
        return (uid, t0 + pd.Timedelta(minutes=minutes), kind)

    rows = [
        # u1: clean view(0) -> click(10) -> buy(20)
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "buy"),
        # u2: click BEFORE view -> funnel stalls at view
        ev(2, 0, "click"), ev(2, 5, "view"),
        # u3: view only
        ev(3, 0, "view"),
        # u4: view(0), click(10), buy(5): buy precedes click -> no buy
        ev(4, 0, "view"), ev(4, 10, "click"), ev(4, 5, "buy"),
        # u5: two views; click sits between them (counts from view #1)
        ev(5, 0, "view"), ev(5, 3, "click"), ev(5, 6, "view"),
        ev(5, 9, "buy"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "kind"]))
    out = {r["user_id"]: r for r in
           funnel(df, ["user_id"], step_col="kind",
                  steps=["view", "click", "buy"]).collect()}
    assert out[1]["completed"] and out[1]["step2_us"] > out[1]["step1_us"]
    assert out[2]["step1_us"] is None          # click was too early
    assert out[3]["step1_us"] is None
    assert out[4]["step2_us"] is None          # buy preceded click
    assert out[5]["completed"]

    # within 5 minutes: u1's click lands at +10 -> nulled
    tight = {r["user_id"]: r for r in
             funnel(df, ["user_id"], step_col="kind",
                    steps=["view", "click", "buy"],
                    within_s=300).collect()}
    assert tight[1]["step1_us"] is None and not tight[1]["completed"]
    assert not tight[5]["completed"]           # u5 spans 9 min > 5 min cap
    assert tight[5]["step1_us"] is not None    # click at +3 min still fits
    p = funnel(df, ["user_id"], step_col="kind",
               steps=["view", "click", "buy"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p


def test_funnel_validations(spark, tdata):
    from mapbox_filter_spark.operators.temporal import funnel

    lpd, _ = tdata
    ev = spark.createDataFrame(lpd)
    with pytest.raises(ValueError, match="2 steps"):
        funnel(ev, ["key"], step_col="l_id", steps=["a"])


def test_gapfill_locf_crafted(spark):
    from mapbox_filter_spark.operators.temporal import gapfill_locf

    tick = 10_000_000  # 10 s grid
    # key a: obs in ticks 0 and 3 -> grid 0..3, ticks 1-2 carry v=1
    rows = [("a", 1, 2_000_000, 1), ("a", 2, 31_000_000, 4),
            ("b", 3, 5_000_000, 9)]
    df = spark.createDataFrame(
        rows, "g string, id long, ts_us long, v long")
    out = gapfill_locf(df, on=["g"], tick_us=tick, tiebreak="id")
    got = {(r["g"], r["tick"]): (r["v_r"], r["id_r"])
           for r in out.collect()}
    assert got == {
        ("a", 0): (1, 1), ("a", 1): (1, 1), ("a", 2): (1, 1),
        ("a", 3): (4, 2), ("b", 0): (9, 3)}


def test_gapfill_locf_tick_boundary_inclusive(spark):
    from mapbox_filter_spark.operators.temporal import gapfill_locf

    tick = 1_000_000
    # obs exactly at a tick END (ts = 2*tick - 1) belongs to tick 1
    rows = [("k", 1, 0, 10), ("k", 2, 2 * tick - 1, 20)]
    df = spark.createDataFrame(
        rows, "g string, id long, ts_us long, v long")
    got = {r["tick"]: r["v_r"] for r in gapfill_locf(
        df, on=["g"], tick_us=tick, tiebreak="id").collect()}
    assert got == {0: 10, 1: 20}


def test_rolling_range_sum_crafted(spark):
    from mapbox_filter_spark.operators.temporal import rolling_range_sum

    # window 10; equal-ts rows are PEERS (both included for both)
    rows = [("k", 1, 0, 5), ("k", 2, 8, 7), ("k", 3, 8, 11),
            ("k", 4, 19, 2), ("k", 5, 40, 1)]
    df = spark.createDataFrame(rows, "g string, id long, t long, v long")
    out = {r["id"]: (r["roll_sum"], r["roll_cnt"])
           for r in rolling_range_sum(df, ["g"], "t", "v", 10).collect()}
    assert out == {1: (5, 1), 2: (23, 3), 3: (23, 3),
                   4: (2, 1), 5: (1, 1)}


def test_rolling_range_sum_validation(spark):
    from mapbox_filter_spark.operators.temporal import rolling_range_sum

    df = spark.createDataFrame([("k", 1, 0, 5)],
                               "g string, id long, t long, v long")
    with pytest.raises(ValueError, match="window_us"):
        rolling_range_sum(df, ["g"], "t", "v", -1)


def test_interval_coverage_crafted(spark):
    from mapbox_filter_spark.operators.temporal import interval_coverage

    rows = [
        # k: [0,10] [5,20] overlap -> [0,20]; [25,30] separate;
        #    [30,35] ADJACENT to [25,30] (start == prev end -> merged,
        #    closed-interval convention: start > max_end breaks)
        ("k", 0, 10), ("k", 5, 20), ("k", 25, 30), ("k", 30, 35),
        # solo: single interval, and one fully CONTAINED interval
        ("solo", 100, 200), ("solo", 120, 150),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    out = {r["g"]: (r["covered"], r["n_islands"])
           for r in interval_coverage(df, ["g"], "s", "e").collect()}
    assert out == {"k": (20 + 10, 2), "solo": (100, 1)}


def test_interval_coverage_partitioning_independent(spark):
    import random

    from mapbox_filter_spark.operators.temporal import interval_coverage

    rng = random.Random(33)
    rows = []
    for g in range(8):
        for _ in range(60):
            s = rng.randrange(0, 5000)
            rows.append((g, s, s + rng.randrange(1, 400)))
    df = spark.createDataFrame(rows, "g long, s long, e long")
    a = sorted(map(tuple, interval_coverage(
        df.repartition(1), ["g"], "s", "e").collect()))
    b = sorted(map(tuple, interval_coverage(
        df.repartition(13), ["g"], "s", "e").collect()))
    assert a == b
    # differential: per-group brute union
    by_g = {}
    for g, s, e in rows:
        by_g.setdefault(g, []).append((s, e))
    for g, cov, n in a:
        ivs = sorted(by_g[g])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        assert (cov, n) == (sum(e - s for s, e in merged), len(merged))
