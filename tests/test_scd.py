"""SCD2 upsert tests (operators/scd.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.scd import scd2_asof, scd2_upsert

T0 = pd.Timestamp("2024-01-01")


def _upd(rows):
    return pd.DataFrame(rows, columns=["k", "tier", "ts", "uid"]).astype(
        {"k": "int64", "uid": "int64"})


def _collect(dim):
    return sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"],
         r["is_current"]) for r in dim.collect())


def test_scd2_build_and_noop_suppression(spark):
    upd = spark.createDataFrame(_upd([
        (1, "bronze", T0, 0),
        (1, "bronze", T0 + pd.Timedelta(days=1), 1),   # no-op
        (1, "gold", T0 + pd.Timedelta(days=2), 2),
        (2, "silver", T0, 3),
    ]))
    dim = scd2_upsert(None, upd, key=["k"], attrs=["tier"], ts="ts",
                      tiebreak="uid")
    rows = _collect(dim)
    assert len(rows) == 3  # bronze->gold for k=1, one row for k=2
    k1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in k1] == ["bronze", "gold"]
    assert k1[0][3] == k1[1][2]          # half-open handoff
    assert not k1[0][4] and k1[1][4]     # is_current flags


def test_scd2_incremental_equals_oneshot(spark):
    b1 = _upd([(1, "bronze", T0, 0),
               (1, "silver", T0 + pd.Timedelta(days=3), 1),
               (2, "gold", T0, 2)])
    b2 = _upd([(1, "gold", T0 + pd.Timedelta(days=5), 3),
               (2, "gold", T0 + pd.Timedelta(days=6), 4),   # no-op
               (3, "bronze", T0 + pd.Timedelta(days=6), 5)])
    d1 = scd2_upsert(None, spark.createDataFrame(b1), key=["k"],
                     attrs=["tier"], ts="ts", tiebreak="uid")
    incr = scd2_upsert(d1, spark.createDataFrame(b2), key=["k"],
                       attrs=["tier"], ts="ts", tiebreak="uid")
    oneshot = scd2_upsert(None,
                          spark.createDataFrame(pd.concat([b1, b2])),
                          key=["k"], attrs=["tier"], ts="ts",
                          tiebreak="uid")
    assert _collect(incr) == _collect(oneshot)
    # closed history rows pass through byte-identical (the k=1 bronze
    # row closed by batch 1 appears unchanged after batch 2)
    closed_before = [r for r in _collect(d1) if not r[4]]
    after = _collect(incr)
    for r in closed_before:
        assert r in after


def test_scd2_asof_snapshot(spark):
    upd = spark.createDataFrame(_upd([
        (1, "bronze", T0, 0),
        (1, "gold", T0 + pd.Timedelta(days=2), 1),
    ]))
    dim = scd2_upsert(None, upd, key=["k"], attrs=["tier"], ts="ts",
                      tiebreak="uid")
    snap = scd2_asof(dim, T0 + pd.Timedelta(days=1))
    assert [(r["k"], r["tier"]) for r in snap.collect()] == [(1, "bronze")]
    later = scd2_asof(dim, T0 + pd.Timedelta(days=30))
    assert [(r["k"], r["tier"]) for r in later.collect()] == [(1, "gold")]


def test_scd2_single_shuffle(spark):
    upd = spark.createDataFrame(_upd([(1, "a", T0, 0), (1, "b", T0, 1)]))
    dim = scd2_upsert(None, upd, key=["k"], attrs=["tier"], ts="ts",
                      tiebreak="uid")
    p = dim._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p


def test_scd2_same_ts_tiebreak_last_wins(spark):
    upd = spark.createDataFrame(_upd([(1, "a", T0, 0), (1, "b", T0, 1)]))
    dim = scd2_upsert(None, upd, key=["k"], attrs=["tier"], ts="ts",
                      tiebreak="uid")
    rows = _collect(dim)
    cur = [r for r in rows if r[4]]
    assert len(cur) == 1 and cur[0][1] == "b"


def test_scd2_null_attribute_changes(spark):
    """Changes to/from NULL attributes are real versions (plain struct
    != yields NULL and silently drops them — null-safe compare used)."""
    upd = spark.createDataFrame(
        pd.DataFrame({
            "k": pd.array([1, 1, 1, 1], dtype="int64"),
            "tier": ["bronze", None, None, "gold"],
            "ts": [T0 + pd.Timedelta(days=i) for i in range(4)],
            "uid": pd.array([0, 1, 2, 3], dtype="int64")}))
    dim = scd2_upsert(None, upd, key=["k"], attrs=["tier"], ts="ts",
                      tiebreak="uid")
    rows = sorted(((r["valid_from"], r["tier"], r["is_current"])
                   for r in dim.collect()), key=lambda r: r[0])
    # bronze -> NULL -> gold: the repeated NULL is suppressed
    assert [r[1] for r in rows] == ["bronze", None, "gold"]
    assert rows[-1][2] and not rows[0][2]
