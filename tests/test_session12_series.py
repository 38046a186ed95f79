"""Session-12 series operators (operators/temporal.py allen_pairs /
ltob_downsample): brute-force python replays over planted interval
topologies and sawtooth series, plus guard cases."""

import random

import pytest

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.temporal import (
    allen_pairs, ltob_downsample)


def _brute_allen(ivs):
    """ivs: [(key, id, s, e)] -> {(key, id_a, id_b): relation} for
    canonically ordered touching pairs."""
    out = {}
    for ka, ia, sa, ea in ivs:
        for kb, ib, sb, eb in ivs:
            if ka != kb or (sa, ea, ia) >= (sb, eb, ib) or sb > ea:
                continue
            if sa == sb and ea == eb:
                rel = "equals"
            elif sa == sb:
                rel = "starts"
            elif ea == sb:
                rel = "meets"
            elif ea < eb:
                rel = "overlaps"
            elif ea == eb:
                rel = "finished_by"
            else:
                rel = "contains"
            out[(ka, ia, ib)] = rel
    return out


def _run_allen(spark, ivs, bucket_s):
    df = spark.createDataFrame(
        list(ivs), "k long, id long, s long, e long")
    got = allen_pairs(df, ["k"], id_col="id", start="s", end="e",
                      bucket_s=bucket_s).collect()
    return {(r.k, r.id_a, r.id_b): r.relation for r in got}


def test_allen_handcrafted_all_relations(spark):
    M = 1_000_000
    ivs = [
        (1, 1, 0 * M, 10 * M),     # base
        (1, 2, 0 * M, 10 * M),     # equals 1
        (1, 3, 0 * M, 20 * M),     # 1 starts 3
        (1, 4, 10 * M, 15 * M),    # 1 meets 4
        (1, 5, 5 * M, 30 * M),     # 1 overlaps 5
        (1, 6, 2 * M, 10 * M),     # 6 finishes 1 -> (1,6) finished_by
        (1, 7, 3 * M, 8 * M),      # 7 during 1 -> contains
        (1, 8, 50 * M, 60 * M),    # before: excluded
        (2, 9, 0 * M, 10 * M),     # other key: no cross-key pairs
    ]
    exp = _brute_allen(ivs)
    got = _run_allen(spark, ivs, bucket_s=7)
    assert got == exp
    rels = {(a, b): r for (_, a, b), r in got.items()}
    assert rels[(1, 2)] == "equals"
    assert rels[(1, 3)] == "starts"
    assert rels[(1, 4)] == "meets"
    assert rels[(1, 5)] == "overlaps"
    assert rels[(1, 6)] == "finished_by"
    assert rels[(1, 7)] == "contains"
    assert (1, 8) not in rels and (8, 1) not in rels
    assert not any(k == 2 and (a == 9 or b == 9)
                   for (k, a, b) in got if k == 1)


def test_allen_random_differential(spark):
    rng = random.Random(12)
    ivs = []
    for i in range(250):
        s = rng.randrange(0, 4_000) * 1_000_000
        ln = rng.randrange(0, 800) * 1_000_000      # zero-length too
        ivs.append((rng.randrange(3), i, s, s + ln))
    for bucket_s in (13, 100, 5000):    # tiny / mid / giant buckets
        assert _run_allen(spark, ivs, bucket_s) == _brute_allen(ivs)


def test_allen_end_before_start_raises(spark):
    df = spark.createDataFrame([(1, 1, 100, 50)],
                               "k long, id long, s long, e long")
    with pytest.raises(Exception) as exc:
        allen_pairs(df, ["k"], id_col="id", start="s", end="e",
                    bucket_s=10).collect()
    assert "end < start" in str(exc.value)


def _brute_ltob(pts, bucket):
    """pts: [(key, ts, v, tb)] sorted per key by (ts, tb); returns the
    selected (key, ts) set."""
    from collections import defaultdict
    bykey = defaultdict(list)
    for k, t, v, tb in pts:
        bykey[k].append((t, tb, v))
    sel = set()
    for k, rows in bykey.items():
        rows.sort()
        aug = []
        for i, (t, tb, v) in enumerate(rows):
            if i == 0 or i == len(rows) - 1:
                aug.append((t, tb, None, True))
            else:
                tp, _, vp = rows[i - 1]
                tn, _, vn = rows[i + 1]
                a2 = abs((tp - tn) * (v - vp) - (tp - t) * (vn - vp))
                aug.append((t, tb, a2, False))
        for (t, tb, a2, ep) in aug:
            if ep:
                sel.add((k, t))
        from collections import defaultdict as dd
        bybkt = dd(list)
        for (t, tb, a2, ep) in aug:
            bybkt[t // bucket].append((t, tb, a2, ep))
        for b, rows2 in bybkt.items():
            best = sorted(
                rows2,
                key=lambda r: (-(r[2] if r[2] is not None else -1),
                               r[0], r[1]))
            # NULLS LAST on area2, then ts, tiebreak
            nn = [r for r in rows2 if r[2] is not None]
            pick = (sorted(nn, key=lambda r: (-r[2], r[0], r[1]))[0]
                    if nn else sorted(rows2, key=lambda r: (r[0], r[1]))[0])
            sel.add((k, pick[0]))
    return sel


def test_ltob_differential(spark):
    rng = random.Random(5)
    pts = []
    for k in range(4):
        for i in range(120):
            pts.append((k, rng.randrange(0, 100_000),
                        rng.randrange(0, 5_000), i))
    df = spark.createDataFrame(
        pts, "k long, ts_us long, v long, tb long")
    out = ltob_downsample(df, ["k"], ts="ts_us", val="v",
                          bucket_us=10_000, tiebreak="tb")
    got = {(r.k, r.ts_us) for r in out.collect()}
    assert got == _brute_ltob(pts, 10_000)


def test_ltob_keeps_spike(spark):
    # flat series with one spike: the spike's bucket must pick it
    pts = [(1, t * 100, 10 if t != 57 else 900, t) for t in range(100)]
    df = spark.createDataFrame(
        pts, "k long, ts_us long, v long, tb long")
    out = ltob_downsample(df, ["k"], ts="ts_us", val="v",
                          bucket_us=1_000, tiebreak="tb")
    sel = {r.ts_us for r in out.collect()}
    assert 5700 in sel                       # the spike survives
    assert 0 in sel and 9900 in sel          # endpoints survive
    # one pick per bucket (plus nothing extra in the spike's bucket)
    assert sum(1 for t in sel if 5000 <= t < 6000) == 1


def test_ltob_overflow_guard(spark):
    pts = [(1, 0, 0, 0), (1, 1 << 62, 5, 1), (1, (1 << 62) + 7, 9, 2)]
    df = spark.createDataFrame(
        pts, "k long, ts_us long, v long, tb long")
    with pytest.raises(Exception) as exc:
        ltob_downsample(df, ["k"], ts="ts_us", val="v",
                        bucket_us=1_000, tiebreak="tb").collect()
    assert "exceeds 2^61" in str(exc.value)
