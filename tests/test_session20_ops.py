"""Session-20 operator blocks: unit differentials + edge pins.

Each operator's oracle gate lives in tests/test_oracle.py via the
queries()/oracle_sql() registry; these tests are the independent brute
python replays and hand-pinned edge cases.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


# ---- dp_histogram (deterministic discrete-Laplace release) ----

def _brute_dlap_z(cell_key, salt, epsilon, z_max):
    u = int(hashlib.md5(
        (salt + "\x1f" + cell_key).encode()).hexdigest()[:15], 16)
    a = math.exp(-epsilon)
    z = -z_max
    for k in range(-z_max, z_max):
        if k < 0:
            f = a ** (-k) / (1.0 + a)
        else:
            f = 1.0 - a ** (k + 1) / (1.0 + a)
        if u >= int(f * float(1 << 60)):
            z += 1
    return z


def test_dp_histogram_differential(spark):
    from mapbox_filter_spark.operators.privacy import dp_histogram

    rng = random.Random(11)
    rows = [(f"c{rng.randrange(12):02d}",) for _ in range(400)]
    df = spark.createDataFrame(rows, "cell string")
    got = {r["cell"]: r["n_noisy"]
           for r in dp_histogram(df, ["cell"], epsilon=0.5,
                                 salt="t", z_max=16).collect()}
    from collections import Counter

    cnt = Counter(c for c, in rows)
    want = {c: max(n + _brute_dlap_z(c, "t", 0.5, 16), 0)
            for c, n in cnt.items()}
    assert got == want


def test_dp_histogram_noise_spread(spark):
    """Across many cells the deterministic draws must behave like the
    DL distribution: both signs present, clamp respected, zero modal."""
    from mapbox_filter_spark.operators.privacy import dp_histogram

    # every cell has exactly 100 members -> noise = n_noisy - 100
    rows = [(f"cell{i:04d}",) for i in range(500) for _ in range(100)]
    df = spark.createDataFrame(rows, "cell string")
    out = dp_histogram(df, ["cell"], epsilon=0.5, salt="spread",
                       z_max=16).collect()
    noise = sorted(r["n_noisy"] - 100 for r in out)
    assert min(noise) >= -16 and max(noise) <= 16
    assert min(noise) < 0 < max(noise)
    from collections import Counter

    modal = Counter(noise).most_common(1)[0][0]
    assert abs(modal) <= 1


def test_dp_histogram_validation(spark):
    from mapbox_filter_spark.operators.privacy import dp_histogram

    df = spark.createDataFrame([("a",)], "cell string")
    with pytest.raises(ValueError):
        dp_histogram(df, ["cell"], epsilon=0.0, salt="s")
    with pytest.raises(ValueError):
        dp_histogram(df, ["cell"], epsilon=1.0, salt="s", z_max=0)


# ---- nn_tour (greedy NN route sequencing) ----

def _brute_nn_tour(stops):
    """stops: list of (id, x, y) for ONE group."""
    import math

    pts = sorted(stops)
    tour = [0]
    while len(tour) < len(pts):
        last = pts[tour[-1]]
        best = None
        for j in range(len(pts)):
            if j in tour:
                continue
            d2 = (last[1] - pts[j][1]) ** 2 + (last[2] - pts[j][2]) ** 2
            if best is None or d2 < best[0]:
                best = (d2, j)
        tour.append(best[1])
    ids = [pts[j][0] for j in tour]
    length = sum(
        int(math.floor(math.sqrt((pts[a][1] - pts[b][1]) ** 2
                                 + (pts[a][2] - pts[b][2]) ** 2) * 1e6))
        for a, b in zip(tour, tour[1:]))
    return ids, length


def test_nn_tour_differential(spark):
    from mapbox_filter_spark.operators.routing import nn_tour

    rng = random.Random(29)
    rows = []
    groups = {}
    for v in range(8):
        n = rng.randrange(1, 15)
        stops = [(i, rng.randrange(10 ** 6), rng.randrange(10 ** 6))
                 for i in range(n)]
        groups[v] = stops
        rows += [(v, i, x, y) for i, x, y in stops]
    df = spark.createDataFrame(rows, "v long, stop_id long, x long, y long")
    got = {r["v"]: (list(r["tour"]), r["tour_len_micro"], r["n_stops"])
           for r in nn_tour(df, ["v"]).collect()}
    for v, stops in groups.items():
        ids, length = _brute_nn_tour(stops)
        assert got[v] == (ids, length, len(stops)), v


def test_nn_tour_tie_breaks_to_lowest_id(spark):
    from mapbox_filter_spark.operators.routing import nn_tour

    # stops 5 and 9 equidistant from start 1 -> 5 visited first
    rows = [(0, 1, 0, 0), (0, 9, 10, 0), (0, 5, -10, 0)]
    df = spark.createDataFrame(rows, "v long, stop_id long, x long, y long")
    r = nn_tour(df, ["v"]).collect()[0]
    assert list(r["tour"]) == [1, 5, 9]
    assert r["tour_len_micro"] == 10_000_000 + 20_000_000


def test_nn_tour_max_stops_guard(spark):
    from pyspark.errors import SparkRuntimeException

    from mapbox_filter_spark.operators.routing import nn_tour

    rows = [(0, i, i, 0) for i in range(5)]
    df = spark.createDataFrame(rows, "v long, stop_id long, x long, y long")
    with pytest.raises(SparkRuntimeException, match="max_stops"):
        nn_tour(df, ["v"], max_stops=4).collect()
    with pytest.raises(ValueError):
        nn_tour(df, ["v"], max_stops=0)


# ---- two_opt (best-improvement segment reversal) ----

def _brute_2opt(stops, rounds):
    import math

    pts = sorted(stops)
    n = len(pts)

    def qd(a, b):
        return int(math.floor(math.sqrt(
            (pts[a][1] - pts[b][1]) ** 2
            + (pts[a][2] - pts[b][2]) ** 2) * 1e6))

    tour = [0]
    while len(tour) < n:
        last = tour[-1]
        best = None
        for j in range(n):
            if j in tour:
                continue
            d2 = ((pts[last][1] - pts[j][1]) ** 2
                  + (pts[last][2] - pts[j][2]) ** 2)
            if best is None or d2 < best[0]:
                best = (d2, j)
        tour.append(best[1])
    nn_len = sum(qd(a, b) for a, b in zip(tour, tour[1:]))
    if n > 2:
        for _ in range(rounds):
            best = None
            for i in range(1, n):
                for j in range(i + 1, n):
                    d = qd(tour[i - 1], tour[j]) - qd(tour[i - 1], tour[i])
                    if j < n - 1:
                        d += qd(tour[i], tour[j + 1]) - qd(tour[j],
                                                          tour[j + 1])
                    if best is None or d < best[0]:
                        best = (d, i, j)
            if best and best[0] < 0:
                _, i, j = best
                tour = tour[:i] + tour[i:j + 1][::-1] + tour[j + 1:]
    ids = [pts[j][0] for j in tour]
    length = sum(qd(a, b) for a, b in zip(tour, tour[1:]))
    return ids, nn_len, length


def test_two_opt_differential(spark):
    from mapbox_filter_spark.operators.routing import two_opt

    rng = random.Random(59)
    rows = []
    groups = {}
    for v in range(10):
        n = rng.randrange(1, 16)
        stops = [(i, rng.randrange(10 ** 6), rng.randrange(10 ** 6))
                 for i in range(n)]
        groups[v] = stops
        rows += [(v, i, x, y) for i, x, y in stops]
    df = spark.createDataFrame(rows, "v long, stop_id long, x long, y long")
    got = {r["v"]: (list(r["tour"]), r["nn_len_micro"],
                    r["tour_len_micro"])
           for r in two_opt(df, ["v"], rounds=6).collect()}
    improved = 0
    for v, stops in groups.items():
        want = _brute_2opt(stops, 6)
        assert got[v] == want, v
        assert got[v][2] <= got[v][1]
        improved += got[v][2] < got[v][1]
    assert improved >= 1  # the NN construction is not already optimal


def test_two_opt_uncrosses(spark):
    from mapbox_filter_spark.operators.routing import two_opt

    # NN from 0: 0 -> 1 (d=10) -> 2 (far) -> 3 creates a zigzag;
    # one reversal yields the monotone path 0,1,2,3 ordered by x
    rows = [(0, 0, 0, 0), (0, 1, 10, 0), (0, 2, 100, 0), (0, 3, 55, 1)]
    df = spark.createDataFrame(rows, "v long, stop_id long, x long, y long")
    r = two_opt(df, ["v"], rounds=4).collect()[0]
    assert r["tour_len_micro"] <= r["nn_len_micro"]
    # improved tour ends are 0 and 2 (the x-extremes)
    assert {list(r["tour"])[0], list(r["tour"])[-1]} == {0, 2}
    from mapbox_filter_spark.operators.routing import two_opt as _t
    with pytest.raises(ValueError):
        _t(df, ["v"], rounds=0)


# ---- louvain_move (synchronized modularity local move) ----

def _brute_louvain_move(edges, labels):
    """edges: undirected canonical pairs; labels: {node: label}."""
    from collections import defaultdict

    sym = defaultdict(set)
    for u, v in edges:
        sym[u].add(v)
        sym[v].add(u)
    m = len(edges)
    deg = {n: len(vs) for n, vs in sym.items()}
    dtot = defaultdict(int)
    for n, lbl in labels.items():
        dtot[lbl] += deg.get(n, 0)
    out = {}
    for i, a in labels.items():
        kic = defaultdict(int)
        for v in sym.get(i, ()):
            kic[labels[v]] += 1
        kia = kic.get(a, 0)
        best = None
        for b_lbl, kib in kic.items():
            if b_lbl == a:
                continue
            g = (2 * m * (kib - kia)
                 - deg[i] * (dtot[b_lbl] - dtot[a] + deg[i]))
            key = (-g, b_lbl)
            if best is None or key < best[0]:
                best = (key, b_lbl, g)
        if best is None:
            out[i] = (a, a, False, None)
        else:
            _, b_lbl, g = best
            out[i] = (a, b_lbl if g > 0 else a, g > 0, g)
    return out


def test_louvain_move_differential(spark):
    from mapbox_filter_spark.operators.graph import louvain_move

    rng = random.Random(97)
    n = 40
    edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                    for _ in range(90)})
    # two planted communities with noise
    labels = {i: (100 if i < n // 2 else 200) for i in range(n)}
    for i in rng.sample(range(n), 6):
        labels[i] = 300
    edf = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame(list(labels.items()),
                                "node long, label long")
    got = {r["node"]: (r["old_label"], r["new_label"], r["moved"],
                       r["gain_num"])
           for r in louvain_move(edf, ldf).collect()}
    want = _brute_louvain_move(edges, labels)
    assert got == want


def test_louvain_move_singleton_closed_form(spark):
    from mapbox_filter_spark.operators.graph import louvain_move

    # star: center 0 with leaves 1..4; singleton partition.
    # leaf i -> center: gain = 2m - k_i*d_0 = 8 - 1*4 = 4 > 0 (moves);
    # center -> any leaf: gain = 2m - 4*1 = 4 > 0, tie -> label 1.
    edges = [(0, i) for i in range(1, 5)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame([(i, i) for i in range(5)],
                                "node long, label long")
    got = {r["node"]: (r["new_label"], r["moved"], r["gain_num"])
           for r in louvain_move(edf, ldf).collect()}
    assert got[0] == (1, True, 4)
    for leaf in range(1, 5):
        assert got[leaf] == (0, True, 4)


def test_louvain_move_isolated_node(spark):
    from mapbox_filter_spark.operators.graph import louvain_move

    edf = spark.createDataFrame([(0, 1)], "src long, dst long")
    ldf = spark.createDataFrame([(0, 7), (1, 7), (9, 9)],
                                "node long, label long")
    got = {r["node"]: (r["new_label"], r["moved"], r["gain_num"])
           for r in louvain_move(edf, ldf).collect()}
    # 0 and 1 share a community: no candidate, no move
    assert got[0] == (7, False, None)
    assert got[1] == (7, False, None)
    assert got[9] == (9, False, None)


# ---- series_motif (exact raw-distance global motif) ----

def _brute_motif(series, w):
    """series: [(t, v)] for ONE group, t integer grid."""
    series = sorted(series)
    tv = dict(series)
    wins = []
    for t, _ in series:
        vals = [tv.get(t + k) for k in range(w)]
        if all(v is not None for v in vals):
            wins.append((t, vals))
    best = None
    for i, (ta, va) in enumerate(wins):
        for tb, vb in wins:
            if tb < ta + w:
                continue
            d2 = sum((x - y) ** 2 for x, y in zip(va, vb))
            key = (d2, ta, tb)
            if best is None or key < best:
                best = key
    return len(wins), best


def test_series_motif_differential(spark):
    from mapbox_filter_spark.operators.temporal import series_motif

    rng = random.Random(13)
    rows = []
    groups = {}
    for g in range(5):
        n = rng.randrange(8, 40)
        t = 0
        series = []
        for _ in range(n):
            t += rng.choice([1, 1, 1, 1, 3])  # occasional gaps
            series.append((t, rng.randrange(50)))
        groups[g] = series
        rows += [(g, t, v) for t, v in series]
    df = spark.createDataFrame(rows, "g long, t long, v long")
    got = {r["g"]: (r["n_windows"], (r["d2"], r["t_a"], r["t_b"]))
           for r in series_motif(df, ["g"], w=4).collect()}
    for g, series in groups.items():
        nw, best = _brute_motif(series, 4)
        if best is None:
            assert g not in got
        else:
            assert got[g] == (nw, best), g


def test_series_motif_planted_pair(spark):
    from mapbox_filter_spark.operators.temporal import series_motif

    # identical pattern planted at t=0 and t=20 within noise
    pat = [5, 90, 5, 90]
    rows = []
    for t in range(30):
        if t < 4:
            v = pat[t]
        elif 20 <= t < 24:
            v = pat[t - 20]
        else:
            v = 40 + t
        rows.append((0, t, v))
    df = spark.createDataFrame(rows, "g long, t long, v long")
    r = series_motif(df, ["g"], w=4).collect()[0]
    assert (r["t_a"], r["t_b"], r["d2"]) == (0, 20, 0)


def test_series_motif_guard_and_validation(spark):
    from pyspark.errors import SparkRuntimeException

    from mapbox_filter_spark.operators.temporal import series_motif

    rows = [(0, t, t) for t in range(30)]
    df = spark.createDataFrame(rows, "g long, t long, v long")
    with pytest.raises(SparkRuntimeException, match="max_windows"):
        series_motif(df, ["g"], w=3, max_windows=10).collect()
    with pytest.raises(ValueError):
        series_motif(df, ["g"], w=1)


# ---- media_near_dup (byte-shingle minhash over binary payloads) ----

def test_media_byte_shingles_edges(spark):
    from mapbox_filter_spark.operators.media import media_byte_shingles

    df = spark.createDataFrame(
        [(1, bytes(range(16))), (2, b"abc"), (3, b"")],
        "id long, blob binary")
    got = {r["id"]: r["s"] for r in df.select(
        "id", media_byte_shingles(F.col("blob")).alias("s")).collect()}
    # 16 bytes, k=8, stride=4 -> starts at 0, 4, 8 -> 3 windows
    assert got[1] == ["0001020304050607", "0405060708090A0B",
                      "08090A0B0C0D0E0F"]
    assert got[2] == [] and got[3] == []


def test_media_near_dup_planted_clusters(spark):
    from mapbox_filter_spark.operators.media import media_near_dup

    # 3 clusters of 4: identical 76-byte body per cluster + 4-byte
    # per-doc tail (shingle Jaccard ~0.81 within, ~0 across)
    rng = random.Random(7)
    rows = []
    for c in range(3):
        body = bytes(rng.randrange(256) for _ in range(76))
        for d in range(4):
            tail = bytes(rng.randrange(256) for _ in range(4))
            rows.append((c * 10 + d, body + tail))
    df = spark.createDataFrame(rows, "id long, blob binary")
    pairs = {(r["id_a"], r["id_b"])
             for r in media_near_dup(df, hash_mode="md5").collect()}
    within = {(c * 10 + a, c * 10 + b)
              for c in range(3) for a in range(4) for b in range(4)
              if a < b}
    # LSH recall is probabilistic but near-1 at J~0.81; cross-cluster
    # pairs (J~0) must never appear, and the draw is deterministic
    assert pairs <= within
    assert len(pairs) >= int(0.8 * len(within))
    rerun = {(r["id_a"], r["id_b"])
             for r in media_near_dup(df, hash_mode="md5").collect()}
    assert rerun == pairs

    with pytest.raises(ValueError):
        media_near_dup(df, k=16, bands=5)


# ---- randomized_response (Warner local DP) ----

def test_rr_differential_and_accuracy(spark):
    from mapbox_filter_spark.operators.privacy import randomized_response

    # one big group with known true rate 1/5
    rows = [(i, "g", i % 5 == 0) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, cell string, s boolean")
    r = randomized_response(df, ["cell"], bit_col="s", id_col="id",
                            salt="t").collect()[0]
    assert r["n"] == 5000
    # brute replay of the deterministic coins
    yes = 0
    thr = (3 * (1 << 60)) // 4
    for i in range(5000):
        u = int(hashlib.md5(("t\x1f" + str(i)).encode())
                .hexdigest()[:15], 16)
        truth = i % 5 == 0
        yes += truth if u < thr else (not truth)
    assert r["n_yes"] == yes
    assert r["pi_hat"] == (4 * yes - 5000) / (2 * 5000)
    # debiased estimate lands near the true 0.2 (binomial noise ~0.008)
    assert abs(r["pi_hat"] - 0.2) < 0.03


def test_rr_validation(spark):
    from mapbox_filter_spark.operators.privacy import randomized_response

    df = spark.createDataFrame([(1, "g", True)],
                               "id long, cell string, s boolean")
    with pytest.raises(ValueError):
        randomized_response(df, ["cell"], bit_col="s", id_col="id",
                            salt="t", p_num=1, p_den=2)
    with pytest.raises(ValueError):
        randomized_response(df, ["cell"], bit_col="s", id_col="id",
                            salt="t", p_num=5, p_den=4)


# ---- convoy_pairs (sustained co-movement) ----

def test_convoy_pairs_hand_case(spark):
    import datetime

    from mapbox_filter_spark.operators.trajectory import convoy_pairs

    def t(day):
        return datetime.datetime(2026, 1, 1 + day)

    rows = []
    # users 1,2 share cell (0,0) on days 0,1,2 (run 3) and day 5
    for d in [0, 1, 2, 5]:
        rows.append((1, t(d), 10, 10))
        rows.append((2, t(d), 20, 20))
    # users 1,3 share cells on days 0 and 2 only (max run 1)
    rows.append((3, t(0), 30, 30))
    rows.append((3, t(2), 30, 30))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "x long, y long")
    got = {(r["user_a"], r["user_b"]): (r["n_buckets"], r["max_run"])
           for r in convoy_pairs(df, cell=100, bucket_s=86400,
                                 min_run=3).collect()}
    assert got == {(1, 2): (4, 3)}
    # lower bar surfaces the broken contact too
    got2 = {(r["user_a"], r["user_b"]): r["max_run"]
            for r in convoy_pairs(df, cell=100, bucket_s=86400,
                                  min_run=1).collect()}
    assert got2 == {(1, 2): 3, (1, 3): 1, (2, 3): 1}
    with pytest.raises(ValueError):
        convoy_pairs(df, cell=0, bucket_s=1)


def test_convoy_vs_colocation_distinction(spark):
    """A pair meeting every OTHER day has many co-visits but never a
    run: colocation_pairs reports it, convoy_pairs must not."""
    import datetime

    from mapbox_filter_spark.operators.trajectory import (
        colocation_pairs, convoy_pairs)

    rows = []
    for d in [0, 2, 4, 6, 8]:
        ts = datetime.datetime(2026, 1, 1 + d)
        rows.append((1, ts, 5, 5))
        rows.append((2, ts, 5, 5))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "x long, y long")
    co = colocation_pairs(df, cell=100, bucket_s=86400,
                          min_meetings=3).collect()
    assert [(r["user_a"], r["user_b"], r["n_meet"])
            for r in co] == [(1, 2, 5)]
    assert convoy_pairs(df, cell=100, bucket_s=86400,
                        min_run=2).collect() == []


# ---- str_pack (STR R-tree bulk-load) ----

def _brute_str(pts, cap):
    import math

    n = len(pts)
    p = math.ceil(n / cap)
    s = math.ceil(math.sqrt(p))
    per = math.ceil(p / s)

    def ntile(items, k):
        out = {}
        n_i = len(items)
        base, extra = divmod(n_i, k)
        pos = 0
        for b in range(1, k + 1):
            size = base + (1 if b <= extra else 0)
            for it in items[pos:pos + size]:
                out[it] = b
            pos += size
        return out

    order_x = sorted(pts, key=lambda t: (t[1], t[0]))
    strip_of = ntile(order_x, s)
    leaves = {}
    from collections import defaultdict

    strips = defaultdict(list)
    for pt, b in strip_of.items():
        strips[b].append(pt)
    for b, items in strips.items():
        items.sort(key=lambda t: (t[2], t[0]))
        for pt, lf in ntile(items, per).items():
            leaves.setdefault((b, lf), []).append(pt)
    out = {}
    for (b, lf), items in leaves.items():
        xs = [x for _, x, _ in items]
        ys = [y for _, _, y in items]
        out[(b, lf)] = (len(items), min(xs), max(xs), min(ys), max(ys))
    return out


def test_str_pack_differential(spark):
    from mapbox_filter_spark.operators.zonemap import str_pack

    rng = random.Random(17)
    pts = [(i, rng.randrange(1000), rng.randrange(1000))
           for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r["strip"], r["leaf"]): (r["n_pts"], r["xmin"], r["xmax"],
                                     r["ymin"], r["ymax"])
           for r in str_pack(df, id_col="id", x_col="x", y_col="y",
                             leaf_cap=16).collect()}
    want = _brute_str(pts, 16)
    assert got == want
    # occupancy bounded by the cap at these dims
    assert max(v[0] for v in got.values()) <= 16
    with pytest.raises(ValueError):
        str_pack(df, id_col="id", x_col="x", y_col="y", leaf_cap=0)


# ---- viterbi_match (NK sequence decoding) ----

def _brute_cands(pings, segs, radius, k):
    out = {}
    for key, px, py in pings:
        cc = []
        for sid, ax, ay, bx, by in segs:
            l2 = (bx - ax) ** 2 + (by - ay) ** 2
            tnum = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            if l2 == 0 or tnum <= 0:
                e, qx, qy = (px - ax) ** 2 + (py - ay) ** 2, ax, ay
            elif tnum >= l2:
                e, qx, qy = (px - bx) ** 2 + (py - by) ** 2, bx, by
            else:
                cr = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                e = (cr * cr) // l2
                qx = (2 * (ax * l2 + tnum * (bx - ax)) + l2) // (2 * l2)
                qy = (2 * (ay * l2 + tnum * (by - ay)) + l2) // (2 * l2)
            if e <= radius * radius:
                cc.append((e, sid, qx, qy))
        cc.sort()
        out[key] = [(j, sid, e, qx, qy)
                    for j, (e, sid, qx, qy) in enumerate(cc[:k])]
    return out


def _brute_viterbi(pings_by_traj, segs, radius, k):
    res = {}
    for traj, seq in pings_by_traj.items():
        cands = _brute_cands(
            [((s,), x, y) for s, x, y in seq], segs, radius, k)
        if any(not cands[(s,)] for s, _, _ in seq):
            continue
        state = {}
        s0 = seq[0][0]
        for j, sid, e, qx, qy in cands[(s0,)]:
            state[j] = (e, str(sid), qx, qy)
        for s, _, _ in seq[1:]:
            new = {}
            for j, sid, e, qx, qy in cands[(s,)]:
                best = None
                for pj, (pc, pp, pqx, pqy) in state.items():
                    c = pc + (qx - pqx) ** 2 + (qy - pqy) ** 2 + e
                    p = pp + "," + str(sid)
                    if best is None or (c, p) < best:
                        best = (c, p)
                new[j] = (best[0], best[1], qx, qy)
            state = new
        res[traj] = min((c, p) for c, p, _, _ in state.values())
    return res


def test_viterbi_differential(spark):
    from mapbox_filter_spark.operators.trajectory import viterbi_match

    rng = random.Random(43)
    segs = [(i, rng.randrange(0, 3000), rng.randrange(0, 3000),
             rng.randrange(0, 3000), rng.randrange(0, 3000))
            for i in range(1, 25)]
    T = 5
    pings_by_traj = {}
    rows = []
    for v in range(6):
        seq = [(s, rng.randrange(0, 3000), rng.randrange(0, 3000))
               for s in range(T)]
        pings_by_traj[v] = seq
        rows += [(v, s, x, y) for s, x, y in seq]
    pdf = spark.createDataFrame(rows, "traj long, step long, "
                                      "x long, y long")
    sdf = spark.createDataFrame(segs, "seg_id long, x1 long, y1 long, "
                                      "x2 long, y2 long")
    got = {r["traj"]: (r["total_cost"], r["path"])
           for r in viterbi_match(pdf, sdf, 1000, 1024, steps=T,
                                  k=3).collect()}
    want = _brute_viterbi(pings_by_traj, segs, 1000, 3)
    assert got == want
    with pytest.raises(ValueError):
        viterbi_match(pdf, sdf, 1000, 1024, steps=1)


def test_viterbi_beats_pointwise_snapping(spark):
    """Two parallel roads, pings zigzagging between them: pointwise
    snap alternates roads; the decoder pays a slightly worse emission
    to stay on one road and avoid the jump cost."""
    from mapbox_filter_spark.geo.overlay import snap_to_segments
    from mapbox_filter_spark.operators.trajectory import viterbi_match

    segs = [(1, 0, 0, 4000, 0), (2, 0, 100, 4000, 100)]
    sdf = spark.createDataFrame(segs, "seg_id long, x1 long, y1 long, "
                                      "x2 long, y2 long")
    pings = [(0, s, 500 + 500 * s, 45 if s % 2 == 0 else 55)
             for s in range(6)]
    pdf = spark.createDataFrame(pings, "traj long, step long, "
                                       "x long, y long")
    r = viterbi_match(pdf, sdf, 500, 4096, steps=6, k=2).collect()[0]
    assert r["path"] in ("1,1,1,1,1,1", "2,2,2,2,2,2")
    snap = snap_to_segments(
        pdf.select(F.col("step").alias("point_id"), "x", "y"),
        sdf, 500, 4096)
    picked = {r["point_id"]: r["seg_id"] for r in snap.collect()}
    assert len(set(picked.values())) == 2  # pointwise flip-flops


def test_viterbi_incomplete_trajectory_dropped(spark):
    from mapbox_filter_spark.operators.trajectory import viterbi_match

    segs = [(1, 0, 0, 1000, 0)]
    sdf = spark.createDataFrame(segs, "seg_id long, x1 long, y1 long, "
                                      "x2 long, y2 long")
    # step 1 is 9000 away from the only road -> no candidate
    pings = [(0, 0, 100, 10), (0, 1, 100, 9000), (0, 2, 300, 10)]
    pdf = spark.createDataFrame(pings, "traj long, step long, "
                                       "x long, y long")
    assert viterbi_match(pdf, sdf, 500, 1024, steps=3).collect() == []


# ---- woe_iv (weight of evidence / information value) ----

def test_woe_iv_differential(spark):
    from mapbox_filter_spark.operators.ml import woe_iv

    rng = random.Random(71)
    rows = [(rng.randrange(5), rng.random() < 0.2 + 0.1 * (i % 3))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "bin long, bad boolean")
    got = {r["bin"]: (r["n"], r["n_good"], r["n_bad"], r["woe_micro"],
                      r["iv_part"])
           for r in woe_iv(df, "bin", "bad").collect()}
    from collections import Counter

    cnt = Counter()
    for b, bad in rows:
        cnt[(b, bad)] += 1
    G = sum(v for (b, bad), v in cnt.items() if not bad)
    B = sum(v for (b, bad), v in cnt.items() if bad)
    for b in set(b for b, _ in rows):
        g, bb = cnt.get((b, False), 0), cnt.get((b, True), 0)
        woe = int(math.floor(math.log((g * B) / (bb * G)) * 1e6 + 0.5))
        iv = ((g * B - bb * G) / (G * B)) * (woe / 1e6)
        assert got[b][0] == g + bb
        assert got[b][3] == woe
        assert got[b][4] == pytest.approx(iv, rel=1e-12)


def test_woe_iv_degenerate_bin(spark):
    from mapbox_filter_spark.operators.ml import woe_iv

    rows = [(0, False)] * 10 + [(0, True)] * 5 + [(1, False)] * 8
    df = spark.createDataFrame(rows, "bin long, bad boolean")
    got = {r["bin"]: (r["woe_micro"], r["iv_part"])
           for r in woe_iv(df, "bin", "bad").collect()}
    assert got[1] == (None, None)  # no bads in bin 1 -> excluded
    assert got[0][0] is not None


# ---- visvalingam (VW polyline simplification) ----

def _brute_vw(pts, thresh2, max_remove):
    """pts: [(o, x, y)] sorted by o."""
    k = list(range(len(pts)))
    removed = 0
    for _ in range(max_remove):
        if len(k) <= 2:
            break
        best = None
        for p in range(1, len(k) - 1):
            a, b, c = pts[k[p - 1]], pts[k[p]], pts[k[p + 1]]
            a2 = abs((b[1] - a[1]) * (c[2] - a[2])
                     - (b[2] - a[2]) * (c[1] - a[1]))
            if best is None or (a2, p) < best:
                best = (a2, p)
        if best[0] >= thresh2:
            break
        removed += best[0]
        del k[best[1]]
    kept = ",".join(str(pts[i][0]) for i in k)
    return len(pts), len(k), kept, removed


def test_visvalingam_differential(spark):
    from mapbox_filter_spark.geo.simplify import visvalingam

    rng = random.Random(23)
    rows = []
    groups = {}
    for g in range(8):
        n = rng.randrange(2, 20)
        pts = [(o, rng.randrange(200), rng.randrange(200))
               for o in range(n)]
        groups[g] = pts
        rows += [(g, o, x, y) for o, x, y in pts]
    df = spark.createDataFrame(rows, "g long, o long, x long, y long")
    got = {r["g"]: (r["n_in"], r["n_kept"], r["kept"],
                    r["removed_area2"])
           for r in visvalingam(df, ["g"], thresh2=3000,
                                max_remove=6, max_pts=24).collect()}
    for g, pts in groups.items():
        assert got[g] == _brute_vw(pts, 3000, 6), g


def test_visvalingam_collinear_first(spark):
    from mapbox_filter_spark.geo.simplify import visvalingam

    # vertex 1's near-flat kink (area2=10) goes first; vertex 3's
    # big area survives the threshold
    pts = [(0, 0, 0), (1, 10, 0), (2, 20, 1), (3, 30, 100),
           (4, 40, 0)]
    df = spark.createDataFrame([(0, o, x, y) for o, x, y in pts],
                               "g long, o long, x long, y long")
    r = visvalingam(df, ["g"], thresh2=100, max_remove=10,
                    max_pts=8).collect()[0]
    assert r["kept"] == "0,2,3,4" and r["removed_area2"] == 10
    # threshold below the smallest effective area: nothing removed
    r2 = visvalingam(df, ["g"], thresh2=1, max_remove=10,
                     max_pts=8).collect()[0]
    assert r2["kept"] == "0,1,2,3,4" and r2["removed_area2"] == 0
    with pytest.raises(ValueError):
        visvalingam(df, ["g"], thresh2=-1)


# ---- kleinberg_bursts (2-state burst decode) ----

def _brute_kleinberg(ts, scale=1_000_000):
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    n, T = len(gaps), sum(gaps)
    ln = [int(math.floor(math.log((2.0 ** i * n) / T) * scale + 0.5))
          for i in (0, 1)]
    tr = int(math.floor(math.log(float(n)) * 1.0 * scale + 0.5))

    def emit(s, x):
        return (n * x * (2 ** s) * scale) // T - ln[s]

    state = {s: (emit(s, gaps[0]) + (tr if s == 1 else 0), str(s))
             for s in (0, 1)}
    for x in gaps[1:]:
        new = {}
        for s in (0, 1):
            best = None
            for ps, (pc, pp) in state.items():
                c = pc + emit(s, x) + (tr if (ps == 0 and s == 1)
                                       else 0)
                p = pp + str(s)
                if best is None or (c, p) < best:
                    best = (c, p)
            new[s] = best
        state = new
    cost, path = min(state.values())
    return cost, path, path.count("1")


def test_kleinberg_differential(spark):
    from mapbox_filter_spark.operators.temporal import kleinberg_bursts

    rng = random.Random(31)
    rows = []
    series = {}
    for g in range(4):
        t, ts = 0, [0]
        for i in range(14):
            # planted burst: 6 very short gaps (gain ~0.65 nat each,
            # comfortably past the gamma*ln(n) entry cost)
            t += rng.randrange(1, 6) if 3 <= i < 9 \
                else rng.randrange(100, 300)
            ts.append(t)
        series[g] = ts
        rows += [(g, x) for x in ts]
    df = spark.createDataFrame(rows, "g long, t long")
    got = {r["g"]: (r["total_cost_micro"], r["states"], r["n_burst"])
           for r in kleinberg_bursts(df, ["g"], t_col="t",
                                     steps=14).collect()}
    for g, ts in series.items():
        assert got[g] == _brute_kleinberg(ts), g
        # the planted burst region decodes as state 1
        assert "111" in got[g][1]


def test_kleinberg_contract(spark):
    from mapbox_filter_spark.operators.temporal import kleinberg_bursts

    # wrong series length -> dropped; zero span -> dropped
    rows = [(0, t) for t in (0, 5, 9)] + [(1, 0), (1, 0), (1, 0)]
    df = spark.createDataFrame(rows, "g long, t long")
    out = kleinberg_bursts(df, ["g"], t_col="t", steps=2).collect()
    assert [r["g"] for r in out] == [0]
    with pytest.raises(ValueError):
        kleinberg_bursts(df, ["g"], t_col="t", steps=0)


# ---- kriging_ok (ordinary kriging, 3-NN linear variogram) ----

def _brute_krig(qpt, corpus, radius):
    import math

    qx, qy = qpt
    cand = sorted(
        ((qx - x) ** 2 + (qy - y) ** 2, cid, x, y, z)
        for cid, x, y, z in corpus
        if (qx - x) ** 2 + (qy - y) ** 2 <= radius * radius)[:3]
    if len(cand) < 3:
        return None
    if cand[0][0] == 0:
        return (None, float(cand[0][4]))
    g = lambda ax, ay, bx, by: int(math.floor(  # noqa: E731
        math.sqrt((ax - bx) ** 2 + (ay - by) ** 2)))
    d2s = [c[0] for c in cand]
    xs = [(c[2], c[3]) for c in cand]
    zs = [c[4] for c in cand]
    g12 = g(*xs[0], *xs[1])
    g13 = g(*xs[0], *xs[2])
    g23 = g(*xs[1], *xs[2])
    gq = [int(math.floor(math.sqrt(d))) for d in d2s]
    A = [[0, g12, g13, 1], [g12, 0, g23, 1], [g13, g23, 0, 1],
         [1, 1, 1, 0]]
    b = [gq[0], gq[1], gq[2], 1]

    def det4(M):
        from itertools import permutations

        def sign(p):
            s, seen = 1, set()
            for i in range(4):
                if i in seen:
                    continue
                j, ln = i, 0
                while j not in seen:
                    seen.add(j)
                    j = p[j]
                    ln += 1
                if ln % 2 == 0:
                    s = -s
            return s

        return sum(sign(p) * M[0][p[0]] * M[1][p[1]] * M[2][p[2]]
                   * M[3][p[3]] for p in permutations(range(4)))

    det = det4(A)
    if det == 0:
        return (det, None)
    lam = []
    for col in range(3):
        Ai = [[b[i] if j == col else A[i][j] for j in range(4)]
              for i in range(4)]
        lam.append(det4(Ai) / det)
    pred = (lam[0] * zs[0] + lam[1] * zs[1]) + lam[2] * zs[2]
    return (det, pred)


def test_kriging_differential(spark):
    from mapbox_filter_spark.operators.kriging import kriging_ok

    rng = random.Random(19)
    corpus = [(i, rng.randrange(2000), rng.randrange(2000),
               rng.randrange(100)) for i in range(120)]
    qs = [(i, rng.randrange(2000), rng.randrange(2000))
          for i in range(12)]
    cdf = spark.createDataFrame(corpus,
                                "point_id long, x long, y long, z long")
    qdf = spark.createDataFrame(qs, "query_id long, x long, y long")
    got = {r["query_id"]: (r["det"], r["pred"])
           for r in kriging_ok(qdf, cdf, 600).collect()}
    for qi, qx, qy in qs:
        want = _brute_krig((qx, qy), corpus, 600)
        if want is None:
            assert qi not in got
            continue
        assert got[qi][0] == want[0], qi
        if want[1] is None:
            assert got[qi][1] is None
        else:
            assert got[qi][1] == pytest.approx(want[1], rel=1e-12)


def test_kriging_properties(spark):
    from mapbox_filter_spark.operators.kriging import kriging_ok

    # constant field reproduced (weights sum to 1); exact hit returns
    # the sample; coincident neighbours -> singular -> NULL pred
    corpus = [(1, 0, 0, 7), (2, 100, 0, 7), (3, 0, 100, 7),
              (4, 500, 500, 9), (5, 600, 500, 3), (6, 500, 600, 4),
              (10, 900, 900, 1), (11, 900, 900, 2), (12, 900, 900, 3)]
    qs = [(0, 40, 40), (1, 500, 500), (2, 901, 900)]
    cdf = spark.createDataFrame(corpus,
                                "point_id long, x long, y long, z long")
    qdf = spark.createDataFrame(qs, "query_id long, x long, y long")
    got = {r["query_id"]: (r["det"], r["pred"])
           for r in kriging_ok(qdf, cdf, 400).collect()}
    assert got[0][1] == pytest.approx(7.0, abs=1e-9)   # constant field
    assert got[1] == (None, 9.0)                        # exact hit
    assert got[2][0] == 0 and got[2][1] is None         # singular


# ---- quantile_normalize (Bolstad pooled-quantile mapping) ----

def test_quantile_normalize_differential(spark):
    from mapbox_filter_spark.operators.stats import quantile_normalize

    rng = random.Random(37)
    rows = []
    for g in ("a", "b", "c"):
        for i in range(rng.randrange(20, 40)):
            rows.append((g, len(rows), rng.randrange(1000)))
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {(r["g"], r["id"]): r["v_norm"]
           for r in quantile_normalize(df, ["g"], "v", "id").collect()}
    pooled = sorted(v for _, _, v in rows)
    N = len(pooled)
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, i, v in rows:
        by_g[g].append((v, i))
    for g, items in by_g.items():
        items.sort()
        ng = len(items)
        for r, (v, i) in enumerate(items, start=1):
            pos = -((-r * N) // ng)  # ceil
            assert got[(g, i)] == pooled[pos - 1], (g, i)


def test_quantile_normalize_aligns_groups(spark):
    from mapbox_filter_spark.operators.stats import quantile_normalize

    # equal-size groups with very different scales end up with the
    # IDENTICAL normalized multiset (the defining property)
    rows = [("lo", i, i) for i in range(50)] + \
           [("hi", 100 + i, 1000 + 7 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_normalize(df, ["g"], "v", "id").collect()
    from collections import defaultdict

    norm = defaultdict(list)
    for r in out:
        norm[r["g"]].append(r["v_norm"])
    assert sorted(norm["lo"]) == sorted(norm["hi"])


# ---- home_work_infer (mobility anchors) ----

def test_home_work_hand_case(spark):
    import datetime

    from mapbox_filter_spark.operators.trajectory import home_work_infer

    rows = []
    # user 1: nights mostly in cell (0,0), days in cell (5,5)
    for d in range(4):
        rows.append((1, datetime.datetime(2026, 1, 1 + d, 23), 10, 10))
        rows.append((1, datetime.datetime(2026, 1, 1 + d, 2), 20, 20))
        rows.append((1, datetime.datetime(2026, 1, 1 + d, 10),
                     510, 510))
    rows.append((1, datetime.datetime(2026, 1, 5, 23), 310, 310))
    # user 2: day pings only -> home columns NULL
    rows.append((2, datetime.datetime(2026, 1, 1, 12), 100, 100))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "x long, y long")
    got = {r["entity"]: r
           for r in home_work_infer(df, 100).collect()}
    r1 = got[1]
    assert (r1["home_cx"], r1["home_cy"]) == (0, 0)
    assert r1["home_n"] == 8 and r1["home_total"] == 9
    assert r1["home_share"] == 8 / 9
    assert (r1["work_cx"], r1["work_cy"]) == (5, 5)
    assert r1["work_n"] == 4 and r1["work_total"] == 4
    r2 = got[2]
    assert r2["home_cx"] is None and r2["home_share"] is None
    assert (r2["work_cx"], r2["work_cy"]) == (1, 1)
    with pytest.raises(ValueError):
        home_work_infer(df, 0)


def test_home_work_tie_breaks_lex(spark):
    import datetime

    from mapbox_filter_spark.operators.trajectory import home_work_infer

    # two night cells with equal counts -> smallest (cx, cy) wins
    rows = [(1, datetime.datetime(2026, 1, 1, 23), 900, 900),
            (1, datetime.datetime(2026, 1, 2, 23), 100, 100)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "x long, y long")
    r = home_work_infer(df, 100).collect()[0]
    assert (r["home_cx"], r["home_cy"]) == (1, 1)


# ---- clip_seam_audit (tile-crack tripwire) ----

def test_clip_seam_detects_cracks(spark):
    from mapbox_filter_spark.geo.clip import (clip_seam_audit,
                                              clip_segments_to_tiles)

    segs = spark.createDataFrame(
        [(1, 0, 50, 50, 350, 70),    # crosses x=100,200,300 (tile 100)
         (2, 0, 10, 10, 20, 20)],    # interior, no cuts
        "line_id long, seg_i long, x0 long, y0 long, x1 long, y1 long")
    clipped = clip_segments_to_tiles(segs, 100, 8)
    got = {r["line_id"]: r for r in clip_seam_audit(clipped).collect()}
    assert got[1]["seam_ok"] and got[1]["n_out"] == 3 \
        and got[1]["n_out_matched"] == 3
    assert got[2]["seam_ok"] and got[2]["n_out"] == 0

    # corrupt one entry point by a subpixel -> the crack is flagged
    from pyspark.sql import functions as F

    broken = clipped.withColumn(
        "qx0", F.when(F.col("cut_in") & (F.col("tx") == 2),
                      F.col("qx0") + 1).otherwise(F.col("qx0")))
    got2 = {r["line_id"]: r
            for r in clip_seam_audit(broken).collect()}
    assert not got2[1]["seam_ok"]
    assert got2[2]["seam_ok"]


# ---- ring_union_cover (lattice union coverage) ----

def test_union_cover_hand_case(spark):
    from mapbox_filter_spark.geo.clip import (clip_rings_to_tiles,
                                              ring_union_cover)

    # two identical half-tile squares + one disjoint quarter square,
    # tile=64, scale=1, grid=8 -> subcell 8
    sq = [(0, 0), (32, 0), (32, 32), (0, 32)]
    sq2 = [(40, 40), (56, 40), (56, 56), (40, 56)]

    def ring(rid, pts):
        return (rid, [{"x": x, "y": y} for x, y in pts])

    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("ring_id", T.LongType()),
        T.StructField("verts", T.ArrayType(T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType())])))])
    df = spark.createDataFrame(
        [ring(1, sq), ring(2, sq), ring(3, sq2)], schema)
    clipped = clip_rings_to_tiles(df, 64, 1)
    out = ring_union_cover(clipped, 64, 1, grid=8).collect()
    r = {(x["tx"], x["ty"]): x for x in out}[(0, 0)]
    # squares 1+2 cover a 4x4 subcell block each (16 cells), the
    # disjoint square 2x2 = 4 cells; union 20, sum 36
    assert r["n_rings"] == 3
    assert r["cells_union"] == 20 and r["cells_sum"] == 36
    assert r["union_frac"] == 20 / 64
    with pytest.raises(ValueError):
        ring_union_cover(clipped, 64, 1, grid=7)


def test_union_cover_brute_parity(spark):
    from mapbox_filter_spark.geo.clip import (clip_rings_to_tiles,
                                              ring_union_cover)

    rng = random.Random(53)
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("ring_id", T.LongType()),
        T.StructField("verts", T.ArrayType(T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType())])))])
    rows = []
    rings = {}
    for rid in range(6):
        cx, cy = rng.randrange(20, 100), rng.randrange(20, 100)
        r = rng.randrange(8, 30)
        pts = [(cx + r, cy), (cx, cy + r), (max(cx - r, 0), cy),
               (cx, max(cy - r, 0))]
        rings[rid] = pts
        rows.append((rid, [{"x": x, "y": y} for x, y in pts]))
    df = spark.createDataFrame(rows, schema)
    clipped = clip_rings_to_tiles(df, 64, 1)
    got = {(r["tx"], r["ty"]): (r["cells_union"], r["cells_sum"])
           for r in ring_union_cover(clipped, 64, 1, grid=8).collect()}

    # brute: clip replays via the engine (the clip op has its own
    # oracle); here we replay only the lattice classification
    pieces = [(r["ring_id"], r["tx"], r["ty"], r["i"], r["x"], r["y"])
              for r in clipped.collect()]
    from collections import defaultdict

    per = defaultdict(list)
    for rid, tx, ty, i, x, y in pieces:
        per[(rid, tx, ty)].append((i, x, y))
    cover = defaultdict(set)
    sums = defaultdict(int)
    for (rid, tx, ty), vs in per.items():
        vs.sort()
        v2 = [(2 * x, 2 * y) for _, x, y in vs]
        n = len(v2)
        for c in range(64):
            px2 = 2 * tx * 64 + (c % 8) * 16 + 7
            py2 = 2 * ty * 64 + (c // 8) * 16 + 7
            cr = 0
            for j in range(n):
                ax2, ay2 = v2[j]
                bx2, by2 = v2[(j + 1) % n]
                if (ay2 > py2) != (by2 > py2):
                    e = (px2 - ax2) * (by2 - ay2) \
                        - (bx2 - ax2) * (py2 - ay2)
                    if (by2 - ay2 > 0 and e < 0) or \
                       (by2 - ay2 < 0 and e > 0):
                        cr += 1
            if cr % 2 == 1:
                cover[(tx, ty)].add(c)
                sums[(tx, ty)] += 1
    want = {k: (len(v), sums[k]) for k, v in cover.items()}
    assert got == want


# ---- ring_label_anchor (lattice polylabel) ----

def test_label_anchor_square_center(spark):
    import pyspark.sql.types as T

    from mapbox_filter_spark.geo.clip import (clip_rings_to_tiles,
                                              ring_label_anchor)

    schema = T.StructType([
        T.StructField("ring_id", T.LongType()),
        T.StructField("verts", T.ArrayType(T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType())])))])
    # full-tile square: the anchor is the sample nearest the center
    sq = [{"x": 0, "y": 0}, {"x": 64, "y": 0}, {"x": 64, "y": 64},
          {"x": 0, "y": 64}]
    df = spark.createDataFrame([(1, sq)], schema)
    clipped = clip_rings_to_tiles(df, 64, 1)
    r = ring_label_anchor(clipped, 64, 1, grid=8).collect()[0]
    # grid 8: samples at doubled 16k+7; edges at doubled 0/128.
    # cell (3,3) sample 55 has clearance min(55, 73) = 55; cell (4,4)
    # sample 71 has min(71, 57) = 57 > 55 -> (4,4) = cell 36 wins
    assert r["cell"] == 36
    assert r["ax2"] == 71 and r["ay2"] == 71
    assert r["clearance_d2"] == 57 * 57


def test_label_anchor_brute_parity(spark):
    import pyspark.sql.types as T

    from mapbox_filter_spark.geo.clip import (clip_rings_to_tiles,
                                              ring_label_anchor)

    rng = random.Random(61)
    schema = T.StructType([
        T.StructField("ring_id", T.LongType()),
        T.StructField("verts", T.ArrayType(T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType())])))])
    rows = []
    for rid in range(5):
        cx, cy = rng.randrange(20, 100), rng.randrange(20, 100)
        rr = rng.randrange(10, 30)
        rows.append((rid, [
            {"x": cx + rr, "y": cy}, {"x": cx, "y": cy + rr},
            {"x": max(cx - rr, 0), "y": cy},
            {"x": cx, "y": max(cy - rr, 0)}]))
    df = spark.createDataFrame(rows, schema)
    clipped = clip_rings_to_tiles(df, 64, 1)
    got = {(r["ring_id"], r["tx"], r["ty"]):
           (r["cell"], r["clearance_d2"])
           for r in ring_label_anchor(clipped, 64, 1, grid=8).collect()}

    pieces = [(r["ring_id"], r["tx"], r["ty"], r["i"], r["x"], r["y"])
              for r in clipped.collect()]
    from collections import defaultdict

    per = defaultdict(list)
    for rid, tx, ty, i, x, y in pieces:
        per[(rid, tx, ty)].append((i, x, y))
    want = {}
    for key, vs in per.items():
        rid, tx, ty = key
        vs.sort()
        v2 = [(2 * x, 2 * y) for _, x, y in vs]
        n = len(v2)
        best = None
        for c in range(64):
            px2 = 2 * tx * 64 + (c % 8) * 16 + 7
            py2 = 2 * ty * 64 + (c // 8) * 16 + 7
            cr = 0
            mind2 = 1 << 62
            for j in range(n):
                ax2, ay2 = v2[j]
                bx2, by2 = v2[(j + 1) % n]
                dy = by2 - ay2
                if (ay2 > py2) != (by2 > py2):
                    e = (px2 - ax2) * dy - (bx2 - ax2) * (py2 - ay2)
                    if (dy > 0 and e < 0) or (dy < 0 and e > 0):
                        cr += 1
                tn = (px2 - ax2) * (bx2 - ax2) \
                    + (py2 - ay2) * (by2 - ay2)
                l2 = (bx2 - ax2) ** 2 + (by2 - ay2) ** 2
                if l2 == 0 or tn <= 0:
                    d2 = (px2 - ax2) ** 2 + (py2 - ay2) ** 2
                elif tn >= l2:
                    d2 = (px2 - bx2) ** 2 + (py2 - by2) ** 2
                else:
                    crx = (bx2 - ax2) * (py2 - ay2) \
                        - (by2 - ay2) * (px2 - ax2)
                    d2 = (crx * crx) // l2
                mind2 = min(mind2, d2)
            if cr % 2 == 1:
                k = (-mind2, c)
                if best is None or k < best:
                    best = k
        if best is not None:
            want[key] = (best[1], -best[0])
    assert got == want


# ---- floor_div_big (exact decimal floor division) ----

def test_floor_div_big_exactness(spark):
    """The double-divide floor spelling is off by one past 2^53
    numerators (the review repro); the decimal form must match
    python // everywhere."""
    from mapbox_filter_spark.geo.tilemath import floor_div_big

    cases = [(177744319624659649, 716411281), (2 ** 62, 3),
             (10 ** 18 + 7, 10 ** 9 + 3), (5, 2), (0, 7),
             (2 ** 53 + 1, 1), ((1 << 62) - 1, (1 << 31) - 1)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = df.select(floor_div_big(F.col("a"), F.col("b"))
                    .alias("q")).collect()
    for (a, b), r in zip(cases, got):
        assert r["q"] == a // b, (a, b)
