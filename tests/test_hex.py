"""geo/hex.py — hexagonal grid index algebra.

Differential twin: the axial assignment is re-implemented in pure
python (same op order) and compared on a seeded corpus; grid algebra
(neighbors, disk counts, distance, center inverse) is checked against
the published cube-coordinate identities.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.hex import (
    HEX_DIRS,
    SQRT3_3,
    TWO_THIRDS,
    hex_axial,
    hex_cell_id,
    hex_center,
    hex_disk_offsets,
    hex_distance,
    hex_neighbor_offsets,
    mercator_xy,
)
from mapbox_filter_spark.geo.tilemath import MERCATOR_MAX_LAT

SIZE = 1.0 / 64.0


def _py_hex(lon: float, lat: float, size: float) -> tuple[int, int]:
    """Python twin of hex_axial — identical IEEE op order."""
    mx = (lon + 180.0) / 360.0
    latc = max(-MERCATOR_MAX_LAT, min(lat, MERCATOR_MAX_LAT))
    rad = math.radians(latc)
    merc = math.log(math.tan(rad) + 1.0 / math.cos(rad))
    my = (1.0 - merc / math.pi) / 2.0
    qd = (SQRT3_3 * mx - my / 3.0) / size
    rd = (TWO_THIRDS * my) / size
    sd = -qd - rd
    rq, rr, rs = (math.floor(c + 0.5) for c in (qd, rd, sd))
    dq, dr, ds = abs(rq - qd), abs(rr - rd), abs(rs - sd)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return int(rq), int(rr)


def _py_dist(dq: int, dr: int) -> int:
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


@pytest.fixture(scope="module")
def pts(spark):
    rng = random.Random(2024)
    rows = [(i, rng.uniform(-179.9, 179.9), rng.uniform(-84.0, 84.0))
            for i in range(600)]
    # pin the poles / antimeridian / equator exactly
    rows += [(600, 0.0, 0.0), (601, -180.0, 0.0), (602, 179.999, 0.0),
             (603, 0.0, 89.9), (604, 0.0, -89.9)]
    return rows, spark.createDataFrame(rows, "id long, lon double, lat double")


def test_assignment_matches_python_twin(pts):
    rows, df = pts
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), SIZE)
    got = {r["id"]: (r["hq"], r["hr"])
           for r in df.select("id", hq.alias("hq"), hr.alias("hr")).collect()}
    want = {i: _py_hex(lon, lat, SIZE) for i, lon, lat in rows}
    assert got == want


def test_cube_constraint_and_coverage(pts):
    # every assigned cell satisfies q + r + s == 0 by construction
    # (axial drops s); the twin's pre-fix rounded triple must too
    rows, _df = pts
    cells = {_py_hex(lon, lat, SIZE) for _i, lon, lat in rows}
    assert len(cells) > 300  # the corpus genuinely spreads over the grid


def test_neighbor_algebra():
    assert hex_neighbor_offsets() == HEX_DIRS
    assert len(set(HEX_DIRS)) == 6
    for dq, dr in HEX_DIRS:
        assert _py_dist(dq, dr) == 1
        assert (-dq, -dr) in HEX_DIRS  # closed under inversion


@pytest.mark.parametrize("k", [0, 1, 2, 3, 5])
def test_disk_offsets(k):
    disk = hex_disk_offsets(k)
    assert len(disk) == 1 + 3 * k * (k + 1)
    assert len(set(disk)) == len(disk)
    assert all(_py_dist(dq, dr) <= k for dq, dr in disk)
    # every delta at distance exactly k is present (ring completeness)
    ring = [(dq, dr) for dq, dr in disk if _py_dist(dq, dr) == k]
    assert len(ring) == (1 if k == 0 else 6 * k)


def test_hex_distance_column(spark):
    rows = [(dq, dr) for dq in range(-4, 5) for dr in range(-4, 5)]
    df = spark.createDataFrame(rows, "dq long, dr long")
    got = {(r["dq"], r["dr"]): r["d"]
           for r in df.select("dq", "dr",
                              hex_distance(F.col("dq"),
                                           F.col("dr")).alias("d"))
           .collect()}
    assert got == {(dq, dr): _py_dist(dq, dr) for dq, dr in rows}


def test_center_inverse_roundtrip(spark):
    """hex_axial(inverse_mercator(hex_center(c))) == c for interior
    cells: the fractional transform is the exact inverse of the center
    map, and a cell center has zero rounding residual."""
    rng = random.Random(7)
    # interior of the unit square at SIZE: q in [4, 30], r in [4, 38]
    cells = [(rng.randrange(4, 30), rng.randrange(4, 38))
             for _ in range(60)]
    df = spark.createDataFrame(cells, "hq long, hr long")
    mx, my = hex_center(F.col("hq"), F.col("hr"), SIZE)
    cen = df.select("hq", "hr", mx.alias("mx"), my.alias("my")).collect()
    for r in cen:
        lon = r["mx"] * 360.0 - 180.0
        lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * r["my"]))))
        assert _py_hex(lon, lat, SIZE) == (r["hq"], r["hr"])


def test_cell_id_injective(spark):
    offs = hex_disk_offsets(6)
    df = spark.createDataFrame(offs, "hq long, hr long")
    n = (df.select(hex_cell_id(F.col("hq"), F.col("hr")).alias("id"))
         .distinct().count())
    assert n == len(offs)


def test_mercator_matches_tile_plane(spark, pts_df=None):
    """floor(mx * 2^z) equals tilemath's lon_to_tile_x for in-range
    lons — the hex grid and the tile pyramid quantize the same plane."""
    from mapbox_filter_spark.geo.tilemath import lon_to_tile_x, lat_to_tile_y

    rng = random.Random(5)
    rows = [(i, rng.uniform(-179.9, 179.9), rng.uniform(-84.0, 84.0))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    mx, my = mercator_xy(F.col("lon"), F.col("lat"))
    z = 8
    out = df.select(
        (F.floor(mx * F.lit(float(1 << z))).cast("long")).alias("hx"),
        (F.floor(my * F.lit(float(1 << z))).cast("long")).alias("hy"),
        lon_to_tile_x("lon", F.lit(z)).alias("tx"),
        lat_to_tile_y("lat", F.lit(z)).alias("ty")).collect()
    for r in out:
        assert (r["hx"], r["hy"]) == (r["tx"], r["ty"])


def test_assignment_partitioning_independent(pts):
    _rows, df = pts
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), SIZE)

    def cells(d):
        return sorted(map(tuple, d.select(
            hq.alias("hq"), hr.alias("hr")).groupBy("hq", "hr")
            .count().collect()))

    assert cells(df.repartition(1)) == cells(df.repartition(13))


def test_plan_is_codegen(pts):
    _rows, df = pts
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), SIZE)
    out = df.select(hq.alias("hq"), hr.alias("hr"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(1)" is the WholeStageCodegen stage marker in executedPlan text
    assert plan.lstrip().startswith("*(1) Project")


def test_gi_star_python_twin(spark):
    import math as _m

    from mapbox_filter_spark.geo.hex import hex_disk_offsets, hex_gi_star

    cells = [(0, 0, 10), (1, 0, 8), (0, 1, 7), (-1, 1, 2), (5, 5, 1),
             (6, 5, 3), (9, -9, 4)]
    df = spark.createDataFrame(cells, "hq long, hr long, n long")
    got = {(r["hq"], r["hr"]): (r["w_i"], r["s1"], r["z"])
           for r in hex_gi_star(df, value="n", k=1).collect()}
    by = {(q, r): n for q, r, n in cells}
    disk = hex_disk_offsets(1)
    nc = len(cells)
    sx = sum(by.values())
    sxx = sum(v * v for v in by.values())
    xbar = sx / nc
    s = _m.sqrt(sxx / nc - xbar * xbar)
    want = {}
    for (q, r), _n in by.items():
        nb = [(q + dq, r + dr) for dq, dr in disk]
        w = sum(1 for c in nb if c in by)
        s1 = sum(by[c] for c in nb if c in by)
        if nc * w - w * w > 0:
            z = (s1 - xbar * w) / (s * _m.sqrt((nc * w - w * w) / (nc - 1.0)))
            want[(q, r)] = (w, s1, z)
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-12)


def test_gi_star_partitioning_independent(spark):
    import random

    from mapbox_filter_spark.geo.hex import hex_gi_star

    rng = random.Random(3)
    cells = list({(rng.randrange(0, 12), rng.randrange(0, 12))
                  for _ in range(70)})
    rows = [(q, r, rng.randrange(1, 30)) for q, r in cells]
    df = spark.createDataFrame(rows, "hq long, hr long, n long")
    a = sorted(map(tuple, hex_gi_star(df.repartition(1), "n").collect()))
    b = sorted(map(tuple, hex_gi_star(df.repartition(13), "n").collect()))
    assert a == b  # bit-identical z under any partitioning


def _py_center(hq, hr, size):
    cx = size * (math.sqrt(3.0) * hq + math.sqrt(3.0) / 2.0 * hr)
    cy = size * (3.0 / 2.0 * hr)
    return cx, cy


def test_polyfill_matches_brute_force(spark):
    from mapbox_filter_spark.geo.hex import hex_polyfill_bbox

    boxes = [(1, -10.0, -5.0, 5.0, 8.0), (2, 100.0, 40.0, 112.0, 44.0),
             (3, -179.0, -80.0, -170.0, -71.0)]
    df = spark.createDataFrame(
        boxes, "box_id long, lon0 double, lat0 double, "
               "lon1 double, lat1 double")
    out = df.select("box_id", F.explode(hex_polyfill_bbox(
        F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1"),
        SIZE)).alias("c"))
    got = {}
    for r in out.collect():
        got.setdefault(r["box_id"], set()).add((r["c"]["hq"], r["c"]["hr"]))

    def merc(lon, lat):
        mx = (lon + 180.0) / 360.0
        latc = max(-MERCATOR_MAX_LAT, min(lat, MERCATOR_MAX_LAT))
        rad = math.radians(latc)
        my = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
              / math.pi) / 2.0
        return mx, my

    for box_id, lon0, lat0, lon1, lat1 in boxes:
        mx0, mya = merc(lon0, lat0)
        mx1, myb = merc(lon1, lat1)
        lo, hi = min(mya, myb), max(mya, myb)
        # brute force over a generous candidate window
        want = set()
        for hq in range(-80, 80):
            for hr in range(-10, 70):
                cx, cy = _py_center(hq, hr, SIZE)
                if mx0 <= cx < mx1 and lo <= cy < hi:
                    want.add((hq, hr))
        assert got[box_id] == want


def test_polyfill_partitions_space(spark):
    """Two boxes sharing the split meridian partition their cells
    (half-open center rule): no overlap, union == polyfill of union."""
    from mapbox_filter_spark.geo.hex import hex_polyfill_bbox

    rows = [(1, 0.0, 10.0, 7.0, 20.0), (2, 7.0, 10.0, 15.0, 20.0),
            (3, 0.0, 10.0, 15.0, 20.0)]
    df = spark.createDataFrame(
        rows, "box_id long, lon0 double, lat0 double, "
              "lon1 double, lat1 double")
    out = df.select("box_id", F.explode(hex_polyfill_bbox(
        F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1"),
        SIZE)).alias("c"))
    cells = {}
    for r in out.collect():
        cells.setdefault(r["box_id"], set()).add(
            (r["c"]["hq"], r["c"]["hr"]))
    assert cells[1] & cells[2] == set()
    assert cells[1] | cells[2] == cells[3]


def test_gi_star_zero_variance_guarded(spark):
    # constant field: s == 0 -> no z is emitted (instead of NULL/NaN)
    from mapbox_filter_spark.geo.hex import hex_gi_star

    cells = [(0, 0, 5), (1, 0, 5), (0, 1, 5), (9, 9, 5)]
    df = spark.createDataFrame(cells, "hq long, hr long, n long")
    assert hex_gi_star(df, value="n", k=1).count() == 0
