"""S2-style cell index: Hilbert bijection, hierarchy bit-arithmetic
(hypothesis over exact ints), and Spark/python-twin equality on a
deterministic lon/lat lattice (fixed points, not hypothesis — a 1-ulp
libm divergence would surface deterministically here, never flakily)."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from mapbox_filter_spark.geo import s2


# ------------------------------------------------------------- pure ints


@given(st.integers(min_value=1, max_value=s2.MAX_LEVEL), st.data())
@settings(max_examples=60, deadline=None)
def test_hilbert_roundtrip(level, data):
    n = 1 << level
    i = data.draw(st.integers(min_value=0, max_value=n - 1))
    j = data.draw(st.integers(min_value=0, max_value=n - 1))
    d = s2.py_hilbert_pos(i, j, level)
    assert 0 <= d < n * n
    assert s2.py_hilbert_ij(d, level) == (i, j)


def test_hilbert_bijective_and_adjacent():
    level = 4
    n = 1 << level
    seen = {}
    for i in range(n):
        for j in range(n):
            seen[s2.py_hilbert_pos(i, j, level)] = (i, j)
    assert len(seen) == n * n
    # curve property: consecutive positions are grid neighbours
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = seen[d], seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


@given(st.integers(min_value=0, max_value=5),
       st.integers(min_value=2, max_value=s2.MAX_LEVEL), st.data())
@settings(max_examples=80, deadline=None)
def test_hierarchy_bit_arithmetic(face, level, data):
    pos = data.draw(st.integers(min_value=0, max_value=(1 << (2 * level)) - 1))
    shift = 2 * (s2.MAX_LEVEL - level)
    cell = (face << (2 * s2.MAX_LEVEL + 1)) | (pos << (shift + 1)) | (1 << shift)

    parent_level = data.draw(st.integers(min_value=1, max_value=level - 1))
    parent = s2.py_s2_parent(cell, parent_level)
    # parent's position is the child's 2*parent_level leading bits
    pshift = 2 * (s2.MAX_LEVEL - parent_level)
    assert (parent >> (pshift + 1)) & ((1 << (2 * parent_level)) - 1) \
        == pos >> (2 * (level - parent_level))
    assert parent >> (2 * s2.MAX_LEVEL + 1) == face

    lo, hi = s2.py_s2_range(parent)
    assert lo <= cell <= hi
    # ranges of sibling parents never overlap
    sib = s2.py_s2_parent(
        (face << (2 * s2.MAX_LEVEL + 1))
        | (((pos >> (2 * (level - parent_level))) ^ 1) << (pshift + 1))
        | (1 << pshift), parent_level)
    slo, shi = s2.py_s2_range(sib)
    assert shi < lo or slo > hi


def test_decode_roundtrip():
    for lon, lat in _LATTICE[:60]:
        for level in (2, 9, 15):
            cell = s2.py_s2_cell(lon, lat, level)
            face, i, j, lvl = s2.py_s2_decode(cell)
            assert lvl == level
            assert s2._py_cell_from_face_ij(face, i, j, lvl) == cell


def _shared_corners(a, b):
    ca, cb = s2.py_s2_cell_corners(a), s2.py_s2_cell_corners(b)
    n = 0
    for p in ca:
        for q in cb:
            if sum((x - y) ** 2 for x, y in zip(p, q)) < 1e-18:
                n += 1
                break
    return n


def test_neighbors_edge_adjacent_including_cross_face():
    """Each of the 4 neighbors shares EXACTLY one edge (2 corners) with
    the cell — the geometric definition of edge adjacency — and the
    relation is symmetric.  The sample forces every arm: face-interior
    cells, face-edge cells (cross-face step), and cube-corner cells."""
    samples = [
        s2.py_s2_cell(10.0, 20.0, 6),        # interior
        s2.py_s2_cell(44.9999, 0.0, 4),      # face edge (0 -> 1)
        s2.py_s2_cell(0.001, 89.99, 3),      # polar face
        s2.py_s2_cell(-135.0001, -35.26, 2), # near a cube corner
        s2.py_s2_cell(179.99, -0.01, 5),     # antimeridian face edge
    ]
    for cell in samples:
        nbs = s2.py_s2_neighbors(cell)
        assert len(set(nbs)) == 4 and cell not in nbs
        for nb in nbs:
            assert s2.py_s2_decode(nb)[3] == s2.py_s2_decode(cell)[3]
            assert _shared_corners(cell, nb) == 2, (cell, nb)
            assert cell in s2.py_s2_neighbors(nb)  # symmetry


def test_ring_bfs():
    cell = s2.py_s2_cell(10.0, 20.0, 8)
    r0 = s2.py_s2_ring(cell, 0)
    r1 = s2.py_s2_ring(cell, 1)
    r2 = s2.py_s2_ring(cell, 2)
    assert r0 == [cell]
    assert len(r1) == 5 and set(r0) < set(r1) < set(r2)
    assert len(r2) == 13  # interior: 1 + 4 + 8


# ---------------------------------------------------------------- lattice

_LATTICE = [(-179.9 + (i * 7.13) % 359.8, -84.9 + (i * 3.77) % 169.8)
            for i in range(150)] + [
    (45.0001, 10.0), (-135.0002, 20.0), (0.0, 35.264), (90.0, -35.264),
    (179.999, 0.0), (0.001, 89.9), (0.001, -89.9), (-0.001, 0.001),
]


@pytest.fixture(scope="module")
def lattice_df(spark):
    return spark.createDataFrame(
        [(k, lon, lat) for k, (lon, lat) in enumerate(_LATTICE)],
        "pkey long, lon double, lat double")


@pytest.mark.parametrize("level", [1, 7, 15])
def test_spark_matches_python_twin(lattice_df, level):
    rows = lattice_df.select(
        "pkey", s2.s2_cell(F.col("lon"), F.col("lat"), level).alias("cell")
    ).collect()
    for r in rows:
        lon, lat = _LATTICE[r["pkey"]]
        assert r["cell"] == s2.py_s2_cell(lon, lat, level), (lon, lat)


@pytest.mark.parametrize("level", [1, 8, 15])
def test_bulk_path_matches_column_path(lattice_df, level):
    """with_s2_cell (chained-projection codegen unroll) must produce the
    exact bits of the Column fold / python twin."""
    from mapbox_filter_spark.geo.s2 import with_s2_cell

    rows = with_s2_cell(lattice_df, level=level, out="cell").collect()
    assert rows and all(
        r["cell"] == s2.py_s2_cell(*_LATTICE[r["pkey"]], level) for r in rows)


def test_bulk_path_single_codegen_span(lattice_df):
    from mapbox_filter_spark.geo.s2 import with_s2_cell

    df = with_s2_cell(lattice_df, level=12)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every projection of the unroll lives in ONE WholeStageCodegen span
    # ("*(1) Project" markers; no aggregate( HOF fold in the plan)
    assert "*(1) Project" in plan
    assert "aggregate(" not in plan
    assert df.columns == ["pkey", "lon", "lat", "s2_cell"]


def test_spark_hierarchy_columns(lattice_df):
    rows = lattice_df.select(
        s2.s2_cell(F.col("lon"), F.col("lat"), 12).alias("c12"),
    ).select(
        "c12",
        s2.s2_parent(F.col("c12"), 5).alias("c5"),
        s2.s2_level(F.col("c12")).alias("lvl"),
        s2.s2_face(F.col("c12")).alias("face"),
        s2.s2_range_min(F.col("c12")).alias("lo"),
        s2.s2_range_max(F.col("c12")).alias("hi"),
        s2.s2_contains(s2.s2_parent(F.col("c12"), 5), F.col("c12")).alias("inp"),
        s2.s2_token(F.col("c12")).alias("tok"),
    ).collect()
    for r in rows:
        assert r["lvl"] == 12
        assert 0 <= r["face"] <= 5
        assert r["c5"] == s2.py_s2_parent(r["c12"], 5)
        assert (r["lo"], r["hi"]) == s2.py_s2_range(r["c12"])
        assert r["inp"] is True
        # token: lowercase hex, trailing zeros stripped, round-trippable
        assert r["tok"] == format(r["c12"], "x").rstrip("0")
        assert int(r["tok"].ljust(len(format(r["c12"], "x")), "0"), 16) == r["c12"]


def test_level_validation():
    with pytest.raises(ValueError):
        s2.s2_cell(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        s2.s2_cell(F.lit(0.0), F.lit(0.0), s2.MAX_LEVEL + 1)


def test_face_coverage():
    # cardinal directions land on the six distinct faces
    pts = [(0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 89.9, 2),
           (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -89.9, 5)]
    for lon, lat, face in pts:
        cell = s2.py_s2_cell(lon, lat, 8)
        assert cell >> (2 * s2.MAX_LEVEL + 1) == face, (lon, lat)


_CORNER_LAT = 35.264389682754654  # degrees(atan(1/sqrt(2)))

# Pinned level-20 fixtures for every geometric degeneracy: 6 face centers,
# the 8 cube corners, the poles, and the ±180 meridian.  Tie-break rule
# (documented, deterministic): the face CASE prefers the x axis when
# |x| >= |y| AND |x| >= |z|, else y when |y| >= |z|, else z — evaluated on
# the FLOATING-POINT xyz, so e.g. lat 90 has x ≈ 6.1e-17 (not 0) and the
# z arm wins; i/j floors clamp into [0, 2^level - 1].  lon +180 and
# lon -180 produce opposite y signs (sin(±π) ≈ ±1.2e-16) and therefore
# DIFFERENT (pinned) cells on face 3 — a floating-point artifact shared by
# the Spark columns, the python twin, and the DuckDB oracle alike.
_DEGENERATE_FIXTURES = [
    ("face0_center", 0.0, 0.0, 288230376151973888, 0),
    ("face1_center", 90.0, 0.0, 864691128455397376, 1),
    ("north_pole", 0.0, 90.0, 1441151880758820864, 2),
    ("face3_center", 180.0, 0.0, 2209766217163210752, 3),
    ("face4_center", -90.0, 0.0, 2594073385365667840, 4),
    ("south_pole", 0.0, -90.0, 3170534137669091328, 5),
    ("corner_ppp", 45.0, _CORNER_LAT, 384307168202194944, 0),
    ("corner_npp", 135.0, _CORNER_LAT, 960767920505618432, 1),
    ("corner_nnp", -135.0, _CORNER_LAT, 2305843009213956096, 4),
    ("corner_pnp", -45.0, _CORNER_LAT, 192153584101228544, 0),
    ("corner_ppn", 45.0, -_CORNER_LAT, 576460752303161344, 0),
    ("corner_npn", 135.0, -_CORNER_LAT, 1152921504606584832, 1),
    ("corner_nnn", -135.0, -_CORNER_LAT, 2882303761516855296, 4),
    ("corner_pnn", -45.0, -_CORNER_LAT, 262144, 0),
    ("antimeridian_pos", 180.0, 30.0, 1839766662165561344, 3),
    ("antimeridian_neg", -180.0, 30.0, 1884616427941658624, 3),
]


def test_degenerate_points_pinned(spark):
    """Poles, face centers, cube corners, antimeridian: exact pinned ids
    from all three implementations (python twin, Column fold, bulk
    unroll) — freezes the tie-break rule."""
    for name, lon, lat, want, want_face in _DEGENERATE_FIXTURES:
        got = s2.py_s2_cell(lon, lat, 20)
        assert got == want, (name, got, want)
        assert got >> (2 * s2.MAX_LEVEL + 1) == want_face, name

    df = spark.createDataFrame(
        [(n, lon, lat) for n, lon, lat, _, _ in _DEGENERATE_FIXTURES],
        "name string, lon double, lat double")
    col_rows = {r["name"]: r["c"] for r in df.select(
        "name", s2.s2_cell(F.col("lon"), F.col("lat"), 20).alias("c"))
        .collect()}
    bulk_rows = {r["name"]: r["c"] for r in
                 s2.with_s2_cell(df, level=20, out="c").collect()}
    for name, _lon, _lat, want, _f in _DEGENERATE_FIXTURES:
        assert col_rows[name] == want, ("column", name)
        assert bulk_rows[name] == want, ("bulk", name)


def test_locality_beats_random():
    """Hilbert locality: nearby points at the same level share parents far
    more often than far-apart points — a smoke check of WHY the index
    exists (range scans over cell-sorted data touch contiguous spans)."""
    near = [(10.0 + k * 0.001, 20.0 + k * 0.001) for k in range(50)]
    far = [((k * 67.7) % 350 - 175, ((k * 31.3) % 160) - 80) for k in range(50)]
    def n_parents(pts):
        return len({s2.py_s2_parent(s2.py_s2_cell(lon, lat, 12), 6)
                    for lon, lat in pts})
    assert n_parents(near) <= 2
    assert n_parents(far) > 20


def test_covering_join_big_matches_broadcast(spark):
    """The ancestor-chain equi-join (region sets too big to broadcast) must
    return exactly the broadcast range join's pairs on a mixed-level
    covering, and its plan must contain no BroadcastNestedLoopJoin (it is
    a plain equi-join, shuffle-partitionable at any region count)."""
    import random

    rng = random.Random(7)
    pts = [(i, rng.uniform(-60, 60), rng.uniform(-50, 50)) for i in range(400)]
    pdf = spark.createDataFrame(pts, "pid long, lon double, lat double")
    points = s2.with_s2_cell(pdf, level=12, out="cell").select("pid", "cell")

    # mixed-level covering derived from a subset of the points
    regs = []
    for i, (pid, lon, lat) in enumerate(pts[:60]):
        regs.append((s2.py_s2_cell(lon, lat, 2 + i % 3),))
    rdf = spark.createDataFrame(sorted(set(regs)), "region_cell long")

    a = {(r["pid"], r["region_cell"]) for r in
         s2.s2_covering_join(points, rdf).collect()}
    b = {(r["pid"], r["region_cell"]) for r in
         s2.s2_covering_join_big(points, rdf).collect()}
    assert a == b and a  # identical, non-empty

    plan = (s2.s2_covering_join_big(points, rdf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan


def test_s2_ancestors_chain():
    """s2_ancestors emits exactly the parent chain levels 1..cell level."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    cell = s2.py_s2_cell(10.0, 20.0, 9)
    row = spark.range(1).select(
        s2.s2_ancestors(F.lit(cell).cast("long")).alias("anc")).first()
    got = list(row["anc"])
    want = [s2.py_s2_parent(cell, k) for k in range(1, 10)]
    assert got == want
    assert got[-1] == cell  # own level included (self-containment)
