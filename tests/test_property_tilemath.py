"""Property-based tile-math invariants (hypothesis over a Spark batch).

One Spark job per property run: hypothesis generates the coordinate corpus,
a single select evaluates all the Column expressions, and the invariants
are checked row-by-row against pure-python recomputation — pole/antimeridian
clamps included (SURVEY §7 'what's hard': clamp rules pinned by tests).
"""

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from mapbox_filter_spark.geo.tilemath import (
    MERCATOR_MAX_LAT, cell_decode, cell_encode, cell_parent, tile_cols, tms_y,
)

_lon = st.one_of(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.sampled_from([-180.0, 180.0, 0.0, 179.999999, -179.999999]),
)
_lat = st.one_of(
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    st.sampled_from([90.0, -90.0, MERCATOR_MAX_LAT, -MERCATOR_MAX_LAT, 0.0]),
)
_zoom = st.integers(min_value=0, max_value=14)


def _py_tile(lon: float, lat: float, z: int) -> tuple[int, int]:
    n = 1 << z
    x = max(0, min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1))
    latc = max(-MERCATOR_MAX_LAT, min(lat, MERCATOR_MAX_LAT))
    merc = math.log(math.tan(math.radians(latc))
                    + 1.0 / math.cos(math.radians(latc)))
    y = max(0, min(int(math.floor((1.0 - merc / math.pi) / 2.0 * n)), n - 1))
    return x, y


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_lon, _lat, _zoom), min_size=1, max_size=40))
def test_tile_assign_invariants(spark, coords):
    df = spark.createDataFrame(coords, "lon double, lat double, z int")
    x, y = tile_cols(F.col("lon"), F.col("lat"), F.col("z"))
    cell = cell_encode(F.col("z"), x, y)
    dz, dx, dy = cell_decode(cell)
    pz, px, py = cell_decode(cell_parent(cell))
    rows = df.select(
        "lon", "lat", "z", x.alias("x"), y.alias("y"),
        dz.alias("dz"), dx.alias("dx"), dy.alias("dy"),
        pz.alias("pz"), px.alias("px"), py.alias("py"),
        tms_y(y, F.col("z")).alias("tms"),
    ).collect()
    for r in rows:
        n = 1 << r["z"]
        # in-range even at poles/antimeridian (clamp rules)
        assert 0 <= r["x"] < n and 0 <= r["y"] < n, r
        # matches the pure-python reference exactly
        assert (r["x"], r["y"]) == _py_tile(r["lon"], r["lat"], r["z"]), r
        # cell encode/decode round-trips
        assert (r["dz"], r["dx"], r["dy"]) == (r["z"], r["x"], r["y"]), r
        # parent = (z-1, x//2, y//2); at z=0 the parent stays the root
        if r["z"] > 0:
            assert (r["pz"], r["px"], r["py"]) == \
                (r["z"] - 1, r["x"] // 2, r["y"] // 2), r
        # TMS flip involution
        assert (n - 1) - r["tms"] == r["y"], r


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_lon, _lat), min_size=1, max_size=40))
def test_assign_tiles_multizoom_equals_per_zoom(spark, coords):
    """assign_tiles derives coarse zooms from the max-zoom tile by integer
    shift (one transcendental chain per feature, r6 optimization); the
    result must be bit-identical to direct per-zoom tile_cols, clamp
    boundaries included."""
    from mapbox_filter_spark.operators.assemble import assign_tiles

    zooms = [3, 5, 8, 11]
    df = spark.createDataFrame(coords, "lon double, lat double")
    got = {
        (r["lon"], r["lat"], r["z"]): (r["x"], r["y"])
        for r in assign_tiles(df, zooms).collect()
    }
    assert len(got) == len(set(coords)) * len(zooms)
    for lon, lat in coords:
        for z in zooms:
            assert got[(lon, lat, z)] == _py_tile(lon, lat, z), (lon, lat, z)
