"""Polygon analytics (geo/geom.py): exact folds + haversine differential."""

import math

from pyspark.sql import functions as F

from mapbox_filter_spark.geo.geom import (
    EARTH_RADIUS_M,
    haversine_m,
    polygon_bbox,
    polygon_centroid,
    ring_perimeter,
    shoelace_area2,
)


def _poly_df(spark, verts):
    rows = [(1, [{"x": x, "y": y} for x, y in verts])]
    return spark.createDataFrame(
        rows, "poly_id long, verts array<struct<x:long,y:long>>")


def test_square_stats(spark):
    df = _poly_df(spark, [(2, 3), (12, 3), (12, 13), (2, 13)])  # CCW 10x10
    v = F.col("verts")
    cx, cy = polygon_centroid(v)
    minx, miny, maxx, maxy = polygon_bbox(v)
    r = df.select(
        shoelace_area2(v).alias("a2"), cx.alias("cx"), cy.alias("cy"),
        ring_perimeter(v).alias("p"),
        minx.alias("x0"), miny.alias("y0"),
        maxx.alias("x1"), maxy.alias("y1")).first()
    assert r["a2"] == 200
    assert (r["cx"], r["cy"]) == (7.0, 8.0)
    assert r["p"] == 40.0
    assert (r["x0"], r["y0"], r["x1"], r["y1"]) == (2, 3, 12, 13)


def test_winding_sign_and_degenerate(spark):
    cw = _poly_df(spark, [(0, 0), (0, 10), (10, 10), (10, 0)])
    assert cw.select(shoelace_area2(F.col("verts"))).first()[0] == -200
    # collinear -> zero area, centroid null (no division error under ANSI)
    line = _poly_df(spark, [(0, 0), (5, 5), (10, 10)])
    cx, _cy = polygon_centroid(F.col("verts"))
    row = line.select(shoelace_area2(F.col("verts")).alias("a2"),
                      cx.alias("cx")).first()
    assert row["a2"] == 0 and row["cx"] is None


def test_l_shape_centroid(spark):
    # L-shape: 2x2 square minus 1x1 corner; known centroid (area-weighted)
    verts = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    df = _poly_df(spark, verts)
    cx, cy = polygon_centroid(F.col("verts"))
    r = df.select(shoelace_area2(F.col("verts")).alias("a2"),
                  cx.alias("cx"), cy.alias("cy")).first()
    assert r["a2"] == 6  # area 3
    assert math.isclose(r["cx"], 5.0 / 6.0, rel_tol=1e-12)
    assert math.isclose(r["cy"], 5.0 / 6.0, rel_tol=1e-12)


def _py_haversine(lon1, lat1, lon2, lat2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2)
    return 2 * EARTH_RADIUS_M * math.asin(min(math.sqrt(a), 1.0))


def test_haversine_differential(spark):
    pts = [(0.0, 0.0, 1.0, 0.0), (-180.0, 0.0, 180.0, 0.0),
           (13.4, 52.5, 2.35, 48.85), (0.0, 89.9, 180.0, 89.9),
           (-73.98, 40.75, 151.2, -33.87)]
    df = spark.createDataFrame(
        pts, "lon1 double, lat1 double, lon2 double, lat2 double")
    got = df.select(haversine_m(*[F.col(c) for c in df.columns])
                    .alias("d")).collect()
    for (lo1, la1, lo2, la2), r in zip(pts, got):
        assert math.isclose(r["d"], _py_haversine(lo1, la1, lo2, la2),
                            rel_tol=1e-9, abs_tol=1e-6)
    # one degree of longitude at the equator
    assert math.isclose(got[0]["d"], math.pi * EARTH_RADIUS_M / 180,
                        rel_tol=1e-12)
    # antipodal wrap: same point, distance is fp noise (~1e-9 m), not km
    assert got[1]["d"] < 1e-6


def test_geom_no_python_on_hot_path(spark):
    df = _poly_df(spark, [(0, 0), (4, 0), (4, 4)])
    out = df.select(shoelace_area2(F.col("verts")),
                    ring_perimeter(F.col("verts")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------- RDP

from mapbox_filter_spark.geo.simplify import rdp_keep_indices, simplify_rdp


def test_rdp_twin_basics():
    # straight line with sub-eps noise -> endpoints only
    xs = list(range(0, 1000, 100))
    ys = [i % 3 for i in range(10)]
    assert rdp_keep_indices(xs, ys, 5) == [0, 9]
    # a spike above eps is kept, and splitting keeps recursing
    ys2 = list(ys); ys2[4] = 500
    assert 4 in rdp_keep_indices(xs, ys2, 5)
    # eps monotonicity: larger eps keeps a subset
    k_small = set(rdp_keep_indices(xs, ys2, 2))
    k_big = set(rdp_keep_indices(xs, ys2, 400))
    assert k_big <= k_small
    # n<=2 passthrough
    assert rdp_keep_indices([0, 1], [0, 0], 1) == [0, 1]


def test_rdp_degenerate_chord():
    # closed loop: first == last vertex -> L2 == 0 branch (distance to point)
    xs = [0, 50, 0, -50, 0]
    ys = [0, 50, 100, 50, 0]
    keep = rdp_keep_indices(xs, ys, 10)
    assert keep[0] == 0 and keep[-1] == 4
    assert 2 in keep  # farthest point from the degenerate chord


def test_rdp_spark_matches_twin(spark):
    import random
    rng = random.Random(7)
    rows = []
    for lid in range(40):
        n = rng.randint(2, 30)
        pts = [{"x": i * 10 + rng.randint(0, 3), "y": rng.randint(0, 40)}
               for i in range(n)]
        rows.append((lid, pts))
    df = spark.createDataFrame(
        rows, "line_id long, verts array<struct<x:long,y:long>>")
    got = {r["line_id"]: [v["i"] for v in r["kept"]]
           for r in df.select("line_id",
                              simplify_rdp(F.col("verts"), 8).alias("kept"))
           .collect()}
    for lid, pts in rows:
        xs = [p["x"] for p in pts]; ys = [p["y"] for p in pts]
        assert got[lid] == rdp_keep_indices(xs, ys, 8), lid


def _py_bearing(lon1, lat1, lon2, lat2):
    r1, r2 = math.radians(lat1), math.radians(lat2)
    dlon = math.radians(lon2 - lon1)
    y = math.sin(dlon) * math.cos(r2)
    x = (math.cos(r1) * math.sin(r2)
         - math.sin(r1) * math.cos(r2) * math.cos(dlon))
    return (math.degrees(math.atan2(y, x)) + 360.0) % 360.0


def test_bearing_differential(spark):
    from mapbox_filter_spark.geo.geom import bearing_deg

    pts = [(0.0, 0.0, 10.0, 10.0), (10.0, 45.0, -120.0, -33.0),
           (179.0, 60.0, -179.0, 59.0), (0.0, 89.0, 0.0, -89.0)]
    df = spark.createDataFrame(
        pts, "lon1 double, lat1 double, lon2 double, lat2 double")
    got = df.select(bearing_deg(*[F.col(c) for c in df.columns])
                    .alias("b")).collect()
    for r, (lo1, la1, lo2, la2) in zip(got, pts):
        assert math.isclose(r["b"], _py_bearing(lo1, la1, lo2, la2),
                            rel_tol=1e-12, abs_tol=1e-9)


def test_destination_roundtrip(spark):
    """destination(p, bearing(p,q), haversine(p,q)) == q (inverse then
    forward geodesic closes)."""
    from mapbox_filter_spark.geo.geom import (
        bearing_deg, destination_point, haversine_m)

    pts = [(0.0, 0.0, 10.0, 10.0), (10.0, 45.0, 25.0, 50.0),
           (179.0, 10.0, -179.5, 11.0)]
    df = spark.createDataFrame(
        pts, "lon1 double, lat1 double, lon2 double, lat2 double")
    cols = [F.col(c) for c in df.columns]
    d = destination_point(cols[0], cols[1],
                          bearing_deg(*cols), haversine_m(*cols))
    got = df.select(d.alias("d")).collect()
    for r, (_, _, lo2, la2) in zip(got, pts):
        assert math.isclose(r["d"]["lon"], lo2, abs_tol=1e-6)
        assert math.isclose(r["d"]["lat"], la2, abs_tol=1e-6)


# ------------------------------------------------------------ spherical area


def test_spherical_area_known_square(spark):
    """0.1°×0.1° square at the equator ≈ (0.1°·111.19 km)² within 0.1%."""
    import math

    from mapbox_filter_spark.geo.geom import EARTH_RADIUS_M, spherical_area_m2

    side_deg = 0.1
    s = int(side_deg * 1e6)
    verts = [(0, 0), (s, 0), (s, s), (0, s)]
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in verts])],
        "poly_id long, verts array<struct<x:long,y:long>>")
    got = df.select(spherical_area_m2(F.col("verts")).alias("a")) \
            .collect()[0]["a"]
    deg_m = math.pi * EARTH_RADIUS_M / 180.0
    want = (side_deg * deg_m) ** 2
    assert abs(got - want) / want < 1e-3


def test_spherical_area_rotation_and_orientation_invariant(spark):
    from mapbox_filter_spark.geo.geom import spherical_area_m2

    verts = [(0, 0), (2_000_000, 0), (2_500_000, 1_500_000),
             (500_000, 2_000_000)]
    rows = []
    for start in range(4):
        ring = verts[start:] + verts[:start]
        rows.append((start, [{"x": x, "y": y} for x, y in ring]))
    rows.append((9, [{"x": x, "y": y} for x, y in reversed(verts)]))
    df = spark.createDataFrame(
        rows, "poly_id long, verts array<struct<x:long,y:long>>")
    areas = [r["a"] for r in df.select(
        spherical_area_m2(F.col("verts")).alias("a")).collect()]
    assert max(areas) - min(areas) < max(areas) * 1e-12


def test_spherical_vs_planar_small_polygon(spark):
    """Near the equator at small extent, spherical area converges to
    the planar shoelace area (integer, independent formula)."""
    import math

    from mapbox_filter_spark.geo.geom import (
        EARTH_RADIUS_M, shoelace_area2, spherical_area_m2)

    verts = [(0, 0), (300_000, 0), (300_000, 200_000), (0, 200_000)]
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in verts])],
        "poly_id long, verts array<struct<x:long,y:long>>")
    r = df.select(spherical_area_m2(F.col("verts")).alias("a"),
                  shoelace_area2(F.col("verts")).alias("s2")).collect()[0]
    deg_m = math.pi * EARTH_RADIUS_M / 180.0
    planar = r["s2"] / 2.0 * (deg_m / 1e6) ** 2
    assert abs(r["a"] - planar) / planar < 2e-3
