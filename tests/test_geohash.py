"""Geohash encoder (geo/geohash.py): public test vectors, Column↔twin
equality, clamping at the domain edges, and the prefix-containment
property that string-clustered pruning relies on."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.geohash import geohash, geohash_bits, py_geohash


# Published geohash examples (en.wikipedia.org/wiki/Geohash and the
# original geohash.org service): (lat, lon, precision) -> key.
VECTORS = [
    (42.605, -5.603, 5, "ezs42"),
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (0.0, 0.0, 1, "s"),
    (0.0, 0.0, 8, "s0000000"),
]


@pytest.mark.parametrize("lat,lon,prec,expected", VECTORS)
def test_python_twin_vectors(lat, lon, prec, expected):
    assert py_geohash(lon, lat, prec) == expected


def _grid_points():
    pts = []
    for i in range(40):
        lon = ((i * 7919) % 3600) / 10.0 - 180.0
        lat = ((i * 104729) % 1700) / 10.0 - 85.0
        pts.append((i, lon, lat))
    # domain edges and degenerate points
    for j, (lon, lat) in enumerate([(-180.0, -90.0), (180.0, 90.0),
                                    (-180.0, 90.0), (180.0, -90.0),
                                    (0.0, 0.0), (179.9999999, 0.0),
                                    (-0.0000001, -0.0000001)]):
        pts.append((100 + j, lon, lat))
    return pts


@pytest.mark.parametrize("prec", [1, 2, 5, 8, 12])
def test_column_matches_python_twin(spark, prec):
    pts = _grid_points()
    df = spark.createDataFrame(pts, "id int, lon double, lat double")
    got = {r["id"]: r["gh"]
           for r in df.select("id", geohash(F.col("lon"), F.col("lat"),
                                            prec).alias("gh")).collect()}
    for i, lon, lat in pts:
        # the bisection twin maps v == hi into the top cell naturally;
        # the closed form clamps — same key for every in-domain input
        lon_c = min(lon, 179.9999999999)
        lat_c = min(lat, 89.9999999999)
        assert got[i] == py_geohash(lon_c, lat_c, prec), (i, lon, lat)


def test_prefix_containment(spark):
    """Truncating a geohash yields the coarser cell's key exactly —
    floor-nesting of the axis quantizers plus MSB-first interleave."""
    pts = _grid_points()
    df = spark.createDataFrame(pts, "id int, lon double, lat double")
    cols = [geohash(F.col("lon"), F.col("lat"), p).alias(f"g{p}")
            for p in range(1, 13)]
    for row in df.select(*cols).collect():
        full = row["g12"]
        for p in range(1, 12):
            assert row[f"g{p}"] == full[:p]


def test_bits_layout(spark):
    """gh bits: 5·precision wide, lon-first interleave (MSB is a lon bit)."""
    df = spark.createDataFrame([(120.0, 0.0)], "lon double, lat double")
    bits = df.select(
        geohash_bits(F.col("lon"), F.col("lat"), 8).alias("b")).head()["b"]
    assert 0 <= bits < 1 << 40
    # lon=120 -> first bisection bit 1 (east half); lat=0 -> second bit 1
    assert (bits >> 39) & 1 == 1


def test_precision_bounds():
    with pytest.raises(ValueError):
        geohash_bits(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash_bits(F.lit(0.0), F.lit(0.0), 13)
