"""Session-13 operator units: tile_compact / tile_uncompact
(operators/quadtree.py) — minimal-covering normalization of ZXY tile
sets (the S2 CellUnion::Normalize / H3 compact analog) and its exact
inverse."""
import pytest

from mapbox_filter_spark.operators.quadtree import (tile_compact,
                                                    tile_uncompact)


def _tiles(spark, z, xys):
    return spark.createDataFrame([(z, x, y) for x, y in xys],
                                 "z int, x long, y long")


def test_compact_full_quad_collapses(spark):
    # the four z=2 children of (1, (0,1)) collapse to the parent;
    # the lone (3,3) survives at z=2
    xys = [(0, 2), (1, 2), (0, 3), (1, 3), (3, 3)]
    out = {(r.z, r.x, r.y)
           for r in tile_compact(_tiles(spark, 2, xys), 0).collect()}
    assert out == {(1, 0, 1), (2, 3, 3)}


def test_compact_recursive_to_root(spark):
    # ALL 16 z=2 tiles → the single z=0 root
    xys = [(x, y) for x in range(4) for y in range(4)]
    out = tile_compact(_tiles(spark, 2, xys), 0).collect()
    assert [(r.z, r.x, r.y) for r in out] == [(0, 0, 0)]


def test_compact_z_min_floor(spark):
    # z_min=2 forbids promotion past z=2: input returns unchanged
    xys = [(x, y) for x in range(4) for y in range(4)]
    out = {(r.z, r.x, r.y)
           for r in tile_compact(_tiles(spark, 2, xys), 2).collect()}
    assert out == {(2, x, y) for x, y in xys}


def test_compact_rejects_mixed_zoom(spark):
    df = spark.createDataFrame([(1, 0, 0), (2, 0, 0)],
                               "z int, x long, y long")
    with pytest.raises(ValueError) as exc:
        tile_compact(df, 0)
    assert "single-zoom" in str(exc.value)


def test_uncompact_roundtrip_identity(spark):
    # compact ∘ uncompact = identity on an L-shaped z=3 region
    xys = [(x, y) for x in range(8) for y in range(8)
           if x < 2 or y < 2]
    z3 = _tiles(spark, 3, xys)
    back = tile_uncompact(tile_compact(z3, 0), 3)
    assert ({(r.x, r.y) for r in back.collect()} == set(xys))


def test_uncompact_bounds_raise(spark):
    # z deeper than the target is an in-plan error, never silent
    df = _tiles(spark, 3, [(0, 0)])
    with pytest.raises(Exception) as exc:
        tile_uncompact(df, 2).collect()
    assert "tile_uncompact" in str(exc.value)
