"""MVT protobuf + gzip codec: byte round-trips, value typing, gzip sniff,
Spark encode/decode plumbing, and the mbtiles blob integration."""

import gzip

from pyspark.sql import functions as F

from mapbox_filter_spark.sources.mvt import (
    DEFAULT_EXTENT, cmds_to_parts, decode_mvt_tiles, decode_tile,
    encode_mvt_tiles, encode_tile, point_cmds,
)

LINE_CMDS = [9, 4, 6, (2 & 7) | (2 << 3), 2, 2, 4, 4]  # MoveTo + LineTo x2

FIXTURE = [
    {"layer": "waterway", "extent": 4096, "feature_id": 7, "geom_type": 2,
     "props": {"class": "river", "rank": "5", "flag": "true",
               "score": "2.5", "name": "Ob {x}"},
     "geom_cmds": LINE_CMDS},
    {"layer": "waterway", "extent": 4096, "feature_id": 8, "geom_type": 1,
     "props": {"class": "stream"}, "geom_cmds": point_cmds(100, -200)},
    {"layer": "place", "extent": 4096, "feature_id": 1, "geom_type": 1,
     "props": {"neg": "-12", "noncanon": "05", "nanstr": "NaN"},
     "geom_cmds": point_cmds(0, 0)},
]


def _sorted(feats):
    return sorted(feats, key=lambda f: (f["layer"], f["feature_id"]))


def test_codec_roundtrip_identity():
    blob = encode_tile(FIXTURE)
    assert blob[:2] == b"\x1f\x8b"  # gzipped (Main.hs:384-386)
    back = decode_tile(blob)
    assert _sorted(back) == _sorted(FIXTURE)
    # decode∘encode is the identity -> encode(decode(blob)) == blob
    assert encode_tile(back) == blob


def test_gunzip_sniff_accepts_raw():
    """autoUnzip parity (Main.hs:306-308): uncompressed blobs also decode."""
    raw = encode_tile(FIXTURE, compress=False)
    assert raw[:2] != b"\x1f\x8b"
    assert _sorted(decode_tile(raw)) == _sorted(FIXTURE)
    # and manually-gzipped raw decodes identically
    assert _sorted(decode_tile(gzip.compress(raw))) == _sorted(FIXTURE)


def test_value_typing_canonical():
    """Typed Value encodings are used only when they round-trip exactly."""
    feats = [{"layer": "l", "extent": DEFAULT_EXTENT, "feature_id": 1,
              "geom_type": 1,
              "props": {"i": "12", "d": "2.5", "b": "false", "s": "x",
                        "zero_pad": "05", "trail": "5.00", "inf": "Infinity",
                        "big": str(1 << 70)},
              "geom_cmds": point_cmds(1, 1)}]
    back = decode_tile(encode_tile(feats))
    assert back[0]["props"] == feats[0]["props"]


def test_cmds_to_parts_geometry():
    assert cmds_to_parts(LINE_CMDS) == [[(2, 3), (3, 4), (5, 6)]]
    # ClosePath repeats the first point
    poly = [9, 0, 0, (2 & 7) | (2 << 3), 2, 0, 0, 2, 15]
    assert cmds_to_parts(poly) == [[(0, 0), (1, 0), (1, 1), (0, 0)]]
    # MoveTo starts a new part
    multi = point_cmds(3, 4) + point_cmds(1, 1)
    assert cmds_to_parts(multi) == [[(3, 4)], [(4, 5)]]


def test_spark_encode_decode(spark):
    rows = [(6, 10, 20, f["layer"], f["extent"], f["feature_id"],
             f["geom_type"], {1: "Point", 2: "LineString"}[f["geom_type"]],
             f["props"], f["geom_cmds"]) for f in FIXTURE]
    rows.append((6, 11, 20, "place", 4096, 99, 1, "Point",
                 {"class": "town"}, point_cmds(7, 7)))
    df = spark.createDataFrame(
        rows,
        "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>")
    tiles = encode_mvt_tiles(df)
    assert tiles.count() == 2
    blob = {(r.x, r.y): bytes(r.tile_data) for r in tiles.collect()}
    assert blob[(10, 20)][:2] == b"\x1f\x8b"
    # executor-side bytes == driver-side codec bytes (determinism)
    assert blob[(10, 20)] == encode_tile(FIXTURE)

    decoded = decode_mvt_tiles(tiles)
    got = [r.asDict() for r in decoded.collect()]
    assert len(got) == 4
    by_fid = {r["feature_id"]: r for r in got}
    assert by_fid[7]["props"] == FIXTURE[0]["props"]
    assert by_fid[7]["geom_cmds"] == LINE_CMDS
    assert by_fid[7]["geom_kind"] == "LineString"
    assert by_fid[99]["x"] == 11 and by_fid[99]["props"] == {"class": "town"}


def test_mbtiles_blob_integration(spark, tmp_path):
    """encode -> write_mbtiles -> read_mbtiles -> decode: a real mbtiles of
    real MVT blobs round-trips through the store."""
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles, write_mbtiles

    df = spark.createDataFrame(
        [(6, 10, 20, f["layer"], f["extent"], f["feature_id"],
          f["geom_type"], "Point", f["props"], f["geom_cmds"])
         for f in FIXTURE],
        "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>")
    tiles = encode_mvt_tiles(df)
    path = str(tmp_path / "t.mbtiles")
    write_mbtiles(tiles, path)
    feats = decode_mvt_tiles(read_mbtiles(spark, path))
    assert feats.count() == len(FIXTURE)
    assert {r.feature_id for r in feats.collect()} == {1, 7, 8}


def test_ring_winding_classification():
    from mapbox_filter_spark.sources.mvt import classify_polygon_parts

    # exterior: clockwise on screen (y down) per MVT 2.1 §4.3.4.4
    # square (0,0)->(10,0)->(10,10)->(0,10) closed: shoelace y-down sign +
    ext = [9, 0, 0, (2 | (3 << 3)), 20, 0, 0, 20, 19, 0, 15]
    parts = classify_polygon_parts(ext)
    assert len(parts) == 1 and parts[0][0] == "exterior"
    # reverse walk -> interior (hole)
    hole = [9, 0, 0, (2 | (3 << 3)), 0, 20, 20, 0, 0, 19, 15]
    assert classify_polygon_parts(hole)[0][0] == "interior"


def test_simplify_cmds_douglas_peucker():
    from mapbox_filter_spark.sources.mvt import cmds_to_parts, simplify_cmds

    # polyline (0,0)->(5,1)->(10,0): epsilon 2 drops the near-collinear mid
    line = [9, 0, 0, (2 | (2 << 3)), 10, 2, 10, 1]
    simp = simplify_cmds(line, epsilon=2.0)
    assert cmds_to_parts(simp) == [[(0, 0), (10, 0)]]
    # epsilon 0.1 keeps it
    assert cmds_to_parts(simplify_cmds(line, epsilon=0.1)) == \
        [[(0, 0), (5, 1), (10, 0)]]
    # closed ring stays closed; collapsing ring is dropped entirely
    ring = [9, 0, 0, (2 | (3 << 3)), 20, 0, 0, 20, 19, 0, 15]
    out = cmds_to_parts(simplify_cmds(ring, epsilon=0.5))
    assert out[0][0] == out[0][-1] and len(out[0]) == 5
    flat = [9, 0, 0, (2 | (2 << 3)), 10, 0, 10, 0, 15]  # zero-area ring
    assert simplify_cmds(flat, epsilon=1.0) == []


def test_simplify_geometry_spark(spark):
    from mapbox_filter_spark.sources.mvt import simplify_geometry

    df = spark.createDataFrame(
        [(1, [9, 0, 0, (2 | (2 << 3)), 10, 2, 10, 1])],
        "feature_id long, geom_cmds array<long>")
    out = simplify_geometry(df, epsilon=2.0).collect()
    # MoveTo(0,0) + LineTo(delta 10,0): zigzag(10) = 20
    assert out[0]["geom_cmds"] == [9, 0, 0, 10, 20, 0]


# ------------------------- property-based round-trip (hypothesis) ---------

from hypothesis import given, settings, strategies as st

_prop_val = st.one_of(
    st.text(max_size=20),
    st.integers(min_value=-(1 << 62), max_value=1 << 62).map(str),
    st.from_regex(r"-?[0-9]{1,6}\.[0-9]{1,4}", fullmatch=True),
    st.sampled_from(["true", "false", "NaN", "Infinity", "", "05", "5.00"]),
)
_feature = st.fixed_dictionaries({
    "layer": st.sampled_from(["waterway", "place", "landuse"]),
    "extent": st.just(4096),
    "feature_id": st.integers(min_value=0, max_value=1 << 40),
    "geom_type": st.integers(min_value=1, max_value=3),
    "props": st.dictionaries(st.text(min_size=1, max_size=10), _prop_val,
                             max_size=5),
    "geom_cmds": st.lists(
        st.integers(min_value=0, max_value=1 << 30), max_size=12),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(_feature, max_size=6))
def test_codec_roundtrip_property(feats):
    """decode(encode(feats)) == feats for ANY canonical-string props and any
    command stream — and encode is a fixed point (byte-identical)."""
    # distinct (layer, feature_id) so the multiset compare is keyable
    seen = set()
    uniq = []
    for i, f in enumerate(feats):
        f = dict(f, feature_id=f["feature_id"] * 10 + i)
        if (f["layer"], f["feature_id"]) in seen:
            continue
        seen.add((f["layer"], f["feature_id"]))
        uniq.append(f)
    blob = encode_tile(uniq)
    back = decode_tile(blob)
    assert _sorted(back) == _sorted(uniq)
    assert encode_tile(back) == blob


def test_mbtiles_filter_job_in_place(spark, tmp_path):
    """The reference's `filter` command end to end on a real MVT mbtiles:
    blobs decoded, style-filtered, pruned, re-encoded, updated IN PLACE;
    tiles whose every feature is filtered away are DELETED
    (Main.hs:380-386,475-484 semantics)."""
    from mapbox_filter_spark.plans.mbtiles_job import run_mbtiles_filter_job
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [{
        "id": "w", "type": "line", "source": "s", "source-layer": "waterway",
        "filter": ["==", ["string", ["get", "class"], ""], "river"],
        "layout": {"text-field": "{name}"}}]})

    def f(fid, cls, extra=None):
        props = {"class": cls, "junk": "drop-me"}
        if extra:
            props.update(extra)
        return {"layer": "waterway", "extent": 4096, "feature_id": fid,
                "geom_type": 2, "props": props, "geom_cmds": LINE_CMDS}

    rows = [
        # tile A: one river (kept), one stream (dropped)
        (6, 10, 20, f(1, "river", {"name": "Ob"})),
        (6, 10, 20, f(2, "stream")),
        # tile B: only streams -> tile becomes empty -> DELETED
        (6, 11, 20, f(3, "stream")),
        # tile C: an unstyled layer -> dropped -> DELETED
        (6, 12, 20, {"layer": "landuse", "extent": 4096, "feature_id": 4,
                     "geom_type": 3, "props": {"class": "lake"},
                     "geom_cmds": LINE_CMDS}),
    ]
    df = spark.createDataFrame(
        [(z, x, y, ft["layer"], ft["extent"], ft["feature_id"],
          ft["geom_type"], "LineString", ft["props"], ft["geom_cmds"])
         for z, x, y, ft in rows],
        "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>")
    path = str(tmp_path / "planet.mbtiles")
    from mapbox_filter_spark.sources.mvt import encode_mvt_tiles
    from mapbox_filter_spark.sources.mbtiles import write_mbtiles
    write_mbtiles(encode_mvt_tiles(df), path)

    written, deleted = run_mbtiles_filter_job(spark, path, style)
    assert (written, deleted) == (1, 2)

    back = read_mbtiles(spark, path)
    assert back.count() == 1  # only tile A survives
    feats = decode_tile(bytes(back.collect()[0]["tile_data"]))
    assert len(feats) == 1
    assert feats[0]["feature_id"] == 1
    # π: junk pruned; class (filter) + name (layout {name}) retained
    assert feats[0]["props"] == {"class": "river", "name": "Ob"}
    assert feats[0]["geom_cmds"] == LINE_CMDS  # geometry untouched


def test_shrink_cmds_reference_semantics():
    """DownCopy.hs:63-70: p' = (quadrant*extent + p) div 2 on absolute
    tile-local points, command structure preserved."""
    from mapbox_filter_spark.sources.mvt import (
        cmds_to_parts_closed, shrink_cmds, _zigzag)

    # MoveTo(10,20) LineTo(2): (110,40),(111,45); ClosePath
    cmds = [9, _zigzag(10), _zigzag(20), (2 & 7) | (2 << 3),
            _zigzag(100), _zigzag(20), _zigzag(1), _zigzag(5), 15]
    out = shrink_cmds(cmds, 1, 0, extent=4096)
    parts = cmds_to_parts_closed(out)
    assert len(parts) == 1 and parts[0][1] is True
    ring = parts[0][0]
    # (1*4096+10)//2=2053, (0+20)//2=10; abs pts (110,40),(111,45) follow
    assert ring[:3] == [(2053, 10), ((4096 + 110) // 2, 20),
                        ((4096 + 111) // 2, 45 // 2)]
    # structure preserved: same command integers at same positions
    assert out[0] == 9 and out[3] == cmds[3] and out[-1] == 15
    # negative coords floor toward -inf like Haskell div
    neg = shrink_cmds([9, _zigzag(-5), _zigzag(-7)], 0, 0)
    from mapbox_filter_spark.sources.mvt import cmds_to_parts
    assert cmds_to_parts(neg)[0][0] == (-3, -4)


def test_shrink_cmds_col_matches_python(spark):
    """Differential: the native Column fold == the Python twin on random
    multi-part streams across all four quadrants."""
    import random
    from pyspark.sql import functions as F
    from mapbox_filter_spark.operators.downcopy import shrink_cmds_col
    from mapbox_filter_spark.sources.mvt import shrink_cmds, _zigzag

    rng = random.Random(13)
    rows = []
    for i in range(40):
        cmds = []
        for _ in range(rng.randint(1, 3)):  # parts
            n = rng.randint(1, 4)
            cmds.append((1 & 7) | (1 << 3))
            cmds += [_zigzag(rng.randint(-5000, 5000)),
                     _zigzag(rng.randint(-5000, 5000))]
            if n > 1:
                cmds.append((2 & 7) | ((n - 1) << 3))
                for _ in range(n - 1):
                    cmds += [_zigzag(rng.randint(-500, 500)),
                             _zigzag(rng.randint(-500, 500))]
            if rng.random() < 0.5:
                cmds.append(15)  # ClosePath
        rows.append((i, i % 2, (i // 2) % 2, cmds))
    df = spark.createDataFrame(
        rows, "id int, dx int, dy int, cmds array<long>")
    got = df.withColumn("out", shrink_cmds_col(
        F.col("cmds"), F.col("dx"), F.col("dy"))).collect()
    for r in got:
        expect = shrink_cmds(list(r["cmds"]), r["dx"], r["dy"])
        assert list(r["out"]) == expect, (r["id"], r["cmds"])


def test_polygons_from_cmds_holes():
    from mapbox_filter_spark.sources.mvt import polygons_from_cmds, _zigzag

    def ring(pts, start):
        out = [9, _zigzag(pts[0][0] - start[0]), _zigzag(pts[0][1] - start[1])]
        out.append((2 & 7) | ((len(pts) - 1) << 3))
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            out += [_zigzag(x1 - x0), _zigzag(y1 - y0)]
        out.append(15)
        return out, pts[-1]

    # exterior CW-on-screen (positive shoelace with y-down) + interior hole
    ext_pts = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole_pts = [(2, 2), (2, 6), (6, 6), (6, 2)]
    c1, cur = ring(ext_pts, (0, 0))
    c2, _ = ring(hole_pts, cur)
    polys = polygons_from_cmds(c1 + c2)
    assert len(polys) == 1
    assert polys[0]["exterior"][0] == (0, 0)
    assert len(polys[0]["holes"]) == 1
    assert polys[0]["holes"][0][0] == (2, 2)


def test_mbtiles_filter_job_downcopy_rescales_geometry(spark, tmp_path):
    """End-to-end: mbtiles blobs -> decode -> copy_down (WITH the geometry
    rescale on tile-local geom_cmds, per-layer extent) -> re-encode ->
    in-place update.  The rebuilt dst tile's copied child geometry must sit
    in the right parent quadrant at half scale (DownCopy.hs:63-70)."""
    from mapbox_filter_spark.operators.downcopy import DownCopySpec
    from mapbox_filter_spark.plans.mbtiles_job import run_mbtiles_filter_job
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles, write_mbtiles
    from mapbox_filter_spark.sources.mvt import (
        cmds_to_parts, encode_mvt_tiles, _zigzag)
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [{
        "id": "w", "type": "line", "source": "s", "source-layer": "waterway",
        "filter": ["==", ["string", ["get", "class"], ""], "river"]}]})
    spec = DownCopySpec.from_json({
        "dst-zoom": 6, "source-layer": "waterway",
        "filter": ["==", ["string", ["get", "class"], ""], "river"]})

    # child tile (7, 21, 40): quadrant (bx,by) = (1, 0) of parent (6,10,20);
    # a 2-point line at (100,200)->(300,600), extent 512
    child_cmds = [9, _zigzag(100), _zigzag(200), 10, _zigzag(200), _zigzag(400)]
    rows = [
        (6, 10, 20, "waterway", 512, 1, 2, "LineString",
         {"class": "stream"}, [9, _zigzag(7), _zigzag(8)]),  # kept by neg
        (7, 21, 40, "waterway", 512, 11, 2, "LineString",
         {"class": "river"}, child_cmds),
    ]
    df = spark.createDataFrame(
        rows, "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>")
    path = str(tmp_path / "pyr.mbtiles")
    write_mbtiles(encode_mvt_tiles(df), path)

    run_mbtiles_filter_job(spark, path, style, downcopy=spec)
    back = {(r["z"], r["x"], r["y"]): bytes(r["tile_data"])
            for r in read_mbtiles(spark, path).collect()}
    dst = decode_tile(back[(6, 10, 20)])
    copied = [f for f in dst if f["props"].get("class") == "river"]
    assert len(copied) == 1
    # (1*512+100)//2=306, (0+200)//2=100; (1*512+300)//2=406, 600//2=300
    assert cmds_to_parts(copied[0]["geom_cmds"]) == [[(306, 100), (406, 300)]]
    # child level itself passes through untouched
    child = decode_tile(back[(7, 21, 40)])
    assert cmds_to_parts(child[0]["geom_cmds"]) == [[(100, 200), (300, 600)]]
