"""End-to-end pipeline tests: tile math, style filtering, span invariant."""

import math

from pyspark.sql import functions as F

from mapbox_filter_spark.geo.tilemath import (
    MERCATOR_MAX_LAT, cell_decode, cell_encode, cell_parent,
    lat_to_tile_y, lon_to_tile_x, polyfill_bbox, quadkey, tms_y, k_ring_cells,
)
from mapbox_filter_spark.plans.pipeline import run_filter_job
from mapbox_filter_spark.sources.documents import explode_documents, synth_documents
from mapbox_filter_spark.style.model import load_style

STYLE = load_style({
    "layers": [
        {"id": "w", "type": "line", "source": "s", "source-layer": "waterway",
         "filter": ["all",
                    ["!=", ["string", ["get", "class"]], "stream"],
                    ["match", ["string", ["get", "brunnel"], ""],
                     ["tunnel", "bridge"], False, True]],
         "layout": {"text-field": "{name}"}},
        {"id": "p", "type": "symbol", "source": "s", "source-layer": "place",
         "minzoom": 6,
         "filter": ["<=", ["to-number", ["get", "rank"], 99], 5]},
    ]
})


# reference mercator math in pure python
def py_tile(lon, lat, z):
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lat = max(-MERCATOR_MAX_LAT, min(lat, MERCATOR_MAX_LAT))
    rad = math.radians(lat)
    y = int(math.floor((1.0 - math.log(math.tan(rad) + 1 / math.cos(rad)) / math.pi) / 2.0 * n))
    return max(0, min(x, n - 1)), max(0, min(y, n - 1))


def test_tile_math_matches_python(spark):
    cases = [
        (0.0, 0.0, 1), (0.0, 0.0, 10), (-180.0, 85.0, 4), (179.999, -85.0, 7),
        (14.42, 50.09, 12), (-74.0, 40.7, 15), (0.0, 89.9, 5), (0.0, -89.9, 5),
        (-180.0, -85.05112878, 3), (180.0, 85.05112878, 3),
    ]
    df = spark.createDataFrame(
        [(lon, lat, z) for lon, lat, z in cases], "lon double, lat double, z int")
    rows = df.select(
        "lon", "lat", "z",
        lon_to_tile_x("lon", "z").alias("x"),
        lat_to_tile_y("lat", "z").alias("y"),
    ).collect()
    for r in rows:
        ex, ey = py_tile(r["lon"], r["lat"], r["z"])
        assert (r["x"], r["y"]) == (ex, ey), (r["lon"], r["lat"], r["z"])


def test_tms_flip_and_cells(spark):
    df = spark.range(1).select(F.lit(5).alias("z"), F.lit(10).alias("x"), F.lit(3).alias("y"))
    r = df.select(
        tms_y("y", "z").alias("tms"),
        cell_encode("z", "x", "y").alias("cell"),
        quadkey("z", "x", "y").alias("qk"),
    ).collect()[0]
    assert r["tms"] == 32 - 3 - 1  # 2^z - y - 1 (app/Types.hs:34-38)
    z, x, y = cell_decode(F.lit(r["cell"]))
    back = spark.range(1).select(z.alias("z"), x.alias("x"), y.alias("y")).collect()[0]
    assert (back["z"], back["x"], back["y"]) == (5, 10, 3)
    # quadkey for z=5,x=10,y=3: interleave bits
    qk = ""
    for i in range(4, -1, -1):
        qk += str(2 * ((3 >> i) & 1) + ((10 >> i) & 1))
    assert r["qk"] == qk
    parent = spark.range(1).select(cell_parent(F.lit(r["cell"])).alias("p")).collect()[0]["p"]
    pz, px, py = cell_decode(F.lit(parent))
    pr = spark.range(1).select(pz.alias("z"), px.alias("x"), py.alias("y")).collect()[0]
    assert (pr["z"], pr["x"], pr["y"]) == (4, 5, 1)


def test_polyfill_and_kring(spark):
    r = spark.range(1).select(
        polyfill_bbox(F.lit(10.0), F.lit(45.0), F.lit(12.0), F.lit(47.0), 8).alias("cells"),
        k_ring_cells(cell_encode(F.lit(8), F.lit(0), F.lit(5)), 1).alias("ring"),
    ).collect()[0]
    x0, y0 = py_tile(10.0, 47.0, 8)
    x1, y1 = py_tile(12.0, 45.0, 8)
    assert len(r["cells"]) == (x1 - x0 + 1) * (y1 - y0 + 1)
    # edge clamp: x=0 -> only 6 neighbors of 9
    assert len(r["ring"]) == 6


def test_synth_documents_deterministic(spark):
    d1 = synth_documents(spark, 200).orderBy("doc_id").collect()
    d2 = synth_documents(spark, 200).orderBy("doc_id").collect()
    assert d1 == d2
    # offsets strictly increasing per doc
    for row in d1[:50]:
        offs = [s["offset"] for s in row["spans"]]
        assert offs == sorted(offs) == list(range(len(offs)))
    kinds = {s["kind"] for row in d1 for s in row["spans"]}
    assert kinds == {"text", "geo", "media"}


def test_pipeline_end_to_end_and_span_invariant(spark):
    docs = synth_documents(spark, 300)
    tiles = run_filter_job(docs, STYLE, zooms=[4, 6]).cache()
    assert tiles.count() > 0
    # only styled source-layers survive (default-drop, Filters.hs:40-43)
    layers = {r["layer"] for r in tiles.select("layer").distinct().collect()}
    assert layers <= {"waterway", "place"}
    # place has minzoom 6 -> absent at z=4
    z4 = {r["layer"] for r in tiles.filter("z=4").select("layer").distinct().collect()}
    assert "place" not in z4
    # no empty tiles (Filters.hs:68-71)
    assert tiles.filter("feature_count = 0").count() == 0

    # span-sequence invariant: each surviving feature's span list equals the
    # input doc's spans ordered by offset, field-for-field
    input_spans = {r["doc_id"]: r["spans"] for r in docs.collect()}
    out = tiles.select(F.explode("features").alias("f")).select("f.doc_id", "f.spans").collect()
    assert out, "no features"
    for r in out:
        expect = sorted(input_spans[r["doc_id"]], key=lambda s: s["offset"])
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expect]
        assert got == want

    # metadata pruning: only styled keys survive
    keys = {
        k
        for r in tiles.select(F.explode("features").alias("f")).select("f.props").collect()
        for k in r["props"]
    }
    assert keys <= {"class", "brunnel", "name", "rank"}
    # features sorted by feature_id within tile
    for r in tiles.select("features").collect():
        ids = [f["feature_id"] for f in r["features"]]
        assert ids == sorted(ids)


def test_keep_neg_partition(spark):
    """keep + neg partition the feature set exactly (σ and ¬σ)."""
    from mapbox_filter_spark.operators.style_ops import filter_keep, filter_neg
    from mapbox_filter_spark.operators.assemble import assign_tiles

    docs = synth_documents(spark, 200)
    feats = assign_tiles(explode_documents(docs), zooms=[6]).cache()
    total = feats.count()
    kept = filter_keep(feats, STYLE).count()
    neg = filter_neg(feats, STYLE).count()
    styled = feats.filter(F.col("layer").isin("waterway", "place")).count()
    unstyled = total - styled
    assert kept > 0 and neg > 0 and styled > 0
    # unstyled layers: dropped by keep (default False), kept by neg (default True)
    assert kept <= styled
    assert neg >= unstyled
    # styled rows split into kept / neg-kept / failed-both (failure drops
    # a feature from BOTH σ and ¬σ — Maybe-monad semantics)
    neg_styled = neg - unstyled
    assert 0 <= neg_styled and kept + neg_styled <= styled


def test_read_documents_dispatch(spark, tmp_path):
    """read_documents loads a catalog table name through the session
    catalog and a filesystem path through parquet — same rows."""
    from mapbox_filter_spark.sources.documents import (
        read_documents, synth_documents)

    path = str(tmp_path / "docs_pq")
    docs = synth_documents(spark, 50)
    docs.write.parquet(path)
    docs.createOrReplaceTempView("docs_catalog_view")

    via_table = read_documents(spark, "docs_catalog_view")
    via_path = read_documents(spark, path)
    assert via_table.count() == via_path.count() == 50
    assert set(via_table.columns) == set(via_path.columns)
