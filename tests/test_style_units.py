"""Driver-side unit tests (no Spark needed for most): scraping, legacy
converter, style model, serve path."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.style.legacy import LegacyConvertError, convert_legacy_filter
from mapbox_filter_spark.style.model import load_style
from mapbox_filter_spark.style.scrape import (
    ScrapeError, deinterpolate, scrape_layer_attrs,
)


def test_deinterpolate_quirks():
    # Style.hs:64-69 incl. the unterminated-brace quirk
    assert deinterpolate("{name}") == {"name"}
    assert deinterpolate("a {x} b {y} c") == {"x", "y"}
    assert deinterpolate("no braces") == set()
    assert deinterpolate("tail {unterminated") == {"unterminated"}
    assert deinterpolate("{}") == {""}
    assert deinterpolate("{a}{b}") == {"a", "b"}


def test_scrape_layer():
    disp, filt = scrape_layer_attrs({
        "paint": {"line-color": "#00f", "line-opacity": {"property": "op", "stops": []}},
        "layout": {"text-field": "{name} ({ele}m)"},
        "filter": ["all", ["has", "cls"], ["==", ["get", "kind"], "x"]],
    })
    assert disp == {"op", "name", "ele"}
    assert filt == {"cls", "kind"}


def test_scrape_rejects_computed_get():
    with pytest.raises(ScrapeError):
        scrape_layer_attrs({"filter": ["has", ["to-string", 1]]})


def test_legacy_all_forms():
    c = convert_legacy_filter
    assert c(["has", "k"]) == ["has", "k"]
    assert c(["!has", "k"]) == ["!", ["has", "k"]]
    assert c(["==", "k", "v"]) == ["==", ["string", ["get", "k"]], "v"]
    assert c(["<=", "k", 5]) == ["<=", ["number", ["get", "k"]], 5]
    assert c(["==", "$type", "Point"]) == ["==", ["string", ["geometry-type"]], "Point"]
    assert c(["==", "$id", "7"]) == ["==", ["string", ["id"]], "7"]
    assert c(["none", ["has", "a"], ["has", "b"]]) == [
        "all", ["!", ["has", "a"]], ["!", ["has", "b"]]]
    assert c(["in", "k", "a", "b"]) == [
        "match", ["string", ["get", "k"], ""], ["a", "b"], True, False]
    assert c(["!in", "k", "a"]) == [
        "match", ["string", ["get", "k"], ""], ["a"], False, True]
    assert c(["any", ["has", "x"]]) == ["any", ["has", "x"]]
    with pytest.raises(LegacyConvertError):
        c(["bogus", "k"])
    with pytest.raises(LegacyConvertError):
        c("not-a-filter")


def test_style_merge_and_clamp():
    s1 = load_style({"layers": [
        {"id": "a", "type": "line", "source": "s", "source-layer": "l1",
         "minzoom": 14}]})
    s2 = load_style({"layers": [
        {"id": "b", "type": "raster", "source": "r"},
        {"id": "c", "type": "background"}]})
    m = s1.merge(s2)
    assert len(m.vector_layers) == 1 and m.n_raster == 1 and m.n_background == 1
    clamped = m.clamp_min_zoom(10)  # Main.hs:247-259
    assert clamped.vector_layers[0].min_zoom == 10
    assert clamped.vector_layers[0].accepts_zoom(10)


def test_serve_path(spark):
    from mapbox_filter_spark.operators.assemble import assign_tiles
    from mapbox_filter_spark.plans.serve import lookup_tile, serve_tile
    from mapbox_filter_spark.sources.documents import explode_documents, synth_documents

    style = load_style({"layers": [
        {"id": "w", "type": "line", "source": "s", "source-layer": "waterway",
         "filter": ["has", "class"]}]})
    feats = assign_tiles(explode_documents(synth_documents(spark, 150)), [5]).cache()
    some = feats.filter(F.col("layer") == "waterway").first()
    z, x, y = some["z"], some["x"], some["y"]

    raw = lookup_tile(feats, z, x, y)
    assert raw.count() >= 1
    tile = serve_tile(feats, style, z, x, y).collect()
    assert all(r["layer"] == "waterway" for r in tile)  # default-drop others
    unfiltered = serve_tile(feats, None, z, x, y).collect()
    assert sum(r["feature_count"] for r in unfiltered) == raw.count()


def test_prune_props_per_feature(spark):
    """Reference TODO (Filters.hs:30) realized: a feature keeps only the
    keys of the style layers that ACCEPT it, vs prune_props' per-source-
    layer union."""
    from pyspark.sql import functions as F

    from mapbox_filter_spark.operators.style_ops import (
        prune_props, prune_props_per_feature,
    )
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [
        {"id": "rivers", "type": "line", "source": "s",
         "source-layer": "waterway",
         "filter": ["==", ["string", ["get", "class"], ""], "river"],
         "layout": {"text-field": "{rname}"}},
        {"id": "canals", "type": "line", "source": "s",
         "source-layer": "waterway",
         "filter": ["==", ["string", ["get", "class"], ""], "canal"],
         "layout": {"text-field": "{cname}"}},
    ]})
    df = spark.createDataFrame(
        [(1, "waterway", {"class": "river", "rname": "Ob", "cname": "x",
                          "junk": "y"}),
         (2, "waterway", {"class": "canal", "rname": "a", "cname": "Erie"})],
        "feature_id long, layer string, props map<string,string>"
    ).withColumn("z", F.lit(5)).withColumn("geom_kind", F.lit("LineString"))

    union_rows = {r["feature_id"]: r["props"]
                  for r in prune_props(df, style).collect()}
    # per-source-layer union keeps both layers' keys on every feature
    assert set(union_rows[1]) == {"class", "rname", "cname"}

    pf = {r["feature_id"]: r["props"]
          for r in prune_props_per_feature(df, style).collect()}
    # per-feature: the river keeps only the rivers layer's keys, etc.
    assert set(pf[1]) == {"class", "rname"}
    assert set(pf[2]) == {"class", "cname"}


def test_convert_style_document():
    """runConversion parity (Main.hs:578-588): only layers[].filter rewritten,
    everything else byte-identical."""
    from mapbox_filter_spark.style.legacy import convert_style_document

    doc = {
        "version": 8, "name": "x",
        "layers": [
            {"id": "a", "source-layer": "water", "type": "line",
             "filter": ["in", "class", "lake", "drain"],
             "paint": {"line-color": "#00f"}},
            {"id": "b", "type": "background"},  # no filter: untouched
        ],
    }
    out = convert_style_document(doc)
    assert out["layers"][0]["filter"] == [
        "match", ["string", ["get", "class"], ""], ["lake", "drain"],
        True, False]
    assert out["layers"][0]["paint"] == {"line-color": "#00f"}
    assert out["layers"][1] == {"id": "b", "type": "background"}
    assert out["version"] == 8 and doc["layers"][0]["filter"][0] == "in"
