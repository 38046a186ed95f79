"""Attribute-mirror binding (r6 optimization): compiled get()/has() over
flat mirror columns must be row-for-row identical to the map path on any
schema honouring the mirror contract (p_<k> == props[k], non-null iff
present) — pinned here on the real feature substrate and on a synthetic
frame with missing keys."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.style_ops import (
    filter_keep, mirror_feature_cols, _literal_meta_keys)
from mapbox_filter_spark.queries import README_STYLE, ZOOMGATE_STYLE
from mapbox_filter_spark.sources.features import features_from_lineitem
from mapbox_filter_spark.style.compile import FeatureCols, compile_filter, finalize_predicate

SF_DIR = "/root/testdata/sf0.001"


def test_scrape_literal_keys():
    keys = set()
    for l in README_STYLE.vector_layers:
        keys |= _literal_meta_keys(l.filter_typed)
    assert keys == {"class", "brunnel"}


def test_mirror_cols_bind_only_existing(spark):
    feats = features_from_lineitem(spark, SF_DIR)
    cols = mirror_feature_cols(README_STYLE, feats.columns)
    assert dict(cols.attr_mirrors) == {"class": "p_class",
                                       "brunnel": "p_brunnel"}
    # columns without mirrors -> no binding
    assert mirror_feature_cols(README_STYLE, ["layer", "props"]) \
        .attr_mirrors == ()


@pytest.mark.parametrize("style", [README_STYLE, ZOOMGATE_STYLE])
def test_mirror_path_equals_map_path(spark, style):
    feats = features_from_lineitem(spark, SF_DIR).withColumn("z", F.lit(10))
    cols = mirror_feature_cols(style, feats.columns)
    assert cols.attr_mirrors  # substrate carries the mirrors
    a = sorted(r[0] for r in
               filter_keep(feats, style).select("feature_id").collect())
    b = sorted(r[0] for r in
               filter_keep(feats, style, cols=cols)
               .select("feature_id").collect())
    assert a == b and len(a) > 0


def test_mirror_has_and_missing_keys(spark):
    df = spark.createDataFrame(
        [(1, {"k": "v"}, "v"), (2, {}, None), (3, {"o": "x"}, None)],
        "id long, props map<string,string>, p_k string")
    pred_map = finalize_predicate(compile_filter(["has", "k"]))
    cols = FeatureCols(attr_mirrors=(("k", "p_k"),))
    pred_mir = finalize_predicate(compile_filter(["has", "k"], cols=cols))
    a = sorted(r[0] for r in df.filter(pred_map).select("id").collect())
    b = sorted(r[0] for r in df.filter(pred_mir).select("id").collect())
    assert a == b == [1]
    # get() through the mirror: equality + missing-key failure semantics
    g_map = finalize_predicate(compile_filter(["==", ["get", "k"], "v"]))
    g_mir = finalize_predicate(
        compile_filter(["==", ["get", "k"], "v"], cols=cols))
    assert (sorted(r[0] for r in df.filter(g_map).select("id").collect())
            == sorted(r[0] for r in df.filter(g_mir).select("id").collect())
            == [1])
