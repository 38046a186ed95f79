"""Per-source-layer filter OR-combination with failure recovery
(Filters.hs:99-114 exact fold semantics) — multi-style-layer corners."""

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.style_ops import filter_keep, filter_neg
from mapbox_filter_spark.style.model import load_style

COLS = "z int, layer string, feature_id long, geom_kind string, props map<string,string>"


def mk(spark, props, layer="waterway"):
    return spark.createDataFrame(
        [(10, layer, 1, "Point", {k: str(v) for k, v in props.items()})], COLS)


def two_layer_style(f1, f2, min2=None):
    l2 = {"id": "b", "type": "line", "source": "s", "source-layer": "waterway",
          "filter": f2}
    if min2 is not None:
        l2["minzoom"] = min2
    return load_style({"layers": [
        {"id": "a", "type": "line", "source": "s", "source-layer": "waterway",
         "filter": f1},
        l2,
    ]})


FAILS = ["==", ["get", "missing"], 1]  # failure on empty props


def kept(spark, style, props, neg=False):
    df = mk(spark, props)
    out = filter_neg(df, style) if neg else filter_keep(df, style)
    return out.count() == 1


def test_or_combination_failure_recovery(spark):
    # first filter FAILS, second is True -> combined keeps (recovery)
    assert kept(spark, two_layer_style(FAILS, True), {})
    # first True, second fails -> keeps
    assert kept(spark, two_layer_style(True, FAILS), {})
    # first fails, second False -> combined FAILS -> drop
    assert not kept(spark, two_layer_style(FAILS, False), {})
    # both False -> drop
    assert not kept(spark, two_layer_style(False, False), {})
    # second True via match, first False -> keep
    assert kept(spark, two_layer_style(False, True), {})


def test_or_combination_negated(spark):
    # negation applies to the COMBINED filter (simpleNegFilter):
    # fold tail is the FIRST style layer's raw filter (fromListWith order)
    # combined(f1=fails, f2=False) = failure -> neg = failure -> drop
    assert not kept(spark, two_layer_style(FAILS, False), {}, neg=True)
    # combined(False, False) = False -> neg keeps
    assert kept(spark, two_layer_style(False, False), {}, neg=True)
    # combined(True, anything) = True -> neg drops
    assert not kept(spark, two_layer_style(True, FAILS), {}, neg=True)
    # unmentioned layer -> neg default keeps
    df = mk(spark, {}, layer="unstyled")
    assert filter_neg(df, two_layer_style(True, True)).count() == 1
    assert filter_keep(df, two_layer_style(True, True)).count() == 0


def test_zoom_gate_changes_fold_tail(spark):
    # second layer gated out at z<min2: combined = f1 alone
    style = two_layer_style(False, True, min2=12)  # at z=10, l2 absent
    assert not kept(spark, style, {})        # f1=False, l2 gated out
    style2 = two_layer_style(FAILS, True, min2=12)
    assert not kept(spark, style2, {})       # f1 fails alone -> drop
    # at z >= minzoom the recovery arm returns
    df = spark.createDataFrame(
        [(12, "waterway", 1, "Point", {})], COLS)
    assert filter_keep(df, style2).count() == 1