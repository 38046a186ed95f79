"""caption_pairs (operators/media.py): nearest-text mining over the
interleaved span array — edges, order-robustness, zero-shuffle plan."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapbox_filter_spark.operators.media import caption_pairs

SPAN = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])
SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("spans", T.ArrayType(SPAN)),
])


def _t(text, off):
    return ("text", text, None, off)


def _m(ref, off):
    return ("media", None, ref, off)


def _g(off):
    return ("geo", "1,2", None, off)


def _mine(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["doc_id"], r["media_ref"]):
            (r["offset"], r["cap_before"], r["cap_after"])
            for r in caption_pairs(df).collect()}


def test_before_and_after(spark):
    got = _mine(spark, [(1, [_t("a", 0), _m("m1", 1), _t("b", 2)])])
    assert got == {(1, "m1"): (1, "a", "b")}


def test_missing_sides_and_geo_skipped(spark):
    got = _mine(spark, [
        (1, [_m("lead", 0), _t("x", 1)]),        # no text before
        (2, [_t("y", 0), _g(1), _m("tail", 2)]),  # geo span is not a caption
        (3, [_m("bare", 0)]),                     # no captions at all
    ])
    assert got[(1, "lead")] == (0, None, "x")
    assert got[(2, "tail")] == (2, "y", None)
    assert got[(3, "bare")] == (0, None, None)


def test_nearest_wins_and_multi_media(spark):
    got = _mine(spark, [(1, [_t("far", 0), _t("near", 1), _m("m1", 2),
                             _m("m2", 3), _t("after", 4)])])
    assert got[(1, "m1")] == (2, "near", "after")
    assert got[(1, "m2")] == (3, "near", "after")


def test_unordered_span_array(spark):
    """Spans written in arbitrary array order still mine by offset."""
    ordered = [(1, [_t("a", 0), _m("m", 1), _t("b", 2)])]
    shuffled = [(1, [_t("b", 2), _m("m", 1), _t("a", 0)])]
    assert _mine(spark, ordered) == _mine(spark, shuffled)


def test_null_text_span_skipped(spark):
    got = _mine(spark, [(1, [_t(None, 0), _t("real", 1), _m("m", 2)])])
    assert got[(1, "m")] == (2, "real", None)


def test_docs_without_media_dropped(spark):
    got = _mine(spark, [(1, [_t("a", 0), _t("b", 1)]),
                        (2, [_t("c", 0), _m("m", 1)])])
    assert set(d for d, _ in got) == {2}


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, [_t("a", 0), _m("m", 1)])], SCHEMA)
    plan = caption_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
