"""The multi-zoom precomputed-bodies plan must be semantically IDENTICAL to
the reference-shaped per-zoom filter (same fold, gates, failure handling)."""

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.assemble import assemble_tiles, assign_tiles
from mapbox_filter_spark.operators.style_ops import filter_keep, prune_props
from mapbox_filter_spark.plans.pipeline import run_filter_job_features
from mapbox_filter_spark.sources.documents import explode_documents, synth_documents
from mapbox_filter_spark.style.model import load_style

STYLE = load_style({
    "layers": [
        {"id": "w1", "type": "line", "source": "s", "source-layer": "waterway",
         "filter": ["==", ["get", "class"], "river"], "maxzoom": 6},
        {"id": "w2", "type": "line", "source": "s", "source-layer": "waterway",
         "filter": ["match", ["string", ["get", "brunnel"], ""],
                    ["tunnel"], True, False], "minzoom": 5},
        {"id": "p", "type": "symbol", "source": "s", "source-layer": "place",
         "minzoom": 7, "filter": ["has", "rank"]},
    ]
})


def test_optimized_plan_equals_naive(spark):
    feats = explode_documents(synth_documents(spark, 400)).cache()
    zooms = [4, 5, 6, 7, 8]

    naive = assemble_tiles(
        prune_props(filter_keep(assign_tiles(feats, zooms), STYLE), STYLE))
    fast = run_filter_job_features(feats, STYLE, zooms)

    cols = ["z", "x", "y", "layer", "feature_count"]
    a = sorted(map(tuple, naive.select(*cols).collect()))
    b = sorted(map(tuple, fast.select(*cols).collect()))
    assert a == b and len(a) > 0

    # feature-id sets per tile identical too
    def fid_sets(df):
        return {
            (r["z"], r["x"], r["y"], r["layer"]):
                tuple(f["feature_id"] for f in r["features"])
            for r in df.collect()
        }
    assert fid_sets(naive) == fid_sets(fast)
