"""Remaining §2.3 parity surfaces: counters, RTL stub, fs-tree->mbtiles."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.assemble import assign_tiles
from mapbox_filter_spark.operators.style_ops import rtl_transform
from mapbox_filter_spark.plans.pipeline import job_counters
from mapbox_filter_spark.plans.sink import tile_payload_json, write_tiles_fs
from mapbox_filter_spark.sources.documents import explode_documents, synth_documents
from mapbox_filter_spark.sources.mbtiles import mbtiles_from_fs_tree, read_mbtiles
from mapbox_filter_spark.style.model import load_style

STYLE = load_style({"layers": [
    {"id": "w", "type": "line", "source": "s", "source-layer": "waterway",
     "filter": ["has", "class"]}]})


def test_job_counters(spark):
    feats = assign_tiles(explode_documents(synth_documents(spark, 150)), [5])
    observed, obs = job_counters(feats, STYLE)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["total"] == feats.count()
    assert got["kept"] + got["dropped"] == got["total"]
    assert got["kept"] > 0 and got["dropped"] > 0


def test_rtl_flag(spark):
    df = spark.range(1).select(F.create_map(F.lit("k"), F.lit("v")).alias("props"))
    assert rtl_transform(df) is df  # disabled: identity, zero plan impact
    # enabled: real conversion now (test_rtl.py has the golden fixtures);
    # latin text passes through unchanged
    out = rtl_transform(df, enabled=True).collect()[0]["props"]
    assert out == {"k": "v"}


def test_fs_tree_to_mbtiles(spark, tmp_path):
    from mapbox_filter_spark.plans.pipeline import run_filter_job

    tree = str(tmp_path / "tree")
    docs = synth_documents(spark, 100)
    tiles = tile_payload_json(run_filter_job(docs, STYLE, [4]))
    n = write_tiles_fs(tiles, tree)
    mb = str(tmp_path / "built.mbtiles")
    n2 = mbtiles_from_fs_tree(tree, mb, metadata={"name": "rebuilt"})
    assert n2 == n
    back = read_mbtiles(spark, mb)
    src = {(r["z"], r["x"], r["y"]) for r in tiles.select("z", "x", "y").collect()}
    got = {(r["z"], r["x"], r["y"]) for r in back.collect()}
    assert got == src
