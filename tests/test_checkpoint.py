"""Checkpoint/resume + incremental diff (FIXTURES.md §G)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.incremental import (
    changed_only, default_tile_payload, diff_tiles, tile_content_hash,
)
from mapbox_filter_spark.plans.manifest import (
    Manifest, checkpointed_tile_job, style_run_key,
)
from mapbox_filter_spark.plans.pipeline import run_filter_job
from mapbox_filter_spark.sources.documents import synth_documents
from mapbox_filter_spark.style.model import load_style

STYLE_JSON = {
    "layers": [{"id": "w", "type": "line", "source": "s",
                "source-layer": "waterway",
                "filter": ["has", "class"]}]
}
STYLE = load_style(STYLE_JSON)


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "tiles_out")


def test_kill_and_resume(spark, outdir):
    docs = synth_documents(spark, 300, n_parts=6).cache()
    key = style_run_key(STYLE_JSON, "corpus-v1")

    killed = {"armed": True}

    def bomb(part):
        if part >= 3 and killed["armed"]:
            raise RuntimeError("injected kill")

    m1 = checkpointed_tile_job(spark, docs, STYLE, [5], outdir, key,
                               fail_injector=bomb)
    assert len(m1.completed()) == 3 and len(m1.failed()) == 3

    # resume: completed partitions must NOT recompute
    calls = []

    def spy(part):
        calls.append(part)

    killed["armed"] = False
    m2 = checkpointed_tile_job(spark, docs, STYLE, [5], outdir, key,
                               fail_injector=spy)
    assert sorted(calls) == [3, 4, 5]  # failed-first retry, completed skipped
    assert len(m2.completed()) == 6 and not m2.failed()
    # lineage metrics recorded per partition
    for p, e in m2.entries.items():
        assert e["status"] == "done" and e["tiles"] > 0 and e["rows"] > 0

    # final output equals a clean full run (same tile multiset)
    full = run_filter_job(docs, STYLE, [5])
    got = spark.read.parquet(f"{outdir}/part_id=*").select(
        "z", "x", "y", "layer", "feature_count")
    # per-partition tiling: same (tile, layer) may appear in several
    # partitions; aggregate before comparing
    got_agg = got.groupBy("z", "x", "y", "layer").agg(
        F.sum("feature_count").alias("fc"))
    full_agg = full.select("z", "x", "y", "layer", "feature_count") \
                   .groupBy("z", "x", "y", "layer").agg(
                       F.sum("feature_count").alias("fc"))
    assert sorted(map(tuple, got_agg.collect())) == sorted(map(tuple, full_agg.collect()))


def test_run_key_change_forces_full_run(spark, outdir):
    docs = synth_documents(spark, 100, n_parts=2).cache()
    k1 = style_run_key(STYLE_JSON, "corpus-v1")
    checkpointed_tile_job(spark, docs, STYLE, [5], outdir, k1)
    # style change -> different key -> fresh manifest, nothing "completed"
    k2 = style_run_key({"layers": []}, "corpus-v1")
    assert k1 != k2
    m = Manifest.load(outdir, k2)
    assert not m.completed()


def test_incremental_diff(spark):
    docs = synth_documents(spark, 400).cache()
    tiles1 = run_filter_job(docs, STYLE, [6]).cache()
    h1 = tile_content_hash(tiles1, default_tile_payload()).cache()

    # run 2: mutate ~5% of documents (drop one span's text)
    mutated = docs.withColumn(
        "spans",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0,
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.when(s["kind"] == "text", F.lit("CHANGED"))
                    .otherwise(s["text"]).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    tiles2 = run_filter_job(mutated, STYLE, [6]).cache()
    h2 = tile_content_hash(tiles2, default_tile_payload()).cache()

    d = diff_tiles(h2, h1).cache()
    counts = {r["change"]: r["n"] for r in
              d.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("unchanged", 0) > 0
    assert counts.get("changed", 0) > 0

    # golden: changed tiles == exactly the tiles containing a mutated doc
    mutated_docs = {r["doc_id"] for r in docs.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0).collect()}
    tiles_with_mutated = {
        (r["z"], r["x"], r["y"], r["layer"])
        for r in tiles1.select("z", "x", "y", "layer",
                               F.explode("features").alias("f"))
        .filter(F.col("f.doc_id").isin(list(mutated_docs))).collect()
    }
    changed = {(r["z"], r["x"], r["y"], r["layer"])
               for r in d.filter("change = 'changed'").collect()}
    assert changed == tiles_with_mutated

    # first run: everything 'new'
    d0 = diff_tiles(h1, None)
    assert d0.filter("change != 'new'").count() == 0
    assert changed_only(h2, h1).count() == counts["changed"]
