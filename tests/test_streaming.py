"""Structured Streaming: incremental tile maintenance + windowed aggs."""

import os

from pyspark.sql import functions as F

from mapbox_filter_spark.sources.documents import synth_documents
from mapbox_filter_spark.streaming.incremental import (
    incremental_tile_stream, windowed_event_counts,
)
from mapbox_filter_spark.style.model import load_style

STYLE = load_style({
    "layers": [{"id": "w", "type": "line", "source": "s",
                "source-layer": "waterway", "filter": ["has", "class"]}]
})


def test_incremental_tile_stream(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    docs = synth_documents(spark, 150).cache()
    # first drop of files
    docs.filter(F.col("part_id") < 32).write.mode("overwrite").parquet(in_dir)

    seen = []
    q = incremental_tile_stream(
        spark, in_dir, store, STYLE, [5], ckpt,
        on_batch=lambda df, epoch, n: seen.append((epoch, n)))
    q.awaitTermination(120)
    assert seen and sum(n for _, n in seen) > 0
    first_total = sum(n for _, n in seen)

    # second drop: same docs again (duplicate content) + some new ones
    docs.filter(F.col("part_id") < 32).write.mode("append").parquet(in_dir)
    seen2 = []
    q2 = incremental_tile_stream(
        spark, in_dir, store, STYLE, [5], ckpt,
        on_batch=lambda df, epoch, n: seen2.append((epoch, n)))
    q2.awaitTermination(120)
    # identical content -> hash-diff suppresses (nearly) all republish
    assert sum(n for _, n in seen2) < first_total * 0.2

    # hash table exists and batches written
    assert os.path.exists(os.path.join(store, "_hashes"))


def test_windowed_event_counts_batch_and_stream(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    batch = windowed_event_counts(ev).cache()
    assert batch.count() > 0
    total = batch.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()

    # same expression as a real stream (memory sink, availableNow);
    # file-stream sources need a directory
    ev_dir = str(tmp_path / "events_in")
    ev.write.mode("overwrite").parquet(ev_dir)
    stream = spark.readStream.schema(ev.schema).parquet(ev_dir)
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("wincounts")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) FROM wincounts").collect()[0][0]
    # append mode emits only watermark-closed windows; with availableNow all
    # file data is consumed, final watermark closes all-but-latest windows
    assert got is None or got <= total


def test_streaming_dedup_first_seen(spark, tmp_path):
    """Cross-batch stateful dedup (applyInPandasWithState): a later batch's
    duplicate of an earlier batch's content is suppressed by state; new
    content passes; within a batch the min-id row survives."""
    from mapbox_filter_spark.streaming.incremental import (
        streaming_dedup_first_seen,
    )

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)
    schema = "doc_id string, text string"

    # batch 1: two distinct texts + an in-batch duplicate with higher id
    spark.createDataFrame(
        [("a1", "alpha text"), ("a9", "Alpha   TEXT"), ("b1", "beta text")],
        schema).coalesce(1).write.parquet(f"{in_dir}/f1")
    # batch 2: duplicate of alpha (cross-batch) + one new text
    spark.createDataFrame(
        [("c1", "ALPHA text"), ("d1", "delta text")],
        schema).coalesce(1).write.parquet(f"{in_dir}/f2")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{in_dir}/f*"))
    q = (streaming_dedup_first_seen(stream)
         .writeStream.format("memory").queryName("dedup_sink")
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r["doc_id"]: r["text"] for r in
            spark.sql("select * from dedup_sink").collect()}
    # alpha survives once with the min id of its FIRST batch; beta + delta
    # pass; c1 (cross-batch dup) suppressed by state
    assert set(rows) == {"a1", "b1", "d1"}
    assert rows["a1"] == "alpha text"


def test_streaming_dedup_with_ttl(spark, tmp_path):
    """TTL-bounded state: with a long TTL the dedup semantics are unchanged
    across batches (the TTL path exercises ProcessingTimeTimeout wiring:
    set/refresh on first-seen and on suppressed duplicates)."""
    from mapbox_filter_spark.streaming.incremental import (
        streaming_dedup_first_seen,
    )

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)
    schema = "doc_id string, text string"
    spark.createDataFrame([("a1", "same text")], schema) \
        .coalesce(1).write.parquet(f"{in_dir}/f1")
    spark.createDataFrame([("b1", "same text"), ("c1", "other")], schema) \
        .coalesce(1).write.parquet(f"{in_dir}/f2")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{in_dir}/f*"))
    q = (streaming_dedup_first_seen(stream, state_ttl_ms=3_600_000)
         .writeStream.format("memory").queryName("ttl_sink")
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("select * from ttl_sink").collect()}
    assert got == {"a1", "c1"}  # b1 suppressed within the TTL window


def test_curate_documents_batch_stream_parity(spark, tmp_path):
    """The stateless curation stage must yield identical rows whether it
    runs over a batch read or a file-source stream of the same parquet."""
    import os

    from mapbox_filter_spark.streaming.incremental import curate_documents

    src = str(tmp_path / "docs_in")
    rows = [
        (1, "the cat sat on the mat and that is that here today now ok"),
        (2, "spam spam\nspam spam\nspam spam\nspam spam"),   # repetitive
        (3, "reach me at alice@example.com for the report of the year"),
        (4, "?!?!;;;:::!!!"),                                # punct soup
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(2).write.parquet(src)

    # short doc 3's longest 2-gram ("alice@example.com for") is ~37% of its
    # chars — a top-gram threshold tuned for long documents would cut it,
    # so the test uses 40% (the signals are exact; thresholds are policy)
    def curate(df):
        return curate_documents(df, max_top_gram_char_frac_u=400_000)

    batch = curate(spark.read.parquet(src))
    got_batch = sorted(tuple(r) for r in batch.collect())

    schema = spark.read.parquet(src).schema
    stream = curate(spark.readStream.schema(schema).parquet(src))
    q = (stream.writeStream.format("memory").queryName("curated")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_stream = sorted(tuple(r) for r in spark.sql(
        "select * from curated").collect())

    assert got_batch == got_stream
    ids = {r[0] for r in got_batch}
    assert 1 in ids and 3 in ids          # clean docs survive
    assert 2 not in ids and 4 not in ids  # repetitive + too-short dropped
    masked = next(r for r in got_batch if r[0] == 3)[1]
    assert "<EMAIL>" in masked and "alice@example.com" not in masked


def test_streamed_curation_matches_gate_oracle(spark, tmp_path):
    """VERDICT r3 item 9: run the curation_pipeline GATE flow as a stream
    (foreachBatch over dedup-key-disjoint micro-batches) and compare the
    accumulated output against the SAME DuckDB SQL oracle the driver gate
    uses — row count, schema, and value multiset."""
    import duckdb

    from mapbox_filter_spark.queries_ext import (
        curation_stage, sql_curation_pipeline)

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # files partitioned BY THE DEDUP KEY (normalized-text hash): each
    # micro-batch then holds whole duplicate groups, so per-batch min-id
    # dedup equals global dedup — the hash-partitioned 100 TB shape
    src = str(tmp_path / "docs_by_key")
    key = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    docs.repartition(4, key).write.parquet(src)

    out = str(tmp_path / "curated_acc")
    epochs = []

    def process(batch_df, epoch):
        epochs.append(epoch)
        curation_stage(batch_df).write.mode("append").parquet(out)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert len(epochs) >= 2  # genuinely incremental, not one big batch

    sdf = spark.read.parquet(out)
    srows = sorted(
        (r["doc_id"], r["lang_pred"], round(r["quality"], 6), r["tokens_ws"])
        for r in sdf.collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    res = con.execute(sql_curation_pipeline())
    ocols = [d[0] for d in res.description]
    orows = sorted((r[0], r[1], round(r[2], 6), r[3]) for r in res.fetchall())
    assert sorted(sdf.columns) == sorted(ocols)
    assert srows == orows


def test_rollup_stream_matches_batch(spark, tmp_path):
    """Streamed continuous aggregate == batch time_rollup: events arrive
    as 6 parquet files in micro-batches of 2; after the stream drains,
    the day-partitioned partial store rolls up to exactly the batch
    answer (same-day buckets merged across epochs)."""
    from pyspark.sql import functions as F

    from mapbox_filter_spark.operators.temporal import (
        read_rollup_partial, rollup_from_partial, time_rollup)
    from mapbox_filter_spark.streaming.incremental import rollup_stream

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("value_c",
                      F.round(F.col("value") * 100, 0).cast("long"))
          .select("event_id", "ts", "event_type", "value_c"))
    in_dir = str(tmp_path / "in")
    # 6 files split by event_id residue: every file spans the whole time
    # range, so every epoch touches the same days -> merge path exercised
    for i in range(6):
        ev.filter(F.pmod("event_id", F.lit(6)) == i) \
            .coalesce(1).write.mode("append").parquet(in_dir)

    store = str(tmp_path / "store")
    q = rollup_stream(
        spark, in_dir, store, str(tmp_path / "ckpt"),
        schema=ev.schema, value="value_c", group=["event_type"],
        fine_s=3600, max_files=2)
    q.awaitTermination(120)

    got = rollup_from_partial(read_rollup_partial(spark, store),
                              group=["event_type"],
                              grains_s=[3600, 86400])
    want = time_rollup(ev, value="value_c", group=["event_type"],
                       grains_s=[3600, 86400], reuse_partials=False)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_heavy_hitter_stream_matches_batch(spark, tmp_path):
    """Micro-batched MG folding: after streaming the corpus in epochs, an
    exact recount of the persisted O(m) candidate store returns the SAME
    heavy-hitter set as the batch detector on the full corpus."""
    from mapbox_filter_spark.operators.sketch import heavy_hitters
    from mapbox_filter_spark.streaming.incremental import heavy_hitter_stream

    df = spark.range(20000).select(
        F.floor(F.sqrt(F.pmod(F.col("id") * 7919, F.lit(1024))))
        .alias("key"))
    src = str(tmp_path / "src")
    df.repartition(6).write.parquet(src)  # arbitrary file placement

    store = str(tmp_path / "store")
    q = heavy_hitter_stream(
        spark, src, store, str(tmp_path / "ckpt"),
        schema=df.schema, key="key", m=32, max_files=2)
    q.awaitTermination(120)

    cand = spark.read.parquet(store)
    assert cand.count() <= 32
    recount = (df.join(F.broadcast(cand.select("key")), "key", "left_semi")
               .groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
               .filter(F.col("cnt") >= 800))
    batch = heavy_hitters(df, "key", min_count=800)
    got = {(r["key"], r["cnt"]) for r in recount.collect()}
    want = {(r["key"], r["cnt"]) for r in batch.collect()}
    assert got == want
    assert want  # non-vacuous


def test_hex_heatmap_stream_matches_batch(spark, tmp_path):
    """Streamed hex binning == batch hex_assign: points arrive as 5
    parquet files in micro-batches of 2; each epoch appends a count
    partial, and the drained store re-aggregates to exactly the batch
    cell counts (every epoch hits overlapping cells -> merge-by-SUM
    path exercised, not just concatenation)."""
    import random

    from pyspark.sql import functions as F

    from mapbox_filter_spark.geo.hex import hex_axial
    from mapbox_filter_spark.streaming.incremental import hex_heatmap_stream

    rng = random.Random(31)
    rows = [(i, rng.uniform(-170.0, 170.0), rng.uniform(-80.0, 80.0))
            for i in range(2000)]
    pts = spark.createDataFrame(rows, "id long, lon double, lat double")
    in_dir = str(tmp_path / "in")
    for i in range(5):
        pts.filter(F.pmod("id", F.lit(5)) == i) \
            .coalesce(1).write.mode("append").parquet(in_dir)

    store = str(tmp_path / "store")
    size = 1.0 / 32.0
    q = hex_heatmap_stream(
        spark, in_dir, store, str(tmp_path / "ckpt"),
        schema=pts.schema, size=size, max_files=2)
    q.awaitTermination(120)

    got = (spark.read.parquet(store)
           .groupBy("hq", "hr").agg(F.sum("n").alias("n")))
    hq, hr = hex_axial(F.col("lon"), F.col("lat"), size)
    want = (pts.select(hq.alias("hq"), hr.alias("hr"))
            .groupBy("hq", "hr").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the merge path was real: more partial rows than final cells
    assert spark.read.parquet(store).count() > want.count()


def test_streaming_dp_release_batch_parity(spark, tmp_path):
    """Streaming face of dp_histogram: the post-stream release equals
    the batch release over the union of all files (keyed-PRF noise is
    epoch-independent), and re-running the release loop leaves it
    byte-stable."""
    from mapbox_filter_spark.operators.privacy import dp_histogram
    from mapbox_filter_spark.streaming.incremental import (
        dp_release_stream,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    schema = "cell string, v long"
    rows1 = [(f"c{i % 7}", i) for i in range(200)]
    rows2 = [(f"c{i % 5}", i) for i in range(150)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.parquet(f"{in_dir}/f1")
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.parquet(f"{in_dir}/f2")

    store = str(tmp_path / "store")
    release = str(tmp_path / "release")
    q = dp_release_stream(
        spark, f"{in_dir}/f*", store, release,
        str(tmp_path / "ck"),
        schema=spark.createDataFrame([], schema).schema,
        key="cell", epsilon=0.5, salt="sdp", max_files=1)
    q.awaitTermination(120)

    got = {r["cell"]: r["n_noisy"]
           for r in spark.read.parquet(release).collect()}
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {r["cell"]: r["n_noisy"]
            for r in dp_histogram(batch, ["cell"], epsilon=0.5,
                                  salt="sdp").collect()}
    assert got == want

    # re-ingesting the whole input into a FRESH store + checkpoint
    # (different epoch slicing: 2 files per batch) re-derives the
    # identical release — the noise is keyed by cell, never by epoch
    q2 = dp_release_stream(
        spark, f"{in_dir}/f*", str(tmp_path / "store2"), release,
        str(tmp_path / "ck2"),
        schema=spark.createDataFrame([], schema).schema,
        key="cell", epsilon=0.5, salt="sdp", max_files=2)
    q2.awaitTermination(120)
    again = {r["cell"]: r["n_noisy"]
             for r in spark.read.parquet(release).collect()}
    assert again == want
