"""Structured Streaming surfaces.

The reference is a batch pipeline — its "incremental" is hash-diffed batch
re-runs (SURVEY.md §1.4) — so no streaming is REQUIRED for parity.  These
operators are the engine's forward-looking ingest path:

- ``incremental_tile_stream``: documents arriving as parquet files ->
  per-micro-batch σ→π→γ tiling -> hash-diff against the tile store ->
  publish only new/changed tiles.  ``foreachBatch`` gives exactly-once
  batch semantics per epoch (checkpointLocation tracks consumed files), and
  reuses the BATCH operators verbatim — one pipeline definition, two
  execution modes.
- ``windowed_event_counts``: watermarked sliding-window aggregation over an
  event stream (late data bounded by the watermark) — the standard
  streaming-agg shape on the driver ``events`` table schema.
- ``streaming_dedup_first_seen``: cross-micro-batch exact dedup — a custom
  stateful operator (``applyInPandasWithState``) with optional TTL-bounded
  state.  (``transformWithStateInPandas``, the Spark 4 successor API, is
  unavailable in this container: its streaming python runner requires
  google.protobuf, which is not installed.)
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("part_id", T.IntegerType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]))),
])


def incremental_tile_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    style,
    zooms: Sequence[int],
    checkpoint_dir: str,
    on_batch: Optional[Callable[[DataFrame, int, int], None]] = None,
):
    """Stream documents (parquet file source) into an incrementally
    maintained tile store.

    Per micro-batch: tile the batch docs, diff against stored hashes, write
    only new/changed tiles into ``store_dir/batches/<epoch>`` and update the
    hash table.  ``on_batch(changed_df, epoch, n_changed)`` is the publish
    hook (S3 put / fs write).  Returns the StreamingQuery (caller stops it).
    """
    from ..operators.incremental import (
        changed_only, default_tile_payload, tile_content_hash)
    from ..plans.pipeline import run_filter_job

    hash_dir = os.path.join(store_dir, "_hashes")

    def process(batch_docs: DataFrame, epoch: int) -> None:
        if batch_docs.isEmpty():
            return
        tiles = run_filter_job(batch_docs, style, zooms).cache()
        hashes = tile_content_hash(tiles, default_tile_payload())
        prev = None
        if os.path.exists(hash_dir):
            prev = spark.read.parquet(hash_dir)
        changed = changed_only(hashes, prev).select("z", "x", "y", "layer")
        out = tiles.join(changed, ["z", "x", "y", "layer"], "left_semi")
        n = out.count()
        out.write.mode("overwrite").parquet(
            os.path.join(store_dir, "batches", f"epoch={epoch}"))
        # upsert hash table: previous minus batch keys, plus new hashes
        if prev is not None:
            keep = prev.join(hashes.select("z", "x", "y", "layer"),
                             ["z", "x", "y", "layer"], "left_anti")
            new_hashes = keep.unionByName(hashes)
        else:
            new_hashes = hashes
        tmp = hash_dir + ".tmp"
        new_hashes.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(hash_dir)
        if on_batch is not None:
            on_batch(out, epoch, n)
        tiles.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_first_seen(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Cross-micro-batch EXACT dedup: a document is emitted only the FIRST
    time its normalized-content hash is ever seen, with one boolean of
    per-hash state in the streaming state store — the custom stateful
    operator (``applyInPandasWithState``) the training-data ingest path
    needs (batch dedup_exact's semantics, unbounded input).

    Scale: state is keyed by the 128-bit content hash (the same shuffle key
    the batch operator groups on) and holds ONE boolean per distinct
    document ever seen — the minimum possible.  At 10^12 docs even that is
    ~TBs of state, so ``state_ttl_ms`` (e.g. 30 days in ms) bounds the store with
    ProcessingTimeTimeout: a hash unseen for the TTL is evicted and a later
    duplicate re-emits — the standard freshness/size trade for streaming
    dedup.  Within a batch the min-id row wins (same survivor rule as
    dedup_exact)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import normalize_text

    keyed = docs_stream.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col))))
    out_schema = f"content_hash string, {id_col} string, {text_col} string"
    state_schema = "seen boolean"
    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms
                    else GroupStateTimeout.NoTimeout)

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # evict; a future duplicate re-emits
            return
        if state.exists:
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)  # refresh sliding TTL
            return  # hash already emitted in an earlier batch
        first = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(id_col).iloc[0]
            if first is None or cand[id_col] < first[id_col]:
                first = cand
        if first is not None:
            state.update((True,))
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            yield pd.DataFrame([{
                "content_hash": key[0],
                id_col: first[id_col],
                text_col: first[text_col],
            }])

    return (
        keyed.groupBy("content_hash")
        .applyInPandasWithState(
            dedup_fn, out_schema, state_schema, "append", timeout_conf)
    )


def rollup_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    ts: str = "ts",
    value: str,
    group: Sequence[str],
    fine_s: int,
    max_files: int = 4,
):
    """Streaming continuous aggregate: each micro-batch of events folds
    into the day-partitioned rollup partial store
    (``refresh_rollup_partial``) — the streaming face of the batch
    ``time_rollup``.  ``foreachBatch`` + checkpointLocation give
    exactly-once file consumption per epoch, which is precisely the
    append-only/exactly-once precondition the refresh operator documents;
    a crashed epoch replays its files and overwrites the same day
    partitions it wrote before (the merge input is recomputed from the
    store's pre-epoch state only if the epoch never committed — dynamic
    partition overwrite makes the rewrite idempotent at the partition
    level).  Readers at any moment see complete day partitions.

    Returns the StreamingQuery (caller awaits/stops)."""
    from ..operators.temporal import (
        refresh_rollup_partial, write_rollup_partial)

    def process(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        if not os.path.exists(store_dir):
            write_rollup_partial(batch, store_dir, ts=ts, value=value,
                                 group=list(group), fine_s=fine_s)
        else:
            refresh_rollup_partial(spark, batch, store_dir, ts=ts,
                                   value=value, group=list(group),
                                   fine_s=fine_s)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.

    Works on both a batch DataFrame and a stream (same expression)."""
    # event-time watermarks require TIMESTAMP (not NTZ); session TZ is UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n", F.round("total", 4).alias("total"),
        )
    )


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    min_quality_u: int = 500_000,
    max_dup_line_frac_u: int = 300_000,
    max_top_gram_char_frac_u: int = 200_000,
) -> DataFrame:
    """Stateless curation stage for the training-data ingest path:
    language ID, quality score, repetition signals (Gopher filters), and
    PII masking — every signal a pure Column expression, so the SAME
    function drives a batch DataFrame and a ``readStream`` source
    unchanged (no watermark, no state: row-local → trivially streamable).

    Thresholds are integer micro-units matching the operators' exact
    arithmetic.  Output: surviving rows with the text PII-masked and the
    signals attached."""
    from ..operators import text as text_ops

    c = F.col(text_col)
    rep = text_ops.repetition_features(c)
    out = (
        docs
        .withColumn("lang_pred", text_ops.lang_id(c))
        .withColumn("quality_u",
                    (text_ops.quality_score(c) * 1_000_000).cast("long"))
        .withColumn("dup_line_frac_u", rep["dup_line_frac_u"])
        .withColumn("top_gram_char_frac_u", rep["top_gram_char_frac_u"])
        # mask LAST: the signals above are computed on the original text
        .withColumn(text_col, text_ops.mask_pii(c))
    )
    return out.filter(
        (F.col("quality_u") >= min_quality_u)
        & (F.col("dup_line_frac_u") <= max_dup_line_frac_u)
        & (F.col("top_gram_char_frac_u") <= max_top_gram_char_frac_u))


def heavy_hitter_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    key: str,
    m: int,
    max_files: int = 4,
):
    """Cross-batch heavy-hitter candidate tracking: each micro-batch's
    per-partition Misra–Gries summaries fold into ONE persistent ≤ m
    counter summary (operators/sketch.py ``mg_merge`` — the mergeable-MG
    construction, so the fold is associative and the combined-stream
    guarantee holds across epochs).  The store stays O(m) forever while
    the stream is unbounded — state never grows with cardinality.

    Failure semantics, honestly: a crashed epoch replays its files and
    merges them AGAIN (foreachBatch is at-least-once into an external
    store).  For this sketch that is safe by construction — duplicate
    merging can only inflate candidate counters, never evict a true heavy
    hitter, and the final answer comes from an EXACT recount of the
    candidates (sketch.heavy_hitters pattern), which is unaffected.

    Returns the StreamingQuery (caller awaits/stops)."""
    from ..operators.sketch import mg_candidates, mg_merge

    def process(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        cand = mg_candidates(batch, key, m)
        if os.path.exists(store_dir):
            cand = cand.unionByName(spark.read.parquet(store_dir))
        merged = mg_merge(cand, key, m)
        rows = merged.collect()  # ≤ m rows — breaks the read↔overwrite cycle
        (spark.createDataFrame(rows, merged.schema)
         .coalesce(1).write.mode("overwrite").parquet(store_dir))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hex_heatmap_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    size: float,
    lon: str = "lon",
    lat: str = "lat",
    max_files: int = 4,
):
    """Streaming hex heatmap — the streaming face of the hex_assign
    binning (geo/hex.py): each micro-batch appends its per-epoch
    ``(hq, hr, n)`` COUNT partial to the store.  Counts are the
    textbook mergeable partial (SUM re-aggregates exactly), so after
    the stream drains, ``SUM(n) GROUP BY hq, hr`` over the store equals
    the batch binning row-for-row (pytest parity).  Replay safety:
    foreachBatch is at-least-once (a crash between the store write and
    the checkpoint commit replays the epoch), so each epoch OVERWRITES
    its own ``epoch=<id>`` subdirectory — the replayed partial replaces
    itself instead of double-counting, making the store idempotent
    per epoch."""
    from ..geo.hex import hex_axial

    # epoch=<id> partition dirs and legacy flat part-files cannot mix
    # (partition discovery raises "conflicting directory structures") —
    # refuse up front instead of corrupting the read path
    if os.path.isdir(store_dir) and any(
            f.endswith(".parquet") for f in os.listdir(store_dir)):
        raise ValueError(
            f"store {store_dir} holds flat parquet files (pre-epoch "
            "layout); point the stream at a fresh store directory")

    def process(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        hq, hr = hex_axial(F.col(lon), F.col(lat), size)
        (batch.select(hq.alias("hq"), hr.alias("hr"))
         .groupBy("hq", "hr")
         .agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(f"{store_dir}/epoch={epoch}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _hll_latest_epoch(store_dir: str, before: "int | None" = None):
    """Largest committed (``_SUCCESS``-marked) ``epoch=N`` subdir of the
    register store, optionally restricted to N < ``before`` (so a
    REPLAYED epoch re-reads exactly the predecessor it read the first
    time, never its own partial output)."""
    if not os.path.isdir(store_dir):
        return None
    best = None
    for name in os.listdir(store_dir):
        if not name.startswith("epoch="):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if before is not None and n >= before:
            continue
        if not os.path.exists(os.path.join(store_dir, name, "_SUCCESS")):
            continue  # partial write from a crash — ignore
        if best is None or n > best:
            best = n
    return best


def hll_store_read(spark: SparkSession, store_dir: str) -> DataFrame:
    """The drained register table: the latest committed epoch dir."""
    n = _hll_latest_epoch(store_dir)
    if n is None:
        raise FileNotFoundError(f"no committed epoch under {store_dir}")
    return spark.read.parquet(os.path.join(store_dir, f"epoch={n}"))


def hll_register_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    group_cols,
    key_cols,
    b: int = 8,
    salt: str,
    max_files: int = 4,
):
    """Streaming HyperLogLog: each micro-batch's registers
    (operators/sketch.py ``hll_registers``) MAX-merge into a persistent
    O(groups·2^b) store.  This face exists to prove the sketch's
    mergeability claim in running code: MAX is associative, commutative
    AND idempotent, so an at-least-once epoch replay merges to the SAME
    registers — the drained store is bit-identical to the batch sketch
    over the full corpus (asserted in tests/test_streaming / the
    session-5 suite).

    Crash-safety is structural, not asserted: the store is
    EPOCH-VERSIONED (``store_dir/epoch=N``, one dir per micro-batch).
    An epoch writes only its OWN directory after reading the newest
    ``_SUCCESS``-committed predecessor with M < N, so a crash mid-write
    leaves a partial uncommitted dir that every later read ignores —
    prior epochs are never deleted until their successor has committed.
    (A plain mode("overwrite") store would delete the merged history
    before the replacement commits.)

    Returns the StreamingQuery (caller awaits/stops)."""
    from ..operators.sketch import hll_registers

    g = list(group_cols)

    def process(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        regs = hll_registers(batch, g, key_cols, b=b, salt=salt)
        prev = _hll_latest_epoch(store_dir, before=epoch)
        if prev is not None:
            regs = regs.unionByName(spark.read.parquet(
                os.path.join(store_dir, f"epoch={prev}")))
        merged = regs.groupBy(*g, "bucket").agg(F.max("reg").alias("reg"))
        (merged.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(store_dir, f"epoch={epoch}")))
        # committed: retire everything older than the predecessor we
        # just merged from (crash during cleanup is harmless)
        import shutil
        for name in os.listdir(store_dir):
            if name.startswith("epoch="):
                try:
                    n = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if prev is not None and n < prev:
                    shutil.rmtree(os.path.join(store_dir, name),
                                  ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dp_release_stream(
    spark: SparkSession,
    in_dir: str,
    store_dir: str,
    release_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    key: str,
    epsilon: float,
    salt: str,
    z_max: int = 16,
    max_files: int = 4,
):
    """Streaming ε-DP histogram release — the streaming face of
    operators/privacy.py dp_histogram.  Per micro-batch: the batch's
    per-cell counts land in ``store_dir/epoch=N`` via PER-EPOCH
    partition OVERWRITE (a replayed epoch overwrites itself — counts
    never double under foreachBatch's at-least-once), then the release
    is recomputed from the SUMMED store and OVERWRITTEN whole.

    Noise determinism: every epoch's re-release draws the SAME noise per
    cell (md5-u60 of the cell, not of the epoch), so a re-released cell
    never burns budget on a FRESH draw and replays are value-stable.

    PRIVACY CAVEAT (continual observation — r6 correction of an
    overbroad earlier claim): with a fixed per-cell draw z(cell), an
    observer of SUCCESSIVE releases sees release_{t+1} − release_t =
    exact inter-epoch delta (the noise cancels), so the sequence of
    releases is ε-DP only with respect to the FINAL cumulative counts,
    NOT per-epoch increments.  Treat intermediate releases as internal;
    publish externally once (final epoch), or mix the epoch into the
    PRF input and account ε per release / use a continual-observation
    mechanism (e.g. a binary-tree counter) if per-epoch publication is
    required.  It also inherits dp_histogram's observed-key-domain
    caveat (see operators/privacy.py).

    Returns the StreamingQuery (caller awaits/stops)."""
    from ..operators.privacy import _dlap_thresholds

    if z_max < 1 or epsilon <= 0:
        raise ValueError("epsilon > 0 and z_max >= 1 required")

    def process(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        cnt = (batch.groupBy(F.col(key).alias("cell"))
               .agg(F.count(F.lit(1)).alias("n"))
               .withColumn("epoch", F.lit(epoch)))
        (cnt.coalesce(1).write.mode("overwrite")
         .partitionBy("epoch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(store_dir))
        total = (spark.read.parquet(store_dir)
                 .groupBy("cell").agg(F.sum("n").alias("_n")))
        from ..operators.splits import hash_u60

        u = hash_u60(["cell"], salt)
        z = sum((F.when(u >= F.lit(t), 1).otherwise(0)
                 for t in _dlap_thresholds(epsilon, z_max)),
                F.lit(-z_max))
        rel = total.select(
            "cell", F.greatest(F.col("_n") + z, F.lit(0))
            .alias("n_noisy"))
        rows = rel.collect()  # release is cell-cardinality-bounded
        (spark.createDataFrame(rows, rel.schema)
         .coalesce(1).write.mode("overwrite").parquet(release_dir))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
