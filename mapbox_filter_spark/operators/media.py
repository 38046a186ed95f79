"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs; the
Spark-side machinery (schemas, batch shapes, Arrow-batched UDF signatures,
partition sizing) is real and tested — the actual codecs are NOT available
in this environment, so decode kernels are stubbed two ways:

- ``decode_image_meta``: deterministic FAKE decoder (parses synthetic
  headers) so pipelines exercise end-to-end.
- ``decode_image_real``: raises NotImplementedError with the dependency
  note (PIL/libvips); the signature is the production one.

Scale notes: media bytes dominate row size, so media transforms run through
``mapInPandas`` (iterator form) to stream Arrow batches without
materializing a partition in memory; ``spark.sql.files.maxPartitionBytes``
should be lowered (64 MB) for binary-heavy tables; metadata-only operations
select away the payload column FIRST so the parquet scan never reads it
(column pruning does the rest).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("ok", T.BooleanType()),
])


def synth_media_blob(media_ref: Column, seed: int = 42) -> Column:
    """Deterministic fake media payload: 'IMG:<w>:<h>:' header + filler.

    Stands in for real bytes so decode plumbing has something to parse."""
    h = F.xxhash64(media_ref, F.lit(seed))
    w = (F.pmod(h, F.lit(1920)) + 16).cast("int")
    ht = (F.pmod(F.xxhash64(media_ref, F.lit(seed + 1)), F.lit(1080)) + 16).cast("int")
    header = F.concat_ws(":", F.lit("IMG"), w.cast("string"), ht.cast("string"))
    filler = F.repeat(F.lit("x"), (F.pmod(h, F.lit(64)) + 1).cast("int"))
    return F.concat(header, F.lit(":"), filler).cast("binary")


def media_ref_kind(media_ref: Column) -> Column:
    """Extension-based media typing of a ref/URL column."""
    ext = F.lower(F.regexp_extract(media_ref, r"\.([A-Za-z0-9]+)$", 1))
    return (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "webp"), "image")
        .when(ext.isin("mp3", "wav", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "mkv", "webm", "avi"), "video")
        .otherwise("unknown")
    )


def decode_image_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """FAKE decode: parse the synthetic header out of the binary payload in
    Arrow-batched ``mapInPandas`` (iterator form — streaming, bounded
    memory).  Production swaps `_parse` for a real codec; everything else
    (schema, batching, pruning) is the real plumbing."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [T.StructField("media_meta", MEDIA_META_SCHEMA)]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != blob_col]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[blob_col]:
                try:
                    head = bytes(b)[:32].decode("ascii", "ignore").split(":")
                    assert head[0] == "IMG"
                    metas.append(("image", int(head[1]), int(head[2]),
                                  len(b), True))
                except Exception:
                    metas.append(("unknown", None, None,
                                  len(b) if b is not None else 0, False))
            out = pdf[other_cols].copy()
            out["media_meta"] = [
                {"media_type": t, "width": w, "height": h,
                 "n_bytes": n, "ok": ok}
                for t, w, h, n, ok in metas
            ]
            yield out

    return df.mapInPandas(_parse, out_schema)


def decode_image_real(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Production image decode (PIL / libvips kernel inside mapInPandas).

    Not available in this environment — import guard by design."""
    raise NotImplementedError(
        "real image decoding requires PIL/libvips, absent from this "
        "container; use decode_image_meta (deterministic fake) for plumbing"
    )


def resize_image(df: DataFrame, width: int, height: int,
                 blob_col: str = "blob") -> DataFrame:
    """Resize plumbing (mapInPandas iterator, bounded memory): rewrites the
    synthetic 'IMG:<w>:<h>:' header to the target dims — the full Spark-side
    shape of a resize stage (schema preserved, blob column replaced).  A
    production build swaps the header rewrite for a PIL/libvips resample on
    the same batch iterator; everything around it is the real machinery."""
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prefix = f"IMG:{width}:{height}:".encode("ascii")
        out_blobs = []
        for pdf in batches:
            pdf = pdf.copy()
            def one(b):
                if b is None:
                    return None
                raw = bytes(b)
                i = raw.find(b":", raw.find(b":", raw.find(b":") + 1) + 1)
                body = raw[i + 1:] if raw[:4] == b"IMG:" and i > 0 else raw
                return prefix + body
            pdf[blob_col] = pdf[blob_col].apply(one)
            yield pdf

    return df.mapInPandas(_resize, df.schema)


def media_byte_features(df: DataFrame, blob_col: str = "blob",
                        n_bins: int = 16) -> DataFrame:
    """Feature extraction over media bytes: an L1-normalized byte-value
    histogram (n_bins buckets) as ``array<double>`` — a REAL vectorized
    numpy kernel over Arrow batches (content-sensitive, deterministic),
    standing where a learned embedding model would run; the output column
    feeds the similarity/ANN operators directly."""
    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("media_features", T.ArrayType(T.DoubleType()))])

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> (8 - n_bins.bit_length() + 1),
                                   minlength=n_bins)[:n_bins]
                feats.append((hist / max(arr.size, 1)).tolist())
            out = pdf.copy()
            out["media_features"] = feats
            yield out

    return df.mapInPandas(_feat, out_schema)


def frame_sample_refs(media_ref: Column, n_frames: int = 4) -> Column:
    """Video frame-sampling plumbing: derive per-frame refs (the shuffle/
    explode shape of frame extraction, sans codec)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.concat(media_ref, F.lit("#frame="), i.cast("string")),
    )


def caption_pairs(docs: DataFrame, spans_col: str = "spans",
                  id_col: str = "doc_id") -> DataFrame:
    """Mine (media, caption) training pairs from interleaved span documents.

    For every ``media`` span, the caption candidates are the nearest
    non-null ``text`` span BEFORE it and the nearest one AFTER it in
    document order — the LAION/img2dataset alt-text-mining shape, over the
    BASELINE input_hint's ``spans array<struct<kind,text,media_ref,
    offset>>``.  One output row per media span: ``(doc_id, media_ref,
    offset, cap_before, cap_after)``; a side with no text span is NULL.

    Scale: entirely in-row higher-order functions — the plan is a single
    Project + Generate over the document scan, ZERO shuffles, so 100 TB of
    documents mine at scan speed with perfect partition parallelism.  The
    span array is offset-sorted first (comparator ``array_sort``), so the
    operator is correct even after upstream re-assembly wrote spans in
    arbitrary order.  Per-row cost is O(s²) in the span count s (each
    media span rescans the array); for documents with huge span counts the
    fallback shape is posexplode + two IGNORE-NULLS window passes (one
    shuffle on doc_id).
    """
    spans = F.col(spans_col)
    sorted_spans = F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
                      .when(a["offset"] > b["offset"], 1).otherwise(0))

    def nearest_text(m: Column, after: bool) -> Column:
        side = F.filter(
            F.col("_sp"),
            lambda s: (s["kind"] == "text") & s["text"].isNotNull()
            & ((s["offset"] > m["offset"]) if after
               else (s["offset"] < m["offset"])))
        return F.try_element_at(side, F.lit(1 if after else -1))["text"]

    pairs = F.transform(
        F.filter(F.col("_sp"), lambda s: s["kind"] == "media"),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("offset"),
            nearest_text(m, after=False).alias("cap_before"),
            nearest_text(m, after=True).alias("cap_after"),
        ))
    return (
        docs.withColumn("_sp", sorted_spans)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.media_ref", "p.offset",
                "p.cap_before", "p.cap_after")
    )


def span_coalesce(spans_df: DataFrame, id_col: str = "doc_id",
                  spans_col: str = "spans",
                  sep: str = " ") -> DataFrame:
    """Interleave normalization: merge runs of ADJACENT text spans into
    one span (text joined by ``sep`` in offset order) while media/geo
    spans pass through untouched — the canonical pre-tokenization
    cleanup for interleaved documents (BASELINE input_hint's
    ``spans array<struct<kind,text,media_ref,offset>>``), preserving
    the span SEQUENCE invariant (kind, text, media_ref, order) for
    everything it doesn't merge.

    Gaps-and-islands on the exploded spans: a new output span starts
    wherever the current or previous span is non-text (three windows +
    one groupBy, ALL on the document key — single exchange, no
    per-row Python, no document-length limit).  Output offsets are
    renumbered densely (0..n-1 in original order) — the same contract
    tile renumbering keeps (operators/downcopy.py).

    NULL text parts inside a merged run are skipped by the join (a
    text span with NULL text contributes nothing but still glues the
    run — both engines' string_agg/concat_ws semantics).

    Returns exploded normalized spans
    ``(id, new_offset, kind, text, media_ref, n_merged)``.
    """
    from pyspark.sql import Window

    s = (spans_df.select(F.col(id_col).alias("id"),
                         F.explode(spans_col).alias("sp"))
         .select("id", F.col("sp.kind").alias("kind"),
                 F.col("sp.text").alias("text"),
                 F.col("sp.media_ref").alias("media_ref"),
                 F.col("sp.offset").alias("offset")))
    w = Window.partitionBy("id").orderBy("offset")
    prev_kind = F.lag("kind").over(w)
    brk = F.when((F.col("kind") == "text")
                 & (prev_kind == "text"), 0).otherwise(1)
    flagged = s.select("id", "kind", "text", "media_ref", "offset",
                       brk.alias("_brk"))
    w2 = (Window.partitionBy("id").orderBy("offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grouped = flagged.withColumn("_grp", F.sum("_brk").over(w2))
    parts = F.sort_array(F.collect_list(
        F.when(F.col("text").isNotNull(),
               F.struct(F.col("offset").alias("o"),
                        F.col("text").alias("t")))))
    agg = grouped.groupBy("id", "_grp").agg(
        F.min("kind").alias("kind"),          # uniform within a run
        F.min("offset").alias("_o0"),
        F.count(F.lit(1)).alias("n_merged"),
        F.min("media_ref").alias("media_ref"),
        F.array_join(F.transform(parts, lambda p: p["t"]), sep)
        .alias("_txt"),
        # singleton (non-text) runs carry their original text through
        F.min(F.struct(F.col("offset"),
                       F.col("text").alias("t")))["t"].alias("_t1"))
    text = F.when(
        F.col("kind") == "text",
        F.when(F.col("_txt") != "", F.col("_txt"))
    ).otherwise(F.col("_t1"))
    w3 = Window.partitionBy("id").orderBy("_o0")
    return (agg.withColumn("new_offset",
                           (F.row_number().over(w3) - 1).cast("int"))
            .select(F.col("id").alias(id_col), "new_offset", "kind",
                    text.alias("text"), "media_ref", "n_merged"))


def span_runs(spans_df: DataFrame, id_col: str = "doc_id",
              spans_col: str = "spans") -> DataFrame:
    """Run-length profile of the interleave pattern: how long do
    consecutive same-kind span runs get, per kind?  The diagnostic a
    multimodal curator reads before choosing packing / coalescing
    policy (e.g. "media spans arrive in bursts of 3+" vs "text is
    always singleton-interleaved").

    Gaps-and-islands over the IN-ROW span order (posexplode index —
    the input_hint's order invariant), one doc-keyed window pass, two
    map-side-combinable groupBys.  Returns
    ``(kind, run_len, n_runs, n_docs)`` — output bounded by
    |kinds|·max_run, not corpus size.
    """
    from pyspark.sql import Window

    rows = spans_df.select(
        id_col, F.posexplode(spans_col).alias("i", "s"))
    kind = F.col("s.kind")
    w = Window.partitionBy(id_col).orderBy("i")
    brk = F.when(F.lag(kind).over(w) == kind, F.lit(0)) \
        .otherwise(F.lit(1))
    runs = rows.select(id_col, F.col("i"), kind.alias("kind"),
                       brk.alias("brk"))
    grp = F.sum("brk").over(
        Window.partitionBy(id_col).orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0))
    per_run = (runs.withColumn("grp", grp)
               .groupBy(id_col, "grp")
               .agg(F.min("kind").alias("kind"),
                    F.count(F.lit(1)).alias("run_len")))
    return (per_run.groupBy("kind", "run_len")
            .agg(F.count(F.lit(1)).alias("n_runs"),
                 F.countDistinct(id_col).alias("n_docs")))


def media_context_windows(docs: DataFrame, spans_col: str = "spans",
                          id_col: str = "doc_id", *,
                          window: int = 2) -> DataFrame:
    """Context-window mining for multimodal training samples: for
    every ``media`` span, the concatenation of text spans within
    ±``window`` offsets — the "image with surrounding text" sample
    builder over the BASELINE input_hint's interleaved
    ``spans array<struct<kind,text,media_ref,offset>>``.

    Like caption_pairs, entirely in-row higher-order functions: one
    Project + Generate over the document scan, ZERO shuffles — 100 TB
    of documents mine at scan speed.  Spans are offset-sorted in-row
    first, so upstream shuffle order cannot change the concatenation
    order.  A media span with no text span in range emits NULL context
    and n_ctx = 0.

    Output: ``(doc_id, media_ref, offset, context_text, n_ctx)``.
    """
    spans = F.col(spans_col)
    sorted_spans = F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
                      .when(a["offset"] > b["offset"], 1).otherwise(0))

    def ctx(m: Column) -> Column:
        return F.filter(
            F.col("_sp"),
            lambda s: (s["kind"] == "text") & s["text"].isNotNull()
            & (F.abs(s["offset"] - m["offset"]) <= window))

    rows = F.transform(
        F.filter(F.col("_sp"), lambda s: s["kind"] == "media"),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("offset"),
            F.when(F.size(ctx(m)) > 0,
                   F.array_join(F.transform(ctx(m),
                                            lambda s: s["text"]), " "))
            .alias("context_text"),
            F.size(ctx(m)).cast("long").alias("n_ctx"),
        ))
    return (docs.withColumn("_sp", sorted_spans)
            .select(F.col(id_col), F.explode(rows).alias("p"))
            .select(id_col, "p.media_ref", "p.offset",
                    "p.context_text", "p.n_ctx"))


def interleave_profile(docs: DataFrame, spans_col: str = "spans",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document interleaving profile of a multimodal span corpus:
    span counts by kind, modality ALTERNATIONS (adjacent kind changes
    in offset order — the interleaved-ness signal), and total text
    payload — the corpus-composition report a mixing/annealing
    schedule reads.

    In-row only (sort + slice/zip_with + filter HOFs): zero shuffles
    besides the final (optional) aggregation by the caller.

    Output: ``(doc_id, n_spans, n_text, n_media, n_geo, n_switches,
    text_chars)`` — all exact int64.
    """
    spans = F.col(spans_col)
    sp = F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
                      .when(a["offset"] > b["offset"], 1).otherwise(0))

    def count_kind(k):
        return F.size(F.filter(F.col("_sp"),
                               lambda s: s["kind"] == k)).cast("long")

    n = F.size(F.col("_sp"))
    n1 = F.greatest(n - 1, F.lit(0))
    switches = F.size(F.filter(
        F.zip_with(F.slice(F.col("_sp"), 1, n1),
                   F.slice(F.col("_sp"), 2, n1),
                   lambda a, b: a["kind"] != b["kind"]),
        lambda x: x)).cast("long")
    text_chars = F.coalesce(
        F.aggregate(
            F.filter(F.col("_sp"), lambda s: s["kind"] == "text"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]),
                                            F.lit(0)).cast("long")),
        F.lit(0).cast("long"))
    return (docs.withColumn("_sp", sp)
            .select(F.col(id_col),
                    n.cast("long").alias("n_spans"),
                    count_kind("text").alias("n_text"),
                    count_kind("media").alias("n_media"),
                    count_kind("geo").alias("n_geo"),
                    switches.alias("n_switches"),
                    text_chars.alias("text_chars")))


def span_schedule(docs: DataFrame, id_col: str = "doc_id",
                  spans_col: str = "spans",
                  start_field: str = "start",
                  end_field: str = "end") -> DataFrame:
    """Maximum non-overlapping span selection per document — classic
    activity selection (greedy earliest-end, which is provably
    OPTIMAL for the max-cardinality objective): the conflict
    resolver a span-annotation pipeline runs when overlapping
    char-range annotations (NER spans, PII hits, quality flags) must
    be reduced to a consistent non-overlapping set before masking or
    extraction.

    Intervals are half-open ``[start, end)``; ties broken
    deterministically by (end, start, input index) so the selected
    set is a pure function of the multiset of intervals.  Degenerate
    spans (end <= start) are dropped before selection.

    Scale shape: ENTIRELY in-row — ``array_sort`` by the tie-break
    key then ONE ``F.aggregate`` fold carrying ``(last_end, chosen)``
    through the sorted array.  Zero shuffles, zero Python, bounded by
    the per-document span count (the input_hint's array model), so
    the operator is embarrassingly parallel at any corpus size.

    Returns exploded ``(id, rank, start, end)`` — rank 1-based in
    selection order (== ascending end among chosen).
    """
    spans = F.col(spans_col)
    iv = F.filter(
        F.transform(spans, lambda s, i: F.struct(
            s[end_field].cast("long").alias("e"),
            s[start_field].cast("long").alias("s"),
            i.cast("long").alias("i"))),
        lambda t: t["e"] > t["s"])
    key = lambda t: F.struct(t["e"].alias("e"), t["s"].alias("s"),
                             t["i"].alias("i"))
    srt = F.array_sort(iv, lambda a, b:
                       F.when(key(a) < key(b), -1)
                       .when(key(a) > key(b), 1).otherwise(0))
    chosen = F.aggregate(
        srt,
        F.struct(F.lit(None).cast("long").alias("last_e"),
                 F.array().cast(
                     "array<struct<s:long,e:long>>").alias("sel")),
        lambda acc, t: F.when(
            acc["last_e"].isNull() | (t["s"] >= acc["last_e"]),
            F.struct(
                t["e"].alias("last_e"),
                F.concat(acc["sel"], F.array(F.struct(
                    t["s"].alias("s"),
                    t["e"].alias("e")))).alias("sel"))
        ).otherwise(acc))["sel"]
    return (docs.select(F.col(id_col),
                        F.posexplode(chosen).alias("_r", "_c"))
            .select(id_col,
                    (F.col("_r") + 1).cast("int").alias("rank"),
                    F.col("_c.s").alias("start"),
                    F.col("_c.e").alias("end")))


def geo_span_path(docs: DataFrame, spans_col: str = "spans",
                  id_col: str = "doc_id",
                  scale: int = 1_000_000) -> DataFrame:
    """Per-document geometry of the GEO SPANS: order a document's
    geo-referenced spans by offset (the span-sequence invariant) and
    report the path they trace — step-summed length, first→last net
    displacement, and bbox area — the trajectory profile of an
    interleaved document (a travelogue whose geo spans wander vs a
    listing whose spans pin one place).

    Geo spans carry ``"lon,lat"`` integer payloads in ``text`` (the
    interleaved corpus convention, same parse as span_hex_cells).
    Exactness: per-step and net lengths are µ-quantized
    (floor(√d²·scale), the clark_evans discipline) so the per-doc sums
    are exact longs; bbox area is pure integer.  Docs with a single
    geo span report zeros; docs with NO geo span don't appear.

    Scale shape: one explode + one doc-keyed window (the irreducible
    span order) + one groupBy(doc) — no joins.

    Returns ``(doc_id, n_geo, path_len_micro, net_disp_micro,
    bbox_area)``.
    """
    s = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(spans_col).alias("_s"))
    g = (s.filter(F.col("_s.kind") == "geo")
         .select("_id", F.col("_s.offset").alias("_o"),
                 F.split(F.col("_s.text"), ",").getItem(0)
                 .cast("long").alias("_lon"),
                 F.split(F.col("_s.text"), ",").getItem(1)
                 .cast("long").alias("_lat")))
    from pyspark.sql import Window
    w = Window.partitionBy("_id").orderBy("_o")
    dx = F.col("_lon") - F.lag("_lon").over(w)
    dy = F.col("_lat") - F.lag("_lat").over(w)
    d2 = dx * dx + dy * dy
    step = F.when(d2.isNotNull(),
                  F.floor(F.sqrt(d2.cast("double"))
                          * F.lit(float(scale))).cast("long"))
    agg = (g.select("_id", "_o", "_lon", "_lat", step.alias("_step"))
           .groupBy(F.col("_id").alias(id_col))
           .agg(F.count(F.lit(1)).cast("long").alias("n_geo"),
                F.coalesce(F.sum("_step"), F.lit(0)).cast("long")
                .alias("path_len_micro"),
                F.min_by("_lon", "_o").alias("_lon0"),
                F.min_by("_lat", "_o").alias("_lat0"),
                F.max_by("_lon", "_o").alias("_lon1"),
                F.max_by("_lat", "_o").alias("_lat1"),
                ((F.max("_lon") - F.min("_lon"))
                 * (F.max("_lat") - F.min("_lat"))).cast("long")
                .alias("bbox_area")))
    ndx = F.col("_lon1") - F.col("_lon0")
    ndy = F.col("_lat1") - F.col("_lat0")
    nd2 = ndx * ndx + ndy * ndy
    return agg.select(
        id_col, "n_geo", "path_len_micro",
        F.floor(F.sqrt(nd2.cast("double"))
                * F.lit(float(scale))).cast("long")
        .alias("net_disp_micro"),
        "bbox_area")


def span_lcs(pairs: DataFrame, *, a_col: str = "sa", b_col: str = "sb",
             id_cols: "tuple[str, ...]" = ("doc_id",),
             max_len: int = 64) -> DataFrame:
    """Longest-common-subsequence diff between two span-signature
    sequences per row — the version-diff primitive for interleaved
    documents: given the ordered span signatures of document version A
    and version B, ``lcs`` counts the spans retained IN ORDER and

        sim = 2·lcs / (len_a + len_b)

    is the difflib-style similarity ratio (1 = identical sequence,
    0 = nothing shared).  Where ``dedup_ngram_jaccard`` measures SET
    overlap, this honors the BASELINE input_hint's span-sequence
    invariant: a reordered document scores lower than a truncated one.

    Recurrence L[i][j] = L[i−1][j−1]+1 on signature equality else
    max(L[i−1][j], L[i][j−1]) — exact integers via the same nested
    in-row HOF fold as lcss_pairs/dtw_pairs (trajectory.py), evaluated
    entirely JVM-side per row: no shuffle, no Python.  Rows are
    independent, so the operator scales linearly with the pair count;
    the per-row cost is len_a·len_b, bounded in-plan by ``max_len``
    per side (raise_error, never a silent truncation).

    ``pairs`` carries ``id_cols`` plus two array<string> columns.
    Returns ``(*id_cols, len_a, len_b, lcs, sim)``; empty sequences
    yield lcs = 0 (and sim uses the 0-guarded denominator).
    """
    sa, sb = F.col(a_col), F.col(b_col)
    na, nb = F.size(sa), F.size(sb)

    def match(i, j):
        return F.element_at(sa, i) == F.element_at(sb, j)

    empty = F.array().cast("array<long>")
    zero = F.lit(0).cast("long")
    row1 = F.aggregate(
        F.sequence(F.lit(1), nb), empty,
        lambda acc, j: F.concat(acc, F.array(
            F.greatest(
                F.when(match(F.lit(1), j), F.lit(1).cast("long"))
                .otherwise(zero),
                F.when(j == 1, zero)
                .otherwise(F.element_at(acc, j - 1))))))
    outer_idx = F.when(na >= 2, F.sequence(F.lit(2), na)) \
        .otherwise(F.array().cast("array<int>"))
    final = F.aggregate(
        outer_idx, row1,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), nb), empty,
            lambda acc, j: F.concat(acc, F.array(
                F.when(match(i, j),
                       F.when(j == 1, zero)
                       .otherwise(F.element_at(prev, j - 1)) + 1)
                .otherwise(F.greatest(
                    F.element_at(prev, j),
                    F.when(j == 1, zero)
                    .otherwise(F.element_at(acc, j - 1))))))))
    guard = F.when(
        (na > max_len) | (nb > max_len),
        F.raise_error(F.concat(
            F.lit(f"span_lcs: sequence exceeds max_len={max_len}: "),
            F.greatest(na, nb).cast("string"))).cast("long"))
    lcs = guard.when((na > 0) & (nb > 0), F.element_at(final, nb)) \
        .otherwise(zero)
    out = pairs.select(*id_cols, na.alias("len_a"), nb.alias("len_b"),
                       lcs.alias("lcs"))
    den = (F.col("len_a") + F.col("len_b"))
    return out.withColumn(
        "sim", F.when(den > 0, (F.lit(2) * F.col("lcs")).cast("double")
                      / den.cast("double")))


def span_order_drift(pairs: DataFrame, *, a_col: str = "sa",
                     b_col: str = "sb",
                     id_cols: "tuple[str, ...]" = ("doc_id",),
                     max_len: int = 64) -> DataFrame:
    """Reordering metric between two span-signature sequences per row —
    the ORDER twin of :func:`span_lcs`: where LCS measures what
    survived in order, this counts the Kendall INVERSIONS between the
    two sequences over their common signatures — how far version B
    shuffled version A's span interleaving even when every span
    survived.  ``drift = inversions / C(n_common, 2)`` is the
    normalized Kendall distance: 0 = same relative order, 1 = exactly
    reversed.

    Semantics on duplicates: each side is reduced to FIRST occurrences
    (a signature's position is its first index), so the pair set is
    well-defined; ``len_a``/``len_b`` still report the RAW sequence
    lengths.

    Exactness: positions and inversion counts are exact integers from
    in-row array folds (one O(n²) nested HOF per row, the same shape
    as span_lcs/dtw); ``drift`` is ONE long→double division.

    Shape for scale: rows are independent — no shuffle, no Python, no
    state; per-row cost bounded in-plan by ``max_len`` (raise_error,
    never silent truncation).

    Reference parity: honors the BASELINE input_hint span-sequence
    invariant (kind, text, media_ref, order) as a queryable metric; no
    counterpart in mapbox-filter (src/Mapbox/Expression.hs is pure
    style evaluation).

    Returns ``(*id_cols, len_a, len_b, n_common, n_pairs, inversions,
    drift)`` — drift NULL when fewer than 2 common signatures.
    """
    sa, sb = F.col(a_col), F.col(b_col)
    na, nb = F.size(sa), F.size(sb)
    ca = F.filter(F.array_distinct(sa),
                  lambda s: F.array_position(sb, s) > 0)
    pb = F.transform(ca, lambda s: F.array_position(sb, s))
    n = F.size(ca)
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)) \
        .otherwise(F.array().cast("array<int>"))
    inv = F.aggregate(
        idx, F.lit(0).cast("long"),
        lambda acc, j: acc + F.size(
            F.filter(F.slice(pb, 1, j - 1),
                     lambda p: p > F.element_at(pb, j))).cast("long"))
    guard = F.when(
        (na > max_len) | (nb > max_len),
        F.raise_error(F.concat(
            F.lit(f"span_order_drift: sequence exceeds "
                  f"max_len={max_len}: "),
            F.greatest(na, nb).cast("string"))).cast("long"))
    inv = guard.otherwise(inv)
    n_pairs = (n.cast("long") * (n.cast("long") - 1) / 2).cast("long")
    out = pairs.select(*id_cols, na.alias("len_a"), nb.alias("len_b"),
                       n.cast("long").alias("n_common"),
                       n_pairs.alias("n_pairs"),
                       inv.alias("inversions"))
    return out.withColumn(
        "drift", F.when(F.col("n_pairs") > 0,
                        F.col("inversions").cast("double")
                        / F.col("n_pairs").cast("double")))


def media_byte_shingles(blob: Column, *, k_bytes: int = 8,
                        stride: int = 4) -> Column:
    """Overlapping ``k_bytes``-byte windows of a binary payload at
    ``stride``-byte steps, as uppercase-hex strings — the byte-level
    analogue of word shingles, feeding the same minhash machinery.
    Blobs shorter than one window yield an empty array."""
    from .hof import bind_once

    def build(hx: Column, nb: Column) -> Column:
        # hx binds once: referenced from the per-window lambda, an
        # unbound F.hex would re-hex the whole blob per window
        last = F.floor((nb - k_bytes) / F.lit(stride)).cast("int")
        idx = F.when(nb >= k_bytes, F.sequence(F.lit(0), last)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: hx.substr(i * (stride * 2) + 1,
                                     F.lit(k_bytes * 2)))

    return bind_once({"hx": F.hex(blob), "nb": F.length(blob)}, build)


def media_near_dup(df: DataFrame, *, id_col: str = "id",
                   blob_col: str = "blob", k: int = 16, bands: int = 8,
                   k_bytes: int = 8, stride: int = 4,
                   min_matches: int = 8, max_bucket: int = 64,
                   hash_mode: str = "xxhash64") -> DataFrame:
    """Near-duplicate detection over OPAQUE binary media payloads:
    byte-shingle minhash + banded LSH + signature-agreement verify —
    the modality-blind twin of dedup_minhash_lsh for blobs no codec
    is available for (perceptual hashing needs decode; byte minhash
    catches re-uploads, truncations, and container-level copies).

    Shape: signatures in-row (one hex pass + k affine mixers over the
    shingle hashes), ONE band-key self-join with the bucket cap
    [2, max_bucket] (banded id-only buckets — the giant-bucket
    audit discipline of the text dedup family), then one signature
    join to verify candidates by exact match count ≥ ``min_matches``.
    ``hash_mode='md5'`` makes every stage DuckDB-mirrorable.

    Returns ``(id_a, id_b, matches)`` with id_a < id_b.
    """
    from .dedup import minhash_signature

    if k % bands != 0:
        raise ValueError("bands must divide k")
    rpb = k // bands
    sh = (df.select(F.col(id_col).alias("id"),
                    F.array_distinct(media_byte_shingles(
                        F.col(blob_col), k_bytes=k_bytes,
                        stride=stride)).alias("_sh"))
          .filter(F.size("_sh") > 0))
    sig = sh.select("id", minhash_signature(
        F.col("_sh"), k, hash_mode=hash_mode).alias("_sig"))
    bidx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b")
    banded = (sig.select("id", "_sig", bidx)
              .select("id", "_sig", "b",
                      F.concat(F.col("b").cast("string"), F.lit(":"),
                               F.array_join(F.slice(
                                   F.col("_sig"),
                                   F.col("b") * rpb + 1, rpb), ","))
                      .alias("_key")))
    sizes = (banded.groupBy("b", "_key")
             .agg(F.count(F.lit(1)).alias("_n"))
             .filter((F.col("_n") >= 2) & (F.col("_n") <= max_bucket)))
    inb = banded.join(sizes.select("b", "_key"), ["b", "_key"])
    cand = (inb.select("b", "_key", F.col("id").alias("id_a"))
            .join(inb.select("b", "_key", F.col("id").alias("id_b")),
                  ["b", "_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    sa = sig.select(F.col("id").alias("id_a"),
                    F.col("_sig").alias("_sa"))
    sb = sig.select(F.col("id").alias("id_b"),
                    F.col("_sig").alias("_sb"))
    matches = F.aggregate(
        F.zip_with(F.col("_sa"), F.col("_sb"),
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", matches.alias("matches"))
            .filter(F.col("matches") >= min_matches))
