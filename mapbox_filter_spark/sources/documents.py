"""Interleaved text+media documents source (BASELINE.json input_hint shape).

``documents(doc_id string, part_id int, spans array<struct<kind, text,
media_ref, offset>>)`` synthesized DETERMINISTICALLY and entirely inside
Spark: ``spark.range`` + Column functions keyed on xxhash64(doc_id, i) — no
driver-side data, no Python RNG, so the same (n_docs, seed) produces the same
corpus on 1 core or 1000 executors, and generation parallelizes linearly.

``part_id`` stands in for the Iceberg partition (checkpoint/resume unit —
/root/reference/app/DbAccess.hs:165-188 job-table analogue).

``explode_documents`` is the decode-source stage (SURVEY.md §2.3): documents
-> one feature row per geo span, carrying the doc's full ordered span list so
the span-sequence invariant ``(kind, text, media_ref, order)`` can be
re-asserted after any shuffle (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "river flows under the old stone bridge near town square where market "
    "stalls line narrow streets and lanterns glow at dusk over quiet water"
).split()

_LAYERS = ("waterway", "landuse", "place", "transportation")
_CLASSES = ("river", "stream", "lake", "canal", "drain")
_BRUNNEL = ("tunnel", "bridge", "ford")
_KINDS_PATTERN = ("text", "geo", "text", "media", "geo", "text")


def _h(*cols: Column) -> Column:
    return F.xxhash64(*cols)


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    n_parts: int = 64,
    seed: int = 42,
    max_spans: int = 6,
) -> DataFrame:
    """Deterministic interleaved corpus; ~n_docs * (2 + max_spans)/2 spans."""
    base = spark.range(n_docs).select(
        F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
        F.col("id").alias("_i"),
    )
    hd = _h(F.col("doc_id"), F.lit(seed))
    n_spans = (F.pmod(hd, F.lit(max_spans - 1)) + 2).cast("int")

    def mk_span(i: Column) -> Column:
        hs = _h(F.col("doc_id"), i, F.lit(seed))
        kind = F.element_at(
            F.array(*[F.lit(k) for k in _KINDS_PATTERN]),
            (F.pmod(hs, F.lit(len(_KINDS_PATTERN))) + 1).cast("int"),
        )
        # text span: 3 deterministic words; geo span: "lon,lat" payload
        word = lambda j: F.element_at(  # noqa: E731
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(_h(hs, F.lit(j)), F.lit(len(_WORDS))) + 1).cast("int"),
        )
        lon = (F.pmod(hs, F.lit(360000)).cast("double") / 1000.0) - 180.0
        lat = (F.pmod(_h(hs, F.lit(99)), F.lit(170000)).cast("double") / 1000.0) - 85.0
        text = (
            F.when(kind == "geo",
                   F.concat_ws(",", F.round(lon, 3).cast("string"),
                               F.round(lat, 3).cast("string")))
            .when(kind == "text", F.concat_ws(" ", word(1), word(2), word(3)))
            .otherwise(F.lit(None).cast("string"))
        )
        media_ref = F.when(
            kind == "media",
            F.concat(F.lit("media://blob/"), F.hex(hs), F.lit(".jpg")),
        ).otherwise(F.lit(None).cast("string"))
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"), i.cast("int").alias("offset"),
        )

    return base.select(
        "doc_id",
        F.pmod(hd, F.lit(n_parts)).cast("int").alias("part_id"),
        F.transform(F.sequence(F.lit(0), n_spans - 1), mk_span).alias("spans"),
    )


def explode_documents(docs: DataFrame, seed: int = 42) -> DataFrame:
    """documents -> feature rows (FIXTURES.md §B shape + doc span payload).

    One row per geo span; layer/geom_kind/props derived deterministically
    from the span hash; ``spans`` column carries the FULL ordered input span
    list for the sequence invariant.
    """
    ex = docs.select(
        "doc_id", "part_id", "spans",
        F.posexplode("spans").alias("span_idx", "span"),
    ).filter(F.col("span.kind") == "geo")

    hs = _h(F.col("doc_id"), F.col("span_idx"), F.lit(seed + 1))
    parts = F.split(F.col("span.text"), ",")
    lon = F.element_at(parts, 1).cast("double")
    lat = F.element_at(parts, 2).cast("double")

    def pick(arr: tuple, h: Column) -> Column:
        return F.element_at(F.array(*[F.lit(a) for a in arr]),
                            (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))

    geom_kind = pick(("Point", "Point", "LineString", "Polygon"), _h(hs, F.lit(1)))
    layer = pick(_LAYERS, _h(hs, F.lit(2)))

    def maybe(col: Column, h: Column, miss_mod: int) -> Column:
        return F.when(F.pmod(h, F.lit(miss_mod)) != 0, col)

    entries = F.array(
        F.struct(F.lit("class").alias("key"),
                 maybe(pick(_CLASSES, _h(hs, F.lit(3))), _h(hs, F.lit(4)), 11).alias("value")),
        F.struct(F.lit("brunnel").alias("key"),
                 maybe(pick(_BRUNNEL, _h(hs, F.lit(5))), _h(hs, F.lit(6)), 7).alias("value")),
        F.struct(F.lit("name").alias("key"),
                 maybe(F.concat(F.lit("name-"), F.pmod(hs, F.lit(1000)).cast("string")),
                       _h(hs, F.lit(7)), 5).alias("value")),
        F.struct(F.lit("rank").alias("key"),
                 maybe(F.pmod(_h(hs, F.lit(8)), F.lit(9)).cast("string"),
                       _h(hs, F.lit(9)), 13).alias("value")),
        F.struct(F.lit("intermittent").alias("key"),
                 maybe(pick(("true", "false"), _h(hs, F.lit(10))),
                       _h(hs, F.lit(11)), 17).alias("value")),
    )
    props = F.map_from_entries(F.filter(entries, lambda e: e["value"].isNotNull()))

    return ex.select(
        "doc_id", "part_id", "spans",
        (F.pmod(_h(F.col("doc_id")), F.lit(10**15)) * 100
         + F.col("span_idx")).alias("feature_id"),
        layer.alias("layer"),
        geom_kind.alias("geom_kind"),
        lon.alias("lon"),
        lat.alias("lat"),
        props.alias("props"),
    )


def read_documents(
    spark: SparkSession,
    source: str,
    snapshot_id: "int | None" = None,
) -> DataFrame:
    """Load the interleaved-documents table from a catalog table or a path.

    ``source`` dispatch:

    - a dotted catalog name (``catalog.db.documents``) → ``spark.read
      .table``.  On a production cluster with an Iceberg catalog this IS
      the Iceberg read path — snapshot isolation, partition pruning on
      ``part_id``, hidden-partition/metadata pushdown all come from the
      DataSourceV2 connector with no engine change here;
      ``snapshot_id`` pins an Iceberg snapshot (time travel) when the
      connector supports the ``snapshot-id`` read option.
    - a filesystem path → (partitioned) parquet — the sandbox stand-in
      (this container carries no Iceberg runtime jar; the checkpoint/
      resume manifest emulates per-partition commit semantics, see
      plans/manifest.py).

    Either way the result is the BASELINE.json input_hint shape; every
    downstream operator is source-agnostic.
    """
    looks_like_path = ("/" in source or source.endswith(".parquet")
                      or source.startswith("file:"))
    if not looks_like_path:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.table(source)
    return spark.read.parquet(source)
