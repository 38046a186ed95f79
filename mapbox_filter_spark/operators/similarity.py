"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k — exact baseline; dot products are a
  native ``aggregate``/``zip_with`` fold (JVM, no UDF), the k-selection a
  window.  O(|queries| x |corpus|): the small-scale oracle and the verifier
  for the ANN path.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing — the scale path.
  Corpus is bucketed once (b buckets x h hyperplanes, deterministic seeded
  planes); a query probes only its own bucket per table.  Recall tunable via
  (tables, hyperplanes); verified against brute force on fixtures.
- ``embedding_near_dup``: cosine-similarity near-duplicate pairs via the
  same LSH buckets.

At 100 TB the corpus side is hash-partitioned by bucket id, the query side
broadcast — no corpus shuffle per query batch.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, vec_id, sim)."""
    q = queries.select(F.col(query_id).alias("q_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(corpus_id).alias("c_id"),
                      F.col(vec_col).alias("c_vec"))
    sim = cosine(F.col("q_vec"), F.col("c_vec"))
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    return (
        F.broadcast(q).crossJoin(c)
        .withColumn("sim", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias(query_id), "rank",
                F.col("c_id").alias(corpus_id), "sim")
    )


def dist2(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def ivf_assign_arrow(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 1,
) -> DataFrame:
    """BLAS-batched coarse assignment — the WIDE-embedding kernel.

    The Column-fold path (``ivf_assign``, kernel='column') is interpreted
    per element: ~15 ns/multiply-add, linear in dim x K — fine at
    dim 8 x K 16 (the gate shape), ~11 ms/row/core at a production
    dim 768 x K 1000.  Arrays of floats against a small dense matrix is
    exactly the kernel BLAS exists for, so this path mirrors the PIP
    precedent (SCALE.md Python-boundary policy): centroids — small by
    construction — are collected once and closed over as a numpy matrix;
    each Arrow batch computes ``D2 = |x|^2 - 2 X C^T + |c|^2`` and takes
    argmin (or the stable-sorted top-``n_lists``).  Corpus-side plan is
    identical to the fold path: one ArrowEvalPython map, NO shuffle, NO
    explosion beyond n_lists.

    Parity: tie-breaking matches the fold (min d2, then cent_id — stable
    argsort over cent_id-ordered centroids); floating-point association
    differs (matmul vs sequential fold), so EXACT equality holds for
    exactly-representable inputs (tested) while near-ties may order
    differently at 1-ulp distances — irrelevant to an ANN contract."""
    import numpy as np
    from pyspark.sql.types import StructField, StructType

    cents = centroids.orderBy("cent_id").collect()
    ids = np.array([r["cent_id"] for r in cents], dtype=np.int64)
    C = np.array([list(r["cent_vec"]) for r in cents], dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    # Preserve the centroid table's id type (the column kernel does the
    # same): hardcoding IntegerType would silently wrap cent_ids > 2^31
    # under the default convertToArrowArraySafely=false, and the two
    # kernels would disagree on output schema (round-3 ADVICE).
    cent_id_type = centroids.schema["cent_id"].dataType
    out_schema = StructType(
        list(vectors.schema.fields) + [StructField("cent_id", cent_id_type)])
    # argsort's [:, :k] clamps at the column count, but index.repeat does
    # not — with n_lists > len(ids) the two lengths diverge and pandas
    # raises.  Clamp the probe count to the centroid count (column kernel
    # degrades the same way).
    k_probe = min(n_lists, len(ids))

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
            if k_probe == 1:
                # np.argmin returns the FIRST minimum; centroids are
                # cent_id-ordered, so ties break to the smallest cent_id
                out = pdf.copy()
                out["cent_id"] = ids[np.argmin(d2, axis=1)]
                yield out
            else:
                order = np.argsort(d2, axis=1, kind="stable")[:, :k_probe]
                out = pdf.loc[pdf.index.repeat(k_probe)].copy()
                out["cent_id"] = ids[order].ravel()
                yield out

    return vectors.mapInPandas(assign, schema=out_schema)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 1,
    kernel: str = "column",
) -> DataFrame:
    """IVF coarse quantization: each vector -> its n_lists nearest centroids
    (n_lists=1 for index build, nprobe for query probing).

    ``centroids`` is a (cent_id, cent_vec) table — SMALL by construction
    (sqrt-ish of corpus) — packed into ONE broadcast row carrying the whole
    centroid array; the argmin is a native per-row fold over that array
    (``transform`` + ``array_min``/``array_sort`` on (d2, cent_id) structs),
    so the corpus side sees NO row explosion, NO window, and NO exchange —
    only a BroadcastNestedLoopJoin against a single row.  Ties break on
    cent_id (struct ordering is lexicographic: d2 asc, then cent_id asc).
    Adds cent_id (and keeps the input columns).

    ``kernel``: 'column' (default — zero Python, right up to moderate
    dim x K), 'arrow' (BLAS batches — the wide-embedding path, see
    :func:`ivf_assign_arrow`), or 'auto' (arrow when dim x K >= 16384,
    decided by two tiny driver lookups on the small centroid table)."""
    if kernel == "auto":
        d = centroids.select(F.size("cent_vec").alias("d")).first()["d"]
        kernel = "arrow" if d * centroids.count() >= 16384 else "column"
    if kernel == "arrow":
        return ivf_assign_arrow(vectors, centroids, id_col, vec_col, n_lists)
    packed = centroids.agg(
        F.collect_list(
            F.struct(F.col("cent_id"), F.col("cent_vec"))).alias("_cents"))
    darr = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            dist2(F.col(vec_col), c["cent_vec"]).alias("d2"),
            c["cent_id"].alias("cent_id")))
    out_cols = [*vectors.columns, "cent_id"]
    j = vectors.crossJoin(F.broadcast(packed))
    if n_lists == 1:
        return j.withColumn("cent_id", F.array_min(darr)["cent_id"]) \
                .select(*out_cols)
    top = F.slice(F.array_sort(darr), 1, n_lists)
    return j.withColumn(
        "cent_id",
        F.explode(F.transform(top, lambda s: s["cent_id"]))).select(*out_cols)


def write_ivf_corpus(
    corpus: DataFrame,
    centroids: DataFrame,
    table: str,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    kernel: str = "auto",
) -> None:
    """Build the persistent IVF index: the corpus assigned to its nearest
    list (zero-shuffle broadcast argmin) and written as a table BUCKETED
    BY cent_id with the row norm precomputed — the 100 TB substrate for
    ``ivf_flat_topk(corpus_table=...)``.  Each query batch then probes
    ``cent_id IN (<nprobe lists>)``: a BUCKET-PRUNED scan of only the
    touched inverted lists, no corpus re-assignment, no full scan."""
    from ..plans.sink import write_bucketed

    assigned = ivf_assign(
        corpus.select(F.col(corpus_id).alias("c_id"),
                      F.col(vec_col).alias("c_vec")),
        centroids, "c_id", "c_vec", n_lists=1, kernel=kernel)
    assigned = assigned.withColumn("c_norm", norm(F.col("c_vec")))
    write_bucketed(assigned, table, path, bucket_cols=("cent_id",),
                   n_buckets=n_buckets, sort_cols=("cent_id", "c_id"))


def train_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-6,
    kernel: str = "auto",
) -> DataFrame:
    """Lloyd k-means over the corpus — the codebook trainer that makes
    the IVF index self-contained (``centroids`` no longer needs to come
    from outside).

    Per iteration: coarse-assign with the ZERO-SHUFFLE ``ivf_assign``
    (broadcast centroid pack or BLAS kernel — the corpus never moves),
    then re-estimate each centroid as the per-dimension mean of its
    members — ONE groupBy whose aggregate is ``dim`` avg expressions
    (map-side combine; no posexplode of corpus × dim rows).  Empty
    clusters keep their previous centroid.  The driver loop is control
    only: it compares successive centroid sets (k × dim values — tiny)
    and stops on max squared movement < ``tol`` or ``max_iters``.

    Init is deterministic: the k corpus vectors with the smallest
    ``xxhash64(id)`` — a seeded-random-without-randomness choice that is
    reproducible on any cluster shape (the same discipline as
    operators/splits.py).

    Returns a (cent_id, cent_vec) DataFrame usable directly by
    ``ivf_assign`` / ``ivf_flat_topk`` / ``write_ivf_corpus``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    spark = corpus.sparkSession

    init = (corpus
            .orderBy(F.xxhash64(F.col(id_col)).asc(),
                     F.col(id_col).asc())
            .limit(k)
            .select(F.col(vec_col).alias("cent_vec"))
            .collect())
    cents = [[float(x) for x in r["cent_vec"]] for r in init]
    if len(cents) < k:
        raise ValueError(f"corpus smaller than k={k}")

    def to_df(vecs):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "cent_id int, cent_vec array<double>")

    mean_exprs = [F.avg(F.col(vec_col)[i]) for i in range(dim)]
    for _ in range(max_iters):
        cdf = to_df(cents)
        assigned = ivf_assign(corpus, cdf, id_col, vec_col,
                              n_lists=1, kernel=kernel)
        rows = (assigned.groupBy("cent_id")
                .agg(F.array(*mean_exprs).alias("m"))
                .collect())
        new = list(cents)
        for r in rows:
            new[r["cent_id"]] = [float(x) for x in r["m"]]
        move = max(
            sum((a - b) * (a - b) for a, b in zip(old, nw))
            for old, nw in zip(cents, new))
        cents = new
        if move < tol:
            break
    return to_df(cents).localCheckpoint()


def ivf_flat_topk(
    queries: DataFrame,
    corpus: DataFrame | None,
    centroids: DataFrame,
    k: int,
    nprobe: int = 3,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "column",
    corpus_table: "str | None" = None,
) -> DataFrame:
    """IVF-flat approximate cosine top-k: the inverted-list scale path next
    to the LSH one (ann_lsh_topk).

    Plan: corpus assigned once to its nearest centroid list (broadcast
    argmin, no corpus shuffle); each query probes its ``nprobe`` nearest
    lists and scores ONLY those lists' vectors.  At 100 TB pass
    ``corpus_table`` (a ``write_ivf_corpus`` table, bucketed by cent_id):
    the probe becomes a ``cent_id IN (<lists>)`` filter on the bucketed
    scan — bucket-pruned, assignment read not recomputed.  Recall tunes
    with (|centroids|, nprobe) — verified vs brute force in tests and
    recorded as a recall curve in bench recall_micro.  Output schema
    matches cosine_topk; rank is within retrieved candidates."""
    spark = queries.sparkSession
    saved_abs = None
    if corpus_table is not None:
        # same planner pin as knn_ring's probe mode: autoBucketedScan
        # would disable bucketed reads (and pruning) under the broadcast
        saved_abs = spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        c_assigned = spark.table(corpus_table)
    else:
        assert corpus is not None
        c_assigned = ivf_assign(
            corpus.select(F.col(corpus_id).alias("c_id"),
                          F.col(vec_col).alias("c_vec")),
            centroids, "c_id", "c_vec", n_lists=1, kernel=kernel)
        c_assigned = c_assigned.withColumn("c_norm", norm(F.col("c_vec")))
    try:
        probes = ivf_assign(
            queries.select(F.col(query_id).alias("q_id"),
                           F.col(vec_col).alias("q_vec")),
            centroids, "q_id", "q_vec", n_lists=nprobe, kernel=kernel)
        # norms once per ROW before the join — cosine's norm(a)*norm(b)
        # would otherwise recompute the corpus norm per (query, candidate)
        # pair; same multiplication order, so the rounded sim is
        # bit-identical (the bucketed table persists c_norm at build time)
        probes = probes.withColumn("q_norm", norm(F.col("q_vec")))
        if corpus_table is not None:
            # driver-side probe-list collection (queries are the SMALL
            # broadcast side by contract) -> an In predicate on the bucket
            # column -> bucket-pruned scan of only the touched lists
            lists = [r["cent_id"] for r in
                     probes.select("cent_id").distinct().collect()]
            c_assigned = c_assigned.filter(F.col("cent_id").isin(lists))
        cand = F.broadcast(probes).join(c_assigned, "cent_id")
        sim = (dot(F.col("q_vec"), F.col("c_vec"))
               / (F.col("q_norm") * F.col("c_norm")))
        w = W.partitionBy("q_id").orderBy(F.col("sim").desc(),
                                          F.col("c_id").asc())
        out = (
            cand.withColumn("sim", F.round(sim, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias(query_id), "rank",
                    F.col("c_id").alias(corpus_id), "sim")
        )
        if corpus_table is not None:
            # queries x k rows — materialize before the conf flips back
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        if saved_abs is not None:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                saved_abs)


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int):
    rng = random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane -> int bucket."""
    code = F.lit(0)
    for j, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda v, w_: v * w_),
            F.lit(0.0), lambda acc, x: acc + x)
        code = code + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return code


def lsh_bucket_codes_arrow(df: DataFrame, vec_col: str,
                           tables: list, out: str = "_buckets") -> DataFrame:
    """All-table LSH bucket codes in ONE BLAS batch — the wide-embedding
    twin of :func:`ivf_assign_arrow` (SCALE.md Python-boundary policy).

    The Column path evaluates n_tables x n_planes interpreted dot
    products per row; here the planes stack into one (T*h, dim) matrix,
    ``X @ P.T > 0`` gives every sign bit at once, and a weights dot packs
    them into per-table codes.  Appends ``out`` (array<int>, one code per
    table).  Sign parity with the fold is exact for exactly-representable
    arithmetic (integer-quantized planes/vectors — the oracle path);
    gaussian planes at float precision may flip a near-zero projection,
    which moves a vector between buckets — a recall, not correctness,
    effect (ANN contract)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    P = np.array([p for planes in tables for p in planes], dtype=np.float64)
    h = len(tables[0])
    T = len(tables)
    weights = (1 << np.arange(h, dtype=np.int64))
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out, ArrayType(IntegerType()))])

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (X @ P.T) > 0                      # (n, T*h)
            codes = bits.reshape(len(X), T, h) @ weights  # (n, T)
            res = pdf.copy()
            res[out] = list(codes.astype(np.int64))
            yield res

    return df.mapInPandas(bucketize, schema=out_schema)


def write_lsh_corpus(
    corpus: DataFrame,
    table: str,
    path: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    tables: list | None = None,
    kernel: str = "auto",
    n_buckets: int = 32,
) -> None:
    """Build the persistent LSH index: the corpus coded once against every
    hyperplane table (exploded to one row per (table_idx, bucket)) with
    precomputed norms, written BUCKETED by the packed probe key
    ``bkey = table_idx << 32 | bucket`` — a SINGLE column because Spark's
    bucket pruning only engages on single-column bucket specs.
    ``ann_lsh_topk(corpus_table=...)`` then probes ``bkey IN (<query
    codes>)``: a bucket-pruned scan, no corpus re-coding per query batch.
    The SAME (dim, n_planes, n_tables, seed) — or the same explicit
    ``tables`` — must be passed at query time; codes are seed-stable."""
    from ..plans.sink import write_bucketed

    tables = tables if tables is not None else _hyperplanes(
        dim, n_planes, n_tables, seed)
    coded = _bucketed(corpus, tables, corpus_id, vec_col, kernel=kernel)
    coded = coded.select(
        F.col("id").alias("c_id"), F.col("vec").alias("c_vec"),
        norm(F.col("vec")).alias("c_norm"), "table_idx", "bucket",
        (F.shiftleft(F.col("table_idx").cast("long"), 32)
         .bitwiseOR(F.col("bucket").cast("long"))).alias("bkey"))
    write_bucketed(coded, table, path, bucket_cols=("bkey",),
                   n_buckets=n_buckets, sort_cols=("bkey", "c_id"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame | None,
    k: int,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    tables: list | None = None,
    kernel: str = "column",
    corpus_table: "str | None" = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH (see module doc).

    Output schema matches ``cosine_topk``; rank is within retrieved
    candidates, so recall < 1 shows up as differing tail entries.
    ``tables`` overrides the seeded gaussian hyperplanes (e.g. integer-
    quantized planes for the exact-arithmetic oracle path).
    ``kernel``: 'column' (zero Python) or 'arrow' (BLAS bucket codes for
    wide embeddings, :func:`lsh_bucket_codes_arrow`); 'auto' picks arrow
    when dim x n_planes x n_tables >= 16384.  ``corpus_table``: a
    :func:`write_lsh_corpus` table — the persistent index; queries are
    coded live and probe it with ``bkey IN (<codes>)``, a bucket-pruned
    scan with no corpus re-coding (same tables/seed required)."""
    spark = queries.sparkSession
    tables = tables if tables is not None else _hyperplanes(
        dim, n_planes, n_tables, seed)
    if kernel == "auto":
        kernel = ("arrow" if dim * len(tables) * len(tables[0]) >= 16384
                  else "column")

    def bucket_array(vec: Column) -> Column:
        return F.array(*[_bucket_of(vec, planes) for planes in tables])

    def with_buckets(df: DataFrame, id_in: str, id_out: str,
                     vec_out: str, norm_out: str) -> DataFrame:
        base = df.select(F.col(id_in).alias(id_out),
                         F.col(vec_col).alias(vec_out))
        if kernel == "arrow":
            coded = lsh_bucket_codes_arrow(base, vec_out, tables)
            return coded.select(
                id_out, vec_out, norm(F.col(vec_out)).alias(norm_out),
                F.posexplode("_buckets").alias("table_idx", "bucket"))
        return base.select(
            id_out, vec_out, norm(F.col(vec_out)).alias(norm_out),
            F.posexplode(bucket_array(F.col(vec_out)))
            .alias("table_idx", "bucket"))

    saved_abs = None
    try:
        # norms once per ROW pre-join (see ivf_flat_topk note):
        # bit-identical sim, strictly less per-candidate work
        q = with_buckets(queries, query_id, "q_id", "q_vec", "q_norm")
        if corpus_table is not None:
            saved_abs = spark.conf.get(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "true")
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false")
            keys = [(r["table_idx"] << 32) | r["bucket"] for r in
                    q.select("table_idx", "bucket").distinct().collect()]
            c = (spark.table(corpus_table)
                 .filter(F.col("bkey").isin(keys))
                 .select("c_id", "c_vec", "c_norm", "table_idx", "bucket"))
        else:
            assert corpus is not None
            c = with_buckets(corpus, corpus_id, "c_id", "c_vec", "c_norm")
        cand = (
            F.broadcast(q).join(c, ["table_idx", "bucket"])
            .select("q_id", "q_vec", "q_norm", "c_id", "c_vec", "c_norm")
            .dropDuplicates(["q_id", "c_id"])
        )
        sim = (dot(F.col("q_vec"), F.col("c_vec"))
               / (F.col("q_norm") * F.col("c_norm")))
        w = W.partitionBy("q_id").orderBy(F.col("sim").desc(),
                                          F.col("c_id").asc())
        out = (
            cand.withColumn("sim", F.round(sim, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias(query_id), "rank",
                    F.col("c_id").alias(corpus_id), "sim")
        )
        if corpus_table is not None:
            out = out.localCheckpoint(eager=True)  # queries x k rows
        return out
    finally:
        if saved_abs is not None:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                saved_abs)


def _bucketed(corpus: DataFrame, tables: list, corpus_id: str,
              vec_col: str, kernel: str = "column") -> DataFrame:
    base = corpus.select(F.col(corpus_id).alias("id"),
                         F.col(vec_col).alias("vec"))
    if kernel == "auto":
        kernel = ("arrow" if len(tables[0][0]) * len(tables) * len(tables[0])
                  >= 16384 else "column")
    if kernel == "arrow":
        return lsh_bucket_codes_arrow(base, "vec", tables).select(
            "id", "vec", F.posexplode("_buckets").alias("table_idx", "bucket"))
    return base.select(
        "id", "vec",
        F.posexplode(F.array(*[_bucket_of(F.col("vec"), p) for p in tables]))
        .alias("table_idx", "bucket"),
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 16,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
    tables: list | None = None,
    kernel: str = "column",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH buckets.

    Scale guards (round-1 review fix): buckets larger than ``max_bucket``
    (degenerate sign-pattern floods — the self-join on them is O(bucket²))
    are dropped via a broadcast anti-join, never silently — audit with
    :func:`oversized_vector_buckets`; raise ``n_planes`` with corpus size
    (buckets per table = 2^n_planes) so expected bucket size stays bounded.
    ``tables`` overrides the seeded gaussian hyperplanes (e.g. with
    integer-quantized planes for the exact-arithmetic oracle path);
    ``kernel`` as in :func:`ann_lsh_topk` (BLAS buckets for wide dims)."""
    tables = tables if tables is not None else _hyperplanes(
        dim, n_planes, n_tables, seed)
    b = _bucketed(corpus, tables, corpus_id, vec_col, kernel)
    oversized = (
        b.groupBy("table_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_bucket)
        .select("table_idx", "bucket")
    )
    b_ok = b.join(F.broadcast(oversized), ["table_idx", "bucket"], "left_anti")
    left = b_ok.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                       "table_idx", "bucket")
    right = b_ok.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                        "table_idx", "bucket")
    return (
        left.join(right, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def oversized_vector_buckets(
    corpus: DataFrame,
    dim: int = 16,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
    tables: list | None = None,
) -> DataFrame:
    """(table_idx, bucket, n) for buckets :func:`embedding_near_dup`
    dropped — the no-silent-truncation audit."""
    tables = tables if tables is not None else _hyperplanes(
        dim, n_planes, n_tables, seed)
    return (
        _bucketed(corpus, tables, corpus_id, vec_col)
        .groupBy("table_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    scale: int = 1000,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label vote — the weak-labeling / label-propagation primitive
    over an embedding corpus: each query takes the MAJORITY label of
    its k nearest labeled neighbors (exact integer dot product on
    ``floor(v·scale + 0.5)`` quantized vectors, so ranking, vote
    counts, and the deterministic tie chain — higher dot first, lower
    corpus id; then bigger vote, lower label — are engine-exact and
    value-hashable).

    Returns (query_id, pred_label, votes, best_dot).  Shape mirrors
    cosine_topk: queries broadcast, corpus scanned once, per-query
    windows; at corpus scale swap the candidate stage for the ANN
    families (ann_lsh_topk / ivf_flat_topk) and keep the vote."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def quant(v: Column) -> Column:
        return F.transform(
            v, lambda x: F.floor(x.cast("double") * F.lit(float(scale))
                                 + F.lit(0.5)).cast("long"))

    q = queries.select(F.col(query_id).alias("q_id"),
                       quant(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(corpus_id).alias("c_id"),
                      F.col(label_col).alias("c_label"),
                      quant(F.col(vec_col)).alias("c_vec"))
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                      F.col("c_id").asc())
    nn = (F.broadcast(q).crossJoin(c)
          .withColumn("dot", dot)
          .withColumn("rank", F.row_number().over(w))
          .filter(F.col("rank") <= k))
    votes = (nn.groupBy("q_id", "c_label")
             .agg(F.count(F.lit(1)).alias("votes"),
                  F.max("dot").alias("best_dot")))
    wv = W.partitionBy("q_id").orderBy(F.col("votes").desc(),
                                       F.col("c_label").asc())
    return (votes.withColumn("_r", F.row_number().over(wv))
            .filter(F.col("_r") == 1)
            .select(F.col("q_id").alias(query_id),
                    F.col("c_label").alias("pred_label"),
                    "votes", "best_dot"))


def int_dot_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    scale: int = 1000,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer dot-product top-k: ``(q_id, c_id, dot, rank)`` on
    ``floor(v·scale + 0.5)`` quantized vectors with the (dot desc,
    c_id asc) total order — the engine-exact dense ranking primitive
    that knn_classify votes over and rrf_fuse consumes.  Queries
    broadcast, corpus scanned once, per-query windows; at corpus scale
    swap the candidate stage for ann_lsh_topk / ivf_flat_topk and keep
    the rank contract."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def quant(v: Column) -> Column:
        return F.transform(
            v, lambda x: F.floor(x.cast("double") * F.lit(float(scale))
                                 + F.lit(0.5)).cast("long"))

    q = queries.select(F.col(query_id).alias("q_id"),
                       quant(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(corpus_id).alias("c_id"),
                      quant(F.col(vec_col)).alias("c_vec"))
    dot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c_vec"), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                      F.col("c_id").asc())
    return (F.broadcast(q).crossJoin(c)
            .withColumn("dot", dot)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "dot", "rank"))


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Scalar-quantized (SQ8) top-k: vectors are encoded per-DIMENSION
    into 8-bit codes against a data-dependent codebook (the corpus'
    per-dim min/max), and candidates rank by the exact INTEGER dot
    product of the codes — the classic 4x-memory-compression retrieval
    tier between raw floats and product quantization (FAISS's
    ScalarQuantizer / Lucene's int8 HNSW storage level).

    Codebook + encoding are fully relational: per-dim extrema are one
    posexplode + groupBy (rows = dim count), folded back as two
    broadcast ARRAY literals-by-join (never a driver collect), and the
    code is ``clamp(floor((x−lo)/(hi−lo)·levels + 0.5), 0, levels)``
    per element — the portable half-up quantizer, with out-of-range
    QUERY values clamped into the codebook range (queries don't move
    the corpus codebook) and constant dims encoding to 0.  From there
    everything is exact int64: ranking and the (dot desc, id asc) tie
    chain value-hash cross-engine with NO float rounding in the
    output.

    Scale shape: corpus encoded once (encode-at-ingest in production —
    codes are 4x smaller than float32, the actual point), queries
    broadcast, one corpus scan, per-query window.  At fleet scale the
    candidate stage swaps for the bucketed ANN families and this
    integer scorer keeps the rerank.

    Returns (query_id, rank, vec_id, dot).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    v = F.col(vec_col).cast("array<double>")
    cv = corpus.select(F.col(corpus_id).alias("c_id"), v.alias("v"))
    qv = queries.select(F.col(query_id).alias("q_id"), v.alias("v"))
    dims = (cv.select(F.posexplode("v").alias("dim", "x"))
            .groupBy("dim")
            .agg(F.min("x").alias("lo"), F.max("x").alias("hi")))
    book = dims.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("dim", "lo"))),
                    lambda s: s["lo"]).alias("lo"),
        F.transform(F.array_sort(F.collect_list(F.struct("dim", "hi"))),
                    lambda s: s["hi"]).alias("hi"))

    def encode(df: DataFrame, idc: str) -> DataFrame:
        # NULL elements must PROPAGATE (least/greatest skip NULLs, so
        # an unguarded clamp would encode a missing dim as max-code
        # 255 — maximal similarity); a NULL code NULLs the dot and the
        # row is dropped from ranking below.
        code = F.zip_with(
            F.col("v"), F.arrays_zip("lo", "hi"),
            lambda x, s: F.when(x.isNull(), F.lit(None).cast("long"))
            .otherwise(F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.lit(levels).cast("long"),
                    F.when(s["hi"] > s["lo"],
                           F.floor((x - s["lo"]) / (s["hi"] - s["lo"])
                                   * F.lit(float(levels)) + F.lit(0.5)))
                    .otherwise(F.lit(0)).cast("long")))))
        return (df.crossJoin(F.broadcast(book))
                .select(F.col(idc), code.alias("code")))

    qc = encode(qv, "q_id")
    cc = encode(cv, "c_id").withColumnRenamed("code", "c_code")
    dot = F.aggregate(
        F.zip_with(F.col("code"), F.col("c_code"), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                      F.col("c_id").asc())
    return (F.broadcast(qc).crossJoin(cc)
            .withColumn("dot", dot)
            # NULL dot = a vector with missing dims: excluded rather
            # than ranked by engine-specific NULL ordering
            .filter(F.col("dot").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias(query_id), "rank",
                    F.col("c_id").alias(corpus_id), "dot"))


def sign_projection(df: DataFrame, in_dim: int, out_dim: int, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    scale: int = 1000, salt: str = "jl-v1") -> DataFrame:
    """Deterministic ±1 random projection (Achlioptas 2003's database-
    friendly Johnson-Lindenstrauss transform): y = S·x with S a fixed
    ``out_dim × in_dim`` sign matrix — the dimensionality reducer that
    runs BEFORE the ANN index when raw vectors are too wide (JL:
    pairwise distances survive within 1±ε at out_dim = O(ln n/ε²)).

    Determinism and exactness: the sign matrix is generated in PYTHON
    from md5(salt:k:j) parity and baked into the plan as literals —
    the identical matrix in the DuckDB oracle; inputs are quantized
    to exact integers (``floor(x·scale + 0.5)``), so every output
    component ``y_k = Σ_j s_kj·x_j`` is an EXACT int64 sum evaluated
    as an in-row fold (no shuffle, no Python at runtime).  Distances
    in the projected space relate by ``E‖y‖² = out_dim·‖x‖²``ᵢₙ
    expectation — callers divide by √out_dim when they need unit
    scaling (kept integer here on purpose).

    Shape: rows independent; per-row cost in_dim·out_dim
    multiply-adds inside codegen.  Returns ``(id, proj)`` with
    ``proj`` an ``array<long>`` of length out_dim.
    """
    if in_dim < 1 or out_dim < 1:
        raise ValueError("dims must be positive")
    signs = jl_sign_matrix(in_dim, out_dim, salt)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))
                          + F.lit(0.5)).cast("long"))
    guard = F.when(
        F.size(F.col(vec_col)) != in_dim,
        F.raise_error(F.concat(
            F.lit(f"sign_projection: expected dim {in_dim}, got "),
            F.size(F.col(vec_col)).cast("string")))
        .cast("array<long>")).otherwise(q)
    rows = []
    for k in range(out_dim):
        sarr = F.array(*[F.lit(s).cast("long") for s in signs[k]])
        rows.append(F.aggregate(
            F.zip_with(guard, sarr, lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, t: acc + t))
    return df.select(F.col(id_col).alias("id"),
                     F.array(*rows).alias("proj"))


def jl_sign_matrix(in_dim: int, out_dim: int,
                   salt: str = "jl-v1") -> "list[list[int]]":
    """The exact sign matrix :func:`sign_projection` bakes into its
    plan — exported so the oracle SQL builder consumes the SAME
    literals."""
    import hashlib
    return [[1 if int(hashlib.md5(
        f"{salt}:{k}:{j}".encode()).hexdigest(), 16) % 2 == 0 else -1
        for j in range(in_dim)] for k in range(out_dim)]
