"""Training-data pipeline operators: dedup, text analysis, similarity, media."""

import random

from pyspark.sql import functions as F

from mapbox_filter_spark.operators import dedup, media, similarity, text

SF = "/root/testdata/sf0.001"


def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup(spark):
    d = docs(spark)
    # append duplicate rows with higher ids
    dup = d.limit(20).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = d.unionByName(dup)
    out = dedup.dedup_exact(both)
    assert out.count() == d.count()
    # survivors are the ORIGINAL (minimum) ids
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_minhash_lsh_finds_near_dups(spark):
    d = docs(spark).limit(100).cache()
    # create near-duplicates: same text + one appended word
    near = (d.limit(15)
            .withColumn("doc_id", F.col("doc_id") + 2_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra"))))
    both = d.unionByName(near)
    pairs = dedup.dedup_minhash_lsh(both, threshold=0.6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["doc_id"], r["doc_id"] + 2_000_000) for r in d.limit(15).collect()}
    # high recall on 0.9-ish jaccard pairs
    assert len(expected & found) >= 12, (len(expected & found), len(found))
    for r in pairs:
        assert r["jaccard_sim"] >= 0.6


def test_simhash_near_dups(spark):
    d = docs(spark).limit(80).cache()
    near = (d.limit(10)
            .withColumn("doc_id", F.col("doc_id") + 3_000_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" zz"))))
    pairs = dedup.dedup_simhash(d.unionByName(near), max_hamming=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["doc_id"], r["doc_id"] + 3_000_000) for r in d.limit(10).collect()}
    assert len(expected & found) >= 7


def test_ngram_jaccard_pairs(spark):
    d = docs(spark).limit(60).cache()
    near = (d.limit(10)
            .withColumn("doc_id", F.col("doc_id") + 4_000_000))  # identical text
    pairs = dedup.dedup_ngram_jaccard(d.unionByName(near), threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(r["doc_id"], r["doc_id"] + 4_000_000) for r in d.limit(10).collect()}
    assert expected <= found


def test_text_profile(spark):
    d = text.text_profile(docs(spark).limit(200)).cache()
    rows = d.collect()
    for r in rows:
        assert r["tokens_ws"] >= 0 and r["tokens_bpe"] >= r["tokens_ws"] - 1
        assert 0.0 <= r["quality"] <= 1.0
    # lang_id: sanity vs the generator's lang column where markers exist
    en = [r for r in rows if r["lang"] == "en"]
    if en:
        hits = sum(1 for r in en if r["lang_pred"] == "en")
        assert hits / len(en) > 0.4  # heuristic, not a classifier


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "id long, text string")
    fps = {r["id"]: r["fp"] for r in df.select(
        "id", text.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[3] != fps[2]


def test_cosine_topk_and_ann(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    dim = len(emb.first()["embedding"])
    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    brute = similarity.cosine_topk(queries, emb, k=5)
    b = brute.collect()
    assert len(b) == 50
    # self-match is rank 1 with sim 1.0
    for r in b:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"] and abs(r["sim"] - 1.0) < 1e-5

    ann = similarity.ann_lsh_topk(queries, emb, k=5, dim=dim,
                                  n_planes=4, n_tables=16)
    a = ann.collect()
    bset = {(r["query_id"], r["vec_id"]) for r in b}
    aset = {(r["query_id"], r["vec_id"]) for r in a}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.6, recall  # tunable-recall ANN; exactness not claimed


def test_ivf_arrow_kernel_matches_column(spark):
    """The BLAS-batched coarse-assign (kernel='arrow') must agree with the
    Column fold exactly on exactly-representable inputs, including ties
    (both break to the smallest cent_id), for single and multi-probe."""
    corpus = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (i + 1)) % 13).cast("double")
                  for i in range(8)]).alias("embedding"))
    # duplicated centroids -> guaranteed exact d2 ties
    cents = spark.range(12).select(
        F.col("id").cast("int").alias("cent_id"),
        F.array(*[((F.col("id") % 6) * (i + 3) % 7).cast("double")
                  for i in range(8)]).alias("cent_vec"))
    for nl in (1, 3):
        col = {tuple(r) for r in similarity.ivf_assign(
            corpus, cents, "vec_id", "embedding", nl)
            .select("vec_id", "cent_id").collect()}
        arr = {tuple(r) for r in similarity.ivf_assign(
            corpus, cents, "vec_id", "embedding", nl, kernel="arrow")
            .select("vec_id", "cent_id").collect()}
        assert col == arr and len(col) == 500 * nl
    # auto dispatch: tiny dim*K stays on the zero-Python column path
    auto = similarity.ivf_assign(
        corpus, cents, "vec_id", "embedding", 1, kernel="auto")
    assert "EvalPython" not in \
        auto._jdf.queryExecution().executedPlan().toString()


def test_ivf_arrow_kernel_edge_cases(spark):
    """Round-3 ADVICE regressions: (a) the arrow kernel must preserve the
    centroid table's cent_id type — a hardcoded IntegerType would silently
    wrap ids > 2^31 under convertToArrowArraySafely=false; (b) n_lists
    greater than the centroid count must clamp (the column kernel's sorted
    slice already degrades gracefully) instead of raising a pandas
    length-mismatch."""
    corpus = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 5 + i).cast("double")
                  for i in range(4)]).alias("embedding"))
    big = 2**40
    cents = spark.range(3).select(
        (F.col("id") + big).alias("cent_id"),  # LongType, > 2^31
        F.array(*[(F.col("id") * 2 + i).cast("double")
                  for i in range(4)]).alias("cent_vec"))
    arr = similarity.ivf_assign(corpus, cents, "vec_id", "embedding", 1,
                                kernel="arrow")
    assert arr.schema["cent_id"].dataType == cents.schema["cent_id"].dataType
    got = {r["cent_id"] for r in arr.collect()}
    assert got <= {big, big + 1, big + 2} and got  # no int32 wrap
    # n_lists (5) > number of centroids (3): both kernels clamp to 3
    for kern in ("column", "arrow"):
        out = similarity.ivf_assign(corpus, cents, "vec_id", "embedding", 5,
                                    kernel=kern)
        assert out.count() == 40 * 3, kern


def test_ivf_flat_topk_arrow_kernel(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    cents = (emb.limit(6)
             .select((F.col("vec_id") % 100).cast("int").alias("cent_id"),
                     F.col("embedding").alias("cent_vec")))
    a = similarity.ivf_flat_topk(queries, emb, cents, k=3, nprobe=2)
    b = similarity.ivf_flat_topk(queries, emb, cents, k=3, nprobe=2,
                                 kernel="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ann_lsh_arrow_kernel_matches_column(spark):
    """BLAS bucket codes vs the Column fold: exact with integer-quantized
    planes and integer-valued vectors (no rounding anywhere), so the full
    top-k output must be identical."""
    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[((F.col("id") * (i + 1)) % 9 - 4).cast("double")
                  for i in range(16)]).alias("embedding"))
    queries = emb.limit(6).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    rng = __import__("random").Random(7)
    tables = [[[float(rng.randint(-3, 3)) for _ in range(16)]
               for _ in range(4)] for _ in range(5)]
    a = similarity.ann_lsh_topk(queries, emb, k=4, dim=16, tables=tables)
    b = similarity.ann_lsh_topk(queries, emb, k=4, dim=16, tables=tables,
                                kernel="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_embedding_near_dup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100).cache()
    dim = len(emb.first()["embedding"])
    dup = emb.limit(8).withColumn("vec_id", F.col("vec_id") + 9_000_000)
    pairs = similarity.embedding_near_dup(
        emb.unionByName(dup), threshold=0.999, dim=dim).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["vec_id"], r["vec_id"] + 9_000_000) for r in emb.limit(8).collect()}
    assert len(expected & found) >= 6  # LSH recall on identical vectors
    # BLAS bucket kernel: identical-vector pairs land in identical buckets
    # regardless of summation order, so recall can only match or exceed
    arrow = {(r["id_a"], r["id_b"]) for r in similarity.embedding_near_dup(
        emb.unionByName(dup), threshold=0.999, dim=dim,
        kernel="arrow").collect()}
    assert len(expected & arrow) >= 6


def test_media_plumbing(spark):
    refs = spark.createDataFrame(
        [(i, f"media://blob/{i:04x}.jpg") for i in range(50)]
        + [(99, "media://blob/zz.mp4")],
        "id long, media_ref string")
    with_blob = refs.withColumn("blob", media.synth_media_blob(F.col("media_ref")))
    decoded = media.decode_image_meta(with_blob).cache()
    rows = decoded.collect()
    assert len(rows) == 51
    for r in rows:
        m = r["media_meta"]
        assert m["ok"] and m["media_type"] == "image"
        assert 16 <= m["width"] < 1936 and 16 <= m["height"] < 1096
    kinds = refs.select(media.media_ref_kind(F.col("media_ref")).alias("k")).collect()
    assert {r["k"] for r in kinds} == {"image", "video"}
    frames = refs.limit(1).select(
        F.explode(media.frame_sample_refs(F.col("media_ref"), 3)).alias("f")).collect()
    assert len(frames) == 3 and frames[0]["f"].endswith("#frame=0")

    import pytest
    with pytest.raises(NotImplementedError):
        media.decode_image_real(with_blob)


def test_simhash_bucket_cap_on_skewed_corpus(spark):
    """Identical-text floods: every chunk bucket explodes past max_bucket;
    the pass drops them (bounded work, no OOM) and the audit reports them —
    no silent truncation."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.dedup_simhash(d, max_bucket=64)
    assert pairs.count() == 0  # all buckets over cap -> dropped
    audit = dedup.oversized_simhash_buckets(d, max_bucket=64).collect()
    # one flooded bucket per chunk index, each holding the whole corpus
    assert sorted(r["chunk_idx"] for r in audit) == [0, 1, 2, 3]
    assert all(r["n"] == 300 for r in audit)
    # with the cap lifted the pairs come back (sanity: cap is the only gate)
    assert dedup.dedup_simhash(d, max_bucket=100_000).count() > 0


def test_minhash_bucket_cap_audit(spark):
    rows = [(i, "identical minhash corpus line") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.dedup_minhash_lsh(d, max_bucket=64).count() == 0
    audit = dedup.oversized_buckets(d, max_bucket=64)
    got = audit.collect()
    assert len(got) == 16  # every band bucket flooded
    assert all(r["n"] == 200 for r in got)


def test_embedding_near_dup_bucket_cap(spark):
    # 150 identical vectors: every LSH bucket floods; cap drops them all
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(150)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_dup(d, dim=4, threshold=0.5, max_bucket=64)
    assert out.count() == 0
    audit = similarity.oversized_vector_buckets(d, dim=4, max_bucket=64)
    assert audit.count() == 4  # one flooded bucket per table
    # lifted cap: all pairs found (identical vectors, sim = 1.0)
    out2 = similarity.embedding_near_dup(d, dim=4, threshold=0.5,
                                         max_bucket=1_000_000)
    assert out2.count() == 150 * 149 // 2


def test_media_resize_and_features(spark):
    from pyspark.sql import functions as F

    d = docs(spark).limit(40).select(
        "doc_id",
        media.synth_media_blob(F.concat(F.lit("m://"),
                                        F.col("doc_id").cast("string"),
                                        F.lit(".jpg"))).alias("blob"))
    resized = media.resize_image(d, 320, 240)
    meta = media.decode_image_meta(resized)
    rows = meta.select("media_meta").collect()
    assert all(r["media_meta"]["width"] == 320
               and r["media_meta"]["height"] == 240
               and r["media_meta"]["ok"] for r in rows)

    feats = media.media_byte_features(d).select("doc_id", "media_features")
    got = feats.collect()
    assert all(len(r["media_features"]) == 16 for r in got)
    assert all(abs(sum(r["media_features"]) - 1.0) < 1e-9 for r in got)
    # content-sensitive: not all rows identical
    assert len({tuple(r["media_features"]) for r in got}) > 1


def test_ngram_block_cap_on_skewed_corpus(spark):
    """A "the …" flood: one first-token block holds the whole corpus; the
    cap drops it (bounded O(block²) work) and the audit reports it — the
    same no-silent-truncation discipline as the other bucketed dedups."""
    rows = [(i, f"the document number {i} has words") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.dedup_ngram_jaccard(d, threshold=0.1, max_block=64).count() == 0
    audit = dedup.oversized_ngram_blocks(d, max_block=64).collect()
    assert [(r["blk"], r["n"]) for r in audit] == [("the", 200)]
    # cap lifted -> pairs come back (cap is the only gate)
    assert dedup.dedup_ngram_jaccard(d, threshold=0.1,
                                     max_block=100_000).count() > 0


def test_repetition_features_crafted(spark):
    """Gopher repetition signals on crafted docs: duplicated lines and a
    flooding 2-gram are detected; clean text scores zero; the Python
    expectations mirror the integer micro-unit arithmetic exactly."""
    rows = [
        # 4 lines, "dup" twice -> dup_line_frac = 1/4; dup chars 6 of 12
        (1, "dup\nab\ndup\ncde"),
        # "la la la la" -> top gram "la la" occurs 3x (overlapping)
        (2, "la la la la"),
        (3, "all unique lines here\nand another one"),
        (4, ""),               # empty text: all zeros
        (5, None),             # null-safe
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = text.repetition_features(F.col("text"))
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *[c.alias(k) for k, c in feats.items()])
           .collect()}

    r1 = out[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac_u"] == 1_000_000 // 4
    assert r1["dup_char_frac_u"] == 6 * 1_000_000 // (3 + 2 + 3 + 3)

    r2 = out[2]
    assert (r2["top_gram"], r2["top_gram_count"]) == ("la la", 3)
    assert r2["top_gram_char_frac_u"] == 3 * 5 * 1_000_000 // 11

    r3 = out[3]
    assert r3["dup_line_frac_u"] == 0 and r3["dup_char_frac_u"] == 0
    assert r3["top_gram_count"] == 1  # every 2-gram unique

    for i in (4, 5):
        assert out[i]["n_lines"] == 0
        assert out[i]["top_gram"] == "" and out[i]["top_gram_count"] == 0
        assert out[i]["top_gram_char_frac_u"] == 0


def test_repetition_oracle_parity_multiline(spark):
    """The sf documents are single-line, so run the Spark query against the
    DuckDB oracle SQL over a crafted MULTI-LINE corpus to cover the
    duplicate-line branches of both transcriptions."""
    import duckdb

    from mapbox_filter_spark.queries_ext import sql_repetition_profile

    rows = [(i, ("x y z\n" * (i % 4 + 1)) + f"tail {i} " + "go go " * (i % 3))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = text.repetition_features(F.col("text"))
    got = sorted(
        tuple(r) for r in
        df.select("doc_id", *[c.alias(k) for k, c in feats.items()]).collect())

    con = duckdb.connect()
    con.register("docs_in", df.toPandas())
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM docs_in")
    want = sorted(tuple(r) for r in
                  con.execute(sql_repetition_profile()).fetchall())
    assert got == want


def test_pii_mask_and_counts(spark):
    rows = [
        (1, "write to bob.smith+x@corp.example.org today"),
        (2, "server at 192.168.0.1 rebooted"),
        (3, "call +1 (555) 010-4242 or 555-010-9999 now"),
        (4, "mixed: a@b.co from 10.0.0.7 dial 555 010 1234"),
        (5, "clean text, no contact info at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = F.col("text")
    cnts = text.pii_counts(c)
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", text.mask_pii(c).alias("masked"),
        *[v.alias(k) for k, v in cnts.items()]).collect()}

    assert out[1]["masked"] == "write to <EMAIL> today"
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0
    assert out[2]["masked"] == "server at <IP> rebooted"
    assert out[2]["n_ips"] == 1 and out[2]["n_phones"] == 0
    assert out[3]["masked"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_phones"] == 2
    assert out[4]["masked"] == "mixed: <EMAIL> from <IP> dial <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[5]["masked"] == rows[4][1]
    assert out[6]["masked"] is None


def test_pii_scrub_oracle_parity(spark):
    """Same synthetic-contact query on both engines (the Java-regex ∩ RE2
    pattern subset must behave identically)."""
    import duckdb

    from mapbox_filter_spark.queries_ext import q_pii_scrub, sql_pii_scrub

    got = sorted(tuple(r) for r in q_pii_scrub(spark, SF).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(sql_pii_scrub()).fetchall())
    assert got == want
    assert all(r[2] == 1 and r[3] == 1 and r[4] == 1 for r in got)


def test_ivf_bucketed_corpus_table(spark, tmp_path):
    """The persistent IVF index (write_ivf_corpus): probing the bucketed
    table must return exactly the in-memory ivf_flat_topk result, and the
    probe scan must BUCKET-PRUNE to the nprobe lists (SelectedBucketsCount
    below total) — the SCALE.md co-located-probe claim, now in code."""
    import re

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    cents = (emb.limit(40)
             .select(F.col("vec_id").cast("int").alias("cent_id"),
                     F.col("embedding").alias("cent_vec"))).cache()

    spark.sql("DROP TABLE IF EXISTS ivf_corpus_t")
    similarity.write_ivf_corpus(emb, cents, "ivf_corpus_t",
                                str(tmp_path / "ivf_corpus"), n_buckets=32)
    try:
        mem = similarity.ivf_flat_topk(queries, emb, cents, k=3, nprobe=2)
        tbl = similarity.ivf_flat_topk(queries, None, cents, k=3, nprobe=2,
                                       corpus_table="ivf_corpus_t")
        assert sorted(map(tuple, mem.collect())) == \
            sorted(map(tuple, tbl.collect()))

        # plan check: rebuild the probe under the pinned planner conf and
        # assert bucket pruning on the bucketed scan
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        probe = spark.table("ivf_corpus_t").filter(
            F.col("cent_id").isin([1, 2, 3]))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan[:800]
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS ivf_corpus_t")


def test_lsh_bucketed_corpus_table(spark, tmp_path):
    """The persistent LSH index (write_lsh_corpus): probing the bkey-bucketed
    table must return exactly the in-memory ann_lsh_topk result under the
    same seeded hyperplanes, and the probe scan must bucket-prune."""
    import re

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    spark.sql("DROP TABLE IF EXISTS lsh_corpus_t")
    similarity.write_lsh_corpus(emb, "lsh_corpus_t",
                                str(tmp_path / "lsh_corpus"), dim=dim,
                                n_planes=6, n_tables=8, n_buckets=64)
    try:
        mem = similarity.ann_lsh_topk(queries, emb, k=3, dim=dim,
                                      n_planes=6, n_tables=8)
        tbl = similarity.ann_lsh_topk(queries, None, k=3, dim=dim,
                                      n_planes=6, n_tables=8,
                                      corpus_table="lsh_corpus_t")
        assert sorted(map(tuple, mem.collect())) == \
            sorted(map(tuple, tbl.collect()))

        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        probe = spark.table("lsh_corpus_t").filter(
            F.col("bkey").isin([(1 << 32) | 5, (2 << 32) | 9]))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan[:800]
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS lsh_corpus_t")


def test_train_centroids_recovers_clusters(spark):
    """Lloyd on a well-separated synthetic corpus: SSE decreases to near
    the planted structure and every planted cluster maps to exactly one
    learned centroid; deterministic across repartitioning."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from mapbox_filter_spark.operators.similarity import (
        ivf_assign, train_centroids)

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 10
    rows = []
    for i in range(400):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(size=8) * 0.1).tolist(), c))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "truth"])
    corpus = spark.createDataFrame(pdf)

    cents = train_centroids(corpus, "vec_id", "embedding", k=4,
                            max_iters=15)
    assert cents.count() == 4
    assigned = ivf_assign(corpus, cents, "vec_id", "embedding",
                          n_lists=1)
    rows = assigned.select("truth", "cent_id").collect()
    # each planted cluster -> one learned centroid, bijectively
    mapping = {}
    for r in rows:
        mapping.setdefault(r["truth"], set()).add(r["cent_id"])
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 4

    # deterministic under repartition (init is hash-ordered, not
    # partition-ordered)
    again = train_centroids(corpus.repartition(17), "vec_id",
                            "embedding", k=4, max_iters=15)
    a = sorted(tuple(r["cent_vec"]) for r in cents.collect())
    b = sorted(tuple(r["cent_vec"]) for r in again.collect())
    for x, y in zip(a, b):
        assert all(abs(p - q) < 1e-9 for p, q in zip(x, y))


def test_train_centroids_validations(spark):
    import pandas as pd

    from mapbox_filter_spark.operators.similarity import train_centroids

    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[1.0], [2.0]]}))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        train_centroids(corpus, "vec_id", "embedding", k=0)
    with _pytest.raises(ValueError, match="smaller than k"):
        train_centroids(corpus, "vec_id", "embedding", k=5)


def test_dedup_spans_crafted(spark):
    # doc 1 owns spans A B; doc 2 repeats A then fresh C; doc 3 is all
    # duplicates of A (and of itself)
    A = " ".join(f"a{i}" for i in range(10))
    B = " ".join(f"b{i}" for i in range(10))
    C = " ".join(f"c{i}" for i in range(4))  # short tail chunk
    rows = [(1, f"{A} {B}"), (2, f"{A} {C}"), (3, f"{A} {A}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.dedup_spans(df, span_words=10).collect()}
    assert out[1]["clean_text"] == f"{A} {B}"      # first occurrence keeps all
    assert out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == C               # A dropped, order preserved
    assert out[2]["n_dropped"] == 1 and out[2]["n_spans"] == 2
    assert out[3]["clean_text"] == ""              # everything duplicated
    assert out[3]["n_dropped"] == 2


def test_dedup_spans_order_preserved(spark):
    # a duplicated MIDDLE span must splice out without reordering
    S = lambda ch: " ".join(f"{ch}{i}" for i in range(10))
    rows = [(1, S("x")), (2, f"{S('p')} {S('x')} {S('q')}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"]
           for r in dedup.dedup_spans(df, span_words=10).collect()}
    assert out[2] == f"{S('p')} {S('q')}"


def test_decontaminate_crafted(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "the quick brown cat sat"),      # shares "the quick brown"
         (2, "totally disjoint words here"),  # clean
         (3, "quick brown fox jumps high")],  # shares 2 eval 3-grams
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.decontaminate(tr, ev, ngram_n=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_overlap"] == 1
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_overlap"] == 2
    assert out[1]["n_grams"] == 3  # 5 words -> 3 distinct trigrams


# ---------------------------------------------------------- kNN classifier


def test_knn_classify_crafted_and_ties(spark):
    from mapbox_filter_spark.operators.similarity import knn_classify

    # two tight clusters on axes; query q sits in cluster A
    corpus = [(1, [1.0, 0.0], 7), (2, [0.9, 0.1], 7), (3, [1.1, 0.0], 7),
              (4, [0.0, 1.0], 9), (5, [0.1, 0.9], 9)]
    queries = [(100, [1.0, 0.05], -1)]
    c = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>, label int")
    q = spark.createDataFrame(
        queries, "vec_id long, embedding array<double>, label int")
    out = knn_classify(q, c, 3, query_id="vec_id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["vec_id"], r["pred_label"], r["votes"]) == (100, 7, 3)

    # vote tie (k=2, one neighbor each): lower label wins
    out2 = knn_classify(q, c, 4, query_id="vec_id").collect()[0]
    assert out2["votes"] >= 2  # cluster A still dominates at k=4

    tie_c = spark.createDataFrame(
        [(1, [1.0, 0.0], 5), (2, [0.0, 1.0], 3)],
        "vec_id long, embedding array<double>, label int")
    tie_q = spark.createDataFrame(
        [(9, [1.0, 1.0], -1)], "vec_id long, embedding array<double>, label int")
    t = knn_classify(tie_q, tie_c, 2, query_id="vec_id").collect()[0]
    assert (t["pred_label"], t["votes"]) == (3, 1)  # 1-1 tie -> min label


def test_knn_classify_partitioning_independent(spark):
    import random

    from mapbox_filter_spark.operators.similarity import knn_classify

    rng = random.Random(17)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], rng.randrange(3))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    q = df.filter(F.col("vec_id") % 10 == 0)
    c = df.filter(F.col("vec_id") % 10 != 0)

    def run(cc):
        return sorted(map(tuple, knn_classify(
            q, cc, 5, query_id="vec_id").collect()))

    assert run(c.repartition(1)) == run(c.repartition(13))


def test_knn_classify_validation(spark):
    import pytest

    from mapbox_filter_spark.operators.similarity import knn_classify

    df = spark.createDataFrame([(1, [1.0], 0)],
                               "vec_id long, embedding array<double>, label int")
    with pytest.raises(ValueError, match="k"):
        knn_classify(df, df, 0)
