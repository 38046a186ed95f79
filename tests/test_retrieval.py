"""BM25 retrieval tests (operators/retrieval.py): python-twin score
differential, index-path equality, bucket-pruned probe plan."""

import math

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    doc_terms,
    exact_idf,
    write_term_index,
)

SF = "/root/testdata/sf0.01"
QUERY = ["spark", "table", "scan"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _python_bm25(pdf, query, k1=1.2, b=0.75):
    toks = {r.doc_id: [w for w in r.text.lower().split() if w]
            for r in pdf.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in query}
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in query:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            s += exact_idf(n, df[q]) * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


def test_bm25_matches_python_twin(spark, docs):
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, QUERY).collect()}
    want = _python_bm25(docs.select("doc_id", "text").toPandas(), QUERY)
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], rel_tol=1e-12), d


def test_doc_terms_invariants(spark, docs):
    dt = doc_terms(docs)
    r = dt.agg(F.sum("tf").alias("total"),
               F.countDistinct("doc_id").alias("nd")).first()
    assert r["nd"] == docs.count()
    # dl is consistent: sum(tf) per doc == dl
    bad = (dt.groupBy("doc_id", "dl")
           .agg(F.sum("tf").alias("s"))
           .filter(F.col("s") != F.col("dl")).count())
    assert bad == 0


def test_bm25_index_path_matches_scan(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("term_idx"))
    write_term_index(docs, path, n_buckets=32)
    via_index = bm25_topk(spark, QUERY, k=20, index_path=path)
    via_scan = bm25_topk(docs, QUERY, k=20)
    a = sorted((r["doc_id"], r["rank"], round(r["score"], 9))
               for r in via_index.collect())
    b = sorted((r["doc_id"], r["rank"], round(r["score"], 9))
               for r in via_scan.collect())
    assert a == b and len(a) == 20


def test_index_probe_prunes_buckets(spark, docs, tmp_path_factory):
    from mapbox_filter_spark.operators.retrieval import read_term_index

    path = str(tmp_path_factory.mktemp("term_idx2"))
    write_term_index(docs, path, n_buckets=32)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        postings, _, _ = read_term_index(spark, path)
        probe = postings.filter(F.col("term").isin(QUERY))
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, saved)
    assert "SelectedBucketsCount" in plan, plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan
    assert int(m.group(1)) <= len(QUERY)


def test_bm25_empty_query_rejected(spark, docs):
    with pytest.raises(ValueError, match="empty query"):
        bm25_scores(docs, [])


# ------------------------------------------------------- phrase search


def test_phrase_search_matches_brute_contains(spark, docs):
    from mapbox_filter_spark.operators.retrieval import phrase_search

    phrase = "table value"
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_search(docs, phrase).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    want = {}
    for r in pdf.itertuples():
        n = r.text.count(phrase)
        if n:
            want[r.doc_id] = n
    assert got == want and want


def test_phrase_search_index_path_identical(spark, docs,
                                            tmp_path_factory):
    from mapbox_filter_spark.operators.retrieval import (
        phrase_search, write_trigram_index)

    phrase = "table value"
    path = str(tmp_path_factory.mktemp("trgm_idx"))
    name = write_trigram_index(docs, path, n_buckets=32,
                               table_name="trgm_idx_test")
    a = sorted(map(tuple, phrase_search(docs, phrase).collect()))
    b = sorted(map(tuple,
                   phrase_search(docs, phrase, index_table=name)
                   .collect()))
    assert a == b and a


def test_trigram_probe_prunes_buckets(spark, docs, tmp_path_factory):
    import re

    path = str(tmp_path_factory.mktemp("trgm_idx2"))
    from mapbox_filter_spark.operators.retrieval import (
        write_trigram_index)

    name = write_trigram_index(docs, path, n_buckets=32,
                               table_name="trgm_idx_prune")
    grams = ["tab", "abl", "ble"]
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        probe = spark.table(name).filter(F.col("gram").isin(grams))
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, saved)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan
    assert int(m.group(1)) <= len(grams)


def test_phrase_search_validation(spark, docs):
    from mapbox_filter_spark.operators.retrieval import phrase_search

    with pytest.raises(ValueError, match="3 characters"):
        phrase_search(docs, "ab")


def test_phrase_search_duplicate_doc_ids(spark):
    # duplicate doc_id rows must not overshoot the ALL-grams count and
    # drop hits (review finding: count vs countDistinct)
    from mapbox_filter_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "xx table value yy"), (1, "zz table value"), (2, "no hit")],
        "doc_id long, text string")
    got = sorted(map(tuple, phrase_search(df, "table value").collect()))
    assert got == [(1, 1), (1, 1)]


def test_index_table_name_sanitized(spark):
    from mapbox_filter_spark.operators.retrieval import _index_table_name

    assert _index_table_name("trgm_idx_", "/tmp/my-index.v2") == \
        "trgm_idx_my_index_v2"
