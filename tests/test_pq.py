"""Product quantization (operators/pq.py): python-twin differential."""

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.pq import (
    pq_adc_dist,
    pq_codebook,
    pq_encode,
    pq_topk,
    write_pq_codes,
)

M, K, SUB = 4, 8, 4          # 16-dim toy space
CB = pq_codebook(M, K, SUB, scale=10.0)


def _py_encode(vec):
    codes = []
    for m in range(M):
        best = None
        for k in range(K):
            d = sum((vec[m * SUB + i] - CB[m][k][i]) ** 2
                    for i in range(SUB))
            if best is None or d < best[0]:
                best = (d, k)
        codes.append(best[1])
    return codes


def _py_adc(q, codes):
    return sum((q[m * SUB + i] - CB[m][codes[m]][i]) ** 2
               for m in range(M) for i in range(SUB))


def _vectors(n=40):
    return [(i, [float((i * 31 + j * 7) % 21 - 10) for j in range(M * SUB)])
            for i in range(n)]


def test_encode_matches_python_twin(spark):
    df = spark.createDataFrame(_vectors(), "vec_id long, v array<double>")
    rows = df.select("vec_id", pq_encode(F.col("v"), CB).alias("c")).collect()
    by_id = dict(_vectors())
    for r in rows:
        assert r["c"] == _py_encode(by_id[r["vec_id"]]), r["vec_id"]


def test_exact_codeword_roundtrip(spark):
    # a vector assembled FROM codewords must encode back to those codes
    want = [3, 0, 7, 5]
    vec = [CB[m][want[m]][d] for m in range(M) for d in range(SUB)]
    df = spark.createDataFrame([(0, vec)], "vec_id long, v array<double>")
    row = df.select(pq_encode(F.col("v"), CB).alias("c")).head()
    assert row["c"] == want


def test_arrow_kernels_match_column(spark):
    """Integer-valued inputs: the BLAS expansion ‖v‖²−2v·c+‖c‖² is exact
    (< 2^53), so argmin codes and ADC top-k must EQUAL the fold path."""
    from mapbox_filter_spark.operators.pq import pq_encode_arrow, pq_topk_arrow

    df = spark.createDataFrame(_vectors(60), "vec_id long, v array<double>")
    col_codes = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id", pq_encode(F.col("v"), CB).alias("c")).collect()}
    arr_codes = {r["vec_id"]: list(r["pq_codes"]) for r in
                 pq_encode_arrow(df, "v", CB).collect()}
    assert col_codes == arr_codes

    codes = write_pq_codes(df, "v", CB)
    queries = (df.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qvec")))
    col_top = sorted(tuple(r) for r in pq_topk(codes, queries, CB, k=4)
                     .collect())
    arr_top = sorted(tuple(r) for r in pq_topk_arrow(codes, queries, CB, k=4)
                     .collect())
    assert col_top == arr_top


def test_ivfpq_arrow_encode_matches_column(spark):
    from mapbox_filter_spark.operators.pq import ivfpq_topk

    df = spark.createDataFrame(
        [(i, v) for i, v in _vectors(80)], "vec_id long, embedding array<double>")
    cents = (df.filter(F.col("vec_id") % 20 == 0)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_vec")))
    queries = (df.filter(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    a = sorted(tuple(r) for r in ivfpq_topk(
        queries, df, cents, CB, k=5, nprobe=2).collect())
    b = sorted(tuple(r) for r in ivfpq_topk(
        queries, df, cents, CB, k=5, nprobe=2,
        encode_kernel="arrow").collect())
    assert a == b and len(a) == 10

    from mapbox_filter_spark.operators.pq import ivfpq_topk_arrow
    c = sorted(tuple(r) for r in ivfpq_topk_arrow(
        queries, df, cents, CB, k=5, nprobe=2).collect())
    assert a == c


def test_adc_topk_matches_python(spark):
    vecs = _vectors()
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    codes = write_pq_codes(df, "v", CB)
    queries = (df.filter(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qvec")))
    got = pq_topk(codes, queries, CB, k=5).collect()
    by_id = dict(vecs)
    py_codes = {i: _py_encode(v) for i, v in vecs}
    for q in (0, 1):
        dists = sorted((( _py_adc(by_id[q], py_codes[i]), i)
                        for i, _ in vecs))
        expect = [(q, r + 1, i, d) for r, (d, i) in enumerate(dists[:5])]
        have = sorted([(r["query_id"], r["rank"], r["vec_id"], r["adc_dist"])
                       for r in got if r["query_id"] == q], key=lambda t: t[1])
        assert have == expect


def test_ivfpq_arrow_lut_bound(spark):
    """The driver-side LUT build validates its memory footprint BEFORE
    collecting anything (VERDICT r4 item 7) and names the batch size
    that would fit."""
    import pytest

    from mapbox_filter_spark.operators.pq import ivfpq_topk_arrow

    df = spark.createDataFrame(
        [(i, v) for i, v in _vectors(80)],
        "vec_id long, embedding array<double>")
    cents = (df.filter(F.col("vec_id") % 20 == 0)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_vec")))
    queries = (df.filter(F.col("vec_id") < 4)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    with pytest.raises(ValueError, match="chunk the query batch"):
        ivfpq_topk_arrow(queries, df, cents, CB, k=5, nprobe=2,
                         max_lut_mb=1e-6)
