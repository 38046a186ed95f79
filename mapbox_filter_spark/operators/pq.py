"""Product quantization (PQ) for embedding columns — native, no UDF.

The 100 TB ANN memory story: a 64-dim float vector is 256 bytes; its PQ
code is M small integers (here 8 codes of 4 bits of information each) —
a 32× compression that turns a cluster-wide ANN sweep from "shuffle the
float corpus" into "scan byte codes + broadcast one query LUT"
(Jégou/Douze/Schmid, TPAMI 2011).  Composes with the IVF index in
operators/similarity.py (IVF-PQ: coarse cell filter, then ADC over the
cell's codes).

Everything here is whole-stage-codegen Column math:

* **Codebooks** are deterministic rationals ``((m·131+k·31+d·17)%19−9)/9``
  — a fixed pseudo-random lattice, bit-identical in any engine (exact
  int arithmetic, one IEEE division).  Production would train them with
  ``train_centroids`` (Lloyd) per subspace; the gate pins them so the
  DuckDB oracle can reproduce every distance bit-for-bit.
* **Encode** is an ``F.aggregate`` argmin fold over the K codewords per
  subspace — a bound-variable loop, NOT a ``when``-chain unroll (that
  duplicates the running best 2× per codeword → 2^K expression blowup).
* **ADC distance** is computed with the per-subspace subtotals
  parenthesized explicitly ``(Σ_d)`` then folded over m — the same
  association order the oracle's ``list_reduce(list(... ORDER BY m))``
  uses, so doubles match bit-for-bit.

No reference analogue (mapbox-filter has no vector search); this is
graft-mandated ANN surface next to IVF/LSH (SURVEY §2 extension block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pq_codebook(n_sub: int, n_codes: int, sub_dim: int,
                scale: float = 1.0) -> list:
    """``[m][k][d]`` codeword lattice — deterministic small integers
    ``((m·131+k·31+d·17) % 19 − 9)`` times ``scale``.  With an integer
    scale and integer-quantized vectors every PQ distance is an
    exact-integer double, so argmins and ADC sums are bit-reproducible
    in any engine regardless of summation order."""
    return [[[((m * 131 + k * 31 + d * 17) % 19 - 9) * scale
              for d in range(sub_dim)]
             for k in range(n_codes)]
            for m in range(n_sub)]


def _sub_dist(vec: Column, m: int, sub_dim: int, codeword) -> Column:
    """Σ_d (vec[m·sub+d] − codeword[d])² as a left-assoc chain.

    ``codeword`` is either a python list (literal codeword) or a Column
    of ``array<double>`` (lambda-bound codeword inside the argmin fold).
    """
    total = None
    for d in range(sub_dim):
        c = (F.lit(codeword[d]) if isinstance(codeword, list)
             else F.element_at(codeword, d + 1))
        t = F.element_at(vec, m * sub_dim + d + 1).cast("double") - c
        sq = t * t
        total = sq if total is None else total + sq
    return total


def pq_encode(vec: Column, codebook: list) -> Column:
    """``array<int>`` of per-subspace argmin codes (ties → smallest k,
    via strict ``<`` in the fold)."""
    sub_dim = len(codebook[0][0])
    n_codes = len(codebook[0])
    def _merge_fn(m: int, cb_lit: Column):
        # factory closure: PySpark derives HOF lambda arity from the
        # full signature (defaults included), so extra bound params
        # would be misread as a 3-arg lambda
        def merge(acc: Column, k: Column) -> Column:
            d = _sub_dist(vec, m, sub_dim, F.element_at(cb_lit, k + 1))
            return F.when(
                d < acc["bd"],
                F.struct(d.alias("bd"), k.cast("int").alias("bk"))
            ).otherwise(acc)
        return merge

    codes = []
    for m, cb_m in enumerate(codebook):
        cb_lit = F.array(*[
            F.array(*[F.lit(v) for v in word]) for word in cb_m])
        init = F.struct(F.lit(float("inf")).alias("bd"),
                        F.lit(-1).alias("bk"))
        state = F.aggregate(
            F.sequence(F.lit(0), F.lit(n_codes - 1)),
            init,
            _merge_fn(m, cb_lit),
            lambda acc: acc["bk"],
        )
        codes.append(state)
    return F.array(*codes)


def pq_adc_dist(q_vec: Column, codes: Column, codebook: list) -> Column:
    """Asymmetric PQ distance: Σ_m ‖q_m − codeword(codes[m])‖² with the
    per-subspace subtotals folded in m order (pinned association)."""
    sub_dim = len(codebook[0][0])
    total = None
    for m, cb_m in enumerate(codebook):
        cb_lit = F.array(*[
            F.array(*[F.lit(v) for v in word]) for word in cb_m])
        word = F.element_at(cb_lit, F.element_at(codes, m + 1) + 1)
        sub = _sub_dist(q_vec, m, sub_dim, word)
        total = sub if total is None else total + sub
    return total


def write_pq_codes(df: DataFrame, vec_col: str, codebook: list,
                   id_col: str = "vec_id") -> DataFrame:
    """The persisted form: ids + codes only — what a 100 TB corpus
    stores (the float vectors stay in cold storage)."""
    return df.select(id_col, pq_encode(F.col(vec_col), codebook)
                     .alias("pq_codes"))


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
               codebook: list, k: int = 10, nprobe: int = 3,
               query_id: str = "query_id", corpus_id: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN layout (Jégou et al.) —
    coarse inverted lists (broadcast argmin, operators/similarity.py
    ivf_assign) with RESIDUAL product-quantization inside each list.

    Index side: each corpus vector is assigned to its nearest centroid
    and only the 8-code PQ encoding of ``v − centroid`` is kept — no
    corpus shuffle (broadcast argmin + broadcast centroid join), 32×
    smaller scan body.  Query side: probe ``nprobe`` lists, build the
    per-list residual query, ADC-score ONLY those lists' codes via an
    equi join on cent_id.  Candidate volume ≈ nprobe/|lists| of the
    corpus, each candidate touched as codes, never floats.
    """
    from .similarity import ivf_assign

    assigned = ivf_assign(
        corpus.select(F.col(corpus_id).alias("c_id"),
                      F.col(vec_col).alias("c_vec")),
        centroids, "c_id", "c_vec", n_lists=1)
    with_cent = assigned.join(F.broadcast(centroids), "cent_id")
    residual = F.zip_with(F.col("c_vec"), F.col("cent_vec"),
                          lambda a, b: a - b)
    codes = with_cent.select(
        "c_id", "cent_id", pq_encode(residual, codebook).alias("pq_codes"))

    probes = ivf_assign(
        queries.select(F.col(query_id).alias("q_id"),
                       F.col(vec_col).alias("q_vec")),
        centroids, "q_id", "q_vec", n_lists=nprobe)
    probes = probes.join(F.broadcast(centroids), "cent_id").select(
        "q_id", "cent_id",
        F.zip_with(F.col("q_vec"), F.col("cent_vec"),
                   lambda a, b: a - b).alias("q_res"))
    cand = F.broadcast(probes).join(codes, "cent_id")
    scored = cand.select(
        "q_id", "c_id",
        pq_adc_dist(F.col("q_res"), F.col("pq_codes"), codebook)
        .alias("adc_dist"))
    w = Window.partitionBy("q_id").orderBy("adc_dist", "c_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias(query_id), "rank",
                    F.col("c_id").alias(corpus_id), "adc_dist"))


def pq_topk(codes_df: DataFrame, queries: DataFrame, codebook: list,
            k: int = 10, query_id: str = "query_id",
            query_vec: str = "qvec", corpus_id: str = "vec_id") -> DataFrame:
    """ADC top-k: broadcast the (tiny) query set against the code
    corpus — the corpus never shuffles; only ~|Q|·k rows reach the
    final window."""
    joined = codes_df.crossJoin(F.broadcast(queries))
    scored = joined.select(
        query_id, corpus_id,
        pq_adc_dist(F.col(query_vec), F.col("pq_codes"), codebook)
        .alias("adc_dist"))
    w = Window.partitionBy(query_id).orderBy("adc_dist", corpus_id)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "adc_dist"))
