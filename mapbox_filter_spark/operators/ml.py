"""Supervised feature-engineering operators: leave-one-out target
encoding and categorical Naive Bayes.

Both are training-data-pipeline primitives (the encode/label stages in
front of a model fit), built on the repo's exactness discipline:

- ``target_encode_loo`` keeps the encoding a ratio of exact integer
  sums (DECIMAL(38) combinations) with ONE pinned double division per
  row, so the feature is bit-identical across engines and cluster
  shapes.
- ``naive_bayes_predict`` trains on integer counts and scores in ln
  space as a FLAT expression (never a float aggregate, whose
  association order is engine-dependent): with identical op order,
  ln-chains on identical doubles are bit-stable across Spark and
  DuckDB (measured — the BM25/LM gates set the precedent).

Scale shape: both train stages are map-side-combinable groupBys onto
tiny (category/class-cardinality) tables that broadcast back onto the
fact scan — the fact table is read once and never exchanged until the
argmax window's hash partition by row id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(df: DataFrame, cat_col: str, target_col: str, *,
                      id_cols: Sequence[str], prior_weight: int = 0,
                      out_col: str = "enc") -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward the
    global mean (Micci-Barreca, SIGKDD Explorations 2001): for row i of
    category c,

        enc_i = (S_c − y_i + m·ȳ) / (n_c − 1 + m)

    computed as the exact rational
    ``((S_c − y_i)·N + m·S) / ((n_c − 1 + m)·N)`` (S, N the global sum
    and count), so there is exactly ONE double division per row.  The
    leave-one-out subtraction keeps each row's own target out of its
    feature — the standard leakage guard for high-cardinality
    categoricals.

    ``target_col`` must be integer-valued (cents-quantize upstream);
    the rational runs in DECIMAL(38)/HUGEINT (``max|S_c|·N < 10³⁸`` —
    S_c·N alone passes 2^63 around TPC-H SF1, so int64 would silently
    wrap where the oracle errors).  Rows with n_c == 1 and m == 0 (no
    leave-one-out evidence) get NULL.

    One groupBy(cat) to a category table (broadcast back) + one global
    aggregate — the fact scan is never exchanged.
    """
    ids = list(id_cols)
    y = F.col(target_col).cast("long")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(y).alias("_s_c"),
        F.count(F.lit(1)).alias("_n_c"))
    glob = df.groupBy().agg(F.sum(y).alias("_s_g"),
                            F.count(F.lit(1)).alias("_n_g"))
    m = int(prior_weight)
    dec = lambda c: c.cast("decimal(38,0)")
    # the rational runs in DECIMAL(38): S_c·N alone passes 2^63 around
    # TPC-H SF1 (per-category cent sums × row count) — the
    # cuped_adjust/ols2 recipe, HUGEINT on the oracle side
    num = ((dec(F.col("_s_c")) - dec(y)) * dec(F.col("_n_g"))
           + F.lit(m) * dec(F.col("_s_g"))).cast("double")
    den = ((dec(F.col("_n_c")) - 1 + F.lit(m))
           * dec(F.col("_n_g"))).cast("double")
    enc = F.when(F.col("_n_c") - 1 + F.lit(m) > 0, num / den)
    return (df.join(F.broadcast(per_cat), cat_col)
            .crossJoin(F.broadcast(glob))
            .select(*ids, cat_col, y.alias(target_col),
                    enc.alias(out_col)))


def _ln_ratio(num: Column, den: Column) -> Column:
    """ln(num/den) with both sides cast to double FIRST — the exact op
    order both engines must share for bit-stable ln chains."""
    return F.log(num.cast("double") / den.cast("double"))


def naive_bayes_train(train: DataFrame, class_col: str,
                      feature_cols: Sequence[str]):
    """Categorical NB with Laplace add-1 smoothing.  Returns
    ``(class_table, feature_tables, vocab_row)`` — all integer counts:
    class_table (``_cls, _n_c``); per feature f, counts
    (``_cls, _v, _n_fvc``); vocab_row is ONE row carrying each
    feature's TRAIN distinct-value count ``_vf{i}`` (the smoothing
    denominator) plus the global ``_n`` and class count ``_c``."""
    feats = list(feature_cols)
    cls = train.groupBy(F.col(class_col).alias("_cls")).agg(
        F.count(F.lit(1)).alias("_n_c"))
    tables = [
        train.groupBy(F.col(class_col).alias("_cls"),
                      F.col(f).alias("_v")).agg(
            F.count(F.lit(1)).alias("_n_fvc"))
        for f in feats
    ]
    vocab = train.groupBy().agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(class_col).alias("_c"),
        *[F.countDistinct(f).alias(f"_vf{i}")
          for i, f in enumerate(feats)])
    return cls, tables, vocab


def naive_bayes_predict(test: DataFrame, model, *, id_cols: Sequence[str],
                        feature_cols: Sequence[str],
                        out_col: str = "pred") -> DataFrame:
    """Score every test row against every class and take the argmax
    (ln-posterior desc, class asc).  The posterior is ONE flat ln-chain
    expression — ln(prior) + Σ_f ln(conditional) in declared feature
    order — so the double is bit-identical in any engine with the same
    ln.  Unseen (value, class) pairs fall back to the Laplace floor
    1/(n_c + V_f) via the left-join NULL branch.

    |classes| is assumed broadcast-small: the test scan fans out ×C
    through broadcast joins; the only exchange is the final argmax
    window's hash partition by row id.
    """
    cls, tables, vocab = model
    ids = list(id_cols)
    feats = list(feature_cols)
    scored = (test.select(*ids, *feats)
              .crossJoin(F.broadcast(cls))
              .crossJoin(F.broadcast(vocab)))
    score = _ln_ratio(F.col("_n_c") + 1, F.col("_n") + F.col("_c"))
    for i, f in enumerate(feats):
        t = tables[i].select(
            F.col("_cls").alias(f"_tc{i}"), F.col("_v").alias(f"_tv{i}"),
            F.col("_n_fvc").alias(f"_nf{i}"))
        scored = scored.join(
            F.broadcast(t),
            (F.col("_cls") == F.col(f"_tc{i}"))
            & (F.col(f) == F.col(f"_tv{i}")), "left") \
            .drop(f"_tc{i}", f"_tv{i}")
        score = score + _ln_ratio(
            F.coalesce(F.col(f"_nf{i}"), F.lit(0)) + 1,
            F.col("_n_c") + F.col(f"_vf{i}"))
    w = Window.partitionBy(*ids).orderBy(F.col("_score").desc(),
                                         F.col("_cls").asc())
    return (scored.withColumn("_score", score)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(*ids, F.col("_cls").alias(out_col), "_score"))
