"""Exact set-similarity self-join via prefix filtering — the
AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08 —
public algorithms, re-derived for DataFrames).

Finds every pair of sets with Jaccard(A, B) ≥ τ EXACTLY, without the
quadratic all-pairs join and without MinHash's false negatives.  The
LSH family (operators/dedup.py) is the probabilistic scale path; this
is the exact one — the right tool when τ is high and misses are
unacceptable (benchmark decontamination, license-pool joins,
co-visitation audiences).

Prefix-filter theorem: order every set's tokens by one GLOBAL order
(here: ascending document frequency, token id as tie-break — rarest
first).  If |A∩B| ≥ o then the first |A|-o+1 tokens of A and the first
|B|-o+1 tokens of B share at least one token (fewer shared prefix
tokens would leave too few suffix slots to reach o).  Jaccard ≥ τ
forces |A∩B| ≥ ⌈τ·|A|⌉ (the union is at least |A|), so emitting only
each set's first |A| - ⌈τ·|A|⌉ + 1 tokens and equi-joining on token
finds EVERY qualifying pair — completeness is a theorem, not a recall
curve.

Scale shape: the candidate join keys on PREFIX tokens, which the
frequency order biases toward the RAREST tokens in each set — exactly
the opposite of the hot-key join a naive token join produces (a
stopword token never enters a prefix unless the set is nearly all
stopwords).  Three shuffles: token-frequency agg, per-set ordering
window, candidate join; verification counts intersections only for
candidate pairs and applies the τ test in exact integer
cross-multiplication ((den+num)·|∩| ≥ num·(|A|+|B|)) — no float
thresholds, value-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["set_similarity_join"]


def set_similarity_join(df: DataFrame, id_col: str, token_col: str,
                        tau_num: int, tau_den: int) -> DataFrame:
    """All pairs of ids whose token sets have Jaccard ≥ tau_num/tau_den.

    ``df`` holds (id, token) rows; duplicates are deduplicated here.
    Returns ``(id_a, id_b, n_inter, n_union)`` with id_a < id_b —
    exact integers.
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num <= tau_den")
    sets = df.select(F.col(id_col).alias("sid"),
                     F.col(token_col).alias("tok")).distinct()
    freq = sets.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    w = Window.partitionBy("sid").orderBy("df_", "tok")
    ws = Window.partitionBy("sid")
    ranked = (sets.join(freq, "tok")
              .select("sid", "tok",
                      F.row_number().over(w).alias("pos"),
                      F.count(F.lit(1)).over(ws).alias("sz")))
    # prefix length |A| - ceil(tau*|A|) + 1; ceil via exact integer
    # floor division (completeness hinges on it — no double quotient)
    from ..geo.tilemath import floor_div
    need = floor_div(F.col("sz") * tau_num + tau_den - 1, tau_den)
    prefix = ranked.filter(F.col("pos") <= F.col("sz") - need + 1) \
        .select("sid", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                   & (F.col("a.sid") < F.col("b.sid")))
            .select(F.col("a.sid").alias("id_a"),
                    F.col("b.sid").alias("id_b"))
            .distinct())
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = (cand
             .join(sa, F.col("sa.sid") == F.col("id_a"))
             .join(sb, (F.col("sb.sid") == F.col("id_b"))
                   & (F.col("sb.tok") == F.col("sa.tok")))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sz = ranked.select("sid", "sz").distinct()
    za = sz.select(F.col("sid").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sz.select(F.col("sid").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(za, "id_a").join(zb, "id_b")
            .filter((tau_den + tau_num) * F.col("n_inter")
                    >= tau_num * (F.col("sz_a") + F.col("sz_b")))
            .select("id_a", "id_b", "n_inter",
                    (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
                    .alias("n_union")))
