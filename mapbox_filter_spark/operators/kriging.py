"""Ordinary kriging on nearest neighbours — the geostatistical
interpolator consuming the semivariogram family's model.

Reference parity: mapbox-filter has no interpolation surface; this
completes the engine's geostat block (semivariogram → kriging) beside
the deterministic Shepard IDW (operators/spatialstats.py): IDW weights
by inverse distance alone, kriging weights by the variogram structure
AND de-clusters correlated neighbours — the BLUP of Matheron 1963.

Exactness: with a linear variogram γ(h) = c·h the ordinary-kriging
weights are SLOPE-INVARIANT (c cancels in the bordered system), so the
operator pins γ(h) = floor(√h²) — integer distances — and solves the
3-neighbour bordered 4×4 system by Cramer expansion over EXACT int64
determinants (the 0/1 border keeps every term degree ≤ 3 in γ: with
γ < 2²¹ the 24-term sums stay far inside int64).  The only IEEE ops
are the three λ = det_i/det divisions and the pinned prediction fold.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kriging_ok"]


def _perm_sign(p) -> int:
    sign, seen = 1, set()
    for i in range(len(p)):
        if i in seen:
            continue
        j, ln = i, 0
        while j not in seen:
            seen.add(j)
            j = p[j]
            ln += 1
        if ln % 2 == 0:
            sign = -sign
    return sign


ONE = object()  # marker for exact-1 entries (dropped from products)


def det4_terms(m):
    """Signed permutation terms of a 4×4 matrix given as m[i][j] ->
    value or None (exact zero) or 1 (exact one).  Yields (sign,
    [non-one entries]) with zero terms skipped — shared by the Column
    builder here and the oracle SQL generator."""
    for p in permutations(range(4)):
        entries = [m[i][p[i]] for i in range(4)]
        if any(e is None for e in entries):
            continue
        yield _perm_sign(p), [e for e in entries if e is not ONE]



def _det4_col(m) -> Column:
    total = None
    for sign, entries in det4_terms(m):
        term = None
        for e in entries:
            term = e if term is None else term * e
        if term is None:
            term = F.lit(1).cast("long")
        term = term if sign > 0 else -term
        total = term if total is None else total + term
    return total


def kriging_ok(queries: DataFrame, corpus: DataFrame, radius: int, *,
               query_id: str = "query_id", corpus_id: str = "point_id",
               x: str = "x", y: str = "y",
               z: str = "z") -> DataFrame:
    """Ordinary-kriging prediction at each query point from its 3
    nearest corpus points within ``radius`` (grid_knn_join), linear
    variogram (slope-invariant, see module docstring):

        [ Γ  1 ] [λ]   [γ_q]          λ_i = det(A_i)/det(A)
        [ 1ᵀ 0 ] [μ] = [ 1 ],          ẑ = Σ λ_i·z_i

    Contract: queries with fewer than 3 in-radius neighbours are
    dropped (interpolation needs the full stencil); an exact hit
    (d² = 0) returns that point's value (the Shepard exact-hit rule);
    a singular system (det = 0, e.g. coincident neighbours) yields
    NULL pred with the determinant exposed for audit.

    Shape: the kNN cell join + ONE corpus equi-join to pull
    coordinates/values + a per-query 3-wide pivot; the solve is pure
    whole-stage-codegen arithmetic.

    Returns ``(query_id, det, pred)``.
    """
    from .cluster import grid_knn_join

    nn = grid_knn_join(queries, corpus, 3, radius,
                       query_id=query_id, corpus_id=corpus_id,
                       x=x, y=y)
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(x).cast("long").alias("_nx"),
                      F.col(y).cast("long").alias("_ny"),
                      F.col(z).cast("long").alias("_nz"))
    q = queries.select(F.col(query_id).alias("qid"),
                       F.col(x).cast("long").alias("_qx"),
                       F.col(y).cast("long").alias("_qy"))
    enr = (nn.withColumnRenamed(query_id, "qid")
           .withColumnRenamed(corpus_id, "corpus_id")
           .join(c, "corpus_id").join(q, "qid"))
    wide = (enr.groupBy("qid", "_qx", "_qy")
            .agg(F.array_sort(F.collect_list(F.struct(
                "rank", "d2", "_nx", "_ny", "_nz"))).alias("_nb"))
            .filter(F.size("_nb") == 3))
    nb = [F.element_at(F.col("_nb"), i + 1) for i in range(3)]

    def gdist(ax, ay, bx, by) -> Column:
        d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        return F.floor(F.sqrt(d2.cast("double"))).cast("long")

    from .hof import bind_once

    def build(g12: Column, g13: Column, g23: Column, gq1: Column,
              gq2: Column, gq3: Column) -> Column:
        # γ's bind ONCE: the 4×24-term Cramer expansion references
        # each ~30 times, and inlined sqrt subtrees blow past the
        # codegen method limit (observed: janino compile failure +
        # interpreted fallback)
        g = {(0, 1): g12, (0, 2): g13, (1, 2): g23}
        gq = [gq1, gq2, gq3]

        def at(i, j):
            if i == 3 and j == 3:
                return None
            if i == 3 or j == 3:
                return ONE
            if i == j:
                return None
            return g[(min(i, j), max(i, j))]

        A = [[at(i, j) for j in range(4)] for i in range(4)]
        det = _det4_col(A)
        dets = []
        for col in range(3):
            b = [gq[0], gq[1], gq[2], ONE]
            Ai = [[b[i] if j == col else A[i][j] for j in range(4)]
                  for i in range(4)]
            dets.append(_det4_col(Ai))
        # try_divide: the singular (det=0) branch still evaluates the
        # struct under ANSI; the caller gates pred on det != 0
        lam = [F.try_divide(d.cast("double"), det.cast("double"))
               for d in dets]
        pred = ((lam[0] * nb[0]["_nz"].cast("double")
                 + lam[1] * nb[1]["_nz"].cast("double"))
                + lam[2] * nb[2]["_nz"].cast("double"))
        return F.struct(det.alias("d"), pred.alias("p"))

    solved = bind_once({
        "g12": gdist(nb[0]["_nx"], nb[0]["_ny"],
                     nb[1]["_nx"], nb[1]["_ny"]),
        "g13": gdist(nb[0]["_nx"], nb[0]["_ny"],
                     nb[2]["_nx"], nb[2]["_ny"]),
        "g23": gdist(nb[1]["_nx"], nb[1]["_ny"],
                     nb[2]["_nx"], nb[2]["_ny"]),
        "gq1": F.floor(F.sqrt(nb[0]["d2"].cast("double"))).cast("long"),
        "gq2": F.floor(F.sqrt(nb[1]["d2"].cast("double"))).cast("long"),
        "gq3": F.floor(F.sqrt(nb[2]["d2"].cast("double"))).cast("long"),
    }, build)
    mid = wide.select("qid", "_nb", solved.alias("_kb"))
    nb0 = F.element_at(F.col("_nb"), 1)
    exact = nb0["d2"] == 0
    det_c, pred_c = F.col("_kb.d"), F.col("_kb.p")
    return mid.select(
        F.col("qid").alias(query_id),
        F.when(exact, F.lit(None).cast("long")).otherwise(det_c)
        .alias("det"),
        F.when(exact, nb0["_nz"].cast("double"))
        .when(det_c != 0, pred_c).alias("pred"))
