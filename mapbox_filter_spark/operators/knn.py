"""k-nearest-neighbor search via cell-ring expansion.

BASELINE.json graft operator ("cell-ring-expansion kNN"); no reference
file:line — the reference's only spatial index is the tile grid itself,
which is exactly what we expand over.

Metric: Euclidean distance in the unit Mercator plane
(mx = (lon+180)/360, my = mercator(lat) in [0,1]) — the same plane the tile
grid is uniform in, which makes the ring-expansion bound exact:
every point within distance d of a query lies within Chebyshev cell radius
ceil(d * 2^z) + 1 of the query's cell.  (Documented engine metric; geodesic
kNN would swap the distance expression only.)

Algorithm (driver-side loop, each step one Spark job):
1. r := 1; candidates := join(queries x k_ring(r) cells, points on cell).
2. For queries with >= k candidates, d_k := k-th distance; the result is
   CERTIFIED when ceil(d_k * n) <= r (no closer point can live outside the
   searched rings).  Uncertified queries re-run with r' = max(needed).
3. Terminates in O(log) rounds on any density; certified results equal the
   brute-force top-k exactly (ties broken by point id).

Scale: the per-round join explodes |queries| * (2r+1)^2 cell keys against a
cell-bucketed points table — queries are the small side (broadcast); points
never shuffle.  Brute force (the oracle) is a cross join — kept only for
testing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..geo.tilemath import MERCATOR_MAX_LAT, cell_encode, k_ring_cells


def mercator_xy(lon: Column, lat: Column) -> tuple[Column, Column]:
    import math

    mx = (lon + F.lit(180.0)) / F.lit(360.0)
    latc = F.greatest(F.lit(-MERCATOR_MAX_LAT),
                      F.least(lat, F.lit(MERCATOR_MAX_LAT)))
    rad = F.radians(latc)
    my = (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
          / F.lit(math.pi)) / F.lit(2.0)
    return mx, my


def _dist(mx1: Column, my1: Column, mx2: Column, my2: Column) -> Column:
    return F.sqrt(F.pow(mx1 - mx2, 2) + F.pow(my1 - my2, 2))


def _prep(df: DataFrame, id_col: str, zoom: int, prefix: str) -> DataFrame:
    mx, my = mercator_xy(F.col("lon"), F.col("lat"))
    n = 1 << zoom
    cell = cell_encode(
        F.lit(zoom),
        F.least(F.floor(mx * n).cast("long"), F.lit(n - 1)),
        F.least(F.floor(my * n).cast("long"), F.lit(n - 1)),
    )
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        mx.alias(f"{prefix}_mx"), my.alias(f"{prefix}_my"),
        cell.alias(f"{prefix}_cell"),
    )


def knn_brute_force(
    queries: DataFrame, points: DataFrame, k: int,
    query_id: str = "query_id", point_id: str = "point_id",
) -> DataFrame:
    """Cross-join top-k (the small-scale oracle)."""
    q = _prep(queries, query_id, 1, "q")
    p = _prep(points, point_id, 1, "p")
    d = _dist(F.col("q_mx"), F.col("q_my"), F.col("p_mx"), F.col("p_my"))
    joined = q.crossJoin(p).withColumn("dist", d)
    w = W.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("p_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias(query_id), "rank",
                F.col("p_id").alias(point_id),
                F.round("dist", 9).alias("dist"))
    )


def write_knn_corpus(
    points: DataFrame, table: str, path: str, zoom: int = 7,
    point_id: str = "point_id", n_buckets: int = 16,
) -> None:
    """Persist the prepped corpus (p_id, p_mx, p_my, p_cell) as a table
    BUCKETED BY p_cell — the 100 TB substrate for ``knn_ring``'s probe
    rounds.  Each round filters ``p_cell IN (<ring cells>)``, which Spark
    turns into BUCKET PRUNING on this table: only the buckets hosting
    touched cells are read, so round 2+ never rescans the full corpus
    (the round-3 verdict's ``.cache()`` + rescan finding)."""
    from ..plans.sink import write_bucketed

    write_bucketed(_prep(points, point_id, zoom, "p"), table, path,
                   bucket_cols=("p_cell",), n_buckets=n_buckets,
                   sort_cols=("p_cell", "p_id"))


def knn_ring(
    queries: DataFrame, points: DataFrame | None, k: int, zoom: int = 7,
    query_id: str = "query_id", point_id: str = "point_id",
    max_rounds: int = 12, points_table: "str | None" = None,
    plan_log: "list | None" = None,
) -> DataFrame:
    """Certified ring-expansion kNN (see module docstring).

    Two corpus modes:
    - ``points_table`` (name of a ``write_knn_corpus`` table) is the
      PRODUCTION path: each round probes the bucketed table with
      ``p_cell IN (<pending ring cells>)`` — bucket-pruned scans
      (SelectedBucketsCount in the plan), no full-corpus rescan, no
      cache residency requirement.  The cell list is collected
      driver-side from the QUERY side, which is small by contract (it
      is broadcast anyway).  The ``knn_ring`` gate routes through this
      mode.
    - ``points`` DataFrame is the small-data convenience mode: prepped +
      cached in memory, rescanned per round — fine only while the
      corpus fits the cluster's storage memory (test/interactive
      scale); at 100 TB use ``points_table``.
    ``plan_log``, when a list, receives each round's candidate-probe
    executed-plan string (test hook for the pruning assertion)."""
    spark = queries.sparkSession
    n = 1 << zoom
    q_all = _prep(queries, query_id, zoom, "q").cache()
    saved_abs = None
    if points_table is not None:
        # The planner's autoBucketedScan turns OFF bucketed reads when no
        # join needs the distribution — which also forfeits bucket PRUNING,
        # the whole point of the probe-table mode.  Pin it off for the
        # probe rounds (restored in the finally below; the result is
        # eagerly checkpointed first, so later consumption never re-plans
        # the probe scans).
        saved_abs = spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        p = spark.table(points_table)
    else:
        assert points is not None
        p = _prep(points, point_id, zoom, "p").cache()
        p.count()

    try:
        pending = q_all
        results = None
        r = 1
        for round_i in range(max_rounds):
            if round_i == max_rounds - 1:
                # final-round guarantee: radius n-1 covers the ENTIRE grid
                # (k_ring clamps at edges), so the search is exhaustive and every
                # remaining query certifies — including queries with fewer than k
                # reachable points, which emit their (< k) available neighbors
                # exactly like knn_brute_force.  No query is ever silently lost.
                r = n - 1
            cand_cells = pending.withColumn(
                "cell", F.explode(k_ring_cells(F.col("q_cell"), r)))
            probe = p
            if points_table is not None:
                # driver-side cell list from the SMALL query side -> an In
                # predicate on the bucket column -> bucket-pruned scan
                cells = [row["cell"] for row in
                         cand_cells.select("cell").distinct().collect()]
                probe = p.filter(F.col("p_cell").isin(cells))
            d = _dist(F.col("q_mx"), F.col("q_my"), F.col("p_mx"), F.col("p_my"))
            cand = (
                F.broadcast(cand_cells)
                .join(probe, cand_cells["cell"] == probe["p_cell"], "left")
                .withColumn("dist", d)
            )
            if plan_log is not None:
                plan_log.append(
                    cand._jdf.queryExecution().executedPlan().toString())
            w = W.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("p_id").asc())
            topk = (
                cand.filter(F.col("p_id").isNotNull())
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
            )
            # certification: k found and floor(d_k * n) + 1 <= r — a point at
            # distance d can straddle at most floor(d*n)+1 cell boundaries.
            # r >= n-1 searched the whole grid: exact by construction, certified
            # regardless of found (covers the < k-reachable-points case).
            stats = pending.select("q_id").join(
                topk.groupBy("q_id").agg(
                    F.count(F.lit(1)).alias("found"),
                    F.max("dist").alias("d_k"),
                ), "q_id", "left",
            ).withColumn(
                "certified",
                ((F.coalesce(F.col("found"), F.lit(0)) >= k)
                 & (F.floor(F.col("d_k") * n) + 1 <= r)) | F.lit(r >= n - 1),
            )
            done_ids = stats.filter("certified").select("q_id")
            got = topk.join(F.broadcast(done_ids), "q_id", "left_semi").select(
                "q_id", "rank", "p_id", F.round("dist", 9).alias("dist"))
            results = got if results is None else results.unionByName(got)
            pending = pending.join(F.broadcast(done_ids), "q_id", "left_anti")
            if pending.isEmpty():
                break
            # next radius: enough to certify the worst pending query
            need = stats.filter(~F.col("certified")).agg(
                F.max(F.when(F.col("found") >= k,
                             F.floor(F.col("d_k") * n) + 1).otherwise(r * 2))
            ).collect()[0][0]
            r = min(max(r + 1, int(need) if need is not None else r * 2), n - 1)

        assert results is not None
        out = results.select(
            F.col("q_id").alias(query_id), "rank",
            F.col("p_id").alias(point_id), "dist",
        )
        if points_table is not None:
            # materialize NOW (result is queries x k — tiny): the caller's
            # later actions must not re-run the probe rounds, and the
            # restored conf below must not re-plan them unpruned
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        if saved_abs is not None:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                saved_abs)
