"""Zone maps (per-file min/max statistics) and the file-skipping
report — the data-layout primitive behind parquet row-group pruning,
Iceberg manifest filtering, and every "sorted by time, so the scan
skips 97% of files" story.  Complements the z-order / Hilbert
clustering operators: those CHOOSE a layout, this MEASURES what a
predicate can skip under it.

Exact integers end-to-end: the zone map is one map-side-combinable
groupBy (n_rows, min, max per file), and the prune report is one
aggregate over the (tiny) zone-map table.  The fact table is touched
exactly once; the report never rescans it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zone_map", "zone_map_prune_report"]


def zone_map(df: DataFrame, file_col: str, value_col: str) -> DataFrame:
    """Per-file zone map: ``(file_id, n_rows, vmin, vmax)`` over an
    integer value column."""
    v = F.col(value_col).cast("long")
    return (df.groupBy(F.col(file_col).alias("file_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(v).alias("vmin"),
                 F.max(v).alias("vmax")))


def zone_map_prune_report(zm: DataFrame, lo: int, hi: int) -> DataFrame:
    """File-skipping report for the predicate ``lo <= v <= hi``
    against a zone map: a file is PRUNED iff its [vmin, vmax] is
    disjoint from [lo, hi] (vmax < lo or vmin > hi) — exactly the
    parquet/Iceberg min-max skip rule.

    Output: one row — ``(n_files, n_pruned, rows_total, rows_skipped)``.
    """
    pruned = (F.col("vmax") < int(lo)) | (F.col("vmin") > int(hi))
    return zm.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(pruned.cast("int")).cast("long").alias("n_pruned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum(F.when(pruned, F.col("n_rows")).otherwise(0))
        .cast("long").alias("rows_skipped"))


def str_pack(df: DataFrame, *, id_col: str, x_col: str, y_col: str,
             leaf_cap: int = 256) -> DataFrame:
    """Sort-Tile-Recursive R-tree bulk-load packing (Leutenegger et
    al. ICDE'97): the layout CHOOSER for spatial page locality —
    points are sliced into ⌈√P⌉ vertical strips by x, each strip cut
    into leaves by y (P = ⌈n/leaf_cap⌉), yielding near-square leaf
    MBRs with bounded occupancy.  This is how spatial engines pack
    parquet row groups / R-tree leaves so bbox scans touch O(answer)
    pages; zone_map then MEASURES what a query skips under it.

    Determinism: both cuts are NTILE over (coordinate, id) — the id
    tiebreak pins bucket membership exactly, so leaf assignment and
    every MBR value-hash across engines (Spark ntile and SQL NTILE
    share the same first-buckets-larger definition).

    Scale shape: the x-cut here is an EXACT global NTILE (one
    single-partition window sort — fine at gate scale, and the exact
    semantics the value-hash needs); the y-cut parallelizes per strip.
    At fleet scale the x-cut becomes approx-quantile cut points +
    range partitioning (same leaves up to boundary rows) — the
    standard trade documented for every exact-order operator here.
    The strip/leaf counts derive from ONE driver-side COUNT (a
    control scalar, like the kmeans centroid table).

    Returns ``(strip, leaf, n_pts, xmin, xmax, ymin, ymax)``.
    """
    import math

    from pyspark.sql import Window as W

    if leaf_cap < 1:
        raise ValueError("leaf_cap must be positive")
    n = df.count()
    if n == 0:
        raise ValueError("str_pack: empty input")
    p = math.ceil(n / leaf_cap)
    s = math.ceil(math.sqrt(p))
    per_strip = math.ceil(p / s)
    pts = df.select(F.col(id_col).alias("_id"),
                    F.col(x_col).cast("long").alias("_x"),
                    F.col(y_col).cast("long").alias("_y"))
    wx = W.orderBy("_x", "_id")
    striped = pts.withColumn("strip", F.ntile(s).over(wx))
    wy = W.partitionBy("strip").orderBy("_y", "_id")
    leaved = striped.withColumn("leaf", F.ntile(per_strip).over(wy))
    return (leaved.groupBy("strip", "leaf")
            .agg(F.count(F.lit(1)).alias("n_pts"),
                 F.min("_x").alias("xmin"), F.max("_x").alias("xmax"),
                 F.min("_y").alias("ymin"), F.max("_y").alias("ymax")))
