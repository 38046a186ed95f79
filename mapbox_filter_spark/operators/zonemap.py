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
