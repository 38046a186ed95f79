"""Clustered data layout: write tables physically ordered by a locality
key so parquet min/max statistics prune files and row groups at read time.

The reference engine controls scan locality with its mbtiles primary key
(SURVEY §2.3 sorts — tiles are read back in index order); a 100 TB lake
needs the same idea at the storage-format level.  Parquet keeps per
row-group min/max for every column: if rows are *clustered* on a key,
any range predicate on that key touches only the few row groups whose
stat interval overlaps — the rest never leave object storage.  With a
space-filling-curve key (the S2 Hilbert cell id, geo/s2.py) that turns
2-D spatial locality into 1-D range locality, so bbox/region probes
become pruned range scans.

``write_clustered`` = ``repartitionByRange`` (a range shuffle over a
sampled key distribution — files then hold DISJOINT key ranges) +
``sortWithinPartitions`` (row groups within a file are ordered too).
That is the full Z-ORDER-style pipeline for the single-key case; for a
composite spatial key, cluster on the S2 cell id, which already
interleaves lon/lat.

Evidence harness: ``rowgroup_stats``/``pruning_ratio`` read the parquet
footers (pyarrow) and measure exactly how many row groups a given cell
range would touch — the number a 100 TB scan pays for.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_clustered",
    "cluster_by_s2",
    "cluster_by_geohash",
    "s2_range_predicate",
    "geohash_prefix_predicate",
    "geohash_prefix_ranges",
    "rowgroup_stats",
    "pruning_ratio",
]


def write_clustered(
    df: DataFrame,
    path: str,
    order_by: list[str],
    *,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered on ``order_by``: a range
    repartition gives each output file a disjoint key range, and the
    in-partition sort orders row groups inside each file.  ``n_files``
    sizes the range shuffle — at scale pick ``total_bytes /
    target_file_bytes`` (128-512 MB files keep footers small and S3
    listings sane)."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in order_by])
       .sortWithinPartitions(*order_by)
       .write.mode(mode).parquet(path))


def cluster_by_s2(
    df: DataFrame,
    path: str,
    *,
    lon: str = "lon",
    lat: str = "lat",
    level: int = 12,
    n_files: int,
    cell_col: str = "cell",
    mode: str = "overwrite",
) -> None:
    """Attach the S2 Hilbert cell id and write clustered on it.  The
    Hilbert curve preserves locality: nearby (lon, lat) → nearby cell
    ids → the same or adjacent files/row groups."""
    from ..geo.s2 import with_s2_cell

    d = with_s2_cell(df, lon=lon, lat=lat, level=level, out=cell_col)
    write_clustered(d, path, [cell_col], n_files=n_files, mode=mode)


def s2_range_predicate(probe_cells: list[int],
                       cell_col: str = "cell") -> Column:
    """OR of ``cell BETWEEN range_min(c) AND range_max(c)`` over a
    covering — plain comparisons on a long column, so Spark pushes them
    into the parquet scan (PushedFilters) where row-group stats apply."""
    from ..geo.s2 import py_s2_range

    pred = None
    for c in probe_cells:
        lo, hi = py_s2_range(c)
        term = (F.col(cell_col) >= F.lit(lo)) & (F.col(cell_col) <= F.lit(hi))
        pred = term if pred is None else (pred | term)
    if pred is None:
        raise ValueError("empty covering")
    return pred


@dataclass
class RowGroupStat:
    file: str
    n_rows: int
    cmin: int
    cmax: int


def rowgroup_stats(path: str, cell_col: str = "cell") -> list[RowGroupStat]:
    """Per-row-group (min, max) of ``cell_col`` from the parquet footers
    — ground truth for what a stats-pruned scan would read."""
    import pyarrow.parquet as pq

    out: list[RowGroupStat] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        idx = f.schema_arrow.get_field_index(cell_col)
        for g in range(f.metadata.num_row_groups):
            col = f.metadata.row_group(g).column(idx)
            st = col.statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no stats for {cell_col} in {name}")
            out.append(RowGroupStat(name, f.metadata.row_group(g).num_rows,
                                    st.min, st.max))
    return out


def pruning_ratio(path: str, ranges: list[tuple[int, int]],
                  cell_col: str = "cell") -> float:
    """Fraction of row groups a stats-pruned reader must touch for an OR
    of cell ranges.  0.02 means 98 % of the table is skipped from the
    footer alone."""
    stats = rowgroup_stats(path, cell_col)
    touched = sum(
        1 for s in stats
        if any(not (s.cmax < lo or s.cmin > hi) for lo, hi in ranges)
    )
    return touched / len(stats) if stats else 0.0


def cluster_by_geohash(
    df: DataFrame,
    path: str,
    *,
    lon: str = "lon",
    lat: str = "lat",
    precision: int = 6,
    n_files: int,
    gh_col: str = "gh",
    mode: str = "overwrite",
) -> None:
    """Attach the base-32 geohash key and write clustered on it — the
    STRING-keyed twin of ``cluster_by_s2``: lexicographic geohash order is
    Morton-curve order, so nearby points share prefixes and land in the
    same files/row groups, and a prefix probe becomes a string-range
    pruned scan (parquet keeps string min/max stats too)."""
    from ..geo.geohash import geohash

    d = df.withColumn(gh_col, geohash(F.col(lon), F.col(lat), precision))
    write_clustered(d, path, [gh_col], n_files=n_files, mode=mode)


def geohash_prefix_predicate(prefixes: list[str],
                             gh_col: str = "gh") -> Column:
    """OR of ``startswith(prefix)`` — Catalyst pushes StringStartsWith
    into the parquet scan (PushedFilters), where row-group string min/max
    stats prune exactly like the S2 BETWEEN ranges on int64."""
    pred = None
    for p in prefixes:
        term = F.col(gh_col).startswith(p)
        pred = term if pred is None else (pred | term)
    if pred is None:
        raise ValueError("empty prefix list")
    return pred


def geohash_prefix_ranges(prefixes: list[str],
                          precision: int) -> list[tuple]:
    """[lo, hi] string intervals equivalent to each prefix at the stored
    precision ('0' and 'z' are the geohash alphabet's extremes) — feed to
    ``pruning_ratio`` for footer-stat evidence."""
    return [(p.ljust(precision, "0"), p.ljust(precision, "z"))
            for p in prefixes]


def compaction_plan(files: DataFrame, target: int, size_col: str = "size",
                    order_cols: "Sequence[str]" = ("key",),
                    partition_cols: "Sequence[str]" = ()) -> DataFrame:
    """Small-file compaction planning: assign files to output bins of
    ~``target`` cumulative size, walking in key order — ``bin =
    (bytes before this file) div target``.

    Key properties for a clustered store: bins are CONTIGUOUS key
    ranges (the rewrite preserves the sort/cluster order, so min/max
    pruning still works after compaction), the plan is deterministic
    (pure cumsum, no packing heuristics), and no bin exceeds
    ``target + max_file_size``.  Scoped per ``partition_cols`` when
    given (the 100 TB shape: plan each store partition independently —
    a global single-partition window would serialize the walk); a file
    MANIFEST is metadata, thousands of rows per partition, so the
    window is cheap either way."""
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols).orderBy(*order_cols) \
        .rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    return (files.withColumn("_cum_before", before)
            .withColumn("bin", F.expr(f"_cum_before div {target}"))
            .drop("_cum_before"))


def range_bounds(df: DataFrame, key_col: str, k: int,
                 id_tiebreak: "str | None" = None) -> DataFrame:
    """Exact equi-depth range-partition boundaries: the ``k−1`` split
    keys that divide the input into ``k`` buckets of (near-)equal row
    count — boundary ``j`` is the key at sorted position
    ``floor(j·n/k)`` (1-based), i.e. what Spark's RangePartitioner
    approximates by sampling.  This exact form is for METADATA-scale
    inputs (manifests, cell directories — the store-layout planning
    path); on raw data use a sample first, the exact bound computation
    is then this same operator on the sample.  One global-order window
    over the (small) input + a broadcast count."""
    from pyspark.sql import Window

    order = [key_col] + ([id_tiebreak] if id_tiebreak else [])
    w = Window.orderBy(*order)
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    ranked = (df.select(key_col, F.row_number().over(w).alias("_rn"))
              .crossJoin(F.broadcast(n)))
    pos = F.expr(f"_j * _n div {k}")
    js = F.array(*[F.lit(j) for j in range(1, k)])
    return (ranked.select(key_col, "_rn", "_n",
                          F.explode(js).alias("_j"))
            .filter(F.col("_rn") == pos)
            .select(F.col("_j").alias("bucket"),
                    F.col(key_col).alias("boundary_key")))
