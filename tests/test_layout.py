"""Clustered-layout tests (plans/layout.py): the Hilbert-clustered
parquet layout must (a) return identical results to an unclustered
layout, (b) push the S2 range predicate into the scan, and (c) prune a
measurably larger fraction of row groups via footer stats."""

import pytest
from pyspark.sql import functions as F

from mapbox_filter_spark.geo.s2 import py_s2_parent, py_s2_range
from mapbox_filter_spark.plans.layout import (
    cluster_by_s2,
    pruning_ratio,
    rowgroup_stats,
    s2_range_predicate,
)
from mapbox_filter_spark.sources.features import features_from_lineitem

SF = "/root/testdata/sf0.001"
CLUSTERED = "/tmp/mfs_layout_clustered"
SHUFFLED = "/tmp/mfs_layout_shuffled"
LEVEL = 12
N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark):
    from mapbox_filter_spark.geo.s2 import with_s2_cell

    feats = features_from_lineitem(spark, SF).select(
        "feature_id", "lon", "lat")
    cluster_by_s2(feats, CLUSTERED, level=LEVEL, n_files=N_FILES,
                  cell_col="cell")
    # same rows, same file count, key-hash placement (no spatial order)
    d = with_s2_cell(feats, level=LEVEL, out="cell")
    d.repartition(N_FILES, "feature_id").write.mode("overwrite") \
        .parquet(SHUFFLED)
    return CLUSTERED, SHUFFLED


@pytest.fixture(scope="module")
def probe(spark, layouts):
    """The DENSEST level-5 ancestor in the data — deterministic (unlike
    ``first()``, whose row depends on scheduling) and guaranteed to hold
    enough rows that the hash-placed layout touches ~every file while
    the clustered one confines the contiguous range to a few."""
    from mapbox_filter_spark.geo.s2 import s2_parent

    clustered, _ = layouts
    row = (spark.read.parquet(clustered)
           .groupBy(s2_parent(F.col("cell"), 5).alias("p"))
           .agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.col("n").desc(), F.col("p").asc())
           .first())
    parent = row["p"]
    return [py_s2_range(parent)], parent


def test_results_identical(spark, layouts, probe):
    clustered, shuffled = layouts
    ranges, parent = probe
    pred = s2_range_predicate([parent])
    a = sorted(r["feature_id"] for r in
               spark.read.parquet(clustered).filter(pred).collect())
    b = sorted(r["feature_id"] for r in
               spark.read.parquet(shuffled).filter(pred).collect())
    assert a == b
    assert 0 < len(a) < spark.read.parquet(clustered).count()


def test_range_predicate_pushed(spark, layouts, probe):
    clustered, _ = layouts
    _, parent = probe
    df = spark.read.parquet(clustered).filter(s2_range_predicate([parent]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # the range bounds must reach the scan, not sit in a post-filter only
    scan_line = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "GreaterThanOrEqual(cell" in scan_line \
        or "Or(And(" in scan_line, scan_line


def test_clustering_prunes_rowgroups(layouts, probe):
    clustered, shuffled = layouts
    ranges, _ = probe
    r_clustered = pruning_ratio(clustered, ranges)
    r_shuffled = pruning_ratio(shuffled, ranges)
    # hash placement scatters the probe range across ~every file; the
    # clustered layout confines it to the files owning that key range
    assert r_shuffled >= 0.9, r_shuffled
    assert r_clustered <= 0.25, r_clustered


def test_rowgroup_stats_sane(layouts):
    clustered, _ = layouts
    stats = rowgroup_stats(clustered)
    assert stats and all(s.cmin <= s.cmax and s.n_rows > 0 for s in stats)
    # disjoint file ranges: sort by min, maxes must not interleave
    by_min = sorted(stats, key=lambda s: s.cmin)
    for a, b in zip(by_min, by_min[1:]):
        assert a.cmax <= b.cmin, (a, b)


# ------------------------------------------------- geohash string layout

from mapbox_filter_spark.geo.geohash import geohash  # noqa: E402
from mapbox_filter_spark.plans.layout import (  # noqa: E402
    cluster_by_geohash, geohash_prefix_predicate, geohash_prefix_ranges)

GH_CLUSTERED = "/tmp/mfs_layout_gh_clustered"
GH_SHUFFLED = "/tmp/mfs_layout_gh_shuffled"
GH_PREC = 6


@pytest.fixture(scope="module")
def gh_layouts(spark):
    feats = features_from_lineitem(spark, SF).select(
        "feature_id", "lon", "lat")
    cluster_by_geohash(feats, GH_CLUSTERED, precision=GH_PREC,
                       n_files=N_FILES)
    d = feats.withColumn("gh", geohash(F.col("lon"), F.col("lat"), GH_PREC))
    d.repartition(N_FILES, "feature_id").write.mode("overwrite") \
        .parquet(GH_SHUFFLED)
    return GH_CLUSTERED, GH_SHUFFLED


@pytest.fixture(scope="module")
def gh_probe(spark, gh_layouts):
    clustered, _ = gh_layouts
    row = (spark.read.parquet(clustered)
           .groupBy(F.substring("gh", 1, 2).alias("p"))
           .agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.col("n").desc(), F.col("p").asc())
           .first())
    return row["p"]


def test_gh_results_identical(spark, gh_layouts, gh_probe):
    clustered, shuffled = gh_layouts
    pred = geohash_prefix_predicate([gh_probe])
    a = sorted(r["feature_id"] for r in
               spark.read.parquet(clustered).filter(pred).collect())
    b = sorted(r["feature_id"] for r in
               spark.read.parquet(shuffled).filter(pred).collect())
    assert a == b
    assert 0 < len(a) < spark.read.parquet(clustered).count()


def test_gh_prefix_pushed_to_scan(spark, gh_layouts, gh_probe):
    clustered, _ = gh_layouts
    df = spark.read.parquet(clustered) \
        .filter(geohash_prefix_predicate([gh_probe]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "StringStartsWith(gh" in scan_line, scan_line


def test_gh_clustering_prunes_rowgroups(gh_layouts, gh_probe):
    clustered, shuffled = gh_layouts
    ranges = geohash_prefix_ranges([gh_probe], GH_PREC)
    r_clustered = pruning_ratio(clustered, ranges, cell_col="gh")
    r_shuffled = pruning_ratio(shuffled, ranges, cell_col="gh")
    assert r_shuffled >= 0.9, r_shuffled
    assert r_clustered <= 0.3, r_clustered


def test_gh_rowgroup_string_ranges_disjoint(gh_layouts):
    clustered, _ = gh_layouts
    stats = rowgroup_stats(clustered, cell_col="gh")
    assert stats and all(s.cmin <= s.cmax for s in stats)
    by_min = sorted(stats, key=lambda s: s.cmin)
    for a, b in zip(by_min, by_min[1:]):
        assert a.cmax <= b.cmin, (a, b)
