"""Local replica of the driver's DuckDB-oracle gate: every queries() entry is
run through Spark AND its oracle_sql() through DuckDB at sf0.01, comparing
row count, column names, and order-insensitive value multisets."""

import math

import duckdb
import pytest

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "entrymod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "__spark_entry__.py"))
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "__int__") and not isinstance(v, (bool, float)):
        try:
            return int(v)
        except Exception:
            return v
    return v


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(normalize(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(row) for row in sdf.collect()]

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: schema {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    sm, om = to_multiset(scols, srows), to_multiset(ocols, orows)
    if sm != om:
        diff1 = {k: v for k, v in sm.items() if om.get(k) != v}
        diff2 = {k: v for k, v in om.items() if sm.get(k) != v}
        raise AssertionError(
            f"{name}: value mismatch; spark-only {list(diff1.items())[:3]} "
            f"oracle-only {list(diff2.items())[:3]}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns == ["z", "x", "y", "layer", "feature_count"]


def test_driver_priority_family_coverage():
    """The driver verifies only the FIRST ~46-50 registered gates, so the
    head of the registration order must carry one representative of every
    operator family (VERDICT r4 item 1)."""
    from mapbox_filter_spark.queries import _DRIVER_PRIORITY, _all_queries

    reg = list(_all_queries())
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))
    assert reg[:len(_DRIVER_PRIORITY)] == _DRIVER_PRIORITY
    head = set(reg[:50])
    family_reps = [
        "tile_assign", "style_filter_readme", "style_filter_legacy",
        "zoom_gates", "tile_assembly", "window_renumber", "hash_diff",
        "manifest_scan", "prune_keys", "downcopy", "mvt_roundtrip",
        "serve_tile", "failure_any", "agg_pricing", "topk_events",
        "join_chain", "tile_set_ops", "manifest_rollup", "media_kind",
        "pip_join", "raster_join", "knn_ring", "radius_join",
        "s2_assign", "s2_cover_join", "s2_ring_knn", "hex_assign",
        "geohash_assign", "geom_stats", "dedup_exact",
        "dedup_minhash_lsh", "dedup_clusters", "lang_id",
        "curation_pipeline", "cosine_topk", "ivf_topk", "pq_adc_topk",
        "ann_lsh_topk", "asof_join", "sessionize", "funnel",
        "dataset_split", "bm25_topk", "ngram_lm", "heavy_hitters",
        "sssp_grid", "scd2_history", "decontaminate", "setsim_join",
    ]
    missing = [n for n in family_reps if n not in head]
    assert not missing, f"family reps outside the driver head: {missing}"
