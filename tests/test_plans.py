"""Physical-plan regression guards: the 100 TB story in assertions.

- no row-at-a-time Python (BatchEvalPython) anywhere; ArrowEvalPython only
  in the explicitly-Arrow kernels (PIP)
- column pruning reaches the parquet scan (feature derivation reads 4 of 11
  lineitem columns)
- whole-stage codegen wraps the filter
- the dim-chain join broadcasts
"""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

spec = importlib.util.spec_from_file_location(
    "entrymod2", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              "__spark_entry__.py"))
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

SF = "/root/testdata/sf0.001"

# queries whose plans legitimately contain an Arrow-batched kernel
# (pip: numpy crossing-count; rdp: per-line recursive Douglas-Peucker —
# inherently divide-and-conquer, vectorized per geometry batch)
ARROW_OK = {"pip_join", "zonal_stats", "rdp_simplify", "gram_matrix",
            "convex_hull_cells"}
# driver-loop operators not expressible as one plan
SKIP = {"knn_ring"}


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", [n for n in entrymod.queries()
                                  if n not in SKIP])
def test_no_python_in_hot_path(spark, name):
    df = entrymod.queries()[name](spark, SF)
    p = phys(df)
    assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python!"
    if name not in ARROW_OK:
        assert "ArrowEvalPython" not in p, f"{name}: unexpected UDF"


def test_column_pruning_reaches_scan(spark):
    df = entrymod.queries()["style_filter_readme"](spark, SF)
    p = phys(df)
    scan = [l for l in p.splitlines() if "FileScan parquet" in l]
    assert scan, p
    # feature derivation needs only orderkey/partkey/suppkey/linenumber
    line = scan[0]
    for col in ("l_extendedprice", "l_shipdate", "l_quantity"):
        assert col not in line.split("ReadSchema")[0], f"unpruned column {col}"


def test_whole_stage_codegen_filter(spark):
    df = entrymod.queries()["style_filter_readme"](spark, SF)
    p = phys(df)
    assert "*(1)" in p  # codegen stage 1 wraps scan+filter+project


def test_join_chain_broadcasts(spark):
    df = entrymod.queries()["join_chain"](spark, SF)
    p = phys(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_flagship_single_shuffle(spark):
    """The flagship pipeline should shuffle exactly once before the final
    agg (the groupBy(z,x,y,layer)); assignment/filter/prune are map-side."""
    df = entrymod.entry(spark)
    p = phys(df)
    exchanges = p.count("Exchange hashpartitioning")
    assert exchanges <= 1, f"unexpected extra shuffles:\n{p[:2000]}"


def test_hash_diff_single_shuffle(spark):
    """The cur+prev tile hashes are computed in ONE aggregation (round-1
    review finding 5): exactly one Exchange in the physical plan — the old
    two-aggregates-then-join shape had three."""
    from mapbox_filter_spark.queries import q_hash_diff

    df = q_hash_diff(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_http_tile_server(spark):
    """HTTP wrapper parity (Main.hs:525-569): tile route returns a gzipped
    MVT blob with the reference's headers; filtered-away tiles return an
    EMPTY body; metadata.json builds TileJSON from request headers."""
    import gzip
    import urllib.request

    from mapbox_filter_spark.plans.http_serve import TileServer, make_spark_fetcher
    from mapbox_filter_spark.sources.mvt import decode_tile
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [{
        "id": "w", "type": "line", "source": "s", "source-layer": "waterway",
        "filter": ["==", ["string", ["get", "class"], ""], "river"]}]})
    store = spark.createDataFrame(
        [(6, 10, 20, "waterway", 1, "LineString", {"class": "river"}),
         (6, 10, 20, "waterway", 2, "LineString", {"class": "stream"}),
         (6, 11, 20, "waterway", 3, "LineString", {"class": "stream"})],
        "z long, x long, y long, layer string, feature_id long, "
        "geom_kind string, props map<string,string>").cache()

    with TileServer(make_spark_fetcher(store, style), meta={"name": "t"}) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/tiles/6/10/20") as r:
            body = r.read()
            assert r.headers["Content-Type"] == "application/x-protobuf"
            assert r.headers["Content-Encoding"] == "gzip"
            assert r.headers["Cache-Control"] == "max-age=31536000"
            assert r.headers["Access-Control-Allow-Origin"] == "*"
        feats = decode_tile(body)
        assert [f["feature_id"] for f in feats] == [1]  # stream filtered out
        assert feats[0]["props"] == {"class": "river"}

        # tile that filters to empty -> empty body (raw "" parity)
        with urllib.request.urlopen(f"{base}/tiles/6/11/20") as r:
            assert r.read() == b""
            assert "Content-Encoding" not in r.headers

        with urllib.request.urlopen(f"{base}/tiles/metadata.json") as r:
            import json as _json
            meta = _json.loads(r.read())
            assert meta["tiles"] == [
                f"http://127.0.0.1:{srv.port}/tiles/{{z}}/{{x}}/{{y}}"]


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the same tile key join with ZERO
    Exchange (and no extra Sort): the co-located-join capability the store
    relies on for iterated 100 TB joins (hash-diff vs a persistent level)."""
    from mapbox_filter_spark.plans.sink import write_bucketed

    cur = spark.range(0, 10_000).selectExpr(
        "id % 64 as x", "id % 32 as y", "id as payload")
    prev = spark.range(0, 10_000).selectExpr(
        "id % 64 as x", "id % 32 as y", "id * 2 as prev_payload")
    write_bucketed(cur, "t_cur", str(tmp_path / "cur"), ["x", "y"],
                   n_buckets=8, sort_cols=["x", "y"])
    write_bucketed(prev, "t_prev", str(tmp_path / "prev"), ["x", "y"],
                   n_buckets=8, sort_cols=["x", "y"])
    try:
        # hint forces the sort-merge path (tiny test tables would broadcast;
        # the 100 TB case this models never would) — bucketed+sorted scans
        # must then satisfy BOTH distribution and order with no Exchange/Sort
        # Spark 3+ ignores bucket sortBy metadata on read unless the legacy
        # flag is on (multi-file-bucket safety); with one file per bucket
        # (write_bucketed aligns the write partitioning) it is sound and
        # eliminates the bucket-local Sorts too
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        j = spark.table("t_cur").hint("merge").join(
            spark.table("t_prev"), ["x", "y"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert plan.count("Sort ") == 0, plan  # pre-sorted buckets
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("drop table if exists t_cur")
        spark.sql("drop table if exists t_prev")


def test_flagship_plan_shape(spark):
    """Permanent plan-regression guard: the flagship σ->π->γ at 3 zooms has
    exactly ONE Exchange (the γ groupBy) and zero Python evaluation nodes —
    the scale contract SCALE.md documents."""
    from mapbox_filter_spark.plans.pipeline import run_filter_job_features
    from mapbox_filter_spark.queries import README_STYLE
    from mapbox_filter_spark.sources.features import features_from_lineitem

    feats = features_from_lineitem(spark, "/root/testdata/sf0.001")
    tiles = run_filter_job_features(feats, README_STYLE, zooms=[4, 6, 8])
    plan = tiles._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "EvalPython" not in plan, plan


def test_ivf_assign_no_corpus_shuffle(spark):
    """Round-2 review fix: IVF coarse assignment must NOT shuffle (or
    window) the corpus — centroids fold in as one broadcast row, so the
    corpus-side plan between scan and output has zero Exchange, zero
    Window, and zero row explosion against the centroid count."""
    from mapbox_filter_spark.operators.similarity import ivf_assign

    corpus = spark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97).cast("double")
                  for i in range(8)]).alias("embedding"))
    cents = spark.range(16).select(
        F.col("id").cast("int").alias("cent_id"),
        F.array(*[(F.col("id") * (i + 3) % 11).cast("double")
                  for i in range(8)]).alias("cent_vec"))
    assigned = ivf_assign(corpus, cents, "vec_id", "embedding", n_lists=1)
    p = phys(assigned)
    assert "Window" not in p, p
    # the only exchange allowed is the 1-row centroid pack's broadcast
    assert "Exchange hashpartitioning" not in p, p
    assert assigned.count() == 1000  # no explosion
    # multi-probe path: rows multiply by n_lists, still no corpus exchange
    probed = ivf_assign(corpus, cents, "vec_id", "embedding", n_lists=3)
    p3 = phys(probed)
    assert "Window" not in p3, p3
    assert "Exchange hashpartitioning" not in p3, p3
    assert probed.count() == 3000


def test_downcopy_passthrough_bypasses_window(spark):
    """Round-2 review fix: only the rebuilt dst-zoom slice rides the
    renumber window's exchange; passthrough zoom levels union in with
    identity ids.  Plan contract: exactly ONE Window, and exactly ONE
    hash exchange feeding it (the passthrough branch has none)."""
    from mapbox_filter_spark.operators.downcopy import DownCopySpec, copy_down

    feats = spark.createDataFrame(
        [(z, x, y, "waterway", fid, "LineString", {"class": "river"})
         for fid, (z, x, y) in enumerate(
             [(8, 1, 1), (9, 2, 2), (9, 2, 3), (5, 0, 0), (6, 0, 0)])],
        "z int, x long, y long, layer string, feature_id long, "
        "geom_kind string, props map<string,string>")
    spec = DownCopySpec.from_json(
        {"dst-zoom": 8, "source-layer": "waterway",
         "filter": ["==", ["geometry-type"], "LineString"]})
    out = copy_down(feats, spec)
    p = phys(out)
    # two Window nodes (has-child max + row_number) share ONE hash exchange;
    # the passthrough union branch contributes none
    assert p.count("Exchange hashpartitioning") == 1, p
    # dst row dropped by the negated filter; 2 child copies land at z=8;
    # z=9 (2) + z=5,6 (2) pass through
    assert out.count() == 6


def test_prune_props_literal_zoom_plan(spark):
    """Single-zoom stages pass a python-int z: the per-layer retained-key
    arrays fold to literals at plan-build time (no per-row zoom-gate
    evaluation, no flatten/array_distinct in the plan), and results match
    the dynamic-z shape exactly."""
    from mapbox_filter_spark.operators.style_ops import prune_props
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [
        {"id": "a", "type": "line", "source": "s", "source-layer": "waterway",
         "minzoom": 6, "maxzoom": 10,
         "filter": ["==", ["string", ["get", "class"], ""], "river"]},
        {"id": "b", "type": "line", "source": "s", "source-layer": "waterway",
         "minzoom": 9,
         "filter": ["has", "brunnel"]}]})
    df = spark.createDataFrame(
        [(8, "waterway", {"class": "river", "junk": "x", "brunnel": "ford"}),
         (8, "other", {"a": "1"})],
        "z int, layer string, props map<string,string>")
    lit_out = prune_props(df, style, z=8)
    dyn_out = prune_props(df, style)  # z column
    p_lit, p_dyn = phys(lit_out), phys(dyn_out)
    assert "flatten" not in p_lit and "array_distinct" not in p_lit, p_lit
    assert "flatten" in p_dyn  # the dynamic shape still gates per row
    a = {(r["layer"], tuple(sorted(r["props"]))) for r in lit_out.collect()}
    b = {(r["layer"], tuple(sorted(r["props"]))) for r in dyn_out.collect()}
    assert a == b


# ---------------------------------------------------- session-6 plan shapes


def test_grid_neighbor_pairs_plan_shape(spark):
    """The DBSCAN candidate join rides the hash-join family on the
    cell equi-key — never a cartesian/BNLJ — with the integer refine
    inside the join condition."""
    from mapbox_filter_spark.operators.cluster import grid_neighbor_pairs

    pts = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 500).alias("x"),
        (F.col("id") * 91 % 500).alias("y"))
    p = phys(grid_neighbor_pairs(pts, 50))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # equi-join on the cell key: hash-join family (broadcast at this
    # size, shuffled hash/SMJ with one exchange per side at scale)
    assert "HashJoin" in p or "SortMergeJoin" in p, p


def test_overlay_plan_shape(spark):
    from mapbox_filter_spark.geo.overlay import segment_pairs_intersecting

    segs = spark.range(500).select(
        F.col("id").alias("seg_id"),
        (F.col("id") * 37 % 2000).alias("x1"),
        (F.col("id") * 91 % 2000).alias("y1"),
        (F.col("id") * 37 % 2000 + 30).alias("x2"),
        (F.col("id") * 91 % 2000 + 20).alias("y2"))
    p = phys(segment_pairs_intersecting(segs, 64, validate=False))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p, p


def test_gi_star_moments_are_broadcast(spark):
    """The global-moment row joins back via broadcast (explicitly
    marked) — the cell table is never re-shuffled for a 1-row join."""
    from mapbox_filter_spark.geo.hex import hex_gi_star

    cells = spark.range(200).select(
        (F.col("id") % 20).alias("hq"), (F.col("id") % 10).alias("hr"),
        F.lit(1).cast("long").alias("n"))
    p = phys(hex_gi_star(cells, value="n", k=1))
    assert "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p


def test_snap_plan_shape(spark):
    from mapbox_filter_spark.geo.overlay import snap_to_segments

    pts = spark.range(300).select(
        F.col("id").alias("point_id"),
        (F.col("id") * 37 % 1000).alias("x"),
        (F.col("id") * 91 % 1000).alias("y"))
    segs = spark.range(100).select(
        F.col("id").alias("seg_id"),
        (F.col("id") * 53 % 1000).alias("x1"),
        (F.col("id") * 29 % 1000).alias("y1"),
        (F.col("id") * 53 % 1000 + 40).alias("x2"),
        (F.col("id") * 29 % 1000 + 10).alias("y2"))
    p = phys(snap_to_segments(pts, segs, 64, 64, validate=False))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
