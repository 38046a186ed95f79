"""CLI surface (scripts/mfs_cli.py): subcommand-for-subcommand with the
reference's optparse tree (Main.hs:218-231), driven end to end on a real
MVT mbtiles fixture."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import mfs_cli  # noqa: E402

from mapbox_filter_spark.sources.mbtiles import read_mbtiles, write_mbtiles
from mapbox_filter_spark.sources.mvt import (
    decode_tile, encode_mvt_tiles, point_cmds,
)


@pytest.fixture()
def fixture_paths(spark, tmp_path):
    df = spark.createDataFrame(
        [(6, 1, 1, "waterway", 4096, 1, 1, "Point",
          {"class": "river"}, point_cmds(5, 5)),
         (6, 1, 1, "waterway", 4096, 2, 1, "Point",
          {"class": "stream"}, point_cmds(9, 9)),
         (6, 2, 1, "waterway", 4096, 3, 1, "Point",
          {"class": "stream"}, point_cmds(5, 5))],
        "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>")
    mb = str(tmp_path / "p.mbtiles")
    write_mbtiles(encode_mvt_tiles(df), mb,
                  metadata={"name": "p", "format": "pbf"})
    style = str(tmp_path / "style.json")
    with open(style, "w") as f:
        json.dump({"layers": [{
            "id": "w", "type": "line", "source": "s",
            "source-layer": "waterway",
            "filter": ["==", ["string", ["get", "class"], ""], "river"]}]}, f)
    return mb, style, tmp_path


def test_cli_filter_publish_roundtrip(spark, fixture_paths):
    mb, style, tmp = fixture_paths
    assert mfs_cli.main(["filter", mb, "-j", style]) == 0
    back = read_mbtiles(spark, mb)
    assert back.count() == 1  # stream-only tile deleted
    feats = decode_tile(bytes(back.collect()[0]["tile_data"]))
    assert [f["feature_id"] for f in feats] == [1]

    pub = str(tmp / "pub")
    assert mfs_cli.main(["publish", mb, "-t", pub]) == 0
    assert os.path.exists(os.path.join(pub, "metadata.json"))
    assert os.path.exists(os.path.join(pub, "6", "1", "1"))

    out2 = str(tmp / "re.mbtiles")
    assert mfs_cli.main(["create-mbtile", pub, out2]) == 0
    assert read_mbtiles(spark, out2).count() == 1


def test_cli_dump_and_convert(spark, fixture_paths, capsys):
    mb, style, tmp = fixture_paths
    assert mfs_cli.main(["dump", mb, "-j", style,
                         "-z", "6", "-x", "1", "-y", "1"]) == 0
    out = capsys.readouterr().out
    assert any(line.lstrip().startswith("+") for line in out.splitlines())
    assert any(line.lstrip().startswith("-") for line in out.splitlines())

    legacy = str(tmp / "legacy.json")
    with open(legacy, "w") as f:
        json.dump({"layers": [{"id": "w", "type": "line", "source": "s",
                               "source-layer": "waterway",
                               "filter": ["in", "class", "river"]}]}, f)
    assert mfs_cli.main(["convert-old-filter", legacy]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["layers"][0]["filter"][0] == "match"


def test_cli_multi_style_merge_and_source(spark, fixture_paths, tmp_path):
    """Reference parity: -j is repeatable (styles merged, sconcat) and
    -s/--source selects + validates the tile source (checkStyle)."""
    mb, style, tp = fixture_paths
    style2 = str(tp / "style2.json")
    with open(style2, "w") as f:
        json.dump({"layers": [{
            "id": "w2", "type": "line", "source": "s",
            "source-layer": "waterway",
            "filter": ["==", ["string", ["get", "class"], ""], "stream"]}]}, f)
    # merged styles keep river OR stream -> nothing is deleted
    assert mfs_cli.main(["filter", mb, "-j", style, "-j", style2,
                         "-s", "s"]) == 0
    back = read_mbtiles(spark, mb)
    assert back.count() == 2  # both tiles survive (stream kept by style2)
    # invalid source errors like checkStyle
    from mapbox_filter_spark.style.model import StyleError
    with pytest.raises(StyleError):
        mfs_cli.main(["filter", mb, "-j", style, "-s", "nope"])


def test_cli_filter_differential_second_run_writes_nothing(spark, fixture_paths):
    """In-place filter is differential: a second identical run finds every
    re-encoded blob byte-identical (deterministic codec) and writes 0;
    -f/--force-full rewrites all (reference's force-full switch)."""
    from mapbox_filter_spark.plans.mbtiles_job import run_mbtiles_filter_job
    from mapbox_filter_spark.style.model import load_style

    mb, style_path, _ = fixture_paths
    with open(style_path) as f:
        style = load_style(json.load(f))
    w1, d1 = run_mbtiles_filter_job(spark, mb, style)
    assert (w1, d1) == (1, 1)  # tile(6,1,1) filtered; tile(6,2,1) emptied
    w2, d2 = run_mbtiles_filter_job(spark, mb, style)
    assert (w2, d2) == (0, 0)  # steady state: nothing changed
    w3, _ = run_mbtiles_filter_job(spark, mb, style, force_full=True)
    assert w3 == 1


def test_cli_publish_hashes_db_differential(spark, fixture_paths, tmp_path):
    """--hashes-db differential publish (Md5Worker parity): first run
    uploads all + writes the hash db; unchanged rerun uploads 0; after a
    tile vanishes the rerun deletes it from the tree."""
    mb, style, tp = fixture_paths
    pub = str(tp / "pub")
    hdb = str(tp / "hashes.db")
    assert mfs_cli.main(["publish", mb, "-t", pub, "--hashes-db", hdb]) == 0
    assert os.path.exists(os.path.join(pub, "6", "1", "1"))
    assert os.path.exists(hdb)
    mtime = os.path.getmtime(os.path.join(pub, "6", "1", "1"))
    # unchanged rerun: nothing rewritten
    assert mfs_cli.main(["publish", mb, "-t", pub, "--hashes-db", hdb]) == 0
    assert os.path.getmtime(os.path.join(pub, "6", "1", "1")) == mtime
    # filter the mbtiles so tile (6,2,1) is deleted, then republish
    assert mfs_cli.main(["filter", mb, "-j", style]) == 0
    assert mfs_cli.main(["publish", mb, "-t", pub, "--hashes-db", hdb]) == 0
    assert not os.path.exists(os.path.join(pub, "6", "2", "1"))
    assert os.path.exists(os.path.join(pub, "6", "1", "1"))


def test_cli_publish_parquet_hash_store(spark, fixture_paths, tmp_path):
    """A non-.db --hashes-db path selects the DEFAULT parquet hash store
    (distributed write, no sqlite): same differential behavior end-to-end
    through the CLI."""
    mb, style, tp = fixture_paths
    pub = str(tp / "pub_pq")
    store = str(tp / "hash_store")  # no .db suffix -> parquet directory
    assert mfs_cli.main(["publish", mb, "-t", pub, "--hashes-db", store]) == 0
    assert os.path.isdir(store) and any(
        f.endswith(".parquet") for f in os.listdir(store))
    mtime = os.path.getmtime(os.path.join(pub, "6", "1", "1"))
    # unchanged rerun: differential skip, nothing rewritten
    assert mfs_cli.main(["publish", mb, "-t", pub, "--hashes-db", store]) == 0
    assert os.path.getmtime(os.path.join(pub, "6", "1", "1")) == mtime


def test_cli_dump_raw_tile_file(spark, fixture_paths, tmp_path, capsys):
    """Reference dumpOptions parity: SRCFILE may be a single raw MVT tile
    file (gzipped), no -x/-y needed."""
    mb, style, tp = fixture_paths
    blob = bytes(read_mbtiles(spark, mb).filter("x = 1").collect()[0]["tile_data"])
    raw = str(tp / "tile.pbf")
    with open(raw, "wb") as f:
        f.write(blob)
    assert mfs_cli.main(["dump", raw, "-j", style, "-z", "6"]) == 0
    out = capsys.readouterr().out
    assert "river" in out and out.count("\n") >= 2
    assert any(line.lstrip().startswith(("+", "-"))
               for line in out.splitlines())


def test_web_fetcher_serve_time_downcopy(spark, tmp_path):
    """The reference web server's -c/--copy-down: a request at dst zoom
    rebuilds the tile from its children on the fly, geometry rescaled."""
    from mapbox_filter_spark.operators.downcopy import DownCopySpec
    from mapbox_filter_spark.plans.http_serve import make_spark_fetcher
    from mapbox_filter_spark.sources.mvt import (
        cmds_to_parts, decode_tile, _zigzag)
    from mapbox_filter_spark.style.model import load_style

    style = load_style({"layers": [{
        "id": "w", "type": "line", "source": "s", "source-layer": "waterway",
        "filter": ["has", "class"]}]})
    spec = DownCopySpec.from_json({
        "dst-zoom": 6, "source-layer": "waterway",
        "filter": ["==", ["string", ["get", "class"], ""], "river"]})
    store = spark.createDataFrame(
        [(6, 10, 20, "waterway", 4096, 1, 2, "LineString",
          {"class": "stream"}, [9, _zigzag(3), _zigzag(4)]),
         (7, 21, 41, "waterway", 4096, 11, 2, "LineString",  # quadrant (1,1)
          {"class": "river"}, [9, _zigzag(100), _zigzag(200)])],
        "z long, x long, y long, layer string, extent long, "
        "feature_id long, geom_type long, geom_kind string, "
        "props map<string,string>, geom_cmds array<long>").cache()
    fetch = make_spark_fetcher(store, style, downcopy=spec)
    feats = decode_tile(fetch(6, 10, 20))
    by_class = {f["props"]["class"]: f for f in feats}
    # stream kept by the negated spec filter; river copied from the child
    assert set(by_class) == {"stream", "river"}
    assert cmds_to_parts(by_class["river"]["geom_cmds"]) == \
        [[((4096 + 100) // 2, (4096 + 200) // 2)]]
    # non-dst zooms serve normally
    assert decode_tile(fetch(7, 21, 41))[0]["props"]["class"] == "river"


def test_web_fetcher_rtl_convert(spark):
    """The reference web server's --rtl-convert (Main.hs:177): served tiles
    get Arabic shaping + BiDi reorder on retained string metadata."""
    from mapbox_filter_spark.plans.http_serve import make_spark_fetcher
    from mapbox_filter_spark.sources.mvt import decode_tile
    from mapbox_filter_spark.style.rtl import rtl_convert

    store = spark.createDataFrame(
        [(6, 1, 1, "place", 1, "Point", {"name": "ابج"}, None)],
        "z long, x long, y long, layer string, feature_id long, "
        "geom_kind string, props map<string,string>, geom_cmds array<long>"
    ).cache()
    fetch = make_spark_fetcher(store, None, rtl=True)
    assert decode_tile(fetch(6, 1, 1))[0]["props"]["name"] == \
        rtl_convert("ابج")
    fetch0 = make_spark_fetcher(store, None)
    assert decode_tile(fetch0(6, 1, 1))[0]["props"]["name"] == "ابج"
