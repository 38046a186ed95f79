#!/usr/bin/env python
"""mapbox-filter-compatible CLI over the Spark engine.

Subcommand-for-subcommand with the reference's optparse surface
(/root/reference/app/Main.hs:218-231) so a user of the reference can run
the same workflows unchanged in shape:

    filter              run style filtering on an MBTiles database in place
    dump                dump a tile's contents with kept/removed markers
    web                 serve tiles over HTTP (style-filtered on the fly)
    publish             publish an mbtiles to a z/x/y tree or S3
    convert-old-filter  rewrite a style's legacy filters to expressions
    create-mbtile       build an mbtiles from a published directory tree

Run directly (local[N]) or through spark-submit --py-files
dist/mapbox_filter_spark.zip for a cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as `python scripts/mfs_cli.py` puts scripts/ (not the repo root)
# on sys.path — make the package importable regardless of cwd
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _spark(cores=None):
    from mapbox_filter_spark.session import build_session

    return build_session(cores=cores, app_name="mfs-cli")


def _style(paths, source=None, mbtiles=None, auto_legacy: bool = True):
    """getStyle + checkStyle parity (app/Main.hs:235-266): load every -j
    file, merge (sconcat), print the style's vector sources, select/filter
    the tile source, clamp layer minzooms to the db's max zoom."""
    from mapbox_filter_spark.style.model import load_style

    if isinstance(paths, str):
        paths = [paths]
    styles = []
    for p in paths:
        with open(p) as f:
            styles.append(load_style(json.load(f), auto_legacy=auto_legacy))
    style = styles[0]
    for s in styles[1:]:
        style = style.merge(s)
    for s in style.sources:
        print(f"Found vector source layer: {s}")
    style, _src = style.select_source(source)
    if mbtiles:
        import sqlite3

        con = sqlite3.connect(mbtiles)
        try:
            try:
                row = con.execute(
                    "SELECT MAX(zoom_level) FROM tiles").fetchone()
            except sqlite3.OperationalError:  # normalized without a view
                row = con.execute(
                    "SELECT MAX(zoom_level) FROM tiles_shallow").fetchone()
        finally:
            con.close()
        if row and row[0] is not None:
            style = style.clamp_min_zoom(int(row[0]))
    return style


def cmd_filter(args) -> int:
    from mapbox_filter_spark.operators.downcopy import DownCopySpec
    from mapbox_filter_spark.plans.mbtiles_job import run_mbtiles_filter_job

    downcopy = None
    if args.downcopy:
        with open(args.downcopy) as f:
            downcopy = DownCopySpec.from_json(json.load(f))
    written, deleted = run_mbtiles_filter_job(
        _spark(), args.mbtiles,
        _style(args.style, source=args.source, mbtiles=args.mbtiles),
        out_path=args.output, downcopy=downcopy, rtl=args.rtl_convert,
        force_full=args.force_full)
    print(f"tiles written: {written}, deleted: {deleted}")
    return 0


def cmd_dump(args) -> int:
    from mapbox_filter_spark.operators.debug import format_dump
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles
    from mapbox_filter_spark.sources.mvt import decode_mvt_tiles

    spark = _spark()
    if args.mbtiles.endswith(".mbtiles"):
        if args.x is None or args.y is None:
            print("dump on an .mbtiles needs -x and -y", file=sys.stderr)
            return 2
        tiles = read_mbtiles(spark, args.mbtiles).filter(
            f"z = {int(args.zoom)} AND x = {int(args.x)} AND y = {int(args.y)}")
        style = _style(args.style, source=args.source, mbtiles=args.mbtiles)
    else:
        # reference parity (dumpOptions SRCFILE): a single raw MVT/pbf
        # tile file (gzipped or not), no tile coordinates needed
        with open(args.mbtiles, "rb") as f:
            blob = f.read()
        tiles = spark.createDataFrame(
            [(int(args.zoom), 0, 0, blob)],
            "z long, x long, y long, tile_data binary")
        style = _style(args.style, source=args.source)
    feats = decode_mvt_tiles(tiles)
    print(format_dump(feats, style, int(args.zoom), limit=args.limit))
    return 0


def cmd_web(args) -> int:
    from mapbox_filter_spark.plans.http_serve import TileServer, make_spark_fetcher
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles, read_mbtiles_metadata
    from mapbox_filter_spark.sources.mvt import decode_mvt_tiles

    spark = _spark()
    store = decode_mvt_tiles(read_mbtiles(spark, args.mbtiles)).cache()
    store.count()  # materialize once; requests are keyed lookups
    style = (_style(args.style, source=args.source, mbtiles=args.mbtiles)
             if args.style else None)
    downcopy = None
    if args.downcopy:
        from mapbox_filter_spark.operators.downcopy import DownCopySpec

        with open(args.downcopy) as f:
            downcopy = DownCopySpec.from_json(json.load(f))
    meta = read_mbtiles_metadata(args.mbtiles)
    with TileServer(make_spark_fetcher(store, style, downcopy=downcopy,
                                       rtl=args.rtl_convert),
                    meta=meta, port=args.port) as srv:
        print(f"serving on http://127.0.0.1:{srv.port}/tiles/{{z}}/{{x}}/{{y}}")
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            return 0


def cmd_publish(args) -> int:
    from mapbox_filter_spark.plans.mbtiles_job import filter_mbtiles_features
    from mapbox_filter_spark.plans.sink import (
        delete_tiles_fs, delete_tiles_s3, hash_tiles, publish_diff,
        read_tile_hashes, write_tile_hashes, write_tilejson, write_tiles_fs,
        write_tiles_s3, write_tilejson_s3)
    from mapbox_filter_spark.operators.downcopy import DownCopySpec
    from mapbox_filter_spark.sources.mbtiles import read_mbtiles, read_mbtiles_metadata
    from mapbox_filter_spark.sources.mvt import encode_mvt_tiles

    spark = _spark(cores=args.parallelism)
    tiles = read_mbtiles(spark, args.mbtiles)
    # reference publish optionally style-filters before upload (fModStyles
    # + copy-down + rtl, Main.hs runFilterJob publish arm)
    if args.style:
        downcopy = None
        if args.downcopy:
            with open(args.downcopy) as f:
                downcopy = DownCopySpec.from_json(json.load(f))
        feats = filter_mbtiles_features(
            tiles, _style(args.style, source=args.source,
                          mbtiles=args.mbtiles),
            downcopy, args.rtl_convert)
        tiles = encode_mvt_tiles(feats)
    tiles = tiles.withColumnRenamed("tile_data", "payload")
    meta = read_mbtiles_metadata(args.mbtiles)

    # differential upload against the previous run's hash db
    # (--hashes-db, Md5Worker parity); skipped with -f/--force-full
    hashed = hash_tiles(tiles).cache()
    prev = (read_tile_hashes(spark, args.hashes_db)
            if args.hashes_db and not args.force_full else None)
    changed, deleted = publish_diff(hashed, prev)

    if args.s3_bucket:
        n = write_tiles_s3(changed, args.s3_bucket,
                           endpoint_url=args.s3_endpoint)
        nd = delete_tiles_s3(deleted, args.s3_bucket,
                             endpoint_url=args.s3_endpoint)
        write_tilejson_s3(args.s3_bucket, meta, args.url_prefix,
                          endpoint_url=args.s3_endpoint)
    else:
        n = write_tiles_fs(changed, args.target)
        nd = delete_tiles_fs(args.target, deleted)
        write_tilejson(args.target, meta, args.url_prefix)
    if args.hashes_db and not args.disable_hashes:
        write_tile_hashes(hashed, args.hashes_db)
    print(f"published {n} tiles, deleted {nd}")
    return 0


def cmd_convert(args) -> int:
    from mapbox_filter_spark.style.legacy import convert_style_document

    with open(args.style) as f:
        doc = json.load(f)
    print(json.dumps(convert_style_document(doc), indent=2))
    return 0


def cmd_create_mbtile(args) -> int:
    from mapbox_filter_spark.sources.mbtiles import mbtiles_from_fs_tree

    n = mbtiles_from_fs_tree(args.directory, args.output)
    print(f"created {args.output} with {n} tiles")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Utilities for working with Mapbox style files "
                    "(Spark engine)")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("filter", help="Run filtering on a MBTiles database")
    f.add_argument("mbtiles")
    f.add_argument("-j", "--style", required=True, action="append",
                   help="style JSON (repeatable; merged like the reference)")
    f.add_argument("-s", "--source", help="tile source name from the style")
    f.add_argument("-f", "--force-full", action="store_true",
                   help="rewrite every tile (skip the differential check)")
    f.add_argument("--output", help="write to a new mbtiles instead of in place")
    f.add_argument("--downcopy", help="down-copy spec JSON path")
    f.add_argument("--rtl-convert", action="store_true")
    f.set_defaults(fn=cmd_filter)

    d = sub.add_parser("dump", help="Dump vector tile contents")
    d.add_argument("mbtiles",
                   help=".mbtiles (with -x/-y) or a raw MVT tile file")
    d.add_argument("-j", "--style", required=True, action="append")
    d.add_argument("-s", "--source", help="tile source name from the style")
    d.add_argument("-z", "--zoom", required=True)
    d.add_argument("-x")
    d.add_argument("-y")
    d.add_argument("--limit", type=int, default=100)
    d.set_defaults(fn=cmd_dump)

    w = sub.add_parser("web", help="Serve tiles over HTTP")
    w.add_argument("mbtiles")
    w.add_argument("-j", "--style", action="append")
    w.add_argument("-s", "--source", help="tile source name from the style")
    w.add_argument("-c", "--downcopy",
                   help="down-copy spec JSON: rebuild dst-zoom tiles from "
                        "their children on the fly (reference -c)")
    w.add_argument("--rtl-convert", action="store_true",
                   help="RTL text conversion on served metadata "
                        "(reference --rtl-convert)")
    w.add_argument("-p", "--port", type=int, default=3000)
    w.set_defaults(fn=cmd_web)

    pub = sub.add_parser("publish", help="Publish mbtiles to fs tree or S3")
    pub.add_argument("mbtiles")
    pub.add_argument("-j", "--style", action="append",
                     help="style-filter before publishing (repeatable)")
    pub.add_argument("-s", "--source", help="tile source name from the style")
    pub.add_argument("-c", "--downcopy", help="down-copy spec JSON path")
    pub.add_argument("--rtl-convert", action="store_true")
    pub.add_argument("-t", "--target", help="output directory (fs mode)")
    pub.add_argument("--s3-bucket")
    pub.add_argument("--s3-endpoint")
    pub.add_argument("-u", "--url-prefix", default="http://localhost")
    pub.add_argument("-p", "--parallelism", type=int,
                     help="cores for the local session (default: all)")
    pub.add_argument("-f", "--force-full", action="store_true",
                     help="upload everything, ignore --hashes-db")
    pub.add_argument("--hashes-db",
                     help="tile-hash sqlite from the previous publish; only "
                          "changed tiles upload, vanished tiles delete; "
                          "rewritten after publish")
    pub.add_argument("--disable-hashes", action="store_true",
                     help="do not rewrite --hashes-db after publish")
    pub.set_defaults(fn=cmd_publish)

    c = sub.add_parser("convert-old-filter",
                       help="Convert legacy style filters to expressions")
    c.add_argument("style")
    c.set_defaults(fn=cmd_convert)

    cm = sub.add_parser("create-mbtile", help="Create mbtiles from a tree")
    cm.add_argument("directory")
    cm.add_argument("output")
    cm.set_defaults(fn=cmd_create_mbtile)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
