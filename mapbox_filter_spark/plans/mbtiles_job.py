"""The reference's ``filter`` command, end to end, on a REAL MVT mbtiles.

Parity target: /root/reference/app/Main.hs:330-422 (runFilterJob over
mbtiles) — a user of the reference points it at an .mbtiles of gzipped MVT
blobs, gives a style (+ optional down-copy spec, RTL flag), and the tiles
are rewritten in place: filtered blobs replace originals, tiles whose every
feature is filtered away are DELETED (checkEmptyTile -> saveAction delete,
Main.hs:380-386,475-484).

Engine composition (everything already exists; this wires the full flow):

    read_mbtiles -> decode_mvt_tiles (gunzip+protobuf -> feature rows)
      -> σ filter_keep / π prune_props (+ optional copy_down, rtl_transform)
      -> encode_mvt_tiles (deterministic gzipped blobs)
      -> update_mbtiles in place (or write_mbtiles to a new file)

Scale: decode/σ/π/encode are fully distributed (the γ encode shuffle is the
only exchange).  The final mbtiles write is the driver-side edge adapter —
SQLite is a single-writer store by nature, exactly like the reference's
one-connection writer; at 100 TB the same pipeline targets the partitioned
parquet store / S3 publisher instead (plans/sink.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.downcopy import DownCopySpec, copy_down
from ..operators.style_ops import filter_keep, prune_props, rtl_transform
from ..sources.mbtiles import read_mbtiles, update_mbtiles, write_mbtiles
from ..sources.mvt import decode_mvt_tiles, encode_mvt_tiles
from ..style.model import MapboxStyle


def filter_mbtiles_features(
    tiles: DataFrame,
    style: MapboxStyle,
    downcopy: Optional[DownCopySpec] = None,
    rtl: bool = False,
) -> DataFrame:
    """Blob rows -> filtered/pruned feature rows ready for re-encode."""
    feats = decode_mvt_tiles(tiles)
    if downcopy is not None:
        # geom_cmds here are TILE-LOCAL (straight from the MVT decode), so
        # copied children get the reference's geometry rescale
        # p' = (quadrant*extent + p) div 2 (DownCopy.hs:63-70) — this is
        # exactly the consumer the rescale exists for
        feats = copy_down(feats, downcopy, cmds_col="geom_cmds",
                          extent="extent")
        feats = feats.withColumn("feature_id", F.col("new_feature_id")) \
            .drop("new_feature_id", "quadrant")
    kept = filter_keep(feats, style)
    pruned = prune_props(kept, style)
    return rtl_transform(pruned, enabled=rtl)


def run_mbtiles_filter_job(
    spark: SparkSession,
    mbtiles_path: str,
    style: MapboxStyle,
    out_path: Optional[str] = None,
    downcopy: Optional[DownCopySpec] = None,
    rtl: bool = False,
    force_full: bool = False,
) -> tuple[int, int]:
    """Filter an mbtiles of MVT blobs with a style.

    ``out_path=None`` rewrites IN PLACE (reference semantics: changed blobs
    updated, emptied tiles deleted); otherwise a new mbtiles is written.
    In-place default is DIFFERENTIAL, the reference's hash-avoidance
    (Md5Worker.hs:37-55) reduced to one join: a tile is rewritten only if
    its new blob differs byte-wise from the stored one (the codec is
    deterministic, so an engine-encoded unchanged tile produces identical
    bytes; foreign-encoded files get a one-time full rewrite like the
    reference's first run without a hash db).  ``force_full=True`` (the
    reference's -f/--force-full) writes every surviving tile.
    Returns (n_written, n_deleted)."""
    tiles = read_mbtiles(spark, mbtiles_path)
    pruned = filter_mbtiles_features(tiles, style, downcopy, rtl)
    out_tiles = encode_mvt_tiles(pruned)

    if out_path is not None:
        n = write_mbtiles(out_tiles, out_path)
        return n, 0

    # in-place: emptied tiles = original keys with no surviving features
    emptied = tiles.select("z", "x", "y").exceptAll(
        out_tiles.select("z", "x", "y"))

    if force_full:
        writes = out_tiles
    else:
        orig = tiles.select("z", "x", "y", F.col("tile_data").alias("_old"))
        writes = (
            out_tiles.join(orig, ["z", "x", "y"], "left")
            .filter(F.col("_old").isNull()
                    | (F.col("tile_data") != F.col("_old")))
            .drop("_old")
        )

    def updates():
        for r in writes.toLocalIterator():  # driver-side SQLite adapter
            yield (r["z"], r["x"], r["y"], bytes(r["tile_data"]))
        for r in emptied.toLocalIterator():
            yield (r["z"], r["x"], r["y"], None)

    return update_mbtiles(mbtiles_path, updates())
