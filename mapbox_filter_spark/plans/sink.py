"""Sinks: the engine's native partitioned-parquet tile store + the
reference's filesystem z/x/y tree publisher.

Parity targets:
- filesystem publish ``tiles/{z}/{x}/{y}`` with deletes for empty tiles
  (/root/reference/app/Main.hs:471-484, path layout 503-505)
- partition-pruned storage replacing MBTiles (SURVEY.md §1.4): parquet
  partitioned by ``z`` (+ Spark's own file splitting within) — zoom-gate
  predicates become partition pruning, and ``sortWithinPartitions(x, y)``
  clusters row groups for tile-range scans (the analogue of the reference's
  SQLite b-tree column locality, app/Main.hs:360-363).
- S3 publish (app/Main.hs:475-501): ``write_tiles_s3`` — boto3
  ``foreachPartition`` uploader with the reference's exact object headers,
  plus the empty-tile delete path and TileJSON PutObject; tested against a
  local moto S3 endpoint (tests/test_sinks.py).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_tiles_parquet(tiles: DataFrame, out_dir: str,
                        mode: str = "overwrite") -> None:
    """Native store: partitioned by z, clustered by (x, y) within files."""
    (
        tiles.repartition("z")
        .sortWithinPartitions("x", "y")
        .write.mode(mode)
        .partitionBy("z")
        .parquet(out_dir)
    )


def read_tiles_parquet(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def write_tiles_fs(
    tiles: DataFrame,
    out_dir: str,
    payload_col: str = "payload",
) -> int:
    """Publish a z/x/y file tree: one file per tile at ``{z}/{x}/{y}``.

    Executor-parallel (foreachPartition): each task writes its own tiles —
    the Spark replacement for the reference's upload thread pool
    (app/Main.hs:397-402).  Returns the tile count.
    """
    cnt = tiles.count()
    rows = tiles.select("z", "x", "y", payload_col)

    def _write_partition(it):
        for row in it:
            d = os.path.join(out_dir, str(row["z"]), str(row["x"]))
            os.makedirs(d, exist_ok=True)
            data = row[payload_col]
            if isinstance(data, str):
                data = data.encode()
            with open(os.path.join(d, str(row["y"])), "wb") as f:
                f.write(data or b"")

    rows.foreachPartition(_write_partition)
    return cnt


def delete_tiles_fs(out_dir: str, deleted: DataFrame) -> int:
    """Remove files for tiles that became empty (Main.hs:475-484 delete
    path).  ``deleted`` carries (z, x, y).

    Executor-parallel (mapPartitions), mirroring the S3 twin (round-2
    review fix): a style change that empties a whole zoom level would turn
    a driver-side loop into the bottleneck.  Requires a shared filesystem
    across executors — the same assumption write_tiles_fs already makes.
    Returns the number of files actually removed."""
    def _delete_partition(it):
        n = 0
        for row in it:
            p = os.path.join(out_dir, str(row["z"]), str(row["x"]),
                             str(row["y"]))
            if os.path.exists(p):
                os.remove(p)
                n += 1
        yield n

    return sum(deleted.select("z", "x", "y").rdd
               .mapPartitions(_delete_partition).collect())


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted external table write: repeated joins/aggs on
    ``bucket_cols`` become exchange-free (co-located, pre-sorted) — the
    at-scale answer for iterated tile-keyed joins (hash-diff against a
    persistent store, down-copy against a parent level) where re-shuffling
    100 TB per run is the bottleneck.  Both sides written with the SAME
    (cols, n_buckets) join with ZERO Exchange (asserted in
    tests/test_plans.py::test_bucketed_join_no_exchange)."""
    # align the write partitioning with the bucket hash -> ONE file per
    # bucket, so readers can use the sortBy order (multi-file buckets are
    # only per-file-sorted and would force a bucket-local re-Sort)
    cols = [F.col(c) for c in bucket_cols]
    w = (df.repartition(n_buckets, *cols)
         .write.mode(mode).option("path", path)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_tiles_s3(
    tiles: DataFrame,
    bucket: str,
    payload_col: str = "payload",
    prefix: str = "tiles",
    endpoint_url: Optional[str] = None,
    content_type: str = "application/x-protobuf",
    content_encoding: str = "gzip",
    cache_control: str = "max-age=31536000",
    client_factory=None,
) -> int:
    """Publish tiles to ``s3://bucket/{prefix}/{z}/{x}/{y}`` —
    executor-parallel (foreachPartition, one client per task, the Spark
    replacement for the reference's connection-pooled upload threads,
    app/Main.hs:443-445,485-492).  Headers match the reference's PutObject
    exactly (content-type x-protobuf, gzip encoding, 1-year cache,
    Main.hs:488-492); custom ``endpoint_url`` mirrors its --s3-endpoint.

    boto3 loads lazily on the EXECUTOR; ``client_factory`` injects a client
    builder (tests use moto).  Returns the tile count."""
    cnt = tiles.count()
    rows = tiles.select("z", "x", "y", payload_col)

    def _upload_partition(it):
        if client_factory is not None:
            client = client_factory()
        else:
            import boto3  # deferred: only needed when actually publishing

            client = boto3.client("s3", endpoint_url=endpoint_url)
        for row in it:
            data = row[payload_col]
            if isinstance(data, str):
                data = data.encode()
            client.put_object(
                Bucket=bucket,
                Key=f"{prefix}/{row['z']}/{row['x']}/{row['y']}",
                Body=bytes(data or b""),
                ContentType=content_type,
                ContentEncoding=content_encoding,
                CacheControl=cache_control,
            )

    rows.foreachPartition(_upload_partition)
    return cnt


def delete_tiles_s3(
    deleted: DataFrame,
    bucket: str,
    prefix: str = "tiles",
    endpoint_url: Optional[str] = None,
    client_factory=None,
) -> int:
    """DeleteObject for tiles that became empty (Main.hs:476-479 S3 arm)."""
    def _delete_partition(it):
        if client_factory is not None:
            client = client_factory()
        else:
            import boto3

            client = boto3.client("s3", endpoint_url=endpoint_url)
        for row in it:
            client.delete_object(
                Bucket=bucket,
                Key=f"{prefix}/{row['z']}/{row['x']}/{row['y']}")

    n = deleted.count()
    deleted.select("z", "x", "y").foreachPartition(_delete_partition)
    return n


def write_tilejson_s3(bucket: str, meta: dict, url_template: str,
                      endpoint_url: Optional[str] = None,
                      client_factory=None) -> None:
    """metadata.json PutObject (Main.hs:495-501: content-type json)."""
    from ..sources.mbtiles import tilejson_metadata

    if client_factory is not None:
        client = client_factory()
    else:
        import boto3

        client = boto3.client("s3", endpoint_url=endpoint_url)
    client.put_object(
        Bucket=bucket, Key="metadata.json",
        Body=json.dumps(tilejson_metadata(meta, url_template)).encode(),
        ContentType="application/json")


def tile_payload_json(tiles: DataFrame) -> DataFrame:
    """Canonical JSON payload per tile (the engine's 'encode' stage; the
    reference's protobuf+gzip encode app/Main.hs:386 is format-specific —
    north rule asks for meaning equality, not byte parity)."""
    return tiles.withColumn("payload", F.to_json(F.struct("layer", "features")))


def write_tilejson(out_dir: str, meta: dict, url_template: str) -> str:
    """metadata.json for the published tree (app/Main.hs:493-501)."""
    from ..sources.mbtiles import tilejson_metadata

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "metadata.json")
    with open(path, "w") as f:
        json.dump(tilejson_metadata(meta, url_template), f, indent=1)
    return path


# ---------------------------------------------------- differential publish

def _is_sqlite_store(path: str) -> bool:
    """Reference-parity SQLite store only for explicitly sqlite-ish paths
    (the reference's ``--hashes-db hashes.db``); anything else is a parquet
    DIRECTORY — the default, scale-safe store (executor-parallel write, no
    driver funnel, no single-writer file)."""
    return path.endswith((".db", ".sqlite", ".sqlite3"))


def read_tile_hashes(spark, path: str) -> Optional[DataFrame]:
    """Previous publish's hash store.  Parquet directory by default;
    sqlite ``tile_hashes(z, x, y, hash)`` (the reference's hashes.db,
    app/Md5Worker.hs + --hashes-db) when the path says so.  Returns None
    if the store does not exist."""
    if not _is_sqlite_store(path):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return None
        return (spark.read.parquet(path)
                .select("z", "x", "y",
                        F.col("tile_hash").alias("prev_hash")))
    import sqlite3

    if not os.path.exists(path):
        return None
    con = sqlite3.connect(path)
    try:
        rows = [(int(z), int(x), int(y), h) for z, x, y, h in
                con.execute("SELECT z, x, y, hash FROM tile_hashes")]
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "z long, x long, y long, prev_hash string")


def write_tile_hashes(hashed: DataFrame, path: str) -> int:
    """Persist the current run's (z, x, y, tile_hash) as the next run's
    hash store.  Default parquet: a distributed ``df.write`` — the 100 TB
    path, no ``toLocalIterator`` anywhere in the plan.  SQLite only when
    the path is explicitly a .db/.sqlite file (reference CLI parity; SQLite
    is single-writer, so that path funnels through the driver exactly as
    the reference serializes through its Md5Worker thread,
    Md5Worker.hs:57-64)."""
    if not _is_sqlite_store(path):
        import shutil

        import pyarrow.parquet as pq

        tmp = f"{path}.tmp.{os.getpid()}"
        (hashed.select("z", "x", "y", "tile_hash")
         .write.mode("overwrite").parquet(tmp))
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        # row count from parquet footers — metadata only, no data read
        return sum(
            pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
            for r, _, fs in os.walk(path) for f in fs
            if f.endswith(".parquet"))
    import sqlite3

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE tile_hashes "
                    "(z INTEGER, x INTEGER, y INTEGER, hash TEXT)")
        con.execute("CREATE UNIQUE INDEX th_idx ON tile_hashes (z, x, y)")
        n = 0
        batch = []
        for r in hashed.select("z", "x", "y", "tile_hash").toLocalIterator():
            batch.append((r["z"], r["x"], r["y"], r["tile_hash"]))
            if len(batch) >= 10_000:
                con.executemany("INSERT INTO tile_hashes VALUES (?,?,?,?)",
                                batch)
                n += len(batch)
                batch = []
        if batch:
            con.executemany("INSERT INTO tile_hashes VALUES (?,?,?,?)", batch)
            n += len(batch)
        con.commit()
        return n
    finally:
        con.close()


def hash_tiles(tiles: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the md5 ``tile_hash`` the differential publish keys on (the
    reference hashes tile content with md5, app/Md5Worker.hs)."""
    return tiles.withColumn("tile_hash", F.md5(F.col(payload_col)))


def publish_diff(
    hashed: DataFrame, prev_hashes: Optional[DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """(changed, deleted): tiles to (re)upload — new or hash-changed — and
    (z, x, y) keys present last run but gone now (the reference deletes
    those objects, app/Main.hs:475-484).  One full-outer-shaped pair of
    joins on the tile key; with no previous db everything is 'changed'."""
    if prev_hashes is None:
        return hashed, hashed.select("z", "x", "y").limit(0)
    changed = (
        hashed.join(prev_hashes, ["z", "x", "y"], "left")
        .filter(F.col("prev_hash").isNull()
                | (F.col("tile_hash") != F.col("prev_hash")))
        .drop("prev_hash")
    )
    deleted = (
        prev_hashes.join(hashed.select("z", "x", "y"), ["z", "x", "y"],
                         "left_anti")
        .select("z", "x", "y")
    )
    return changed, deleted
