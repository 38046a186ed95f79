"""MBTiles (SQLite) edge adapters.

Parity targets:
- classic layout ``tiles(zoom_level, tile_column, tile_row, tile_data)``
  (/root/reference/app/Main.hs:624-625,657; app/DbAccess.hs:75-81)
- Planetiler-normalized layout ``tiles_shallow(zoom_level, tile_column,
  tile_row, tile_data_id)`` + ``tiles_data(tile_data_id, tile_data)``
  (app/DbAccess.hs:92-95,205-212)
- ``metadata(name, value)`` (app/DbAccess.hs:97-98)
- TMS row storage with XYZ flip ``2^z - y - 1`` (app/Types.hs:34-38)
- directory -> mbtiles builder (app/Main.hs:605-669)

Scale note (by design, documented): MBTiles is a single-file SQLite DB —
inherently a DRIVER-SIDE edge format.  The engine's native storage is
partitioned parquet (plans/sink.py); these adapters exist so a user of the
reference can read their existing .mbtiles in and publish back out.  Reads
stream in batches through Arrow; writes batch via executemany.
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TILE_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),        # XYZ convention in-engine
    T.StructField("tile_data", T.BinaryType()),
])


def _layout(con: sqlite3.Connection) -> str:
    names = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type IN ('table','view')")}
    if "tiles_shallow" in names:
        return "normalized"
    if "tiles" in names:
        return "classic"
    raise ValueError("not an mbtiles file: no tiles/tiles_shallow table")


def read_mbtiles(
    spark: SparkSession, path: str, batch_rows: int = 10_000
) -> DataFrame:
    """Load an .mbtiles into a DataFrame (z, x, y[XYZ], tile_data)."""
    con = sqlite3.connect(path)
    try:
        layout = _layout(con)
        if layout == "classic":
            cur = con.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
        else:
            # reference column names: getColTiles, app/DbAccess.hs:93-95
            cur = con.execute(
                "SELECT s.zoom_level, s.tile_column, s.tile_row, d.tile_data "
                "FROM tiles_shallow s "
                "JOIN tiles_data d ON s.tile_data_id = d.tile_data_id")
        rows = []
        for z, x, tms_y, blob in cur:
            rows.append((int(z), int(x), (1 << int(z)) - int(tms_y) - 1,
                         bytes(blob) if blob is not None else None))
    finally:
        con.close()
    return spark.createDataFrame(rows, TILE_SCHEMA)


def read_mbtiles_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    metadata: Optional[dict[str, str]] = None,
    batch_rows: int = 10_000,
) -> int:
    """Write (z, x, y[XYZ], tile_data) rows to a classic-layout .mbtiles.

    Creates the unique index the spec requires (Main.hs:632-636 analogue)
    and VACUUMs on completion (DbAccess.hs:213-215 parity).  Returns the
    tile count."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute(
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_data BLOB)")
        con.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)")
        for k, v in (metadata or {}).items():
            con.execute("INSERT INTO metadata VALUES (?, ?)", (k, str(v)))
        n = 0
        it = tiles.select("z", "x", "y", "tile_data").toLocalIterator()
        batch = []
        for row in it:
            tms = (1 << row["z"]) - row["y"] - 1
            batch.append((row["z"], row["x"], tms, row["tile_data"]))
            if len(batch) >= batch_rows:
                con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
                n += len(batch)
                batch = []
        if batch:
            con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
            n += len(batch)
        con.commit()
        con.execute("VACUUM")
        return n
    finally:
        con.close()


def update_mbtiles(
    path: str,
    changed: Iterator[tuple[int, int, int, Optional[bytes]]],
) -> tuple[int, int]:
    """Update-in-place: upsert changed tiles, DELETE rows whose payload is
    None (tile became empty) — app/DbAccess.hs:205-212 parity.

    Dispatches on the file's layout (round-2 advice fix: ``tiles`` is a
    read-only VIEW in the normalized layout, so classic INSERT/DELETE would
    fail mid-write).  Normalized parity per the reference updateMbtile:
    updates rewrite ``tiles_data`` by tile_data_id (a blob shared by
    deduplicated tiles changes for all of them, exactly as the reference
    does); deletes remove the ``tiles_shallow`` row and its ``tiles_data``
    row.  Input y is XYZ; returns (updated, deleted)."""
    con = sqlite3.connect(path)
    up = dele = 0
    try:
        normalized = _layout(con) == "normalized"
        for z, x, y, blob in changed:
            tms = (1 << z) - y - 1
            if normalized:
                row = con.execute(
                    "SELECT tile_data_id FROM tiles_shallow WHERE "
                    "zoom_level=? AND tile_column=? AND tile_row=?",
                    (z, x, tms)).fetchone()
                if blob is None:
                    con.execute(
                        "DELETE FROM tiles_shallow WHERE zoom_level=? AND "
                        "tile_column=? AND tile_row=?", (z, x, tms))
                    if row is not None:
                        con.execute(
                            "DELETE FROM tiles_data WHERE tile_data_id=?",
                            (row[0],))
                    dele += 1
                elif row is not None:
                    con.execute(
                        "UPDATE tiles_data SET tile_data=? WHERE "
                        "tile_data_id=?", (blob, row[0]))
                    up += 1
                else:  # brand-new tile: fresh id in both tables
                    nid = con.execute(
                        "SELECT COALESCE(MAX(tile_data_id), 0) + 1 "
                        "FROM tiles_data").fetchone()[0]
                    con.execute("INSERT INTO tiles_data VALUES (?, ?)",
                                (nid, blob))
                    con.execute("INSERT INTO tiles_shallow VALUES (?,?,?,?)",
                                (z, x, tms, nid))
                    up += 1
            elif blob is None:
                con.execute(
                    "DELETE FROM tiles WHERE zoom_level=? AND tile_column=? "
                    "AND tile_row=?", (z, x, tms))
                dele += 1
            else:
                con.execute(
                    "INSERT INTO tiles VALUES (?,?,?,?) "
                    "ON CONFLICT (zoom_level, tile_column, tile_row) "
                    "DO UPDATE SET tile_data=excluded.tile_data",
                    (z, x, tms, blob))
                up += 1
        con.commit()
        con.execute("VACUUM")
        return up, dele
    finally:
        con.close()


def mbtiles_from_fs_tree(
    tree_dir: str, path: str, metadata: Optional[dict[str, str]] = None
) -> int:
    """Build an .mbtiles from a published z/x/y file tree — the inverse
    sink (app/Main.hs:605-669: create tables + unique index + y-flip,
    directory listing sorted for scan locality app/Main.hs:649-656).
    Driver-side by nature (single SQLite file).  Returns tile count."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute(
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_data BLOB)")
        con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        for k, v in (metadata or {}).items():
            con.execute("INSERT INTO metadata VALUES (?, ?)", (k, str(v)))
        n = 0
        for zs in sorted(d for d in os.listdir(tree_dir)
                         if d.isdigit() and
                         os.path.isdir(os.path.join(tree_dir, d))):
            zdir = os.path.join(tree_dir, zs)
            for xs in sorted(os.listdir(zdir), key=int):
                xdir = os.path.join(zdir, xs)
                for ys in sorted(os.listdir(xdir), key=int):
                    with open(os.path.join(xdir, ys), "rb") as f:
                        blob = f.read()
                    z, x, y = int(zs), int(xs), int(ys)
                    con.execute("INSERT INTO tiles VALUES (?,?,?,?)",
                                (z, x, (1 << z) - y - 1, blob))
                    n += 1
        con.commit()
        con.execute("VACUUM")
        return n
    finally:
        con.close()


def tilejson_metadata(
    metadata: dict[str, str], url_template: str
) -> dict:
    """TileJSON document from mbtiles metadata + tile URL template —
    key-for-key genMetadata parity (app/Main.hs:262-289):

    - string keys passed through: attribution, description, name, format,
      basename, id;
    - integer keys (parse-or-drop): minzoom, maxzoom, pixel_scale,
      maskLevel, planettime;
    - the ``json`` metadata value's OBJECT FIELDS are spliced into the top
      level (AEK.toList, Main.hs:277-278 — this is how vector_layers
      arrives);
    - center: list of doubles; bounds: exactly 4 doubles (parse-or-drop);
    - plus ``tiles`` + ``tilejson: "2.0.0"`` (Main.hs:267-269)."""
    out: dict = {}
    for k in ("attribution", "description", "name", "format", "basename",
              "id"):
        if k in metadata:
            out[k] = metadata[k]
    for k in ("minzoom", "maxzoom", "pixel_scale", "maskLevel", "planettime"):
        if k in metadata:
            try:
                out[k] = int(metadata[k])
            except ValueError:
                pass
    if "json" in metadata:
        try:
            obj = json.loads(metadata["json"])
            if isinstance(obj, dict):
                out.update(obj)
        except json.JSONDecodeError:
            pass
    if "center" in metadata:
        try:
            out["center"] = [float(v) for v in metadata["center"].split(",")]
        except ValueError:
            pass
    if "bounds" in metadata:
        try:
            lst = [float(v) for v in metadata["bounds"].split(",")]
            if len(lst) == 4:
                out["bounds"] = lst
        except ValueError:
            pass
    out["tiles"] = [url_template]
    out["tilejson"] = "2.0.0"
    return out
