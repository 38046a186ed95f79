"""Point-query serving path.

Parity target: the reference's web server (/root/reference/app/Main.hs:525-569)
— ``GET /tiles/:z/:x/:y`` fetches one tile, runs the style filter on the
fly, and returns the filtered payload; ``/tiles/metadata.json`` serves
TileJSON.  HTTP itself is out of scope (non-core, SURVEY.md §2.3); this
module is the equivalent keyed lookup + on-the-fly filter as library calls,
so any web framework can wrap it in a handler.

Scale: a point query against the partitioned store is partition-pruned on z
and row-group-pruned on (x, y) thanks to write-time clustering
(plans/sink.py) — the same access-locality property the reference gets from
the SQLite b-tree.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.assemble import assemble_tiles
from ..operators.style_ops import filter_keep, prune_props
from ..style.model import MapboxStyle


def lookup_tile(store: DataFrame, z: int, x: int, y: int) -> DataFrame:
    """Keyed tile fetch (fetchTileZXY analogue, app/DbAccess.hs:75-81)."""
    return store.filter(
        (F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))


def serve_tile(
    features_store: DataFrame,
    style: Optional[MapboxStyle],
    z: int, x: int, y: int,
) -> DataFrame:
    """On-the-fly filter of one tile's features (runWebServer's
    filterTile-per-request shape, app/Main.hs:556-563): fetch -> σ -> π -> γ.

    ``features_store`` is the pre-assembly feature table keyed by
    (z, x, y, layer).  With style=None the raw tile is served unfiltered
    (the reference's no-style mode)."""
    tile_feats = lookup_tile(features_store, z, x, y)
    if style is not None:
        # z is a request literal: the pruned-key arrays fold at plan time
        tile_feats = prune_props(filter_keep(tile_feats, style), style, z=z)
    return assemble_tiles(tile_feats, include_spans="spans" in tile_feats.columns)
