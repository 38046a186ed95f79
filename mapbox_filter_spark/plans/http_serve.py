"""HTTP tile server — the reference's web surface on the stdlib.

Parity target: /root/reference/app/Main.hs:525-569 (scotty):
- ``GET /tiles/:z/:x/:y``: fetch one tile, style-filter on the fly, return
  a gzipped MVT blob with ``Content-Type: application/x-protobuf``,
  ``Cache-Control: max-age=31536000``, ``Access-Control-Allow-Origin: *``
  and ``Content-Encoding: gzip``; an empty/filtered-away tile returns an
  EMPTY body (Main.hs:569 ``raw ""``), not a 404.
- ``GET /tiles/metadata.json``: TileJSON built from the request's
  Host / X-Forwarded-Proto headers (Main.hs:533-540), CORS-allowed.

Engine shape: requests hit a ``fetch(z, x, y) -> bytes | None`` callable.
:func:`make_spark_fetcher` wires it to the partitioned feature store
(partition-pruned on z, row-group-pruned on x/y — serve.py) + the style
σ/π + the MVT+gzip encoder.  One tile per request is driver-side by design,
exactly the granularity the reference pays per request; the store itself
stays distributed.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..style.model import MapboxStyle

Fetcher = Callable[[int, int, int], Optional[bytes]]


def make_spark_fetcher(
    features_store: DataFrame,
    style: Optional[MapboxStyle],
    extent: int = 4096,
    downcopy=None,
    rtl: bool = False,
) -> Fetcher:
    """fetch(z,x,y): keyed lookup -> (optional serve-time down-copy) ->
    σ/π -> (optional RTL) -> MVT+gzip blob (None if empty).

    ``downcopy`` (a DownCopySpec) reproduces the reference web server's
    -c/--copy-down (Main.hs:541-555 runWebServer + fetchDownTiles): a
    request at the spec's dst zoom also fetches the four child tiles and
    rebuilds the dst tile on the fly — geometry rescaled when the store
    carries tile-local geom_cmds — BEFORE the style filter, matching the
    reference's order.  ``rtl`` mirrors the web server's --rtl-convert
    (Main.hs:177): Arabic shaping + BiDi reorder of retained string
    metadata, applied AFTER pruning like the reference's filter pipeline
    (Filters.hs:84-95)."""
    from pyspark.sql import functions as F

    from ..operators.downcopy import copy_down
    from ..operators.style_ops import filter_keep, prune_props, rtl_transform
    from ..sources.mvt import GEOM_CODES, encode_tile
    from .serve import lookup_tile

    def fetch(z: int, x: int, y: int) -> Optional[bytes]:
        if downcopy is not None and z == downcopy.dst_zoom:
            cols = set(features_store.columns)
            sub = features_store.filter(
                ((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
                | ((F.col("z") == z + 1)
                   & F.col("x").isin(2 * x, 2 * x + 1)
                   & F.col("y").isin(2 * y, 2 * y + 1)))
            merged = copy_down(
                sub, downcopy,
                cmds_col="geom_cmds" if "geom_cmds" in cols else None,
                extent="extent" if "extent" in cols else 4096)
            tile = (merged.filter(F.col("z") == z)
                    .withColumn("feature_id", F.col("new_feature_id"))
                    .drop("new_feature_id", "quadrant"))
        else:
            tile = lookup_tile(features_store, z, x, y)
        if style is not None:
            tile = prune_props(filter_keep(tile, style), style, z=z)
        tile = rtl_transform(tile, enabled=rtl)
        cols = set(tile.columns)
        sel = [F.col("layer"), F.col("feature_id"), F.col("geom_kind"),
               F.col("props")]
        sel.append(F.col("geom_cmds") if "geom_cmds" in cols
                   else F.lit(None).cast("array<long>").alias("geom_cmds"))
        rows = tile.select(*sel).collect()
        if not rows:
            return None
        feats = [{
            "layer": r["layer"], "extent": extent,
            "feature_id": r["feature_id"],
            "geom_type": GEOM_CODES.get(r["geom_kind"], 0),
            "props": dict(r["props"] or {}),
            "geom_cmds": list(r["geom_cmds"] or []),
        } for r in rows]
        return encode_tile(feats)

    return fetch


class _TileHandler(BaseHTTPRequestHandler):
    fetch: Fetcher = None  # type: ignore[assignment]
    meta: dict = {}

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):  # noqa: N802 (stdlib API)
        parts = self.path.strip("/").split("/")
        if self.path == "/tiles/metadata.json":
            proto = self.headers.get("X-Forwarded-Proto", "http")
            host = self.headers.get("Host", "localhost")
            from ..sources.mbtiles import tilejson_metadata

            body = json.dumps(tilejson_metadata(
                type(self).meta,
                f"{proto}://{host}/tiles/{{z}}/{{x}}/{{y}}")).encode()
            self.send_response(200)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if len(parts) == 4 and parts[0] == "tiles":
            try:
                z, x, y = int(parts[1]), int(parts[2]), int(parts[3])
            except ValueError:
                self.send_response(400)
                self.end_headers()
                return
            blob = type(self).fetch(z, x, y)
            self.send_response(200)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Type", "application/x-protobuf")
            self.send_header("Cache-Control", "max-age=31536000")
            if blob:  # empty tile -> empty body, no gzip header (Main.hs:569)
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            else:
                self.send_header("Content-Length", "0")
                self.end_headers()
            return
        self.send_response(404)
        self.end_headers()


class TileServer:
    """Threaded HTTP server over a fetcher; use as a context manager."""

    def __init__(self, fetch: Fetcher, meta: Optional[dict] = None,
                 port: int = 0):
        handler = type("Handler", (_TileHandler,),
                       {"fetch": staticmethod(fetch), "meta": meta or {}})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def __enter__(self) -> "TileServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
