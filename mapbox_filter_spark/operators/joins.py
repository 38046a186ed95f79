"""Join strategies for the spatial graft: broadcast, and explicit
salted-hash with hot-key splitting.

BASELINE.json mandates "broadcast or salted hash joins with explicit skew
splitting on hot cells" (north_star; cite BASELINE.json:6) — AQE skew-join
is enabled as the belt (session.py), this module is the suspenders: a
frequency pre-scan finds hot keys, the probe side gets a content-derived
salt, the build side explodes its hot rows k ways, and the join key becomes
(key, salt).  Result row multisets are IDENTICAL to the unsalted join
(verified by tests/fixture against the broadcast plan).

At 100 TB: the pre-scan is a cheap count-by-key over the (already needed)
probe side; hot-key lists are tiny (broadcast literals); the salted join
shuffles both sides once on (key, salt) with bounded per-task input —
no 2-GB-partition stragglers on e.g. ocean tiles or null-island cells.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo.tilemath import cell_encode, tile_cols


def hot_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Frequency pre-scan: keys whose row count exceeds ``threshold``."""
    rows = (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    hot: Optional[Sequence] = None,
    hot_threshold: int = 100_000,
    salt_source: Optional[Column] = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` ⋈ ``build`` on ``key`` with explicit skew salting.

    Hot keys (given, or discovered by pre-scan on the probe side) are split
    ``n_salts`` ways: probe rows get ``salt = xxhash64(row) % n_salts``,
    build rows with hot keys are replicated once per salt (explode of a
    literal sequence — k small), cold keys use salt 0 on both sides.
    ``salt_source`` should be a probe column with per-row entropy
    (defaults to the whole-row hash via all probe columns).
    """
    if hot is None:
        hot = hot_keys(probe, key, hot_threshold)
    if not hot:
        return probe.join(build, key, how)

    hot_lit = F.array(*[F.lit(h) for h in hot])
    is_hot_p = F.array_contains(hot_lit, F.col(key))
    src = salt_source if salt_source is not None else F.xxhash64(
        *[F.col(c) for c in probe.columns])
    p = probe.withColumn(
        "_salt",
        F.when(is_hot_p, F.pmod(src, F.lit(n_salts)).cast("int"))
        .otherwise(F.lit(0)),
    )

    is_hot_b = F.array_contains(hot_lit, F.col(key))
    b = (
        build.withColumn(
            "_salts",
            F.when(is_hot_b, F.sequence(F.lit(0), F.lit(n_salts - 1)))
            .otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts")
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")


def raster_vector_join(
    features: DataFrame,
    raster_tiles: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
    broadcast_raster: bool = True,
    n_salts: int = 0,
    hot: Optional[Sequence] = None,
) -> DataFrame:
    """Join feature rows to raster-tile stats keyed by (z, x, y).

    ``raster_tiles`` columns: z, x, y + stat columns.  Small raster side ->
    broadcast (no shuffle of the big side); huge raster side -> salted hash
    join on the cell key (``n_salts`` > 0).
    """
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(zoom))
    feats = features.withColumn("cell", cell_encode(F.lit(zoom), x, y))
    rast = raster_tiles.filter(F.col("z") == zoom).withColumn(
        "cell", cell_encode("z", "x", "y")
    ).drop("z", "x", "y")
    if broadcast_raster and not n_salts:
        return feats.join(F.broadcast(rast), "cell", "left")
    if n_salts:
        return salted_join(feats, rast, "cell", n_salts=n_salts, hot=hot,
                           how="left")
    return feats.join(rast, "cell", "left")
