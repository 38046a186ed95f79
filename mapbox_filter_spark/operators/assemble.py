"""Tile assignment + tile assembly (the γ that builds the pyramid).

- ``assign_tiles``: feature rows -> (z, x, y) at one or more zooms.  The
  zoom fan-out is a small ``explode`` of a literal array (bounded by pyramid
  depth, <= ~20), NOT a shuffle; x/y are pure Column math
  (geo.tilemath).  Down the plan, ``z`` is the partition column — zoom-gate
  predicates prune partitions (SURVEY.md §4).
- ``assemble_tiles``: groupBy (z, x, y, layer) -> sorted feature list +
  count.  Parity: untile/encode aggregate /root/reference/app/Main.hs:386 +
  empty elimination /root/reference/src/Mapbox/Filters.hs:68-71 (empty
  groups simply never exist after aggregation).

SPAN-SEQUENCE INVARIANT (BASELINE.json input_hint): ``collect_list`` order
is non-deterministic after shuffles, so the feature list is ALWAYS re-sorted
with ``array_sort`` on (feature_id) and each feature's spans are re-sorted by
(offset) INSIDE the aggregate — deterministic output independent of
partitioning, which is what "span-sequence equality preserved through every
shuffle" requires.

Scale: one shuffle on (z, x, y, layer) — the minimal possible for a keyed
aggregate; partial aggregation (map-side combine) applies since collect_list
is partial-izable; skewed hot tiles are handled by AQE + the salted-join
operators where applicable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo.tilemath import tile_cols


def assign_tiles(
    features: DataFrame,
    zooms: Sequence[int],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Add (z, x, y) per zoom level (explodes |zooms| rows per feature).

    Multi-zoom: the transcendental Mercator chain (ln/tan/cos) runs ONCE per
    feature at max(zooms); coarser zooms derive by integer shift.  This is
    exact, not approximate: x_z = clamp(floor(h * 2^z), 0, 2^z - 1) where
    h is a double, and multiplying a double by a power of two only changes
    the exponent (no rounding), so floor(h * 2^zmax) >> (zmax - z) ==
    floor(h * 2^z) by the floored-division composition law, and the clamps
    commute with the shift (2^zmax - 1 >> d == 2^z - 1; 0 >> d == 0).
    Same values as per-zoom tile_cols for every input, including the
    lat-clamp boundary (asserted by tests/test_tilemath.py).
    """
    zmax = max(int(z) for z in zooms)
    xm, ym = tile_cols(F.col(lon), F.col(lat), F.lit(zmax))
    zs = F.explode(F.array(*[F.lit(int(z)) for z in zooms])).alias("z")
    if len(zooms) == 1:
        # single zoom: no fan-out arithmetic needed; literal z constant-folds
        return (features.select("*", zs)
                .withColumn("x", xm).withColumn("y", ym))
    df = (features.withColumn("_xm", xm).withColumn("_ym", ym)
          .select("*", zs))
    d = (F.lit(zmax) - F.col("z")).cast("int")
    x = F.call_function("shiftright", F.col("_xm"), d)
    y = F.call_function("shiftright", F.col("_ym"), d)
    return (df.withColumn("x", x).withColumn("y", y)
            .drop("_xm", "_ym"))


def assemble_tiles(
    features: DataFrame,
    feature_struct_cols: Sequence[str] = ("feature_id", "doc_id", "geom_kind", "props"),
    include_spans: bool = True,
) -> DataFrame:
    """(z, x, y, layer)-keyed tiles with deterministically-ordered features.

    Output schema mirrors FIXTURES.md §D: features sorted by feature_id,
    spans (if carried) sorted by offset.
    """
    struct_fields = [F.col(c).alias(c) for c in feature_struct_cols]
    if include_spans and "spans" in features.columns:
        struct_fields.append(
            F.array_sort(
                F.col("spans"),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ).alias("spans")
        )
    feat = F.struct(*struct_fields)
    out = (
        features.groupBy("z", "x", "y", "layer")
        .agg(
            F.collect_list(feat).alias("_features"),
            F.count(F.lit(1)).alias("feature_count"),
        )
        .withColumn(
            "features",
            F.array_sort(
                F.col("_features"),
                lambda a, b: F.when(a["feature_id"] < b["feature_id"], -1)
                .when(a["feature_id"] > b["feature_id"], 1)
                .otherwise(0),
            ),
        )
        .drop("_features")
    )
    return out


def renumber_features(tiles_features: DataFrame) -> DataFrame:
    """Sequential per-tile feature-id renumbering (1..n) — the reference
    renumbers after layer merge (/root/reference/src/Mapbox/DownCopy.hs:77-81).

    Input: exploded feature rows keyed by (z, x, y, layer); adds
    ``new_feature_id`` via row_number over a (tile, layer) window ordered by
    (feature_id) — deterministic, and the window partitions align with the
    assembly shuffle so no extra exchange is needed.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("z", "x", "y", "layer")
        .orderBy(F.col("feature_id").asc(), F.col("doc_id").asc())
    )
    return tiles_features.withColumn("new_feature_id", F.row_number().over(w))


def tile_pyramid_rollup(
    feats: DataFrame,
    z_fine: int,
    coarse_zooms: Sequence[int],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Spatial continuous aggregate: per-tile feature counts for
    ``z_fine`` AND every coarser zoom — from ONE scan of the corpus.

    The fine-grain partial is aggregated once and persisted; each coarse
    zoom re-aggregates the PARTIAL with the exact parent map ``(x div
    2^Δ, y div 2^Δ)`` — bit-identical to assigning tiles at the coarse
    zoom directly, because the Mercator quantizer nests exactly under
    power-of-two scaling (``floor(v·2^z) div 2^Δ = floor(v·2^(z−Δ))``,
    and the [0, 2^z) clamp maps onto the coarse clamp).  The spatial twin
    of temporal.time_rollup: at 100 TB the pyramid costs one corpus scan
    plus re-aggs over tile counts (≤ 4^z_fine rows), not one scan per
    zoom level.
    """
    from pyspark.storagelevel import StorageLevel

    if any(zc >= z_fine for zc in coarse_zooms):
        raise ValueError("coarse zooms must be < z_fine")
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(z_fine))
    fine = (feats.select(x.alias("x"), y.alias("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("n"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    out = fine.select(F.lit(z_fine).alias("z"), "x", "y", "n")
    for zc in coarse_zooms:
        d = 1 << (z_fine - zc)
        out = out.unionByName(
            fine.select(F.lit(zc).alias("z"),
                        F.expr(f"x div {d}").alias("x"),
                        F.expr(f"y div {d}").alias("y"), "n")
            .groupBy("z", "x", "y")
            .agg(F.sum("n").alias("n")))
    return out


_HEAT_KERNEL = [(dx, dy, (4 if dx == dy == 0 else 2 if dx == 0 or dy == 0
                          else 1))
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def heatmap_tiles(
    feats: DataFrame,
    z: int,
    lon: str = "lon",
    lat: str = "lat",
    kernel: "Sequence[tuple[int, int, int]] | None" = None,
) -> DataFrame:
    """Kernel-density heatmap at one tile zoom: every feature splats an
    integer 3×3 weight kernel (4/2/1 center/edge/corner by default) onto
    its tile's neighborhood; per-tile heat is the exact integer sum.

    The splat is a 9-row literal explode (bounded fan-out, not a
    shuffle); the ONE shuffle is the final (x, y) aggregate, and integer
    weights keep the result bit-reproducible under any partitioning —
    the supercluster/heatmap-layer analogue of the reference's per-tile
    feature counts.  x wraps at the antimeridian (pmod); y clips at the
    mercator poles (rows splatted past the edge are dropped, matching
    the nonexistent tiles).
    """
    kern = list(kernel) if kernel is not None else _HEAT_KERNEL
    n = 1 << z
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(z))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(w).cast("long").alias("w"))
        for dx, dy, w in kern])
    o = F.col("o")
    return (feats.select(x.alias("x"), y.alias("y"))
            .select("x", "y", F.explode(offsets).alias("o"))
            .select(F.pmod(F.col("x") + o["dx"], F.lit(n)).alias("x"),
                    (F.col("y") + o["dy"]).alias("y"),
                    o["w"].alias("w"))
            .filter((F.col("y") >= 0) & (F.col("y") < n))
            .groupBy("x", "y")
            .agg(F.sum("w").alias("heat"))
            .select(F.lit(z).alias("z"), "x", "y", "heat"))


def st_cube(
    df: DataFrame,
    z_fine: int,
    z_coarse: int,
    week_days: int = 7,
    lon: str = "lon",
    lat: str = "lat",
    ts_us: str = "ts_us",
) -> DataFrame:
    """Space-time cube: (tile, time-bucket) counts at BOTH grains from
    ONE scan — the composition of tile_pyramid_rollup (spatial) and
    temporal.time_rollup (temporal) in a single partial.

    Fine grain: (z_fine tile, absolute day = epoch_us div 86.4e9).
    Coarse grain: (z_coarse tile, absolute week = day div week_days) —
    re-aggregated from the PERSISTED fine partial, exact in both
    dimensions at once because the tile quantizer nests under ``div 2^Δ``
    and absolute-day buckets nest under ``div week_days`` (absolute
    weeks-since-epoch, engine-neutral — no locale week rules).  ``grain``
    distinguishes the levels.  At 100 TB: one corpus scan + a re-agg
    over ≤ |fine tiles|·|days| partial rows.
    """
    from pyspark.storagelevel import StorageLevel

    if z_coarse >= z_fine:
        raise ValueError("z_coarse must be < z_fine")
    day_us = 86_400_000_000
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(z_fine))
    fine = (df.select(x.alias("x"), y.alias("y"),
                      F.expr(f"{ts_us} div {day_us}").alias("t"))
            .groupBy("x", "y", "t")
            .agg(F.count(F.lit(1)).alias("n"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    d = 1 << (z_fine - z_coarse)
    coarse = (fine.select(F.expr(f"x div {d}").alias("x"),
                          F.expr(f"y div {d}").alias("y"),
                          F.expr(f"t div {week_days}").alias("t"), "n")
              .groupBy("x", "y", "t")
              .agg(F.sum("n").alias("n")))
    return (fine.select(F.lit("day").alias("grain"),
                        F.lit(z_fine).alias("z"), "x", "y", "t", "n")
            .unionByName(
                coarse.select(F.lit("week").alias("grain"),
                              F.lit(z_coarse).alias("z"),
                              "x", "y", "t", "n")))


def decayed_tile_scores(
    df: DataFrame,
    z: int,
    lon: str = "lon",
    lat: str = "lat",
    ts_us: str = "ts_us",
    half_life_days: int = 7,
    max_half_lives: int = 40,
) -> DataFrame:
    """Trending/hotness score per tile under exponential time decay.

    The decay weight is kept EXACT: ages bucket to whole half-lives
    (``age_days div half_life``, clamped at ``max_half_lives``) and each
    event contributes the INTEGER ``2^(max - k)`` — i.e. the score is in
    units of ``2^-max`` relative to a full-weight event.  Integer sums
    are order-free and overflow-safe (≤ 2^max · n_events < 2^63), so the
    score is bit-reproducible under any partitioning — no float pow, no
    fold pinning.  ``t_ref`` (the "now") is the corpus max day,
    broadcast as a single row.  One shuffle: the tile aggregate.
    """
    day_us = 86_400_000_000
    x, y = tile_cols(F.col(lon), F.col(lat), F.lit(z))
    days = df.select(x.alias("x"), y.alias("y"),
                     F.expr(f"{ts_us} div {day_us}").alias("day"))
    t_ref = days.agg(F.max("day").alias("t_ref"))
    # SQL shiftleft: the python F.shiftleft wrapper only takes a literal
    # shift amount, the SQL function takes a Column
    w = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({max_half_lives} - "
        f"least((t_ref - day) div {half_life_days}, {max_half_lives}) "
        f"AS INT))")
    return (days.crossJoin(F.broadcast(t_ref))
            .select("x", "y", w.alias("w"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("w").alias("score"))
            .select(F.lit(z).alias("z"), "x", "y", "n_events", "score"))


def tile_knapsack(items: DataFrame, capacity: int, *,
                  tile_cols: "tuple[str, ...]" = ("z", "x", "y"),
                  id_col: str = "feature_id", weight_col: str = "w",
                  value_col: str = "v",
                  max_items: int = 2000) -> DataFrame:
    """Per-tile feature-budget knapsack — the OPTIMAL score a tile can
    carry under a byte/feature budget (0/1 knapsack over its
    features), the exact counterpart of greedy per-tile dropping
    (label_suppress): when an MVT tile must stay under a size cap,
    this is the ceiling any dropping heuristic should be judged
    against.

    Exact integer DP: one in-row fold over the tile's items in id
    order carrying the ``capacity+1`` value ladder — dp'[c] =
    max(dp[c], dp[c−w]+v) — so ``best_value`` (and the whole final
    ladder's hashability) is engine-exact.  Weights must be positive
    ≤ capacity to participate (heavier items can never pack; they
    are counted but excluded from the DP, pinned).

    Scale shape: one tile-keyed aggregation; cost O(items·capacity)
    per tile in-row, guarded by ``max_items`` (raise_error) and the
    literal capacity — tiles needing more want coarser buckets or
    the greedy path.  Value reconstruction (WHICH features) is
    deliberately out of scope — run the greedy picker for the set,
    this operator for the bound.

    Returns ``(*tile_cols, n_items, w_total, best_value)``.
    """
    if capacity < 1 or capacity > 4096:
        raise ValueError("capacity must be in [1, 4096]")
    t = list(tile_cols)
    base = items.select(
        *t, F.col(id_col).alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
        F.col(value_col).cast("long").alias("_v"))
    bad = (F.col("_w") <= 0)
    base = base.select(
        *t, "_id",
        F.when(bad, F.raise_error(F.lit(
            "tile_knapsack: non-positive weight")).cast("long"))
        .otherwise(F.col("_w")).alias("_w"), "_v")
    per = (base.groupBy(*t)
           .agg(F.count(F.lit(1)).alias("n_items"),
                F.sum("_w").alias("w_total"),
                F.sort_array(F.collect_list(F.when(
                    F.col("_w") <= capacity,
                    F.struct("_id", "_w", "_v")))).alias("_a")))
    guard = F.when(
        F.col("n_items") > max_items,
        F.raise_error(F.concat(
            F.lit(f"tile_knapsack: > {max_items} items in one tile: "),
            F.col("n_items").cast("string"))).cast("long"))
    zero = F.array_repeat(F.lit(0).cast("long"), capacity + 1)
    dp = F.aggregate(
        F.col("_a"), zero,
        lambda acc, e: F.transform(
            F.sequence(F.lit(0), F.lit(capacity)),
            lambda c: F.greatest(
                F.element_at(acc, c + 1),
                F.when(c >= e["_w"],
                       F.element_at(
                           acc, (c - e["_w"] + 1).cast("int"))
                       + e["_v"])
                .otherwise(F.element_at(acc, c + 1)))))
    return per.select(
        *t, F.coalesce(guard, F.col("n_items")).alias("n_items"),
        "w_total",
        F.element_at(dp, capacity + 1).alias("best_value"))
