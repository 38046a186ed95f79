"""Trajectory analytics: per-entity path statistics in one shuffle.

Graft-mandated geospatial surface (no reference analogue — the
reference's closest notion is the per-tile feature stream,
mapbox-filter/src/Mapbox/Filters.hs, which never orders by time).

Positions are planar integer coordinates (micro-degrees or tile-local
units): step deltas are EXACT longs, so every derived aggregate except
the path length is exact integer math, and the path length itself is a
pinned-order left fold of ``sqrt(exact long)`` — correctly-rounded IEEE
ops in a fixed order, hence bit-reproducible against any engine that
folds in the same order (the DuckDB oracle uses
``list_reduce(list(... ORDER BY rn))``).

Scale shape: ONE shuffle on the entity key — the ordering window, the
lag window, and the final groupBy all share it, so Spark plans a single
exchange.  The per-entity step list is materialized only inside the
final aggregate (``collect_list`` of ``(rn, step)`` structs), bounded by
the entity's own event count; a pathological hot entity should be capped
upstream (heavy_hitters in operators/sketch.py is the detector).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trajectory_stats(df: DataFrame, entity_col: str = "user_id",
                     order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                     x_col: str = "x", y_col: str = "y",
                     dwell_step2: "int | None" = None) -> DataFrame:
    """Per-entity trajectory statistics.

    Output columns: ``n_pts``, ``path_len`` (ordered IEEE fold),
    ``max_step2`` (exact), ``net_dx``/``net_dy`` (exact, last-first),
    ``minx``/``miny``/``maxx``/``maxy`` (exact bbox), and — when
    ``dwell_step2`` is set — ``n_dwells``, the number of maximal runs of
    consecutive steps with squared length ≤ the threshold (a planar
    stay-point detector: gaps-and-islands via one extra ``lag``).
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    x, y = F.col(x_col), F.col(y_col)
    dx = x - F.lag(x).over(w)
    dy = y - F.lag(y).over(w)
    base = df.select(
        entity_col, *order_cols, x_col, y_col,
        F.row_number().over(w).alias("rn"),
        (dx * dx + dy * dy).alias("step2"),
        dx.alias("dx"), dy.alias("dy"),
    )
    step2 = F.col("step2")
    if dwell_step2 is not None:
        prev = F.lag(step2).over(
            Window.partitionBy(entity_col).orderBy("rn"))
        base = base.withColumn(
            "dwell_start",
            F.when((step2 <= F.lit(dwell_step2))
                   & (prev.isNull() | (prev > F.lit(dwell_step2))),
                   F.lit(1)).otherwise(F.lit(0)))
    steps = F.collect_list(
        F.when(F.col("rn") > 1,
               F.struct(F.col("rn").alias("rn"),
                        F.sqrt(step2.cast("double")).alias("s"))))
    aggs = [
        F.count("*").alias("n_pts"),
        F.aggregate(F.sort_array(steps), F.lit(0.0),
                    lambda a, e: a + e["s"]).alias("path_len"),
        F.max(step2).alias("max_step2"),
        F.sum("dx").alias("net_dx"),
        F.sum("dy").alias("net_dy"),
        F.min(x_col).alias("minx"), F.min(y_col).alias("miny"),
        F.max(x_col).alias("maxx"), F.max(y_col).alias("maxy"),
    ]
    if dwell_step2 is not None:
        aggs.append(F.sum("dwell_start").alias("n_dwells"))
    return base.groupBy(entity_col).agg(*aggs)


def random_walk_positions(events: DataFrame, jump: int = 1000,
                          entity_col: str = "user_id") -> DataFrame:
    """Deterministic synthetic positions: each event contributes an
    integer jump in ``[-jump, +jump]`` micro-degrees per axis (a pure
    hash of ``event_id``), and the position is the per-entity running
    sum in time order — a bounded random walk with EXACT integer
    coordinates, reproducible in any engine from the same events table.
    """
    m = 2 * jump + 1
    w = Window.partitionBy(entity_col).orderBy("ts", "event_id")
    jx = (F.col("event_id") * 7919) % m - jump
    jy = (F.col("event_id") * 104729) % m - jump
    return events.select(
        entity_col, "ts", "event_id",
        F.sum(jx).over(w).alias("x"),
        F.sum(jy).over(w).alias("y"),
    )


def od_flows(df: DataFrame, z: int, entity_col: str = "user_id",
             order_cols: "tuple[str, ...]" = ("ts", "event_id"),
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Origin→destination flow matrix at tile zoom ``z``: consecutive
    positions per entity (time order) become directed tile transitions,
    counted over all entities — the movement-analytics aggregate behind
    flow maps.  Two shuffles, both irreducible: the per-entity ordering
    window, then the global (from, to) aggregate (flows by definition
    combine across entities).  Self-transitions (same tile) are kept —
    dwell weight on the diagonal; filter downstream if unwanted.
    """
    from ..geo.tilemath import tile_cols

    from pyspark.sql import Window
    x, y = tile_cols(F.col(lon_col), F.col(lat_col), F.lit(z))
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    base = df.select(
        entity_col, *order_cols, x.alias("tx"), y.alias("ty"))
    hops = base.select(
        F.lag("tx").over(w).alias("fx"), F.lag("ty").over(w).alias("fy"),
        F.col("tx"), F.col("ty"))
    return (hops.filter(F.col("fx").isNotNull())
            .groupBy("fx", "fy", "tx", "ty")
            .agg(F.count(F.lit(1)).alias("n_hops"))
            .select(F.lit(z).alias("z"), "fx", "fy", "tx", "ty", "n_hops"))


def trip_segments(df: DataFrame, break_step2: int,
                  entity_col: str = "user_id",
                  order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                  x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Trip segmentation: split each entity's position stream where the
    squared step exceeds ``break_step2`` (teleport/gap ⇒ new trip), then
    profile each trip — classic telemetry sessionization in SPACE rather
    than time (temporal.sessionize is the time twin).

    ``trip_id`` is the running count of break rows (gaps-and-islands
    cumsum over the same entity-ordered window), so the whole operator
    is still ONE shuffle: ordering window, cumsum window, and the
    (entity, trip) groupBy all hash on the entity key.  Per-trip path
    length excludes the break step itself (the jump BETWEEN trips
    belongs to neither) and folds in row order (bit-reproducible).
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    x, y = F.col(x_col), F.col(y_col)
    dx = x - F.lag(x).over(w)
    dy = y - F.lag(y).over(w)
    step2 = dx * dx + dy * dy
    base = df.select(
        entity_col, x_col, y_col,
        F.row_number().over(w).alias("rn"),
        step2.alias("step2"),
        (step2.isNull() | (step2 > F.lit(break_step2)))
        .cast("int").alias("brk"),
    )
    w2 = Window.partitionBy(entity_col).orderBy("rn")
    base = base.withColumn("trip_id", F.sum("brk").over(w2))
    in_trip = F.col("brk") == 0
    steps = F.collect_list(
        F.when(in_trip,
               F.struct(F.col("rn"),
                        F.sqrt(F.col("step2").cast("double")).alias("s"))))
    return (base.groupBy(entity_col, "trip_id")
            .agg(F.count(F.lit(1)).alias("n_pts"),
                 F.aggregate(F.sort_array(steps), F.lit(0.0),
                             lambda a, e: a + e["s"]).alias("path_len"),
                 F.max(F.when(in_trip, F.col("step2"))).alias("max_step2"),
                 F.min(F.struct(F.col("rn"), x.alias("v")))["v"]
                 .alias("start_x"),
                 F.min(F.struct(F.col("rn"), y.alias("v")))["v"]
                 .alias("start_y"),
                 F.max(F.struct(F.col("rn"), x.alias("v")))["v"]
                 .alias("end_x"),
                 F.max(F.struct(F.col("rn"), y.alias("v")))["v"]
                 .alias("end_y")))


def stay_points(df: DataFrame, cell: int, gap_us: int,
                min_dwell_us: int,
                entity_col: str = "user_id", ts_col: str = "ts",
                order_tiebreak: str = "event_id",
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Stay-point (dwell) detection: maximal runs of consecutive pings
    where an entity stays in the SAME grid cell with no time gap over
    ``gap_us``, kept when the dwell (last − first ping) reaches
    ``min_dwell_us`` — the home/work/POI-visit primitive of trajectory
    mining.

    This is the cell-quantized, distributed variant: the classical
    anchor-based scan (Li et al. 2008, GIS '08) is inherently
    sequential per trajectory; quantizing to grid cells turns the run
    detection into gaps-and-islands (change-flag → cumsum → groupBy),
    which is THREE windows + one groupBy all partitioned by the entity
    key — a single exchange, no per-row Python, no trajectory length
    limit.  A slow drift that re-crosses a cell boundary splits the
    episode (the documented quantization deviation; choose ``cell`` ≥
    the expected dwell wander).

    Exactness: integer coordinates, integer cell ids via floor_div
    (correct at negative coordinates), integer epoch-micros — every
    output column an exact long.

    Returns ``(entity, cx, cy, enter_us, exit_us, n_pings, dwell_us)``
    with dwell_us = exit − enter (a 1-ping episode has dwell 0 and is
    dropped unless min_dwell_us == 0).
    """
    from ..geo.tilemath import floor_div

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_tiebreak)
    q = df.select(
        entity_col, ts_col, order_tiebreak,
        floor_div(F.col(x_col), cell).alias("_cx"),
        floor_div(F.col(y_col), cell).alias("_cy"),
        us.alias("_us"))
    prev_cx = F.lag("_cx").over(w)
    prev_cy = F.lag("_cy").over(w)
    prev_us = F.lag("_us").over(w)
    brk = F.when(
        prev_us.isNull()
        | (F.col("_cx") != prev_cx) | (F.col("_cy") != prev_cy)
        | (F.col("_us") - prev_us > gap_us), 1).otherwise(0)
    flagged = q.select(entity_col, "_cx", "_cy", "_us",
                       brk.alias("_brk"),
                       F.row_number().over(w).alias("_rn"))
    w2 = (Window.partitionBy(entity_col).orderBy("_rn")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    episodes = flagged.withColumn("_ep", F.sum("_brk").over(w2))
    agg = episodes.groupBy(entity_col, "_ep").agg(
        F.min("_cx").alias("cx"), F.min("_cy").alias("cy"),
        F.min("_us").alias("enter_us"), F.max("_us").alias("exit_us"),
        F.count(F.lit(1)).alias("n_pings"))
    return (agg.withColumn("dwell_us",
                           F.col("exit_us") - F.col("enter_us"))
            .filter(F.col("dwell_us") >= min_dwell_us)
            .select(entity_col, "cx", "cy", "enter_us", "exit_us",
                    "n_pings", "dwell_us"))


def colocation_pairs(df: DataFrame, cell: int, bucket_s: int,
                     min_meetings: int = 1,
                     entity_col: str = "user_id",
                     ts_col: str = "ts",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Spatio-temporal co-location join: pairs of entities observed in
    the SAME space-time cell (planar grid cell of side ``cell`` ×
    time bucket of ``bucket_s`` seconds) at least ``min_meetings``
    distinct times — the contact-tracing / co-movement primitive.

    Semantics: a "meeting" is one distinct (cell_x, cell_y, bucket)
    both entities visited; an entity's repeated pings inside one
    space-time cell count ONCE (the distinct pre-pass), so n_meet is a
    count of distinct co-visits, not of ping cross-products.

    Scale shape: one shuffle to distinct the visit set, one equi-join on
    the space-time key, one groupBy on the pair.  The join is the
    classic quadratic hazard — a stadium cell with 10k entities in one
    bucket yields 50M pairs — so at fleet scale cap per-key occupancy
    upstream (cap_per_group in operators/splits.py, heavy_hitters in
    operators/sketch.py as the detector) or salt the hot space-time
    keys; the distinct pre-pass already bounds multiplicity per entity.

    Exact integers end-to-end (floor_div grid + integer epoch-us
    bucketing) — value-hashable.
    """
    from ..geo.tilemath import floor_div

    if cell <= 0 or bucket_s <= 0:
        raise ValueError("cell and bucket_s must be positive")
    visits = df.select(
        F.col(entity_col),
        floor_div(F.col(x_col), cell).alias("cx"),
        floor_div(F.col(y_col), cell).alias("cy"),
        floor_div(F.unix_micros(F.col(ts_col).cast("timestamp")),
                  bucket_s * 1_000_000).alias("tb")).distinct()
    a, b = visits.alias("a"), visits.alias("b")
    pair = (a.join(b, (F.col("a.cx") == F.col("b.cx"))
                   & (F.col("a.cy") == F.col("b.cy"))
                   & (F.col("a.tb") == F.col("b.tb"))
                   & (F.col(f"a.{entity_col}") < F.col(f"b.{entity_col}")))
            .select(F.col(f"a.{entity_col}").alias("user_a"),
                    F.col(f"b.{entity_col}").alias("user_b")))
    return (pair.groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).alias("n_meet"))
            .filter(F.col("n_meet") >= min_meetings))


def hausdorff_pairs(pts: DataFrame, entity_col: str, block_col: str,
                    idx_col: str, x_col: str,
                    y_col: str) -> DataFrame:
    """Exact symmetric Hausdorff distance (squared) between every pair
    of entity trajectories sharing a blocking key — the
    trajectory-similarity join (map-matching QA, convoy/companion
    detection, near-duplicate track dedup).

    H²(A,B) = max(h²(A,B), h²(B,A)) with the directed
    h²(A,B) = max_{a∈A} min_{b∈B} d²(a,b); d² stays an exact long on
    integer coordinates (the knn_join/geofence recipe — no sqrt
    anywhere), so the gate value-hashes.

    Scale shape: ONE equi-join on the blocking key produces every
    cross-trajectory point pair (localCheckpoint-ed once, then both
    directed reductions read it); cost is Σ_block (Σ|T|)² — quadratic
    in the BLOCK, so the blocking key (spatial cell, time bucket, or
    hash shard) is the knob, exactly like fuzzy_match/setsim; cap
    points-per-entity upstream with the deterministic bottom-k sampler.
    Plain min/max groupBys thereafter — map-side-combinable, no
    windows.

    Returns ``(u, v, h2_ab, h2_ba, h2)`` per co-blocked pair (u < v).
    """
    a = pts.select(F.col(block_col).alias("blk"),
                   F.col(entity_col).alias("u"),
                   F.col(idx_col).alias("ai"),
                   F.col(x_col).cast("long").alias("ax"),
                   F.col(y_col).cast("long").alias("ay"))
    b = pts.select(F.col(block_col).alias("blk"),
                   F.col(entity_col).alias("v"),
                   F.col(idx_col).alias("bi"),
                   F.col(x_col).cast("long").alias("bx"),
                   F.col(y_col).cast("long").alias("by"))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    crossed = (a.join(b, "blk")
               .filter(F.col("u") < F.col("v"))
               .select("u", "v", "ai", "bi", d2.alias("d2"))
               .localCheckpoint())
    h_ab = (crossed.groupBy("u", "v", "ai")
            .agg(F.min("d2").alias("m"))
            .groupBy("u", "v").agg(F.max("m").alias("h2_ab")))
    h_ba = (crossed.groupBy("u", "v", "bi")
            .agg(F.min("d2").alias("m"))
            .groupBy("u", "v").agg(F.max("m").alias("h2_ba")))
    return (h_ab.join(h_ba, ["u", "v"])
            .select("u", "v", "h2_ab", "h2_ba",
                    F.greatest("h2_ab", "h2_ba").alias("h2")))


def heading_octants(df: DataFrame, entity_col: str = "user_id",
                    order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                    x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Heading distribution: classify every consecutive step into one of
    the 8 compass octants by EXACT integer comparisons (sign of dx/dy
    and |dx| vs |dy| — no atan2, whose cross-engine bit-stability is
    not guaranteed), and aggregate per octant.

    Octant ids: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE, −1 = zero step.
    Tie rule (part of the artifact's identity): |dx| = |dy| ≠ 0 is the
    diagonal, |dx| > |dy| the horizontal, |dy| > |dx| the vertical.

    One window pass (lag) + one groupBy — shuffles once on the entity
    and once on the octant; sums are exact longs (L1 step lengths).
    Returns ``(octant, n_steps, sum_l1, n_entities)``.
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    x, y = F.col(x_col), F.col(y_col)
    dx = (x - F.lag(x).over(w)).alias("dx")
    dy = (y - F.lag(y).over(w)).alias("dy")
    steps = df.select(entity_col, dx, dy).filter(F.col("dx").isNotNull())
    adx, ady = F.abs(F.col("dx")), F.abs(F.col("dy"))
    sdx, sdy = F.col("dx"), F.col("dy")
    octant = (
        F.when((sdx == 0) & (sdy == 0), F.lit(-1))
        .when((adx > ady) & (sdx > 0), F.lit(0))
        .when(adx > ady, F.lit(4))
        .when((ady > adx) & (sdy > 0), F.lit(2))
        .when(ady > adx, F.lit(6))
        .when((sdx > 0) & (sdy > 0), F.lit(1))
        .when((sdx < 0) & (sdy > 0), F.lit(3))
        .when((sdx < 0) & (sdy < 0), F.lit(5))
        .otherwise(F.lit(7)))
    return (steps.select(entity_col, octant.alias("octant"),
                         (adx + ady).alias("_l1"))
            .groupBy("octant")
            .agg(F.count(F.lit(1)).alias("n_steps"),
                 F.sum("_l1").alias("sum_l1"),
                 F.countDistinct(entity_col).alias("n_entities")))


def traj_edit_distance(pts: DataFrame, entity_col: str = "user_id",
                       order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                       x_col: str = "x", y_col: str = "y", *,
                       cell: int = 2048, max_moves: int = 40,
                       n_blocks: int = 100) -> DataFrame:
    """EDR-style trajectory similarity: each track becomes a SYMBOL
    STRING (grid cells visited in order, consecutive repeats collapsed,
    each cell hashed to one of 26 letters, capped at ``max_moves``
    symbols), and co-blocked pairs get the exact Levenshtein edit
    distance between their signatures — the sequence-alignment
    alternative to Hausdorff (order-aware where Hausdorff is
    order-blind).

    Exactness: every stage is integer/string-deterministic —
    ``floor(x/cell)`` quantization (power-of-two cell → the double
    divide is exact), pmod symbol hash, and both engines implement
    classic integer Levenshtein — so the gate value-hashes.

    Scale shape: two windows on the entity key (dedupe-consecutive,
    position cap) + one groupBy to signatures — the corpus never pairs;
    THEN one equi-join on the block key over 1-row-per-entity
    signatures.  Pairs are quadratic in the BLOCK (the knob, like
    hausdorff_pairs); Levenshtein cost is bounded by max_moves² per
    pair.  Returns ``(u, v, len_u, len_v, dist)``, u < v.
    """
    from ..geo.tilemath import floor_div

    if cell & (cell - 1) or cell <= 0:
        raise ValueError(f"cell must be a power of two: {cell}")
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    cx = floor_div(F.col(x_col).cast("long"), cell)
    cy = floor_div(F.col(y_col).cast("long"), cell)
    c = pts.select(entity_col, *order_cols,
                   cx.alias("cx"), cy.alias("cy"))
    changed = ((F.lag("cx").over(w).isNull())
               | (F.lag("cx").over(w) != F.col("cx"))
               | (F.lag("cy").over(w) != F.col("cy")))
    moves = c.withColumn("_keep", changed).filter("_keep")
    rn = F.row_number().over(
        Window.partitionBy(entity_col).orderBy(*order_cols))
    sym = F.expr(
        "char(97 + pmod(cx * 31 + cy, 26))")
    moves = (moves.withColumn("_rn", rn)
             .filter(F.col("_rn") <= max_moves)
             .select(entity_col, "_rn", sym.alias("_s")))
    sigs = (moves.groupBy(entity_col)
            .agg(F.concat_ws("", F.transform(
                F.sort_array(F.collect_list(F.struct("_rn", "_s"))),
                lambda s: s["_s"])).alias("sig"))
            .withColumn("blk", F.pmod(F.col(entity_col), F.lit(n_blocks))))
    a = sigs.select("blk", F.col(entity_col).alias("u"),
                    F.col("sig").alias("sig_u"))
    b = sigs.select("blk", F.col(entity_col).alias("v"),
                    F.col("sig").alias("sig_v"))
    return (a.join(b, "blk")
            .filter(F.col("u") < F.col("v"))
            .select("u", "v",
                    F.length("sig_u").alias("len_u"),
                    F.length("sig_v").alias("len_v"),
                    F.levenshtein("sig_u", "sig_v").alias("dist")))


_DTW_INF = 1 << 60


def _cell_signature_pairs(pts: DataFrame, entity_col: str,
                          order_cols: "tuple[str, ...]", x_col: str,
                          y_col: str, *, cell: int, max_moves: int,
                          n_blocks: int) -> DataFrame:
    """Shared alignment substrate for the DP trajectory metrics
    (dtw_pairs / frechet_pairs): per entity, the capped
    consecutive-repeat-collapsed grid-cell sequence as two long
    arrays, block-joined into u < v candidate pairs
    ``(u, v, ax, ay, bx, by)``."""
    from ..geo.tilemath import floor_div

    if cell & (cell - 1) or cell <= 0:
        raise ValueError(f"cell must be a power of two: {cell}")
    if max_moves < 1:
        raise ValueError(f"max_moves must be >= 1: {max_moves}")
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    cx = floor_div(F.col(x_col).cast("long"), cell)
    cy = floor_div(F.col(y_col).cast("long"), cell)
    c = pts.select(entity_col, *order_cols,
                   cx.alias("cx"), cy.alias("cy"))
    changed = ((F.lag("cx").over(w).isNull())
               | (F.lag("cx").over(w) != F.col("cx"))
               | (F.lag("cy").over(w) != F.col("cy")))
    moves = (c.withColumn("_keep", changed).filter("_keep")
             .withColumn("_rn", F.row_number().over(
                 Window.partitionBy(entity_col).orderBy(*order_cols)))
             .filter(F.col("_rn") <= max_moves))
    sigs = (moves.groupBy(entity_col)
            .agg(F.sort_array(F.collect_list(F.struct(
                "_rn", "cx", "cy"))).alias("_m"))
            .select(entity_col,
                    F.transform("_m", lambda s: s["cx"]).alias("_xs"),
                    F.transform("_m", lambda s: s["cy"]).alias("_ys"),
                    F.pmod(F.col(entity_col), F.lit(n_blocks))
                    .alias("blk")))
    a = sigs.select("blk", F.col(entity_col).alias("u"),
                    F.col("_xs").alias("ax"), F.col("_ys").alias("ay"))
    b = sigs.select("blk", F.col(entity_col).alias("v"),
                    F.col("_xs").alias("bx"), F.col("_ys").alias("by"))
    return a.join(b, "blk").filter(F.col("u") < F.col("v"))


def dtw_pairs(pts: DataFrame, entity_col: str = "user_id",
              order_cols: "tuple[str, ...]" = ("ts", "event_id"),
              x_col: str = "x", y_col: str = "y", *,
              cell: int = 2048, max_moves: int = 12,
              n_blocks: int = 100) -> DataFrame:
    """Dynamic-time-warping distance between co-blocked trajectory
    pairs — the COST-AWARE sequence aligner (EDR counts mismatched
    symbols; DTW sums how FAR apart the aligned cells are, so two
    parallel tracks one cell apart score small instead of maximal).
    Cost(i, j) = |cxᵢ−cxⱼ| + |cyᵢ−cyⱼ| (Manhattan on grid cells),
    classic DP recurrence D[i][j] = c + min(D[i][j−1], D[i−1][j],
    D[i−1][j−1]).

    ENTIRELY exact int64 — the DP runs as a nested in-row HOF fold
    (outer fold over rows carrying the previous DP row as an array,
    inner fold building the next row), so there is no float anywhere
    and the gate value-hashes.  The relational mirror uses the
    telescoped identity r_j = P_j + min_{k≤j}(m_k − P_{k−1})
    (P = per-row cost prefix sum, m_k = min of the two
    previous-row predecessors), which turns each DP row into one
    running-min window — the oracle unrolls max_moves such stages.

    Scale shape: same as traj_edit_distance — two entity-keyed
    windows to capped cell signatures (consecutive repeats
    collapsed), one equi-join on the block key over 1-row-per-entity
    arrays; the DP is O(max_moves²) register work per pair inside
    whole-stage codegen, never a shuffle.  Pairs are quadratic in the
    block (the knob).  Returns ``(u, v, len_u, len_v, dtw)``, u < v.
    """
    pairs = _cell_signature_pairs(pts, entity_col, order_cols, x_col,
                                  y_col, cell=cell,
                                  max_moves=max_moves,
                                  n_blocks=n_blocks)
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    inf = F.lit(_DTW_INF)

    def cost(i, j):
        return (F.abs(F.element_at(ax, i) - F.element_at(bx, j))
                + F.abs(F.element_at(ay, i) - F.element_at(by, j)))

    nb = F.size(bx)
    empty = F.array().cast("array<long>")
    # row 1: D[1][j] = prefix sum of cost(1, ·)
    row1 = F.aggregate(
        F.sequence(F.lit(1), nb), empty,
        lambda acc, j: F.concat(acc, F.array(
            F.when(j == 1, F.lit(0).cast("long"))
            .otherwise(F.element_at(acc, j - 1)) + cost(F.lit(1), j))))
    # rows 2..na: classic three-way min, previous row in the outer acc
    # (sequence(2, 1) would run DESCENDING in Spark — guard na == 1)
    outer_idx = F.when(F.size(ax) >= 2,
                       F.sequence(F.lit(2), F.size(ax))) \
        .otherwise(F.array().cast("array<int>"))
    final = F.aggregate(
        outer_idx, row1,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), nb), empty,
            lambda acc, j: F.concat(acc, F.array(
                cost(i, j) + F.least(
                    F.when(j == 1, inf)
                    .otherwise(F.element_at(acc, j - 1)),
                    F.element_at(prev, j),
                    F.when(j == 1, inf)
                    .otherwise(F.element_at(prev, j - 1)))))))
    return pairs.select(
        "u", "v", F.size(ax).alias("len_u"), F.size(bx).alias("len_v"),
        F.element_at(final, nb).alias("dtw"))


def frechet_pairs(pts: DataFrame, entity_col: str = "user_id",
                  order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                  x_col: str = "x", y_col: str = "y", *,
                  cell: int = 2048, max_moves: int = 12,
                  n_blocks: int = 100) -> DataFrame:
    """Discrete Fréchet distance between co-blocked trajectory pairs
    (Eiter-Mannila 1994) — the BOTTLENECK sequence aligner: where DTW
    sums aligned-step costs, Fréchet reports the single WORST step of
    the best monotone alignment ("shortest leash").  Completes the
    trio: hausdorff_pairs (order-blind), dtw_pairs (order-aware sum),
    frechet_pairs (order-aware max).  Cost is grid-cell Manhattan,
    recurrence F[i][j] = max(c, min(F[i][j−1], F[i−1][j],
    F[i−1][j−1])).

    ENTIRELY exact int64 via the same nested in-row HOF fold as
    dtw_pairs.  The max-min recurrence does NOT telescope into one
    running-min window (min and max don't collapse the way +/min do),
    so the oracle instead unrolls the DP COLUMN-WISE — max_moves
    stages of max_moves lateral-alias expressions — exactly the
    computation, no window at all.

    Same scale shape and knobs as dtw_pairs; shares its signature
    substrate (``_cell_signature_pairs``).  Returns
    ``(u, v, len_u, len_v, frechet)``, u < v.
    """
    pairs = _cell_signature_pairs(pts, entity_col, order_cols, x_col,
                                  y_col, cell=cell,
                                  max_moves=max_moves,
                                  n_blocks=n_blocks)
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    inf = F.lit(_DTW_INF)

    def cost(i, j):
        return (F.abs(F.element_at(ax, i) - F.element_at(bx, j))
                + F.abs(F.element_at(ay, i) - F.element_at(by, j)))

    nb = F.size(bx)
    empty = F.array().cast("array<long>")
    # row 1: F[1][j] = max_{t<=j} c(1, t)
    row1 = F.aggregate(
        F.sequence(F.lit(1), nb), empty,
        lambda acc, j: F.concat(acc, F.array(
            F.when(j == 1, cost(F.lit(1), j))
            .otherwise(F.greatest(cost(F.lit(1), j),
                                  F.element_at(acc, j - 1))))))
    outer_idx = F.when(F.size(ax) >= 2,
                       F.sequence(F.lit(2), F.size(ax))) \
        .otherwise(F.array().cast("array<int>"))
    final = F.aggregate(
        outer_idx, row1,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), nb), empty,
            lambda acc, j: F.concat(acc, F.array(
                F.greatest(cost(i, j), F.least(
                    F.when(j == 1, inf)
                    .otherwise(F.element_at(acc, j - 1)),
                    F.element_at(prev, j),
                    F.when(j == 1, inf)
                    .otherwise(F.element_at(prev, j - 1))))))))
    return pairs.select(
        "u", "v", F.size(ax).alias("len_u"), F.size(bx).alias("len_v"),
        F.element_at(final, nb).alias("frechet"))


def chaikin_smooth(pts: DataFrame, entity_col: str = "user_id",
                   order_cols: "tuple[str, ...]" = ("ts", "event_id"),
                   x_col: str = "x", y_col: str = "y", *,
                   iters: int = 2) -> DataFrame:
    """Chaikin corner-cutting polyline smoothing (Chaikin 1974): each
    refinement replaces every segment (P, Q) with the quarter-points
    ¼P+¾Q and ¾P+¼Q, keeping the endpoints — k rounds converge to the
    quadratic B-spline through the control polygon.  The smoothing
    dual of RDP simplification (geo/simplify.py removes vertices;
    this inserts them).

    EXACT-integer contract: instead of dividing by 4 per round, the
    coordinates are carried SCALED — round k emits
    ``3·x_i + x_{i+1}`` / ``x_i + 3·x_{i+1}`` in units of 4^−k (the
    ``scale`` output column is 4^iters) — so every vertex is an exact
    long and the gate value-hashes; consumers divide once at the
    edge.  Coordinate bound: |x|·4^iters must fit int64 (µdeg walks
    at iters ≤ 20 are fine).

    Per round: one lead window + a 2-way posexplode + the endpoint
    union + a renumber window — ALL partitioned by the entity key, so
    Spark plans one exchange per round (rounds are a fixed small
    constant; the oracle unrolls them).  Output rows ≈ 2^iters·n per
    entity.  Returns ``(entity, rn, x, y, scale)``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1: {iters}")
    w0 = Window.partitionBy(entity_col).orderBy(*order_cols)
    cur = pts.select(entity_col,
                     F.row_number().over(w0).alias("rn"),
                     F.col(x_col).cast("long").alias("x"),
                     F.col(y_col).cast("long").alias("y"))
    for _ in range(iters):
        w = Window.partitionBy(entity_col).orderBy("rn")
        wg = Window.partitionBy(entity_col)
        staged = cur.select(
            entity_col, "rn", "x", "y",
            F.lead("x").over(w).alias("_nx"),
            F.lead("y").over(w).alias("_ny"),
            F.count(F.lit(1)).over(wg).alias("_n"))
        mids = (staged.filter(F.col("_nx").isNotNull())
                .select(entity_col, F.posexplode(F.array(
                    F.struct((3 * F.col("x") + F.col("_nx")).alias("x"),
                             (3 * F.col("y") + F.col("_ny")).alias("y"),
                             (2 * F.col("rn")).alias("o")),
                    F.struct((F.col("x") + 3 * F.col("_nx")).alias("x"),
                             (F.col("y") + 3 * F.col("_ny")).alias("y"),
                             (2 * F.col("rn") + 1).alias("o"))))
                    .alias("_i", "_s"))
                .select(entity_col, F.col("_s.x").alias("x"),
                        F.col("_s.y").alias("y"),
                        F.col("_s.o").alias("_o")))
        first = (staged.filter(F.col("rn") == 1)
                 .select(entity_col, (4 * F.col("x")).alias("x"),
                         (4 * F.col("y")).alias("y"),
                         F.lit(1).alias("_o")))
        last = (staged.filter((F.col("rn") == F.col("_n"))
                              & (F.col("_n") > 1))
                .select(entity_col, (4 * F.col("x")).alias("x"),
                        (4 * F.col("y")).alias("y"),
                        (2 * F.col("rn")).alias("_o")))
        uni = mids.unionByName(first).unionByName(last)
        cur = uni.select(
            entity_col,
            F.row_number().over(
                Window.partitionBy(entity_col).orderBy("_o"))
            .alias("rn"), "x", "y")
    return cur.withColumn("scale", F.lit(4 ** iters).cast("long"))


def lcss_pairs(pts: DataFrame, entity_col: str = "user_id",
               order_cols: "tuple[str, ...]" = ("ts", "event_id"),
               x_col: str = "x", y_col: str = "y", *,
               cell: int = 2048, max_moves: int = 12,
               n_blocks: int = 100, eps: int = 1) -> DataFrame:
    """Longest-common-subsequence trajectory similarity (LCSS,
    Vlachos-Kollios-Gunopulos ICDE'02) between co-blocked pairs: two
    cells MATCH when both |Δcx| ≤ eps and |Δcy| ≤ eps, and the score
    is the longest monotone chain of matches — the noise-ROBUST
    aligner (an outlier spike costs DTW its full distance and caps
    Fréchet; LCSS just skips it).  ``sim = L/min(len_u, len_v)``.

    Recurrence L[i][j] = L[i−1][j−1]+1 on match else
    max(L[i−1][j], L[i][j−1]) — exact integers via the same nested
    in-row HOF fold as dtw_pairs/frechet_pairs; like Fréchet the
    max recurrence does not telescope, so the oracle unrolls
    COLUMN-WISE (lateral aliases).  Same substrate, knobs and scale
    shape (``_cell_signature_pairs``).  Returns
    ``(u, v, len_u, len_v, lcss, sim)``, u < v.
    """
    if eps < 0:
        raise ValueError(f"eps must be >= 0: {eps}")
    pairs = _cell_signature_pairs(pts, entity_col, order_cols, x_col,
                                  y_col, cell=cell,
                                  max_moves=max_moves,
                                  n_blocks=n_blocks)
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")

    def match(i, j):
        return ((F.abs(F.element_at(ax, i) - F.element_at(bx, j))
                 <= eps)
                & (F.abs(F.element_at(ay, i) - F.element_at(by, j))
                   <= eps))

    nb = F.size(bx)
    empty = F.array().cast("array<long>")
    zero = F.lit(0).cast("long")
    # row 1: L[1][j] = 1 from the first match onward
    row1 = F.aggregate(
        F.sequence(F.lit(1), nb), empty,
        lambda acc, j: F.concat(acc, F.array(
            F.greatest(
                F.when(match(F.lit(1), j), F.lit(1).cast("long"))
                .otherwise(zero),
                F.when(j == 1, zero)
                .otherwise(F.element_at(acc, j - 1))))))
    outer_idx = F.when(F.size(ax) >= 2,
                       F.sequence(F.lit(2), F.size(ax))) \
        .otherwise(F.array().cast("array<int>"))
    final = F.aggregate(
        outer_idx, row1,
        lambda prev, i: F.aggregate(
            F.sequence(F.lit(1), nb), empty,
            lambda acc, j: F.concat(acc, F.array(
                F.when(match(i, j),
                       F.when(j == 1, zero)
                       .otherwise(F.element_at(prev, j - 1)) + 1)
                .otherwise(F.greatest(
                    F.element_at(prev, j),
                    F.when(j == 1, zero)
                    .otherwise(F.element_at(acc, j - 1))))))))
    lcss = F.element_at(final, nb)
    den = F.least(F.size(ax), F.size(bx)).cast("long")
    return pairs.select(
        "u", "v", F.size(ax).alias("len_u"), F.size(bx).alias("len_v"),
        lcss.alias("lcss"),
        F.when(den > 0, lcss.cast("double") / den.cast("double"))
        .alias("sim"))


def convoy_pairs(df: DataFrame, cell: int, bucket_s: int,
                 min_run: int = 3,
                 entity_col: str = "user_id",
                 ts_col: str = "ts",
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Pairwise convoy detection (the 2-entity core of Jeung et al.
    VLDB'08 convoy queries): entity pairs that travel TOGETHER — share
    a space-time cell in at least ``min_run`` CONSECUTIVE time buckets.
    The temporal-run twin of :func:`colocation_pairs`, which counts
    distinct co-visits regardless of adjacency; a convoy requires the
    contact to be sustained, which is what separates co-movement from
    repeated chance encounters at a hub.

    Shape: the distinct-visit pre-pass and space-time equi-join of
    colocation_pairs (same quadratic hot-cell hazard, same
    cap/salt guidance), co-visit buckets distinct'd per pair, then one
    gaps-and-islands window per pair (island = tb − row_number) and a
    max-run aggregate.  Exact integers end-to-end.

    Returns ``(user_a, user_b, n_buckets, max_run)`` for pairs with
    max_run ≥ min_run.
    """
    from pyspark.sql import Window as W

    from ..geo.tilemath import floor_div

    if cell <= 0 or bucket_s <= 0 or min_run < 1:
        raise ValueError("cell, bucket_s, min_run must be positive")
    visits = df.select(
        F.col(entity_col),
        floor_div(F.col(x_col), cell).alias("cx"),
        floor_div(F.col(y_col), cell).alias("cy"),
        floor_div(F.unix_micros(F.col(ts_col).cast("timestamp")),
                  bucket_s * 1_000_000).alias("tb")).distinct()
    a, b = visits.alias("a"), visits.alias("b")
    cob = (a.join(b, (F.col("a.cx") == F.col("b.cx"))
                  & (F.col("a.cy") == F.col("b.cy"))
                  & (F.col("a.tb") == F.col("b.tb"))
                  & (F.col(f"a.{entity_col}") < F.col(f"b.{entity_col}")))
           .select(F.col(f"a.{entity_col}").alias("user_a"),
                   F.col(f"b.{entity_col}").alias("user_b"),
                   F.col("a.tb").alias("tb"))
           .distinct())
    w = W.partitionBy("user_a", "user_b").orderBy("tb")
    isl = cob.withColumn("_isl", F.col("tb") - F.row_number().over(w))
    runs = (isl.groupBy("user_a", "user_b", "_isl")
            .agg(F.count(F.lit(1)).alias("_run")))
    return (runs.groupBy("user_a", "user_b")
            .agg(F.sum("_run").alias("n_buckets"),
                 F.max("_run").alias("max_run"))
            .filter(F.col("max_run") >= min_run))


def viterbi_match(pings: DataFrame, segs: DataFrame, radius: int,
                  cell: int, *, steps: int, k: int = 3,
                  traj_col: str = "traj", step_col: str = "step",
                  x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Viterbi map-matching (Newson & Krumm 2009, the graph-free
    variant): per trajectory the jointly most likely segment sequence,
    minimizing Σ emission + Σ transition where emission is the exact
    integer snapped d² (geo/overlay.py snap_candidates_exact) and
    transition is the squared displacement between successive matched
    (quantized-projection) positions — without a routable graph, the
    displacement term is the standard stand-in for NK's
    route-vs-great-circle gap.  Pointwise snapping (map_match) picks
    each ping's nearest segment independently; the decoder instead
    tolerates a locally-worse emission to avoid an implausible jump —
    the classic noisy-GPS disambiguation.

    Contract: every trajectory must present EXACTLY ``steps`` steps
    (0..steps−1) each with ≥ 1 candidate within ``radius``;
    trajectories failing that are dropped whole (off-road gaps need a
    gap policy, which is a different operator).  All costs are int64;
    cost ties break on the path STRING, so the winner value-hashes.

    Shape: one candidate cell-join, then ``steps − 1`` relational DP
    rounds — each ONE equi-join on traj + ONE (traj, cand) argmin
    groupBy over ≤ k² pairs per trajectory, localCheckpoint every few
    rounds (lineage discipline) — no driver data, no windows over
    fact-sized partitions.

    Returns ``(traj, total_cost, path)`` with path the comma-joined
    seg_id sequence.
    """
    from ..geo.overlay import snap_candidates_exact

    if steps < 2:
        raise ValueError("steps must be >= 2")
    pts = pings.select(F.col(traj_col).alias("_tj"),
                       F.col(step_col).alias("_st"),
                       F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    cands = snap_candidates_exact(
        pts, segs, radius, cell, k=k, id_cols=("_tj", "_st"))
    complete = (cands.select("_tj", "_st").distinct()
                .groupBy("_tj").agg(F.count(F.lit(1)).alias("_ns"))
                .filter(F.col("_ns") == steps).select("_tj"))
    cands = cands.join(complete, "_tj").localCheckpoint()
    state = (cands.filter(F.col("_st") == 0)
             .select("_tj", "j", F.col("e").alias("cost"),
                     F.col("seg_id").cast("string").alias("path"),
                     "qx", "qy"))
    for r in range(1, steps):
        cr = (cands.filter(F.col("_st") == r)
              .select("_tj", F.col("j").alias("j2"),
                      F.col("seg_id").alias("sid2"),
                      F.col("e").alias("e2"),
                      F.col("qx").alias("qx2"),
                      F.col("qy").alias("qy2")))
        trans = ((F.col("qx2") - F.col("qx"))
                 * (F.col("qx2") - F.col("qx"))
                 + (F.col("qy2") - F.col("qy"))
                 * (F.col("qy2") - F.col("qy")))
        stepped = (state.join(cr, "_tj")
                   .select("_tj", "j2", "qx2", "qy2",
                           (F.col("cost") + trans + F.col("e2"))
                           .alias("_c"),
                           F.concat(F.col("path"), F.lit(","),
                                    F.col("sid2").cast("string"))
                           .alias("_p")))
        state = (stepped.groupBy("_tj", "j2", "qx2", "qy2")
                 .agg(F.min(F.struct(F.col("_c"), F.col("_p")))
                      .alias("_b"))
                 .select("_tj", F.col("j2").alias("j"),
                         F.col("_b._c").alias("cost"),
                         F.col("_b._p").alias("path"),
                         F.col("qx2").alias("qx"),
                         F.col("qy2").alias("qy")))
        if r % 4 == 0:
            state = state.localCheckpoint()
    return (state.groupBy("_tj")
            .agg(F.min(F.struct(F.col("cost"), F.col("path")))
                 .alias("_b"))
            .select(F.col("_tj").alias("traj"),
                    F.col("_b.cost").alias("total_cost"),
                    F.col("_b.path").alias("path")))


def home_work_infer(df: DataFrame, cell: int, *,
                    entity_col: str = "user_id", ts_col: str = "ts",
                    x_col: str = "x", y_col: str = "y",
                    night: "tuple[int, int]" = (22, 6),
                    day: "tuple[int, int]" = (9, 17)) -> DataFrame:
    """Home/work anchor inference (the standard CDR/mobility-mining
    heuristic, e.g. Phithakkitnukoon 2012): a user's HOME is the modal
    grid cell of their night-hour pings (wrap-around window
    [night_lo, 24) ∪ [0, night_hi)), WORK the modal cell of the
    day-hour window [day_lo, day_hi).  Ties break to the
    lexicographically smallest (cx, cy) — deterministic, and the share
    columns expose how dominant each anchor is as an exact rational
    numerator/denominator pair plus one pinned division.

    Shape: one filtered (entity, cell) count per period +
    one argmax groupBy each — map-side-combinable throughout; entities
    missing a period are left-join-NULL, not dropped.

    Returns ``(entity, home_cx, home_cy, home_n, home_total,
    home_share, work_cx, work_cy, work_n, work_total, work_share)``.
    """
    from ..geo.tilemath import floor_div

    if cell <= 0:
        raise ValueError("cell must be positive")
    hour = F.pmod(floor_div(
        F.unix_micros(F.col(ts_col).cast("timestamp")),
        3_600_000_000), F.lit(24))
    base = df.select(
        F.col(entity_col).alias("entity"),
        hour.alias("_h"),
        floor_div(F.col(x_col), cell).alias("_cx"),
        floor_div(F.col(y_col), cell).alias("_cy"))

    def window_mask(lo: int, hi: int):
        if lo <= hi:
            return (F.col("_h") >= lo) & (F.col("_h") < hi)
        return (F.col("_h") >= lo) | (F.col("_h") < hi)

    def anchor(mask, tag: str) -> DataFrame:
        per = (base.filter(mask)
               .groupBy("entity", "_cx", "_cy")
               .agg(F.count(F.lit(1)).alias("_n")))
        tot = per.groupBy("entity").agg(F.sum("_n").alias("_tot"))
        best = (per.groupBy("entity")
                .agg(F.max(F.struct(
                    F.col("_n"), (-F.col("_cx")).alias("_nx"),
                    (-F.col("_cy")).alias("_ny"))).alias("_b")))
        return (best.join(tot, "entity").select(
            "entity",
            (-F.col("_b._nx")).alias(f"{tag}_cx"),
            (-F.col("_b._ny")).alias(f"{tag}_cy"),
            F.col("_b._n").alias(f"{tag}_n"),
            F.col("_tot").alias(f"{tag}_total"),
            (F.col("_b._n").cast("double")
             / F.col("_tot").cast("double")).alias(f"{tag}_share")))

    ents = base.select("entity").distinct()
    return (ents
            .join(anchor(window_mask(*night), "home"), "entity", "left")
            .join(anchor(window_mask(*day), "work"), "entity", "left"))
