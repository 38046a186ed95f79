"""Sparse-raster neighborhood operators: focal statistics and D8 flow
direction.

A "raster" here is the repo's sparse grid shape — one row per occupied
cell ``(cx, cy, value)`` (the same substrate the ESDA/Getis-Ord/Geary
gates share); absent cells are nodata and excluded from every window,
the standard GIS focal convention.  Both operators are ONE explode(×k)
+ equi-join on the cell key — the Moran's-I join shape — so at 100 TB
they cost a single hash exchange of (cell, value) pairs regardless of
raster extent, and AQE/salting handles hot cells exactly as in the
DBSCAN candidate stage.

- ``focal_stats``: (2r+1)² moving-window count/sum/min/max over
  occupied neighbors, mean as ONE pinned double division — the map
  smoothing / convolution primitive.
- ``d8_flow``: steepest-descent flow direction (O'Callaghan & Mark,
  CVGIP 1984) with ESRI power-of-two direction codes.  Slope
  comparison is EXACT: slope² = drop²/dist² with dist² ∈ {1,2}, so
  ranking by ``drop²·(2/dist²)`` — an integer — totally orders
  candidates without any float; ties break on the direction code.
  Cells with no strictly-lower occupied neighbor are sinks/flats
  (``dir`` NULL) — the depression set a fill pass would iterate on.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ESRI D8 codes: E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128
# (y grows north; SE is +x,-y)
D8_DIRS = [
    (1, 0, 1), (1, -1, 2), (0, -1, 4), (-1, -1, 8),
    (-1, 0, 16), (-1, 1, 32), (0, 1, 64), (1, 1, 128),
]


def _offsets(radius: int, include_self: bool):
    return [(dx, dy) for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
            if include_self or (dx, dy) != (0, 0)]


def focal_stats(cells: DataFrame, x_col: str, y_col: str, v_col: str, *,
                radius: int = 1, include_self: bool = True) -> DataFrame:
    """Moving-window statistics over occupied neighbors: each occupied
    cell receives ``(n_nb, sum_nb, min_nb, max_nb, mean_nb)`` from the
    cells within Chebyshev distance ``radius``.  Values must be
    integer-typed (quantize upstream) so every aggregate except the
    final pinned mean division is exact."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    offs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _offsets(radius, include_self)])).alias("o")
    v = F.col(v_col).cast("long")
    src = (cells.select(F.col(x_col).alias("_sx"),
                        F.col(y_col).alias("_sy"), v.alias("_sv"))
           .select("_sx", "_sy", "_sv", offs)
           .select((F.col("_sx") + F.col("o.dx")).alias("_tx"),
                   (F.col("_sy") + F.col("o.dy")).alias("_ty"), "_sv"))
    tgt = cells.select(F.col(x_col), F.col(y_col), v.alias(v_col))
    joined = tgt.join(
        src, (tgt[x_col] == src["_tx"]) & (tgt[y_col] == src["_ty"]))
    out = (joined.groupBy(x_col, y_col, v_col)
           .agg(F.count(F.lit(1)).alias("n_nb"),
                F.sum("_sv").alias("sum_nb"),
                F.min("_sv").alias("min_nb"),
                F.max("_sv").alias("max_nb")))
    return out.withColumn(
        "mean_nb",
        F.col("sum_nb").cast("double") / F.col("n_nb").cast("double"))


def d8_flow(cells: DataFrame, x_col: str, y_col: str,
            z_col: str) -> DataFrame:
    """D8 flow direction over the occupied-cell surface: per cell, the
    ESRI code of the steepest strictly-downslope occupied neighbor
    (exact integer slope² ranking — see module docstring), the drop to
    it, and ``is_sink`` for cells with no such neighbor.  ``z_col``
    must be integer-typed."""
    z = F.col(z_col).cast("long")
    dirs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(code).alias("code"),
                 F.lit(dx * dx + dy * dy).alias("d2"))
        for dx, dy, code in D8_DIRS])).alias("o")
    base = cells.select(F.col(x_col), F.col(y_col), z.alias(z_col))
    cand = (base.select(x_col, y_col, z_col, dirs)
            .select(x_col, y_col, z_col,
                    (F.col(x_col) + F.col("o.dx")).alias("_nx"),
                    (F.col(y_col) + F.col("o.dy")).alias("_ny"),
                    F.col("o.code").alias("_code"),
                    F.col("o.d2").alias("_d2")))
    nb = base.select(F.col(x_col).alias("_nx"), F.col(y_col).alias("_ny"),
                     F.col(z_col).alias("_nz"))
    down = (cand.join(nb, ["_nx", "_ny"])
            .withColumn("_drop", F.col(z_col) - F.col("_nz"))
            .filter(F.col("_drop") > 0)
            # slope² · 2 as an exact integer: drop²·2/d² with d² ∈ {1,2}
            .withColumn("_key", F.col("_drop") * F.col("_drop")
                        * F.when(F.col("_d2") == 1,
                                 F.lit(2)).otherwise(F.lit(1))))
    w = Window.partitionBy(x_col, y_col).orderBy(
        F.col("_key").desc(), F.col("_code").asc())
    best = (down.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(x_col, y_col, F.col("_code").alias("dir"),
                    F.col("_drop").alias("zdrop")))
    return (base.join(best, [x_col, y_col], "left")
            .withColumn("is_sink", F.col("dir").isNull()))


def _dir_delta(dir_col):
    """ESRI code → (dx, dy) as a pair of literal CASE chains."""
    dx = F.lit(None).cast("long")
    dy = F.lit(None).cast("long")
    for ddx, ddy, code in D8_DIRS:
        dx = F.when(dir_col == code, F.lit(ddx)).otherwise(dx)
        dy = F.when(dir_col == code, F.lit(ddy)).otherwise(dy)
    return dx, dy


def d8_basins(cells: DataFrame, x_col: str, y_col: str, z_col: str, *,
              rounds: int = 8) -> DataFrame:
    """Watershed delineation over the D8 flow forest (pointer jumping /
    path doubling — Wyllie's classic PRAM technique): every cell's
    downstream pointer is squared ``rounds`` times, so after r rounds
    each cell points at its 2^r-step ancestor, saturating at its basin
    sink (sinks point to themselves).  ``rounds`` must satisfy
    2^rounds ≥ the longest flow path; like the sssp/k-core gates the
    oracle equality is the self-check — an insufficient unroll fails
    the value hash loudly.

    O(log path-length) self-joins on the cell key, localCheckpoint per
    round to keep lineage flat — the scale-correct alternative to
    driver-side chasing, and the same shape the connected-components
    operator uses.  Returns ``(x, y, basin_x, basin_y, is_sink)``;
    basins are keyed by their sink cell."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    flow = d8_flow(cells, x_col, y_col, z_col)
    dx, dy = _dir_delta(F.col("dir"))
    p = flow.select(
        F.col(x_col), F.col(y_col),
        F.when(F.col("is_sink"), F.col(x_col))
         .otherwise(F.col(x_col) + dx).alias("px"),
        F.when(F.col("is_sink"), F.col(y_col))
         .otherwise(F.col(y_col) + dy).alias("py"),
        "is_sink").localCheckpoint()
    for _ in range(rounds):
        b = p.select(F.col(x_col).alias("_jx"), F.col(y_col).alias("_jy"),
                     F.col("px").alias("_p2x"), F.col("py").alias("_p2y"))
        p = (p.join(b, (p["px"] == b["_jx"]) & (p["py"] == b["_jy"]))
             .select(x_col, y_col,
                     F.col("_p2x").alias("px"), F.col("_p2y").alias("py"),
                     "is_sink")
             .localCheckpoint())
    return p.select(x_col, y_col,
                    F.col("px").alias("basin_x"),
                    F.col("py").alias("basin_y"), "is_sink")


def _fdiv(c, d):
    """Floor division by a POSITIVE column divisor:
    ``(c - pmod(c, d)) / d`` — correct for negative numerators (matches
    DuckDB's ``//``), exact through the double divide for |c| < 2^53."""
    return ((c - F.pmod(c, d)) / d).cast("long")


def los_visibility(cells: DataFrame, pairs: DataFrame, x_col: str,
                   y_col: str, z_col: str) -> DataFrame:
    """Line-of-sight between cell pairs over the occupied-cell surface
    (the viewshed primitive, Bresenham/DDA form): the sight line from
    (x0,y0,z0) to (x1,y1,z1) is sampled at every intermediate step
    t = 1..n−1 (n = Chebyshev distance) at the rounded ray cell

        xt = x0 + ⌊(2·t·dx + n) / 2n⌋   (and likewise yt)

    — exact integer round-half-up on the rational t·dx/n — and the
    step BLOCKS iff the terrain there reaches the line:

        z_t · n ≥ z0·(n−t) + z1·t

    (all int64; grazing contact counts blocked, unoccupied ray cells
    are transparent — both documented conventions; the test is
    symmetric in the endpoints, so order pairs canonically).

    ``pairs`` carries (x0, y0, x1, y1) and is assumed tiny (e.g. the
    top-K peak set): rays explode to |pairs|·n̄ rows and BROADCAST
    against the single full cells scan — at fleet scale the raster is
    never exchanged.  Returns
    ``(x0, y0, x1, y1, n, n_blocked, visible)``."""
    z = F.col(z_col).cast("long")
    base = cells.select(F.col(x_col).alias("_cx"),
                        F.col(y_col).alias("_cy"), z.alias("_cz"))
    zs = base.select(F.col("_cx"), F.col("_cy"), F.col("_cz"))
    p = (pairs
         .join(zs.withColumnRenamed("_cz", "z0"),
               (F.col("x0") == F.col("_cx")) & (F.col("y0") == F.col("_cy")))
         .drop("_cx", "_cy")
         .join(zs.withColumnRenamed("_cz", "z1"),
               (F.col("x1") == F.col("_cx")) & (F.col("y1") == F.col("_cy")))
         .drop("_cx", "_cy")
         .withColumn("dx", F.col("x1") - F.col("x0"))
         .withColumn("dy", F.col("y1") - F.col("y0"))
         .withColumn("n", F.greatest(F.abs(F.col("dx")),
                                     F.abs(F.col("dy")))))
    # n == 1 (adjacent) has no intermediate steps; Spark's sequence(1, 0)
    # would auto-step DOWN to [1, 0], so the guard is load-bearing
    steps = (p.filter(F.col("n") >= 2)
             .select("x0", "y0", "x1", "y1", "z0", "z1", "dx", "dy", "n",
                     F.explode(F.sequence(F.lit(1), F.col("n") - 1))
                     .alias("t")))
    two_n = F.lit(2) * F.col("n")
    xt = F.col("x0") + _fdiv(F.lit(2) * F.col("t") * F.col("dx")
                             + F.col("n"), two_n)
    yt = F.col("y0") + _fdiv(F.lit(2) * F.col("t") * F.col("dy")
                             + F.col("n"), two_n)
    ray = steps.withColumn("xt", xt).withColumn("yt", yt)
    hit = (base.join(
        F.broadcast(ray),
        (F.col("_cx") == F.col("xt")) & (F.col("_cy") == F.col("yt")))
        .withColumn(
            "blocked",
            F.col("_cz") * F.col("n")
            >= F.col("z0") * (F.col("n") - F.col("t"))
            + F.col("z1") * F.col("t")))
    agg = (hit.groupBy("x0", "y0", "x1", "y1")
           .agg(F.sum(F.when(F.col("blocked"), F.lit(1).cast("long"))
                      .otherwise(0)).alias("n_blocked")))
    return (p.select("x0", "y0", "x1", "y1", "n")
            .join(agg, ["x0", "y0", "x1", "y1"], "left")
            .select("x0", "y0", "x1", "y1", "n",
                    F.coalesce("n_blocked", F.lit(0).cast("long"))
                    .alias("n_blocked"))
            .withColumn("visible", F.col("n_blocked") == 0))


def d8_accumulation(cells: DataFrame, x_col: str, y_col: str,
                    z_col: str, *, max_rounds: int = 64) -> DataFrame:
    """D8 flow accumulation: per cell the EXACT count of strictly
    upstream cells (cells whose flow path passes through it — ESRI's
    flow-accumulation raster, self excluded).  The recurrence
    ``U(c) = Σ_{u: downstream(u)=c} (U(u) + 1)`` is iterated to a TRUE
    fixpoint: U is monotone non-decreasing and bounded by the cell
    count, so the iteration stops the first round the global ΣU stops
    moving — a one-long control read per round (the k-core/CC
    discipline), never a data collect.  Raises past ``max_rounds``
    (cyclic input would mean a corrupted flow field — D8 descent is
    acyclic by construction).

    Each round is one equi-join + groupBy on the cell key with
    localCheckpoint to keep lineage flat; rounds needed = the longest
    flow path, so wall-clock is O(depth) exchanges of (cell, count)
    pairs.  Returns ``(x, y, n_upstream, is_sink)``."""
    flow = d8_flow(cells, x_col, y_col, z_col)
    dx, dy = _dir_delta(F.col("dir"))
    edges = (flow.filter(~F.col("is_sink"))
             .select(F.col(x_col).alias("_ux"), F.col(y_col).alias("_uy"),
                     (F.col(x_col) + dx).alias("_px"),
                     (F.col(y_col) + dy).alias("_py"))
             .localCheckpoint())
    base = flow.select(x_col, y_col, "is_sink").localCheckpoint()
    acc = base.select(x_col, y_col,
                      F.lit(0).cast("long").alias("u")).localCheckpoint()
    prev_total = -1
    for _ in range(max_rounds):
        child = (edges.join(
            acc, (edges["_ux"] == acc[x_col]) & (edges["_uy"] == acc[y_col]))
            .select(F.col("_px"), F.col("_py"),
                    (F.col("u") + 1).alias("_c")))
        inc = child.groupBy("_px", "_py").agg(F.sum("_c").alias("_u"))
        acc = (base.join(
            inc, (base[x_col] == inc["_px"]) & (base[y_col] == inc["_py"]),
            "left")
            .select(base[x_col], base[y_col],
                    F.coalesce(F.col("_u"), F.lit(0).cast("long"))
                    .alias("u"))
            .localCheckpoint())
        total = acc.agg(F.sum("u")).first()[0] or 0
        if total == prev_total:
            break
        prev_total = total
    else:
        raise RuntimeError(
            f"d8_accumulation: no fixpoint within {max_rounds} rounds "
            "(cyclic flow field?)")
    return (base.join(acc.withColumnRenamed("u", "n_upstream"),
                      [x_col, y_col])
            .select(x_col, y_col, "n_upstream", "is_sink"))


def morphology_close(cells: DataFrame, x_col: str = "cx",
                     y_col: str = "cy") -> DataFrame:
    """Morphological CLOSING of an occupied-cell set with the 3×3
    square structuring element: dilate (every cell gains its 8
    neighbors) then erode (keep cells whose full 3×3 neighborhood is
    covered) — fills one-cell pinholes and hairline gaps in a raster
    mask (hotspot footprints, coverage grids) without growing the
    outer boundary by more than the element radius.

    Pure integer set algebra — two stages, each one ×9 explode of the
    CURRENT mask plus one distinct/count equi-join on the cell key
    (the region_dissolve adjacency shape); no floats anywhere.
    Closing ⊇ original by construction.

    Returns the closed mask ``(x, y, was_filled)`` — was_filled 1 on
    the cells the closing added (the healed gaps), 0 on original
    cells.
    """
    base = cells.select(F.col(x_col).cast("long").alias("x"),
                        F.col(y_col).cast("long").alias("y")).distinct()
    offs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _offsets(1, True)])).alias("o")
    # dilation: union of 3x3 stamps
    dil = (base.select("x", "y", offs)
           .select((F.col("x") + F.col("o.dx")).alias("x"),
                   (F.col("y") + F.col("o.dy")).alias("y"))
           .distinct())
    # erosion of the dilation: a cell survives iff all 9 stamps cover
    # it — count the dilated neighbors it can see
    probe = (dil.select("x", "y", offs)
             .select((F.col("x") + F.col("o.dx")).alias("nx"),
                     (F.col("y") + F.col("o.dy")).alias("ny"),
                     "x", "y"))
    cov = (probe.join(dil.select(F.col("x").alias("nx"),
                                 F.col("y").alias("ny")),
                      ["nx", "ny"])
           .groupBy("x", "y").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") == 9)
           .select("x", "y"))
    return (cov.join(base.withColumn("_orig", F.lit(1)),
                     ["x", "y"], "left")
            .select("x", "y",
                    F.when(F.col("_orig").isNull(), 1).otherwise(0)
                    .alias("was_filled")))


def line_rasterize(segs: DataFrame, cell: int, *,
                   id_cols: "Sequence[str]" = ("seg_id",),
                   x0: str = "x0", y0: str = "y0",
                   x1: str = "x1", y1: str = "y1",
                   max_cells: int = 4096) -> DataFrame:
    """Supercover segment rasterization: EVERY grid cell whose closed
    ``cell × cell`` square intersects the closed segment — the exact
    vector→raster primitive behind line-feature tiling (which tiles
    does this road cross?), corridor screening, and trajectory heatmap
    densification (point rasterization undercounts fast movers; the
    supercover never skips a crossed cell, unlike 4/8-connected
    Bresenham).

    Exactness — pure integer separating-axis test, no floats anywhere:
    the candidate set is the segment's CLOSED cell-bbox — low side
    ``floor_div(min−1, cell)`` so a segment lying exactly on a cell
    boundary also reaches the touching row/column on the other side
    (closed-interval overlap, not half-open binning) — which satisfies
    the two box axes by construction, and a candidate survives iff the
    four cell corners are NOT strictly on one side of the segment's
    supporting line: sign of f(p) = Δx·(py−y0) − Δy·(px−x0).  Box axes
    + segment normal are the complete 2-D SAT axis set for box vs
    segment, so the test is exact for closed sets — boundary touches
    (segment through a corner, along an edge) are IN.  Zero-length
    segments degrade to the point's covering cell(s) (up to 4 on a
    corner) because f ≡ 0.  Overflow-safe while |Δ|·(bbox extent +
    2·cell) < 2⁶³ — micro-degree jumps are ~10 orders inside.

    Scale shape: two bounded explodes (cell-bbox rows) and NOTHING
    else — no join, no shuffle; the downstream per-cell count is one
    map-side-combinable groupBy.  The explode factor is
    O((len/cell + 2)²), guarded in-plan: a segment whose cell-bbox
    exceeds ``max_cells`` raises rather than detonating a task
    (split long segments upstream, the MVT clipping discipline).

    Returns ``(*id_cols, cx, cy)`` — one row per (segment, covered
    cell).
    """
    if cell < 1:
        raise ValueError("cell must be a positive integer")
    ids = list(id_cols)
    s = segs.select(*ids,
                    F.col(x0).cast("long").alias("_x0"),
                    F.col(y0).cast("long").alias("_y0"),
                    F.col(x1).cast("long").alias("_x1"),
                    F.col(y1).cast("long").alias("_y1"))
    cl = F.lit(cell).cast("long")
    cxmin = _fdiv(F.least("_x0", "_x1") - 1, cl)
    cxmax = _fdiv(F.greatest("_x0", "_x1"), cl)
    cymin = _fdiv(F.least("_y0", "_y1") - 1, cl)
    cymax = _fdiv(F.greatest("_y0", "_y1"), cl)
    n_cand = (cxmax - cxmin + 1) * (cymax - cymin + 1)
    guard = F.when(
        n_cand > max_cells,
        F.raise_error(F.lit(
            "line_rasterize: segment cell-bbox exceeds max_cells "
            f"({max_cells}) — split long segments upstream"))
        .cast("long")).otherwise(cxmax)
    s = (s.withColumn("_cxmin", cxmin).withColumn("_cxmax", guard)
         .withColumn("_cymin", cymin).withColumn("_cymax", cymax)
         .withColumn("cx", F.explode(F.sequence("_cxmin", "_cxmax")))
         .withColumn("cy", F.explode(F.sequence("_cymin", "_cymax"))))
    dx = F.col("_x1") - F.col("_x0")
    dy = F.col("_y1") - F.col("_y0")

    def _side(px, py):
        f = dx * (py - F.col("_y0")) - dy * (px - F.col("_x0"))
        return F.when(f > 0, 1).when(f < 0, -1).otherwise(0)

    bx0 = F.col("cx") * cl
    by0 = F.col("cy") * cl
    corners = [_side(bx0, by0), _side(bx0 + cl, by0),
               _side(bx0, by0 + cl), _side(bx0 + cl, by0 + cl)]
    smin = F.least(*corners)
    smax = F.greatest(*corners)
    return (s.filter(~((smin > 0) | (smax < 0)))
            .select(*ids, "cx", "cy"))


def slope_aspect(cells: DataFrame, x_col: str, y_col: str,
                 v_col: str) -> DataFrame:
    """Horn's slope/aspect over an integer elevation grid (Horn 1981 —
    the DEM operator behind every hillshade, drainage and viewshed
    pre-pass, and the gradient this module's D8 flow quantizes):

        8·dz/dx = (c + 2f + i) − (a + 2d + g)
        8·dz/dy = (g + 2h + i) − (a + 2b + c)

    over the 3×3 window (a..i row-major).  ONLY cells with all 8
    neighbors present get a gradient (edge cells report NULLs — the
    honest boundary, never a half-window estimate).

    Exactness: ``gx8``/``gy8`` (the ×8-scaled gradients) and
    ``slope64_q = gx8² + gy8²`` (the ×64-scaled squared slope in
    value-units² per cell-unit²) are exact int64; ``slope`` is one
    pinned √-divide.  Aspect avoids atan2 entirely: ``aspect_oct``
    is the downhill direction quantized to octants 0-7 (E, NE, N,
    NW, W, SW, S, SE) by integer sign/|gx| vs |gy| comparisons —
    bit-stable, and exactly the granularity D8 consumes; flat cells
    (zero gradient) get NULL aspect.

    Shape: one ×8 stencil explode + equi-join (the focal_stats
    shape), one groupBy keyed on the cell.

    Returns ``(x, y, v, gx8, gy8, slope64_q, slope, aspect_oct)``.
    """
    v = F.col(v_col).cast("long")
    offs = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _offsets(1, include_self=False)])).alias("o")
    src = (cells.select(F.col(x_col).alias("_sx"),
                        F.col(y_col).alias("_sy"), v.alias("_sv"))
           .select("_sx", "_sy", "_sv", offs)
           .select((F.col("_sx") + F.col("o.dx")).alias("_tx"),
                   (F.col("_sy") + F.col("o.dy")).alias("_ty"),
                   (-F.col("o.dx")).alias("_rdx"),
                   (-F.col("o.dy")).alias("_rdy"), "_sv"))
    tgt = cells.select(F.col(x_col), F.col(y_col), v.alias(v_col))
    j = tgt.join(src, (tgt[x_col] == src["_tx"])
                 & (tgt[y_col] == src["_ty"]))
    wx = F.col("_rdx") * F.when(F.col("_rdy") == 0, 2).otherwise(1)
    wy = F.col("_rdy") * F.when(F.col("_rdx") == 0, 2).otherwise(1)
    agg = (j.groupBy(x_col, y_col, v_col)
           .agg(F.count(F.lit(1)).alias("_k"),
                F.sum(wx * F.col("_sv")).cast("long").alias("_gx8"),
                F.sum(wy * F.col("_sv")).cast("long").alias("_gy8")))
    full = agg.filter(F.col("_k") == 8)
    gx, gy = F.col("_gx8"), F.col("_gy8")
    s64 = (gx * gx + gy * gy)
    slope = F.sqrt(s64.cast("double")) / F.lit(8.0)
    # downhill = −gradient; octant by integer comparisons
    dx, dy = -gx, -gy
    adx, ady = F.abs(dx), F.abs(dy)
    # octant table: E NE N NW W SW S SE = 0..7; diagonal band when
    # the components are within 2x of each other (the D8 convention)
    oct_ = (F.when(adx >= 2 * ady,
                   F.when(dx > 0, 0).otherwise(4))
            .when(ady >= 2 * adx,
                  F.when(dy > 0, 2).otherwise(6))
            .otherwise(
                F.when((dx > 0) & (dy > 0), 1)
                .when((dx < 0) & (dy > 0), 3)
                .when((dx < 0) & (dy < 0), 5)
                .otherwise(7)))
    aspect = F.when(s64 > 0, oct_)
    return full.select(
        x_col, y_col, v_col, gx.alias("gx8"), gy.alias("gy8"),
        s64.alias("slope64_q"), slope.alias("slope"),
        aspect.alias("aspect_oct"))
