"""Segment-intersection overlay: find all crossing/touching segment
pairs in a corpus — the primitive under topology validation, polyline
overlay, and self-intersection checks (the reference validates tile
geometries only implicitly; SURVEY §2.4 neighborhood/join family).

Exactness: the intersection test is the classic CLRS orientation-sign
predicate — three 2×2 integer cross products per endpoint — so on
integer coordinates the decision is EXACT (no epsilon, no floats), and
the DuckDB oracle replays the identical CASE logic for a full
value-hash gate.

Scale shape (the plane-sweep alternative is inherently sequential; the
distributed form is a grid join):

1. each segment explodes to the eps-grid cells its bounding box covers
   (cell size ≥ the max segment extent ⇒ ≤ 4 cells per segment, a
   constant fan-out like the DBSCAN 3×3 probe);
2. self equi-join on the cell key — the ONLY shuffle;
3. a pair is tested in exactly ONE cell — the cell of the top-left
   corner of the two bboxes' overlap (``(max(minx_a, minx_b) divf C,
   max(miny_a, miny_b) divf C)``), which both segments provably cover —
   so no distinct/dedup pass is needed after the join;
4. the orientation predicate runs inside the join filter
   (whole-stage codegen).

At 100 TB the cell key is the usual spatial-skew story (dense urban
cells): AQE skew-join or pre-salting applies unchanged because the
refine is stateless per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tilemath import floor_div as _floor_div

__all__ = ["orient2d", "segment_pairs_intersecting", "snap_to_segments",
           "rect_overlap_join"]


def orient2d(ax: Column, ay: Column, bx: Column, by: Column,
             cx: Column, cy: Column) -> Column:
    """Sign-carrying double area of triangle ABC:
    ``(b−a) × (c−a)`` — >0 left turn, <0 right turn, 0 collinear.
    Exact on integer columns for |coord| < 2^30: differences reach
    2^31, each product < 2^62, and the subtraction stays < 2^63."""
    return ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _on_segment(px: Column, py: Column, qx: Column, qy: Column,
                rx: Column, ry: Column) -> Column:
    """Collinear point r within segment pq's bbox (caller guarantees
    collinearity via orient2d == 0)."""
    return (
        (rx >= F.least(px, qx)) & (rx <= F.greatest(px, qx))
        & (ry >= F.least(py, qy)) & (ry <= F.greatest(py, qy)))


def _intersect_kind(a, b) -> Column:
    """'proper' (interiors cross), 'touch' (endpoint/collinear overlap
    contact), NULL (disjoint) — CLRS 33.1 sign analysis, exact."""
    d1 = orient2d(b["x1"], b["y1"], b["x2"], b["y2"], a["x1"], a["y1"])
    d2 = orient2d(b["x1"], b["y1"], b["x2"], b["y2"], a["x2"], a["y2"])
    d3 = orient2d(a["x1"], a["y1"], a["x2"], a["y2"], b["x1"], b["y1"])
    d4 = orient2d(a["x1"], a["y1"], a["x2"], a["y2"], b["x2"], b["y2"])
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    touch = (
        ((d1 == 0) & _on_segment(b["x1"], b["y1"], b["x2"], b["y2"],
                                 a["x1"], a["y1"]))
        | ((d2 == 0) & _on_segment(b["x1"], b["y1"], b["x2"], b["y2"],
                                   a["x2"], a["y2"]))
        | ((d3 == 0) & _on_segment(a["x1"], a["y1"], a["x2"], a["y2"],
                                   b["x1"], b["y1"]))
        | ((d4 == 0) & _on_segment(a["x1"], a["y1"], a["x2"], a["y2"],
                                   b["x2"], b["y2"])))
    return (F.when(proper, F.lit("proper"))
            .when(touch, F.lit("touch"))
            .otherwise(F.lit(None).cast("string")))


def segment_pairs_intersecting(
    segs: DataFrame,
    cell: int,
    *,
    id_col: str = "seg_id",
    validate: bool = True,
) -> DataFrame:
    """``(i, j, kind)`` for every unordered pair i < j of segments that
    intersect (kind ∈ proper | touch).  ``segs`` columns: ``id_col, x1,
    y1, x2, y2`` (exact integers).  ``cell`` must be ≥ the maximum
    segment bbox extent on either axis (validated) so a bbox covers at
    most 2×2 cells."""
    if cell <= 0:
        raise ValueError("cell must be a positive integer")
    if validate:
        # eager contract check = one extra scan; callers who guarantee
        # the extent bound upstream pass validate=False at scale
        ext = segs.select(
            F.max(F.greatest(
                F.abs(F.col("x2") - F.col("x1")),
                F.abs(F.col("y2") - F.col("y1")))).alias("m")).first()["m"]
        if ext is not None and ext > cell:
            raise ValueError(
                f"cell={cell} smaller than max segment extent {ext}: "
                "bbox would cover more than 2x2 cells")

    base = segs.select(
        F.col(id_col).alias("sid"),
        F.col("x1").cast("long").alias("x1"),
        F.col("y1").cast("long").alias("y1"),
        F.col("x2").cast("long").alias("x2"),
        F.col("y2").cast("long").alias("y2"),
        F.least("x1", "x2").cast("long").alias("minx"),
        F.least("y1", "y2").cast("long").alias("miny"),
        F.greatest("x1", "x2").cast("long").alias("maxx"),
        F.greatest("y1", "y2").cast("long").alias("maxy"))
    covered = base.select(
        "*",
        F.explode(F.sequence(_floor_div(F.col("minx"), cell),
                             _floor_div(F.col("maxx"), cell)))
        .alias("ccx")).select(
        "*",
        F.explode(F.sequence(_floor_div(F.col("miny"), cell),
                             _floor_div(F.col("maxy"), cell)))
        .alias("ccy"))

    a = covered.alias("a")
    b = covered.alias("b")
    ac, bc = (lambda n: F.col(f"a.{n}")), (lambda n: F.col(f"b.{n}"))
    canon_x = _floor_div(F.greatest(ac("minx"), bc("minx")), cell)
    canon_y = _floor_div(F.greatest(ac("miny"), bc("miny")), cell)
    pair = a.join(
        b,
        (ac("ccx") == bc("ccx")) & (ac("ccy") == bc("ccy"))
        & (ac("sid") < bc("sid"))
        # bbox overlap (cheap reject before the orientation math)
        & (ac("minx") <= bc("maxx")) & (bc("minx") <= ac("maxx"))
        & (ac("miny") <= bc("maxy")) & (bc("miny") <= ac("maxy"))
        # test each pair in exactly one cell: the overlap's top-left
        & (ac("ccx") == canon_x) & (ac("ccy") == canon_y))
    kind = _intersect_kind(
        {k: ac(k) for k in ("x1", "y1", "x2", "y2")},
        {k: bc(k) for k in ("x1", "y1", "x2", "y2")})
    return (pair.select(ac("sid").alias("i"), bc("sid").alias("j"),
                        kind.alias("kind"))
            .filter(F.col("kind").isNotNull()))


def _seg_cells(segs: DataFrame, cell: int, *,
               seg_id: str = "seg_id") -> DataFrame:
    """Segments exploded to every grid cell their bbox covers —
    shared skeleton of snap_to_segments / snap_candidates_exact."""
    s = segs.select(
        F.col(seg_id).alias("sid"),
        F.col("x1").cast("long").alias("sx1"),
        F.col("y1").cast("long").alias("sy1"),
        F.col("x2").cast("long").alias("sx2"),
        F.col("y2").cast("long").alias("sy2"))
    s = s.select(
        "*",
        F.explode(F.sequence(
            _floor_div(F.least("sx1", "sx2"), cell),
            _floor_div(F.greatest("sx1", "sx2"), cell))).alias("scx"))
    return s.select(
        "*",
        F.explode(F.sequence(
            _floor_div(F.least("sy1", "sy2"), cell),
            _floor_div(F.greatest("sy1", "sy2"), cell))).alias("scy"))


def _point_ring(points: DataFrame, cell: int,
                id_cols: "tuple[str, ...]", x: str,
                y: str) -> DataFrame:
    """Points exploded to their 3x3 cell ring (ring-1 coverage for
    radius <= cell) — shared skeleton of the snap family."""
    offs = F.array(*[
        F.struct(F.lit(dx).cast("long").alias("dx"),
                 F.lit(dy).cast("long").alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    return (points.select(
        *[F.col(c) for c in id_cols],
        F.col(x).cast("long").alias("px"),
        F.col(y).cast("long").alias("py"),
        F.explode(offs).alias("_o"))
        .select(*id_cols, "px", "py",
                (_floor_div(F.col("px"), cell)
                 + F.col("_o.dx")).alias("pcx"),
                (_floor_div(F.col("py"), cell)
                 + F.col("_o.dy")).alias("pcy")))


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    radius: int,
    cell: int,
    *,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    x: str = "x",
    y: str = "y",
    validate: bool = True,
) -> DataFrame:
    """Map-matching: ``(point_id, seg_id, d2)`` — each point snapped to
    its nearest segment within ``radius`` (GPS-error bound); points with
    no segment in range are absent (off-road).

    Distance is the exact point-to-segment form: integer dot products
    decide the projection clamp; the interior case divides two exact
    integers (cross², L²) ONCE — the only IEEE op, order-pinned, so the
    oracle reproduces d2 bit-for-bit and the (d2, seg_id) struct-min
    tie-break is engine-deterministic.

    Coverage contract: ``radius ≤ cell`` (validated) ⇒ a point's 3×3
    cell ring covers every cell that can contain its nearest in-range
    segment point (which lies inside the segment's bbox cells).  A
    (point, segment) pair surfacing through several shared cells is
    harmless — min over a multiset — so no dedup pass exists.

    Shape: segments explode to ≤ 2×2 covered cells, points to their 9
    ring cells; ONE equi-join on the cell key carries (id, coords)
    payloads only; the min is a map-side-combinable struct-min groupBy.
    """
    if radius <= 0 or radius > cell:
        raise ValueError("need 0 < radius <= cell (ring-1 coverage)")
    if validate:
        ext = segs.select(
            F.max(F.greatest(
                F.abs(F.col("x2") - F.col("x1")),
                F.abs(F.col("y2") - F.col("y1")))).alias("m")).first()["m"]
        if ext is not None and ext > cell:
            raise ValueError(
                f"cell={cell} smaller than max segment extent {ext}")

    s = _seg_cells(segs, cell, seg_id=seg_id)
    p = _point_ring(points.select(F.col(point_id).alias("pid"),
                                  F.col(x), F.col(y)),
                    cell, ("pid",), x, y)
    j = p.join(s, (p["pcx"] == s["scx"]) & (p["pcy"] == s["scy"]))
    ax, ay = F.col("sx1"), F.col("sy1")
    bx, by = F.col("sx2"), F.col("sy2")
    px_, py_ = F.col("px"), F.col("py")
    tnum = (px_ - ax) * (bx - ax) + (py_ - ay) * (by - ay)
    l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    cross = (bx - ax) * (py_ - ay) - (by - ay) * (px_ - ax)
    d2 = (F.when((l2 == 0) | (tnum <= 0),
                 ((px_ - ax) * (px_ - ax)
                  + (py_ - ay) * (py_ - ay)).cast("double"))
          .when(tnum >= l2,
                ((px_ - bx) * (px_ - bx)
                 + (py_ - by) * (py_ - by)).cast("double"))
          .otherwise((cross * cross).cast("double") / l2.cast("double")))
    cand = (j.select("pid", F.col("sid"), d2.alias("d2"))
            .filter(F.col("d2") <= F.lit(float(radius) * float(radius))))
    best = (cand.groupBy("pid")
            .agg(F.min(F.struct(F.col("d2"), F.col("sid"))).alias("_b"))
            .select(F.col("pid").alias(point_id),
                    F.col("_b.sid").alias(seg_id),
                    F.col("_b.d2").alias("d2")))
    return best


def rect_overlap_join(a: DataFrame, b: DataFrame, *, cell: int,
                      a_id: str = "a_id",
                      b_id: str = "b_id") -> DataFrame:
    """Rectangle-intersects-rectangle spatial join on exact integer
    boxes — the 2-D interval join (bbox pre-pass of polygon overlay,
    raster chunk ↔ vector footprint matching).

    Inputs carry ``(id, x0, y0, x1, y1)`` with x0 ≤ x1, y0 ≤ y1 (ints).
    Candidates come from ONE equi-join on covering grid cells (each box
    explodes to the cells it touches — bounded by (w/cell+2)(h/cell+2),
    so pick ``cell`` ≳ the typical box edge), deduped, then the exact
    closed-interval overlap test keeps true pairs and computes the
    intersection box + area (exact longs).  The brute O(|A|·|B|) theta
    join lives only in the oracle — a value-hash match proves the cell
    candidates lost no pair.

    Returns ``(a_id, b_id, ix0, iy0, ix1, iy1, inter_area)``.
    """
    if cell <= 0:
        raise ValueError(f"cell must be positive: {cell}")

    def cells(df: DataFrame, idc: str, tag: str) -> DataFrame:
        cx0 = _floor_div(F.col("x0").cast("long"), cell)
        cx1 = _floor_div(F.col("x1").cast("long"), cell)
        cy0 = _floor_div(F.col("y0").cast("long"), cell)
        cy1 = _floor_div(F.col("y1").cast("long"), cell)
        return df.select(
            F.col(idc), "x0", "y0", "x1", "y1",
            F.explode(F.sequence(cx0, cx1)).alias("ccx"),
            cy0.alias("_cy0"), cy1.alias("_cy1")
        ).select(
            F.col(idc).alias(f"{tag}id"),
            F.col("x0").alias(f"{tag}x0"), F.col("y0").alias(f"{tag}y0"),
            F.col("x1").alias(f"{tag}x1"), F.col("y1").alias(f"{tag}y1"),
            "ccx", F.explode(F.sequence("_cy0", "_cy1")).alias("ccy"))

    ca = cells(a, a_id, "a_")
    cb = cells(b, b_id, "b_")
    cand = (ca.join(cb, ["ccx", "ccy"])
            .select("a_id", "b_id", "a_x0", "a_y0", "a_x1", "a_y1",
                    "b_x0", "b_y0", "b_x1", "b_y1")
            .distinct())
    hit = cand.filter(
        (F.col("a_x0") <= F.col("b_x1")) & (F.col("b_x0") <= F.col("a_x1"))
        & (F.col("a_y0") <= F.col("b_y1"))
        & (F.col("b_y0") <= F.col("a_y1")))
    ix0 = F.greatest("a_x0", "b_x0")
    iy0 = F.greatest("a_y0", "b_y0")
    ix1 = F.least("a_x1", "b_x1")
    iy1 = F.least("a_y1", "b_y1")
    return hit.select(
        "a_id", "b_id", ix0.alias("ix0"), iy0.alias("iy0"),
        ix1.alias("ix1"), iy1.alias("iy1"),
        ((ix1 - ix0) * (iy1 - iy0)).cast("long").alias("inter_area"))


def areal_interpolate(rects: DataFrame, *, grid: int, value_col: str,
                      scale: int = 10 ** 8,
                      id_col: str = "a_id") -> DataFrame:
    """Areal interpolation (area-weighted reapportionment — Goodchild &
    Lam, Geo-Processing 1980): redistribute each source rectangle's
    integer value onto the ``grid``-sized target cells it overlaps,
    proportional to overlap area.  Each contribution is the exact
    scaled integer

        term = (value · overlap_area · scale) div source_area

    (all positive int64s, floor division — identical in any engine),
    so the per-cell sum is order-independent and the final estimate is
    ONE pinned division by ``scale``.  Quantization error is bounded by
    n_src/scale per cell — documented contract, same recipe as the LOF
    reciprocal carry.

    int64 bound: ``max value · grid² · scale < 2^63`` — callers with
    big cells or values lower ``scale``.

    Half-open semantics: rect [x0,x1)×[y0,y1), cell
    [gx·grid,(gx+1)·grid); degenerate rects (zero area) are rejected
    in-plan.  One explode over the ≤(w/grid+2)(h/grid+2) touched cells
    + one groupBy(cell) — the rect scan is the only full pass.
    Returns ``(gx, gy, n_src, est_scaled, est)``."""
    if grid <= 0 or scale <= 0:
        raise ValueError("grid and scale must be positive")
    x0, y0 = F.col("x0").cast("long"), F.col("y0").cast("long")
    x1, y1 = F.col("x1").cast("long"), F.col("y1").cast("long")
    area = (x1 - x0) * (y1 - y0)
    guarded = F.when(
        area <= 0,
        F.raise_error(F.lit("areal_interpolate: degenerate rect"))
        .cast("long")).otherwise(area)
    v = F.col(value_col).cast("long")
    exploded = (rects.select(
        F.col(id_col), v.alias("_v"), x0.alias("_x0"), y0.alias("_y0"),
        x1.alias("_x1"), y1.alias("_y1"), guarded.alias("_area"),
        F.explode(F.sequence(_floor_div(x0, grid),
                             _floor_div(x1 - 1, grid))).alias("gx"))
        .select("*", F.explode(F.sequence(
            _floor_div(F.col("_y0"), grid),
            _floor_div(F.col("_y1") - 1, grid))).alias("gy")))
    ow = (F.least(F.col("_x1"), (F.col("gx") + 1) * grid)
          - F.greatest(F.col("_x0"), F.col("gx") * grid))
    oh = (F.least(F.col("_y1"), (F.col("gy") + 1) * grid)
          - F.greatest(F.col("_y0"), F.col("gy") * grid))
    term = F.expr(f"(_v * _ov * CAST({scale} AS BIGINT)) div _area")
    out = (exploded.withColumn("_ov", ow * oh)
           .filter(F.col("_ov") > 0)
           .withColumn("_term", term)
           .groupBy("gx", "gy")
           .agg(F.count(F.lit(1)).alias("n_src"),
                F.sum("_term").alias("est_scaled")))
    return out.withColumn(
        "est", F.col("est_scaled").cast("double") / F.lit(float(scale)))


def snap_candidates_exact(
    points: DataFrame,
    segs: DataFrame,
    radius: int,
    cell: int,
    *,
    k: int = 3,
    id_cols: "tuple[str, ...]" = ("point_id",),
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Top-``k`` candidate segments per point, ENTIRELY in exact
    integers — the multi-candidate front end of Viterbi map-matching
    (snap_to_segments keeps only the winner and a pinned-double d²;
    a sequence decoder needs the alternatives plus the matched
    positions, and needs them integer so path costs value-hash).

    Per (point, segment): emission ``e = floor(d²)`` (endpoint cases
    exact, interior ``cross² // L²`` — non-negative, so truncation IS
    floor in every engine) and the half-up-quantized projection
    ``(qx, qy)`` via the non-negative numerator form
    ``(2·(a·L² + tnum·(b−a)) + L²) // (2·L²)`` (projection coordinates
    are non-negative whenever inputs are, keeping the truncating-vs-
    floor division trap out of play).  In-range means ``e ≤ radius²``
    — the quantized-emission radius test, pinned as the contract.

    Same cell-join skeleton and coverage contract as
    snap_to_segments, WITHOUT its segment-extent guard — long
    segments are legitimate here (they explode to every covered
    cell, so coverage still holds; the cost is (extent/cell)² join
    rows per long segment, the caller's trade).  (point, segment)
    duplicates from shared cells are dropped by a distinct before
    ranking, then candidates rank by (e, seg_id) — ``j`` is the
    0-based rank.

    Returns ``(*id_cols, j, seg_id, e, qx, qy)``.
    """
    if radius <= 0 or radius > cell:
        raise ValueError("need 0 < radius <= cell (ring-1 coverage)")
    if k < 1:
        raise ValueError("k must be positive")
    from pyspark.sql import Window as W

    s = _seg_cells(segs, cell)
    p = _point_ring(points, cell, tuple(id_cols), x, y)
    j = p.join(s, (p["pcx"] == s["scx"]) & (p["pcy"] == s["scy"]))
    ax, ay = F.col("sx1"), F.col("sy1")
    bx, by = F.col("sx2"), F.col("sy2")
    px_, py_ = F.col("px"), F.col("py")
    tnum = (px_ - ax) * (bx - ax) + (py_ - ay) * (by - ay)
    l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    cross = (bx - ax) * (py_ - ay) - (by - ay) * (px_ - ax)
    c2 = cross * cross
    at_a = (l2 == 0) | (tnum <= 0)
    at_b = (~at_a) & (tnum >= l2)
    from .tilemath import floor_div_big

    e = (F.when(at_a, (px_ - ax) * (px_ - ax)
                + (py_ - ay) * (py_ - ay))
         .when(at_b, (px_ - bx) * (px_ - bx)
               + (py_ - by) * (py_ - by))
         .otherwise(floor_div_big(c2, l2)))

    def proj(a0: Column, d: Column) -> Column:
        num = 2 * (a0 * l2 + tnum * d) + l2
        return floor_div_big(num, 2 * l2)

    qx = (F.when(at_a, ax).when(at_b, bx)
          .otherwise(proj(ax, bx - ax)))
    qy = (F.when(at_a, ay).when(at_b, by)
          .otherwise(proj(ay, by - ay)))
    cand = (j.select(*id_cols, F.col("sid").alias("seg_id"),
                     e.alias("e"), qx.alias("qx"), qy.alias("qy"))
            .filter(F.col("e") <= radius * radius)
            .distinct())
    w = W.partitionBy(*id_cols).orderBy("e", "seg_id")
    return (cand.withColumn("j", F.row_number().over(w) - 1)
            .filter(F.col("j") < k)
            .select(*id_cols, "j", "seg_id", "e", "qx", "qy"))
