"""Exact tile clipping of line segments — the MVT-encode cut step.

``clip_segments_to_tiles`` splits every input segment into the pieces
that fall inside each tile of a ``tile``-sized grid, with the clip
points computed in EXACT integer fraction arithmetic (Liang-Barsky
entry/exit parameters carried as (num, den) pairs with den > 0, every
comparison cross-multiplied) and emitted on a ``scale``-subpixel
integer grid via one half-up floor division per coordinate.  No
doubles anywhere, so the clipped geometry value-hashes across engines.

Conventions (pinned, tested):
- tile boxes are CLOSED [t·T, (t+1)·T] on both axes: a piece that ends
  exactly on a shared boundary belongs to the tile it came from, the
  neighbor sees a zero-length touch and drops it (strict t0 < t1);
  a segment LYING on a shared boundary goes to the HIGHER tile only
  (candidates come from floor-div bbox tiles — no closed-box
  duplication);
- coordinates must be non-negative (raise_error in-plan otherwise):
  shift upstream, like every tile pipeline does;
- candidate tiles are the segment's bbox tiles, bounded in-plan by
  ``max_tiles`` (a segment spanning more tiles than that is a data
  bug at any sane tile size, and the explode must stay bounded).

Scale: the only fan-out is the bounded bbox-tile explode (×k per
segment, k ≤ max_tiles); everything else is whole-stage-codegen
Column arithmetic — no shuffle at all until the caller aggregates per
tile.  At 100 TB this is the map-side step in front of tile assembly.

Reference parity: mapbox-filter consumes tiles already cut upstream
(src/Mapbox/*.hs filter/encode only); this operator supplies that
upstream cut Spark-side, completing the pyramid path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tilemath import floor_div, floor_div_big

__all__ = ["clip_segments_to_tiles"]


def _frac_max(a1: Column, b1: Column, a2: Column, b2: Column):
    c = a1 * b2 >= a2 * b1
    return F.when(c, a1).otherwise(a2), F.when(c, b1).otherwise(b2)


def _frac_min(a1: Column, b1: Column, a2: Column, b2: Column):
    c = a1 * b2 <= a2 * b1
    return F.when(c, a1).otherwise(a2), F.when(c, b1).otherwise(b2)


def _axis_params(p0: Column, d: Column, lo: Column, hi: Column):
    """Liang-Barsky entry/exit fractions for one axis, den > 0.
    d = 0 inside the slab → full [0,1]; outside → empty (1,1)>(0,1)."""
    inside = (lo <= p0) & (p0 <= hi)
    en_a = (F.when(d > 0, lo - p0).when(d < 0, p0 - hi)
            .otherwise(F.when(inside, F.lit(0)).otherwise(F.lit(1))))
    ex_a = (F.when(d > 0, hi - p0).when(d < 0, p0 - lo)
            .otherwise(F.when(inside, F.lit(1)).otherwise(F.lit(0))))
    den = F.when(d > 0, d).when(d < 0, -d).otherwise(F.lit(1))
    return en_a, den, ex_a, den


def _quant(p0: Column, d: Column, a: Column, b: Column,
           scale: int) -> Column:
    """Half-up ``scale``-subpixel quantization of p0 + d·a/b (exact:
    numerator and denominator are int64, coordinate ≥ 0, b > 0).

    floor_div_big, not floor_div: the numerator scales as coordinate ×
    axis-delta and can pass 2^53 for large world coordinates, where the
    double-divide spelling silently floors off by one (ADVICE r5)."""
    num = 2 * scale * (p0 * b + d * a) + b
    return floor_div_big(num, 2 * b)


def clip_segments_to_tiles(segs: DataFrame, tile: int, scale: int = 8,
                           *, max_tiles: int = 64) -> DataFrame:
    """Clip ``(line_id, seg_i, x0, y0, x1, y1)`` segments to every
    ``tile``-sized box they cross.  Returns ``(line_id, seg_i, tx, ty,
    qx0, qy0, qx1, qy1, cut_in, cut_out)`` with coordinates on the
    ``scale``-subpixel grid and flags marking clipped (vs original)
    endpoints."""
    if tile < 1:
        raise ValueError("tile must be a positive integer")
    if scale < 1:
        raise ValueError("scale must be a positive integer")

    cols = [F.col(c).cast("long") for c in ("x0", "y0", "x1", "y1")]
    neg = (cols[0] < 0) | (cols[1] < 0) | (cols[2] < 0) | (cols[3] < 0)
    s = segs.select(
        "line_id", "seg_i",
        *[F.when(neg, F.raise_error(F.lit(
            "clip_segments_to_tiles: negative coordinate — shift "
            "upstream"))).otherwise(c).alias(n)
          for n, c in zip(("x0", "y0", "x1", "y1"), cols)])

    txl = floor_div(F.least("x0", "x1"), tile)
    txh = floor_div(F.greatest("x0", "x1"), tile)
    tyl = floor_div(F.least("y0", "y1"), tile)
    tyh = floor_div(F.greatest("y0", "y1"), tile)
    span = (txh - txl + 1) * (tyh - tyl + 1)
    # guard rides the sequence endpoint — a detached column would be
    # pruned before it could fire
    txl_g = (F.when(span > max_tiles, F.raise_error(F.lit(
        f"clip_segments_to_tiles: segment bbox spans > {max_tiles} "
        "tiles — raise max_tiles or use a coarser grid")).cast("long"))
        .otherwise(txl))
    cand = (s.withColumn("tx", F.explode(F.sequence(txl_g, txh)))
            .withColumn("ty", F.explode(F.sequence(tyl, tyh))))

    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    t = F.lit(tile)
    xen_a, xen_b, xex_a, xex_b = _axis_params(
        F.col("x0"), dx, F.col("tx") * t, (F.col("tx") + 1) * t)
    yen_a, yen_b, yex_a, yex_b = _axis_params(
        F.col("y0"), dy, F.col("ty") * t, (F.col("ty") + 1) * t)
    e_a, e_b = _frac_max(xen_a, xen_b, yen_a, yen_b)
    t0_a, t0_b = _frac_max(e_a, e_b, F.lit(0), F.lit(1))
    x_a, x_b = _frac_min(xex_a, xex_b, yex_a, yex_b)
    t1_a, t1_b = _frac_min(x_a, x_b, F.lit(1), F.lit(1))

    w = (cand.select(
        "line_id", "seg_i", "tx", "ty", "x0", "y0",
        dx.alias("dx"), dy.alias("dy"),
        t0_a.alias("t0a"), t0_b.alias("t0b"),
        t1_a.alias("t1a"), t1_b.alias("t1b"))
        .filter(F.col("t0a") * F.col("t1b")
                < F.col("t1a") * F.col("t0b")))
    return w.select(
        "line_id", "seg_i", "tx", "ty",
        _quant(F.col("x0"), F.col("dx"), F.col("t0a"), F.col("t0b"),
               scale).alias("qx0"),
        _quant(F.col("y0"), F.col("dy"), F.col("t0a"), F.col("t0b"),
               scale).alias("qy0"),
        _quant(F.col("x0"), F.col("dx"), F.col("t1a"), F.col("t1b"),
               scale).alias("qx1"),
        _quant(F.col("y0"), F.col("dy"), F.col("t1a"), F.col("t1b"),
               scale).alias("qy1"),
        (F.col("t0a") > 0).alias("cut_in"),
        (F.col("t1a") < F.col("t1b")).alias("cut_out"))


def _ring_clip_stage(df: DataFrame, axis: str, cmp: str,
                     bound: Column) -> DataFrame:
    """One Sutherland-Hodgman half-plane pass over closed rings keyed
    by (rid, tx, ty), vertices ordered by i.  Intersections are exact
    rationals snapped half-up to the integer grid AT EMISSION (the
    encoder's snap-on-clip behavior, pinned)."""
    from pyspark.sql import Window

    keys = ["rid", "tx", "ty"]
    w = Window.partitionBy(*keys).orderBy("i")
    wf = (Window.partitionBy(*keys)
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    px = F.coalesce(F.lag("x").over(w), F.last("x").over(wf))
    py = F.coalesce(F.lag("y").over(w), F.last("y").over(wf))
    cur = F.col("x") if axis == "x" else F.col("y")
    prv = px if axis == "x" else py

    def inside(v: Column) -> Column:
        return v >= bound if cmp == "ge" else v <= bound

    # crossing edge: along-axis delta is nonzero by the strict
    # straddle; the off-axis intersection is one half-up floor-div
    d = (F.col("x") - px) if axis == "x" else (F.col("y") - py)
    off_c = F.col("y") if axis == "x" else F.col("x")
    off_p = py if axis == "x" else px
    num = off_p * d + (off_c - off_p) * (bound - (prv))
    nden = F.when(d < 0, -d).otherwise(d)
    nnum = F.when(d < 0, -num).otherwise(num)
    # floor_div_big: numerator is coordinate × delta scaled, which can
    # pass 2^53 where the double-divide floor_div goes off by one
    ioff = floor_div_big(2 * nnum + nden, 2 * nden)
    ix = bound if axis == "x" else ioff
    iy = ioff if axis == "x" else bound

    ipt = F.struct(F.lit(0).alias("sub"), ix.alias("x"), iy.alias("y"))
    cpt = F.struct(F.lit(1).alias("sub"), F.col("x").alias("x"),
                   F.col("y").alias("y"))
    emit = (F.when(inside(cur) & inside(prv), F.array(cpt))
            .when(inside(cur) & ~inside(prv), F.array(ipt, cpt))
            .when(~inside(cur) & inside(prv), F.array(ipt))
            .otherwise(F.array().cast(
                "array<struct<sub: int, x: long, y: long>>")))
    out = (df.select(*keys, "i", emit.alias("_e"))
           .select(*keys, "i", F.explode("_e").alias("_p")))
    w2 = Window.partitionBy(*keys).orderBy("i", "_p.sub")
    return out.select(*keys,
                      F.row_number().over(w2).cast("long").alias("i"),
                      F.col("_p.x").alias("x"), F.col("_p.y").alias("y"))


def clip_rings_to_tiles(rings: DataFrame, tile: int, scale: int = 8,
                        *, max_tiles: int = 64) -> DataFrame:
    """Sutherland-Hodgman clipping of polygon rings into every tile
    they touch — the MVT polygon cut beside
    :func:`clip_segments_to_tiles`: four half-plane passes (left,
    right, bottom, top of the closed tile box), every intersection an
    exact rational snapped half-up onto the ``scale``-subpixel grid at
    emission, then consecutive-duplicate vertices collapse and rings
    with < 3 surviving vertices vanish.

    Conventions (pinned, tested): input is ``(ring_id, verts
    array<struct<x, y>>)`` with non-negative integer coords
    (raise_error otherwise), any orientation, not explicitly closed;
    candidates are floor-div bbox tiles (``max_tiles`` in-plan cap);
    a ring fully inside a tile passes through verbatim (×scale).

    Scale shape: bounded bbox explode, then per (ring, tile) FOUR
    window passes over vertex lists (each: one lag + one row_number
    on the same key — Spark reuses the partitioning) — no Python, no
    fold state, no driver loop.

    Returns ``(ring_id, tx, ty, i, x, y)`` — scaled, ordered ring
    vertices per tile.
    """
    from pyspark.sql import Window

    if tile < 1 or scale < 1:
        raise ValueError("tile and scale must be positive integers")

    v = (rings.select(F.col("ring_id").alias("rid"),
                      F.posexplode("verts").alias("i", "_v"))
         .select("rid", "i",
                 F.col("_v.x").cast("long").alias("_rx"),
                 F.col("_v.y").cast("long").alias("_ry")))
    neg = (F.col("_rx") < 0) | (F.col("_ry") < 0)
    v = v.select(
        "rid", "i",
        F.when(neg, F.raise_error(F.lit(
            "clip_rings_to_tiles: negative coordinate — shift "
            "upstream"))).otherwise(F.col("_rx") * scale).alias("x"),
        (F.col("_ry") * scale).alias("y"))

    ts = tile * scale
    bb = v.groupBy("rid").agg(
        floor_div(F.min("x"), ts).alias("_txl"),
        floor_div(F.max("x"), ts).alias("_txh"),
        floor_div(F.min("y"), ts).alias("_tyl"),
        floor_div(F.max("y"), ts).alias("_tyh"))
    span = ((F.col("_txh") - F.col("_txl") + 1)
            * (F.col("_tyh") - F.col("_tyl") + 1))
    txl_g = (F.when(span > max_tiles, F.raise_error(F.lit(
        f"clip_rings_to_tiles: ring bbox spans > {max_tiles} tiles"))
        .cast("long")).otherwise(F.col("_txl")))
    cand = (bb.withColumn("tx", F.explode(F.sequence(txl_g,
                                                     F.col("_txh"))))
            .withColumn("ty", F.explode(F.sequence(F.col("_tyl"),
                                                   F.col("_tyh"))))
            .select("rid", "tx", "ty"))
    cur = v.join(cand, "rid")

    cur = _ring_clip_stage(cur, "x", "ge", F.col("tx") * ts)
    cur = _ring_clip_stage(cur, "x", "le", (F.col("tx") + 1) * ts)
    cur = _ring_clip_stage(cur, "y", "ge", F.col("ty") * ts)
    cur = _ring_clip_stage(cur, "y", "le", (F.col("ty") + 1) * ts)

    # collapse consecutive duplicates (wraparound: first vs last)
    keys = ["rid", "tx", "ty"]
    w = Window.partitionBy(*keys).orderBy("i")
    wf = (Window.partitionBy(*keys)
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    px = F.coalesce(F.lag("x").over(w), F.last("x").over(wf))
    py = F.coalesce(F.lag("y").over(w), F.last("y").over(wf))
    cnt = F.count(F.lit(1)).over(wf)
    ded = (cur.withColumn("_keep",
                          (cnt == 1) | (F.col("x") != px)
                          | (F.col("y") != py))
           .filter(F.col("_keep")))
    w2 = Window.partitionBy(*keys).orderBy("i")
    wf2 = (Window.partitionBy(*keys)
           .rowsBetween(Window.unboundedPreceding,
                        Window.unboundedFollowing))
    out = (ded.select(*keys,
                      F.row_number().over(w2).cast("long").alias("i"),
                      "x", "y",
                      F.count(F.lit(1)).over(wf2).alias("_n"))
           .filter(F.col("_n") >= 3)
           .select(F.col("rid").alias("ring_id"), "tx", "ty",
                   "i", "x", "y"))
    return out


def clip_seam_audit(clipped: DataFrame) -> DataFrame:
    """Seam-consistency audit of a clip_segments_to_tiles output — the
    tile-pipeline integrity invariant: every boundary EXIT point of a
    segment must reappear as the ENTRY point of the same segment in
    the adjacent tile, bit-identically.  This holds because both sides
    quantize x0 + dx·t at the SAME rational boundary parameter (the
    snap-on-clip discipline); a renderer stitching tiles sees cracks
    exactly when this audit fails, so it is the regression tripwire
    for any change to the clip arithmetic.

    Shape: two filters over the clipped pieces + two left-semi joins
    on (line, segment, quantized point) + one per-line aggregate —
    nothing rescans the source geometry.

    Returns ``(line_id, n_pieces, n_out, n_in, n_out_matched,
    n_in_matched, seam_ok)``.
    """
    outs = (clipped.filter(F.col("cut_out"))
            .select("line_id", "seg_i",
                    F.col("qx1").alias("px"), F.col("qy1").alias("py")))
    ins = (clipped.filter(F.col("cut_in"))
           .select("line_id", "seg_i",
                   F.col("qx0").alias("px"), F.col("qy0").alias("py")))
    key = ["line_id", "seg_i", "px", "py"]
    out_m = (outs.join(ins.distinct(), key, "left_semi")
             .groupBy("line_id")
             .agg(F.count(F.lit(1)).alias("n_out_matched")))
    in_m = (ins.join(outs.distinct(), key, "left_semi")
            .groupBy("line_id")
            .agg(F.count(F.lit(1)).alias("n_in_matched")))
    per = (clipped.groupBy("line_id")
           .agg(F.count(F.lit(1)).alias("n_pieces"),
                F.sum(F.col("cut_out").cast("long")).alias("n_out"),
                F.sum(F.col("cut_in").cast("long")).alias("n_in")))
    return (per.join(out_m, "line_id", "left")
            .join(in_m, "line_id", "left")
            .select("line_id", "n_pieces", "n_out", "n_in",
                    F.coalesce("n_out_matched", F.lit(0))
                    .alias("n_out_matched"),
                    F.coalesce("n_in_matched", F.lit(0))
                    .alias("n_in_matched"),
                    ((F.coalesce("n_out_matched", F.lit(0))
                      == F.col("n_out"))
                     & (F.coalesce("n_in_matched", F.lit(0))
                        == F.col("n_in"))).alias("seam_ok")))


def _ring_lattice(clipped: DataFrame, tile: int, scale: int,
                  grid: int):
    """Shared lattice-sampling state for the ring classification
    operators: per-(ring, tile) DOUBLED vertex arrays (even
    coordinates) plus the doubled subcell size and the odd in-cell
    sample offset (samples never share a horizontal with a vertex)."""
    ts = tile * scale
    if grid < 1 or ts % grid != 0:
        raise ValueError("grid must divide tile*scale")
    sub2 = 2 * (ts // grid)        # doubled subcell size (even)
    half = sub2 // 2 - 1
    if half % 2 == 0:
        half += 1                  # odd doubled offset inside the cell
    rv = (clipped.groupBy("ring_id", "tx", "ty")
          .agg(F.transform(
              F.array_sort(F.collect_list(F.struct("i", "x", "y"))),
              lambda s: F.struct((2 * s["x"]).alias("x2"),
                                 (2 * s["y"]).alias("y2")))
              .alias("_v")))
    return rv, ts, sub2, half


def _rc_vert(v: Column, n: Column, j: Column) -> Column:
    return F.element_at(v, (F.pmod(j, n) + 1).cast("int"))


def _sample_px(ts: int, sub2: int, half: int, grid: int,
               c: Column) -> Column:
    return (2 * F.col("tx") * ts
            + F.pmod(c, F.lit(grid)) * sub2 + half)


def _sample_py(ts: int, sub2: int, half: int, grid: int,
               c: Column) -> Column:
    return (2 * F.col("ty") * ts
            + ((c - F.pmod(c, F.lit(grid))) / grid).cast("long")
            * sub2 + half)


def _parity_inside(v: Column, n: Column, px2: Column,
                   py2: Column) -> Column:
    """Crossing-parity point-in-ring test in the doubled frame —
    shared by ring_union_cover and ring_label_anchor (one definition
    of the strict-inequality crossing rule, the seam-audit
    discipline applied to our own code)."""
    def crossing(acc: Column, j: Column) -> Column:
        a, b = _rc_vert(v, n, j), _rc_vert(v, n, j + 1)
        dy = b["y2"] - a["y2"]
        cond = (a["y2"] > py2) != (b["y2"] > py2)
        expr = ((px2 - a["x2"]) * dy
                - (b["x2"] - a["x2"]) * (py2 - a["y2"]))
        hit = cond & F.when(dy > 0, expr < 0).otherwise(expr > 0)
        return acc + hit.cast("int")

    return F.pmod(
        F.aggregate(F.sequence(F.lit(0), n - 1),
                    F.lit(0), crossing), 2) == 1


def ring_union_cover(clipped: DataFrame, tile: int, scale: int, *,
                     grid: int = 32) -> DataFrame:
    """Per-tile polygon UNION coverage by deterministic lattice
    sampling — the operator tile_coverage explicitly defers to
    (its shoelace sum double-counts overlaps; exact polygon union is
    a full overlay arrangement, which no tile renderer actually
    computes): classify a grid×grid lattice of sample points per tile
    against every clipped ring by integer ray casting, then
    distinct-count covered cells across rings.

    Exactness/determinism: the test runs in a DOUBLED integer frame —
    vertex coordinates ×2 (even), sample points at cell centers
    shifted to ODD doubled coordinates — so a sample never shares a
    horizontal line with any vertex (the classic ray-cast degeneracy)
    and every crossing comparison is a strict cross-multiplied int64
    inequality: identical in any engine, so the union counts
    value-hash.  ``grid`` must divide ``tile·scale``.

    Shape: the parity fold runs in-row per (ring, tile) over the
    grid² lattice (bounded literal work); covered cells explode and
    one distinct + groupBy per tile closes the union — rings never
    join rings.

    Returns ``(tx, ty, n_rings, cells_union, cells_sum, union_frac)``
    with cells_sum the overlap-counting total (Σ per-ring cover — the
    tile_coverage analogue) for contrast with the union.
    """
    rv, ts, sub2, half = _ring_lattice(clipped, tile, scale, grid)
    v = F.col("_v")
    n = F.size("_v")
    covered = F.filter(
        F.sequence(F.lit(0), F.lit(grid * grid - 1)),
        lambda c: _parity_inside(v, n,
                                 _sample_px(ts, sub2, half, grid, c),
                                 _sample_py(ts, sub2, half, grid, c)))
    cells = (rv.select("ring_id", "tx", "ty",
                       F.explode(covered).alias("cell")))
    return (cells.groupBy("tx", "ty")
            .agg(F.countDistinct("ring_id").alias("n_rings"),
                 F.countDistinct("cell").alias("cells_union"),
                 F.count(F.lit(1)).alias("cells_sum"))
            .withColumn("union_frac",
                        F.col("cells_union").cast("double")
                        / F.lit(float(grid * grid))))


def ring_label_anchor(clipped: DataFrame, tile: int, scale: int, *,
                      grid: int = 32) -> DataFrame:
    """Label-anchor (pole-of-inaccessibility) placement for clipped
    polygon pieces — the lattice form of mapbox/polylabel's quadtree
    search: among the grid×grid in-polygon sample points of each
    (ring, tile) piece, the one farthest from every edge (max-min
    exact integer d² in the doubled frame), ties to the lowest cell
    index.  polylabel refines adaptively to ε; this fixes the lattice
    instead, which keeps the whole search a value-hashable integer
    argmax — refine by raising ``grid``.

    Shape: in-row per (ring, tile) — inside test (parity ray cast) +
    min-d²-to-edge fold per surviving sample, argmax encoded as ONE
    int64 (−d²·grid² + cell, the established encoding).  Pieces with
    no interior sample (slivers thinner than the lattice) are absent.

    Returns ``(ring_id, tx, ty, cell, ax2, ay2, clearance_d2)`` with
    the anchor in DOUBLED coordinates (divide by 2 for subpixels) and
    clearance_d2 = floor of the doubled-frame squared clearance.
    """
    rv, ts, sub2, half = _ring_lattice(clipped, tile, scale, grid)
    v = F.col("_v")
    n = F.size("_v")

    def px(c: Column) -> Column:
        return _sample_px(ts, sub2, half, grid, c)

    def py(c: Column) -> Column:
        return _sample_py(ts, sub2, half, grid, c)

    def min_d2(c: Column) -> Column:
        px2, py2 = px(c), py(c)

        def seg_d2(j: Column) -> Column:
            a, b = _rc_vert(v, n, j), _rc_vert(v, n, j + 1)
            ax, ay, bx, by = a["x2"], a["y2"], b["x2"], b["y2"]
            tnum = (px2 - ax) * (bx - ax) + (py2 - ay) * (by - ay)
            l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
            cross = (bx - ax) * (py2 - ay) - (by - ay) * (px2 - ax)
            c2 = cross * cross
            # c2 exceeds 2^53 in the doubled frame: exact
            # decimal floor-div, never the double spelling
            return (F.when((l2 == 0) | (tnum <= 0),
                           (px2 - ax) * (px2 - ax)
                           + (py2 - ay) * (py2 - ay))
                    .when(tnum >= l2,
                          (px2 - bx) * (px2 - bx)
                          + (py2 - by) * (py2 - by))
                    .otherwise(floor_div_big(c2, l2)))

        return F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit((1 << 62)).cast("long"),
            lambda acc, j: F.least(acc, seg_d2(j)))

    enc = F.array_min(F.transform(
        F.filter(F.sequence(F.lit(0), F.lit(grid * grid - 1)),
                 lambda c: _parity_inside(v, n, px(c), py(c))),
        lambda c: -min_d2(c) * (grid * grid) + c))
    mid = (rv.select("ring_id", "tx", "ty", F.col("_v"),
                     enc.alias("_e"))
           .filter(F.col("_e").isNotNull()))
    cell = F.pmod(F.col("_e"), F.lit(grid * grid))
    d2 = floor_div_big(-(F.col("_e") - cell),
                       F.lit(grid * grid).cast("long"))
    return mid.select(
        "ring_id", "tx", "ty", cell.cast("long").alias("cell"),
        (2 * F.col("tx") * ts + F.pmod(cell, F.lit(grid)) * sub2
         + half).alias("ax2"),
        (2 * F.col("ty") * ts
         + ((cell - F.pmod(cell, F.lit(grid))) / grid).cast("long")
         * sub2 + half).alias("ay2"),
        d2.alias("clearance_d2"))
