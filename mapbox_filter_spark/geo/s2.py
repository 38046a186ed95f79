"""S2-style spherical cell index as native Spark columns.

BASELINE.json north_rule names an "H3/S2 index" alongside the ZXY/quadkey
family (geo/tilemath.py).  This module supplies the S2 half: a hierarchical
64-bit cell id built from the PUBLIC S2 cell-hierarchy description
(cube-face projection + quadratic s/t transform + Hilbert space-filling
curve; s2geometry.io/devguide/s2cell_hierarchy) — implemented from the
published math, no library, no copied code.  It is *S2-style*, not
bit-compatible with Google's library (which uses per-face Hilbert
orientation tables); the structure — face bits, hierarchical position
prefix, trailing-sentinel-bit id so parent/range/contains are pure bit
arithmetic — is the same, which is what makes the index useful:

- ``s2_parent(cell, k)`` / ``s2_range_min/max`` are branch-free bit ops,
  so containment joins compile to a RANGE condition (broadcastable, no
  geometry in the join condition) — the 100 TB join shape.
- Hilbert (not Z-order) position ⇒ adjacent cells are adjacent on the
  curve; range scans over cell-sorted data touch contiguous spans.

Everything is a plan-time-constant-level fold over ``F.aggregate`` —
native columns end to end, no UDF, no shuffle.  The interpreted-HOF
once-binding discipline (operators/hof.py, NOTES_r3 PITFALL 0) is applied:
trig + face projection are bound once per row, never re-evaluated inside
the per-level fold.

Id layout (MAX_LEVEL = 29, the deepest level the int64 layout holds:
face 3 bits + 2*29 position bits + 1 sentinel = 62 bits, always
positive; real S2's level 30 needs the sign bit, which would break
BETWEEN range joins on signed longs)::

    id = face << (2*MAX_LEVEL + 1)
       | pos  << (2*(MAX_LEVEL - level) + 1)
       | 1    << (2*(MAX_LEVEL - level))          -- sentinel lsb

    lsb(id)       = id & -id
    range over descendants = [id - lsb + 1, id + lsb - 1]
    parent at k   = (id & ~(2*lsb_k - 1)) | lsb_k,  lsb_k = 1 << 2*(MAX-k)

A pure-Python twin of every step backs the hypothesis/lattice tests, and
``s2_oracle_cte`` emits the same math as a DuckDB recursive CTE for the
driver correctness gate (DuckDB 1.0's ``list_reduce`` mis-vectorizes
multi-row folds — verified — hence the CTE form).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.hof import bind_once

MAX_LEVEL = 29  # ~1 cm cells at the equator; level 15 ≈ 300 m

# face numbering: 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z (ties resolved in this
# CASE order — deterministic and mirrored verbatim in the oracle SQL)
_FACE_UV = {
    0: ("y / x", "z / x"),
    1: ("-(x / y)", "z / y"),
    2: ("-(x / z)", "-(y / z)"),
    3: ("z / x", "y / x"),
    4: ("z / y", "-(x / y)"),
    5: ("-(y / z)", "-(x / z)"),
}


def _check_level(level: int) -> None:
    if not (0 < level <= MAX_LEVEL):
        raise ValueError(f"level must be in 1..{MAX_LEVEL}, got {level}")


# ------------------------------------------------------------------ Spark


def _hilbert_pos(i: Column, j: Column, level: int) -> Column:
    """Hilbert curve position of integer cell (i, j) at ``level`` —
    the classic xy2d fold, accumulator struct (x, y, d), one step per
    level, all plan-time constants.  Stays interpreted (HOFs skip
    codegen) but touches only the bound i/j ints — no re-evaluated
    subtree (PITFALL 0)."""
    svals = F.array(*[F.lit(1 << k).cast("long")
                      for k in range(level - 1, -1, -1)])
    init = F.struct(i.cast("long").alias("x"), j.cast("long").alias("y"),
                    F.lit(0).cast("long").alias("d"))

    def step(acc: Column, s: Column) -> Column:
        rx_on = acc["x"].bitwiseAND(s) > 0
        ry_on = acc["y"].bitwiseAND(s) > 0
        rx = F.when(rx_on, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(ry_on, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        x2 = (F.when(~ry_on,
                     F.when(rx_on, s - 1 - acc["y"]).otherwise(acc["y"]))
              .otherwise(acc["x"]))
        y2 = (F.when(~ry_on,
                     F.when(rx_on, s - 1 - acc["x"]).otherwise(acc["x"]))
              .otherwise(acc["y"]))
        return F.struct(x2.alias("x"), y2.alias("y"), d.alias("d"))

    return F.aggregate(svals, init, step)["d"]


def _st_from_u(u: Column) -> Column:
    """Quadratic u→s transform (the S2 area-equalizing projection)."""
    return (F.when(u >= 0, 0.5 * F.sqrt(1.0 + 3.0 * u))
            .otherwise(1.0 - 0.5 * F.sqrt(1.0 - 3.0 * u)))


def s2_cell(lon: Column, lat: Column, level: int) -> Column:
    """64-bit S2-style cell id of a lon/lat point at ``level``.

    Column form — composes anywhere, but the fold inside runs through the
    HOF interpreter (~0.12 M cells/s measured): use it for literals,
    small dimension frames, and expression contexts.  For corpus-wide
    assignment use ``with_s2_cell`` (identical bits, chained-projection
    unroll, whole-stage codegen, measured 21× faster)."""
    _check_level(level)
    lon_r, lat_r = F.radians(lon), F.radians(lat)
    xyz = {
        "x": F.cos(lat_r) * F.cos(lon_r),
        "y": F.cos(lat_r) * F.sin(lon_r),
        "z": F.sin(lat_r),
    }

    def from_xyz(x: Column, y: Column, z: Column) -> Column:
        ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
        face = (
            F.when((ax >= ay) & (ax >= az),
                   F.when(x >= 0, F.lit(0)).otherwise(F.lit(3)))
            .when(ay >= az, F.when(y >= 0, F.lit(1)).otherwise(F.lit(4)))
            .otherwise(F.when(z >= 0, F.lit(2)).otherwise(F.lit(5)))
        ).cast("long")
        ns = {"x": x, "y": y, "z": z}

        def axis_case(slot: int) -> Column:
            expr = None
            for f, uv in _FACE_UV.items():
                col = _parse_uv(uv[slot], ns)
                expr = (F.when(face == f, col) if expr is None
                        else expr.when(face == f, col))
            return expr

        return bind_once(
            {"face": face, "u": axis_case(0), "v": axis_case(1)},
            lambda face, u, v: _cell_from_face_uv(face, u, v, level))

    return bind_once(xyz, from_xyz)


def _parse_uv(expr: str, ns: "dict[str, Column]") -> Column:
    """The tiny u/v formulas ('y / x', '-(x / z)', ...) over bound cols."""
    neg = expr.startswith("-")
    body = expr.strip("-() ")
    a, b = [t.strip() for t in body.split("/")]
    col = ns[a] / ns[b]
    return -col if neg else col


def _cell_from_face_uv(face: Column, u: Column, v: Column,
                       level: int) -> Column:
    n = 1 << level
    i = F.greatest(F.lit(0).cast("long"), F.least(
        F.floor(_st_from_u(u) * n).cast("long"), F.lit(n - 1).cast("long")))
    j = F.greatest(F.lit(0).cast("long"), F.least(
        F.floor(_st_from_u(v) * n).cast("long"), F.lit(n - 1).cast("long")))
    pos = _hilbert_pos(i, j, level)
    shift = 2 * (MAX_LEVEL - level)
    return (F.shiftleft(face, 2 * MAX_LEVEL + 1)
            .bitwiseOR(F.shiftleft(pos, shift + 1))
            .bitwiseOR(F.lit(1 << shift).cast("long")))


def s2_face(cell: Column) -> Column:
    return F.shiftrightunsigned(cell, 2 * MAX_LEVEL + 1)


def _lsb(cell: Column) -> Column:
    return cell.bitwiseAND(-cell)


def s2_level(cell: Column) -> Column:
    """MAX_LEVEL - trailing_zero_bits/2; log2 of an exact power of two is
    exact in binary floating point, so the floor is safe."""
    return (F.lit(MAX_LEVEL)
            - (F.floor(F.log2(_lsb(cell).cast("double")) / 2)).cast("int"))


def s2_parent(cell: Column, level: int) -> Column:
    """Ancestor cell id at coarser ``level`` — pure bit arithmetic."""
    _check_level(level)
    lsb_k = 1 << (2 * (MAX_LEVEL - level))
    return (cell.bitwiseAND(F.lit(~(2 * lsb_k - 1)).cast("long"))
            .bitwiseOR(F.lit(lsb_k).cast("long")))


def s2_range_min(cell: Column) -> Column:
    return cell - _lsb(cell) + 1


def s2_range_max(cell: Column) -> Column:
    return cell + _lsb(cell) - 1


def s2_contains(ancestor: Column, descendant: Column) -> Column:
    """True iff ``descendant``'s cell lies inside ``ancestor`` — a range
    test, which is exactly what makes covering joins broadcastable."""
    return descendant.between(s2_range_min(ancestor), s2_range_max(ancestor))


def s2_token(cell: Column) -> Column:
    """Canonical hex token: lowercase, trailing zeros stripped (the S2
    token convention — the sentinel bit keeps tokens unambiguous)."""
    return F.regexp_replace(F.lower(F.hex(cell)), "0+$", "")


def with_s2_cell(df, lon="lon", lat="lat", level: int = 12,
                 out: str = "s2_cell"):
    """Append the S2 cell id as a column — the BULK assignment path.

    The Column form (``s2_cell``) evaluates its Hilbert fold through the
    higher-order-function interpreter (HOFs never enter codegen): measured
    ~0.12 M cells/s at level 12 — a scale-killer for corpus-wide
    assignment.  This transformer unrolls the same math into CHAINED
    single-step projections: each fold step is one ``select`` whose
    expressions reference the previous step's columns as plain attribute
    reads, so the whole pipeline stays inside one WholeStageCodegen span
    with zero re-evaluation.  CollapseProject cannot re-inline the steps
    (producers are non-cheap CASE expressions referenced 2-3×), so the
    plan stays linear in ``level``.  Same bits as ``s2_cell``/the python
    twin (asserted in tests)."""
    _check_level(level)
    P = "__s2tmp_"
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    base_cols = list(df.columns)

    lon_r, lat_r = F.radians(lon_c), F.radians(lat_c)
    df = df.select(
        "*",
        (F.cos(lat_r) * F.cos(lon_r)).alias(P + "x"),
        (F.cos(lat_r) * F.sin(lon_r)).alias(P + "y"),
        F.sin(lat_r).alias(P + "z"))

    x, y, z = F.col(P + "x"), F.col(P + "y"), F.col(P + "z")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az),
               F.when(x >= 0, F.lit(0)).otherwise(F.lit(3)))
        .when(ay >= az, F.when(y >= 0, F.lit(1)).otherwise(F.lit(4)))
        .otherwise(F.when(z >= 0, F.lit(2)).otherwise(F.lit(5)))
    ).cast("long")
    df = df.select("*", face.alias(P + "face"))

    ns = {"x": x, "y": y, "z": z}
    fc = F.col(P + "face")

    def axis_case(slot: int) -> Column:
        expr = None
        for f, uv in _FACE_UV.items():
            col = _parse_uv(uv[slot], ns)
            expr = (F.when(fc == f, col) if expr is None
                    else expr.when(fc == f, col))
        return expr

    df = df.select("*", axis_case(0).alias(P + "u"),
                   axis_case(1).alias(P + "v"))

    n = 1 << level

    def ij(src: Column) -> Column:
        return F.greatest(F.lit(0).cast("long"), F.least(
            F.floor(_st_from_u(src) * n).cast("long"),
            F.lit(n - 1).cast("long")))

    df = df.select("*", ij(F.col(P + "u")).alias(P + "i"),
                   ij(F.col(P + "v")).alias(P + "j"),
                   F.lit(0).cast("long").alias(P + "d"))

    keep = base_cols + [P + "face"]
    for k in range(level - 1, -1, -1):
        s = 1 << k
        cx, cy, cd = F.col(P + "i"), F.col(P + "j"), F.col(P + "d")
        rx_on = cx.bitwiseAND(F.lit(s).cast("long")) > 0
        ry_on = cy.bitwiseAND(F.lit(s).cast("long")) > 0
        rx = F.when(rx_on, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(ry_on, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = cd + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry)
        x2 = (F.when(~ry_on, F.when(rx_on, s - 1 - cy).otherwise(cy))
              .otherwise(cx))
        y2 = (F.when(~ry_on, F.when(rx_on, s - 1 - cx).otherwise(cx))
              .otherwise(cy))
        df = df.select(*keep, x2.alias(P + "i"), y2.alias(P + "j"),
                       d2.alias(P + "d"))

    shift = 2 * (MAX_LEVEL - level)
    cell = (F.shiftleft(F.col(P + "face"), 2 * MAX_LEVEL + 1)
            .bitwiseOR(F.shiftleft(F.col(P + "d"), shift + 1))
            .bitwiseOR(F.lit(1 << shift).cast("long")))
    # explode(array(cell)) is a deliberate OPTIMIZER BARRIER, not style:
    # PushDownPredicate substitutes projected aliases, so a downstream
    # filter on the cell column would inline the whole unrolled chain
    # into the predicate and re-substitute per stage — measured as a
    # planner hang (minutes at 1000 rows).  Predicates on a GENERATOR
    # output cannot push through the Generate, which pins them above the
    # chain; GenerateExec itself stays in WholeStageCodegen (plan-
    # asserted), and a 1-element explode is row-local and shuffle-free.
    return df.select(*base_cols, F.explode(F.array(cell)).alias(out))


def s2_covering_join(points, regions, point_cell: str = "cell",
                     region_cell: str = "region_cell", how: str = "inner"):
    """Containment join: each point pairs with every region whose cell
    contains the point's (deeper) cell — a pure RANGE condition on the
    64-bit ids, no geometry at join time.

    The region side is broadcast: coverings are small by construction
    (a style/region-of-interest is thousands of cells, not billions), so
    the 100 TB plan is scan + broadcast-range join — zero shuffle of the
    point corpus.  Regions may mix levels (overlapping ancestors each
    match — multi-resolution coverings); when every region sits at ONE
    level, prefer equality on ``s2_parent(cell, level)`` instead, which
    compiles to a hash join.  For region sets too big to broadcast, use
    :func:`s2_covering_join_big` — an ancestor-chain EQUI-join that scales
    to any region count."""
    cond = points[point_cell].between(
        s2_range_min(regions[region_cell]), s2_range_max(regions[region_cell]))
    return points.join(F.broadcast(regions), cond, how)


def s2_ancestors(cell: Column, min_level: int = 1,
                 max_level: int = MAX_LEVEL) -> Column:
    """Array of ``cell``'s ancestor ids from ``min_level`` to
    ``max_level`` INCLUSIVE of the cell's own level (levels deeper than
    the cell are dropped — a parent op on a coarser cell would go UP, so
    each candidate is masked to only emit when its level <= the cell's).
    Pure bit arithmetic per level, ≤ MAX_LEVEL entries, plan-time
    constant length before the filter."""
    lsb = _lsb(cell)

    def parent_at(k: int) -> Column:
        lsb_k = 1 << (2 * (MAX_LEVEL - k))
        return (cell.bitwiseAND(F.lit(~(2 * lsb_k - 1)).cast("long"))
                .bitwiseOR(F.lit(lsb_k).cast("long")))

    return F.filter(
        F.array(*[
            # emit the level-k ancestor only if the cell is AT level >= k
            # (its lsb is <= level-k's lsb)
            F.when(lsb <= F.lit(1 << (2 * (MAX_LEVEL - k))).cast("long"),
                   parent_at(k))
            for k in range(min_level, max_level + 1)
        ]),
        lambda c: c.isNotNull())


def s2_covering_join_big(points, regions, point_cell: str = "cell",
                         region_cell: str = "region_cell",
                         min_level: int = 1, max_level: int = MAX_LEVEL):
    """Containment join for region sets TOO BIG TO BROADCAST: each point
    explodes to its ancestor chain (≤ MAX_LEVEL ids, pure bit math) and
    EQUI-joins region cells on exact id equality — `ancestor(point) ==
    region_cell` ⟺ `region contains point`, the same predicate the
    broadcast range join evaluates.

    Scale shape: a plain hash join, shuffled on the cell id — both sides
    partition-parallel at any size; the point-side blowup is bounded by
    the level count — pass ``min_level``/``max_level`` when the covering's
    level range is known (e.g. (2, 4) explodes 3 ancestors per point
    instead of 29).  Results are identical to :func:`s2_covering_join`
    restricted to those levels (asserted in tests).  Mixed-level coverings
    work unchanged: every ancestor level in range is probed."""
    anc = points.withColumn(
        "__anc", F.explode(
            s2_ancestors(F.col(point_cell), min_level, max_level)))
    joined = anc.join(regions, anc["__anc"] == regions[region_cell])
    return joined.drop("__anc")


# ----------------------------------------------------------- Python twins


def py_hilbert_pos(i: int, j: int, level: int) -> int:
    x, y, d = i, j, 0
    s = 1 << (level - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def py_hilbert_ij(d: int, level: int) -> "tuple[int, int]":
    """Inverse (d2xy) — test oracle for roundtrips."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << level):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def py_s2_cell(lon: float, lat: float, level: int) -> int:
    _check_level(level)
    lon_r, lat_r = math.radians(lon), math.radians(lat)
    return _py_cell_from_xyz(
        math.cos(lat_r) * math.cos(lon_r),
        math.cos(lat_r) * math.sin(lon_r),
        math.sin(lat_r), level)


def py_s2_parent(cell: int, level: int) -> int:
    lsb_k = 1 << (2 * (MAX_LEVEL - level))
    return (cell & ~(2 * lsb_k - 1)) | lsb_k


def py_s2_range(cell: int) -> "tuple[int, int]":
    lsb = cell & -cell
    return cell - lsb + 1, cell + lsb - 1


# --------------------------------------------------- neighbors (python)

# face (u,v) -> xyz direction, the exact inverse of _FACE_UV (consistency
# verified in tests via corner sharing): face 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z
_FACE_XYZ = {
    0: lambda u, v: (1.0, u, v),
    1: lambda u, v: (-u, 1.0, v),
    2: lambda u, v: (-u, -v, 1.0),
    3: lambda u, v: (-1.0, -v, -u),
    4: lambda u, v: (v, -1.0, -u),
    5: lambda u, v: (v, u, -1.0),
}


def _u_from_st(s: float) -> float:
    """Inverse quadratic transform, EXTENDED beyond [0,1]: monotone for
    all s, which is what lets a neighbor one step past the face edge be
    expressed in the same face plane and re-projected."""
    if s >= 0.5:
        return (4.0 * s * s - 1.0) / 3.0
    return (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0


def py_s2_decode(cell: int) -> "tuple[int, int, int, int]":
    """cell -> (face, i, j, level)."""
    face = cell >> (2 * MAX_LEVEL + 1)
    lsb = cell & -cell
    shift = lsb.bit_length() - 1
    level = MAX_LEVEL - shift // 2
    pos = (cell >> (shift + 1)) & ((1 << (2 * level)) - 1)
    i, j = py_hilbert_ij(pos, level)
    return face, i, j, level


def _py_cell_from_face_ij(face: int, i: int, j: int, level: int) -> int:
    pos = py_hilbert_pos(i, j, level)
    shift = 2 * (MAX_LEVEL - level)
    return (face << (2 * MAX_LEVEL + 1)) | (pos << (shift + 1)) | (1 << shift)


def _py_cell_from_xyz(x: float, y: float, z: float, level: int) -> int:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    u, v = [eval(e, {"x": x, "y": y, "z": z}) for e in _FACE_UV[face]]

    def st(uu: float) -> float:
        return (0.5 * math.sqrt(1.0 + 3.0 * uu) if uu >= 0
                else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * uu))

    n = 1 << level
    i = max(0, min(int(math.floor(st(u) * n)), n - 1))
    j = max(0, min(int(math.floor(st(v) * n)), n - 1))
    return _py_cell_from_face_ij(face, i, j, level)


def py_s2_cell_corners(cell: int) -> "list[tuple[float, float, float]]":
    """The 4 unit-sphere corner directions of a cell (i/j grid corners
    through uv -> xyz, normalized) — the geometric ground truth used to
    test adjacency."""
    face, i, j, level = py_s2_decode(cell)
    n = 1 << level
    out = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        u = _u_from_st((i + di) / n)
        v = _u_from_st((j + dj) / n)
        x, y, z = _FACE_XYZ[face](u, v)
        r = math.sqrt(x * x + y * y + z * z)
        out.append((x / r, y / r, z / r))
    return out


def py_s2_neighbors(cell: int) -> "list[int]":
    """The 4 edge-adjacent cells at the same level, cross-face correct.

    In-face steps are pure (i,j) arithmetic.  A step past the face edge
    uses the EXTENDED (u,v) plane: the neighbor's center expressed in
    this face's coordinates maps through face_uv_to_xyz to the right
    point on the sphere (the cube projection is valid and monotone for
    |u| > 1), and re-encoding that direction yields the neighbor cell on
    the adjacent face.  Edge-adjacency (sharing exactly 2 corners) is
    asserted in tests for both the in-face and cross-face arms."""
    face, i, j, level = py_s2_decode(cell)
    n = 1 << level
    out = []
    for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ii, jj = i + di, j + dj
        if 0 <= ii < n and 0 <= jj < n:
            out.append(_py_cell_from_face_ij(face, ii, jj, level))
        else:
            u = _u_from_st((ii + 0.5) / n)
            v = _u_from_st((jj + 0.5) / n)
            x, y, z = _FACE_XYZ[face](u, v)
            out.append(_py_cell_from_xyz(x, y, z, level))
    return out


def py_s2_ring(cell: int, k: int) -> "list[int]":
    """All cells within k edge-steps (BFS over neighbors, sorted) — the
    S2 analogue of tilemath.k_ring_cells.  Intended driver-side: expand
    the SMALL query/region side and broadcast (the engine's kNN ring
    expansion keeps the big table unshuffled; geo/tilemath.py is the
    bulk per-row grid)."""
    seen = {cell}
    frontier = [cell]
    for _ in range(k):
        nxt = []
        for c in frontier:
            for nb in py_s2_neighbors(c):
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        frontier = nxt
    return sorted(seen)


# ----------------------------------------------------------- DuckDB oracle


def s2_oracle_cte(points_sql: str, level_expr: str = "lvl",
                  carry: "tuple[str, ...]" = ()) -> str:
    """Emit the whole lon/lat → cell-id pipeline as DuckDB SQL.

    ``points_sql`` must yield (pkey, lon, lat, lvl); the result CTE
    ``s2cells`` yields (pkey, lvl, cell) plus any ``carry`` columns the
    caller wants propagated through the fold (avoids a re-join on pkey,
    which would FAN OUT if pkey is not unique in the source — the
    synthetic corpus carries genuine duplicate ids and a per-row payload
    must ride the fold, exactly like the Spark side keeps its columns).
    The Hilbert fold runs as a
    recursive CTE — one iteration per level, all rows advance together;
    initial s = 1 << (lvl-1) is per-row data, so mixed levels fold in one
    pass.  Math is a line-for-line transcription of the Spark columns
    above; face ties resolve in the same CASE order."""
    carry_cols = "".join(", " + c for c in carry)
    face_uv_cases_u = " ".join(
        f"WHEN {f} THEN {uv[0]}" for f, uv in _FACE_UV.items())
    face_uv_cases_v = " ".join(
        f"WHEN {f} THEN {uv[1]}" for f, uv in _FACE_UV.items())
    return f"""
pts AS ({points_sql}),
xyz AS (
  SELECT pkey{carry_cols}, {level_expr} AS lvl,
         COS(RADIANS(lat)) * COS(RADIANS(lon)) AS x,
         COS(RADIANS(lat)) * SIN(RADIANS(lon)) AS y,
         SIN(RADIANS(lat)) AS z
  FROM pts
),
faced AS (
  SELECT pkey{carry_cols}, lvl, x, y, z,
         CASE WHEN ABS(x) >= ABS(y) AND ABS(x) >= ABS(z)
              THEN CASE WHEN x >= 0 THEN 0 ELSE 3 END
              WHEN ABS(y) >= ABS(z)
              THEN CASE WHEN y >= 0 THEN 1 ELSE 4 END
              ELSE CASE WHEN z >= 0 THEN 2 ELSE 5 END END AS face
  FROM xyz
),
uv AS (
  SELECT pkey{carry_cols}, lvl, face,
         CASE face {face_uv_cases_u} END AS u,
         CASE face {face_uv_cases_v} END AS v
  FROM faced
),
ij AS (
  SELECT pkey{carry_cols}, lvl, face,
         GREATEST(0, LEAST(CAST(FLOOR(
           (CASE WHEN u >= 0 THEN 0.5 * SQRT(1.0 + 3.0 * u)
                 ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * u) END)
           * (1 << lvl)) AS BIGINT), (1 << lvl) - 1)) AS i,
         GREATEST(0, LEAST(CAST(FLOOR(
           (CASE WHEN v >= 0 THEN 0.5 * SQRT(1.0 + 3.0 * v)
                 ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * v) END)
           * (1 << lvl)) AS BIGINT), (1 << lvl) - 1)) AS j
  FROM uv
),
hil AS (
  SELECT pkey{carry_cols}, lvl, face, CAST(i AS BIGINT) AS x, CAST(j AS BIGINT) AS y,
         CAST(0 AS BIGINT) AS d, CAST(1 << (lvl - 1) AS BIGINT) AS s
  FROM ij
  UNION ALL
  SELECT pkey{carry_cols}, lvl, face,
    CASE WHEN (y & s) = 0
         THEN CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END ELSE x END,
    CASE WHEN (y & s) = 0
         THEN CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END ELSE y END,
    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                    (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)),
    s // 2
  FROM hil WHERE s > 0
),
s2cells AS (
  SELECT pkey{carry_cols}, lvl,
         (CAST(face AS BIGINT) << {2 * MAX_LEVEL + 1})
         | (d << (2 * ({MAX_LEVEL} - lvl) + 1))
         | (CAST(1 AS BIGINT) << (2 * ({MAX_LEVEL} - lvl))) AS cell
  FROM hil WHERE s = 0
)"""
