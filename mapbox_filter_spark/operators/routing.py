"""Route sequencing: per-vehicle nearest-neighbour tours and 2-opt
improvement, entirely as in-row exact-integer folds.

Reference parity: mapbox-filter has no routing surface (filter/encode
only); this extends the engine's trajectory/geo family with the stop-
sequencing step a delivery/fleet pipeline runs after geofence
assignment (classic NN construction + 2-opt local search, Croes 1958).

Scale shape: ONE shuffle (the per-vehicle groupBy); each vehicle's
tour is solved inside its own row with higher-order-function folds —
no driver loop, no cross-vehicle exchange, cost O(n²) per vehicle with
n bounded in-plan (``max_stops``).  The production pairing is
splits.cap_per_group upstream, which bounds n deterministically at any
corpus scale.

Exactness: nearest-neighbour selection compares raw integer d² (the
monotone equivalent of distance); tour length is the established
µ-quantized chain floor(√d²·10⁶) summed as int64, so every output
value-hashes across engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nn_tour", "two_opt"]

_MAXLONG = (1 << 63) - 1


def _d2(a: Column, b: Column) -> Column:
    return ((a["x"] - b["x"]) * (a["x"] - b["x"])
            + (a["y"] - b["y"]) * (a["y"] - b["y"]))


def _at(pts: Column, idx: Column) -> Column:
    return F.element_at(pts, (idx + 1).cast("int"))


def _qedge(a: Column, b: Column) -> Column:
    return F.floor(
        F.sqrt(_d2(a, b).cast("double")) * 1000000.0).cast("long")


def _tour_len(pts: Column, tidx: Column, n: Column) -> Column:
    return F.aggregate(
        F.when(n > 1, F.sequence(F.lit(1), n - 1))
        .otherwise(F.array().cast("array<int>")),
        F.lit(0).cast("long"),
        lambda acc, k: acc + _qedge(
            _at(pts, F.element_at(tidx, k.cast("int"))),
            _at(pts, F.element_at(tidx, (k + 1).cast("int")))))


def _tour_state(df: DataFrame, group_cols: Sequence[str], id_col: str,
                x_col: str, y_col: str, max_stops: int) -> DataFrame:
    """Shared grouped state: ``(*group_cols, n_stops, _pts, _tidx)``
    — one collect per group, the NN construction fold, and the
    in-plan max_stops guard riding n_stops.  nn_tour projects the
    public columns; two_opt keeps folding on _pts/_tidx without a
    second shuffle."""
    if max_stops < 1:
        raise ValueError("max_stops must be positive")
    pts_s = F.array_sort(F.collect_list(F.struct(
        F.col(id_col).cast("long").alias("i"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"))))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(pts_s.alias("_pts"))
    n = F.size("_pts")
    # the guard rides n_stops (a kept output column) — a detached
    # raise_error column would be pruned
    n_guard = F.when(
        n > max_stops,
        F.raise_error(F.format_string(
            f"nn_tour: group exceeds max_stops={max_stops} (got %s); "
            "bound the input with cap_per_group", n.cast("string")))
    ).otherwise(n)
    pts = F.col("_pts")

    def best_next(acc: Column) -> Column:
        last = _at(pts, F.element_at(acc, -1))
        cand = F.filter(F.sequence(F.lit(0), n - 1),
                        lambda i: ~F.array_contains(acc, i))
        # struct-least merges in one d² evaluation per candidate:
        # (d, i) lexicographic min = nearest, ties to lowest index
        best = F.aggregate(
            cand,
            F.struct(F.lit(_MAXLONG).cast("long").alias("d"),
                     F.lit(-1).cast("long").alias("i")),
            lambda b, i: F.least(
                b, F.struct(_d2(last, _at(pts, i)).alias("d"),
                            i.cast("long").alias("i"))))
        return best["i"]

    steps = F.when(n > 1, F.sequence(F.lit(1), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    tour_idx = F.aggregate(
        steps,
        F.array(F.lit(0).cast("long")),
        lambda acc, _: F.concat(acc, F.array(best_next(acc))))
    # materialize the tour indices ONCE; downstream folds re-read the
    # column instead of re-running the O(n²) construction per step
    return g.select(*group_cols, n_guard.alias("n_stops"),
                    pts.alias("_pts"), tour_idx.alias("_tidx"))


def nn_tour(df: DataFrame, group_cols: Sequence[str], *,
            id_col: str = "stop_id", x_col: str = "x", y_col: str = "y",
            max_stops: int = 64) -> DataFrame:
    """Greedy nearest-neighbour tour per group: start at the lowest
    stop id, repeatedly visit the closest unvisited stop (exact
    integer d²; ties break to the earliest stop in id order).  The
    standard O(n²) route-construction heuristic, run independently
    inside every vehicle's row.

    Stops beyond ``max_stops`` raise in-plan (ride the output column
    so Catalyst cannot prune the guard); bound the input with
    cap_per_group for an any-scale-safe gate.

    Returns ``(*group_cols, n_stops, tour, tour_len_micro)`` where
    ``tour`` is the stop-id visit order and ``tour_len_micro`` the
    µ-quantized (floor(√d²·10⁶) per edge) integer tour length.
    """
    mid = _tour_state(df, group_cols, id_col, x_col, y_col, max_stops)
    pts, tidx = F.col("_pts"), F.col("_tidx")
    n = F.size("_pts")
    return mid.select(
        *group_cols, "n_stops",
        F.transform(tidx, lambda i: _at(pts, i)["i"]).alias("tour"),
        _tour_len(pts, tidx, n).alias("tour_len_micro"))


def two_opt(df: DataFrame, group_cols: Sequence[str], *,
            id_col: str = "stop_id", x_col: str = "x", y_col: str = "y",
            max_stops: int = 64, rounds: int = 6) -> DataFrame:
    """Nearest-neighbour tour + fixed best-improvement 2-opt rounds
    (Croes 1958): each round evaluates every segment reversal on the
    open path, applies the single best strictly-improving one (exact
    integer µ-quantized gain; ties break to the leftmost pair), and
    stops changing once no reversal improves — all ``rounds`` rounds
    run inside ONE in-row fold, so there is no per-iteration plan
    growth (the platt_scaling expression-inlining lesson) and no
    driver loop.  Shares the construction shuffle with nn_tour via
    the internal grouped state — one exchange total.

    The (gain, pair) argmin is encoded as one int64 ``delta·n² + k``
    (k = i·n + j): delta < 0 ⟺ encoded < 0, and pmod recovers k —
    exactly mirrorable in DuckDB where ``%`` is truncating.  The
    encoded argmin binds ONCE per round (hof.bind_once) — every
    i_b/j_b/gate reference would otherwise re-run the O(n²) pair scan.

    Returns ``(*group_cols, n_stops, tour, nn_len_micro,
    tour_len_micro)``: construction vs improved length (improved ≤
    construction by design).
    """
    from .hof import bind_once

    if rounds < 1:
        raise ValueError("rounds must be positive")
    mid = _tour_state(df, group_cols, id_col, x_col, y_col, max_stops)
    pts = F.col("_pts")
    n = F.size("_pts")
    tidx0 = F.col("_tidx")
    m = n * n

    def pt(tcur: Column, p: Column) -> Column:
        return _at(pts, F.element_at(tcur, (p + 1).cast("int")))

    def round_step(acc: Column) -> Column:
        def delta(k: Column) -> Column:
            i = ((k - F.pmod(k, n)) / n).cast("long")
            j = F.pmod(k, n).cast("long")
            head = (_qedge(pt(acc, i - 1), pt(acc, j))
                    - _qedge(pt(acc, i - 1), pt(acc, i)))
            tail = F.when(
                j < n - 1,
                _qedge(pt(acc, i), pt(acc, j + 1))
                - _qedge(pt(acc, j), pt(acc, j + 1))).otherwise(F.lit(0))
            return head + tail

        pairs = F.filter(
            F.sequence(F.lit(0), m - 1),
            lambda k: (k >= n)  # i >= 1
            & (((k - F.pmod(k, n)) / n).cast("long") < F.pmod(k, n)))
        best_expr = F.array_min(
            F.transform(pairs, lambda k: delta(k) * m + k))

        def build(best: Column) -> Column:
            k_best = F.pmod(best, m)
            i_b = ((k_best - F.pmod(k_best, n)) / n).cast("int")
            j_b = F.pmod(k_best, n).cast("int")
            rebuilt = F.concat(
                F.slice(acc, 1, i_b),
                F.reverse(F.slice(acc, i_b + 1, j_b - i_b + 1)),
                F.when(j_b < n - 1,
                       F.slice(acc, j_b + 2, (n - j_b - 1).cast("int")))
                .otherwise(F.array().cast("array<long>")))
            return F.when(best < 0, rebuilt).otherwise(acc)

        return bind_once({"best": best_expr}, build)

    improved = F.when(
        n > 2,
        F.aggregate(F.sequence(F.lit(1), F.lit(rounds)), tidx0,
                    lambda acc, _: round_step(acc))).otherwise(tidx0)
    mid2 = mid.select(*group_cols, "n_stops",
                      _tour_len(pts, tidx0, n).alias("nn_len_micro"),
                      pts.alias("_pts"), improved.alias("_tidx"))
    pts2, tidx2 = F.col("_pts"), F.col("_tidx")
    n2 = F.size("_pts")
    return mid2.select(
        *group_cols, "n_stops",
        F.transform(tidx2, lambda i: _at(pts2, i)["i"]).alias("tour"),
        "nn_len_micro",
        _tour_len(pts2, tidx2, n2).alias("tour_len_micro"))
