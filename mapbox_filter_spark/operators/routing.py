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

__all__ = ["nn_tour"]

_MAXLONG = (1 << 63) - 1


def _d2(a: Column, b: Column) -> Column:
    return ((a["x"] - b["x"]) * (a["x"] - b["x"])
            + (a["y"] - b["y"]) * (a["y"] - b["y"]))


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

    def at(idx: Column) -> Column:
        return F.element_at(pts, (idx + 1).cast("int"))

    def best_next(acc: Column) -> Column:
        last = at(F.element_at(acc, -1))
        cand = F.filter(F.sequence(F.lit(0), n - 1),
                        lambda i: ~F.array_contains(acc, i))
        best = F.aggregate(
            cand,
            F.struct(F.lit(_MAXLONG).cast("long").alias("d"),
                     F.lit(-1).cast("long").alias("i")),
            lambda b, i: F.when(
                _d2(last, at(i)) < b["d"],
                F.struct(_d2(last, at(i)).alias("d"),
                         i.cast("long").alias("i"))).otherwise(b))
        return best["i"]

    steps = F.when(n > 1, F.sequence(F.lit(1), n - 1)) \
        .otherwise(F.array().cast("array<int>"))
    tour_idx = F.aggregate(
        steps,
        F.array(F.lit(0).cast("long")),
        lambda acc, _: F.concat(acc, F.array(best_next(acc))))
    # materialize the tour indices ONCE; the length fold re-reads the
    # column instead of re-running the O(n²) construction per step
    mid = g.select(*group_cols, n_guard.alias("n_stops"),
                   pts.alias("_pts"), tour_idx.alias("_tidx"))
    pts2, tidx = F.col("_pts"), F.col("_tidx")
    n2 = F.size("_pts")

    def at2(idx: Column) -> Column:
        return F.element_at(pts2, (idx + 1).cast("int"))

    def qedge(a: Column, b: Column) -> Column:
        return F.floor(
            F.sqrt(_d2(a, b).cast("double")) * 1000000.0).cast("long")

    return mid.select(
        *group_cols, "n_stops",
        F.transform(tidx, lambda i: at2(i)["i"]).alias("tour"),
        F.aggregate(
            F.when(n2 > 1, F.sequence(F.lit(1), n2 - 1))
            .otherwise(F.array().cast("array<int>")),
            F.lit(0).cast("long"),
            lambda acc, k: acc + qedge(
                at2(F.element_at(tidx, k.cast("int"))),
                at2(F.element_at(tidx, (k + 1).cast("int"))))
        ).alias("tour_len_micro"))
