"""Per-key exponentially-weighted moving average — the smoothing
primitive the fixed-frame rolling window (operators/temporal.py
rolling_range_sum) can't express, because every observation influences
the result with geometrically decaying weight.

Recurrence: EMA_1 = v_1; EMA_t = EMA_{t-1} + α·(v_t − EMA_{t-1}).

Determinism contract: the fold is a PINNED-ORDER left fold over the
key's observations (sorted (order keys, value) structs inside one
``F.aggregate`` HOF) with α an exactly-representable binary fraction —
correctly-rounded IEEE ops in a fixed order, hence bit-reproducible
against any engine folding in the same order (the path_len discipline,
operators/trajectory.py; the DuckDB oracle uses
``list_reduce(list(v ORDER BY rn))`` with the same update form).

Scale shape: ONE shuffle on the key; the per-key observation list
materializes only inside the aggregate (bounded by the key's own row
count — cap hot keys upstream, heavy_hitters is the detector).  For
unbounded streams use the streaming faces instead; this is the batch
form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ema_final"]


def ema_final(df: DataFrame, key_col: str,
              order_cols: "tuple[str, ...]", value_col: str, *,
              alpha_num: int, alpha_den: int) -> DataFrame:
    """Final EMA per key: ``(key, n_obs, ema)``.

    ``alpha_num / alpha_den`` should be an exactly-representable binary
    fraction (den a power of two) for cross-engine bit-stability; the
    constant is pre-evaluated once in python and inlined into the plan
    (and into the oracle SQL) as the SAME double literal.
    """
    if not (0 < alpha_num <= alpha_den):
        raise ValueError("need 0 < alpha_num <= alpha_den")
    if alpha_den & (alpha_den - 1):
        raise ValueError("alpha_den must be a power of two "
                         "(exact binary fraction)")
    alpha = alpha_num / alpha_den
    arr = F.sort_array(F.collect_list(F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("v"))))
    return (df.groupBy(F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 arr.alias("_arr"))
            .select(key_col, "n_obs",
                    F.aggregate(
                        F.slice(F.col("_arr"), F.lit(2),
                                F.greatest(F.size("_arr") - 1, F.lit(0))),
                        F.element_at(F.col("_arr"), 1)["v"],
                        lambda acc, s: acc + F.lit(alpha)
                        * (s["v"] - acc)).alias("ema")))
