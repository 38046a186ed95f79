"""Robust per-group statistics: exact rank medians and MAD outlier flags.

Curation pipelines cut length/score outliers per stratum (source,
language) — and mean/stddev are exactly the statistics a heavy-tailed web
corpus breaks.  Median/MAD are the robust pair; this module computes them
EXACTLY with integer arithmetic only:

- the median is the rank-``⌈n/2⌉`` order statistic (the lower median for
  even n) — a VALUE from the data, never an interpolated float;
- MAD is the same rank statistic over ``|x − median|``;
- the cut ``|x − med| > k·MAD`` is evaluated by integer cross-
  multiplication (``dev·k_den > MAD·k_num``) — no division, no floats,
  so the flag is bit-identical across engines and cluster shapes.

Degenerate strata are deterministic too: MAD = 0 (over half the group at
one value) flags every row off the median when k > 0 — callers who want
leniency raise ``k`` or pre-filter constant groups.

Scale: two window passes (one per rank statistic) + two group-keyed joins
back; every exchange hashes on the SAME group key, so AQE coalesces and
the per-group state is one long.  For approximate quantiles at extreme
group cardinality the mergeable histogram sketch (temporal.py
histogram_rollup) is the documented swap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["group_rank_median", "robust_outliers"]


def group_rank_median(df: DataFrame, group_cols: Sequence[str],
                      value: str, out: str = "med") -> DataFrame:
    """(group..., out): the exact rank-⌈n/2⌉ order statistic per group.
    Ties need no tiebreak — the k-th value BY VALUE ORDER is unique even
    when row order is not."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value).asc())
    wg = Window.partitionBy(*group_cols)
    d = (df.select(*group_cols, value)
         .withColumn("_rn", F.row_number().over(w))
         .withColumn("_n", F.count(F.lit(1)).over(wg)))
    return (d.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
            .groupBy(*group_cols)
            .agg(F.max(value).alias(out)))


def robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value: str,
    k: tuple[int, int] = (3, 1),
    med_col: str = "med",
    mad_col: str = "mad",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Every input row + (med, mad, is_outlier) for its group.

    ``k = (num, den)`` is the MAD multiplier as an integer rational;
    a row is an outlier iff ``|value − med| · den > mad · num``."""
    k_num, k_den = k
    if k_num < 0 or k_den <= 0:
        raise ValueError("k must be a non-negative rational (num, den>0)")
    group_cols = list(group_cols)
    med = group_rank_median(df, group_cols, value, out=med_col)
    d = df.join(med, group_cols)
    dev = F.abs(F.col(value) - F.col(med_col))
    d = d.withColumn("_dev", dev)
    mad = group_rank_median(d, group_cols, "_dev", out=mad_col)
    return (d.join(mad, group_cols)
            .withColumn(flag_col,
                        F.col("_dev") * F.lit(k_den)
                        > F.col(mad_col) * F.lit(k_num))
            .drop("_dev"))
