"""Gate query for bounded-memory heavy-hitter detection (operators/sketch.py).

Substrate: a deterministic skewed key over lineitem — ``floor(sqrt(fid %
10000))`` puts key j on ~(2j+1)/10000 of the rows, a linear-density skew
with keys 0..99.  ``sqrt`` of an integer < 2^52 is correctly rounded in
both engines (exact on perfect squares), so the binning is bit-identical.

The engine path runs the two-pass sketch (per-partition Misra–Gries →
exact recount of candidates); the oracle is a plain GROUP BY / HAVING with
the same integer-rational threshold ``ceil(3n/200)`` — a value-hash match
proves the sketch's candidate union lost no true heavy hitter AND the
recount threshold arithmetic agrees to the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sketch import heavy_hitters

_SHARE = (3, 200)  # 1.5% frequency threshold


def _skewed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return li.select(
        F.floor(F.sqrt(F.pmod(fid, F.lit(10000)))).alias("key"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(_skewed_keys(spark, sf_dir), "key", share=_SHARE)


def sql_heavy_hitters() -> str:
    num, den = _SHARE
    return f"""
WITH src AS (
  SELECT CAST(FLOOR(SQRT((l_orderkey * 10 + l_linenumber) % 10000))
              AS BIGINT) AS key
  FROM lineitem
), tot AS (SELECT COUNT(*) AS n FROM src)
SELECT key, COUNT(*) AS cnt
FROM src, tot
GROUP BY key, tot.n
HAVING COUNT(*) >= ({num} * tot.n + {den - 1}) // {den}"""


SKETCH_QUERIES = {
    "heavy_hitters": (q_heavy_hitters, sql_heavy_hitters),
}
