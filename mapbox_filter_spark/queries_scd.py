"""Gate query for SCD2 dimension maintenance (operators/scd.py).

History built from scratch over the events stream: every event is an
attribute observation of its user (the user's current ``event_type``);
consecutive observations with the same value are no-op-suppressed, the
rest become versions with half-open validity.  The oracle rebuilds the
same history with plain lag/lead window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.scd import scd2_upsert


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = scd2_upsert(None,
                      ev.select("user_id", "event_type", "ts", "event_id"),
                      key=["user_id"], attrs=["event_type"],
                      ts="ts", tiebreak="event_id")
    return dim.select(
        "user_id", "event_type",
        F.unix_micros(F.col("valid_from").cast("timestamp"))
        .alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        .alias("valid_to_us"),
        "is_current",
    )


def sql_scd2_history() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, epoch_us(ts) AS vf, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
d AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
v AS (
  SELECT user_id, event_type, vf,
         lead(vf) OVER (PARTITION BY user_id
                        ORDER BY vf, event_id) AS vt
  FROM d
)
SELECT user_id, event_type,
       vf AS valid_from_us, vt AS valid_to_us,
       vt IS NULL AS is_current
FROM v"""



def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE compaction (operators/scd.py cdc_apply): orders base +
    a deterministic hashed change log from lineitem (U/D ops, unique
    fid seq after dedup) → last-writer-wins final state, joinless one-
    window shape."""
    from .operators.scd import cdc_apply
    from .queries_curation import _cents

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", _cents("o_totalprice").alias("total_c"),
        F.col("o_orderstatus").alias("status"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fid = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    changes = (li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        fid.alias("seq"),
        F.pmod(fid * 31, F.lit(1000000)).alias("total_c"),
        F.when(F.pmod(fid, F.lit(3)) == 0, F.lit("X"))
        .otherwise(F.lit("Y")).alias("status"),
        F.when(F.pmod(fid, F.lit(7)) == 0, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"))
        .distinct())
    return cdc_apply(base, changes, key="o_orderkey",
                     val_cols=["total_c", "status"])


def sql_cdc_apply() -> str:
    return """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c,
         o_orderstatus AS status,
         CAST(-1 AS BIGINT) AS seq, 'I' AS op
  FROM orders),
chg AS (
  SELECT DISTINCT l_orderkey AS k,
         CAST((l_orderkey * 10 + l_linenumber) * 31 % 1000000
              AS BIGINT) AS total_c,
         CASE WHEN (l_orderkey * 10 + l_linenumber) % 3 = 0
              THEN 'X' ELSE 'Y' END AS status,
         CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS seq,
         CASE WHEN (l_orderkey * 10 + l_linenumber) % 7 = 0
              THEN 'D' ELSE 'U' END AS op
  FROM lineitem),
u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
         CAST(SUM(CASE WHEN seq >= 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY k) AS BIGINT) AS n_ops
  FROM u)
SELECT k AS o_orderkey, total_c, status, seq AS last_seq, n_ops
FROM r WHERE rn = 1 AND op <> 'D'"""


SCD_QUERIES = {
    "scd2_history": (q_scd2_history, sql_scd2_history),
    "cdc_apply": (q_cdc_apply, sql_cdc_apply),
}
