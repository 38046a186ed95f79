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


SCD_QUERIES = {
    "scd2_history": (q_scd2_history, sql_scd2_history),
}
