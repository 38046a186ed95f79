"""Batch parity for streaming_sessionize: closed sessions emitted by
the stateful streaming operator must exactly equal the batch
``sessionize`` sessions minus each key's final (still-open) one."""

import os

from pyspark.sql import functions as F

from mapbox_filter_spark.operators.temporal import sessionize
from mapbox_filter_spark.streaming.sessions import streaming_sessionize

SF = "/root/testdata/sf0.001"
GAP_S = 6 * 3600


def _batch_sessions(ev):
    lab = sessionize(ev, ["user_id"], ts="ts", gap_s=GAP_S,
                     tiebreak="event_id")
    agg = (lab.groupBy("user_id", "session_id")
           .agg(F.min(F.unix_micros(F.col("ts").cast("timestamp")))
                .alias("session_start_us"),
                F.max(F.unix_micros(F.col("ts").cast("timestamp")))
                .alias("session_end_us"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .alias("sum_cents")))
    last = (lab.groupBy("user_id")
            .agg(F.max("session_id").alias("last_sid")))
    return (agg.join(last, "user_id")
            .filter(F.col("session_id") < F.col("last_sid"))
            .select("user_id", "session_start_us", "session_end_us",
                    "n_events", "sum_cents"))


def test_streaming_sessionize_batch_parity(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # three per-key time-monotone micro-batches: global time slicing
    # preserves each user's order
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ordered = ev.orderBy("ts", "event_id").collect()
    total = len(ordered)
    cuts = [0, total // 3, 2 * total // 3, total]
    for i in range(3):
        spark.createDataFrame(ordered[cuts[i]:cuts[i + 1]], ev.schema) \
            .coalesce(1).write.parquet(f"{in_dir}/f{i + 1}")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{in_dir}/f*"))
    q = (streaming_sessionize(stream, gap_s=GAP_S)
         .writeStream.format("memory").queryName("sess_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.sql("select * from sess_sink").collect()}
    expect = {tuple(r) for r in _batch_sessions(ev).collect()}
    assert got == expect
    assert len(expect) > 20  # the gate is non-vacuous at sf0.001
