"""Streaming gap-based sessionization — the unbounded-input form of
operators/temporal.py ``sessionize``, as a custom stateful operator
(``applyInPandasWithState``).

Semantics: per key, consecutive events with gaps ≤ ``gap_s`` share a
session; a CLOSED session is emitted as soon as an event arrives whose
gap from the session's last event exceeds ``gap_s``.  The one open
session per key lives in the state store as four longs (start, last,
count, exact value cents) — constant state per key, the minimum for
gap sessionization.

Ordering contract: events may arrive out of order WITHIN a micro-batch
(each batch is sorted before the walk), but batches must be per-key
time-monotone (the Kafka-partitioned-by-key, in-order-producer layout).
Late events that belong to an already-closed session would need
watermarked re-emission — that is the built-in ``session_window``
aggregation's territory; this operator exists for the part
session_window discards: exact per-session event counts/sums with the
event→session assignment replayable against the batch operator
(tests/test_streaming_sessions.py proves emitted sessions == batch
``sessionize`` sessions minus each key's final still-open one).

Scale: state is O(keys), emission is append-only, and a production
deploy bounds idle keys with a TTL exactly as
streaming_dedup_first_seen does (omitted here: an idle key's open
session must stay resumable for the batch-parity contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_sessionize"]


def streaming_sessionize(events_stream: DataFrame, *, gap_s: int,
                         key_col: str = "user_id",
                         ts_col: str = "ts",
                         order_col: str = "event_id",
                         value_col: str = "value") -> DataFrame:
    """Emit closed sessions ``(key, session_start_us, session_end_us,
    n_events, sum_cents)`` from an unbounded event stream."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_s) * 1_000_000
    prepped = events_stream.select(
        F.col(key_col).cast("long").alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(order_col).cast("long").alias("ord"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"))
    out_schema = (f"{key_col} long, session_start_us long, "
                  "session_end_us long, n_events long, sum_cents long")
    state_schema = "start_us long, last_us long, n long, sum_cents long"

    def fn(key, pdf_iter, state: GroupState):
        rows = [p for p in pdf_iter if len(p)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values(["ts_us", "ord"])
        if state.exists:
            start, last, n, cents = state.get
        else:
            start = last = None
            n = cents = 0
        closed = []
        for ts_us, c in zip(batch["ts_us"], batch["cents"]):
            ts_us, c = int(ts_us), int(c)
            if start is None:
                start, last, n, cents = ts_us, ts_us, 1, c
            elif ts_us - last > gap_us:
                closed.append((key[0], start, last, n, cents))
                start, last, n, cents = ts_us, ts_us, 1, c
            else:
                last, n, cents = ts_us, n + 1, cents + c
        state.update((start, last, n, cents))
        if closed:
            yield pd.DataFrame(
                closed, columns=[key_col, "session_start_us",
                                 "session_end_us", "n_events",
                                 "sum_cents"])

    return (prepped.groupBy("k")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.NoTimeout))
