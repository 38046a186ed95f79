"""Gate queries for the temporal operator block (operators/temporal.py).

All five run on the ``events`` table (event_id, ts, user_id, event_type,
value, props) and have exact DuckDB oracles.  Timestamps cross the gate
boundary as epoch microseconds (BIGINT) so the value hash never depends on
timestamp rendering or session timezones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_curation import _CENTS_SQL, _cents
from .operators.temporal import (
    asof_join,
    distinct_rollup,
    funnel,
    histogram_rollup,
    interval_join,
    session_stats,
    sessionize,
    time_rollup,
)

_GAP_S = 1800          # sessionization gap
_WIN_S = 900           # incident-window length for the interval join


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ------------------------------------------------------------- as-of join


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach to every click the most recent error by the same user at or
    before it (left outer; unmatched clicks keep NULLs) — the classic
    trades-vs-quotes as-of shape.  The right side is deduped to one row
    per (user_id, ts) keeping the greatest event_id so both engines are
    deterministic even under timestamp ties."""
    ev = _events(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id"))
    errors = (ev.filter(F.col("event_type") == "error")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("err_id")))
    j = asof_join(clicks, errors, on=["user_id"],
                  left_ts="ts", right_ts="ts", tiebreak="err_id")
    return j.select(
        "event_id",
        F.col("err_id_r").alias("err_id"),
        F.col("asof_gap_us").alias("gap_us"),
    )


def sql_asof_join() -> str:
    return f"""
WITH clk AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'click'),
err AS (SELECT user_id, ts, MAX(event_id) AS err_id FROM events
        WHERE event_type = 'error' GROUP BY user_id, ts)
SELECT clk.event_id,
       err.err_id,
       date_diff('microsecond', err.ts, clk.ts) AS gap_us
FROM clk ASOF LEFT JOIN err
  ON clk.user_id = err.user_id AND clk.ts >= err.ts"""


# -------------------------------------------------------- interval join


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every error opens a [ts, ts+15min) incident window; count the same
    user's clicks inside it (empty windows kept at zero).  Runs as the
    time-bucketed equi join — bucket = window length, so each window
    explodes to at most 2 bucket rows."""
    ev = _events(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id", "value"))
    wins = (ev.filter(F.col("event_type") == "error")
            .select(F.col("event_id").alias("win_id"), "user_id",
                    F.col("ts").alias("start"),
                    (F.col("ts") + F.expr(f"INTERVAL {_WIN_S} SECONDS"))
                    .alias("end")))
    j = interval_join(clicks, wins, on=["user_id"],
                      ts="ts", start="start", end="end",
                      bucket_s=_WIN_S, how="left")
    return j.groupBy("win_id").agg(
        F.count("event_id").alias("n_clicks"),
        # exact cents sum (see session_stats): deterministic under any
        # partial-agg merge order, same rounded value as the oracle
        F.coalesce(F.sum(_cents("value")) / 100.0, F.lit(0.0))
        .alias("click_value"),
    )


def sql_interval_join() -> str:
    return f"""
WITH wins AS (SELECT event_id AS win_id, user_id, ts AS s,
                     ts + INTERVAL {_WIN_S} SECOND AS e
              FROM events WHERE event_type = 'error'),
clk AS (SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'click')
SELECT wins.win_id,
       COUNT(clk.event_id) AS n_clicks,
       COALESCE(ROUND(SUM(clk.value), 2), 0.0) AS click_value
FROM wins LEFT JOIN clk
  ON clk.user_id = wins.user_id AND clk.ts >= wins.s AND clk.ts < wins.e
GROUP BY wins.win_id"""


# -------------------------------------------------------- sessionization


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (gap 30 min), collapsed to per-session
    stats.  One shuffle: lag + running-sum window, then the groupBy reuses
    the same hash partitioning."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, ["user_id"], ts="ts", gap_s=_GAP_S,
                   tiebreak="event_id")
    st = session_stats(s, ["user_id"], ts="ts", value="value")
    return st.select(
        "user_id", "session_id", "n_events",
        F.unix_micros(F.col("session_start").cast("timestamp"))
        .alias("start_us"),
        "duration_us",
        "session_value",
    )


def sql_sessionize() -> str:
    gap_us = _GAP_S * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > {gap_us}
              THEN 1 ELSE 0 END AS bnd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
         SUM(bnd) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS start_us,
       date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us,
       ROUND(SUM(value), 2) AS session_value
FROM sessions GROUP BY user_id, session_id"""


# -------------------------------------------------------- time rollup


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate at hour + day grains.  The
    day grain is re-aggregated from the HOURLY PARTIALS (sum-of-sums,
    min-of-mins, avg derived as sum/count); the oracle computes both
    grains directly from the raw table, so the gate proves partial
    re-aggregation is exact.  ``value`` is converted to integer cents
    first: integer sums are exact in both engines and bigint/bigint
    division is correctly-rounded IEEE, so no lossy ROUND is needed."""
    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.round(F.col("value") * 100, 0).cast("long"))
    r = time_rollup(ev, ts="ts", value="value_c", group=["event_type"],
                    grains_s=[3600, 86400])
    return r.select(
        F.col("grain_s").cast("int").alias("grain_s"),
        F.unix_micros("bucket_start").alias("bucket_us"),
        "event_type", "n", "vsum", "vmin", "vmax", "vavg",
    )


def sql_time_rollup() -> str:
    def grain(w_s: int) -> str:
        w_us = w_s * 1_000_000
        return f"""
SELECT CAST({w_s} AS INTEGER) AS grain_s,
       (epoch_us(ts) // {w_us}) * {w_us} AS bucket_us,
       event_type,
       COUNT(*) AS n,
       SUM(value_c) AS vsum,
       MIN(value_c) AS vmin,
       MAX(value_c) AS vmax,
       CAST(SUM(value_c) AS DOUBLE) / COUNT(*) AS vavg
FROM (SELECT ts, event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS value_c
      FROM events)
GROUP BY bucket_us, event_type"""

    return grain(3600) + "\nUNION ALL" + grain(86400)


# ------------------------------------------------------------ funnel

_FUNNEL = ["view", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion per user: each step's time is
    the first matching event at or after the previous step's time."""
    ev = _events(spark, sf_dir)
    return funnel(ev, ["user_id"], ts="ts", step_col="event_type",
                  steps=list(_FUNNEL))


def sql_funnel() -> str:
    s0, s1, s2 = _FUNNEL
    return f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
t0 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
       WHERE event_type = '{s0}' GROUP BY user_id),
t1 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
       FROM events e JOIN t0 ON e.user_id = t0.user_id
       WHERE e.event_type = '{s1}' AND epoch_us(e.ts) >= t0.t
       GROUP BY e.user_id),
t2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
       FROM events e JOIN t1 ON e.user_id = t1.user_id
       WHERE e.event_type = '{s2}' AND epoch_us(e.ts) >= t1.t
       GROUP BY e.user_id)
SELECT u.user_id,
       t0.t AS step0_us, t1.t AS step1_us, t2.t AS step2_us,
       t2.t IS NOT NULL AS completed
FROM u
LEFT JOIN t0 ON u.user_id = t0.user_id
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id"""


# ----------------------------------------------------- distinct rollup


def q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type at hour + day grains, the day grain
    derived by re-distincting the hourly PAIR SET (COUNT(DISTINCT) is
    not mergeable as a number; the pair set is); oracle counts both
    grains directly from raw."""
    ev = _events(spark, sf_dir)
    r = distinct_rollup(ev, ts="ts", entity="user_id",
                        group=["event_type"], grains_s=[3600, 86400])
    return r.select(
        "grain_s",
        F.unix_micros(F.col("bucket_start").cast("timestamp"))
        .alias("bucket_us"),
        "event_type", "n_distinct",
    )


def sql_distinct_rollup() -> str:
    def grain(w_s: int) -> str:
        w_us = w_s * 1_000_000
        return f"""
SELECT CAST({w_s} AS INTEGER) AS grain_s,
       (epoch_us(ts) // {w_us}) * {w_us} AS bucket_us,
       event_type,
       COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY bucket_us, event_type"""

    return grain(3600) + "\nUNION ALL" + grain(86400)


# ------------------------------------------------- histogram rollup (sketch)

_H_LO, _H_HI, _H_BINS = 0.0, 600.0, 120  # covers value's range at any sf
_H_QS = [0.5, 0.9]


def q_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantiles at hour + day grains: binned counts
    merge by addition (unlike exact percentiles), the day estimate is
    derived from MERGED hourly bins, and the oracle recomputes both
    grains directly — proving the sketch's merge is exact."""
    ev = _events(spark, sf_dir)
    r = histogram_rollup(ev, ts="ts", value="value",
                         group=["event_type"], grains_s=[3600, 86400],
                         lo=_H_LO, hi=_H_HI, n_bins=_H_BINS,
                         quantiles=list(_H_QS))
    return r.select(
        "grain_s",
        F.unix_micros(F.col("bucket_start").cast("timestamp"))
        .alias("bucket_us"),
        "event_type", "q", "n", "est",
    )


def sql_histogram_rollup() -> str:
    width = (_H_HI - _H_LO) / _H_BINS

    def grain(w_s: int) -> str:
        w_us = w_s * 1_000_000
        qs = "\nUNION ALL\n".join(f"""
SELECT CAST({w_s} AS INTEGER) AS grain_s, bucket_us, event_type,
       CAST({q} AS DOUBLE) AS q, tot AS n,
       CAST({_H_LO} AS DOUBLE)
         + (bin + (CAST({q} AS DOUBLE) * tot - (cum - n)) / n)
           * CAST({width} AS DOUBLE) AS est
FROM c_{w_s}
WHERE cum >= CAST({q} AS DOUBLE) * tot
  AND (cum - n) < CAST({q} AS DOUBLE) * tot"""
                                  for q in _H_QS)
        return f"""
p_{w_s} AS (
  SELECT (epoch_us(ts) // {w_us}) * {w_us} AS bucket_us, event_type,
         LEAST({_H_BINS - 1}, GREATEST(0,
           CAST(FLOOR((value - CAST({_H_LO} AS DOUBLE)) * {_H_BINS}
                      / CAST({_H_HI - _H_LO} AS DOUBLE)) AS INT)))
           AS bin
  FROM events
),
g_{w_s} AS (SELECT bucket_us, event_type, bin,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM p_{w_s} GROUP BY 1, 2, 3),
c_{w_s} AS (
  SELECT bucket_us, event_type, bin, n,
         CAST(SUM(n) OVER (PARTITION BY bucket_us, event_type
                           ORDER BY bin ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY bucket_us, event_type)
              AS BIGINT) AS tot
  FROM g_{w_s})""", qs

    w1, q1 = grain(3600)
    w2, q2 = grain(86400)
    return f"WITH {w1},\n{w2}\n{q1}\nUNION ALL\n{q2}"


# ----------------------------------------------------- quantile profile


def q_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value percentiles (linear interpolation — the
    ``percentile``/``quantile_cont`` definition): one shuffle, partial
    aggregation map-side.  The approximate path (percentile_approx /
    KLL-style sketch) is tested against this exact result in
    tests/test_temporal.py within rank-error bounds."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


def sql_quantile_profile() -> str:
    return """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type"""


_GF_TICK_US = 86_400_000_000


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily LOCF gap-fill per user (operators/temporal.py
    gapfill_locf = time_bucket_gapfill + locf): every day in the user's
    own span carries the value cents of the last event at or before the
    day's end.  Oracle: DuckDB's NATIVE ASOF LEFT JOIN against a
    generated grid — an independent engine's as-of semantics."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    from .operators.temporal import gapfill_locf

    dedup = (ev.groupBy("user_id", "ts_us")
             .agg(F.max("event_id").alias("event_id"),
                  F.max_by("cents", "event_id").alias("cents")))
    out = gapfill_locf(dedup, on=["user_id"], tick_us=_GF_TICK_US,
                       tiebreak="event_id")
    return out.select("user_id", "tick",
                      F.col("cents_r").alias("locf_cents"),
                      F.col("event_id_r").alias("src_event_id"))


def sql_gapfill_locf() -> str:
    t = _GF_TICK_US
    return f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
dedup AS (
  SELECT user_id, ts_us, MAX(event_id) AS event_id,
         arg_max(cents, event_id) AS cents
  FROM ev GROUP BY user_id, ts_us
),
b AS (
  SELECT user_id, MIN(ts_us) // {t} AS k0, MAX(ts_us) // {t} AS k1
  FROM dedup GROUP BY user_id
),
grid AS (
  SELECT user_id, g.tick, (g.tick + 1) * {t} - 1 AS gts
  FROM b, LATERAL (SELECT unnest(range(k0, k1 + 1)) AS tick) g
)
SELECT g.user_id, g.tick, d.cents AS locf_cents,
       d.event_id AS src_event_id
FROM grid g ASOF LEFT JOIN dedup d
  ON g.user_id = d.user_id AND g.gts >= d.ts_us"""


_RC_DAY_US = 86_400_000_000


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix — the product-analytics staple: users
    cohorted by FIRST-seen day; for each (cohort_day, age_days) cell,
    how many distinct users were active.  Two keyed aggregations (min
    per user, then distinct per cell — the user-day dedup rides the
    same exchange), all integer arithmetic."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_RC_DAY_US}")
        .alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (ev.join(first, "user_id")
           .select("user_id", "cohort_day",
                   (F.col("day") - F.col("cohort_day")).alias("age_days"))
           .distinct())
    return (act.groupBy("cohort_day", "age_days")
            .agg(F.count(F.lit(1)).alias("n_users")))


def sql_retention_cohorts() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_RC_DAY_US} AS day FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         e.day - f.cohort_day AS age_days
  FROM ev e JOIN first f USING (user_id)
)
SELECT cohort_day, age_days, COUNT(*) AS n_users
FROM act GROUP BY cohort_day, age_days"""


_RW_US = 3 * 86_400_000_000  # trailing 3-day window


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-day rolling sum/count per user
    (operators/temporal.py rolling_range_sum): RANGE frame on epoch
    micros — value-based peers, exact integer cents."""
    from .operators.temporal import rolling_range_sum

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = rolling_range_sum(ev, ["user_id"], "ts_us", "cents", _RW_US)
    return out.select("user_id", "event_id", "ts_us",
                      "roll_sum", "roll_cnt")


def sql_rolling_window() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, event_id, ts_us,
       CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum,
       COUNT(*) OVER w AS roll_cnt
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {_RW_US} PRECEDING AND CURRENT ROW)"""


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union length per user (operators/temporal.py
    interval_coverage): deterministic event intervals
    [ts, ts + cents·ms] merged by gaps-and-islands — exact integer
    coverage and island counts."""
    from .operators.temporal import interval_coverage

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        ((F.round(F.col("value") * 100).cast("long") * 1000) * 360
         + F.unix_micros(F.col("ts").cast("timestamp"))).alias("e"))
    return interval_coverage(ev, ["user_id"], "s", "e")


def sql_interval_coverage() -> str:
    return """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(ROUND(value*100) AS BIGINT) * 1000 * 360
           AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
               OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_isl
  FROM ev
),
isl AS (
  SELECT user_id, s, e,
         SUM(new_isl) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS g
  FROM flagged
),
merged AS (
  SELECT user_id, g, MIN(s) AS ms, MAX(e) AS me
  FROM isl GROUP BY user_id, g
)
SELECT user_id, CAST(SUM(me - ms) AS BIGINT) AS covered,
       COUNT(*) AS n_islands
FROM merged GROUP BY user_id"""


_EMA_NUM, _EMA_DEN = 1, 8  # alpha = 0.125, exact binary fraction


def q_ema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-user EMA of event values (operators/ema.py ema_final):
    pinned-order left fold with an exactly-representable alpha — the
    geometric-decay smoother the fixed-frame rolling window can't
    express.  One key shuffle; the oracle replays the identical update
    form with list_reduce(list(v ORDER BY rn))."""
    from .operators.ema import ema_final

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id", "value")
    return ema_final(ev, "user_id", ("ts_us", "event_id"), "value",
                     alpha_num=_EMA_NUM, alpha_den=_EMA_DEN)


def sql_ema_profile() -> str:
    alpha = repr(_EMA_NUM / _EMA_DEN)
    return f"""WITH s AS (
  SELECT user_id, CAST(value AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id, COUNT(*) AS n_obs,
       list_reduce(list(v ORDER BY rn),
                   (a, b) -> a + CAST({alpha} AS DOUBLE) * (b - a))
         AS ema
FROM s GROUP BY user_id"""


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user change-point detection (operators/temporal.py
    cusum_changepoint): exact integer scaled CUSUM
    S'_i = n·prefix_i − i·total over value cents — argmax |S'|,
    smallest index on ties; one key shuffle."""
    from .operators.temporal import cusum_changepoint

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id",
        _cents().alias("cents"))
    return cusum_changepoint(ev, ["user_id"],
                             order_cols=("ts", "event_id"),
                             value_col="cents")


def sql_cusum_changepoint() -> str:
    return """WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
s AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS i,
         CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS pfx,
         CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT) AS tot,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sc AS (SELECT user_id, n, i,
              CAST(n * pfx - i * tot AS BIGINT) AS s_, tot FROM s),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY abs(s_) DESC, i ASC) AS rk
  FROM sc)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(i AS BIGINT) AS cp_idx,
       s_ AS cp_stat, tot AS total
FROM r WHERE rk = 1"""


# ------------------------------------------- seasonal anomaly + attribution

_ANOM_TOP_K = 10
_ATTR_TOL_S = 604_800      # 7-day last-touch attribution window


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 seasonal outliers per event type (operators/temporal.py
    seasonal_anomaly): each value scored against its own hour-of-day
    cohort via the exact scaled deviation n·v − Σ, ranked |dev| DESC
    with the unique event_id tiebreak."""
    from .geo.tilemath import floor_div
    from .operators.temporal import seasonal_anomaly

    ev = _events(spark, sf_dir).select(
        "event_type", "event_id",
        F.pmod(floor_div(
            F.unix_micros(F.col("ts").cast("timestamp")),
            3_600_000_000), F.lit(24)).alias("hour"),
        _cents().alias("cents"))
    return seasonal_anomaly(ev, ["event_type"], season_col="hour",
                            value_col="cents", id_col="event_id",
                            top_k=_ANOM_TOP_K)


def sql_seasonal_anomaly() -> str:
    return f"""WITH e AS (
  SELECT event_type, event_id,
         (epoch_us(ts) // 3600000000) % 24 AS season,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
b AS (
  SELECT event_type, season, CAST(COUNT(*) AS BIGINT) AS n_season,
         CAST(SUM(v) AS BIGINT) AS s
  FROM e GROUP BY 1, 2),
d AS (
  SELECT e.event_type, e.event_id AS id, e.season, e.v, b.n_season,
         b.n_season * e.v - b.s AS dev
  FROM e JOIN b ON b.event_type = e.event_type AND b.season = e.season),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY abs(dev) DESC, id ASC) AS rk
  FROM d)
SELECT event_type, id, season, v, n_season, dev
FROM r WHERE rk <= {_ANOM_TOP_K}"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution — which touchpoint (click or
    view) gets credit for each purchase: the user's most recent touch
    at-or-before the purchase within a 7-day window, via the SAME
    asof_join operator as the asof_join gate (left-outer + tolerance +
    tiebreak all exercised at once).  Unattributed purchases roll up
    under 'none'.  Exact cents and exact gap sums."""
    ev = _events(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", _cents().alias("cents")))
    touches = (ev.filter(F.col("event_type").isin("click", "view"))
               .groupBy("user_id", "ts")
               .agg(F.max(F.struct("event_id", "event_type")).alias("s"))
               .select("user_id", "ts",
                       F.col("s.event_id").alias("touch_id"),
                       F.col("s.event_type").alias("touch_type")))
    j = asof_join(purchases, touches, on=["user_id"],
                  left_ts="ts", right_ts="ts", tiebreak="touch_id",
                  tolerance_s=_ATTR_TOL_S)
    return (j.groupBy(F.coalesce(F.col("touch_type_r"), F.lit("none"))
                      .alias("touch_type"))
            .agg(F.count(F.lit(1)).alias("n_purch"),
                 F.sum("cents").alias("sum_cents"),
                 F.sum("asof_gap_us").alias("sum_gap_us")))


def sql_attribution() -> str:
    tol_us = _ATTR_TOL_S * 1_000_000
    return f"""WITH p AS (
  SELECT user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS touch_type
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
j AS (
  SELECT p.cents, p.ts AS pts, t.ts AS tts, t.touch_type
  FROM p ASOF LEFT JOIN t
    ON p.user_id = t.user_id AND p.ts >= t.ts),
f AS (
  SELECT cents,
         CASE WHEN tts IS NOT NULL
               AND date_diff('microsecond', tts, pts) <= {tol_us}
              THEN touch_type END AS touch_type,
         CASE WHEN tts IS NOT NULL
               AND date_diff('microsecond', tts, pts) <= {tol_us}
              THEN date_diff('microsecond', tts, pts) END AS gap
  FROM j)
SELECT COALESCE(touch_type, 'none') AS touch_type,
       COUNT(*) AS n_purch,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_us
FROM f GROUP BY 1"""


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of event cents per type
    (operators/temporal.py autocorr): exact n-scaled deviations,
    quadratic sums as index-sorted pinned double folds (the
    entropy_profile discipline — int64 cannot hold Σz² here and a
    float groupBy sum has nondeterministic order)."""
    from .operators.temporal import autocorr

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()) \
        .select("event_type", "ts", "event_id",
                _cents().alias("cents"))
    return autocorr(ev, ["event_type"], order_cols=("ts", "event_id"),
                    value_col="cents", lags=(1, 2, 3))


def sql_autocorr() -> str:
    def lag_block(L):
        return (f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z{L} AS DOUBLE) ORDER BY i)
           FILTER (WHERE z{L} IS NOT NULL)), (p, q) -> p + q) AS num{L},
         CAST(SUM(CASE WHEN z{L} IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS np{L}""")

    def out_row(L):
        return (f"""SELECT event_type, CAST({L} AS INTEGER) AS lag, n,
       np{L} AS n_pairs,
       CASE WHEN np{L} > 0 AND den > 0.0 THEN num{L} / den END AS acf
FROM a""")

    return f"""WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
z AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
           - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS z
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
l AS (
  SELECT event_type, i, z,
         lag(z, 1) OVER w AS z1, lag(z, 2) OVER w AS z2,
         lag(z, 3) OVER w AS z3
  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY i)),
a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z AS DOUBLE) ORDER BY i)),
           (p, q) -> p + q) AS den,
         {lag_block(1)},
         {lag_block(2)},
         {lag_block(3)}
  FROM l GROUP BY event_type)
{out_row(1)}
UNION ALL
{out_row(2)}
UNION ALL
{out_row(3)}"""



def q_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-event temporal join (operators/temporal.py
    nearest_event_join): every click gets its |Δt|-nearest purchase
    value (backward tiebreak) via the joinless one-window shape; the
    oracle is an independent brute per-user theta join with the
    (abs Δt, earlier-first) rank."""
    from .operators.temporal import nearest_event_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"))
    left = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts").distinct()
    right = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts")
             .agg(F.max("cents").cast("double").alias("val")))
    return nearest_event_join(left, right, key=["user_id"],
                              right_val="val")


def sql_nearest_event() -> str:
    return """
WITH l AS (
  SELECT DISTINCT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'click'),
r AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS rus,
         CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS rv
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2),
j AS (
  SELECT l.user_id, l.us, r.rv, r.rus,
         ROW_NUMBER() OVER (
           PARTITION BY l.user_id, l.us
           ORDER BY abs(l.us - r.rus), r.rus ASC) AS rn
  FROM l JOIN r USING (user_id)),
best AS (SELECT * FROM j WHERE rn = 1),
noright AS (
  SELECT l.user_id, l.us FROM l
  WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id))
SELECT user_id, us AS ts_us, rv AS near_val, rus AS near_ts_us,
       abs(us - rus) AS delta_us
FROM best
UNION ALL
SELECT user_id, us, NULL, NULL, NULL FROM noright"""


TEMPORAL_QUERIES = {
    "nearest_event": (q_nearest_event, sql_nearest_event),
    "asof_join": (q_asof_join, sql_asof_join),
    "gapfill_locf": (q_gapfill_locf, sql_gapfill_locf),
    "retention_cohorts": (q_retention_cohorts, sql_retention_cohorts),
    "rolling_window": (q_rolling_window, sql_rolling_window),
    "interval_coverage": (q_interval_coverage, sql_interval_coverage),
    "interval_join": (q_interval_join, sql_interval_join),
    "sessionize": (q_sessionize, sql_sessionize),
    "time_rollup": (q_time_rollup, sql_time_rollup),
    "histogram_rollup": (q_histogram_rollup, sql_histogram_rollup),
    "distinct_rollup": (q_distinct_rollup, sql_distinct_rollup),
    "funnel": (q_funnel, sql_funnel),
    "quantile_profile": (q_quantile_profile, sql_quantile_profile),
    "ema_profile": (q_ema_profile, sql_ema_profile),
    "cusum_changepoint": (q_cusum_changepoint, sql_cusum_changepoint),
    "seasonal_anomaly": (q_seasonal_anomaly, sql_seasonal_anomaly),
    "attribution": (q_attribution, sql_attribution),
    "autocorr": (q_autocorr, sql_autocorr),
}


_KM_CENSOR_DAYS = 90


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival per market segment (operators/stats.py
    kaplan_meier): subject lifetime = days between first and last
    order, censored when the last order falls inside the trailing
    90-day horizon; the curve's product is carried as an exact integer
    log (order-independent windowed sum), so the whole row
    value-hashes."""
    from .operators.stats import kaplan_meier

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
        .alias("day"))
    per = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"),
                                     F.max("day").alias("last_day"))
    hz = per.agg((F.max("last_day") - _KM_CENSOR_DAYS).alias("h"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"))
    subj = (per.crossJoin(hz)
            .join(F.broadcast(cust),
                  per["o_custkey"] == cust["c_custkey"])
            .select("segment",
                    (F.col("last_day") - F.col("first_day")).alias("dur"),
                    F.when(F.col("last_day") <= F.col("h"), 1)
                    .otherwise(0).alias("event")))
    return kaplan_meier(subj, ["segment"])


def sql_kaplan_meier() -> str:
    return f"""WITH d AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders),
per AS (SELECT o_custkey, MIN(day) AS f, MAX(day) AS l
        FROM d GROUP BY 1),
hz AS (SELECT MAX(l) - {_KM_CENSOR_DAYS} AS h FROM per),
subj AS (
  SELECT c.c_mktsegment AS segment, per.l - per.f AS dur,
         CASE WHEN per.l <= hz.h THEN 1 ELSE 0 END AS ev
  FROM per CROSS JOIN hz
  JOIN customer c ON c.c_custkey = per.o_custkey),
agg AS (
  SELECT segment, dur,
         CAST(SUM(ev) AS BIGINT) AS n_event,
         CAST(SUM(1 - ev) AS BIGINT) AS n_censor
  FROM subj GROUP BY 1, 2),
r AS (
  SELECT segment, dur, n_event, n_censor,
         CAST(SUM(n_event + n_censor) OVER (PARTITION BY segment)
              - COALESCE(SUM(n_event + n_censor) OVER (
                  PARTITION BY segment ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM agg),
s AS (
  SELECT segment, dur, n_risk, n_event, n_censor,
         CASE WHEN n_risk > n_event THEN
           CAST(floor(ln(CAST(n_risk - n_event AS DOUBLE)
                         / CAST(n_risk AS DOUBLE))
                      * 1000000000.0 + 0.5) AS BIGINT) END AS step,
         MAX(CASE WHEN n_risk <= n_event THEN 1 ELSE 0 END) OVER (
           PARTITION BY segment ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hz0
  FROM r)
SELECT segment, dur, n_risk, n_event, n_censor,
       CASE WHEN hz0 = 1 THEN NULL
            ELSE CAST(SUM(step) OVER (
                   PARTITION BY segment ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) END AS log_surv_nano
FROM s WHERE n_event >= 1"""


TEMPORAL_QUERIES["kaplan_meier"] = (q_kaplan_meier, sql_kaplan_meier)


_ALLEN_WIN_US = 900 * 1_000_000


def q_allen_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval-algebra classification (operators/temporal.py
    allen_join) of session intervals vs same-user error windows:
    one equi-join on user_id + an exact-integer CASE chain; only
    touching/intersecting pairs materialize."""
    from .operators.temporal import allen_join, sessionize

    ev = _events(spark, sf_dir)
    us = F.expr("unix_micros(cast(ts as timestamp))")
    sess = (sessionize(ev, ["user_id"], gap_s=_GAP_S,
                       tiebreak="event_id")
            .groupBy("user_id", "session_id")
            .agg(F.min(us).alias("l_start"), F.max(us).alias("l_end")))
    inc = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("incident_id"),
        us.alias("r_start"), (us + _ALLEN_WIN_US).alias("r_end"))
    return allen_join(sess, inc, ["user_id"]).select(
        "user_id", "session_id", "incident_id",
        "l_start", "l_end", "r_start", "r_end", "rel")


def sql_allen_join() -> str:
    gap_us = _GAP_S * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > {gap_us}
              THEN 1 ELSE 0 END AS bnd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
se AS (
  SELECT user_id,
         CAST(SUM(bnd) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id,
         ts
  FROM flagged),
sess AS (
  SELECT user_id, session_id,
         epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS l_start,
         epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS l_end
  FROM se GROUP BY 1, 2),
inc AS (
  SELECT user_id, event_id AS incident_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS r_start,
         epoch_us(CAST(ts AS TIMESTAMP)) + {_ALLEN_WIN_US} AS r_end
  FROM events WHERE event_type = 'error')
SELECT user_id, session_id, incident_id,
       l_start, l_end, r_start, r_end,
       CASE
         WHEN l_start = r_start AND l_end = r_end THEN 'equals'
         WHEN l_end < r_start THEN 'before'
         WHEN r_end < l_start THEN 'after'
         WHEN l_start = r_start AND l_end < r_end THEN 'starts'
         WHEN l_start = r_start AND l_end > r_end THEN 'started_by'
         WHEN l_end = r_end AND l_start > r_start THEN 'finishes'
         WHEN l_end = r_end AND l_start < r_start THEN 'finished_by'
         WHEN l_end = r_start THEN 'meets'
         WHEN r_end = l_start THEN 'met_by'
         WHEN l_start > r_start AND l_end < r_end THEN 'during'
         WHEN l_start < r_start AND l_end > r_end THEN 'contains'
         WHEN l_start < r_start THEN 'overlaps'
         ELSE 'overlapped_by' END AS rel
FROM sess JOIN inc USING (user_id)
WHERE l_end >= r_start AND r_end >= l_start"""


TEMPORAL_QUERIES["allen_join"] = (q_allen_join, sql_allen_join)


def q_busday_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag in exact integer BUSINESS days
    (operators/temporal.py business_days — Monday-anchored weekday
    fold, no calendar UDF), bucketed into 5-busday weeks per order
    priority."""
    from .operators.temporal import business_days

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_shipdate")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        business_days("o_orderdate", "l_shipdate").alias("lag_bd"))
    return (j.groupBy("o_orderpriority",
                      F.expr("lag_bd div 5").cast("long")
                      .alias("lag_weeks"))
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("lag_bd").alias("sum_busdays")))


def sql_busday_lag() -> str:
    anchor = "DATE '1994-12-26'"

    def w(c):
        dn = f"CAST(date_diff('day', {anchor}, CAST({c} AS DATE)) AS BIGINT)"
        return f"(5 * ({dn} // 7) + least({dn} % 7, 5))"

    lag = f"({w('l.l_shipdate')} - {w('o.o_orderdate')})"
    return f"""SELECT o.o_orderpriority,
       CAST({lag} // 5 AS BIGINT) AS lag_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM({lag}) AS BIGINT) AS sum_busdays
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2"""


TEMPORAL_QUERIES["busday_lag"] = (q_busday_lag, sql_busday_lag)


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-count series
    per event type (operators/temporal.py seasonal_decompose_daily):
    calendar-true centered 7-day RANGE trend SUM + cross-multiplied weekday deviation —
    exact integers, no division anywhere."""
    from .operators.temporal import seasonal_decompose_daily

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "ts")
    return seasonal_decompose_daily(ev, "ts", group_cols=("event_type",))


def sql_seasonal_decompose() -> str:
    dn = ("CAST(date_diff('day', DATE '1994-12-26', CAST(d AS DATE)) "
          "AS BIGINT)")
    return f"""WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
x AS (
  SELECT event_type,
         epoch_us(CAST(d AS TIMESTAMP)) AS day_us,
         CAST({dn} % 7 AS INT) AS dow, n
  FROM daily),
w AS (
  SELECT event_type, day_us, dow, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day_us
                           RANGE BETWEEN 259200000000 PRECEDING
                                 AND 259200000000 FOLLOWING)
              AS BIGINT) AS trend7_sum,
         CAST(COUNT(*) OVER (PARTITION BY event_type, dow) AS BIGINT)
           AS n_w,
         CAST(SUM(n) OVER (PARTITION BY event_type, dow) AS BIGINT)
           AS s_w
  FROM x)
SELECT event_type, day_us, dow, n, trend7_sum, n_w, s_w,
       CAST(n * n_w - s_w AS BIGINT) AS dev_num
FROM w"""


TEMPORAL_QUERIES["seasonal_decompose"] = (q_seasonal_decompose,
                                          sql_seasonal_decompose)


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness of per-user inter-event gaps
    (operators/analytics.py burstiness): whole-second gaps, exact
    int64 moments, one pinned √-chain for B = (σ−μ)/(σ+μ)."""
    from .operators.analytics import burstiness

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "ts", "event_id")
    return (burstiness(ev, "user_id", "ts", "event_id")
            .select(F.col("key").alias("user_id"), "n_gaps", "s_sum",
                    "d_term", "b"))


def sql_burstiness() -> str:
    return """WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gus
  FROM events),
gg AS (SELECT user_id, gus // 1000000 AS g FROM g
       WHERE gus IS NOT NULL),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(g) AS BIGINT) AS s_sum,
         CAST(SUM(g * g) AS BIGINT) AS q_sum
  FROM gg GROUP BY 1 HAVING COUNT(*) >= 2)
SELECT user_id, n_gaps, s_sum,
       CAST(n_gaps * q_sum - s_sum * s_sum AS BIGINT) AS d_term,
       CASE WHEN s_sum > 0 AND n_gaps * q_sum - s_sum * s_sum >= 0
            THEN (sqrt(CAST(n_gaps * q_sum - s_sum * s_sum AS DOUBLE))
                  - CAST(s_sum AS DOUBLE))
                 / (sqrt(CAST(n_gaps * q_sum - s_sum * s_sum AS DOUBLE))
                    + CAST(s_sum AS DOUBLE))
       END AS b
FROM agg"""


TEMPORAL_QUERIES["burstiness"] = (q_burstiness, sql_burstiness)


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per week (operators/temporal.py
    peak_concurrency): interval = order date → latest lineitem ship
    date, exact sweep-line with the closes-before-opens tie rule."""
    from .operators.temporal import peak_concurrency

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_orderdate")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close"))
    iv = o.join(li, o.o_orderkey == li.l_orderkey) \
        .select("o_orderdate", "close")
    return peak_concurrency(iv, "o_orderdate", "close")


def sql_peak_concurrency() -> str:
    anchor = "epoch_us(CAST(DATE '1994-12-26' AS TIMESTAMP))"
    return f"""WITH iv AS (
  SELECT o.o_orderdate AS s, li.close AS e
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS close
        FROM lineitem GROUP BY 1) li
    ON o.o_orderkey = li.l_orderkey),
deltas AS (
  SELECT epoch_us(s) AS us, 1 AS delta FROM iv
  UNION ALL
  SELECT epoch_us(e), -1 FROM iv),
running AS (
  SELECT us,
         CAST(SUM(delta) OVER (ORDER BY us, delta
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_now,
         ((us - {anchor}) // 86400000000) // 7 AS week
  FROM deltas),
evmax AS (
  SELECT week, CAST(MAX(open_now) AS BIGINT) AS ev_max
  FROM running GROUP BY 1),
net AS (
  SELECT ((us - {anchor}) // 86400000000) // 7 AS week,
         CAST(SUM(delta) AS BIGINT) AS net
  FROM deltas GROUP BY 1),
spine AS (
  SELECT unnest(range((SELECT MIN(week) FROM net),
                      (SELECT MAX(week) FROM net) + 1)) AS week),
filled AS (
  SELECT s.week, COALESCE(n.net, 0) AS net
  FROM spine s LEFT JOIN net n ON s.week = n.week),
carried AS (
  SELECT week,
         CAST(COALESCE(SUM(net) OVER (ORDER BY week
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS carry_in
  FROM filled)
SELECT c.week,
       CAST(GREATEST(c.carry_in, COALESCE(e.ev_max, c.carry_in))
            AS BIGINT) AS max_open
FROM carried c LEFT JOIN evmax e ON c.week = e.week"""


TEMPORAL_QUERIES["peak_concurrency"] = (q_peak_concurrency,
                                        sql_peak_concurrency)


def q_conversion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week purchase-conversion shift detection
    (operators/analytics.py two_proportion_z): exact weekly
    trial/success counts from the event stream, pooled-variance z as
    one pinned √-chain."""
    from .operators.analytics import two_proportion_z

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.expr("cast(datediff(cast(ts as date), date'1994-12-26') "
               "as bigint) div 7").alias("week"),
        (F.col("event_type") == "purchase").cast("int").alias("hit"))
    weekly = ev.groupBy("week").agg(
        F.count(F.lit(1)).alias("trials"),
        F.sum("hit").cast("long").alias("hits"))
    return (two_proportion_z(weekly, "week", "trials", "hits")
            .select(F.col("bucket").alias("week"), "n_prev", "a_prev",
                    "n_cur", "a_cur", "z"))


def sql_conversion_z() -> str:
    return """WITH weekly AS (
  SELECT CAST(date_diff('day', DATE '1994-12-26', CAST(ts AS DATE))
              AS BIGINT) // 7 AS week,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS a
  FROM events GROUP BY 1),
lagged AS (
  SELECT week, n AS n_cur, a AS a_cur,
         LAG(n) OVER (ORDER BY week) AS n_prev,
         LAG(a) OVER (ORDER BY week) AS a_prev
  FROM weekly)
SELECT week, n_prev, a_prev, n_cur, a_cur,
       CASE WHEN n_prev * n_cur * (a_prev + a_cur)
                 * (n_prev + n_cur - a_prev - a_cur) > 0
            THEN CAST(a_prev * n_cur - a_cur * n_prev AS DOUBLE)
                 * sqrt(CAST(n_prev + n_cur AS DOUBLE))
                 / sqrt(CAST(n_prev * n_cur * (a_prev + a_cur)
                             * (n_prev + n_cur - a_prev - a_cur)
                             AS DOUBLE))
       END AS z
FROM lagged WHERE n_prev IS NOT NULL"""


TEMPORAL_QUERIES["conversion_z"] = (q_conversion_z, sql_conversion_z)


_HAAR_LEVELS = 3


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy spectrum of daily event counts per type
    (operators/temporal.py haar_energy): exact integer detail
    energies at 3 dyadic scales."""
    from .operators.temporal import haar_energy

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "ts")
    return haar_energy(ev, "ts", ("event_type",), levels=_HAAR_LEVELS)


def sql_haar_energy() -> str:
    ctes = ["""daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
c0 AS (
  SELECT event_type,
         CAST(date_diff('day',
                        MIN(d) OVER (PARTITION BY event_type),
                        d) AS BIGINT) AS idx,
         c
  FROM daily)"""]
    sel = []
    for lvl in range(1, _HAAR_LEVELS + 1):
        ctes.append(f"""p{lvl} AS (
  SELECT event_type, idx // 2 AS j,
         CAST(SUM(CASE WHEN idx % 2 = 0 THEN c ELSE -c END)
              AS BIGINT) AS dcoef,
         CAST(SUM(c) AS BIGINT) AS a
  FROM c{lvl - 1} GROUP BY 1, 2),
e{lvl} AS (
  SELECT event_type, CAST({lvl} AS INT) AS level,
         CAST(COUNT(*) AS BIGINT) AS n_coeffs,
         CAST(SUM(dcoef * dcoef) AS BIGINT) AS energy_u
  FROM p{lvl} GROUP BY 1),
c{lvl} AS (SELECT event_type, j AS idx, a AS c FROM p{lvl})""")
        sel.append(f"SELECT * FROM e{lvl}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(sel))


TEMPORAL_QUERIES["haar_energy"] = (q_haar_energy, sql_haar_energy)


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard per market segment
    (operators/stats.py nelson_aalen): Kaplan-Meier's additive sibling
    on the SAME subject substrate — per-step exact quantized d/n,
    order-independent integer cumsum."""
    from .operators.stats import nelson_aalen

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
        .alias("day"))
    per = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"),
                                     F.max("day").alias("last_day"))
    hz = per.agg((F.max("last_day") - _KM_CENSOR_DAYS).alias("h"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"))
    subj = (per.crossJoin(hz)
            .join(F.broadcast(cust),
                  per["o_custkey"] == cust["c_custkey"])
            .select("segment",
                    (F.col("last_day") - F.col("first_day"))
                    .alias("dur"),
                    F.when(F.col("last_day") <= F.col("h"), 1)
                    .otherwise(0).alias("event")))
    return nelson_aalen(subj, ["segment"])


def sql_nelson_aalen() -> str:
    return f"""WITH d AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders),
per AS (SELECT o_custkey, MIN(day) AS f, MAX(day) AS l
        FROM d GROUP BY 1),
hz AS (SELECT MAX(l) - {_KM_CENSOR_DAYS} AS h FROM per),
subj AS (
  SELECT c.c_mktsegment AS segment, per.l - per.f AS dur,
         CASE WHEN per.l <= hz.h THEN 1 ELSE 0 END AS ev
  FROM per CROSS JOIN hz
  JOIN customer c ON c.c_custkey = per.o_custkey),
agg AS (
  SELECT segment, dur,
         CAST(SUM(ev) AS BIGINT) AS n_event,
         CAST(SUM(1 - ev) AS BIGINT) AS n_censor
  FROM subj GROUP BY 1, 2),
r AS (
  SELECT segment, dur, n_event, n_censor,
         CAST(SUM(n_event + n_censor) OVER (PARTITION BY segment)
              - COALESCE(SUM(n_event + n_censor) OVER (
                  PARTITION BY segment ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM agg),
s AS (
  SELECT segment, dur, n_risk, n_event, n_censor,
         CAST(floor(CAST(n_event AS DOUBLE)
                    / CAST(n_risk AS DOUBLE)
                    * 1000000000.0 + 0.5) AS BIGINT) AS step
  FROM r)
SELECT segment, dur, n_risk, n_event, n_censor,
       CAST(SUM(step) OVER (
              PARTITION BY segment ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hazard_nano
FROM s WHERE n_event >= 1"""


TEMPORAL_QUERIES["nelson_aalen"] = (q_nelson_aalen, sql_nelson_aalen)


def _km_subjects(spark: SparkSession, sf_dir: str,
                 segments: "tuple[str, ...] | None" = None) -> DataFrame:
    """Shared survival-subject substrate (the kaplan_meier recipe):
    one row per ordering customer with integer lifetime in days,
    censored inside the trailing 90-day horizon, cohorted by
    ``c_custkey % 3``, carrying the market segment."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
        .alias("day"))
    per = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"),
                                     F.max("day").alias("last_day"),
                                     F.count(F.lit(1)).alias("n_orders"))
    hz = per.agg((F.max("last_day") - _KM_CENSOR_DAYS).alias("h"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"))
    if segments is not None:
        cust = cust.filter(F.col("segment").isin(*segments))
    return (per.crossJoin(hz)
            .join(F.broadcast(cust),
                  per["o_custkey"] == cust["c_custkey"])
            .select(F.pmod(F.col("c_custkey"), F.lit(3)).cast("long")
                    .alias("cohort"),
                    F.col("segment"),
                    F.col("n_orders"),
                    (F.col("last_day") - F.col("first_day")).alias("dur"),
                    F.when(F.col("last_day") <= F.col("h"), 1)
                    .otherwise(0).alias("event")))


def _sql_km_subjects(seg_filter: str = "") -> str:
    return f"""d AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders),
per AS (SELECT o_custkey, MIN(day) AS f, MAX(day) AS l,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM d GROUP BY 1),
hz AS (SELECT MAX(l) - {_KM_CENSOR_DAYS} AS h FROM per),
subj AS (
  SELECT CAST(c.c_custkey % 3 AS BIGINT) AS cohort,
         c.c_mktsegment AS segment, per.n_orders,
         per.l - per.f AS dur,
         CASE WHEN per.l <= hz.h THEN 1 ELSE 0 END AS ev
  FROM per CROSS JOIN hz
  JOIN customer c ON c.c_custkey = per.o_custkey{seg_filter})"""


_LOGRANK_SEGS = ("BUILDING", "MACHINERY")


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test per customer cohort (operators/stats.py
    logrank_test): BUILDING vs MACHINERY survival curves over the
    kaplan_meier subject substrate — exact O₁, pinned-fold E₁/V, one
    χ² division."""
    from .operators.stats import logrank_test

    subj = _km_subjects(spark, sf_dir, _LOGRANK_SEGS).select(
        "cohort", (F.col("segment") == _LOGRANK_SEGS[0]).alias("flag"),
        "dur", "event")
    return logrank_test(subj, ["cohort"], "flag")


def sql_logrank_test() -> str:
    seg = (" AND c.c_mktsegment IN ('" + _LOGRANK_SEGS[0] + "', '"
           + _LOGRANK_SEGS[1] + "')")
    return f"""WITH {_sql_km_subjects(seg)},
agg AS (
  SELECT cohort, dur,
         CAST(SUM(ev * CASE WHEN segment = '{_LOGRANK_SEGS[0]}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(ev * CASE WHEN segment = '{_LOGRANK_SEGS[0]}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS d0,
         CAST(SUM((1 - ev) * CASE WHEN segment = '{_LOGRANK_SEGS[0]}'
                                  THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM((1 - ev) * CASE WHEN segment = '{_LOGRANK_SEGS[0]}'
                                  THEN 0 ELSE 1 END) AS BIGINT) AS c0
  FROM subj GROUP BY 1, 2),
r AS (
  SELECT cohort, dur, d1, d0,
         CAST(SUM(d1 + c1) OVER (PARTITION BY cohort)
              - COALESCE(SUM(d1 + c1) OVER (
                  PARTITION BY cohort ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n1,
         CAST(SUM(d0 + c0) OVER (PARTITION BY cohort)
              - COALESCE(SUM(d0 + c0) OVER (
                  PARTITION BY cohort ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n0,
         CAST(SUM(d1 + c1) OVER (PARTITION BY cohort) AS BIGINT)
           AS n1_subj,
         CAST(SUM(d0 + c0) OVER (PARTITION BY cohort) AS BIGINT)
           AS n0_subj
  FROM agg),
t AS (
  SELECT cohort, dur, d1, n1_subj, n0_subj,
         CAST((d1 + d0) * n1 AS DOUBLE)
           / CAST(n1 + n0 AS DOUBLE) AS e1t,
         CASE WHEN n1 + n0 > 1 THEN
           CAST((d1 + d0) * n1 * n0 * (n1 + n0 - d1 - d0) AS DOUBLE)
             / CAST((n1 + n0) * (n1 + n0) * (n1 + n0 - 1) AS DOUBLE)
         ELSE CAST(0.0 AS DOUBLE) END AS vt
  FROM r WHERE d1 + d0 >= 1),
s AS (
  SELECT cohort, MAX(n1_subj) AS n1_subj, MAX(n0_subj) AS n0_subj,
         CAST(SUM(d1) AS BIGINT) AS o1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(e1t ORDER BY dur)),
                     (a, b) -> a + b) AS e1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(vt ORDER BY dur)),
                     (a, b) -> a + b) AS v
  FROM t GROUP BY cohort)
SELECT cohort, n1_subj, n0_subj, o1, e1, v,
       CASE WHEN v > 0.0 THEN
         (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v
       END AS chi2
FROM s"""


TEMPORAL_QUERIES["logrank_test"] = (q_logrank_test, sql_logrank_test)


def q_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's concordance per customer cohort (operators/stats.py
    concordance_index): does order-count activity predict a LONGER
    observed lifetime?  Score = n_orders, exact 2C+T half-units over
    the strict comparable-pair convention."""
    from .operators.stats import concordance_index

    subj = _km_subjects(spark, sf_dir).select(
        "cohort", "n_orders", "dur", "event")
    return concordance_index(subj, ["cohort"], "n_orders")


def sql_c_index() -> str:
    return f"""WITH {_sql_km_subjects()},
p AS (
  SELECT a.cohort,
         CASE WHEN a.n_orders > b.n_orders THEN 2
              WHEN a.n_orders = b.n_orders THEN 1
              ELSE 0 END AS u2
  FROM subj a JOIN subj b
    ON a.cohort = b.cohort AND a.dur < b.dur AND a.ev = 1),
n AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_subj
      FROM subj GROUP BY 1)
SELECT p.cohort, n.n_subj,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(u2) AS BIGINT) AS units2,
       CASE WHEN COUNT(*) > 0 THEN
         CAST(SUM(u2) AS DOUBLE)
           / (CAST(2.0 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)) END
         AS c_index
FROM p JOIN n ON n.cohort = p.cohort
GROUP BY p.cohort, n.n_subj"""


TEMPORAL_QUERIES["c_index"] = (q_c_index, sql_c_index)


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation statistic per event type
    (operators/temporal.py durbin_watson) over the (ts, event_id)-
    ordered cents series: exact int64 lag-diff numerator, DECIMAL38
    moment denominator, one pinned divide."""
    from .operators.temporal import durbin_watson

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        _cents().alias("cents"))
    return durbin_watson(ev, ["event_type"], ["us", "event_id"],
                         "cents")


def sql_durbin_watson() -> str:
    return """WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events),
l AS (
  SELECT event_type, x,
         x - LAG(x) OVER (PARTITION BY event_type
                          ORDER BY us, event_id) AS d
  FROM e),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(d * d) AS BIGINT) AS num
  FROM l GROUP BY 1)
SELECT event_type, n, num,
       CASE WHEN n >= 2 AND CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx <> 0 THEN
         CAST(CAST(n AS HUGEINT) * num AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx AS DOUBLE) END AS dw
FROM a"""


TEMPORAL_QUERIES["durbin_watson"] = (q_durbin_watson,
                                     sql_durbin_watson)


def q_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive MASE + sMAPE per event type (operators/temporal.py
    forecast_accuracy) over the dense daily cents totals: exact
    cross-multiplied MASE, tick-sorted pinned sMAPE fold."""
    from .geo.tilemath import floor_div
    from .operators.temporal import forecast_accuracy

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  86_400_000_000).alias("day"),
        _cents().alias("cents"))
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").alias("total"))
    return forecast_accuracy(daily, ["event_type"], "day", "total",
                             season=7)


def sql_forecast_accuracy() -> str:
    return """WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
daily AS (
  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS y
  FROM e GROUP BY 1, 2),
l AS (
  SELECT event_type, day, y,
         LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yh,
         LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1
  FROM daily),
t AS (
  SELECT event_type, day,
         CASE WHEN yh IS NOT NULL THEN abs(y - yh) END AS ef,
         CASE WHEN y1 IS NOT NULL THEN abs(y - y1) END AS ed,
         CASE WHEN yh IS NOT NULL AND y + yh > 0 THEN
           CAST(2.0 AS DOUBLE) * CAST(abs(y - yh) AS DOUBLE)
             / CAST(y + yh AS DOUBLE) END AS sm
  FROM l),
base AS (
  SELECT event_type,
         CAST(COUNT(ef) AS BIGINT) AS n_f,
         CAST(SUM(ef) AS BIGINT) AS sum_abs_err,
         CAST(COUNT(ed) AS BIGINT) AS nd,
         CAST(SUM(ed) AS BIGINT) AS sum_abs_naive,
         CAST(COUNT(sm) AS BIGINT) AS nsm
  FROM t GROUP BY 1),
folds AS (
  SELECT event_type,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(sm ORDER BY day)),
                     (a, b) -> a + b) AS smsum
  FROM t WHERE sm IS NOT NULL GROUP BY 1)
SELECT b.event_type, b.n_f, b.sum_abs_err, b.sum_abs_naive,
       CASE WHEN b.n_f > 0 AND b.sum_abs_naive > 0 THEN
         CAST(CAST(b.sum_abs_err AS HUGEINT) * b.nd AS DOUBLE)
           / CAST(CAST(b.n_f AS HUGEINT) * b.sum_abs_naive AS DOUBLE)
       END AS mase,
       CASE WHEN b.nsm > 0 THEN f.smsum / CAST(b.nsm AS DOUBLE)
       END AS smape
FROM base b LEFT JOIN folds f ON f.event_type = b.event_type"""


TEMPORAL_QUERIES["forecast_accuracy"] = (q_forecast_accuracy,
                                         sql_forecast_accuracy)


_ALLEN_BKT_S = 3600      # bucket = max interval length (6 x 10 min)
_ALLEN_Q_US = 600_000_000       # 10-minute quantization grid


def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval-algebra census (operators/temporal.py
    allen_pairs): every event opens a window on the 10-minute grid
    (start snapped down, md5-hash duration of 1-6 grid steps — the
    quantization makes ALL SIX relation classes occur, including the
    exact-coincidence ones: 13 equals / 59 starts / 134 meets at
    sf0.01), same-user touching pairs classified and counted per
    relation.  Left side explodes ≤2 time buckets; the right side
    keeps its single start bucket."""
    from .geo.tilemath import floor_div
    from .operators.temporal import allen_pairs

    ev = _events(spark, sf_dir)
    sq = (floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                    _ALLEN_Q_US) * _ALLEN_Q_US)
    dur_us = ((F.conv(F.substring(
        F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 6 + 1) * _ALLEN_Q_US)
    iv = ev.select(
        "user_id", F.col("event_id").alias("id"),
        sq.alias("s"), (sq + dur_us).alias("e"))
    pairs = allen_pairs(iv, ["user_id"], id_col="id",
                        start="s", end="e", bucket_s=_ALLEN_BKT_S)
    return (pairs.groupBy("relation")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.countDistinct("user_id").alias("n_users")))


def sql_allen_relations() -> str:
    # INDEPENDENT quadratic per-user self-join (not a blocking mirror)
    q = _ALLEN_Q_US
    return f"""WITH iv AS (
  SELECT user_id, event_id AS id,
         (epoch_us(ts) // {q}) * {q} AS s,
         (epoch_us(ts) // {q}) * {q}
           + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                   1, 15)) AS BIGINT) % 6 + 1)
             * {q} AS e
  FROM events),
p AS (
  SELECT a.user_id, a.id AS id_a, b.id AS id_b,
         CASE WHEN a.s = b.s AND a.e = b.e THEN 'equals'
              WHEN a.s = b.s THEN 'starts'
              WHEN a.e = b.s THEN 'meets'
              WHEN a.e < b.e THEN 'overlaps'
              WHEN a.e = b.e THEN 'finished_by'
              ELSE 'contains' END AS relation
  FROM iv a JOIN iv b
    ON a.user_id = b.user_id
   AND (a.s, a.e, a.id) < (b.s, b.e, b.id)
   AND b.s <= a.e)
SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM p GROUP BY 1"""


TEMPORAL_QUERIES["allen_relations"] = (q_allen_relations,
                                       sql_allen_relations)


_LTOB_BKT_US = 86_400_000_000      # one-day buckets


def q_ltob_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-One-Bucket chart downsampling
    (operators/temporal.py ltob_downsample): per user, keep the
    visually dominant event of each day — exact int64 cross-product
    areas over (ts µs, cents), endpoints always kept, deterministic
    (area DESC, ts, event_id) argmax.  One shuffle feeds both
    windows."""
    from .operators.temporal import ltob_downsample
    from .queries_curation import _cents

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        _cents().alias("cents"))
    out = ltob_downsample(ev, ["user_id"], ts="ts_us", val="cents",
                          bucket_us=_LTOB_BKT_US, tiebreak="event_id")
    return out.select("user_id", "ts_us", "cents", "bucket",
                      "area2", "endpoint")


def sql_ltob_downsample() -> str:
    from .queries_curation import _CENTS_SQL
    b = _LTOB_BKT_US
    return f"""WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         {_CENTS_SQL} AS cents
  FROM events),
n AS (
  SELECT user_id, event_id, ts_us, cents,
         LAG(ts_us) OVER w AS xp, LAG(cents) OVER w AS yp,
         LEAD(ts_us) OVER w AS xn, LEAD(cents) OVER w AS yn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
a AS (
  SELECT user_id, event_id, ts_us, cents,
         (xp IS NULL OR xn IS NULL) AS endpoint,
         CASE WHEN xp IS NOT NULL AND xn IS NOT NULL THEN
           abs((xp - xn) * (cents - yp) - (xp - ts_us) * (yn - yp))
         END AS area2,
         ts_us // {b} AS bkt
  FROM n),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, bkt
    ORDER BY area2 DESC NULLS LAST, ts_us, event_id) AS rn
  FROM a)
SELECT user_id, ts_us, cents, bkt AS bucket, area2, endpoint
FROM r WHERE endpoint OR rn = 1"""


TEMPORAL_QUERIES["ltob_downsample"] = (q_ltob_downsample,
                                       sql_ltob_downsample)


_WEEK_US = 604_800_000_000


def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart c-chart of weekly event counts per event type
    (operators/temporal.py c_chart): completed period grid, pure
    int64 cross-multiplied out-of-control decision
    (W·c − S)² > 9·S·W, pinned-double center line / limits — the SPC
    alarm over the feed's arrival rate."""
    from .geo.tilemath import floor_div
    from .operators.temporal import c_chart

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    keyed = ev.select(
        "event_type",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  _WEEK_US).alias("wk"))
    return c_chart(keyed, ["event_type"], "wk")


def sql_control_chart() -> str:
    return f"""WITH cnt AS (
  SELECT event_type, epoch_us(ts) // {_WEEK_US} AS period,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
groups AS (SELECT DISTINCT event_type FROM events),
periods AS (SELECT DISTINCT epoch_us(ts) // {_WEEK_US} AS period
            FROM events),
grid AS (
  SELECT g.event_type, p.period, COALESCE(c.c, 0) AS c
  FROM groups g CROSS JOIN periods p
  LEFT JOIN cnt c ON c.event_type = g.event_type
                 AND c.period = p.period),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS w_periods,
         CAST(SUM(c) AS BIGINT) AS c_total
  FROM grid GROUP BY 1)
SELECT g.event_type, g.period AS wk, g.c, t.w_periods, t.c_total,
       CASE WHEN (t.w_periods * g.c - t.c_total)
                 * (t.w_periods * g.c - t.c_total)
                 > 9 * t.c_total * t.w_periods
            THEN 1 ELSE 0 END AS ooc,
       CAST(t.c_total AS DOUBLE) / CAST(t.w_periods AS DOUBLE) AS cbar,
       CAST(t.c_total AS DOUBLE) / CAST(t.w_periods AS DOUBLE)
         + 3.0 * sqrt(CAST(t.c_total AS DOUBLE)
                      / CAST(t.w_periods AS DOUBLE)) AS ucl,
       GREATEST(CAST(t.c_total AS DOUBLE) / CAST(t.w_periods AS DOUBLE)
                - 3.0 * sqrt(CAST(t.c_total AS DOUBLE)
                             / CAST(t.w_periods AS DOUBLE)),
                0.0) AS lcl
FROM grid g JOIN tot t USING (event_type)"""


TEMPORAL_QUERIES["control_chart"] = (q_control_chart,
                                     sql_control_chart)


_HURST_WINDOWS = (4, 8, 16, 32)


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled range over per-user event-value
    series (operators/temporal.py hurst_rs): exact-long cumulative
    deviations with cancelling denominators, one µ-quantized √-chain
    per window, loglog_fit slope — long-memory vs mean-reversion of
    the value stream."""
    from .operators.temporal import hurst_rs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", _cents().alias("cents"))
    return hurst_rs(ev, ["user_id"], ["ts", "event_id"], "cents",
                    windows=_HURST_WINDOWS)


def sql_hurst_rs() -> str:
    from .queries_curation import _CENTS_SQL, sql_lnln_fit_tail

    wvals = ", ".join(f"({w})" for w in _HURST_WINDOWS)
    return f"""WITH base AS (
  SELECT user_id, ts, event_id, {_CENTS_SQL} AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
expl AS (
  SELECT b.*, wv.w FROM base b
  CROSS JOIN (VALUES {wvals}) AS wv(w)),
wc AS (
  SELECT user_id, w, rn // w AS chunk, rn % w + 1 AS j, x,
         SUM(x) OVER (PARTITION BY user_id, w, rn // w
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS pref,
         SUM(x) OVER (PARTITION BY user_id, w, rn // w) AS s,
         SUM(x * x) OVER (PARTITION BY user_id, w, rn // w) AS ss,
         COUNT(*) OVER (PARTITION BY user_id, w, rn // w) AS n
  FROM expl),
per_chunk AS (
  SELECT user_id, w, chunk,
         MAX(w * pref - j * s) - MIN(w * pref - j * s) AS rng,
         MAX(w * ss - s * s) AS vnum
  FROM wc WHERE n = w GROUP BY 1, 2, 3),
per_w AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CAST(FLOOR(CAST(rng AS DOUBLE)
                             / sqrt(CAST(vnum AS DOUBLE))
                             * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_rs_micro
  FROM per_chunk WHERE vnum > 0 GROUP BY 1),
pw2 AS (
  SELECT CAST(w AS BIGINT) AS w, n_chunks, sum_rs_micro,
         (sum_rs_micro - sum_rs_micro % n_chunks) // n_chunks
           AS rs_mean_micro
  FROM per_w),
lnpts AS (SELECT w AS x, rs_mean_micro AS y FROM pw2
          WHERE rs_mean_micro >= 1),
fit AS (WITH {sql_lnln_fit_tail('lnpts')})
SELECT pw2.w, pw2.n_chunks, pw2.sum_rs_micro,
       CAST(pw2.rs_mean_micro AS BIGINT) AS rs_mean_micro,
       fit.slope AS hurst, fit.r2
FROM pw2 CROSS JOIN fit"""


TEMPORAL_QUERIES["hurst_rs"] = (q_hurst_rs, sql_hurst_rs)


_LB_M = 6


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box white-noise test of event cents per type
    (operators/temporal.py ljung_box): lag-1..6 acf ladder on the
    exact deviation construction, Q = n(n+2)·Σ r_k²/(n−k) as one
    ascending-lag pinned fold."""
    from .operators.temporal import ljung_box

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()) \
        .select("event_type", "ts", "event_id",
                _cents().alias("cents"))
    return ljung_box(ev, ["event_type"], order_cols=("ts", "event_id"),
                     value_col="cents", m=_LB_M)


def sql_ljung_box() -> str:
    lag_cols = ",\n         ".join(
        f"lag(z, {L}) OVER w AS z{L}" for L in range(1, _LB_M + 1))

    def lag_block(L):
        return (f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z{L} AS DOUBLE) ORDER BY i)
           FILTER (WHERE z{L} IS NOT NULL)), (p, q) -> p + q) AS num{L},
         CAST(SUM(CASE WHEN z{L} IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS np{L}""")

    blocks = ",\n         ".join(lag_block(L) for L in range(1, _LB_M + 1))
    acf_cols = ", ".join(
        f"CASE WHEN np{L} > 0 AND den > 0.0 THEN num{L} / den END AS r{L}"
        for L in range(1, _LB_M + 1))
    not_null = " AND ".join(
        f"r{L} IS NOT NULL" for L in range(1, _LB_M + 1))
    # left-associative chain == the engine's ((0+t1)+t2)+... fold
    ladder = "0.0 + " + " + ".join(
        f"r{L} * r{L} / CAST(n - {L} AS DOUBLE)"
        for L in range(1, _LB_M + 1))
    return f"""WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
z AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
           - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS z
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
l AS (
  SELECT event_type, i, z,
         {lag_cols}
  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY i)),
a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z AS DOUBLE) ORDER BY i)),
           (p, q) -> p + q) AS den,
         {blocks}
  FROM l GROUP BY event_type),
r AS (SELECT event_type, n, {acf_cols} FROM a)
SELECT event_type, n, CAST({_LB_M} AS BIGINT) AS m,
       CASE WHEN {not_null} AND n > {_LB_M}
            THEN CAST(n * (n + 2) AS DOUBLE) * ({ladder})
       END AS q_stat
FROM r"""


TEMPORAL_QUERIES["ljung_box"] = (q_ljung_box, sql_ljung_box)


_RD_WINDOW = 7


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per observed day
    (operators/temporal.py rolling_distinct): the WAU series via the
    bounded offset explode over the (user, day)-distinct table —
    COUNT DISTINCT a RANGE frame cannot express."""
    from .operators.temporal import rolling_distinct

    ev = _events(spark, sf_dir)
    return rolling_distinct(ev, ts_col="ts", entity_col="user_id",
                            window_days=_RD_WINDOW)


def sql_rolling_distinct() -> str:
    w = _RD_WINDOW
    return f"""WITH ud AS (
  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
         user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
days AS (SELECT DISTINCT d AS day FROM ud),
tgt AS (
  SELECT t.day, ud.user_id
  FROM ud, LATERAL (SELECT unnest(range(ud.d, ud.d + {w})) AS day) t)
SELECT CAST(tgt.day AS BIGINT) AS day,
       CAST(COUNT(DISTINCT tgt.user_id) AS BIGINT) AS active
FROM tgt JOIN days ON days.day = tgt.day
GROUP BY 1"""


TEMPORAL_QUERIES["rolling_distinct"] = (q_rolling_distinct,
                                        sql_rolling_distinct)


_RMST_TAU = 365


def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time within the first year per market
    segment (operators/stats.py rmst): the area under the
    kaplan_meier gate's curve up to τ=365 days — exact integer gaps ×
    the exact-integer-log survival carry, summed in one pinned
    ascending fold over the collapsed curve."""
    from .operators.stats import rmst

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
        .alias("day"))
    per = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"),
                                     F.max("day").alias("last_day"))
    hz = per.agg((F.max("last_day") - _KM_CENSOR_DAYS).alias("h"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"))
    subj = (per.crossJoin(hz)
            .join(F.broadcast(cust),
                  per["o_custkey"] == cust["c_custkey"])
            .select("segment",
                    (F.col("last_day") - F.col("first_day")).alias("dur"),
                    F.when(F.col("last_day") <= F.col("h"), 1)
                    .otherwise(0).alias("event")))
    return rmst(subj, ["segment"], tau=_RMST_TAU)


def sql_rmst() -> str:
    return f"""WITH km AS ({sql_kaplan_meier()}),
x AS (
  SELECT segment, dur, log_surv_nano,
         LAG(dur, 1, 0) OVER w AS pt,
         LAG(log_surv_nano, 1, 0) OVER w AS pls,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY dur DESC) AS rdesc
  FROM km WINDOW w AS (PARTITION BY segment ORDER BY dur)),
c AS (
  SELECT segment, dur,
         CASE WHEN pls IS NULL THEN 0.0
              ELSE exp(CAST(pls AS DOUBLE) / 1000000000.0) END
         * CAST(least(dur, {_RMST_TAU}) - least(pt, {_RMST_TAU})
                AS DOUBLE) AS contrib,
         CASE WHEN rdesc = 1 THEN
           CASE WHEN log_surv_nano IS NULL THEN 0.0
                ELSE exp(CAST(log_surv_nano AS DOUBLE)
                         / 1000000000.0) END
           * CAST({_RMST_TAU} - least(dur, {_RMST_TAU}) AS DOUBLE)
         END AS tail
  FROM x)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_times,
       CAST({_RMST_TAU} AS BIGINT) AS tau,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(contrib ORDER BY dur)),
                   (a, x) -> a + x)
         + MAX(tail) AS rmst
FROM c GROUP BY segment"""


TEMPORAL_QUERIES["rmst"] = (q_rmst, sql_rmst)


_PACF_K = 4


def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation ladder (lags 1-4) of event cents per
    type (operators/temporal.py pacf): Durbin-Levinson unrolled into
    a fixed left-associated expression chain over the autocorr gate's
    pinned-fold acf values — both engines run the identical IEEE op
    sequence, so the whole AR-order diagnostic value-hashes."""
    from .operators.temporal import pacf

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()) \
        .select("event_type", "ts", "event_id",
                _cents().alias("cents"))
    return pacf(ev, ["event_type"], order_cols=("ts", "event_id"),
                value_col="cents", max_lag=_PACF_K)


def sql_pacf() -> str:
    K = _PACF_K

    def lag_block(L):
        return (f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z{L} AS DOUBLE) ORDER BY i)
           FILTER (WHERE z{L} IS NOT NULL)), (p, q) -> p + q) AS num{L},
         CAST(SUM(CASE WHEN z{L} IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS np{L}""")

    lag_sel = ",\n         ".join(
        f"lag(z, {L}) OVER w AS z{L}" for L in range(1, K + 1))
    lag_blocks = ",\n         ".join(
        lag_block(L) for L in range(1, K + 1))
    acf_cols = ",\n         ".join(
        f"CASE WHEN np{L} > 0 AND den > 0.0 THEN num{L} / den END"
        f" AS r{L}" for L in range(1, K + 1))
    ctes = ["s1 AS (SELECT *, r1 AS p1_1 FROM piv)"]
    prev = "s1"
    for k in range(2, K + 1):
        num = f"r{k}" + "".join(f" - p{k - 1}_{j} * r{k - j}"
                                for j in range(1, k))
        den = "1.0" + "".join(f" - p{k - 1}_{j} * r{j}"
                              for j in range(1, k))
        ctes.append(
            f"s{k}a AS (SELECT *, CASE WHEN {den} <> 0.0"
            f" THEN ({num}) / ({den}) END AS p{k}_{k} FROM {prev})")
        prev = f"s{k}a"
        if k < K:
            upd = ", ".join(
                f"p{k - 1}_{j} - p{k}_{k} * p{k - 1}_{k - j} AS p{k}_{j}"
                for j in range(1, k))
            ctes.append(f"s{k}b AS (SELECT *, {upd} FROM {prev})")
            prev = f"s{k}b"
    cte_block = ",\n".join(ctes)
    rows = "\nUNION ALL\n".join(
        f"SELECT event_type, CAST({L} AS INTEGER) AS lag, n,"
        f" r{L} AS acf, p{L}_{L} AS pacf FROM {prev}"
        for L in range(1, K + 1))
    return f"""WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
z AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
           - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS z
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
l AS (
  SELECT event_type, i, z,
         {lag_sel}
  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY i)),
a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(CAST(z AS DOUBLE) * CAST(z AS DOUBLE) ORDER BY i)),
           (p, q) -> p + q) AS den,
         {lag_blocks}
  FROM l GROUP BY event_type),
piv AS (
  SELECT event_type, n,
         {acf_cols}
  FROM a),
{cte_block}
{rows}"""


TEMPORAL_QUERIES["pacf"] = (q_pacf, sql_pacf)


def q_cuminc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks cumulative incidence per market segment
    (operators/stats.py cuminc): the kaplan_meier gate's subjects
    split into two competing churn causes by customer-key parity —
    the Aalen-Johansen CIF with the exact integer log carry for
    S(t⁻) and integer-quantized increments, so every row
    value-hashes."""
    from .operators.stats import cuminc

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
        .alias("day"))
    per = o.groupBy("o_custkey").agg(F.min("day").alias("first_day"),
                                     F.max("day").alias("last_day"))
    hz = per.agg((F.max("last_day") - _KM_CENSOR_DAYS).alias("h"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", F.col("c_mktsegment").alias("segment"))
    subj = (per.crossJoin(hz)
            .join(F.broadcast(cust),
                  per["o_custkey"] == cust["c_custkey"])
            .select("segment",
                    (F.col("last_day") - F.col("first_day")).alias("dur"),
                    F.when(F.col("last_day") <= F.col("h"),
                           F.pmod(F.col("c_custkey"), F.lit(2)) + 1)
                    .otherwise(0).alias("cause")))
    return cuminc(subj, ["segment"])


def sql_cuminc() -> str:
    s = 1_000_000_000
    return f"""WITH d AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders),
per AS (SELECT o_custkey, MIN(day) AS f, MAX(day) AS l
        FROM d GROUP BY 1),
hz AS (SELECT MAX(l) - {_KM_CENSOR_DAYS} AS h FROM per),
subj AS (
  SELECT c.c_mktsegment AS segment, per.l - per.f AS dur,
         CASE WHEN per.l <= hz.h THEN per.o_custkey % 2 + 1
              ELSE 0 END AS cause
  FROM per CROSS JOIN hz
  JOIN customer c ON c.c_custkey = per.o_custkey),
cell AS (
  SELECT segment, dur, CAST(cause AS BIGINT) AS cause,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM subj GROUP BY 1, 2, 3),
pt AS (
  SELECT segment, dur,
         CAST(SUM(d) AS BIGINT) AS n_at,
         CAST(SUM(CASE WHEN cause > 0 THEN d ELSE 0 END) AS BIGINT)
           AS d_all
  FROM cell GROUP BY 1, 2),
r AS (
  SELECT segment, dur, n_at, d_all,
         CAST(SUM(n_at) OVER (PARTITION BY segment)
              - COALESCE(SUM(n_at) OVER (
                  PARTITION BY segment ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS n_risk
  FROM pt),
st AS (
  SELECT segment, dur, n_risk, d_all,
         CASE WHEN n_risk > d_all AND d_all > 0 THEN
           CAST(floor(ln(CAST(n_risk - d_all AS DOUBLE)
                         / CAST(n_risk AS DOUBLE))
                      * {float(s)!r} + 0.5) AS BIGINT)
         ELSE 0 END AS step,
         COALESCE(MAX(CASE WHEN n_risk <= d_all THEN 1 ELSE 0 END)
                  OVER (PARTITION BY segment ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS dead_before
  FROM r),
lp AS (
  SELECT segment, dur, n_risk,
         CASE WHEN dead_before = 1 THEN NULL
              ELSE COALESCE(SUM(step) OVER (
                     PARTITION BY segment ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) END AS log_prev
  FROM st),
ev AS (
  SELECT cell.segment, cell.cause, cell.dur, lp.n_risk,
         cell.d AS d_cause,
         CAST(floor(
           (CASE WHEN lp.log_prev IS NULL THEN 0.0
                 ELSE exp(CAST(lp.log_prev AS DOUBLE)
                          / {float(s)!r}) END)
           * (CAST(cell.d AS DOUBLE) / CAST(lp.n_risk AS DOUBLE))
           * {float(s)!r} + 0.5) AS BIGINT) AS inc_q
  FROM cell JOIN lp ON lp.segment = cell.segment
                   AND lp.dur = cell.dur
  WHERE cell.cause > 0)
SELECT segment, cause, dur, n_risk, d_cause,
       CAST(SUM(inc_q) OVER (PARTITION BY segment, cause
                             ORDER BY dur
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cif_q,
       CAST(SUM(inc_q) OVER (PARTITION BY segment, cause
                             ORDER BY dur
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / {float(s)!r} AS cif
FROM ev"""


TEMPORAL_QUERIES["cuminc"] = (q_cuminc, sql_cuminc)


def q_lsq_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares single changepoint of the event-cents series per
    type (operators/temporal.py lsq_changepoint): the parametric AMOC
    split located by exact int128 prefix-sum arithmetic with a fixed
    DECIMAL(38,6) argmin — beside the rank-based pettitt gate on the
    same ordering."""
    from .operators.temporal import lsq_changepoint

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()) \
        .select("event_type", "ts", "event_id",
                _cents().alias("cents"))
    return lsq_changepoint(ev, ["event_type"],
                           order_cols=("ts", "event_id"),
                           value_col="cents")


def sql_lsq_changepoint() -> str:
    return """WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS k,
         CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY ts,
                           event_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS p,
         CAST(SUM(v * v) OVER (PARTITION BY event_type ORDER BY ts,
                               event_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS a,
         CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(SUM(v * v) OVER (PARTITION BY event_type) AS BIGINT)
           AS at,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
c AS (
  SELECT event_type, k, p, s, n,
         CAST((CAST(at AS HUGEINT) * k * (n - k)
               - CAST(p AS HUGEINT) * p * (n - k)
               - CAST(s - p AS HUGEINT) * (s - p) * k)
              AS DECIMAL(38, 6))
           / CAST(CAST(k AS HUGEINT) * (n - k) AS DECIMAL(38, 6))
           AS sc
  FROM r WHERE k < n),
b AS (
  SELECT event_type, k, p, s, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY sc, k) AS rn
  FROM c)
SELECT event_type, n, CAST(k AS BIGINT) AS best_k,
       CAST(p AS DOUBLE) / CAST(k AS DOUBLE) AS mean_left,
       CAST(s - p AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_right
FROM b WHERE rn = 1"""


TEMPORAL_QUERIES["lsq_changepoint"] = (q_lsq_changepoint,
                                       sql_lsq_changepoint)


_CCF_LAGS = (-2, -1, 0, 1, 2)


def q_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between value cents and props length
    per event type (operators/temporal.py crosscorr): n-scaled exact
    deviations, pinned index-ordered double folds, one shared √ chain
    — the bivariate CCF beside autocorr/pacf."""
    from .operators.temporal import crosscorr

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull()
                  & F.col("props").isNotNull())
          .select("event_type", "ts", "event_id",
                  _cents().alias("x"),
                  F.length("props").cast("long").alias("y")))
    return crosscorr(ev, ["event_type"], order_cols=("ts", "event_id"),
                     x_col="x", y_col="y", lags=_CCF_LAGS)


def sql_crosscorr() -> str:
    def shift(L):
        if L == 0:
            return "zy"
        if L > 0:
            return f"lag(zy, {L}) OVER w"
        return f"lead(zy, {-L}) OVER w"

    def fold(a, b, flt=True):
        f = f" FILTER (WHERE {b} IS NOT NULL)" if flt else ""
        return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) "
                f"ORDER BY i){f}), (p, q) -> p + q)")

    col = lambda L: str(L).replace("-", "m")
    lag_cols = ",\n         ".join(
        f"{shift(L)} AS s{col(L)}" for L in _CCF_LAGS)
    aggs = ",\n         ".join(
        f"{fold('zx', 's' + col(L))} AS num{col(L)},\n         "
        f"CAST(SUM(CASE WHEN s{col(L)} IS NOT NULL THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS np{col(L)}" for L in _CCF_LAGS)
    outs = "\nUNION ALL ".join(f"""
SELECT event_type, CAST({L} AS INTEGER) AS lag, n,
       np{col(L)} AS n_pairs,
       CASE WHEN np{col(L)} > 0 AND dx > 0.0 AND dy > 0.0
            THEN num{col(L)} / sqrt(dx * dy) END AS ccf
FROM a""" for L in _CCF_LAGS)
    return f"""WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(length(props) AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
    AND props IS NOT NULL),
z AS (
  SELECT event_type,
         ROW_NUMBER() OVER w AS i,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * x
           - CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS zx,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) * y
           - CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS zy
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
l AS (
  SELECT event_type, i, zx, zy,
         {lag_cols}
  FROM z WINDOW w AS (PARTITION BY event_type ORDER BY i)),
a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         {fold('zx', 'zx', flt=False)} AS dx,
         {fold('zy', 'zy', flt=False)} AS dy,
         {aggs}
  FROM l GROUP BY event_type)
{outs}"""


TEMPORAL_QUERIES["crosscorr"] = (q_crosscorr, sql_crosscorr)


_EWMA_QMOD = 64
_EWMA_LAM = 0.25
_EWMA_D1SQ = (1.0 - _EWMA_LAM) * (1.0 - _EWMA_LAM)
_EWMA_C2 = _EWMA_LAM / (2.0 - _EWMA_LAM)


def q_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over value cents per event type
    (operators/temporal.py ewma_chart): dyadic λ = 1/4, the z
    recursion and (1−λ)^{2t} decay as ONE left-associated in-row fold
    — the oracle replays the identical IEEE sequence per t through
    prefix folds, so every z, limit, and out-of-control flag
    value-hashes."""
    from .operators.temporal import ewma_chart

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull()
                  & (F.pmod(F.col("event_id"), F.lit(_EWMA_QMOD)) == 0))
          .select(F.col("event_type").alias("g"), "ts", "event_id",
                  _cents().alias("x")))
    return ewma_chart(ev, ["g"], order_cols=("ts", "event_id"),
                      value_col="x")


def sql_ewma_chart() -> str:
    return f"""WITH e AS (
  SELECT event_type AS g, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
    AND event_id % {_EWMA_QMOD} = 0),
s AS (
  SELECT g, ROW_NUMBER() OVER (PARTITION BY g
                               ORDER BY ts, event_id) AS i, x
  FROM e),
st AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sm,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sq
  FROM s GROUP BY g),
m AS (
  SELECT g, n, CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(CAST(n AS HUGEINT) * sq
                   - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)
                   AS DOUBLE)
              / CAST(n * n AS DOUBLE)) AS sig
  FROM st),
zt AS (
  SELECT a.g, a.i AS t,
         list_reduce(
           list_prepend(m.mu, list(CAST(b.x AS DOUBLE) ORDER BY b.i)),
           (z, x) -> z + {_EWMA_LAM!r} * (x - z)) AS z,
         list_reduce(
           list_prepend(CAST(1.0 AS DOUBLE),
                        list(CAST({_EWMA_D1SQ!r} AS DOUBLE)
                             ORDER BY b.i)),
           (p, q) -> p * q) AS w
  FROM s a JOIN s b ON b.g = a.g AND b.i <= a.i
  JOIN m ON m.g = a.g
  GROUP BY a.g, a.i, m.mu)
SELECT zt.g, CAST(zt.t AS INTEGER) AS t, m.n, zt.z, zt.w,
       m.mu + (3.0 * m.sig) * sqrt({_EWMA_C2!r} * (1.0 - zt.w)) AS ucl,
       m.mu - (3.0 * m.sig) * sqrt({_EWMA_C2!r} * (1.0 - zt.w)) AS lcl,
       zt.z > m.mu + (3.0 * m.sig) * sqrt({_EWMA_C2!r} * (1.0 - zt.w))
       OR zt.z < m.mu - (3.0 * m.sig) * sqrt({_EWMA_C2!r} * (1.0 - zt.w))
         AS ooc
FROM zt JOIN m ON m.g = zt.g"""


TEMPORAL_QUERIES["ewma_chart"] = (q_ewma_chart, sql_ewma_chart)


def q_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif vocabulary of the value-cents stream per event type
    (operators/temporal.py sax_words): exact Σ(n·x−S) segment sums
    classified against (b·σ)·(n·w) pinned-chain breakpoints, complete
    4×4 words only — the time-series shingle table behind motif
    mining."""
    from .operators.temporal import sax_words

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.col("event_type").alias("g"), "ts", "event_id",
                  _cents().alias("x")))
    return sax_words(ev, ["g"], order_cols=("ts", "event_id"),
                     value_col="x")


def sql_sax_words() -> str:
    b1, b2, b3 = -0.6745, 0.0, 0.6745
    thr = "({b!r} * sig) * CAST(n * 4 AS DOUBLE)"
    return f"""WITH e AS (
  SELECT event_type AS g, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
s AS (
  SELECT g, ROW_NUMBER() OVER w - 1 AS i, x,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
         CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS sm,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
           OVER (PARTITION BY g) AS sq
  FROM e WINDOW w AS (PARTITION BY g ORDER BY ts, event_id)),
z AS (
  SELECT g, i, n, n * x - sm AS z,
         sqrt(CAST(CAST(n AS HUGEINT) * sq
                   - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)
                   AS DOUBLE) / CAST(n * n AS DOUBLE)) AS sig
  FROM s WHERE i // 16 < n // 16),
seg AS (
  SELECT g, i // 16 AS wi, (i % 16) // 4 AS si, SUM(z) AS sz,
         MIN(n) AS n, MIN(sig) AS sig
  FROM z GROUP BY 1, 2, 3),
symt AS (
  SELECT g, wi, si,
    CASE WHEN CAST(sz AS DOUBLE) < {thr.format(b=b1)} THEN 'a'
         WHEN CAST(sz AS DOUBLE) < {thr.format(b=b2)} THEN 'b'
         WHEN CAST(sz AS DOUBLE) < {thr.format(b=b3)} THEN 'c'
         ELSE 'd' END AS c
  FROM seg),
wd AS (
  SELECT g, wi, string_agg(c, '' ORDER BY si) AS word
  FROM symt GROUP BY 1, 2)
SELECT g, word, CAST(COUNT(*) AS BIGINT) AS n_words
FROM wd GROUP BY 1, 2"""


TEMPORAL_QUERIES["sax_words"] = (q_sax_words, sql_sax_words)


def q_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional coupling between hourly click and purchase
    presence per user cohort (operators/temporal.py
    transfer_entropy): complete gap-filled hour grid, exact 8-cell
    transition counts, pinned cell-ordered c·ln folds — Schreiber TE
    both ways."""
    from .geo.tilemath import floor_div
    from .operators.temporal import _us, transfer_entropy

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .select(F.pmod(F.col("user_id"), F.lit(4)).alias("g"),
                  floor_div(_us(F.col("ts")), 3_600_000_000)
                  .alias("h"),
                  "event_type"))
    flags = (ev.groupBy("g", "h")
             .agg(F.max((F.col("event_type") == "click").cast("int"))
                  .alias("x"),
                  F.max((F.col("event_type") == "purchase").cast("int"))
                  .alias("y")))
    bounds = flags.groupBy("g").agg(F.min("h").alias("_lo"),
                                    F.max("h").alias("_hi"))
    grid = bounds.select(
        "g", F.explode(F.sequence(F.col("_lo"), F.col("_hi")))
        .alias("t"))
    series = (grid.join(flags,
                        (grid["g"] == flags["g"])
                        & (grid["t"] == flags["h"]), "left")
              .select(grid["g"], "t",
                      F.coalesce(F.col("x"), F.lit(0)).alias("x"),
                      F.coalesce(F.col("y"), F.lit(0)).alias("y")))
    return transfer_entropy(series, ["g"])


def sql_transfer_entropy() -> str:
    def direction(drv: str, tgt: str, label: str) -> str:
        return f"""
SELECT c.g, '{label}' AS direction, MIN(c.n) AS n_trans,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list(CAST(c.c AS DOUBLE)
              * ln(CAST(c.c * c.cy AS DOUBLE)
                   / CAST(c.cyx * c.cyy AS DOUBLE))
              ORDER BY c.yp, c.yv, c.xv)),
         (p, q) -> p + q) / CAST(MIN(c.n) AS DOUBLE) AS te_nats
FROM (
  SELECT g, yp, yv, xv, c,
         CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n,
         CAST(SUM(c) OVER (PARTITION BY g, yv, xv) AS BIGINT) AS cyx,
         CAST(SUM(c) OVER (PARTITION BY g, yp, yv) AS BIGINT) AS cyy,
         CAST(SUM(c) OVER (PARTITION BY g, yv) AS BIGINT) AS cy
  FROM (
    SELECT g, yp, yv, xv, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
      SELECT g, {tgt} AS yv, {drv} AS xv,
             lead({tgt}) OVER (PARTITION BY g ORDER BY t) AS yp
      FROM series)
    WHERE yp IS NOT NULL GROUP BY 1, 2, 3, 4)) c
GROUP BY c.g"""

    return f"""WITH pres AS (
  SELECT ((user_id % 4) + 4) % 4 AS g,
         epoch_us(ts) // 3600000000 AS h, event_type
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
flags AS (
  SELECT g, h,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM pres GROUP BY 1, 2),
bounds AS (SELECT g, MIN(h) AS lo, MAX(h) AS hi FROM flags GROUP BY g),
grid AS (
  SELECT b.g, t.t
  FROM bounds b, LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS t) t),
series AS (
  SELECT grid.g, grid.t, coalesce(f.x, 0) AS x, coalesce(f.y, 0) AS y
  FROM grid LEFT JOIN flags f ON f.g = grid.g AND f.h = grid.t)
{direction('x', 'y', 'x->y')}
UNION ALL{direction('y', 'x', 'y->x')}"""


TEMPORAL_QUERIES["transfer_entropy"] = (q_transfer_entropy,
                                        sql_transfer_entropy)


_HOLT_H = 3


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend forecast of daily cents volume per event type
    (operators/temporal.py holt_forecast): dyadic α=1/4, β=1/8, the
    coupled recursion one pinned in-row fold; 1..3-day-ahead
    forecasts extend the fitted line."""
    from .operators.temporal import _us, holt_forecast
    from .geo.tilemath import floor_div

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.col("event_type").alias("g"),
                  floor_div(_us(F.col("ts")), 86_400_000_000)
                  .alias("d"),
                  _cents().alias("c")))
    daily = ev.groupBy("g", "d").agg(F.sum("c").alias("x"))
    return holt_forecast(daily, ["g"], order_cols=("d",),
                         value_col="x", horizon=_HOLT_H)


def sql_holt_forecast() -> str:
    # state rides a 2-slot DOUBLE list [l, b]: DuckDB's list_reduce
    # updates STRUCT accumulators field-by-field IN PLACE (a later
    # field reads the earlier field's NEW value — caught by this
    # gate); list accumulators copy
    lvl = "(a[1] + a[2] + 0.25 * (x[1] - a[1] - a[2]))"
    return f"""WITH e AS (
  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, d, CAST(SUM(c) AS BIGINT) AS x
  FROM e GROUP BY 1, 2),
ser AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         list(CAST(x AS DOUBLE) ORDER BY d) AS xs
  FROM daily GROUP BY g HAVING COUNT(*) >= 2),
fit AS (
  SELECT g, n,
         list_reduce(
           list_prepend([xs[1], xs[2] - xs[1]],
             list_transform(list_slice(xs, 2, len(xs)),
                            v -> [v, CAST(0.0 AS DOUBLE)])),
           (a, x) -> [{lvl},
                      a[2] + 0.125 * ({lvl} - a[1] - a[2])]) AS st
  FROM ser)
SELECT g, n, CAST(t.h AS INTEGER) AS h,
       st[1] AS level, st[2] AS trend,
       st[1] + CAST(t.h AS DOUBLE) * st[2] AS forecast
FROM fit, LATERAL (SELECT unnest(range(1, {_HOLT_H} + 1)) AS h) t"""


TEMPORAL_QUERIES["holt_forecast"] = (q_holt_forecast,
                                     sql_holt_forecast)


_WIS_QMOD = 64


def q_weighted_scheduling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal weighted interval scheduling per event type over hashed
    intervals (operators/temporal.py weighted_scheduling): exact
    int64 DP ladder in ONE in-row fold — the weighted counterpart of
    span_schedule's greedy count."""
    from .operators.temporal import weighted_scheduling

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.pmod(F.col("event_id"), F.lit(_WIS_QMOD)) == 0)
          .select(F.col("event_type").alias("g"),
                  F.pmod(F.col("event_id") * 7919, F.lit(5000))
                  .alias("s")))
    ev = ev.select("g", "s",
                   (F.col("s") + F.pmod(F.col("s") * 13, F.lit(300))
                    + 1).alias("e"),
                   (F.pmod(F.col("s") * 31, F.lit(97)) + 1).alias("w"))
    return weighted_scheduling(ev, ["g"], start_col="s", end_col="e",
                               weight_col="w")


def sql_weighted_scheduling() -> str:
    return f"""WITH e AS (
  SELECT event_type AS g,
         (event_id * 7919) % 5000 AS s
  FROM events WHERE event_id % {_WIS_QMOD} = 0),
iv AS (
  SELECT g, s, s + (s * 13) % 300 + 1 AS e2,
         (s * 31) % 97 + 1 AS w
  FROM e),
ser AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         list(CAST([e2, s, w] AS BIGINT[])
              ORDER BY e2, s, w) AS arr
  FROM iv GROUP BY g),
fin AS (
  SELECT g, n,
         list_reduce(
           list_prepend(CAST([0] AS BIGINT[]), arr),
           (a, x) -> list_append(a, greatest(
             a[len(a)],
             x[3] + a[len(list_filter(list_slice(arr, 1, len(a) - 1),
                                      q -> q[1] <= x[2])) + 1]))) AS dp
  FROM ser)
SELECT g, n, dp[len(dp)] AS best_weight FROM fin"""


TEMPORAL_QUERIES["weighted_scheduling"] = (q_weighted_scheduling,
                                           sql_weighted_scheduling)


_HW_M = 7
_HW_H = 7


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters over daily cents volume per event type
    (operators/temporal.py holt_winters): weekly season m=7, dyadic
    α=1/4 β=1/8 γ=1/4, the [t, ℓ, b, s₁..s₇] state one pinned in-row
    fold; 1..7-day-ahead forecasts carry the fitted seasonal
    pattern."""
    from .geo.tilemath import floor_div
    from .operators.temporal import _us, holt_winters

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.col("event_type").alias("g"),
                  floor_div(_us(F.col("ts")), 86_400_000_000)
                  .alias("d"),
                  _cents().alias("c")))
    daily = ev.groupBy("g", "d").agg(F.sum("c").alias("x"))
    return holt_winters(daily, ["g"], order_cols=("d",),
                        value_col="x", m=_HW_M, horizon=_HW_H)


def sql_holt_winters() -> str:
    m = _HW_M
    al, be, ga = 0.25, 0.125, 0.25
    l_new = (f"({al!r} * (x[1] - a[CAST(CAST(a[1] AS BIGINT) % {m} "
             f"AS INTEGER) + 4]) + {1.0 - al!r} * (a[2] + a[3]))")
    b_new = (f"({be!r} * ({l_new} - a[2]) + {1.0 - be!r} * a[3])")
    s_new = (f"({ga!r} * (x[1] - {l_new}) + {1.0 - ga!r}"
             f" * a[CAST(CAST(a[1] AS BIGINT) % {m} AS INTEGER) + 4])")
    seas = (f"list_transform(range(0, {m}), j -> "
            f"CASE WHEN j = CAST(a[1] AS BIGINT) % {m} THEN {s_new} "
            f"ELSE a[CAST(j AS INTEGER) + 4] END)")
    return f"""WITH e AS (
  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
daily AS (
  SELECT g, d, CAST(SUM(c) AS BIGINT) AS x FROM e GROUP BY 1, 2),
ser AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         list(CAST(x AS DOUBLE) ORDER BY d) AS xs
  FROM daily GROUP BY g HAVING COUNT(*) >= {2 * m}),
seed AS (
  SELECT g, n, xs,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_slice(xs, 1, {m})), (p, q) -> p + q)
           / {float(m)!r} AS l0
  FROM ser),
seed2 AS (
  SELECT g, n, xs, l0,
         (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_slice(xs, {m + 1}, {2 * m})), (p, q) -> p + q)
            / {float(m)!r} - l0) / {float(m)!r} AS b0
  FROM seed),
fit AS (
  SELECT g, n,
         list_reduce(
           list_prepend(
             list_concat([CAST({float(m)!r} AS DOUBLE), l0, b0],
               list_transform(range(0, {m}),
                 j -> xs[CAST(j AS INTEGER) + 1] - l0)),
             list_transform(list_slice(xs, {m + 1}, CAST(n AS INTEGER)),
                            v -> [v])),
           (a, x) -> list_concat([a[1] + 1.0, {l_new}, {b_new}],
                                 {seas})) AS st
  FROM seed2)
SELECT f.g, f.n, CAST(t.h AS INTEGER) AS h,
       st[2] AS level, st[3] AS trend,
       st[CAST((f.n + t.h - 1) % {m} AS INTEGER) + 4] AS seasonal,
       st[2] + CAST(t.h AS DOUBLE) * st[3]
         + st[CAST((f.n + t.h - 1) % {m} AS INTEGER) + 4] AS forecast
FROM fit f, LATERAL (SELECT unnest(range(1, {_HW_H} + 1)) AS h) t"""


TEMPORAL_QUERIES["holt_winters"] = (q_holt_winters, sql_holt_winters)


_MOTIF_W = 6


def q_ts_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global motif per event_type (operators/temporal.py
    series_motif): the closest non-overlapping pair of 6-hour windows
    of the hourly event-count series by raw integer d² — contiguity
    enforced through the lead chain, earliest pair on ties."""
    from .geo.tilemath import floor_div
    from .operators.temporal import series_motif

    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull()
                                       & F.col("value").isNotNull())
    # hourly cents sums, not counts: sparse hours make count windows
    # collapse to identical all-ones vectors (a vacuous d2=0 motif)
    hourly = (ev.select(
        "event_type",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  3_600_000_000).alias("h"),
        _cents().alias("cents"))
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("v")))
    return series_motif(hourly, ["event_type"], t_col="h", v_col="v",
                        w=_MOTIF_W)


def sql_ts_motif() -> str:
    w = _MOTIF_W
    leads = ",\n         ".join(
        f"LEAD(v, {k}) OVER wh AS a{k}" for k in range(1, w))
    d2 = " + ".join(f"(a.a{k} - b.a{k}) * (a.a{k} - b.a{k})"
                    for k in range(w))
    return f"""WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(SUM({_CENTS_SQL}) AS BIGINT) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
wins AS (
  SELECT event_type, h AS ta, v AS a0,
         {leads},
         LEAD(h, {w - 1}) OVER wh AS tend
  FROM hourly WINDOW wh AS (PARTITION BY event_type ORDER BY h)),
good AS (SELECT * FROM wins WHERE tend = ta + {w - 1}),
nw AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_windows
       FROM good GROUP BY 1),
pairs AS (
  SELECT a.event_type, {d2} AS d2, a.ta, b.ta AS tb
  FROM good a JOIN good b
    ON a.event_type = b.event_type AND b.ta >= a.ta + {w}),
best AS (
  SELECT event_type, d2, ta, tb FROM (
    SELECT event_type, d2, ta, tb,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY d2, ta, tb) AS rn
    FROM pairs) WHERE rn = 1)
SELECT b.event_type, nw.n_windows, b.ta AS t_a, b.tb AS t_b, b.d2
FROM best b JOIN nw USING (event_type)"""


TEMPORAL_QUERIES["ts_motif"] = (q_ts_motif, sql_ts_motif)


_KB_STEPS = 24   # gaps per series (25 distinct-second events)
_KB_BURST_LO = 9   # planted-burst gap window [lo, hi)
_KB_BURST_HI = 17


def q_burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg 2-state burst decode per event type
    (operators/temporal.py kleinberg_bursts): the first 25
    distinct-second event times per type, gaps decoded against
    base/burst exponential states with exact integer λ·x terms and
    µ-nat ln chains — the burst-interval primitive behind trending
    detection."""
    from .geo.tilemath import floor_div
    from .operators.temporal import kleinberg_bursts
    from pyspark.sql import Window as W

    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    secs = (ev.select(
        "event_type",
        floor_div(F.unix_micros(F.col("ts").cast("timestamp")),
                  1_000_000).alias("sec")).distinct())
    w = W.partitionBy("event_type").orderBy("sec")
    lim = (secs.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= _KB_STEPS + 1))
    # the synthetic stream is near-uniform (an all-quiet decode is
    # correct but vacuous) — compress the middle gaps 20x into a
    # deterministic planted burst, then re-cumulate
    wg = W.partitionBy("event_type").orderBy("rn")
    gap = F.lead("sec").over(w) - F.col("sec")
    adj = F.when((F.col("rn") >= _KB_BURST_LO)
                 & (F.col("rn") < _KB_BURST_HI),
                 floor_div(gap, 20) + 1).otherwise(gap)
    gaps = lim.select("event_type", "rn", adj.alias("adj"))         .filter(F.col("adj").isNotNull())
    t2 = (gaps.select(
        "event_type", "rn",
        F.sum("adj").over(wg.rowsBetween(W.unboundedPreceding, 0))
        .alias("t")))
    zero = lim.filter(F.col("rn") == 1).select(
        "event_type", F.lit(0).alias("rn"), F.lit(0).alias("t"))
    series = zero.unionByName(t2.select("event_type", "rn", "t"))
    return kleinberg_bursts(series.select("event_type", "t"),
                            ["event_type"], t_col="t",
                            steps=_KB_STEPS)


def sql_burst_detect() -> str:
    emit = ("((sc.n * gr.gap * (CASE WHEN st.s = 1 THEN 2 ELSE 1 END)"
            " * 1000000)"
            " - (sc.n * gr.gap * (CASE WHEN st.s = 1 THEN 2 ELSE 1 END)"
            " * 1000000) % sc.t_tot) // sc.t_tot"
            " - (CASE WHEN st.s = 0 THEN sc.ln0 ELSE sc.ln1 END)")
    cost = (f"p.cost + {emit} + CASE WHEN p.s = 0 AND st.s = 1"
            " THEN sc.tr ELSE 0 END")
    rounds = []
    for r in range(1, _KB_STEPS):
        rounds.append(f"""s{r} AS MATERIALIZED (
  SELECT g, s, cost, path FROM (
    SELECT p.g, st.s, {cost} AS cost,
           p.path || CAST(st.s AS VARCHAR) AS path,
           ROW_NUMBER() OVER (PARTITION BY p.g, st.s
             ORDER BY {cost},
                      p.path || CAST(st.s AS VARCHAR)) AS rn
    FROM s{r - 1} p
    JOIN gaps gr ON gr.g = p.g AND gr.r = {r}
    JOIN sc ON sc.g = p.g
    CROSS JOIN (VALUES (0), (1)) st(s)) WHERE rn = 1)""")
    chain = ",\n".join(rounds)
    e0 = emit.replace("gr.gap", "g0.gap")
    return f"""WITH secs AS (
  SELECT DISTINCT event_type AS g, epoch_us(ts) // 1000000 AS sec
  FROM events WHERE ts IS NOT NULL),
lim AS (
  SELECT g, sec,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY sec) AS rn
  FROM secs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY sec)
          <= {_KB_STEPS + 1}),
gaps AS (
  SELECT g, rn - 1 AS r,
         CASE WHEN rn >= {_KB_BURST_LO} AND rn < {_KB_BURST_HI}
              THEN (LEAD(sec) OVER wl - sec) // 20 + 1
              ELSE LEAD(sec) OVER wl - sec END AS gap
  FROM lim WINDOW wl AS (PARTITION BY g ORDER BY rn)
  QUALIFY gap IS NOT NULL),
sc AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap) AS BIGINT) AS t_tot,
         CAST(floor(ln((1.0 * COUNT(*))
                       / CAST(SUM(gap) AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS ln0,
         CAST(floor(ln((2.0 * COUNT(*))
                       / CAST(SUM(gap) AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS ln1,
         CAST(floor(ln(CAST(COUNT(*) AS DOUBLE)) * 1.0 * 1000000.0
                    + 0.5) AS BIGINT) AS tr
  FROM gaps GROUP BY 1
  HAVING COUNT(*) = {_KB_STEPS} AND SUM(gap) > 0),
s0 AS MATERIALIZED (
  SELECT g0.g, st.s,
         {e0} + CASE WHEN st.s = 1 THEN sc.tr ELSE 0 END AS cost,
         CAST(st.s AS VARCHAR) AS path
  FROM (SELECT * FROM gaps WHERE r = 0) g0
  JOIN sc ON sc.g = g0.g
  CROSS JOIN (VALUES (0), (1)) st(s)),
{chain}
SELECT g AS event_type, CAST({_KB_STEPS} AS BIGINT) AS n_gaps,
       cost AS total_cost_micro, path AS states,
       CAST(len(path) - len(replace(path, '1', '')) AS BIGINT)
         AS n_burst
FROM (
  SELECT g, cost, path,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY cost, path) AS rn
  FROM s{_KB_STEPS - 1}) WHERE rn = 1"""


TEMPORAL_QUERIES["burst_detect"] = (q_burst_detect, sql_burst_detect)
