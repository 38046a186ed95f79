"""Gate queries for the product-analytics operators
(operators/analytics.py): RFM quintile scoring, Markov transition
matrices, exact OLS trend slopes — plus the OHLC/VWAP bar resampler and
event-path sequence mining gates that share the exactness discipline.

Every gate carries a full value-hash DuckDB oracle; all windows have
TOTAL deterministic orderings and all money is integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.analytics import markov_transitions, rfm_scores, \
    trend_slope
from .queries_curation import _cents

_SQL_TOTAL_C = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintiles over the orders fact table (exact cents / whole
    days / NTILE with custkey tiebreaks — operators/analytics.py)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate",
        _cents("o_totalprice").alias("total_c"))
    return rfm_scores(o, "o_custkey", "o_orderdate", "total_c")


def sql_rfm_scores() -> str:
    return f"""WITH per AS (
  SELECT o_custkey AS cust,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
           AS r_days,
         COUNT(*) AS f,
         CAST(SUM({_SQL_TOTAL_C}) AS BIGINT) AS m_c
  FROM orders GROUP BY 1)
SELECT cust, r_days, f, m_c,
       NTILE(5) OVER (ORDER BY r_days DESC, cust) AS r_score,
       NTILE(5) OVER (ORDER BY f ASC, cust) AS f_score,
       NTILE(5) OVER (ORDER BY m_c ASC, cust) AS m_score
FROM per"""


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix over per-user sequences (LAG with
    the (ts, event_id) total order — operators/analytics.py)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type")
    return markov_transitions(ev, "user_id", "ts", "event_type",
                              tiebreak_col="event_id")


def sql_markov_transitions() -> str:
    return """WITH seq AS (
  SELECT user_id, event_type AS cur,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
c AS (SELECT prev, cur, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
SELECT c.prev, c.cur, c.n, t.n_from,
       CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM c JOIN t USING (prev)"""


_TREND_EPOCH = "2024-01-01"


def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily-count OLS trend, exact rational slope
    (operators/analytics.py trend_slope over day-indexed counts)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"),
                   F.lit(_TREND_EPOCH).cast("date")).alias("x"))
        .agg(F.count(F.lit(1)).alias("y")))
    return trend_slope(daily, "event_type", "x", "y")


def sql_trend_slope() -> str:
    return f"""WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{_TREND_EPOCH}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, COUNT(*) AS n_pts,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM daily GROUP BY 1)
SELECT event_type, n_pts,
       n_pts * sxy - sx * sy AS s_num,
       n_pts * sxx - sx * sx AS s_den,
       CASE WHEN n_pts * sxx - sx * sx > 0
            THEN CAST(n_pts * sxy - sx * sy AS DOUBLE)
                 / CAST(n_pts * sxx - sx * sx AS DOUBLE)
       END AS slope
FROM m"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC/VWAP bars per event type (operators/analytics.py
    ohlc_bars — single-groupBy struct-extreme open/close, exact
    cents)."""
    from .operators.analytics import ohlc_bars

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "ts", "event_id",
        F.datediff(F.col("ts").cast("date"),
                   F.lit(_TREND_EPOCH).cast("date")).alias("day"),
        _cents("value").alias("val_c"))
    return ohlc_bars(ev, "event_type", "day", "ts", "event_id", "val_c")


def sql_ohlc_bars() -> str:
    # independent algorithm: windowed row_number first/last instead of
    # the engine's struct-extreme fold
    return f"""WITH e AS (
  SELECT event_type,
         date_diff('day', DATE '{_TREND_EPOCH}', CAST(ts AS DATE)) AS day,
         epoch_us(ts) AS us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_c
  FROM events),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY us, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM e)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN val_c END) AS open_c,
       MAX(val_c) AS high_c, MIN(val_c) AS low_c,
       MAX(CASE WHEN rn_d = 1 THEN val_c END) AS close_c,
       COUNT(*) AS n, CAST(SUM(val_c) AS BIGINT) AS sum_c,
       CAST(SUM(val_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS vwap
FROM r GROUP BY 1, 2"""


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price/size Pareto frontier (operators/analytics.py
    skyline_2d — one-pass range-frame window; the oracle is the
    INDEPENDENT quadratic NOT-EXISTS dominance test)."""
    from .operators.analytics import skyline_2d

    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_brand", "p_partkey", "p_size",
        _cents("p_retailprice").alias("price_c"))
    return skyline_2d(p, "p_brand", "price_c", "p_size") \
        .select("p_brand", "p_partkey", "price_c", "p_size")


def sql_skyline_parts() -> str:
    return """WITH p AS (
  SELECT p_brand, p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part)
SELECT p_brand, p_partkey, price_c, p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_brand = a.p_brand
    AND b.price_c <= a.price_c AND b.p_size <= a.p_size
    AND (b.price_c < a.price_c OR b.p_size < a.p_size))"""


_PATH_N = 3
_PATH_MIN_SUPPORT = 5


def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step event paths per user (operators/analytics.py
    path_ngrams — LAG chain over the (ts, event_id) total order,
    distinct-user support ≥ 5)."""
    from .operators.analytics import path_ngrams

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type")
    return path_ngrams(ev, "user_id", "ts", "event_type", "event_id",
                       n=_PATH_N, min_support=_PATH_MIN_SUPPORT)


def sql_user_paths() -> str:
    return f"""WITH seq AS (
  SELECT user_id,
         LAG(event_type, 2) OVER w AS step_1,
         LAG(event_type, 1) OVER w AS step_2,
         event_type AS step_3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT step_1, step_2, step_3,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT user_id) AS n_keys
FROM seq WHERE step_1 IS NOT NULL
GROUP BY 1, 2, 3
HAVING COUNT(DISTINCT user_id) >= {_PATH_MIN_SUPPORT}"""


_DELTA_A = ("1999-01-01", "2000-01-01")
_DELTA_B = ("2000-01-01", "2001-01-01")


def q_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff via FULL OUTER join: per-customer revenue cents in
    two adjacent yearly windows, joined full-outer so NEW customers
    (no old row) and CHURNED customers (no new row) both survive, then
    classified.  The full-outer shape is the missing fourth corner of
    the engine's join surface (inner/semi/anti/left are gated
    elsewhere); plan-asserted FullOuter in tests/test_analytics.py.
    Exact cents; the two window aggregates shuffle once each on the
    customer key and the join reuses that partitioning."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", _cents("o_totalprice").alias("c"))

    def win(lo, hi, out):
        return (o.filter((F.col("o_orderdate") >= F.lit(lo))
                         & (F.col("o_orderdate") < F.lit(hi)))
                .groupBy("o_custkey")
                .agg(F.sum("c").alias(out)))

    a = win(*_DELTA_A, "rev_a_c")
    b = win(*_DELTA_B, "rev_b_c")
    j = a.join(b, "o_custkey", "full_outer")
    delta = (F.coalesce("rev_b_c", F.lit(0))
             - F.coalesce("rev_a_c", F.lit(0)))
    cls = (F.when(F.col("rev_a_c").isNull(), "new")
           .when(F.col("rev_b_c").isNull(), "churned")
           .when(delta > 0, "up")
           .when(delta < 0, "down")
           .otherwise("flat"))
    return j.select("o_custkey", "rev_a_c", "rev_b_c",
                    delta.alias("delta_c"), cls.alias("cls"))


def sql_revenue_delta() -> str:
    def win(lo, hi):
        return f"""(
  SELECT o_custkey,
         CAST(SUM({_SQL_TOTAL_C}) AS BIGINT) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{lo} 00:00:00'
    AND o_orderdate < TIMESTAMP '{hi} 00:00:00'
  GROUP BY 1)"""
    return f"""WITH a AS {win(*_DELTA_A)}, b AS {win(*_DELTA_B)}
SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
       a.rev AS rev_a_c, b.rev AS rev_b_c,
       COALESCE(b.rev, 0) - COALESCE(a.rev, 0) AS delta_c,
       CASE WHEN a.rev IS NULL THEN 'new'
            WHEN b.rev IS NULL THEN 'churned'
            WHEN b.rev > a.rev THEN 'up'
            WHEN b.rev < a.rev THEN 'down'
            ELSE 'flat' END AS cls
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey"""


def q_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the OLAP report shape
    between the gated ROLLUP (manifest_rollup) and CUBE (st_cube):
    exactly the four aggregation levels the report needs, one shuffle,
    no superfluous cube corners.  Exact counts/cents."""
    spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .createOrReplaceTempView("_gs_orders")
    return spark.sql(f"""
SELECT o_orderpriority, o_orderstatus,
       grouping_id(o_orderpriority, o_orderstatus) AS gid,
       COUNT(*) AS n,
       SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS sum_c
FROM _gs_orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus), ())""")


def sql_grouping_sets_report() -> str:
    return f"""SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM({_SQL_TOTAL_C}) AS BIGINT) AS sum_c
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                        (o_orderpriority, o_orderstatus), ())"""


_DECAY_SHIFT_CAP = 62


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed engagement scoring, EXACT: each event's cents
    halve per whole day of age (arithmetic shift ``cents >> days``, cap
    62), so the recency-weighted score is pure integer arithmetic — no
    pow()/exp() float chain (pow is not cross-engine bit-stable; the
    shift IS the half-life, documented granularity = 1 day).  Anchor =
    the data's max event date (deterministic).  One groupBy; the anchor
    is a 1-row broadcast."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("date").alias("d"),
        _cents("value").alias("c"))
    anchor = ev.agg(F.max("d").alias("_anchor"))
    days = F.least(F.datediff(F.col("_anchor"), F.col("d")),
                   F.lit(_DECAY_SHIFT_CAP))
    # python shiftright() only takes a literal bit count — the SQL form
    # shifts by a per-row column
    return (ev.crossJoin(F.broadcast(anchor))
            .select("user_id", "c", days.cast("int").alias("dd"))
            .select("user_id", "c",
                    F.expr("shiftright(c, dd)").alias("dec"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("c").alias("raw_c"),
                 F.sum("dec").alias("decayed_c")))


def sql_decayed_engagement() -> str:
    return f"""WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
anchor AS (SELECT MAX(d) AS a FROM e)
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(c) AS BIGINT) AS raw_c,
       CAST(SUM(c >> LEAST(date_diff('day', d, a),
                           {_DECAY_SHIFT_CAP})) AS BIGINT) AS decayed_c
FROM e, anchor
GROUP BY 1"""



def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust Theil-Sen trend over the same per-event-type daily counts
    as trend_slope (operators/rankstats.py theil_sen — exact rational
    median-of-pairwise-slopes, lower-median selection)."""
    from .operators.rankstats import theil_sen

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"),
                   F.lit(_TREND_EPOCH).cast("date")).alias("x"))
        .agg(F.count(F.lit(1)).alias("y")))
    return theil_sen(daily, ["event_type"], "x", "y")


def sql_theil_sen_slope() -> str:
    return f"""WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '{_TREND_EPOCH}', CAST(ts AS DATE)) AS x,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2),
n AS (SELECT event_type, COUNT(*) AS n_pts FROM daily GROUP BY 1),
p AS (
  SELECT a.event_type, CAST(b.y - a.y AS BIGINT) AS dy,
         CAST(b.x - a.x AS BIGINT) AS dx
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x),
r AS (
  SELECT event_type, dy, dx,
         CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), dy, dx)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM p)
SELECT r.event_type, n.n_pts, r.n_pairs, r.dy AS med_dy,
       r.dx AS med_dx, r.slope
FROM r JOIN n USING (event_type)
WHERE r.rn = (r.n_pairs + 1) // 2"""



_PARETO_K = 3


def q_pareto_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto top-k + (other) rollup per event type
    (operators/analytics.py pareto_topk — bounded report rows, total
    rank order (count DESC, key ASC), exact share division)."""
    from .operators.analytics import pareto_topk

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id")
    return pareto_topk(ev, ["event_type"], "user_id", _PARETO_K)


def sql_pareto_topk() -> str:
    return f"""
WITH cnt AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY c DESC, user_id ASC)
              <= {_PARETO_K}
              THEN CAST(user_id AS VARCHAR) ELSE '(other)' END AS label,
         c,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM cnt)
SELECT event_type, label, COUNT(*) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS cnt, MAX(total) AS total,
       CAST(SUM(c) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) AS share
FROM r GROUP BY 1, 2"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention triangle over orders
    (operators/analytics.py cohort_retention): exact integer months
    (y·12+m−1), DISTINCT (customer, month) as the only fact-sized
    shuffle, rate as the one pinned divide."""
    from .operators.analytics import cohort_retention

    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_custkey", "o_orderdate")
    return cohort_retention(o, "o_custkey", "o_orderdate")


def sql_cohort_retention() -> str:
    return """WITH act AS (
  SELECT DISTINCT o_custkey AS e,
         CAST(year(CAST(o_orderdate AS DATE)) * 12
              + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mon
  FROM orders WHERE o_orderdate IS NOT NULL),
m AS (SELECT e, mon, MIN(mon) OVER (PARTITION BY e) AS cohort FROM act),
a AS (SELECT cohort AS cohort_month, mon - cohort AS offset_months,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM m GROUP BY 1, 2)
SELECT cohort_month, offset_months, n_active,
       CAST(MAX(CASE WHEN offset_months = 0 THEN n_active END)
            OVER (PARTITION BY cohort_month) AS BIGINT) AS cohort_size,
       CAST(n_active AS DOUBLE)
         / CAST(MAX(CASE WHEN offset_months = 0 THEN n_active END)
                OVER (PARTITION BY cohort_month) AS DOUBLE) AS rate
FROM a"""


ANALYTICS_QUERIES = {
    "rfm_scores": (q_rfm_scores, sql_rfm_scores),
    "markov_transitions": (q_markov_transitions, sql_markov_transitions),
    "trend_slope": (q_trend_slope, sql_trend_slope),
    "theil_sen_slope": (q_theil_sen_slope, sql_theil_sen_slope),
    "pareto_topk": (q_pareto_topk, sql_pareto_topk),
    "ohlc_bars": (q_ohlc_bars, sql_ohlc_bars),
    "skyline_parts": (q_skyline_parts, sql_skyline_parts),
    "user_paths": (q_user_paths, sql_user_paths),
    "revenue_delta": (q_revenue_delta, sql_revenue_delta),
    "grouping_sets_report": (q_grouping_sets_report,
                             sql_grouping_sets_report),
    "decayed_engagement": (q_decayed_engagement, sql_decayed_engagement),
    "cohort_retention": (q_cohort_retention, sql_cohort_retention),
}


def q_ols2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature exact least squares (operators/stats.py ols2):
    cents ~ hour-of-day + day-of-week over events, per event type.
    Integer moment sums, DECIMAL(38) Cramer determinants, one pinned
    divide per coefficient.  dow is the portable (epoch_days+4)%7 —
    Spark's dayofweek() and DuckDB's disagree on origin."""
    from .operators.stats import ols2
    from .queries_curation import _cents

    us = F.expr("unix_micros(cast(ts as timestamp))")
    day = us - F.pmod(us, F.lit(86_400_000_000))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        (F.pmod(us, F.lit(86_400_000_000)) / F.lit(3_600_000_000))
        .cast("long").alias("hour"),
        F.pmod(day / F.lit(86_400_000_000) + 4, F.lit(7))
        .cast("long").alias("dow"),
        _cents().alias("cents"))
    return ols2(ev.filter(F.col("cents").isNotNull()),
                "hour", "dow", "cents", group_cols=["event_type"])


def sql_ols2() -> str:
    from .queries_curation import _CENTS_SQL

    def det3(rows):
        (a0, a1, a2), (b0, b1, b2), (d0, d1, d2) = rows
        def m(u, v):
            return f"CAST({u} AS HUGEINT) * CAST({v} AS HUGEINT)"
        return (f"(CAST({a0} AS HUGEINT) * ({m(b1, d2)} - {m(b2, d1)})"
                f" - CAST({a1} AS HUGEINT) * ({m(b0, d2)} - {m(b2, d0)})"
                f" + CAST({a2} AS HUGEINT) * ({m(b0, d1)} - {m(b1, d0)}))")

    det = det3([("n", "s1", "s2"), ("s1", "s11", "s12"),
                ("s2", "s12", "s22")])
    det0 = det3([("sy", "s1", "s2"), ("s1y", "s11", "s12"),
                 ("s2y", "s12", "s22")])
    det1 = det3([("n", "sy", "s2"), ("s1", "s1y", "s12"),
                 ("s2", "s2y", "s22")])
    det2 = det3([("n", "s1", "sy"), ("s1", "s11", "s1y"),
                 ("s2", "s12", "s2y")])
    return f"""
WITH b AS (
  -- ((a % m) + m) % m mirrors Spark's pmod: DuckDB's % follows the
  -- dividend's sign, which would split the gate on pre-1970 rows
  SELECT event_type,
         ((epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 + 86400000000)
          % 86400000000) // 3600000000 AS hour,
         (epoch_us(CAST(ts AS TIMESTAMP))
          - ((epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000
              + 86400000000) % 86400000000))
           // 86400000000 AS days,
         {_CENTS_SQL} AS cents
  FROM events),
f AS (SELECT event_type, hour,
             ((days + 4) % 7 + 7) % 7 AS dow, cents
      FROM b WHERE cents IS NOT NULL),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(hour) AS BIGINT) AS s1,
         CAST(SUM(dow) AS BIGINT) AS s2,
         CAST(SUM(hour*hour) AS BIGINT) AS s11,
         CAST(SUM(dow*dow) AS BIGINT) AS s22,
         CAST(SUM(hour*dow) AS BIGINT) AS s12,
         CAST(SUM(cents) AS BIGINT) AS sy,
         CAST(SUM(hour*cents) AS BIGINT) AS s1y,
         CAST(SUM(dow*cents) AS BIGINT) AS s2y
  FROM f GROUP BY 1)
SELECT event_type, n,
       CASE WHEN {det} <> 0
            THEN CAST({det0} AS DOUBLE) / CAST({det} AS DOUBLE) END AS b0,
       CASE WHEN {det} <> 0
            THEN CAST({det1} AS DOUBLE) / CAST({det} AS DOUBLE) END AS b1,
       CASE WHEN {det} <> 0
            THEN CAST({det2} AS DOUBLE) / CAST({det} AS DOUBLE) END AS b2
FROM m"""


ANALYTICS_QUERIES["ols2"] = (q_ols2, sql_ols2)


_TE_M = 20  # smoothing pseudo-count toward the global mean


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (operators/ml.py
    target_encode_loo): per-order smoothed priority→price feature.
    The encoding is an exact-integer rational with ONE pinned double
    division — bit-identical cross-engine, leakage-free by the LOO
    subtraction."""
    from .operators.ml import target_encode_loo
    from .queries_curation import _cents

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority",
        _cents("o_totalprice").alias("total_c"))
    return target_encode_loo(o, "o_orderpriority", "total_c",
                             id_cols=["o_orderkey"], prior_weight=_TE_M)


def sql_target_encode() -> str:
    m = _TE_M
    return f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders),
c AS (SELECT o_orderpriority, CAST(SUM(y) AS BIGINT) AS s_c,
             COUNT(*) AS n_c
      FROM o GROUP BY 1),
g AS (SELECT CAST(SUM(y) AS BIGINT) AS s_g, COUNT(*) AS n_g FROM o)
SELECT o.o_orderkey, o.o_orderpriority, o.y AS total_c,
       CASE WHEN n_c - 1 + {m} > 0 THEN
         CAST(CAST(s_c - o.y AS HUGEINT) * n_g
              + {m} * CAST(s_g AS HUGEINT) AS DOUBLE)
         / CAST(CAST(n_c - 1 + {m} AS HUGEINT) * n_g AS DOUBLE)
       END AS enc
FROM o JOIN c USING (o_orderpriority) CROSS JOIN g"""


_NB_FEATS = ["hour", "dow"]


def _nb_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.expr("unix_micros(cast(ts as timestamp))")
    day = us - F.pmod(us, F.lit(86_400_000_000))
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type",
        (F.pmod(us, F.lit(86_400_000_000)) / F.lit(3_600_000_000))
        .cast("long").alias("hour"),
        F.pmod(day / F.lit(86_400_000_000) + 4, F.lit(7))
        .cast("long").alias("dow"))


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical Naive Bayes confusion matrix (operators/ml.py
    naive_bayes_train/predict): hour/dow → event_type on the 80/20
    event_id-mod split.  Integer count model, flat ln-chain posterior
    (bit-stable), (score desc, class asc) argmax — the whole confusion
    matrix value-hashes cross-engine."""
    from .operators.ml import naive_bayes_predict, naive_bayes_train

    ev = _nb_events(spark, sf_dir)
    train = ev.filter(F.pmod(F.col("event_id"), F.lit(5)) != 0)
    test = ev.filter(F.pmod(F.col("event_id"), F.lit(5)) == 0)
    model = naive_bayes_train(train, "event_type", _NB_FEATS)
    pred = naive_bayes_predict(test, model, id_cols=["event_id"],
                               feature_cols=_NB_FEATS)
    truth = test.select("event_id", F.col("event_type").alias("truth"))
    return (pred.join(truth, "event_id")
            .groupBy(F.col("truth").alias("event_type"), "pred")
            .agg(F.count(F.lit(1)).alias("n")))


def sql_naive_bayes() -> str:
    return """
WITH ev AS (
  SELECT event_id, event_type,
         (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
           // 3600000000 AS hour,
         ((epoch_us(CAST(ts AS TIMESTAMP))
           - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
          // 86400000000 + 4) % 7 AS dow
  FROM events),
tr AS (SELECT * FROM ev WHERE event_id % 5 <> 0),
te AS (SELECT * FROM ev WHERE event_id % 5 = 0),
cls AS (SELECT event_type AS c, COUNT(*) AS n_c FROM tr GROUP BY 1),
v AS (SELECT COUNT(*) AS n, COUNT(DISTINCT event_type) AS nc,
             COUNT(DISTINCT hour) AS v0, COUNT(DISTINCT dow) AS v1
      FROM tr),
f0 AS (SELECT event_type AS c, hour AS val, COUNT(*) AS nf
       FROM tr GROUP BY 1, 2),
f1 AS (SELECT event_type AS c, dow AS val, COUNT(*) AS nf
       FROM tr GROUP BY 1, 2),
sc AS (
  SELECT te.event_id, te.event_type AS truth, cls.c,
         ln(CAST(cls.n_c + 1 AS DOUBLE) / CAST(v.n + v.nc AS DOUBLE))
         + ln(CAST(COALESCE(f0.nf, 0) + 1 AS DOUBLE)
              / CAST(cls.n_c + v.v0 AS DOUBLE))
         + ln(CAST(COALESCE(f1.nf, 0) + 1 AS DOUBLE)
              / CAST(cls.n_c + v.v1 AS DOUBLE)) AS score
  FROM te CROSS JOIN cls CROSS JOIN v
  LEFT JOIN f0 ON f0.c = cls.c AND f0.val = te.hour
  LEFT JOIN f1 ON f1.c = cls.c AND f1.val = te.dow),
p AS (
  SELECT event_id, truth, c AS pred,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY score DESC, c ASC) AS r
  FROM sc)
SELECT truth AS event_type, pred, COUNT(*) AS n
FROM p WHERE r = 1 GROUP BY 1, 2"""


ANALYTICS_QUERIES["target_encode"] = (q_target_encode, sql_target_encode)
ANALYTICS_QUERIES["naive_bayes"] = (q_naive_bayes, sql_naive_bayes)


_CUPED_SPLIT = "1998-01-01"


def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (operators/analytics.py cuped_adjust):
    per market segment, pre-period (H1) customer spend as the covariate
    for post-period (H2) spend — exact DECIMAL38 moments, pinned
    double θ/var/ρ² chain."""
    from .operators.analytics import cuped_adjust

    c = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    per = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_custkey",
                   F.col("o_orderdate").cast("timestamp").alias("d"),
                   c.alias("c"))
           .groupBy("o_custkey")
           .agg(F.sum(F.when(F.col("d") < split, F.col("c"))
                      .otherwise(0)).alias("x"),
                F.sum(F.when(F.col("d") >= split, F.col("c"))
                      .otherwise(0)).alias("y")))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment")
    units = per.join(F.broadcast(cust),
                     per["o_custkey"] == cust["c_custkey"])
    return cuped_adjust(units, ["c_mktsegment"], "x", "y")


def sql_cuped_adjust() -> str:
    cents = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    return f"""
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS TIMESTAMP)
                            < TIMESTAMP '{_CUPED_SPLIT}'
                       THEN {cents} ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(o_orderdate AS TIMESTAMP)
                            >= TIMESTAMP '{_CUPED_SPLIT}'
                       THEN {cents} ELSE 0 END) AS BIGINT) AS y
  FROM orders GROUP BY 1),
u AS (
  SELECT c_mktsegment, x, y
  FROM per JOIN customer ON c_custkey = o_custkey),
agg AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM u GROUP BY 1),
m AS (
  SELECT c_mktsegment, n,
         CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
         CAST(n AS HUGEINT) * syy - sy * sy AS vy,
         CAST(n AS HUGEINT) * sxy - sx * sy AS cov
  FROM agg)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
       CASE WHEN vx > 0
            THEN CAST(cov AS DOUBLE) / CAST(vx AS DOUBLE) END AS theta,
       CAST(vy AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         AS var_y,
       CASE WHEN vx > 0
            THEN (CAST(vy AS DOUBLE)
                  - CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)
                    / CAST(vx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
            ELSE CAST(vy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       END AS var_adj,
       CASE WHEN vx > 0 AND vy > 0
            THEN CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE)
                 / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
       END AS rho2
FROM m"""


ANALYTICS_QUERIES["cuped_adjust"] = (q_cuped_adjust, sql_cuped_adjust)


def q_auc_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected ROC-AUC per day-of-week (operators/metrics.py
    auc_score): does event value predict the purchase label?  The
    Mann-Whitney rank-sum form — exact integer 2U, one pinned
    division, no pairwise join."""
    from .operators.metrics import auc_score
    from .queries_curation import _cents

    us = F.expr("unix_micros(cast(ts as timestamp))")
    day = us - F.pmod(us, F.lit(86_400_000_000))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(day / F.lit(86_400_000_000) + 4, F.lit(7))
        .cast("long").alias("dow"),
        _cents().alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"))
    return auc_score(ev.filter(F.col("score").isNotNull()),
                     ["dow"], "score", "y")


def sql_auc_metric() -> str:
    from .queries_curation import _CENTS_SQL

    return f"""
WITH ev AS (
  SELECT ((epoch_us(CAST(ts AS TIMESTAMP))
           - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
          // 86400000000 + 4) % 7 AS dow,
         {_CENTS_SQL} AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
f AS (SELECT * FROM ev WHERE score IS NOT NULL),
r AS (
  SELECT dow, score, y,
         RANK() OVER (PARTITION BY dow ORDER BY score ASC) AS rlo,
         COUNT(*) OVER (PARTITION BY dow, score) AS ties
  FROM f),
agg AS (
  SELECT dow,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN y = 1 THEN 2 * rlo + ties - 1
                       ELSE 0 END) AS BIGINT) AS rsum2
  FROM r GROUP BY 1)
SELECT dow, n_pos, n_neg,
       CAST(rsum2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(rsum2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
FROM agg"""


ANALYTICS_QUERIES["auc_metric"] = (q_auc_metric, sql_auc_metric)


_ITEMCF_K = 5
_ITEMCF_MIN_COOC = 2
_ITEMCF_SCALE = 10**12


def q_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets
    (operators/cooccur.py item_item_topk): top-5 neighbors per part by
    exact-integer cosine² ranking on (order, part) co-occurrence."""
    from .operators.cooccur import item_item_topk

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_orderkey", "l_partkey")
    return item_item_topk(li, "l_orderkey", "l_partkey",
                          k=_ITEMCF_K, min_cooc=_ITEMCF_MIN_COOC,
                          scale=_ITEMCF_SCALE)


def sql_item_cf_topk() -> str:
    return f"""WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
pairs AS (
  SELECT a.i AS i_a, b.i AS i_b, CAST(count(*) AS BIGINT) AS n_ij
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING count(*) >= {_ITEMCF_MIN_COOC}),
freq AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
scored AS (
  SELECT p.i_a, p.i_b, p.n_ij,
         (p.n_ij * p.n_ij * CAST({_ITEMCF_SCALE} AS BIGINT))
           // (fa.n_i * fb.n_i) AS score_q
  FROM pairs p
  JOIN freq fa ON p.i_a = fa.i
  JOIN freq fb ON p.i_b = fb.i),
sym AS (
  SELECT i_a AS item, i_b AS neighbor, n_ij, score_q FROM scored
  UNION ALL
  SELECT i_b, i_a, n_ij, score_q FROM scored)
SELECT item, rank, neighbor, n_ij, score_q FROM (
  SELECT item, neighbor, n_ij, score_q,
         CAST(ROW_NUMBER() OVER (PARTITION BY item
                                 ORDER BY score_q DESC, neighbor)
              AS INT) AS rank
  FROM sym) WHERE rank <= {_ITEMCF_K}"""


ANALYTICS_QUERIES["item_cf_topk"] = (q_item_cf_topk, sql_item_cf_topk)


# F is invariant to integer shifts; centering near the corpus mean
# balance (~4500.00) keeps |S_g| and |S| inside anova_f's enforced
# int64 bounds at ANY scale factor (the uncentered grand sum crosses
# 3e9 already at sf0.1)
_ANOVA_CENTER_C = 450_000


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over customer account balances by market
    segment (operators/stats.py anova_f): exact int64 moment sums,
    per-group floor-div quantization, one pinned double chain; values
    centered on the fixed integer anchor 450000 cents (F-invariant)
    so the enforced sum bounds hold at every scale factor."""
    from .operators.stats import anova_f

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_mktsegment",
        (_cents("c_acctbal") - F.lit(_ANOVA_CENTER_C)).alias("bal_c"))
    return anova_f(c, "c_mktsegment", "bal_c")


def sql_anova_f() -> str:
    from .queries_curation import _CENTS_SQL
    bal = f"({_CENTS_SQL.replace('value', 'c_acctbal')}" \
        f" - {_ANOVA_CENTER_C})"
    return f"""WITH g AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(SUM({bal}) AS BIGINT) AS s_g,
         CAST(SUM({bal} * {bal}) AS BIGINT) AS q_g
  FROM customer GROUP BY 1),
t AS (SELECT n_g, s_g, q_g, (s_g * s_g) // n_g AS t_g FROM g),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q,
         CAST(SUM(t_g) AS BIGINT) AS t
  FROM t),
fin AS (
  SELECT n, k,
         GREATEST(CAST(0 AS BIGINT), t - (s * s) // n) AS ssb_q,
         q - t AS ssw_q
  FROM tot)
SELECT n, k, ssb_q, ssw_q,
       CASE WHEN k > 1 AND ssw_q > 0
            THEN (CAST(ssb_q AS DOUBLE) * CAST(n - k AS DOUBLE))
                 / (CAST(ssw_q AS DOUBLE) * CAST(k - 1 AS DOUBLE))
       END AS f_stat
FROM fin"""


ANALYTICS_QUERIES["anova_f"] = (q_anova_f, sql_anova_f)


_FD_CANDIDATES = (
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery profile (operators/analytics.py
    fd_profile): g3 error + violating-group counts for four candidate
    FDs across the relational tables, unioned into one report."""
    from .operators.analytics import fd_profile

    frames = []
    for table, lhs, rhs in _FD_CANDIDATES:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        frames.append(fd_profile(df, lhs, rhs))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def sql_fd_profile() -> str:
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
SELECT '{lhs}->{rhs}' AS fd,
       CAST(count(*) AS BIGINT) AS lhs_groups,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(rows_) AS BIGINT) AS n_rows,
       CAST(SUM(rows_ - maj) AS BIGINT) AS g3_del
FROM (
  SELECT {lhs}, count(*) AS n_rhs, SUM(c) AS rows_, MAX(c) AS maj
  FROM (SELECT {lhs}, {rhs}, CAST(count(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2)
  GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


ANALYTICS_QUERIES["fd_profile"] = (q_fd_profile, sql_fd_profile)


_FS_ANCHOR = "1994-12-26"           # Monday anchor (shared convention)
_FS_PRICE_BAND_C = 100_000          # |price diff| <= $1000 "close"


def q_er_fellegi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter link-weight calibration (operators/analytics.py
    fellegi_weights) on week-blocked order pairs: truth = same
    customer; features = priority equal / status equal / totalprice
    within $1000.  Exact counts, Laplace-smoothed weights as one
    pinned ln chain."""
    from .operators.analytics import fellegi_weights

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus",
        _cents("o_totalprice").alias("p"),
        F.expr(f"cast(datediff(cast(o_orderdate as date), "
               f"date'{_FS_ANCHOR}') as bigint) div 7").alias("wk"))
    a, b = o.alias("a"), o.alias("b")
    pairs = (a.join(b, (F.col("a.wk") == F.col("b.wk"))
                    & (F.col("a.o_orderkey") < F.col("b.o_orderkey")))
             .select(
                 (F.col("a.o_custkey") == F.col("b.o_custkey"))
                 .alias("match"),
                 (F.col("a.o_orderpriority")
                  == F.col("b.o_orderpriority")).alias("prio_eq"),
                 (F.col("a.o_orderstatus")
                  == F.col("b.o_orderstatus")).alias("status_eq"),
                 (F.abs(F.col("a.p") - F.col("b.p"))
                  <= _FS_PRICE_BAND_C).alias("price_close")))
    return fellegi_weights(pairs, "match",
                           ["prio_eq", "status_eq", "price_close"])


def sql_er_fellegi() -> str:
    from .queries_curation import _CENTS_SQL
    p = _CENTS_SQL.replace("value", "o_totalprice")
    return f"""WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
         {p} AS p,
         CAST(date_diff('day', DATE '{_FS_ANCHOR}',
                        CAST(o_orderdate AS DATE)) AS BIGINT) // 7
           AS wk
  FROM orders),
pairs AS (
  SELECT CASE WHEN a.o_custkey = b.o_custkey THEN 1 ELSE 0 END AS m,
         CASE WHEN a.o_orderpriority = b.o_orderpriority
              THEN 1 ELSE 0 END AS f_prio,
         CASE WHEN a.o_orderstatus = b.o_orderstatus
              THEN 1 ELSE 0 END AS f_status,
         CASE WHEN abs(a.p - b.p) <= {_FS_PRICE_BAND_C}
              THEN 1 ELSE 0 END AS f_price
  FROM o a JOIN o b ON a.wk = b.wk AND a.o_orderkey < b.o_orderkey),
tot AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n_m,
         CAST(COUNT(*) - SUM(m) AS BIGINT) AS n_u,
         CAST(SUM(m * f_prio) AS BIGINT) AS am_prio,
         CAST(SUM((1 - m) * f_prio) AS BIGINT) AS au_prio,
         CAST(SUM(m * f_status) AS BIGINT) AS am_status,
         CAST(SUM((1 - m) * f_status) AS BIGINT) AS au_status,
         CAST(SUM(m * f_price) AS BIGINT) AS am_price,
         CAST(SUM((1 - m) * f_price) AS BIGINT) AS au_price
  FROM pairs),
rows_ AS (
  SELECT 'prio_eq' AS feature, n_m, am_prio AS a_m, n_u,
         au_prio AS a_u FROM tot
  UNION ALL
  SELECT 'status_eq', n_m, am_status, n_u, au_status FROM tot
  UNION ALL
  SELECT 'price_close', n_m, am_price, n_u, au_price FROM tot)
SELECT feature, n_m AS n_match, a_m AS agree_match,
       n_u AS n_nonmatch, a_u AS agree_nonmatch,
       ln(CAST((a_m + 1) * (n_u + 2) AS DOUBLE)
          / CAST((n_m + 2) * (a_u + 1) AS DOUBLE)) AS weight
FROM rows_"""


ANALYTICS_QUERIES["er_fellegi"] = (q_er_fellegi, sql_er_fellegi)


_ZM_FILES = 64
_ZM_DAYS_PER_FILE = 30
_ZM_LO, _ZM_HI = "1997-03-01", "1997-03-31"


def q_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping report (operators/zonemap.py): per-file
    min/max of the ship day under TWO layouts — arrival-order proxy
    (orderkey mod 64) vs time-range partitioning (30-day files) — and
    the exact min-max skip counts for a one-month predicate.  The
    measured counterpart of the z-order/Hilbert layout operators."""
    import datetime as dt

    from .operators.zonemap import zone_map, zone_map_prune_report

    anchor = dt.date(1994, 12, 26)
    lo = (dt.date(1997, 3, 1) - anchor).days
    hi = (dt.date(1997, 3, 31) - anchor).days
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.expr("cast(datediff(cast(l_shipdate as date), "
               "date'1994-12-26') as bigint)").alias("ship_day"))
    out = None
    for layout, file_col in (
            ("hash", F.pmod(F.col("l_orderkey"), F.lit(_ZM_FILES))),
            ("time", F.expr(f"ship_day div {_ZM_DAYS_PER_FILE}"))):
        zm = zone_map(li.withColumn("file_id", file_col),
                      "file_id", "ship_day")
        rep = zone_map_prune_report(zm, lo, hi) \
            .select(F.lit(layout).alias("layout"), "n_files",
                    "n_pruned", "rows_total", "rows_skipped")
        out = rep if out is None else out.unionByName(rep)
    return out


def sql_zone_map_skip() -> str:
    import datetime as dt
    anchor = dt.date(1994, 12, 26)
    lo = (dt.date(1997, 3, 1) - anchor).days
    hi = (dt.date(1997, 3, 31) - anchor).days
    base = """
  SELECT {file_expr} AS file_id,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(ship_day) AS BIGINT) AS vmin,
         CAST(MAX(ship_day) AS BIGINT) AS vmax
  FROM (SELECT l_orderkey,
               CAST(date_diff('day', DATE '1994-12-26',
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                 AS ship_day
        FROM lineitem)
  GROUP BY 1"""
    rep = """
  SELECT '{layout}' AS layout,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(CASE WHEN vmax < {lo} OR vmin > {hi}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN vmax < {lo} OR vmin > {hi}
                       THEN n_rows ELSE 0 END) AS BIGINT)
           AS rows_skipped
  FROM ({zm})"""
    zm_hash = base.format(file_expr=f"l_orderkey % {_ZM_FILES}")
    zm_time = base.format(file_expr=f"ship_day // {_ZM_DAYS_PER_FILE}")
    return (rep.format(layout="hash", lo=lo, hi=hi, zm=zm_hash)
            + "\nUNION ALL\n"
            + rep.format(layout="time", lo=lo, hi=hi, zm=zm_time))


ANALYTICS_QUERIES["zone_map_skip"] = (q_zone_map_skip, sql_zone_map_skip)


_MI_DOWS = tuple(range(7))
_MI_VALBUCKETS = (0, 1, 2, 3)
_MI_LABELS = (0, 1)


def q_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-vs-label mutual information ranking
    (operators/analytics.py discrete_mi): I(day-of-week; purchase) and
    I(value-bucket; purchase) over the event stream — pinned category
    enumerations, exact cell counts, one flat pinned-order double
    fold per feature."""
    from .operators.analytics import discrete_mi

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.expr("cast(datediff(cast(ts as date), date'1994-12-26') "
               "as bigint) % 7").cast("int").alias("dow"),
        F.when(_cents() < 500, 0).when(_cents() < 1000, 1)
        .when(_cents() < 2000, 2).otherwise(3).alias("vb"),
        (F.col("event_type") == "purchase").cast("int").alias("y"))
    a = discrete_mi(ev, "dow", "y", _MI_DOWS, _MI_LABELS,
                    feature_name="dow")
    b = discrete_mi(ev, "vb", "y", _MI_VALBUCKETS, _MI_LABELS,
                    feature_name="value_bucket")
    return a.unionByName(b)


def sql_feature_mi() -> str:
    from .queries_curation import _CENTS_SQL

    def block(feature, xexpr, xs):
        cols = [f"CAST(COUNT(*) AS BIGINT) AS n"]
        for i, xv in enumerate(xs):
            cols.append(f"CAST(SUM(CASE WHEN x = {xv} THEN 1 ELSE 0 "
                        f"END) AS BIGINT) AS r_{i}")
        for j in (0, 1):
            cols.append(f"CAST(SUM(CASE WHEN y = {j} THEN 1 ELSE 0 "
                        f"END) AS BIGINT) AS c_{j}")
        for i, xv in enumerate(xs):
            for j in (0, 1):
                cols.append(
                    f"CAST(SUM(CASE WHEN x = {xv} AND y = {j} THEN 1 "
                    f"ELSE 0 END) AS BIGINT) AS k_{i}_{j}")
        terms = []
        for i in range(len(xs)):
            for j in (0, 1):
                terms.append(
                    f"(CASE WHEN k_{i}_{j} > 0 THEN "
                    f"(CAST(k_{i}_{j} AS DOUBLE) / CAST(n AS DOUBLE))"
                    f" * ln(CAST(k_{i}_{j} * n AS DOUBLE)"
                    f" / CAST(r_{i} * c_{j} AS DOUBLE)) "
                    f"ELSE 0.0 END)")
        # fold in the same left-to-right pinned order as the engine
        mi = terms[0]
        for t in terms[1:]:
            mi = f"({mi} + {t})"
        return f"""
SELECT '{feature}' AS feature, n, {mi} AS mi_nats FROM (
  SELECT {', '.join(cols)}
  FROM (SELECT {xexpr} AS x,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS y
        FROM events) t)"""

    dow = ("CAST(date_diff('day', DATE '1994-12-26', "
           "CAST(ts AS DATE)) AS BIGINT) % 7")
    c = _CENTS_SQL
    vb = (f"CASE WHEN {c} < 500 THEN 0 WHEN {c} < 1000 THEN 1 "
          f"WHEN {c} < 2000 THEN 2 ELSE 3 END")
    return (block("dow", dow, _MI_DOWS)
            + "\nUNION ALL\n"
            + block("value_bucket", vb, _MI_VALBUCKETS))


ANALYTICS_QUERIES["feature_mi"] = (q_feature_mi, sql_feature_mi)


def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between purchase and click event values
    (operators/stats.py welch_t): exact int64 moments + one flat
    pinned double expression."""
    from .operators.stats import welch_t

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents("value").alias("cents"))
    return welch_t(ev, "event_type", "cents", "purchase", "click")


def sql_welch_t() -> str:
    from .queries_curation import _CENTS_SQL
    return f"""WITH m AS (
  SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {_CENTS_SQL}
                  ELSE 0 END) AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN {_CENTS_SQL} * {_CENTS_SQL} ELSE 0 END)
              AS BIGINT) AS q_a,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                  END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN event_type = 'click' THEN {_CENTS_SQL}
                  ELSE 0 END) AS BIGINT) AS s_b,
         CAST(SUM(CASE WHEN event_type = 'click'
                  THEN {_CENTS_SQL} * {_CENTS_SQL} ELSE 0 END)
              AS BIGINT) AS q_b
  FROM events
  WHERE event_type IN ('purchase', 'click')),
d AS (
  SELECT n_a, s_a, n_a * q_a - s_a * s_a AS d_a,
         n_b, s_b, n_b * q_b - s_b * s_b AS d_b
  FROM m)
SELECT n_a, s_a, d_a, n_b, s_b, d_b,
       CASE WHEN n_a > 1 AND n_b > 1 AND (d_a > 0 OR d_b > 0)
            THEN ((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                  - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
                 / sqrt(CAST(d_a AS DOUBLE)
                        / ((CAST(n_a AS DOUBLE) - 1.0)
                           * (CAST(n_a AS DOUBLE)
                              * CAST(n_a AS DOUBLE)))
                        + CAST(d_b AS DOUBLE)
                          / ((CAST(n_b AS DOUBLE) - 1.0)
                             * (CAST(n_b AS DOUBLE)
                                * CAST(n_b AS DOUBLE))))
       END AS t
FROM d"""


ANALYTICS_QUERIES["welch_t"] = (q_welch_t, sql_welch_t)


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle over orders (operators/analytics.py
    cohort_ltv): first-order-month cohorts, exact cents revenue by
    month age with per-cohort cumulative sums."""
    from .operators.analytics import cohort_ltv

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", _cents("o_totalprice").alias("c"))
    return cohort_ltv(o, "o_custkey", "o_orderdate", "c")


def sql_cohort_ltv() -> str:
    from .queries_curation import _CENTS_SQL
    c = _CENTS_SQL.replace("value", "o_totalprice")
    return f"""WITH o AS (
  SELECT o_custkey AS cust,
         CAST((year(o_orderdate) - 1970) * 12
              + (month(o_orderdate) - 1) AS BIGINT) AS mo,
         {c} AS c
  FROM orders),
first_o AS (SELECT cust, MIN(mo) AS cohort FROM o GROUP BY 1),
sized AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
          FROM first_o GROUP BY 1),
agg AS (
  SELECT f.cohort, o.mo - f.cohort AS month_age,
         CAST(SUM(o.c) AS BIGINT) AS revenue_u
  FROM o JOIN first_o f ON o.cust = f.cust
  GROUP BY 1, 2)
SELECT a.cohort AS cohort_month, a.month_age, s.n_customers,
       a.revenue_u,
       CAST(SUM(a.revenue_u) OVER (PARTITION BY a.cohort
                                   ORDER BY a.month_age
                                   ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_revenue_u
FROM agg a JOIN sized s ON a.cohort = s.cohort"""


ANALYTICS_QUERIES["cohort_ltv"] = (q_cohort_ltv, sql_cohort_ltv)


_MSTAT_ITERS = 10
_MSTAT_SCALE = 10**12


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain
    (operators/analytics.py markov_stationary): exact scaled-integer
    power iteration over the markov_transitions counts — the
    pagerank determinism contract."""
    from .operators.analytics import markov_stationary, \
        markov_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type")
    tr = markov_transitions(ev, "user_id", "ts", "event_type",
                            tiebreak_col="event_id")
    return markov_stationary(tr, iters=_MSTAT_ITERS,
                             scale=_MSTAT_SCALE)


def _sql_mstat_ctes() -> "list[str]":
    """The shared stationary-π CTE chain (transitions + quantized
    power iteration) behind the markov_stationary AND
    markov_entropy_rate oracles — single definition."""
    s = _MSTAT_SCALE
    ctes = [f"""seq AS (
  SELECT user_id, event_type AS cur,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
c AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY 1),
e AS MATERIALIZED (
  SELECT c.prev AS state, c.cur AS dst, c.n AS n_ij, t.n_from AS n_i
  FROM c JOIN t USING (prev)),
states AS (SELECT DISTINCT state FROM (
  SELECT state FROM e UNION ALL SELECT dst FROM e)),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM states),
p0 AS MATERIALIZED (
  SELECT state,
         ({s} // ns.n)
         + CASE WHEN ROW_NUMBER() OVER (ORDER BY state) <= {s} % ns.n
                THEN 1 ELSE 0 END AS pi_q
  FROM states, ns)"""]
    for i in range(_MSTAT_ITERS):
        ctes.append(f"""p{i + 1} AS MATERIALIZED (
  SELECT state, CAST(SUM(m) AS BIGINT) AS pi_q FROM (
    SELECT e.dst AS state, (p.pi_q * e.n_ij) // e.n_i AS m
    FROM p{i} p JOIN e ON p.state = e.state
    UNION ALL
    SELECT p.state, p.pi_q FROM p{i} p
    WHERE p.state NOT IN (SELECT DISTINCT state FROM e))
  GROUP BY 1)""")
    return ctes


def sql_markov_stationary() -> str:
    return ("WITH " + ",\n".join(_sql_mstat_ctes())
            + f"\nSELECT state, CAST(pi_q AS BIGINT) AS pi_q"
              f" FROM p{_MSTAT_ITERS}")


ANALYTICS_QUERIES["markov_stationary"] = (q_markov_stationary,
                                          sql_markov_stationary)


_PSI_BUCKETS = (0, 1, 2, 3)
_PSI_SPLIT = "2024-01-15"


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-drift PSI between the first and second half-month of
    events over pinned value buckets (operators/analytics.py
    psi_drift): exact cell counts, smoothed pinned-order fold."""
    from .operators.analytics import psi_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("ts") < F.lit(_PSI_SPLIT), "a").otherwise("b")
        .alias("period"),
        F.when(_cents() < 500, 0).when(_cents() < 1000, 1)
        .when(_cents() < 2000, 2).otherwise(3).alias("vb"))
    return psi_drift(ev, "period", "vb", _PSI_BUCKETS, "a", "b")


def sql_psi_drift() -> str:
    from .queries_curation import _CENTS_SQL
    c = _CENTS_SQL
    vb = (f"CASE WHEN {c} < 500 THEN 0 WHEN {c} < 1000 THEN 1 "
          f"WHEN {c} < 2000 THEN 2 ELSE 3 END")
    k = len(_PSI_BUCKETS)
    cols = ["CAST(SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_a",
            "CAST(SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_b"]
    for i, bv in enumerate(_PSI_BUCKETS):
        cols.append(f"CAST(SUM(CASE WHEN period = 'a' AND vb = {bv} "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS a_{i}")
        cols.append(f"CAST(SUM(CASE WHEN period = 'b' AND vb = {bv} "
                    f"THEN 1 ELSE 0 END) AS BIGINT) AS b_{i}")
    terms = []
    for i in range(k):
        pa = f"(CAST(a_{i} + 1 AS DOUBLE) / CAST(n_a + {k} AS DOUBLE))"
        pb = f"(CAST(b_{i} + 1 AS DOUBLE) / CAST(n_b + {k} AS DOUBLE))"
        terms.append(f"(({pa} - {pb}) * ln({pa} / {pb}))")
    psi = terms[0]
    for t in terms[1:]:
        psi = f"({psi} + {t})"
    return f"""SELECT n_a, n_b, {psi} AS psi FROM (
  SELECT {', '.join(cols)}
  FROM (SELECT CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT} 00:00:00'
                    THEN 'a' ELSE 'b' END AS period,
               {vb} AS vb
        FROM events) t)"""


ANALYTICS_QUERIES["psi_drift"] = (q_psi_drift, sql_psi_drift)


_CK_BUCKETS = 64
_CK_SALT = "ck"


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive migration checksum of the lineitem table
    (operators/analytics.py table_checksum): 64 bucket rows + root,
    md5 row hashes, bit_xor folding — comparable with zero sorting."""
    from .operators.analytics import table_checksum

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return table_checksum(li, ["l_orderkey", "l_linenumber"],
                          n_buckets=_CK_BUCKETS, salt=_CK_SALT)


def sql_table_checksum() -> str:
    def enc(c):
        s = f"CAST({c} AS VARCHAR)"
        return (f"CASE WHEN {c} IS NULL THEN 'N' ELSE "
                f"CAST(length({s}) AS VARCHAR) || ':' || {s} END")

    h = (f"CAST(('0x' || substr(md5('{_CK_SALT}' || '|' || "
         f"{enc('l_orderkey')} || {enc('l_linenumber')}), "
         "1, 15)) AS BIGINT)")
    return f"""WITH hashed AS (
  SELECT {h} AS h, {h} % {_CK_BUCKETS} AS bucket FROM lineitem),
per AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(h) AS BIGINT) AS xor_hash
  FROM hashed GROUP BY 1)
SELECT bucket, n_rows, xor_hash FROM per
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(SUM(n_rows) AS BIGINT),
       CAST(bit_xor(xor_hash) AS BIGINT)
FROM per"""


ANALYTICS_QUERIES["table_checksum"] = (q_table_checksum,
                                       sql_table_checksum)


_DID_SPLIT = "2024-01-15"
_DID_USER_MOD = 3     # "treated" = user_id % 3 == 0 (deterministic arm)


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on event values (operators/
    analytics.py diff_in_diff): deterministic treatment arm
    (user_id mod 3), pre/post split mid-month, exact cell moments +
    one pinned chain."""
    from .operators.analytics import diff_in_diff

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.pmod(F.col("user_id"), _DID_USER_MOD) == 0, "t")
        .otherwise("c").alias("arm"),
        F.when(F.col("ts") < F.lit(_DID_SPLIT), "pre")
        .otherwise("post").alias("period"),
        _cents().alias("cents"))
    return diff_in_diff(ev, "arm", "period", "cents",
                        treat="t", pre="pre", post="post")


def sql_diff_in_diff() -> str:
    from .queries_curation import _CENTS_SQL
    cells = []
    for gname, gcond in (("t", f"user_id % {_DID_USER_MOD} = 0"),
                         ("c", f"user_id % {_DID_USER_MOD} <> 0")):
        for pname, pcond in (
                ("pre", f"ts < TIMESTAMP '{_DID_SPLIT} 00:00:00'"),
                ("post", f"ts >= TIMESTAMP '{_DID_SPLIT} 00:00:00'")):
            k = f"{gname}{pname}"
            cells.append(
                f"CAST(SUM(CASE WHEN {gcond} AND {pcond} THEN 1 "
                f"ELSE 0 END) AS BIGINT) AS n_{k}")
            cells.append(
                f"CAST(SUM(CASE WHEN {gcond} AND {pcond} THEN "
                f"{_CENTS_SQL} ELSE 0 END) AS BIGINT) AS s_{k}")
    m = lambda k: (f"(CAST(s_{k} AS DOUBLE) / CAST(n_{k} AS DOUBLE))")
    return f"""SELECT *,
       CASE WHEN n_tpre > 0 AND n_tpost > 0 AND n_cpre > 0
                 AND n_cpost > 0
            THEN ({m('tpost')} - {m('tpre')})
                 - ({m('cpost')} - {m('cpre')})
       END AS did
FROM (SELECT {', '.join(cells)} FROM events)"""


ANALYTICS_QUERIES["diff_in_diff"] = (q_diff_in_diff, sql_diff_in_diff)


def q_join_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-cardinality profile for lineitem⋈orders WITHOUT
    executing the join (operators/analytics.py join_size_stats):
    degree-product sums — the shuffle-sizing / skew-detection
    planner input."""
    from .operators.analytics import join_size_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return join_size_stats(li, o, "l_orderkey", "o_orderkey")


def sql_join_size_stats() -> str:
    return """WITH da AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS d_a
  FROM lineitem GROUP BY 1),
db_ AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS d_b
  FROM orders GROUP BY 1),
ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS keys_a,
              CAST(SUM(d_a) AS BIGINT) AS rows_a FROM da),
tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS keys_b,
              CAST(SUM(d_b) AS BIGINT) AS rows_b FROM db_),
jt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS matching_keys,
         CAST(COALESCE(SUM(d_a * d_b), 0) AS BIGINT) AS join_rows,
         CAST(COALESCE(MAX(d_a * d_b), 0) AS BIGINT) AS max_key_rows
  FROM da JOIN db_ USING (k))
SELECT keys_a, rows_a, keys_b, rows_b, matching_keys, join_rows,
       max_key_rows
FROM ta CROSS JOIN tb CROSS JOIN jt"""


ANALYTICS_QUERIES["join_size_stats"] = (q_join_size_stats,
                                        sql_join_size_stats)


# (child table, child col, parent table, parent col) — three true FKs
# of the star schema plus one deliberate NON-key reference (custkey
# against suppkey overlaps only where the id ranges intersect)
_IND_CANDIDATES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "supplier", "s_suppkey"),
)


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (foreign-key) discovery profile
    (operators/analytics.py inclusion_profile): distinct-set
    containment for four candidate references across the relational
    tables — the three true FKs read 1.0, the planted non-key reads
    its true partial overlap.  Exact counts; one distinct-sized join
    per candidate."""
    from .operators.analytics import inclusion_profile

    frames = []
    for ct, cc, pt, pc in _IND_CANDIDATES:
        child = spark.read.parquet(f"{sf_dir}/{ct}.parquet")
        parent = spark.read.parquet(f"{sf_dir}/{pt}.parquet")
        frames.append(inclusion_profile(
            child, cc, parent, pc, ind_name=f"{ct}.{cc}->{pt}.{pc}"))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def sql_fk_discovery() -> str:
    parts = []
    for ct, cc, pt, pc in _IND_CANDIDATES:
        parts.append(f"""
SELECT '{ct}.{cc}->{pt}.{pc}' AS ind,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_matched,
       CAST(SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       CASE WHEN COUNT(*) > 0
            THEN CAST(SUM(CASE WHEN hit IS NULL THEN 0 ELSE 1 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       END AS containment
FROM (
  SELECT c.v, p.hit FROM
    (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) c
  LEFT JOIN
    (SELECT DISTINCT {pc} AS v, 1 AS hit FROM {pt}
     WHERE {pc} IS NOT NULL) p
  ON c.v = p.v)""")
    return "\nUNION ALL\n".join(parts)


ANALYTICS_QUERIES["fk_discovery"] = (q_fk_discovery, sql_fk_discovery)


# (table, columns) — two true keys, two non-keys, one composite
_KEY_CANDIDATES = (
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("lineitem", ("l_orderkey",)),
    ("customer", ("c_nationkey",)),
    ("events", ("user_id",)),
)


def q_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery profile (operators/analytics.py
    key_profile): exact uniqueness verdicts plus duplication volume
    and worst-group multiplicity for five column combinations — the
    schema-discovery sibling of fd_profile/fk_discovery on one
    map-side-combinable groupBy per candidate."""
    from .operators.analytics import key_profile

    frames = []
    for table, cols in _KEY_CANDIDATES:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        frames.append(key_profile(
            df, list(cols), key_name=f"{table}({','.join(cols)})"))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def sql_key_discovery() -> str:
    parts = []
    for table, cols in _KEY_CANDIDATES:
        name = f"{table}({','.join(cols)})"
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        collist = ", ".join(cols)
        parts.append(f"""
SELECT '{name}' AS key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {table})
         - CAST(SUM(c) AS BIGINT) AS null_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_rows,
       CAST(MAX(c) AS BIGINT) AS max_group,
       SUM(c) = COUNT(*) AS is_key
FROM (
  SELECT {collist}, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} WHERE {notnull} GROUP BY {collist})""")
    return "\nUNION ALL\n".join(parts)


ANALYTICS_QUERIES["key_discovery"] = (q_key_discovery,
                                      sql_key_discovery)


def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-level decision-tree split search (operators/ml.py
    decision_stump): label = purchase event, integer features = hour
    of day and kilocent value bucket; per feature the best Gini
    threshold from prefix sums over the distinct-value table, argmax
    pinned by (S DESC, thr ASC)."""
    from .geo.tilemath import floor_div
    from .operators.ml import decision_stump

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        floor_div(F.pmod(us, F.lit(86_400_000_000)),
                  3_600_000_000).alias("hour"),
        floor_div(_cents(), F.lit(1000)).alias("centsk"))
    return decision_stump(ev, ["hour", "centsk"], "y")


def sql_decision_stump() -> str:
    return """WITH e AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS centsk
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
lng AS (
  SELECT 'hour' AS f, hour AS x, y FROM e
  UNION ALL SELECT 'centsk' AS f, centsk AS x, y FROM e),
vals AS (
  SELECT f, x, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(y) AS BIGINT) AS p
  FROM lng GROUP BY 1, 2),
cand AS (
  SELECT f, x AS thr,
         CAST(SUM(c) OVER (PARTITION BY f ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_left,
         CAST(SUM(p) OVER (PARTITION BY f ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS pos_left,
         CAST(SUM(c) OVER (PARTITION BY f) AS BIGINT) AS n,
         CAST(SUM(p) OVER (PARTITION BY f) AS BIGINT) AS ptot,
         MAX(x) OVER (PARTITION BY f) AS xmax
  FROM vals),
scored AS (
  SELECT f, thr, n_left, pos_left,
         n - n_left AS n_right, ptot - pos_left AS pos_right,
         n, ptot,
         CAST(pos_left * pos_left
              + (n_left - pos_left) * (n_left - pos_left) AS DOUBLE)
           / CAST(n_left AS DOUBLE)
         + CAST((ptot - pos_left) * (ptot - pos_left)
                + ((n - n_left) - (ptot - pos_left))
                  * ((n - n_left) - (ptot - pos_left)) AS DOUBLE)
           / CAST(n - n_left AS DOUBLE) AS s
  FROM cand WHERE thr < xmax),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY f
                               ORDER BY s DESC, thr ASC) AS rn
  FROM scored)
SELECT f AS feature, thr, n_left, pos_left, n_right, pos_right,
       (CAST(n AS DOUBLE) - s) / CAST(n AS DOUBLE) AS gini_split,
       CAST(1.0 AS DOUBLE)
         - CAST(ptot * ptot + (n - ptot) * (n - ptot) AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_root
FROM best WHERE rn = 1"""


ANALYTICS_QUERIES["decision_stump"] = (q_decision_stump,
                                       sql_decision_stump)


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (operators/ml.py calibration_bins):
    integer milli-score from the value magnitude, label = purchase —
    exact long bin counts/positives/score sums, two pinned divides per
    bin."""
    from .geo.tilemath import floor_div
    from .operators.ml import calibration_bins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.lit(999),
                floor_div(_cents(), F.lit(49))).alias("score_milli"))
    return calibration_bins(ev, "score_milli", "y")


def sql_calibration_bins() -> str:
    return """WITH e AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         LEAST(999, CAST(floor(value * 100 + 0.5) AS BIGINT) // 49)
           AS s
  FROM events WHERE value IS NOT NULL),
agg AS (
  SELECT (s * 10) // 1000 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(s) AS BIGINT) AS sum_score
  FROM e GROUP BY 1)
SELECT bin, n, pos, sum_score,
       CAST(sum_score AS DOUBLE) / CAST(n * 1000 AS DOUBLE)
         AS mean_score,
       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
FROM agg"""


ANALYTICS_QUERIES["calibration_bins"] = (q_calibration_bins,
                                         sql_calibration_bins)


def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of price↔quantity controlling for discount,
    per return flag (operators/stats.py partial_corr): DECIMAL(38)
    n-scaled moments, each r one pinned √-of-product chain — the
    "is the association real or confounded" screen."""
    from .operators.stats import partial_corr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long").alias("disc_pts"))
    return partial_corr(li, ["l_returnflag"], "price_c", "qty",
                        "disc_pts")


def sql_partial_corr() -> str:
    corr = ("CASE WHEN {aa} > 0 AND {bb} > 0 THEN CAST({ab} AS DOUBLE)"
            " / sqrt(CAST({aa} AS DOUBLE) * CAST({bb} AS DOUBLE)) END")
    rxy = corr.format(ab="sxy", aa="sxx", bb="syy")
    rxz = corr.format(ab="sxz", aa="sxx", bb="szz")
    ryz = corr.format(ab="syz", aa="syy", bb="szz")
    return f"""
WITH r AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
  FROM lineitem),
agg AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(z) AS HUGEINT) AS sz,
         CAST(SUM(x * x) AS HUGEINT) AS xx,
         CAST(SUM(y * y) AS HUGEINT) AS yy,
         CAST(SUM(z * z) AS HUGEINT) AS zz,
         CAST(SUM(x * y) AS HUGEINT) AS xy,
         CAST(SUM(x * z) AS HUGEINT) AS xz,
         CAST(SUM(y * z) AS HUGEINT) AS yz
  FROM r GROUP BY 1),
m AS (
  SELECT g, n,
         n * xx - sx * sx AS sxx, n * yy - sy * sy AS syy,
         n * zz - sz * sz AS szz, n * xy - sx * sy AS sxy,
         n * xz - sx * sz AS sxz, n * yz - sy * sz AS syz
  FROM agg),
c AS (
  SELECT g, CAST(n AS BIGINT) AS n,
         {rxy} AS r_xy, {rxz} AS r_xz, {ryz} AS r_yz
  FROM m)
SELECT g AS l_returnflag, n, r_xy, r_xz, r_yz,
       CASE WHEN r_xy IS NOT NULL AND r_xz IS NOT NULL
             AND r_yz IS NOT NULL
             AND (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 0
            THEN (r_xy - r_xz * r_yz)
                 / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz))
            END AS r_xy_z
FROM c"""


ANALYTICS_QUERIES["partial_corr"] = (q_partial_corr, sql_partial_corr)


def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-deviation outlier statistic of event value cents
    per event type (operators/stats.py grubbs_test): exact DECIMAL(38)
    deviations |n·x − Σx|, deterministic (dev, value, id) argmax, one
    pinned √-chain for G."""
    from .operators.stats import grubbs_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", _cents().alias("cents"))
    return grubbs_test(ev, ["event_type"], "cents", "event_id")


def sql_grubbs_outlier() -> str:
    from .queries_curation import _CENTS_SQL

    return f"""
WITH e AS (
  SELECT event_type AS g, event_id, {_CENTS_SQL} AS x FROM events),
mom AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM e GROUP BY 1),
j AS (
  SELECT e.g, abs(mom.n * CAST(e.x AS HUGEINT) - mom.sx) AS dev,
         e.x, e.event_id, mom.n, mom.sx, mom.sxx
  FROM e JOIN mom ON mom.g = e.g),
best AS (
  SELECT g, MAX(struct_pack(dev := dev, x := x, tb := event_id)) AS m,
         MAX(n) AS n, MAX(sx) AS sx, MAX(sxx) AS sxx
  FROM j GROUP BY 1)
SELECT g AS event_type, CAST(n AS BIGINT) AS n,
       CAST(m.x AS BIGINT) AS x_out,
       CASE WHEN n >= 3 AND n * sxx - sx * sx > 0 THEN
         CAST(m.dev AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n AS DOUBLE)
                  / CAST(n - 1 AS DOUBLE)) END AS g_stat
FROM best"""


ANALYTICS_QUERIES["grubbs_outlier"] = (q_grubbs_outlier,
                                       sql_grubbs_outlier)


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment isotonic (PAVA) calibration curve (operators/ml.py
    isotonic_fit): P(returnflag = R) vs quantity bin per supplier
    segment, fitted through the exact minimax characterization —
    integer prefix sums, one correctly-rounded divide per candidate,
    bit-identical to the oracle's pair-table + two-window replay."""
    from .operators.ml import isotonic_fit

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select(
        F.pmod(F.col("l_suppkey"), F.lit(6)).cast("int").alias("seg"),
        F.col("l_quantity").cast("int").alias("qty"),
        (F.col("l_returnflag") == "R").cast("int").alias("flag"))
    return isotonic_fit(df, "seg", "qty", "flag")


def sql_isotonic_calibration() -> str:
    return """WITH b AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS seg,
         CAST(l_quantity AS INT) AS qty,
         COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS sum_y
  FROM lineitem GROUP BY 1, 2),
o AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY qty) AS k,
         SUM(sum_y) OVER (PARTITION BY seg ORDER BY qty) AS s,
         SUM(n) OVER (PARTITION BY seg ORDER BY qty) AS c
  FROM b),
pairs AS (
  SELECT a.seg, a.k AS i, p.k AS j,
         CAST(p.s - a.s + a.sum_y AS DOUBLE)
           / CAST(p.c - a.c + a.n AS DOUBLE) AS v
  FROM o a JOIN o p ON p.seg = a.seg AND p.k >= a.k),
rmin AS (
  SELECT seg, i, j,
         MIN(v) OVER (PARTITION BY seg, i ORDER BY j DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS m
  FROM pairs),
f2 AS (
  SELECT seg, j AS k, i,
         MAX(m) OVER (PARTITION BY seg, j ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS f
  FROM rmin)
SELECT o.seg, o.qty, o.n, o.sum_y,
       CAST(o.sum_y AS DOUBLE) / CAST(o.n AS DOUBLE) AS rate,
       f2.f AS fit
FROM f2 JOIN o ON o.seg = f2.seg AND o.k = f2.k
WHERE f2.i = f2.k"""


ANALYTICS_QUERIES["isotonic_calibration"] = (q_isotonic_calibration,
                                             sql_isotonic_calibration)


_SLOPE1_K = 3
_SLOPE1_MIN_C = 2
_SLOPE1_SCALE = 1_000_000
_SLOPE1_UMOD = 50           # predict for every 50th customer


def q_slope_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Slope-One recommendations (operators/cooccur.py
    slope_one_topk): customer×part ratings from max order quantity,
    telescoped exact-rational predictions (pred_num/pred_den longs, no
    per-pair division), top-3 unseen parts per sampled customer."""
    from .operators.cooccur import slope_one_topk

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rat = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .groupBy(F.col("o_custkey").alias("cust"),
                    F.col("l_partkey").alias("part"))
           .agg(F.max("l_quantity").cast("long").alias("r")))
    return slope_one_topk(
        rat, "cust", "part", "r", k=_SLOPE1_K,
        min_support=_SLOPE1_MIN_C, scale=_SLOPE1_SCALE,
        predict_filter=F.pmod(F.col("cust"), F.lit(_SLOPE1_UMOD)) == 0)


def sql_slope_one() -> str:
    return f"""WITH rat AS (
  SELECT o.o_custkey AS u, l.l_partkey AS i,
         CAST(MAX(l.l_quantity) AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
devs AS (
  SELECT a.i AS j, b.i AS i, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(a.r - b.r) AS BIGINT) AS sum_diff
  FROM rat a JOIN rat b ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {_SLOPE1_MIN_C}),
probe AS (SELECT * FROM rat WHERE u % {_SLOPE1_UMOD} = 0),
cand AS (
  SELECT p.u AS usr, d.j AS item,
         CAST(SUM(d.sum_diff + p.r * d.c) AS BIGINT) AS pred_num,
         CAST(SUM(d.c) AS BIGINT) AS pred_den
  FROM probe p JOIN devs d ON d.i = p.i
  GROUP BY 1, 2),
unseen AS (
  SELECT c.* FROM cand c
  LEFT JOIN probe p ON p.u = c.usr AND p.i = c.item
  WHERE p.u IS NULL),
scored AS (
  SELECT usr, item, pred_num, pred_den,
         (pred_num * {_SLOPE1_SCALE}
          - (((pred_num * {_SLOPE1_SCALE}) % pred_den) + pred_den)
            % pred_den) // pred_den AS score_q
  FROM unseen)
SELECT usr AS "user", rank, item, pred_num, pred_den, score_q FROM (
  SELECT usr, item, pred_num, pred_den, score_q,
         CAST(ROW_NUMBER() OVER (PARTITION BY usr
                                 ORDER BY score_q DESC, item)
              AS INT) AS rank
  FROM scored) WHERE rank <= {_SLOPE1_K}"""


ANALYTICS_QUERIES["slope_one"] = (q_slope_one, sql_slope_one)


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall threshold sweep per weekday (operators/
    metrics.py pr_curve): does event value predict the purchase
    label, and where to cut?  Scores bucketed to whole currency units
    (cents div 100) so the curve is O(distinct units); tp/fp/fn exact
    longs, precision/recall/F1 one pinned division each."""
    from .operators.metrics import pr_curve
    from .queries_curation import _cents

    us = F.expr("unix_micros(cast(ts as timestamp))")
    day = us - F.pmod(us, F.lit(86_400_000_000))
    cents = _cents()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(day / F.lit(86_400_000_000) + 4, F.lit(7))
        .cast("long").alias("dow"),
        ((cents - F.pmod(cents, F.lit(100))) / F.lit(100))
        .cast("long").alias("unit"),
        (F.col("event_type") == "purchase").cast("long").alias("y"))
    return pr_curve(ev.filter(F.col("unit").isNotNull()),
                    ["dow"], "unit", "y")


def sql_pr_curve() -> str:
    from .queries_curation import _CENTS_SQL

    return f"""
WITH ev AS (
  SELECT ((epoch_us(CAST(ts AS TIMESTAMP))
           - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000)
          // 86400000000 + 4) % 7 AS dow,
         ({_CENTS_SQL}) // 100 AS unit,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
pts AS (
  SELECT dow, unit AS threshold,
         CAST(SUM(y) AS BIGINT) AS p,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n
  FROM ev WHERE unit IS NOT NULL GROUP BY 1, 2),
cur AS (
  SELECT dow, threshold,
         CAST(SUM(p) OVER (PARTITION BY dow ORDER BY threshold DESC)
              AS BIGINT) AS tp,
         CAST(SUM(n) OVER (PARTITION BY dow ORDER BY threshold DESC)
              AS BIGINT) AS fp,
         CAST(SUM(p) OVER (PARTITION BY dow) AS BIGINT) AS pos
  FROM pts)
SELECT dow, threshold, tp, fp, pos - tp AS fn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)
            / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE)
            / CAST(pos AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + (pos - tp) > 0
            THEN CAST(2 * tp AS DOUBLE)
                 / CAST(2 * tp + fp + (pos - tp) AS DOUBLE)
       END AS f1
FROM cur"""


ANALYTICS_QUERIES["pr_curve"] = (q_pr_curve, sql_pr_curve)


def q_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type median imputation of a deterministically-holed cents
    column (operators/ml.py median_impute): every 7th event's value is
    masked, the fill is the group's exact lower median (order
    statistic, never interpolated), with the was_imputed flag."""
    from .operators.ml import median_impute

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type",
        F.when(F.pmod(F.col("event_id"), F.lit(7)) != 0, _cents())
        .alias("cents"))
    return median_impute(ev, ["event_type"], "cents")


def sql_median_impute() -> str:
    return """WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 <> 0
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
         END AS cents
  FROM events),
nn AS (
  SELECT event_type, cents AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents NULLS FIRST) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e WHERE cents IS NOT NULL),
med AS (SELECT event_type, v AS m
        FROM nn WHERE rn = (n * 50 + 99) // 100)
SELECT e.event_id, e.event_type, e.cents,
       COALESCE(e.cents, med.m) AS cents_filled,
       CAST(CASE WHEN e.cents IS NULL AND med.m IS NOT NULL
                 THEN 1 ELSE 0 END AS INTEGER) AS was_imputed
FROM e LEFT JOIN med USING (event_type)"""


ANALYTICS_QUERIES["median_impute"] = (q_median_impute,
                                      sql_median_impute)


_QBIN_K = 4


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency value binning per event type (operators/ml.py
    quantile_bins): qcut with min-rank tie sharing — bin =
    (rank−1)·k div n + 1, pure integer, one rank window."""
    from .operators.ml import quantile_bins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", _cents().alias("cents"))
    return quantile_bins(ev, ["event_type"], "cents", k=_QBIN_K)


def sql_quantile_bins() -> str:
    return f"""WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_id, event_type, cents,
         RANK() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e)
SELECT event_id, event_type, cents,
       CAST((rk - 1) * {_QBIN_K} // n + 1 AS BIGINT) AS bin
FROM r"""


ANALYTICS_QUERIES["quantile_bins"] = (q_quantile_bins,
                                      sql_quantile_bins)


def q_cohen_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges g effect size, purchase vs click values
    (operators/stats.py cohen_d): exact int64 moments, pooled-SD
    flat pinned chain — the magnitude companion of the welch_t
    gate."""
    from .operators.stats import cohen_d

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", _cents("value").alias("cents"))
    return cohen_d(ev, "event_type", "cents", "purchase", "click")


def sql_cohen_d() -> str:
    return """WITH e AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')),
agg AS (
  SELECT CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN g = 'purchase' THEN x ELSE 0 END)
              AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN g = 'purchase' THEN x * x ELSE 0 END)
              AS BIGINT) AS q_a,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN g = 'click' THEN x ELSE 0 END)
              AS BIGINT) AS s_b,
         CAST(SUM(CASE WHEN g = 'click' THEN x * x ELSE 0 END)
              AS BIGINT) AS q_b
  FROM e),
m AS (
  SELECT n_a, s_a, CAST(n_a * q_a - s_a * s_a AS BIGINT) AS d_a,
         n_b, s_b, CAST(n_b * q_b - s_b * s_b AS BIGINT) AS d_b
  FROM agg)
SELECT n_a, s_a, d_a, n_b, s_b, d_b,
       CASE WHEN n_a + n_b > 2 AND (d_a > 0 OR d_b > 0)
            THEN (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(d_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                         + CAST(d_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                           - 2.0))
       END AS cohen_d,
       CASE WHEN n_a + n_b > 2 AND (d_a > 0 OR d_b > 0)
            THEN (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE)
                                      + CAST(n_b AS DOUBLE) - 2.0)
                               - 1.0))
                 * ((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                     - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                    / sqrt((CAST(d_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            + CAST(d_b AS DOUBLE)
                              / CAST(n_b AS DOUBLE))
                           / (CAST(n_a AS DOUBLE)
                              + CAST(n_b AS DOUBLE) - 2.0)))
       END AS hedges_g
FROM m"""


ANALYTICS_QUERIES["cohen_d"] = (q_cohen_d, sql_cohen_d)


_WS_TILES = 4


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-window API surface in one gate: percent_rank, cume_dist
    and NTILE over a TOTAL order (cents, event_id — NTILE splits tie
    runs by physical order, so the tiebreak must be pinned).  Direct
    SQL-standard semantics in both engines."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_id", "event_type", _cents().alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    return ev.select(
        "event_id", "event_type", "cents",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(_WS_TILES).over(w).cast("long").alias("tile"))


def sql_window_suite() -> str:
    return f"""SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       CAST(ntile({_WS_TILES}) OVER w AS BIGINT) AS tile
FROM events WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type
             ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT),
                      event_id)"""


ANALYTICS_QUERIES["window_suite"] = (q_window_suite,
                                     sql_window_suite)


def q_icc_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ICC(1,1) of event values within users (operators/
    stats.py icc_oneway): is value a stable per-user trait?  anova_f's
    exact quantized moments + the unequal-size k0 correction, one
    pinned chain."""
    from .operators.stats import icc_oneway

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("user_id", _cents().alias("cents"))
    return icc_oneway(ev, "user_id", "cents")


def sql_icc_reliability() -> str:
    return """WITH e AS (
  SELECT user_id AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
pg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(x) AS BIGINT) AS s_g,
         CAST(SUM(x * x) AS BIGINT) AS q_g
  FROM e GROUP BY 1),
tg AS (SELECT n_g, s_g, q_g,
              CAST((s_g * s_g) // n_g AS BIGINT) AS t_g
       FROM pg),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(q_g) AS BIGINT) AS q,
         CAST(SUM(t_g) AS BIGINT) AS t,
         CAST(SUM(n_g * n_g) AS BIGINT) AS sum_ng2
  FROM tg),
m AS (
  SELECT n, k,
         GREATEST(CAST(0 AS BIGINT),
                  CAST(t - (s * s) // n AS BIGINT)) AS ssb_q,
         CAST(q - t AS BIGINT) AS ssw_q, sum_ng2
  FROM tot)
SELECT n, k, ssb_q, ssw_q, sum_ng2,
       CASE WHEN k > 1 AND n > k AND ssw_q + ssb_q > 0
            THEN (CAST(ssb_q AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                  - CAST(ssw_q AS DOUBLE)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 / (CAST(ssb_q AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                    + ((CAST(n AS DOUBLE)
                        - CAST(sum_ng2 AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(k AS DOUBLE) - 1.0) - 1.0)
                      * (CAST(ssw_q AS DOUBLE)
                         / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
       END AS icc
FROM m"""


ANALYTICS_QUERIES["icc_reliability"] = (q_icc_reliability,
                                        sql_icc_reliability)


def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta + probability of superiority per event type, A/B
    split by event-id parity (operators/rankstats.py cliffs_delta):
    the bounded ordinal effect size an A/B readout wants beside
    cohen_d's parametric one.  The tie terms cancel in d2 = 2U1 - 2U2,
    so the statistic is one exact long from one pooled rank pass."""
    from .operators.rankstats import cliffs_delta

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_type",
                (F.pmod(F.col("event_id"), F.lit(2)) == 0).alias("grp_a"),
                _cents("value").alias("cents"))
    return cliffs_delta(ev, ["event_type"], "grp_a", "cents")


def sql_cliffs_delta() -> str:
    return """WITH e AS (
  SELECT event_type, (event_id % 2 = 0) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, f,
         RANK() OVER (PARTITION BY event_type
                      ORDER BY cents NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS r2
  FROM e),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN f THEN r2 ELSE 0 END) AS BIGINT) AS r1x2,
         CAST(SUM(CASE WHEN NOT f THEN r2 ELSE 0 END) AS BIGINT) AS r2x2
  FROM r GROUP BY event_type),
u AS (
  SELECT event_type, n1, n2,
         r1x2 - n1 * (n1 + 1) AS u2_1,
         (r1x2 - n1 * (n1 + 1)) - (r2x2 - n2 * (n2 + 1)) AS d2
  FROM a)
SELECT event_type, n1, n2, d2,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN CAST(d2 AS DOUBLE) / CAST(n1 * n2 * 2 AS DOUBLE)
            END AS delta,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN CAST(u2_1 AS DOUBLE) / CAST(n1 * n2 * 2 AS DOUBLE)
            END AS ps
FROM u"""


ANALYTICS_QUERIES["cliffs_delta"] = (q_cliffs_delta, sql_cliffs_delta)


def q_wilcoxon_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired Wilcoxon signed-rank per market segment
    (operators/rankstats.py wilcoxon_signed_rank): each customer's
    1997 vs 1996 spend (exact cents) is one pair — did spend shift
    within-customer, segment by segment?  Doubled tie-corrected ranks
    keep w2p an exact long; rbc is the one pinned divide."""
    from .operators.rankstats import wilcoxon_signed_rank

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    y = (o.filter(F.year("o_orderdate").isin(1996, 1997))
         .groupBy(F.col("o_custkey").alias("ck"),
                  F.year("o_orderdate").alias("yr"))
         .agg(F.sum(_cents("o_totalprice")).alias("cents")))
    a = y.filter(F.col("yr") == 1997).select("ck", F.col("cents")
                                             .alias("a_c"))
    b = y.filter(F.col("yr") == 1996).select("ck", F.col("cents")
                                             .alias("b_c"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .select(F.col("c_custkey").alias("ck"), "c_mktsegment")
    pairs = a.join(b, "ck").join(F.broadcast(c), "ck")
    return wilcoxon_signed_rank(pairs, ["c_mktsegment"], "a_c", "b_c")


def sql_wilcoxon_pairs() -> str:
    return f"""WITH y AS (
  SELECT o_custkey AS ck, EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(SUM({_SQL_TOTAL_C}) AS BIGINT) AS cents
  FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2),
p AS (
  SELECT a.ck, a.cents - b.cents AS d
  FROM y a JOIN y b ON a.ck = b.ck AND a.yr = 1997 AND b.yr = 1996),
d AS (
  SELECT c.c_mktsegment, p.d
  FROM p JOIN customer c ON c.c_custkey = p.ck),
r AS (
  SELECT c_mktsegment, d,
         RANK() OVER (PARTITION BY c_mktsegment ORDER BY abs(d)) * 2
           + COUNT(*) OVER (PARTITION BY c_mktsegment, abs(d)) - 1
           AS r2
  FROM d WHERE d <> 0),
z AS (
  SELECT c_mktsegment, COUNT(*) AS n_zero FROM d
  WHERE d = 0 GROUP BY 1),
a AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT)
           AS w2p
  FROM r GROUP BY 1)
SELECT a.c_mktsegment, a.n, COALESCE(z.n_zero, 0) AS n_zero, a.w2p,
       CAST(2 * a.w2p - a.n * (a.n + 1) AS DOUBLE)
         / CAST(a.n * (a.n + 1) AS DOUBLE) AS rbc
FROM a LEFT JOIN z USING (c_mktsegment)"""


ANALYTICS_QUERIES["wilcoxon_pairs"] = (q_wilcoxon_pairs,
                                       sql_wilcoxon_pairs)


_JT_BUCKET = 500_000  # $5,000 price buckets -> bounded ordinal cells


def q_jonckheere_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered trend per order status
    (operators/rankstats.py jonckheere_trend): do order totals trend
    monotonically across the five priority levels?  Levels from the
    priority digit, values bucketed to $5,000 cells (cents // 500000)
    so the quadratic lives in cell space; j2/jmax2 exact longs."""
    from .operators.rankstats import jonckheere_trend

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus",
        F.substring("o_orderpriority", 1, 1).cast("long").alias("pri"),
        F.floor(_cents("o_totalprice") / F.lit(_JT_BUCKET))
        .cast("long").alias("bucket"))
    return jonckheere_trend(o, ["o_orderstatus"], "pri", "bucket")


def sql_jonckheere_trend() -> str:
    return f"""WITH o AS (
  SELECT o_orderstatus,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS l,
         {_SQL_TOTAL_C} // {_JT_BUCKET} AS v
  FROM orders),
cells AS (
  SELECT o_orderstatus, l, v, CAST(COUNT(*) AS BIGINT) AS c
  FROM o GROUP BY 1, 2, 3),
pj AS (
  SELECT a.o_orderstatus,
         CAST(SUM(CASE WHEN a.v < b.v THEN 2 * a.c * b.c
                       ELSE a.c * b.c END) AS BIGINT) AS j2
  FROM cells a JOIN cells b
    ON a.o_orderstatus = b.o_orderstatus
   AND a.l < b.l AND a.v <= b.v
  GROUP BY 1),
lv AS (
  SELECT o_orderstatus, l, CAST(SUM(c) AS BIGINT) AS nl
  FROM cells GROUP BY 1, 2),
tot AS (
  SELECT o_orderstatus, CAST(SUM(nl) AS BIGINT) AS n,
         CAST(SUM(nl) AS BIGINT) * CAST(SUM(nl) AS BIGINT)
           - CAST(SUM(nl * nl) AS BIGINT) AS jmax2
  FROM lv GROUP BY 1),
nc AS (
  SELECT o_orderstatus, COUNT(*) AS n_cells FROM cells GROUP BY 1)
SELECT t.o_orderstatus, t.n, nc.n_cells,
       COALESCE(pj.j2, 0) AS j2, t.jmax2,
       CASE WHEN t.jmax2 > 0
            THEN CAST(2 * COALESCE(pj.j2, 0) - t.jmax2 AS DOUBLE)
                 / CAST(t.jmax2 AS DOUBLE) END AS effect
FROM tot t
JOIN nc USING (o_orderstatus)
LEFT JOIN pj USING (o_orderstatus)"""


ANALYTICS_QUERIES["jonckheere_trend"] = (q_jonckheere_trend,
                                         sql_jonckheere_trend)


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ multi-rater agreement (operators/stats.py
    fleiss_kappa): events become a rating panel — item = event_id mod
    211, the first 3 arrivals per item (by ts, event_id) are its 3
    raters, category = value-cents mod 5, panel group = item mod 4 —
    and κ asks whether "raters" of the same item agree beyond the
    pooled category mix.  Every moment is an exact long; one double
    division per group."""
    from .operators.stats import fleiss_kappa

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.pmod(F.col("event_id"), F.lit(211)).alias("_i"),
                  F.pmod(_cents(), F.lit(5)).alias("_c"),
                  "ts", "event_id"))
    w = Window.partitionBy("_i").orderBy("ts", "event_id")
    wc = Window.partitionBy("_i")
    panel = (ev.withColumn("_rn", F.row_number().over(w))
             .withColumn("_cnt", F.count(F.lit(1)).over(wc))
             .filter((F.col("_rn") <= 3) & (F.col("_cnt") >= 3))
             .select(F.pmod(F.col("_i"), F.lit(4)).alias("g"),
                     "_i", "_c"))
    return fleiss_kappa(panel, ["g"], "_i", "_c")


def sql_fleiss_kappa() -> str:
    return """WITH e AS (
  SELECT event_id % 211 AS item,
         ((CAST(floor(value * 100 + 0.5) AS BIGINT) % 5) + 5) % 5 AS cat,
         ts, event_id
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
r AS (
  SELECT item, cat,
         ROW_NUMBER() OVER (PARTITION BY item
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY item) AS cnt
  FROM e),
k AS (SELECT item % 4 AS g, item, cat FROM r
      WHERE rn <= 3 AND cnt >= 3),
cell AS (
  SELECT g, item, cat, CAST(COUNT(*) AS BIGINT) AS n
  FROM k GROUP BY 1, 2, 3),
it AS (
  SELECT g, item, SUM(n) AS m, SUM(n * n) AS sq
  FROM cell GROUP BY 1, 2),
gi AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(MAX(m) AS BIGINT) AS m,
         CAST(SUM(sq) AS BIGINT) AS ssq
  FROM it GROUP BY 1),
ct AS (
  SELECT g, cat, SUM(n) AS s
  FROM cell GROUP BY 1, 2),
gc AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_cats,
         CAST(SUM(s * s) AS BIGINT) AS bsq
  FROM ct GROUP BY 1)
SELECT g, n_items, m AS n_raters, n_cats,
       ssq - n_items * m AS po_num,
       n_items * m * (m - 1) AS po_den,
       bsq AS pe_num,
       n_items * m * n_items * m AS pe_den,
       CASE WHEN n_items * m * (m - 1)
                 * (n_items * m * n_items * m - bsq) <> 0
            THEN CAST((ssq - n_items * m) * (n_items * m * n_items * m)
                      - bsq * (n_items * m * (m - 1)) AS DOUBLE)
                 / CAST((n_items * m * (m - 1))
                        * (n_items * m * n_items * m - bsq) AS DOUBLE)
       END AS kappa
FROM gi JOIN gc USING (g)"""


ANALYTICS_QUERIES["fleiss_kappa"] = (q_fleiss_kappa, sql_fleiss_kappa)


def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley dispersion test per event type, A/B split by
    event-id parity (operators/rankstats.py ansari_bradley): do the
    two shards have the same SPREAD of values?  Doubled midrank
    scores min(r2, 2(N+1)−r2), exact hypergeometric moments, one
    pinned z — the scale complement of the cliffs_delta /
    mann_whitney location gates on the same split."""
    from .operators.rankstats import ansari_bradley

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_type",
                (F.pmod(F.col("event_id"), F.lit(2)) == 0).alias("grp_a"),
                _cents().alias("cents"))
    return ansari_bradley(ev, ["event_type"], "grp_a", "cents")


def sql_ansari_bradley() -> str:
    return """WITH e AS (
  SELECT event_type, (event_id % 2 = 0) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, f,
         RANK() OVER (PARTITION BY event_type
                      ORDER BY cents NULLS FIRST) * 2
           + COUNT(*) OVER (PARTITION BY event_type, cents) - 1 AS r2,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e),
s AS (
  SELECT event_type, f,
         least(r2, 2 * (n + 1) - r2) AS s2
  FROM r),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN f THEN s2 ELSE 0 END) AS BIGINT) AS ab2,
         CAST(SUM(s2) AS BIGINT) AS s_sum2,
         CAST(SUM(s2 * s2) AS BIGINT) AS q4
  FROM s GROUP BY event_type)
SELECT event_type, n1, n2, ab2, s_sum2,
       CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
             AND (n1 + n2) * q4 - s_sum2 * s_sum2 > 0
            THEN CAST((n1 + n2) * ab2 - n1 * s_sum2 AS DOUBLE)
                 / sqrt(CAST(n1 * n2 AS DOUBLE)
                        * CAST((n1 + n2) * q4 - s_sum2 * s_sum2
                               AS DOUBLE)
                        / CAST(n1 + n2 - 1 AS DOUBLE))
       END AS z
FROM a"""


ANALYTICS_QUERIES["ansari_bradley"] = (q_ansari_bradley,
                                       sql_ansari_bradley)


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% interval for the purchase rate per event-type bucket
    (operators/stats.py wilson_ci): success = positive event value —
    exact counts, the pinned z literal, and an ordered double chain
    give bit-identical bounds cross-engine; the honest boundary-safe
    companion to the two_proportion_z gate."""
    from .operators.stats import wilson_ci

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_type", (F.col("value") > 0).alias("pos"))
    return wilson_ci(ev, ["event_type"], "pos")


def sql_wilson_ci() -> str:
    z = 1.959963984540054
    return f"""WITH a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS successes
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type)
SELECT event_type, n, successes,
       CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
       greatest((CAST(2 * successes AS DOUBLE) + {z!r} * {z!r}
        - {z!r} * sqrt({z!r} * {z!r}
                       + CAST(4 * successes * (n - successes)
                              AS DOUBLE) / CAST(n AS DOUBLE)))
         / (2.0 * (CAST(n AS DOUBLE) + {z!r} * {z!r})),
         CAST(0.0 AS DOUBLE)) AS lo,
       least((CAST(2 * successes AS DOUBLE) + {z!r} * {z!r}
        + {z!r} * sqrt({z!r} * {z!r}
                       + CAST(4 * successes * (n - successes)
                              AS DOUBLE) / CAST(n AS DOUBLE)))
         / (2.0 * (CAST(n AS DOUBLE) + {z!r} * {z!r})),
         CAST(1.0 AS DOUBLE)) AS hi
FROM a"""


ANALYTICS_QUERIES["wilson_ci"] = (q_wilson_ci, sql_wilson_ci)


def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event-type Markov chain
    (operators/analytics.py markov_entropy_rate): the
    markov_transitions counts weighted by the exact scaled-integer
    stationary π — per-step unpredictability of user sessions in
    nats, every ln argument an exact integer ratio, one pinned
    (prev, cur)-ordered fold."""
    from .operators.analytics import markov_entropy_rate, \
        markov_stationary, markov_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type")
    tr = markov_transitions(ev, "user_id", "ts", "event_type",
                            tiebreak_col="event_id")
    pi = markov_stationary(tr, iters=_MSTAT_ITERS, scale=_MSTAT_SCALE)
    return markov_entropy_rate(tr, pi, scale=_MSTAT_SCALE)


def sql_markov_entropy_rate() -> str:
    s = float(_MSTAT_SCALE)
    ctes = _sql_mstat_ctes()
    ctes.append(f"""er AS (
  SELECT e.state, e.dst,
         (CAST(p.pi_q AS DOUBLE) / {s!r})
           * (CAST(e.n_ij AS DOUBLE) / CAST(e.n_i AS DOUBLE))
           * ln(CAST(e.n_ij AS DOUBLE) / CAST(e.n_i AS DOUBLE)) AS t
  FROM e JOIN p{_MSTAT_ITERS} p ON p.state = e.state)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM states) AS n_states,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM er) AS n_edges,
       (SELECT CAST(SUM(pi_q) AS BIGINT) FROM p{_MSTAT_ITERS})
         AS pi_total_q,
       -(SELECT list_reduce(
            list_prepend(CAST(0.0 AS DOUBLE),
                         list(t ORDER BY state, dst)),
            (a, x) -> a + x) FROM er) AS h_rate""")


ANALYTICS_QUERIES["markov_entropy_rate"] = (q_markov_entropy_rate,
                                            sql_markov_entropy_rate)


def q_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative gains per user cohort
    (operators/metrics.py lift_table): score = value cents, label =
    purchase events — explicit integer decile cuts (not NTILE),
    exact counts, one pinned division per statistic; the targeting
    readout beside auc_score/pr_curve."""
    from .operators.metrics import lift_table

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.pmod(F.col("user_id"), F.lit(4)).alias("cohort"),
                  _cents().alias("score"),
                  (F.col("event_type") == "purchase").alias("y"),
                  "event_id"))
    return lift_table(ev, ["cohort"], "score", "y", "event_id")


def sql_lift_table() -> str:
    return """WITH e AS (
  SELECT ((user_id % 4) + 4) % 4 AS cohort,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         event_id
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT cohort, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY cohort
                                 ORDER BY score DESC, event_id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY cohort) AS BIGINT) AS n
  FROM e),
b AS (
  SELECT cohort, y, ((rn - 1) * 10) // n + 1 AS bucket FROM r),
per AS (
  SELECT cohort, bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM b GROUP BY 1, 2)
SELECT cohort, bucket, n, n_pos,
       CAST(SUM(n_pos) OVER (PARTITION BY cohort ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_pos,
       CAST(SUM(n_pos) OVER (PARTITION BY cohort) AS BIGINT)
         AS base_pos,
       CAST(SUM(n) OVER (PARTITION BY cohort) AS BIGINT) AS base_n,
       CASE WHEN SUM(n_pos) OVER (PARTITION BY cohort) > 0
            THEN CAST(n_pos * SUM(n) OVER (PARTITION BY cohort)
                      AS DOUBLE)
                 / CAST(n * SUM(n_pos) OVER (PARTITION BY cohort)
                        AS DOUBLE) END AS lift,
       CASE WHEN SUM(n_pos) OVER (PARTITION BY cohort) > 0
            THEN CAST(SUM(n_pos) OVER (PARTITION BY cohort
                                       ORDER BY bucket
                                       ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE)
                 / CAST(SUM(n_pos) OVER (PARTITION BY cohort)
                        AS DOUBLE) END AS cum_gain
FROM per"""


ANALYTICS_QUERIES["lift_table"] = (q_lift_table, sql_lift_table)


def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected/maximum calibration error (operators/ml.py ece) over
    the calibration_bins gate's substrate: the weighted reliability
    gap telescopes to the exact integer Σ|pos·scale − sum_score|,
    ECE one pinned division, MCE an order-independent max."""
    from .geo.tilemath import floor_div
    from .operators.ml import ece

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.lit(999),
                floor_div(_cents(), F.lit(49))).alias("score_milli"))
    return ece(ev, "score_milli", "y")


def sql_ece() -> str:
    return """WITH e AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         LEAST(999, CAST(floor(value * 100 + 0.5) AS BIGINT) // 49)
           AS s
  FROM events WHERE value IS NOT NULL),
agg AS (
  SELECT (s * 10) // 1000 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(s) AS BIGINT) AS sum_score
  FROM e GROUP BY 1)
SELECT CAST(SUM(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       CAST(SUM(abs(pos * 1000 - sum_score)) AS BIGINT) AS ece_num,
       CASE WHEN SUM(n) > 0
            THEN CAST(SUM(abs(pos * 1000 - sum_score)) AS DOUBLE)
                 / CAST(SUM(n) * 1000 AS DOUBLE) END AS ece,
       MAX(CAST(abs(pos * 1000 - sum_score) AS DOUBLE)
           / CAST(n * 1000 AS DOUBLE)) AS mce
FROM agg"""


ANALYTICS_QUERIES["ece"] = (q_ece, sql_ece)


def q_eb_shrink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed per-user purchase rates
    (operators/ml.py eb_shrink_rates): beta-binomial method-of-moments
    prior from the population of raw rates (pinned entity-ordered
    moment folds), every shrunk rate one pinned chain — the smoothed
    CTR every ranking pipeline wants instead of x/n."""
    from .operators.ml import eb_shrink_rates

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.pmod(F.col("user_id"), F.lit(499)).alias("u"),
        (F.col("event_type") == "purchase").alias("y"))
    return eb_shrink_rates(ev, "u", "y")


def sql_eb_shrink() -> str:
    return """WITH per AS (
  SELECT ((user_id % 499) + 499) % 499 AS entity,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1),
pr AS (
  SELECT entity, n, x,
         CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate
  FROM per),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS g,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(raw_rate ORDER BY entity)),
                     (a, x) -> a + x) AS s1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(raw_rate * raw_rate
                                       ORDER BY entity)),
                     (a, x) -> a + x) AS s2
  FROM pr),
ab AS (
  SELECT
    CASE WHEN g > 1
          AND (s2 - g * (s1 / g) * (s1 / g)) / (g - 1) > 0.0
          AND (s2 - g * (s1 / g) * (s1 / g)) / (g - 1)
              < (s1 / g) * (1.0 - s1 / g)
         THEN (s1 / g) * ((s1 / g) * (1.0 - s1 / g)
                          / ((s2 - g * (s1 / g) * (s1 / g)) / (g - 1))
                          - 1.0) END AS alpha,
    CASE WHEN g > 1
          AND (s2 - g * (s1 / g) * (s1 / g)) / (g - 1) > 0.0
          AND (s2 - g * (s1 / g) * (s1 / g)) / (g - 1)
              < (s1 / g) * (1.0 - s1 / g)
         THEN (1.0 - s1 / g) * ((s1 / g) * (1.0 - s1 / g)
                          / ((s2 - g * (s1 / g) * (s1 / g)) / (g - 1))
                          - 1.0) END AS beta
  FROM mom)
SELECT pr.entity, pr.n, pr.x, pr.raw_rate, ab.alpha, ab.beta,
       CASE WHEN ab.alpha IS NOT NULL
            THEN (CAST(pr.x AS DOUBLE) + ab.alpha)
                 / (CAST(pr.n AS DOUBLE) + ab.alpha + ab.beta)
            ELSE pr.raw_rate END AS shrunk
FROM pr CROSS JOIN ab"""


ANALYTICS_QUERIES["eb_shrink"] = (q_eb_shrink, sql_eb_shrink)


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage dose-response trend per user cohort
    (operators/stats.py cochran_armitage): dose = event-id mod 5
    severity level, success = high-value event — does the success
    rate climb with the level?  int128 score covariance, one pinned
    decimal→double z."""
    from .operators.stats import cochran_armitage

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.pmod(F.col("user_id"), F.lit(3)).alias("cohort"),
                  (F.pmod(F.col("event_id"), F.lit(5)) + 1)
                  .alias("dose"),
                  (_cents() > 5000).alias("hi")))
    return cochran_armitage(ev, ["cohort"], "dose", "hi")


def sql_cochran_armitage() -> str:
    return """WITH e AS (
  SELECT ((user_id % 3) + 3) % 3 AS cohort,
         event_id % 5 + 1 AS dose,
         CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) > 5000
              THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL),
lvl AS (
  SELECT cohort, dose,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS r
  FROM e GROUP BY 1, 2),
per AS (
  SELECT cohort,
         CAST(COUNT(*) AS BIGINT) AS n_levels,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(r) AS BIGINT) AS r_total,
         CAST(SUM(dose * r) AS BIGINT) AS cr,
         CAST(SUM(dose * n) AS BIGINT) AS cn,
         CAST(SUM(dose * dose * n) AS BIGINT) AS ccn
  FROM lvl GROUP BY 1)
SELECT cohort, n_levels, n_total, r_total,
       CASE WHEN r_total > 0 AND r_total < n_total
             AND CAST(n_total AS HUGEINT) * ccn
                 - CAST(cn AS HUGEINT) * cn > 0
            THEN CAST(CAST(n_total AS HUGEINT) * cr
                      - CAST(r_total AS HUGEINT) * cn AS DOUBLE)
                 / sqrt(CAST(CAST(r_total AS HUGEINT)
                             * (n_total - r_total) AS DOUBLE)
                        * CAST(CAST(n_total AS HUGEINT) * ccn
                               - CAST(cn AS HUGEINT) * cn AS DOUBLE)
                        / CAST(n_total AS DOUBLE))
       END AS z
FROM per"""


ANALYTICS_QUERIES["cochran_armitage"] = (q_cochran_armitage,
                                         sql_cochran_armitage)


def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted κ between two synthetic ordinal raters
    (operators/stats.py weighted_kappa): rater A = cents quintile,
    rater B = A perturbed by a deterministic ±1 hash wobble — the
    QWK exact-integer ratio 1 − N·ΣwO/ΣwRC in one division."""
    from .geo.tilemath import floor_div
    from .operators.stats import weighted_kappa

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.least(F.lit(4), floor_div(_cents(), F.lit(2500)))
                  .alias("a"),
                  "event_id"))
    wob = (F.pmod(F.col("event_id") * 2654435761, F.lit(7)) - 3)
    b = F.greatest(F.lit(0), F.least(
        F.lit(4), F.col("a") + F.when(wob >= 2, 1)
        .when(wob <= -2, -1).otherwise(0)))
    pairs = ev.select("a", b.alias("b"))
    return weighted_kappa(pairs, "a", "b")


def sql_weighted_kappa() -> str:
    return """WITH e AS (
  SELECT LEAST(4, CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500)
           AS a,
         event_id
  FROM events WHERE value IS NOT NULL),
p AS (
  SELECT a,
         GREATEST(0, LEAST(4,
           a + CASE WHEN (event_id * 2654435761) % 7 >= 5 THEN 1
                    WHEN (event_id * 2654435761) % 7 <= 1 THEN -1
                    ELSE 0 END)) AS b
  FROM e),
conf AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
obs AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM((a - b) * (a - b) * n) AS BIGINT) AS w_obs
  FROM conf),
r AS (SELECT a AS l, CAST(SUM(n) AS BIGINT) AS rr
      FROM conf GROUP BY 1),
c AS (SELECT b AS l2, CAST(SUM(n) AS BIGINT) AS cc
      FROM conf GROUP BY 1),
ex AS (
  SELECT CAST(SUM((r.l - c.l2) * (r.l - c.l2) * r.rr * c.cc)
              AS BIGINT) AS w_exp_num
  FROM r CROSS JOIN c)
SELECT obs.n_total, obs.w_obs, ex.w_exp_num,
       CASE WHEN ex.w_exp_num > 0
            THEN 1.0 - CAST(obs.n_total * obs.w_obs AS DOUBLE)
                       / CAST(ex.w_exp_num AS DOUBLE) END AS kappa_w
FROM obs CROSS JOIN ex"""


ANALYTICS_QUERIES["weighted_kappa"] = (q_weighted_kappa,
                                       sql_weighted_kappa)


def q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel purchase↔error association stratified by user
    cohort (operators/stats.py mantel_haenszel): per-stratum 2×2
    exact cells, pinned stratum-ordered fold of the ad/N, bc/N,
    a−E, V terms — the confounder-adjusted odds ratio beside the
    crude odds_ratio gate."""
    from .operators.stats import mantel_haenszel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).alias("bought"),
        F.max(F.when(F.col("event_type") == "error", 1)
              .otherwise(0)).alias("errored"),
        F.count(F.lit(1)).alias("n_ev"))
    strat = per_user.select(
        F.lit("all").alias("g"),
        F.least(F.lit(4), F.log2(F.col("n_ev").cast("double"))
                .cast("long")).alias("stratum"),
        (F.col("bought") == 1).alias("exposed"),
        (F.col("errored") == 1).alias("outcome"))
    return mantel_haenszel(strat, ["g"], "stratum", "exposed",
                           "outcome")


def sql_mantel_haenszel() -> str:
    return """WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS bought,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS errored,
         COUNT(*) AS n_ev
  FROM events GROUP BY 1),
st AS (
  SELECT 'all' AS g,
         LEAST(4, CAST(log2(CAST(n_ev AS DOUBLE)) AS BIGINT))
           AS stratum,
         bought = 1 AS e, errored = 1 AS o
  FROM pu),
cell AS (
  SELECT g, stratum,
         CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT)
           AS b,
         CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT)
           AS c,
         CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM st GROUP BY 1, 2),
t AS (
  SELECT g, stratum, a + b + c + d AS n,
         CAST(a * d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
           AS tad,
         CAST(b * c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
           AS tbc,
         CAST(a AS DOUBLE)
           - CAST((a + b) * (a + c) AS DOUBLE)
             / CAST(a + b + c + d AS DOUBLE) AS tame,
         CASE WHEN a + b + c + d > 1 THEN
           CAST((a + b) * (a + c) AS DOUBLE)
             * CAST((c + d) * (b + d) AS DOUBLE)
             / (CAST(a + b + c + d AS DOUBLE)
                * CAST(a + b + c + d AS DOUBLE)
                * CAST(a + b + c + d - 1 AS DOUBLE))
         ELSE 0.0 END AS tv
  FROM cell),
agg AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(n) AS BIGINT) AS n_total,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(tad ORDER BY stratum)),
                     (x, y) -> x + y) AS sad,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(tbc ORDER BY stratum)),
                     (x, y) -> x + y) AS sbc,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(tame ORDER BY stratum)),
                     (x, y) -> x + y) AS same,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(tv ORDER BY stratum)),
                     (x, y) -> x + y) AS sv
  FROM t GROUP BY g)
SELECT g, n_strata, n_total,
       CASE WHEN sbc > 0.0 THEN sad / sbc END AS or_mh,
       CASE WHEN sv > 0.0
            THEN greatest(abs(same) - 0.5, CAST(0.0 AS DOUBLE))
                 * greatest(abs(same) - 0.5, CAST(0.0 AS DOUBLE))
                 / sv END AS chisq_cmh
FROM agg"""


ANALYTICS_QUERIES["mantel_haenszel"] = (q_mantel_haenszel,
                                        sql_mantel_haenszel)


def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve (operators/metrics.py qini_curve): score =
    value cents, treatment = user-id parity, response = purchase —
    cumulative treated-vs-control incremental responders per decile,
    exact integer cuts and counts, one pinned chain per statistic."""
    from .operators.metrics import qini_curve

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.lit("all").alias("g"),
                  _cents().alias("score"),
                  (F.pmod(F.col("user_id"), F.lit(2)) == 0)
                  .alias("treat"),
                  (F.col("event_type") == "purchase").alias("y"),
                  "event_id"))
    return qini_curve(ev, ["g"], "score", "treat", "y", "event_id")


def sql_qini_curve() -> str:
    return """WITH e AS (
  SELECT 'all' AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS score,
         (user_id % 2 = 0) AS t,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         event_id
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT g, t, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY g
                                 ORDER BY score DESC, event_id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM e),
b AS (SELECT g, t, y, ((rn - 1) * 10) // n + 1 AS bucket FROM r),
per AS (
  SELECT g, bucket,
         CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(SUM(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS r_t,
         CAST(SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
           AS r_c
  FROM b GROUP BY 1, 2),
cum AS (
  SELECT g, bucket, n_t, n_c, r_t, r_c,
         CAST(SUM(n_t) OVER w AS BIGINT) AS cum_nt,
         CAST(SUM(n_c) OVER w AS BIGINT) AS cum_nc,
         CAST(SUM(r_t) OVER w AS BIGINT) AS cum_rt,
         CAST(SUM(r_c) OVER w AS BIGINT) AS cum_rc
  FROM per
  WINDOW w AS (PARTITION BY g ORDER BY bucket
               ROWS UNBOUNDED PRECEDING))
SELECT g, bucket, n_t, n_c, r_t, r_c, cum_nt, cum_nc, cum_rt,
       cum_rc,
       CASE WHEN cum_nc > 0
            THEN CAST(cum_rt AS DOUBLE)
                 - CAST(cum_rc * cum_nt AS DOUBLE)
                   / CAST(cum_nc AS DOUBLE) END AS qini,
       CASE WHEN cum_nt > 0 AND cum_nc > 0
            THEN CAST(cum_rt AS DOUBLE) / CAST(cum_nt AS DOUBLE)
                 - CAST(cum_rc AS DOUBLE) / CAST(cum_nc AS DOUBLE)
       END AS uplift
FROM cum"""


ANALYTICS_QUERIES["qini_curve"] = (q_qini_curve, sql_qini_curve)


def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + Murphy decomposition on the calibration_bins
    substrate (operators/ml.py brier_score): the raw Brier sum is one
    exact int64 aggregate; reliability/resolution ride pinned
    bin-ordered folds of exact-integer gap terms."""
    from .geo.tilemath import floor_div
    from .operators.ml import brier_score

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.lit(999),
                floor_div(_cents(), F.lit(49))).alias("score_milli"))
    return brier_score(ev, "score_milli", "y")


def sql_brier_score() -> str:
    return """WITH e AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         LEAST(999, CAST(floor(value * 100 + 0.5) AS BIGINT) // 49)
           AS s
  FROM events WHERE value IS NOT NULL),
raw AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM((s - y * 1000) * (s - y * 1000)) AS BIGINT)
           AS brier_num,
         CAST(SUM(y) AS BIGINT) AS p
  FROM e),
bins AS (
  SELECT (s * 10) // 1000 AS bin,
         CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(s) AS BIGINT) AS sm
  FROM e GROUP BY 1),
t AS (
  SELECT bin,
         CAST(sm - pos * 1000 AS DOUBLE)
           * CAST(sm - pos * 1000 AS DOUBLE)
           / CAST(nb AS DOUBLE) AS rt,
         CAST(pos * raw.n - nb * raw.p AS DOUBLE)
           * CAST(pos * raw.n - nb * raw.p AS DOUBLE)
           / CAST(nb AS DOUBLE) AS st
  FROM bins CROSS JOIN raw),
f AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(rt ORDER BY bin)),
                     (a, x) -> a + x) AS rel_s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(st ORDER BY bin)),
                     (a, x) -> a + x) AS res_s
  FROM t)
SELECT raw.n, raw.brier_num,
       CAST(raw.brier_num AS DOUBLE)
         / (CAST(raw.n AS DOUBLE) * 1000000.0) AS brier,
       f.rel_s / (CAST(raw.n AS DOUBLE) * 1000000.0) AS rel,
       f.res_s / (CAST(raw.n AS DOUBLE) * CAST(raw.n AS DOUBLE)
                  * CAST(raw.n AS DOUBLE)) AS res,
       CAST(raw.p AS DOUBLE) * CAST(raw.n - raw.p AS DOUBLE)
         / (CAST(raw.n AS DOUBLE) * CAST(raw.n AS DOUBLE)) AS unc
FROM raw CROSS JOIN f"""


ANALYTICS_QUERIES["brier_score"] = (q_brier_score, sql_brier_score)


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch χ² per event type (operators/stats.py
    srm_check): the user-parity 'assignment' audited against the
    designed 1:1 split — exact (o·den − N·num)² integer terms, one
    pinned arm-ordered fold."""
    from .operators.stats import srm_check

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "arm_a")
        .otherwise("arm_b").alias("arm"))
    return srm_check(ev, ["event_type"], "arm",
                     {"arm_a": (1, 2), "arm_b": (1, 2)})


def sql_srm_check() -> str:
    return """WITH e AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'arm_a' ELSE 'arm_b' END
           AS arm
  FROM events),
obs AS (
  SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS o
  FROM e GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
  FROM obs GROUP BY 1),
exp_arms(arm, num, den) AS (VALUES ('arm_a', 1, 2), ('arm_b', 1, 2)),
full_t AS (
  SELECT t.event_type, t.n, x.arm,
         CAST(x.num AS BIGINT) AS num, CAST(x.den AS BIGINT) AS den,
         COALESCE(obs.o, 0) AS o
  FROM tot t CROSS JOIN exp_arms x
  LEFT JOIN obs ON obs.event_type = t.event_type
               AND obs.arm = x.arm),
terms AS (
  SELECT event_type, n, arm,
         CAST(o * den - n * num AS DOUBLE)
           * CAST(o * den - n * num AS DOUBLE)
           / CAST(n * num * den AS DOUBLE) AS t
  FROM full_t)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) - 1 AS BIGINT) AS df_chi,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(t ORDER BY arm)),
                   (a, x) -> a + x) AS chisq
FROM terms GROUP BY event_type"""


ANALYTICS_QUERIES["srm_check"] = (q_srm_check, sql_srm_check)


def q_ad_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling per event type, A/B split by
    event-id parity (operators/rankstats.py ad_2samp): the
    tail-weighted distribution test beside ks_test/cvm_test on the
    same split — doubled midpoint cumulatives keep every term an
    exact integer ratio, pinned value-ordered folds."""
    from .operators.rankstats import ad_2samp

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("value").isNotNull()) \
        .select("event_type",
                (F.pmod(F.col("event_id"), F.lit(2)) == 0).alias("grp_a"),
                _cents().alias("cents"))
    return ad_2samp(ev, ["event_type"], "grp_a", "cents")


def sql_ad_2samp() -> str:
    return """WITH e AS (
  SELECT event_type, (event_id % 2 = 0) AS f,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
cell AS (
  SELECT event_type, v,
         CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS l1,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS l2
  FROM e GROUP BY 1, 2),
base AS (
  SELECT event_type, v, l1, l2, l1 + l2 AS l,
         COALESCE(SUM(l1 + l2) OVER w, 0) AS bprev,
         COALESCE(SUM(l1) OVER w, 0) AS m1prev,
         COALESCE(SUM(l2) OVER w, 0) AS m2prev,
         CAST(SUM(l1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
         CAST(SUM(l2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
  FROM cell
  WINDOW w AS (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
terms AS (
  SELECT event_type, v, n1, n2,
         CASE WHEN (2 * bprev + l) * (2 * (n1 + n2) - 2 * bprev - l)
                   - (n1 + n2) * l > 0
              THEN CAST(l AS DOUBLE)
                   * CAST((n1 + n2) * (2 * m1prev + l1)
                          - n1 * (2 * bprev + l) AS DOUBLE)
                   * CAST((n1 + n2) * (2 * m1prev + l1)
                          - n1 * (2 * bprev + l) AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE)
                      * CAST((2 * bprev + l)
                             * (2 * (n1 + n2) - 2 * bprev - l)
                             - (n1 + n2) * l AS DOUBLE))
              ELSE 0.0 END AS t1,
         CASE WHEN (2 * bprev + l) * (2 * (n1 + n2) - 2 * bprev - l)
                   - (n1 + n2) * l > 0
              THEN CAST(l AS DOUBLE)
                   * CAST((n1 + n2) * (2 * m2prev + l2)
                          - n2 * (2 * bprev + l) AS DOUBLE)
                   * CAST((n1 + n2) * (2 * m2prev + l2)
                          - n2 * (2 * bprev + l) AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE)
                      * CAST((2 * bprev + l)
                             * (2 * (n1 + n2) - 2 * bprev - l)
                             - (n1 + n2) * l AS DOUBLE))
              ELSE 0.0 END AS t2
  FROM base),
agg AS (
  SELECT event_type,
         CAST(MAX(n1) AS BIGINT) AS n1,
         CAST(MAX(n2) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS n_values,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(t1 ORDER BY v)),
                     (a, x) -> a + x) AS s1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(t2 ORDER BY v)),
                     (a, x) -> a + x) AS s2
  FROM terms GROUP BY event_type)
SELECT event_type, n1, n2, n_values,
       CASE WHEN n1 > 0 AND n2 > 0 AND n_values > 1
            THEN CAST(n1 + n2 - 1 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE)
                 * (s1 / CAST(n1 AS DOUBLE)
                    + s2 / CAST(n2 AS DOUBLE)) END AS a2
FROM agg"""


ANALYTICS_QUERIES["ad_2samp"] = (q_ad_2samp, sql_ad_2samp)


_KRIPP_UMOD = 2039
_KRIPP_CAP = 9


def q_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's nominal α (operators/stats.py
    krippendorff_alpha) — the missing-data sibling of fleiss_kappa:
    events become a ragged rating panel (unit = event_id mod 2039,
    first ≤ 9 arrivals rate it, category = value-cents mod 4, group =
    unit mod 3), so units carry VARYING rater counts including
    dropped singletons.  The per-unit 1/(m−1) rational ladder rides
    the integer lcm(1..12) common denominator; α is one exact-ratio
    double division per group."""
    from .operators.stats import krippendorff_alpha

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select(F.pmod(F.col("event_id"), F.lit(_KRIPP_UMOD))
                  .alias("_u"),
                  F.pmod(_cents(), F.lit(4)).alias("_c"),
                  "ts", "event_id"))
    w = Window.partitionBy("_u").orderBy("ts", "event_id")
    panel = (ev.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= _KRIPP_CAP)
             .select(F.pmod(F.col("_u"), F.lit(3)).alias("g"),
                     "_u", "_c"))
    return krippendorff_alpha(panel, ["g"], "_u", "_c")


def sql_krippendorff() -> str:
    return f"""WITH e AS (
  SELECT event_id % {_KRIPP_UMOD} AS u,
         ((CAST(floor(value * 100 + 0.5) AS BIGINT) % 4) + 4) % 4 AS c,
         ts, event_id
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
panel AS (
  SELECT u % 3 AS g, u, c
  FROM e
  QUALIFY ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, event_id)
          <= {_KRIPP_CAP}),
cell AS (
  SELECT g, u, c, COUNT(*) AS n FROM panel GROUP BY 1, 2, 3),
unitt AS (
  SELECT g, u, SUM(n) AS m, SUM(n * n) AS sq
  FROM cell GROUP BY 1, 2 HAVING SUM(n) >= 2),
gu AS (
  SELECT g, COUNT(*) AS n_units, SUM(m) AS n_ratings,
         SUM((m * m - sq) * (27720 // (m - 1))) AS do_scaled
  FROM unitt GROUP BY 1),
cat AS (
  SELECT c.g, c.c, SUM(c.n) AS s
  FROM cell c JOIN unitt t ON t.g = c.g AND t.u = c.u
  GROUP BY 1, 2),
gc AS (
  SELECT g, COUNT(*) AS n_cats, SUM(s * s) AS se_cat
  FROM cat GROUP BY 1)
SELECT gu.g, gu.n_units, gu.n_ratings, gc.n_cats,
       gu.do_scaled, gc.se_cat,
       CASE WHEN gu.n_ratings * gu.n_ratings - gc.se_cat > 0
            THEN 1.0 - CAST((gu.n_ratings - 1) * gu.do_scaled AS DOUBLE)
                 / CAST(27720 * (gu.n_ratings * gu.n_ratings
                                 - gc.se_cat) AS DOUBLE)
       END AS alpha
FROM gu JOIN gc ON gc.g = gu.g"""


ANALYTICS_QUERIES["krippendorff"] = (q_krippendorff, sql_krippendorff)


_HL_QMOD = 128


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of value cents per event type
    (operators/stats.py hodges_lehmann): exact lower-median SELECTION
    over the Walsh-sum lattice — the robust location beside
    theil_sen_slope's robust trend.  1/128 deterministic pre-sample
    keeps every group inside the in-plan pair cap through sf1.0."""
    from .operators.stats import hodges_lehmann

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull()
                  & (F.pmod(F.col("event_id"), F.lit(_HL_QMOD)) == 0))
          .select(F.col("event_type").alias("g"),
                  F.col("event_id").alias("id"),
                  _cents().alias("x")))
    return hodges_lehmann(ev, ["g"], "id", "x")


def sql_hodges_lehmann() -> str:
    return f"""WITH e AS (
  SELECT event_type AS g, event_id AS id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL AND event_id % {_HL_QMOD} = 0),
r AS (
  SELECT g, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, id)
              AS BIGINT) AS rid,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM e),
pairs AS (
  SELECT a.g, a.n, a.x + b.x AS s, a.rid AS ra, b.rid AS rb
  FROM r a JOIN r b ON b.g = a.g AND a.rid <= b.rid),
sel AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY s, ra, rb) AS BIGINT) AS rn
  FROM pairs)
SELECT g, n, n * (n + 1) // 2 AS n_pairs, s AS hl_num,
       CAST(s AS DOUBLE) / 2 AS hl
FROM sel WHERE rn = (n * (n + 1) // 2 + 1) // 2"""


ANALYTICS_QUERIES["hodges_lehmann"] = (q_hodges_lehmann,
                                       sql_hodges_lehmann)


def q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett variance-homogeneity χ² of value cents across user
    cohorts (cell = user_id mod 7) per event type (operators/stats.py
    bartlett_test): exact DECIMAL(38) cell variances, pinned
    cell-ordered ln folds — the normal-theory sibling of
    brown_forsythe."""
    from .operators.stats import bartlett_test

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull()
                  & F.col("user_id").isNotNull())
          .select(F.col("event_type").alias("g"),
                  F.pmod(F.col("user_id"), F.lit(7)).alias("c"),
                  _cents().alias("x")))
    return bartlett_test(ev, ["g"], "c", "x")


def sql_bartlett() -> str:
    fold = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list({t} ORDER BY c)), (p, q) -> p + q)")
    return f"""WITH e AS (
  SELECT event_type AS g, ((user_id % 7) + 7) % 7 AS c,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
cell AS (
  SELECT g, c, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sq
  FROM e GROUP BY 1, 2 HAVING COUNT(*) >= 2),
cc AS (
  SELECT g, c, n,
         CAST(CAST(n AS HUGEINT) * sq
              - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE)
           AS numd,
         CASE WHEN CAST(n AS HUGEINT) * sq
                   - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) = 0
              THEN 1 ELSE 0 END AS is0
  FROM cell),
a AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS k, SUM(n) AS n_total,
         MAX(is0) AS has0,
         {fold.format(t="CAST(n - 1 AS DOUBLE)"
                        " * ln(numd / CAST(n * (n - 1) AS DOUBLE))")}
           AS lnsum,
         {fold.format(t="numd / CAST(n AS DOUBLE)")} AS spnum,
         {fold.format(t="1.0 / CAST(n - 1 AS DOUBLE)")} AS rsum
  FROM cc GROUP BY g),
b AS (
  SELECT g, k, n_total, has0, lnsum,
         spnum / CAST(n_total - k AS DOUBLE) AS sp2,
         1.0 + (rsum - 1.0 / CAST(n_total - k AS DOUBLE))
             / (3.0 * CAST(k - 1 AS DOUBLE)) AS c_factor
  FROM a)
SELECT g, k, n_total, sp2, c_factor,
       CASE WHEN k >= 2 AND has0 = 0
            THEN (CAST(n_total - k AS DOUBLE) * ln(sp2) - lnsum)
                 / c_factor END AS chi2
FROM b"""


ANALYTICS_QUERIES["bartlett"] = (q_bartlett, sql_bartlett)


_MAHA_QMOD = 16


def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared Mahalanobis distance of (value cents, props length)
    per event type (operators/stats.py mahalanobis2d): exact
    DECIMAL(38) covariance adjugate, one double division per point,
    χ²₂(0.95) flag — the correlation-aware outlier score beside
    robust_outliers."""
    from .operators.stats import mahalanobis2d

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull() & F.col("props").isNotNull()
                  & (F.pmod(F.col("event_id"), F.lit(_MAHA_QMOD)) == 0))
          .select(F.col("event_type").alias("g"),
                  F.col("event_id").alias("id"),
                  _cents().alias("x"),
                  F.length("props").cast("long").alias("y")))
    return mahalanobis2d(ev, ["g"], "id", "x", "y")


def sql_mahalanobis() -> str:
    thr = 5.991464547107979
    return f"""WITH e AS (
  SELECT event_type AS g, event_id AS id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(length(props) AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND props IS NOT NULL
    AND event_id % {_MAHA_QMOD} = 0),
m AS (
  SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
  FROM e GROUP BY g),
c AS (
  SELECT g, n, sx, sy,
         n * sxx - sx * sx AS a,
         n * sxy - sx * sy AS b,
         n * syy - sy * sy AS cc,
         (n * sxx - sx * sx) * (n * syy - sy * sy)
           - (n * sxy - sx * sy) * (n * sxy - sx * sy) AS det
  FROM m)
SELECT e.g, e.id,
       CASE WHEN c.det > 0 THEN
         CAST(c.cc * ((c.n * e.x - c.sx) * (c.n * e.x - c.sx))
              - 2 * c.b * ((c.n * e.x - c.sx) * (c.n * e.y - c.sy))
              + c.a * ((c.n * e.y - c.sy) * (c.n * e.y - c.sy))
              AS DOUBLE) / CAST(c.det AS DOUBLE) END AS d2m,
       CASE WHEN c.det > 0 THEN
         CAST(c.cc * ((c.n * e.x - c.sx) * (c.n * e.x - c.sx))
              - 2 * c.b * ((c.n * e.x - c.sx) * (c.n * e.y - c.sy))
              + c.a * ((c.n * e.y - c.sy) * (c.n * e.y - c.sy))
              AS DOUBLE) / CAST(c.det AS DOUBLE) > {thr!r} END
         AS outlier
FROM e JOIN c ON c.g = e.g"""


ANALYTICS_QUERIES["mahalanobis"] = (q_mahalanobis, sql_mahalanobis)


_CPK_LSL = 0
_CPK_USL = 40000


def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cp/Cpk of value cents per event type against [0, 40000] cent
    spec limits (operators/stats.py process_capability): exact
    DECIMAL(38) moments, two pinned double chains — the SPC
    acceptance summary beside control_chart/ewma_chart."""
    from .operators.stats import process_capability

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"), _cents().alias("x")))
    return process_capability(ev, ["g"], "x",
                              lsl=_CPK_LSL, usl=_CPK_USL)


def sql_process_capability() -> str:
    lsl, usl = _CPK_LSL, _CPK_USL
    return f"""WITH e AS (
  SELECT event_type AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
m AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sq
  FROM e GROUP BY g),
c AS (
  SELECT g, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(CAST(n AS HUGEINT) * sq
                   - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE)
              / CAST(n * n AS DOUBLE)) AS sigma
  FROM m)
SELECT g, n, mu, sigma,
       CASE WHEN sigma > 0.0
            THEN {float(usl - lsl)!r} / (6.0 * sigma) END AS cp,
       CASE WHEN sigma > 0.0
            THEN least({float(usl)!r} - mu, mu - {float(lsl)!r})
                 / (3.0 * sigma) END AS cpk
FROM c"""


ANALYTICS_QUERIES["process_capability"] = (q_process_capability,
                                           sql_process_capability)


_PLATT_ITERS_GATE = 6


def q_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt calibration of a noisy monotone score→label relation per
    event type (operators/ml.py platt_scaling): dollar-scaled cents
    scores, hash-noise labels with score-dependent rates; six pinned
    Newton steps reproduce A, B to the ulp cross-engine — the
    parametric sibling of isotonic_calibration."""
    from .operators.ml import platt_scaling

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"), "event_id",
                  (F.floor(_cents() / 100) - 250).cast("long")
                  .alias("s")))
    thr = F.least(F.greatest(F.lit(500) + F.col("s"), F.lit(1)),
                  F.lit(999))
    ev = ev.select("g", "s",
                   (F.pmod(F.col("event_id") * 7919, F.lit(1000))
                    < thr).cast("int").alias("y"))
    return platt_scaling(ev, ["g"], "s", "y",
                         iters=_PLATT_ITERS_GATE)


def sql_platt_scaling() -> str:
    sig = ("(CASE WHEN {z} >= 0.0 THEN 1.0 / (1.0 + exp(-abs({z}))) "
           "ELSE exp({z}) / (1.0 + exp({z})) END)")

    def fold(t):
        return ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list({t} ORDER BY d.s, d.y)), (p, q) -> p + q)")

    parts = ["""WITH d AS (
  SELECT event_type AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 - 250 AS s,
         CASE WHEN (event_id * 7919) % 1000
                   < least(greatest(500
                       + (CAST(floor(value * 100 + 0.5) AS BIGINT)
                          // 100 - 250), 1), 999)
              THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL),
it0 AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(y) + 1 AS DOUBLE) / CAST(SUM(y) + 2 AS DOUBLE)
           AS tp,
         1.0 / CAST(COUNT(*) - SUM(y) + 2 AS DOUBLE) AS tm,
         CAST(0.0 AS DOUBLE) AS pa,
         ln(CAST(COUNT(*) - SUM(y) + 1 AS DOUBLE)
            / CAST(SUM(y) + 1 AS DOUBLE)) AS pb
  FROM d GROUP BY g)"""]
    for k in range(_PLATT_ITERS_GATE):
        z = "(t.pa * CAST(d.s AS DOUBLE) + t.pb)"
        u = sig.format(z=z)
        dd = (f"({u} - (1.0 - CASE WHEN d.y = 1 THEN t.tp "
              f"ELSE t.tm END))")
        h = f"({u} * (1.0 - {u}))"
        parts.append(f""",
s{k} AS MATERIALIZED (
  SELECT d.g,
         {fold(f"{dd} * CAST(d.s AS DOUBLE)")} AS ga,
         {fold(dd)} AS gb,
         {fold(f"{h} * CAST(d.s AS DOUBLE) * CAST(d.s AS DOUBLE)")}
           + 1e-12 AS haa,
         {fold(f"{h} * CAST(d.s AS DOUBLE)")} AS hab,
         {fold(h)} + 1e-12 AS hbb
  FROM d JOIN it{k} t ON t.g = d.g GROUP BY d.g),
it{k + 1} AS MATERIALIZED (
  SELECT t.g, t.n, t.n_pos, t.tp, t.tm,
         t.pa - (s.hbb * s.ga - s.hab * s.gb)
              / (s.haa * s.hbb - s.hab * s.hab) AS pa,
         t.pb - (s.haa * s.gb - s.hab * s.ga)
              / (s.haa * s.hbb - s.hab * s.hab) AS pb
  FROM it{k} t JOIN s{k} s ON s.g = t.g)""")
    parts.append(f"""
SELECT g, n, n_pos, pa AS a, pb AS b FROM it{_PLATT_ITERS_GATE}""")
    return "".join(parts)


ANALYTICS_QUERIES["platt_scaling"] = (q_platt_scaling,
                                      sql_platt_scaling)


_SPRT_P0, _SPRT_P1 = 0.2, 0.3
_SPRT_ALPHA, _SPRT_BETA = 0.05, 0.2


def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over per-event-type Bernoulli streams
    (operators/analytics.py sprt_monitor): hash outcomes whose rate
    varies by type straddle H₀/H₁, so the gate exercises h1, h0 AND
    continue endings; LLR is literal-coefficient × exact-count,
    first crossing pinned by min-struct."""
    from .operators.analytics import sprt_monitor

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("ts").isNotNull())
          .select(F.col("event_type").alias("g"), "ts", "event_id",
                  (F.pmod(F.col("event_id") * 31, F.lit(100))
                   < F.lit(15) + 10 * F.pmod(F.length("event_type"),
                                             F.lit(3)))
                  .cast("int").alias("y")))
    return sprt_monitor(ev, ["g"], order_cols=("ts", "event_id"),
                        outcome_col="y", p0=_SPRT_P0, p1=_SPRT_P1,
                        alpha=_SPRT_ALPHA, beta=_SPRT_BETA)


def sql_sprt_monitor() -> str:
    import math

    c1 = math.log(_SPRT_P1 / _SPRT_P0)
    c2 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
    ba = math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA)
    bb = math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA))
    return f"""WITH e AS (
  SELECT event_type AS g, ts, event_id,
         CASE WHEN (event_id * 31) % 100
                   < 15 + 10 * (length(event_type) % 3)
              THEN 1 ELSE 0 END AS y
  FROM events WHERE ts IS NOT NULL),
r AS (
  SELECT g, CAST(y AS BIGINT) AS y,
         CAST(COUNT(*) OVER w AS BIGINT) AS t,
         CAST(SUM(y) OVER w AS BIGINT) AS k
  FROM e WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)),
l AS (
  SELECT g, t, k,
         {c1!r} * CAST(k AS DOUBLE)
           + {c2!r} * CAST(t - k AS DOUBLE) AS llr
  FROM r),
d AS (
  SELECT g, t, llr,
         CASE WHEN llr >= {ba!r} THEN 'h1'
              WHEN llr <= {bb!r} THEN 'h0' END AS dec
  FROM l),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_obs, MAX(k) AS n_pos
  FROM l GROUP BY g),
first_cross AS (
  SELECT g, t, dec, llr,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) AS rn
  FROM d WHERE dec IS NOT NULL)
SELECT a.g, a.n_obs, a.n_pos,
       coalesce(f.dec, 'continue') AS decision,
       f.t AS t_cross, f.llr AS llr_cross
FROM agg a LEFT JOIN first_cross f ON f.g = a.g AND f.rn = 1"""


ANALYTICS_QUERIES["sprt_monitor"] = (q_sprt_monitor, sql_sprt_monitor)


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal 90% interval around the per-event-type median
    of value cents (operators/ml.py conformal_interval): hash-split
    halves, exact median and residual-rank selection, coverage one
    exact division — the distribution-free uncertainty wrapper."""
    from .operators.ml import conformal_interval

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"),
                  F.col("event_id").alias("id"),
                  _cents().alias("y")))
    return conformal_interval(ev, ["g"], id_col="id", val_col="y")


def sql_conformal() -> str:
    u = ("CAST(('0x' || substr(md5(concat_ws(chr(31), 'conformal', "
         "CAST(id AS VARCHAR))), 1, 15)) AS BIGINT)")
    half = (1 << 60) // 2
    return f"""WITH e AS (
  SELECT event_type AS g, event_id AS id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL),
s AS (SELECT g, id, y, {u} < {half} AS cal FROM e),
calr AS (
  SELECT g, id, y,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY y, id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS nc
  FROM s WHERE cal),
yh AS (SELECT g, y AS y_hat, nc AS n_cal FROM calr
       WHERE rn = (nc + 1) // 2),
res AS (
  SELECT c.g, abs(c.y - y.y_hat) AS r, c.id, y.n_cal, y.y_hat,
         ROW_NUMBER() OVER (PARTITION BY c.g
                            ORDER BY abs(c.y - y.y_hat), c.id) AS rn
  FROM s c JOIN yh y ON y.g = c.g WHERE c.cal),
qh AS (
  SELECT g, r AS q_hat FROM res
  WHERE rn = (9 * (n_cal + 1) + 9) // 10),
head AS (
  SELECT y.g, y.n_cal, y.y_hat, q.q_hat
  FROM yh y LEFT JOIN qh q ON q.g = y.g)
SELECT h.g, h.n_cal,
       CAST(COUNT(t.id) AS BIGINT) AS n_test, h.y_hat, h.q_hat,
       CASE WHEN COUNT(t.id) > 0 AND h.q_hat IS NOT NULL
            THEN CAST(SUM(CASE WHEN abs(t.y - h.y_hat) <= h.q_hat
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(t.id) AS DOUBLE) END AS coverage
FROM head h LEFT JOIN (SELECT * FROM s WHERE NOT cal) t
  ON t.g = h.g
GROUP BY h.g, h.n_cal, h.y_hat, h.q_hat"""


ANALYTICS_QUERIES["conformal"] = (q_conformal, sql_conformal)


def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran subclassification ATE of a hash treatment on value
    cents within props-length quintiles, per event type
    (operators/ml.py stratified_ate): exact stratum moments, pinned
    stratum-ordered weighted fold, missing-arm strata dropped with
    renormalized weights."""
    from .operators.ml import stratified_ate

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull()
                  & F.col("props").isNotNull())
          .select(F.col("event_type").alias("g"),
                  F.pmod(F.col("event_id") * 13, F.lit(2)).cast("int")
                  .alias("t"),
                  _cents().alias("y"),
                  F.length("props").cast("long").alias("x")))
    return stratified_ate(ev, ["g"], treat_col="t", outcome_col="y",
                          conf_col="x")


def sql_stratified_ate() -> str:
    return """WITH e AS (
  SELECT event_type AS g,
         CAST((event_id * 13) % 2 AS INTEGER) AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
         CAST(length(props) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND props IS NOT NULL),
b AS (
  SELECT g, t, y,
         ((RANK() OVER (PARTITION BY g ORDER BY x) - 1) * 5)
           // (COUNT(*) OVER (PARTITION BY g)) + 1 AS s
  FROM e),
cell AS (
  SELECT g, s,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS s0
  FROM b GROUP BY 1, 2),
agg AS (
  SELECT g, SUM(n1 + n0) AS n,
         SUM(CASE WHEN n1 > 0 AND n0 > 0 THEN n1 + n0 ELSE 0 END)
           AS n_used,
         CAST(SUM(CASE WHEN n1 > 0 AND n0 > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS k_strata,
         list(CASE WHEN n1 > 0 AND n0 > 0
                   THEN [CAST(n1 + n0 AS DOUBLE),
                         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)]
              END ORDER BY s)
           FILTER (WHERE n1 > 0 AND n0 > 0) AS terms
  FROM cell GROUP BY g)
SELECT g, n, n_used, k_strata, n - n_used AS n_dropped,
       CASE WHEN n_used > 0 THEN
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(terms,
             p -> p[1] / CAST(n_used AS DOUBLE) * p[2])),
           (a, q) -> a + q) END AS ate
FROM agg"""


ANALYTICS_QUERIES["stratified_ate"] = (q_stratified_ate,
                                       sql_stratified_ate)


_UCB_QMOD = 64


def q_ucb_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 rejection replay over the logged event stream per user
    cohort (operators/analytics.py ucb_replay): arms = event-type
    length mod 3 with hash rewards at 20/45/70%, one exact int64
    fold; the replayed policy must concentrate pulls on the best
    arm."""
    from .operators.analytics import ucb_replay

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull()
                  & (F.pmod(F.col("event_id"), F.lit(_UCB_QMOD)) == 0))
          .select(F.pmod(F.col("user_id"), F.lit(2)).alias("g"),
                  "ts", "event_id",
                  F.pmod(F.length("event_type"), F.lit(3)).cast("int")
                  .alias("a")))
    ev = ev.select("g", "ts", "event_id", "a",
                   (F.pmod(F.col("event_id") * 7, F.lit(100))
                    < F.lit(20) + 25 * F.col("a")).cast("int")
                   .alias("r"))
    return ucb_replay(ev, ["g"], order_cols=("ts", "event_id"),
                      arm_col="a", reward_col="r")


def sql_ucb_replay() -> str:
    def idx(arm: int) -> str:
        n = f"CAST(a[{arm + 2}] AS DOUBLE)"
        s = f"CAST(a[{arm + 5}] AS DOUBLE)"
        return (f"({s} / {n} + sqrt(2.0 * ln(CAST(a[1] AS DOUBLE))"
                f" / {n}))")

    pick = (f"CASE WHEN a[2] = 0 THEN 0 WHEN a[3] = 0 THEN 1 "
            f"WHEN a[4] = 0 THEN 2 "
            f"ELSE CASE WHEN {idx(2)} > (CASE WHEN {idx(1)} > {idx(0)} "
            f"THEN {idx(1)} ELSE {idx(0)} END) THEN 2 "
            f"WHEN {idx(1)} > {idx(0)} THEN 1 ELSE 0 END END")
    slots = [f"a[1] + CASE WHEN ({pick}) = x[1] THEN 1 ELSE 0 END"]
    for arm in range(3):
        slots.append(f"a[{arm + 2}] + CASE WHEN ({pick}) = x[1] "
                     f"AND x[1] = {arm} THEN 1 ELSE 0 END")
    for arm in range(3):
        slots.append(f"a[{arm + 5}] + CASE WHEN ({pick}) = x[1] "
                     f"AND x[1] = {arm} THEN x[2] ELSE 0 END")
    fold = ",\n             ".join(slots)
    return f"""WITH e AS (
  SELECT ((user_id % 2) + 2) % 2 AS g, ts, event_id,
         CAST(length(event_type) % 3 AS BIGINT) AS a,
         CASE WHEN (event_id * 7) % 100
                   < 20 + 25 * (length(event_type) % 3)
              THEN 1 ELSE 0 END AS r
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_id % {_UCB_QMOD} = 0),
ser AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_events,
         list([a, CAST(r AS BIGINT)]
              ORDER BY ts, event_id) AS xs
  FROM e GROUP BY g),
fin AS (
  SELECT g, n_events,
         list_reduce(
           list_prepend(CAST([0,0,0,0,0,0,0] AS BIGINT[]), xs),
           (a, x) -> [{fold}]) AS f
  FROM ser)
SELECT g, n_events, f[1] AS n_matched,
       f[5] + f[6] + f[7] AS reward_sum,
       CASE WHEN f[1] > 0
            THEN CAST(f[5] + f[6] + f[7] AS DOUBLE)
                 / CAST(f[1] AS DOUBLE) END AS ctr,
       f[2] AS pulls_0, f[3] AS pulls_1, f[4] AS pulls_2
FROM fin"""


ANALYTICS_QUERIES["ucb_replay"] = (q_ucb_replay, sql_ucb_replay)


_JENKS_CAP = 200
_JENKS_K = 4


def q_jenks_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jenks-Fisher natural breaks over a 200-value hash sample of
    cents per event type (operators/ml.py jenks_breaks): exact
    prefix-moment class costs, full O(k·n²) DP with pinned ties,
    breaks as class maxima — the choropleth classer beside
    quantile_bins."""
    from .operators.ml import jenks_breaks
    from pyspark.sql import Window

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"), _cents().alias("x"))
          .distinct())
    w = Window.partitionBy("g").orderBy(
        F.md5(F.concat_ws("\x1f", F.col("g"),
                          F.col("x").cast("string"))), "x")
    samp = (ev.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= _JENKS_CAP)
            .select("g", "x"))
    return jenks_breaks(samp, ["g"], "x", k=_JENKS_K)


def sql_jenks_breaks() -> str:
    # relational DP (join + window min per layer), NOT a fold mirror:
    # DuckDB's nested-lambda folds mis-evaluate once the outer
    # list_transform batch passes ~64 elements (caught by this gate
    # at n=200; single-element probes were fine) — and a genuinely
    # independent evaluation strategy is the stronger oracle anyway
    k = _JENKS_K

    def ssd(j: str, i: str) -> str:
        return (f"(CAST(({i} - {j}) * (q[{i} + 1] - q[{j} + 1])"
                f" - (p[{i} + 1] - p[{j} + 1])"
                f" * (p[{i} + 1] - p[{j} + 1]) AS DOUBLE)"
                f" / CAST({i} - {j} AS DOUBLE))")

    layers = []
    for c in range(2, k + 1):
        layers.append(f""",
cand{c} AS (
  SELECT pq.g, ii.i, jj.j,
         prev.cost + {ssd('jj.j', 'ii.i')} AS cost
  FROM pq,
       LATERAL (SELECT unnest(range({c}, pq.n + 1)) AS i) ii,
       LATERAL (SELECT unnest(range({c - 1}, ii.i)) AS j) jj
  JOIN l{c - 1} prev ON prev.g = pq.g AND prev.i = jj.j),
l{c} AS (
  SELECT g, i, cost, j FROM (
    SELECT g, i, cost, j,
           ROW_NUMBER() OVER (PARTITION BY g, i
                              ORDER BY cost, j) AS rn
    FROM cand{c}) WHERE rn = 1)""")
    joins = []
    jref = f"t{k}.j"
    for c in range(k - 1, 1, -1):
        joins.append(f"JOIN l{c} t{c} ON t{c}.g = pq.g "
                     f"AND t{c}.i = {jref}")
        jref = f"t{c}.j"
    brks = []
    jref = f"t{k}.j"
    for c in range(k - 1, 0, -1):
        brks.append(f"xs[CAST({jref} AS INTEGER)] AS break_{c}")
        if c > 1:
            jref = f"t{c}.j"
    sel = ", ".join(reversed(brks))
    return f"""WITH e AS (
  SELECT DISTINCT event_type AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
samp AS (
  SELECT g, x FROM (
    SELECT g, x, ROW_NUMBER() OVER (PARTITION BY g
      ORDER BY md5(concat_ws(chr(31), g, CAST(x AS VARCHAR))), x)
      AS rn
    FROM e) WHERE rn <= {_JENKS_CAP}),
ser AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         list(x ORDER BY x) AS xs
  FROM samp GROUP BY g HAVING COUNT(*) >= {k}),
pq AS (
  SELECT g, n, xs,
         list_transform(range(0, n + 1), i ->
           CASE WHEN i = 0 THEN CAST(0 AS BIGINT)
                ELSE list_reduce(list_slice(xs, 1, i),
                                 (a, b) -> a + b) END) AS p,
         list_transform(range(0, n + 1), i ->
           CASE WHEN i = 0 THEN CAST(0 AS BIGINT)
                ELSE list_reduce(
                  list_transform(list_slice(xs, 1, i), v -> v * v),
                  (a, b) -> a + b) END) AS q
  FROM ser),
l1 AS (
  SELECT pq.g, ii.i, {ssd('0', 'ii.i')} AS cost,
         CAST(0 AS BIGINT) AS j
  FROM pq, LATERAL (SELECT unnest(range(1, pq.n + 1)) AS i) ii)
{"".join(layers)}
SELECT pq.g, pq.n, t{k}.cost AS total_cost,
       {sel},
       xs[1] AS x_min, xs[CAST(pq.n AS INTEGER)] AS x_max
FROM pq
JOIN l{k} t{k} ON t{k}.g = pq.g AND t{k}.i = pq.n
{chr(10).join(joins)}"""


ANALYTICS_QUERIES["jenks_breaks"] = (q_jenks_breaks, sql_jenks_breaks)


def q_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI / CR4 / top-share / Atkinson(1) of user-cohort activity per
    event type (operators/analytics.py concentration_profile): exact
    count rationals, one pinned ln fold — the market-structure panel
    beside gini/theil."""
    from .operators.analytics import concentration_profile

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("user_id").isNotNull())
          .select(F.col("event_type").alias("g"),
                  F.pmod(F.col("user_id"), F.lit(50)).alias("f")))
    return concentration_profile(ev, ["g"], "f")


def sql_concentration() -> str:
    return """WITH e AS (
  SELECT event_type AS g, ((user_id % 50) + 50) % 50 AS f
  FROM events WHERE user_id IS NOT NULL),
firm AS (
  SELECT g, f, CAST(COUNT(*) AS BIGINT) AS c
  FROM e GROUP BY 1, 2),
per AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_firms,
         SUM(c) AS total, SUM(c * c) AS sq,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_slice(list(c ORDER BY -c, f), 1, 4)),
           (a, q) -> a + q) AS cr4_sum,
         list(c ORDER BY -c, f)[1] AS top_c,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(ln(CAST(c AS DOUBLE)) ORDER BY c, f)),
           (a, q) -> a + q) AS lnsum
  FROM firm GROUP BY g)
SELECT g, n_firms, total,
       CAST(sq AS DOUBLE) / CAST(total * total AS DOUBLE) AS hhi,
       CAST(cr4_sum AS DOUBLE) / CAST(total AS DOUBLE) AS cr4,
       CAST(top_c AS DOUBLE) / CAST(total AS DOUBLE) AS top_share,
       1.0 - exp(lnsum / CAST(n_firms AS DOUBLE))
           / (CAST(total AS DOUBLE) / CAST(n_firms AS DOUBLE))
         AS atkinson
FROM per"""


ANALYTICS_QUERIES["concentration"] = (q_concentration,
                                      sql_concentration)


def q_mdlp_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDLP root split of dollar-scaled cents against the platt-gate
    hash labels per event type (operators/ml.py mdlp_split): exact
    class-count entropies, Fayyad-Irani acceptance bar — the
    entropy/MDL sibling of decision_stump."""
    from .operators.ml import mdlp_split

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"), "event_id",
                  (F.floor(_cents() / 100)).cast("long").alias("x")))
    thr = F.least(F.greatest(F.lit(300) + F.col("x"), F.lit(1)),
                  F.lit(999))
    ev = ev.select("g", "x",
                   (F.pmod(F.col("event_id") * 7919, F.lit(1000))
                    < thr).cast("int").alias("y"))
    return mdlp_split(ev, ["g"], val_col="x", label_col="y")


def sql_mdlp_split() -> str:
    import math

    ln2 = math.log(2.0)
    ent = ("(CASE WHEN {m} > 0 THEN ln(CAST({m} AS DOUBLE))"
           " - ((CASE WHEN {c1} > 0 THEN CAST({c1} AS DOUBLE)"
           " * ln(CAST({c1} AS DOUBLE)) ELSE 0.0 END)"
           " + (CASE WHEN {m} - {c1} > 0 THEN CAST({m} - {c1} AS DOUBLE)"
           " * ln(CAST({m} - {c1} AS DOUBLE)) ELSE 0.0 END))"
           " / CAST({m} AS DOUBLE) ELSE 0.0 END)")
    kc = ("((CASE WHEN {c1} > 0 THEN 1 ELSE 0 END)"
          " + (CASE WHEN {m} - {c1} > 0 THEN 1 ELSE 0 END))")
    hs = ent.format(m="n", c1="n1")
    h1 = ent.format(m="nl", c1="nl1")
    h2 = ent.format(m="(n - nl)", c1="(n1 - nl1)")
    k = kc.format(m="n", c1="n1")
    k1 = kc.format(m="nl", c1="nl1")
    k2 = kc.format(m="(n - nl)", c1="(n1 - nl1)")
    gain = (f"({hs} - CAST(nl AS DOUBLE) / CAST(n AS DOUBLE) * {h1}"
            f" - CAST(n - nl AS DOUBLE) / CAST(n AS DOUBLE) * {h2})")
    thr = (f"(((ln(CAST(n - 1 AS DOUBLE)) / {ln2!r}"
           f" + (ln(pow(3.0, CAST({k} AS DOUBLE)) - 2.0) / {ln2!r}"
           f" - (CAST({k} AS DOUBLE) * {hs}"
           f" - CAST({k1} AS DOUBLE) * {h1}"
           f" - CAST({k2} AS DOUBLE) * {h2}) / {ln2!r}))"
           f" / CAST(n AS DOUBLE)) * {ln2!r})")
    return f"""WITH e AS (
  SELECT event_type AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS x,
         CASE WHEN (event_id * 7919) % 1000
                   < least(greatest(300
                       + CAST(floor(value * 100 + 0.5) AS BIGINT)
                         // 100, 1), 999)
              THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL),
vals AS (
  SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(y) AS BIGINT) AS c1
  FROM e GROUP BY 1, 2),
cum AS (
  SELECT g, x,
         SUM(c) OVER (PARTITION BY g ORDER BY x) AS nl,
         SUM(c1) OVER (PARTITION BY g ORDER BY x) AS nl1,
         SUM(c) OVER (PARTITION BY g) AS n,
         SUM(c1) OVER (PARTITION BY g) AS n1,
         MAX(x) OVER (PARTITION BY g) AS xmax
  FROM vals),
cand AS (
  SELECT g, x AS split_value, n, {k} AS k_classes,
         {gain} AS gain_nats, {thr} AS threshold_nats
  FROM cum WHERE x < xmax),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY g
      ORDER BY gain_nats DESC, split_value) AS rn
    FROM cand) WHERE rn = 1),
allg AS (
  SELECT g, MAX(n) AS n, MAX(n1) AS n1 FROM cum GROUP BY g)
SELECT a.g, a.n,
       coalesce(b.k_classes, {kc.format(m='a.n', c1='a.n1')})
         AS k_classes,
       b.split_value, b.gain_nats, b.threshold_nats,
       coalesce(b.gain_nats > b.threshold_nats, FALSE) AS accepted
FROM allg a LEFT JOIN best b ON b.g = a.g"""


ANALYTICS_QUERIES["mdlp_split"] = (q_mdlp_split, sql_mdlp_split)


def q_spiegelhalter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter calibration Z per event type over hash forecasts
    (operators/stats.py spiegelhalter_z): integer-milli
    probabilities, outcomes drawn at the forecast rate by an
    independent hash — exact int64 sums, one √-chain; calibrated by
    construction, so |Z| stays in the null band."""
    from .operators.stats import spiegelhalter_z

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select(F.col("event_type").alias("g"),
                  (F.pmod(F.col("event_id") * 37, F.lit(999)) + 1)
                  .alias("m"), "event_id"))
    ev = ev.select("g", "m",
                   (F.pmod(F.col("event_id") * 7919, F.lit(1000))
                    < F.col("m")).cast("int").alias("y"))
    return spiegelhalter_z(ev, ["g"], p_millis_col="m", label_col="y")


def sql_spiegelhalter() -> str:
    return """WITH e AS (
  SELECT event_type AS g,
         (event_id * 37) % 999 + 1 AS m,
         CASE WHEN (event_id * 7919) % 1000 < (event_id * 37) % 999 + 1
              THEN 1 ELSE 0 END AS y
  FROM events)
SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((1000 * y - m) * (1000 - 2 * m)) AS BIGINT) AS z_num,
       CAST(SUM((1000 - 2 * m) * (1000 - 2 * m) * m * (1000 - m))
            AS BIGINT) AS z_den,
       CASE WHEN SUM((1000 - 2 * m) * (1000 - 2 * m) * m * (1000 - m))
                 > 0
            THEN CAST(SUM((1000 * y - m) * (1000 - 2 * m)) AS DOUBLE)
                 / sqrt(CAST(SUM((1000 - 2 * m) * (1000 - 2 * m)
                                 * m * (1000 - m)) AS DOUBLE)) END AS z
FROM e GROUP BY g"""


ANALYTICS_QUERIES["spiegelhalter"] = (q_spiegelhalter,
                                      sql_spiegelhalter)


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE/IV screen of the discount feature against returns
    (operators/ml.py woe_iv): per discount-percent bin the µ-nat
    quantized weight of evidence ln(g·B/(b·G)) and exact-numerator IV
    contribution — the credit-scoring feature screen."""
    from .operators.ml import woe_iv

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long").alias("disc_pts"),
        (F.col("l_returnflag") == "R").alias("bad"))
    return woe_iv(li, "disc_pts", "bad")


def sql_woe_iv() -> str:
    return """
WITH r AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS bin,
         l_returnflag = 'R' AS bad
  FROM lineitem),
per AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN bad THEN 0 ELSE 1 END) AS BIGINT)
           AS n_good,
         CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bad
  FROM r GROUP BY 1),
tot AS (SELECT CAST(SUM(n_good) AS BIGINT) AS g,
               CAST(SUM(n_bad) AS BIGINT) AS b FROM per),
w AS (
  SELECT per.bin, per.n, per.n_good, per.n_bad, tot.g, tot.b,
         CASE WHEN per.n_good > 0 AND per.n_bad > 0 THEN
           CAST(floor(ln(CAST(per.n_good * tot.b AS DOUBLE)
                         / CAST(per.n_bad * tot.g AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) END AS woe_micro
  FROM per, tot)
SELECT bin, n, n_good, n_bad, woe_micro,
       CASE WHEN n_good > 0 AND n_bad > 0 THEN
         (CAST(n_good * b - n_bad * g AS DOUBLE)
          / CAST(g * b AS DOUBLE))
         * (CAST(woe_micro AS DOUBLE) / 1000000.0) END AS iv_part
FROM w"""


ANALYTICS_QUERIES["woe_iv"] = (q_woe_iv, sql_woe_iv)


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-return-flag price distributions
    (operators/stats.py quantile_normalize): each flag's cents mapped
    onto the pooled order statistics at ceil(r·N/n_g) — exact integer
    positions, id-tiebroken ranks, fully value-hashed."""
    from .operators.stats import quantile_normalize

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long").alias("cents"))
    # rid repeats in the reduced schema: make the tiebreak unique
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag", "rid").orderBy("cents")
    li = li.withColumn(
        "uid", F.col("rid") * 10 + F.row_number().over(w))
    return quantile_normalize(li, ["l_returnflag"], "cents", "uid")


def sql_quantile_normalize() -> str:
    return """
WITH base0 AS (
  SELECT l_returnflag AS g,
         l_orderkey * 10 + l_linenumber AS rid,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem),
base AS (
  SELECT g, rid * 10 + ROW_NUMBER() OVER (PARTITION BY g, rid
                                          ORDER BY v) AS id, v
  FROM base0),
ng AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g FROM base GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
ranked AS (
  SELECT b.g, b.id, b.v,
         ROW_NUMBER() OVER (PARTITION BY b.g ORDER BY b.v, b.id) AS r,
         ng.n_g, tot.n
  FROM base b JOIN ng USING (g) CROSS JOIN tot),
pooled AS (
  SELECT v AS pv, ROW_NUMBER() OVER (ORDER BY v) AS p FROM base)
SELECT ranked.g AS l_returnflag, ranked.id, ranked.v,
       pooled.pv AS v_norm
FROM ranked JOIN pooled
  ON pooled.p = (ranked.r * ranked.n + ranked.n_g - 1)
              // ranked.n_g"""


ANALYTICS_QUERIES["quantile_normalize"] = (q_quantile_normalize,
                                           sql_quantile_normalize)
