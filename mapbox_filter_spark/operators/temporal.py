"""Temporal operators: as-of join, interval (range) join, sessionization,
hypertable-style time rollups.

The reference engine has no time axis (SURVEY §1.4 — its dataflow is a
one-shot tile rebuild), but a 100 TB training-data pipeline lives on one:
joining telemetry to the most recent config change (as-of), attributing
events to maintenance/incident windows (interval join), splitting user
activity into sessions (gap sessionization), and maintaining continuous
aggregates at several grains (time rollup).  Each operator here is a
composition of built-in DataFrame ops — no UDFs, no crossJoin, no
driver-side loops — with the shuffle structure chosen for the 100 TB case:

* ``asof_join``      — ONE hash shuffle on the join key (union + ordered
                       window carry-forward), never a range join or BNLJ.
* ``interval_join``  — time-bucketed equi join: both sides shuffle once on
                       (key, bucket); each interval explodes to at most
                       ``ceil(len/bucket)+1`` buckets, so the fan-out is
                       bounded and chosen by the caller.
* ``sessionize``     — ONE shuffle on the session key; gap detection and
                       session numbering are a lag + running-sum window.
* ``time_rollup``    — aggregate once at the finest grain, then re-aggregate
                       the *partials* to every coarser grain (sum-of-sums,
                       min-of-mins…) — the continuous-aggregate pattern:
                       coarse grains never rescan the raw table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "interval_join",
    "sessionize",
    "session_stats",
    "time_bucket",
    "time_rollup",
    "fine_partial",
    "merge_partials",
    "rollup_from_partial",
    "write_rollup_partial",
    "read_rollup_partial",
    "refresh_rollup_partial",
    "histogram_rollup",
    "distinct_rollup",
    "funnel",
    "c_chart",
    "hurst_rs",
]

_US = 1_000_000  # microseconds per second


def _us(col: Column) -> Column:
    # Epoch microseconds.  ``unix_micros`` rejects TIMESTAMP_NTZ (the type
    # parquet timestamps load as), so cast first; with the engine-wide
    # UTC session timezone (session.py) the cast is value-preserving.
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_s: float | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the nearest preceding (``backward``) or
    following (``forward``) right row with the same key.

    Implemented as the *union trick*: tag both sides, union, and run a
    single keyed window that carries the most recent right payload forward
    (or backward).  This is one hash shuffle on ``on`` + an in-partition
    sort — the scalable shape; a naive range join is O(|L|·|R|) per key and
    a broadcast range join caps the right side at driver memory.

    Determinism: when several right rows share one timestamp the carried
    row is the one greatest under ``tiebreak`` (a right column, e.g. its
    id).  Pass ``tiebreak`` whenever right (key, ts) is not unique.

    ``allow_exact_matches`` mirrors pandas ``merge_asof``: if True a right
    row at exactly the left timestamp is eligible (``l.ts >= r.ts``),
    matching DuckDB's ``ASOF JOIN`` inequality.

    Unmatched left rows are kept with NULL right columns (left outer
    semantics, like ``merge_asof``); apply ``tolerance_s`` to also null out
    matches farther than that many seconds away.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    rtypes = dict(zip(right.columns, [f.dataType for f in right.schema.fields]))
    ltypes = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))

    lt = left.select(
        *on,
        _us(F.col(left_ts)).alias("_ts_us"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(rtypes[c]).alias(c + suffix) for c in rpay],
    )
    rt = right.select(
        *on,
        _us(F.col(right_ts)).alias("_ts_us"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpay],
        *[F.col(c).alias(c + suffix) for c in rpay],
    )
    u = lt.unionByName(rt)

    # Backward: ascending time, right rows first at equal ts iff exact
    # matches are allowed.  Forward: the mirror image.
    asc = direction == "backward"
    right_first = allow_exact_matches
    ts_ord = F.col("_ts_us").asc() if asc else F.col("_ts_us").desc()
    side_ord = (F.col("_is_left").asc() if right_first
                else F.col("_is_left").desc())
    order = [ts_ord, side_ord]
    if tiebreak is not None:
        tb = F.col(tiebreak + suffix)
        # Among equal-ts right rows the LAST in window order wins the
        # carry-forward, so ascending tiebreak selects the greatest.
        order.append(tb.asc() if asc else tb.desc())
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    carried = u.select(
        *on, "_ts_us", "_is_left", *lpay,
        *[F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
          for c in rpay],
        F.last(F.when(F.col("_is_left") == 0, F.col("_ts_us")),
               ignorenulls=True).over(w).alias("_rts_us"),
    )

    out = carried.filter(F.col("_is_left") == 1)
    gap = (F.col("_ts_us") - F.col("_rts_us") if asc
           else F.col("_rts_us") - F.col("_ts_us"))
    if tolerance_s is not None:
        keep = F.col("_rts_us").isNotNull() & (gap <= int(tolerance_s * _US))
        out = out.select(
            *on, "_ts_us", *lpay,
            *[F.when(keep, F.col(c + suffix)).alias(c + suffix)
              for c in rpay],
            F.when(keep, gap).alias("_gap_us"),
        )
    else:
        out = out.select(*on, "_ts_us", *lpay,
                         *[F.col(c + suffix) for c in rpay],
                         gap.alias("_gap_us"))
    return out.withColumn("asof_gap_us", F.col("_gap_us")) \
              .drop("_gap_us", "_ts_us")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: list[str],
    *,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_s: int,
    how: str = "inner",
    inclusive_end: bool = False,
) -> DataFrame:
    """Join point events to the intervals containing them: a range join
    rewritten as a time-bucketed EQUI join.

    Both sides get ``_bkt = floor(epoch_us / bucket_s·1e6)``; intervals
    explode to every bucket they touch (``sequence`` — bounded fan-out of
    ``ceil(len/bucket_s)+1`` rows) and the join is a plain hash join on
    ``on + [_bkt]`` with the exact containment predicate as a residual.
    An event has exactly one bucket and an interval lists each bucket once,
    so no post-join dedup is needed.  Pick ``bucket_s`` near the typical
    interval length: each interval then explodes to ≤ 2 rows while buckets
    stay selective.  This is partition-parallel at any table size — the
    planner never falls back to a broadcast-nested-loop over the raw range
    predicate.

    ``how='left'`` keeps empty intervals (interval cols + NULL event cols);
    a left outer on the bucketed join yields one NULL row *per exploded
    bucket* for an unmatched interval, which any per-interval aggregation
    collapses (counts ignore NULLs) — callers doing row-level work should
    aggregate or de-dup on the interval key.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    bu = int(bucket_s) * _US

    # floor (not cast) so pre-1970 timestamps bucket correctly.
    ev = events.withColumn(
        "_bkt", F.floor(_us(F.col(ts)) / F.lit(bu)).cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor(_us(F.col(start)) / F.lit(bu)).cast("long"),
            F.floor(_us(F.col(end)) / F.lit(bu)).cast("long"))),
    )

    upper = (F.col(f"__iv.{end}") >= F.col(f"__ev.{ts}") if inclusive_end
             else F.col(f"__iv.{end}") > F.col(f"__ev.{ts}"))
    cond = F.col(f"__ev.{ts}") >= F.col(f"__iv.{start}")
    for k in on:
        cond = cond & (F.col(f"__ev.{k}") == F.col(f"__iv.{k}"))
    cond = cond & (F.col("__ev._bkt") == F.col("__iv._bkt")) & upper

    ev = ev.alias("__ev")
    iv = iv.alias("__iv")
    if how == "inner":
        j = iv.join(ev, cond, "inner")
    else:
        j = iv.join(ev, cond, "left")
    ev_cols = [F.col(f"__ev.{c}").alias(c) for c in events.columns]
    iv_cols = [F.col(f"__iv.{c}").alias(f"iv_{c}" if c in events.columns
                                        else c)
               for c in intervals.columns]
    return j.select(*iv_cols, *ev_cols)


def sessionize(
    events: DataFrame,
    key: list[str],
    *,
    ts: str = "ts",
    gap_s: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session numbers: rows of one key whose consecutive
    gaps are all ≤ ``gap_s`` share a ``session_id`` (1-based per key).

    One shuffle on ``key``; the gap test is a ``lag`` and the numbering a
    running sum of boundary flags over the same window — both execute in
    a single in-partition sort pass.  Equivalent to (and tested against)
    Spark's built-in ``session_window`` aggregation, but keeps the
    event→session assignment, which ``session_window`` discards.
    """
    order = [F.col(ts).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key).orderBy(*order)
    prev = F.lag(_us(F.col(ts))).over(w)
    boundary = (prev.isNull()
                | ((_us(F.col(ts)) - prev) > int(gap_s * _US)))
    run = (Window.partitionBy(*key).orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn(
        "session_id",
        F.sum(boundary.cast("long")).over(run))


def session_stats(sessions: DataFrame, key: list[str],
                  *, ts: str = "ts",
                  value: str | None = None) -> DataFrame:
    """Collapse ``sessionize`` output to one row per session."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (_us(F.max(ts)) - _us(F.min(ts))).alias("duration_us"),
    ]
    if value is not None:
        # Exact integer-cents sum (the time_rollup recipe): double summation
        # is order-dependent, so ROUND(SUM(double), 2) can flip at a
        # half-cent boundary depending on partial-agg merge order — the one
        # red driver row of round 5.  Values are quantized to cents with the
        # cross-engine HALF-UP quantizer floor(x*100 + 0.5) (contract:
        # non-negative values, ≤ 2 meaningful decimals), summed exactly in
        # int64, and divided once — deterministic under any partitioning.
        cents = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long")
        aggs.append((F.sum(cents) / 100.0).alias("session_value"))
    return sessions.groupBy(*key, "session_id").agg(*aggs)


def time_bucket(col: Column, width_s: int) -> Column:
    """Truncate a timestamp to a ``width_s``-second grid (epoch-aligned),
    like TimescaleDB's ``time_bucket``.  Pure column arithmetic — stays in
    whole-stage codegen."""
    w = int(width_s) * _US
    return F.timestamp_micros(
        (F.floor(_us(col) / F.lit(w)).cast("long") * F.lit(w)))


def time_rollup(
    events: DataFrame,
    *,
    ts: str = "ts",
    value: str,
    group: list[str],
    grains_s: list[int],
    reuse_partials: bool = True,
) -> DataFrame:
    """Continuous-aggregate rollup: aggregate the raw table ONCE at the
    finest grain, then derive every coarser grain from those partials.

    ``grains_s`` must be ascending and each coarser grain an integer
    multiple of the finest (so fine buckets nest exactly).  The partial at
    the finest grain carries (count, sum, min, max); coarser grains
    re-aggregate with sum-of-counts / sum-of-sums / min-of-mins /
    max-of-maxs, and ``avg`` is derived as sum/count at every grain (an
    avg-of-avgs would weight buckets, not rows).  At 100 TB this is the
    difference between one scan of the raw table and one scan per grain;
    it is also exactly how an incremental materialized rollup refreshes —
    recompute touched fine buckets, re-roll the coarse ones from partials.

    Output: one row per (grain_s, bucket_start, *group) with n / vsum /
    vmin / vmax / vavg.
    """
    _check_grains(grains_s)
    fine = grains_s[0]

    partial = fine_partial(events, ts=ts, value=value, group=group,
                           fine_s=fine)
    if reuse_partials and len(grains_s) > 1:
        # Without this each union branch re-executes the whole partial
        # subtree — one RAW-TABLE SCAN PER GRAIN.  Persisting the (much
        # smaller) fine partial makes coarse grains read it instead;
        # tests assert exactly one FileScan in the plan.  MEMORY_AND_DISK
        # so a partial bigger than executor memory spills, not OOMs.
        from pyspark import StorageLevel

        partial = partial.persist(StorageLevel.MEMORY_AND_DISK)
    return rollup_from_partial(partial, group=group, grains_s=grains_s)


def _check_grains(grains_s: list[int]) -> None:
    if not grains_s or sorted(grains_s) != list(grains_s):
        raise ValueError("grains_s must be ascending and non-empty")
    for g in grains_s[1:]:
        if g % grains_s[0] != 0:
            raise ValueError(f"grain {g} is not a multiple of {grains_s[0]}")


def fine_partial(events: DataFrame, *, ts: str = "ts", value: str,
                 group: list[str], fine_s: int) -> DataFrame:
    """The finest-grain partial: (bucket, *group) → count/sum/min/max.
    The mergeable representation every coarser grain — and the
    incremental refresh — re-aggregates."""
    return (
        events
        .withColumn("_bucket", time_bucket(F.col(ts), fine_s))
        .groupBy("_bucket", *group)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(value).alias("vsum"),
             F.min(value).alias("vmin"),
             F.max(value).alias("vmax"))
    )


def merge_partials(a: DataFrame, b: DataFrame,
                   group: list[str]) -> DataFrame:
    """Combine two partial tables over the same grain: counts and sums
    add, min/max fold — the associative merge that makes the partial
    representation incrementally maintainable."""
    return (a.unionByName(b)
            .groupBy("_bucket", *group)
            .agg(F.sum("n").alias("n"),
                 F.sum("vsum").alias("vsum"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax")))


def rollup_from_partial(partial: DataFrame, *, group: list[str],
                        grains_s: list[int]) -> DataFrame:
    """Derive every requested grain from a finest-grain partial —
    never touches the raw table."""
    _check_grains(grains_s)

    def finish(df: DataFrame, width: int) -> DataFrame:
        # No rounding here: feed an exact column (integer units, decimal)
        # for bit-reproducible rollups — fp sums of raw doubles are
        # order-dependent and engine-dependent at the last ulp.
        return df.select(
            F.lit(width).alias("grain_s"),
            F.col("_bucket").alias("bucket_start"),
            *group,
            "n",
            "vsum", "vmin", "vmax",
            (F.col("vsum") / F.col("n")).alias("vavg"),
        )

    out = finish(partial, grains_s[0])
    for g in grains_s[1:]:
        coarse = (
            partial
            .withColumn("_bucket", time_bucket(F.col("_bucket"), g))
            .groupBy("_bucket", *group)
            .agg(F.sum("n").alias("n"),
                 F.sum("vsum").alias("vsum"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax"))
        )
        out = out.unionByName(finish(coarse, g))
    return out


def funnel(
    events: DataFrame,
    key: list[str],
    *,
    ts: str = "ts",
    step_col: str,
    steps: list[str],
    within_s: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel per key: the earliest time each step
    can complete given the previous step happened first (step i's time =
    the first step-i event at or after step i-1's time).

    ONE shuffle: a single groupBy collects, per key, the SORTED
    timestamp array of each step's events (arrays hold only matching
    events — bounded by per-key step cardinality, the same bound any
    per-entity analysis carries), and the chaining walk is a native
    column fold over those k arrays — no k-round join chain, no window.

    ``within_s`` additionally requires the whole funnel to complete
    within that many seconds of step 1 (later steps beyond the deadline
    are nulled).

    Output: one row per key with ``step{i}_us`` epoch-micro columns
    (NULL once the chain breaks) and ``completed``.
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    aggs = [
        F.sort_array(F.collect_list(
            F.when(F.col(step_col) == F.lit(s), _us(F.col(ts)))))
        .alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    g = events.groupBy(*key).agg(*aggs)

    t_prev = F.array_min(F.col("_a0"))
    out_cols = [t_prev.alias("step0_us")]
    cols = {"step0_us": t_prev}

    def _ge(threshold):
        # NOTE: a two-parameter lambda (even with a default) makes
        # F.filter pass the ELEMENT INDEX as the second argument — close
        # over the threshold instead.
        return lambda t: t >= threshold

    for i in range(1, len(steps)):
        prev = cols[f"step{i - 1}_us"]
        nxt = F.array_min(F.filter(F.col(f"_a{i}"), _ge(prev)))
        if within_s is not None:
            deadline = cols["step0_us"] + int(within_s * _US)
            nxt = F.when(nxt <= deadline, nxt)
        cols[f"step{i}_us"] = nxt
        out_cols.append(nxt.alias(f"step{i}_us"))
    completed = cols[f"step{len(steps) - 1}_us"].isNotNull()
    return g.select(*key, *out_cols, completed.alias("completed"))


def distinct_rollup(
    events: DataFrame,
    *,
    ts: str = "ts",
    entity: str,
    group: list[str],
    grains_s: list[int],
) -> DataFrame:
    """Distinct-entity counts at every grain from a mergeable partial.

    COUNT(DISTINCT) is not mergeable as a number — two hourly counts of
    distinct users don't add — but the distinct (bucket, group, entity)
    PAIR SET is: coarser grains re-bucket the pairs, re-distinct, and
    count.  The raw table is scanned once; the fine pair set (bounded by
    sum of per-bucket cardinalities, far below raw volume) is persisted
    and reused per grain.  This is the exact path; at cardinalities
    where even the pair set hurts, swap the partial for an HLL sketch
    (``hll_sketch_agg`` / ``hll_union_agg`` — tested within-error in
    tests/test_temporal.py) at the cost of exactness.

    Output: (grain_s, bucket_start, *group, n_distinct).
    """
    _check_grains(grains_s)
    fine = grains_s[0]
    pairs = (events
             .withColumn("_bucket", time_bucket(F.col(ts), fine))
             .select("_bucket", *group, entity)
             .distinct())
    if len(grains_s) > 1:
        from pyspark import StorageLevel

        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)

    def count_at(df: DataFrame, grain: int) -> DataFrame:
        return (df.groupBy("_bucket", *group)
                .agg(F.count(F.lit(1)).alias("n_distinct"))
                .select(F.lit(grain).alias("grain_s"),
                        F.col("_bucket").alias("bucket_start"),
                        *group, "n_distinct"))

    out = count_at(pairs, fine)
    for g in grains_s[1:]:
        coarse = (pairs
                  .withColumn("_bucket", time_bucket(F.col("_bucket"), g))
                  .select("_bucket", *group, entity)
                  .distinct())
        out = out.unionByName(count_at(coarse, g))
    return out


def histogram_rollup(
    events: DataFrame,
    *,
    ts: str = "ts",
    value: str,
    group: list[str],
    grains_s: list[int],
    lo: float,
    hi: float,
    n_bins: int,
    quantiles: list[float],
) -> DataFrame:
    """Mergeable-sketch rollup: approximate quantiles at every grain from
    BINNED partials, the pattern for percentiles in a continuous
    aggregate (exact percentiles are not mergeable: you cannot combine
    two hourly p99s into a daily p99 — but histogram counts merge by
    addition, and the quantile is derived after the merge).

    The fine partial is (bucket, *group, bin) → count with
    ``bin = clamp(floor((v - lo) · n_bins / (hi - lo)), 0, n_bins-1)``;
    coarser grains sum the counts.  Quantile estimate: find the bin where
    the cumulative count crosses ``q·total`` and interpolate linearly
    inside it.  Guarantee: the estimate shares a bin with the ⌈q·n⌉-th
    smallest value, so the error vs THAT rank is at most one bin width
    ``(hi-lo)/n_bins`` — caller-chosen, independent of data volume.
    (Relative to the q·(n−1)-interpolated ``percentile`` convention the
    target rank can differ by one, which matters only in sparse tails.)

    Output: (grain_s, bucket_start, *group, q, n, est).  Rows with
    values outside [lo, hi) clamp into the edge bins (count toward the
    estimate; the error bound then only holds for in-range data).
    """
    _check_grains(grains_s)
    if n_bins <= 0 or hi <= lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    if not quantiles or any(not 0 < q < 1 for q in quantiles):
        raise ValueError("quantiles must be in (0,1)")
    width = (hi - lo) / n_bins
    fine = grains_s[0]

    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(value) - F.lit(lo)) * F.lit(n_bins)
            / F.lit(hi - lo)).cast("int")))
    partial = (events
               .withColumn("_bucket", time_bucket(F.col(ts), fine))
               .withColumn("_bin", bin_col)
               .groupBy("_bucket", *group, "_bin")
               .agg(F.count(F.lit(1)).alias("n")))
    if len(grains_s) > 1:
        from pyspark import StorageLevel

        partial = partial.persist(StorageLevel.MEMORY_AND_DISK)

    def estimate(df: DataFrame, grain: int) -> DataFrame:
        keys = ["_bucket", *group]
        w_cum = (Window.partitionBy(*keys).orderBy("_bin")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        w_tot = Window.partitionBy(*keys)
        cum = df.withColumn("_cum", F.sum("n").over(w_cum)) \
            .withColumn("_tot", F.sum("n").over(w_tot))
        out = None
        for q in quantiles:
            t = F.lit(q) * F.col("_tot")
            hit = cum.filter((F.col("_cum") >= t)
                             & ((F.col("_cum") - F.col("n")) < t))
            est = (F.lit(lo)
                   + (F.col("_bin")
                      + (t - (F.col("_cum") - F.col("n"))) / F.col("n"))
                   * F.lit(width))
            sel = hit.select(
                F.lit(grain).alias("grain_s"),
                F.col("_bucket").alias("bucket_start"),
                *group,
                F.lit(q).alias("q"),
                F.col("_tot").alias("n"),
                est.alias("est"))
            out = sel if out is None else out.unionByName(sel)
        return out

    result = estimate(partial, fine)
    for g in grains_s[1:]:
        coarse = (partial
                  .withColumn("_bucket", time_bucket(F.col("_bucket"), g))
                  .groupBy("_bucket", *group, "_bin")
                  .agg(F.sum("n").alias("n")))
        result = result.unionByName(estimate(coarse, g))
    return result


_PDAY = "_pday"  # partition column of the persistent partial store


def write_rollup_partial(events: DataFrame, path: str, *,
                         ts: str = "ts", value: str, group: list[str],
                         fine_s: int, mode: str = "overwrite") -> None:
    """Materialize the finest-grain partial, partitioned by bucket DAY —
    the unit the incremental refresh later overwrites."""
    p = fine_partial(events, ts=ts, value=value, group=group,
                     fine_s=fine_s)
    (p.withColumn(_PDAY, F.to_date("_bucket"))
     .write.mode(mode).partitionBy(_PDAY).parquet(path))


def read_rollup_partial(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(_PDAY)


def refresh_rollup_partial(spark, new_events: DataFrame, path: str, *,
                           ts: str = "ts", value: str, group: list[str],
                           fine_s: int) -> int:
    """Incrementally fold a new (append-only, exactly-once) event batch
    into the persistent partial store: compute the batch's fine partials,
    merge them with the existing partials of the TOUCHED DAYS only, and
    dynamic-partition-overwrite just those day partitions.  History days
    are neither read nor rewritten — the refresh cost scales with the
    batch's time span, not the table's.  Returns the number of day
    partitions rewritten."""
    delta = (fine_partial(new_events, ts=ts, value=value, group=group,
                          fine_s=fine_s)
             .withColumn(_PDAY, F.to_date("_bucket")))
    days = [r[_PDAY] for r in delta.select(_PDAY).distinct().collect()]
    if not days:
        return 0
    existing = (spark.read.parquet(path)
                .filter(F.col(_PDAY).isin(days)))  # partition pruning
    merged = (merge_partials(existing.drop(_PDAY), delta.drop(_PDAY),
                             group)
              .withColumn(_PDAY, F.to_date("_bucket")))
    with _dynamic_overwrite(spark):
        merged.write.mode("overwrite").partitionBy(_PDAY).parquet(path)
    return len(days)


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic: the
    overwrite replaces only the partitions present in the written data."""

    _KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self._KEY, "static")
        self.spark.conf.set(self._KEY, "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set(self._KEY, self.prev)
        return False


def gapfill_locf(
    df: DataFrame,
    on: "list[str]",
    ts_us: str = "ts_us",
    tick_us: int = 86_400_000_000,
    tiebreak: "str | None" = None,
) -> DataFrame:
    """Regular-grid LOCF resample — the hypertable
    ``time_bucket_gapfill(...) + locf()`` shape: for every key, a dense
    tick grid spanning its own [min, max] bucket range, each tick
    carrying the last observation at or before the tick's END.

    Implemented as grid-generation (bounded ``sequence`` explode off a
    per-key min/max aggregate) + the as-of union trick (asof_join) — so
    the whole gap-fill is the as-of join's ONE keyed shuffle plus the
    tiny bounds aggregate, never a per-key range join.  Right payload
    columns come back suffixed ``_r`` (asof_join convention); ticks
    before a key's first observation cannot exist by construction, so
    every grid row matches.

    ``ts_us`` is epoch MICROS (long).  asof_join normalizes its ts
    columns through a timestamp cast, and a long→timestamp cast reads
    SECONDS (overflowing on micros), so both sides are materialized as
    real timestamps via ``timestamp_micros`` before the join — exact,
    since unix_micros(timestamp_micros(x)) == x.
    """
    bounds = df.groupBy(*on).agg(
        F.expr(f"min({ts_us}) div {tick_us}").alias("_k0"),
        F.expr(f"max({ts_us}) div {tick_us}").alias("_k1"))
    grid = (bounds.select(*on, F.explode(
        F.sequence(F.col("_k0"), F.col("_k1"))).alias("tick"))
        .withColumn("ts", F.timestamp_micros(
            (F.col("tick") + 1) * F.lit(tick_us) - 1)))
    right = df.withColumn("ts", F.timestamp_micros(F.col(ts_us))) \
              .drop(ts_us)
    return asof_join(grid, right, on=on, tiebreak=tiebreak)


def rolling_range_sum(
    df: DataFrame,
    on: "list[str]",
    ts_us: str,
    value_col: str,
    window_us: int,
) -> DataFrame:
    """Trailing range-window aggregate per key — the "rolling 7-day
    total" shape: for every row, the sum/count of values in
    ``[ts − window_us, ts]``.  A RANGE frame (value-based), so rows
    with equal timestamps are peers and share one deterministic answer
    — no tiebreak needed, unlike ROWS frames.  Integer values ⇒ exact.
    One shuffle (the key window)."""
    from pyspark.sql import Window

    if window_us < 0:
        raise ValueError("window_us must be >= 0")
    w = (Window.partitionBy(*on).orderBy(F.col(ts_us).cast("long"))
         .rangeBetween(-window_us, 0))
    return (df.withColumn("roll_sum", F.sum(value_col).over(w))
            .withColumn("roll_cnt", F.count(F.lit(1)).over(w)))


def interval_coverage(
    df: DataFrame,
    on: "list[str]",
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union length of (possibly overlapping) intervals per key — the
    "total covered time" aggregate (uptime, session coverage, sensor
    duty cycle): merge overlapping/adjacent intervals via
    gaps-and-islands (running max of end over the start order; a new
    island begins where start exceeds every previous end) and sum the
    merged spans.  Exact integers; one shuffle (all three windows and
    the final groupBy share the key).  Returns
    (key..., covered, n_islands)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*on).orderBy(F.col(start_col), F.col(end_col))
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col(start_col) > prev_max), 1).otherwise(0))
    isl = flagged.withColumn(
        "_isl", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    merged = (isl.groupBy(*on, "_isl")
              .agg(F.min(start_col).alias("_s"),
                   F.max(end_col).alias("_e")))
    return (merged.groupBy(*on)
            .agg(F.sum(F.col("_e") - F.col("_s")).alias("covered"),
                 F.count(F.lit(1)).alias("n_islands")))


def cusum_changepoint(df: DataFrame, key_cols: "list[str]", *,
                      order_cols: "tuple[str, ...]",
                      value_col: str) -> DataFrame:
    """Offline change-point detection per key: the index maximizing the
    scaled CUSUM statistic — EXACT integer form.

    The classic CUSUM drift S_i = Σ_{j≤i}(x_j − x̄) needs the float mean;
    multiplying through by n gives ``S'_i = n·prefix_i − i·total``
    (prefix_i = Σ_{j≤i} x_j), an exact long that ranks identically.
    The change point is the i maximizing |S'_i| (smallest i on ties) —
    where the running sum deviates most from the uniform-rate line,
    the split a binary-segmentation pass would make first.

    One key shuffle: the prefix window, the count/total windows, and
    the final pick window all share the key (the trajectory_stats
    discipline).  Magnitude bound: n·Σ|x| must fit int64 — n·total ≤
    2^63 holds to ~10⁶ rows × 10¹² value sums, far past any per-key
    series that belongs in one window.

    Returns ``(key..., n, cp_idx, cp_stat, total)`` — cp_stat signed
    (S' at the change point), cp_idx 1-based.
    """
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy(*key_cols)
    v = F.col(value_col).cast("long")
    staged = df.select(
        *key_cols,
        F.row_number().over(w).alias("_i"),
        F.sum(v).over(run).alias("_pfx"),
        F.sum(v).over(whole).alias("_tot"),
        F.count(F.lit(1)).over(whole).alias("_n"))
    s = (F.col("_n") * F.col("_pfx")
         - F.col("_i") * F.col("_tot")).alias("_s")
    scored = staged.select(*key_cols, "_i", "_n", "_tot", s)
    pick = Window.partitionBy(*key_cols).orderBy(
        F.abs(F.col("_s")).desc(), F.col("_i").asc())
    return (scored.withColumn("_rk", F.row_number().over(pick))
            .filter(F.col("_rk") == 1)
            .select(*key_cols, F.col("_n").alias("n"),
                    F.col("_i").alias("cp_idx"),
                    F.col("_s").alias("cp_stat"),
                    F.col("_tot").alias("total")))


def autocorr(df: DataFrame, key_cols: "list[str]", *,
             order_cols: "tuple[str, ...]", value_col: str,
             lags: "tuple[int, ...]" = (1, 2, 3)) -> DataFrame:
    """Lag-k autocorrelation per key over an exact integer series — the
    seasonality / burstiness detector (is the value stream self-similar
    one step apart? k steps?).

    Construction keeps determinism without demanding int64 hold the
    full Σz² (it can't: deviations are n-scaled longs, their squares
    overflow around n ≈ 10⁴·√var): the deviation ``z = n·x − S`` is an
    exact long per row, and the quadratic sums Σzᵢ·zᵢ₊ₖ / Σzᵢ² are
    PINNED-ORDER folds over index-sorted double products (the
    entropy_profile / path_len discipline — a float groupBy sum has
    nondeterministic addend order).  ``acf = num/den`` is the standard
    biased estimator with the full-series mean; the n² scale cancels.

    One key exchange: the ordering window, the lag windows, the totals
    windows and the final groupBy all hash on the key.  Per-key series
    materialize once inside the fold arrays — same memory class as the
    rank statistics; cap hot keys upstream (heavy_hitters).

    Returns one row per (key..., lag): ``(n, n_pairs, acf)`` — acf NULL
    for constant or too-short series.  The guard is ``n_pairs > 0 AND
    den > 0.0``: den is a fold of non-negative squares, so den > 0.0
    branches identically in both engines on identical doubles (a
    constant series folds to exactly 0.0 in both).
    """
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    whole = Window.partitionBy(*key_cols)
    v = F.col(value_col).cast("long")
    base = df.select(
        *key_cols,
        F.row_number().over(w).alias("_i"),
        (F.count(F.lit(1)).over(whole) * v
         - F.sum(v).over(whole)).alias("_z"))
    lagged = base.select(
        *key_cols, "_i", "_z",
        *[F.lag("_z", L).over(
            Window.partitionBy(*key_cols).orderBy("_i"))
          .alias(f"_zl{L}") for L in lags])
    den_arr = F.sort_array(F.collect_list(F.struct(
        F.col("_i"), (F.col("_z").cast("double")
                      * F.col("_z").cast("double")).alias("p"))))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.aggregate(den_arr, F.lit(0.0),
                        lambda a, s: a + s["p"]).alias("_den")]
    for L in lags:
        num_arr = F.sort_array(F.collect_list(F.when(
            F.col(f"_zl{L}").isNotNull(),
            F.struct(F.col("_i"),
                     (F.col("_z").cast("double")
                      * F.col(f"_zl{L}").cast("double")).alias("p")))))
        aggs.append(F.aggregate(num_arr, F.lit(0.0),
                                lambda a, s: a + s["p"])
                    .alias(f"_num{L}"))
        aggs.append(F.sum(F.when(F.col(f"_zl{L}").isNotNull(), 1)
                          .otherwise(0)).alias(f"_np{L}"))
    per = lagged.groupBy(*key_cols).agg(*aggs)
    # one row per lag WITHOUT recomputing the aggregate per lag: pack
    # the per-lag results into an array of structs and explode
    rows = F.array(*[
        F.struct(
            F.lit(L).cast("int").alias("lag"),
            F.col(f"_np{L}").alias("n_pairs"),
            F.when((F.col(f"_np{L}") > 0) & (F.col("_den") > 0.0),
                   F.col(f"_num{L}") / F.col("_den")).alias("acf"))
        for L in lags])
    return (per.select(*key_cols, "n", F.explode(rows).alias("_s"))
            .select(*key_cols, F.col("_s.lag").alias("lag"), "n",
                    F.col("_s.n_pairs").alias("n_pairs"),
                    F.col("_s.acf").alias("acf")))


def seasonal_anomaly(df: DataFrame, key_cols: "list[str]", *,
                     season_col: str, value_col: str, id_col: str,
                     top_k: int = 10) -> DataFrame:
    """Top-k seasonal-baseline outliers per key — the monitoring
    primitive "which observations deviate most from their
    same-season-bucket norm" (value vs the same hour-of-day /
    day-of-week cohort, not the global mean, so a weekend lull isn't an
    anomaly).

    EXACT form: a float z-score needs the bucket mean; multiplying
    through by the bucket count gives ``dev = n_season·v − s_season``
    (exact long), which ranks identically within a bucket and stays
    comparable across same-key buckets up to the count scale — the
    cusum_changepoint discipline.  Ranking is |dev| DESC with the
    unique ``id_col`` ASC tiebreak, so the selected row SET is
    deterministic and value-hashable.

    Two exchanges, both irreducible: the (key, season) baseline
    groupBy+join (co-partitioned), then the per-key top-k window.

    Returns ``(key..., id, season, v, n_season, dev)`` — top_k rows per
    key.
    """
    v = F.col(value_col).cast("long")
    clean = df.filter(v.isNotNull() & F.col(season_col).isNotNull())
    obs = clean.select(*key_cols, F.col(id_col).alias("id"),
                       F.col(season_col).alias("season"), v.alias("v"))
    base = obs.groupBy(*key_cols, "season").agg(
        F.count(F.lit(1)).alias("n_season"),
        F.sum("v").alias("_s"))
    j = obs.join(base, [*key_cols, "season"])
    dev = F.col("n_season") * F.col("v") - F.col("_s")
    pick = Window.partitionBy(*key_cols).orderBy(
        F.abs(dev).desc(), F.col("id").asc())
    return (j.withColumn("_rk", F.row_number().over(pick))
            .filter(F.col("_rk") <= top_k)
            .select(*key_cols, "id", "season", "v", "n_season",
                    dev.alias("dev")))


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: "list[str]",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_val: str,
    tiebreak: str = "backward",
) -> DataFrame:
    """Nearest-neighbor temporal join: each left row gets the right row
    with the MINIMUM |Δt| within its key — the bidirectional sibling of
    ``asof_join`` (backward-only), used when the measurement may arrive
    just before OR just after the event it describes.

    JOINLESS shape: the two inputs union into one time-ordered stream
    and ONE window pass computes, per left row, the previous and next
    right value (last_value/first_value with ignoreNulls over the
    running frames) — one shuffle on the key, no pair blow-up, immune
    to the dense-right-side skew an interval join would hit.

    Determinism: timestamps compare as exact epoch micros; an exact
    |Δt| tie picks the ``tiebreak`` side ("backward" = earlier right
    row, "forward" = later).  Rows sharing (key, ts) across the two
    inputs order left-after-right, so a same-instant right row is
    visible backward (the asof_join convention).

    Returns left's (key, ts) plus ``near_val``, ``near_ts_us``,
    ``delta_us`` (NULL when the key has no right rows).
    """
    if tiebreak not in ("backward", "forward"):
        raise ValueError(f"tiebreak must be backward|forward: {tiebreak}")
    lt = left.select(*key, _us(F.col(left_ts)).alias("_us"),
                     F.lit(1).alias("_is_left"),
                     F.lit(None).cast("long").alias("_rus"),
                     F.lit(None).cast("double").alias("_rv"))
    rt = right.select(*key, _us(F.col(right_ts)).alias("_us"),
                      F.lit(0).alias("_is_left"),
                      _us(F.col(right_ts)).alias("_rus"),
                      F.col(right_val).cast("double").alias("_rv"))
    u = lt.unionByName(rt)
    # right rows order before left rows at the same instant; _rv breaks
    # ties among same-instant right rows (a total order — NULLS FIRST
    # must be pinned in any SQL mirror)
    order = [F.col("_us").asc(), F.col("_is_left").asc(),
             F.col("_rv").asc_nulls_first()]
    w_back = Window.partitionBy(*key).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    w_fwd = Window.partitionBy(*key).orderBy(*order) \
        .rowsBetween(1, Window.unboundedFollowing)
    enriched = u.select(
        *key, "_us", "_is_left",
        F.last("_rus", ignorenulls=True).over(w_back).alias("_bus"),
        F.last("_rv", ignorenulls=True).over(w_back).alias("_bv"),
        F.first("_rus", ignorenulls=True).over(w_fwd).alias("_fus"),
        F.first("_rv", ignorenulls=True).over(w_fwd).alias("_fv"))
    bd = F.col("_us") - F.col("_bus")
    fd = F.col("_fus") - F.col("_us")
    take_back = F.when(F.col("_bus").isNull(), F.lit(False)) \
        .when(F.col("_fus").isNull(), F.lit(True)) \
        .otherwise((bd < fd) | ((bd == fd)
                                & F.lit(tiebreak == "backward")))
    out = (enriched.filter(F.col("_is_left") == 1)
           .select(*key, F.col("_us").alias("ts_us"),
                   F.when(take_back, F.col("_bv"))
                   .otherwise(F.col("_fv")).alias("near_val"),
                   F.when(take_back, F.col("_bus"))
                   .otherwise(F.col("_fus")).alias("near_ts_us")))
    return out.withColumn(
        "delta_us", F.abs(F.col("ts_us") - F.col("near_ts_us")))


def allen_join(left: DataFrame, right: DataFrame, keys: "list[str]", *,
               l_start: str = "l_start", l_end: str = "l_end",
               r_start: str = "r_start", r_end: str = "r_end",
               touching_only: bool = True) -> DataFrame:
    """Interval-algebra join: classify every key-matched interval pair
    into its Allen relation (Allen 1983, "Maintaining Knowledge about
    Temporal Intervals") — the full 13-relation vocabulary (equals,
    before/after, meets/met_by, overlaps/overlapped_by,
    starts/started_by, during/contains, finishes/finished_by) that
    interval_join's boolean "intersects" collapses.  The temporal-
    reasoning primitive behind "did the session ride through the
    incident, straddle its start, or just graze it".

    Classification is a single CASE chain over exact integer
    endpoints — first match wins, and the branch order resolves
    point-interval degeneracies deterministically (boundary-equality
    relations outrank touch relations: two coincident point intervals
    are 'equals', a point interval at another's start is 'starts', at
    its end 'finishes' — 'meets'/'met_by' are what remains, i.e.
    proper touch).  Fully value-hashable.

    ``touching_only=True`` (default) keeps only pairs that intersect
    or touch (le ≥ rs ∧ re ≥ ls) — output-bounded, the useful set;
    before/after pairs are the quadratic bulk and almost never what a
    caller wants materialized.  Shape: ONE equi-join on ``keys`` (at
    fleet scale key by (entity, coarse time bucket) so hot entities
    don't quadratically explode); the CASE adds no exchange.

    Returns left columns + right columns + ``rel``.
    """
    ls, le = F.col(l_start), F.col(l_end)
    rs, re = F.col(r_start), F.col(r_end)
    rel = (F.when((ls == rs) & (le == re), "equals")
           .when(le < rs, "before")
           .when(re < ls, "after")
           .when((ls == rs) & (le < re), "starts")
           .when((ls == rs) & (le > re), "started_by")
           .when((le == re) & (ls > rs), "finishes")
           .when((le == re) & (ls < rs), "finished_by")
           .when(le == rs, "meets")
           .when(re == ls, "met_by")
           .when((ls > rs) & (le < re), "during")
           .when((ls < rs) & (le > re), "contains")
           .when(ls < rs, "overlaps")
           .otherwise("overlapped_by"))
    j = left.join(right, keys)
    if touching_only:
        j = j.filter((le >= rs) & (re >= ls))
    return j.withColumn("rel", rel)


_BUSDAY_MONDAY = "1994-12-26"  # Monday anchor for the weekday fold


def business_days(from_col, to_col):
    """Exact integer business days (Mon-Fri) between two date/timestamp
    columns: ``w(to) − w(from)`` where ``w(d) = 5·(dn div 7) +
    least(dn mod 7, 5)`` and ``dn`` counts days since the Monday
    anchor 1994-12-26.  Pure integer arithmetic — deterministic
    cross-engine (both dates must be ≥ the anchor; the driver corpus
    starts 1995-01-01).
    """
    def w(c):
        dn = (f"cast(datediff(cast({c} as date), "
              f"date'{_BUSDAY_MONDAY}') as bigint)")
        return F.expr(f"5 * ({dn} div 7) + least({dn} % 7, 5)")
    return (w(to_col) - w(from_col)).cast("long")


def seasonal_decompose_daily(events: DataFrame, ts_col: str,
                             group_cols=()) -> DataFrame:
    """Additive seasonal decomposition of a daily count series with
    exact integer arithmetic (the classical moving-average method,
    kept exact by NEVER dividing: trend is the centered 7-CALENDAR-day
    RANGE-window
    SUM, and the day-of-week seasonal deviation is the cross-multiplied
    ``dev_num = n·N_w − S_w`` — positive means this day beats its
    weekday-cohort mean, same n·v−Σ discipline as seasonal_anomaly).

    Day-of-week is computed as days-since-Monday-anchor mod 7 (0=Mon)
    — pure integer math, NOT the engine dayofweek() (Spark and DuckDB
    disagree on week-start conventions).

    Scale shape: ONE map-side-combinable groupBy collapses the event
    stream to a days×groups table; the centered window and the cohort
    stats then run on that tiny aggregate — the fact table is touched
    exactly once.

    Output: ``(group..., day_us, dow, n, trend7_sum, n_w, s_w,
    dev_num)`` — ``dev_num = n·n_w − s_w`` exact int64.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (events.groupBy(*gcols, day.alias("_day"))
             .agg(F.count(F.lit(1)).alias("n")))
    dn = (f"cast(datediff(cast(_day as date), "
          f"date'{_BUSDAY_MONDAY}') as bigint)")
    daily = daily.select(
        *gcols,
        F.unix_micros(F.col("_day").cast("timestamp")).alias("day_us"),
        F.expr(f"{dn} % 7").cast("int").alias("dow"), "n")
    # RANGE (not ROWS) over epoch-µs: the trend window is CALENDAR-true
    # ±3 days — days with zero events do not widen the span (a ROWS
    # window over present days would silently cover 9+ calendar days on
    # weekday-only series)
    day_us_3 = 3 * 86_400_000_000
    wtrend = W.partitionBy(*gcols).orderBy("day_us") \
        .rangeBetween(-day_us_3, day_us_3)
    wcohort = W.partitionBy(*gcols, F.col("dow"))
    out = daily.select(
        *gcols, "day_us", "dow", "n",
        F.sum("n").over(wtrend).cast("long").alias("trend7_sum"),
        F.count(F.lit(1)).over(wcohort).cast("long").alias("n_w"),
        F.sum("n").over(wcohort).cast("long").alias("s_w"))
    return out.withColumn(
        "dev_num",
        (F.col("n") * F.col("n_w") - F.col("s_w")).cast("long"))


def peak_concurrency(intervals: DataFrame, start_col: str,
                     end_col: str, *, week_anchor: str = _BUSDAY_MONDAY
                     ) -> DataFrame:
    """Peak concurrent open intervals per week — the capacity-planning
    sweep-line: +1 at each start, −1 at each end (half-open: at equal
    timestamps closes process BEFORE opens — the (ts, delta ASC) total
    order), running sum, max per calendar week INCLUDING the carry-in:
    every week from the first to the last active week gets a row, and
    a week whose intervals were all opened earlier reports the
    carried-in open count (max(carry_in, in-week running max) — a
    per-event-only max would understate any week that starts with
    open intervals and drop event-less weeks entirely).

    Exact integers throughout.  The in-week running sum is a GLOBAL
    ordered window (one series — a corpus diagnostic like
    vocab_growth); the carry-in needs only the per-week NET delta
    cumsum over the (tiny) week spine.

    Output: ``(week, max_open)`` — week = days-since-anchor div 7,
    one row per week in [first, last].
    """
    from pyspark.sql import Window as W

    s = F.unix_micros(F.col(start_col).cast("timestamp"))
    e = F.unix_micros(F.col(end_col).cast("timestamp"))
    deltas = (intervals.select(s.alias("us"),
                               F.lit(1).alias("delta"))
              .unionByName(
                  intervals.select(e.alias("us"),
                                   F.lit(-1).alias("delta"))))
    w = W.orderBy("us", "delta").rowsBetween(W.unboundedPreceding, 0)
    anchor_us = (f"unix_micros(cast(date'{week_anchor}' as "
                 "timestamp))")
    wk = F.expr(f"((us - {anchor_us}) div 86400000000) div 7") \
        .cast("long")
    running = deltas.select(
        "us", F.sum("delta").over(w).cast("long").alias("open_now"),
        wk.alias("week"))
    evmax = running.groupBy("week").agg(
        F.max("open_now").alias("ev_max"))
    net = deltas.select(wk.alias("week"), "delta") \
        .groupBy("week").agg(F.sum("delta").cast("long").alias("net"))
    span = net.agg(F.min("week").alias("lo"), F.max("week").alias("hi"))
    spine = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("week"))
    filled = (spine.join(net, "week", "left")
              .select("week", F.coalesce(F.col("net"), F.lit(0))
                      .cast("long").alias("net")))
    wcum = W.orderBy("week").rowsBetween(W.unboundedPreceding, -1)
    carried = filled.select(
        "week",
        F.coalesce(F.sum("net").over(wcum), F.lit(0)).cast("long")
        .alias("carry_in"))
    return (carried.join(evmax, "week", "left")
            .select("week",
                    F.greatest(F.col("carry_in"),
                               F.coalesce(F.col("ev_max"),
                                          F.col("carry_in")))
                    .cast("long").alias("max_open")))


def haar_energy(events: DataFrame, ts_col: str, group_cols, *,
                levels: int = 3) -> DataFrame:
    """Haar wavelet energy decomposition of the daily count series per
    group — the multi-resolution burstiness spectrum (which time scale
    carries the variance?).  All exact int64: the series is the DENSE
    CALENDAR day-indexed count vector (idx = days since the group's
    first active day, so zero-count days contribute implicit 0
    coefficients — absent rows simply don't feed the pair sums); per
    level, detail = c_even − c_odd and approx = c_even + c_odd over
    index pairs (missing partners = 0 — deterministic, mirrored),
    energy = Σ detail².

    Scale shape: one groupBy collapses the event stream to days; each
    level is one groupBy on (group, idx div 2) over the shrinking
    coefficient table + a tiny energy aggregate.  int64 bound:
    per-day counts ≤ ~3·10⁹ keep detail² exact.

    Output: ``(group..., level, n_coeffs, energy_u)`` for levels
    1..``levels``.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (events.groupBy(*gcols, day.alias("_day"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    wg = W.partitionBy(*gcols)
    cur = daily.select(
        *gcols,
        F.datediff(F.col("_day").cast("date"),
                   F.min("_day").over(wg).cast("date")).cast("long")
        .alias("idx"),
        "c")
    out = None
    for lvl in range(1, int(levels) + 1):
        paired = cur.groupBy(*gcols,
                             F.expr("idx div 2").alias("j")).agg(
            F.sum(F.when(F.pmod(F.col("idx"), 2) == 0, F.col("c"))
                  .otherwise(-F.col("c"))).alias("d"),
            F.sum("c").alias("a"))
        energy = paired.groupBy(*gcols).agg(
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            F.sum(F.col("d") * F.col("d")).cast("long")
            .alias("energy_u")).select(
            *gcols, F.lit(lvl).alias("level"), "n_coeffs", "energy_u")
        out = energy if out is None else out.unionByName(energy)
        cur = paired.select(*gcols, F.col("j").alias("idx"),
                            F.col("a").alias("c"))
    return out


def durbin_watson(df: DataFrame, group_cols: "list[str]", order_cols,
                  value_col: str) -> DataFrame:
    """Durbin-Watson statistic per group — first-order serial
    correlation of an ordered integer series (DW ≈ 2(1−ρ₁): ≈2 means
    independent steps, →0 positive autocorrelation, →4 alternation).
    The residual-diagnostics companion to the autocorr gate, computed
    on deviations from the group mean without ever forming them:
    DW = Σ(xₜ−xₜ₋₁)² / Σ(xₜ−x̄)² and the numerator is mean-invariant,
    so num = Σd² (exact int64 over lag diffs) and the denominator is
    the moment identity (nΣx² − (Σx)²)/n — hence

        dw = n·num / (n·Σx² − (Σx)²)

    with the combination in DECIMAL(38,0) (the ols2 discipline; the
    int64 products die at n·Σx² ≈ 2⁶³) and ONE pinned double divide.

    Scale shape: one lag window + one map-side-combinable groupBy,
    both keyed on the group columns — single exchange.

    Returns ``(*group_cols, n, num, dw)`` — dw NULL for constant
    series (zero variance) or n < 2.
    """
    g = list(group_cols)
    order = order_cols if isinstance(order_cols, (list, tuple)) \
        else [order_cols]
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*g).orderBy(*[F.col(c) for c in order])
    d = (v - F.lag(v).over(w))
    rows = df.select(*g, v.alias("_x"), d.alias("_d"))
    agg = rows.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_d") * F.col("_d")).alias("num"))
    D = "decimal(38,0)"
    nn = F.col("n").cast(D) * F.col("num").cast(D)
    den = (F.col("n").cast(D) * F.col("_sxx").cast(D)
           - F.col("_sx").cast(D) * F.col("_sx").cast(D))
    dw = F.when((F.col("n") >= 2) & (den != 0),
                nn.cast("double") / den.cast("double"))
    return agg.select(*g, "n", "num", dw.alias("dw"))


def forecast_accuracy(df: DataFrame, group_cols: "list[str]",
                      tick_col: str, value_col: str, *,
                      season: int = 7) -> DataFrame:
    """Forecast-accuracy metrics per group for the SEASONAL-NAIVE
    forecast (ŷₜ = yₜ₋ₛ) on a dense integer series — MASE and sMAPE,
    the scale-free pair every forecasting benchmark reports
    (Hyndman & Koehler 2006, "Another look at measures of forecast
    accuracy").  Grade a model by beating this floor.

    Exactness: the series must be dense in ``tick_col`` (gapfill
    upstream); forecast joins are lag windows over exact longs.
    MASE = (Σ|yₜ−ŷₜ|/n_f) / (Σ|yₜ−yₜ₋₁|/n_d) is evaluated by integer
    cross-multiplication — ``(Σ|e_f|·n_d) / (n_f·Σ|Δ|)`` — ONE pinned
    divide of two exact int64 products.  sMAPE's per-term rational
    2|e|/(y+ŷ) (positive series) cannot share a denominator, so it is
    a PINNED-ORDER fold over the tick-sorted list, one divide per
    term (the entropy_profile discipline).

    Scale shape: two lag windows + one groupBy, all keyed on the
    group columns — single exchange.

    Returns ``(*group_cols, n_f, sum_abs_err, sum_abs_naive, mase,
    smape)`` — NULLs when the in-sample naive error is zero (constant
    series) or no forecastable ticks exist.
    """
    g = list(group_cols)
    t = F.col(tick_col).cast("long")
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*g).orderBy(t)
    yhat = F.lag(v, season).over(w)
    y1 = F.lag(v, 1).over(w)
    rows = df.select(
        *g, t.alias("_t"), v.alias("_y"),
        yhat.alias("_yh"), y1.alias("_y1"))
    e_f = F.when(F.col("_yh").isNotNull(),
                 F.abs(F.col("_y") - F.col("_yh")))
    e_d = F.when(F.col("_y1").isNotNull(),
                 F.abs(F.col("_y") - F.col("_y1")))
    sm_t = F.when(
        F.col("_yh").isNotNull()
        & ((F.col("_y") + F.col("_yh")) > 0),
        F.lit(2.0) * F.abs(F.col("_y") - F.col("_yh")).cast("double")
        / (F.col("_y") + F.col("_yh")).cast("double"))
    terms = rows.select(*g, "_t", e_f.alias("_ef"), e_d.alias("_ed"),
                        sm_t.alias("_sm"))
    # a NULL sm inside a non-null struct would poison the fold —
    # collect only the defined terms (collect_list drops null entries)
    arr = F.sort_array(F.collect_list(F.when(
        F.col("_sm").isNotNull(),
        F.struct(F.col("_t"), F.col("_sm").alias("sm")))))
    agg = terms.groupBy(*g).agg(
        F.count("_ef").alias("n_f"),
        F.sum("_ef").alias("sum_abs_err"),
        F.count("_ed").alias("_nd"),
        F.sum("_ed").alias("sum_abs_naive"),
        F.count("_sm").alias("_nsm"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s["sm"]).alias("_smsum"))
    D = "decimal(38,0)"
    mase = F.when(
        (F.col("n_f") > 0) & (F.col("sum_abs_naive") > 0),
        (F.col("sum_abs_err").cast(D) * F.col("_nd").cast(D))
        .cast("double")
        / (F.col("n_f").cast(D) * F.col("sum_abs_naive").cast(D))
        .cast("double"))
    smape = F.when(F.col("_nsm") > 0,
                   F.col("_smsum") / F.col("_nsm").cast("double"))
    return agg.select(*g, "n_f", "sum_abs_err", "sum_abs_naive",
                      mase.alias("mase"), smape.alias("smape"))


def allen_pairs(intervals: DataFrame, on: "list[str]", *,
                id_col: str = "id", start: str = "s", end: str = "e",
                bucket_s: int) -> DataFrame:
    """Classify every touching pair of same-key intervals into its
    Allen interval-algebra relation (Allen, CACM 1983) — the temporal
    topology audit behind overlap detection, schedule conflict checks
    and span-containment mining.  Pairs are canonically ordered
    a ≤ b by (start, end, id), so each unordered pair appears once and
    the six left-hand relations cover the algebra (the six inverses
    are the same rows read right-to-left; `before`/`after` — disjoint,
    non-touching — are excluded by construction, they are the
    quadratic bulk nobody audits):

      equals       sa = sb, ea = eb
      starts       sa = sb, ea < eb        (a starts b)
      meets        sa < sb, ea = sb
      overlaps     sa < sb < ea < eb
      finished_by  sa < sb, ea = eb        (b finishes a)
      contains     sa < sb, eb < ea        (b during a)

    Timestamps are exact long microseconds; ``e >= s`` is raise-checked
    in-plan.  Scale shape: the interval_join discipline — ONLY the
    left side explodes to its ``ceil(len/bucket)+1`` time buckets, the
    right side keeps its single start bucket, and the equi-join on
    (key, bucket) matches each qualifying pair EXACTLY once (b's start
    bucket lies in a's bucket range iff the pair touches — no post-join
    dedup).  One hash shuffle per side.

    Returns ``(*on, id_a, id_b, relation)``.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    b_us = bucket_s * 1_000_000
    bad = F.col(end) < F.col(start)
    base = intervals.select(
        *on,
        F.col(id_col).alias("_id"),
        F.when(bad, F.raise_error(F.lit(
            "allen_pairs: interval end < start"))
            .cast("long")).otherwise(F.col(start).cast("long"))
        .alias("_s"),
        F.col(end).cast("long").alias("_e"))
    from ..geo.tilemath import floor_div
    a = base.select(
        *on, F.col("_id").alias("_ida"), F.col("_s").alias("_sa"),
        F.col("_e").alias("_ea"),
        F.explode(F.sequence(floor_div(F.col("_s"), b_us),
                             floor_div(F.col("_e"), b_us)))
        .alias("_bkt"))
    b = base.select(
        *[F.col(c).alias(f"_r_{c}") for c in on],
        F.col("_id").alias("_idb"), F.col("_s").alias("_sb"),
        F.col("_e").alias("_eb"),
        floor_div(F.col("_s"), b_us).alias("_bkt"))
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    ordered = (F.struct("_sa", "_ea", "_ida")
               < F.struct(F.col("_sb").alias("_sa"),
                          F.col("_eb").alias("_ea"),
                          F.col("_idb").alias("_ida")))
    touch = F.col("_sb") <= F.col("_ea")
    j = a.join(b, ["_bkt"]).filter(cond & ordered & touch)
    rel = (F.when((F.col("_sa") == F.col("_sb"))
                  & (F.col("_ea") == F.col("_eb")), "equals")
           .when(F.col("_sa") == F.col("_sb"), "starts")
           .when(F.col("_ea") == F.col("_sb"), "meets")
           .when(F.col("_ea") < F.col("_eb"), "overlaps")
           .when(F.col("_ea") == F.col("_eb"), "finished_by")
           .otherwise("contains"))
    return j.select(*on, F.col("_ida").alias("id_a"),
                    F.col("_idb").alias("id_b"), rel.alias("relation"))


def ltob_downsample(df: DataFrame, keys: "list[str]", *,
                    ts: str, val: str, bucket_us: int,
                    tiebreak: str) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013,
    §4.2) — the chart-rendering reduction that keeps the visually
    dominant point of every time bucket: the point maximizing the
    triangle area spanned with its immediate neighbors.  The
    THREE-bucket variant (LTTB) conditions each pick on the previous
    bucket's pick — inherently sequential; LTOB is its bucket-parallel
    sibling and the documented deviation.

    Exactness: 2·area = |(x₋−x₊)(y−y₋) − (x₋−x)(y₊−y₋)| is an exact
    int64 cross product (ts in long micros, values exact longs —
    quantize upstream); the per-bucket argmax uses the deterministic
    (area2 DESC, ts, tiebreak) order.  Both products are raise-checked
    against 2⁶¹ in-plan — never a silent wrap.  Series endpoints (no
    neighbor on one side) are always kept, per the LTTB contract.

    Scale shape: ONE hash shuffle on ``keys`` feeds both the
    neighbor window and the per-(key, bucket) argmax window — the
    second window reuses the first's partitioning (same leading key).

    Returns ``(*keys, ts, val, bucket, area2, endpoint)`` for the
    selected points.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    from ..geo.tilemath import floor_div
    w = Window.partitionBy(*keys).orderBy(ts, tiebreak)
    x = F.col(ts).cast("long")
    y = F.col(val).cast("long")
    d = (df.withColumn("_xp", F.lag(x).over(w))
         .withColumn("_yp", F.lag(y).over(w))
         .withColumn("_xn", F.lead(x).over(w))
         .withColumn("_yn", F.lead(y).over(w)))
    p1 = F.try_multiply(F.col("_xp") - F.col("_xn"), y - F.col("_yp"))
    p2 = F.try_multiply(F.col("_xp") - x,
                        F.col("_yn") - F.col("_yp"))
    lim = F.lit(1 << 61)
    # try_multiply -> NULL on int64 overflow; bound each term at 2^61
    # so the subtraction can't overflow either.  Raise, never wrap.
    guard = (p1.isNull() | p2.isNull()
             | (F.greatest(F.abs(p1), F.abs(p2)) > lim))
    area2 = F.when(
        guard, F.raise_error(F.lit(
            "ltob_downsample: cross-product term exceeds 2^61 — "
            "rescale ts or val")).cast("long")
    ).otherwise(F.abs(p1 - p2))
    endpoint = F.col("_xp").isNull() | F.col("_xn").isNull()
    d = (d.withColumn("_a2", F.when(endpoint, F.lit(None)).otherwise(area2))
         .withColumn("_ep", endpoint)
         .withColumn("_bkt", floor_div(x, bucket_us)))
    wb = (Window.partitionBy(*keys, "_bkt")
          .orderBy(F.col("_a2").desc_nulls_last(), ts, tiebreak))
    return (d.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_ep") | (F.col("_rn") == 1))
            .select(*keys, F.col(ts), F.col(val).cast("long").alias(val),
                    F.col("_bkt").alias("bucket"),
                    F.col("_a2").alias("area2"),
                    F.col("_ep").alias("endpoint")))


def c_chart(df: DataFrame, group_cols: "list[str]", period_col: str,
            *, sigma_mult: int = 3) -> DataFrame:
    """Shewhart c-chart — statistical process control over event
    counts per period: center line c̄ = total/periods, control limits
    c̄ ± k·√c̄ (Poisson σ), flagging periods whose count leaves the
    band (the SPC alarm a pipeline health monitor raises on a feed
    that suddenly floods or dries up).

    The period grid is COMPLETED per group (distinct periods ×
    distinct groups, absent cells count 0) — a silent week is exactly
    the anomaly a c-chart exists to flag.

    Exactness: the out-of-control decision is the pure int64
    cross-multiplication

        (W·c − S)² > k²·S·W

    (W periods, S total, c the period count) — no float threshold;
    c̄/UCL/LCL are the one pinned double chain for display.

    Scale shape: one map-side-combinable count groupBy, one tiny
    period×group completion join, one per-group totals join — all
    keyed on the group.

    Returns ``(*group_cols, <period_col>, c, w_periods, c_total,
    ooc, cbar, ucl, lcl)``.
    """
    cnt = (df.groupBy(*group_cols, F.col(period_col).alias("period"))
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    groups = df.select(*group_cols).distinct()
    periods = df.select(F.col(period_col).alias("period")).distinct()
    grid = (groups.crossJoin(periods)
            .join(cnt, [*group_cols, "period"], "left")
            .select(*group_cols, "period",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    tot = grid.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("w_periods"),
        F.sum("c").cast("long").alias("c_total"))
    j = grid.join(tot, list(group_cols))
    dev = (F.col("w_periods") * F.col("c") - F.col("c_total"))
    ooc = (dev * dev
           > F.lit(sigma_mult * sigma_mult)
           * F.col("c_total") * F.col("w_periods"))
    cbar = F.col("c_total").cast("double") / F.col("w_periods").cast("double")
    half = F.lit(float(sigma_mult)) * F.sqrt(cbar)
    return j.select(
        *group_cols, F.col("period").alias(period_col),
        "c", "w_periods", "c_total",
        ooc.cast("int").alias("ooc"),
        cbar.alias("cbar"),
        (cbar + half).alias("ucl"),
        F.greatest(cbar - half, F.lit(0.0)).alias("lcl"))


def hurst_rs(df: DataFrame, series_cols: "list[str]",
             order_cols: "list[str]", value_col: str, *,
             windows: "tuple[int, ...]" = (4, 8, 16, 32),
             scale: int = 1_000_000) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
    Mandelbrot & Wallis 1969): chop each series into full windows of
    size w, compute R/S per window (R = range of cumulative
    mean-deviations, S = population std), average per w, and fit
    ln(R/S) ~ H·ln(w) — H ≈ 0.5 random walk, > 0.5 persistent/trending,
    < 0.5 mean-reverting (the long-memory diagnostic for event-rate /
    value series; the spectral sibling of haar_energy).

    Exactness: with integer values, chunk sums s, ss and within-chunk
    prefixes are exact longs, the cumulative deviation scaled by w —
    ``w·prefix_j − j·s`` — is an exact long, and both R and S share
    cancelling denominators:  R/S = range(w·dev) / √(w·ss − s²).  One
    √ + one ÷ + one × + floor µ-quantizes each window's R/S
    bit-identically cross-engine; per-w sums are exact longs.
    Zero-variance windows are DROPPED (R/S undefined), partial tail
    windows too (n < w) — both pinned contracts.

    The H estimate is the :func:`~.stats.loglog_fit` slope over the
    per-w integer means (floor-div), repeated on every output row.

    Scale shape: one per-series sort window (the irreducible series
    order), a bounded ×|windows| explode, per-(series,w,chunk)
    windows on the SAME partitioning, one groupBy per chunk and one
    per w.  No joins beyond the single-row fit broadcast.

    Returns ``(w, n_chunks, sum_rs_micro, rs_mean_micro, hurst, r2)``.
    """
    from .stats import loglog_fit

    if any(w < 2 for w in windows):
        raise ValueError("window sizes must be >= 2")
    x = F.col(value_col).cast("long")
    ws = Window.partitionBy(*series_cols).orderBy(*order_cols)
    base = df.select(
        *series_cols, *order_cols, x.alias("_x"),
        (F.row_number().over(ws) - 1).cast("long").alias("_rn"))
    base = base.select(
        "*", F.explode(F.array(*[F.lit(int(w)) for w in windows]))
        .alias("_w"))
    chunk = ((F.col("_rn") - F.pmod(F.col("_rn"), F.col("_w")))
             / F.col("_w")).cast("long")
    j = (F.pmod(F.col("_rn"), F.col("_w")) + 1).cast("long")
    wc = base.withColumn("_chunk", chunk).withColumn("_j", j)
    part = Window.partitionBy(*series_cols, "_w", "_chunk")
    word = part.orderBy(*order_cols)
    wc = wc.select(
        "_w", "_chunk", *series_cols, "_j", "_x",
        F.sum("_x").over(word).alias("_pref"),
        F.sum("_x").over(part).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).over(part).alias("_ss"),
        F.count(F.lit(1)).over(part).alias("_n"))
    dev = F.col("_w") * F.col("_pref") - F.col("_j") * F.col("_s")
    per_chunk = (wc.filter(F.col("_n") == F.col("_w"))
                 .groupBy(*series_cols, "_w", "_chunk")
                 .agg((F.max(dev) - F.min(dev)).alias("_rng"),
                      F.first(F.col("_w") * F.col("_ss")
                              - F.col("_s") * F.col("_s")).alias("_vnum")))
    rs_micro = F.floor(
        F.col("_rng").cast("double")
        / F.sqrt(F.col("_vnum").cast("double"))
        * F.lit(float(scale))).cast("long")
    per_w = (per_chunk.filter(F.col("_vnum") > 0)
             .select(F.col("_w").alias("w"), rs_micro.alias("_rs"))
             .groupBy("w")
             .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                  F.sum("_rs").cast("long").alias("sum_rs_micro")))
    mean_i = ((F.col("sum_rs_micro")
               - F.pmod(F.col("sum_rs_micro"), F.col("n_chunks")))
              / F.col("n_chunks")).cast("long")
    per_w = per_w.withColumn("rs_mean_micro", mean_i)
    fit = loglog_fit(per_w.filter(F.col("rs_mean_micro") >= 1),
                     "w", "rs_mean_micro")
    return (per_w.crossJoin(
        fit.select(F.col("slope").alias("hurst"), "r2"))
        .select("w", "n_chunks", "sum_rs_micro", "rs_mean_micro",
                "hurst", "r2"))


def ljung_box(df: DataFrame, key_cols: "list[str]", *,
              order_cols: "tuple[str, ...]", value_col: str,
              m: int = 8) -> DataFrame:
    """Ljung-Box portmanteau statistic per key:
    Q = n·(n+2)·Σ_{k=1..m} r_k²/(n−k) — the "is this series white
    noise?" test over the first m autocorrelations (large Q ⇒ the
    residual stream still carries structure; the model-diagnostics
    companion of ``autocorr``, which reports the lags individually).

    Builds on ``autocorr``'s exact construction (n-scaled integer
    deviations, pinned-order quadratic folds); Q adds one more pinned
    chain — the k-ladder folds in ascending-lag order over
    ``r_k²/(n−k)`` doubles, then scales by n·(n+2) (exact long cast
    once).  Q is NULL when any r_k is NULL (constant/too-short
    series) or n ≤ m (a negative denominator is never evaluated).

    Same single key exchange as autocorr; the ladder aggregate runs
    on the m-row-per-key acf table.  Returns
    ``(key..., n, m, q_stat)``.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1: {m}")
    acf = autocorr(df, key_cols, order_cols=order_cols,
                   value_col=value_col, lags=tuple(range(1, m + 1)))
    term = (F.col("acf") * F.col("acf")
            / (F.col("n") - F.col("lag")).cast("double"))
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("lag"), term.alias("t"))))
    per = acf.groupBy(*key_cols).agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("acf").isNull(), 1).otherwise(0))
        .alias("_nulls"),
        F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["t"])
        .alias("_ladder"))
    q = F.when((F.col("_nulls") == 0) & (F.col("n") > F.col("m")),
               (F.col("n") * (F.col("n") + 2)).cast("double")
               * F.col("_ladder"))
    return per.select(*key_cols, "n", "m", q.alias("q_stat"))


def rolling_distinct(df: DataFrame, *, ts_col: str, entity_col: str,
                     window_days: int = 7) -> DataFrame:
    """Trailing-window distinct-entity count per observed day — the
    WAU/MAU-style "active users over the last W days" series.  A
    RANGE window cannot COUNT DISTINCT; the standard rewrite is the
    bounded offset explode: each (entity, active-day) pair CONTRIBUTES
    to the W target days it stays inside the trailing window, then
    one distinct count per target day.

    Exactness: days are exact epoch-day longs; the count is an exact
    distinct.  Output days are restricted to OBSERVED days (semi-join
    against the day set), so the series never extends past the data.

    Scale shape: the fact table collapses to the (entity, day)
    DISTINCT first (map-side combinable) — the ×W explode runs on the
    collapsed table, not the events; then one (day) groupBy.  W is
    the linear cost knob.  Returns ``(day, active)``.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    day = ((F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.pmod(F.unix_micros(F.col(ts_col).cast("timestamp")),
                     F.lit(86_400_000_000)))
           / F.lit(86_400_000_000)).cast("long")
    ud = (df.filter(F.col(ts_col).isNotNull()
                    & F.col(entity_col).isNotNull())
          .select(day.alias("_d"), F.col(entity_col).alias("_e"))
          .distinct())
    days = ud.select(F.col("_d").alias("day")).distinct()
    tgt = ud.select(
        F.explode(F.sequence(
            F.col("_d"), F.col("_d") + F.lit(window_days - 1)))
        .alias("day"), "_e")
    return (tgt.join(days, "day", "left_semi")
            .groupBy("day")
            .agg(F.count_distinct(F.col("_e")).alias("active")))


def pacf(df: DataFrame, key_cols: "list[str]", *,
         order_cols: "tuple[str, ...]", value_col: str,
         max_lag: int = 4) -> DataFrame:
    """Partial autocorrelation ladder per key — the AR-order
    diagnostic: pacf(k) is the correlation at lag k AFTER regressing
    out lags 1..k−1, the Box-Jenkins tool that tells an AR(p) (pacf
    cuts off after p) from an MA (pacf tails).  Computed from the
    :func:`autocorr` ladder by the Durbin-Levinson recursion
    (Durbin 1960):

        φ_{k,k} = (r_k − Σ_j φ_{k−1,j}·r_{k−j}) /
                  (1 − Σ_j φ_{k−1,j}·r_j),
        φ_{k,j} = φ_{k−1,j} − φ_{k,k}·φ_{k−1,k−j}

    Determinism: the acf values are autocorr's pinned-fold doubles,
    and the recursion is UNROLLED into a fixed left-associated
    expression chain (one ``withColumn`` level per order, linear
    growth) — both engines execute the identical IEEE op sequence, so
    every φ matches bit-for-bit.  A zero DL denominator (unit-root
    edge) or a NULL acf (constant/short series) propagates NULL
    through all higher orders — the honest answer, never a 0/0 NaN.
    ``max_lag ≤ 6`` keeps the unrolled tree small under Catalyst's
    project collapsing (ValueError past that — PACF ladders beyond 6
    want a dedicated solver anyway).

    Shape: everything beyond autocorr's single key exchange is a
    K-column projection on the collapsed per-key row.

    Returns one row per (key..., lag 1..max_lag):
    ``(key..., lag, n, acf, pacf)``.
    """
    K = int(max_lag)
    if not 1 <= K <= 6:
        raise ValueError("pacf: max_lag must be in [1, 6]")
    ac = autocorr(df, key_cols, order_cols=order_cols,
                  value_col=value_col, lags=tuple(range(1, K + 1)))
    piv = ac.groupBy(*key_cols).agg(
        F.max("n").alias("n"),
        *[F.max(F.when(F.col("lag") == L, F.col("acf")))
          .alias(f"_r{L}") for L in range(1, K + 1)])

    def r(L):
        return F.col(f"_r{L}")

    # level 1
    piv = piv.withColumn("_p1_1", r(1))
    for k in range(2, K + 1):
        num = r(k)
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - F.col(f"_p{k - 1}_{j}") * r(k - j)
            den = den - F.col(f"_p{k - 1}_{j}") * r(j)
        piv = piv.withColumn(
            f"_p{k}_{k}", F.when(den != 0.0, num / den))
        for j in range(1, k):
            piv = piv.withColumn(
                f"_p{k}_{j}",
                F.col(f"_p{k - 1}_{j}")
                - F.col(f"_p{k}_{k}") * F.col(f"_p{k - 1}_{k - j}"))
    rows = F.array(*[
        F.struct(F.lit(L).cast("int").alias("lag"),
                 r(L).alias("acf"),
                 F.col(f"_p{L}_{L}").alias("pacf"))
        for L in range(1, K + 1)])
    return (piv.select(*key_cols, "n", F.explode(rows).alias("_s"))
            .select(*key_cols, F.col("_s.lag").alias("lag"), "n",
                    F.col("_s.acf").alias("acf"),
                    F.col("_s.pacf").alias("pacf")))


def lsq_changepoint(df: DataFrame, key_cols: "list[str]", *,
                    order_cols: "tuple[str, ...]", value_col: str
                    ) -> DataFrame:
    """Least-squares single changepoint per key — the parametric
    companion of the rank-based ``pettitt_test``: the split k that
    minimizes SSE_left + SSE_right (the first step of binary
    segmentation / the AMOC model of Hinkley 1970), located EXACTLY.

    Exactness: with integer values, prefix sums P_k and square sums
    A_k are exact int64 running windows (integer window sums are
    association-order-independent).  Each split's objective is the
    exact rational

        SSE(k) = [A_n·k·(n−k) − P_k²·(n−k) − (S−P_k)²·k] / (k·(n−k))

    with the numerator evaluated in DECIMAL(38,0) (int128-exact;
    DuckDB HUGEINT computes identical values — the ols2 discipline)
    and the argmin taken on the DECIMAL(38,6) quotient: a FIXED
    6-digit quantization, bit-identical cross-engine (decimal
    division is exact-then-round, not IEEE), so the located
    breakpoint value-hashes.  Splits whose true SSEs differ by less
    than 1e-6 of a squared unit tie on the quantized score and then
    break deterministically on the smaller k — quantize values
    upstream so a meaningful gap exceeds that (cents do).

    Shape: one key exchange (ordering window + running sums), one
    min-struct aggregate; series materialize only as window state.

    Returns one row per key: ``(key..., n, best_k, mean_left,
    mean_right)`` — best_k the 1-based size of the left segment
    (1 ≤ k < n); keys with n < 2 drop out.
    """
    g = list(key_cols)
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*g).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy(*g)
    v = F.col(value_col).cast("long")
    base = df.select(
        *g,
        F.row_number().over(w).alias("_k"),
        F.sum(v).over(wrun).alias("_p"),
        F.sum(v * v).over(wrun).alias("_a"),
        F.sum(v).over(wtot).alias("_s"),
        F.sum(v * v).over(wtot).alias("_at"),
        F.count(F.lit(1)).over(wtot).alias("_n"))
    cand = base.filter(F.col("_k") < F.col("_n"))
    dec = "decimal(38,0)"
    k = F.col("_k").cast(dec)
    n = F.col("_n").cast(dec)
    p = F.col("_p").cast(dec)
    s = F.col("_s").cast(dec)
    at = F.col("_at").cast(dec)
    num = (at * k * (n - k) - p * p * (n - k)
           - (s - p) * (s - p) * k)
    score = (num / (k * (n - k))).cast("decimal(38,6)")
    pick = F.min(F.struct(
        score.alias("sc"), F.col("_k").alias("k"),
        F.col("_p").alias("p"), F.col("_s").alias("s"),
        F.col("_n").alias("n")))
    per = cand.groupBy(*g).agg(pick.alias("_b"))
    b = F.col("_b")
    return per.select(
        *g, b["n"].alias("n"), b["k"].cast("long").alias("best_k"),
        (b["p"].cast("double") / b["k"].cast("double"))
        .alias("mean_left"),
        ((b["s"] - b["p"]).cast("double")
         / (b["n"] - b["k"]).cast("double")).alias("mean_right"))


def crosscorr(df: DataFrame, key_cols: "list[str]", *,
              order_cols: "tuple[str, ...]", x_col: str, y_col: str,
              lags: "tuple[int, ...]" = (-2, -1, 0, 1, 2)) -> DataFrame:
    """Lead-lag cross-correlation between two aligned integer series —
    does x co-move with y shifted k steps? (negative k: x leads y) —
    the pre-whitening-free CCF behind transfer-function screening and
    metric lead-lag dashboards; the bivariate sibling of
    :func:`autocorr`, sharing its determinism construction.

    ccf(k) = Σ zxᵗ·zyᵗ⁻ᵏ / √(Σ zx² · Σ zy²) with n-scaled exact-long
    deviations (z = n·v − S; the n² scale cancels) and every quadratic
    sum a PINNED index-ordered double fold.  The √ is one shared
    IEEE chain on identical doubles.  One key exchange: ordering,
    shift, and fold windows all hash on the key.

    Returns one row per (key..., lag): ``(lag, n, n_pairs, ccf)`` —
    ccf NULL when either series is constant or the overlap is empty.
    """
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    whole = Window.partitionBy(*key_cols)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.select(
        *key_cols,
        F.row_number().over(w).alias("_i"),
        (F.count(F.lit(1)).over(whole) * x
         - F.sum(x).over(whole)).alias("_zx"),
        (F.count(F.lit(1)).over(whole) * y
         - F.sum(y).over(whole)).alias("_zy"))
    wi = Window.partitionBy(*key_cols).orderBy("_i")

    def shifted(L):
        if L == 0:
            return F.col("_zy")
        if L > 0:
            return F.lag("_zy", L).over(wi)
        return F.lead("_zy", -L).over(wi)

    lagged = base.select(
        *key_cols, "_i", "_zx", "_zy",
        *[shifted(L).alias(f"_s{L}") for L in lags])

    def fold(col_a, col_b):
        arr = F.sort_array(F.collect_list(F.when(
            col_b.isNotNull(),
            F.struct(F.col("_i"),
                     (col_a.cast("double")
                      * col_b.cast("double")).alias("p")))))
        return F.aggregate(arr, F.lit(0.0), lambda a, s: a + s["p"])

    aggs = [F.count(F.lit(1)).alias("n"),
            fold(F.col("_zx"), F.col("_zx")).alias("_dx"),
            fold(F.col("_zy"), F.col("_zy")).alias("_dy")]
    for L in lags:
        aggs.append(fold(F.col("_zx"), F.col(f"_s{L}"))
                    .alias(f"_num{L}"))
        aggs.append(F.sum(F.when(F.col(f"_s{L}").isNotNull(), 1)
                          .otherwise(0)).alias(f"_np{L}"))
    per = lagged.groupBy(*key_cols).agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(L).cast("int").alias("lag"),
            F.col(f"_np{L}").alias("n_pairs"),
            F.when((F.col(f"_np{L}") > 0) & (F.col("_dx") > 0.0)
                   & (F.col("_dy") > 0.0),
                   F.col(f"_num{L}")
                   / F.sqrt(F.col("_dx") * F.col("_dy"))).alias("ccf"))
        for L in lags])
    return (per.select(*key_cols, "n", F.explode(rows).alias("_s"))
            .select(*key_cols, F.col("_s.lag").alias("lag"), "n",
                    F.col("_s.n_pairs").alias("n_pairs"),
                    F.col("_s.ccf").alias("ccf")))


def ewma_chart(df: DataFrame, key_cols: "list[str]", *,
               order_cols: "tuple[str, ...]", value_col: str,
               lam_num: int = 1, lam_den: int = 4, limit_l: float = 3.0,
               max_len: int = 4000) -> DataFrame:
    """EWMA control chart (Roberts 1959; Lucas & Saccucci 1990) — the
    small-shift process monitor: z_t = z_{t−1} + λ(x_t − z_{t−1}) with
    time-varying limits μ ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})), flagging
    points outside.  The SPC sibling of control_chart's c-chart, for
    mean drift instead of count bursts.

    Determinism without exactness claims the math can't make: λ must
    be dyadic (lam_den a power of two, checked) so λ and (1−λ)² are
    exact doubles; the z recursion and the variance-decay product
    w_t = (1−λ)^{2t} are ONE left-associated in-row fold over the
    time-ordered series — both engines execute the identical IEEE op
    sequence, so every z_t, w_t, and limit is bit-reproducible.  μ and
    σ come from exact integer moments (Σx² in DECIMAL(38) — int64
    overflows around n·x² ≈ 10¹⁹) with one division and one √ chain.

    Scale shape: one key exchange into per-key sorted arrays; the fold
    is linear per series, but series live in-row — ``max_len`` raises
    in-plan (charts monitor bounded windows; shard longer streams by
    period upstream).

    Returns one row per (key..., t): ``(t, n, z, w, ucl, lcl, ooc)``.
    """
    if lam_den <= 0 or (lam_den & (lam_den - 1)) != 0:
        raise ValueError("lam_den must be a positive power of two")
    if not 0 < lam_num < lam_den:
        raise ValueError("need 0 < lam_num < lam_den")
    lam = lam_num / lam_den
    d1sq = (1.0 - lam) * (1.0 - lam)
    c2 = lam / (2.0 - lam)

    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("long")
    base = df.select(*key_cols, F.row_number().over(w).alias("_i"),
                     v.alias("_x"))
    per = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum((F.col("_x") * F.col("_x"))
              .cast("decimal(38,0)")).alias("_sq"),
        F.array_sort(F.collect_list(
            F.struct("_i", "_x"))).alias("_arr"))
    n = F.when(
        F.col("_n") > max_len,
        F.raise_error(F.concat(
            F.lit(f"ewma_chart: series exceeds {max_len} points: "),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))
    mu = F.col("_s").cast("double") / n.cast("double")
    var = ((n.cast("decimal(38,0)") * F.col("_sq")
            - (F.col("_s").cast("decimal(38,0)")
               * F.col("_s").cast("decimal(38,0)"))).cast("double")
           / (n * n).cast("double"))
    sigma = F.sqrt(var)
    zero = F.struct(
        mu.alias("z"), F.lit(1.0).alias("w"),
        F.array().cast("array<struct<t: int, z: double, w: double>>")
        .alias("out"))
    step = lambda acc, e: F.struct(
        (acc["z"] + F.lit(lam) * (e["_x"].cast("double") - acc["z"]))
        .alias("z"),
        (acc["w"] * F.lit(d1sq)).alias("w"),
        F.concat(acc["out"], F.array(F.struct(
            (F.size(acc["out"]) + 1).cast("int").alias("t"),
            (acc["z"] + F.lit(lam)
             * (e["_x"].cast("double") - acc["z"])).alias("z"),
            (acc["w"] * F.lit(d1sq)).alias("w")))).alias("out"))
    folded = per.select(
        *key_cols, n.alias("n"), mu.alias("_mu"), sigma.alias("_sig"),
        F.aggregate(F.col("_arr"), zero, step)["out"].alias("_out"))
    half = F.lit(limit_l) * F.col("_sig") * F.sqrt(
        F.lit(c2) * (F.lit(1.0) - F.col("_e.w")))
    return (folded.select(*key_cols, "n", "_mu", "_sig",
                          F.explode("_out").alias("_e"))
            .select(*key_cols, F.col("_e.t").alias("t"), "n",
                    F.col("_e.z").alias("z"), F.col("_e.w").alias("w"),
                    (F.col("_mu") + half).alias("ucl"),
                    (F.col("_mu") - half).alias("lcl"),
                    ((F.col("_e.z") > F.col("_mu") + half)
                     | (F.col("_e.z") < F.col("_mu") - half))
                    .alias("ooc")))


_SAX_BREAKS = (-0.6745, 0.0, 0.6745)   # N(0,1) quartile literals


def sax_words(df: DataFrame, key_cols: "list[str]", *,
              order_cols: "tuple[str, ...]", value_col: str,
              w: int = 4, word_len: int = 4,
              alphabet: str = "abcd",
              breaks: "tuple[float, ...]" = _SAX_BREAKS) -> DataFrame:
    """SAX motif vocabulary (Lin/Keogh/Lonardi 2003 Symbolic Aggregate
    approXimation): each series is z-normalized, piecewise-aggregated
    into ``w``-point segments, each segment mapped to an alphabet
    symbol by N(0,1) breakpoints, and consecutive ``word_len`` symbols
    form a word — the time-series "shingle" behind motif discovery and
    series indexing.  Output is the per-key word frequency table.

    Determinism without normalizing in floats: the segment statistic
    is the EXACT long Σ(n·x − S) over the segment, and each breakpoint
    comparison is against the pinned double chain (b·σ)·(n·w) — the
    z-scale denominators cross-multiplied away, so both engines
    compare the same two doubles.  Constant series (σ = 0) classify
    every segment to the top symbol by the strict-< ladder, pinned.
    Trailing partial words drop (only complete words are motifs).

    One key exchange (ordering window + two collapses).  Returns
    ``(*key_cols, word, n_words)``.
    """
    from ..geo.tilemath import floor_div

    if len(alphabet) != len(breaks) + 1:
        raise ValueError("need len(alphabet) == len(breaks) + 1")
    if w < 1 or word_len < 1:
        raise ValueError("w and word_len must be positive")
    pts = w * word_len
    order = [F.col(c).asc() for c in order_cols]
    wo = Window.partitionBy(*key_cols).orderBy(*order)
    whole = Window.partitionBy(*key_cols)
    v = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(whole)
    base = df.select(
        *key_cols,
        (F.row_number().over(wo) - 1).alias("_i"),
        n.alias("_n"),
        (n * v - F.sum(v).over(whole)).alias("_z"),
        (n.cast("decimal(38,0)") * F.sum((v * v).cast("decimal(38,0)"))
         .over(whole)
         - (F.sum(v).over(whole).cast("decimal(38,0)")
            * F.sum(v).over(whole).cast("decimal(38,0)")))
        .alias("_vnum"))
    base = base.filter(
        floor_div(F.col("_i"), pts)
        < floor_div(F.col("_n"), pts))        # complete words only
    seg = (base.groupBy(*key_cols,
                        floor_div(F.col("_i"), pts).alias("_w"),
                        floor_div(F.pmod(F.col("_i"), pts), w)
                        .alias("_s"))
           .agg(F.sum("_z").alias("_sz"),
                F.min("_n").alias("_n"),
                F.min("_vnum").alias("_vnum")))
    sig = F.sqrt(F.col("_vnum").cast("double")
                 / (F.col("_n") * F.col("_n")).cast("double"))
    sym = None
    sd = F.col("_sz").cast("double")
    for ch, b in zip(alphabet, breaks):
        thr = (F.lit(b) * sig) * (F.col("_n") * w).cast("double")
        cond = sd < thr
        sym = F.when(cond, F.lit(ch)) if sym is None \
            else sym.when(cond, F.lit(ch))
    sym = sym.otherwise(F.lit(alphabet[-1]))
    words = (seg.select(*key_cols, "_w", "_s", sym.alias("_c"))
             .groupBy(*key_cols, "_w")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("_s", "_c"))),
                     lambda s: s["_c"]), "").alias("word")))
    return (words.groupBy(*key_cols, "word")
            .agg(F.count(F.lit(1)).alias("n_words")))


def transfer_entropy(series: DataFrame, key_cols: "list[str]", *,
                     t_col: str = "t", x_col: str = "x",
                     y_col: str = "y") -> DataFrame:
    """Discrete transfer entropy (Schreiber 2000) between two aligned
    binary streams, history length 1 — the DIRECTIONAL coupling
    measure mutual information can't give: TE(X→Y) asks how much
    knowing X_t improves the prediction of Y_{t+1} beyond Y_t alone,

        TE = Σ c(y',y,x)/N · ln[ c(y',y,x)·c(y) / (c(y,x)·c(y',y)) ]

    computed BOTH ways (and asymmetry is the finding).  The series
    must be complete per key (every t present — gap-fill upstream;
    missing rows would silently skip transitions).

    Exactness: every count is an exact int64 over the lead-joined
    transitions; each of the ≤ 8 cell terms is c·ln(int-product /
    int-product) and the cell sum is a PINNED (y',y,x)-ordered fold;
    TE is one division by N.  Zero cells drop (0·ln0 = 0 convention);
    degenerate conditionals can't divide by zero (c3 > 0 ⇒ both
    denominators > 0).

    Shape: one ordering window per direction + one 8-cell groupBy —
    the key exchange dominates; series length is unbounded (counts,
    not per-t state).

    Returns two rows per key: ``(*key_cols, direction, n_trans,
    te_nats)`` with direction ∈ {'x->y', 'y->x'}.
    """
    g = list(key_cols)

    def one_way(drv: str, tgt: str, label: str) -> DataFrame:
        w = Window.partitionBy(*g).orderBy(t_col)
        tr = (series.select(
            *g, F.col(t_col).alias("_t"),
            F.col(tgt).cast("long").alias("_y"),
            F.col(drv).cast("long").alias("_x"),
            F.lead(F.col(tgt).cast("long")).over(w).alias("_yp"))
            .filter(F.col("_yp").isNotNull()))
        c3 = (tr.groupBy(*g, "_yp", "_y", "_x")
              .agg(F.count(F.lit(1)).alias("_c")))
        wk = Window.partitionBy(*g)
        wyx = Window.partitionBy(*g, "_y", "_x")
        wyy = Window.partitionBy(*g, "_yp", "_y")
        wy = Window.partitionBy(*g, "_y")
        cell = c3.select(
            *g, "_yp", "_y", "_x", "_c",
            F.sum("_c").over(wk).alias("_n"),
            F.sum("_c").over(wyx).alias("_cyx"),
            F.sum("_c").over(wyy).alias("_cyy"),
            F.sum("_c").over(wy).alias("_cy"))
        term = (F.col("_c").cast("double")
                * F.log((F.col("_c") * F.col("_cy")).cast("double")
                        / (F.col("_cyx") * F.col("_cyy"))
                        .cast("double")))
        arr = F.sort_array(F.collect_list(F.struct(
            "_yp", "_y", "_x", term.alias("_tm"))))
        return (cell.groupBy(*g)
                .agg(F.min("_n").alias("n_trans"), arr.alias("_a"))
                .select(*g, F.lit(label).alias("direction"),
                        "n_trans",
                        (F.aggregate(F.col("_a"), F.lit(0.0),
                                     lambda a, s: a + s["_tm"])
                         / F.col("n_trans").cast("double"))
                        .alias("te_nats")))

    return one_way(x_col, y_col, "x->y").unionAll(
        one_way(y_col, x_col, "y->x"))


def holt_forecast(df: DataFrame, key_cols: "list[str]", *,
                  order_cols: "tuple[str, ...]", value_col: str,
                  alpha_num: int = 1, alpha_den: int = 4,
                  beta_num: int = 1, beta_den: int = 8,
                  horizon: int = 3, max_len: int = 4000) -> DataFrame:
    """Holt double exponential smoothing (Holt 1957) — level + linear
    trend, the forecasting step past :func:`ewma_chart`'s monitoring:

        ℓ_t = ℓ_{t−1} + b_{t−1} + α(x_t − ℓ_{t−1} − b_{t−1})
        b_t = b_{t−1} + β(ℓ_t − ℓ_{t−1} − b_{t−1})
        x̂_{n+h} = ℓ_n + h·b_n

    Determinism: α and β must be dyadic (checked) so both are exact
    doubles; the coupled recursion is ONE left-associated in-row fold
    over the time-ordered series with the spelling above pinned —
    both engines run the identical IEEE sequence.  Initialization is
    the standard ℓ₁ = x₁, b₁ = x₂ − x₁ (series of length < 2 drop,
    documented).

    One key exchange; ``max_len`` raises in-plan.  Returns one row
    per (key, h): ``(*key_cols, n, h, level, trend, forecast)`` for
    h ∈ 1..horizon.
    """
    for num, den in ((alpha_num, alpha_den), (beta_num, beta_den)):
        if den <= 0 or (den & (den - 1)) != 0 or not 0 < num < den:
            raise ValueError("alpha/beta must be dyadic in (0, 1)")
    al = alpha_num / alpha_den
    be = beta_num / beta_den
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("long")
    base = df.select(*key_cols, F.row_number().over(w).alias("_i"),
                     v.alias("_x"))
    per = (base.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).alias("_n"),
                F.array_sort(F.collect_list(
                    F.struct("_i", "_x"))).alias("_a")))
    n = F.when(
        F.col("_n") > max_len,
        F.raise_error(F.concat(
            F.lit(f"holt_forecast: series exceeds {max_len} points: "),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))
    per = per.filter(F.col("_n") >= 2).select(
        *key_cols, n.alias("n"), "_a")
    x1 = F.element_at(F.col("_a"), 1)["_x"].cast("double")
    x2 = F.element_at(F.col("_a"), 2)["_x"].cast("double")
    zero = F.struct(x1.alias("l"), (x2 - x1).alias("b"))

    def step(acc, e):
        prior = acc["l"] + acc["b"]
        lvl = prior + F.lit(al) * (e["_x"].cast("double") - prior)
        return F.struct(
            lvl.alias("l"),
            (acc["b"] + F.lit(be) * (lvl - acc["l"] - acc["b"]))
            .alias("b"))

    fin = F.aggregate(F.slice(F.col("_a"), 2, F.size(F.col("_a"))),
                      zero, step)
    hs = F.explode(F.sequence(F.lit(1), F.lit(horizon)))
    out = per.select(*key_cols, "n", fin["l"].alias("level"),
                     fin["b"].alias("trend"), hs.alias("h"))
    return out.select(*key_cols, "n", F.col("h").cast("int").alias("h"),
                      "level", "trend",
                      (F.col("level")
                       + F.col("h").cast("double") * F.col("trend"))
                      .alias("forecast"))


def weighted_scheduling(df: DataFrame, key_cols: "list[str]", *,
                        start_col: str, end_col: str, weight_col: str,
                        max_len: int = 4000) -> DataFrame:
    """Weighted interval scheduling — the OPTIMAL total weight of
    pairwise non-overlapping intervals per key (the classic DP;
    span_schedule's unweighted greedy picks MOST intervals, this
    picks the heaviest compatible set — greedy is arbitrarily bad
    under weights, pinned in tests).

    Exact integer DP: intervals sorted by (end, start, weight); for
    each interval i, p(i) = the latest interval ending ≤ start_i
    (touching endpoints compatible), and dp[i] = max(dp[i−1],
    w_i + dp[p(i)]) — ONE in-row fold carrying the dp ladder as an
    int64 list with element_at random access; p(i) is resolved
    INSIDE the fold by a backwards scan over the (sorted) ends
    (O(n²) worst case in-row, ``max_len``-guarded).

    One key exchange.  Returns ``(*key_cols, n, best_weight)``.
    """
    g = list(key_cols)
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    bad = e < s
    base = df.select(
        *g,
        F.when(bad, F.raise_error(F.lit(
            "weighted_scheduling: end < start")).cast("long"))
        .otherwise(s).alias("_s"),
        e.alias("_e"),
        F.col(weight_col).cast("long").alias("_w"))
    per = (base.groupBy(*g)
           .agg(F.count(F.lit(1)).alias("n"),
                F.array_sort(F.collect_list(
                    F.struct("_e", "_s", "_w"))).alias("_a")))
    guard = F.when(
        F.col("n") > max_len,
        F.raise_error(F.concat(
            F.lit(f"weighted_scheduling: > {max_len} intervals: "),
            F.col("n").cast("string"))).cast("long"))
    arr = F.col("_a")
    # dp list: dp[1] = 0 (empty prefix), dp[i+1] = best over first i
    zero = F.array(F.lit(0).cast("long"))

    def step(acc, iv):
        k = F.size(acc)                       # intervals done so far
        # p(i): count of sorted intervals with end <= start_i — ends
        # are the sort key, so the prefix property holds
        p = F.size(F.filter(F.slice(arr, 1, k - 1),
                            lambda q: q["_e"] <= iv["_s"]))
        take = iv["_w"] + F.element_at(acc, (p + 1).cast("int"))
        skip = F.element_at(acc, k)
        return F.concat(acc, F.array(F.greatest(take, skip)))

    dp = F.aggregate(arr, zero, step)
    return per.select(
        *g, F.coalesce(guard, F.col("n")).alias("n"),
        F.element_at(dp, -1).alias("best_weight"))


def holt_winters(df: DataFrame, key_cols: "list[str]", *,
                 order_cols: "tuple[str, ...]", value_col: str,
                 m: int = 7, alpha_num: int = 1, alpha_den: int = 4,
                 beta_num: int = 1, beta_den: int = 8,
                 gamma_num: int = 1, gamma_den: int = 4,
                 horizon: int = 7, max_len: int = 4000) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) — level +
    trend + period-``m`` seasonality, the full classical forecaster
    past :func:`holt_forecast`:

        ℓ_t = α(x_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
        b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}
        s_t = γ(x_t − ℓ_t) + (1−γ)s_{t−m}
        x̂_{n+h} = ℓ_n + h·b_n + s_{n+h−m⌈h/m⌉}

    Determinism: α, β, γ dyadic (checked); the state
    [t, ℓ, b, s₁..s_m] rides ONE left-associated in-row fold as a
    flat double list with the spellings above pinned — identical
    IEEE sequences cross-engine.  Initialization is the classical
    two-period seed: ℓ₀ = mean(x₁..x_m), b₀ = (mean(x_{m+1}..x_{2m})
    − ℓ₀)/m, s_j = x_j − ℓ₀; the recursion consumes x_{m+1}..x_n.
    Series shorter than 2m drop (documented).

    One key exchange; ``max_len`` raises in-plan.  Returns one row
    per (key, h): ``(*key_cols, n, h, level, trend, seasonal,
    forecast)`` for h ∈ 1..horizon.
    """
    for num, den in ((alpha_num, alpha_den), (beta_num, beta_den),
                     (gamma_num, gamma_den)):
        if den <= 0 or (den & (den - 1)) != 0 or not 0 < num < den:
            raise ValueError("alpha/beta/gamma must be dyadic in (0,1)")
    if m < 2:
        raise ValueError("m must be >= 2")
    al = alpha_num / alpha_den
    be = beta_num / beta_den
    ga = gamma_num / gamma_den
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("long")
    base = df.select(*key_cols, F.row_number().over(w).alias("_i"),
                     v.alias("_x"))
    per = (base.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).alias("_n"),
                F.array_sort(F.collect_list(
                    F.struct("_i", "_x"))).alias("_a")))
    n = F.when(
        F.col("_n") > max_len,
        F.raise_error(F.concat(
            F.lit(f"holt_winters: series exceeds {max_len} points: "),
            F.col("_n").cast("string"))).cast("long")
    ).otherwise(F.col("_n"))
    per = per.filter(F.col("_n") >= 2 * m).select(
        *key_cols, n.alias("n"), "_a")
    xs = F.transform(F.col("_a"), lambda s: s["_x"].cast("double"))

    def seg_mean(lo, cnt):
        return (F.aggregate(F.slice(xs, lo, cnt), F.lit(0.0),
                            lambda a, x: a + x) / F.lit(float(cnt)))

    l0 = seg_mean(1, m)
    b0 = (seg_mean(m + 1, m) - l0) / F.lit(float(m))
    seed = F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                       lambda j: F.element_at(xs, (j + 1).cast("int"))
                       - l0)
    zero = F.concat(F.array(F.lit(float(m)), l0, b0), seed)

    def step(acc, x):
        t = F.element_at(acc, 1)           # points consumed so far
        sidx = F.pmod(t.cast("long"), m)   # 0-based slot of pos t+1
        l_old = F.element_at(acc, 2)
        b_old = F.element_at(acc, 3)
        s_old = F.element_at(acc, (sidx + 4).cast("int"))
        l_new = (F.lit(al) * (x - s_old)
                 + F.lit(1.0 - al) * (l_old + b_old))
        b_new = (F.lit(be) * (l_new - l_old)
                 + F.lit(1.0 - be) * b_old)
        s_new = F.lit(ga) * (x - l_new) + F.lit(1.0 - ga) * s_old
        seas = F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.when(j.cast("long") == sidx, s_new)
            .otherwise(F.element_at(acc, (j + 4).cast("int"))))
        return F.concat(F.array(t + 1.0, l_new, b_new), seas)

    fin = F.aggregate(F.slice(xs, m + 1, F.size(xs)), zero, step)
    hs = F.explode(F.sequence(F.lit(1), F.lit(horizon)))
    out = per.select(*key_cols, "n", fin.alias("_f"), hs.alias("h"))
    lev = F.element_at(F.col("_f"), 2)
    trd = F.element_at(F.col("_f"), 3)
    sidx = F.pmod(F.col("n") + F.col("h") - 1, m)
    seas = F.element_at(F.col("_f"), (sidx + 4).cast("int"))
    return out.select(*key_cols, "n", F.col("h").cast("int").alias("h"),
                      lev.alias("level"), trd.alias("trend"),
                      seas.alias("seasonal"),
                      (lev + F.col("h").cast("double") * trd + seas)
                      .alias("forecast"))


def series_motif(df: DataFrame, group_cols: "list[str]", *,
                 t_col: str = "t", v_col: str = "v", w: int = 6,
                 max_windows: int = 4096) -> DataFrame:
    """Per-series motif pair (the matrix-profile global motif, Yeh et
    al. ICDM 2016, in its exact raw-distance form): the two
    NON-OVERLAPPING length-``w`` subsequences with minimal Euclidean
    d² — exact integer, so the winner value-hashes; z-normalized
    variants trade that exactness away and belong in a rerank stage.

    ``t_col`` is an integer grid index (e.g. hour number); windows are
    built by a lead chain over t-order and kept only when CONTIGUOUS
    (lead(t, w−1) = t + w − 1), so calendar gaps drop candidates
    instead of silently stitching across them.

    Shape: one window pass (w−1 leads) + ONE within-group self-join of
    the window table (quadratic in windows-per-group, the exact-motif
    lower bound without FFT machinery) + one min-struct argmin.  The
    in-plan ``max_windows`` guard bounds the join; ties break to the
    earliest (t_a, t_b).

    Returns ``(*group_cols, n_windows, t_a, t_b, d2)``.
    """
    from pyspark.sql import Window as W

    if w < 2:
        raise ValueError("w must be >= 2")
    base = df.select(*group_cols,
                     F.col(t_col).cast("long").alias("_t"),
                     F.col(v_col).cast("long").alias("_v"))
    ww = W.partitionBy(*group_cols).orderBy("_t")
    cols = [F.lead("_v", k).over(ww).alias(f"_v{k}")
            for k in range(1, w)]
    wins = (base.select(*group_cols, "_t", "_v", *cols,
                        F.lead("_t", w - 1).over(ww).alias("_tend"))
            .filter(F.col("_tend") == F.col("_t") + (w - 1)))
    nwin = (wins.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("_nw")))
    guard = F.when(
        F.col("_nw") > max_windows,
        F.raise_error(F.format_string(
            f"series_motif: group exceeds max_windows={max_windows} "
            "(got %s)", F.col("_nw").cast("string")))
    ).otherwise(F.col("_nw"))
    a = wins.select(*group_cols, F.col("_t").alias("_ta"),
                    *[F.col(f"_v{k}" if k else "_v").alias(f"_a{k}")
                      for k in range(w)])
    b = wins.select(*group_cols, F.col("_t").alias("_tb"),
                    *[F.col(f"_v{k}" if k else "_v").alias(f"_b{k}")
                      for k in range(w)])
    d2 = None
    for k in range(w):
        term = ((F.col(f"_a{k}") - F.col(f"_b{k}"))
                * (F.col(f"_a{k}") - F.col(f"_b{k}")))
        d2 = term if d2 is None else d2 + term
    pairs = (a.join(b, [*group_cols])
             .filter(F.col("_tb") >= F.col("_ta") + w))
    best = (pairs.groupBy(*group_cols)
            .agg(F.min(F.struct(d2.alias("d"),
                                F.col("_ta").alias("ta"),
                                F.col("_tb").alias("tb"))).alias("_m")))
    return (best.join(nwin, [*group_cols])
            .select(*group_cols, guard.alias("n_windows"),
                    F.col("_m.ta").alias("t_a"),
                    F.col("_m.tb").alias("t_b"),
                    F.col("_m.d").alias("d2")))


def kleinberg_bursts(df: DataFrame, group_cols: "list[str]", *,
                     t_col: str = "t", steps: int, gamma_micro:
                     int = 1_000_000, scale: int = 1_000_000
                     ) -> DataFrame:
    """Kleinberg 2-state burst detection (Kleinberg KDD'02): the
    inter-event gap sequence is decoded against a base-rate state q0
    (exponential rate λ = n/T) and a burst state q1 (rate 2λ); the
    optimal state sequence minimizes

        Σ (λ_i·x − ln λ_i)  +  γ·ln n · #(q0→q1 transitions)

    — the standard automaton with s=2.  Exactness: emission costs are
    µ-nat-quantized with the λ·x term EXACT ((n·x·2^i·scale) // T —
    one integer floor-division) and the ln terms single pinned-double
    lns of exact rationals; ties break on the state-path string, so
    the decode value-hashes.

    Contract: every group must present exactly ``steps + 1`` events
    (t values 0..steps ordered); derive with a row_number cap
    upstream.  Groups with zero total span (all gaps 0) are dropped —
    λ is undefined.

    Shape: one gap window pass + a per-group scalar aggregate
    (broadcast back) + ``steps`` relational DP rounds over TWO states
    — each one equi-join and a (group, state) argmin, localCheckpoint
    every few rounds.

    Returns ``(*group_cols, n_gaps, total_cost_micro, states,
    n_burst)`` — ``states`` the 0/1 decode per gap, ``n_burst`` the
    number of gaps spent in the burst state.
    """
    from pyspark.sql import Window as W

    if steps < 1:
        raise ValueError("steps must be >= 1")
    w = W.partitionBy(*group_cols).orderBy("_t")
    base = df.select(*group_cols, F.col(t_col).cast("long").alias("_t"))
    gaps = (base.select(*group_cols, "_t",
                        (F.lead("_t").over(w) - F.col("_t"))
                        .alias("_gap"),
                        (F.row_number().over(w) - 1).alias("_r"))
            .filter(F.col("_gap").isNotNull()))
    ok = (gaps.groupBy(*group_cols)
          .agg(F.count(F.lit(1)).alias("_n"),
               F.sum("_gap").alias("_tt"))
          .filter((F.col("_n") == steps) & (F.col("_tt") > 0)))
    lam_ln = [F.floor(F.log((F.lit(float(2 ** i)) * F.col("_n"))
                            .cast("double")
                            / F.col("_tt").cast("double"))
                      * scale + F.lit(0.5)).cast("long")
              for i in (0, 1)]
    trans = F.floor(F.log(F.col("_n").cast("double"))
                    * (gamma_micro / 1_000_000.0) * scale
                    + F.lit(0.5)).cast("long")
    # the scalar table derives FROM gaps: break the shared lineage
    # before self-joining or attribute resolution turns ambiguous
    sc = ok.select(*group_cols, "_n", "_tt",
                   lam_ln[0].alias("_ln0"), lam_ln[1].alias("_ln1"),
                   trans.alias("_tr")).localCheckpoint()
    g = gaps.join(F.broadcast(sc), [*group_cols]).localCheckpoint()

    gap_bound = (1 << 62) // (steps * 2 * scale)

    def emit(state: int) -> Column:
        from ..geo.tilemath import floor_div_big

        # in-plan guard: n*gap*2^s*scale must stay inside int64 (the
        # woe_iv discipline — raise, never wrap); the floor is the
        # exact decimal form, good past 2^53
        gap = F.when(
            F.col("_gap") > gap_bound,
            F.raise_error(F.lit(
                "kleinberg_bursts: gap exceeds the exact-int64 "
                "emission bound; coarsen the time unit"))
        ).otherwise(F.col("_gap"))
        lam_x = F.col("_n") * gap * (2 ** state) * scale
        exact = floor_div_big(lam_x, F.col("_tt"))
        return exact - F.col(f"_ln{state}")

    first = g.filter(F.col("_r") == 0)
    state = None
    for s in (0, 1):
        part = first.select(
            *group_cols, F.lit(s).alias("_s"),
            # the automaton starts in q0: entering q1 on gap 0 pays γln n
            (emit(s) + (F.col("_tr") if s == 1 else F.lit(0)))
            .alias("cost"),
            F.lit(str(s)).alias("path"))
        state = part if state is None else state.unionByName(part)
    for r in range(1, steps):
        cr = g.filter(F.col("_r") == r)
        nxt = None
        for s in (0, 1):
            cand = (state.join(cr, [*group_cols])
                    .select(*group_cols,
                            (F.col("cost") + emit(s)
                             + F.when((F.col("_s") == 0) & (s == 1),
                                      F.col("_tr")).otherwise(F.lit(0))
                             ).alias("_c"),
                            F.concat(F.col("path"), F.lit(str(s)))
                            .alias("_p")))
            best = (cand.groupBy(*group_cols)
                    .agg(F.min(F.struct(F.col("_c"), F.col("_p")))
                         .alias("_b"))
                    .select(*group_cols, F.lit(s).alias("_s"),
                            F.col("_b._c").alias("cost"),
                            F.col("_b._p").alias("path")))
            nxt = best if nxt is None else nxt.unionByName(best)
        state = nxt
        if r % 6 == 0:
            state = state.localCheckpoint()
    final = (state.groupBy(*group_cols)
             .agg(F.min(F.struct(F.col("cost"), F.col("path")))
                  .alias("_b")))
    states = F.col("_b.path")
    return final.select(
        *group_cols, F.lit(steps).cast("long").alias("n_gaps"),
        F.col("_b.cost").alias("total_cost_micro"),
        states.alias("states"),
        (F.length(states)
         - F.length(F.replace(states, F.lit("1"), F.lit(""))))
        .cast("long").alias("n_burst"))
