"""Dataset-versioning operators: snapshot diff (CDC-style
insert/update/delete detection between two versions of a table).

A training-data pipeline re-crawls and re-filters continuously; the
diff between consecutive corpus snapshots is what feeds incremental
dedup/re-train jobs downstream.  The reference has no versioning
story (its state lives in transient bolt buffers, SURVEY.md §2.10);
this is the batch primitive a lakehouse MERGE is built from.

Scale: the diff is a single full-outer sort-merge join on the
primary key.  On a real deployment both snapshots would be written
bucketed by ``doc_id`` (see ``scale.layout.write_bucketed``), which
turns the join shuffle-free; content comparison uses a fingerprint
column rather than the payload when rows are wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic synthetic snapshots, derived from doc_id so the
# DuckDB oracle can replay them exactly:
#   h = doc_id % 20
#   old snapshot: rows with h != 0          (h == 0 missing -> INSERTed later)
#   new snapshot: rows with h != 1          (h == 1 dropped  -> DELETEd)
#                 text of h == 2 rows gets a ' [rev]' suffix  -> UPDATEd
SNAP_MOD = 20
INSERT_SLOT = 0
DELETE_SLOT = 1
UPDATE_SLOT = 2


def synthetic_snapshots(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Derive the deterministic (old, new) snapshot pair described in
    the module constants from one ``documents`` table."""
    h = F.col("doc_id") % SNAP_MOD
    old = docs.filter(h != INSERT_SLOT).select("doc_id", "text")
    new = docs.filter(h != DELETE_SLOT).select(
        "doc_id",
        F.when(h == UPDATE_SLOT, F.concat(F.col("text"), F.lit(" [rev]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return old, new


def scd2_history(
    df: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each key's
    event stream into validity intervals, one row per *run* of equal
    ``attr`` values (gaps-and-islands).  Output: (key, attr,
    valid_from, valid_to, n_events, is_current) where ``valid_to`` is
    the next run's start (null on the current run).

    This is the batch primitive behind dimension-table MERGEs and
    point-in-time joins over mutable entity state.  Plan: one shuffle
    on ``key`` feeding lag/run-id/aggregate windows all on the same
    partitioning — Catalyst reuses a single sort; no joins.
    ``seq`` breaks timestamp ties deterministically.
    """
    w = Window.partitionBy(key).orderBy(ts, seq)
    runs = df.select(
        key,
        attr,
        ts,
        seq,
        F.when(
            F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    ).withColumn("_run", F.sum("_chg").over(w))
    intervals = runs.groupBy(key, "_run").agg(
        F.first(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("_run")
    return intervals.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def point_in_time_state(
    df: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    seq: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """Time-travel / point-in-time read over the SCD2 history: sample
    each key's valid ``attr`` on a per-key hourly grid — the
    feature-store "AS OF" join that prevents label leakage (a feature
    row must see the dimension state at ITS timestamp, never a later
    one).  Output: (key, as_of, state, state_since_s); ``state`` is
    NULL before the key's first run.

    Plan is the scalable union-and-carry-forward (same family as
    :func:`..temporal.asof_join`): history runs and probe timestamps
    union on (key, t), one hash shuffle on ``key``, and
    ``last(..., ignorenulls)`` carries the latest run forward —
    O(n log n) per key versus the |probes| x |runs| candidate blow-up
    of the naive inequality join.  A probe landing exactly on
    ``valid_from`` sees the run that starts there (history rows sort
    before probes on ties).  ``state_since_s`` ships as epoch-second
    BIGINT (hash-exact discipline).
    """
    hist = scd2_history(df, key=key, attr=attr, ts=ts, seq=seq)
    bounds = df.groupBy(key).agg(
        F.date_trunc("hour", F.min(ts)).alias("t0"),
        F.date_trunc("hour", F.max(ts)).alias("t1"),
    )
    probes = bounds.select(
        key,
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL {step}"))
        ).alias("t"),
    )
    p = probes.select(
        key,
        "t",
        F.lit(None).cast("string").alias("_attr"),
        F.lit(None).cast("timestamp").alias("_vf"),
        F.lit(0).alias("_src"),
    )
    h = hist.select(
        key,
        F.col("valid_from").alias("t"),
        F.col(attr).alias("_attr"),
        F.col("valid_from").alias("_vf"),
        F.lit(1).alias("_src"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("t"), F.desc("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = p.unionByName(h)
    return (
        u.withColumn("state", F.last("_attr", ignorenulls=True).over(w))
        .withColumn("_since", F.last("_vf", ignorenulls=True).over(w))
        .filter(F.col("_src") == 0)
        .select(
            key,
            F.col("t").alias("as_of"),
            "state",
            F.unix_timestamp("_since").alias("state_since_s"),
        )
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "doc_id") -> DataFrame:
    """Change set between two snapshots keyed by ``key``: one row per
    changed key with op in {insert, delete, update} and the old/new
    payload lengths.  Unchanged rows are dropped.

    One full-outer join on the key; comparison is null-safe so a
    null payload never masquerades as a change.
    """
    o = old.select(F.col(key), F.col("text").alias("_old"))
    n = new.select(F.col(key), F.col("text").alias("_new"))
    j = o.join(n, key, "full_outer")
    op = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            key,
            "op",
            F.length("_old").alias("old_len"),
            F.length("_new").alias("new_len"),
        )
    )


def latest_per_key(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """Upsert compaction: the latest row per key (``ts`` desc, ``seq``
    desc tiebreak) — what a CDC stream folds into a current-state
    table, and the companion primitive to :func:`scd2_history` (full
    history) and :func:`snapshot_diff` (two-version delta).

    One keyed row_number window.  At scale this is the compaction an
    ingest job runs per partition before MERGE; the window shuffle is
    the unavoidable cost and AQE splits skewed keys."""
    w = Window.partitionBy(key).orderBy(F.desc(ts), F.desc(seq))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


PSI_BIN_WIDTH = 50


def psi_drift(
    old: DataFrame, new: DataFrame, width: int = PSI_BIN_WIDTH
) -> DataFrame:
    """Population-stability-index drift between two snapshot versions
    of the corpus, over the document-length distribution: per
    equi-width bin, old/new counts, shares and the PSI term
    ``(q - p) * ln(q / p)`` — the standard drift alarm between
    consecutive corpus builds.  Bins observed in only one snapshot
    are reported with a NULL psi_term (the unsmoothed PSI is
    undefined there) rather than silently epsilon-smoothed.

    Two scans + two tiny aggregations + a full-outer join on the bin
    id; totals are 1-row broadcasts."""
    def binned(df: DataFrame, cname: str) -> DataFrame:
        return (
            df.select(
                (F.floor(F.length("text") / width)).cast("long").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    o = binned(old, "n_old")
    n = binned(new, "n_new")
    j = o.join(n, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = j.select(
        F.sum("n_old").alias("_to"), F.sum("n_new").alias("_tn")
    )
    p = F.col("n_old") / F.col("_to")
    q = F.col("n_new") / F.col("_tn")
    return j.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_old",
        "n_new",
        F.round(p, 6).alias("p_share"),
        F.round(q, 6).alias("q_share"),
        F.when(
            (F.col("n_old") > 0) & (F.col("n_new") > 0),
            F.round((q - p) * F.log(q / p), 6),
        ).alias("psi_term"),
    )


INC_SPLIT_TS = "2024-01-20 00:00:00"


def incremental_rollup(
    events: DataFrame, split_ts: str = INC_SPLIT_TS
) -> DataFrame:
    """Incremental aggregate maintenance: a stored base rollup (rows
    before ``split_ts``) merged with a delta rollup (rows at/after),
    via re-aggregation of the ALGEBRAIC partials (count -> sum of
    counts, sum -> sum of sums, min/max -> min/max of partials).
    Must equal the full recompute — that equality is the oracle.

    This is the pattern a 100 TB daily pipeline lives on: yesterday's
    materialized partials never get rescanned; only the delta
    partition is read and the merge touches one row per (partition,
    group).  Any aggregate expressible as a commutative monoid merges
    this way; the non-mergeable ones (exact distinct, exact median)
    are exactly the ones the sketch operators replace."""
    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL partials: the partial-merge is then exact integer
            # arithmetic, so it equals the full recompute bit-for-bit
            # regardless of partition order (VERDICT r1 #1c)
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum_v"),
            F.min("value").alias("_min_v"),
            F.max("value").alias("_max_v"),
        )

    base = partial(events.filter(F.col("ts") < split_ts))
    delta = partial(events.filter(F.col("ts") >= split_ts))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_v").cast("double").alias("sum_value"),
            F.round(F.min("_min_v"), 6).alias("min_value"),
            F.round(F.max("_max_v"), 6).alias("max_value"),
        )
    )
