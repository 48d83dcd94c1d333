"""Distributed aggregate statistics: exact rank-based percentiles,
equi-width histograms, exact heavy hitters, and HyperLogLog distinct
sketches.

The reference engine's aggregation surface stops at count/sum
buffers (SURVEY.md §2.7 — ``TopicModelBolt.java:87-99`` count maps);
these are the statistics a 100 TB profiling / quality pass actually
runs.  Design notes:

- ``group_percentiles`` is the *rank-based* exact formulation (one
  sort shuffle + row-number windows, O(1) memory per row) rather
  than Spark's built-in ``percentile``, whose ObjectHashAggregate
  buffers every value of a group in executor memory — the built-in
  dies on a billion-row group, the window plan does not.
- ``heavy_hitters`` relies on partial aggregation (map-side combine)
  so the shuffle carries one row per distinct key per task, then a
  TakeOrdered top-k — never a single-partition global window.
- ``hll_distinct`` is the sketch path (``approx_count_distinct``,
  HyperLogLog++): mergeable, constant memory, the only viable
  distinct count at 100 TB.  It is deliberately rows-only in the
  oracle catalog (sketch estimates are engine-specific); the test
  suite bounds its relative error against the exact count instead.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PERCENTILES: tuple[float, ...] = (0.5, 0.9, 0.99)
HISTOGRAM_WIDTH = 25_000.0  # o_totalprice bin width
HEAVY_HITTER_K = 20
HLL_RSD = 0.05  # target relative standard deviation for the sketch


def group_percentiles(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ps: Sequence[float] = PERCENTILES,
) -> DataFrame:
    """Exact linear-interpolated percentiles (``quantile_cont``
    semantics: index ``1 + (n-1)*p``, 1-based) per key group,
    returned long-form as (keys..., p, pct_value).

    Plan: one shuffle on ``keys`` feeding two windows (row_number +
    count), a bounded explode of the percentile list, a filter down
    to the two boundary rows per (group, p), and a tiny final
    aggregation.  Peak memory is O(1) per row — no per-group value
    buffering — so a group can hold a billion rows.  Parallelism is
    the key cardinality; for very-low-cardinality keys prefer a
    two-phase histogram refinement (same idea as ``histogram``).
    """
    w = Window.partitionBy(*keys).orderBy(value)
    ranked = df.select(
        *keys,
        F.col(value).cast("double").alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_n"),
    )
    # bounded explode: |ps| rows per input row, filtered immediately
    exploded = ranked.withColumn(
        "p", F.explode(F.array(*[F.lit(float(p)) for p in ps]))
    )
    idx = F.lit(1.0) + (F.col("_n") - 1) * F.col("p")
    lo, hi = F.floor(idx), F.ceil(idx)
    frac = idx - lo
    boundary = exploded.filter(
        (F.col("_rn") == lo) | (F.col("_rn") == hi)
    ).select(
        *keys,
        "p",
        F.when(lo == hi, F.col("_v"))  # exact index: single full row
        .when(F.col("_rn") == lo, F.col("_v") * (F.lit(1.0) - frac))
        .otherwise(F.col("_v") * frac)
        .alias("_part"),
    )
    return boundary.groupBy(*keys, "p").agg(
        F.round(F.sum("_part"), 4).alias("pct_value")
    )


def _interp_xden(intcol: str, num: int, den: int):
    """Aggregate expression: the linearly-interpolated quantile at
    position ``(n-1)*num/den`` over an INTEGER column, scaled by
    ``den`` — i.e. ``(den-rem)*v[i] + rem*v[i+1]`` — an exact BIGINT,
    the cross-engine-safe form of every rank-interpolation statistic
    (r4 verdict #2 sweep).  Expects ``_rk`` (1-based row_number over
    the value order) and ``_n`` (group count) alongside ``intcol``."""
    pos = (F.col("_n") - 1) * num
    i = F.floor(pos / F.lit(den)) + 1  # 1-based lower rank
    rem = pos % den
    return F.sum(
        F.when(F.col("_rk") == i, (den - rem) * F.col(intcol))
        .when(F.col("_rk") == i + 1, rem * F.col(intcol))
        .otherwise(F.lit(0))
    )


def _ranked_cents(df: DataFrame, value: str, keys: Sequence[str]) -> DataFrame:
    """(keys, _vi cents, _rk, _n) with NULL measurements excluded —
    the shared input of the exact rank-interpolation plans."""
    vc = (F.col(value).cast("decimal(18,2)") * 100).cast("long")
    c = df.where(F.col(value).isNotNull()).select(*keys, vc.alias("_vi"))
    w = Window.partitionBy(*keys)
    return c.select(
        *keys,
        "_vi",
        F.row_number().over(w.orderBy("_vi")).alias("_rk"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )


def group_percentiles_cents(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ps100: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Exact linear-interpolated percentiles per key group over an
    exact-cents measure, ALL-INTEGER: position ``(n-1)*p100/100``,
    output ``pct_x1e4`` = dollars*1e4 = ``(100-rem)*v[i] +
    rem*v[i+1]`` cents*100 — bit-exact cross-engine by construction
    (no interpolated double, no builtin round; r4 verdict #2 sweep).
    Same one-sort O(1)-memory rank plan as :func:`group_percentiles`."""
    r = _ranked_cents(df, value, keys)
    aggs = [
        _interp_xden("_vi", p, 100).alias(f"_p{p}") for p in ps100
    ]
    wide = r.groupBy(*keys).agg(*aggs)
    per_p = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("p100"), F.col(f"_p{p}").alias("pct_x1e4")
                )
                for p in ps100
            ]
        )
    ).alias("_e")
    return wide.select(*keys, per_p).select(
        *keys, "_e.p100", "_e.pct_x1e4"
    )


def mad(
    df: DataFrame, value: str, keys: Sequence[str]
) -> DataFrame:
    """Median absolute deviation per key group: the robust dispersion
    statistic quality-filter pipelines use where stddev is blown up
    by outliers.  Exact, via the rank-based median plan twice (values,
    then absolute deviations joined back) — O(1) memory per row, no
    per-group buffering.

    ALL-INTEGER (r4 verdict #2 sweep): the median of cents has
    denominator 2 (``med_x2`` = cents*2 BIGINT), deviations stay
    exact in the same doubled units (``|2*v - med_x2|``), and the
    deviation median has denominator 4 — so ``median_x1e4`` =
    ``med_x2*50`` and ``mad_x1e4`` = ``madq_x4*25`` (dollars*1e4)
    are exact BIGINTs end-to-end."""
    r = _ranked_cents(df, value, keys)
    med = r.groupBy(*keys).agg(_interp_xden("_vi", 1, 2).alias("_med_x2"))
    devs = r.join(F.broadcast(med), list(keys)).select(
        *keys,
        "_med_x2",
        F.abs(2 * F.col("_vi") - F.col("_med_x2")).alias("_dev_x2"),
    )
    wd = Window.partitionBy(*keys)
    ranked_dev = devs.select(
        *keys,
        "_med_x2",
        "_dev_x2",
        F.row_number().over(wd.orderBy("_dev_x2")).alias("_rk"),
        F.count(F.lit(1)).over(wd).alias("_n"),
    )
    return ranked_dev.groupBy(*keys).agg(
        (F.min("_med_x2") * 50).alias("median_x1e4"),
        (_interp_xden("_dev_x2", 1, 2) * 25).alias("mad_x1e4"),
    )


def crosstab_pivot(
    df: DataFrame,
    row_key: str,
    col_key: str,
    col_values: Sequence[str],
    value: str,
) -> DataFrame:
    """Cross-tabulation via Catalyst's native pivot: one wide row per
    ``row_key`` with a summed ``value`` column per ``col_key`` value.

    ``col_values`` is passed explicitly — at scale the implicit
    variant runs a full distinct-scan job just to learn the column
    list and silently caps at ``spark.sql.pivotMaxValues``; pinning
    the list keeps the plan a single partial-aggregated shuffle (the
    pivot compiles to one CASE-WHEN sum per column, map-side
    combined) and the output schema stable for downstream writers.
    Missing cells are 0, not null, so the frame is dense."""
    agg = df.groupBy(row_key).pivot(col_key, list(col_values)).sum(value)
    return agg.select(
        row_key,
        *[
            F.round(F.coalesce(F.col(v), F.lit(0.0)), 2).alias(f"{col_key}_{v}")
            for v in col_values
        ],
    )


def histogram(
    df: DataFrame, value: str, width: float = HISTOGRAM_WIDTH
) -> DataFrame:
    """Equi-width histogram of ``value``: (bin, n_rows, bin_min,
    bin_max) with bin = floor(value / width).  Pure map + one partial
    aggregation — the shuffle carries one row per (task, bin)."""
    bin_ = F.floor(F.col(value) / F.lit(float(width))).alias("bin")
    return df.groupBy(bin_).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min(value), 2).alias("bin_min"),
        F.round(F.max(value), 2).alias("bin_max"),
    )


def heavy_hitters(
    docs: DataFrame, k: int = HEAVY_HITTER_K
) -> DataFrame:
    """Exact corpus-wide top-``k`` most frequent word tokens:
    (token, n_occurrences), deterministically tie-broken (count
    desc, token asc).

    explode -> groupBy(token) benefits from map-side combine (the
    shuffle is the distinct-token count, not the occurrence count);
    the global top-k is orderBy+limit, which Spark executes as
    per-partition TakeOrdered + a k-row driver merge — no global
    sort and no single-partition window."""
    toks = F.explode(
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    ).alias("token")
    return (
        docs.select(toks)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def hll_distinct(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per key group:
    (keys..., approx_distinct).  Constant memory, mergeable across
    partitions — the 100 TB path for NDV; engine-internal hash, so
    not oracle-replayable (the catalog entry uses
    :func:`hll_distinct_det` instead — r4 verdict #6)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=HLL_RSD).alias("approx_distinct")
    )


# -- deterministic HLL (r4 verdict #6: give the sketch a HARD signal
# the way the CMS entry did): a FIXED portable hash family makes the
# register array — and therefore the estimate — identical on any
# engine, so the DuckDB oracle replays the fold exactly and the
# rows-only exemption is retired.
HLL_DET_M = 512  # registers (2^9): rsd ~ 1.04/sqrt(512) ~ 4.6%
_HLL_P = 2147483647  # 2^31 - 1 (same modulus class as MINHASH)
# mix: affine -> square -> affine mod P.  A single affine map is
# linear (sequential ids would give arithmetic-progression hashes and
# a degenerate leading-zero profile); the middle squaring term breaks
# linearity while every intermediate stays < 2^63.
_HLL_A1, _HLL_B1 = 1103515245, 12345
_HLL_A2, _HLL_B2 = 69069, 362437
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_DET_M)
# linear-counting LUT: lc[v] = round(m * ln(m / v)) for v zero
# registers — precomputed Python-side so no engine ever evaluates a
# transcendental (ln is not correctly rounded; same discipline as the
# m1 deterministic exp)
_HLL_LC = [
    round(HLL_DET_M * math.log(HLL_DET_M / v))
    for v in range(1, HLL_DET_M + 1)
]


def _hll_register_exprs(table_or_df: str, keys: Sequence[str], col: str) -> dict:
    """Dialect-neutral SQL fragments (identical text runs on Spark
    and DuckDB) for the per-row register computation."""
    h1 = f"(({col} % {_HLL_P}) * {_HLL_A1} + {_HLL_B1}) % {_HLL_P}"
    h2 = f"(({h1}) * ({h1})) % {_HLL_P}"
    h3 = f"(({h2}) * {_HLL_A2} + {_HLL_B2}) % {_HLL_P}"
    j = f"({h3}) % {HLL_DET_M}"
    # exact (h3 - j)/m: the quotient is an integer < 2^53, so the
    # double division is exact and portable (no dialect-split // vs div)
    w = f"CAST((({h3}) - (({h3}) % {HLL_DET_M})) / {HLL_DET_M} AS BIGINT)"
    ladder = (
        "CASE "
        + " ".join(
            f"WHEN ({w}) >= {2 ** (21 - i)} THEN {i + 1}" for i in range(22)
        )
        + " ELSE 23 END"
    )
    return {"j": j, "rank": ladder}


def hll_distinct_det(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """Deterministic HLL distinct count per key group — identical
    estimate on any engine (fixed hash family, exact register fold,
    transcendental-free estimator):

    * register index/rank are pure integer expressions (scan-stage
      map — at 100 TB each executor folds its partition into m
      registers per key before the shuffle; the shuffle carries only
      (key, j, max_rank) partials);
    * the harmonic sum is EXACT: every term 2^-rank is a multiple of
      2^-23 and there are only m of them, so the double sum fits in
      32 bits of mantissa — order-independent by construction;
    * small range uses linear counting via a precomputed integer LUT
      (no ln() in either engine), raw HLL estimate otherwise; the
      HLL++ mid-range bias table is intentionally omitted (documented
      accuracy tradeoff, bounded by the error test)."""
    exprs = _hll_register_exprs("", keys, col)
    rows = df.where(F.col(col).isNotNull()).select(
        *keys,
        F.expr(exprs["j"]).alias("_j"),
        F.expr(exprs["rank"]).alias("_rank"),
    )
    regs = rows.groupBy(*keys, "_j").agg(F.max("_rank").alias("_m"))
    per_key = regs.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_reg"),
    )
    m = HLL_DET_M
    s = F.col("_s_present") + (F.lit(m) - F.col("_n_reg")).cast("double")
    raw = F.lit(_HLL_ALPHA * m * m) / s
    v = (F.lit(m) - F.col("_n_reg")).cast("int")
    lc = F.element_at(
        F.array(*[F.lit(int(x)) for x in _HLL_LC]), v
    )
    est = F.when(v > 0, lc.cast("long")).otherwise(
        F.floor(raw + F.lit(0.5)).cast("long")
    )
    return per_key.select(*keys, est.alias("approx_distinct"))


def hll_distinct_det_sql(table: str, keys: Sequence[str], col: str) -> str:
    """DuckDB oracle replaying :func:`hll_distinct_det` exactly."""
    exprs = _hll_register_exprs(table, keys, col)
    ks = ", ".join(keys)
    lut = ", ".join(str(int(x)) for x in _HLL_LC)
    m = HLL_DET_M
    return f"""
    WITH rows_ AS (
      SELECT {ks}, {exprs['j']} AS j, {exprs['rank']} AS rank
      FROM {table} WHERE {col} IS NOT NULL
    ),
    regs AS (
      SELECT {ks}, j, max(rank) AS mreg FROM rows_ GROUP BY ALL
    ),
    agg AS (
      SELECT {ks},
             sum(power(2.0, -mreg)) AS s_present,
             CAST(count(*) AS BIGINT) AS n_reg
      FROM regs GROUP BY ALL
    )
    SELECT {ks},
           CASE WHEN {m} - n_reg > 0
                THEN CAST([{lut}][CAST({m} - n_reg AS INTEGER)] AS BIGINT)
                ELSE CAST(floor({_HLL_ALPHA * m * m} /
                       (s_present + CAST({m} - n_reg AS DOUBLE)) + 0.5)
                     AS BIGINT)
           END AS approx_distinct
    FROM agg
    """


PROFILE_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")
PROFILE_STR_COLS = ("o_orderstatus", "o_orderpriority")


def profile(
    df: DataFrame,
    num_cols: Sequence[str] = PROFILE_NUM_COLS,
    str_cols: Sequence[str] = PROFILE_STR_COLS,
) -> DataFrame:
    """Column-level data-quality profile, long form: one row per
    column with (col_name, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str).

    One scan: all per-column aggregates run in a single groupBy-less
    agg (exact distincts expand the input |cols|x — swap in
    ``approx_count_distinct`` / :func:`hll_distinct` at corpus scale),
    then the 1-row result is unpivoted driver-free with ``stack``.
    """
    aggs = []
    for c in (*num_cols, *str_cols):
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 4).alias(f"mn_{c}"),
            F.round(F.max(c).cast("double"), 4).alias(f"mx_{c}"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    one = df.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        rows.append(
            f"'{c}', nn_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), mn_{c}, mx_{c}"
        )
    n = len(rows)
    return one.select(
        F.expr(
            f"stack({n}, {', '.join(rows)}) AS "
            "(col_name, n_nonnull, n_distinct, min_num, max_num, "
            "min_str, max_str)"
        )
    )


APPROX_PERCENTILES = (0.5, 0.9, 0.99)
APPROX_PCT_ACCURACY = 10_000


def approx_group_percentiles(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ps: Sequence[float] = APPROX_PERCENTILES,
) -> DataFrame:
    """Sketch-based percentiles (``approx_percentile``, Greenwald-
    Khanna variant): mergeable bounded-memory summaries with
    map-side partial aggregation — the single-pass 100 TB companion
    to the exact rank-based :func:`group_percentiles` (whose sort
    shuffle it avoids).  Rows-only in the oracle catalog (sketch
    internals are engine-specific); the test suite bounds its error
    against the exact plan.

    Output is LONG FORM — one primitive-typed row per (group, p):
    the driver's rows-compare canonicalizer sorts columns with
    pandas, which cannot factorize array values (the one red r5
    driver row, VERDICT r5 #1), so the percentile array is
    posexploded before leaving the kernel.  ``posexplode_outer``: a
    group whose sketch is NULL (every measurement NULL) still emits
    one (group, NULL, NULL) row instead of vanishing (ADVICE r6)."""
    pvals = F.array(*[F.lit(float(p)) for p in ps])
    return (
        df.groupBy(*keys)
        .agg(
            F.percentile_approx(
                value, list(ps), APPROX_PCT_ACCURACY
            ).alias("_pcts")
        )
        .select(
            *keys,
            F.posexplode_outer("_pcts").alias("_i", "approx_value"),
        )
        .select(
            *keys,
            F.element_at(pvals, F.col("_i") + 1).alias("p"),
            "approx_value",
        )
    )


# Deterministic quantile sketch (the catalog's hard-oracle path):
# fixed-width integer histogram over exact cents.  $100-wide bins
# (even → exact integer midpoint); value error is <= W/2 = $50 vs
# the ceil-rank order statistic, by construction — the bound is
# ATTAINED (not strict) when that order statistic falls on a
# bucket's lower edge, i.e. an exact $100 multiple (ADVICE r7).
HIST_SKETCH_WIDTH_CENTS = 10_000
HIST_SKETCH_P_PERMILLE = (250, 500, 750, 900, 990)


def histogram_percentiles_cents(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ps_permille: Sequence[int] = HIST_SKETCH_P_PERMILLE,
    width_cents: int = HIST_SKETCH_WIDTH_CENTS,
) -> DataFrame:
    """DETERMINISTIC approximate percentiles per key group: a
    fixed-width integer histogram sketch over exact cents — the
    hard-oracle companion to :func:`approx_group_percentiles`'s
    engine-specific GK sketch (VERDICT r6 #4, the ``ag_hll_distinct``
    graduation recipe: make the sketch itself portable arithmetic so
    DuckDB can replay it bit-exactly).

    Sketch = per-(group, bucket) row counts, ``bucket =
    floor(cents / W)`` — trivially MERGEABLE (counts add) and
    map-side partially aggregated, so the shuffle carries at most
    one row per (task, group, bucket): the single-pass 100 TB path.
    The estimate for permille ``p`` is the midpoint of the first
    bucket whose cumulative count reaches ``ceil(p*n/1000)``; value
    error is <= W/2 vs that exact order statistic (error-bound-tested
    in tests/test_aggstats.py against the exact rank plan).

    ALL-INTEGER cross-engine arithmetic (ORACLE_DISCIPLINE rule 6):
    floor-division via pmod (no float quotient), the rank test is the
    division-free ``cum*1000 >= p*n`` (⇔ ``cum >= ceil(p*n/1000)``
    for integers), and the output is primitive BIGINT cents.  The
    cumulative window partitions by the group key over the BUCKET
    domain (≤ value-range/W rows per group), never row-level."""
    W = int(width_cents)
    vc = (F.col(value).cast("decimal(18,2)") * 100).cast("long")
    c = df.where(F.col(value).isNotNull()).select(*keys, vc.alias("_vc"))
    bucket = F.expr(f"(_vc - pmod(_vc, {W})) div {W}")
    binned = (
        c.select(*keys, bucket.alias("_b"))
        .groupBy(*keys, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    wk = Window.partitionBy(*keys)
    cum = binned.select(
        *keys,
        "_b",
        F.sum("_cnt")
        .over(wk.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cum"),
        F.sum("_cnt").over(wk).alias("n_rows"),
    )
    per_p = cum.withColumn(
        "p_permille",
        F.explode(F.array(*[F.lit(int(p)) for p in ps_permille])),
    )
    hit = per_p.filter(
        F.col("_cum") * 1000 >= F.col("p_permille") * F.col("n_rows")
    )
    return (
        hit.groupBy(*keys, "p_permille", "n_rows")
        .agg(F.min("_b").alias("_bmin"))
        .select(
            *keys,
            "p_permille",
            "n_rows",
            (F.col("_bmin") * W + W // 2).alias("approx_cents"),
        )
    )


def histogram_percentiles_cents_sql(
    table: str,
    value: str,
    keys: Sequence[str],
    ps_permille: Sequence[int] = HIST_SKETCH_P_PERMILLE,
    width_cents: int = HIST_SKETCH_WIDTH_CENTS,
) -> str:
    """DuckDB oracle replaying :func:`histogram_percentiles_cents`
    exactly (same integer arithmetic; windowed sums cast from
    HUGEINT per ORACLE_DISCIPLINE rule 13)."""
    W = int(width_cents)
    ks = ", ".join(keys)
    pvals = ", ".join(f"({int(p)})" for p in ps_permille)
    return f"""
    WITH c AS (
      SELECT {ks},
             CAST(CAST({value} AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM {table} WHERE {value} IS NOT NULL
    ),
    b AS (
      SELECT {ks},
             CAST((vc - ((vc % {W}) + {W}) % {W}) // {W} AS BIGINT) AS bkt,
             count(*) AS cnt
      FROM c GROUP BY ALL
    ),
    cum AS (
      SELECT {ks}, bkt,
             CAST(sum(cnt) OVER (PARTITION BY {ks} ORDER BY bkt
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY {ks}) AS BIGINT) AS n_rows
      FROM b
    ),
    hit AS (
      SELECT {ks}, p.p_permille, cum.bkt, cum.n_rows
      FROM cum CROSS JOIN (VALUES {pvals}) AS p(p_permille)
      WHERE cum * 1000 >= p.p_permille * n_rows
    )
    SELECT {ks}, p_permille, n_rows,
           min(bkt) * {W} + {W // 2} AS approx_cents
    FROM hit GROUP BY ALL
    """


TRIM_FRAC = 0.05


def trimmed_mean(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    frac: float = TRIM_FRAC,
) -> DataFrame:
    """Robust (trimmed) mean per key group: drop the lowest and
    highest ``floor(n * frac)`` rows by value, average the rest —
    the outlier-resistant center curation dashboards report.
    Same O(1)-memory rank plan as :func:`group_percentiles`: one sort
    shuffle, integer trim bounds (no interpolation), one final
    partial-agg'd mean."""
    ranked = df.select(
        *keys,
        F.col(value).cast("double").alias("_v"),
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(value)
        ).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("_n"),
    )
    k = F.floor(F.col("_n") * F.lit(float(frac)))
    return (
        ranked.filter((F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            # DECIMAL-exact sum (rule 1) then ONE division — the mean
            # double is bit-identical cross-engine; the catalog entry
            # portable-wraps it (builtin avg is an order-dependent
            # double fold, and builtin round(x,4) flips at ties)
            (
                F.sum(F.col("_v").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("trimmed_mean"),
        )
    )


CORR_ROUND_DP = 4


def grouped_corr(
    df: DataFrame, x: str, y: str, keys: Sequence[str]
) -> DataFrame:
    """Per-group Pearson correlation and sample covariance of two
    numeric columns: (keys..., n, covar, corr) — still one
    map-side-combined shuffle on the keys, constant memory per group.

    EXACT sufficient statistics, not the builtin covar_samp/corr
    (whose internal accumulation differs between engines): x as exact
    integers, y as exact cents; Sx/Sy/Sxy/Sxx as exact BIGINTs; Syy
    (which can pass 2^63) as a DECIMAL sum split into
    hi*2^20 + lo BIGINT halves so its double reconstruction is the
    IDENTICAL two-op expression on every engine (rule 5: int128/
    decimal -> double casts are not cross-engine portable above 2^53,
    exact small ints are).  covar/corr are then ONE shared double
    tree (bit-identical); zero-variance guards are exact
    (min==max).  The catalog entry portable-wraps the outputs."""
    xi = F.col(x).cast("decimal(18,2)").cast("long")
    yi = (F.col(y).cast("decimal(18,2)") * 100).cast("long")
    rows = df.where(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        *keys, xi.alias("_x"), yi.alias("_y")
    )
    agg = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum((F.col("_y") * F.col("_y")).cast("decimal(38,0)")).alias(
            "_syy"
        ),
        F.min("_x").alias("_xmin"),
        F.max("_x").alias("_xmax"),
        F.min("_y").alias("_ymin"),
        F.max("_y").alias("_ymax"),
    )
    syy_hi = (
        (F.col("_syy") - F.col("_syy") % 1048576) / 1048576
    ).cast("long")
    syy_lo = (F.col("_syy") % 1048576).cast("long")
    syy_d = syy_hi.cast("double") * F.lit(1048576.0) + syy_lo.cast("double")
    nd = F.col("n").cast("double")
    sxd, syd = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxyd, sxxd = F.col("_sxy").cast("double"), F.col("_sxx").cast("double")
    covar = F.when(
        F.col("n") >= 2,
        ((sxyd - sxd * syd / nd) / (nd - F.lit(1.0))) / F.lit(100.0),
    )
    corr = F.when(
        (F.col("n") >= 2)
        & (F.col("_xmin") < F.col("_xmax"))
        & (F.col("_ymin") < F.col("_ymax")),
        (nd * sxyd - sxd * syd)
        / F.sqrt(
            (nd * sxxd - sxd * sxd) * (nd * syy_d - syd * syd)
        ),
    )
    return agg.select(
        *keys, "n", covar.alias("covar"), corr.alias("corr")
    )


QUANTILE_BINS = 4
WEIGHTED_PS_TENTHS = (5, 9)


def quantile_bins(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    tiebreak: str,
    n_bins: int = QUANTILE_BINS,
) -> DataFrame:
    """Equal-frequency discretization: per key group, ``n_bins``
    ntile buckets of ``value`` with count and value range — the
    feature-binning / monotone-calibration primitive.  One keyed
    sort window (ordered by value + ``tiebreak`` so ties land
    deterministically), one partial-agg'd rollup."""
    w = Window.partitionBy(*keys).orderBy(value, tiebreak)
    return (
        df.withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy(*keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min(value), 2).alias("bin_lo"),
            F.round(F.max(value), 2).alias("bin_hi"),
        )
    )


def weighted_quantiles(
    df: DataFrame,
    value: str,
    weight: str,
    keys: Sequence[str],
    ps_tenths: Sequence[int] = WEIGHTED_PS_TENTHS,
) -> DataFrame:
    """Exact weighted quantiles (lower rule: smallest v with
    cumweight(v) >= p * totalweight) per key group, for integer
    weights — token-budget-aware corpus statistics ("the document
    length below which half the TOKENS sit", not half the docs).

    The cumulative weight uses the default RANGE frame, so all rows
    tied on ``value`` share one cumulative total (no arbitrary
    intra-tie ordering); the p*W comparison is kept in integers
    (cumw * 10 >= p10 * W) — nothing floating anywhere, so
    cross-engine parity is exact, and the windows + final min all
    share the one keyed sort."""
    kw = Window.partitionBy(*keys)
    cum = F.sum(F.col(weight).cast("long")).over(kw.orderBy(value))
    tot = F.sum(F.col(weight).cast("long")).over(kw)
    ranked = df.select(
        *keys, F.col(value).alias("_v"), cum.alias("_cw"), tot.alias("_tw")
    )
    exploded = ranked.withColumn(
        "p10", F.explode(F.array(*[F.lit(int(p)) for p in ps_tenths]))
    )
    return (
        exploded.filter(F.col("_cw") * 10 >= F.col("p10") * F.col("_tw"))
        .groupBy(*keys, "p10")
        # exact cents, not round(min,2): min() never does arithmetic,
        # and the DECIMAL(18,2) cast of a 2-dp-exact double is exact on
        # both engines — the output is hash-exact BIGINT by
        # construction (ORACLE_DISCIPLINE rules 1/4)
        .agg(
            (F.min("_v").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("wq_cents")
        )
    )


IQR_FENCE = 1.5


def iqr_outliers(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    fence: float = IQR_FENCE,
) -> DataFrame:
    """Tukey-fence outlier summary per key group: quartiles from the
    rank-based exact plan, fences at q1/q3 -/+ ``fence``*IQR, and the
    count of rows outside them — the robust anomaly gate run before
    training-data aggregation.  The quartile subplan shares one keyed
    sort; the fence check is a broadcast join back onto the rows.

    EXACT INTEGER arithmetic end-to-end (r4 verdict #2 — the old
    double fence flipped a half-up boundary digit under the fuzzer):
    values are exact cents, the linearly-interpolated quartile has
    denominator 4 and the 1.5 factor denominator 2, so the fence is
    an exact denominator-8 rational of cents.  Outputs ship as
    ``*_x800`` BIGINTs (dollars*800 == cents*8); the outlier test is
    ``8*cents < lo_x800``.  NULL measurements are excluded from the
    rank plan and the counts (rule 15)."""
    m = round(fence * 2)
    if m != fence * 2:
        raise ValueError("fence must be a multiple of 0.5")
    vc = (F.col(value).cast("decimal(18,2)") * 100).cast("long")
    c = df.where(F.col(value).isNotNull()).select(
        *keys, vc.alias("_vc")
    )
    w = Window.partitionBy(*keys)
    r = c.select(
        *keys,
        "_vc",
        F.row_number().over(w.orderBy("_vc")).alias("_rk"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )

    def q_x4(posnum: int):
        # zero-based interpolation position (n-1)*posnum/4: quarter-
        # cent quartile = (4-rem)*v[i] + rem*v[i+1], all BIGINT
        pos = (F.col("_n") - 1) * posnum
        i = F.floor(pos / F.lit(4)) + 1  # 1-based lower rank
        rem = pos % 4
        return F.sum(
            F.when(F.col("_rk") == i, (4 - rem) * F.col("_vc"))
            .when(F.col("_rk") == i + 1, rem * F.col("_vc"))
            .otherwise(F.lit(0))
        )

    qs = r.groupBy(*keys).agg(q_x4(1).alias("_q1x4"), q_x4(3).alias("_q3x4"))
    iqr_x4 = F.col("_q3x4") - F.col("_q1x4")
    fences = qs.select(
        *keys,
        (2 * F.col("_q1x4") - m * iqr_x4).alias("_lo8"),
        (2 * F.col("_q3x4") + m * iqr_x4).alias("_hi8"),
    )
    joined = c.join(F.broadcast(fences), list(keys))
    v8 = 8 * F.col("_vc")
    return joined.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            ((v8 < F.col("_lo8")) | (v8 > F.col("_hi8"))).cast("long")
        ).alias("n_outliers"),
        F.min("_lo8").alias("lo_fence_x800"),
        F.max("_hi8").alias("hi_fence_x800"),
    )


CMS_D = 4  # sketch depth (hash rows) — first 4 MINHASH_COEFFS pairs
CMS_W = 1024  # sketch width (buckets per row)


def cms_sketch(tokens: DataFrame) -> DataFrame:
    """Count-min sketch of a token stream: (row, bucket, cnt) — the
    mergeable fixed-size (D x W integers) frequency summary.  Input
    is (token, tid) occurrences with integer-hash tids; every update
    is a pure map, the sketch itself is one partial-agg'd groupBy —
    at 100 TB each executor folds its partition into D*W counters
    and the shuffle carries only those.

    Unlike HLL/GK, CMS under a FIXED hash family is fully
    deterministic, so the catalog query checks it against a DuckDB
    replay exactly — estimate >= truth always (one-sided error)."""
    from . import constants as C

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        ((F.col("tid") * a + b) % C.SHINGLE_P) % CMS_W
                    ).alias("bucket"),
                )
                for i, (a, b) in enumerate(C.MINHASH_COEFFS[:CMS_D])
            ]
        )
    ).alias("rb")
    return (
        tokens.select(rows)
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitter_estimates(docs: DataFrame, k: int = HEAVY_HITTER_K) -> DataFrame:
    """Exact top-``k`` tokens with their count-min estimates:
    (token, n_exact, cms_est), cms_est = min over the D probed
    buckets — demonstrating the sketch's one-sided error against the
    exact path on the same corpus.  The probe is a D-row explode of
    the k tokens joined against the (row, bucket)-keyed sketch."""
    from . import constants as C
    from .dedup import char_hash_tid

    occ = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("token")
    ).withColumn("tid", char_hash_tid(F.col("token")))
    sketch = cms_sketch(occ)
    exact = (
        occ.groupBy("token", "tid")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("token"))
        .limit(k)
    )
    probes = exact.select(
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            ((F.col("tid") * a + b) % C.SHINGLE_P) % CMS_W
                        ).alias("bucket"),
                    )
                    for i, (a, b) in enumerate(C.MINHASH_COEFFS[:CMS_D])
                ]
            )
        ).alias("rb"),
    ).select("token", "n_exact", "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
    )


WINSOR_PS = (0.1, 0.9)


def winsorized_mean(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    ps: Sequence[float] = WINSOR_PS,
) -> DataFrame:
    """Winsorized mean per key group: values capped at the exact
    p10/p90 (rank-based plan, rounded before capping so both engines
    cap identically), then averaged — the robust mean that keeps
    outlier rows (unlike the trimmed mean, which drops them)."""
    lo_p, hi_p = ps
    # EXACT INTEGER caps (rule 16): the p10/p90 interpolation has
    # denominator 10, so caps live in cents*10 units as BIGINTs;
    # clamping and summing stay integral, and the mean is ONE shared
    # double division (portable-wrapped by the catalog entry).
    num_lo, num_hi = round(lo_p * 10), round(hi_p * 10)
    r = _ranked_cents(df, value, keys)
    caps = r.groupBy(*keys).agg(
        _interp_xden("_vi", num_lo, 10).alias("_lo10"),
        _interp_xden("_vi", num_hi, 10).alias("_hi10"),
    )
    capped10 = F.least(
        F.greatest(10 * F.col("_vi"), F.col("_lo10")), F.col("_hi10")
    )
    return (
        r.join(F.broadcast(caps), list(keys))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(capped10).cast("double")
                / (F.count(F.lit(1)) * F.lit(1000.0))
            ).alias("winsorized_mean"),
            (F.min("_lo10") * 10).alias("cap_lo_x1e4"),
            (F.max("_hi10") * 10).alias("cap_hi_x1e4"),
        )
    )


BOOT_B = 16  # deterministic double-or-nothing resamples
BOOT_A, BOOT_C, BOOT_D = 2971, 1583, 101  # affine hash (MINHASH-style)
BOOT_P = 1_000_003  # odd prime: residue parity is a mixed bit (a
# direct mod-2 of the all-odd affine form would degenerate to
# parity(event_id + r) — two distinct resamples instead of B)
BOOT_Z = 1.96  # normal CI multiplier


def bootstrap_ci(events: DataFrame, b: int = BOOT_B) -> DataFrame:
    """Deterministic bootstrap confidence interval for mean(value)
    per event type: ``b`` double-or-nothing resamples (row i gets
    weight 0 or 2 in resample r from the parity of an affine integer
    hash of (event_id, r) — the Bernoulli weight bootstrap, weight
    variance 1 like Poisson(1) bootstrap, but replayable with no RNG
    state).

    Output: (event_type, n, mean_x1e4, boot_se_x1e4, ci_lo_x1e4,
    ci_hi_x1e4) — all exact scaled ints; value sums fold as DECIMAL
    so partition order cannot perturb them.

    Scale shape: one bounded x``b`` explode, then two map-side-
    combinable aggregations ((type, r) then type). Resample means
    never materialize per-row state; the driver sees nothing.
    """
    w = (
        ((F.col("event_id") * BOOT_A + F.col("r") * BOOT_C + BOOT_D) % BOOT_P)
        % 2
    ) * 2  # 0 or 2
    dec = F.col("value").cast("decimal(18,2)")
    res = (
        events.select(
            "event_type",
            "event_id",
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("r"),
        )
        .groupBy("event_type", "r")
        .agg(
            F.sum(dec * w).alias("swx"),
            F.sum(w).alias("sw"),
        )
        .select(
            "event_type",
            # try_divide: a replicate can draw all-zero multiplier
            # weights (sw == 0) — NULL, matching DuckDB's x/0
            # (rule 15; fuzzer-found ANSI crash)
            F.try_divide(
                F.col("swx").cast("double"), F.col("sw").cast("double")
            ).alias("m"),
        )
    )
    boot = res.groupBy("event_type").agg(
        F.sum("m").alias("sm"), F.sum(F.col("m") * F.col("m")).alias("sm2")
    )
    base = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mean"),
    )
    bf = float(b)
    se = F.sqrt(
        (F.col("sm2") - F.col("sm") * F.col("sm") / F.lit(bf))
        / F.lit(bf - 1.0)
    )
    out = base.join(boot, "event_type").select(
        "event_type",
        "n",
        F.round(F.col("mean") * 10_000).cast("long").alias("mean_x1e4"),
        F.round(se * 10_000).cast("long").alias("boot_se_x1e4"),
        F.round((F.col("mean") - F.lit(BOOT_Z) * se) * 10_000)
        .cast("long")
        .alias("ci_lo_x1e4"),
        F.round((F.col("mean") + F.lit(BOOT_Z) * se) * 10_000)
        .cast("long")
        .alias("ci_hi_x1e4"),
    )
    return out
