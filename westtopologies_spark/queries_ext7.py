"""Seventh catalog-extension batch (round 3, fourth continuation):
time-series and distribution diagnostics plus a training-shard
manifest — the ACF correlogram (multi-lag autocorrelation), per-type
peak-hour detection, decile Q-Q drift points between two value
distributions, and a deterministic hash-sharded WebDataset-style
manifest.

Same oracle discipline as the earlier batches: exact integer
sufficient statistics, the catalog's standard scaled-BIGINT wrap for
the one computed score (composed identically on both engines), and
raw-value passthroughs for quantile points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import _register, _t
from .scale import constants as C

# ---------------------------------------------------------------------------
# ACF correlogram: autocorrelation of the hourly count series at
# lags 1..ACF_MAX_LAG (ts_autocorr generalized from lag 1)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 6


@_register(
    "ts_acf_lags",
    f"""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS n
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
      SELECT l.lag, a.n AS x, b.n AS y
      FROM hourly a CROSS JOIN lags l
      JOIN hourly b ON b.h = a.h + l.lag
    ),
    s AS (
      SELECT lag, count(*) AS np,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(np AS BIGINT) AS n_pairs,
           CAST(round(
             (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000) AS BIGINT) AS corr_x1e6
    FROM s
    """,
    doc="ACF correlogram: autocorrelation of the hourly event-count "
    "series at lags 1..6 — the seasonality/memory diagnostic behind "
    "window sizing and anomaly baselines (ts_autocorr generalized "
    "past lag 1). Lagged pairs come from ONE expression-keyed "
    "equi-join of the pre-aggregated hourly table against itself "
    "cross the 6-row lag frame — never raw events; all per-lag "
    "sufficient statistics fold as exact BIGINT and the Pearson r "
    "ships with the catalog's standard scaled-BIGINT wrap. "
    "Temporal extension.",
)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = hourly.select(F.col("h").alias("ha"), F.col("n").alias("x"))
    b = hourly.select(F.col("h").alias("hb"), F.col("n").alias("y"))
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("hb") == F.col("ha") + F.col("lag")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    npd = F.col("np").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    r = (npd * sxyd - sxd * syd) / F.sqrt(
        (npd * sxxd - sxd * sxd) * (npd * syyd - syd * syd)
    )
    return s.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("np").cast("bigint").alias("n_pairs"),
        F.round(r * 1_000_000).cast("bigint").alias("corr_x1e6"),
    )


# ---------------------------------------------------------------------------
# peak-hour detection: strict local maxima of each type's hourly series
# ---------------------------------------------------------------------------


@_register(
    "ts_peak_hours",
    """
    WITH hourly AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, h, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY h) AS prev_n,
             lead(n) OVER (PARTITION BY event_type ORDER BY h) AS next_n
      FROM hourly
    )
    SELECT event_type, h, n, prev_n, next_n
    FROM w
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n > next_n
    """,
    doc="Peak-hour detection: strict local maxima of each event "
    "type's hourly count series (n above BOTH ordered neighbors; "
    "series endpoints excluded — a one-sided comparison is not a "
    "peak). The burst-triage primitive downstream of ts_anomaly's "
    "z-scores. One keyed shuffle: hourly rollup, then lag/lead over "
    "the same (type, hour) key; all-integer output. Temporal "
    "extension.",
)
def ts_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    d = hourly.select(
        "event_type",
        "h",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return d.filter(
        F.col("prev_n").isNotNull()
        & F.col("next_n").isNotNull()
        & (F.col("n") > F.col("prev_n"))
        & (F.col("n") > F.col("next_n"))
    )


# ---------------------------------------------------------------------------
# Q-Q drift points: decile quantiles of one value distribution
# against another (exact lower-rule ranks, raw-value passthrough)
# ---------------------------------------------------------------------------

QQ_TYPE_A = "click"
QQ_TYPE_B = "purchase"


def _qq_side_sql(etype: str, alias: str) -> str:
    return f"""
    {alias}_r AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS rn,
             count(*) OVER () AS cnt
      FROM events WHERE event_type = '{etype}'
    ),
    {alias}_q AS (
      SELECT p10, min(value) AS q FROM {alias}_r
      CROSS JOIN (SELECT unnest(range(1, 10)) AS p10)
      WHERE rn * 10 >= p10 * cnt
      GROUP BY 1
    )"""


@_register(
    "ag_qq_points",
    f"""
    WITH {_qq_side_sql(QQ_TYPE_A, "a")},
    {_qq_side_sql(QQ_TYPE_B, "b")}
    SELECT a.p10 AS p10, a.q AS q_{QQ_TYPE_A}, b.q AS q_{QQ_TYPE_B}
    FROM a_q a JOIN b_q b ON a.p10 = b.p10
    """,
    doc="Q-Q drift points: the 9 decile quantiles of the click value "
    "distribution against the purchase distribution — the "
    "distribution-shift diagnostic that localizes WHERE ag_ks_test's "
    "scalar distance comes from. Quantiles are exact lower-rule "
    "ranks over a (value, event_id) total order (the ag_percentiles "
    "rank plan), and every output value is a raw stored double — no "
    "arithmetic, hash-exact by passthrough precedent. Two keyed "
    "rank windows + one 9-row join. Aggregate-statistics extension.",
)
def ag_qq_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def side(etype: str) -> DataFrame:
        w = Window.orderBy("value", "event_id")
        r = (
            ev.filter(F.col("event_type") == etype)
            .select("value", "event_id")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy()))
        )
        ps = spark.range(1, 10).select(F.col("id").cast("int").alias("p10"))
        return (
            r.crossJoin(F.broadcast(ps))
            .filter(F.col("rn") * 10 >= F.col("p10") * F.col("cnt"))
            .groupBy("p10")
            .agg(F.min("value").alias("q"))
        )

    a = side(QQ_TYPE_A).select("p10", F.col("q").alias(f"q_{QQ_TYPE_A}"))
    b = side(QQ_TYPE_B).select(
        F.col("p10").alias("_p"), F.col("q").alias(f"q_{QQ_TYPE_B}")
    )
    return a.join(b, a.p10 == b._p).select(
        "p10", f"q_{QQ_TYPE_A}", f"q_{QQ_TYPE_B}"
    )


# ---------------------------------------------------------------------------
# training shard manifest: deterministic hash sharding + per-shard stats
# ---------------------------------------------------------------------------

SHARD_N = 16


@_register(
    "tp_shard_manifest",
    f"""
    WITH hashed AS (
      SELECT doc_id, source, n_chars,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
                              i -> ord(CAST(doc_id AS VARCHAR)[i]))),
               (a, c) -> (a * {C.FP_MULT} + c) % {C.SHINGLE_P})
               % {SHARD_N} AS shard
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM hashed GROUP BY 1
    """,
    doc="Training shard manifest: assign every document to one of 16 "
    "shards by the catalog's engine-identical polynomial char hash "
    "over the doc_id string (the minhash token-id recipe — NOT "
    "doc_id % N, so id-ordered ingest cannot stripe correlated "
    "content into one shard), then emit the per-shard manifest "
    "(doc/byte counts, source diversity, id range) a WebDataset-"
    "style writer publishes next to the shards. Pure map + one "
    "16-group rollup; all-integer output. Train-prep extension.",
)
def tp_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sid = 'CAST(doc_id AS STRING)'
    shard = F.expr(
        f"aggregate(transform(sequence(1, length({sid})), "
        f"i -> ascii(substring({sid}, i, 1))), 0L, "
        f"(a, c) -> (a * {C.FP_MULT} + c) % {C.SHINGLE_P}) % {SHARD_N}"
    )
    return (
        docs.select(
            shard.cast("bigint").alias("shard"),
            "doc_id",
            "source",
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )
