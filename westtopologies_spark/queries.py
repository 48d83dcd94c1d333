"""Query catalog: one entry per implemented operator (SURVEY.md §2).

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) ->
DataFrame`` with the equivalent ANSI SQL that DuckDB runs on the same
parquet tables — the driver's correctness gate. Column names are
aliased identically on both sides (the compare sorts columns by name
and hashes values). Floating-point aggregates are rounded on both
sides so summation-order differences cannot flip the hash.

The demonstration data is the driver's TPC-H-ish tables plus
``events`` (stands in for the tweet stream), ``documents`` and
``embeddings`` (TESTDATA.md).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ops import relational as R


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .session import load_table

    return load_table(spark, sf_dir, name)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_CATALOG: list[QuerySpec] = []


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _CATALOG.append(QuerySpec(name, fn, oracle, doc))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: windowed interaction rollup (W1 aligned + A1/A7 counts)
# ---------------------------------------------------------------------------


@_register(
    "w1_window_rollup",
    """
    SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS TIMESTAMP)
             AS window_start,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="W1 (epoch-aligned mode) + A7: 10-minute tumbling window rollup. "
    "Reference window: DiscussionTreeBolt.java:45-51,150-168.",
)
def w1_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# S3/P1/P3: JSON parse + delete-filter + nested extraction
# ---------------------------------------------------------------------------


@_register(
    "s3_json_parse_filter",
    """
    SELECT event_id,
           CAST(json_extract_string(props, 'k') AS INTEGER) AS k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, 'k') AS INTEGER) >= 50
      AND value IS NOT NULL
    """,
    doc="S3 from_json + P1 null-filter + P3 nested extraction. "
    "Reference: JacksonScheme.java:30-38; DiscussionTreeBolt.java:97-99,112-126.",
)
def s3_json_parse_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("msg", F.from_json("props", "k INT"))
    return (
        R.filter_deletes(parsed, "value")
        .withColumn("k", F.col("msg.k"))
        .filter(F.col("k") >= 50)
        .select("event_id", "k", "event_type")
    )


# ---------------------------------------------------------------------------
# P4: fixed-format timestamp parse (Twitter created_at round-trip)
# ---------------------------------------------------------------------------


@_register(
    "p4_timestamp_parse",
    """
    SELECT event_id,
           strftime(ts, '%a %b %d %H:%M:%S +0000 %Y') AS created_at,
           strptime(strftime(ts, '%a %b %d %H:%M:%S +0000 %Y'),
                    '%a %b %d %H:%M:%S %z %Y') AS parsed_ts
    FROM events
    WHERE event_id % 97 = 0
    """,
    doc="P4 created_at string -> timestamp, fixed format, US locale. "
    "Reference: DiscussionTreeBolt.java:103-105.",
)
def p4_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    fmt = "EEE MMM dd HH:mm:ss Z yyyy"  # format side supports EEE
    formatted = F.date_format(F.date_trunc("second", "ts"), fmt)
    return ev.select(
        "event_id",
        formatted.alias("created_at"),
        R.parse_twitter_ts(formatted).alias("parsed_ts"),
    )


# ---------------------------------------------------------------------------
# P5: derived flag + ancestor coalesce
# ---------------------------------------------------------------------------


@_register(
    "p5_derived_flag",
    """
    SELECT event_id,
           (event_type = 'purchase') AS is_purchase,
           coalesce(nullif(CAST(json_extract_string(props, 'k') AS BIGINT), 0),
                    event_id) AS ancestor_id
    FROM events
    WHERE event_id % 7 = 0
    """,
    doc="P5 retweet flag + ancestor-id coalesce. "
    "Reference: DiscussionTreeBolt.java:116-126.",
)
def p5_derived_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    k = F.from_json("props", "k LONG").getField("k")
    return ev.select(
        "event_id",
        (F.col("event_type") == "purchase").alias("is_purchase"),
        F.coalesce(F.nullif(k, F.lit(0)), F.col("event_id")).alias("ancestor_id"),
    )


# ---------------------------------------------------------------------------
# P11/P12: username cleanup + string->long cast
# ---------------------------------------------------------------------------


@_register(
    "p11_username_cleanup",
    """
    SELECT c_custkey,
           regexp_replace(c_name, '\\s', '', 'g') AS clean_name,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS custkey_roundtrip
    FROM customer
    """,
    doc="P11 whitespace strip (StormCommunityFactory#cleanUserName) + "
    "P12 numeric-string -> long cast.",
)
def p11_username_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        R.clean_username(F.col("c_name")).alias("clean_name"),
        F.col("c_custkey").cast("string").cast("long").alias("custkey_roundtrip"),
    )


# ---------------------------------------------------------------------------
# E1 + P14: tokenize-by-split explode + short-token filter
# ---------------------------------------------------------------------------


@_register(
    "e1_explode_tokens",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE length(token) > 1
    GROUP BY token
    HAVING count(*) > 20
    """,
    doc="E1 explode + P14 single-char token removal. "
    "Reference: InteractionGraphBolt.java:144-155; LocationTopicModelTrainer.java:193-207.",
)
def e1_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 1)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 20)
    )


# ---------------------------------------------------------------------------
# J1: dummy-parent derivation (left anti join)
# ---------------------------------------------------------------------------


@_register(
    "j1_dummy_parents",
    """
    WITH edges AS (
      SELECT event_id,
             event_id + CAST(json_extract_string(props, 'k') AS BIGINT) AS parent_id
      FROM events
    )
    SELECT DISTINCT e.parent_id AS tweet_id
    FROM edges e
    WHERE e.parent_id IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM events v WHERE v.event_id = e.parent_id)
    """,
    doc="J1 synthetic unobserved-ancestor rows via left anti join. "
    "Reference: DiscussionTreeBolt.java:135-143.",
)
def j1_dummy_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    edges = ev.select(
        F.col("event_id").alias("tweet_id"),
        (F.col("event_id") + k).alias("parent_id"),
    )
    observed = ev.select(F.col("event_id").alias("tweet_id"))
    return R.dummy_parents(edges.unionByName(observed.withColumn("parent_id", F.lit(None).cast("long"))))


# ---------------------------------------------------------------------------
# J2: broadcast dimension joins (the reference's hash-map lookups)
# ---------------------------------------------------------------------------


@_register(
    "j2_broadcast_dim_join",
    """
    SELECT n.n_name AS nation,
           r.r_name AS region,
           count(*) AS n_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    doc="J2/J3 broadcast equi-joins against small dims (the reference's "
    "in-memory lookup maps, LocationCrawlerBolt.java:116-129).",
)
def j2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J4: semi-join (dictionary membership)
# ---------------------------------------------------------------------------


@_register(
    "j4_semi_join",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    doc="J4 dictionary semi-join (keep only terms in wordmap). "
    "Reference: TweetIndexBolt.java:180-185.",
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# J2-first-match: row_number()=1 per key
# ---------------------------------------------------------------------------


@_register(
    "j2_first_match",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    """,
    doc="J2 'take first match' as deterministic row_number()=1. "
    "Reference: LocationCrawlerBolt.java:125-129.",
)
def j2_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    first = R.first_match(
        orders, ["o_custkey"], [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    )
    return first.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
    )


# ---------------------------------------------------------------------------
# A1/A2: grouped interaction list + distinct partner set
# ---------------------------------------------------------------------------


@_register(
    "a1_grouped_interactions",
    """
    SELECT user_id, event_type,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS interaction_ids,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="A1 per-(author,action) interaction list, deterministic order. "
    "Reference: InteractionGraphBolt.java:96-166.",
)
def a1_grouped_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ids = F.sort_array(F.collect_list("event_id"))
    return ev.groupBy("user_id", "event_type").agg(
        F.array_join(F.transform(ids, lambda x: x.cast("string")), ",").alias("interaction_ids"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "a2_distinct_partners",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS partner_set,
           count(DISTINCT event_type) AS n_distinct
    FROM events
    GROUP BY 1
    """,
    doc="A2 distinct-partner set per author (flat graph view). "
    "Reference: InteractionGraphBolt.java:179-196.",
)
def a2_distinct_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("partner_set"),
        F.countDistinct("event_type").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# A4: exact tercile boundaries
# ---------------------------------------------------------------------------


@_register(
    "a4_tercile_boundaries",
    """
    WITH s AS (
      SELECT list(c_acctbal ORDER BY c_acctbal) AS l, count(*) AS n FROM customer
    )
    SELECT round((l[n // 3 + 1] + l[n // 3 + 2]) / 2, 6) AS low_mid_boundary,
           round((l[(n * 2) // 3 + 1] + l[(n * 2) // 3 + 2]) / 2, 6) AS mid_high_boundary,
           n AS n_values
    FROM s
    """,
    doc="A4 exact tercile boundaries (Boundaries#train): sorted values, "
    "boundary = mean of v[n/3], v[n/3+1] (0-indexed).",
)
def a4_tercile_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    b = R.tercile_boundaries(cust, "c_acctbal")
    return b.select(
        F.round("low_mid_boundary", 6).alias("low_mid_boundary"),
        F.round("mid_high_boundary", 6).alias("mid_high_boundary"),
        F.col("n_values").cast("long").alias("n_values"),
    )


# ---------------------------------------------------------------------------
# A5: naive-Bayes log-sum scoring
# ---------------------------------------------------------------------------


@_register(
    "a5_nb_logsum",
    """
    SELECT p_brand,
           round(sum(ln((l_quantity + 1) / (50 + 2))) + ln(0.5), 6) AS pos_log_odds,
           round(sum(ln((l_discount * 100 + 1) / (10 + 2))) + ln(0.5), 6) AS neg_log_odds,
           count(*) AS n_props
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    doc="A5 naive-Bayes candidate scoring, product -> log-sum. "
    "Reference: LocationCrawlerBolt.java:155-181.",
)
def a5_nb_logsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    import math

    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(F.log((F.col("l_quantity") + 1) / (50 + 2))) + math.log(0.5), 6).alias(
            "pos_log_odds"
        ),
        F.round(
            F.sum(F.log((F.col("l_discount") * 100 + 1) / (10 + 2))) + math.log(0.5), 6
        ).alias("neg_log_odds"),
        F.count(F.lit(1)).alias("n_props"),
    )


# ---------------------------------------------------------------------------
# T1: top-k per group
# ---------------------------------------------------------------------------


@_register(
    "t1_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    )
    WHERE rank <= 5
    """,
    doc="T1 per-group top-5 by score desc. "
    "Reference: MessageLocationPrediction.java:28-66 (k=5).",
)
def t1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return R.topk_per_group(
        orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=5
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank")


# ---------------------------------------------------------------------------
# W2: count-based micro-batch grouping
# ---------------------------------------------------------------------------


@_register(
    "w2_count_batches",
    """
    SELECT event_id // 5 AS batch_id,
           count(*) AS n,
           round(sum(value), 2) AS batch_value
    FROM events
    GROUP BY 1
    """,
    doc="W2 batch-of-5 grouping (deterministic floor(seq/5) batches). "
    "Reference: TopicModelBolt.java:87-99.",
)
def w2_count_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("event_id") / 5).alias("batch_id"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("batch_value"))
    )


# ---------------------------------------------------------------------------
# P9/P10: WKT point + lon,lat float key
# ---------------------------------------------------------------------------


@_register(
    "p9_p10_geo_strings",
    """
    SELECT event_id,
           'POINT(' || CAST(round(value, 2) AS VARCHAR) || ' ' ||
               CAST(CAST(user_id AS DOUBLE) AS VARCHAR) || ')' AS wkt,
           CAST(CAST(user_id AS FLOAT) AS VARCHAR) || ',' ||
               CAST(CAST(round(value, 2) AS FLOAT) AS VARCHAR) AS lonlat_key
    FROM events
    WHERE event_id % 11 = 0
    """,
    doc="P9 WKT 'POINT(lat long)' (lat-first) + P10 'long,lat' float key. "
    "Reference: LocationCrawlerBolt.java:309-311; TopicModelBolt.java:180-182.",
)
def p9_p10_geo_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    lat = F.round(F.col("value"), 2)
    lon = F.col("user_id").cast("double")
    return ev.select(
        "event_id",
        R.wkt_point(lat, lon).alias("wkt"),
        R.lonlat_key(lat, lon).alias("lonlat_key"),
    )


def catalog() -> list[QuerySpec]:
    return list(_CATALOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in _CATALOG}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle.strip() for spec in _CATALOG if spec.oracle is not None}
