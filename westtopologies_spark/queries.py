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


# ---------------------------------------------------------------------------
# §2.7 role-analysis kernel: features + tercile levels + rule cascade
# ---------------------------------------------------------------------------
#
# Demonstration forest derived deterministically from `events`:
# roots every 5th event, otherwise parent = previous event (chain) or
# the block root, depending on props.k — bounded depth ≤ 5, all
# parents exist. Exercises with_root_ids / role_features /
# tercile_levels / assign_roles end-to-end.

_ROLES_FEATS_CTE = """
WITH RECURSIVE raw AS (
  SELECT event_id, user_id,
         CAST(json_extract_string(props, 'k') AS BIGINT) AS k
  FROM events
),
edges AS (
  SELECT event_id AS tweet_id,
         CASE WHEN event_id % 5 = 0 THEN NULL
              WHEN k % 3 = 0 THEN event_id - 1
              ELSE event_id - (event_id % 5) END AS parent_id,
         user_id AS author_id
  FROM raw
),
anc AS (
  SELECT tweet_id, tweet_id AS root_id FROM edges WHERE parent_id IS NULL
  UNION ALL
  SELECT e.tweet_id, a.root_id FROM edges e JOIN anc a ON e.parent_id = a.tweet_id
),
nodes AS (
  SELECT e.tweet_id, e.parent_id, e.author_id, a.root_id
  FROM edges e JOIN anc a ON e.tweet_id = a.tweet_id
),
pairs AS (
  SELECT c.tweet_id AS c_id, c.author_id AS user_id,
         ch.author_id AS child_author, p.author_id AS parent_author
  FROM nodes c
  JOIN nodes ch ON ch.parent_id = c.tweet_id
  LEFT JOIN nodes p ON c.parent_id = p.tweet_id
),
replied AS (
  SELECT user_id, count(DISTINCT c_id) AS replied_posts,
         count(DISTINCT child_author) AS n_replying_users
  FROM pairs GROUP BY 1
),
neigh AS (
  SELECT user_id, count(DISTINCT nb) AS n_neighbours FROM (
    SELECT user_id, child_author AS nb FROM pairs
    UNION ALL
    SELECT user_id, parent_author AS nb FROM pairs WHERE parent_author IS NOT NULL
  ) GROUP BY 1
),
bidir AS (
  SELECT user_id, count(DISTINCT child_author) AS n_bidir_neighbours,
         count(DISTINCT c_id) AS bidir_threads
  FROM pairs WHERE child_author = parent_author GROUP BY 1
),
posts AS (SELECT author_id AS user_id, count(*) AS post_count FROM nodes GROUP BY 1),
tree_sizes AS (SELECT root_id, count(*) AS tree_size FROM nodes GROUP BY 1),
user_trees AS (
  SELECT ut.user_id, count(*) AS n_trees,
         sum(ts.tree_size) AS sum_tree_sizes,
         sum(ts.tree_size * ts.tree_size) AS sum_tree_sizes_sq
  FROM (SELECT DISTINCT author_id AS user_id, root_id FROM nodes) ut
  JOIN tree_sizes ts USING (root_id) GROUP BY 1
),
nc AS (SELECT count(DISTINCT author_id) AS n_community_users FROM nodes),
feats AS (
  SELECT p.user_id,
         p.post_count,
         coalesce(r.replied_posts, 0) AS replied_posts,
         coalesce(r.n_replying_users, 0) AS n_replying_users,
         coalesce(ng.n_neighbours, 0) AS n_neighbours,
         coalesce(b.n_bidir_neighbours, 0) AS n_bidir_neighbours,
         coalesce(b.bidir_threads, 0) AS bidir_threads,
         CASE WHEN nc.n_community_users > 0
              THEN CAST(coalesce(r.n_replying_users, 0) AS DOUBLE) / nc.n_community_users
              ELSE 0.0 END AS in_degree_ratio,
         CASE WHEN p.post_count > 0
              THEN CAST(coalesce(r.replied_posts, 0) AS DOUBLE) / p.post_count
              ELSE 0.0 END AS posts_reply_ratio,
         0.0 AS thread_initiation_ratio,
         CASE WHEN coalesce(ng.n_neighbours, 0) > 0
              THEN CAST(coalesce(b.n_bidir_neighbours, 0) AS DOUBLE) / ng.n_neighbours
              ELSE 0.0 END AS bidir_neighbour_ratio,
         CASE WHEN p.post_count > 0
              THEN CAST(coalesce(b.bidir_threads, 0) AS DOUBLE) / p.post_count
              ELSE 0.0 END AS bidir_thread_ratio,
         CASE WHEN coalesce(t.n_trees, 0) > 0
              THEN CAST(t.sum_tree_sizes AS DOUBLE) / t.n_trees
              ELSE 0.0 END AS avg_posts_per_thread,
         CASE WHEN coalesce(t.n_trees, 0) >= 2
              THEN sqrt(CAST(t.n_trees * t.sum_tree_sizes_sq
                             - t.sum_tree_sizes * t.sum_tree_sizes AS DOUBLE)
                        / CAST(t.n_trees * (t.n_trees - 1) AS DOUBLE))
              ELSE 0.0 END AS stddev_posts_per_thread
  FROM posts p
  LEFT JOIN replied r USING (user_id)
  LEFT JOIN neigh ng USING (user_id)
  LEFT JOIN bidir b USING (user_id)
  LEFT JOIN user_trees t USING (user_id)
  CROSS JOIN nc
)
"""


def _roles_bounds_sql() -> str:
    from .ops.roles import LEVEL_FEATURES

    lists = ", ".join(
        f"list({f} ORDER BY {f}) AS l_{f}" for f in LEVEL_FEATURES
    )
    bounds = ", ".join(
        f"(l_{f}[n // 3 + 1] + l_{f}[n // 3 + 2]) / 2 AS {f}_lm, "
        f"(l_{f}[(2 * n) // 3 + 1] + l_{f}[(2 * n) // 3 + 2]) / 2 AS {f}_mh"
        for f in LEVEL_FEATURES
    )
    levels = ", ".join(
        f"CASE WHEN f.{f} <= bd.{f}_lm THEN 'low' "
        f"WHEN f.{f} <= bd.{f}_mh THEN 'med' ELSE 'high' END AS {f}_level"
        for f in LEVEL_FEATURES
    )
    return (
        f", sorted AS (SELECT {lists}, count(*) AS n FROM feats)\n"
        f", bounds AS (SELECT {bounds} FROM sorted)\n"
        f", leveled AS (SELECT f.*, {levels} FROM feats f CROSS JOIN bounds bd)\n"
    )


def _roles_case_sql() -> str:
    from .ops.roles import ROLE_RULES

    whens = []
    for role, conds in reversed(ROLE_RULES):
        cond = " AND ".join(f"{feat}_level = '{lvl}'" for feat, lvl in conds.items())
        whens.append(f"WHEN {cond} THEN '{role}'")
    return "CASE " + " ".join(whens) + " ELSE '<None>' END"


def _event_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    eid = F.col("event_id")
    return ev.select(
        eid.alias("tweet_id"),
        F.when(eid % 5 == 0, F.lit(None).cast("long"))
        .when(k % 3 == 0, eid - 1)
        .otherwise(eid - (eid % 5))
        .alias("parent_id"),
        F.col("user_id").alias("author_id"),
    )


@_register(
    "a3_role_features",
    _ROLES_FEATS_CTE
    + """
    SELECT user_id, post_count, replied_posts, n_replying_users, n_neighbours,
           n_bidir_neighbours, bidir_threads,
           round(in_degree_ratio, 6) AS in_degree_ratio,
           round(posts_reply_ratio, 6) AS posts_reply_ratio,
           round(bidir_neighbour_ratio, 6) AS bidir_neighbour_ratio,
           round(bidir_thread_ratio, 6) AS bidir_thread_ratio,
           round(avg_posts_per_thread, 6) AS avg_posts_per_thread,
           round(stddev_posts_per_thread, 6) AS stddev_posts_per_thread
    FROM feats
    """,
    doc="A3/§2.7 per-user behaviour features over the discussion forest. "
    "Reference: reveal-interaction-1.0.jar!CommunityAnalysis#analyseUserFeatures.",
)
def a3_role_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.roles import role_features

    feats = role_features(_event_edges(spark, sf_dir))
    return feats.select(
        "user_id",
        "post_count",
        "replied_posts",
        "n_replying_users",
        "n_neighbours",
        "n_bidir_neighbours",
        "bidir_threads",
        F.round("in_degree_ratio", 6).alias("in_degree_ratio"),
        F.round("posts_reply_ratio", 6).alias("posts_reply_ratio"),
        F.round("bidir_neighbour_ratio", 6).alias("bidir_neighbour_ratio"),
        F.round("bidir_thread_ratio", 6).alias("bidir_thread_ratio"),
        F.round("avg_posts_per_thread", 6).alias("avg_posts_per_thread"),
        F.round("stddev_posts_per_thread", 6).alias("stddev_posts_per_thread"),
    )


def _roles_assign_oracle() -> str:
    return (
        _ROLES_FEATS_CTE
        + _roles_bounds_sql()
        + f"SELECT user_id, post_count, {_roles_case_sql()} AS role FROM leveled"
    )


@_register(
    "a3_role_assignment",
    None,  # oracle attached below (built programmatically)
    doc="§2.7 full kernel: features -> per-window tercile levels (A4) -> "
    "8-rule cascade, last match wins (RoleAssociation#assignRole, intended mode).",
)
def a3_role_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.roles import assign_roles, role_features, tercile_levels

    feats = role_features(_event_edges(spark, sf_dir))
    roles = assign_roles(tercile_levels(feats))
    return roles.select("user_id", "post_count", "role")


# attach the programmatic oracle to the spec registered above
_CATALOG[-1] = QuerySpec(
    _CATALOG[-1].name, _CATALOG[-1].spark, _roles_assign_oracle(), _CATALOG[-1].doc
)


def catalog() -> list[QuerySpec]:
    return list(_CATALOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in _CATALOG}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle.strip() for spec in _CATALOG if spec.oracle is not None}
