"""StructTypes for the reference's JSON message streams.

Derived from the field accesses inventoried in FIXTURES.md; the
reference itself is schema-on-read (Jackson ``Map<Object,Object>``,
reference: roleAnalysisTopology/src/main/java/util/JacksonScheme.java:30-38).
We declare explicit schemas for the fields actually consumed and keep
the raw JSON string in a ``_raw`` column for passthrough, because the
reference always forwards the whole message (e.g. reference:
locationTopicModelTopology/.../bolts/TweetIndexBolt.java:188-192).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Twitter `created_at` format (reference: roleAnalysisTopology/.../bolts/
# DiscussionTreeBolt.java:103-105 — Joda "EEE MMM dd HH:mm:ss Z yyyy", US locale).
TWITTER_TS_FORMAT = "EEE MMM dd HH:mm:ss Z yyyy"

USER_SCHEMA = T.StructType(
    [
        T.StructField("id_str", T.StringType()),
        T.StructField("screen_name", T.StringType()),
    ]
)

# F1 `tweets` — raw Twitter status stream.
TWEET_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("user", USER_SCHEMA),
        T.StructField("in_reply_to_status_id_str", T.StringType()),
        T.StructField("in_reply_to_user_id_str", T.StringType()),
        T.StructField("in_reply_to_screen_name", T.StringType()),
        T.StructField(
            "retweeted_status",
            T.StructType(
                [
                    T.StructField("id_str", T.StringType()),
                    T.StructField("user", T.StructType([T.StructField("id_str", T.StringType())])),
                ]
            ),
        ),
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "user_mentions",
                        T.ArrayType(T.StructType([T.StructField("id_str", T.StringType())])),
                    )
                ]
            ),
        ),
        T.StructField(
            "coordinates",
            T.StructType([T.StructField("coordinates", T.ArrayType(T.DoubleType()))]),
        ),
    ]
)

# F2 `geoparse` — ITINNO-enriched stream (reference:
# lodExplorerTopology/.../bolts/LocationCrawlerBolt.java:236-258).
# Each loc_set entry carries a list of linked_data URIs.
GEOPARSE_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("itinno:item_id", T.StringType()),
        T.StructField(
            "itinno:loc_set",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("linked_data", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)

# Flat discussion-tree edge row (the engine's representation of the
# recursive tree; reference assembles nested maps at
# roleAnalysisTopology/.../bolts/DiscussionTreeBolt.java:189-212).
TREE_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("tweet_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("author_id", T.LongType()),
        T.StructField("author_screen_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("observed", T.BooleanType()),
        T.StructField("retweet", T.BooleanType()),
        T.StructField("_seq", T.LongType()),
    ]
)

# F4 interaction edges (reference: roleAnalysisTopology/.../bolts/
# InteractionGraphBolt.java:96-166): author -> action -> (target, ts).
INTERACTION_ACTIONS = ("replied_to", "mentioned", "retweeted")

INTERACTION_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src_user", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("dst_user", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

# F7 topic-model sink message (reference: locationTopicModelTopology/
# .../bolts/TopicModelBolt.java:197-212).
TOPIC_SET_SCHEMA = T.StructType(
    [
        T.StructField("itinno:item_id", T.StringType()),
        T.StructField(
            "ukob:topic_set",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("location", T.StringType()),
                        T.StructField("probability", T.FloatType()),
                    ]
                )
            ),
        ),
    ]
)
