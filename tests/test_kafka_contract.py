"""Broker-less Kafka contract tests (VERDICT r2 "do this" #5).

No broker or spark-sql-kafka jar exists in this environment, so these
tests drive the REAL S1/S5 functions (``kafka_json_stream``,
``to_kafka_json``) through readStream/writeStream against the
protocol-level fake in ``westtopologies_spark.io.kafka_testing`` —
a Python Data Source exposing the exact Kafka source schema and sink
column contract.  Envelope semantics mirror the reference spout
(ExampleSocialMediaAMQPSpout.java:91-104: {exchange, routing,
message}) and the replay harness (TwitterLogSender.java:66-100).
"""

from __future__ import annotations

import glob
import json
import time

import pytest

from westtopologies_spark.io import kafka_testing as KT
from westtopologies_spark.io.sinks import envelope_to_kafka_rows, to_kafka_json
from westtopologies_spark.io.sources import kafka_json_stream, parse_kafka_envelope

TWEET_SCHEMA = (
    "id_str string, text string, created_at string, "
    "user struct<id_str string, screen_name string>"
)

LINES = [
    json.dumps(
        {
            "id_str": "1",
            "text": "hello world",
            "created_at": "Mon Jan 01 00:00:00 +0000 2024",
            "user": {"id_str": "10", "screen_name": "alice"},
        }
    ),
    "{this is not json",  # malformed: Scheme logs + emits null
    json.dumps(
        {
            "id_str": "2",
            "text": "reply",
            "created_at": "Mon Jan 01 00:01:00 +0000 2024",
            "user": {"id_str": "11", "screen_name": "bob"},
        }
    ),
]


@pytest.fixture(scope="module")
def replay_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("kafka") / "tweets.log"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    KT.register(spark)


def test_source_schema_matches_kafka_contract(spark, replay_file):
    df = (
        spark.read.format("kafka_fake")
        .option("path", replay_file)
        .option("topic", "reveal_exchange")
        .load()
    )
    assert df.schema == KT.source_schema()
    # the exact spark-sql-kafka column set, in order
    assert df.columns == [
        "key",
        "value",
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestampType",
    ]
    rows = df.orderBy("offset").collect()
    assert len(rows) == 3
    assert isinstance(rows[0].value, (bytes, bytearray))
    assert bytes(rows[0].value).decode() == LINES[0]


def test_envelope_parse_matches_spout_semantics(spark, replay_file):
    """parse_kafka_envelope == ExampleSocialMediaAMQPSpout.java:91-104:
    exchange=topic, routing=key, message=Scheme-parsed JSON (null on
    malformed, JacksonScheme.java:30-38), raw payload preserved."""
    raw = (
        spark.read.format("kafka_fake")
        .option("path", replay_file)
        .option("topic", "reveal_exchange")
        .option("key", "tweet.route")
        .load()
    )
    env = parse_kafka_envelope(raw, TWEET_SCHEMA).collect()
    assert [r.exchange for r in env] == ["reveal_exchange"] * 3
    assert [r.routing for r in env] == ["tweet.route"] * 3
    by_raw = {r._raw: r for r in env}
    assert by_raw[LINES[0]].message.user.screen_name == "alice"
    assert by_raw["{this is not json"].message is None  # null-on-error
    assert by_raw[LINES[2]].message.id_str == "2"


def test_kafka_json_stream_to_kafka_sink_roundtrip(spark, replay_file, tmp_path_factory):
    """The full S1 -> S5 path through readStream/writeStream: the real
    kafka_json_stream and to_kafka_json functions, only the format
    name swapped for the protocol fake."""
    out = tmp_path_factory.mktemp("kafka_out")
    sink_dir = str(out / "published")
    env = kafka_json_stream(
        spark,
        bootstrap_servers="fake:9092",
        topic="reveal_exchange",
        schema=TWEET_SCHEMA,
        starting_offsets="earliest",
        source_format="kafka_fake",
        extra_options={"path": replay_file, "key": "tweet.route"},
    )
    # lodExplorer sink shape: serialize the parsed message, drop raw
    payload = env.filter(env.message.isNotNull()).select(
        "routing", "message.id_str", "message.text"
    )
    q = to_kafka_json(
        payload,
        bootstrap_servers="fake:9092",
        topic="reveal_exchange_ukob_lod_explorer",
        checkpoint=str(out / "ckpt"),
        key_col="routing",
        sink_format="kafka_fake",
        extra_options={"path": sink_dir},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if glob.glob(f"{sink_dir}/*.jsonl"):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    recs = []
    for f in glob.glob(f"{sink_dir}/*.jsonl"):
        with open(f) as fh:
            recs += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(recs) == 2  # malformed line dropped by the null filter
    assert {r["key"] for r in recs} == {"tweet.route"}
    assert all(
        r["topic"] == "reveal_exchange_ukob_lod_explorer" for r in recs
    )
    bodies = sorted(json.loads(r["value"])["id_str"] for r in recs)
    assert bodies == ["1", "2"]


def test_envelope_passthrough_relay_is_byte_identical(spark, replay_file):
    """S5 relay mode: determineExchangeName/determineRoutingKey return
    fixed config values and the body is the original payload
    (TopologyRunner.java:173-221)."""
    raw = (
        spark.read.format("kafka_fake")
        .option("path", replay_file)
        .option("topic", "in_ex")
        .load()
    )
    env = parse_kafka_envelope(raw, TWEET_SCHEMA)
    out = envelope_to_kafka_rows(
        env, exchange="out_ex", routing="out.route", passthrough_raw=True
    ).collect()
    assert {r.topic for r in out} == {"out_ex"}
    assert {r.key for r in out} == {"out.route"}
    assert sorted(r.value for r in out) == sorted(LINES)
