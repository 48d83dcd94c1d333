"""Sinks (SURVEY.md §2.1: S5 Kafka sink, S6 file sink).

The reference publishes JSON bytes back to RabbitMQ with a fixed
exchange/routing key (reference: lodExplorerTopology/.../TopologyRunner.java:173-221,271-273)
and dumps per-window debug files (e.g. DiscussionTreeBolt.java:162-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_json(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
    sink_format: str = "kafka",
    extra_options: dict[str, str] | None = None,
):
    """S5 — serialize all non-key columns to one JSON value and
    publish; exactly-once per sink via checkpointing (strictly
    stronger than the reference's ack-on-receipt, SURVEY.md §2.10 W3).

    ``sink_format`` lets the broker-less contract test drive THIS
    function through writeStream against the protocol-level fake
    (:mod:`.kafka_testing`); production leaves it at ``"kafka"``.
    """
    payload_cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    writer = (
        out.writeStream.format(sink_format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    for k, v in (extra_options or {}).items():
        writer = writer.option(k, v)
    return writer.start()


def to_json_files(df: DataFrame, path: str, checkpoint: str):
    """S6 — per-window JSON file sink (debug/golden outputs)."""
    return (
        df.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def envelope_to_kafka_rows(
    df: DataFrame,
    exchange: str,
    routing: str,
    passthrough_raw: bool = False,
) -> DataFrame:
    """S5 contract half (VERDICT r1 item 8): the batch-testable analog
    of the reference's ``TupleToMessage`` sink scheme
    (lodExplorerTopology/.../TopologyRunner.java:173-221):

    * body = JSON serialization of the envelope's ``message`` map
      (``extractBody`` -> ``new JSONObject(message).toString()``);
    * exchange and routing key are FIXED config values — the
      reference ignores per-tuple fields (``determineExchangeName`` /
      ``determineRoutingKey`` return the constants);
    * ``passthrough_raw=True`` republishes the original payload bytes
      (``_raw``) untouched — the byte-identical relay mode.

    Output is Kafka-writer shaped (topic, key, value); feed it to
    ``df.write.format("kafka")`` or :func:`to_kafka_json`.
    """
    body = F.col("_raw") if passthrough_raw else F.to_json(F.col("message"))
    return df.select(
        F.lit(exchange).alias("topic"),
        F.lit(routing).alias("key"),
        body.alias("value"),
    )


def batch_to_json_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Batch variant: rows -> one JSON string column `value` (what the
    reference's TupleToMessage serializer does)."""
    cols = cols or df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("value"))
