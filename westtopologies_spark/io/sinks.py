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
):
    """S5 — serialize all non-key columns to one JSON value and
    publish; exactly-once per sink via checkpointing (strictly
    stronger than the reference's ack-on-receipt, SURVEY.md §2.10 W3).
    """
    payload_cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def to_json_files(df: DataFrame, path: str, checkpoint: str):
    """S6 — per-window JSON file sink (debug/golden outputs)."""
    return (
        df.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def batch_to_json_strings(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Batch variant: rows -> one JSON string column `value` (what the
    reference's TupleToMessage serializer does)."""
    cols = cols or df.columns
    return df.select(F.to_json(F.struct(*cols)).alias("value"))
