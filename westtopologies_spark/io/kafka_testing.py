"""Protocol-level Kafka fake: a Python Data Source exposing the EXACT
Kafka source/sink contract, so the S1/S5 codepaths run end-to-end
without a broker (VERDICT r2 "do this" #5).

No Kafka broker or spark-sql-kafka connector jar ships in this
environment, so ``format("kafka")`` itself cannot resolve; this
registers ``format("kafka_fake")`` instead, reproducing the contract
the real connector exposes:

* source schema — ``key binary, value binary, topic string,
  partition int, offset bigint, timestamp timestamp, timestampType
  int`` (byte-for-byte what spark-sql-kafka emits);
* replayer semantics — one record per line of a log file with a fixed
  exchange (topic) and routing key (key), mirroring the reference's
  testDataSender harness (testDataSender/.../TwitterLogSender.java:66-100:
  read text file line-by-line, publish each line to the exchange);
* sink contract — accepts (value [, key, topic]) rows, value/key
  string-or-binary, exactly like the Kafka writer; rows are appended
  as JSON-line files under ``path`` so tests can assert what was
  "published".

Because :func:`..io.sources.kafka_json_stream` and
:func:`..io.sinks.to_kafka_json` take the format name as a
parameter, the contract tests drive the REAL reader/writer functions
through ``readStream``/``writeStream`` — only the DataSource name
differs from production.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType, _parse_datatype_string

# the spark-sql-kafka source schema, verbatim
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

# records carry a fixed fake event time so replays are deterministic
_BASE_EPOCH = 1_700_000_000


def _records(options) -> list[tuple]:
    """Materialize the replay file as Kafka-shaped tuples."""
    import datetime

    path = options.get("path")
    if not path:
        raise ValueError("kafka_fake requires a 'path' option (replay file)")
    topic = options.get("topic", options.get("subscribe", "test-topic"))
    key = options.get("key")
    key_bytes = key.encode() if key is not None else None
    out = []
    with open(path, "rb") as f:
        for i, line in enumerate(ln for ln in f.read().splitlines() if ln):
            ts = datetime.datetime.fromtimestamp(
                _BASE_EPOCH + i, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
            out.append((key_bytes, bytes(line), topic, 0, i, ts, 0))
    return out


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.options = options

    def read(self, partition) -> Iterator[tuple]:
        yield from _records(self.options)


class _StreamReader(SimpleDataSourceStreamReader):
    """One-partition stream over the replay file: each ``read`` call
    serves every not-yet-consumed line (micro-batch = whatever is
    available, exactly like the real source with no rate limit)."""

    def __init__(self, options):
        self.options = options

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = _records(self.options)
        lo = start["offset"]
        return iter(rows[lo:]), {"offset": len(rows)}

    def commit(self, end: dict) -> None:
        pass


class _SinkCommit(WriterCommitMessage):
    pass


class _StreamWriter(DataSourceStreamWriter):
    """Kafka-sink contract: requires a ``value`` column (string or
    binary), optional ``key``; the topic comes from the writer option
    (like ``.option("topic", ...)`` on the real sink).  Each partition
    appends its rows as JSON lines under ``path``."""

    def __init__(self, options, schema: StructType):
        names = {f.name for f in schema.fields}
        if "value" not in names:
            raise ValueError(
                "kafka_fake sink requires a 'value' column "
                f"(got {sorted(names)}) — same contract as format('kafka')"
            )
        self.options = options
        self.path = options.get("path")
        self.topic = options.get("topic", "test-topic")
        self.columns = [f.name for f in schema.fields]
        if not self.path:
            raise ValueError("kafka_fake sink requires a 'path' option")

    def write(self, iterator: Iterator) -> _SinkCommit:
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                rec = dict(zip(self.columns, row))
                for col in ("key", "value"):
                    v = rec.get(col)
                    if isinstance(v, (bytes, bytearray)):
                        # the real sink takes arbitrary BINARY; keep
                        # non-UTF-8 payloads byte-faithful via the
                        # reversible latin-1 mapping instead of
                        # crashing on strict utf-8 (CODE-REVIEW r3)
                        try:
                            rec[col] = bytes(v).decode("utf-8")
                        except UnicodeDecodeError:
                            rec[col] = bytes(v).decode("latin-1")
                            rec[f"_{col}_encoding"] = "latin-1"
                rec.setdefault("topic", self.topic)
                f.write(json.dumps(rec) + "\n")
                n += 1
        if n == 0:
            os.remove(out)
        return _SinkCommit()

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_fake"

    def schema(self) -> str:
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema: StructType) -> _BatchReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _StreamReader:
        return _StreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> _StreamWriter:
        return _StreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(FakeKafkaDataSource)


def source_schema() -> StructType:
    return _parse_datatype_string(KAFKA_SOURCE_SCHEMA)
