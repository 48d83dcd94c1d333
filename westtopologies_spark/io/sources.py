"""Sources (SURVEY.md §2.1).

The reference consumes JSON messages from RabbitMQ/AMQP with an
envelope {exchange, routing, message} (reference:
roleAnalysisTopology/.../util/ExampleSocialMediaAMQPSpout.java:91-104)
and loads several small static side files at operator init. Spark
mapping: Kafka source for the stream (topic/key play exchange/
routing), ``from_json`` for the payload, and plain batch readers +
broadcast for side tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_json_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 200,
    source_format: str = "kafka",
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """S1+S3+S4 — Kafka JSON source with the reference's envelope.

    at-least-once + prefetch 200 (reference: config/storm_config.ini:21-29,47-48)
    maps to checkpointed offsets + ``maxOffsetsPerTrigger``.
    Malformed JSON yields a NULL ``message`` (the reference logs and
    emits null, JacksonScheme.java:30-38) — we keep the row so
    downstream delete-filters see it, plus `_raw` for passthrough.

    ``source_format`` lets the broker-less contract test
    (tests/test_kafka_contract.py, backed by
    :mod:`.kafka_testing`'s protocol-level fake) run THIS function
    through readStream unchanged — only the DataSource name differs
    from production.
    """
    reader = (
        spark.readStream.format(source_format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return parse_kafka_envelope(reader.load(), schema)


def parse_kafka_envelope(raw: DataFrame, schema: T.StructType | str) -> DataFrame:
    """S1/S4 envelope projection, factored out so the serialization
    contract is testable WITHOUT a broker (VERDICT r1 item 8): maps a
    Kafka-shaped row (topic, key, value) to the reference spout's
    {exchange, routing, message} tuple map
    (ExampleSocialMediaAMQPSpout.java:91-104 — exchange=AMQP exchange,
    routing=routing key, message=Scheme-parsed payload). Malformed
    JSON -> NULL message with ``_raw`` preserved (JacksonScheme's
    log-and-emit-null, :30-38)."""
    val = F.col("value").cast("string")
    # Spark 4 from_json yields an all-null struct for malformed input;
    # gate on try_parse_json so the contract stays NULL-on-error
    parsed = F.when(F.try_parse_json(val).isNotNull(), F.from_json(val, schema))
    return raw.select(
        F.col("topic").alias("exchange"),
        F.col("key").cast("string").alias("routing"),
        val.alias("_raw"),
        parsed.alias("message"),
    )


def json_file_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files: int = 1
) -> DataFrame:
    """S7 analog — replay JSON files as a stream (the testDataSender
    harness, reference: testDataSender/.../TwitterLogSender.java:70-100).
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def parse_json_column(df: DataFrame, col: str, schema: T.StructType | str) -> DataFrame:
    """S3 — bytes/string -> typed struct via ``from_json``; malformed
    input becomes NULL (PERMISSIVE), matching JacksonScheme's
    log-and-emit-null (reference: JacksonScheme.java:30-38).
    """
    return df.withColumn("message", F.from_json(F.col(col), schema))


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """S10 — N-Triples file -> (s, p, o) DataFrame.

    Reference loads `linkedgeodata_links.nt` into a Jena model
    (LocationCrawlerBolt.java:100-101); here a line-parse with regex —
    fully parallel, pushdown-friendly, broadcastable.
    """
    line = spark.read.text(path)
    pat = r"^<([^>]*)>\s+<([^>]*)>\s+<?([^>\s]*)>?\s*\.$"
    return line.select(
        F.regexp_extract("value", pat, 1).alias("s"),
        F.regexp_extract("value", pat, 2).alias("p"),
        F.regexp_extract("value", pat, 3).alias("o"),
    ).filter(F.col("s") != "")


def read_nb_counts(spark: SparkSession, path: str) -> DataFrame:
    """S11 — tab-separated `(property, rel, irrel)` with header.

    Reference: LocationCrawlerBolt.java:104-122 (skip header, parse ints).
    """
    schema = "property string, rel int, irrel int"
    return spark.read.option("sep", "\t").option("header", True).schema(schema).csv(path)


def read_wordmap(spark: SparkSession, path: str) -> DataFrame:
    """S12 — whitespace-delimited `word id` dictionary; first line is
    the word count (skipped).

    Reference: TweetIndexBolt.java:86-89; jgibblda.Dictionary#readWordMap.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\s+")
    return (
        lines.filter(F.size(parts) >= 2)
        .select(parts.getItem(0).alias("word"), parts.getItem(1).cast("int").alias("id"))
    )


def read_zip_json(spark: SparkSession, path_glob: str, schema: T.StructType, skip_keywords: list[str] | None = None) -> DataFrame:
    """S9 — batch JSON corpus with filename-keyword skip (P15).

    Reference iterates zip entries and skips names containing skip
    keywords (LocationTopicModelTrainer.java:124-233). Spark reads the
    extracted corpus in parallel; the filename filter is a partition-
    pruning-friendly predicate on ``input_file_name()``.
    """
    df = spark.read.schema(schema).json(path_glob).withColumn("_file", F.input_file_name())
    for kw in skip_keywords or []:
        df = df.filter(~F.col("_file").contains(kw))
    return df
