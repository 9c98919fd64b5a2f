"""Kafka source/sink configuration + frame decoding for Structured
Streaming.

The reference's streaming ingest path is a message bus feeding the
engine; in Spark that is `readStream.format("kafka")`. This module
keeps the two halves separate so each is testable without a broker:

- option builders (`source_options` / `sink_options`): pure dicts in
  the exact key namespace the Spark-Kafka connector reads
  (`kafka.*` passthrough to the client, `subscribe`/`assign`,
  `startingOffsets`, `maxOffsetsPerTrigger` …). Unit-tested as data.
- `decode_frames(df, payload_schema)`: the Kafka wire frame →
  typed-event transformation (binary value → JSON → columns +
  event-time). Works identically on a real kafka stream and on a
  batch DataFrame with the same shape, which is how the test drives
  it — the container has no kafka connector jar, so `read_stream`
  gates the format call behind a try.

Scale notes: `maxOffsetsPerTrigger` is the backpressure valve — size
it so one micro-batch's shuffle fits the cluster (rows/trigger ≈
executors × cores × target-batch-rows). `minPartitions` splits hot
topic-partitions across tasks (Kafka partition count caps parallelism
otherwise). The watermark governs state eviction in downstream
windowed aggs (streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: columns every kafka-format read produces (the wire frame)
FRAME_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")


def source_options(
    bootstrap_servers: str,
    *,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = False,
    sasl_jaas: str | None = None,
    security_protocol: str | None = None,
) -> dict[str, str]:
    """Options for `spark.readStream.format("kafka").options(**...)`.

    Exactly one of `subscribe` (comma-separated topics) or
    `subscribe_pattern` (regex) must be given. `kafka.*`-prefixed keys
    pass through to the Kafka consumer client (auth lives there).
    """
    if (subscribe is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of subscribe / subscribe_pattern required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if subscribe is not None:
        opts["subscribe"] = subscribe
    else:
        opts["subscribePattern"] = subscribe_pattern
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    if security_protocol is not None:
        opts["kafka.security.protocol"] = security_protocol
    if sasl_jaas is not None:
        opts["kafka.sasl.jaas.config"] = sasl_jaas
    return opts


def sink_options(bootstrap_servers: str, topic: str, checkpoint_dir: str) -> dict[str, str]:
    """Options for `df.writeStream.format("kafka")` — the sink expects a
    `value` (and optional `key`) binary/string column; exactly-once
    across restarts comes from the checkpoint location."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def decode_frames(frames: DataFrame, payload_schema: StructType, ts_column: str | None = None) -> DataFrame:
    """Kafka wire frames → typed event rows.

    value (binary JSON) is parsed against `payload_schema`; the frame's
    broker `timestamp` is kept as `kafka_ts` (ingest time) and, when
    `ts_column` names a payload field, that field becomes the
    event-time column the caller puts the watermark on — event time
    comes from the payload, not the broker, or late data is silently
    un-late. Corrupt payloads yield NULL structs (kept, not dropped —
    route them to a dead-letter sink in production)."""
    parsed = frames.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("payload"),
    )
    out = parsed.select("kafka_key", "topic", "partition", "offset", "kafka_ts", "payload.*")
    if ts_column is not None:
        out = out.withColumn("event_time", F.col(ts_column).cast("timestamp"))
    return out


def read_stream(spark: SparkSession, opts: dict[str, str], payload_schema: StructType, ts_column: str | None = None) -> DataFrame:
    """readStream from kafka + decode. Raises a clear error when the
    spark-sql-kafka connector jar is absent (this container)."""
    try:
        frames = spark.readStream.format("kafka").options(**opts).load()
    except Exception as exc:  # connector not on classpath
        raise NotImplementedError(
            "kafka connector (spark-sql-kafka-0-10) not on the classpath; "
            "submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from exc
    return decode_frames(frames, payload_schema, ts_column)
