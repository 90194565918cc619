"""Kafka-shaped streaming source adapter (SURVEY §2 #62).

The container has no Kafka broker, so ``format("kafka")`` can't be
integration-tested here — but everything downstream of the source
can be. This module pins the EXACT record shape Spark's Kafka
connector produces (key/value binary, topic, partition, offset,
timestamp, timestampType) and provides:

- ``synthetic_kafka_stream``: a rate-limited, deterministic
  kafka-shaped stream built on the ``rate-micro-batch`` source
  (fixed rows per batch, fixed start timestamp — replayable, so
  stream results are assertable). Swapping it for
  ``spark.readStream.format("kafka")`` changes NOTHING downstream:
  same columns, same types.
- ``kafka_json_events``: the standard decode path — parse the binary
  ``value`` as a JSON event into typed columns via ``from_json``
  (JVM-side, codegen; no Python in the hot path). Works on batch and
  streaming frames alike, so the decode logic is oracle-checkable in
  batch and reused verbatim in the stream.

Scale posture: a real deployment reads one Spark partition per Kafka
partition; the decode is a narrow map (no shuffle); downstream
watermarked aggregation bounds state exactly as in pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# byte-for-byte the schema of spark-sql-kafka's source (Spark docs,
# "Structured Streaming + Kafka Integration Guide")
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _synth_event_cols(topic: str, n_users: int, start_ts: str) -> list:
    """Deterministic event attributes derived from the rate source's
    monotonically increasing ``value`` counter (pure column exprs)."""
    ev_type = (
        "element_at(array('view','click','purchase','signup'), "
        "CAST(value % 4 AS INT) + 1)"
    )
    ev_ts = f"timestamp '{start_ts}' + make_dt_interval(0, 0, 0, value * 7)"
    payload = (
        "to_json(named_struct("
        "'event_id', value, "
        f"'ts', date_format({ev_ts}, 'yyyy-MM-dd HH:mm:ss'), "
        f"'user_id', value % {n_users}, "
        f"'event_type', {ev_type}, "
        "'value', CAST(value AS DOUBLE) / 10.0, "
        "'props', concat('p', value % 3)))"
    )
    return [
        F.expr(f"CAST(CAST(value % {n_users} AS STRING) AS BINARY)").alias(
            "key"
        ),
        F.expr(f"CAST({payload} AS BINARY)").alias("value"),
        F.lit(topic).alias("topic"),
        F.expr("CAST(value % 4 AS INT)").alias("partition"),
        F.expr("value").alias("offset"),
        F.expr(ev_ts).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    ]


def synthetic_kafka_stream(
    spark: SparkSession,
    topic: str = "events",
    rows_per_batch: int = 200,
    num_partitions: int = 4,
    n_users: int = 50,
    start_ts: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Deterministic kafka-shaped stream: ``rate-micro-batch`` emits
    exactly ``rows_per_batch`` rows per trigger with a fixed counter,
    mapped to the Kafka record schema. Replayable end-to-end (no
    wall-clock dependence), hence usable in equivalence tests."""
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", "0")
        .load()
    )
    return rate.select(*_synth_event_cols(topic, n_users, start_ts))


def synthetic_kafka_batch(
    spark: SparkSession,
    n_rows: int,
    topic: str = "events",
    n_users: int = 50,
    start_ts: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Batch twin of ``synthetic_kafka_stream``: identical rows for
    ``value`` in [0, n_rows) via ``spark.range`` — what a bounded
    replay of the stream delivers, for stream==batch assertions."""
    rng = spark.range(n_rows).select(F.col("id").alias("value"))
    return rng.select(*_synth_event_cols(topic, n_users, start_ts))


EVENT_JSON_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def kafka_json_events(
    records: DataFrame,
    schema: StructType = EVENT_JSON_SCHEMA,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Decode kafka-shaped records' JSON ``value`` into typed event
    columns. Narrow map, from_json is JVM-side. Rows whose payload
    fails to parse become all-null structs; ``drop_corrupt`` filters
    them (dead-letter them upstream in production)."""
    out = records.select(
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
        F.from_json(
            F.col("value").cast("string"), schema
        ).alias("__ev"),
    )
    if drop_corrupt:
        # PERMISSIVE from_json yields an all-null struct (not a NULL
        # struct) for unparseable payloads — treat both as corrupt
        any_field = " OR ".join(
            f"__ev.`{f.name}` IS NOT NULL" for f in schema.fields
        )
        out = out.where(F.expr(f"__ev IS NOT NULL AND ({any_field})"))
    return out.select("_kafka_partition", "_kafka_offset", "__ev.*")
