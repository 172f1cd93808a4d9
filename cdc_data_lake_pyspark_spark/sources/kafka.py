"""Kafka source wiring (SURVEY §2.1 S1).

Reference parity: ``msg/KafkaConnector.py:17-33`` builds the option dict —
``subscribe``, ``startingOffsets``/``startingTimestamp``,
``maxOffsetsPerTrigger=200000`` (backpressure ceiling),
``failOnDataLoss=false``, ``kafka.max.partition.fetch.bytes=10485760`` —
and ``kafka-iceberg-streaming-emrserverless-v2.py:182-194`` applies them to
``readStream.format('kafka')`` then casts the binary value to string.

Only real Spark-Kafka option keys are emitted (the reference also passes
Glue-connector-only keys like ``inferSchema``/``classification`` into the
plain Kafka source where they are silently ignored — SURVEY §8; we don't).

Untestable locally (no broker) — covered by option-dict unit tests.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_OFFSETS_PER_TRIGGER = 200_000
DEFAULT_MAX_FETCH_BYTES = 10_485_760


def kafka_source_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    starting_timestamp: Optional[int] = None,
    max_offsets_per_trigger: int = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
    max_partition_fetch_bytes: int = DEFAULT_MAX_FETCH_BYTES,
    fail_on_data_loss: bool = False,
    extra: Optional[Mapping[str, str]] = None,
) -> dict[str, str]:
    """Build the Spark Kafka source option dict.

    ``starting_timestamp`` (epoch millis) takes precedence over
    ``starting_offsets`` — the reference chooses by argument shape
    (``kafka-iceberg-streaming-emrserverless-v2.py:187-190``).
    """
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
        "kafka.max.partition.fetch.bytes": str(max_partition_fetch_bytes),
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if starting_timestamp is not None:
        opts["startingTimestamp"] = str(starting_timestamp)
    else:
        opts["startingOffsets"] = starting_offsets
    if extra:
        opts.update(extra)
    return opts


def read_kafka_stream(spark: SparkSession, options: Mapping[str, str]) -> DataFrame:
    """``readStream.format('kafka')`` + value cast to string — one column
    ``value:string``, ready for the envelope parsers."""
    reader = spark.readStream.format("kafka").options(**options)
    return reader.load().select(F.col("value").cast("string").alias("value"))
