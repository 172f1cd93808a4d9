"""Local file sources for tests / replay.

A directory of text files where each line is one CDC envelope JSON string —
the locally-runnable stand-in for the Kafka topic (SURVEY §1.4 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_VALUE_SCHEMA = T.StructType([T.StructField("value", T.StringType(), True)])


def read_json_lines_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read: each line of each file becomes a ``value`` row.

    ``maxFilesPerTrigger`` is the file-source backpressure equivalent of
    the Kafka ``maxOffsetsPerTrigger`` ceiling.
    """
    reader = spark.readStream.schema(_VALUE_SCHEMA).format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def read_json_lines_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("text").load(path).withColumnRenamed("value", "value")
