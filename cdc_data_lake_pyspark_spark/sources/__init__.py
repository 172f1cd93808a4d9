"""Stream/batch sources: Kafka option builder + local file sources."""

from cdc_data_lake_pyspark_spark.sources.kafka import (
    kafka_source_options,
    read_kafka_stream,
)
from cdc_data_lake_pyspark_spark.sources.files import (
    read_json_lines_stream,
    read_json_lines_batch,
)

__all__ = [
    "kafka_source_options",
    "read_kafka_stream",
    "read_json_lines_stream",
    "read_json_lines_batch",
]
