"""Stream → ``foreachBatch`` → CdcPipeline wiring (SURVEY §2.1 S3, §2.5).

Reference parity: ``writeStream.outputMode('append')
.trigger(processingTime='60 seconds').foreachBatch(process.processBatch)
.option('checkpointLocation', ...)`` —
``kafka-iceberg-streaming-emrserverless-v2.py:218-225``.

Exactly-once story (same as reference): source offsets + checkpoint give
at-least-once batch replay; MERGE-on-PK application converges on replay,
appends are the non-idempotent edge (documented, as in the reference).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline

DEFAULT_TRIGGER_SECONDS = 60  # reference: emrserverless-v2.py:221


def start_cdc_stream(
    source: DataFrame,
    pipeline: CdcPipeline,
    checkpoint_location: str,
    trigger_seconds: Optional[int] = DEFAULT_TRIGGER_SECONDS,
    query_name: str = "cdc_pipeline",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the micro-batch stream feeding ``pipeline.process_batch``.

    ``available_now=True`` drains everything currently available then
    stops — the testing/backfill trigger.
    """
    writer = (
        source.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(pipeline.process_batch)
        .option("checkpointLocation", checkpoint_location)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
