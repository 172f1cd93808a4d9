"""cdc_data_lake_pyspark_spark — a PySpark-native CDC data-lake engine.

A from-scratch rebuild of the capabilities of
``norrishuang/cdc-data-lake-pyspark`` (reference at /root/reference),
re-expressed as an idiomatic, locally-testable PySpark library:

* CDC envelope parsing (Debezium + AWS DMS JSON wire formats)
* insert / upsert / delete routing with multi-table fan-out
* within-batch latest-per-primary-key dedup (single + composite keys)
* merge / delete / append application against a pluggable ``TableSink``
* dynamic payload-schema inference + timestamp-field casting
* Structured Streaming shell (``foreachBatch``) over Kafka or file sources
* phase-2 large-scale pipeline operators: exact & fuzzy dedup (MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  multimodal binary-column plumbing.

Everything is DataFrame-in / DataFrame-out so Catalyst plans, optimizes and
executes; no driver-side row loops in the hot path.
"""

__version__ = "0.1.0"

from cdc_data_lake_pyspark_spark.config import TableConfig, load_tables_config
from cdc_data_lake_pyspark_spark.envelope import (
    DEBEZIUM_ENVELOPE_SCHEMA,
    DMS_ENVELOPE_SCHEMA,
    parse_debezium,
    parse_dms,
)
from cdc_data_lake_pyspark_spark.router import route_changes, table_op_inventory
from cdc_data_lake_pyspark_spark.dedup import latest_change_per_key
from cdc_data_lake_pyspark_spark.apply import (
    merge_into,
    delete_matching,
    MemoryTableSink,
    ParquetTableSink,
)
from cdc_data_lake_pyspark_spark.pipeline import CdcPipeline

__all__ = [
    "TableConfig",
    "load_tables_config",
    "DEBEZIUM_ENVELOPE_SCHEMA",
    "DMS_ENVELOPE_SCHEMA",
    "parse_debezium",
    "parse_dms",
    "route_changes",
    "table_op_inventory",
    "latest_change_per_key",
    "merge_into",
    "delete_matching",
    "MemoryTableSink",
    "ParquetTableSink",
    "CdcPipeline",
]
