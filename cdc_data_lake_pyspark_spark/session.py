"""Session builder with the engine's recommended configuration.

Mirrors the knobs the reference sets (ANSI off, session timezone, Iceberg
extensions when a lakehouse catalog is attached —
``kafka-iceberg-streaming-emrserverless-v2.py:133-149``) but defaults to a
local, catalog-free session tuned for the test harness, with AQE enabled
(runtime re-plan, skew-join handling, partition coalescing — the 100 TB
levers).
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cdc_data_lake_pyspark_spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    # LocalLake DSv2 catalog (executable MERGE INTO / DELETE without an
    # Iceberg/Delta runtime): compile lazily and put the classes on the
    # driver classpath BEFORE the JVM starts. No-op without a JDK.
    locallake_cp = None
    try:
        from cdc_data_lake_pyspark_spark.catalog import ensure_compiled

        locallake_cp = ensure_compiled()
    except Exception:  # pragma: no cover - compile failure is non-fatal
        pass
    # Spark's driver-memory default is 1g; in local[N] the driver JVM IS
    # the executor, so N concurrent hash-agg/shuffle tasks at sf>=0.1 can
    # OOM it (the round-3 bench crash class). Size the heap explicitly —
    # overridable for the constrained-memory regression test.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # JDK unified-logging GC warnings print to STDOUT and can corrupt
        # harnesses that parse our single JSON output line; log4j (stderr)
        # is unaffected by this flag
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
    )
    if locallake_cp:
        builder = builder.config("spark.driver.extraClassPath", locallake_cp)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
