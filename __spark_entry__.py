"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator inventory with
DuckDB oracles (see cdc_data_lake_pyspark_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_data_lake_pyspark_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.cdc_orders_apply(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
