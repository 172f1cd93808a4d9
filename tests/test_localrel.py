"""localrel: JVM-planned local relations for driver-local metadata.

Pins the r16 optimization's two contracts (OPTIMIZATION_r16.md):

* EQUIVALENCE — ``tiny_frame``/``empty_frame`` produce the same schema
  and values as the python-list ``createDataFrame`` they replace, for
  the exact schema shapes the engine's params/manifest/empty-state
  sites use (ints, strings, longs, double arrays, nulls);
* PLAN — the produced frames are JVM ``LocalRelation``s with NO python
  subtree (the list path plans ``parallelize → PythonRDD``, and a write
  job over that was measured to re-pay full Python-daemon startup —
  ~5 s per one-row metadata write on the r16 sandbox).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.localrel import empty_frame, tiny_frame

SCHEMAS_AND_ROWS = [
    # save_minhash_index params
    (
        "num_hashes INT, k INT, bands INT, rows_per_band INT, "
        "bucket_partitions INT",
        [(64, 3, 16, 4, 0)],
    ),
    # gate manifests
    ("batch_id BIGINT", [(7,)]),
    # daily-loop day manifest (fingerprint guard)
    ("_day INT, _fp BIGINT, _rows BIGINT", [(2, 123456789, 1000)]),
    # classifier params
    ("n_buckets INT", [(64,)]),
    # classifier_eval threshold grid
    ("threshold_micro long", [(t,) for t in (0, 250_000, 500_000)]),
    # neardup gate params (mixed int/double-ish)
    (
        "num_hashes INT, k INT, bands INT, rows_per_band INT, "
        "threshold DOUBLE, bucket_partitions INT",
        [(64, 3, 16, 4, 0.8, 8)],
    ),
]


@pytest.mark.parametrize("schema,rows", SCHEMAS_AND_ROWS)
def test_tiny_frame_matches_list_path(spark, schema, rows):
    a = spark.createDataFrame(rows, schema)
    b = tiny_frame(spark, rows, schema)
    assert b.schema == a.schema
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, a.collect()))


def test_tiny_frame_handles_nulls_and_arrays(spark):
    schema = T.StructType(
        [
            T.StructField("x", T.LongType(), True),
            T.StructField("v", T.ArrayType(T.DoubleType()), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    rows = [(1, [1.0, 2.5], "a"), (None, None, None)]
    a = spark.createDataFrame(rows, schema)
    b = tiny_frame(spark, rows, schema)
    assert b.schema == a.schema
    assert sorted(map(str, b.collect())) == sorted(map(str, a.collect()))


@pytest.mark.parametrize("schema,rows", SCHEMAS_AND_ROWS[:3])
def test_empty_frame_matches_list_path(spark, schema, rows):
    a = spark.createDataFrame([], schema)
    b = empty_frame(spark, schema)
    assert b.schema == a.schema
    assert b.count() == 0


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_tiny_frame_plans_as_local_relation(spark):
    df = tiny_frame(spark, [(1,)], "batch_id BIGINT")
    plan = _optimized_plan(df)
    assert "LocalRelation" in plan
    # the whole point: no python evaluation subtree for a literal frame
    assert "PythonRDD" not in plan and "LogicalRDD" not in plan


def test_empty_frame_folds_to_empty_local_relation(spark):
    df = empty_frame(spark, "a INT, b STRING")
    plan = _optimized_plan(df)
    assert "LocalRelation <empty>" in plan
    assert "PythonRDD" not in plan and "LogicalRDD" not in plan


def test_list_path_regression_witness(spark):
    """The shape being replaced really does plan a python subtree —
    if a future Spark makes list createDataFrame JVM-local, this pin
    flags that localrel can be retired."""
    df = spark.createDataFrame([(1,)], "batch_id BIGINT")
    assert "LogicalRDD" in _optimized_plan(df)
