"""Connect-safe schema inference (VERDICT r4 item 5).

``infer_json_schema`` / ``infer_and_parse_json`` lean on py4j private
APIs (``spark._jvm``, ``_jdf``) for the zero-copy JVM inference path,
with a documented RDD fallback for Spark Connect / API drift.  Force the
fallback and assert BOTH paths produce identical schemas and rows, so an
API change can't silently alter inference semantics.
"""

import pytest
from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.schema import infer_and_parse_json, infer_json_schema

ROWS = [
    Row(ts=1, j='{"a": 1, "b": "x"}'),
    Row(ts=2, j='{"a": null, "c": 2.5}'),
    Row(ts=3, j='{"a": 7, "b": "y", "c": 1.0}'),
    Row(ts=4, j=None),  # null payloads are filtered before inference
]


class _JvmBoom:
    """Shims spark._jvm: the bare ``org`` package walk the primary
    inference path starts with fails (recording the attempt — proof the
    fallback actually ran), while PySpark-internal accesses (dotted
    single-name getattrs like the error-origin helper) pass through to
    the real gateway."""

    touched = False

    def __init__(self, real):
        self.__dict__["_real"] = real

    def __getattr__(self, name):
        if name == "org":
            type(self).touched = True
            raise RuntimeError("forced py4j failure (simulated connect mode)")
        return getattr(self._real, name)


def test_infer_schema_fallback_identical(spark, monkeypatch):
    df = spark.createDataFrame(ROWS)
    primary = infer_json_schema(df, "j")
    _JvmBoom.touched = False
    monkeypatch.setattr(spark, "_jvm", _JvmBoom(spark._jvm), raising=False)
    fallback = infer_json_schema(df, "j")
    assert _JvmBoom.touched
    assert fallback == primary
    # sampled mode (reference's first-row behavior) too
    monkeypatch.undo()
    primary1 = infer_json_schema(df, "j", sample_rows=1)
    monkeypatch.setattr(spark, "_jvm", _JvmBoom(spark._jvm), raising=False)
    assert infer_json_schema(df, "j", sample_rows=1) == primary1


def test_infer_and_parse_fallback_identical(spark, monkeypatch):
    df = spark.createDataFrame(ROWS)

    def snapshot(out):
        return out.schema, sorted((tuple(r) for r in out.collect()), key=repr)

    primary = snapshot(infer_and_parse_json(df, "j", keep_cols=["ts"]))
    primary_bare = snapshot(infer_and_parse_json(df, "j"))
    _JvmBoom.touched = False
    monkeypatch.setattr(spark, "_jvm", _JvmBoom(spark._jvm), raising=False)
    assert snapshot(infer_and_parse_json(df, "j", keep_cols=["ts"])) == primary
    assert snapshot(infer_and_parse_json(df, "j")) == primary_bare
    assert _JvmBoom.touched
