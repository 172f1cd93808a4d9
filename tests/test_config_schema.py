import json

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from cdc_data_lake_pyspark_spark.config import (
    DEFAULT_PRIMARY_KEY,
    TableConfig,
    load_tables_config,
)
from cdc_data_lake_pyspark_spark.schema import (
    align_to_schema,
    cast_timestamp_fields,
    infer_json_schema,
    merge_schemas,
)


def test_load_tables_config_shapes(tmp_path):
    entries = [
        {
            "db": "testdb",
            "table": "orders",
            "primary_key": "o_orderkey",
            "format-version": 2,
            "write.merge.mode": "copy-on-write",
            "timestamp.fields": ["o_orderdate"],
            "precombine_key": "ts_ms",
        },
        {"db": "testdb", "table": "lineitem", "primary_key": "l_orderkey,l_linenumber"},
    ]
    # list, JSON string, and file path all load identically
    p = tmp_path / "tables.json"
    p.write_text(json.dumps(entries))
    for source in (entries, json.dumps(entries), str(p)):
        cfg = load_tables_config(source)
        orders = cfg.get("testdb", "orders")
        assert orders.primary_keys == ["o_orderkey"]
        assert orders.timestamp_fields == ("o_orderdate",)
        li = cfg.get("testdb", "lineitem")
        assert li.primary_keys == ["l_orderkey", "l_linenumber"]  # composite split


def test_missing_table_falls_back_to_default_pk():
    cfg = load_tables_config([])
    t = cfg.get("db", "nope")
    assert t.primary_key == DEFAULT_PRIMARY_KEY  # reference :223 landmine


def test_infer_json_schema_whole_slice_beats_first_row(spark):
    rows = [
        Row(after='{"id": 1, "maybe": null}'),
        Row(after='{"id": 2, "maybe": 7}'),
    ]
    df = spark.createDataFrame(rows)
    whole = infer_json_schema(df, "after")
    assert dict((f.name, f.dataType.simpleString()) for f in whole.fields)["maybe"] == "bigint"
    first = infer_json_schema(df, "after", sample_rows=1)
    # reference behavior: null-in-sample column typed unusably
    assert dict((f.name, f.dataType.simpleString()) for f in first.fields)["maybe"] != "bigint"


def test_align_to_schema_order_types_and_extras(spark):
    df = spark.createDataFrame([Row(b="2", a=1, extra="x")])
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("c", T.StringType()),
        ]
    )
    out = align_to_schema(df, target)
    assert out.columns == ["a", "b", "c", "extra"]
    row = out.collect()[0]
    assert row.b == 2 and row.c is None and row.extra == "x"


def test_merge_schemas_appends_new_fields():
    base = T.StructType([T.StructField("a", T.LongType())])
    inc = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.DoubleType())]
    )
    merged = merge_schemas(base, inc)
    assert [f.name for f in merged.fields] == ["a", "b"]
    assert merged.fields[0].dataType == T.LongType()  # base type wins


def test_cast_timestamp_fields_skips_missing(spark):
    df = spark.createDataFrame([Row(ts="2026-01-15 10:30:00.123456", v=1)])
    out = cast_timestamp_fields(df, ["ts", "not_there"])
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.collect()[0].ts.microsecond == 123456
