import json

from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.envelope import (
    cast_value_to_string,
    parse_debezium,
    parse_dms,
)


def _debezium_value(op="c", db="testdb", table="orders", after=None, before=None, ts=1):
    return json.dumps(
        {
            "before": json.dumps(before) if before is not None else None,
            "after": json.dumps(after) if after is not None else None,
            "source": json.dumps({"db": db, "table": table}),
            "op": op,
            "ts_ms": ts,
            "transaction": None,
        }
    )


def test_parse_debezium_roundtrip(spark):
    rows = [
        Row(value=_debezium_value(op="c", after={"id": 1, "v": "a"}, ts=10)),
        Row(value=_debezium_value(op="u", after={"id": 1, "v": "b"}, ts=11)),
        Row(value=_debezium_value(op="d", before={"id": 1, "v": "b"}, ts=12)),
        Row(value=_debezium_value(op="r", after={"id": 2, "v": "x"}, table="c2", ts=13)),
    ]
    df = spark.createDataFrame(rows)
    out = parse_debezium(df).collect()
    assert [r.op for r in out] == ["c", "u", "d", "r"]
    assert out[0].db == "testdb" and out[0].table == "orders"
    assert json.loads(out[0].after) == {"id": 1, "v": "a"}
    assert out[2].after is None and json.loads(out[2].before)["v"] == "b"
    assert out[3].table == "c2"
    assert [r.ts_ms for r in out] == [10, 11, 12, 13]


def _dms_value(operation="insert", data=None, table="orders", ts="2026-01-15T10:30:00.123Z"):
    return json.dumps(
        {
            "data": json.dumps(data or {"id": 1}),
            "metadata": {
                "timestamp": ts,
                "record-type": "data",
                "operation": operation,
                "partition-key-type": "primary-key",
                "schema-name": "testdb",
                "table-name": table,
                "transaction-id": 5,
            },
        }
    )


def test_parse_dms_ops_and_images(spark):
    rows = [
        Row(value=_dms_value("load", {"id": 1})),
        Row(value=_dms_value("insert", {"id": 2})),
        Row(value=_dms_value("update", {"id": 2, "v": 9})),
        Row(value=_dms_value("delete", {"id": 1})),
    ]
    out = parse_dms(spark.createDataFrame(rows)).collect()
    assert [r.op for r in out] == ["r", "c", "u", "d"]
    # delete carries the row image in `before`, others in `after`
    assert out[3].after is None and json.loads(out[3].before) == {"id": 1}
    assert out[1].before is None and json.loads(out[1].after) == {"id": 2}
    assert out[0].db == "testdb" and out[0].table == "orders"
    assert out[0].ts_ms > 1_700_000_000_000


def test_dms_control_records_dropped(spark):
    ctrl = json.dumps(
        {
            "data": None,
            "metadata": {
                "timestamp": "2026-01-15T10:30:00Z",
                "record-type": "control",
                "operation": "create-table",
                "schema-name": "testdb",
                "table-name": "orders",
            },
        }
    )
    rows = [Row(value=ctrl), Row(value=_dms_value("insert", {"id": 1}))]
    out = parse_dms(spark.createDataFrame(rows)).collect()
    assert len(out) == 1 and out[0].op == "c"


def test_cast_value_to_string(spark):
    df = spark.createDataFrame([Row(value=bytearray(b"abc"))])
    assert cast_value_to_string(df).collect()[0].value == "abc"
