from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.apply import (
    build_create_table_sql,
    build_delete_sql,
    build_merge_sql,
    delete_matching,
    merge_into,
)
from cdc_data_lake_pyspark_spark.config import TableConfig


def test_merge_into_upsert_semantics(spark):
    target = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]
    )
    updates = spark.createDataFrame([Row(id=2, v="B2"), Row(id=4, v="d")])
    out = {r.id: r.v for r in merge_into(target, updates, ["id"]).collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_merge_into_composite_key(spark):
    target = spark.createDataFrame([Row(a=1, b=1, v="x"), Row(a=1, b=2, v="y")])
    updates = spark.createDataFrame([Row(a=1, b=2, v="Y"), Row(a=2, b=1, v="z")])
    out = {(r.a, r.b): r.v for r in merge_into(target, updates, ["a", "b"]).collect()}
    assert out == {(1, 1): "x", (1, 2): "Y", (2, 1): "z"}


def test_merge_into_ts_guard_rejects_stale(spark):
    target = spark.createDataFrame([Row(id=1, v="new", ts=100), Row(id=2, v="b", ts=10)])
    updates = spark.createDataFrame(
        [Row(id=1, v="stale", ts=50), Row(id=2, v="B", ts=20), Row(id=3, v="c", ts=5)]
    )
    out = {r.id: (r.v, r.ts) for r in merge_into(target, updates, ["id"], ts_guard="ts").collect()}
    # id=1: stale update loses; id=2: newer update wins; id=3: not matched → insert
    assert out == {1: ("new", 100), 2: ("B", 20), 3: ("c", 5)}


def test_merge_into_ts_guard_tie_prefers_update(spark):
    target = spark.createDataFrame([Row(id=1, v="old", ts=100)])
    updates = spark.createDataFrame([Row(id=1, v="tie", ts=100)])
    out = merge_into(target, updates, ["id"], ts_guard="ts").collect()
    assert out[0].v == "tie"


def test_delete_matching(spark):
    target = spark.createDataFrame([Row(id=i, v=str(i)) for i in range(5)])
    deletes = spark.createDataFrame([Row(id=1), Row(id=3), Row(id=99)])
    out = sorted(r.id for r in delete_matching(target, deletes, ["id"]).collect())
    assert out == [0, 2, 4]


def test_merge_sql_text():
    sql = build_merge_sql("glue.db.t", "global_temp.src", ["k1", "k2"])
    assert sql == (
        "MERGE INTO glue.db.t t USING global_temp.src u "
        "ON t.`k1` = u.`k1` AND t.`k2` = u.`k2` "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_sql_with_guard():
    sql = build_merge_sql("c.d.t", "v", ["id"], ts_guard="ts_ms")
    assert "WHEN MATCHED AND u.`ts_ms` >= t.`ts_ms` THEN UPDATE SET *" in sql


def test_delete_sql_text():
    sql = build_delete_sql("c.d.t", "v", ["id"])
    assert sql == (
        "DELETE FROM c.d.t t1 WHERE EXISTS "
        "(SELECT u.`id` FROM v u WHERE t1.`id` = u.`id`)"
    )


def test_create_table_sql_properties():
    cfg = TableConfig(db="db", table="t", merge_mode="merge-on-read")
    sql = build_create_table_sql(cfg, "glue", "id BIGINT, v STRING")
    assert "CREATE TABLE IF NOT EXISTS glue.db.t (id BIGINT, v STRING) USING iceberg" in sql
    assert "'format-version'='2'" in sql
    assert "'write.merge.mode'='merge-on-read'" in sql
    assert "'write.distribution-mode'='hash'" in sql
    assert "'write.spark.accept-any-schema'='true'" in sql
