from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.dedup import latest_change_per_key
from cdc_data_lake_pyspark_spark.router import (
    ROUTE_DELETE,
    ROUTE_INSERT,
    ROUTE_UPSERT,
    route_changes,
    slice_table,
    table_op_inventory,
)


def _changes(spark):
    rows = [
        Row(db="d", table="t1", op="r", ts_ms=1, before=None, after='{"id":1}'),
        Row(db="d", table="t1", op="c", ts_ms=2, before=None, after='{"id":2}'),
        Row(db="d", table="t1", op="u", ts_ms=3, before=None, after='{"id":2,"v":1}'),
        Row(db="d", table="t1", op="d", ts_ms=4, before='{"id":1}', after=None),
        Row(db="d", table="t2", op="c", ts_ms=5, before=None, after='{"id":9}'),
        # malformed routing rows the reference's predicates drop:
        Row(db="d", table="t1", op="c", ts_ms=6, before=None, after=None),
        Row(db="d", table="t1", op="d", ts_ms=7, before=None, after=None),
    ]
    return spark.createDataFrame(rows)


def test_route_predicates(spark):
    routes = route_changes(_changes(spark))
    assert routes[ROUTE_INSERT].count() == 3  # r, c, c(t2); null-after c dropped
    assert routes[ROUTE_UPSERT].count() == 1
    assert routes[ROUTE_DELETE].count() == 1  # null-before d dropped


def test_table_op_inventory_single_pass(spark):
    inv = {(e.db, e.table): e.routes for e in table_op_inventory(_changes(spark))}
    assert inv[("d", "t1")] == {ROUTE_INSERT, ROUTE_UPSERT, ROUTE_DELETE}
    assert inv[("d", "t2")] == {ROUTE_INSERT}


def test_slice_table(spark):
    assert slice_table(_changes(spark), "d", "t2").count() == 1


def _dup_rows(spark):
    rows = [
        Row(k1=1, k2="a", ts_ms=1, v="old"),
        Row(k1=1, k2="a", ts_ms=3, v="new"),
        Row(k1=1, k2="b", ts_ms=2, v="other-key"),
        Row(k1=2, k2="a", ts_ms=1, v="solo"),
    ]
    return spark.createDataFrame(rows)


def test_latest_change_per_key_max_by_and_window_agree(spark):
    df = _dup_rows(spark)
    for method in ("max_by", "window"):
        out = latest_change_per_key(df, ["k1", "k2"], ["ts_ms"], method=method)
        got = {(r.k1, r.k2): r.v for r in out.collect()}
        assert got == {(1, "a"): "new", (1, "b"): "other-key", (2, "a"): "solo"}
        assert out.columns == df.columns


def test_latest_change_tiebreaker(spark):
    rows = [
        Row(k=1, ts_ms=5, seq=1, v="first"),
        Row(k=1, ts_ms=5, seq=2, v="second"),
    ]
    df = spark.createDataFrame(rows)
    for method in ("max_by", "window"):
        out = latest_change_per_key(df, ["k"], ["ts_ms", "seq"], method=method)
        assert out.collect()[0].v == "second"
