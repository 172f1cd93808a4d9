"""Deterministic CDC envelope fixtures derived from the driver's tables.

Implements FIXTURES.md §B: Debezium/DMS envelope streams built from
``orders``/``customer`` parquet with arithmetic-only rules so the final
table state is SELECT-expressible in ANSI SQL (the DuckDB oracle, §B4).

Rules (seeded by ``o_orderkey``; T0 = 1_700_000_000_000):

* every order emits a snapshot read ``r`` at ``ts_ms = T0 + key``;
* keys with ``key % 10 IN (7, 8)`` also emit an update ``u`` at
  ``T0 + key + 1000`` with ``o_totalprice * 1.1``;
* keys with ``key % 20 == 7`` emit a SECOND update at ``T0 + key + 2000``
  with ``o_totalprice * 1.2`` (within-batch duplicate → exercises the
  latest-per-key dedup, reference ``transaction_log_util.py:264-273``);
* keys with ``key % 10 == 9`` emit a delete ``d`` at ``T0 + key + 3000``.

Final state (the oracle): all orders except ``key % 10 == 9``, with
``o_totalprice`` = ``*1.2`` if ``key % 20 == 7`` else ``*1.1`` if
``key % 10 IN (7, 8)`` else unchanged.  All arithmetic is double-precision
in both engines, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

T0 = 1_700_000_000_000

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _orders_payload_json(price_col: F.Column) -> F.Column:
    """Row image as a JSON string (timestamps as strings, exercising the
    configured ``timestamp.fields`` cast path)."""
    return F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            price_col.alias("o_totalprice"),
            F.date_format("o_orderdate", _TS_FMT).alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
    )


def _envelope(after: F.Column, before: F.Column, op: str, ts_ms: F.Column) -> F.Column:
    """Debezium envelope JSON: ``before``/``after``/``source`` are
    themselves JSON *strings* inside the envelope (reference schema keeps
    them StringType, ``transaction_log_util.py:60-67``)."""
    source = F.to_json(
        F.struct(F.lit("testdb").alias("db"), F.lit("orders").alias("table"))
    )
    return F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            source.alias("source"),
            F.lit(op).alias("op"),
            ts_ms.alias("ts_ms"),
            F.lit(None).cast("string").alias("transaction"),
        )
    )


def debezium_orders_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ``value:string`` column of Debezium envelopes over ``orders``."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    key = F.col("o_orderkey")
    null_s = F.lit(None).cast("string")

    reads = orders.select(
        _envelope(
            _orders_payload_json(F.col("o_totalprice")), null_s, "r", F.lit(T0) + key
        ).alias("value")
    )
    u1 = orders.filter((key % 10).isin(7, 8)).select(
        _envelope(
            _orders_payload_json(F.col("o_totalprice") * 1.1),
            null_s,
            "u",
            F.lit(T0) + key + 1000,
        ).alias("value")
    )
    u2 = orders.filter(key % 20 == 7).select(
        _envelope(
            _orders_payload_json(F.col("o_totalprice") * 1.2),
            null_s,
            "u",
            F.lit(T0) + key + 2000,
        ).alias("value")
    )
    deletes = orders.filter(key % 10 == 9).select(
        _envelope(
            null_s, _orders_payload_json(F.col("o_totalprice")), "d", F.lit(T0) + key + 3000
        ).alias("value")
    )
    return reads.unionAll(u1).unionAll(u2).unionAll(deletes)


def dms_orders_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same change stream in the AWS DMS wire format (FIXTURES.md §B2)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    key = F.col("o_orderkey")

    def env(data: F.Column, operation: str, ts_ms: F.Column) -> F.Column:
        ts_str = F.date_format(
            F.timestamp_millis(ts_ms), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        )
        meta = F.struct(
            ts_str.alias("timestamp"),
            F.lit("data").alias("record-type"),
            F.lit(operation).alias("operation"),
            F.lit("primary-key").alias("partition-key-type"),
            F.lit("testdb").alias("schema-name"),
            F.lit("orders").alias("table-name"),
            key.alias("transaction-id"),
        )
        return F.to_json(F.struct(data.alias("data"), meta.alias("metadata")))

    reads = orders.select(
        env(_orders_payload_json(F.col("o_totalprice")), "load", F.lit(T0) + key).alias(
            "value"
        )
    )
    u1 = orders.filter((key % 10).isin(7, 8)).select(
        env(
            _orders_payload_json(F.col("o_totalprice") * 1.1),
            "update",
            F.lit(T0) + key + 1000,
        ).alias("value")
    )
    u2 = orders.filter(key % 20 == 7).select(
        env(
            _orders_payload_json(F.col("o_totalprice") * 1.2),
            "update",
            F.lit(T0) + key + 2000,
        ).alias("value")
    )
    deletes = orders.filter(key % 10 == 9).select(
        env(_orders_payload_json(F.col("o_totalprice")), "delete", F.lit(T0) + key + 3000).alias(
            "value"
        )
    )
    return reads.unionAll(u1).unionAll(u2).unionAll(deletes)


def _customer_payload_json(acctbal_col: F.Column) -> F.Column:
    return F.to_json(
        F.struct(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_nationkey"),
            acctbal_col.alias("c_acctbal"),
            F.col("c_mktsegment"),
        )
    )


def debezium_customer_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Debezium change stream over ``customer``:
    snapshot ``r`` for every row; ``u`` with ``c_acctbal + 50`` where
    ``c_custkey % 7 == 3``; ``d`` where ``c_custkey % 11 == 5``."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    key = F.col("c_custkey")
    null_s = F.lit(None).cast("string")

    def env(after: F.Column, before: F.Column, op: str, ts: F.Column) -> F.Column:
        source = F.to_json(
            F.struct(F.lit("testdb").alias("db"), F.lit("customer").alias("table"))
        )
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                source.alias("source"),
                F.lit(op).alias("op"),
                ts.alias("ts_ms"),
                F.lit(None).cast("string").alias("transaction"),
            )
        )

    reads = customer.select(
        env(_customer_payload_json(F.col("c_acctbal")), null_s, "r", F.lit(T0) + key).alias(
            "value"
        )
    )
    updates = customer.filter(key % 7 == 3).select(
        env(
            _customer_payload_json(F.col("c_acctbal") + 50),
            null_s,
            "u",
            F.lit(T0) + key + 1000,
        ).alias("value")
    )
    deletes = customer.filter(key % 11 == 5).select(
        env(
            null_s,
            _customer_payload_json(F.col("c_acctbal")),
            "d",
            F.lit(T0) + key + 2000,
        ).alias("value")
    )
    return reads.unionAll(updates).unionAll(deletes)


def debezium_multi_table_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One mixed batch carrying BOTH tables' change events — exercises the
    per-(db, table) fan-out (reference's multi-table topic consumption)."""
    return debezium_orders_envelopes(spark, sf_dir).unionAll(
        debezium_customer_envelopes(spark, sf_dir)
    )


#: Expected customer final state (ANSI SQL, FIXTURES.md §B4 style).
CUSTOMER_FINAL_STATE_SQL = """
SELECT
  CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 50 ELSE c_acctbal END AS c_acctbal,
  c_custkey,
  c_mktsegment,
  c_name,
  c_nationkey
FROM customer
WHERE c_custkey % 11 <> 5
"""

#: tables.json-shaped config for the fixture pipeline (FIXTURES.md §B3).
ORDERS_TABLE_CONFIG = [
    {
        "db": "testdb",
        "table": "orders",
        "primary_key": "o_orderkey",
        "format-version": 2,
        "write.merge.mode": "copy-on-write",
        "write.update.mode": "copy-on-write",
        "write.delete.mode": "copy-on-write",
        "timestamp.fields": ["o_orderdate"],
        "precombine_key": "ts_ms",
    }
]

#: Two-table config for the multi-table fan-out fixture.
MULTI_TABLE_CONFIG = ORDERS_TABLE_CONFIG + [
    {
        "db": "testdb",
        "table": "customer",
        "primary_key": "c_custkey",
        "format-version": 2,
        "write.merge.mode": "copy-on-write",
        "write.update.mode": "copy-on-write",
        "write.delete.mode": "copy-on-write",
        "precombine_key": "ts_ms",
    }
]

#: DuckDB/ANSI SQL for the expected final state (FIXTURES.md §B4).
ORDERS_FINAL_STATE_SQL = """
SELECT
  o_custkey,
  o_orderdate,
  o_orderkey,
  o_orderpriority,
  o_orderstatus,
  CASE
    WHEN o_orderkey % 20 = 7 THEN o_totalprice * 1.2
    WHEN o_orderkey % 10 IN (7, 8) THEN o_totalprice * 1.1
    ELSE o_totalprice
  END AS o_totalprice
FROM orders
WHERE o_orderkey % 10 <> 9
"""
