"""Phase-3 query inventory: relational training-pipeline operators —
sessionization, as-of join, deterministic splits, quantile buckets.

Same registry + hash-parity conventions as queries.py / queries_phase2.py.
Every entry here is fully oracle-checked (exact ANSI SQL, no seeded
hashing except the PORTABLE md5 hash that DuckDB reproduces bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import quality_score
from cdc_data_lake_pyspark_spark.operators.relational import (
    asof_join,
    hash_split,
    quantile_buckets,
    sessionize,
)
from cdc_data_lake_pyspark_spark.queries import _t, query

# the 60-bit portable hash, spelled in DuckDB (identical to
# operators.relational.portable_id_hash / dedup_text.portable_token_hash)
_HASH_SQL = (
    "list_reduce(list_transform(generate_series(1, 15), "
    "i -> CAST(strpos('0123456789abcdef', "
    "substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(a, c) -> a * 16 + c)"
)


@query(
    "sessionize_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                          OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1
                     ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS session_seq
    FROM (
      SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    """,
)
def sessionize_events(spark, sf_dir):
    """Gap sessionization (30-minute inactivity) over the event stream —
    lag → flag → running sum, one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sessionize(ev, key_col="user_id", ts_col="ts", gap="30 minutes").select(
        "event_id", "user_id", "session_seq"
    )


@query(
    "asof_join_orders",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey,
             arg_max(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey, o.o_totalprice, o.o_orderdate AS asof_ts
    FROM events e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_orders(spark, sf_dir):
    """As-of join: each event picks the user's most recent order at-or-
    before the event time (LEFT OUTER semantics — no prior order → nulls).
    DuckDB's native ASOF JOIN is the oracle; the Spark side is the
    union-and-window carry-forward (one shuffle, no range-join blowup).
    The right side is deduped to one row per (key, ts) with max_by so both
    engines resolve equal-timestamp ties identically."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice", "asof_ts")


@query(
    "split_assignment",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_HASH_SQL} % 100 < 80 THEN 'train'
                WHEN {_HASH_SQL} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_assignment(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split from the portable id
    hash — reproducible across engines, runs, and partitionings (what
    randomSplit is not).  Map-only, no shuffle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs, id_col="doc_id").select("doc_id", "split")


@query(
    "quality_deciles",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             0.5 * least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
           + 0.4 * (CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE))
           + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE)) AS quality
      FROM documents
    )
    SELECT doc_id, lang, quality,
           ntile(10) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS bucket
    FROM scored
    """,
)
def quality_deciles(spark, sf_dir):
    """Per-language quality deciles (curriculum-mixing shape): exact
    ntile bucketing with a doc_id tiebreak, one shuffle on lang."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )
    return quantile_buckets(
        scored, value_col="quality", n_buckets=10, partition_cols=["lang"]
    ).select("doc_id", "lang", "quality", "bucket")
