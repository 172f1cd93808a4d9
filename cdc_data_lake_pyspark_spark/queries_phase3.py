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
    "vocab_top_tokens",
    oracle="""
    SELECT t AS token, CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents)
    GROUP BY t
    ORDER BY n DESC, t ASC
    LIMIT 100
    """,
)
def vocab_top_tokens(spark, sf_dir):
    """Vocabulary building: corpus-wide token frequencies + document
    frequencies, top-100 with a deterministic (count desc, token asc)
    order.  Explode → ONE hash aggregate computing tf and df together
    (count + approx-free distinct via count(distinct) -> two-phase
    aggregate); the top-k is a tiny sorted take, never a full sort at
    scale (Spark plans TakeOrderedAndProject)."""
    from cdc_data_lake_pyspark_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(100)
    )


@query(
    "tfidf_top_term",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM ex GROUP BY doc_id, t
    ), df AS (
      SELECT t, count(DISTINCT doc_id) AS df FROM ex GROUP BY t
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.t, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
      FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
    )
    SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM (
      SELECT doc_id, t, tf, df,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def tfidf_top_term(spark, sf_dir):
    """TF-IDF: each document's highest-scoring term (tf · ln(N/df)) with a
    deterministic tie-break.  Shuffles: one (doc, token) aggregate, one
    token df aggregate (broadcast back onto the tf frame — token
    vocabulary ≪ corpus), one per-doc top-1 window.  The emitted columns
    are the exact integers (tf, df) rather than the float score: ln() is
    not bit-identical across math libraries (JVM vs libm differ in the
    last ulp), so the score ranks internally but stays out of the hash."""
    from cdc_data_lake_pyspark_spark.functions.text import tokens
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    tf = ex.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df = ex.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "t").select(
        "doc_id",
        "t",
        "tf",
        "df",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("t").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("t").alias("term"), "tf", "df")
    )


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
