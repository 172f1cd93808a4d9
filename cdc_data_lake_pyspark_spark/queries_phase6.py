"""Phase-6 inventory: bucketed range join, hypertable gap-fill rollup,
DSIR importance weighting, token-entropy gating, snapshot
change-data-feed diff, and behavioral mining.

Training-data / time-series / analytics additions beyond the
reference's scope (§2.6 surface): the two temporal operators Spark
lacks natively (range join without a nested-loop degenerate;
TimescaleDB-style ``time_bucket_gapfill`` + LOCF), importance
resampling weights for targeted data selection (Xie et al. 2023), the
within-document token-entropy diversity gate, an insert/update/delete
changelog recovered from two snapshots (Delta/Iceberg CDF shape), a
first-order Markov event-transition matrix, Apriori-pruned
market-basket frequent pairs, degree-oriented triangle enumeration,
Okapi BM25 keyword retrieval, and the point-in-time feature join
(SCD2 + as-of composition).  All are exact-oracle-checkable: the range join is an inner equi+
residual join, the gapfill sums decimals, and the DSIR weights use the
micro-log2 integer bridge shared with the LM scorers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.queries import _t, query

_HOUR_S = 3600


@query(
    "range_join_view_purchase",
    oracle="""
    SELECT v.view_id, v.view_user, v.view_ts,
           p.purchase_id, p.purchase_ts, p.purchase_value
    FROM (SELECT event_id AS view_id, user_id AS view_user, ts AS view_ts
          FROM events WHERE event_type = 'view') v
    JOIN (SELECT event_id AS purchase_id, user_id AS purchase_user,
                 ts AS purchase_ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase') p
      ON p.purchase_user = v.view_user
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts < v.view_ts + INTERVAL 1 HOUR
    """,
)
def range_join_view_purchase(spark, sf_dir):
    """Range (interval) join: every purchase a user makes within one hour
    after each of their page views — the temporal-window attribution
    shape Spark would otherwise plan as a key-equi join with a residual
    time predicate (degenerating to all in-key pairs on hot keys).
    ``relational.range_join`` rewrites it as a bucketed equi join: left
    rows explode to their <= 2 covering hour-buckets, right rows hash to
    exactly one, so candidates are bounded per (key, bucket) and the join
    stays a plain shuffle join at any scale."""
    from cdc_data_lake_pyspark_spark.operators.relational import range_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return range_join(
        views,
        purchases,
        left_key="view_user",
        right_key="purchase_user",
        left_ts="view_ts",
        right_ts="purchase_ts",
        lower_s=0,
        upper_s=_HOUR_S,
    ).select(
        "view_id",
        "view_user",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


@query(
    "daily_gapfill_locf",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('day', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    ), b AS (
      SELECT min(bucket) AS mn, max(bucket) AS mx FROM agg
    ), spine AS (
      SELECT unnest(generate_series((SELECT mn FROM b), (SELECT mx FROM b),
                                    INTERVAL 1 DAY)) AS bucket
    ), dense AS (
      SELECT g.event_type, s.bucket
      FROM (SELECT DISTINCT event_type FROM agg) g CROSS JOIN spine s
    )
    SELECT d.event_type, d.bucket,
           COALESCE(a.n_rows, 0) AS n_rows,
           a.total,
           last_value(a.total IGNORE NULLS) OVER (
             PARTITION BY d.event_type ORDER BY d.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS total_locf,
           a.n_rows IS NULL AS filled
    FROM dense d LEFT JOIN agg a USING (event_type, bucket)
    """,
)
def daily_gapfill_locf(spark, sf_dir):
    """Hypertable rollup with gap filling: daily value totals per event
    type, densified onto the corpus-wide day spine with
    last-observation-carried-forward (TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` semantics).  The fact table is
    scanned once (map-side combined aggregation); the spine and group
    keys are tiny broadcasts and the LOCF window runs over
    #groups x #days rows (relational.time_bucket_gapfill)."""
    from cdc_data_lake_pyspark_spark.operators.relational import (
        time_bucket_gapfill,
    )

    return time_bucket_gapfill(
        _t(spark, sf_dir, "events"),
        ts_col="ts",
        value_col="value",
        group_cols=("event_type",),
        bucket="1 day",
    )


@query(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m,
             max(tgt) AS is_tgt
      FROM toks GROUP BY doc_id, tok
    ), vocab AS (
      SELECT tok,
             CAST(sum(m) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN is_tgt THEN m ELSE 0 END) AS BIGINT) AS ct
      FROM dt GROUP BY tok
    ), tot AS (
      SELECT
        CAST(round(1e6 * log2(CAST(sum(cr) + count(*) AS DOUBLE)))
          AS BIGINT) AS ltr,
        CAST(round(1e6 * log2(CAST(sum(ct) + count(*) AS DOUBLE)))
          AS BIGINT) AS ltt
      FROM vocab
    ), logs AS (
      SELECT tok,
        CAST(round(1e6 * log2(CAST(cr + 1 AS DOUBLE))) AS BIGINT) AS lcr,
        CAST(round(1e6 * log2(CAST(ct + 1 AS DOUBLE))) AS BIGINT) AS lct
      FROM vocab
    ), per AS (
      SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_tokens,
             CAST(sum(d.m * (l.lct - l.lcr)) AS BIGINT) AS sum_num
      FROM dt d JOIN logs l USING (tok)
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(sum_num - n_tokens * ((SELECT ltt FROM tot)
                                      - (SELECT ltr FROM tot))
             AS BIGINT) AS logratio_micro,
           CAST(CAST(sum_num - n_tokens * ((SELECT ltt FROM tot)
                                           - (SELECT ltr FROM tot))
                  AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE) * 1e6) AS DOUBLE)
             AS avg_logratio
    FROM per
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): per-document
    log-likelihood ratio of a target-domain unigram LM (here the
    ``lang = 'en'`` slice as the in-domain exemplar set) over the
    raw-corpus LM, with add-one smoothing over the shared vocabulary —
    the data-selection score behind importance resampling toward a
    target domain.  Integer micro-log2 bridge makes the weights exact
    across engines (operators/lm_quality.py::importance_weights)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        importance_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    return importance_weights(docs, is_target=F.col("lang") == "en")


@query(
    "token_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m
      FROM toks GROUP BY doc_id, tok
    ), per AS (
      SELECT doc_id,
             CAST(sum(m) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS distinct_tokens,
             CAST(sum(m * CAST(round(1e6 * log2(CAST(m AS DOUBLE)))
                               AS BIGINT)) AS BIGINT) AS sum_mlm
      FROM dt GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, distinct_tokens,
           CAST(n_tokens * CAST(round(1e6 * log2(CAST(n_tokens AS DOUBLE)))
                                AS BIGINT) - sum_mlm
             AS BIGINT) AS entropy_micro,
           CAST(CAST(n_tokens * CAST(round(1e6 * log2(CAST(n_tokens AS DOUBLE)))
                                     AS BIGINT) - sum_mlm AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE) * 1e6) AS DOUBLE) AS entropy
    FROM per
    """,
)
def token_entropy(spark, sf_dir):
    """Within-document unigram Shannon entropy — the word-diversity
    quality gate (repetitive/templated docs score near 0 bits).  Pure
    per-document aggregation, no corpus-wide join; exact across engines
    via the micro-log2 integer bridge
    (operators/lm_quality.py::token_entropy_scores)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        token_entropy_scores,
    )

    return token_entropy_scores(_t(spark, sf_dir, "documents"))


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'update' END AS change_type,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_orderstatus AS new_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'insert'
               WHEN n.o_orderkey IS NULL THEN 'delete'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                 THEN 'update' END IS NOT NULL
    """,
)
def snapshot_diff_orders(spark, sf_dir):
    """Change-data-feed between two snapshots (Delta/Iceberg CDF shape,
    derived): two deterministic views of ``orders`` stand in for v1/v2 —
    v2 drops every 7th key, v1 lacked every 5th, and every 3rd key's
    price moved — and ``relational.snapshot_diff`` classifies each key
    insert/update/delete via ONE null-safe full outer join on the PK,
    omitting unchanged keys.  The inverse of the CDC apply path: apply
    folds a changelog into a snapshot, this recovers a changelog from
    snapshots (backfill after a non-CDC bulk rewrite)."""
    from cdc_data_lake_pyspark_spark.operators.relational import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH steps AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_state
      FROM events
    ), counts AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
      FROM steps WHERE to_state IS NOT NULL
      GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_state)
                                    AS DOUBLE) AS prob
    FROM counts
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: consecutive (from, to) event-type pairs with counts and
    row-normalized probabilities — the path-analysis aggregate behind
    next-action dashboards (operators/mining.py::transition_matrix; one
    key-partitioned window + a |states|²-group aggregate)."""
    from cdc_data_lake_pyspark_spark.operators.mining import (
        transition_matrix,
    )

    return transition_matrix(_t(spark, sf_dir, "events"))


@query(
    "frequent_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey FROM items GROUP BY l_partkey
      HAVING count(*) >= 2
    ), pruned AS (
      SELECT i.l_orderkey, i.l_partkey FROM items i
      JOIN freq USING (l_partkey)
    )
    SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
           CAST(count(*) AS BIGINT) AS support
    FROM pruned a JOIN pruned b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def frequent_part_pairs(spark, sf_dir):
    """Market-basket frequent pairs: parts co-purchased in at least two
    orders (Apriori first lattice level with the monotonicity prune —
    infrequent singletons never enter the per-basket self-join, so
    candidates are bounded by basket size, not catalog size;
    operators/mining.py::frequent_pairs)."""
    from cdc_data_lake_pyspark_spark.operators.mining import frequent_pairs

    return frequent_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=2,
    )


@query(
    "triangle_part_cliques",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey FROM items GROUP BY l_partkey
      HAVING count(*) >= 2
    ), pruned AS (
      SELECT i.l_orderkey, i.l_partkey FROM items i
      JOIN freq USING (l_partkey)
    ), edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM pruned a JOIN pruned b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT e1.u AS v1, e1.v AS v2, e2.v AS v3
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def triangle_part_cliques(spark, sf_dir):
    """Triangles of the co-purchase graph: 3-cliques of parts pairwise
    co-bought in >= 2 orders — graph-density analytics composed from
    ``frequent_pairs`` edges via the two-join MPC triangle algorithm
    with degree orientation (operators/mining.py::triangle_enumerate;
    wedge candidates bounded O(m^1.5) regardless of hub vertices).  The
    oracle enumerates id-ordered; both emit each triangle once as its
    sorted vertex triple, so the outputs hash-match."""
    from cdc_data_lake_pyspark_spark.operators.mining import (
        frequent_pairs,
        triangle_enumerate,
    )

    edges = frequent_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=2,
    )
    return triangle_enumerate(edges)


@query(
    "bm25_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl
    ), dt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks
      WHERE tok IN ('spark', 'merge', 'window') GROUP BY 1, 2
    ), idf AS (
      SELECT tok,
             CAST(round(1e6 * log2((CAST(s.n AS DOUBLE) - df + 0.5)
                                   / (df + 0.5))) AS BIGINT) AS idf_micro
      FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
           stats s
    ), scored AS (
      SELECT d.doc_id,
             CAST(round(i.idf_micro
                        * ((d.tf * (1.2 + 1.0))
                           / (d.tf + 1.2 * (1.0 - 0.75
                              + 0.75 * (l.dl / s.avgdl)))))
               AS BIGINT) AS s
      FROM dt d JOIN idf i USING (tok) JOIN dl l USING (doc_id), stats s
    ), per AS (
      SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro
      FROM scored GROUP BY 1
    )
    SELECT doc_id, rank, score_micro,
           CAST(score_micro AS DOUBLE) / 1e6 AS score
    FROM (
      SELECT doc_id, score_micro,
             CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
               AS INT) AS rank
      FROM per
    ) WHERE rank <= 10
    """,
)
def bm25_search(spark, sf_dir):
    """Okapi BM25 keyword retrieval: top-10 documents for the query bag
    {spark, merge, window} — the textual counterpart of the embedding
    top-k family.  Per-(doc, term) partial scores quantize to integer
    micro-units (idf via the micro-log2 bridge) before the per-doc sum,
    so the ranking is exact across engines
    (operators/lm_quality.py::bm25_top_k)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import bm25_top_k

    return bm25_top_k(
        _t(spark, sf_dir, "documents"),
        query_terms=["spark", "merge", "window"],
        k=10,
    )


@query(
    "pit_join_views",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, value, ts FROM events
      WHERE event_type = 'purchase'
    ), v2 AS (
      SELECT user_id, value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS INT)
               AS version
      FROM p
    ), views AS (
      SELECT event_id AS view_id, user_id, ts AS view_ts FROM events
      WHERE event_type = 'view'
    )
    SELECT w.view_id, w.user_id, w.view_ts, s.value, s.version,
           s.valid_from AS asof_ts
    FROM views w LEFT JOIN v2 s
      ON s.user_id = w.user_id
     AND s.valid_from <= w.view_ts
     AND (s.valid_to IS NULL OR w.view_ts < s.valid_to)
    """,
)
def pit_join_views(spark, sf_dir):
    """Point-in-time (PIT) join — the feature-store correctness pattern:
    each view event is joined to the purchase-derived SCD2 version that
    was VALID AT the view's timestamp (no future leakage, no stale
    skips).  Because SCD2 intervals tile time contiguously per key, the
    PIT join reduces to an as-of join on ``valid_from`` — the
    union-and-window composition (one key shuffle, NO range join),
    composing ``relational.scd2_history`` + ``relational.asof_join``;
    the oracle replays it as the explicit validity-interval join."""
    from cdc_data_lake_pyspark_spark.operators.relational import (
        asof_join,
        scd2_history,
    )

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", "ts"
    )
    versions = scd2_history(
        purchases, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select("user_id", "valid_from", "value", "version")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        views,
        versions,
        left_key="user_id",
        right_key="user_id",
        left_ts="view_ts",
        right_ts="valid_from",
        right_cols=["value", "version"],
    ).select("view_id", "user_id", "view_ts", "value", "version", "asof_ts")
