"""Phase-7 inventory: record linkage, robust anomaly gating, iterative
PageRank, and hopping-window rollups.

Four operator families a 100 TB lakehouse still needed after phase 6:

* entity resolution (blocked candidate generation + bounded edit
  distance — the Fellegi-Sunter two-phase shape, linkage.py);
* robust per-group outlier detection (median/MAD modified z-score,
  Iglewicz & Hoaglin 1993 — quality.py), the anomaly gate that survives
  heavy-tailed value columns where mean/stddev drowns;
* fixed-point integer PageRank over the co-purchase graph (graph.py) —
  the canonical iterative distributed algorithm, oracle-replayed by
  UNROLLING the iterations into chained SQL CTEs (recursive CTEs cannot
  re-aggregate per step); the integer micro-unit schedule makes every
  iteration bit-exact in any engine, the same bridge the LM scorers use;
* hopping (sliding) window aggregation (relational.py), the batch
  replay of Structured Streaming's ``F.window(ts, win, slide)`` so
  backfill and live stream agree bucket-for-bucket.

All four are exact-oracle-checked: edit distances and rank selections
are integers, PageRank is integer fixed-point, and the hop totals use
the DECIMAL(18,6) sum bridge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.graph import (
    pagerank,
    pagerank_oracle_sql,
)
from cdc_data_lake_pyspark_spark.queries import _t, query

#: Co-purchase edge list shared by the Spark query and the oracle: parts
#: appearing together in >= 2 orders (the frequent_part_pairs output),
#: symmetrized to a directed edge per direction.
_COPURCHASE_EDGES_SQL = """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey FROM items GROUP BY l_partkey
      HAVING count(*) >= 2
    ), pruned AS (
      SELECT i.l_orderkey, i.l_partkey FROM items i
      JOIN freq USING (l_partkey)
    ), und AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
      FROM pruned a JOIN pruned b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT item_a AS src, item_b AS dst FROM und
    UNION ALL
    SELECT item_b AS src, item_a AS dst FROM und
"""


@query(
    "entity_resolution_customers",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS text_a, b.c_name AS text_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist,
           1.0 - CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE)
                 / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)
             AS name_sim,
           a.c_mktsegment AS c_mktsegment_a,
           b.c_mktsegment AS c_mktsegment_b
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND substr(a.c_name, 1, 12) = substr(b.c_name, 1, 12)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def entity_resolution_customers(spark, sf_dir):
    """Record linkage over the customer table: candidate pairs blocked on
    (nation, 12-char name prefix), verified with a threshold-bounded
    Levenshtein (<= 2 edits) plus a normalized name similarity and the
    segment agreement the downstream match scorer would consume.

    The blocking key is the shuffle key — candidate volume is
    sum-over-blocks of block_size², never corpus², and the builtin
    ``levenshtein(l, r, threshold)`` early-exits its DP at the bound so
    per-pair cost is O(len·threshold).  No UDFs."""
    from cdc_data_lake_pyspark_spark.operators.linkage import (
        blocked_edit_pairs,
    )

    cust = _t(spark, sf_dir, "customer")
    return blocked_edit_pairs(
        cust,
        id_col="c_custkey",
        text_col="c_name",
        block_cols=["c_nationkey"],
        prefix_len=12,
        max_edit=2,
        carry_cols=["c_mktsegment"],
    )


@query(
    "outlier_mad_events",
    oracle="""
    WITH ranked AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(value AS DOUBLE)) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type,
             max(CASE WHEN rn = CAST(ceiling(0.5 * n) AS BIGINT)
                 THEN v END) AS med
      FROM ranked GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, abs(CAST(e.value AS DOUBLE) - m.med) AS d,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY abs(CAST(e.value AS DOUBLE) - m.med))
               AS rn,
             count(*) OVER (PARTITION BY e.event_type) AS n
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type,
             max(CASE WHEN rn = CAST(ceiling(0.5 * n) AS BIGINT)
                 THEN d END) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
           m.med AS group_median, d.mad AS group_mad,
           0.6745 * (CAST(e.value AS DOUBLE) - m.med) / d.mad AS robust_z
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    WHERE d.mad > 0
      AND abs(0.6745 * (CAST(e.value AS DOUBLE) - m.med) / d.mad) > 3.5
    """,
)
def outlier_mad_events(spark, sf_dir):
    """Robust per-event-type anomaly gate: modified z-score
    ``0.6745·(x − median)/MAD`` over ``events.value``, flagging
    ``|z| > 3.5`` (Iglewicz & Hoaglin).  Both medians are discrete rank
    selections (actual data values), so the whole score is
    bit-reproducible across engines — see ``quality.mad_outliers`` for
    the scale notes (two per-group sort passes + one scoring join)."""
    from cdc_data_lake_pyspark_spark.operators.quality import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(
        ev,
        value_col="value",
        group_cols=["event_type"],
        threshold=3.5,
        id_cols=["event_id"],
    ).select(
        "event_id",
        "event_type",
        "value",
        "group_median",
        "group_mad",
        "robust_z",
    )


@query(
    "pagerank_parts",
    oracle=pagerank_oracle_sql(_COPURCHASE_EDGES_SQL, iterations=6),
)
def pagerank_parts(spark, sf_dir):
    """PageRank centrality over the part co-purchase graph (edges =
    frequent part pairs, symmetrized): 6 fixed iterations of integer
    fixed-point PageRank (graph.py).  Each iteration is one join of the
    rank vector against the staged edge list plus one shuffle (the sum
    per destination); rank mass is integer micro-units so the oracle —
    the same schedule unrolled into chained SQL CTEs — is bit-exact.

    This is the host/document quality-ranking shape (Common-Crawl-style
    link centrality) applied to the co-purchase graph the mining
    operators already produce."""
    from cdc_data_lake_pyspark_spark.operators.mining import frequent_pairs

    li = _t(spark, sf_dir, "lineitem")
    und = frequent_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", min_support=2
    ).select("item_a", "item_b")
    edges = und.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        und.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    return pagerank(edges, iterations=6)


@query(
    "hopping_window_events",
    oracle="""
    WITH hops AS (
      SELECT e.event_type, e.ts, e.value,
             unnest(generate_series(
               time_bucket(INTERVAL 1 HOUR, e.ts) - INTERVAL 2 HOUR,
               time_bucket(INTERVAL 1 HOUR, e.ts),
               INTERVAL 1 HOUR)) AS hop_start
      FROM events e
    )
    SELECT event_type, hop_start, hop_start + INTERVAL 3 HOUR AS hop_end,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM hops
    WHERE ts >= hop_start AND ts < hop_start + INTERVAL 3 HOUR
    GROUP BY 1, 2, 3
    """,
)
def hopping_window_events(spark, sf_dir):
    """Hopping-window rollup: per event type, the count and exact total
    of ``value`` in every epoch-aligned 3-hour window sliding each hour
    — each event lands in 3 overlapping windows, replicated inside
    codegen by ``F.window`` (no explicit explode) and aggregated with
    one map-side-combined shuffle.  This is the batch replay of the
    streaming layer's windowed counts, so backfill and live stream agree
    bucket-for-bucket; totals ride the DECIMAL(18,6) exact-sum bridge."""
    from cdc_data_lake_pyspark_spark.operators.relational import (
        hopping_window_agg,
    )

    ev = _t(spark, sf_dir, "events")
    return hopping_window_agg(
        ev,
        ts_col="ts",
        window="3 hours",
        slide="1 hour",
        group_cols=["event_type"],
        value_col="value",
    )


@query(
    "sparse_cosine_docs",
    oracle="""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
    ), ex AS (
      SELECT doc_id AS doc, unnest(string_split(lower(text), ' ')) AS token
      FROM base
    ), tf AS (
      SELECT doc, token, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM base
    ), idf AS (
      SELECT token,
             CAST(round(1000 * log2(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)),
                        0) AS BIGINT) AS idf
      FROM df CROSS JOIN n
    ), w AS (
      SELECT tf.doc, tf.token, tf.tf * idf.idf AS w
      FROM tf JOIN idf USING (token) WHERE idf.idf > 0
    ), norms AS (
      SELECT doc, sum(w * w) AS n2 FROM w GROUP BY 1
    ), dots AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM w a JOIN w b ON a.token = b.token AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT d.doc_a, d.doc_b, d.dot,
           CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS cosine
    FROM dots d JOIN norms na ON na.doc = d.doc_a
                JOIN norms nb ON nb.doc = d.doc_b
    WHERE CAST(d.dot AS DOUBLE)
            / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          >= 0.85
    """,
)
def sparse_cosine_docs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join (sparse_sim.py): document
    pairs with bag-of-words cosine >= 0.85, dot products as exact
    BIGINTs over milli-log2 idf weights so the candidate stage, the
    pair sums and the final cosines replay bit-for-bit in any engine.

    Demo slice: every 7th document (the synthetic corpus has a 31-token
    vocabulary, so the df ceiling — the operator's scale lever on
    Zipfian corpora — prunes nothing here and the slice bounds the
    candidate join instead; ubiquitous df == N tokens are still dropped
    by the idf > 0 prune)."""
    from cdc_data_lake_pyspark_spark.operators.sparse_sim import (
        sparse_cosine_pairs,
    )

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    )
    return sparse_cosine_pairs(docs, threshold=0.85)
