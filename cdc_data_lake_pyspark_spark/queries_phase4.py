"""Phase-4 query inventory: duplicate clustering (connected components),
sequence packing, stratified sampling, and the analytics suite (rollup,
pivot, percentiles, interval join, moving averages, sketches).

Same registry + hash-parity conventions as queries.py: every computed
column aliased identically on both sides, float aggregates bridged through
exact decimals, deterministic tiebreaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.clusters import (
    connected_components,
    dedup_keep_canonical,
)
from cdc_data_lake_pyspark_spark.operators.dedup_text import jaccard_similar_pairs
from cdc_data_lake_pyspark_spark.queries import _t, query

# ---------------------------------------------------------------------------
# Duplicate clustering — connected components over the exact-Jaccard pair
# graph, then canonical-member selection.  The DuckDB oracle resolves the
# same components with a recursive CTE (min reachable node per node).
# ---------------------------------------------------------------------------

# the exact 3-gram Jaccard pair CTEs (same construction as
# queries_phase2._JACCARD_ORACLE, threshold 0.8), left open for composition
_PAIR_CTES = """
toks AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
           i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))) AS sh
  FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM toks
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         count(*) AS common, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), close_pairs AS (
  SELECT a_id, b_id FROM pairs
  WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM close_pairs
  UNION
  SELECT b_id AS src, a_id AS dst FROM close_pairs
), reach(node, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
), comp AS (
  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
)
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT node AS doc_id, cluster_id FROM comp
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate clusters: exact-Jaccard pairs (≥ 0.8) folded into
    connected components via min-label propagation + pointer jumping —
    ``a~b, b~c ⇒ one cluster {{a,b,c}}``.  The oracle resolves the same
    graph with a recursive CTE; both sides emit cluster_id = min member."""
    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_similar_pairs(docs, threshold=0.8).select("a_id", "b_id")
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@query(
    "dedup_keep_canonical",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES}
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)
    """,
)
def dedup_keep_canonical_q(spark, sf_dir):
    """The deduplicated corpus: per near-duplicate cluster keep only the
    minimum-id member; unpaired docs survive.  Anti-join of the corpus
    against the (small) drop set — broadcasts under AQE."""
    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_similar_pairs(docs, threshold=0.8).select("a_id", "b_id")
    return dedup_keep_canonical(docs, pairs).select("doc_id", "lang")
