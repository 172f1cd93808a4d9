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
from cdc_data_lake_pyspark_spark.operators.packing import pack_documents
from cdc_data_lake_pyspark_spark.operators.sampling import stratified_sample
from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase3 import _HASH_SQL


def _hash_sql(expr: str) -> str:
    """The 60-bit portable md5 hash of an arbitrary VARCHAR expression,
    spelled in DuckDB (same math as relational.portable_id_hash)."""
    return (
        "list_reduce(list_transform(generate_series(1, 15), "
        f"i -> CAST(strpos('0123456789abcdef', substring(md5({expr}), i, 1)) - 1 AS BIGINT)), "
        "(a, c) -> a * 16 + c)"
    )

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


# ---------------------------------------------------------------------------
# Sequence packing — token-budget bin assignment (greedy first-fit in id
# order within portable-hash groups).  The oracle replays the same greedy
# walk with a recursive CTE advancing one row per group per step.
# ---------------------------------------------------------------------------


@query(
    "pack_sequences",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT doc_id,
             CAST({_HASH_SQL} % 16 AS INT) AS grp,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), seq AS (
      SELECT grp, doc_id, n_tokens,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
      FROM base
    ), rec AS (
      SELECT grp, rn, doc_id, n_tokens,
             CAST(1 AS BIGINT) AS bin, n_tokens AS fill
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.grp, s.rn, s.doc_id, s.n_tokens,
             CASE WHEN r.fill + s.n_tokens <= 512
                  THEN r.bin ELSE r.bin + 1 END,
             CASE WHEN r.fill + s.n_tokens <= 512
                  THEN r.fill + s.n_tokens ELSE s.n_tokens END
      FROM rec r JOIN seq s ON s.grp = r.grp AND s.rn = r.rn + 1
    )
    SELECT grp AS "group", doc_id, n_tokens, bin FROM rec
    """,
)
def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (512-token bins, 16 independent
    hash groups): greedy first-fit in id order inside each group via ONE
    applyInPandas pass — the sequential decision stays per-group-linear
    while groups parallelize freely.  The oracle replays the identical
    greedy walk with a recursive CTE."""
    from cdc_data_lake_pyspark_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_documents(docs, budget=512, n_groups=16)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling — data-mixing rates per language.
# ---------------------------------------------------------------------------

_TICKET_SQL = _hash_sql("lang || '|' || CAST(doc_id AS VARCHAR)")


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang, {_TICKET_SQL} % 1000000 AS ticket FROM documents
    )
    WHERE ticket < CASE lang WHEN 'en' THEN 500000
                             WHEN 'zh' THEN 250000
                             ELSE 100000 END
    """,
)
def stratified_sample_docs(spark, sf_dir):
    """Deterministic data mixing: keep 50% of en, 25% of zh, 10% of the
    rest — the keep decision is a pure function of (stratum, id) via the
    portable hash, so the selected set is identical across engines, runs,
    and partitionings (what sample()/sampleBy() cannot promise).
    Map-only: no shuffle, filter pushes to the scan."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, {"en": 0.5, "zh": 0.25}, default_fraction=0.1
    )
