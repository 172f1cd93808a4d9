"""Phase-12 inventory (round 13): the INCREMENTAL embedding-dedup path
(VERDICT r12 missing #3) — the vector counterpart of
``dedup_incremental_minhash`` (queries_phase2.py:903).  The text side
has had the full index-once / probe-daily lifecycle since r12; this
closes the vector side: a daily pipeline dedups NEW embeddings against
yesterday's persisted IVF-PQ index exactly like it probes yesterday's
MinHash index —

    load_ivf_pq_prefit → cell-assign the batch → probe n_probe cells →
    exact-cosine rescore against the indexed corpus → drop ≥ threshold

with the prefit artifact round-tripping parquet INSIDE the entry, so
the persistence lifecycle itself sits under the correctness gate (the
``prepare_web_corpus_incremental`` discipline).

Two entries share ONE oracle: ``dedup_embedding_incremental`` probes
through the persisted QUANTIZER (re-encoding the corpus per run) and
``dedup_embedding_incremental_store`` probes the persisted ENCODED
CORPUS (cell-partitioned, partition-pruned scan — the full artifact a
daily pipeline keeps, with append/compact maintenance mirroring the
MinHash index lifecycle).  Both run the shared ``_score_probed_cells``
cogroup, so their pairs are bit-identical.

The oracle replays the whole probe in DuckDB with the deterministic
coarse quantizer pinned as literals (the ``similarity_ivf`` /
``similarity_ivf_pq`` pattern): cell assignment and probe selection are
``row_number`` replays of the stable argmin/argsort, and every emitted
cosine is the strict sequential fold both engines share.  Recall is
probe-coverage-bound (floor pinned in tests/test_pq.py); precision is 1.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.queries import _t, query

#: cross-split near-dup threshold (exact cosine); the synthetic
#: embeddings' cross-split similarity mass sits in [0.3, 0.5) — 0.4
#: yields a non-degenerate drop set at every SF (checked per-SF by the
#: entry's out_rows and pinned in tests/test_pq.py)
_EMB_ND_THRESHOLD = 0.4

_N_CLUSTERS = 16
_N_PROBE = 4


def _emb_incremental_oracle() -> str:
    """Replay: re-run the deterministic coarse fit on the same
    id-ordered corpus sample the entry uses (``fit_ivf_pq`` orders by
    vec_id over the corpus split), pin the centroids as DOUBLE[]
    literals, then replay assignment (stable argmin), probing (stable
    top-``n_probe``), and the exact-cosine rescore in SQL."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans
    from cdc_data_lake_pyspark_spark.queries_phase2 import (
        _double_array_sql,
        _oracle_sf_dir,
    )

    sf_dir = _oracle_sf_dir()
    pdf = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id % 3 <> 0 ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    centers = fit_kmeans(X, _N_CLUSTERS, seed=42)
    cent_values = ",\n    ".join(
        f"({i}, {_double_array_sql(c)})" for i, c in enumerate(centers)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cent(i, c) AS (
      VALUES {cent_values}
    ), vd AS (
      SELECT e.vec_id, cent.i,
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.c)
               + list_dot_product(cent.c, cent.c) AS d
      FROM e CROSS JOIN cent
    ), cells AS (
      SELECT vec_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 3 <> 0
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS batch_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 3 = 0
      ) WHERE rn <= {_N_PROBE}
    ), cand AS (
      SELECT p.batch_id, cl.vec_id AS index_id
      FROM probes p JOIN cells cl ON cl.cell = p.cell
    ), scored AS (
      SELECT c.batch_id, c.index_id,
             list_dot_product(eb.v, ei.v)
             / (sqrt(list_dot_product(eb.v, eb.v))
              * sqrt(list_dot_product(ei.v, ei.v))) AS cosine
      FROM cand c
      JOIN e eb ON eb.vec_id = c.batch_id
      JOIN e ei ON ei.vec_id = c.index_id
    )
    SELECT batch_id, index_id, cosine
    FROM scored WHERE cosine >= {_EMB_ND_THRESHOLD}
    """


@query("dedup_embedding_incremental", oracle=_emb_incremental_oracle)
def dedup_embedding_incremental(spark, sf_dir):
    """INCREMENTAL embedding dedup
    (operators/similarity.py::ivf_dedup_batch): embeddings with
    ``vec_id % 3 != 0`` form yesterday's indexed corpus — its IVF-PQ
    prefit is fit once, PERSISTED (``save_ivf_pq_prefit``) and RELOADED
    (``load_ivf_pq_prefit``) so today's probe runs against the parquet
    artifact, not in-memory lineage; today's batch (``vec_id % 3 ==
    0``) assigns to its ``n_probe`` nearest cells and every probed-cell
    candidate is exact-cosine rescored, emitting ``(batch_id, index_id,
    cosine)`` at/above threshold — the pairs a daily pipeline anti-joins
    to drop re-embedded near-duplicate content.

    Plan shape at 100 TB: the corpus shuffles ONCE on its cell key (the
    IVF layout — at scale this is the stored index itself, so even that
    shuffle is amortized across days); the batch explodes to n_probe
    cell-keyed rows and cogroups cell-at-a-time; per-batch-vector work
    is n_probe/n_clusters of the corpus.  The ``shortlist`` ADC mode
    bounds the full-precision reads per batch vector via the prefit's
    residual PQ codes (equivalence + recall pinned in
    tests/test_pq.py); the oracled entry runs the exact-rescore mode
    the SQL replays literally."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_ivf_pq,
        ivf_dedup_batch,
        load_ivf_pq_prefit,
        save_ivf_pq_prefit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    work = tempfile.mkdtemp(prefix="emb_incr_")
    try:
        save_ivf_pq_prefit(
            spark,
            fit_ivf_pq(corpus, n_clusters=_N_CLUSTERS, m_sub=8, k=16, seed=42),
            work,
        )
        # the loaded prefit is driver-resident numpy — the parquet
        # artifact is not needed after this line
        prefit = load_ivf_pq_prefit(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return ivf_dedup_batch(
        corpus,
        batch,
        prefit,
        threshold=_EMB_ND_THRESHOLD,
        n_probe=_N_PROBE,
    )


def _vector_gate_oracle() -> str:
    """Replay the streaming vector gate's BATCH REDUCTION: a batch
    vector survives iff no indexed corpus vector in its probed cells
    AND no smaller-id batch vector whose ASSIGNED cell is probed sits
    at/above threshold cosine — the ``(batch, id)``-order seen-earlier
    rule, cross-index and within-batch parts both replayed."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans
    from cdc_data_lake_pyspark_spark.queries_phase2 import (
        _double_array_sql,
        _oracle_sf_dir,
    )

    sf_dir = _oracle_sf_dir()
    pdf = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id % 3 <> 0 ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    centers = fit_kmeans(X, _N_CLUSTERS, seed=42)
    cent_values = ",\n    ".join(
        f"({i}, {_double_array_sql(c)})" for i, c in enumerate(centers)
    )
    cos = (
        "list_dot_product(eb.v, ei.v)"
        " / (sqrt(list_dot_product(eb.v, eb.v))"
        " * sqrt(list_dot_product(ei.v, ei.v)))"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cent(i, c) AS (
      VALUES {cent_values}
    ), vd AS (
      SELECT e.vec_id, cent.i,
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.c)
               + list_dot_product(cent.c, cent.c) AS d
      FROM e CROSS JOIN cent
    ), cells AS (
      SELECT vec_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 3 <> 0
      ) WHERE rn = 1
    ), bcells AS (
      SELECT vec_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 3 = 0
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS batch_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 3 = 0
      ) WHERE rn <= {_N_PROBE}
    ), dropped AS (
      SELECT DISTINCT p.batch_id AS vec_id
      FROM probes p JOIN cells cl ON cl.cell = p.cell
      JOIN e eb ON eb.vec_id = p.batch_id
      JOIN e ei ON ei.vec_id = cl.vec_id
      WHERE {cos} >= {_EMB_ND_THRESHOLD}
      UNION
      SELECT DISTINCT p.batch_id AS vec_id
      FROM probes p JOIN bcells bc
        ON bc.cell = p.cell AND bc.vec_id < p.batch_id
      JOIN e eb ON eb.vec_id = p.batch_id
      JOIN e ei ON ei.vec_id = bc.vec_id
      WHERE {cos} >= {_EMB_ND_THRESHOLD}
    )
    SELECT vec_id FROM e
    WHERE vec_id % 3 = 0 AND vec_id NOT IN (SELECT vec_id FROM dropped)
    """


@query("vector_gate_batch", oracle=_vector_gate_oracle)
def vector_gate_batch(spark, sf_dir):
    """The streaming vector gate's BATCH REDUCTION under the value
    gate (streaming/vector_gate.py::StreamingVectorDedupGate
    .batch_reduce — the novelty_gate_batch discipline applied to the
    vector gate): corpus = yesterday's indexed embeddings (persisted
    via ``save_ivf_corpus_index``, store reloaded before the
    reduction), batch = today's vectors; a batch vector survives iff
    no indexed vector in its probed cells and no smaller-id batch
    sibling with a probed assigned cell sits at/above threshold
    cosine.  The oracle replays BOTH candidate sources with the
    quantizer pinned as literals; the streaming path's equality with
    this reduction (slicing invariance, replay, crash windows) is
    pinned in tests/test_streaming_vector.py."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_ivf_pq,
        load_ivf_corpus_index,
        save_ivf_corpus_index,
    )
    from cdc_data_lake_pyspark_spark.streaming.vector_gate import (
        StreamingVectorDedupGate,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    work = tempfile.mkdtemp(prefix="vgate_")
    try:
        save_ivf_corpus_index(
            corpus,
            fit_ivf_pq(corpus, n_clusters=_N_CLUSTERS, m_sub=8, k=16, seed=42),
            work,
        )
        gate = StreamingVectorDedupGate(
            work, threshold=_EMB_ND_THRESHOLD, n_probe=_N_PROBE
        )
        _, encoded = load_ivf_corpus_index(spark, work)
        novel, _ = gate.batch_reduce(batch, encoded)
        out = novel.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query("dedup_embedding_incremental_store", oracle=_emb_incremental_oracle)
def dedup_embedding_incremental_store(spark, sf_dir):
    """The same incremental embedding dedup probed against the
    PERSISTED ENCODED CORPUS
    (operators/similarity.py::save_ivf_corpus_index /
    probe_ivf_corpus_index) — the artifact a daily pipeline actually
    keeps: `dedup_embedding_incremental` reloads only the quantizer and
    re-encodes the corpus per probe (one full corpus read per day);
    here the corpus is encoded ONCE, written hive-partitioned BY CELL
    (the IVF inverted-list layout as the physical layout), and the
    daily probe pushes its probed-cell set into the scan as a
    PARTITION filter — reading ~n_probe/nlist of the store, the
    `bucket_partitions` discipline applied to vectors.  Scoring is the
    shared `_score_probed_cells` cogroup, so this entry and the inline
    entry emit bit-identical pairs and share one DuckDB oracle; the
    save → load → probe → append → compact lifecycle is pinned in
    tests/test_pq.py."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_ivf_pq,
        probe_ivf_corpus_index,
        save_ivf_corpus_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    work = tempfile.mkdtemp(prefix="emb_store_")
    try:
        save_ivf_corpus_index(
            corpus,
            fit_ivf_pq(corpus, n_clusters=_N_CLUSTERS, m_sub=8, k=16, seed=42),
            work,
        )
        # the probe reads the store lazily — materialize before cleanup
        out = probe_ivf_corpus_index(
            spark,
            work,
            batch,
            threshold=_EMB_ND_THRESHOLD,
            n_probe=_N_PROBE,
        ).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
