"""Persisted-index lifecycle (VERDICT r10 #2): the MinHash near-dup
index and the IVF-PQ prefit round-trip through parquet with pinned
artifact schemas, and probing from the RELOADED artifact reproduces the
in-memory results exactly.  At 100 TB these artifacts live on disk
between crawls / query batches — schema stability is the contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    MinHashIndex,
    load_minhash_index,
    minhash_index,
    minhash_probe,
    save_minhash_index,
)


def _corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    return docs.filter(F.col("doc_id") % 3 != 0), docs.filter(
        F.col("doc_id") % 3 == 0
    )


def test_minhash_index_roundtrip_and_probe_identity(spark, sf_dir, tmp_path):
    corpus, batch = _corpus(spark, sf_dir)
    index = minhash_index(corpus)
    path = str(tmp_path / "idx")
    save_minhash_index(index, path)
    # reload in a FRESH logical session (shared context, fresh state) —
    # the artifact, not any in-memory lineage, is what gets probed
    fresh = spark.newSession()
    loaded = load_minhash_index(fresh, path)
    assert isinstance(loaded, MinHashIndex)
    assert (loaded.num_hashes, loaded.k, loaded.bands, loaded.rows_per_band) \
        == (index.num_hashes, index.k, index.bands, index.rows_per_band)
    # pinned artifact schemas
    assert dict(loaded.signatures.dtypes) == {
        "doc_id": "bigint",
        "sig": "array<bigint>",
    }
    assert dict(loaded.buckets.dtypes) == {
        "doc_id": "bigint",
        "band": "int",
        "bucket": "bigint",
    }
    fresh_batch = fresh.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.col("doc_id") % 3 == 0)
    )
    got = {
        (r.batch_id, r.index_id, round(r.jaccard, 9))
        for r in minhash_probe(fresh_batch, loaded, threshold=0.5).collect()
    }
    want = {
        (r.batch_id, r.index_id, round(r.jaccard, 9))
        for r in minhash_probe(batch, index, threshold=0.5).collect()
    }
    assert got == want


def test_minhash_probe_rejects_mismatched_params(spark, sf_dir):
    """ADVICE r10: a probe whose hashing layout differs from the index's
    must raise, not silently report zero near-dups (zip_with would pad
    with NULLs and filter every candidate)."""
    corpus, batch = _corpus(spark, sf_dir)
    index = minhash_index(corpus, num_hashes=64, bands=16, rows_per_band=4)
    with pytest.raises(ValueError, match="do not match the index"):
        minhash_probe(batch, index, num_hashes=32, bands=8, rows_per_band=4)
    with pytest.raises(ValueError, match="do not match the index"):
        minhash_probe(batch, index, k=5)


def test_minhash_load_rejects_drifted_schema(spark, sf_dir, tmp_path):
    corpus, _ = _corpus(spark, sf_dir)
    path = str(tmp_path / "idx")
    save_minhash_index(minhash_index(corpus), path)
    # corrupt the signatures dataset with a wrong-typed column
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("oops").alias("sig")
    ).write.mode("overwrite").parquet(f"{path}/signatures")
    with pytest.raises(ValueError, match="schema drifted"):
        load_minhash_index(spark, path)


def test_ivf_pq_prefit_roundtrip_and_search_identity(spark, sf_dir, tmp_path):
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_ivf_pq,
        ivf_pq_top_k,
        load_ivf_pq_prefit,
        save_ivf_pq_prefit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    prefit = fit_ivf_pq(emb, n_clusters=8, m_sub=8, k=16, seed=42)
    path = str(tmp_path / "prefit")
    save_ivf_pq_prefit(spark, prefit, path)
    fresh = spark.newSession()
    loaded = load_ivf_pq_prefit(fresh, path)
    # float64 → parquet DOUBLE → float64 is bit-exact
    assert np.array_equal(loaded[0], prefit[0])
    assert np.array_equal(loaded[1], prefit[1])
    def topk(session, pf):
        e = session.read.parquet(f"{sf_dir}/embeddings.parquet")
        qs = e.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return {
            (r.query_id, r.rank, r.neighbor_id)
            for r in ivf_pq_top_k(
                e, qs, k=3, n_clusters=8, n_probe=2, exclude_self=True,
                prefit=pf,
            ).collect()
        }

    assert topk(fresh, loaded) == topk(spark, prefit)


def test_ivf_pq_prefit_load_rejects_drift(spark, tmp_path):
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        load_ivf_pq_prefit,
        save_ivf_pq_prefit,
    )

    centers = np.arange(8.0).reshape(2, 4)
    books = np.arange(16.0).reshape(2, 4, 2)
    path = str(tmp_path / "pf")
    save_ivf_pq_prefit(spark, (centers, books), path)
    # wrong-typed centers dataset
    spark.range(2).select(
        F.col("id").cast("int").alias("cell"), F.lit("x").alias("center")
    ).write.mode("overwrite").parquet(f"{path}/centers")
    with pytest.raises(ValueError, match="schema drifted"):
        load_ivf_pq_prefit(spark, path)


def test_bucket_partitioned_layout_prunes_and_matches_flat(
    spark, sf_dir, tmp_path
):
    """VERDICT r11 #2: the bucket-partitioned artifact layout.  Saving
    with ``bucket_partitions = P`` hive-partitions the bucket table by
    ``pmod(bucket, P)``; a reloaded probe pushes the batch's own prefix
    set into the scan as a partition filter and returns EXACTLY the
    flat layout's pairs."""
    corpus, batch = _corpus(spark, sf_dir)
    index = minhash_index(corpus)
    flat, part = str(tmp_path / "flat"), str(tmp_path / "part")
    save_minhash_index(index, flat)
    save_minhash_index(index, part, bucket_partitions=8)
    fresh = spark.newSession()
    lf, lp = load_minhash_index(fresh, flat), load_minhash_index(fresh, part)
    assert lf.bucket_partitions == 0
    assert lp.bucket_partitions == 8
    assert "_pfx" in lp.buckets.columns
    fresh_batch = fresh.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.col("doc_id") % 3 == 0)
    )
    want = {
        (r.batch_id, r.index_id, round(r.jaccard, 9))
        for r in minhash_probe(fresh_batch, lf, threshold=0.5).collect()
    }
    got_df = minhash_probe(fresh_batch, lp, threshold=0.5)
    got = {
        (r.batch_id, r.index_id, round(r.jaccard, 9))
        for r in got_df.collect()
    }
    assert got == want and got
    # a SINGLE-document probe prunes: its <= bands distinct buckets
    # cover at most bands prefixes, and the scan's partition filter
    # admits only those
    one = fresh_batch.orderBy("doc_id").limit(1).localCheckpoint()
    plan = (
        minhash_probe(one, lp, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_pfx" in plan  # the isin partition filter reached the scan


def _probe_pairs(batch, index, threshold=0.5):
    return {
        (r.batch_id, r.index_id, round(r.jaccard, 9))
        for r in minhash_probe(batch, index, threshold=threshold).collect()
    }


def _n_parquet_files(d):
    import os

    return sum(
        1
        for _, _, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )


def test_append_api_updates_flat_and_partitioned_stores(
    spark, sf_dir, tmp_path
):
    """VERDICT r12 #1: the first-class index UPDATE.  Appending new docs
    through ``append_to_minhash_index`` must make them probe-visible in
    BOTH layouts with identical verdicts — and for a
    ``bucket_partitions > 0`` store the appended bucket files must carry
    the ``_pfx`` hive layout (the raw ``mode("append")`` writes this API
    replaces silently corrupted exactly that)."""
    import os

    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        append_to_minhash_index,
    )

    corpus, batch = _corpus(spark, sf_dir)
    day0 = corpus.filter(F.col("doc_id") % 2 == 1)
    day1 = corpus.filter(F.col("doc_id") % 2 == 0)
    index = minhash_index(day0)
    flat, part = str(tmp_path / "flat"), str(tmp_path / "part")
    save_minhash_index(index, flat)
    save_minhash_index(index, part, bucket_partitions=8)
    for path in (flat, part):
        append_to_minhash_index(path, day1)
    # the appended bucket files landed INSIDE the hive partitions —
    # no partition-column-less stragglers at the store root
    root_files = [
        f
        for f in os.listdir(f"{part}/buckets")
        if f.endswith(".parquet")
    ]
    assert root_files == []
    lf = load_minhash_index(spark, flat)
    lp = load_minhash_index(spark, part)
    want = _probe_pairs(batch, minhash_index(corpus))
    assert _probe_pairs(batch, lf) == want
    assert _probe_pairs(batch, lp) == want
    # day-1 content is genuinely probe-visible (non-vacuous)
    assert any(
        idx_id % 2 == 0 for _, idx_id, _ in want
    ), "fixture degenerate: no probe hits on appended docs"


def test_append_api_keeper_discipline_and_drift_refusal(
    spark, sf_dir, tmp_path
):
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        append_to_minhash_index,
    )

    corpus, _ = _corpus(spark, sf_dir)
    day0 = corpus.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    save_minhash_index(minhash_index(day0), path)
    n0 = load_minhash_index(spark, path).signatures.count()
    # three exact copies of one new doc: the keeper discipline indexes ONE
    new = spark.createDataFrame(
        [(10_000_001, "fresh content alpha beta gamma delta epsilon"),
         (10_000_002, "fresh content alpha beta gamma delta epsilon"),
         (10_000_003, "fresh content alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    append_to_minhash_index(path, new)
    sigs = load_minhash_index(spark, path).signatures
    assert sigs.count() == n0 + 1
    assert sigs.filter(F.col("doc_id") == 10_000_001).count() == 1
    # a drifted artifact refuses the append BEFORE anything is written
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("oops").alias("sig")
    ).write.mode("overwrite").parquet(f"{path}/signatures")
    with pytest.raises(ValueError, match="schema drifted"):
        append_to_minhash_index(path, new)


def test_compact_minhash_index_folds_and_preserves_probes(
    spark, sf_dir, tmp_path
):
    """VERDICT r12 #1: batch-artifact compaction.  Daily appends (plus a
    simulated double-append leak) accumulate small files; compaction
    must shrink the file sets, fold exact-duplicate rows, keep the hive
    layout, recover a half-finished swap, and leave probe results
    IDENTICAL."""
    import os

    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        append_to_minhash_index,
        compact_minhash_index,
    )

    corpus, batch = _corpus(spark, sf_dir)
    day0 = corpus.filter(F.col("doc_id") % 2 == 1)
    day1 = corpus.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "idx")
    save_minhash_index(minhash_index(day0), path, bucket_partitions=8)
    append_to_minhash_index(path, day1)
    append_to_minhash_index(path, day1)  # a replayed day: exact dup rows
    loaded = load_minhash_index(spark, path)
    want = _probe_pairs(batch, loaded)
    n_docs = loaded.signatures.select("doc_id").distinct().count()
    assert loaded.signatures.count() > n_docs  # the leak is really there
    files_before = _n_parquet_files(f"{path}/signatures")
    compact_minhash_index(spark, path)
    compacted = load_minhash_index(spark, path)
    assert compacted.signatures.count() == n_docs  # dups folded
    assert _n_parquet_files(f"{path}/signatures") < files_before
    assert any(
        name.startswith("_pfx=") for name in os.listdir(f"{path}/buckets")
    )  # hive layout survived the rewrite
    assert _probe_pairs(batch, compacted) == want
    # half-finished swap (old parked, store missing): load repairs it
    os.rename(f"{path}/signatures", f"{path}/signatures__old")
    assert _probe_pairs(batch, load_minhash_index(spark, path)) == want


def test_append_crash_between_writes_is_inert(spark, sf_dir, tmp_path):
    """VERDICT r13 #2: ``append_to_minhash_index`` writes signatures
    FIRST.  A crash between the two appends (simulated by failing the
    banding step) must leave a store whose probes are IDENTICAL to the
    pre-append store — a signature without bucket rows is inert, never
    a candidate — and the retry heals it to full visibility.  The old
    bucket-first order left orphan bucket rows whose candidate pairs
    silently dropped in the estimate join, so probes in the crash
    window MISSED near-dups of the half-appended docs."""
    import cdc_data_lake_pyspark_spark.operators.dedup_text as dt

    corpus, batch = _corpus(spark, sf_dir)
    day0 = corpus.filter(F.col("doc_id") % 2 == 1)
    day1 = corpus.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "idx")
    save_minhash_index(minhash_index(day0), path)
    want_before = _probe_pairs(batch, load_minhash_index(spark, path))
    sig_files_before = _n_parquet_files(f"{path}/signatures")
    bucket_files_before = _n_parquet_files(f"{path}/buckets")

    real_banded = dt._banded

    def _boom(*a, **kw):
        raise RuntimeError("simulated crash between the two appends")

    dt._banded = _boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            dt.append_to_minhash_index(path, day1)
    finally:
        dt._banded = real_banded
    # the crash window: signatures landed, buckets did not
    assert _n_parquet_files(f"{path}/signatures") > sig_files_before
    assert _n_parquet_files(f"{path}/buckets") == bucket_files_before
    # ... and the half-appended store probes IDENTICALLY to pre-append:
    # no pair silently lost, no spurious pair
    assert _probe_pairs(batch, load_minhash_index(spark, path)) \
        == want_before
    # the retry heals to full visibility (duplicate signature rows fold
    # downstream)
    dt.append_to_minhash_index(path, day1)
    want_full = _probe_pairs(batch, minhash_index(corpus))
    assert _probe_pairs(batch, load_minhash_index(spark, path)) == want_full


def test_compact_refuses_live_gate_minhash_store(spark, sf_dir, tmp_path):
    """ADVICE r13 (medium): the batch compactor's fixed read schema
    drops the streaming gate's writer ``batch_id`` column — the
    replay-leak exclusion key — so a store carrying non-null batch_id
    rows must be REFUSED, not silently normalized."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        compact_minhash_index,
    )

    corpus, _ = _corpus(spark, sf_dir)
    path = str(tmp_path / "idx")
    save_minhash_index(minhash_index(corpus), path)
    compact_minhash_index(spark, path)  # batch-only store: fine
    # a streaming writer appends rows carrying their batch_id
    idx = load_minhash_index(spark, path)
    idx.signatures.limit(2).withColumn(
        "batch_id", F.lit(7).cast("long")
    ).write.mode("append").parquet(f"{path}/signatures")
    with pytest.raises(ValueError, match="streaming gate"):
        compact_minhash_index(spark, path)


def test_compact_refuses_live_gate_ivf_store(spark, sf_dir, tmp_path):
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        compact_ivf_corpus_index,
        fit_ivf_pq,
        save_ivf_corpus_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "vidx")
    save_ivf_corpus_index(
        emb, fit_ivf_pq(emb, n_clusters=8, m_sub=8, k=16, seed=42), path
    )
    compact_ivf_corpus_index(spark, path)  # batch-only store: fine
    spark.read.parquet(f"{path}/encoded").limit(2).withColumn(
        "batch_id", F.lit(3).cast("long")
    ).write.mode("append").partitionBy("cell").parquet(f"{path}/encoded")
    with pytest.raises(ValueError, match="streaming gate"):
        compact_ivf_corpus_index(spark, path)
