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
