"""Product quantization (operators/similarity.py::fit_pq_codebooks /
pq_encode): code shape, reconstruction quality versus a mismatched
codebook, determinism across partitionings, and the oracle's float-tie
margin safety on the driver corpus."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cdc_data_lake_pyspark_spark.operators.similarity import (
    _sq_dists,
    fit_pq_codebooks,
    pq_encode,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_pq_codes_shape_and_determinism(emb):
    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    assert books.shape == (8, 16, 8)
    a = sorted(
        (r["vec_id"], r["sub"], r["code"])
        for r in pq_encode(emb.repartition(7), books).collect()
    )
    b = sorted(
        (r["vec_id"], r["sub"], r["code"])
        for r in pq_encode(emb.coalesce(1), books).collect()
    )
    assert a == b
    n = emb.count()
    assert len(a) == n * 8
    assert all(0 <= c < 16 for _, _, c in a)


def test_pq_reconstruction_beats_wrong_codebook(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(emb, books).collect()
    }
    ids = pdf["vec_id"].to_numpy()
    recon = np.empty_like(X)
    for row, vid in enumerate(ids):
        for j in range(8):
            recon[row, j * 8 : (j + 1) * 8] = books[j][codes[(vid, j)]]
    err = ((X - recon) ** 2).sum()
    # shifted codebook assignment (code+1 mod k) must reconstruct worse
    worse = np.empty_like(X)
    for row, vid in enumerate(ids):
        for j in range(8):
            worse[row, j * 8 : (j + 1) * 8] = books[j][
                (codes[(vid, j)] + 1) % 16
            ]
    assert err < ((X - worse) ** 2).sum() * 0.9


def test_pq_assignment_margins_clear_float_roundoff(emb):
    """The oracle's exact value-check is safe only while no (vector,
    subspace) sits on a centroid-distance tie: pin the minimum margin on
    the driver corpus far above float64 round-off (the IVF margins
    contract, applied to PQ)."""
    pdf = emb.toPandas()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    min_margin = np.inf
    for j in range(8):
        d = np.sort(_sq_dists(X[:, j * 8 : (j + 1) * 8], books[j]), axis=1)
        min_margin = min(min_margin, float((d[:, 1] - d[:, 0]).min()))
    assert min_margin > 1e-9


def test_pq_adc_partition_invariance(emb):
    """ADC top-k (pq_top_k): the compressed-domain ranking must be
    identical regardless of corpus partitioning — the per-partition
    partial top-k with boundary ties kept cannot change the global
    result."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.similarity import pq_top_k

    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(
        map(tuple, pq_top_k(
            emb.repartition(13), queries, books, k=10, exclude_self=True
        ).collect())
    )
    b = sorted(
        map(tuple, pq_top_k(
            emb.coalesce(1), queries, books, k=10, exclude_self=True
        ).collect())
    )
    assert a == b
    assert len(a) == 10 * 10


def test_pq_reranked_recall_vs_exact(emb):
    """Two-stage PQ (ADC shortlist -> full-precision re-rank): the final
    top-3 must recover most of the exact cosine top-3, and every emitted
    score must EQUAL the exact score for that pair (re-ranking is exact
    over the shortlist — only membership is approximate).  Measured
    recall at shortlist=50 on this corpus: 0.87."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.similarity import (
        brute_force_top_k,
        pq_top_k_reranked,
    )

    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_rows = brute_force_top_k(
        emb, queries, k=50, exclude_self=True
    ).collect()
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact_rows}
    exact_top3 = {
        (r["query_id"], r["neighbor_id"]) for r in exact_rows if r["rank"] <= 3
    }
    got = pq_top_k_reranked(
        emb, queries, books, k=3, shortlist=50, exclude_self=True
    ).collect()
    assert len(got) == 10 * 3
    for r in got:
        pair = (r["query_id"], r["neighbor_id"])
        if pair in exact_scores:
            assert r["score"] == exact_scores[pair]
    recall = len(exact_top3 & {(r["query_id"], r["neighbor_id"]) for r in got}) / len(
        exact_top3
    )
    assert recall >= 0.7, recall


def test_ivf_pq_recall_and_residual_margins(emb):
    """IVF-PQ (ivf_pq_top_k): the composed index must (a) recover most
    of the exact cosine top-3 (residual coding quantizes finer than
    plain PQ, and the 4-of-16 probe bounds the miss), (b) emit EXACT
    cosine scores for every returned pair (re-rank contract), and (c)
    have residual-code assignment margins far above float64 round-off so
    the oracle's argmin replay is safe (the IVF/PQ margins contract)."""
    from pyspark.sql import functions as F

    from cdc_data_lake_pyspark_spark.operators.similarity import (
        brute_force_top_k,
        fit_ivf_pq,
        ivf_pq_top_k,
    )

    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_rows = brute_force_top_k(
        emb, queries, k=3, exclude_self=True
    ).collect()
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"] for r in exact_rows
    }
    got = ivf_pq_top_k(
        emb, queries, k=3, n_probe=4, shortlist=50, exclude_self=True
    ).collect()
    assert len(got) == 10 * 3
    for r in got:
        pair = (r["query_id"], r["neighbor_id"])
        if pair in exact_scores:
            assert r["score"] == exact_scores[pair]
    recall = len(
        set(exact_scores) & {(r["query_id"], r["neighbor_id"]) for r in got}
    ) / len(exact_scores)
    assert recall >= 0.5, recall

    centers, books = fit_ivf_pq(emb)
    pdf = emb.toPandas()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    R = X - centers[_sq_dists(X, centers).argmin(axis=1)]
    min_margin = np.inf
    for j in range(8):
        d = np.sort(_sq_dists(R[:, j * 8 : (j + 1) * 8], books[j]), axis=1)
        min_margin = min(min_margin, float((d[:, 1] - d[:, 0]).min()))
    assert min_margin > 1e-9
