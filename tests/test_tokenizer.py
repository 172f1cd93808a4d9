"""BPE tokenizer induction (operators/tokenizer.py): deterministic merge
learning, compression vs the char baseline, and column-expression
application parity with a pure-Python reference."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.tokenizer import (
    apply_bpe_merges,
    bpe_token_counts,
    learn_bpe_merges,
    learn_bpe_merges_from_texts,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata absent")
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _py_apply(word: str, merges) -> str:
    out = " ".join(word)
    for a, b in merges:
        out = out.replace(f"{a} {b}", a + b)
    return out


def test_bpe_learning_is_deterministic_and_compresses(docs):
    m1 = learn_bpe_merges(docs, n_merges=24)
    m2 = learn_bpe_merges(docs.repartition(9), n_merges=24)
    assert m1 == m2 and len(m1) == 24
    counts = bpe_token_counts(docs, m1).collect()
    total_tokens = sum(r["n_tokens"] for r in counts)
    # char baseline: zero merges
    base = sum(
        r["n_tokens"] for r in bpe_token_counts(docs, []).collect()
    )
    assert total_tokens < base  # merges must compress
    assert all(r["n_tokens"] >= r["n_words"] for r in counts)


def test_bpe_apply_matches_pure_python(spark):
    merges = learn_bpe_merges_from_texts(
        ["the cat sat on the mat", "the hat that the cat wore"] * 5,
        n_merges=8,
    )
    words = ["the", "that", "cat", "hatter", "xyz", "a"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["t"]
        for r in df.select(
            "w", apply_bpe_merges(F.col("w"), merges).alias("t")
        ).collect()
    }
    for w in words:
        assert got[w] == _py_apply(w, merges), (w, got[w])


def test_bpe_merge_greediness():
    """Most frequent pair merges first; ties break lexicographically."""
    merges = learn_bpe_merges_from_texts(["ab ab ab cd cd"], n_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("c", "d")
