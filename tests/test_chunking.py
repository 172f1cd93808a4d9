"""Unit semantics for context-window chunking (operators/chunking.py)."""

import pytest
from pyspark.sql import Row

from cdc_data_lake_pyspark_spark.operators.chunking import chunk_documents


def _chunks(spark, text, window, stride):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = chunk_documents(df, window=window, stride=stride).collect()
    return sorted(out, key=lambda r: r.chunk_id)


def test_overlap_and_coverage(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, text, window=4, stride=3)
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[3].chunk_text == "t9"  # short tail, never dropped
    assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]
    # every token appears in at least one chunk
    seen = {t for r in rows for t in r.chunk_text.split(" ")}
    assert seen == set(text.split(" "))


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b", window=64, stride=48)
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b" and rows[0].chunk_tokens == 2


def test_non_overlapping_stride_reconstructs(spark):
    text = " ".join(f"w{i}" for i in range(17))
    rows = _chunks(spark, text, window=5, stride=5)
    assert " ".join(r.chunk_text for r in rows) == text
    assert sum(r.chunk_tokens for r in rows) == 17


def test_invalid_params(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
