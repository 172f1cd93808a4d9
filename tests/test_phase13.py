"""Combined multimodal incremental capstone (queries_phase13.py): the
per-stage non-degeneracy the parity oracle cannot see, the DAY-2
visibility of both appended artifact families, and the
streaming-agreement twin — the chained text→vector gate composition
over micro-batch slices must reproduce the gates' own single-batch
reduction exactly, independent of slicing, against day-0 stores seeded
by the batch bootstrap APIs."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.queries_phase13 import (
    _MM_N_CLUSTERS,
    _MM_N_PROBE,
    _MM_TEXT_THRESHOLD,
    _MM_VEC_THRESHOLD,
    _mm_items,
    _prepare_multimodal_incremental,
)

SF_DIR = "/root/testdata/sf0.001"

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


def _tables(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return docs, emb


@needs_data
def test_multimodal_stage_nondegeneracy_and_day2_visibility(
    spark, tmp_path
):
    """Both probe families must fire (the r11 lesson: a parity-green
    capstone can still be stage-degenerate), and day-1 keepers must be
    probe-visible TOMORROW in both persisted stores."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        load_minhash_index,
        minhash_probe,
    )
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        probe_ivf_corpus_index,
    )

    docs, emb = _tables(spark)
    counts: dict = {}
    out = _prepare_multimodal_incremental(
        docs, emb, work_dir=str(tmp_path), stage_counts=counts
    ).collect()
    day0 = {r.doc_id for r in out if r.day == 0}
    day1 = {r.doc_id for r in out if r.day == 1}
    assert day0 and day1
    # every stage non-degenerate
    assert counts["text_drops"] > 0, counts
    assert counts["vec_drops"] > 0, counts
    assert counts["day1_keepers"] > 0, counts
    # day-2 TEXT visibility: a re-crawl of a day-1 keeper's text hits
    # the appended MinHash index at estimate 1.0
    index = load_minhash_index(spark, f"{tmp_path}/index")
    target = min(day1)
    items = _mm_items(docs, emb)
    recrawl = items.filter(F.col("doc_id") == target).select(
        F.lit(999_999_999).cast("long").alias("doc_id"), "text"
    )
    hits = minhash_probe(recrawl, index, threshold=0.99).collect()
    assert any(r.index_id == target for r in hits), hits
    # day-2 VECTOR visibility: the day-1 keeper's own embedding probes
    # the appended encoded store at cosine 1.0
    vec_recrawl = emb.filter(F.col("vec_id") == target).select(
        F.lit(999_999_999).cast("long").alias("vec_id"), "embedding"
    )
    vhits = probe_ivf_corpus_index(
        spark,
        f"{tmp_path}/vectors",
        vec_recrawl,
        threshold=0.99,
        n_probe=1,
    ).collect()
    assert any(r.index_id == target for r in vhits), vhits


@needs_data
def test_multimodal_streaming_agreement_twin(spark, tmp_path):
    """The streaming-agreement twin (VERDICT r13 #1): day-1 fed through
    the CHAINED StreamingNearDupGate → StreamingVectorDedupGate — each
    micro-batch text-gated first, its survivors vector-gated — over
    day-0 stores seeded by the batch bootstrap APIs, must keep exactly
    the set the gates' own single-batch reductions keep, whether day 1
    arrives as one batch or as three id-ordered slices."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        exact_dedup,
        minhash_index,
        save_minhash_index,
    )
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_ivf_pq,
        load_ivf_corpus_index,
        save_ivf_corpus_index,
    )
    from cdc_data_lake_pyspark_spark.streaming.neardup import (
        StreamingNearDupGate,
    )
    from cdc_data_lake_pyspark_spark.streaming.vector_gate import (
        StreamingVectorDedupGate,
    )

    docs, emb = _tables(spark)
    items = _mm_items(docs, emb)
    d0 = items.filter(F.col("day") == 0)
    d1 = items.filter(F.col("day") == 1).localCheckpoint()

    # day-0 bootstrap: keepers into both stores (the capstone's day 0)
    keep0 = exact_dedup(d0).select(F.col("keeper_id").alias("doc_id"))
    keepers0 = d0.join(keep0, "doc_id", "left_semi").localCheckpoint()
    text_seed, vec_seed = str(tmp_path / "text0"), str(tmp_path / "vec0")
    save_minhash_index(minhash_index(keepers0), text_seed)
    prefit = fit_ivf_pq(
        emb.filter(F.col("vec_id") % 7 < 4),
        n_clusters=_MM_N_CLUSTERS,
        m_sub=8,
        k=16,
        seed=42,
    )
    save_ivf_corpus_index(
        keepers0.select(F.col("doc_id").alias("vec_id")).join(emb, "vec_id"),
        prefit,
        vec_seed,
    )

    def _chain(run_dir: str, n_slices: int) -> set:
        """Feed day 1 through the chained gates over a COPY of the
        day-0 stores; return the finally-kept doc_id set."""
        tdir, vdir = f"{run_dir}/text", f"{run_dir}/vec"
        shutil.copytree(text_seed, tdir)
        shutil.copytree(vec_seed, vdir)
        tg = StreamingNearDupGate(tdir, threshold=_MM_TEXT_THRESHOLD)
        vg = StreamingVectorDedupGate(
            vdir, threshold=_MM_VEC_THRESHOLD, n_probe=_MM_N_PROBE
        )
        sliced = d1.withColumn(
            "_slice", F.ntile(n_slices).over(Window.orderBy("doc_id"))
        ).localCheckpoint()
        for s in range(1, n_slices + 1):
            part = sliced.filter(F.col("_slice") == s)
            tg.process_batch(part.select("doc_id", "text"), batch_id=s)
            surv = tg.kept_docs(spark).filter(
                F.col("batch_id") == s
            ).select("doc_id")
            vg.process_batch(
                part.join(surv, "doc_id", "left_semi").select(
                    F.col("doc_id").alias("vec_id")
                ).join(emb, "vec_id"),
                batch_id=s,
            )
        return {r.vec_id for r in vg.kept_vectors(spark).collect()}

    # the gates' own single-batch reduction as the reference
    ref_dir = str(tmp_path / "ref")
    tref, vref = f"{ref_dir}/text", f"{ref_dir}/vec"
    shutil.copytree(text_seed, tref)
    shutil.copytree(vec_seed, vref)
    tg = StreamingNearDupGate(tref, threshold=_MM_TEXT_THRESHOLD)
    novel_text, _ = tg.batch_reduce(
        d1.select("doc_id", "text"), tg.index(spark)
    )
    surv_vecs = novel_text.select(
        F.col("doc_id").alias("vec_id")
    ).join(emb, "vec_id")
    vg = StreamingVectorDedupGate(
        vref, threshold=_MM_VEC_THRESHOLD, n_probe=_MM_N_PROBE
    )
    _, encoded = load_ivf_corpus_index(spark, vref)
    novel_vec, _ = vg.batch_reduce(surv_vecs, encoded)
    want = {r.vec_id for r in novel_vec.collect()}

    got_one = _chain(str(tmp_path / "one"), 1)
    got_many = _chain(str(tmp_path / "many"), 3)
    assert got_one == want
    assert got_many == want
    # non-vacuous: the chain really gated on both families — some day-1
    # docs dropped at text, and of the text-survivors some dropped at
    # the vector stage
    n_d1 = d1.count()
    n_text_surv = novel_text.count()
    assert n_text_surv < n_d1
    assert len(want) < n_text_surv
    assert want
