"""Streaming half of the incremental corpus-refresh story (VERDICT r11
#3): day-0 artifacts are PERSISTED (`save_minhash_index` seeding the
near-dup gate's store directly — same layout — and `save_model` /
`load_model` for the classifier), then day-1 arrives as micro-batches
through ``StreamingNearDupGate`` chained into ``StreamingQualityGate``,
and the composed stream output must equal the batch rule computed from
the same artifacts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.classifier import (
    load_model,
    nb_score,
    nb_train,
    save_model,
)
from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    minhash_index,
    minhash_probe,
    save_minhash_index,
)
from cdc_data_lake_pyspark_spark.streaming.neardup import StreamingNearDupGate
from cdc_data_lake_pyspark_spark.streaming.quality_gate import (
    StreamingQualityGate,
)

SF_DIR = "/root/testdata/sf0.01"
THRESHOLD = 0.6
N_SLICES = 3
BOILER = (
    "click here subscribe now cookie policy accept all rights reserved "
    "privacy terms conditions newsletter signup follow us"
)


def _fixture(spark):
    """(day0, day1): planted labels (id % 3 = 0 → boiler, label 0) over
    the driver corpus; day 1 carries near-dup re-crawls of day-0 docs
    (must drop at the near-dup gate) plus fresh docs of both labels
    (must face only the learned gate)."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") < 400))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("label"),
        )
    )
    day0 = docs.filter(F.col("doc_id") < 250)
    fresh = docs.filter(F.col("doc_id") >= 250)
    recrawl = day0.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 700_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "label",
    )
    return day0.localCheckpoint(), fresh.unionByName(
        recrawl
    ).localCheckpoint()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_streamed_day1_equals_batch_rule(spark, tmp_path):
    day0, day1 = _fixture(spark)
    # ---- day-0 artifacts, persisted --------------------------------------
    index_dir = str(tmp_path / "index")
    save_minhash_index(minhash_index(day0), index_dir)
    model_dir = str(tmp_path / "model")
    save_model(nb_train(day0.filter(F.col("doc_id") % 10 < 7)), model_dir)
    model = load_model(spark, model_dir)
    # ---- stream day 1 through BOTH gates, chained ------------------------
    nd_gate = StreamingNearDupGate(index_dir, threshold=THRESHOLD)
    q_gate = StreamingQualityGate(model, str(tmp_path / "quality"))
    w = Window.orderBy("doc_id")
    sliced = day1.withColumn(
        "_slice", (F.row_number().over(w) % N_SLICES)
    ).localCheckpoint()
    for s in range(N_SLICES):
        batch = sliced.filter(F.col("_slice") == s).select("doc_id", "text")
        nd_gate.process_batch(batch, batch_id=s)
        novel_ids = nd_gate.kept_docs(spark).filter(
            F.col("batch_id") == s
        ).select("doc_id")
        q_gate.process_batch(
            batch.join(novel_ids, "doc_id", "left_semi"), batch_id=s
        )
    streamed = {r.doc_id for r in q_gate.kept_docs(spark).collect()}
    # ---- the batch rule from the SAME artifacts --------------------------
    # near-dup: a day-1 doc survives iff no candidate ≥ threshold among
    # day-0 docs (all earlier) or smaller-id day-1 docs seen in an
    # earlier-or-same (batch, id) position — slices are id-interleaved,
    # so the earlier-seen set under the gate's (batch, id) order is
    # exactly "day-0 ∪ day-1 with smaller id" ONLY when slicing follows
    # id order; here slices stripe ids, so replicate the gate's order.
    order = {
        r.doc_id: (s, r.doc_id)
        for s in range(N_SLICES)
        for r in sliced.filter(F.col("_slice") == s).select(
            "doc_id"
        ).collect()
    }
    both = day0.select("doc_id", "text").unionByName(
        day1.select("doc_id", "text")
    )
    pairs = minhash_probe(
        day1.select("doc_id", "text"),
        minhash_index(both),
        threshold=THRESHOLD,
    ).collect()
    dropped = set()
    for r in pairs:
        if r.batch_id == r.index_id:
            continue
        earlier = (
            r.index_id not in order  # a day-0 doc: always earlier
            or order[r.index_id] < order[r.batch_id]
        )
        if earlier:
            dropped.add(r.batch_id)
    survivors = day1.filter(~F.col("doc_id").isin(list(dropped)))
    expected = {
        r.doc_id
        for r in nb_score(survivors, model)
        .filter(F.col("keep") == 1)
        .collect()
    }
    assert streamed == expected
    # both stages did real work, and both labels faced the learned gate
    assert dropped, "near-dup stage never fired"
    assert streamed and streamed != {r.doc_id for r in survivors.collect()}
