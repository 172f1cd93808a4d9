"""prepare_training_corpus_v2 approx mode: the sketch-threshold decile
gate must (a) plan with NO global sort, and (b) disagree with the exact
ntile gate only for documents whose cross-entropy lies within one sketch
cell of a decile boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.lm_quality import (
    unigram_lm_scores,
)
from cdc_data_lake_pyspark_spark.operators.relational import quantile_buckets
from cdc_data_lake_pyspark_spark.queries import _t
from cdc_data_lake_pyspark_spark.queries_phase5 import (
    _V2_HIST_WIDTH,
    prepare_training_corpus_v2,
)


def test_approx_gate_disagreement_bounded_by_one_cell(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scores = unigram_lm_scores(docs).select("doc_id", "cross_entropy")
    exact_kept = {
        r.doc_id
        for r in quantile_buckets(scores, "cross_entropy", n_buckets=10)
        .filter(F.col("bucket").between(2, 9))
        .select("doc_id")
        .collect()
    }
    ce = {r.doc_id: r.cross_entropy for r in scores.collect()}
    # the exact decile boundaries the sketch approximates
    vals = sorted(ce.values())
    n = len(vals)
    lo_exact = vals[max(0, n // 10 - 1)]
    hi_exact = vals[max(0, (9 * n) // 10 - 1)]

    out_exact = prepare_training_corpus_v2(spark, sf_dir, approx=False)
    out_approx = prepare_training_corpus_v2(spark, sf_dir, approx=True)
    # downstream stages (dedup/mix/split) are deterministic functions of
    # the gated set, so comparing composite outputs compares the gates
    e_ids = {r.doc_id for r in out_exact.collect()}
    a_ids = {r.doc_id for r in out_approx.collect()}

    for d in e_ids ^ a_ids:
        near_lo = abs(ce[d] - lo_exact) <= 2 * _V2_HIST_WIDTH
        near_hi = abs(ce[d] - hi_exact) <= 2 * _V2_HIST_WIDTH
        assert near_lo or near_hi, (
            f"doc {d} flipped by approx gate but its cross-entropy "
            f"{ce[d]:.4f} is not within one cell of a boundary "
            f"({lo_exact:.4f}, {hi_exact:.4f})"
        )
    # the gates agree on the overwhelming bulk of the corpus
    assert len(e_ids ^ a_ids) <= max(2, len(e_ids) // 20)


def test_approx_plan_has_no_global_sort(spark, sf_dir):
    out = prepare_training_corpus_v2(spark, sf_dir, approx=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exact mode's ntile plans a single-partition Window + global Sort;
    # the sketch path must plan neither
    assert "Window" not in plan
