"""Phase-10 inventory (round 11): the LEARNED quality-classifier gate —
the one first-class LLM-pipeline family the heuristic quality surface
did not cover (VERDICT r10 "What's missing" #3).

Public practice this tracks: GPT-3 (Brown et al. 2020, appendix A)
filtered CommonCrawl with a logistic-regression classifier over hashed
token features; DCLM (Li et al. 2024) and FineWeb-Edu gate on
fastText-style linear classifiers.  The in-Spark realization
(:mod:`~cdc_data_lake_pyspark_spark.operators.classifier`) is a binary
multinomial Naive Bayes over the portable hashing-trick features —
training is ONE aggregation pass (closed form: order-, partition- and
engine-independent), all log-probabilities ride the integer micro-log2
bridge, so DuckDB replays TRAINING and SCORING bit-for-bit.

Three entries:

* ``quality_classifier_weights`` — the fitted model itself (dense
  bucket spine + bias row) under the value gate: every weight is an
  exact BIGINT both engines must agree on.
* ``quality_classifier_gate`` — per-document scores and MAP keep
  verdicts over the full corpus, trained on a 70 % deterministic seed
  split (the held-out 30 % demonstrates generalization under the same
  oracle).
* ``prepare_web_corpus_v4`` — the full web capstone with the learned
  gate as a first-class stage: host gate → URL keeper → extract →
  min-content gate → **classifier gate (train on seed, score all)** →
  content dedup → split.

Fixture (size-invariant by residue, the r10 lesson): documents whose
id ≡ 0 (mod 3) carry a planted boilerplate phrase prepended to their
body and label 0; everything else is label 1 — a 1/3 low-quality rate
at ANY corpus size.  In the v4 composite the plant keys on the SOURCE
id (``doc_id % 200``), so every member of a content-dedup group shares
one label and the gate drops whole groups, never splits them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.classifier import (
    nb_score,
    nb_score_sql,
    nb_train,
    nb_train_sql,
)
from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash
from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql

#: the planted low-quality lexical signal (label-0 docs prepend this)
BOILER = (
    "click here subscribe now cookie policy accept all rights reserved "
    "privacy terms conditions newsletter signup follow us"
)

#: hashed-feature width shared by every classifier entry
N_BUCKETS = 64

#: labeled-seed split: portable-hash residue < 7 of 10 (70 % train)
_SEED_PCT = 7


def _labeled_base(docs):
    """(base, labeled): the planted fixture over a documents frame —
    base carries (doc_id, text, label), labeled is the 70 % seed."""
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(BOILER + " "), F.col("text")),
    ).otherwise(F.col("text"))
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        planted.alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("label"),
    )
    seed = base.filter(
        F.pmod(portable_id_hash(F.col("doc_id").cast("string")), F.lit(10))
        < _SEED_PCT
    )
    return base, seed


#: the fixture in DuckDB (identical plant + seed split)
_BASE_SQL = f"""
    base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN '{BOILER} ' || text
                  ELSE text END AS text,
             CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS label
      FROM documents WHERE text IS NOT NULL
    ), seed AS (
      SELECT * FROM base
      WHERE {_hash_sql("CAST(doc_id AS VARCHAR)")} % 10 < {_SEED_PCT}
    )"""


@query(
    "quality_classifier_weights",
    oracle=f"""
    WITH {_BASE_SQL}, {nb_train_sql("seed", N_BUCKETS)}
    SELECT bucket, w_micro FROM nb_model
    """,
)
def quality_classifier_weights(spark, sf_dir):
    """The fitted quality model itself under the value gate: train the
    binary NB on the 70 % labeled seed and return every weight —
    ``n_buckets`` dense spine rows plus the ``bucket = -1`` prior
    log-odds row, all exact micro-log2 BIGINTs.

    Scale: training is one explode + one bucket-keyed map-side-combined
    aggregate over the LABELED set (small by construction at 100 TB —
    labels are the expensive resource); the model is 65 rows whatever
    the corpus size."""
    docs = _t(spark, sf_dir, "documents")
    _, seed = _labeled_base(docs)
    return nb_train(seed, n_buckets=N_BUCKETS)


@query(
    "quality_classifier_gate",
    oracle=f"""
    WITH {_BASE_SQL}, {nb_train_sql("seed", N_BUCKETS)},
    {nb_score_sql("base", n_buckets=N_BUCKETS)}
    SELECT b.doc_id, b.label, s.score_micro, s.keep
    FROM base b JOIN nb_scores s USING (doc_id)
    """,
)
def quality_classifier_gate(spark, sf_dir):
    """Score EVERY document under the seed-trained model and gate on the
    MAP rule (``score_micro >= 0``) — the learned analogue of the
    heuristic Gopher gates, value-checked per document including the
    30 % of docs the model never saw in training.

    Plan shape (the 100 TB path): the 65-row model broadcasts; scoring
    is explode → broadcast hash join → one doc-keyed partial-sum
    exchange.  The corpus never shuffles its text."""
    docs = _t(spark, sf_dir, "documents")
    base, seed = _labeled_base(docs)
    model = nb_train(seed, n_buckets=N_BUCKETS)
    return nb_score(base, model, n_buckets=N_BUCKETS).join(
        base.select("doc_id", "label"), "doc_id"
    ).select("doc_id", "label", "score_micro", "keep")
