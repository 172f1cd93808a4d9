"""Phase-11 inventory (round 12): the INCREMENTAL corpus-refresh
capstone (VERDICT r11 missing #4) — the plan a real 100 TB pipeline
executes DAILY, composed end-to-end from pieces that all existed by
r11 but never ran as one story:

day 0 (bootstrap)
    host dup-rate gate → canonical-URL keeper → main-content extraction
    → min-content gate → NB classifier gate (train on day-0 seed) →
    exact content dedup → the day-0 corpus; PERSIST the classifier
    model (`save_model`) and the MinHash near-dup index of the kept
    content — ONE REPRESENTATIVE PER CONTENT GROUP, so index size
    tracks unique content, not crawl volume (`save_minhash_index`).

day 1 (the daily increment)
    new crawl batch → host gate under YESTERDAY'S host reputation →
    URL frontier (canonicals never seen yesterday, then per-canonical
    election) → extraction + min-content gate → near-dup probe against
    the RELOADED day-0 index (`load_minhash_index` → `minhash_probe`,
    exact-verify mode) → learned gate under the RELOADED day-0 model
    (`load_model` → `nb_score`) → within-day content dedup → the
    appended day-1 survivors.

The oracle replays BOTH days in one WITH list: day-0 host stats, URL
election, extraction, NB training and scoring, content dedup; then the
day-1 frontier anti-join, the near-dup stage as EXACT cross-day
3-shingle Jaccard (probe verify mode has banding recall ≈ 1 and
verification precision 1 — the `dedup_incremental_minhash` argument,
queries_phase2.py:903), the second scoring under the same model CTE,
and the day-1 dedup.  Every artifact round-trips parquet INSIDE the
entry, so the lifecycle itself is under the correctness gate.

Fixture (size-invariant by residue, and — the r11 lesson — checked for
NON-degeneracy on BOTH days at every SF): ``day = 0`` iff
``crawl_id % 7 < 4`` (mod 7 is coprime to the host residue mod 5, the
plant residue mod 3, and the URL-decade structure), and the source map
splits the crawl population so day 1 carries BOTH work types a daily
increment sees::

    src = crawl_id % 100                      (even crawl ids —
          the SHARED pool: day-1 re-crawls of content day 0 already
          kept, which the near-dup probe must DROP)
    src = 100 + crawl_id % 50 + 50·day        (odd crawl ids —
          per-day EXCLUSIVE pools: day-1 content that did not exist
          yesterday, which must SURVIVE the probe and face only the
          learned gate)

Labels stay ``src % 3`` with the boilerplate plant, so both labels
appear in every pool.  A first draft keyed every source on
``crawl_id % 200`` (the v4 map) and shipped a PARITY-GREEN but
day-1-EMPTY capstone — day 0 had already seen all 200 sources, so the
probe dropped every label-1 doc and the model every label-0 doc; the
parity oracle cannot catch that, only the per-day out_rows check can.

Scale notes ride on each entry's docstring; the marginal day-1 cost is
measured at the 100x axis by ``tools/measure_incremental.py``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.operators.classifier import (
    load_model,
    nb_score,
    nb_score_sql,
    nb_train,
    nb_train_sql,
    save_model,
)
from cdc_data_lake_pyspark_spark.operators.relational import portable_id_hash
from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql
from cdc_data_lake_pyspark_spark.queries_phase10 import (
    BOILER,
    N_BUCKETS,
    _SEED_PCT,
)

#: cross-day near-dup threshold (exact Jaccard over 3-shingles)
_ND_THRESHOLD = 0.8

#: day assignment residue — coprime to the host (mod 5), plant (mod 3)
#: and dup-structure (mod 2/10) residues
_DAY0_SQL = "CASE WHEN doc_id % 7 < 4 THEN 0 ELSE 1 END"

#: source map (see module docstring): even crawls share a cross-day
#: pool, odd crawls draw from per-day exclusive pools
_SRC_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN doc_id % 100 "
    f"ELSE 100 + doc_id % 50 + 50 * ({_DAY0_SQL}) END"
)


def _incremental_oracle() -> str:
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
    seed_hash = _hash_sql("CAST(doc_id AS VARCHAR)")
    shingles = (
        "list_distinct(list_transform("
        "generate_series(1, greatest(len(string_split(lower(main_text),"
        "' ')) - 2, 0)), "
        "i -> array_to_string(string_split(lower(main_text),' ')[i:i+2],"
        " ' ')))"
    )
    return f"""
    WITH crawls AS (
      SELECT c.doc_id, c.day,
             CASE WHEN c.src % 3 = 0 THEN 0 ELSE 1 END AS label,
             CASE WHEN c.src % 3 = 0 THEN '{BOILER} ' || s.text
                  ELSE s.text END AS text
      FROM (SELECT doc_id, {_DAY0_SQL} AS day, {_SRC_SQL} AS src
            FROM documents) c
      JOIN documents s ON s.doc_id = c.src
      WHERE s.text IS NOT NULL
    ), canon AS (
      SELECT doc_id, day,
             {canonical_url_sql(f"({_V3_URL_SQL})", duck=True)} AS c,
             {_V3_HOST_SQL} AS host
      FROM crawls
    ), good0 AS (
      SELECT host FROM (
        SELECT host,
               CAST(round(1e6 * CAST(count(*) - count(DISTINCT c) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
        FROM canon WHERE day = 0 GROUP BY host)
      WHERE dup_ppm <= {_HOST_DUP_PPM_MAX}
    ), url_keep0 AS (
      SELECT min(doc_id) AS doc_id
      FROM canon JOIN good0 USING (host) WHERE day = 0 GROUP BY c
    ), gated0 AS (
      SELECT doc_id, label, main_text FROM (
        SELECT cr.doc_id, cr.label, {ex} AS main_text
        FROM crawls cr JOIN url_keep0 USING (doc_id))
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), seed AS (
      SELECT label, main_text AS text
      FROM gated0 WHERE {seed_hash} % 10 < {_SEED_PCT}
    ), sc0_in AS (
      SELECT doc_id, main_text AS text FROM gated0
    ), {nb_train_sql("seed", N_BUCKETS)},
    {nb_score_sql("sc0_in", n_buckets=N_BUCKETS, cte_prefix="d0_")},
    clean0 AS (
      SELECT g.doc_id, g.main_text
      FROM gated0 g JOIN d0_scores s USING (doc_id) WHERE s.keep = 1
    ), keep0 AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_urls
      FROM clean0 GROUP BY 1
    ), fresh1 AS (
      SELECT doc_id, c FROM canon JOIN good0 USING (host)
      WHERE day = 1
        AND md5(c) NOT IN (SELECT md5(c) FROM canon WHERE day = 0)
    ), url_keep1 AS (
      SELECT min(doc_id) AS doc_id FROM fresh1 GROUP BY c
    ), gated1 AS (
      SELECT doc_id, main_text FROM (
        SELECT cr.doc_id, {ex} AS main_text
        FROM crawls cr JOIN url_keep1 USING (doc_id))
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), sh1 AS (
      SELECT doc_id, unnest(sh) AS s, len(sh) AS n
      FROM (SELECT doc_id, {shingles} AS sh FROM gated1)
    ), sh0 AS (
      SELECT doc_id, unnest(sh) AS s, len(sh) AS n
      FROM (SELECT doc_id, {shingles} AS sh FROM clean0
            WHERE doc_id IN (SELECT doc_id FROM keep0))
    ), nd_dropped AS (
      SELECT DISTINCT batch_id AS doc_id FROM (
        SELECT b.doc_id AS batch_id,
               count(*) AS common,
               any_value(b.n) AS nb, any_value(i.n) AS ni
        FROM sh1 b JOIN sh0 i ON b.s = i.s
        GROUP BY b.doc_id, i.doc_id)
      WHERE CAST(common AS DOUBLE) / CAST(nb + ni - common AS DOUBLE)
            >= {_ND_THRESHOLD}
    ), nd1 AS (
      SELECT g.doc_id, g.main_text FROM gated1 g
      WHERE g.doc_id NOT IN (SELECT doc_id FROM nd_dropped)
    ), sc1_in AS (
      SELECT doc_id, main_text AS text FROM nd1
    ), {nb_score_sql("sc1_in", n_buckets=N_BUCKETS, cte_prefix="d1_")},
    clean1 AS (
      SELECT n.doc_id, n.main_text
      FROM nd1 n JOIN d1_scores s USING (doc_id) WHERE s.keep = 1
    ), keep1 AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_urls
      FROM clean1 GROUP BY 1
    )
    SELECT CAST(0 AS INT) AS day, doc_id, fingerprint, n_urls FROM keep0
    UNION ALL
    SELECT CAST(1 AS INT) AS day, doc_id, fingerprint, n_urls FROM keep1
    """


@query("prepare_web_corpus_incremental", oracle=_incremental_oracle)
def prepare_web_corpus_incremental(spark, sf_dir):
    """The incremental corpus-refresh capstone — see the module
    docstring for the two-day story.  Returns ``(day, doc_id,
    fingerprint, n_urls)``: the day-0 bootstrap corpus plus the day-1
    appended survivors, with BOTH day-0 artifacts (classifier model,
    MinHash index) round-tripping parquet inside the entry.

    Plan shape at 100 TB (the point of the composite): day N+1 never
    touches day N's text again — the host gate joins yesterday's tiny
    per-host stats, the URL frontier anti-joins canonical DIGESTS, the
    near-dup stage probes the PERSISTED index (batch-only shingling,
    bucket-join candidates, point-lookup verify), and the learned gate
    broadcasts the persisted 65-row model.  The daily marginal cost is
    batch-sized in every stage (measured: tools/measure_incremental.py,
    SCALE.md §21)."""
    return _prepare_web_corpus_incremental(_t(spark, sf_dir, "documents"))


def _prepare_web_corpus_incremental(docs, work_dir=None, timings=None):
    """Body over an arbitrary docs frame — shared with
    tools/measure_incremental.py so the 100x row measures the shipped
    composite.  ``work_dir`` pins where the day-0 artifacts (and the
    day-1 index UPDATE) land — tests pass a tmp dir and probe the
    post-run index; the registry entry uses a fresh temp dir.
    ``timings`` (a dict, when given) receives wall-clock checkpoints:
    ``day0_done`` after the day-0 artifacts are persisted and
    ``day1_done`` after the day-1 index update lands — the two writes
    bound the bootstrap and the daily-marginal phases for the 100x
    tool."""
    import time as _time
    from cdc_data_lake_pyspark_spark.functions.html import main_text_sql
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _stage,
        append_to_minhash_index,
        exact_dedup,
        load_minhash_index,
        minhash_index,
        minhash_probe,
        save_minhash_index,
    )
    from cdc_data_lake_pyspark_spark.queries_phase9 import (
        _HOST_DUP_PPM_MAX,
        _PAGE_SQL,
        _V3_HOST_SQL,
        _V3_URL_SQL,
        _WEB_MIN_CHARS,
    )

    spark = docs.sparkSession
    crawls = (
        docs.select(
            "doc_id",
            F.expr(_DAY0_SQL).alias("day"),
            F.expr(_SRC_SQL).alias("_src"),
        )
        .join(
            docs.select(
                F.col("doc_id").alias("_src"), "text"
            ).filter(F.col("text").isNotNull()),
            "_src",
        )
        .select(
            "doc_id",
            "day",
            F.when(F.col("_src") % 3 == 0, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("label"),
            F.when(
                F.col("_src") % 3 == 0,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    # crawls feeds three consumers (canon + both days' extraction);
    # stage it so the source self-join runs once (measured: unstaged,
    # the day-1 marginal cost re-paid the join — tools/measure_incremental.py)
    crawls = _stage(crawls)
    canon = crawls.select(
        "doc_id",
        "day",
        F.expr(canonical_url_sql(f"({_V3_URL_SQL})")).alias("_c"),
        F.expr(_V3_HOST_SQL).alias("_host"),
    )
    # canon feeds four consumers (day-0 stats, day-0 election, the
    # day-1 frontier twice); stage it so the URL expressions run once
    canon = _stage(canon)
    good0 = (
        canon.filter(F.col("day") == 0)
        .groupBy("_host")
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

    def _gated(url_keep):
        """extraction + min-content gate over URL-keeper survivors —
        identical stage both days (map-only over elected crawls)."""
        survivors = crawls.join(
            url_keep.select("doc_id"), "doc_id", "left_semi"
        )
        extracted = survivors.select(
            "doc_id",
            "label",
            F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("main_text"),
        )
        return _stage(
            extracted.filter(F.length("main_text") >= _WEB_MIN_CHARS)
        )

    # ---- day 0: bootstrap ------------------------------------------------
    url_keep0 = (
        canon.filter(F.col("day") == 0)
        .join(F.broadcast(good0), "_host")
        .groupBy("_c")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    gated0 = _gated(url_keep0)
    seed = gated0.filter(
        F.pmod(portable_id_hash(F.col("doc_id").cast("string")), F.lit(10))
        < _SEED_PCT
    ).select("label", F.col("main_text").alias("text"))
    # persist + reload the model: day 1 scores under the ARTIFACT, the
    # exact train-offline/score-online split a daily pipeline ships
    cleanup_work_dir = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="incr_")
    model_dir = f"{work_dir}/model"
    save_model(nb_train(seed, n_buckets=N_BUCKETS), model_dir)
    model0 = load_model(spark, model_dir, n_buckets=N_BUCKETS)
    scores0 = nb_score(
        gated0.select("doc_id", F.col("main_text").alias("text")),
        model0,
        n_buckets=N_BUCKETS,
    )
    clean0 = _stage(
        gated0.join(
            scores0.filter(F.col("keep") == 1).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    keep0 = _stage(
        exact_dedup(clean0, text_col="main_text").select(
            "fingerprint",
            F.col("keeper_id").alias("doc_id"),
            F.col("n_docs").alias("n_urls"),
        )
    )
    # persist + reload the near-dup index of the kept day-0 corpus —
    # ONE REPRESENTATIVE PER CONTENT GROUP (the dedup keepers), not
    # every kept copy: index size tracks UNIQUE content, not crawl
    # volume, and a day-1 re-crawl probes against ~1 candidate instead
    # of every copy of its content.  Verdicts are unchanged — content
    # groups are exact-duplicate sets (identical main_text ⇒ identical
    # shingle sets ⇒ identical Jaccard to any member).  Measured at
    # 100x: indexing all copies put ~2.9k candidates behind every
    # re-crawl doc and the day-1 probe-verify cost 150 s; keepers cut
    # it an order of magnitude (tools/measure_incremental.py).
    keepers0 = clean0.join(keep0.select("doc_id"), "doc_id", "left_semi")
    index_dir = f"{work_dir}/index"
    save_minhash_index(
        minhash_index(keepers0, text_col="main_text"), index_dir
    )
    index0 = load_minhash_index(spark, index_dir)
    if timings is not None:
        timings["day0_done"] = _time.time()

    # ---- day 1: the increment ---------------------------------------------
    # the URL frontier anti-joins canonical DIGESTS (VERDICT r12 #4): at
    # 100 TB the anti-join shuffles 16-byte md5s instead of full URL
    # strings — the same discipline the v2 keeper election applies to
    # content fingerprints
    seen0 = canon.filter(F.col("day") == 0).select(
        F.md5("_c").alias("_cd")
    )
    fresh1 = (
        canon.filter(F.col("day") == 1)
        .join(F.broadcast(good0), "_host")
        .withColumn("_cd", F.md5("_c"))
        .join(seen0, "_cd", "left_anti")
        .drop("_cd")
    )
    url_keep1 = fresh1.groupBy("_c").agg(F.min("doc_id").alias("doc_id"))
    gated1 = _gated(url_keep1)
    nd_pairs = minhash_probe(
        gated1.select("doc_id", F.col("main_text").alias("text")),
        index0,
        threshold=_ND_THRESHOLD,
        verify_docs=gated1.select(
            "doc_id", F.col("main_text").alias("text")
        ).unionByName(
            keepers0.select("doc_id", F.col("main_text").alias("text"))
        ),
    )
    nd1 = gated1.join(
        nd_pairs.select(F.col("batch_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    scores1 = nb_score(
        nd1.select("doc_id", F.col("main_text").alias("text")),
        model0,
        n_buckets=N_BUCKETS,
    )
    clean1 = _stage(
        nd1.join(
            scores1.filter(F.col("keep") == 1).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    keep1 = _stage(
        exact_dedup(clean1, text_col="main_text").select(
            "fingerprint",
            F.col("keeper_id").alias("doc_id"),
            F.col("n_docs").alias("n_urls"),
        )
    )
    # index UPDATE: tomorrow's probe must see today's accepted content —
    # append the day-1 KEEPERS through the first-class lifecycle API
    # (VERDICT r12 #1: append_to_minhash_index reads params/, applies
    # the keeper discipline — idempotent on the already-elected keepers
    # here — and honors the store's bucket_partitions layout instead of
    # the raw parquet appends that would corrupt a partitioned store;
    # day-2 visibility pinned in tests/test_phase11.py)
    keepers1 = clean1.join(keep1.select("doc_id"), "doc_id", "left_semi")
    append_to_minhash_index(
        index_dir,
        keepers1.select("doc_id", F.col("main_text").alias("text")),
    )
    if timings is not None:
        timings["day1_done"] = _time.time()
    out = keep0.select(
        F.lit(0).cast("int").alias("day"), "doc_id", "fingerprint", "n_urls"
    ).unionByName(
        keep1.select(
            F.lit(1).cast("int").alias("day"),
            "doc_id",
            "fingerprint",
            "n_urls",
        )
    )
    if cleanup_work_dir:
        # the registry entry owns its temp artifacts (ADVICE r12: repeated
        # bench/oracle runs were orphaning one mkdtemp per invocation):
        # eagerly materialize the result — it transitively reads the
        # persisted model/index parquet — then delete the work dir before
        # handing the frame out
        import shutil

        out = out.localCheckpoint()
        shutil.rmtree(work_dir, ignore_errors=True)
    return out
