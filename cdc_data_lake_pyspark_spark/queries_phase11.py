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
    URL frontier (md5-DIGEST anti-join against yesterday's canonicals,
    then per-canonical election) → extraction + min-content gate →
    near-dup probe against the RELOADED day-0 index
    (`load_minhash_index` → `minhash_probe`, exact-verify mode) →
    learned gate under the RELOADED day-0 model (`load_model` →
    `nb_score`) → within-day content dedup → the day-1 survivors,
    appended to the index through `append_to_minhash_index` (the
    layout-honoring lifecycle API, r13).

The N-DAY generalization lives in :func:`daily_refresh_loop` (r13):
the same stages as a day LOOP over four persisted artifacts (host
verdicts, model, keeper index, seen-URL digest store), soaked at the
100x axis by ``tools/measure_daily_soak.py`` (SCALE.md §22).

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
    # exact train-offline/score-online split a daily pipeline ships.
    # An auto-created work dir is cleaned up after the result
    # materializes (ADVICE r12) — but only on the registry path
    # (timings=None): the measurement tools own their dirs and their
    # phase splits must not absorb an in-body materialization.
    cleanup_work_dir = work_dir is None and timings is None
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

    def _append_day1():
        append_to_minhash_index(
            index_dir,
            keepers1.select("doc_id", F.col("main_text").alias("text")),
        )

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
        # eagerly materialize the result, then delete the work dir before
        # handing the frame out.  `out` unions the eagerly _stage()d
        # keep0/keep1 — it reads ONLY checkpoint blocks, not the persisted
        # model/index parquet, which is exactly why (a) overlapping it
        # with the day-1 index append is race-free (the append writes
        # index_dir; out never touches it) and (b) the localCheckpoint
        # outlives the rmtree.  Overlap the two independent chains
        # (r16, guide §2.6); both are joined before the rmtree, and the
        # rmtree rides in a finally so a failed thunk cannot leak the
        # work dir (VERDICT r16 #8).
        import shutil

        from cdc_data_lake_pyspark_spark.concurrency import overlap_jobs

        try:
            _, out = overlap_jobs(
                spark, [_append_day1, lambda: out.localCheckpoint()]
            )
        finally:
            shutil.rmtree(work_dir, ignore_errors=True)
    else:
        # measurement tools and tests own the work dir and time the
        # append inside their day-1 phase — keep it serial there
        _append_day1()
        if timings is not None:
            timings["day1_done"] = _time.time()
    return out


# --------------------------------------------------------------------------
# The N-day soak (VERDICT r12 #3): the 2-day capstone generalized to a
# day loop, so the daily-marginal claim is measured as a CURVE — day k
# probes the artifacts day k-1 left behind, for every k.


def _soak_day_crawls(base, k: int):
    """Day ``k``'s crawl batch over the base corpus: every base doc
    yields one crawl under an id shift of ``k·10⁷`` (≡ 0 mod the
    host/URL/decade residues, so the per-day URL structure is
    day-invariant while every crawl id — and thus every URL — is fresh).
    Pools by base-id residue give each day all four work types a daily
    increment sees:

    * even ids — the SHARED pool (``src = doc_id % 100``): re-crawls of
      content day 0 indexed; must drop at the near-dup PROBE on every
      later day.
    * ``% 8 == 1`` and ``% 8 == 7`` — today's FRESH pool
      (``src = 100 + doc_id % 50 + 50k``): content that did not exist
      before today; must pass the probe and face only the learned gate.
    * ``% 8 == 3`` — YESTERDAY re-crawls (``src`` of day k−1's fresh
      pool): fresh URL, yesterday's content — drops at the probe IFF
      day k−1's keepers actually entered the index (the generalized
      day-2 visibility pin).
    * ``% 8 == 5`` — yesterday-URL re-crawls (URL computed from the
      day-(k−1) crawl id): must drop at the URL FRONTIER against the
      persisted seen-URL digest store, before extraction ever runs.

    The frame also carries ``_vec`` — the id of the crawl's embedding
    in the driver ``embeddings`` table, keyed by CONTENT SOURCE
    (re-embedding identical content reproduces its vector).  One
    vector-specific pool rides on top for the MULTIMODAL loop
    (``daily_refresh_loop(embeddings=...)``): ``% 16 == 7`` items are
    PARAPHRASES — today's fresh TEXT but YESTERDAY'S fresh-pool
    embedding — so they pass the text probe and must drop at the
    VECTOR probe iff yesterday's keepers actually entered the encoded
    store (the vector twin of the ``% 8 == 3`` visibility pin).  The
    text-only loop ignores the column, so the r12/r13 text-soak
    fixture is unchanged.
    """
    kk = F.lit(k)
    shifted = F.col("doc_id") + F.lit(k * 10_000_000)
    # yesterday-URL pool: reuse the URL that base doc ``id − 4`` (the
    # ``% 8 == 1`` fresh-pool neighbor) actually presented on day k−1 —
    # its digest is in the seen store, so the frontier must drop it
    prev_shift = F.col("doc_id") - F.lit(4) + F.lit(
        max(k - 1, 0) * 10_000_000
    )
    src = (
        F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") % 100)
        .when(
            F.col("doc_id") % 8 == 3,
            F.lit(100) + F.col("doc_id") % 50 + 50 * F.lit(max(k - 1, 0)),
        )
        .otherwise(F.lit(100) + F.col("doc_id") % 50 + 50 * kk)
        .cast("long")
    )
    url_id = F.when(
        (F.col("doc_id") % 8 == 5) & (kk > 0), prev_shift
    ).otherwise(shifted)
    vec = F.when(
        (F.col("doc_id") % 16 == 7) & (kk > 0),
        F.lit(100) + F.col("doc_id") % 50 + 50 * F.lit(max(k - 1, 0)),
    ).otherwise(src).cast("long")
    return (
        base.select(
            shifted.alias("crawl_id"),
            url_id.alias("_url_id"),
            src.alias("_src"),
            vec.alias("_vec"),
        )
        .join(
            base.select(F.col("doc_id").alias("_src"), "text"),
            "_src",
        )
        .select(
            F.col("crawl_id").alias("doc_id"),
            "_url_id",
            "_vec",
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


def refold_host_stats(
    spark, hosts_dir: str, target_files: int = 1, day_tagged: bool = False
) -> None:
    """Sum-REFOLD compaction for the cumulative host-reputation store
    (VERDICT r13 #4): the daily loop appends one per-host sufficient-
    statistics row-set per day, so the store's file count grows
    linearly in days — and it is NOT distinct-compactable (two days
    with identical ``(_host, _n, _u)`` rows must BOTH count in the
    cumulative fold).  This rewrites days 0..k as ONE snapshot row per
    host — ``(host, Σn, Σu)`` — behind the same crash-recoverable swap
    as every other store rewrite.  Read-equivalence is by associativity
    of the downstream aggregate: the gate always reads the store
    through ``groupBy(_host).agg(sum, sum)``, and summing a pre-summed
    snapshot is the same fold (verdict identity pinned in
    tests/test_phase11.py).

    ``day_tagged`` (the ``exactly_once`` loop's variant, VERDICT r14
    #5): rows carry a writer ``_day`` column; the fold distinct-folds
    first (a crash-rerun's re-append is a byte-identical ``(_host, _n,
    _u, _day)`` row set and must count ONCE, while two legitimate days
    with identical stats keep distinct ``_day`` values and both count)
    and emits the snapshot under ``_day`` NULL — which every later
    day's null-safe own-day exclusion keeps, exactly like an untagged
    bootstrap row."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _swap_compact_store,
    )

    if day_tagged:
        _swap_compact_store(
            spark,
            hosts_dir,
            "_host STRING, _n BIGINT, _u BIGINT, _day INT",
            target_files,
            fold=lambda df: df.distinct()
            .groupBy("_host")
            .agg(F.sum("_n").alias("_n"), F.sum("_u").alias("_u"))
            .withColumn("_day", F.lit(None).cast("int")),
        )
        return
    _swap_compact_store(
        spark,
        hosts_dir,
        "_host STRING, _n BIGINT, _u BIGINT",
        target_files,
        fold=lambda df: df.groupBy("_host").agg(
            F.sum("_n").alias("_n"), F.sum("_u").alias("_u")
        ),
    )


def daily_refresh_loop(
    docs,
    n_days: int = 7,
    work_dir: str | None = None,
    compact_every: int = 0,
    day_metrics: list | None = None,
    embeddings=None,
    vec_threshold: float = 0.35,
    vec_n_probe: int = 4,
    exactly_once: bool = True,
    _crash_after_appends_on_day: int | None = None,
):
    """Run the corpus-refresh pipeline as an N-DAY LOOP over persisted
    artifacts — the soak the 2-day oracled capstones
    (:func:`prepare_web_corpus_incremental`, and with ``embeddings``
    the multimodal ``prepare_multimodal_incremental``) are the
    correctness witnesses for.  Day 0 bootstraps and persists FOUR
    artifacts (cumulative per-host reputation statistics, classifier
    model, MinHash keeper index, seen-URL digest store); every later
    day RELOADS them from parquet, runs

        host gate → URL frontier (md5-digest anti-join against the
        seen store) → extraction + min-content gate → near-dup probe
        (ESTIMATE mode — no corpus text is ever re-read) → [vector
        probe] → learned gate → within-day content dedup

    and appends its keepers through :func:`append_to_minhash_index`,
    its canonical digests to the seen store, and its per-host
    sufficient statistics to the reputation store (day k+1 gates under
    the aggregate over days 0..k) — so day k's probe and gates run
    against exactly what days 0..k−1 left on disk.  ``compact_every=C``
    runs :func:`compact_minhash_index` after every C-th day (the
    offline maintenance a real deployment schedules).

    ``embeddings`` (a ``(vec_id, embedding)`` frame, VERDICT r13 #1)
    turns the loop MULTIMODAL: a FIFTH persisted artifact — the
    encoded-corpus IVF store
    (:func:`~cdc_data_lake_pyspark_spark.operators.similarity.save_ivf_corpus_index`)
    — is bootstrapped from the day-0 keepers' embeddings (each crawl's
    embedding keyed by content source via the fixture's ``_vec``
    column), and every later day's text-probe survivors are ALSO
    vector-probed against it
    (:func:`~cdc_data_lake_pyspark_spark.operators.similarity.probe_ivf_corpus_index`
    — partition-pruned to the batch's probed cells) before the learned
    gate; keepers append through ``append_to_ivf_corpus_index`` and
    ``compact_every`` also folds the encoded store.  This is the one
    composition a 100 TB training-data refresh actually runs: each
    day's crawl deduped by text AND by its re-embedded vectors against
    both persisted stores.

    Scale shape per day: everything is batch-sized except the two
    against-history joins, both of which touch compressed artifacts —
    the frontier anti-join moves 16-byte digests and the probe's
    candidate join reads the banded bucket store (tracks unique
    content, not crawl volume).  ``day_metrics`` (a list, when given)
    receives one dict per day: wall, phase drop counts, kept rows, and
    artifact file counts — the SCALE.md §22 curve.

    Returns the ``(day, doc_id, fingerprint, n_urls)`` union of every
    day's keepers.  Fixture: :func:`_soak_day_crawls` (all four daily
    work types present every day; per-day non-degeneracy is asserted by
    the soak tool, the r12 lesson).

    RESTART CONTRACT (``exactly_once=True``, VERDICT r14 #5 — the
    streaming gates' discipline at day granularity): a SEVENTH
    persisted artifact, the per-day manifest (``days/``, one row per
    completed day, written LAST), plus a persisted ``keepers/`` store,
    make re-invoking the loop over an existing ``work_dir`` converge:

    * a MANIFESTED day is skipped outright (its keepers are read back
      from the store) — guarded by an INPUT FINGERPRINT (ADVICE r15):
      every manifest row records an order-independent digest + row
      count of the input frame, and a re-invocation whose input
      doesn't match raises instead of silently returning stale
      keepers;
    * an UNMANIFESTED day whose appends partially landed (the crash
      window this loop previously could not survive) re-runs with the
      dead attempt's rows EXCLUDED — every append is tagged with its
      writer day (``writer_id=k`` on both index appends, a ``_day``
      column on the host-stats and seen-URL rows), and the day's reads
      filter out their own day's tags null-safely, so the re-run
      reproduces the clean verdicts; its re-appends are byte-identical
      and fold downstream (distinct for keepers/digests/index rows,
      the ``_day``-scoped distinct for the host sufficient statistics);
    * compaction runs only AFTER the day's manifest row, uses
      batch_id/_day-PRESERVING rewrites (the batch compactors refuse
      tagged stores by design), and is crash-recoverable by the swap.

    Crash-rerun convergence to the clean-run keepers is pinned in
    tests/test_daily_manifest.py.  With ``exactly_once=False`` the
    legacy restart-from-scratch measurement shape is preserved
    (untagged appends, no manifest reads/writes) for soak
    comparability with the r13/r14 artifacts."""
    import time as _time

    from cdc_data_lake_pyspark_spark.functions.html import main_text_sql
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        _stage,
        append_to_minhash_index,
        compact_minhash_index,
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
    cleanup_work_dir = work_dir is None
    work_dir = work_dir or tempfile.mkdtemp(prefix="soak_")
    model_dir, index_dir = f"{work_dir}/model", f"{work_dir}/index"
    hosts_dir, seen_dir = f"{work_dir}/hosts", f"{work_dir}/seen_urls"
    vec_dir = f"{work_dir}/vectors"
    if embeddings is not None:
        from cdc_data_lake_pyspark_spark.operators.similarity import (
            append_to_ivf_corpus_index,
            compact_ivf_corpus_index,
            fit_ivf_pq,
            probe_ivf_corpus_index,
            save_ivf_corpus_index,
        )

        emb = embeddings.select("vec_id", "embedding")

        def _vec_batch(ids_frame, crawls):
            """(vec_id = crawl doc_id, embedding) for a set of crawl
            ids — the crawl's content-keyed embedding via ``_vec``."""
            return (
                ids_frame.select("doc_id")
                .join(crawls.select("doc_id", "_vec"), "doc_id")
                .join(
                    emb.select(
                        F.col("vec_id").alias("_vec"), "embedding"
                    ),
                    "_vec",
                )
                .select(F.col("doc_id").alias("vec_id"), "embedding")
            )

    base = _stage(
        docs.select("doc_id", "text").filter(F.col("text").isNotNull())
    )
    url_expr = _V3_URL_SQL.replace("doc_id", "_url_id")
    host_expr = _V3_HOST_SQL.replace("doc_id", "_url_id")
    days_dir, keepers_dir = f"{work_dir}/days", f"{work_dir}/keepers"
    manifested: set = set()
    input_fp: tuple = (None, None)
    if exactly_once:
        import os as _os

        from cdc_data_lake_pyspark_spark.operators.dedup_text import (
            _recover_halfswap,
        )

        # input fingerprint (ADVICE r15): an order-independent content
        # digest + row count of the input frame, recorded with every
        # day's manifest row.  Without it, re-invoking over an existing
        # work_dir with a DIFFERENT input silently skips manifested
        # days and returns stale keepers; with it, the mismatch raises.
        # bit_xor folds per-row xxhash64 digests commutatively, so the
        # digest is partitioning- and order-insensitive — one aggregate
        # over the staged base frame per invocation.
        fp_row = base.agg(
            F.expr("bit_xor(xxhash64(doc_id, text))").alias("_fp"),
            F.count(F.lit(1)).alias("_rows"),
        ).collect()[0]
        input_fp = (fp_row["_fp"], fp_row["_rows"])
        _recover_halfswap(days_dir)
        if _os.path.isdir(days_dir):
            # bounded collect: one row per completed day.  Pre-r16
            # manifests carry only _day; their _fp/_rows read as NULL
            # and are exempt from the fingerprint check.
            rows = (
                spark.read.schema("_day INT, _fp BIGINT, _rows BIGINT")
                .parquet(days_dir)
                .collect()
            )
            manifested = {r["_day"] for r in rows}
            stale = {
                (r["_fp"], r["_rows"])
                for r in rows
                if r["_rows"] is not None
                and (r["_fp"], r["_rows"]) != input_fp
            }
            if stale:
                raise ValueError(
                    f"daily_refresh_loop: work_dir {work_dir!r} holds "
                    f"day manifests written from a DIFFERENT input "
                    f"frame (stored fingerprint(s) {sorted(stale)} != "
                    f"current {input_fp}); skipping those days would "
                    "return stale keepers.  Use a fresh work_dir for a "
                    "new input, or re-invoke with the original frame."
                )
    outs = []
    for k in range(n_days):
        if k in manifested:
            # completed by a previous invocation — every artifact
            # already reflects this day; keepers come from the store
            if day_metrics is not None:
                day_metrics.append({"day": k, "skipped": True})
            continue
        t0 = _time.time()
        m: dict = {"day": k}
        crawls = _stage(_soak_day_crawls(base, k))
        canon = _stage(
            crawls.select(
                "doc_id",
                F.expr(canonical_url_sql(f"({url_expr})")).alias("_c"),
                F.expr(host_expr).alias("_host"),
            )
        )
        # host reputation is CUMULATIVE: each day appends its per-host
        # (crawls, distinct-canonicals) sufficient statistics to the
        # persisted store (tiny — one row per host per day), and day k
        # gates under the aggregate over days 0..k−1 — "yesterday's
        # reputation" means all history, not a frozen day-0 snapshot.
        # The statistic is WITHIN-day URL duplication (Σn − Σu), the
        # spammy-structure signal: cross-day re-crawls of a canonical
        # are legitimate and intentionally do not count against a host.
        # No day's canonicals are ever re-read — only the folded stats.
        day_stats = canon.groupBy("_host").agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct("_c").alias("_u"),
        )
        if exactly_once:
            # the writer-day tag: the exactly-once key for this store —
            # a crash-rerun of day k excludes _day = k (its own dead
            # attempt's leak), and the _day-scoped distinct below folds
            # any double-appended day's byte-identical row set while two
            # LEGITIMATE days with identical stats still both count
            day_stats = day_stats.withColumn(
                "_day", F.lit(k).cast("int")
            )
        if k == 0:
            # bootstrap: day 0 gates under its own crawl's stats
            day_stats.write.mode("overwrite").parquet(hosts_dir)
        hosts_hist = spark.read.parquet(hosts_dir)
        if exactly_once:
            if "_day" not in hosts_hist.columns:
                hosts_hist = hosts_hist.withColumn(
                    "_day", F.lit(None).cast("int")
                )
            if k > 0:
                hosts_hist = hosts_hist.filter(
                    ~F.col("_day").eqNullSafe(F.lit(k))
                )
            hosts_hist = hosts_hist.distinct()
        good = (
            hosts_hist
            .groupBy("_host")
            .agg(F.sum("_n").alias("_n"), F.sum("_u").alias("_u"))
            .filter(
                F.round(
                    F.lit(1e6)
                    * (F.col("_n") - F.col("_u")).cast("double")
                    / F.col("_n").cast("double")
                ).cast("bigint")
                <= _HOST_DUP_PPM_MAX
            )
            .select("_host")
            # pin the verdicts BEFORE today's stats append below — the
            # lazy scan would otherwise pick up day k's own files
            .localCheckpoint()
        )
        if k > 0:
            day_stats.write.mode("append").parquet(hosts_dir)
        gated_hosts = canon.join(F.broadcast(good), "_host")
        if k == 0:
            frontier = gated_hosts
            m["frontier_drops"] = 0
        else:
            # the persisted seen-URL digest store: 16-byte md5 anti-join
            # (repair a half-finished compaction swap before reading)
            from cdc_data_lake_pyspark_spark.operators.dedup_text import (
                _recover_halfswap,
            )

            _recover_halfswap(seen_dir)
            if exactly_once:
                # exclude the day's own leaked digests (a dead attempt's
                # append would otherwise anti-join away the entire day)
                seen = (
                    spark.read.schema("_cd STRING, _day INT")
                    .parquet(seen_dir)
                    .filter(~F.col("_day").eqNullSafe(F.lit(k)))
                    .select("_cd")
                )
            else:
                seen = spark.read.schema("_cd string").parquet(seen_dir)
            frontier = (
                gated_hosts.withColumn("_cd", F.md5("_c"))
                .join(seen, "_cd", "left_anti")
                .drop("_cd")
            )
            frontier = _stage(frontier)
            if day_metrics is not None:
                m["frontier_drops"] = (
                    gated_hosts.count() - frontier.count()
                )
        url_keep = frontier.groupBy("_c").agg(
            F.min("doc_id").alias("doc_id")
        )
        survivors = crawls.join(
            url_keep.select("doc_id"), "doc_id", "left_semi"
        )
        gated = _stage(
            survivors.select(
                "doc_id",
                "label",
                F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias(
                    "main_text"
                ),
            ).filter(F.length("main_text") >= _WEB_MIN_CHARS)
        )
        if k == 0:
            seed = gated.filter(
                F.pmod(
                    portable_id_hash(F.col("doc_id").cast("string")),
                    F.lit(10),
                )
                < _SEED_PCT
            ).select("label", F.col("main_text").alias("text"))
            save_model(nb_train(seed, n_buckets=N_BUCKETS), model_dir)
            nd = gated
            m["probe_drops"] = 0
        else:
            # ESTIMATE-mode probe from disk: candidate discovery against
            # the stored buckets, Broder estimate from stored signatures —
            # the corpus text is never re-read (re-crawls here are exact
            # copies, estimate = 1.0)
            index = load_minhash_index(
                spark,
                index_dir,
                exclude_writer=k if exactly_once else None,
            )
            nd_pairs = minhash_probe(
                gated.select("doc_id", F.col("main_text").alias("text")),
                index,
                threshold=0.8,
            )
            nd = _stage(
                gated.join(
                    nd_pairs.select(
                        F.col("batch_id").alias("doc_id")
                    ).distinct(),
                    "doc_id",
                    "left_anti",
                )
            )
            if day_metrics is not None:
                m["probe_drops"] = gated.count() - nd.count()
        if embeddings is not None:
            if k == 0:
                m["vec_drops"] = 0
            else:
                # the VECTOR family: text-probe survivors' embeddings
                # against the persisted encoded store — partition-pruned
                # to the batch's probed cells, exact-cosine verdicts
                vec_pairs = probe_ivf_corpus_index(
                    spark,
                    vec_dir,
                    _vec_batch(nd, crawls),
                    threshold=vec_threshold,
                    n_probe=vec_n_probe,
                    exclude_writer=k if exactly_once else None,
                )
                nd2 = _stage(
                    nd.join(
                        vec_pairs.select(
                            F.col("batch_id").alias("doc_id")
                        ).distinct(),
                        "doc_id",
                        "left_anti",
                    )
                )
                if day_metrics is not None:
                    m["vec_drops"] = nd.count() - nd2.count()
                nd = nd2
        model = load_model(spark, model_dir, n_buckets=N_BUCKETS)
        scores = nb_score(
            nd.select("doc_id", F.col("main_text").alias("text")),
            model,
            n_buckets=N_BUCKETS,
        )
        clean = _stage(
            nd.join(
                scores.filter(F.col("keep") == 1).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        )
        if day_metrics is not None:
            m["model_drops"] = nd.count() - clean.count()
        keep = _stage(
            exact_dedup(clean, text_col="main_text").select(
                "fingerprint",
                F.col("keeper_id").alias("doc_id"),
                F.col("n_docs").alias("n_urls"),
            )
        )
        keepers = clean.join(keep.select("doc_id"), "doc_id", "left_semi")
        digests = canon.select(F.md5("_c").alias("_cd")).distinct()
        if exactly_once:
            digests = digests.withColumn("_day", F.lit(k).cast("int"))
        if k == 0:
            save_minhash_index(
                minhash_index(keepers, text_col="main_text"), index_dir
            )
            digests.write.mode("overwrite").parquet(seen_dir)
            if embeddings is not None:
                # the FIFTH artifact: encoded-corpus IVF store of the
                # day-0 keepers' embeddings; quantizer fit once on the
                # embedding table (cell layout is then immutable — the
                # append path re-encodes with the artifact's own prefit)
                save_ivf_corpus_index(
                    _vec_batch(keepers, crawls),
                    fit_ivf_pq(
                        emb, n_clusters=16, m_sub=8, k=16, seed=42
                    ),
                    vec_dir,
                )
        else:
            append_to_minhash_index(
                index_dir,
                keepers.select("doc_id", F.col("main_text").alias("text")),
                writer_id=k if exactly_once else None,
            )
            digests.write.mode("append").parquet(seen_dir)
            if embeddings is not None:
                append_to_ivf_corpus_index(
                    vec_dir,
                    _vec_batch(keepers, crawls),
                    writer_id=k if exactly_once else None,
                )
        if exactly_once:
            # the day's keepers persist too (the loop's OUTPUT must be
            # reconstructable on resume), then the manifest row LAST —
            # the crash window between any append above and this line
            # re-runs the day with its own tags excluded; re-appended
            # rows are byte-identical and fold downstream
            keep.select(
                F.lit(k).cast("int").alias("day"),
                "doc_id",
                "fingerprint",
                "n_urls",
            ).write.mode("append").parquet(keepers_dir)
            if _crash_after_appends_on_day == k:
                raise RuntimeError(
                    f"injected crash: day {k} appends landed, manifest "
                    "not written (tests/test_daily_manifest.py)"
                )
            from cdc_data_lake_pyspark_spark.localrel import tiny_frame

            tiny_frame(
                spark,
                [(k, input_fp[0], input_fp[1])],
                "_day INT, _fp BIGINT, _rows BIGINT",
            ).coalesce(1).write.mode("append").parquet(days_dir)
        if compact_every and k > 0 and k % compact_every == 0:
            from cdc_data_lake_pyspark_spark.operators.dedup_text import (
                _swap_compact_store,
            )

            if exactly_once:
                # tag-PRESERVING compaction (the batch compactors refuse
                # writer-tagged stores by design — their fixed schemas
                # would erase the exclusion key): distinct-fold each
                # store WITH its batch_id/_day column.  Safe here
                # because compaction runs only after this day's manifest
                # row — the swap itself is crash-recoverable, and a
                # crash between manifest and compaction just skips the
                # maintenance until the next compaction day.
                _swap_compact_store(
                    spark,
                    f"{index_dir}/signatures",
                    "doc_id BIGINT, sig ARRAY<BIGINT>, batch_id BIGINT",
                    4,
                )
                _swap_compact_store(
                    spark,
                    f"{index_dir}/buckets",
                    "doc_id BIGINT, band INT, bucket BIGINT, "
                    "batch_id BIGINT",
                    4,
                )
                _swap_compact_store(
                    spark, seen_dir, "_cd STRING, _day INT", 4
                )
                if embeddings is not None:
                    _swap_compact_store(
                        spark,
                        f"{vec_dir}/encoded",
                        "vec_id BIGINT, embedding ARRAY<DOUBLE>, "
                        "codes ARRAY<INT>, cell INT, batch_id BIGINT",
                        4,
                        "cell",
                    )
            else:
                compact_minhash_index(spark, index_dir)
                # the seen-URL digest store accumulates one file set per
                # day too; digests are idempotent (seen twice = seen), so
                # the distinct-folding swap rewrite is verdict-preserving.
                _swap_compact_store(spark, seen_dir, "_cd STRING", 4)
                if embeddings is not None:
                    compact_ivf_corpus_index(spark, vec_dir)
            # the host-stats store is NOT distinct-compactable (two
            # days with identical (host, n, u) rows must both count) —
            # its maintenance is the sum-REFOLD: days 0..k become one
            # snapshot row per host, read-equivalent under the gate's
            # cumulative aggregate (VERDICT r13 #4; the day-tagged
            # variant distinct-folds leaked duplicates first and emits
            # the snapshot under _day NULL, which every later
            # exclusion keeps)
            refold_host_stats(spark, hosts_dir, day_tagged=exactly_once)
        if day_metrics is not None:
            m["kept_rows"] = keep.count()
            m["wall_sec"] = round(_time.time() - t0, 2)
            import os as _os

            stores = [
                ("signatures", f"{index_dir}/signatures"),
                ("buckets", f"{index_dir}/buckets"),
                ("hosts", hosts_dir),
            ]
            if embeddings is not None:
                stores.append(("vectors", f"{vec_dir}/encoded"))
            for sub, root in stores:
                m[f"{sub}_files"] = sum(
                    1
                    for _, _, fs in _os.walk(root)
                    for f in fs
                    if f.endswith(".parquet")
                )
            day_metrics.append(m)
        outs.append(
            keep.select(
                F.lit(k).cast("int").alias("day"),
                "doc_id",
                "fingerprint",
                "n_urls",
            )
        )
    if exactly_once:
        # the persisted keepers store is the authoritative output: it
        # covers days skipped as already-manifested, and its distinct
        # folds a crash-rerun's byte-identical re-append
        result = (
            spark.read.schema(
                "day INT, doc_id BIGINT, fingerprint STRING, "
                "n_urls BIGINT"
            )
            .parquet(keepers_dir)
            .distinct()
        )
    else:
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
    if cleanup_work_dir:
        # an auto-created work dir is the loop's to clean up (the
        # ADVICE r12 discipline the 2-day entry follows): materialize
        # the result — its staged keeper frames transitively read the
        # persisted artifacts — then delete the artifact tree
        import shutil

        result = result.localCheckpoint()
        shutil.rmtree(work_dir, ignore_errors=True)
    return result
