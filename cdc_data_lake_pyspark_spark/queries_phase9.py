"""Phase-9 inventory (round 6): raw-web main-content extraction and the
streaming gates' single-batch reductions under the value-check gate.

* ``html_extract_main`` — the missing FIRST stage of the LLM data
  pipeline: HTML → visible main content (boilerplate removal) before any
  quality gate or dedup runs.  The extractor
  (:mod:`~cdc_data_lake_pyspark_spark.functions.html`) is one map-only
  scalar expression generated for both dialects from one template, so
  the oracle hash-compares every extracted string.  The entry builds a
  deterministic HTML page around each ``documents`` row (nav boilerplate,
  script/style/comment noise, entity-encoded suffix, link-dense and
  too-short lines) in BOTH engines and extracts — a planted-fixture
  roundtrip at corpus scale.

* ``novelty_gate_batch`` / ``semantic_gate_batch`` — the pure
  ``(batch, index) → novel`` reductions of
  :class:`~cdc_data_lake_pyspark_spark.streaming.novelty.StreamingNoveltyGate`
  and
  :class:`~cdc_data_lake_pyspark_spark.streaming.semantic.StreamingSemanticGate`
  (every other streaming property — slicing invariance, replay
  idempotence, Bloom-path equality — stays pinned in the soak tests;
  these entries put the per-batch VALUE semantics under the DuckDB
  oracle).  Index/batch are carved from the driver tables by id residue,
  so both engines derive identical state.

* ``prepare_web_corpus`` — the raw-web capstone DAG: page → extraction →
  minimum-content gate → exact-dedup keeper election on the EXTRACTED
  text → deterministic split.  Duplicate pages are planted by an
  id-residue rule in both engines; they collapse only because extraction
  strips the per-page boilerplate first.

* r9-r10 URL-level stages and capstones: ``url_dedup_canonical``
  (canonical-URL keeper election — the cheapest dedup stage),
  ``host_filter_docs`` (host-level dup-rate gate — drop whole
  boilerplate-farm hosts), ``prepare_web_corpus_v2`` (URL dedup as
  stage 0, BEFORE extraction) and ``prepare_web_corpus_v3`` (the full
  canonical order: host gate → URL keeper → extract → content gate →
  content dedup → split, with size-invariant planted work at every
  stage).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.html import (
    extract_main_text,
    main_text_sql,
)
from cdc_data_lake_pyspark_spark.queries import _t, query

# --------------------------------------------------------------------------
# html_extract_main
# --------------------------------------------------------------------------

#: page template in ANSI SQL (identical text in both dialects): nav bar
#: (pure links → dropped), short heading (dropped), the document text in
#: a paragraph with an entity-encoded suffix (kept, entities decoded), a
#: mostly-text paragraph with one small link (kept), comment/script/style
#: noise (removed before segmentation), tiny footer (dropped).
_PAGE_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || "
    "'</title><style>body{margin:0}</style>"
    "<script>if(1<2){track()}</script></head><body>"
    "<nav><a href=\"/\">Home</a> <a href=\"/docs\">All documents</a> "
    "<a href=\"/help\">Help center</a></nav>"
    "<h1>Doc ' || CAST(doc_id AS STRING) || '</h1>"
    "<p>' || text || ' &amp; trailing &lt;entities&gt; decoded.</p>"
    "<p>Visit the <a href=\"/next\">next page</a> for more of the corpus "
    "text stream and related entries.</p>"
    "<!-- build 1234 --><div>x</div>"
    "<footer>(c) corpus</footer></body></html>'"
)


@query(
    "html_extract_main",
    oracle=f"""
    SELECT doc_id,
           {main_text_sql(_PAGE_SQL, duck=True)} AS main_text,
           CAST(length({main_text_sql(_PAGE_SQL, duck=True)}) AS INT)
             AS n_chars
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def html_extract_main(spark, sf_dir):
    """Boilerplate removal over a planted-HTML corpus: wrap every
    document in the deterministic page template above, then extract the
    main content (Readability/jusText-style min-length + link-density
    line filter; ``functions/html.py``).  Expected survivors per page:
    the document paragraph (entities decoded) and the mostly-text link
    paragraph; nav/heading/footer/comment/script/style all drop.

    Plan shape: ONE projection — template concat + the generated
    extraction expression — inside whole-stage codegen; zero shuffle,
    zero UDF, trivially parallel at any corpus size."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        extract_main_text(f"({_PAGE_SQL})").alias("main_text"),
    ).select(
        "doc_id",
        "main_text",
        F.length("main_text").cast("int").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# novelty_gate_batch
# --------------------------------------------------------------------------


@query(
    "novelty_gate_batch",
    oracle="""
    WITH firsts AS (
      SELECT md5(lower(trim(text))) AS fp,
             CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM documents
      WHERE doc_id % 3 = 0 AND text IS NOT NULL
      GROUP BY 1
    ), idx AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp
      FROM documents
      WHERE doc_id % 3 <> 0 AND text IS NOT NULL
    )
    SELECT f.fp, f.doc_id
    FROM firsts f LEFT JOIN idx i ON f.fp = i.fp
    WHERE i.fp IS NULL
    """,
)
def novelty_gate_batch(spark, sf_dir):
    """The streaming novelty gate's single-batch reduction
    (``streaming/novelty.py::StreamingNoveltyGate.batch_reduce``) on a
    deterministic state split: documents with ``doc_id % 3 != 0`` form
    the ingested fingerprint index, the rest arrive as one micro-batch.
    Output = the batch's novel fingerprints with their keeper ids —
    exactly what ``process_batch`` would append.

    Scale: one digest groupBy on the batch (map-side first-per-fp
    combine) + one anti-join against an index of 32-byte digests; the
    corpus text never re-shuffles."""
    from cdc_data_lake_pyspark_spark.streaming.novelty import (
        StreamingNoveltyGate,
        document_fingerprint,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    index = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(document_fingerprint().alias("fp"))
        .distinct()
    )
    gate = StreamingNoveltyGate(index_dir="/nonexistent-unused")
    return gate.batch_reduce(batch, index)


# --------------------------------------------------------------------------
# semantic_gate_batch
# --------------------------------------------------------------------------

_SEM_THRESHOLD = 0.4
_SEM_PLANES = 6
_SEM_TABLES = 8
_SEM_SEED = 42
_SEM_DIM = 64


def _semantic_gate_batch_oracle() -> str:
    """Replay the semantic gate's batch reduction with the seeded
    hyperplanes pinned as literals (the ``dedup_embedding_cosine_lsh``
    oracle technique): within-batch banded min-id prune, then bucket
    probe + exact rescore against the index slice."""
    from cdc_data_lake_pyspark_spark.queries_phase2 import _planes_values_sql

    planes = _planes_values_sql(
        _SEM_DIM, _SEM_PLANES, _SEM_TABLES, _SEM_SEED
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), planes(tbl, plane, h) AS (
      VALUES {planes}
    ), sig AS (
      SELECT e.vec_id, p.tbl,
             SUM(CASE WHEN list_dot_product(e.v, p.h) >= 0
                      THEN 1 << p.plane ELSE 0 END) AS bkt
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ), batch AS (SELECT vec_id FROM e WHERE vec_id % 5 = 0),
    idx AS (SELECT vec_id FROM e WHERE vec_id % 5 <> 0),
    in_batch_pairs AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM sig a JOIN sig b
        ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
      JOIN batch ba ON a.vec_id = ba.vec_id
      JOIN batch bb ON b.vec_id = bb.vec_id
    ), dropped AS (
      SELECT DISTINCT p.b_id AS vec_id FROM in_batch_pairs p
      JOIN e ea ON p.a_id = ea.vec_id
      JOIN e eb ON p.b_id = eb.vec_id
      WHERE list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v))
             * sqrt(list_dot_product(eb.v, eb.v))) >= {_SEM_THRESHOLD}
    ), survivors AS (
      SELECT vec_id FROM batch
      WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ), matched AS (
      SELECT DISTINCT s.vec_id
      FROM survivors s
      JOIN sig ss ON s.vec_id = ss.vec_id
      JOIN sig si ON ss.tbl = si.tbl AND ss.bkt = si.bkt
      JOIN idx i ON si.vec_id = i.vec_id
      JOIN e es ON s.vec_id = es.vec_id
      JOIN e ei ON si.vec_id = ei.vec_id
      WHERE list_dot_product(es.v, ei.v)
            / (sqrt(list_dot_product(es.v, es.v))
             * sqrt(list_dot_product(ei.v, ei.v))) >= {_SEM_THRESHOLD}
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id FROM survivors
    WHERE vec_id NOT IN (SELECT vec_id FROM matched)
    """


@query("semantic_gate_batch", oracle=_semantic_gate_batch_oracle)
def semantic_gate_batch(spark, sf_dir):
    """The streaming semantic gate's single-batch reduction
    (``streaming/semantic.py::StreamingSemanticGate.batch_reduce``) on a
    deterministic state split: vectors with ``vec_id % 5 != 0`` are the
    ingested index (bucketed under the gate's fixed seeded hyperplanes),
    the rest arrive as one micro-batch.  Output = the batch's
    semantically-novel vector ids — exactly what ``process_batch`` would
    append (modulo the per-bucket explosion).

    Scale: banded candidate generation + one co-located (table, bucket)
    join against the index — never an all-pairs scan; the oracle replays
    bucketing and rescoring end-to-end with the planes as literals."""
    from cdc_data_lake_pyspark_spark.streaming.semantic import (
        StreamingSemanticGate,
    )

    emb = _t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    gate = StreamingSemanticGate(
        index_dir="/nonexistent-unused",
        threshold=_SEM_THRESHOLD,
        dim=_SEM_DIM,
        n_planes=_SEM_PLANES,
        n_tables=_SEM_TABLES,
        seed=_SEM_SEED,
    )
    index = gate._with_buckets(
        emb.filter(F.col("vec_id") % 5 != 0), "vec_id", "v"
    ).select("tbl", "bkt", F.col("vec_id").cast("long"), "v")
    return (
        gate.batch_reduce(batch, index)
        .select(F.col("vec_id").cast("long").alias("vec_id"))
    )


# --------------------------------------------------------------------------
# prepare_web_corpus — the raw-web capstone composite
# --------------------------------------------------------------------------

_WEB_MIN_CHARS = 80


def _prepare_web_corpus_oracle() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql

    ex = main_text_sql(_PAGE_SQL, duck=True)
    split_hash = _hash_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (
      -- plant exact duplicates deterministically: every doc with
      -- doc_id >= 400 serves the TEXT of doc (doc_id % 400), so dup
      -- groups exist by construction and the dedup stage has real work
      SELECT d.doc_id, s.text
      FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 400
      WHERE s.text IS NOT NULL
    ), ex AS (
      SELECT doc_id, {ex} AS main_text
      FROM base
    ), gated AS (
      SELECT doc_id, main_text FROM ex
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), keep AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM gated GROUP BY 1
    )
    SELECT doc_id, fingerprint, n_docs,
           CASE WHEN {split_hash} % 100 < 80 THEN 'train'
                WHEN {split_hash} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keep
    """


@query("prepare_web_corpus", oracle=_prepare_web_corpus_oracle)
def prepare_web_corpus(spark, sf_dir):
    """The raw-web capstone DAG the r5 verdict called the one missing
    stage family, now end-to-end: HTML page → main-content extraction
    (``functions/html.py``) → minimum-content gate → exact-dedup keeper
    election on the EXTRACTED text → deterministic 80/10/10 split.
    Boilerplate is shared across pages by construction (nav/footer
    template), so dedup must fire on content, not chrome — extraction
    first is what makes the digest meaningful.  Exact duplicates are
    planted deterministically (docs with id >= 400 serve the text of
    id % 400 — same rule in both engines), so keeper election collapses
    real groups.  NOTE: the page TITLE embeds the serving doc's own id,
    but titles are boilerplate the extractor drops — only because
    extraction runs first do the planted duplicates hash identically.

    Plan shape: extraction + gate are one map-only projection; dedup is
    one digest groupBy (32-byte digests, map-side combined); split is
    map-only — a single shuffle for the whole composite at any corpus
    size."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup
    from cdc_data_lake_pyspark_spark.operators.relational import hash_split

    docs = _t(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", (F.col("doc_id") % 400).alias("_src"))
        .join(
            docs.select(
                F.col("doc_id").alias("_src"), "text"
            ).filter(F.col("text").isNotNull()),
            "_src",
        )
        .select("doc_id", "text")
    )
    extracted = base.select(
        "doc_id",
        F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("main_text"),
    )
    gated = extracted.filter(F.length("main_text") >= _WEB_MIN_CHARS)
    keep = exact_dedup(gated, text_col="main_text").select(
        "fingerprint", F.col("keeper_id").alias("doc_id"), "n_docs"
    )
    return hash_split(keep, id_col="doc_id").select(
        "doc_id", "fingerprint", "n_docs", "split"
    )


# --------------------------------------------------------------------------
# url_dedup_canonical — canonical-URL dedup, the stage BEFORE content dedup
# --------------------------------------------------------------------------

#: planted URL per document (identical SQL text in both dialects): mixed
#: scheme/host case, explicit default port, 50% trailing slash, tracking
#: params interleaved with real ones in scrambled order, fragment on every
#: third row.  Canonicalization must strip ALL of that noise — rows
#: sharing (doc_id % 7, doc_id % 40) collapse to one canonical URL.
_PLANTED_URL_SQL = (
    "'HTTPS://WWW.Site' || CAST(doc_id % 7 AS STRING) || "
    "'.Example.COM:443/Articles/Item-' || CAST(doc_id % 40 AS STRING) || "
    "CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END || "
    "'?utm_source=feed' || "
    "CASE WHEN doc_id % 5 = 0 THEN '&b=2&gclid=x11&a=1' "
    "     ELSE '&a=1&fbclid=y22&b=2' END || "
    "CASE WHEN doc_id % 3 = 0 THEN '#sec-' || CAST(doc_id AS STRING) "
    "     ELSE '' END"
)


def _url_dedup_oracle() -> str:
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql

    return f"""
    WITH planted AS (
      SELECT doc_id, {_PLANTED_URL_SQL} AS url FROM documents
    ), canon AS (
      SELECT doc_id, {canonical_url_sql('url', duck=True)} AS canonical
      FROM planted
    )
    SELECT doc_id, canonical,
           CAST(min(doc_id) OVER (PARTITION BY canonical) AS BIGINT)
             AS keeper_id,
           CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT)
             AS n_dups
    FROM canon
    """


@query("url_dedup_canonical", oracle=_url_dedup_oracle())
def url_dedup_canonical(spark, sf_dir):
    """Canonical-URL dedup — the CHEAP first dedup stage of a web
    pipeline (drop exact re-crawls before any shingling runs): plant a
    deterministic noisy URL per row (mixed case, default port, trailing
    slash, scrambled + tracking query params, fragment — same expression
    in both engines), canonicalize with ONE map-only scalar expression
    (functions/urls.py), and elect the minimum doc_id per canonical URL.

    Every row's canonical string is hash-compared against DuckDB
    replaying the identical normalization, so scheme/host lowercasing,
    default-port and fragment stripping, tracking-param removal and
    param SORTING are all value-checked at corpus scale.

    Plan shape: canonicalization is whole-stage-codegen'd string work;
    the keeper election is one keyed shuffle on the canonical string (at
    100 TB: on md5(canonical), 32-byte exchange keys, map-side combined
    via groupBy + a broadcast join-back instead of the window — the
    window form here keeps the per-row canonical column in the oracled
    output)."""
    from cdc_data_lake_pyspark_spark.functions.urls import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", F.expr(_PLANTED_URL_SQL).alias("url")
    )
    canon = planted.select(
        "doc_id", canonicalize_url("url").alias("canonical")
    )
    w = Window.partitionBy("canonical")
    return canon.select(
        "doc_id",
        "canonical",
        F.min("doc_id").over(w).alias("keeper_id"),
        F.count(F.lit(1)).over(w).alias("n_dups"),
    )


# --------------------------------------------------------------------------
# prepare_web_corpus_v2 — URL dedup FIRST, then the content pipeline
# --------------------------------------------------------------------------

#: crawl URL per page fetch (identical SQL text in both dialects): the
#: SAME logical page (doc_id % 400) is served by THREE mirror hosts
#: (doc_id % 3; gcd(3,400)=1 so every page appears on every mirror) with
#: per-fetch noise — case, default port, trailing slash, tracking params,
#: and a fragment containing a '?' (the ADVICE r9 anchored-regex SHAPE;
#: here a real query precedes the fragment, and since both dialects
#: share the regex text a parity oracle can never catch a shared regex
#: bug anyway — the regression coverage for the anchor itself is the
#: Spark-vs-pinned-string CASES in tests/test_urls.py).
#: Canonicalization collapses re-fetches of one (mirror, page) URL;
#: the mirrors themselves only collapse later, at CONTENT dedup.
_CRAWL_URL_SQL = (
    "'HTTPS://Mirror' || CAST(doc_id % 3 AS STRING) || "
    "'.Example.COM:443/page/' || CAST(doc_id % 400 AS STRING) || "
    "CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END || "
    "'?utm_source=crawler' || "
    "CASE WHEN doc_id % 5 = 0 THEN '&gclid=z9&v=1' "
    "     ELSE '&v=1&fbclid=q3' END || "
    "CASE WHEN doc_id % 3 = 0 THEN '#frag?p=1' ELSE '' END"
)


def _prepare_web_corpus_v2_oracle() -> str:
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql

    ex = main_text_sql(_PAGE_SQL, duck=True)
    split_hash = _hash_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT d.doc_id, s.text
      FROM documents d JOIN documents s ON s.doc_id = d.doc_id % 400
      WHERE s.text IS NOT NULL
    ), canon AS (
      SELECT doc_id, {canonical_url_sql(f"({_CRAWL_URL_SQL})", duck=True)} AS c
      FROM base
    ), url_keep AS (
      SELECT min(doc_id) AS doc_id FROM canon GROUP BY c
    ), ex AS (
      SELECT b.doc_id, {ex} AS main_text
      FROM base b JOIN url_keep USING (doc_id)
    ), gated AS (
      SELECT doc_id, main_text FROM ex
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), keep AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_urls
      FROM gated GROUP BY 1
    )
    SELECT doc_id, fingerprint, n_urls,
           CASE WHEN {split_hash} % 100 < 80 THEN 'train'
                WHEN {split_hash} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keep
    """


@query("prepare_web_corpus_v2", oracle=_prepare_web_corpus_v2_oracle)
def prepare_web_corpus_v2(spark, sf_dir):
    """The web capstone in PRE-CONTENT order (VERDICT r9 #6): canonical-
    URL dedup runs as STAGE 0, before any page is extracted or shingled
    — the stated purpose of URL-level dedup is that dropping exact
    re-crawls is orders of magnitude cheaper than content work, so it
    must run first and SHRINK the input of everything downstream.

    crawl → canonical-URL keeper election (stage 0) → main-content
    extraction → minimum-content gate → exact content dedup (collapses
    the three mirror hosts serving the same page) → deterministic split.
    ``n_urls`` counts the distinct canonical URLs whose pages carried
    each surviving content fingerprint (= the mirror count here).

    Plan shape: stage 0 never touches page text — the canonical URL
    derives from a thin ``(doc_id)`` projection, its keeper election is
    one keyed groupBy carrying (canonical, id) pairs, and survivors
    rejoin the corpus by id (AQE broadcasts the shrunken keeper set), so
    the map-only canonicalizer sits AHEAD of the extraction projection
    and the content-digest shuffle in the executed plan
    (tests/test_plans.py::test_web_corpus_v2_url_stage_precedes_extraction).
    At 100 TB the expensive stages (HTML extraction, shingling) run on
    the post-URL-dedup survivor set only."""
    return _prepare_web_corpus_v2(_t(spark, sf_dir, "documents"))


def _prepare_web_corpus_v2(docs):
    """prepare_web_corpus_v2's body over an arbitrary docs frame — shared
    with tools/measure_scale.py so the 100x row measures the shipped
    composite."""
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup
    from cdc_data_lake_pyspark_spark.operators.relational import hash_split

    base = (
        docs.select("doc_id", (F.col("doc_id") % 400).alias("_src"))
        .join(
            docs.select(
                F.col("doc_id").alias("_src"), "text"
            ).filter(F.col("text").isNotNull()),
            "_src",
        )
        .select("doc_id", "text")
    )
    # stage 0: URL keeper election on a TEXT-FREE projection.  `base` is
    # deliberately NOT staged despite having two consumers: column
    # pruning splits them into an id-only subplan (this one — scans
    # doc_id alone) and the text-attaching subplan, which Catalyst
    # pushes ABOVE the keeper semi-join so extraction touches survivors
    # only (pinned in test_plans.py).  A checkpoint here would
    # materialize TEXT before URL dedup — the exact order this
    # composite exists to avoid; the duplicated work is one id-only
    # scan+join, strictly cheaper.
    canon = base.select(
        "doc_id", F.expr(canonical_url_sql(f"({_CRAWL_URL_SQL})")).alias("_c")
    )
    url_keep = canon.groupBy("_c").agg(F.min("doc_id").alias("doc_id"))
    survivors = base.join(url_keep.select("doc_id"), "doc_id", "left_semi")
    extracted = survivors.select(
        "doc_id",
        F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("main_text"),
    )
    gated = extracted.filter(F.length("main_text") >= _WEB_MIN_CHARS)
    keep = exact_dedup(gated, text_col="main_text").select(
        "fingerprint",
        F.col("keeper_id").alias("doc_id"),
        F.col("n_docs").alias("n_urls"),
    )
    return hash_split(keep, id_col="doc_id").select(
        "doc_id", "fingerprint", "n_urls", "split"
    )


# --------------------------------------------------------------------------
# host_filter_docs — host-level quality gating (the URL-filtering stage)
# --------------------------------------------------------------------------

#: planted crawl metadata for host-level gating (identical SQL text in
#: both dialects): five hosts; hosts h0/h1 serve only 8 distinct pages
#: each (a crawler stuck re-fetching boilerplate — near-total URL-level
#: duplication), hosts h2-h4 serve 200 distinct pages each (healthy).
#: The per-host duplication RATE is the blocklist signal.
_HOST_SQL = "'h' || CAST(doc_id % 5 AS STRING)"
_HOST_PAGE_SQL = (
    "CASE WHEN doc_id % 5 < 2 THEN doc_id % 8 ELSE doc_id % 200 END"
)
#: block hosts whose URL-duplication rate exceeds 60% (ppm scale)
_HOST_DUP_PPM_MAX = 600_000


def _host_filter_oracle() -> str:
    return f"""
    WITH planted AS (
      SELECT doc_id, {_HOST_SQL} AS host,
             {_HOST_SQL} || '/' || CAST(({_HOST_PAGE_SQL}) AS STRING) AS url
      FROM documents
    ), stats AS (
      SELECT host,
             CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
             CAST(round(1e6 * CAST(count(*) - count(DISTINCT url) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
      FROM planted GROUP BY host
    )
    SELECT p.doc_id, p.host, s.n_pages, s.n_urls, s.dup_ppm,
           CAST(CASE WHEN s.dup_ppm <= {_HOST_DUP_PPM_MAX}
                     THEN 1 ELSE 0 END AS INT) AS kept
    FROM planted p JOIN stats s USING (host)
    """


@query("host_filter_docs", oracle=_host_filter_oracle())
def host_filter_docs(spark, sf_dir):
    """HOST-level quality gating — the URL-filtering stage the published
    web-corpus pipelines (RefinedWeb §3.1 "URL filtering", FineWeb) run
    before fetching or keeping content: aggregate crawl behavior per
    HOST, blocklist hosts whose URL-duplication rate says the crawler
    was trapped (re-fetching the same few pages), and gate every
    document by its host's verdict.  Complements the per-URL
    canonicalizer (stage 0 of prepare_web_corpus_v2): URL dedup drops
    exact re-crawls one URL at a time; the host report drops WHOLE
    sites whose duplication rate marks them as boilerplate farms.

    Returns ``(doc_id, host, n_pages, n_urls, dup_ppm, kept)`` — the
    per-host stats ride along so the oracle value-checks the aggregate
    AND the gate in one pass.  Rates are integer ppm (the repo's
    micro-integer bridge pattern), so both engines compare exactly.

    Scale shape: the per-host aggregate is one map-side-combined
    groupBy whose output is #hosts rows (at 100 TB: ~10⁷ hosts, still
    tiny next to the corpus; the distinct-URL count shuffles
    (host, md5(url)) pairs once); the verdict joins back via an
    AQE-broadcast hash join, so the corpus itself never shuffles —
    gating is map-only against broadcast host stats."""
    return _host_filter(_t(spark, sf_dir, "documents"))


def _host_filter(docs):
    """host_filter_docs' body over an arbitrary docs frame — shared with
    tools/measure_scale.py so the scale100 row measures the SAME
    expressions the registry entry ships (r10 review #6)."""
    planted = docs.select(
        "doc_id",
        F.expr(_HOST_SQL).alias("host"),
        F.expr(
            f"{_HOST_SQL} || '/' || CAST(({_HOST_PAGE_SQL}) AS STRING)"
        ).alias("url"),
    )
    stats = planted.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("url").alias("n_urls"),
    ).select(
        "host",
        "n_pages",
        "n_urls",
        F.round(
            F.lit(1e6)
            * (F.col("n_pages") - F.col("n_urls")).cast("double")
            / F.col("n_pages").cast("double")
        )
        .cast("bigint")
        .alias("dup_ppm"),
    )
    return planted.join(F.broadcast(stats), "host").select(
        "doc_id",
        "host",
        "n_pages",
        "n_urls",
        "dup_ppm",
        F.when(F.col("dup_ppm") <= _HOST_DUP_PPM_MAX, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("kept"),
    )


# --------------------------------------------------------------------------
# prepare_web_corpus_v3 — the FULL pre-content pipeline in canonical order
# --------------------------------------------------------------------------

#: one coherent crawl plant for the full pipeline (identical SQL text in
#: both dialects): five hosts M0-M4.  The planted duplication RATES are
#: SIZE-INVARIANT (the r10 first cut used fixed page COUNTS, whose dup
#: rate grows with the corpus until every host trips the gate — at
#: sf0.1 the composite degenerated to zero rows): healthy hosts M0-M2
#: serve each page exactly TWICE (page = ⌊doc/10⌋ → 50 % dup at any n),
#: trap hosts M3/M4 serve only two pages total (dup → 100 % — a crawler
#: stuck in boilerplate).  Page content is the text of doc_id % 200
#: while healthy page ids are ⌊doc/10⌋, so keepers of different pages
#: share CONTENT whenever their ids agree mod 200 — work left for the
#: content stage after both URL-level stages ran, at every corpus size.
#: The floor division is spelled ``(doc - doc % 10) / 10`` so the cast
#: is exact in both dialects (DuckDB CAST(double) ROUNDS, Spark
#: truncates — the quotient must already be integral).
_V3_URL_SQL = (
    "'HTTPS://M' || CAST(doc_id % 5 AS STRING) || '.Example.COM:443/p/' || "
    "CAST(CAST((CASE WHEN doc_id % 5 >= 3 THEN doc_id % 2 "
    "           ELSE (doc_id - doc_id % 10) / 10 END) AS BIGINT) AS STRING) || "
    "CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END || "
    "'?a=1' || "
    "CASE WHEN doc_id % 4 = 0 THEN '&utm_medium=rss' ELSE '&gclid=g7' END || "
    "CASE WHEN doc_id % 3 = 0 THEN '#s-' || CAST(doc_id AS STRING) "
    "     ELSE '' END"
)
_V3_HOST_SQL = "'M' || CAST(doc_id % 5 AS STRING)"


def _prepare_web_corpus_v3_oracle() -> str:
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql

    ex = main_text_sql(_PAGE_SQL, duck=True)
    split_hash = _hash_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH crawls AS (
      SELECT d.doc_id, s.text
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
      SELECT cr.doc_id, {ex} AS main_text
      FROM crawls cr JOIN url_keep USING (doc_id)
    ), gated AS (
      SELECT doc_id, main_text FROM ex
      WHERE length(main_text) >= {_WEB_MIN_CHARS}
    ), keep AS (
      SELECT md5(lower(trim(main_text))) AS fingerprint,
             CAST(min(doc_id) AS BIGINT) AS doc_id,
             CAST(count(*) AS BIGINT) AS n_urls
      FROM gated GROUP BY 1
    )
    SELECT doc_id, fingerprint, n_urls,
           CASE WHEN {split_hash} % 100 < 80 THEN 'train'
                WHEN {split_hash} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keep
    """


@query("prepare_web_corpus_v3", oracle=_prepare_web_corpus_v3_oracle)
def prepare_web_corpus_v3(spark, sf_dir):
    """The COMPLETE web pipeline in canonical pre-content order — every
    cheap URL-level stage runs before any page text is touched:

    crawl → canonicalize (map-only, id-derived) → HOST dup-rate gate
    (drops the two trap hosts wholesale, stage −1) → canonical-URL
    keeper election (stage 0) → main-content extraction → minimum-
    content gate → exact CONTENT dedup (collapses pages that share text
    but not URL — keepers agreeing mod 200) → deterministic split.

    Each stage has real planted work the previous stages cannot do:
    the host gate kills ~2/5 of the crawl in one broadcast verdict, URL
    dedup collapses per-page re-fetch noise, and content dedup merges
    cross-URL duplicates that no URL-level stage can see.  ``n_urls``
    counts the URL-keeper survivors per content fingerprint.

    Plan shape: canonicalization + host derive from doc_id alone (the
    pruned stage −1/0 subplans scan one column); the host verdict is
    #hosts rows joined back broadcast; survivors rejoin by id, and
    extraction sits above that semi-join — same staged order pinned for
    v2 in test_plans.py, now with the host gate in front."""
    return _prepare_web_corpus_v3(_t(spark, sf_dir, "documents"))


def _prepare_web_corpus_v3(docs):
    """prepare_web_corpus_v3's body over an arbitrary docs frame — shared
    with tools/measure_scale.py so the 100x row measures the shipped
    composite."""
    from cdc_data_lake_pyspark_spark.functions.urls import canonical_url_sql
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup
    from cdc_data_lake_pyspark_spark.operators.relational import hash_split

    crawls = (
        docs.select("doc_id", (F.col("doc_id") % 200).alias("_src"))
        .join(
            docs.select(
                F.col("doc_id").alias("_src"), "text"
            ).filter(F.col("text").isNotNull()),
            "_src",
        )
        .select("doc_id", "text")
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
        F.expr(main_text_sql(_PAGE_SQL, duck=False)).alias("main_text"),
    )
    gated = extracted.filter(F.length("main_text") >= _WEB_MIN_CHARS)
    keep = exact_dedup(gated, text_col="main_text").select(
        "fingerprint",
        F.col("keeper_id").alias("doc_id"),
        F.col("n_docs").alias("n_urls"),
    )
    return hash_split(keep, id_col="doc_id").select(
        "doc_id", "fingerprint", "n_urls", "split"
    )
