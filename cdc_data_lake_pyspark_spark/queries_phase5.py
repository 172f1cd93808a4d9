"""Phase-5 inventory: LM-quality scoring, temperature-balanced mixing,
Bloom novelty gating, histogram quantile sketching, and the composite
that chains them.

Training-data-pipeline additions (§2.6 surface; no reference citation —
beyond the reference's scope): CCNet-style unigram and add-one-bigram
cross-entropy scoring, XLM-R-style temperature resampling, the portable
Bloom-filter novelty gate, mergeable fixed-width histogram quantiles,
and ``prepare_training_corpus_v2`` composing the new stages into one
DAG.  All fully DuckDB-oracle-checkable (exact integer micro-log2
bridge / integer hash thresholds / sparse sketch cells).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.queries import _t, query
from cdc_data_lake_pyspark_spark.queries_phase4 import _hash_sql

_TICKET_SQL = _hash_sql("lang || '|' || CAST(doc_id AS VARCHAR)")

_BLOOM_M = 8192


def _bloom_rows_sql(src: str, cols: str) -> str:
    """UNION ALL of the 4 row-salted bloom positions of column ``fp``."""
    return "\n      UNION ALL ".join(
        f"SELECT {cols}{i} AS hash_row, "
        + _hash_sql(f"'{i}|' || fp")
        + f" % {_BLOOM_M} AS bit FROM {src}"
        for i in range(4)
    )


@query(
    "lm_cross_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dt AS (
      SELECT doc_id, tok, count(*) AS m FROM toks GROUP BY doc_id, tok
    ), vocab AS (
      SELECT tok, CAST(sum(m) AS BIGINT) AS c,
             CAST(round(1e6 * log2(CAST(sum(m) AS DOUBLE))) AS BIGINT) AS lc
      FROM dt GROUP BY tok
    ), tot AS (
      SELECT CAST(round(1e6 * log2(CAST(sum(c) AS DOUBLE))) AS BIGINT) AS lt
      FROM vocab
    ), per AS (
      SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_tokens,
             CAST(sum(d.m * v.lc) AS BIGINT) AS sum_lc
      FROM dt d JOIN vocab v USING (tok)
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(sum_lc - n_tokens * (SELECT lt FROM tot) AS BIGINT)
             AS sum_logp_micro,
           CAST(CAST(n_tokens * (SELECT lt FROM tot) - sum_lc AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE) * 1e6) AS DOUBLE)
             AS cross_entropy
    FROM per
    """,
)
def lm_cross_entropy(spark, sf_dir):
    """CCNet-style LM quality score (Wenzek et al. 2020): per-doc
    cross-entropy under the corpus's own unigram LM — low = boilerplate /
    high-frequency soup, high = rare-token noise; a training pipeline
    trims both tails.  Per-token log2-probs are quantized to exact
    micro-bit integers BEFORE summation so both engines' per-doc sums are
    bit-identical; cross_entropy is one IEEE division of those integers
    (operators/lm_quality.py — two shared-key hash aggregations plus one
    bounded vocabulary join; AQE broadcasts the vocab side)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        unigram_lm_scores,
    )

    return unigram_lm_scores(_t(spark, sf_dir, "documents"))


@query(
    "corpus_mix_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), th AS (
      SELECT lang,
             CAST(round(1e6 * pow(CAST((SELECT min(n) FROM counts) AS DOUBLE)
                                  / CAST(n AS DOUBLE), 0.7)) AS BIGINT)
               AS threshold
      FROM counts
    )
    SELECT d.doc_id, d.lang, t.threshold
    FROM documents d JOIN th t USING (lang)
    WHERE {_TICKET_SQL} % 1000000 < t.threshold
    """,
)
def corpus_mix_temperature(spark, sf_dir):
    """XLM-R-style temperature rebalancing (Conneau et al. 2020 §3.1,
    alpha=0.3): each language keeps ``(n_min/n_lang)**0.7`` of its docs —
    the smallest language keeps all, head languages are down-sampled
    toward it.  Unlike ``stratified_sample_docs`` (fixed caller-given
    rates) the rates here are DERIVED from the corpus in one tiny
    broadcast aggregate; the keep decision is the same portable-hash
    ticket, so the selected set is reproducible across engines and
    partitionings (operators/lm_quality.py)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        temperature_mix,
    )

    return temperature_mix(
        _t(spark, sf_dir, "documents"), alpha=0.3, strata_col="lang"
    )


@query(
    "bloom_novel_docs",
    oracle=f"""
    WITH corpus AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id < 250
    ), cells AS (
      SELECT DISTINCT hash_row, bit FROM (
        {_bloom_rows_sql("corpus", "")}
      )
    ), batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
      WHERE doc_id >= 250
    ), probe AS (
      {_bloom_rows_sql("batch", "doc_id, ")}
    )
    SELECT p.doc_id, CAST(count(c.bit) AS BIGINT) AS n_hits,
           count(c.bit) = 4 AS maybe_seen
    FROM probe p LEFT JOIN cells c
      ON p.hash_row = c.hash_row AND p.bit = c.bit
    GROUP BY p.doc_id
    """,
)
def bloom_novel_docs(spark, sf_dir):
    """Approximate incremental-ingestion novelty gate: the scale path of
    ``incremental_novel_docs``.  The ingested corpus (doc_id < 250) is
    compressed into a portable Bloom filter over its text fingerprints —
    at most ``4 x 8192`` cells, CONSTANT size regardless of corpus size,
    merged across days/engines by set-union — and today's batch
    (doc_id >= 250) probes it: ``maybe_seen = false`` is a guaranteed
    novel document (no false negatives), ``true`` is deduped with a small
    false-positive rate instead of carrying the full fingerprint index.
    Every cell is exact integer arithmetic over the portable md5 hash, so
    DuckDB reproduces the filter AND the verdicts bit-for-bit
    (functions/sketch.py::bloom_sketch / bloom_probe)."""
    from cdc_data_lake_pyspark_spark.functions.sketch import (
        bloom_probe,
        bloom_sketch,
    )

    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    corpus = docs.filter(F.col("doc_id") < 250).select(fp.alias("fp"))
    batch = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", fp.alias("fp")
    )
    state = bloom_sketch(corpus, "fp", depth=4, m_bits=_BLOOM_M)
    return bloom_probe(
        state, batch, "fp", ["doc_id"], depth=4, m_bits=_BLOOM_M
    )


@query(
    "price_quantile_sketch",
    oracle="""
    SELECT o_orderpriority,
           CAST(greatest(0, least(CAST(floor(o_totalprice / 25000.0)
                                       AS BIGINT), 19)) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority, bucket
    """,
)
def price_quantile_sketch(spark, sf_dir):
    """Mergeable approximate quantiles: fixed-width histogram state of
    order value per priority (20 x 25k buckets).  Where exact per-group
    percentiles (``segment_price_percentiles``) sort every group, this is
    ONE map-side-combined aggregation producing ``groups x 20`` rows from
    any corpus size; estimates interpolate inside a bucket (error <= one
    bucket width) and states from different engines/partitions merge by
    cell-wise sum (functions/sketch.py::histogram_sketch)."""
    from cdc_data_lake_pyspark_spark.functions.sketch import histogram_sketch

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return histogram_sketch(
        orders, "o_totalprice", ["o_orderpriority"], width=25_000.0,
        n_buckets=20,
    )


@query(
    "lm_bigram_cross_entropy",
    oracle="""
    WITH toksrc AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w,
             len(string_split(lower(text), ' ')) AS n
      FROM documents
    ), vsize AS (
      SELECT count(DISTINCT tok) AS V FROM (
        SELECT unnest(w) AS tok FROM toksrc
      )
    ), bg AS (
      SELECT doc_id, w[i] AS a, array_to_string(w[i:i+1], ' ') AS g
      FROM toksrc, LATERAL unnest(generate_series(1, n - 1)) AS t(i)
      WHERE n >= 2
    ), dbg AS (
      SELECT doc_id, a, g, count(*) AS m FROM bg GROUP BY doc_id, a, g
    ), bgv AS (
      SELECT a, g, CAST(sum(m) AS BIGINT) AS c2,
             CAST(round(1e6 * log2(CAST(sum(m) + 1 AS DOUBLE))) AS BIGINT)
               AS l2
      FROM dbg GROUP BY a, g
    ), pv AS (
      SELECT a,
             CAST(round(1e6 * log2(CAST(sum(c2) + (SELECT V FROM vsize)
                                        AS DOUBLE))) AS BIGINT) AS l1
      FROM bgv GROUP BY a
    )
    SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_bigrams,
           CAST(sum(d.m * (b.l2 - p.l1)) AS BIGINT) AS sum_logp_micro,
           CAST(CAST(-sum(d.m * (b.l2 - p.l1)) AS DOUBLE)
                / (CAST(sum(d.m) AS DOUBLE) * 1e6) AS DOUBLE)
             AS cross_entropy
    FROM dbg d JOIN bgv b ON d.g = b.g AND d.a = b.a
               JOIN pv p ON d.a = p.a
    GROUP BY d.doc_id
    """,
)
def lm_bigram_cross_entropy(spark, sf_dir):
    """Add-one bigram LM quality score — the n-gram step toward CCNet's
    KenLM: per-doc cross-entropy in bits/bigram under bigram counts
    trained on the corpus itself, with per-vocabulary-entry log-probs
    quantized to exact micro-bit integers so both engines' weighted sums
    are bit-identical (operators/lm_quality.py::bigram_lm_scores; the
    bigram and prefix vocabularies are the only join sides, each bounded
    by distinct-n-gram count, AQE-broadcast when small)."""
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        bigram_lm_scores,
    )

    return bigram_lm_scores(_t(spark, sf_dir, "documents"))


#: approx decile-gate sketch geometry: cross-entropy is bits/token
#: (single digits for natural text); 0.005-bit cells over [0, 20) bound
#: the gate-threshold error at one cell while the state stays 4000 rows
#: from ANY corpus size.
_V2_HIST_WIDTH = 0.005
_V2_HIST_BUCKETS = 4000


def _v2_oracle(gate_ctes: str) -> str:
    """Shared oracle skeleton for the two prepare_training_corpus_v2
    modes: unigram-LM cross-entropy → <decile gate> → exact-dedup →
    temperature mix → split.  ``gate_ctes`` supplies the CTE chain that
    ends in ``gated(doc_id, lang, text)``."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), dt AS (
      SELECT doc_id, tok, count(*) AS m FROM toks GROUP BY doc_id, tok
    ), vocab AS (
      SELECT tok, CAST(sum(m) AS BIGINT) AS c,
             CAST(round(1e6 * log2(CAST(sum(m) AS DOUBLE))) AS BIGINT) AS lc
      FROM dt GROUP BY tok
    ), tot AS (
      SELECT CAST(round(1e6 * log2(CAST(sum(c) AS DOUBLE))) AS BIGINT) AS lt
      FROM vocab
    ), ce AS (
      SELECT d.doc_id,
             CAST(CAST(sum(d.m) * (SELECT lt FROM tot) - sum(d.m * v.lc)
                       AS DOUBLE)
                  / (CAST(sum(d.m) AS DOUBLE) * 1e6) AS DOUBLE) AS h
      FROM dt d JOIN vocab v USING (tok) GROUP BY d.doc_id
    ), {gate_ctes}, keepers AS (
      SELECT min(doc_id) AS keeper FROM gated GROUP BY md5(lower(trim(text)))
    ), base AS (
      SELECT g.doc_id, g.lang FROM gated g
      JOIN keepers k ON g.doc_id = k.keeper
    ), counts AS (
      SELECT lang, count(*) AS n FROM base GROUP BY lang
    ), th AS (
      SELECT lang,
             CAST(round(1e6 * pow(CAST((SELECT min(n) FROM counts) AS DOUBLE)
                                  / CAST(n AS DOUBLE), 0.7)) AS BIGINT)
               AS threshold
      FROM counts
    ), mixed AS (
      SELECT b.doc_id, b.lang
      FROM base b JOIN th t USING (lang)
      WHERE {_TICKET_SQL} % 1000000 < t.threshold
    )
    SELECT doc_id, lang,
           CASE WHEN {_hash_sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
                  THEN 'train'
                WHEN {_hash_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                  THEN 'val'
                ELSE 'test' END AS split
    FROM mixed
    """


#: approx mode: replay the deterministic fixed-width histogram sketch and
#: its interpolated p10/p90 decode (functions/sketch.py::histogram_sketch /
#: histogram_quantile) in pure IEEE-double SQL — the same
#: replay-the-deterministic-state pattern as novelty_gate_batch.
_V2_GATE_APPROX = f"""hist AS (
      SELECT CAST(least(greatest(floor(h / {_V2_HIST_WIDTH}), 0),
                        {_V2_HIST_BUCKETS - 1}) AS INT) AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM ce GROUP BY 1
    ), htot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM hist
    ), cum AS (
      SELECT b, n, sum(n) OVER (ORDER BY b) - n AS c FROM hist
    ), qlo AS (
      SELECT (b + (0.1 * (SELECT t FROM htot) - c) / n)
               * {_V2_HIST_WIDTH} AS v
      FROM cum
      WHERE CAST(c + n AS DOUBLE) >= 0.1 * (SELECT t FROM htot)
      ORDER BY b LIMIT 1
    ), qhi AS (
      SELECT (b + (0.9 * (SELECT t FROM htot) - c) / n)
               * {_V2_HIST_WIDTH} AS v
      FROM cum
      WHERE CAST(c + n AS DOUBLE) >= 0.9 * (SELECT t FROM htot)
      ORDER BY b LIMIT 1
    ), gated AS (
      SELECT doc.doc_id, doc.lang, doc.text
      FROM documents doc JOIN ce ON doc.doc_id = ce.doc_id
      WHERE ce.h >= (SELECT v FROM qlo) AND ce.h <= (SELECT v FROM qhi)
    )"""

#: exact mode: global ntile deciles with the deterministic (h, doc_id)
#: tiebreak — the single-partition oracle bridge.
_V2_GATE_EXACT = """dec AS (
      SELECT doc_id, ntile(10) OVER (ORDER BY h, doc_id) AS d FROM ce
    ), gated AS (
      SELECT doc.doc_id, doc.lang, doc.text
      FROM documents doc JOIN dec ON doc.doc_id = dec.doc_id
      WHERE dec.d BETWEEN 2 AND 9
    )"""


@query("prepare_training_corpus_v2", oracle=_v2_oracle(_V2_GATE_APPROX))
def prepare_training_corpus_v2(spark, sf_dir, approx: bool = True):
    """The r5 data-prep composition: unigram-LM cross-entropy decile gate
    (drop decile 1 — boilerplate — and decile 10 — rare-token noise, the
    CCNet head/tail trim) → exact-dedup keeper selection → XLM-R
    temperature rebalancing across languages (rates derived from the
    POST-gate corpus) → deterministic 80/10/10 split.  Complements
    ``prepare_training_corpus`` (quality gate → near-dup clustering →
    decontamination): between them every §2.6 stage family appears inside
    a verified composition.

    Decile gate, two modes:

    * ``approx=True`` (DEFAULT since r7 — the 100 TB path, and the
      oracle-checked registry mode): `histogram_sketch` over
      cross-entropy — a map-side-combined constant-state aggregation
      (``_V2_HIST_BUCKETS`` rows from any corpus size, measured flat in
      `SCALE_MEASURED.json` → scale100.decile_gate_approx) decoded to
      p10/p90 thresholds, then a map-only filter.  NO global sort
      anywhere in the composite.  The sketch and its interpolated decode
      are deterministic IEEE arithmetic, so the DuckDB oracle replays
      them exactly (the ``novelty_gate_batch`` pattern).
    * ``approx=False`` (the exact-quantile bridge, registered as the
      tail entry ``prepare_training_corpus_v2_exact``): exact ntile
      deciles — ONE global sort through a single partition
      (`relational.quantile_buckets`), the documented scale cost of
      exact quantiles.  Gate disagreement vs approx is confined to
      documents within one sketch cell (``_V2_HIST_WIDTH`` bits) of a
      decile boundary — pinned in ``tests/test_v2_approx.py``.
    """
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup
    from cdc_data_lake_pyspark_spark.operators.lm_quality import (
        temperature_mix,
        unigram_lm_scores,
    )
    from cdc_data_lake_pyspark_spark.operators.relational import (
        hash_split,
        quantile_buckets,
    )

    docs = _t(spark, sf_dir, "documents")
    scores = unigram_lm_scores(docs).select("doc_id", "cross_entropy")
    if approx:
        from cdc_data_lake_pyspark_spark.functions.sketch import (
            histogram_quantile,
            histogram_sketch,
        )

        cells_df = histogram_sketch(
            scores,
            "cross_entropy",
            width=_V2_HIST_WIDTH,
            n_buckets=_V2_HIST_BUCKETS,
        )
        # constant-size state (<= n_buckets rows) → driver decode is the
        # sketch contract, not a scale hazard
        cells = {r["bucket"]: r["n"] for r in cells_df.collect()}
        lo = histogram_quantile(cells, 0.1, width=_V2_HIST_WIDTH)
        hi = histogram_quantile(cells, 0.9, width=_V2_HIST_WIDTH)
        gate_ids = scores.filter(
            (F.col("cross_entropy") >= lo) & (F.col("cross_entropy") <= hi)
        ).select("doc_id")
    else:
        deciles = quantile_buckets(scores, "cross_entropy", n_buckets=10)
        gate_ids = deciles.filter(F.col("bucket").between(2, 9)).select(
            "doc_id"
        )
    # gated feeds both the keeper aggregation and the keeper join, and
    # base feeds both the mix-rate aggregation and the mix filter — stage
    # each once (eager local checkpoint, the dedup_text staging pattern)
    # so the LM + decile subtree is computed exactly once, not once per
    # consumer.
    gated = (
        docs.join(
            gate_ids,
            "doc_id",
        )
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=True)
    )
    keepers = exact_dedup(gated).select("keeper_id")
    base = (
        gated.join(
            F.broadcast(keepers), gated["doc_id"] == keepers["keeper_id"]
        )
        .select("doc_id", "lang")
        .localCheckpoint(eager=True)
    )
    mixed = temperature_mix(base, alpha=0.3, strata_col="lang").select(
        "doc_id", "lang"
    )
    return hash_split(mixed, id_col="doc_id").select("doc_id", "lang", "split")


@query("prepare_training_corpus_v2_exact", oracle=_v2_oracle(_V2_GATE_EXACT))
def prepare_training_corpus_v2_exact(spark, sf_dir):
    """The exact-ntile decile-gate mode of ``prepare_training_corpus_v2``
    kept as the oracle bridge (tail entry): identical composite, but the
    gate is `relational.quantile_buckets` — one global sort through a
    single partition, the documented exact-quantile scale cost the
    default approx mode exists to avoid."""
    return prepare_training_corpus_v2(spark, sf_dir, approx=False)


@query(
    "embedding_quantize",
    oracle="""
    WITH d AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), m AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS ma
      FROM d
    )
    SELECT vec_id,
           CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
           CAST(round(unnest(v) * 127.0
                      / (CASE WHEN ma = 0.0 THEN 1.0 ELSE ma END))
                AS INT) AS q,
           CAST(ma / 127.0 AS DOUBLE) AS scale
    FROM m
    """,
)
def embedding_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding corpus —
    4x memory/shuffle reduction for ANN at scale, emitted posexploded so
    the oracle hash-compares every code and every dequantization scale
    (operators/similarity.py::quantize_embeddings_int8; map-only, no
    shuffle, no UDF)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    return quantize_embeddings_int8(_t(spark, sf_dir, "embeddings"))


def _pq_oracle_sql() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

    return _pq_oracle_sql_for(_oracle_sf_dir())


def _fit_pq_offline(sf_dir: str):
    """Replay the deterministic PQ fit offline: same bounded id-ordered
    sample, same seeded Lloyd's per subspace as ``fit_pq_codebooks``.
    Returns ``(codebooks (8, 16, ds), ds)``; shared by the code-assignment
    and ADC oracles so both pin literals from the identical fit."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans

    pdf = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ds = X.shape[1] // 8
    books = np.stack(
        [
            fit_kmeans(X[:, j * ds : (j + 1) * ds], 16, seed=42 + j)
            for j in range(8)
        ]
    )
    return books, ds


def _pq_codes_ctes(sf_dir: str) -> tuple[str, object, int]:
    """Shared CTE chain ``e → sv → cent → d → codes`` assigning every
    (vector, subspace) its nearest pinned-codebook centroid (argmin
    spelled ``ORDER BY d ASC, i ASC``).  Same margin caveat as the IVF
    oracle (queries_phase2._ivf_oracle_sql_for): BLAS-vs-sequential float
    sums could flip an EXACT distance tie; min assignment margins on the
    driver corpus are pinned well above float64 round-off in
    tests/test_pq.py."""
    from cdc_data_lake_pyspark_spark.queries_phase2 import _double_array_sql

    books, ds = _fit_pq_offline(sf_dir)
    cent_values = ",\n    ".join(
        f"({j}, {i}, {_double_array_sql(c)})"
        for j in range(8)
        for i, c in enumerate(books[j])
    )
    ctes = f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), sv AS (
      SELECT vec_id, s.j AS sub, v[s.j * {ds} + 1 : s.j * {ds} + {ds}] AS x
      FROM e, LATERAL unnest(generate_series(0, 7)) AS s(j)
    ), cent(sub, i, c) AS (
      VALUES {cent_values}
    ), d AS (
      SELECT sv.vec_id, sv.sub, cent.i,
             list_dot_product(sv.x, sv.x) - 2 * list_dot_product(sv.x, cent.c)
               + list_dot_product(cent.c, cent.c) AS d
      FROM sv JOIN cent ON sv.sub = cent.sub
    ), codes AS (
      SELECT vec_id, sub, i AS code
      FROM (
        SELECT vec_id, sub, i,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, i ASC) AS rn
        FROM d
      ) WHERE rn = 1
    )"""
    return ctes, books, ds


def _pq_oracle_sql_for(sf_dir: str) -> str:
    """Pin the offline PQ fit as literals and value-check every
    (vector, subspace) code (see ``_pq_codes_ctes`` for the margin
    caveat)."""
    ctes, _, _ = _pq_codes_ctes(sf_dir)
    return f"""{ctes}
    SELECT vec_id, CAST(sub AS INT) AS sub, CAST(code AS INT) AS code
    FROM codes
    """


def _pq_adc_oracle_sql() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

    return _pq_adc_oracle_sql_for(_oracle_sf_dir())


def _pq_adc_oracle_sql_for(sf_dir: str) -> str:
    """ADC ranking replay: codebooks AND the per-query micro-integer
    lookup table are pinned as literals — the LUT literals come from the
    very same ``pq_query_lut`` numpy call the Spark operator embeds in
    its task closure, so every approximate distance is an exact integer
    sum both engines reproduce bit-for-bit.  Only the code argmin can
    diverge on a float tie (margin pinned in tests/test_pq.py)."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import pq_query_lut

    ctes, books, _ = _pq_codes_ctes(sf_dir)
    q_pdf = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id % 50 = 0 ORDER BY vec_id"
    ).df()
    qids = q_pdf["vec_id"].to_numpy()
    Q = np.vstack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    lut = pq_query_lut(Q, books)
    lut_values = ",\n    ".join(
        f"({int(qids[qi])}, {j}, {c}, {int(lut[qi, j, c])})"
        for qi in range(len(qids))
        for j in range(lut.shape[1])
        for c in range(lut.shape[2])
    )
    from cdc_data_lake_pyspark_spark.queries_phase2 import _topk_from_cand_sql

    return f"""{ctes}
    , lut(query_id, sub, code, dm) AS (
      VALUES {lut_values}
    ), adist AS (
      SELECT CAST(l.query_id AS BIGINT) AS query_id,
             c.vec_id AS neighbor_id,
             CAST(sum(l.dm) AS BIGINT) AS adist_micro
      FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      WHERE c.vec_id <> l.query_id
      GROUP BY l.query_id, c.vec_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist_micro ASC, neighbor_id ASC)
                 AS srn
        FROM adist
      ) WHERE srn <= 50
    ),{_topk_from_cand_sql(3)}
    """


@query(
    "dedup_exact_normalized",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY fingerprint
    """,
)
def dedup_exact_normalized(spark, sf_dir):
    """Fuzzy-exact dedup (RefinedWeb, Penedo et al. 2023): exact-hash
    groups over AGGRESSIVELY normalized text — lowercase, every
    non-alphanumeric run collapsed to one space — so trivial formatting
    variants (case, punctuation, whitespace) collapse into one group
    where plain ``dedup_exact_groups`` keeps them distinct.  Same
    32-byte-digest shuffle as the plain path; the md5 fingerprint doubles
    as a value check that both engines' regex normalization agrees
    byte-for-byte (functions/text.py::normalize_text +
    operators/dedup_text.py::exact_dedup)."""
    from cdc_data_lake_pyspark_spark.functions.text import normalize_text
    from cdc_data_lake_pyspark_spark.operators.dedup_text import exact_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("text")
    )
    return exact_dedup(docs, normalize=False)


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def unpivot_part_metrics(spark, sf_dir):
    """UNPIVOT (melt): wide part metrics into tidy (key, metric, value)
    rows — the inverse of ``pivot_segment_region`` and the standard
    wide-to-long reshape for metric stores and per-feature aggregation.
    Spark's native ``DataFrame.unpivot`` plans an Expand (one scan, N
    output rows per input, zero shuffle) — map-only at any scale; the
    oracle replays it as the equivalent UNION ALL."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.col("p_retailprice").cast("double"),
            F.col("p_size").cast("double"),
        )
        .unpivot(["p_partkey"], ["p_retailprice", "p_size"], "metric", "value")
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END
                AS INT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase): per user, the
    earliest view, the first click strictly AFTER that view, and the
    first purchase strictly AFTER that click — the standard sequential
    event-pattern query behind conversion dashboards.  Three
    stage-filtered per-user aggregations, each join side shrinking
    (stage N joins only stage N−1 completers); every aggregation shares
    the user_id partitioning, so at scale the event stream shuffles once
    per stage on the same key and AQE broadcasts the completer sets when
    small.  ``stage`` counts completed steps."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


@query(
    "key_skew_report",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
    SELECT user_id, n,
           CAST(n AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE)
             AS share,
           rank
    FROM (
      SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
      FROM counts
    ) WHERE rank <= 10
    """,
)
def key_skew_report(spark, sf_dir):
    """Skew diagnostics: the 10 heaviest event keys with counts and
    table share — the measurement that decides when a join needs the
    salting utilities (operators/skew.py::key_skew_report; one map-side
    combined aggregation + a broadcast single-row total, the top-N
    window runs over #distinct-keys rows)."""
    from cdc_data_lake_pyspark_spark.operators.skew import key_skew_report

    return key_skew_report(_t(spark, sf_dir, "events"), ["user_id"], top_n=10)


@query(
    "data_quality_report",
    oracle="""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
    SELECT 'null_props' AS check,
           CAST(count(*) FILTER (props IS NULL) AS BIGINT) AS violations,
           (SELECT total FROM t) AS total
    FROM events
    UNION ALL
    SELECT 'value_min_1',
           CAST(count(*) FILTER (value < 1) AS BIGINT),
           (SELECT total FROM t)
    FROM events
    UNION ALL
    SELECT 'dup_event_id',
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT),
           (SELECT total FROM t)
    FROM events
    UNION ALL
    SELECT 'orphan_user_id',
           CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT),
           (SELECT total FROM t)
    FROM events e
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON e.user_id = c.c_custkey
    """,
)
def data_quality_report(spark, sf_dir):
    """Declarative data-quality validation (the Deequ/Great-Expectations
    pattern): not-null, range, duplicate-key, and referential checks
    over the event stream, all row-level expectations folded into ONE
    aggregate pass plus one anti-join for the foreign key — the
    quarantine gate a CDC pipeline runs ahead of the apply
    (operators/quality.py::dq_report)."""
    from cdc_data_lake_pyspark_spark.operators.quality import dq_report

    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")
    return dq_report(
        events,
        checks=[
            ("null_props", F.col("props").isNull()),
            ("value_min_1", F.col("value") < 1),
        ],
        unique_cols=["event_id"],
        fk=("orphan_user_id", "user_id", customer, "c_custkey"),
    )


def _bpe_oracle_sql() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

    return _bpe_oracle_sql_for(_oracle_sf_dir())


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_oracle_sql_for(sf_dir: str) -> str:
    """Re-learn the BPE merges offline (identical pure-Python core on
    the identical id-ordered sample) and replay tokenization in SQL:
    the same char-spacing regex and the same literal replace chain —
    left-to-right non-overlapping replace is common to both engines, so
    every per-document token count matches exactly."""
    import duckdb

    from cdc_data_lake_pyspark_spark.operators.tokenizer import (
        learn_bpe_merges_from_texts,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' "
            "ORDER BY doc_id LIMIT 200000"
        ).fetchall()
    ]
    merges = learn_bpe_merges_from_texts(texts, 24)
    chain = r"trim(regexp_replace(w, '(.)', '\1 ', 'g'))"
    for a, b in merges:
        chain = f"replace({chain}, {_sql_str(a + ' ' + b)}, {_sql_str(a + b)})"
    return f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '')
               AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(
                  words, w -> len(string_split({chain}, ' ')))), 0)
                AS BIGINT) AS n_tokens
    FROM d
    """


@query("bpe_learned_tokenize", oracle=_bpe_oracle_sql)
def bpe_learned_tokenize(spark, sf_dir):
    """Tokenizer induction (Sennrich et al. 2016): learn 24 BPE merges
    from the corpus itself (bounded id-ordered driver fit — the IVF
    quantizer contract applied to vocabulary learning), then tokenize
    every document with the learned merges as a pure column expression:
    char-space regex + a literal replace chain inside a higher-order
    transform — whole-stage codegen, NO UDF, zero shuffle.  Emits per-doc
    word and learned-token counts; the oracle re-learns the identical
    merges offline and replays the identical replace chain in SQL
    (operators/tokenizer.py)."""
    from cdc_data_lake_pyspark_spark.operators.tokenizer import (
        bpe_token_counts,
        learn_bpe_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=24)
    return bpe_token_counts(docs, merges)


@query(
    "scd2_user_history",
    oracle="""
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS valid_to,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS INT)
             AS version,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC)) IS NULL
             AS is_current
    FROM events WHERE event_type = 'purchase'
    """,
)
def scd2_user_history(spark, sf_dir):
    """SCD Type-2 history materialization from a changelog: every change
    becomes a versioned validity interval [valid_from, valid_to) per
    key, is_current flags the open one — the lakehouse pattern that
    keeps "what did this row look like on date X" queryable where the
    last-image MERGE path keeps only the newest image.  One window over
    (key, ts, tiebreak) = one shuffle on the key the CDC table already
    has; delete-route closer semantics are covered in
    tests/test_relational.py (operators/relational.py::scd2_history)."""
    from cdc_data_lake_pyspark_spark.operators.relational import scd2_history

    changes = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value", "ts")
    )
    return scd2_history(
        changes, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select(
        "user_id",
        "event_id",
        "value",
        "valid_from",
        "valid_to",
        "version",
        "is_current",
    )


@query(
    "cohort_retention",
    oracle="""
    WITH su AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, su.cohort_week,
             CAST(floor((epoch(date_trunc('week', e.ts))
                         - epoch(su.cohort_week)) / 604800) AS INT)
               AS week_offset
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE date_trunc('week', e.ts) >= su.cohort_week
    )
    SELECT cohort_week, week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by signup week, counted distinct
    in each subsequent activity week — the retention-curve aggregation.
    One per-user signup aggregate (broadcast back over the stream), then
    one distinct-count keyed on (cohort, offset); week truncation and
    the offset arithmetic are exact integer math on aligned week starts,
    so both engines agree bit-for-bit.  At 100 TB the signup side is
    #users rows and the event stream shuffles once on user_id."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = (
        ev.join(su, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("_aw"),
        )
        .filter(F.col("_aw") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                (
                    F.unix_timestamp("_aw")
                    - F.unix_timestamp("cohort_week")
                )
                / F.lit(604800)
            )
            .cast("int")
            .alias("week_offset"),
        )
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def _semantic_dedup_oracle_sql() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

    return _semantic_dedup_oracle_sql_for(_oracle_sf_dir())


def _semantic_dedup_oracle_sql_for(sf_dir: str) -> str:
    """Replay the deterministic k-means fit (the IVF centroid contract)
    and SemDeDup's within-cell min-id drop rule in SQL: centroids pinned
    as literals, cell assignment the argmin spelled ``ORDER BY d, i``,
    within-cell pairs scored with DuckDB's sequential
    ``list_dot_product`` cosine.  Same float-tie margin caveats as the
    IVF oracle (assignment) and the cosine-pair oracles (threshold
    boundary); margins on the driver corpus are pinned in
    tests/test_oracle_resolution.py / test_phase2.py."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans
    from cdc_data_lake_pyspark_spark.queries_phase2 import _double_array_sql

    pdf = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    centers = fit_kmeans(X, 16, seed=42)
    cent_values = ",\n    ".join(
        f"({i}, {_double_array_sql(c)})" for i, c in enumerate(centers)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cent(i, c) AS (
      VALUES {cent_values}
    ), vd AS (
      SELECT e.vec_id, cent.i,
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.c)
               + list_dot_product(cent.c, cent.c) AS d
      FROM e CROSS JOIN cent
    ), cells AS (
      SELECT vec_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd
      ) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT c2.vec_id AS b
      FROM cells c1 JOIN cells c2
        ON c1.cell = c2.cell AND c1.vec_id < c2.vec_id
      JOIN e ea ON ea.vec_id = c1.vec_id
      JOIN e eb ON eb.vec_id = c2.vec_id
      WHERE list_dot_product(ea.v, eb.v)
            / (sqrt(list_dot_product(ea.v, ea.v))
             * sqrt(list_dot_product(eb.v, eb.v))) >= 0.4
    )
    SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
           c.vec_id NOT IN (SELECT b FROM dropped) AS kept
    FROM cells c
    """


@query("dedup_semantic_clusters", oracle=_semantic_dedup_oracle_sql)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embedding corpus: cluster
    with the deterministic k-means quantizer (16 cells, the IVF fit
    contract), then drop every vector with a smaller-id same-cell
    neighbor at cosine >= 0.4 — semantic deduplication that scopes the
    quadratic pair problem to independent cells instead of the full
    corpus (the exact all-pairs path is ``dedup_embedding_cosine``; the
    banded approximate path is ``dedup_embedding_cosine_lsh``).  Emits
    every vector with its cell and kept verdict so the oracle
    value-checks assignment AND pruning
    (operators/similarity.py::semantic_dedup)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        semantic_dedup,
    )

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_clusters=16
    )


def _ivf_pq_oracle_sql() -> str:
    from cdc_data_lake_pyspark_spark.queries_phase2 import _oracle_sf_dir

    return _ivf_pq_oracle_sql_for(_oracle_sf_dir())


def _ivf_pq_oracle_sql_for(sf_dir: str) -> str:
    """Full IVF-PQ replay: re-run the offline fit (coarse centroids +
    RESIDUAL codebooks from the same bounded id-ordered sample) and pin
    centroids, residual codebooks, and the per-(query, probed-cell)
    micro-integer LUT as literals — the LUT from the very same
    ``ivf_pq_query_lut`` numpy call the Spark operator closes over.
    Cell assignment, residual code argmin, and probe selection are
    replayed in SQL (``ORDER BY d, i`` ≡ stable argsort/argmin); ADC
    distances are exact integer sums, and the re-rank is the shared
    cosine top-k tail.  Float-tie margins for assignment/probing pinned
    in tests/test_pq.py / test_oracle_resolution.py."""
    import duckdb
    import numpy as np

    from cdc_data_lake_pyspark_spark.operators.similarity import (
        _sq_dists,
        fit_kmeans,
        ivf_pq_query_lut,
    )
    from cdc_data_lake_pyspark_spark.queries_phase2 import (
        _double_array_sql,
        _topk_from_cand_sql,
    )

    pdf = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 200000"
    ).df()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    dim = X.shape[1]
    ds = dim // 8
    centers = fit_kmeans(X, 16, seed=42)
    R = X - centers[_sq_dists(X, centers).argmin(axis=1)]
    books = np.stack(
        [
            fit_kmeans(R[:, j * ds : (j + 1) * ds], 16, seed=42 + j)
            for j in range(8)
        ]
    )
    q_pdf = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE vec_id % 50 = 0 ORDER BY vec_id"
    ).df()
    qids = q_pdf["vec_id"].to_numpy()
    Q = np.vstack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    lut = ivf_pq_query_lut(Q, centers, books)
    probe_cells = np.argsort(_sq_dists(Q, centers), axis=1, kind="stable")[
        :, :4
    ]
    cent_values = ",\n    ".join(
        f"({i}, {_double_array_sql(c)})" for i, c in enumerate(centers)
    )
    rcent_values = ",\n    ".join(
        f"({j}, {i}, {_double_array_sql(c)})"
        for j in range(8)
        for i, c in enumerate(books[j])
    )
    lut_values = ",\n    ".join(
        f"({int(qids[qi])}, {int(cell)}, {j}, {c}, {int(lut[qi, cell, j, c])})"
        for qi in range(len(qids))
        for cell in probe_cells[qi]
        for j in range(8)
        for c in range(16)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cent(i, c) AS (
      VALUES {cent_values}
    ), vd AS (
      SELECT e.vec_id, cent.i,
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cent.c)
               + list_dot_product(cent.c, cent.c) AS d
      FROM e CROSS JOIN cent
    ), cells AS (
      SELECT vec_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd
      ) WHERE rn = 1
    ), res AS (
      SELECT e.vec_id, cl.cell,
             list_transform(generate_series(1, {dim}),
                            i -> e.v[i] - ct.c[i]) AS r
      FROM e JOIN cells cl ON cl.vec_id = e.vec_id
             JOIN cent ct ON ct.i = cl.cell
    ), rsv AS (
      SELECT vec_id, s.j AS sub, r[s.j * {ds} + 1 : s.j * {ds} + {ds}] AS x
      FROM res, LATERAL unnest(generate_series(0, 7)) AS s(j)
    ), rcent(sub, i, c) AS (
      VALUES {rcent_values}
    ), rd AS (
      SELECT rsv.vec_id, rsv.sub, rcent.i,
             list_dot_product(rsv.x, rsv.x)
               - 2 * list_dot_product(rsv.x, rcent.c)
               + list_dot_product(rcent.c, rcent.c) AS d
      FROM rsv JOIN rcent ON rsv.sub = rcent.sub
    ), rcodes AS (
      SELECT vec_id, sub, i AS code FROM (
        SELECT vec_id, sub, i,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, i ASC) AS rn
        FROM rd
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 50 = 0
      ) WHERE rn <= 4
    ), lut(query_id, cell, sub, code, dm) AS (
      VALUES {lut_values}
    ), adist AS (
      SELECT p.query_id, cl.vec_id AS neighbor_id,
             CAST(sum(l.dm) AS BIGINT) AS ad
      FROM probes p
      JOIN cells cl ON cl.cell = p.cell
      JOIN rcodes rc ON rc.vec_id = cl.vec_id
      JOIN lut l ON l.query_id = p.query_id AND l.cell = p.cell
                AND l.sub = rc.sub AND l.code = rc.code
      WHERE cl.vec_id <> p.query_id
      GROUP BY p.query_id, cl.vec_id
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad ASC, neighbor_id ASC) AS srn
        FROM adist
      ) WHERE srn <= 50
    ),{_topk_from_cand_sql(3)}
    """


@query("similarity_ivf_pq", oracle=_ivf_pq_oracle_sql)
def similarity_ivf_pq(spark, sf_dir):
    """IVF-PQ ANN (Jégou et al. 2011 §V; the FAISS IndexIVFPQ layout)
    for the standard query subset: coarse-quantize into 16 cells,
    PQ-encode each vector's RESIDUAL (8 x 4-bit codes), probe the 4
    nearest cells per query, ADC-rank only those cells' codes with the
    per-(query, cell) residual LUT, exact-cosine re-rank the
    50-candidate shortlist.  Per-query work is n_probe/n_clusters of
    the corpus at 128x compression — THE billion-scale serving shape;
    the corpus shuffles once on its cell key (the IVF partition layout).
    The oracle replays fit, assignment, residual codes, probing, ADC,
    and re-rank with centroids/codebooks/LUT pinned as literals; recall
    vs exact is asserted in tests/test_pq.py
    (operators/similarity.py::ivf_pq_top_k)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        ivf_pq_top_k,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_pq_top_k(
        emb,
        queries_df,
        k=3,
        n_clusters=16,
        n_probe=4,
        n_codes=16,  # the oracle generator pins 4-bit books as literals
        shortlist=50,
        exclude_self=True,
    )


@query("similarity_pq_adc", oracle=_pq_adc_oracle_sql)
def similarity_pq_adc(spark, sf_dir):
    """Two-stage PQ search (Jégou et al. 2011 §IV + the standard re-rank)
    for the same query subset the IVF/LSH entries use: an
    asymmetric-distance pass over the 8 x 4-bit codes — m_sub integer
    LUT lookups per (query, vector) against the 128x-compressed
    representation billion-scale ANN actually serves from — shortlists 50
    candidates per query, then ONLY those are re-scored in full precision
    for the exact-cosine top-3.  Stage 1's shuffle carries
    O(parts x Q x 50) integer rows (per-partition partials, boundary ties
    kept); stage 2 gathers Q x 50 vectors by id.  The oracle pins the
    codebooks AND the query LUT (produced by the identical numpy call) as
    literals, replaying shortlist and re-rank bit-for-bit; recall vs
    exact is asserted in tests/test_pq.py
    (operators/similarity.py::pq_top_k / pq_top_k_reranked)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_top_k_reranked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    queries_df = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_top_k_reranked(
        emb, queries_df, books, k=3, shortlist=50, exclude_self=True
    )


@query("embedding_pq_codes", oracle=_pq_oracle_sql)
def embedding_pq_codes(spark, sf_dir):
    """Product quantization (Jégou et al. 2011) of the embedding corpus:
    8 subvectors x 16 centroids — 128x compression (eight 4-bit codes
    per 64-dim float64 vector), the standard memory layout for
    billion-scale ANN.  The codebooks come from the same deterministic
    bounded-sample Lloyd's fit as the IVF quantizer, so the offline
    oracle replays the fit and pins the centroids as literals; every
    (vector, subspace) code is value-checked
    (operators/similarity.py::fit_pq_codebooks / pq_encode)."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, m_sub=8, k=16, seed=42)
    return pq_encode(emb, books)
