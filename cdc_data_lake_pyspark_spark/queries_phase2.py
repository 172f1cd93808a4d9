"""Phase-2 query inventory: text analysis, dedup, similarity, multimodal.

Registered into the same QUERIES/ORACLES registries as queries.py.
Hash-parity conventions are identical (aliased columns, deterministic
arithmetic order, explicit tiebreakers).  Hash-based operators (MinHash,
SimHash, hyperplane LSH) are not portable to DuckDB — those entries omit
the oracle (driver records rows-only) and carry pytest property tests
against exact baselines instead.
"""

from __future__ import annotations

import functools
import os

import numpy as np
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import (
    LANG_ORDER,
    STOPWORDS,
    bpe_token_count,
    char_stats,
    language_id,
    language_scores,
    quality_score,
    rolling_hash,
    token_count,
)
from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    exact_dedup,
    jaccard_similar_pairs,
    jaccard_similar_pairs_prefix,
    minhash_near_duplicates,
    simhash_signatures,
)
from cdc_data_lake_pyspark_spark.operators.multimodal import (
    audio_stats,
    extract_features,
    image_stats,
    sample_frames,
    synth_media_payloads,
    text_as_binary,
)
from cdc_data_lake_pyspark_spark.operators.similarity import (
    brute_force_top_k,
    cosine_near_dup_pairs,
    hyperplane_lsh_top_k,
)
from cdc_data_lake_pyspark_spark.queries import _t, query

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens,
           length(text) AS n_chars_m,
           CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS space_ratio,
           CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS alpha_ratio
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    """Token counting + character-class ratios — map-only projection, only
    `text` is scanned."""
    docs = _t(spark, sf_dir, "documents")
    stats = char_stats(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        stats["n_chars"].alias("n_chars_m"),
        stats["space_ratio"].alias("space_ratio"),
        stats["alpha_ratio"].alias("alpha_ratio"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{words}], x)))"
    )


_LANG_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('es')} AS s_es
  FROM documents
)
SELECT doc_id, lang,
       CASE
         WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         ELSE 'es'
       END AS lang_pred,
       s_en, s_de, s_fr, s_es
FROM scored
"""


@query("lang_id_heuristic", oracle=_LANG_ORACLE)
def lang_id_heuristic(spark, sf_dir):
    """Stopword-hit language ID with deterministic argmax tie-break."""
    docs = _t(spark, sf_dir, "documents")
    scores = language_scores(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        language_id(F.col("text")).alias("lang_pred"),
        *[scores[lang].alias(f"s_{lang}") for lang in LANG_ORDER],
    )


@query(
    "quality_score",
    oracle="""
    SELECT doc_id,
           0.5 * least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
         + 0.4 * (CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                  / CAST(length(text) AS DOUBLE))
         + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                  / CAST(length(text) AS DOUBLE)) AS quality
    FROM documents
    """,
)
def quality_score_q(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
               i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))),
             s -> md5(s))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark, sf_dir):
    """Shingle-MinHash fingerprint via md5 (portable across engines);
    bulk path = explode + codegen'd MIN aggregate."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import doc_fingerprints

    return doc_fingerprints(_t(spark, sf_dir, "documents"))


@query(
    "token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens_ws,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe
    FROM documents
    """,
)
def token_count_bpe_q(spark, sf_dir):
    """Token counting both ways: whitespace split and the BPE-ish regex
    pre-tokenizer (letter runs / digit runs / single punctuation)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens_ws"),
        bpe_token_count(F.col("text")).alias("n_tokens_bpe"),
    )


@query(
    "doc_rolling_hash",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0 ELSE
             list_reduce(
               list_transform(generate_series(1, length(text)),
                              i -> CAST(ord(text[i:i]) AS BIGINT)),
               (acc, c) -> (acc * 257 + c) % 2147483647)
           END AS rhash
    FROM documents
    """,
)
def doc_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash fingerprint (Karp–Rabin shape) — exact
    int64 arithmetic, bit-identical across engines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash(F.col("text")).alias("rhash"))


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           min(doc_id) AS keeper_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact_groups(spark, sf_dir):
    """Exact dedup: hash-groupBy on the digest (the shuffle carries 32-byte
    keys, never documents)."""
    return exact_dedup(_t(spark, sf_dir, "documents"))


_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
           i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))) AS sh
  FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM toks
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         count(*) AS common, any_value(a.n) AS na, any_value(b.n) AS nb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
"""


@query("dedup_jaccard_pairs", oracle=_JACCARD_ORACLE)
def dedup_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-duplicate pairs (≥ 0.8) via shingle
    equi-join — the verification baseline for MinHash-LSH."""
    return jaccard_similar_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@query("dedup_jaccard_prefix", oracle=_JACCARD_ORACLE)
def dedup_jaccard_prefix(spark, sf_dir):
    """Exact Jaccard via SSJoin/AllPairs prefix filtering — provably the
    same pairs as dedup_jaccard_pairs (shared oracle), with candidates
    pruned to docs sharing a rare-prefix shingle (the at-scale exact path)."""
    return jaccard_similar_pairs_prefix(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )


@query("dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash → LSH banding → exact verification (the 100 TB dedup path).

    Oracle-checkable BECAUSE of the exact-verification step: every emitted
    pair carries the true Jaccard, so the output is the exact-Jaccard pair
    set whenever banding recall is 1 — which the seeded (64-hash, 16×4)
    configuration achieves on this corpus (planted near-dups sit well
    above the 0.8 threshold: P[miss] < 1e-7 per pair; verified equal at
    sf0.001/sf0.01 and asserted in
    tests/test_phase2.py::test_minhash_lsh_matches_exact_jaccard)."""
    return minhash_near_duplicates(_t(spark, sf_dir, "documents"), threshold=0.8)


def _simhash_sql(n_bits: int = 60) -> str:
    """DuckDB SimHash reproducing ``simhash_signatures(...,
    portable_token_hash, n_bits=60)`` bit-for-bit: same whitespace
    tokenization, same md5-hex-prefix token hash, same ±1 bit votes."""
    hex_parse = (
        "list_reduce(list_transform(generate_series(1, 15), "
        "i -> CAST(strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1 AS BIGINT)), "
        "(a, c) -> a * 16 + c)"
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}"
        for k in range(n_bits)
    )
    packed = " + ".join(
        f"CASE WHEN v{k} > 0 THEN CAST({1 << k} AS BIGINT) ELSE 0 END"
        for k in range(n_bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
), hashed AS (
  SELECT doc_id, {hex_parse} AS h FROM toks
), votes AS (
  SELECT doc_id, {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes
"""


_SIMHASH_PAIRS_ORACLE = f"""
WITH sim AS ({_simhash_sql()})
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@query("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark, sf_dir):
    """SimHash fingerprints with the portable (md5-derived) token hash —
    bit-identical in DuckDB, so the whole explode→vote→pack pipeline is
    oracle-checked.  (The operator's default stays JVM xxhash64 — faster
    at scale; its banding exactness is pytest-verified.)"""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        portable_token_hash,
    )

    return simhash_signatures(
        _t(spark, sf_dir, "documents"), hash_fn=portable_token_hash, n_bits=60
    )


@query("dedup_simhash_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 3) via exact pigeonhole banding.
    The banding loses NO pairs (any pair within hamming d < n_bands shares
    a whole band), so the output equals the all-pairs hamming join the
    oracle runs; with the portable hash the signatures — and therefore the
    pairs AND distances — match DuckDB bit-for-bit.  Banding exactness is
    also asserted in
    tests/test_phase2.py::test_simhash_banding_finds_all_close_pairs."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        portable_token_hash,
        simhash_near_duplicate_pairs,
    )

    return simhash_near_duplicate_pairs(
        _t(spark, sf_dir, "documents"), hash_fn=portable_token_hash, n_bits=60
    )


_EMB_COS_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS score
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, score FROM pairs WHERE score >= 0.4
"""


@query("dedup_embedding_cosine", oracle=_EMB_COS_ORACLE)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (≥ 0.4): distributed
    block-matrix self-join, BLAS-prefiltered, exact-fold rescored — only
    above-threshold pairs leave the executors, no driver collect."""
    return cosine_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


# --- oracle replay of seeded LSH / IVF structures ------------------------
#
# The hyperplanes and the IVF quantizer are deterministic functions of a
# fixed seed (and, for IVF, of the data itself) — so the "hash functions
# aren't portable to SQL" limitation dissolves: generate the SQL with the
# structures pinned as DOUBLE[] literals and DuckDB replays bucketing,
# probing, and scoring end-to-end.


def _double_array_sql(vals) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


def _planes_values_sql(dim: int, n_planes: int, n_tables: int, seed: int) -> str:
    from cdc_data_lake_pyspark_spark.operators.similarity import make_hyperplanes

    rows = []
    for t in range(n_tables):
        for p, h in enumerate(make_hyperplanes(dim, n_planes, seed=seed + 1000 * t)):
            rows.append(f"({t}, {p}, {_double_array_sql(h)})")
    return ",\n    ".join(rows)


def _cosine_lsh_pairs_oracle(
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 12,
    seed: int = 42,
    threshold: float = 0.4,
) -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), planes(tbl, plane, h) AS (
      VALUES {_planes_values_sql(dim, n_planes, n_tables, seed)}
    ), sig AS (
      SELECT e.vec_id, p.tbl,
             SUM(CASE WHEN list_dot_product(e.v, p.h) >= 0
                      THEN 1 << p.plane ELSE 0 END) AS bkt
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ), cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM sig a JOIN sig b
        ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ), scored AS (
      SELECT c.a_id, c.b_id,
             list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v))
              * sqrt(list_dot_product(eb.v, eb.v))) AS score
      FROM cand c
      JOIN e ea ON c.a_id = ea.vec_id
      JOIN e eb ON c.b_id = eb.vec_id
    )
    SELECT a_id, b_id, score FROM scored WHERE score >= {threshold}
    """


def _cosine_lsh_pairs_oracle_auto() -> str:
    """Replay the auto-sized LSH: derive (n_planes, n_tables) from the
    corpus count of the SAME data dir the query ran against, exactly as
    ``cosine_near_dup_pairs_lsh`` does via ``auto_lsh_params``, then pin
    the seeded hyperplanes as literals."""
    import duckdb

    from cdc_data_lake_pyspark_spark.operators.similarity import auto_lsh_params

    sf_dir = _oracle_sf_dir()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    n_planes, n_tables = auto_lsh_params(n, min_cosine=0.4)
    return _cosine_lsh_pairs_oracle(dim=64, n_planes=n_planes, n_tables=n_tables)


@query("dedup_embedding_cosine_lsh", oracle=_cosine_lsh_pairs_oracle_auto)
def dedup_embedding_cosine_lsh(spark, sf_dir):
    """Hyperplane-LSH banded near-dup pairs — the corpus-scale path: only
    same-bucket pairs are scored, every emitted pair exact-rescored (so
    output ⊆ the exact op with identical scores; recall floor asserted in
    tests/test_phase2.py::test_cosine_lsh_pairs_subset_and_recall).
    (n_planes, n_tables) auto-size from the corpus count
    (``auto_lsh_params``) so bucket occupancy stays pinned as the corpus
    grows; the oracle derives the same sizing from the same corpus and
    replays the seeded hyperplanes as literals, so sizing + banding +
    rescore are value-checked end-to-end in DuckDB."""
    from cdc_data_lake_pyspark_spark.operators.similarity import (
        cosine_near_dup_pairs_lsh,
    )

    return cosine_near_dup_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, dim=64
    )


_CLEAN_CORPUS_ORACLE = r"""
WITH scored AS (
  SELECT doc_id, text,
         0.5 * least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
       + 0.4 * (CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE))
       + 0.1 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE)) AS quality,
         len(list_filter(string_split(lower(text), ' '),
             x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en
  FROM documents
), kept AS (
  SELECT doc_id, text, quality FROM scored
  WHERE quality >= 0.7 AND s_en > 0
), keepers AS (
  SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keeper_id
  FROM kept GROUP BY md5(lower(trim(text)))
)
SELECT k.doc_id, k.quality
FROM kept k JOIN keepers g ON k.doc_id = g.keeper_id
"""


@query("pipeline_clean_corpus", oracle=_CLEAN_CORPUS_ORACLE)
def pipeline_clean_corpus(spark, sf_dir):
    """The training-data cleaning pipeline as ONE composed query: quality
    gate → English stopword-hit gate → exact-dedup keeper selection.
    Map-only scoring; the only shuffles are the fingerprint groupBy and
    the (broadcast) keeper join."""
    docs = _t(spark, sf_dir, "documents")
    scores = language_scores(F.col("text"))
    kept = docs.select(
        "doc_id",
        "text",
        quality_score(F.col("text")).alias("quality"),
        scores["en"].alias("s_en"),
    ).filter((F.col("quality") >= 0.7) & (F.col("s_en") > 0))
    keepers = exact_dedup(kept).select("keeper_id")
    return (
        kept.join(
            F.broadcast(keepers), kept.doc_id == keepers.keeper_id
        )
        .select("doc_id", "quality")
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH pairs AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(v.embedding, x -> CAST(x AS DOUBLE)))
         / (sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
          * sqrt(list_dot_product(list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(v.embedding, x -> CAST(x AS DOUBLE)))))
         AS score
  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
  WHERE q.vec_id % 50 = 0
), ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 3
"""


@query("similarity_topk_bruteforce", oracle=_TOPK_ORACLE)
def similarity_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-3 for a query subset (every 50th vector) against
    the full corpus. Query side broadcasts; corpus never shuffles for the
    scoring, only for the tiny per-query top-k window."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_top_k(emb, queries_df, k=3, exclude_self=True)


_COSINE_SQL = """
             list_dot_product(eq.v, ev.v)
             / (sqrt(list_dot_product(eq.v, eq.v))
              * sqrt(list_dot_product(ev.v, ev.v)))
"""


def _topk_from_cand_sql(k: int) -> str:
    """Shared tail: score candidate (query, neighbor) pairs and keep the
    per-query top-k with the engine's deterministic tiebreak."""
    return f"""
    scored AS (
      SELECT c.query_id, c.neighbor_id, {_COSINE_SQL} AS score
      FROM cand c
      JOIN e eq ON c.query_id = eq.vec_id
      JOIN e ev ON c.neighbor_id = ev.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= {k}
    """


def _oracle_sf_dir() -> str:
    """Data dir for seeded oracle replays, by precedence: explicit
    ``SPARK_GRAFT_ORACLE_SF_DIR`` override → the sf_dir the registered
    queries last loaded a table from (``queries.LAST_SF_DIR``, so the
    offline re-fit reads the SAME corpus the Spark query ran against) →
    the driver's oracle scale (sf0.01)."""
    from cdc_data_lake_pyspark_spark.queries import LAST_SF_DIR

    env = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    return env or LAST_SF_DIR[0] or "/root/testdata/sf0.01"


def _ivf_oracle_sql() -> str:
    return _ivf_oracle_sql_for(_oracle_sf_dir())


@functools.lru_cache(maxsize=None)
def _ivf_oracle_sql_for(sf_dir: str) -> str:
    """Replay the deterministic IVF quantizer offline and pin its centroids
    as literals: read the same id-ordered bounded sample the Spark op fits
    on (fit_ivf_centroids), run the identical numpy Lloyd's, and express
    cell assignment / multi-probe / scoring in SQL.  Cached per data dir —
    the dir is derived from the corpus the query actually ran against
    (``_oracle_sf_dir``).

    Fragility note (ADVICE r4): DuckDB sums dot products sequentially
    while the Spark path uses BLAS float64 matmuls; a vector sitting
    EXACTLY on a centroid-distance tie (margin below ~1e-9) could assign
    differently even when both sides are correct.  The driver corpus has
    no such ties (verified: min assignment margin at sf0.01 and sf0.1 is
    orders of magnitude above float64 round-off —
    tests/test_oracle_resolution.py::test_ivf_assignment_margins), so the
    exact value-check is safe on this data; on adversarial corpora,
    exclude pairs whose margin is below ~1e-9 before comparing."""
    import duckdb

    from cdc_data_lake_pyspark_spark.operators.similarity import fit_kmeans

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
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, i ASC) AS rn
        FROM vd
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, i AS cell FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, i ASC) AS rn
        FROM vd WHERE vec_id % 50 = 0
      ) WHERE rn <= 6
    ), cand AS (
      SELECT p.query_id, c.vec_id AS neighbor_id
      FROM probes p JOIN cells c ON p.cell = c.cell
      WHERE p.query_id <> c.vec_id
    ),{_topk_from_cand_sql(3)}
    """


@query("similarity_ivf", oracle=_ivf_oracle_sql)
def similarity_ivf(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer (numpy Lloyd's on an
    id-ordered bounded sample), 6-of-16 cell multi-probe; recall vs the
    exact result is asserted in tests/test_phase2.py::test_ivf_recall, and
    the oracle replays the identical fit with centroids pinned as SQL
    literals — assignment, probing, and scoring are value-checked."""
    from cdc_data_lake_pyspark_spark.operators.similarity import ivf_top_k

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_top_k(
        emb, queries_df, k=3, n_clusters=16, n_probe=6, exclude_self=True
    )


def _ann_lsh_oracle_sql(
    dim: int = 64, n_planes: int = 5, n_tables: int = 8, seed: int = 42, k: int = 3
) -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), planes(tbl, plane, h) AS (
      VALUES {_planes_values_sql(dim, n_planes, n_tables, seed)}
    ), sig AS (
      SELECT e.vec_id, p.tbl,
             SUM(CASE WHEN list_dot_product(e.v, p.h) >= 0
                      THEN 1 << p.plane ELSE 0 END) AS bkt
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
      FROM sig q JOIN sig v ON q.tbl = v.tbl AND q.bkt = v.bkt
      WHERE q.vec_id % 50 = 0 AND q.vec_id <> v.vec_id
    ),{_topk_from_cand_sql(k)}
    """


@query("similarity_ann_lsh", oracle=lambda: _ann_lsh_oracle_sql())
def similarity_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN over the same query subset; recall vs the exact
    result is asserted in tests/test_phase2.py::test_ann_lsh_recall, and
    the oracle replays the seeded hyperplane tables as literals (banding →
    candidate join → cosine → top-k, all value-checked)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return hyperplane_lsh_top_k(
        emb, queries_df, k=3, dim=64, n_planes=5, n_tables=8, exclude_self=True
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_extract",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def multimodal_extract(spark, sf_dir):
    """Binary-payload feature extraction via Arrow-batched mapInPandas.
    The byte length and digest are oracle-checked; the (deterministic
    fake) feature vector is covered by pytest."""
    docs = text_as_binary(_t(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.select("doc_id", "n_bytes", "digest")


@query(
    "multimodal_frame_sample",
    oracle="""
    -- documents.text is ASCII, so VARCHAR slicing is byte-identical to the
    -- binary slicing on the Spark side (DuckDB 1.0 can't substring BLOBs)
    SELECT doc_id, frame_offset,
           md5(substring(text, frame_offset, 64)) AS frame_md5
    FROM documents,
         LATERAL unnest(generate_series(
           1, greatest(length(text), 1), 64)) AS g(frame_offset)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over an opaque byte stream (the video-frame shape):
    JVM-side offset generation + binary slicing; md5 digests make the
    frames oracle-comparable."""
    docs = text_as_binary(_t(spark, sf_dir, "documents"))
    frames = sample_frames(docs, every_n_bytes=64)
    return frames.select(
        "doc_id",
        F.col("frame_offset").cast("bigint").alias("frame_offset"),
        F.md5(F.col("frame_bytes")).alias("frame_md5"),
    )


@query(
    "multimodal_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
    ), px AS (
      SELECT doc_id, w, h, i, (doc_id * 7 + i * 13) % 256 AS v
      FROM d, LATERAL unnest(generate_series(0, w * h * 3 - 1)) AS g(i)
    )
    SELECT doc_id,
           CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum,
           CAST(SUM(v * (i + 1)) AS BIGINT) AS weighted_sum
    FROM px GROUP BY doc_id
    """,
)
def multimodal_decode(spark, sf_dir):
    """REAL image decode: plant deterministic 24-bit BMP payloads per doc
    (``synth_media_payloads``), decode them with the pure-numpy BMP parser
    (``functions/codecs.py``), and extract exact integer pixel statistics
    including a position-weighted checksum.  The DuckDB oracle replays the
    pixel-generation arithmetic directly — a match proves the
    encode → binary column → parse-and-decode path preserves every pixel,
    in order (row order, channel order, and BMP row padding included)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return image_stats(synth_media_payloads(docs), payload_col="bmp_payload")


@query(
    "multimodal_audio_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 97 AS n,
             8000 + (doc_id % 3) * 4000 AS rate
      FROM documents
    ), s AS (
      SELECT doc_id, n, rate, i,
             ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
      FROM d, LATERAL unnest(generate_series(0, n - 1)) AS g(i)
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(MAX(rate) AS BIGINT) AS sample_rate,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM(v * (i + 1)) AS BIGINT) AS weighted_sum
    FROM s GROUP BY doc_id
    """,
)
def multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode: plant deterministic RIFF/WAVE PCM16 payloads per
    doc, chunk-walk and decode them with the pure-numpy WAV parser, and
    extract exact integer sample statistics; the oracle replays the
    sample-generation arithmetic directly."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return audio_stats(synth_media_payloads(docs), payload_col="wav_payload")


# --------------------------------------------------------------------------
# dedup_paragraphs_global — CCNet-style corpus-wide paragraph dedup
# --------------------------------------------------------------------------

#: planted multi-paragraph page (identical SQL text in both dialects): a
#: banner shared by EVERY page, the document body, and a per-doc footer.
#: With max_df=1 the banner must vanish everywhere, bodies vanish exactly
#: for the planted exact-duplicate families, and footers always survive.
_PARA_PAGE_SQL = (
    "'Shared boilerplate banner.' || chr(10) || text || chr(10) || "
    "'Footer for doc ' || CAST(doc_id AS STRING)"
)

_PARA_DEDUP_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_PARA_PAGE_SQL} AS t FROM documents
), parts AS (
  SELECT doc_id, i AS pos, l[i] AS para
  FROM (SELECT doc_id, string_split(t, chr(10)) AS l FROM planted),
       UNNEST(generate_series(1, len(l))) AS g(i)
), counts AS (
  SELECT para, count(DISTINCT doc_id) AS df FROM parts GROUP BY para
)
SELECT p.doc_id, string_agg(p.para, chr(10) ORDER BY p.pos) AS text
FROM parts p JOIN counts c ON p.para = c.para
WHERE c.df <= 1
GROUP BY p.doc_id
"""


@query("dedup_paragraphs_global", oracle=_PARA_DEDUP_ORACLE)
def dedup_paragraphs_global(spark, sf_dir):
    """CCNet-style corpus-wide paragraph dedup (Wenzek et al. 2020):
    build a deterministic multi-paragraph page per row (shared banner +
    body + unique footer — same expression in both engines), drop every
    paragraph appearing in more than one document, reassemble survivors
    in order.  The banner paragraph must vanish from EVERY page even
    though every full page text is unique — the granularity whole-doc
    exact dedup cannot reach; bodies vanish exactly for the corpus's
    planted exact-duplicate families (the oracle replays both effects
    and every reassembled text is hash-compared).

    Plan shape (operators/dedup_text.py::paragraph_dedup_global): one
    posexplode, one map-side-combined count(DISTINCT doc) on md5
    digests, one digest join-back, one per-doc rebuild aggregate — two
    full exchanges, no corpus-wide sort, paragraph text never shuffles
    for the counting side."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        paragraph_dedup_global,
    )

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", F.expr(_PARA_PAGE_SQL).alias("page")
    )
    return paragraph_dedup_global(
        planted, max_df=1, id_col="doc_id", text_col="page"
    ).withColumnRenamed("page", "text")


_INCREMENTAL_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(lower(text),' ')) - 2, 0)),
           i -> array_to_string(string_split(lower(text),' ')[i:i+2], ' '))) AS sh
  FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM toks
), pairs AS (
  SELECT b.doc_id AS batch_id, i.doc_id AS index_id,
         count(*) AS common, any_value(b.n) AS nb, any_value(i.n) AS ni
  FROM ex b JOIN ex i ON b.s = i.s
  WHERE b.doc_id % 3 = 0 AND i.doc_id % 3 <> 0
  GROUP BY b.doc_id, i.doc_id
)
SELECT batch_id, index_id,
       CAST(common AS DOUBLE) / CAST(nb + ni - common AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(common AS DOUBLE) / CAST(nb + ni - common AS DOUBLE) >= 0.8
"""


@query("dedup_incremental_minhash", oracle=_INCREMENTAL_JACCARD_ORACLE)
def dedup_incremental_minhash(spark, sf_dir):
    """INCREMENTAL near-dup (operators/dedup_text.py::minhash_probe):
    documents with ``doc_id % 3 != 0`` form yesterday's corpus, reduced
    ONCE to a MinHash index (signatures + banded buckets — the frames a
    real pipeline persists); today's batch (``doc_id % 3 == 0``) is
    probed against the stored buckets and candidates are exactly
    verified — the near-dup counterpart of the novelty gate, without
    re-shingling the corpus.

    Oracle = exact cross-split Jaccard ≥ 0.8: candidate discovery is
    recall-1 on this corpus (the ``dedup_minhash_lsh`` banding argument,
    P[miss] < 1e-7 per planted pair at 64 hashes / 16×4 banding), and
    exact verification gives precision 1, so the probed result equals
    the exhaustive cross-join answer.  The estimate-only mode (no text
    at all beyond the batch) is pytest-pinned against exact Jaccard
    (tests/test_phase2.py::test_minhash_probe_estimate_and_verify)."""
    from cdc_data_lake_pyspark_spark.operators.dedup_text import (
        minhash_index,
        minhash_probe,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return minhash_probe(
        batch, minhash_index(corpus), threshold=0.8, verify_docs=docs
    )
