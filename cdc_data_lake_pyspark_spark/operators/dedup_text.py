"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

BASELINE.json §2.6 capability additions (beyond the reference's surface).
Pattern sources are public: Broder's MinHash resemblance estimation, the
classic LSH banding construction, and Charikar's SimHash — as summarized in
PAPERS.md / standard literature.

Scale design:

* ``exact_dedup`` — hash-groupBy on a fingerprint; partial aggregation
  map-side, one shuffle keyed by the digest (never the text).
* ``jaccard_similar_pairs`` — explode shingles → self-join on shingle →
  count — the exact-but-quadratic-in-collisions baseline; usable for
  verification and small corpora.
* ``minhash_*`` — the 100 TB path: fixed-size signatures (one row per doc),
  LSH banding so only same-bucket docs meet in the join, then exact
  verification of candidates only.  All hashing is ``xxhash64`` JVM-side;
  no UDFs anywhere.
* ``simhash_signatures`` — 64-bit fingerprint per doc via bit-majority of
  token hashes; hamming-close signatures ≈ near-duplicate docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import shingles, tokens


def exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Exact duplicate groups: ``(fingerprint, keeper_id, n_docs)``.

    The keeper is the minimum id per group (deterministic).  Grouping key
    is md5 of (optionally lower/trimmed) text, so the shuffle carries
    32-byte digests, not documents.
    """
    text = F.col(text_col)
    if normalize:
        text = F.lower(F.trim(text))
    return (
        docs.select(F.md5(text).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _exploded_shingles(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    sh = shingles(F.col(text_col), k)
    return docs.select(
        F.col(id_col).alias("_id"), F.size(sh).alias("_n"), F.explode(sh).alias("_s")
    )


def jaccard_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold: ``(a_id, b_id, jaccard)``.

    Self-equi-join on the shingle (not a cross join): only docs sharing at
    least one shingle ever meet.  |∩| via count, |∪| = na + nb − |∩|.
    """
    ex = _exploded_shingles(docs, id_col, text_col, k)
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.first("a._n").alias("_na"),
            F.first("b._n").alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return pairs


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: ``(doc_id, sig: array<bigint>)``.

    Signature i = min over shingles of ``xxhash64(i, shingle)`` — one
    codegen'd array expression per row; the doc's variable-size shingle set
    collapses to a fixed ``num_hashes``-long vector.  E[Jaccard] equals the
    fraction of agreeing components (Broder).
    """
    sh = shingles(F.col(text_col), k)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s)))
            for i in range(num_hashes)
        ]
    )
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a
    candidate pair ``(a_id, b_id)``.

    Shuffle key is ``(band_index, band_hash)`` — at 100 TB each bucket is
    tiny, so the pair-join materializes only genuine collision groups
    instead of the full cross product.
    """
    n = bands * rows_per_band
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig")[i]
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full scale path: MinHash → LSH candidates → EXACT Jaccard
    verification of candidates only.  Returns ``(a_id, b_id, jaccard)``.

    Exact verification makes the output precision-1; LSH only affects
    recall (tunable via bands/rows: threshold ≈ (1/b)^(1/r))."""
    sigs = minhash_signatures(docs, num_hashes, k, id_col, text_col)
    cand = lsh_candidate_pairs(sigs, bands, rows_per_band)
    ex = _exploded_shingles(docs, id_col, text_col, k)
    a = ex.alias("a")
    b = ex.alias("b")
    verified = (
        cand.join(a, cand.a_id == F.col("a._id"))
        .join(b, (cand.b_id == F.col("b._id")) & (F.col("a._s") == F.col("b._s")))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.first("a._n").alias("_na"),
            F.first("b._n").alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.col("_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return verified


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Charikar SimHash: 64-bit fingerprint ``(doc_id, simhash)``.

    For each bit position, majority vote of token-hash bits: bit k of the
    fingerprint is 1 iff Σ_tokens (hash(token) bit k ? +1 : −1) > 0.
    Expressed as one aggregate over the token array per bit — codegen'd,
    no UDF.  Near-duplicate docs land within small hamming distance.
    """
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(k: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << k).cast("long")) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1 << k).cast("long")).otherwise(F.lit(0).cast("long"))

    sim = bit_vote(0)
    for k in range(1, 63):  # bit 63 excluded: keep the fingerprint non-negative
        sim = sim.bitwiseOR(bit_vote(k))
    return docs.select(F.col(id_col).alias("doc_id"), sim.alias("simhash"))
