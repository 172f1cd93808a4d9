"""Sparse-vector similarity join: TF-IDF cosine document pairs via a
token-keyed self-join with document-frequency pruning.

The sparse counterpart of the dense embedding near-dup operators
(similarity.py): documents as bag-of-words TF-IDF vectors, pair
similarity as the sparse dot product accumulated over shared tokens.
The standard IR/SSJoin machinery (Bayardo et al. 2007 "Scaling Up All
Pairs"): candidates exist ONLY for pairs sharing a token, and tokens
above a df ceiling are pruned — both a quality choice (ubiquitous
tokens carry no signal; their idf ≈ 0) and THE scale bound, since a
token contributes df² candidate pairs.  Candidate volume is
Σ_token df², capped by ``max_df``; no cross join anywhere.

Exactness bridge: idf is quantized to integer MILLI-log2 units before
any multiplication, so weights (``tf · idf_milli``) and dot products
are exact BIGINTs — order-independent sums, bit-equal in any engine.
Milli (not the LM scorers' micro) because dot products square the
weights: with idf_milli <= ~2e4 and tf <= ~1e3, a (doc, token) weight
stays <= 2e7 and a pair's dot <= ~4e14·tokens — safely inside int64;
micro units would overflow the squares.  The final cosine divides by
the exact integer norms in IEEE double (deterministic given identical
operands); ties at the similarity threshold sit on a micro-boundary
(measure-zero, same contract as the LM/LSH oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_data_lake_pyspark_spark.functions.text import tokens

#: idf quantization: thousandths of a bit (see module docstring for why
#: not the LM scorers' 1e6).
IDF_MILLI = 1_000


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Per-(doc, token) integer TF-IDF weights with df pruning.

    Output: ``(doc, token, w)`` where ``w = tf · round(1000·log2(N/df))``
    for tokens kept by ``df <= max_df`` (when set) and ``idf > 0``
    (ubiquitous df == N tokens carry zero weight and would only inflate
    the candidate join) — norms are a one-line aggregate over this
    frame.  Two shuffles: the (doc, token)
    tf count and the token df count (df joined back broadcast — the
    pruned vocabulary is small by construction).
    """
    ex = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tf = ex.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("_tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        df = df.filter(F.col("_df") <= max_df)
    n_docs = docs.select(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("_n")
    )
    idf = (
        df.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.round(
                F.log2(F.col("_n").cast("double") / F.col("_df").cast("double"))
                * IDF_MILLI,
                0,
            )
            .cast("long")
            .alias("_idf"),
        )
    )
    # idf == 0 (df == N) weights contribute nothing to dots or norms
    # but would still generate join candidates: prune them here
    return (
        tf.join(F.broadcast(idf.filter(F.col("_idf") > 0)), "token")
        .select("doc", "token", (F.col("_tf") * F.col("_idf")).alias("w"))
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Document pairs with TF-IDF cosine >= ``threshold``.

    Plan: weights (two shuffles, see :func:`tfidf_weights`) → per-doc
    squared norm (one aggregate) → token-keyed self-join emitting
    ``w_a·w_b`` per shared token (the SSJoin candidate stage; volume
    Σ df² bounded by ``max_df``) → one pair aggregate for the exact
    BIGINT dot → norm attach + one scalar division.  The weight frame
    feeds three consumers (norms + both join sides), so it stages
    behind an eager local checkpoint.
    """
    w = tfidf_weights(
        docs, id_col=id_col, text_col=text_col, max_df=max_df
    ).localCheckpoint(eager=True)
    norms = w.groupBy("doc").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a = w.select(
        F.col("token"), F.col("doc").alias("doc_a"), F.col("w").alias("_wa")
    )
    b = w.select(
        F.col("token").alias("_tok_b"),
        F.col("doc").alias("doc_b"),
        F.col("w").alias("_wb"),
    )
    dots = (
        a.join(
            b,
            (F.col("token") == F.col("_tok_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("dot"))
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        dots.join(norms.select(F.col("doc").alias("doc_a"), F.col("n2").alias("_na")), "doc_a")
        .join(norms.select(F.col("doc").alias("doc_b"), F.col("n2").alias("_nb")), "doc_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("doc_a", "doc_b", "dot", "cosine")
    )
